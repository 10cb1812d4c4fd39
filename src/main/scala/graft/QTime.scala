package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual SparkEntry queries at a given sf dir.
  * usage: runMain graft.QTime <sfDir> <queryName> [queryName...]
  * Each query runs twice (warm JIT); both timings print. */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (sys.env.contains("QTIME_EXPLAIN")) fn(spark, sfDir).explain("formatted")
      (1 to 2).foreach { run =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"QTIME $n run$run ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
