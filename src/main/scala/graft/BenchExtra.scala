package graft

import org.apache.spark.sql.SparkSession

/** Round-7 optimization measurement harness (guide §1: measure first;
  * §1.4: noop-sink isolation). NOT part of the driver contract —
  * `graft.Bench` stays the frozen artifact; this main exists so each
  * query can be timed in isolation with repeats and its
  * `explain("formatted")` captured, under the SAME session configuration
  * Bench uses (shuffle.partitions = cpus, AQE on, 16m scan splits,
  * /dev/shm scratch, UTC) so the numbers are comparable to the driver's.
  *
  * usage: runMain graft.BenchExtra [--repeats N] [--plans tag] [query...]
  *   query...   subset of SparkEntry.queries keys (default: all)
  *   --repeats  timed repetitions per query after one untimed warm run
  *              of the FIRST query only (JVM/IO warm-up; default 3)
  *   --plans t  write explain("formatted") of each selected query to
  *              plans/r07/<query>_<t>.txt (e.g. t = before / after)
  * env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32)
  */
object BenchExtra {

  private val scratchRoot: String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isWritable(shm)) "/dev/shm/graft-benchx"
    else sys.props("java.io.tmpdir") + "/graft-benchx"
  }

  def main(args: Array[String]): Unit = {
    var repeats = 3
    var plansTag: Option[String] = None
    val names = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--repeats" => repeats = args(i + 1).toInt; i += 2
        case "--plans"   => plansTag = Some(args(i + 1)); i += 2
        case q           => names += q; i += 1
      }
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-benchx")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.local.dir", s"$scratchRoot/spark-local")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/nation.parquet").count() // warm I/O + JVM

    val selected =
      if (names.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else names.toSeq.map(n => n -> SparkEntry.queries(n))

    val results = selected.map { case (name, fn) =>
      plansTag.foreach { tag =>
        val dir = java.nio.file.Paths.get("plans/r07")
        java.nio.file.Files.createDirectories(dir)
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(dir.resolve(s"${name}_$tag.txt"), plan)
        spark.catalog.clearCache()
      }
      spark.sparkContext.setJobDescription(name)
      val times = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      spark.sparkContext.setJobDescription(null)
      val sorted = times.sorted
      val med = sorted(sorted.size / 2)
      println(f"BENCHX $name%-28s min=${sorted.head}%.3f med=$med%.3f " +
        s"all=[${times.map(t => f"$t%.3f").mkString(",")}]")
      (name, sorted.head, med)
    }
    println(f"BENCHX_TOTAL min_sum=${results.map(_._2).sum}%.3f " +
      f"med_sum=${results.map(_._3).sum}%.3f queries=${results.size}")
    spark.stop()
  }
}
