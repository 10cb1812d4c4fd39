package graft

import graft.cdc.{GenConfig, Pipeline}

/** Writes the bench binlog fixture (used by tools/cdcbench.sh for
  * manual single-parallelism probes; graft.Bench writes its own). */
object BenchFixture {
  def main(args: Array[String]): Unit = {
    val Array(events, epochs, logDir) = args.take(3)
    // optional 4th arg "typed": struct-payload segment layout
    val typed = args.length > 3 && args(3) == "typed"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Pipeline.writeLogSegments(spark,
      GenConfig(numEvents = events.toLong, numRepos = 5000L, pathsPerRepo = 100L),
      logDir, epochs.toInt, filesPerSegment = 0, typedPayload = typed)
    spark.stop()
  }
}
