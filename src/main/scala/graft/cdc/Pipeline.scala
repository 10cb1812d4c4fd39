package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** End-to-end ingest pipelines: batch epoch replay (bench/tests) and the
  * Structured-Streaming binlog tail (checkpointed, exactly-once via the
  * epoch-keyed lake commit).
  *
  * Reference analogue of the streaming shape: the reference tails a
  * directory of timestamped files, sorted, lazily opening each timestep
  * (SYMPHONIEReader.py:51-66, 110-117) — precisely file-source
  * `readStream` semantics with `maxFilesPerTrigger`.
  */
object Pipeline {

  val envelopeSchema: StructType = StructType(Seq(
    StructField("op", StringType), StructField("lsn", LongType),
    StructField("ts", TimestampType), StructField("schemaVersion", IntegerType),
    StructField("repo", StringType), StructField("path", StringType),
    StructField("after", StringType)))

  /** Epoch id of each delivered row: contiguous ranges of the delivery
    * position. With disorder, some events land one epoch later than
    * their LSN implies — the late-arrival case. */
  def withEpoch(events: DataFrame, cfg: GenConfig, epochs: Int): DataFrame = {
    val span = 2L * ChangeLogGen.physicalRows(cfg) + 2L * cfg.disorderWindow + 2L
    val chunk = math.max(span / epochs, 1L)
    events.withColumn("epoch",
      least(floor((col("delivery") + lit(cfg.disorderWindow)) / lit(chunk)), lit(epochs.toLong - 1L)))
  }

  /** Replay the synthetic log in `epochs` micro-batches (batch mode —
    * the bench hot loop). Returns per-epoch stats. */
  def runBatchEpochs(
      spark: SparkSession,
      cfg: GenConfig,
      tableDir: String,
      epochs: Int,
      audit: Option[Audit] = None,
      compactEvery: Int = 0,
      salted: Boolean = false): Seq[ApplyStats] = {
    val table = new LakeTable(tableDir)
    val log = withEpoch(ChangeLogGen.events(spark, cfg), cfg, epochs)
    (0 until epochs).map { e =>
      val batch = log.filter(col("epoch") === e.toLong).drop("delivery", "epoch")
      val stats = Apply.applyEpoch(spark, table, batch, e.toLong, audit, salted)
      if (compactEvery > 0 && table.deltaGroupCount >= compactEvery) table.compact(spark)
      stats
    }
  }

  /** Materialize the synthetic log as `segments` parquet files in
    * delivery order — the on-disk binlog the streaming source tails. */
  def writeLogSegments(spark: SparkSession, cfg: GenConfig, logDir: String, segments: Int): Unit = {
    val log = withEpoch(ChangeLogGen.events(spark, cfg), cfg, segments)
    (0 until segments).foreach { s =>
      log.filter(col("epoch") === s.toLong)
        .select(envelopeSchema.fieldNames.map(col).toSeq: _*)
        .coalesce(1)
        .write.mode("overwrite").parquet(f"$logDir/seg-$s%05d")
    }
  }

  /** Tail `logDir` as a Structured-Streaming file source and apply each
    * micro-batch exactly-once. `failAfterEpoch` injects a crash AFTER
    * the lake commit of that epoch but BEFORE the streaming checkpoint
    * advances — restart then redelivers the same batch id and the
    * idempotent epoch guard must skip it (the kill-and-resume golden
    * test). */
  def runStream(
      spark: SparkSession,
      logDir: String,
      tableDir: String,
      checkpointDir: String,
      audit: Option[Audit] = None,
      maxFilesPerTrigger: Int = 1,
      failAfterEpoch: Option[Long] = None,
      compactEvery: Int = 0): Unit = {
    val table = new LakeTable(tableDir)
    val stream = spark.readStream
      .schema(envelopeSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(logDir + "/seg-*")

    val query = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        Apply.applyEpoch(batch.sparkSession, table, batch, epochId, audit)
        if (compactEvery > 0 && table.deltaGroupCount >= compactEvery)
          table.compact(batch.sparkSession)
        failAfterEpoch.foreach { f =>
          if (epochId == f) throw new RuntimeException(s"injected failure after epoch $f commit")
        }
        ()
      }
      .start()
    try query.awaitTermination()
    finally if (query.isActive) query.stop()
  }
}
