package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-epoch, per-partition lineage + metrics side table.
  *
  * Reference analogue: the reference logs per-write progress and match
  * distances as it goes (coverage/io/netcdf/DefaultWriter.py:231-233,
  * point/io/netcdf/symphonie/AbstractSYMPHONIEReader.py:67-74) and
  * times stages with a decorator (utils/timing.py:23-30); here those
  * become queryable rows: one per (epoch, key-bucket) with the source
  * LSN range it applied, plus the committed snapshot version — enough
  * to trace any state row back to its log range.
  */
final class Audit(val dir: String) {
  /** `rawBatch` is the pre-reduction envelope batch — lineage must trace
    * the SOURCE LSN range each bucket consumed, not the post-LWW
    * survivors. */
  def record(spark: SparkSession, table: LakeTable, rawBatch: DataFrame, stats: ApplyStats): Unit = {
    val snapshotVersion = table.latest().map(_.version).getOrElse(-1L)
    rawBatch
      .groupBy(table.bucketCol)
      .agg(
        min(col("lsn")).as("min_lsn"),
        max(col("lsn")).as("max_lsn"),
        count(lit(1)).as("rows_applied"))
      .withColumn("epoch_id", lit(stats.epochId))
      .withColumn("snapshot_version", lit(snapshotVersion))
      .withColumn("schema_version", lit(stats.batchSchemaVersion))
      .withColumn("committed", lit(stats.committed))
      .withColumn("wall_ms", lit(stats.wallMs))
      .write.mode("append").parquet(dir)
  }

  def read(spark: SparkSession): DataFrame = spark.read.parquet(dir)
}
