package graft.cdc

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dead-letter queue for change events the apply stage cannot honor —
  * the poison-pill escape hatch a production CDC pipeline needs
  * (Debezium/Connect DLQ analogue): quarantine the record WITH its raw
  * envelope and a machine-readable reason, keep the stream moving,
  * re-feed the fixed records later.
  *
  * Classification runs POST-REDUCE — O(surviving keys), never
  * O(events) — preserving the round-4 measurement that JSON work
  * before the shuffle loses outright. Documented consequence: if a
  * key's HIGHEST-LSN event in an epoch is poisoned, that key's entire
  * epoch update is quarantined (earlier same-epoch events were already
  * collapsed by the reduce) and the table keeps its prior state for
  * the key — the "skip and alert" semantics a poison pill wants. A
  * poisoned event displaced by a higher clean LSN in the same epoch is
  * invisible (the clean event wins the reduce) — by design: the lake
  * never needed it.
  *
  * Exactly-once: rows land in `<root>/epoch=<id>/` with
  * mode=overwrite in the same epoch attempt that writes the delta
  * files, BEFORE the manifest commit. A crash-and-replay overwrites
  * the same directory with the same deterministic set; a replay of an
  * ALREADY-committed epoch skips the write entirely (same guard as the
  * lake's idempotent upsert). `after` is stored canonically as a JSON
  * string whatever the envelope layout, so one stable DLQ schema spans
  * typed and JSON segments.
  */
final class DeadLetterQueue(val root: String) {

  /** Reasons, coarsest-first (a row gets its FIRST matching reason). */
  val ReasonNullKey = "null_key"
  val ReasonUnknownOp = "unknown_op"
  val ReasonMalformedPayload = "malformed_payload"

  /** Quarantine reason for a post-reduce envelope row, null = clean.
    * `typedAfter`: struct payloads cannot be malformed (the parquet
    * reader enforced the schema), so only key/op integrity applies. */
  def reasonCol(typedAfter: Boolean): Column = {
    // malformedness via the corrupt-record column (PERMISSIVE from_json
    // yields a null-FIELDS row, not a null struct, for bad JSON — the
    // corrupt column is the reliable signal, same as a DataFrameReader)
    val corrupt = from_json(col("after"),
      SchemaRegistry.readSchema.add("_cr", StringType),
      java.util.Map.of("columnNameOfCorruptRecord", "_cr")).getField("_cr")
    val badPayload =
      if (typedAfter) lit(false)
      else col("op").isin("I", "U") && col("after").isNotNull && corrupt.isNotNull
    when(col("repo").isNull || col("path").isNull || col("lsn").isNull, ReasonNullKey)
      .when(!col("op").isin("I", "U", "D"), ReasonUnknownOp)
      .when(badPayload, ReasonMalformedPayload)
      .otherwise(lit(null).cast("string"))
  }

  /** Overwrite epoch `epochId`'s quarantine set. `bad` must carry the
    * envelope columns plus `_dlq_reason`. Rare rows by contract —
    * coalesce(1) keeps the side table one small file per epoch. */
  private[cdc] def write(epochId: Long, bad: DataFrame): Unit = {
    val afterJson =
      if (bad.schema("after").dataType.isInstanceOf[StructType]) to_json(col("after"))
      else col("after")
    bad.select(col("repo"), col("path"), col("op"), col("lsn"), col("ts"),
        afterJson.as("after"), col("_dlq_reason").as("reason"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/epoch=$epochId")
  }

  val schema: StructType = StructType(Seq(
    StructField("repo", StringType), StructField("path", StringType),
    StructField("op", StringType), StructField("lsn", LongType),
    StructField("ts", TimestampType), StructField("after", StringType),
    StructField("reason", StringType)))

  /** All quarantined rows, with the `epoch` partition column. Empty
    * frame (same schema) when nothing was ever quarantined. */
  def read(spark: SparkSession): DataFrame = {
    val p = Paths.get(root)
    val any = Files.isDirectory(p) && {
      val s = Files.list(p)
      try s.iterator().hasNext finally s.close()
    }
    val withEpoch = schema.add("epoch", LongType)
    if (!any)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], withEpoch)
    else spark.read.schema(withEpoch).parquet(root) // epoch= dirs -> partition col
  }
}
