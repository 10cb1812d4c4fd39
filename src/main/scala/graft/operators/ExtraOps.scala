package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.StreamingOps

/** Additional aggregate/streaming coverage: rollup, distinct and
  * approximate-distinct aggregates, and a Structured-Streaming windowed
  * aggregation driven to completion and checked against the batch
  * oracle (streaming == batch equivalence inside the driver gate).
  */
object ExtraOps {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampNTZType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // multi-level aggregation (rollup) — subtotal + grand-total rows
    "q37_rollup" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 4).as("sum_qty"), count(lit(1)).as("cnt"))
    }),

    // exact distinct aggregate
    "q38_distinct_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/events.parquet")
        .groupBy(col("event_type"))
        .agg(
          count_distinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
    }),

    // approximate distinct (HLL sketch) — engine-specific estimate, so
    // rows-only in the driver; accuracy vs exact asserted in spec
    "q39_approx_distinct" -> ((s, dir) => {
      s.read.parquet(s"$dir/events.parquet")
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
    }),

    // Structured Streaming: tumbling event-time window aggregation over
    // the events table driven as a bounded stream (memory sink,
    // AvailableNow) — must equal the batch SQL oracle exactly
    "q40_stream_window" -> ((s, dir) => {
      StreamingOps.runToBatch(
        s, s"$dir/events.parquet", eventsSchema,
        df => df
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
          .select(col("window.start").as("win_start"), col("event_type"),
            col("cnt"), col("sum_value")),
        outputMode = "complete")
    })
  )

  val oracles: Map[String, String] = Map(
    "q37_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 4) AS sum_qty, count(*) AS cnt
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q38_distinct_agg" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
         count(*) AS n_events
         FROM events GROUP BY event_type""",
    "q40_stream_window" ->
      """SELECT date_trunc('hour', ts) AS win_start, event_type,
         count(*) AS cnt, round(sum(value), 4) AS sum_value
         FROM events GROUP BY 1, 2"""
  )
}
