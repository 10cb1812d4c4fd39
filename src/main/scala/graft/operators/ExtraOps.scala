package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Graft._
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
    // Julian-date conversions (jdutil.py:20-235 date_to_jd/jd_to_mjd/
    // jd_to_date): JD/MJD per event timestamp + a micros-exact
    // round-trip back through the inverse — pure Column arithmetic,
    // exact-gated (identical double ops in both engines)
    "q65_julian_day" -> ((s, dir) => {
      import graft.functions.ColumnFns._
      s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("ts"))
        .select(col("event_id"),
          julianDay(col("ts")).as("jd"),
          modifiedJulianDay(col("ts")).as("mjd"))
        .withColumn("rt_us",
          unix_micros(julianDayToTimestamp(col("jd"))))
    }),

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

    // approximate distinct (HLL sketch): the ESTIMATE is engine-specific
    // (Spark HLL++ vs DuckDB HLL), so the exact gate hashes the exact
    // count plus CROSS-ENGINE AGREEMENT on the within-±5% bound — a
    // single-engine breach flips one side's boolean and fails the hash
    // compare. (A SIMULTANEOUS breach by both engines would agree on
    // `false` and still hash-match; the Spark-side bound itself is
    // hard-asserted in PlanSpec, so that case cannot pass silently on
    // the tested fixtures.)
    "q39_approx_distinct" -> ((s, dir) => {
      s.read.parquet(s"$dir/events.parquet")
        .groupBy(col("event_type"))
        .agg(
          count_distinct(col("user_id")).as("n_users_exact"),
          (abs(approx_count_distinct(col("user_id"), 0.02)
              - count_distinct(col("user_id")))
            <= lit(0.05) * count_distinct(col("user_id"))).as("within_5pct"))
    }),

    // flood-class polygons analogue (FloodingPolygonWriter.py:76-112):
    // threshold/bucketize -> per-class two-phase geometry union, here a
    // custom typed Aggregator over synthesized point coordinates; the
    // envelope coords are also SQL-expressible so the oracle checks the
    // partial+final union algebra exactly
    "q41_flood_union" -> ((s, dir) => {
      import s.implicits._
      val bboxUnion = udaf(new graft.functions.BBoxUnionAggregator())
      s.read.parquet(s"$dir/events.parquet")
        .withColumn("klass",
          when(col("value") < 2.0, "dry").when(col("value") < 6.0, "damp").otherwise("flooded"))
        .withColumn("x", pmod(col("event_id").cast("double") * 3.7, lit(360.0)) - 180.0)
        .withColumn("y", pmod(col("event_id").cast("double") * 1.3, lit(180.0)) - 90.0)
        .groupBy(col("klass"))
        .agg(bboxUnion(col("x"), col("y")).as("bbox"), count(lit(1)).as("cnt"))
        .select(col("klass"),
          round(col("bbox.minX"), 6).as("min_x"), round(col("bbox.minY"), 6).as("min_y"),
          round(col("bbox.maxX"), 6).as("max_x"), round(col("bbox.maxY"), 6).as("max_y"),
          col("cnt"))
    }),

    // per-key recursive IIR low-pass (first-order exponential smoothing
    // in scipy lfilter form) — sort-within-partitions + streaming fold,
    // O(1) state per key (the round-1 flatMapGroups version buffered the
    // whole per-key series on one task: a hot key at 100x OOMs).
    // Exact-checked against a recursive-CTE oracle carrying the same
    // DF2T state (iirOracleSql); golden values in ToleranceSpec too.
    "q42_lowpass" -> ((s, dir) => {
      val (b, a) = graft.functions.IIR.exponential(0.3)
      s.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .iirFilter("user_id", Seq("ts", "event_id"), "value", b, a, "smoothed")
        .select(col("user_id"), col("event_id"),
          round(col("smoothed"), 6).as("smoothed"))
    }),

    // order-N IIR: a true 2nd-order digital Butterworth low-pass
    // (the reference's scipy butter+lfilter, point/utils/filters.py:
    // 18-27), coefficient-vector (b, a) design + per-key ordered
    // streaming fold. Golden-value coefficients + response in
    // ToleranceSpec (scipy-parity butter + lfilter tests); exact-checked
    // against the DF2T recursive-CTE oracle (iirOracleSql).
    "q46_iir_butterworth" -> ((s, dir) => {
      val (b, a) = graft.functions.IIR.butterLowpass(order = 2, wn = 0.25)
      s.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .iirFilter("user_id", Seq("ts", "event_id"), "value", b, a, "filtered")
        .select(col("user_id"), col("event_id"),
          round(col("filtered"), 6).as("filtered"))
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
    }),

    // file-provenance: event-time/lineage parsed from the input file
    // PATH (the reference parses event time from filenames,
    // SYMPHONIEReader.py:71-78). The events table is staged into a
    // hive-partitioned layout whose DIRECTORY names are deterministic
    // (part-file names are not), so the path-derived provenance is
    // exactly checkable: the oracle knows each row's source directory
    // is its event_type partition. The operator under test is still
    // input_file_name + a regexp over the PATH — not a column read
    // (partitionBy drops event_type from the files themselves).
    "q43_file_provenance" -> ((s, dir) => {
      val tmp = graft.Scratch.dirFor("prov", dir)
      s.read.parquet(s"$dir/events.parquet")
        .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
      s.read.parquet(tmp)
        .groupBy(regexp_extract(input_file_name(), "event_type=([^/]+)/", 1)
          .as("source_file"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
    }),

    // ASCII/TSV sink + source round-trip (the reference's ASCII
    // time-series writer/reader pair, DefaultTimePointWriter.py:30-948,
    // XYCoordinatesReader.py:24-50): write TSV with header, read back
    // with an explicit schema, aggregate — must equal aggregating the
    // original table
    "q44_tsv_roundtrip" -> ((s, dir) => {
      // fixed per-input scratch dir (md5-keyed, collision-resistant),
      // overwritten each run — a createTempDirectory here leaked one
      // dir per invocation across repeated gate/bench runs
      val tmp = graft.Scratch.dirFor("tsv", dir)
      s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .write.mode("overwrite").option("sep", "\t").option("header", "true").csv(tmp)
      s.read
        .schema("o_orderkey LONG, o_orderstatus STRING, o_totalprice DOUBLE")
        .option("sep", "\t").option("header", "true").csv(tmp)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))
    })
  )

  /** DuckDB oracle for the per-key IIR fold: a recursive CTE that
    * carries the SAME direct-form-II-transposed state (y, z0..z_{n-1})
    * through the SAME arithmetic in the SAME evaluation order as
    * IIR.step, with coefficients embedded at 17 significant digits
    * (exact double round-trip) — so the oracle is BITWISE-equal to the
    * engine, not merely close: the recursion "has no SQL form" claim
    * was wrong, it has exactly one.
    *
    * DF2T step (z_n treated as 0):  y = b0*x + z0;
    * z_i' = b_{i+1}*x - a_{i+1}*y + z_{i+1}. `y` inside the z updates is
    * inlined as (b0*x + z0) — byte-identical both times it is computed,
    * so no lateral alias reference is needed. */
  private def iirOracleSql(b: Array[Double], a: Array[Double], outName: String): String = {
    val n = math.max(b.length, a.length) - 1
    def lit(d: Double) =
      String.format(java.util.Locale.ROOT, "CAST(%.17g AS DOUBLE)", Double.box(d))
    def bi(i: Int) = if (i < b.length) b(i) else 0.0
    def ai(i: Int) = if (i < a.length) a(i) else 0.0
    def yExpr(x: String, z0: String) = s"${lit(b(0))} * $x + $z0"
    def zExpr(i: Int, x: String, y: String, zNext: String) = {
      val core = s"${lit(bi(i + 1))} * $x - ${lit(ai(i + 1))} * ($y)"
      if (zNext.isEmpty) core else s"$core + $zNext"
    }
    val zCols = (0 until n).map(i => s"z$i")
    val baseY = yExpr("value", "CAST(0.0 AS DOUBLE)")
    val baseZ = (0 until n).map(i =>
      zExpr(i, "value", baseY, if (i + 1 < n) "CAST(0.0 AS DOUBLE)" else ""))
    val stepY = yExpr("s.value", "f.z0")
    val stepZ = (0 until n).map(i =>
      zExpr(i, "s.value", stepY, if (i + 1 < n) s"f.z${i + 1}" else ""))
    s"""WITH RECURSIVE s AS (
          SELECT user_id, event_id, value,
            row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events),
        f(user_id, rn, event_id, y, ${zCols.mkString(", ")}) AS (
          SELECT user_id, rn, event_id, $baseY, ${baseZ.mkString(", ")}
          FROM s WHERE rn = 1
          UNION ALL
          SELECT s.user_id, s.rn, s.event_id, $stepY, ${stepZ.mkString(", ")}
          FROM s JOIN f ON s.user_id = f.user_id AND s.rn = f.rn + 1)
        SELECT user_id, event_id, round(y, 6) AS $outName FROM f"""
  }

  val oracles: Map[String, String] = Map(
    "q65_julian_day" ->
      """SELECT event_id,
           CAST(epoch_us(ts) AS DOUBLE) / CAST(86400000000.0 AS DOUBLE)
             + CAST(2440587.5 AS DOUBLE) AS jd,
           CAST(epoch_us(ts) AS DOUBLE) / CAST(86400000000.0 AS DOUBLE)
             + CAST(2440587.5 AS DOUBLE) - CAST(2400000.5 AS DOUBLE) AS mjd,
           CAST(round((CAST(epoch_us(ts) AS DOUBLE) / CAST(86400000000.0 AS DOUBLE)
             + CAST(2440587.5 AS DOUBLE) - CAST(2440587.5 AS DOUBLE))
             * CAST(86400000000.0 AS DOUBLE), 0) AS BIGINT) AS rt_us
         FROM events""",
    "q42_lowpass" -> {
      val (b, a) = graft.functions.IIR.exponential(0.3)
      iirOracleSql(b, a, "smoothed")
    },
    "q46_iir_butterworth" -> {
      val (b, a) = graft.functions.IIR.butterLowpass(order = 2, wn = 0.25)
      iirOracleSql(b, a, "filtered")
    },
    "q44_tsv_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS cnt,
         round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY o_orderstatus""",
    "q37_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 4) AS sum_qty, count(*) AS cnt
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q38_distinct_agg" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
         count(*) AS n_events
         FROM events GROUP BY event_type""",
    // both engines verify their own HLL sketch against the exact count;
    // the hashed columns (exact, bound-held) are engine-independent
    "q39_approx_distinct" ->
      """SELECT event_type,
         count(DISTINCT user_id) AS n_users_exact,
         abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
           <= 0.05 * count(DISTINCT user_id) AS within_5pct
         FROM events GROUP BY event_type""",
    // the staged layout makes path-provenance deterministic: each
    // source directory IS the row's event_type partition
    "q43_file_provenance" ->
      """SELECT event_type AS source_file, count(*) AS n_rows,
         min(event_id) AS min_id, max(event_id) AS max_id
         FROM events GROUP BY event_type""",
    "q40_stream_window" ->
      """SELECT date_trunc('hour', ts) AS win_start, event_type,
         count(*) AS cnt, round(sum(value), 4) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q41_flood_union" ->
      """SELECT CASE WHEN value < 2.0 THEN 'dry'
                     WHEN value < 6.0 THEN 'damp'
                     ELSE 'flooded' END AS klass,
           round(min(x), 6) AS min_x, round(min(y), 6) AS min_y,
           round(max(x), 6) AS max_x, round(max(y), 6) AS max_y,
           count(*) AS cnt
         FROM (SELECT value,
                 fmod(CAST(event_id AS DOUBLE) * 3.7, 360.0) - 180.0 AS x,
                 fmod(CAST(event_id AS DOUBLE) * 1.3, 180.0) - 90.0 AS y
               FROM events)
         GROUP BY 1"""
  )
}
