package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Graft._
import graft.functions.ColumnFns._

/** Relational operator coverage (SURVEY.md §2.3-§2.9) over the driver's
  * TPC-H-ish tables. Each query has a DuckDB oracle in Queries.oracles
  * with identical output column names.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Fixed 6-hourly probe grid per event key — the reference's
    * fixed-frequency target time axis (`pandas.date_range(freq)`,
    * TimeCoverage.py:94-97) as `sequence()` + explode. */
  private[operators] def probeGrid(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(col("user_id")).distinct()
      .select(col("user_id"), explode(expr(
        "sequence(TIMESTAMP_NTZ '2024-01-02 00:00:00', TIMESTAMP_NTZ '2024-01-30 00:00:00', INTERVAL 6 HOURS)"))
        .as("probe_ts"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.5 aggregation: grouped sums/avg/count with map-side partial agg
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("cnt"))
    }),

    // §2.3 projection + range predicates (bbox/time-subset analogue,
    // Coverage.py:64-96 / TimeCoverage.py:54-92) — pushed to parquet scan
    "q2_filter_proj" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * col("l_discount"), 4).as("disc_revenue"))
    }),

    // §2.4 multi-way join, small dims broadcast (region/nation/customer)
    "q3_join_broadcast" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      orders
        .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("total_revenue"), count(lit(1)).as("n_orders"))
    }),

    // §2.4 semi join (EXISTS)
    "q4_semi_join" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 45.0)
      orders
        .join(li, orders("o_orderkey") === li("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
    }),

    // §2.4 anti join (NOT EXISTS): customers with no large order
    "q5_anti_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
      cust
        .join(big, cust("c_custkey") === big("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // §2.6/2.7 ranking window + per-group top-k
    "q6_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rk"))
    }),

    // §2.6 running aggregate over ordered frames
    "q7_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          round(sum(col("l_quantity")).over(w), 4).as("running_qty"))
    }),

    // §2.7 global sort + limit (top-k)
    "q8_sort_limit" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
    }),

    // §2.3 value bucketization (flood-class analogue,
    // FloodingPolygonWriter.py:78-83)
    "q9_bucketize" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("price_class",
          when(col("o_totalprice") < 50000.0, "low")
            .when(col("o_totalprice") < 150000.0, "mid")
            .when(col("o_totalprice") < 300000.0, "high")
            .otherwise("extreme"))
        .groupBy(col("price_class"))
        .agg(count(lit(1)).as("cnt"), round(avg(col("o_totalprice")), 2).as("avg_price"))
    }),

    // §2.9 scalar math: magnitude/direction/haversine as Column algebra
    // (speed/direction TimeCoverage.py:781-809, distance utils/distance.py:21-63)
    "q10_scalar_math" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val u = col("value") - 5.0
      val v = sin(col("event_id").cast("double")) * 10.0
      e.select(
        col("event_id"),
        round(magnitude(u, v), 4).as("speed"),
        round(direction(u, v), 4).as("dir_deg"),
        round(haversineKm(lit(43.3), lit(5.4),
          pmod(col("event_id").cast("double") * 7.3, lit(170.0)) - 85.0,
          pmod(col("event_id").cast("double") * 13.7, lit(340.0)) - 170.0), 4).as("dist_km"))
    }),

    // §2.8 union-all by concatenation (MFDataset analogue)
    "q11_union" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val hi = o.filter(col("o_totalprice") >= 200000.0)
        .select(col("o_orderkey"), lit("hi").as("band"))
      val lo = o.filter(col("o_totalprice") < 20000.0)
        .select(col("o_orderkey"), lit("lo").as("band"))
      hi.unionByName(lo).groupBy(col("band")).agg(count(lit(1)).as("cnt"))
    }),

    // §2.8 except-all (golden-state verification primitive): multiset
    // difference of order custkeys vs their sub-100k subset
    "q12_except" -> ((s, dir) => {
      val all = t(s, dir, "orders").select(col("o_custkey"))
      val small = t(s, dir, "orders").filter(col("o_totalprice") < 100000.0).select(col("o_custkey"))
      all.exceptAll(small)
    }),

    // §2.10 tumbling event-time window aggregation
    "q13_time_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
    }),

    // §2.5 verification aggregates (skill stats, utils/stats.py:17-53):
    // corr, bias, RMSE, max abs error between obs and a derived model
    "q14_stats_skill" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("obs", col("value"))
        .withColumn("model", col("value") * 1.1 + sin(col("event_id").cast("double")))
      e.groupBy(col("event_type")).agg(
        round(corr(col("obs"), col("model")), 6).as("r"),
        round(avg(col("model")) - avg(col("obs")), 6).as("bias"),
        round(sqrt(avg(pow(col("model") - col("obs"), 2))), 6).as("rmse"),
        round(max(abs(col("model") - col("obs"))), 6).as("max_err"))
    }),

    // the CDC core reduction: last-writer-wins per key (max_by over lsn;
    // DefaultWriter.py:230-240 ordering semantics)
    "q15_cdc_lww" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          max_by(col("value"), col("event_id")).as("last_value"),
          max(col("event_id")).as("last_event_id"),
          count(lit(1)).as("n_events"))
        .withColumn("last_value", round(col("last_value"), 6))
    }),

    // dedup keep-first per key (TimeMultiPoint.py:309-318). round-7:
    // the keep-first row is min(struct(ts, event_id)) — lexicographic
    // struct min ≡ the old row_number-over-(ts, event_id) pick — so the
    // reduction gets map-side partial aggregation (one survivor per key
    // per task crosses the shuffle) instead of shuffling + sorting
    // every event (guide §2.3).
    "q16_dedup_first" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(struct(col("ts"), col("event_id"))).as("_f"))
        .select(col("user_id"), col("event_type"), col("_f.event_id").as("event_id"))
    }),

    // §2.4 temporal as-of join (find_time_index analogue,
    // TimeCoverage.py:266-306): latest event per key at or before each
    // probe instant of a fixed 6-hourly grid (the reference's temporal
    // resampling target axis, TimeCoverage.py:94-97). Implemented
    // shuffle-once via union + ordered window — no range product, the
    // scale path for as-of joins.
    "q17_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("user_id"), col("ts"), col("value"), col("event_id"))
      probeGrid(s, dir)
        .asofJoinLatest(e, "user_id", "probe_ts", "ts", "value", rightTie = Some("event_id"))
        .filter(col("asof_value").isNotNull)
        .select(col("user_id"), col("probe_ts"), round(col("asof_value"), 6).as("asof_value"))
    }),

    // §2.4 interval/range join with tolerance + aggregate over matched
    // candidates (TimeMultiPoint.py:250-298 multi-candidate match +
    // mean interpolation InterpolatorCore.py:57-58). BANDED: both sides
    // bucket time into 12h bins and probes expand to bins ±1, so the
    // join is equi on (user_id, bin) with candidates limited to a 36h
    // neighborhood instead of the key's whole history — the same result
    // as the raw range join (only rows with |e.ts-p.ts| <= 12h survive
    // the residual filter) at a fraction of the per-key product.
    "q18_range_join_time" -> ((s, dir) => {
      val deltaUs = 12L * 3600L * 1000000L
      val e = t(s, dir, "events")
        .select(col("user_id"), col("value"),
          unix_micros(col("ts").cast("timestamp")).as("_eus"))
      probeGrid(s, dir)
        .withColumn("_pus", unix_micros(col("probe_ts").cast("timestamp")))
        .bandedToleranceJoin(e, Seq("user_id"), "_pus", "_eus", deltaUs.toDouble)
        .groupBy(col("user_id"), col("probe_ts"))
        .agg(count(lit(1)).as("n_near"), round(avg(col("value")), 6).as("avg_value"))
    }),

    // §2.4 the SAME tolerance range join through the optimizer RULE —
    // the user-facing path: the join is written with the natural
    // `abs(l - r) <= d` predicate (which alone would plan as an
    // equi-join whose per-key candidate set is the key's whole
    // history) and graft.plans.BandedRangeJoinRule rewrites it to the
    // banded equi-join q18 builds by hand. Same oracle as q18, so the
    // gate proves the rewrite end-to-end: natural predicate in, banded
    // plan out (plan-asserted in BandedRangeJoinRuleSpec), exact rows
    // out. Runs in a child session so the injected rule cannot touch
    // the other queries' sessions.
    "q68_range_join_rule" -> ((s0, dir) => {
      val s = s0.newSession()
      s.experimental.extraOptimizations = Seq(graft.plans.BandedRangeJoinRule)
      val deltaUs = 12L * 3600L * 1000000L
      val e = t(s, dir, "events").select(col("user_id").as("e_uid"), col("value"),
        unix_micros(col("ts").cast("timestamp")).as("_eus"))
      probeGrid(s, dir)
        .withColumn("_pus", unix_micros(col("probe_ts").cast("timestamp")))
        .join(e, col("user_id") === col("e_uid") &&
          abs(col("_pus") - col("_eus")) <= lit(deltaUs))
        .groupBy(col("user_id"), col("probe_ts"))
        .agg(count(lit(1)).as("n_near"), round(avg(col("value")), 6).as("avg_value"))
    }),

    // §2.4 nearest-neighbor join (station x grid, Coverage.py:460-559):
    // synthesize station coords from nation, customer coords from key,
    // broadcast the small side, min_by(haversine)
    "q19_nn_join" -> ((s, dir) => {
      val stations = t(s, dir, "nation").select(
        col("n_name"),
        (pmod(col("n_nationkey").cast("double") * 37.0, lit(160.0)) - 80.0).as("s_lat"),
        (pmod(col("n_nationkey").cast("double") * 91.0, lit(360.0)) - 180.0).as("s_lon"))
      // fanOut (round-7): the broadcast product + haversine runs in the
      // scan stage — single-split input would evaluate it on one core
      val cust = graft.Graft.fanOut(t(s, dir, "customer"), col("c_custkey")).select(
        col("c_custkey"),
        (pmod(col("c_custkey").cast("double") * 17.0, lit(160.0)) - 80.0).as("c_lat"),
        (pmod(col("c_custkey").cast("double") * 53.0, lit(360.0)) - 180.0).as("c_lon"))
      cust
        .crossJoin(broadcast(stations))
        .withColumn("dist", haversineKm(col("c_lat"), col("c_lon"), col("s_lat"), col("s_lon")))
        .groupBy(col("c_custkey"))
        .agg(min_by(col("n_name"), col("dist")).as("nearest_station"))
    })
  )
}
