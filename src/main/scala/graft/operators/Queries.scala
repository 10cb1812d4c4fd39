package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregates every operator module into the SparkEntry contract maps. */
object Queries {

  val all: Map[String, (SparkSession, String) => DataFrame] =
    Relational.all ++ TextOps.all ++ DedupOps.all ++ SimilarityOps.all ++
      CdcOps.all ++ MultimodalOps.all ++ ExtraOps.all ++ ToleranceOps.all ++
      StencilOps.all ++ GeomOps.all ++ ScatterOps.all

  /** DuckDB oracle SQL — identical output column names to the Spark
    * queries (the driver's compare sorts columns by name and hashes
    * values). Queries without an entry get the weaker rows-only check
    * (hash-function-dependent ops not reproducible in DuckDB). */
  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         round(avg(l_discount), 6) AS avg_disc, count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q2_filter_proj" ->
      """SELECT l_orderkey, l_linenumber,
         round(l_extendedprice * l_discount, 4) AS disc_revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0""",
    "q3_join_broadcast" ->
      """SELECT r_name, round(sum(o_totalprice), 2) AS total_revenue,
         count(*) AS n_orders
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""",
    "q4_semi_join" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
         FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45.0)""",
    "q5_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)""",
    "q6_window_topk" ->
      """SELECT o_custkey, o_orderkey, rk FROM (
           SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) WHERE rk <= 3""",
    "q7_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
         round(sum(l_quantity) OVER (PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_qty
         FROM lineitem""",
    "q8_sort_limit" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q9_bucketize" ->
      """SELECT CASE WHEN o_totalprice < 50000.0 THEN 'low'
                     WHEN o_totalprice < 150000.0 THEN 'mid'
                     WHEN o_totalprice < 300000.0 THEN 'high'
                     ELSE 'extreme' END AS price_class,
              count(*) AS cnt, round(avg(o_totalprice), 2) AS avg_price
         FROM orders GROUP BY 1""",
    "q10_scalar_math" ->
      """SELECT event_id,
         round(sqrt(u*u + v*v), 4) AS speed,
         round(fmod(fmod(270.0 - degrees(atan2(v, u)), 360.0) + 360.0, 360.0), 4) AS dir_deg,
         round(6373.0 * 2.0 * asin(sqrt(
           pow(sin(radians(lat2 - 43.3) / 2), 2) +
           cos(radians(43.3)) * cos(radians(lat2)) *
           pow(sin(radians(lon2 - 5.4) / 2), 2))), 4) AS dist_km
         FROM (SELECT event_id,
                 value - 5.0 AS u,
                 sin(CAST(event_id AS DOUBLE)) * 10.0 AS v,
                 fmod(CAST(event_id AS DOUBLE) * 7.3, 170.0) - 85.0 AS lat2,
                 fmod(CAST(event_id AS DOUBLE) * 13.7, 340.0) - 170.0 AS lon2
               FROM events)""",
    "q11_union" ->
      """SELECT band, count(*) AS cnt FROM (
           SELECT o_orderkey, 'hi' AS band FROM orders WHERE o_totalprice >= 200000.0
           UNION ALL
           SELECT o_orderkey, 'lo' AS band FROM orders WHERE o_totalprice < 20000.0)
         GROUP BY band""",
    "q12_except" ->
      """SELECT o_custkey FROM orders
         EXCEPT ALL
         SELECT o_custkey FROM orders WHERE o_totalprice < 100000.0""",
    "q13_time_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS cnt, round(sum(value), 4) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q14_stats_skill" ->
      """SELECT event_type,
         round(corr(obs, model), 6) AS r,
         round(avg(model) - avg(obs), 6) AS bias,
         round(sqrt(avg(pow(model - obs, 2))), 6) AS rmse,
         round(max(abs(model - obs)), 6) AS max_err
         FROM (SELECT event_type, value AS obs,
                 value * 1.1 + sin(CAST(event_id AS DOUBLE)) AS model FROM events)
         GROUP BY event_type""",
    "q15_cdc_lww" ->
      """SELECT user_id, round(max_by(value, event_id), 6) AS last_value,
         max(event_id) AS last_event_id, count(*) AS n_events
         FROM events GROUP BY user_id""",
    "q16_dedup_first" ->
      """SELECT user_id, event_type, event_id FROM (
           SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
           FROM events) WHERE rn = 1""",
    "q17_asof_join" ->
      """WITH probes AS (
           SELECT user_id, probe_ts
           FROM (SELECT DISTINCT user_id FROM events),
             LATERAL unnest(generate_series(TIMESTAMP '2024-01-02',
               TIMESTAMP '2024-01-30', INTERVAL 6 HOUR)) AS t(probe_ts))
         SELECT user_id, probe_ts, round(v, 6) AS asof_value FROM (
           SELECT p.user_id, p.probe_ts, e.value AS v,
             row_number() OVER (PARTITION BY p.user_id, p.probe_ts
                                ORDER BY e.ts DESC, e.event_id DESC) AS rn
           FROM probes p JOIN events e
             ON e.user_id = p.user_id AND e.ts <= p.probe_ts)
         WHERE rn = 1""",
    "q18_range_join_time" ->
      """WITH probes AS (
           SELECT user_id, probe_ts
           FROM (SELECT DISTINCT user_id FROM events),
             LATERAL unnest(generate_series(TIMESTAMP '2024-01-02',
               TIMESTAMP '2024-01-30', INTERVAL 6 HOUR)) AS t(probe_ts))
         SELECT p.user_id, p.probe_ts, count(*) AS n_near,
           round(avg(e.value), 6) AS avg_value
         FROM probes p JOIN events e
           ON e.user_id = p.user_id
          AND e.ts >= p.probe_ts - INTERVAL 12 HOUR
          AND e.ts <= p.probe_ts + INTERVAL 12 HOUR
         GROUP BY p.user_id, p.probe_ts""",
    // identical semantics to q18 — the gate difference is the ENGINE
    // path (natural predicate + BandedRangeJoinRule), not the answer
    "q68_range_join_rule" ->
      """WITH probes AS (
           SELECT user_id, probe_ts
           FROM (SELECT DISTINCT user_id FROM events),
             LATERAL unnest(generate_series(TIMESTAMP '2024-01-02',
               TIMESTAMP '2024-01-30', INTERVAL 6 HOUR)) AS t(probe_ts))
         SELECT p.user_id, p.probe_ts, count(*) AS n_near,
           round(avg(e.value), 6) AS avg_value
         FROM probes p JOIN events e
           ON e.user_id = p.user_id
          AND e.ts >= p.probe_ts - INTERVAL 12 HOUR
          AND e.ts <= p.probe_ts + INTERVAL 12 HOUR
         GROUP BY p.user_id, p.probe_ts""",
    "q19_nn_join" ->
      """SELECT c_custkey, min_by(n_name, dist) AS nearest_station FROM (
           SELECT c.c_custkey, n.n_name,
             6373.0 * 2.0 * asin(sqrt(
               pow(sin(radians(s_lat - c_lat) / 2), 2) +
               cos(radians(c_lat)) * cos(radians(s_lat)) *
               pow(sin(radians(s_lon - c_lon) / 2), 2))) AS dist
           FROM (SELECT c_custkey,
                   fmod(CAST(c_custkey AS DOUBLE) * 17.0, 160.0) - 80.0 AS c_lat,
                   fmod(CAST(c_custkey AS DOUBLE) * 53.0, 360.0) - 180.0 AS c_lon
                 FROM customer) c
           CROSS JOIN (SELECT n_name,
                   fmod(CAST(n_nationkey AS DOUBLE) * 37.0, 160.0) - 80.0 AS s_lat,
                   fmod(CAST(n_nationkey AS DOUBLE) * 91.0, 360.0) - 180.0 AS s_lon
                 FROM nation) n)
         GROUP BY c_custkey"""
  ) ++ TextOps.oracles ++ DedupOps.oracles ++ SimilarityOps.oracles ++
    CdcOps.oracles ++ MultimodalOps.oracles ++ ExtraOps.oracles ++
    ToleranceOps.oracles ++ StencilOps.oracles ++ GeomOps.oracles ++
    ScatterOps.oracles
}
