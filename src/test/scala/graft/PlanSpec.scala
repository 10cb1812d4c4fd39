package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc._

/** Physical-plan shape assertions — the scale properties the queries
  * rely on must be visible in the executed plan, not assumed:
  * predicate pushdown reaches the parquet scan, column pruning shrinks
  * ReadSchema, small dimensions broadcast, the CDC reduce does map-side
  * partial aggregation, and the hot path stays inside whole-stage
  * codegen.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q2 filter pushdown + column pruning reach the parquet scan") {
    val plan = planOf(SparkEntry.queries("q2_filter_proj")(spark, sf))
    assert(plan.contains("PushedFilters:"), "no pushed filters in scan")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") || plan.contains("IsNotNull(l_discount"),
      s"range predicates not pushed:\n$plan")
    // pruned read schema: the 11-column table must NOT be fully read
    assert(!plan.contains("l_returnflag"), "column pruning failed — unused column in scan")
  }

  test("q3 multi-way dim join uses broadcast hash joins") {
    val plan = planOf(SparkEntry.queries("q3_join_broadcast")(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      s"expected 3 broadcast joins:\n${plan.take(2000)}")
  }

  test("q4/q5 semi and anti joins plan as broadcast/hash semi-anti") {
    assert(planOf(SparkEntry.queries("q4_semi_join")(spark, sf)).contains("LeftSemi"))
    assert(planOf(SparkEntry.queries("q5_anti_join")(spark, sf)).contains("LeftAnti"))
  }

  test("CDC reduce does map-side partial aggregation before one shuffle") {
    val events = ChangeLogGen.events(spark, GenConfig(numEvents = 1000L)).drop("delivery")
    val plan = planOf(Apply.reduce(
      events.select("repo", "path", "op", "lsn", "ts", "schemaVersion", "after")))
    assert("partial_max_by|partial\\(max_by".r.findFirstIn(plan).isDefined ||
      plan.contains("isDistinct=false, filter=None) AS"), // fallback textual form
      s"no partial aggregation visible:\n${plan.take(3000)}")
    assert("Exchange hashpartitioning\\(repo".r.findFirstIn(plan).isDefined,
      "reduce must shuffle exactly on the key")
    // exactly ONE exchange in the reduce
    assert("Exchange".r.findAllIn(plan).size == 1, "reduce must be single-shuffle")
  }

  test("the apply hot path stays in whole-stage codegen") {
    // AQE prints an unexecuted AdaptiveSparkPlan without codegen spans;
    // disable it for the shape assertion only
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val events = ChangeLogGen.events(spark, GenConfig(numEvents = 1000L)).drop("delivery")
      val reduced = Apply.reduce(events.select("repo", "path", "op", "lsn", "ts", "schemaVersion", "after"))
      val plan = planOf(Apply.normalize(reduced, 4))
      // codegen stages render as "*(n) Operator" in plan text
      assert(plan.contains("*("), s"no codegen spans in apply path:\n${plan.take(1500)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("native CosineSimilarity participates in codegen (q28 plan)") {
    val plan = planOf(SparkEntry.queries("q28_knn_brute")(spark, sf))
    assert(plan.contains("cosinesimilarity") || plan.contains("CosineSimilarity"),
      s"native expression missing:\n${plan.take(1500)}")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "query set must broadcast")
  }

  test("q25/q30 candidate joins are fenced (no unbounded self-join key)") {
    // q25: the shingle self-join must be fed by the df-cap window filter,
    // so per-shingle fan-out is bounded by the cap — visible in the plan
    // as a Filter on the windowed count BEFORE the SortMergeJoin/HashJoin
    val p25 = planOf(SparkEntry.queries("q25_ngram_jaccard")(spark, sf))
    val cap = graft.operators.DedupOps.MaxShingleDf
    assert(s"_df#\\d+L? <= $cap".r.findFirstIn(p25).isDefined,
      s"df-cap filter missing from q25 plan:\n${p25.take(2000)}")
    // q30: candidate generation must be an equi-join that includes the
    // LSH bucket — never a cartesian / label-only product
    val p30 = SparkEntry.queries("q30_embed_neardup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p30.contains("CartesianProduct") && !p30.contains("BroadcastNestedLoopJoin"),
      s"q30 has an unbounded join:\n${p30.take(2000)}")
    assert("hashpartitioning\\((band|bucket)".r.findFirstIn(p30).isDefined ||
      p30.contains("bucket"), s"q30 join not keyed by LSH bucket:\n${p30.take(2000)}")
    // the signature kernel is the native codegen expression, not the
    // interpreted HOF formulation (q29/q30 materialize it behind a
    // localCheckpoint, so assert on the signature stage itself)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val sigPlan = planOf(spark.read.parquet(s"$sf/embeddings.parquet")
        .select(graft.functions.HyperplaneSignature(
          col("embedding").cast("array<double>"), 16).as("sig")))
      assert(sigPlan.toLowerCase.contains("hyperplanesignature"),
        s"native signature expression missing:\n${sigPlan.take(1500)}")
      assert(sigPlan.contains("*("), "signature stage not in whole-stage codegen")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q58 stratified split is shuffle-free; q56 rotation is one codegen stage") {
    // the split claim is "embarrassingly parallel, stable at any
    // cluster size" — assert no exchange of any kind in the plan
    val p58 = planOf(SparkEntry.queries("q58_stratified_split")(spark, sf))
    assert(!p58.toLowerCase.contains("exchange"),
      s"q58 plan shuffles:\n${p58.take(1500)}")
    val p56 = planOf(SparkEntry.queries("q56_vector_rotate")(spark, sf))
    assert(!p56.toLowerCase.contains("exchange"),
      s"q56 plan shuffles:\n${p56.take(1500)}")
    assert(p56.contains("*("), "q56 not in whole-stage codegen")
  }

  test("q64 cubic interp: no range/cartesian join, bounded key shuffles; q65 shuffle-free") {
    // the cubic path's scale claim is "two key-shuffles, never a
    // per-probe range join": assert no product joins and that every
    // exchange partitions on the key
    val p64 = planOf(SparkEntry.queries("q64_interp_cubic_axis")(spark, sf))
    assert(!p64.contains("CartesianProduct") && !p64.contains("BroadcastNestedLoopJoin"),
      s"q64 has a product join:\n${p64.take(2000)}")
    val exch = "Exchange hashpartitioning\\(([^,)]+)".r.findAllMatchIn(p64)
      .map(_.group(1)).toSeq
    // _k inside the operator; user_id in the fixture's dedup/probe-grid
    // stages — every exchange is on the interpolation key, nothing else
    assert(exch.nonEmpty && exch.forall(e => e.startsWith("_k") || e.startsWith("user_id")),
      s"q64 exchanges must all be on the key, got: $exch")
    // q65 julian-day algebra is embarrassingly parallel
    val p65 = planOf(SparkEntry.queries("q65_julian_day")(spark, sf))
    assert(!p65.toLowerCase.contains("exchange"),
      s"q65 plan shuffles:\n${p65.take(1500)}")
    assert(p65.contains("*("), "q65 not in whole-stage codegen")
  }

  test("round-7 fused single-pass shapes: q45/q47/q48 one join, q52 one product per assignment") {
    // the round-7 rewrites each replaced a two-pass/join-back plan with
    // a single pass; a regression (a re-probe filter or an
    // unmatched-row join-back creeping back in) shows up as extra join
    // nodes — pin the counts
    def joins(p: String): Int =
      "HashJoin|SortMergeJoin|NestedLoopJoin|CartesianProduct".r.findAllIn(p).size
    val p45 = planOf(SparkEntry.queries("q45_level_match")(spark, sf))
    assert(joins(p45) == 1, s"q45 must be one banded LEFT join, got ${joins(p45)}:\n${p45.take(2000)}")
    val p47 = planOf(SparkEntry.queries("q47_interp_nearest")(spark, sf))
    assert(joins(p47) == 1, s"q47 must be one banded LEFT join, got ${joins(p47)}:\n${p47.take(2000)}")
    val p48 = planOf(SparkEntry.queries("q48_quick_nn")(spark, sf))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p48).size == 1,
      s"q48 must cross ONE tagged-union axis product:\n${p48.take(2000)}")
    assert(joins(p48) == 1, s"q48 must have no join-back, got ${joins(p48)}")
    // q52: two Lloyd assignments at ONE product each + the probe/search
    // products; the two-pass form would add 2 more products and 2 more
    // embeddings joins
    val p52 = planOf(SparkEntry.queries("q52_ann_ivf")(spark, sf))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p52).size <= 5,
      s"q52 assignment re-probe products returned:\n${p52.take(2000)}")
  }

  test("q39 approx distinct within 5% of exact") {
    // the gated output asserts its own contract per group...
    val gated = SparkEntry.queries("q39_approx_distinct")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(gated.nonEmpty && gated.forall(_._3),
      s"HLL estimate breached the 5% bound: ${gated.filterNot(_._3).toSeq}")
    // ...and the raw estimate really is the sketch, not the exact count
    val approx = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(org.apache.spark.sql.functions.col("event_type"))
      .agg(org.apache.spark.sql.functions
        .approx_count_distinct(org.apache.spark.sql.functions.col("user_id"), 0.02)
        .as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = SparkEntry.queries("q38_distinct_agg")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k).toDouble
      assert(math.abs(a - n) / n <= 0.05, s"$k: approx $a vs exact $n")
    }
  }
}
