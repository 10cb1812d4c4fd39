package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.BandedRangeJoinRule

/** The tolerance-range-join optimizer rule: a user-written
  * `abs(l - r) <= d` join must re-plan as a banded equi-join (no
  * cartesian / nested-loop product, no whole-history per-key
  * candidates) with unchanged results.
  */
class BandedRangeJoinRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BandedRangeJoinRule
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq BandedRangeJoinRule)
  }

  private def probes = {
    import spark.implicits._
    (1 to 50).flatMap(u => (0 to 20).map(i => (u.toLong, i * 100.0)))
      .toDF("user_id", "px")
  }
  private def events = {
    import spark.implicits._
    (1 to 50).flatMap(u => (0 to 500).map(i => (u.toLong, i * 4.1, i.toDouble)))
      .toDF("user_id", "ex", "value")
  }

  test("equi + tolerance join: rewritten plan is banded, results unchanged") {
    // def, not val: a Dataset caches its queryExecution at first use,
    // so the rule must see a freshly-built plan
    def q = probes.as("p").join(events.as("e"),
      col("p.user_id") === col("e.user_id") &&
        abs(col("p.px") - col("e.ex")) <= lit(25.0))
      .groupBy(col("p.user_id"), col("px"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
    val baseline = q.collect().map(r =>
      (r.getLong(0), r.getDouble(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    withRule {
      val fresh = q
      val plan = fresh.queryExecution.executedPlan.toString
      assert(plan.contains("_graft_bin"), s"rule did not fire:\n${plan.take(1500)}")
      assert(plan.toLowerCase.contains("generate explode"),
        s"banding explode missing:\n${plan.take(1500)}")
      val got = fresh.collect().map(r =>
        (r.getLong(0), r.getDouble(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      assert(got == baseline)
    }
  }

  test("tolerance-only join: cartesian product becomes a bin equi-join") {
    def q = probes.filter(col("user_id") === 1).select(col("px"))
      .join(events.filter(col("user_id") === 2).select(col("ex"), col("value")),
        abs(col("px") - col("ex")) <= lit(10.0))
    val baseline = q.collect().map(r => (r.getDouble(0), r.getDouble(1))).sorted.toSeq
    withRule {
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("_graft_bin"), s"rule did not fire:\n${plan.take(1500)}")
      assert(!plan.contains("CartesianProduct"),
        s"still a cartesian product:\n${plan.take(1500)}")
      val got = q.collect().map(r => (r.getDouble(0), r.getDouble(1))).sorted.toSeq
      assert(got == baseline)
    }
  }

  test("spark.sql.extensions install path: fixed-point-safe (no pushdown ping-pong)") {
    // injectOptimizerRule lands in FIXED-POINT batches that also run
    // predicate pushdown; the rule must fire exactly once there (an
    // earlier version hoisted the residual as a Filter, which pushdown
    // re-inlined every iteration — Generates stacked until
    // max-iterations). Build a real session with the extension
    // installed; it shares the SparkContext but gets its own extensions.
    import org.apache.spark.sql.SparkSession
    val original = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new graft.plans.GraftExtensions())
        .getOrCreate()
      import s2.implicits._
      val l = (1 to 30).map(i => (i.toLong % 3, i * 2.0)).toDF("k", "lx")
      val r = (1 to 90).map(i => (i.toLong % 3, i * 0.7, i.toLong)).toDF("k", "rx", "pay")
      val q = l.join(r, l("k") === r("k") && abs(l("lx") - r("rx")) <= lit(1.5))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("_graft_bin"), s"rule did not fire:\n${plan.take(1500)}")
      assert("Generate".r.findAllIn(plan).size == 1,
        s"rule must fire exactly once, Generates:\n${plan.take(2000)}")
      // result equality vs a driver-side recomputation
      val got = q.select(l("k"), col("lx"), col("rx"), col("pay")).collect()
        .map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2), x.getLong(3))).sorted.toSeq
      val want = (for {
        (lk, lx) <- (1 to 30).map(i => (i.toLong % 3, i * 2.0))
        (rk, rx, pay) <- (1 to 90).map(i => (i.toLong % 3, i * 0.7, i.toLong))
        if lk == rk && math.abs(lx - rx) <= 1.5
      } yield (lk, lx, rx, pay)).sorted
      assert(got == want)
    } finally {
      SparkSession.setActiveSession(original)
      SparkSession.setDefaultSession(original)
    }
  }

  test("a user column literally named _graft_bin does not suppress the rule") {
    import spark.implicits._
    // the round-2 guard matched on attribute NAME; the structural guard
    // must still fire here (and still fire only once)
    def l = (1 to 20).map(i => (i.toLong % 3, i * 2.0, s"user-$i"))
      .toDF("k", "lx", "_graft_bin")
    def r = (1 to 60).map(i => (i.toLong % 3, i * 0.7)).toDF("k", "rx")
    def q = l.as("l").join(r.as("r"),
      col("l.k") === col("r.k") && abs(col("l.lx") - col("r.rx")) <= lit(1.5))
    val baseline = q.count()
    withRule {
      val fresh = q
      val plan = fresh.queryExecution.executedPlan.toString
      assert("Generate".r.findAllIn(plan).size == 1,
        s"rule must fire exactly once despite the user column:\n${plan.take(2000)}")
      assert(fresh.count() == baseline)
    }
  }

  test("integral operands beyond 2^53 bin exactly (no double-cast row loss)") {
    import spark.implicits._
    // nanosecond-epoch-sized longs: consecutive values differ by 1, far
    // beyond double's exact-integer range — a double-cast bin would
    // merge/shift bins and silently drop matches near bin borders
    val base = (1L << 60) + 12345678901L
    def l = (0 until 40).map(i => (i % 4, base + i * 1000L)).toDF("k", "lt")
    def r = (0 until 200).map(i => (i % 4, base + i * 251L, i)).toDF("k", "rt", "pay")
    def q = l.as("l").join(r.as("r"),
      col("l.k") === col("r.k") && abs(col("l.lt") - col("r.rt")) <= lit(500L))
    val baseline = q.select("lt", "rt", "pay").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).sorted.toSeq
    assert(baseline.nonEmpty)
    withRule {
      val fresh = q
      val plan = fresh.queryExecution.executedPlan.toString
      assert(plan.contains("_graft_bin"), s"rule did not fire on longs:\n${plan.take(1500)}")
      assert(plan.contains(" div "), s"integral operands must bin with div:\n${plan.take(1500)}")
      val got = fresh.select("lt", "rt", "pay").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).sorted.toSeq
      assert(got == baseline)
    }
  }

  test("timestamp operands with an INTERVAL tolerance bin on epoch micros") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def l = (0 until 30).map(i => (i % 3, new java.sql.Timestamp(t0 + i * 3600000L)))
      .toDF("k", "lts")
    def r = (0 until 90).map(i => (i % 3, new java.sql.Timestamp(t0 + i * 1300000L)))
      .toDF("k", "rts")
    def q = l.as("l").join(r.as("r"),
      col("l.k") === col("r.k") &&
        abs(col("l.lts") - col("r.rts")) <= expr("INTERVAL 30 MINUTES"))
    val baseline = q.count()
    assert(baseline > 0)
    withRule {
      val fresh = q
      val plan = fresh.queryExecution.executedPlan.toString
      assert(plan.contains("_graft_bin"), s"rule did not fire on timestamps:\n${plan.take(1500)}")
      assert(fresh.count() == baseline)
    }
  }

  test("NTZ operands bin in wall-clock space: no row loss across a DST fall-back") {
    import spark.implicits._
    // America/New_York 2024-11-03: 02:00 EDT falls back to 01:00 EST.
    // NTZ residuals evaluate in wall-clock space; binning via the
    // SESSION zone maps wall clocks to instants, which jump by an hour
    // across the transition — pairs within tolerance straddling it land
    // >1 bin apart and silently drop. The bin must use a FIXED zone.
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      // wall-clock minutes 00:00..04:00 on the transition night
      def mk(min: Seq[Int]) = min.map(m => f"2024-11-03 ${m / 60}%02d:${m % 60}%02d:00")
        .toDF("s").select(col("s").cast("timestamp_ntz").as("t"))
      def l = mk(0 until 240 by 7).select(col("t").as("lt"))
      def r = mk(0 until 240 by 11).select(col("t").as("rt"))
      def q = l.join(r, abs(col("lt") - col("rt")) <= expr("INTERVAL 30 MINUTES"))
      val baseline = q.count()
      assert(baseline > 0)
      withRule {
        val fresh = q
        val plan = fresh.queryExecution.executedPlan.toString
        assert(plan.contains("_graft_bin"), s"rule did not fire on NTZ:\n${plan.take(1500)}")
        assert(fresh.count() == baseline,
          "NTZ banding dropped rows across the DST transition")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("d >= abs(...) flipped form and non-positive tolerances") {
    val q = probes.as("p").join(events.as("e"),
      col("p.user_id") === col("e.user_id") &&
        lit(25.0) >= abs(col("p.px") - col("e.ex")))
    withRule {
      assert(q.queryExecution.executedPlan.toString.contains("_graft_bin"))
    }
    // a zero tolerance must NOT fire (division by the bin width)
    val z = probes.as("p").join(events.as("e"),
      col("p.user_id") === col("e.user_id") &&
        abs(col("p.px") - col("e.ex")) <= lit(0.0))
    withRule {
      assert(!z.queryExecution.executedPlan.toString.contains("_graft_bin"))
      assert(z.count() >= 0) // still executable
    }
  }

  test("q68 gate: the natural-predicate range join goes through the rule, banded plan") {
    // the user-facing end-to-end path the driver gates: same semantics
    // as q18 (hand-banded), but the banding comes from the RULE
    val df = SparkEntry.queries("q68_range_join_rule")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("_graft_bin"), s"q68 did not go through the rule:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"q68 planned a product join:\n${plan.take(1500)}")
    // and the answer equals the hand-banded q18 exactly
    val a = df.collect().map(_.toSeq).toSet
    val b = SparkEntry.queries("q18_range_join_time")(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSet
    assert(a == b, s"q68 != q18: ${a.size} vs ${b.size} rows")
  }
}
