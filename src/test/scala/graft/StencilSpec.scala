package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.Graft._

/** Hand-computed golden cases for the round-3 operators: bracketing
  * linear interpolation at probe times (q54) and the 2-D destagger
  * stencil's edge-duplication semantics (q55). The gates check these
  * against DuckDB at sf0.01; this pins the EDGE semantics explicitly.
  */
class StencilSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interpolateLinearAt: brackets, exact hit, and out-of-range nulls") {
    val ev = Seq(
      ("a", "2024-01-01 00:00:00", 10.0),
      ("a", "2024-01-01 00:00:10", 20.0),
      ("a", "2024-01-01 00:00:30", 40.0)
    ).toDF("k", "ts", "value").withColumn("ts", col("ts").cast("timestamp"))
    val probes = Seq(
      ("a", "2023-12-31 23:59:59"), // before first -> null
      ("a", "2024-01-01 00:00:05"), // midpoint of 10..20 -> 15
      ("a", "2024-01-01 00:00:10"), // exact hit -> 20
      ("a", "2024-01-01 00:00:25"), // 3/4 through 20..40 -> 35
      ("a", "2024-01-01 00:00:31")  // after last -> null
    ).toDF("k", "pts").withColumn("pts", col("pts").cast("timestamp"))
    val got = probes.interpolateLinearAt(ev, "k", "pts", "ts", "value")
      .orderBy("pts").select("interp_value").collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(None, Some(15.0), Some(20.0), Some(35.0), None))
  }

  test("interpolateLinearAt: exact hit on the LAST event still resolves") {
    val ev = Seq(("a", "2024-01-01 00:00:10", 20.0))
      .toDF("k", "ts", "value").withColumn("ts", col("ts").cast("timestamp"))
    val probes = Seq(("a", "2024-01-01 00:00:10"))
      .toDF("k", "pts").withColumn("pts", col("pts").cast("timestamp"))
    val r = probes.interpolateLinearAt(ev, "k", "pts", "ts", "value").collect()(0)
    assert(r.getAs[Double]("interp_value") == 20.0)
  }

  test("interpolateCubicAt: quadratic data on a uniform grid reproduces exactly") {
    // centered-difference tangents are exact for a parabola on a uniform
    // axis, so the Hermite segment reproduces f(t) = t^2/100 at interior
    // probes to double precision
    val f = (sec: Long) => sec.toDouble * sec.toDouble / 100.0
    val evDf = (0 to 8).map(i => ("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + 10000L * i, f(10L * i)))
      .toDF("k", "ms", "value")
      .withColumn("ts", (col("ms") / 1000).cast("timestamp")).drop("ms")
    val probes = Seq(15L, 25L, 37L, 63L).map(sec =>
      ("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + 1000L * sec, sec))
      .toDF("k", "ms", "sec")
      .withColumn("pts", (col("ms") / 1000).cast("timestamp")).drop("ms")
    val got = probes.interpolateCubicAt(evDf, "k", "pts", "ts", "value")
      .select("sec", "interp_value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    Seq(15L, 25L, 37L, 63L).foreach { sec =>
      assert(math.abs(got(sec) - f(sec) ) < 1e-9,
        s"probe at ${sec}s: got ${got(sec)}, want ${f(sec)}")
    }
  }

  test("interpolateCubicAt: exact hit, out-of-range nulls, 2-point linear fallback") {
    val ev = Seq(
      ("a", "2024-01-01 00:00:00", 10.0),
      ("a", "2024-01-01 00:00:10", 30.0)
    ).toDF("k", "ts", "value").withColumn("ts", col("ts").cast("timestamp"))
    val probes = Seq(
      ("a", "2023-12-31 23:59:59"), // before first -> null
      ("a", "2024-01-01 00:00:00"), // exact hit -> 10
      ("a", "2024-01-01 00:00:05"), // only 2 events: one-sided tangents
      ("a", "2024-01-01 00:00:10"), // exact hit on LAST -> 30
      ("a", "2024-01-01 00:00:11")  // after last -> null
    ).toDF("k", "pts").withColumn("pts", col("pts").cast("timestamp"))
    val got = probes.interpolateCubicAt(ev, "k", "pts", "ts", "value")
      .orderBy("pts").select("interp_value").collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).isEmpty && got(4).isEmpty)
    assert(got(1).contains(10.0) && got(3).contains(30.0))
    // with both tangents one-sided the Hermite degenerates to linear
    assert(math.abs(got(2).get - 20.0) < 1e-9)
  }

  test("interpolateCubicAt: 3-event golden — boundary tangents are one-sided differences") {
    // events (0s,0), (10s,10), (30s,40): every segment touches a series
    // boundary, so each gets exactly ONE one-sided tangent (scaladoc'd
    // convention). Expected values computed from the documented Hermite
    // formula by hand:
    //  seg [0,10]:  m0 = (10-0)/10 = 1 (one-sided), m1 = (40-0)/30 = 4/3
    //  seg [10,30]: m0 = (40-0)/30 = 4/3,  m1 = (40-10)/20 = 1.5 (one-sided)
    val ev = Seq(
      ("a", "2024-01-01 00:00:00", 0.0),
      ("a", "2024-01-01 00:00:10", 10.0),
      ("a", "2024-01-01 00:00:30", 40.0)
    ).toDF("k", "ts", "value").withColumn("ts", col("ts").cast("timestamp"))
    val probes = Seq(
      ("a", "2024-01-01 00:00:05", 1), // mid first segment
      ("a", "2024-01-01 00:00:20", 2)  // mid second segment
    ).toDF("k", "pts", "pid").withColumn("pts", col("pts").cast("timestamp"))
    def hermite(s: Double, h: Double, y0: Double, y1: Double, m0: Double, m1: Double): Double =
      (2 * s * s * s - 3 * s * s + 1) * y0 + (s * s * s - 2 * s * s + s) * h * m0 +
        (-2 * s * s * s + 3 * s * s) * y1 + (s * s * s - s * s) * h * m1
    val want1 = hermite(0.5, 10e6, 0.0, 10.0, 1.0 / 1e6, (4.0 / 3.0) / 1e6)
    val want2 = hermite(0.5, 20e6, 10.0, 40.0, (4.0 / 3.0) / 1e6, 1.5 / 1e6)
    val got = probes.interpolateCubicAt(ev, "k", "pts", "ts", "value")
      .select("pid", "interp_value").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1) - want1) < 1e-9, s"seg1: got ${got(1)}, want $want1")
    assert(math.abs(got(2) - want2) < 1e-9, s"seg2: got ${got(2)}, want $want2")
  }

  test("union-window operators reject left frames using their reserved column names") {
    val ev = Seq(("a", "2024-01-01 00:00:00", 1.0))
      .toDF("k", "ts", "value").withColumn("ts", col("ts").cast("timestamp"))
    val probes = Seq(("a", "2024-01-01 00:00:00", "user-data"))
      .toDF("k", "pts", "_t") // _t collides with the staging columns
      .withColumn("pts", col("pts").cast("timestamp"))
    Seq(
      () => probes.interpolateCubicAt(ev, "k", "pts", "ts", "value"),
      () => probes.interpolateLinearAt(ev, "k", "pts", "ts", "value"),
      () => probes.asofJoinLatest(ev, "k", "pts", "ts", "value")
    ).foreach { op =>
      val e = intercept[IllegalArgumentException](op())
      assert(e.getMessage.contains("_t"), s"message should name the clash: ${e.getMessage}")
    }
  }

  test("destagger gate duplicates the edge value where the neighbor is missing") {
    // the max-key cell has neither its (y, x+1) nor its (y+1, x)
    // neighbor in the grid: both destaggered components must equal the
    // staggered values (half-sum with the duplicated edge value)
    val sf = "/root/testdata/sf0.001"
    val out = graft.operators.StencilOps.all("q55_destagger_2d")(spark, sf)
    val w = graft.operators.StencilOps.GridW
    val cid = spark.read.parquet(s"$sf/part.parquet")
      .agg(max("p_partkey")).collect()(0).getLong(0)
    val (x, y) = (cid % w, cid / w)
    // Spark round() is HALF_UP BigDecimal rounding — mirror it exactly
    def r6(d: Double) =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val u = math.sin(x * 0.7 + y * 0.3)
    val v = math.cos(x * 0.2 - y * 0.5)
    val got = out.filter(col("cell_id") === cid).collect()(0)
    assert(got.getAs[Double]("u_destag") == r6(u),
      s"edge cell $cid u_destag must duplicate u")
    assert(got.getAs[Double]("v_destag") == r6(v),
      s"edge cell $cid v_destag must duplicate v")
  }
}
