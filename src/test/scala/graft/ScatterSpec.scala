package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ScatterOps

/** Scattered 2-D interpolation (griddata(linear, rescale=True),
  * InterpolatorCore.py:28-46): Delaunay empty-circumcircle + coverage
  * invariants, exact affine reproduction on dyadic inputs, rescale
  * invariance on anisotropic grids, hull fill, the q67 zigzag-strip
  * triangulation claim, and the shuffle-free probe-side plan.
  */
class ScatterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.DataFrame

  private def rescaled(xs: Array[Double], ys: Array[Double]) = {
    val minx = xs.min; val miny = ys.min
    val sx = math.max(xs.max - minx, java.lang.Double.MIN_NORMAL)
    val sy = math.max(ys.max - miny, java.lang.Double.MIN_NORMAL)
    (xs.map(x => (x - minx) / sx), ys.map(y => (y - miny) / sy))
  }

  test("delaunay: empty circumcircle + full hull coverage on a random scatter") {
    val rnd = new scala.util.Random(42)
    // distinct dyadic points, no 4 cocircular in general position batches
    val pts = (0 until 60).map(_ => (rnd.nextInt(256) / 16.0, rnd.nextInt(256) / 16.0))
      .distinct
    val xs = pts.map(_._1).toArray; val ys = pts.map(_._2).toArray
    val tris = ScatterOps.delaunay(xs, ys)
    assert(tris.nonEmpty)
    val (px, py) = rescaled(xs, ys)
    // empty-circumcircle in the rescaled space (the space delaunay runs in)
    for ((a, b, c) <- tris; p <- px.indices if p != a && p != b && p != c) {
      val ax = px(a) - px(p); val ay = py(a) - py(p)
      val bx = px(b) - px(p); val by = py(b) - py(p)
      val cx = px(c) - px(p); val cy = py(c) - py(p)
      val det = (ax * ax + ay * ay) * (bx * cy - by * cx) -
        (bx * bx + by * by) * (ax * cy - ay * cx) +
        (cx * cx + cy * cy) * (ax * by - ay * bx)
      assert(det <= 1e-9, s"point $p strictly inside circumcircle of ($a,$b,$c)")
    }
    // triangle areas tile the convex hull exactly (no gaps, no overlaps)
    def cross(ox: Double, oy: Double, aX: Double, aY: Double, bX: Double, bY: Double) =
      (aX - ox) * (bY - oy) - (aY - oy) * (bX - ox)
    val triArea = tris.map { case (a, b, c) =>
      math.abs(cross(px(a), py(a), px(b), py(b), px(c), py(c))) / 2
    }.sum
    val hullPts = px.zip(py).sortBy(p => (p._1, p._2))
    def half(ps: Array[(Double, Double)]) = {
      val h = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
      for (p <- ps) {
        while (h.size >= 2 && cross(h(h.size - 2)._1, h(h.size - 2)._2,
          h.last._1, h.last._2, p._1, p._2) <= 0) h.remove(h.size - 1)
        h += p
      }
      h.toArray
    }
    val hull = half(hullPts) ++ half(hullPts.reverse).drop(1).dropRight(1)
    val hullArea = (hull.indices.map { i =>
      val (x1, y1) = hull(i); val (x2, y2) = hull((i + 1) % hull.length)
      x1 * y2 - x2 * y1
    }.sum / 2).abs
    assert(math.abs(triArea - hullArea) < 1e-9,
      s"triangulation area $triArea != hull area $hullArea")
  }

  test("affine fields reproduce EXACTLY on dyadic inputs; fill outside the hull") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = (0 until 40).map(_ => (rnd.nextInt(64) / 4.0, rnd.nextInt(64) / 4.0))
      .distinct
    def f(x: Double, y: Double): Double = 3.0 + 2.0 * x - 5.0 * y
    val scatter = pts.map { case (x, y) => (x, y, f(x, y)) }.toDF("x", "y", "v")
    // interior probes: midpoints of random point pairs (dyadic, in hull)
    val inner = (0 until 50).map { _ =>
      val (ax, ay) = pts(rnd.nextInt(pts.size)); val (bx, by) = pts(rnd.nextInt(pts.size))
      ((ax + bx) / 2, (ay + by) / 2)
    }
    val probes = (inner ++ Seq((-100.0, 0.0), (1e4, 1e4))).toDF("qx", "qy")
    val out = ScatterOps.scatteredInterp2d(scatter, "x", "y", "v",
      probes, "qx", "qy", outCol = "gv").collect()
    out.foreach { r =>
      val qx = r.getDouble(0); val qy = r.getDouble(1); val gv = r.getDouble(2)
      if (qx < -50 || qx > 100) assert(gv == 9.96921e36, s"($qx,$qy) not filled")
      else assert(gv == f(qx, qy), s"($qx,$qy): got $gv want ${f(qx, qy)}")
    }
  }

  test("probe outside the hull but inside a populated cell gets fill (ANSI-safe)") {
    import spark.implicits._
    // triangular hull: bbox [0,4]^2 but hull only the lower-left half, so
    // (3.9, 3.9) is OUTSIDE the hull yet lands in a cell that holds the
    // triangle — the filtered candidate array is EMPTY (not null). Under
    // ANSI mode element_at(empty, 1) throws; the operator must yield
    // `fill` here (regression for the try_element_at fix).
    val scatter = Seq((0.0, 0.0, 1.0), (4.0, 0.0, 2.0), (0.0, 4.0, 3.0)).toDF("x", "y", "v")
    val probes = Seq((3.9, 3.9), (1.0, 1.0)).toDF("qx", "qy")
    val out = ScatterOps.scatteredInterp2d(scatter, "x", "y", "v",
      probes, "qx", "qy", outCol = "gv")
      .collect().map(r => (r.getDouble(0), r.getDouble(2))).toMap
    assert(out(3.9) == 9.96921e36, "outside-hull probe in a populated cell must fill")
    assert(out(1.0) == 1.75) // affine 1 + x/4 + y/2, dyadic-exact
  }

  test("rescale invariance: anisotropic axes triangulate like the unit square") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val base = (0 until 35).map(_ => (rnd.nextInt(64) / 4.0, rnd.nextInt(64) / 4.0))
      .distinct
    // x stretched 4096x (a power of two: the rescale divide is exact, so
    // the triangulations must be IDENTICAL, not merely similar)
    val xs0 = base.map(_._1).toArray; val ys = base.map(_._2).toArray
    val xs1 = xs0.map(_ * 4096.0)
    val t0 = ScatterOps.delaunay(xs0, ys).toSet
    val t1 = ScatterOps.delaunay(xs1, ys).toSet
    assert(t0 == t1, "triangulation changed under a power-of-two axis stretch")
    // and affine reproduction still holds on the stretched grid
    def f(x: Double, y: Double): Double = 1.0 + x / 1024.0 + 7.0 * y
    val scatter = base.map { case (x, y) => (x * 4096.0, y, f(x * 4096.0, y)) }
      .toDF("x", "y", "v")
    val probes = (0 until 30).map { _ =>
      val (ax, ay) = base(rnd.nextInt(base.size)); val (bx, by) = base(rnd.nextInt(base.size))
      ((ax + bx) / 2 * 4096.0, (ay + by) / 2)
    }.toDF("qx", "qy")
    val out = ScatterOps.scatteredInterp2d(scatter, "x", "y", "v",
      probes, "qx", "qy", outCol = "gv").collect()
    out.foreach { r =>
      assert(r.getDouble(2) == f(r.getDouble(0), r.getDouble(1)))
    }
  }

  test("q67 strip: two offset rows triangulate to the zigzag (64 down + 63 up)") {
    val bot = (0 to 64).map(i => (i.toDouble, 0.0))
    val top = (0 until 64).map(i => (i + 0.5, 1.0))
    val pts = bot ++ top
    val tris = ScatterOps.delaunay(pts.map(_._1).toArray, pts.map(_._2).toArray)
    assert(tris.length == 127, s"expected zigzag strip, got ${tris.length} triangles")
    // every triangle spans both rows (no degenerate within-row triangle)
    tris.foreach { case (a, b, c) =>
      val rows = Seq(a, b, c).map(i => if (i <= 64) 0 else 1).toSet
      assert(rows.size == 2)
    }
  }

  test("probe side is shuffle-free: broadcast join only, no hash exchange") {
    import spark.implicits._
    val scatter = Seq((0.0, 0.0, 1.0), (4.0, 0.0, 2.0), (2.0, 4.0, 3.0),
      (2.0, 1.0, 4.0)).toDF("x", "y", "v")
    val probes = spark.range(1000)
      .select((col("id") % 40 / 10.0 + 1.0).as("qx"), lit(1.0).as("qy"))
    val out = ScatterOps.scatteredInterp2d(scatter, "x", "y", "v",
      probes, "qx", "qy", outCol = "gv")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast join:\n${plan.take(1500)}")
    assert(!"Exchange hashpartitioning".r.findFirstIn(plan).isDefined,
      s"probe side must not shuffle:\n${plan.take(1500)}")
    assert(out.count() == 1000)
  }

  test("maxPoints contract: an oversized scatter is refused, not collected") {
    import spark.implicits._
    val big = spark.range(100).select(col("id").cast("double").as("x"),
      lit(0.0).as("y"), lit(1.0).as("v"))
    val probes = Seq((0.5, 0.0)).toDF("qx", "qy")
    val e = intercept[IllegalArgumentException] {
      ScatterOps.scatteredInterp2d(big, "x", "y", "v", probes, "qx", "qy",
        maxPoints = 50)
    }
    assert(e.getMessage.contains("maxPoints"))
  }
}
