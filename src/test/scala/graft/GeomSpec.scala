package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GeomOps
import graft.operators.GeomOps.{Rect, RectBuf}

/** Rectilinear flood-polygon union (FloodingPolygonWriter.py:85-118
  * re-expressed without a geometry library): exact sweep-line area
  * goldens, aggregator associativity (the chunk-then-merge contract),
  * and tile-decomposition invariance (the 100-TB parallel path computes
  * the same number as one global union).
  */
class GeomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("sweepArea goldens: overlap, containment, duplicates, disjoint") {
    assert(GeomOps.sweepArea(Nil) == 0.0)
    assert(GeomOps.sweepArea(Seq(Rect(0, 0, 1, 1))) == 1.0)
    // two 1.5x1.5 squares overlapping by 0.5 in x: 2*2.25 - 0.75
    val two = Seq(Rect(0, 0, 1.5, 1.5), Rect(1, 0, 2.5, 1.5))
    assert(GeomOps.sweepArea(two) == 3.75)
    // containment adds nothing; duplicates add nothing
    assert(GeomOps.sweepArea(two :+ Rect(0.25, 0.25, 0.75, 0.75)) == 3.75)
    assert(GeomOps.sweepArea(two ++ two) == 3.75)
    // disjoint adds exactly
    assert(GeomOps.sweepArea(two :+ Rect(10, 10, 11, 12)) == 5.75)
    // cross shape (classic sweep pitfall): 3x1 and 1x3 crossing = 5
    assert(GeomOps.sweepArea(Seq(Rect(0, 1, 3, 2), Rect(1, 0, 2, 3))) == 5.0)
  }

  test("aggregator is associative/commutative over arbitrary chunkings") {
    val agg = new GeomOps.RectUnionAreaAgg()
    val rnd = new scala.util.Random(7)
    val rects = (0 until 40).map { _ =>
      val x = rnd.nextInt(32) * 0.25; val y = rnd.nextInt(32) * 0.25
      Rect(x, y, x + 0.25 + rnd.nextInt(8) * 0.25, y + 0.25 + rnd.nextInt(8) * 0.25)
    }
    def fold(rs: Seq[Rect]): RectBuf = rs.foldLeft(agg.zero)(agg.reduce)
    val whole = agg.finish(fold(rects))
    Seq(1, 3, 7, 40).foreach { chunks =>
      val merged = rects.grouped(math.max(rects.size / chunks, 1)).map(fold)
        .reduce(agg.merge)
      assert(agg.finish(merged) == whole, s"chunking into $chunks diverged")
      val rev = rects.reverse.grouped(5).map(fold).reduce(agg.merge)
      assert(agg.finish(rev) == whole, "commuted order diverged")
    }
  }

  test("tile decomposition computes the same area as one global union") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val cells = (0 until 500).map { _ =>
      (1 + rnd.nextInt(3), rnd.nextInt(60).toDouble, rnd.nextInt(60).toDouble)
    }.toDF("flood_class", "x", "y")
    def area(tile: Double): Map[Int, Double] =
      GeomOps.floodUnionArea(cells, "flood_class", "x", "y", half = 0.75, tile = tile)
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val tiled = area(8.0)
    val global = area(1e6) // one tile = the untiled union
    assert(tiled == global, s"tiled=$tiled global=$global")
    assert(tiled.nonEmpty && tiled.values.forall(_ > 0.0))
    // squares overlap (spacing 1 < 2*half): union area strictly below
    // the sum of individual square areas
    val cellCount = cells.distinct().count()
    assert(tiled.values.sum < cellCount * 2.25, "no overlap collapsed — union is broken")
  }
}
