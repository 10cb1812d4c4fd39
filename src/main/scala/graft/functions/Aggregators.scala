package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A 2-D bounding box (degenerate = empty). */
final case class BBox(minX: Double, minY: Double, maxX: Double, maxY: Double) {
  def isEmpty: Boolean = minX > maxX
  def union(o: BBox): BBox =
    if (isEmpty) o
    else if (o.isEmpty) this
    else BBox(math.min(minX, o.minX), math.min(minY, o.minY),
      math.max(maxX, o.maxX), math.max(maxY, o.maxY))
}

object BBox {
  val empty: BBox = BBox(Double.MaxValue, Double.MaxValue, Double.MinValue, Double.MinValue)
  def point(x: Double, y: Double): BBox = BBox(x, y, x, y)
}

/** Two-phase (partial + final) geometry-union aggregation — the typed
  * `Aggregator` re-expression of the reference's chunked polygon union
  * on a multiprocessing pool (FloodingPolygonWriter.py:103-112): each
  * task folds its rows into a partial envelope (`reduce` = map-side
  * combine), partials merge associatively (`merge` = the pool's final
  * union). A real geometry kernel would swap BBox for a Geometry with
  * the same algebra.
  */
class BBoxUnionAggregator extends Aggregator[(Double, Double), BBox, BBox] {
  override def zero: BBox = BBox.empty
  override def reduce(b: BBox, p: (Double, Double)): BBox = b.union(BBox.point(p._1, p._2))
  override def merge(a: BBox, b: BBox): BBox = a.union(b)
  override def finish(r: BBox): BBox = r
  override def bufferEncoder: Encoder[BBox] = Encoders.product[BBox]
  override def outputEncoder: Encoder[BBox] = Encoders.product[BBox]
}
