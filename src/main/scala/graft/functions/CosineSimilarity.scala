package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity of two
  * `array<double>` columns, with whole-stage codegen (`doGenCode`).
  *
  * Rationale (SURVEY.md §7.3 preference order): the composable
  * `zip_with`+`aggregate` formulation runs on the interpreted
  * higher-order-function path and allocates a zipped intermediate
  * array per row; this expression emits a single fused loop in
  * generated Java — the hot inner kernel of brute-force kNN and
  * LSH re-ranking over ~100-1000-dim embeddings. Null or
  * length-mismatched inputs yield null (callers filter).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements() || n == 0) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements() || $n == 0) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            double $x = $a.getDouble($i);
            double $y = $b.getDouble($i);
            $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
          }
          if (!${ev.isNull}) {
            double $denom = Math.sqrt($na) * Math.sqrt($nb);
            if ($denom == 0.0) { ${ev.isNull} = true; }
            else { ${ev.value} = $dot / $denom; }
          }
        }
      """
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CosineSimilarity {
  /** Column-API entry point; inputs must be (castable to) array<double>. */
  def apply(a: Column, b: Column): Column =
    Bridge.toColumn(CosineSimilarity(
      Bridge.toExpression(a.cast("array<double>")),
      Bridge.toExpression(b.cast("array<double>"))))
}
