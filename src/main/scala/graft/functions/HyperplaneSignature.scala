package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for a random-hyperplane LSH signature of
  * an `array<double>` vector: `bits` pseudo-random planes, plane j's
  * component i a deterministic centered hash of (j, i); the sign
  * pattern of the j dot products packs into one long.
  *
  * Rationale (SURVEY.md §7.3 preference order, same as
  * [[CosineSimilarity]]): the composable `transform`+`aggregate`+
  * `zip_with` formulation runs on the interpreted higher-order-function
  * path, re-evaluating nested lambdas per element and allocating a
  * plane array per (row, bit); this expression emits one fused
  * bits x dims loop in generated Java. It is the candidate-generation
  * kernel of the ANN (q29) and embedding near-dup (q30) operators.
  *
  * Plane weights: w(j, i) = centered xxhash-style integer mix of
  * (j * 1024 + i) mapped to [-1, 1) — seed-stable, identical in the
  * interpreted and codegen paths by construction (shared static
  * helper [[HyperplaneSignature.weight]]).
  */
case class HyperplaneSignature(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 64, "1 <= bits <= 64")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return null
    var sig = 0L
    var j = 0
    while (j < bits) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) return null
        dot += a.getDouble(i) * HyperplaneSignature.weight(j, i)
        i += 1
      }
      if (dot >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = HyperplaneSignature.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val sig = ctx.freshName("sig")
      s"""
        int $n = $a.numElements();
        if ($n == 0) {
          ${ev.isNull} = true;
        } else {
          long $sig = 0L;
          for (int $j = 0; $j < $bits && !${ev.isNull}; $j++) {
            double $dot = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
              $dot += $a.getDouble($i) * $helper.weight($j, $i);
            }
            if ($dot >= 0) $sig |= (1L << $j);
          }
          if (!${ev.isNull}) ${ev.value} = $sig;
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignature {

  /** Deterministic plane component in [-1, 1): xxhash-style avalanche
    * of (j, i). Called from both the interpreted eval and the generated
    * Java, so the two paths agree bit-for-bit. */
  def weight(j: Int, i: Int): Double = {
    var x = j.toLong * 1024L + i.toLong + 0x9E3779B97F4A7C15L
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 29; x *= 0xC4CEB9FE1A85EC53L
    x ^= x >>> 32
    // top 53 bits -> uniform double in [0, 1), centered
    (x >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  /** Column-API entry point; input must be (castable to) array<double>. */
  def apply(v: Column, bits: Int): Column =
    Bridge.toColumn(HyperplaneSignature(
      Bridge.toExpression(v.cast("array<double>")), bits))
}
