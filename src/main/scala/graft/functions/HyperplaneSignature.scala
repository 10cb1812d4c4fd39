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
  * Plane weights: w(j, i) = centered multiplicative hash of
  * (j * 1024 + i) mod 2^31 mapped to [-1, 1) — seed-stable, identical
  * in the interpreted and codegen paths by construction (shared static
  * helper [[HyperplaneSignature.weight]]), and PORTABLE: the same
  * dyadic value is computable in plain SQL, which is what lets the
  * DuckDB oracle reproduce q29's buckets exactly.
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

  /** Deterministic plane component in [-1, 1): a Knuth multiplicative
    * hash of (j, i) REDUCED MOD 2^31 — every intermediate fits a
    * signed 64-bit integer with no overflow wrap, and the final value
    * is a dyadic rational, so ANY engine (notably the DuckDB oracle,
    * which has no wrapping 64-bit multiply) computes the identical
    * double. Formula (two multiply/xorshift rounds — one affine round
    * is a lattice: planes come out correlated and LSH recall
    * collapses, measured round 6):
    *   x1 = (k*3266489917 + 40503) mod 2^31;  x2 = x1 xor (x1 >> 14)
    *   x3 = (x2*2246822519) mod 2^31;         x4 = x3 xor (x3 >> 12)
    *   w  = x4 / 2^30 - 1. That
    * portability is what makes the q29 ANN gate an exact cross-engine
    * hash match; as an LSH hyperplane family only decorrelation
    * matters, not cryptographic mixing. Called from both the
    * interpreted eval and the generated Java, so the two paths agree
    * bit-for-bit. */
  def weight(j: Int, i: Int): Double = {
    val k = j.toLong * 1024L + i.toLong
    var x = (k * 3266489917L + 40503L) % 2147483648L
    x ^= x >> 14
    x = (x * 2246822519L) % 2147483648L
    x ^= x >> 12
    x.toDouble / 1073741824.0 - 1.0
  }

  /** Column-API entry point; input must be (castable to) array<double>. */
  def apply(v: Column, bits: Int): Column =
    Bridge.toColumn(HyperplaneSignature(
      Bridge.toExpression(v.cast("array<double>")), bits))
}
