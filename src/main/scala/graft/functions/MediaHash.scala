package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Perceptual-hash kernel over opaque media payloads (m10): an
  * average-hash (aHash) style 64-bit signature computed from payload
  * BYTES. Real aHash downsamples decoded pixels to an 8×8 luma grid and
  * sets bit b iff cell b is brighter than the global mean; the codec step
  * is stubbed by the multimodal contract (no media libs in the engine),
  * so the "grid" here is the deterministic stand-in: cell b accumulates
  * the payload bytes whose PROPORTIONAL position falls in the b-th 64th
  * (cell = ⌊i·64/n⌋) — the same binning a resize-to-64-cells downsample
  * performs, and the property that makes aHash robust: an insertion or
  * re-encode moves cell boundaries slightly instead of re-shuffling every
  * byte's cell (a mod-64 binning was measured to scramble the signature
  * of genuine near-duplicate payloads). Everything downstream of the
  * decode — per-cell aggregation, the mean compare, the bit pack, the
  * banded hamming join — is the real production shape and is what m10
  * gates. Swapping a real decoder in changes only the byte→cell map
  * inside this kernel.
  *
  * The bit rule is exact integer cross-multiplication, never a float
  * mean: bit b is set iff sum_b · n > total · cnt_b (i.e. cell mean
  * strictly above global mean) — bit-portable, and cells beyond a short
  * payload's length (cnt_b = 0) stay 0 under the same compare. */
object MediaHash {

  /** aHash-style 64-bit signature of a byte payload (empty → 0). */
  def ahash64(payload: Array[Byte]): Long = {
    val n = payload.length
    val sum = new Array[Long](64)
    val cnt = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < n) {
      val v = (payload(i) & 0xff).toLong
      // proportional bin: i·64 stays far inside int64 for any payload
      val c = ((i.toLong * 64L) / n).toInt
      sum(c) += v
      cnt(c) += 1L
      total += v
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      // sum_b ≤ 255·⌈n/64⌉ so both products stay far inside int64 for any
      // payload below ~2^27 bytes; larger media would accumulate in the
      // decoder's own downsample, not here
      if (sum(b) * n > total * cnt(b)) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** binary payload → 64-bit aHash signature (codegen static call).
  * Strictly binary input ([[org.apache.spark.sql.GraftBridge
  * .ExpectsBinaryInput]]): a string column must fail analysis with the
  * typed mismatch — the caller encodes explicitly (as m10 does). */
case class AHash64(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.GraftBridge.ExpectsBinaryInput {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    MediaHash.ahash64(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaHash$$.MODULE$$.ahash64($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MediaHashFunctions {
  def ahash64(c: Column): Column = toCol(AHash64(toExpr(c)))
}
