package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass MinHash banding: shingle hashes → LSH band buckets.
  *
  * The compositional formulation (one `transform`+`array_min` per signature)
  * traverses the shingle array once PER SIGNATURE — 32 passes for a 32-hash
  * family. This kernel computes every signature in a single pass (per
  * element, one cheap splitmix64 mix per hash function), then folds each
  * band of signatures into one 64-bit bucket id. Output: array of
  * `nSig/bandRows` bucket values, ready to posexplode into the candidate
  * join keys. */
object MinHashKernels {

  private final val Golden = 0x9e3779b97f4a7c15L

  /** splitmix64 finalizer — a full-avalanche 64-bit mixer. */
  def mix(z0: Long): Long = {
    var z = z0 + Golden
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def buckets(hashes: ArrayData, nSig: Int, bandRows: Int): ArrayData = {
    val sigs = Array.fill(nSig)(Long.MaxValue)
    val n = hashes.numElements()
    var e = 0
    while (e < n) {
      val h = hashes.getLong(e)
      var i = 0
      while (i < nSig) {
        // the i-th hash family: mix(h xor (i+1)*Golden)
        val v = mix(h ^ ((i + 1) * Golden))
        if (v < sigs(i)) sigs(i) = v
        i += 1
      }
      e += 1
    }
    val nBands = nSig / bandRows
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var acc = 0xcbf29ce484222325L
      var r = b * bandRows
      while (r < (b + 1) * bandRows) {
        acc = (acc ^ sigs(r)) * 0x100000001b3L
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** minhash_buckets(array<long>) → array<long> of band bucket ids. */
case class MinHashBuckets(child: Expression, nSig: Int, bandRows: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    MinHashKernels.buckets(v.asInstanceOf[ArrayData], nSig, bandRows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashKernels$$.MODULE$$.buckets($c, $nSig, $bandRows)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
