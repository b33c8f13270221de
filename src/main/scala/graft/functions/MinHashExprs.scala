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

/** One-pass shingling: text → sorted distinct 64-bit hashes of its word
  * n-grams. Folds tokenize → shingle → hash → distinct → sort (five array
  * operators in the compositional form) into a single scan of the UTF-8
  * bytes with no intermediate string allocation: each token contributes its
  * FNV state, and an n-gram's hash mixes the n token hashes in order. */
object ShingleKernels {
  def shingleHashes(s: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val tokenHashes = scala.collection.mutable.ArrayBuffer.empty[Long]
    var h = 0xcbf29ce484222325L
    var inToken = false
    var i = 0
    while (i <= bytes.length) {
      val ws = i == bytes.length || bytes(i) == ' ' || bytes(i) == '\t' ||
        bytes(i) == '\n' || bytes(i) == '\r'
      if (!ws) {
        h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
        inToken = true
      } else if (inToken) {
        tokenHashes += h
        h = 0xcbf29ce484222325L
        inToken = false
      }
      i += 1
    }
    val m = tokenHashes.length
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m - n + 1)
    var j = 0
    while (j <= m - n) {
      var acc = 0xcbf29ce484222325L
      var t = j
      while (t < j + n) { acc = (acc ^ tokenHashes(t)) * 0x100000001b3L; t += 1 }
      out(j) = MinHashKernels.mix(acc)
      j += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedupe of the sorted hashes
    var w = 0
    var r = 1
    while (r < out.length) {
      if (out(r) != out(w)) { w += 1; out(w) = out(r) }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w + 1))
  }
}

/** shingle_hashes(text) → sorted distinct hashes of word n-grams. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ShingleKernels.shingleHashes(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleKernels$$.MODULE$$.shingleHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
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
