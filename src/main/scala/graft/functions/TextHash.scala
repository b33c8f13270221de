package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.GraftBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Document-fingerprinting kernels: 64-bit content hash, winnowing-style
  * k-gram rolling fingerprint, and SimHash — the text-analysis primitives a
  * training-data pipeline needs for dedup at corpus scale. All are native
  * Catalyst expressions (static-call codegen) over UTF8 bytes; none shuffle
  * or allocate per row beyond the hash state. */
object TextHash {

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** FNV-1a 64-bit over the UTF-8 bytes. */
  def fnv64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** Rolling-hash document fingerprint: min FNV-1a over all byte k-grams
    * (k=8) — a winnowing-style content signature stable under reordering of
    * surrounding text. Short docs (<k bytes) hash whole-content. */
  def minKgramHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    val k = 8
    if (bytes.length < k) return fnv64(s)
    var min = Long.MaxValue
    var start = 0
    while (start <= bytes.length - k) {
      var h = FnvOffset
      var i = start
      while (i < start + k) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
      // unsigned comparison: fingerprints are uniform 64-bit values
      if (java.lang.Long.compareUnsigned(h, min) < 0) min = h
      start += 1
    }
    min
  }

  /** 64-bit SimHash over a token array: per-token FNV-1a votes each bit up
    * or down; the sign of each tally is the output bit. Near-duplicate docs
    * differ in few bits (hamming distance). */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = fnv64(tokens.getUTF8String(t))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** Lossy UTF-8 decode: invalid byte sequences become U+FFFD instead of
  * failing the query (reference text.rs:148-163 from_utf8_lossy parity —
  * Spark 4's builtin `decode` hard-errors under ANSI). */
case class Utf8Lossy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = UTF8String.fromString(
    new String(v.asInstanceOf[Array[Byte]], java.nio.charset.StandardCharsets.UTF_8))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"new java.lang.String($c, java.nio.charset.StandardCharsets.UTF_8))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class Fnv64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = TextHash.fnv64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash$$.MODULE$$.fnv64($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class MinKgramHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = TextHash.minKgramHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash$$.MODULE$$.minKgramHash($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** tokens: array<string> → 64-bit simhash. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = TextHash.simhash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash$$.MODULE$$.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextHashFunctions {
  def fnv64(c: Column): Column = toCol(Fnv64(toExpr(c)))
  def min_kgram_hash(c: Column): Column = toCol(MinKgramHash(toExpr(c)))
  def simhash64(tokens: Column): Column = toCol(SimHash64(toExpr(tokens)))

  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    GraftBridge.registerFunction(spark, "fnv64", e => Fnv64(e.head))
    GraftBridge.registerFunction(spark, "min_kgram_hash", e => MinKgramHash(e.head))
    GraftBridge.registerFunction(spark, "simhash64", e => SimHash64(e.head))
  }
}
