package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.GraftBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** SQ8 scalar quantization for dense vectors: each dimension is mapped to
  * an 8-bit code against per-dimension [lo, hi] bounds — 4× smaller than
  * float32 storage (64 bytes vs 256 for a 64-dim vector), which at corpus
  * scale is 4× less scan I/O, shuffle, and cache footprint for the
  * candidate-generation pass of ANN search (the representation trade Faiss
  * calls SQ8). Scoring is ASYMMETRIC (ADC): the query stays full-precision
  * and corpus codes are dequantized on the fly inside a native kernel, so
  * quantization error enters each pair's score once, not twice.
  *
  * The kernel walks the ArrayData buffers directly in generated code (the
  * [[VectorKernels]] pattern) — no per-pair allocation, no UDF. */
object QuantizeKernels {

  /** ADC dot: full-precision float query `q` · SQ8 `code`, with
    * per-dimension dequantization bounds (`lo`, `step` as double arrays).
    * Codes are stored shifted by −128 to fit the signed byte range. */
  def sq8AdcDot(q: ArrayData, code: ArrayData, lo: ArrayData, step: ArrayData): Double = {
    val n = math.min(q.numElements(), code.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val deq = lo.getDouble(i) + step.getDouble(i) * (code.getByte(i) + 128).toDouble
      acc += q.getFloat(i).toDouble * deq
      i += 1
    }
    acc
  }
}

/** q: array<float> (full-precision query) · code: array<tinyint> (SQ8),
  * dequantized with lo/step: array<double> → double. */
case class Sq8AdcDot(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(q: Any, c: Any, l: Any, st: Any): Any =
    QuantizeKernels.sq8AdcDot(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      l.asInstanceOf[ArrayData], st.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.QuantizeKernels$$.MODULE$$.sq8AdcDot($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object QuantizeFunctions {
  import org.apache.spark.sql.functions._

  /** Encode a float/double vector into SQ8 codes with pinned per-dimension
    * bounds: code = round((x − lo) / step) clamped to [0, 255], stored as
    * code − 128 in a signed byte. Degenerate dimensions (step ≤ 0) encode
    * to 0 and dequantize back to lo — exact. Pure HOF arithmetic, stays in
    * codegen. */
  def sq8Encode(v: Column, lo: Seq[Double], step: Seq[Double]): Column = {
    val loC = typedLit(lo)
    val stC = typedLit(step)
    transform(v, (x, i) => {
      val l = element_at(loC, i + 1)
      val st = element_at(stC, i + 1)
      (when(st > 0.0,
        least(lit(255L), greatest(lit(0L),
          round((x.cast("double") - l) / st).cast("long"))))
        .otherwise(lit(0L)) - 128L).cast("byte")
    })
  }

  /** ADC dot column (see [[QuantizeKernels.sq8AdcDot]]). */
  def sq8AdcDot(q: Column, code: Column, lo: Seq[Double], step: Seq[Double]): Column =
    toCol(Sq8AdcDot(toExpr(q), toExpr(code),
      toExpr(typedLit(lo)), toExpr(typedLit(step))))

  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftBridge.registerFunction(spark, "sq8_adc_dot",
      e => Sq8AdcDot(e(0), e(1), e(2), e(3)))
}
