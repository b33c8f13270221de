package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two `array<float|double>` columns.
  *
  * The compositional form (`zip_with` + `aggregate`) materializes an
  * intermediate array per row-pair; at 10⁵–10⁹ candidate pairs that
  * allocation dominates. This expression walks both ArrayData buffers
  * directly in generated code — no allocation, same in-order double
  * accumulation, so results stay bit-identical to the fold (and to the
  * DuckDB oracle's sequential loop).
  */
object VectorKernels {
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    acc
  }

  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)
}

case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def fn: String =
    (elemType(left), elemType(right)) match {
      case (FloatType, FloatType) => "dotFF"
      case (DoubleType, DoubleType) => "dotDD"
      case (FloatType, DoubleType) => "dotFD"
      case (DoubleType, FloatType) => "dotDF"
      case (l, r) => throw new IllegalArgumentException(
        s"dot_product needs float/double arrays, got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    fn match {
      case "dotFF" => VectorKernels.dotFF(x, y)
      case "dotDD" => VectorKernels.dotDD(x, y)
      case "dotFD" => VectorKernels.dotFD(x, y)
      case _ => VectorKernels.dotDF(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels$$.MODULE$$.$fn($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
