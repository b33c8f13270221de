package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Jaccard similarity of two SORTED long arrays via a single merge walk —
  * O(n+m) with zero allocation, vs the hash-set build that
  * `array_intersect`/`array_union` perform per pair. Inputs must be sorted
  * ascending and deduplicated (producers sort once on the scan side, which
  * amortizes across every pair the row participates in). */
object SetKernels {
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  /** A ∩ B of two SORTED deduplicated long arrays as a sorted array — the
    * [[intersectCountSorted]] walk materializing the common ELEMENTS, for
    * consumers that need the members and not just the count (d21 credits
    * every closing triangle corner). One bounded allocation per call, no
    * per-element hash probes. */
  def intersectSorted(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val out = new Array[Long](if (na < nb) na else nb)
    var i = 0
    var j = 0
    var k = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { out(k) = x; k += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(out, k))
  }

  /** |A ∩ B| of two SORTED deduplicated long arrays — the same merge walk
    * as [[jaccardSorted]], surfaced as a count for consumers that report
    * exact integer overlap (m6's chunk audit). */
  def intersectCountSorted(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }
}

/** intersect_count_sorted(array<long>, array<long>) → long. Strict input
  * typing (array<long> only): [[SetKernels]] reads raw long lanes out of
  * UnsafeArrayData, so an array<int> argument would silently read garbage —
  * ExpectsInputTypes turns the mistake into an AnalysisException instead. */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression with org.apache.spark.sql.GraftBridge.ExpectsLongArrayPair {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    SetKernels.intersectCountSorted(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SetKernels$$.MODULE$$.intersectCountSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** intersect_sorted(array<long>, array<long>) → sorted array<long>.
  * Strict array<long> input typing for the same lane-safety reason as
  * [[IntersectCountSorted]]. */
case class IntersectSorted(left: Expression, right: Expression)
    extends BinaryExpression with org.apache.spark.sql.GraftBridge.ExpectsLongArrayPair {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    SetKernels.intersectSorted(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SetKernels$$.MODULE$$.intersectSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** jaccard_sorted(array<long>, array<long>) → double. Strict array<long>
  * input typing for the same lane-safety reason as [[IntersectCountSorted]]. */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression with org.apache.spark.sql.GraftBridge.ExpectsLongArrayPair {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    SetKernels.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SetKernels$$.MODULE$$.jaccardSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
