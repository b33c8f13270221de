package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.GraftBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization kernel. A text corpus scraped from the web
  * spells the same grapheme both precomposed (U+00E9 é) and decomposed
  * (e + U+0301): byte-level dedup keys, groupBys, and joins silently
  * treat those as DIFFERENT documents unless keys are normalized first —
  * the canonical-form step every large-scale text pipeline runs before
  * exact dedup. Spark has no builtin; this is the native-Expression
  * realization (static-call codegen, stays inside WholeStageCodegen),
  * oracle-matched against DuckDB's `nfc_normalize` (both implement
  * Unicode NFC, verified byte-identical on precomposed/decomposed/
  * fullwidth probes). NFC — not NFKC — on purpose: canonical equivalence
  * merges alternate encodings of the SAME text, while compatibility
  * folding (fullwidth → ASCII etc.) is a lossy editorial choice left to
  * explicit cleaning stages. */
object TextNorm {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan; most real text
    // is already NFC, so the allocating normalize call is the exception
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression)
    extends UnaryExpression with GraftBridge.ExpectsStringInput {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = TextNorm.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm$$.MODULE$$.nfc($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextNormFunctions {
  def nfc_normalize(c: Column): Column = toCol(NfcNormalize(toExpr(c)))
  // SQL registration lives in GraftExtensions (the single registration
  // path) — no per-module registerAll to drift against it
}
