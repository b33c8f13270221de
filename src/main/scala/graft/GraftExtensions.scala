package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** SparkSessionExtensions entry point: registers every custom Catalyst
  * expression as a SQL function, so any session built with
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (or `.withExtensions(new GraftExtensions)`) can call the kernels from
  * plain SQL — `time_text_to_micros(c)`, `dot_product(a, b)`, `fnv64(s)`,
  * … This is the library's cluster-deployment surface: no code changes in
  * the consuming job, just a conf line.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, s"graft kernel $name", "", "", "",
      "misc_funcs", "4.0.0", "", "scala_udf")

  private def fn(e: SparkSessionExtensions, name: String,
      builder: Seq[Expression] => Expression): Unit =
    e.injectFunction((FunctionIdentifier(name), info(name),
      (args: Seq[Expression]) => builder(args)))

  override def apply(e: SparkSessionExtensions): Unit = {
    fn(e, "time_text_to_micros", a => TimeTextToMicros(a.head))
    fn(e, "time_text_to_millis", a => TimeTextToMillis(a.head))
    fn(e, "time_text_to_nanos", a => TimeTextToNanos(a.head))
    fn(e, "timestamp_tz_to_micros", a => TimestampTzTextToMicros(a.head))
    fn(e, "micros_of_day_to_text", a => MicrosOfDayToText(a.head))
    fn(e, "fnv64", a => Fnv64(a.head))
    fn(e, "min_kgram_hash", a => MinKgramHash(a.head))
    fn(e, "simhash64", a => SimHash64(a.head))
    fn(e, "cdc_boundaries", a => CdcBoundaries(a.head))
    fn(e, "nfc_normalize", a => NfcNormalize(a.head))
    fn(e, "dot_product", a => DotProduct(a.head, a(1)))
    fn(e, "jaccard_sorted", a => JaccardSorted(a.head, a(1)))
    fn(e, "intersect_count_sorted", a => IntersectCountSorted(a.head, a(1)))
    fn(e, "intersect_sorted", a => IntersectSorted(a.head, a(1)))
    fn(e, "minhash_buckets", a => MinHashBuckets(a.head, 32, 4))
    fn(e, "zorder2", a => ZOrder2(a.head, a(1)))
    fn(e, "sq8_adc_dot", a => Sq8AdcDot(a.head, a(1), a(2), a(3)))
    fn(e, "pq_lut", a => PqLut(a.head, a(1), a(2), a(3)))
    fn(e, "pq_lut_score", a => PqLutScore(a.head, a(1), a(2)))
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
