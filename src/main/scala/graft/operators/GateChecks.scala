package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-gate self-checks for queries whose results no SQL oracle can
  * recompute (LSH/sketch/hash-family outputs).
  *
  * The driver's only automatic signal for a no-oracle query is `rows > 0`,
  * so each such query embeds its own quantitative acceptance test — recall
  * vs an exact twin, sketch error vs exact aggregates, golden-value probes
  * — as a 1-row boolean and FILTERS its entire output on it. A quality
  * regression (recall collapse, sketch divergence, kernel drift) yields
  * zero rows and fails the gate, instead of passing rows-only forever.
  *
  * Cost posture: every check is either blocked/sampled (same shape as the
  * operator itself) or a per-group aggregate — nothing quadratic in the
  * corpus, so the checks scale with the queries they guard. */
object GateChecks {

  /** `check` must be a 1-row DataFrame with a boolean `gate_ok` column;
    * the result passes through iff it is true. Any OTHER columns of the
    * check frame (measured metrics, by convention integer `*_ppm`) ride
    * along as constant output columns: a no-oracle gate's artifact then
    * shows its measured margin every round — e.g. `recall_ppm = 780000`
    * against a 0.60 floor — instead of only pass/fail. Verify aggregates
    * them into `gate_metrics.json`. */
  def require(result: DataFrame, check: DataFrame): DataFrame =
    result.crossJoin(broadcast(check)).filter(col("gate_ok")).drop("gate_ok")

  /** Like [[require]], but for checks DERIVED from the result: the result
    * is cached so the output branch and the verdict branch share one
    * computation instead of re-executing the (expensive) candidate
    * pipeline twice. The cache is small — these are final result sets —
    * and is released by the runner via [[CacheScope.releaseAll]] after the
    * query materializes. */
  def requireCached(result: DataFrame, mkCheck: DataFrame => DataFrame): DataFrame = {
    val cached = CacheScope.persist(result)
    require(cached, mkCheck(cached))
  }

  /** Recall floor vs an exact twin, the shared shape of the recall gates:
    * `exact`'s key pairs must be recovered by the result at ratio ≥
    * `floor`, vacuously true when the exact set is empty. One definition
    * (key columns parameterized — ANN gates join on (q_id, vec_id), the
    * dedup gates on (a_id, b_id)) so the gates cannot silently diverge.
    *
    * `report = true` (the no-oracle gates) appends the measured recall as
    * a constant `recall_ppm` column so the margin over the floor is
    * visible in every round's artifact. Oracle-backed users (s4, whose
    * rescore window makes it result-identical to exact) keep the default:
    * an extra column would break their hash compare. recall_ppm is
    * DELIBERATELY NULL when the truth set is empty — the gate passed
    * vacuously, and a sentinel 1000000 would be indistinguishable from a
    * genuinely measured perfect recall (the d4-at-sf0.01 lesson: an
    * empty-truth floor should LOOK unmeasured, which is what prompted
    * the twin injection that made it measurable). */
  def requireRecall(result: DataFrame, exact: DataFrame, floor: Double,
      report: Boolean = false,
      keys: Seq[String] = Seq("q_id", "vec_id")): DataFrame =
    requireCached(result, f => {
      val joined = exact
        .join(f.select(keys.map(col) :+ lit(1).as("hit"): _*), keys, "left_outer")
      val okCol = (count(lit(1)) === 0 ||
        sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1)) >= floor)
        .as("gate_ok")
      if (report)
        joined.agg(okCol,
          (sum(coalesce(col("hit"), lit(0))) * 1000000L /
            greatest(count(lit(1)), lit(1L))).cast("long").as("recall_ppm"))
      else joined.agg(okCol)
    })
}
