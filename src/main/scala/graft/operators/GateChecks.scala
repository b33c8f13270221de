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

  /** `check` must be a 1-row DataFrame with a single boolean `gate_ok`
    * column; the result passes through iff it is true. */
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

  /** Recall floor vs an exact twin, the shared shape of the ANN gates
    * (s2/s3): `exact`'s (q_id, vec_id) pairs must be recovered by the
    * result at ratio ≥ `floor`, vacuously true when the exact set is
    * empty. One definition so the two gates cannot silently diverge. */
  def requireRecall(result: DataFrame, exact: DataFrame, floor: Double): DataFrame =
    requireCached(result, f =>
      exact
        .join(f.select(col("q_id"), col("vec_id"), lit(1).as("hit")),
          Seq("q_id", "vec_id"), "left_outer")
        .agg((count(lit(1)) === 0 ||
          sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1)) >= floor)
          .as("gate_ok")))
}
