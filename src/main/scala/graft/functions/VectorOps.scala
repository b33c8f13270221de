package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float|double>` columns, built from
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs, so
  * they inline into whole-stage codegen and scale with the scan.
  *
  * Accumulation is an in-order left fold in DOUBLE, matching DuckDB's
  * sequential loop bit-for-bit — which is what lets cosine values be
  * oracle-compared exactly instead of with tolerances.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double, in index order — a native expression (see
    * [[DotProduct]]): no intermediate array, same accumulation order as
    * the compositional zip_with/aggregate fold it replaces. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** The compositional fold (kept as the reference semantics for the
    * native kernel; spec asserts bit-equality). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = dot(a, a)

  /** cos(a,b) = dot / sqrt(‖a‖²·‖b‖²) — the exact expression the DuckDB
    * oracle uses, so both engines perform the same float ops in the same
    * order. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** L2-normalized copy of the vector (unit length), for dot-only ANN. */
  def l2normalize(a: Column): Column =
    transform(a, x => x.cast("double") / sqrt(norm2(a)))

  /** Random-hyperplane LSH signature: bit j = sign(v·rⱼ) packed into a
    * long — up to 64 planes fit (63 without touching the sign bit; at 64
    * the signature can be negative, which masked band extraction handles
    * but unsigned-magnitude comparisons would not). Hyperplanes are
    * seeded-deterministic so signatures are stable across runs and
    * partitions. */
  def lshSignature(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      (dot(v, array(p.map(lit): _*)) >= 0).cast("long") * (1L << j)
    }.reduce(_ + _)

  /** Deterministic hyperplanes: nPlanes × dim from a fixed-seed PRNG. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }
}
