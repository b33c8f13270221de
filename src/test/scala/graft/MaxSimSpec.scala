package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** s8 MaxSim multi-vector retrieval: pure-Scala twin (bit-exact — the
  * kernel's in-order double fold is reproduced literally) plus a
  * discrimination check that MaxSim is not single-vector cosine re-skinned. */
class MaxSimSpec extends AnyFunSuite {
  import TestSession._

  private val Sub = 4
  private val Width = 16

  private def load(): Array[(Long, Array[Float])] =
    Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def slices(v: Array[Float]): Array[Array[Double]] =
    Array.tabulate(Sub)(i =>
      v.slice(i * Width, (i + 1) * Width).map(_.toDouble))

  test("s8: pure-Scala MaxSim twin reproduces every scored row exactly") {
    val vecs = load()
    val sliced = vecs.map { case (id, v) => (id, slices(v)) }
    val qs = sliced.filter(_._1 % 50 == 0).sortBy(_._1).take(64)
    assert(qs.nonEmpty, "sf0.001 must contain at least one query vector")
    val expected = qs.flatMap { case (qid, qsl) =>
      val scored = sliced.filter(_._1 != qid).map { case (id, dsl) =>
        // Σᵢ maxⱼ cos(qᵢ, dⱼ) — the same fold order as the operator
        val score = (0 until Sub).map { i =>
          (0 until Sub).map { j =>
            dot(qsl(i), dsl(j)) /
              math.sqrt(dot(qsl(i), qsl(i)) * dot(dsl(j), dsl(j)))
          }.max
        }.reduceLeft(_ + _)
        (id, score)
      }
      scored.sortBy { case (id, sc) => (-sc, id) }.take(5).zipWithIndex
        .map { case ((id, sc), r) => (qid, r + 1, id, sc) }
    }.toSeq
    val got = Similarity.s8Maxsim(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected, "MaxSim rows must equal the pure-Scala twin")
  }

  test("s8: MaxSim ranking differs from single-vector cosine somewhere") {
    // if slicing + max-pooling always reproduced whole-vector cosine order,
    // the operator would be s1 re-skinned; real late interaction reorders
    val s8 = Similarity.s8Maxsim(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val s1 = Similarity.s1AnnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(s8.toSet != s1.toSet,
      "MaxSim top-k should not be identical to whole-vector cosine top-k")
  }
}
