package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the gate-registry counts the docs cite (README "134 gate queries,
  * 127 oracle-checked"): adding or removing a query without updating the
  * numbers fails here instead of silently drifting (the round-7 cosmetic
  * finding). */
class SparkEntrySpec extends AnyFunSuite {

  test("registry counts match the documented 216 queries / 209 oracles") {
    assert(SparkEntry.queries.size == 216,
      s"queries registry now has ${SparkEntry.queries.size} entries — " +
        "update README.md and this pin together")
    assert(SparkEntry.oracleSql.size == 209,
      s"oracle registry now has ${SparkEntry.oracleSql.size} entries — " +
        "update README.md and this pin together")
  }

  test("every oracle key has a query; non-oracle queries are the 7 self-gated ones") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    val selfGated = q -- o
    assert(selfGated.size == 7,
      s"expected 7 quantitatively self-gated queries, got ${selfGated.size}: $selfGated")
  }
}
