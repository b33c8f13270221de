package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JdbcSink

/** Dialect-level pinning of the reverse path's generated statements.
  *
  * The reference proves MSSQL + Postgres against live containers
  * (tests/integration.rs:27-38); this sandbox has no network, so the
  * dialect quirks a user hits first — identifier quoting and case
  * folding — are pinned at the statement level through Spark's own
  * dialect registry (the registry `df.write.jdbc` consults at runtime,
  * so these strings ARE what the insert path sends per url). */
class JdbcDialectSpec extends AnyFunSuite {

  private val cols = Seq("a", "Mixed Case")

  test("postgres: double-quoted identifiers, case preserved") {
    assert(JdbcSink.insertStatement("t", cols, "jdbc:postgresql://h/db") ==
      """INSERT INTO t ("a", "Mixed Case") VALUES (?, ?)""")
  }

  test("mssql: identifiers quoted per Spark's MsSqlServerDialect") {
    val s = JdbcSink.insertStatement("t", cols, "jdbc:sqlserver://h;databaseName=db")
    info(s)
    assert(s == """INSERT INTO t ("a", "Mixed Case") VALUES (?, ?)""")
  }

  test("mysql: backtick-quoted identifiers") {
    assert(JdbcSink.insertStatement("t", cols, "jdbc:mysql://h/db") ==
      "INSERT INTO t (`a`, `Mixed Case`) VALUES (?, ?)")
  }

  test("derby (the dialect e2/e3 prove live): default double quoting") {
    assert(JdbcSink.insertStatement("t", cols, "jdbc:derby:memory:db") ==
      """INSERT INTO t ("a", "Mixed Case") VALUES (?, ?)""")
  }

  test("unquoted reference-parity surface is unchanged (insert.rs:55-66)") {
    assert(JdbcSink.insertStatement("t", cols) ==
      "INSERT INTO t (a, Mixed Case) VALUES (?, ?)")
  }
}
