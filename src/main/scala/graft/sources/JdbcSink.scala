package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Reverse path: parquet/DataFrame → database.
  *
  * `insert` parity (reference `src/insert.rs:14-66`): the INSERT statement is
  * generated from the DataFrame's column names and executed in row-group-
  * sized batches — Spark's `df.write.jdbc` does exactly this, so [[insert]]
  * is a thin, option-mapped call.
  *
  * `exec` parity (reference `src/execute.rs:12-52`, `src/input.rs:97-177`):
  * arbitrary SQL with NAMED placeholders `?col?` bound per row to parquet
  * columns, rewritten to positional `?` with an index mapping (repeated
  * names allowed, `\?` escapes a literal question mark). Spark has no such
  * operator; realized as `foreachPartition` + `PreparedStatement` batches —
  * each executor partition streams its rows independently, so the operator
  * scales with partition count, holds one batch in memory per task, and
  * never funnels data through the driver.
  */
object JdbcSink {

  /** INSERT: statement auto-generated from column names (insert.rs:55-66). */
  def insert(df: DataFrame, url: String, table: String, batchRows: Int = 1000): Unit = {
    rejectUnsupported(df.schema)
    val props = new java.util.Properties()
    props.setProperty("batchsize", batchRows.toString)
    df.write.mode("append").jdbc(url, table, props)
  }

  /** Statement text Spark/the reference generate for a schema — exposed for
    * test parity with insert.rs:55-66. */
  def insertStatement(table: String, columns: Seq[String]): String =
    s"INSERT INTO $table (${columns.mkString(", ")}) VALUES " +
      s"(${columns.map(_ => "?").mkString(", ")})"

  /** Dialect-aware variant: identifiers quoted per the TARGET database's
    * rules, resolved from the JDBC url through Spark's own dialect
    * registry ([[org.apache.spark.sql.jdbc.JdbcDialects]]) — the same
    * registry `df.write.jdbc` consults, so this surface previews exactly
    * what [[insert]] sends. The reference proves MSSQL + Postgres against
    * live containers (tests/integration.rs:27-38, docker-compose.yml);
    * this environment has no network, so dialect coverage is pinned at
    * the statement level instead: JdbcDialectSpec records the exact text
    * generated per dialect url (Postgres/MSSQL/Derby/MySQL), which is
    * where the quoting quirks a user hits first live (`"c"` vs
    * backticks; mixed-case folding). */
  def insertStatement(table: String, columns: Seq[String], url: String): String = {
    val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
    s"INSERT INTO $table (${columns.map(dialect.quoteIdentifier).mkString(", ")}) " +
      s"VALUES (${columns.map(_ => "?").mkString(", ")})"
  }

  /** `?name?` → positional rewrite (execute.rs:64-109). Returns the
    * positional SQL and the referenced column names in parameter order.
    * `\?` emits a literal `?` and binds nothing. */
  def toPositionalArguments(sql: String): (String, Seq[String]) = {
    val out = new StringBuilder
    val names = Seq.newBuilder[String]
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\\' && i + 1 < sql.length && sql.charAt(i + 1) == '?') {
        out.append('?'); i += 2
      } else if (c == '?') {
        val end = sql.indexOf('?', i + 1)
        if (end < 0)
          throw new IllegalArgumentException(
            s"unterminated named placeholder at offset $i in: $sql")
        val name = sql.substring(i + 1, end)
        if (name.isEmpty)
          throw new IllegalArgumentException(
            s"empty placeholder name at offset $i in: $sql")
        out.append('?'); names += name; i = end + 1
      } else { out.append(c); i += 1 }
    }
    (out.toString, names.result())
  }

  /** EXEC: run `sql` once per DataFrame row, parameters bound from the named
    * columns, batched per partition. */
  def exec(df: DataFrame, sql: String, url: String, batchRows: Int = 1000): Unit = {
    rejectUnsupported(df.schema)
    val (positional, names) = toPositionalArguments(sql)
    val schema = df.schema
    // IndexMapping (input.rs:97-177): parameter position → row field index;
    // repeated names simply reuse the same field index.
    val fieldIdx: Array[Int] = names.map { n =>
      schema.fieldNames.indexOf(n) match {
        case -1 => throw new IllegalArgumentException(
          s"placeholder ?$n? does not match any input column " +
            s"(have: ${schema.fieldNames.mkString(", ")})")
        case idx => idx
      }
    }.toArray
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(url)
        try {
          val ps = conn.prepareStatement(positional)
          var pending = 0
          rows.foreach { row =>
            bind(ps, row, fieldIdx)
            ps.addBatch()
            pending += 1
            if (pending >= batchRows) { ps.executeBatch(); pending = 0 }
          }
          if (pending > 0) { ps.executeBatch(); () }
        } finally conn.close()
      }
      ()
    }
  }

  private def bind(ps: PreparedStatement, row: Row, fieldIdx: Array[Int]): Unit = {
    var p = 0
    while (p < fieldIdx.length) {
      val v = row.get(fieldIdx(p))
      if (v == null) ps.setObject(p + 1, null) else ps.setObject(p + 1, v)
      p += 1
    }
  }

  /** Input rejection parity (input.rs:188-193 non-primitive, :350-355 INT96,
    * :491-495 INTERVAL, :420-428 DECIMAL p>38): nested Spark types cannot be
    * bound as scalar parameters. */
  private def rejectUnsupported(schema: StructType): Unit =
    schema.fields.foreach { f =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType =>
          throw new IllegalArgumentException(
            s"column ${f.name}: nested type ${f.dataType.simpleString} cannot " +
              "be inserted — only primitive columns are supported")
        case _: CalendarIntervalType =>
          throw new IllegalArgumentException(
            s"column ${f.name}: INTERVAL values are not supported for insertion")
        case _ => ()
      }
    }
}
