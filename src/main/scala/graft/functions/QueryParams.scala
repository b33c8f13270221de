package graft.functions

/** Positional `?` parameter binding.
  *
  * The reference binds CLI strings as VARCHAR input parameters to the ODBC
  * statement (`src/query.rs:62-66`, `src/main.rs:226-234`) — every parameter
  * is a text value the DBMS coerces in context. Spark SQL has no client-side
  * bind protocol, so parity is safe literal substitution: each `?` becomes a
  * single-quoted, escaped string literal, and Catalyst's implicit casts
  * reproduce the coerce-in-context semantics.
  *
  * `?` inside single-quoted literals is left untouched.
  */
object QueryParams {

  def substitute(sql: String, params: Seq[String]): String = {
    val out = new StringBuilder
    var inString = false
    var idx = 0
    var i = 0
    while (i < sql.length) {
      val ch = sql.charAt(i)
      if (ch == '\'') { inString = !inString; out.append(ch) }
      else if (ch == '?' && !inString) {
        if (idx >= params.length)
          throw new IllegalArgumentException(
            s"query has more '?' placeholders than the ${params.length} parameter(s) supplied")
        out.append(quote(params(idx)))
        idx += 1
      } else out.append(ch)
      i += 1
    }
    if (idx < params.length)
      throw new IllegalArgumentException(
        s"${params.length} parameter(s) supplied but only $idx '?' placeholder(s) in query")
    out.toString
  }

  /** Single-quoted SQL string literal with '' escaping (and backslash kept
    * literal — ANSI string semantics, valid for both Spark and DuckDB). */
  def quote(v: String): String = "'" + v.replace("'", "''") + "'"
}
