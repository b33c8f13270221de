package graft

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-side TYPE contract, making the round-8 m7 failure class
  * unrepresentable: DuckDB's `SUM(...)` over integers returns HUGEINT, and
  * an oracle exposing an un-cast SUM-derived integer column hash-diverges
  * from the Spark twin in the driver's compare even when every VALUE is
  * row-for-row identical. This spec DESCRIBEs every `SparkEntry.oracleSql`
  * in DuckDB (via the driver-side python, through tools/oracletypes.py —
  * DESCRIBE plans without executing, so the whole battery is sub-second)
  * and fails on:
  *   - any column typed HUGEINT/UHUGEINT (un-cast integer SUM/PRODUCT),
  *   - any column typed DECIMAL (un-cast decimal SUM — Spark twins always
  *     `.cast("double")` or cast to BIGINT; a DECIMAL repr like
  *     `Decimal('5.00')` never hash-matches either),
  *   - any oracle that fails to DESCRIBE at all (syntax drift caught at
  *     test time instead of at the round gate),
  *   - any type outside the closed set the 170 green round-8 oracles
  *     actually use, so a NEW divergent type (TIME, INTERVAL, HUGEINT in
  *     a fresh disguise) needs a deliberate allowlist edit here.
  */
class OracleTypeSpec extends AnyFunSuite {

  // the complete type vocabulary of the round-8 green oracles (base names;
  // DECIMAL deliberately absent)
  private val allowed = Set(
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "VARCHAR", "DOUBLE",
    "FLOAT", "BOOLEAN", "DATE", "TIMESTAMP")

  test("every oracle DESCRIBEs in DuckDB with no HUGEINT/DECIMAL column") {
    val json = Verify.oracleJson
    val tmp = java.nio.file.Files.createTempFile("oracle_sql", ".json")
    java.nio.file.Files.writeString(tmp, json)
    val tool = new java.io.File("tools/oracletypes.py")
    assume(tool.exists(), "tools/oracletypes.py not found (run from repo root)")
    val pb = new ProcessBuilder(
      "python3", tool.getPath, TestSession.sf, tmp.toString)
    // combined stream: reading stdout to EOF before stderr can deadlock
    // once either side outgrows the pipe buffer; the line-oriented
    // GRAFT-tagged records below are unambiguous on a merged stream
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val code = proc.waitFor()
    if (code != 0 && out.contains("ModuleNotFoundError"))
      cancel(s"driver python lacks duckdb here: ${out.linesIterator.toSeq.lastOption.getOrElse("")}")
    assert(code == 0, s"oracletypes.py failed (exit $code):\n$out")

    // GRAFT\tname\tcol\tTYPE records, one per column — any type name
    // (including list types like BIGINT[]) parses, and stray warning
    // lines on the merged stream are skipped
    val parsed: Map[String, Seq[(String, String)]] =
      out.linesIterator.toSeq
        .map(_.split("\t", -1))
        .collect { case Array("GRAFT", name, col, tpe) => (name, col, tpe) }
        .groupBy(_._1).view
        .mapValues(_.map(r => (r._2, r._3)).toSeq).toMap
    assert(parsed.keySet == SparkEntry.oracleSql.keySet,
      s"tool must report every oracle; missing: ${SparkEntry.oracleSql.keySet -- parsed.keySet}")

    val describeErrors = parsed.collect {
      case (name, cols) if cols.exists(_._1 == "__error__") =>
        s"$name: ${cols.find(_._1 == "__error__").get._2}"
    }
    assert(describeErrors.isEmpty,
      s"oracles that fail to DESCRIBE:\n${describeErrors.mkString("\n")}")

    val offenders = for {
      (name, cols) <- parsed.toSeq
      (col, tpe) <- cols
      base = tpe.takeWhile(c => c != '(' && c != '[').trim
      if !allowed.contains(base)
    } yield s"$name.$col : $tpe"
    assert(offenders.isEmpty,
      "oracle columns typed outside the allowed vocabulary (HUGEINT = " +
        "un-cast SUM; DECIMAL = un-cast decimal aggregate; both " +
        s"hash-diverge from the Spark twin):\n${offenders.mkString("\n")}")
  }
}
