package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.{QueryParams, TimeKernels, TypeKernels}

/** Oracle-checked queries exercising the reference's type-conversion
  * operator inventory (SURVEY §2.2 A-series) on the driver testdata. Each
  * query builds the textual/binary source representation from a parquet
  * column, applies the kernel, and exposes values DuckDB can recompute
  * independently. */
object TypeKernelQueries {

  // ------------------------------------------------------ k1_decimal_cast
  /** A9/A10: INT32-, INT64-, and i128/FLBA-backed decimals from one source.
    * Spark's parquet writer picks the physical encoding per precision, same
    * split as the reference (decimal.rs:42-124). The gate compares on a text
    * surface (final cast to string) because DuckDB's computed decimals are
    * int128-backed regardless of precision, so the raw-decimal dtype never
    * hash-matches even when every value does; the decimal cast itself (the
    * kernel under test) still runs first, and `FooterSpec` pins the raw
    * decimal columns' physical parquet encodings separately. */
  def k1DecimalCast(s: SparkSession, d: String): DataFrame =
    // casts ABOVE the sort (round 16): a global orderBy's range sampler
    // executes its child once before the real shuffle executes it again,
    // so derived columns computed below the sort are paid twice — and
    // here they'd also triple the exchange's bytes (3 rendered strings
    // vs 1 double). The project does not reorder rows: the sort keys are
    // the unique (l_orderkey, l_linenumber) base columns. Measured
    // 2.16 s → 0.77 s at sf0.1, bit-identical output
    // (graft.tools.SortExperiment).
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast("decimal(9,2)").cast("string").as("price_i32"),
        col("l_extendedprice").cast("decimal(18,4)").cast("string").as("price_i64"),
        col("l_extendedprice").cast("decimal(38,6)").cast("string").as("price_i128"))

  // ------------------------------------------------------ k2_decimal_text
  /** A11: decimal rendered as text (p>38 / avoid-decimal fallback), incl.
    * negative account balances. */
  def k2DecimalText(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(col("c_custkey"),
        TypeKernels.decimalText(col("c_acctbal"), 12, 2).as("bal_txt"))
      .orderBy(col("c_custkey"))

  // ----------------------------------------------------- k3_avoid_decimal
  /** --avoid-decimal: scale-0 → plain integer, scale≠0 → text
    * (decimal.rs:36-57,76-100; golden test integration.rs:522-568). */
  def k3AvoidDecimal(s: SparkSession, d: String): DataFrame =
    // kernels above the sort — k1's rationale (unique key o_orderkey)
    orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
      .select(col("o_orderkey"),
        TypeKernels.avoidDecimalInt(col("o_totalprice"), 18).as("total_int"),
        TypeKernels.decimalText(col("o_totalprice"), 12, 2).as("total_txt"))

  // --------------------------------------------------------- k4_time_text
  /** A8 TIME kernel: text "HH:MM:SS.ffffff" → micros/millis since midnight
    * via the custom Catalyst expressions, plus the D6 reverse formatter
    * round-trip. */
  def k4TimeText(s: SparkSession, d: String): DataFrame =
    // kernels above the sort — k1's rationale (unique key event_id); the
    // exchange carries (event_id, ts) instead of four rendered strings
    events(s, d)
      .select(col("event_id"), col("ts"))
      .orderBy(col("event_id"))
      .withColumn("time_txt", date_format(col("ts"), "HH:mm:ss.SSSSSS"))
      .select(col("event_id"), col("time_txt"),
        TimeKernels.time_text_to_micros(col("time_txt")).as("us_of_day"),
        TimeKernels.time_text_to_millis(col("time_txt")).as("ms_of_day"),
        TimeKernels.micros_of_day_to_text(
          TimeKernels.time_text_to_micros(col("time_txt"))).as("roundtrip_txt"))

  // ------------------------------------------------------ k5_timestamp_tz
  /** A7 DATETIMEOFFSET kernel: "y-M-d H:M:S.f +02:00" text → UTC epoch
    * micros (instant semantics). The text is constructed at a +02:00 wall
    * clock so the parse must actually apply the offset to recover the
    * instant. */
  def k5TimestampTz(s: SparkSession, d: String): DataFrame =
    // kernels above the sort — k1's rationale (unique key event_id)
    events(s, d)
      .select(col("event_id"), col("ts"))
      .orderBy(col("event_id"))
      .withColumn("tz_txt", concat(
        date_format(col("ts") + expr("INTERVAL 2 HOURS"), "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        lit(" +02:00")))
      .select(col("event_id"), col("tz_txt"),
        TimeKernels.timestamp_tz_to_micros(col("tz_txt")).as("epoch_us"))

  // ---------------------------------------------------- k6_unsigned_widen
  /** Unsigned TINYINT widening: reinterpret the low byte of a key as a
    * signed byte, widen back to its 0..255 value
    * (column_strategy.rs:145-154). */
  def k6UnsignedWiden(s: SparkSession, d: String): DataFrame = {
    val u = col("p_partkey").bitwiseAND(255)
    val signedByte = when(u > 127, u - 256).otherwise(u)
    part(s, d)
      .select(col("p_partkey"),
        signedByte.cast("int").as("signed_byte"),
        TypeKernels.unsignedTinyint(signedByte).as("unsigned_widened"))
      .orderBy(col("p_partkey"))
  }

  // ---------------------------------------------------------- k7_binary
  /** A14 binary kernels: text→bytes, octet length, hex — BYTE_ARRAY output
    * (the --prefer-varbinary native path) plus a FIXED-LEN(5)-shaped
    * variant via pad-to-width. */
  def k7Binary(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"),
        octet_length(encode(col("p_name"), "UTF-8")).as("blen"),
        hex(encode(col("p_name"), "UTF-8")).as("bhex"),
        hex(encode(rpad(substring(col("p_name"), 1, 5), 5, " "), "UTF-8")).as("fixed5_hex"))
      .orderBy(col("p_partkey"))

  // ------------------------------------------------------------ k8_utf16
  /** A13 UTF-16 text path: encode→decode round-trip must be the identity
    * (JVM strings are UTF-16 native; reference converts via simd). */
  def k8Utf16(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"),
        TypeKernels.utf16Roundtrip(col("p_name")).as("rt"))
      .orderBy(col("p_partkey"))

  // ----------------------------------------------------------- k9_params
  /** Positional `?` parameter binding with all-parameters-are-varchar
    * semantics (src/query.rs:62-66): the bound text is coerced in context
    * by the engine, here through real SQL over a registered view. */
  def k9Params(s: SparkSession, d: String): DataFrame =
    graft.operators.TempViews.withViews(
      s, "lineitem_params" -> lineitem(s, d)) { v =>
      val sql = QueryParams.substitute(
        s"""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
           |FROM ${v("lineitem_params")}
           |WHERE l_quantity >= ? AND l_returnflag = ?
           |ORDER BY l_orderkey, l_linenumber""".stripMargin,
        Seq("48", "R"))
      s.sql(sql)
    }

  // ------------------------------------------------------ k10_nano_range
  /** A6 nanosecond bounds: checked micros→nanos conversion (errors outside
    * 1677–2262 with the reference's remediation bounds) over real data. */
  def k10NanoRange(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"),
        TypeKernels.microsToNanosChecked(unix_micros(col("ts"))).as("epoch_ns"))
      .orderBy(col("event_id"))

  // -------------------------------------------------------- k11_boolean
  /** A4 Bit→bool kernel (boolean.rs:29-52): nullable bit values through the
    * BooleanType mapping, the text rendering, and a mapping-table gate
    * (`SqlBit` must derive `BooleanType`, TypeMapping.scala). */
  def k11Boolean(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TypeMapping
    val mappedOk = TypeMapping.field(
      TypeMapping.SourceColumn("b", TypeMapping.SqlBit),
      TypeMapping.MappingOptions()
    ).dataType == org.apache.spark.sql.types.BooleanType
    val b = when(col("o_orderkey") % 7 === 0, lit(null).cast("boolean"))
      .otherwise(col("o_orderkey") % 2 === 0)
    // kernels above the sort — k1's rationale (unique key o_orderkey)
    orders(s, d)
      .select(col("o_orderkey"))
      .orderBy(col("o_orderkey"))
      .select(col("o_orderkey"),
        b.as("bit_val"),
        b.cast("string").as("bit_txt"),
        lit(mappedOk).as("mapping_ok"))
  }

  // ---------------------------------------------------- k12_unknown_text
  /** A15 unknown-type fallback (column_strategy.rs:224-239): a type the
    * mapping table doesn't know is fetched on its display-size text
    * surface — here a decimal rendered through the same text path — with
    * the B6 length-limit kernel enforcing the variadic byte cap (passes at
    * the default 4096; exceeding raises, spec-covered) and a mapping-table
    * gate (`SqlOther` must derive `StringType`). */
  def k12UnknownText(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TypeMapping
    val mappedOk = TypeMapping.field(
      TypeMapping.SourceColumn("u", TypeMapping.SqlOther(64)),
      TypeMapping.MappingOptions()
    ).dataType == org.apache.spark.sql.types.StringType
    part(s, d)
      .select(col("p_partkey"),
        TypeKernels.enforceLengthLimit(
          col("p_retailprice").cast("decimal(12,2)").cast("string"), 4096)
          .as("unk_txt"),
        TypeKernels.enforceLengthLimit(col("p_type"), 4096).as("type_txt"),
        lit(mappedOk).as("mapping_ok"))
      .orderBy(col("p_partkey"))
  }

  // ------------------------------------------------ k13_binary_codec
  /** Binary↔text codec battery — base64 and hex transport encodings of
    * the binary column plus both round trips proven in-row, the A14
    * adjunct for pipelines that move blobs through text-only channels
    * (JSONL sinks e8, JDBC text params D5, logs). Encodings are pinned
    * to the portable spelling, and BOTH pins were found the hard way:
    * Spark's base64 emits MIME \r\n line breaks every 76 chars (DuckDB
    * emits one unbroken string — strip the breaks), and Spark's hex is
    * lowercase where DuckDB's is UPPERCASE (uppercase here) — exactly
    * the silent transport-format mismatches this gate exists to pin.
    * Round-trip flags compare BINARY equality (decode∘encode = id),
    * not string equality — a codec that normalizes would still fail.
    * Scan-shaped, no exchange. */
  def k13BinaryCodec(s: SparkSession, d: String): DataFrame =
    // codecs above the sort — k1's rationale (unique key doc_id); the
    // exchange carries the raw text ONCE instead of payload + both
    // rendered encodings (~3.3× the bytes), and the b64/hex renders run
    // once instead of twice (range-sampling pass + real pass)
    documents(s, d)
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .select(col("doc_id"),
        regexp_replace(base64(col("payload")), "[\\r\\n]", "").as("b64"),
        upper(hex(col("payload"))).as("hx"),
        (unbase64(base64(col("payload"))) === col("payload")).as("b64_rt"),
        (unhex(hex(col("payload"))) === col("payload")).as("hex_rt"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k13_binary_codec" -> k13BinaryCodec,
    "k11_boolean" -> k11Boolean,
    "k12_unknown_text" -> k12UnknownText,
    "k1_decimal_cast" -> k1DecimalCast,
    "k2_decimal_text" -> k2DecimalText,
    "k3_avoid_decimal" -> k3AvoidDecimal,
    "k4_time_text" -> k4TimeText,
    "k5_timestamp_tz" -> k5TimestampTz,
    "k6_unsigned_widen" -> k6UnsignedWiden,
    "k7_binary" -> k7Binary,
    "k8_utf16" -> k8Utf16,
    "k9_params" -> k9Params,
    "k10_nano_range" -> k10NanoRange
  )

  val oracleSql: Map[String, String] = Map(
    "k13_binary_codec" ->
      """SELECT doc_id,
        |  base64(encode(text)) AS b64,
        |  hex(encode(text)) AS hx,
        |  from_base64(base64(encode(text))) = encode(text) AS b64_rt,
        |  unhex(hex(encode(text))) = encode(text) AS hex_rt
        |FROM documents ORDER BY doc_id""".stripMargin,
    "k11_boolean" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderkey % 2 = 0 END AS bit_val,
        |  CAST(CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderkey % 2 = 0 END AS VARCHAR) AS bit_txt,
        |  TRUE AS mapping_ok
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "k12_unknown_text" ->
      """SELECT p_partkey,
        |  CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR) AS unk_txt,
        |  p_type AS type_txt,
        |  TRUE AS mapping_ok
        |FROM part ORDER BY p_partkey""".stripMargin,
    "k1_decimal_cast" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(9,2)) AS VARCHAR) AS price_i32,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS VARCHAR) AS price_i64,
        |  CAST(CAST(l_extendedprice AS DECIMAL(38,6)) AS VARCHAR) AS price_i128
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "k2_decimal_text" ->
      """SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS bal_txt
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "k3_avoid_decimal" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,0)) AS BIGINT) AS total_int,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS total_txt
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "k4_time_text" ->
      """SELECT event_id,
        |  strftime(ts, '%H:%M:%S.%f') AS time_txt,
        |  epoch_us(ts) - epoch_us(date_trunc('day', ts)) AS us_of_day,
        |  CAST((epoch_us(ts) - epoch_us(date_trunc('day', ts))) // 1000 AS INTEGER) AS ms_of_day,
        |  strftime(ts, '%H:%M:%S.%f') AS roundtrip_txt
        |FROM events ORDER BY event_id""".stripMargin,
    "k5_timestamp_tz" ->
      """SELECT event_id,
        |  strftime(ts + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S.%f') || ' +02:00' AS tz_txt,
        |  epoch_us(ts) AS epoch_us
        |FROM events ORDER BY event_id""".stripMargin,
    "k6_unsigned_widen" ->
      """SELECT p_partkey,
        |  CAST(CASE WHEN (p_partkey & 255) > 127 THEN (p_partkey & 255) - 256
        |            ELSE (p_partkey & 255) END AS INTEGER) AS signed_byte,
        |  CAST(p_partkey & 255 AS INTEGER) AS unsigned_widened
        |FROM part ORDER BY p_partkey""".stripMargin,
    "k7_binary" ->
      """SELECT p_partkey,
        |  octet_length(encode(p_name)) AS blen,
        |  hex(encode(p_name)) AS bhex,
        |  hex(encode(rpad(substring(p_name, 1, 5), 5, ' '))) AS fixed5_hex
        |FROM part ORDER BY p_partkey""".stripMargin,
    "k8_utf16" ->
      """SELECT p_partkey, p_name AS rt FROM part ORDER BY p_partkey""".stripMargin,
    "k9_params" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_quantity >= '48' AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "k10_nano_range" ->
      """SELECT event_id, epoch_us(ts) * 1000 AS epoch_ns
        |FROM events ORDER BY event_id""".stripMargin
  )
}
