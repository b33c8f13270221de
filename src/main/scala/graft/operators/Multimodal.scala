package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, batched decode/feature-extract over partitions.
  *
  * The decode itself is STUBBED (no image/audio libs in this environment) by
  * [[StubDecoder.decode]], a deterministic fake keyed on the payload bytes —
  * but everything Spark-side is real: the binary column schema, the
  * partition-batched `mapPartitions` decode (the Scala analog of a
  * `mapInPandas` batch UDF: one decoder init per partition, streaming rows),
  * cluster-proportional repartitioning so decode parallelism tracks the
  * cluster and payload-size skew stays bounded, and the typed metadata
  * struct the downstream pipeline consumes.
  */
object Multimodal {

  /** Typed metadata a real decoder would produce. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Int, width: Int, height: Int, n_frames: Int)

  /** Deterministic fake decoder: replace with an actual image/audio decode.
    * Derives "dimensions" from payload size so results are verifiable. */
  object StubDecoder {
    def decode(id: Long, payload: Array[Byte]): MediaMeta = {
      val n = payload.length
      MediaMeta(id, n, 64 + n % 256, 64 + (n * 7) % 256, 1 + n % 4)
    }
  }

  /** Binary payload view of the documents table (media stand-in). */
  def payloads(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"))

  /** The mapPartitions decode path: one decoder per partition, rows
    * streamed — never a per-row UDF init, never a driver collect.
    *
    * Partitioning contract: decode cost is proportional to payload bytes,
    * so the repartition must (a) scale with the cluster and (b) not let
    * size skew concentrate bytes in one task. Round-robin over
    * 4×defaultParallelism does both: parallelism tracks the cluster (not a
    * hardcoded constant), rows spread evenly so expected bytes/partition
    * are equal under any size distribution, and 4× overpartitioning bounds
    * the straggler cost of an unlucky large-payload draw. (Range-partitioning
    * on size would instead co-locate ALL the largest payloads in one
    * partition — equal row counts, maximally skewed bytes.) */
  def decodeAll(s: SparkSession, d: String): Dataset[MediaMeta] = {
    import s.implicits._
    payloads(s, d)
      .repartition(s.sparkContext.defaultParallelism * 4)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // decoder init would happen here, once per partition
        it.map { case (id, bytes) => StubDecoder.decode(id, bytes) }
      }
  }

  // --------------------------------------------------- m1_multimodal_meta
  /** Metadata extraction over the binary column: size, content digest, and
    * the stub-decoded dimensions — the SQL-expressible projection of
    * [[decodeAll]] (the spec asserts both paths agree). */
  def m1MultimodalMeta(s: SparkSession, d: String): DataFrame =
    payloads(s, d)
      .select(col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        sha2(col("payload"), 256).as("sha256"),
        (lit(64) + octet_length(col("payload")) % 256).as("width"),
        (lit(64) + (octet_length(col("payload")) * 7) % 256).as("height"),
        (lit(1) + octet_length(col("payload")) % 4).as("n_frames"))
      .orderBy(col("doc_id"))

  // ------------------------------------------------------- m2_features
  /** Batched feature extraction over the binary column: a fixed-width
    * feature row per payload (the embedding-pipeline front half — decode
    * → features → ANN). The stub "features" are deterministic projections
    * of the decoded metadata plus a byte histogram moment, so every value
    * is SQL-recomputable and the gate oracles it exactly; a real
    * deployment swaps [[StubDecoder]] for an image/audio model and keeps
    * every piece of the Spark plumbing (schema, batching, partitioning).
    *
    * The gate surface is scalar columns (not array<double>): the driver's
    * pandas compare cannot hash ndarray cells. [[featureVector]] is the
    * assembled-vector view downstream ANN consumes. */
  def m2Features(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"), col("text"))
      .select(col("doc_id"),
        octet_length(col("payload")).cast("double").as("f_bytes"),
        (lit(64) + octet_length(col("payload")) % 256).cast("double").as("f_width"),
        (lit(64) + (octet_length(col("payload")) * 7) % 256).cast("double").as("f_height"),
        // leading code point: a stand-in for a content-derived channel stat
        ascii(substring(col("text"), 1, 1)).cast("double").as("f_c0"))
      .orderBy(col("doc_id"))

  /** Assembled array<double> view of [[m2Features]] for ANN consumers. */
  def featureVector(s: SparkSession, d: String): DataFrame =
    m2Features(s, d).select(col("doc_id"),
      array(col("f_bytes"), col("f_width"), col("f_height"), col("f_c0")).as("features"))

  // ---------------------------------------------------- m3_frame_sample
  /** Frame sampling over video-like payloads: every 2nd frame index with
    * its byte offset into the payload (stub layout: equal-width frames).
    * The explode shape — one row per sampled frame, metadata-derived —
    * is exactly the fan-out a real video pipeline feeds to a decoder;
    * a real deployment swaps the offset arithmetic for container parsing
    * and keeps the plumbing. */
  def m3FrameSample(s: SparkSession, d: String): DataFrame = {
    val nBytes = octet_length(col("payload")).cast("long")
    val nFrames = (lit(1) + octet_length(col("payload")) % 4).cast("long")
    payloads(s, d)
      .select(col("doc_id"), nBytes.as("n_bytes"), nFrames.as("n_frames"))
      .select(col("doc_id"), col("n_bytes"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(2L))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * expr("n_bytes div n_frames")).as("frame_offset"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  // ------------------------------------------------- m5_content_store
  /** Content-addressed storage audit — the dedup-storage plan of a
    * multimodal lake: payloads keyed by digest, stored ONCE per distinct
    * digest no matter how many dataset generations reference them. Two
    * derived generations (g1 = doc_id % 5 ≠ 0 — the d14 snapshot
    * convention; g2 = all docs) stand in for the re-crawl that re-ships
    * mostly-unchanged media. Per source: reference count, distinct-blob
    * count, naive bytes (every reference stored) vs content-addressed
    * bytes (each digest once), and the saving — all exact integers.
    *
    * Scale posture: one groupBy (source, digest) with map-side combine —
    * payload bytes themselves never shuffle (only digest + length leave
    * the scan) — then a per-source rollup of the model-sized digest
    * groups. The digest stands in for payload equality (the d13
    * collision argument; the oracle groups the raw text). */
  def m5ContentStore(s: SparkSession, d: String): DataFrame = {
    // join-free: derive source alongside the payload in one scan
    val base = documents(s, d).select(col("doc_id"), col("source"),
      encode(col("text"), "UTF-8").as("payload"))
    val gens = base.filter(col("doc_id") % 5 =!= 0).union(base)
    gens
      .select(col("source"), sha2(col("payload"), 256).as("digest"),
        octet_length(col("payload")).cast("long").as("n_bytes"))
      .groupBy(col("source"), col("digest"))
      .agg(count(lit(1)).as("refs"), first(col("n_bytes")).as("n_bytes"))
      .groupBy(col("source"))
      .agg(sum(col("refs")).as("n_blobs"),
        count(lit(1)).as("n_unique"),
        sum(col("refs") * col("n_bytes")).as("bytes_naive"),
        sum(col("n_bytes")).as("bytes_stored"))
      .select(col("source"), col("n_blobs"), col("n_unique"),
        col("bytes_naive"), col("bytes_stored"),
        (col("bytes_naive") - col("bytes_stored")).as("bytes_saved"))
      .orderBy(col("source"))
  }

  // --------------------------------------------------- m6_chunk_overlap
  /** Chunk-level content-overlap audit — m4's payload chunking meeting
    * m5's content addressing: each document's payload is cut into fixed
    * 16-char chunks, each chunk digested (md5), and same-source document
    * pairs sharing ANY chunk digest are reported with their exact
    * chunk-Jaccard in integer ppm. This is the chunked-CAS dedup signal
    * (how much of B is literally A?) that drives delta-storage and
    * copy-paste provenance at blob-store scale — complementary to d3's
    * token-level Jaccard, which tolerates reflow; chunk identity demands
    * byte-exact runs.
    *
    * Chunking is per CHARACTER here, not per byte — the Spark side could
    * slice the binary payload directly, but DuckDB cannot substring a
    * BLOB, and a gate's chunking must be replicable by its oracle
    * (collision-equivalent semantics either way; a production byte
    * chunker swaps one expression). Chunks are interned to 64-bit hashes
    * and SORTED on the scan — the d3 discipline — so the per-pair
    * overlap is one O(n+m) merge walk
    * ([[graft.functions.IntersectCountSorted]]); the oracle intersects
    * the raw chunk text, collision-equivalent (d13's accepted argument).
    * Scale posture: the digest arrays are computed ON the scan (one
    * codegen'd transform, payload never leaves its partition); only
    * (doc_id, source, digests) enter the source-blocked pair join — the
    * d3 blocking rule — and at real blob counts the block key extends
    * with a digest MinHash band exactly as d4 documents. */
  def m6ChunkOverlap(s: SparkSession, d: String): DataFrame = {
    val chunk = 16
    // width-guarded (round 17): the per-row chunk-digest transform
    // (~len/16 xxhash64 calls per document) is compute-dense and pipelines
    // inside the scan task; identity at warehouse file counts
    val c = Scans.wide(s,
        documents(s, d).select(col("doc_id"), col("source"), col("text")),
        col("doc_id"))
      .where(length(col("text")) >= 1)
      .select(col("doc_id"), col("source"),
        array_sort(array_distinct(expr(
          s"""transform(sequence(0,
             |  CAST(ceil(length(text) / $chunk.0) AS INT) - 1),
             |  i -> xxhash64(substring(text, i * $chunk + 1, $chunk)))"""
            .stripMargin))).as("dg"))
    val a = c.select(col("source"), col("doc_id").as("a_id"), col("dg").as("a_dg"))
    val b = c.select(col("source"), col("doc_id").as("b_id"), col("dg").as("b_dg"))
    val nCommon = {
      import org.apache.spark.sql.GraftBridge
      GraftBridge.column(graft.functions.IntersectCountSorted(
        GraftBridge.expression(col("a_dg")), GraftBridge.expression(col("b_dg"))))
    }
    a.join(b, Seq("source")).where(col("a_id") < col("b_id"))
      .withColumn("n_common", nCommon)
      .where(col("n_common") > 0)
      .withColumn("n_union",
        (size(col("a_dg")) + size(col("b_dg"))).cast("long") - col("n_common"))
      .select(col("a_id"), col("b_id"), col("n_common"), col("n_union"),
        expr("(1000000 * n_common) div n_union").as("sim_ppm"))
      .orderBy(col("a_id"), col("b_id"))
  }


  // ------------------------------------------------ m8_cdc_chunking
  /** CONTENT-DEFINED chunking — the Rabin/FastCDC family m4's
    * fixed-size chunking deliberately isn't: boundaries are declared
    * wherever a rolling window's hash hits `h % 16 == 0`, so inserting
    * one byte shifts only the chunks around the edit instead of
    * re-chunking the whole payload — the property that makes
    * storage-level dedup (m5) survive small edits. The window hash is
    * the PORTABLE md5-hex-prefix idiom (t11's trick: 4 hex chars →
    * conv base 16 → 16-bit int) rather than a real Gear/Rabin rolling
    * hash, so the oracle lands on the identical boundary set — the
    * boundary-selection ALGEBRA (expected chunk ≈ 16 bytes at
    * divisor 16, count/position invariants) is what's gated; a
    * production deployment swaps in a Gear hash as a native expression
    * (TextHash's family) without touching the plan.
    *
    * Scale posture: entirely scan-shaped — per-document transform/
    * filter/aggregate over the in-row text, no exchange except the
    * presentation sort (and [[Scans.wide]]'s few-files escape hatch);
    * documents chunk independently, which is the whole point of CDC at
    * 100 TB. */
  def m8CdcChunking(s: SparkSession, d: String): DataFrame =
    Scans.wide(s, documents(s, d).select(col("doc_id"), col("text")),
        col("doc_id"))
      .withColumn("bpos", {
        import org.apache.spark.sql.GraftBridge
        // native kernel ≡ the SQL spelling
        // filter(transform(sequence(1, len-7), i -> IF(conv(substr(md5(
        //   substr(text,i,8)),1,4),16,10) % 16 = 0, i, NULL)), notNull) —
        // same boundaries, one MessageDigest reused instead of a Column
        // expression tree per position (5.1 s → ~1 s at sf0.1)
        GraftBridge.column(graft.functions.CdcBoundaries(
          GraftBridge.expression(col("text"))))
      })
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(col("bpos")).cast("long").as("n_boundaries"),
        (size(col("bpos")) + 1).cast("long").as("n_chunks"),
        expr("aggregate(bpos, 0L, (a, x) -> a + x)").as("bpos_sum"))
      .orderBy(col("doc_id"))

  // ------------------------------------------------ m9_cdc_dedup_store
  /** Content-store dedup at CDC-chunk granularity — m8's FastCDC cuts
    * feeding m5's content addressing: each payload is split at its
    * content-defined boundaries, every chunk digested, and the per-source
    * store economics reported (chunks, unique chunks, naive vs stored
    * size, savings). This is the actual design of dedup blob stores
    * (variable-size chunks survive INSERTIONS — a doc that is another doc
    * plus a prefix edit re-aligns at the next content cut and shares its
    * tail chunks, where m6's fixed 16-char grid shares nothing after the
    * shift point). Chunk convention: cut BEFORE each boundary position,
    * so chunk j spans [bⱼ₋₁, bⱼ) with b₀ = 1 and b_last = n_chars+1 —
    * the identical spelling on both engines, so digests are bit-portable.
    *
    * Scale: boundaries + chunk digests compute on the scan (one pass per
    * payload, no shuffle); the only exchange carries (source, digest)
    * aggregates — map-side combined, linear in distinct chunks. */
  def m9CdcDedupStore(s: SparkSession, d: String): DataFrame = {
    val withBounds = Scans.wide(s,
        documents(s, d).select(col("doc_id"), col("source"), col("text")),
        col("doc_id"))
      .withColumn("bpos", {
        import org.apache.spark.sql.GraftBridge
        GraftBridge.column(graft.functions.CdcBoundaries(
          GraftBridge.expression(col("text"))))
      })
    withBounds
      .select(col("source"), explode(expr(
        """zip_with(
          |  concat(array(1L), bpos),
          |  concat(bpos, array(cast(length(text) + 1 as bigint))),
          |  (s, e) -> substring(text, cast(s as int), cast(e - s as int)))
          |""".stripMargin)).as("chunk"))
      .select(col("source"), md5(col("chunk")).as("dg"),
        length(col("chunk")).cast("long").as("n"))
      .groupBy(col("source"), col("dg"))
      .agg(count(lit(1)).as("refs"), min(col("n")).as("n"))
      .groupBy(col("source"))
      .agg(sum(col("refs")).as("n_chunks"),
        count(lit(1)).as("n_unique"),
        sum(col("refs") * col("n")).as("chars_naive"),
        sum(col("n")).as("chars_stored"))
      .select(col("source"), col("n_chunks"), col("n_unique"),
        col("chars_naive"), col("chars_stored"),
        (col("chars_naive") - col("chars_stored")).as("chars_saved"))
      .orderBy(col("source"))
  }

  // ------------------------------------------------ m10_phash_neardup
  /** Perceptual-hash near-duplicate detection over media payloads — the
    * image/audio analogue of d5's text SimHash: re-encodes, recompressions
    * and minor edits of the same asset keep nearby perceptual hashes while
    * cryptographic digests (m1's sha256, m5's store keys) see unrelated
    * blobs. Signature = [[graft.functions.MediaHash.ahash64]] (aHash bit
    * rule in exact integer arithmetic; the pixel decode is the multimodal
    * contract's deterministic stub, everything after it production-real).
    *
    * The gate's payload view carries the near-dup structure the detector
    * exists for: every payload, PLUS — for each 5th document — a
    * deterministically perturbed twin (one character re-written, the
    * "same asset, re-encoded" case; t32's synthesize-the-variant
    * pattern). The corpus's own token-level near-dups are NOT near in
    * payload-byte space (measured: minimum cross-payload hamming 13 at
    * sf0.01), so twins sit within a few bits and everything else ≥ 13 —
    * threshold 3 separates them with a 10-bit margin, and the answer is
    * exactly the twin pairs whose perturbation left ≤ 3 mean-compare
    * flips.
    *
    * Near-dup = same-source pairs with hamming(sig_a, sig_b) ≤ 3. The
    * banded join is LOSSLESS here, not an approximation: 3 differing bits
    * cannot touch all 4 disjoint 16-bit bands (pigeonhole), so every
    * qualifying pair agrees exactly on ≥ 1 band value and the banded
    * candidate set ⊇ the answer — the oracle is the full DuckDB all-pairs
    * hamming join and the compare is hash-exact, unlike d5's h=4..6
    * recall regime. Scale: candidates are keyed on (source, band, value)
    * — never all-pairs — and the probe side is explicitly repartitioned
    * on the join keys (d3's lesson: a byte-light compute-hot stage fed by
    * one scan split otherwise runs as a single task, and AQE's byte-based
    * coalescing would undo an implicit exchange). */
  def m10PhashNeardup(s: SparkSession, d: String): DataFrame = {
    val shufParts = Scans.targetWidth(s)
    val base = documents(s, d).select(col("doc_id"), col("source"), col("text"))
    // payload ids: original = doc_id·2, perturbed twin = doc_id·2 + 1
    val originals = base.select((col("doc_id") * 2).as("pid"), col("source"),
      col("text").as("ptext"))
    val twins = base
      .filter(col("doc_id") % 5 === 0 && length(col("text")) >= 12)
      .select((col("doc_id") * 2 + 1).as("pid"), col("source"),
        concat(substring(col("text"), 1, 10), lit("X"),
          substring(col("text"), 12, 1 << 30)).as("ptext"))
    // the signature kernel is compute-dense, so the cache build is
    // width-guarded like d4's ([[Scans.wide]]) — without it the persist
    // materializes at raw scan-split width
    val sigs = CacheScope.persist(
      Scans.wide(s, originals.unionAll(twins), col("pid"))
        .select(col("pid"), col("source"),
          encode(col("ptext"), "UTF-8").as("payload"))
        .filter(octet_length(col("payload")) > 0)
        .select(col("pid"), col("source"),
          graft.functions.MediaHashFunctions.ahash64(col("payload")).as("sig")))
    val banded = sigs.withColumn("band", explode(array(
        (0 until 4).map(b => struct(lit(b).as("i"),
          col("sig").bitwiseAND(0xffffL << (16 * b)).as("v"))): _*)))
      .select(col("pid"), col("source"), col("sig"), col("band.i"), col("band.v"))
    val l = banded
      .select(col("pid").as("a_id"), col("source"), col("sig").as("siga"),
        col("i"), col("v"))
      .repartition(shufParts, col("source"), col("i"), col("v"))
    val r = banded.select(col("pid").as("b_id"), col("source").as("src_b"),
      col("sig").as("sigb"), col("i").as("i_r"), col("v").as("v_r"))
    l.join(r,
        col("source") === col("src_b") && col("i") === col("i_r") &&
          col("v") === col("v_r") && col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming",
        bit_count(col("siga").bitwiseXOR(col("sigb"))).cast("long"))
      .filter(col("hamming") <= 3)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m10_phash_neardup" -> m10PhashNeardup,
    "m9_cdc_dedup_store" -> m9CdcDedupStore,
    "m8_cdc_chunking" -> m8CdcChunking,
    "m1_multimodal_meta" -> m1MultimodalMeta,
    "m2_features" -> m2Features,
    "m3_frame_sample" -> m3FrameSample,
    "m5_content_store" -> m5ContentStore,
    "m6_chunk_overlap" -> m6ChunkOverlap,
    "m7_shard_manifest" -> m7ShardManifest,
  )

  // ------------------------------------------------ m7_shard_manifest
  /** WebDataset-style shard manifest: assign every payload a (shard,
    * byte-offset) slot in per-source sequential-fill shards with a 16 KiB
    * byte budget — the manifest a multimodal training loader consumes
    * (tar-shard readers want contiguous samples; the manifest IS the
    * index). Assignment is the writer's sequential-fill convention: an
    * item belongs to the shard its START offset falls in
    * (`prev_bytes div budget`), items may straddle the boundary — the
    * same rule on both engines, so the manifest is bit-portable.
    *
    * Scale posture: the running byte total is a window PARTITIONED BY
    * source (one writer per source — exactly how parallel shard writers
    * deploy), so no global single-partition sort exists; a source is one
    * task's worth of manifest rows, and a pathologically hot source
    * would shard its id-space first (t8's hierarchical split). The
    * payload BYTES never move — the manifest derives from octet_length
    * on the scan; the actual tar packing consumes the manifest
    * partition-locally. */
  def m7ShardManifest(s: SparkSession, d: String): DataFrame = {
    val budget = 16384L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    documents(s, d)
      .select(col("doc_id"), col("source"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      .withColumn("prev", sum(col("n_bytes")).over(w) - col("n_bytes"))
      .select(col("doc_id"), col("source"), col("n_bytes"),
        expr(s"prev div $budget").as("shard_seq"),
        expr(s"prev % $budget").as("offset"))
      .orderBy(col("source"), col("doc_id"))
  }

  val oracleSql: Map[String, String] = Map(
    // the aHash signature re-derived relationally (t4's hex byte folds,
    // cells via GROUP BY position mod 64, the same integer
    // cross-multiplied bit rule, HUGEINT bit pack wrapped to BIGINT);
    // the oracle pairs ALL same-source docs — the Spark banding must be
    // lossless at h ≤ 3 (pigeonhole), so the compare is hash-exact
    "m10_phash_neardup" ->
      """WITH pay AS (
        |  SELECT doc_id * 2 AS pid, source, text AS ptext FROM documents
        |  UNION ALL
        |  SELECT doc_id * 2 + 1, source,
        |    substr(text, 1, 10) || 'X' || substr(text, 12)
        |  FROM documents WHERE doc_id % 5 = 0 AND length(text) >= 12),
        |raw AS (
        |  SELECT pid, source, hex(encode(ptext)) AS hx,
        |    octet_length(encode(ptext)) AS n
        |  FROM pay WHERE octet_length(encode(ptext)) > 0),
        |pos AS (
        |  SELECT pid, source, hx, n, unnest(range(1, n+1)) AS i FROM raw),
        |byt AS (
        |  SELECT pid, source, n, CAST(((i-1) * 64) // n AS BIGINT) AS cell,
        |    (16*(strpos('0123456789ABCDEF', hx[2*i-1:2*i-1]) - 1)
        |     + (strpos('0123456789ABCDEF', hx[2*i:2*i]) - 1))::HUGEINT AS v
        |  FROM pos),
        |cells AS (
        |  SELECT pid, source, n, cell, SUM(v)::HUGEINT AS sb,
        |    COUNT(*)::HUGEINT AS cb
        |  FROM byt GROUP BY 1, 2, 3, 4),
        |tot AS (SELECT pid, SUM(sb)::HUGEINT AS total FROM cells GROUP BY 1),
        |sigs AS (
        |  SELECT c.pid, c.source,
        |    SUM(CASE WHEN c.sb * c.n::HUGEINT > t.total * c.cb
        |      THEN (2::HUGEINT ^ c.cell)::HUGEINT ELSE 0::HUGEINT END)::HUGEINT
        |      AS sig_u
        |  FROM cells c JOIN tot t USING (pid) GROUP BY 1, 2),
        |sg AS (
        |  SELECT pid, source,
        |    CAST(sig_u - CASE WHEN sig_u >= 9223372036854775808::HUGEINT
        |      THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT)
        |      AS sig
        |  FROM sigs)
        |SELECT a.pid AS a_id, b.pid AS b_id,
        |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
        |FROM sg a JOIN sg b ON a.source = b.source AND a.pid < b.pid
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3
        |ORDER BY a_id, b_id""".stripMargin,
    // m8's boundary rule + the cut-before-boundary chunk convention; the
    // store economics must agree chunk-for-chunk (same digests, lengths)
    "m9_cdc_dedup_store" ->
      """WITH b AS (SELECT doc_id, source, text,
        |  [CAST(i AS BIGINT) FOR i IN range(1, greatest(length(text) - 6, 1))
        |   IF CAST('0x' || substr(md5(substr(text, CAST(i AS INT), 8)), 1, 4)
        |     AS BIGINT) % 16 = 0] AS bpos
        |  FROM documents),
        |ch AS (SELECT source,
        |    unnest(list_transform(range(1, len(bpos) + 2),
        |      j -> substr(text,
        |        CAST((CASE WHEN j = 1 THEN 1 ELSE bpos[j-1] END) AS INT),
        |        CAST((CASE WHEN j <= len(bpos) THEN bpos[j]
        |              ELSE length(text) + 1 END)
        |          - (CASE WHEN j = 1 THEN 1 ELSE bpos[j-1] END) AS INT))))
        |      AS chunk
        |  FROM b),
        |d AS (SELECT source, md5(chunk) AS dg,
        |    CAST(length(chunk) AS BIGINT) AS n FROM ch),
        |per AS (SELECT source, dg, CAST(COUNT(*) AS BIGINT) AS refs,
        |    MIN(n) AS n FROM d GROUP BY 1, 2)
        |SELECT source, CAST(SUM(refs) AS BIGINT) AS n_chunks,
        |  CAST(COUNT(*) AS BIGINT) AS n_unique,
        |  CAST(SUM(refs * n) AS BIGINT) AS chars_naive,
        |  CAST(SUM(n) AS BIGINT) AS chars_stored,
        |  CAST(SUM(refs * n) - SUM(n) AS BIGINT) AS chars_saved
        |FROM per GROUP BY source ORDER BY source""".stripMargin,
    // identical md5-hex-prefix boundary rule via the '0x'||hex cast —
    // both engines must declare the same boundary positions
    "m8_cdc_chunking" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(bpos) AS BIGINT) AS n_boundaries,
        |  CAST(len(bpos) + 1 AS BIGINT) AS n_chunks,
        |  CAST(coalesce(list_sum(bpos), 0) AS BIGINT) AS bpos_sum
        |FROM (SELECT doc_id, text,
        |  [CAST(i AS BIGINT) FOR i IN range(1, greatest(length(text) - 6, 1))
        |   IF CAST('0x' || substr(md5(substr(text, CAST(i AS INT), 8)), 1, 4)
        |     AS BIGINT) % 16 = 0] AS bpos
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "m7_shard_manifest" ->
      """WITH b AS (SELECT doc_id, source,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_bytes,
        |    SUM(n_bytes) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_bytes
        |      AS prev FROM b)
        |SELECT doc_id, source, n_bytes,
        |  CAST(prev // 16384 AS BIGINT) AS shard_seq,
        |  CAST(prev % 16384 AS BIGINT) AS offset
        |FROM c ORDER BY source, doc_id""".stripMargin,
    // intersects the raw chunk text where the Spark side intersects its
    // 64-bit chunk hashes — collision-equivalent (d13's accepted argument)
    "m6_chunk_overlap" ->
      """WITH c AS (SELECT doc_id, source,
        |    list_distinct([substring(text, i * 16 + 1, 16)
        |      FOR i IN range(0, CAST(ceil(length(text) / 16.0) AS BIGINT))])
        |      AS dg
        |  FROM documents WHERE length(text) >= 1),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    CAST(len(list_intersect(a.dg, b.dg)) AS BIGINT) AS n_common,
        |    CAST(len(a.dg) + len(b.dg) - len(list_intersect(a.dg, b.dg))
        |      AS BIGINT) AS n_union
        |  FROM c a JOIN c b ON a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT a_id, b_id, n_common, n_union,
        |  CAST((1000000 * n_common) // n_union AS BIGINT) AS sim_ppm
        |FROM p WHERE n_common > 0 ORDER BY a_id, b_id""".stripMargin,
    // groups the raw text where the Spark side groups its sha-256 digest —
    // collision-equivalent (d13's accepted argument)
    "m5_content_store" ->
      """WITH base AS (SELECT doc_id, source, text,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |gens AS (SELECT * FROM base WHERE doc_id % 5 <> 0
        |  UNION ALL SELECT * FROM base),
        |per_digest AS (SELECT source, text,
        |    CAST(COUNT(*) AS BIGINT) AS refs, MIN(n_bytes) AS n_bytes
        |  FROM gens GROUP BY source, text)
        |SELECT source,
        |  CAST(SUM(refs) AS BIGINT) AS n_blobs,
        |  CAST(COUNT(*) AS BIGINT) AS n_unique,
        |  CAST(SUM(refs * n_bytes) AS BIGINT) AS bytes_naive,
        |  CAST(SUM(n_bytes) AS BIGINT) AS bytes_stored,
        |  CAST(SUM(refs * n_bytes) - SUM(n_bytes) AS BIGINT) AS bytes_saved
        |FROM per_digest GROUP BY source ORDER BY source""".stripMargin,
    "m1_multimodal_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  sha256(text) AS sha256,
        |  64 + octet_length(encode(text)) % 256 AS width,
        |  64 + (octet_length(encode(text)) * 7) % 256 AS height,
        |  1 + octet_length(encode(text)) % 4 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m2_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS DOUBLE) AS f_bytes,
        |  CAST(64 + octet_length(encode(text)) % 256 AS DOUBLE) AS f_width,
        |  CAST(64 + (octet_length(encode(text)) * 7) % 256 AS DOUBLE) AS f_height,
        |  CAST(ascii(substr(text, 1, 1)) AS DOUBLE) AS f_c0
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m3_frame_sample" ->
      """WITH f AS (SELECT doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    CAST(1 + octet_length(encode(text)) % 4 AS BIGINT) AS n_frames
        |  FROM documents)
        |SELECT doc_id, CAST(u.frame_idx AS BIGINT) AS frame_idx,
        |  CAST(u.frame_idx * (n_bytes // n_frames) AS BIGINT) AS frame_offset
        |FROM f, unnest(generate_series(0, n_frames - 1, 2)) AS u(frame_idx)
        |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
