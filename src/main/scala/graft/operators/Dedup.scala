package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.{TextHashFunctions, VectorOps}

/** Deduplication operators — exact, content-normalized, n-gram Jaccard,
  * MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design: nothing here is quadratic in the corpus. Pairwise
  * comparison is always preceded by a blocking stage (source key, LSH band
  * bucket, SimHash band) so the join keys bound candidate sets; shuffles are
  * keyed on those buckets and stay linear in corpus size. That is exactly
  * the structure that survives a 1000-executor, 100 TB corpus.
  */
object Dedup {

  private def toks: Column = split(trim(col("text")), "\\s+")

  /** The twin-injected payload view shared by d4 and d5 (m10's pattern):
    * originals at pid = doc_id·2, and for every 5th doc an altered twin
    * at pid = doc_id·2+1 with 'x' prepended — exactly ONE token changed,
    * which is a guaranteed near-dup in both shingle-jaccard (d4) and
    * simhash-hamming (d5) space. ONE definition so the two gate
    * populations cannot drift apart; the d5 DuckDB oracle's `pay` CTE is
    * the intentional SQL mirror, and PipelineSpec re-derives the view
    * independently on purpose (that is what makes its twin a proof). */
  private[graft] def twinPayload(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).select(col("doc_id"), col("source"), col("text"))
    base.select((col("doc_id") * 2).as("doc_id"), col("source"), col("text"))
      .unionAll(base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") * 2 + 1).as("doc_id"), col("source"),
          concat(lit("x"), col("text")).as("text")))
  }

  // ------------------------------------------------------ d1_dedup_exact
  /** Exact dedup: hash-groupBy on content, keep the smallest id. Spark
    * aggregates partially map-side, so the shuffle carries one row per
    * distinct document. */
  def d1DedupExact(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  // ------------------------------------------------- d2_dedup_normalized
  /** Content-normalized exact dedup: key = sorted distinct word set. Finds
    * reorder-only duplicates (jaccard 1.0 pairs) that byte-exact dedup
    * misses; same single-shuffle group-by shape. */
  def d2DedupNormalized(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("key", array_join(array_sort(array_distinct(toks)), " "))
      .groupBy(col("key"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .select(col("keep_id"), col("n_docs"))
      .orderBy(col("keep_id"))

  // ------------------------------------------------- d3_ngram_jaccard
  /** Word-set Jaccard near-dup within a blocking key (source): the
    * block-local self-join bounds candidates; intersect/union sizes are
    * integers so the similarity is bit-identical on both engines.
    *
    * Sub-blocking bounds the O(block²) worst case: jaccard ≥ 0.8 forces
    * |A|/|B| ∈ [0.8, 1.25] ⊂ (0.5, 2), so a true pair's ⌊log₂ length⌋
    * buckets differ by at most 1 — the join key becomes (source, bucket)
    * with one side exploded to its 3-bucket neighborhood. A huge or
    * skewed source block shatters into per-length-bucket blocks joined
    * only with their neighbors, and the finer key also spreads the
    * shuffle. The bucket is computed with integer/string ops (binary
    * digit count), not floating-point log, so the ≤1-gap guarantee is
    * exact. Result-identical: the exact pairwise length prefilter and
    * the jaccard threshold still apply, and each qualifying pair meets
    * the equi-join at exactly one exploded bucket value. */
  def d3NgramJaccard(s: SparkSession, d: String): DataFrame =
    d3Pairs(s, d).orderBy(col("a_id"), col("b_id"))

  /** d3's pair set without the final presentation sort — consumers that
    * feed the pairs into further shuffles (d7's clustering) skip the
    * range-partition pass entirely. */
  private[operators] def d3Pairs(s: SparkSession, d: String): DataFrame =
    d3PairsAmong(s, d3Prep(s, documents(s, d)
      .select(col("doc_id"), col("source"), col("text"))))

  /** d3's interned signature scan over an arbitrary (doc_id, source,
    * text) frame: tokens are interned to 64-bit hashes and SORTED on the
    * scan (once per doc), so the per-pair similarity is a single O(n+m)
    * merge walk ([[graft.functions.JaccardSorted]]) — no per-pair
    * hash-set builds, same Jaccard counts (collisions are
    * 2^-64-improbable). The interning is compute-dense, so the scan is
    * width-guarded ([[Scans.wide]]). This is the PER-DOC state d25
    * carries between maintenance runs. */
  private[graft] def d3Prep(s: SparkSession, docs: DataFrame): DataFrame =
    Scans.wide(s, docs.select(col("doc_id"), col("source"), col("text")),
        col("doc_id"))
      .select(col("doc_id"), col("source"),
        array_sort(transform(array_distinct(toks), t => xxhash64(t))).as("w"))
      .withColumn("nw", size(col("w")))
      // ⌊log₂ nw⌋ + 1 via binary digit count — exact integer arithmetic
      .withColumn("bkt", length(conv(greatest(col("nw"), lit(1)), 10, 2)))

  /** The [[graft.functions.JaccardSorted]] merge walk as a column. */
  private def jacOf(wa: Column, wb: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.functions.JaccardSorted(
      GraftBridge.expression(wa), GraftBridge.expression(wb)))
  }

  /** d3's blocked self-join over a prepped ([[d3Prep]]) frame.
    *
    * The pair-verify stage is compute-bound but byte-light: at modest
    * volumes the whole probe side is one scan split and the other side
    * broadcasts, so every O(n+m) merge walk lands in a SINGLE task no
    * matter how many cores (measured: ×10 corpus ran slower than ×30 —
    * the ×30 shuffle flipped to a parallel sort-merge join). An EXPLICIT
    * hash repartition on the join keys pins full-width parallelism —
    * explicit numPartitions exempts it from AQE's byte-based coalescing,
    * which would collapse this thin-but-hot exchange right back — and at
    * volumes where the join planning flips to sort-merge the same
    * exchange satisfies the join's clustering requirement, so it is
    * reused, not added. */
  private[graft] def d3PairsAmong(s: SparkSession, docs: DataFrame): DataFrame = {
    val shufParts = Scans.targetWidth(s)
    val a = docs.select(col("doc_id").as("a_id"), col("source"),
        col("w").as("wa"), col("nw").as("na"),
        explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)).as("bkt"))
      .repartition(shufParts, col("source"), col("bkt"))
    val b = docs.select(col("doc_id").as("b_id"), col("source").as("src_b"),
      col("w").as("wb"), col("nw").as("nb"), col("bkt").as("bkt_b"))
    // exact length-ratio prefilter (PPJoin-style): jaccard ≥ 0.8 ⇒ |A|/|B| ∈
    // [0.8, 1.25] since j ≤ min/max — prunes remaining pairs with integer
    // comparisons before any per-pair set operation; result-neutral
    a.join(b, col("source") === col("src_b") && col("bkt") === col("bkt_b") &&
        col("a_id") < col("b_id") &&
        col("na") * 4 <= col("nb") * 5 && col("nb") * 4 <= col("na") * 5)
      .select(col("a_id"), col("b_id"), jacOf(col("wa"), col("wb")).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
  }

  /** d3's blocked join ACROSS two prepped frames with disjoint-or-equal
    * ids — the delta-vs-index shape: the (small) probe side explodes to
    * its 3-bucket neighborhood and repartitions on the block keys, the
    * build side stays single-bucket. Output pairs are (least, greatest)
    * normalized; Jaccard is symmetric so the normalization is free. */
  private[graft] def d3PairsAcross(s: SparkSession, probe: DataFrame,
      build: DataFrame): DataFrame = {
    val shufParts = Scans.targetWidth(s)
    val a = probe.select(col("doc_id").as("p_id"), col("source"),
        col("w").as("wa"), col("nw").as("na"),
        explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)).as("bkt"))
      .repartition(shufParts, col("source"), col("bkt"))
    val b = build.select(col("doc_id").as("b_id"), col("source").as("src_b"),
      col("w").as("wb"), col("nw").as("nb"), col("bkt").as("bkt_b"))
    a.join(b, col("source") === col("src_b") && col("bkt") === col("bkt_b") &&
        col("p_id") =!= col("b_id") &&
        col("na") * 4 <= col("nb") * 5 && col("nb") * 4 <= col("na") * 5)
      .select(least(col("p_id"), col("b_id")).as("a_id"),
        greatest(col("p_id"), col("b_id")).as("b_id"),
        jacOf(col("wa"), col("wb")).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
  }

  // ------------------------------------------ d25_cdf_dedup_maintenance
  /** INCREMENTAL near-dup maintenance off the lakehouse CHANGE FEED —
    * d24's daily-maintenance discipline applied to the PAIR SET itself,
    * now with DELETE retraction. The corpus lives in a snapshot log: an
    * ingest appends today's documents (v2) and a GDPR purge DV-deletes
    * others (v3, [[graft.sources.SnapshotLog.deleteWhere]]). Yesterday's
    * state is carried, never recomputed in production: the per-doc
    * signature table ([[d3Prep]]) and the pair set over it. The
    * maintenance reads ONLY the change feed
    * ([[graft.sources.SnapshotLog.readChangesCdf]] v1→v3):
    *
    *   - inserts: signatures interned for the inserted docs ALONE, then
    *     candidate-joined against the carried signature table
    *     (new×old [[d3PairsAcross]] + new×new [[d3PairsAmong]]) — the
    *     same blocked (source, length-bucket) keys as d3, so the delta
    *     work is |delta|-bounded, never all-pairs;
    *   - delete preimages: every carried pair with a purged endpoint
    *     retracts (two anti-joins), and purged docs leave the build side
    *     the same way. An inserted-then-purged doc contributes nothing.
    *
    * EXACT by construction, because d3's pair predicate is pointwise and
    * its block keys are per-doc attributes:
    *   pairs(final live) = (pairs(v1) minus pairs touching deletes)
    *                     ∪ pairs touching a surviving new doc.
    * The oracle recomputes d3 FROM SCRATCH over the final live corpus
    * (documents minus the purge predicate): equality with the full
    * recompute IS the incremental-maintenance contract (d24's
    * discipline). The gate never reads the v2/v3 snapshots — its only
    * post-v1 inputs are CDF rows, which is the structural proof the
    * maintenance is feed-driven.
    *
    * In-gate: interning is provably delta-bounded (docs interned this
    * run == surviving CDF inserts, a small fraction of the corpus), the
    * purge bites carried pairs (retractions > 0), and the ingest
    * contributes pairs (additions > 0) — at sf0.01: 105 pairs touch new
    * docs, 286 touch purged docs, of the 1,506 carried. */
  def d25CdfDedupMaintenance(s: SparkSession, d: String): DataFrame = {
    import graft.sources.SnapshotLog
    val dir = EtlQueries.scratchDir("graft-d25")
    val base = documents(s, d)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
    val isNew = col("doc_id") % 25 === 7
    SnapshotLog.commit(base.filter(!isNew)
      .repartitionByRange(8, col("doc_id")), dir,
      statsCols = Seq("doc_id"))                                  // v1
    SnapshotLog.commit(base.filter(isNew), dir)                   // v2: ingest
    val v3 = SnapshotLog.deleteWhere(s, dir, col("doc_id") % 11 === 3)
    // ------- carried state (production persists both; the gate rebuilds
    // them from v1, the documented construct-vs-apply split d24 set)
    val prepOld = CacheScope.localCheckpoint(
      d3Prep(s, SnapshotLog.read(s, dir, Some(1))))
    val pOld = CacheScope.localCheckpoint(d3PairsAmong(s, prepOld))
    // ------- the APPLY: inputs below come ONLY from the change feed
    val cdf = CacheScope.localCheckpoint(
      SnapshotLog.readChangesCdf(s, dir, 1, v3)
        .select(col("doc_id"), col("source"), col("text"),
          col("_change_type")))
    val delIds = cdf.filter(col("_change_type") === "delete")
      .select(col("doc_id")).distinct()
    val insRows = cdf.filter(col("_change_type") === "insert")
    val newPrep = CacheScope.localCheckpoint(
      d3Prep(s, insRows.join(delIds, Seq("doc_id"), "left_anti")))
    val nInterned = newPrep.count()
    val nCorpus = base.count()
    def dropDeleted(df: DataFrame, idCols: String*): DataFrame =
      idCols.foldLeft(df)((acc, c) => acc.join(
        delIds.withColumnRenamed("doc_id", c), Seq(c), "left_anti"))
    val buildLive = dropDeleted(prepOld, "doc_id")
    val kept = CacheScope.localCheckpoint(dropDeleted(pOld, "a_id", "b_id"))
    val added = CacheScope.localCheckpoint(
      d3PairsAcross(s, newPrep, buildLive)
        .unionByName(d3PairsAmong(s, newPrep)))
    val nRetracted = pOld.count() - kept.count()
    val nAdded = added.count()
    val ok = v3 == 3 && nInterned > 0 && nInterned * 5 < nCorpus &&
      nRetracted > 0 && nAdded > 0
    EtlQueries.materializedThenClean(
      kept.unionByName(added).filter(lit(ok)), dir,
      Seq(col("a_id"), col("b_id")))
  }

  // ------------------------------------------------------ d4_minhash_lsh
  /** MinHash + LSH banding over word 2-gram shingles.
    *
    * Pipeline: shingle → per-shingle 64-bit hash (xxhash64) → 32 minhash
    * signatures hᵢ(x) = (aᵢ·x + bᵢ) wrapped — 8 bands × 4 rows → band
    * buckets → self-join on (band, bucket) for candidates → verify true
    * shingle Jaccard ≥ 0.7. Banding makes the candidate join linear; the
    * verify step removes LSH false positives, so output precision is exact
    * while recall is governed by the band shape (8×4 catches j≥0.7 with
    * ~1-(1-0.7⁴)⁸ ≈ 93% per-pair probability).
    *
    * In-gate recall check ([[GateChecks]]): the exact twin — same-source
    * pairs at the same threshold, computed WITHOUT banding (d3's blocked
    * shape, so it stays linear at scale) — must be ≥ 80% covered by the
    * LSH output, or the query returns zero rows and fails the gate.
    *
    * WHY d4 HAS NO HASH-EXACT TIER (recorded round 12, so no future
    * round re-attempts d5's conversion here): d5/m10's pigeonhole
    * argument needs the banding to PARTITION a fixed-length signature
    * into disjoint pieces — "≤ 3 differing bits cannot touch all 4
    * disjoint 16-bit bands" is a statement about the signature's bit
    * positions. MinHash bands are not projections of one signature;
    * each band is an independent hash of the VARIABLE-SIZE shingle set,
    * and a near-dup pair (jaccard j < 1) agrees on any given band only
    * with probability j^rows — there is NO jaccard threshold below 1.0
    * at which agreement on ≥ 1 of the 8 bands is guaranteed, so no
    * sub-threshold of the output is deterministically complete. The
    * only lossless tier would be jaccard = 1.0 exactly, which is d2's
    * normalized-exact dedup, already a hash-exact gate of its own. d4
    * therefore stays recall-gated forever, with its measured margin
    * reported per round via `recall_ppm` (GATE_METRICS). */
  def d4MinhashLsh(s: SparkSession, d: String): DataFrame = {
    val nSig = 32
    val bandRows = 4

    // tokenize → shingle → hash → distinct → sort in ONE pass over the text
    // bytes ([[graft.functions.ShingleHashes]]); the sorted hash array feeds
    // both the one-pass minhash-banding kernel and the merge-walk jaccard
    // verify — candidates carry 8 bytes per shingle through the shuffle.
    // Twin-injected payload view (d5/m10's pattern, round 11): the natural
    // corpus has ZERO same-source shingle-jaccard≥0.7 pairs at sf0.01, so
    // the recall floor was vacuous exactly at the driver's correctness SF
    // (recall_ppm read null there). One altered token ('x' prepended) for
    // every 5th doc changes exactly one 2-gram shingle — jaccard
    // (n−2)/n ≈ 0.95+, a guaranteed truth pair the banding must recover.
    // pid = doc_id·2 originals, doc_id·2+1 twins.
    val shingled = {
      import org.apache.spark.sql.GraftBridge
      val shs = GraftBridge.column(graft.functions.ShingleHashes(
        GraftBridge.expression(trim(col("text"))), 2))
      val pay = twinPayload(s, d)
      // the candidate and exact-twin branches both read this; cache so the
      // one-pass shingle+minhash kernel runs once per document (released
      // per-query by the runner via CacheScope). Width-guarded: the
      // kernel is compute-dense and the cache build inherits the scan's
      // split count — measured one task on the ×10 probe corpus
      CacheScope.persist(Scans.wide(s, pay, col("doc_id"))
        .withColumn("shs", shs)
        .select(col("doc_id"), col("source"), col("shs"),
          GraftBridge.column(graft.functions.MinHashBuckets(
            GraftBridge.expression(col("shs")), nSig, bandRows)).as("buckets")))
    }

    val exploded = shingled
      .select(col("doc_id"), col("shs"),
        posexplode(col("buckets")).as(Seq("band", "bucket")))

    val l = exploded.select(col("doc_id").as("a_id"), col("shs").as("sa"),
      col("band"), col("bucket"))
    val r = exploded.select(col("doc_id").as("b_id"), col("shs").as("sb"),
      col("band").as("band_r"), col("bucket").as("bucket_r"))
    val cand = l.join(r,
        col("band") === col("band_r") && col("bucket") === col("bucket_r") &&
          col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("sa"), col("sb"))
      .dropDuplicates("a_id", "b_id")
    val jac = {
      import org.apache.spark.sql.GraftBridge
      GraftBridge.column(graft.functions.JaccardSorted(
        GraftBridge.expression(col("sa")), GraftBridge.expression(col("sb"))))
    }
    val found = cand
      .select(col("a_id"), col("b_id"), jac.as("jaccard"))
      .filter(col("jaccard") >= 0.7)

    // exact twin over same-source pairs (no banding, PPJoin length
    // prefilter: j ≥ 0.7 ⇒ |A|/|B| ∈ [0.7, 1/0.7]) — linear via blocking,
    // and sampled to even UNDERLYING docs on both ends (pid div 2 — pid
    // parity would drop every injected twin; quarters the twin's join
    // work; recall is a ratio, so the sampled estimate keeps its teeth)
    val docs = shingled
      .filter(expr("(doc_id div 2) % 2 = 0"))
      .select(col("doc_id"), col("source"), col("shs"),
        size(col("shs")).as("ns"))
    val ta = docs.select(col("doc_id").as("a_id"), col("source"),
      col("shs").as("sa"), col("ns").as("na"))
    val tb = docs.select(col("doc_id").as("b_id"), col("source").as("src_b"),
      col("shs").as("sb"), col("ns").as("nb"))
    val truth = ta.join(tb,
        col("source") === col("src_b") && col("a_id") < col("b_id") &&
          col("na") * 7 <= col("nb") * 10 && col("nb") * 7 <= col("na") * 10)
      .select(col("a_id"), col("b_id"), jac.as("j"))
      .filter(col("j") >= 0.7)
      .select(col("a_id"), col("b_id"))
    GateChecks.requireRecall(found, truth, 0.8, report = true,
        keys = Seq("a_id", "b_id"))
      .orderBy(col("a_id"), col("b_id"))
  }

  // ---------------------------------------------------- d5_simhash_dup
  /** SimHash near-dup: 64-bit signature, 4×16-bit bands for candidates,
    * verification via bit_count(xor). Round 11 split the gate into two
    * regimes over ONE banded pipeline (m10's pattern,
    * [[Multimodal.m10PhashNeardup]]):
    *
    *  - OUTPUT (oracle-checked, hash-exact): same-source pairs with
    *    hamming ≤ 3. Banding is LOSSLESS here — ≤ 3 differing bits cannot
    *    touch all four disjoint 16-bit bands (pigeonhole), so the banded
    *    candidate set provably contains every such pair and DuckDB's full
    *    all-pairs hamming join recomputes the identical answer from the
    *    raw text. The payload view injects a deterministic near-dup twin
    *    ('x' prepended to the text, i.e. ONE token altered) for every 5th
    *    document — the corpus's natural token-level near-dups rarely land
    *    within 3 simhash bits at small SF (measured: zero sampled pairs
    *    at sf0.01), and a gate whose true answer is empty can't prove
    *    anything; one altered token out of n flips only the signature
    *    bits whose vote margin is ±1, a handful for real documents.
    *  - IN-GATE floor (defense in depth): recall over the hamming-4..6
    *    band, where banding IS probabilistic. Independent-bit analysis
    *    gives per-pair catch probability 1−(1−(1−h/64)^16)^4
    *    (0.83/0.72/0.60 for h=4/5/6); measured combined recall over the
    *    twin-injected population: 0.60 at sf0.01 (n=20, below the
    *    small-sample escape) and 0.69 at sf0.1 (n=558 — where the floor
    *    actually bites; Measure, round 11). Floor 0.45 = measured minus
    *    ~20 pts: loose enough for small-sample noise, tight enough that a
    *    broken band split (which collapses recall toward 0) zeroes the
    *    output — and a zeroed output now hard-fails the DuckDB compare
    *    instead of coasting rows-only. The sampled completeness probe
    *    (miss3) stays as the fast in-gate form of what the oracle now
    *    proves in full. */
  /** d5's signature frame over the twin-injected payload view, uncached —
    * shared with [[graft.tools.Measure]] so the measured recall population
    * is definitionally the gate population (they cannot drift apart).
    * pid = doc_id·2 for originals, doc_id·2+1 for the altered twins. */
  private[graft] def d5Signatures(s: SparkSession, d: String): DataFrame =
    Scans.wide(s, twinPayload(s, d), col("doc_id"))
      .select(col("doc_id"), col("source"), TextHashFunctions.simhash64(toks).as("sh"))

  /** d5's unbanded truth: same-source pairs with hamming ≤ `maxH` over the
    * even-underlying-doc sample (pid div 2 even — pid parity would select
    * only originals and drop every twin), as (a_id, b_id, h). The
    * hamming≤3 subset is pigeonhole-guaranteed (deterministic — ANY
    * sampled miss proves banding broken); recall over 4..maxH is a ratio,
    * so the sampled estimate keeps its teeth; the sample quarters the
    * join work. */
  private[graft] def d5Truth(sh: DataFrame, maxH: Int): DataFrame = {
    val sampled = sh.filter(expr("(doc_id div 2) % 2 = 0"))
    val ta = sampled.select(col("doc_id").as("a_id"), col("source"), col("sh").as("sha"))
    val tb = sampled.select(col("doc_id").as("b_id"), col("source").as("src_b"),
      col("sh").as("shb"))
    ta.join(tb,
        col("source") === col("src_b") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("sha").bitwiseXOR(col("shb"))).as("h"))
      .filter(col("h") <= maxH)
  }

  /** d5's banded candidate pipeline, UNGATED — shared with
    * [[graft.tools.Measure]]: measuring recall through the gated query
    * would read 0.0 whenever recall is below the floor, exactly when an
    * accurate measurement matters most. */
  private[graft] def d5Found(sh: DataFrame): DataFrame = {
    // band join keys are (source, i, v) — SOURCE-SCOPED (round 12): the
    // output only ever keeps same-source pairs, so cross-source band
    // collisions were candidates the verify step provably discarded;
    // keying the join on source matches q75's state keying (source,
    // band, value) exactly and removes that candidate volume for free —
    // at many-source corpus scale the band buckets shrink by the source
    // fan-out. Measured at sf0.1: 351,486 → 20,408 distinct candidate
    // pairs (17×) — every dropped pair was cross-source, i.e. provably
    // outside the output; hashes unchanged (oracle re-verified).
    val banded = sh.withColumn("band", explode(array(
      (0 until 4).map(b => struct(lit(b).as("i"),
        col("sh").bitwiseAND(0xffffL << (16 * b)).as("v"))): _*)))
      .select(col("doc_id"), col("source"), col("sh"), col("band.i"), col("band.v"))
    val l = banded.select(col("doc_id").as("a_id"), col("source"),
      col("sh").as("sha"), col("i"), col("v"))
    val r = banded.select(col("doc_id").as("b_id"), col("source").as("src_r"),
      col("sh").as("shb"), col("i").as("i_r"), col("v").as("v_r"))
    l.join(r,
        col("source") === col("src_r") &&
          col("i") === col("i_r") && col("v") === col("v_r") &&
          col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", bit_count(col("sha").bitwiseXOR(col("shb"))))
      .filter(col("hamming") <= 6)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  def d5SimhashDup(s: SparkSession, d: String): DataFrame = {
    // banding, the exact output and the recall floor all read the
    // signatures; cache so tokenize+simhash runs once per payload doc
    // (released per-query by the runner via CacheScope). found is cached
    // too: the output branch (h≤3 filter) and the verdict branch (recall
    // join) would otherwise each re-execute the banded candidate join.
    val sh = CacheScope.persist(d5Signatures(s, d))
    val found = CacheScope.persist(d5Found(sh))
    val truth = d5Truth(sh, maxH = 6)
    val check = {
      val hits = truth.join(
        found.select(col("a_id"), col("b_id"), lit(1).as("hit")),
        Seq("a_id", "b_id"), "left_outer")
      // coalesce: agg over an EMPTY truth set yields NULL sums — no truth
      // means nothing to miss, which must read as pass, not NULL-fails
      val miss3 = coalesce(
        sum(when(col("h") <= 3 && col("hit").isNull, 1).otherwise(0)), lit(0))
      val n46 = coalesce(sum(when(col("h") >= 4, 1).otherwise(0)), lit(0))
      val hit46 = coalesce(
        sum(when(col("h") >= 4, coalesce(col("hit"), lit(0))).otherwise(0)), lit(0))
      // small-sample escape (n46 < 30): recall over a handful of pairs is
      // not evidence of anything — at sf0.001 the sampled 4..6 band has 8
      // pairs and a deterministic 3/8 — while a real banding break is
      // ALREADY caught by miss3 and, in full, by the DuckDB all-pairs
      // oracle. The floor bites where the estimate means something
      // (sf0.1: 558 pairs, measured 0.69 — Measure, round 12; same
      // number as the class scaladoc above, re-measured after the
      // source-scoped band join, which cannot change recall because
      // truth is same-source by definition).
      hits.agg(
        (miss3 === 0 && (n46 < 30 || hit46.cast("double") / n46 >= 0.45))
          .as("gate_ok"))
    }
    // the hash-exact serving output: same-source pairs at hamming ≤ 3,
    // where banding is pigeonhole-complete — DuckDB recomputes this set
    // with a full all-pairs join over the same twin-injected payload.
    // No source re-join needed: the band join itself is source-scoped,
    // so every candidate is already a same-source pair.
    val exact = found.filter(col("hamming") <= 3)
      .select(col("a_id"), col("b_id"), col("hamming").cast("long").as("hamming"))
    GateChecks.require(exact, check)
      .orderBy(col("a_id"), col("b_id"))
  }

  // ------------------------------------------- d11_incremental_dedup
  /** Incremental dedup — the continuous-ingest form of d1: an arriving
    * batch (doc_id % 10 ∈ {8,9}, a batch-boundary stand-in) is deduped
    * BOTH against the historical corpus (left anti join on content) and
    * within itself (first-arrival groupBy), without ever re-scanning
    * history's groupings. At 100 TB the anti join shuffles on the content
    * key with the batch side small — or goes broadcast when the BATCH
    * (always the small side) fits; history is only ever scanned, never
    * collected. Output: the novel documents that enter the corpus. */
  def d11IncrementalDedup(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val history = docs.filter(col("doc_id") % 10 < 8)
    val batch = docs.filter(col("doc_id") % 10 >= 8)
    batch
      .join(history.select(col("text")), Seq("text"), "left_anti")
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_in_batch"))
      .select(col("keep_id"), col("n_in_batch"))
      .orderBy(col("keep_id"))
  }

  // ------------------------------------------------- d13_canonicalize
  /** Provenance-ranked canonicalization — the KEEP POLICY half of dedup:
    * within each duplicate group (d2's normalized content key: sorted
    * distinct word set), the copy from the highest-priority source wins
    * (source asc, doc_id tiebreak), and every member maps to that
    * canonical id. d2 answers "which content is duplicated"; this answers
    * the question a real pipeline asks next — "which COPY do we keep, and
    * where do the others point" (the redirect table attribution and
    * incremental joins consume).
    *
    * Scale posture: the window partitions on a 64-bit hash of the
    * normalized key (xxhash64 + length), not the key text, so the
    * shuffle carries slim (key, doc_id, source) rows rather than
    * document-sized strings — collision probability is 2^-64-scale per
    * pair (same accepted argument as d3's hashed token sets). Both
    * window functions share one partitioning: a single shuffle. */
  def d13Canonicalize(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val norm = array_join(array_sort(array_distinct(toks)), " ")
    val key = Seq(col("k1"), col("k2"))
    val wOrd = Window.partitionBy(key: _*).orderBy(col("source"), col("doc_id"))
    val wAll = Window.partitionBy(key: _*)
    documents(s, d)
      .select(col("doc_id"), col("source"),
        xxhash64(norm).as("k1"), length(norm).as("k2"))
      .withColumn("canonical_id", first(col("doc_id")).over(wOrd))
      .withColumn("n_copies", count(lit(1)).over(wAll))
      .filter(col("n_copies") > 1)
      .select(col("doc_id"), col("canonical_id"), col("n_copies"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------ d15_source_overlap
  /** Cross-source duplicate overlap matrix — the corpus-composition audit
    * run before mixing sources into a training set ("how much of source A
    * is already in source B?"): for every unordered source pair, the
    * number of distinct normalized documents (d2's sorted-word-set key)
    * present in both. High overlap means double-counting under naive
    * mixture weights; disjoint sources compose cleanly.
    *
    * Scale posture: one distinct on slim (source, 64-bit key) rows — the
    * key is hashed scan-side (xxhash64 + length, d13's argument) so the
    * shuffle never carries document text — then a self-equi-join on the
    * key. Per-key fan-out is bounded by the number of SOURCES carrying
    * that key (never by corpus size), and real pipelines have hundreds of
    * sources at most, so the join output is linear in distinct keys. */
  def d15SourceOverlap(s: SparkSession, d: String): DataFrame = {
    val norm = array_join(array_sort(array_distinct(toks)), " ")
    val k = documents(s, d)
      .select(col("source"), xxhash64(norm).as("k1"), length(norm).as("k2"))
      .distinct()
    val a = k.select(col("source").as("src_a"), col("k1"), col("k2"))
    val b = k.select(col("source").as("src_b"),
      col("k1").as("k1b"), col("k2").as("k2b"))
    a.join(b, col("k1") === col("k1b") && col("k2") === col("k2b") &&
        col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("src_a"), col("src_b"))
  }

  // ----------------------------------------------- d17_substring_dedup
  /** Exact substring-level dedup — the span-level complement of the
    * doc-level operators above: maximal word spans of length >= K that
    * occur in MORE THAN ONE document. Single-node corpus dedup builds a
    * suffix array for this (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better"); the distributed shape replaces it
    * with a linear K-gram fingerprint pipeline:
    *
    *   1. one pass builds every K-gram start per doc with array ops —
    *      no self-join, no explode-then-rejoin of token rows;
    *   2. one shuffle groups grams to find cross-doc repeats, where
    *      `min(doc_id) != max(doc_id)` is the fully partial-aggregatable
    *      ">= 2 distinct docs" test (no distinct-count expansion);
    *   3. a semi join marks each doc's duplicated gram starts;
    *   4. a per-doc window merges adjacent starts into maximal spans
    *      (gaps-and-islands — a run of duplicated starts p..q covers
    *      words [p, q+K-1]).
    *
    * Shuffles are keyed on the 64-bit gram hash (collision-equivalent to
    * the gram text — d13's accepted argument; the oracle groups the raw
    * gram) and on doc_id; every stage is linear in total token count.
    * All-integer output, so the hash compare is exact. */
  def d17SubstringDedup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val K = 8
    val toksDf = documents(s, d)
      .select(col("doc_id"), toks.as("w"))
      .where(size(col("w")) >= K) // shorter docs cannot contain a K-gram
    // struct-of-(pos, gram-hash) built in one transform; sequence() is
    // guarded non-negative by the length filter above
    // the gram stage feeds both the dup-test aggregate and the semi
    // join's probe side — cache it once (released per-query by the
    // runner via CacheScope) instead of recomputing scan+transform twice
    val grams = CacheScope.persist(toksDf
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(w) - $K), " +
          s"i -> struct(i AS pos, xxhash64(array_join(slice(w, i + 1, $K), ' ')) AS gh))")).as("g"))
      .select(col("doc_id"), col("g.pos").cast("long").as("pos"), col("g.gh").as("gh")))
    val dup = grams.groupBy(col("gh"))
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .where(col("lo") =!= col("hi"))
      .select(col("gh"))
    val marked = grams.join(dup, Seq("gh"), "left_semi")
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    marked
      .withColumn("prev", lag(col("pos"), 1).over(byDoc))
      .withColumn("brk", when(col("pos") === col("prev") + 1, 0L).otherwise(1L))
      .withColumn("grp", sum(col("brk")).over(byDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (K - 1)).as("span_end"),
        (max(col("pos")) - min(col("pos")) + K).as("span_len"))
      .select(col("doc_id"), col("span_start"), col("span_end"), col("span_len"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  // ----------------------------------------------- d6_embedding_neardup
  /** Embedding-cosine near-dup, blocked on the label column (the ANN-bucket
    * stand-in): exact in-order double accumulation so DuckDB reproduces the
    * cosine bit-for-bit. */
  def d6EmbeddingNearDup(s: SparkSession, d: String): DataFrame = {
    // norms are precomputed once per vector (scan side), not per pair —
    // the pairwise stage then does a single zip_with fold per candidate
    val e = embeddings(s, d).select(col("vec_id"), col("label"), col("embedding"),
      VectorOps.norm2(col("embedding")).as("n2"))
    val a = e.select(col("vec_id").as("a_id"), col("label"),
      col("embedding").as("va"), col("n2").as("na"))
    val b = e.select(col("vec_id").as("b_id"), col("label").as("label_b"),
      col("embedding").as("vb"), col("n2").as("nb"))
    val cos = VectorOps.dot(col("va"), col("vb")) / sqrt(col("na") * col("nb"))
    a.join(b, col("label") === col("label_b") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), cos.as("cos"))
      .filter(col("cos") >= 0.4)
      .orderBy(col("a_id"), col("b_id"))
  }

  // ------------------------------------------------ d16_semantic_dedup
  /** SemDeDup-style semantic near-dup: embedding-cosine pairs at θ ≥ 0.4
    * blocked by the LEARNED k-means clusters of the persisted IVF index —
    * d6 without its label column. d6's blocking needs a curated label;
    * real crawl corpora have none, so the semantic-dedup recipe clusters
    * first and compares only within clusters (SemDeDup — PAPERS.md). The
    * candidate surface is the index's own inverted lists, so dedup rides
    * the same artifact ANN serving uses; candidates are rescored with the
    * exact native-kernel cosine, making precision exact by construction —
    * only recall (a true pair straddling a cluster boundary) is
    * approximate, and it is gated below.
    *
    * Scale posture: the pairwise surface is bounded per cluster (K
    * shuffle-free parquet partitions of the corpus); nothing else is
    * quadratic. At 100 TB the knob is IvfIndex.K (K ~ √n keeps cluster
    * blocks √n-sized); the shape is unchanged. */
  def d16Found(s: SparkSession, d: String): DataFrame = {
    val model = IvfIndex.loadModel(s, IvfIndex.ensure(s, d))
    val ds = IvfIndex.dists(model)
    // top-P cluster ids by squared distance: cutoff = P-th smallest dist,
    // assignment = every cluster at or under it (ties may exceed P —
    // deterministic and recall-safe). Pure per-row expression work off the
    // broadcast K-row model; the corpus scans once.
    val cutoff = element_at(array_sort(ds), D16Probes)
    val assigned = filter(sequence(lit(0), lit(IvfIndex.K - 1)),
      i => element_at(ds, i + 1) <= cutoff)
    // width-guarded (round 17): the K per-row cluster distances are a
    // compute-dense kernel whose ceiling is the scan's split count
    val e = Scans.wide(s, embeddings(s, d), col("vec_id"))
      .select(col("vec_id"), col("embedding"),
        VectorOps.norm2(col("embedding")).as("n2"),
        explode(assigned).as("c"))
    val a = e.select(col("c"), col("vec_id").as("a_id"),
      col("embedding").as("va"), col("n2").as("na"))
    val b = e.select(col("c").as("cb"), col("vec_id").as("b_id"),
      col("embedding").as("vb"), col("n2").as("nb"))
    val cos = VectorOps.dot(col("va"), col("vb")) / sqrt(col("na") * col("nb"))
    a.join(b, col("c") === col("cb") && col("a_id") < col("b_id"))
      // a pair sharing several probed clusters meets the join up to P
      // times: rescore and threshold FIRST (cheap codegen'd dot per
      // occurrence, deterministic per pair), so the dedup shuffle carries
      // only the slim surviving (a_id, b_id, cos) rows — deduping before
      // the rescore would shuffle both embedding vectors per candidate
      // (measured 8 s vs 1 s at sf0.1)
      .select(col("a_id"), col("b_id"), cos.as("cos"))
      .filter(col("cos") >= D16Theta)
      .dropDuplicates("a_id", "b_id")
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Multi-probe width: each vector joins its P nearest clusters, so a
    * true pair is missed only when the two P-sets are disjoint. Candidate
    * volume is ~P²/K of brute force — the knob pair (P fixed small, K
    * grown with corpus) keeps the block quadratic bounded at scale. */
  private val D16Probes = 4

  private val D16Theta = 0.4
  /** Measured floor (NOTES trend table; re-measure via `graft.tools
    * .Measure` before touching): slice recall 1.00/0.93 at sf0.01/sf0.1
    * with P=4 probes (full-pair recall 0.98/0.97), floor = measured −
    * ~20 pts. */
  private val D16Floor = 0.70

  /** The gate's truth slice: exact cos ≥ θ pairs INCIDENT to the 64
    * deterministic probe vectors (s1's broadcast bound) — linear in corpus
    * size, the same bounded-truth shape the s2/s3 recall gates use. An
    * all-pairs twin would be quadratic, which GateChecks forbids; the
    * offline Measure tool reports recall against BOTH this slice and the
    * full pair set at test SFs. */
  def d16TruthSlice(s: SparkSession, d: String): DataFrame = {
    // width-guarded (round 17): 64 broadcast-probe cosines per corpus row
    // is compute-dense; a single-split scan serializes it
    val e = Scans.wide(s, embeddings(s, d), col("vec_id"))
      .select(col("vec_id"), col("embedding"),
        VectorOps.norm2(col("embedding")).as("n2"))
    val probes = e.filter(col("vec_id") % 50 === 0)
      .orderBy(col("vec_id")).limit(Similarity.MaxQueries)
      .select(col("vec_id").as("p_id"), col("embedding").as("pv"),
        col("n2").as("pn"))
    val cos = VectorOps.dot(col("pv"), col("embedding")) /
      sqrt(col("pn") * col("n2"))
    e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("p_id"))
      .filter(cos >= D16Theta)
      .select(least(col("p_id"), col("vec_id")).as("a_id"),
        greatest(col("p_id"), col("vec_id")).as("b_id"))
      .distinct()
  }

  /** The gated query: recall over the truth slice ≥ floor, or zero rows. */
  def d16SemanticDedup(s: SparkSession, d: String): DataFrame =
    GateChecks.requireRecall(d16Found(s, d), d16TruthSlice(s, d), D16Floor,
      report = true, keys = Seq("a_id", "b_id"))

  // ------------------------------------------------- d22_containment
  /** CONTAINMENT near-dup detection — |A∩B| / min(|A|,|B|): the
    * asymmetric-duplication semantic Jaccard (d3) structurally misses.
    * A short document wholly embedded in a long one (a quoted article,
    * a page plus boilerplate, a truncated crawl of the same content)
    * has Jaccard ≈ |A|/|B| — arbitrarily low — while its containment is
    * ≈ 1; corpus dedup that only thresholds Jaccard keeps both copies.
    * The gate reports exactly the pairs Jaccard LOSES: containment
    * ≥ 0.9 AND Jaccard < 0.8, both compares in integer
    * cross-multiplication (inter·10 ≥ min·9; inter·10 < union·8) and
    * the ratio in floor-div ppm — bit-portable, no floats.
    *
    * Scale posture: d3's interning discipline (distinct token hashes
    * sorted once on the scan, per-pair cost one O(n+m) merge walk —
    * `IntersectCountSorted`) under m6's source-blocked pair join, with a
    * PREFIX-TOKEN candidate block in front (Chaudhuri et al.'s SSJoin
    * prefix filter, one-sided for the asymmetric threshold): a pair
    * passing `inter·10 ≥ mn·9` has inter ≥ ⌈9·mn/10⌉, so at most
    * ⌈9·mn/10⌉−1 < inter of the smaller doc's tokens can sit OUTSIDE any
    * chosen (mn − ⌈9·mn/10⌉ + 1) = (⌊mn/10⌋+1)-subset — the smaller
    * doc's sorted-hash prefix of that length must share a token with the
    * larger doc. Candidate generation therefore joins each doc's
    * ~10% prefix (probe side) against every doc's full token list
    * (index side) on (source, token), smaller-by-(size, id) probing
    * larger — LINEAR in corpus token count instead of quadratic in the
    * source block, and LOSSLESS (pigeonhole, not probabilistic — unlike
    * d4's MinHash bands, which would MISS asymmetric pairs because
    * containment-high/Jaccard-low is exactly where minhash agreement
    * dies). [[DedupIdentitySpec]] proves the banded form result-identical
    * to the unfiltered pair join.
    *
    * Prefix ORDERING — measured, and deliberately left as uniform hash
    * order: the classic SSJoin refinement (ascending-document-frequency
    * prefixes, Chaudhuri et al.) was built and measured in round 11 —
    * per-(source, token) DF aggregate, DF-joined token stream, per-doc
    * row_number window taking the ℓ rarest tokens (any ℓ-subset keeps
    * the pigeonhole proof, so losslessness is ordering-independent). On
    * this corpus it cut raw candidate volume only 12% at sf0.01 (13 601
    * → 11 907) and 4% at sf0.1 (1.40 M → 1.34 M) while adding two
    * token-stream shuffles and a window: most DISTINCT tokens of a doc
    * are already rare (the type distribution's long tail), so a
    * uniform-hash prefix is near-optimal, and the lever only pays when
    * a corpus's doc vocabularies are dominated by ubiquitous tokens.
    * Reverted to hash order; NOTES.md "round 11" records the numbers. */
  def d22Containment(s: SparkSession, d: String): DataFrame = {
    val docs = CacheScope.persist(d22Docs(s, d))
    // probe: each doc's (⌊n/10⌋+1)-prefix of the sorted hash array — the
    // potential SMALLER side of a pair; index: every token of every doc
    // Explicit hash repartition on the join keys: the exploded probe
    // inherits the cached corpus's scan partitioning (one split at modest
    // volumes), which would leave the whole candidate join in a single
    // task; REPARTITION_BY_NUM pins full-width parallelism and is exempt
    // from AQE's byte-based coalescing (the stage is byte-light but
    // compute-hot). Same treatment as d3's pair-verify probe side.
    val shufParts = Scans.targetWidth(s)
    val probe = docs.select(col("doc_id").as("p_id"), col("source"),
        col("nw").as("pn"),
        explode(expr("slice(w, 1, cast(nw div 10 as int) + 1)")).as("tok"))
      .repartition(shufParts, col("source"), col("tok"))
    val index = docs.select(col("doc_id").as("i_id"),
      col("source").as("src_i"), col("nw").as("in_"),
      explode(col("w")).as("tok_i"))
    val cand = probe.join(index,
        col("source") === col("src_i") && col("tok") === col("tok_i") &&
          (col("pn") < col("in_") ||
            (col("pn") === col("in_") && col("p_id") < col("i_id"))))
      .select(least(col("p_id"), col("i_id")).as("a_id"),
        greatest(col("p_id"), col("i_id")).as("b_id"))
      .dropDuplicates("a_id", "b_id")
    d22Verify(docs, cand)
  }

  /** Tokenized corpus shared by the serving path and the identity twin
    * (width-guarded: the interning is compute-dense, [[Scans.wide]]). */
  private[graft] def d22Docs(s: SparkSession, d: String): DataFrame =
    Scans.wide(s, documents(s, d).select(col("doc_id"), col("source"), col("text")),
        col("doc_id"))
      .select(col("doc_id"), col("source"),
        array_sort(transform(array_distinct(toks), t => xxhash64(t))).as("w"))
      .withColumn("nw", size(col("w")).cast("long"))

  /** Verify candidate id pairs: fetch both sorted hash arrays, one
    * O(n+m) merge walk per pair, the gate's integer cross-multiplied
    * thresholds — shared verbatim by both candidate generators so the
    * identity proof isolates the BLOCKING step. */
  private def d22Verify(docs: DataFrame, cand: DataFrame): DataFrame = {
    val inter = {
      import org.apache.spark.sql.GraftBridge
      GraftBridge.column(graft.functions.IntersectCountSorted(
        GraftBridge.expression(col("wa")), GraftBridge.expression(col("wb"))))
    }
    cand
      .join(docs.select(col("doc_id").as("a_id"), col("w").as("wa"),
        col("nw").as("na")), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("w").as("wb"),
        col("nw").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"), col("na"), col("nb"),
        inter.as("inter"))
      .withColumn("mn", least(col("na"), col("nb")))
      .filter(col("mn") > 0 &&
        col("inter") * 10 >= col("mn") * 9 &&
        col("inter") * 10 < (col("na") + col("nb") - col("inter")) * 8)
      .select(col("a_id"), col("b_id"), col("na"), col("nb"), col("inter"),
        expr("1000000 * inter div mn").as("containment_ppm"))
      .orderBy(col("a_id"), col("b_id"))
  }

  // --------------------------------------- d23_containment_decontam
  /** CROSS-CORPUS containment decontamination — the asymmetric
    * contamination case d8/d10's exact n-gram overlap and d22's
    * same-source pairing both miss: a benchmark document's token SET
    * embedded in a (possibly much longer, reworded-around) training
    * document. Flags corpus docs with |eval ∩ corpus| / |eval| ≥ 0.8 —
    * the threshold is relative to the EVAL doc, so a benchmark buried in
    * a 100× longer page still scores ~1.0 where Jaccard ≈ 1%.
    *
    * Scale shape: the eval corpus is normally benchmark-sized, so its
    * prefix tokens BROADCAST (the d8 rule: the training corpus never
    * shuffles); the candidate join streams the corpus token index past
    * the broadcast eval prefixes. The prefix is lossless on the eval side
    * by the d22 pigeonhole (inter ≥ ⌈0.8·ne⌉ ⇒ some intersection token
    * falls in eval's (ne − ⌈0.8·ne⌉ + 1)-prefix, and every corpus token
    * is indexed), so this is exact, not probabilistic.
    *
    * The broadcast is a MEASURED budget switch, not a hope (d18's
    * `nodeBroadcastBytes` discipline): the eval side's shingle-array
    * bytes are summed off the cached frame and compared against
    * `graft.decontam.evalBroadcastBytes` (default 1 GiB). Someone
    * pointing this at an eval set that does not fit gets the
    * beyond-broadcast form — the same joins without hints, so the
    * candidate join shuffles on the token key and the verify join
    * sort-merges the corpus on c_id once — rather than an executor OOM.
    * [[DedupIdentitySpec]] proves the budget=0 twin bit-identical. */
  def d23ContainmentDecontam(s: SparkSession, d: String): DataFrame = {
    // 3-gram SHINGLE sets, not unigram tokens: on a shared vocabulary a
    // long doc's token set trivially covers a short doc's (measured:
    // unigram containment flags 2885 of 4900 cross pairs at sf0.01 —
    // noise, not contamination); 3-gram sets are order-sensitive and
    // sparse, so high containment means shared PASSAGES (d8's gram
    // discipline, containment instead of absolute overlap counts)
    val docs = CacheScope.persist(Scans.wide(s,
        documents(s, d).select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"), toks.as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), array_sort(array_distinct(expr(
        "transform(sequence(1, size(tk) - 2), " +
          "i -> xxhash64(concat_ws(' ', tk[i-1], tk[i], tk[i+1])))"))).as("w"))
      .withColumn("nw", size(col("w")).cast("long")))
    val evalDocs = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("eval_id"), col("w").as("we"),
        col("nw").as("ne"))
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id").as("c_id"), col("w").as("wc"),
        col("nw").as("nc"))
    // measured budget: 8 bytes per shingle hash + per-row slack; the
    // count runs on the cached docs frame, so it is one cheap aggregate
    val evalBytes = evalDocs
      .agg((coalesce(sum(col("ne")), lit(0L)) * 8 +
        count(lit(1)) * 64).as("b")).head().getLong(0)
    val bcastEval = evalBytes <= s.conf.get(
      "graft.decontam.evalBroadcastBytes", (1L << 30).toString).toLong
    d23Pairs(evalDocs, corpus, bcastEval)
  }

  /** d23's join pipeline, parameterized ONLY by whether the eval side
    * broadcasts — shared by the serving path and the budget=0 identity
    * twin so the proof isolates the exchange strategy. */
  private[graft] def d23Pairs(evalDocs: DataFrame, corpus: DataFrame,
      bcastEval: Boolean): DataFrame = {
    def evalSide(df: DataFrame): DataFrame = if (bcastEval) broadcast(df) else df
    // lossless eval-side prefix: ℓ = ne − ⌈0.8·ne⌉ + 1
    val probe = evalDocs.select(col("eval_id"),
      explode(expr(
        "slice(we, 1, cast(ne - ((8 * ne + 9) div 10) + 1 as int))")).as("tok"))
    val index = corpus.select(col("c_id"), explode(col("wc")).as("tok_i"))
    val cand = index.join(evalSide(probe), col("tok_i") === col("tok"))
      .select(col("c_id"), col("eval_id"))
      .dropDuplicates("c_id", "eval_id")
    val inter = {
      import org.apache.spark.sql.GraftBridge
      GraftBridge.column(graft.functions.IntersectCountSorted(
        GraftBridge.expression(col("we")), GraftBridge.expression(col("wc"))))
    }
    // verify join ORDER matters for the "corpus never shuffles" claim:
    // the candidate pair table (bounded by eval size × per-eval hit
    // count — decontamination hits, the d8 class) joins WITH its eval
    // arrays attached and BROADCASTS into the corpus, so the corpus-side
    // shingle arrays never cross an exchange. Beyond the budget, the
    // same joins run hinted-free: the pair table sort-merges with the
    // corpus on c_id — one corpus-wide exchange, linear and spillable,
    // instead of an over-budget broadcast build.
    corpus
      .join(evalSide(cand.join(evalSide(evalDocs), "eval_id")), "c_id")
      .select(col("c_id"), col("eval_id"), col("ne"), col("nc"),
        inter.as("inter"))
      .filter(col("ne") > 0 && col("inter") * 10 >= col("ne") * 8)
      .select(col("c_id"), col("eval_id"), col("ne"), col("nc"), col("inter"),
        expr("1000000 * inter div ne").as("containment_ppm"))
      .orderBy(col("c_id"), col("eval_id"))
  }

  /** The identity twin: ALL same-source pairs, no prefix block — the
    * round-9 serving form, kept test-only as the ground truth the banded
    * path must reproduce exactly (the d10/e18 same-answer-better-plan
    * pattern). Block-quadratic; never the serving path. */
  private[graft] def d22ContainmentUnfiltered(s: SparkSession, d: String): DataFrame = {
    val docs = d22Docs(s, d)
    val cand = docs.select(col("doc_id").as("a_id"), col("source"))
      .join(docs.select(col("doc_id").as("b_id"), col("source").as("src_b")),
        col("source") === col("src_b") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
    d22Verify(docs, cand)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d22_containment" -> d22Containment,
    "d23_containment_decontam" -> d23ContainmentDecontam,
    "d16_semantic_dedup" -> ((s, d) => d16SemanticDedup(s, d)),
    "d1_dedup_exact" -> d1DedupExact,
    "d2_dedup_normalized" -> d2DedupNormalized,
    "d3_ngram_jaccard" -> d3NgramJaccard,
    "d25_cdf_dedup_maintenance" -> d25CdfDedupMaintenance,
    "d4_minhash_lsh" -> d4MinhashLsh,
    "d5_simhash_dup" -> d5SimhashDup,
    "d6_embedding_neardup" -> d6EmbeddingNearDup,
    "d11_incremental_dedup" -> d11IncrementalDedup,
    "d13_canonicalize" -> d13Canonicalize,
    "d15_source_overlap" -> d15SourceOverlap,
    "d17_substring_dedup" -> d17SubstringDedup
  )

  val oracleSql: Map[String, String] = Map(
    // d5's hash-exact tier: DuckDB recomputes the 64-bit SimHash from raw
    // text (t4's FNV-1a byte fold + per-bit majority vote, HUGEINT
    // mod-2^64 with the 2^63 wrap to BIGINT) over the same twin-injected
    // payload view, then pairs ALL same-source docs — the Spark banding
    // must be lossless at hamming ≤ 3 (pigeonhole over 4 disjoint 16-bit
    // bands), so the compare is hash-exact, not a recall floor
    "d5_simhash_dup" ->
      """WITH pay AS (
        |  SELECT doc_id * 2 AS pid, source, text FROM documents
        |  UNION ALL
        |  SELECT doc_id * 2 + 1, source, 'x' || text
        |  FROM documents WHERE doc_id % 5 = 0),
        |tk AS (
        |  SELECT pid, source, regexp_split_to_array(trim(text), '\s+') AS tok
        |  FROM pay),
        |hl AS (
        |  SELECT pid, source, len(tok) AS nt,
        |    list_transform(tok, w ->
        |      list_reduce(list_prepend(14695981039346656037::HUGEINT,
        |        list_transform(range(1, octet_length(encode(w))+1),
        |          i -> (16*(strpos('0123456789ABCDEF', hex(encode(w))[2*i-1:2*i-1]) - 1)
        |               + (strpos('0123456789ABCDEF', hex(encode(w))[2*i:2*i]) - 1))::HUGEINT)),
        |        (a, x) -> (xor(a, x) * 1099511628211::HUGEINT)
        |                  % 18446744073709551616::HUGEINT)) AS hs
        |  FROM tk),
        |sg AS (
        |  SELECT pid, source,
        |    list_sum(list_transform(range(0, 64),
        |      b -> CASE WHEN 2*list_sum(list_transform(hs,
        |             v -> (v // (2::HUGEINT ^ b)::HUGEINT) % 2)) > nt
        |           THEN (2::HUGEINT ^ b)::HUGEINT ELSE 0::HUGEINT END)) AS sh_u
        |  FROM hl),
        |sig AS (
        |  SELECT pid, source,
        |    CAST(sh_u - CASE WHEN sh_u >= 9223372036854775808::HUGEINT
        |      THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT) AS sh
        |  FROM sg)
        |SELECT a.pid AS a_id, b.pid AS b_id,
        |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
        |FROM sig a JOIN sig b ON a.source = b.source AND a.pid < b.pid
        |WHERE bit_count(xor(a.sh, b.sh)) <= 3
        |ORDER BY a_id, b_id""".stripMargin,
    // eval/corpus split by the d8 convention (doc_id % 50); containment
    // relative to the EVAL doc; DuckDB computes the unfiltered cross
    // product (10 × ~490 at the oracle SF) — the Spark side's broadcast
    // prefix block must reproduce it exactly
    "d23_containment_decontam" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents),
        |g AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS gram
        |  FROM t, unnest(generate_series(1, len(tk) - 2)) AS u(i)
        |  WHERE len(tk) >= 3),
        |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY doc_id),
        |inter AS (SELECT c.doc_id AS c_id, e.doc_id AS eval_id,
        |    CAST(COUNT(*) AS BIGINT) AS inter
        |  FROM g c JOIN g e USING (gram)
        |  WHERE e.doc_id % 50 = 0 AND c.doc_id % 50 <> 0
        |  GROUP BY 1, 2)
        |SELECT i.c_id, i.eval_id, se.n AS ne, sc.n AS nc, i.inter,
        |  CAST((1000000 * i.inter) // se.n AS BIGINT) AS containment_ppm
        |FROM inter i
        |JOIN sz se ON se.doc_id = i.eval_id
        |JOIN sz sc ON sc.doc_id = i.c_id
        |WHERE se.n > 0 AND i.inter * 10 >= se.n * 8
        |ORDER BY c_id, eval_id""".stripMargin,
    // groups raw word lists where the Spark side interns 64-bit hashes —
    // collision-equivalent (d13's accepted argument); identical integer
    // cross-multiplied thresholds and floor-div ppm
    "d22_containment" ->
      """WITH t AS (SELECT doc_id, source,
        |    list_distinct(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    CAST(len(a.w) AS BIGINT) AS na, CAST(len(b.w) AS BIGINT) AS nb,
        |    CAST(len(list_intersect(a.w, b.w)) AS BIGINT) AS inter
        |  FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT a_id, b_id, na, nb, inter,
        |  CAST((1000000 * inter) // LEAST(na, nb) AS BIGINT) AS containment_ppm
        |FROM p
        |WHERE LEAST(na, nb) > 0 AND inter * 10 >= LEAST(na, nb) * 9
        |  AND inter * 10 < (na + nb - inter) * 8
        |ORDER BY a_id, b_id""".stripMargin,
    // groups the raw gram text where the Spark side groups its 64-bit
    // hash — collision-equivalent (d13's accepted argument)
    "d17_substring_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |grams AS (SELECT doc_id, i AS pos, array_to_string(w[i+1:i+8], ' ') AS gram
        |  FROM toks, LATERAL (SELECT unnest(range(0, len(w) - 7)) AS i)),
        |dup AS (SELECT gram FROM grams GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
        |marked AS (SELECT g.doc_id, g.pos FROM grams g SEMI JOIN dup USING (gram)),
        |isl AS (SELECT doc_id, pos,
        |    SUM(CASE WHEN pos = prev + 1 THEN 0 ELSE 1 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM (SELECT doc_id, pos,
        |          lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |        FROM marked))
        |SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 7 AS span_end,
        |       MAX(pos) - MIN(pos) + 8 AS span_len
        |FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start""".stripMargin,
    // groups on the raw normalized key — the Spark side's 64-bit hash of
    // it is collision-equivalent; divergence would fail the hash compare
    "d13_canonicalize" ->
      """WITH n AS (SELECT doc_id, source,
        |    array_to_string(list_sort(list_distinct(
        |      string_split_regex(trim(text), '\s+'))), ' ') AS key
        |  FROM documents),
        |g AS (SELECT doc_id,
        |    FIRST_VALUE(doc_id) OVER (PARTITION BY key
        |      ORDER BY source, doc_id) AS canonical_id,
        |    COUNT(*) OVER (PARTITION BY key) AS n_copies
        |  FROM n)
        |SELECT doc_id, canonical_id, n_copies FROM g
        |WHERE n_copies > 1 ORDER BY doc_id""".stripMargin,
    "d11_incremental_dedup" ->
      """WITH h AS (SELECT text FROM documents WHERE doc_id % 10 < 8),
        |b AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8)
        |SELECT MIN(b.doc_id) AS keep_id, COUNT(*) AS n_in_batch
        |FROM b ANTI JOIN h USING (text)
        |GROUP BY b.text ORDER BY keep_id""".stripMargin,
    "d1_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    "d2_dedup_normalized" ->
      """SELECT min(doc_id) AS keep_id, COUNT(*) AS n_docs
        |FROM (SELECT doc_id,
        |        array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\s+'))), ' ') AS key
        |      FROM documents)
        |GROUP BY key HAVING COUNT(*) > 1 ORDER BY keep_id""".stripMargin,
    "d3_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, source,
        |    list_distinct(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
        |    / len(list_distinct(list_cat(a.w, b.w))) AS jaccard
        |FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
        |    / len(list_distinct(list_cat(a.w, b.w))) >= 0.8
        |ORDER BY a_id, b_id""".stripMargin,
    // the incremental maintenance must equal d3 recomputed FROM SCRATCH
    // over the final live corpus (everything minus the purge predicate) —
    // label equality with the full recompute is the maintenance contract
    "d25_cdf_dedup_maintenance" ->
      """WITH t AS (SELECT doc_id, source,
        |    list_distinct(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents WHERE doc_id % 11 <> 3)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
        |    / len(list_distinct(list_cat(a.w, b.w))) AS jaccard
        |FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
        |    / len(list_distinct(list_cat(a.w, b.w))) >= 0.8
        |ORDER BY a_id, b_id""".stripMargin,
    // joins on the raw normalized key where the Spark side joins its
    // 64-bit hash — collision-equivalent (d13's accepted argument)
    "d15_source_overlap" ->
      """WITH k AS (SELECT DISTINCT source,
        |    array_to_string(list_sort(list_distinct(
        |      string_split_regex(trim(text), '\s+'))), ' ') AS key
        |  FROM documents)
        |SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
        |FROM k a JOIN k b ON a.key = b.key AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "d6_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  list_dot_product(a.v, b.v)
        |    / sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)) AS cos
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v, b.v)
        |    / sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)) >= 0.4
        |ORDER BY a_id, b_id""".stripMargin
  )
}
