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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_multimodal_meta" -> m1MultimodalMeta
  )

  val oracleSql: Map[String, String] = Map(
    "m1_multimodal_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  sha256(text) AS sha256,
        |  64 + octet_length(encode(text)) % 256 AS width,
        |  64 + (octet_length(encode(text)) * 7) % 256 AS height,
        |  1 + octet_length(encode(text)) % 4 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
