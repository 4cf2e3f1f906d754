package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Multimodal column handling (SURVEY §2.2 row 32): media payloads are
  * opaque `binary` columns plus a typed metadata struct; decode /
  * feature-extraction runs per-partition in batches.
  *
  * The decode step is a clearly marked STUB (no image/audio codecs in
  * this container): it derives deterministic fake features from the
  * payload bytes. Everything around it — the schema, the binary
  * column, the partition-batched execution shape, the feature struct
  * — is the real plumbing a codec-backed decoder would drop into.
  *
  * Scale notes: payloads never shuffle (all feature extraction is
  * map-side); metadata-only queries prune the binary column at the
  * parquet reader, so a 100 TB media table scans only its (tiny)
  * metadata columns.
  */
object Multimodal {

  case class MediaFeatures(width: Long, height: Long, nFrames: Long)
  case class MediaRecord(doc_id: Long, payload: Array[Byte])
  case class DecodedRecord(doc_id: Long, n_bytes: Long, features: MediaFeatures)

  /** View the documents table as a media table: payload = utf-8 bytes
    * of `text` standing in for an image/audio blob.
    */
  def asMediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** STUB decode: deterministic fake features from payload size.
    * A real implementation would decode the codec here (per partition,
    * batched); the signature and execution shape are what matter.
    */
  def decodeStub(payload: Array[Byte], docId: Long): MediaFeatures = {
    val n = payload.length.toLong
    MediaFeatures(32 + n % 640, 32 + (n * 7) % 480, 1 + docId % 30)
  }

  /** Partition-batched decode — the `mapPartitions` execution shape a
    * codec-backed decoder needs (amortized per-partition init, e.g.
    * loading a decoder library once per task, not per row).
    */
  def decodeAll(media: Dataset[MediaRecord]): Dataset[DecodedRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real decoder init would happen here, once per partition
      it.map(r => DecodedRecord(r.doc_id, r.payload.length.toLong,
        decodeStub(r.payload, r.doc_id)))
    }
  }

  /** §2.2 row 32 — metadata + stub-decoded features, expressed as pure
    * column arithmetic so DuckDB can oracle-check the plumbing.
    * (Must stay value-identical to [[decodeStub]]; the MultimodalSpec
    * asserts the two paths agree.)
    */
  val metaQuery: QueryDef = QueryDef(
    "m_multimodal_meta",
    (s, dir) => Tables.load(s, dir, "documents").select(
      col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      md5(col("text")).as("content_md5"),
      (octet_length(col("text")).cast("long") % 640 + 32).as("width"),
      ((octet_length(col("text")).cast("long") * 7) % 480 + 32).as("height"),
      (col("doc_id") % 30 + 1).as("n_frames")),
    Some("""SELECT doc_id,
            CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
            md5(text) AS content_md5,
            CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) % 640 + 32 AS width,
            (CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) * 7) % 480 + 32 AS height,
            doc_id % 30 + 1 AS n_frames
            FROM documents"""))

  /** Frame sampling: expand each media item to its frames (batch
    * expansion — the explode side of decode) and keep every 3rd frame.
    * At scale this is map-side row generation; no shuffle.
    */
  val frameSample: QueryDef = QueryDef(
    "m_frame_sample",
    (s, dir) => Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        explode(sequence(lit(1L), col("doc_id") % 30 + 1)).as("frame"))
      .where(col("frame") % 3 === 0),
    Some("""WITH f AS (SELECT doc_id, unnest(range(1, doc_id % 30 + 2)) AS frame FROM documents)
            SELECT doc_id, CAST(frame AS BIGINT) AS frame FROM f WHERE frame % 3 = 0"""))

  val defs: Seq[QueryDef] = Seq(metaQuery, frameSample)
}
