package graft.operators

import graft.{Q, Tables}
import Tables.t
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, decoded per-partition through a typed Dataset.
  *
  * The decode itself is a STUB — a deterministic fake (this container
  * has no image/audio codecs): "dimensions" and "frame count" are
  * arithmetic on the byte length, the content hash is real MD5. The
  * Spark-side plumbing is the real thing being exercised: binary column
  * → case-class Encoder → `mapPartitions` (one decoder instance per
  * partition, the same batch shape a JNI/codec decoder would use) →
  * typed metadata table. Swapping `decodeStub` for a real codec is a
  * one-function change.
  *
  * At 100 TB: blobs stay columnar in Parquet, the decoder runs
  * data-local per partition, and metadata (not pixels) is what
  * shuffles.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, blob: Array[Byte])
  case class MediaMeta(doc_id: Long, byte_len: Long, width: Long,
      height: Long, n_frames: Long, content_hash: String)

  /** Deterministic fake decode: replace with a real codec off-container. */
  def decodeStub(rec: MediaRecord): MediaMeta = {
    val len = rec.blob.length.toLong
    val md = java.security.MessageDigest.getInstance("MD5")
    val hash = md.digest(rec.blob).map("%02x".format(_)).mkString
    MediaMeta(rec.doc_id, len,
      width = len % 64,
      height = (len / 64) % 64 + 1,
      n_frames = len % 7 + 1,
      content_hash = hash)
  }

  private val q60 = Q(
    "q60_multimodal_decode",
    (s, d) => {
      import s.implicits._
      t(s, d, "documents")
        .select($"doc_id", $"text".cast("binary").as("blob"))
        .as[MediaRecord]
        .mapPartitions(_.map(decodeStub))
        .toDF()
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT)              AS byte_len,
             CAST(octet_length(encode(text)) % 64 AS BIGINT)         AS width,
             CAST((octet_length(encode(text)) // 64) % 64 + 1 AS BIGINT) AS height,
             CAST(octet_length(encode(text)) % 7 + 1 AS BIGINT)      AS n_frames,
             md5(text)                                               AS content_hash
      FROM documents
      ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(q60)
}
