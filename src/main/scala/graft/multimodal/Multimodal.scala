package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction as batched per-partition kernels (the Scala
  * analog of `mapInPandas`: one buffer of rows per call, vectorizable
  * libraries plug in at the marked stub).
  *
  * The decode step is a clearly-marked STUB (no image/audio libs in
  * this container): it derives deterministic fake features from the
  * bytes. The Spark-side plumbing — schema, binary transport,
  * partition batching, feature schema — is real and tested.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, media_type: String, byte_len: Long,
      checksum: Long, width: Int, height: Int, n_frames: Int)

  /** STUB decoder: replace with a real codec (JPEG/PNG/WAV/MP4) bound
    * in via JNI or a pure-JVM lib. Deterministic fake: dimensions from
    * a byte checksum, 1 frame for images, byte_len/1024 for video.
    */
  def decodeStub(mediaType: String, payload: Array[Byte]): (Int, Int, Int) = {
    var cs = 0L
    var k = 0
    while (k < payload.length) { cs = cs * 31 + (payload(k) & 0xFF); k += 1 }
    val w = 16 + math.floorMod(cs, 64).toInt
    val h = 16 + math.floorMod(cs >> 8, 64).toInt
    val frames = mediaType match {
      case "video" => math.max(1, payload.length / 1024)
      case _ => 1
    }
    (w, h, frames)
  }

  @inline def checksum(payload: Array[Byte]): Long = {
    var cs = 0L
    var k = 0
    while (k < payload.length) { cs = cs * 31 + (payload(k) & 0xFF); k += 1 }
    cs
  }

  /** Batched feature extraction over a binary column — mapPartitions so
    * a real decoder amortizes per-batch setup (model load, codec init)
    * exactly like `mapInPandas` batches Arrow record batches.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder setup would go here (codec/model init)
      rows.map { r =>
        val (w, h, f) = decodeStub(r.media_type, r.payload)
        MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong,
          checksum(r.payload), w, h, f)
      }
    }
  }

  /** Build a MediaRow dataset from the documents table (text bytes as
    * the opaque payload — the testdata has no real media, the transport
    * is what's exercised).
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
