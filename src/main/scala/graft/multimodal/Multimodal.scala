package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction as batched per-partition kernels (the Scala
  * analog of `mapInPandas`: one buffer of rows per call, vectorizable
  * libraries plug in at the marked stub).
  *
  * Image decode is REAL (javax.imageio: PNG/JPEG/BMP and GIF including
  * multi-frame animated GIF frame counts). Audio/video decode is a
  * clearly-marked STUB (no codec libs in this container): it derives
  * deterministic fake features from the bytes. The Spark-side
  * plumbing — schema, binary transport, partition batching, feature
  * schema — is real and tested either way.
  */
object Multimodal {

  // Memory-backed ImageIO streams: the default disk cache creates (and
  // fsyncs, and deletes) one temp file per read/write call, which for
  // ~KB payloads costs far more than the codec itself on a contended
  // disk. Object init runs once per JVM — driver and each executor —
  // before any decode/encode call below.
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, media_type: String, byte_len: Long,
      checksum: Long, width: Int, height: Int, n_frames: Int)

  /** True when the payload starts with a magic number javax.imageio can
    * decode (PNG / JPEG / GIF / BMP).
    */
  def looksLikeImage(payload: Array[Byte]): Boolean =
    payload.length >= 4 && {
      val b0 = payload(0) & 0xFF; val b1 = payload(1) & 0xFF
      val b2 = payload(2) & 0xFF; val b3 = payload(3) & 0xFF
      (b0 == 0x89 && b1 == 'P' && b2 == 'N' && b3 == 'G') || // PNG
      (b0 == 0xFF && b1 == 0xD8) ||                          // JPEG
      (b0 == 'G' && b1 == 'I' && b2 == 'F') ||               // GIF
      (b0 == 'B' && b1 == 'M')                               // BMP
    }

  /** REAL image decode via javax.imageio (pure JVM, no native codecs):
    * returns (width, height, n_frames) for a decodable
    * PNG/JPEG/GIF/BMP payload, None otherwise. The ImageReader API
    * (not `ImageIO.read`) so multi-frame formats report their REAL
    * frame count — an animated GIF yields n_frames > 1. The first
    * frame is fully decoded to reject payloads with a valid header but
    * corrupt data.
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int)] =
    if (!looksLikeImage(payload)) None
    else {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            // seekForwardOnly=false so getNumImages may scan the stream
            reader.setInput(iis, false, true)
            val w = reader.getWidth(0); val h = reader.getHeight(0)
            val n = try math.max(1, reader.getNumImages(true)) catch { case _: Exception => 1 }
            if (reader.read(0) == null) None else Some((w, h, n))
          } catch { case _: Exception => None }
          finally reader.dispose()
        }
      } finally iis.close()
    }

  /** Deterministic tiny PNG: dims derive from the id (width
    * 16 + id % 32, height 16 + id % 17), pixels a fixed gradient —
    * decodable fixture for the real-decode path.
    */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 16 + (id % 32).toInt
    val h = 16 + (id % 17).toInt
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (((x * 31 + y * 7 + id) & 0xFFFFFF).toInt))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic multi-frame ANIMATED GIF: `2 + id % 5` frames of
    * `(8 + id % 16) x (8 + id % 11)` pixels, written through the JDK's
    * GIF sequence writer — a real multi-frame payload for the
    * frame-count decode path, with zero non-JVM dependencies.
    */
  def syntheticGif(id: Long): Array[Byte] = {
    val w = 8 + (id % 16).toInt
    val h = 8 + (id % 11).toInt
    val nFrames = 2 + (id % 5).toInt
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, ((x * 13 + y * 5 + f * 41 + id) & 0xFFFFFF).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** PERCEPTUAL difference hash (dHash, 64-bit) over a REAL decode:
    * ImageIO decode, integer box-average downsample to a 9x8 grayscale
    * grid (our own pixel loop over `getRGB` — not Graphics2D scaling,
    * whose rendering pipeline may vary; integer arithmetic makes the
    * bits identical on every JVM), then bit `r*8+c` set when the cell
    * is brighter than its right neighbor. Near-duplicate images —
    * re-encodes, resizes, small edits — land within a few bits;
    * pair them with [[graft.text.TextOps.hammingPairs]] (the banded
    * join is signature-agnostic). Returns None for undecodable
    * payloads.
    */
  def dHash(payload: Array[Byte]): Option[Long] =
    if (!looksLikeImage(payload)) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val gw = 9; val gh = 8
        val w = img.getWidth; val h = img.getHeight
        val gray = Array.ofDim[Long](gh, gw)
        var r = 0
        while (r < gh) {
          val y0 = r * h / gh
          val y1 = math.max(y0 + 1, (r + 1) * h / gh)
          var c = 0
          while (c < gw) {
            val x0 = c * w / gw
            val x1 = math.max(x0 + 1, (c + 1) * w / gw)
            var sum = 0L
            var n = 0L
            var y = y0
            while (y < y1 && y < h) {
              var x = x0
              while (x < x1 && x < w) {
                val rgb = img.getRGB(x, y)
                // integer luma (ITU-R 601 weights scaled by 1000)
                sum += 299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
                  114L * (rgb & 0xFF)
                n += 1
                x += 1
              }
              y += 1
            }
            gray(r)(c) = if (n == 0) 0L else sum / n
            c += 1
          }
          r += 1
        }
        var bits = 0L
        r = 0
        while (r < 8) {
          var c = 0
          while (c < 8) {
            if (gray(r)(c) > gray(r)(c + 1)) bits |= 1L << (r * 8 + c)
            c += 1
          }
          r += 1
        }
        Some(bits)
      }
    } catch { case _: Exception => None }

  /** (id, dhash) signature table over a media table's decodable image
    * payloads — row-local mapPartitions, shuffle-free; feed to
    * [[graft.text.TextOps.hammingPairs]] for banded near-dup pairs.
    */
  def imageHashes(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(m => dHash(m.payload).map(h => (m.doc_id, h)))
    }.toDF("doc_id", "dhash")
  }

  /** STUB decoder for the formats with no pure-JVM codec in this
    * container (audio/video): deterministic fake dimensions from a byte
    * checksum, byte_len/1024 frames for video. Real image payloads
    * never reach this — [[extractFeatures]] routes them through
    * [[decodeImage]].
    */
  def decodeStub(mediaType: String, payload: Array[Byte]): (Int, Int, Int) =
    decodeStubFromChecksum(mediaType, payload.length, checksum(payload))

  /** [[decodeStub]] with the checksum precomputed — lets callers that
    * already scanned the bytes (feature extraction) avoid a second
    * pass.
    */
  def decodeStubFromChecksum(mediaType: String, byteLen: Int, cs: Long): (Int, Int, Int) = {
    val w = 16 + math.floorMod(cs, 64).toInt
    val h = 16 + math.floorMod(cs >> 8, 64).toInt
    val frames = mediaType match {
      case "video" => math.max(1, byteLen / 1024)
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

  /** REAL image resize: decode, draw scaled with bilinear rendering,
    * re-encode PNG — pure JVM (ImageIO + Graphics2D). Returns None for
    * undecodable payloads.
    */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    if (!looksLikeImage(payload)) None
    else try {
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (src == null) None
      else {
        val dst = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case _: Exception => None }

  /** Frame sampling over a video payload: every `stride`-th fixed-size
    * block as one "frame" payload. The SPLITTING is a stub (no video
    * codec in this container — a real one would seek keyframes); the
    * Spark-side shape is the real one: one binary row per sampled
    * frame, ready for per-frame feature extraction.
    */
  def frameSampleStub(
      payload: Array[Byte], frameBytes: Int, stride: Int): Seq[(Int, Array[Byte])] = {
    val nFrames = math.max(1, payload.length / frameBytes)
    (0 until nFrames by stride).map { f =>
      val from = f * frameBytes
      (f, java.util.Arrays.copyOfRange(payload, from, math.min(from + frameBytes, payload.length)))
    }
  }

  /** Explode media rows into sampled frames — the batched per-partition
    * kernel shape of a video pipeline stage (one row per frame, frame
    * index carried alongside).
    */
  def sampleFrames(
      media: Dataset[MediaRow], frameBytes: Int = 1024, stride: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.media_type != "video") Iterator.empty
        else frameSampleStub(r.payload, frameBytes, stride).iterator.map {
          case (blockIdx, frame) => (r.doc_id, blockIdx, frame.length.toLong, checksum(frame))
        }
      }
    }.toDF("doc_id", "frame_idx", "frame_bytes", "frame_checksum")
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
        val cs = checksum(r.payload) // one byte scan, shared with the stub
        val (w, h, f) = decodeImage(r.payload)
          .getOrElse(decodeStubFromChecksum(r.media_type, r.payload.length, cs))
        MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong, cs, w, h, f)
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
