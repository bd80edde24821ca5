package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction as batched per-partition kernels (the Scala
  * analog of `mapInPandas`: one buffer of rows per call).
  *
  * Decode is REAL across all three modalities, pure JVM: images via
  * javax.imageio (PNG/JPEG/BMP and GIF including multi-frame animated
  * GIF frame counts), audio via a RIFF/WAVE chunk walker that reads
  * every 16-bit PCM sample, video via an MJPEG-in-AVI walker that
  * counts movi chunks and decodes the JPEG frames. The checksum STUB
  * remains only for formats that genuinely require codec libraries
  * absent from this container (MP3/AAC/H.264...).
  */
object Multimodal {

  // Memory-backed ImageIO streams: the default disk cache creates (and
  // fsyncs, and deletes) one temp file per read/write call, which for
  // ~KB payloads costs far more than the codec itself on a contended
  // disk. Object init runs once per JVM — driver and each executor —
  // before any decode/encode call below.
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Unified feature row for [[extractFeatures]]. The (width, height,
    * n_frames) triple is per-modality: images/AVI video report pixel
    * dims and frame count; RIFF/WAVE audio reports (sample rate,
    * channels, PCM frame count) in the same slots — documented reuse
    * rather than a per-modality schema, so one kernel serves mixed
    * media tables. The dedicated [[audioFeatures]] / [[videoFeatures]]
    * kernels expose the properly-named per-modality schemas.
    */
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

  /** One LOSSLESS keyframe of a synthetic video: frame `f` of the
    * same `(8 + id % 16) x (8 + id % 11)` grid the animated GIF uses,
    * pixel `(x·13 + y·5 + f·41 + id) & 0xFFFFFF`, PNG-encoded — PNG
    * round-trips RGB exactly (GIF palettizes, JPEG is lossy), which is
    * what lets the frame-difference oracle replay pixels analytically.
    */
  def syntheticPngFrame(id: Long, f: Int): Array[Byte] = {
    val w = 8 + (id % 16).toInt
    val h = 8 + (id % 11).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x * 13 + y * 5 + f * 41 + id) & 0xFFFFFF).toInt)
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

  /** ViT-style patch grid over REAL image decode: each full
    * `patch`×`patch` tile of the decoded image reduced to its integer
    * channel-sum Σ(r+g+b) — the patch-embedding preprocessing shape
    * (image → patch grid → per-patch features) with the decode done by
    * the real javax.imageio path, not a stub. Integer sums make the
    * result bit-exact for the analytic oracle. Edge remainders that
    * don't fill a patch are dropped (standard ViT behavior: crop to a
    * multiple of the patch size).
    *
    * Per-partition flatMap — decode cost stays on the executors, no
    * shuffle until the caller aggregates.
    *
    * Returns (doc_id, pj, pi, px_sum) rows.
    */
  def patchIntensitySums(media: Dataset[MediaRow], patch: Int = 8): DataFrame = {
    require(patch >= 1, s"patch must be >= 1, got $patch")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        val img = try {
          val in = new java.io.ByteArrayInputStream(m.payload)
          Option(javax.imageio.ImageIO.read(in))
        } catch { case _: java.io.IOException => None }
        img.toSeq.flatMap { im =>
          val (w, h) = (im.getWidth, im.getHeight)
          for (pj <- 0 until h / patch; pi <- 0 until w / patch) yield {
            var s = 0L
            var y = pj * patch
            while (y < (pj + 1) * patch) {
              var x = pi * patch
              while (x < (pi + 1) * patch) {
                val v = im.getRGB(x, y)
                s += ((v >> 16) & 0xFF) + ((v >> 8) & 0xFF) + (v & 0xFF)
                x += 1
              }
              y += 1
            }
            (m.doc_id, pj, pi, s)
          }
        }
      }
    }.toDF("doc_id", "pj", "pi", "px_sum")
  }

  /** STUB decoder — now ONLY for payloads that are genuinely not a
    * container this engine can parse (compressed codecs: MP3/AAC/H.264
    * etc., which need codec libraries absent from this container, or
    * arbitrary non-media bytes): deterministic fake dimensions from a
    * byte checksum. Real image payloads route through [[decodeImage]];
    * RIFF/WAVE audio through [[decodeWav]]; MJPEG-in-AVI video through
    * [[decodeAvi]] — all pure-JVM REAL parsers.
    */
  def decodeStub(mediaType: String, payload: Array[Byte]): (Int, Int, Int) = {
    requireNotRealContainer(payload, -1L)
    decodeStubFromChecksum(mediaType, payload.length, checksum(payload))
  }

  /** The stub contract, enforced loudly: a payload carrying a REAL
    * container magic (PNG/GIF/JPEG/BMP, RIFF/WAVE, RIFF/AVI) must never
    * reach the checksum stub — if its real parser returned None the
    * payload is corrupt, and silently faking dimensions would hide it.
    */
  def requireNotRealContainer(payload: Array[Byte], docId: Long): Unit =
    if (looksLikeImage(payload) || looksLikeWav(payload) || looksLikeAvi(payload))
      throw new IllegalArgumentException(
        s"payload${if (docId >= 0) s" for doc $docId" else ""} carries a real container " +
          "magic but failed its real parser; refusing the checksum stub — corrupt " +
          "media fails loudly, never silently fakes dimensions")

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

  // ------------------------------------------------------------------
  // RIFF plumbing shared by the WAV (audio) and AVI (video) codecs.
  // RIFF is a chunked container: fourCC tag, little-endian u32 size,
  // payload, padded to even length. Both formats are pure container
  // arithmetic — no codec library needed (the AVI frames themselves
  // are JPEG, which javax.imageio decodes).
  // ------------------------------------------------------------------

  private def leU16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xFF); b.write((v >> 8) & 0xFF)
  }
  private def leU32(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
    b.write((v & 0xFF).toInt); b.write(((v >> 8) & 0xFF).toInt)
    b.write(((v >> 16) & 0xFF).toInt); b.write(((v >> 24) & 0xFF).toInt)
  }
  private def fourCC(b: java.io.ByteArrayOutputStream, s: String): Unit = {
    var i = 0; while (i < 4) { b.write(s.charAt(i).toInt & 0xFF); i += 1 }
  }
  @inline private def rdU16(a: Array[Byte], off: Int): Int =
    (a(off) & 0xFF) | ((a(off + 1) & 0xFF) << 8)
  @inline private def rdU32(a: Array[Byte], off: Int): Long =
    (a(off) & 0xFFL) | ((a(off + 1) & 0xFFL) << 8) |
      ((a(off + 2) & 0xFFL) << 16) | ((a(off + 3) & 0xFFL) << 24)
  /** Chunk size at `off`, CLAMPED to the bytes actually present after
    * the 8-byte header. A malformed size field (u32 up to 4 GiB —
    * `.toInt` alone would wrap negative) must never move a walker
    * backwards: every `body + size + pad` advance stays strictly
    * increasing because the result is in `[0, remaining]`.
    */
  @inline private def chunkSize(a: Array[Byte], off: Int): Int = {
    val raw = rdU32(a, off + 4)
    val remaining = math.max(a.length - (off + 8), 0).toLong
    math.min(raw, remaining).toInt
  }
  @inline private def tagAt(a: Array[Byte], off: Int): String =
    new String(a, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  final case class WavMeta(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      nFrames: Long, durationMs: Long, sumAbs: Long)

  /** True when the payload is a RIFF/WAVE container. */
  def looksLikeWav(payload: Array[Byte]): Boolean =
    payload.length >= 12 && tagAt(payload, 0) == "RIFF" && tagAt(payload, 8) == "WAVE"

  /** True when the payload is a RIFF/'AVI ' container. */
  def looksLikeAvi(payload: Array[Byte]): Boolean =
    payload.length >= 12 && tagAt(payload, 0) == "RIFF" && tagAt(payload, 8) == "AVI "

  /** Deterministic 16-bit PCM WAV: sample rate cycles
    * {8000, 11025, 16000, 22050, 44100} by `id % 5`, channels
    * `1 + id % 2`, `200 + id % 300` frames; interleaved sample `i` is
    * `((i*2347 + id*17) mod 65536) - 32768`. A REAL RIFF/WAVE file
    * (fmt + data chunks, little-endian) whose every field the oracle
    * can predict analytically.
    */
  def syntheticWav(id: Long): Array[Byte] = {
    val rate = WavRates((id % 5).toInt)
    val channels = 1 + (id % 2).toInt
    val frames = 200 + (id % 300).toInt
    val total = frames * channels
    val dataLen = total * 2
    val b = new java.io.ByteArrayOutputStream(44 + dataLen)
    fourCC(b, "RIFF"); leU32(b, 36L + dataLen); fourCC(b, "WAVE")
    fourCC(b, "fmt "); leU32(b, 16L)
    leU16(b, 1) // PCM
    leU16(b, channels)
    leU32(b, rate.toLong)
    leU32(b, rate.toLong * channels * 2) // byte rate
    leU16(b, channels * 2)               // block align
    leU16(b, 16)                         // bits per sample
    fourCC(b, "data"); leU32(b, dataLen.toLong)
    var i = 0L
    while (i < total) {
      val s = ((i * 2347L + id * 17L) % 65536L).toInt - 32768
      leU16(b, s & 0xFFFF)
      i += 1
    }
    b.toByteArray
  }

  private val WavRates = Array(8000, 11025, 16000, 22050, 44100)

  /** REAL RIFF/WAVE parse: walks the chunk list (word-aligned sizes),
    * reads `fmt ` (PCM format, channels, rate, bits) and `data`
    * (decodes every little-endian 16-bit sample to fold a sum of
    * absolute amplitudes — proof the PCM payload was actually read,
    * not just the header). Duration is integer floor millis. None for
    * non-WAV or non-16-bit-PCM payloads.
    */
  def decodeWav(payload: Array[Byte]): Option[WavMeta] =
    if (!looksLikeWav(payload)) None
    else {
      var off = 12
      var rate = 0; var channels = 0; var bits = 0; var fmtOk = false
      var dataOff = -1; var dataLen = 0
      while (off + 8 <= payload.length) {
        val tag = tagAt(payload, off)
        val size = chunkSize(payload, off)
        val body = off + 8
        if (tag == "fmt " && size >= 16 && body + 16 <= payload.length) {
          fmtOk = rdU16(payload, body) == 1 // PCM
          channels = rdU16(payload, body + 2)
          rate = rdU32(payload, body + 4).toInt
          bits = rdU16(payload, body + 14)
        } else if (tag == "data") {
          dataOff = body; dataLen = math.min(size, payload.length - body)
        }
        off = body + size + (size & 1) // chunks are word-aligned
      }
      if (!fmtOk || bits != 16 || channels <= 0 || rate <= 0 || dataOff < 0) None
      else {
        var sumAbs = 0L
        var i = dataOff
        val end = dataOff + (dataLen & ~1)
        while (i < end) {
          val s = (rdU16(payload, i) << 16) >> 16 // sign-extend
          sumAbs += math.abs(s)
          i += 2
        }
        val frames = dataLen / (2L * channels)
        Some(WavMeta(rate, channels, bits, frames, frames * 1000L / rate, sumAbs))
      }
    }

  /** Windowed PCM energy over the REAL RIFF/WAVE parse: the decoded
    * 16-bit sample stream cut into `window`-sample frames, each
    * reduced to Σ s² — the framing step every audio featurizer (VAD,
    * loudness normalization, spectral prep) runs first. Sums of
    * int32 squares in int64 — exact, no float in sight; the trailing
    * partial window is emitted with its own sample count.
    *
    * Per-partition flatMap like the other media kernels: parse cost
    * on the executors, rows = ceil(samples/window) per clip.
    *
    * Returns (doc_id, win, n_samples, energy) rows.
    */
  def wavWindowEnergy(media: Dataset[MediaRow], window: Int = 256): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        val p = m.payload
        if (!looksLikeWav(p)) Seq.empty
        else {
          // locate the data chunk with the same walk as decodeWav
          var off = 12
          var dataOff = -1; var dataLen = 0
          var bits = 0; var fmtOk = false
          while (off + 8 <= p.length) {
            val tag = tagAt(p, off)
            val size = chunkSize(p, off)
            val body = off + 8
            if (tag == "fmt " && size >= 16 && body + 16 <= p.length) {
              fmtOk = rdU16(p, body) == 1
              bits = rdU16(p, body + 14)
            } else if (tag == "data") {
              dataOff = body; dataLen = math.min(size, p.length - body)
            }
            off = body + size + (size & 1)
          }
          if (!fmtOk || bits != 16 || dataOff < 0) Seq.empty
          else {
            val total = (dataLen & ~1) / 2
            (0 until (total + window - 1) / window).map { w =>
              val from = w * window
              val until = math.min(from + window, total)
              var s = 0L
              var k = from
              while (k < until) {
                val v = (rdU16(p, dataOff + 2 * k) << 16) >> 16
                s += v.toLong * v
                k += 1
              }
              (m.doc_id, w, until - from, s)
            }
          }
        }
      }
    }.toDF("doc_id", "win", "n_samples", "energy")
  }

  /** Locate the 16-bit PCM data chunk: (dataOff, dataLen) after the
    * same fmt/data walk as [[decodeWav]], or None for non-WAV /
    * non-16-bit-PCM payloads. Shared by the fingerprint and the
    * perturbation so they cannot disagree on what "the samples" are.
    */
  private def pcm16DataChunk(p: Array[Byte]): Option[(Int, Int)] =
    if (!looksLikeWav(p)) None
    else {
      var off = 12
      var dataOff = -1; var dataLen = 0
      var bits = 0; var fmtOk = false
      while (off + 8 <= p.length) {
        val tag = tagAt(p, off)
        val size = chunkSize(p, off)
        val body = off + 8
        if (tag == "fmt " && size >= 16 && body + 16 <= p.length) {
          fmtOk = rdU16(p, body) == 1
          bits = rdU16(p, body + 14)
        } else if (tag == "data") {
          dataOff = body; dataLen = math.min(size, p.length - body)
        }
        off = body + size + (size & 1)
      }
      if (!fmtOk || bits != 16 || dataOff < 0) None else Some((dataOff, dataLen))
    }

  /** Band-energy audio fingerprint (Haitsma & Kalker 2002 style, the
    * time-domain variant): the decoded 16-bit PCM stream is cut into
    * `bands` equal spans (sample `i` lands in band `i*bands/total`,
    * integer division), each reduced to an exact int64 energy Σ s²,
    * and bit `k` of the 64-bit signature is set iff
    * `E(k+1) > E(k)` — the sign of the band-energy derivative, the
    * same comparison-of-adjacent-aggregates bit the image dHash uses
    * along its column axis. Small local perturbations (quantization
    * noise, re-encoding) move each band energy by a vanishing fraction
    * of the inter-band differences, so near-duplicate clips land
    * within a few Hamming bits — the property the banded pair join
    * exploits.
    *
    * Per-partition flatMap like the other media kernels: decode cost
    * on the executors, one (doc_id, fp) row per decodable clip with
    * at least `bands` samples. Mirrors reference coverage of feature
    * extraction over opaque media columns (multimodal mandate).
    */
  def audioFingerprints(media: Dataset[MediaRow], bands: Int = 65): DataFrame = {
    require(bands >= 2 && bands <= 65, s"bands must be in [2,65], got $bands")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        val p = m.payload
        pcm16DataChunk(p).flatMap { case (dataOff, dataLen) =>
          val total = (dataLen & ~1) / 2
          if (total < bands) None
          else {
            val e = new Array[Long](bands)
            var i = 0
            while (i < total) {
              val v = (rdU16(p, dataOff + 2 * i) << 16) >> 16
              e((i.toLong * bands / total).toInt) += v.toLong * v
              i += 1
            }
            var fp = 0L
            var k = 0
            while (k < bands - 1) {
              if (e(k + 1) > e(k)) fp |= 1L << k
              k += 1
            }
            Some((m.doc_id, fp))
          }
        }
      }
    }.toDF("doc_id", "fp")
  }

  /** ONE RIFF/PCM walk emitting BOTH dedup features of a clip — the
    * whole-clip band-energy fingerprint ([[audioFingerprints]]) and
    * the windowed energies ([[wavWindowEnergy]], packed as one array
    * per clip, index = window id) — for consumers that need both (the
    * unified audio dedup endpoint): the decode pass over the samples
    * is the dominant row-local cost, and running [[audioFingerprints]]
    * and [[wavWindowEnergy]] separately walked every payload twice.
    * Values are bit-identical to the two single-feature kernels (same
    * chunk walk, same sample decode, same integer sums); `fp` is NULL
    * for clips shorter than `bands` samples, exactly the rows
    * [[audioFingerprints]] omits. Returns (doc_id, fp, energies).
    */
  def audioFpAndEnergies(
      media: Dataset[MediaRow], bands: Int = 65, window: Int = 64): DataFrame = {
    require(bands >= 2 && bands <= 65, s"bands must be in [2,65], got $bands")
    require(window >= 1, s"window must be >= 1, got $window")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        val p = m.payload
        pcm16DataChunk(p).map { case (dataOff, dataLen) =>
          val total = (dataLen & ~1) / 2
          val e = new Array[Long](bands)
          val wins = new Array[Long]((total + window - 1) / window)
          var i = 0
          while (i < total) {
            val v = (rdU16(p, dataOff + 2 * i) << 16) >> 16
            val sq = v.toLong * v
            e((i.toLong * bands / total).toInt) += sq
            wins(i / window) += sq
            i += 1
          }
          val fp: Option[Long] =
            if (total < bands) None
            else {
              var f = 0L
              var k = 0
              while (k < bands - 1) {
                if (e(k + 1) > e(k)) f |= 1L << k
                k += 1
              }
              Some(f)
            }
          (m.doc_id, fp, wins)
        }
      }
    }.toDF("doc_id", "fp", "energies")
  }

  /** Luma-histogram ENTROPY per image — the vision-corpus quality
    * filter (near-zero entropy = flat/synthetic fills, screenshots of
    * solid panels; high entropy = textured natural content — the
    * image analog of [[graft.text.TextOps.entropyFeatures]]'
    * low-information-density gate). REAL decode: every pixel's
    * ITU-R 601 integer luma `(299R + 587G + 114B) / 1000` lands in
    * one of 256 levels; Shannon entropy uses the same algebraically
    * folded `ln(n) − Σ c·ln c / n` form as the text face, summed in
    * ascending-level order, rounded to 6.
    *
    * Per-partition flatMap like the other media kernels — decode and
    * the 256-bin fold are row-local; no shuffle at all. Returns
    * (doc_id, n_px, n_levels, entropy).
    */
  def imageEntropy(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        if (!looksLikeImage(m.payload)) None
        else try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.payload))
          if (img == null) None
          else {
            val w = img.getWidth; val h = img.getHeight
            val hist = new Array[Long](256)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val luma = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF)
                  + 114 * (rgb & 0xFF)) / 1000
                hist(luma) += 1
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            var clnc = 0.0
            var levels = 0L
            var v = 0
            while (v < 256) {
              val c = hist(v)
              if (c > 0) { clnc += c * math.log(c.toDouble); levels += 1 }
              v += 1
            }
            val ent = math.log(n.toDouble) - clnc / n
            Some((m.doc_id, n, levels, ent))
          }
        } catch { case _: Exception => None }
      }
    }.toDF("doc_id", "n_px", "n_levels", "entropy")
      // round through Spark's own expression — the same Round the
      // text-entropy face goes through, proven to agree with the
      // oracle's ROUND(x, 6) bit for bit
      .select(col("doc_id"), col("n_px"), col("n_levels"),
        round(col("entropy"), 6).as("entropy"))
  }

  /** Energy-gate VAD (voice-activity detection) segments over a
    * [[wavWindowEnergy]] table: a window is ACTIVE when its exact
    * integer energy exceeds `thresholdPerSample` per sample
    * (cross-multiplied — no division, no float), and consecutive
    * active windows merge into one segment via gaps-and-islands
    * (island key = win − row_number within the doc). The classic
    * first stage of every speech pipeline (silence trimming, ASR
    * chunking, diarization pre-segmentation).
    *
    * Returns (doc_id, seg_start, seg_end, n_wins, sum_energy), one
    * row per maximal active run.
    *
    * 100 TB shape: the only window function is PARTITIONED BY doc_id
    * — per-partition state is one clip's window count (clip-length
    * bound, never corpus-wide), so the segment merge parallelizes
    * across documents like any keyed aggregation.
    */
  def vadSegments(energy: DataFrame, thresholdPerSample: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("win"))
    energy
      .filter(col("energy") > lit(thresholdPerSample) * col("n_samples"))
      .withColumn("isl", col("win") - row_number().over(w))
      .groupBy(col("doc_id"), col("isl"))
      .agg(
        min(col("win")).cast("long").as("seg_start"),
        max(col("win")).cast("long").as("seg_end"),
        count(lit(1)).cast("long").as("n_wins"),
        sum(col("energy")).cast("long").as("sum_energy"))
      .select(col("doc_id"), col("seg_start"), col("seg_end"),
        col("n_wins"), col("sum_energy"))
  }

  /** Inaudible re-encode of a WAV: every `every`-th sample (index over
    * the interleaved stream) is attenuated one quantization step
    * toward zero (`s > 0 → s-1`, else `s+1` — never overflows int16).
    * A REAL decode→perturb→re-encode pass over the payload bytes;
    * header chunks are untouched. Used to plant known near-duplicate
    * twins — the standard recall fixture for dedup evaluation (the
    * audio analog of the near-identical PNGs behind the phash faces).
    * Non-PCM16 payloads come back unchanged.
    */
  def perturbWav(payload: Array[Byte], every: Int = 97): Array[Byte] = {
    require(every >= 1, s"every must be >= 1, got $every")
    pcm16DataChunk(payload) match {
      case None => payload.clone()
      case Some((dataOff, dataLen)) =>
        val out = payload.clone()
        val total = (dataLen & ~1) / 2
        var k = 0
        while (k < total) {
          val s = (rdU16(out, dataOff + 2 * k) << 16) >> 16
          val s2 = if (s > 0) s - 1 else s + 1
          out(dataOff + 2 * k) = (s2 & 0xFF).toByte
          out(dataOff + 2 * k + 1) = ((s2 >> 8) & 0xFF).toByte
          k += every
        }
        out
    }
  }

  /** TRIMMED-HEAD re-encode of a WAV: the first `dropSamples`
    * interleaved 16-bit samples are removed from the data chunk and
    * the RIFF/data chunk sizes patched — a REAL byte-level transform
    * producing the head-cut duplicate every shift-tolerant audio
    * matcher must catch (the audio analog of the trimmed video
    * fixture; [[perturbWav]] plants the aligned twin). Non-PCM16
    * payloads come back unchanged.
    */
  def trimWav(payload: Array[Byte], dropSamples: Int = 64): Array[Byte] = {
    require(dropSamples >= 0, s"dropSamples must be >= 0, got $dropSamples")
    pcm16DataChunk(payload) match {
      case None => payload.clone()
      case Some((dataOff, dataLen)) =>
        val dropBytes = math.min(dropSamples * 2, dataLen & ~1)
        val out = new Array[Byte](payload.length - dropBytes)
        System.arraycopy(payload, 0, out, 0, dataOff)
        System.arraycopy(payload, dataOff + dropBytes, out, dataOff,
          payload.length - dataOff - dropBytes)
        def wrU32(a: Array[Byte], off: Int, v: Long): Unit = {
          a(off) = (v & 0xFF).toByte
          a(off + 1) = ((v >> 8) & 0xFF).toByte
          a(off + 2) = ((v >> 16) & 0xFF).toByte
          a(off + 3) = ((v >> 24) & 0xFF).toByte
        }
        wrU32(out, dataOff - 4, (dataLen - dropBytes).toLong) // data size
        wrU32(out, 4, rdU32(payload, 4) - dropBytes)          // RIFF size
        out
    }
  }

  final case class AviMeta(
      width: Int, height: Int, nFrames: Int, fps: Int,
      frame0Width: Int, frame0Height: Int)

  private val AviFps = Array(10, 20, 25, 40, 50) // exact divisors of 1e6

  /** Deterministic MJPEG-in-AVI: `2 + id % 4` JPEG frames of
    * `(16 + id % 13) x (16 + id % 7)` pixels at `{10,20,25,40,50}` fps
    * by `id % 5`. A REAL AVI container — RIFF('AVI ') with
    * LIST(hdrl){avih, LIST(strl){strh 'vids'/'MJPG', strf
    * BITMAPINFOHEADER}} and LIST(movi){'00dc' JPEG chunks} — written
    * with the JDK's JPEG encoder. Every header field the oracle can
    * predict analytically; the frame payloads are real JPEGs.
    */
  def syntheticAvi(id: Long): Array[Byte] = {
    val w = 16 + (id % 13).toInt
    val h = 16 + (id % 7).toInt
    val nFrames = 2 + (id % 4).toInt
    val fps = AviFps((id % 5).toInt)

    val jpegs = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, ((x * 31 + y * 7 + f * 41 + id) & 0xFFFFFF).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", bos)
      bos.toByteArray
    }

    def list(listType: String, body: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream(12 + body.length)
      fourCC(b, "LIST"); leU32(b, 4L + body.length); fourCC(b, listType)
      b.write(body); b.toByteArray
    }
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream(8 + body.length + 1)
      fourCC(b, tag); leU32(b, body.length.toLong); b.write(body)
      if ((body.length & 1) == 1) b.write(0) // pad to even
      b.toByteArray
    }

    val avih = {
      val b = new java.io.ByteArrayOutputStream(56)
      leU32(b, 1000000L / fps) // dwMicroSecPerFrame
      leU32(b, 0); leU32(b, 0); leU32(b, 0)
      leU32(b, nFrames.toLong) // dwTotalFrames
      leU32(b, 0); leU32(b, 1) // dwStreams = 1
      leU32(b, 0)
      leU32(b, w.toLong); leU32(b, h.toLong)
      leU32(b, 0); leU32(b, 0); leU32(b, 0); leU32(b, 0) // reserved
      b.toByteArray
    }
    val strh = {
      val b = new java.io.ByteArrayOutputStream(56)
      fourCC(b, "vids"); fourCC(b, "MJPG")
      leU32(b, 0); leU16(b, 0); leU16(b, 0); leU32(b, 0)
      leU32(b, 1)            // dwScale
      leU32(b, fps.toLong)   // dwRate -> fps = rate/scale
      leU32(b, 0); leU32(b, nFrames.toLong); leU32(b, 0)
      leU32(b, 0xFFFFFFFFL)  // quality = -1
      leU32(b, 0)
      leU16(b, 0); leU16(b, 0); leU16(b, w); leU16(b, h) // rcFrame
      b.toByteArray
    }
    val strf = {
      val b = new java.io.ByteArrayOutputStream(40)
      leU32(b, 40L); leU32(b, w.toLong); leU32(b, h.toLong)
      leU16(b, 1); leU16(b, 24)
      fourCC(b, "MJPG")
      leU32(b, w.toLong * h * 3)
      leU32(b, 0); leU32(b, 0); leU32(b, 0); leU32(b, 0)
      b.toByteArray
    }

    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", jpegs.map(j => chunk("00dc", j)).reduce(_ ++ _))
    val body = hdrl ++ movi

    val out = new java.io.ByteArrayOutputStream(12 + body.length)
    fourCC(out, "RIFF"); leU32(out, 4L + body.length); fourCC(out, "AVI ")
    out.write(body)
    out.toByteArray
  }

  /** Walk an AVI payload's movi list, yielding each video chunk
    * (`##dc`/`##db`) payload in stream order.
    */
  private def aviVideoChunks(payload: Array[Byte]): Iterator[Array[Byte]] = {
    if (!looksLikeAvi(payload)) return Iterator.empty
    // find LIST(movi) among the top-level chunks
    var off = 12
    var moviStart = -1; var moviEnd = -1
    while (off + 12 <= payload.length && moviStart < 0) {
      val tag = tagAt(payload, off)
      val size = chunkSize(payload, off)
      if (tag == "LIST" && tagAt(payload, off + 8) == "movi") {
        moviStart = off + 12
        moviEnd = math.min(off + 8 + size, payload.length)
      }
      off = off + 8 + size + (size & 1)
    }
    if (moviStart < 0) Iterator.empty
    else new Iterator[Array[Byte]] {
      // scan ranges as a stack: interleaved VfW files wrap each
      // frame group in LIST('rec ') sub-lists — descend into LIST
      // chunks instead of skipping them, or a standard interleaved
      // AVI would report zero frames
      private var ranges = List((moviStart, moviEnd))
      private var nextChunk: Array[Byte] = null
      private def advance(): Unit = {
        nextChunk = null
        while (nextChunk == null && ranges.nonEmpty) {
          val (p, end) = ranges.head
          if (p + 8 > end) ranges = ranges.tail
          else {
            val tag = tagAt(payload, p)
            val size = chunkSize(payload, p)
            val body = p + 8
            val after = body + size + (size & 1)
            ranges = (after, end) :: ranges.tail
            if (tag == "LIST" && size >= 4) {
              // descend: list body starts after its 4-byte type tag
              ranges = (body + 4, math.min(body + size, payload.length)) :: ranges
            } else if (tag.endsWith("dc") || tag.endsWith("db")) {
              nextChunk = java.util.Arrays.copyOfRange(
                payload, body, math.min(body + size, payload.length))
            }
          }
        }
      }
      advance()
      def hasNext: Boolean = nextChunk != null
      def next(): Array[Byte] = { val c = nextChunk; advance(); c }
    }
  }

  /** REAL AVI parse: walks RIFF LIST(hdrl) for avih (dims) and strh
    * (fps = dwRate/dwScale), counts the movi list's video chunks for
    * the true frame count, and DECODES frame 0 with javax.imageio
    * (the chunks are real JPEGs) — returned dims prove the frame
    * bytes, not just the header, were read. None for non-AVI payloads
    * or an undecodable first frame.
    */
  def decodeAvi(payload: Array[Byte]): Option[AviMeta] =
    if (!looksLikeAvi(payload)) None
    else {
      var w = 0; var h = 0; var fps = 0
      // hdrl scan: avih is 8 bytes of LIST(hdrl) body in our layout,
      // but walk generically: find LIST(hdrl), then its sub-chunks.
      var off = 12
      while (off + 12 <= payload.length) {
        val tag = tagAt(payload, off)
        val size = chunkSize(payload, off)
        if (tag == "LIST" && tagAt(payload, off + 8) == "hdrl") {
          var p = off + 12
          val end = math.min(off + 8 + size, payload.length)
          while (p + 8 <= end) {
            val t2 = tagAt(payload, p)
            val s2 = chunkSize(payload, p)
            if (t2 == "avih" && s2 >= 40) {
              w = rdU32(payload, p + 8 + 32).toInt
              h = rdU32(payload, p + 8 + 36).toInt
            } else if (t2 == "LIST" && p + 12 <= payload.length &&
                tagAt(payload, p + 8) == "strl") {
              var q = p + 12
              val e2 = math.min(p + 8 + s2, payload.length)
              while (q + 8 <= e2) {
                val t3 = tagAt(payload, q)
                val s3 = chunkSize(payload, q)
                if (t3 == "strh" && s3 >= 32 && tagAt(payload, q + 8) == "vids") {
                  val scale = rdU32(payload, q + 8 + 20)
                  val rate = rdU32(payload, q + 8 + 24)
                  if (scale > 0) fps = (rate / scale).toInt
                }
                q = q + 8 + s3 + (s3 & 1)
              }
            }
            p = p + 8 + s2 + (s2 & 1)
          }
        }
        off = off + 8 + size + (size & 1)
      }
      val frames = aviVideoChunks(payload)
      if (!frames.hasNext || w <= 0 || h <= 0) None
      else {
        var n = 0
        var f0: java.awt.image.BufferedImage = null
        frames.foreach { chunk =>
          if (n == 0)
            f0 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(chunk))
          n += 1
        }
        if (f0 == null) None
        else Some(AviMeta(w, h, n, fps, f0.getWidth, f0.getHeight))
      }
    }

  /** Explode media rows into REAL decoded frames — one row per movi
    * video chunk, each JPEG actually decoded (dims in the output are
    * the decoder's, not the header's). Non-AVI payloads yield no rows.
    * Row-local mapPartitions: shuffle-free, batched per partition like
    * `mapInPandas`.
    */
  def sampleAviFrames(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        aviVideoChunks(r.payload).zipWithIndex.flatMap { case (chunk, idx) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(chunk))
          if (img == null) Iterator.empty
          else Iterator((r.doc_id, idx.toLong, img.getWidth.toLong, img.getHeight.toLong))
        }
      }
    }.toDF("doc_id", "frame_idx", "frame_w", "frame_h")
  }

  /** SCENE-CUT DETECTION over a keyframe table (doc_id, frame_idx,
    * payload) of LOSSLESSLY-encoded frames: each frame is REALLY
    * decoded (ImageIO) into its RGB pixel array once, adjacent frames
    * equi-join on (doc_id, frame_idx + 1), and the per-pair difference
    * is the exact integer sum of |ΔR|+|ΔG|+|ΔB| over pixels —
    * `is_cut` fires when the mean per-pixel difference exceeds
    * `cutPerPixel` (the classic frame-differencing shot-boundary
    * detector; Hanjalic 2002 surveys the family). At 100 TB the shape
    * is: one narrow decode pass (row-local, the multimodal contract),
    * one doc-keyed self-join of frame-sized rows, one array fold per
    * pair — no corpus-wide anything; a video's frames co-locate under
    * its doc key.
    *
    * Frames must be losslessly coded (PNG/BMP): the decoded pixels ARE
    * the signal; a lossy codec would make the difference
    * codec-version-dependent. Mismatched adjacent dims yield no pair
    * (dimension changes are trivially cuts — surface them from the
    * dims face instead of inventing a pixel metric).
    *
    * Returns (doc_id, frame_idx, n_px, diff, is_cut) for frame_idx >=
    * 1, is_cut as 0/1.
    */
  def frameDiffCuts(
      frames: DataFrame, cutPerPixel: Double = 64.0): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    val dec = frames
      .select(col("doc_id").cast("long"), col("frame_idx").cast("long"),
        col("payload")).as[(Long, Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, f, p) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
          if (img == null) Iterator.empty
          else {
            val w = img.getWidth; val h = img.getHeight
            val px = new Array[Int](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { px(y * w + x) = img.getRGB(x, y) & 0xFFFFFF; x += 1 }
              y += 1
            }
            Iterator((id, f, w, h, px))
          }
        }
      }.toDF("doc_id", "frame_idx", "w", "h", "px")
    // pair on BOTH dims, not their product: equal-area frames with
    // swapped dims (8x6 vs 6x8) would otherwise diff row-major across
    // mismatched strides instead of yielding no pair
    val a = dec.toDF("doc_id", "fa", "w", "h", "pa")
    val b = dec.toDF("doc_b", "frame_idx", "wb", "hb", "pb")
    a.join(b, col("fa") + 1 === col("frame_idx") && col("doc_id") === col("doc_b")
        && col("w") === col("wb") && col("h") === col("hb"))
      .withColumn("n_px", col("w") * col("h"))
      .select(col("doc_id"), col("frame_idx"), col("n_px"),
        expr("""aggregate(zip_with(pa, pb, (x, y) ->
          abs((x div 65536) % 256 - (y div 65536) % 256) +
          abs((x div 256) % 256 - (y div 256) % 256) +
          abs(x % 256 - y % 256)), 0L, (acc, v) -> acc + v)""").as("diff"))
      .withColumn("is_cut",
        when(col("diff").cast("double") > lit(cutPerPixel) * col("n_px"), 1L)
          .otherwise(0L))
      .select(col("doc_id"), col("frame_idx"), col("n_px").cast("long").as("n_px"),
        col("diff"), col("is_cut"))
  }

  /** (doc_id, audio metadata) over a media table's RIFF/WAVE payloads —
    * the real-parse audio feature kernel (non-WAV rows yield nothing).
    */
  def audioFeatures(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        decodeWav(m.payload).map(a =>
          (m.doc_id, a.sampleRate, a.channels, a.bitsPerSample, a.nFrames,
            a.durationMs, a.sumAbs))
      }
    }.toDF("doc_id", "sample_rate", "channels", "bits", "n_samples", "duration_ms", "sum_abs")
  }

  /** (doc_id, video metadata) over a media table's AVI payloads — the
    * real-parse video feature kernel: container header fields plus the
    * DECODED first-frame dims (proof the JPEG bytes were read).
    */
  def videoFeatures(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        decodeAvi(m.payload).map(v =>
          (m.doc_id, v.width, v.height, v.nFrames, v.fps, v.frame0Width, v.frame0Height))
      }
    }.toDF("doc_id", "width", "height", "n_frames", "fps", "frame0_w", "frame0_h")
  }

  /** Batched feature extraction over a binary column — mapPartitions so
    * a real decoder amortizes per-batch setup (model load, codec init)
    * exactly like `mapInPandas` batches Arrow record batches.
    *
    * Routing: image magic -> [[decodeImage]]; RIFF/WAVE ->
    * [[decodeWav]] (slots = sample rate / channels / PCM frames);
    * RIFF/'AVI ' -> [[decodeAvi]] (pixel dims / frame count); only a
    * payload that is NONE of the parseable containers falls back to
    * the checksum stub.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder setup would go here (codec/model init)
      rows.map { r =>
        val cs = checksum(r.payload) // one byte scan, shared with the stub
        val (w, h, f) = decodeImage(r.payload)
          .orElse(decodeWav(r.payload).map(a =>
            (a.sampleRate, a.channels, a.nFrames.toInt)))
          .orElse(decodeAvi(r.payload).map(v => (v.width, v.height, v.nFrames)))
          .getOrElse {
            requireNotRealContainer(r.payload, r.doc_id)
            decodeStubFromChecksum(r.media_type, r.payload.length, cs)
          }
        MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong, cs, w, h, f)
      }
    }
  }

  /** Inaudible-analog PNG re-encode for VIDEO frames: every `every`-th
    * pixel (row-major index y*w + x) has its BLUE channel nudged one
    * step toward zero (`b > 0 → b-1`, else `b+1`). A REAL
    * decode→perturb→re-encode pass (PNG is lossless, so the decoded
    * pixels round-trip exactly); the standard planted-twin fixture for
    * frame-level dedup recall, the video analog of [[perturbWav]].
    * Undecodable payloads come back unchanged.
    */
  def perturbPngFrame(payload: Array[Byte], every: Int = 97): Array[Byte] = {
    require(every >= 1, s"every must be >= 1, got $every")
    val img = try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    } catch { case _: Exception => None }
    img match {
      case None => payload.clone()
      case Some(im) =>
        val w = im.getWidth; val h = im.getHeight
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = im.getRGB(x, y)
            val b = v & 0xFF
            val b2 = if ((y.toLong * w + x) % every == 0) {
              if (b > 0) b - 1 else b + 1
            } else b
            out.setRGB(x, y, (v & 0xFFFF00) | b2)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
    }
  }

  /** Per-FRAME dHash signatures over a (doc_id, frame_idx, payload)
    * frame table — [[imageHashes]] at frame grain: row-local
    * mapPartitions decode + the same 9x8 box-average dHash kernel,
    * shuffle-free. Returns (doc_id, frame_idx, fp); undecodable frames
    * yield no row.
    */
  def frameHashes(frames: DataFrame): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames
      .select(col("doc_id").cast("long"), col("frame_idx").cast("long"),
        col("payload")).as[(Long, Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, f, p) => dHash(p).map(hh => (id, f, hh)) }
      }.toDF("doc_id", "frame_idx", "fp")
  }

  /** Frame-aligned VIDEO near-duplicate pairs over per-frame dHash
    * signatures — the video member of the banded-Hamming dedup family
    * (text simhash / image phash / audio band-energy fp): frames pair
    * through the SAME [[graft.text.TextOps.hammingBands]] pigeonhole,
    * with `frame_idx` riding in the equi-join key so only
    * temporally-ALIGNED frames are candidates (the near-dup video
    * definition for same-timeline clips: re-encodes, per-frame
    * attenuation, logo burns — a shifted timeline is a different
    * video), then frame matches roll up per video pair and a STRICT
    * MAJORITY of the shorter video's frames must match
    * (`2·matched > min(nf_a, nf_b)` — robust to a dropped or
    * black frame, immune to a single coincidental frame collision).
    *
    * Scale shape: the banded join's candidates scale with bucket
    * occupancy per (frame_idx, band, bits) — never videos² — and the
    * rollup is pair-mass-sized keyed aggregation; `nf` joins are
    * video-count-sized. Result is IDENTICAL to the exhaustive
    * aligned-frame Hamming join (pigeonhole: ≤ `maxHamming` flipped
    * bits cannot touch all `maxHamming + 1` bands).
    *
    * `frameSigs` is (doc_id, frame_idx, fp) from [[frameHashes]].
    * Returns qualifying (id_a, id_b, n_matched).
    */
  def videoNearDupPairs(frameSigs: DataFrame, maxHamming: Int = 2): DataFrame = {
    val s = frameSigs.toDF("vid", "f", "sig")
    // EXACT-DUP QUOTIENT ON THE JOIN ITSELF: the banded pigeonhole join
    // runs over DISTINCT (frame_idx, hash) classes, not frame rows —
    // a real dup-heavy corpus carries large identical-hash classes
    // (measured 9.7x collapse on the 10x replica), and bucket
    // occupancy over members is quadratic in exactly that mass while
    // occupancy over classes is not (members: 81 s at 10x; classes:
    // the class join is corpus-shape-bound). Class pairs then expand
    // back to video pairs through two (f, sig)-keyed joins, whose
    // output is the TRUE frame-match mass — work the exhaustive
    // semantics owes anyway.
    val classes = graft.model.Lineage.cutRetired(
      s.select(col("f"), col("sig")).distinct(), reliable = false)
    val banded = graft.text.TextOps.hammingBands(
      classes.select(struct(col("f"), col("sig")).as("id"), col("sig")),
      sigBits = 64, maxHamming = maxHamming)
    val ca = banded.select(col("id.f").as("f"), col("sig").as("sig_a"),
      col("band"), col("bits"))
    val cb = banded.select(col("id.f").as("f"), col("sig").as("sig_b"),
      col("band"), col("bits"))
    // canonical unordered class pairs INCLUDING the diagonal (equal
    // hashes on different videos are matches too)
    val classPairs = ca.join(cb, Seq("f", "band", "bits"))
      .filter(col("sig_a") <= col("sig_b"))
      .filter(expr("bit_count(sig_a ^ sig_b)") <= maxHamming)
      .select(col("f"), col("sig_a"), col("sig_b"))
      .distinct() // multi-band matches collapse to one per class pair
    // a video has ONE hash per frame, so each (vid pair, f) arises
    // from exactly one class pair — splitting the diagonal (equal
    // hashes: both orientations come out of the expansion, keep
    // va < vb) from the off-diagonal (one orientation, canonicalize
    // with least/greatest) emits every match EXACTLY ONCE, with no
    // distinct over the expanded mass (which is quadratic in the
    // identical-hash cliques — the expensive shuffle at 10x)
    val expand = (cp: DataFrame) => cp
      .join(s.toDF("va", "f", "sig_a"), Seq("f", "sig_a"))
      .join(s.toDF("vb", "f", "sig_b"), Seq("f", "sig_b"))
    val diag = expand(classPairs.filter(col("sig_a") === col("sig_b")))
      .filter(col("va") < col("vb"))
      .select(col("va").as("vid_a"), col("vb").as("vid_b"), col("f"))
    val off = expand(classPairs.filter(col("sig_a") =!= col("sig_b")))
      .select(least(col("va"), col("vb")).as("vid_a"),
        greatest(col("va"), col("vb")).as("vid_b"), col("f"))
    val frameMatches = diag.unionByName(off)
    val nf = s.groupBy(col("vid")).agg(count(lit(1)).as("nf"))
    frameMatches.groupBy(col("vid_a"), col("vid_b"))
      .agg(count(lit(1)).as("n_matched"))
      .join(nf.toDF("vid_a", "nf_a"), "vid_a")
      .join(nf.toDF("vid_b", "nf_b"), "vid_b")
      .filter(col("n_matched") * 2 > least(col("nf_a"), col("nf_b")))
      .select(col("vid_a").as("id_a"), col("vid_b").as("id_b"), col("n_matched"))
  }

  /** INCREMENTAL aligned near-dup pairs — every quorum pair TOUCHING a
    * new upload (new-vs-base and new-vs-new), WITHOUT re-pairing
    * base-vs-base: the contract is
    * `videoNearDupPairs(new ∪ base) == videoNearDupPairs(base) ∪
    * videoNearDupPairsDelta(new, base)` (disjoint by construction —
    * the new side of the banded probe only ever expands to new
    * members), pinned by an A/B spec. This is the 100 TB arrival
    * pattern: the corpus pair table is built ONCE and persisted
    * (the videoPairMemo/cc_pairs billing split); each ingest batch
    * pays only its own delta — probing new (frame, hash) classes
    * against the full class index — never the corpus² rebuild.
    *
    * Same class-quotient machinery as [[videoNearDupPairs]]; the
    * ordered new-side/all-side probe double-emits only new-new
    * matches and diagonal mirrors, collapsed by a distinct over the
    * DELTA match mass (bounded by the arrival batch, not the corpus —
    * the full-join variant cannot afford that distinct, the delta
    * can).
    */
  def videoNearDupPairsDelta(newSigs: DataFrame, baseSigs: DataFrame,
      maxHamming: Int = 2): DataFrame = {
    val sn = newSigs.toDF("vid", "f", "sig")
    val sAll = sn.unionByName(baseSigs.toDF("vid", "f", "sig"))
    // ONE class table carrying an is_new flag (max over the union —
    // the same one-aggregation shuffle the old classesAll distinct
    // paid) and ONE banding pass over it: the new side of the probe is
    // the flagged subset of the same banded rows, bit-identical to
    // banding a separate classesNew table (hammingBands is row-local
    // and deterministic), at one cut + one band explosion less per
    // execution.
    // deliberately NOT cut: the class aggregate's exchange is the
    // shared subtree under both sides of the banded self-join, so
    // ReuseExchange materializes it once — a cut here only added a
    // sequential job (the lshPairQuality lesson, r17 opt round)
    val classesAll =
      sn.select(col("f"), col("sig"), lit(true).as("is_new"))
        .unionByName(sAll.select(col("f"), col("sig"), lit(false).as("is_new")))
        .groupBy(col("f"), col("sig"))
        .agg(max(col("is_new")).as("is_new"))
    val bandedAll = graft.text.TextOps.hammingBands(
        classesAll.select(
          struct(col("f"), col("is_new")).as("id"), col("sig")),
        sigBits = 64, maxHamming = maxHamming)
      .select(col("id.f").as("f"), col("id.is_new").as("is_new"),
        col("sig"), col("band"), col("bits"))
    // ordered class pairs: new-side class vs ANY class (the all-side
    // is the persisted banded index at a real deployment)
    val classPairs = bandedAll.filter(col("is_new"))
      .select(col("f"), col("sig").as("sig_n"), col("band"), col("bits"))
      .join(bandedAll.select(col("f"), col("sig").as("sig_o"),
        col("band"), col("bits")), Seq("f", "band", "bits"))
      .filter(expr("bit_count(sig_n ^ sig_o)") <= maxHamming)
      .select(col("f"), col("sig_n"), col("sig_o"))
      .distinct() // multi-band matches collapse per ordered class pair
    val frameMatches = classPairs
      .join(sn.toDF("va", "f", "sig_n"), Seq("f", "sig_n"))
      .join(sAll.toDF("vb", "f", "sig_o"), Seq("f", "sig_o"))
      .filter(col("va") =!= col("vb"))
      .select(least(col("va"), col("vb")).as("vid_a"),
        greatest(col("va"), col("vb")).as("vid_b"), col("f"))
      .distinct() // new-new mirrors + diagonal both-orientations
    val nf = sAll.groupBy(col("vid")).agg(count(lit(1)).as("nf"))
    frameMatches.groupBy(col("vid_a"), col("vid_b"))
      .agg(count(lit(1)).as("n_matched"))
      .join(nf.toDF("vid_a", "nf_a"), "vid_a")
      .join(nf.toDF("vid_b", "nf_b"), "vid_b")
      .filter(col("n_matched") * 2 > least(col("nf_a"), col("nf_b")))
      .select(col("vid_a").as("id_a"), col("vid_b").as("id_b"),
        col("n_matched"))
  }

  /** SHIFT-TOLERANT video near-duplicate pairs via FRAME-HASH
    * SHINGLES — the temporal complement of [[videoNearDupPairs]]:
    * aligned matching misses a duplicate whose timeline is TRIMMED or
    * SHIFTED (the frame at index j is the original's j+1), the
    * classic head-cut re-upload. Shingling the frame-hash SEQUENCE
    * (grams of `k` consecutive hashes, position-free — w-shingling
    * over frames instead of words, Broder 1997's resemblance
    * machinery applied to the hash stream) makes any duplicate that
    * shares `k` consecutive frames pair regardless of offset.
    *
    * Exact-equality grams (near-dup tolerance belongs to the aligned
    * face; a shifted re-encode hits BOTH faces' fixtures separately):
    * per video the distinct gram SET, pairs by gram equi-join,
    * `n_shared` = the exact intersection size. Gram sets are
    * video-length-bound; the join scales with gram-bucket occupancy
    * (identical-content cliques — the same mass the quotient faces
    * collapse), never videos².
    *
    * `frameSigs` is (doc_id, frame_idx, fp). Returns
    * (id_a, id_b, n_shared) for pairs sharing >= 1 shingle.
    */
  def sequenceShinglePairs(frameSigs: DataFrame, k: Int = 2): DataFrame = {
    val gset = shingleGramSets(frameSigs, k)
    gset.toDF("vid_a", "g")
      .join(gset.toDF("vid_b", "g"), Seq("g"))
      .filter(col("vid_a") < col("vid_b"))
      .groupBy(col("vid_a"), col("vid_b"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col("vid_a").as("id_a"), col("vid_b").as("id_b"),
        col("n_shared"))
  }

  /** [[sequenceShinglePairs]] under the STRICT-MAJORITY quorum the
    * aligned face uses (`2·n_matched > min(nf)` there;
    * `2·n_shared > min(ng)` here, ng = each video's distinct gram
    * count): pairs whose shared-shingle mass covers a majority of the
    * shorter gram set. This is the edge predicate the UNIFIED dedup
    * endpoints feed to connected components — a head-cut re-upload
    * shares its ENTIRE gram set with its base (every twin gram is a
    * base gram by construction), so it always passes; an incidental
    * single-gram collision between two long unrelated videos never
    * does. Returns (id_a, id_b, n_shared).
    */
  def sequenceShingleQuorumPairs(frameSigs: DataFrame, k: Int = 2): DataFrame = {
    // deliberately NOT cut: the gram-set distinct's exchange is the
    // shared subtree under all three consumers (both self-join sides
    // and the per-video counts), so ReuseExchange materializes the
    // k-step gram build once — a cut here only added a sequential job
    // (the lshPairQuality lesson, r17 opt round)
    val gset = shingleGramSets(frameSigs, k)
    val ng = gset.groupBy(col("vid")).agg(count(lit(1)).as("ng"))
    gset.toDF("vid_a", "g")
      .join(gset.toDF("vid_b", "g"), Seq("g"))
      .filter(col("vid_a") < col("vid_b"))
      .groupBy(col("vid_a"), col("vid_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(ng.toDF("vid_a", "ng_a"), "vid_a")
      .join(ng.toDF("vid_b", "ng_b"), "vid_b")
      .filter(col("n_shared") * 2 > least(col("ng_a"), col("ng_b")))
      .select(col("vid_a").as("id_a"), col("vid_b").as("id_b"),
        col("n_shared"))
  }

  /** The STORED gram index for the streaming shingle probe
    * ([[graft.streaming.StreamOps.streamingShingleProbe]]): one row
    * per (vid, distinct gram) over the corpus — the static side of
    * the probe's stream-static equi-join. Same gram definition as the
    * batch shingle faces (one build, the stream can never shingle
    * differently).
    */
  def sequenceGramIndex(frameSigs: DataFrame, k: Int = 2): DataFrame =
    shingleGramSets(frameSigs, k)

  /** Per-video DISTINCT gram set (vid, g): the shared build behind
    * both shingle-pair faces. Window-free; see the join-key note
    * inside.
    */
  private def shingleGramSets(frameSigs: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"shingle length must be >= 2, got $k")
    val s = frameSigs.toDF("vid", "f", "sig")
    // grams via k-1 equi-joins on consecutive frame indices (window-
    // free: no per-video sort state ever materializes). The offset is
    // MATERIALIZED as a column and joined on (vid, fn) — STRUCTURAL
    // equi-keys, not a (vid)-keyed join with an arithmetic filter that
    // relies on ExtractEquiJoinKeys lifting `fn === f + step` into the
    // key set: if a future Catalyst stopped extracting it, that shape
    // silently degrades to per-video frames² — invisible on short
    // fixtures, fatal on hour-long videos.
    var grams = s.select(col("vid"), col("f"), array(col("sig")).as("g"))
    for (step <- 1 until k) {
      grams = grams
        .withColumn("fn", col("f") + step)
        .join(s.toDF("vid", "fn", "sn"), Seq("vid", "fn"))
        .select(col("vid"), col("f"),
          concat(col("g"), array(col("sn"))).as("g"))
    }
    grams.select(col("vid"), col("g")).distinct() // gram SET
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
