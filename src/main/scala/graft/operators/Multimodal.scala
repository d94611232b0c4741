package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRow
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines at 100 TB scale.
  *
  * Media travels as an opaque `binary` payload column plus a typed metadata
  * struct; decode / resize / feature-extract run per-partition so the codec
  * init amortizes across a batch (the same batch shape a vectorized
  * arrow-batch UDF would see).
  *
  * Decode is REAL: [[decodeImage]] runs `javax.imageio` (PNG/JPEG/BMP/GIF
  * ship in the JDK), and [[imageMeta]] reads width/height/format from the
  * container header without touching pixel data. [[encodePngGray]] generates
  * the deterministic synthetic PNG corpus the correctness oracles pin by
  * closed-form raster arithmetic. Video is real too: [[aviFrames]] parses
  * the RIFF/AVI container and [[frameSample]] returns evenly spaced MJPEG
  * frames, each a standalone JPEG decoded by the same `javax.imageio`
  * codec ([[encodeAviMjpeg]] builds the deterministic fixture clips).
  */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache: every encode/decode of
  // an in-memory payload would write a temp file. Rather than flipping the
  // process-global `ImageIO.setUseCache(false)` (which would silently
  // change behavior for every other ImageIO user in an embedding JVM),
  // each call site below constructs a Memory(Cache)Image{Input,Output}
  // Stream explicitly — memory-backed is strictly better for byte-array
  // payloads, and the only scalable choice on executors hammering the
  // codec per row, without mutating global state.

  /** Decoded raster: interleaved byte pixels, `channels` per sample. */
  case class DecodedImage(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  // ── decode (REAL: javax.imageio — PNG/JPEG/BMP/GIF ship in the JDK) ───

  /** Real image decoder via `javax.imageio` (no external dependency):
    * PNG/JPEG/BMP/GIF payloads become an interleaved byte raster — 1
    * channel for grayscale, 3 for RGB, 4 for RGBA. Feeds the same
    * resize/histogram plumbing as the stub; an undecodable payload fails
    * loudly rather than pretending.
    *
    * Channel semantics (each deliberate, each spec-tested):
    *  - 8-bit grayscale: RAW raster samples via `Raster.getSample` —
    *    `getRGB` would gamma-convert gray→sRGB (raw 16 becomes 71) and
    *    silently diverge from every other image library's pixel values.
    *  - 16-bit grayscale: widened to 8 bits by taking the high byte
    *    (`sample >> 8`, the conventional 16→8 narrowing), not refused —
    *    a training pipeline wants the features, not an exception.
    *  - sub-8-bit grayscale (1/2/4-bit): samples rescaled to full range
    *    (`s * 255 / (2^bits - 1)`), matching how viewers expand them.
    *  - gray+alpha (PNG color type 4, 2 components): RAW raster samples on
    *    both bands (band 0 gray with the same bit-depth widening, band 1
    *    alpha) → a 2-channel raster. `getRGB` here would reintroduce the
    *    gray→sRGB gamma conversion the raw path exists to avoid.
    *  - palette (indexed) PNG/GIF/BMP: expanded through the color table to
    *    RGB/RGBA via `getRGB` — exact, since palette entries are 8-bit.
    *  - 8-bit RGB/RGBA: `getRGB`, which is exact for these types. */
  def decodeImage(payload: Array[Byte]): DecodedImage = {
    require(payload != null && payload.nonEmpty, "empty media payload")
    // ImageIO.read(ImageInputStream) closes the stream itself after reading
    val img = javax.imageio.ImageIO.read(
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload)))
    require(img != null, "undecodable media payload: no registered image codec matched " +
      s"(${payload.length} bytes, header ${payload.take(4).map(b => f"${b & 0xFF}%02x").mkString})")
    val w = img.getWidth
    val h = img.getHeight
    val cm = img.getColorModel
    // IndexColorModel reports the palette's component count; route palette
    // images through the getRGB expansion path even when the palette is gray.
    // Gray (1 component) and gray+alpha (2) both take the raw-sample path:
    // getRGB would gamma-convert the gray band on either.
    val rawGrayBands =
      if (cm.isInstanceOf[java.awt.image.IndexColorModel]) 0 else cm.getNumComponents match {
        case 1 | 2 => cm.getNumComponents
        case _ => 0
      }
    val channels = if (rawGrayBands > 0) rawGrayBands else if (cm.hasAlpha) 4 else 3
    val out = new Array[Byte](w * h * channels)
    if (rawGrayBands > 0) {
      val raster = img.getRaster
      val sm = raster.getSampleModel
      val bits = Array.tabulate(rawGrayBands)(sm.getSampleSize)
      bits.foreach(b => require(b <= 16, s"unsupported grayscale sample depth: $b bits"))
      var y = 0
      var i = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < rawGrayBands) {
            val s = raster.getSample(x, y, b)
            val d = bits(b)
            val v =
              if (d == 8) s
              else if (d == 16) s >> 8
              else s * 255 / ((1 << d) - 1)
            out(i) = v.toByte
            i += 1
            b += 1
          }
          x += 1
        }
        y += 1
      }
    } else {
      var y = 0
      var i = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val argb = img.getRGB(x, y)
          out(i) = ((argb >> 16) & 0xFF).toByte
          out(i + 1) = ((argb >> 8) & 0xFF).toByte
          out(i + 2) = (argb & 0xFF).toByte
          if (channels == 4) { out(i + 3) = ((argb >>> 24) & 0xFF).toByte; i += 4 }
          else i += 3
          x += 1
        }
        y += 1
      }
    }
    DecodedImage(w, h, channels, out)
  }

  /** Header-only metadata probe: width/height/format from the container
    * header via ImageIO's reader WITHOUT decoding pixel data — the scalable
    * metadata op for a 100 TB corpus (reads O(header) bytes per row, not
    * O(pixels); the PNG reader answers from the 13-byte IHDR). */
  def imageMeta(payload: Array[Byte]): (Int, Int, String) = {
    require(payload != null && payload.nonEmpty, "empty media payload")
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, "undecodable media payload: no registered image codec matched " +
        s"(${payload.length} bytes, header ${payload.take(4).map(b => f"${b & 0xFF}%02x").mkString})")
      val r = readers.next()
      try {
        r.setInput(iis)
        (r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase(java.util.Locale.ROOT))
      } finally r.dispose()
    } finally iis.close()
  }

  // ── deterministic synthetic corpus (REAL PNGs, closed-form rasters) ───

  /** A real 8-bit grayscale PNG (JDK ImageIO encoder) whose raster is the
    * closed form `w = 1 + seed % 16`, `h = 1 + (seed / 16) % 16`,
    * `pixel(i) = (seed * 31 + i * 7) % 256` — so a SQL oracle can pin the
    * decoded features by plain arithmetic while the payload itself round-
    * trips the full real codec (encode → PNG chunks → inflate → decode).
    * Encoding is per-row and executor-side (a StaticInvoke kernel), so the
    * corpus generation itself scales out. */
  def encodePngGray(seed: Long): Array[Byte] = {
    require(seed >= 0, "need a non-negative corpus seed")
    val w = 1 + (seed % 16).toInt
    val h = 1 + ((seed / 16) % 16).toInt
    val px = new Array[Byte](w * h)
    var i = 0
    while (i < px.length) { px(i) = ((seed * 31 + i * 7) % 256).toByte; i += 1 }
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, px)
    val out = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try javax.imageio.ImageIO.write(img, "png", ios) finally ios.close()
    out.toByteArray
  }

  /** Transcode through the REAL codec: decode `payload` (any ImageIO
    * format), rebuild the raster, re-encode as `format` ("bmp", "png",
    * "gif", …). Both sides lossless for the formats used in-engine, so
    * decode(transcode(x)) is pixel-identical to decode(x) — the m07
    * roundtrip gate. Container note the oracle relies on: the JDK BMP
    * writer emits an 8-bit palette BMP for grayscale rasters, so the file
    * is exactly 1078 + h·ceil(w/4)·4 bytes (14+40 header, 1024 palette,
    * 4-aligned rows). Memory-backed streams per call site (no global
    * ImageIO cache mutation). */
  def transcode(payload: Array[Byte], format: String): Array[Byte] = {
    val img = decodeImage(payload)
    val kind =
      if (img.channels == 1) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
    val bi = new java.awt.image.BufferedImage(img.width, img.height, kind)
    bi.getRaster.setDataElements(0, 0, img.width, img.height, img.pixels)
    val out = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try {
      if (!javax.imageio.ImageIO.write(bi, format, ios))
        throw new IllegalArgumentException(s"no ImageIO writer for format '$format'")
    } finally ios.close()
    out.toByteArray
  }

  // ── real kernels over decoded buffers ─────────────────────────────────

  /** Nearest-neighbor resize on an interleaved byte raster. */
  def resizeNN(img: DecodedImage, outW: Int, outH: Int): DecodedImage = {
    val out = new Array[Byte](outW * outH * img.channels)
    var y = 0
    while (y < outH) {
      val sy = y * img.height / outH
      var x = 0
      while (x < outW) {
        val sx = x * img.width / outW
        var c = 0
        while (c < img.channels) {
          out((y * outW + x) * img.channels + c) =
            img.pixels((sy * img.width + sx) * img.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    DecodedImage(outW, outH, img.channels, out)
  }

  /** Byte-value histogram (256/bins-wide buckets) — the feature-extraction
    * stand-in; real pipelines would put an embedding model here. */
  def histogram(pixels: Array[Byte], bins: Int): Array[Long] = {
    val out = new Array[Long](bins)
    val width = 256 / bins
    var i = 0
    while (i < pixels.length) { out((pixels(i) & 0xFF) / width) += 1; i += 1 }
    out
  }

  /** 64-bit perceptual average-hash (aHash) of an encoded image, returned
    * as a 64-char '0'/'1' string (row-major, bit i = pixel y=i/8, x=i%8).
    * The classic near-dup image fingerprint: decode (REAL codec) →
    * grayscale → nearest-neighbor resize to 8×8 → threshold each cell
    * against the mean. Every step is integer-exact (the threshold is
    * `p*64 > Σp`, avoiding division), so a SQL oracle can regenerate the
    * hash arithmetically from a closed-form raster. Duplicate detection
    * is then an equi-join on the hash — key cardinality grows with the
    * corpus, never all-pairs; a hamming-tolerant variant would band the
    * 64 bits into sub-keys exactly like the minhash LSH bands. */
  def phash64(payload: Array[Byte]): String = {
    val img = decodeImage(payload)
    // collapse to one gray band: band 0 for gray / gray+alpha, integer
    // luma for RGB(A) — integer-exact either way
    val gray = new Array[Int](img.width * img.height)
    var i = 0
    while (i < gray.length) {
      val base = i * img.channels
      gray(i) =
        if (img.channels <= 2) img.pixels(base) & 0xFF
        else ((img.pixels(base) & 0xFF) * 299 + (img.pixels(base + 1) & 0xFF) * 587 +
              (img.pixels(base + 2) & 0xFF) * 114) / 1000
      i += 1
    }
    val cells = new Array[Int](64)
    var sum = 0L
    var y = 0
    while (y < 8) {
      val sy = y * img.height / 8
      var x = 0
      while (x < 8) {
        val sx = x * img.width / 8
        val v = gray(sy * img.width + sx)
        cells(y * 8 + x) = v
        sum += v
        x += 1
      }
      y += 1
    }
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i < 64) { sb.append(if (cells(i) * 64L > sum) '1' else '0'); i += 1 }
    sb.toString
  }

  // ── video (REAL container + codec: RIFF/AVI parse, javax.imageio JPEG) ─

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
          ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def le16(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def riffChunk(id: String, body: Array[Byte]): Array[Byte] =
    fourcc(id) ++ le32(body.length) ++ body ++
      (if ((body.length & 1) == 1) Array(0.toByte) else Array.empty[Byte])
  private def riffList(tpe: String, body: Array[Byte]): Array[Byte] =
    riffChunk("LIST", fourcc(tpe) ++ body)

  /** Single-frame JPEG encode of a uniform-gray raster through the JDK
    * codec. Uniform frames are DC-only JPEG blocks, which the spec proves
    * roundtrip BIT-EXACT for all 256 gray values — that exactness is what
    * lets the m04 oracle pin decoded video-frame pixel sums arithmetically
    * despite JPEG being lossy in general. */
  private[graft] def encodeJpegGray(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { r.setSample(x, y, 0, gray & 0xFF); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    val ok = javax.imageio.ImageIO.write(img, "jpg", ios)
    ios.close()
    require(ok, "no JPEG writer registered")
    bos.toByteArray
  }

  /** Deterministic MJPEG-in-AVI fixture: [[VideoFrames]] uniform-gray
    * 48×32 JPEG frames (frame f's gray = (seed·31 + f·41) mod 256) in a
    * structurally complete RIFF AVI — hdrl (avih + vids/MJPG strh/strf),
    * movi with one `00dc` chunk per frame, and a keyframe idx1. Real
    * container, real codec, closed-form pixels for the oracle. */
  val VideoFrames = 6
  val VideoW = 48
  val VideoH = 32
  def encodeAviMjpeg(seed: Long): Array[Byte] = {
    val frames = (0 until VideoFrames).map { f =>
      encodeJpegGray(VideoW, VideoH, java.lang.Math.floorMod(seed * 31 + f * 41, 256).toInt)
    }
    val maxFrame = frames.map(_.length).max
    val avih = le32(100000) ++ le32(0) ++ le32(0) ++ le32(0x10) ++ // usec/frame, maxBps, pad, HASINDEX
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(maxFrame) ++ // totalFrames, initial, streams, bufSize
      le32(VideoW) ++ le32(VideoH) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = fourcc("vids") ++ fourcc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) ++ le32(10) ++ le32(0) ++ le32(frames.length) ++ // init, scale, rate, start, length
      le32(maxFrame) ++ le32(-1) ++ le32(0) ++ // bufSize, quality, sampleSize
      le16(0) ++ le16(0) ++ le16(VideoW) ++ le16(VideoH) // rcFrame
    val strf = le32(40) ++ le32(VideoW) ++ le32(VideoH) ++ le16(1) ++ le16(24) ++
      fourcc("MJPG") ++ le32(VideoW * VideoH * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = riffList("hdrl",
      riffChunk("avih", avih) ++
        riffList("strl", riffChunk("strh", strh) ++ riffChunk("strf", strf)))
    val moviChunks = frames.map(fb => riffChunk("00dc", fb))
    val movi = riffList("movi", moviChunks.reduce(_ ++ _))
    // idx1 offsets are relative to the byte after the movi list's fourcc
    val offsets = moviChunks.scanLeft(4)(_ + _.length).init
    val idx1 = riffChunk("idx1",
      frames.indices.map { i =>
        fourcc("00dc") ++ le32(0x10) ++ le32(offsets(i)) ++ le32(frames(i).length)
      }.reduce(_ ++ _))
    val body = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  /** Parse a RIFF/AVI container and return the raw bytes of every video
    * frame chunk (`##dc`/`##db`) in stream order — the container half of
    * the real video path; each frame then decodes through the same
    * `javax.imageio` codec as still images. Recurses into LISTs (movi,
    * and `rec ` groupings inside it), honors RIFF even-byte padding, and
    * fails loudly on a non-AVI payload. */
  /** Recursion bound for RIFF LIST nesting — real AVI is ≤3 levels; a
    * crafted payload of nested 12-byte LIST headers could otherwise drive
    * ~len/12 stack frames into StackOverflowError instead of the typed
    * IllegalArgumentException the quarantine path expects. */
  private val MaxRiffDepth = 16

  def aviFrames(payload: Array[Byte]): IndexedSeq[Array[Byte]] = {
    require(payload != null && payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
      payload(8) == 'A' && payload(9) == 'V' && payload(10) == 'I' && payload(11) == ' ',
      "not a RIFF AVI payload")
    def u32(p: Int): Long =
      (payload(p) & 0xFFL) | ((payload(p + 1) & 0xFFL) << 8) |
        ((payload(p + 2) & 0xFFL) << 16) | ((payload(p + 3) & 0xFFL) << 24)
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def isFrameId(p: Int): Boolean = {
      val a = payload(p).toChar; val b = payload(p + 1).toChar
      val c = payload(p + 2).toChar; val d = payload(p + 3).toChar
      a.isDigit && b.isDigit && c == 'd' && (d == 'c' || d == 'b')
    }
    def walk(from: Int, to: Int, depth: Int): Unit = {
      // crafted deep LIST nesting must fail typed, not StackOverflowError —
      // real AVI nesting is ≤3 (RIFF > movi > rec )
      require(depth <= MaxRiffDepth, s"AVI LIST nesting exceeds $MaxRiffDepth")
      var p = from
      while (p + 8 <= to) {
        val sz = u32(p + 4)
        val body = p + 8
        val end = math.min(body + sz, to.toLong).toInt
        if (payload(p) == 'L' && payload(p + 1) == 'I' && payload(p + 2) == 'S' &&
            payload(p + 3) == 'T' && sz >= 4) {
          walk(body + 4, end, depth + 1)
        } else if (isFrameId(p)) {
          frames += java.util.Arrays.copyOfRange(payload, body, end)
        }
        p = end + (sz & 1).toInt
      }
    }
    walk(12, payload.length, 1)
    frames.toIndexedSeq
  }

  /** Header-only video metadata probe: the avih main header of a RIFF/AVI
    * container → (width, height, total frames, µs per frame) with NO frame
    * decode — the video face of the image/audio header probes
    * ([[imageMeta]]/`audioMeta`): at 100 TB a cataloging pass reads
    * kilobytes per clip, not the stream. Fails loudly when the hdrl/avih
    * structure is absent. */
  def aviMeta(payload: Array[Byte]): (Int, Int, Int, Int) = {
    require(payload != null && payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
      payload(8) == 'A' && payload(9) == 'V' && payload(10) == 'I' && payload(11) == ' ',
      "not a RIFF AVI payload")
    def u32(p: Int): Long =
      (payload(p) & 0xFFL) | ((payload(p + 1) & 0xFFL) << 8) |
        ((payload(p + 2) & 0xFFL) << 16) | ((payload(p + 3) & 0xFFL) << 24)
    def id(p: Int): String = new String(payload, p, 4, "US-ASCII")
    var found: (Int, Int, Int, Int) = null
    def walk(from: Int, to: Int, depth: Int): Unit = {
      require(depth <= MaxRiffDepth, s"AVI LIST nesting exceeds $MaxRiffDepth")
      var p = from
      while (found == null && p + 8 <= to) {
        val sz = u32(p + 4)
        val body = p + 8
        val end = math.min(body + sz, to.toLong).toInt
        id(p) match {
          case "LIST" if sz >= 4 => walk(body + 4, end, depth + 1)
          case "avih" if end - body >= 40 =>
            found = (u32(body + 32).toInt, u32(body + 36).toInt, // dwWidth, dwHeight
                     u32(body + 16).toInt, u32(body).toInt)      // dwTotalFrames, dwMicroSecPerFrame
          case _ =>
        }
        p = end + (sz & 1).toInt
      }
    }
    walk(12, payload.length, 1)
    require(found != null, "AVI payload has no avih main header")
    found
  }

  /** Sample `n` evenly spaced frames from an AVI video payload — REAL
    * container parse ([[aviFrames]]); frame i of n is source frame
    * floor(i·count/n), so the sample spans the clip. Each returned frame
    * is a standalone JPEG that decodes through [[decodeImage]]. */
  def frameSample(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
    require(n > 0, "need n > 0 frames")
    val fr = aviFrames(payload)
    require(fr.nonEmpty, "AVI payload contains no video frame chunks")
    (0 until n).map(i => fr((i.toLong * fr.length / n).toInt))
  }

  // ── DataFrame-level pipeline (the batch shape) ────────────────────────

  private val featureSchema = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("pixel_sum", LongType, nullable = false),
    StructField("resized_sum", LongType, nullable = false),
    StructField("hist", ArrayType(LongType, containsNull = false), nullable = false)))

  /** decode → resize(targetW×targetH) → histogram, appended as a `features`
    * struct column. Runs per-partition: codec init amortizes across the
    * partition exactly like an arrow-batch UDF; rows stream through without
    * materializing the partition. `decoder` defaults to the real
    * javax.imageio codec ([[decodeImage]]). */
  def imageFeatures(df: DataFrame, payloadCol: String,
                    targetW: Int = 4, targetH: Int = 4, bins: Int = 8,
                    decoder: Array[Byte] => DecodedImage = decodeImage): DataFrame = {
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val outSchema = StructType(df.schema.fields :+ StructField("features", featureSchema))
    df.mapPartitions { it =>
      // per-partition decoder context would init here
      it.map { row =>
        val payload = row.getAs[Array[Byte]](payloadIdx)
        val features: Row = if (payload == null || payload.isEmpty) null else {
          val img = decoder(payload)
          val resized = resizeNN(img, targetW, targetH)
          new GenericRow(Array[Any](
            img.width, img.height,
            img.pixels.foldLeft(0L)((a, b) => a + (b & 0xFF)),
            resized.pixels.foldLeft(0L)((a, b) => a + (b & 0xFF)),
            histogram(img.pixels, bins)))
        }
        new GenericRow((row.toSeq :+ features).toArray).asInstanceOf[Row]
      }
    }(Encoders.row(outSchema))
  }

  // ── audio (REAL: javax.sound.sampled — WAV/PCM ships in the JDK) ──────

  /** Deterministic synthetic-corpus WAV: `n` mono PCM16 samples at
    * `rate` Hz, sample(i) = ((seed·31 + i²) mod 2000) − 1000 — exact in
    * 64-bit integers, so a SQL oracle regenerates the signal and pins the
    * decoded stats arithmetically (the audio twin of [[encodePngGray]]).
    * Encoding runs the REAL `javax.sound.sampled` WAVE writer over a
    * memory stream, so [[audioStats]]' read path exercises the actual
    * RIFF container, not a hand-rolled one. */
  def encodeWavPcm16(seed: Long, n: Int = 256, rate: Int = 8000): Array[Byte] = {
    require(seed >= 0, "need a non-negative corpus seed")
    val pcm = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val s = ((seed * 31 + i.toLong * i) % 2000 - 1000).toShort
      pcm(2 * i) = (s & 0xFF).toByte          // little-endian PCM16
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    try javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    finally ais.close()
    out.toByteArray
  }

  /** Container-header metadata via the real parser — no sample decode
    * (the audio twin of [[imageMeta]]): (sampleRate, channels, bits,
    * frames). */
  def audioMeta(b: Array[Byte]): (Int, Int, Int, Long) = {
    val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(b))
    val f = aff.getFormat
    (f.getSampleRate.toInt, f.getChannels, f.getSampleSizeInBits, aff.getFrameLength.toLong)
  }

  /** Decode through `AudioSystem.getAudioInputStream` (the real codec
    * path) and fold PCM16LE mono samples to exact integer stats:
    * (nSamples, peakAbs, sumAbs, sumSq) — all BIGINT-exact so the oracle
    * pins them from the closed-form signal. */
  def audioStats(b: Array[Byte]): (Long, Int, Long, Long) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val f = ais.getFormat
      require(f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian,
        s"audioStats expects PCM16LE mono, got $f")
      val bytes = ais.readAllBytes()
      var i = 0
      var nSamples = 0L
      var peak = 0
      var sumAbs = 0L
      var sumSq = 0L
      while (i + 1 < bytes.length) {
        val s = ((bytes(i) & 0xFF) | (bytes(i + 1) << 8)).toShort.toInt
        val a = math.abs(s)
        nSamples += 1
        if (a > peak) peak = a
        sumAbs += a
        sumSq += s.toLong * s
        i += 2
      }
      (nSamples, peak, sumAbs, sumSq)
    } finally ais.close()
  }

  /** Decode through the real codec and build a box-average mip pyramid:
    * each level halves both dimensions, every output pixel the
    * floor-average of its complete 2×2 source block (odd trailing
    * rows/columns truncate — blocks are always complete). Returns per
    * level (level, w, h, position-weighted checksum Σ v·(1+x+1000·y) —
    * the m12 trick, so a transposed or shifted downsample changes the
    * value). Levels stop when a dimension would hit zero or at
    * `maxLevels`. Channel 0 only. The antialiased counterpart of the
    * nearest-neighbor [[resizeNN]]. */
  def pyramidChecksums(b: Array[Byte], maxLevels: Int): Array[(Int, Int, Int, Long)] = {
    require(maxLevels >= 1, s"maxLevels must be >= 1, got $maxLevels")
    val img = decodeImage(b)
    var w = img.width
    var h = img.height
    var cur = Array.tabulate(w * h)(i => (img.pixels(i * img.channels) & 0xFF))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Long)]
    var level = 1
    while (level <= maxLevels && w / 2 >= 1 && h / 2 >= 1) {
      val nw = w / 2
      val nh = h / 2
      val nxt = new Array[Int](nw * nh)
      var y = 0
      while (y < nh) {
        var x = 0
        while (x < nw) {
          val s = cur(2 * y * w + 2 * x) + cur(2 * y * w + 2 * x + 1) +
            cur((2 * y + 1) * w + 2 * x) + cur((2 * y + 1) * w + 2 * x + 1)
          nxt(y * nw + x) = Math.floorDiv(s, 4)
          x += 1
        }
        y += 1
      }
      var cs = 0L
      y = 0
      while (y < nh) {
        var x = 0
        while (x < nw) {
          cs += nxt(y * nw + x).toLong * (1L + x + 1000L * y)
          x += 1
        }
        y += 1
      }
      out += ((level, nw, nh, cs))
      cur = nxt; w = nw; h = nh; level += 1
    }
    out.toArray
  }

  /** Decode through the real codec, decimate PCM16LE mono by an integer
    * `factor` (each output sample = floor-average of its consecutive
    * input block; the trailing partial block is dropped), and RE-ENCODE
    * through the real WAVE writer at rate/factor — the sample-rate
    * conversion step of an audio training pipeline (16 kHz corpora fed
    * to 8 kHz models), kept integer-exact (Math.floorDiv) so a
    * closed-form signal oracle replays every output sample. Block
    * averaging is the correct brick-wall-free decimator for a synthetic
    * oracle; production would band-limit first. */
  def audioResample(b: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1, s"resample factor must be >= 1, got $factor")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(b))
    val (rate, pcm) =
      try {
        val f = ais.getFormat
        require(f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian,
          s"audioResample expects PCM16LE mono, got $f")
        val r = f.getSampleRate.toInt
        // fail loudly like the sibling kernels: a factor that doesn't
        // divide the rate would silently truncate it (8000/3 → 2666 Hz
        // container), and factor > rate would write a 0 Hz AudioFormat
        require(factor <= r && r % factor == 0,
          s"resample factor $factor must divide the sample rate $r exactly")
        (r, ais.readAllBytes())
      } finally ais.close()
    val nIn = pcm.length / 2
    val nOut = nIn / factor
    val out = new Array[Byte](2 * nOut)
    var j = 0
    while (j < nOut) {
      var sum = 0L
      var k = 0
      while (k < factor) {
        val i = j * factor + k
        sum += ((pcm(2 * i) & 0xFF) | (pcm(2 * i + 1) << 8)).toShort.toInt
        k += 1
      }
      val s = Math.floorDiv(sum, factor).toShort
      out(2 * j) = (s & 0xFF).toByte
      out(2 * j + 1) = ((s >> 8) & 0xFF).toByte
      j += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat((rate / factor).toFloat, 16, 1, true, false)
    val rais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(out), fmt, nOut.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    try javax.sound.sampled.AudioSystem.write(
      rais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    finally rais.close()
    bos.toByteArray
  }

  /** Decode through the real codec and tile the raster into a pw x ph
    * patch grid (edge patches truncated), summing channel-0 pixel values
    * per patch in row-major patch order — the patchification step in
    * front of ViT-style image training (each patch would feed an
    * embedding; the integer sums keep the oracle exact). */
  def patchSums(b: Array[Byte], pw: Int, ph: Int): Array[Long] = {
    require(pw > 0 && ph > 0, s"patch dims must be positive, got ${pw}x$ph")
    val img = decodeImage(b)
    val nx = (img.width + pw - 1) / pw
    val ny = (img.height + ph - 1) / ph
    val out = new Array[Long](nx * ny)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        out((y / ph) * nx + (x / pw)) +=
          (img.pixels((y * img.width + x) * img.channels) & 0xFF).toLong
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode through the real codec, apply a geometric augmentation, and
    * return a POSITION-WEIGHTED integer checksum Σ pixel(x,y)·(1 + x +
    * 1000·y) over the AUGMENTED raster — the weight makes the checksum
    * sensitive to where every pixel landed, so it proves the flip/rot
    * geometry, not just pixel conservation. Modes: 0 identity, 1
    * horizontal flip (x → w−1−x), 2 rotate 90° clockwise (pixel (x,y) →
    * (h−1−y, x), so the output is h wide and w tall). Channel 0 only. */
  def augChecksum(b: Array[Byte], mode: Int): Long = {
    val img = decodeImage(b)
    val (w, h) = (img.width, img.height)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (img.pixels((y * w + x) * img.channels) & 0xFF).toLong
        val (nx, ny) = mode match {
          case 0 => (x, y)
          case 1 => (w - 1 - x, y)
          case 2 => (h - 1 - y, x)
          case m => throw new IllegalArgumentException(s"unknown augmentation mode $m")
        }
        sum += v * (1L + nx + 1000L * ny)
        x += 1
      }
      y += 1
    }
    sum
  }

  /** Decode through the real codec and fold PCM16LE mono samples into
    * fixed-length windows of `win` samples (last window may be short):
    * per window (winIdx, nSamples, peakAbs, sumAbs, sumSq) — the
    * segmentation in front of VAD/silence-trimming/energy-gating, all
    * integer-exact so a closed-form signal oracle can pin every window. */
  def audioWindows(b: Array[Byte], win: Int): Array[(Int, Long, Int, Long, Long)] = {
    require(win > 0, s"window must be positive, got $win")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val f = ais.getFormat
      require(f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian,
        s"audioWindows expects PCM16LE mono, got $f")
      val bytes = ais.readAllBytes()
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Int, Long, Long)]
      var i = 0
      var idx = 0
      while (i + 1 < bytes.length) {
        var n = 0L
        var peak = 0
        var sumAbs = 0L
        var sumSq = 0L
        while (n < win && i + 1 < bytes.length) {
          val s = ((bytes(i) & 0xFF) | (bytes(i + 1) << 8)).toShort.toInt
          val a = math.abs(s)
          n += 1
          if (a > peak) peak = a
          sumAbs += a
          sumSq += s.toLong * s
          i += 2
        }
        out += ((idx, n, peak, sumAbs, sumSq))
        idx += 1
      }
      out.toArray
    } finally ais.close()
  }
}
