package graft.core

import graft.operators.Multimodal

/** Static-forwarder targets for the media SQL functions (StaticInvoke,
  * same pattern as [[GeomOps]]). All decode paths are the REAL
  * `javax.imageio` codec in [[graft.operators.Multimodal]]; nothing here
  * is stubbed. */
object MediaOps {

  /** Real decode (javax.imageio) → struct(width, height, channels, pixels).
    * SQL: `graft_media_decode(payload)` / `mm_decode(payload)`. */
  def mediaDecode(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val img = Multimodal.decodeImage(b)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](img.width, img.height, img.channels, img.pixels))
  }

  /** Header-only metadata (no pixel decode) → struct(width, height, format).
    * SQL: `graft_media_meta(payload)`. */
  def mediaMeta(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val (w, h, f) = Multimodal.imageMeta(b)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](w, h, org.apache.spark.unsafe.types.UTF8String.fromString(f)))
  }

  /** Deterministic synthetic-corpus PNG (real JDK encoder, closed-form
    * raster — see [[Multimodal.encodePngGray]]). SQL: `graft_media_png(seed)`. */
  def mediaPngGray(seed: Long): Array[Byte] = Multimodal.encodePngGray(seed)

  /** Re-encode a decoded image in another container via the real codec —
    * see [[Multimodal.transcode]]. SQL: `graft_media_transcode(bin, fmt)`. */
  def mediaTranscode(b: Array[Byte], fmt: org.apache.spark.unsafe.types.UTF8String): Array[Byte] =
    Multimodal.transcode(b, fmt.toString)

  /** Deterministic synthetic-corpus WAV (real JDK WAVE writer, closed-form
    * PCM16 signal — see [[Multimodal.encodeWavPcm16]]).
    * SQL: `graft_audio_wav(seed)`. */
  def audioWav(seed: Long): Array[Byte] = Multimodal.encodeWavPcm16(seed)

  /** Container-header audio metadata (no sample decode) →
    * struct(rate, channels, bits, frames). SQL: `graft_audio_meta(payload)`. */
  def audioMeta(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val (rate, ch, bits, frames) = Multimodal.audioMeta(b)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](rate, ch, bits, frames))
  }

  /** Real decode (javax.sound.sampled) → exact integer signal stats
    * struct(n_samples, peak_abs, sum_abs, sum_sq).
    * SQL: `graft_audio_stats(payload)`. */
  def audioStats(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val (n, peak, sumAbs, sumSq) = Multimodal.audioStats(b)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, peak, sumAbs, sumSq))
  }

  /** Null-safe header probe: like [[mediaMeta]] but a payload the codec
    * rejects yields NULL instead of failing the task — the quarantine
    * path a 100 TB scan needs (one corrupt blob must not kill the job;
    * rows with NULL meta route to a quarantine sink for inspection).
    * SQL: `graft_media_meta_safe(payload)`. */
  def mediaMetaSafe(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow =
    try mediaMeta(b)
    catch { case _: Exception => null }

  /** Real decode → fixed-length sample windows with exact integer stats:
    * array of struct(win_idx, n_samples, peak_abs, sum_abs, sum_sq).
    * SQL: `graft_audio_windows(payload, win)`. */
  def audioWindows(b: Array[Byte], win: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val rows: Array[AnyRef] = Multimodal.audioWindows(b, win).map {
      case (idx, n, peak, sumAbs, sumSq) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](idx, n, peak, sumAbs, sumSq)): AnyRef
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  /** Real decode → exact channel-0 pixel stats (n, sum, sum_sq) — the
    * corpus normalization-constant accumulators. SQL:
    * `graft_media_pixstats(payload)`. */
  def mediaPixStats(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val img = graft.operators.Multimodal.decodeImage(b)
    var i = 0
    var n = 0L
    var s = 0L
    var sq = 0L
    while (i < img.width * img.height) {
      val v = (img.pixels(i * img.channels) & 0xFF).toLong
      n += 1; s += v; sq += v * v
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](n, s, sq))
  }

  /** Real decode → box-average mip pyramid: array of struct(level, w,
    * h, checksum). SQL: `graft_media_pyramid(payload, maxLevels)`. */
  def mediaPyramid(b: Array[Byte], maxLevels: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val rows: Array[AnyRef] = Multimodal.pyramidChecksums(b, maxLevels).map {
      case (lvl, w, h, cs) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](lvl, w, h, cs)): AnyRef
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  /** Real decode → integer-factor decimation (block floor-average) →
    * real re-encode at rate/factor. SQL: `graft_audio_resample(payload,
    * factor)`. */
  def audioResample(b: Array[Byte], factor: Int): Array[Byte] =
    Multimodal.audioResample(b, factor)

  /** Real decode → position-weighted checksum of an augmented raster
    * (0 = identity, 1 = hflip, 2 = rot90cw).
    * SQL: `graft_media_aug(payload, mode)`. */
  def mediaAugChecksum(b: Array[Byte], mode: Int): Long =
    Multimodal.augChecksum(b, mode)

  /** Real decode → row-major patch-grid channel-0 sums (ViT
    * patchification). SQL: `graft_media_patches(payload, pw, ph)`. */
  def mediaPatchSums(b: Array[Byte], pw: Int, ph: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Multimodal.patchSums(b, pw, ph))

  /** 64-bit perceptual average-hash as a '0'/'1' string (real decode →
    * gray → 8×8 resize → mean threshold — see [[Multimodal.phash64]]).
    * SQL: `graft_media_phash(payload)`. */
  def mediaPhash(b: Array[Byte]): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(Multimodal.phash64(b))

  /** Byte length of frame `i` of an `n`-frame sample. */
  def mediaFrameLen(b: Array[Byte], n: Int, i: Int): Int =
    Multimodal.frameSample(b, n)(i).length

  /** Bytes of frame `i` of an `n`-frame sample (a standalone JPEG). */
  def mediaFrame(b: Array[Byte], n: Int, i: Int): Array[Byte] =
    Multimodal.frameSample(b, n)(i)

  /** Total video frame chunks in an AVI container (container parse only,
    * no pixel decode). SQL: `MM_FrameCount(payload)`. */
  def mediaFrameCount(b: Array[Byte]): Int = Multimodal.aviFrames(b).length

  /** All `n` sampled frames in ONE container parse — the batch form of
    * [[mediaFrame]]: explode the returned array instead of calling
    * per-frame functions row-by-row (each of which re-walks the
    * container). SQL: `MM_FrameSample(payload, n)` → `array<binary>`. */
  def mediaFrameSample(b: Array[Byte], n: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Multimodal.frameSample(b, n).toArray[Any])

  /** Deterministic MJPEG-in-AVI fixture clip for `seed` — real RIFF
    * container wrapping real JDK-encoded JPEG frames.
    * SQL: `graft_video_avi(seed)`. */
  def videoAvi(seed: Long): Array[Byte] = Multimodal.encodeAviMjpeg(seed)

  /** Header-only video metadata (avih parse, no frame decode) — the video
    * face of `mediaMeta`/`audioMeta`. SQL: `graft_video_meta(payload)`. */
  def videoMeta(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val (w, h, frames, usec) = Multimodal.aviMeta(b)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](w, h, frames, usec))
  }
}
