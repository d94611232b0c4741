package graft.core

import graft.operators.Multimodal

/** Static-forwarder targets for the media SQL functions (StaticInvoke,
  * same pattern as [[GeomOps]]). The `mm_width`/`mm_height`/`mm_pixelsum`
  * accessors use the documented stub in [[graft.operators.Multimodal]]
  * (closed form, mirrorable by the DuckDB oracle); [[mediaDecode]] is the
  * REAL `javax.imageio` decoder exposed to SQL. */
object MediaOps {

  def mediaWidth(b: Array[Byte]): Int = Multimodal.decodeImageStub(b).width
  def mediaHeight(b: Array[Byte]): Int = Multimodal.decodeImageStub(b).height

  /** Real decode (javax.imageio) → struct(width, height, channels, pixels).
    * SQL: `graft_media_decode(payload)` / `mm_decode(payload)`. */
  def mediaDecode(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val img = Multimodal.decodeImage(b)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](img.width, img.height, img.channels, img.pixels))
  }

  /** Sum of decoded pixel bytes (payload cycled to width*height — see stub). */
  def mediaPixelSum(b: Array[Byte]): Long = {
    val img = Multimodal.decodeImageStub(b)
    var s = 0L
    var i = 0
    while (i < img.pixels.length) { s += img.pixels(i) & 0xFF; i += 1 }
    s
  }

  /** Byte length of frame `i` of an `n`-frame sample. */
  def mediaFrameLen(b: Array[Byte], n: Int, i: Int): Int =
    Multimodal.frameSample(b, n)(i).length

  /** Bytes of frame `i` of an `n`-frame sample. */
  def mediaFrame(b: Array[Byte], n: Int, i: Int): Array[Byte] =
    Multimodal.frameSample(b, n)(i)
}
