package graft.core

import graft.operators.Multimodal

/** Static-forwarder targets for the media SQL functions (StaticInvoke,
  * same pattern as [[GeomOps]]). Decode is the documented stub in
  * [[graft.operators.Multimodal]]; these accessors exist so media metadata
  * participates in oracle-checked SQL. */
object MediaOps {

  def mediaWidth(b: Array[Byte]): Int = Multimodal.decodeImageStub(b).width
  def mediaHeight(b: Array[Byte]): Int = Multimodal.decodeImageStub(b).height

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
}
