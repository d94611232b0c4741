package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.DecodedImage

class MultimodalSpec extends SparkTestBase {

  test("decode stub is deterministic and payload-derived") {
    val p = Array.tabulate[Byte](16)(i => (i * 17).toByte)
    val img = Multimodal.decodeImageStub(p)
    assert(img.width == 1 + (p(0) & 0xFF) % 16)
    assert(img.height == 1 + (p(1) & 0xFF) % 16)
    assert(img.pixels.length == img.width * img.height)
    assert(img.pixels(0) == p(0) && img.pixels(img.pixels.length - 1) ==
      p((img.pixels.length - 1) % 16))
  }

  test("nearest-neighbor resize: identity, downscale, upscale") {
    val img = DecodedImage(4, 4, 1, Array.tabulate[Byte](16)(_.toByte))
    assert(Multimodal.resizeNN(img, 4, 4).pixels.toSeq == img.pixels.toSeq)
    val down = Multimodal.resizeNN(img, 2, 2)
    assert(down.pixels.toSeq == Seq[Byte](0, 2, 8, 10)) // picks (0,0),(2,0),(0,2),(2,2)
    val up = Multimodal.resizeNN(img, 8, 8)
    assert(up.width == 8 && up.height == 8 && up.pixels.length == 64)
    assert(up.pixels(0) == 0 && up.pixels(63) == 15)
  }

  test("histogram buckets byte values") {
    val h = Multimodal.histogram(Array[Byte](0, 1, 32, -1), 8) // -1 = 255
    assert(h.toSeq == Seq(2L, 1L, 0L, 0L, 0L, 0L, 0L, 1L))
    assert(h.sum == 4)
  }

  test("frame sampling covers the payload exactly") {
    val p = Array.tabulate[Byte](100)(_.toByte)
    val frames = Multimodal.frameSample(p, 4)
    assert(frames.length == 4)
    assert(frames.map(_.length).sum == 100)
    assert(frames.flatMap(_.toSeq) == p.toSeq)
    // n > payload size still yields n frames, some empty
    assert(Multimodal.frameSample(Array[Byte](1, 2), 5).length == 5)
  }

  test("imageFeatures pipeline: schema, null payload, value spot-check") {
    val df = spark.sql(
      "SELECT id, CASE WHEN id = 3 THEN CAST(NULL AS BINARY) ELSE unhex(md5(CAST(id AS STRING))) END AS payload FROM range(5)")
    val out = Multimodal.imageFeatures(df, "payload", targetW = 2, targetH = 2, bins = 4)
    assert(out.schema.fieldNames.toSeq == Seq("id", "payload", "features"))
    val rows = out.collect()
    assert(rows.length == 5)
    val nullRow = rows.find(_.getLong(0) == 3L).get
    assert(nullRow.isNullAt(2))
    val r0 = rows.find(_.getLong(0) == 0L).get.getStruct(2)
    val img = Multimodal.decodeImageStub(rows.find(_.getLong(0) == 0L).get.getAs[Array[Byte]](1))
    assert(r0.getInt(0) == img.width && r0.getInt(1) == img.height)
    assert(r0.getLong(2) == img.pixels.foldLeft(0L)((a, b) => a + (b & 0xFF)))
    assert(r0.getSeq[Long](4).sum == img.pixels.length) // histogram mass = npixels
  }
}
