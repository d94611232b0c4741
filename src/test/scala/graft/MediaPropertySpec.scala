package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Generator-based coverage of the image-decoder matrix: random rasters of
  * every supported (color kind × bit depth) combination are encoded with the
  * JDK PNG writer and pushed through [[Multimodal.decodeImage]]; the decoded
  * buffer must equal the ORIGINAL samples under the documented channel
  * policy (16-bit → high byte, palette → table expansion, 1-bit → 0/255).
  * PNG is lossless, so any mismatch is a decoder-branch bug, not codec loss.
  * Interlaced (Adam7) encodings are exercised across the grayscale,
  * palette, RGB and RGBA kinds. */
class MediaPropertySpec extends AnyFunSuite {

  import java.awt.image.BufferedImage

  private def pngBytes(img: BufferedImage, interlaced: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (!interlaced) javax.imageio.ImageIO.write(img, "png", out)
    else {
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      val p = w.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      w.setOutput(ios)
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); w.dispose()
    }
    out.toByteArray
  }

  private val dim = Gen.chooseNum(1, 13)

  /** (png bytes, expected channels, expected interleaved samples 0..255) */
  private type Case = (Array[Byte], Int, Seq[Int])

  private val gray8: Gen[Case] =
    for (w <- dim; h <- dim; px <- Gen.listOfN(w * h, Gen.chooseNum(0, 255));
         il <- Gen.oneOf(false, true)) yield {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setPixels(0, 0, w, h, px.toArray)
      (pngBytes(img, il), 1, px)
    }

  private val gray16: Gen[Case] =
    for (w <- dim; h <- dim; px <- Gen.listOfN(w * h, Gen.chooseNum(0, 65535))) yield {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_USHORT_GRAY)
      img.getRaster.setPixels(0, 0, w, h, px.toArray)
      (pngBytes(img, interlaced = false), 1, px.map(_ >> 8))
    }

  private val binary1: Gen[Case] =
    for (w <- dim; h <- dim; px <- Gen.listOfN(w * h, Gen.chooseNum(0, 1))) yield {
      // TYPE_BYTE_BINARY carries a 2-entry gray IndexColorModel → the
      // palette expansion path; black/white expand to 0/255 triples.
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY)
      img.getRaster.setPixels(0, 0, w, h, px.toArray)
      (pngBytes(img, interlaced = false), 3, px.flatMap(s => Seq.fill(3)(s * 255)))
    }

  private val rgb: Gen[Case] =
    for (w <- dim; h <- dim; px <- Gen.listOfN(w * h, Gen.chooseNum(0, 0xFFFFFF));
         il <- Gen.oneOf(false, true)) yield {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, w, h, px.toArray, 0, w)
      (pngBytes(img, il), 3,
        px.flatMap(c => Seq((c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF)))
    }

  private val rgba: Gen[Case] =
    for (w <- dim; h <- dim; px <- Gen.listOfN(w * h, Gen.chooseNum(Int.MinValue, Int.MaxValue));
         il <- Gen.oneOf(false, true)) yield {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
      img.setRGB(0, 0, w, h, px.toArray, 0, w)
      (pngBytes(img, il), 4,
        px.flatMap(c => Seq((c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF, (c >>> 24) & 0xFF)))
    }

  private val palette: Gen[Case] =
    for (w <- dim; h <- dim; n <- Gen.chooseNum(2, 16);
         table <- Gen.listOfN(n, Gen.chooseNum(0, 0xFFFFFF));
         px <- Gen.listOfN(w * h, Gen.chooseNum(0, n - 1));
         il <- Gen.oneOf(false, true)) yield {
      val icm = new java.awt.image.IndexColorModel(8, n,
        table.map(c => ((c >> 16) & 0xFF).toByte).toArray,
        table.map(c => ((c >> 8) & 0xFF).toByte).toArray,
        table.map(c => (c & 0xFF).toByte).toArray)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
      img.getRaster.setPixels(0, 0, w, h, px.toArray)
      (pngBytes(img, il), 3,
        px.flatMap { i =>
          val c = table(i); Seq((c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF)
        })
    }

  private val grayAlpha: Gen[Case] =
    for (w <- dim; h <- dim;
         gs <- Gen.listOfN(w * h, Gen.chooseNum(0, 255));
         as <- Gen.listOfN(w * h, Gen.chooseNum(0, 255))) yield {
      val cs = java.awt.color.ColorSpace.getInstance(java.awt.color.ColorSpace.CS_GRAY)
      val cm = new java.awt.image.ComponentColorModel(cs, true, false,
        java.awt.Transparency.TRANSLUCENT, java.awt.image.DataBuffer.TYPE_BYTE)
      val raster = cm.createCompatibleWritableRaster(w, h)
      var i = 0
      while (i < w * h) {
        raster.setSample(i % w, i / w, 0, gs(i))
        raster.setSample(i % w, i / w, 1, as(i))
        i += 1
      }
      val img = new BufferedImage(cm, raster, false, null)
      (pngBytes(img, interlaced = false), 2,
        gs.zip(as).flatMap { case (g, a) => Seq(g, a) })
    }

  private val anyCase: Gen[Case] =
    Gen.oneOf(gray8, gray16, binary1, rgb, rgba, palette, grayAlpha)

  test("decodeImage matches source samples across the PNG kind/depth matrix") {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(150),
      Prop.forAll(anyCase) { case (png, channels, expected) =>
        val d = Multimodal.decodeImage(png)
        d.channels == channels && d.pixels.length == expected.length &&
          d.pixels.map(_ & 0xFF).toSeq == expected
      })
    assert(res.passed, res.toString)
  }
}
