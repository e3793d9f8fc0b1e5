package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

/** RFC 2435 strip ↔ reconstruct (no Spark): the receiver's rebuilt
  * JPEG must DECODE bit-identically to the original — same quant
  * tables, same scan, standard Huffman — across sizes and both chroma
  * types ImageIO produces. */
class JpegRtpSpec extends AnyFunSuite {

  private def jpeg(seed: Int, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 7 + y * 13 + seed * 31) * 2654435761L).toInt & 0xffffff)
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  test("strip -> reconstruct -> decode is pixel-identical to decoding the original") {
    for ((w, h) <- Seq((32, 24), (64, 48), (160, 120), (8, 8))) {
      val original = jpeg(w + h, w, h)
      val p = JpegRtp.parse(original).getOrElse(
        fail(s"ImageIO baseline ${w}x$h must be RFC-representable"))
      assert(p.width === w && p.height === h)
      assert(p.typ === 1, "ImageIO default chroma is 4:2:0 = RFC type 1")
      assert(p.scan.length < original.length, "the strip must actually drop headers")
      val rebuilt = JpegRtp.reconstruct(p.typ, p.width, p.height, p.quant, p.scan)
      val a = ImageCodec.decode(original).get
      val b = ImageCodec.decode(rebuilt).getOrElse(fail("rebuilt JPEG must decode"))
      assert(b.width === a.width && b.height === a.height)
      assert(b.pixels.toSeq === a.pixels.toSeq,
        s"${w}x$h: reconstruction must preserve decoded pixels exactly")
    }
  }

  test("unrepresentable frames are refused, not mangled") {
    // dims not multiples of 8: the RFC header carries w/8, h/8
    assert(JpegRtp.parse(jpeg(1, 30, 20)).isEmpty)
    // not a JPEG at all
    assert(JpegRtp.parse(Array.tabulate[Byte](64)(_.toByte)).isEmpty)
    // truncated: EOI missing
    val t = jpeg(2, 32, 24)
    assert(JpegRtp.parse(t.dropRight(2)).isEmpty)
  }

  test("payload header layout: offsets, type, Q, dims, quant extension") {
    val h0 = JpegRtp.payloadHeader(0, 1, 64, 48, Some(new Array[Byte](128)))
    assert(h0.length === 8 + 4 + 128)
    assert((h0(4) & 0xff) === 1 && (h0(5) & 0xff) === 255)
    assert((h0(6) & 0xff) === 8 && (h0(7) & 0xff) === 6) // w/8, h/8
    assert(((h0(9) & 0xff)) === 0 && (((h0(10) & 0xff) << 8) | (h0(11) & 0xff)) === 128)
    val h1 = JpegRtp.payloadHeader(0x012345, 0, 2040, 2040, None)
    assert(h1.length === 8)
    assert((h1(1) & 0xff) === 0x01 && (h1(2) & 0xff) === 0x23 && (h1(3) & 0xff) === 0x45)
  }
}
