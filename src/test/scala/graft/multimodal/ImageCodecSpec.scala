package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

class ImageCodecSpec extends AnyFunSuite {

  private def png(img: BufferedImage): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("decode yields cv2.imread layout: row-major interleaved BGR, per-image dims") {
    val img = new BufferedImage(3, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000) // red
    img.setRGB(1, 0, 0x00ff00) // green
    img.setRGB(2, 0, 0x0000ff) // blue
    img.setRGB(0, 1, 0x102030)
    val d = ImageCodec.decode(png(img)).get
    assert(d.width === 3 && d.height === 2)
    assert(d.pixels.length === 3 * 2 * 3)
    def bgr(x: Int, y: Int) = {
      val i = (y * 3 + x) * 3
      (d.pixels(i) & 0xff, d.pixels(i + 1) & 0xff, d.pixels(i + 2) & 0xff)
    }
    assert(bgr(0, 0) === ((0, 0, 255)), "red pixel -> B=0,G=0,R=255")
    assert(bgr(1, 0) === ((0, 255, 0)))
    assert(bgr(2, 0) === ((255, 0, 0)))
    assert(bgr(0, 1) === ((0x30, 0x20, 0x10)), "row-major: second row after first")
  }

  test("jpeg and bmp decode too (JDK built-in readers)") {
    for (fmt <- Seq("jpg", "bmp")) {
      val img = new BufferedImage(5, 4, BufferedImage.TYPE_3BYTE_BGR)
      val baos = new ByteArrayOutputStream()
      ImageIO.write(img, fmt, baos)
      val d = ImageCodec.decode(baos.toByteArray)
      assert(d.isDefined, s"$fmt must decode")
      assert(d.get.width === 5 && d.get.height === 4)
    }
  }

  test("undecodable payloads return None, never throw: empty, garbage, truncated") {
    assert(ImageCodec.decode(null).isEmpty)
    assert(ImageCodec.decode(Array.empty[Byte]).isEmpty)
    assert(ImageCodec.decode("not an image at all".getBytes).isEmpty)
    val whole = png(new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB))
    assert(ImageCodec.decode(whole.take(48)).isEmpty,
      "valid PNG signature but torn stream must be a decode failure")
  }
}
