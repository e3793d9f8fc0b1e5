package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.file.Files

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.{AviCodec, Mp4Codec}

/** The pixel face of video near-dup (q91's kernel): dHash invariances
  * and the end-to-end container case — two differently-muxed copies of
  * the same footage pair up, distinct footage does not. */
class FrameHashSpec extends SparkSpec {

  private val W = 64
  private val H = 48

  /** Structured content (gradients + a seed-positioned block) so
    * downsampling sees real luma structure, not noise. */
  private def frame(seed: Int): Array[Byte] = {
    val px = new Array[Byte](W * H * 3)
    for (y <- 0 until H; x <- 0 until W) {
      val base = (x * (1 + seed % 5) + y * (2 + seed % 3) +
        (if ((x / 8 + y / 8 + seed) % 4 == 0) 90 else 0)) % 200
      val p = (y * W + x) * 3
      px(p) = base.toByte
      px(p + 1) = ((base + 20) % 200).toByte
      px(p + 2) = ((base + 40) % 200).toByte
    }
    px
  }

  private def jpegOf(px: Array[Byte]): Array[Byte] = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_3BYTE_BGR)
    img.getRaster.setDataElements(0, 0, W, H, px)
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  test("dHash: deterministic, brightness-invariant, content-sensitive") {
    val a = frame(1)
    val h1 = FrameHash.dHash(a, W, H)
    assert(h1 === FrameHash.dHash(a.clone(), W, H), "deterministic")
    // uniform brightness shift preserves every neighbor comparison
    val brighter = a.map(b => math.min(255, (b & 0xff) + 30).toByte)
    assert(FrameHash.dHash(brighter, W, H) === h1, "brightness-invariant")
    val other = frame(2)
    val d = FrameHash.hamming(h1, FrameHash.dHash(other, W, H))
    assert(d > 8, s"distinct content must differ in many bits (got $d)")
    // JPEG re-encode of the SAME frame stays within a small radius
    val reencoded = graft.multimodal.ImageCodec.decode(jpegOf(a)).get
    val dr = FrameHash.hamming(h1, FrameHash.dHash(reencoded.pixels, W, H))
    assert(dr <= 8, s"lossy re-encode must stay near the source hash (got $dr)")
  }

  test("video near-dup over real containers: same footage pairs, distinct footage does not") {
    val dir = Files.createTempDirectory("graft_vneardup")
    graft.TempDirs.cleanupOnExit(dir)
    val footage = (0 until 6).map(i => jpegOf(frame(i)))
    val otherFootage = (10 until 16).map(i => jpegOf(frame(i)))
    // the same six JPEGs muxed as AVI and as MP4 — two "copies" of one
    // video in different containers; a third container with different
    // content
    AviCodec.writeMjpeg(dir.resolve("copy_a.avi").toString, footage, W, H, 25)
    Mp4Codec.writeMjpeg(dir.resolve("copy_b.mp4").toString, footage, W, H, 25)
    AviCodec.writeMjpeg(dir.resolve("other.avi").toString, otherFootage, W, H, 25)

    // per-file scan → per-frame dHash → per-video signature SET →
    // shared-hash candidates → Jaccard (the q91 pipeline on real pixels)
    val sigs = Seq("copy_a.avi", "copy_b.mp4", "other.avi").map { name =>
      val df = spark.read.format("graft-frames")
        .option("path", dir.resolve(name).toString).load()
        .select(FrameHash.dHashUdf(col("payload"), col("width"), col("height")).as("h"))
      name -> df.agg(collect_set(col("h"))).head().getSeq[Long](0).toSet
    }
    val bySet = sigs.toMap
    def jaccard(a: Set[Long], b: Set[Long]): Double =
      a.intersect(b).size.toDouble / a.union(b).size
    assert(jaccard(bySet("copy_a.avi"), bySet("copy_b.mp4")) === 1.0,
      "identical samples in different containers hash identically")
    assert(jaccard(bySet("copy_a.avi"), bySet("other.avi")) < 0.2,
      "distinct footage must not pair")
  }
}
