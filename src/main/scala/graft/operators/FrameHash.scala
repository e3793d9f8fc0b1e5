package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Perceptual frame hashing for VIDEO-level near-dup detection — the
  * pixel face of q91's signature pipeline. A difference hash (dHash):
  * luma-downsample the frame to a 9×8 grid (nearest neighbor, the
  * [[LetterboxKernel]] convention) and emit one bit per horizontal
  * neighbor comparison — 64 bits total. Comparing ADJACENT samples
  * makes the hash invariant to uniform brightness shifts and robust to
  * re-encoding noise, which is what lets two differently-muxed copies
  * of the same footage hash identically while distinct content lands
  * ~32 bits apart (spec'd).
  *
  * Scalar kernel at the codec boundary (the sanctioned-UDF class,
  * SURVEY §2.5): decode hands this a BGR buffer, everything after the
  * hash — signature sets, bucket joins, Jaccard — is native Catalyst
  * (q91's shape). */
object FrameHash {

  /** 64-bit dHash over an interleaved buffer (BGR for `channels`=3,
    * grayscale for 1). Bit k (row-major over the 8×8 comparison grid)
    * is set when the left sample's luma is below its right neighbor's. */
  def dHash(pixels: Array[Byte], w: Int, h: Int, channels: Int = 3): Long = {
    require(w > 0 && h > 0, s"dims must be positive: ${w}x$h")
    require(pixels.length >= w * h * channels,
      s"need ${w * h * channels} bytes for ${w}x$h x$channels, got ${pixels.length}")
    var bits = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      val sy = y * h / 8
      var prev = 0
      var x = 0
      while (x < 9) {
        val sx = x * w / 9
        val p = (sy * w + sx) * channels
        // integer Rec.601-ish luma for BGR order; exact weights are
        // irrelevant as long as both sides of any comparison use them
        val b = pixels(p) & 0xff
        val g = if (channels > 1) pixels(p + 1) & 0xff else b
        val r = if (channels > 2) pixels(p + 2) & 0xff else b
        val luma = (29 * b + 150 * g + 77 * r) >> 8
        if (x > 0) {
          if (prev < luma) bits |= 1L << bit
          bit += 1
        }
        prev = luma
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Bits differing between two hashes — the frame-level distance. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Column form over (payload, width, height) — the connector's
    * decoded-frame schema. NULL payload → NULL hash. */
  val dHashUdf: (Column, Column, Column) => Column = {
    val f = udf((p: Array[Byte], w: Int, h: Int) =>
      if (p == null) None else Some(dHash(p, w, h)))
    (p, w, h) => f(p, w, h)
  }
}
