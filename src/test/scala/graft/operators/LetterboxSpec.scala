package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Letterbox geometry vs the reference semantics
  * (`/root/reference/uav/frame_processing.py:29-39`): truncating resize,
  * centered pads with the spare pixel bottom/right. */
class LetterboxSpec extends SparkSpec {

  /** Reference arithmetic, transcribed for expectation-building only. */
  private def expected(w: Int, h: Int, t: Int): (Long, Long, Long, Long, Long, Long) = {
    val scale = math.min(t.toDouble / w, t.toDouble / h)
    val newW = (w * scale).toLong // int() truncation
    val newH = (h * scale).toLong
    val top = (t - newH) / 2
    val bottom = t - newH - top
    val left = (t - newW) / 2
    val right = t - newW - left
    (newW, newH, top, bottom, left, right)
  }

  private def compute(dims: Seq[(Int, Int)]): Seq[(Int, Int, Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    val df = dims.toDF("w", "h")
    val g = Letterbox.geometry(col("w"), col("h"), 640)
    df.select(col("w"), col("h"), g.newW, g.newH,
        g.padTop, g.padBottom.cast("long"), g.padLeft, g.padRight.cast("long"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSeq
  }

  test("fixture cases incl. odd-remainder pads (extra pixel bottom/right)") {
    val cases = Seq((1920, 1080), (1080, 1920), (640, 640), (100, 37),
      (37, 100), (1, 1), (641, 639))
    for ((w, h, nw, nh, top, bot, lft, rgt) <- compute(cases)) {
      val (enw, enh, etop, ebot, elft, ergt) = expected(w, h, 640)
      assert((nw, nh, top, bot, lft, rgt) === (enw, enh, etop, ebot, elft, ergt),
        s"dims ($w,$h)")
    }
  }

  test("properties: long edge hits target, pads close exactly, never negative") {
    val dims = for (w <- 1 to 97 by 8; h <- 1 to 1213 by 101) yield (w, h)
    for ((w, h, nw, nh, top, bot, lft, rgt) <- compute(dims)) {
      // truncating resize can land the long edge at target-1 when
      // w*(t/w) rounds just below t (see LetterboxKernelProps)
      assert(math.max(nw, nh) >= 639 && math.max(nw, nh) <= 640, s"($w,$h) long edge")
      assert(nh + top + bot === 640, s"($w,$h) vertical closure")
      assert(nw + lft + rgt === 640, s"($w,$h) horizontal closure")
      assert(top >= 0 && bot >= 0 && lft >= 0 && rgt >= 0, s"($w,$h) pads")
      assert(bot - top <= 1 && rgt - lft <= 1 && bot >= top && rgt >= lft,
        s"($w,$h) spare pixel goes bottom/right")
    }
  }
}
