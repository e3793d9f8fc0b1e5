package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAllNoShrink

/** ScalaCheck properties for the letterbox kernel (SURVEY.md §5.2.3):
  * ∀ (w, h) the long edge hits the target, pads close both axes exactly,
  * pad pixels are black, and every image pixel comes from the source.
  * Pure-JVM — no SparkSession needed, so thousands of cases are cheap.
  */
object LetterboxKernelProps extends Properties("LetterboxKernel") {

  private val target = 64
  private val dims = for {
    w <- Gen.choose(1, 300)
    h <- Gen.choose(1, 300)
  } yield (w, h)

  private def geometry(w: Int, h: Int): (Int, Int, Int, Int) = {
    val scale = math.min(target.toDouble / w, target.toDouble / h)
    val newW = math.max(1, (w * scale).toInt) // kernel clamps 0-dim away
    val newH = math.max(1, (h * scale).toInt)
    (newW, newH, (target - newH) / 2, (target - newW) / 2)
  }

  // NOTE (found by this property): the reference's truncating resize
  // (`int(dim * scale)`, frame_processing.py:33-34) does NOT guarantee
  // the long edge hits the target exactly — w * (t/w) can round just
  // below t in float64 (e.g. w=206, t=64 → 63). The true invariant is
  // max(new) ∈ {t-1, t}.
  property("output is target² and the long edge is within 1 of target") =
    forAllNoShrink(dims) { case (w, h) =>
      val (newW, newH, _, _) = geometry(w, h)
      val out = LetterboxKernel.letterbox(
        Array.tabulate(w * h)(i => (i % 251 + 1).toByte), w, h, target)
      out.length == target * target &&
        math.max(newW, newH) >= target - 1 && math.max(newW, newH) <= target &&
        newW >= 1 && newH >= 1
    }

  property("pad pixels are black, image pixels are sourced") = forAllNoShrink(dims) { case (w, h) =>
    // source bytes are all nonzero, so pad (0) vs image is distinguishable
    val src = Array.tabulate(w * h)(i => (i % 251 + 1).toByte)
    val (newW, newH, padTop, padLeft) = geometry(w, h)
    val out = LetterboxKernel.letterbox(src, w, h, target)
    val ok = (0 until target).forall { y =>
      (0 until target).forall { x =>
        val inside = y >= padTop && y < padTop + newH && x >= padLeft && x < padLeft + newW
        val v = out(y * target + x)
        if (inside) v != 0 else v == 0
      }
    }
    val padCount = out.count(_ == 0)
    ok && padCount == target * target - newW * newH
  }

  property("exact-fit input is copied verbatim") = forAllNoShrink(Gen.choose(1, 251)) { seed =>
    val src = Array.tabulate(target * target)(i => ((i + seed) % 251 + 1).toByte)
    LetterboxKernel.letterbox(src, target, target, target).toSeq == src.toSeq
  }

  property("3-channel letterbox == per-channel 1-channel letterbox") =
    forAllNoShrink(dims) { case (w, h) =>
      val ch = 3
      val src = Array.tabulate(w * h * ch)(i => (i % 251 + 1).toByte)
      val inter = LetterboxKernel.letterbox(src, w, h, target, ch)
      (0 until ch).forall { c =>
        val plane = Array.tabulate(w * h)(i => src(i * ch + c))
        val expect = LetterboxKernel.letterbox(plane, w, h, target)
        (0 until target * target).forall(i => inter(i * ch + c) == expect(i))
      }
    }
}
