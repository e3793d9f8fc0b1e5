package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.WavCodec

/** The acoustic near-dup kernel (q92's pixel-face sibling): invariances,
  * the container round-trip, and the kernel ≡ relational-query
  * cross-check. No Spark — the set pipeline itself is oracled as q92. */
class AudioFingerprintSpec extends AnyFunSuite {

  private def stream(grp: Int, n: Int = 4000): Array[Int] =
    Array.tabulate(n)(i => ((i * 73 + grp * 131) % 4001) - 2000)

  test("deterministic, amplitude-invariant, content-sensitive") {
    val a = stream(1)
    val fp = AudioFingerprint.fingerprint(a)
    assert(fp.toSeq === AudioFingerprint.fingerprint(a.clone()).toSeq)
    assert(fp.length === 8, "4000 samples / window 50 / block 9 = 8 full blocks")
    // doubling amplitude scales every energy 4x uniformly: every
    // COMPARISON BIT is preserved (the delta-sign part, h % 2048),
    // while the anchor-energy term intentionally shifts — the element
    // trades whole-element amplitude invariance for corpus-scale
    // bucket scatter (2048 bit-patterns alone would put hundreds of
    // unrelated recordings in every candidate bucket)
    val louder = AudioFingerprint.fingerprint(a.map(_ * 2))
    assert(louder.map(_ % 2048L).toSeq === fp.map(_ % 2048L).toSeq,
      "a remastered-louder copy keeps every comparison bit")
    assert(louder.toSeq !== fp.toSeq,
      "the anchored element is amplitude-sensitive by design")
    val other = AudioFingerprint.fingerprint(stream(2))
    // the pipeline criterion: distinct content must fall below the q92
    // near-dup threshold (the closed-form streams are phase-shifted
    // ramps, so some block elements legitimately coincide)
    val inter = fp.toSet.intersect(other.toSet).size.toDouble
    val jaccard = inter / (fp.toSet ++ other.toSet).size
    assert(jaccard < 0.5, s"distinct content must not pair (jaccard $jaccard)")
  }

  test("container-invariant: the same samples decode from 16- and 24-bit WAVs to one fingerprint") {
    val samples = stream(3)
    val fp16 = AudioFingerprint.fingerprint(
      WavCodec.samples(WavCodec.writePcm(samples, 8000, 1, 16)))
    val fp24 = AudioFingerprint.fingerprint(
      WavCodec.samples(WavCodec.writePcm(samples, 8000, 1, 24)))
    assert(fp16.toSeq === AudioFingerprint.fingerprint(samples).toSeq)
    assert(fp24.toSeq === fp16.toSeq,
      "bit depth is container detail; exact integer decode makes it vanish")
  }

  test("kernel reproduces q92's relational signature elements exactly") {
    // q92 computes blocks b*256+bits over the SAME closed-form stream
    // with nested Catalyst HOFs; the Scala kernel must agree per group
    (0 until 40).foreach { grp =>
      val fp = AudioFingerprint.fingerprint(stream(grp), window = 50, blockWindows = 9)
      // recompute independently, literal to the q92 oracle definition
      val e = (0 until 80).map(w =>
        (w * 50 until w * 50 + 50).map { i =>
          val s = ((i * 73 + grp * 131) % 4001) - 2000L
          s * s
        }.sum)
      val expected = (0 until 8).map { b =>
        val bits = (0 until 8).map { k =>
          if (e(b * 9 + k + 1) > e(b * 9 + k)) 1L << k else 0L
        }.sum
        b.toLong * 256L + bits + (e(b * 9) % 999983L) * 2048L
      }
      assert(fp.toSeq === expected, s"group $grp")
    }
  }
}
