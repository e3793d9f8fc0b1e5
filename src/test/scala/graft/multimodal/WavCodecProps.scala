package graft.multimodal

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAllNoShrink

/** ScalaCheck properties for the WAV codec: ∀ sample vectors (any
  * length incl. empty, full 16-bit range) the container round-trips
  * bit-exact, and the probe reports the written layout. */
object WavCodecProps extends Properties("WavCodec") {

  private val sampleVec =
    Gen.listOf(Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))

  property("PCM16 write -> parse round-trips every sample bit-exact") =
    forAllNoShrink(sampleVec, Gen.choose(1, 96000)) { (xs, rate) =>
      val bytes = WavCodec.writePcm16Mono(xs.toArray, rate)
      val meta = WavCodec.probe(bytes)
      meta.channels == 1 && meta.sampleRate == rate &&
        meta.bitsPerSample == 16 && meta.nFrames == xs.length.toLong &&
        WavCodec.samples(bytes).toSeq == xs
    }

  property("the column UDF's failure contract: truncated payloads never decode to wrong samples") =
    forAllNoShrink(sampleVec.suchThat(_.nonEmpty), Gen.choose(0, 43)) { (xs, cut) =>
      // tearing the container anywhere inside the 44-byte header makes
      // it unreadable — parse throws (→ NULL at the column layer),
      // never returns a truncated-but-plausible sample vector
      val whole = WavCodec.writePcm16Mono(xs.toArray, 8000)
      val torn = whole.take(cut)
      try { WavCodec.samples(torn); false }
      catch { case _: Exception => true }
    }
}
