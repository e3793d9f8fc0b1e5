package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM PCM/WAV codec: writer ↔ parser round-trip, the 8-bit wire
  * convention, chunk skipping, and unreadable-payload semantics. */
class WavCodecSpec extends AnyFunSuite {

  test("PCM16 mono round-trip: probe metadata and every sample bit-exact") {
    val samples = Array.tabulate(500)(i => ((i * 73) % 4001) - 2000)
    val bytes = WavCodec.writePcm16Mono(samples, 8000)
    val meta = WavCodec.probe(bytes)
    assert(meta.channels === 1 && meta.sampleRate === 8000 &&
      meta.bitsPerSample === 16 && meta.nFrames === 500L)
    assert(WavCodec.samples(bytes).toSeq === samples.toSeq)
    // negative extremes survive the 16-bit wire format
    val edges = Array(Short.MinValue.toInt, -1, 0, 1, Short.MaxValue.toInt)
    assert(WavCodec.samples(WavCodec.writePcm16Mono(edges, 44100)).toSeq === edges.toSeq)
  }

  test("8-bit PCM decodes centered (the unsigned-on-the-wire convention)") {
    // hand-build: RIFF/WAVE with fmt(8-bit mono) + data of raw bytes
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val data = Array[Int](0, 128, 255, 64) // wire bytes
    tag("RIFF"); le32(36 + data.length); tag("WAVE")
    tag("fmt "); le32(16); le16(1); le16(1); le32(8000); le32(8000); le16(1); le16(8)
    tag("data"); le32(data.length); data.foreach(out.write)
    val got = WavCodec.samples(out.toByteArray)
    assert(got.toSeq === Seq(-128, 0, 127, -64), "8-bit samples center at wire-value - 128")
  }

  test("stereo 24-bit round-trip: sign extension and interleave order bit-exact") {
    // spans the full 24-bit signed range, including both extremes and
    // values whose bit 23 is set (the sign-extension path)
    val frames = 300
    val interleaved = Array.tabulate(frames * 2) { idx =>
      val f = idx / 2; val c = idx % 2
      if (f == 0 && c == 0) -(1 << 23)
      else if (f == 0 && c == 1) (1 << 23) - 1
      else ((f * 52361 + c * 977) % 16000001) - 8000000
    }
    val bytes = WavCodec.writePcm(interleaved, 48000, channels = 2, bits = 24)
    val m = WavCodec.probe(bytes)
    assert(m.channels === 2 && m.sampleRate === 48000)
    assert(m.bitsPerSample === 24 && m.nFrames === frames.toLong)
    assert(WavCodec.samples(bytes).toSeq === interleaved.toSeq,
      "every 24-bit sample must round-trip exactly, channels interleaved")
  }

  test("writer rejects out-of-range samples and ragged channel fill") {
    assertThrows[IllegalArgumentException](
      WavCodec.writePcm(Array(1 << 23), 8000, 1, 24))
    assertThrows[IllegalArgumentException](
      WavCodec.writePcm(Array(Short.MaxValue + 1), 8000, 1, 16))
    assertThrows[IllegalArgumentException](
      WavCodec.writePcm(Array(1, 2, 3), 8000, 2, 16))
  }

  test("unknown chunks before fmt/data are skipped") {
    val samples = Array.tabulate(10)(_ * 100)
    val canonical = WavCodec.writePcm16Mono(samples, 8000)
    // splice a junk chunk between 'WAVE' and 'fmt '
    val junk = "JUNK".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4)
    val spliced = canonical.take(12) ++ junk ++ canonical.drop(12)
    assert(WavCodec.samples(spliced).toSeq === samples.toSeq)
    assert(WavCodec.probe(spliced).nFrames === 10L)
  }

  test("undecodable payloads: loud throw from the parser, NULL from the column UDF") {
    intercept[IllegalArgumentException](WavCodec.probe("not riff at all".getBytes))
    // RIFF but AVI: wrong form type for an audio decode
    val avi = "RIFF".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "AVI ".getBytes
    intercept[IllegalArgumentException](WavCodec.probe(avi))
    // float PCM (wFormatTag 3) is declared undecodable, not mis-decoded
    val f32 = {
      val out = new java.io.ByteArrayOutputStream()
      def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
      def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      tag("RIFF"); le32(36); tag("WAVE")
      tag("fmt "); le32(16); le16(3); le16(1); le32(8000); le32(32000); le16(4); le16(32)
      out.toByteArray
    }
    intercept[IllegalArgumentException](WavCodec.samples(f32))
  }
}
