package graft.multimodal

import java.io.{ByteArrayInputStream, DataInputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Pure-JVM PCM/WAV audio codec — the REAL decode path for the audio
  * modality (the multimodal surface treated audio as an opaque stub
  * until now). WAV is RIFF, the same container family as AVI
  * ([[AviCodec]]): a 'fmt ' chunk describes the stream, a 'data' chunk
  * carries PCM samples. 8/16-bit integer PCM decodes with zero
  * dependencies and zero floating point — samples come back as exact
  * integers, which is what lets audio queries hash-match a DuckDB
  * oracle replaying the same integer math (q88).
  *
  * Column face: [[samplesUdf]] decodes a BinaryType payload to
  * `array<int>` — the multimodal-column shape (any number of audio
  * blobs in a table, decode runs executor-side per row, no driver
  * funnel). Interleaved frames for multi-channel input, like the wire
  * format.
  */
object WavCodec {

  /** The 'fmt ' probe set: PCM layout of the stream. `nFrames` counts
    * per-channel sample frames (dataBytes / blockAlign). */
  final case class WavMeta(channels: Int, sampleRate: Int,
                           bitsPerSample: Int, nFrames: Long)

  private def u16(in: DataInputStream): Int = {
    val a = in.read(); val b = in.read()
    if ((a | b) < 0) throw new java.io.EOFException()
    a | (b << 8)
  }
  private def u32(in: DataInputStream): Long = {
    val a = u16(in).toLong; val b = u16(in).toLong
    a | (b << 16)
  }
  private def fourcc(in: DataInputStream): String = {
    val b = new Array[Byte](4)
    in.readFully(b)
    new String(b, "US-ASCII")
  }

  private final case class Parsed(meta: WavMeta, data: Array[Byte])

  /** RIFF/WAVE chunk walk over in-memory bytes (audio blobs live in a
    * binary COLUMN; a table of them decodes row-parallel). Throws on
    * non-WAVE input or non-PCM encodings — unreadable, loudly. */
  private def parse(bytes: Array[Byte]): Parsed = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(fourcc(in) == "RIFF", "not a RIFF container")
    u32(in)
    require(fourcc(in) == "WAVE", "RIFF container is not WAVE")
    var channels = 0
    var rate = 0
    var bits = 0
    var blockAlign = 0
    var data: Array[Byte] = null
    var remaining = bytes.length - 12
    // >= 8: a zero-byte data chunk (empty audio) is exactly 8 trailing
    // header bytes — `> 8` missed it (found by WavCodecProps' empty-
    // vector case)
    while (remaining >= 8 && (data == null || channels == 0)) {
      val id = fourcc(in)
      val size = u32(in).toInt
      remaining -= 8
      id match {
        case "fmt " =>
          val fmt = u16(in)
          require(fmt == 1, s"only integer PCM is decodable (wFormatTag=$fmt)")
          channels = u16(in)
          rate = u32(in).toInt
          u32(in) // byte rate
          blockAlign = u16(in)
          bits = u16(in)
          require(bits == 8 || bits == 16, s"only 8/16-bit PCM ($bits)")
          val skip = size - 16
          if (skip > 0) in.skipBytes(skip + (size & 1))
          remaining -= size + (size & 1)
        case "data" =>
          data = new Array[Byte](size)
          in.readFully(data)
          remaining -= size + (size & 1)
        case _ =>
          in.skipBytes(size + (size & 1))
          remaining -= size + (size & 1)
      }
    }
    require(channels > 0, "WAVE has no fmt chunk")
    require(data != null, "WAVE has no data chunk")
    Parsed(WavMeta(channels, rate, bits, data.length.toLong / blockAlign), data)
  }

  /** Container probe over payload bytes. */
  def probe(bytes: Array[Byte]): WavMeta = parse(bytes).meta

  /** Decode to interleaved integer samples: 16-bit → signed [-32768,
    * 32767]; 8-bit (unsigned on the wire) → centered [-128, 127]. Exact
    * integers end to end. */
  def samples(bytes: Array[Byte]): Array[Int] = {
    val p = parse(bytes)
    val d = p.data
    if (p.meta.bitsPerSample == 16) {
      val out = new Array[Int](d.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = ((d(2 * i) & 0xff) | (d(2 * i + 1) << 8)).toShort.toInt
        i += 1
      }
      out
    } else {
      val out = new Array[Int](d.length)
      var i = 0
      while (i < out.length) { out(i) = (d(i) & 0xff) - 128; i += 1 }
      out
    }
  }

  /** Column form: binary → array<int> samples, NULL when the payload is
    * not decodable PCM (the unreadable predicate, like
    * [[ImageCodec.decodeUdf]]). */
  val samplesUdf: Column => Column = {
    val f = udf((bytes: Array[Byte]) =>
      if (bytes == null) None
      else try Some(samples(bytes)) catch {
        case _: IllegalArgumentException | _: java.io.IOException |
             _: IndexOutOfBoundsException | _: NegativeArraySizeException => None
      })
    c => f(c)
  }

  /** PCM16 mono writer (fixtures + the audio face of media sinks). */
  def writePcm16Mono(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    tag("RIFF"); le32(36L + dataLen); tag("WAVE")
    tag("fmt "); le32(16)
    le16(1); le16(1)              // PCM, mono
    le32(sampleRate)
    le32(sampleRate.toLong * 2)   // byte rate
    le16(2); le16(16)             // block align, bits
    tag("data"); le32(dataLen)
    samples.foreach { s =>
      require(s >= Short.MinValue && s <= Short.MaxValue, s"sample $s out of 16-bit range")
      le16(s & 0xffff)
    }
    out.toByteArray
  }
}
