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
    * non-WAVE input or non-PCM encodings — unreadable, loudly.
    * `needData=false` walks headers only — [[probe]] must not pay a
    * full data-chunk copy per blob (a corpus metadata pass would
    * otherwise cost as much allocation as the decode pass). */
  private def parse(bytes: Array[Byte], needData: Boolean = true): Parsed = {
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
    var dataLen = -1L
    while (remaining >= 8 && (dataLen < 0 || channels == 0)) {
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
          require(bits == 8 || bits == 16 || bits == 24,
            s"only 8/16/24-bit PCM ($bits)")
          val skip = size - 16
          if (skip > 0) in.skipBytes(skip + (size & 1))
          remaining -= size + (size & 1)
        case "data" =>
          dataLen = size.toLong
          if (needData) {
            data = new Array[Byte](size)
            in.readFully(data)
          } else in.skipBytes(size + (size & 1))
          remaining -= size + (size & 1)
        case _ =>
          in.skipBytes(size + (size & 1))
          remaining -= size + (size & 1)
      }
    }
    require(channels > 0, "WAVE has no fmt chunk")
    require(dataLen >= 0, "WAVE has no data chunk")
    Parsed(WavMeta(channels, rate, bits, dataLen / blockAlign), data)
  }

  /** Container probe over payload bytes — header-only, no data copy. */
  def probe(bytes: Array[Byte]): WavMeta = parse(bytes, needData = false).meta

  /** Decode to interleaved integer samples: 16-bit → signed [-32768,
    * 32767]; 24-bit → signed [-8388608, 8388607] (3 bytes LE,
    * sign-extended); 8-bit (unsigned on the wire) → centered [-128,
    * 127]. Exact integers end to end; channels stay interleaved like
    * the wire format — `idx % channels` is the channel, `idx div
    * channels` the frame, which is how q90 deinterleaves relationally
    * instead of in the UDF. */
  def samples(bytes: Array[Byte]): Array[Int] = {
    val p = parse(bytes)
    val d = p.data
    p.meta.bitsPerSample match {
      case 16 =>
        val out = new Array[Int](d.length / 2)
        var i = 0
        while (i < out.length) {
          out(i) = ((d(2 * i) & 0xff) | (d(2 * i + 1) << 8)).toShort.toInt
          i += 1
        }
        out
      case 24 =>
        val out = new Array[Int](d.length / 3)
        var i = 0
        while (i < out.length) {
          // << 8 >> 8 sign-extends bit 23 through the int
          out(i) = (((d(3 * i) & 0xff) | ((d(3 * i + 1) & 0xff) << 8) |
            ((d(3 * i + 2) & 0xff) << 16)) << 8) >> 8
          i += 1
        }
        out
      case _ =>
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

  /** Column probe: binary → struct(channels, sample_rate, bits,
    * n_frames), NULL when not decodable PCM — the metadata face a
    * corpus query joins against before paying for sample decode. */
  val metaUdf: Column => Column = {
    val f = udf((bytes: Array[Byte]) =>
      if (bytes == null) None
      else try Some(probe(bytes)) catch {
        case _: IllegalArgumentException | _: java.io.IOException |
             _: IndexOutOfBoundsException | _: NegativeArraySizeException => None
      })
    c => f(c)
  }

  /** Interleaved PCM writer, 16- or 24-bit, any channel count
    * (fixtures + the audio face of media sinks). `samples` is
    * wire-ordered: frame-major, channel-minor. */
  def writePcm(samples: Array[Int], sampleRate: Int, channels: Int,
               bits: Int): Array[Byte] = {
    require(channels > 0, "channels must be positive")
    require(bits == 16 || bits == 24, s"writer emits 16/24-bit PCM, got $bits")
    require(samples.length % channels == 0,
      s"${samples.length} interleaved samples do not fill $channels-channel frames")
    val bytesPer = bits / 8
    val dataLen = samples.length * bytesPer
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val blockAlign = channels * bytesPer
    tag("RIFF"); le32(36L + dataLen); tag("WAVE")
    tag("fmt "); le32(16)
    le16(1); le16(channels)
    le32(sampleRate)
    le32(sampleRate.toLong * blockAlign) // byte rate
    le16(blockAlign); le16(bits)
    tag("data"); le32(dataLen)
    if (bits == 16)
      samples.foreach { s =>
        require(s >= Short.MinValue && s <= Short.MaxValue, s"sample $s out of 16-bit range")
        le16(s & 0xffff)
      }
    else
      samples.foreach { s =>
        require(s >= -(1 << 23) && s < (1 << 23), s"sample $s out of 24-bit range")
        out.write(s & 0xff); out.write((s >> 8) & 0xff); out.write((s >> 16) & 0xff)
      }
    out.toByteArray
  }

  /** PCM16 mono writer (the q88 fixture shape). */
  def writePcm16Mono(samples: Array[Int], sampleRate: Int): Array[Byte] =
    writePcm(samples, sampleRate, channels = 1, bits = 16)

  /** Incremental WAV writer — the audio analog of the video muxers:
    * RIFF/fmt headers up front with size placeholders, samples appended
    * one at a time (constant memory, any stream length), sizes patched
    * on [[close]]. A partial file is not a valid RIFF until close —
    * the release semantics every sink in this engine shares. */
  final class Writer(path: String, sampleRate: Int, channels: Int, bits: Int) {
    require(channels > 0, "channels must be positive")
    require(bits == 16 || bits == 24, s"writer emits 16/24-bit PCM, got $bits")
    private val o = new java.io.RandomAccessFile(path, "rw")
    o.setLength(0)
    private def le16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
    private def le32(v: Long): Unit = {
      o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
      o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
    }
    private def tag(s: String): Unit = o.write(s.getBytes("US-ASCII"))
    private val blockAlign = channels * bits / 8
    tag("RIFF")
    private val riffSizeAt = o.getFilePointer
    le32(0)
    tag("WAVE"); tag("fmt "); le32(16)
    le16(1); le16(channels); le32(sampleRate)
    le32(sampleRate.toLong * blockAlign)
    le16(blockAlign); le16(bits)
    tag("data")
    private val dataSizeAt = o.getFilePointer
    le32(0)
    private var n = 0L

    def addSample(s: Int): Unit = {
      if (bits == 16) {
        require(s >= Short.MinValue && s <= Short.MaxValue, s"sample $s out of 16-bit range")
        le16(s & 0xffff)
      } else {
        require(s >= -(1 << 23) && s < (1 << 23), s"sample $s out of 24-bit range")
        o.write(s & 0xff); o.write((s >> 8) & 0xff); o.write((s >> 16) & 0xff)
      }
      n += 1
    }

    def samplesWritten: Long = n

    def close(): Unit = {
      val end = o.getFilePointer
      o.seek(riffSizeAt); le32(end - 8)
      o.seek(dataSizeAt); le32(end - dataSizeAt - 4)
      o.close()
    }
  }

  /** The audio face of the K1 record-all sink: drains an ordered
    * `(sample_idx, sample)` relation into ONE WAV through the
    * incremental [[Writer]] — partition-at-a-time fetch via
    * `toLocalIterator`, constant memory, like [[VideoSink.saveAvi]]
    * (one container is a sequential artifact; sample order IS the
    * format). Returns samples written. */
  def saveWav(df: org.apache.spark.sql.DataFrame, path: String,
              sampleRate: Int, channels: Int = 1, bits: Int = 16): Long = {
    import org.apache.spark.sql.functions.col
    val it = df.select(col("sample_idx"), col("sample").cast("int"))
      .orderBy("sample_idx").toLocalIterator()
    val w = new Writer(path, sampleRate, channels, bits)
    try while (it.hasNext) w.addSample(it.next().getInt(1))
    finally w.close()
    w.samplesWritten
  }

  /** Partition-parallel form: range-partitioned on `sample_idx`, each
    * contiguous run muxes its own `part-NNNNN.wav` executor-side —
    * ordered concatenation of the parts' samples reproduces the full
    * stream (the [[VideoSink.saveAviPartitioned]] convention). */
  def saveWavPartitioned(df: org.apache.spark.sql.DataFrame, dir: String,
                         sampleRate: Int, channels: Int = 1, bits: Int = 16,
                         numParts: Int = 0): Long = {
    import org.apache.spark.sql.functions.col
    new java.io.File(dir).mkdirs()
    val selected = df.select(col("sample_idx"), col("sample").cast("int"))
    val prepared = (if (numParts > 0)
        selected.repartitionByRange(numParts, col("sample_idx"))
      else selected.repartitionByRange(col("sample_idx")))
      .sortWithinPartitions("sample_idx")
    val written = prepared.sparkSession.sparkContext.longAccumulator("wav_samples_written")
    prepared.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      var w: Writer = null
      var path: String = null
      rows.foreach { r =>
        if (w == null) {
          val partId = org.apache.spark.TaskContext.getPartitionId()
          path = f"$dir/part-$partId%05d.wav"
          w = new Writer(path, sampleRate, channels, bits)
        }
        w.addSample(r.getInt(1))
        written.add(1L)
      }
      if (w != null) w.close()
    }
    written.value
  }
}
