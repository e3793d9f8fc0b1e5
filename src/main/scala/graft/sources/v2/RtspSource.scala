package graft.sources.v2

import java.util

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The NETWORK face of S3: an RTSP/RTP client as a Structured Streaming
  * source — the reference's unbounded input is an RTSP camera url
  * (`frame_reader.py:158-199`, `cv2.CAP_FFMPEG` over
  * `rtsp://host/stream`), and this speaks the same protocol family
  * pure-JVM: RTSP over TCP (OPTIONS/DESCRIBE/SETUP/PLAY) with
  * interleaved RTP data channels (RFC 2326 §10.12 `$`-framed records on
  * the control socket — the firewall-friendly transport FFmpeg calls
  * `rtsp_transport=tcp`).
  *
  * RTP framing is wire-standard: 12-byte header (V=2), sequence
  * numbers, the 90 kHz video timestamp clock, and the MARKER bit
  * terminating each frame's fragment run. The payload speaks RFC 2435
  * (RTP/JPEG, PT 26) — the format real MJPEG cameras emit: fragments
  * carry the 8-byte main header (type/Q/dims + fragment offset), the
  * first fragment carries the quantization tables in-band (Q=255),
  * and the receiver reconstructs a decodable JPEG from the reassembled
  * scan with the spec's standard Huffman tables
  * ([[graft.multimodal.JpegRtp]] — reconstruction is pixel-exact).
  * H.264 payloads are out for the same reason they are everywhere in
  * this engine: no pure-JVM decoder.
  *
  * Streaming contract: offsets are the client's frame-arrival index, so
  * commits are monotone and the buffer prunes to the committed prefix —
  * bounded memory on an unbounded stream. A restart re-handshakes and
  * the committed offset skips what the sink already has: against a
  * replaying (VOD-style) server that is at-least-once end to end; a
  * live camera cannot replay, which is exactly the reference's
  * at-most-once (it drops the stream on failure). `stopOnGrabFail`
  * (default true) mirrors `cap.grab() → False → release`: a socket
  * EOF/error freezes the offset instead of failing the query; `false`
  * propagates the error to the stream. */
class RtspSourceProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-rtsp"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RtspSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RtspTable(new CaseInsensitiveStringMap(properties))
}

object RtspSource {
  /** Decoded-frame schema, the S2/S3 shape: ts_us comes from the RTP
    * 90 kHz timestamp (µs-exact for integral fps). */
  val schema: StructType = StructType(Seq(
    StructField("frame_number", LongType, nullable = false),
    StructField("ts_us", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))
}

class RtspTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"graft-rtsp(${options.get("url")})"
  override def schema(): StructType = RtspSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val url = Option(opts.get("url")).getOrElse(
      throw new IllegalArgumentException("graft-rtsp needs option url=rtsp://host:port/path"))
    val stopOnGrabFail = opts.getBoolean("stopOnGrabFail", true)
    val ratePerBatch = opts.getLong("ratePerBatch", 1000L)
    () => new RtspScan(url, stopOnGrabFail, ratePerBatch)
  }
}

class RtspScan(url: String, stopOnGrabFail: Boolean, ratePerBatch: Long) extends Scan {
  override def readSchema(): StructType = RtspSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new RtspMicroBatchStream(url, stopOnGrabFail, ratePerBatch)
  override def description(): String = s"graft-rtsp $url"
}

/** Driver-side RTSP/RTP client: one control+data TCP socket, a reader
  * thread reassembling `$`-framed RTP into frames. The single socket is
  * inherent to the protocol (one camera, one session) — scale-out for
  * RTSP is MANY sources, each its own stream, not partitions of one. */
private[v2] final class RtspClient(url: String) {
  // rtsp://host:port/path
  private val m = "rtsp://([^:/]+):(\\d+)(/.*)?".r.findFirstMatchIn(url).getOrElse(
    throw new IllegalArgumentException(s"unparseable RTSP url: $url"))
  private val host = m.group(1)
  private val port = m.group(2).toInt

  /** (frameIdx, rtpTimestamp90kHz, jpegBytes), frameIdx dense from 0 at
    * PLAY. */
  private val frames = ArrayBuffer.empty[(Long, Long, Array[Byte])]
  private var base = 0L // frames pruned off the head (committed prefix)
  private var arrived = 0L
  @volatile var finished = false
  @volatile var error: Option[Throwable] = None

  private val socket = new java.net.Socket()
  socket.connect(new java.net.InetSocketAddress(host, port), 5000)
  socket.setSoTimeout(10000) // the reference's cap-open/read timeout shape
  private val out = socket.getOutputStream
  private val in = new java.io.BufferedInputStream(socket.getInputStream)

  private def request(method: String, target: String, cseq: Int,
                      extra: Seq[String] = Nil): Map[String, String] = {
    val req = (s"$method $target RTSP/1.0" +: s"CSeq: $cseq" +: extra)
      .mkString("", "\r\n", "\r\n\r\n")
    out.write(req.getBytes("US-ASCII")); out.flush()
    // status line + headers (terminated by an empty line), then a body
    // of Content-Length bytes (DESCRIBE's SDP), which we read and drop —
    // the SDP's media line is informative here, the SETUP target is
    // derived from the url
    val headers = scala.collection.mutable.Map.empty[String, String]
    var line = readLine()
    require(line.startsWith("RTSP/1.0 200"), s"RTSP $method failed: $line")
    line = readLine()
    while (line.nonEmpty) {
      val i = line.indexOf(':')
      if (i > 0) headers(line.take(i).trim.toLowerCase) = line.drop(i + 1).trim
      line = readLine()
    }
    headers.get("content-length").map(_.toInt).filter(_ > 0).foreach { n =>
      val body = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(body, off, n - off)
        require(r >= 0, "EOF inside RTSP body")
        off += r
      }
    }
    headers.toMap
  }

  private def readLine(): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != -1 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
    require(c != -1 || sb.nonEmpty, "EOF inside RTSP headers")
    sb.toString
  }

  // ---- handshake: OPTIONS / DESCRIBE / SETUP (interleaved) / PLAY
  request("OPTIONS", url, 1)
  request("DESCRIBE", url, 2, Seq("Accept: application/sdp"))
  private val setup = request("SETUP", s"$url/track1", 3,
    Seq("Transport: RTP/AVP/TCP;unicast;interleaved=0-1"))
  private val session = setup.getOrElse("session",
    throw new IllegalStateException("SETUP returned no Session")).split(";")(0)
  request("PLAY", url, 4, Seq(s"Session: $session"))

  // ---- reader thread: '$' ch u16len framed RTP; each packet carries an
  // RFC 2435 JPEG payload (8-byte main header, quant extension on the
  // first fragment, marker bit on the last); a completed frame's scan
  // RECONSTRUCTS to a decodable JPEG via [[graft.multimodal.JpegRtp]]
  private val reader = new Thread(() => {
    val scan = new java.io.ByteArrayOutputStream()
    var pendingTs = 0L
    var typ = 0
    var width = 0
    var height = 0
    var quant: Array[Byte] = null
    try {
      var b = in.read()
      while (b != -1) {
        require(b == 0x24, f"expected interleave magic 0x24, got 0x$b%02x")
        val channel = in.read()
        val lenHi = in.read(); val lenLo = in.read()
        require((channel | lenHi | lenLo) >= 0, "EOF inside interleave header")
        val len = (lenHi << 8) | lenLo
        val pkt = new Array[Byte](len)
        var off = 0
        while (off < len) {
          val r = in.read(pkt, off, len - off)
          require(r >= 0, "EOF inside RTP packet")
          off += r
        }
        if (channel == 0 && len >= 20) { // RTP data (channel 1 = RTCP, skipped)
          require((pkt(0) & 0xc0) == 0x80, "RTP version must be 2")
          val marker = (pkt(1) & 0x80) != 0
          pendingTs = ((pkt(4) & 0xffL) << 24) | ((pkt(5) & 0xffL) << 16) |
            ((pkt(6) & 0xffL) << 8) | (pkt(7) & 0xffL)
          // RFC 2435 main header at pkt(12..19)
          val fragOffset = ((pkt(13) & 0xff) << 16) | ((pkt(14) & 0xff) << 8) | (pkt(15) & 0xff)
          var p = 20
          if (fragOffset == 0) {
            scan.reset()
            typ = pkt(16) & 0x3f
            val q = pkt(17) & 0xff
            width = (pkt(18) & 0xff) * 8
            height = (pkt(19) & 0xff) * 8
            if (q >= 128) { // quant extension: MBZ, precision, u16 length
              val qLen = ((pkt(p + 2) & 0xff) << 8) | (pkt(p + 3) & 0xff)
              quant = java.util.Arrays.copyOfRange(pkt, p + 4, p + 4 + qLen)
              p += 4 + qLen
            } else throw new java.io.IOException(
              s"Q=$q without in-band tables - static Q-table synthesis not supported")
          }
          // interleaved TCP delivers in order, so the scan appends
          // sequentially; fragOffset is still checked for gaps
          require(fragOffset == scan.size(),
            s"RTP/JPEG fragment gap: offset $fragOffset, have ${scan.size()}")
          scan.write(pkt, p, len - p)
          if (marker) {
            val jpeg = graft.multimodal.JpegRtp.reconstruct(
              typ, width, height, quant, scan.toByteArray)
            scan.reset()
            synchronized {
              frames += ((arrived, pendingTs, jpeg))
              arrived += 1
            }
          }
        }
        b = in.read()
      }
      finished = true
    } catch {
      case t: Throwable =>
        error = Some(t)
        finished = true
    }
  }, s"graft-rtsp-reader-$host:$port")
  reader.setDaemon(true)
  reader.start()

  def available(): Long = synchronized(arrived)

  /** Frames in [start, end) — global indices; the committed prefix may
    * already be pruned, never the requested window. */
  def slice(start: Long, end: Long): Array[(Long, Long, Array[Byte])] = synchronized {
    require(start >= base, s"window [$start,$end) reaches below pruned base $base")
    frames.view.slice((start - base).toInt, (end - base).toInt).toArray
  }

  /** Prunes the committed prefix — the bounded-memory contract. */
  def commit(upTo: Long): Unit = synchronized {
    val drop = (upTo - base).toInt
    if (drop > 0) { frames.remove(0, drop); base = upTo }
  }

  def close(): Unit = {
    try {
      out.write(s"TEARDOWN $url RTSP/1.0\r\nCSeq: 5\r\nSession: $session\r\n\r\n"
        .getBytes("US-ASCII"))
      out.flush()
    } catch { case _: java.io.IOException => }
    try socket.close() catch { case _: java.io.IOException => }
  }
}

final case class RtspOffset(frame: Long) extends Offset {
  override def json(): String = frame.toString
}

final case class RtspInputPartition(rows: Array[(Long, Long, Array[Byte])])
    extends InputPartition

class RtspMicroBatchStream(url: String, stopOnGrabFail: Boolean, ratePerBatch: Long)
    extends MicroBatchStream with SupportsAdmissionControl {

  private var client: RtspClient = null
  private def ensureClient(): RtspClient = synchronized {
    if (client == null) client = new RtspClient(url)
    client
  }

  override def initialOffset(): Offset = RtspOffset(0L)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val c = ensureClient()
    c.error match {
      case Some(t) if !stopOnGrabFail =>
        throw new java.io.IOException(s"RTSP stream failed (stopOnGrabFail=false)", t)
      case Some(t) =>
        // cap.grab() -> False -> release: freeze at what arrived
        System.err.println(s"[rtsp] stream ended on error (${t.getMessage}) - stopping at ${c.available()}")
      case None =>
    }
    val s = start.asInstanceOf[RtspOffset].frame
    RtspOffset(math.max(s, math.min(c.available(), s + ratePerBatch)))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-control entry point")

  override def reportLatestOffset(): Offset = RtspOffset(ensureClient().available())

  override def deserializeOffset(json: String): Offset = RtspOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[RtspOffset].frame
    val e = end.asInstanceOf[RtspOffset].frame
    if (e <= s) Array.empty
    else Array(RtspInputPartition(ensureClient().slice(s, e)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val rows = partition.asInstanceOf[RtspInputPartition].rows
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): InternalRow = {
          val (idx, ts90k, jpeg) = rows(i)
          val img = graft.multimodal.ImageCodec.decode(jpeg).getOrElse(
            throw new java.io.IOException(s"undecodable RTP frame $idx"))
          new GenericInternalRow(Array[Any](
            idx, ts90k * 1000000L / 90000L, img.width, img.height, img.pixels))
        }
        override def close(): Unit = ()
      }
    }

  override def commit(end: Offset): Unit =
    if (client != null) client.commit(end.asInstanceOf[RtspOffset].frame)

  override def stop(): Unit = if (client != null) client.close()
}
