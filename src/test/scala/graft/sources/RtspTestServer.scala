package graft.sources

import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.util.concurrent.atomic.AtomicInteger

/** Minimal localhost RTSP server for the `graft-rtsp` specs: answers
  * OPTIONS/DESCRIBE/SETUP/PLAY/TEARDOWN and, after PLAY, streams its
  * JPEG frames as interleaved RTP on channel 0 — fragmented to
  * `fragmentSize`, marker bit on each frame's last fragment, 90 kHz
  * timestamps at `fps`. Replays from frame 0 on every session
  * (VOD-style), which is what makes checkpoint-restart at-least-once
  * testable; `dropAfter` ends the data stream mid-play (socket close,
  * no TEARDOWN) to exercise the stop-on-grab-fail path.
  *
  * Wire-variation knobs exercise the client's standards conformance
  * (ADVICE r9: CC/X/P bits and PT filtering must not be assumed zero):
  * `csrcCount` emits that many CSRC words, `withExtension` adds a
  * one-word header extension, `padBytes` pads each packet (P bit set),
  * `decoyPt` interleaves a non-JPEG packet before every frame, and
  * `tsBase` offsets the 90 kHz clock so it can wrap mid-stream. */
final class RtspTestServer(frames: Seq[Array[Byte]], fps: Int = 25,
                           fragmentSize: Int = 700,
                           dropAfter: Int = Int.MaxValue,
                           interFrameDelayMs: Long = 0L,
                           csrcCount: Int = 0,
                           withExtension: Boolean = false,
                           padBytes: Int = 0,
                           decoyPt: Option[Int] = None,
                           tsBase: Long = 0L) {
  private val server = new ServerSocket()
  server.bind(new InetSocketAddress("127.0.0.1", 0))
  val port: Int = server.getLocalPort
  def url = s"rtsp://127.0.0.1:$port/cam"
  val sessionsServed = new AtomicInteger(0)

  @volatile private var running = true
  private val acceptor = new Thread(() => {
    try while (running) serve(server.accept())
    catch { case _: java.io.IOException => } // closed
  }, s"rtsp-test-server-$port")
  acceptor.setDaemon(true)
  acceptor.start()

  private def serve(sock: Socket): Unit = {
    val t = new Thread(() => {
      val in = new java.io.BufferedInputStream(sock.getInputStream)
      val out = new java.io.BufferedOutputStream(sock.getOutputStream)
      def readLine(): String = {
        val sb = new StringBuilder
        var c = in.read()
        while (c != -1 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
        sb.toString
      }
      def respond(cseq: String, extra: Seq[String] = Nil, body: String = ""): Unit = {
        val bodyBytes = body.getBytes("US-ASCII")
        val head = Seq(s"RTSP/1.0 200 OK", s"CSeq: $cseq") ++ extra ++
          (if (bodyBytes.nonEmpty)
            Seq("Content-Type: application/sdp", s"Content-Length: ${bodyBytes.length}")
          else Nil)
        out.write(head.mkString("", "\r\n", "\r\n\r\n").getBytes("US-ASCII"))
        out.write(bodyBytes)
        out.flush()
      }
      try {
        var playing = false
        var open = true
        while (open && !playing) {
          val requestLine = readLine()
          if (requestLine.isEmpty) open = false
          else {
            val method = requestLine.takeWhile(_ != ' ')
            var cseq = "0"
            var line = readLine()
            while (line.nonEmpty) {
              if (line.toLowerCase.startsWith("cseq:")) cseq = line.drop(5).trim
              line = readLine()
            }
            method match {
              case "OPTIONS" =>
                respond(cseq, Seq("Public: OPTIONS, DESCRIBE, SETUP, PLAY, TEARDOWN"))
              case "DESCRIBE" =>
                respond(cseq, body =
                  "v=0\r\no=- 0 0 IN IP4 127.0.0.1\r\ns=graft test cam\r\n" +
                  "m=video 0 RTP/AVP 26\r\na=control:track1\r\n")
              case "SETUP" =>
                respond(cseq, Seq("Session: 4242",
                  "Transport: RTP/AVP/TCP;unicast;interleaved=0-1"))
              case "PLAY" =>
                respond(cseq, Seq("Session: 4242"))
                playing = true
              case "TEARDOWN" =>
                respond(cseq); open = false
              case _ => respond(cseq)
            }
          }
        }
        if (playing) {
          sessionsServed.incrementAndGet()
          var seq = 0
          // builds a wire RTP packet honoring the variation knobs:
          // CSRC list after the fixed header, optional one-word header
          // extension, optional padding (P bit + count in last octet)
          def writeRtp(pt: Int, marker: Boolean, ts: Long,
                       payload: Array[Byte], pOff: Int, pLen: Int): Unit = {
            val extBytes = if (withExtension) 8 else 0 // 4 head + 1 word
            val headLen = 12 + 4 * csrcCount + extBytes
            val pkt = new Array[Byte](headLen + pLen + padBytes)
            pkt(0) = (0x80 | (if (padBytes > 0) 0x20 else 0) |
              (if (withExtension) 0x10 else 0) | csrcCount).toByte
            pkt(1) = (pt | (if (marker) 0x80 else 0)).toByte
            pkt(2) = ((seq >> 8) & 0xff).toByte; pkt(3) = (seq & 0xff).toByte
            pkt(4) = ((ts >> 24) & 0xff).toByte; pkt(5) = ((ts >> 16) & 0xff).toByte
            pkt(6) = ((ts >> 8) & 0xff).toByte; pkt(7) = (ts & 0xff).toByte
            // ssrc pkt(8..11) = 0; CSRC words = 0xC5 filler the client
            // must skip, never parse as the RFC 2435 main header
            (0 until 4 * csrcCount).foreach(i => pkt(12 + i) = 0xc5.toByte)
            if (withExtension) {
              val e = 12 + 4 * csrcCount
              pkt(e) = 0xbe.toByte; pkt(e + 1) = 0xde.toByte // RFC 8285 magic
              pkt(e + 2) = 0; pkt(e + 3) = 1 // one 32-bit word follows
              pkt(e + 4) = 0xe1.toByte // filler the client must skip
            }
            System.arraycopy(payload, pOff, pkt, headLen, pLen)
            if (padBytes > 0) pkt(pkt.length - 1) = padBytes.toByte
            out.write(0x24); out.write(0) // '$', channel 0
            out.write((pkt.length >> 8) & 0xff); out.write(pkt.length & 0xff)
            out.write(pkt)
            out.flush()
            seq = (seq + 1) & 0xffff
          }
          val n = math.min(frames.length, dropAfter)
          (0 until n).foreach { f =>
            // RFC 2435 payloadization: strip the JPEG to quant + scan,
            // fragment the SCAN; every fragment leads with the 8-byte
            // main header, the first adds the quant-table extension
            val p = graft.multimodal.JpegRtp.parse(frames(f)).getOrElse(
              throw new IllegalArgumentException(
                s"test frame $f is not RFC 2435 representable"))
            val ts = (tsBase + f.toLong * 90000L / fps) & 0xffffffffL
            // a standards-compliant sender may mux other payload types
            // on the same channel — the client must skip, not misparse
            decoyPt.foreach { dpt =>
              writeRtp(dpt, marker = true, ts, Array.fill[Byte](24)(0x7a), 0, 24)
            }
            var off = 0
            while (off < p.scan.length) {
              val len = math.min(fragmentSize, p.scan.length - off)
              val last = off + len >= p.scan.length
              val hdr = graft.multimodal.JpegRtp.payloadHeader(
                off, p.typ, p.width, p.height,
                if (off == 0) Some(p.quant) else None)
              val body = new Array[Byte](hdr.length + len)
              System.arraycopy(hdr, 0, body, 0, hdr.length)
              System.arraycopy(p.scan, off, body, hdr.length, len)
              writeRtp(26, last, ts, body, 0, body.length)
              off += len
            }
            if (interFrameDelayMs > 0) Thread.sleep(interFrameDelayMs)
          }
        }
      } catch { case _: java.io.IOException => }
      finally { try sock.close() catch { case _: java.io.IOException => } }
    }, s"rtsp-test-session-$port")
    t.setDaemon(true)
    t.start()
  }

  def close(): Unit = {
    running = false
    try server.close() catch { case _: java.io.IOException => }
  }
}
