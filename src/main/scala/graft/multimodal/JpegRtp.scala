package graft.multimodal

import javax.imageio.plugins.jpeg.JPEGHuffmanTable

/** RFC 2435 (RTP payload format for JPEG video) — the codec half the
  * `graft-rtsp` source and its test server speak on the wire. Real
  * MJPEG cameras do not ship whole JFIF files per frame: the sender
  * STRIPS the JPEG to its entropy-coded scan plus quantization tables,
  * and the receiver RECONSTRUCTS a decodable JPEG from the 8-byte
  * RTP/JPEG header (type, Q, dims) + the tables + the scan, using the
  * STANDARD Huffman tables from the JPEG spec (Annex K — exposed by
  * the JDK as [[JPEGHuffmanTable]] constants, so none are hand-typed
  * here).
  *
  * Representable inputs (everything a baseline MJPEG camera emits):
  * 8-bit baseline SOF0, YCbCr 4:2:0 (RFC type 1) or 4:2:2 (type 0),
  * standard Huffman tables, dimensions multiples of 8 up to 2040, no
  * restart intervals. [[parse]] returns None for anything else and the
  * sender falls back to refusing the frame — loud, never silently
  * undecodable.
  *
  * Fidelity: reconstruction preserves the quant tables and scan bytes
  * exactly and rebuilds only the structural headers, so the DECODED
  * PIXELS are bit-identical to decoding the original JPEG (the specs
  * assert exactly that through the full RTSP loop). */
object JpegRtp {

  /** A JPEG reduced to its RFC 2435 wire content. `quant` is the two
    * 64-byte tables (luma ++ chroma) in stored zigzag order. */
  final case class Parsed(typ: Int, width: Int, height: Int,
                          quant: Array[Byte], scan: Array[Byte])

  // ---- standard Huffman tables, serialized once as DHT payload bytes
  private def tableBytes(classId: Int, t: JPEGHuffmanTable): Array[Byte] = {
    val lengths = t.getLengths // counts per code length 1..16
    val values = t.getValues
    val out = new Array[Byte](1 + 16 + values.length)
    out(0) = classId.toByte
    var i = 0
    while (i < 16) { out(1 + i) = lengths(i).toByte; i += 1 }
    i = 0
    while (i < values.length) { out(17 + i) = values(i).toByte; i += 1 }
    out
  }

  /** (class<<4|id) → standard table payload, for sender-side equality
    * checks. */
  private val StandardTables: Map[Int, Array[Byte]] = Map(
    0x00 -> tableBytes(0x00, JPEGHuffmanTable.StdDCLuminance),
    0x01 -> tableBytes(0x01, JPEGHuffmanTable.StdDCChrominance),
    0x10 -> tableBytes(0x10, JPEGHuffmanTable.StdACLuminance),
    0x11 -> tableBytes(0x11, JPEGHuffmanTable.StdACChrominance))

  /** One DHT segment holding all four standard tables, as the receiver
    * writes it into reconstructed frames. */
  private val StandardDht: Array[Byte] = {
    val payload = Seq(0x00, 0x10, 0x01, 0x11).flatMap(id => StandardTables(id))
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xc4)
    val len = payload.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    payload.foreach(b => out.write(b & 0xff))
    out.toByteArray
  }

  // ------------------------------------------------------------- parse

  /** Strips a baseline JFIF to RFC 2435 wire content; None when the
    * frame is not representable in the payload format. */
  def parse(jpeg: Array[Byte]): Option[Parsed] = {
    if (jpeg.length < 4 || (jpeg(0) & 0xff) != 0xff || (jpeg(1) & 0xff) != 0xd8)
      return None
    if ((jpeg(jpeg.length - 2) & 0xff) != 0xff || (jpeg(jpeg.length - 1) & 0xff) != 0xd9)
      return None
    val quant = new Array[Byte](128)
    var sawQ0 = false
    var sawQ1 = false
    var typ = -1
    var width = 0
    var height = 0
    var huffmanStandard = true
    var i = 2
    while (i + 4 <= jpeg.length) {
      if ((jpeg(i) & 0xff) != 0xff) return None
      val marker = jpeg(i + 1) & 0xff
      val len = ((jpeg(i + 2) & 0xff) << 8) | (jpeg(i + 3) & 0xff)
      val seg = i + 4
      val segEnd = i + 2 + len
      marker match {
        case 0xdb => // DQT: one or more (PqTq + 64) entries
          var p = seg
          while (p < segEnd) {
            val pq = (jpeg(p) & 0xf0) >> 4
            val tq = jpeg(p) & 0x0f
            if (pq != 0 || tq > 1) return None // 8-bit tables 0/1 only
            System.arraycopy(jpeg, p + 1, quant, tq * 64, 64)
            if (tq == 0) sawQ0 = true else sawQ1 = true
            p += 65
          }
        case 0xc0 => // baseline SOF
          if ((jpeg(seg) & 0xff) != 8) return None
          height = ((jpeg(seg + 1) & 0xff) << 8) | (jpeg(seg + 2) & 0xff)
          width = ((jpeg(seg + 3) & 0xff) << 8) | (jpeg(seg + 4) & 0xff)
          if ((jpeg(seg + 5) & 0xff) != 3) return None
          val sampY = jpeg(seg + 7) & 0xff
          val sampCb = jpeg(seg + 10) & 0xff
          val sampCr = jpeg(seg + 13) & 0xff
          if (sampCb != 0x11 || sampCr != 0x11) return None
          typ = sampY match {
            case 0x21 => 0 // 4:2:2
            case 0x22 => 1 // 4:2:0
            case _ => return None
          }
          if (width % 8 != 0 || height % 8 != 0 || width > 2040 || height > 2040)
            return None
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
             0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // extended/progressive/lossless — not baseline
        case 0xc4 => // DHT: must equal the standard tables
          var p = seg
          while (p < segEnd) {
            val classId = jpeg(p) & 0xff
            var total = 0
            var k = 1
            while (k <= 16) { total += jpeg(p + k) & 0xff; k += 1 }
            val tbl = java.util.Arrays.copyOfRange(jpeg, p, p + 17 + total)
            if (!StandardTables.get(classId).exists(java.util.Arrays.equals(_, tbl)))
              huffmanStandard = false
            p += 17 + total
          }
        case 0xdd => return None // DRI: restart markers need the RST extension
        case 0xda => // SOS: scan runs to the trailing EOI
          if (typ < 0 || !sawQ0 || !sawQ1 || !huffmanStandard) return None
          val scan = java.util.Arrays.copyOfRange(jpeg, segEnd, jpeg.length - 2)
          return Some(Parsed(typ, width, height, quant, scan))
        case _ => // APP0/COM/etc: structural only, dropped by the format
      }
      i = segEnd
    }
    None
  }

  // ------------------------------------------------------- reconstruct

  /** Rebuilds a decodable JPEG from wire content — the RFC 2435 §4.2
    * receiver-side MakeHeaders, with the JDK's standard tables. */
  def reconstruct(typ: Int, width: Int, height: Int,
                  quant: Array[Byte], scan: Array[Byte]): Array[Byte] = {
    require(typ == 0 || typ == 1, s"RFC 2435 base type must be 0|1, got $typ")
    require(quant.length == 128, s"need two 64-byte quant tables, got ${quant.length}")
    val out = new java.io.ByteArrayOutputStream(scan.length + 512)
    def b(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { b(v >> 8); b(v) }
    b(0xff); b(0xd8) // SOI
    (0 until 2).foreach { tq => // DQT per table
      b(0xff); b(0xdb); u16(67); b(tq)
      out.write(quant, tq * 64, 64)
    }
    b(0xff); b(0xc0); u16(17); b(8) // SOF0, 8-bit precision
    u16(height); u16(width); b(3)
    b(1); b(if (typ == 1) 0x22 else 0x21); b(0) // Y
    b(2); b(0x11); b(1) // Cb
    b(3); b(0x11); b(1) // Cr
    out.write(StandardDht)
    b(0xff); b(0xda); u16(12); b(3) // SOS
    b(1); b(0x00); b(2); b(0x11); b(3); b(0x11)
    b(0); b(63); b(0) // Ss, Se, AhAl
    out.write(scan)
    b(0xff); b(0xd9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------- RTP packetization

  /** RFC 2435 main header (8 bytes) + optional quant-table header for
    * the first fragment (Q=255: tables explicit in-band). */
  def payloadHeader(fragmentOffset: Int, typ: Int, width: Int, height: Int,
                    quant: Option[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(8 + 4 + 128)
    out.write(0) // type-specific
    out.write((fragmentOffset >> 16) & 0xff)
    out.write((fragmentOffset >> 8) & 0xff)
    out.write(fragmentOffset & 0xff)
    out.write(typ)
    out.write(255) // Q: explicit tables
    out.write(width / 8)
    out.write(height / 8)
    quant.foreach { q =>
      out.write(0) // MBZ
      out.write(0) // precision: 8-bit
      out.write((q.length >> 8) & 0xff); out.write(q.length & 0xff)
      out.write(q, 0, q.length)
    }
    out.toByteArray
  }
}
