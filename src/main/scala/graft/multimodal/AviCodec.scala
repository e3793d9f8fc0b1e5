package graft.multimodal

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream, RandomAccessFile}

/** Pure-JVM MJPEG/AVI container codec — the real bounded-video decode
  * path behind the S2 `VideoReader` slot (VERDICT r6 item 2;
  * `/root/reference/uav/frame_reader.py:116-155`: container-metadata
  * probe for fps/width/height/frame-count, then sequential decode,
  * release on EOF). No external codec libraries: AVI is a RIFF chunk
  * container, MJPEG frames are ordinary JPEGs, and the JDK decodes JPEG
  * via ImageIO ([[ImageCodec]]) — so an MJPEG/AVI file is fully
  * decodable with zero dependencies.
  *
  * Layout handled (the canonical AVI shape):
  * {{{
  * RIFF('AVI '
  *   LIST('hdrl' avih(MainAVIHeader) LIST('strl' strh strf))
  *   LIST('movi' 00dc(jpeg) 00dc(jpeg) ...)
  *   idx1(...))
  * }}}
  *
  * The reader indexes frames by WALKING the movi list's chunk headers
  * (seek-skipping the payloads — O(frames) header reads, no frame data
  * touched), not by trusting `idx1`: the idx1 offset base is ambiguous
  * in the wild (some muxers write movi-relative, some absolute), while
  * the chunk walk is self-describing. Probe metadata comes from `avih`
  * (width/height/frame count) and `strh` (fps = dwRate/dwScale — exact,
  * where avih's µs-per-frame is a rounded derivative).
  *
  * Scale shape: [[frameIndex]] is a header-only pass run once per
  * partition reader; frame reads are then independent positioned reads,
  * so N readers decode N slices of one container in parallel (the
  * DataSourceV2 face, [[graft.sources.v2.FrameSource]]). A 100 TB video
  * corpus is many containers; each container's scan parallelizes across
  * its frame ranges and containers parallelize across files.
  */
object AviCodec {

  /** Container metadata, the `cv2.CAP_PROP_*` probe set
    * (`frame_reader.py:129-131`): exact fps as dwRate/dwScale. */
  final case class AviMeta(width: Int, height: Int, fps: Double, nFrames: Long,
                           handler: String)

  /** One video frame's bytes inside the container: absolute file offset
    * of the DATA (past the 8-byte chunk header) and its size. */
  final case class FrameChunk(offset: Long, size: Int)

  // ---------------------------------------------------------------- read

  private def u16(raf: RandomAccessFile): Int = {
    val a = raf.read(); val b = raf.read()
    if ((a | b) < 0) throw new java.io.EOFException()
    a | (b << 8)
  }

  private def u32(raf: RandomAccessFile): Long = {
    val a = u16(raf).toLong; val b = u16(raf).toLong
    a | (b << 16)
  }

  private def fourcc(raf: RandomAccessFile): String = {
    val b = new Array[Byte](4)
    raf.readFully(b)
    new String(b, "US-ASCII")
  }

  private def withRaf[T](path: String)(f: RandomAccessFile => T): T = {
    val raf = new RandomAccessFile(path, "r")
    try f(raf) finally raf.close()
  }

  /** Parsed header state accumulated during the top-level walk. */
  private final case class Parsed(meta: AviMeta, moviDataStart: Long, moviDataEnd: Long)

  /** One pass over the top-level chunk headers: avih + first video strh
    * for metadata, movi extent for the frame walk. Throws on anything
    * that is not a RIFF/AVI container (the caller maps that to
    * unreadable, like `cv2.VideoCapture.isOpened() == False`). */
  private def parseHeaders(raf: RandomAccessFile): Parsed = {
    require(fourcc(raf) == "RIFF", "not a RIFF container")
    u32(raf) // riff payload size; the file length bounds the walk instead
    require(fourcc(raf) == "AVI ", "RIFF container is not AVI")
    val fileEnd = raf.length()

    var width = 0
    var height = 0
    var nFrames = 0L
    var usPerFrame = 0L
    var rate = 0L
    var scale = 0L
    var handler = ""
    var sawVids = false
    var moviStart = -1L
    var moviEnd = -1L

    // walk chunks in [pos, end); LIST children recurse one level at a time
    def walk(end: Long): Unit = {
      while (raf.getFilePointer + 8 <= end) {
        val id = fourcc(raf)
        val size = u32(raf)
        val dataStart = raf.getFilePointer
        val next = dataStart + size + (size & 1) // chunks are even-padded
        id match {
          case "LIST" =>
            val listType = fourcc(raf)
            listType match {
              case "hdrl" | "strl" => walk(dataStart + size)
              case "movi" =>
                moviStart = dataStart + 4 // past the 'movi' fourcc
                moviEnd = dataStart + size
              case _ => // skip unknown lists (INFO etc.)
            }
          case "avih" =>
            usPerFrame = u32(raf); u32(raf); u32(raf); u32(raf)
            nFrames = u32(raf); u32(raf); u32(raf); u32(raf)
            width = u32(raf).toInt
            height = u32(raf).toInt
          case "strh" =>
            val fccType = fourcc(raf)
            val fccHandler = fourcc(raf)
            if (fccType == "vids" && !sawVids) {
              sawVids = true
              handler = fccHandler.trim
              u32(raf); u16(raf); u16(raf); u32(raf) // flags, prio+lang, initialFrames
              scale = u32(raf)
              rate = u32(raf)
              u32(raf) // start
              val streamLen = u32(raf)
              // stream length is the per-stream frame count; prefer it if
              // avih's total is zero (some muxers leave avih sparse)
              if (nFrames == 0L) nFrames = streamLen
            }
          case _ => // skip (strf parsed implicitly via avih dims; JUNK etc.)
        }
        raf.seek(math.min(next, fileEnd))
      }
    }
    walk(fileEnd)

    require(moviStart >= 0, "AVI has no movi list")
    val fps =
      if (scale > 0 && rate > 0) rate.toDouble / scale.toDouble
      else if (usPerFrame > 0) 1e6 / usPerFrame
      else 30.0
    Parsed(AviMeta(width, height, fps, nFrames, handler), moviStart, moviEnd)
  }

  /** Container-metadata probe — the `frame_reader.py:129-131` call set. */
  def probe(path: String): AviMeta = withRaf(path)(r => parseHeaders(r).meta)

  // (the per-JVM probe cache lives in [[Containers.probeCached]], the
  // format dispatcher the connector binds through)

  /** Positions of every video frame chunk (`NNdc`/`NNdb`), in stream
    * order, by walking the movi list's chunk HEADERS (payloads are
    * seek-skipped — this pass reads 8 bytes per chunk, never the frame
    * data). */
  def frameIndex(path: String): Array[FrameChunk] = withRaf(path) { raf =>
    val p = parseHeaders(raf)
    val out = Array.newBuilder[FrameChunk]
    raf.seek(p.moviDataStart)
    while (raf.getFilePointer + 8 <= p.moviDataEnd) {
      val id = fourcc(raf)
      val size = u32(raf)
      val dataStart = raf.getFilePointer
      // video data chunks: '##dc' (compressed) / '##db' (uncompressed),
      // stream number in the digit prefix. Interleaved muxers group
      // chunks inside 'rec ' LISTs — DESCEND (skip only the 4-byte list
      // type; the children then walk in this same loop) instead of
      // seeking past the group, or every frame inside it is lost.
      // Other chunk kinds (audio '##wb', padding 'JUNK', ...) skip.
      if (id == "LIST") {
        fourcc(raf) // list type ('rec ' or other) — children walk next
      } else {
        if (id.matches("[0-9]{2}(dc|db)"))
          out += FrameChunk(dataStart, size.toInt)
        raf.seek(dataStart + size + (size & 1))
      }
    }
    out.result()
  }

  /** The raw (still-encoded) bytes of one frame chunk — a positioned
    * read; independent calls on independent handles parallelize. */
  def readFrameBytes(raf: RandomAccessFile, chunk: FrameChunk): Array[Byte] = {
    val b = new Array[Byte](chunk.size)
    raf.seek(chunk.offset)
    raf.readFully(b)
    b
  }

  /** Decode one frame to interleaved BGR via the production
    * [[ImageCodec]] path — byte-identical to decoding the same JPEG from
    * an image directory, which is what makes the S1/S2 paths
    * cross-checkable. None = undecodable frame (`cap.read() → False`). */
  def decodeFrame(raf: RandomAccessFile, chunk: FrameChunk): Option[ImageCodec.DecodedImage] =
    ImageCodec.decode(readFrameBytes(raf, chunk))

  /** Decode with container-dims fallback: MJPEG chunks go through
    * ImageIO; a chunk that ImageIO rejects but whose size is exactly one
    * uncompressed DIB frame (BI_RGB bottom-up BGR rows, 4-byte row
    * stride — the '00db' convention) is unpacked raw. Raw frames make
    * the WRITE side lossless: what [[graft.multimodal.VideoSink]] muxes
    * with `codec = "raw"` reads back byte-identical, no JPEG loss. */
  def decodeFrameWithMeta(raf: RandomAccessFile, chunk: FrameChunk,
                          meta: AviMeta): Option[ImageCodec.DecodedImage] = {
    val bytes = readFrameBytes(raf, chunk)
    ImageCodec.decode(bytes).orElse(decodeDib(bytes, meta.width, meta.height))
  }

  /** Unpack one BI_RGB device-independent bitmap frame: rows are stored
    * BOTTOM-UP, each padded to a 4-byte boundary, pixels already
    * interleaved BGR (the DIB wire format IS cv2's memory format, which
    * is why raw AVI round-trips are exact). None when the byte count
    * isn't exactly h padded rows. */
  def decodeDib(bytes: Array[Byte], w: Int, h: Int): Option[ImageCodec.DecodedImage] = {
    if (w <= 0 || h <= 0) return None
    val stride = (w * 3 + 3) & ~3
    if (bytes.length != stride.toLong * h) return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      // stored row y is image row (h-1-y)
      System.arraycopy(bytes, y * stride, out, (h - 1 - y) * w * 3, w * 3)
      y += 1
    }
    Some(ImageCodec.DecodedImage(w, h, out))
  }

  /** Pack interleaved BGR pixels as one BI_RGB DIB frame (inverse of
    * [[decodeDib]]): bottom-up rows, 4-byte stride pad. */
  def encodeDib(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h * 3, s"need $w x $h x 3 BGR bytes, got ${pixels.length}")
    val stride = (w * 3 + 3) & ~3
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      System.arraycopy(pixels, (h - 1 - y) * w * 3, out, y * stride, w * 3)
      y += 1
    }
    out
  }

  // --------------------------------------------------------------- write

  private def le16(o: DataOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def le32(o: DataOutputStream, v: Long): Unit = {
    o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
    o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
  }
  private def tag(o: DataOutputStream, s: String): Unit =
    o.write(s.getBytes("US-ASCII"))

  /** Writes an MJPEG/AVI container from ALREADY-ENCODED JPEG frames —
    * a stream-copy mux (`ffmpeg -c copy` semantics): no transcode, so
    * splitting and reassembling containers round-trips the exact frame
    * bytes, the property U2's reassembly check relies on. Emits the
    * canonical hdrl/movi/idx1 shape (idx1 written movi-relative for
    * player compatibility; our own reader walks movi and ignores it). */
  def writeMjpeg(path: String, jpegFrames: Seq[Array[Byte]],
                 width: Int, height: Int, fps: Int): Unit =
    writeContainer(path, jpegFrames, width, height, fps, raw = false)

  /** Writes an UNCOMPRESSED (BI_RGB) AVI from interleaved-BGR frames —
    * the lossless sink codec: every pixel byte survives the container
    * round-trip exactly ('00db' chunks, biCompression 0). Trades bytes
    * for exactness; the MJPEG variant trades the other way. */
  def writeRawBgr(path: String, bgrFrames: Seq[Array[Byte]],
                  width: Int, height: Int, fps: Int): Unit =
    writeContainer(path, bgrFrames.map(encodeDib(_, width, height)),
      width, height, fps, raw = true)

  /** Raw writer over ALREADY-PACKED DIB frames (callers that packed via
    * [[encodeDib]] themselves, e.g. [[VideoSink]]'s streaming drain). */
  def writeRawDib(path: String, dibFrames: Seq[Array[Byte]],
                  width: Int, height: Int, fps: Int): Unit =
    writeContainer(path, dibFrames, width, height, fps, raw = true)

  private def writeContainer(path: String, frames: Seq[Array[Byte]],
                             width: Int, height: Int, fps: Int, raw: Boolean): Unit = {
    require(fps > 0, "fps must be positive")
    val n = frames.length
    val chunkId = if (raw) "00db" else "00dc"
    val handler = if (raw) "DIB " else "MJPG"
    val padded = frames.map(f => f.length + (f.length & 1))
    val moviSize = 4 + padded.map(8L + _).sum // 'movi' + chunks
    val idx1Size = 16L * n
    val hdrlSize = 4 + (8 + 56) + (12 + (8 + 56) + (8 + 40)) // 'hdrl' avih strl(strh strf)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
    val maxFrame = if (n == 0) 0 else frames.map(_.length).max

    val o = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      tag(o, "RIFF"); le32(o, riffSize); tag(o, "AVI ")

      tag(o, "LIST"); le32(o, hdrlSize); tag(o, "hdrl")
      tag(o, "avih"); le32(o, 56)
      le32(o, 1000000L / fps)       // dwMicroSecPerFrame
      le32(o, maxFrame.toLong * fps) // dwMaxBytesPerSec
      le32(o, 0); le32(o, 0x10)     // padding, flags (AVIF_HASINDEX)
      le32(o, n)                    // dwTotalFrames
      le32(o, 0); le32(o, 1)        // initial frames, streams
      le32(o, maxFrame)             // suggested buffer
      le32(o, width); le32(o, height)
      (1 to 4).foreach(_ => le32(o, 0)) // reserved

      tag(o, "LIST"); le32(o, 4 + (8 + 56) + (8 + 40)); tag(o, "strl")
      tag(o, "strh"); le32(o, 56)
      tag(o, "vids"); tag(o, handler)
      le32(o, 0); le16(o, 0); le16(o, 0) // flags, priority, language
      le32(o, 0)                    // initial frames
      le32(o, 1); le32(o, fps)      // dwScale, dwRate → fps exact
      le32(o, 0); le32(o, n)        // start, length (frames)
      le32(o, maxFrame); le32(o, -1L & 0xffffffffL) // buffer, quality (-1 default)
      le32(o, 0)                    // sample size (0 = varies)
      le16(o, 0); le16(o, 0); le16(o, width); le16(o, height) // rcFrame

      tag(o, "strf"); le32(o, 40)
      le32(o, 40); le32(o, width); le32(o, height)
      le16(o, 1); le16(o, 24)       // planes, bitcount
      if (raw) le32(o, 0)           // biCompression: BI_RGB
      else tag(o, "MJPG")           // biCompression: MJPG fourcc
      le32(o, width.toLong * height * 3)
      le32(o, 0); le32(o, 0); le32(o, 0); le32(o, 0)

      tag(o, "LIST"); le32(o, moviSize); tag(o, "movi")
      frames.foreach { f =>
        tag(o, chunkId); le32(o, f.length)
        o.write(f)
        if ((f.length & 1) == 1) o.write(0)
      }

      tag(o, "idx1"); le32(o, idx1Size)
      var off = 4L // movi-relative: first chunk id sits 4 bytes past 'movi'
      frames.foreach { f =>
        tag(o, chunkId); le32(o, 0x10) // AVIIF_KEYFRAME (every frame is one)
        le32(o, off); le32(o, f.length)
        off += 8 + f.length + (f.length & 1)
      }
    } finally o.close()
  }

  /** Incremental AVI muxer: frames append one at a time, the container
    * finalizes on [[Muxer.close]] — constant memory regardless of video
    * length (the Seq-based writers above must hold every frame to
    * pre-compute chunk sizes; this writes size PLACEHOLDERS and patches
    * them at close, the standard muxer move, recording each patch
    * field's file position as it is written rather than trusting magic
    * offsets). A file abandoned before close() is not a valid RIFF —
    * exactly `cv2.VideoWriter`'s release() contract. */
  final class Muxer(path: String, width: Int, height: Int, fps: Int, raw: Boolean) {
    require(fps > 0, "fps must be positive")
    private val o = new RandomAccessFile(path, "rw")
    o.setLength(0)
    private val index = Array.newBuilder[(Long, Int)] // (movi-relative off, size)
    private var n = 0
    private var maxFrame = 0
    private val chunkId = if (raw) "00db" else "00dc"

    private def w32(v: Long): Unit = {
      o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
      o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
    }
    private def w16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
    private def tag4(s: String): Unit = o.write(s.getBytes("US-ASCII"))
    /** Writes a u32 placeholder and returns its position for patching. */
    private def hole(): Long = { val p = o.getFilePointer; w32(0); p }

    private val riffSizeAt = { tag4("RIFF"); hole() }
    tag4("AVI ")
    tag4("LIST"); w32(4 + (8 + 56) + (12 + (8 + 56) + (8 + 40))); tag4("hdrl")
    tag4("avih"); w32(56)
    w32(1000000L / fps)
    private val maxBpsAt = hole()
    w32(0); w32(0x10)
    private val totalFramesAt = hole()
    w32(0); w32(1)
    private val suggestedBufAt = hole()
    w32(width); w32(height)
    (1 to 4).foreach(_ => w32(0))
    tag4("LIST"); w32(4 + (8 + 56) + (8 + 40)); tag4("strl")
    tag4("strh"); w32(56)
    tag4("vids"); tag4(if (raw) "DIB " else "MJPG")
    w32(0); w16(0); w16(0)
    w32(0)
    w32(1); w32(fps)
    w32(0)
    private val streamLenAt = hole()
    private val strhBufAt = hole()
    w32(-1L & 0xffffffffL)
    w32(0)
    w16(0); w16(0); w16(width); w16(height)
    tag4("strf"); w32(40)
    w32(40); w32(width); w32(height)
    w16(1); w16(24)
    if (raw) w32(0) else tag4("MJPG")
    w32(width.toLong * height * 3)
    w32(0); w32(0); w32(0); w32(0)
    tag4("LIST")
    private val moviSizeAt = hole()
    private val moviFccAt = o.getFilePointer
    tag4("movi")

    /** Appends one frame: raw muxers take interleaved BGR (packed to DIB
      * here), MJPEG muxers take encoded JPEG bytes. */
    def addFrame(frame: Array[Byte]): Unit =
      addEncodedFrame(if (raw) encodeDib(frame, width, height) else frame)

    /** Appends bytes VERBATIM as one chunk — the stream-copy entry
      * point ([[copySegment]]): the caller already holds wire-format
      * frame data (JPEG or packed DIB) and no re-encode must happen. */
    def addEncodedFrame(bytes: Array[Byte]): Unit = {
      index += ((o.getFilePointer - moviFccAt, bytes.length))
      tag4(chunkId); w32(bytes.length)
      o.write(bytes)
      if ((bytes.length & 1) == 1) o.write(0)
      n += 1
      maxFrame = math.max(maxFrame, bytes.length)
    }

    /** Writes idx1, patches every size field, closes the file. */
    def close(): Unit = {
      val moviEnd = o.getFilePointer
      val idx = index.result()
      tag4("idx1"); w32(16L * n)
      idx.foreach { case (off, size) =>
        tag4(chunkId); w32(0x10); w32(off); w32(size)
      }
      val fileEnd = o.getFilePointer
      def patch(at: Long, v: Long): Unit = { o.seek(at); w32(v) }
      patch(riffSizeAt, fileEnd - 8)
      patch(maxBpsAt, maxFrame.toLong * fps)
      patch(totalFramesAt, n)
      patch(suggestedBufAt, maxFrame)
      patch(streamLenAt, n)
      patch(strhBufAt, maxFrame)
      // LIST size spans from the list-type fourcc (inclusive) to the
      // last chunk byte — moviFccAt is where 'movi' was written
      patch(moviSizeAt, moviEnd - moviFccAt)
      o.close()
    }
  }

  /** Container-level segment split WITHOUT transcoding (`ffmpeg -c copy`
    * of U2, `/root/reference/uav/video_splitter.py`): frames
    * [start, end) of `src` are stream-copied into a new container.
    * Because no re-encode happens, decoding the segment's frame i yields
    * byte-identical BGR to decoding frame start+i of the source. */
  def copySegment(src: String, dst: String, start: Int, end: Int): Unit = {
    val meta = probe(src)
    val idx = frameIndex(src)
    val lo = math.max(0, start)
    val hi = math.min(idx.length, end)
    // codec preserved: a raw (DIB) source's segments stay raw '00db'
    // containers, an MJPEG source's stay '00dc' — the copied bytes are
    // wire format either way, so the segment is bit-faithful per frame.
    // Streamed through the incremental muxer: one frame resident at a
    // time, segments of any length copy in constant memory.
    val m = new Muxer(dst, meta.width, meta.height,
      math.max(1, math.round(meta.fps).toInt), raw = meta.handler == "DIB")
    withRaf(src) { raf =>
      (lo until hi).foreach(i => m.addEncodedFrame(readFrameBytes(raf, idx(i))))
    }
    m.close()
  }
}
