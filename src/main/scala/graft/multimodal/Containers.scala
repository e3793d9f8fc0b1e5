package graft.multimodal

/** Extension-keyed dispatch over the container codecs ([[AviCodec]] for
  * RIFF/AVI, [[Mp4Codec]] for ISO-BMFF) — the single place the
  * `graft-frames` connector asks "what can I scan and how", mirroring
  * the reference's one `VideoCapture` facade over every container
  * (`frame_reader.py:116-155`). Both codecs share the (offset, size)
  * frame identity, so the reader's positioned-read path is
  * format-agnostic past this dispatch. */
object Containers {
  import AviCodec.{AviMeta, FrameChunk}

  /** Container extensions the connector's directory listing admits. */
  val Extensions: Set[String] = Set("avi", "mp4", "m4v", "mov")

  def isContainer(path: String): Boolean =
    Extensions.contains(ext(path))

  private def ext(path: String): String = {
    val name = path.toLowerCase
    val dot = name.lastIndexOf('.')
    if (dot < 0) "" else name.substring(dot + 1)
  }

  private def isBmff(path: String): Boolean = ext(path) match {
    case "mp4" | "m4v" | "mov" => true
    case _ => false
  }

  /** Codec fourccs whose samples this engine pixel-decodes pure-JVM
    * (ImageIO JPEG, raw DIB). Everything else — notably `avc1`
    * (H.264), which needs a native decoder — is METADATA-ONLY: probe,
    * frame index, and stream-copy all work, and the pixel face skips
    * the file in corpus scans (one undecodable container must not end
    * a 100k-file scan). */
  val PixelDecodable: Set[String] = Set("MJPG", "DIB", "jpeg")

  def isPixelDecodable(codec: String): Boolean = PixelDecodable.contains(codec)

  /** Container-metadata probe (`frame_reader.py:129-131`). */
  def probe(path: String): AviMeta =
    if (isBmff(path)) Mp4Codec.probe(path) else AviCodec.probe(path)

  /** [[probe]] through the shared per-JVM cache keyed by (length,
    * mtime): the connector probes at plan time AND on every reader's
    * file bind, so a corpus scan would otherwise re-read each header
    * once per partition-crossing (VERDICT r7 wart 3). Entries
    * invalidate when the file is rewritten (size or mtime moves);
    * metadata is ~100 bytes per container, so even a million-file
    * corpus stays bounded — unlike re-probing, which costs a
    * filesystem round-trip per bind. */
  def probeCached(path: String): AviMeta = {
    val f = new java.io.File(path)
    val sig = (f.length, f.lastModified)
    val hit = cache.get(path)
    if (hit != null && hit._1 == sig) hit._2
    else {
      val m = probe(path)
      cache.put(path, (sig, m))
      m
    }
  }
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, ((Long, Long), AviMeta)]()

  /** Byte range of every frame, header-only (movi walk / stbl expand). */
  def frameIndex(path: String): Array[FrameChunk] =
    if (isBmff(path)) Mp4Codec.frameIndex(path) else AviCodec.frameIndex(path)

  /** U2's stream-copy segment split, format-dispatched: frames
    * [start, end) of `src` copy bit-faithfully into `dst` in the
    * SOURCE's format (the destination extension is informative; a
    * cross-format copy would be a transcode, which stream copy is
    * not). */
  def copySegment(src: String, dst: String, start: Int, end: Int): Unit =
    if (isBmff(src)) Mp4Codec.copySegment(src, dst, start, end)
    else AviCodec.copySegment(src, dst, start, end)
}
