package graft.operators

/** The pixel-level letterbox kernel — the ONE genuinely opaque per-row
  * computation in the reference's hot path (`frame_processing.py:41-50`:
  * `cv2.resize` + `copyMakeBorder`), here as nearest-neighbor resample +
  * pad over a grayscale byte buffer. Geometry (scale/dims/pads) follows
  * [[Letterbox]] exactly, so the relational geometry columns (q03) and
  * the kernel agree by construction.
  *
  * Runs as a scalar function over `BinaryType` (SURVEY.md §2.5 — the only
  * sanctioned UDF class); everything around it stays native Catalyst.
  */
object LetterboxKernel {

  /** @param src   grayscale row-major bytes, length = srcW * srcH
    * @param target output square side
    * @return target*target bytes, image centered, pad = 0 (black),
    *         spare pad pixel bottom/right per the reference */
  def letterbox(src: Array[Byte], srcW: Int, srcH: Int, target: Int): Array[Byte] =
    letterbox(src, srcW, srcH, target, 1)

  /** Channels-aware form: `src` is row-major INTERLEAVED (e.g. BGR from
    * [[graft.multimodal.ImageCodec]], channels = 3 — `cv2.imread`'s
    * layout, which is exactly what the reference letterboxes). Geometry
    * is per-pixel and identical across channels; output is
    * target × target × channels, pad = 0 in every channel. */
  def letterbox(src: Array[Byte], srcW: Int, srcH: Int, target: Int,
                channels: Int): Array[Byte] = {
    require(channels >= 1, s"channels must be >= 1, got $channels")
    require(src.length >= srcW * srcH * channels,
      s"payload ${src.length} < ${srcW}x$srcH x$channels")
    val scale = math.min(target.toDouble / srcW, target.toDouble / srcH)
    // int() truncation as the reference, clamped to >= 1: beyond a
    // target:1 aspect ratio the truncated dim would hit 0 and erase the
    // image (cv2.resize requires positive dsize and would throw; the
    // reference's error path then passes the frame through unresized —
    // frame_processing.py:53-57. A 1-pixel strip is the faithful-er
    // degradation for an analytics pipeline).
    val newW = math.max(1, (srcW * scale).toInt)
    val newH = math.max(1, (srcH * scale).toInt)
    val padTop = (target - newH) / 2
    val padLeft = (target - newW) / 2

    val out = new Array[Byte](target * target * channels) // zero-init = black pad
    var y = 0
    while (y < newH) {
      val srcY = math.min(srcH - 1, (y / scale).toInt)
      val srcRow = srcY * srcW
      val outRow = (y + padTop) * target + padLeft
      var x = 0
      while (x < newW) {
        val si = (srcRow + math.min(srcW - 1, (x / scale).toInt)) * channels
        val oi = (outRow + x) * channels
        var c = 0
        while (c < channels) {
          out(oi + c) = src(si + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }
}
