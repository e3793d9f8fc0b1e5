package graft.operators

/** Audio fingerprinting for AUDIO-level near-dup detection — q92's
  * kernel, the acoustic sibling of [[FrameHash]]. The classic
  * energy-delta scheme (the simplified Shazam/Chromaprint shape):
  * windowed energies, one bit per adjacent-window energy comparison,
  * bits packed per block with the block index — so a recording's
  * fingerprint is a SET of small integers, and near-dup detection is
  * the same signature-set pipeline every other modality uses
  * (shared-element equi-join candidates → Jaccard).
  *
  * Integer end to end (sum of squares over exact PCM samples), which
  * is what lets the q92 oracle replay it closed-form, and makes the
  * fingerprint invariant to the CONTAINER (the same samples decoded
  * from a 16-bit mono WAV and re-muxed anywhere fingerprint
  * identically — spec'd). Amplitude scaling preserves every
  * comparison BIT; the anchored element (see [[fingerprint]]) is
  * amplitude-sensitive by design — the price of keeping candidate
  * buckets at duplicate-group size on a large corpus. */
object AudioFingerprint {

  /** Windowed energies: element w = Σ s² over samples [w·window,
    * (w+1)·window). Trailing partial windows are dropped (both engines
    * must agree on the boundary). */
  def energies(samples: Array[Int], window: Int): Array[Long] = {
    require(window > 0, "window must be positive")
    val n = samples.length / window
    val out = new Array[Long](n)
    var w = 0
    while (w < n) {
      var acc = 0L
      var i = w * window
      val end = i + window
      while (i < end) { acc += samples(i).toLong * samples(i); i += 1 }
      out(w) = acc
      w += 1
    }
    out
  }

  /** Fingerprint elements: blocks of `blockWindows` consecutive
    * windows; within block b, bit k (0-based, k < blockWindows-1) is
    * set when energy[b·bw + k + 1] > energy[b·bw + k]; the element is
    * `b·256 + bits + (anchorEnergy mod 999983)·2048` where the anchor
    * is the block's first window. The anchor term matters at corpus
    * scale: bits alone span 2048 values, so candidate buckets would
    * fill with unrelated recordings; anchored elements scatter across
    * ~2·10⁹ values while identical audio (same energies) still yields
    * identical sets. */
  def fingerprint(samples: Array[Int], window: Int = 50,
                  blockWindows: Int = 9): Array[Long] = {
    val e = energies(samples, window)
    val nBlocks = e.length / blockWindows
    val out = new Array[Long](nBlocks)
    var b = 0
    while (b < nBlocks) {
      var bits = 0L
      var k = 0
      while (k < blockWindows - 1) {
        if (e(b * blockWindows + k + 1) > e(b * blockWindows + k)) bits |= 1L << k
        k += 1
      }
      out(b) = b.toLong * 256L + bits + (e(b * blockWindows) % 999983L) * 2048L
      b += 1
    }
    out
  }
}
