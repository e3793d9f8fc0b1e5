package graft

import graft.operators.LetterboxKernel

/** Micro-benchmark for the letterbox pixel kernel — the one sanctioned
  * scalar UDF in the hot path (SURVEY.md §2.5). Measures single-thread
  * throughput over realistic frame geometries so the kernel's cost has a
  * number beside its correctness specs: at N MB/s per core, a 32-core
  * executor letterboxes ~32N MB/s of decoded video, which bounds where
  * the pipeline is kernel-bound vs IO/shuffle-bound at cluster scale.
  *
  * Run: sbt "runMain graft.KernelBench"
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val cases = Seq(
      ("1920x1080->640", 1920, 1080),
      ("1280x720->640", 1280, 720),
      ("640x480->640", 640, 480))
    val target = 640
    val reps = 3
    for ((label, w, h) <- cases) {
      val src = Array.tabulate(w * h)(i => (i % 256 - 128).toByte)
      // warm-up: let C2 compile the while loops before timing
      var k = 0
      while (k < 50) { LetterboxKernel.letterbox(src, w, h, target); k += 1 }
      val iters = math.max(100, (512 << 20) / src.length) // ~512 MB of input
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        var i = 0
        while (i < iters) {
          LetterboxKernel.letterbox(src, w, h, target)
          i += 1
        }
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      val mbIn = iters.toLong * src.length / (1024.0 * 1024.0)
      val fps = iters / best
      println(f"[kernel] $label%-18s ${mbIn / best}%8.1f MB/s  $fps%9.0f frames/s  (best of $reps, $iters iters)")
    }
  }
}
