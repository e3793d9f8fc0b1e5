package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Container-path throughput probe (VERDICT r7 item 7): the q85/q87
  * fixtures are 48 and 15 frames, so the codec's decode cost was on no
  * record. This muxes a configurable MJPEG corpus (default 200
  * containers × 50 frames = 10k frames at 64×48), then times
  *
  *  1. plan-time listing + probe (the driver-side planning cost a large
  *     directory pays — distributed past 64 files),
  *  2. a full-decode scan (`sum(length(payload))` forces every JPEG
  *     through ImageIO) at two partition widths, for per-core frames/s
  *     and the linearity check,
  *  3. a metadata-only scan (column pruning must make it payload-free).
  *
  * Run: sbt "runMain graft.CorpusProbe [nFiles framesPerFile w h]". */
object CorpusProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = if (args.length > 0) args(0).toInt else 200
    val perFile = if (args.length > 1) args(1).toInt else 50
    val w = if (args.length > 2) args(2).toInt else 64
    val h = if (args.length > 3) args(3).toInt else 48
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_probe")
    TempDirs.cleanupOnExit(dir)
    // distinct JPEG per frame so ImageIO can't shortcut; mux through the
    // same writer the sinks use
    println(s"[corpus] muxing $nFiles containers x $perFile frames at ${w}x$h ...")
    val tMux0 = System.nanoTime()
    (0 until nFiles).foreach { f =>
      val frames = (0 until perFile).map { i =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, ((x * 7 + y * 13 + (f * perFile + i) * 31) * 2654435761L).toInt & 0xffffff)
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", baos)
        baos.toByteArray
      }
      graft.multimodal.AviCodec.writeMjpeg(
        dir.resolve(f"clip_$f%05d.avi").toString, frames, w, h, 30)
    }
    val muxSec = (System.nanoTime() - tMux0) / 1e9
    val totalFrames = nFiles.toLong * perFile

    def timed(label: String, reps: Int = 3)(body: => Long): Double = {
      // best-of-reps: one-second-scale measurements swing with task
      // scheduling; the min is the cost floor the codec actually has
      var best = Double.MaxValue
      var n = 0L
      var i = 0
      while (i < reps) {
        val t0 = System.nanoTime()
        n = body
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        i += 1
      }
      println(f"[corpus] $label%-28s $best%8.3f s  (best of $reps, result $n)")
      best
    }

    // 1. planning: listing + probe of every container (cold cache in
    // this JVM; the distributed path engages past 64 files). reps=1 —
    // repeat plans hit the probe cache by design.
    val planSec = timed("plan (list+probe, cold)", reps = 1) {
      spark.read.format("graft-frames")
        .option("path", dir.toString).option("numPartitions", cpus)
        .load().count() // metadata-only: no payload column, no decode
    }

    // one relation per width: the DSv2 table (and its probed Config) is
    // resolved once and reused, so the timed region measures DECODE, not
    // re-planning
    def scan(parts: Int) = spark.read.format("graft-frames")
      .option("path", dir.toString).option("numPartitions", parts)
      .load()
    val halfParts = math.max(1, cpus / 2)
    val dfWide = scan(cpus)
    val dfHalf = scan(halfParts)

    // warm-up decode (JIT + plan) per width, then timed full decodes
    dfWide.agg(sum(length(col("payload")))).head()
    dfHalf.agg(sum(length(col("payload")))).head()
    val fullWide = timed(s"full decode @$cpus parts") {
      dfWide.agg(sum(length(col("payload")))).head().getLong(0)
    }
    val fullHalf = timed(s"full decode @$halfParts parts") {
      dfHalf.agg(sum(length(col("payload")))).head().getLong(0)
    }
    val metaSec = timed("metadata-only count") {
      dfWide.select("frame_number", "ts_us").count()
    }

    val fpsWide = totalFrames / fullWide
    val fpsPerCore = fpsWide / cpus
    val linearity = fullHalf / fullWide
    println(f"[corpus] frames=$totalFrames mux=$muxSec%.1fs plan=$planSec%.3fs")
    println(f"[corpus] decode throughput: $fpsWide%.0f frames/s aggregate, $fpsPerCore%.0f frames/s/core @ $cpus cores")
    println(f"[corpus] half-width/full-width time ratio: $linearity%.2f (~2.0 = linear in cores; <1.2 would mean the scan doesn't parallelize)")
    println(f"[corpus] metadata-only scan: $metaSec%.3f s for $totalFrames frames (no payload decode)")
    spark.stop()
  }
}
