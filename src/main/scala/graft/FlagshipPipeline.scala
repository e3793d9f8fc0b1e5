package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{BBoxOps, LetterboxKernel}
import graft.streaming.EventStreams

/** The reference's flagship pipeline (`/root/reference/uav/main.py:74-179`)
  * composed end-to-end from graft operators:
  *
  * {{{
  *   graft-frames source (DataSourceV2, §S1-S4)
  *     ├─ sink A: record-all           (FrameSaver, main.py:113)
  *     └─ every-Nth keyframe filter    (main.py:116)
  *          → letterbox pixel kernel   (FrameResizer, main.py:122)
  *          → stub detector flatMap    (ObjectDetector, main.py:125)
  *          → conf/class filters       (frame_processing.py:93,103)
  *          → NMS                      (YOLO-internal post-processing)
  *          → JSON payload sink B      (FrameSender, main.py:134)
  * }}}
  *
  * One cached pass feeds both consumers (§4.1 "single sequential pass
  * shared by both sinks"). The detector is a deterministic stand-in
  * (model weights unavailable — SURVEY.md §7.3 non-goals): it derives
  * boxes from payload bytes, preserving the exact relational shape
  * (flatMap → threshold → IN-list → NMS) a real model plugs into.
  */
object FlagshipPipeline {

  final case class RunStats(framesSaved: Long, keyframes: Long, detectionsSent: Long)

  def run(spark: SparkSession, outDir: String, frames: Long = 3000,
          keyframeInterval: Int = EventStreams.KeyframeInterval): RunStats = {
    val srcW = 64
    val srcH = 48
    // payload sized as a real frame buffer (srcW*srcH grayscale bytes;
    // the connector stub emits 64 B, so inflate deterministically)
    val frameBufUdf = udf((f: Long) =>
      Array.tabulate(srcW * srcH)(i => ((f * 31 + i) % 256 - 128).toByte))
    val source = spark.read.format("graft-frames")
      .option("frames", frames).option("width", srcW).option("height", srcH)
      .option("numPartitions", 8)
      .load()
      .withColumn("payload", frameBufUdf(col("frame_number")))
      .withColumn("w", lit(srcW)).withColumn("h", lit(srcH))
    runFromSource(spark, source, outDir, keyframeInterval, channels = 1)
  }

  /** The same fan-out fed from an S1 image DIRECTORY — the reference's
    * primary demo path (`main.py:74-86`: a folder of numbered frames).
    * [[graft.sources.Sources.imageDir]] supplies the ordering (digit run
    * in the stem, nulls last) and the stop-on-first-unreadable cut, so a
    * corrupt frame mid-directory truncates the run BEFORE either sink
    * sees it — exactly the reference's scan-ending decode failure.
    *
    * Files are REAL images: [[graft.multimodal.ImageCodec]] decodes
    * JPEG/PNG/BMP via the JDK's ImageIO into interleaved BGR exactly like
    * the reference's `cv2.imread` (`frame_reader.py:96-104`), with
    * per-image dimensions; a corrupt or truncated file decodes to NULL,
    * which IS the stop-on-unreadable predicate — `imread → None → stop`.
    * The decode runs once, inside the source's persisted scan, shared by
    * the cut aggregate and both sinks.
    */
  def runFromImageDir(spark: SparkSession, dir: String, outDir: String,
                      keyframeInterval: Int = EventStreams.KeyframeInterval): RunStats = {
    val source = graft.sources.Sources.imageDir(spark, dir,
        derived = Seq("decoded" ->
          graft.multimodal.ImageCodec.decodeUdf(col("content"))),
        unreadable = col("decoded").isNull)
      .select(col("frame_number"),
        // same 30 fps synthetic clock as the connector stub: image files
        // carry no timestamps (integer div — no 2^53 double cliff)
        expr("1704067200000000 + frame_number * 1000000 div 30").as("ts_us"),
        col("decoded.pixels").as("payload"),
        col("decoded.width").as("w"), col("decoded.height").as("h"))
    runFromSource(spark, source, outDir, keyframeInterval, channels = 3)
  }

  /** The same fan-out fed from a REAL video container — the reference's
    * primary production path (`main.py:88-96`: point the pipeline at an
    * `.mp4`/RTSP url). Here the container is MJPEG/AVI, decoded
    * entirely in-JVM ([[graft.multimodal.AviCodec]]: RIFF chunk walk →
    * per-frame JPEG → ImageIO → BGR), flowing through the S2
    * DataSourceV2 connector — container-probed metadata, partition-
    * parallel decode, pushdown/pruning intact. The payload bytes are
    * byte-identical to decoding the same JPEGs from an S1 image
    * directory, so the two ingest paths are cross-checkable
    * (FlagshipPipelineSpec pins that equality). */
  def runFromAvi(spark: SparkSession, aviPath: String, outDir: String,
                 keyframeInterval: Int = EventStreams.KeyframeInterval): RunStats = {
    val source = spark.read.format("graft-frames")
      .option("path", aviPath)
      .option("numPartitions", 4)
      .load()
      .select(col("frame_number"), col("ts_us"), col("payload"),
        col("width").as("w"), col("height").as("h"))
    runFromSource(spark, source, outDir, keyframeInterval, channels = 3)
  }

  /** The full D1 fan-out over a CONTAINER CORPUS with a VIDEO record-all
    * sink (VERDICT r7 item 6): the directory scans as one relation
    * through the connector, and sink A re-muxes the decoded frames into
    * partitioned AVI files via
    * [[graft.multimodal.VideoSink.saveAviPartitioned]] — executor-side,
    * contiguous frame runs per part, no driver funnel — instead of the
    * parquet record-all. Raw (lossless) codec, so the saved video holds
    * the exact BGR bytes the parquet sink would have; the spec pins
    * count/bytes parity by scanning the parts back through the same
    * connector. */
  def runFromCorpus(spark: SparkSession, corpusDir: String, outDir: String,
                    keyframeInterval: Int = EventStreams.KeyframeInterval,
                    numParts: Int = 4): RunStats = {
    val source = spark.read.format("graft-frames")
      .option("path", corpusDir)
      .option("numPartitions", numParts)
      .load()
      .select(col("frame_number"), col("ts_us"), col("payload"),
        col("width").as("w"), col("height").as("h"))
    runFromSource(spark, source, outDir, keyframeInterval, channels = 3,
      recordAll = df => graft.multimodal.VideoSink.saveAviPartitioned(
        df, s"$outDir/all_avi", codec = "raw", numParts = numParts))
  }

  /** Source-agnostic flagship body: any (frame_number, ts_us, payload,
    * w, h) relation with row-major `channels`-interleaved byte payloads
    * fans out to both sinks. Dimensions are per-ROW (a directory of mixed
    * image sizes letterboxes each to the same square, like the
    * reference). `recordAll` overrides sink A (the default parquet
    * record-all) — the corpus face substitutes the partitioned video
    * sink; it returns the frames-saved count. */
  private def runFromSource(spark: SparkSession, source0: org.apache.spark.sql.DataFrame,
                            outDir: String, keyframeInterval: Int,
                            channels: Int,
                            recordAll: org.apache.spark.sql.DataFrame => Long = null): RunStats = {
    import spark.implicits._

    val target = 64
    val source = source0.persist() // one decode pass, two consumers (main.py:109-134)

    // sink A: record-all (parquet by default; the corpus face muxes
    // partitioned video instead)
    val framesSaved =
      if (recordAll != null) recordAll(source)
      else {
        source.select("frame_number", "ts_us", "payload")
          .write.mode("overwrite").parquet(s"$outDir/all")
        spark.read.parquet(s"$outDir/all").count()
      }

    // sampled branch: letterbox -> detect -> filter -> NMS -> send
    val letterboxUdf = udf((p: Array[Byte], w: Int, h: Int) =>
      LetterboxKernel.letterbox(p, w, h, target, channels))
    val detectUdf = udf((frame: Long, p: Array[Byte]) => {
      // stub detector: 0..3 boxes derived from buffer stats; a real model
      // replaces this lambda and nothing else changes. Stats sample the
      // image CENTER (first channel = B for BGR) — the letterbox pad
      // rows are black.
      val c = (target * target / 2 + target / 2) * channels
      val n = ((p(c) + 256) % 4)
      (0 until n).map { i =>
        val x0 = ((frame * 13 + i * 97) % (target - 20)).toInt
        val y0 = ((frame * 29 + i * 53) % (target - 20)).toInt
        (i, x0, y0, x0 + 12 + i, y0 + 12 + i,
          ((p(c + i + 1) + 256) % 256) / 255.0, ((frame + i) % 5).toInt)
      }
    })

    val detections = source
      .filter(col("frame_number") % keyframeInterval === 0)
      .withColumn("resized", letterboxUdf(col("payload"), col("w"), col("h")))
      .select(col("frame_number"), col("ts_us"),
        explode(detectUdf(col("frame_number"), col("resized"))).as("d"))
      .select(col("frame_number").as("frame"),
        (col("frame_number") * 10 + col("d._1")).as("box_id"),
        col("d._2").cast("long").as("x0"), col("d._3").cast("long").as("y0"),
        col("d._4").cast("long").as("x1"), col("d._5").cast("long").as("y1"),
        col("d._6").as("confidence"), col("d._7").as("class_id"))
      .filter(col("confidence") >= 0.4 && col("class_id").isin(0, 1, 2))

    // per-class NMS (YOLO suppresses within a class, not across): pack
    // (frame, class) into the group key, then unpack for the sink
    val perClassKey = detections
      .withColumn("frame", col("frame") * 5 + col("class_id"))
      .drop("class_id")
    val kept = BBoxOps.nms(spark, perClassKey, iouThreshold = 0.5)
      .withColumn("class_id", col("frame") % 5)
      .withColumn("frame", expr("frame div 5")) // integer div: no 2^53 double cliff

    // sink B: JSON payloads, confidence rounded to 4dp like the sender
    // (frame_processing.py:236)
    kept.select(col("frame"), to_json(struct(
        col("frame").as("frame_number"),
        struct(col("x0"), col("y0"), col("x1"), col("y1"),
          col("class_id"),
          round(col("confidence"), 4).as("confidence")).as("detection")))
        .as("payload"))
      .write.mode("overwrite").parquet(s"$outDir/sent")

    val stats = RunStats(
      framesSaved = framesSaved,
      keyframes = source.filter(col("frame_number") % keyframeInterval === 0).count(),
      detectionsSent = spark.read.parquet(s"$outDir/sent").count())
    source.unpersist()
    stats
  }
}
