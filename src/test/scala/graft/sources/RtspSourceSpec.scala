package graft.sources

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.file.Files

import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The RTSP/RTP network face of S3 against a real localhost server
  * (the PushSinkSpec pattern, source-side): frames arrive over
  * interleaved RTP, decode to BGR, and carry the 90 kHz clock;
  * checkpoint restart is at-least-once against a replaying server; a
  * dropped connection freezes the stream (stop-on-grab-fail) instead
  * of failing the query. */
class RtspSourceSpec extends SparkSpec {

  private val W = 32
  private val H = 24

  private def jpeg(seed: Int): Array[Byte] = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until H; x <- 0 until W)
      img.setRGB(x, y, ((x * 3 + y * 19 + seed * 41) * 2654435761L).toInt & 0xffffff)
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  /** Runs the stream into an append parquet dir until `expect` distinct
    * frames arrive (or the deadline passes), returning the result. */
  private def drainUntil(df: DataFrame, out: String, checkpoint: String,
                         expect: Long, deadlineMs: Long = 30000): DataFrame = {
    val spark0 = df.sparkSession
    val query = df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(out)
        ()
      }
      .start()
    val t0 = System.currentTimeMillis()
    try {
      var done = false
      while (!done && System.currentTimeMillis() - t0 < deadlineMs) {
        query.processAllAvailable()
        val n =
          if (new java.io.File(out).exists)
            spark0.read.parquet(out).select("frame_number").distinct().count()
          else 0L
        if (n >= expect) done = true else Thread.sleep(100)
      }
    } finally query.stop()
    spark0.read.parquet(out)
  }

  test("frames arrive over interleaved RTP, decode to BGR, and carry the 90 kHz clock") {
    val frames = (0 until 10).map(jpeg)
    val server = new RtspTestServer(frames, fps = 25, fragmentSize = 300)
    try {
      val dir = Files.createTempDirectory("graft_rtsp_out")
      graft.TempDirs.cleanupOnExit(dir)
      val result = drainUntil(
        spark.readStream.format("graft-rtsp").option("url", server.url).load(),
        s"$dir/out", s"$dir/ckpt", expect = 10)
        .orderBy("frame_number").collect()
      assert(result.length === 10)
      result.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(0) === i.toLong)
        assert(r.getLong(1) === i.toLong * 90000L / 25 * 1000000L / 90000L,
          s"frame $i: ts_us from the RTP 90 kHz clock")
        assert(r.getInt(2) === W && r.getInt(3) === H)
        // fragmented-then-reassembled JPEG must decode to the same BGR
        // as decoding the source bytes directly
        val direct = graft.multimodal.ImageCodec.decode(frames(i)).get
        assert(r.getAs[Array[Byte]](4).toSeq === direct.pixels.toSeq,
          s"frame $i: reassembly must be byte-exact")
      }
    } finally server.close()
  }

  test("checkpoint restart against a replaying server is at-least-once: no frame lost") {
    val frames = (0 until 12).map(jpeg)
    // slow enough that the first run stops mid-stream
    val server = new RtspTestServer(frames, fps = 25, interFrameDelayMs = 80)
    try {
      val dir = Files.createTempDirectory("graft_rtsp_restart")
      graft.TempDirs.cleanupOnExit(dir)
      val stream = () => spark.readStream.format("graft-rtsp")
        .option("url", server.url).load()

      // run 1: catch a partial prefix, then stop (releases the session)
      val q1 = stream().writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(s"$dir/out")
          ()
        }
        .start()
      val t0 = System.currentTimeMillis()
      while ((!new java.io.File(s"$dir/out").exists ||
          spark.read.parquet(s"$dir/out").count() == 0) &&
          System.currentTimeMillis() - t0 < 20000) {
        q1.processAllAvailable()
        Thread.sleep(50)
      }
      q1.stop()
      val afterFirst = spark.read.parquet(s"$dir/out")
        .select("frame_number").distinct().count()
      assert(afterFirst > 0, "first run must have committed at least one frame")

      // run 2: same checkpoint, fresh session — the server replays from
      // 0, the committed offset skips the prefix, and every frame lands
      val all = drainUntil(stream(), s"$dir/out", s"$dir/ckpt", expect = 12)
      val seen = all.select("frame_number").distinct().count()
      assert(seen === 12L, s"at-least-once across restart: all 12 frames (saw $seen)")
      assert(server.sessionsServed.get() >= 2, "restart must re-handshake")
    } finally server.close()
  }

  test("ratePerBatch bounds micro-batch admission: many small batches, none above the rate") {
    val frames = (0 until 10).map(jpeg)
    val server = new RtspTestServer(frames, fps = 25)
    try {
      val dir = Files.createTempDirectory("graft_rtsp_rate")
      graft.TempDirs.cleanupOnExit(dir)
      val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val query = spark.readStream.format("graft-rtsp")
        .option("url", server.url).option("ratePerBatch", 3).load()
        .writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val n = batch.count()
          if (n > 0) batchSizes.add(n)
          batch.write.mode("append").parquet(s"$dir/out")
          ()
        }
        .start()
      val t0 = System.currentTimeMillis()
      var total = 0L
      while (total < 10 && System.currentTimeMillis() - t0 < 30000) {
        query.processAllAvailable()
        if (new java.io.File(s"$dir/out").exists)
          total = spark.read.parquet(s"$dir/out").count()
        if (total < 10) Thread.sleep(100)
      }
      query.stop()
      assert(total === 10L)
      import scala.jdk.CollectionConverters._
      val sizes = batchSizes.asScala.toSeq
      assert(sizes.forall(_ <= 3L),
        s"no micro-batch may exceed ratePerBatch=3, got $sizes")
      assert(sizes.length >= 4, s"10 frames at rate 3 need >= 4 batches, got $sizes")
    } finally server.close()
  }

  test("wire variations parse: CSRCs, header extension, padding skipped; non-JPEG PT ignored") {
    val frames = (0 until 8).map(jpeg)
    // a standards-compliant sender: 2 CSRCs, a one-word RFC 8285
    // extension, 3 pad bytes, and a PT=96 packet muxed before every
    // frame — the r9 client misread all four as RFC 2435 payload
    val server = new RtspTestServer(frames, fps = 25, fragmentSize = 300,
      csrcCount = 2, withExtension = true, padBytes = 3, decoyPt = Some(96))
    try {
      val dir = Files.createTempDirectory("graft_rtsp_wire")
      graft.TempDirs.cleanupOnExit(dir)
      val result = drainUntil(
        spark.readStream.format("graft-rtsp").option("url", server.url).load(),
        s"$dir/out", s"$dir/ckpt", expect = 8)
        .orderBy("frame_number").collect()
      assert(result.length === 8)
      result.zipWithIndex.foreach { case (r, i) =>
        val direct = graft.multimodal.ImageCodec.decode(frames(i)).get
        assert(r.getAs[Array[Byte]](4).toSeq === direct.pixels.toSeq,
          s"frame $i must survive CC/X/P/PT handling byte-exact")
      }
    } finally server.close()
  }

  test("the 32-bit RTP clock unwraps: ts_us stays monotone across a 90 kHz wrap") {
    val frames = (0 until 10).map(jpeg)
    // 3600 ticks/frame at 25 fps; base 3 frames short of 2^32 → the
    // wire clock wraps between frames 2 and 3
    val server = new RtspTestServer(frames, fps = 25,
      tsBase = 0x100000000L - 3 * 3600L)
    try {
      val dir = Files.createTempDirectory("graft_rtsp_wrap")
      graft.TempDirs.cleanupOnExit(dir)
      val ts = drainUntil(
        spark.readStream.format("graft-rtsp").option("url", server.url).load(),
        s"$dir/out", s"$dir/ckpt", expect = 10)
        .orderBy("frame_number").collect().map(_.getLong(1))
      assert(ts.length === 10)
      ts.sliding(2).zipWithIndex.foreach { case (Array(a, b), i) =>
        assert(b - a === 40000L,
          s"frames $i->${i + 1}: 3600 ticks = 40 ms, monotone across the wrap " +
            s"(got ${b - a} µs)")
      }
    } finally server.close()
  }

  test("maxBufferFrames bounds the uncommitted buffer: oldest frames drop, newest survive") {
    val frames = (0 until 30).map(jpeg)
    val server = new RtspTestServer(frames, fps = 25)
    try {
      // a stalled query: nothing commits, the reader keeps arriving
      val client = new graft.sources.v2.RtspClient(server.url, maxBufferFrames = 10)
      try {
        val t0 = System.currentTimeMillis()
        while (client.available() < 30 && System.currentTimeMillis() - t0 < 20000)
          Thread.sleep(50)
        assert(client.available() === 30L, "all frames must arrive")
        assert(client.droppedFrames === 20L, "cap 10 on 30 frames drops the oldest 20")
        val survivors = client.slice(0L, 30L)
        assert(survivors.length === 10)
        assert(survivors.map(_._1).toSeq === (20L until 30L).toSeq,
          "the NEWEST frames survive (at-most-once, like a live camera)")
      } finally client.close()
    } finally server.close()
  }

  test("two-camera fan-in: a union of two RTSP sources through one query, exact counts") {
    val framesA = (0 until 5).map(jpeg)
    val framesB = (10 until 15).map(jpeg)
    val serverA = new RtspTestServer(framesA, fps = 25)
    val serverB = new RtspTestServer(framesB, fps = 25)
    try {
      val dir = Files.createTempDirectory("graft_rtsp_fanin")
      graft.TempDirs.cleanupOnExit(dir)
      import org.apache.spark.sql.functions.lit
      def cam(url: String, id: Int) =
        spark.readStream.format("graft-rtsp").option("url", url).load()
          .withColumn("camera_id", lit(id))
      val union = cam(serverA.url, 0).unionByName(cam(serverB.url, 1))
      val query = union.writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(s"$dir/out")
          ()
        }
        .start()
      val t0 = System.currentTimeMillis()
      try {
        var n = 0L
        while (n < 10 && System.currentTimeMillis() - t0 < 30000) {
          query.processAllAvailable()
          if (new java.io.File(s"$dir/out").exists)
            n = spark.read.parquet(s"$dir/out")
              .select("camera_id", "frame_number").distinct().count()
          if (n < 10) Thread.sleep(100)
        }
      } finally query.stop()
      val out = spark.read.parquet(s"$dir/out")
      val perCam = out.groupBy("camera_id").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(perCam === Map(0 -> 5L, 1 -> 5L),
        s"each camera contributes exactly its frames (got $perCam)")
      // payloads stay camera-correct through the union
      val b3 = out.filter("camera_id = 1 AND frame_number = 3")
        .select("payload").head().getAs[Array[Byte]](0)
      assert(b3.toSeq ===
        graft.multimodal.ImageCodec.decode(framesB(3)).get.pixels.toSeq)
    } finally { serverA.close(); serverB.close() }
  }

  test("a dropped connection freezes the stream instead of failing it (stop-on-grab-fail)") {
    val frames = (0 until 10).map(jpeg)
    val server = new RtspTestServer(frames, fps = 25, dropAfter = 4)
    try {
      val dir = Files.createTempDirectory("graft_rtsp_drop")
      graft.TempDirs.cleanupOnExit(dir)
      val result = drainUntil(
        spark.readStream.format("graft-rtsp").option("url", server.url).load(),
        s"$dir/out", s"$dir/ckpt", expect = 4, deadlineMs = 20000)
      assert(result.select("frame_number").distinct().count() === 4L,
        "exactly the frames sent before the drop, no query failure")
    } finally server.close()
  }
}
