package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("imageDir orders by embedded number, non-numeric names last, non-images excluded") {
    val dir = Files.createTempDirectory("graft_imgs")
    for ((name, bytes) <- Seq("frame_10.png" -> "ten", "frame_2.JPG" -> "two",
        "frame 1.png" -> "one", // URI-escaped space: digits come from the DECODED stem
        "cover.png" -> "nan",
        "notes_1.txt" -> "skip", // unsupported suffix: not scanned at all
        "frame_3.mp4" -> "skip")) // digit in the suffix must not leak in
      Files.write(dir.resolve(name), bytes.getBytes("UTF-8"))
    val got = Sources.imageDir(spark, dir.toString)
      .selectExpr("frame_number", "url_decode(reverse(split(path,'/'))[0]) AS name",
        "decode(content, 'UTF-8') AS body")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq === Seq("frame 1.png", "frame_2.JPG", "frame_10.png", "cover.png"))
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(got.map(_._3).toSeq === Seq("one", "two", "ten", "nan"))
  }

  test("imageDir: Hadoop hides dot/underscore files entirely; multi-dot stems keep their digits") {
    val dir = Files.createTempDirectory("graft_imgs_dot")
    for (name <- Seq(".2png", "_5.raw", // hidden to FileInputFormat, never scanned
        "frame.1.raw", "frame_3.raw")) // multi-dot: stem "frame.1" -> digits 1
      Files.write(dir.resolve(name), "x".getBytes("UTF-8"))
    val got = Sources.imageDir(spark, dir.toString, extensions = Nil)
      .selectExpr("frame_number", "url_decode(reverse(split(path,'/'))[0]) AS name")
      .as[(Long, String)].collect().sortBy(_._1)
    // divergence note: the reference's iterdir() WOULD see dot-files (its
    // suffix filter drops them anyway); Hadoop's scan never lists them.
    assert(got.map(_._2).toSeq === Seq("frame.1.raw", "frame_3.raw"))
  }

  test("imageDir ends the scan at the first unreadable file (S1 stop-not-skip)") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_imgs_bad")
    // "decodeable" = carries the IMG magic; frame_3 is corrupt mid-directory
    for ((name, bytes) <- Seq("frame_1.png" -> "IMGone", "frame_2.png" -> "IMGtwo",
        "frame_3.png" -> "garbage", "frame_4.png" -> "IMGfour"))
      Files.write(dir.resolve(name), bytes.getBytes("UTF-8"))
    val badMagic = expr("decode(substring(content, 1, 3), 'UTF-8')") =!= "IMG"
    val got = Sources.imageDir(spark, dir.toString, unreadable = badMagic)
      .selectExpr("frame_number", "reverse(split(path,'/'))[0] AS name")
      .as[(Long, String)].collect().sortBy(_._1)
    // the stream TRUNCATES at frame_3: frame_4 is readable but never emits
    assert(got.map(_._2).toSeq === Seq("frame_1.png", "frame_2.png"))
    assert(got.map(_._1).toSeq === Seq(0L, 1L))
  }

  test("open() dispatches: directory -> binary scan, file -> parquet, stream:// -> unbounded") {
    val viaFile = Sources.open(spark, s"$sf0001/events.parquet")
    assert(viaFile.columns.contains("event_id"))
    val dir = Files.createTempDirectory("graft_disp")
    Files.write(dir.resolve("1.png"), "x".getBytes)
    val viaDir = Sources.open(spark, dir.toString)
    assert(viaDir.columns.contains("frame_number"))
    assert(viaDir.count() === 1L, "directory branch actually scans rows")
    // stream:// over a homogeneous parquet directory -> streaming df
    val sdir = Files.createTempDirectory("graft_stream_dir")
    graft.Tables.events(spark, sf0001).limit(10).write
      .mode("overwrite").parquet(sdir.toString)
    val streamed = Sources.open(spark, s"stream://$sdir")
    assert(streamed.isStreaming)
    assert(streamed.columns.contains("event_id"))
    // .avi file -> the real container-decode connector (the reference's
    // file -> VideoReader arm, frame_reader.py:216-218)
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val avi = dir.resolve("clip.avi").toString
    graft.multimodal.AviCodec.writeMjpeg(avi, Seq.fill(3)(baos.toByteArray), 8, 6, 10)
    val viaAvi = Sources.open(spark, avi)
    assert(viaAvi.columns.toSeq ===
      Seq("frame_number", "ts_us", "width", "height", "fps", "payload"))
    assert(viaAvi.count() === 3L, "container branch decodes the real frame count")
    // .mp4 file -> same connector through the ISO-BMFF codec
    val mp4 = dir.resolve("clip.mp4").toString
    graft.multimodal.Mp4Codec.writeMjpeg(mp4, Seq.fill(2)(baos.toByteArray), 8, 6, 10)
    assert(Sources.open(spark, mp4).count() === 2L, "MP4 branch decodes via stbl")
    // rtsp:// -> the unbounded network client (the reference's rtsp arm);
    // plan-only here (RtspSourceSpec drives a real localhost session)
    val viaRtsp = Sources.open(spark, "rtsp://127.0.0.1:1/cam")
    assert(viaRtsp.isStreaming)
    assert(viaRtsp.columns.toSeq ===
      Seq("frame_number", "ts_us", "width", "height", "payload"))
  }

  test("graft_dot is callable from SQL after registration") {
    graft.extensions.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(got === 11.0)
  }

  test("graft_hash56 is callable from SQL and equals the composed form") {
    graft.extensions.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_hash56('hello') AS h, " +
        "CAST(conv(substring(md5('hello'), 1, 14), 16, 10) AS BIGINT) AS c")
      .as[(Long, Long)].head()
    assert(got._1 === got._2)
  }

  test("graft_hash56 on a non-string argument is an ANALYSIS error, not a runtime one") {
    graft.extensions.GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_hash56(CAST(7 AS BIGINT)) AS h").head()
    }
    assert(e.getMessage.toLowerCase.contains("string"),
      s"expected the type-check message, got: ${e.getMessage.take(200)}")
  }
}
