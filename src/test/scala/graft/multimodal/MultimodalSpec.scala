package graft.multimodal

import java.nio.file.Files

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  test("extractFrames writes one frame_%05d partition per kept frame") {
    val out = Files.createTempDirectory("graft_frames").toString
    val media = Multimodal.ingest(spark,
      Tables.documents(spark, sf0001).limit(5))
    Multimodal.extractFrames(spark, media, out)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("frame_file="))
    assert(dirs.nonEmpty)
    assert(dirs.forall(_.matches("frame_file=frame_\\d{5}")))
    val kept = Multimodal.sampleFrames(spark, media).count()
    assert(spark.read.parquet(out).count() === kept)
  }
}
