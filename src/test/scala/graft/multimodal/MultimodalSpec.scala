package graft.multimodal

import java.nio.file.Files

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("feature extraction feeds the similarity surface end-to-end") {
    val docs = Tables.documents(spark, sf0001)
    val media = Multimodal.ingest(spark, docs)
    val feats = Multimodal.extractFeatures(spark, media)
    val rows = feats.collect()
    assert(rows.length === docs.count())
    assert(rows.forall(_.embedding.length === 16))
    assert(rows.forall(r => math.abs(r.embedding.sum - 1.0f) < 1e-3), "normalized histogram")
    // exact duplicate payloads -> identical features -> mutual top-1 at
    // cosine 1.0 through the similarity surface
    import org.apache.spark.sql.functions.col
    val dupMedia = Seq(
      Multimodal.MediaRecord(9001L, "same bytes here".getBytes("UTF-8"), "image"),
      Multimodal.MediaRecord(9002L, "same bytes here".getBytes("UTF-8"), "image"),
      Multimodal.MediaRecord(9003L, "completely different payload content!".getBytes("UTF-8"), "image"))
      .toDS()
    val dupVecs = Multimodal.extractFeatures(spark, dupMedia)
      .toDF().select(col("vec_id"), col("embedding"))
    val knn = graft.similarity.Ann.bruteForceKnn(dupVecs, dupVecs, 1)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(knn(9001L) === ((9002L, 1.0)))
    assert(knn(9002L) === ((9001L, 1.0)))
  }

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
