package graft.similarity

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class AnnSpec extends SparkSpec {
  import spark.implicits._

  test("brute-force kNN finds the hand-checkable neighbor") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Ann.bruteForceKnn(vecs, vecs, 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(got(0L) === 1L)
    assert(got(1L) === 0L)
    assert(got(3L) === 2L, "least-negative cosine wins for the opposite vector")
  }

  test("IVF with trained centroids: recall@5 usable, cells balanced") {
    val e = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    val queries = e.filter(col("vec_id") < 16)
    val exact = Ann.bruteForceKnn(e, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val centroids = Ann.trainCentroids(e, k = 16, iters = 2)
    val approx = Ann.ivfKnn(e, queries, centroids, k = 5, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall@5 = $recall (nprobe=4 of 16 cells)")
    // trained codebook must give a real partitioning: no empty codebook,
    // and no cell hogging the corpus (the scale hazard VERDICT #7 names)
    val sizes = Ann.assignCells(e, centroids)
      .groupBy("cell").count().as[(Long, Long)].collect().map(_._2)
    val total = sizes.sum.toDouble
    assert(sizes.length >= 8, s"only ${sizes.length} of 16 cells survived training")
    assert(sizes.max / (total / sizes.length) <= 4.0,
      s"max cell ${sizes.max} vs mean ${total / sizes.length} — skewed partitioning")
  }

  test("trainCentroids is deterministic across invocations") {
    val e = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    def snapshot() = Ann.trainCentroids(e, k = 8, iters = 1)
      .selectExpr("centroid_id", "cast(embedding as array<string>)")
      .as[(Long, Seq[String])].collect().sortBy(_._1).toSeq
    assert(snapshot() === snapshot())
  }
}
