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

  test("IVF recall@5 vs exact kNN is usable on real embeddings") {
    val e = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    val queries = e.filter(col("vec_id") < 16)
    val exact = Ann.bruteForceKnn(e, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val centroids = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    val approx = Ann.ivfKnn(e, queries, centroids, k = 5, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall@5 = $recall (nprobe=4 of 16 cells)")
  }
}
