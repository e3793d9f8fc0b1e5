package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FilteredAnnSpec extends SparkSpec {
  import spark.implicits._

  test("q106 returns only neighbors satisfying the predicate") {
    val out = graft.SparkEntry.queries("q106_filtered_ann")(spark, sf0001)
    val allowed = graft.Tables.embeddings(spark, sf0001)
      .filter(col("label") < 3).select("vec_id").as[Long].collect().toSet
    val neighbors = out.select("neighbor_id").as[Long].collect()
    assert(neighbors.nonEmpty)
    assert(neighbors.forall(allowed.contains), "excluded labels never surface")
  }

  test("q106 is the label-restricted restriction of the q33 cell search") {
    // within the SAME probed cells, filtering before vs after scoring
    // must agree: q106's result equals q33-style search post-filtered to
    // the allowed labels and re-ranked
    val allowed = graft.Tables.embeddings(spark, sf0001)
      .filter(col("label") < 3).select(col("vec_id").as("neighbor_id"))
    val emb = graft.Tables.embeddings(spark, sf0001)
    val queries = emb.filter(col("vec_id") < 32).select("vec_id", "embedding")
    val unfiltered = Ann.ivfKnnAssigned(
      graft.similarity.IvfIndex.assignments(spark, sf0001), queries,
      graft.similarity.IvfIndex.codebook(spark, sf0001), k = Int.MaxValue - 1,
      nprobe = 4)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    val post = unfiltered.join(allowed, "neighbor_id")
      .withColumn("rank2", row_number().over(w).cast("long"))
      .filter(col("rank2") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank2").as("rank"))
      .as[(Long, Long, Double, Long)].collect().toSet
    val pre = graft.SparkEntry.queries("q106_filtered_ann")(spark, sf0001)
      .select("query_id", "neighbor_id", "cos", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(pre === post)
  }
}
