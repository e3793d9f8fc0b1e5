package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate nearest-neighbor search over an embedding column.
  *
  * Two tiers, per the scale plan:
  *  - brute force (cross join + cosine): exact, O(n·q) — the baseline and
  *    the verifier for the approximate path;
  *  - IVF (inverted-file): assign every vector to its nearest coarse
  *    centroid, then search only the `nprobe` most promising partitions
  *    per query. At 100 TB the assignment is one broadcast-join pass and
  *    each query touches nprobe/k of the data — the standard
  *    shuffle-friendly ANN layout.
  */
object Ann {

  private def withNorm(df: DataFrame, emb: String): DataFrame =
    df.withColumn("__v", VectorOps.toDoubleArray(col(emb)))
      .withColumn("__norm", VectorOps.norm(col("__v")))

  private def cos(a: Column, an: Column, b: Column, bn: Column): Column =
    VectorOps.dot(a, b) / (an * bn)

  /** Exact top-k neighbors for every query row (brute force). Both sides
    * carry precomputed norms so each pair costs one dot product.
    *
    * k=1 uses an argmax aggregation (`max(struct(cos, -id))`): partial
    * aggregation collapses the n·q scored pairs map-side, so the shuffle
    * carries one row per (partition, query) instead of every pair — the
    * difference between shipping 4M rows and a few thousand. k>1 falls
    * back to a per-query window (still partitioned by query, no global
    * funnel). */
  def bruteForceKnn(vectors: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val v = withNorm(vectors, "embedding")
      .select(col("vec_id").as("neighbor_id"), col("__v").as("nv"), col("__norm").as("nn"))
    val q = withNorm(queries, "embedding")
      .select(col("vec_id").as("query_id"), col("__v").as("qv"), col("__norm").as("qn"))
    val scored = v.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cos(col("qv"), col("qn"), col("nv"), col("nn")), 4).as("cos"))
    if (k == 1) {
      // lexicographic argmax == ORDER BY cos DESC, neighbor_id ASC LIMIT 1
      scored
        .groupBy("query_id")
        .agg(max(struct(col("cos"), (-col("neighbor_id")).as("neg_id"))).as("best"))
        .select(col("query_id"), (-col("best.neg_id")).as("neighbor_id"),
          col("best.cos").as("cos"), lit(1L).as("rank"))
        .orderBy("query_id")
    } else {
      // bounded typed Aggregator: each map task ships at most k rows per
      // query to the shuffle (a window would shuffle every scored pair)
      val topk = udaf(new graft.expressions.TopK(k))
      scored
        .groupBy("query_id")
        .agg(topk(col("cos"), col("neighbor_id")).as("top"))
        .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "entry")))
        .select(col("query_id"), col("entry._2").as("neighbor_id"),
          col("entry._1").as("cos"), (col("pos") + 1).cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }
  }

  /** IVF search: `centroids` is the coarse codebook (id, embedding);
    * every vector joins to its nearest centroid once (broadcast), queries
    * probe the `nprobe` nearest centroid cells only. */
  def ivfKnn(vectors: DataFrame, queries: DataFrame, centroids: DataFrame,
             k: Int, nprobe: Int): DataFrame = {
    val c = withNorm(centroids, "embedding")
      .select(col("centroid_id"), col("__v").as("cv"), col("__norm").as("cn"))

    // one pass: nearest centroid per vector (broadcast join, window
    // partitioned by vector — fully parallel)
    val assignW = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("centroid_id").asc)
    val assigned = withNorm(vectors, "embedding")
      .select(col("vec_id"), col("__v").as("nv"), col("__norm").as("nn"))
      .crossJoin(broadcast(c))
      .withColumn("ccos", cos(col("nv"), col("nn"), col("cv"), col("cn")))
      .withColumn("r", row_number().over(assignW))
      .filter(col("r") === 1)
      .select(col("vec_id").as("neighbor_id"), col("nv"), col("nn"),
        col("centroid_id").as("cell"))

    // per query: the nprobe closest cells
    val probeW = Window.partitionBy("query_id").orderBy(col("qcos").desc, col("centroid_id").asc)
    val probes = withNorm(queries, "embedding")
      .select(col("vec_id").as("query_id"), col("__v").as("qv"), col("__norm").as("qn"))
      .crossJoin(broadcast(c))
      .withColumn("qcos", cos(col("qv"), col("qn"), col("cv"), col("cn")))
      .withColumn("r", row_number().over(probeW))
      .filter(col("r") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("centroid_id").as("cell"))

    // search only the probed cells (equi-join on cell — shuffle keyed by
    // cell id, no O(n·q) cross product)
    val rankW = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    assigned.join(probes, "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cos(col("qv"), col("qn"), col("nv"), col("nn")), 4).as("cos"))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }
}
