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

  /** Aggregate-based Lloyd k-means for the IVF codebook — deterministic
    * and fully distributed.
    *
    * Init: the k vectors with the smallest md5-of-id, a deterministic
    * pseudo-random sample (unlike "lowest k ids", which inherits whatever
    * correlation the id order carries). Each iteration is one broadcast
    * assignment pass plus one per-dimension mean: explode to (cell, dim,
    * x), groupBy(cell, dim) — partial aggregation collapses to k·d rows
    * per partition before the shuffle, so the network cost per iteration
    * is O(k·d·partitions), independent of the corpus size. Lineage is cut
    * per iteration with an eager `localCheckpoint` (k rows), keeping the
    * plan flat — no driver-side collect anywhere.
    *
    * A cell that captures no vectors drops out (standard Lloyd
    * degeneracy); ids keep their init numbering, which is all [[ivfKnn]]
    * needs. Assignment metric is cosine, matching the search metric.
    */
  def trainCentroids(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    import graft.functions.TextOps
    val v = withNorm(vectors, "embedding")
      .select(col("vec_id"), col("__v").as("nv"), col("__norm").as("nn"))
    val seedW = Window.orderBy(col("__h").asc, col("vec_id").asc)
    var cents = v
      .withColumn("__h", TextOps.hash56(col("vec_id").cast("string")))
      .orderBy(col("__h").asc, col("vec_id").asc).limit(k)
      // k-row window: numbering the codebook, not the corpus
      .withColumn("centroid_id", row_number().over(seedW).cast("long") - 1L)
      .select(col("centroid_id"), col("nv").as("cv"), col("nn").as("cn"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      // same argmax shape as assignCells: partial-agg, no per-vector sort
      val assigned = v.crossJoin(broadcast(cents))
        .withColumn("ccos", cos(col("nv"), col("nn"), col("cv"), col("cn")))
        .groupBy("vec_id")
        .agg(max(struct(col("ccos"), (-col("centroid_id")).as("nc"))).as("best"),
          first(col("nv")).as("nv"))
        .select((-col("best.nc")).as("cell"), col("nv"))
      val means = assigned
        .select(col("cell"), posexplode(col("nv")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        // decimal-summed mean, not avg(double): float partial sums merge
        // in shuffle-fetch order, so avg() could drift in the last ulp
        // across partitionings and flip a downstream cosine tie — the
        // same house determinism rule as every money/projection sum.
        // The sum is cast to double BEFORE the division (exact sum, one
        // exact IEEE division) rather than divided as a decimal: decimal
        // division scale rules are engine-specific, and the q33 oracle
        // replays this mean in DuckDB.
        .agg((sum(col("x").cast("decimal(28,12)")).cast("double") / count(lit(1)))
          .as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cell").as("centroid_id"),
          transform(col("dm"), e => e.getField("m")).as("cv"))
        .withColumn("cn", VectorOps.norm(col("cv")))
      cents = means.localCheckpoint()
    }
    cents.select(col("centroid_id"), col("cv").as("embedding"))
  }

  /** Nearest-centroid cell assignment — the IVF partitioning pass.
    * Broadcast join + lexicographic argmax (`max(struct(cos, -id))`),
    * the same partial-aggregation shape as k=1 kNN: each map task ships
    * one row per (partition, vector), no per-vector sort. Tie-break and
    * NaN ranking match the window formulation it replaced (smallest
    * centroid id on ties; NaN ranks highest in both). Also the basis for
    * the cell-balance assertions in AnnSpec.
    * Output: (vec_id, nv, nn, cell). */
  def assignCells(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val c = withNorm(centroids, "embedding")
      .select(col("centroid_id"), col("__v").as("cv"), col("__norm").as("cn"))
    withNorm(vectors, "embedding")
      .select(col("vec_id"), col("__v").as("nv"), col("__norm").as("nn"))
      .crossJoin(broadcast(c))
      .withColumn("ccos", cos(col("nv"), col("nn"), col("cv"), col("cn")))
      .groupBy("vec_id")
      .agg(max(struct(col("ccos"), (-col("centroid_id")).as("nc"))).as("best"),
        first(col("nv")).as("nv"), first(col("nn")).as("nn"))
      .select(col("vec_id"), col("nv"), col("nn"), (-col("best.nc")).as("cell"))
  }

  /** SemDeDup-style semantic dedup: a vector is DROPPED when a vector
    * with a smaller `vec_id` sits in the same IVF cell at
    * `round(cos, 4) >= threshold`. Comparing only within a cell is the
    * point — the candidate set is cell-bounded (never all-pairs), and at
    * 100 TB the codebook size k is raised so cells stay bounded; the
    * within-cell pair join is keyed on `cell`, so it shuffles by cell id
    * and each task sees one cell's vectors. Cross-cell near-dups are
    * forfeit by design (the SemDeDup trade: recall for a k× cut in
    * candidate pairs).
    *
    * Output: (vec_id, cell, best_prior_cos, kept 0/1) — a complete
    * report (kept docs appear with kept=1, like q74's clean docs);
    * `best_prior_cos` is the max round(cos,4) against any smaller-id
    * vector of the same cell (null when the vector is its cell's lowest
    * id), so the decision margin is visible, not just the bit. Totally
    * ordered by the caller. */
  def semanticDedupAssigned(asg: DataFrame, threshold: Double): DataFrame = {
    // both sides of the pair join + the final report read `asg`, so the
    // caller hands in a persisted assignment ([[IvfIndex.assignments]])
    val lower = asg.select(col("cell"), col("vec_id").as("keep_id"),
      col("nv").as("knv"), col("nn").as("knn"))
    // per-vector max prior cosine: partial-aggregated map-side, so the
    // shuffle after the cell join carries one row per (partition, vec)
    val best = asg.join(lower, Seq("cell"))
      .filter(col("keep_id") < col("vec_id"))
      .groupBy("vec_id")
      .agg(max(round(cos(col("knv"), col("knn"), col("nv"), col("nn")), 4))
        .as("best_prior_cos"))
    asg.select(col("vec_id"), col("cell").cast("long"))
      .join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("best_prior_cos"),
        when(col("best_prior_cos").isNull
          || col("best_prior_cos") < threshold, lit(1L)).otherwise(lit(0L))
          .as("kept"))
  }

  /** IVF search: `centroids` is the coarse codebook (id, embedding);
    * every vector joins to its nearest centroid once (broadcast), queries
    * probe the `nprobe` nearest centroid cells only. */
  def ivfKnn(vectors: DataFrame, queries: DataFrame, centroids: DataFrame,
             k: Int, nprobe: Int): DataFrame =
    // one pass: nearest centroid per vector (broadcast join, argmax agg —
    // fully parallel)
    ivfKnnAssigned(assignCells(vectors, centroids), queries, centroids, k, nprobe)

  /** Per query, the `nprobe` nearest coarse cells — the probe-selection
    * front half of IVF search, shared by the raw-vector scorer
    * ([[ivfKnnAssigned]]) and the PQ/ADC scorer ([[Pq]]). Output:
    * (query_id, qv, qn, cell). */
  def probeCells(queries: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame = {
    val c = withNorm(centroids, "embedding")
      .select(col("centroid_id"), col("__v").as("cv"), col("__norm").as("cn"))
    val probeW = Window.partitionBy("query_id").orderBy(col("qcos").desc, col("centroid_id").asc)
    withNorm(queries, "embedding")
      .select(col("vec_id").as("query_id"), col("__v").as("qv"), col("__norm").as("qn"))
      .crossJoin(broadcast(c))
      .withColumn("qcos", cos(col("qv"), col("qn"), col("cv"), col("cn")))
      .withColumn("r", row_number().over(probeW))
      .filter(col("r") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("centroid_id").as("cell"))
  }

  /** [[ivfKnn]] over a prebuilt assignment ([[IvfIndex.assignments]]) —
    * the per-vector partitioning pass is the index build, not part of
    * the search. `assigned` carries [[assignCells]]'s schema. */
  def ivfKnnAssigned(assigned0: DataFrame, queries: DataFrame,
                     centroids: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val assigned = assigned0
      .select(col("vec_id").as("neighbor_id"), col("nv"), col("nn"), col("cell"))

    // per query: the nprobe closest cells
    val probes = probeCells(queries, centroids, nprobe)

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
