package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextOps, VectorOps}

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011) — the third tier of the vector-scale
  * path, beside the IVF coarse partitioning (q33) and the int8 scalar
  * quantization (q76): the 64-dim embedding splits into [[M]] 16-dim
  * subvectors, each sub-quantized to one of [[K]] trained sub-centroids,
  * so a corpus vector stores as M one-byte codes (64× smaller than the
  * float64 form) and a query scores a candidate from a per-query lookup
  * table (ADC — asymmetric distance computation: the QUERY side stays
  * exact, only the corpus side is quantized).
  *
  * Training is per-subspace L2 Lloyd with the house determinism rules
  * (md5-seeded init shared across subspaces, decimal-exact means, one
  * IEEE division) so the DuckDB oracle replays the whole chain. The L2
  * argmin is computed as `argmax(dot(x, c) − ‖c‖²/2)` — equivalent
  * (‖x‖² is constant per x) and one dot product cheaper; the ½ scale is
  * a power of two, so the expression is bit-stable across engines.
  *
  * Scale: codes are M rows (8 bytes of payload) per corpus vector —
  * built once per corpus snapshot ([[PqIndex]]); the ADC score of a
  * candidate set is a broadcast-LUT equi-join plus an M-term
  * decimal-exact partial aggregate — no raw-vector IO on the scoring
  * path at all, which is the entire point at 100 TB: the scan reads the
  * code table, not the embeddings.
  */
object Pq {

  /** Geometry: M subspaces × DSub dims, K codes per subspace. */
  val M = 4
  val DSub = 16
  val K = 16
  val Iters = 2

  /** Per-subspace view of an embedding relation: (id, s, sv) with
    * s ∈ [0, M). */
  def subvectors(vectors: DataFrame, idCol: String): DataFrame =
    vectors.select(col(idCol), VectorOps.toDoubleArray(col("embedding")).as("v"))
      .select(col(idCol), posexplode(array((0 until M).map(s =>
        slice(col("v"), s * DSub + 1, DSub)): _*)).as(Seq("s", "sv")))

  /** `argmax(dot − ‖c‖²/2)` ≡ L2 argmin, per the header note. */
  private def l2Score(sv: Column, cv: Column): Column =
    VectorOps.dot(sv, cv) - lit(0.5) * VectorOps.dot(cv, cv)

  /** Nearest sub-centroid per (vector, subspace) — the same broadcast +
    * lexicographic-argmax shape as [[Ann.assignCells]] (ties → smallest
    * code; map-side partial agg, no per-vector sort).
    * Output: (vec_id, s, code, sv). */
  private def assign(sub: DataFrame, cents: DataFrame): DataFrame =
    sub.join(broadcast(cents.select("s", "code", "cv")), "s")
      .withColumn("sc", l2Score(col("sv"), col("cv")))
      .groupBy("vec_id", "s")
      .agg(max(struct(col("sc"), (-col("code")).as("nc"))).as("best"),
        first(col("sv")).as("sv"))
      .select(col("vec_id"), col("s"), (-col("best.nc")).as("code"), col("sv"))

  /** Per-subspace Lloyd: the [[Ann.trainCentroids]] discipline (seeded
    * init, decimal means, localCheckpoint lineage cuts) generalized to
    * M codebooks trained in ONE DataFrame keyed by `s` — every subspace
    * initializes from the subvectors of the SAME md5-selected seed
    * vectors, so the oracle replays one seed ranking, not M.
    * Output: (s, code, cv). */
  def trainSubCentroids(vectors: DataFrame): DataFrame = {
    val sub = subvectors(vectors, "vec_id")
    val seedW = Window.orderBy(col("h").asc, col("vec_id").asc)
    val seeds = vectors.select(col("vec_id"))
      .withColumn("h", TextOps.hash56(col("vec_id").cast("string")))
      .orderBy(col("h").asc, col("vec_id").asc).limit(K)
      // K-row window: numbering the codebook, not the corpus
      .withColumn("code", row_number().over(seedW).cast("long") - 1L)
      .select("vec_id", "code")
    var cents = sub.join(seeds, "vec_id")
      .select(col("s"), col("code"), col("sv").as("cv"))
      .localCheckpoint()
    for (_ <- 1 to Iters) {
      cents = assign(sub, cents)
        .select(col("s"), col("code"), posexplode(col("sv")).as(Seq("dim", "x")))
        .groupBy("s", "code", "dim")
        // decimal-exact sum, ONE IEEE division — the q33/q83 mean rule
        .agg((sum(col("x").cast("decimal(28,12)")).cast("double") / count(lit(1)))
          .as("m"))
        .groupBy("s", "code")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("s"), col("code"), transform(col("dm"), _.getField("m")).as("cv"))
        .localCheckpoint()
    }
    cents
  }

  /** The code table — the PQ-compressed corpus: (vec_id, s, code). */
  def encode(vectors: DataFrame, cents: DataFrame): DataFrame =
    assign(subvectors(vectors, "vec_id"), cents).select("vec_id", "s", "code")

  /** ADC scores for a candidate set: per query, a (M·K)-entry lookup
    * table of exact query-subvector × sub-centroid dot products
    * broadcasts onto the candidates' code rows; the approximate
    * dot(query, candidate) is the M-term sum of LUT hits, summed as
    * decimals so partial-merge order can't wiggle the last ulp.
    * `cand`: (query_id, vec_id); output: (query_id, neighbor_id, score)
    * with score = round(Σ parts, 4). */
  def adcScores(cand: DataFrame, codes: DataFrame, cents: DataFrame,
                queries: DataFrame): DataFrame = {
    val lut = subvectors(queries, "query_id")
      .join(broadcast(cents.select("s", "code", "cv")), "s")
      .select(col("query_id"), col("s"), col("code"),
        VectorOps.dot(col("sv"), col("cv")).as("part"))
    cand.join(codes, "vec_id")
      .join(broadcast(lut), Seq("query_id", "s", "code"))
      .groupBy("query_id", "vec_id")
      .agg(sum(col("part").cast("decimal(28,12)")).as("sdec"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("sdec").cast("double"), 4).as("score"))
  }
}
