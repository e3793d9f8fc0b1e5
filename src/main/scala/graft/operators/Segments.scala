package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Contiguous stream segmentation (the reference's video splitter,
  * `/root/reference/uav/video_splitter.py:27-79`) re-expressed
  * relationally and shuffle-friendly.
  *
  * A global `ntile(k).over(Window.orderBy(...))` single-threads the whole
  * stream through one task. Given a dense 0-based row id (see [[RowIds]])
  * the tile assignment is pure arithmetic — embarrassingly parallel and
  * exactly equal to SQL `ntile` semantics (first `n % k` tiles get
  * `n/k + 1` rows).
  */
object Segments {

  /** `ntile(k)` computed arithmetically from a dense 0-based id column.
    * `df` must carry `idCol`; the row count is injected via a broadcast
    * single-row cross join so the plan stays fully distributed.
    */
  def ntileFromDenseId(df: DataFrame, idCol: String, k: Int, segCol: String): DataFrame = {
    val n = "__graft_n"
    val counts = df.agg(count(lit(1)).as(n))
    // true integer division (SQL `div`), not double-divide-then-truncate:
    // an IEEE quotient can round across an integer boundary once the
    // numerator passes ~2^53, silently shifting tile assignment at the
    // row counts this operator exists for. CASE evaluates lazily, so the
    // `div __graft_q` branch never runs when q = 0 (n < k).
    val seg = expr(
      s"""CASE WHEN $idCol < (($n div $k) + 1) * ($n % $k)
         |  THEN $idCol div (($n div $k) + 1)
         |  ELSE ($n % $k) + (($idCol - (($n div $k) + 1) * ($n % $k)) div ($n div $k))
         |END + 1L""".stripMargin)
    df.crossJoin(broadcast(counts))
      .withColumn(segCol, seg)
      .drop(n)
  }

  /** Seeded-random segment boundary table `[lo, hi)` — the faithful analog
    * of the reference's `random.sample(range(1, total), k-1)` + sort
    * (`video_splitter.py:48-49`): k-1 pseudo-random cut points, distinct
    * and sorted, splitting `[0, total)` into k non-empty segments.
    *
    * Randomness comes from a deterministic md5-derived draw per segment
    * (jittered stratified sampling): cut i lands uniformly inside stratum
    * `[i·total/k, (i+1)·total/k)`. Strata are disjoint and increasing, so
    * the cuts are distinct-and-sorted *by construction* — no rejection
    * loop — while staying bit-reproducible across engines (md5, not a
    * seeded murmur), hence oracle-checkable in DuckDB.
    *
    * The reference raises ValueError when `total < k + 1`
    * (`video_splitter.py:43-44`); the relational form degrades gracefully
    * instead — a plan-time throw has no scalable analog. While
    * `total >= k` every stratum has width >= 1 and all k segments are
    * non-empty; when `total < k` the zero-width strata are dropped, so
    * the output is `min(k, total)` non-empty segments (segment ids keep
    * their stratum numbers, so they may be non-contiguous) rather than
    * k-with-empties — every emitted `[lo, hi)` always holds >= 1 row.
    */
  def randomBoundaries(df: DataFrame, k: Int, seed: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextOps
    val total = df.agg(count(lit(1)).as("__t"))
    val w = Window.orderBy(col("segment"))
    df.sparkSession.range(k).toDF("segment")
      .crossJoin(broadcast(total))
      // integer div: see ntileFromDenseId on the 2^53 double cliff
      .withColumn("__start", expr(s"(segment * __t) div $k"))
      .withColumn("__width", expr(s"((segment + 1) * __t) div $k - (segment * __t) div $k"))
      // degenerate total < k: a zero-width stratum would emit an empty
      // [x, x) segment whose lo collides with its neighbor — drop it
      // BEFORE the lead(), so consecutive lo stay strictly increasing
      .filter(col("__width") > 0)
      .withColumn("lo",
        when(col("segment") === 0, lit(0L)) // first segment always starts at 0
          .otherwise(col("__start") +
            TextOps.hash56(concat(lit(seed + "_"), col("segment").cast("string")))
              % col("__width")))
      .withColumn("hi", coalesce(lead(col("lo"), 1).over(w), col("__t")))
      .select("segment", "lo", "hi")
  }

  /** Segment boundary table `[lo, hi)` for k contiguous, near-equal-width
    * segments over `[0, total)` — the deterministic analog of the
    * reference's random cut points (`video_splitter.py:48-49`), formed the
    * same way: boundary list → `lead()` to turn boundaries into ranges.
    */
  def boundaries(df: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val total = df.agg(count(lit(1)).as("__t"))
    val segs = df.sparkSession.range(k).toDF("segment")
      .crossJoin(broadcast(total))
      // integer div: see ntileFromDenseId on the 2^53 double cliff
      .withColumn("lo", expr(s"(segment * __t) div $k"))
    // k rows — the window over them is trivially cheap
    val w = Window.orderBy(col("segment"))
    segs
      .withColumn("hi", coalesce(lead(col("lo"), 1).over(w), col("__t")))
      .drop("__t")
  }
}
