package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable dense 0-based row-id assignment over a total order.
  *
  * Semantics of the reference's positional `frame_number` counter
  * (`/root/reference/uav/frame_reader.py:102-104`): every record gets a
  * dense, gap-free position in stream order.
  *
  * A naive `row_number().over(Window.orderBy(...))` funnels ALL rows
  * through ONE task (empty `partitionBy`) — correct on 60k rows, dead at
  * 100 TB. Instead we use the canonical two-pass scheme (the same idea as
  * `RDD.zipWithIndex`), kept entirely in the DataFrame API:
  *
  *  1. range-partition + sort by the key (Spark's distributed sort);
  *  2. count rows per physical partition (tiny aggregate, one row per
  *     partition);
  *  3. broadcast the per-partition cumulative offsets back and add the
  *     within-partition `row_number` (window partitioned by partition id,
  *     so it parallelizes across the cluster).
  *
  * The sorted intermediate is persisted so both passes observe the same
  * physical partitioning (range-partitioner sampling must not re-run
  * between the count pass and the id pass).
  */
object RowIds {

  /** Adds `idCol` = dense 0-based rank of the row under `order`.
    * `order` must be a total order (unique key) for deterministic output.
    */
  def withDenseId(df: DataFrame, order: Seq[Column], idCol: String): DataFrame = {
    val pid = "__graft_pid"
    val off = "__graft_offset"
    // scoped persist: released by the harness at query end (Caches) — at
    // one dense-id pass per query over a 60-query session, an unscoped
    // persist here was the main storage-memory leak of round 2.
    val sorted = graft.Caches.scopedPersist(df
      .repartitionByRange(order.map(_.asc): _*)
      .sortWithinPartitions(order.map(_.asc): _*)
      .withColumn(pid, spark_partition_id()))

    // one row per partition — broadcastable at any scale (≤ #partitions)
    val counts = sorted.groupBy(col(pid)).count()
    val cumW = Window.orderBy(col(pid)).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn(off, coalesce(sum(col("count")).over(cumW), lit(0L)))
      .drop("count")

    val withinW = Window.partitionBy(col(pid)).orderBy(order.map(_.asc): _*)
    sorted
      .join(broadcast(offsets), pid)
      .withColumn(idCol, row_number().over(withinW).cast("long") + col(off) - 1L)
      .drop(pid, off)
  }

  /** Dense 0-based rank of a SUBSET of rows that already carry a global
    * dense id (`idCol`, a [[withDenseId]] output) — e.g. a filtered slice
    * of the session-shared sorted relation.
    *
    * No re-sort and no range-partitioner sampling pass: partitioning is
    * pure ARITHMETIC on the existing id (`bucket = idCol div blockSize`).
    * Buckets are disjoint, ordered id ranges by construction, so the
    * two-pass offset scheme applies directly: per-bucket counts (tiny,
    * one row per non-empty bucket) → cumulative offsets → within-bucket
    * `row_number` (window partitioned by bucket — parallel). Cannot
    * depend on physical partition layout, unlike a
    * `spark_partition_id()`-based shortcut: a [[withDenseId]] output is
    * hash-clustered by its internal pid, so its physical partition ORDER
    * is unrelated to key order.
    *
    * The offsets window runs one task over `maxId/blockSize` rows — at
    * 10^12 rows and the default 2^20 block, ~10^6 rows: broadcast-sized.
    */
  def subsetRank(df: DataFrame, idCol: String, outCol: String,
                 blockSize: Long = 1L << 20): DataFrame = {
    require(blockSize > 0, s"blockSize must be positive, got $blockSize")
    val bkt = "__graft_bkt"
    val off = "__graft_offset"
    // SQL integer div, not IEEE divide-then-floor (exact past 2^53).
    // idCol is spliced into SQL text, so quote it: backticks (with
    // embedded backticks doubled) keep names with dots/spaces/hyphens
    // resolving as one column instead of failing to parse.
    val quoted = "`" + idCol.replace("`", "``") + "`"
    val tagged = df.withColumn(bkt, expr(s"$quoted div ${blockSize}L"))
    val counts = tagged.groupBy(col(bkt)).count()
    val cumW = Window.orderBy(col(bkt)).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn(off, coalesce(sum(col("count")).over(cumW), lit(0L)))
      .drop("count")
    val withinW = Window.partitionBy(col(bkt)).orderBy(col(idCol).asc)
    tagged
      .join(broadcast(offsets), bkt)
      .withColumn(outCol, row_number().over(withinW).cast("long") + col(off) - 1L)
      .drop(bkt, off)
  }
}
