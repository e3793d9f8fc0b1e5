package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-ordered layout registry: the MULTI-dimension pruning lever (q105),
  * completing the layout triad — hive partitioning prunes one
  * low-cardinality column (q82, [[PartitionedTables]]), bucketing
  * co-locates one join key (q73, [[BucketedTables]]), and Z-ordering
  * keeps BOTH coordinates of a 2-D box predicate narrow within every
  * file so parquet footer stats prune on either dimension.
  *
  * The layout pass computes the Morton code ([[ZOrder.zval]]) of the
  * (user bucket, value bucket) pair, range-partitions on it, and sorts
  * within partitions — so each of the [[NumFiles]] output files covers a
  * contiguous z interval, which is exactly what makes the pushed
  * interval screen ([[ZOrder.zRanges]]) skip whole files. Persisting the
  * z column in the file means the pushed predicate compares against
  * plain parquet stats — no expression evaluation at listing time.
  *
  * Build-once per (session, dir), charged to the bench's `shared_build`
  * (`zorder_layout`) like the other standing layouts; data lands in a
  * per-build temp dir (a layout demonstration over the read-only
  * fixtures — a real deployment z-orders the primary copy).
  */
object ZOrderTables {

  val NumFiles = 8

  /** Grid coordinates: both clamp into the 1024-cell grid via modulo —
    * closed-form, mirrored 1:1 in the oracle SQL. POSITIVE modulo on
    * both engines (ADVICE r10): Spark's pmod is always non-negative,
    * but a bare `%` in DuckDB follows the dividend's sign — a negative
    * value (refunds) or user_id would silently diverge the mirrors, so
    * the SQL uses the ((x % g) + g) % g double-mod form. */
  def xCol = pmod(col("user_id"), lit(ZOrder.Grid))
  def yCol = pmod(floor(col("value")).cast("long"), lit(ZOrder.Grid))

  val XSql = s"((user_id % ${ZOrder.Grid}) + ${ZOrder.Grid}) % ${ZOrder.Grid}"
  val YSql =
    s"((CAST(floor(value) AS BIGINT) % ${ZOrder.Grid}) + ${ZOrder.Grid}) % ${ZOrder.Grid}"

  /** Ensures the z-ordered events layout exists for (session, dir);
    * returns its root path. The write job runs outside any monitor via
    * [[Caches.memo]]'s per-key latch. */
  def eventsZOrdered(spark: SparkSession, dir: String): String =
    Caches.memo(spark, dir, "zorder_events") {
      val baseDir = java.nio.file.Files.createTempDirectory("graft-zorder-")
      TempDirs.cleanupOnExit(baseDir) // layout lives until the JVM exits
      val base = baseDir.toString + "/events"
      Tables.events(spark, dir)
        .withColumn("zval", ZOrder.zval(xCol, yCol))
        .repartitionByRange(NumFiles, col("zval"))
        .sortWithinPartitions("zval")
        .write.parquet(base)
      base
    }

  /** Materializes the layout (Bench times this as shared build). */
  def warm(spark: SparkSession, dir: String): Unit = {
    eventsZOrdered(spark, dir)
    ()
  }
}
