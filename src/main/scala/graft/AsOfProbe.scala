package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Shuffle-volume probe for the two as-of join forms: wall-clock at one
  * SF understates the native operator's point (per-stage fixed costs
  * dominate sub-second queries), so this measures what actually scales —
  * bytes through the exchanges. The composed form shuffles the tagged
  * UNION of both sides, every row null-padded to carry both sides'
  * payload structs; the native form shuffles each side at its own width.
  *
  * Run: sbt "runMain graft.AsOfProbe [sfDir]". */
object AsOfProbe {
  /** Full traversal across AQE boundaries: AdaptiveSparkPlanExec and the
    * QueryStageExec wrappers (Shuffle/Broadcast/Result) are all LEAF
    * nodes whose real subtree hangs off a separate field, so a plain
    * `collect` never reaches the materialized exchanges. */
  private def deep(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: deep(a.executedPlan)
    case q: QueryStageExec => q +: deep(q.plan)
    case n => n +: n.children.flatMap(deep)
  }

  private def shuffledBytes(df: DataFrame): (Long, Long) = {
    // run THIS plan instance and read its metrics: df.count() would plan
    // (and execute) a separate aggregate query whose metrics these
    // executedPlan nodes never see
    val executed = df.queryExecution.executedPlan
    val n = executed.execute().count()
    val bytes = deep(executed).collect {
      case e: ShuffleExchangeExec => e.metrics.get("dataSize").map(_.value).getOrElse(0L)
    }.sum
    (bytes, n)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = Tables.events(spark, sfDir)
    val left = e.select("event_id", "user_id", "ts")
    val right = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))

    // no output sort on either side: probe the join's own shuffles only
    val (composedBytes, n1) = shuffledBytes(
      graft.operators.AsOfJoin.lastAtOrBefore(left, right, "user_id", "ts", "purchase_id"))
    Caches.releaseScoped()
    val (nativeBytes, n2) = shuffledBytes(
      graft.operators.AsOfJoin.lastAtOrBeforeNative(left, right, "user_id", "ts", "purchase_id"))
    Caches.releaseScoped()
    require(n1 == n2, s"row-count mismatch: composed $n1 vs native $n2")

    println(f"[asof] composed union+window shuffle: ${composedBytes / 1048576.0}%8.2f MiB over $n1 rows")
    println(f"[asof] native merge-walk shuffle:     ${nativeBytes / 1048576.0}%8.2f MiB over $n2 rows")
    println(f"[asof] native/composed ratio:         ${nativeBytes.toDouble / composedBytes}%.3f")
    spark.stop()
  }
}
