package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-input watermark semantics (q230) — the one watermark face the
  * single-input streams (q61/q65) and the two-sided joins (q71/q222/
  * q225) never exercise: a UNION of streams whose watermarks advance at
  * DIFFERENT rates. Real pipelines hit this constantly — a low-latency
  * click feed unioned with a batched, hours-late export of the same
  * event schema — and the engine must decide which clock gates the
  * shared downstream aggregation.
  *
  * Spark's rule (`spark.sql.streaming.multipleWatermarkPolicy`, default
  * `min`): the GLOBAL watermark is the minimum of the per-input
  * watermarks, so the SLOWEST input gates every finalization. That is
  * the safe choice — a window may only finalize when NO input can still
  * deliver on-time rows for it — and it is load-bearing at 100 TB: with
  * `max` instead, the fast feed would finalize windows the slow feed is
  * still filling, silently dropping the laggard's rows as late. The
  * price of `min` is withheld output (here the slow side's 3 h horizon
  * holds back windows the fast side proved long ago), which is exactly
  * the latency/completeness trade the policy knob names.
  *
  * Harness shape: the purchase slice streams with a 30-minute watermark
  * delay, everything else with 3 hours; the union feeds one tumbling
  * per-hour (window, type) count in append mode. The closing global
  * watermark is min(max_purchase_ts − 30 min, max_other_ts − 3 h) at
  * millisecond precision (the q61 rule: Spark tracks event-time stats
  * in ms), and the oracle is the batch twin restricted to windows whose
  * end that watermark passed. MultiWatermarkSpec pins the policy
  * direction: under `max` the same bounded replay finalizes strictly
  * more windows (the fast clock's horizon), matching the max-horizon
  * batch twin.
  */
object MultiWatermark {

  val FastDelay = "30 minutes"
  val SlowDelay = "3 hours"

  /** The union plan (two independently-watermarked scans of the same
    * bounded source, disjoint slices) feeding one windowed count. */
  def unionTumblingCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val fast = EventStreams.eventsStream(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .withWatermark("ts", FastDelay)
    val slow = EventStreams.eventsStream(spark, sfDir)
      .filter(col("event_type") =!= "purchase")
      .withWatermark("ts", SlowDelay)
    fast.unionByName(slow)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"))
  }

  /** Runs the bounded replay to completion through the file sink. */
  def hourlyCountsToFiles(spark: SparkSession, sfDir: String): DataFrame =
    EventStreams.drainToFiles(unionTumblingCounts(spark, sfDir), "append")
}
