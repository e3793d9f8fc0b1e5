package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — the last §2.4 streaming
  * semantic with per-side state: BOTH join inputs are unbounded, so the
  * engine must buffer each side keyed by the join key and evict by
  * watermark. (q58 covers stream⋈static, q61/q65 windowed state,
  * q62/q63 keyed dedup/custom state; nothing before this held state on
  * two streams at once.)
  *
  * Shape: for every `purchase` event, the `error` events of the SAME
  * user whose event time falls in `[purchase_ts, purchase_ts + 6 h]` —
  * the "errors shortly after a purchase" diagnostic join. (6 hours fits
  * the fixture's density — events span a month, so a minutes-wide
  * window matches nothing; at sf0.1 this yields ~2.3k pairs.) The
  * time-range predicate is what bounds state: with both sides
  * watermarked, Spark derives each side's state horizon from the
  * interval (a purchase can stop waiting once the watermark passes
  * `p_ts + 6 h`; an error once it passes `e_ts`), so per-side state is
  * O(events inside the horizon), not O(stream). Without the range
  * condition the state requirement is unbounded — the interval is
  * load-bearing at 100 TB, not decoration.
  *
  * Inner-join append-mode emissions are exactly the on-time matched
  * pairs; with the bounded harness replay every pair is on-time, so the
  * result equals the batch twin join (the q25/q14 parity argument), and
  * the oracle is that batch SQL.
  */
object StreamStreamJoin {

  /** (user_id, purchase_id, error_id, delta_us) for error events within
    * six hours after a purchase by the same user. Drained through the
    * executor-parallel file sink. */
  def purchaseErrorPairs(spark: SparkSession, sfDir: String): DataFrame = {
    // Two independent readStream instances: each side of a
    // stream-stream join must be its own source node (a shared one
    // would make the self-join a single-scan plan, not two streams).
    val purchases = EventStreams.eventsStream(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val errors = EventStreams.eventsStream(spark, sfDir)
      .filter(col("event_type") === "error")
      .select(col("user_id").as("e_user_id"), col("event_id").as("error_id"),
        col("ts").as("e_ts"))
      .withWatermark("e_ts", "1 hour")
    val joined = purchases.join(errors,
      col("user_id") === col("e_user_id") &&
        col("e_ts") >= col("p_ts") &&
        col("e_ts") <= col("p_ts") + expr("interval 6 hours"))
      .select(col("user_id"), col("purchase_id"), col("error_id"),
        (unix_micros(col("e_ts")) - unix_micros(col("p_ts"))).as("delta_us"))
    EventStreams.drainToFiles(joined, "append")
  }
}
