package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming dedup-within-watermark (SURVEY.md §2.4): drop repeated keys
  * as they arrive, keeping bounded state — the streaming face of the
  * exact-dedup operator (q17).
  *
  * Uses `dropDuplicatesWithinWatermark`, not `dropDuplicates`: plain
  * `dropDuplicates` on a subset of columns NOT including the event-time
  * column never evicts its state even under a watermark, so its state
  * grows without bound on a real unbounded stream. The withinWatermark
  * variant expires a key once the watermark passes its last-seen event
  * time + delay, which is what actually makes the state finite at scale.
  */
object StreamingDedup {

  /** First event per (user_id, event_type) within the watermark horizon;
    * runs the bounded stream to completion and returns the result. On the
    * bounded single-batch test stream this equals a global first-per-key. */
  def firstPerUserType(spark: SparkSession, sfDir: String): DataFrame = {
    val deduped = EventStreams.eventsStream(spark, sfDir)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
    EventStreams.drainToFiles(deduped, "append")
  }
}
