package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming dedup-within-watermark (SURVEY.md §2.4): drop repeated keys
  * as they arrive, keeping bounded state — the streaming face of the
  * exact-dedup operator (q17). The watermark bounds how long a key is
  * remembered, which is what makes the state finite on an unbounded
  * stream at scale.
  */
object StreamingDedup {

  /** First event per (user_id, event_type) within the watermark horizon;
    * runs the bounded stream to completion and returns the result. */
  def firstPerUserType(spark: SparkSession, sfDir: String): DataFrame = {
    val deduped = EventStreams.eventsStream(spark, sfDir)
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id", "event_type")
    EventStreams.drain(deduped, "append")
  }
}
