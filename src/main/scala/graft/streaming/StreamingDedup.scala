package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming dedup-within-watermark (SURVEY.md §2.4): drop repeated keys
  * as they arrive, keeping bounded state — the streaming face of the
  * exact-dedup operator (q17). The watermark bounds how long a key is
  * remembered, which is what makes the state finite on an unbounded
  * stream at scale.
  */
object StreamingDedup {

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** First event per (user_id, event_type) within the watermark horizon;
    * runs the bounded stream to completion and returns the result. */
  def firstPerUserType(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

    val deduped = stream
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id", "event_type")

    val sink = "dedup_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = deduped.writeStream.outputMode("append").format("memory").queryName(sink).start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(sink)
  }
}
