package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming twin of the batch tumbling window (q14): the same
  * logical aggregation driven by `MicroBatchExecution` instead of a batch
  * job — mirroring how the reference runs one loop body for bounded and
  * unbounded sources alike (`/root/reference/uav/main.py:97,109`).
  *
  * The reference has no watermark/late-data handling (frames are processed
  * strictly in arrival order), so the faithful mode here is complete-mode
  * aggregation with no watermark; the batch-parity invariant (stream
  * result == q14 batch result) is the correctness check (SURVEY.md §5.2.4).
  */
object StreamingTumbling {

  /** Physical schema of events.parquet: ts is TIMESTAMP(NANOS), which we
    * must read as long (nanosAsLong) and truncate to µs — same as the
    * batch path in [[graft.Tables]]. */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Runs the 1-minute tumbling count/sum over the events stream to
    * completion (the parquet file is a bounded stream here; on a real
    * unbounded source the identical plan keeps running per trigger). */
  def tumblingPerMinute(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The file stream source wants a directory; pathGlobFilter narrows it
    // to the events table only.
    val stream = spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

    val agg = stream
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("minute"), col("n"), col("sum_value"))

    val sink = "q25_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val query = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(sink)
      .start()
    try query.processAllAvailable()
    finally query.stop()

    spark.table(sink).orderBy("minute")
  }
}
