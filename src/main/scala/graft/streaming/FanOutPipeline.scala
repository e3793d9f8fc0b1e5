package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Letterbox

/** The reference's flagship pipeline shape (D1, `/root/reference/uav/
  * main.py:109-160`): ONE source fanned out to TWO sinks —
  * sink A records every frame (`FrameSaver`, every record), sink B gets
  * the sampled branch (every Nth frame → letterbox projection → send).
  *
  * In Structured Streaming the two-sink fan-out runs inside
  * `foreachBatch`: both writes happen per micro-batch against the same
  * batch DataFrame, giving the atomic "one pass, two consumers" semantics
  * the reference achieves with its single sequential loop
  * (SURVEY.md §4.1 "single sequential pass shared by both sinks").
  */
object FanOutPipeline {

  /** Runs the fan-out to completion over the bounded events stream.
    * @param keyframeInterval every-Nth sampling (reference default 30)
    * @return (rows written to sink A, rows written to sink B) */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          keyframeInterval: Int = EventStreams.KeyframeInterval): (Long, Long) = {
    val stream = EventStreams.eventsStream(spark, sfDir)

    val query = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val df = batch.persist() // one decode pass shared by both sinks
        // sink A: record-all (FrameSaver analog)
        df.write.mode("append").parquet(s"$outDir/all")
        // sink B: sampled branch -> letterbox projection -> send analog
        val w = (col("event_id") % 1920 + 1).cast("long")
        val h = (col("event_id") * 7 % 1080 + 1).cast("long")
        val g = Letterbox.geometry(w, h, 640)
        df.filter(col("event_id") % keyframeInterval === 0)
          .select(col("event_id"), g.newW.as("new_w"), g.newH.as("new_h"),
            to_json(struct(col("event_id"), col("event_type"), col("value")))
              .as("payload"))
          .write.mode("append").parquet(s"$outDir/sampled")
        df.unpersist()
        ()
      }
      .start()
    try query.processAllAvailable()
    finally query.stop()

    (spark.read.parquet(s"$outDir/all").count(),
      spark.read.parquet(s"$outDir/sampled").count())
  }
}
