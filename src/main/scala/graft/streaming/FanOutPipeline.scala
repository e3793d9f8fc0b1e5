package graft.streaming

import org.apache.spark.sql.{Column, Observation, SparkSession}
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
  *
  * Sink A enforces the reference's bind-then-drop-mismatch contract
  * (`frame_processing.py:163-179`): the FIRST record binds the sink's
  * (w, h); any later record with different dims is dropped with a
  * warning, not written. The drop count is taken from an [[Observation]]
  * on the same pass that writes — no second scan, no collect.
  *
  * Delivery-accounting caveat: the dims bind and the drop counter are
  * driver-side mutable state over a NON-idempotent append sink, so if
  * Spark retries a micro-batch after a transient write failure, sink A
  * rows are re-appended and drops re-counted (and a retried FIRST batch
  * could re-bind) — at-least-once, where the reference's sequential loop
  * is exactly-once. The bounded harness runs never retry; an
  * exactly-once variant would partition sink output by `batchId`,
  * overwrite that partition, and fold the drop count from an idempotent
  * per-batch record instead of a driver accumulator.
  */
object FanOutPipeline {

  /** Rows written to sink A / sink B, plus sink A's dimension-mismatch
    * drops (reference `frame_processing.py:176-179`). */
  final case class FanOutCounts(all: Long, sampled: Long, dropped: Long)

  /** Runs the fan-out to completion over the bounded events stream.
    *
    * @param keyframeInterval every-Nth sampling (reference default 30)
    * @param dims per-record (width, height) columns for sink A's schema
    *             bind. Defaults to constants — the reference reads one
    *             camera, so all frames share dims and nothing drops; a
    *             mixed-dimension stream (FanOutSpec) exercises the guard.
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          keyframeInterval: Int = EventStreams.KeyframeInterval,
          dims: (Column, Column) = (lit(1920L), lit(1080L))): FanOutCounts = {
    val stream = EventStreams.eventsStream(spark, sfDir)
    val (wc, hc) = dims
    // Bound once from the first record the sink ever sees, exactly like
    // the reference's lazy writer init; lives across micro-batches.
    var bound: Option[(Long, Long)] = None
    var dropped = 0L

    val query = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val df = batch.persist() // one decode pass shared by both sinks
        if (bound.isEmpty && !df.isEmpty) {
          // first record by stream position binds the writer's dims
          val first = df.orderBy("event_id")
            .select(wc.cast("long"), hc.cast("long")).head()
          bound = Some((first.getLong(0), first.getLong(1)))
        }
        // sink A: record-all (FrameSaver analog), mismatched dims dropped
        val (bw, bh) = bound.getOrElse((0L, 0L))
        val keep = wc.cast("long") === bw && hc.cast("long") === bh
        val obs = Observation()
        df.observe(obs,
            count(when(!keep, lit(1))).as("dropped")) // count: 0 on empty, never null
          .filter(keep)
          .write.mode("append").parquet(s"$outDir/all")
        val d = obs.get("dropped").asInstanceOf[Long]
        if (d > 0) {
          dropped += d
          System.err.println(s"[fanout] dropped $d frame(s) with dims != ${bw}x$bh")
        }
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

    FanOutCounts(
      spark.read.parquet(s"$outDir/all").count(),
      spark.read.parquet(s"$outDir/sampled").count(),
      dropped)
  }
}
