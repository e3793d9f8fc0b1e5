package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q61: watermarked append-mode tumbling — the scale form of q25.
  * Verifies (1) stream/batch parity restricted to on-time windows, and
  * (2) the engine drops-and-counts rows arriving later than the
  * watermark (`numRowsDroppedByWatermark`).
  */
class WatermarkSpec extends SparkSpec {

  test("append-mode result equals the batch twin restricted to on-time windows") {
    val out = StreamingTumbling.tumblingPerMinuteWatermarked(spark, sf0001)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))

    val events = graft.Tables.events(spark, sf0001)
    // Spark tracks event-time stats in ms: µs max truncated to ms
    val wmMs = events.agg(max(col("ts"))).head().getTimestamp(0).getTime - 600000L
    val batch = events
      .groupBy(date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    val all = batch.orderBy("minute").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
    val expected = all.filter { case (m, _, _) => m.getTime + 60000L <= wmMs }

    assert(expected.nonEmpty && expected.length < all.length,
      "fixture must withhold some tail windows or the watermark is untested")
    assert(out.sortBy(_._1.getTime).toSeq == expected.toSeq)
  }

  test("rows later than the watermark are dropped by the engine and counted") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

    val mem = MemoryStream[(Timestamp, Double)]
    val agg = StreamingTumbling.watermarkedPerMinute(
      mem.toDF().toDF("ts", "value"), "10 minutes")

    val dir = java.nio.file.Files.createTempDirectory("graft_wm").toString + "/out"
    val query = agg.writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode("append").parquet(dir)
        ()
      }
      .start()
    try {
      // batch 1: advances the watermark to 00:30 − 10 min = 00:20
      mem.addData((t(0), 1.0), (t(1), 2.0), (t(30), 3.0))
      query.processAllAvailable()
      // batch 2: t(5) is behind the 00:20 watermark → engine-dropped;
      // t(40) is on time and pushes the watermark to 00:30
      mem.addData((t(5), 100.0), (t(40), 4.0))
      query.processAllAvailable()
    } finally query.stop()

    val dropped = query.recentProgress
      .flatMap(p => Option(p.stateOperators).toSeq.flatten)
      .map(_.numRowsDroppedByWatermark).sum
    assert(dropped == 1L, "exactly the one late row must be engine-dropped")

    val rows = spark.read.parquet(dir).orderBy("minute")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
    // finalized: windows 00:00 and 00:01 (ends <= final 00:30 watermark);
    // the dropped row contributes nowhere — no 00:05 window exists;
    // 00:30/00:40 stay in state (ends past the watermark), not emitted
    assert(rows.toSeq == Seq((t(0), 1L, 1.0), (t(1), 1L, 2.0)))
  }
}
