package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Event-time-timer sessionization (the registerTimer/handleExpiredTimer
  * half of the new state API): in-data gap closes, watermark-driven idle
  * closes, and parity of every CLOSED session with the gaps-and-islands
  * batch truth.
  */
class SessionTimersSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("gap events close in-data; idle sessions close when the watermark passes the deadline") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext

    val mem = MemoryStream[(Long, Timestamp)]
    val in = mem.toDF().toDF("user_id", "ts")
    val out = SessionTimers.withRocksDb(spark) {
      val sink = "session_timer_sink"
      val q = SessionTimers.sessions(spark, in)
        .writeStream.outputMode("append").format("memory").queryName(sink).start()
      try {
        // batch 1: user 1 session A (0s, 60s) — stays open (no watermark yet)
        mem.addData((1L, ts(0)), (1L, ts(60)))
        q.processAllAvailable()
        // batch 2: user 1 events at 1000s/1030s — 1000-60 > 300s gap, so
        // session A closes IN-DATA and session B (1000..1030) opens
        mem.addData((1L, ts(1030)), (1L, ts(1000))) // reversed arrival on purpose
        q.processAllAvailable()
        // batch 3: user 2 appears at 5000s — watermark is still 1030s
        // (batch 2's max), so B's 1330s deadline has NOT passed yet
        mem.addData((2L, ts(5000)))
        q.processAllAvailable()
        // batch 4: watermark is now 5000s (batch 3's max) → B's timer
        // fires; user 2's event extends session C, which stays open
        mem.addData((2L, ts(5001)))
        q.processAllAvailable()
      } finally q.stop()
      spark.table(sink)
        .select("user_id", "start_ms", "end_ms", "n_events", "closed_by")
        .as[(Long, Long, Long, Long, String)].collect().toSet
    }

    assert(out === Set(
      (1L, 0L, 60000L, 2L, "gap"),       // A: closed by the later event
      (1L, 1000000L, 1030000L, 2L, "timer"))) // B: closed by the watermark
    // C (user 2, 5000..5001s) must remain open: the final watermark
    // (5000s) never passed its 5301s deadline — a live deployment would
    // also still be waiting for more events.
  }

  test("closed sessions equal the batch gaps-and-islands truth minus the still-open tails") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext

    // deterministic fixture: 3 users, events strided so every user has
    // several gap-separated sessions; fed in 3 event-time-ordered batches
    val events = for {
      u <- 1L to 3L
      s <- 0L until 4L            // 4 sessions per user
      i <- 0L until (u + 1L)      // u+1 events per session
    } yield (u, s * 1000L + u * 17L + i * 30L) // gaps of 1000s >> 300s
    val sortedEv = events.sortBy(_._2)
    val batches = sortedEv.grouped((sortedEv.size + 2) / 3).toSeq

    val mem = MemoryStream[(Long, Timestamp)]
    val in = mem.toDF().toDF("user_id", "ts")
    val streamed = SessionTimers.withRocksDb(spark) {
      val sink = "session_timer_parity_sink"
      val q = SessionTimers.sessions(spark, in)
        .writeStream.outputMode("append").format("memory").queryName(sink).start()
      try {
        batches.foreach { b =>
          mem.addData(b.map { case (u, sec) => (u, ts(sec)) }: _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      spark.table(sink).select("user_id", "start_ms", "end_ms", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
    }

    // batch truth: gaps-and-islands over the same rows
    val df = sortedEv.toDF("user_id", "sec")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("sec")
    val truth = df
      .withColumn("prev", lag(col("sec"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("sec") - col("prev") > 300L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min(col("sec")).as("start_s"), max(col("sec")).as("end_s"),
        count(lit(1)).as("n"))
    val allSessions = truth
      .select(col("user_id"), (col("start_s") * 1000).as("start_ms"),
        (col("end_s") * 1000).as("end_ms"), col("n"))
      .as[(Long, Long, Long, Long)].collect().toSet
    // the still-open tails: per user, the session with the latest start
    // whose deadline the final watermark (global max event time) never
    // passed
    val finalWmMs = sortedEv.map(_._2).max * 1000L
    val openTails = allSessions.groupBy(_._1).values.map(_.maxBy(_._2))
      .filter(s => s._3 + SessionTimers.GapMs > finalWmMs).toSet

    assert(streamed === allSessions -- openTails,
      "every closed session must equal a batch session; only unreachable tails stay open")
    assert(openTails.nonEmpty, "the fixture must actually exercise an open tail")
  }
}
