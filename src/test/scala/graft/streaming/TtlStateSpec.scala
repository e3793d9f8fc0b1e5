package graft.streaming

import org.apache.spark.sql.streaming.TTLConfig

import graft.SparkSpec

/** Both directions of q228's TTL contract, driven through the SAME
  * two-batch RocksDB harness the gate face uses
  * ([[TtlStateExpiry.replayTwoBatches]]) with spec-chosen TTLs:
  *
  *  - SHORT TTL + a gap longer than it → a planted entry seen only in
  *    batch 0 is GONE from batch-1 state (the count restarts, and the
  *    key is absent from the batch-1 emission entirely);
  *  - LONG TTL (longer than any run) + no forced gap → nothing expires
  *    and batch 1 emits RUNNING totals — the q212 MapState behavior,
  *    proving the expiry above is the TTL's doing, not an accident of
  *    the harness losing state across the boundary.
  */
class TtlStateSpec extends SparkSpec {
  import spark.implicits._

  // batch 0: user 1 → a,a and b; user 2 → a. batch 1: user 1 → b.
  private def b0 = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"))
    .toDF("user_id", "event_type")
  private def b1 = Seq((1L, "b")).toDF("user_id", "event_type")

  test("short TTL + gap: batch-1 state starts empty — expired entries are gone") {
    val raw = TtlStateExpiry.replayTwoBatches(spark, b0, b1,
        TTLConfig(java.time.Duration.ofMillis(500)), gapMs = 2000)
      .as[(Long, String, Long, Long)].collect()
    val batch0 = raw.filter(_._4 == 0L).map(r => (r._1, r._2, r._3)).toSet
    val batch1 = raw.filter(_._4 == 1L).map(r => (r._1, r._2, r._3)).toSet
    assert(batch0 === Set((1L, "a", 2L), (1L, "b", 1L), (2L, "a", 1L)))
    // user 1's 'a' (batch-0 only) is ABSENT, and 'b' restarted at 1,
    // not 2 — both facts require the entry to be expired, not merely
    // overwritten
    assert(batch1 === Set((1L, "b", 1L)))
  }

  test("long TTL, no gap: state survives the boundary — running totals (q212 behavior)") {
    val raw = TtlStateExpiry.replayTwoBatches(spark, b0, b1,
        TTLConfig(java.time.Duration.ofMinutes(30)), gapMs = 0)
      .as[(Long, String, Long, Long)].collect()
    val batch1 = raw.filter(_._4 == 1L).map(r => (r._1, r._2, r._3)).toSet
    // the full surviving profile re-emits for the keyed user: a kept
    // its batch-0 count, b accumulated across the boundary
    assert(batch1 === Set((1L, "a", 2L), (1L, "b", 2L)))
  }
}
