package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The q147 seam contract driven directly on [[StreamingTransitions
  * .pairsForBatch]]: batched pairing with carried state must emit
  * exactly the one-shot pair multiset — including across a batch a user
  * skips entirely — and state stays one row per user. */
class StreamingTransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, String)]): DataFrame =
    rows.toDF("user_id", "event_id", "event_type")

  private val log = Seq(
    (1L, 1L, "view"), (2L, 2L, "view"), (1L, 3L, "click"),
    (2L, 4L, "click"), (1L, 5L, "purchase"),
    // batch 2: user 2 is absent — its carry must survive untouched
    (1L, 6L, "view"), (1L, 7L, "click"),
    // batch 3: user 2 returns — the seam spans TWO batch boundaries
    (2L, 8L, "purchase"), (1L, 9L, "view"))

  private def pairsOf(df: DataFrame): Seq[(Long, String, String)] =
    df.as[(Long, String, String)].collect().toSeq.sorted

  test("3 batches with a skipped user emit exactly the one-shot pairs; state is one row per user") {
    val empty = Seq.empty[(Long, Long, String)].toDF("user_id", "last_event_id", "last_type")
    val (oneShot, _) = StreamingTransitions.pairsForBatch(ev(log), empty)

    val batches = Seq(log.filter(_._2 <= 5), log.filter(r => r._2 >= 6 && r._2 <= 7),
      log.filter(_._2 >= 8))
    var carry = empty
    var all = Seq.empty[(Long, String, String)]
    batches.foreach { b =>
      val (p, c) = StreamingTransitions.pairsForBatch(ev(b), carry)
      all ++= pairsOf(p)
      carry = c
    }
    assert(all.sorted === pairsOf(oneShot))
    // the seam pair across user 2's two-batch absence is present:
    // click@4 → purchase@8
    assert(all.contains((2L, "click", "purchase")))
    // state: exactly one row per user, carrying the true last event
    val st = carry.as[(Long, Long, String)].collect().toSeq.sorted
    assert(st === Seq((1L, 9L, "view"), (2L, 8L, "purchase")))
  }

  test("an empty batch changes nothing") {
    val empty = Seq.empty[(Long, Long, String)].toDF("user_id", "last_event_id", "last_type")
    val (_, c1) = StreamingTransitions.pairsForBatch(ev(log.take(5)), empty)
    val (p, c2) = StreamingTransitions.pairsForBatch(ev(Seq.empty), c1)
    assert(p.count() === 0L)
    assert(c2.as[(Long, Long, String)].collect().sorted ===
      c1.as[(Long, Long, String)].collect().sorted)
  }
}
