package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The q247 engine's seam semantics under planted lengths: a context
  * OPEN at the micro-batch boundary keeps filling from its carried
  * (ctx, fill) ValueState — the property that makes the streamed walk
  * equal the batch one — plus full-fixture equality with the batch fold.
  */
class StreamingPackingSpec extends SparkSpec {
  import spark.implicits._

  test("an open context carries (ctx, fill) across the batch seam; rollover still fires") {
    // budget 100; shard 0 docs [60, 30 | 20, 100] (seam at pos 2 with
    // max pos 4 -> mid = 2). The 20 must CONTINUE ctx1? No — walk it:
    //   pos1 60 -> ctx0@0 (fill 60); pos2 30 -> ctx0@60 (fill 90);
    //   -- seam: state (ctx0, 90) crosses the RocksDB boundary --
    //   pos3 20 -> overflow -> ctx1@0 (fill 20); pos4 100 -> ctx2@0.
    // A lost/re-based state would restart pos3 at ctx0@0 and shift both.
    // shard 1 docs [90 | 5, 10]: pos3 5 CONTINUES ctx0@90 (fill 95 —
    // the open-context continuation), pos4 10 rolls to ctx1.
    val staged = Seq(
      (0L, 1L, 10L, 60L), (0L, 2L, 11L, 30L), (0L, 3L, 12L, 20L),
      (0L, 4L, 13L, 100L),
      (1L, 1L, 20L, 90L), (1L, 2L, 21L, 5L), (1L, 3L, 22L, 10L))
      .toDF("shard", "pos", "doc_id", "n_tokens")
    val got = StreamingPacking.replayTwoBatches(spark, staged, budget = 100L)
      .select("shard", "doc_id", "context_id", "tok_start", "tok_end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === Seq(
      (0L, 10L, 0L, 0L, 60L), (0L, 11L, 0L, 60L, 90L),
      (0L, 12L, 1L, 0L, 20L), (0L, 13L, 2L, 0L, 100L),
      (1L, 20L, 0L, 0L, 90L), (1L, 21L, 0L, 90L, 95L),
      (1L, 22L, 1L, 0L, 10L)))
  }

  test("streamed spans equal the batch fold's on the gate fixture") {
    val staged = graft.queries.CurationQueries.packStaged(spark, sf0001)
    val budget = graft.queries.CurationQueries.PackTokenBudget
    val streamed = StreamingPacking.replayTwoBatches(spark, staged, budget)
      .select("shard", "doc_id", "context_id", "tok_start", "tok_end",
        "n_tokens", "n_trunc_tokens")
    val batch = graft.operators.Packing.packSpans(staged, budget)
      .select("shard", "doc_id", "context_id", "tok_start", "tok_end",
        "n_tokens", "n_trunc_tokens")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "the two faces must produce identical span sets")
    graft.Caches.releaseScoped()
  }
}
