package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, TempDirs}

/** q253 repetition-rules gate + q254 overlapping chunk export (r17). */
class RepetitionChunkSpec extends SparkSpec {
  import spark.implicits._

  private def plant(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-rep-")
    TempDirs.cleanupOnExit(dir)
    docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir.toString
  }

  test("q253 fires each rule on its planted trigger and keeps a clean doc") {
    val dir = plant(Seq(
      // max_run 5 ("a" ×5) — the run rule's trigger
      1L -> "a a a a a b c d e f g h i j k l",
      // "x y" covers all 8 tokens (ppm 1 000 000) — the bigram rule
      2L -> "x y x y x y x y",
      // the 4-token chunk "c1 c2 c3 c4" repeats → dup_line_ppm 500 000
      3L -> "c1 c2 c3 c4 c1 c2 c3 c4",
      // 16 distinct tokens: top bigram 2/16 = 125 000 ppm, run 1 — keep
      4L -> (1 to 16).map(i => s"t$i").mkString(" ")))
    val r = SparkEntry.queries("q253_repetition_rules")(spark, dir)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("max_run") === 5L)
    assert(!r(1L).getAs[Boolean]("keep"))
    assert(r(2L).getAs[Long]("top_bigram_ppm") === 1000000L)
    assert(r(2L).getAs[String]("top_bigram") === "x y")
    assert(!r(2L).getAs[Boolean]("keep"))
    assert(r(3L).getAs[Long]("dup_line_ppm") === 500000L)
    assert(r(3L).getAs[Long]("dup_line_char_ppm") === 500000L)
    assert(!r(3L).getAs[Boolean]("keep"))
    assert(r(4L).getAs[Boolean]("keep"))
    assert(r(4L).getAs[Long]("dup_line_ppm") === 0L)
    assert(r(4L).getAs[Long]("max_run") === 1L)
  }

  test("q253 is non-vacuous on the gate fixture: both verdict branches fire") {
    val v = SparkEntry.queries("q253_repetition_rules")(spark, sf0001)
      .groupBy("keep").count().as[(Boolean, Long)].collect().toMap
    assert(v.getOrElse(true, 0L) > 0L, "no keeps on the fixture")
    assert(v.getOrElse(false, 0L) > 0L, "no drops on the fixture")
  }

  test("q254 chunk geometry: full coverage, S-spaced starts, audited overlap") {
    val rows = SparkEntry.queries("q254_overlap_chunks")(spark, sf0001)
      .select("doc_id", "chunk_id", "tok_start", "tok_end",
        "n_doc_tokens", "n_chunks", "overlap_tokens")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    for ((doc, chunks) <- rows.groupBy(_._1)) {
      val sorted = chunks.sortBy(_._2)
      val n = sorted.head._5
      // contiguous ids from 0; declared count matches
      assert(sorted.map(_._2).toSeq === (0L until sorted.length.toLong))
      assert(sorted.head._6 === sorted.length.toLong)
      // starts stride by S=24; first at 0; last chunk ends exactly at n
      assert(sorted.map(_._3).toSeq === sorted.indices.map(_ * 24L))
      assert(sorted.last._4 === n, s"doc $doc tail not flush")
      // coverage: consecutive chunks overlap (S < C), so the union of
      // [start, end) intervals is gapless over [0, n)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 < a._4, s"doc $doc gap at ${b._3}")
        case _ =>
      }
      // audit column equals the arithmetic identity
      val overlap = sorted.map(c => c._4 - c._3).sum - n
      assert(sorted.head._7 === overlap)
    }
    // the fixture exercises multi-chunk docs (max doc ~100 tokens -> 4)
    assert(rows.groupBy(_._1).values.map(_.length).max >= 3,
      "geometry constants should exercise >= 3 chunks on the fixture")
  }
}
