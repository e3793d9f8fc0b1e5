package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Two deterministic micro-batches with DIFFERENT skew: 'alpha' is
    * heavy in batch 1 only, 'omega' in batch 2 only, 'both' in both —
    * only a correctly MERGED standing summary keeps all three. */
  private def batches: (Seq[(Long, String)], Seq[(Long, String)]) = {
    def doc(id: Long, words: Seq[String]) = (id, words.mkString(" "))
    val tail1 = (0 until 300).map(i => s"t${i % 150}")
    val tail2 = (0 until 300).map(i => s"u${i % 150}")
    val b1 = Seq(
      doc(1, Seq.fill(200)("alpha") ++ Seq.fill(120)("both") ++ tail1),
      doc(2, Seq.fill(100)("alpha") ++ tail1))
    val b2 = Seq(
      doc(3, Seq.fill(220)("omega") ++ Seq.fill(130)("both") ++ tail2),
      doc(4, Seq.fill(90)("omega") ++ tail2))
    (b1, b2)
  }

  test("the standing sketch carries the n/k guarantee across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shh-")
    graft.TempDirs.cleanupOnExit(dir)
    val (b1, b2) = batches
    StreamingHeavyHitters.processBatch(b1.toDF("doc_id", "text"), dir.toString, 0L)
    StreamingHeavyHitters.processBatch(b2.toDF("doc_id", "text"), dir.toString, 1L)

    val rep = StreamingHeavyHitters.report(spark, dir.toString)
      .as[(String, Long, Long)].collect()
    val allToks = (b1 ++ b2).flatMap(_._2.split(" "))
    val n = allToks.size.toLong
    assert(rep.forall(_._3 === n), "total tracks the whole stream")
    val exact = allToks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val mustKeep = exact.collect { case (t, c) if c > n / StreamingHeavyHitters.K => t }.toSet
    assert(mustKeep === Set("alpha", "omega", "both"),
      s"premise: the planted hitters exceed n/k (n=$n)")
    assert(mustKeep.subsetOf(rep.map(_._1).toSet),
      "containment survives the cross-batch merge")
    assert(rep.length <= StreamingHeavyHitters.K - 1, "state stays summary-sized")
    rep.foreach { case (t, c, _) =>
      assert(c <= exact(t), s"$t: counters never overestimate")
    }
  }

  test("the unbounded form folds a file stream into the same standing state") {
    val in = java.nio.file.Files.createTempDirectory("graft-shh-in-")
    val st = java.nio.file.Files.createTempDirectory("graft-shh-st-")
    val ck = java.nio.file.Files.createTempDirectory("graft-shh-ck-")
    Seq(in, st, ck).foreach(graft.TempDirs.cleanupOnExit)
    val (b1, b2) = batches
    b1.toDF("doc_id", "text").write.parquet(s"$in/f1")
    val q = StreamingHeavyHitters.run(spark, in.toString + "/*", st.toString, ck.toString)
    try {
      q.processAllAvailable()
      b2.toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/f2") // atomic under the running poll
      q.processAllAvailable()
    } finally q.stop()
    val rep = StreamingHeavyHitters.report(spark, st.toString)
      .as[(String, Long, Long)].collect()
    assert(Set("alpha", "omega", "both").subsetOf(rep.map(_._1).toSet))
    assert(rep.forall(_._3 === (b1 ++ b2).flatMap(_._2.split(" ")).size.toLong))
  }

  test("a retried micro-batch is a no-op (exactly-once via the version key)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shh-retry-")
    graft.TempDirs.cleanupOnExit(dir)
    val (b1, b2) = batches
    StreamingHeavyHitters.processBatch(b1.toDF("doc_id", "text"), dir.toString, 0L)
    StreamingHeavyHitters.processBatch(b2.toDF("doc_id", "text"), dir.toString, 1L)
    val before = StreamingHeavyHitters.report(spark, dir.toString)
      .as[(String, Long, Long)].collect().toSeq
    // the at-least-once failure mode: batch 1 re-delivered after commit
    StreamingHeavyHitters.processBatch(b2.toDF("doc_id", "text"), dir.toString, 1L)
    val after = StreamingHeavyHitters.report(spark, dir.toString)
      .as[(String, Long, Long)].collect().toSeq
    assert(after === before, "a re-folded batch would double-count; the retry must no-op")
    assert(after.forall(_._3 === (b1 ++ b2).flatMap(_._2.split(" ")).size.toLong))
  }

  test("a crash mid-write cannot lose the standing state (uncommitted versions are invisible)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shh-crash-")
    graft.TempDirs.cleanupOnExit(dir)
    val (b1, _) = batches
    StreamingHeavyHitters.processBatch(b1.toDF("doc_id", "text"), dir.toString, 0L)
    val before = StreamingHeavyHitters.report(spark, dir.toString)
      .as[(String, Long, Long)].collect().toSeq
    // simulate the ADVICE r10 crash window: a newer version fully
    // written EXCEPT its COMMITTED marker (the old overwrite-in-place
    // design had already deleted the standing state at this point)
    Seq(("ghost", 999L)).toDF("tok", "c").write.parquet(s"$dir/v7/sketch")
    Seq(999L).toDF("n").write.parquet(s"$dir/v7/total")
    val after = StreamingHeavyHitters.report(spark, dir.toString)
      .as[(String, Long, Long)].collect().toSeq
    assert(after === before, "readers must keep serving the last committed version")
    assert(!after.exists(_._1 == "ghost"))
  }
}
