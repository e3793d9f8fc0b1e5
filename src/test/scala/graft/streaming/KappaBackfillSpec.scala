package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KappaBackfillSpec extends SparkSpec {
  import spark.implicits._

  test("backfill-then-stream equals one full-history batch at the seam, exactly") {
    // cut at the median event time so both halves are populated
    val cutUs = graft.Tables.events(spark, sf0001)
      .select(expr("CAST(median(unix_micros(ts)) AS BIGINT)")).as[Long].head()

    val initial = KappaBackfill.backfill(spark, sf0001, cutUs)
    val initMap = initial.collect().toMap

    // stage the live tail as TWO file chunks → two micro-batches, so the
    // state provably carries across batch boundaries too
    val in = java.nio.file.Files.createTempDirectory("graft-kappa-in-")
    val ck = java.nio.file.Files.createTempDirectory("graft-kappa-ck-")
    Seq(in, ck).foreach(graft.TempDirs.cleanupOnExit)
    val tail = KappaBackfill.tail(spark, sf0001, cutUs)
      .withColumn("half", col("user_id") % 2)
    tail.filter(col("half") === 0).select("user_id", "cents")
      .write.parquet(s"$in/chunk0")
    val q = KappaBackfill.run(spark, in.toString + "/*", initial,
      ck.toString, "kappa_sink")
    try {
      q.processAllAvailable()
      tail.filter(col("half") === 1).select("user_id", "cents")
        .coalesce(1).write.parquet(s"$in/chunk1") // atomic under the running poll
      q.processAllAvailable()
    } finally q.stop()

    // update-mode memory sink: the latest emission per user is the final
    // state (n is monotone, so max(n) selects it)
    val streamed = spark.table("kappa_sink")
      .groupBy("user_id")
      .agg(max(struct(col("n"), col("cents"))).as("s"))
      .select(col("user_id"), col("s.n").as("n"), col("s.cents").as("cents"))
      .as[(Long, Long, Long)].collect()
      .map { case (u, n, c) => u -> ((n, c)) }.toMap

    val full = KappaBackfill.fullBatch(spark, sf0001)
      .as[(Long, Long, Long)].collect()
      .map { case (u, n, c) => u -> ((n, c)) }.toMap

    // users touched by the tail must match the full batch exactly;
    // untouched users' truth is their (unemitted) initial state
    assert(streamed.nonEmpty, "the tail must touch at least one user")
    streamed.foreach { case (u, got) =>
      assert(got === full(u), s"user $u: seam state diverged from the full batch")
    }
    (full.keySet -- streamed.keySet).foreach { u =>
      val init = initMap(u)
      assert((init.n, init.cents) === full(u),
        s"user $u: untouched by the tail, so backfill must already equal full")
    }
  }

  test("q207: the gate-facing replay equals the full-history batch row-for-row") {
    val replay = graft.SparkEntry.queries("q207_kappa_replay")(spark, sf0001)
      .collect().toSeq
    val full = KappaBackfill.fullBatch(spark, sf0001)
      .select(col("user_id"), col("n").as("n_events"), col("cents"))
      .orderBy("user_id").collect().toSeq
    assert(replay.nonEmpty)
    assert(replay === full, "the seam must be invisible in the result")
  }
}
