package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  /** Skewed synthetic stream: planted heavy hitters over a long uniform
    * tail — the regime the fixture corpus (31 near-uniform tokens)
    * cannot exercise, where the sketch must evict and decrement. */
  private val skewed: Seq[String] = {
    val heavy = (0 until 3).flatMap(h => Seq.fill(4000)(s"hh$h"))
    val tail = (0 until 20000).map(i => s"t${i % 5000}") // 5000 distinct, 4 each
    // deterministic interleave (no Random — spec determinism discipline)
    (heavy ++ tail).zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 100003 }
      .map(_._1)
  }

  test("every item above n/k survives the sketch under any partitioning") {
    val n = skewed.size
    val k = 16
    val exact = skewed.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val mustKeep = exact.collect { case (t, c) if c > n.toLong / k => t }.toSet
    assert(mustKeep === Set("hh0", "hh1", "hh2"), "premise: three planted hitters")
    for (parts <- Seq(1, 4, 13)) {
      val mg = udaf(new MisraGries(k))
      val sketch = skewed.toDF("tok").repartition(parts)
        .agg(mg(col("tok")).as("sk"))
        .select(explode(col("sk")).as(Seq("tok", "c")))
        .as[(String, Long)].collect().toMap
      assert(sketch.size <= k - 1, s"parts=$parts: bounded summary")
      assert(mustKeep.subsetOf(sketch.keySet),
        s"parts=$parts: containment guarantee")
      // MG counters never overestimate the true frequency
      sketch.foreach { case (t, c) =>
        assert(c <= exact(t), s"parts=$parts: $t overestimated")
      }
    }
  }

  test("driver-side reduce exercises the decrement/evict path") {
    val agg = new MisraGries(3) // 2 counters
    val s1 = Seq("a", "a", "b").foldLeft(agg.zero)(agg.reduce)
    assert(s1 === Map("a" -> 2L, "b" -> 1L))
    val s2 = agg.reduce(s1, "c") // full buffer, new item: all decrement
    assert(s2 === Map("a" -> 1L), "b and the incoming c evict at zero")
  }

  test("merge is value-based: combined survivors independent of order") {
    val agg = new MisraGries(3)
    val a = Map("x" -> 5L, "y" -> 2L)
    val b = Map("x" -> 1L, "z" -> 4L)
    val ab = agg.merge(a, b)
    val ba = agg.merge(b, a)
    assert(ab === ba)
    assert(ab === Map("x" -> 4L, "z" -> 2L), "k-th largest (2) subtracted")
  }

  test("q107 equals the exact threshold twin at sf0.001") {
    val got = graft.SparkEntry.queries("q107_heavy_hitters")(spark, sf0001)
      .select("tok", "n").as[(String, Long)].collect().toSeq
    val toks = graft.Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("tok"))
    val total = toks.count()
    val want = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .filter(col("n") * 32 > total)
      .orderBy("tok").as[(String, Long)].collect().toSeq
    assert(got === want)
  }
}
