package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.expressions.BloomFilterOps

/** q141's screen contract: the bloom filter over the build side's keys
  * never drops a matching probe row (no false negatives — the property
  * that makes the prune semantics-preserving) and actually prunes the
  * non-matching majority (the property that makes it worth running). */
class BloomJoinSpec extends SparkSpec {

  test("bloom screen keeps every matching key and prunes most non-matching rows") {
    val dim = Tables.orders(spark, sf0001)
      .filter(col("o_totalprice") > 400000.0)
      .select("o_orderkey")
    val bf = dim.agg(
        BloomFilterOps.bloomAgg(col("o_orderkey"), 1000000L, 8000000L).as("bf"))
      .head.getAs[Array[Byte]]("bf")

    val li = Tables.lineitem(spark, sf0001).select("l_orderkey")
    val total = li.count()
    val kept = li.filter(BloomFilterOps.mightContain(bf, col("l_orderkey"))).count()
    val matching = li.join(dim, col("l_orderkey") === col("o_orderkey"),
      "left_semi").count()
    val keptMatching = li.filter(BloomFilterOps.mightContain(bf, col("l_orderkey")))
      .join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi").count()

    assert(keptMatching === matching, "a false negative would corrupt the join")
    assert(kept < total, "the screen must prune something")
    // at 8M bits / ~300 keys the false-positive rate is ~0: the screen
    // passes essentially only the true matches
    assert(kept - matching < total / 100, s"fpp too high: kept=$kept matching=$matching")
  }

  test("q141 equals the plain unscreened join") {
    val got = graft.SparkEntry.queries("q141_bloom_pruned_join")(spark, sf0001)
      .collect().toSeq
    val want = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_quantity"))
      .join(Tables.orders(spark, sf0001)
          .filter(col("o_totalprice") > 400000.0)
          .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy("o_orderpriority")
      .collect().toSeq
    assert(got === want)
  }
}
