package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.operators.BloomDedup

/** Round-5 scale-architecture queries (q71–q74, q82–q84): semantics vs
  * in-Spark twins, plus the plan properties that make each one scale. */
class ScaleQueriesSpec extends SparkSpec {
  import spark.implicits._

  /** collect that descends through AQE wrappers (AdaptiveSparkPlanExec
    * and materialized query stages are leaves to the stock collect). */
  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = if (pf.isDefinedAt(p)) Seq(pf(p)) else Nil
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    here ++ kids.flatMap(collectAll(_)(pf))
  }

  test("q72 bloom-screened dedup equals the plain exact anti-join") {
    val docs = Tables.documents(spark, sf0001)
    val incoming = docs.filter(col("doc_id") % 5 === 0)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val got = BloomDedup.newRows(incoming, corpus.select("text"), "text", 1000000L)
      .select("doc_id").as[Long].collect().toSet
    val want = incoming.join(corpus.select("text").distinct(), Seq("text"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(got === want)
  }

  test("bloom screen never false-negatives: true dups all reach the verify side") {
    // tiny adversarial fpp: even a filter sized 100× too small must
    // still route every true duplicate into the exact anti-join
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z"), (4L, "w")).toDF("id", "text")
    val b = Seq(Tuple1("y"), Tuple1("w")).toDF("text")
    val got = BloomDedup.newRows(a, b, "text", expectedItems = 1L, fpp = 0.5)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 3L))
  }

  test("q72 sizing: a corpus-sized bloom keeps screening at 10x the old constant, which saturates") {
    // r5 verdict item 2: expectedItems was the constant 1M; at 10x that
    // corpus the filter saturates (every bit set, fpp -> 1) and the
    // pre-screen silently becomes a no-op — correct (the exact verify
    // join survives) but no longer a runtime filter. q72 now sizes from
    // a real corpus count; this pins the mechanism at exactly 10x.
    val oldConstant = 1000000L
    val n = 10L * oldConstant
    val probes = 20000L
    val corpus = spark.range(n).select(concat(lit("doc_"), col("id")).as("text"))
    val fresh = spark.range(n, n + probes)
      .select(concat(lit("doc_"), col("id")).as("text"))
    def fpRate(expectedItems: Long): Double = {
      val bytes = BloomDedup.buildFilter(corpus, col("text"), expectedItems, 0.01)
      fresh.filter(BloomDedup.mightContain(bytes, col("text"))).count().toDouble / probes
    }
    val sized = fpRate(n)
    val saturated = fpRate(oldConstant)
    assert(sized <= 0.05,
      f"corpus-sized filter must keep screening non-members out (fp=$sized%.4f)")
    assert(saturated > 0.5,
      f"a 1M-sized filter holding 10M keys must be saturated (fp=$saturated%.4f) — " +
        "the measured reason q72 derives expectedItems from a corpus count")
  }

  test("buildFilter on an empty corpus returns a working empty filter (zero-partition RDD path)") {
    // an empty relation plans to a ZERO-partition RDD (LocalTableScanExec
    // → emptyRDD), where treeReduce throws "empty collection"; the doc's
    // "empty corpus yields an empty filter" guarantee is the guard for
    // exactly that path
    val empty = spark.range(0).select(concat(lit("doc_"), col("id")).as("text"))
    assert(empty.queryExecution.toRdd.getNumPartitions === 0,
      "fixture must exercise the zero-partition plan or the guard is untested")
    val bytes = BloomDedup.buildFilter(empty, col("text"), 1000L, 0.01)
    val probes = Seq(Tuple1("a"), Tuple1("b"), Tuple1("c")).toDF("text")
    assert(probes.filter(BloomDedup.mightContain(bytes, col("text"))).count() === 0L,
      "an empty filter must report every probe absent (all incoming rows definite-new)")
    // and the full operator: empty corpus → everything is new
    val got = BloomDedup.newRows(probes, empty, "text", expectedItems = 1000L)
      .select("text").as[String].collect().toSet
    assert(got === Set("a", "b", "c"))
  }

  test("buildFilter bounds concurrent per-task filter allocations to MaxBuildPartitions") {
    // each build task allocates a full expectedItems-sized filter; a
    // 64-partition scan must coalesce to the bounded build width, not
    // run 64 concurrent full-size allocations
    val wide = spark.range(0, 10000, 1, 64)
      .select(concat(lit("doc_"), col("id")).as("text"))
    assert(wide.queryExecution.toRdd.getNumPartitions > BloomDedup.MaxBuildPartitions)
    val bytes = BloomDedup.buildFilter(wide, col("text"), 10000L, 0.01)
    // the bounded build must still produce a correct filter: every
    // inserted key reports present (no false negatives)
    val present = wide.filter(BloomDedup.mightContain(bytes, col("text"))).count()
    assert(present === 10000L)
  }

  test("q71 stream-stream interval join equals its batch twin") {
    val stream = SparkEntry.queries("q71_stream_stream_join")(spark, sf0001)
      .collect().toSeq
    val ev = Tables.events(spark, sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("eu"), col("event_id").as("error_id"), col("ts").as("e_ts"))
    val batch = p.join(e, col("user_id") === col("eu") &&
        col("e_ts") >= col("p_ts") &&
        col("e_ts") <= col("p_ts") + expr("interval 6 hours"))
      .select(col("user_id"), col("purchase_id"), col("error_id"),
        (unix_micros(col("e_ts")) - unix_micros(col("p_ts"))).as("delta_us"))
      .orderBy("user_id", "purchase_id", "error_id")
      .collect().toSeq
    assert(stream.nonEmpty)
    assert(stream === batch)
  }

  test("q73 bucketed join equals the raw-parquet join and its SMJ subtree has no shuffle") {
    val got = SparkEntry.queries("q73_bucketed_colocated_join")(spark, sf0001)
    val li = Tables.lineitem(spark, sf0001)
    val o = Tables.orders(spark, sf0001)
    val want = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)")))
          .cast("decimal(18,4)").as("revenue"))
      .orderBy("o_orderpriority")
    assert(got.collect().toSeq === want.collect().toSeq)

    // the property that IS the feature: co-located bucket scans leave
    // nothing for EnsureRequirements to fix — no exchange anywhere
    // below the join
    val plan = got.queryExecution.executedPlan
    val smj = collectAll(plan) { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, s"expected a SortMergeJoin in:\n$plan")
    val shufflesBelowJoin = collectAll[SparkPlan](smj.head) { case s: ShuffleExchangeExec => s }
    assert(shufflesBelowJoin.isEmpty,
      s"bucketed join must not shuffle its inputs:\n${smj.head}")
  }

  test("bucketed-table build is idempotent: a leftover same-name catalog entry does not poison the retry") {
    // Caches.memo frees the key when a build throws, but the
    // deterministic MD5 tag reproduces the same table names — a prior
    // attempt that died after saveAsTable(lineitem) leaves a catalog
    // entry the retry must be able to overwrite. Simulate the leftover
    // with a conflicting table under the exact name the builder derives.
    // Trailing slash = same data, fresh memo key (the key is the raw
    // dir string), so the memoized block genuinely runs here.
    val dir = sf0001 + "/"
    val k = s"${org.apache.spark.sql.graft.SessionBridge.uuid(spark)}|$dir"
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(k.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val leftover = s"graft_bkt_${tag}_lineitem"
    spark.sql(s"CREATE TABLE $leftover (poison INT) USING parquet")
    assert(spark.catalog.tableExists(leftover))
    val names = BucketedTables.lineitemOrders(spark, dir)
    assert(names.lineitem === leftover, "fixture must collide with the derived name")
    assert(spark.table(names.lineitem).columns.contains("l_orderkey"),
      "retry must replace the leftover entry with the real bucketed table")
    assert(spark.table(names.orders).columns.contains("o_orderkey"))
  }

  test("q83 merged rollup equals the full recompute (decomposable-aggregate exactness)") {
    val got = SparkEntry.queries("q83_incremental_rollup")(spark, sf0001)
    val want = Tables.events(spark, sf0001)
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("event_type", "minute")
    assert(got.collect().toSeq === want.collect().toSeq)
  }

  test("q82 partition-pruned scan equals the raw-table aggregate and opens 2 of 5 directories") {
    val got = SparkEntry.queries("q82_partition_pruned_scan")(spark, sf0001)
    val want = Tables.events(spark, sf0001)
      .filter(col("event_type").isin("purchase", "error"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")
    assert(got.collect().toSeq === want.collect().toSeq)

    // the property that IS the feature: the excluded event_type
    // directories are never listed into the scan
    val scans = collectAll(got.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a file scan over the partitioned layout")
    assert(scans.head.partitionFilters.nonEmpty,
      "the IN predicate must land in partitionFilters, not a post-scan Filter")
    assert(scans.head.selectedPartitions.partitionCount === 2,
      s"2 of 5 event_type directories must survive pruning, " +
        s"got ${scans.head.selectedPartitions.partitionCount}")
  }

  test("q74 contamination is a complete, bounded report over the test split") {
    val out = SparkEntry.queries("q74_contamination_check")(spark, sf0001)
      .select($"doc_id", $"n_shingles", $"n_overlap", $"contamination")
      .as[(Long, Long, Long, Double)].collect()
    val expected = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 10 === 0 && size(split(col("text"), " ")) >= 3)
      .count()
    assert(out.length === expected, "every shingled test doc is reported")
    assert(out.forall { case (_, n, ov, c) =>
      ov >= 0 && ov <= n && c >= 0.0 && c <= 1.0 })
    assert(out.forall { case (_, n, ov, c) => c === ov.toDouble / n })
  }
}
