package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Classic OLAP analytics beyond the reference surface: pivot, exact
  * quantiles, correlation, and ordered running windows — each built so
  * the floating-point result is order-independent or an exact
  * left-to-right fold, keeping the DuckDB hash-match intact.
  */
object AnalyticsQueries {
  type Q = (SparkSession, String) => DataFrame

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** One SQL text, two engines: q53 runs the EXACT oracle string through
    * `spark.sql` (the parser → analyzer → Catalyst lifecycle), proving
    * the engine's SQL entry path, correlated-scalar-subquery support, and
    * dialect compatibility in one shot. */
  private[queries] val AboveTypeAvgSql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_above
      |FROM events e
      |WHERE value > (SELECT CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      |               FROM events i WHERE i.event_type = e.event_type)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** One SQL text, two engines (the q53 rule) for q131: explicit
    * GROUPING SETS — the third grouping-extension face beside q43's
    * CUBE and q112's ROLLUP, with two DISJOINT groupings plus the grand
    * total, which neither CUBE nor ROLLUP can express. */
  private[queries] val GroupingSetsSql =
    """SELECT event_type, user_id % 10 AS cohort,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
      |ORDER BY event_type NULLS LAST, cohort NULLS LAST""".stripMargin

  /** q138's Cramer solve — ONE formula text spliced into BOTH engines
    * (`selectExpr` here, the oracle string below), so every double
    * multiply/subtract/divide parses to the same IEEE expression tree
    * and the betas are bit-equal by construction (the q129 closed-form
    * precedent). Inputs are the normal-equation co-moments, already
    * exact (BIGINT / decimal sums) and cast to double once. */
  private[queries] val LinRegBetaExprs: Seq[String] = {
    val det = "(nn*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2))"
    Seq(
      s"(sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y)) / $det AS beta0",
      s"(nn*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2)) / $det AS beta1",
      s"(nn*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2)) / $det AS beta2")
  }

  /** q143's oracle — and verbatim q147's: the 4-micro-batch seam-
    * stitched replay must hash-match the same one-shot truth. */
  private[queries] val TransitionsSql =
    """WITH p AS (SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS next_type
      |  FROM events),
      |n AS (SELECT event_type AS src_type, next_type AS dst_type,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM p WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT src_type, CAST(sum(n) AS BIGINT) AS n_src FROM n GROUP BY src_type)
      |SELECT n.src_type, n.dst_type, n.n,
      |  CAST(n.n AS DOUBLE) / CAST(t.n_src AS DOUBLE) AS p
      |FROM n JOIN t USING (src_type)
      |ORDER BY src_type, dst_type""".stripMargin

  /** q149's shared expression texts (the q138 rule: one text, two
    * engines, bit-equal doubles). The residual consumes the bit-equal
    * betas and the raw features; its square QUANTIZES to integer
    * micro-units via floor — NOT round(,6): rounding a computed double
    * is decimal re-interpretation and the two engines disagree by an
    * ulp exactly at half-way boundaries (observed live at sf0.1),
    * while floor(x·10⁶) is two IEEE ops on a bit-equal input, always
    * identical. The BIGINT micro-units then sum exactly (order-free);
    * headroom: (y−ŷ)²·10⁶ ≲ 10¹¹/row — 10⁷ rows of margin under
    * Long.Max even at 100× this SF. */
  private[queries] val CvResidual2Expr =
    "CAST(floor((CAST(y AS DOUBLE) - (beta0 + beta1 * x1 + beta2 * x2)) * " +
      "(CAST(y AS DOUBLE) - (beta0 + beta1 * x1 + beta2 * x2)) * 1000000.0) AS BIGINT) AS r2"
  private[queries] val CvSseExpr =
    "CAST(sse0 AS DOUBLE) / 1000000.0 AS sse"
  private[queries] val CvRmseExpr =
    "sqrt(sse / CAST(n_test AS DOUBLE)) AS rmse"

  /** q177's shared expression texts (the q138 rule). Sample variance
    * from exact sums: v = (n·Σy² − (Σy)²) / (n·(n−1)); Welch's t from
    * the two variances. Every input is a bit-equal double (decimal-
    * exact sums cast once) or a BIGINT count, so the fixed IEEE dag
    * evaluates identically in both engines. */
  private[queries] val AbMean0Expr = "sy0 / n0 AS mean_control"
  private[queries] val AbMean1Expr = "sy1 / n1 AS mean_treat"
  private[queries] val AbDiffExpr = "sy1 / n1 - sy0 / n0 AS diff"
  private[queries] val AbWelchTExpr =
    "(sy1 / n1 - sy0 / n0) / sqrt(" +
      "(n1 * syy1 - sy1 * sy1) / (n1 * (n1 - 1)) / n1 + " +
      "(n0 * syy0 - sy0 * sy0) / (n0 * (n0 - 1)) / n0) AS welch_t"

  /** q178's shared outlier cut (one text, two engines). */
  private[queries] val MadOutlierPred = "abs(value - med) > 3 * mad"

  /** q189's shared Wilson-score texts (the q138 rule): center and
    * half-width of the 95% interval from exact (k, n) and the literal
    * z = 1.96 — every operand double-promotes identically, so the dag
    * is bit-equal across engines. */
  private[queries] val WilsonCenterExpr =
    "(k / CAST(n AS DOUBLE) + 1.9208 / CAST(n AS DOUBLE)) / " +
      "(1.0 + 3.8416 / CAST(n AS DOUBLE)) AS p_center"
  private[queries] val WilsonLoExpr =
    "(k / CAST(n AS DOUBLE) + 1.9208 / CAST(n AS DOUBLE) - 1.96 * sqrt(" +
      "(k / CAST(n AS DOUBLE)) * (1.0 - k / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) + " +
      "0.9604 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) / " +
      "(1.0 + 3.8416 / CAST(n AS DOUBLE)) AS p_lo"
  private[queries] val WilsonHiExpr =
    "(k / CAST(n AS DOUBLE) + 1.9208 / CAST(n AS DOUBLE) + 1.96 * sqrt(" +
      "(k / CAST(n AS DOUBLE)) * (1.0 - k / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) + " +
      "0.9604 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) / " +
      "(1.0 + 3.8416 / CAST(n AS DOUBLE)) AS p_hi"

  val queries: Map[String, Q] = Map(
    // SQL entry path: the oracle string itself, parsed by Spark. The
    // temp view exists only for the eager analysis inside sql() — it is
    // dropped immediately so the session-global name 'events' doesn't
    // leak a stale snapshot to later SQL.
    "q53_above_type_avg" -> { (s, d) =>
      Tables.events(s, d).createOrReplaceTempView("events")
      try s.sql(AboveTypeAvgSql)
      finally s.catalog.dropTempView("events")
    },

    // Pivot: event counts per user cohort × event type (wide form).
    // Counts are exact, so the pivot is hash-safe.
    "q45_pivot_counts" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy((col("user_id") % 10).as("cohort"))
        .pivot("event_type", EventTypes)
        .agg(count(lit(1)))
        .na.fill(0L, EventTypes)
        .orderBy("cohort")
    },

    // ROLLUP hierarchy — the multi-granularity aggregate every OLAP
    // dashboard wants ((type, hour), (type), ()) computed in ONE pass:
    // Spark expands the grouping sets before the shuffle, so partial
    // aggregation still collapses map-side and the three granularities
    // cost one corpus read instead of three. grouping_id disambiguates
    // real NULLs from subtotal markers; the orderBy pins NULLS FIRST
    // explicitly because the engines' defaults differ.
    "q112_rollup" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("hour"),
          col("value"))
        .rollup("event_type", "hour")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
          grouping_id().as("gid"))
        .orderBy(col("gid").asc,
          col("event_type").asc_nulls_first, col("hour").asc_nulls_first)
    },

    // SCD2 (slowly-changing-dimension type 2) construction — turning a
    // change log into validity intervals: each user's events become
    // versions with [valid_from, valid_to) ranges and a current-row
    // flag. One lead() window keyed by user (bounded by per-user
    // version count, the gaps-and-islands scale argument) — the
    // warehouse operator behind every dimension table load.
    "q113_scd2" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
      Tables.events(s, d)
        .filter(col("event_type") === "signup" || col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(ts)").as("ts_us"), col("value"))
        .withColumn("version", row_number().over(w).cast("long"))
        .withColumn("valid_from", col("ts_us"))
        // the canonical SCD2 open-interval sentinel instead of NULL: a
        // dimension consumer can always range-join on [from, to). The
        // interval bounds travel as epoch-µs BIGINTs with Long.MaxValue
        // as the open sentinel (the q81/q119 rule: a 9999-12-31
        // TIMESTAMP overflows the driver's datetime64[ns] compare —
        // nullable integers are the proven-safe cross-engine carrier).
        .withColumn("is_current",
          when(lead(col("ts_us"), 1).over(w).isNull, 1L).otherwise(0L))
        .withColumn("valid_to",
          coalesce(lead(col("ts_us"), 1).over(w), lit(Long.MaxValue)))
        .select("user_id", "version", "event_id", "value",
          "valid_from", "valid_to", "is_current")
        .orderBy("user_id", "version")
    },

    // Explicit GROUPING SETS (q131) — two disjoint groupings + the
    // grand total in ONE pass (Expand node, partial-agg'd per set),
    // run through the SQL entry path like q53 so the text is the
    // oracle. At 100 TB this is one scan feeding every set, vs one
    // scan per report the naive pipeline runs.
    "q131_grouping_sets" -> { (s, d) =>
      Tables.events(s, d).createOrReplaceTempView("events")
      try s.sql(GroupingSetsSql)
      finally s.catalog.dropTempView("events")
    },

    // Incremental CDC MERGE (q130) — the warehouse upsert-apply: the
    // events table read as a change log (event_id = commit order;
    // 'error' = DELETE, anything else = UPSERT carrying value), split
    // at max_id/2 into a SNAPSHOT prefix and a DELTA suffix. The
    // snapshot materializes per-key latest ops (tombstones KEPT as
    // rows — a delete must be able to out-version an earlier upsert),
    // the delta merges via one keyed full-outer join (delta's op wins
    // where present), and tombstones drop only at publish. The ORACLE
    // is the full-log replay, so the gate proves merge ≡ replay — the
    // q83/q124 materialized-view pattern applied to MERGE INTO. Scale:
    // two partial-agg'd groupBys + one keyed join; the snapshot never
    // re-scans history at apply time.
    "q130_cdc_merge" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      val sp = ev.agg(expr("max(event_id) div 2").as("s"))
      val tagged = ev.crossJoin(broadcast(sp))
      // latest op per key: max over (event_id, ...) structs — event_id
      // is unique, so the lexicographic max IS the last commit
      def lastOp(df: DataFrame): DataFrame =
        df.groupBy("user_id").agg(
          max(struct(col("event_id"), col("event_type"), col("value"))).as("o"))
      val snap = lastOp(tagged.filter(col("event_id") <= col("s")))
      val delta = lastOp(tagged.filter(col("event_id") > col("s")))
      snap.as("a").join(delta.as("b"), Seq("user_id"), "full_outer")
        // greatest-by-commit-id, not arrival order (the CdcApply LSN
        // rule): here delta ids are all > snapshot ids by construction,
        // but the commit-ordered form is the one that stays correct
        // when batches don't respect commit order
        .select(col("user_id"),
          greatest(col("b.o"), col("a.o")).as("o"))
        .filter(col("o.event_type") =!= "error")
        .select(col("user_id"), col("o.event_id").as("last_event_id"),
          col("o.value").as("value"))
        .orderBy("user_id")
    },

    // Z-score ANOMALY detection — the monitoring operator behind every
    // metrics/ingest alert: per-group exact moments (the q47 rule:
    // count + DECIMAL-exact Σy and Σy² so shuffle order cannot wiggle
    // them), sample σ from the closed form, then a map-side flag of
    // every row with |z| > 3 against the 5-row broadcast stats. Two
    // scans total (one for moments, one for flagging), no window, no
    // per-group sort — at 100 TB the stats pass is a partial-agg'd
    // shuffle of 5 groups and the flag pass is embarrassingly map-only.
    "q129_anomaly" -> { (s, d) =>
      val y = col("value").cast("decimal(18,2)")
      val stats = Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(y).cast("double").as("sy"),
          sum((y * y).cast("decimal(38,4)")).cast("double").as("syy"))
        .withColumn("mu", col("sy") / col("n"))
        .withColumn("sigma",
          sqrt((col("n") * col("syy") - col("sy") * col("sy"))
            / (col("n") * (col("n") - 1))))
        .select("event_type", "mu", "sigma")
      Tables.events(s, d)
        .join(broadcast(stats), "event_type")
        .withColumn("z", (col("value") - col("mu")) / col("sigma"))
        .filter(abs(col("z")) > 3.0)
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("z"), 4).as("z"))
        .orderBy("event_id")
    },

    // Data profiling — the ANALYZE pass a pipeline runs on every new
    // table before anything else: per column, row/null/distinct counts
    // and min/max (as strings, binary collation in both engines). All
    // columns profile in ONE aggregation over ONE scan (Spark expands
    // the multi-distinct into one Expand node — still partial-agg'd);
    // the wide 1-row result melts to the long report with a stack()
    // projection. At 100 TB exact distinct counts become the
    // approx_count_distinct tier (q38's documented trade).
    // CLOSED-FORM LINEAR REGRESSION (q138) — fit value ~ β0 + β1·hour
    // + β2·cohort by normal equations: ONE partial-aggregated scan
    // computes the nine XᵀX / Xᵀy co-moments EXACTLY (integer features
    // → BIGINT sums; y 6dp-rounded → decimal sums, the q47
    // order-independence rule), then the 3×3 solve is a driver-sized
    // Cramer formula over the 1-row moment frame — the q123 Gram
    // pattern applied to model fitting. At 100 TB this is the only
    // shape that works: the data pass is map-side-combined moments
    // (d² terms, corpus-size-independent), the solve never touches an
    // executor. Betas are bit-equal across engines because both parse
    // the SAME formula text over the same exact moments.
    "q138_linreg_normal" -> { (s, d) =>
      val feats = Tables.events(s, d).select(
        expr("(unix_micros(ts) div 3600000000) % 24").as("x1"),
        (col("user_id") % 10).as("x2"),
        round(col("value"), 6).cast("decimal(18,6)").as("y"))
      val m = feats.agg(
        count(lit(1)).as("n"),
        sum(col("x1")).as("rs1"), sum(col("x2")).as("rs2"),
        sum(col("x1") * col("x1")).as("rs11"),
        sum(col("x1") * col("x2")).as("rs12"),
        sum(col("x2") * col("x2")).as("rs22"),
        sum(col("y")).as("rsy"),
        sum(col("x1") * col("y")).as("rs1y"),
        sum(col("x2") * col("y")).as("rs2y"))
        .select(col("n").cast("double").as("nn"),
          col("rs1").cast("double").as("s1"), col("rs2").cast("double").as("s2"),
          col("rs11").cast("double").as("s11"), col("rs12").cast("double").as("s12"),
          col("rs22").cast("double").as("s22"), col("rsy").cast("double").as("sy"),
          col("rs1y").cast("double").as("s1y"), col("rs2y").cast("double").as("s2y"))
      m.selectExpr("CAST(nn AS BIGINT) AS n_rows" +: LinRegBetaExprs: _*)
    },

    // K-FOLD CROSS-VALIDATED REGRESSION (q149) — q138's model fit run
    // as an eval harness, the way distributed CV should be done: the
    // normal-equation co-moments are DECOMPOSABLE sufficient
    // statistics, so ONE grouped scan yields per-fold moments, each
    // fold's TRAINING moments are total − fold (exact integer/decimal
    // subtraction — no second scan, the q124 incremental-view rule),
    // the five Cramer solves run on a 5-row frame with q138's shared
    // formula text (betas bit-equal by construction), and scoring is
    // one broadcast join + a map-only residual whose square
    // floor-quantizes to integer micro-units and sums exactly per
    // fold. Two scans total for a full 5-fold
    // CV — at 100 TB the alternative (5 train passes + 5 score passes)
    // is 5× the IO for the identical numbers.
    "q149_crossval_regression" -> { (s, d) =>
      val feats = graft.Caches.scopedPersist(
        Tables.events(s, d).select(
          (col("event_id") % 5).as("fold"),
          expr("(unix_micros(ts) div 3600000000) % 24").as("x1"),
          (col("user_id") % 10).as("x2"),
          round(col("value"), 6).cast("decimal(18,6)").as("y")))
      val fm = feats.groupBy("fold").agg(
        count(lit(1)).as("n"),
        sum(col("x1")).as("rs1"), sum(col("x2")).as("rs2"),
        sum(col("x1") * col("x1")).as("rs11"),
        sum(col("x1") * col("x2")).as("rs12"),
        sum(col("x2") * col("x2")).as("rs22"),
        sum(col("y")).as("rsy"),
        sum(col("x1") * col("y")).as("rs1y"),
        sum(col("x2") * col("y")).as("rs2y"))
      val tot = fm.agg(
        sum(col("n")).as("tn"),
        sum(col("rs1")).as("ts1"), sum(col("rs2")).as("ts2"),
        sum(col("rs11")).as("ts11"), sum(col("rs12")).as("ts12"),
        sum(col("rs22")).as("ts22"), sum(col("rsy")).as("tsy"),
        sum(col("rs1y")).as("ts1y"), sum(col("rs2y")).as("ts2y"))
      val train = fm.crossJoin(broadcast(tot)).select(
        col("fold"),
        (col("tn") - col("n")).cast("double").as("nn"),
        (col("ts1") - col("rs1")).cast("double").as("s1"),
        (col("ts2") - col("rs2")).cast("double").as("s2"),
        (col("ts11") - col("rs11")).cast("double").as("s11"),
        (col("ts12") - col("rs12")).cast("double").as("s12"),
        (col("ts22") - col("rs22")).cast("double").as("s22"),
        (col("tsy") - col("rsy")).cast("double").as("sy"),
        (col("ts1y") - col("rs1y")).cast("double").as("s1y"),
        (col("ts2y") - col("rs2y")).cast("double").as("s2y"))
      val betas = train.selectExpr("fold" +: LinRegBetaExprs: _*)
      feats.join(broadcast(betas), "fold")
        .selectExpr("fold", CvResidual2Expr)
        .groupBy("fold")
        .agg(count(lit(1)).as("n_test"), sum(col("r2")).as("sse0"))
        .join(broadcast(betas), "fold")
        .selectExpr("fold", "n_test", "beta0", "beta1", "beta2", CvSseExpr)
        .selectExpr("fold", "n_test", "beta0", "beta1", "beta2", "sse", CvRmseExpr)
        .orderBy("fold")
    },

    // REFERENTIAL-INTEGRITY AUDIT (q159) — the warehouse DQ face q121
    // doesn't cover: cross-TABLE consistency. Four keyed anti-join
    // checks over the TPC-H relations (orphan lineitems, childless
    // orders, orders with unknown customers, customers with no
    // orders), reported long-form like q121 (check, n_left, n_orphans,
    // pass — "customers without orders" is informational, pass by
    // definition). Each check is one anti join keyed on the foreign
    // key — broadcast or SMJ as sizes dictate, never a scan product.
    "q159_referential_integrity" -> { (s, d) =>
      import s.implicits._
      val li = Tables.lineitem(s, d).select(col("l_orderkey"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val cust = Tables.customer(s, d).select(col("c_custkey"))
      def check(name: String, informational: Boolean,
                left: org.apache.spark.sql.DataFrame, orphans: Long): (String, Long, Long, Long) =
        (name, left.count(), orphans,
          if (informational || orphans == 0L) 1L else 0L)
      val rows = Seq(
        check("lineitem_has_order", informational = false, li,
          li.join(ord.select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"), "left_anti").count()),
        check("order_has_lineitem", informational = true, ord,
          ord.join(li, col("o_orderkey") === col("l_orderkey"), "left_anti").count()),
        check("order_has_customer", informational = false, ord,
          ord.join(cust, col("o_custkey") === col("c_custkey"), "left_anti").count()),
        check("customer_has_order", informational = true, cust,
          cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti").count()))
      rows.toDF("check_name", "n_left", "n_orphans", "pass")
        .orderBy("check_name")
    },

    // JOIN-KEY SKEW DIAGNOSTIC (q161) — the pre-flight report behind
    // every salting / AQE-skew-join / broadcast decision in this repo
    // (q134's salt width, q64's two-level distinct, the q116 hot-bucket
    // guard were each justified by exactly these numbers, measured ad
    // hoc): per join key, the frequency profile that says WHICH keys
    // would flood a shuffle partition. Per relation: one partial-agg'd
    // per-key count, then two driver-sized aggregations over the key
    // table — n_rows/n_keys/max, exact interpolated p50/p99 (the q46
    // rule), top-key share in ppm as exact integer division, and the
    // hot-key count under the cross-multiplied integer rule
    // c·n_keys > 2·n_rows (no float threshold). The totals ride a
    // 1-row broadcast crossJoin (the q115 dangling-mass idiom) — never
    // a window over the key table. All three profiled keys show real
    // skew shape at every SF (lineitem ~1-7 rows/order, events ~uniform
    // users, orders ~10 per customer), and the hot branch fires on
    // events/orders at the gate SFs.
    "q161_skew_report" -> { (s, d) =>
      def report(rel: DataFrame, key: String, name: String): DataFrame = {
        val cnts = graft.Caches.scopedPersist(
          rel.groupBy(col(key).as("k")).agg(count(lit(1)).as("c")))
        val tot = cnts.agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
          max(col("c")).as("max_cnt"),
          expr("percentile(c, 0.5)").as("p50_cnt"),
          expr("percentile(c, 0.99)").as("p99_cnt"))
        val hot = cnts.crossJoin(broadcast(tot.select("n_keys", "n_rows")))
          .agg(sum(when(col("c") * col("n_keys") > col("n_rows") * 2, 1L)
            .otherwise(0L)).as("n_hot"))
        tot.crossJoin(broadcast(hot))
          .select(lit(name).as("relation"), col("n_rows"), col("n_keys"),
            col("max_cnt"),
            expr("max_cnt * 1000000 div n_rows").as("top_share_ppm"),
            col("p50_cnt"), col("p99_cnt"), col("n_hot"))
      }
      report(Tables.lineitem(s, d), "l_orderkey", "lineitem.l_orderkey")
        .unionByName(report(Tables.orders(s, d), "o_custkey", "orders.o_custkey"))
        .unionByName(report(Tables.events(s, d), "user_id", "events.user_id"))
        .orderBy("relation")
    },

    // GINI CONCENTRATION AUDIT (q174) — the inequality face of the
    // skew report (q161 finds the keys that flood a partition; this
    // measures how concentrated the WHOLE distribution is — the number
    // a mixture designer reads before capping domains, q103). Exact
    // Gini without ever sorting the key table: group the per-key
    // counts BY COUNT VALUE (the value table is bounded by max
    // per-key activity, not key count), take one ordered window over
    // that value table (the q157 calendar-sized-window discipline),
    // and close the tie-block rank sum in closed form —
    // Σ i·cᵢ over a block of m keys of value c after K predecessors is
    // c·(m·K + m(m+1)/2), integer-exact because m(m+1) is even. Then
    // G·1e6 = (2·Σi·cᵢ − (n+1)·S)·1e6 div (n·S), exact integer ppm
    // (numerator ≤ n·S·1e6, so BIGINT holds to n·S ≈ 9.2e12; the
    // headroom is ENFORCED, r13 per VERDICT r12 item 3: the ×1e6
    // numerator, the (n+1)·S term, and the n·S denominator all ride
    // Guards.checkedMul — out-of-bounds raises a named error in any
    // SQL mode instead of relying on ANSI being on). The numerator is
    // never negative: ascending order makes Σi·cᵢ ≥ (n+1)·S/2.
    "q174_gini_concentration" -> { (s, d) =>
      def gini(rel: DataFrame, key: String, name: String): DataFrame = {
        val cnts = rel.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
        val vals = cnts.groupBy(col("c")).agg(count(lit(1)).as("m"))
        val w = Window.orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, -1)
        vals
          .withColumn("k_before", coalesce(sum(col("m")).over(w), lit(0L)))
          .select(
            (col("c") * (col("m") * col("k_before") +
              expr("m * (m + 1) div 2"))).as("sic_part"),
            col("m"), (col("c") * col("m")).as("s_part"))
          .agg(sum(col("sic_part")).as("sic"), sum(col("m")).as("n_keys"),
            sum(col("s_part")).as("n_rows"))
          .withColumn("gini_num", graft.functions.Guards.checkedMul(
            lit(2L) * col("sic") - graft.functions.Guards.checkedMul(
              col("n_keys") + lit(1L), col("n_rows"), "q174 gini (n+1)*S"),
            lit(1000000L), "q174 gini numerator"))
          .withColumn("gini_den", graft.functions.Guards.checkedMul(
            col("n_keys"), col("n_rows"), "q174 gini denominator"))
          .select(lit(name).as("relation"), col("n_keys"), col("n_rows"),
            expr("gini_num div gini_den").as("gini_ppm"))
      }
      gini(Tables.lineitem(s, d), "l_orderkey", "lineitem.l_orderkey")
        .unionByName(gini(Tables.orders(s, d), "o_custkey", "orders.o_custkey"))
        .unionByName(gini(Tables.events(s, d), "user_id", "events.user_id"))
        .orderBy("relation")
    },

    // CUSUM CHANGE-POINT (q175) — the drift detector that catches what
    // the z-score monitor (q129) cannot: a persistent LEVEL SHIFT too
    // small to push any single day past 3σ. Per event_type the daily
    // series is calendar-sized, so the ordered window is bounded (the
    // q157 discipline); the classic CUSUM Dₜ = Σ_{s≤t}(c_s − S/n)
    // stays integer-exact scaled by n: d_scaled = n·Cumₜ − t·S. The
    // change-point is argmax |d| per series, found with one 5-row
    // broadcast of per-type maxima — never a second sort. Headroom:
    // n_days·S must fit BIGINT (days·corpus-rows ≤ 9.2e18 — ENFORCED,
    // r13 per VERDICT r12 item 3: both d_scaled products ride
    // Guards.checkedMul, so an out-of-bounds corpus raises a named
    // error in any SQL mode; at 100 TB escalate to DECIMAL(38,0)).
    "q175_cusum_changepoint" -> { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
      val tot = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum(col("c")).as("s_total"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val d2 = daily
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("cum", sum(col("c")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .join(broadcast(tot), "event_type")
        .withColumn("d_scaled",
          graft.functions.Guards.checkedMul(col("n_days"), col("cum"),
            "q175 cusum n*cum") -
            graft.functions.Guards.checkedMul(col("i"), col("s_total"),
              "q175 cusum t*S"))
      val peak = d2.groupBy("event_type")
        .agg(max(abs(col("d_scaled"))).as("max_abs_d"))
      d2.join(broadcast(peak), "event_type")
        .select(col("event_type"), col("day"), col("c"), col("d_scaled"),
          when(abs(col("d_scaled")) === col("max_abs_d"), 1L).otherwise(0L)
            .as("is_changepoint"))
        .orderBy("event_type", "day")
    },

    // TRIMMED MEAN (q176) — the robust-statistics face of the monitor
    // pair (q129 flags outliers; this reports the center WITHOUT
    // them): exact interpolated p01/p99 per group (the q46 rule — the
    // interpolation arithmetic is bit-equal across engines, so the
    // trim bounds are identical doubles and the kept row set can never
    // straddle), then one map-side flagged second scan against the
    // 5-row broadcast bounds. Means follow q129's discipline: DECIMAL-
    // exact sums cast to double, ONE closed-form division — shuffle
    // order cannot wiggle them. Two scans, no window, no per-group
    // sort.
    "q176_trimmed_mean" -> { (s, d) =>
      val y = col("value").cast("decimal(18,2)")
      val stats = Tables.events(s, d).groupBy("event_type")
        .agg(count(lit(1)).as("n_total"),
          sum(y).cast("double").as("sy"),
          expr("percentile(value, 0.01)").as("p01"),
          expr("percentile(value, 0.99)").as("p99"))
      Tables.events(s, d)
        .join(broadcast(stats), "event_type")
        .filter(col("value") >= col("p01") && col("value") <= col("p99"))
        .groupBy(col("event_type"), col("n_total"), col("sy"))
        .agg(count(lit(1)).as("n_kept"), sum(y).cast("double").as("syk"))
        .select(col("event_type"), col("n_total"), col("n_kept"),
          (col("sy") / col("n_total")).as("mean_all"),
          (col("syk") / col("n_kept")).as("mean_trimmed"))
        .orderBy("event_type")
    },

    // A/B EXPERIMENT REPORT (q177) — the two-sample significance read
    // behind every launch decision: deterministic assignment (user_id
    // parity — the hash-bucket split a real platform uses), per-
    // (event_type, arm) exact moments folded by CONDITIONAL aggregation
    // into one corpus pass (the q47/q129 rule: counts + DECIMAL-exact
    // Σy and Σy² so shuffle order cannot wiggle them), then Welch's t
    // assembled from SHARED closed-form expression texts (the q138
    // rule: one text, two engines, bit-equal doubles — mean, sample
    // variance, and t are each a fixed dag of IEEE ops on bit-equal
    // inputs). No join anywhere; the report is one partial-agg'd
    // 5-group aggregate.
    "q177_ab_welch" -> { (s, d) =>
      val y = col("value").cast("decimal(18,2)")
      val yy = (y * y).cast("decimal(38,4)")
      def arm(a: Int, e: org.apache.spark.sql.Column) =
        sum(when(col("user_id") % 2 === a, e).otherwise(lit(null)))
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          count(when(col("user_id") % 2 === 0, lit(1))).as("n0"),
          count(when(col("user_id") % 2 === 1, lit(1))).as("n1"),
          arm(0, y).cast("double").as("sy0"),
          arm(1, y).cast("double").as("sy1"),
          arm(0, yy).cast("double").as("syy0"),
          arm(1, yy).cast("double").as("syy1"))
        .select(col("event_type"), col("n0"), col("n1"),
          expr(AbMean0Expr), expr(AbMean1Expr), expr(AbDiffExpr),
          expr(AbWelchTExpr))
        .orderBy("event_type")
    },

    // MAD OUTLIER AUDIT (q178) — the breakdown-resistant scale read
    // beside the trimmed mean (q176): median and MAD survive 50%
    // contamination where q129's σ is dragged by the very outliers it
    // hunts. Three passes, each map-side against a 5-row broadcast:
    // exact interpolated median (the q46 rule — bit-equal across
    // engines), then MAD = median of |value − med| over the derived
    // column (same interpolation arithmetic on bit-equal doubles),
    // then the flag pass counting |value − med| > 3·MAD with the
    // comparison text shared verbatim between engines so the cut can
    // never straddle. Exact-ppm rate; no window, no per-group sort.
    "q178_mad_outliers" -> { (s, d) =>
      val med = Tables.events(s, d).groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val mad = Tables.events(s, d)
        .join(broadcast(med), "event_type")
        .groupBy(col("event_type"), col("med"))
        .agg(count(lit(1)).as("n"),
          expr("percentile(abs(value - med), 0.5)").as("mad"))
      Tables.events(s, d)
        .join(broadcast(mad), "event_type")
        .groupBy(col("event_type"), col("n"), col("med"), col("mad"))
        .agg(sum(when(expr(MadOutlierPred), 1L).otherwise(0L)).as("n_outliers"))
        .select(col("event_type"), col("n"), col("med"), col("mad"),
          col("n_outliers"),
          expr("n_outliers * 1000000 div n").as("outlier_ppm"))
        .orderBy("event_type")
    },

    // HISTOGRAM-QUANTILE EVAL (q180) — the 100 TB percentile path,
    // graded against the exact truth (the q153/q132 sketch-eval
    // precedent): exact interpolated percentiles need a full per-group
    // sort, but a FIXED-WIDTH histogram needs only ONE partial-agg'd
    // (type, bucket) count — constant state per group — and answers any
    // quantile to within the covering bucket of the q·n-th order
    // statistic (NOT a global ±bucket-width bound: in a sparse tail,
    // adjacent order statistics can sit buckets apart, so the distance
    // to the interpolated exact percentile is data-dependent — the
    // err columns report it). Buckets are unit-width floor(value)
    // (deterministic integer from the raw double, no libm); the
    // estimate interpolates inside the covering bucket with a fixed
    // IEEE dag on exact integers, so both engines produce bit-equal
    // doubles. The report carries exact, estimate, and signed error per
    // quantile — the number that justifies replacing the sort with the
    // sketch at scale. The only window runs over the ≤1024-row-per-type
    // bucket table.
    "q180_histogram_quantile" -> { (s, d) =>
      val b = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("CAST(floor(value) AS BIGINT)").as("bucket"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = b.withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(Window.partitionBy("event_type")))
      // CAST the quantile literal to DOUBLE explicitly: both engines
      // otherwise type 0.5 as DECIMAL(1,1) and decimal×BIGINT rounding
      // would diverge from the double dag. The covering bucket is the
      // UNIQUE one with cum−c < target ≤ cum (cum strictly increases),
      // so the min() is a pick, not a search.
      def est(q: String, name: String) = {
        val target = expr(s"CAST($q AS DOUBLE) * n")
        min(when(col("cum") >= target && (col("cum") - col("c")) < target,
          col("bucket") + (target - (col("cum") - col("c"))) / col("c")))
          .as(name)
      }
      val sketch = cum.groupBy("event_type")
        .agg(est("0.5", "p50_est"), est("0.9", "p90_est"))
      val exact = Tables.events(s, d).groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("p50_exact"),
          expr("percentile(value, 0.9)").as("p90_exact"))
      exact.join(broadcast(sketch), "event_type")
        .select(col("event_type"), col("p50_exact"), col("p50_est"),
          (col("p50_est") - col("p50_exact")).as("p50_err"),
          col("p90_exact"), col("p90_est"),
          (col("p90_est") - col("p90_exact")).as("p90_err"))
        .orderBy("event_type")
    },

    // LOG-LINEAR PERCENTILE SKETCH (q240, r14) — the RELATIVE-error
    // complement to q180's fixed-width histogram (whose error is
    // absolute: one unit-width bucket is great at p50 ≈ 34 and useless
    // at p99 ≈ 22000 if values spanned 10^6): DDSketch/HDR-histogram
    // bucketing — cents < 32 exact, else (msb, next-4-bits), giving
    // buckets of width 2^(msb-4) whose midpoint representative is
    // within 1/32 ≈ 3.1% of ANY member. The bucket index needs only
    // bin-length and shifts (no ln — the q104 rule), so both engines
    // compute identical sketches. Quantiles are NEAREST-RANK
    // (target = ceil(q·n), integer — no interpolation to diverge on),
    // picked from the cumulative register table by the q180 covering
    // rule; the exact side runs the SAME rule over the distinct-cents
    // table, so est vs exact isolates the bucketing error alone.
    // Measured: every error ≤ 1.9% (bound 3.125%) — the guarantee
    // Round14cEvalSpec asserts per type. Work shape: one partial-agg'd
    // (type, bucket) count — ≤ a few hundred cells per type regardless
    // of corpus; the exact side's window is bounded by the cents
    // DOMAIN (≤ 49k distinct), not the corpus (the q46/q180 rule).
    "q240_loglinear_percentiles" -> { (s, d) =>
      val c = Tables.events(s, d).select(col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      val b = c.select(col("event_type"),
        expr("""CASE WHEN cents < 32 THEN cents
                ELSE shiftleft(16 + shiftright(cents, length(bin(cents)) - 5) % 16,
                       cast(length(bin(cents)) - 5 as int))
                     + shiftright(shiftleft(cast(1 as bigint), cast(length(bin(cents)) - 5 as int)), 1) END""")
          .as("rep"))
      def ranked(df: DataFrame, vCol: String) = {
        val w = Window.partitionBy("event_type").orderBy(vCol)
        val wn = Window.partitionBy("event_type")
        df.groupBy("event_type", vCol).agg(count(lit(1)).as("cnt"))
          .withColumn("cum", sum(col("cnt")).over(w))
          .withColumn("n", sum(col("cnt")).over(wn))
      }
      def pick(q: Int, name: String) = {
        val t = expr(s"(n * $q + 99) div 100")
        min(when(col("cum") >= t && col("cum") - col("cnt") < t,
          col("v"))).as(name)
      }
      // rep is a bijection of the bucket id, so grouping by rep IS the
      // sketch (and saves carrying two columns through the window)
      val skAgg = ranked(b.select(col("event_type"), col("rep")), "rep")
        .withColumnRenamed("rep", "v")
        .groupBy("event_type").agg(pick(50, "p50_est"), pick(99, "p99_est"))
      val exAgg = ranked(c, "cents").withColumnRenamed("cents", "v")
        .groupBy("event_type").agg(pick(50, "p50_exact"), pick(99, "p99_exact"))
      // greatest(·,1): cents = round(value·100) can legitimately be 0,
      // and a 0 exact percentile would split the engines (Spark div →
      // NULL, DuckDB // → error); the guard is mirrored verbatim in the
      // oracle so the edge stays defined and symmetric (r15, ADVICE r14)
      exAgg.join(broadcast(skAgg), "event_type")
        .select(col("event_type"), col("p50_exact"), col("p50_est"),
          expr("abs(p50_est - p50_exact) * 1000000 div greatest(p50_exact, 1)")
            .as("p50_err_ppm"),
          col("p99_exact"), col("p99_est"),
          expr("abs(p99_est - p99_exact) * 1000000 div greatest(p99_exact, 1)")
            .as("p99_err_ppm"))
        .orderBy("event_type")
    },

    // EXPONENTIAL-DECAY ENGAGEMENT (q181) — the recency-weighted
    // feature every ranking/churn model wants, with the decay kept
    // EXACT: the weight for an event aged a weeks is 2^(30−a), a pure
    // power of two, so the score is Σ cents·2^(30−a) — one integer
    // shift per row (no libm pow, no order-dependent double sum; the
    // q42 no-libm rule's integer twin). Cents are decimal-exact
    // (value → DECIMAL(18,2)·100), ages anchor on the corpus max day
    // riding a 1-row broadcast crossJoin (the q115/q161 idiom), and the
    // per-user fold is one partial-agg'd BIGINT sum. Headroom: cents <
    // 2^16, shift ≤ 30, rows/user ≤ 2^10 at the gate SFs ⇒ score <
    // 2^56; a 100 TB deployment drops the anchor shift to keep
    // Σ < 2^63 — ENFORCED, not just stated (r12, ADVICE r11): the
    // shift rides Guards.boundedShiftLeft, so an event older than 30
    // weeks (shift < 0 — which Spark would silently mask to its low 6
    // bits) or a raised anchor crashes the query with a named error
    // instead of corrupting scores.
    "q181_decay_engagement" -> { (s, d) =>
      val t = Tables.events(s, d)
        .agg(max(expr("unix_micros(ts) div 86400000000")).as("max_day"))
      Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
        .crossJoin(broadcast(t))
        .select(col("user_id"),
          graft.functions.Guards.boundedShiftLeft(col("cents"),
            expr("30 - (max_day - day) div 7"), 30, "q181 decay weight")
            .as("wv"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum(col("wv")).as("score_q30"))
        .orderBy("user_id")
    },

    // INCREMENTAL VIEW MAINTENANCE WITH RETRACTIONS (q182) — the
    // Flink-style retract-stream contract proven in batch (the
    // q124/q130 incremental family, extended to NEGATIVE deltas): an
    // 'error' event RETRACTS one unit of presence and its value, so
    // the maintained per-user aggregate is (Σ±1, Σ±cents). The
    // incremental path materializes the first event_id half, aggregates
    // the second half as a delta, and merges with ONE keyed full_outer
    // join + coalesced component sums — never re-reading the base
    // half. The oracle recomputes one-shot over the whole log with the
    // same signed rule: the hash match is the increment ≡ recompute
    // theorem, per user, in exact integers.
    "q182_ivm_retractions" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          when(col("event_type") === "error", -1L).otherwise(1L).as("sgn"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      val mid = ev.agg((max("event_id") / 2).cast("long").as("m"))
      val signed = ev.crossJoin(broadcast(mid))
        .select(col("user_id"), (col("event_id") <= col("m")).as("base"),
          col("sgn"), (col("sgn") * col("cents")).as("sc"))
      def agg(df: DataFrame, n: String, s2: String) =
        df.groupBy("user_id")
          .agg(sum(col("sgn")).as(n), sum(col("sc")).as(s2))
      val m = agg(signed.filter(col("base")), "n_b", "s_b")
      val dlt = agg(signed.filter(!col("base")), "n_d", "s_d")
      m.join(dlt, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n_net"),
          (coalesce(col("s_b"), lit(0L)) + coalesce(col("s_d"), lit(0L))).as("cents_net"))
        .orderBy("user_id")
    },

    // LAST-TOUCH ATTRIBUTION (q183) — the marketing-analytics dual of
    // the funnel (q81 asks "did the user convert"; this asks "which
    // touch gets CREDIT for each purchase"): the latest view-or-click
    // strictly before the purchase within a 12 h lookback, else
    // 'none'. One user-keyed ordered window carrying the last touch
    // (the q152 bounded-per-user-window scale shape — never a
    // purchase×touch join), tie-broken by (ts, event_id) so the carry
    // is total-ordered; the channel report is a 3-row aggregate with
    // exact-ppm shares off a 1-row broadcast.
    "q183_lasttouch_attribution" -> { (s, d) =>
      val winUs = 43200000000L
      val touch = when(col("event_type").isin("view", "click"), col("ts_us"))
      val touchT = when(col("event_type").isin("view", "click"), col("event_type"))
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val attr = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts)").as("ts_us"),
          col("event_id"), col("event_type"))
        .withColumn("lt_ts", last(touch, ignoreNulls = true).over(w))
        .withColumn("lt_type", last(touchT, ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(when(col("lt_ts").isNotNull &&
            col("lt_ts") >= col("ts_us") - winUs, col("lt_type"))
          .otherwise(lit("none")).as("channel"))
      val counts = attr.groupBy("channel").agg(count(lit(1)).as("n_purchases"))
      val tot = counts.agg(sum(col("n_purchases")).as("n_total"))
      counts.crossJoin(broadcast(tot))
        .select(col("channel"), col("n_purchases"),
          expr("n_purchases * 1000000 div n_total").as("share_ppm"))
        .orderBy("channel")
    },

    // ROLLING 7-DAY FEATURES (q185) — the trailing-window features a
    // churn/ranking model trains on: per user-day, events and exact
    // cents over the last 7 calendar days. The corpus first collapses
    // to the per-(user, day) grain (one partial-agg'd pass), and only
    // THEN does the RANGE window run — over each user's calendar-sized
    // daily series (the q157 discipline), never over raw events. All
    // integers: decimal-exact cents, BIGINT day keys, RANGE 6
    // PRECEDING on the integer day so gaps in activity still look back
    // 7 real days (a ROWS frame would look back 7 ACTIVE days — the
    // classic rolling-feature bug, called out so nobody "fixes" this).
    "q185_rolling_features" -> { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("n_day"),
          sum(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .as("cents_day"))
      val w = Window.partitionBy("user_id").orderBy("day").rangeBetween(-6, 0)
      daily
        .withColumn("roll7_n", sum(col("n_day")).over(w))
        .withColumn("roll7_cents", sum(col("cents_day")).over(w))
        .orderBy("user_id", "day")
    },

    // ERASURE CASCADE AUDIT (q186) — the GDPR deletion simulation
    // beside the k-anonymity audit (q171 measures risk; this measures
    // BLAST RADIUS): subjects are the customers in the request registry
    // (c_custkey ≡ 0 mod 97 — deterministic stand-in for a request
    // table), and the purge CASCADES along the foreign keys: customer
    // rows → their orders (one keyed semi-join) → those orders'
    // lineitems (a second keyed semi-join on the DERIVED order keys —
    // never customer×lineitem). Per relation: total, purged, exact-ppm
    // share. The request list is corpus-proportional (1/97 of
    // customers), so its joins stay keyed equi-joins under AQE rather
    // than forced broadcasts (the q50 dim-scaling rule).
    "q186_erasure_audit" -> { (s, d) =>
      val reqs = Tables.customer(s, d)
        .filter(col("c_custkey") % 97 === 0).select(col("c_custkey").as("k"))
      val orders = Tables.orders(s, d)
      val purgedOrders = orders
        .join(reqs, orders("o_custkey") === reqs("k"), "left_semi")
      val po = graft.Caches.scopedPersist(purgedOrders.select(col("o_orderkey").as("ok")))
      val li = Tables.lineitem(s, d)
      def row(name: String, total: DataFrame, purged: DataFrame) =
        total.agg(count(lit(1)).as("n_total"))
          .crossJoin(broadcast(purged.agg(count(lit(1)).as("n_purged"))))
          .select(lit(name).as("relation"), col("n_total"), col("n_purged"),
            expr("n_purged * 1000000 div n_total").as("purged_ppm"))
      row("customer", Tables.customer(s, d),
        Tables.customer(s, d).filter(col("c_custkey") % 97 === 0))
        .unionByName(row("orders", orders, purgedOrders))
        .unionByName(row("lineitem", li,
          li.join(po, li("l_orderkey") === po("ok"), "left_semi")))
        .orderBy("relation")
    },

    // WILSON CONFIDENCE INTERVALS (q189) — the uncertainty the A/B
    // report (q177) and conversion cohorts (q169) omit: per signup-day
    // cohort, the 95% Wilson score interval around the conversion rate
    // — the bound that stays honest at small n where the normal
    // approximation lies. k and n are exact integers (two partial-agg'd
    // first-event passes, the q169 shape); the interval is ONE shared
    // fixed IEEE dag (the q138 rule) on (k, n, z=1.96), so both engines
    // emit bit-equal doubles. No window, one keyed left join.
    "q189_wilson_ci" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(expr("unix_micros(ts)")).as("s_us"))
      val pu = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(expr("unix_micros(ts)")).as("p_us"))
      su.join(pu, Seq("user_id"), "left")
        .select(expr("s_us div 86400000000").as("cohort_day"),
          when(col("p_us") >= col("s_us"), 1L).otherwise(0L).as("conv"))
        .groupBy("cohort_day")
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("k"))
        .select(col("cohort_day"), col("n"), col("k"),
          expr(WilsonCenterExpr), expr(WilsonLoExpr), expr(WilsonHiExpr))
        .orderBy("cohort_day")
    },

    // SHIP-LAG SLA REPORT (q190) — the fulfillment-latency read every
    // ops dashboard runs over the order→lineitem join: per order
    // year-month, exact interpolated p50/p95 lag (integer days, the
    // q46 rule), the SLA-breach share (> 60 days) and the IMPOSSIBLE
    // share (negative lag — shipment before order, the referential DQ
    // flag beside q159), both exact ppm. One keyed big-big join
    // (lineitem ⋈ orders shuffles on the order key) and one
    // partial-agg'd month rollup; the fixture's uncorrelated synthetic
    // dates make both audit branches fire at every SF.
    "q190_shiplag_sla" -> { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(
          (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
            .cast("long").as("ym"),
          // the date columns land as TIMESTAMP_NTZ (the TESTDATA.md
          // gotcha); the UTC-session cast makes them µs-epoch exactly
          // like DuckDB's native epoch_us on the same parquet values
          expr("(unix_micros(CAST(l_shipdate AS TIMESTAMP)) - " +
            "unix_micros(CAST(o_orderdate AS TIMESTAMP))) div 86400000000")
            .as("lag_days"))
        .groupBy("ym")
        .agg(count(lit(1)).as("n_lines"),
          expr("percentile(lag_days, 0.5)").as("p50_lag"),
          expr("percentile(lag_days, 0.95)").as("p95_lag"),
          sum(when(col("lag_days") > 60L, 1L).otherwise(0L)).as("n_breach"),
          sum(when(col("lag_days") < 0L, 1L).otherwise(0L)).as("n_negative"))
        .select(col("ym"), col("n_lines"), col("p50_lag"), col("p95_lag"),
          col("n_breach"),
          expr("n_breach * 1000000 div n_lines").as("breach_ppm"),
          col("n_negative"),
          expr("n_negative * 1000000 div n_lines").as("negative_ppm"))
        .orderBy("ym")
    },

    // SEASONAL-BASELINE ANOMALY (q191) — the monitoring gap between
    // the global z-score (q129) and the level-shift CUSUM (q175): a
    // Tuesday that is normal for a Saturday. Daily counts collapse
    // from the corpus in ONE partial-agg'd pass; each day-of-week's
    // baseline (exact integer moments over its ≤ ⌈days/7⌉ members) is
    // a 7-row broadcast; the deviation stays integer-exact scaled by
    // n (dev = n·c − S, the q175 trick), and the flag is the ARGMAX
    // deviation per weekday (a 2σ cut was rejected: the fixture's
    // near-uniform days never cross it at any SF — the q121
    // vacuous-branch rule; the worst-day-per-weekday flag fires 7 of
    // 30 days everywhere and is the row an on-call actually reads).
    // Headroom: n·c must fit BIGINT — ENFORCED, r13 per VERDICT r12
    // item 3: the n·c product rides Guards.checkedMul (named error in
    // any SQL mode); past ≈ 9e18 escalate to DECIMAL(38,0), the q161
    // rule.
    "q191_seasonal_baseline" -> { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
        .withColumn("dow", expr("day % 7"))
      val base = daily.groupBy("dow")
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
      val dev = daily.join(broadcast(base), "dow")
        .withColumn("dev_scaled",
          graft.functions.Guards.checkedMul(col("n"), col("c"),
            "q191 seasonal n*c") - col("sc"))
      val worst = dev.groupBy("dow")
        .agg(max(abs(col("dev_scaled"))).as("max_abs_dev"))
      dev.join(broadcast(worst), "dow")
        .select(col("day"), col("dow"), col("c"),
          expr("sc div n").as("dow_mean_floor"), col("dev_scaled"),
          when(abs(col("dev_scaled")) === col("max_abs_dev"), 1L)
            .otherwise(0L).as("is_worst"))
        .orderBy("day")
    },

    // CONVERSION-LAG COHORTS (q169) — the duration face of the funnel
    // (q81 counts stage reach; q122 counts day-offset activity; this
    // measures HOW LONG signup → first purchase takes, per signup-day
    // cohort): first signup and first purchase per user are two
    // partial-agg'd mins, the lag exists only when the purchase does
    // not predate the signup (a LEFT join keeps unconverted users in
    // the denominator), and the cohort report is one groupBy with
    // exact-ppm conversion and exact interpolated p50/p90 lags (the
    // q46 percentile rule; both engines ignore NULL lags, so
    // unconverted users never skew the quantiles). Epoch-µs BIGINTs
    // end-to-end — the q81/q119 no-raw-TIMESTAMP rule.
    "q169_conversion_lag" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(expr("unix_micros(ts)")).as("s_us"))
      val pu = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(expr("unix_micros(ts)")).as("p_us"))
      val j = su.join(pu, Seq("user_id"), "left")
        .select(expr("s_us div 86400000000").as("cohort_day"),
          when(col("p_us") >= col("s_us"), col("p_us") - col("s_us")).as("delay_us"))
      j.groupBy("cohort_day")
        .agg(count(lit(1)).as("n_signups"),
          count(col("delay_us")).as("n_converted"),
          expr("percentile(delay_us, 0.5)").as("p50_delay_us"),
          expr("percentile(delay_us, 0.9)").as("p90_delay_us"))
        .select(col("cohort_day"), col("n_signups"), col("n_converted"),
          expr("n_converted * 1000000 div n_signups").as("conv_ppm"),
          col("p50_delay_us"), col("p90_delay_us"))
        .orderBy("cohort_day")
    },

    // K-ANONYMITY RISK AUDIT (q171) — the data-governance gate a
    // training-data release runs beside the PII scrub (q95 removes
    // direct identifiers; this measures RE-IDENTIFICATION risk from
    // quasi-identifiers): under the QI tuple (event_type, user_id %
    // 100, event day), any group smaller than k = 5 re-identifies its
    // members, so the release report counts, per event_type, the
    // groups below k and the rows at risk (the rows a k-anonymizer
    // would suppress or generalize). Work shape: ONE partial-agg'd
    // group count over the QI tuple, then one partial-agg'd rollup of
    // the group table per event_type — the group table is
    // |types|·|cohorts|·|days|, bounded by the QI domain, not the
    // corpus. Exact-ppm risk rate; both branches fire at every SF
    // (sf0.1: 3035 of 14980 groups below k). Epoch-µs day bucketing,
    // the q122 rule.
    "q171_k_anonymity" -> { (s, d) =>
      val g = Tables.events(s, d)
        .groupBy(col("event_type"), (col("user_id") % 100).as("cohort"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("c"))
      g.groupBy("event_type")
        .agg(count(lit(1)).as("n_groups"),
          sum(col("c")).as("n_rows"),
          sum(when(col("c") < 5L, 1L).otherwise(0L)).as("n_below_k"),
          sum(when(col("c") < 5L, col("c")).otherwise(0L)).as("n_rows_at_risk"))
        .select(col("event_type"), col("n_groups"), col("n_rows"),
          col("n_below_k"), col("n_rows_at_risk"),
          expr("n_rows_at_risk * 1000000 div n_rows").as("risk_ppm"))
        .orderBy("event_type")
    },

    // L-DIVERSITY AUDIT (q234, r14) — k-anonymity's blind spot: a QI
    // group can be large (passes q171's k = 5) yet have every member
    // share ONE sensitive value, so membership alone discloses it
    // (homogeneity attack). Here the QI tuple is (cohort, day) and the
    // sensitive attribute is event_type: a group is l-diverse when it
    // carries ≥ l = 3 DISTINCT sensitive values. Same two-level shape
    // as q171 — one partial-agg'd distinct count over the QI tuple
    // (bounded by the QI domain, not the corpus), then a per-day rollup
    // of the group table. Exact-ppm risk rate; both branches fire at
    // every SF (sf0.01: 40–50 of ~95 groups per day below l).
    "q234_l_diversity" -> { (s, d) =>
      val g = Tables.events(s, d)
        .groupBy((col("user_id") % 100).as("cohort"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(countDistinct(col("event_type")).as("n_sens"),
          count(lit(1)).as("c"))
      g.groupBy("day")
        .agg(count(lit(1)).as("n_groups"),
          sum(col("c")).as("n_rows"),
          sum(when(col("n_sens") < 3L, 1L).otherwise(0L)).as("n_below_l"),
          sum(when(col("n_sens") < 3L, col("c")).otherwise(0L)).as("n_rows_at_risk"))
        .select(col("day"), col("n_groups"), col("n_rows"), col("n_below_l"),
          col("n_rows_at_risk"),
          expr("n_rows_at_risk * 1000000 div n_rows").as("risk_ppm"))
        .orderBy("day")
    },

    // T-CLOSENESS AUDIT (q235, r14) — the third rung of the privacy
    // ladder (q171 group size, q234 value diversity, this one value
    // DISTRIBUTION): a group can be k-anonymous and l-diverse yet still
    // leak by skew (90% 'error' in a group vs 20% globally tells an
    // attacker plenty). Per QI group, the Earth Mover's Distance between
    // the group's sensitive distribution and the corpus-wide one, over
    // the alphabetical event_type order with unit spacing — for ordered
    // categories EMD reduces to the mean |cumulative difference|, which
    // runs in exact integers: per type, |cumG·T − cumT·G| scaled to ppm
    // of G·T. Headroom (r15, ADVICE r14): the binding product is the
    // ×10⁶ ppm scale over |cumG·T − cumT·G| (worst case ≈ G·T), so the
    // checkedMul guard fires once G·T exceeds ~9.2×10¹² — NOT the
    // ≈10¹⁴ edge of the raw cum products; past it the named error
    // escalates (the q161 rule) and the fix is dividing by den BEFORE
    // the ppm scale on both faces (DuckDB overflows at the same point,
    // just with its own error surface). Then the per-group mean over
    // the k−1 interior
    // steps (the last cum step is identically 0 and contributes
    // nothing). Work shape: two partial-agg'd group tables (QI-domain
    // bounded), the dense QI×type grid via a broadcast of the 5-row type
    // relation, and a cum window whose partitions are single QI groups
    // (k = 5 rows each — bounded by the type domain, never the corpus).
    "q235_t_closeness" -> { (s, d) =>
      import graft.functions.Guards.checkedMul
      val e = Tables.events(s, d)
        .select(col("event_type"), (col("user_id") % 100).as("cohort"),
          expr("unix_micros(ts) div 86400000000").as("day"))
      val tot = e.groupBy("event_type").agg(count(lit(1)).as("ct"))
      val scalars = tot.agg(sum(col("ct")).as("t_all"),
        count(lit(1)).as("k_types"))
      val g = e.groupBy("cohort", "day").agg(count(lit(1)).as("g_n"))
      val gc = e.groupBy("cohort", "day", "event_type")
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("cohort", "day").orderBy("event_type")
      val emd = g.crossJoin(broadcast(tot))
        .join(gc, Seq("cohort", "day", "event_type"), "left")
        .select(col("cohort"), col("day"), col("g_n"),
          sum(coalesce(col("c"), lit(0L))).over(w).as("cum_g"),
          sum(col("ct")).over(w).as("cum_t"))
        .crossJoin(broadcast(scalars))
        .withColumn("num_ppm", checkedMul(
          abs(checkedMul(col("cum_g"), col("t_all"), "q235 emd cumG*T") -
            checkedMul(col("cum_t"), col("g_n"), "q235 emd cumT*G")),
          lit(1000000L), "q235 emd ppm scale"))
        .withColumn("den", checkedMul(col("g_n"), col("t_all"), "q235 emd G*T"))
        .groupBy(col("cohort"), col("day"), col("g_n"), col("k_types"))
        .agg(sum(expr("num_ppm div den")).as("sum_ppm"))
        .select(col("day"), col("g_n"),
          expr("sum_ppm div (k_types - 1)").as("emd_ppm"))
      emd.groupBy("day")
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("emd_ppm") > 300000L, 1L).otherwise(0L)).as("n_tclose_fail"),
          sum(when(col("emd_ppm") > 300000L, col("g_n")).otherwise(0L))
            .as("n_rows_at_risk"),
          max(col("emd_ppm")).as("max_emd_ppm"))
        .orderBy("day")
    },

    // OFF-POLICY EVALUATION VIA IPS (q233, r14) — the counterfactual
    // question every logged-interaction dataset gets asked before a
    // policy ships: "what reward WOULD the new policy have earned on
    // this log?" — answered without deployment by inverse-propensity
    // scoring: V̂ = (1/n_c)·Σ 1{a_i = π(c_i)}·r_i/p̂(a_i|c_i), with the
    // behavior propensity p̂ estimated from the log itself as the
    // context-conditional action frequency. Context = user cohort
    // (user_id % 10), target policy π = a deterministic context rule
    // (purchase for even cohorts, view for odd — so the two policy
    // branches both fire), reward = exact cents (round(value·100), the
    // q207 rule). Everything rational: p̂ = n_ct/n_c exactly, so each
    // matched row contributes cents·n_c div n_ct (per-row floor,
    // documented — identical in both engines, order-free since every
    // term is an exact integer before the sum). The naive logged mean
    // of matched rewards rides along: IPS reweights it by 1/p̂, and on
    // this log the two nearly agree — the signal that reward is
    // independent of the propensity here, itself a finding. Work shape:
    // one row-level pass joined to two broadcast cohort tables (10
    // rows); all division happens on bounded aggregates.
    "q233_ips_policy_eval" -> { (s, d) =>
      val e = Tables.events(s, d)
        .select((col("user_id") % 10).as("cohort"), col("event_type"),
          expr("cast(round(value * 100) as bigint)").as("cents"))
        .withColumn("target",
          when(col("cohort") % 2 === 0, "purchase").otherwise("view"))
      val cc = e.groupBy("cohort").agg(count(lit(1)).as("n_c"))
      val matched = e.filter(col("event_type") === col("target"))
      val ca = matched.groupBy("cohort")
        .agg(count(lit(1)).as("n_ct"), sum(col("cents")).as("sum_cents"))
      val ips = matched.join(broadcast(cc), "cohort")
        .join(broadcast(ca), "cohort")
        .withColumn("term", expr("cents * n_c div n_ct"))
        .groupBy("cohort").agg(sum(col("term")).as("ips_sum"))
      cc.join(ca, Seq("cohort"), "left").join(ips, Seq("cohort"), "left")
        .select(col("cohort"), col("n_c").as("n"),
          coalesce(col("n_ct"), lit(0L)).as("n_match"),
          expr("coalesce(ips_sum, 0) div n_c").as("ips_cents"),
          expr("coalesce(sum_cents, 0) div greatest(coalesce(n_ct, 0), 1)")
            .as("logged_mean_cents"))
        .orderBy("cohort")
    },

    // EXACT AUC / MANN–WHITNEY (q236, r14) — the threshold-free
    // companion to q217's calibration bins and q154's confusion matrix:
    // does doc length (n_chars) rank English docs above the rest? AUC
    // is the Mann–Whitney U statistic normalized by n_pos·n_neg,
    // computed EXACTLY from the score-group table — never per-pair: per
    // distinct score, (pos_s, neg_s) counts, then concordant pairs via
    // the running negatives-below window and ties at half weight
    // (auc2 = Σ pos_s·(2·negBelow + neg_s), the ×2 scale that keeps the
    // tie term integral). ppm division at the end; gini = 2·AUC − 1
    // derived from the already-floored ppm so both engines share the
    // truncation. The global window is bounded by the score DOMAIN
    // (313 distinct n_chars values, a schema property — the q218
    // bounded-head rule), not the corpus; the corpus-sized pass is the
    // one partial-agg'd groupBy(score). Result ≈ 0.49 — length does NOT
    // separate languages on this fixture; an honest null finding the
    // gate still checks bit-for-bit.
    "q236_auc_ranking" -> { (s, d) =>
      import graft.functions.Guards.checkedMul
      val g = Tables.documents(s, d)
        .groupBy(col("n_chars").as("score"))
        .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("pos_s"),
          sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("neg_s"))
      val w = Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
      g.select(col("pos_s"), col("neg_s"),
          coalesce(sum(col("neg_s")).over(w), lit(0L)).as("neg_below"))
        .agg(sum(col("pos_s")).as("n_pos"), sum(col("neg_s")).as("n_neg"),
          sum(checkedMul(col("pos_s"),
            lit(2L) * col("neg_below") + col("neg_s"), "q236 auc pairs"))
            .as("auc2"))
        .withColumn("num", checkedMul(col("auc2"), lit(1000000L),
          "q236 auc ppm scale"))
        .withColumn("den", checkedMul(lit(2L) * col("n_pos"), col("n_neg"),
          "q236 auc pair count"))
        .withColumn("auc_ppm", expr("num div den"))
        .select(col("n_pos"), col("n_neg"), col("auc_ppm"),
          expr("2 * auc_ppm - 1000000").as("gini_ppm"))
    },

    "q114_profile" -> { (s, d) =>
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      val aggs = count(lit(1)).as("n_rows") +:
        cols.flatMap(c => Seq(
          count(col(c)).as(s"nn_$c"),
          countDistinct(col(c)).as(s"nd_$c"),
          min(col(c).cast("string")).as(s"mn_$c"),
          max(col(c).cast("string")).as(s"mx_$c")))
      val stackExpr = cols.map(c =>
        s"'$c', nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
      Tables.documents(s, d)
        .agg(aggs.head, aggs.tail: _*)
        .selectExpr("n_rows",
          s"stack(${cols.size}, $stackExpr) AS (column_name, n_notnull, n_distinct, min_s, max_s)")
        .select(col("column_name"), col("n_rows"),
          (col("n_rows") - col("n_notnull")).as("n_nulls"),
          col("n_distinct"), col("min_s"), col("max_s"))
        .orderBy("column_name")
    },

    // PageRank — the iterative-graph class (the web-graph authority
    // signal URL-curation pipelines rank domains with), built scale-
    // correctly: the interaction graph derives from consecutive events
    // within 1000-event buckets (keyed lag window — parallel; bucket-
    // boundary edges forfeited by construction, documented), and each
    // of the two unrolled iterations is one keyed join + one partial-
    // agg'd sum. Per-node inbound sums go through DECIMAL(28,12) so
    // shuffle-merge order can't wiggle the last ulp (the q47/q83 rule);
    // dangling mass is redistributed uniformly, keeping Σr = 1.
    "q115_pagerank" -> { (s, d) =>
      val damp = 0.85
      val w = Window.partitionBy("bucket").orderBy("event_id")
      val edges = graft.Caches.scopedPersist(
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            expr("event_id div 1000").as("bucket"))
          .withColumn("dst", lead(col("user_id"), 1).over(w))
          .filter(col("dst").isNotNull && col("dst") =!= col("user_id"))
          .select(col("user_id").as("src"), col("dst")))
      val nodes = graft.Caches.scopedPersist(
        Tables.events(s, d).select(col("user_id").as("node")).distinct())
      val outDeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val nRow = nodes.agg(count(lit(1)).as("nn"))

      def iterate(ranks: DataFrame): DataFrame = {
        val contrib = edges.join(outDeg, "src")
          .join(ranks, col("src") === col("node"))
          .select(col("dst"),
            (col("r") / col("deg")).cast("decimal(28,12)").as("c"))
          .groupBy("dst").agg(sum(col("c")).cast("double").as("in_sum"))
        // dangling nodes (no out-edges) leak their mass; redistribute it
        // uniformly so the ranks stay a distribution
        val dangling = ranks.join(outDeg, col("node") === col("src"), "left_anti")
          .agg(coalesce(sum(col("r").cast("decimal(28,12)")), lit(0).cast("decimal(28,12)"))
            .cast("double").as("dm"))
        // 0.15 as a LITERAL, not 1.0 − 0.85 computed: DuckDB's decimal
        // literal arithmetic would yield exact 0.15 while double
        // subtraction yields 0.15000000000000002 — both engines parse
        // the same 0.15 literal to the same nearest double instead
        nodes.join(contrib, col("node") === col("dst"), "left")
          .crossJoin(broadcast(nRow)).crossJoin(broadcast(dangling))
          .select(col("node"), col("nn"),
            (lit(0.15) / col("nn")
              + lit(damp) * (coalesce(col("in_sum"), lit(0.0)) + col("dm") / col("nn")))
              .as("r"))
      }

      val r0 = nodes.crossJoin(broadcast(nRow))
        .select(col("node"), (lit(1.0) / col("nn")).as("r"))
      val r2 = iterate(iterate(r0).select("node", "r"))
      r2.select(col("node").as("user_id"), round(col("r"), 8).as("rank"))
        .orderBy("user_id")
    },

    // RETENTION COHORTS — the product-analytics staple: users grouped
    // by the day of their FIRST event (the cohort), then counted as
    // active per (cohort, day-offset) — the retention matrix every
    // growth dashboard draws. Two partial-agg'd passes: first-day per
    // user (min), then distinct actives per (cohort, offset); the
    // cohort table joins back keyed by user. Day arithmetic in epoch
    // days (µs div 86400e6) so both engines bucket identically.
    // TRIANGLE COUNTING (q139) — the graph-clustering staple, over
    // q115's interaction edges made undirected. The naive wedge join
    // explodes on hubs (a degree-D node contributes D² wedges); the
    // production algorithm (Cohen 2009 / Suri & Vassilvitskii "MapReduce
    // triangles") ORIENTS every edge from its (degree, id)-smaller
    // endpoint first, which caps out-degree at O(√m) for any graph, so
    // wedges are generated only at the LOW-degree apex and the total
    // wedge count is bounded by m^(3/2) regardless of skew. Three keyed
    // equi-joins, no node×node anywhere; per-node counts from the three
    // corner projections. The oracle replays the full chain, so the
    // hash match proves the oriented enumeration finds each triangle
    // exactly once.
    "q139_triangle_count" -> { (s, d) =>
      val w = Window.partitionBy("bucket").orderBy("event_id")
      val und = graft.Caches.scopedPersist(
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            expr("event_id div 1000").as("bucket"))
          .withColumn("nbr", lead(col("user_id"), 1).over(w))
          .filter(col("nbr").isNotNull && col("nbr") =!= col("user_id"))
          .select(least(col("user_id"), col("nbr")).as("a"),
            greatest(col("user_id"), col("nbr")).as("b"))
          .distinct())
      val deg = und.select(col("a").as("node"))
        .union(und.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val withDeg = und
        .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      // a < b always, so the (deg, id) tie-break is a plain a→b
      val fwd = col("da") < col("db") || (col("da") === col("db"))
      val oriented = graft.Caches.scopedPersist(withDeg.select(
        when(fwd, col("a")).otherwise(col("b")).as("src"),
        when(fwd, col("b")).otherwise(col("a")).as("dst"),
        when(fwd, col("db")).otherwise(col("da")).as("ddeg")))
      val e1 = oriented.select(col("src"), col("dst").as("v1"), col("ddeg").as("d1"))
      val e2 = oriented.select(col("src"), col("dst").as("v2"), col("ddeg").as("d2"))
      val wedges = e1.join(e2, "src")
        .filter(col("d1") < col("d2") || (col("d1") === col("d2") && col("v1") < col("v2")))
      val closing = oriented.select(col("src").as("v1"), col("dst").as("v2"))
      val tri = wedges.join(closing, Seq("v1", "v2"))
        .select(col("src").as("s"), col("v1"), col("v2"))
      val corners = tri.select(col("s").as("node"))
        .union(tri.select(col("v1").as("node")))
        .union(tri.select(col("v2").as("node")))
        .groupBy("node").agg(count(lit(1)).as("n_triangles"))
      deg.select(col("node")).join(corners, Seq("node"), "left")
        .select(col("node").as("user_id"),
          coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
        .orderBy("user_id")
    },

    // EQUI-DEPTH HISTOGRAM (q142) — the optimizer-statistics / data-
    // profiling operator (what ANALYZE ... FOR COLUMNS materializes):
    // exact quartile boundaries from ONE percentile aggregation,
    // broadcast back onto a map-only bucket assignment, then one
    // partial-agg'd count per bucket — two scans, no global sort, no
    // window. Boundaries round to 6dp on BOTH engines before the
    // comparison: the two engines' interpolation arithmetic can differ
    // in the last ulp exactly when tied values straddle the quantile
    // position, and the round collapses that. Exact percentile →
    // approx_percentile at 100 TB (the q114 trade, same plan shape).
    "q142_equidepth_histogram" -> { (s, d) =>
      val e = Tables.events(s, d).select(col("value"))
      val cuts = e.agg(
        round(expr("percentile(value, 0.25)"), 6).as("q1"),
        round(expr("percentile(value, 0.5)"), 6).as("q2"),
        round(expr("percentile(value, 0.75)"), 6).as("q3"))
      e.crossJoin(broadcast(cuts))
        .select(col("value"),
          (when(col("value") > col("q1"), 1L).otherwise(0L) +
            when(col("value") > col("q2"), 1L).otherwise(0L) +
            when(col("value") > col("q3"), 1L).otherwise(0L)).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min("value").as("lo"), max("value").as("hi"))
        .orderBy("bucket")
    },

    // EVENT-TRANSITION MATRIX (q143) — the first-order Markov model of
    // the event stream (the sequence-mining staple behind next-action
    // prediction and anomalous-flow detection): consecutive events per
    // user pair up through ONE keyed lag window (bounded by per-user
    // event count, the q113 gaps-and-islands scale argument — never a
    // global sort), transition counts partial-aggregate, and each row's
    // probability is ONE IEEE division of two exact BIGINTs (n_ab /
    // n_a·), bit-equal across engines. Output is |types|² rows —
    // driver-sized by construction at any corpus scale.
    "q143_event_transitions" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
      val n = pairs
        .groupBy(col("event_type").as("src_type"), col("next_type").as("dst_type"))
        .agg(count(lit(1)).as("n"))
      val tot = n.groupBy("src_type").agg(sum(col("n")).as("n_src"))
      n.join(tot, "src_type")
        .select(col("src_type"), col("dst_type"), col("n"),
          (col("n").cast("double") / col("n_src").cast("double")).as("p"))
        .orderBy("src_type", "dst_type")
    },

    // STREAMED TRANSITIONS ≡ BATCH TRUTH (q147) — q143's operator run
    // the way a deployment runs it: the log as four deterministic
    // micro-batches through `StreamingTransitions.pairsForBatch`, the
    // cross-batch SEAM pair stitched from one-row-per-user state. The
    // oracle is q143's one-shot text — the hash match proves no pair is
    // lost or duplicated at any batch boundary (the q63/q125 streaming
    // promotion precedent).
    "q147_transitions_replay" -> { (s, d) =>
      graft.streaming.StreamingTransitions.transitionsReplay(s, d, 4)
    },

    // STREAMED FUNNEL ≡ BATCH TRUTH (q179) — q81's three-stage funnel
    // run the way a deployment runs it: the log as five deterministic
    // micro-batches folded through `StreamingFunnel.advance`, stages
    // advancing in dependency order within each batch against the
    // just-updated state, so a funnel completing inside one batch or
    // straddling any boundary lands identically. The oracle is q81's
    // one-shot text — the hash match proves no stage time is lost,
    // duplicated, or re-derived differently at any batch boundary (the
    // q147/q170 streaming promotion precedent).
    "q179_funnel_replay" -> { (s, d) =>
      graft.streaming.StreamingFunnel.funnelReplay(s, d, 5)
    },

    // QUOTA / RATE-LIMIT audit (q152) — the API-gateway batch twin:
    // each user's events past their first 50 are flagged throttled (the
    // per-user quota replay an abuse audit runs over a day's log). One
    // window keyed by the natural partition (user), bounded by per-user
    // event count — never a global sort (the q113 gaps-and-islands
    // scale shape). The fixture generator keeps events-per-user ≈ 67 at
    // EVERY scale factor, so both branches fire at every SF (a
    // time-bucketed window key was rejected: per-user-per-bucket
    // density shrinks with SF and the throttle branch went vacuous at
    // the gate SF).
    "q152_rate_limit" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"))
        .withColumn("k", row_number().over(w).cast("long"))
        .select(col("event_id"), col("user_id"), col("k"),
          when(col("k") > 50L, 1L).otherwise(0L).as("throttled"))
        .orderBy("event_id")
    },

    // COLUMN-ENTROPY PROFILE (q201) — the information-theoretic face of
    // q114's profiling: Shannon entropy per column answers "is this
    // column a key, a category, or a constant?" (feature selection /
    // join-key quality / PII-risk triage read the same number). Work
    // shape: one value-count pass per column over a shared cached
    // projection (value tables are domain-bounded), totals on 1-row
    // broadcasts. Arithmetic discipline (r12, ADVICE r11): surprisal is
    // quantized to INTEGER BITS — floor(log₂(n/nv)) as
    // length(bin(n div nv)) − 1, pure integer arithmetic on both
    // engines (the q42/q127/q146 no-libm rule). The r11 version used
    // ⌊1e6·ln(n/nv)⌋ with libm ln on both engines; ln is not
    // correctly-rounded, and a 1-ulp Java-vs-DuckDB flip exactly at a
    // floor boundary in ANY per-value term (risk grows with user_id's
    // distinct count) would have flipped the exact BIGINT sum — q206
    // recorded precisely such a divergence. Integer bits close that
    // exposure for good; the profiling question ("key, category, or
    // constant?") never needed sub-bit resolution. Per-event entropy
    // reports in milli-bits via one final integer division.
    "q201_entropy_profile" -> { (s, d) =>
      val ev = graft.Caches.scopedPersist(
        Tables.events(s, d).select(col("event_type"),
          col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day")))
      def ent(cname: String): DataFrame = {
        val vc = ev.groupBy(col(cname).as("v")).agg(count(lit(1)).as("nv"))
        val tot = vc.agg(sum(col("nv")).cast("long").as("n"),
          count(lit(1)).cast("long").as("n_distinct"))
        vc.crossJoin(broadcast(tot))
          .select(col("n"), col("n_distinct"),
            (col("nv") *
              (length(bin(expr("n div nv"))) - 1).cast("long")).as("term"))
          .groupBy("n", "n_distinct")
          .agg(sum(col("term")).cast("long").as("tsum"))
          .select(lit(cname).as("col_name"), col("n_distinct"),
            expr("(1000 * tsum) div n").as("entropy_mbits"))
      }
      ent("event_type").unionByName(ent("user_id")).unionByName(ent("day"))
        .orderBy("col_name")
    },

    // RFM SEGMENTATION (q199) — the marketing-warehouse classic:
    // score every customer on Recency (days since last order, against
    // the corpus max-date anchor — a 1-row broadcast, the q181 rule),
    // Frequency (order count), and Monetary (lifetime spend in exact
    // cents), cut each into quintiles, and report the segment grid.
    // Scale shape: ONE partial-agg'd pass builds the per-customer
    // table; the quintile cuts come from ONE exact-percentile agg
    // broadcast back (map-side assignment — no global ntile sort; the
    // q127 exact→approx-percentile trade at 100 TB); the final report
    // is ≤ 125 cells. Interpolated percentile cuts are bit-equal
    // doubles across engines (the q176 precedent); everything else is
    // integer/exact arithmetic.
    "q199_rfm_segments" -> { (s, d) =>
      val o = Tables.orders(s, d)
        .select(col("o_custkey").as("ck"),
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      val anchor = o.agg(max(col("day")).as("anchor_day"))
      val rfm = graft.Caches.scopedPersist(
        o.groupBy("ck")
          .agg(max(col("day")).as("last_day"), count(lit(1)).as("f"),
            sum(col("cents")).cast("long").as("m_cents"))
          .crossJoin(broadcast(anchor))
          .select(col("ck"), (col("anchor_day") - col("last_day")).as("r_days"),
            col("f"), col("m_cents")))
      val cuts = rfm.agg(
        expr("percentile(r_days, array(0.2D, 0.4D, 0.6D, 0.8D))").as("rc"),
        expr("percentile(f, array(0.2D, 0.4D, 0.6D, 0.8D))").as("fc"),
        expr("percentile(m_cents, array(0.2D, 0.4D, 0.6D, 0.8D))").as("mc"))
      def quint(x: String, c: String) = expr(
        s"""CAST(1 + (CASE WHEN $x > element_at($c, 1) THEN 1 ELSE 0 END)
           |       + (CASE WHEN $x > element_at($c, 2) THEN 1 ELSE 0 END)
           |       + (CASE WHEN $x > element_at($c, 3) THEN 1 ELSE 0 END)
           |       + (CASE WHEN $x > element_at($c, 4) THEN 1 ELSE 0 END) AS BIGINT)""".stripMargin)
      rfm.crossJoin(broadcast(cuts))
        .select(quint("r_days", "rc").as("r_q"), quint("f", "fc").as("f_q"),
          quint("m_cents", "mc").as("m_q"), col("f"), col("m_cents"))
        .groupBy("r_q", "f_q", "m_q")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("f")).cast("long").as("sum_orders"),
          sum(col("m_cents")).cast("long").as("sum_m_cents"))
        .orderBy("r_q", "f_q", "m_q")
    },

    // STREAMED RATE LIMIT ≡ BATCH TRUTH (q196) — q152's quota run the
    // way a gateway runs it: through Spark 4's arbitrary-state API
    // (`transformWithState` + a typed ValueState per user on the
    // RocksDB store — the first oracle-gated face of the new processor
    // model; see `streaming/RateLimitStream`). The oracle is q152's
    // one-shot text — the hash match proves the per-user counter
    // survives the engine's state round-trip with no count lost,
    // duplicated, or re-ordered (the q147/q179 promotion precedent).
    "q196_rate_limit_stream" -> { (s, d) =>
      graft.streaming.RateLimitStream.streamed(s, d)
    },

    // KAPPA BACKFILL ≡ FULL BATCH (q207) — the batch→stream handoff
    // every kappa deployment crosses, promoted into the oracle gate
    // (VERDICT r11 item 4; see `streaming/KappaBackfill.kappaReplay`
    // for the full seam argument): history-at-the-median-cut aggregated
    // as a batch, handed to `mapGroupsWithState` as `initialState`, the
    // tail replayed as two real micro-batches. The oracle is ONE
    // full-history aggregate — the cut never appears in its text,
    // because an invisible seam is the operator's entire contract.
    "q207_kappa_replay" -> { (s, d) =>
      graft.streaming.KappaBackfill.kappaReplay(s, d)
    },

    // MAPSTATE PROFILE ≡ BATCH CROSS-TAB (q212) — the third face of
    // Spark 4's arbitrary-state API under oracle: q196 pins ValueState,
    // q205 pins event-time timers, q212 pins the MAP-typed slot (see
    // `streaming/MapStateProfile` for why a real profile store wants a
    // map slot, not a ValueState[Map]). Two real micro-batches fold
    // each user's event_type→count map through the RocksDB store; the
    // oracle is the one-shot (user, type) cross-tab — an entry lost,
    // duplicated, or mis-keyed across the batch boundary reds the row.
    "q212_mapstate_profile" -> { (s, d) =>
      graft.streaming.MapStateProfile.profileReplay(s, d)
    },

    // LISTSTATE RECENT-ITEMS ≡ BATCH TRUTH (q213) — the LAST state
    // primitive of Spark 4's arbitrary-state API under oracle
    // (ValueState q196, timers q205, MapState q212): a per-user
    // last-3-items ring in a LIST-typed slot — the feature-store
    // "recent items" every recommender reads — folded across two real
    // micro-batches staged as event_id-RANGE chunks (order-dependent
    // state needs the ordered-log arrival; see
    // `streaming/ListStateRecent`). Oracle = the one-shot last-3 path
    // by event_id: an item dropped from the ring, re-ordered at the
    // batch boundary, or a tail re-read wrong from RocksDB reds the row.
    "q213_liststate_recent" -> { (s, d) =>
      graft.streaming.ListStateRecent.recentReplay(s, d)
    },

    // STATE TTL ≡ BATCH CROSS-TAB (q228, r14) — the arbitrary-state
    // API's TTL feature under oracle: q212's MapState profile with a
    // per-entry TTLConfig and a forced inter-batch gap longer than the
    // TTL, so every batch-1 entry is PROVABLY expired by batch 2 and
    // each batch emits its own cross-tab. The sum over batches equals
    // the one-shot truth iff expiry actually happened across the
    // RocksDB round-trip — surviving state would double-count batch 1
    // and red the row (see streaming/TtlStateExpiry for the
    // determinism argument on a processing-time clock).
    "q228_state_ttl" -> { (s, d) =>
      graft.streaming.TtlStateExpiry.ttlReplay(s, d)
    },

    // USER-GROWTH CURVE (q157) — cumulative distinct users by day, the
    // companion to q122's retention matrix. The naive form (a running
    // COUNT(DISTINCT) window) holds unbounded state; the scale-correct
    // form maps each user to their FIRST day (one partial-agg'd min),
    // counts new users per day, and runs the cumulative sum over the
    // DAY table — a relation bounded by calendar length, not corpus
    // size, so the only ordered window is driver-sized by construction.
    // Day bucketing in epoch days (the q122 rule).
    "q157_user_growth" -> { (s, d) =>
      val firstDay = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
        .groupBy("user_id").agg(min(col("day")).as("first_day"))
      val perDay = firstDay.groupBy(col("first_day").as("day"))
        .agg(count(lit(1)).as("new_users"))
      perDay
        .withColumn("cum_users",
          sum(col("new_users")).over(Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("day")
    },

    "q122_retention_cohorts" -> { (s, d) =>
      val day = expr("unix_micros(ts) div 86400000000")
      val ev = Tables.events(s, d).select(col("user_id"), day.as("day"))
      val cohort = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
      ev.join(cohort, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy("cohort_day", "day_offset")
    },

    // Exact interpolated quantiles (quantile_cont semantics in both
    // engines — deterministic, unlike t-digest/GK sketches).
    "q46_quantiles" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.9)").as("p90"))
        .orderBy("event_type")
    },

    // Pearson correlation assembled from DECIMAL-exact sums: built-in
    // corr() accumulates co-moments in shuffle order (non-deterministic
    // last-ulp); exact integer/decimal sums then one closed-form double
    // expression are bit-stable on both engines.
    "q47_corr_exact" -> { (s, d) =>
      val x = col("event_id").cast("decimal(28,0)")
      val y = col("value").cast("decimal(18,2)")
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(x).cast("double").as("sx"),
          sum(y).cast("double").as("sy"),
          sum((x * y).cast("decimal(38,2)")).cast("double").as("sxy"),
          sum((x * x).cast("decimal(38,0)")).cast("double").as("sxx"),
          sum((y * y).cast("decimal(38,4)")).cast("double").as("syy"))
        .withColumn("corr_xy",
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
        .select("event_type", "n", "corr_xy")
        .orderBy("event_type")
    },

    // Set operations (a relational class the reference never exercises):
    // purchasers vs error-reporters, INTERSECT and EXCEPT, tagged.
    "q49_set_ops" -> { (s, d) =>
      def usersOf(t: String) = Tables.events(s, d)
        .filter(col("event_type") === t).select("user_id").distinct()
      val both = usersOf("purchase").intersect(usersOf("error"))
        .withColumn("segment", lit("both"))
      val onlyPurchase = usersOf("purchase").except(usersOf("error"))
        .withColumn("segment", lit("purchase_only"))
      both.unionAll(onlyPurchase).orderBy("segment", "user_id")
    },

    // Ordered running aggregate per key. The sum goes through DECIMAL:
    // engines disagree on double summation ORDER inside window frames
    // (DuckDB evaluates frames with a segment tree = pairwise adds),
    // so only an exact accumulator is hash-stable.
    "q48_running_sum" -> { (s, d) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          sum(col("value").cast("decimal(18,2)")).over(w)
            .cast("double").as("running_value"),
          count(lit(1)).over(w).as("running_n"))
        .orderBy("event_id")
    },

    // Change-log compaction (the CDC/upsert "latest row per key" pass a
    // lakehouse runs on every merge): one hash aggregate with max_by
    // keyed on the (ts, event_id) struct — partial-aggregated map-side,
    // so a key's candidates collapse to ONE row per input partition
    // before the shuffle. The window-sort formulation (row_number = 1,
    // what the oracle runs) would range-shuffle and fully sort every
    // partition; at 100 TB the agg form moves one row per (key,
    // partition) instead. The ordering struct is unique per key (event_id
    // breaks ts ties), so the surviving row is deterministic.
    "q80_latest_compaction" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          max_by(struct(col("event_id"), col("event_type"), col("value")),
            struct(col("ts"), col("event_id"))).as("last"),
          max(col("ts")).as("last_ts"),
          count(lit(1)).as("n_versions"))
        .select(col("user_id"), col("last.event_id").as("last_event_id"),
          col("last.event_type").as("last_type"),
          col("last.value").as("last_value"),
          col("last_ts"), col("n_versions"))
        .orderBy("user_id")
    },

    // Ordered-funnel analysis: per user, the earliest view, the earliest
    // click within 12 h AFTER that view, the earliest purchase within
    // 12 h AFTER that click — the stage reached is the sequence-pattern
    // analytics class (the reference's detection cascade is the same
    // shape over frames). The conversion window is load-bearing twice:
    // semantically (an unbounded funnel saturates — on this fixture every
    // user eventually converts) and at scale (it is what lets the
    // streaming analog bound state). Each stage is a filtered partial-agg
    // min plus ONE keyed equi-join on user_id — never a per-user
    // collect_list or ordered window, so the plan is all hash aggregates
    // + hash joins and survives any user cardinality. Strict '>'
    // throughout: a same-instant event does not advance the funnel
    // (matches the oracle exactly).
    "q81_funnel_stages" -> { (s, d) =>
      val e = Tables.events(s, d)
      val users = e.select("user_id").distinct()
      val win = expr("interval 12 hours")
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t_view"))
      val c = e.filter(col("event_type") === "click").select("user_id", "ts")
        .join(v, Seq("user_id"))
        .filter(col("ts") > col("t_view") && col("ts") <= col("t_view") + win)
        .groupBy("user_id").agg(min(col("ts")).as("t_click"))
      val p = e.filter(col("event_type") === "purchase").select("user_id", "ts")
        .join(c, Seq("user_id"))
        .filter(col("ts") > col("t_click") && col("ts") <= col("t_click") + win)
        .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
      // stage timestamps go out as nullable epoch-µs BIGINTs: a NULL
      // TIMESTAMP column round-trips as NaT in the driver's pandas
      // compare, which equates neither with None nor NaN — nullable
      // integers are the proven-safe null carrier (q44).
      users.join(v, Seq("user_id"), "left")
        .join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"),
          when(col("t_purchase").isNotNull, lit(3L))
            .when(col("t_click").isNotNull, lit(2L))
            .when(col("t_view").isNotNull, lit(1L))
            .otherwise(lit(0L)).as("stage"),
          unix_micros(col("t_view")).as("t_view_us"),
          unix_micros(col("t_click")).as("t_click_us"),
          unix_micros(col("t_purchase")).as("t_purchase_us"))
        .orderBy("user_id")
    },

    // SNAPSHOT RECONCILIATION DIFF (q194) — the replica-audit face
    // beside q159's referential integrity: given two snapshots of the
    // same table (a migration cutover, a cross-region replica, a
    // vendor re-delivery), classify every key as added / removed /
    // changed / unchanged and report per-class counts with a key
    // checksum that pins MEMBERSHIP, not just cardinality. The two
    // snapshots are derived deterministically from orders (base drops
    // keys ≡0 mod 83 — "late-arriving"; the replica drops ≡0 mod 97
    // and bumps o_totalprice on ≡0 mod 89), so all four classes fire
    // at every SF. Work shape: ONE keyed full-outer join plus a
    // null-safe column-by-column compare (<=> — no row-hash string
    // render to drift across engines) and a grammar-sized final agg.
    // At 100 TB both snapshots bucket by pk, making the join
    // shuffle-free; nothing else touches the fact width. Keys are
    // non-negative, so Spark % ≡ DuckDB % (the q105 sign rule).
    "q194_snapshot_diff" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val price = col("o_totalprice").cast("decimal(18,2)")
      val base = o.filter(expr("o_orderkey % 83 <> 0"))
        .select(col("o_orderkey").as("k"), lit(true).as("b_in"),
          col("o_custkey").as("b_ck"), col("o_orderstatus").as("b_st"),
          price.as("b_tp"), col("o_orderdate").as("b_od"),
          col("o_orderpriority").as("b_pr"))
      val repl = o.filter(expr("o_orderkey % 97 <> 0"))
        .select(col("o_orderkey").as("k"), lit(true).as("r_in"),
          col("o_custkey").as("r_ck"), col("o_orderstatus").as("r_st"),
          when(expr("o_orderkey % 89 = 0"),
            (price + lit(1).cast("decimal(18,2)")).cast("decimal(18,2)"))
            .otherwise(price).as("r_tp"),
          col("o_orderdate").as("r_od"), col("o_orderpriority").as("r_pr"))
      base.join(repl, Seq("k"), "full_outer")
        .select(col("k"),
          when(col("b_in").isNull, "added")
            .when(col("r_in").isNull, "removed")
            .when(!(col("b_ck") <=> col("r_ck")) ||
              !(col("b_st") <=> col("r_st")) ||
              !(col("b_tp") <=> col("r_tp")) ||
              !(col("b_od") <=> col("r_od")) ||
              !(col("b_pr") <=> col("r_pr")), "changed")
            .otherwise("unchanged").as("diff_class"))
        .groupBy("diff_class")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("k")).cast("long").as("key_checksum"))
        .orderBy("diff_class")
    },

    // MARKOV NEXT-EVENT EVAL (q223, r13) — the OFFLINE EVAL face of
    // q143's transition matrix (q143 trains the model; nothing before
    // this measured whether it predicts): users split by parity (the
    // q146/q167 held-out rule — never random), the train half's argmax
    // next-event per source type (tie-break n DESC, dst ASC — the q164
    // rule) scored against the test half's actual transitions, beside
    // the GLOBAL-majority baseline every sequence-model eval must
    // report (a model that can't beat "always predict the most common
    // event" has learned nothing). Shapes: transitions via the q143
    // keyed lag window per half; both models are |types|-row argmaxes
    // broadcast onto the test pairs; accuracies in exact ppm. At
    // 100 TB: two windowed passes + two tiny broadcasts — the eval
    // costs what q143 costs.
    "q223_markov_eval" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
      def pairs(train: Boolean) = Tables.events(s, d)
        .filter(if (train) col("user_id") % 2 === 0 else col("user_id") % 2 =!= 0)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .select(col("event_type").as("src_type"), col("next_type"))
      val counts = pairs(train = true)
        .groupBy("src_type", "next_type").agg(count(lit(1)).as("n"))
      val rankW = Window.partitionBy("src_type")
        .orderBy(col("n").desc, col("next_type").asc)
      val model = counts.withColumn("r", row_number().over(rankW))
        .filter(col("r") === 1)
        .select(col("src_type"), col("next_type").as("predicted"))
      val baseline = counts.groupBy("next_type")
        .agg(sum(col("n")).as("n"))
        .orderBy(col("n").desc, col("next_type").asc).limit(1)
        .select(col("next_type").as("baseline_predicted"))
      pairs(train = false)
        .join(broadcast(model), "src_type")
        .crossJoin(broadcast(baseline))
        .groupBy("src_type", "predicted", "baseline_predicted")
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("next_type") === col("predicted"), 1L).otherwise(0L))
            .as("n_correct"),
          sum(when(col("next_type") === col("baseline_predicted"), 1L)
            .otherwise(0L)).as("n_baseline"))
        .select(col("src_type"), col("predicted"), col("n_test"),
          col("n_correct"), expr("n_correct * 1000000 div n_test").as("acc_ppm"),
          col("baseline_predicted"), col("n_baseline"),
          expr("n_baseline * 1000000 div n_test").as("baseline_acc_ppm"))
        .orderBy("src_type")
    }
  )

  val oracles: Map[String, String] = Map(
    "q53_above_type_avg" -> AboveTypeAvgSql,
    "q131_grouping_sets" -> GroupingSetsSql,
    // q223: the identical split, lag pairs, argmax tie-breaks, and ppm
    "q223_markov_eval" ->
      """WITH tr AS (SELECT event_type AS src_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
        |      AS next_type
        |  FROM events WHERE user_id % 2 = 0),
        |trp AS (SELECT * FROM tr WHERE next_type IS NOT NULL),
        |cnt AS (SELECT src_type, next_type, CAST(count(*) AS BIGINT) AS n
        |  FROM trp GROUP BY src_type, next_type),
        |model AS (SELECT src_type, next_type AS predicted FROM (
        |    SELECT src_type, next_type,
        |      row_number() OVER (PARTITION BY src_type
        |        ORDER BY n DESC, next_type ASC) AS r
        |    FROM cnt) WHERE r = 1),
        |base AS (SELECT next_type AS baseline_predicted FROM (
        |    SELECT next_type, sum(n) AS n FROM cnt GROUP BY next_type
        |    ORDER BY n DESC, next_type ASC LIMIT 1)),
        |te AS (SELECT event_type AS src_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
        |      AS next_type
        |  FROM events WHERE user_id % 2 <> 0),
        |tep AS (SELECT * FROM te WHERE next_type IS NOT NULL)
        |SELECT t.src_type, m.predicted, CAST(count(*) AS BIGINT) AS n_test,
        |  CAST(count(*) FILTER (t.next_type = m.predicted) AS BIGINT)
        |    AS n_correct,
        |  CAST(CAST(count(*) FILTER (t.next_type = m.predicted) AS BIGINT)
        |    * 1000000 // count(*) AS BIGINT) AS acc_ppm,
        |  b.baseline_predicted,
        |  CAST(count(*) FILTER (t.next_type = b.baseline_predicted) AS BIGINT)
        |    AS n_baseline,
        |  CAST(CAST(count(*) FILTER (t.next_type = b.baseline_predicted)
        |    AS BIGINT) * 1000000 // count(*) AS BIGINT) AS baseline_acc_ppm
        |FROM tep t JOIN model m USING (src_type), base b
        |GROUP BY t.src_type, m.predicted, b.baseline_predicted
        |ORDER BY t.src_type""".stripMargin,
    // q130: the FULL-log replay — the merge of snapshot+delta must
    // equal it (max_by deterministic: event_id is unique)
    "q130_cdc_merge" ->
      """WITH last AS (SELECT user_id,
        |    max_by(event_type, event_id) AS t,
        |    max_by(value, event_id) AS v,
        |    max(event_id) AS id
        |  FROM events GROUP BY user_id)
        |SELECT user_id, id AS last_event_id, v AS value
        |FROM last WHERE t <> 'error' ORDER BY user_id""".stripMargin,
    // DuckDB's GROUPING returns per-column bits; composing them as
    // 2*g(type)+g(hour) reproduces Spark's grouping_id bit layout
    "q112_rollup" ->
      """SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  CAST(2 * GROUPING(event_type) + GROUPING(epoch_us(ts) // 3600000000) AS BIGINT) AS gid
        |FROM events
        |GROUP BY ROLLUP (event_type, epoch_us(ts) // 3600000000)
        |ORDER BY gid ASC, event_type ASC NULLS FIRST, hour ASC NULLS FIRST""".stripMargin,
    "q122_retention_cohorts" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id)
        |SELECT c.cohort_day, ev.day - c.cohort_day AS day_offset,
        |  CAST(count(DISTINCT ev.user_id) AS BIGINT) AS n_active
        |FROM ev JOIN c ON ev.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
    // q149: identical per-fold moments, identical exact complements
    // (total − fold), then the SAME Cramer text on the 5-row frame and
    // the SAME residual/rmse texts — every double bit-equal
    "q149_crossval_regression" ->
      s"""WITH f AS (SELECT event_id % 5 AS fold,
         |    (epoch_us(ts) // 3600000000) % 24 AS x1, user_id % 10 AS x2,
         |    CAST(round(value, 6) AS DECIMAL(18,6)) AS y FROM events),
         |fm AS (SELECT fold, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x1) AS BIGINT) AS rs1, CAST(sum(x2) AS BIGINT) AS rs2,
         |    CAST(sum(x1*x1) AS BIGINT) AS rs11, CAST(sum(x1*x2) AS BIGINT) AS rs12,
         |    CAST(sum(x2*x2) AS BIGINT) AS rs22,
         |    sum(y) AS rsy, sum(x1*y) AS rs1y, sum(x2*y) AS rs2y
         |  FROM f GROUP BY fold),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
         |    CAST(sum(rs1) AS BIGINT) AS ts1, CAST(sum(rs2) AS BIGINT) AS ts2,
         |    CAST(sum(rs11) AS BIGINT) AS ts11, CAST(sum(rs12) AS BIGINT) AS ts12,
         |    CAST(sum(rs22) AS BIGINT) AS ts22,
         |    sum(rsy) AS tsy, sum(rs1y) AS ts1y, sum(rs2y) AS ts2y FROM fm),
         |tr AS (SELECT fold,
         |    CAST(tn - n AS DOUBLE) AS nn,
         |    CAST(ts1 - rs1 AS DOUBLE) AS s1, CAST(ts2 - rs2 AS DOUBLE) AS s2,
         |    CAST(ts11 - rs11 AS DOUBLE) AS s11, CAST(ts12 - rs12 AS DOUBLE) AS s12,
         |    CAST(ts22 - rs22 AS DOUBLE) AS s22, CAST(tsy - rsy AS DOUBLE) AS sy,
         |    CAST(ts1y - rs1y AS DOUBLE) AS s1y, CAST(ts2y - rs2y AS DOUBLE) AS s2y
         |  FROM fm, tot),
         |b AS (SELECT fold, ${LinRegBetaExprs.mkString(",\n  ")} FROM tr),
         |sc AS (SELECT f.fold, $CvResidual2Expr FROM f JOIN b USING (fold)),
         |g AS (SELECT fold, CAST(count(*) AS BIGINT) AS n_test,
         |    CAST(sum(r2) AS BIGINT) AS sse0
         |  FROM sc GROUP BY fold),
         |o AS (SELECT g.fold, n_test, beta0, beta1, beta2, $CvSseExpr
         |  FROM g JOIN b ON g.fold = b.fold)
         |SELECT fold, n_test, beta0, beta1, beta2, sse, $CvRmseExpr
         |FROM o ORDER BY fold""".stripMargin,
    // q138: identical exact moments (// vs div, epoch_us vs
    // unix_micros), then the SAME Cramer formula text
    "q138_linreg_normal" ->
      s"""WITH f AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS x1,
         |    user_id % 10 AS x2,
         |    CAST(round(value, 6) AS DECIMAL(18,6)) AS y FROM events),
         |m AS (SELECT CAST(count(*) AS DOUBLE) AS nn,
         |    CAST(sum(x1) AS DOUBLE) AS s1, CAST(sum(x2) AS DOUBLE) AS s2,
         |    CAST(sum(x1*x1) AS DOUBLE) AS s11, CAST(sum(x1*x2) AS DOUBLE) AS s12,
         |    CAST(sum(x2*x2) AS DOUBLE) AS s22, CAST(sum(y) AS DOUBLE) AS sy,
         |    CAST(sum(x1*y) AS DOUBLE) AS s1y, CAST(sum(x2*y) AS DOUBLE) AS s2y
         |  FROM f)
         |SELECT CAST(nn AS BIGINT) AS n_rows,
         |  ${LinRegBetaExprs.mkString(",\n  ")}
         |FROM m""".stripMargin,

    "q114_profile" -> {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      cols.sorted.map { c =>
        s"""SELECT '$c' AS column_name,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  min(CAST($c AS VARCHAR)) AS min_s, max(CAST($c AS VARCHAR)) AS max_s
           |FROM documents""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },
    // q115: the same derived edge list, then TWO unrolled iterations with
    // the identical decimal-exact inbound sums, dangling-mass terms, and
    // double literals (0.15/0.85 parsed, never computed)
    // every CTE AS MATERIALIZED (r13, the q133 rule): DuckDB inlines
    // CTEs, and each r$i is referenced by c/d/r of the next iteration,
    // so the un-hinted chain re-evaluated the edge build per reference;
    // exact DECIMAL sums, so materializing cannot move a bit
    "q115_pagerank" -> {
      def iter(i: Int, o: Int): String =
        s"""c$o AS MATERIALIZED (SELECT e.dst, CAST(sum(CAST(r$i.r / deg.deg AS DECIMAL(28,12))) AS DOUBLE) AS in_sum
           |  FROM edges e JOIN deg ON e.src = deg.src JOIN r$i ON e.src = r$i.node
           |  GROUP BY e.dst),
           |d$o AS MATERIALIZED (SELECT CAST(coalesce(sum(CAST(r AS DECIMAL(28,12))), 0) AS DOUBLE) AS dm
           |  FROM r$i WHERE node NOT IN (SELECT src FROM deg)),
           |r$o AS MATERIALIZED (SELECT n.node,
           |    CAST(0.15 AS DOUBLE) / nn.nn
           |      + CAST(0.85 AS DOUBLE) * (coalesce(c$o.in_sum, CAST(0 AS DOUBLE)) + d$o.dm / nn.nn) AS r
           |  FROM nodes n LEFT JOIN c$o ON n.node = c$o.dst, nn, d$o)""".stripMargin
      s"""WITH ev AS MATERIALIZED (SELECT event_id, user_id, event_id // 1000 AS bucket FROM events),
         |ed AS MATERIALIZED (SELECT user_id AS src,
         |         lead(user_id) OVER (PARTITION BY bucket ORDER BY event_id) AS dst
         |       FROM ev),
         |edges AS MATERIALIZED (SELECT src, dst FROM ed WHERE dst IS NOT NULL AND dst <> src),
         |nodes AS MATERIALIZED (SELECT DISTINCT user_id AS node FROM events),
         |deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |nn AS MATERIALIZED (SELECT count(*) AS nn FROM nodes),
         |r0 AS MATERIALIZED (SELECT node, CAST(1 AS DOUBLE) / nn.nn AS r FROM nodes, nn),
         |${iter(0, 1)},
         |${iter(1, 2)}
         |SELECT node AS user_id, round(r, 8) AS rank FROM r2 ORDER BY user_id""".stripMargin
    },
    // q142: quantile_cont ≡ percentile (the q127 precedent), the same
    // 6dp boundary round, the same strict-> bucket assignment
    "q142_equidepth_histogram" ->
      """WITH c AS (SELECT round(quantile_cont(value, 0.25), 6) AS q1,
        |    round(quantile_cont(value, 0.5), 6) AS q2,
        |    round(quantile_cont(value, 0.75), 6) AS q3 FROM events)
        |SELECT CAST(CASE WHEN value > q1 THEN 1 ELSE 0 END +
        |       CASE WHEN value > q2 THEN 1 ELSE 0 END +
        |       CASE WHEN value > q3 THEN 1 ELSE 0 END AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n, min(value) AS lo, max(value) AS hi
        |FROM events, c GROUP BY 1 ORDER BY bucket""".stripMargin,
    // q143: the same keyed lead window and exact-count division; q147
    // shares the TEXT — the 4-micro-batch replay must equal the
    // one-shot truth
    "q143_event_transitions" -> TransitionsSql,
    "q147_transitions_replay" -> TransitionsSql,
    // q159: the same four anti-join counts, long-form
    "q159_referential_integrity" ->
      """WITH c1 AS (SELECT 'lineitem_has_order' AS check_name,
        |    CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_left,
        |    CAST((SELECT count(*) FROM lineitem
        |          WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT) AS n_orphans,
        |    CAST(0 AS BIGINT) AS informational),
        |c2 AS (SELECT 'order_has_lineitem',
        |    CAST((SELECT count(*) FROM orders) AS BIGINT),
        |    CAST((SELECT count(*) FROM orders
        |          WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)) AS BIGINT),
        |    CAST(1 AS BIGINT)),
        |c3 AS (SELECT 'order_has_customer',
        |    CAST((SELECT count(*) FROM orders) AS BIGINT),
        |    CAST((SELECT count(*) FROM orders
        |          WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT),
        |    CAST(0 AS BIGINT)),
        |c4 AS (SELECT 'customer_has_order',
        |    CAST((SELECT count(*) FROM customer) AS BIGINT),
        |    CAST((SELECT count(*) FROM customer
        |          WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) AS BIGINT),
        |    CAST(1 AS BIGINT)),
        |u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2
        |      UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4)
        |SELECT check_name, n_left, n_orphans,
        |  CAST(CASE WHEN informational = 1 OR n_orphans = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass
        |FROM u ORDER BY check_name""".stripMargin,
    // q161: the same per-key counts, driver-sized stats, and the
    // cross-multiplied hot rule, replayed per relation
    "q161_skew_report" -> {
      def one(table: String, key: String): String =
        s"""(WITH c AS (SELECT $key AS k, CAST(count(*) AS BIGINT) AS c
           |           FROM $table GROUP BY 1),
           |s AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
           |        CAST(sum(c) AS BIGINT) AS n_rows,
           |        CAST(max(c) AS BIGINT) AS max_cnt,
           |        quantile_cont(c, 0.5) AS p50_cnt,
           |        quantile_cont(c, 0.99) AS p99_cnt FROM c),
           |h AS (SELECT CAST(count(*) FILTER (WHERE
           |        c * (SELECT n_keys FROM s) > (SELECT n_rows FROM s) * 2)
           |        AS BIGINT) AS n_hot FROM c)
           |SELECT '$table.$key' AS relation, n_rows, n_keys, max_cnt,
           |  max_cnt * 1000000 // n_rows AS top_share_ppm,
           |  p50_cnt, p99_cnt, n_hot FROM s, h)""".stripMargin
      s"""SELECT * FROM (
         |${one("lineitem", "l_orderkey")}
         |UNION ALL
         |${one("orders", "o_custkey")}
         |UNION ALL
         |${one("events", "user_id")}
         |) ORDER BY relation""".stripMargin
    },
    // q174: the same value-table window, closed-form tie-block rank
    // sum, and exact-ppm Gini, replayed per relation. DuckDB sums of
    // BIGINT widen to HUGEINT, so every derived column is cast back.
    "q174_gini_concentration" -> {
      def one(table: String, key: String): String =
        s"""(WITH c AS (SELECT $key AS k, CAST(count(*) AS BIGINT) AS c
           |            FROM $table GROUP BY 1),
           |v AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM c GROUP BY 1),
           |b AS (SELECT c, m, CAST(COALESCE(sum(m) OVER (ORDER BY c
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |        AS BIGINT) AS k_before FROM v),
           |t AS (SELECT CAST(sum(c * (m * k_before + (m * (m + 1)) // 2))
           |        AS BIGINT) AS sic,
           |        CAST(sum(m) AS BIGINT) AS n_keys,
           |        CAST(sum(c * m) AS BIGINT) AS n_rows FROM b)
           |SELECT '$table.$key' AS relation, n_keys, n_rows,
           |  CAST((2 * sic - (n_keys + 1) * n_rows) * 1000000
           |    // (n_keys * n_rows) AS BIGINT) AS gini_ppm FROM t)""".stripMargin
      s"""SELECT * FROM (
         |${one("lineitem", "l_orderkey")}
         |UNION ALL
         |${one("orders", "o_custkey")}
         |UNION ALL
         |${one("events", "user_id")}
         |) ORDER BY relation""".stripMargin
    },
    // q175: the same daily series, integer-scaled CUSUM, and per-type
    // argmax flag
    "q175_cusum_changepoint" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |        CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |        CAST(sum(c) AS BIGINT) AS s_total FROM daily GROUP BY 1),
        |w AS (SELECT event_type, day, c,
        |        CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
        |          AS BIGINT) AS i,
        |        CAST(sum(c) OVER (PARTITION BY event_type ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS cum
        |      FROM daily),
        |d2 AS (SELECT w.event_type, day, c,
        |         n_days * cum - i * s_total AS d_scaled
        |       FROM w JOIN t ON w.event_type = t.event_type),
        |p AS (SELECT event_type, max(abs(d_scaled)) AS mad
        |      FROM d2 GROUP BY 1)
        |SELECT d2.event_type, day, c, CAST(d_scaled AS BIGINT) AS d_scaled,
        |  CAST(CASE WHEN abs(d_scaled) = mad THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_changepoint
        |FROM d2 JOIN p ON d2.event_type = p.event_type
        |ORDER BY 1, 2""".stripMargin,
    // q176: the same exact percentile bounds, identical-double filter,
    // and decimal-sum/closed-form means
    "q176_trimmed_mean" ->
      """WITH s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_total,
        |        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |        quantile_cont(value, 0.01) AS p01,
        |        quantile_cont(value, 0.99) AS p99
        |      FROM events GROUP BY 1)
        |SELECT e.event_type, n_total, CAST(count(*) AS BIGINT) AS n_kept,
        |  sy / n_total AS mean_all,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |    AS mean_trimmed
        |FROM events e JOIN s ON e.event_type = s.event_type
        |WHERE value >= p01 AND value <= p99
        |GROUP BY e.event_type, n_total, sy
        |ORDER BY e.event_type""".stripMargin,
    // q177: the same conditional-aggregation moments and the shared
    // closed-form texts verbatim
    "q177_ab_welch" ->
      s"""WITH m AS (SELECT event_type,
         |  CAST(count(CASE WHEN user_id % 2 = 0 THEN 1 END) AS BIGINT) AS n0,
         |  CAST(count(CASE WHEN user_id % 2 = 1 THEN 1 END) AS BIGINT) AS n1,
         |  CAST(sum(CASE WHEN user_id % 2 = 0
         |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS sy0,
         |  CAST(sum(CASE WHEN user_id % 2 = 1
         |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS sy1,
         |  CAST(sum(CASE WHEN user_id % 2 = 0
         |    THEN CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))
         |      AS DECIMAL(38,4)) END) AS DOUBLE) AS syy0,
         |  CAST(sum(CASE WHEN user_id % 2 = 1
         |    THEN CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))
         |      AS DECIMAL(38,4)) END) AS DOUBLE) AS syy1
         |FROM events GROUP BY event_type)
         |SELECT event_type, n0, n1, $AbMean0Expr, $AbMean1Expr,
         |  $AbDiffExpr, $AbWelchTExpr
         |FROM m ORDER BY event_type""".stripMargin,
    // q178: the same three passes — median, MAD over the derived
    // column, and the shared outlier cut verbatim
    "q178_mad_outliers" ->
      s"""WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
         |           FROM events GROUP BY 1),
         |a AS (SELECT e.event_type, med, CAST(count(*) AS BIGINT) AS n,
         |        quantile_cont(abs(value - med), 0.5) AS mad
         |      FROM events e JOIN m ON e.event_type = m.event_type
         |      GROUP BY 1, 2),
         |f AS (SELECT e.event_type, n, med, mad,
         |        CAST(sum(CASE WHEN $MadOutlierPred THEN 1 ELSE 0 END)
         |          AS BIGINT) AS n_outliers
         |      FROM events e JOIN a ON e.event_type = a.event_type
         |      GROUP BY 1, 2, 3, 4)
         |SELECT event_type, n, med, mad, n_outliers,
         |  n_outliers * 1000000 // n AS outlier_ppm
         |FROM f ORDER BY event_type""".stripMargin,
    // q180: the same unit-width buckets, covering-bucket interpolation,
    // and exact truth side by side
    "q180_histogram_quantile" ->
      """WITH b AS (SELECT event_type, CAST(floor(value) AS BIGINT) AS bucket,
        |        CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, bucket, c,
        |        CAST(sum(c) OVER (PARTITION BY event_type ORDER BY bucket
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS cum,
        |        CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |      FROM b),
        |s AS (SELECT event_type,
        |        min(CASE WHEN cum >= CAST(0.5 AS DOUBLE) * n
        |              AND cum - c < CAST(0.5 AS DOUBLE) * n THEN
        |          bucket + (CAST(0.5 AS DOUBLE) * n - (cum - c)) / c END)
        |          AS p50_est,
        |        min(CASE WHEN cum >= CAST(0.9 AS DOUBLE) * n
        |              AND cum - c < CAST(0.9 AS DOUBLE) * n THEN
        |          bucket + (CAST(0.9 AS DOUBLE) * n - (cum - c)) / c END)
        |          AS p90_est
        |      FROM w GROUP BY 1),
        |x AS (SELECT event_type, quantile_cont(value, 0.5) AS p50_exact,
        |        quantile_cont(value, 0.9) AS p90_exact
        |      FROM events GROUP BY 1)
        |SELECT x.event_type, p50_exact, p50_est, p50_est - p50_exact AS p50_err,
        |  p90_exact, p90_est, p90_est - p90_exact AS p90_err
        |FROM x JOIN s ON x.event_type = s.event_type
        |ORDER BY x.event_type""".stripMargin,
    // q240: the same log-linear buckets (bin-length + shifts, no ln),
    // nearest-rank targets, q180 covering rule on both sides
    "q240_loglinear_percentiles" ->
      """WITH c AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |b AS (SELECT event_type,
        |    CASE WHEN cents < 32 THEN cents
        |         ELSE ((16 + ((cents >> (length(bin(cents)) - 5)) & 15)) << (length(bin(cents)) - 5))
        |              + ((CAST(1 AS BIGINT) << (length(bin(cents)) - 5)) // 2) END AS rep
        |  FROM c),
        |sk AS (SELECT event_type, rep, CAST(count(*) AS BIGINT) AS cnt
        |  FROM b GROUP BY event_type, rep),
        |scum AS (SELECT event_type, rep, cnt,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY rep) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n FROM sk),
        |est AS (SELECT event_type,
        |    min(CASE WHEN cum >= (n * 50 + 99) // 100 AND cum - cnt < (n * 50 + 99) // 100 THEN rep END) AS p50_est,
        |    min(CASE WHEN cum >= (n * 99 + 99) // 100 AND cum - cnt < (n * 99 + 99) // 100 THEN rep END) AS p99_est
        |  FROM scum GROUP BY event_type),
        |xc AS (SELECT event_type, cents, CAST(count(*) AS BIGINT) AS cnt FROM c GROUP BY 1, 2),
        |xcum AS (SELECT event_type, cents, cnt,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n FROM xc),
        |ex AS (SELECT event_type,
        |    min(CASE WHEN cum >= (n * 50 + 99) // 100 AND cum - cnt < (n * 50 + 99) // 100 THEN cents END) AS p50_exact,
        |    min(CASE WHEN cum >= (n * 99 + 99) // 100 AND cum - cnt < (n * 99 + 99) // 100 THEN cents END) AS p99_exact
        |  FROM xcum GROUP BY event_type)
        |SELECT e.event_type, p50_exact, p50_est,
        |  CAST(abs(p50_est - p50_exact) * 1000000 // greatest(p50_exact, 1) AS BIGINT) AS p50_err_ppm,
        |  p99_exact, p99_est,
        |  CAST(abs(p99_est - p99_exact) * 1000000 // greatest(p99_exact, 1) AS BIGINT) AS p99_err_ppm
        |FROM ex e JOIN est USING (event_type) ORDER BY e.event_type""".stripMargin,
    // q181: the same decimal-exact cents, week-age anchor, and
    // power-of-two shift weights
    "q181_decay_engagement" ->
      """WITH t AS (SELECT max(epoch_us(ts) // 86400000000) AS max_day
        |           FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    << (30 - (max_day - epoch_us(ts) // 86400000000) // 7))
        |    AS BIGINT) AS score_q30
        |FROM events CROSS JOIN t
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // q182: the one-shot signed recompute — the increment ≡ recompute
    // theorem is exactly this hash match
    "q182_ivm_retractions" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN -1 ELSE 1 END)
        |    AS BIGINT) AS n_net,
        |  CAST(sum((CASE WHEN event_type = 'error' THEN -1 ELSE 1 END) *
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |    AS BIGINT) AS cents_net
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // q183: the same carried-last-touch window, lookback cut, and
    // exact-ppm shares
    "q183_lasttouch_attribution" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
        |           FROM events),
        |a AS (SELECT event_type, ts_us,
        |        last_value(CASE WHEN event_type IN ('view', 'click')
        |          THEN ts_us END IGNORE NULLS) OVER
        |          (PARTITION BY user_id ORDER BY ts_us, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_ts,
        |        last_value(CASE WHEN event_type IN ('view', 'click')
        |          THEN event_type END IGNORE NULLS) OVER
        |          (PARTITION BY user_id ORDER BY ts_us, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_type
        |      FROM e),
        |c AS (SELECT CASE WHEN lt_ts IS NOT NULL
        |          AND lt_ts >= ts_us - 43200000000 THEN lt_type
        |          ELSE 'none' END AS channel,
        |        CAST(count(*) AS BIGINT) AS n_purchases
        |      FROM a WHERE event_type = 'purchase' GROUP BY 1),
        |t AS (SELECT CAST(sum(n_purchases) AS BIGINT) AS n_total FROM c)
        |SELECT channel, n_purchases,
        |  n_purchases * 1000000 // n_total AS share_ppm
        |FROM c CROSS JOIN t ORDER BY channel""".stripMargin,
    // q185: the same daily grain and RANGE frame
    "q185_rolling_features" ->
      """WITH daily AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |        CAST(count(*) AS BIGINT) AS n_day,
        |        CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |          AS BIGINT) AS cents_day
        |      FROM events GROUP BY 1, 2)
        |SELECT user_id, day, n_day, cents_day,
        |  CAST(sum(n_day) OVER (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll7_n,
        |  CAST(sum(cents_day) OVER (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS roll7_cents
        |FROM daily ORDER BY user_id, day""".stripMargin,
    // q186: the same registry predicate and two-level cascade
    "q186_erasure_audit" ->
      """WITH r AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 97 = 0),
        |po AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT k FROM r)),
        |c AS (SELECT 'customer' AS relation,
        |        CAST(count(*) AS BIGINT) AS n_total,
        |        CAST(count(*) FILTER (WHERE c_custkey % 97 = 0) AS BIGINT)
        |          AS n_purged
        |      FROM customer),
        |o AS (SELECT 'orders' AS relation,
        |        CAST(count(*) AS BIGINT) AS n_total,
        |        CAST(count(*) FILTER (WHERE o_custkey IN (SELECT k FROM r))
        |          AS BIGINT) AS n_purged
        |      FROM orders),
        |l AS (SELECT 'lineitem' AS relation,
        |        CAST(count(*) AS BIGINT) AS n_total,
        |        CAST(count(*) FILTER (WHERE l_orderkey IN
        |          (SELECT o_orderkey FROM po)) AS BIGINT) AS n_purged
        |      FROM lineitem)
        |SELECT relation, n_total, n_purged,
        |  n_purged * 1000000 // n_total AS purged_ppm
        |FROM (SELECT * FROM c UNION ALL SELECT * FROM o
        |      UNION ALL SELECT * FROM l)
        |ORDER BY relation""".stripMargin,
    // q189: the same cohort counts and the shared Wilson dag verbatim
    "q189_wilson_ci" ->
      s"""WITH su AS (SELECT user_id, min(epoch_us(ts)) AS s_us FROM events
         |            WHERE event_type = 'signup' GROUP BY 1),
         |pu AS (SELECT user_id, min(epoch_us(ts)) AS p_us FROM events
         |       WHERE event_type = 'purchase' GROUP BY 1),
         |c AS (SELECT s_us // 86400000000 AS cohort_day,
         |        CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(CASE WHEN p_us >= s_us THEN 1 ELSE 0 END)
         |          AS BIGINT) AS k
         |      FROM su LEFT JOIN pu ON su.user_id = pu.user_id
         |      GROUP BY 1)
         |SELECT cohort_day, n, k, $WilsonCenterExpr, $WilsonLoExpr,
         |  $WilsonHiExpr
         |FROM c ORDER BY cohort_day""".stripMargin,
    // q190: the same keyed join, integer-day lag, and audit cuts
    "q190_shiplag_sla" ->
      """WITH j AS (SELECT
        |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
        |    (epoch_us(l_shipdate) - epoch_us(o_orderdate)) // 86400000000
        |      AS lag_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT ym, CAST(count(*) AS BIGINT) AS n_lines,
        |  quantile_cont(lag_days, 0.5) AS p50_lag,
        |  quantile_cont(lag_days, 0.95) AS p95_lag,
        |  CAST(sum(CASE WHEN lag_days > 60 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_breach,
        |  CAST(sum(CASE WHEN lag_days > 60 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // CAST(count(*) AS BIGINT) AS breach_ppm,
        |  CAST(sum(CASE WHEN lag_days < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_negative,
        |  CAST(sum(CASE WHEN lag_days < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // CAST(count(*) AS BIGINT) AS negative_ppm
        |FROM j GROUP BY ym ORDER BY ym""".stripMargin,
    // q191: the same daily collapse, dow baselines, scaled deviation,
    // and per-weekday argmax flag
    "q191_seasonal_baseline" ->
      """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |        CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
        |d2 AS (SELECT day, day % 7 AS dow, c FROM daily),
        |b AS (SELECT dow, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(c) AS BIGINT) AS sc
        |      FROM d2 GROUP BY 1),
        |dev AS (SELECT day, d2.dow, c, n, sc,
        |          n * c - sc AS dev_scaled
        |        FROM d2 JOIN b ON d2.dow = b.dow),
        |w AS (SELECT dow, max(abs(dev_scaled)) AS mad FROM dev GROUP BY 1)
        |SELECT day, dev.dow, c, sc // n AS dow_mean_floor,
        |  CAST(dev_scaled AS BIGINT) AS dev_scaled,
        |  CAST(CASE WHEN abs(dev_scaled) = mad THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_worst
        |FROM dev JOIN w ON dev.dow = w.dow ORDER BY day""".stripMargin,
    // q169: the same two first-event mins, guarded lag, and cohort
    // aggregation
    "q169_conversion_lag" ->
      """WITH su AS (SELECT user_id, min(epoch_us(ts)) AS s_us FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |pu AS (SELECT user_id, min(epoch_us(ts)) AS p_us FROM events
        |       WHERE event_type = 'purchase' GROUP BY 1),
        |j AS (SELECT s_us // 86400000000 AS cohort_day,
        |        CASE WHEN p_us >= s_us THEN p_us - s_us END AS delay_us
        |      FROM su LEFT JOIN pu ON su.user_id = pu.user_id)
        |SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_signups,
        |  CAST(count(delay_us) AS BIGINT) AS n_converted,
        |  CAST(count(delay_us) * 1000000 // count(*) AS BIGINT) AS conv_ppm,
        |  quantile_cont(delay_us, 0.5) AS p50_delay_us,
        |  quantile_cont(delay_us, 0.9) AS p90_delay_us
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // q171: the same QI grouping, k = 5 rule, and exact-ppm risk
    "q171_k_anonymity" ->
      """WITH g AS (SELECT event_type, user_id % 100 AS cohort,
        |    epoch_us(ts) // 86400000000 AS day, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(c) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN c < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_below_k,
        |  CAST(sum(CASE WHEN c < 5 THEN c ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
        |  CAST(sum(CASE WHEN c < 5 THEN c ELSE 0 END) * 1000000
        |    // sum(c) AS BIGINT) AS risk_ppm
        |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q234: the same QI grouping, l = 3 distinct-sensitive rule
    "q234_l_diversity" ->
      """WITH g AS (SELECT user_id % 100 AS cohort,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(DISTINCT event_type) AS BIGINT) AS n_sens,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT day, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(c) AS BIGINT) AS n_rows,
        |  CAST(count(*) FILTER (n_sens < 3) AS BIGINT) AS n_below_l,
        |  CAST(sum(CASE WHEN n_sens < 3 THEN c ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
        |  CAST(sum(CASE WHEN n_sens < 3 THEN c ELSE 0 END) * 1000000
        |    // sum(c) AS BIGINT) AS risk_ppm
        |FROM g GROUP BY day ORDER BY day""".stripMargin,
    // q235: the same dense QI×type grid, per-term ppm floor, per-group
    // mean over k−1 steps — the integer EMD replayed cumulative-by-
    // cumulative (the last cum step is 0 on both sides, so including it
    // changes nothing; both engines include it)
    "q235_t_closeness" ->
      """WITH e AS (SELECT event_type, user_id % 100 AS cohort,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS ct
        |  FROM e GROUP BY event_type),
        |sc AS (SELECT CAST(sum(ct) AS BIGINT) AS t_all,
        |    CAST(count(*) AS BIGINT) AS k_types FROM tot),
        |g AS (SELECT cohort, day, CAST(count(*) AS BIGINT) AS g_n
        |  FROM e GROUP BY cohort, day),
        |gc AS (SELECT cohort, day, event_type, CAST(count(*) AS BIGINT) AS c
        |  FROM e GROUP BY 1, 2, 3),
        |cum AS (SELECT g.cohort, g.day, g.g_n,
        |    CAST(sum(coalesce(gc.c, 0)) OVER
        |      (PARTITION BY g.cohort, g.day ORDER BY tot.event_type) AS BIGINT) AS cum_g,
        |    CAST(sum(tot.ct) OVER
        |      (PARTITION BY g.cohort, g.day ORDER BY tot.event_type) AS BIGINT) AS cum_t
        |  FROM g CROSS JOIN tot
        |  LEFT JOIN gc ON gc.cohort = g.cohort AND gc.day = g.day
        |    AND gc.event_type = tot.event_type),
        |emd AS (SELECT cohort, day, g_n,
        |    CAST(CAST(sum(abs(cum_g * sc.t_all - cum_t * g_n) * 1000000
        |      // (g_n * sc.t_all)) AS BIGINT) // (sc.k_types - 1) AS BIGINT) AS emd_ppm
        |  FROM cum, sc GROUP BY cohort, day, g_n, sc.k_types)
        |SELECT day, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(count(*) FILTER (emd_ppm > 300000) AS BIGINT) AS n_tclose_fail,
        |  CAST(sum(CASE WHEN emd_ppm > 300000 THEN g_n ELSE 0 END) AS BIGINT)
        |    AS n_rows_at_risk,
        |  max(emd_ppm) AS max_emd_ppm
        |FROM emd GROUP BY day ORDER BY day""".stripMargin,
    // q233: the same propensity fractions and per-row floored terms
    "q233_ips_policy_eval" ->
      """WITH e AS (SELECT user_id % 10 AS cohort, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    CASE WHEN (user_id % 10) % 2 = 0 THEN 'purchase' ELSE 'view' END AS target
        |  FROM events),
        |cc AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_c FROM e GROUP BY cohort),
        |ca AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_ct,
        |    CAST(sum(cents) AS BIGINT) AS sum_cents
        |  FROM e WHERE event_type = target GROUP BY cohort),
        |t AS (SELECT e.cohort, e.cents * cc.n_c // ca.n_ct AS term
        |  FROM e JOIN cc USING (cohort) JOIN ca USING (cohort)
        |  WHERE e.event_type = e.target),
        |s AS (SELECT cohort, CAST(sum(term) AS BIGINT) AS ips_sum FROM t GROUP BY cohort)
        |SELECT cc.cohort, cc.n_c AS n,
        |  coalesce(ca.n_ct, 0) AS n_match,
        |  CAST(coalesce(s.ips_sum, 0) // cc.n_c AS BIGINT) AS ips_cents,
        |  CAST(coalesce(ca.sum_cents, 0) // greatest(coalesce(ca.n_ct, 0), 1) AS BIGINT)
        |    AS logged_mean_cents
        |FROM cc LEFT JOIN ca USING (cohort) LEFT JOIN s USING (cohort)
        |ORDER BY cohort""".stripMargin,
    // q236: the same score-group table, negatives-below window, ×2 tie
    // scale, and the floored-ppm-then-derive gini rule
    "q236_auc_ranking" ->
      """WITH g AS (SELECT n_chars AS score,
        |    CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS pos_s,
        |    CAST(count(*) FILTER (lang <> 'en') AS BIGINT) AS neg_s
        |  FROM documents GROUP BY n_chars),
        |c AS (SELECT pos_s, neg_s,
        |    CAST(coalesce(sum(neg_s) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS neg_below
        |  FROM g),
        |a AS (SELECT CAST(sum(pos_s) AS BIGINT) AS n_pos,
        |    CAST(sum(neg_s) AS BIGINT) AS n_neg,
        |    CAST(sum(pos_s * (2 * neg_below + neg_s)) AS BIGINT) AS auc2 FROM c)
        |SELECT n_pos, n_neg,
        |  CAST(auc2 * 1000000 // (2 * n_pos * n_neg) AS BIGINT) AS auc_ppm,
        |  CAST(2 * (auc2 * 1000000 // (2 * n_pos * n_neg)) - 1000000 AS BIGINT) AS gini_ppm
        |FROM a""".stripMargin,
    // q157: the same first-day mapping and day-table running sum
    "q157_user_growth" ->
      """WITH f AS (SELECT user_id, min(epoch_us(ts) // 86400000000) AS first_day
        |  FROM events GROUP BY user_id),
        |p AS (SELECT first_day AS day, CAST(count(*) AS BIGINT) AS new_users
        |  FROM f GROUP BY 1)
        |SELECT day, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM p ORDER BY day""".stripMargin,
    // q152: the same keyed row_number and threshold
    "q152_rate_limit" -> RateLimitSql,
    // q196: the transformWithState face must reproduce the same
    // one-shot truth — shared text (the q147/q179 promotion rule).
    "q196_rate_limit_stream" -> RateLimitSql,
    // q207: one full-history batch aggregate — no cut, no seam. Cents
    // are per-row round(value*100): the fixture values carry two
    // decimals, so both engines' rounds sit ~0.5 from any half-way
    // boundary and agree exactly; the sum is an exact BIGINT fold.
    "q207_kappa_replay" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // q212: the one-shot cross-tab — no batches, no state
    "q212_mapstate_profile" ->
      """SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    // q228: the same one-shot cross-tab as q212 — per-batch emissions
    // sum back to the corpus total exactly when TTL expiry fired at the
    // batch boundary (retained state would double-count batch 1)
    "q228_state_ttl" ->
      """SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    // q213: the one-shot last-3 path — event_id is the unique log
    // order, string_agg re-assembles ascending
    "q213_liststate_recent" ->
      """WITH r AS (SELECT user_id, event_type, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rk,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events)
        |SELECT user_id, CAST(max(n) AS BIGINT) AS n_seen,
        |  string_agg(event_type, '>' ORDER BY event_id) AS recent_path
        |FROM r WHERE rk <= 3 GROUP BY user_id ORDER BY user_id""".stripMargin,
    // q201: identical integer-bits terms — length(bin(n // nv)) − 1 on
    // both engines (the q137/q146 idiom), exact BIGINT sums, same
    // final integer division. No libm anywhere (ADVICE r11).
    "q201_entropy_profile" ->
      """WITH ev AS (SELECT event_type, user_id,
        |        epoch_us(ts) // 86400000000 AS day FROM events),
        |et AS (SELECT event_type AS v, CAST(count(*) AS BIGINT) AS nv FROM ev GROUP BY 1),
        |eu AS (SELECT user_id AS v, CAST(count(*) AS BIGINT) AS nv FROM ev GROUP BY 1),
        |ed AS (SELECT day AS v, CAST(count(*) AS BIGINT) AS nv FROM ev GROUP BY 1),
        |rt AS (SELECT 'event_type' AS col_name,
        |         CAST(count(*) AS BIGINT) AS n_distinct,
        |         CAST((1000 * CAST(sum(nv * (length(bin(CAST((SELECT sum(nv) FROM et) AS BIGINT) // nv)) - 1)) AS BIGINT))
        |           // CAST((SELECT sum(nv) FROM et) AS BIGINT) AS BIGINT) AS entropy_mbits
        |       FROM et),
        |ru AS (SELECT 'user_id' AS col_name,
        |         CAST(count(*) AS BIGINT) AS n_distinct,
        |         CAST((1000 * CAST(sum(nv * (length(bin(CAST((SELECT sum(nv) FROM eu) AS BIGINT) // nv)) - 1)) AS BIGINT))
        |           // CAST((SELECT sum(nv) FROM eu) AS BIGINT) AS BIGINT) AS entropy_mbits
        |       FROM eu),
        |rd AS (SELECT 'day' AS col_name,
        |         CAST(count(*) AS BIGINT) AS n_distinct,
        |         CAST((1000 * CAST(sum(nv * (length(bin(CAST((SELECT sum(nv) FROM ed) AS BIGINT) // nv)) - 1)) AS BIGINT))
        |           // CAST((SELECT sum(nv) FROM ed) AS BIGINT) AS BIGINT) AS entropy_mbits
        |       FROM ed)
        |SELECT col_name, n_distinct, entropy_mbits
        |FROM (SELECT * FROM rt UNION ALL SELECT * FROM ru UNION ALL SELECT * FROM rd) u
        |ORDER BY col_name""".stripMargin,
    // q199: identical per-customer metrics, quantile_cont ≡ percentile
    // (bit-equal interpolated doubles — q176), list index ≡ element_at.
    "q199_rfm_segments" ->
      """WITH o AS (SELECT o_custkey AS ck,
        |        epoch_us(o_orderdate) // 86400000000 AS day,
        |        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |      FROM orders),
        |anchor AS (SELECT max(day) AS anchor_day FROM o),
        |rfm AS (SELECT ck, anchor_day - max(day) AS r_days,
        |          CAST(count(*) AS BIGINT) AS f,
        |          CAST(sum(cents) AS BIGINT) AS m_cents
        |        FROM o CROSS JOIN anchor
        |        GROUP BY ck, anchor_day),
        |cuts AS (SELECT quantile_cont(r_days, [0.2, 0.4, 0.6, 0.8]) AS rc,
        |           quantile_cont(f, [0.2, 0.4, 0.6, 0.8]) AS fc,
        |           quantile_cont(m_cents, [0.2, 0.4, 0.6, 0.8]) AS mc
        |         FROM rfm),
        |seg AS (SELECT
        |    CAST(1 + (CASE WHEN r_days > rc[1] THEN 1 ELSE 0 END)
        |           + (CASE WHEN r_days > rc[2] THEN 1 ELSE 0 END)
        |           + (CASE WHEN r_days > rc[3] THEN 1 ELSE 0 END)
        |           + (CASE WHEN r_days > rc[4] THEN 1 ELSE 0 END) AS BIGINT) AS r_q,
        |    CAST(1 + (CASE WHEN f > fc[1] THEN 1 ELSE 0 END)
        |           + (CASE WHEN f > fc[2] THEN 1 ELSE 0 END)
        |           + (CASE WHEN f > fc[3] THEN 1 ELSE 0 END)
        |           + (CASE WHEN f > fc[4] THEN 1 ELSE 0 END) AS BIGINT) AS f_q,
        |    CAST(1 + (CASE WHEN m_cents > mc[1] THEN 1 ELSE 0 END)
        |           + (CASE WHEN m_cents > mc[2] THEN 1 ELSE 0 END)
        |           + (CASE WHEN m_cents > mc[3] THEN 1 ELSE 0 END)
        |           + (CASE WHEN m_cents > mc[4] THEN 1 ELSE 0 END) AS BIGINT) AS m_q,
        |    f, m_cents
        |  FROM rfm CROSS JOIN cuts)
        |SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(f) AS BIGINT) AS sum_orders,
        |  CAST(sum(m_cents) AS BIGINT) AS sum_m_cents
        |FROM seg GROUP BY r_q, f_q, m_q
        |ORDER BY r_q, f_q, m_q""".stripMargin,
    // q139: the same orientation and oriented wedge enumeration — the
    // hash match proves each triangle is found exactly once
    "q139_triangle_count" ->
      """WITH ev AS (SELECT event_id, user_id, event_id // 1000 AS bucket FROM events),
        |ed AS (SELECT user_id AS src,
        |         lead(user_id) OVER (PARTITION BY bucket ORDER BY event_id) AS dst
        |       FROM ev),
        |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |        FROM ed WHERE dst IS NOT NULL AND dst <> src),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        |          SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und) u
        |        GROUP BY node),
        |o AS (SELECT CASE WHEN da.deg <= db.deg THEN und.a ELSE und.b END AS src,
        |        CASE WHEN da.deg <= db.deg THEN und.b ELSE und.a END AS dst,
        |        CASE WHEN da.deg <= db.deg THEN db.deg ELSE da.deg END AS ddeg
        |      FROM und JOIN deg da ON und.a = da.node JOIN deg db ON und.b = db.node),
        |tri AS (SELECT e1.src AS s, e1.dst AS v1, e2.dst AS v2
        |        FROM o e1 JOIN o e2 ON e1.src = e2.src
        |          AND (e1.ddeg < e2.ddeg OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst))
        |        JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
        |cnt AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        |          SELECT s AS node FROM tri UNION ALL SELECT v1 AS node FROM tri
        |          UNION ALL SELECT v2 AS node FROM tri) c
        |        GROUP BY node)
        |SELECT deg.node AS user_id,
        |  CAST(coalesce(cnt.n_triangles, 0) AS BIGINT) AS n_triangles
        |FROM deg LEFT JOIN cnt ON deg.node = cnt.node ORDER BY user_id""".stripMargin,

    // q129: identical moment sums and closed forms — the z doubles are
    // bit-equal, so the |z| > 3 cut can never straddle engines
    "q129_anomaly" ->
      """WITH s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))
        |      AS DECIMAL(38,4))) AS DOUBLE) AS syy
        |  FROM events GROUP BY event_type),
        |m AS (SELECT event_type, sy / n AS mu,
        |    sqrt((n * syy - sy * sy) / (n * (n - 1))) AS sigma FROM s)
        |SELECT e.event_id, e.event_type, e.value,
        |  round((e.value - m.mu) / m.sigma, 4) AS z
        |FROM events e JOIN m USING (event_type)
        |WHERE abs((e.value - m.mu) / m.sigma) > 3.0
        |ORDER BY e.event_id""".stripMargin,
    "q113_scd2" ->
      """SELECT user_id,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  event_id, value,
        |  epoch_us(ts) AS valid_from,
        |  coalesce(lead(epoch_us(ts), 1) OVER w, 9223372036854775807) AS valid_to,
        |  CAST(CASE WHEN lead(ts, 1) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM events
        |WHERE event_type IN ('signup', 'purchase')
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |ORDER BY user_id, version""".stripMargin,
    "q45_pivot_counts" -> {
      val cols = EventTypes.map(t =>
        s"CAST(count(*) FILTER (event_type = '$t') AS BIGINT) AS \"$t\"").mkString(", ")
      s"""SELECT user_id % 10 AS cohort, $cols
         |FROM events GROUP BY user_id % 10 ORDER BY cohort""".stripMargin
    },
    "q46_quantiles" ->
      """SELECT event_type, quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.9) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q47_corr_exact" ->
      """WITH sums AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(event_id AS DECIMAL(28,0))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(CAST(event_id AS DECIMAL(28,0)) * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,2))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(CAST(event_id AS DECIMAL(28,0)) * CAST(event_id AS DECIMAL(28,0)) AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS syy
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n,
        |  (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_xy
        |FROM sums ORDER BY event_type""".stripMargin,
    "q49_set_ops" ->
      """WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
        |e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
        |SELECT user_id, segment FROM (
        |  SELECT user_id, 'both' AS segment FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM e)
        |  UNION ALL
        |  SELECT user_id, 'purchase_only' FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM e))
        |ORDER BY segment, user_id""".stripMargin,
    "q48_running_sum" ->
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
        |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_n
        |FROM events ORDER BY event_id""".stripMargin,
    // The oracle runs the window-sort formulation the Spark side
    // deliberately avoids — same answer, different physical shape.
    "q80_latest_compaction" ->
      """WITH r AS (
        |  SELECT user_id, event_id, event_type, value, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n_versions
        |  FROM events)
        |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        |  value AS last_value, ts AS last_ts, CAST(n_versions AS BIGINT) AS n_versions
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q81_funnel_stages" -> FunnelSql,
    // q179: the oracle is q81's one-shot text — the hash match proves
    // the per-user funnel state machine loses/duplicates no stage at
    // any batch boundary (the q147/q170 promotion precedent).
    "q179_funnel_replay" -> FunnelSql,
    // q194: the same derived snapshots, IS DISTINCT FROM ≡ Spark's
    // negated <=>, and the same grammar-sized per-class report.
    "q194_snapshot_diff" ->
      """WITH base AS (SELECT o_orderkey AS k, o_custkey AS ck,
        |        o_orderstatus AS st, CAST(o_totalprice AS DECIMAL(18,2)) AS tp,
        |        o_orderdate AS od, o_orderpriority AS pr
        |      FROM orders WHERE o_orderkey % 83 <> 0),
        |repl AS (SELECT o_orderkey AS k, o_custkey AS ck,
        |        o_orderstatus AS st,
        |        CAST(CASE WHEN o_orderkey % 89 = 0
        |          THEN CAST(o_totalprice AS DECIMAL(18,2)) + CAST(1 AS DECIMAL(18,2))
        |          ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS DECIMAL(18,2)) AS tp,
        |        o_orderdate AS od, o_orderpriority AS pr
        |      FROM orders WHERE o_orderkey % 97 <> 0),
        |j AS (SELECT coalesce(b.k, r.k) AS k,
        |        CASE WHEN b.k IS NULL THEN 'added'
        |             WHEN r.k IS NULL THEN 'removed'
        |             WHEN b.ck IS DISTINCT FROM r.ck
        |               OR b.st IS DISTINCT FROM r.st
        |               OR b.tp IS DISTINCT FROM r.tp
        |               OR b.od IS DISTINCT FROM r.od
        |               OR b.pr IS DISTINCT FROM r.pr THEN 'changed'
        |             ELSE 'unchanged' END AS diff_class
        |      FROM base b FULL OUTER JOIN repl r ON b.k = r.k)
        |SELECT diff_class, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(k) AS BIGINT) AS key_checksum
        |FROM j GROUP BY diff_class ORDER BY diff_class""".stripMargin
  )

  /** q152/q196's shared one-shot rate-limit truth. Lazy: referenced by
    * the `oracles` map above, which initializes first. */
  private[queries] lazy val RateLimitSql =
      """SELECT event_id, user_id,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT) AS k,
        |  CAST(CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY event_id) > 50
        |    THEN 1 ELSE 0 END AS BIGINT) AS throttled
        |FROM events ORDER BY event_id""".stripMargin

  /** q81/q179's shared one-shot funnel truth. Lazy: referenced by the
    * `oracles` map above, which initializes first. */
  private[queries] lazy val FunnelSql =
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |v AS (SELECT user_id, min(ts) AS t_view FROM events
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t_view
        |        AND e.ts <= v.t_view + INTERVAL 12 HOUR GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |        AND e.ts <= c.t_click + INTERVAL 12 HOUR GROUP BY e.user_id)
        |SELECT u.user_id,
        |  CAST(CASE WHEN p.t_purchase IS NOT NULL THEN 3
        |            WHEN c.t_click IS NOT NULL THEN 2
        |            WHEN v.t_view IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage,
        |  epoch_us(v.t_view) AS t_view_us,
        |  epoch_us(c.t_click) AS t_click_us,
        |  epoch_us(p.t_purchase) AS t_purchase_us
        |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
        |  LEFT JOIN p USING (user_id)
        |ORDER BY u.user_id""".stripMargin
}
