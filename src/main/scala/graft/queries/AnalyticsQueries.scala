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
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .filter(col("event_type") === "signup" || col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("version", row_number().over(w).cast("long"))
        .withColumn("valid_from", col("ts"))
        // the canonical SCD2 open-interval sentinel instead of NULL: a
        // dimension consumer can always range-join on [from, to)
        .withColumn("is_current",
          when(lead(col("ts"), 1).over(w).isNull, 1L).otherwise(0L))
        .withColumn("valid_to", coalesce(lead(col("ts"), 1).over(w),
          lit("9999-12-31 00:00:00").cast("timestamp")))
        .select("user_id", "version", "event_id", "value",
          "valid_from", "valid_to", "is_current")
        .orderBy("user_id", "version")
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
    }
  )

  val oracles: Map[String, String] = Map(
    "q53_above_type_avg" -> AboveTypeAvgSql,
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
    "q113_scd2" ->
      """SELECT user_id,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  event_id, value,
        |  ts AS valid_from,
        |  coalesce(lead(ts, 1) OVER w, TIMESTAMP '9999-12-31 00:00:00') AS valid_to,
        |  CAST(CASE WHEN lead(ts, 1) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM events
        |WHERE event_type IN ('signup', 'purchase')
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
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
    "q81_funnel_stages" ->
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
  )
}
