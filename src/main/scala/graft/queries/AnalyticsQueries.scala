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
    }
  )

  val oracles: Map[String, String] = Map(
    "q53_above_type_avg" -> AboveTypeAvgSql,
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
        |FROM events ORDER BY event_id""".stripMargin
  )
}
