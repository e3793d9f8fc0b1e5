package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal windowing beyond the tumbling q14/q25: sliding windows and
  * session windows (SURVEY.md §2.4 — classes the reference never
  * exercises, mandated by the extension surface). Both run on the same
  * logical operators in batch here and in Structured Streaming unchanged.
  */
object TemporalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Sliding 2-minute window, 1-minute slide: every event lands in two
    // windows; Spark's window() generator expands them, the aggregation
    // shuffles on window start (keyed, partial-agg friendly).
    "q39_sliding_window" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "2 minutes", "1 minute"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(col("window.start").as("wstart"), col("n"), col("sum_value"))
        .orderBy("wstart")
    },

    // Session windows: events of a user merge while gaps stay under
    // 5 minutes. session_window() keeps the shuffle keyed by user — the
    // scalable form of gaps-and-islands (which needs a per-user ordered
    // window, also parallel; the oracle uses that formulation).
    "q40_session_windows" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    }
  )

  val oracles: Map[String, String] = Map(
    "q39_sliding_window" ->
      """WITH expanded AS (
        |  SELECT unnest([date_trunc('minute', ts),
        |                 date_trunc('minute', ts) - INTERVAL 1 MINUTE]) AS wstart,
        |    value
        |  FROM events)
        |SELECT wstart, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM expanded GROUP BY wstart ORDER BY wstart""".stripMargin,
    "q40_session_windows" ->
      """WITH x AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |              OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                 >= INTERVAL 5 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |s AS (SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT user_id, min(ts) AS session_start, CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin
  )
}
