package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew handling for non-algebraic aggregates.
  *
  * Algebraic aggregates (sum/count/min/max) are already skew-tolerant in
  * Spark — partial aggregation collapses hot keys map-side. The classic
  * skew victim is `count(DISTINCT v)` over a hot key: every row of the
  * hot key must meet in one reducer. The two-stage form below spreads
  * stage one across (key, value) — cardinality, not row count — so no
  * single task ever sees a hot key's full row stream. AQE's skew-join
  * splitting handles the join-side analog at runtime.
  */
object Salting {

  /** `count(DISTINCT valueCol) GROUP BY keyCol`, skew-safe: stage 1
    * dedups (key, value) pairs (shuffle keyed by the pair), stage 2
    * counts the surviving pairs per key (tiny). NULL values are excluded
    * like SQL `count(DISTINCT)` excludes them — without the filter the
    * pair-distinct would keep one (key, NULL) row and count it, a +1
    * divergence from the aggregate this replaces. */
  def skewSafeDistinctCount(df: DataFrame, keyCol: String, valueCol: String,
                            outCol: String): DataFrame =
    df.select(keyCol, valueCol)
      .where(col(valueCol).isNotNull)
      .distinct()
      .groupBy(keyCol)
      .agg(count(lit(1)).as(outCol))
}
