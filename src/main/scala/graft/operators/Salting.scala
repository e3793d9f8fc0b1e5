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
    * divergence from the aggregate this replaces.
    *
    * Groups come from the UNFILTERED keys: a key whose values are all
    * NULL must still surface, with count 0, exactly as the plain GROUP BY
    * emits it (deriving groups from the filtered pairs would drop it).
    * The join is null-safe because a NULL key is itself a group in SQL.
    * The extra distinct-keys pass is skew-tolerant (partial aggregation
    * collapses hot keys map-side) and its output is one row per key —
    * broadcast-sized at any realistic cardinality. */
  /** Replication-salted equi-join — the classic PRE-AQE skew-join fix,
    * kept as the explicit form for engines/plans where AQE's runtime
    * split doesn't reach (e.g. a skewed key feeding a non-shuffle
    * consumer, or a fixed-plan production job): the fact side gains a
    * deterministic salt in [0, salts), the dimension side replicates
    * ×salts (one exploded row per salt), and the join keys on
    * (key, salt) — a hot key's rows now land on `salts` reducers
    * instead of one. Join semantics are UNCHANGED (every fact row still
    * meets exactly one copy of its dim row); q134's oracle proves it
    * against the plain join. Cost: dim inflates ×salts — the technique
    * is for dimension-sized right sides only.
    *
    * `saltExpr` must be deterministic per fact row (a column hash, NOT
    * rand()) or retries/replays re-salt and break reproducibility. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
                 saltExpr: org.apache.spark.sql.Column): DataFrame = {
    require(salts > 0, s"saltedJoin needs salts > 0, got $salts")
    val f = fact.withColumn("__graft_salt", saltExpr.cast("int"))
    val d = dim.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    f.join(d, Seq(key, "__graft_salt")).drop("__graft_salt")
  }

  def skewSafeDistinctCount(df: DataFrame, keyCol: String, valueCol: String,
                            outCol: String): DataFrame = {
    val pairCounts = df.select(col(keyCol), col(valueCol))
      .where(col(valueCol).isNotNull)
      .distinct()
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as(outCol))
      .withColumnRenamed(keyCol, "__graft_key")
    df.select(col(keyCol)).distinct()
      .join(pairCounts, col(keyCol) <=> col("__graft_key"), "left")
      .select(col(keyCol), coalesce(col(outCol), lit(0L)).as(outCol))
  }
}
