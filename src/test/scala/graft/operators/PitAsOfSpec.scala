package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** q119's range-join form vs the native as-of operator: the SCD2
  * intervals are contiguous from the first version, so "the version in
  * force at ts" ≡ "the latest version with v_from ≤ ts" — two physical
  * shapes, one semantics, cross-checked row-for-row. */
class PitAsOfSpec extends SparkSpec {
  import spark.implicits._

  test("q119 range join equals the native as-of formulation") {
    val pit = graft.SparkEntry.queries("q119_pit_enrichment")(spark, sf0001)
      .select("event_id", "version", "dim_value")
      .as[(Long, Option[Long], Option[Double])].collect().toSeq

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("v_from").asc, col("event_id").asc)
    val versions = Tables.events(spark, sf0001)
      .filter(col("event_type") === "signup" || col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("v_from"),
        col("value").as("dim_value"))
      .withColumn("version", row_number().over(w).cast("long"))
      .select(col("user_id"), col("v_from").as("ts_us"), col("version"), col("dim_value"))
    val facts = Tables.events(spark, sf0001)
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), expr("unix_micros(ts)").as("ts_us"))
    val asOf = AsOfJoin.lastAtOrBeforeNative(facts, versions,
        "user_id", "ts_us", "version")
      .orderBy("event_id")
      .select("event_id", "version", "dim_value")
      .as[(Long, Option[Long], Option[Double])].collect().toSeq

    assert(pit === asOf)
  }
}
