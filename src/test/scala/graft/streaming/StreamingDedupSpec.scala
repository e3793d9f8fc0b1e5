package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class StreamingDedupSpec extends SparkSpec {

  test("streaming dedup keeps one row per (user_id, event_type)") {
    val got = StreamingDedup.firstPerUserType(spark, sf0001)
    val expectedKeys = Tables.events(spark, sf0001)
      .select("user_id", "event_type").distinct().count()
    assert(got.count() === expectedKeys)
    assert(got.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() === 0L)
  }
}
