package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, Tables}

class FanOutSpec extends SparkSpec {

  test("two-sink fan-out: sink A gets every record, sink B every 30th") {
    val out = Files.createTempDirectory("graft_fanout").toString
    val (allRows, sampledRows) = FanOutPipeline.run(spark, sf0001, out, 30)
    val total = Tables.events(spark, sf0001).count()
    assert(allRows === total)
    assert(sampledRows === (total + 29) / 30)
    // payload is well-formed JSON with the sent fields
    val payload = spark.read.parquet(s"$out/sampled")
      .selectExpr("get_json_object(payload, '$.event_id')").first().getString(0)
    assert(payload != null)
  }
}
