package graft

import org.apache.spark.sql.functions._

/** Contract + semantics checks across the whole declared query surface. */
class QueriesSpec extends SparkSpec {
  import spark.implicits._

  test("every oracle key has a query; names are aligned") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query matches its committed golden hash at sf0.001") {
    val props = new java.util.Properties()
    val f = new java.io.File("src/test/resources/goldens.properties")
    assert(f.exists(), "goldens missing — run: sbt \"runMain graft.GoldenGen\"")
    props.load(new java.io.FileReader(f))
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val golden = props.getProperty(name)
      assert(golden != null, s"$name has no golden — regenerate with GoldenGen")
      // release in a finally: a failed assertion must not leak the
      // query's scoped persists into the suites sharing this session
      try assert(GoldenHash.hashDf(fn(spark, sf0001)) === golden, name)
      finally Caches.releaseScoped()
    }
  }

  test("keyframe sampling: count = ceil(n/30) and frame 0 selected") {
    val total = Tables.events(spark, sf0001).count()
    val sampled = SparkEntry.queries("q02_keyframe_sample")(spark, sf0001)
    assert(sampled.count() === (total + 29) / 30)
    assert(sampled.select(min("event_id")).as[Long].head() === 0L)
  }

  test("exact dedup keeps the minimum doc_id per text group") {
    val docs = Seq((5L, "aa bb"), (2L, "aa bb"), (9L, "cc dd"), (7L, "aa bb"))
      .toDF("doc_id", "text").createOrReplaceTempView("dup_docs")
    val got = spark.table("dup_docs")
      .groupBy("text").agg(min("doc_id").as("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(2L, 9L))
  }

  test("union reassembly is lossless: q24 row count equals events count") {
    val n = Tables.events(spark, sf0001).count()
    assert(SparkEntry.queries("q24_union_reassembly")(spark, sf0001).count() === n)
  }

  test("streaming tumbling equals its batch twin (q25 == q14)") {
    val batch = SparkEntry.queries("q14_tumbling_window")(spark, sf0001).collect().toSeq
    val stream = SparkEntry.queries("q25_streaming_tumbling")(spark, sf0001).collect().toSeq
    assert(stream === batch)
  }

  test("multimodal frame sampling: every 2nd frame, counts derived from payload") {
    val frames = SparkEntry.queries("q35_multimodal_frames")(spark, sf0001)
    val perDoc = frames.groupBy("doc_id")
      .agg(count(lit(1)).as("kept"), max("n_bytes").as("nb"))
      .select("kept", "nb").as[(Long, Long)].collect()
    for ((kept, nb) <- perDoc) {
      val nFrames = nb % 16 + 1
      assert(kept === (nFrames + 1) / 2, s"n_bytes=$nb")
    }
  }
}
