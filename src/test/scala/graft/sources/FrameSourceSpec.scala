package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FrameSourceSpec extends SparkSpec {
  import spark.implicits._

  private def frames(n: Int) =
    spark.read.format("graft-frames")
      .option("frames", n).option("numPartitions", 4).load()

  test("generates the full deterministic frame range across partitions") {
    val df = frames(1001)
    assert(df.count() === 1001L)
    val ids = df.select("frame_number").as[Long].collect().sorted
    assert(ids.toSeq === (0L until 1001L))
    // payload deterministic
    val p = df.filter(col("frame_number") === 7).select("payload")
      .as[Array[Byte]].head()
    assert(p.toSeq === graft.sources.v2.FrameSource.payloadFor(7L).toSeq)
  }

  test("column pruning reaches the connector (payload never generated)") {
    val pruned = frames(100).select("frame_number", "width")
    val desc = pruned.queryExecution.executedPlan.toString
    assert(desc.contains("cols=frame_number,width"), desc.linesIterator.take(5).mkString("\n"))
  }

  test("streaming face: checkpointed restart resumes without replaying frames") {
    import java.nio.file.Files
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val out = Files.createTempDirectory("graft_stream_out").toString
    def start() = spark.readStream.format("graft-frames")
      .option("frames", 2000).option("ratePerBatch", 300).option("numPartitions", 2)
      .load().select("frame_number")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    // first run: a couple of batches, then stop mid-stream
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    // second run from the same checkpoint must not duplicate anything
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val got = spark.read.parquet(out).select("frame_number").as[Long].collect().sorted
    assert(got.length === 2000, s"got ${got.length} rows — restart replayed or lost frames")
    assert(got.toSeq === (0L until 2000L))
  }

  test("streaming face: Trigger.AvailableNow drains every frame in one run") {
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = Files.createTempDirectory("graft_an_ckpt").toString
    val out = Files.createTempDirectory("graft_an_out").toString
    val q = spark.readStream.format("graft-frames")
      .option("frames", 1500).option("ratePerBatch", 400).option("numPartitions", 2)
      .load().select("frame_number")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.read.parquet(out).count() === 1500L)
  }

  test("frame_number range predicates push into the scan bounds") {
    val df = frames(10000)
      .filter(col("frame_number") >= 100 && col("frame_number") < 200)
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("[100, 200)"), desc.linesIterator.take(5).mkString("\n"))
    assert(df.count() === 100L)
  }
}
