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

  test("frame_number range predicates push into the scan bounds") {
    val df = frames(10000)
      .filter(col("frame_number") >= 100 && col("frame_number") < 200)
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("[100, 200)"), desc.linesIterator.take(5).mkString("\n"))
    assert(df.count() === 100L)
  }
}
