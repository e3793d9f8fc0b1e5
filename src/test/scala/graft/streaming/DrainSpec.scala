package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class DrainSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType)))

  test("drainToFiles on a stream with zero batches returns an empty frame, not a crash") {
    val empty = Files.createTempDirectory("graft_drain_empty").toString
    val stream = spark.readStream.schema(schema).parquet(empty)
    val got = EventStreams.drainToFiles(stream, "append")
    assert(got.count() === 0L)
    assert(got.columns.toSeq === Seq("id", "v"), "schema survives the empty path")
  }

  test("append drain accumulates batches; complete drain keeps the last full result") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_drain_rows").toString + "/data"
    (0L until 100L).map(i => (i, i * 0.5)).toDF("id", "v")
      .write.parquet(dir)
    val src = spark.readStream.schema(schema).parquet(dir)

    val appended = EventStreams.drainToFiles(src.filter(col("id") % 2 === 0), "append")
    assert(appended.count() === 50L)

    val agg = src.groupBy(lit(1).as("k")).agg(count(lit(1)).as("n"))
    val completed = EventStreams.drainToFiles(agg, "complete")
    assert(completed.select("n").as[Long].collect().toSeq === Seq(100L))
  }
}
