package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.EventStreams

/** The events-ts unit contract (the round-8 correctness failure): the
  * generator has shipped `ts` as TIMESTAMP(NANOS) and as
  * TIMESTAMP(MICROS)/NTZ across rounds, so BOTH read paths — batch
  * [[Tables]] and streaming [[EventStreams.eventsStream]] — must probe
  * the footer and normalize to µs TimestampType rather than assume a
  * unit. A hardcoded nanos schema against µs data divides every
  * timestamp by 1000 silently; this pins that both flavors decode to
  * the same instants through both paths. */
class TimestampUnitSpec extends SparkSpec {

  /** Events-shaped rows with known µs instants, written in one of the
    * two physical flavors the generator has produced. */
  private def writeFlavor(dir: String, micros: Seq[Long], asNanosLong: Boolean): Unit = {
    import spark.implicits._
    val base = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, i.toLong % 7, "view", 1.0, "{}")
    }.toDF("event_id", "__us", "user_id", "event_type", "value", "props")
    val df =
      if (asNanosLong)
        // TIMESTAMP(NANOS) reads as LongType under nanosAsLong — an
        // int64 nanos column exercises the identical branch
        base.withColumn("ts", col("__us") * 1000L).drop("__us")
      else
        base.withColumn("ts",
          timestamp_micros(col("__us")).cast(TimestampNTZType)).drop("__us")
    // the generator ships events.parquet as a single FILE (the stream
    // face pathGlobFilters on that name) — write to a scratch dir and
    // move the one part file into place
    val scratch = s"$dir/__scratch"
    df.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(fail(s"no part file under $scratch"))
    Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private val instants = Seq(
    1704067200000000L,              // 2024-01-01T00:00:00Z
    1704067200000000L + 1L,         // +1 µs: truncation-sensitive
    1706742000123456L)              // arbitrary mid-range µs value

  test("batch path: nanos-long and µs-NTZ flavors decode to identical TimestampType instants") {
    val results = Seq(true, false).map { nanos =>
      val dir = Files.createTempDirectory(s"graft_tsunit_$nanos").toString
      graft.TempDirs.cleanupOnExit(java.nio.file.Paths.get(dir))
      writeFlavor(dir, instants, asNanosLong = nanos)
      val e = Tables.events(spark, dir)
      assert(e.schema("ts").dataType === TimestampType,
        s"flavor nanos=$nanos must normalize to TimestampType")
      e.orderBy("event_id").select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    }
    assert(results(0) === instants, "nanos flavor decodes the exact µs instants")
    assert(results(1) === instants, "µs-NTZ flavor decodes the exact µs instants")
  }

  test("streaming path: both flavors stream to the same watermarkable instants") {
    Seq(true, false).foreach { nanos =>
      val dir = Files.createTempDirectory(s"graft_tsunit_s_$nanos").toString
      graft.TempDirs.cleanupOnExit(java.nio.file.Paths.get(dir))
      writeFlavor(dir, instants, asNanosLong = nanos)
      val out = EventStreams.drainToFiles(
        EventStreams.eventsStream(spark, dir)
          // a watermark proves the normalized column is event-time-capable
          .withWatermark("ts", "1 minute")
          .select(col("event_id"), unix_micros(col("ts")).as("us")),
        "append")
      val got = out.orderBy("event_id").collect().map(_.getLong(1)).toSeq
      assert(got === instants, s"flavor nanos=$nanos through the stream")
    }
  }
}
