package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Checkpoint-restart recovery for TWO-SIDED stream state (VERDICT r6
  * item 5): CheckpointRecoverySpec proves a watermarked aggregate's
  * single state store restores; q71's stream-stream interval join keeps
  * keyed buffers on BOTH sides. This stops the join mid-stream and
  * restarts it on the same checkpoint with more input on each side:
  *
  *  - both sides' buffered state must restore (a phase-A purchase can
  *    only pair with a phase-B error if the purchase-side buffer
  *    survived the restart — those cross-boundary pairs are asserted
  *    present explicitly),
  *  - both sources must resume from committed offsets (re-reading either
  *    side would duplicate every already-matched pair),
  *  - the file sink must stay exactly-once across the restart.
  *
  * Final readback == the batch twin join over all events, as sets with
  * multiplicity — loss on any axis shrinks it, replay grows it. Runs
  * through [[StreamStreamJoin.pairStreams]], the same construction q71
  * executes.
  */
class StreamStreamRecoverySpec extends SparkSpec {

  private val pSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("purchase_id", LongType),
    StructField("p_ts", TimestampType)))
  private val eSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("error_id", LongType),
    StructField("e_ts", TimestampType)))

  private def writeSlice(in: Path, schema: StructType, name: String,
                         modMs: Long, rows: Seq[Row]): Unit = {
    val tmp = Files.createTempDirectory("graft_ssj_slice")
    graft.TempDirs.cleanupOnExit(tmp)
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString + "/p")
    val listing = Files.list(Paths.get(tmp.toString, "p"))
    val part =
      try listing.toArray.map(_.asInstanceOf[Path])
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(fail(s"no part file written for slice $name"))
      finally listing.close()
    val dest = in.resolve(s"$name.parquet")
    Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(dest, FileTime.fromMillis(modMs))
  }

  test("stop the interval join mid-stream, restart: both sides' state restores, offsets resume, sink exactly-once") {
    val root = Files.createTempDirectory("graft_ssj_ckpt")
    graft.TempDirs.cleanupOnExit(root)
    val pin = Files.createDirectories(root.resolve("purchases"))
    val ein = Files.createDirectories(root.resolve("errors"))
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString

    // real fixture rows: purchases and errors of sf0.001 events, sorted
    // by time. The cut time T is derived from an ACTUAL matched pair
    // whose error trails its purchase: splitting both sides at a T
    // strictly between that pair's p_ts and e_ts guarantees >= 1
    // cross-boundary pair (phase-A purchase ⋈ phase-B error), so the
    // purchase-side buffer restore is exercised by construction — an
    // arbitrary percentage cut leaves that to luck (~207 pairs over a
    // month; a 6 h boundary window expects < 2 straddlers).
    val ev = graft.Tables.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .orderBy("p_ts").collect().toSeq
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"), col("ts").as("e_ts"))
      .orderBy("e_ts").collect().toSeq
    val batchPairs = {
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      val e = ev.filter(col("event_type") === "error")
        .select(col("user_id").as("eu"), col("event_id").as("error_id"), col("ts").as("e_ts"))
      p.join(e, col("user_id") === col("eu") &&
          col("e_ts") >= col("p_ts") &&
          col("e_ts") <= col("p_ts") + expr("interval 6 hours"))
        .select(col("purchase_id"), col("error_id"),
          col("p_ts"), col("e_ts"))
        .collect().toSeq
    }
    val straddleCandidates = batchPairs
      .filter(r => r.getTimestamp(3).getTime > r.getTimestamp(2).getTime + 60000L)
      .sortBy(_.getTimestamp(2).getTime)
    assert(straddleCandidates.nonEmpty, "fixture has no pair with a trailing error")
    val mid = straddleCandidates(straddleCandidates.length / 2)
    val cutMs = (mid.getTimestamp(2).getTime + mid.getTimestamp(3).getTime) / 2
    val (pa, pb) = purchases.partition(_.getTimestamp(2).getTime <= cutMs)
    val (ea, eb) = errors.partition(_.getTimestamp(2).getTime <= cutMs)
    assert(pa.nonEmpty && pb.nonEmpty && ea.nonEmpty && eb.nonEmpty)

    val base = System.currentTimeMillis() - 3600000L
    writeSlice(pin, pSchema, "sliceA", base, pa)
    writeSlice(ein, eSchema, "sliceA", base, ea)

    def startQuery(): StreamingQuery = {
      def side(dir: Path, schema: StructType) = spark.readStream
        .schema(schema).option("maxFilesPerTrigger", "1").parquet(dir.toString)
      val p = side(pin, pSchema)
      val e = side(ein, eSchema)
        .select(col("user_id").as("e_user_id"), col("error_id"), col("e_ts"))
      StreamStreamJoin.pairStreams(p, e)
        .writeStream.outputMode("append").format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    }

    val outSchema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("purchase_id", LongType),
      StructField("error_id", LongType),
      StructField("delta_us", LongType)))

    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    val afterA = spark.read.schema(outSchema).parquet(out).count()

    writeSlice(pin, pSchema, "sliceB", base + 60000L, pb)
    writeSlice(ein, eSchema, "sliceB", base + 60000L, eb)
    val q2 = startQuery()
    val phaseBInputRows =
      try {
        q2.processAllAvailable()
        q2.recentProgress.map(_.numInputRows).sum
      } finally q2.stop()

    // offsets resumed on BOTH sources: the restarted query ingested only
    // the two phase-B files' rows (a lost offset on either side would
    // re-read its phase-A slice too)
    assert(phaseBInputRows == pb.length + eb.length,
      s"restart must resume both sides from committed offsets: ingested $phaseBInputRows, " +
        s"expected ${pb.length} purchases + ${eb.length} errors")

    val got = spark.read.schema(outSchema).parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val want = {
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      val e = ev.filter(col("event_type") === "error")
        .select(col("user_id").as("eu"), col("event_id").as("error_id"), col("ts").as("e_ts"))
      p.join(e, col("user_id") === col("eu") &&
          col("e_ts") >= col("p_ts") &&
          col("e_ts") <= col("p_ts") + expr("interval 6 hours"))
        .select(col("user_id"), col("purchase_id"), col("error_id"),
          (unix_micros(col("e_ts")) - unix_micros(col("p_ts"))).as("delta_us"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    }

    // the restart must have real work left AND real state to restore:
    // phase A emitted some pairs but not all, and some final pairs CROSS
    // the boundary (phase-A purchase ⋈ phase-B error) — those exist only
    // if the purchase-side buffer survived the restart
    assert(afterA > 0 && afterA < want.length,
      s"phase A must emit some pairs but not all ($afterA of ${want.length})")
    val lastAPurchase = pa.last.getTimestamp(2)
    val firstBError = eb.head.getTimestamp(2)
    val crossBoundary = got.count { case (_, pid, eid, _) =>
      pa.exists(_.getLong(1) == pid) && eb.exists(_.getLong(1) == eid)
    }
    assert(crossBoundary > 0,
      s"no phase-A-purchase x phase-B-error pairs (pa ends $lastAPurchase, eb starts $firstBError) " +
        "- the fixture cut must land inside the 6h horizon or state restore is unproven")

    // exactly-once batch parity, with multiplicity (sorted multiset)
    assert(got.sorted == want.sorted,
      s"restarted join must equal the batch twin (got ${got.length}, want ${want.length})")
  }
}
