package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-user RECENT-ITEMS feature on Spark 4's arbitrary-state API, the
  * LIST-typed slot — closing out the repo's oracle-gated coverage of
  * every state primitive the new `StatefulProcessor` model offers:
  * ValueState (q196 quota), event-time timers (q205 sessions), MapState
  * (q212 profile), and now ListState (q213) — the slot a feature store
  * uses for "last-N items per user", the canonical recommendation
  * feature.
  *
  * The state is the user's last [[Keep]] event types in event_id order
  * (a bounded ring: each batch appends its slice then `put`s back only
  * the tail, so state never grows past Keep entries per user — the
  * honest bound a deployed recent-items store carries). Emission per
  * batch is the user's running (n_seen, recent_path); n_seen is
  * monotone, so the drain reduces by max (the q207/q212 rule).
  *
  * Ordered-log assumption: batches arrive in event_id order (the
  * replay stages event_id-RANGE chunks — unlike q207/q212's
  * ts-parity split, a recent-items list is ORDER-dependent, so the
  * batch boundary must respect the log order; within a batch the slice
  * is sorted, the q196 rule).
  */
object ListStateRecent {

  /** Ring size — last 3 items, the q200 path width. */
  val Keep = 3

  final case class EventIn(user_id: Long, event_id: Long, event_type: String)
  final case class RecentOut(user_id: Long, n_seen: Long, recent_path: String)

  class RecentProcessor extends StatefulProcessor[Long, EventIn, RecentOut] {
    @transient private var recent: ListState[String] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      recent = getHandle.getListState[String]("recent", Encoders.STRING,
        TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
        timerValues: TimerValues): Iterator[RecentOut] = {
      val sorted = rows.toArray.sortBy(_.event_id)
      val tail = (recent.get().toArray ++ sorted.map(_.event_type))
        .takeRight(Keep)
      recent.put(tail)
      val n = (if (seen.exists()) seen.get() else 0L) + sorted.length
      seen.update(n)
      Iterator.single(RecentOut(key, n, tail.mkString(">")))
    }
  }

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Apply the recent-items processor to a (possibly streaming) typed
    * source. Shared by the gate face and the spec. */
  def tracked(spark: SparkSession, events: Dataset[EventIn]): DataFrame = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RecentProcessor, TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  /** q213: the events log replayed as TWO real micro-batches staged as
    * event_id-RANGE chunks (order-preserving — see the class doc), the
    * final per-user (n_seen, recent_path) hash-matched against the
    * one-shot batch truth (last Keep event types by event_id). */
  def recentReplay(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-liststate-")
    graft.TempDirs.cleanupOnExit(root)
    val in = s"$root/in"; val ck = s"$root/ck"; val out = s"$root/out"
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"))
    val cut = ev.agg(expr("CAST(max(event_id) div 2 AS BIGINT)"))
      .as[Long].head()
    ev.filter(col("event_id") <= cut).coalesce(1).write.parquet(s"$in/chunk0")
    ev.filter(col("event_id") > cut).coalesce(1).write.parquet(s"$in/chunk1")
    // ordered-log pin (r13, VERDICT r12 item 4 / ADVICE r12): the file
    // source triggers files oldest-mtime-first, and ListState is the one
    // state primitive whose result is ORDER-dependent — so the chunk
    // order must not rest on "chunk0 happened to be written seconds
    // before chunk1". Stamp strictly increasing mtimes (60 s apart — far
    // beyond any filesystem's timestamp granularity) on every file of
    // each staged chunk, making batch 0 = low event_id range structural.
    def pinMtime(dir: String, t: Long): Unit = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try s.forEach { f =>
        java.nio.file.Files.setLastModifiedTime(f,
          java.nio.file.attribute.FileTime.fromMillis(t))
      } finally s.close()
    }
    val now = System.currentTimeMillis()
    pinMtime(s"$in/chunk0", now - 120000L)
    pinMtime(s"$in/chunk1", now - 60000L)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$in/*").as[EventIn]

    val prev = spark.conf.getOption(ProviderKey)
    try {
      spark.conf.set(ProviderKey, RocksDbProvider)
      // r18 (VERDICT r17 item 3): derived state width — each partition
      // is a per-micro-batch RocksDB commit, so session batch width
      // (32 at driver settings) is pure fixed cost here.
      EventStreams.withStreamWidth(src.toDF()) {
        val q = tracked(spark, src).writeStream
          .outputMode(OutputMode.Append())
          .option("checkpointLocation", ck)
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.write.mode("append").parquet(out)
            ()
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
    // chunk order: the file source triggers files in modification-time
    // order and the staged chunks carry EXPLICITLY pinned, strictly
    // increasing mtimes (see pinMtime above), so batch 0 is the low
    // event_id range by construction — the ordered-log arrival the ring
    // semantics need; the spec asserts the end state against a hand
    // truth independent of this listing detail
    spark.read.parquet(out)
      .groupBy("user_id")
      .agg(max(struct(col("n_seen"), col("recent_path"))).as("s"))
      .select(col("user_id"), col("s.n_seen").as("n_seen"),
        col("s.recent_path").as("recent_path"))
      .orderBy("user_id")
  }
}
