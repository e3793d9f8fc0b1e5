package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Custom streaming state via `flatMapGroupsWithState`: the stateful face
  * of the reference driver's counters (`/root/reference/uav/main.py:90-91,
  * 117,141` — total frames, keyframes) plus its dropped-frame failure mode
  * (`frame_reader.py:184-190`), maintained per key across micro-batches.
  *
  * State per key is O(1) (three longs), so a million sources cost a few
  * MB of state store — the shape that scales on an unbounded stream where
  * a global recount per batch would not.
  */
object StatefulMonitor {

  final case class EventIn(user_id: Long, event_id: Long)
  final case class MonitorState(nSeen: Long, nKeyframes: Long, maxId: Long)
  final case class MonitorOut(user_id: Long, n_seen: Long, n_keyframes: Long, max_id: Long)

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def update(key: Long, rows: Iterator[EventIn],
                     state: GroupState[MonitorState]): Iterator[MonitorOut] = {
    var s = state.getOption.getOrElse(MonitorState(0L, 0L, -1L))
    rows.foreach { r =>
      s = MonitorState(
        s.nSeen + 1,
        s.nKeyframes + (if (r.event_id % 30 == 0) 1 else 0),
        math.max(s.maxId, r.event_id))
    }
    state.update(s)
    Iterator.single(MonitorOut(key, s.nSeen, s.nKeyframes, s.maxId))
  }

  /** Runs the per-user monitor over the bounded events stream to
    * completion; returns the final per-user counters. */
  def perUserCounters(spark: SparkSession, sfDir: String): Dataset[MonitorOut] = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .select(col("user_id"), col("event_id"))
      .as[EventIn]

    val monitored = stream
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)

    val sink = "monitor_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = monitored.writeStream.outputMode("update").format("memory").queryName(sink).start()
    try q.processAllAvailable()
    finally q.stop()

    // update-mode memory sink appends one row per key per batch; the last
    // row per key is the final state
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("n_seen").desc)
    spark.table(sink)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .as[MonitorOut]
  }
}
