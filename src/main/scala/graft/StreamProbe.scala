package graft

import org.apache.spark.sql.SparkSession

/** Streaming scale probe (VERDICT r3 item 7): runs each streaming query
  * against an arbitrary data directory and reports, from the engine's own
  * progress metrics, the observables that decide whether the design
  * scales — micro-batch count, PEAK stateful-operator state rows, and
  * watermark drops — alongside elapsed time and result rows.
  *
  * The claim under test at 10×: state is bounded by the WATERMARK
  * HORIZON (q61/q65: windows/sessions still open within the delay;
  * q62: keys inside the dedup horizon), or by the key domain (q25
  * complete-mode minutes, q58 segments, q63 users) — never by total
  * rows ever seen. A probe run at 1× vs 10× makes the growth visible.
  *
  * Run: sbt "runMain graft.StreamProbe <dir> [q,q,...]". */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("q25_streaming_tumbling", "q55_frame_stream",
        "q58_stream_static_join", "q61_watermarked_tumbling",
        "q62_stream_dedup", "q63_stateful_monitor", "q65_streaming_sessions",
        "q71_stream_stream_join")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").count() // warm-up
    println(f"[sprobe] ${"query"}%-26s ${"sec"}%8s ${"rows"}%10s ${"batches"}%8s ${"stateMax"}%9s ${"stateEnd"}%9s ${"dropped"}%8s")
    for (n <- names) {
      graft.streaming.EventStreams.lastRunStats = None
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val st = graft.streaming.EventStreams.lastRunStats
      println(f"[sprobe] $n%-26s $sec%8.2f $rows%10d " +
        f"${st.map(_.batches).getOrElse(-1)}%8d " +
        f"${st.map(_.stateRowsMax).getOrElse(-1L)}%9d " +
        f"${st.map(_.stateRowsEnd).getOrElse(-1L)}%9d " +
        f"${st.map(_.dropped).getOrElse(-1L)}%8d")
      Caches.releaseScoped()
    }
    Caches.releaseShared()
    spark.stop()
  }
}
