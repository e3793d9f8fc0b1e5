package graft

import org.apache.spark.sql.SparkSession

/** Measurement behind `EventStreams.StreamShufflePartitions`: per-stream-
  * query cost vs state-partition count. The drain pins every stream's
  * width to that var, so the sweep SETS it per value (setting only the
  * session conf would be silently overridden at stream start and every
  * row would measure the same width).
  *
  * Usage: runMain graft.StreamPartProbe <sfDir> <parts,parts,...>
  */
object StreamPartProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val parts = (if (args.length > 1) args(1) else "32,8").split(",").map(_.toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val streaming = Seq("q71_stream_stream_join", "q25_streaming_tumbling",
      "q61_watermarked_tumbling", "q62_stream_dedup", "q63_stateful_monitor",
      "q65_streaming_sessions", "q58_stream_static_join", "q55_frame_stream")
    try for (p <- parts) {
      graft.streaming.EventStreams.StreamShufflePartitions = p
      for (q <- streaming) {
        def rep(): Double = {
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, sfDir).count()
          Caches.releaseScoped()
          (System.nanoTime() - t0) / 1e9
        }
        rep() // untimed warm rep: stream-source init, footers, codegen
        val times = (1 to 3).map(_ => rep()).sorted
        println(f"parts=$p%-3d $q%-28s median=${times(1)}%.2f (${times.head}%.2f-${times.last}%.2f)")
      }
    } finally graft.streaming.EventStreams.resetStreamShufflePartitions()
    spark.stop()
  }
}
