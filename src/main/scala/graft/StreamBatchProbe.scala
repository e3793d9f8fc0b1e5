package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import scala.collection.mutable.ArrayBuffer

/** Per-batch wall-time probe for the micro-batch replay engines
  * (VERDICT r12 item 5): the five transformWithState / stateful replay
  * faces (q207 kappa seam, q208 vector ingest, q209 curation funnel,
  * q212 MapState, q213 ListState) claim "per-batch fixed cost, constant
  * in data scale" — a claim inherited from r5's StreamPartProbe but
  * never MEASURED for this family. State-store commit cost scales with
  * stores × partitions × batches, not rows, and that should be shown,
  * not asserted.
  *
  * A [[StreamingQueryListener]] captures every micro-batch's
  * triggerExecution duration and input-row count while the gate query
  * runs unmodified; run against the sf dir and its 10× replica
  * (tools/make_scale_data.py) and compare per-batch times — if the
  * claim holds, batch count is constant and per-batch time grows far
  * slower than 10×.
  *
  * Run: sbt "runMain graft.StreamBatchProbe <dir> [q1,q2,...]". */
object StreamBatchProbe {
  private val DefaultNames = Seq(
    "q207_kappa_replay", "q208_vector_ingest_replay",
    "q209_curation_replay", "q212_mapstate_profile",
    "q213_liststate_recent")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names =
      if (args.length > 1) args(1).split(",").toSeq else DefaultNames
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").count() // warm-up

    // (batchId, inputRows, triggerExecutionMs) per progress event; the
    // buffer is drained between queries so each probe row is one face's
    // batches. Listener delivery is async — the post-query sleep lets
    // the final batch's event land before the drain.
    val batches = ArrayBuffer[(Long, Long, Long)]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        batches.synchronized {
          val p = e.progress
          batches += ((p.batchId, p.numInputRows,
            Option(p.durationMs.get("triggerExecution"))
              .map(_.longValue).getOrElse(-1L)))
        }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    for (n <- names) {
      batches.synchronized(batches.clear())
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, dir).count()
      val totalSec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // let trailing listener events land
      val b = batches.synchronized(batches.toList)
      val detail = b.sortBy(_._1)
        .map { case (id, in, ms) => s"b$id:${in}rows/${ms}ms" }
        .mkString(" ")
      val batchSum = b.map(_._3).filter(_ >= 0).sum
      println(f"[sprobe] $n%-26s total=$totalSec%7.2fs rows=$rows%8d " +
        f"batches=${b.size}%2d batch_ms_sum=$batchSum%6d  $detail")
      Caches.releaseScoped()
    }
    Caches.releaseShared()
    spark.stop()
  }
}
