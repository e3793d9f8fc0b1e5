package graft.streaming

import org.apache.spark.sql.SparkSession

/** The versioned exactly-once on-disk state layout shared by the
  * standing-index engines ([[StreamingHeavyHitters]] since r10,
  * [[StreamingLineDedup]] in r15): state lives in version dirs
  * `v{batchId}/` whose contents are whatever the engine writes, made
  * visible by a `COMMITTED` marker created LAST — marker creation is the
  * one atomic step, so a crash mid-write leaves an uncommitted version
  * every reader ignores while the previous committed version stays
  * intact. Keying versions by micro-batch id upgrades delivery to
  * EXACTLY-ONCE under retry: a re-delivered batch finds its own version
  * committed and no-ops. Committed predecessors are pruned best-effort
  * after each commit, so on-disk state is ≤ 2 versions of the index.
  */
private[graft] object VersionedState {

  def fs(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Ascending batch ids whose version dirs carry the COMMITTED marker. */
  def committed(spark: SparkSession, stateDir: String): Seq[Long] = {
    val dir = new org.apache.hadoop.fs.Path(stateDir)
    val f = fs(spark, stateDir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v"))
      .map(_.getPath)
      .filter(p => f.exists(new org.apache.hadoop.fs.Path(p, "COMMITTED")))
      .map(_.getName.drop(1).toLong)
      .sorted
  }

  /** The commit point: atomic zero-byte marker create — everything
    * before it is invisible to readers, everything after it is durable.
    * Then best-effort prune of committed predecessors (a failure here
    * costs disk, never correctness — readers always take the max).
    *
    * Pruning deletes a predecessor's CONTENTS but keeps its COMMITTED
    * marker: the marker list is the exactly-once ledger, and erasing it
    * would make a late re-delivery of an OLD batch look new and fold
    * twice (and engines with permanent per-batch outputs, q246's
    * ledger, would forget which outputs exist). Markers are zero-byte —
    * the disk bound stays one full version plus empty tombstones. */
  def commitAndPrune(spark: SparkSession, stateDir: String,
                     batchId: Long, predecessors: Seq[Long]): Unit = {
    val f = fs(spark, stateDir)
    f.create(new org.apache.hadoop.fs.Path(s"$stateDir/v$batchId", "COMMITTED"),
      false).close()
    predecessors.filter(_ < batchId).foreach { v =>
      try f.listStatus(new org.apache.hadoop.fs.Path(s"$stateDir/v$v")).toSeq
        .filter(_.getPath.getName != "COMMITTED")
        .foreach(st => f.delete(st.getPath, true))
      catch { case _: java.io.IOException => }
    }
  }
}
