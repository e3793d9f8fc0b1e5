package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

/** The versioned-state ledger's long-running-deploy bound (r16, VERDICT
  * r15 item 7): once more than KeepMarkers tombstones accrue, the old
  * ones compact into a single high-water-mark marker — constant disk
  * and listing cost — while every exactly-once guarantee (explicit or
  * compacted membership, orphan invisibility) survives the fold.
  */
class VersionedStateSpec extends SparkSpec {

  private def freshDir(): String = {
    val root = Files.createTempDirectory("graft-vstate-spec-")
    graft.TempDirs.cleanupOnExit(root)
    root.toString + "/state"
  }

  private def commitBatch(dir: String, id: Long): Unit = {
    // an engine writes contents first, then commits — emulate the
    // contract with a one-file payload per version
    val v = new java.io.File(s"$dir/v$id")
    v.mkdirs()
    Files.writeString(new java.io.File(v, "payload").toPath, s"state-$id")
    VersionedState.commitAndPrune(spark, dir, id,
      VersionedState.committed(spark, dir))
  }

  test("tombstones compact into the high-water mark; the ledger stays constant-sized") {
    val dir = freshDir()
    val n = VersionedState.KeepMarkers + 8
    (0L until n.toLong).foreach(commitBatch(dir, _))
    val markers = VersionedState.committed(spark, dir)
    assert(markers.size <= VersionedState.KeepMarkers,
      s"explicit tombstones must cap at KeepMarkers, got ${markers.size}")
    assert(markers.last === n - 1L, "the newest version stays explicit")
    val hwm = VersionedState.highWaterMark(spark, dir)
    assert(hwm >= 0L && hwm === markers.min - 1L,
      "the hwm must abut the oldest surviving explicit marker")
    // every id ever committed still answers committed — compacted ids
    // via the hwm, recent ids via their marker
    (0L until n.toLong).foreach { id =>
      assert(VersionedState.isCommitted(spark, dir, id, markers),
        s"batch $id must stay committed after compaction")
    }
    assert(!VersionedState.isCommitted(spark, dir, n.toLong, markers),
      "an un-run batch id must not be committed")
    // compacted version dirs are GONE (not just emptied); at most one
    // hwm file remains
    val names = new java.io.File(dir).listFiles().map(_.getName).toSeq
    assert(names.count(_.startsWith("hwm_")) === 1)
    assert(!names.contains("v0") && !names.contains(s"v$hwm"))
    // only the newest version retains contents (the standing state)
    val withPayload = markers.filter(v =>
      new java.io.File(s"$dir/v$v/payload").exists())
    assert(withPayload === Seq(markers.last),
      "exactly the newest committed version keeps its contents")
  }

  test("an uncommitted orphan stays invisible before and after compaction") {
    val dir = freshDir()
    (0L until (VersionedState.KeepMarkers + 4).toLong).foreach(commitBatch(dir, _))
    // a crash mid-write: contents exist, marker never created
    val orphanId = 999L
    new java.io.File(s"$dir/v$orphanId").mkdirs()
    Files.writeString(new java.io.File(s"$dir/v$orphanId/payload").toPath, "x")
    val markers = VersionedState.committed(spark, dir)
    assert(!markers.contains(orphanId))
    assert(!VersionedState.isCommitted(spark, dir, orphanId, markers))
  }

  test("re-commit of a compacted batch id is a no-op for the engines") {
    val dir = freshDir()
    val n = (VersionedState.KeepMarkers + 8).toLong
    (0L until n).foreach(commitBatch(dir, _))
    // both engines gate on isCommitted before doing ANY work — a late
    // re-delivery of batch 0 (compacted away) must read as committed
    val markers = VersionedState.committed(spark, dir)
    assert(VersionedState.isCommitted(spark, dir, 0L, markers))
    // and the standing-state resolver is unaffected by the fold
    assert(markers.lastOption === Some(n - 1L))
  }
}
