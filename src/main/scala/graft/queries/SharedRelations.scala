package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.RowIds

/** Compute-once dense-id relations shared across queries (VERDICT r3
  * item 1).
  *
  * Five queries (q01, q09, q10, q15, q24) need a dense positional id over
  * the same total order — q01 over lineitem's 4-column key, the rest over
  * events by event_id. Each [[RowIds.withDenseId]] pass is a full
  * range-partition + distributed sort of the table; rebuilding it per
  * query (per bench rep) made q09/q10 the two slowest queries in round 3
  * once persist lifetimes became honest. The sort is rebuilt here ONCE
  * per (session, dir) as an explicit [[graft.Caches.sharedRelation]] —
  * the same pattern as the dedup trio — and its cost is charged to the
  * timed `shared_build` bench step, not hidden in whichever query runs
  * first.
  *
  * At the 100 TB lens this is the materialized "stream order" relation a
  * real deployment would compute once per ingest batch and reuse for
  * every positional consumer (progress ticks, segmentation, reassembly)
  * instead of re-sorting 100 TB five times.
  */
object SharedRelations {

  /** events (event_id, event_type) + dense 0-based `__id` in event_id
    * order. Columns are the union of what the positional consumers
    * project (q09/q10/q15 read event_id, q24 also event_type). */
  def eventsDense(s: SparkSession, d: String): DataFrame =
    graft.Caches.sharedRelation(s, d, "events_dense") {
      RowIds.withDenseId(
        Tables.events(s, d).select("event_id", "event_type"),
        Seq(col("event_id")), "__id")
    }

  /** lineitem's q01 projection + dense `frame_number` over the 4-column
    * total order (the reference's positional frame counter on the big
    * fact table). */
  def lineitemDense(s: SparkSession, d: String): DataFrame =
    graft.Caches.sharedRelation(s, d, "lineitem_dense") {
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      RowIds.withDenseId(li,
        Seq(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey")),
        "frame_number")
    }

  /** Materializes both dense-id relations (Bench/ScaleProbe time this
    * together with the dedup trio as `shared_build`). */
  def warm(s: SparkSession, d: String): Unit = {
    eventsDense(s, d).count()
    lineitemDense(s, d).count()
    ()
  }
}
