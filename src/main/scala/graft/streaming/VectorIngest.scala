package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.similarity.Ann

/** Streaming VECTOR ingest — the continuous-ingestion face of the IVF
  * similarity index (the embedding analog of [[IncrementalNearDup]]):
  * each micro-batch of (vec_id, embedding) rows is assigned to its
  * nearest cell of a TRAINED codebook ([[Ann.assignCells]], the q33
  * partitioning pass) and appended to an on-disk index laid out
  * `PARTITIONED BY (cell)` — so the index grows per batch without ever
  * touching standing data, and a search opens only the probed cells'
  * directories.
  *
  * The codebook is trained OFFLINE (the standard IVF practice — cell
  * geometry must stay fixed while the index accumulates, else old
  * assignments go stale; retraining is a rebuild, not an ingest).
  *
  * Scale shape: the assignment pass is a broadcast of k centroids onto
  * a map-side argmax (no vector shuffle); the append writes each
  * vector once under its cell directory. The search side
  * ([[searchIndex]]) reuses the exact q33 operator over the read-back
  * index, and the cell equi-join against the broadcast probe list
  * prunes the partitioned scan to the probed cells (the q84 DPP
  * machinery — at 100 TB a nprobe=8 query over k=4096 cells opens
  * 0.2% of the index files).
  */
object VectorIngest {

  /** Assign one batch to cells and append it to the index. */
  private[streaming] def ingestBatch(batch: DataFrame, centroids: DataFrame,
                                     indexDir: String): Unit =
    Ann.assignCells(batch, centroids)
      .select(col("vec_id"), col("nv"), col("nn"), col("cell"))
      .write.mode("append").partitionBy("cell").parquet(indexDir)

  /** Run the ingest over a streaming (vec_id, embedding) source. */
  def run(vectors: DataFrame, centroids: DataFrame, indexDir: String,
          checkpointDir: String): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, centroids, indexDir)
      }
      .start()

  /** kNN over the accumulated on-disk index — literally the q33 search
    * ([[Ann.ivfKnnAssigned]]) with the assignment read back from the
    * cell-partitioned layout. */
  def searchIndex(spark: SparkSession, indexDir: String, queries: DataFrame,
                  centroids: DataFrame, k: Int, nprobe: Int): DataFrame =
    Ann.ivfKnnAssigned(
      spark.read.parquet(indexDir)
        .select(col("vec_id"), col("nv"), col("nn"), col("cell")),
      queries, centroids, k, nprobe)
}
