package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.MisraGries

/** Streaming heavy hitters — the continuous face of the q107 two-pass
  * operator: a STANDING Misra–Gries summary is maintained across
  * micro-batches, so "what's trending over everything ever ingested" is
  * answerable at any moment from k−1 rows of state.
  *
  * Per micro-batch: the batch's tokens reduce to a batch-local MG sketch
  * (the same typed partial aggregate as q107 — each map task ships
  * ≤ k−1 counters), the batch sketch merges into the standing sketch
  * with the value-based mergeable-summaries rule, and the merged summary
  * overwrites the state table. The merge runs driver-side ON THE TWO
  * SUMMARIES (≤ 2(k−1) rows by construction — summary-sized, not
  * data-sized; the same stance as the q104 τ row or the q102 range row).
  *
  * Guarantee carried across batches (Agarwal et al., PODS 2012): after
  * any number of merges, every token whose TOTAL stream frequency
  * exceeds n/k retains a positive counter, and no counter overestimates.
  * Unlike q107, a streaming report cannot re-scan history for the exact
  * second pass — the summary (candidates + total) IS the deliverable,
  * and a consumer wanting exact counts runs the q107 exact pass over
  * the candidates against whatever history it retains.
  *
  * State layout at `sketchDir`: `sketch/` (tok, c) and `total/` (n) —
  * overwritten per batch; both tiny. Delivery: overwrite-per-batch makes
  * a micro-batch RETRY idempotent only if the retry re-reads the same
  * pre-batch state; the bounded harness runs never retry (same
  * at-least-once stance as [[IncrementalNearDup]], which documents the
  * batch-keyed exactly-once form).
  */
object StreamingHeavyHitters {

  val K = 16

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Fold ONE micro-batch of (doc_id, text) into the standing sketch.
    * Package-visible so the spec drives it directly (the same contract
    * as [[IncrementalNearDup.processBatch]]). */
  private[streaming] def processBatch(batch: DataFrame, sketchDir: String): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val agg = new MisraGries(K)
    val mg = udaf(agg)
    val toks = batch.select(explode(split(col("text"), " ")).as("tok"))
    // distributed reduction to ONE summary row; collect is summary-sized
    val batchSketch: Map[String, Long] =
      toks.agg(mg(col("tok")).as("sk")).as[Map[String, Long]].head()
    val batchN = toks.count()

    val (standing, standingN) =
      if (exists(spark, s"$sketchDir/sketch")) {
        val s = spark.read.parquet(s"$sketchDir/sketch")
          .as[(String, Long)].collect().toMap
        val n = spark.read.parquet(s"$sketchDir/total").as[Long].head()
        (s, n)
      } else (Map.empty[String, Long], 0L)

    val merged = agg.merge(standing, batchSketch)
    merged.toSeq.toDF("tok", "c").coalesce(1)
      .write.mode("overwrite").parquet(s"$sketchDir/sketch")
    Seq(standingN + batchN).toDF("n").coalesce(1)
      .write.mode("overwrite").parquet(s"$sketchDir/total")
  }

  /** The standing report: candidate tokens with their (under-estimating)
    * counters and the stream total — every true heavy hitter (freq >
    * n/K) is guaranteed present. */
  def report(spark: SparkSession, sketchDir: String): DataFrame = {
    val sketch = spark.read.parquet(s"$sketchDir/sketch")
    val total = spark.read.parquet(s"$sketchDir/total")
    sketch.crossJoin(broadcast(total))
      .select(col("tok"), col("c"), col("n"))
      .orderBy(col("c").desc, col("tok"))
  }

  /** Unbounded form: a files-source document stream folded batch-by-batch
    * ([[processBatch]]) via foreachBatch. */
  def run(spark: SparkSession, inputDir: String, sketchDir: String,
          checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, _: Long) => processBatch(b, sketchDir) }
      .start()
  }
}
