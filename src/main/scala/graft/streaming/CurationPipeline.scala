package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextCuration

/** The CURATION flagship: the text-corpus analog of the video
  * [[graft.FlagshipPipeline]] — one streaming chain composing the
  * oracled curation operators over each micro-batch of raw documents:
  *
  *   1. quality filter  — hashed-BoW linear classifier score
  *      ([[TextCuration.qualityScores]], the q98 operator); docs with
  *      `score <= minScore` drop, the full score report appends to
  *      `outDir/quality`;
  *   2. incremental near-dup — survivors dedup against the STANDING
  *      corpus index ([[IncrementalNearDup.dedupBatch]], the q93
  *      operator): linear in the batch at any corpus size, survivors
  *      join the index so later batches dedup against them;
  *   3. PII scrub + shard export — kept docs redact
  *      ([[TextCuration.scrubPii]], q95) and land in `outDir/shards`
  *      PARTITIONED BY the reproducible shard key (q99's md5 key, the
  *      physical layout a trainer reads).
  *
  * Operator order is the production one: quality first (cheapest, map
  * + partial-agg — drop garbage before paying signature hashes), dedup
  * on ORIGINAL text (redaction must not mask a near-dup), scrub last
  * (only survivors pay the regex pass, and nothing after it sees raw
  * PII).
  *
  * Every stage is the SAME code the batch oracle gate verifies — the
  * pipeline composes operators, it does not re-implement them.
  *
  * Delivery: [[run]] is at-least-once under micro-batch retry (the
  * [[IncrementalNearDup]] stance; a bounded harness run never
  * retries); [[runExactlyOnce]] is the idempotent form — every sink
  * AND the standing index keyed by a `__batch` partition that a replay
  * overwrites.
  */
object CurationPipeline {

  /** Shard fan-out of the export layout. Production uses 1024+; the
    * test corpora are hundreds of docs. */
  val Shards = 8

  /** Per-batch counters, returned so callers (and the spec) can audit
    * the funnel without re-reading sinks. */
  final case class BatchStats(input: Long, qualityDropped: Long,
                              dupDropped: Long, exported: Long)

  /** Run ONE batch of (doc_id, text) through the full chain.
    * Package-visible so the spec drives it directly, like
    * [[IncrementalNearDup.processBatch]]. */
  private[streaming] def processBatch(batch: DataFrame, indexDir: String,
                                      outDir: String,
                                      minScore: Long = 0L): BatchStats = {
    val docs = graft.Caches.scopedPersist(batch.select("doc_id", "text"))
    val input = docs.count()

    // 1. quality: score every doc, keep score > minScore
    val quality = graft.Caches.scopedPersist(
      TextCuration.qualityScores(docs)
        .select(col("doc_id"), col("n_tokens"), col("score"),
          (col("score") > minScore).as("kept")))
    quality.write.mode("append").parquet(s"$outDir/quality")
    val passed = docs.join(
      quality.filter(col("kept")).select("doc_id"), "doc_id")

    // 2. near-dup vs the standing corpus (original text — scrubbing
    // first could mask a duplicate)
    val decisions = IncrementalNearDup.dedupBatch(passed, indexDir)
    decisions.write.mode("append").parquet(s"$outDir/dedup")
    val kept = passed.join(
      decisions.filter(col("kept")).select("doc_id"), "doc_id")

    // 3. scrub + export, partitioned by the reproducible shard key —
    // the write-side layout q99 derives
    val exported = kept.select(col("doc_id"),
      TextCuration.scrubPii(col("text")).as("clean_text"),
      (TextCuration.shuffleKey(col("doc_id")) % Shards).as("shard"))
    exported.write.mode("append").partitionBy("shard")
      .parquet(s"$outDir/shards")

    val nPassed = passed.count()
    val nKept = kept.count()
    graft.Caches.releaseScoped()
    BatchStats(input, input - nPassed, nPassed - nKept, nKept)
  }

  /** q209: the curation flagship promoted into the oracle gate (the
    * q170 batch-fold precedent — batch ORDER is load-bearing here, the
    * standing dedup index grows with each batch's survivors, so the
    * replay drives [[processBatch]] in a deterministic doc_id-residue
    * sequence rather than racing a file-source listing; the REAL
    * streaming path stays pinned by CurationPipelineSpec). Three
    * batches (`doc_id % 3`) run the full chain — quality filter,
    * incremental near-dup against the growing on-disk index, PII scrub
    * + shard export — and the replay emits the per-batch FUNNEL:
    * (batch, n_input, n_quality_dropped, n_dup_dropped, n_exported).
    * The oracle unrolls all three rounds in SQL (the q110/q133 rule):
    * quality via the q98 classifier chain, round-b dedup candidates as
    * batch-b bands probing the UNION of earlier rounds' survivors, the
    * q93 Jaccard-0.5 verify behind. A doc kept that should have
    * dropped — or a survivor missing from the standing index when the
    * next batch probes it — moves a counter and reds the row.
    *
    * The 5-counter result is driver-built from [[BatchStats]] (3 rows —
    * the documented q133-style bounded action); every underlying
    * relation stays distributed. */
  def curationReplay(spark: SparkSession, sfDir: String,
                     nBatches: Int = 3): DataFrame = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-curation-replay-")
    graft.TempDirs.cleanupOnExit(root)
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    // gate at the corpus median score — the deploy shape (a threshold
    // calibrated OFFLINE before the stream starts), and the value that
    // keeps BOTH funnel branches firing at every SF: the fixture's
    // near-dup twins score deeply negative, so the default `> 0` gate
    // would starve the dedup stage of every twin. `floor` loses
    // nothing: for integer scores, score > floor(median) ⟺
    // score > median (median is k or k+0.5).
    val minScore = TextCuration.qualityScores(docs)
      .agg(floor(expr("percentile(score, 0.5)")).cast("long"))
      .as[Long].head()
    val stats = (0 until nBatches).map { b =>
      val st = processBatch(docs.filter(pmod(col("doc_id"), lit(nBatches)) === b),
        s"$root/index", s"$root/out", minScore)
      (b.toLong, st.input, st.qualityDropped, st.dupDropped, st.exported)
    }
    stats.toDF("batch", "n_input", "n_quality_dropped",
        "n_dup_dropped", "n_exported")
      .orderBy("batch")
  }

  /** Run the chain over a streaming (doc_id, text) source. */
  def run(docs: DataFrame, indexDir: String, outDir: String,
          checkpointDir: String, minScore: Long = 0L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, indexDir, outDir, minScore)
        ()
      }
      .start()

  /** EXACTLY-ONCE form for engines that retry micro-batches (the
    * `FanOutPipeline.runExactlyOnce` stance): every sink — quality
    * report, dedup decisions, shard export, and the standing index
    * itself ([[IncrementalNearDup.dedupBatchIdempotent]]) — is keyed by
    * a `__batch` partition and a replay OVERWRITES its own partition.
    * The dedup reads exclude the replayed batch's partition, so a retry
    * that crashed after its index write still reaches the same
    * decisions. */
  private[streaming] def processBatchExactlyOnce(batch: DataFrame, batchId: Long,
                                                 indexDir: String, outDir: String,
                                                 minScore: Long = 0L): BatchStats = {
    val docs = graft.Caches.scopedPersist(batch.select("doc_id", "text"))
    val input = docs.count()

    def overwrite(df: DataFrame, path: String, parts: String*): Unit =
      df.withColumn("__batch", lit(batchId))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch" +: parts: _*).parquet(path)

    val quality = graft.Caches.scopedPersist(
      TextCuration.qualityScores(docs)
        .select(col("doc_id"), col("n_tokens"), col("score"),
          (col("score") > minScore).as("kept")))
    overwrite(quality, s"$outDir/quality")
    val passed = docs.join(
      quality.filter(col("kept")).select("doc_id"), "doc_id")

    val decisions = IncrementalNearDup.dedupBatchIdempotent(passed, batchId, indexDir)
    overwrite(decisions, s"$outDir/dedup")
    val kept = passed.join(
      decisions.filter(col("kept")).select("doc_id"), "doc_id")

    val exported = kept.select(col("doc_id"),
      TextCuration.scrubPii(col("text")).as("clean_text"),
      (TextCuration.shuffleKey(col("doc_id")) % Shards).as("shard"))
    overwrite(exported, s"$outDir/shards", "shard")

    val nPassed = passed.count()
    val nKept = kept.count()
    graft.Caches.releaseScoped()
    BatchStats(input, input - nPassed, nPassed - nKept, nKept)
  }

  /** [[run]] with the exactly-once batch body. */
  def runExactlyOnce(docs: DataFrame, indexDir: String, outDir: String,
                     checkpointDir: String, minScore: Long = 0L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        processBatchExactlyOnce(batch, bid, indexDir, outDir, minScore)
        ()
      }
      .start()
}
