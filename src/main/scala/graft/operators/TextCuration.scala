package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Shared text-curation primitives — the single definition of the
  * PII-redaction chain (q95), the hashed-bag-of-words quality
  * classifier (q98), and the reproducible shard key (q99), reused
  * verbatim by the streaming [[graft.streaming.CurationPipeline]] so
  * the batch oracle gate and the incremental pipeline cannot drift
  * apart.
  *
  * Everything is codegen'd Catalyst — regexp/string expressions and
  * explode + partial aggregation; no UDF anywhere.
  */
object TextCuration {

  /** PII patterns — the Java-regex ∩ RE2 common dialect (both engines
    * agree on character classes, bounded repetition and \b; lookaround
    * and backreferences are RE2-absent and deliberately avoided). */
  val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiIpv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PiiPhone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** The q121 data-quality assertion pass, factored here so the oracle
    * gate (over the fixture corpus, where every check passes) and the
    * planted-violation spec (CurationQueriesSpec, where every branch
    * fires) run literally the same expressions. One conditional
    * aggregation over one scan; long-form (check_name, n_violations,
    * pass) report. */
  def dqChecks(docs: DataFrame): DataFrame = {
    val wide = docs.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("v_null_id"),
      sum(when(!col("lang").isin("en", "de", "fr", "es", "zh"), 1L)
        .otherwise(0L)).as("v_bad_lang"),
      sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L))
        .as("v_chars_mismatch"),
      sum(when(length(col("text")) === 0, 1L).otherwise(0L)).as("v_empty"),
      // uniqueness over NON-NULL ids: a null key is its own violation
      // (doc_id_not_null), not a duplicate of other nulls
      count(col("doc_id")).as("n_notnull_ids"),
      countDistinct(col("doc_id")).as("n_ids"))
    wide.select(col("n_rows"), col("v_null_id"), col("v_bad_lang"),
        col("v_chars_mismatch"), col("v_empty"),
        (col("n_notnull_ids") - col("n_ids")).as("v_dup_id"))
      .selectExpr("stack(5, " +
        "'doc_id_not_null', v_null_id, " +
        "'lang_in_domain', v_bad_lang, " +
        "'n_chars_consistent', v_chars_mismatch, " +
        "'text_not_empty', v_empty, " +
        "'doc_id_unique', v_dup_id) AS (check_name, n_violations)")
      .select(col("check_name"), col("n_violations"),
        when(col("n_violations") === 0, 1L).otherwise(0L).as("pass"))
      .orderBy("check_name")
  }

  /** The q95 redaction chain: email → IP → phone, in that order (the
    * order is load-bearing — an IP-looking fragment inside an already
    * redacted email must not double-redact). */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, PiiEmail, "<EMAIL>"),
        PiiIpv4, "<IP>"),
      PiiPhone, "<PHONE>")

  /** Per-class match count on the ORIGINAL text. */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** q98's closed-form linear weight for one token: md5 bucket →
    * integer weight in [-998, 998]. Stands in for trained parameters —
    * the deploy shape (broadcast weights, map-side partial sums) is
    * identical with a real 1024-float model. */
  def tokenWeight(tok: Column): Column =
    (TextOps.hash56(tok) % 1024) * 2654435761L % 1997L - 998L

  /** Hashed-bag-of-words quality scores for a (doc_id, text, ...)
    * relation: one row per input doc with `n_tokens` and the integer
    * `score`. Explode → map → partial-agg: the shuffle carries one
    * partial sum per (doc, task). */
  def qualityScores(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), tokenWeight(col("tok")).as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("score"))

  /** q99's reproducible shuffle key (never rand(): replayable across
    * engines, retries, and cluster sizes). */
  def shuffleKey(id: Column): Column =
    TextOps.hash56(concat(lit("shard_"), id.cast("string")))

  /** q210's BIGRAM held-out perplexity over a (doc_id, lang, text)
    * relation: add-1-smoothed bigram model trained on the even doc_ids,
    * the odd half scored with integer-bit quantized surprisal
    * bits = ⌊log₂((c(w₁)+V) div (c(w₁w₂)+1))⌋ (the q127/q146 no-libm
    * rule). Shared here (the q146/q121 rule) so the planted-corpus spec
    * can fire the ctx-OOV and novel-bigram branches deterministically —
    * on the fixture the novel branch fires at sf0.001 but saturates
    * away at sf0.1 (5000 same-vocabulary docs cover the bigram space),
    * and ctx-OOV never fires (fully shared vocabulary, the q146
    * caveat). */
  def bigramPerplexity(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      TextOps.tokens(col("text")).as("tk"))
    val bg = toks.filter(size(col("tk")) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(zip_with(expr("slice(tk, 1, size(tk) - 1)"),
          expr("slice(tk, 2, size(tk) - 1)"),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .select(col("doc_id"), col("lang"), col("b.w1").as("w1"),
        concat(col("b.w1"), lit(" "), col("b.w2")).as("bg"))
    val train = graft.Caches.scopedPersist(bg.filter(col("doc_id") % 2 === 0))
    val held = bg.filter(col("doc_id") % 2 === 1)
    val cb = train.groupBy("bg").agg(count(lit(1)).as("cb"))
    val cc = train.groupBy("w1").agg(count(lit(1)).as("cc"))
    val vv = train.agg(countDistinct(col("w1")).cast("long").as("v"))
    held.join(cb, Seq("bg"), "left").join(cc, Seq("w1"), "left")
      .crossJoin(broadcast(vv))
      .select(col("lang"),
        when(col("cc").isNull, 1L).otherwise(0L).as("ctx_oov"),
        when(col("cc").isNotNull && col("cb").isNull, 1L).otherwise(0L)
          .as("novel"),
        (length(bin(expr("(coalesce(cc, 0) + v) div (coalesce(cb, 0) + 1)")))
          - 1).cast("long").as("bits"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_bigrams"), sum("ctx_oov").as("n_ctx_oov"),
        sum("novel").as("n_novel"), sum("bits").as("sum_bits"))
      .select(col("lang"), col("n_bigrams"), col("n_ctx_oov"),
        col("n_novel"), col("sum_bits"),
        (col("sum_bits").cast("double") / col("n_bigrams").cast("double"))
          .as("mean_bits"))
      .orderBy("lang")
  }

  /** q146's held-out perplexity report over a (doc_id, lang, text)
    * relation: train an add-1-smoothed unigram model on the EVEN
    * doc_ids, score the odd half with integer-bit quantized surprisal
    * (the q127 no-libm rule), report per-lang token count, OOV count
    * (the left-join-null path — a token the train slice never saw),
    * and the two one-division means. Shared here so the planted-OOV
    * spec drives the same operator the fixture query runs (the q121
    * rule: the fixture vocabulary is fully shared between halves, so
    * the gate alone can never exercise the OOV branch). */
  def heldoutPerplexity(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(TextOps.tokens(col("text"))).as("tok"))
    val train = toks.filter(col("doc_id") % 2 === 0)
    val held = toks.filter(col("doc_id") % 2 === 1)
    val cnt = train.groupBy("tok").agg(count(lit(1)).as("c"))
    val tot = train.agg(count(lit(1)).as("t"), countDistinct(col("tok")).as("v"))
    held.join(cnt, Seq("tok"), "left").crossJoin(broadcast(tot))
      .select(col("lang"),
        when(col("c").isNull, 1L).otherwise(0L).as("oov"),
        (length(bin(expr("(t + v) div (coalesce(c, 0) + 1)"))) - 1)
          .cast("long").as("bits"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_tokens"), sum("oov").as("n_oov"),
        sum("bits").as("sum_bits"))
      .select(col("lang"), col("n_tokens"), col("n_oov"), col("sum_bits"),
        (col("sum_bits").cast("double") / col("n_tokens").cast("double")).as("mean_bits"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double")).as("oov_rate"))
      .orderBy("lang")
  }
}
