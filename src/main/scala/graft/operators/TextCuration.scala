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
}
