package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-pipeline surface: tokenization, word
  * n-gram shingling, and a deterministic cross-engine 56-bit hash.
  *
  * Everything here is a pure Catalyst expression (codegen'd, shuffle-free,
  * and expressible 1:1 in the DuckDB oracle SQL).
  */
object TextOps {

  /** Whitespace tokens — the corpus is single-space word soup, so a plain
    * split matches DuckDB's `string_split` exactly. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles: `len - n + 1` overlapping windows joined with a
    * space. Matches `list_transform(generate_series(1, len(tk)-n+1), i ->
    * tk[i] || ' ' || ... )` in DuckDB. Empty array when the doc is shorter
    * than n tokens. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Distinct HASHED shingle set: [[shingles]] with [[hash56]] fused into
    * the same single-level lambda, so the 3-gram string is a transient
    * inside one transform — never materialized as an array, never
    * persisted, never string-compared. The distinct/intersect/min/bit
    * machinery downstream runs on 8-byte longs. Identical to hashing the
    * string set (md5 is injective at any realistic corpus: a collision
    * needs ~2^28 DISTINCT shingles per doc pair at 56 bits) and mirrored
    * 1:1 by the oracle, which applies the same md5 inside its
    * list_transform — a collision, were one to occur, would occur in both
    * engines identically. */
  def hashedShingles(toks: Column, n: Int): Column =
    array_distinct(positionalHashedShingles(toks, n))

  /** POSITIONAL hashed shingles — one entry per token position,
    * duplicates preserved; the single definition of the hashed-shingle
    * semantics ([[hashedShingles]] is its array_distinct). This is the
    * form the duplicated-span metric (q75) needs: "what fraction of the
    * document's positions sit inside an n-gram that also occurs
    * elsewhere" is a statement about positions, not about the set of
    * distinct n-grams. DuckDB twin: the same list_transform without
    * list_distinct.
    *
    * Native ([[graft.expressions.PositionalShingleHash]]: one fused md5
    * loop — the composed transform/slice/concat_ws pipeline runs
    * interpreted and cost ~13 µs/position, dominating the shared trio
    * build); [[positionalHashedShinglesComposed]] is the original
    * built-in formulation, kept as the independent cross-check
    * (FunctionsSpec) exactly like `hash56Composed` / `dotHof`. */
  def positionalHashedShingles(toks: Column, n: Int): Column =
    graft.expressions.PositionalShingleHash(toks, n)

  /** Built-in-function formulation of [[positionalHashedShingles]] —
    * cross-check only. */
  def positionalHashedShinglesComposed(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => hash56(concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array().cast("array<long>"))

  /** Deterministic 56-bit hash: the first 14 hex chars of md5, parsed as an
    * integer. md5 is bit-identical across engines (unlike murmur/xxhash
    * whose seeds differ), and 56 bits keeps all downstream arithmetic
    * safely inside a signed 64-bit long even under ANSI overflow checks.
    * DuckDB twin: `CAST(('0x' || substr(md5(x), 1, 14)) AS BIGINT)`.
    *
    * Implemented natively ([[graft.expressions.Hash56]]: digest bytes →
    * long, no hex-string round-trip); [[hash56Composed]] is the original
    * built-in formulation, kept as the independent cross-check
    * (FunctionsSpec) exactly like `dot` / `dotHof`. */
  def hash56(c: Column): Column = graft.expressions.Hash56(c)

  /** Built-in-function formulation of [[hash56]] — cross-check only. */
  def hash56Composed(c: Column): Column =
    conv(substring(md5(c), 1, 14), 16, 10).cast("long")
}
