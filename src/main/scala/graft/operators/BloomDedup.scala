package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter-accelerated incremental dedup: "which of these incoming
  * documents are NEW relative to an existing corpus?" — the daily-ingest
  * face of exact dedup (the reference's dedup surface is whole-corpus,
  * `q17`; a 100 TB deployment almost never re-deduplicates the corpus,
  * it screens each incoming batch against it).
  *
  * Architecture is Spark's own runtime-filter shape
  * (`InjectRuntimeFilter`), hand-placed because the corpus membership
  * set is the *semantic* here, not an optimizer hint:
  *
  *  1. '''build''' — one distributed aggregate over the corpus folds
  *     `xxhash64(key)` longs into a bloom filter (`df.stat.bloomFilter`,
  *     a treeAggregate: partial filters merge pairwise, the driver holds
  *     only the final ~1.2 MB of bits at fpp=1%/1M keys — never the
  *     keys).
  *  2. '''probe''' — the serialized filter embeds as a binary literal in
  *     a codegen'd [[BloomFilterMightContain]] predicate over the
  *     incoming batch: a map-side, shuffle-free pre-screen.
  *  3. '''verify''' — only the `mightContain` survivors (true dups +
  *     fpp·|new| false positives) reach the exact anti-join; the
  *     definite-new rows bypass the shuffle entirely.
  *
  * Correctness does NOT depend on the filter's fpp: a bloom filter has
  * no false negatives (a key inserted always reports present), so every
  * true duplicate is routed to the exact verify and removed there; a
  * false positive merely wastes one row's trip through the anti-join.
  * xxhash64 collisions are likewise safe — a colliding non-dup reports
  * `mightContain = true` and survives the exact textual anti-join. The
  * result is therefore bit-identical to the plain anti-join at every
  * fpp, which is what lets q72 share the exact oracle.
  *
  * At 100 TB: the corpus side is touched once by the filter build (a
  * scan + tiny shuffle of partial filters); the incoming batch — the
  * small side, but still billions of rows — shuffles only its candidate
  * sliver. Size `expectedItems` from the corpus key count and spend bits
  * to keep fpp ≲ 1%: the anti-join's shuffle volume is
  * `|dups| + fpp·|new|` rows instead of `|incoming|`.
  */
object BloomDedup {

  /** The codegen'd probe predicate: `mightContain(bloom, xxhash64(key))`.
    * Insert and probe must hash identically — [[buildFilter]] inserts
    * `xxhash64` longs (`putLong`), this probes with the same public
    * `functions.xxhash64` (seed 42), mirroring how `BloomFilterAggregate`
    * and `BloomFilterMightContain` pair up inside Spark's own runtime
    * filter. */
  def mightContain(filterBytes: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(filterBytes, BinaryType),
      ColumnBridge.expression(xxhash64(key))))

  /** Distributed bloom build over `corpus`'s `key` column; returns the
    * serialized filter (the only thing the driver ever holds). */
  def buildFilter(corpus: DataFrame, key: Column,
                  expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = corpus.select(xxhash64(key).as("__h"))
      .stat.bloomFilter("__h", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Rows of `incoming` whose `keyCol` value does not occur in `corpus`:
    * exactly `incoming ANTI JOIN corpus ON key`, with the bloom
    * pre-screen keeping definite-new rows out of the anti-join shuffle.
    * `keyCol` must name a column present in both inputs. */
  def newRows(incoming: DataFrame, corpus: DataFrame, keyCol: String,
              expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bytes = buildFilter(corpus, col(keyCol), expectedItems, fpp)
    val probe = mightContain(bytes, col(keyCol))
    val definiteNew = incoming.filter(!probe)
    val candidates = incoming.filter(probe)
    val verified = candidates.join(
      corpus.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    definiteNew.unionByName(verified)
  }
}
