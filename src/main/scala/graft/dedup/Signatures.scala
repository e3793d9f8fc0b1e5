package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-signature builders for near-duplicate detection at scale.
  *
  * Shape: explode the shingle set, hash with codegen'd expressions, and
  * reduce with `groupBy` aggregates. Partial aggregation (map-side
  * combine) collapses the exploded rows to a few rows per document
  * *before* any shuffle, so at 100 TB the network carries only
  * (doc, band, value) keys — never raw shingles.
  *
  * (A row-local nested higher-order-function formulation was tried first
  * and was ~50× slower: nested lambdas with captured outer variables drop
  * out of whole-stage codegen into interpreted evaluation.)
  *
  * All hashes derive from md5 ([[TextOps.hash56]]), which is bit-identical
  * across engines — the whole pipeline is mirrored 1:1 in DuckDB oracle
  * SQL, unlike seed-dependent murmur/xxhash.
  */
object Signatures {

  /** Modulus for the universal-hash permutation family. */
  val P: Long = 1000000007L

  /** MinHash LSH band buckets: shingles arrive PRE-HASHED (md5 ran once,
    * fused into the shingle transform — [[TextOps.hashedShingles]]), then
    * `numHashes` permutations come from the universal-hash family
    * `h_s(x) = ((2s+1)·x + s) mod P` — pure arithmetic, so the 16×
    * expansion happens on codegen'd integers, not repeated md5 calls.
    * Signature slots pair into bands of two, each hashed to a bucket id.
    *
    * Input: (doc_id, sh: array<long>); output: (doc_id, band, bucket).
    * Two docs sharing any (band, bucket) are candidates —
    * P(candidate) = 1 - (1 - j²)^(numHashes/2) for true Jaccard j. */
  def minhashBandBuckets(shingleDocs: DataFrame, numHashes: Int): DataFrame = {
    // generators can't nest in expressions — explode first, then mod
    val base = shingleDocs
      .select(col("doc_id"), explode(col("sh")).as("x"))
      .select(col("doc_id"), (col("x") % P).as("hb"))
    // all signature slots as aggregate COLUMNS of one groupBy (the same
    // shape as simhash56): pre-shuffle volume stays at doc×shingle — the
    // numHashes× expansion happens on agg expressions, not rows — and
    // partial aggregation emits one row per doc.
    val minCols = (0 until numHashes).map(s =>
      min((lit(2 * s + 1) * col("hb") + s) % P).as(s"m$s"))
    val bandCols = (0 until numHashes / 2).map(b =>
      md5(concat_ws("_",
        col(s"m${2 * b}").cast("string"), col(s"m${2 * b + 1}").cast("string"))))
    base
      .groupBy("doc_id")
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band", "bucket")))
  }

  /** 56-bit SimHash: bit b of the signature is set iff the majority of
    * (pre-hashed) shingles have bit b set. Input: (doc_id,
    * sh: array<long>); output: (doc_id, simhash). Near-identical sets →
    * small Hamming distance.
    *
    * The 56 per-bit majority sums are 56 aggregate COLUMNS of one
    * groupBy — not a 56× row explode — so the pre-shuffle row count stays
    * at doc×shingle and partial aggregation collapses it to one row per
    * doc. The bit weights fold back with compile-time literal shifts. */
  def simhash56(shingleDocs: DataFrame): DataFrame = {
    val hashed = shingleDocs
      .select(col("doc_id"), explode(col("sh")).as("h"))
    val bitSums = (0 until 56).map(b =>
      sum(when(expr(s"shiftright(h, $b) % 2") === 1, 1L).otherwise(-1L)).as(s"s$b"))
    hashed
      .groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 56).map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** Split a 56-bit simhash into 4 disjoint 14-bit band values. By
    * pigeonhole, any pair with Hamming distance <= 3 shares at least one
    * full band — an equi-join per band finds all such pairs with no O(n²)
    * scan. Output: (doc_id, simhash, band, bval). */
  def simhashBands(sim: DataFrame): DataFrame =
    sim.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bval", expr("shiftright(simhash, band * 14) % 16384"))
}
