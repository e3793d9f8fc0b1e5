package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextOps

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def shingleDf(docs: Seq[(Long, String)]) =
    docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextOps.hashedShingles(TextOps.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)

  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog again today",
    2L -> "the quick brown fox jumps over the lazy dog again tonight", // near-dup of 1
    3L -> "completely different words about spark catalyst optimizer rules engine",
    4L -> "the quick brown fox jumps over the lazy dog again today") // exact dup of 1

  test("minhash banding: exact dups always collide, disjoint docs never do") {
    val sig = Signatures.minhashBandBuckets(shingleDf(corpus), 16)
    val buckets = sig.as[(Long, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    assert(buckets(1L) === buckets(4L), "identical docs share all 8 band buckets")
    assert(buckets(1L).intersect(buckets(3L)).isEmpty, "disjoint docs share none")
    assert(buckets(1L).intersect(buckets(2L)).nonEmpty, "near-dups collide somewhere")
  }

  test("simhash: exact dup -> distance 0, near-dup close, disjoint far") {
    val sim = Signatures.simhash56(shingleDf(corpus))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(sim(a) ^ sim(b))
    assert(ham(1L, 4L) === 0)
    assert(ham(1L, 2L) < ham(1L, 3L))
  }

  test("MLlib MinHashLSH and the relational LSH pipeline agree pair-for-pair") {
    import graft.SparkEntry
    // q18 runs on the bounded even-doc slice (even ids < 2000 — see its
    // query doc); bucket membership is pair-local, so the full-corpus
    // relational pair set restricted to the same slice is exactly the
    // sliced-corpus answer. (At sf0.001 every doc_id < 2000, so the
    // bound is vacuous here; it exists for large-corpus cost.)
    val mllib = SparkEntry.queries("q18_neardup_minhash")(spark, sf0001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val allPairs = SparkEntry.queries("q31_ngram_jaccard")(spark, sf0001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val relational = allPairs.filter { case (a, b) =>
      a % 2 == 0 && b % 2 == 0 && a < 2000 && b < 2000 }
    // NOT exact equality: q18 runs only 2 OR-amplified hash tables, so a
    // true pair is missed with prob ≈ (1−j)² (~4% at j = 0.8) — on the
    // current seeded corpus the sets happen to coincide, but a fixture
    // regeneration could legitimately drop a pair from the MLlib side.
    // The stable invariants are (a) soundness: every MLlib pair passes
    // the same exact-Jaccard filter the relational path applies, so it
    // must be a subset; (b) recall ≥ 0.9 against the oracle-checked set.
    assert(mllib.subsetOf(relational),
      s"MLlib found pairs the relational verify rejects: ${mllib -- relational}")
    assert(relational.nonEmpty &&
      mllib.size >= math.ceil(relational.size * 0.9).toInt,
      s"MLlib recall ${mllib.size}/${relational.size} under the 0.9 floor")
  }

  test("skew-safe distinct count equals countDistinct") {
    import graft.Tables
    import graft.operators.Salting
    val direct = Tables.events(spark, sf0001)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Salting.skewSafeDistinctCount(
      Tables.events(spark, sf0001), "event_type", "user_id", "n")
      .as[(String, Long)].collect().toMap
    assert(salted === direct)
  }

  test("simhash band split covers all 56 bits disjointly") {
    val sim = Signatures.simhash56(shingleDf(corpus))
    val bands = Signatures.simhashBands(sim)
      .select("doc_id", "simhash", "band", "bval")
      .as[(Long, Long, Int, Long)].collect()
    for ((docId, grp) <- bands.groupBy(_._1)) {
      val reassembled = grp.map(r => r._4 << (r._3 * 14)).sum
      assert(reassembled === grp.head._2, s"doc $docId bands reassemble")
    }
  }
}
