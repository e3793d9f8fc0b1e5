package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q116's min-length guard (VERDICT r10 item 6): the SymSpell blocking
  * relation must not contain the `''` variant — the one bucket whose
  * width grows with the corpus (every word of length ≤ 2 meets every
  * other there) — and dropping it must not cost a single pair, because
  * the short×short exact pass covers everything `''` could produce.
  * Both halves pinned here against a brute-force all-pairs truth on a
  * vocabulary crafted to exercise the guard: short words whose ONLY
  * shared variant is `''` ("ab"/"cd"), short–long pairs that share a
  * real variant ("ab"/"abcd"), and unrelated long words.
  */
class SymSpellGuardSpec extends SparkSpec {
  import spark.implicits._

  private val words =
    Seq("ab", "cd", "a", "xy", "abcd", "abef", "hello", "hallo", "world")

  test("the blocking relation carries no empty-string variant (the hot bucket is gone)") {
    val vocab = words.toDF("w")
    val block = PipelineQueries.symspellBlocking(vocab)
    assert(block.filter(length(col("v")) === 0).count() === 0)
    // and every surviving bucket on this vocab is narrow: no variant
    // bucket anywhere near vocabulary size
    val maxBucket = block.groupBy("v").count().agg(max("count")).as[Long].head()
    assert(maxBucket < words.size,
      s"a variant bucket of width $maxBucket on a ${words.size}-word vocab means the guard failed")
  }

  test("guarded blocking + short all-pairs finds exactly the lev<=2 truth") {
    val vocab = words.toDF("w").cache()
    val block = PipelineQueries.symspellBlocking(vocab).cache()
    val longPairs = block.as("a").join(block.as("b"),
        col("a.v") === col("b.v") && col("a.w") < col("b.w"))
      .select(col("a.w").as("w_a"), col("b.w").as("w_b"))
    val short = vocab.filter(length(col("w")) <= 2)
    val shortPairs = short.as("a").join(short.select(col("w").as("wb")),
        col("w") < col("wb"))
      .select(col("w").as("w_a"), col("wb").as("w_b"))
    val found = longPairs.unionByName(shortPairs).distinct()
      .filter(levenshtein(col("w_a"), col("w_b")) <= 2)
      .as[(String, String)].collect().toSet
    val truth = (for {
      a <- words; b <- words if a < b
    } yield (a, b)).filter { case (a, b) =>
      org.apache.commons.text.similarity.LevenshteinDistance.getDefaultInstance
        .apply(a, b) <= 2
    }.toSet
    assert(truth.contains(("ab", "cd")), "fixture sanity: a ''-only pair exists")
    assert(truth.contains(("ab", "abcd")), "fixture sanity: a short-long pair exists")
    assert(found === truth)
  }
}
