package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Signatures
import graft.functions.TextOps

/** Stage-level profile of the shared dedup-trio build (VERDICT r3 item
  * 5): times shingles, minhash signature, band join, and verify
  * separately so optimization targets the measured hot stage, not a
  * guessed one. Run: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.TrioProfile"`.
  *
  * KEEP IN SYNC with PipelineQueries' shingleDocs / minhashCandidates /
  * verifiedPairs: the stages are inlined here (they are private and
  * fused behind shared persists there) — if the production shapes change
  * (threshold, band count, join form), mirror them or the profile times
  * a pipeline that no longer runs. */
object TrioProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[trio] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  $n%10d rows")
    }

    val docs = Tables.documents(spark, sfDir)
    time("raw_scan")(docs.count())
    // mirrors positionalShingleDocs: the shingle+hash pass is the fused
    // native PositionalShingleHash expression (3.6 s -> 1.5 s at sf0.1
    // vs the interpreted HOF pipeline); the md5 pass lands in the
    // POSITIONAL base, the distinct sets derive from it
    val pos = docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .select(col("doc_id"), TextOps.positionalHashedShingles(col("tk"), 3).as("sp"))
      .filter(size(col("sp")) > 0)
      .persist()
    time("positional_persist")(pos.count())
    val sh = pos.select(col("doc_id"), array_distinct(col("sp")).as("sh")).persist()
    time("distinct_sets_persist")(sh.count())
    val sig = Signatures.minhashBandBuckets(sh, 16).persist()
    time("minhash_bands_persist")(sig.count())
    val a = sig.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val b = sig.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    val cand = a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct().persist()
    time("band_join_distinct")(cand.count())
    val da = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val db = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val ver = cand.join(da, "doc_a").join(db, "doc_b")
      .withColumn("jaccard", inter / (size(col("sh_a")) + size(col("sh_b")) - inter))
      .filter(col("jaccard") >= 0.5)
    time("verify_jaccard")(ver.count())
    spark.stop()
  }
}
