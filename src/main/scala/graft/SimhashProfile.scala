package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of q34 (the largest single row of the 60× probe:
  * 11.0 s) — measures WHERE the time goes before anyone optimizes it
  * (the house rule: measure, don't guess; TrioProfile precedent).
  * Stages, each forced with a count() over the previous stage cached:
  *
  *  1. shingle base — the session-shared positional-shingle read;
  *  2. signature aggregate — `Signatures.simhash56` (56 bit-majority
  *     aggregate columns over the exploded shingles);
  *  3. banding + self-join + popcount verify — the candidate stage.
  *
  * Run: `sbt "runMain graft.SimhashProfile <dir>"`. */
object SimhashProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").count() // warm-up

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[simhash] $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.2fs  $n%10d rows")
    }

    // stage 1: the shared shingle base (charged once per session in the
    // bench; timed here so stage 2 isn't billed for it)
    timed("shingle_base") {
      queries.PipelineQueries.warmSharedRelations(spark, dir)
      Tables.documents(spark, dir).count()
    }

    // stage 2: the signature aggregate alone, forced and cached
    val docs = queries.PipelineQueries.shingleDocsForProfile(spark, dir)
    val sigs = Caches.scopedPersist(
      graft.dedup.Signatures.simhashBands(graft.dedup.Signatures.simhash56(docs)))
    timed("signature_agg")(sigs.count())

    // stage 3: band self-join + distinct + popcount filter over the
    // cached signatures — the candidate stage in isolation
    timed("band_join_verify") {
      val a = sigs.select(col("band"), col("bval"),
        col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
      val b = sigs.select(col("band"), col("bval"),
        col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
      a.join(b, Seq("band", "bval"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .count()
    }
    Caches.releaseScoped()

    // the full query for reference (fresh, its own persists)
    timed("q34_full")(SparkEntry.queries("q34_simhash_neardup")(spark, dir).count())
    Caches.releaseScoped()
    Caches.releaseShared()
    spark.stop()
  }
}
