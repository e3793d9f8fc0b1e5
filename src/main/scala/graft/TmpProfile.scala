package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage-attribution profiler for the r17 optimization round —
  * times the internal stages of q192's neighbor chain so the expensive
  * one is identified by measurement, not guesswork. Not part of the
  * declared surface; deleted before the round closes. */
object TmpProfile {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").count()

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[tmpprof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }

    val reps = sys.env.getOrElse("TMPPROF_REPS", "3").toInt
    for (_ <- 1 to reps) {
      // stage 1: the (ck, pk) incidence (join + distinct)
      val inc = Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_partkey").as("pk"))
        .distinct()
      timed("incidence")(noop(inc))

      val bb = Caches.scopedPersist(inc)
      timed("incidence_persist")(bb.count())

      // stage 2: the MinKLong cap aggregation
      val mink = udaf(new graft.expressions.MinKLong(64))
      val capped = bb.select(col("ck"), col("pk"),
          graft.functions.TextOps.hash56(concat(lit("cfcap:"),
            col("ck").cast("string"), lit(":"), col("pk").cast("string")))
            .as("pri"))
        .groupBy("ck")
        .agg(mink(col("pri"), col("pk")).as("keep"))
        .select(col("ck"), explode(col("keep")).as("e"))
        .select(col("ck"), col("e._2").as("pk"))
      timed("mink_cap")(noop(capped))

      val cp = Caches.scopedPersist(capped)
      timed("cap_persist")(cp.count())

      // stage 3: hash56 alone over the incidence (isolate the md5 cost)
      timed("hash56_only")(noop(bb.select(
        graft.functions.TextOps.hash56(concat(lit("cfcap:"),
          col("ck").cast("string"), lit(":"), col("pk").cast("string"))))))

      // stage 4: the pair self-join + count + min-support
      val lower = cp.as("x")
        .join(cp.as("y"),
          col("x.ck") === col("y.ck") && col("x.pk") < col("y.pk"))
        .groupBy(col("x.pk").as("part_a"), col("y.pk").as("part_b"))
        .agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 2L)
      timed("pair_join_count")(noop(lower))

      // stage 5: raw pair volume (no agg) — the join's own emission cost
      timed("pair_join_raw")(noop(cp.as("x")
        .join(cp.as("y"),
          col("x.ck") === col("y.ck") && col("x.pk") < col("y.pk"))
        .select(col("x.pk"), col("y.pk"))))

      // stage 5b: the pair count keyed on ONE packed long instead of two
      timed("pair_count_packed")(noop(cp.as("x")
        .join(cp.as("y"),
          col("x.ck") === col("y.ck") && col("x.pk") < col("y.pk"))
        .groupBy((shiftleft(col("x.pk"), 32) + col("y.pk")).as("ab"))
        .agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 2L)))

      // stage 6: the full q192 for reference
      timed("q192_full")(
        SparkEntry.queries("q192_item_similarity")(spark, d).count())
      Caches.releaseScoped()

      // q198 decomposition
      val jj = Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_partkey").as("pk"),
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"))
      val jjp = Caches.scopedPersist(jj)
      timed("q198_jj_persist")(jjp.count())
      val ti = Caches.scopedPersist(
        jjp.filter(col("day") < 10957L).select("ck", "pk").distinct())
      val te = Caches.scopedPersist(
        jjp.filter(col("day") >= 10957L).select("ck", "pk").distinct())
      timed("q198_ti_te")({ ti.count(); te.count(); () })
      timed("q198_full")(
        SparkEntry.queries("q198_recommender_eval")(spark, d).count())
      Caches.releaseScoped()
    }
    spark.stop()
  }
}
