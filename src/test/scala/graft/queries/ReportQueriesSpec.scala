package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}

/** Oracle-independent brute forces for the round-11 report additions
  * (q174 Gini, q180 histogram quantiles, q188 centroid cosine) — plain
  * Scala over collected rows, so the DuckDB gate and these specs fail
  * independently. */
class ReportQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("q174 gini equals the O(n²) pairwise |ci−cj| definition on all three relations") {
    val got = run("q174_gini_concentration")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

    def pairwise(counts: Seq[Long]): (Long, Long, Long) = {
      val n = counts.size.toLong
      val s = counts.sum
      // Σ_{i<j} |ci − cj| = 2·Σ i·c_(i) − (n+1)·S for ascending c_(i):
      // the query's closed form must equal the definitional double sum
      var num = BigInt(0)
      for (i <- counts.indices; j <- (i + 1) until counts.size)
        num += (counts(i) - counts(j)).abs
      (n, s, (num * 1000000 / (BigInt(n) * BigInt(s))).toLong)
    }

    val rels = Seq(
      ("lineitem.l_orderkey", Tables.lineitem(spark, sf0001)
        .groupBy("l_orderkey").count().as[(Long, Long)].collect().map(_._2).toSeq),
      ("orders.o_custkey", Tables.orders(spark, sf0001)
        .groupBy("o_custkey").count().as[(Long, Long)].collect().map(_._2).toSeq),
      ("events.user_id", Tables.events(spark, sf0001)
        .groupBy("user_id").count().as[(Long, Long)].collect().map(_._2).toSeq))
    rels.foreach { case (name, counts) =>
      val (n, s, giniPpm) = pairwise(counts)
      assert(got(name) === ((n, s, giniPpm)), s"relation $name")
    }
  }

  test("q180 estimates replay bit-for-bit and land in the covering bucket of the q·n-th order stat") {
    val got = run("q180_histogram_quantile")
      .selectExpr("event_type", "p50_est", "p90_est")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.nonEmpty)

    val byType = Tables.events(spark, sf0001)
      .selectExpr("event_type", "value").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    byType.foreach { case (t, vs) =>
      val n = vs.size.toLong
      val hist = vs.groupBy(v => math.floor(v).toLong).view
        .mapValues(_.size.toLong).toSeq.sortBy(_._1)
      def est(q: Double): Double = {
        val target = q * n
        var cum = 0L
        var res = Option.empty[Double]
        for ((b, c) <- hist if res.isEmpty) {
          cum += c
          if (cum >= target && cum - c < target)
            res = Some(b + (target - (cum - c)) / c)
        }
        res.get
      }
      def coveringBucket(q: Double): Long = {
        // the bucket holding the ⌈q·n⌉-th smallest value
        val rank = math.ceil(q * n).toLong
        math.floor(vs.sorted.apply((rank - 1).toInt)).toLong
      }
      val (s50, s90) = got(t)
      assert(s50 === est(0.5), s"$t p50 replay")
      assert(s90 === est(0.9), s"$t p90 replay")
      assert(math.floor(s50).toLong === coveringBucket(0.5) || s50 == math.floor(s50),
        s"$t p50 covering bucket")
      assert(math.floor(s90).toLong === coveringBucket(0.9) || s90 == math.floor(s90),
        s"$t p90 covering bucket")
      assert(s50 <= s90, s"$t monotone")
    }
  }

  test("q188 cosine matches a plain-Scala replay of the quantized-centroid dag bit-for-bit") {
    val got = run("q188_centroid_similarity")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

    val vecs = Tables.embeddings(spark, sf0001)
      .selectExpr("CAST(label AS LONG)", "embedding")
      .as[(Long, Array[Float])].collect()
    // q148/q172 arithmetic: 7dp round → exact decimal sums → one IEEE
    // division → floor to micro-units
    val cent: Map[Long, Array[Long]] = vecs.groupBy(_._1).map { case (l, vs) =>
      val d = vs.head._2.length
      val mq = Array.tabulate(d) { i =>
        val sx = vs.map(v => BigDecimal(v._2(i).toDouble)
          .setScale(7, BigDecimal.RoundingMode.HALF_UP)).sum
        math.floor(sx.toDouble / vs.size.toDouble * 1000000.0d).toLong
      }
      l -> mq
    }
    val labels = cent.keys.toSeq.sorted
    for (a <- labels; b <- labels if a < b) {
      val (dotQ, cos) = got((a, b))
      val ca = cent(a); val cb = cent(b)
      val dot = ca.zip(cb).map { case (x, y) => x * y }.sum
      val na = ca.map(x => x * x).sum
      val nb = cb.map(x => x * x).sum
      assert(dot === dotQ, s"dot($a,$b)")
      assert(cos === dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)),
        s"cos($a,$b)")
    }
  }
}
