package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}

/** Oracle-independent brute forces for the round-14 sketch-algebra
  * batch: HLL set-union merge (q237), rolling-window distinct via daily
  * register merge (q238), Bloom membership FPR (q239), and the
  * log-linear relative-error percentile sketch (q240) — plain Scala
  * over collected sf0.001 rows. Beyond row equality, each spec pins the
  * sketch's DEFINING guarantee: merged registers ≡ registers of the
  * union (mergeability), zero Bloom false negatives, and the 1/32
  * relative-error bound on every reported percentile.
  */
class Round14cEvalSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  private def hash56(s: String): Long =
    graft.expressions.Hash56.hash(s.getBytes("UTF-8"))

  /** (bucket, rho) of one key — the shared register arithmetic. */
  private def reg(key: String): (Long, Long) = {
    val h = hash56(key)
    val w = h % 1125899906842624L
    (h / 1125899906842624L,
      if (w == 0L) 51L else 51L - java.lang.Long.toBinaryString(w).length)
  }

  private def estimate(regs: Map[Long, Long]): Long = {
    val sp = regs.values.map(r => 4398046511104L >> math.min(r, 42L).toInt).sum
    2905L * 4398046511104L / (sp + (64L - regs.size) * 4398046511104L)
  }

  private def fold(keys: Seq[String]): Map[Long, Long] =
    keys.map(reg).groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }

  test("q237 equals the brute merge, and merged registers ARE the union's registers") {
    val rows = Tables.events(spark, sf0001)
      .selectExpr("event_type",
        "cast(user_id as string) || '_' || cast(unix_micros(ts) div 86400000000 as string) AS k")
      .as[(String, String)].collect()
    val perType = rows.groupBy(_._1).view.mapValues(rs => rs.map(_._2).toSeq).toMap
    val typeRegs = perType.view.mapValues(fold).toMap
    // mergeability — the property the query exists to demonstrate:
    // elementwise max of per-type registers ≡ folding the union directly
    val merged = typeRegs.values.flatten.groupBy(_._1)
      .map { case (b, rs) => b -> rs.map(_._2).max }
    assert(merged === fold(rows.map(_._2).toSeq))
    val want = (typeRegs.map { case (t, m) =>
      (t, perType(t).distinct.length.toLong, estimate(m))
    }.toSeq :+ (("ALL", rows.map(_._2).distinct.length.toLong, estimate(merged))))
      .map { case (s, ex, est) => (s, ex, est, math.abs(est - ex) * 1000000L / ex) }
      .sortBy(_._1)
    val got = run("q237_hll_merge")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === want)
    // the sum-of-parts CANNOT answer the union question on this data
    val sumParts = typeRegs.values.map(estimate).sum
    assert(sumParts > estimate(merged) * 3 / 2,
      "per-type estimates should visibly over-count the union")
  }

  test("q238 equals the brute rolling merge over daily registers") {
    val rows = Tables.events(spark, sf0001)
      .selectExpr("cast(cast(round(value * 100) as bigint) as string) AS k",
        "unix_micros(ts) div 86400000000 AS day")
      .as[(String, Long)].collect()
    val byDay = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSeq).toMap
    val dailyRegs = byDay.view.mapValues(fold).toMap
    val want = byDay.keys.toSeq.sorted.map { d =>
      val win = (d - 6 to d).flatMap(dailyRegs.get)
      val merged = win.flatten.groupBy(_._1)
        .map { case (b, rs) => b -> rs.map(_._2).max }
      val exact = (d - 6 to d).flatMap(byDay.get).flatten.distinct.length.toLong
      val est = estimate(merged)
      (d, exact, est, math.abs(est - exact) * 1000000L / exact)
    }
    val got = run("q238_hll_rolling_distinct")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === want)
    // the series must span a real dynamic range (day 1 ramps up to the
    // full window) or the rolling merge is demonstrating nothing
    assert(want.last._2 > want.head._2 * 3)
  }

  test("q239 equals the brute Bloom report and never false-negatives a member") {
    val rows = Tables.events(spark, sf0001)
      .selectExpr("cast(user_id as string) || '_' || cast(unix_micros(ts) div 86400000000 as string) AS k",
        "event_type = 'purchase' AS p")
      .as[(String, Boolean)].collect()
    val isMem = rows.groupBy(_._1).view.mapValues(_.exists(_._2)).toMap
    val mem = isMem.collect { case (k, true) => k }.toSeq
    val probes = isMem.collect { case (k, false) => k }.toSeq
    val m = 1L << java.lang.Long.toBinaryString(8L * mem.length - 1).length
    def idx(j: Int, k: String): Long = hash56(s"bf${j}_$k") % m
    val bits = (for (k <- mem; j <- 0 until 3) yield (j, idx(j, k))).toSet
    // no false negatives — by construction, asserted anyway
    mem.foreach(k => assert((0 until 3).forall(j => bits((j, idx(j, k))))))
    val fp = probes.count(k => (0 until 3).forall(j => bits((j, idx(j, k)))))
    val row = run("q239_bloom_fpr").collect().head
    assert(row.getAs[Long]("n_members") === mem.length.toLong)
    assert(row.getAs[Long]("n_probes") === probes.length.toLong)
    assert(row.getAs[Long]("n_bits") === m)
    assert(row.getAs[Long]("n_bits_set") === bits.size.toLong)
    assert(row.getAs[Long]("n_false_pos") === fp.toLong)
    assert(row.getAs[Long]("fpr_ppm") === fp.toLong * 1000000L / probes.length)
  }

  test("q240 equals the brute sketch and every error is inside the 1/32 bound") {
    val rows = Tables.events(spark, sf0001)
      .selectExpr("event_type", "cast(round(value * 100) as bigint) AS cents")
      .as[(String, Long)].collect()
    def rep(c: Long): Long =
      if (c < 32) c
      else {
        val msb = java.lang.Long.toBinaryString(c).length - 1
        val sub = (c >> (msb - 4)) & 15
        ((16 + sub) << (msb - 4)) + (1L << (msb - 4)) / 2
      }
    def nearestRank(sorted: Seq[(Long, Long)], q: Int): Long = {
      val n = sorted.map(_._2).sum
      val target = (n * q + 99) / 100
      var cum = 0L
      sorted.collectFirst {
        case (v, c) if { cum += c; cum >= target } => v
      }.get
    }
    val want = rows.groupBy(_._1).toSeq.map { case (t, rs) =>
      val cents = rs.map(_._2)
      val exact = cents.groupBy(identity).toSeq
        .map { case (v, g) => (v, g.length.toLong) }.sortBy(_._1)
      val sk = cents.map(rep).groupBy(identity).toSeq
        .map { case (v, g) => (v, g.length.toLong) }.sortBy(_._1)
      val (e50, e99) = (nearestRank(exact, 50), nearestRank(exact, 99))
      val (s50, s99) = (nearestRank(sk, 50), nearestRank(sk, 99))
      (t, e50, s50, math.abs(s50 - e50) * 1000000L / e50,
        e99, s99, math.abs(s99 - e99) * 1000000L / e99)
    }.sortBy(_._1)
    val got = run("q240_loglinear_percentiles")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === want)
    // the sketch's guarantee: the representative of the covering bucket
    // is within 1/32 of the true order statistic
    got.foreach { r =>
      assert(r._4 <= 31250L, s"${r._1} p50 outside the relative bound")
      assert(r._7 <= 31250L, s"${r._1} p99 outside the relative bound")
    }
  }
}
