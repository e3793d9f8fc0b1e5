package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("encode/decode round-trip and column form agree with the driver form") {
    // deterministic pseudo-random sample of the grid (no Math.random —
    // spec determinism discipline)
    val pts = (0 until 500).map { i =>
      val x = (i * 2654435761L) % ZOrder.Grid
      val y = (i * 40503L + 7) % ZOrder.Grid
      (x, y)
    }
    pts.foreach { case (x, y) =>
      assert(ZOrder.decode(ZOrder.encode(x, y)) === ((x, y)))
    }
    val viaColumn = pts.toDF("x", "y")
      .select(ZOrder.zval(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    assert(viaColumn === pts.map { case (x, y) => ZOrder.encode(x, y) })
  }

  test("zRanges without coalescing covers exactly the box") {
    val (xlo, xhi, ylo, yhi) = (3L, 12L, 5L, 9L)
    val ranges = ZOrder.zRanges(xlo, xhi, ylo, yhi, maxRanges = Int.MaxValue)
    val inRanges = ranges.flatMap { case (lo, hi) => lo to hi }.toSet
    val box = (for (x <- xlo to xhi; y <- ylo to yhi) yield ZOrder.encode(x, y)).toSet
    assert(inRanges === box, "uncoalesced decomposition is exact")
    // sorted, disjoint, non-touching after the merge pass
    ranges.sliding(2).foreach {
      case Seq((_, aHi), (bLo, _)) => assert(bLo > aHi + 1)
      case _ =>
    }
  }

  test("zRanges coalesced to the cap stays a superset and respects the cap") {
    val (xlo, xhi, ylo, yhi) = (100L, 413L, 37L, 290L)
    val exact = ZOrder.zRanges(xlo, xhi, ylo, yhi, maxRanges = Int.MaxValue)
    val capped = ZOrder.zRanges(xlo, xhi, ylo, yhi)
    assert(capped.size <= ZOrder.MaxRanges)
    // every exact interval sits inside some capped interval
    assert(exact.forall { case (lo, hi) =>
      capped.exists { case (clo, chi) => clo <= lo && hi <= chi } })
  }

  test("z-ordered layout skips row groups for a 2-D box (IO tracks selectivity)") {
    // self-contained grid corpus at full coordinate spread — the
    // fixture events at sf0.001 only occupy x < 15, which exercises
    // nothing of the 2-D story
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder-spec-")
    graft.TempDirs.cleanupOnExit(dir)
    val n = 40000
    val rows = (0 until n).map { i =>
      val x = (i * 2654435761L) % ZOrder.Grid
      val y = (i * 40503L + 7) % ZOrder.Grid
      (i.toLong, x, y)
    }
    val base = dir.resolve("grid").toString
    rows.toDF("id", "x", "y")
      .withColumn("zval", ZOrder.zval(col("x"), col("y")))
      .repartitionByRange(16, col("zval"))
      .sortWithinPartitions("zval")
      .write.parquet(base)

    val (xlo, xhi, ylo, yhi) = (64L, 191L, 32L, 159L)
    val ranges = ZOrder.zRanges(xlo, xhi, ylo, yhi)
    val q = spark.read.parquet(base)
      .filter(ZOrder.rangesPredicate(col("zval"), ranges))
      .filter(col("x").between(xlo, xhi) && col("y").between(ylo, yhi))
      .select("id")
    val got = q.as[Long].collect().toSet
    val want = rows.collect {
      case (id, x, y) if x >= xlo && x <= xhi && y >= ylo && y <= yhi => id
    }.toSet
    assert(got === want, "the screened scan returns exactly the box")

    // the property that IS the feature: pushed z intervals skip row
    // groups, so the scan emits far fewer rows than the table holds
    // (a 1-D layout on x alone could not prune on y)
    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val scanned = scan.metrics("numOutputRows").value
    assert(scanned < n / 4,
      s"z-interval screen must skip most row groups: scanned $scanned of $n")
  }

  test("q105 equals the raw-table box replay at sf0.001") {
    val got = graft.SparkEntry.queries("q105_zorder_scan")(spark, sf0001)
      .select("event_id").as[Long].collect().toSeq
    val want = graft.Tables.events(spark, sf0001)
      .filter(graft.ZOrderTables.xCol.between(8L, 191L)
        && graft.ZOrderTables.yCol.between(32L, 159L))
      .select("event_id").orderBy("event_id").as[Long].collect().toSeq
    assert(got === want)
  }
}
