package graft.expressions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MinKLongSpec extends SparkSpec {
  import spark.implicits._

  private val mink3 = udaf(new MinKLong(3))

  test("selection equals the row_number window twin under any partitioning") {
    val rows = (0 until 400).map { i =>
      (s"g${i % 7}", (i * 2654435761L) % 100000L, i.toLong)
    }
    for (parts <- Seq(1, 3, 8)) {
      val df = rows.toDF("g", "pri", "id").repartition(parts)
      val got = df.groupBy("g").agg(mink3(col("pri"), col("id")).as("keep"))
        .select(col("g"), explode(col("keep")).as("e"))
        .select(col("g"), col("e._1").as("pri"), col("e._2").as("id"))
        .as[(String, Long, Long)].collect().toSet
      val w = Window.partitionBy("g").orderBy("pri", "id")
      val want = df.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3).select("g", "pri", "id")
        .as[(String, Long, Long)].collect().toSet
      assert(got === want, s"parts=$parts")
    }
  }

  test("56-bit priorities compare exactly where a double score would collide") {
    // 2^55 and 2^55 + 1 are the same double (53-bit mantissa) but
    // different longs — the case that motivates MinKLong over TopK
    val a = 1L << 55
    val b = a + 1
    assert(a.toDouble === b.toDouble, "premise: the doubles collide")
    val df = Seq(("g", b, 1L), ("g", a, 2L)).toDF("g", "pri", "id")
    val mink1 = udaf(new MinKLong(1))
    val got = df.groupBy("g").agg(mink1(col("pri"), col("id")).as("keep"))
      .select(explode(col("keep")).as("e"))
      .select(col("e._2").as("id")).as[Long].collect().toSeq
    // exact integer comparison keeps id=2 (priority 2^55), not the
    // tie-break-on-id answer a double score would produce (id=1)
    assert(got === Seq(2L))
  }

  test("reduce respects the bound: a full buffer rejects a worse pair without resorting") {
    val agg = new MinKLong(2)
    val buf = agg.merge(agg.reduce(agg.reduce(agg.zero, (10L, 1L)), (20L, 2L)), agg.zero)
    assert(agg.finish(agg.reduce(buf, (30L, 3L))) === Seq((10L, 1L), (20L, 2L)))
    assert(agg.finish(agg.reduce(buf, (15L, 3L))) === Seq((10L, 1L), (15L, 3L)))
    assert(agg.finish(agg.reduce(buf, (10L, 0L))) === Seq((10L, 0L), (10L, 1L)))
  }
}
