package graft.expressions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SortedIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  test("merge count equals size(array_intersect) on sorted distinct arrays") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)), // partial overlap
      (Seq.empty[Long], Seq(1L, 2L)),              // empty left
      (Seq(4L, 8L), Seq.empty[Long]),              // empty right
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),          // identical
      (Seq(1L, 2L), Seq(3L, 4L))                   // disjoint
    ).toDF("a", "b")
    val got = df.select(
      SortedIntersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .as[(Long, Long)].collect()
    got.foreach { case (fast, ref) => assert(fast === ref) }
  }

  test("null array yields null (null-intolerant binary contract)") {
    val df = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]]))
      .toDF("a", "b")
    val r = df.select(SortedIntersectCount(col("a"), col("b")).as("c"))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("misuse fails at analysis, not at runtime (ADVICE r16 #5)") {
    // applied to non-array<long> inputs the merge walk would read
    // garbage via ArrayData.getLong — checkInputDataTypes must reject
    val strings = Seq((Seq("a"), Seq("a"))).toDF("a", "b")
    val ex = intercept[Exception] {
      strings.select(SortedIntersectCount(col("a"), col("b"))).collect()
    }
    assert(ex.isInstanceOf[AnalysisException] ||
      ex.getMessage.contains("array<bigint>"),
      s"expected an analysis-time type failure, got: ${ex.getMessage}")
    val ints = Seq((1, 2)).toDF("a", "b")
    intercept[Exception] {
      ints.select(SortedIntersectCount(col("a"), col("b"))).collect()
    }
  }
}
