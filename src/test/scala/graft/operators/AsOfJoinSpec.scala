package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(s * 1000)

  test("latest at-or-before semantics, same-instant visibility, tie-break") {
    val left = Seq(
      (1L, "A", t(5)),   // before any right row -> null
      (2L, "A", t(10)),  // same instant as right id 100 -> 100
      (3L, "A", t(15)),  // between -> 100
      (4L, "A", t(25)),  // after both -> 200
      (5L, "B", t(50))   // key with tied right rows -> greatest id wins
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      ("A", t(10), 100L, 1.0),
      ("A", t(20), 200L, 2.0),
      ("B", t(40), 300L, 3.0),
      ("B", t(40), 301L, 3.5)
    ).toDF("user_id", "ts", "purchase_id", "purchase_value")

    val got = AsOfJoin.lastAtOrBefore(left, right, "user_id", "ts", "purchase_id")
      .select("event_id", "purchase_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === None)
    assert(got(2L) === Some(100L))
    assert(got(3L) === Some(100L))
    assert(got(4L) === Some(200L))
    assert(got(5L) === Some(301L))
  }
}
