package graft.operators

import java.sql.Timestamp
import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("leftAsOf picks latest at-or-before per key, null when none") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 09:00:00"), 200L) // key 2 has no prior right row
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 500L, 5.0),
      (1L, ts("2024-01-01 11:00:00"), 501L, 6.0),
      (1L, ts("2024-01-01 13:00:00"), 502L, 7.0), // after both left rows
      (2L, ts("2024-01-01 09:30:00"), 600L, 8.0)  // after key 2's left row
    ).toDF("k", "ts", "lid", "v")
    val res = AsOfJoin.leftAsOf(left, right, "k", "ts", "lid", Seq("lid", "v"))
      .collect().map(r => (r.getAs[Long]("lid"),
        Option(r.getAs[java.lang.Long]("asof_lid")).map(_.toLong))).toMap
    assert(res(100L) == Some(500L)) // 09:30 click, not 11:00
    assert(res(101L) == Some(501L)) // advanced to 11:00
    assert(res(200L) == None)       // nothing at-or-before
  }

  test("payload is atomic: a null field in the winning right row stays null") {
    // right@10:00 has v=5.0; right@11:00 (the as-of winner) has v=NULL.
    // Per-column carry-forward would stitch (501, 5.0) — a row that never
    // existed; the winner's fields must arrive together: (501, null).
    val left = Seq((1L, ts("2024-01-01 12:00:00"), 100L)).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 500L, Some(5.0)),
      (1L, ts("2024-01-01 11:00:00"), 501L, None)
    ).toDF("k", "ts", "lid", "v")
    val r = AsOfJoin.leftAsOf(left, right, "k", "ts", "lid", Seq("lid", "v"))
      .collect().head
    assert(r.getAs[Long]("asof_lid") == 501L)
    assert(r.isNullAt(r.fieldIndex("asof_v")))
  }

  test("right row at exactly left.ts is visible; equal-ts ties take larger tieBreak") {
    val t = ts("2024-01-01 10:00:00")
    val left = Seq((1L, t, 100L)).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, t, 500L, 1.0),
      (1L, t, 501L, 2.0) // same key+ts: larger tieBreak wins
    ).toDF("k", "ts", "lid", "v")
    val res = AsOfJoin.leftAsOf(left, right, "k", "ts", "lid", Seq("lid"))
      .collect()
    assert(res.length == 1)
    assert(res.head.getAs[Long]("asof_lid") == 501L)
  }
}
