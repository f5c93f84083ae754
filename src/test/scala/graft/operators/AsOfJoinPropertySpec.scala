package graft.operators

import java.sql.Timestamp
import graft.TestSpark
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property: leftAsOf must equal the brute-force definition — for each
  * left row, among right rows with the same key and ts <= left.ts, the
  * one with the greatest (ts, tieBreak); null payload when none exists.
  */
class AsOfJoinPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val t0 = 1704067200000L // 2024-01-01T00:00:00Z
  private val minute = 60000L

  // (key, minuteOffset) — tight ranges force shared keys and ts ties
  private val evGen = for {
    k <- Gen.chooseNum(1, 4)
    m <- Gen.chooseNum(0, 30)
  } yield (k.toLong, m)

  private val caseGen = for {
    nl <- Gen.chooseNum(1, 25)
    nr <- Gen.chooseNum(0, 25)
    ls <- Gen.listOfN(nl, evGen)
    rs <- Gen.listOfN(nr, evGen)
  } yield (ls, rs)

  test("leftAsOf equals brute-force latest-at-or-before for random event sets") {
    import spark.implicits._
    (1 to 30).foreach { i =>
      val (ls, rs) = caseGen(Gen.Parameters.default, Seed(i.toLong)).get
      val left = ls.zipWithIndex.map { case ((k, m), idx) =>
        (k, new Timestamp(t0 + m * minute), 100L + idx)
      }.toDF("k", "ts", "lid")
      val right = rs.zipWithIndex.map { case ((k, m), idx) =>
        (k, new Timestamp(t0 + m * minute), 500L + idx, idx.toDouble)
      }.toDF("k", "ts", "lid", "v")

      val got = AsOfJoin.leftAsOf(left, right, "k", "ts", "lid", Seq("lid", "v"))
        .collect()
        .map(r => (r.getAs[Long]("lid"),
          Option(r.getAs[java.lang.Long]("asof_lid")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("asof_v")).map(_.toDouble)))
        .sortBy(_._1).toSeq

      val rightRows = rs.zipWithIndex.map { case ((k, m), idx) =>
        (k, t0 + m * minute, 500L + idx, idx.toDouble)
      }
      val expected = ls.zipWithIndex.map { case ((k, m), idx) =>
        val lts = t0 + m * minute
        val best = rightRows
          .filter(r => r._1 == k && r._2 <= lts)
          .sortBy(r => (r._2, r._3)) // latest ts, then larger tieBreak wins
          .lastOption
        (100L + idx, best.map(_._3), best.map(_._4))
      }.sortBy(_._1)

      assert(got == expected, s"case seed=$i: $got != $expected")
    }
  }
}
