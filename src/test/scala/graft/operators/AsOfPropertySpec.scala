package graft.operators

import graft.TestSpark
import graft.format._
import graft.sources.AzofWriter
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property: for a random versioned dataset randomly split into base +
  * delta commits, scan(asOf) must equal the brute-force "latest
  * event_time <= asOf per key" computed on the raw rows (ties broken by
  * commit precedence: later commit wins, matching newest-delta-first file
  * precedence).
  */
class AsOfPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  private val t0 = Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
  private val hour = 3600L * 1000

  // (key, hourOffset, value)
  private val rowGen = for {
    k <- Gen.chooseNum(1, 6)
    h <- Gen.chooseNum(0, 72)
    v <- Gen.alphaStr.map(_.take(4))
  } yield (k.toString, h, v)

  private val datasetGen = for {
    n <- Gen.chooseNum(1, 40)
    rows <- Gen.listOfN(n, rowGen)
    cut1 <- Gen.chooseNum(0, 72)
    cut2 <- Gen.chooseNum(0, 72)
    probe <- Gen.chooseNum(-1, 73)
  } yield (rows, math.min(cut1, cut2), math.max(cut1, cut2), probe)

  test("scan(asOf) == brute-force latest<=asOf per key (random splits)") {
    for (seed <- 1 to 12) {
      val (rows, cut1, cut2, probeH) =
        datasetGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      if (rows.nonEmpty) {
        val lake = Files.createTempDirectory("azof-prop").toString
        AzofWriter.createTable(spark, lake, "p", schema, Instant.ofEpochMilli(t0))

        // split rows into up to three commits by event-hour
        val commits = Seq(
          rows.filter(_._2 <= cut1),
          rows.filter(r => r._2 > cut1 && r._2 <= cut2),
          rows.filter(_._2 > cut2))
        // each commit's delta window starts where its rows start, so delta
        // starts are distinct and newest-start-first precedence holds
        val windowStarts = Seq(0L, (cut1 + 1).toLong, (cut2 + 1).toLong)
        var first = true
        commits.zipWithIndex.foreach { case (cr, i) =>
          if (cr.nonEmpty) {
            val data = cr.map { case (k, h, v) =>
              Row(k, new Timestamp(t0 + h * hour), v)
            }
            val df = spark.createDataFrame(
              spark.sparkContext.parallelize(data), schema.toStruct)
            if (first) { AzofWriter.commitBase(spark, lake, "p", df); first = false }
            else AzofWriter.commitDelta(spark, lake, "p", df,
              Instant.ofEpochMilli(t0 + windowStarts(i) * hour),
              Instant.ofEpochMilli(t0 + 100 * hour))
          }
        }

        val asOfMs = t0 + probeH * hour
        val got = AzofScan.scan(spark, lake, "p",
            AsOf.EventTime(Instant.ofEpochMilli(asOfMs)))
          .select("key", "event_time", "value").collect()
          .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getString(2)))
          .sortBy(_._1).toSeq

        // brute force on the raw rows: commit index = precedence (later
        // commit file sorts newer-start ⇒ higher precedence); within a
        // commit, writeDataFile sorts ts desc and the reference takes the
        // first in-range row per key ⇒ max ts wins; equal-ts rows within
        // one commit are unordered, so generate expecting value-agnostic
        // comparison on (key, ts) and check value matches *some* max-row.
        val visible = commits.zipWithIndex.flatMap { case (cr, i) =>
          cr.map { case (k, h, v) => (k, t0 + h * hour, v, i) }
        }.filter(_._2 <= asOfMs)
        val expected = visible.groupBy(_._1).map { case (k, rs) =>
          val maxTs = rs.map(_._2).max
          val atMax = rs.filter(_._2 == maxTs)
          val maxCommit = atMax.map(_._4).max
          (k, maxTs, atMax.filter(_._4 == maxCommit).map(_._3).toSet)
        }.toSeq.sortBy(_._1)

        assert(got.map(r => (r._1, r._2)) == expected.map(e => (e._1, e._2)))
        got.zip(expected).foreach { case ((k, _, v), (_, _, vs)) =>
          assert(vs.contains(v), s"key $k value $v not in $vs")
        }
      }
    }
  }
}
