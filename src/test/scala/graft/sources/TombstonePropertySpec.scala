package graft.sources

import graft.TestSpark
import graft.format._
import graft.operators.AzofScan
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property: under random interleavings of delta commits and tombstone
  * deletes (with distinct event hours, so ordering is unambiguous), the
  * scan at every probe instant equals the brute-force model — per key,
  * the newest event at-or-before the probe wins, and the key is absent
  * iff that winner is a tombstone. Random compaction points must not
  * change any probe's answer (no resurrection, no loss).
  */
class TombstonePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  private val t0 = Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
  private val hour = 3600L * 1000

  // one step: either an upsert (key, hour, value) or a delete (key, hour)
  private val stepGen: Gen[(String, Int, Option[String])] = for {
    k <- Gen.chooseNum(1, 5)
    h <- Gen.chooseNum(0, 96)
    del <- Gen.prob(0.3)
    v <- Gen.alphaStr.map(s => s"v${s.take(3)}")
  } yield (k.toString, h, if (del) None else Some(v))

  private val caseGen = for {
    n <- Gen.chooseNum(2, 24)
    steps <- Gen.listOfN(n, stepGen)
    compactAt <- Gen.option(Gen.chooseNum(1, 96))
    probes <- Gen.listOfN(4, Gen.chooseNum(-1, 98))
  } yield (steps, compactAt, probes)

  test("random delete interleavings: scan == model at every probe, with and without compaction") {
    for (seed <- 1 to 10) {
      val (steps0, compactAt, probes) =
        caseGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      // distinct hours: ties between a delete and an upsert at the same
      // instant resolve by file precedence (commit order), which the
      // model would have to mirror commit-by-commit — the UNAMBIGUOUS
      // portion of the semantics is what this property pins; exact-tie
      // behavior is pinned deterministically in TombstoneSpec
      val steps = steps0.distinctBy(_._2)
      if (steps.nonEmpty) {
        val lake = Files.createTempDirectory("azof-tprop").toString
        AzofWriter.createTable(spark, lake, "p", schema,
          Instant.ofEpochMilli(t0))
        // one commit per step, in list order (commit order != time order:
        // backdated deletes and late-arriving upserts happen naturally)
        steps.foreach { case (k, h, upsert) =>
          upsert match {
            case Some(v) =>
              val df = spark.createDataFrame(
                spark.sparkContext.parallelize(
                  Seq(Row(k, new Timestamp(t0 + h * hour), v))),
                schema.toStruct)
              AzofWriter.commitDelta(spark, lake, "p", df,
                Instant.ofEpochMilli(t0 + h * hour),
                Instant.ofEpochMilli(t0 + (h + 1) * hour))
            case None =>
              AzofWriter.commitDelete(spark, lake, "p", Seq(k),
                Instant.ofEpochMilli(t0 + h * hour))
          }
        }

        def model(probeH: Int): Seq[(String, Long, String)] =
          steps.filter(_._2 <= probeH).groupBy(_._1).toSeq.flatMap {
            case (k, rs) =>
              val (_, h, up) = rs.maxBy(_._2)
              up.map(v => (k, t0 + h * hour, v))
          }.sortBy(_._1)

        def scan(probeH: Int): Seq[(String, Long, String)] =
          AzofScan.scan(spark, lake, "p",
              AsOf.EventTime(Instant.ofEpochMilli(t0 + probeH * hour)))
            .select("key", "event_time", "value").collect()
            .map(r => (r.getString(0), r.getTimestamp(1).getTime,
              r.getString(2)))
            .sortBy(_._1).toSeq

        probes.foreach { p =>
          assert(scan(p) == model(p),
            s"seed $seed probe $p diverged pre-compaction (steps: $steps)")
        }
        compactAt.foreach { c =>
          // compaction point must be after segment start and is an exact
          // hour, never colliding with a step's event (distinct domain)
          AzofWriter.compact(spark, lake, "p",
            Instant.ofEpochMilli(t0 + c * hour - 1))
          probes.foreach { p =>
            assert(scan(p) == model(p),
              s"seed $seed probe $p diverged AFTER compact@$c (steps: $steps)")
          }
        }
      }
    }
  }
}
