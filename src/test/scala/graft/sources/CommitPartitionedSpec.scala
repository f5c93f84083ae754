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

/** The distributed multi-file commit must be indistinguishable from a
  * single-file commit at every as-of, while actually landing N files.
  */
class CommitPartitionedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))
  private val t0 = Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
  private val hour = 3600L * 1000

  private val rowGen = for {
    k <- Gen.chooseNum(1, 8)
    h <- Gen.chooseNum(0, 96)
    v <- Gen.identifier.map(_.take(4))
  } yield (k.toString, h, v)

  private def df(rows: Seq[(String, Int, String)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, h, v) =>
        Row(k, new Timestamp(t0 + h * hour), v) }),
      schema.toStruct)

  private def scanVals(lake: String, asOf: AsOf): Seq[(String, Long, String)] =
    AzofScan.scan(spark, lake, "t", asOf)
      .select("key", "event_time", "value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getString(2)))
      .sortBy(r => (r._1, r._2)).toSeq

  test("commitPartitioned(N) scans identically to a single-file commit") {
    for (seed <- 1 to 4) {
      val rows = Gen.listOfN(30, rowGen)
        .apply(Gen.Parameters.default, Seed(seed.toLong * 11)).get
        // one row per (key, hour): complete-duplicate survivorship is
        // content-hash-determined and file-layout-dependent otherwise
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val lakeA = Files.createTempDirectory("azof-partA").toString
      val lakeB = Files.createTempDirectory("azof-partB").toString
      AzofWriter.createTable(spark, lakeA, "t", schema, Instant.ofEpochMilli(t0))
      AzofWriter.createTable(spark, lakeB, "t", schema, Instant.ofEpochMilli(t0))
      AzofWriter.commitPartitioned(spark, lakeA, "t", df(rows), numFiles = 4)
      AzofWriter.commitBase(spark, lakeB, "t", df(rows))

      val probes = Seq(AsOf.Current) ++ Seq(-1, 10, 48, 97).map(h =>
        AsOf.EventTime(Instant.ofEpochMilli(t0 + h * hour)))
      probes.foreach { p =>
        assert(scanVals(lakeA, p) == scanVals(lakeB, p),
          s"seed $seed, asOf $p: partitioned != single-file")
      }

      // the commit really is multi-file (up to numFiles, >1 for a 96h
      // spread) with disjoint, data-derived windows
      val snap = AzofTable(spark, lakeA, "t").currentSnapshot
      val deltas = snap.segments.flatMap(_.delta)
      assert(deltas.nonEmpty && deltas.size <= 4)
      if (rows.map(_._2).distinct.size >= 4) assert(deltas.size > 1)
      val windows = deltas.map(d => (d.start.toEpochMilli, d.end.toEpochMilli))
        .sortBy(_._1)
      windows.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 <= s2, "windows overlap")
        case _ =>
      }
      // every registered file exists on disk; tmp dir is gone
      val dir = new java.io.File(lakeA, "t")
      deltas.foreach(d => assert(new java.io.File(dir, d.file).isFile))
      assert(!dir.listFiles().exists(_.getName.startsWith("_tmp_part_")))
    }
  }

  test("a later commitDelta layers on top of a partitioned commit") {
    val lake = Files.createTempDirectory("azof-partC").toString
    AzofWriter.createTable(spark, lake, "t", schema, Instant.ofEpochMilli(t0))
    AzofWriter.commitPartitioned(spark, lake, "t",
      df(Seq(("1", 0, "a1"), ("2", 10, "b1"), ("3", 20, "c1"))), numFiles = 3)
    AzofWriter.commitDelta(spark, lake, "t", df(Seq(("1", 40, "a2"))),
      Instant.ofEpochMilli(t0 + 30 * hour), Instant.ofEpochMilli(t0 + 50 * hour))
    assert(scanVals(lake, AsOf.Current).map(r => (r._1, r._3)) ==
      Seq(("1", "a2"), ("2", "b1"), ("3", "c1")))
    assert(scanVals(lake, AsOf.EventTime(Instant.ofEpochMilli(t0 + 25 * hour)))
      .map(r => (r._1, r._3)) == Seq(("1", "a1"), ("2", "b1"), ("3", "c1")))
  }
}
