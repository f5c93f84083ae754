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

/** Property: after random commit/compaction histories plus planted
  * orphans, vacuum(keep=1) deletes every orphan, keeps every referenced
  * file, and leaves all as-of views bit-identical.
  */
class VacuumPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  private val t0 = Instant.parse("2024-01-01T00:00:00Z")
  private def hourTs(h: Int) = t0.plusSeconds(h * 3600L)

  private def df(rows: Seq[(String, Int, String)]) = {
    val data = rows.map { case (k, h, v) =>
      Row(k, Timestamp.from(hourTs(h)), v)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data), schema.toStruct)
  }

  private val rowGen = for {
    k <- Gen.chooseNum(1, 4)
    h <- Gen.chooseNum(0, 48)
    v <- Gen.identifier.map(_.take(4))
  } yield (k.toString, h, v)

  private val caseGen = for {
    baseRows <- Gen.nonEmptyListOf(rowGen).map(_.take(10))
    deltaRows <- Gen.nonEmptyListOf(rowGen).map(_.take(10))
    doCompact <- Gen.oneOf(true, false)
    compactAt <- Gen.chooseNum(1, 49)
  } yield (baseRows, deltaRows, doCompact, compactAt)

  private def views(lake: String): Seq[Seq[(String, String)]] =
    (Seq(AsOf.Current) ++ Seq(0, 12, 24, 48).map(h => AsOf.EventTime(hourTs(h))))
      .map(a => AzofScan.scan(spark, lake, "t", a).select("key", "value")
        .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq)

  test("random commit/compact/vacuum sequences preserve every retained view") {
    // interplay property (vacuum × compaction): drive a random operation
    // sequence and assert after every vacuum that (a) every snapshot
    // version still on disk scans exactly as it did when it was current,
    // and (b) a sweep of event-time views through the head snapshot is
    // unchanged — i.e. vacuum never deletes a file any remaining
    // snapshot references, no matter how compaction restructured the tree
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 7919L)
      val lake = Files.createTempDirectory(s"azof-vseq$seed").toString
      AzofWriter.createTable(spark, lake, "t", schema, t0)
      def table = AzofTable(spark, lake, "t")
      def scanVersion(id: String): Seq[(String, String)] = {
        val t = table
        AzofScan.scanSnapshot(spark, t, t.snapshot(id), AsOf.Current)
          .select("key", "value").collect()
          .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
      }
      def randRows(hFrom: Int, hTo: Int) = Seq.fill(1 + rnd.nextInt(4)) {
        ((1 + rnd.nextInt(5)).toString,
          hFrom + rnd.nextInt(math.max(1, hTo - hFrom)),
          s"v${rnd.nextInt(100)}")
      }
      AzofWriter.commitBase(spark, lake, "t", df(randRows(0, 2)))
      var hour = 2
      // versionId -> its Current scan at the moment it was committed
      val expected = scala.collection.mutable.Map(
        table.currentVersion -> scanVersion(table.currentVersion))
      var headViews = views(lake)
      for (step <- 0 until 8) {
        rnd.nextInt(4) match {
          case 0 | 1 =>
            AzofWriter.commitDelta(spark, lake, "t",
              df(randRows(hour, hour + 2)), hourTs(hour), hourTs(hour + 2))
            hour += 2
          case 2 =>
            AzofWriter.compact(spark, lake, "t", hourTs(hour),
              numFiles = 1 + rnd.nextInt(2))
            hour += 1
          case 3 =>
            AzofVacuum.vacuum(spark, lake, "t",
              keepLast = 1 + rnd.nextInt(2), minAgeMs = 0)
        }
        expected(table.currentVersion) = scanVersion(table.currentVersion)
        headViews = views(lake)
        // after EVERY step (vacuum included): all versions still on
        // disk scan as recorded, and head event-time views are stable
        val onDisk = new java.io.File(lake, "t").list()
          .filter(n => n.startsWith("s") && n.endsWith(".json"))
          .map(_.stripPrefix("s").stripSuffix(".json")).toSeq
        onDisk.filter(expected.contains).foreach { id =>
          assert(scanVersion(id) == expected(id),
            s"seed $seed step $step: version $id diverged")
        }
        assert(views(lake) == headViews,
          s"seed $seed step $step: head views diverged")
      }
    }
  }

  test("vacuum preserves all views and removes exactly the orphans") {
    (1 to 4).foreach { i =>
      val (baseRows, deltaRows, doCompact, compactAt) =
        caseGen(Gen.Parameters.default, Seed(i.toLong * 13)).get
      val lake = Files.createTempDirectory(s"azof-vprop$i").toString
      AzofWriter.createTable(spark, lake, "t", schema, t0)
      AzofWriter.commitBase(spark, lake, "t", df(baseRows))
      AzofWriter.commitDelta(spark, lake, "t", df(deltaRows),
        hourTs(0), hourTs(49))
      if (doCompact)
        AzofWriter.compact(spark, lake, "t", hourTs(compactAt))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(lake, "t", s"orphan_$i.parquet"), Array[Byte](1))

      val before = views(lake)
      val rep = AzofVacuum.vacuum(spark, lake, "t", keepLast = 1, minAgeMs = 0)
      assert(rep.deletedDataFiles == Seq(s"orphan_$i.parquet"),
        s"case $i: deleted ${rep.deletedDataFiles}")
      assert(views(lake) == before, s"case $i: views diverged after vacuum")
    }
  }
}
