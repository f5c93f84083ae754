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
