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

/** Property: compacting at ANY point after the open segment's start
  * preserves every as-of view (before, inside, and after the compacted
  * range), for random datasets split into random base+delta commits.
  */
class CompactionPropertySpec extends AnyFunSuite {
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

  // (key, hour, value) over a 96h horizon, 5 keys
  private val rowGen = for {
    k <- Gen.chooseNum(1, 5)
    h <- Gen.chooseNum(0, 96)
    v <- Gen.identifier.map(_.take(4))
  } yield (k.toString, h, v)

  private val caseGen = for {
    n <- Gen.chooseNum(2, 25)
    rows <- Gen.listOfN(n, rowGen)
    cut <- Gen.chooseNum(1, 95)     // base/delta split hour
    compactAt <- Gen.chooseNum(1, 97)
    numFiles <- Gen.oneOf(1, 3)     // single-file base vs distributed
  } yield (rows, cut, compactAt, numFiles)

  private def scanVals(lake: String, asOf: AsOf): Seq[(String, String)] =
    AzofScan.scan(spark, lake, "t", asOf).select("key", "value")
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq

  test("compaction at a random point preserves every as-of view") {
    (1 to 5).foreach { i =>
      val (rows, cut, compactAt, numFiles) =
        caseGen(Gen.Parameters.default, Seed(i.toLong * 7)).get
      val lake = Files.createTempDirectory(s"azof-cprop$i").toString
      AzofWriter.createTable(spark, lake, "t", schema, t0)
      val (baseRows, deltaRows) = rows.partition(_._2 <= cut)
      if (baseRows.nonEmpty)
        AzofWriter.commitBase(spark, lake, "t", df(baseRows))
      if (deltaRows.nonEmpty)
        AzofWriter.commitDelta(spark, lake, "t", df(deltaRows),
          hourTs(cut), hourTs(97))

      val probes = Seq(AsOf.Current) ++
        Seq(0, cut, compactAt - 1, compactAt, 96).map(h =>
          AsOf.EventTime(hourTs(h)))
      val before = probes.map(scanVals(lake, _))

      AzofWriter.compact(spark, lake, "t", hourTs(compactAt),
        numFiles = numFiles)

      val after = probes.map(scanVals(lake, _))
      assert(after == before,
        s"case $i (cut=$cut, compactAt=$compactAt, files=$numFiles): views diverged")
    }
  }
}
