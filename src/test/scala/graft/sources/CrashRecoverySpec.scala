package graft.sources

import graft.TestSpark
import graft.format._
import graft.operators.AzofScan
import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Commit-chain resilience to crashed writers: a truncated snapshot
  * document (a writer that died mid-write, pre temp+rename) must not
  * wedge subsequent commits, snapshot writes themselves must be staged
  * (no partial s{N}.json can ever exist), and vacuum must sweep both the
  * corrupt document and `_tmp_` staging debris.
  */
class CrashRecoverySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  private def ts(s: String) = Instant.parse(s)

  private def df(rows: (String, String, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, v) =>
        Row(k, Timestamp.from(ts(t)), v) }),
      schema.toStruct)

  private def kv(lake: String, t: String): Seq[(String, String)] =
    AzofScan.scan(spark, lake, t, AsOf.Current)
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq

  test("a truncated s{N}.json past version.txt does not wedge commits") {
    val lake = Files.createTempDirectory("azof-crash").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1")))
    assert(AzofTable(spark, lake, "t").currentVersion == "2")

    // simulate a pre-temp+rename writer dying mid-write: a half-written
    // s3.json exists, version.txt still points at 2
    Files.write(Paths.get(lake, "t", "s3.json"),
      "{\"schema\": {\"col".getBytes("UTF-8"))

    // the next commit must base itself on the highest PARSEABLE snapshot
    // (s2), land past the corrupt name (s4), and move the pointer forward
    AzofWriter.commitDelta(spark, lake, "t",
      df(("2", "2024-02-05T00:00:00Z", "b1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
    assert(AzofTable(spark, lake, "t").currentVersion == "4")
    assert(kv(lake, "t") == Seq("1" -> "a1", "2" -> "b1"))

    // a second commit keeps working (the chain is healthy, not lucky)
    AzofWriter.commitDelta(spark, lake, "t",
      df(("3", "2024-02-06T00:00:00Z", "c1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
    assert(AzofTable(spark, lake, "t").currentVersion == "5")
    assert(kv(lake, "t") == Seq("1" -> "a1", "2" -> "b1", "3" -> "c1"))

    // vacuum treats the unparseable document as expireable debris —
    // regardless of the retention range — and every retained version
    // still scans
    val rep = AzofVacuum.vacuum(spark, lake, "t",
      keepLast = 10, minAgeMs = 0L)
    assert(rep.deletedSnapshots.contains(3))
    assert(!Files.exists(Paths.get(lake, "t", "s3.json")))
    assert(kv(lake, "t") == Seq("1" -> "a1", "2" -> "b1", "3" -> "c1"))
  }

  test("a well-formed-unknown snapshot is NOT debris: commit and vacuum refuse loudly") {
    val lake = Files.createTempDirectory("azof-crash4").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1")))

    // a COMPLETE JSON object past version.txt that this codec cannot
    // read as a snapshot: plausibly a newer engine's committed document.
    // Unlike the truncated case above, skipping it would fork its commit
    // away and deleting it would destroy a commit — both must refuse.
    val foreign = Paths.get(lake, "t", "s3.json")
    Files.write(foreign,
      "{\"format_version\": 99, \"segments_v2\": []}".getBytes("UTF-8"))

    val commitErr = intercept[IllegalStateException] {
      AzofWriter.commitDelta(spark, lake, "t",
        df(("2", "2024-02-05T00:00:00Z", "b1")),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
    }
    assert(commitErr.getMessage.contains("newer engine"))

    val vacuumErr = intercept[IllegalArgumentException] {
      AzofVacuum.vacuum(spark, lake, "t", keepLast = 10, minAgeMs = 0L)
    }
    assert(vacuumErr.getMessage.contains("s3.json"))
    // the document survives both refusals
    assert(Files.exists(foreign))
    // and the table itself still reads fine at its committed version
    assert(kv(lake, "t") == Seq("1" -> "a1"))
  }

  test("snapshot writes are staged: no partial final file, no tmp residue") {
    val lake = Files.createTempDirectory("azof-crash2").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1")))

    // first-writer-wins is preserved through the rename path
    val snap = AzofTable(spark, lake, "t").currentSnapshot
    intercept[java.io.IOException] {
      AzofWriter.writeSnapshot(spark, s"$lake/t", "2", snap)
    }

    // successful and refused writes alike leave no _tmp_snap_ staging
    // files behind
    val stray = Files.list(Paths.get(lake, "t")).toArray.map(_.toString)
      .filter(_.contains("_tmp_snap_"))
    assert(stray.isEmpty, s"staging residue: ${stray.mkString(",")}")
  }

  test("vacuum sweeps aged _tmp_ staging debris") {
    val lake = Files.createTempDirectory("azof-crash3").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1")))
    // crashed staging attempts: a lone snapshot temp and a parquet
    // staging directory
    Files.write(Paths.get(lake, "t", "_tmp_snap_dead.json"),
      "{".getBytes("UTF-8"))
    Files.createDirectory(Paths.get(lake, "t", "_tmp_deaddir"))
    Files.write(Paths.get(lake, "t", "_tmp_deaddir", "part-0.parquet"),
      Array[Byte](1, 2, 3))

    val rep = AzofVacuum.vacuum(spark, lake, "t", keepLast = 10, minAgeMs = 0L)
    // staging debris is reported in its own field — deletedDataFiles
    // stays parquet-data-file names only
    assert(rep.deletedTmpFiles.nonEmpty)
    assert(rep.deletedTmpFiles.forall(_.startsWith("_tmp_")))
    assert(!rep.deletedDataFiles.exists(_.startsWith("_tmp_")))
    assert(!Files.exists(Paths.get(lake, "t", "_tmp_snap_dead.json")))
    assert(!Files.exists(Paths.get(lake, "t", "_tmp_deaddir")))
    assert(kv(lake, "t") == Seq("1" -> "a1"))
  }
}
