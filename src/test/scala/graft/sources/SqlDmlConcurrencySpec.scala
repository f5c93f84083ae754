package graft.sources

import graft.TestSpark
import graft.format._
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Concurrent row-level DML: each statement's task files land under
  * collision-free unique names and only the cheap metadata step
  * contends, so racing MERGE/UPDATE statements (and a racing library
  * delta commit) all land — the optimistic commit re-reads the winner's
  * snapshot and re-applies, never dropping a landed write.
  */
class SqlDmlConcurrencySpec extends AnyFunSuite {
  private lazy val lake = Files.createTempDirectory("azof-dmlc").toString
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.dmlc", classOf[AzofCatalog].getName)
    s.conf.set("spark.sql.catalog.dmlc.path", lake)
    s
  }

  private def ts(s: String) = Instant.parse(s)
  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  test("racing UPDATEs on disjoint keys all land") {
    AzofWriter.createTable(spark, lake, "t", schema,
      ts("2024-01-01T00:00:00Z"))
    val rows = (1 to 8).map(i =>
      Row(i.toString, Timestamp.from(ts("2024-01-05T00:00:00Z")), s"v$i"))
    AzofWriter.commitDelta(spark, lake, "t",
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows), schema.toStruct),
      ts("2024-01-05T00:00:00Z"), ts("2024-01-05T00:00:00Z"))
    val v0 = AzofTable(spark, lake, "t").currentVersion.toLong

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val statements = (1 to 4).map { i => () =>
      spark.sql(s"UPDATE dmlc.t SET value = concat(value, '_u$i') " +
        s"WHERE key IN ('${2 * i - 1}', '${2 * i}')")
    } :+ { () =>
      // a racing library commit contends for the same metadata slot
      AzofWriter.commitDelta(spark, lake, "t",
        spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(Row("9",
            Timestamp.from(ts("2024-01-06T00:00:00Z")), "v9"))),
          schema.toStruct),
        ts("2024-01-06T00:00:00Z"), ts("2024-01-06T00:00:00Z"))
      spark.emptyDataFrame
    }
    Await.result(
      Future.sequence(statements.map(f => Future(f()))), 120.seconds)

    // every statement landed exactly once: 5 new versions, all 8 keys
    // updated by exactly their thread, the racer's key present
    val t = AzofTable(spark, lake, "t")
    assert(t.currentVersion.toLong == v0 + 5)
    val got = spark.sql("SELECT key, value FROM dmlc.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    (1 to 8).foreach { k =>
      val owner = (k + 1) / 2
      assert(got(k.toString) == s"v${k}_u$owner")
    }
    assert(got("9") == "v9")
  }

  // -- write-conflict validation (deterministic, via the commit half the
  // SQL path drives: a statement that read at `readVersion` and wrote
  // keys [kmin, kmax] must fail iff a data-adding commit whose key range
  // may overlap landed in between) --

  private def seed(table: String, keys: Seq[String], at: String): Unit =
    AzofWriter.commitDelta(spark, lake, table,
      spark.createDataFrame(
        spark.sparkContext.parallelize(keys.map(k =>
          Row(k, Timestamp.from(ts(at)), s"v$k"))), schema.toStruct),
      ts(at), ts(at))

  private def landAttempt(
      table: String, readV: Long, kmin: String, kmax: String): Unit =
    AzofWriter.commitLandedDeltas(spark, lake, table,
      Seq(Delta(s"dml_test_${java.util.UUID.randomUUID()}.parquet",
        ts("2024-01-05T00:00:00Z"), ts("2024-01-05T00:00:00Z"),
        Some(FileStats(kmin, kmax)))),
      op = "sql-dml",
      validate = Some(AzofWriter.DmlConflictCheck(readV, kmin, kmax)))

  test("overlapping concurrent commit fails the statement; disjoint and " +
    "rewrite commits do not") {
    AzofWriter.createTable(spark, lake, "c1", schema,
      ts("2024-01-01T00:00:00Z"))
    seed("c1", Seq("a", "b", "c"), "2024-01-05T00:00:00Z") // v2
    val readV = AzofTable(spark, lake, "c1").currentVersion.toLong
    seed("c1", Seq("b"), "2024-01-06T00:00:00Z") // v3 — the racer

    // overlap with the racer's key range -> concurrent-modification
    val e = intercept[java.util.ConcurrentModificationException] {
      landAttempt("c1", readV, "a", "c")
    }
    assert(e.getMessage.contains(s"s${readV + 1}") &&
      e.getMessage.contains("read snapshot"))
    assert(AzofTable(spark, lake, "c1").currentVersion.toLong == readV + 1)

    // disjoint key range -> lands (the racer's file is ['b','b'])
    landAttempt("c1", readV, "x", "z")
    assert(AzofTable(spark, lake, "c1").currentVersion.toLong == readV + 2)

    // a compaction in the window is a content-preserving rewrite, never
    // a conflict (fresh table: compact scans, so no placeholder files)
    AzofWriter.createTable(spark, lake, "c1b", schema,
      ts("2024-01-01T00:00:00Z"))
    seed("c1b", Seq("a", "b", "c"), "2024-01-05T00:00:00Z")
    val readV2 = AzofTable(spark, lake, "c1b").currentVersion.toLong
    AzofWriter.compact(spark, lake, "c1b", ts("2024-01-07T00:00:00Z"))
    landAttempt("c1b", readV2, "a", "c")
    assert(AzofTable(spark, lake, "c1b").currentVersion.toLong == readV2 + 2)
  }

  test("SQL DML validates by default and honors the opt-out") {
    AzofWriter.createTable(spark, lake, "c2", schema,
      ts("2024-01-01T00:00:00Z"))
    seed("c2", Seq("k"), "2024-01-05T00:00:00Z")
    // same-session sequential statements never conflict (each reads the
    // previous one's commit) — the default-on path just works
    spark.sql("UPDATE dmlc.c2 SET value = concat(value, '!')")
    assert(spark.sql("SELECT value FROM dmlc.c2").collect()
      .map(_.getString(0)).toSeq == Seq("vk!"))
    // opt-out: validation skipped entirely (exercises the conf branch)
    spark.conf.set("spark.azof.dml.validateConflicts", "false")
    try {
      spark.sql("UPDATE dmlc.c2 SET value = concat(value, '?')")
      assert(spark.sql("SELECT value FROM dmlc.c2").collect()
        .map(_.getString(0)).toSeq == Seq("vk!?"))
    } finally spark.conf.unset("spark.azof.dml.validateConflicts")
  }
}
