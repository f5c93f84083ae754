package graft.streaming

import graft.TestSpark
import graft.format._
import graft.operators.AzofScan
import graft.sources.AzofWriter
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The streaming latest-per-key view must converge to EXACTLY the batch
  * Current scan after draining the append feed — including across a
  * checkpointed restart that only sees the new commits.
  */
class LatestViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  private def ts(s: String) = Instant.parse(s)

  private def df(rows: (String, String, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, v) =>
        Row(k, Timestamp.from(ts(t)), v) }),
      schema.toStruct)

  /** Drain the view with AvailableNow into an in-memory winner map
    * (update-mode emissions applied in order per batch).
    */
  private def drain(lake: String, ckpt: String): Map[String, (Long, String)] = {
    val winners = scala.collection.concurrent.TrieMap.empty[String, (Long, String)]
    val q = LatestView.latest(spark, lake, "t")
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
          batch.collect().foreach { r =>
            winners(r.getString(0)) =
              (r.getTimestamp(1).getTime, r.getString(2))
          }
          ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    winners.toMap
  }

  private def batchCurrent(lake: String): Map[String, (Long, String)] =
    AzofScan.scan(spark, lake, "t", AsOf.Current)
      .collect()
      .map(r => r.getString(0) -> ((r.getTimestamp(1).getTime, r.getString(2))))
      .toMap

  test("view ≡ batch Current after drain; restart applies only new commits") {
    val lake = Files.createTempDirectory("azof-lv").toString
    val ckpt = Files.createTempDirectory("azof-lv-ck").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t", df(
      ("1", "2024-01-02T00:00:00Z", "a1"),
      ("2", "2024-01-03T00:00:00Z", "b1")))
    AzofWriter.commitDelta(spark, lake, "t", df(
      ("1", "2024-02-05T00:00:00Z", "a2"),   // newer: replaces a1
      ("3", "2024-02-06T00:00:00Z", "c1"),
      ("2", "2024-01-01T00:00:00Z", "b0")),  // older: must NOT replace b1
      ts("2024-01-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))

    val got = drain(lake, ckpt)
    assert(got == batchCurrent(lake))
    assert(got("1")._2 == "a2" && got("2")._2 == "b1" && got("3")._2 == "c1")

    // restart from the SAME checkpoint: only the new commit's winners
    // are re-emitted, and they layer onto the recovered state
    AzofWriter.commitDelta(spark, lake, "t", df(
      ("2", "2024-03-05T00:00:00Z", "b2"),
      ("4", "2024-03-06T00:00:00Z", "d1")),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))
    val incr = drain(lake, ckpt)
    assert(incr.keySet == Set("2", "4"), s"re-emitted $incr")
    assert(incr("2")._2 == "b2")
    // recovered state + increments == fresh batch answer
    assert((got ++ incr) == batchCurrent(lake))
  }

  /** Drain the commit-exact delete-aware view: winners keyed by key,
    * value = (event_time, value-or-null, deleted).
    */
  private def drainCommitted(
      lake: String, ckpt: String): Map[String, (Long, Option[String], Boolean)] = {
    val winners =
      scala.collection.concurrent.TrieMap.empty[String, (Long, Option[String], Boolean)]
    val q = LatestView.latestCommitted(spark, lake, "t")
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
          batch.collect().foreach { r =>
            winners(r.getString(0)) = (r.getTimestamp(1).getTime,
              Option(r.getString(2)), r.getBoolean(3))
          }
          ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    winners.toMap
  }

  test("latestCommitted: deletes emit _deleted=true updates; re-inserts resurrect; view ≡ Current") {
    val lake = Files.createTempDirectory("azof-lvc").toString
    val ckpt = Files.createTempDirectory("azof-lvc-ck").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t", df(
      ("1", "2024-01-02T00:00:00Z", "a1"),
      ("2", "2024-01-03T00:00:00Z", "b1")))                          // v2
    AzofWriter.commitDelete(spark, lake, "t", Seq("1"),
      ts("2024-02-01T00:00:00Z"))                                    // v3

    val got = drainCommitted(lake, ckpt)
    assert(got("1")._3 && got("1")._2.isEmpty,
      "the deleted key's winner is the tombstone: _deleted=true, NULL value")
    assert(got("2") == ((ts("2024-01-03T00:00:00Z").toEpochMilli, Some("b1"), false)))
    // live rows of the view == batch Current
    assert(got.filterNot(_._2._3).map { case (k, (et, v, _)) => k -> ((et, v.get)) } ==
      batchCurrent(lake))

    // re-insert resurrects through the SAME checkpoint; an orphan file
    // (uncommitted) must NOT enter state — commit-exactness
    Files.write(java.nio.file.Paths.get(lake, "t",
      "delta_s9_or9han99.parquet"), Array[Byte](9, 9, 9))
    AzofWriter.commitDelta(spark, lake, "t",
      df(("1", "2024-02-10T00:00:00Z", "a-back")),
      ts("2024-02-05T00:00:00Z"), ts("2024-02-15T00:00:00Z"))        // v4
    val incr = drainCommitted(lake, ckpt)
    assert(incr.keySet == Set("1"), s"only key 1 changed; got $incr")
    assert(incr("1") == ((ts("2024-02-10T00:00:00Z").toEpochMilli,
      Some("a-back"), false)))
    val merged = (got ++ incr).filterNot(_._2._3)
      .map { case (k, (et, v, _)) => k -> ((et, v.get)) }
    assert(merged == batchCurrent(lake))
  }
}
