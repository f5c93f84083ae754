package graft.sources

import graft.TestSpark
import graft.format._
import graft.operators.AzofScan
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Round-3 gave the table FOUR write entry points that all funnel
  * through the same optimistic metadata commit: the library delta
  * commit, SQL INSERT INTO, the streaming sink's idempotent micro-batch
  * commit, and compaction's rewrite. This property interleaves them
  * randomly (plus vacuum) against a local winner model and asserts
  * after EVERY step that the Current scan equals the model — i.e. no
  * entry-point interaction loses, duplicates, or resurrects a row —
  * and that replayed sink batches stay no-ops mid-stream.
  */
class WriteInterleavingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  private val t0 = Instant.parse("2024-01-01T00:00:00Z")
  private def hourTs(h: Int) = t0.plusSeconds(h * 3600L)

  private def df(rows: Seq[(String, Int, String)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, h, v) =>
        Row(k, Timestamp.from(hourTs(h)), v) }),
      schema.toStruct)

  test("random interleaving of library/SQL/sink/compact/vacuum writes") {
    for (seed <- 1 to 2) {
      val rnd = new scala.util.Random(seed * 104729L)
      val lake = Files.createTempDirectory(s"azof-ilv$seed").toString
      // catalog instances are cached per name; the path conf is read at
      // initialize, so each seed needs EITHER its own name or one shared
      // name whose path we can still set before first use — use a
      // per-seed name to stay order-independent
      val cat = s"ilv_$seed"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[AzofCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.path", lake)
      AzofWriter.createTable(spark, lake, "t", schema, t0)

      val model = scala.collection.mutable.Map.empty[String, (Int, String)]
      def applyRows(rows: Seq[(String, Int, String)]): Unit =
        rows.foreach { case (k, h, v) =>
          if (model.get(k).forall(_._1 < h)) model(k) = (h, v)
        }
      var hour = 1
      var nextBatchId = 0L
      val appId = s"ilv-stream-$seed"
      def freshRows(n: Int): Seq[(String, Int, String)] = {
        // unique event hour per row (global counter) — the model then
        // has a unique winner per key, no cross-engine tie ambiguity
        (0 until n).map { _ =>
          hour += 1
          ((1 + rnd.nextInt(6)).toString, hour, s"v$hour")
        }
      }
      def scanned(): Map[String, (Int, String)] =
        AzofScan.scan(spark, lake, "t", AsOf.Current)
          .collect().map(r => r.getString(0) ->
            (((r.getTimestamp(1).getTime - t0.toEpochMilli) / 3600000L).toInt,
              r.getString(2))).toMap

      for (step <- 0 until 12) {
        rnd.nextInt(6) match {
          case 0 | 1 => // library delta commit
            val rows = freshRows(1 + rnd.nextInt(3))
            AzofWriter.commitDelta(spark, lake, "t", df(rows),
              hourTs(rows.map(_._2).min), hourTs(rows.map(_._2).max))
            applyRows(rows)
          case 2 => // SQL INSERT through the catalog
            val rows = freshRows(1 + rnd.nextInt(2))
            val values = rows.map { case (k, h, v) =>
              s"('$k', TIMESTAMP'${Timestamp.from(hourTs(h))}', '$v')"
            }.mkString(", ")
            spark.sql(s"INSERT INTO $cat.t VALUES $values")
            applyRows(rows)
          case 3 => // streaming sink micro-batch (sometimes a replay)
            val replay = nextBatchId > 0 && rnd.nextBoolean()
            if (replay) {
              val before = AzofTable(spark, lake, "t").currentVersion
              assert(!AzofSinkAccess.commit(lake, df(freshRowsNoApply()),
                nextBatchId - 1, appId), s"seed $seed step $step: replay committed")
              assert(AzofTable(spark, lake, "t").currentVersion == before)
            } else {
              val rows = freshRows(1 + rnd.nextInt(2))
              assert(AzofSinkAccess.commit(lake, df(rows), nextBatchId, appId))
              nextBatchId += 1
              applyRows(rows)
            }
          case 4 => // compact (single- or multi-file)
            hour += 1
            AzofWriter.compact(spark, lake, "t", hourTs(hour),
              numFiles = 1 + rnd.nextInt(2))
          case 5 => // vacuum
            AzofVacuum.vacuum(spark, lake, "t",
              keepLast = 1 + rnd.nextInt(2), minAgeMs = 0)
        }
        assert(scanned() == model.toMap,
          s"seed $seed step $step: scan diverged from model")
      }

      // and the STREAMING latest-per-key view converges to the same
      // model over whatever file layout the interleaving produced
      val winners = scala.collection.concurrent.TrieMap
        .empty[String, (Int, String)]
      val q = graft.streaming.LatestView.latest(spark, lake, "t")
        .writeStream.outputMode("update")
        .option("checkpointLocation",
          Files.createTempDirectory(s"azof-ilv-ck$seed").toString)
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
            batch.collect().foreach { r =>
              winners(r.getString(0)) =
                (((r.getTimestamp(1).getTime - t0.toEpochMilli) / 3600000L).toInt,
                  r.getString(2))
            }
            ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(winners.toMap == model.toMap,
        s"seed $seed: streaming view diverged from model")
    }
  }

  /** Rows for a REPLAYED batch: content is irrelevant (the commit must
    * be skipped), but the hours must not collide with future fresh rows
    * — use negative-offset hours the model never sees.
    */
  private var replaySalt = 0
  private def freshRowsNoApply(): Seq[(String, Int, String)] = {
    replaySalt += 1
    Seq(("9", 0, s"replay$replaySalt"))
  }
}

/** Test shim: reach the sink's commitBatch without a running stream. */
private object AzofSinkAccess {
  def commit(lake: String, batch: org.apache.spark.sql.DataFrame,
      batchId: Long, appId: String): Boolean =
    graft.streaming.AzofSink.commitBatch(lake, "t", batch, batchId, appId)
}
