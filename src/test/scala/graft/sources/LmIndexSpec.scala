package graft.sources

import graft.TestSpark
import graft.format._
import graft.operators.{AzofScan, TextAnalysis}
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted bigram-LM stats index: incremental refresh ≡ one-shot
  * retrain on an append-only corpus, replay-guarded, with the epoch
  * rebuild as the delete/upsert reconciliation hatch.
  */
class LmIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val docSchema = TableSchema(Seq(
    ColumnDef("text", ColumnType.AzString, nullable = false)))

  private def df(rows: (String, String, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, v) =>
        Row(k, Timestamp.from(Instant.parse(t)), v) }),
      docSchema.toStruct)

  private def ts(s: String) = Instant.parse(s)

  private def refresh(l: String, ck: String): Unit = {
    val q = LmIndex.refresh(spark, l, "docs", "text", l, "lm_stats", ck)
    assert(q.awaitTermination(120000))
  }

  private def served(l: String, tbl: String = "lm_stats") =
    LmIndex.score(spark, l, "docs", "text", l, tbl)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1).toSeq

  /** One-shot retrain over the lake's LIVE docs, via the t19 operator. */
  private def oneShot(l: String) =
    TextAnalysis.lmScore(
      AzofScan.scan(spark, l, "docs")
        .select(col(TableSchema.KeyName).as("doc_id"), col("text")),
      col("text"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1).toSeq

  test("the merge guard's SHUFFLE fallback (bootstrap-sized batch) " +
    "produces the identical stats as the broadcast-semi path") {
    def build(ckTag: String, bMax: Long): Seq[(String, Long)] = {
      val l = Files.createTempDirectory(s"azof-lmidx-$ckTag").toString
      val ck = Files.createTempDirectory(s"azof-lmidx-$ckTag-ck").toString
      AzofWriter.createTable(spark, l, "docs", docSchema,
        ts("2024-01-01T00:00:00Z"))
      AzofWriter.commitBase(spark, l, "docs", df(
        ("1", "2024-01-02T00:00:00Z", "a b a b"),
        ("2", "2024-01-02T00:00:00Z", "a b c d")))                   // v2
      LmIndex.create(spark, l)
      val q1 = LmIndex.refresh(spark, l, "docs", "text", l, "lm_stats",
        ck, broadcastKeyMax = bMax)
      assert(q1.awaitTermination(120000))
      // second batch touches "a b" so the guarded merge path runs with
      // a non-empty existing side on both shapes
      AzofWriter.commitDelta(spark, l, "docs", df(
        ("3", "2024-02-05T00:00:00Z", "a b e")),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))      // v3
      val q2 = LmIndex.refresh(spark, l, "docs", "text", l, "lm_stats",
        ck, broadcastKeyMax = bMax)
      assert(q2.awaitTermination(120000))
      AzofScan.scan(spark, l, "lm_stats")
        .select(TableSchema.KeyName, "cnt").collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    val viaBroadcast = build("bc", Long.MaxValue)
    val viaShuffle = build("sh", 0L) // every batch exceeds the budget
    assert(viaBroadcast == viaShuffle,
      "guard shapes must agree on every bigram total")
    assert(viaBroadcast.toMap.get("a b").contains(4L),
      "'a b': 3 from the base + 1 from the delta, both shapes")
  }

  test("incremental refreshes ≡ one-shot retrain; replay adds nothing; " +
    "epoch rebuild reconciles deletes") {
    val l = Files.createTempDirectory("azof-lmidx").toString
    val ck = Files.createTempDirectory("azof-lmidx-ck").toString
    AzofWriter.createTable(spark, l, "docs", docSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "docs", df(
      ("1", "2024-01-02T00:00:00Z", "a b a b"),
      ("2", "2024-01-02T00:00:00Z", "a b c"),
      ("3", "2024-01-02T00:00:00Z", "z")))                           // v2
    LmIndex.create(spark, l)
    refresh(l, ck)
    assert(served(l) == oneShot(l), "refresh #1 ≡ retrain")

    // batch 2 touches an existing bigram ("a b") and adds new ones —
    // the upsert must serve old+new for the touched key
    AzofWriter.commitDelta(spark, l, "docs", df(
      ("4", "2024-02-05T00:00:00Z", "a b d")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    refresh(l, ck)
    assert(served(l) == oneShot(l), "incremental merge ≡ retrain")
    val abCnt = AzofScan.scan(spark, l, "lm_stats")
      .where(col(TableSchema.KeyName) === "a b")
      .select("cnt").collect().map(_.getLong(0)).toSeq
    assert(abCnt == Seq(4L), "'a b': 3 from batch 1 + 1 from batch 2")

    // replay guard: a rerun on the same checkpoint commits nothing
    val vBefore = AzofTable(spark, l, "lm_stats").currentVersion.toLong
    refresh(l, ck)
    assert(AzofTable(spark, l, "lm_stats").currentVersion.toLong == vBefore)
    assert(served(l) == oneShot(l))

    // a doc inserted after the last refresh still scores (smoothing
    // covers unseen bigrams; no row is lost)
    AzofWriter.commitDelta(spark, l, "docs", df(
      ("5", "2024-03-05T00:00:00Z", "q r")),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))        // v4
    assert(served(l).exists(_._1 == "5"), "unseen doc scores via smoothing")
    refresh(l, ck)
    assert(served(l) == oneShot(l))

    // deletes are NOT subtracted (documented stale-high drift)…
    AzofWriter.commitDelete(spark, l, "docs", Seq("1"),
      ts("2024-05-01T00:00:00Z"))                                    // v5
    refresh(l, ck)
    assert(served(l) != oneShot(l),
      "post-delete the additive stats drift from the live retrain")
    assert(served(l).forall(_._1 != "1"), "the deleted doc itself is gone")
    // …the epoch rebuild is the reconciliation hatch
    val n = LmIndex.rebuildEpoch(spark, l, "docs", "text", l,
      "lm_stats_v2", ts("2024-06-01T00:00:00Z"))
    assert(n > 0)
    assert(served(l, "lm_stats_v2") == oneShot(l),
      "rebuilt epoch ≡ retrain over the live corpus")
  }
}
