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
  * retrain over the LIVE corpus — under inserts, revisions, AND deletes
  * (pre-image subtraction via the commit-exact time-travel read) —
  * replay-guarded, with the epoch rebuild as the ROLLBACK
  * reconciliation hatch.
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

  test("incremental refreshes ≡ one-shot retrain under inserts, deletes, " +
    "revisions, and catch-up batches; replay adds nothing; the epoch " +
    "rebuild hatch remains for rollbacks") {
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

    // DELETE: the refresh subtracts the tombstoned doc's pre-image
    // bigrams via the commit-exact time-travel read — refresh ≡ live
    // retrain with NO epoch rebuild
    AzofWriter.commitDelete(spark, l, "docs", Seq("1"),
      ts("2024-05-01T00:00:00Z"))                                    // v5
    refresh(l, ck)
    assert(served(l) == oneShot(l),
      "post-delete the pre-image-subtracting refresh ≡ live retrain")
    assert(served(l).forall(_._1 != "1"), "the deleted doc itself is gone")
    val abAfterDelete = AzofScan.scan(spark, l, "lm_stats")
      .where(col(TableSchema.KeyName) === "a b")
      .select("cnt").collect().map(_.getLong(0)).toSeq
    assert(abAfterDelete == Seq(2L),
      "'a b': doc 1's two occurrences subtracted; docs 2 and 4 remain")

    // REVISION: re-upserting a doc with different text subtracts the
    // old version's bigrams and adds the new version's — still ≡
    // retrain, still no rebuild
    AzofWriter.commitDelta(spark, l, "docs", df(
      ("4", "2024-06-05T00:00:00Z", "c d c d")),
      ts("2024-06-01T00:00:00Z"), ts("2024-07-01T00:00:00Z"))        // v6
    refresh(l, ck)
    assert(served(l) == oneShot(l),
      "post-revision the refresh ≡ live retrain (old text subtracted)")

    // DELETE + re-INSERT in separate batches: the re-insert's pre-image
    // is the tombstone (nothing to subtract), only the new text adds
    AzofWriter.commitDelta(spark, l, "docs", df(
      ("1", "2024-07-05T00:00:00Z", "z q z")),
      ts("2024-07-01T00:00:00Z"), ts("2024-08-01T00:00:00Z"))        // v7
    refresh(l, ck)
    assert(served(l) == oneShot(l), "delete → re-insert ≡ retrain")

    // ZEROED bigram: deleting doc 2 removes the corpus' last "a b" —
    // the stats row upserts to cnt 0, and serving must treat it as
    // ABSENT (a retrain has no such row; a zero row would inflate the
    // vocabulary count) — the cnt > 0 serving filter under test
    AzofWriter.commitDelete(spark, l, "docs", Seq("2"),
      ts("2024-08-02T00:00:00Z"))                                    // v8
    refresh(l, ck)
    val abZeroed = AzofScan.scan(spark, l, "lm_stats")
      .where(col(TableSchema.KeyName) === "a b")
      .select("cnt").collect().map(_.getLong(0)).toSeq
    assert(abZeroed == Seq(0L), s"'a b' fully subtracted: $abZeroed")
    assert(served(l) == oneShot(l),
      "zeroed stats rows serve as absent — scores stay retrain-exact")

    // one CATCH-UP batch spanning delete+revision+insert of one key:
    // only the end-state counts, exactly like the retrain
    val ck2 = Files.createTempDirectory("azof-lmidx-ck2").toString
    val l2 = Files.createTempDirectory("azof-lmidx-multi").toString
    AzofWriter.createTable(spark, l2, "docs", docSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l2, "docs", df(
      ("1", "2024-01-02T00:00:00Z", "a b a"),
      ("2", "2024-01-02T00:00:00Z", "c d")))                         // v2
    LmIndex.create(spark, l2)
    val q0 = LmIndex.refresh(spark, l2, "docs", "text", l2, "lm_stats", ck2)
    assert(q0.awaitTermination(120000))
    AzofWriter.commitDelta(spark, l2, "docs", df(
      ("1", "2024-02-05T00:00:00Z", "e f")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    AzofWriter.commitDelete(spark, l2, "docs", Seq("2"),
      ts("2024-03-02T00:00:00Z"))                                    // v4
    AzofWriter.commitDelta(spark, l2, "docs", df(
      ("1", "2024-04-05T00:00:00Z", "g h g")),
      ts("2024-04-01T00:00:00Z"), ts("2024-05-01T00:00:00Z"))        // v5
    val q1 = LmIndex.refresh(spark, l2, "docs", "text", l2, "lm_stats", ck2)
    assert(q1.awaitTermination(120000))
    assert(
      LmIndex.score(spark, l2, "docs", "text", l2, "lm_stats")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).sortBy(_._1).toSeq == oneShot(l2),
      "one batch spanning revise+delete+revise ≡ retrain at the end state")

    // the epoch rebuild hatch still works (the ROLLBACK reconciliation)
    val n = LmIndex.rebuildEpoch(spark, l, "docs", "text", l,
      "lm_stats_v2", ts("2024-09-01T00:00:00Z"))
    assert(n > 0)
    assert(served(l, "lm_stats_v2") == oneShot(l),
      "rebuilt epoch ≡ retrain over the live corpus")
  }
}
