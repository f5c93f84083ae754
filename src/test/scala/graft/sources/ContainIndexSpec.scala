package graft.sources

import graft.TestSpark
import graft.format.{AzofTable, ColumnDef, ColumnType, TableSchema}
import graft.operators.Dedup
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted containment-pair index ([[ContainIndex]]): incremental
  * CDC-driven refresh must serve EXACTLY the verdicts the one-shot
  * detector ([[Dedup.containmentPairs]]) computes over the current
  * corpus — across inserts (new quotes of old docs), revisions that
  * break a containment, and deletes — with bounded writes (no-op
  * refresh commits nothing) and an exactly-once cursor.
  */
class ContainIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val srcSchema = TableSchema(Seq(
    ColumnDef("text", ColumnType.AzString, nullable = true)))

  private def ts(s: String) = Instant.parse(s)

  /** doc i's base text: 12 unique words (10 trigram shingles, no
    * cross-doc overlap).
    */
  private def baseText(i: Int): String =
    (1 to 12).map(w => s"w${i}_$w").mkString(" ")

  /** A doc fully QUOTING doc i plus 6 unique extra words: containment
    * (i ⊂ quote) = 1.0, Jaccard ≈ 10/16 — and with fewer shared words
    * Jaccard drops while containment stays 1.0.
    */
  private def quoteText(i: Int, q: Int): String =
    baseText(i) + " " + (1 to 6).map(w => s"q${q}_$w").mkString(" ")

  private def rowsDf(rows: Seq[(Long, String, String)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, at, text) =>
        Row(id.toString, Timestamp.from(ts(at)), text)
      }), srcSchema.toStruct)

  private def oneShot(l: String): Seq[Row] =
    Dedup.containmentPairs(
      graft.operators.AzofScan.scan(spark, l, "docs")
        .select(col(TableSchema.KeyName).cast("long").as("doc_id"),
          col("text")),
      col("text"), col("doc_id"),
      minShared = 3, maxDf = 20, minContainment = 0.9)
      .orderBy("doc_a", "doc_b").collect().toSeq

  private def served(l: String): Seq[Row] =
    ContainIndex.pairs(spark, l, "contain_pairs")
      .orderBy("doc_a", "doc_b").collect().toSeq

  private def mkLake(): String = {
    val l = Files.createTempDirectory("azof-contain").toString
    AzofWriter.createTable(spark, l, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    ContainIndex.create(spark, l)
    l
  }

  test("two-batch incremental refresh ≡ one-shot recompute; no-op " +
    "refresh commits nothing") {
    val l = mkLake()
    // batch 1: docs 1..4 distinct, doc 5 quotes doc 1
    AzofWriter.commitBase(spark, l, "docs", rowsDf(
      (1L to 4L).map(i => (i, "2024-01-10T00:00:00Z", baseText(i.toInt))) :+
        ((5L, "2024-01-10T00:00:00Z", quoteText(1, 5)))))
    val r1 = ContainIndex.refresh(spark, l, "docs", "text", l,
      at = ts("2024-02-01T00:00:00Z"))
    assert(r1.churned == 5 && r1.verified >= 1 && r1.retired == 0, s"$r1")
    assert(served(l) == oneShot(l))
    assert(served(l).map(r => (r.getLong(0), r.getLong(1))) == Seq(1L -> 5L))

    // batch 2: doc 6 distinct, doc 7 quotes OLD doc 3 — the candidate
    // emit must reach across batches via the corpus posting buckets
    AzofWriter.commitDelta(spark, l, "docs", rowsDf(Seq(
      (6L, "2024-02-10T00:00:00Z", baseText(6)),
      (7L, "2024-02-10T00:00:00Z", quoteText(3, 7)))),
      ts("2024-02-10T00:00:00Z"), ts("2024-02-10T00:00:00Z"))
    val r2 = ContainIndex.refresh(spark, l, "docs", "text", l,
      at = ts("2024-03-01T00:00:00Z"))
    assert(r2.churned == 2 && r2.upserted == 1, s"$r2")
    assert(served(l) == oneShot(l))
    assert(served(l).map(r => (r.getLong(0), r.getLong(1))) ==
      Seq(1L -> 5L, 3L -> 7L))

    // no new commits: refresh is a no-op and writes NO index version
    val v = AzofTable(spark, l, "contain_pairs").currentVersion
    val r3 = ContainIndex.refresh(spark, l, "docs", "text", l,
      at = ts("2024-03-02T00:00:00Z"))
    assert(r3.noop)
    assert(AzofTable(spark, l, "contain_pairs").currentVersion == v)
  }

  test("a revision that breaks the containment tombstones the pair; " +
    "a delete retires every pair touching the doc") {
    val l = mkLake()
    AzofWriter.commitBase(spark, l, "docs", rowsDf(Seq(
      (1L, "2024-01-10T00:00:00Z", baseText(1)),
      (2L, "2024-01-10T00:00:00Z", baseText(2)),
      (5L, "2024-01-10T00:00:00Z", quoteText(1, 5)),
      (6L, "2024-01-10T00:00:00Z", quoteText(2, 6)))))
    ContainIndex.refresh(spark, l, "docs", "text", l,
      at = ts("2024-02-01T00:00:00Z"))
    assert(served(l).map(r => (r.getLong(0), r.getLong(1))) ==
      Seq(1L -> 5L, 2L -> 6L))

    // doc 5 revised to unrelated text: pair (1,5) must retire
    AzofWriter.commitDelta(spark, l, "docs", rowsDf(Seq(
      (5L, "2024-02-10T00:00:00Z", baseText(9)))),
      ts("2024-02-10T00:00:00Z"), ts("2024-02-10T00:00:00Z"))
    val r2 = ContainIndex.refresh(spark, l, "docs", "text", l,
      at = ts("2024-03-01T00:00:00Z"))
    assert(r2.retired == 1, s"$r2")
    assert(served(l) == oneShot(l))
    assert(served(l).map(r => (r.getLong(0), r.getLong(1))) ==
      Seq(2L -> 6L))

    // doc 2 deleted: pair (2,6) must retire too
    AzofWriter.commitDelete(spark, l, "docs", Seq("2"),
      ts("2024-03-10T00:00:00Z"))
    val r3 = ContainIndex.refresh(spark, l, "docs", "text", l,
      at = ts("2024-04-01T00:00:00Z"))
    assert(r3.retired == 1, s"$r3")
    assert(served(l).isEmpty && oneShot(l).isEmpty)

    // the retired pairs' history still time-travels in the INDEX table
    val idx = AzofTable(spark, l, "contain_pairs")
    val past = graft.operators.AzofScan.scanSnapshot(spark, idx,
      idx.currentSnapshot,
      graft.format.AsOf.EventTime(ts("2024-02-01T00:00:00Z")))
    assert(past.count() == 2)
  }

  test("keyed mode: raw string keys flow through with LEXICOGRAPHIC " +
    "pair order; '|' keys refuse loudly; numeric mode refuses " +
    "string keys with the keyed hint") {
    val l = Files.createTempDirectory("azof-containk").toString
    AzofWriter.createTable(spark, l, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    ContainIndex.create(spark, l)
    // keys chosen so lexical and numeric order DISAGREE: 'doc-10'
    // quotes 'doc-9' — lexically doc-10 < doc-9, so doc_a = 'doc-10'
    val rows = Seq(
      ("doc-9", "2024-01-10T00:00:00Z", baseText(9)),
      ("doc-10", "2024-01-10T00:00:00Z", quoteText(9, 10)))
    AzofWriter.commitBase(spark, l, "docs",
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (k, at, t) =>
          org.apache.spark.sql.Row(k, Timestamp.from(ts(at)), t) }),
        srcSchema.toStruct))
    val r = ContainIndex.refresh(spark, l, "docs", "text", l,
      at = ts("2024-02-01T00:00:00Z"), keyed = true)
    assert(r.verified == 1, s"$r")
    val p = ContainIndex.pairsKeyed(spark, l, "contain_pairs").collect()(0)
    assert(p.getString(0) == "doc-10" && p.getString(1) == "doc-9", s"$p")
    // doc-10 is the QUOTE (contains doc-9's text as a subset): its
    // side is doc_a here, and doc-9 (the quoted base) is fully
    // contained -> cont_b = 1.0
    assert(p.getDouble(6) == 1.0, s"$p")

    // numeric mode on this table fails with the keyed hint (fresh
    // index lake so the cursor starts over)
    val l2 = Files.createTempDirectory("azof-containk2").toString
    ContainIndex.create(spark, l2)
    val e = intercept[Exception] {
      ContainIndex.refresh(spark, l, "docs", "text", l2,
        at = ts("2024-02-01T00:00:00Z"))
    }
    // the raise_error surfaces from whichever stage evaluates first
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("keyed = true")), s"$e")

    // a '|' key refuses in keyed mode (the pair-key delimiter)
    val l3 = Files.createTempDirectory("azof-containk3").toString
    AzofWriter.createTable(spark, l3, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    ContainIndex.create(spark, l3)
    AzofWriter.commitBase(spark, l3, "docs",
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          org.apache.spark.sql.Row("a|b",
            Timestamp.from(ts("2024-01-10T00:00:00Z")), baseText(1)),
          org.apache.spark.sql.Row("c",
            Timestamp.from(ts("2024-01-10T00:00:00Z")),
            quoteText(1, 3)))),
        srcSchema.toStruct))
    val e2 = intercept[Exception] {
      ContainIndex.refresh(spark, l3, "docs", "text", l3,
        at = ts("2024-02-01T00:00:00Z"), keyed = true)
    }
    assert(msgs(e2).exists(_.contains("delimiter")), s"$e2")
  }

  test("applyVerdict composes the containment index: the contained " +
    "side tombstones, the container and unrelated docs survive") {
    val l = mkLake()
    // doc 1's shingles are a strict subset of doc 5's (the quote):
    // cont_a(1⊂5) = 1.0 -> doc 1 is the contained side and drops
    AzofWriter.commitBase(spark, l, "docs", rowsDf(Seq(
      (1L, "2024-01-10T00:00:00Z", baseText(1)),
      (2L, "2024-01-10T00:00:00Z", baseText(2)),
      (5L, "2024-01-10T00:00:00Z", quoteText(1, 5)))))
    ContainIndex.refresh(spark, l, "docs", "text", l,
      at = ts("2024-02-01T00:00:00Z"))
    DedupFlow.create(spark, l) // empty CC index: no near-dup verdicts
    val n = DedupFlow.applyVerdict(spark, l, "docs", l,
      containIndex = Some((l, "contain_pairs")),
      at = ts("2024-03-01T00:00:00Z"))
    assert(n == 1L, s"exactly the contained doc drops: $n")
    val left = graft.operators.AzofScan.scan(spark, l, "docs")
      .select(TableSchema.KeyName).collect().map(_.getString(0)).sorted
    assert(left.toSeq == Seq("2", "5"), s"${left.toSeq}")
    // idempotent: a second apply deletes nothing
    assert(DedupFlow.applyVerdict(spark, l, "docs", l,
      containIndex = Some((l, "contain_pairs")),
      at = ts("2024-03-02T00:00:00Z")) == 0L)
  }

  test("a STALE pair whose container is gone must not delete the excerpt " +
    "(the live-container guard)") {
    val l = mkLake()
    AzofWriter.commitBase(spark, l, "docs", rowsDf(Seq(
      (1L, "2024-01-10T00:00:00Z", baseText(1)),
      (5L, "2024-01-10T00:00:00Z", quoteText(1, 5)))))
    ContainIndex.refresh(spark, l, "docs", "text", l,
      at = ts("2024-02-01T00:00:00Z"))
    DedupFlow.create(spark, l)
    // the CONTAINER (5) is deleted — e.g. a takedown, or a rollback the
    // feed never shows the index — while the pair (1 ⊂ 5) is still in
    // the index. Applying the stale pair would tombstone doc 1, the
    // corpus's ONLY remaining copy of that content.
    AzofWriter.commitDelete(spark, l, "docs", Seq("5"),
      ts("2024-02-15T00:00:00Z"))
    val n = DedupFlow.applyVerdict(spark, l, "docs", l,
      containIndex = Some((l, "contain_pairs")),
      at = ts("2024-03-01T00:00:00Z"))
    assert(n == 0L, s"the excerpt must survive its container's deletion: $n")
    val left = graft.operators.AzofScan.scan(spark, l, "docs")
      .select(TableSchema.KeyName).collect().map(_.getString(0)).sorted
    assert(left.toSeq == Seq("1"), s"${left.toSeq}")
    // once the refresh RETIRES the stale pair (the delete is churn),
    // apply stays a no-op — the guard and the retirement agree
    val r = ContainIndex.refresh(spark, l, "docs", "text", l,
      at = ts("2024-03-02T00:00:00Z"))
    assert(r.retired == 1, s"the delete must retire the pair: $r")
    assert(DedupFlow.applyVerdict(spark, l, "docs", l,
      containIndex = Some((l, "contain_pairs")),
      at = ts("2024-03-03T00:00:00Z")) == 0L)
  }

  test("both-old pairs are not re-emitted: refresh work is " +
    "churn-confined") {
    val l = mkLake()
    AzofWriter.commitBase(spark, l, "docs", rowsDf(Seq(
      (1L, "2024-01-10T00:00:00Z", baseText(1)),
      (5L, "2024-01-10T00:00:00Z", quoteText(1, 5)))))
    ContainIndex.refresh(spark, l, "docs", "text", l,
      at = ts("2024-02-01T00:00:00Z"))
    // a second batch NOT touching docs 1/5: their pair is already
    // decided, so candidates and writes must both be zero for it
    AzofWriter.commitDelta(spark, l, "docs", rowsDf(Seq(
      (8L, "2024-02-10T00:00:00Z", baseText(8)))),
      ts("2024-02-10T00:00:00Z"), ts("2024-02-10T00:00:00Z"))
    val r = ContainIndex.refresh(spark, l, "docs", "text", l,
      at = ts("2024-03-01T00:00:00Z"))
    assert(r.churned == 1 && r.candidates == 0 &&
      r.upserted == 0 && r.retired == 0, s"$r")
    assert(served(l) == oneShot(l))
  }
}
