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

  test("postings-backed refresh ≡ one-shot across inserts, cross-batch " +
    "quotes, revisions, and deletes; no-op commits nothing") {
    val l = mkLake()
    ContainIndex.createPostings(spark, l)
    def rf(at: String) = ContainIndex.refresh(spark, l, "docs", "text", l,
      at = ts(at), postings = Some("contain_postings"))
    AzofWriter.commitBase(spark, l, "docs", rowsDf(
      (1L to 4L).map(i => (i, "2024-01-10T00:00:00Z", baseText(i.toInt))) :+
        ((5L, "2024-01-10T00:00:00Z", quoteText(1, 5)))))
    val r1 = rf("2024-02-01T00:00:00Z")
    assert(r1.churned == 5 && r1.verified >= 1, s"$r1")
    assert(served(l) == oneShot(l))
    assert(served(l).map(r => (r.getLong(0), r.getLong(1))) == Seq(1L -> 5L))
    // posting internals: doc 1's first trigram is held by docs 1 and 5
    val p0 = graft.operators.AzofScan.scan(spark, l, "contain_postings")
      .where(col(TableSchema.KeyName) === "w1_1 w1_2 w1_3")
      .select("df", "ids").collect()(0)
    assert(p0.getLong(0) == 2L && p0.getString(1) == """["1","5"]""", s"$p0")

    // cross-batch quote of an OLD doc: the posting buckets reach it
    // with NO corpus pass
    AzofWriter.commitDelta(spark, l, "docs", rowsDf(Seq(
      (6L, "2024-02-10T00:00:00Z", baseText(6)),
      (7L, "2024-02-10T00:00:00Z", quoteText(3, 7)))),
      ts("2024-02-10T00:00:00Z"), ts("2024-02-10T00:00:00Z"))
    val r2 = rf("2024-03-01T00:00:00Z")
    assert(r2.churned == 2 && r2.upserted == 1, s"$r2")
    assert(served(l) == oneShot(l))
    assert(served(l).map(r => (r.getLong(0), r.getLong(1))) ==
      Seq(1L -> 5L, 3L -> 7L))

    // revision breaks (1,5); delete retires (3,7)
    AzofWriter.commitDelta(spark, l, "docs", rowsDf(Seq(
      (5L, "2024-03-10T00:00:00Z", baseText(9)))),
      ts("2024-03-10T00:00:00Z"), ts("2024-03-10T00:00:00Z"))
    val r3 = rf("2024-04-01T00:00:00Z")
    assert(r3.retired == 1, s"$r3")
    assert(served(l) == oneShot(l))
    AzofWriter.commitDelete(spark, l, "docs", Seq("3"),
      ts("2024-04-10T00:00:00Z"))
    val r4 = rf("2024-05-01T00:00:00Z")
    assert(r4.retired == 1, s"$r4")
    assert(served(l) == oneShot(l))
    assert(served(l).map(r => (r.getLong(0), r.getLong(1))) == Seq.empty)
    // the deleted doc's postings are gone (tombstoned or df-decremented)
    assert(graft.operators.AzofScan.scan(spark, l, "contain_postings")
      .where(col("ids").contains("\"3\"")).count() == 0L,
      "doc 3 must leave every posting it was a member of")

    // no-op refresh commits nothing to either table
    val vP = AzofTable(spark, l, "contain_pairs").currentVersion
    val vT = AzofTable(spark, l, "contain_postings").currentVersion
    assert(rf("2024-05-02T00:00:00Z").noop)
    assert(AzofTable(spark, l, "contain_pairs").currentVersion == vP)
    assert(AzofTable(spark, l, "contain_postings").currentVersion == vT)
  }

  test("guard-transition exactness on BOTH paths: a delete that drops a " +
    "bucket under maxDf surfaces a pair among UNCHURNED docs; an insert " +
    "that pushes it back over retires the pair — and on the postings " +
    "path the stop-shingle rides overflow (exact df, no ids) and " +
    "recovers its members when it drops back under the cap") {
    // C = 12 shared words; each doc = C + one unique tail word, so a
    // pair of C-docs shares the 10 pure-C trigrams out of 11 each:
    // containment 10/11 ≈ 0.909 >= 0.9, n_shared 10 >= 3
    val C = (1 to 12).map(w => s"c_$w").mkString(" ")
    def cdoc(i: Int): String = s"$C t$i"
    def oneShotP(l: String): Seq[Row] =
      Dedup.containmentPairs(
        graft.operators.AzofScan.scan(spark, l, "docs")
          .select(col(TableSchema.KeyName).cast("long").as("doc_id"),
            col("text")),
        col("text"), col("doc_id"),
        minShared = 3, maxDf = 2, minContainment = 0.9)
        .orderBy("doc_a", "doc_b").collect().toSeq
    for (postings <- Seq(None, Some("contain_postings"))) {
      val l = mkLake()
      postings.foreach(_ => ContainIndex.createPostings(spark, l))
      def rf(at: String) = ContainIndex.refresh(spark, l, "docs", "text", l,
        at = ts(at), maxDf = 2, postings = postings, idsCap = 2)
      // bootstrap: 3 docs share every C-bucket -> df 3 > maxDf 2 ->
      // no pairs anywhere (one-shot agrees)
      AzofWriter.commitBase(spark, l, "docs", rowsDf(Seq(
        (1L, "2024-01-10T00:00:00Z", cdoc(1)),
        (2L, "2024-01-10T00:00:00Z", cdoc(2)),
        (3L, "2024-01-10T00:00:00Z", cdoc(3)))))
      rf("2024-02-01T00:00:00Z")
      assert(served(l) == oneShotP(l) && served(l).isEmpty,
        s"postings=$postings: guard-skipped bootstrap must index nothing")
      postings.foreach { pt =>
        val row = graft.operators.AzofScan.scan(spark, l, pt)
          .where(col(TableSchema.KeyName) === "c_1 c_2 c_3")
          .select("df", "ids").collect()(0)
        assert(row.getLong(0) == 3L && row.isNullAt(1),
          s"stop-shingle must keep exact df with no stored ids: $row")
      }
      // doc 3 deleted: every C-bucket drops to df 2 — pair (1,2) must
      // SURFACE although neither 1 nor 2 churned (and on the postings
      // path the buckets must first RECOVER their members)
      AzofWriter.commitDelete(spark, l, "docs", Seq("3"),
        ts("2024-02-10T00:00:00Z"))
      val r2 = rf("2024-03-01T00:00:00Z")
      assert(served(l) == oneShotP(l), s"postings=$postings: $r2")
      assert(served(l).map(r => (r.getLong(0), r.getLong(1))) ==
        Seq(1L -> 2L),
        s"postings=$postings: the shrink transition must surface (1,2)")
      postings.foreach { pt =>
        val row = graft.operators.AzofScan.scan(spark, l, pt)
          .where(col(TableSchema.KeyName) === "c_1 c_2 c_3")
          .select("df", "ids").collect()(0)
        assert(row.getLong(0) == 2L && row.getString(1) == """["1","2"]""",
          s"under-cap transition must recover the members: $row")
      }
      // doc 4 inserted with the same C: buckets grow back to df 3 —
      // the indexed (1,2) must RETIRE although neither endpoint churned
      AzofWriter.commitDelta(spark, l, "docs", rowsDf(Seq(
        (4L, "2024-03-10T00:00:00Z", cdoc(4)))),
        ts("2024-03-10T00:00:00Z"), ts("2024-03-10T00:00:00Z"))
      val r3 = rf("2024-04-01T00:00:00Z")
      assert(r3.retired == 1, s"postings=$postings: $r3")
      assert(served(l) == oneShotP(l) && served(l).isEmpty,
        s"postings=$postings: the growth transition must retire (1,2)")
    }
  }

  test("postings refresh on a grown corpus is corpus-scan-free: the " +
    "counting FS sees only churn/endpoint data files opened") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.contfs.impl", classOf[ContainCountingFs].getName)
    spark.conf.set("spark.hadoop.fs.contfs.impl",
      classOf[ContainCountingFs].getName)
    val local = Files.createTempDirectory("azof-contain-count").toString
    val l = s"contfs:$local"
    AzofWriter.createTable(spark, l, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    ContainIndex.create(spark, l)
    ContainIndex.createPostings(spark, l)
    def batch(prefix: String, at: String) =
      spark.createDataFrame(
        spark.sparkContext.parallelize((1 to 8).map(i =>
          Row(s"$prefix$i", Timestamp.from(ts(at)),
            (1 to 12).map(w => s"${prefix}w${i}_$w").mkString(" ")))),
        srcSchema.toStruct)
    AzofWriter.commitBase(spark, l, "docs", batch("a", "2024-01-10T00:00:00Z"))
    Seq("b", "c", "d", "e", "f").zipWithIndex.foreach { case (p, i) =>
      AzofWriter.commitDelta(spark, l, "docs",
        batch(p, f"2024-01-${11 + i}%02dT00:00:00Z"),
        ts(f"2024-01-${11 + i}%02dT00:00:00Z"),
        ts(f"2024-01-${11 + i}%02dT00:00:00Z"))
    }
    // bootstrap builds the postings (reads everything, uncounted)
    ContainIndex.refresh(spark, l, "docs", "text", l,
      at = ts("2024-02-01T00:00:00Z"), keyed = true,
      postings = Some("contain_postings"))
    val dataFiles = AzofTable(spark, l, "docs").currentSnapshot
      .dataFiles(graft.format.AsOf.Current).size
    assert(dataFiles >= 6, s"grown corpus expected, got $dataFiles files")

    // ONE small churn: a new doc quoting OLD doc a1
    val quote = "zq1"
    AzofWriter.commitDelta(spark, l, "docs",
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(quote,
          Timestamp.from(ts("2024-02-10T00:00:00Z")),
          (1 to 12).map(w => s"aw1_$w").mkString(" ") + " zq_x zq_y"))),
        srcSchema.toStruct),
      ts("2024-02-10T00:00:00Z"), ts("2024-02-10T00:00:00Z"))
    ContainCountingFs.reset()
    val r = ContainIndex.refresh(spark, l, "docs", "text", l,
      at = ts("2024-03-01T00:00:00Z"), keyed = true,
      postings = Some("contain_postings"))
    assert(r.verified == 1, s"$r")
    val opened = ContainCountingFs.docsDataFiles
    assert(opened.nonEmpty, "counting FS saw no reads — vacuous")
    assert(opened.size <= 3 && opened.size < dataFiles,
      s"corpus-scan-free refresh must open only churn/endpoint files: " +
        s"opened ${opened.size} of ${dataFiles + 1}: $opened")
    val pk = ContainIndex.pairsKeyed(spark, l, "contain_pairs").collect()(0)
    assert(Set(pk.getString(0), pk.getString(1)) == Set("a1", "zq1"), s"$pk")
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

/** RawLocalFileSystem counting distinct parquet data files opened under
  * the `docs` table — the corpus-scan-free pin for the postings-backed
  * containment refresh.
  */
class ContainCountingFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "contfs"
  override def getUri: java.net.URI = java.net.URI.create("contfs:///")
  override def open(f: org.apache.hadoop.fs.Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    ContainCountingFs.record(f)
    super.open(f, bufferSize)
  }
}

object ContainCountingFs {
  val opened = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def record(f: org.apache.hadoop.fs.Path): Unit = {
    val s = f.toString
    if (s.contains("/docs/") && s.endsWith(".parquet")) { opened.add(s); () }
  }
  def reset(): Unit = opened.clear()
  def docsDataFiles: Set[String] = {
    import scala.jdk.CollectionConverters._
    opened.asScala.toSet
  }
}
