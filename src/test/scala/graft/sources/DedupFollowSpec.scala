package graft.sources

import graft.TestSpark
import graft.format.{AzofTable, TableSchema}
import graft.operators.Dedup
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The continuous maintenance driver ([[DedupFlow.follow]]): the
  * indexes FOLLOW the source table through the commit-exact stream —
  * catch-up (AvailableNow) and daemon (processing-time) shapes both
  * keep the persisted assignment ≡ the one-shot pipeline over the
  * evolved corpus, ingest replay stays idempotent under the layered
  * checkpoints, and `retain` bounds index snapshot history across a
  * soak of commits. Doc families follow DedupFlowSpec's probed LSH
  * fixtures.
  */
class DedupFollowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Instant.parse(s)

  private val srcSchema = graft.format.TableSchema(Seq(
    graft.format.ColumnDef("text", graft.format.ColumnType.AzString,
      nullable = false)))

  private def rows(docs: Seq[(Long, String)], at: String) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map { case (i, t) =>
        Row(i.toString, Timestamp.from(ts(at)), t) }),
      srcSchema.toStruct)

  private def fam(prefix: String, last: String) =
    ((1 to 7).map(w => s"$prefix$w") :+ last).mkString(" ")

  private def oneShot(lake: String): Map[Long, Long] = {
    val cur = graft.operators.AzofScan.scan(spark, lake, "docs")
      .select(col(TableSchema.KeyName).cast("long").as("doc_id"),
        col("text"))
    val cands = Dedup.lshCandidates(
      Dedup.minhashBands(cur, col("text"), col("doc_id"),
        k = MinHashIndex.K, bandSize = MinHashIndex.BandSize),
      MinHashIndex.NBands)
    val sh = Dedup.shingles(cur, col("text"), col("doc_id"))
    val pairs = Dedup.ngramJaccard(cands, sh)
      .where(col("jaccard") >= 0.5)
    Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def assignment(idxLake: String): Map[Long, Long] =
    CcIndex.assignment(spark, idxLake, "components")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("AvailableNow follow catches up like a sequence of ingests; " +
    "a re-run with nothing new is a no-op") {
    val srcLake = Files.createTempDirectory("azof-follow-src").toString
    val idxLake = Files.createTempDirectory("azof-follow-idx").toString
    val ck = Files.createTempDirectory("azof-follow-ck").toString
    AzofWriter.createTable(spark, srcLake, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, srcLake, "docs", rows(Seq(
      1L -> fam("w", "alpha"),
      2L -> fam("w", "beta"),
      4L -> "completely different text entirely"),
      "2024-01-02T00:00:00Z"))
    AzofWriter.commitDelta(spark, srcLake, "docs", rows(Seq(
      3L -> fam("v", "alpha"),
      6L -> fam("v", "beta")),
      "2024-01-05T00:00:00Z"),
      ts("2024-01-05T00:00:00Z"), ts("2024-01-05T00:00:00Z"))
    DedupFlow.create(spark, idxLake)

    var reports = Vector.empty[DedupFlow.IngestReport]
    DedupFlow.follow(spark, srcLake, "docs", "text", idxLake, ck,
      onReport = r => reports :+= r).awaitTermination()
    assert(reports.exists(!_.noop), s"$reports")
    val a = assignment(idxLake)
    assert(a == oneShot(srcLake), s"follow diverged: $a")
    assert(a(1L) == 1L && a(2L) == 1L && a(3L) == 3L && a(6L) == 3L)

    // replayed follow with nothing new: ingest cursor no-ops, no
    // index version moves
    val v = AzofTable(spark, idxLake, "components").currentVersion
    reports = Vector.empty
    DedupFlow.follow(spark, srcLake, "docs", "text", idxLake, ck,
      onReport = r => reports :+= r).awaitTermination()
    assert(reports.forall(_.noop), s"$reports")
    assert(AzofTable(spark, idxLake, "components").currentVersion == v)
  }

  test("follow with containTable maintains the containment family " +
    "too; a later-enabled containment index catches up eagerly " +
    "without waiting for a new source commit") {
    val srcLake = Files.createTempDirectory("azof-follow3-src").toString
    val idxLake = Files.createTempDirectory("azof-follow3-idx").toString
    val ck = Files.createTempDirectory("azof-follow3-ck").toString
    AzofWriter.createTable(spark, srcLake, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    // doc 5's word shingles are a strict subset of doc 4's (the quote)
    AzofWriter.commitBase(spark, srcLake, "docs", rows(Seq(
      1L -> fam("w", "alpha"),
      2L -> fam("w", "beta"),
      4L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10",
      5L -> "c1 c2 c3 c4 c5 c6"),
      "2024-01-02T00:00:00Z"))
    DedupFlow.create(spark, idxLake)

    // near-dup-only follow first: the outer checkpoint's committed
    // offsets advance past the base commit
    DedupFlow.follow(spark, srcLake, "docs", "text", idxLake, ck)
      .awaitTermination()
    assert(assignment(idxLake).nonEmpty)

    // containment + shard map enabled LATER, with no new source
    // commits: the eager catch-up must close both gaps even though the
    // reused outer checkpoint fires no batch
    ContainIndex.create(spark, idxLake)
    ShardMap.create(spark, idxLake, shardSize = 3L, salt = "f")
    SeqMap.create(spark, idxLake, budget = 8L, salt = "f")
    var creps = Vector.empty[ContainIndex.RefreshReport]
    var sreps = Vector.empty[ShardMap.RefreshReport]
    var qreps = Vector.empty[SeqMap.RefreshReport]
    DedupFlow.follow(spark, srcLake, "docs", "text", idxLake, ck,
      containTable = Some("contain_pairs"),
      onContainReport = r => creps :+= r,
      shardTable = Some("shard_map"),
      onShardReport = r => sreps :+= r,
      seqTable = Some("seq_map"),
      onSeqReport = r => qreps :+= r,
      lmTable = Some("lm_stats"),
      mvTable = Some("mv"),
      mvView = Some(ViewDef(Seq("text")))).awaitTermination()
    assert(creps.exists(!_.noop), s"$creps")
    assert(sreps.exists(!_.noop), s"$sreps")
    assert(qreps.exists(r => !r.noop && r.assigned == 4), s"$qreps")
    def pairSet() = ContainIndex.pairs(spark, idxLake, "contain_pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet() == Set((4L, 5L)), s"${pairSet()}")
    def shardSlots() = ShardMap.assignment(spark, idxLake, "shard_map")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val epoch1 = shardSlots()
    assert(epoch1.keySet == Set("1", "2", "4", "5"), s"$epoch1")

    // a delta landed later flows through the SAME follow: doc 6 is
    // another quote of doc 4
    AzofWriter.commitDelta(spark, srcLake, "docs", rows(Seq(
      6L -> "c2 c3 c4 c5 c6 c7"), "2024-02-01T00:00:00Z"),
      ts("2024-02-01T00:00:00Z"), ts("2024-02-01T00:00:00Z"))
    creps = Vector.empty
    val seqHwm = SeqMap.assignment(spark, idxLake, "seq_map")
      .collect().map(r => r.getLong(2) + r.getLong(1)).max
    DedupFlow.follow(spark, srcLake, "docs", "text", idxLake, ck,
      containTable = Some("contain_pairs"),
      onContainReport = r => creps :+= r,
      shardTable = Some("shard_map"),
      seqTable = Some("seq_map"),
      lmTable = Some("lm_stats"),
      mvTable = Some("mv"),
      mvView = Some(ViewDef(Seq("text")))).awaitTermination()
    assert(creps.exists(!_.noop), s"$creps")
    assert(pairSet() == Set((4L, 5L), (4L, 6L)), s"${pairSet()}")
    // doc 6 appended after the high-water rank; epoch-1 slots untouched
    val all = shardSlots()
    assert(all("6") == 4L && epoch1.forall { case (k, r) => all(k) == r },
      s"$all")
    // and its token span appended after the epoch-1 token HWM
    val span6 = SeqMap.assignment(spark, idxLake, "seq_map")
      .where(org.apache.spark.sql.functions.col(TableSchema.KeyName) === "6")
      .collect()(0)
    assert(span6.getLong(2) == seqHwm && span6.getLong(1) == 6L, s"$span6")
    // and the near-dup family stayed ≡ one-shot across both passes
    assert(assignment(idxLake) == oneShot(srcLake))
    // the LM stats rode the same follow: incremental ≡ retrain over the
    // (append-only) corpus
    val servedLm = LmIndex.score(spark, srcLake, "docs", "text",
        idxLake, "lm_stats")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val retrain = graft.operators.TextAnalysis.lmScore(
        graft.operators.AzofScan.scan(spark, srcLake, "docs")
          .select(org.apache.spark.sql.functions
            .col(TableSchema.KeyName).as("doc_id"),
            org.apache.spark.sql.functions.col("text")),
        org.apache.spark.sql.functions.col("text"),
        org.apache.spark.sql.functions.col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(servedLm == retrain, "follow-maintained LM stats ≡ retrain")
    // and so did the materialized view (per-text live counts)
    val servedMv = MatView.serve(spark, idxLake, "mv", ViewDef(Seq("text")))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val mvRetrain = graft.operators.AzofScan.scan(spark, srcLake, "docs")
      .groupBy("text").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(servedMv == mvRetrain, "follow-maintained view ≡ retrain")
  }

  test("follow with containPostings serves the containment family from " +
    "the posting table — no corpus pass per pass; mixing a postings-" +
    "less history refuses") {
    val srcLake = Files.createTempDirectory("azof-follow5-src").toString
    val idxLake = Files.createTempDirectory("azof-follow5-idx").toString
    val ck = Files.createTempDirectory("azof-follow5-ck").toString
    AzofWriter.createTable(spark, srcLake, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, srcLake, "docs", rows(Seq(
      4L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10",
      5L -> "c1 c2 c3 c4 c5 c6"),
      "2024-01-02T00:00:00Z"))
    DedupFlow.create(spark, idxLake)
    ContainIndex.create(spark, idxLake)
    ContainIndex.createPostings(spark, idxLake)
    def pairs() = ContainIndex.pairs(spark, idxLake, "contain_pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    DedupFlow.follow(spark, srcLake, "docs", "text", idxLake, ck,
      containTable = Some("contain_pairs"),
      containPostings = Some("contain_postings")).awaitTermination()
    assert(pairs() == Set((4L, 5L)), s"${pairs()}")
    // another quote lands; the SAME follow maintains pairs via postings
    AzofWriter.commitDelta(spark, srcLake, "docs", rows(Seq(
      6L -> "c2 c3 c4 c5 c6 c7"), "2024-02-01T00:00:00Z"),
      ts("2024-02-01T00:00:00Z"), ts("2024-02-01T00:00:00Z"))
    DedupFlow.follow(spark, srcLake, "docs", "text", idxLake, ck,
      containTable = Some("contain_pairs"),
      containPostings = Some("contain_postings")).awaitTermination()
    assert(pairs() == Set((4L, 5L), (4L, 6L)), s"${pairs()}")
    assert(graft.operators.AzofScan
      .scan(spark, idxLake, "contain_postings").count() > 0)

    // the footgun guard: a SECOND index whose cursor advanced through
    // scan-path refreshes refuses a late postings enable
    val idx2 = Files.createTempDirectory("azof-follow5-idx2").toString
    ContainIndex.create(spark, idx2)
    ContainIndex.refresh(spark, srcLake, "docs", "text", idx2,
      at = ts("2024-03-01T00:00:00Z"))                  // scan path
    ContainIndex.createPostings(spark, idx2)
    AzofWriter.commitDelta(spark, srcLake, "docs", rows(Seq(
      7L -> fam("w", "late")), "2024-03-02T00:00:00Z"),
      ts("2024-03-02T00:00:00Z"), ts("2024-03-02T00:00:00Z"))
    val e = intercept[IllegalArgumentException](
      ContainIndex.refresh(spark, srcLake, "docs", "text", idx2,
        at = ts("2024-03-03T00:00:00Z"),
        postings = Some("contain_postings")))
    assert(e.getMessage.contains("fresh cursor"), e.getMessage)
  }

  test("source compaction in the follow driver keeps the source's live-" +
    "file count bounded across a soak while ingest stays ≡ one-shot") {
    val srcLake = Files.createTempDirectory("azof-follow4-src").toString
    val idxLake = Files.createTempDirectory("azof-follow4-idx").toString
    val ck = Files.createTempDirectory("azof-follow4-ck").toString
    AzofWriter.createTable(spark, srcLake, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, srcLake, "docs", rows(Seq(
      1L -> fam("w", "alpha"),
      4L -> "completely different text entirely"),
      "2024-01-02T00:00:00Z"))
    DedupFlow.create(spark, idxLake)

    val q = DedupFlow.follow(spark, srcLake, "docs", "text", idxLake, ck,
      trigger = Trigger.ProcessingTime("500 milliseconds"),
      compactSourceEvery = 1)
    val expect = Set(1L, 5L, 6L, 7L, 8L, 9L)
    try {
      // five more commits while the follow is live: without source
      // compaction the table ends at 6 live data files
      (0 until 5).foreach { i =>
        AzofWriter.commitDelta(spark, srcLake, "docs", rows(Seq(
          (5L + i) -> fam("w", s"g$i")), f"2024-02-0${i + 1}T00:00:00Z"),
          ts(f"2024-02-0${i + 1}T00:00:00Z"),
          ts(f"2024-02-0${i + 1}T00:00:00Z"))
        Thread.sleep(400)
      }
      val deadline = System.currentTimeMillis() + 120000
      var a = assignment(idxLake)
      while (a.keySet != expect && System.currentTimeMillis() < deadline) {
        Thread.sleep(1000); a = assignment(idxLake)
      }
      assert(a == oneShot(srcLake), s"soak diverged: $a")
      assert(a.keySet == expect, s"$a")
      // let the driver run one more cycle so the LAST data batch's
      // fold also lands before the bound is asserted
      Thread.sleep(2500)
    } finally q.stop()
    val src = AzofTable(spark, srcLake, "docs")
    val live = src.currentSnapshot
      .dataFiles(graft.format.AsOf.Current).size
    assert(live <= 3,
      s"follow-driven compaction should bound live files, found $live")
    // at least one fold actually committed (the bound is not vacuous)
    val dir = src.tableDir
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val folded = AzofTable.snapshotIdsOnDisk(fs, dir).exists(id =>
      src.classifySnapshot(id.toString) match {
        case graft.format.SnapshotCodec.DocClass.Valid(s) =>
          s.op.contains("compact")
        case _ => false
      })
    assert(folded, "no compact commit found — the soak never folded")
    // the folded source still serves the complete corpus
    assert(graft.operators.AzofScan.scan(spark, srcLake, "docs")
      .count() == 7L)
  }

  test("processing-time follow soaks commits landed WHILE running and " +
    "retain bounds index history") {
    val srcLake = Files.createTempDirectory("azof-follow2-src").toString
    val idxLake = Files.createTempDirectory("azof-follow2-idx").toString
    val ck = Files.createTempDirectory("azof-follow2-ck").toString
    AzofWriter.createTable(spark, srcLake, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, srcLake, "docs", rows(Seq(
      1L -> fam("w", "alpha"),
      4L -> "completely different text entirely"),
      "2024-01-02T00:00:00Z"))
    DedupFlow.create(spark, idxLake)

    val q = DedupFlow.follow(spark, srcLake, "docs", "text", idxLake, ck,
      trigger = Trigger.ProcessingTime("500 milliseconds"),
      retain = 2, retainMinAgeMs = 0L)
    try {
      // land two MORE commits while the follow is live; each grows the
      // wfam cluster
      AzofWriter.commitDelta(spark, srcLake, "docs", rows(Seq(
        2L -> fam("w", "beta")), "2024-02-01T00:00:00Z"),
        ts("2024-02-01T00:00:00Z"), ts("2024-02-01T00:00:00Z"))
      AzofWriter.commitDelta(spark, srcLake, "docs", rows(Seq(
        3L -> fam("w", "gamma")), "2024-02-02T00:00:00Z"),
        ts("2024-02-02T00:00:00Z"), ts("2024-02-02T00:00:00Z"))
      val deadline = System.currentTimeMillis() + 120000
      var a = assignment(idxLake)
      while (a.keySet != Set(1L, 2L, 3L) &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(1000); a = assignment(idxLake)
      }
      assert(a == oneShot(srcLake), s"soak diverged: $a")
      assert(a == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    } finally q.stop()
    // retain=2 keeps the components table's snapshot history bounded
    // across however many refresh commits the soak produced
    val dir = AzofTable(spark, idxLake, "components").tableDir
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val snaps = fs.listStatus(dir)
      .map(_.getPath.getName).count(n => n.matches("s\\d+\\.json"))
    assert(snaps <= 4, s"retention should bound snapshots, found $snaps")
  }
}
