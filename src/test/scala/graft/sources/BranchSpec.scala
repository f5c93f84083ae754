package graft.sources

import graft.TestSpark
import graft.format._
import graft.operators.AzofScan
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Branches + write-audit-publish: a branch is a named write lineage in
  * the shared snapshot numbering that never advances `version.txt` —
  * main readers (and a reference reader) are blind to it until
  * fast-forward publishes its head as one main commit.
  */
class BranchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  private def df(rows: (String, String, String)*) = {
    val data = rows.map { case (k, t, v) =>
      Row(k, Timestamp.from(Instant.parse(t)), v)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq), schema.toStruct)
  }

  private def ts(s: String) = Instant.parse(s)

  private def scanSorted(lake: String, table: String,
      version: Option[Long] = None): Seq[(String, String)] = {
    val t = AzofTable(spark, lake, table)
    val snap = version.map(v => t.snapshot(v.toString))
      .getOrElse(t.currentSnapshot)
    AzofScan.scanSnapshot(spark, t, snap, AsOf.Current)
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
  }

  private def freshTable(): String = {
    val lake = Files.createTempDirectory("azof-branch").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t", df(
      ("1", "2024-01-02T00:00:00Z", "a1"),
      ("2", "2024-01-03T00:00:00Z", "b1")))                          // v2
    lake
  }

  private def versionTxt(lake: String): String = {
    val p = new Path(lake, "t/version.txt")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8).trim
    finally in.close()
  }

  test("branch writes are invisible to main (version.txt untouched); " +
    "the branch reads its own lineage via VERSION AS OF") {
    val lake = freshTable()
    val t = AzofTable(spark, lake, "t")
    assert(AzofWriter.createBranch(spark, lake, "t", "audit") == 2L)
    AzofWriter.commitDelta(spark, lake, "t",
      df(("2", "2024-02-05T00:00:00Z", "b2"),
         ("3", "2024-02-06T00:00:00Z", "c1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"),
      branch = Some("audit"))                                        // s3
    // main: unchanged view, unchanged pointer — a reference reader
    // following version.txt never sees the branch document
    assert(versionTxt(lake) == "2")
    assert(scanSorted(lake, "t") == Seq("1" -> "a1", "2" -> "b1"))
    // branch: the delta is live on its lineage
    assert(t.branchHead("audit").contains(3L))
    assert(t.resolveVersion("audit") == "3")
    assert(scanSorted(lake, "t", Some(3L)) ==
      Seq("1" -> "a1", "2" -> "b2", "3" -> "c1"))
    val s3 = t.snapshot("3")
    assert(s3.branch.contains("audit") && s3.parent.contains(2L))
  }

  test("main commits skip branch documents when selecting their base") {
    val lake = freshTable()
    AzofWriter.createBranch(spark, lake, "t", "audit")
    AzofWriter.commitDelta(spark, lake, "t",
      df(("9", "2024-02-05T00:00:00Z", "branch-only")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"),
      branch = Some("audit"))                                        // s3
    AzofWriter.commitDelta(spark, lake, "t",
      df(("4", "2024-02-07T00:00:00Z", "d1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // s4, main
    assert(versionTxt(lake) == "4")
    // main carries its own delta and never the branch's
    assert(scanSorted(lake, "t") ==
      Seq("1" -> "a1", "2" -> "b1", "4" -> "d1"))
    val s4 = AzofTable(spark, lake, "t").snapshot("4")
    assert(s4.branch.isEmpty && s4.parent.contains(2L),
      s"main commit must chain 2 -> 4 past the branch doc: ${s4.parent}")
  }

  test("fast-forward publishes the branch head as ONE main commit; the " +
    "change feed delivers the branch's rows at publish time") {
    val lake = freshTable()
    AzofWriter.createBranch(spark, lake, "t", "wap")
    AzofWriter.commitDelta(spark, lake, "t",
      df(("2", "2024-02-05T00:00:00Z", "b2")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"),
      branch = Some("wap"))                                          // s3
    AzofWriter.commitDelta(spark, lake, "t",
      df(("3", "2024-03-05T00:00:00Z", "c1")),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"),
      branch = Some("wap"))                                          // s4
    // audit reads the branch; main still pre-publish
    assert(scanSorted(lake, "t") == Seq("1" -> "a1", "2" -> "b1"))
    // feed BEFORE publish: the branch rows are absent
    val pre = AzofChangeFeed.since(spark, lake, "t", 1L)
      .select("key").collect().map(_.getString(0)).toSeq.sorted
    assert(pre == Seq("1", "2"), s"pre-publish feed leaked branch rows: $pre")

    val pubV = AzofWriter.fastForward(spark, lake, "t", "wap")
    assert(pubV == 5L)
    assert(versionTxt(lake) == "5")
    assert(scanSorted(lake, "t") ==
      Seq("1" -> "a1", "2" -> "b2", "3" -> "c1"))
    val s5 = AzofTable(spark, lake, "t").snapshot("5")
    assert(s5.op.contains("fast-forward#wap") && s5.branch.isEmpty)
    // the feed delivers the branch's files AT the publish version
    val post = AzofChangeFeed.since(spark, lake, "t", 2L)
      .select("key", "_commit_version").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(post == Seq(("2", 5L), ("3", 5L)),
      s"publish must feed exactly the branch rows at v5: $post")
  }

  test("fast-forward refuses when main advanced past the fork; " +
    "a no-commit branch refuses as nothing-to-publish") {
    val lake = freshTable()
    AzofWriter.createBranch(spark, lake, "t", "stale")
    val e0 = intercept[IllegalArgumentException](
      AzofWriter.fastForward(spark, lake, "t", "stale"))
    assert(e0.getMessage.contains("nothing to publish"), e0.getMessage)
    AzofWriter.commitDelta(spark, lake, "t",
      df(("9", "2024-02-05T00:00:00Z", "on-branch")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"),
      branch = Some("stale"))                                        // s3
    AzofWriter.commitDelta(spark, lake, "t",
      df(("4", "2024-02-07T00:00:00Z", "on-main")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // s4 main
    val e = intercept[IllegalArgumentException](
      AzofWriter.fastForward(spark, lake, "t", "stale"))
    assert(e.getMessage.contains("main advanced past the fork") &&
      e.getMessage.contains("s4"), e.getMessage)
    // main unchanged by the refusal
    assert(versionTxt(lake) == "4")
  }

  test("branch head pointer lag recovers through the parent chain") {
    val lake = freshTable()
    AzofWriter.createBranch(spark, lake, "t", "lag")
    AzofWriter.commitDelta(spark, lake, "t",
      df(("5", "2024-02-05T00:00:00Z", "x1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"),
      branch = Some("lag"))                                          // s3
    AzofWriter.commitDelta(spark, lake, "t",
      df(("6", "2024-02-06T00:00:00Z", "x2")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"),
      branch = Some("lag"))                                          // s4
    val t = AzofTable(spark, lake, "t")
    assert(t.branchHead("lag").contains(4L))
    // simulate a crash between snapshot write and pointer bump: pointer
    // back at the fork — recovery walks parent-chained branch docs
    val bp = new Path(lake, "t/" + AzofTable.branchFile("lag"))
    val fs = bp.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(bp, true)
    out.write("2".getBytes("UTF-8")); out.close()
    assert(t.branchHead("lag").contains(4L),
      "pointer at fork must recover to the true head via parent links")
  }

  test("vacuum retains live branch lineages; a dropped branch's " +
    "documents and files expire") {
    val lake = freshTable()
    AzofWriter.createBranch(spark, lake, "t", "keep")
    AzofWriter.commitDelta(spark, lake, "t",
      df(("7", "2024-02-05T00:00:00Z", "kept")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"),
      branch = Some("keep"))                                         // s3
    val r1 = AzofVacuum.vacuum(spark, lake, "t", keepLast = 10,
      minAgeMs = 0L)
    assert(r1.retainedSnapshots.contains(3) && r1.deletedSnapshots.isEmpty,
      s"live branch doc expired: $r1")
    assert(scanSorted(lake, "t", Some(3L)).contains("7" -> "kept"))

    AzofWriter.dropBranch(spark, lake, "t", "keep")
    val r2 = AzofVacuum.vacuum(spark, lake, "t", keepLast = 10,
      minAgeMs = 0L)
    assert(r2.deletedSnapshots == Seq(3),
      s"dropped branch doc must expire: $r2")
    assert(r2.deletedDataFiles.nonEmpty,
      "the branch-only delta file must be swept with its lineage")
    // main unaffected throughout
    assert(scanSorted(lake, "t") == Seq("1" -> "a1", "2" -> "b1"))
  }

  test("SQL surface: INSERT INTO cat.t.branch_<b> + branch view reads + " +
    "UPDATE on the branch view + CALL create_branch/fast_forward") {
    val lake = freshTable()
    val cat = "azbr"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[AzofCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake)
    spark.sql(s"CALL $cat.system.create_branch('t', 'stage')").collect()
    spark.sql(
      s"""INSERT INTO $cat.t.branch_stage VALUES
          ('3', TIMESTAMP'2024-02-06 00:00:00', 'staged')""")         // s3
    // branch view reads its lineage; the table reads main
    assert(spark.sql(s"SELECT key, value FROM $cat.t.branch_stage")
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
      .toSeq == Seq("1" -> "a1", "2" -> "b1", "3" -> "staged"))
    assert(spark.sql(s"SELECT key FROM $cat.t").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("1", "2"))
    // VERSION AS OF resolves the branch name on the table itself
    assert(spark.sql(
      s"SELECT key FROM $cat.t VERSION AS OF 'stage'").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("1", "2", "3"))
    // row-level DML on the branch view lands on the branch: the audit
    // step can patch what it finds before publish. The UPDATE keeps the
    // row's original event_time, so the branch winner is decided by the
    // exact-tie commit-seq rule (the DML file landed later).
    spark.sql(
      s"UPDATE $cat.t.branch_stage SET value = 'patched' WHERE key = '1'")
    assert(versionTxt(lake) == "2", "branch UPDATE must not advance main")
    assert(spark.sql(s"SELECT value FROM $cat.t.branch_stage " +
      "WHERE key = '1'").collect().map(_.getString(0)).toSeq ==
      Seq("patched"))
    assert(spark.sql(s"SELECT value FROM $cat.t WHERE key = '1'")
      .collect().map(_.getString(0)).toSeq == Seq("a1"),
      "main must not see the branch UPDATE before publish")
    val pub = spark.sql(s"CALL $cat.system.fast_forward('t', 'stage')")
      .collect()(0)
    assert(pub.getString(0) == "stage" && pub.getLong(1) == 5L)
    assert(spark.sql(s"SELECT key, value FROM $cat.t").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq ==
      Seq("1" -> "patched", "2" -> "b1", "3" -> "staged"))
  }

  test("MERGE with a DELETE clause on a branch view lands tombstones on " +
    "the branch; merge-branch publishes the audited state onto the " +
    "advanced main; main-lineage commits never conflict a branch DML") {
    val lake = freshTable()
    val cat = "azbmg"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[AzofCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake)
    AzofWriter.createBranch(spark, lake, "t", "stage")                // fork 2
    // main advances PAST the fork before the branch statement commits:
    // with lineage-scoped conflict validation this must not conflict
    AzofWriter.commitDelta(spark, lake, "t",
      df(("4", "2024-02-07T00:00:00Z", "d1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))         // s3 main
    spark.sql(
      s"""MERGE INTO $cat.t.branch_stage t
          USING (SELECT '1' AS key, 'drop' AS act
                 UNION ALL SELECT '5', 'add') s
          ON t.key = s.key
          WHEN MATCHED AND s.act = 'drop' THEN DELETE
          WHEN NOT MATCHED THEN INSERT (key, event_time, value)
               VALUES (s.key, TIMESTAMP'2024-02-08 00:00:00', 'e1')""") // s4
    // branch view: key 1 tombstoned, key 5 inserted; main blind to both
    assert(spark.sql(s"SELECT key FROM $cat.t.branch_stage").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("2", "5"))
    assert(scanSorted(lake, "t") ==
      Seq("1" -> "a1", "2" -> "b1", "4" -> "d1"))
    // diverged -> merge-branch; the tombstone suppresses key 1 on main
    val v = AzofWriter.mergeBranch(spark, lake, "t", "stage")
    assert(v == 5L)
    assert(scanSorted(lake, "t") ==
      Seq("2" -> "b1", "4" -> "d1", "5" -> "e1"))
  }

  test("DELETE with a value predicate on a branch view routes through " +
    "the row-level path and tombstones on the branch only") {
    val lake = freshTable()
    val cat = "azbdel"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[AzofCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake)
    AzofWriter.createBranch(spark, lake, "t", "scrub")
    spark.sql(s"DELETE FROM $cat.t.branch_scrub WHERE value = 'a1'")
    assert(spark.sql(s"SELECT key FROM $cat.t.branch_scrub").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("2"))
    assert(scanSorted(lake, "t") == Seq("1" -> "a1", "2" -> "b1"),
      "main must not see the branch DELETE")
    assert(versionTxt(lake) == "2")
  }

  test("branch DML conflict validation is scoped to the branch lineage: " +
    "a branch commit after the statement's read conflicts; main's don't") {
    val lake = freshTable()
    AzofWriter.createBranch(spark, lake, "t", "busy")                 // fork 2
    AzofWriter.commitDelta(spark, lake, "t",
      df(("2", "2024-02-05T00:00:00Z", "b2")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"),
      branch = Some("busy"))                                          // s3
    // a statement that READ the fork (v2) and wrote key 2 must fail:
    // the branch advanced past its read snapshot with an overlapping key
    intercept[java.util.ConcurrentModificationException](
      AzofWriter.commitLandedDeltas(spark, lake, "t",
        Seq(Delta("never-lands.parquet",
          ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"),
          Some(FileStats("2", "2", None)))),
        op = "sql-dml",
        validate = Some(AzofWriter.DmlConflictCheck(
          2L, "2", "2", lineage = Some("busy"))),
        branch = Some("busy")))
    // same stale read, but the in-window commit is on ANOTHER lineage
    // (main): no conflict — the statement's view never included main
    val lake2 = freshTable()
    AzofWriter.createBranch(spark, lake2, "t", "calm")                // fork 2
    AzofWriter.commitDelta(spark, lake2, "t",
      df(("2", "2024-02-05T00:00:00Z", "b-main")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))         // s3 main
    val kv = df(("2", "2024-02-06T00:00:00Z", "b-branch"))
    AzofWriter.commitDelta(spark, lake2, "t", kv,
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"),
      branch = Some("calm"))                                          // s4
    assert(AzofTable(spark, lake2, "t").branchHead("calm").contains(4L))
  }

  test("UPDATE under WAP session routing mutates the branch, not main") {
    val lake = freshTable()
    val cat = "azwdml"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[AzofCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake)
    AzofWriter.createBranch(spark, lake, "t", "wap")
    try {
      spark.conf.set(AzofCatalog.WapBranchConf, "wap")
      // the ETL's DML statement is UNCHANGED — the conf routes it
      spark.sql(s"UPDATE $cat.t SET value = 'audited' WHERE key = '2'")
      assert(versionTxt(lake) == "2", "WAP UPDATE must not advance main")
      assert(spark.sql(s"SELECT value FROM $cat.t WHERE key = '2'")
        .collect().map(_.getString(0)).toSeq == Seq("audited"),
        "under the conf, the unpinned read serves the branch's UPDATE")
    } finally spark.conf.unset(AzofCatalog.WapBranchConf)
    assert(spark.sql(s"SELECT value FROM $cat.t WHERE key = '2'")
      .collect().map(_.getString(0)).toSeq == Seq("b1"),
      "conf unset: main untouched")
  }

  test("name hygiene: digits-only, 'main', tag collisions, and unknown " +
    "branches refuse loudly; duplicate create refuses") {
    val lake = freshTable()
    intercept[IllegalArgumentException](
      AzofWriter.createBranch(spark, lake, "t", "123"))
    intercept[IllegalArgumentException](
      AzofWriter.createBranch(spark, lake, "t", "main"))
    AzofWriter.tagVersion(spark, lake, "t", "pinned")
    val e = intercept[IllegalArgumentException](
      AzofWriter.createBranch(spark, lake, "t", "pinned"))
    assert(e.getMessage.contains("tag"), e.getMessage)
    AzofWriter.createBranch(spark, lake, "t", "dup")
    val e2 = intercept[IllegalArgumentException](
      AzofWriter.createBranch(spark, lake, "t", "dup"))
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      AzofWriter.commitDelta(spark, lake, "t",
        df(("1", "2024-02-05T00:00:00Z", "x")),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"),
        branch = Some("ghost")))
    assert(e3.getMessage.contains("no branch 'ghost'"), e3.getMessage)
    intercept[IllegalArgumentException](
      AzofWriter.dropBranch(spark, lake, "t", "ghost"))
  }

  test("merge-branch publishes a DIVERGED branch onto the advanced main " +
    "head; the feed delivers the branch's rows at merge time") {
    val lake = freshTable()
    AzofWriter.createBranch(spark, lake, "t", "feat")               // fork 2
    AzofWriter.commitDelta(spark, lake, "t",
      df(("2", "2024-02-05T00:00:00Z", "b2"),
         ("9", "2024-02-06T00:00:00Z", "n1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"),
      branch = Some("feat"))                                        // s3
    AzofWriter.commitDelta(spark, lake, "t",
      df(("4", "2024-02-07T00:00:00Z", "d1"),
         ("2", "2024-03-05T00:00:00Z", "b-main")),
      ts("2024-02-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))       // s4 main
    // diverged: fast-forward refuses, merge publishes
    intercept[IllegalArgumentException](
      AzofWriter.fastForward(spark, lake, "t", "feat"))
    val v = AzofWriter.mergeBranch(spark, lake, "t", "feat")
    assert(v == 5L && versionTxt(lake) == "5")
    // per-key latest event time across BOTH lineages: key 2's main row
    // (Mar 5) beats the branch's (Feb 5) on event time alone
    assert(scanSorted(lake, "t") == Seq("1" -> "a1", "2" -> "b-main",
      "4" -> "d1", "9" -> "n1"))
    val s5 = AzofTable(spark, lake, "t").snapshot("5")
    assert(s5.op.contains("merge#feat") && s5.branch.isEmpty &&
      s5.parent.contains(4L))
    // the feed delivers exactly the branch's file at the merge version
    val fed = AzofChangeFeed.since(spark, lake, "t", 4L)
      .select("key", "_commit_version").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(fed == Seq(("2", 5L), ("9", 5L)),
      s"merge must feed exactly the branch rows at v5: $fed")
    // the branch lineage still time-travels pre-merge
    assert(scanSorted(lake, "t", Some(3L)) ==
      Seq("1" -> "a1", "2" -> "b2", "9" -> "n1"))
    // a re-merge has nothing left to publish
    val e = intercept[IllegalArgumentException](
      AzofWriter.mergeBranch(spark, lake, "t", "feat"))
    assert(e.getMessage.contains("nothing to merge"), e.getMessage)
  }

  test("merge-branch exact event-time ties resolve by TRUE landing " +
    "order in the shared numbering, whichever lineage wrote later") {
    val lake = freshTable()
    val T = "2024-02-05T00:00:00Z"
    // phase A: main writes key 5 first (s3), the branch later (s4)
    AzofWriter.createBranch(spark, lake, "t", "tie")                // fork 2
    AzofWriter.commitDelta(spark, lake, "t",
      df(("5", T, "main-s3")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))       // s3 main
    AzofWriter.commitDelta(spark, lake, "t",
      df(("5", T, "branch-s4")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"),
      branch = Some("tie"))                                         // s4
    assert(AzofWriter.mergeBranch(spark, lake, "t", "tie") == 5L)
    assert(scanSorted(lake, "t").toMap.apply("5") == "branch-s4",
      "the branch delta landed later (s4 > s3): it wins the exact tie")
    // phase B: the branch writes key 7 first (s6), main later (s7)
    AzofWriter.createBranch(spark, lake, "t", "tie2")               // fork 5
    AzofWriter.commitDelta(spark, lake, "t",
      df(("7", T, "branch-s6")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"),
      branch = Some("tie2"))                                        // s6
    AzofWriter.commitDelta(spark, lake, "t",
      df(("7", T, "main-s7")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))       // s7 main
    assert(AzofWriter.mergeBranch(spark, lake, "t", "tie2") == 8L)
    assert(scanSorted(lake, "t").toMap.apply("7") == "main-s7",
      "the main delta landed later (s7 > s6): it wins the exact tie")
  }

  test("merge-branch refuses a FOLDED branch: the fold re-stamps rows " +
    "at its own later seq, which would resurrect pre-fold values over " +
    "main commits that landed before the fold") {
    val lake = freshTable()
    val T = "2024-02-05T00:00:00Z"
    AzofWriter.createBranch(spark, lake, "t", "stage")               // fork 2
    // branch stages a value for key 5 at event time T (s3) ...
    AzofWriter.commitDelta(spark, lake, "t",
      df(("5", T, "stale-branch")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"),
      branch = Some("stage"))                                        // s3
    // ... then MAIN updates the same key at the SAME event time (s4):
    // landing order says main wins the exact tie (s4 > s3)
    AzofWriter.commitDelta(spark, lake, "t",
      df(("5", T, "fresh-main")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // s4 main
    // the branch folds (multi-file, so every fold output is a Delta
    // entry — the shape the append-only base-file check cannot see);
    // the fold re-stamps "stale-branch" at ITS commit seq (s5 > s4)
    AzofWriter.compact(spark, lake, "t", ts("2024-03-01T00:00:00Z"),
      numFiles = 2, branch = Some("stage"))                          // s5 fold
    // a merge would register the fold's rows with seq 5, silently
    // beating main's s4 on the exact event-time tie — refused
    val e = intercept[IllegalArgumentException](
      AzofWriter.mergeBranch(spark, lake, "t", "stage"))
    assert(e.getMessage.contains("folded"), e.getMessage)
    // main is untouched: the s4 update still wins
    assert(scanSorted(lake, "t").toMap.apply("5") == "fresh-main")
    // the documented escape hatches still work: a folded branch
    // publishes via fast-forward (after a re-fork here, since main
    // advanced past the fork), and an UNFOLDED branch still merges
    AzofWriter.createBranch(spark, lake, "t", "stage2")              // fork 4
    AzofWriter.commitDelta(spark, lake, "t",
      df(("9", "2024-03-05T00:00:00Z", "n1")),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"),
      branch = Some("stage2"))
    AzofWriter.commitDelta(spark, lake, "t",
      df(("8", "2024-03-06T00:00:00Z", "m1")),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))        // main
    assert(AzofWriter.mergeBranch(spark, lake, "t", "stage2") > 0L)
    val m = scanSorted(lake, "t").toMap
    assert(m("9") == "n1" && m("8") == "m1" && m("5") == "fresh-main")
  }

  test("branch ADDITIVE schema evolution: the staged migration shape — " +
    "add + backfill on the branch (main blind), fast-forward publishes " +
    "the evolution; merge reconciles additively or refuses conflicts") {
    val lake = freshTable()
    AzofWriter.createBranch(spark, lake, "t", "mig")                 // fork 2
    AzofWriter.addColumn(spark, lake, "t",
      ColumnDef("extra", ColumnType.AzString, nullable = true),
      branch = Some("mig"))                                          // s3 br
    val t = AzofTable(spark, lake, "t")
    assert(t.currentVersion == "2", "main pointer untouched by branch ALTER")
    assert(!t.currentSnapshot.schema.columns.exists(_.name == "extra"),
      "main schema blind to the staged evolution")
    val head = t.branchHead("mig").get
    assert(t.snapshot(head.toString).schema.columns.exists(_.name == "extra"))
    // backfill on the branch with the evolved schema
    val wide = df(("3", "2024-02-05T00:00:00Z", "c1"))
      .withColumn("extra", org.apache.spark.sql.functions.lit("e3"))
    AzofWriter.commitDelta(spark, lake, "t", wide,
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"),
      branch = Some("mig"))                                          // s4 br
    val h2 = t.branchHead("mig").get
    val staged = AzofScan.scanSnapshot(spark, t, t.snapshot(h2.toString),
        AsOf.Current)
      .select("key", "value", "extra").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2))))
      .sortBy(_._1).toSeq
    assert(staged == Seq(("1", "a1", None), ("2", "b1", None),
      ("3", "c1", Some("e3"))),
      s"pre-evolution rows read null in the added column: $staged")
    // fast-forward publishes the evolution + the backfill in one commit
    AzofWriter.fastForward(spark, lake, "t", "mig")
    assert(AzofTable(spark, lake, "t").currentSnapshot.schema.columns
      .exists(_.name == "extra"))
    val live = AzofScan.scan(spark, lake, "t")
      .select("key", "extra").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).sortBy(_._1).toSeq
    assert(live == Seq("1" -> None, "2" -> None, "3" -> Some("e3")))

    // writer contract: a commit carries every LINEAGE column (nullable
    // ones as nulls) — pad each staged frame to its branch's schema
    def padded(base: org.apache.spark.sql.DataFrame,
        branch: String): org.apache.spark.sql.DataFrame = {
      val tt = AzofTable(spark, lake, "t")
      val snap = tt.snapshot(tt.branchHead(branch).get.toString)
      snap.schema.columns.foldLeft(base)((d, c) =>
        if (d.columns.contains(c.name)) d
        else d.withColumn(c.name, org.apache.spark.sql.functions
          .lit(null).cast(c.dataType.sparkType)))
    }

    // MERGE path: a diverged branch's added column reconciles onto the
    // advanced main
    AzofWriter.createBranch(spark, lake, "t", "mig2")                // fork
    AzofWriter.addColumn(spark, lake, "t",
      ColumnDef("score", ColumnType.AzInt, nullable = true),
      branch = Some("mig2"))
    AzofWriter.commitDelta(spark, lake, "t",
      padded(df(("7", "2024-03-05T00:00:00Z", "g1"))
        .withColumn("score", org.apache.spark.sql.functions.lit(9L)),
        "mig2"),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"),
      branch = Some("mig2"))
    AzofWriter.commitDelta(spark, lake, "t",
      df(("8", "2024-03-06T00:00:00Z", "h1"))
        .withColumn("extra",
          org.apache.spark.sql.functions.lit(null).cast("string")),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))        // main
    assert(AzofWriter.mergeBranch(spark, lake, "t", "mig2") > 0L)
    val merged = AzofTable(spark, lake, "t").currentSnapshot
    assert(merged.schema.columns.exists(_.name == "score"))
    val m = AzofScan.scan(spark, lake, "t")
      .select("key", "score").collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(m("7") == Some(9L) && m("8") == None, s"$m")

    // name-addressed unification: main independently adds the SAME
    // definition post-fork — the merge unifies (branch bytes serve
    // under the one column); an INCOMPATIBLE definition (type clash)
    // refuses
    AzofWriter.createBranch(spark, lake, "t", "mig3")
    AzofWriter.addColumn(spark, lake, "t",
      ColumnDef("dup", ColumnType.AzString, nullable = true),
      branch = Some("mig3"))
    AzofWriter.commitDelta(spark, lake, "t",
      padded(df(("9", "2024-04-05T00:00:00Z", "i1"))
        .withColumn("dup", org.apache.spark.sql.functions.lit("d9")),
        "mig3"),
      ts("2024-04-01T00:00:00Z"), ts("2024-05-01T00:00:00Z"),
      branch = Some("mig3"))
    AzofWriter.addColumn(spark, lake, "t",
      ColumnDef("dup", ColumnType.AzString, nullable = true))        // main
    assert(AzofWriter.mergeBranch(spark, lake, "t", "mig3") > 0L)
    val dups = AzofScan.scan(spark, lake, "t")
      .where(org.apache.spark.sql.functions.col("dup").isNotNull)
      .select("key", "dup").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(dups == Seq("9" -> "d9"),
      s"identical definitions unify; branch bytes serve: $dups")
    AzofWriter.createBranch(spark, lake, "t", "mig3b")
    AzofWriter.addColumn(spark, lake, "t",
      ColumnDef("clash", ColumnType.AzString, nullable = true),
      branch = Some("mig3b"))
    AzofWriter.commitDelta(spark, lake, "t",
      padded(df(("11", "2024-04-06T00:00:00Z", "k1")), "mig3b"),
      ts("2024-04-01T00:00:00Z"), ts("2024-05-01T00:00:00Z"),
      branch = Some("mig3b"))
    AzofWriter.addColumn(spark, lake, "t",
      ColumnDef("clash", ColumnType.AzInt, nullable = true))         // main
    val e1 = intercept[IllegalArgumentException](
      AzofWriter.mergeBranch(spark, lake, "t", "mig3b"))
    assert(e1.getMessage.contains("one name"), e1.getMessage)

    // resurrection: main RETIRED the name the branch added post-fork
    AzofWriter.createBranch(spark, lake, "t", "mig4")
    AzofWriter.addColumn(spark, lake, "t",
      ColumnDef("temp", ColumnType.AzString, nullable = true),
      branch = Some("mig4"))
    AzofWriter.commitDelta(spark, lake, "t",
      padded(df(("10", "2024-05-05T00:00:00Z", "j1")), "mig4"),
      ts("2024-05-01T00:00:00Z"), ts("2024-06-01T00:00:00Z"),
      branch = Some("mig4"))
    AzofWriter.addColumn(spark, lake, "t",
      ColumnDef("temp", ColumnType.AzString, nullable = true))       // main
    AzofWriter.dropColumn(spark, lake, "t", "temp")                  // retired
    val e2 = intercept[IllegalArgumentException](
      AzofWriter.mergeBranch(spark, lake, "t", "mig4"))
    assert(e2.getMessage.contains("resurrect"), e2.getMessage)
  }

  test("SQL surface: ALTER TABLE cat.t.branch_<b> ADD COLUMN stages the " +
    "evolution; INSERT INTO the evolved branch view carries the column; " +
    "DROP/RENAME on a branch view refuse") {
    val lake = freshTable()
    val cat = "azbev"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[AzofCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake)
    AzofWriter.createBranch(spark, lake, "t", "mig")                 // fork 2
    spark.sql(s"ALTER TABLE $cat.t.branch_mig ADD COLUMN extra STRING")
    val t = AzofTable(spark, lake, "t")
    assert(t.currentVersion == "2" &&
      !t.currentSnapshot.schema.columns.exists(_.name == "extra"))
    spark.sql(s"INSERT INTO $cat.t.branch_mig VALUES " +
      "('5', TIMESTAMP '2024-02-05 00:00:00', 'e1', 'x5')")
    val staged = spark.sql(
        s"SELECT key, extra FROM $cat.t VERSION AS OF 'mig'")
      .collect().map(r => (r.getString(0), Option(r.getString(1))))
      .sortBy(_._1).toSeq
    assert(staged == Seq("1" -> None, "2" -> None, "5" -> Some("x5")),
      s"$staged")
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.t.branch_mig DROP COLUMN value"))
    assert(e.getMessage.contains("ADD-only"), e.getMessage)
    AzofWriter.fastForward(spark, lake, "t", "mig")
    assert(AzofScan.scan(spark, lake, "t").columns.contains("extra"))
  }

  test("WAP session conf routes unpinned loads through the branch: " +
    "unchanged SQL reads and writes the branch; pins and main stay put") {
    val lake = freshTable()
    val cat = "azwap"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[AzofCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake)
    AzofWriter.createBranch(spark, lake, "t", "wap")
    try {
      spark.conf.set(AzofCatalog.WapBranchConf, "wap")
      // the ETL job's SQL is UNCHANGED — the conf routes it
      spark.sql(s"""INSERT INTO $cat.t VALUES
          ('3', TIMESTAMP'2024-02-06 00:00:00', 'staged')""")
      assert(versionTxt(lake) == "2", "WAP write must not advance main")
      // unpinned read under the conf serves the branch (sees the write)
      assert(spark.sql(s"SELECT key FROM $cat.t").collect()
        .map(_.getString(0)).sorted.toSeq == Seq("1", "2", "3"))
      // an explicit pin always wins the session default
      assert(spark.sql(s"SELECT key FROM $cat.t VERSION AS OF 2")
        .collect().map(_.getString(0)).sorted.toSeq == Seq("1", "2"))
      // unknown branch refuses rather than silently writing main
      spark.conf.set(AzofCatalog.WapBranchConf, "ghost")
      val e = intercept[Exception](
        spark.sql(s"SELECT * FROM $cat.t").collect())
      assert(e.getMessage.contains("ghost"), e.getMessage)
    } finally spark.conf.unset(AzofCatalog.WapBranchConf)
    // conf unset: main view, untouched
    assert(spark.sql(s"SELECT key FROM $cat.t").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("1", "2"))
    assert(AzofWriter.fastForward(spark, lake, "t", "wap") == 4L)
    assert(spark.sql(s"SELECT key, value FROM $cat.t WHERE key = '3'")
      .collect().map(_.getString(1)).toSeq == Seq("staged"))
  }

  test("SQL CALL merge_branch publishes a diverged INSERT INTO branch") {
    val lake = freshTable()
    val cat = "azmg"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[AzofCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake)
    spark.sql(s"CALL $cat.system.create_branch('t', 'mg')").collect()
    spark.sql(s"""INSERT INTO $cat.t.branch_mg VALUES
        ('3', TIMESTAMP'2024-02-06 00:00:00', 'staged')""")         // s3
    spark.sql(s"""INSERT INTO $cat.t VALUES
        ('4', TIMESTAMP'2024-02-07 00:00:00', 'mainline')""")       // s4
    val r = spark.sql(s"CALL $cat.system.merge_branch('t', 'mg')")
      .collect()(0)
    assert(r.getString(0) == "mg" && r.getLong(1) == 5L)
    assert(spark.sql(s"SELECT key FROM $cat.t").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("1", "2", "3", "4"))
  }
}
