package graft.sources

import graft.TestSpark
import graft.format._
import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** RawLocalFileSystem that counts `open` calls per snapshot document —
  * pins the change feed's one-parse-per-document contract on long
  * histories (the pairwise walk used to read interior documents twice).
  */
class CountingSnapshotFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "countfs"
  override def getUri: java.net.URI = java.net.URI.create("countfs:///")
  override def open(f: org.apache.hadoop.fs.Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    CountingSnapshotFs.record(f.getName)
    super.open(f, bufferSize)
  }
}

object CountingSnapshotFs {
  val opens = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  def record(name: String): Unit =
    if (name.startsWith("s") && name.endsWith(".json")) {
      opens.merge(name, 1, (a, b) => a + b); ()
    }
  def reset(): Unit = opens.clear()
}

class ChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  private def df(rows: (String, String, String)*) = {
    val data = rows.map { case (k, t, v) =>
      Row(k, Timestamp.from(Instant.parse(t)), v)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data.toSeq), schema.toStruct)
  }

  private def ts(s: String) = Instant.parse(s)

  test("change feed returns per-commit rows and skips compaction rewrites") {
    val lake = Files.createTempDirectory("azof-cdf").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1")))                       // v2
    AzofWriter.commitDelta(spark, lake, "t",
      df(("2", "2024-02-05T00:00:00Z", "b1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    AzofWriter.compact(spark, lake, "t", ts("2024-03-01T00:00:00Z")) // v4
    AzofWriter.commitDelta(spark, lake, "t",
      df(("1", "2024-03-05T00:00:00Z", "a2")),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))        // v5

    val feed = AzofChangeFeed.since(spark, lake, "t", 1L)
      .select("key", "value", "_commit_version")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1)).toSeq
    // v4 (compact) contributes nothing even though it added a base file
    assert(feed == Seq(("1", "a1", 2L), ("2", "b1", 3L), ("1", "a2", 5L)))

    val window = AzofChangeFeed.between(spark, lake, "t", 2L, 3L)
    assert(window.count() == 1)

    val empty = AzofChangeFeed.between(spark, lake, "t", 3L, 4L)
    assert(empty.count() == 0)
    assert(empty.columns.contains("_commit_version"))

    // the DataFrameReader face returns the same feed, and filters
    // compose above it
    val viaReader = spark.read.format("azof")
      .option("table", "t").option("changesFrom", "1").load(lake)
      .select("key", "value", "_commit_version")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1)).toSeq
    assert(viaReader == feed)
    val bounded = spark.read.format("azof")
      .option("table", "t")
      .option("changesFrom", "2").option("changesTo", "3").load(lake)
      .where("key = '2'")
    assert(bounded.count() == 1)
  }

  test("followOnce: resumable commit-exact tail — no orphans, crash redelivery, retention error") {
    val lake = Files.createTempDirectory("azof-cdf-follow").toString
    val ckpt = Files.createTempDirectory("azof-cdf-ck").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1")))                       // v2
    AzofWriter.commitDelta(spark, lake, "t",
      df(("2", "2024-02-05T00:00:00Z", "b1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    // a crashed writer's ORPHAN: well-named data file, never committed —
    // the file-level append feed would surface it; this feed must not
    Files.write(java.nio.file.Paths.get(lake, "t",
      "delta_s9_deadbeef.parquet"), Array[Byte](1, 2, 3))

    def poll(): Seq[(String, String, Long)] = {
      var got = Seq.empty[(String, String, Long)]
      AzofChangeFeed.followOnce(spark, lake, "t", ckpt) { (feed, _, _) =>
        got = feed.select("key", "value", "_commit_version")
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          .sortBy(x => (x._3, x._1)).toSeq
      }
      got
    }

    // first poll: full history, orphan invisible
    assert(poll() == Seq(("1", "a1", 2L), ("2", "b1", 3L)))
    // nothing new -> fn not called, offset stays
    assert(poll() == Seq.empty)

    // crash mid-delivery: fn throws, offset must NOT advance
    AzofWriter.commitDelta(spark, lake, "t",
      df(("3", "2024-02-06T00:00:00Z", "c1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v4
    intercept[RuntimeException] {
      AzofChangeFeed.followOnce(spark, lake, "t", ckpt) { (_, _, _) =>
        throw new RuntimeException("consumer crash")
      }
    }
    // resume re-delivers the unacknowledged version
    assert(poll() == Seq(("3", "c1", 4L)))

    // lagging past retention fails loudly, not with a bare missing file
    val ckpt2 = Files.createTempDirectory("azof-cdf-ck2").toString
    AzofVacuum.vacuum(spark, lake, "t", keepLast = 1, minAgeMs = 0L)
    val err = intercept[IllegalStateException] {
      AzofChangeFeed.followOnce(spark, lake, "t", ckpt2) { (df, _, _) =>
        df.count(); ()
      }
    }
    assert(err.getMessage.contains("retention"))
    // ...and names the usable re-seed base: the retained floor, from
    // which a fresh consumer CAN bootstrap
    val floor = AzofChangeFeed.earliestFeedBase(spark, lake, "t")
    assert(err.getMessage.contains(floor.toString))
    val ckpt3 = Files.createTempDirectory("azof-cdf-ck3").toString
    var n = -1L
    // from the floor, the poll completes without error: with keepLast=1
    // the floor IS the current version, so there is nothing to deliver
    // yet — and the next commit flows normally
    val (ff, tf) = AzofChangeFeed.followOnce(spark, lake, "t", ckpt3,
      startVersion = floor) { (feed, _, _) => n = feed.count() }
    assert(ff > tf && n == -1L)
    AzofWriter.commitDelta(spark, lake, "t",
      df(("4", "2024-02-07T00:00:00Z", "d1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
    AzofChangeFeed.followOnce(spark, lake, "t", ckpt3) { (feed, _, _) =>
      n = feed.count()
    }
    assert(n == 1L)
  }

  test("followOnce property: random commit/poll/crash interleavings deliver every version exactly once") {
    // the consumer contract: across any interleaving of commits,
    // successful polls, and crashed polls (fn throws after observing
    // the batch), the ACKNOWLEDGED stream of _commit_versions is
    // gap-free and duplicate-free, and re-delivery after a crash covers
    // exactly the unacknowledged prefix plus new commits
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 104729L)
      val lake = Files.createTempDirectory(s"azof-cdf-prop$seed").toString
      val ckpt = Files.createTempDirectory(s"azof-cdf-propck$seed").toString
      AzofWriter.createTable(spark, lake, "t", schema,
        ts("2024-01-01T00:00:00Z"))
      AzofWriter.commitBase(spark, lake, "t",
        df(("0", "2024-01-02T00:00:00Z", "base")))
      var committed = 2L // versions with data so far (v2 = base)
      val acked = scala.collection.mutable.ArrayBuffer[Long]()
      for (step <- 0 until 12) {
        rnd.nextInt(3) match {
          case 0 => // commit
            AzofWriter.commitDelta(spark, lake, "t",
              df((s"k$step", "2024-02-05T00:00:00Z", s"v$step")),
              ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
            committed += 1
          case 1 => // successful poll
            AzofChangeFeed.followOnce(spark, lake, "t", ckpt) { (feed, _, _) =>
              acked ++= feed.select("_commit_version").collect()
                .map(_.getLong(0)).distinct.sorted
            }
          case 2 => // crashed poll: observed but not acknowledged
            scala.util.Try {
              AzofChangeFeed.followOnce(spark, lake, "t", ckpt) { (_, _, _) =>
                throw new RuntimeException("crash")
              }
            }
        }
      }
      // drain
      AzofChangeFeed.followOnce(spark, lake, "t", ckpt) { (feed, _, _) =>
        acked ++= feed.select("_commit_version").collect()
          .map(_.getLong(0)).distinct.sorted
      }
      assert(acked.toSeq == (2L to committed).toSeq,
        s"seed $seed: acked ${acked.toSeq}, committed 2..$committed")
    }
  }

  test("followOnce refuses ahead-of-table offsets and interrupted-offset residue") {
    val lake = Files.createTempDirectory("azof-cdf-guard").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1")))                       // v2

    // a typo'd base ahead of the table throws BEFORE polluting the
    // checkpoint — the dir stays usable with a correct base
    val ck1 = Files.createTempDirectory("azof-cdf-g1").toString
    val badBase = intercept[IllegalStateException] {
      AzofChangeFeed.followOnce(spark, lake, "t", ck1,
        startVersion = 100L) { (_, _, _) => () }
    }
    assert(badBase.getMessage.contains("ahead of"))
    assert(!Files.exists(Paths.get(ck1, "azof-commit-offset")))
    var n = 0L
    AzofChangeFeed.followOnce(spark, lake, "t", ck1) { (feed, _, _) =>
      n = feed.count()
    }
    assert(n == 1L)

    // a STORED offset ahead of the table (deleted-and-recreated table)
    // is a stale checkpoint, never a silently-waiting consumer
    val ck2 = Files.createTempDirectory("azof-cdf-g2").toString
    Files.writeString(Paths.get(ck2, "azof-commit-offset"), "100")
    val stale = intercept[IllegalStateException] {
      AzofChangeFeed.followOnce(spark, lake, "t", ck2) { (_, _, _) => () }
    }
    assert(stale.getMessage.contains("stale checkpoint"))

    // offset absent + _tmp_ptr_ staging residue = an interrupted offset
    // write, NOT a fresh checkpoint: seeding would silently replay
    val ck3 = Files.createTempDirectory("azof-cdf-g3").toString
    Files.writeString(Paths.get(ck3, "_tmp_ptr_dead"), "2")
    val residue = intercept[IllegalStateException] {
      AzofChangeFeed.followOnce(spark, lake, "t", ck3) { (_, _, _) => () }
    }
    assert(residue.getMessage.contains("staging residue"))
  }

  test("followOnce seeds an explicit startVersion on a no-new-commits poll") {
    val lake = Files.createTempDirectory("azof-cdf-seed").toString
    val ckpt = Files.createTempDirectory("azof-cdf-seedck").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1")))                       // v2

    // first poll with an explicit base AT the current version: nothing
    // to deliver, but the offset must be recorded
    val (f0, t0) = AzofChangeFeed.followOnce(spark, lake, "t", ckpt,
      startVersion = 2L) { (_, _, _) => fail("nothing to deliver") }
    assert(f0 > t0)

    // later commits, then a poll WITHOUT startVersion: must continue
    // from the seeded offset (only v3), not replay from the default base
    AzofWriter.commitDelta(spark, lake, "t",
      df(("2", "2024-02-05T00:00:00Z", "b1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    var got = Seq.empty[Long]
    AzofChangeFeed.followOnce(spark, lake, "t", ckpt) { (feed, _, _) =>
      got = feed.select("_commit_version").collect().map(_.getLong(0))
        .sorted.toSeq
    }
    assert(got == Seq(3L))
  }

  test("between parses each snapshot document exactly once on a long history") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.countfs.impl", classOf[CountingSnapshotFs].getName)
    spark.conf.set("spark.hadoop.fs.countfs.impl",
      classOf[CountingSnapshotFs].getName)
    val local = Files.createTempDirectory("azof-cdf-count").toString
    val lake = s"countfs:$local"
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1")))                       // v2
    (1 to 10).foreach { i =>                                         // v3..v12
      AzofWriter.commitDelta(spark, lake, "t",
        df((s"k$i", f"2024-02-${i}%02dT00:00:00Z", s"v$i")),
        ts(f"2024-02-${i}%02dT00:00:00Z"), ts(f"2024-02-${i + 1}%02dT00:00:00Z"))
    }

    CountingSnapshotFs.reset()
    val feed = AzofChangeFeed.between(spark, lake, "t", 1L, 12L)
    // construction (the snapshot walk) reads [1, 12] once each; the
    // pairwise shape read interior documents twice
    import scala.jdk.CollectionConverters._
    val constructionOpens = CountingSnapshotFs.opens.asScala.toMap
    assert(constructionOpens.keySet == (1 to 12).map(v => s"s$v.json").toSet)
    assert(constructionOpens.values.forall(_ == 1),
      s"documents parsed more than once at construction: $constructionOpens")
    assert(feed.count() == 11)
  }

  test("branchDiff previews exactly the staged rows — upserts and " +
    "tombstones — and matches what the publish then feeds to main") {
    val lake = Files.createTempDirectory("azof-bdiff").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1"),
        ("2", "2024-01-03T00:00:00Z", "b1")))                        // v2
    AzofWriter.createBranch(spark, lake, "t", "stage")               // fork 2
    // main diverges AFTER the fork: its rows must not enter the preview
    AzofWriter.commitDelta(spark, lake, "t",
      df(("9", "2024-01-04T00:00:00Z", "m1")),
      ts("2024-01-04T00:00:00Z"), ts("2024-01-05T00:00:00Z"))        // v3 main
    AzofWriter.commitDelta(spark, lake, "t",
      df(("1", "2024-02-05T00:00:00Z", "a2")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"),
      branch = Some("stage"))                                        // v4 branch
    val marks = df(("2", "2024-03-01T00:00:00Z", "ignored"))
      .withColumn("value",
        org.apache.spark.sql.functions.lit(null).cast("string"))
      .withColumn(TableSchema.DeletedName,
        org.apache.spark.sql.functions.lit(true))
    AzofWriter.commitDelta(spark, lake, "t", marks,
      ts("2024-03-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"),
      branch = Some("stage"))                                        // v5 branch

    val prev = AzofChangeFeed.branchDiff(spark, lake, "t", "stage")
      .select("key", "value", "_deleted", "_commit_version")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getBoolean(2),
        r.getLong(3))).sortBy(_._4).toSeq
    assert(prev == Seq(
      ("1", Some("a2"), false, 4L),
      ("2", None, true, 5L)),
      "preview = the staged files only: no base rows, no diverged-main " +
        "rows, tombstone flagged")

    // the reader-option face sees the same rows
    val viaReader = spark.read.format("azof")
      .option("table", "t").option("publishDiff", "stage")
      .load(lake)
      .select("key", "_deleted").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).sortBy(_._1).toSeq
    assert(viaReader == Seq(("1", false), ("2", true)))

    // publish (diverged → merge) and check the MAIN feed delivers the
    // previewed rows at the publish commit — preview ≡ publish feed
    // modulo the version tag (provenance vs landing)
    val pubV = AzofWriter.mergeBranch(spark, lake, "t", "stage")
    // feed base 3 = main's last pre-publish version (feed bounds must
    // be main versions; 4 and 5 are branch commits)
    val fed = AzofChangeFeed.between(spark, lake, "t", 3L, pubV)
      .select("key", "value", "_deleted").collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    assert(fed == prev.map(p => (p._1, p._2, p._3)).sortBy(_._1),
      "post-publish main feed ≡ the preview")

    // after the publish every staged file is on main: re-preview is empty
    assert(AzofChangeFeed.branchDiff(spark, lake, "t", "stage").count() == 0)

    // refusals: unknown branch, and a branch with no commits
    intercept[IllegalArgumentException] {
      AzofChangeFeed.branchDiff(spark, lake, "t", "nope")
    }
    AzofWriter.createBranch(spark, lake, "t", "empty")
    intercept[IllegalArgumentException] {
      AzofChangeFeed.branchDiff(spark, lake, "t", "empty")
    }
  }

  test("branchDiff of a FOLDED branch previews the folded tree — and " +
    "still matches what fast-forward then feeds to main") {
    val lake = Files.createTempDirectory("azof-bdiff-fold").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1")))                       // v2
    AzofWriter.createBranch(spark, lake, "t", "stage")               // fork 2
    (1 to 3).foreach { i =>
      AzofWriter.commitDelta(spark, lake, "t",
        df((s"k$i", f"2024-02-0${i}T00:00:00Z", s"v$i")),
        ts(f"2024-02-0${i}T00:00:00Z"), ts(f"2024-02-0${i + 1}T00:00:00Z"),
        branch = Some("stage"))                                      // v3..v5
    }
    // a staged tombstone AFTER the fold point: the fold must carry it
    // forward with its marker, and the preview must still flag it
    val marks = df(("k2", "2024-06-01T00:00:00Z", "x"))
      .withColumn("value",
        org.apache.spark.sql.functions.lit(null).cast("string"))
      .withColumn(TableSchema.DeletedName,
        org.apache.spark.sql.functions.lit(true))
    AzofWriter.commitDelta(spark, lake, "t", marks,
      ts("2024-06-01T00:00:00Z"), ts("2024-06-01T00:00:00Z"),
      branch = Some("stage"))                                        // v6
    AzofWriter.compact(spark, lake, "t", ts("2024-03-01T00:00:00Z"),
      branch = Some("stage"))                                        // v7

    val foldV = AzofTable(spark, lake, "t").branchHead("stage").get
    val prev = AzofChangeFeed.branchDiff(spark, lake, "t", "stage")
      .select("key", "value", "_deleted", "_commit_version").collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getBoolean(2),
        r.getLong(3))).sortBy(p => (p._4, p._1, p._3)).toSeq
    // the fold CLOSES the staged deltas into history and re-asserts the
    // merged state: the preview carries both — the staged rows at their
    // staging commits (v3..v6, fork-row '1' excluded: its file is on
    // main) plus the fold's rows at foldV (fork-inherited '1' included,
    // the Mar-1 state, and the carried-forward future tombstone with
    // its marker)
    assert(prev == Seq(
      ("k1", Some("v1"), false, 3L),
      ("k2", Some("v2"), false, 4L),
      ("k3", Some("v3"), false, 5L),
      ("k2", None, true, 6L),
      ("1", Some("a1"), false, foldV),
      ("k1", Some("v1"), false, foldV),
      ("k2", Some("v2"), false, foldV),
      ("k3", Some("v3"), false, foldV),
      ("k2", None, true, foldV)).sortBy(p => (p._4, p._1, p._3)))

    val pubV = AzofWriter.fastForward(spark, lake, "t", "stage")
    val fed = AzofChangeFeed.between(spark, lake, "t", 2L, pubV)
      .select("key", "value", "_deleted").collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getBoolean(2)))
      .sortBy(p => (p._1, p._3)).toSeq
    assert(fed == prev.map(p => (p._1, p._2, p._3)).sortBy(p => (p._1, p._3)),
      "post-publish main feed ≡ the folded preview")
  }
}
