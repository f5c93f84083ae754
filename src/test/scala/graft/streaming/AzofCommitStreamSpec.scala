package graft.streaming

import graft.TestSpark
import graft.format._
import graft.sources.{AzofChangeFeed, AzofWriter}
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** The commit-exact streaming source: versions as offsets, stream ≡
  * batch change feed, orphans invisible, checkpointed resume without
  * re-delivery into the stream_batches-indexed sink.
  */
class AzofCommitStreamSpec extends AnyFunSuite {
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

  test("stream ≡ batch change feed; compaction rewrites and orphans invisible") {
    val lake = Files.createTempDirectory("azof-cstream").toString
    val ck = Files.createTempDirectory("azof-cstream-ck").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1"),
         ("2", "2024-01-03T00:00:00Z", "b1")))                       // v2
    AzofWriter.commitDelta(spark, lake, "t",
      df(("1", "2024-02-05T00:00:00Z", "a2")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    AzofWriter.compact(spark, lake, "t", ts("2024-03-01T00:00:00Z")) // v4
    AzofWriter.commitDelta(spark, lake, "t",
      df(("3", "2024-03-05T00:00:00Z", "c1")),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))        // v5
    // a crashed writer's ORPHAN: well-named data file, never committed —
    // AzofStream.appends would surface it; this source must not
    Files.write(java.nio.file.Paths.get(lake, "t",
      "delta_s9_deadbeef.parquet"), Array[Byte](1, 2, 3))

    val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, Long)]()
    val q = spark.readStream.format("azof-commits")
      .option("table", "t").load(lake)
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        b.select("key", "value", "_commit_version").collect()
          .foreach(r => got.add((r.getString(0), r.getString(1), r.getLong(2))))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = got.toArray(Array.empty[(String, String, Long)])
      .sortBy(t => (t._3, t._1)).toSeq
    val batch = AzofChangeFeed.since(spark, lake, "t", 1L)
      .select("key", "value", "_commit_version").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1)).toSeq
    assert(streamed == batch, "stream must equal the batch change feed")
    assert(streamed == Seq(("1", "a1", 2L), ("2", "b1", 2L),
      ("1", "a2", 3L), ("3", "c1", 5L)),
      "compaction (v4) contributes nothing; the orphan never appears")
  }

  test("checkpointed resume continues at the committed version — no re-delivery through AzofSink") {
    val lake = Files.createTempDirectory("azof-cstream-src").toString
    val outLake = Files.createTempDirectory("azof-cstream-dst").toString
    val ck = Files.createTempDirectory("azof-cstream-ck2").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, outLake, "mirror", schema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1")))                       // v2
    AzofWriter.commitDelta(spark, lake, "t",
      df(("2", "2024-02-05T00:00:00Z", "b1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3

    // run 1: deliver (1, 3] table-to-table through the replay-indexed sink
    def runOnce(): Unit = {
      val q = AzofSink.append(
        spark.readStream.format("azof-commits")
          .option("table", "t").load(lake)
          .drop("_commit_version"),
        outLake, "mirror", ck)
      q.awaitTermination(120000)
      ()
    }
    runOnce()
    val after1 = graft.operators.AzofScan
      .scan(spark, outLake, "mirror", AsOf.Current).count()
    assert(after1 == 2, s"first run must mirror both rows, got $after1")

    // run 2 on the SAME checkpoint with nothing new: no re-delivery —
    // the mirror's version must not move
    val vBefore = AzofTable(spark, outLake, "mirror").currentVersion
    runOnce()
    assert(AzofTable(spark, outLake, "mirror").currentVersion == vBefore,
      "an idle resume must not commit anything to the mirror")

    // new source commits, then run 3 resumes at the checkpointed version:
    // ONLY the new rows land; earlier rows are not re-delivered
    AzofWriter.commitDelta(spark, lake, "t",
      df(("3", "2024-03-05T00:00:00Z", "c1")),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))        // v4
    runOnce()
    val mirrored = graft.operators.AzofScan
      .scan(spark, outLake, "mirror", AsOf.Current)
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    assert(mirrored == Seq("1" -> "a1", "2" -> "b1", "3" -> "c1"))
    // exactly once per row across all three runs: the mirror's change
    // feed (raw committed rows, no dedup) carries no duplicates
    val allRows = AzofChangeFeed.since(spark, outLake, "mirror", 1L)
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(allRows.sorted == allRows.distinct.sorted,
      s"re-delivered rows reached the mirror: $allRows")
  }

  test("maxVersionsPerBatch: a long catch-up drains in bounded checkpointed steps") {
    val lake = Files.createTempDirectory("azof-cstream-mv").toString
    val ck = Files.createTempDirectory("azof-cstream-mv-ck").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("0", "2024-01-02T00:00:00Z", "v0")))                       // v2
    (1 to 6).foreach { i =>                                          // v3..v8
      AzofWriter.commitDelta(spark, lake, "t",
        df((s"k$i", f"2024-02-${i}%02dT00:00:00Z", s"v$i")),
        ts(f"2024-02-${i}%02dT00:00:00Z"), ts(f"2024-02-${i + 1}%02dT00:00:00Z"))
    }

    // 7 pending commits, 3 versions per batch -> AvailableNow drains in
    // 3 batches (3 + 3 + 1), each covering a disjoint version range
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Long])]()
    val q = spark.readStream.format("azof-commits")
      .option("table", "t").option("maxVersionsPerBatch", "3").load(lake)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], id: Long) =>
        batches.add((id, b.select("_commit_version").collect()
          .map(_.getLong(0)).sorted.toSeq))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = batches.toArray(Array.empty[(Long, Seq[Long])]).sortBy(_._1).toSeq
    assert(got.map(_._2) == Seq(
      Seq(2L, 3L, 4L), Seq(5L, 6L, 7L), Seq(8L)),
      s"catch-up must slice (1, 8] into (1,4], (4,7], (7,8]; got $got")
  }

  test("a stale checkpoint (offset ahead of a recreated table) fails loudly, never idles") {
    val lakeDir = Files.createTempDirectory("azof-cstream-stale")
    val lake = lakeDir.toString
    val ck = Files.createTempDirectory("azof-cstream-stale-ck").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    (1 to 4).foreach { i =>                                          // v2..v5
      AzofWriter.commitDelta(spark, lake, "t",
        df((s"k$i", f"2024-02-${i}%02dT00:00:00Z", s"v$i")),
        ts(f"2024-02-${i}%02dT00:00:00Z"), ts(f"2024-02-${i + 1}%02dT00:00:00Z"))
    }
    def run(): Unit = {
      val q = spark.readStream.format("azof-commits")
        .option("table", "t").load(lake)
        .writeStream.option("checkpointLocation", ck)
        .foreachBatch { (_: org.apache.spark.sql.Dataset[Row], _: Long) => () }
        .start()
      try { q.processAllAvailable(); q.awaitTermination(60000); () }
      finally q.stop()
    }
    run() // checkpoint now holds offset 5

    // the table is deleted and recreated: current version regresses to 1
    import scala.reflect.io.Directory
    new Directory(new java.io.File(lake, "t")).deleteRecursively()
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))

    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run()
    }
    def messages(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    // two loud paths, depending on how far the WAL got before the stop:
    // an uncommitted planned batch reconstructs through getBatch and
    // hits the retention error; a fully-committed WAL reaches
    // latestOffset's stale-checkpoint guard. Both name the remedy
    // (fresh checkpoint); neither may idle silently.
    assert(messages(err).exists(m =>
      m.contains("stale checkpoint") || m.contains("fresh checkpoint")),
      s"expected a loud stale/retention error, got: ${messages(err)}")
  }

  test("startVersion bounds the first batch; lagging past retention fails loudly") {
    val lake = Files.createTempDirectory("azof-cstream-sv").toString
    val ck = Files.createTempDirectory("azof-cstream-sv-ck").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1")))                       // v2
    AzofWriter.commitDelta(spark, lake, "t",
      df(("2", "2024-02-05T00:00:00Z", "b1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3

    val got = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val q = spark.readStream.format("azof-commits")
      .option("table", "t").option("startVersion", "2").load(lake)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        b.select("_commit_version").collect().foreach(r => got.add(r.getLong(0)))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(got.toArray(Array.empty[java.lang.Long]).map(_.longValue).toSeq == Seq(3L),
      "startVersion=2 must deliver only (2, current]")

    // a source whose range was vacuumed away fails with the retained
    // floor, not a bare missing-file read
    val t = AzofTable(spark, lake, "t")
    java.nio.file.Files.delete(java.nio.file.Paths.get(
      t.tableDir.toUri.getPath, "s2.json"))
    val ck2 = Files.createTempDirectory("azof-cstream-sv-ck3").toString
    val q2 = spark.readStream.format("azof-commits")
      .option("table", "t").option("startVersion", "1").load(lake)
      .writeStream.option("checkpointLocation", ck2)
      .foreachBatch { (_: org.apache.spark.sql.Dataset[Row], _: Long) => () }
      .start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
      q2.awaitTermination(60000)
      ()
    }
    q2.stop()
    def messages(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(err).exists(_.contains("retention")),
      s"expected a retention error, got: ${messages(err)}")
  }

  test("startVersion=earliest auto-seeds a fresh consumer of a vacuumed table") {
    val lake = Files.createTempDirectory("azof-cstream-early").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1")))                       // v2
    AzofWriter.commitDelta(spark, lake, "t",
      df(("2", "2024-02-05T00:00:00Z", "b1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    AzofWriter.commitDelta(spark, lake, "t",
      df(("3", "2024-02-10T00:00:00Z", "c1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v4
    // vacuum drops s1/s2: the retained floor is 3, so default
    // startVersion=1 would fail loudly (previous test's shape) — the
    // `earliest` sentinel must seed at the floor with NO manual probe
    graft.sources.AzofVacuum.vacuum(spark, lake, "t", keepLast = 2,
      minAgeMs = 0)
    assert(graft.sources.AzofChangeFeed
      .earliestFeedBase(spark, lake, "t") == 3L)

    val got = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val ck = Files.createTempDirectory("azof-cstream-early-ck").toString
    val q = spark.readStream.format("azof-commits")
      .option("table", "t").option("startVersion", "earliest").load(lake)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        b.select("_commit_version").collect().foreach(r => got.add(r.getLong(0)))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(got.toArray(Array.empty[java.lang.Long]).map(_.longValue).toSeq
      == Seq(4L),
      "earliest must deliver exactly (retained floor, current] = (3, 4]")

    // a non-numeric startVersion that names no tag is still rejected at
    // LOAD time (it now resolves through the ref index, and 'latest'
    // names nothing here — the error must not wait for stream start)
    intercept[IllegalArgumentException] {
      spark.readStream.format("azof-commits")
        .option("table", "t").option("startVersion", "latest").load(lake)
    }
  }

  test("startVersion resolves a named version tag like the batch feed bounds") {
    val lake = Files.createTempDirectory("azof-cstream-tag").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1")))                       // v2
    AzofWriter.tagVersion(spark, lake, "t", "seeded", Some(2L))      // v3
    AzofWriter.commitDelta(spark, lake, "t",
      df(("2", "2024-02-05T00:00:00Z", "b1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v4

    val got = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val ck = Files.createTempDirectory("azof-cstream-tag-ck").toString
    val q = spark.readStream.format("azof-commits")
      .option("table", "t").option("startVersion", "seeded").load(lake)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        b.select("_commit_version").collect().foreach(r => got.add(r.getLong(0)))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // (2, current]: the tag commit itself (v3) adds no rows, the delta
    // (v4) does
    assert(got.toArray(Array.empty[java.lang.Long]).map(_.longValue).toSeq
      == Seq(4L),
      "startVersion=<tag> must deliver exactly (tagged version, current]")
  }

  test("branch option tails the STAGED lineage: main commits invisible, " +
    "branch folds skipped, resume picks up new staged commits") {
    val lake = Files.createTempDirectory("azof-cstream-br").toString
    val ck = Files.createTempDirectory("azof-cstream-br-ck").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1")))                       // v2
    AzofWriter.createBranch(spark, lake, "t", "stage")               // fork 2
    // main diverges: must NOT enter the branch tail
    AzofWriter.commitDelta(spark, lake, "t",
      df(("9", "2024-01-04T00:00:00Z", "m1")),
      ts("2024-01-04T00:00:00Z"), ts("2024-01-05T00:00:00Z"))        // v3 main
    AzofWriter.commitDelta(spark, lake, "t",
      df(("k1", "2024-02-01T00:00:00Z", "v1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-02-02T00:00:00Z"),
      branch = Some("stage"))                                        // v4 br
    AzofWriter.commitDelta(spark, lake, "t",
      df(("k2", "2024-02-02T00:00:00Z", "v2")),
      ts("2024-02-02T00:00:00Z"), ts("2024-02-03T00:00:00Z"),
      branch = Some("stage"))                                        // v5 br
    AzofWriter.compact(spark, lake, "t", ts("2024-03-01T00:00:00Z"),
      branch = Some("stage"))                                        // v6 fold

    val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    def drain(): Unit = {
      val q = spark.readStream.format("azof-commits")
        .option("table", "t").option("branch", "stage").load(lake)
        .writeStream
        .option("checkpointLocation", ck)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
          b.select("key", "_commit_version").collect()
            .foreach(r => got.add((r.getString(0), r.getLong(1))))
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try assert(q.awaitTermination(120000)) finally q.stop()
    }
    drain()
    assert(got.toArray(Array.empty[(String, Long)]).toSeq.sortBy(_._2) ==
      Seq("k1" -> 4L, "k2" -> 5L),
      "staged commits only: no main rows, the fold delivers nothing")

    // a new staged commit resumes from the checkpointed branch offset
    got.clear()
    AzofWriter.commitDelta(spark, lake, "t",
      df(("k3", "2024-04-01T00:00:00Z", "v3")),
      ts("2024-04-01T00:00:00Z"), ts("2024-04-02T00:00:00Z"),
      branch = Some("stage"))                                        // v7 br
    drain()
    assert(got.toArray(Array.empty[(String, Long)]).toSeq ==
      Seq("k3" -> 7L), "resume delivers only the new staged commit")

    // the branch stream ≡ the batch branch feed over the same range
    val batch = AzofChangeFeed.branchBetween(spark, lake, "t", "stage", 1L, 7L)
      .select("key", "_commit_version").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2).toSeq
    assert(batch == Seq("k1" -> 4L, "k2" -> 5L, "k3" -> 7L))
  }

  test("MAIN stream with capped batches on a table with branch activity " +
    "drains without wedging (a capped offset in the shared id space can " +
    "name a BRANCH document; the feed rebases it to its main predecessor)") {
    val lake = Files.createTempDirectory("azof-cstream-mcap").toString
    val ck = Files.createTempDirectory("azof-cstream-mcap-ck").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1")))                       // v2
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    def drain(): Unit = {
      val q = spark.readStream.format("azof-commits")
        .option("table", "t").option("maxVersionsPerBatch", "1").load(lake)
        .writeStream
        .option("checkpointLocation", ck)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
          b.select("key", "_commit_version").collect()
            .foreach(r => got.add((r.getString(0), r.getLong(1))))
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try assert(q.awaitTermination(120000)) finally q.stop()
    }
    drain()                                        // checkpoint offset = 2
    assert(got.toArray(Array.empty[(String, Long)]).toSeq ==
      Seq("1" -> 2L))

    // branch commits interleave in the SHARED id space; the resumed
    // capped stream's offsets land ON the branch documents (3, 4, 6) —
    // the wedge case this spec pins away. Main evolves post-fork too,
    // so the capped end-schema read must also resolve through the main
    // predecessor (a branch doc's fork-era schema is narrower).
    AzofWriter.createBranch(spark, lake, "t", "stage")               // fork 2
    AzofWriter.commitDelta(spark, lake, "t",
      df(("b1", "2024-02-01T00:00:00Z", "s1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-02-01T00:00:00Z"),
      branch = Some("stage"))                                        // v3 br
    AzofWriter.commitDelta(spark, lake, "t",
      df(("b2", "2024-02-02T00:00:00Z", "s2")),
      ts("2024-02-02T00:00:00Z"), ts("2024-02-02T00:00:00Z"),
      branch = Some("stage"))                                        // v4 br
    AzofWriter.addColumn(spark, lake, "t",
      ColumnDef("extra", ColumnType.AzString, nullable = true))      // v5 main
    AzofWriter.commitDelta(spark, lake, "t",
      df(("b3", "2024-02-03T00:00:00Z", "s3")),
      ts("2024-02-03T00:00:00Z"), ts("2024-02-03T00:00:00Z"),
      branch = Some("stage"))                                        // v6 br
    AzofWriter.commitDelta(spark, lake, "t",
      df(("m2", "2024-02-04T00:00:00Z", "x2"))
        .withColumn("extra", org.apache.spark.sql.functions.lit("e2")),
      ts("2024-02-04T00:00:00Z"), ts("2024-02-04T00:00:00Z"))        // v7 main
    got.clear()
    drain()
    // only the MAIN commit's rows deliver, tagged with its version;
    // branch rows never enter the main feed
    assert(got.toArray(Array.empty[(String, Long)]).toSeq ==
      Seq("m2" -> 7L),
      "capped resume over interleaved branch commits delivers exactly " +
        "the main rows, once — no wedge, no branch leakage")

    // the batch feed tolerates a branch-document base the same way
    // (the shape an already-checkpointed capped offset replays)
    val rebased = AzofChangeFeed.between(spark, lake, "t", 4L, 7L)
      .select("key", "_commit_version").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(rebased == Seq("m2" -> 7L))
  }

  test("capped branch stream over an EVOLVING branch drains cleanly: " +
    "pre-evolution commits read null in the added column, post-" +
    "evolution rows carry it, interleaved main commits never wedge") {
    val lake = Files.createTempDirectory("azof-cstream-brev").toString
    val ck = Files.createTempDirectory("azof-cstream-brev-ck").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1")))                       // v2
    AzofWriter.createBranch(spark, lake, "t", "stage")               // fork 2
    AzofWriter.commitDelta(spark, lake, "t",
      df(("k1", "2024-02-01T00:00:00Z", "v1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-02-01T00:00:00Z"),
      branch = Some("stage"))                                        // v3 br
    AzofWriter.commitDelta(spark, lake, "t",
      df(("m1", "2024-02-02T00:00:00Z", "x1")),
      ts("2024-02-02T00:00:00Z"), ts("2024-02-02T00:00:00Z"))        // v4 main
    // the BRANCH evolves additively mid-history
    AzofWriter.addColumn(spark, lake, "t",
      ColumnDef("extra", ColumnType.AzString, nullable = true),
      branch = Some("stage"))                                        // v5 br
    AzofWriter.commitDelta(spark, lake, "t",
      df(("k2", "2024-02-03T00:00:00Z", "v2"))
        .withColumn("extra", org.apache.spark.sql.functions.lit("e2")),
      ts("2024-02-03T00:00:00Z"), ts("2024-02-03T00:00:00Z"),
      branch = Some("stage"))                                        // v6 br
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, Option[String])]()
    val q = spark.readStream.format("azof-commits")
      .option("table", "t").option("branch", "stage")
      .option("maxVersionsPerBatch", "1").load(lake)
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        b.select("key", "extra").collect()
          .foreach(r => got.add((r.getString(0), Option(r.getString(1)))))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000)) finally q.stop()
    assert(got.toArray(Array.empty[(String, Option[String])]).sortBy(_._1)
      .toSeq == Seq("k1" -> None, "k2" -> Some("e2")),
      "pre-evolution staged rows widen with nulls; evolved rows carry " +
        "the column; capped offsets on the main/evolution docs never wedge")
  }

  test("branch stream with a capped batch spanning a post-fork MAIN " +
    "schema evolution drains cleanly (ids are shared; the cap can name " +
    "a main doc, whose wider schema must not wedge the branch stream)") {
    val lake = Files.createTempDirectory("azof-cstream-brse").toString
    val ck = Files.createTempDirectory("azof-cstream-brse-ck").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1")))                       // v2
    AzofWriter.createBranch(spark, lake, "t", "stage")               // fork 2
    // main evolves AFTER the fork: v3 is a main doc with a WIDER schema
    AzofWriter.addColumn(spark, lake, "t",
      ColumnDef("extra", ColumnType.AzString, nullable = true))      // v3 main
    (1 to 3).foreach { i =>
      AzofWriter.commitDelta(spark, lake, "t",
        df((s"k$i", f"2024-02-0${i}T00:00:00Z", s"v$i")),
        ts(f"2024-02-0${i}T00:00:00Z"), ts(f"2024-02-0${i}T00:00:00Z"),
        branch = Some("stage"))                                      // v4..v6
    }
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // maxVersionsPerBatch=1 makes the first capped offset land ON v3
    // (the main evolution doc) — the wedge case this spec pins away
    val q = spark.readStream.format("azof-commits")
      .option("table", "t").option("branch", "stage")
      .option("maxVersionsPerBatch", "1").load(lake)
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        b.select("key").collect().foreach(r => got.add(r.getString(0)))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000)) finally q.stop()
    assert(got.toArray(Array.empty[String]).sorted.toSeq ==
      Seq("k1", "k2", "k3"),
      "every staged commit drains; the main evolution never wedges")
  }
}
