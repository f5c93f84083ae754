package graft.sources

import graft.TestSpark
import graft.format._
import graft.operators.AzofScan
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.hadoop.fs.{FileSystem, FSDataOutputStream, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** A CommitGuard backed by an ATOMIC create-if-absent-WITH-CONTENT
  * primitive — `java.nio.file.Files.createLink` (POSIX `link(2)`): the
  * target either appears holding the staged document's full bytes or
  * the call fails because a competing snapshot exists, with no
  * exists-then-rename window and no claim-then-copy partial-content
  * window (the CommitGuard contract forbids the latter: a partial
  * target would read as crash debris to a concurrent committer). This
  * is the test stand-in for an object store's conditional primitive
  * (S3 `If-None-Match` PUT, GCS `ifGenerationMatch: 0`), which carries
  * the body with the claim in exactly the same way.
  */
class ConditionalCreateGuard extends CommitGuard {
  override def publish(fs: FileSystem, tmp: Path, target: Path): Boolean =
    try {
      java.nio.file.Files.createLink(
        java.nio.file.Paths.get(target.toUri.getPath),
        java.nio.file.Paths.get(tmp.toUri.getPath))
      ConditionalCreateGuard.publishes.incrementAndGet()
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }
}

object ConditionalCreateGuard {
  /** Observability hook: proves the guard (not the default rename path)
    * carried the commits in the racing spec.
    */
  val publishes = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** A guard that always fails with a store fault — pins the contract's
  * throw-don't-return-false rule end to end.
  */
class FaultingGuard extends CommitGuard {
  override def publish(fs: FileSystem, tmp: Path, target: Path): Boolean =
    throw new java.io.IOException("injected store fault")
}

/** The PRODUCTION conditional-put guard with an observability counter —
  * proves the guard (not the default rename path) carried the racing
  * commits on the simulated conditional store.
  */
class CountingCondPutGuard extends ConditionalPutGuard {
  override def publish(fs: FileSystem, tmp: Path, target: Path): Boolean = {
    CountingCondPutGuard.calls.incrementAndGet()
    super.publish(fs, tmp, target)
  }
}

object CountingCondPutGuard {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** A simstore variant whose conditional stream fails MID-WRITE once
  * when armed: half the document's bytes land in the staging buffer,
  * then the store faults before the commit-at-close — the torn-document
  * scenario. The wrapper stays [[org.apache.hadoop.fs.Abortable]] by
  * delegating to the inner conditional stream, so the guard's abort
  * path (not its close path) decides whether the partial bytes publish.
  */
class FlakyWriteSimStore extends SimStoreFileSystem {
  override def getScheme: String = "flakystore"
  override def getUri: java.net.URI = java.net.URI.create("flakystore:///")

  private def flaky(inner: FSDataOutputStream): FSDataOutputStream =
    new FSDataOutputStream(new java.io.FilterOutputStream(inner)
        with org.apache.hadoop.fs.Abortable {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        if (FlakyWriteSimStore.failNext.getAndSet(false)) {
          inner.write(b, off, math.max(1, len / 2)) // torn: half the doc buffers
          throw new java.io.IOException("injected mid-write store fault")
        } else inner.write(b, off, len)
      override def abort(): org.apache.hadoop.fs.Abortable.AbortableResult =
        inner.abort()
      override def close(): Unit = inner.close()
    }, null)

  override def create(
      f: Path, overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream = {
    val inner =
      super.create(f, overwrite, bufferSize, replication, blockSize, progress)
    if (overwrite) inner else flaky(inner)
  }

  override def create(
      f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val inner = super.create(f, permission, overwrite, bufferSize,
      replication, blockSize, progress)
    if (overwrite) inner else flaky(inner)
  }
}

object FlakyWriteSimStore {
  val failNext = new java.util.concurrent.atomic.AtomicBoolean(false)
}

/** Concurrent committers through the pluggable [[CommitGuard]]: on a
  * scheme with a conditional-put guard registered, racing writers must
  * ALL survive — each lost race re-reads and retries at the next id —
  * and the resulting history must be strictly serialized: one snapshot
  * per commit, each based on its predecessor, no update lost.
  */
class CommitGuardSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.sparkContext.hadoopConfiguration.set(
      "fs.testdfs.impl", classOf[TestDfsFileSystem].getName)
    s.conf.set("spark.hadoop.fs.testdfs.impl",
      classOf[TestDfsFileSystem].getName)
    s.conf.set("spark.azof.commitGuard.testdfs",
      classOf[ConditionalCreateGuard].getName)
    s.sparkContext.hadoopConfiguration.set(
      "fs.simstore.impl", classOf[SimStoreFileSystem].getName)
    s.conf.set("spark.hadoop.fs.simstore.impl",
      classOf[SimStoreFileSystem].getName)
    s.conf.set("spark.azof.commitGuard.simstore",
      classOf[CountingCondPutGuard].getName)
    s
  }

  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  private def ts(s: String) = Instant.parse(s)

  private def df(rows: (String, String, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, v) =>
        Row(k, Timestamp.from(ts(t)), v) }),
      schema.toStruct)

  test("racing writers all survive with serialized history on the guarded scheme") {
    val lake = "testdfs:" + Files.createTempDirectory("azof-guard").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("0", "2024-01-02T00:00:00Z", "base")))
    val baseVersion = AzofTable(spark, lake, "t").currentVersion.toLong
    val guardCallsBefore = ConditionalCreateGuard.publishes.get()

    // 4 writers race one commit each (commitMeta's bounded retry covers
    // up to maxRetries lost races per writer)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 4).map { i =>
      new Thread(() =>
        try {
          AzofWriter.commitDelta(spark, lake, "t",
            df((i.toString, s"2024-02-0${i}T00:00:00Z", s"v$i")),
            ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
        } catch { case e: Throwable => failures.add(e); () })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(failures.isEmpty,
      s"racing writer died: ${Option(failures.peek()).map(_.toString)}")

    // one more serial commit re-converges the (bounded, documented)
    // pointer race window before asserting on version.txt
    AzofWriter.commitDelta(spark, lake, "t",
      df(("9", "2024-02-09T00:00:00Z", "v9")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))

    val t = AzofTable(spark, lake, "t")
    // serialized history: exactly one snapshot per commit, all parseable
    assert(t.currentVersion.toLong == baseVersion + 5)
    (1L to 5L).foreach { d =>
      assert(SnapshotCodec.parse(
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
          new Path(lake, "t").toUri.getPath, s"s${baseVersion + d}.json")),
          "UTF-8")) != null)
    }
    // no lost update: the head snapshot carries every writer's delta...
    val deltas = t.currentSnapshot.segments.find(_.end.isEmpty).get.delta
    assert(deltas.size == 5, s"lost update: ${deltas.size} of 5 deltas survive")
    // ...and every row is visible
    val kv = AzofScan.scan(spark, lake, "t", AsOf.Current)
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    assert(kv == Seq("0" -> "base", "1" -> "v1", "2" -> "v2",
      "3" -> "v3", "4" -> "v4", "9" -> "v9"))
    // the guard, not the default rename path, carried the racing commits
    assert(ConditionalCreateGuard.publishes.get() - guardCallsBefore >= 5)
    // no staging residue from any lost race
    val stray = java.nio.file.Files.list(
        java.nio.file.Paths.get(new Path(lake, "t").toUri.getPath))
      .toArray.map(_.toString).filter(_.contains("_tmp_snap_"))
    assert(stray.isEmpty, s"staging residue: ${stray.mkString(",")}")
  }

  test("16 racing commits serialize with a raised retry budget") {
    // 8 writers x 2 sequential commits each: contention per id can
    // exceed the default 5-retry budget, which spark.azof.commitRetries
    // raises for high-fan-in deployments
    val lake = "testdfs:" + Files.createTempDirectory("azof-guard16").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("0", "2024-01-02T00:00:00Z", "base")))
    val baseVersion = AzofTable(spark, lake, "t").currentVersion.toLong
    spark.conf.set("spark.azof.commitRetries", "32")
    try {
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 8).map { i =>
        new Thread(() =>
          try (1 to 2).foreach { j =>
            AzofWriter.commitDelta(spark, lake, "t",
              df((s"$i-$j", s"2024-02-0${i % 9 + 1}T00:00:00Z", s"v$i-$j")),
              ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
          } catch { case e: Throwable => failures.add(e); () })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(240000))
      assert(failures.isEmpty,
        s"racing writer died: ${Option(failures.peek()).map(_.toString)}")
      // serial convergence commit, then: 16 + 1 commits, all deltas kept
      AzofWriter.commitDelta(spark, lake, "t",
        df(("z", "2024-02-09T00:00:00Z", "tail")),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
      val t = AzofTable(spark, lake, "t")
      assert(t.currentVersion.toLong == baseVersion + 17)
      val deltas = t.currentSnapshot.segments.find(_.end.isEmpty).get.delta
      assert(deltas.size == 17, s"lost update: ${deltas.size} of 17 deltas")
      assert(AzofScan.scan(spark, lake, "t", AsOf.Current).count() == 18)
    } finally spark.conf.unset("spark.azof.commitRetries")
  }

  test("a guard store fault propagates; a lost race is never misreported") {
    // contract: publish must THROW on store faults (never return false,
    // which means 'competing snapshot exists') — and the committer must
    // surface that fault, not retry it as a phantom conflict
    val lake = "testdfs:" + Files.createTempDirectory("azof-guardfault").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    spark.conf.set("spark.azof.commitGuard.testdfs",
      classOf[FaultingGuard].getName)
    try {
      val err = intercept[java.io.IOException] {
        AzofWriter.commitBase(spark, lake, "t",
          df(("1", "2024-01-02T00:00:00Z", "a1")))
      }
      assert(err.getMessage.contains("injected store fault"))
      // the failed commit left no snapshot and no staging residue
      val names = java.nio.file.Files.list(
          java.nio.file.Paths.get(new Path(lake, "t").toUri.getPath))
        .toArray.map(_.toString.split('/').last)
      assert(!names.exists(_.contains("_tmp_snap_")))
      assert(!names.contains("s2.json"))
    } finally spark.conf.set("spark.azof.commitGuard.testdfs",
      classOf[ConditionalCreateGuard].getName)
  }

  test("simstore rename is last-writer-wins: the default guard's refusal assumption does not hold") {
    // the scheme's single-file rename silently REPLACES an existing
    // target and returns true — so an exists-check + rename commit on
    // this store is check-then-act, and two same-instant committers
    // could both "succeed" with one snapshot clobbered. This is the
    // store shape the conditional-put guard exists for.
    val dir = Files.createTempDirectory("azof-simstore-rename").toString
    val fs = new Path(s"simstore:$dir")
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.isInstanceOf[SimStoreFileSystem])
    def put(name: String, content: String): Path = {
      val p = new Path(s"simstore:$dir/$name")
      val o = fs.create(p, true)
      try o.write(content.getBytes("UTF-8")) finally o.close()
      p
    }
    val incoming = put("incoming", "RACER")
    val committed = put("committed", "WINNER")
    assert(fs.rename(incoming, committed),
      "simstore rename must succeed onto an existing target")
    val in = fs.open(committed)
    val survived = try new String(in.readAllBytes(), "UTF-8")
    finally in.close()
    assert(survived == "RACER", "last writer wins: the earlier commit was clobbered")

    // create(overwrite = false) is the conditional primitive instead:
    // complete-content-or-refuse, checked at close
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
      val o = fs.create(committed, false)
      try o.write("LOSER".getBytes("UTF-8")) finally o.close()
    }
  }

  test("racing writers serialize through ConditionalPutGuard on the non-atomic-rename store") {
    // the round-5 gap: the only conditional-put guard was test-local.
    // This is the SHIPPED graft.sources.ConditionalPutGuard carrying a
    // full racing-commit workload on a scheme whose rename provably
    // gives no first-writer-wins (previous test) — commits may only
    // serialize through the store's conditional create.
    val lake = "simstore:" + Files.createTempDirectory("azof-condput").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("0", "2024-01-02T00:00:00Z", "base")))
    val baseVersion = AzofTable(spark, lake, "t").currentVersion.toLong
    val callsBefore = CountingCondPutGuard.calls.get()

    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 4).map { i =>
      new Thread(() =>
        try {
          AzofWriter.commitDelta(spark, lake, "t",
            df((i.toString, s"2024-02-0${i}T00:00:00Z", s"v$i")),
            ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
        } catch { case e: Throwable => failures.add(e); () })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(failures.isEmpty,
      s"racing writer died: ${Option(failures.peek()).map(_.toString)}")

    // serial convergence commit, then assert the serialized history
    AzofWriter.commitDelta(spark, lake, "t",
      df(("9", "2024-02-09T00:00:00Z", "v9")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
    val t = AzofTable(spark, lake, "t")
    assert(t.currentVersion.toLong == baseVersion + 5)
    val deltas = t.currentSnapshot.segments.find(_.end.isEmpty).get.delta
    assert(deltas.size == 5, s"lost update: ${deltas.size} of 5 deltas survive")
    val kv = AzofScan.scan(spark, lake, "t", AsOf.Current)
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    assert(kv == Seq("0" -> "base", "1" -> "v1", "2" -> "v2",
      "3" -> "v3", "4" -> "v4", "9" -> "v9"))
    // the production guard, not the rename path, carried the commits
    assert(CountingCondPutGuard.calls.get() - callsBefore >= 5)
    // no snapshot staging or conditional-put staging residue
    val names = java.nio.file.Files.list(
        java.nio.file.Paths.get(new Path(lake, "t").toUri.getPath))
      .toArray.map(_.toString.split('/').last)
    assert(!names.exists(_.contains("_tmp_snap_")),
      s"snapshot staging residue among: ${names.mkString(",")}")
    assert(!names.exists(_.startsWith(".simstore_put_")),
      s"conditional-put staging residue among: ${names.mkString(",")}")
  }

  test("a mid-write failure ABORTS: the version slot stays empty and the retry succeeds") {
    // the round-6 defect: the rescue path used to close() the stream,
    // and on a conditional-put store close IS the commit — a truncated
    // s{N}.json would occupy the slot while the caller saw a failure,
    // wedging every retry of that version behind its own torn debris.
    val dir = Files.createTempDirectory("azof-flaky").toString
    val conf = spark.sessionState.newHadoopConf()
    conf.set("fs.flakystore.impl", classOf[FlakyWriteSimStore].getName)
    val fs = new Path(s"flakystore:$dir").getFileSystem(conf)
    assert(fs.isInstanceOf[FlakyWriteSimStore])

    // stage the full snapshot document
    val tmp = new Path(s"flakystore:$dir/_tmp_snap_x")
    val body = """{"version":2,"doc":"the full snapshot body"}"""
    val o = fs.create(tmp, true)
    try o.write(body.getBytes("UTF-8")) finally o.close()
    val target = new Path(s"flakystore:$dir/s2.json")

    val guard = new ConditionalPutGuard
    FlakyWriteSimStore.failNext.set(true)
    val err = intercept[java.io.IOException] { guard.publish(fs, tmp, target) }
    assert(err.getMessage.contains("injected mid-write store fault"))

    // (a) the slot is EMPTY — the abort discarded the partial bytes
    assert(!fs.exists(target),
      "a torn snapshot document occupies the committed version slot")
    // ...and the conditional-put staging file was unlinked, not leaked
    val names = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .toArray.map(_.toString.split('/').last)
    assert(!names.exists(_.startsWith(".simstore_put_")),
      s"conditional-put staging residue among: ${names.mkString(",")}")

    // (b) a retry of the SAME version succeeds with the full content
    assert(guard.publish(fs, tmp, target),
      "retry after an aborted write must win the (uncontended) slot")
    val in = fs.open(target)
    val got = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    assert(got == body)
  }

  test("abort-then-close never commits; close-then-abort reports alreadyClosed") {
    // the Abortable contract on the simstore conditional stream itself
    val dir = Files.createTempDirectory("azof-abortable").toString
    val fs = new Path(s"simstore:$dir")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val p = new Path(s"simstore:$dir/obj")
    val out = fs.create(p, false)
    out.write("partial".getBytes("UTF-8"))
    val res = out.abort()
    assert(!res.alreadyClosed() && res.anyCleanupException() == null)
    out.close() // must be a no-op, not a commit of the partial bytes
    assert(!fs.exists(p), "close() after abort() must not publish")

    val out2 = fs.create(p, false)
    out2.write("full".getBytes("UTF-8"))
    out2.close()
    assert(out2.abort().alreadyClosed(), "abort after close is alreadyClosed")
    val in = fs.open(p)
    val got = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    assert(got == "full")
  }

  test("guard resolution is per-scheme; unguarded schemes keep the rename path") {
    // local (file) paths have no guard registered -> Rename default
    val lake = Files.createTempDirectory("azof-guard-local").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    val before = ConditionalCreateGuard.publishes.get()
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1")))
    assert(ConditionalCreateGuard.publishes.get() == before)
    // and first-writer-wins still holds on the default path
    val snap = AzofTable(spark, lake, "t").currentSnapshot
    intercept[java.io.IOException] {
      AzofWriter.writeSnapshot(spark, s"$lake/t", "2", snap)
    }
  }
}
