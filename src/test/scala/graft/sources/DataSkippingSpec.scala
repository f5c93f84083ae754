package graft.sources

import graft.TestSpark
import graft.format._
import graft.operators.AzofScan
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** File-level key statistics + data skipping: the writer stamps each data
  * file's key range into the snapshot (`stats` / `file_stats` ext fields,
  * same reference-ignored-extra-field pattern as `op`), and the scan
  * prunes files whose range cannot match a key predicate — so a point
  * lookup on a key-partitioned layout reads one file, not every
  * time-pruned file. Exactness never depends on the stats: the scan
  * always applies the residual key predicate, and files without stats
  * are conservatively kept.
  */
class DataSkippingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  private def df(rows: Seq[(String, String, String)]) = {
    val data = rows.map { case (k, t, v) =>
      Row(k, Timestamp.from(Instant.parse(t)), v)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data), schema.toStruct)
  }

  private def ts(s: String) = Instant.parse(s)

  /** base: keys a..d; delta1: keys e..h; delta2: keys p..t. */
  private def buildKeyPartitioned(): String = {
    val lake = Files.createTempDirectory("azof-skip").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t", df(Seq(
      ("a", "2024-01-01T00:00:00Z", "a1"),
      ("b", "2024-01-02T00:00:00Z", "b1"),
      ("d", "2024-01-03T00:00:00Z", "d1"))))
    AzofWriter.commitDelta(spark, lake, "t", df(Seq(
      ("e", "2024-02-01T00:00:00Z", "e1"),
      ("h", "2024-02-02T00:00:00Z", "h1"))),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
    AzofWriter.commitDelta(spark, lake, "t", df(Seq(
      ("p", "2024-03-01T00:00:00Z", "p1"),
      ("t", "2024-03-02T00:00:00Z", "t1"))),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))
    lake
  }

  test("writer stamps key-range stats; snapshot JSON round-trips them") {
    val lake = buildKeyPartitioned()
    val snap = AzofTable(spark, lake, "t").currentSnapshot
    val seg = snap.segments.head
    // key ranges as before; value-column ranges ride along (round 10)
    assert(seg.fileStats.map(s => (s.keyMin, s.keyMax)).contains(("a", "d")))
    assert(seg.delta.map(_.stats.map(s => (s.keyMin, s.keyMax))) ==
      Seq(Some(("e", "h")), Some(("p", "t"))))
    assert(seg.fileStats.get.cols.contains("value"))
    assert(SnapshotCodec.parse(SnapshotCodec.render(snap)) == snap)
    // the raw JSON carries the ext fields in snake_case
    val json = SnapshotCodec.render(snap)
    assert(json.contains("\"file_stats\"") && json.contains("\"key_min\""))
  }

  test("stats-less / foreign-shaped stats parse as None (never a failure)") {
    val snap = SnapshotCodec.parse(
      """{"schema":{"columns":[]},"segments":[
        {"id":"1","start":"2024-01-01T00:00:00.000Z","file":"b.parquet",
         "delta":[
          {"file":"d1.parquet","start":"2024-02-01T00:00:00.000Z",
           "end":"2024-03-01T00:00:00.000Z"},
          {"file":"d2.parquet","start":"2024-03-01T00:00:00.000Z",
           "end":"2024-04-01T00:00:00.000Z","stats":{"rows":5}}]}]}""")
    assert(snap.segments.head.fileStats.isEmpty)
    assert(snap.segments.head.delta.forall(_.stats.isEmpty))
    // no stats -> nothing skippable, everything kept
    assert(AzofScan.prunedFiles(snap, AsOf.Current,
      Some(KeyFilter.Keys(Set("zzz")))).size == 3)

    // corrupt/truncated blooms degrade at PARSE time (range stats kept,
    // filter dropped) — never a lazy crash inside a scan's membership test
    val corrupt = SnapshotCodec.parse(
      """{"schema":{"columns":[]},"segments":[
        {"id":"1","start":"2024-01-01T00:00:00.000Z","file":"b.parquet",
         "file_stats":{"key_min":"a","key_max":"z",
           "key_bloom":{"bits":1024,"k":4,"b64":"AAAA"}}}]}""")
    val st = corrupt.segments.head.fileStats
    assert(st.exists(_.bloom.isEmpty) && st.exists(_.keyMin == "a"))
    assert(SnapshotCodec.parse(
      """{"schema":{"columns":[]},"segments":[
        {"id":"1","start":"2024-01-01T00:00:00.000Z","file":"b.parquet",
         "file_stats":{"key_min":"a","key_max":"z",
           "key_bloom":{"bits":1024,"k":4,"b64":"!!not-base64!!"}}}]}""")
      .segments.head.fileStats.exists(_.bloom.isEmpty))
  }

  test("point lookup prunes to the one file whose range covers the key") {
    val lake = buildKeyPartitioned()
    val snap = AzofTable(spark, lake, "t").currentSnapshot
    val all = AzofScan.prunedFiles(snap, AsOf.Current)
    assert(all.size == 3)

    val onlyBase = AzofScan.prunedFiles(snap, AsOf.Current,
      Some(KeyFilter.Keys(Set("b"))))
    assert(onlyBase.size == 1 && onlyBase.head.startsWith("base_"))

    val onlyD2 = AzofScan.prunedFiles(snap, AsOf.Current,
      Some(KeyFilter.Keys(Set("q"))))
    assert(onlyD2.size == 1 && onlyD2.head.startsWith("delta_s4"))

    // key between ranges ("j" in the d..e gap? no: between h and p):
    // nothing can contain it
    assert(AzofScan.prunedFiles(snap, AsOf.Current,
      Some(KeyFilter.Keys(Set("j")))).isEmpty)

    // range [e, h] hits only delta1; range [c, f] spans base + delta1
    assert(AzofScan.prunedFiles(snap, AsOf.Current,
      Some(KeyFilter.Range(Some("e"), Some("h")))).size == 1)
    assert(AzofScan.prunedFiles(snap, AsOf.Current,
      Some(KeyFilter.Range(Some("c"), Some("f")))).size == 2)

    // conjunction intersects: [a, z] AND key in {p} -> one file
    assert(AzofScan.prunedFiles(snap, AsOf.Current,
      Some(KeyFilter.AllOf(Seq(
        KeyFilter.Range(Some("a"), Some("z")),
        KeyFilter.Keys(Set("p")))))).size == 1)
  }

  test("analyze backfills stats for stat-less files: pruning returns, " +
    "scan results unchanged, re-run is a no-op") {
    val lake = buildKeyPartitioned()
    val t = AzofTable(spark, lake, "t")
    // simulate a pre-stats / foreign writer: republish the current
    // snapshot with every stats field stripped (metadata-only, the
    // data files are untouched)
    def strip(s: Segment): Segment = s.copy(
      fileStats = None,
      delta = s.delta.map(_.copy(stats = None)),
      segments = s.segments.map(strip))
    val bare = t.currentSnapshot
      .copy(segments = t.currentSnapshot.segments.map(strip))
    val nextV = t.currentVersion.toLong + 1
    AzofWriter.writeSnapshot(spark, t.tableDir.toString, nextV.toString, bare)
    AzofWriter.writeVersion(spark, t.tableDir.toString, nextV.toString)
    val before = AzofScan.scan(spark, lake, "t").collect()
      .map(r => (r.getString(0), r.getString(2))).sorted.toSeq

    // stat-less: a point lookup prunes NOTHING
    val snapBare = AzofTable(spark, lake, "t").currentSnapshot
    assert(AzofScan.prunedFiles(snapBare, AsOf.Current,
      Some(KeyFilter.Keys(Set("q")))).size == 3)

    val r = AzofWriter.analyzeTable(spark, lake, "t")
    assert(r.analyzed.size == 3 && r.skipped.isEmpty &&
      r.version.contains(nextV + 1), s"$r")
    val snapAfter = AzofTable(spark, lake, "t").currentSnapshot
    // pruning is back: point lookup reads one file again
    assert(AzofScan.prunedFiles(snapAfter, AsOf.Current,
      Some(KeyFilter.Keys(Set("q")))).size == 1)
    // value ranges restamped too (the round-10 generation)
    assert(snapAfter.segments.head.fileStats.get.cols.contains("value"))
    assert(snapAfter.segments.head.delta.forall(_.stats.get.cols.nonEmpty))
    // results identical, no data file touched
    val after = AzofScan.scan(spark, lake, "t").collect()
      .map(r => (r.getString(0), r.getString(2))).sorted.toSeq
    assert(after == before)
    assert(snapAfter.allFiles == snapBare.allFiles)

    // idempotent: everything is stamped now, so no commit
    val again = AzofWriter.analyzeTable(spark, lake, "t")
    assert(again.version.isEmpty && again.analyzed.isEmpty)
    assert(AzofTable(spark, lake, "t").currentVersion.toLong == nextV + 1)
  }

  test("analyze upgrades key-only stats with value ranges (pre-value-" +
    "stats generation)") {
    val lake = buildKeyPartitioned()
    val t = AzofTable(spark, lake, "t")
    // strip ONLY the value ranges, keeping key ranges — the rt-v2 shape
    def strip(s: Segment): Segment = s.copy(
      fileStats = s.fileStats.map(_.copy(cols = Map.empty)),
      delta = s.delta.map(d =>
        d.copy(stats = d.stats.map(_.copy(cols = Map.empty)))),
      segments = s.segments.map(strip))
    val keyOnly = t.currentSnapshot
      .copy(segments = t.currentSnapshot.segments.map(strip))
    val nextV = t.currentVersion.toLong + 1
    AzofWriter.writeSnapshot(spark, t.tableDir.toString, nextV.toString,
      keyOnly)
    AzofWriter.writeVersion(spark, t.tableDir.toString, nextV.toString)

    val r = AzofWriter.analyzeTable(spark, lake, "t")
    assert(r.analyzed.size == 3, s"$r")
    val snapAfter = AzofTable(spark, lake, "t").currentSnapshot
    assert(snapAfter.segments.head.fileStats.get.cols.contains("value"))
    // key ranges unchanged by the upgrade
    assert(snapAfter.segments.head.fileStats.map(s => (s.keyMin, s.keyMax))
      .contains(("a", "d")))
  }

  test("skipped scan ≡ unskipped scan + filter; all-skipped is empty with schema") {
    val lake = buildKeyPartitioned()
    def rows(kf: Option[KeyFilter]) =
      AzofScan.scan(spark, lake, "t", AsOf.Current, keyFilter = kf)
        .select("key", "value").collect()
        .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq

    val brute = AzofScan.scan(spark, lake, "t")
      .where(col("key").isin("b", "p", "j"))
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    assert(rows(Some(KeyFilter.Keys(Set("b", "p", "j")))) == brute)
    assert(brute == Seq("b" -> "b1", "p" -> "p1"))

    val empty = AzofScan.scan(spark, lake, "t", AsOf.Current,
      keyFilter = Some(KeyFilter.Keys(Set("j"))))
    assert(empty.columns.toSeq == Seq("key", "event_time", "value"))
    assert(empty.count() == 0)
  }

  test("key filter composes with a projection that drops the key column") {
    // the residual key predicate applies BEFORE the output projection,
    // so looking up by key while selecting only value columns works
    val lake = buildKeyPartitioned()
    val got = graft.operators.AzofScan.scan(spark, lake, "t", AsOf.Current,
        projection = Some(Set("value")),
        keyFilter = Some(KeyFilter.Keys(Set("e"))))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("e1"))
  }

  test("residual filter keeps results exact when stats are conservative") {
    // two deltas with OVERLAPPING key ranges updating the same key: the
    // winner must come from the newest event_time regardless of which
    // files survive pruning
    val lake = Files.createTempDirectory("azof-skip-ov").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t", df(Seq(
      ("k", "2024-01-01T00:00:00Z", "v0"),
      ("m", "2024-01-01T00:00:00Z", "m0"))))
    AzofWriter.commitDelta(spark, lake, "t", df(Seq(
      ("k", "2024-02-01T00:00:00Z", "v1"))),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
    AzofWriter.commitDelta(spark, lake, "t", df(Seq(
      ("k", "2024-03-01T00:00:00Z", "v2"))),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))
    val got = AzofScan.scan(spark, lake, "t", AsOf.Current,
        keyFilter = Some(KeyFilter.Keys(Set("k"))))
      .select("key", "value").collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq("k" -> "v2"))
  }

  test("reader surface: WHERE key = … flows into file skipping and stays exact") {
    val lake = buildKeyPartitioned()
    val got = spark.read.format("azof").option("table", "t").load(lake)
      .where(col("key") === "t")
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq("t" -> "t1"))
    // and a non-key predicate alone still returns everything it should
    val all = spark.read.format("azof").option("table", "t").load(lake)
      .where(col("value").startsWith("a") || col("key") === "p")
      .select("key").collect().map(_.getString(0)).sorted
    assert(all.toSeq == Seq("a", "p"))
  }

  test("extensions SQL surface shares the pushdown: WHERE key = … stays exact") {
    val lake = buildKeyPartitioned()
    spark.conf.set("spark.azof.path", lake)
    val got = spark.sql("SELECT key, value FROM azof.t WHERE key = 'h'")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq("h" -> "h1"))
    val asOf = spark.sql(
      """SELECT key, value FROM azof.t TIMESTAMP AS OF '2024-02-15T00:00:00Z'
         WHERE key >= 'e' ORDER BY key""")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(asOf == Seq("e" -> "e1", "h" -> "h1"))
  }

  test("extractKeyFilter: only provably key-restricting shapes prune") {
    import org.apache.spark.sql.sources._
    def x(fs: Filter*) = AzofRelation.extractKeyFilter(fs.toArray)
    assert(x(EqualTo("key", "a")) == Some(KeyFilter.Keys(Set("a"))))
    assert(x(In("key", Array[Any]("a", "b"))) ==
      Some(KeyFilter.Keys(Set("a", "b"))))
    assert(x(GreaterThan("key", "m")) ==
      Some(KeyFilter.Range(Some("m"), None)))
    assert(x(LessThanOrEqual("key", "m")) ==
      Some(KeyFilter.Range(None, Some("m"))))
    assert(x(StringStartsWith("key", "user_")) ==
      Some(KeyFilter.Range(Some("user_"), None)))
    // conjunction composes; a non-key side is just dropped
    assert(x(And(GreaterThan("key", "a"), EqualTo("value", "v"))) ==
      Some(KeyFilter.Range(Some("a"), None)))
    // Or / Not / other columns: no pruning
    assert(x(Or(EqualTo("key", "a"), EqualTo("key", "b"))).isEmpty)
    assert(x(Not(EqualTo("key", "a"))).isEmpty)
    assert(x(EqualTo("value", "a")).isEmpty)
    // non-string IN values: no pruning
    assert(x(In("key", Array[Any](1, 2))).isEmpty)
  }

  test("by-key partitioned commit: point lookups read ~1/numFiles of the commit") {
    val lake = Files.createTempDirectory("azof-skip-bykey").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    val rows2 = (0 until 200).map { i =>
      (f"k$i%03d", f"2024-01-${1 + i % 27}%02dT00:00:00Z", s"v$i")
    }
    AzofWriter.commitPartitioned(spark, lake, "t", df(rows2), numFiles = 8,
      byKey = true)
    val snap = AzofTable(spark, lake, "t").currentSnapshot
    val deltas = snap.segments.head.delta
    assert(deltas.size >= 6, s"expected ~8 files, got ${deltas.size}")
    // files partition the key space: stats ranges are disjoint and a
    // point lookup prunes to exactly one file
    val ranges = deltas.flatMap(_.stats).map(s => (s.keyMin, s.keyMax))
      .sortBy(_._1)
    assert(ranges.sliding(2).forall {
      case Seq((_, aMax), (bMin, _)) => aMax < bMin
      case _ => true
    }, s"overlapping key ranges: $ranges")
    val hit = graft.operators.AzofScan.prunedFiles(snap, AsOf.Current,
      Some(KeyFilter.Keys(Set("k117"))))
    assert(hit.size == 1, s"expected 1 file for point lookup, got $hit")
    // and the lookup is exact
    val got = graft.operators.AzofScan.scan(spark, lake, "t", AsOf.Current,
        keyFilter = Some(KeyFilter.Keys(Set("k117"))))
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq("k117" -> "v117"))
    // scan results are IDENTICAL to a by-time layout of the same rows
    val lake2 = Files.createTempDirectory("azof-skip-bytime").toString
    AzofWriter.createTable(spark, lake2, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitPartitioned(spark, lake2, "t", df(rows2), numFiles = 8)
    def all(l: String) = graft.operators.AzofScan.scan(spark, l, "t")
      .collect().map(_.toSeq).toSet
    assert(all(lake) == all(lake2))
  }

  test("key blooms: point lookups prune TIME-partitioned layouts too") {
    // by-time files all span the full key space, so min/max ranges
    // prune nothing for a point lookup — the opt-in per-file bloom does
    val lake = Files.createTempDirectory("azof-bloom").toString
    spark.conf.set("spark.azof.stats.bloomBits", "8192")
    try {
      AzofWriter.createTable(spark, lake, "t", schema,
        ts("2024-01-01T00:00:00Z"))
      // 3 time-window commits, keys DISJOINT per commit but spanning
      // [a..z] in every file's (min,max) — range pruning is useless
      AzofWriter.commitBase(spark, lake, "t", df(Seq(
        ("aa", "2024-01-02T00:00:00Z", "v1"), ("zz", "2024-01-03T00:00:00Z", "v2"))))
      AzofWriter.commitDelta(spark, lake, "t", df(Seq(
        ("ab", "2024-02-02T00:00:00Z", "v3"), ("zy", "2024-02-03T00:00:00Z", "v4"))),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
      AzofWriter.commitDelta(spark, lake, "t", df(Seq(
        ("ac", "2024-03-02T00:00:00Z", "v5"), ("zz2", "2024-03-03T00:00:00Z", "v6"))),
        ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))

      val snap = AzofTable(spark, lake, "t").currentSnapshot
      val entries = snap.dataFilesWithStats(AsOf.Current)
      assert(entries.forall(_.stats.exists(_.bloom.nonEmpty)))
      // every file's RANGE covers 'zy' (aa..zz) — only the bloom prunes
      assert(entries.forall(_.stats.exists(s =>
        s.keyMin <= "zy" && "zy" <= s.keyMax)))
      val hit = graft.operators.AzofScan.prunedFiles(snap, AsOf.Current,
        Some(KeyFilter.Keys(Set("zy"))))
      assert(hit.size == 1, s"bloom should prune to 1 file, got $hit")
      // and results stay exact
      val got = graft.operators.AzofScan.scan(spark, lake, "t", AsOf.Current,
          keyFilter = Some(KeyFilter.Keys(Set("zy"))))
        .select("key", "value").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      assert(got == Seq("zy" -> "v4"))
      // blooms survive the snapshot JSON round-trip
      assert(SnapshotCodec.parse(SnapshotCodec.render(snap)) == snap)
      assert(SnapshotCodec.render(snap).contains("\"key_bloom\""))
      // bloom composes with TIME pruning: as-of Feb 15 already drops the
      // March delta, and the bloom drops the base too — 1 of 2 remaining
      val asOfHit = graft.operators.AzofScan.prunedFiles(snap,
        AsOf.EventTime(ts("2024-02-15T00:00:00Z")),
        Some(KeyFilter.Keys(Set("zy"))))
      assert(asOfHit.size == 1, s"time+bloom should leave 1 file, got $asOfHit")
      val asOfRow = graft.operators.AzofScan.scan(spark, lake, "t",
          AsOf.EventTime(ts("2024-02-15T00:00:00Z")),
          keyFilter = Some(KeyFilter.Keys(Set("zy"))))
        .select("key", "value").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      assert(asOfRow == Seq("zy" -> "v4"))
    } finally spark.conf.unset("spark.azof.stats.bloomBits")
  }

  test("key blooms: membership is complete; absent keys mostly rejected") {
    val keys = (0 until 500).map(i => s"key-$i")
    val bytes = new Array[Byte](8192 / 8)
    keys.foreach(k => KeyBloom.put(bytes, k, 8192, 4))
    val bloom = KeyBloom.fromBytes(bytes, 8192, 4)
    assert(keys.forall(bloom.mightContain)) // no false negatives, ever
    val falsePos = (0 until 1000).count(i => bloom.mightContain(s"other-$i"))
    assert(falsePos < 100, s"FPR too high: $falsePos/1000")
  }

  test("key blooms are off by default (snapshot size is an explicit choice)") {
    val lake = buildKeyPartitioned()
    val snap = AzofTable(spark, lake, "t").currentSnapshot
    assert(snap.dataFilesWithStats(AsOf.Current)
      .forall(_.stats.forall(_.bloom.isEmpty)))
  }

  test("property: random layouts — skipped scan ≡ brute-force filter") {
    val rnd = new scala.util.Random(20260812L)
    val keys = (0 until 40).map(i => f"k$i%02d")
    for (round <- 0 until 5) {
      val lake = Files.createTempDirectory(s"azof-skip-prop$round").toString
      // alternate rounds write per-file key blooms so the randomized
      // equivalence also covers bloom-based pruning
      if (round % 2 == 1)
        spark.conf.set("spark.azof.stats.bloomBits", "4096")
      else spark.conf.unset("spark.azof.stats.bloomBits")
      AzofWriter.createTable(spark, lake, "t", schema,
        ts("2024-01-01T00:00:00Z"))
      // base over a random key subset, then 3 deltas over random subsets
      // with random (possibly duplicate-key) updates
      var month = 1
      def someRows(n: Int) = (0 until n).map { _ =>
        val k = keys(rnd.nextInt(keys.size))
        val t = f"2024-$month%02d-${1 + rnd.nextInt(27)}%02dT00:00:00Z"
        (k, t, s"v${rnd.nextInt(1000)}")
      }
      AzofWriter.commitBase(spark, lake, "t", df(someRows(12)))
      for (_ <- 0 until 3) {
        month += 1
        AzofWriter.commitDelta(spark, lake, "t", df(someRows(8)),
          ts(f"2024-$month%02d-01T00:00:00Z"),
          ts(f"2024-${month + 1}%02d-01T00:00:00Z"))
      }
      val wanted = (0 until 5).map(_ => keys(rnd.nextInt(keys.size))).toSet
      val skipped = AzofScan.scan(spark, lake, "t", AsOf.Current,
          keyFilter = Some(KeyFilter.Keys(wanted)))
        .collect().map(_.toSeq).toSet
      val brute = AzofScan.scan(spark, lake, "t", AsOf.Current)
        .where(col("key").isin(wanted.toSeq: _*))
        .collect().map(_.toSeq).toSet
      assert(skipped == brute, s"round $round keys $wanted")
    }
    spark.conf.unset("spark.azof.stats.bloomBits")
  }
}
