package graft.sources

import graft.TestSpark
import graft.format._
import graft.operators.AzofScan
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted incremental materialized view: after every refresh,
  * serve ≡ the one-shot GROUP BY over the source's LIVE corpus — under
  * inserts (monoid path, no source rescan), group-moving revisions and
  * deletes (additive pre-image subtraction + min/max rescan confined to
  * groups that lost rows), across both merge-guard shapes, with the
  * epoch rebuild as the rollback hatch.
  */
class MatViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val srcSchema = TableSchema(Seq(
    ColumnDef("grp", ColumnType.AzString, nullable = false),
    ColumnDef("v", ColumnType.AzInt, nullable = false)))

  private val view =
    ViewDef(Seq("grp"), sumCols = Seq("v"), minMaxCols = Seq("v"))

  private def df(rows: (String, String, String, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, g, v) =>
        Row(k, Timestamp.from(Instant.parse(t)), g, v) }),
      srcSchema.toStruct)

  private def ts(s: String) = Instant.parse(s)

  private def mkLake(tag: String): (String, String) = {
    val l = Files.createTempDirectory(s"azof-mv-$tag").toString
    val ck = Files.createTempDirectory(s"azof-mv-$tag-ck").toString
    AzofWriter.createTable(spark, l, "src", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    (l, ck)
  }

  private def refresh(
      l: String, ck: String, bMax: Long = Long.MaxValue): Unit = {
    val q = MatView.refresh(spark, l, "src", l, "mv", view, ck,
      broadcastKeyMax = bMax)
    assert(q.awaitTermination(120000))
  }

  private def served(l: String, tbl: String = "mv") =
    MatView.serve(spark, l, tbl, view)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq

  /** One-shot GROUP BY over the lake's LIVE rows. */
  private def oneShot(l: String) =
    AzofScan.scan(spark, l, "src")
      .groupBy("grp")
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"),
        count(col("v")).as("nn_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq

  test("bootstrap + insert-only refreshes stay retrain-exact (the " +
    "monoid path: new groups appear, extrema merge without a rescan)") {
    val (l, ck) = mkLake("ins")
    AzofWriter.commitBase(spark, l, "src", df(
      ("1", "2024-01-02T00:00:00Z", "a", 10L),
      ("2", "2024-01-02T00:00:00Z", "a", 4L),
      ("3", "2024-01-02T00:00:00Z", "b", 7L)))                       // v2
    refresh(l, ck)
    assert(served(l) == oneShot(l))
    // second batch: extends group a's extrema both ways, adds group c
    AzofWriter.commitDelta(spark, l, "src", df(
      ("4", "2024-02-05T00:00:00Z", "a", 99L),
      ("5", "2024-02-05T00:00:00Z", "a", 1L),
      ("6", "2024-02-05T00:00:00Z", "c", 5L)),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    refresh(l, ck)
    assert(served(l) == oneShot(l))
    assert(served(l).map(_._1) == Seq("a", "b", "c"))
  }

  test("a revision that changes the value AND moves the key across " +
    "groups keeps both groups retrain-exact (pre-image subtraction + " +
    "rescan of the group that lost the row)") {
    val (l, ck) = mkLake("rev")
    AzofWriter.commitBase(spark, l, "src", df(
      ("1", "2024-01-02T00:00:00Z", "a", 10L),
      ("2", "2024-01-02T00:00:00Z", "a", 4L),
      ("3", "2024-01-02T00:00:00Z", "b", 7L)))                       // v2
    refresh(l, ck)
    // key 1 was group a's MAX holder; it moves to group b with a new
    // value — a must rescan (its max falls to 4), b monoid-merges
    AzofWriter.commitDelta(spark, l, "src", df(
      ("1", "2024-02-05T00:00:00Z", "b", 2L)),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    refresh(l, ck)
    assert(served(l) == oneShot(l))
    assert(served(l) == Seq(
      ("a", 1L, 4L, 1L, 4L, 4L), ("b", 2L, 9L, 2L, 2L, 7L)))
  }

  test("deletes: tombstoning a group's extremum rescans it, and a " +
    "fully-emptied group leaves the served view") {
    val (l, ck) = mkLake("del")
    AzofWriter.commitBase(spark, l, "src", df(
      ("1", "2024-01-02T00:00:00Z", "a", 10L),
      ("2", "2024-01-02T00:00:00Z", "a", 4L),
      ("3", "2024-01-02T00:00:00Z", "b", 7L)))                       // v2
    refresh(l, ck)
    AzofWriter.commitDelete(spark, l, "src", Seq("1"),
      ts("2024-02-05T00:00:00Z"))                                    // v3
    refresh(l, ck)
    assert(served(l) == oneShot(l))
    assert(served(l) == Seq(
      ("a", 1L, 4L, 1L, 4L, 4L), ("b", 1L, 7L, 1L, 7L, 7L)))
    AzofWriter.commitDelete(spark, l, "src", Seq("3"),
      ts("2024-03-05T00:00:00Z"))                                    // v4
    refresh(l, ck)
    assert(served(l) == oneShot(l))
    assert(served(l).map(_._1) == Seq("a"), "emptied group b must leave")
    // and it can come back
    AzofWriter.commitDelta(spark, l, "src", df(
      ("7", "2024-04-05T00:00:00Z", "b", 3L)),
      ts("2024-04-01T00:00:00Z"), ts("2024-05-01T00:00:00Z"))        // v5
    refresh(l, ck)
    assert(served(l) == oneShot(l))
  }

  test("one catch-up batch spanning insert+revision+delete commits " +
    "counts only the END state, on BOTH merge-guard shapes") {
    def build(tag: String, bMax: Long) = {
      val (l, ck) = mkLake(tag)
      AzofWriter.commitBase(spark, l, "src", df(
        ("1", "2024-01-02T00:00:00Z", "a", 10L),
        ("2", "2024-01-02T00:00:00Z", "b", 4L)))                     // v2
      refresh(l, ck, bMax)
      // three commits, ONE refresh: key 1 revised twice (intermediate
      // version must never count), key 2 deleted, key 3 inserted
      AzofWriter.commitDelta(spark, l, "src", df(
        ("1", "2024-02-05T00:00:00Z", "a", 50L),
        ("3", "2024-02-05T00:00:00Z", "c", 6L)),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))      // v3
      AzofWriter.commitDelta(spark, l, "src", df(
        ("1", "2024-03-05T00:00:00Z", "b", 8L)),
        ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))      // v4
      AzofWriter.commitDelete(spark, l, "src", Seq("2"),
        ts("2024-04-05T00:00:00Z"))                                  // v5
      refresh(l, ck, bMax)
      (served(l), oneShot(l))
    }
    val (sBc, oBc) = build("cu-bc", Long.MaxValue)
    assert(sBc == oBc)
    val (sSh, oSh) = build("cu-sh", 0L) // every batch exceeds the budget
    assert(sSh == oSh)
    assert(sBc == sSh, "broadcast and shuffle guard shapes must agree")
  }

  test("multi-column groups and multiple aggregate columns") {
    val schema2 = TableSchema(Seq(
      ColumnDef("g1", ColumnType.AzString, nullable = false),
      ColumnDef("g2", ColumnType.AzInt, nullable = false),
      ColumnDef("x", ColumnType.AzInt, nullable = false),
      ColumnDef("y", ColumnType.AzInt, nullable = false)))
    val v2 = ViewDef(Seq("g1", "g2"), sumCols = Seq("x", "y"),
      minMaxCols = Seq("y"))
    val l = Files.createTempDirectory("azof-mv-multi").toString
    val ck = Files.createTempDirectory("azof-mv-multi-ck").toString
    AzofWriter.createTable(spark, l, "src", schema2,
      ts("2024-01-01T00:00:00Z"))
    def rows(rs: (String, String, Long, Long, Long)*) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rs.map { case (k, g1, g2, x, y) =>
          Row(k, Timestamp.from(Instant.parse("2024-01-02T00:00:00Z")),
            g1, g2, x, y) }),
        schema2.toStruct)
    AzofWriter.commitBase(spark, l, "src", rows(
      ("1", "a", 1L, 10L, 100L), ("2", "a", 1L, 20L, 50L),
      ("3", "a", 2L, 30L, 60L), ("4", "b", 1L, 40L, 70L)))           // v2
    val q = MatView.refresh(spark, l, "src", l, "mv2", v2, ck)
    assert(q.awaitTermination(120000))
    AzofWriter.commitDelete(spark, l, "src", Seq("1"),
      ts("2024-02-05T00:00:00Z"))                                    // v3
    val q2 = MatView.refresh(spark, l, "src", l, "mv2", v2, ck)
    assert(q2.awaitTermination(120000))
    val got = MatView.serve(spark, l, "mv2", v2)
      .orderBy("g1", "g2").collect().map(_.toSeq).toSeq
    val want = AzofScan.scan(spark, l, "src")
      .groupBy("g1", "g2")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("x")).as("sum_x"), count(col("x")).as("nn_x"),
        sum(col("y")).as("sum_y"), count(col("y")).as("nn_y"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .orderBy("g1", "g2").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("viewSchema refuses non-Int sum columns, Boolean min/max, and " +
    "unknown names — nullable Ints and typed min/max are legal") {
    val s = TableSchema(Seq(
      ColumnDef("g", ColumnType.AzString, nullable = false),
      ColumnDef("nv", ColumnType.AzInt, nullable = true),
      ColumnDef("sv", ColumnType.AzString, nullable = false),
      ColumnDef("bv", ColumnType.AzBoolean, nullable = false),
      ColumnDef("tv", ColumnType.AzDateTime, nullable = true)))
    intercept[IllegalArgumentException] {
      MatView.viewSchema(s, ViewDef(Seq("g"), sumCols = Seq("sv")))
    }
    intercept[IllegalArgumentException] {
      MatView.viewSchema(s, ViewDef(Seq("g"), minMaxCols = Seq("bv")))
    }
    intercept[IllegalArgumentException] {
      MatView.viewSchema(s, ViewDef(Seq("g"), sumCols = Seq("absent")))
    }
    intercept[IllegalArgumentException] { ViewDef(Nil) }
    // nullable sum → sum_/nn_ pair; String/DateTime min/max keep type
    val sch = MatView.viewSchema(s, ViewDef(Seq("g"),
      sumCols = Seq("nv"), minMaxCols = Seq("sv", "tv")))
    val byName = sch.columns.map(c => c.name -> c).toMap
    assert(byName("sum_nv").dataType == ColumnType.AzInt)
    assert(byName("nn_nv").dataType == ColumnType.AzInt)
    assert(byName("min_sv").dataType == ColumnType.AzString)
    assert(byName("max_tv").dataType == ColumnType.AzDateTime)
  }

  test("NULLABLE measures: SUM/COUNT skip nulls exactly — a group " +
    "whose live values are all null serves SUM = NULL, nn = 0 — under " +
    "inserts, revisions to/from null, and deletes") {
    val schemaN = TableSchema(Seq(
      ColumnDef("grp", ColumnType.AzString, nullable = false),
      ColumnDef("v", ColumnType.AzInt, nullable = true)))
    val vN = ViewDef(Seq("grp"), sumCols = Seq("v"))
    val l = Files.createTempDirectory("azof-mv-null").toString
    val ck = Files.createTempDirectory("azof-mv-null-ck").toString
    AzofWriter.createTable(spark, l, "src", schemaN,
      ts("2024-01-01T00:00:00Z"))
    def rows(rs: (String, String, Any)*) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rs.map { case (k, g, v) =>
          Row(k, Timestamp.from(ts("2024-01-02T00:00:00Z")), g, v) }),
        schemaN.toStruct)
    def rf(): Unit = {
      val q = MatView.refresh(spark, l, "src", l, "mvn", vN, ck)
      assert(q.awaitTermination(120000))
    }
    def snap() = MatView.serve(spark, l, "mvn", vN)
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
      .sortBy(_._1).toSeq
    def want() = AzofScan.scan(spark, l, "src")
      .groupBy("grp")
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"),
        count(col("v")).as("nn_v"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
      .sortBy(_._1).toSeq
    // group a mixes null and non-null; group b is ALL null
    AzofWriter.commitBase(spark, l, "src", rows(
      ("1", "a", 10L), ("2", "a", null), ("3", "b", null),
      ("4", "b", null)))                                             // v2
    rf()
    assert(snap() == want())
    assert(snap() == Seq(("a", 2L, Some(10L), 1L), ("b", 2L, None, 0L)),
      "all-null group must serve SUM NULL, not 0")
    // revise: a's non-null becomes null (sum drains to NULL), one of
    // b's nulls becomes 5 (sum materializes)
    AzofWriter.commitDelta(spark, l, "src", rows(
      ("1", "a", null), ("3", "b", 5L)),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    rf()
    assert(snap() == want())
    assert(snap() == Seq(("a", 2L, None, 0L), ("b", 2L, Some(5L), 1L)))
    // delete b's non-null holder: back to all-null
    AzofWriter.commitDelete(spark, l, "src", Seq("3"),
      ts("2024-03-05T00:00:00Z"))                                    // v4
    rf()
    assert(snap() == want())
    assert(snap().find(_._1 == "b").get == ("b", 1L, None, 0L))
  }

  test("typed min/max: String and DateTime extrema stay retrain-exact " +
    "through monoid merges AND a loss-confined rescan") {
    val schemaT = TableSchema(Seq(
      ColumnDef("grp", ColumnType.AzString, nullable = false),
      ColumnDef("name", ColumnType.AzString, nullable = false),
      ColumnDef("at", ColumnType.AzDateTime, nullable = true)))
    val vT = ViewDef(Seq("grp"), minMaxCols = Seq("name", "at"))
    val l = Files.createTempDirectory("azof-mv-typed").toString
    val ck = Files.createTempDirectory("azof-mv-typed-ck").toString
    AzofWriter.createTable(spark, l, "src", schemaT,
      ts("2024-01-01T00:00:00Z"))
    def rows(rs: (String, String, String, String)*) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rs.map { case (k, g, n, at) =>
          Row(k, Timestamp.from(ts("2024-01-02T00:00:00Z")), g, n,
            if (at == null) null else Timestamp.from(ts(at))) }),
        schemaT.toStruct)
    def rf(): Unit = {
      val q = MatView.refresh(spark, l, "src", l, "mvt", vT, ck)
      assert(q.awaitTermination(120000))
    }
    def snap() = MatView.serve(spark, l, "mvt", vT)
      .orderBy("grp").collect().map(_.toSeq).toSeq
    def want() = AzofScan.scan(spark, l, "src")
      .groupBy("grp")
      .agg(count(lit(1)).as("n_rows"),
        min(col("name")).as("min_name"), max(col("name")).as("max_name"),
        min(col("at")).as("min_at"), max(col("at")).as("max_at"))
      .orderBy("grp").collect().map(_.toSeq).toSeq
    AzofWriter.commitBase(spark, l, "src", rows(
      ("1", "a", "zulu", "2024-03-01T00:00:00Z"),
      ("2", "a", "alpha", null),
      ("3", "b", "mike", "2024-01-15T00:00:00Z")))                   // v2
    rf()
    assert(snap() == want())
    // monoid growth: later timestamp, lexically-later name
    AzofWriter.commitDelta(spark, l, "src", rows(
      ("4", "b", "zz-top", "2024-06-01T00:00:00Z")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    rf()
    assert(snap() == want())
    // loss rescan: delete group a's lexical MAX holder (also the only
    // non-null timestamp) — min_name survives, max falls, at drains
    AzofWriter.commitDelete(spark, l, "src", Seq("1"),
      ts("2024-03-05T00:00:00Z"))                                    // v4
    rf()
    assert(snap() == want())
    val a = MatView.serve(spark, l, "mvt", vT)
      .where(col("grp") === "a").collect()(0)
    assert(a.getString(2) == "alpha" && a.getString(3) == "alpha")
    assert(a.isNullAt(4) && a.isNullAt(5),
      "group a's only timestamp left with its deleted row")
  }

  test("a group value carrying U+0001 fails LOUD at refresh, never a " +
    "silent key collision") {
    val (l, ck) = mkLake("sep")
    AzofWriter.commitBase(spark, l, "src", df(
      ("1", "2024-01-02T00:00:00Z", "ok", 1L),
      ("2", "2024-01-02T00:00:00Z", "bad\u0001group", 2L)))          // v2
    val q = MatView.refresh(spark, l, "src", l, "mv", view, ck)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(120000)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
      c.isInstanceOf[IllegalArgumentException] &&
        c.getMessage.contains("U+0001")),
      s"expected the separator-contract refusal, got: $ex")
  }

  test("the min/max rescan is FILE-CONFINED on a value-clustered " +
    "layout: the counting FS opens only the churned group's files") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.mvfs.impl", classOf[MvCountingFs].getName)
    spark.conf.set("spark.hadoop.fs.mvfs.impl",
      classOf[MvCountingFs].getName)
    val local = Files.createTempDirectory("azof-mv-count").toString
    val l = s"mvfs:$local"
    val ck = Files.createTempDirectory("azof-mv-count-ck").toString
    AzofWriter.createTable(spark, l, "src", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    // one file per GROUP (disjoint key ranges too): per-file value
    // stats then separate the groups, so the rescan's In pushdown can
    // file-skip
    def batch(g: String, at: String) = df(
      (1 to 6).map(i => (s"$g$i", at, g, (i * 10).toLong)): _*)
    AzofWriter.commitBase(spark, l, "src",
      batch("a", "2024-01-10T00:00:00Z"))
    Seq("b", "c", "d", "e", "f").zipWithIndex.foreach { case (g, i) =>
      AzofWriter.commitDelta(spark, l, "src",
        batch(g, f"2024-01-${11 + i}%02dT00:00:00Z"),
        ts(f"2024-01-${11 + i}%02dT00:00:00Z"),
        ts(f"2024-01-${11 + i}%02dT00:00:00Z"))
    }
    refresh(l, ck) // bootstrap: reads everything, uncounted
    val dataFiles = AzofTable(spark, l, "src").currentSnapshot
      .dataFiles(graft.format.AsOf.Current).size
    assert(dataFiles >= 6, s"clustered corpus expected, got $dataFiles")
    // delete group a's MAX holder — a must rescan, nothing else
    AzofWriter.commitDelete(spark, l, "src", Seq("a6"),
      ts("2024-02-05T00:00:00Z"))
    MvCountingFs.reset()
    refresh(l, ck)
    val opened = MvCountingFs.srcDataFiles
    assert(opened.nonEmpty, "counting FS saw no reads — vacuous")
    assert(opened.size <= 3 && opened.size < dataFiles,
      s"rescan must be confined to the churned group's files: opened " +
        s"${opened.size} of $dataFiles: $opened")
    assert(served(l) == oneShot(l))
    assert(served(l).find(_._1 == "a").get == ("a", 5L, 150L, 5L, 10L, 50L))
  }

  test("COUNT(DISTINCT) support table: refcounts exact under inserts, " +
    "value moves, group moves, deletes, and null values — serve ≡ " +
    "one-shot at the view grain, any rollup, and globally; both " +
    "guard shapes") {
    val dSchema = TableSchema(Seq(
      ColumnDef("grp", ColumnType.AzString, nullable = false),
      ColumnDef("b", ColumnType.AzString, nullable = true)))
    val vD = ViewDef(Seq("grp"), distinctCols = Seq("b"))
    def dRows(rows: (String, String, String, Any)*) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (k, t, g, b) =>
          Row(k, Timestamp.from(Instant.parse(t)), g, b) }),
        dSchema.toStruct)
    def build(tag: String, bMax: Long) = {
      val l = Files.createTempDirectory(s"azof-mv-dv-$tag").toString
      val ck = Files.createTempDirectory(s"azof-mv-dv-$tag-ck").toString
      AzofWriter.createTable(spark, l, "src", dSchema,
        ts("2024-01-01T00:00:00Z"))
      def go(): Unit = {
        val q = MatView.refresh(spark, l, "src", l, "mv", vD, ck,
          broadcastKeyMax = bMax)
        assert(q.awaitTermination(120000))
      }
      def dv(groups: Seq[String]) =
        MatView.countDistinct(spark, l, "mv", vD, "b", groups)
          .collect().map(r =>
            (if (groups.isEmpty) "" else r.getString(0), r.getLong(groups.size)))
          .sortBy(_._1).toSeq
      def oneShotDv() = AzofScan.scan(spark, l, "src")
        .groupBy("grp").agg(count_distinct(col("b")).as("dv"))
        .where(col("dv") > 0)
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq
      AzofWriter.commitBase(spark, l, "src", dRows(
        ("1", "2024-01-02T00:00:00Z", "a", "x"),
        ("2", "2024-01-02T00:00:00Z", "a", "x"),
        ("3", "2024-01-02T00:00:00Z", "a", "y"),
        ("4", "2024-01-02T00:00:00Z", "b", null)))                   // v2
      go()
      assert(dv(Seq("grp")) == Seq(("a", 2L)), "x refcount 2, y 1; " +
        "all-null group serves no pair row")
      assert(dv(Seq("grp")) == oneShotDv())
      // key 2 moves x→y (x ref 2→1), key 3 moves GROUP a→b carrying y
      AzofWriter.commitDelta(spark, l, "src", dRows(
        ("2", "2024-02-05T00:00:00Z", "a", "y"),
        ("3", "2024-02-05T00:00:00Z", "b", "y")),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))      // v3
      go()
      assert(dv(Seq("grp")) == Seq(("a", 2L), ("b", 1L)))
      assert(dv(Seq("grp")) == oneShotDv())
      // delete key 1: a's x refcount 1→0 — the pair leaves the serve
      AzofWriter.commitDelete(spark, l, "src", Seq("1"),
        ts("2024-03-05T00:00:00Z"))                                  // v4
      go()
      assert(dv(Seq("grp")) == Seq(("a", 1L), ("b", 1L)),
        "zero-crossing retires the pair exactly")
      assert(dv(Seq("grp")) == oneShotDv())
      // global rollup: y in both groups counts ONCE (distinct pairs,
      // not summed per-group counts)
      assert(dv(Nil) == Seq(("", 1L)), "global distinct = {y}")
      // exact value HISTOGRAM incl. the NULL bucket ≡ the one-shot
      // GROUP BY (grp, b) over the live corpus
      def hist(groups: Seq[String]) =
        MatView.valueHistogram(spark, l, "mv", vD, "b", groups)
          .collect().map(r =>
            (if (groups.isEmpty) "" else r.getString(0),
              if (r.isNullAt(groups.size)) null
              else r.getString(groups.size),
              r.getLong(groups.size + 1)))
          .sortBy(x => (x._1, String.valueOf(x._2))).toSeq
      def oneShotHist() = AzofScan.scan(spark, l, "src")
        .groupBy("grp", "b").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2)))
        .sortBy(x => (x._1, String.valueOf(x._2))).toSeq
      assert(hist(Seq("grp")) == oneShotHist(),
        s"per-group histogram incl. NULL: ${hist(Seq("grp"))}")
      assert(hist(Seq("grp")).exists(_._2 == null),
        "the all-null group's NULL bucket is present")
      assert(hist(Nil).sortBy(x => String.valueOf(x._2)) ==
        oneShotHist().groupBy(_._2).map { case (v, xs) =>
          ("", v, xs.map(_._3).sum) }.toSeq
          .sortBy(x => String.valueOf(x._2)),
        "global histogram sums refcounts across groups")
      dv(Seq("grp"))
    }
    assert(build("bc", Long.MaxValue) == build("sh", 0L),
      "guard shapes agree")
  }

  test("SUM-WEIGHTED histograms: pair-grain measure totals stay exact " +
    "under value moves, null flips on BOTH the distinct and measure " +
    "columns, and deletes — measure histogram ≡ one-shot incl. the " +
    "NULL bucket's sums; both guard shapes; epoch rebuild identical") {
    val schema = TableSchema(Seq(
      ColumnDef("grp", ColumnType.AzString, nullable = false),
      ColumnDef("b", ColumnType.AzString, nullable = true),
      ColumnDef("v", ColumnType.AzInt, nullable = true)))
    val vD = ViewDef(Seq("grp"), sumCols = Seq("v"),
      distinctCols = Seq("b"))
    def rows(xs: (String, String, String, Any, Any)*) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(xs.map { case (k, t, g, b, v) =>
          Row(k, Timestamp.from(Instant.parse(t)), g, b, v) }),
        schema.toStruct)
    def build(tag: String, bMax: Long) = {
      val l = Files.createTempDirectory(s"azof-mv-sumh-$tag").toString
      val ck = Files.createTempDirectory(s"azof-mv-sumh-$tag-ck").toString
      AzofWriter.createTable(spark, l, "src", schema,
        ts("2024-01-01T00:00:00Z"))
      def go(): Unit = {
        val q = MatView.refresh(spark, l, "src", l, "mv", vD, ck,
          broadcastKeyMax = bMax)
        assert(q.awaitTermination(120000))
      }
      def hist(groups: Seq[String], tbl: String = "mv") =
        MatView.valueHistogram(spark, l, tbl, vD, "b", groups,
          measures = Seq("v"))
          .collect().map { r =>
            val o = groups.size
            (if (groups.isEmpty) "" else r.getString(0),
              if (r.isNullAt(o)) null else r.getString(o),
              r.getLong(o + 1),
              if (r.isNullAt(o + 2)) null else r.getLong(o + 2),
              r.getLong(o + 3))
          }.sortBy(x => (x._1, String.valueOf(x._2))).toSeq
      def oneShot(groups: Seq[String]) = {
        val gb = (groups :+ "b").map(col)
        AzofScan.scan(spark, l, "src")
          .groupBy(gb: _*)
          .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
            count(col("v")).as("nn"))
          .collect().map { r =>
            val o = groups.size
            (if (groups.isEmpty) "" else r.getString(0),
              r.getString(o),
              r.getLong(o + 1),
              if (r.isNullAt(o + 2)) null else r.getLong(o + 2),
              r.getLong(o + 3))
          }.sortBy(x => (x._1, String.valueOf(x._2))).toSeq
      }
      AzofWriter.commitBase(spark, l, "src", rows(
        ("1", "2024-01-02T00:00:00Z", "a", "x", 10L),
        ("2", "2024-01-02T00:00:00Z", "a", "x", null),
        ("3", "2024-01-02T00:00:00Z", "a", "y", 4L),
        ("4", "2024-01-02T00:00:00Z", "a", null, 7L),
        ("5", "2024-01-02T00:00:00Z", "b", "x", 1L)))
      go()
      assert(hist(Seq("grp")) == oneShot(Seq("grp")), s"$tag bootstrap")
      // value move (1: x→y, v 10→11), measure null-flip (3: v→null),
      // distinct null-flip (4: null→z) in ONE batch
      AzofWriter.commitDelta(spark, l, "src", rows(
        ("1", "2024-02-05T00:00:00Z", "a", "y", 11L),
        ("3", "2024-02-05T00:00:00Z", "a", "y", null),
        ("4", "2024-02-05T00:00:00Z", "a", "z", 7L)),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
      go()
      assert(hist(Seq("grp")) == oneShot(Seq("grp")), s"$tag churn")
      // delete: the (a, x) pair's only remaining row (all-null v) goes;
      // group b empties entirely
      AzofWriter.commitDelete(spark, l, "src", Seq("2", "5"),
        ts("2024-03-05T00:00:00Z"))
      go()
      assert(hist(Seq("grp")) == oneShot(Seq("grp")), s"$tag deletes")
      // global grain rolls pair measures across groups
      assert(hist(Nil) == oneShot(Nil), s"$tag global")
      // the all-null-measure bucket serves sum NULL with nn 0 (SQL's
      // null-skipping SUM), never a silent 0
      val yRow = hist(Seq("grp")).find(x => x._1 == "a" && x._2 == "y")
      assert(yRow.exists(r => r._4 == 11L && r._5 == 1L),
        s"y bucket carries 11 from key 1 only (3's v is null): $yRow")
      (hist(Seq("grp")), l)
    }
    val (bc, lbc) = build("bc", Long.MaxValue)
    val (sh, _) = build("sh", 0L)
    assert(bc == sh, "guard shapes agree")
    MatView.rebuildEpoch(spark, lbc, "src", lbc, "mv_e2", vD,
      ts("2024-06-01T00:00:00Z"))
    val e2 = MatView.valueHistogram(spark, lbc, "mv_e2", vD, "b",
      Seq("grp"), measures = Seq("v"))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3), r.getLong(4)))
      .sortBy(x => (x._1, String.valueOf(x._2))).toSeq
    assert(e2 == bc, "epoch rebuild serves the same measure histogram")
  }

  test("DISTINCT TUPLES: COUNT(DISTINCT a, b) refcounts stay exact " +
    "under value moves, null components (any-null rows skipped — " +
    "SQL's multi-arg COUNT), and deletes — exact grain, rollup, and " +
    "global ≡ one-shot; a separator in a component refuses loudly") {
    val schema = TableSchema(Seq(
      ColumnDef("grp", ColumnType.AzString, nullable = false),
      ColumnDef("b", ColumnType.AzString, nullable = true),
      ColumnDef("v", ColumnType.AzInt, nullable = true)))
    val vD = ViewDef(Seq("grp"), distinctCols = Seq("b"),
      distinctTuples = Seq(Seq("b", "v")))
    def rows(xs: (String, String, String, Any, Any)*) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(xs.map { case (k, t, g, b, v) =>
          Row(k, Timestamp.from(Instant.parse(t)), g, b, v) }),
        schema.toStruct)
    val l = Files.createTempDirectory("azof-mv-tup").toString
    val ck = Files.createTempDirectory("azof-mv-tup-ck").toString
    AzofWriter.createTable(spark, l, "src", schema,
      ts("2024-01-01T00:00:00Z"))
    def go(): Unit = {
      val q = MatView.refresh(spark, l, "src", l, "mv", vD, ck)
      assert(q.awaitTermination(120000))
    }
    def dv(groups: Seq[String]) =
      MatView.countDistinct(spark, l, "mv", vD, "b,v", groups)
        .collect().map(r =>
          (if (groups.isEmpty) "" else r.getString(0),
            r.getLong(groups.size)))
        .sortBy(_._1).toSeq
    def oneShot(groups: Seq[String]) = {
      val base = AzofScan.scan(spark, l, "src")
      val agg = count_distinct(col("b"), col("v")).as("dv")
      (if (groups.isEmpty) base.agg(agg)
       else base.groupBy(groups.map(col): _*).agg(agg))
        .where(col("dv") > 0L)
        .collect().map(r =>
          (if (groups.isEmpty) "" else r.getString(0),
            r.getLong(groups.size)))
        .sortBy(_._1).toSeq
    }
    AzofWriter.commitBase(spark, l, "src", rows(
      ("1", "2024-01-02T00:00:00Z", "a", "x", 1L),
      ("2", "2024-01-02T00:00:00Z", "a", "x", 1L), // duplicate pair
      ("3", "2024-01-02T00:00:00Z", "a", "x", 2L), // same b, new v
      ("4", "2024-01-02T00:00:00Z", "a", null, 3L), // null b → skipped
      ("5", "2024-01-02T00:00:00Z", "b", "y", null))) // null v → skipped
    go()
    assert(dv(Seq("grp")) == Seq(("a", 2L)),
      "(x,1) and (x,2); any-null rows contribute nothing")
    assert(dv(Seq("grp")) == oneShot(Seq("grp")))
    // value move: key 3 (x,2)→(x,1) retires (x,2); key 5 gains a v
    AzofWriter.commitDelta(spark, l, "src", rows(
      ("3", "2024-02-05T00:00:00Z", "a", "x", 1L),
      ("5", "2024-02-05T00:00:00Z", "b", "y", 9L)),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
    go()
    assert(dv(Seq("grp")) == oneShot(Seq("grp")))
    assert(dv(Seq("grp")) == Seq(("a", 1L), ("b", 1L)))
    // delete key 1: (a, x, 1) ref 2→1 stays; rollup + global exact
    AzofWriter.commitDelete(spark, l, "src", Seq("1"),
      ts("2024-03-05T00:00:00Z"))
    go()
    assert(dv(Seq("grp")) == oneShot(Seq("grp")))
    assert(dv(Nil) == oneShot(Nil), "global tuple distinct")
    // the SINGLE declared column still serves off the same table
    assert(MatView.countDistinct(spark, l, "mv", vD, "b", Seq("grp"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      .toSeq == Seq(("a", 1L), ("b", 1L)))
    // a component carrying the reserved separator refuses LOUDLY —
    // its encoded value would alias a different tuple
    AzofWriter.commitDelta(spark, l, "src", rows(
      ("9", "2024-04-05T00:00:00Z", "a", "badsep", 1L)),
      ts("2024-04-01T00:00:00Z"), ts("2024-05-01T00:00:00Z"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = MatView.refresh(spark, l, "src", l, "mv", vD, ck)
      q.awaitTermination(120000); q.stop()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(m => String.valueOf(m.getMessage))
      .mkString(" | ")
    assert(msgs.contains("U+0001"), s"separator refusal is loud: $msgs")
  }

  test("a pre-measure support table refuses LOUDLY on refresh and on " +
    "a measure histogram, naming the rebuild remedy") {
    val schema = TableSchema(Seq(
      ColumnDef("grp", ColumnType.AzString, nullable = false),
      ColumnDef("b", ColumnType.AzString, nullable = true),
      ColumnDef("v", ColumnType.AzInt, nullable = true)))
    val vD = ViewDef(Seq("grp"), sumCols = Seq("v"),
      distinctCols = Seq("b"))
    val l = Files.createTempDirectory("azof-mv-olddv").toString
    val ck = Files.createTempDirectory("azof-mv-olddv-ck").toString
    // the OLD support layout (no per-pair measures), created FIRST so
    // MatView.create's idempotent createTableIfAbsent keeps it
    AzofWriter.createTable(spark, l, "mv__dv",
      TableSchema(Seq(
        ColumnDef("dcol", ColumnType.AzString, nullable = false),
        ColumnDef("grp", ColumnType.AzString, nullable = false),
        ColumnDef("value", ColumnType.AzString, nullable = false),
        ColumnDef("ref", ColumnType.AzInt, nullable = false))),
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "src", schema,
      ts("2024-01-01T00:00:00Z"))
    // the gate fires BEFORE the stream starts — a synchronous, loud
    // refusal, never a buried streaming failure
    val ex = intercept[IllegalStateException] {
      MatView.refresh(spark, l, "src", l, "mv", vD, ck)
    }
    assert(ex.getMessage.contains("mv-rebuild"),
      s"refresh names the remedy: ${ex.getMessage}")
    assert(MatView.dvLayoutOk(
      graft.format.AzofTable(spark, l, "mv__dv").currentSnapshot.schema,
      Seq("v")) == false)
    val hx = intercept[IllegalStateException] {
      MatView.valueHistogram(spark, l, "mv", vD, "b", Seq("grp"),
        measures = Seq("v"))
    }
    assert(hx.getMessage.contains("mv-rebuild"))
  }

  test("dv-pin TOCTOU closed: the gate pins view AND support snapshots " +
    "BEFORE validating, so a refresh landing between gate and serve " +
    "still serves ONE consistent instant — never view totals @C mixed " +
    "with support pairs @C+1 (the round-14 defect's histogram shape)") {
    val dSchema = TableSchema(Seq(
      ColumnDef("grp", ColumnType.AzString, nullable = false),
      ColumnDef("b", ColumnType.AzString, nullable = true)))
    val vD = ViewDef(Seq("grp"), distinctCols = Seq("b"))
    def dRows(rows: (String, String, String, Any)*) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (k, t, g, b) =>
          Row(k, Timestamp.from(Instant.parse(t)), g, b) }),
        dSchema.toStruct)
    val l = Files.createTempDirectory("azof-mv-toctou").toString
    val ck = Files.createTempDirectory("azof-mv-toctou-ck").toString
    AzofWriter.createTable(spark, l, "src", dSchema,
      ts("2024-01-01T00:00:00Z"))
    def go(): Unit = {
      val q = MatView.refresh(spark, l, "src", l, "mv", vD, ck)
      assert(q.awaitTermination(120000))
    }
    def histAt(vv: Option[Long], dvv: Option[Long]) =
      MatView.valueHistogram(spark, l, "mv", vD, "b", Seq("grp"), vv, dvv)
        .collect().map(r => (r.getString(0),
          if (r.isNullAt(1)) null else r.getString(1), r.getLong(2)))
        .sortBy(x => (x._1, String.valueOf(x._2))).toSeq
    AzofWriter.commitBase(spark, l, "src", dRows(
      ("1", "2024-01-02T00:00:00Z", "a", "x"),
      ("2", "2024-01-02T00:00:00Z", "a", "y"),
      ("3", "2024-01-02T00:00:00Z", "a", null)))                     // C
    go()
    // THE GATE — exactly what the rewrite rule calls before building
    // the served plan: freshness validated, BOTH snapshots pinned
    val pins = MatView.freshViewVersions(spark, l, "src", l, "mv",
      pinned = None, needDv = true)
    assert(pins.isDefined && pins.get._2.isDefined, "fresh + dv pinned")
    val (vv, dvv) = pins.get
    val histC = histAt(Some(vv), dvv)
    assert(histC == Seq(("a", null, 1L), ("a", "x", 1L), ("a", "y", 1L)))
    // THE RACE: a source commit + refresh land AFTER the gate returned
    // but BEFORE the rewritten plan executes (the follow driver's
    // steady state) — key 2's value nulls out, key 4 inserts another x
    AzofWriter.commitDelta(spark, l, "src", dRows(
      ("2", "2024-02-05T00:00:00Z", "a", null),
      ("4", "2024-02-05T00:00:00Z", "a", "x")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // C+1
    go()
    // consistent instant: the serve built from the gate's pins still
    // reads exactly state C
    assert(histAt(Some(vv), dvv) == histC,
      "pinned serve is immune to the racing refresh")
    // the round-14 read-after-gate shape is PROVABLY wrong: view @C
    // with the support table's CURRENT (C+1) snapshot mixes states —
    // its NULL bucket (Σ n_rows@C − Σ ref@C+1 = 3 − 2 = 1) and its
    // missing y bucket match NO instant of the table
    val dvNow = AzofTable(spark, l, MatView.dvTableName("mv"))
      .currentVersion.toLong
    val mixed = histAt(Some(vv), Some(dvNow))
    val histC1 = histAt(None, None)
    assert(histC1 == Seq(("a", null, 2L), ("a", "x", 2L)))
    assert(mixed != histC && mixed != histC1,
      s"the mixed-state serve ($mixed) matches no instant — the gate " +
        "must never produce these pins")
    // a RE-RUN gate validates and pins the post-race state
    val pins2 = MatView.freshViewVersions(spark, l, "src", l, "mv",
      pinned = None, needDv = true).get
    assert(histAt(Some(pins2._1), pins2._2) == histC1)
  }

  test("a pre-nn_ view table (round-12 layout) refuses LOUDLY on " +
    "serve and refresh, naming the rebuild remedy — never an opaque " +
    "unresolved-column error") {
    val (l, ck) = mkLake("oldfmt")
    AzofWriter.commitBase(spark, l, "src", df(
      ("1", "2024-01-02T00:00:00Z", "a", 10L)))
    // hand-build the OLD layout: sum_v with NO nn_v (what a pre-nn_
    // binary's mv table looks like on disk after an upgrade)
    AzofWriter.createTable(spark, l, "mv_old",
      TableSchema(Seq(
        ColumnDef("grp", ColumnType.AzString, nullable = false),
        ColumnDef("n_rows", ColumnType.AzInt, nullable = false),
        ColumnDef("sum_v", ColumnType.AzInt, nullable = false),
        ColumnDef("min_v", ColumnType.AzInt, nullable = true),
        ColumnDef("max_v", ColumnType.AzInt, nullable = true))),
      ts("2024-01-01T00:00:00Z"))
    val eServe = intercept[IllegalStateException] {
      MatView.serve(spark, l, "mv_old", view)
    }
    assert(eServe.getMessage.contains("rebuil") &&
      eServe.getMessage.contains("mv_old"),
      s"serve names the remedy: ${eServe.getMessage}")
    val eRefresh = intercept[IllegalStateException] {
      MatView.refresh(spark, l, "src", l, "mv_old", view, ck)
    }
    assert(eRefresh.getMessage.contains("rebuil"),
      s"refresh names the remedy: ${eRefresh.getMessage}")
    // and the REWRITE rule must silently skip such a candidate (scan
    // fallback), not crash the user's query in the optimizer
    val dir = AzofTable(spark, l, "mv_old").tableDir
    val p = new org.apache.hadoop.fs.Path(dir, MatView.DefFileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    out.write(("""{"source_path":"","source_table":"src",""" +
      """"group_cols":["grp"],"sum_cols":["v"],"minmax_cols":["v"]}""")
      .getBytes("UTF-8"))
    out.close()
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", "mv_old")
    try {
      val q = spark.sql("SELECT grp, sum(v) AS sv FROM azof.src GROUP BY grp")
      assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("a", 10L)), "query answers from the scan, not a crash")
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  test("rebuildEpoch after a source rollback serves the rolled-back " +
    "live state (the no-feed-event reconciliation hatch)") {
    val (l, ck) = mkLake("rb")
    AzofWriter.commitBase(spark, l, "src", df(
      ("1", "2024-01-02T00:00:00Z", "a", 10L),
      ("2", "2024-01-02T00:00:00Z", "b", 4L)))                       // v2
    refresh(l, ck)
    AzofWriter.commitDelta(spark, l, "src", df(
      ("3", "2024-02-05T00:00:00Z", "c", 6L)),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    refresh(l, ck)
    AzofWriter.rollback(spark, l, "src", 2L)                         // v4
    MatView.rebuildEpoch(spark, l, "src", l, "mv_e2", view,
      ts("2024-06-01T00:00:00Z"))
    assert(served(l, "mv_e2") == oneShot(l))
    assert(served(l, "mv_e2").map(_._1) == Seq("a", "b"))
  }

  test("DERIVED group keys: a date_trunc day bucket stays retrain-exact " +
    "under revisions that MOVE a row across buckets, deletes (the " +
    "rescan runs at the bucketed grain), and the epoch rebuild") {
    val tSchema = TableSchema(Seq(
      ColumnDef("t", ColumnType.AzDateTime, nullable = false),
      ColumnDef("v", ColumnType.AzInt, nullable = false)))
    val dview = ViewDef(Seq("day"), sumCols = Seq("v"),
      minMaxCols = Seq("v"),
      derivedGroups = Seq(DerivedGroup("day", "date_trunc('day', t)",
        ColumnType.AzDateTime)))
    val l = Files.createTempDirectory("azof-mv-der").toString
    val ck = Files.createTempDirectory("azof-mv-der-ck").toString
    AzofWriter.createTable(spark, l, "src", tSchema,
      ts("2024-01-01T00:00:00Z"))
    def tdf(rows: (String, String, String, Long)*) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (k, et, t, v) =>
          Row(k, Timestamp.from(ts(et)), Timestamp.from(ts(t)), v) }),
        tSchema.toStruct)
    def go(): Unit = {
      val q = MatView.refresh(spark, l, "src", l, "mvd", dview, ck)
      assert(q.awaitTermination(120000))
    }
    def snap(tbl: String = "mvd") =
      MatView.serve(spark, l, tbl, dview)
        .collect().map(r => (r.getTimestamp(0).toInstant.toString,
          r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
        .sortBy(_._1).toSeq
    def shot() = AzofScan.scan(spark, l, "src")
      .select(date_trunc("day", col("t")).as("day"), col("v"))
      .groupBy("day")
      .agg(count(lit(1)), sum(col("v")), min(col("v")), max(col("v")))
      .collect().map(r => (r.getTimestamp(0).toInstant.toString,
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    AzofWriter.commitBase(spark, l, "src", tdf(
      ("1", "2024-01-02T00:00:00Z", "2024-03-01T06:00:00Z", 10L),
      ("2", "2024-01-02T00:00:00Z", "2024-03-01T23:00:00Z", 4L),
      ("3", "2024-01-02T00:00:00Z", "2024-03-02T01:00:00Z", 7L)))
    go()
    assert(snap() == shot(), "bootstrap buckets")
    assert(snap().map(_._1) ==
      Seq("2024-03-01T00:00:00Z", "2024-03-02T00:00:00Z"))
    // a revision MOVES key 1 across day buckets and changes its value;
    // key 2's delete empties nothing but forces the Mar-1 rescan
    AzofWriter.commitDelta(spark, l, "src", tdf(
      ("1", "2024-02-05T00:00:00Z", "2024-03-02T05:00:00Z", 11L)),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
    AzofWriter.commitDelete(spark, l, "src", Seq("2"),
      ts("2024-02-06T00:00:00Z"))
    go()
    assert(snap() == shot(), "bucket move + delete")
    assert(snap() == Seq(
      ("2024-03-02T00:00:00Z", 2L, 18L, 7L, 11L)),
      "Mar-1 fully emptied, Mar-2 absorbed the moved row")
    // the rebuild hatch agrees
    MatView.rebuildEpoch(spark, l, "src", l, "mvd_e2", dview,
      ts("2024-06-01T00:00:00Z"))
    assert(snap("mvd_e2") == shot())
    // contract refusals: shadowing a source column, unknown reference
    intercept[IllegalArgumentException] {
      MatView.viewSchema(tSchema, ViewDef(Seq("t"),
        derivedGroups = Seq(DerivedGroup("t", "date_trunc('day', t)",
          ColumnType.AzDateTime))))
    }
    intercept[IllegalArgumentException] {
      MatView.viewSchema(tSchema, ViewDef(Seq("day"),
        derivedGroups = Seq(DerivedGroup("day",
          "date_trunc('day', absent)", ColumnType.AzDateTime))))
    }
  }

  test("definition contracts: a distinct tuple containing a group " +
    "column refuses (JoinViewDef parity), and 'auto' is a reserved " +
    "view name on create AND rebuildEpoch") {
    intercept[IllegalArgumentException] {
      ViewDef(Seq("grp"), distinctTuples = Seq(Seq("grp", "v")))
    }
    val (l, _) = mkLake("auto-name")
    intercept[IllegalArgumentException] {
      MatView.create(spark, l, "src", l, "auto", view)
    }
    intercept[IllegalArgumentException] {
      MatView.rebuildEpoch(spark, l, "src", l, "auto", view,
        ts("2024-06-01T00:00:00Z"))
    }
  }

  test("NULLABLE tuple components: pairs carry partial-null rows " +
    "NULL-token-marked and stay exact under null-flipping churn; a " +
    "pre-token sidecar refuses the refresh AND the direct histogram " +
    "loudly; a real U+0002 component refuses like the separator") {
    val nSchema = TableSchema(Seq(
      ColumnDef("g", ColumnType.AzString, nullable = false),
      ColumnDef("cat", ColumnType.AzString, nullable = true),
      ColumnDef("sub", ColumnType.AzInt, nullable = true)))
    def nRows(rows: (String, String, Any, Any)*) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (k, g, c, v) =>
          Row(k, Timestamp.from(ts("2024-01-02T00:00:00Z")), g,
            c match { case null => null; case x => x },
            v match { case null => null; case x: Long => x }) }),
        nSchema.toStruct)
    val vD = ViewDef(Seq("g"), distinctTuples = Seq(Seq("cat", "sub")))
    val l = Files.createTempDirectory("azof-mv-ntup").toString
    val ck = Files.createTempDirectory("azof-mv-ntup-ck").toString
    AzofWriter.createTable(spark, l, "src", nSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "src", nRows(
      ("1", "a", "x", 1L), ("2", "a", null, 1L),
      ("3", "a", "x", null), ("4", "b", null, null)))
    def refresh(): Unit = {
      val q = MatView.refresh(spark, l, "src", l, "ntup", vD, ck)
      assert(q.awaitTermination(120000))
    }
    refresh()
    val S = "\u0001"; val N = "\u0002"
    def hist() = MatView.valueHistogram(spark, l, "ntup", vD,
      "cat,sub", Nil).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    // every row pairs; partial-null tuples encode with the NULL token
    assert(hist() == Seq(
      (s"x${S}1", 1L), (s"$N${S}1", 1L),
      (s"x$S$N", 1L), (s"$N$S$N", 1L)).sortBy(_._1), hist().toString)
    // COUNT(DISTINCT cat, sub) skips any-null rows: exactly one pair
    val dv = MatView.countDistinct(spark, l, "ntup", vD, "cat,sub", Nil)
      .collect()(0).getLong(0)
    assert(dv == 1L, s"any-null rows skipped: $dv")
    // NULL-FLIPPING churn: key 2 gains its cat, key 3 loses its cat,
    // key 1 deleted — pairs move between marked and unmarked forms
    AzofWriter.commitDelta(spark, l, "src", nRows(
      ("2", "a", "y", 1L), ("3", "a", null, null)),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
    refresh()
    AzofWriter.commitDelete(spark, l, "src", Seq("1"),
      ts("2024-03-05T00:00:00Z"))
    refresh()
    // live rows: 2=(a,y,1), 3=(a,NULL,NULL), 4=(b,NULL,NULL)
    assert(hist() == Seq(
      (s"$N$S$N", 2L), (s"y${S}1", 1L)).sortBy(_._1),
      hist().toString)
    assert(MatView.countDistinct(spark, l, "ntup", vD, "cat,sub", Nil)
      .collect()(0).getLong(0) == 1L)
    // a REAL U+0002 inside a component would alias NULL: loud refusal
    AzofWriter.commitDelta(spark, l, "src", nRows(
      ("9", "a", "bad" + N + "val", 1L)),
      ts("2024-04-01T00:00:00Z"), ts("2024-05-01T00:00:00Z"))
    val e2 = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] { refresh() }
    assert(e2.getMessage.contains("separator") ||
      e2.getCause.getMessage.contains("separator"))
    // PRE-TOKEN sidecar (format 2) + nullable components: the refresh
    // refuses loudly naming the rebuild, and the direct histogram too
    val l2 = Files.createTempDirectory("azof-mv-ntup-old").toString
    val ck2 = Files.createTempDirectory("azof-mv-ntup-old-ck").toString
    AzofWriter.createTable(spark, l2, "src", nSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l2, "src", nRows(("1", "a", "x", 1L)))
    MatView.create(spark, l2, "src", l2, "ntup2", vD)
    val defHP = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(l2, "ntup2"), MatView.DefFileName)
    val dfs = defHP.getFileSystem(spark.sessionState.newHadoopConf())
    val oldJson = {
      val in = dfs.open(defHP)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    val out = dfs.create(defHP, true)
    try out.write(oldJson.replace(
      "\"format\":" + MatView.FormatVersion, "\"format\":2")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val e3 = intercept[IllegalStateException] {
      val q = MatView.refresh(spark, l2, "src", l2, "ntup2", vD, ck2)
      q.awaitTermination(120000); ()
    }
    assert(e3.getMessage.contains("mv-rebuild") &&
      e3.getMessage.contains("NULLABLE"), e3.getMessage)
    val e4 = intercept[IllegalStateException] {
      MatView.valueHistogram(spark, l2, "ntup2", vD, "cat,sub", Nil)
        .collect()
    }
    assert(e4.getMessage.contains("mv-rebuild"), e4.getMessage)
  }

  test("as-of gate on a FULLY-CLOSED tree: a closed root segment's " +
    "deltas participate in the Current read regardless of the " +
    "segment's range, so a delta window above the coordinate refuses " +
    "the event-time gate; windows at-or-below it validate") {
    // hand-written metadata — this engine's own writers always leave
    // an open segment, but the format admits fully-closed tables (the
    // reference's metadata tests); the gate must stay conservative
    val l = Files.createTempDirectory("azof-mv-closed").toString
    val dir = new java.io.File(l, "t"); dir.mkdirs()
    def snap(deltaStart: String, deltaEnd: String): String =
      SnapshotCodec.render(Snapshot(srcSchema, Seq(
        Segment("10", ts("2024-01-01T00:00:00Z"),
          Some(ts("2024-02-01T00:00:00Z")), None, Nil,
          Seq(Delta("dx.parquet", ts(deltaStart), ts(deltaEnd)))))))
    val t = ts("2024-02-15T00:00:00Z") // outside the closed range
    def gate(json: String): Boolean = {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir.toString, "s2.json"), json)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir.toString, "version.txt"), "2")
      MatView.unchangedSinceAsOf(spark, l, "t", 2L, t)
    }
    assert(!gate(snap("2024-03-01T00:00:00Z", "2024-03-02T00:00:00Z")),
      "a closed root's delta ABOVE the coordinate differs between " +
        "Current and as-of — must refuse")
    assert(gate(snap("2024-01-10T00:00:00Z", "2024-01-20T00:00:00Z")),
      "a closed root's delta at-or-below the coordinate reads the " +
        "same both ways — validates")
  }

  test("VARIANCE columns: ss_<c> sum-of-squares maintained by the " +
    "same old − pre + new arithmetic through value churn, null flips " +
    "in both directions, and deletes; a varCols def over an ss-less " +
    "table refuses loudly naming mv-rebuild") {
    val nSchema = TableSchema(Seq(
      ColumnDef("grp", ColumnType.AzString, nullable = false),
      ColumnDef("w", ColumnType.AzInt, nullable = true)))
    def nRows(rows: (String, String, Any)*) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (k, g, w) =>
          Row(k, Timestamp.from(ts("2024-01-02T00:00:00Z")), g,
            w match { case null => null; case x: Long => x }) }),
        nSchema.toStruct)
    val vd = ViewDef(Seq("grp"), sumCols = Seq("w"),
      varCols = Seq("w"))
    val l = Files.createTempDirectory("azof-mv-var").toString
    val ck = Files.createTempDirectory("azof-mv-var-ck").toString
    AzofWriter.createTable(spark, l, "src", nSchema,
      ts("2024-01-01T00:00:00Z"))
    def rf(): Unit = {
      val q = MatView.refresh(spark, l, "src", l, "vmv", vd, ck)
      assert(q.awaitTermination(120000))
    }
    def check(): Unit = {
      val got = MatView.serve(spark, l, "vmv", vd)
        .select("grp", "n_rows", "sum_w", "nn_w", "ss_w")
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3),
          r.getLong(4))).sortBy(_._1).toSeq
      val want = AzofScan.scan(spark, l, "src").groupBy("grp")
        .agg(count(lit(1)).as("n"), sum(col("w")).as("s"),
          count(col("w")).as("nn"),
          coalesce(sum(col("w") * col("w")), lit(0L)).as("ss"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3),
          r.getLong(4))).sortBy(_._1).toSeq
      assert(got == want, s"served $got != one-shot $want")
    }
    AzofWriter.commitBase(spark, l, "src", nRows(
      ("1", "a", 10L), ("2", "a", 4L), ("3", "b", 7L),
      ("4", "a", null), ("5", "b", null)))                           // v2
    rf(); check()
    // value churn + null flips BOTH directions + a group move
    AzofWriter.commitDelta(spark, l, "src", nRows(
      ("1", "a", 13L),      // value churn: ss subtracts 100, adds 169
      ("4", "a", 6L),       // null → value
      ("3", "b", null),     // value → null
      ("2", "b", 4L)),      // group move a → b
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    rf(); check()
    AzofWriter.commitDelete(spark, l, "src", Seq("1", "5"),
      ts("2024-03-05T00:00:00Z"))                                    // v4
    rf(); check()
    // an ALL-NULL group serves ss = 0 with nn = 0
    AzofWriter.commitDelta(spark, l, "src", nRows(("9", "z", null)),
      ts("2024-04-01T00:00:00Z"), ts("2024-05-01T00:00:00Z"))        // v5
    rf(); check()
    // a varCols def against a table built WITHOUT ss refuses loudly
    val l2 = Files.createTempDirectory("azof-mv-var-old").toString
    val ck2 = Files.createTempDirectory("azof-mv-var-old-ck").toString
    AzofWriter.createTable(spark, l2, "src", nSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l2, "src", nRows(("1", "a", 1L)))
    MatView.create(spark, l2, "src", l2, "vmv2",
      ViewDef(Seq("grp"), sumCols = Seq("w")))
    val e = intercept[IllegalStateException] {
      val q = MatView.refresh(spark, l2, "src", l2, "vmv2", vd, ck2)
      q.awaitTermination(120000); ()
    }
    assert(e.getMessage.contains("mv-rebuild") &&
      e.getMessage.contains("ss_"), e.getMessage)
  }
}

/** RawLocalFileSystem counting distinct parquet data files opened under
  * the `src` table — the file-confinement pin for the MatView min/max
  * rescan on a value-clustered layout.
  */
class MvCountingFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mvfs"
  override def getUri: java.net.URI = java.net.URI.create("mvfs:///")
  override def open(f: org.apache.hadoop.fs.Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    MvCountingFs.record(f)
    super.open(f, bufferSize)
  }
}

object MvCountingFs {
  val opened = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def record(f: org.apache.hadoop.fs.Path): Unit = {
    val s = f.toString
    if (s.contains("/src/") && s.endsWith(".parquet")) { opened.add(s); () }
  }
  def reset(): Unit = opened.clear()
  def srcDataFiles: Set[String] = {
    import scala.jdk.CollectionConverters._
    opened.asScala.toSet
  }
}
