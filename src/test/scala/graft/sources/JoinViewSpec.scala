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

/** The incremental JOIN view: after every refresh, serve ≡ the one-shot
  * fact⋈dim GROUP BY over both tables' live states — under fact churn,
  * dim attribute churn (facts move groups without changing), dim
  * deletes/inserts (inner-join membership), dangling foreign keys,
  * interleaved catch-ups on both guard shapes, and a crash between
  * commit and cursor write (the replay-guard heal).
  */
class JoinViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val factSchema = TableSchema(Seq(
    ColumnDef("fk", ColumnType.AzString, nullable = false),
    ColumnDef("v", ColumnType.AzInt, nullable = false)))
  private val dimSchema = TableSchema(Seq(
    ColumnDef("tier", ColumnType.AzString, nullable = false)))

  private val jdef = JoinViewDef(Seq("tier"), sumCols = Seq("v"),
    minMaxCols = Seq("v"), dims = Seq(DimJoin("fk", Seq("tier"))))

  private def ts(s: String) = Instant.parse(s)

  private def facts(rows: (String, String, String, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, fk, v) =>
        Row(k, Timestamp.from(ts(t)), fk, v) }),
      factSchema.toStruct)

  private def dims(rows: (String, String, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, tier) =>
        Row(k, Timestamp.from(ts(t)), tier) }),
      dimSchema.toStruct)

  private def mkLake(tag: String): String = {
    val l = Files.createTempDirectory(s"azof-jv-$tag").toString
    AzofWriter.createTable(spark, l, "fact", factSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "dim", dimSchema,
      ts("2024-01-01T00:00:00Z"))
    l
  }

  private def refresh(l: String, bMax: Long = Long.MaxValue) =
    JoinView.refresh(spark, l, "fact", Seq((l, "dim")), l, "jv", jdef,
      broadcastKeyMax = bMax)

  private def served(l: String, tbl: String = "jv") =
    JoinView.serve(spark, l, tbl, jdef)
      .select("tier", "n_rows", "sum_v", "min_v", "max_v") // BY NAME
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq

  private def oneShot(l: String) = {
    val f = AzofScan.scan(spark, l, "fact").select("fk", "v")
    val d = AzofScan.scan(spark, l, "dim")
      .select(col(TableSchema.KeyName).as("_dk"), col("tier"))
    f.join(d, f("fk") === d("_dk"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
  }

  test("bootstrap + fact deltas stay join-exact; a dangling fk " +
    "contributes nothing until its dim row appears") {
    val l = mkLake("boot")
    AzofWriter.commitBase(spark, l, "dim", dims(
      ("d1", "2024-01-02T00:00:00Z", "t1"),
      ("d2", "2024-01-02T00:00:00Z", "t2")))                         // dim v2
    AzofWriter.commitBase(spark, l, "fact", facts(
      ("1", "2024-01-02T00:00:00Z", "d1", 10L),
      ("2", "2024-01-02T00:00:00Z", "d1", 4L),
      ("3", "2024-01-02T00:00:00Z", "d2", 7L),
      ("4", "2024-01-02T00:00:00Z", "dX", 99L)))  // dangling  fact v2
    val r1 = refresh(l)
    assert(!r1.noop && served(l) == oneShot(l))
    assert(served(l) == Seq(("t1", 2L, 14L, 4L, 10L),
      ("t2", 1L, 7L, 7L, 7L)), "dangling d4 contributes nothing")
    // dim insert ADOPTS the dangling fact
    AzofWriter.commitDelta(spark, l, "dim", dims(
      ("dX", "2024-02-05T00:00:00Z", "t2")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // dim v3
    refresh(l)
    assert(served(l) == oneShot(l))
    assert(served(l).find(_._1 == "t2").get == ("t2", 2L, 106L, 7L, 99L))
    // plain fact delta
    AzofWriter.commitDelta(spark, l, "fact", facts(
      ("5", "2024-03-05T00:00:00Z", "d1", 1L)),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))        // fact v3
    refresh(l)
    assert(served(l) == oneShot(l))
    // idle refresh is a noop
    assert(refresh(l).noop)
  }

  test("dim attribute churn moves UN-CHANGED facts across groups " +
    "exactly (subtract pre-attrs, add new; min/max rescan)") {
    val l = mkLake("dimrev")
    AzofWriter.commitBase(spark, l, "dim", dims(
      ("d1", "2024-01-02T00:00:00Z", "t1"),
      ("d2", "2024-01-02T00:00:00Z", "t1")))                         // dim v2
    AzofWriter.commitBase(spark, l, "fact", facts(
      ("1", "2024-01-02T00:00:00Z", "d1", 100L),
      ("2", "2024-01-02T00:00:00Z", "d1", 5L),
      ("3", "2024-01-02T00:00:00Z", "d2", 50L)))                     // fact v2
    refresh(l)
    assert(served(l) == Seq(("t1", 3L, 155L, 5L, 100L)))
    // d1 moves to t9 — facts 1 and 2 follow it; t1's max falls to 50
    AzofWriter.commitDelta(spark, l, "dim", dims(
      ("d1", "2024-02-05T00:00:00Z", "t9")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // dim v3
    refresh(l)
    assert(served(l) == oneShot(l))
    assert(served(l) == Seq(
      ("t1", 1L, 50L, 50L, 50L), ("t9", 2L, 105L, 5L, 100L)))
    // dim DELETE drops the whole group's membership
    AzofWriter.commitDelete(spark, l, "dim", Seq("d1"),
      ts("2024-03-05T00:00:00Z"))                                    // dim v4
    refresh(l)
    assert(served(l) == oneShot(l))
    assert(served(l) == Seq(("t1", 1L, 50L, 50L, 50L)),
      "t9 emptied by the dim delete")
  }

  test("one catch-up refresh spanning churn on BOTH tables counts only " +
    "end states — on both merge-guard shapes") {
    def build(tag: String, bMax: Long) = {
      val l = mkLake(tag)
      AzofWriter.commitBase(spark, l, "dim", dims(
        ("d1", "2024-01-02T00:00:00Z", "t1"),
        ("d2", "2024-01-02T00:00:00Z", "t2")))                       // dim v2
      AzofWriter.commitBase(spark, l, "fact", facts(
        ("1", "2024-01-02T00:00:00Z", "d1", 10L),
        ("2", "2024-01-02T00:00:00Z", "d2", 4L)))                    // fact v2
      refresh(l, bMax)
      // THEN, unrefreshed: fact 1 revised twice (fk move), fact 3
      // inserted, fact 2 deleted; dim d2 re-tiered, d3 inserted
      AzofWriter.commitDelta(spark, l, "fact", facts(
        ("1", "2024-02-05T00:00:00Z", "d2", 20L),
        ("3", "2024-02-05T00:00:00Z", "d3", 6L)),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))      // fact v3
      AzofWriter.commitDelta(spark, l, "fact", facts(
        ("1", "2024-03-05T00:00:00Z", "d1", 30L)),
        ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))      // fact v4
      AzofWriter.commitDelete(spark, l, "fact", Seq("2"),
        ts("2024-04-05T00:00:00Z"))                                  // fact v5
      AzofWriter.commitDelta(spark, l, "dim", dims(
        ("d2", "2024-02-05T00:00:00Z", "t7"),
        ("d3", "2024-02-05T00:00:00Z", "t1")),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))      // dim v3
      refresh(l, bMax)
      (served(l), oneShot(l))
    }
    val (sBc, oBc) = build("cu-bc", Long.MaxValue)
    assert(sBc == oBc, s"broadcast: $sBc vs $oBc")
    val (sSh, oSh) = build("cu-sh", 0L)
    assert(sSh == oSh, s"shuffle: $sSh vs $oSh")
    assert(sBc == sSh)
  }

  test("a crash between commit and cursor write HEALS from the replay " +
    "guard — the addition arithmetic never double-applies") {
    val l = mkLake("heal")
    AzofWriter.commitBase(spark, l, "dim", dims(
      ("d1", "2024-01-02T00:00:00Z", "t1")))                         // dim v2
    AzofWriter.commitBase(spark, l, "fact", facts(
      ("1", "2024-01-02T00:00:00Z", "d1", 10L)))                     // fact v2
    refresh(l)
    val before = served(l)
    // simulate the crash: reset the cursor sidecar to pre-refresh while
    // the committed delta (and its replay-guard stamp) stay in place
    val dir = AzofTable(spark, l, "jv").tableDir
    val p = new org.apache.hadoop.fs.Path(dir, JoinView.CursorFileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    out.write("""{"factVersion":1,"dimVersion":1}""".getBytes("UTF-8"))
    out.close()
    val r = refresh(l)
    assert(r.noop, "healed cursor sees nothing new")
    assert(served(l) == before, "no double-apply")
    assert(JoinView.readCursor(spark, l, "jv") == ((2L, Seq(2L))),
      "cursor healed from the guard")
  }

  test("viewSchema refuses non-string fks, dim-side aggregates, and " +
    "unknown columns") {
    intercept[IllegalArgumentException] {
      JoinView.viewSchema(
        TableSchema(Seq(ColumnDef("fk", ColumnType.AzInt, false),
          ColumnDef("v", ColumnType.AzInt, false))),
        Seq(dimSchema), jdef)
    }
    intercept[IllegalArgumentException] {
      JoinView.viewSchema(factSchema, Seq(dimSchema),
        JoinViewDef(Seq("tier"), sumCols = Seq("tier"),
          dims = Seq(DimJoin("fk", Seq("tier")))))
    }
    intercept[IllegalArgumentException] {
      JoinView.viewSchema(factSchema, Seq(dimSchema),
        JoinViewDef(Seq("absent"), dims = Seq(DimJoin("fk"))))
    }
  }

  test("multi-dim STAR view: churn on the fact and BOTH dims in one " +
    "catch-up (re-tier on each dim, a dim delete, fact revisions) " +
    "stays join-exact — on both merge-guard shapes") {
    val star = JoinViewDef(Seq("tier", "region"), sumCols = Seq("v"),
      minMaxCols = Seq("v"),
      dims = Seq(DimJoin("fk1", Seq("tier")), DimJoin("fk2", Seq("region"))))
    val fSchema = TableSchema(Seq(
      ColumnDef("fk1", ColumnType.AzString, nullable = false),
      ColumnDef("fk2", ColumnType.AzString, nullable = false),
      ColumnDef("v", ColumnType.AzInt, nullable = false)))
    val d2Schema = TableSchema(Seq(
      ColumnDef("region", ColumnType.AzString, nullable = false)))
    def sFacts(rows: (String, String, String, String, Long)*) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map {
          case (k, t, f1, f2, v) =>
            Row(k, Timestamp.from(ts(t)), f1, f2, v) }),
        fSchema.toStruct)
    def d2s(rows: (String, String, String)*) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (k, t, r) =>
          Row(k, Timestamp.from(ts(t)), r) }),
        d2Schema.toStruct)
    def oneShotStar(l: String) = {
      val f = AzofScan.scan(spark, l, "fact").select("fk1", "fk2", "v")
      val d1 = AzofScan.scan(spark, l, "dim")
        .select(col(TableSchema.KeyName).as("_d1"), col("tier"))
      val d2 = AzofScan.scan(spark, l, "dim2")
        .select(col(TableSchema.KeyName).as("_d2"), col("region"))
      f.join(d1, f("fk1") === d1("_d1")).join(d2, col("fk2") === d2("_d2"))
        .groupBy("tier", "region")
        .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"),
          min(col("v")).as("min_v"), max(col("v")).as("max_v"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
        .sortBy(x => (x._1, x._2)).toSeq
    }
    def servedStar(l: String) =
      JoinView.serve(spark, l, "jvs", star)
        .select("tier", "region", "n_rows", "sum_v", "min_v", "max_v")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
        .sortBy(x => (x._1, x._2)).toSeq
    def build(tag: String, bMax: Long) = {
      val l = Files.createTempDirectory(s"azof-jv-star-$tag").toString
      AzofWriter.createTable(spark, l, "fact", fSchema,
        ts("2024-01-01T00:00:00Z"))
      AzofWriter.createTable(spark, l, "dim", dimSchema,
        ts("2024-01-01T00:00:00Z"))
      AzofWriter.createTable(spark, l, "dim2", d2Schema,
        ts("2024-01-01T00:00:00Z"))
      def go() = JoinView.refresh(spark, l, "fact",
        Seq((l, "dim"), (l, "dim2")), l, "jvs", star,
        broadcastKeyMax = bMax)
      AzofWriter.commitBase(spark, l, "dim", dims(
        ("a1", "2024-01-02T00:00:00Z", "t1"),
        ("a2", "2024-01-02T00:00:00Z", "t2")))
      AzofWriter.commitBase(spark, l, "dim2", d2s(
        ("b1", "2024-01-02T00:00:00Z", "eu"),
        ("b2", "2024-01-02T00:00:00Z", "us")))
      AzofWriter.commitBase(spark, l, "fact", sFacts(
        ("1", "2024-01-02T00:00:00Z", "a1", "b1", 10L),
        ("2", "2024-01-02T00:00:00Z", "a1", "b2", 4L),
        ("3", "2024-01-02T00:00:00Z", "a2", "b1", 7L),
        ("4", "2024-01-02T00:00:00Z", "a2", "b2", 50L)))
      go()
      assert(servedStar(l) == oneShotStar(l), "bootstrap exact")
      // THEN, in ONE un-refreshed window: both dims re-attribute, one
      // dim key deleted, a fact revised across BOTH fks, one inserted
      AzofWriter.commitDelta(spark, l, "dim", dims(
        ("a1", "2024-02-05T00:00:00Z", "t9")),  // re-tier a1
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
      AzofWriter.commitDelta(spark, l, "dim2", d2s(
        ("b2", "2024-02-05T00:00:00Z", "apac")), // re-region b2
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
      AzofWriter.commitDelete(spark, l, "dim2", Seq("b1"),
        ts("2024-03-05T00:00:00Z"))              // b1 facts leave
      AzofWriter.commitDelta(spark, l, "fact", sFacts(
        ("1", "2024-03-05T00:00:00Z", "a2", "b2", 20L),  // moves both fks
        ("5", "2024-03-05T00:00:00Z", "a1", "b2", 1L)),
        ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))
      go()
      (servedStar(l), oneShotStar(l))
    }
    val (sBc, oBc) = build("bc", Long.MaxValue)
    assert(sBc == oBc, s"broadcast: $sBc vs $oBc")
    val (sSh, oSh) = build("sh", 0L)
    assert(sSh == oSh, s"shuffle: $sSh vs $oSh")
    assert(sBc == sSh)
  }

  test("nullable sum + String min/max: nn_ counts make SUM null-skip " +
    "exactly (an all-null group serves NULL), typed extrema merge " +
    "and rescan") {
    val ndef = JoinViewDef(Seq("tier"), sumCols = Seq("v"),
      minMaxCols = Seq("s"), dims = Seq(DimJoin("fk", Seq("tier"))))
    val nSchema = TableSchema(Seq(
      ColumnDef("fk", ColumnType.AzString, nullable = false),
      ColumnDef("v", ColumnType.AzInt, nullable = true),
      ColumnDef("s", ColumnType.AzString, nullable = true)))
    def nFacts(rows: (String, String, String, Any, Any)*) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (k, t, fk, v, s) =>
          Row(k, Timestamp.from(ts(t)), fk, v, s) }),
        nSchema.toStruct)
    val l = Files.createTempDirectory("azof-jv-null").toString
    AzofWriter.createTable(spark, l, "fact", nSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "dim", dimSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "dim", dims(
      ("d1", "2024-01-02T00:00:00Z", "t1"),
      ("d2", "2024-01-02T00:00:00Z", "t2")))
    AzofWriter.commitBase(spark, l, "fact", nFacts(
      ("1", "2024-01-02T00:00:00Z", "d1", 10L, "mango"),
      ("2", "2024-01-02T00:00:00Z", "d1", null, "apple"),
      ("3", "2024-01-02T00:00:00Z", "d2", null, null)))
    def go() = JoinView.refresh(spark, l, "fact", Seq((l, "dim")),
      l, "jvn", ndef)
    go()
    def snap() = JoinView.serve(spark, l, "jvn", ndef)
      .select("tier", "n_rows", "sum_v", "nn_v", "min_s", "max_s")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).sortBy(_._1).toSeq
    assert(snap() == Seq(
      ("t1", 2L, 10L, 1L, "apple", "mango"),
      ("t2", 1L, null, 0L, null, null)),
      "null-skipping sum; all-null group serves NULL; string extrema")
    // a revision flips nullness BOTH ways and shrinks the string max —
    // the loss-rescan path must recompute, not monoid-keep "mango"
    AzofWriter.commitDelta(spark, l, "fact", nFacts(
      ("1", "2024-02-05T00:00:00Z", "d1", null, "kiwi"),
      ("3", "2024-02-05T00:00:00Z", "d2", 5L, "pear")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
    go()
    assert(snap() == Seq(
      ("t1", 2L, null, 0L, "apple", "kiwi"),
      ("t2", 1L, 5L, 1L, "pear", "pear")),
      "null transitions exact in both directions; max rescanned down")
  }

  test("a pre-nn_ view table (old layout) refuses LOUDLY on serve and " +
    "refresh, naming the rebuild remedy; an old-format def sidecar " +
    "refuses in readDef") {
    val l = mkLake("old")
    AzofWriter.commitBase(spark, l, "dim", dims(
      ("d1", "2024-01-02T00:00:00Z", "t1")))
    AzofWriter.commitBase(spark, l, "fact", facts(
      ("1", "2024-01-02T00:00:00Z", "d1", 10L)))
    // hand-build the OLD layout: no nn_v column (what a round-13
    // binary's jv table looks like on disk)
    AzofWriter.createTable(spark, l, "jv_old",
      TableSchema(Seq(
        ColumnDef("tier", ColumnType.AzString, nullable = false),
        ColumnDef("n_rows", ColumnType.AzInt, nullable = false),
        ColumnDef("sum_v", ColumnType.AzInt, nullable = false),
        ColumnDef("min_v", ColumnType.AzInt, nullable = true),
        ColumnDef("max_v", ColumnType.AzInt, nullable = true))),
      ts("2024-01-01T00:00:00Z"))
    val eServe = intercept[IllegalStateException] {
      JoinView.serve(spark, l, "jv_old", jdef)
    }
    assert(eServe.getMessage.contains("rebuil") &&
      eServe.getMessage.contains("jv_old"),
      s"serve names the remedy: ${eServe.getMessage}")
    val eRefresh = intercept[IllegalStateException] {
      JoinView.refresh(spark, l, "fact", Seq((l, "dim")), l, "jv_old",
        jdef)
    }
    assert(eRefresh.getMessage.contains("rebuil"),
      s"refresh names the remedy: ${eRefresh.getMessage}")
    // an OLD-FORMAT def sidecar (pre-format-stamp JSON shape)
    val dir = AzofTable(spark, l, "jv_old").tableDir
    val p = new org.apache.hadoop.fs.Path(dir, JoinView.DefFileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    out.write(("""{"fact_path":"","fact_table":"fact","dim_path":"",""" +
      """"dim_table":"dim","fk_col":"fk","group_cols":["tier"],""" +
      """"sum_cols":["v"],"minmax_cols":[],"dim_cols":["tier"]}""")
      .getBytes("UTF-8"))
    out.close()
    val eDef = intercept[IllegalStateException] {
      JoinView.readDef(spark, l, "jv_old")
    }
    assert(eDef.getMessage.contains("rebuil"),
      s"readDef names the remedy: ${eDef.getMessage}")
  }

  test("rebuildEpoch after a rollback on either source serves the " +
    "rolled-back join") {
    val l = mkLake("rb")
    AzofWriter.commitBase(spark, l, "dim", dims(
      ("d1", "2024-01-02T00:00:00Z", "t1")))                         // dim v2
    AzofWriter.commitBase(spark, l, "fact", facts(
      ("1", "2024-01-02T00:00:00Z", "d1", 10L)))                     // fact v2
    refresh(l)
    AzofWriter.commitDelta(spark, l, "fact", facts(
      ("2", "2024-02-05T00:00:00Z", "d1", 5L)),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // fact v3
    refresh(l)
    AzofWriter.rollback(spark, l, "fact", 2L)                        // fact v4
    // the feed is blind to rollbacks (documented): the refresh no-ops
    // and the view stays stale until the epoch rebuild
    refresh(l)
    assert(served(l) == Seq(("t1", 2L, 15L, 5L, 10L)),
      "stale until rebuilt — the documented rollback contract")
    JoinView.rebuildEpoch(spark, l, "fact", Seq((l, "dim")), l, "jv_e2",
      jdef, ts("2024-06-01T00:00:00Z"))
    assert(served(l, "jv_e2") == oneShot(l))
    assert(served(l, "jv_e2") == Seq(("t1", 1L, 10L, 10L, 10L)))
  }

  // ---- distinct support (COUNT(DISTINCT <fact col>) refcounts) ----

  private val ddef = JoinViewDef(Seq("tier"), sumCols = Seq("v"),
    dims = Seq(DimJoin("fk", Seq("tier"))), distinctCols = Seq("a"))
  private val dFactSchema = TableSchema(Seq(
    ColumnDef("fk", ColumnType.AzString, nullable = false),
    ColumnDef("v", ColumnType.AzInt, nullable = false),
    ColumnDef("a", ColumnType.AzString, nullable = true)))

  private def dFacts(rows: (String, String, String, Long, Any)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, fk, v, a) =>
        Row(k, Timestamp.from(ts(t)), fk, v, a) }),
      dFactSchema.toStruct)

  private def dvServed(l: String, tbl: String = "jvd") =
    JoinView.countDistinct(spark, l, tbl, ddef, "a", Seq("tier"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).toSeq

  private def dvOneShot(l: String) = {
    val f = AzofScan.scan(spark, l, "fact").select("fk", "a")
    val d = AzofScan.scan(spark, l, "dim")
      .select(col(TableSchema.KeyName).as("_dk"), col("tier"))
    f.join(d, f("fk") === d("_dk"))
      .groupBy("tier").agg(count_distinct(col("a")).as("dv"))
      .where(col("dv") > 0L) // the support serve has no all-null groups
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).toSeq
  }

  test("distinct support: COUNT(DISTINCT fact col) stays exact under " +
    "fact churn, null transitions, a dim re-tier that MOVES pairs " +
    "across groups, deletes on both sides, and the epoch rebuild — " +
    "on both guard shapes") {
    def build(tag: String, bMax: Long): (Seq[(String, Long)], String) = {
      val l = Files.createTempDirectory(s"azof-jv-dv-$tag").toString
      AzofWriter.createTable(spark, l, "fact", dFactSchema,
        ts("2024-01-01T00:00:00Z"))
      AzofWriter.createTable(spark, l, "dim", dimSchema,
        ts("2024-01-01T00:00:00Z"))
      def go() = JoinView.refresh(spark, l, "fact", Seq((l, "dim")),
        l, "jvd", ddef, broadcastKeyMax = bMax)
      AzofWriter.commitBase(spark, l, "dim", dims(
        ("d1", "2024-01-02T00:00:00Z", "t1"),
        ("d2", "2024-01-02T00:00:00Z", "t2")))
      AzofWriter.commitBase(spark, l, "fact", dFacts(
        ("1", "2024-01-02T00:00:00Z", "d1", 10L, "x"),
        ("2", "2024-01-02T00:00:00Z", "d1", 4L, "x"),
        ("3", "2024-01-02T00:00:00Z", "d2", 7L, "y"),
        ("4", "2024-01-02T00:00:00Z", "d1", 5L, null)))
      go()
      assert(dvServed(l) == dvOneShot(l), s"$tag bootstrap")
      assert(dvServed(l) == Seq(("t1", 1L), ("t2", 1L)),
        "duplicate 'x' counts once; the null contributes nothing")
      // value move + null→value in one batch
      AzofWriter.commitDelta(spark, l, "fact", dFacts(
        ("2", "2024-02-05T00:00:00Z", "d1", 4L, "z"),
        ("4", "2024-02-05T00:00:00Z", "d1", 5L, "x")),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
      go()
      assert(dvServed(l) == dvOneShot(l), s"$tag value moves")
      assert(dvServed(l) == Seq(("t1", 2L), ("t2", 1L)))
      // a dim re-tier moves every d1 pair to a NEW group tuple
      AzofWriter.commitDelta(spark, l, "dim", dims(
        ("d1", "2024-03-05T00:00:00Z", "t9")),
        ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))
      go()
      assert(dvServed(l) == dvOneShot(l), s"$tag dim re-tier")
      assert(dvServed(l) == Seq(("t2", 1L), ("t9", 2L)),
        "pairs moved groups with their facts")
      // fact delete decrements 'x' (ref 2→1 stays); dim delete drops t2
      AzofWriter.commitDelete(spark, l, "fact", Seq("1"),
        ts("2024-04-05T00:00:00Z"))
      AzofWriter.commitDelete(spark, l, "dim", Seq("d2"),
        ts("2024-04-05T00:00:00Z"))
      go()
      assert(dvServed(l) == dvOneShot(l), s"$tag deletes")
      assert(dvServed(l) == Seq(("t9", 2L)),
        "'x' survives via fact 4; d2's pair left with its dim")
      // global grain off the same pairs
      val g = JoinView.countDistinct(spark, l, "jvd", ddef, "a", Nil)
        .collect()(0).getLong(0)
      assert(g == 2L, "global distinct over live pairs")
      // exact star value histogram incl. the NULL bucket ≡ one-shot
      val hist = JoinView.valueHistogram(spark, l, "jvd", ddef, "a",
        Seq("tier"))
        .collect().map(r => (r.getString(0),
          if (r.isNullAt(1)) null else r.getString(1), r.getLong(2)))
        .sortBy(x => (x._1, String.valueOf(x._2))).toSeq
      val f = AzofScan.scan(spark, l, "fact").select("fk", "a")
      val d = AzofScan.scan(spark, l, "dim")
        .select(col(TableSchema.KeyName).as("_dk"), col("tier"))
      val shot = f.join(d, f("fk") === d("_dk"))
        .groupBy("tier", "a").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2)))
        .sortBy(x => (x._1, String.valueOf(x._2))).toSeq
      assert(hist == shot, s"star histogram incl. NULLs: $hist vs $shot")
      // SUM-WEIGHTED star histogram: pair-grain measure totals ≡ the
      // one-shot `GROUP BY tier, a → sum(v), count(v)` incl. the NULL
      // bucket's sums (maintained through the same dim re-tiers and
      // deletes the refcounts rode)
      val mHist = JoinView.valueHistogram(spark, l, "jvd", ddef, "a",
        Seq("tier"), measures = Seq("v"))
        .collect().map(r => (r.getString(0),
          if (r.isNullAt(1)) null else r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getLong(3), r.getLong(4)))
        .sortBy(x => (x._1, String.valueOf(x._2))).toSeq
      val fm = AzofScan.scan(spark, l, "fact").select("fk", "a", "v")
      val dm = AzofScan.scan(spark, l, "dim")
        .select(col(TableSchema.KeyName).as("_dk"), col("tier"))
      val mShot = fm.join(dm, fm("fk") === dm("_dk"))
        .groupBy("tier", "a")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
          count(col("v")).as("nn"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2),
          if (r.isNullAt(3)) null else r.getLong(3), r.getLong(4)))
        .sortBy(x => (x._1, String.valueOf(x._2))).toSeq
      assert(mHist == mShot,
        s"star measure histogram: $mHist vs $mShot")
      (dvServed(l), l)
    }
    val (bc, lbc) = build("bc", Long.MaxValue)
    val (sh, _) = build("sh", 0L)
    assert(bc == sh, "broadcast and shuffle paths agree")
    // epoch rebuild re-seeds the support table one-shot
    JoinView.rebuildEpoch(spark, lbc, "fact", Seq((lbc, "dim")), lbc,
      "jvd_e2", ddef, ts("2024-06-01T00:00:00Z"))
    assert(dvServed(lbc, "jvd_e2") == dvServed(lbc))
  }

  test("DISTINCT TUPLES over a star: COUNT(DISTINCT a, v) refcounts " +
    "stay exact under fact churn and a dim re-tier that moves pairs " +
    "across groups — exact grain and rollup ≡ one-shot") {
    val tdef = JoinViewDef(Seq("tier"), sumCols = Seq("v"),
      dims = Seq(DimJoin("fk", Seq("tier"))),
      distinctCols = Seq("a"), distinctTuples = Seq(Seq("a", "v")))
    val l = Files.createTempDirectory("azof-jv-tup").toString
    AzofWriter.createTable(spark, l, "fact", dFactSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "dim", dimSchema,
      ts("2024-01-01T00:00:00Z"))
    def go() = JoinView.refresh(spark, l, "fact", Seq((l, "dim")),
      l, "jvt", tdef)
    def dv(groups: Seq[String]) =
      JoinView.countDistinct(spark, l, "jvt", tdef, "a,v", groups)
        .collect().map(r =>
          (if (groups.isEmpty) "" else r.getString(0),
            r.getLong(groups.size)))
        .sortBy(_._1).toSeq
    def oneShot(groups: Seq[String]) = {
      val f = AzofScan.scan(spark, l, "fact").select("fk", "a", "v")
      val d = AzofScan.scan(spark, l, "dim")
        .select(col(TableSchema.KeyName).as("_dk"), col("tier"))
      val j = f.join(d, f("fk") === d("_dk"))
      val agg = count_distinct(col("a"), col("v")).as("dv")
      (if (groups.isEmpty) j.agg(agg)
       else j.groupBy(groups.map(col): _*).agg(agg))
        .where(col("dv") > 0L)
        .collect().map(r =>
          (if (groups.isEmpty) "" else r.getString(0),
            r.getLong(groups.size)))
        .sortBy(_._1).toSeq
    }
    AzofWriter.commitBase(spark, l, "dim", dims(
      ("d1", "2024-01-02T00:00:00Z", "t1"),
      ("d2", "2024-01-02T00:00:00Z", "t2")))
    AzofWriter.commitBase(spark, l, "fact", dFacts(
      ("1", "2024-01-02T00:00:00Z", "d1", 10L, "x"),
      ("2", "2024-01-02T00:00:00Z", "d1", 10L, "x"), // duplicate tuple
      ("3", "2024-01-02T00:00:00Z", "d1", 4L, "x"),  // same a, new v
      ("4", "2024-01-02T00:00:00Z", "d2", 7L, null))) // null a → skipped
    go()
    assert(dv(Seq("tier")) == oneShot(Seq("tier")))
    assert(dv(Seq("tier")) == Seq(("t1", 2L)))
    // a dim re-tier MOVES the tuples' group with their facts
    AzofWriter.commitDelta(spark, l, "dim", dims(
      ("d1", "2024-02-05T00:00:00Z", "t9")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
    go()
    assert(dv(Seq("tier")) == oneShot(Seq("tier")))
    assert(dv(Seq("tier")) == Seq(("t9", 2L)))
    // fact churn: key 3's v moves (4→10 collapses onto (x,10));
    // key 4 gains an author
    AzofWriter.commitDelta(spark, l, "fact", dFacts(
      ("3", "2024-03-05T00:00:00Z", "d1", 10L, "x"),
      ("4", "2024-03-05T00:00:00Z", "d2", 7L, "z")),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))
    go()
    assert(dv(Seq("tier")) == oneShot(Seq("tier")))
    assert(dv(Seq("tier")) == Seq(("t2", 1L), ("t9", 1L)))
    assert(dv(Nil) == oneShot(Nil), "global tuple distinct")
  }

  test("dv-pin TOCTOU closed (star): the gate pins view AND support " +
    "snapshots before its per-table walks — a refresh racing between " +
    "gate and serve still serves the validated instant exactly") {
    val l = Files.createTempDirectory("azof-jv-toctou").toString
    AzofWriter.createTable(spark, l, "fact", dFactSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "dim", dimSchema,
      ts("2024-01-01T00:00:00Z"))
    def go() = JoinView.refresh(spark, l, "fact", Seq((l, "dim")),
      l, "jvd", ddef)
    def histAt(vv: Option[Long], dvv: Option[Long]) =
      JoinView.valueHistogram(spark, l, "jvd", ddef, "a", Seq("tier"),
        vv, dvv)
        .collect().map(r => (r.getString(0),
          if (r.isNullAt(1)) null else r.getString(1), r.getLong(2)))
        .sortBy(x => (x._1, String.valueOf(x._2))).toSeq
    AzofWriter.commitBase(spark, l, "dim", dims(
      ("d1", "2024-01-02T00:00:00Z", "t1")))
    AzofWriter.commitBase(spark, l, "fact", dFacts(
      ("1", "2024-01-02T00:00:00Z", "d1", 10L, "x"),
      ("2", "2024-01-02T00:00:00Z", "d1", 4L, "y"),
      ("3", "2024-01-02T00:00:00Z", "d1", 7L, null)))                // C
    go()
    val pins = JoinView.freshViewVersions(spark, l, "fact",
      Seq((l, "dim")), l, "jvd", None, Seq(None), needDv = true)
    assert(pins.isDefined && pins.get._2.isDefined, "fresh + dv pinned")
    val (vv, dvv) = pins.get
    val histC = histAt(Some(vv), dvv)
    assert(histC ==
      Seq(("t1", null, 1L), ("t1", "x", 1L), ("t1", "y", 1L)))
    // the race: fact churn + refresh land after the gate returned
    AzofWriter.commitDelta(spark, l, "fact", dFacts(
      ("2", "2024-02-05T00:00:00Z", "d1", 4L, null),
      ("4", "2024-02-05T00:00:00Z", "d1", 5L, "x")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // C+1
    go()
    assert(histAt(Some(vv), dvv) == histC,
      "pinned star serve is immune to the racing refresh")
    val histC1 = histAt(None, None)
    assert(histC1 == Seq(("t1", null, 2L), ("t1", "x", 2L)))
    val dvNow = graft.format.AzofTable(spark, l,
      MatView.dvTableName("jvd")).currentVersion.toLong
    val mixed = histAt(Some(vv), Some(dvNow))
    assert(mixed != histC && mixed != histC1,
      s"the mixed-state star serve ($mixed) matches no instant")
    val pins2 = JoinView.freshViewVersions(spark, l, "fact",
      Seq((l, "dim")), l, "jvd", None, Seq(None), needDv = true).get
    assert(histAt(Some(pins2._1), pins2._2) == histC1)
  }

  test("a crash between the view commit and the support commit heals " +
    "as a CATCH-UP leg: the distinct delta lands, the view never " +
    "double-applies, the cursor promotes only after both") {
    val l = Files.createTempDirectory("azof-jv-dv-heal").toString
    AzofWriter.createTable(spark, l, "fact", dFactSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "dim", dimSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "dim", dims(
      ("d1", "2024-01-02T00:00:00Z", "t1")))                         // dim v2
    AzofWriter.commitBase(spark, l, "fact", dFacts(
      ("1", "2024-01-02T00:00:00Z", "d1", 10L, "x"),
      ("2", "2024-01-02T00:00:00Z", "d1", 4L, "x")))                 // fact v2
    JoinView.refresh(spark, l, "fact", Seq((l, "dim")), l, "jvd", ddef)
    // new fact churn the crashed refresh consumed
    AzofWriter.commitDelta(spark, l, "fact", dFacts(
      ("5", "2024-02-05T00:00:00Z", "d1", 2L, "w")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // fact v3
    // manufacture the half-landed state the heal must fix: the VIEW
    // delta committed under the vector's replay guard, the SUPPORT
    // commit missing, the cursor still at the old vector
    val b = 3L * 1000000000L + 2L // encode(fact=3, dims=[2])
    val dir = AzofTable(spark, l, "jvd").tableDir
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val pend = fs.create(
      new org.apache.hadoop.fs.Path(dir, JoinView.PendingFileName), true)
    pend.write(s"""{"batch":$b,"factVersion":3,"dimVersions":[2]}"""
      .getBytes("UTF-8"))
    pend.close()
    val viewStruct = JoinView.viewSchema(dFactSchema,
      Seq(dimSchema), ddef).toStruct
    val crashedRow = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(
        "t1", Timestamp.from(ts("2024-02-06T00:00:00Z")),
        "t1", 3L, 16L, 3L))), // merged t1 totals at fact v3
      viewStruct)
    graft.streaming.AzofSink.commitBatch(l, "jvd", crashedRow, b,
      "join-view#jvd")
    // the next refresh must CATCH UP (support delta for exactly the
    // staged vector), not promote-and-lose, not double-apply
    val r = JoinView.refresh(spark, l, "fact", Seq((l, "dim")), l,
      "jvd", ddef)
    assert(r.noop, "nothing beyond the healed vector")
    assert(JoinView.readCursor(spark, l, "jvd") == ((3L, Seq(2L))))
    val got = JoinView.serve(spark, l, "jvd", ddef)
      .select("tier", "n_rows", "sum_v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("t1", 3L, 16L)), "view not double-applied")
    assert(dvServed(l) == Seq(("t1", 2L)),
      "the support delta ('w') landed through the catch-up leg")
  }

  test("distinct declarations refuse dim attributes, group columns, " +
    "and unknown fact columns") {
    intercept[IllegalArgumentException] {
      JoinViewDef(Seq("tier"), dims = Seq(DimJoin("fk", Seq("tier"))),
        distinctCols = Seq("tier"))
    }
    intercept[IllegalArgumentException] {
      JoinViewDef(Seq("tier", "region"), dims = Seq(
        DimJoin("fk", Seq("tier", "region"))),
        distinctCols = Seq("region"))
    }
    intercept[IllegalArgumentException] {
      JoinView.viewSchema(dFactSchema, Seq(dimSchema),
        JoinViewDef(Seq("tier"), dims = Seq(DimJoin("fk", Seq("tier"))),
          distinctCols = Seq("absent")))
    }
  }

  test("NULLABLE star tuple components: partial-null fact rows pair " +
    "NULL-token-marked and the star histogram reconstructs them; a " +
    "pre-token sidecar refuses refresh AND the direct histogram " +
    "loudly naming jv-rebuild") {
    val nFactSchema = TableSchema(Seq(
      ColumnDef("fk", ColumnType.AzString, nullable = false),
      ColumnDef("cat", ColumnType.AzString, nullable = true),
      ColumnDef("w", ColumnType.AzInt, nullable = true)))
    val njdef = JoinViewDef(Seq("tier"),
      dims = Seq(DimJoin("fk", Seq("tier"))),
      distinctTuples = Seq(Seq("cat", "w")))
    def nFacts(rows: (String, String, Any, Any)*) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (k, fk, c, w) =>
          Row(k, Timestamp.from(ts("2024-01-02T00:00:00Z")), fk,
            c match { case null => null; case x => x },
            w match { case null => null; case x: Long => x }) }),
        nFactSchema.toStruct)
    val l = Files.createTempDirectory("azof-jv-ntup").toString
    AzofWriter.createTable(spark, l, "fact", nFactSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "dim", dimSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "dim", dims(
      ("d1", "2024-01-02T00:00:00Z", "t1")))
    AzofWriter.commitBase(spark, l, "fact", nFacts(
      ("1", "d1", "x", 1L), ("2", "d1", null, 1L),
      ("3", "d1", "x", null)))
    JoinView.refresh(spark, l, "fact", Seq((l, "dim")), l, "njv", njdef)
    val S = "\u0001"; val N = "\u0002"
    val hist = JoinView.valueHistogram(spark, l, "njv", njdef,
      "cat,w", Nil).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(hist == Seq(
      (s"x${S}1", 1L), (s"$N${S}1", 1L), (s"x$S$N", 1L)).sortBy(_._1),
      hist.toString)
    assert(JoinView.countDistinct(spark, l, "njv", njdef, "cat,w", Nil)
      .collect()(0).getLong(0) == 1L, "any-null rows skipped")
    // pre-token sidecar: refresh + direct histogram refuse loudly —
    // on a SECOND view tampered before any refresh reads its stamp
    // (defFormat caches positive stamps, the defs-immutable contract)
    JoinView.create(spark, l, "fact", Seq((l, "dim")), l, "njv2", njdef)
    val defHP = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(l, "njv2"), JoinView.DefFileName)
    val dfs = defHP.getFileSystem(spark.sessionState.newHadoopConf())
    val oldJson = {
      val in = dfs.open(defHP)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    val out = dfs.create(defHP, true)
    try out.write(oldJson.replace(
      "\"format\":" + JoinView.FormatVersion, "\"format\":2")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val e = intercept[IllegalStateException] {
      JoinView.refresh(spark, l, "fact", Seq((l, "dim")), l, "njv2",
        njdef); ()
    }
    assert(e.getMessage.contains("jv-rebuild") &&
      e.getMessage.contains("NULLABLE"), e.getMessage)
    val e2 = intercept[IllegalStateException] {
      JoinView.valueHistogram(spark, l, "njv2", njdef, "cat,w", Nil)
        .collect()
    }
    assert(e2.getMessage.contains("jv-rebuild"), e2.getMessage)
  }

  // ---- SNOWFLAKE (one-hop dim-of-dim) chains ----

  private val dimSnowSchema = TableSchema(Seq(
    ColumnDef("sfk", ColumnType.AzString, nullable = false),
    ColumnDef("tier", ColumnType.AzString, nullable = false)))
  private val subSchema = TableSchema(Seq(
    ColumnDef("region", ColumnType.AzString, nullable = false)))
  private val snowDef = JoinViewDef(Seq("tier", "region"),
    sumCols = Seq("v"), minMaxCols = Seq("v"),
    dims = Seq(DimJoin("fk", Seq("tier"),
      subs = Seq(DimJoin("sfk", Seq("region"))))))

  private def snowDims(rows: (String, String, String, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, sfk, tier) =>
        Row(k, Timestamp.from(ts(t)), sfk, tier) }),
      dimSnowSchema.toStruct)

  private def subs(rows: (String, String, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, r) =>
        Row(k, Timestamp.from(ts(t)), r) }),
      subSchema.toStruct)

  private def snowServed(l: String) =
    JoinView.serve(spark, l, "sjv", snowDef)
      .select("tier", "region", "n_rows", "sum_v", "min_v", "max_v")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(x => (x._1, x._2)).toSeq

  private def snowOneShot(l: String) = {
    val f = AzofScan.scan(spark, l, "fact").select("fk", "v")
    val d = AzofScan.scan(spark, l, "dim")
      .select(col(TableSchema.KeyName).as("_dk"), col("sfk"), col("tier"))
    val s = AzofScan.scan(spark, l, "sub")
      .select(col(TableSchema.KeyName).as("_sk"), col("region"))
    f.join(d, f("fk") === d("_dk")).join(s, col("sfk") === s("_sk"))
      .groupBy("tier", "region")
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(x => (x._1, x._2)).toSeq
  }

  private def snowScript(bMax: Long): Unit = {
    val l = Files.createTempDirectory("azof-jv-snow").toString
    AzofWriter.createTable(spark, l, "fact", factSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "dim", dimSnowSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "sub", subSchema,
      ts("2024-01-01T00:00:00Z"))
    def rf() = JoinView.refresh(spark, l, "fact",
      Seq((l, "dim"), (l, "sub")), l, "sjv", snowDef,
      broadcastKeyMax = bMax)
    AzofWriter.commitBase(spark, l, "sub", subs(
      ("s1", "2024-01-02T00:00:00Z", "r1"),
      ("s2", "2024-01-02T00:00:00Z", "r2")))                         // sub v2
    AzofWriter.commitBase(spark, l, "dim", snowDims(
      ("d1", "2024-01-02T00:00:00Z", "s1", "t1"),
      ("d2", "2024-01-02T00:00:00Z", "s2", "t2"),
      ("d3", "2024-01-02T00:00:00Z", "sX", "t1")))   // dangling sub fk
    AzofWriter.commitBase(spark, l, "fact", facts(
      ("1", "2024-01-02T00:00:00Z", "d1", 10L),
      ("2", "2024-01-02T00:00:00Z", "d1", 4L),
      ("3", "2024-01-02T00:00:00Z", "d2", 7L),
      ("4", "2024-01-02T00:00:00Z", "d3", 99L)))                     // fact v2
    val r1 = rf()
    assert(!r1.noop && snowServed(l) == snowOneShot(l))
    assert(snowServed(l) == Seq(("t1", "r1", 2L, 14L, 4L, 10L),
      ("t2", "r2", 1L, 7L, 7L, 7L)),
      "a dim with a dangling sub fk contributes nothing: " +
        snowServed(l))
    // SUB-ONLY churn: s1 re-regions r1→r9 (facts move groups TWO hops
    // away with no dim/fact churn) and sX appears (adopting d3's fact)
    AzofWriter.commitDelta(spark, l, "sub", subs(
      ("s1", "2024-02-05T00:00:00Z", "r9"),
      ("sX", "2024-02-05T00:00:00Z", "r2")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // sub v3
    rf()
    assert(snowServed(l) == snowOneShot(l))
    assert(snowServed(l) == Seq(("t1", "r2", 1L, 99L, 99L, 99L),
      ("t1", "r9", 2L, 14L, 4L, 10L), ("t2", "r2", 1L, 7L, 7L, 7L)),
      snowServed(l).toString)
    // DIM churn: d1 re-points its sub fk s1→s2 (region moves via the
    // dim edit) and d2 re-tiers t2→t9
    AzofWriter.commitDelta(spark, l, "dim", snowDims(
      ("d1", "2024-03-05T00:00:00Z", "s2", "t1"),
      ("d2", "2024-03-05T00:00:00Z", "s2", "t9")),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))        // dim v3
    rf()
    assert(snowServed(l) == snowOneShot(l))
    // FACT churn composes: a revision moves d1→d2 and a delete
    AzofWriter.commitDelta(spark, l, "fact", facts(
      ("1", "2024-04-05T00:00:00Z", "d2", 11L)),
      ts("2024-04-01T00:00:00Z"), ts("2024-05-01T00:00:00Z"))        // fact v3
    AzofWriter.commitDelete(spark, l, "fact", Seq("3"),
      ts("2024-05-05T00:00:00Z"))                                    // fact v4
    rf()
    assert(snowServed(l) == snowOneShot(l))
    // SUB delete drops every fact two hops above it (inner chain)
    AzofWriter.commitDelete(spark, l, "sub", Seq("sX"),
      ts("2024-06-05T00:00:00Z"))                                    // sub v4
    rf()
    assert(snowServed(l) == snowOneShot(l))
    assert(rf().noop, "idle snowflake refresh must be a noop")
  }

  test("SNOWFLAKE chain (fact ⋈ dim ⋈ sub): serve ≡ one-shot under " +
    "sub-only re-region/insert, dim sub-fk re-point + re-tier, fact " +
    "churn, and a sub delete — broadcast-guard shape") {
    snowScript(bMax = Long.MaxValue)
  }

  test("SNOWFLAKE chain: the same script on the LARGE-churn guard " +
    "shape (semi-join lookups, no key collects)") {
    snowScript(bMax = 0L)
  }

  test("SNOWFLAKE def round-trips through the sidecar; a subs-bearing " +
    "sidecar hand-downgraded below the snowflake stamp refuses the " +
    "refresh loudly naming jv-rebuild") {
    val l = Files.createTempDirectory("azof-jv-snowfmt").toString
    AzofWriter.createTable(spark, l, "fact", factSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "dim", dimSnowSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "sub", subSchema,
      ts("2024-01-01T00:00:00Z"))
    JoinView.create(spark, l, "fact", Seq((l, "dim"), (l, "sub")),
      l, "sjv", snowDef)
    val read = JoinView.readDef(spark, l, "sjv")
    assert(read.exists { case (_, _, locs, jd) =>
      locs == Seq((l, "dim"), (l, "sub")) && jd == snowDef },
      read.toString)
    val defHP = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(l, "sjv"), JoinView.DefFileName)
    val dfs = defHP.getFileSystem(spark.sessionState.newHadoopConf())
    val oldJson = {
      val in = dfs.open(defHP)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    val out = dfs.create(defHP, true)
    try out.write(oldJson.replace(
      "\"format\":" + JoinView.FormatVersion, "\"format\":4")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    MatView.invalidateDefFormat(l, "sjv")
    val e = intercept[IllegalStateException] {
      JoinView.refresh(spark, l, "fact", Seq((l, "dim"), (l, "sub")),
        l, "sjv", snowDef); ()
    }
    assert(e.getMessage.contains("jv-rebuild") &&
      e.getMessage.contains("snowflake"), e.getMessage)
  }
}
