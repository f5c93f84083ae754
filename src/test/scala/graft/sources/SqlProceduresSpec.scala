package graft.sources

import graft.TestSpark
import graft.format._
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** SQL maintenance procedures ([[AzofProcedures]]) through Spark 4's
  * native `ProcedureCatalog`: `CALL cat.system.{compact, vacuum, purge,
  * dedup_apply}` delegate to the same library implementations the CLI
  * uses and return one summary row each.
  */
class SqlProceduresSpec extends AnyFunSuite {
  private lazy val lake = Files.createTempDirectory("azof-proc").toString
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.proc", classOf[AzofCatalog].getName)
    s.conf.set("spark.sql.catalog.proc.path", lake)
    s
  }

  private def ts(s: String) = Instant.parse(s)
  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  private def df(rows: (String, String, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, v) =>
        Row(k, Timestamp.from(ts(t)), v) }),
      schema.toStruct)

  private def mk(table: String, rows: (String, String, String)*): Unit = {
    AzofWriter.createTable(spark, lake, table, schema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitDelta(spark, lake, table, df(rows: _*),
      ts(rows.map(_._2).min), ts(rows.map(_._2).max))
  }

  test("CALL system.compact with named args (table needs backquotes)") {
    mk("c1",
      ("1", "2024-01-05T00:00:00Z", "a"),
      ("2", "2024-01-06T00:00:00Z", "b"))
    AzofWriter.commitDelta(spark, lake, "c1",
      df(("1", "2024-02-05T00:00:00Z", "a2")),
      ts("2024-02-05T00:00:00Z"), ts("2024-02-05T00:00:00Z"))
    val r = spark.sql(
      "CALL proc.system.compact(`table` => 'c1', " +
        "at => '2024-06-01T00:00:00Z', by_key => true)").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(4L)) // create+2 deltas+compact
    // the compacted view is intact
    val got = spark.sql("SELECT key, value FROM proc.c1").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(got == Seq("1" -> "a2", "2" -> "b"))
  }

  test("CALL system.compact(branch => ...) folds a staged lineage; " +
    "main untouched until CALL fast_forward publishes it") {
    mk("cb1", ("1", "2024-01-05T00:00:00Z", "a"))             // v1+v2
    spark.sql("CALL proc.system.create_branch(`table` => 'cb1', " +
      "name => 'stage')")
    (1 to 3).foreach { i =>
      AzofWriter.commitDelta(spark, lake, "cb1",
        df((s"k$i", f"2024-02-0${i}T00:00:00Z", s"v$i")),
        ts(f"2024-02-0${i}T00:00:00Z"), ts(f"2024-02-0${i}T00:00:00Z"),
        branch = Some("stage"))                               // s3..s5
    }
    val r = spark.sql(
      "CALL proc.system.compact(`table` => 'cb1', " +
        "at => '2024-06-01T00:00:00Z', branch => 'stage')").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(6L),
      "summary reports the branch head, not main")
    assert(AzofTable(spark, lake, "cb1").currentVersion == "2",
      "main pointer untouched by the branch fold")
    assert(spark.sql("SELECT key FROM proc.cb1").collect().length == 1)
    spark.sql("CALL proc.system.fast_forward(`table` => 'cb1', " +
      "branch => 'stage')")
    val got = spark.sql("SELECT key, value FROM proc.cb1").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(got == Seq("1" -> "a", "k1" -> "v1", "k2" -> "v2", "k3" -> "v3"))
    // the published Current resolves to the folded file set: one merged
    // base, not the three staged deltas
    assert(AzofTable(spark, lake, "cb1").currentSnapshot
      .dataFiles(graft.format.AsOf.Current).size == 1)
  }

  test("CALL system.publish_preview sizes the staged change set from SQL") {
    mk("pp1", ("1", "2024-01-05T00:00:00Z", "a"))             // v1+v2
    spark.sql("CALL proc.system.create_branch(`table` => 'pp1', " +
      "name => 'stage')")
    AzofWriter.commitDelta(spark, lake, "pp1",
      df(("k1", "2024-02-01T00:00:00Z", "v1"),
        ("k2", "2024-02-02T00:00:00Z", "v2")),
      ts("2024-02-01T00:00:00Z"), ts("2024-02-02T00:00:00Z"),
      branch = Some("stage"))                                 // s3
    val marks = df(("1", "2024-03-01T00:00:00Z", "x"))
      .withColumn("value",
        org.apache.spark.sql.functions.lit(null).cast("string"))
      .withColumn(TableSchema.DeletedName,
        org.apache.spark.sql.functions.lit(true))
    AzofWriter.commitDelta(spark, lake, "pp1", marks,
      ts("2024-03-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"),
      branch = Some("stage"))                                 // s4
    val r = spark.sql("CALL proc.system.publish_preview(" +
      "`table` => 'pp1', branch => 'stage')").collect()(0)
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ("stage", 2L, 1L, 2L),
      "2 staged upserts, 1 staged delete, across 2 staged commits")
  }

  test("CALL system.lm_refresh maintains the bigram stats from SQL") {
    val txtSchema = TableSchema(Seq(
      ColumnDef("text", ColumnType.AzString, nullable = false)))
    AzofWriter.createTable(spark, lake, "lmsrc", txtSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "lmsrc",
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a b a b"),
          Row("2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a b c"))),
        txtSchema.toStruct))
    val r = spark.sql("CALL proc.system.lm_refresh(`table` => 'lmsrc', " +
      s"index_path => '$lake', index_table => 'lm_proc')").collect()
    assert(r.length == 1 && r(0).getLong(0) >= 2L,
      "stats table committed at least its first delta")
    val ab = graft.operators.AzofScan.scan(spark, lake, "lm_proc")
      .where(org.apache.spark.sql.functions.col("key") === "a b")
      .select("cnt").collect().map(_.getLong(0)).toSeq
    assert(ab == Seq(3L), "'a b' counted across both docs")
  }

  test("CALL system.mv_refresh maintains a materialized view from SQL") {
    val mvSchema = TableSchema(Seq(
      ColumnDef("grp", ColumnType.AzString, nullable = false),
      ColumnDef("v", ColumnType.AzInt, nullable = false)))
    AzofWriter.createTable(spark, lake, "mvsrc", mvSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "mvsrc",
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a", 10L),
          Row("2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a", 4L),
          Row("3", Timestamp.from(ts("2024-01-02T00:00:00Z")), "b", 7L))),
        mvSchema.toStruct))
    val r = spark.sql("CALL proc.system.mv_refresh(`table` => 'mvsrc', " +
      s"index_path => '$lake', index_table => 'mv_proc', " +
      "group_cols => 'grp', sum_cols => 'v', minmax_cols => 'v')")
      .collect()
    assert(r.length == 1 && r(0).getLong(0) >= 2L,
      "view table committed at least its first delta")
    val vd = ViewDef(Seq("grp"), sumCols = Seq("v"), minMaxCols = Seq("v"))
    // Select columns BY NAME: serve's layout gained nn_<c> columns in
    // round 13 and positional reads silently misalign on layout changes.
    val got = MatView.serve(spark, lake, "mv_proc", vd)
      .select("grp", "n_rows", "sum_v", "min_v", "max_v")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).sortBy(_._1).toSeq
    assert(got == Seq(("a", 2L, 14L, 4L, 10L), ("b", 1L, 7L, 7L, 7L)))
  }

  test("CALL system.term_refresh maintains the inverted index from SQL") {
    val txtSchema = TableSchema(Seq(
      ColumnDef("text", ColumnType.AzString, nullable = false)))
    AzofWriter.createTable(spark, lake, "tsrc", txtSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "tsrc",
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a b a"),
          Row("2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "b c"))),
        txtSchema.toStruct))
    val r = spark.sql("CALL proc.system.term_refresh(`table` => 'tsrc', " +
      s"index_path => '$lake', index_table => 'tp_proc')").collect()
    assert(r.length == 1 && r(0).getLong(0) >= 2L)
    val hits = TermIndex.search(spark, lake, "tp_proc", Seq("a"))
      .collect().map(x => (x.getString(0), x.getLong(2))).toSeq
    assert(hits == Seq(("1", 2L)), "'a' found in doc 1 with tf 2")
  }

  test("CALL system.jv_refresh maintains a join view from SQL") {
    AzofWriter.createTable(spark, lake, "jvd",
      TableSchema(Seq(
        ColumnDef("tier", ColumnType.AzString, nullable = false))),
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, lake, "jvf",
      TableSchema(Seq(
        ColumnDef("fk", ColumnType.AzString, nullable = false),
        ColumnDef("v", ColumnType.AzInt, nullable = false))),
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "jvd",
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row("d1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "t1"))),
        TableSchema(Seq(ColumnDef("tier", ColumnType.AzString,
          nullable = false))).toStruct))
    AzofWriter.commitBase(spark, lake, "jvf",
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "d1", 10L),
          Row("2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "d1", 4L))),
        TableSchema(Seq(
          ColumnDef("fk", ColumnType.AzString, nullable = false),
          ColumnDef("v", ColumnType.AzInt, nullable = false))).toStruct))
    val r = spark.sql("CALL proc.system.jv_refresh(`table` => 'jvf', " +
      s"dim_table => 'jvd', index_path => '$lake', " +
      "group_cols => 'tier', fk_col => 'fk', dim_cols => 'tier', " +
      "sum_cols => 'v', index_table => 'jv_proc')").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (2L, 2L, 1L))
    val jd = JoinViewDef(Seq("tier"), sumCols = Seq("v"),
      dims = Seq(DimJoin("fk", Seq("tier"))))
    val got = JoinView.serve(spark, lake, "jv_proc", jd)
      .select("tier", "n_rows", "sum_v") // BY NAME — layouts change
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
      .toSeq
    assert(got == Seq(("t1", 2L, 14L)))
  }

  test("CALL system.jv_refresh builds a STAR view with distinct + " +
    "derived groups from SQL (comma-list dims, ';' dim-col groups)") {
    AzofWriter.createTable(spark, lake, "sfd1",
      TableSchema(Seq(ColumnDef("tier", ColumnType.AzString,
        nullable = false))), ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, lake, "sfd2",
      TableSchema(Seq(ColumnDef("region", ColumnType.AzString,
        nullable = false))), ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, lake, "sff",
      TableSchema(Seq(
        ColumnDef("f1", ColumnType.AzString, nullable = false),
        ColumnDef("f2", ColumnType.AzString, nullable = false),
        ColumnDef("t", ColumnType.AzDateTime, nullable = false),
        ColumnDef("v", ColumnType.AzInt, nullable = false),
        ColumnDef("a", ColumnType.AzString, nullable = true))),
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "sfd1",
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row("d1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "t1"))),
        TableSchema(Seq(ColumnDef("tier", ColumnType.AzString,
          nullable = false))).toStruct))
    AzofWriter.commitBase(spark, lake, "sfd2",
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row("e1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "eu"))),
        TableSchema(Seq(ColumnDef("region", ColumnType.AzString,
          nullable = false))).toStruct))
    AzofWriter.commitBase(spark, lake, "sff",
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "d1", "e1",
          Timestamp.from(ts("2024-03-01T06:00:00Z")), 10L, "x"),
        Row("2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "d1", "e1",
          Timestamp.from(ts("2024-03-02T01:00:00Z")), 4L, "x"))),
        TableSchema(Seq(
          ColumnDef("f1", ColumnType.AzString, nullable = false),
          ColumnDef("f2", ColumnType.AzString, nullable = false),
          ColumnDef("t", ColumnType.AzDateTime, nullable = false),
          ColumnDef("v", ColumnType.AzInt, nullable = false),
          ColumnDef("a", ColumnType.AzString, nullable = true))).toStruct))
    val r = spark.sql("CALL proc.system.jv_refresh(`table` => 'sff', " +
      s"dim_table => 'sfd1,sfd2', index_path => '$lake', " +
      "group_cols => 'tier,region,day', fk_col => 'f1,f2', " +
      "dim_cols => 'tier;region', sum_cols => 'v', " +
      "distinct_cols => 'a', distinct_tuples => 'a+v', " +
      "derived => 'day:DateTime=date_trunc(''day'', t)', " +
      "index_table => 'jv_star_proc')").collect()(0)
    assert(r.getLong(2) == 2L, s"two (tier, region, day) groups: $r")
    val jd = JoinViewDef(Seq("tier", "region", "day"), sumCols = Seq("v"),
      dims = Seq(DimJoin("f1", Seq("tier")), DimJoin("f2", Seq("region"))),
      distinctCols = Seq("a"), distinctTuples = Seq(Seq("a", "v")),
      derivedGroups = Seq(DerivedGroup("day", "date_trunc('day', t)",
        ColumnType.AzDateTime)))
    val got = JoinView.serve(spark, lake, "jv_star_proc", jd)
      .select("tier", "region", "day", "n_rows", "sum_v")
      .collect().map(x => (x.getString(0), x.getString(1),
        x.getTimestamp(2).toInstant.toString, x.getLong(3), x.getLong(4)))
      .sortBy(_._3).toSeq
    assert(got == Seq(
      ("t1", "eu", "2024-03-01T00:00:00Z", 1L, 10L),
      ("t1", "eu", "2024-03-02T00:00:00Z", 1L, 4L)))
    val dv = JoinView.countDistinct(spark, lake, "jv_star_proc", jd,
      "a", Seq("tier")).collect()(0)
    assert((dv.getString(0), dv.getLong(1)) == ("t1", 1L),
      "duplicate 'x' counts once through the SQL-built support table")
    // the distinct_tuples parameter declared (a, v) pairs too: the
    // two rows carry (x, 10) and (x, 4) — two distinct tuples
    val dvt = JoinView.countDistinct(spark, lake, "jv_star_proc", jd,
      "a,v", Seq("tier")).collect()(0)
    assert((dvt.getString(0), dvt.getLong(1)) == ("t1", 2L),
      "tuple support built through the SQL procedure parameter")
  }

  test("CALL system.vacuum dry-run reports, wet run deletes") {
    mk("v1", ("1", "2024-01-05T00:00:00Z", "a"))
    (1 to 3).foreach { i =>
      AzofWriter.commitDelta(spark, lake, "v1",
        df(("1", s"2024-02-0${i}T00:00:00Z", s"a$i")),
        ts(s"2024-02-0${i}T00:00:00Z"), ts(s"2024-02-0${i}T00:00:00Z"))
    }
    val dry = spark.sql(
      "CALL proc.system.vacuum(`table` => 'v1', keep => 1, " +
        "min_age_hours => 0, dry_run => true)").collect()(0)
    assert(dry.getLong(1) > 0, s"dry run should report snapshots: $dry")
    val before = AzofTable(spark, lake, "v1").currentVersion
    val wet = spark.sql(
      "CALL proc.system.vacuum(`table` => 'v1', keep => 1, " +
        "min_age_hours => 0)").collect()(0)
    assert(wet.getLong(1) == dry.getLong(1))
    // table still reads after the vacuum
    assert(AzofTable(spark, lake, "v1").currentVersion == before)
    assert(spark.sql("SELECT value FROM proc.v1").collect()
      .map(_.getString(0)).toSeq == Seq("a3"))
  }

  test("CALL system.purge erases settled deletes physically") {
    mk("p1",
      ("1", "2024-01-05T00:00:00Z", "a"),
      ("2", "2024-01-06T00:00:00Z", "b"))
    AzofWriter.commitDelete(spark, lake, "p1", Seq("1"),
      ts("2024-03-01T00:00:00Z"))
    val r = spark.sql(
      "CALL proc.system.purge(`table` => 'p1', " +
        "before => '2024-06-01T00:00:00Z')").collect()(0)
    assert(r.getLong(0) == 1L, s"one key purged: $r")
    // the key is gone from every as-of
    assert(spark.sql("SELECT key FROM proc.p1 TIMESTAMP AS OF " +
      "'2024-02-01T00:00:00Z'").collect().map(_.getString(0)).toSeq ==
      Seq("2"))
  }

  test("CALL dedup_ingest + dedup_apply run the whole pipeline from SQL") {
    val textSchema = TableSchema(Seq(
      ColumnDef("text", ColumnType.AzString, nullable = false)))
    AzofWriter.createTable(spark, lake, "corpus", textSchema,
      ts("2024-01-01T00:00:00Z"))
    val fam = (1 to 7).map(i => s"w$i")
    AzofWriter.commitBase(spark, lake, "corpus",
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")),
            (fam :+ "alpha").mkString(" ")),
          Row("2", Timestamp.from(ts("2024-01-02T00:00:00Z")),
            (fam :+ "beta").mkString(" ")),
          Row("9", Timestamp.from(ts("2024-01-02T00:00:00Z")),
            "entirely different text about something else"))),
        textSchema.toStruct))
    DedupFlow.create(spark, lake)

    val ing = spark.sql(
      "CALL proc.system.dedup_ingest(`table` => 'corpus', " +
        s"index_path => '$lake')").collect()(0)
    assert(ing.getAs[Long]("verified") >= 1, s"near-dup pair verifies: $ing")
    val app = spark.sql(
      "CALL proc.system.dedup_apply(`table` => 'corpus', " +
        s"index_path => '$lake')").collect()(0)
    assert(app.getLong(0) == 1L, s"one near-dup drops: $app")
    assert(spark.sql("SELECT key FROM proc.corpus").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("1", "9"))
  }

  test("CALL sem_refresh verdicts the commit feed against the frozen model") {
    val vecSchema = TableSchema(Seq(
      ColumnDef("vec", ColumnType.AzString, nullable = false)))
    def vrows(ids: Seq[Long]) = spark.createDataFrame(
      spark.sparkContext.parallelize(ids.map { i =>
        val v = if (i < 10) Array(1.0, 0.0) else Array(0.0, 1.0)
        Row(i.toString, Timestamp.from(ts("2024-01-02T00:00:00Z")),
          v.mkString("[", ",", "]"))
      }), vecSchema.toStruct)
    AzofWriter.createTable(spark, lake, "emb", vecSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "emb", vrows(Seq(1L, 2L, 30L)))
    SemDedupIndex.create(spark, lake, "emb", "vec", lake, "sem",
      k = 2, threshold = 0.9)

    val r = spark.sql(
      "CALL proc.system.sem_refresh(`table` => 'emb', " +
        s"index_path => '$lake')").collect()(0)
    assert(r.getAs[Long]("docs") == 3L, s"three docs verdicted: $r")
    val verdicts = SemDedupIndex.verdicts(spark, lake, "sem")
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(verdicts == Map(1L -> true, 2L -> false, 30L -> true),
      s"doc 2 drops to its same-direction lower id: $verdicts")
  }

  test("CALL dedup_rebuild re-clusters into a fresh epoch table from SQL") {
    val textSchema = TableSchema(Seq(
      ColumnDef("text", ColumnType.AzString, nullable = false)))
    AzofWriter.createTable(spark, lake, "corpus2", textSchema,
      ts("2024-01-01T00:00:00Z"))
    val fam = (1 to 7).map(i => s"x$i")
    AzofWriter.commitBase(spark, lake, "corpus2",
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")),
            (fam :+ "alpha").mkString(" ")),
          Row("2", Timestamp.from(ts("2024-01-02T00:00:00Z")),
            (fam :+ "beta").mkString(" ")))),
        textSchema.toStruct))
    val idx = s"$lake/idx2"
    DedupFlow.create(spark, idx)
    spark.sql("CALL proc.system.dedup_ingest(`table` => 'corpus2', " +
      s"index_path => '$idx')").collect()

    val r = spark.sql(
      "CALL proc.system.dedup_rebuild(`table` => 'corpus2', " +
        s"index_path => '$idx')").collect()(0)
    assert(r.getString(0) == "components_next" &&
      r.getAs[Long]("labeled_docs") == 2L, s"both docs labeled: $r")
    // the fresh epoch serves survivors exactly like the original
    val surv = DedupFlow.survivors(spark, lake, "corpus2", idx,
      ccTable = "components_next").collect().map(_.getLong(0)).toSeq
    assert(surv == Seq(1L), s"min-id canonical survives: $surv")
    // refusing to clobber an existing epoch is loud, from SQL too
    val e = intercept[Exception] {
      spark.sql("CALL proc.system.dedup_rebuild(`table` => 'corpus2', " +
        s"index_path => '$idx')").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("already exists")))
  }

  test("CALL sem_rebuild freezes a new model into a fresh verdict table") {
    val vecSchema = TableSchema(Seq(
      ColumnDef("vec", ColumnType.AzString, nullable = false)))
    AzofWriter.createTable(spark, lake, "emb2", vecSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "emb2",
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(1L, 2L, 30L).map { i =>
          val v = if (i < 10) Array(1.0, 0.0) else Array(0.0, 1.0)
          Row(i.toString, Timestamp.from(ts("2024-01-02T00:00:00Z")),
            v.mkString("[", ",", "]"))
        }), vecSchema.toStruct))

    val r = spark.sql(
      "CALL proc.system.sem_rebuild(`table` => 'emb2', " +
        s"index_path => '$lake', new_index_table => 'sem2', " +
        "k => 2, threshold => 0.9)").collect()(0)
    assert(r.getString(0) == "sem2" && r.getAs[Long]("docs") == 3L, s"$r")
    val verdicts = SemDedupIndex.verdicts(spark, lake, "sem2")
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(verdicts == Map(1L -> true, 2L -> false, 30L -> true),
      s"doc 2 drops to its same-direction lower id: $verdicts")
  }

  test("CALL system.analyze restamps stat-less files metadata-only") {
    mk("an1",
      ("1", "2024-01-05T00:00:00Z", "a"),
      ("2", "2024-01-06T00:00:00Z", "b"))
    val t = AzofTable(spark, lake, "an1")
    def strip(s: Segment): Segment = s.copy(
      fileStats = None, delta = s.delta.map(_.copy(stats = None)),
      segments = s.segments.map(strip))
    val nextV = t.currentVersion.toLong + 1
    AzofWriter.writeSnapshot(spark, t.tableDir.toString, nextV.toString,
      t.currentSnapshot.copy(
        segments = t.currentSnapshot.segments.map(strip)))
    AzofWriter.writeVersion(spark, t.tableDir.toString, nextV.toString)

    val r = spark.sql("CALL proc.system.analyze(`table` => 'an1')")
      .collect()(0)
    assert(r.getLong(0) == 1L && r.getLong(2) == nextV + 1, s"$r")
    assert(AzofTable(spark, lake, "an1").currentSnapshot
      .segments.head.delta.head.stats.nonEmpty)
    // idempotent second call returns a NULL version (no commit)
    val again = spark.sql("CALL proc.system.analyze(`table` => 'an1')")
      .collect()(0)
    assert(again.getLong(0) == 0L && again.isNullAt(2), s"$again")
  }

  test("CALL contain_refresh maintains the containment index from SQL") {
    val textSchema = TableSchema(Seq(
      ColumnDef("text", ColumnType.AzString, nullable = false)))
    AzofWriter.createTable(spark, lake, "corpus3", textSchema,
      ts("2024-01-01T00:00:00Z"))
    val base = (1 to 12).map(w => s"c$w").mkString(" ")
    AzofWriter.commitBase(spark, lake, "corpus3",
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), base),
          Row("5", Timestamp.from(ts("2024-01-02T00:00:00Z")),
            base + " extra tail words here now six"))),
        textSchema.toStruct))
    val idx = s"$lake/idx3"
    ContainIndex.create(spark, idx)

    val r = spark.sql(
      "CALL proc.system.contain_refresh(`table` => 'corpus3', " +
        s"index_path => '$idx')").collect()(0)
    assert(r.getAs[Long]("verified") == 1L &&
      r.getAs[Long]("upserted") == 1L, s"$r")
    val p = ContainIndex.pairs(spark, idx, "contain_pairs").collect()(0)
    assert(p.getLong(0) == 1L && p.getLong(1) == 5L &&
      p.getDouble(5) == 1.0, s"$p")
  }

  test("CALL shard_refresh mints incremental export slots from SQL") {
    val textSchema = TableSchema(Seq(
      ColumnDef("text", ColumnType.AzString, nullable = false)))
    AzofWriter.createTable(spark, lake, "corpus4", textSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "corpus4",
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq("a", "b", "c").map(k =>
          Row(k, Timestamp.from(ts("2024-01-02T00:00:00Z")), s"t $k"))),
        textSchema.toStruct))
    val idx = s"$lake/idx4"
    ShardMap.create(spark, idx, shardSize = 2L)

    val r = spark.sql(
      "CALL proc.system.shard_refresh(`table` => 'corpus4', " +
        s"index_path => '$idx')").collect()(0)
    assert(r.getAs[Long]("assigned") == 3L &&
      r.getAs[Long]("next_rank") == 3L, s"$r")
    val ranks = ShardMap.assignment(spark, idx, "shard_map")
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(ranks == Seq(0L, 1L, 2L), s"$ranks")
    // replay: a second CALL mints nothing
    val r2 = spark.sql(
      "CALL proc.system.shard_refresh(`table` => 'corpus4', " +
        s"index_path => '$idx')").collect()(0)
    assert(r2.getAs[Long]("assigned") == 0L, s"$r2")
  }

  test("CALL seq_refresh mints token spans from SQL") {
    val textSchema = TableSchema(Seq(
      ColumnDef("text", ColumnType.AzString, nullable = false)))
    AzofWriter.createTable(spark, lake, "corpus5", textSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "corpus5",
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row("a", Timestamp.from(ts("2024-01-02T00:00:00Z")), "w1 w2 w3"),
          Row("b", Timestamp.from(ts("2024-01-02T00:00:00Z")), "w4 w5"))),
        textSchema.toStruct))
    val idx = s"$lake/idx5"
    SeqMap.create(spark, idx, budget = 4L)

    val r = spark.sql(
      "CALL proc.system.seq_refresh(`table` => 'corpus5', " +
        s"index_path => '$idx')").collect()(0)
    assert(r.getAs[Long]("assigned") == 2L &&
      r.getAs[Long]("next_token") == 5L, s"$r")
    val offs = SeqMap.assignment(spark, idx, "seq_map")
      .collect().map(x => x.getString(0) -> x.getLong(2)).toMap
    assert(offs.values.toSeq.sorted == Seq(0L, 2L) ||
      offs.values.toSeq.sorted == Seq(0L, 3L), s"$offs")
  }

  test("unknown procedures refuse with the catalog's procedure list") {
    mk("u1", ("1", "2024-01-05T00:00:00Z", "a"))
    val e = intercept[Exception] {
      spark.sql("CALL proc.system.frobnicate('u1')").collect()
    }
    assert(e.getMessage.contains("frobnicate") ||
      Option(e.getCause).exists(_.getMessage.contains("frobnicate")))
  }
}
