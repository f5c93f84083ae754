package graft.plans

import graft.TestSpark
import graft.format._
import graft.sources.{AzofWriter, JoinView, MatView}
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

/** The SQL view-lifecycle DDL: `CREATE MATERIALIZED VIEW … AS SELECT`
  * infers the definition from the query (single-table and star),
  * populates the view, and the SAME query then rewrites onto it;
  * `REFRESH` catches up; `DROP` removes the tables and the rewrite
  * candidacy. Unsupported shapes refuse LOUDLY at create time, each
  * message naming the explicit-definition remedy.
  */
class ViewDdlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val srcSchema = TableSchema(Seq(
    ColumnDef("g", ColumnType.AzString, nullable = false),
    ColumnDef("b", ColumnType.AzString, nullable = true),
    ColumnDef("v", ColumnType.AzInt, nullable = true),
    ColumnDef("t", ColumnType.AzDateTime, nullable = false)))

  private def ts(s: String) = Instant.parse(s)

  private def df(rows: (String, String, String, String, Any, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map {
        case (k, et, g, b, v, t) => Row(k, Timestamp.from(ts(et)), g, b,
          v match { case null => null; case x: Long => x },
          Timestamp.from(ts(t)))
      }),
      srcSchema.toStruct)

  private def mkLake(tag: String): String = {
    val l = Files.createTempDirectory(s"azof-ddl-$tag").toString
    AzofWriter.createTable(spark, l, "src", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "src", df(
      ("1", "2024-01-02T00:00:00Z", "a", "x", 10L, "2024-03-01T01:00:00Z"),
      ("2", "2024-01-02T00:00:00Z", "a", "y", 4L, "2024-03-01T02:00:00Z"),
      ("3", "2024-01-02T00:00:00Z", "b", "x", 7L, "2024-03-02T01:00:00Z"),
      ("4", "2024-01-02T00:00:00Z", "a", null, null,
        "2024-03-02T02:00:00Z")))                                    // v2
    l
  }

  private def withLake[A](l: String, mvs: String = "auto")(body: => A): A = {
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", mvs)
    try body
    finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  private def scansSrc(q: DataFrame): Boolean =
    q.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation
        if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2Relation
        if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
    }.nonEmpty

  private def rows(q: DataFrame): Seq[Seq[Any]] =
    q.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  test("CREATE single-table: infers count/sum/avg/min/max/distinct/" +
    "tuple, populates, and the defining query rewrites onto the view " +
    "with identical results") {
    val l = mkLake("single")
    withLake(l) {
      val q = "SELECT g, count(*) AS n_rows, sum(v) AS sum_v, " +
        "avg(v) AS avg_v, min(v) AS min_v, max(v) AS max_v, " +
        "count(DISTINCT b) AS dv_b, count(DISTINCT b, v) AS dv_bv " +
        "FROM azof.src GROUP BY g"
      val scanTruth = rows(spark.sql(q)) // pre-create: the corpus plan
      val r = spark.sql(s"CREATE MATERIALIZED VIEW mv1 AS $q").collect()
      assert(r.length == 1 && r(0).getString(0) == "mv1" &&
        r(0).getString(1) == "single" && r(0).getBoolean(2),
        r.mkString(","))
      // the def sidecar carries exactly the inferred shape
      val (_, srcT, vd) = MatView.readDef(spark, l, "mv1").get
      assert(srcT == "src" && vd.groupCols == Seq("g") &&
        vd.sumCols == Seq("v") && vd.minMaxCols == Seq("v") &&
        vd.distinctCols == Seq("b") &&
        vd.distinctTuples == Seq(Seq("b", "v")), vd.toString)
      val served = spark.sql(q)
      assert(!scansSrc(served), "the defining query must rewrite")
      assert(rows(served) == scanTruth)
      // rollups over the same view serve too
      val global = spark.sql(
        "SELECT count(*) AS n, sum(v) AS s FROM azof.src")
      assert(!scansSrc(global) && rows(global) == Seq(Seq(4L, 21L)))
    }
  }

  test("churn staleness falls back; REFRESH MATERIALIZED VIEW " +
    "re-serves the new truth") {
    val l = mkLake("refresh")
    withLake(l) {
      val q = "SELECT g, count(*) AS n, sum(v) AS s FROM azof.src " +
        "GROUP BY g"
      spark.sql(s"CREATE MATERIALIZED VIEW mv1 AS $q").collect()
      assert(!scansSrc(spark.sql(q)))
      AzofWriter.commitDelta(spark, l, "src", df(
        ("5", "2024-02-05T00:00:00Z", "b", "z", 100L,
          "2024-03-03T01:00:00Z")),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))      // v3
      val stale = spark.sql(q)
      assert(scansSrc(stale), "stale view must fall back to the scan")
      assert(rows(stale).contains(Seq("b", 2L, 107L)), rows(stale))
      val r = spark.sql("REFRESH MATERIALIZED VIEW mv1").collect()
      assert(r(0).getString(1) == "single")
      val fresh = spark.sql(q)
      assert(!scansSrc(fresh) && rows(fresh) == rows(stale))
    }
  }

  test("CREATE with an aliased derived bucket stores it; the same " +
    "expression rewrites") {
    val l = mkLake("derived")
    withLake(l) {
      val q = "SELECT date_trunc('day', t) AS day, count(*) AS n " +
        "FROM azof.src GROUP BY date_trunc('day', t)"
      spark.sql(s"CREATE MATERIALIZED VIEW mvd AS $q").collect()
      val (_, _, vd) = MatView.readDef(spark, l, "mvd").get
      assert(vd.derivedGroups.size == 1 &&
        vd.derivedGroups.head.name == "day", vd.toString)
      val served = spark.sql(q)
      assert(!scansSrc(served))
      assert(rows(served).map(_(1)) == Seq(2L, 2L))
    }
  }

  test("CREATE star: dims split by provenance, fact aggregates " +
    "declared, and the defining join query rewrites") {
    val l = Files.createTempDirectory("azof-ddl-star").toString
    val factSchema = TableSchema(Seq(
      ColumnDef("fk", ColumnType.AzString, nullable = false),
      ColumnDef("v", ColumnType.AzInt, nullable = false)))
    val dimSchema = TableSchema(Seq(
      ColumnDef("tier", ColumnType.AzString, nullable = false)))
    AzofWriter.createTable(spark, l, "fact", factSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "dim", dimSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "dim", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("d1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "t1"),
        Row("d2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "t2"))),
      dimSchema.toStruct))
    AzofWriter.commitBase(spark, l, "fact", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "d1", 10L),
        Row("2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "d1", 4L),
        Row("3", Timestamp.from(ts("2024-01-02T00:00:00Z")), "d2", 7L))),
      factSchema.toStruct))
    withLake(l) {
      val q = "SELECT tier, count(*) AS n, sum(v) AS s " +
        "FROM azof.fact f JOIN azof.dim d ON f.fk = d.key GROUP BY tier"
      val truth = rows(spark.sql(q))
      val r = spark.sql(s"CREATE MATERIALIZED VIEW jv1 AS $q").collect()
      assert(r(0).getString(1) == "star", r.mkString(","))
      val (_, factT, dims, jdef) = JoinView.readDef(spark, l, "jv1").get
      assert(factT == "fact" && dims.map(_._2) == Seq("dim") &&
        jdef.dims.map(_.fkCol) == Seq("fk") &&
        jdef.dims.head.dimCols == Seq("tier") &&
        jdef.sumCols == Seq("v"), jdef.toString)
      val served = spark.sql(q)
      assert(!scansSrc(served) && rows(served) == truth)
    }
  }

  test("IF NOT EXISTS no-ops; duplicate CREATE and non-view targets " +
    "refuse; reserved name 'auto' refuses") {
    val l = mkLake("exists")
    withLake(l) {
      val q = "SELECT g, count(*) AS n FROM azof.src GROUP BY g"
      spark.sql(s"CREATE MATERIALIZED VIEW mv1 AS $q").collect()
      val again = spark.sql(
        s"CREATE MATERIALIZED VIEW IF NOT EXISTS mv1 AS $q").collect()
      assert(!again(0).getBoolean(2))
      val dup = intercept[IllegalArgumentException] {
        spark.sql(s"CREATE MATERIALIZED VIEW mv1 AS $q").collect() }
      assert(dup.getMessage.contains("already exists"))
      val plain = intercept[IllegalArgumentException] {
        spark.sql(s"CREATE MATERIALIZED VIEW src AS $q").collect() }
      assert(plain.getMessage.contains("NOT a materialized view"))
      val auto = intercept[IllegalArgumentException] {
        spark.sql(s"CREATE MATERIALIZED VIEW auto AS $q").collect() }
      assert(auto.getMessage.contains("reserved"))
    }
  }

  test("DROP removes both tables and the rewrite candidacy; refuses " +
    "a non-view table; IF EXISTS no-ops") {
    val l = mkLake("drop")
    withLake(l) {
      val q = "SELECT g, count(DISTINCT b) AS dv FROM azof.src GROUP BY g"
      spark.sql(s"CREATE MATERIALIZED VIEW mv1 AS $q").collect()
      assert(!scansSrc(spark.sql(q)))
      val r = spark.sql("DROP MATERIALIZED VIEW mv1").collect()
      assert(r(0).getBoolean(1))
      val dir = new java.io.File(l)
      assert(!new java.io.File(dir, "mv1").exists &&
        !new java.io.File(dir, "mv1__dv").exists)
      assert(scansSrc(spark.sql(q)), "dropped view must stop serving")
      val none = intercept[IllegalArgumentException] {
        spark.sql("DROP MATERIALIZED VIEW mv1").collect() }
      assert(none.getMessage.contains("no materialized view"))
      assert(!spark.sql("DROP MATERIALIZED VIEW IF EXISTS mv1")
        .collect()(0).getBoolean(1))
      val plain = intercept[IllegalArgumentException] {
        spark.sql("DROP MATERIALIZED VIEW src").collect() }
      assert(plain.getMessage.contains("refusing to delete"))
      assert(new java.io.File(dir, "src").exists)
    }
  }

  test("CREATE star with TWO dims: per-dim group columns split by " +
    "provenance in declaration order, distinct fks, and the defining " +
    "three-table query rewrites") {
    val l = Files.createTempDirectory("azof-ddl-star2").toString
    val factSchema = TableSchema(Seq(
      ColumnDef("f1", ColumnType.AzString, nullable = false),
      ColumnDef("f2", ColumnType.AzString, nullable = false),
      ColumnDef("v", ColumnType.AzInt, nullable = false)))
    val d1Schema = TableSchema(Seq(
      ColumnDef("tier", ColumnType.AzString, nullable = false)))
    val d2Schema = TableSchema(Seq(
      ColumnDef("region", ColumnType.AzString, nullable = false)))
    AzofWriter.createTable(spark, l, "fact", factSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "dim1", d1Schema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "dim2", d2Schema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "dim1", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("a1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "t1"),
        Row("a2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "t2"))),
      d1Schema.toStruct))
    AzofWriter.commitBase(spark, l, "dim2", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("b1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "eu"),
        Row("b2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "us"))),
      d2Schema.toStruct))
    AzofWriter.commitBase(spark, l, "fact", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "a1", "b1", 10L),
        Row("2", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "a1", "b2", 4L),
        Row("3", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "a2", "b1", 7L))),
      factSchema.toStruct))
    withLake(l) {
      val q = "SELECT tier, region, count(*) AS n, sum(v) AS s " +
        "FROM azof.fact f JOIN azof.dim1 d1 ON f.f1 = d1.key " +
        "JOIN azof.dim2 d2 ON f.f2 = d2.key GROUP BY tier, region"
      val truth = rows(spark.sql(q))
      spark.sql(s"CREATE MATERIALIZED VIEW jv2 AS $q").collect()
      val (_, _, dims, jdef) =
        graft.sources.JoinView.readDef(spark, l, "jv2").get
      assert(dims.map(_._2) == Seq("dim1", "dim2") &&
        jdef.dims.map(_.fkCol) == Seq("f1", "f2") &&
        jdef.dims.map(_.dimCols) == Seq(Seq("tier"), Seq("region")) &&
        jdef.sumCols == Seq("v"), jdef.toString)
      val served = spark.sql(q)
      assert(!scansSrc(served) && rows(served) == truth)
      assert(truth == Seq(Seq("t1", "eu", 1L, 10L),
        Seq("t1", "us", 1L, 4L), Seq("t2", "eu", 1L, 7L))
        .sortBy(_.mkString("|")), truth.toString)
    }
  }

  test("SHOW MATERIALIZED VIEWS lists both kinds with cursor/format; " +
    "DESCRIBE dumps the declared definition; unknown view refuses") {
    val l = mkLake("show")
    withLake(l) {
      spark.sql("CREATE MATERIALIZED VIEW mv1 AS SELECT g, " +
        "count(*) AS n, sum(v) AS s, count(DISTINCT b) AS dv " +
        "FROM azof.src GROUP BY g").collect()
      val shown = spark.sql("SHOW MATERIALIZED VIEWS").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      assert(shown.toSeq == Seq(("mv1", "single", "src")),
        shown.mkString(","))
      val props = spark.sql("DESCRIBE MATERIALIZED VIEW mv1").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props("kind") == "single" &&
        props("group_cols") == "g" && props("sum_cols") == "v" &&
        props("distinct_cols") == "b" &&
        props("format") == MatView.FormatVersion.toString &&
        props.contains("cursor"), props.toString)
      val none = intercept[IllegalArgumentException] {
        spark.sql("DESCRIBE MATERIALIZED VIEW nope").collect() }
      assert(none.getMessage.contains("no materialized view"))
    }
  }

  test("FILTERED view: the defining query's WHERE becomes the " +
    "membership predicate; churn moves rows across the boundary in " +
    "BOTH directions and the defining query keeps rewriting exactly; " +
    "the unfiltered question never serves") {
    val l = mkLake("filter")
    withLake(l) {
      val q = "SELECT g, count(*) AS n, sum(v) AS s, min(v) AS mn, " +
        "max(v) AS mx FROM azof.src WHERE g IN ('a', 'c') GROUP BY g"
      spark.sql(s"CREATE MATERIALIZED VIEW mvf AS $q").collect()
      val (_, _, vd) = MatView.readDef(spark, l, "mvf").get
      assert(vd.filter.exists(_.contains("IN")), vd.toString)
      val served0 = spark.sql(q)
      assert(!scansSrc(served0), "the defining filtered query must " +
        "rewrite:\n" + served0.queryExecution.optimizedPlan)
      assert(rows(served0) == Seq(Seq("a", 3L, 14L, 4L, 10L)),
        rows(served0).toString)
      // churn across the boundary: key 3 moves b→c (INTO the
      // predicate), key 1 moves a→z (OUT), key 5 inserts inside
      AzofWriter.commitDelta(spark, l, "src", df(
        ("3", "2024-02-05T00:00:00Z", "c", "x", 7L,
          "2024-03-02T01:00:00Z"),
        ("1", "2024-02-05T00:00:00Z", "z", "x", 10L,
          "2024-03-01T01:00:00Z"),
        ("5", "2024-02-05T00:00:00Z", "c", "y", 100L,
          "2024-03-03T01:00:00Z")),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))      // v3
      val stale = spark.sql(q)
      assert(scansSrc(stale), "stale filtered view must fall back")
      spark.sql("REFRESH MATERIALIZED VIEW mvf").collect()
      val fresh = spark.sql(q)
      assert(!scansSrc(fresh))
      assert(rows(fresh) == rows(stale) &&
        rows(fresh) == Seq(
          Seq("a", 2L, 4L, 4L, 4L), Seq("c", 2L, 107L, 7L, 100L)),
        rows(fresh).toString)
      // the UNFILTERED question can never be answered from a filtered
      // view — corpus scan survives
      assert(scansSrc(spark.sql(
        "SELECT g, count(*) AS n FROM azof.src GROUP BY g")))
      // a rollup carrying the same WHERE serves
      val glob = spark.sql("SELECT count(*) AS n, sum(v) AS s " +
        "FROM azof.src WHERE g IN ('a', 'c')")
      assert(!scansSrc(glob) && rows(glob) == Seq(Seq(4L, 111L)))
    }
  }

  test("FILTERED star view: a grouped-dim-attribute predicate; a dim " +
    "re-tier moves facts across the boundary and the serve stays " +
    "exact after REFRESH") {
    val l = Files.createTempDirectory("azof-ddl-fstar").toString
    val factSchema = TableSchema(Seq(
      ColumnDef("fk", ColumnType.AzString, nullable = false),
      ColumnDef("v", ColumnType.AzInt, nullable = false)))
    val dimSchema = TableSchema(Seq(
      ColumnDef("tier", ColumnType.AzString, nullable = false)))
    AzofWriter.createTable(spark, l, "fact", factSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "dim", dimSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "dim", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("d1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "t1"),
        Row("d2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "t2"))),
      dimSchema.toStruct))
    AzofWriter.commitBase(spark, l, "fact", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "d1", 10L),
        Row("2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "d1", 4L),
        Row("3", Timestamp.from(ts("2024-01-02T00:00:00Z")), "d2", 7L))),
      factSchema.toStruct))
    withLake(l) {
      val q = "SELECT tier, count(*) AS n, sum(v) AS s " +
        "FROM azof.fact f JOIN azof.dim d ON f.fk = d.key " +
        "WHERE tier IN ('t1', 't9') GROUP BY tier"
      spark.sql(s"CREATE MATERIALIZED VIEW jvf AS $q").collect()
      val (_, _, _, jdef) = JoinView.readDef(spark, l, "jvf").get
      assert(jdef.filter.exists(_.contains("IN")), jdef.toString)
      val served0 = spark.sql(q)
      assert(!scansSrc(served0))
      assert(rows(served0) == Seq(Seq("t1", 2L, 14L)))
      // dim re-tier moves facts across the boundary WITHOUT fact
      // churn: d1 t1→t0 (its facts leave), d2 t2→t9 (its fact enters)
      AzofWriter.commitDelta(spark, l, "dim", spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row("d1", Timestamp.from(ts("2024-02-05T00:00:00Z")), "t0"),
          Row("d2", Timestamp.from(ts("2024-02-05T00:00:00Z")), "t9"))),
        dimSchema.toStruct),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
      spark.sql("REFRESH MATERIALIZED VIEW jvf").collect()
      val fresh = spark.sql(q)
      assert(!scansSrc(fresh))
      assert(rows(fresh) == Seq(Seq("t9", 1L, 7L)), rows(fresh).toString)
    }
  }

  test("SNOWFLAKE star view via DDL (fact ⋈ dim ⋈ sub): CREATE infers " +
    "the one-hop chain, the defining query serves plan-gated, churn " +
    "at EVERY level refreshes exactly, a chain-less query falls back, " +
    "and DESCRIBE renders the chain") {
    val l = Files.createTempDirectory("azof-ddl-snow").toString
    val factSchema = TableSchema(Seq(
      ColumnDef("fk", ColumnType.AzString, nullable = false),
      ColumnDef("v", ColumnType.AzInt, nullable = false)))
    val dimSchema = TableSchema(Seq(
      ColumnDef("sfk", ColumnType.AzString, nullable = false),
      ColumnDef("tier", ColumnType.AzString, nullable = false)))
    val subSchema = TableSchema(Seq(
      ColumnDef("region", ColumnType.AzString, nullable = false)))
    AzofWriter.createTable(spark, l, "fact", factSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "dim", dimSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "sub", subSchema,
      ts("2024-01-01T00:00:00Z"))
    def dimRows(rows: (String, String, String)*) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (k, s, t) =>
          Row(k, Timestamp.from(ts("2024-01-02T00:00:00Z")), s, t) }),
        dimSchema.toStruct)
    AzofWriter.commitBase(spark, l, "sub", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("s1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "r1"),
        Row("s2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "r2"))),
      subSchema.toStruct))
    AzofWriter.commitBase(spark, l, "dim", dimRows(
      ("d1", "s1", "t1"), ("d2", "s2", "t2")))
    AzofWriter.commitBase(spark, l, "fact", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "d1", 10L),
        Row("2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "d1", 4L),
        Row("3", Timestamp.from(ts("2024-01-02T00:00:00Z")), "d2", 7L))),
      factSchema.toStruct))
    withLake(l) {
      val q = "SELECT tier, region, count(*) AS n, sum(v) AS s " +
        "FROM azof.fact f JOIN azof.dim d ON f.fk = d.key " +
        "JOIN azof.sub r ON d.sfk = r.key GROUP BY tier, region"
      spark.sql(s"CREATE MATERIALIZED VIEW sjv AS $q").collect()
      val (_, _, locs, jdef) = JoinView.readDef(spark, l, "sjv").get
      assert(jdef.dims == Seq(graft.sources.DimJoin("fk", Seq("tier"),
        subs = Seq(graft.sources.DimJoin("sfk", Seq("region"))))) &&
        locs == Seq((l, "dim"), (l, "sub")), (jdef, locs).toString)
      val served0 = spark.sql(q)
      assert(!scansSrc(served0), "the defining chain query must " +
        "rewrite:\n" + served0.queryExecution.optimizedPlan)
      assert(rows(served0) == Seq(Seq("t1", "r1", 2L, 14L),
        Seq("t2", "r2", 1L, 7L)), rows(served0).toString)
      // a region-grain ROLLUP serves from the same chain view
      val roll = spark.sql("SELECT region, sum(v) AS s " +
        "FROM azof.fact f JOIN azof.dim d ON f.fk = d.key " +
        "JOIN azof.sub r ON d.sfk = r.key GROUP BY region")
      assert(!scansSrc(roll) &&
        rows(roll) == Seq(Seq("r1", 14L), Seq("r2", 7L)))
      // a CHAIN-LESS query (no sub join) must fall back — the view's
      // inner sub join could have dropped rows this query keeps
      assert(scansSrc(spark.sql("SELECT tier, count(*) AS n " +
        "FROM azof.fact f JOIN azof.dim d ON f.fk = d.key " +
        "GROUP BY tier")))
      // churn at EVERY level: sub re-region, dim sub-fk re-point,
      // fact revision — one SQL REFRESH absorbs all three
      AzofWriter.commitDelta(spark, l, "sub", spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row("s1", Timestamp.from(ts("2024-02-05T00:00:00Z")), "r9"))),
        subSchema.toStruct),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
      AzofWriter.commitDelta(spark, l, "dim", spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row("d2", Timestamp.from(ts("2024-02-05T00:00:00Z")),
            "s1", "t2"))),
        dimSchema.toStruct),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
      AzofWriter.commitDelta(spark, l, "fact", spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row("2", Timestamp.from(ts("2024-02-05T00:00:00Z")),
            "d2", 5L))),
        factSchema.toStruct),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
      assert(scansSrc(spark.sql(q)), "stale chain view must fall back")
      spark.sql("REFRESH MATERIALIZED VIEW sjv").collect()
      val fresh = spark.sql(q)
      assert(!scansSrc(fresh))
      assert(rows(fresh) == Seq(Seq("t1", "r9", 1L, 10L),
        Seq("t2", "r9", 2L, 12L)), rows(fresh).toString)
      // DESCRIBE renders the chain hop
      val props = spark.sql("DESCRIBE MATERIALIZED VIEW sjv").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.contains("dim fk ⋈ sfk") &&
        props("dim fk ⋈ sfk").contains("sub"), props.toString)
    }
  }

  test("DDL UX: leading comments dispatch, EXPLAIN describes without " +
    "creating, backquoted dotted identifiers are literal, near-miss " +
    "statements fall through to the delegate parser") {
    val l = mkLake("ux")
    withLake(l) {
      val q = "SELECT g, count(*) AS n, sum(v) AS s FROM azof.src " +
        "GROUP BY g"
      // leading line + block comments still dispatch to the MV DDL
      spark.sql(s"-- dashboard rollup\n/* owner: data-eng */\n" +
        s"CREATE MATERIALIZED VIEW mv1 AS $q").collect()
      assert(!scansSrc(spark.sql(q)))
      // EXPLAIN CREATE runs inference and describes; nothing created
      val plan = spark.sql(
        s"EXPLAIN CREATE MATERIALIZED VIEW mv2 AS $q")
        .collect()(0).getString(0)
      assert(plan.contains("kind: single") &&
        plan.contains("group_cols: g") && plan.contains("sum_cols: v"),
        plan)
      assert(!new java.io.File(new java.io.File(l), "mv2").exists,
        "EXPLAIN CREATE must not create")
      // inference refusals surface through EXPLAIN too
      val bad = intercept[IllegalArgumentException] {
        spark.sql("EXPLAIN CREATE MATERIALIZED VIEW mv3 AS " +
          "SELECT g, v FROM azof.src").collect() }
      assert(bad.getMessage.contains("aggregate"))
      // EXPLAIN DROP describes and does not drop
      val dr = spark.sql("EXPLAIN DROP MATERIALIZED VIEW IF EXISTS mv1")
        .collect()(0).getString(0)
      assert(dr.contains("DropMatViewCommand") && dr.contains("ifExists"),
        dr)
      assert(new java.io.File(new java.io.File(l), "mv1").exists)
      // a fully-backquoted dotted identifier is ONE literal name
      spark.sql(s"CREATE MATERIALIZED VIEW `my.view` AS $q").collect()
      assert(new java.io.File(new java.io.File(l), "my.view").exists)
      spark.sql("DROP MATERIALIZED VIEW `my.view`").collect()
      assert(!new java.io.File(new java.io.File(l), "my.view").exists)
      // per-part backquotes still resolve the two-part reference
      assert(spark.sql("DESCRIBE MATERIALIZED VIEW `azof`.`mv1`")
        .collect().nonEmpty)
      // a near-miss statement is NOT ours: delegate parser's error
      intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
        spark.sql("CREATE MATERIALIZED VIEWX m AS SELECT 1").collect() }
    }
  }

  test("DROP invalidates the cached definition-format stamp — a " +
    "recreate under a dropped name serves its own format, never the " +
    "old table's") {
    val l = mkLake("fmt")
    withLake(l) {
      // plant an old-format sidecar and warm the format cache
      val dir = new java.io.File(new java.io.File(l), "oldmv")
      dir.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(dir, MatView.DefFileName).toPath,
        ("""{"format":2,"source_path":"","source_table":"src",""" +
          """"group_cols":["g"],"sum_cols":[],"minmax_cols":[],""" +
          """"distinct_cols":[],"distinct_tuples":[],"approx_cols":[],""" +
          """"derived_groups":[]}""").getBytes("UTF-8"))
      assert(MatView.defFormat(spark, l, "oldmv") == 2)
      spark.sql("DROP MATERIALIZED VIEW oldmv").collect()
      // the stale stamp must not survive the drop
      assert(MatView.defFormat(spark, l, "oldmv") == 0)
      spark.sql("CREATE MATERIALIZED VIEW oldmv AS SELECT g, " +
        "count(*) AS n FROM azof.src GROUP BY g").collect()
      assert(MatView.defFormat(spark, l, "oldmv") ==
        MatView.FormatVersion)
    }
  }

  test("refusal matrix: every unsupported shape refuses loudly, " +
    "naming the explicit-definition remedy") {
    val l = mkLake("refuse")
    withLake(l) {
      def refusal(ddl: String): String = {
        val e = intercept[IllegalArgumentException] {
          spark.sql(ddl).collect() }
        assert(e.getMessage.contains("CALL system.create_view"),
          s"remedy missing: ${e.getMessage}")
        e.getMessage
      }
      // WHERE itself is supported (filtered views) — but a
      // NONDETERMINISTIC membership predicate refuses, and so does a
      // subquery
      assert(refusal("CREATE MATERIALIZED VIEW m AS SELECT g, " +
        "count(*) AS n FROM azof.src WHERE rand() < 0.5 GROUP BY g")
        .contains("nondeterministic"))
      assert(refusal("CREATE MATERIALIZED VIEW m AS SELECT g, " +
        "count(*) AS n FROM azof.src WHERE v IN " +
        "(SELECT id FROM range(5)) GROUP BY g")
        .contains("subquery"))
      // variance of a non-BIGINT column refuses (integer moments are
      // what make the (n, s, ss) decomposition exact)
      assert(refusal("CREATE MATERIALIZED VIEW m AS SELECT g, " +
        "var_samp(b) AS vb FROM azof.src GROUP BY g")
        .contains("BIGINT"))
      assert(refusal("CREATE MATERIALIZED VIEW m AS SELECT g, v " +
        "FROM azof.src").contains("aggregate"))
      // stddev/var_samp are now SUPPORTED (ss_ decomposition) — a
      // genuinely non-decomposable aggregate still refuses
      assert(refusal("CREATE MATERIALIZED VIEW m AS SELECT g, " +
        "skewness(v) AS sk FROM azof.src GROUP BY g")
        .contains("unsupported"))
      assert(refusal("CREATE MATERIALIZED VIEW m AS SELECT g, " +
        "count(*) FILTER (WHERE v > 5) AS n FROM azof.src GROUP BY g")
        .contains("FILTER"))
      assert(refusal("CREATE MATERIALIZED VIEW m AS SELECT g, " +
        "approx_count_distinct(b) AS adv FROM azof.src GROUP BY g")
        .contains("approx_cols"))
      assert(refusal("CREATE MATERIALIZED VIEW m AS SELECT count(*) " +
        "AS n FROM azof.src GROUP BY date_trunc('day', t)")
        .contains("alias"))
      assert(refusal("CREATE MATERIALIZED VIEW m AS SELECT g, " +
        "count(*) AS n FROM azof.src GROUP BY g ORDER BY g")
        .contains("aggregate"))
      assert(refusal("CREATE MATERIALIZED VIEW m AS SELECT b, " +
        "sum(v) AS s FROM azof.src TIMESTAMP AS OF " +
        "'2024-06-01T00:00:00Z' GROUP BY b").contains("AS OF"))
      // star-side refusals
      val l2 = Files.createTempDirectory("azof-ddl-refuse2").toString
      AzofWriter.createTable(spark, l2, "fact", TableSchema(Seq(
        ColumnDef("fk", ColumnType.AzString, nullable = false),
        ColumnDef("v", ColumnType.AzInt, nullable = false))),
        ts("2024-01-01T00:00:00Z"))
      AzofWriter.createTable(spark, l2, "dim", TableSchema(Seq(
        ColumnDef("w", ColumnType.AzInt, nullable = false))),
        ts("2024-01-01T00:00:00Z"))
      spark.conf.set("spark.azof.path", l2)
      assert(refusal("CREATE MATERIALIZED VIEW m AS SELECT f.fk, " +
        "sum(d.w) AS s FROM azof.fact f JOIN azof.dim d " +
        "ON f.fk = d.key GROUP BY f.fk").contains("FACT side"))
      assert(refusal("CREATE MATERIALIZED VIEW m AS SELECT f.fk AS g," +
        " count(*) AS n FROM azof.fact f LEFT JOIN azof.dim d " +
        "ON f.fk = d.key GROUP BY f.fk").contains("INNER"))
      // no such statement without a lake conf
      spark.conf.unset("spark.azof.path")
      val noLake = intercept[IllegalArgumentException] {
        spark.sql("CREATE MATERIALIZED VIEW m AS SELECT g, count(*) " +
          "AS n FROM azof.src GROUP BY g").collect() }
      assert(noLake.getMessage.contains("spark.azof.path"))
    }
  }
}
