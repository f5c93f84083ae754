package graft.plans

import graft.TestSpark
import graft.format._
import graft.sources.{AzofWriter, MatView, ViewDef}
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.scalatest.funsuite.AnyFunSuite

/** The automatic materialized-view rewrite: covered aggregates over an
  * azof table's Current view are answered from the registered
  * [[MatView]] (plan-pinned: the corpus scan disappears), exact-match
  * groups become a pure projection, subset groups a rollup over the
  * view, and ANY staleness evidence — an unrefreshed commit, a
  * rollback — falls back to the corpus scan, never to a wrong answer.
  */
class MvRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val srcSchema = TableSchema(Seq(
    ColumnDef("g1", ColumnType.AzString, nullable = false),
    ColumnDef("g2", ColumnType.AzString, nullable = false),
    ColumnDef("v", ColumnType.AzInt, nullable = false)))

  private val vd =
    ViewDef(Seq("g1", "g2"), sumCols = Seq("v"), minMaxCols = Seq("v"))

  private def ts(s: String) = Instant.parse(s)

  private def df(rows: (String, String, String, String, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, g1, g2, v) =>
        Row(k, Timestamp.from(ts(t)), g1, g2, v) }),
      srcSchema.toStruct)

  /** A lake with src committed and the view refreshed. */
  private def mkLake(tag: String): (String, String) = {
    val l = Files.createTempDirectory(s"azof-mvrw-$tag").toString
    val ck = Files.createTempDirectory(s"azof-mvrw-$tag-ck").toString
    AzofWriter.createTable(spark, l, "src", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "src", df(
      ("1", "2024-01-02T00:00:00Z", "a", "x", 10L),
      ("2", "2024-01-02T00:00:00Z", "a", "y", 4L),
      ("3", "2024-01-02T00:00:00Z", "b", "x", 7L),
      ("4", "2024-01-02T00:00:00Z", "a", "x", 2L)))                  // v2
    val q = MatView.refresh(spark, l, "src", l, "mv", vd, ck)
    assert(q.awaitTermination(120000))
    (l, ck)
  }

  private def withConfs[A](l: String)(body: => A): A = {
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", "mv")
    try body
    finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  private def aggregates(q: DataFrame): Seq[Aggregate] =
    q.queryExecution.optimizedPlan.collect { case a: Aggregate => a }

  /** Whether the optimized plan still scans the SOURCE through an azof
    * relation node (either surface) — a rewritten plan reads the view's
    * parquet files directly and carries none.
    */
  private def scansSrc(q: DataFrame): Boolean =
    q.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation
        if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
        if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
      case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
        if s.relation.table.isInstanceOf[graft.sources.AzofV2Table] => s
    }.nonEmpty

  test("exact-group aggregate rewrites to a pure projection of the " +
    "view — no Aggregate node, no corpus scan — with identical results") {
    val (l, _) = mkLake("exact")
    withConfs(l) {
      val q = spark.sql(
        "SELECT g1, g2, count(*) AS n, sum(v) AS sv, min(v) AS mn, " +
          "max(v) AS mx FROM azof.src GROUP BY g1, g2")
      assert(aggregates(q).isEmpty, "aggregate must be served, not run:\n" +
        q.queryExecution.optimizedPlan)
      assert(!scansSrc(q), "corpus scan must disappear")
      val got = q.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(x => (x._1, x._2))
      assert(got.toSeq == Seq(
        ("a", "x", 2L, 12L, 2L, 10L),
        ("a", "y", 1L, 4L, 4L, 4L),
        ("b", "x", 1L, 7L, 7L, 7L)))
    }
  }

  test("subset-group aggregate rolls the view up (COUNT re-sums " +
    "n_rows, MIN/MAX re-minimize) instead of scanning the corpus") {
    val (l, _) = mkLake("subset")
    withConfs(l) {
      val q = spark.sql(
        "SELECT g1, count(*) AS n, sum(v) AS sv, min(v) AS mn, " +
          "max(v) AS mx FROM azof.src GROUP BY g1")
      assert(aggregates(q).nonEmpty, "rollup keeps one aggregate")
      assert(!scansSrc(q), "but it aggregates the VIEW, not the corpus")
      val got = q.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sortBy(_._1)
      assert(got.toSeq == Seq(
        ("a", 3L, 16L, 2L, 10L), ("b", 1L, 7L, 7L, 7L)))
    }
  }

  test("an unrefreshed source commit makes the view stale: the query " +
    "falls back to the corpus scan and sees the new rows; the next " +
    "refresh restores the rewrite") {
    val (l, ck) = mkLake("stale")
    withConfs(l) {
      AzofWriter.commitDelta(spark, l, "src", df(
        ("5", "2024-02-05T00:00:00Z", "b", "y", 100L)),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))      // v3
      def q = spark.sql(
        "SELECT g1, count(*) AS n FROM azof.src GROUP BY g1")
      assert(scansSrc(q), "stale view must NOT serve")
      assert(q.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq == Seq(("a", 3L), ("b", 2L)),
        "fallback sees the unrefreshed commit")
      val s = MatView.refresh(spark, l, "src", l, "mv", vd, ck)
      assert(s.awaitTermination(120000))
      assert(!scansSrc(q), "refresh restores the rewrite")
      assert(q.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq == Seq(("a", 3L), ("b", 2L)))
    }
  }

  test("a source ROLLBACK (no feed event) reads as stale; compaction " +
    "(view-preserving) does not") {
    val (l, _) = mkLake("rb")
    assert(MatView.isFresh(spark, l, "src", l, "mv"))
    AzofWriter.compact(spark, l, "src", ts("2024-06-01T00:00:00Z"))  // v3
    assert(MatView.isFresh(spark, l, "src", l, "mv"),
      "a compact rewrites bytes, not the live view")
    withConfs(l) {
      val q = spark.sql(
        "SELECT g1, g2, count(*) AS n FROM azof.src GROUP BY g1, g2")
      assert(!scansSrc(q), "rewrite still fires over the compacted table")
    }
    AzofWriter.rollback(spark, l, "src", 2L)                         // v4
    assert(!MatView.isFresh(spark, l, "src", l, "mv"),
      "rollback changes live state with no feed event — stale")
  }

  test("shapes the view cannot answer exactly are left untouched: " +
    "DISTINCT on a measure, expression-valued aggregates, filters on " +
    "measure columns") {
    val (l, _) = mkLake("shapes")
    withConfs(l) {
      for (sql <- Seq(
        "SELECT g1, count(DISTINCT v) AS n FROM azof.src GROUP BY g1",
        "SELECT g1, sum(length(g2)) AS s FROM azof.src GROUP BY g1",
        "SELECT g1, count(*) AS n FROM azof.src WHERE v > 3 GROUP BY g1",
        "SELECT sum(v + 1) AS s FROM azof.src")) {
        val q = spark.sql(sql)
        assert(scansSrc(q), s"must not rewrite: $sql")
        assert(q.collect().nonEmpty)
      }
    }
  }

  test("AVG rewrites from the stored totals: exact-match serves " +
    "sum/nn per view row, and a SUBSET rollup re-derives from " +
    "re-summed totals — never by averaging averages") {
    val (l, _) = mkLake("avg")
    withConfs(l) {
      // exact group match: avg alongside count+sum in one statement
      val q = spark.sql(
        "SELECT g1, g2, avg(v) AS a, count(*) AS n, sum(v) AS sv " +
          "FROM azof.src GROUP BY g1, g2")
      assert(aggregates(q).isEmpty && !scansSrc(q),
        "avg must serve from the view totals:\n" +
          q.queryExecution.optimizedPlan)
      assert(q.collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getLong(3), r.getLong(4)))
        .sortBy(x => (x._1, x._2)).toSeq == Seq(
        ("a", "x", 6.0, 2L, 12L), ("a", "y", 4.0, 1L, 4L),
        ("b", "x", 7.0, 1L, 7L)))
      // SUBSET rollup: group a holds rows (10, 4, 2) across two view
      // rows with per-row means 6.0 and 4.0 — averaging averages says
      // 5.0; re-deriving from totals says 16/3. Demand the latter.
      val qr = spark.sql(
        "SELECT g1, avg(v) AS a FROM azof.src GROUP BY g1")
      assert(!scansSrc(qr))
      val got = qr.collect().map(r => (r.getString(0), r.getDouble(1)))
        .sortBy(_._1).toSeq
      assert(got == Seq(("a", 16.0 / 3.0), ("b", 7.0)),
        s"rollup avg must re-derive from sums: $got")
      // global avg + arithmetic over aggregates in one statement
      // (bit-for-bit identity with Spark's own avg over the corpus is
      // additionally pinned by q56's DuckDB hash gate)
      val qg = spark.sql(
        "SELECT avg(v) AS a, 100 * sum(v) / count(*) AS pct, " +
          "max(v) - min(v) AS spread FROM azof.src")
      assert(!scansSrc(qg))
      assert(qg.collect().map(r => (r.getDouble(0), r.getDouble(1),
        r.getLong(2))).toSeq == Seq((23.0 / 4.0, 2300.0 / 4.0, 8L)))
    }
  }

  test("COUNT(c) over a NULLABLE declared sum column serves from the " +
    "view's non-null count; SUM over an all-null group serves NULL") {
    import graft.sources.MatView
    val schemaN = TableSchema(Seq(
      ColumnDef("g1", ColumnType.AzString, nullable = false),
      ColumnDef("v", ColumnType.AzInt, nullable = true)))
    val vdN = ViewDef(Seq("g1"), sumCols = Seq("v"))
    val l = Files.createTempDirectory("azof-mvrw-null").toString
    val ck = Files.createTempDirectory("azof-mvrw-null-ck").toString
    AzofWriter.createTable(spark, l, "src", schemaN,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "src",
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a", 10L),
        Row("2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a", null),
        Row("3", Timestamp.from(ts("2024-01-02T00:00:00Z")), "b", null))),
        schemaN.toStruct))
    val q0 = MatView.refresh(spark, l, "src", l, "mvn", vdN, ck)
    assert(q0.awaitTermination(120000))
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", "mvn")
    try {
      val q = spark.sql(
        "SELECT g1, count(v) AS nn, sum(v) AS sv, avg(v) AS a " +
          "FROM azof.src GROUP BY g1")
      assert(aggregates(q).isEmpty && !scansSrc(q),
        "nullable-measure aggregates must serve from nn/sum totals:\n" +
          q.queryExecution.optimizedPlan)
      val got = q.collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .sortBy(_._1).toSeq
      assert(got == Seq(
        ("a", 1L, Some(10L), Some(10.0)), ("b", 0L, None, None)),
        s"SQL null-skipping semantics must hold: $got")
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  test("a candidate whose sidecar does not exist YET is re-probed: " +
    "conf set → query (no rewrite) → create+refresh → SAME session " +
    "rewrites (no permanent miss-caching)") {
    val l = Files.createTempDirectory("azof-mvrw-late").toString
    val ck = Files.createTempDirectory("azof-mvrw-late-ck").toString
    AzofWriter.createTable(spark, l, "src", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "src", df(
      ("1", "2024-01-02T00:00:00Z", "a", "x", 10L),
      ("2", "2024-01-02T00:00:00Z", "b", "y", 4L)))
    withConfs(l) {
      def q = spark.sql(
        "SELECT g1, count(*) AS n FROM azof.src GROUP BY g1")
      assert(scansSrc(q), "no view yet — scan")
      assert(q.collect().length == 2)
      // NOW the view appears — the same session must pick it up
      val s = MatView.refresh(spark, l, "src", l, "mv", vd, ck)
      assert(s.awaitTermination(120000))
      assert(!scansSrc(q),
        "the rule must re-probe a missing sidecar, not cache the miss")
      assert(q.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq == Seq(("a", 1L), ("b", 1L)))
    }
  }

  test("GLOBAL aggregates (no GROUP BY) roll the whole view up — one " +
    "row, never a corpus scan — including the filtered form") {
    val (l, _) = mkLake("glob")
    withConfs(l) {
      val q = spark.sql(
        "SELECT count(*) AS n, sum(v) AS sv, min(v) AS mn, " +
          "max(v) AS mx, count(DISTINCT g1) AS d FROM azof.src")
      assert(!scansSrc(q), "global aggregate must serve from the view:\n" +
        q.queryExecution.optimizedPlan)
      assert(q.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSeq ==
        Seq((4L, 23L, 2L, 10L, 2L)))
      val qf = spark.sql(
        "SELECT count(*) AS n FROM azof.src WHERE g1 = 'a'")
      assert(!scansSrc(qf))
      assert(qf.collect()(0).getLong(0) == 3L)
    }
  }

  test("WHERE on group columns commutes onto the view scan; " +
    "COUNT(DISTINCT <view group col>) reads off the view's rows") {
    val (l, _) = mkLake("fd")
    withConfs(l) {
      // group-col predicate: filter moves onto the view, aggregate gone
      val qf = spark.sql(
        "SELECT g1, g2, count(*) AS n, sum(v) AS sv FROM azof.src " +
          "WHERE g1 = 'a' AND length(g2) = 1 GROUP BY g1, g2")
      assert(aggregates(qf).isEmpty && !scansSrc(qf),
        "filtered exact-match must still be a pure view projection:\n" +
          qf.queryExecution.optimizedPlan)
      assert(qf.collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).sortBy(x => (x._1, x._2)).toSeq ==
        Seq(("a", "x", 2L, 12L), ("a", "y", 1L, 4L)))
      // distinct count of a view group column: the subset rollup
      val qd = spark.sql(
        "SELECT g1, count(DISTINCT g2) AS d, sum(v) AS sv " +
          "FROM azof.src GROUP BY g1")
      assert(!scansSrc(qd), "distinct over a view group col must serve")
      assert(qd.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).sortBy(_._1).toSeq ==
        Seq(("a", 2L, 16L), ("b", 1L, 7L)))
      // mixed filter + distinct
      val qm = spark.sql(
        "SELECT g1, count(DISTINCT g2) AS d FROM azof.src " +
          "WHERE g2 = 'x' GROUP BY g1")
      assert(!scansSrc(qm))
      assert(qm.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq == Seq(("a", 1L), ("b", 1L)))
    }
  }

  test("HAVING / ORDER BY / LIMIT compose above the rewrite untouched " +
    "(preserved output ids)") {
    val (l, _) = mkLake("hav")
    withConfs(l) {
      val q = spark.sql(
        "SELECT g1, sum(v) AS sv FROM azof.src GROUP BY g1 " +
          "HAVING sum(v) > 10 ORDER BY sv DESC LIMIT 1")
      assert(!scansSrc(q), "rewrite fires under HAVING/ORDER BY/LIMIT:\n" +
        q.queryExecution.optimizedPlan)
      assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("a", 16L)))
    }
  }

  test("JOIN aggregates rewrite to a registered join view: exact group " +
    "match, global rollup, staleness fallback, non-key joins untouched") {
    import graft.sources.{DimJoin, JoinView, JoinViewDef}
    val jdef = JoinViewDef(Seq("tier"), sumCols = Seq("v"),
      minMaxCols = Seq("v"), dims = Seq(DimJoin("fk", Seq("tier"))))
    val l = Files.createTempDirectory("azof-mvrw-join").toString
    val factSchema = TableSchema(Seq(
      ColumnDef("fk", ColumnType.AzString, nullable = false),
      ColumnDef("v", ColumnType.AzInt, nullable = false)))
    val dimSchema = TableSchema(Seq(
      ColumnDef("tier", ColumnType.AzString, nullable = false)))
    AzofWriter.createTable(spark, l, "fact", factSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "dim", dimSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "dim",
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row("d1",
          java.sql.Timestamp.from(ts("2024-01-02T00:00:00Z")), "t1"),
        org.apache.spark.sql.Row("d2",
          java.sql.Timestamp.from(ts("2024-01-02T00:00:00Z")), "t2"))),
        dimSchema.toStruct))
    AzofWriter.commitBase(spark, l, "fact",
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row("1",
          java.sql.Timestamp.from(ts("2024-01-02T00:00:00Z")), "d1", 10L),
        org.apache.spark.sql.Row("2",
          java.sql.Timestamp.from(ts("2024-01-02T00:00:00Z")), "d1", 4L),
        org.apache.spark.sql.Row("3",
          java.sql.Timestamp.from(ts("2024-01-02T00:00:00Z")), "d2", 7L))),
        factSchema.toStruct))
    JoinView.refresh(spark, l, "fact", Seq((l, "dim")), l, "jvr", jdef)
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", "jvr")
    try {
      def q = spark.sql(
        "SELECT tier, count(*) AS n, sum(v) AS sv, min(v) AS mn " +
          "FROM azof.fact f JOIN azof.dim d ON f.fk = d.key GROUP BY tier")
      assert(!scansSrc(q) && aggregates(q).isEmpty,
        "join aggregate must serve from the join view:\n" +
          q.queryExecution.optimizedPlan)
      assert(q.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq ==
        Seq(("t1", 2L, 14L, 4L), ("t2", 1L, 7L, 7L)))
      // global rollup over the join
      val qg = spark.sql(
        "SELECT count(*) AS n, max(v) AS mx FROM azof.fact f " +
          "JOIN azof.dim d ON d.key = f.fk")
      assert(!scansSrc(qg))
      assert(qg.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((3L, 10L)))
      // filter on the dim group column commutes onto the view
      val qf = spark.sql(
        "SELECT tier, count(*) AS n FROM azof.fact f " +
          "JOIN azof.dim d ON f.fk = d.key WHERE tier = 't1' GROUP BY tier")
      assert(!scansSrc(qf))
      assert(qf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("t1", 2L)))
      // a non-key join condition never matches
      val qn = spark.sql(
        "SELECT tier, count(*) AS n FROM azof.fact f " +
          "JOIN azof.dim d ON f.fk = d.tier GROUP BY tier")
      assert(scansSrc(qn), "non-key join must not rewrite")
      // an unrefreshed dim commit is staleness — fall back, see new data
      AzofWriter.commitDelta(spark, l, "dim",
        spark.createDataFrame(spark.sparkContext.parallelize(Seq(
          org.apache.spark.sql.Row("d1",
            java.sql.Timestamp.from(ts("2024-02-05T00:00:00Z")), "t2"))),
          dimSchema.toStruct),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
      assert(scansSrc(q), "stale pair must not serve")
      assert(q.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq ==
        Seq(("t2", 3L, 21L, 4L)), "fallback sees the re-tiered dim")
      JoinView.refresh(spark, l, "fact", Seq((l, "dim")), l, "jvr", jdef)
      assert(!scansSrc(q), "refresh restores the join rewrite")
      assert(q.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq ==
        Seq(("t2", 3L, 21L, 4L)))
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  test("COUNT(DISTINCT <declared col>) serves from the refcounted " +
    "support table: exact grain, subset rollup (overlaps counted " +
    "once), global with WHERE — corpus-scan-free and exact; an " +
    "undeclared column still refuses") {
    val dSchema = TableSchema(Seq(
      ColumnDef("g1", ColumnType.AzString, nullable = false),
      ColumnDef("g2", ColumnType.AzString, nullable = false),
      ColumnDef("b", ColumnType.AzString, nullable = true),
      ColumnDef("v", ColumnType.AzInt, nullable = false)))
    val vD = ViewDef(Seq("g1", "g2"), sumCols = Seq("v"),
      distinctCols = Seq("b"))
    val l = Files.createTempDirectory("azof-mvrw-dv").toString
    val ck = Files.createTempDirectory("azof-mvrw-dv-ck").toString
    AzofWriter.createTable(spark, l, "src", dSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "src",
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "a", "x", "u", 10L),
        Row("2", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "a", "x", "w", 4L),
        Row("3", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "a", "y", "u", 2L), // 'u' overlaps g2 slices of g1 = a
        Row("4", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "b", "x", null, 7L))), // all-null group
        dSchema.toStruct))
    val q0 = MatView.refresh(spark, l, "src", l, "mv", vD, ck)
    assert(q0.awaitTermination(120000))
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", "mv")
    try {
      // exact grain: dv joined at the view's own groups
      val qe = spark.sql(
        "SELECT g1, g2, count(*) AS n, count(DISTINCT b) AS dv " +
          "FROM azof.src GROUP BY g1, g2")
      assert(!scansSrc(qe), "exact-grain distinct must not scan:\n" +
        qe.queryExecution.optimizedPlan)
      assert(qe.collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).sortBy(x => (x._1, x._2)).toSeq ==
        Seq(("a", "x", 2L, 2L), ("a", "y", 1L, 1L), ("b", "x", 1L, 0L)),
        "all-null group serves 0")
      // SUBSET rollup: 'u' lives in both of a's g2 slices — summing
      // per-slice counts would say 3; the support pairs say 2
      val qr = spark.sql(
        "SELECT g1, count(DISTINCT b) AS dv, sum(v) AS sv " +
          "FROM azof.src GROUP BY g1")
      assert(!scansSrc(qr), "rollup distinct must not scan")
      assert(qr.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).sortBy(_._1).toSeq ==
        Seq(("a", 2L, 16L), ("b", 0L, 7L)),
        "overlapping values counted once; all-null group 0")
      // GLOBAL + WHERE on a group column: the predicate confines the
      // support scan too
      val qg = spark.sql(
        "SELECT count(DISTINCT b) AS dv FROM azof.src WHERE g2 = 'x'")
      assert(!scansSrc(qg), "filtered global distinct must not scan")
      assert(qg.collect().map(_.getLong(0)).toSeq == Seq(2L),
        "{x-slice values} = {u, w}")
      // an UNDECLARED distinct column refuses — falls back to the scan
      val qu = spark.sql(
        "SELECT g1, count(DISTINCT v) AS dv FROM azof.src GROUP BY g1")
      assert(scansSrc(qu), "undeclared distinct col must not rewrite")
      assert(qu.collect().nonEmpty)
      // HISTOGRAM shape: GROUP BY the DISTINCT column itself — served
      // from the support pairs incl. the NULL bucket, value cast back
      // to the query column's type
      val qh = spark.sql(
        "SELECT g1, b, count(*) AS n FROM azof.src GROUP BY g1, b")
      assert(!scansSrc(qh), "value histogram must serve from pairs:\n" +
        qh.queryExecution.optimizedPlan)
      assert(qh.collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2))).sortBy(x => (x._1, String.valueOf(x._2))).toSeq ==
        Seq(("a", "u", 2L), ("a", "w", 1L), ("b", null, 1L)),
        "per-group histogram with the NULL bucket")
      // bare GROUP BY b — the classic high-cardinality value count
      val qhg = spark.sql(
        "SELECT b, count(*) AS n FROM azof.src GROUP BY b")
      assert(!scansSrc(qhg), "global histogram must serve from pairs")
      assert(qhg.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(x => String.valueOf(x._1)).toSeq ==
        Seq((null, 1L), ("u", 2L), ("w", 1L)))
      // WHERE on a group column confines both index frames
      val qhw = spark.sql(
        "SELECT b, count(*) AS n FROM azof.src WHERE g2 = 'y' GROUP BY b")
      assert(!scansSrc(qhw), "filtered histogram must serve from pairs")
      assert(qhw.collect().map(r => (r.getString(0), r.getLong(1)))
        .toSeq == Seq(("u", 1L)))
      // SUM-WEIGHTED histogram: measure-per-value serves from the
      // pair-grain sum/nn totals — the `SELECT b, sum(v) … GROUP BY b`
      // dashboard, corpus-free (round 14's Missing #1, closed)
      val qhs = spark.sql(
        "SELECT b, sum(v) AS sv FROM azof.src GROUP BY b")
      assert(!scansSrc(qhs),
        "sum per value must serve from the pair measures:\n" +
          qhs.queryExecution.optimizedPlan)
      assert(qhs.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(x => String.valueOf(x._1)).toSeq ==
        Seq((null, 7L), ("u", 12L), ("w", 4L)),
        "incl. the NULL bucket's sum")
      // count/sum/avg compose at the (groups, value) grain
      val qha = spark.sql(
        "SELECT g1, b, count(*) AS n, sum(v) AS sv, avg(v) AS av " +
          "FROM azof.src GROUP BY g1, b")
      assert(!scansSrc(qha), "measure histogram with avg must serve")
      assert(qha.collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getDouble(4)))
        .sortBy(x => (x._1, String.valueOf(x._2))).toSeq ==
        Seq(("a", "u", 2L, 12L, 6.0), ("a", "w", 1L, 4L, 4.0),
          ("b", null, 1L, 7L, 7.0)))
      // MIN/MAX at the value grain refuses — no pair-grain extrema
      val qhm = spark.sql(
        "SELECT b, min(v) AS mv FROM azof.src GROUP BY b")
      assert(scansSrc(qhm), "min per value is not index-servable")
      assert(qhm.collect().length == 3)
      // a predicate on the distinct column itself refuses
      val qhp = spark.sql(
        "SELECT b, count(*) AS n FROM azof.src WHERE b = 'u' GROUP BY b")
      assert(scansSrc(qhp), "a predicate on the value column refuses")
      assert(qhp.collect().map(r => (r.getString(0), r.getLong(1)))
        .toSeq == Seq(("u", 2L)))
      // exact HEAVY HITTERS in plain SQL: HAVING/ORDER BY/LIMIT compose
      // above the served histogram (preserved output ids)
      val qtop = spark.sql(
        "SELECT b, count(*) AS n FROM azof.src GROUP BY b " +
          "HAVING count(*) > 1 ORDER BY n DESC LIMIT 3")
      assert(!scansSrc(qtop),
        "top-k values must serve from the pairs:\n" +
          qtop.queryExecution.optimizedPlan)
      assert(qtop.collect().map(r => (r.getString(0), r.getLong(1)))
        .toSeq == Seq(("u", 2L)), "exact heavy hitters off the index")
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  test("COUNT(DISTINCT a, b) serves from a declared TUPLE's support " +
    "pairs — any column permutation, exact grain and global; an " +
    "undeclared combination refuses to the scan") {
    val dSchema = TableSchema(Seq(
      ColumnDef("g1", ColumnType.AzString, nullable = false),
      ColumnDef("b", ColumnType.AzString, nullable = true),
      ColumnDef("v", ColumnType.AzInt, nullable = true)))
    val vD = ViewDef(Seq("g1"), distinctCols = Seq("b"),
      distinctTuples = Seq(Seq("b", "v")))
    val l = Files.createTempDirectory("azof-mvrw-tup").toString
    val ck = Files.createTempDirectory("azof-mvrw-tup-ck").toString
    AzofWriter.createTable(spark, l, "src", dSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "src",
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a", "x", 1L),
        Row("2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a", "x", 1L),
        Row("3", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a", "x", 2L),
        Row("4", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a", null, 5L),
        Row("5", Timestamp.from(ts("2024-01-02T00:00:00Z")), "c", "y",
          null))), dSchema.toStruct))
    val q0 = MatView.refresh(spark, l, "src", l, "mv", vD, ck)
    assert(q0.awaitTermination(120000))
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", "mv")
    try {
      val qe = spark.sql(
        "SELECT g1, count(DISTINCT b, v) AS dv FROM azof.src GROUP BY g1")
      assert(!scansSrc(qe), "tuple distinct must serve from pairs:\n" +
        qe.queryExecution.optimizedPlan)
      assert(qe.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq == Seq(("a", 2L), ("c", 0L)),
        "any-null rows skipped (SQL multi-arg COUNT); all-skipped " +
          "group serves 0")
      // column ORDER doesn't change a distinct count — a permutation
      // of the declared tuple serves from the same pairs
      val qp = spark.sql(
        "SELECT g1, count(DISTINCT v, b) AS dv FROM azof.src GROUP BY g1")
      assert(!scansSrc(qp), "permuted tuple must serve from pairs")
      assert(qp.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq == Seq(("a", 2L), ("c", 0L)))
      // global grain off the same pairs
      val qg = spark.sql(
        "SELECT count(DISTINCT b, v) AS dv FROM azof.src")
      assert(!scansSrc(qg), "global tuple distinct must serve")
      assert(qg.collect().map(_.getLong(0)).toSeq == Seq(2L))
      // an UNDECLARED combination refuses — falls back to the scan
      val qu = spark.sql(
        "SELECT g1, count(DISTINCT g1, v) AS dv FROM azof.src GROUP BY g1")
      assert(scansSrc(qu), "undeclared tuple must not rewrite")
      assert(qu.collect().nonEmpty)
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  test("the rewrite MATRIX composes: sum-weighted histograms under " +
    "VERSION pins and WHERE slices, and EVENT-TIME coordinates over " +
    "distinct counts, tuples, and histograms — every cell serves " +
    "corpus-free from the gate-pinned snapshots") {
    val dSchema = TableSchema(Seq(
      ColumnDef("g1", ColumnType.AzString, nullable = false),
      ColumnDef("g2", ColumnType.AzString, nullable = false),
      ColumnDef("b", ColumnType.AzString, nullable = true),
      ColumnDef("v", ColumnType.AzInt, nullable = true)))
    val vD = ViewDef(Seq("g1", "g2"), sumCols = Seq("v"),
      distinctCols = Seq("b"), distinctTuples = Seq(Seq("b", "v")))
    val l = Files.createTempDirectory("azof-mvrw-matrix").toString
    val ck = Files.createTempDirectory("azof-mvrw-matrix-ck").toString
    AzofWriter.createTable(spark, l, "src", dSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "src",
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "a", "x", "u", 10L),
        Row("2", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "a", "x", "u", 4L),
        Row("3", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "a", "y", "w", null),
        Row("4", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "b", "x", null, 7L))), dSchema.toStruct))
    val q0 = MatView.refresh(spark, l, "src", l, "mv", vD, ck)
    assert(q0.awaitTermination(120000))
    val vPin = graft.format.AzofTable(spark, l, "src").currentVersion
    val tPin = "2024-02-01T00:00:00Z" // above the whole corpus
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", "mv")
    try {
      // VERSION-pinned sum histogram
      val qp = spark.sql(
        "SELECT b, count(*) AS n, sum(v) AS sv " +
          s"FROM azof.src VERSION AS OF $vPin GROUP BY b")
      assert(!scansSrc(qp), "pinned sum histogram must serve:\n" +
        qp.queryExecution.optimizedPlan)
      assert(qp.collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2)))
        .sortBy(x => String.valueOf(x._1)).toSeq ==
        Seq((null, 1L, 7L), ("u", 2L, 14L), ("w", 1L, null)),
        "NULL bucket sum + all-null-measure bucket serves NULL")
      // WHERE-sliced sum histogram (slice col outside the grain)
      val qw = spark.sql(
        "SELECT b, sum(v) AS sv FROM azof.src WHERE g2 = 'x' GROUP BY b")
      assert(!scansSrc(qw), "sliced sum histogram must serve")
      assert(qw.collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getLong(1)))
        .sortBy(x => String.valueOf(x._1)).toSeq ==
        Seq((null, 7L), ("u", 14L)))
      // EVENT-TIME coordinate over a sum histogram
      val qth = spark.sql(
        "SELECT b, count(*) AS n, sum(v) AS sv " +
          s"FROM azof.src TIMESTAMP AS OF '$tPin' GROUP BY b")
      assert(!scansSrc(qth), "as-of sum histogram must serve:\n" +
        qth.queryExecution.optimizedPlan)
      assert(qth.collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2)))
        .sortBy(x => String.valueOf(x._1)).toSeq ==
        Seq((null, 1L, 7L), ("u", 2L, 14L), ("w", 1L, null)))
      // EVENT-TIME coordinate over distinct counts + TUPLES
      val qtd = spark.sql(
        "SELECT g1, count(DISTINCT b) AS dv, " +
          "count(DISTINCT b, v) AS dvt " +
          s"FROM azof.src TIMESTAMP AS OF '$tPin' GROUP BY g1")
      assert(!scansSrc(qtd), "as-of distinct + tuple must serve:\n" +
        qtd.queryExecution.optimizedPlan)
      assert(qtd.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).sortBy(_._1).toSeq ==
        Seq(("a", 2L, 2L), ("b", 0L, 0L)),
        "tuple skips any-null rows; all-null group serves 0")
      // the aggregate-free GROUP BY shape (same distinct-only plan
      // path): the embedded dedup must be an Aggregate, never a
      // Deduplicate node — a Deduplicate lands AFTER the optimizer's
      // replace batch and crashes planning (the latent INTERNAL_ERROR
      // this spec first exposed)
      val qg = spark.sql("SELECT g1 FROM azof.src GROUP BY g1")
      assert(!scansSrc(qg), "aggregate-free GROUP BY serves")
      assert(qg.collect().map(_.getString(0)).sorted.toSeq ==
        Seq("a", "b"))
      // a BELOW-corpus coordinate refuses every shape
      val qlow = spark.sql(
        "SELECT b, count(*) AS n FROM azof.src " +
          "TIMESTAMP AS OF '2024-01-01T12:00:00Z' GROUP BY b")
      assert(scansSrc(qlow), "below-corpus coordinate refuses")
      // a MULTI-COLUMN histogram over NULLABLE tuple components
      // SERVES from format-3 pairs (round 16): SQL's GROUP BY b, v
      // keeps partial-null rows, which the pairs carry NULL-token-
      // marked and the split-back decodes to typed NULLs — the served
      // rows must equal the corpus scan's exactly
      val tnSql = "SELECT b, v, count(*) AS n FROM azof.src GROUP BY b, v"
      spark.conf.unset("spark.azof.mv.rewrite")
      val tnTruth = spark.sql(tnSql).collect()
        .map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2)))
        .sortBy(_.toString).toSeq
      spark.conf.set("spark.azof.mv.rewrite", "mv")
      val qtn = spark.sql(tnSql)
      assert(!scansSrc(qtn),
        "nullable tuple components serve from format-3 pairs:\n" +
          qtn.queryExecution.optimizedPlan)
      assert(qtn.collect()
        .map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2)))
        .sortBy(_.toString).toSeq == tnTruth,
        "partial-null GROUP BY rows must round-trip through the pairs")
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
    // the lake::auto conf form names the discovery lake EXPLICITLY
    // (production sessions pointing several lakes at one conf)
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", s"$l::auto")
    try {
      val qa2 = spark.sql(
        "SELECT g1, count(*) AS n FROM azof.src GROUP BY g1")
      assert(!scansSrc(qa2), "lake::auto discovers candidates:\n" +
        qa2.queryExecution.optimizedPlan)
      assert(qa2.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq == Seq(("a", 3L), ("b", 1L)))
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  test("MULTI-COLUMN histograms: GROUP BY over a declared tuple's " +
    "NON-NULLABLE components serves from the tuple pairs with the " +
    "encoded value split back into typed components — counts and " +
    "measures, any component order, WHERE-sliced") {
    val tSchema = TableSchema(Seq(
      ColumnDef("g", ColumnType.AzString, nullable = false),
      ColumnDef("cat", ColumnType.AzString, nullable = false),
      ColumnDef("sub", ColumnType.AzInt, nullable = false),
      ColumnDef("w", ColumnType.AzInt, nullable = false)))
    val vD = ViewDef(Seq("g"), sumCols = Seq("w"),
      distinctTuples = Seq(Seq("cat", "sub")))
    val l = Files.createTempDirectory("azof-mvrw-tuph").toString
    val ck = Files.createTempDirectory("azof-mvrw-tuph-ck").toString
    AzofWriter.createTable(spark, l, "src", tSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "src",
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "a", "c1", 0L, 10L),
        Row("2", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "a", "c1", 0L, 4L),
        Row("3", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "a", "c1", 1L, 2L),
        Row("4", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "b", "c2", 0L, 7L))), tSchema.toStruct))
    val q0 = MatView.refresh(spark, l, "src", l, "mv", vD, ck)
    assert(q0.awaitTermination(120000))
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", "mv")
    try {
      // the classic two-dimension histogram with measures, global grain
      val qt = spark.sql(
        "SELECT cat, sub, count(*) AS n, sum(w) AS sw, avg(w) AS aw " +
          "FROM azof.src GROUP BY cat, sub")
      assert(!scansSrc(qt),
        "tuple histogram must serve from the pairs:\n" +
          qt.queryExecution.optimizedPlan)
      assert(qt.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4)))
        .sortBy(x => (x._1, x._2)).toSeq ==
        Seq(("c1", 0L, 2L, 14L, 7.0), ("c1", 1L, 1L, 2L, 2.0),
          ("c2", 0L, 1L, 7L, 7.0)),
        "typed components split back from the encoded pair value")
      // any component order + the view group alongside
      val qo = spark.sql(
        "SELECT g, sub, cat, count(*) AS n FROM azof.src " +
          "GROUP BY g, sub, cat")
      assert(!scansSrc(qo), "permuted components + group serve")
      assert(qo.collect().map(r => (r.getString(0), r.getLong(1),
        r.getString(2), r.getLong(3))).sortBy(x => (x._1, x._3, x._2))
        .toSeq ==
        Seq(("a", 0L, "c1", 2L), ("a", 1L, "c1", 1L),
          ("b", 0L, "c2", 1L)))
      // WHERE on a view group column slices the pair frame
      val qw = spark.sql(
        "SELECT cat, sub, count(*) AS n FROM azof.src " +
          "WHERE g = 'a' GROUP BY cat, sub")
      assert(!scansSrc(qw), "sliced tuple histogram serves")
      assert(qw.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).sortBy(x => (x._1, x._2)).toSeq ==
        Seq(("c1", 0L, 2L), ("c1", 1L, 1L)))
      // an UNDECLARED column pair refuses
      val qu = spark.sql(
        "SELECT cat, w, count(*) AS n FROM azof.src GROUP BY cat, w")
      assert(scansSrc(qu), "undeclared pair must refuse")
      assert(qu.collect().length == 4)
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  test("AVG/COUNT(c) over a JOIN view serve from its nn_ totals — " +
    "round 13's crash shape: the decomposed nn_ leaf must resolve") {
    import graft.sources.{DimJoin, JoinView, JoinViewDef}
    val jdef = JoinViewDef(Seq("tier"), sumCols = Seq("v"),
      dims = Seq(DimJoin("fk", Seq("tier"))))
    val l = Files.createTempDirectory("azof-mvrw-javg").toString
    val factSchema = TableSchema(Seq(
      ColumnDef("fk", ColumnType.AzString, nullable = false),
      ColumnDef("v", ColumnType.AzInt, nullable = true))) // NULLABLE
    val dimSchema = TableSchema(Seq(
      ColumnDef("tier", ColumnType.AzString, nullable = false)))
    AzofWriter.createTable(spark, l, "fact", factSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "dim", dimSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "dim",
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row("d1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "t1"),
        Row("d2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "t2"))),
        dimSchema.toStruct))
    AzofWriter.commitBase(spark, l, "fact",
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "d1", 10L),
        Row("2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "d1", 4L),
        Row("3", Timestamp.from(ts("2024-01-02T00:00:00Z")), "d1", null),
        Row("4", Timestamp.from(ts("2024-01-02T00:00:00Z")), "d2", null))),
        factSchema.toStruct))
    JoinView.refresh(spark, l, "fact", Seq((l, "dim")), l, "jva", jdef)
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", "jva")
    try {
      // before round 14 this THREW an unresolvable-column
      // AnalysisException inside the optimizer (nn_v missing from the
      // join-view layout) — now it serves, null-skipping exactly
      val q = spark.sql(
        "SELECT tier, avg(v) AS av, count(v) AS nn, sum(v) AS sv " +
          "FROM azof.fact f JOIN azof.dim d ON f.fk = d.key GROUP BY tier")
      assert(!scansSrc(q) && aggregates(q).isEmpty,
        "avg over the join must serve from the view:\n" +
          q.queryExecution.optimizedPlan)
      val got = q.collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getDouble(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3))).sortBy(_._1).toSeq
      assert(got == Seq(("t1", 7.0, 2L, 14L), ("t2", null, 0L, null)),
        "null-skipping avg/count/sum over the nullable measure")
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  test("multi-dim STAR aggregates rewrite: fact ⋈ dim1 ⋈ dim2 in " +
    "either join order serves from the registered star view") {
    import graft.sources.{DimJoin, JoinView, JoinViewDef}
    val jdef = JoinViewDef(Seq("tier", "region"), sumCols = Seq("v"),
      dims = Seq(DimJoin("fk1", Seq("tier")), DimJoin("fk2", Seq("region"))))
    val l = Files.createTempDirectory("azof-mvrw-star").toString
    val factSchema = TableSchema(Seq(
      ColumnDef("fk1", ColumnType.AzString, nullable = false),
      ColumnDef("fk2", ColumnType.AzString, nullable = false),
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
    AzofWriter.commitBase(spark, l, "dim1",
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row("a1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "t1"),
        Row("a2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "t2"))),
        d1Schema.toStruct))
    AzofWriter.commitBase(spark, l, "dim2",
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row("b1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "eu"),
        Row("b2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "us"))),
        d2Schema.toStruct))
    AzofWriter.commitBase(spark, l, "fact",
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "a1", "b1", 10L),
        Row("2", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "a1", "b2", 4L),
        Row("3", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "a2", "b1", 7L))),
        factSchema.toStruct))
    JoinView.refresh(spark, l, "fact",
      Seq((l, "dim1"), (l, "dim2")), l, "jvs", jdef)
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", "jvs")
    try {
      // both dim orders — the matcher is order-insensitive
      for (joins <- Seq(
        "JOIN azof.dim1 d1 ON f.fk1 = d1.key " +
          "JOIN azof.dim2 d2 ON f.fk2 = d2.key",
        "JOIN azof.dim2 d2 ON f.fk2 = d2.key " +
          "JOIN azof.dim1 d1 ON f.fk1 = d1.key")) {
        val q = spark.sql(
          "SELECT tier, region, count(*) AS n, sum(v) AS sv " +
            s"FROM azof.fact f $joins GROUP BY tier, region")
        assert(!scansSrc(q) && aggregates(q).isEmpty,
          "star aggregate must serve from the star view:\n" +
            q.queryExecution.optimizedPlan)
        assert(q.collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3))).sortBy(x => (x._1, x._2)).toSeq ==
          Seq(("t1", "eu", 1L, 10L), ("t1", "us", 1L, 4L),
            ("t2", "eu", 1L, 7L)))
      }
      // a subset rollup over ONE dim's attribute
      val qr = spark.sql(
        "SELECT region, sum(v) AS sv FROM azof.fact f " +
          "JOIN azof.dim1 d1 ON f.fk1 = d1.key " +
          "JOIN azof.dim2 d2 ON f.fk2 = d2.key GROUP BY region")
      assert(!scansSrc(qr), "rollup aggregates the VIEW, not the corpus")
      assert(qr.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq == Seq(("eu", 17L), ("us", 4L)))
      // joining only ONE of the two dims must NOT match the 2-dim view
      val q1 = spark.sql(
        "SELECT tier, count(*) AS n FROM azof.fact f " +
          "JOIN azof.dim1 d1 ON f.fk1 = d1.key GROUP BY tier")
      assert(scansSrc(q1), "a partial star must not serve from the view")
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  test("VERSION-pinned reads rewrite exactly when the pin is provably " +
    "view-identical: fresh pin + tag serve from the view, a pin below " +
    "a state-changing commit falls back, an event-time coordinate " +
    "BELOW existing rows refuses (the covered coordinate serves — " +
    "the round-15 EVENT-TIME test)") {
    val (l, ck) = mkLake("tt")
    AzofWriter.tagVersion(spark, l, "src", "report", Some(2L))
    withConfs(l) {
      def counts(q: org.apache.spark.sql.DataFrame) =
        q.collect().map(r => (r.getString(0), r.getLong(1)))
          .sortBy(_._1).toSeq
      // the pin equals the view's consumed state — serves from the view
      val q2 = spark.sql(
        "SELECT g1, count(*) AS n FROM azof.src VERSION AS OF 2 " +
          "GROUP BY g1")
      assert(!scansSrc(q2),
        "a view-identical pin serves from the view:\n" +
          q2.queryExecution.optimizedPlan)
      assert(counts(q2) == Seq(("a", 3L), ("b", 1L)))
      // …and through a TAG (the reproducible-report shape)
      val qt = spark.sql(
        "SELECT g1, count(*) AS n FROM azof.src VERSION AS OF 'report' " +
          "GROUP BY g1")
      assert(!scansSrc(qt), "tag pin serves from the view")
      assert(counts(qt) == counts(q2))
      // an event-time coordinate BELOW existing rows refuses — the
      // as-of view at t differs from the consumed Current state (rows
      // at 2024-01-02 sit above it), so the gate's leg 1 fails and the
      // query time-travels the scan instead (a coordinate covering the
      // whole corpus SERVES — the round-15 EVENT-TIME test's half)
      val qts = spark.sql(
        "SELECT g1, count(*) AS n FROM azof.src " +
          "TIMESTAMP AS OF '2024-01-01T12:00:00Z' GROUP BY g1")
      assert(scansSrc(qts),
        "a below-corpus coordinate must aggregate the scan")
      // post-pin churn: the view moves past the pin — the pinned read
      // must fall back to time travel, the Current read keeps rewriting
      AzofWriter.commitDelta(spark, l, "src", df(
        ("9", "2024-02-05T00:00:00Z", "b", "y", 50L)),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))      // v3
      val s = MatView.refresh(spark, l, "src", l, "mv", vd, ck)
      assert(s.awaitTermination(120000))
      val q2stale = spark.sql(
        "SELECT g1, count(*) AS n FROM azof.src VERSION AS OF 2 " +
          "GROUP BY g1")
      assert(scansSrc(q2stale),
        "a pin below a state-changing commit must NOT serve:\n" +
          q2stale.queryExecution.optimizedPlan)
      assert(counts(q2stale) == Seq(("a", 3L), ("b", 1L)),
        "fallback time-travels to the pinned truth")
      // pin the POST-delta version dynamically (the tag commit above
      // also took a snapshot number)
      val vNow = graft.format.AzofTable(spark, l, "src").currentVersion
      val q3 = spark.sql(
        s"SELECT g1, count(*) AS n FROM azof.src VERSION AS OF $vNow " +
          "GROUP BY g1")
      assert(!scansSrc(q3), "the refreshed pin serves again")
      assert(counts(q3) == Seq(("a", 3L), ("b", 2L)))
    }
  }

  test("EVENT-TIME AS OF aggregates rewrite when the coordinate " +
    "provably equals the consumed state: table entirely at-or-below " +
    "t, post-cursor commits only above it (the frozen dashboard); a " +
    "backdated delete or a consumed above-t commit refuses to the " +
    "time-traveled scan") {
    val (l, ck) = mkLake("asof")
    AzofWriter.commitDelta(spark, l, "src", df(
      ("5", "2024-02-05T00:00:00Z", "b", "y", 3L)),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    val q1 = MatView.refresh(spark, l, "src", l, "mv", vd, ck)
    assert(q1.awaitTermination(120000))
    val t1 = "2024-03-01T00:00:00Z"
    def asOfSql = s"SELECT g1, count(*) AS n, sum(v) AS sv " +
      s"FROM azof.src TIMESTAMP AS OF '$t1' GROUP BY g1"
    withConfs(l) {
      // SERVE: every file ≤ t1 (base et stat + delta windows), cursor
      // consumed everything — the as-of aggregate is the view rollup
      val qs = spark.sql(asOfSql)
      assert(!scansSrc(qs), "as-of at-or-above the whole corpus must " +
        "serve from the view:\n" + qs.queryExecution.optimizedPlan)
      val truth = Seq(("a", 3L, 16L), ("b", 2L, 10L))
      assert(qs.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).sortBy(_._1).toSeq == truth)
      // FROZEN DASHBOARD: data keeps arriving ABOVE the coordinate and
      // the view does NOT refresh — the un-pinned Current query goes
      // stale (falls back) while TIMESTAMP AS OF t1 keeps serving
      AzofWriter.commitDelta(spark, l, "src", df(
        ("6", "2024-04-05T00:00:00Z", "a", "x", 100L)),
        ts("2024-04-01T00:00:00Z"), ts("2024-05-01T00:00:00Z"))      // v4
      val qCur = spark.sql(
        "SELECT g1, count(*) AS n FROM azof.src GROUP BY g1")
      assert(scansSrc(qCur), "stale Current falls back to the scan")
      val qf = spark.sql(asOfSql)
      assert(!scansSrc(qf),
        "an above-coordinate commit is view-preserving FOR t1:\n" +
          qf.queryExecution.optimizedPlan)
      assert(qf.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).sortBy(_._1).toSeq == truth)
      // BACKDATED DELETE: a tombstone landing at-or-below t1 refuses —
      // and the time-traveled scan it falls back to is CORRECT
      AzofWriter.commitDelete(spark, l, "src", Seq("2"),
        ts("2024-02-20T00:00:00Z"))                                  // v5
      val qb = spark.sql(asOfSql)
      assert(scansSrc(qb), "a delete reaching below the coordinate " +
        "must refuse:\n" + qb.queryExecution.optimizedPlan)
      assert(qb.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).sortBy(_._1).toSeq ==
        Seq(("a", 2L, 12L), ("b", 2L, 10L)),
        "fallback time-travels exactly (key 2 deleted below t1)")
      // CONSUMED above-t state: after the refresh absorbs the deletes
      // and the above-t1 rows, the view itself carries rows above the
      // coordinate — leg 1 fails at the new cursor, still a fallback
      val q2 = MatView.refresh(spark, l, "src", l, "mv", vd, ck)
      assert(q2.awaitTermination(120000))
      val qa = spark.sql(asOfSql)
      assert(scansSrc(qa),
        "a view that consumed above-coordinate rows must refuse")
      assert(qa.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).sortBy(_._1).toSeq ==
        Seq(("a", 2L, 12L), ("b", 2L, 10L)))
    }
  }

  test("spark.azof.mv.rewrite=auto DISCOVERS candidates from the " +
    "lake's definition sidecars: views rewrite with no per-session " +
    "list, non-view tables are skipped cheaply, an empty lake is " +
    "inert, and a view created AFTER the first query is picked up " +
    "(create invalidates the session cache)") {
    val (l, _) = mkLake("auto")
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", "auto")
    try {
      val q = spark.sql(
        "SELECT g1, g2, count(*) AS n, sum(v) AS sv " +
          "FROM azof.src GROUP BY g1, g2")
      assert(!scansSrc(q), "auto-discovered view must serve:\n" +
        q.queryExecution.optimizedPlan)
      assert(q.collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).sortBy(x => (x._1, x._2)).toSeq ==
        Seq(("a", "x", 2L, 12L), ("a", "y", 1L, 4L), ("b", "x", 1L, 7L)))
      // a SECOND source + view created in the same lake AFTER the
      // session cached the listing: create invalidates, the next
      // query over src2 discovers mv2 without any conf change
      AzofWriter.createTable(spark, l, "src2", srcSchema,
        ts("2024-01-01T00:00:00Z"))
      AzofWriter.commitBase(spark, l, "src2", df(
        ("1", "2024-01-02T00:00:00Z", "a", "x", 5L)))
      val ck2 = Files.createTempDirectory("azof-mvrw-auto-ck2").toString
      val q2r = MatView.refresh(spark, l, "src2", l, "mv2", vd, ck2)
      assert(q2r.awaitTermination(120000))
      val q2 = spark.sql(
        "SELECT g1, count(*) AS n FROM azof.src2 GROUP BY g1")
      assert(!scansSrc(q2),
        "the view created after the cache filled must serve:\n" +
          q2.queryExecution.optimizedPlan)
      assert(q2.collect().map(r => (r.getString(0), r.getLong(1)))
        .toSeq == Seq(("a", 1L)))
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
    // an empty lake under auto is inert (no crash, no rewrite)
    val l2 = Files.createTempDirectory("azof-mvrw-auto-empty").toString
    AzofWriter.createTable(spark, l2, "plain", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l2, "plain", df(
      ("1", "2024-01-02T00:00:00Z", "a", "x", 1L)))
    spark.conf.set("spark.azof.path", l2)
    spark.conf.set("spark.azof.mv.rewrite", "auto")
    try {
      val q3 = spark.sql(
        "SELECT g1, count(*) AS n FROM azof.plain GROUP BY g1")
      assert(scansSrc(q3), "no sidecar anywhere: the scan stands")
      assert(q3.collect().map(r => (r.getString(0), r.getLong(1)))
        .toSeq == Seq(("a", 1L)))
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  test("auto-discovery STALENESS hint: a view created by another " +
    "process (cached listing + old lake mtime) is re-listed on the " +
    "next query; while the mtime holds, the cached listing stands " +
    "without a re-list") {
    val (l, _) = mkLake("auto-stale")
    // a second source + view, as if created by a DIFFERENT process:
    // create normally, then re-plant the PRE-CREATE cache state (the
    // one-process invalidation hook cannot fire across JVMs)
    AzofWriter.createTable(spark, l, "src2", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "src2", df(
      ("1", "2024-01-02T00:00:00Z", "a", "x", 5L)))
    val ck2 = Files.createTempDirectory("azof-mvrw-stale-ck2").toString
    val q2r = MatView.refresh(spark, l, "src2", l, "mv2", vd, ck2)
    assert(q2r.awaitTermination(120000))
    val root = new org.apache.hadoop.fs.Path(l)
    val mtime = root.getFileSystem(spark.sessionState.newHadoopConf())
      .getFileStatus(root).getModificationTime
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", "auto")
    try {
      // cached listing NAMES ONLY mv, stamped with the CURRENT mtime:
      // the hint says nothing changed, so the stale listing is honored
      // (one getFileStatus, no re-list) and src2 stays un-rewritten
      MvRewriteRule.primeAutoCacheForTest(l, mtime, Seq("mv"))
      val qHeld = spark.sql(
        "SELECT g1, count(*) AS n FROM azof.src2 GROUP BY g1")
      assert(scansSrc(qHeld),
        "an unchanged mtime must honor the cached listing:\n" +
          qHeld.queryExecution.optimizedPlan)
      // same stale listing under an OLD mtime stamp: the hint fires,
      // the lake re-lists, and mv2 serves with no conf change or
      // session restart
      MvRewriteRule.primeAutoCacheForTest(l, mtime - 1000L, Seq("mv"))
      val qStale = spark.sql(
        "SELECT g1, count(*) AS n FROM azof.src2 GROUP BY g1")
      assert(!scansSrc(qStale),
        "a moved lake mtime must re-list and discover mv2:\n" +
          qStale.queryExecution.optimizedPlan)
      assert(qStale.collect().map(r => (r.getString(0), r.getLong(1)))
        .toSeq == Seq(("a", 1L)))
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  test("the DSv2 catalog surface rewrites too; unset conf is inert") {
    val (l, _) = mkLake("dsv2")
    spark.conf.set("spark.sql.catalog.mvr", classOf[graft.sources.AzofCatalog].getName)
    spark.conf.set("spark.sql.catalog.mvr.path", l)
    try {
      def q = spark.sql(
        "SELECT g1, g2, sum(v) AS sv FROM mvr.src GROUP BY g1, g2")
      assert(scansSrc(q), "no conf, no rewrite")
      spark.conf.set("spark.azof.mv.rewrite", s"$l::mv")
      try {
        assert(aggregates(q).isEmpty && !scansSrc(q),
          "catalog-relation aggregate served from the view:\n" +
            q.queryExecution.optimizedPlan)
        assert(q.collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2))).sortBy(x => (x._1, x._2)).toSeq ==
          Seq(("a", "x", 12L), ("a", "y", 4L), ("b", "x", 7L)))
      } finally spark.conf.unset("spark.azof.mv.rewrite")
    } finally {
      spark.conf.unset("spark.sql.catalog.mvr")
      spark.conf.unset("spark.sql.catalog.mvr.path")
    }
  }

  test("DERIVED group keys rewrite: GROUP BY date_trunc('day', t) is " +
    "served from the bucketed view — exact grain, a rollup over " +
    "(day, g), and alias-insensitive matching; grouping by the RAW " +
    "column refuses") {
    import graft.sources.DerivedGroup
    val tSchema = TableSchema(Seq(
      ColumnDef("g", ColumnType.AzString, nullable = false),
      ColumnDef("t", ColumnType.AzDateTime, nullable = false),
      ColumnDef("v", ColumnType.AzInt, nullable = false)))
    val dview = ViewDef(Seq("day", "g"), sumCols = Seq("v"),
      derivedGroups = Seq(DerivedGroup("day", "date_trunc('day', t)",
        ColumnType.AzDateTime)))
    val l = Files.createTempDirectory("azof-mvrw-der").toString
    val ck = Files.createTempDirectory("azof-mvrw-der-ck").toString
    AzofWriter.createTable(spark, l, "src", tSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "src",
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a",
          Timestamp.from(ts("2024-03-01T06:00:00Z")), 10L),
        Row("2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a",
          Timestamp.from(ts("2024-03-01T23:00:00Z")), 4L),
        Row("3", Timestamp.from(ts("2024-01-02T00:00:00Z")), "b",
          Timestamp.from(ts("2024-03-02T01:00:00Z")), 7L))),
        tSchema.toStruct))
    val q0 = MatView.refresh(spark, l, "src", l, "mv", dview, ck)
    assert(q0.awaitTermination(120000))
    withConfs(l) {
      // exact grain: (bucket, g) — a pure projection of the view
      val q = spark.sql(
        "SELECT date_trunc('day', t) AS d, g, count(*) AS n, " +
          "sum(v) AS sv FROM azof.src GROUP BY date_trunc('day', t), g")
      assert(!scansSrc(q) && aggregates(q).isEmpty,
        "bucketed aggregate must serve from the view:\n" +
          q.queryExecution.optimizedPlan)
      assert(q.collect().map(r => (r.getTimestamp(0).toInstant.toString,
        r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(x => (x._1, x._2)).toSeq == Seq(
        ("2024-03-01T00:00:00Z", "a", 2L, 14L),
        ("2024-03-02T00:00:00Z", "b", 1L, 7L)))
      // rollup to the bucket alone re-sums the view
      val qr = spark.sql(
        "SELECT date_trunc('day', t) AS d, sum(v) AS sv " +
          "FROM azof.src GROUP BY date_trunc('day', t)")
      assert(!scansSrc(qr), "bucket rollup serves from the view")
      assert(qr.collect().map(r => (r.getTimestamp(0).toInstant.toString,
        r.getLong(1))).sortBy(_._1).toSeq == Seq(
        ("2024-03-01T00:00:00Z", 14L), ("2024-03-02T00:00:00Z", 7L)))
      // a DIFFERENT bucketing (month) must refuse
      val qm = spark.sql(
        "SELECT date_trunc('month', t) AS m, count(*) AS n " +
          "FROM azof.src GROUP BY date_trunc('month', t)")
      assert(scansSrc(qm), "month bucket over a day view must not serve")
      // grouping by the RAW timestamp column must refuse too
      val qt = spark.sql(
        "SELECT t, count(*) AS n FROM azof.src GROUP BY t")
      assert(scansSrc(qt), "the raw column is not a view group")
      // WHERE on the bucket (the dashboard shape) commutes onto the
      // view's STORED bucket column
      val qw = spark.sql(
        "SELECT g, count(*) AS n, sum(v) AS sv FROM azof.src " +
          "WHERE date_trunc('day', t) = TIMESTAMP '2024-03-01 00:00:00' " +
          "GROUP BY g")
      assert(!scansSrc(qw),
        "a bucket predicate must filter the view scan:\n" +
          qw.queryExecution.optimizedPlan)
      assert(qw.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).toSeq == Seq(("a", 2L, 14L)))
      // WHERE on the RAW column refuses (not derivable from the view)
      val qwr = spark.sql(
        "SELECT g, count(*) AS n FROM azof.src " +
          "WHERE t > TIMESTAMP '2024-03-01 12:00:00' GROUP BY g")
      assert(scansSrc(qwr), "a raw-column predicate must not serve")
      assert(qwr.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq == Seq(("a", 1L), ("b", 1L)))
    }
  }

  test("STAR derived group keys: GROUP BY (dim attr, date_trunc bucket) " +
    "over fact ⋈ dim serves from the join view through fact bucket " +
    "moves and a dim re-tier; a different bucketing refuses") {
    import graft.sources.{DerivedGroup, DimJoin, JoinView, JoinViewDef}
    val jdef = JoinViewDef(Seq("tier", "day"), sumCols = Seq("v"),
      dims = Seq(DimJoin("fk", Seq("tier"))),
      derivedGroups = Seq(DerivedGroup("day", "date_trunc('day', t)",
        ColumnType.AzDateTime)))
    val factSchema = TableSchema(Seq(
      ColumnDef("fk", ColumnType.AzString, nullable = false),
      ColumnDef("t", ColumnType.AzDateTime, nullable = false),
      ColumnDef("v", ColumnType.AzInt, nullable = false)))
    val dimSchema = TableSchema(Seq(
      ColumnDef("tier", ColumnType.AzString, nullable = false)))
    val l = Files.createTempDirectory("azof-mvrw-starder").toString
    AzofWriter.createTable(spark, l, "fact", factSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "dim", dimSchema,
      ts("2024-01-01T00:00:00Z"))
    def fRow(k: String, fk: String, t: String, v: Long) =
      Row(k, Timestamp.from(ts("2024-01-02T00:00:00Z")), fk,
        Timestamp.from(ts(t)), v)
    AzofWriter.commitBase(spark, l, "dim",
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row("d1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "t1"),
        Row("d2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "t2"))),
        dimSchema.toStruct))
    AzofWriter.commitBase(spark, l, "fact",
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        fRow("1", "d1", "2024-03-01T06:00:00Z", 10L),
        fRow("2", "d1", "2024-03-01T23:00:00Z", 4L),
        fRow("3", "d2", "2024-03-02T01:00:00Z", 7L))),
        factSchema.toStruct))
    def go() =
      JoinView.refresh(spark, l, "fact", Seq((l, "dim")), l, "jvt", jdef)
    go()
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", "jvt")
    try {
      def joins(q: org.apache.spark.sql.DataFrame) =
        q.queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
      def q = spark.sql(
        "SELECT tier, date_trunc('day', t) AS d, count(*) AS n, " +
          "sum(v) AS sv FROM azof.fact f JOIN azof.dim x " +
          "ON f.fk = x.key GROUP BY tier, date_trunc('day', t)")
      def rows = q.collect().map(r => (r.getString(0),
        r.getTimestamp(1).toInstant.toString, r.getLong(2), r.getLong(3)))
        .sortBy(x => (x._1, x._2)).toSeq
      assert(!scansSrc(q) && joins(q).isEmpty,
        "star bucket aggregate must serve from the view:\n" +
          q.queryExecution.optimizedPlan)
      assert(rows == Seq(
        ("t1", "2024-03-01T00:00:00Z", 2L, 14L),
        ("t2", "2024-03-02T00:00:00Z", 1L, 7L)))
      // a fact revision MOVES key 1 across buckets; a dim re-tier moves
      // every d1 fact's tier — both in one catch-up
      AzofWriter.commitDelta(spark, l, "fact",
        spark.createDataFrame(spark.sparkContext.parallelize(Seq(
          fRow("1", "d1", "2024-03-02T05:00:00Z", 11L))),
          factSchema.toStruct),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
      AzofWriter.commitDelta(spark, l, "dim",
        spark.createDataFrame(spark.sparkContext.parallelize(Seq(
          Row("d1", Timestamp.from(ts("2024-02-05T00:00:00Z")), "t9"))),
          dimSchema.toStruct),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
      go()
      assert(!scansSrc(q) && joins(q).isEmpty)
      assert(rows == Seq(
        ("t2", "2024-03-02T00:00:00Z", 1L, 7L),
        ("t9", "2024-03-01T00:00:00Z", 1L, 4L),
        ("t9", "2024-03-02T00:00:00Z", 1L, 11L)),
        "bucket move + re-tier both exact")
      // month bucketing over a day view refuses to the scan+join
      val qm = spark.sql(
        "SELECT tier, date_trunc('month', t) AS m, count(*) AS n " +
          "FROM azof.fact f JOIN azof.dim x ON f.fk = x.key " +
          "GROUP BY tier, date_trunc('month', t)")
      assert(scansSrc(qm), "month bucket over a day star view refuses")
      // WHERE on the bucket commutes onto the star view's stored column
      val qw = spark.sql(
        "SELECT tier, count(*) AS n FROM azof.fact f " +
          "JOIN azof.dim x ON f.fk = x.key " +
          "WHERE date_trunc('day', t) = TIMESTAMP '2024-03-02 00:00:00' " +
          "GROUP BY tier")
      assert(!scansSrc(qw) && joins(qw).isEmpty,
        "a star bucket predicate must filter the view scan:\n" +
          qw.queryExecution.optimizedPlan)
      assert(qw.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq == Seq(("t2", 1L), ("t9", 1L)))
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** A one-dim join lake with a NULLABLE distinct fact column and its
    * view refreshed: facts (a:x, a:x, b:y, a:null) under dim
    * d1→t1, d2→t2.
    */
  private def mkJoinDvLake(tag: String)
      : (String, graft.sources.JoinViewDef) = {
    import graft.sources.{DimJoin, JoinView, JoinViewDef}
    val jdef = JoinViewDef(Seq("tier"), sumCols = Seq("v"),
      dims = Seq(DimJoin("fk", Seq("tier"))), distinctCols = Seq("a"))
    val l = Files.createTempDirectory(s"azof-mvrw-jdv-$tag").toString
    val factSchema = TableSchema(Seq(
      ColumnDef("fk", ColumnType.AzString, nullable = false),
      ColumnDef("v", ColumnType.AzInt, nullable = false),
      ColumnDef("a", ColumnType.AzString, nullable = true)))
    val dimSchema = TableSchema(Seq(
      ColumnDef("tier", ColumnType.AzString, nullable = false)))
    AzofWriter.createTable(spark, l, "fact", factSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "dim", dimSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "dim",
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row("d1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "t1"),
        Row("d2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "t2"))),
        dimSchema.toStruct))
    AzofWriter.commitBase(spark, l, "fact",
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "d1", 10L, "x"),
        Row("2", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "d1", 4L, "x"),
        Row("3", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "d2", 7L, "y"),
        Row("4", Timestamp.from(ts("2024-01-02T00:00:00Z")),
          "d1", 2L, null))),
        factSchema.toStruct))
    JoinView.refresh(spark, l, "fact", Seq((l, "dim")), l, "jdv", jdef)
    (l, jdef)
  }

  test("COUNT(DISTINCT <declared fact col>) over a JOIN serves from " +
    "the star support table at exact, rollup, and global grains; an " +
    "undeclared column refuses to the scan+join") {
    val (l, _) = mkJoinDvLake("main")
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", "jdv")
    try {
      val q = spark.sql(
        "SELECT tier, count(*) AS n, count(DISTINCT a) AS dv " +
          "FROM azof.fact f JOIN azof.dim d ON f.fk = d.key " +
          "GROUP BY tier")
      assert(!scansSrc(q),
        "declared distinct over the join must serve from the view:\n" +
          q.queryExecution.optimizedPlan)
      assert(q.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).sortBy(_._1).toSeq ==
        Seq(("t1", 3L, 1L), ("t2", 1L, 1L)),
        "duplicate 'x' once, the null skipped")
      // global rollup: pairs re-counted with no group
      val qg = spark.sql(
        "SELECT count(DISTINCT a) AS dv, sum(v) AS sv " +
          "FROM azof.fact f JOIN azof.dim d ON d.key = f.fk")
      assert(!scansSrc(qg))
      assert(qg.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((2L, 23L)))
      // an UNDECLARED distinct column refuses — correct off the scan
      val qu = spark.sql(
        "SELECT tier, count(DISTINCT v) AS dv " +
          "FROM azof.fact f JOIN azof.dim d ON f.fk = d.key " +
          "GROUP BY tier")
      assert(scansSrc(qu), "undeclared distinct must not rewrite")
      assert(qu.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq == Seq(("t1", 3L), ("t2", 1L)))
      // STAR histogram: GROUP BY the distinct fact column itself over
      // the join serves from the pairs + totals (NULL bucket incl.)
      val qh = spark.sql(
        "SELECT tier, a, count(*) AS n FROM azof.fact f " +
          "JOIN azof.dim d ON f.fk = d.key GROUP BY tier, a")
      assert(!scansSrc(qh),
        "star value histogram must serve from pairs:\n" +
          qh.queryExecution.optimizedPlan)
      assert(qh.collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2))).sortBy(x => (x._1, String.valueOf(x._2))).toSeq ==
        Seq(("t1", null, 1L), ("t1", "x", 2L), ("t2", "y", 1L)),
        "per-tier star histogram with the NULL bucket")
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  test("EVENT-TIME AS OF star reads rewrite through the per-table " +
    "as-of walks: a coordinate at-or-above every table's consumed " +
    "corpus serves; above-coordinate fact churn (un-refreshed) keeps " +
    "serving; a dim change at-or-below the coordinate refuses to the " +
    "time-traveled join") {
    import graft.sources.JoinView
    val (l, jdef) = mkJoinDvLake("asof")
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", "jdv")
    try {
      def joins(q: org.apache.spark.sql.DataFrame) =
        q.queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
      val t = "2024-02-01T00:00:00Z" // above every committed stamp
      def starSql = "SELECT tier, count(*) AS n, sum(v) AS sv " +
        s"FROM azof.fact TIMESTAMP AS OF '$t' AS f " +
        s"JOIN azof.dim TIMESTAMP AS OF '$t' AS d ON f.fk = d.key " +
        "GROUP BY tier"
      val truth = Seq(("t1", 3L, 16L), ("t2", 1L, 7L))
      val q1 = spark.sql(starSql)
      assert(!scansSrc(q1) && joins(q1).isEmpty,
        "per-table as-of coordinates at-or-above the corpus serve:\n" +
          q1.queryExecution.optimizedPlan)
      assert(q1.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).sortBy(_._1).toSeq == truth)
      // MIXED: fact as-of, dim Current — both walks pass
      val qm = spark.sql(
        s"SELECT tier, count(*) AS n FROM azof.fact TIMESTAMP AS OF " +
          s"'$t' AS f JOIN azof.dim d ON f.fk = d.key GROUP BY tier")
      assert(!scansSrc(qm) && joins(qm).isEmpty, "mixed as-of serves")
      // FROZEN STAR DASHBOARD: fact churn lands ABOVE the coordinate
      // and the view does NOT refresh — the as-of star keeps serving
      AzofWriter.commitDelta(spark, l, "fact",
        spark.createDataFrame(spark.sparkContext.parallelize(Seq(
          Row("9", Timestamp.from(ts("2024-03-05T00:00:00Z")),
            "d1", 99L, "z"))),
          TableSchema(Seq(
            ColumnDef("fk", ColumnType.AzString, nullable = false),
            ColumnDef("v", ColumnType.AzInt, nullable = false),
            ColumnDef("a", ColumnType.AzString, nullable = true)))
            .toStruct),
        ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))
      val qf = spark.sql(starSql)
      assert(!scansSrc(qf) && joins(qf).isEmpty,
        "above-coordinate fact churn is view-preserving for t:\n" +
          qf.queryExecution.optimizedPlan)
      assert(qf.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).sortBy(_._1).toSeq == truth)
      // a DIM change at-or-below the coordinate refuses — the
      // time-traveled join fallback is exact (re-tier et ≤ t)
      AzofWriter.commitDelta(spark, l, "dim",
        spark.createDataFrame(spark.sparkContext.parallelize(Seq(
          Row("d1", Timestamp.from(ts("2024-01-20T00:00:00Z")), "t9"))),
          TableSchema(Seq(ColumnDef("tier", ColumnType.AzString,
            nullable = false))).toStruct),
        ts("2024-01-15T00:00:00Z"), ts("2024-02-01T00:00:00Z"))
      val qb = spark.sql(starSql)
      assert(scansSrc(qb),
        "a dim change at-or-below the coordinate must refuse:\n" +
          qb.queryExecution.optimizedPlan)
      assert(qb.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).sortBy(_._1).toSeq ==
        Seq(("t2", 1L, 7L), ("t9", 3L, 16L)),
        "fallback time-travels the re-tier exactly")
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  test("MIXED per-table EVENT-TIME coordinates: fact AS OF t1 ⋈ dim " +
    "AS OF t2 (t1 ≠ t2) serves when BOTH per-table walks pass, " +
    "refuses when EITHER fails, and a LOWER fact coordinate keeps " +
    "serving past un-consumed fact churn the higher one cannot") {
    val (l, _) = mkJoinDvLake("mixed")
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", "jdv")
    try {
      def joins(q: org.apache.spark.sql.DataFrame) =
        q.queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
      def starSql(tf: String, td: String) =
        "SELECT tier, count(*) AS n, sum(v) AS sv " +
          s"FROM azof.fact TIMESTAMP AS OF '$tf' AS f " +
          s"JOIN azof.dim TIMESTAMP AS OF '$td' AS d ON f.fk = d.key " +
          "GROUP BY tier"
      def got(q: org.apache.spark.sql.DataFrame) =
        q.collect().map(r => (r.getString(0), r.getLong(1),
          r.getLong(2))).sortBy(_._1).toSeq
      val truth = Seq(("t1", 3L, 16L), ("t2", 1L, 7L))
      val q1 = spark.sql(
        starSql("2024-03-01T00:00:00Z", "2024-02-01T00:00:00Z"))
      assert(!scansSrc(q1) && joins(q1).isEmpty,
        "distinct per-table coordinates above each consumed corpus " +
          "serve:\n" + q1.queryExecution.optimizedPlan)
      assert(got(q1) == truth)
      // MIXED PIN KINDS in one query: a VERSION pin on one table and
      // an EVENT-TIME coordinate on the other — each gates through its
      // own walk (freshViewVersionAt vs unchangedSinceAsOf), both pass
      val fv = graft.format.AzofTable(spark, l, "fact").currentVersion
      val dv = graft.format.AzofTable(spark, l, "dim").currentVersion
      val qkv = spark.sql(
        "SELECT tier, count(*) AS n, sum(v) AS sv " +
          s"FROM azof.fact VERSION AS OF $fv AS f " +
          "JOIN azof.dim TIMESTAMP AS OF '2024-02-01T00:00:00Z' AS d " +
          "ON f.fk = d.key GROUP BY tier")
      assert(!scansSrc(qkv) && joins(qkv).isEmpty,
        "version ⋈ event-time pin kinds serve together:\n" +
          qkv.queryExecution.optimizedPlan)
      assert(got(qkv) == truth)
      val qvk = spark.sql(
        "SELECT tier, count(*) AS n, sum(v) AS sv " +
          "FROM azof.fact TIMESTAMP AS OF '2024-03-01T00:00:00Z' AS f " +
          s"JOIN azof.dim VERSION AS OF $dv AS d " +
          "ON f.fk = d.key GROUP BY tier")
      assert(!scansSrc(qvk) && joins(qvk).isEmpty,
        "event-time ⋈ version pin kinds serve together:\n" +
          qvk.queryExecution.optimizedPlan)
      assert(got(qvk) == truth)
      // un-consumed fact churn lands BETWEEN the two candidate fact
      // coordinates (delta window starts 2024-02-10)
      AzofWriter.commitDelta(spark, l, "fact",
        spark.createDataFrame(spark.sparkContext.parallelize(Seq(
          Row("9", Timestamp.from(ts("2024-02-15T00:00:00Z")),
            "d1", 99L, "z"))),
          TableSchema(Seq(
            ColumnDef("fk", ColumnType.AzString, nullable = false),
            ColumnDef("v", ColumnType.AzInt, nullable = false),
            ColumnDef("a", ColumnType.AzString, nullable = true)))
            .toStruct),
        ts("2024-02-10T00:00:00Z"), ts("2024-02-20T00:00:00Z"))
      // the HIGH fact coordinate sees the new delta (start ≤ t1): that
      // walk alone fails → refuse; the fallback time-travels exactly
      val qHigh = spark.sql(
        starSql("2024-03-01T00:00:00Z", "2024-02-01T00:00:00Z"))
      assert(scansSrc(qHigh),
        "a fact coordinate at-or-above un-consumed churn must refuse:\n" +
          qHigh.queryExecution.optimizedPlan)
      assert(got(qHigh) == Seq(("t1", 4L, 115L), ("t2", 1L, 7L)))
      // and the VERSION-pin kind refuses over the same un-consumed
      // span (the pinned walk demands (cursor, current] view-preserving
      // — no event-time exclusion can save it)
      val qvRef = spark.sql(
        "SELECT tier, count(*) AS n, sum(v) AS sv " +
          s"FROM azof.fact VERSION AS OF $fv AS f " +
          "JOIN azof.dim TIMESTAMP AS OF '2024-02-01T00:00:00Z' AS d " +
          "ON f.fk = d.key GROUP BY tier")
      assert(scansSrc(qvRef),
        "a version pin under un-consumed churn must refuse:\n" +
          qvRef.queryExecution.optimizedPlan)
      // the LOW fact coordinate excludes that delta wholesale (start
      // strictly above t1') — the mixed pair serves again, same truth
      val qLow = spark.sql(
        starSql("2024-02-05T00:00:00Z", "2024-02-01T00:00:00Z"))
      assert(!scansSrc(qLow) && joins(qLow).isEmpty,
        "a fact coordinate below the un-consumed delta serves:\n" +
          qLow.queryExecution.optimizedPlan)
      assert(got(qLow) == truth)
      // DIM-side failure alone refuses the pair: a dim change
      // at-or-below t2 while the fact walk still passes
      AzofWriter.commitDelta(spark, l, "dim",
        spark.createDataFrame(spark.sparkContext.parallelize(Seq(
          Row("d2", Timestamp.from(ts("2024-01-20T00:00:00Z")), "t9"))),
          TableSchema(Seq(ColumnDef("tier", ColumnType.AzString,
            nullable = false))).toStruct),
        ts("2024-01-15T00:00:00Z"), ts("2024-02-01T00:00:00Z"))
      val qDim = spark.sql(
        starSql("2024-02-05T00:00:00Z", "2024-02-01T00:00:00Z"))
      assert(scansSrc(qDim),
        "a dim change at-or-below its coordinate must refuse even " +
          "when the fact walk passes:\n" +
          qDim.queryExecution.optimizedPlan)
      assert(got(qDim) == Seq(("t1", 3L, 16L), ("t9", 1L, 7L)),
        "fallback time-travels the dim re-tier exactly")
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  test("VERSION-pinned JOIN reads rewrite exactly when EVERY table's " +
    "pin is provably view-identical; a pin below a state-changing dim " +
    "commit falls back to the time-traveled join") {
    import graft.sources.JoinView
    val (l, jdef) = mkJoinDvLake("pin")
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", "jdv")
    try {
      def joins(q: org.apache.spark.sql.DataFrame) =
        q.queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
      // both pins equal the consumed cursor state — serves from the view
      val q2 = spark.sql(
        "SELECT tier, count(*) AS n, sum(v) AS sv " +
          "FROM azof.fact VERSION AS OF 2 AS f " +
          "JOIN azof.dim VERSION AS OF 2 AS d ON f.fk = d.key " +
          "GROUP BY tier")
      assert(!scansSrc(q2) && joins(q2).isEmpty,
        "view-identical per-table pins serve from the view:\n" +
          q2.queryExecution.optimizedPlan)
      assert(q2.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).sortBy(_._1).toSeq ==
        Seq(("t1", 3L, 16L), ("t2", 1L, 7L)))
      // MIXED pin: fact pinned, dim Current — still provably identical
      val qm = spark.sql(
        "SELECT tier, count(*) AS n FROM azof.fact VERSION AS OF 2 AS f " +
          "JOIN azof.dim d ON f.fk = d.key GROUP BY tier")
      assert(!scansSrc(qm) && joins(qm).isEmpty, "mixed pins serve")
      // dim state changes + refresh: the OLD dim pin must fall back
      // and time-travel (d1 re-tiered to t9 only in the LIVE state)
      AzofWriter.commitDelta(spark, l, "dim",
        spark.createDataFrame(spark.sparkContext.parallelize(Seq(
          Row("d1", Timestamp.from(ts("2024-02-05T00:00:00Z")), "t9"))),
          TableSchema(Seq(ColumnDef("tier", ColumnType.AzString,
            nullable = false))).toStruct),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))  // dim v3
      JoinView.refresh(spark, l, "fact", Seq((l, "dim")), l, "jdv", jdef)
      val qStale = spark.sql(
        "SELECT tier, count(*) AS n FROM azof.fact AS f " +
          "JOIN azof.dim VERSION AS OF 2 AS d ON f.fk = d.key " +
          "GROUP BY tier")
      assert(scansSrc(qStale),
        "a dim pin below its re-tier must NOT serve:\n" +
          qStale.queryExecution.optimizedPlan)
      assert(qStale.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq == Seq(("t1", 3L), ("t2", 1L)),
        "fallback time-travels the dim")
      // pinning the POST-churn dim version serves again
      val vd2 = graft.format.AzofTable(spark, l, "dim").currentVersion
      val qNew = spark.sql(
        "SELECT tier, count(*) AS n FROM azof.fact AS f " +
          s"JOIN azof.dim VERSION AS OF $vd2 AS d ON f.fk = d.key " +
          "GROUP BY tier")
      assert(!scansSrc(qNew) && joins(qNew).isEmpty,
        "the refreshed dim pin serves again")
      assert(qNew.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq == Seq(("t2", 1L), ("t9", 3L)))
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  test("HAVING composes above the rewrite: the Filter over the " +
    "aggregate's output survives on the served frame (exprIds " +
    "preserved by the replacement Project) — grain serve, rollup, " +
    "and a HAVING over an avg tree all plan-gated") {
    val l = Files.createTempDirectory("azof-mvrw-having").toString
    AzofWriter.createTable(spark, l, "src", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "src", df(
      ("1", "2024-01-02T00:00:00Z", "a", "x", 10L),
      ("2", "2024-01-02T00:00:00Z", "a", "y", 4L),
      ("3", "2024-01-02T00:00:00Z", "b", "x", 7L),
      ("4", "2024-01-02T00:00:00Z", "c", "x", 2L)))                  // v2
    val vd = ViewDef(Seq("g1", "g2"), sumCols = Seq("v"))
    val ck = Files.createTempDirectory("azof-mvrw-having-ck").toString
    assert(MatView.refresh(spark, l, "src", l, "hmv", vd, ck)
      .awaitTermination(120000))
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", "hmv")
    try {
      val q1 = spark.sql("SELECT g1, g2, sum(v) AS s FROM azof.src " +
        "GROUP BY g1, g2 HAVING sum(v) > 5")
      assert(!scansSrc(q1), "HAVING at the exact grain must serve:\n" +
        q1.queryExecution.optimizedPlan)
      assert(q1.collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2))).sortBy(x => (x._1, x._2)).toSeq ==
        Seq(("a", "x", 10L), ("b", "x", 7L)))
      val q2 = spark.sql("SELECT g1, sum(v) AS s FROM azof.src " +
        "GROUP BY g1 HAVING avg(v) >= 7")
      assert(!scansSrc(q2), "a HAVING over an avg tree at a rollup " +
        "grain must serve:\n" + q2.queryExecution.optimizedPlan)
      assert(q2.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq == Seq(("a", 14L), ("b", 7L)))
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  test("COST-BASED candidate choice: when two fresh views cover one " +
    "query, the SMALLEST stored grain serves (row-stats estimate), " +
    "not the first-declared; staleness of the winner falls back to " +
    "the other covering candidate") {
    val l = Files.createTempDirectory("azof-mvrw-cost").toString
    AzofWriter.createTable(spark, l, "src", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "src", df(
      ("1", "2024-01-02T00:00:00Z", "a", "x", 10L),
      ("2", "2024-01-02T00:00:00Z", "a", "y", 4L),
      ("3", "2024-01-02T00:00:00Z", "b", "x", 7L),
      ("4", "2024-01-02T00:00:00Z", "b", "y", 2L)))                  // v2
    val fine = ViewDef(Seq("g1", "g2"), sumCols = Seq("v"))
    val coarse = ViewDef(Seq("g1"), sumCols = Seq("v"))
    val ck1 = Files.createTempDirectory("azof-mvrw-cost-ck1").toString
    val ck2 = Files.createTempDirectory("azof-mvrw-cost-ck2").toString
    assert(MatView.refresh(spark, l, "src", l, "mvfine", fine, ck1)
      .awaitTermination(120000))
    assert(MatView.refresh(spark, l, "src", l, "mvcoarse", coarse, ck2)
      .awaitTermination(120000))
    spark.conf.set("spark.azof.path", l)
    // the FINE view is declared FIRST — only the cost choice can pick
    // the coarse one
    spark.conf.set("spark.azof.mv.rewrite", "mvfine,mvcoarse")
    try {
      def servedFrom(q: org.apache.spark.sql.DataFrame): Seq[String] =
        q.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources
              .LogicalRelation => lr.relation match {
            case h: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation =>
              h.location.rootPaths.map(_.toString)
            case _ => Nil
          }
        }.flatten
      val q1 = spark.sql(
        "SELECT g1, sum(v) AS s FROM azof.src GROUP BY g1")
      assert(!scansSrc(q1))
      val paths1 = servedFrom(q1)
      assert(paths1.exists(_.contains("mvcoarse")) &&
        !paths1.exists(_.contains("mvfine")),
        s"the 2-row coarse view must beat the 4-row fine one: $paths1")
      assert(q1.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq == Seq(("a", 14L), ("b", 9L)))
      // a (g1, g2)-grain query only the FINE view covers still serves
      val q2 = spark.sql(
        "SELECT g1, g2, sum(v) AS s FROM azof.src GROUP BY g1, g2")
      assert(!scansSrc(q2) &&
        servedFrom(q2).exists(_.contains("mvfine")))
      // churn + refresh ONLY the fine view: the stale coarse winner
      // drops out and the fresh fine rollup serves
      AzofWriter.commitDelta(spark, l, "src", df(
        ("5", "2024-02-05T00:00:00Z", "b", "x", 100L)),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))      // v3
      // the SAME checkpoint continues the fine view's feed (a fresh
      // checkpoint would replay the whole source as a bootstrap batch)
      assert(MatView.refresh(spark, l, "src", l, "mvfine", fine, ck1)
        .awaitTermination(120000))
      val q3 = spark.sql(
        "SELECT g1, sum(v) AS s FROM azof.src GROUP BY g1")
      assert(!scansSrc(q3) &&
        servedFrom(q3).exists(_.contains("mvfine")) &&
        !servedFrom(q3).exists(_.contains("mvcoarse")),
        "the only FRESH covering candidate serves: " +
          servedFrom(q3) + "\n" + q3.queryExecution.optimizedPlan)
      assert(q3.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq == Seq(("a", 14L), ("b", 109L)),
        "q3 values off; plan:\n" + q3.queryExecution.optimizedPlan +
          "\nexecuted:\n" + q3.queryExecution.executedPlan)
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  test("VAR/STDDEV serve from ss_ sum-of-squares: the DDL infers " +
    "var_samp/stddev_samp/var_pop declarations, the rewrite serves " +
    "the fixed-operand-order rational at the exact grain AND a " +
    "rollup, values equal the decomposition exactly, a one-row group " +
    "serves NULL var_samp, and an UNDECLARED column falls back") {
    val l = Files.createTempDirectory("azof-mvrw-var").toString
    val s2 = TableSchema(Seq(
      ColumnDef("g1", ColumnType.AzString, nullable = false),
      ColumnDef("g2", ColumnType.AzString, nullable = false),
      ColumnDef("w", ColumnType.AzInt, nullable = true),
      ColumnDef("u", ColumnType.AzInt, nullable = false)))
    AzofWriter.createTable(spark, l, "src", s2,
      ts("2024-01-01T00:00:00Z"))
    def rows(xs: (String, String, String, Any, Long)*) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(xs.map { case (k, a, b, w, u) =>
          Row(k, Timestamp.from(ts("2024-01-02T00:00:00Z")), a, b,
            w match { case null => null; case x: Long => x }, u) }),
        s2.toStruct)
    AzofWriter.commitBase(spark, l, "src", rows(
      ("1", "a", "x", 10L, 1L), ("2", "a", "x", 4L, 2L),
      ("3", "a", "y", 7L, 3L), ("4", "b", "x", 9L, 4L),
      ("5", "a", "y", null, 5L)))                                    // v2
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", "vmv")
    try {
      spark.sql("CREATE MATERIALIZED VIEW vmv AS SELECT g1, g2, " +
        "count(*) AS n, sum(w) AS s, var_samp(w) AS vs, " +
        "stddev_samp(w) AS sd, var_pop(w) AS vp " +
        "FROM azof.src GROUP BY g1, g2").collect()
      val (_, _, vd) = MatView.readDef(spark, l, "vmv").get
      assert(vd.varCols == Seq("w") && vd.sumCols == Seq("w"),
        vd.toString)
      // exact grain: (a,x) has w ∈ {10,4} → var_samp 18, stddev
      // sqrt(18), var_pop 9; (a,y) has ONE non-null w → var_samp NULL
      // but var_pop 0.0; (b,x) one value likewise
      val q1 = spark.sql("SELECT g1, g2, var_samp(w) AS vs, " +
        "stddev_samp(w) AS sd, var_pop(w) AS vp FROM azof.src " +
        "GROUP BY g1, g2")
      assert(!scansSrc(q1), "declared var must serve:\n" +
        q1.queryExecution.optimizedPlan)
      val got1 = q1.collect().map(r => ((r.getString(0), r.getString(1)),
        (if (r.isNullAt(2)) null else r.getDouble(2),
          if (r.isNullAt(3)) null else r.getDouble(3),
          if (r.isNullAt(4)) null else r.getDouble(4)))).toMap
      assert(got1(("a", "x")) == ((18.0, math.sqrt(18.0), 9.0)) &&
        got1(("a", "y")) == ((null, null, 0.0)) &&
        got1(("b", "x")) == ((null, null, 0.0)), got1.toString)
      // ROLLUP grain: g1 = a has w ∈ {10,4,7}, n=3, s=21, ss=165 →
      // var_samp = (165 − 441/3)/2 = 9, var_pop = 6
      val q2 = spark.sql("SELECT g1, var_samp(w) AS vs, " +
        "var_pop(w) AS vp FROM azof.src GROUP BY g1")
      assert(!scansSrc(q2), "rollup var must serve:\n" +
        q2.queryExecution.optimizedPlan)
      val got2 = q2.collect().map(r => (r.getString(0),
        (if (r.isNullAt(1)) null else r.getDouble(1),
          if (r.isNullAt(2)) null else r.getDouble(2)))).toMap
      assert(got2("a") == (((165.0 - 441.0 / 3.0) / 2.0, 6.0)) &&
        got2("b") == ((null, 0.0)), got2.toString)
      // the UNDECLARED column u falls back to the corpus
      assert(scansSrc(spark.sql(
        "SELECT g1, var_samp(u) AS vu FROM azof.src GROUP BY g1")))
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  test("SNOWFLAKE chain pins: VERSION AS OF on all three tables " +
    "serves when every pin is view-identical (the FLATTENED pin " +
    "vector walks the sub too); a SUB pin below its re-region " +
    "refuses and time-travels; the refreshed sub pin serves again") {
    import graft.sources.{DimJoin, JoinView, JoinViewDef}
    val l = Files.createTempDirectory("azof-mvrw-snowpin").toString
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
    val at0 = Timestamp.from(ts("2024-01-02T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "sub", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("s1", at0, "r1"), Row("s2", at0, "r2"))),
      subSchema.toStruct))                                           // v2
    AzofWriter.commitBase(spark, l, "dim", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("d1", at0, "s1", "t1"), Row("d2", at0, "s2", "t2"))),
      dimSchema.toStruct))                                           // v2
    AzofWriter.commitBase(spark, l, "fact", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("1", at0, "d1", 10L), Row("2", at0, "d1", 4L),
        Row("3", at0, "d2", 7L))),
      factSchema.toStruct))                                          // v2
    val sdef = JoinViewDef(Seq("tier", "region"), sumCols = Seq("v"),
      dims = Seq(DimJoin("fk", Seq("tier"),
        subs = Seq(DimJoin("sfk", Seq("region"))))))
    JoinView.refresh(spark, l, "fact", Seq((l, "dim"), (l, "sub")),
      l, "sjv", sdef)
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", "sjv")
    try {
      def joins(q: org.apache.spark.sql.DataFrame) =
        q.queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
      def chain(subPin: String) =
        "SELECT tier, region, count(*) AS n, sum(v) AS sv " +
          "FROM azof.fact VERSION AS OF 2 AS f " +
          "JOIN azof.dim VERSION AS OF 2 AS d ON f.fk = d.key " +
          s"JOIN azof.sub $subPin r ON d.sfk = r.key " +
          "GROUP BY tier, region"
      val q2 = spark.sql(chain("VERSION AS OF 2"))
      assert(!scansSrc(q2) && joins(q2).isEmpty,
        "view-identical pins through the chain serve:\n" +
          q2.queryExecution.optimizedPlan)
      assert(q2.collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq ==
        Seq(("t1", "r1", 2L, 14L), ("t2", "r2", 1L, 7L)))
      // SUB churn + refresh: the OLD sub pin refuses and time-travels
      AzofWriter.commitDelta(spark, l, "sub", spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row("s1", Timestamp.from(ts("2024-02-05T00:00:00Z")), "r9"))),
        subSchema.toStruct),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))  // sub v3
      JoinView.refresh(spark, l, "fact", Seq((l, "dim"), (l, "sub")),
        l, "sjv", sdef)
      val qStale = spark.sql(chain("VERSION AS OF 2"))
      assert(scansSrc(qStale),
        "a sub pin below its re-region must NOT serve:\n" +
          qStale.queryExecution.optimizedPlan)
      assert(qStale.collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2))).sortBy(_._1).toSeq ==
        Seq(("t1", "r1", 2L), ("t2", "r2", 1L)),
        "fallback time-travels the sub")
      val vs = graft.format.AzofTable(spark, l, "sub").currentVersion
      val qNew = spark.sql(chain(s"VERSION AS OF $vs"))
      assert(!scansSrc(qNew) && joins(qNew).isEmpty,
        "the refreshed sub pin serves again")
      assert(qNew.collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2))).sortBy(_._1).toSeq ==
        Seq(("t1", "r9", 2L), ("t2", "r2", 1L)))
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  test("filtered-view rewrite matrix: the exact WHERE serves; an " +
    "IMPLYING subset (g1 = 'a' under g1 IN ('a','b')) serves with the " +
    "residue applied; a superset or missing WHERE falls back; a " +
    "MEASURE predicate serves only its exact spelling") {
    val l = Files.createTempDirectory("azof-mvrw-filt").toString
    val ck1 = Files.createTempDirectory("azof-mvrw-filt-ck1").toString
    val ck2 = Files.createTempDirectory("azof-mvrw-filt-ck2").toString
    AzofWriter.createTable(spark, l, "src", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "src", df(
      ("1", "2024-01-02T00:00:00Z", "a", "x", 10L),
      ("2", "2024-01-02T00:00:00Z", "a", "y", 4L),
      ("3", "2024-01-02T00:00:00Z", "b", "x", 7L),
      ("4", "2024-01-02T00:00:00Z", "c", "x", 2L)))                  // v2
    val fvd = ViewDef(Seq("g1", "g2"), sumCols = Seq("v"),
      filter = Some("g1 IN ('a', 'b')"))
    assert(MatView.refresh(spark, l, "src", l, "mvflt", fvd, ck1)
      .awaitTermination(120000))
    // a second view filtered on a MEASURE column (v is not a group
    // col — membership is still per-row-exact; serving demands the
    // exact spelling because the residue could never apply to the
    // view scan)
    val mvd = ViewDef(Seq("g1"), sumCols = Seq("v"),
      filter = Some("v > 5"))
    assert(MatView.refresh(spark, l, "src", l, "mvmeas", mvd, ck2)
      .awaitTermination(120000))
    spark.conf.set("spark.azof.path", l)
    spark.conf.set("spark.azof.mv.rewrite", "mvflt,mvmeas")
    try {
      def got(q: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
        q.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
      // exact spelling serves from the filtered view
      val q1 = spark.sql("SELECT g1, count(*) AS n, sum(v) AS s " +
        "FROM azof.src WHERE g1 IN ('a', 'b') GROUP BY g1")
      assert(!scansSrc(q1), "exact filter spelling must serve:\n" +
        q1.queryExecution.optimizedPlan)
      assert(got(q1) == Seq(Seq("a", 2L, 14L), Seq("b", 1L, 7L)))
      // implication: g1 = 'a' ⊆ g1 IN ('a','b') — serves, residue
      // applied to the (group-cardinality) view scan
      val q2 = spark.sql("SELECT g1, count(*) AS n FROM azof.src " +
        "WHERE g1 = 'a' GROUP BY g1")
      assert(!scansSrc(q2), "an implying subset must serve:\n" +
        q2.queryExecution.optimizedPlan)
      assert(got(q2) == Seq(Seq("a", 2L)))
      // a SUPERSET cannot be answered from the filtered view
      assert(scansSrc(spark.sql("SELECT g1, count(*) AS n " +
        "FROM azof.src WHERE g1 IN ('a','b','c') GROUP BY g1")),
        "a superset predicate must fall back")
      // neither can the unfiltered question — and the MEASURE view's
      // grain (g1 alone) must not hijack it either
      assert(scansSrc(spark.sql(
        "SELECT g1, count(*) AS n FROM azof.src GROUP BY g1")))
      // the measure filter serves its exact spelling only
      val q3 = spark.sql("SELECT g1, count(*) AS n, sum(v) AS s " +
        "FROM azof.src WHERE v > 5 GROUP BY g1")
      assert(!scansSrc(q3), "the exact measure spelling must serve:\n" +
        q3.queryExecution.optimizedPlan)
      assert(got(q3) == Seq(Seq("a", 1L, 10L), Seq("b", 1L, 7L)))
      assert(scansSrc(spark.sql("SELECT g1, count(*) AS n " +
        "FROM azof.src WHERE v > 6 GROUP BY g1")),
        "a different measure bound must fall back (no range " +
          "implication)")
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
    }
  }

  test("opt-in approx rewrite: spark.azof.mv.rewrite.approx serves " +
    "approx_count_distinct from the hll_ sketch at exact/rollup/" +
    "global grains within 5% of truth; DEFAULT OFF; the exact conf " +
    "never serves it; a stricter rsd and staleness fall back") {
    val l = Files.createTempDirectory("azof-mvrw-hllrw").toString
    val ck = Files.createTempDirectory("azof-mvrw-hllrw-ck").toString
    val schema = TableSchema(Seq(
      ColumnDef("g1", ColumnType.AzString, nullable = false),
      ColumnDef("g2", ColumnType.AzString, nullable = false),
      ColumnDef("a", ColumnType.AzString, nullable = true)))
    AzofWriter.createTable(spark, l, "src", schema,
      ts("2024-01-01T00:00:00Z"))
    val raw = (1 to 600).map { i =>
      Row(i.toString, Timestamp.from(ts("2024-01-02T00:00:00Z")),
        if (i % 2 == 0) "a" else "b", if (i % 3 == 0) "x" else "y",
        if (i % 11 == 0) null else s"v${i % 200}")
    }
    val rawDf = spark.createDataFrame(
      spark.sparkContext.parallelize(raw), schema.toStruct)
    AzofWriter.commitBase(spark, l, "src", rawDf)                    // v2
    val avd = ViewDef(Seq("g1", "g2"), distinctCols = Seq("a"),
      approxCols = Seq("a"))
    val q0 = MatView.refresh(spark, l, "src", l, "amv", avd, ck)
    assert(q0.awaitTermination(120000))
    // truth from the raw frame (null-skipping distinct per grain)
    import org.apache.spark.sql.functions.{col, countDistinct}
    def truth(groups: String*): Map[Seq[String], Long] =
      (if (groups.isEmpty)
        rawDf.agg(countDistinct(col("a")).as("dv"))
      else rawDf.groupBy(groups.map(col): _*)
        .agg(countDistinct(col("a")).as("dv")))
        .collect().map(r => (groups.indices.map(r.getString),
          r.getLong(groups.size))).toMap
    def within5(got: Map[Seq[String], Long],
        want: Map[Seq[String], Long]): Unit = {
      assert(got.keySet == want.keySet, s"$got vs $want")
      got.foreach { case (k, est) =>
        assert(math.abs(est.toDouble / want(k) - 1.0) <= 0.05,
          s"group $k: estimate $est vs exact ${want(k)}") }
    }
    spark.conf.set("spark.azof.path", l)
    try {
      def adv(sql: String, nGroups: Int): Map[Seq[String], Long] =
        spark.sql(sql).collect()
          .map(r => ((0 until nGroups).map(r.getString),
            r.getLong(nGroups))).toMap
      val qExact = "SELECT g1, g2, approx_count_distinct(a) AS adv " +
        "FROM azof.src GROUP BY g1, g2"
      val qRoll = "SELECT g1, approx_count_distinct(a) AS adv " +
        "FROM azof.src GROUP BY g1"
      val qGlob = "SELECT approx_count_distinct(a) AS adv FROM azof.src"
      // DEFAULT OFF: no conf, no serve
      assert(scansSrc(spark.sql(qExact)), "approx rewrite defaults OFF")
      // the EXACT conf must never serve an approx aggregate (the
      // estimate would silently change query results)
      spark.conf.set("spark.azof.mv.rewrite", "amv")
      assert(scansSrc(spark.sql(qExact)),
        "the exact conf must never serve approx_count_distinct")
      // …while exact shapes over the same view do serve through it
      assert(!scansSrc(spark.sql(
        "SELECT g1, count(DISTINCT a) AS dv FROM azof.src GROUP BY g1")))
      spark.conf.unset("spark.azof.mv.rewrite")
      // opt in: exact grain (per-row estimate), subset rollup and the
      // global grain (per-position MERGE, then one estimate)
      spark.conf.set("spark.azof.mv.rewrite.approx", "amv")
      val qe = spark.sql(qExact)
      assert(!scansSrc(qe), "exact-grain approx must serve:\n" +
        qe.queryExecution.optimizedPlan)
      within5(adv(qExact, 2), truth("g1", "g2"))
      val qr = spark.sql(qRoll)
      assert(!scansSrc(qr), "rollup-grain approx must serve")
      within5(adv(qRoll, 1), truth("g1"))
      val qg = spark.sql(qGlob)
      assert(!scansSrc(qg), "global-grain approx must serve")
      within5(adv(qGlob, 0), truth())
      // a MIXED aggregate list serves: exact leaves stay exact
      val qMix = spark.sql("SELECT g1, count(*) AS n, " +
        "count(DISTINCT a) AS dv, approx_count_distinct(a) AS adv " +
        "FROM azof.src GROUP BY g1")
      assert(!scansSrc(qMix))
      val mixed = qMix.collect()
        .map(r => Seq(r.getString(0)) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(mixed(Seq("a"))._1 == 300L && mixed(Seq("b"))._1 == 300L)
      assert(mixed.view.mapValues(_._2).toMap ==
        truth("g1"), "the exact distinct twin is EXACT, not estimated")
      // an rsd STRICTER than the stored sketch's (~1.6%) refuses —
      // the view cannot deliver the requested precision
      assert(scansSrc(spark.sql(
        "SELECT approx_count_distinct(a, 0.005) AS adv FROM azof.src")),
        "a stricter rsd than the sketch's must fall back")
      assert(!scansSrc(spark.sql(
        "SELECT approx_count_distinct(a, 0.03) AS adv FROM azof.src")),
        "a looser rsd serves")
      // staleness falls back; refresh restores
      AzofWriter.commitDelta(spark, l, "src",
        spark.createDataFrame(spark.sparkContext.parallelize(Seq(
          Row("601", Timestamp.from(ts("2024-02-05T00:00:00Z")),
            "a", "x", "fresh1"))), schema.toStruct),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))      // v3
      assert(scansSrc(spark.sql(qExact)), "stale view must NOT serve")
      val q1 = MatView.refresh(spark, l, "src", l, "amv", avd, ck)
      assert(q1.awaitTermination(120000))
      assert(!scansSrc(spark.sql(qExact)), "refresh restores the serve")
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
      spark.conf.unset("spark.azof.mv.rewrite.approx")
    }
  }

  test("opt-in approx rewrite, star twin: the join query's " +
    "approx_count_distinct serves from the join view's sketches under " +
    "the approx conf only (single/star symmetry)") {
    import graft.sources.{DimJoin, JoinView, JoinViewDef}
    val l = Files.createTempDirectory("azof-mvrw-hllrwj").toString
    val factSchema = TableSchema(Seq(
      ColumnDef("fk", ColumnType.AzString, nullable = false),
      ColumnDef("a", ColumnType.AzString, nullable = true)))
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
    val factRaw = (1 to 400).map { i =>
      Row(i.toString, Timestamp.from(ts("2024-01-02T00:00:00Z")),
        if (i % 3 == 0) "d1" else "d2",
        if (i % 13 == 0) null else s"w${i % 150}")
    }
    val factDf = spark.createDataFrame(
      spark.sparkContext.parallelize(factRaw), factSchema.toStruct)
    AzofWriter.commitBase(spark, l, "fact", factDf)
    val jdef = JoinViewDef(Seq("tier"),
      dims = Seq(DimJoin("fk", Seq("tier"))),
      distinctCols = Seq("a"), approxCols = Seq("a"))
    JoinView.refresh(spark, l, "fact", Seq((l, "dim")), l, "ajv", jdef)
    spark.conf.set("spark.azof.path", l)
    try {
      val q = "SELECT tier, approx_count_distinct(a) AS adv " +
        "FROM azof.fact f JOIN azof.dim d ON f.fk = d.key GROUP BY tier"
      assert(scansSrc(spark.sql(q)), "defaults OFF (star)")
      spark.conf.set("spark.azof.mv.rewrite", "ajv")
      assert(scansSrc(spark.sql(q)),
        "the exact conf must never serve approx (star)")
      spark.conf.unset("spark.azof.mv.rewrite")
      spark.conf.set("spark.azof.mv.rewrite.approx", "ajv")
      val served = spark.sql(q)
      assert(!scansSrc(served), "approx conf serves the star shape:\n" +
        served.queryExecution.optimizedPlan)
      import org.apache.spark.sql.functions.{col, countDistinct, when}
      val want = factDf
        .withColumn("tier", when(col("fk") === "d1", "t1").otherwise("t2"))
        .groupBy("tier").agg(countDistinct(col("a")).as("dv"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      served.collect().foreach { r =>
        val (tier, est) = (r.getString(0), r.getLong(1))
        assert(math.abs(est.toDouble / want(tier) - 1.0) <= 0.05,
          s"tier $tier: estimate $est vs exact ${want(tier)}")
      }
    } finally {
      spark.conf.unset("spark.azof.path")
      spark.conf.unset("spark.azof.mv.rewrite")
      spark.conf.unset("spark.azof.mv.rewrite.approx")
    }
  }
}
