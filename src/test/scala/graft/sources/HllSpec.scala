package graft.sources

import graft.TestSpark
import graft.format._
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** The views' APPROX-DISTINCT sketch columns: deterministic HLL
  * register strings maintained append-only (old ∪ new per-position
  * max), served at the view's grain, subset rollups, and globally by
  * MERGING sketches (never summing estimates) — with the small-range
  * estimate exact-in-practice (linear counting) at spec scale, a LOUD
  * refusal on any pre-imaged batch (no inverse), and the epoch rebuild
  * as the remedy. Both view kinds.
  */
class HllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val srcSchema = TableSchema(Seq(
    ColumnDef("g", ColumnType.AzString, nullable = false),
    ColumnDef("a", ColumnType.AzString, nullable = true)))

  private val vd = ViewDef(Seq("g"), distinctCols = Seq("a"),
    approxCols = Seq("a"))

  private def ts(s: String) = Instant.parse(s)

  private def df(rows: (String, String, String, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, g, a) =>
        Row(k, Timestamp.from(ts(t)), g, a) }),
      srcSchema.toStruct)

  private def approx(l: String, by: Seq[String], tbl: String = "mv") =
    MatView.approxDistinct(spark, l, tbl, vd, "a", by).collect()

  test("sketches are deterministic, merge across refreshes, and the " +
    "estimate equals the exact count at spec scale (linear counting); " +
    "rollup and global grains merge sketches, never sum estimates") {
    val l = Files.createTempDirectory("azof-hll").toString
    val ck = Files.createTempDirectory("azof-hll-ck").toString
    AzofWriter.createTable(spark, l, "src", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "src", df(
      (1 to 60).map(i =>
        (i.toString, "2024-01-02T00:00:00Z", s"g${i % 3}",
          s"v${i % 20}")): _*))
    def refresh(): Unit = {
      val q = MatView.refresh(spark, l, "src", l, "mv", vd, ck)
      assert(q.awaitTermination(120000))
    }
    refresh()
    // per-group: values v0..v19 spread over 3 groups — exact counts
    // from the sibling support table, estimates must MATCH them (all
    // registers in the linear-counting regime at this cardinality)
    def exact(by: Seq[String]) =
      MatView.countDistinct(spark, l, "mv", vd, "a", by).collect()
        .map(r => (if (by.isEmpty) "" else r.getString(0),
          r.getLong(if (by.isEmpty) 0 else 1))).sortBy(_._1).toSeq
    def est(by: Seq[String]) = approx(l, by)
      .map(r => (if (by.isEmpty) "" else r.getString(0),
        r.getLong(if (by.isEmpty) 0 else 1))).sortBy(_._1).toSeq
    assert(est(Seq("g")) == exact(Seq("g")), s"${est(Seq("g"))}")
    assert(est(Nil) == exact(Nil), "global merge must estimate 20")
    // determinism: the stored sketch is a pure function of the values
    val sk1 = graft.operators.AzofScan.scan(spark, l, "mv")
      .select("g", "hll_a").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    // a second APPEND refresh with previously-seen values must leave
    // the sketches bit-identical (idempotent max), new values move it
    AzofWriter.commitDelta(spark, l, "src", df(
      (101 to 120).map(i =>
        (i.toString, "2024-02-05T00:00:00Z", s"g${i % 3}",
          s"v${i % 20}")): _*),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
    refresh()
    val sk2 = graft.operators.AzofScan.scan(spark, l, "mv")
      .select("g", "hll_a").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(sk1 == sk2, "re-seen values must not move any register")
    AzofWriter.commitDelta(spark, l, "src", df(
      (201 to 230).map(i =>
        (i.toString, "2024-03-05T00:00:00Z", s"g${i % 3}",
          s"w${i % 25}")): _*),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))
    refresh()
    assert(est(Seq("g")) == exact(Seq("g")))
    assert(est(Nil) == exact(Nil), "global now 45 distinct values")
  }

  test("a pre-imaged batch (revision or delete) refuses LOUDLY naming " +
    "the epoch remedy; rebuildEpoch retrains the sketch from the live " +
    "corpus and serves again") {
    val l = Files.createTempDirectory("azof-hll-del").toString
    val ck = Files.createTempDirectory("azof-hll-del-ck").toString
    AzofWriter.createTable(spark, l, "src", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "src", df(
      ("1", "2024-01-02T00:00:00Z", "g0", "x"),
      ("2", "2024-01-02T00:00:00Z", "g0", "y"),
      ("3", "2024-01-02T00:00:00Z", "g1", "x")))
    val q = MatView.refresh(spark, l, "src", l, "mv", vd, ck)
    assert(q.awaitTermination(120000))
    AzofWriter.commitDelete(spark, l, "src", Seq("2"),
      ts("2024-02-05T00:00:00Z"))
    val e = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] {
      val q2 = MatView.refresh(spark, l, "src", l, "mv", vd, ck)
      q2.awaitTermination(120000); ()
    }
    assert(e.getMessage.contains("mv-rebuild") ||
      e.getCause.getMessage.contains("mv-rebuild"), e.getMessage)
    // the hatch: retrain into a fresh epoch table — estimate == exact
    // over the post-delete live corpus
    MatView.rebuildEpoch(spark, l, "src", l, "mv_e2", vd,
      ts("2024-03-01T00:00:00Z"))
    val got = approx(l, Seq("g"), "mv_e2")
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == Seq(("g0", 1L), ("g1", 1L)), got.toString)
  }

  test("star twin: fact-append refreshes maintain the sketch; dim " +
    "churn (facts move groups) refuses loudly; jv rebuild retrains; " +
    "all-NULL groups estimate 0") {
    val factSchema = TableSchema(Seq(
      ColumnDef("fk", ColumnType.AzString, nullable = false),
      ColumnDef("a", ColumnType.AzString, nullable = true)))
    val dimSchema = TableSchema(Seq(
      ColumnDef("tier", ColumnType.AzString, nullable = false)))
    val jdef = JoinViewDef(Seq("tier"),
      dims = Seq(DimJoin("fk", Seq("tier"))), approxCols = Seq("a"))
    def facts(rows: (String, String, String)*) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (k, fk, a) =>
          Row(k, Timestamp.from(ts("2024-01-02T00:00:00Z")), fk,
            a match { case "" => null; case x => x }) }),
        factSchema.toStruct)
    val l = Files.createTempDirectory("azof-hll-jv").toString
    AzofWriter.createTable(spark, l, "fact", factSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, l, "dim", dimSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "dim", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("d1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "t1"),
        Row("d2", Timestamp.from(ts("2024-01-02T00:00:00Z")), "t2"))),
      dimSchema.toStruct))
    AzofWriter.commitBase(spark, l, "fact", facts(
      ("1", "d1", "x"), ("2", "d1", "y"), ("3", "d1", "x"),
      ("4", "d2", "")))
    JoinView.refresh(spark, l, "fact", Seq((l, "dim")), l, "jv", jdef)
    def est() = JoinView.approxDistinct(spark, l, "jv", jdef, "a",
      Seq("tier")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(est() == Seq(("t1", 2L), ("t2", 0L)), est().toString)
    // fact APPEND keeps maintaining
    AzofWriter.commitDelta(spark, l, "fact", facts(("5", "d2", "z")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
    JoinView.refresh(spark, l, "fact", Seq((l, "dim")), l, "jv", jdef)
    assert(est() == Seq(("t1", 2L), ("t2", 1L)))
    // a DIM re-tier moves live facts across groups — no inverse
    AzofWriter.commitDelta(spark, l, "dim", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("d1", Timestamp.from(ts("2024-03-05T00:00:00Z")), "t9"))),
      dimSchema.toStruct),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))
    val e = intercept[IllegalStateException] {
      JoinView.refresh(spark, l, "fact", Seq((l, "dim")), l, "jv", jdef)
    }
    assert(e.getMessage.contains("jv-rebuild"), e.getMessage)
    JoinView.rebuildEpoch(spark, l, "fact", Seq((l, "dim")), l, "jv2",
      jdef, ts("2024-05-01T00:00:00Z"))
    val got2 = JoinView.approxDistinct(spark, l, "jv2", jdef, "a",
      Seq("tier")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got2 == Seq(("t2", 1L), ("t9", 2L)), got2.toString)
  }

  test("merge is a commutative, associative, idempotent monoid with " +
    "Empty as identity (property over random register strings)") {
    val rnd = new scala.util.Random(42)
    def randomSketch(): String =
      (0 until Hll.M).map(_ => ('A' + rnd.nextInt(54)).toChar).mkString
    def merge2(a: String, b: String): String = {
      // programmatic frame: a random sketch may contain '\' (char 92
      // sits inside the register range), which a SQL string literal
      // would treat as an escape
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(a, b))),
        StructType(Seq(StructField("a", StringType),
          StructField("b", StringType))))
      df.select(Hll.mergeExpr("a", "b").as("m")).collect()(0).getString(0)
    }
    (1 to 5).foreach { _ =>
      val (a, b, c) = (randomSketch(), randomSketch(), randomSketch())
      val ab = merge2(a, b)
      assert(ab == merge2(b, a), "commutative")
      assert(merge2(ab, c) == merge2(a, merge2(b, c)), "associative")
      assert(merge2(a, a) == a, "idempotent")
      assert(merge2(a, Hll.Empty) == a, "Empty is the identity")
      assert(ab.length == Hll.M)
    }
  }

  test("accuracy: at 5k distinct values the estimate lands within 5% " +
    "of truth (m = 4096 registers), and a view table predating the " +
    "declaration refuses loudly") {
    val l = Files.createTempDirectory("azof-hll-acc").toString
    val ck = Files.createTempDirectory("azof-hll-acc-ck").toString
    AzofWriter.createTable(spark, l, "src", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "src", df(
      (1 to 5000).map(i =>
        (i.toString, "2024-01-02T00:00:00Z", "g0", s"val$i")): _*))
    val q = MatView.refresh(spark, l, "src", l, "mv", vd, ck)
    assert(q.awaitTermination(120000))
    val e = approx(l, Nil)(0).getLong(0)
    assert(math.abs(e - 5000.0) / 5000.0 <= 0.05, s"estimate $e")
    // pre-declaration table: a def claiming approx over a table whose
    // schema has no hll_ column refuses loudly
    val bare = ViewDef(Seq("g"))
    val ck2 = Files.createTempDirectory("azof-hll-acc-ck2").toString
    val q2 = MatView.refresh(spark, l, "src", l, "mv_bare", bare, ck2)
    assert(q2.awaitTermination(120000))
    val e2 = intercept[IllegalStateException] {
      MatView.approxDistinct(spark, l, "mv_bare", vd, "a", Seq("g"))
        .collect()
    }
    assert(e2.getMessage.contains("rebuilt"), e2.getMessage)
  }
}
