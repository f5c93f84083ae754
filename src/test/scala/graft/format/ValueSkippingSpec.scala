package graft.format

import graft.TestSpark
import graft.operators.AzofScan
import graft.sources.AzofWriter
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

/** Value-column range skipping ([[ValueStats]]): stats written by every
  * commit path, codec round-trip, the match + key-range-closure pruning
  * (including the hazard case a naive value pruner gets wrong), and
  * end-to-end scan equality under pruning.
  */
class ValueSkippingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String) = Instant.parse(s)

  private val schema = TableSchema(Seq(
    ColumnDef("kind", ColumnType.AzString, nullable = false),
    ColumnDef("amount", ColumnType.AzInt, nullable = true)))

  private def df(rows: (String, String, String, java.lang.Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, kind, a) =>
        Row(k, Timestamp.from(ts(t)), kind, a)
      }),
      schema.toStruct)

  test("commits stamp per-column ranges; codec round-trips them") {
    val lake = Files.createTempDirectory("azof-vs1").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitDelta(spark, lake, "t",
      df(("a", "2024-01-05T00:00:00Z", "click", 10L),
        ("b", "2024-01-06T00:00:00Z", "view", 9L)),
      ts("2024-01-05T00:00:00Z"), ts("2024-01-06T00:00:00Z"))
    val snap = AzofTable(spark, lake, "t").currentSnapshot
    val st = snap.segments.head.delta.head.stats.get
    assert(st.cols("kind") == ColRange("click", "view"))
    // Int ranges must order NUMERICALLY (typed min), not as strings:
    // min(10, 9) = 9
    assert(st.cols("amount") == ColRange("9", "10"))
    // and they survive a codec round-trip
    val rt = SnapshotCodec.parse(SnapshotCodec.render(snap))
    assert(rt.segments.head.delta.head.stats.get.cols == st.cols)
  }

  test("mayMatch: typed ranges, conjuncts, IN, bounds") {
    val st = FileStats("a", "z", None, Map(
      "kind" -> ColRange("click", "click"),
      "amount" -> ColRange("9", "10")))
    def m(f: Filter) = ValueStats.mayMatch(schema, st, f)
    assert(m(EqualTo("kind", "click")))
    assert(!m(EqualTo("kind", "view")))
    assert(!m(EqualTo("amount", 100L))) // "100" < "9" as strings: typed wins
    assert(m(In("kind", Array("view", "click"))))
    assert(!m(In("kind", Array("view", "error"))))
    assert(m(GreaterThan("amount", 9L)) && !m(GreaterThan("amount", 10L)))
    assert(m(LessThan("amount", 10L)) && !m(LessThan("amount", 9L)))
    assert(!m(And(EqualTo("kind", "click"), EqualTo("amount", 5L))))
    assert(m(Or(EqualTo("kind", "view"), EqualTo("amount", 9L))))
    // unknown shapes and missing columns stay conservative
    assert(m(EqualTo("absent", "x")) && m(IsNull("kind")))
  }

  test("StringStartsWith prunes by prefix interval, U+FFFF-safe") {
    def st(lo: String, hi: String) = FileStats("a", "z", None,
      Map("kind" -> ColRange(lo, hi)))
    def m(s: FileStats, f: Filter) = ValueStats.mayMatch(schema, s, f)
    assert(m(st("click", "view"), StringStartsWith("kind", "cl")))
    assert(!m(st("click", "view"), StringStartsWith("kind", "a")))
    assert(!m(st("click", "view"), StringStartsWith("kind", "z")))
    // boundary: range starting exactly at the prefix's successor
    assert(!m(st("cm", "zz"), StringStartsWith("kind", "cl")))
    // a min of prefix+U+FFFF+… still HAS the prefix — must not prune
    assert(m(st("cl￿x", "zz"), StringStartsWith("kind", "cl")))
  }

  test("the naive-pruner hazard: a newer non-matching row still wins") {
    val lake = Files.createTempDirectory("azof-vs2").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    // commit 1: k matches the predicate (older row)
    AzofWriter.commitDelta(spark, lake, "t",
      df(("k", "2024-01-05T00:00:00Z", "click", 1L)),
      ts("2024-01-05T00:00:00Z"), ts("2024-01-05T00:00:00Z"))
    // commit 2: k's NEWER row does not match — naive pruning would drop
    // this file for `kind = 'click'` and resurrect the older row
    AzofWriter.commitDelta(spark, lake, "t",
      df(("k", "2024-02-05T00:00:00Z", "view", 2L)),
      ts("2024-02-05T00:00:00Z"), ts("2024-02-05T00:00:00Z"))

    val snap = AzofTable(spark, lake, "t").currentSnapshot
    val entries = AzofScan.prunedEntries(snap, AsOf.Current)
    val kept = ValueStats.prune(snap.schema, entries,
      Seq(EqualTo("kind", "click")))
    // the closure keeps BOTH files (overlapping key ranges)...
    assert(kept.map(_.file).toSet == entries.map(_.file).toSet)
    // ...and the scan answers correctly: k's winner is 'view', so the
    // predicate returns NOTHING
    val got = spark.read.format("azof").option("table", "t").load(lake)
      .where("kind = 'click'").collect()
    assert(got.isEmpty)
  }

  test("disjoint key slices prune; scan equals unpruned result") {
    val lake = Files.createTempDirectory("azof-vs3").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    // three commits with DISJOINT key ranges, each a distinct kind —
    // the by-key-clustered shape where value skipping pays off
    AzofWriter.commitDelta(spark, lake, "t",
      df(("a1", "2024-01-05T00:00:00Z", "click", 1L),
        ("a2", "2024-01-05T00:00:00Z", "click", 2L)),
      ts("2024-01-05T00:00:00Z"), ts("2024-01-05T00:00:00Z"))
    AzofWriter.commitDelta(spark, lake, "t",
      df(("b1", "2024-01-06T00:00:00Z", "view", 3L),
        ("b2", "2024-01-06T00:00:00Z", "view", 4L)),
      ts("2024-01-06T00:00:00Z"), ts("2024-01-06T00:00:00Z"))
    AzofWriter.commitDelta(spark, lake, "t",
      df(("c1", "2024-01-07T00:00:00Z", "error", 5L)),
      ts("2024-01-07T00:00:00Z"), ts("2024-01-07T00:00:00Z"))

    val snap = AzofTable(spark, lake, "t").currentSnapshot
    val entries = AzofScan.prunedEntries(snap, AsOf.Current)
    assert(entries.size == 3)
    val kept = ValueStats.prune(snap.schema, entries,
      Seq(EqualTo("kind", "view")))
    assert(kept.size == 1, s"expected 1 kept file, got ${kept.map(_.file)}")

    // end-to-end: the pruned scan returns exactly the unpruned answer
    val t = spark.read.format("azof").option("table", "t").load(lake)
    val got = t.where("kind = 'view'")
      .select("key").collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("b1", "b2"))
    // range predicate on the Int column prunes numerically
    val keptAmt = ValueStats.prune(snap.schema, entries,
      Seq(GreaterThan("amount", 4L)))
    assert(keptAmt.size == 1 && keptAmt.head.stats.get.cols("kind").min ==
      "error")
    assert(t.where("amount > 4").select("key").collect()
      .map(_.getString(0)).toSeq == Seq("c1"))
  }
}
