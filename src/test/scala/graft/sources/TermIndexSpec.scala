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

/** The persisted inverted index: search served from postings ≡ a
  * brute-force live-corpus recompute — under inserts, revisions (tf
  * changes upsert, vanished terms tombstone, unchanged postings write
  * NOTHING), deletes, and re-inserts, on both merge-guard shapes, with
  * the epoch rebuild as the rollback hatch.
  */
class TermIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val docSchema = TableSchema(Seq(
    ColumnDef("text", ColumnType.AzString, nullable = false)))

  private def df(rows: (String, String, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, v) =>
        Row(k, Timestamp.from(Instant.parse(t)), v) }),
      docSchema.toStruct)

  private def ts(s: String) = Instant.parse(s)

  private def mkLake(tag: String): (String, String) = {
    val l = Files.createTempDirectory(s"azof-term-$tag").toString
    val ck = Files.createTempDirectory(s"azof-term-$tag-ck").toString
    AzofWriter.createTable(spark, l, "docs", docSchema,
      ts("2024-01-01T00:00:00Z"))
    (l, ck)
  }

  private def refresh(
      l: String, ck: String, bMax: Long = Long.MaxValue): Unit = {
    val q = TermIndex.refresh(spark, l, "docs", "text", l,
      "term_postings", ck, broadcastKeyMax = bMax)
    assert(q.awaitTermination(120000))
  }

  private def served(
      l: String, terms: Seq[String], all: Boolean = true,
      tbl: String = "term_postings") =
    TermIndex.search(spark, l, tbl, terms, requireAll = all)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  /** Brute force over the live corpus: tokenize everything, same
    * grouping as the served search.
    */
  private def brute(l: String, terms: Seq[String], all: Boolean = true) = {
    val normed = terms.map(_.toLowerCase.trim).filter(_.nonEmpty).distinct
    val toks = AzofScan.scan(spark, l, "docs")
      .select(col(TableSchema.KeyName).as("doc"),
        explode(split(lower(col("text")), "\\s+")).as("term"))
      .where(col("term").isin(normed: _*))
      .groupBy("doc", "term").agg(count(lit(1)).as("tf"))
      .groupBy("doc")
      .agg(count_distinct(col("term")).as("n_terms"),
        sum(col("tf")).as("sum_tf"))
    val out = if (all) toks.where(col("n_terms") === normed.size.toLong)
    else toks
    out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
  }

  test("bootstrap + delta: AND and OR search served from postings ≡ " +
    "brute force; tf sums exact") {
    val (l, ck) = mkLake("ins")
    AzofWriter.commitBase(spark, l, "docs", df(
      ("1", "2024-01-02T00:00:00Z", "the cat sat on the mat"),
      ("2", "2024-01-02T00:00:00Z", "the dog sat"),
      ("3", "2024-01-02T00:00:00Z", "a cat and a dog")))             // v2
    refresh(l, ck)
    for (all <- Seq(true, false); q <- Seq(Seq("cat", "dog"),
      Seq("the"), Seq("sat", "the"), Seq("absent", "cat")))
      assert(served(l, q, all) == brute(l, q, all), s"terms=$q all=$all")
    AzofWriter.commitDelta(spark, l, "docs", df(
      ("4", "2024-02-05T00:00:00Z", "dog dog dog")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    refresh(l, ck)
    assert(served(l, Seq("dog"), all = false) ==
      brute(l, Seq("dog"), all = false))
    assert(served(l, Seq("dog"), all = false)
      .find(_._1 == "4").map(_._3) == Some(3L), "tf counts occurrences")
  }

  test("a revision tombstones vanished terms, upserts changed tf, and " +
    "writes NOTHING for unchanged postings (index change feed pinned)") {
    val (l, ck) = mkLake("rev")
    AzofWriter.commitBase(spark, l, "docs", df(
      ("1", "2024-01-02T00:00:00Z", "alpha beta beta gamma")))       // v2
    refresh(l, ck)
    val vBefore = AzofTable(spark, l, "term_postings").currentVersion.toLong
    // alpha unchanged (tf 1), beta 2→1, gamma vanishes, delta appears
    AzofWriter.commitDelta(spark, l, "docs", df(
      ("1", "2024-02-05T00:00:00Z", "alpha beta delta")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    refresh(l, ck)
    assert(served(l, Seq("gamma"), all = false).isEmpty)
    assert(served(l, Seq("beta"), all = false) == Seq(("1", 1L, 1L)))
    assert(served(l, Seq("delta"), all = false) == Seq(("1", 1L, 1L)))
    assert(served(l, Seq("alpha"), all = false) == Seq(("1", 1L, 1L)))
    // the refresh's delta: exactly beta (tf change), delta (new), and
    // the gamma tombstone — alpha wrote nothing
    val vAfter = AzofTable(spark, l, "term_postings").currentVersion.toLong
    val changed = AzofChangeFeed.between(spark, l, "term_postings",
      vBefore, vAfter)
      .select("term", "_deleted")
      .collect().map(r => (r.getString(0), r.getBoolean(1))).sortBy(_._1)
    assert(changed.toSeq ==
      Seq(("beta", false), ("delta", false), ("gamma", true)),
      s"unchanged postings must not rewrite: ${changed.toSeq}")
  }

  test("phrase + prefix search served from positional postings; a " +
    "tf-equal POSITION move rewrites its posting (and only it); " +
    "phrase truth follows revisions and deletes") {
    val (l, ck) = mkLake("pos")
    AzofWriter.commitBase(spark, l, "docs", df(
      ("1", "2024-01-02T00:00:00Z", "big order scan now"),
      ("2", "2024-01-02T00:00:00Z", "order big order scan"),
      ("3", "2024-01-02T00:00:00Z", "scan order big order")))        // v2
    refresh(l, ck)
    def phrase(terms: String*) =
      TermIndex.searchPhrase(spark, l, "term_postings", terms)
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq
    // consecutive in docs 1 ("big order scan …") and 2 ("… big order
    // scan"); doc 3 has all three terms but never adjacent — the AND
    // search would match it, the phrase must NOT
    assert(served(l, Seq("big", "order", "scan")).map(_._1) ==
      Seq("1", "2", "3"), "AND matches all three docs")
    assert(phrase("big", "order", "scan") == Seq(("1", 1L), ("2", 1L)),
      "phrase excludes the non-adjacent doc")
    // repeated occurrences count: doc 3 has 'order' twice around 'big'
    assert(phrase("order", "big") == Seq(("2", 1L), ("3", 1L)))
    assert(phrase("order") == Seq(("1", 1L), ("2", 2L), ("3", 2L)),
      "single-term phrase count = tf")
    // prefix: one key-range read, every term starting 'or'/'sc'
    def prefix(p: String) =
      TermIndex.searchPrefix(spark, l, "term_postings", p)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    assert(prefix("or") == Seq(("1", 1L, 1L), ("2", 1L, 2L),
      ("3", 1L, 2L)))
    assert(prefix("s") == Seq(("1", 1L, 1L), ("2", 1L, 1L),
      ("3", 1L, 1L)), "'scan' only")
    // proximity: pair counts + min distance from the same positions
    def near(a: String, b: String, w: Int) =
      TermIndex.searchNear(spark, l, "term_postings", a, b, w)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    // doc1 big@0 now@3; doc2 big@1 — no 'now'; doc3 big@2 — no 'now'
    assert(near("big", "now", 3) == Seq(("1", 1L, 3L)))
    assert(near("big", "now", 2).isEmpty, "window excludes the pair")
    // doc3 "scan order big order": order@{1,3} × scan@{0} within 2 →
    // pair (1,0) dist 1 only; min dist 1
    assert(near("order", "scan", 2).map(x => (x._1, x._3)) ==
      Seq(("1", 1L), ("2", 1L), ("3", 1L)))
    // a REVISION that permutes tokens with EQUAL tf: every moved term's
    // posting rewrites (its positions changed), an unmoved term's does
    // not — the nothing-written-for-unchanged pin extended to positions
    val vBefore = AzofTable(spark, l, "term_postings").currentVersion.toLong
    AzofWriter.commitDelta(spark, l, "docs", df(
      ("1", "2024-02-05T00:00:00Z", "order big scan now")),          // v3
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
    refresh(l, ck)
    val vAfter = AzofTable(spark, l, "term_postings").currentVersion.toLong
    val changed = AzofChangeFeed.between(spark, l, "term_postings",
      vBefore, vAfter)
      .select("term").collect().map(_.getString(0)).sorted.toSeq
    assert(changed == Seq("big", "order"),
      s"tf-equal position moves rewrite exactly the moved terms: $changed")
    assert(phrase("big", "order", "scan") == Seq(("2", 1L)),
      "doc 1's phrase broke with the permutation")
    assert(phrase("order", "big", "scan") == Seq(("1", 1L)),
      "…and the permuted phrase now matches")
    // a doc delete retires its positions from phrase truth
    AzofWriter.commitDelete(spark, l, "docs", Seq("2"),
      ts("2024-03-05T00:00:00Z"))                                    // v4
    refresh(l, ck)
    assert(phrase("big", "order", "scan").isEmpty)
  }

  test("doc delete tombstones all its postings; re-insert resurrects; " +
    "guard shapes agree") {
    def build(tag: String, bMax: Long) = {
      val (l, ck) = mkLake(tag)
      AzofWriter.commitBase(spark, l, "docs", df(
        ("1", "2024-01-02T00:00:00Z", "x y"),
        ("2", "2024-01-02T00:00:00Z", "x z")))                       // v2
      refresh(l, ck, bMax)
      AzofWriter.commitDelete(spark, l, "docs", Seq("1"),
        ts("2024-02-05T00:00:00Z"))                                  // v3
      refresh(l, ck, bMax)
      val afterDel = served(l, Seq("x"), all = false)
      AzofWriter.commitDelta(spark, l, "docs", df(
        ("1", "2024-03-05T00:00:00Z", "x x")),
        ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))      // v4
      refresh(l, ck, bMax)
      (afterDel, served(l, Seq("x"), all = false), brute(l, Seq("x"), all = false))
    }
    val (delBc, resBc, bruteBc) = build("del-bc", Long.MaxValue)
    assert(delBc == Seq(("2", 1L, 1L)), "deleted doc's postings gone")
    assert(resBc == bruteBc && resBc.toSet ==
      Set(("1", 1L, 2L), ("2", 1L, 1L)), "re-insert resurrects with new tf")
    val (delSh, resSh, _) = build("del-sh", 0L)
    assert(delSh == delBc && resSh == resBc, "guard shapes must agree")
  }

  test("searchRanked: tf·idf in integer bit-magnitude space, df from " +
    "the postings — rarer terms outrank stop terms exactly") {
    val (l, ck) = mkLake("rank")
    AzofWriter.commitBase(spark, l, "docs", df(
      ("1", "2024-01-02T00:00:00Z", "common rare common"),
      ("2", "2024-01-02T00:00:00Z", "common common"),
      ("3", "2024-01-02T00:00:00Z", "common other")))                // v2
    refresh(l, ck)
    def mag(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    val n = 3L
    val wCommon = mag(n) - mag(3L) // df(common) = 3
    val wRare = mag(n) - mag(1L)   // df(rare) = 1
    val got = TermIndex.searchRanked(spark, l, "term_postings",
        Seq("common", "rare"), n)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      ("1", 2L, 2 * wCommon + 1 * wRare),
      ("2", 1L, 2 * wCommon),
      ("3", 1L, 1 * wCommon)), s"got $got")
    assert(wRare > wCommon, "rarity must weigh more")
  }

  test("search on a by-key-folded posting layout FILE-SKIPS to the " +
    "query terms' key ranges (counting FS pin)") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.termfs.impl", classOf[TermCountingFs].getName)
    spark.conf.set("spark.hadoop.fs.termfs.impl",
      classOf[TermCountingFs].getName)
    val local = Files.createTempDirectory("azof-term-count").toString
    val l = s"termfs:$local"
    val ck = Files.createTempDirectory("azof-term-count-ck").toString
    AzofWriter.createTable(spark, l, "docs", docSchema,
      ts("2024-01-01T00:00:00Z"))
    // a spread-out vocabulary so the fold's key slices separate terms
    AzofWriter.commitBase(spark, l, "docs", df(
      (1 to 40).map(i => (i.toString, "2024-01-02T00:00:00Z",
        s"w${"%02d".format(i)} w${"%02d".format((i + 20) % 40)}")): _*))
    refresh(l, ck)
    AzofWriter.compact(spark, l, "term_postings",
      ts("2024-02-01T00:00:00Z"), numFiles = 8, byKey = true)
    val postFiles = AzofTable(spark, l, "term_postings").currentSnapshot
      .dataFiles(graft.format.AsOf.Current).size
    assert(postFiles >= 8, s"folded layout expected, got $postFiles")
    TermCountingFs.reset()
    val hits = served(l, Seq("w05"), all = false)
    assert(hits.nonEmpty)
    val opened = TermCountingFs.postingFiles
    assert(opened.nonEmpty, "counting FS saw no reads — vacuous")
    assert(opened.size <= 2 && opened.size < postFiles,
      s"one term must read its key slice(s), not the table: opened " +
        s"${opened.size} of $postFiles: $opened")
  }

  test("rebuildEpoch after a source rollback serves the rolled-back " +
    "corpus") {
    val (l, ck) = mkLake("rb")
    AzofWriter.commitBase(spark, l, "docs", df(
      ("1", "2024-01-02T00:00:00Z", "p q")))                         // v2
    refresh(l, ck)
    AzofWriter.commitDelta(spark, l, "docs", df(
      ("2", "2024-02-05T00:00:00Z", "p r")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    refresh(l, ck)
    AzofWriter.rollback(spark, l, "docs", 2L)                        // v4
    TermIndex.rebuildEpoch(spark, l, "docs", "text", l, "tp_e2",
      ts("2024-06-01T00:00:00Z"))
    assert(served(l, Seq("p"), all = false, tbl = "tp_e2") ==
      Seq(("1", 1L, 1L)))
    assert(served(l, Seq("r"), all = false, tbl = "tp_e2").isEmpty)
  }

  /** Brute-force BM25 over the live corpus with the engine's exact
    * rational form and operand order (AND = inner joins; OR = full
    * outer with tf coalesced to 0, the engine's disjunctive shape).
    */
  private def bruteBm25(
      l: String, terms: Seq[String], all: Boolean = true) = {
    val toks = AzofScan.scan(spark, l, "docs")
      .select(col(TableSchema.KeyName).as("doc"),
        explode(split(lower(col("text")), "\\s+")).as("term"))
      .where(col("term") =!= "")
      .localCheckpoint(true)
    val dl = toks.groupBy("doc").agg(count(lit(1)).as("len"))
    val st = dl.agg(count(lit(1)), sum(col("len"))).collect()(0)
    val (n, lTot) = (st.getLong(0), st.getLong(1))
    def mag(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val tfs = toks.where(col("term").isin(terms: _*))
      .groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val dfs = tfs.groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cand = terms.zipWithIndex.map { case (t, i) =>
      tfs.where(col("term") === t)
        .select(col("doc"), col("tf").as(s"_tf_$i"))
    }.reduce((a, b) =>
      if (all) a.join(b, "doc") else a.join(b, Seq("doc"), "full_outer"))
      .join(dl, "doc")
    def sc(i: Int) = {
      val w = lit(
        (1L + mag(n) - mag(math.max(dfs.getOrElse(terms(i), 0L), 1L)))
          .toDouble)
      val tf = coalesce(col(s"_tf_$i"), lit(0L)).cast("double")
      w * (lit(44.0) * tf * lit(lTot.toDouble)) /
        (lit(20.0) * lit(lTot.toDouble) * tf + lit(6.0) * lit(lTot.toDouble) +
          lit(18.0) * col("len").cast("double") * lit(n.toDouble))
    }
    cand.select(col("doc"), col("len").as("dl"),
      terms.indices.map(sc).reduce(_ + _).as("score"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
  }

  test("BM25 ranked search: doc lengths and corpus stats maintained " +
    "incrementally through revisions that change lengths, deletes, " +
    "and re-inserts — ≡ a live-corpus brute force, bit-exact scores") {
    val (l, ck) = mkLake("bm")
    def bm(terms: Seq[String]) =
      TermIndex.searchBm25(spark, l, "term_postings", terms)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    AzofWriter.commitBase(spark, l, "docs", df(
      ("1", "2024-01-02T00:00:00Z", "big window scan dup window"),
      ("2", "2024-01-02T00:00:00Z", "dup window"),
      ("3", "2024-01-02T00:00:00Z", "other words entirely here")))   // v2
    refresh(l, ck)
    assert(bm(Seq("window", "dup")) == bruteBm25(l, Seq("window", "dup")))
    // a revision that CHANGES doc 1's length (and tf) + a new doc
    AzofWriter.commitDelta(spark, l, "docs", df(
      ("1", "2024-02-05T00:00:00Z", "window dup"),
      ("4", "2024-02-05T00:00:00Z", "dup dup window and much more " +
        "text to stretch the length out")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    refresh(l, ck)
    assert(bm(Seq("window", "dup")) == bruteBm25(l, Seq("window", "dup")),
      "lengths and stats track the revision")
    // delete one matching doc: its dl row retires, stats shrink
    AzofWriter.commitDelete(spark, l, "docs", Seq("2"),
      ts("2024-03-05T00:00:00Z"))                                    // v4
    refresh(l, ck)
    assert(bm(Seq("window", "dup")) == bruteBm25(l, Seq("window", "dup")),
      "the deleted doc left N, L, df, and the candidates")
    // the stats row is ONE row and matches the live corpus exactly
    val st = AzofScan.scan(spark, l,
      TermIndex.stTableName("term_postings"))
      .select(col("n_docs"), col("total_len")).collect()
    assert(st.length == 1 && st(0).getLong(0) == 3L)
    // DISJUNCTIVE (OR) top-k: docs matching ANY term, a missing term
    // contributing exactly 0.0 — ≡ the full-outer brute force with
    // the same fixed operand order, incl. docs matching only one side
    def bmAny(terms: Seq[String]) =
      TermIndex.searchBm25(spark, l, "term_postings", terms,
        requireAll = false)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    assert(bmAny(Seq("window", "other")) ==
      bruteBm25(l, Seq("window", "other"), all = false),
      "OR-mode ≡ brute force")
    assert(bmAny(Seq("window", "other")).map(_._1).toSet
      .contains("3"), "doc 3 matches only 'other' and still ranks")
    // OR is a superset of AND on the shared docs with IDENTICAL scores
    val orScores = bmAny(Seq("window", "dup"))
    assert(bm(Seq("window", "dup")).forall(orScores.contains),
      "AND rows appear in OR with bit-identical scores")
    // a term matching NOTHING contributes zero, not a crash or a null
    val ghost = bmAny(Seq("window", "qqqqnosuchterm"))
    assert(ghost == bruteBm25(l, Seq("window", "qqqqnosuchterm"),
      all = false), "df = 0 term contributes 0.0")
    // an index PREDATING the side tables refuses refresh loudly
    val (l2, ck2) = mkLake("bmold")
    AzofWriter.commitBase(spark, l2, "docs", df(
      ("1", "2024-01-02T00:00:00Z", "a b")))
    AzofWriter.createTable(spark, l2, "term_postings",
      TermIndex.PostingSchema, ts("2024-01-01T00:00:00Z"))
    // create() refuses synchronously, before any stream starts
    val e = intercept[IllegalStateException] { refresh(l2, ck2) }
    assert(e.getMessage.contains("term-rebuild"),
      s"upgrade refusal names the remedy: ${e.getMessage}")
  }
}

/** RawLocalFileSystem counting distinct parquet data files opened under
  * the posting table — the term-range file-skip pin.
  */
class TermCountingFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "termfs"
  override def getUri: java.net.URI = java.net.URI.create("termfs:///")
  override def open(f: org.apache.hadoop.fs.Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    TermCountingFs.record(f)
    super.open(f, bufferSize)
  }
}

object TermCountingFs {
  val opened = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def record(f: org.apache.hadoop.fs.Path): Unit = {
    val s = f.toString
    if (s.contains("/term_postings/") && s.endsWith(".parquet")) {
      opened.add(s); ()
    }
  }
  def reset(): Unit = opened.clear()
  def postingFiles: Set[String] = {
    import scala.jdk.CollectionConverters._
    opened.asScala.toSet
  }
}
