package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the text-pipeline operators the corpus can't
  * exercise (no real PII in the synthetic documents) plus the
  * decontamination cross-set semantics.
  */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("piiScrub redacts urls, emails, ips — in that order — and counts " +
    "exactly the replacements made") {
    val df = Seq(
      (1L, "mail me at jane.doe+x@example.co.uk or visit https://ex.com/a?b=1 now"),
      (2L, "server 10.0.0.1 and http://192.168.1.1/admin both answered"),
      (3L, "no pii here at all"),
      (4L, "fetch https://user@host.com/x for details")).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(df, col("text"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sortBy(_._1)

    assert(got(0) == ((1L, 1L, 1L, 0L,
      "mail me at <EMAIL> or visit <URL> now")))
    // the URL containing an IP is scrubbed — and counted — as a URL, not
    // as an IP; only the bare IP counts as an IP
    assert(got(1) == ((2L, 0L, 1L, 1L, "server <IP> and <URL> both answered")))
    assert(got(2) == ((3L, 0L, 0L, 0L, "no pii here at all")))
    // userinfo URL: the whole authority scrubs as ONE URL; the embedded
    // user@host.com is part of it and never counts as an email
    assert(got(3) == ((4L, 0L, 1L, 0L, "fetch <URL> for details")))
  }

  test("repetition: duplicated 3-grams raise the ratio; short docs score 0") {
    val df = Seq(
      (1L, "a b c a b c"),        // 4 ngrams: "a b c","b c a","c a b","a b c" -> 1 dup
      (2L, "w x y z"),            // 2 ngrams, no dup
      (3L, "one two")).toDF("doc_id", "text") // < 3 words
    val got = TextAnalysis.repetition(df, col("text"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(got(0) == ((1L, 4L, 3L, 0.25)))
    assert(got(1) == ((2L, 2L, 2L, 0.0)))
    assert(got(2) == ((3L, 0L, 0L, 0.0)))
  }

  test("stratifiedSample: per-stratum rates, deterministic, salt-independent draws") {
    val df = (0L until 4000L).map(i => (i, (i % 2).toString)).toDF("id", "s")
    def run(salt: String) = TextAnalysis.stratifiedSample(df, col("id"),
      col("s"), rates = Map("0" -> 1.0), defaultRate = 0.25, salt = salt)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val a = run("x")
    // stratum 0: rate 1.0 keeps every row
    assert(a.count(_._2 == "0") == 2000)
    // stratum 1: ~25% with hash-uniform tolerance
    val kept1 = a.count(_._2 == "1")
    assert(kept1 > 380 && kept1 < 620, s"kept $kept1 of 2000 at rate 0.25")
    // pure function of (id, salt): identical reruns, different salt draws
    // a different (but same-sized-ish) sample
    assert(run("x") == a)
    val b = run("y")
    assert(b != a && math.abs(b.size - a.size) < 300)
  }

  test("exactOverlap: only identical-content cross-set pairs, normalized") {
    val df = Seq(
      (1L, "Same  Text here"),   // train; matches 10 after normalization
      (2L, "other content"),     // train
      (3L, "shared dup"),        // train
      (4L, "shared dup"),        // train duplicate — both pair with 30
      (10L, "same text HERE"),   // eval (case/space-insensitive match of 1)
      (20L, "nothing like it"),  // eval
      (30L, "shared dup")).toDF("doc_id", "text")
    val got = Dedup.exactOverlap(df, col("text"), col("doc_id"),
        col("doc_id") >= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (3L, 30L), (4L, 30L)))
  }

  test("decontaminate: only cross-set pairs, boilerplate df guard applies") {
    // eval = ids 10, 20; train = 1..4. Docs 1 and 10 share a rare
    // 4-shingle run; docs 2 and 20 share exactly 2 shingles (below
    // minShared=3); "common words here" appears in EVERY doc (df=6 >
    // maxDf=5) so it never counts; 3 and 4 share text but are both
    // train, so no pair.
    val common = "common words here"
    val df = Seq(
      (1L, s"alpha beta gamma delta epsilon $common"),
      (2L, s"one two three four $common"),
      (3L, s"same train text twin $common"),
      (4L, s"same train text twin $common"),
      (10L, s"alpha beta gamma delta epsilon $common"),
      (20L, s"zz one two three yy $common")).toDF("doc_id", "text")
    val got = Dedup.decontaminate(df, col("text"), col("doc_id"),
        col("doc_id") >= 10, minShared = 3, maxDf = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // only (1, 10) qualifies: shares "alpha beta gamma","beta gamma
    // delta","gamma delta epsilon","delta epsilon common" (4 rare
    // shingles >= 3); (2, 20) shares only "one two three" (+ nothing
    // else rare) -> below threshold; (3,4) same-set.
    assert(got.map(p => (p._1, p._2)) == Set((1L, 10L)))
    assert(got.head._3 >= 3)
  }

  test("sourceCap: deterministic per-source cap, salt selects different survivors") {
    val df = (0L until 30L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val capped = TextAnalysis
      .sourceCap(df, col("doc_id"), col("source"), cap = 4, salt = "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // exactly cap survivors per source, ranks 1..cap
    assert(capped.length == 12)
    capped.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.length == 4)
      assert(rows.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    }
    // deterministic: the same call picks the same survivors
    val again = TextAnalysis
      .sourceCap(df, col("doc_id"), col("source"), cap = 4, salt = "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(capped.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // a different salt reshuffles the draw (not id-order truncation)
    val other = TextAnalysis
      .sourceCap(df, col("doc_id"), col("source"), cap = 4, salt = "u")
      .collect().map(_.getLong(0)).toSet
    assert(other != capped.map(_._1).toSet)
    // cap >= group size keeps everything
    assert(TextAnalysis.sourceCap(df, col("doc_id"), col("source"),
      cap = 10).count() == 30)
  }

  test("rarityScore: occurrence-weighted magnitude of corpus counts") {
    // corpus counts: "the" x4 -> bin 100, mag 3; "rare" x1 -> mag 1;
    // "word" x2 -> mag 2; "mid" x1 -> mag 1
    val docs = Seq(
      (1L, "the the rare"), (2L, "the word"), (3L, "the word mid"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.rarityScore(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((3L, 2 * 3 + 1L, (2 * 3 + 1) / 3.0)))
    assert(out(2L) === ((2L, 3 + 2L, (3 + 2) / 2.0)))
    assert(out(3L) === ((3L, 3 + 2 + 1L, (3 + 2 + 1) / 3.0)))
  }

  test("lmScore: bigram surprise = mag(ctx + V) - mag(bigram + 1), " +
    "occurrence-weighted; docs without bigrams are absent") {
    // corpus: "a b" x3, "b a" x1, "b c" x1; contexts a·=3, b·=2;
    // V = distinct CONTEXTS = 2
    // surprise("a b") = mag(3+2) - mag(3+1) = mag(5)=3 - mag(4)=3 = 0
    // surprise("b a") = mag(2+2) - mag(1+1) = mag(4)=3 - mag(2)=2 = 1
    // surprise("b c") = mag(2+2) - mag(1+1) = 3 - 2 = 1
    val docs = Seq(
      (1L, "a b a b"), (2L, "a b c"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(1L, 2L), "single-token doc 3 has no bigrams")
    assert(out(1L) === ((3L, 1L, 1 / 3.0)))
    assert(out(2L) === ((2L, 1L, 0.5)))
  }

  test("hashClassifier: margin = ordered fold of per-token weights, bias shifts it") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha")).toDF("doc_id", "text")
    // recompute the expected margins with the same md5 stub, folding in
    // token order like the operator
    def weight(t: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val dg = md.digest(s"w#t#$t".getBytes("UTF-8"))
      var x = 0L
      (0 until 7).foreach(i => x = (x << 8) | (dg(i) & 0xffL))
      ((x % 2001L) - 1000L).toDouble / 1000.0
    }
    def margin(ts: String*): Double =
      ts.foldLeft(0.0)((acc, t) => acc + weight(t))
    val out = TextAnalysis.hashClassifier(docs, col("text"), col("doc_id"),
      bias = 0.0, salt = "t")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val m1 = margin("alpha", "beta", "gamma")
    val m2 = margin("alpha")
    assert(out(1L) === ((3L, m1, m1 > 0)))
    assert(out(2L) === ((1L, m2, m2 > 0)))
    // a large positive bias keeps everything
    val kept = TextAnalysis.hashClassifier(docs, col("text"), col("doc_id"),
      bias = 1000.0, salt = "t").where(col("keep")).count()
    assert(kept === 2L)
  }

  test("sourceMix: sqrt(cref/c) cutoffs, smallest source keeps all, deterministic") {
    // 4:1 skew: big has 160 docs, small 10 → rate_big = sqrt(10/160) = 0.25
    val df = (0L until 170L).map(i =>
      (i, if (i < 160) "big" else "small")).toDF("doc_id", "source")
    val out = TextAnalysis.sourceMix(df, col("doc_id"), col("source"),
      salt = "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // cutoffs are the exactly-representable sqrt ratios
    val cut = out.map(r => (r._2, r._4)).toMap
    assert(cut("big") === 250000L)   // floor(sqrt(10/160) * 1e6)
    assert(cut("small") === 1000000L)
    // the smallest source survives whole; survivors all under cutoff
    assert(out.count(_._2 == "small") === 10)
    assert(out.forall { case (_, _, _, c, b) => b < c })
    // the per-doc bucket is the salted md5 hash — recompute via Spark
    val expect = df.select(col("doc_id"),
        pmod(conv(substring(md5(concat(lit("mix#t#"),
          col("doc_id").cast("string"))), 1, 14), 16, 10).cast("long"),
          lit(1000000L)).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.forall { case (id, _, _, _, b) => expect(id) === b })
    // ... and the surviving set is exactly the under-cutoff set
    val wantIds = expect.filter { case (id, b) =>
      b < (if (id < 160) 250000L else 1000000L)
    }.keySet
    assert(out.map(_._1).toSet === wantIds)
    // deterministic rerun; different salt draws a different big-side set
    val again = TextAnalysis.sourceMix(df, col("doc_id"), col("source"),
      salt = "t").collect().map(_.getLong(0)).toSet
    assert(again === out.map(_._1).toSet)
    val other = TextAnalysis.sourceMix(df, col("doc_id"), col("source"),
      salt = "u").collect().map(_.getLong(0)).toSet
    assert(other !== out.map(_._1).toSet)
  }

  test("chunkWindows: overlap, tail clamp, boundary counts, empty docs") {
    // window 4 / stride 3: chunks overlap by 1 token
    val df = Seq(
      (1L, "a b c d e f g"),  // 7 tokens -> chunks at 0,3 (ceil(3/3)=1) -> 2 chunks
      (2L, "a b c d"),        // exactly one window -> 1 chunk
      (3L, "a"),              // shorter than a window -> 1 clamped chunk
      (4L, "a b c d e f g h") // 8 tokens -> (8-4+2)/3: starts 0,3,6 -> 3 chunks
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkWindows(df, col("text"), col("doc_id"),
      window = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 4L), (1L, 1L, 3L, 4L),
      (2L, 0L, 0L, 4L),
      (3L, 0L, 0L, 1L),
      (4L, 0L, 0L, 4L), (4L, 1L, 3L, 4L), (4L, 2L, 6L, 2L)))
    // overlap: doc 1's chunks share token 'd' — verify via md5 equality
    // of the shared-slice reconstruction
    val md5s = TextAnalysis.chunkWindows(df, col("text"), col("doc_id"),
      window = 4, stride = 3)
      .where(col("doc_id") === 1L).orderBy("chunk_id")
      .select("chunk_md5").collect().map(_.getString(0))
    val expect = Seq("a b c d", "d e f g").map(s =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(md5s.toSeq == expect)
    // empty text emits nothing... but note split(lower("")) yields [""]
    // (one empty token) — the words() contract everywhere in this file
    // — so "" still chunks; a doc absent its text column would not.
    // Validation refuses stride > window.
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkWindows(df, col("text"), col("doc_id"),
        window = 2, stride = 3)
    }
  }
}
