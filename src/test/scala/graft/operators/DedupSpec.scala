package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Behavioral pins for the dedup blockers:
  *
  *  - simhash band blocking must be pigeonhole-COMPLETE for
  *    dist < nBands (recall 1.0 vs brute force), randomized;
  *  - the per-bucket cap must clip pair expansion to the cap's smallest
  *    ids and never invent pairs;
  *  - banded sign-LSH candidates must be verified pairs only (subset of
  *    the brute-force cosine pairs) and catch every identical vector.
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomSig(rnd: Random): String =
    Array.fill(64)(if (rnd.nextBoolean()) '1' else '0').mkString

  private def flip(sig: String, n: Int, rnd: Random): String = {
    val a = sig.toCharArray
    rnd.shuffle((0 until 64).toList).take(n).foreach { i =>
      a(i) = if (a(i) == '1') '0' else '1'
    }
    new String(a)
  }

  private def hamming(a: String, b: String): Int =
    a.zip(b).count { case (x, y) => x != y }

  test("simhash band blocking has recall 1.0 for dist <= nBands-1 (randomized)") {
    graft.functions.HammingDistance.register(spark)
    val rnd = new Random(42)
    // 40 base sigs; each spawns variants at controlled distances 0..6 so
    // both sides of the dist<=3 predicate are populated.
    val sigs = (0 until 40).flatMap { g =>
      val base = randomSig(rnd)
      val variants = (0 until rnd.nextInt(4)).map { v =>
        flip(base, rnd.nextInt(7), rnd)
      }
      (base +: variants).zipWithIndex.map { case (s0, i) =>
        (g * 100L + i, s0)
      }
    }
    val sig = sigs.toDF("doc_id", "simhash")
    val got = Dedup.simhashNearPairsFromSig(sig, bits = 64, nBands = 4, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      d = hamming(sa, sb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(brute.nonEmpty, "test corpus must exercise the predicate")
    assert(got == brute) // completeness AND no false positives post-verify
  }

  test("bucket cap clips each bucket to its cap smallest ids") {
    // one bucket of 5 ids, cap 3: pairs only among the 3 smallest
    val unpiv = Seq(5L, 3L, 9L, 1L, 7L).map(i => (i, 0, "b"))
      .toDF("id", "bidx", "bval")
    val got = Dedup.bucketPairs(unpiv, cap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 3L), (1L, 5L), (3L, 5L)))
    val uncapped = Dedup.bucketPairs(unpiv)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size == 10 && got.subsetOf(uncapped))
  }

  test("cap clip volume is observable via Observation metrics") {
    val unpiv = (1L to 7L).map(i => (i, 0, "hot"))
      .toDF("id", "bidx", "bval")
    val obs = new org.apache.spark.sql.Observation("capProbe")
    val pairs = Dedup.bucketPairsObserved(unpiv, cap = 3, obs)
    assert(pairs.count() == 3) // C(3,2) among the 3 smallest ids
    val row = obs.get
    assert(row("dropped_ids") == 4L) // 7 ids - cap 3
    assert(row("max_bucket") == 7)
  }

  test("banded sign-LSH near-dups: subset of brute force, all exact dups found") {
    val rnd = new Random(7)
    val emb = (0 until 60).map { i =>
      // 20 groups of 3: one base vector, one identical copy, one noisy
      val g = i / 3
      val base = Array.tabulate(64)(j =>
        math.sin(g * 64 + j).toFloat)
      val v = i % 3 match {
        case 2 => base.map(x => x + 0.8f * rnd.nextFloat())
        case _ => base
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val got = Dedup.embeddingNearDupsLsh(emb, "vec_id", "embedding",
        nPlanes = 32, bandSize = 8, dims = 64, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical copies (3g, 3g+1) MUST collide in every band
    (0 until 20).foreach { g =>
      assert(got.contains((3L * g, 3L * g + 1)),
        s"identical pair of group $g missed")
    }
    // verification step: everything reported really is cosine >= 0.9
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (i, v) => i -> v.map(_.toDouble) }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    got.foreach { case (a, b) =>
      assert(cos(vecs(a), vecs(b)) >= 0.9)
    }
  }

  test("lineDedup drops cross-doc boilerplate lines, preserves order, keeps empties") {
    // "cookie notice" appears in 3 docs (boilerplate, df > 2);
    // "unique …" lines are per-doc; the empty line must survive
    val docs = Seq(
      (1L, "unique alpha\nCookie Notice\n\nunique beta"),
      (2L, "cookie notice\nunique gamma"),
      (3L, "unique delta\n  COOKIE NOTICE  "),
      (4L, "unique epsilon only")).toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .lineDedup(docs, col("text"), col("doc_id"), maxDf = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // normalization (trim+lower) unifies all three spellings -> df 3 > 2
    assert(out(1L) == (("unique alpha\n\nunique beta", 3L, 1L)))
    assert(out(2L) == (("unique gamma", 1L, 1L)))
    assert(out(3L) == (("unique delta", 1L, 1L)))
    assert(out(4L) == (("unique epsilon only", 1L, 0L)))

    // at maxDf = 3 the boilerplate is within tolerance: nothing dropped
    val lax = graft.operators.Dedup
      .lineDedup(docs, col("text"), col("doc_id"), maxDf = 3)
      .agg(sum(col("n_dropped"))).collect()(0).getLong(0)
    assert(lax == 0L)

    // a doc whose EVERY line is boilerplate reassembles to empty text
    val all = Seq(
      (1L, "same"), (2L, "same"), (3L, "same")).toDF("doc_id", "text")
    val wiped = graft.operators.Dedup
      .lineDedup(all, col("text"), col("doc_id"), maxDf = 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(wiped.forall { case (_, t, d) => t == "" && d == 1L })
  }

  test("spanDedup: canonical doc keeps, others lose exactly the span, short docs pass") {
    // span = 5 tokens, spanLen = 3: its three interior windows are
    // shared by docs 1, 2, 3; doc 1 (min id) is canonical and keeps
    val span = "v w x y z"
    val docs = Seq(
      (1L, s"alpha beta $span"),             // canonical: untouched
      (2L, s"$span gamma delta epsilon"),    // drops the 5 span tokens
      (3L, s"k1 k2 k3 $span k4 k5"),         // drops mid-doc occurrence
      (4L, "zeta eta theta iota"),           // no span: untouched
      (5L, "v w")                            // < spanLen tokens: no windows
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, col("text"), col("doc_id"), spanLen = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((s"alpha beta $span", 7L, 0L)))
    assert(out(2L) === (("gamma delta epsilon", 3L, 5L)))
    assert(out(3L) === (("k1 k2 k3 k4 k5", 5L, 5L)))
    assert(out(4L) === (("zeta eta theta iota", 4L, 0L)))
    assert(out(5L) === (("v w", 2L, 0L)))
  }

  test("spanDedup: within-doc-only repeats survive; repeated foreign spans cut everywhere") {
    val docs = Seq(
      // "r s t" twice in ONE doc only: df counts distinct docs, kept
      (1L, "r s t m r s t"),
      // shared span in docs 2 and 3; doc 3 carries it TWICE — both cut
      (2L, "p q u p2"),
      (3L, "p q u mid1 mid2 p q u")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, col("text"), col("doc_id"), spanLen = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === (("r s t m r s t", 7L, 0L)))
    assert(out(2L) === (("p q u p2", 4L, 0L)))
    assert(out(3L) === (("mid1 mid2", 2L, 6L)))
  }

  test("spanDedup: overlapping duplicated spans merge their coverage") {
    // docs 1/2 share "a b c"; docs 1/3 share "b c d" — in doc 1 the two
    // foreign... no: doc 1 is canonical for neither? ids: min doc for
    // "a b c" is 1, for "b c d" is 1 → doc 1 canonical for both, keeps
    // all; doc 2 drops a b c; doc 3 drops b c d
    val docs = Seq(
      (1L, "a b c d x1"),
      (2L, "a b c x2 x3"),
      (3L, "x4 x5 b c d")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, col("text"), col("doc_id"), spanLen = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === (("a b c d x1", 5L, 0L)))
    assert(out(2L) === (("x2 x3", 2L, 3L)))
    assert(out(3L) === (("x4 x5", 2L, 3L)))
  }

  test("keepCanonical: one survivor per cluster, unclustered pass, exact deletion count") {
    val docs = (1L to 10L).map(Tuple1(_)).toDF("doc_id")
    // clusters {1,2,3} and {5,7}; 4,6,8,9,10 unclustered
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (7L, 5L))
      .toDF("doc_id", "component_id")
    val out = Dedup.keepCanonical(docs, col("doc_id"), comps)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1L, 4L, 5L, 6L, 8L, 9L, 10L))
    assert(out.filter(_._3).map(_._1).toSeq === Seq(1L, 5L))
    assert(out.filterNot(_._3).forall(_._2.isEmpty))
    // deletion count = |clustered| - |clusters|
    assert(docs.count() - out.length === 5 - 2)
  }

  test("connectedComponents: transitive clusters, chains converge, order-independent") {
    def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
      graft.operators.Dedup.connectedComponents(
          pairs.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // two clusters joined only transitively + an isolated pair
    val got = cc(Seq((2L, 3L), (1L, 2L), (10L, 11L), (3L, 7L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      10L -> 10L, 11L -> 10L))

    // a 12-vertex chain presented worst-case (high ids first): the min
    // label must walk the full diameter, not just one hop
    val chain = (1L to 11L).map(i => (i + 1, i)).reverse
    val gotChain = cc(chain)
    assert(gotChain == (1L to 12L).map(_ -> 1L).toMap)

    // duplicate and reversed edges collapse (symmetrize + distinct)
    assert(cc(Seq((5L, 6L), (6L, 5L), (5L, 6L))) == Map(5L -> 5L, 6L -> 5L))
  }

  /** Reference labeling: plain union-find — the same fixpoint the d11
    * DuckDB oracle's recursive CTE (transitive closure + min) states.
    */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // roots are min-canonical by the ordered union above
    parent.keys.toList.map(k => k -> find(k)).toMap
  }

  test("star contraction converges on a deep chain that exhausts propagation rounds") {
    // a 10k-node path (worst-case diameter): propagation alone would
    // need ~10k rounds; the degrade path must contract it in O(log n)
    val n = 10000L
    val chain = (1L until n).map(i => (i + 1, i)).reverse
    val got = graft.operators.Dedup.connectedComponents(
        chain.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n)
    assert(got.forall(_._2 == 1L))
  }

  test("contraction alone labels every vertex with its component min") {
    val got = graft.operators.Dedup.connectedComponentsContraction(
        Seq((2L, 3L), (1L, 2L), (10L, 11L), (3L, 7L), (20L, 21L))
          .toDF("doc_a", "doc_b"), "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("simhash kernel ≡ the expression pipeline on randomized unicode") {
    // the round-8 narrow kernel must reproduce the original
    // explode+groupBy expression formula bit-for-bit — same tokenizer
    // (lower, split keeping trailing empties, first-occurrence
    // distinct), same md5 bit extraction, same majority vote — since
    // the d04/d06 DuckDB oracles still state THAT formula
    def viaExpressions(df: org.apache.spark.sql.DataFrame, bits: Int): Map[Long, String] = {
      val nW = (bits + 31) / 32
      val words = (0 until nW).map(w =>
        conv(substring(col("h"), w * 8 + 1, 8), 16, 10).cast("long").as(s"h$w"))
      val tokens = df
        .select(col("doc_id"), explode(array_distinct(
          graft.operators.TextAnalysis.words(col("text")))).as("w"))
        .select(col("doc_id"), md5(col("w")).as("h"))
        .select(col("doc_id") +: words: _*)
      val sums = (0 until bits).map(b =>
        sum(expr(graft.operators.Dedup.simhashTermSql(b))).as(s"s$b"))
      tokens.groupBy("doc_id").agg(sums.head, sums.tail: _*)
        .select(col("doc_id"), concat((0 until bits).map(b =>
          when(col(s"s$b") > 0, "1").otherwise("0")): _*).as("simhash"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    val rnd = new Random(11)
    val vocab = Seq("the", "Quick", "BROWN", "fox", "über", "straße",
      "ΣΙΓΜΑ", "σίγμα", "İstanbul", "naïve", "日本語", "a1", "{}", "@@")
    val texts = (0L until 40L).map { i =>
      val n = rnd.nextInt(12)
      val sep = () => Seq(" ", "  ", "\t", "\n", " \n ")(rnd.nextInt(5))
      val body = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
        .mkString(sep())
      val padded = (if (rnd.nextBoolean()) " " else "") + body +
        (if (rnd.nextBoolean()) "  " else "")
      (i, padded)
    } ++ Seq((100L, ""), (101L, "   "), (102L, "one"))
    val df = texts.toDF("doc_id", "text")
    for (bits <- Seq(16, 64)) {
      val kernel = graft.operators.Dedup
        .simhashBits(df, col("text"), col("doc_id"), bits)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(kernel == viaExpressions(df, bits), s"bits=$bits diverged")
    }
  }

  test("minhash kernel ≡ the shingle-explode expression pipeline on randomized unicode") {
    // same contract as the simhash kernel pin: the zero-shuffle
    // per-document path must reproduce shingles→minhashSignatures
    // bit-for-bit (same tokenizer, <3-word drop, distinct 3-grams,
    // 14-hex md5 base hash, affine minima, banded join)
    val rnd = new Random(23)
    val vocab = Seq("the", "Quick", "BROWN", "fox", "über", "straße",
      "ΣΙΓΜΑ", "σίγμα", "İstanbul", "naïve", "日本語", "a1", "{}", "@@")
    val texts = (0L until 50L).map { i =>
      val n = rnd.nextInt(14)
      val sep = () => Seq(" ", "  ", "\t", "\n")(rnd.nextInt(4))
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(sep()) +
        (if (rnd.nextBoolean()) " " else ""))
    } ++ Seq((100L, ""), (101L, "one two"), (102L, "a b c"))
    val df = texts.toDF("doc_id", "text")
    val viaKernel = graft.operators.Dedup
      .minhashBands(df, col("text"), col("doc_id"), k = 8, bandSize = 2)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getString)).toMap
    val viaExpr = graft.operators.Dedup.minhashSignatures(
        graft.operators.Dedup.shingles(df, col("text"), col("doc_id")),
        k = 8, bandSize = 2)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getString)).toMap
    assert(viaKernel == viaExpr)
    assert(!viaKernel.contains(100L) && !viaKernel.contains(101L),
      "docs without a 3-gram must drop on both paths")
    assert(viaKernel.contains(102L))
  }

  test("self-loop-only vertices keep their label on every CC path") {
    // a pair (a,a) with no other edge: the contraction's edge
    // canonicalization drops the loop, but the vertex must still label
    // itself — the doc promises output identical to propagation's
    val pairs = Seq((9L, 9L), (1L, 2L)).toDF("doc_a", "doc_b")
    val want = Map(1L -> 1L, 2L -> 1L, 9L -> 9L)
    assert(graft.operators.Dedup.connectedComponentsContraction(
        pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == want)
    assert(graft.operators.Dedup.connectedComponents(
        pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == want)
    assert(graft.operators.Dedup.connectedComponents(
        pairs, "doc_a", "doc_b", propagationRounds = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == want)
  }

  test("random graphs: propagation, contraction, and the hybrid all match union-find") {
    // the d11 oracle-twin property check (VERDICT r7 #7): the Spark
    // loop vs the recursive-CTE fixpoint semantics (= union-find) on
    // random graphs — bridges, multi-cluster, dense and sparse shapes
    // the single LSH corpus row cannot cover
    val rnd = new Random(7)
    for (trial <- 0 until 12) {
      val nV = 4 + rnd.nextInt(30)
      val nE = 1 + rnd.nextInt(2 * nV)
      val ids = Seq.fill(nV)(rnd.nextInt(1000).toLong).distinct
      val pairs = Seq.fill(nE)(
        (ids(rnd.nextInt(ids.size)), ids(rnd.nextInt(ids.size))))
        .filter { case (a, b) => a != b }
      if (pairs.nonEmpty) {
        val expect = unionFind(pairs)
        val df = pairs.toDF("doc_a", "doc_b")
        val viaContraction = graft.operators.Dedup
          .connectedComponentsContraction(df, "doc_a", "doc_b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(viaContraction == expect, s"contraction, trial $trial: $pairs")
        // propagationRounds = 0 forces the full degrade path through
        // the label-contracted graph; default exercises propagation
        val viaDegrade = graft.operators.Dedup
          .connectedComponents(df, "doc_a", "doc_b", propagationRounds = 0)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(viaDegrade == expect, s"degrade, trial $trial: $pairs")
        val viaHybrid = graft.operators.Dedup
          .connectedComponents(df, "doc_a", "doc_b", propagationRounds = 1)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(viaHybrid == expect, s"hybrid(1), trial $trial: $pairs")
      }
    }
  }

  test("semDedup: triangular min-id rule within clusters, brute-force checked") {
    // Random 8-dim corpus with planted duplicate groups: identical
    // vectors must collapse to the min id; every verdict must satisfy
    // the paper's triangular rule (dropped iff a lower-id same-cluster
    // doc has cosine >= threshold), checked against a local brute force
    // of the operator's own cluster assignment.
    val rnd = new Random(11)
    val base = (0 until 20).map(_ => Array.fill(8)(rnd.nextDouble() * 2 - 1))
    val rows = (0 until 40).map { i =>
      val v = if (i < 20) base(i) else base(i - 20) // ids 20.. duplicate 0..
      (i.toLong, v.toSeq.map(_.toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Dedup.semDedup(df, "vec_id", "embedding", k = 6,
      threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == 40)
    val cluster = out.map(r => r._1 -> r._2).toMap
    // identical vectors always share a cluster (distance 0 ties to the
    // same lowest centroid index) and the higher id never survives
    for (i <- 0L until 20L) {
      assert(cluster(i) == cluster(i + 20), s"dup pair $i split")
      assert(!out.find(_._1 == i + 20).get._3, s"${i + 20} should drop")
    }
    // triangular rule against brute force over the operator's clusters
    val vecs = rows.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    out.foreach { case (id, cid, kept) =>
      val lowerSim = out.exists { case (j, cj, _) =>
        j < id && cj == cid && cos(vecs(id), vecs(j)) >= 0.95
      }
      assert(kept == !lowerSim, s"verdict for $id")
    }
    // determinism and salt sensitivity
    val again = Dedup.semDedup(df, "vec_id", "embedding", k = 6,
      threshold = 0.95).collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(again.sortBy(_._1).sameElements(out.sortBy(_._1)))
    val salted = Dedup.semDedup(df, "vec_id", "embedding", k = 6,
      threshold = 0.95, salt = "other")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the dup-collapse invariant holds under any seed
    for (i <- 0L until 20L) assert(salted(i) == salted(i + 20))
  }

  test("containmentPairs finds quotes Jaccard misses; df guard drops boilerplate") {
    val rnd = new Random(7)
    def sentence(n: Int): String =
      (0 until n).map(_ => s"w${rnd.nextInt(5000)}").mkString(" ")
    val long0 = sentence(200)
    val long1 = sentence(200)
    val quote = long0.split(" ").take(30).mkString(" ") // 0's prefix
    // 25 filler docs all carrying one shared boilerplate 5-gram: its
    // shingles exceed maxDf=20 and must not produce candidates
    val boiler = "all rights reserved contact us"
    val fillers = (10 until 35).map(i => (i.toLong, s"${sentence(40)} $boiler"))
    val df = (Seq(
      (0L, long0), (1L, long1), (2L, quote)) ++ fillers)
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(df, col("text"), col("doc_id"),
      minShared = 3, maxDf = 20, minContainment = 0.9)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))))
      .toMap
    // doc_a=0 is the 200-word source, doc_b=2 its 30-word quote: the
    // quote's shingles are a strict subset, so cont_b is exactly 1.0
    // while the source side stays barely covered
    assert(out.contains((0L, 2L)), s"quote pair missing: ${out.keySet}")
    val (nInter, _, nB, contA, contB) = out((0L, 2L))
    assert(nInter == nB && contB == 1.0, s"cont_b $contB != 1.0")
    assert(contA < 0.2, s"cont_a $contA unexpectedly high")
    // ...while Jaccard on the same pair would be far below any dedup
    // gate (28 shared / ~200-word union)
    val jac = Dedup.ngramJaccard(
      Seq((0L, 2L)).toDF("doc_a", "doc_b"),
      Dedup.shingles(df, col("text"), col("doc_id")))
      .collect().head.getDouble(2)
    assert(jac < 0.2, s"jaccard $jac unexpectedly high")
    // no filler pair surfaced: the boilerplate shingles' df (25) is past
    // the guard, and their random bodies share nothing
    assert(out.keySet == Set((0L, 2L)),
      s"unexpected pairs: ${out.keySet - ((0L, 2L))}")
  }
}
