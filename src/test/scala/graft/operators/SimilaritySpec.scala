package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the ANN operators: IVF must search only the probed
  * inverted lists, and brute force must rank by exact cosine.
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Two well-separated clusters: ids 0-4 near e1, ids 5-9 near e2.
    * Small per-id jitter keeps cosines distinct so ranks are stable.
    */
  private lazy val emb = (0 until 10).map { i =>
    val base = if (i < 5) Array(1f, 0f, 0f, 0f) else Array(0f, 1f, 0f, 0f)
    base(2) = 0.01f * i  // deterministic jitter, preserves cluster order
    (i.toLong, base)
  }.toDF("vec_id", "embedding")

  test("ivfTopK searches only the probed inverted lists") {
    // centroids 0 (cluster A) and 5 (cluster B); query 1 probes 1 list
    val res = Similarity.ivfTopK(emb, "vec_id", "embedding",
      col("vec_id") % 5 === 0, col("vec_id") === 1, nprobe = 1, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(res.map(_._1).toSet == Set(1L))
    // cluster B (ids 5-9) must be invisible at nprobe=1
    assert(res.map(_._2).toSet == Set(0L, 2L, 3L, 4L))
    assert(res.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("ivfTopK with nprobe covering all lists matches brute force") {
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
      col("vec_id") % 5 === 0, col("vec_id") === 1, nprobe = 2, k = 10)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getLong(2)))
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      col("vec_id") === 1, k = 10)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ivf.toSeq == bf.toSeq)
  }

  test("ivfTopKFixedK probing every list matches brute force; K bounded") {
    // numCentroids = nprobe = 4: all lists probed => exact result,
    // regardless of which 4 vectors the md5 ranking selects.
    val ivf = Similarity.ivfTopKFixedK(emb, "vec_id", "embedding",
      numCentroids = 4, col("vec_id") === 1, nprobe = 4, k = 10)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getLong(2)))
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      col("vec_id") === 1, k = 10)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ivf.toSeq == bf.toSeq)
  }

  test("Lloyd refinement recovers cluster structure: recall >= 0.8 at nprobe <= 12") {
    // 10 well-separated clusters x 40 members in 64 dims. The md5 seed
    // sample is uniform over MEMBERS, so seed centroids land inside
    // clusters at random; one spherical-k-means pass pulls each
    // surviving centroid to its cluster's mean, so probing 12 of 32
    // lists covers the query's true neighborhood.
    val rnd = new scala.util.Random(42)
    val dims = 64
    val centers = Array.fill(10)(Array.fill(dims)(rnd.nextGaussian().toFloat))
    val rows = (0 until 400).map { i =>
      val c = centers(i % 10)
      val v = Array.tabulate(dims)(d => c(d) + 0.15f * rnd.nextGaussian().toFloat)
      (i.toLong, v)
    }
    val clustered = rows.toDF("vec_id", "embedding")
    val queries = col("vec_id") < 3
    val k = 10
    val bf = Similarity.bruteForceTopK(clustered, "vec_id", "embedding",
      queries, k).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity.ivfTopKFixedK(clustered, "vec_id", "embedding",
      numCentroids = 32, queries, nprobe = 12, k = k, lloydIters = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = bf.map { case (q, truth) =>
      ivf.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall $mean (per-query ${recalls.toSeq})")
  }

  test("zero-norm vectors never mint a phantom Lloyd centroid") {
    // an all-zero embedding has NaN cosine to every centroid: it must
    // claim no inverted list and contribute to no refined centroid —
    // results with the zero row present equal results without it
    val base = (0 until 40).map { i =>
      val v = Array.tabulate(8)(d => (1.0f + i % 5) * (d + 1) / 8.0f)
      v(i % 8) += 2.0f
      (i.toLong, v)
    }
    val clean = base.toDF("vec_id", "embedding")
    val withZero = (base :+ ((999L, Array.fill(8)(0.0f))))
      .toDF("vec_id", "embedding")
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopKFixedK(df, "vec_id", "embedding",
        numCentroids = 8, col("vec_id") < 2, nprobe = 4, k = 5,
        lloydIters = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(withZero) == run(clean))
    assert(!run(withZero).exists(_._2 == 999L))
  }

  test("lshTopK: an identical vector always surfaces as the top neighbor") {
    // identical vectors share every band, so recall for exact copies is
    // 1.0 by construction regardless of geometry
    val withDup = emb.union(Seq((100L, Array(1f, 0f, 0.01f, 0f)))
      .toDF("vec_id", "embedding")) // copy of vec 1
    val res = Similarity.lshTopK(withDup, "vec_id", "embedding",
      col("vec_id") === 1, nPlanes = 12, bandSize = 3, dims = 4, k = 3)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(res.head == ((100L, 1L)))
  }

  test("pqTopK: ADC shortlist + refine reaches recall >= 0.9 vs exact L2, deterministic") {
    // same clustered generator as the Lloyd test: 10 clusters x 40
    // members in 64 dims; PQ at 8 subspaces x 16 codes (8 bytes per
    // vector, 32x compression) must put the query's true L2 top-10
    // almost entirely in its approximate top-10
    val rnd = new scala.util.Random(42)
    val dims = 64
    val centers = Array.fill(10)(Array.fill(dims)(rnd.nextGaussian().toFloat))
    val rows = (0 until 400).map { i =>
      val c = centers(i % 10)
      val v = Array.tabulate(dims)(d => c(d) + 0.15f * rnd.nextGaussian().toFloat)
      (i.toLong, v)
    }
    val clustered = rows.toDF("vec_id", "embedding")
    val k = 10

    // exact L2 top-k per query, computed locally (test-scale)
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var j = 0
      while (j < a.length) { val t = a(j).toDouble - b(j); d += t * t; j += 1 }
      d
    }
    val byId = rows.toMap
    val truth = (0L until 3L).map { q =>
      q -> rows.filter(_._1 != q)
        .map { case (i, v) => (l2(byId(q), v), i) }
        .sorted.take(k).map(_._2).toSet
    }.toMap

    // bare ADC top-k: codes collapse within-cluster fine structure, so
    // recall against exact top-10 INSIDE a 40-member cluster is near
    // the 10/39 random floor — the documented reason rerank exists
    val bare = Similarity.pqTopK(clustered, "vec_id", "embedding",
      numSub = 8, codebookBits = 4, col("vec_id") < 3, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val bareMean = truth.map { case (q, t) =>
      bare.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / truth.size
    // the ADC shortlist still lands in the right CLUSTER — with the
    // refine step over a 40-deep shortlist, exact re-ranking recovers
    // the true neighbors
    val pq = Similarity.pqTopK(clustered, "vec_id", "embedding",
      numSub = 8, codebookBits = 4, col("vec_id") < 3, k = k, rerank = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = truth.map { case (q, t) =>
      pq.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean PQ+refine recall $mean (per-query ${recalls.toSeq})")
    assert(mean > bareMean,
      s"refine ($mean) must beat bare ADC ($bareMean) on within-cluster queries")

    // deterministic: a second run returns the identical ranking
    val again = Similarity.pqTopK(clustered, "vec_id", "embedding",
      numSub = 8, codebookBits = 4, col("vec_id") < 3, k = k, rerank = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val first = Similarity.pqTopK(clustered, "vec_id", "embedding",
      numSub = 8, codebookBits = 4, col("vec_id") < 3, k = k, rerank = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == first)

    // ranks are 1..k per query and the query never ranks itself
    val full = Similarity.pqTopK(clustered, "vec_id", "embedding",
      numSub = 8, codebookBits = 4, col("vec_id") === 0, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(full.map(_._3).sorted.toSeq == (1L to k).toSeq)
    assert(!full.exists(r => r._2 == r._1))
  }

  test("pqTopK: query batching is invisible — batched ≡ single-batch, with and without refine") {
    // 10 vectors, ALL of them queries, batchSize 3 → 4 id-range
    // batches, each broadcasting its own ADC tables over the same
    // checkpointed codes; the union must equal the one-batch run
    // row-for-row (query sets are disjoint, top-k is per-query)
    for (rr <- Seq(0, 5)) {
      val one = Similarity.pqTopK(emb, "vec_id", "embedding",
        numSub = 2, codebookBits = 3, lit(true), k = 3, rerank = rr)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batched = Similarity.pqTopK(emb, "vec_id", "embedding",
        numSub = 2, codebookBits = 3, lit(true), k = 3, rerank = rr,
        batchSize = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(batched == one, s"rerank=$rr: batched run diverged")
      assert(one.map(_._1) == (0L until 10L).toSet)
    }
  }

  test("pqTopK: an exact duplicate of the query codes identically and ranks first") {
    // a byte-identical vector quantizes to the same codes, so its ADC
    // distance equals the query's own-code distance — the minimum — and
    // the duplicate must surface at rank 1
    val withDup = emb.union(Seq((100L, Array(1f, 0f, 0.01f, 0f)))
      .toDF("vec_id", "embedding")) // copy of vec 1
    val res = Similarity.pqTopK(withDup, "vec_id", "embedding",
      numSub = 2, codebookBits = 3, col("vec_id") === 1, k = 3)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(res.head == ((100L, 1L)))
  }

  test("bruteForceTopK ranks the query's own cluster first") {
    val res = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      col("vec_id") === 7, k = 4)
      .orderBy("rank").collect().map(_.getLong(1))
    assert(res.toSet == Set(5L, 6L, 8L, 9L))
  }
}
