package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor operators over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast nested-loop of a
  * *small* query set against the (arbitrarily large, partitioned)
  * candidate set, then a per-query top-k window. Scale path: deterministic
  * random-hyperplane sign buckets (8 md5-seeded planes); bucketing is a
  * narrow map, and candidate generation becomes a hash join on bucket ids
  * so the 100 TB plan never materializes an all-pairs product.
  */
object Similarity {

  /** Cast a float array column to double for exact, engine-portable
    * arithmetic (float→double is lossless).
    */
  def asDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  def l2norm(vecD: Column): Column =
    sqrt(aggregate(vecD, lit(0.0d), (acc, x) => acc + x * x))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** Filter candidate pairs by exact cosine >= threshold with a typed
    * JVM kernel: the per-pair dense dot product is pure numeric work
    * where HOF expressions (`zip_with` + `aggregate`) pay per-element
    * interpreted-lambda overhead — the same finding as [[signBuckets]].
    * Input columns: vec_a, vec_b, _va, _vb (double arrays), _na, _nb
    * (norms). Ascending-index double accumulation matches the DuckDB
    * oracle's list_dot_product exactly. Narrow — no shuffle.
    */
  def cosineFilterPairs(pairs: DataFrame, threshold: Double): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs
      .select(col("vec_a").cast("long"), col("vec_b").cast("long"),
        col("_va"), col("_vb"), col("_na"), col("_nb"))
      .as[(Long, Long, Array[Double], Array[Double], Double, Double)]
      .mapPartitions { it =>
        it.flatMap { case (a, b, va, vb, na, nb) =>
          var acc = 0.0
          var j = 0
          val n = va.length
          while (j < n) { acc += va(j) * vb(j); j += 1 }
          if (acc / (na * nb) >= threshold) Iterator.single((a, b))
          else Iterator.empty
        }
      }
      .toDF("vec_a", "vec_b")
  }

  /** [[cosineFilterPairs]] with STRING pair ids — the
    * [[graft.sources.SemDedupIndex]] seam, where ids are azof keys
    * (long-castable or not) and the dominance order is the caller's
    * concern. Same kernel, same fixed fold order.
    */
  def cosineFilterPairsStr(pairs: DataFrame, threshold: Double): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs
      .select(col("vec_a").cast("string"), col("vec_b").cast("string"),
        col("_va"), col("_vb"), col("_na"), col("_nb"))
      .as[(String, String, Array[Double], Array[Double], Double, Double)]
      .mapPartitions { it =>
        it.flatMap { case (a, b, va, vb, na, nb) =>
          var acc = 0.0
          var j = 0
          val n = va.length
          while (j < n) { acc += va(j) * vb(j); j += 1 }
          if (acc / (na * nb) >= threshold) Iterator.single((a, b))
          else Iterator.empty
        }
      }
      .toDF("vec_a", "vec_b")
  }

  /** Brute-force cosine top-k of each query vector (small set, broadcast)
    * against all candidates. Output: (query_id, neighbor_id, rank).
    */
  def bruteForceTopK(
      emb: DataFrame, id: String, vec: String,
      queryFilter: Column, k: Int): DataFrame = {
    val e = emb.select(col(id).as("_id"), asDouble(col(vec)).as("_v"))
      .withColumn("_norm", l2norm(col("_v")))
    val q = e.where(queryFilter.as("_qf"))
      .select(col("_id").as("query_id"), col("_v").as("_qv"),
        col("_norm").as("_qn"))
    val cand = e.select(col("_id").as("neighbor_id"), col("_v").as("_cv"),
      col("_norm").as("_cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_cos").desc, col("neighbor_id"))
    broadcast(q).join(cand, col("query_id") =!= col("neighbor_id"))
      .withColumn("_cos", dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    * path next to [[bruteForceTopK]]:
    *
    *  1. centroids: a deterministic sample of the data itself
    *    (`centroidFilter`), small enough to broadcast;
    *  2. assignment: every vector joins the broadcast centroid set and
    *    keeps its best centroid — a narrow, partition-parallel map over
    *    the table (cost N·C, no shuffle of the vectors);
    *  3. probe: each query ranks the same broadcast centroid set and
    *    keeps `nprobe` lists;
    *  4. search: a hash join on centroid id restricts exact cosine
    *    re-ranking to the probed inverted lists — the only shuffle in the
    *    plan, and it scales with |queries|·avg-list-size, not N².
    *
    * Ties (equal cosine) break toward the lower id at every step, so the
    * result is engine-portable. Output: (query_id, neighbor_id, rnk).
    */
  def ivfTopK(
      emb: DataFrame, id: String, vec: String,
      centroidFilter: Column, queryFilter: Column,
      nprobe: Int, k: Int): DataFrame = {
    import emb.sparkSession.implicits._
    val e = prepVectors(emb, id, vec)
    // Centroids are collected ONCE (they are small by contract — this is
    // the same data movement a broadcast performs) and reused both by the
    // assignment kernel and, as a local DataFrame, by the probe join —
    // re-deriving them from `e` would scan the table a second time.
    val centArr = e.where(centroidFilter.as("_cf"))
      .select(col("_id").cast("long").as("_cid"), col("_v").as("_cv"),
        col("_n").as("_cn"))
      .as[(Long, Array[Double], Double)]
      .collect()
      .sortBy(_._1)
    ivfCore(e, centArr, queryFilter, nprobe, k)
  }

  /** IVF top-k with a FIXED centroid budget, decoupled from table size —
    * the 100-TB-safe entry point. Centroids are the `numCentroids`
    * vectors ranking smallest by md5("cent#" || id): a deterministic,
    * engine-portable uniform sample whose selection runs as a
    * per-partition top-K (`TakeOrderedAndProject` — one scan, a K-element
    * heap per partition, never a global sort), so the driver collect and
    * the broadcast stay O(numCentroids) no matter how large the table
    * grows. Probe cost per query is numCentroids dot products; list
    * search scales with nprobe/numCentroids of the data.
    */
  /** @param lloydIters Lloyd (spherical k-means) refinement passes over
    *                    the seed sample (default 1). The md5 sample is
    *                    uniform — fine when the data is too, but real
    *                    embedding corpora cluster, and centroids that
    *                    ignore the cluster structure force high nprobe
    *                    for recall. Each pass is one narrow N·K argmax
    *                    kernel with per-partition partial sums (the
    *                    shuffle moves K·partitions tiny rows, never the
    *                    vectors) and an O(K·dims) driver reduce.
    */
  def ivfTopKFixedK(
      emb: DataFrame, id: String, vec: String,
      numCentroids: Int, queryFilter: Column,
      nprobe: Int, k: Int, lloydIters: Int = 1): DataFrame = {
    import emb.sparkSession.implicits._
    val e = prepVectors(emb, id, vec)
    var centArr = e
      .orderBy(md5(concat(lit("cent#"), col("_id"))), col("_id"))
      .limit(numCentroids)
      .select(col("_id").cast("long").as("_cid"), col("_v").as("_cv"),
        col("_n").as("_cn"))
      .as[(Long, Array[Double], Double)]
      .collect()
      .sortBy(_._1)
    for (_ <- 0 until lloydIters) centArr = lloydStep(e, centArr)
    ivfCore(e, centArr, queryFilter, nprobe, k)
  }

  /** One spherical-k-means step: assign every vector to its best current
    * centroid (same argmax kernel and tie rule as [[ivfCore]]), then
    * replace each centroid with its cluster's element-wise mean (cosine
    * is scale-invariant, so the unnormalized mean is the spherical
    * update). Seeds that capture no vectors drop out (each seed captures
    * at least itself unless an earlier duplicate absorbs it). Mean
    * coordinates are floor-quantized at 1e-6 — cross-row float
    * aggregation is order-sensitive, and the quantized value is what
    * both this kernel and the DuckDB oracle can agree on exactly.
    */
  private def lloydStep(
      e: DataFrame,
      centArr: Array[(Long, Array[Double], Double)]): Array[(Long, Array[Double], Double)] = {
    if (centArr.isEmpty) return centArr
    val spark = e.sparkSession
    import spark.implicits._
    val centB = spark.sparkContext.broadcast(centArr)
    e.select(col("_id").cast("long"), col("_v"), col("_n"))
      .as[(Long, Array[Double], Double)]
      .mapPartitions { it =>
        val cs = centB.value
        val sums = scala.collection.mutable.HashMap
          .empty[Long, (Array[Double], Long)]
        it.foreach { case (_, v, n) =>
          var bestCid = -1L
          var bestCos = Double.NegativeInfinity
          var c = 0
          while (c < cs.length) {
            val (cid, cv, cn) = cs(c)
            var acc = 0.0
            var j = 0
            while (j < v.length) { acc += v(j) * cv(j); j += 1 }
            val cos = acc / (n * cn)
            if (cos > bestCos) { bestCos = cos; bestCid = cid }
            c += 1
          }
          // zero-norm vectors (NaN cosine everywhere) claim no centroid:
          // accumulating them under the -1 sentinel would MINT a phantom
          // centroid that ivfCore then probes with NaN cosines (ranked
          // first under desc NaN ordering) — skip them, matching how
          // ivfCore's assignment already leaves them in no inverted list
          if (bestCid >= 0) {
            val (s, cnt) = sums.getOrElseUpdate(bestCid,
              (new Array[Double](v.length), 0L))
            var j = 0
            while (j < v.length) { s(j) += v(j); j += 1 }
            sums(bestCid) = (s, cnt + 1)
          }
        }
        sums.iterator.map { case (cid, (s, n)) => (cid, s, n) }
      }
      .groupByKey(_._1)
      .reduceGroups { (a, b) =>
        val s = a._2.clone()
        var j = 0
        while (j < s.length) { s(j) += b._2(j); j += 1 }
        (a._1, s, a._3 + b._3)
      }
      .map(_._2)
      .collect()
      .map { case (cid, s, n) =>
        val m = s.map(x => math.floor(x / n * 1e6) / 1e6)
        var acc = 0.0
        var j = 0
        while (j < m.length) { acc += m(j) * m(j); j += 1 }
        (cid, m, math.sqrt(acc))
      }
      .sortBy(_._1)
  }

  private def prepVectors(emb: DataFrame, id: String, vec: String): DataFrame =
    emb.select(col(id).as("_id"), asDouble(col(vec)).as("_v"))
      .withColumn("_n", l2norm(col("_v")))

  private def ivfCore(
      e: DataFrame, centArr: Array[(Long, Array[Double], Double)],
      queryFilter: Column, nprobe: Int, k: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val cents = broadcast(
      spark.createDataFrame(centArr.toSeq).toDF("_cid", "_cv", "_cn"))
    // Assignment as a typed kernel over broadcast centroids: a narrow
    // N·C argmax with ZERO shuffle, instead of materializing N·C rows
    // through a window sort. Ascending-cid iteration with strict-greater
    // comparison reproduces the (cos DESC, cid ASC) tie rule exactly.
    val centB = spark.sparkContext.broadcast(centArr)
    val assign = e.select(col("_id").cast("long"), col("_v"), col("_n"))
      .as[(Long, Array[Double], Double)]
      .mapPartitions { it =>
        val cs = centB.value
        it.map { case (vid, v, n) =>
          var bestCid = -1L
          var bestCos = Double.NegativeInfinity
          var c = 0
          while (c < cs.length) {
            val (cid, cv, cn) = cs(c)
            var acc = 0.0
            var j = 0
            while (j < v.length) { acc += v(j) * cv(j); j += 1 }
            val cos = acc / (n * cn)
            if (cos > bestCos) { bestCos = cos; bestCid = cid }
            c += 1
          }
          (vid, bestCid)
        }
      }
      .toDF("_cand_id", "_acid")
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("_cos").desc, col("_cid"))
    val probe = e.where(queryFilter.as("_qf"))
      .select(col("_id").as("query_id"), col("_v").as("_qv"), col("_n").as("_qn"))
      .join(cents)
      .withColumn("_cos", dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")))
      .withColumn("_rn", row_number().over(wProbe))
      .where(col("_rn") <= nprobe)
      .select(col("query_id"), col("_qv"), col("_qn"), col("_cid"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("_cos").desc, col("neighbor_id"))
    probe.join(assign, col("_acid") === col("_cid") &&
        col("_cand_id") =!= col("query_id"))
      .select(col("query_id"), col("_qv"), col("_qn"),
        col("_cand_id").as("neighbor_id"))
      .join(e.select(col("_id").as("neighbor_id"), col("_v").as("_cv2"),
        col("_n").as("_cn2")), Seq("neighbor_id"))
      .withColumn("_cos", dot(col("_qv"), col("_cv2")) / (col("_qn") * col("_cn2")))
      .withColumn("rnk", row_number().over(wTop).cast("long"))
      .where(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk")
  }

  /** ANN top-k via banded sign-LSH — the bucketed scale path for SEARCH
    * (s02 exposes the buckets themselves; this probes them): a query's
    * candidates are all vectors sharing ANY band of its bucket signature
    * (same OR-construction as the near-dup blocker), re-ranked by exact
    * cosine, top-k per query. The bucketing kernel is narrow; candidate
    * generation is a broadcast hash join of the (small) query band set
    * against the table's bands — no shuffle of the table, never an
    * all-pairs product; exact cosine touches candidates only. Recall
    * rises with band count at linear cost. Output: (query_id,
    * neighbor_id, rnk) with ties broken toward the lower id.
    */
  def lshTopK(
      emb: DataFrame, id: String, vec: String,
      queryFilter: Column, nPlanes: Int, bandSize: Int, dims: Int,
      k: Int): DataFrame = {
    require(nPlanes % bandSize == 0, "nPlanes must be a multiple of bandSize")
    val nBands = nPlanes / bandSize
    val buckets = signBuckets(emb, id, vec, nPlanes, dims)
    def bandsOf(b: DataFrame): DataFrame = b.select(col("vec_id"), posexplode(
        array((0 until nBands).map(i =>
          substring(col("bucket"), i * bandSize + 1, bandSize)): _*)))
      .toDF("vec_id", "bidx", "bval")
    val e = emb.select(col(id).cast("long").as("_id"),
      asDouble(col(vec)).as("_v"))
      .withColumn("_n", l2norm(col("_v")))
    // Query-side signatures come from a kernel over the FILTERED query
    // rows (|Q| dot-product evaluations) — bucketing the whole table and
    // then joining down to the query ids would run the nPlanes·N kernel
    // a second time just to discard all but |Q| rows.
    val qBands = bandsOf(
        signBuckets(emb.where(queryFilter), id, vec, nPlanes, dims))
      .toDF("query_id", "bidx", "bval")
    val cands = bandsOf(buckets).join(broadcast(qBands), Seq("bidx", "bval"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_cos").desc, col("neighbor_id"))
    cands
      .join(e.select(col("_id").as("query_id"), col("_v").as("_qv"),
        col("_n").as("_qn")), Seq("query_id"))
      .join(e.select(col("_id").as("neighbor_id"), col("_v").as("_cv"),
        col("_n").as("_cn")), Seq("neighbor_id"))
      .withColumn("_cos", dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk")
  }

  /** Product-quantization (PQ) approximate top-k — the MEMORY-COMPRESSED
    * ANN scale path next to [[ivfTopKFixedK]]'s coarse quantizer (the
    * asymmetric-distance scheme of Jégou et al., "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011): each vector compresses
    * to `numSub` byte codes (64 floats → 8 bytes at the defaults, 32×
    * smaller), and queries scan CODES with a per-query lookup table
    * instead of raw vectors — the shape that keeps a 100-TB embedding
    * corpus's search working set in memory.
    *
    *  1. '''codebooks''': per subspace, `2^codebookBits` sub-centroids
    *     seeded from the md5-deterministic sample (same seeding rule as
    *     [[ivfTopKFixedK]]) and refined by `lloydIters` L2 Lloyd passes
    *     — driver state is O(numSub · 2^bits · subDim) doubles, tiny and
    *     broadcast; each pass is ONE narrow pass over the data with
    *     per-partition partial sums (the shuffle moves subspace-count ×
    *     codebook-size tiny rows, never vectors);
    *  2. '''encode''': one narrow argmin kernel (no shuffle) → codes;
    *  3. '''search''' (ADC): per query a `numSub × 2^bits` table of
    *     squared-L2 partials against the codebooks, broadcast; each
    *     candidate's approximate distance is `numSub` array lookups over
    *     its codes — a narrow map, then one per-query top-k window (the
    *     only shuffle).
    *
    * Metric is squared L2, the PQ standard (rank-equal to cosine on
    * normalized inputs). APPROXIMATE by construction — quantization
    * error depends on float iteration order of the k-means refinement,
    * which no cross-engine oracle can pin bit-exactly, so the gate is a
    * recall property against exact top-k (SimilaritySpec; the same
    * reasoning as the x01 sketch gate, while s01–s04 carry the ANN
    * oracle rows). Output: (query_id, neighbor_id, rnk) by ascending
    * approximate distance, ties toward the lower id; the query's own
    * row is excluded.
    *
    * `rerank > 0` adds the standard refine step (the FAISS
    * IndexRefineFlat composition): the ADC pass keeps a SHORTLIST of
    * `max(k, rerank)` candidates per query, exact squared-L2 re-ranks
    * the shortlist against the raw vectors, and the top-k of THAT is
    * returned. Codes cannot separate vectors that quantize identically
    * (within-cluster fine structure), so bare ADC top-k has low recall
    * exactly there — the shortlist recovers it at the cost of
    * |queries| · rerank exact distances (one broadcast semi-join to
    * fetch the shortlist's raw vectors; the table is never re-scanned
    * per query).
    *
    * Input-scan discipline: the projected input is persisted for the
    * call's driver-side actions (seed sample, Lloyd passes, query
    * collects) and the codes are eagerly checkpointed, so one call
    * scans the raw input ONCE for those stages no matter how many
    * query batches run; only the lazy refine join in the returned plan
    * re-reads it (once, at action time).
    *
    * Query sets LARGER than the per-batch broadcast budget (10k) run
    * automatically in id-range batches — each batch broadcasts its own
    * ADC tables and scans the checkpointed codes once, and the batch
    * results union (query sets are disjoint, so per-query top-k is
    * unaffected). The TOTAL query-id collect is capped at 1M ids
    * (driver memory), loudly.
    */
  /** @param batchSize per-batch query cap (default [[PqQueryBatch]]);
    *                    smaller values trade broadcast size for more
    *                    passes over the (checkpointed) codes
    */
  def pqTopK(
      emb: DataFrame, id: String, vec: String,
      numSub: Int, codebookBits: Int,
      queryFilter: Column, k: Int, lloydIters: Int = 2,
      rerank: Int = 0, batchSize: Int = PqQueryBatch): DataFrame = {
    require(batchSize >= 1 && batchSize <= PqQueryBatch,
      s"batchSize must be in [1, $PqQueryBatch]")
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb.select(col(id).cast("long").as("_id"),
      asDouble(col(vec)).as("_v")).persist()
    try {
      val model = pqTrain(e, numSub, codebookBits, lloydIters)
      val codes = pqEncode(e, model).localCheckpoint(true)
      val eq = e.where(queryFilter)
      val maxTotalQ = 1000000
      // DISTINCT ids: duplicate `_id` rows must not become duplicate
      // query entries (double top-k rows) nor straddle two id-range
      // batches (double-collected) — one deterministic query per id
      val qids = eq.select(col("_id")).distinct().as[Long]
        .limit(maxTotalQ + 1).collect().sorted
      require(qids.length <= maxTotalQ,
        s"pqTopK query set exceeds $maxTotalQ vectors — even the " +
          "query-ID collect is driver state at that size; shard the " +
          "query filter externally")
      if (qids.isEmpty)
        Seq.empty[(Long, Long, Long)].toDF("query_id", "neighbor_id", "rnk")
      else {
        val batches = qids.grouped(batchSize).map(g => (g.head, g.last))
        val results = batches.map { case (lo, hi) =>
          // dedupe collected rows by id (a duplicated id contributes
          // ONE query vector — the min-ordinal row, deterministic)
          val queries = eq.where(col("_id").between(lo, hi))
            .as[(Long, Array[Double])].collect()
            .groupBy(_._1).toArray.sortBy(_._1)
            .map { case (id, rows) =>
              (id, rows.map(_._2.toSeq).min(
                Ordering.Implicits.seqOrdering[Seq, Double]).toArray)
            }
          val res = pqSearchBatch(e, codes, model, queries, k, rerank)
          // multi-batch calls materialize each batch eagerly while the
          // input/codes caches are hot: a lazy union of B refine plans
          // would re-scan the raw input B times at action time, after
          // the finally block dropped the cache
          if (qids.length > batchSize) res.localCheckpoint(true) else res
        }
        results.reduce(_ unionAll _)
      }
    } finally { e.unpersist(); () }
  }

  /** Per-batch query cap for [[pqTopK]]: each batch's ADC tables are
    * `|batch| · numSub · 2^bits` doubles of driver/broadcast state.
    */
  val PqQueryBatch: Int = 10000

  /** Trained PQ codebooks: `books(s)(c)` is sub-centroid `c` of
    * subspace `s` (`subDim` doubles each).
    */
  final case class PqModel(
      numSub: Int, subDim: Int, books: Array[Array[Array[Double]]])

  /** Train PQ codebooks on `e` (`_id`, `_v` double-array): the
    * md5-deterministic seed sample (same rule as [[ivfTopKFixedK]])
    * refined by `lloydIters` L2 Lloyd passes; with `lloydIters = 0`
    * the codebooks ARE the seed sample — fully deterministic and
    * engine-replayable, the variant a persisted index pins.
    */
  def pqTrain(
      e: DataFrame, numSub: Int, codebookBits: Int,
      lloydIters: Int): PqModel = {
    require(numSub >= 1, "numSub must be >= 1")
    require(codebookBits >= 1 && codebookBits <= 8,
      "codebookBits must be in [1, 8] (codes are bytes)")
    val spark = e.sparkSession
    import spark.implicits._
    val ksize = 1 << codebookBits
    val dimsRow = e.select(size(col("_v"))).limit(1).collect()
    require(dimsRow.nonEmpty, "pqTrain on an empty table")
    val dims = dimsRow(0).getInt(0)
    require(dims % numSub == 0, s"dims $dims not divisible by numSub $numSub")
    val subDim = dims / numSub
    val seed = e
      .orderBy(md5(concat(lit("pq#"), col("_id"))), col("_id"))
      .limit(ksize)
      .select(col("_v")).as[Array[Double]].collect()
    var books: Array[Array[Array[Double]]] = Array.tabulate(numSub)(s =>
      seed.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim)))
    for (_ <- 0 until lloydIters)
      books = pqLloydStep(e, books, subDim)
    PqModel(numSub, subDim, books)
  }

  /** Encode `e` (`_id`, `_v`) against the model: per-subspace argmin
    * over the broadcast codebooks — one narrow kernel, no shuffle.
    * Output: `(_id, _codes array<byte>)`, ties toward the lower code.
    */
  def pqEncode(e: DataFrame, model: PqModel): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val booksB = spark.sparkContext.broadcast(model.books)
    e.select(col("_id"), col("_v")).as[(Long, Array[Double])]
      .mapPartitions { it =>
        val bs = booksB.value
        it.map { case (vid, v) => (vid, encodeOne(bs, v)) }
      }.toDF("_id", "_codes")
  }

  /** The per-vector encode kernel — the ONE implementation every
    * encoder shares ([[pqEncode]], the persisted index's refresh), so
    * a kernel change can never diverge persisted codes from
    * recomputed ones. Per subspace: argmin of ascending-index squared
    * L2 against the codebook, ties toward the lower code.
    */
  private[graft] def encodeOne(
      bs: Array[Array[Array[Double]]], v: Array[Double]): Array[Byte] = {
    val sd = bs(0)(0).length
    val cs = new Array[Byte](bs.length)
    var s = 0
    while (s < bs.length) {
      val book = bs(s)
      val off = s * sd
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cv = book(c)
        var d = 0.0
        var j = 0
        while (j < cv.length) { val t = v(off + j) - cv(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      cs(s) = best.toByte
      s += 1
    }
    cs
  }

  /** ADC search (+ optional exact refine) for ONE query batch over a
    * precomputed codes frame — the reusable kernel [[pqTopK]] batches
    * over and a persisted codes index answers s05-shaped queries with
    * directly (see [[graft.sources.PqIndex]]).
    */
  def pqSearchBatch(
      e: DataFrame, codes: DataFrame, model: PqModel,
      queries: Array[(Long, Array[Double])], k: Int,
      rerank: Int): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    require(queries.length <= PqQueryBatch,
      s"pqSearchBatch got ${queries.length} queries — cap is $PqQueryBatch")
    val subDim = model.subDim
    val books = model.books
    val tables: Array[(Long, Array[Array[Double]])] = queries.map {
      case (qid, qv) =>
        val t = Array.tabulate(books.length) { s =>
          val off = s * subDim
          books(s).map { cv =>
            var d = 0.0
            var j = 0
            while (j < cv.length) { val t0 = qv(off + j) - cv(j); d += t0 * t0; j += 1 }
            d
          }
        }
        (qid, t)
    }
    val tablesB = spark.sparkContext.broadcast(tables)
    val shortlistK = math.max(k, rerank)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_ad").asc, col("neighbor_id"))
    val adcTop = codes.select(col("_id"), col("_codes"))
      .as[(Long, Array[Byte])].mapPartitions { it =>
        val ts = tablesB.value
        it.flatMap { case (vid, cs) =>
          ts.iterator.filter(_._1 != vid).map { case (qid, t) =>
            var d = 0.0
            var s = 0
            while (s < cs.length) { d += t(s)(cs(s) & 0xff); s += 1 }
            (qid, vid, d)
          }
        }
      }
      .toDF("query_id", "neighbor_id", "_ad")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= shortlistK)
    if (rerank <= 0) adcTop.select("query_id", "neighbor_id", "rnk")
    else {
      // refine: exact squared L2 on the shortlist only — fetch the
      // shortlist's raw vectors with one broadcast join into the table
      // scan, never a per-query re-scan
      val qB = spark.sparkContext.broadcast(queries.toMap)
      val short = adcTop.select(col("query_id"),
        col("neighbor_id").as("_id"))
      val wx = Window.partitionBy(col("query_id"))
        .orderBy(col("_xd").asc, col("neighbor_id"))
      e.join(broadcast(short), Seq("_id"))
        .select(col("query_id"), col("_id"), col("_v"))
        .as[(Long, Long, Array[Double])]
        .mapPartitions { it =>
          val qs = qB.value
          it.map { case (qid, vid, v) =>
            val qv = qs(qid)
            var d = 0.0
            var j = 0
            while (j < v.length) { val t = qv(j) - v(j); d += t * t; j += 1 }
            (qid, vid, d)
          }
        }
        .toDF("query_id", "neighbor_id", "_xd")
        .withColumn("rnk", row_number().over(wx).cast("long"))
        .where(col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk")
    }
  }

  /** One L2 Lloyd pass over every subspace at once: a single narrow scan
    * accumulates per-(subspace, code) partial sums; the shuffle carries
    * only those tiny partials, and the driver reduce is
    * O(numSub · 2^bits · subDim). Empty sub-clusters keep their previous
    * centroid (the codebook never shrinks).
    */
  private def pqLloydStep(
      e: DataFrame,
      books: Array[Array[Array[Double]]],
      subDim: Int): Array[Array[Array[Double]]] = {
    val spark = e.sparkSession
    import spark.implicits._
    val booksB = spark.sparkContext.broadcast(books)
    val parts = e.select(col("_v")).as[Array[Double]]
      .mapPartitions { it =>
        val bs = booksB.value
        val sums = scala.collection.mutable.HashMap
          .empty[(Int, Int), (Array[Double], Long)]
        it.foreach { v =>
          var s = 0
          while (s < bs.length) {
            val book = bs(s)
            val off = s * subDim
            var best = 0
            var bestD = Double.PositiveInfinity
            var c = 0
            while (c < book.length) {
              val cv = book(c)
              var d = 0.0
              var j = 0
              while (j < cv.length) { val t = v(off + j) - cv(j); d += t * t; j += 1 }
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            val key = (s, best)
            val (acc, n) = sums.getOrElseUpdate(key,
              (new Array[Double](subDim), 0L))
            var j = 0
            while (j < subDim) { acc(j) += v(off + j); j += 1 }
            sums(key) = (acc, n + 1)
            s += 1
          }
        }
        sums.iterator.map { case ((s, c), (acc, n)) => ((s, c), acc, n) }
      }
      .groupByKey(_._1)
      .reduceGroups { (a, b) =>
        val acc = a._2.clone()
        var j = 0
        while (j < acc.length) { acc(j) += b._2(j); j += 1 }
        (a._1, acc, a._3 + b._3)
      }
      .map(_._2)
      .collect()
    val next = books.map(_.clone())
    parts.foreach { case ((s, c), acc, n) =>
      next(s)(c) = acc.map(_ / n)
    }
    next
  }

  /** Deterministic random-hyperplane directions: plane `p`, dimension `j`
    * takes -1.0 or +1.0 from hex digit `j mod 32` of
    * md5("plane#p#{j/32}"). Reproducible in any engine with md5.
    */
  def planeDirections(nPlanes: Int, dims: Int): Seq[Seq[Double]] = {
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5")
        .digest(s.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    (0 until nPlanes).map { p =>
      val hex = (0 to (dims - 1) / 32).map(c => md5hex(s"plane#$p#$c")).mkString
      (0 until dims).map { j =>
        val d = Integer.parseInt(hex.substring(j, j + 1), 16)
        if (d < 8) -1.0 else 1.0
      }
    }
  }

  /** Sign-LSH bucket id (a string of nPlanes 0/1 chars) per vector.
    *
    * The per-vector kernel runs as a typed `mapPartitions` JVM loop
    * rather than Catalyst expressions: a dense ±-sum over 64 floats × 8
    * planes is pure numeric work where HOF expressions pay per-element
    * interpreted-lambda overhead and a fully unrolled expression tree
    * pays seconds of codegen compilation. The operator stays narrow (no
    * shuffle) and partition-parallel, so it scales with the table. The
    * accumulation order (ascending dimension, double accumulator) matches
    * the DuckDB oracle's list_dot_product.
    */
  def signBuckets(
      emb: DataFrame, id: String, vec: String,
      nPlanes: Int, dims: Int): DataFrame = {
    val dirs = planeDirections(nPlanes, dims).map(_.toArray).toArray
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col(id).cast("long"), col(vec))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.map { case (vid, v) =>
          val chars = new Array[Char](dirs.length)
          var p = 0
          while (p < dirs.length) {
            val dir = dirs(p)
            var acc = 0.0
            var j = 0
            while (j < dir.length) {
              val x = v(j).toDouble
              acc += (if (dir(j) < 0) -x else x)
              j += 1
            }
            chars(p) = if (acc > 0) '1' else '0'
            p += 1
          }
          (vid, new String(chars))
        }
      }
      .toDF("vec_id", "bucket")
  }
}
