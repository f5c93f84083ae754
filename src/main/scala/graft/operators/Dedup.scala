package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, all expressed as
  * shuffle-conscious DataFrame plans:
  *
  *  - exact: one hash-partitioned groupBy on a content fingerprint.
  *  - MinHash+LSH: shingle → k minhashes → banded signatures →
  *    per-band self-equi-join. The joins are hash joins on band
  *    signatures (never an all-pairs product), which is the property
  *    that survives a 100× scale-up.
  *  - n-gram Jaccard: exact verification on the LSH candidate pairs only.
  *  - SimHash: bit-majority signature via one groupBy over exploded
  *    tokens.
  *
  * Hash functions are md5-based so any engine (and the DuckDB oracle)
  * reproduces them byte-for-byte; a production deployment would swap in
  * xxhash64 for speed without changing plan shapes.
  */
object Dedup {

  /** Exact dedup: annotate each row with its duplicate group's canonical
    * id and size via a window over the content fingerprint.
    */
  def exact(df: DataFrame, text: Column, id: Column): DataFrame = {
    val w = Window.partitionBy(col("fp"))
    df.select(id.as("doc_id"), TextAnalysis.fingerprint(text).as("fp"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("dup_count", count(lit(1)).over(w))
      .select(col("doc_id"), col("canonical_id"), col("dup_count"),
        (col("doc_id") =!= col("canonical_id")).as("is_dup"))
  }

  /** EXACT train/eval decontamination — the strict companion of the
    * fuzzy shingle-overlap [[decontaminate]]: every (train, eval) pair
    * whose normalized content fingerprints match byte-for-byte. One
    * hash join on the fingerprint (shuffle keyed by fp, never all
    * pairs); duplicate-heavy fingerprints cost |train-dups|·|eval-dups|
    * per fp, which is the true output size.
    */
  def exactOverlap(
      df: DataFrame, text: Column, id: Column, isEval: Column): DataFrame = {
    val t = df.select(id.as("doc_id"),
      TextAnalysis.fingerprint(text).as("fp"), isEval.as("_e"))
    t.where(!col("_e")).select(col("doc_id").as("train_id"), col("fp"))
      .join(t.where(col("_e")).select(col("doc_id").as("eval_id"), col("fp")),
        "fp")
      .select("train_id", "eval_id")
  }

  /** Distinct word-3-gram shingles per document (docs with <3 words are
    * dropped — they have no 3-gram).
    */
  def shingles(df: DataFrame, text: Column, id: Column): DataFrame = {
    // fan the raw (id, text) rows out BEFORE tokenizing: the split +
    // 3-gram expression work is the expensive part, and a single-file
    // corpus would otherwise run it on one task (guide §2.5)
    val base = Fanout.spread(
      df.select(id.as("doc_id"), text.as("_t")), col("doc_id"))
    val w = TextAnalysis.words(col("_t"))
    base.select(col("doc_id"), w.as("_w"))
      .where(size(col("_w")) >= 3)
      .select(col("doc_id"), explode(
        array_distinct(transform(sequence(lit(0), size(col("_w")) - 3),
          i => concat_ws(" ", slice(col("_w"), i + 1, lit(3)))))).as("sh"))
  }

  /** Minhash prime modulus (< 2^30, so a·x stays under 2^60 — inside
    * int64 for DuckDB's overflow-checked arithmetic).
    */
  val MinhashP: Long = 999999937L

  /** Fixed affine coefficients (a_i, b_i) for the universal-hash minhash
    * family, derived deterministically from md5 so any engine can inline
    * them as literals.
    */
  def minhashCoefs(k: Int): Seq[(Long, Long)] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    (0 until k).map { i =>
      val a = java.lang.Long.parseLong(md5hex(s"minhash-a#$i").take(14), 16)
      val b = java.lang.Long.parseLong(md5hex(s"minhash-b#$i").take(14), 16)
      (a % (MinhashP - 1) + 1, b % MinhashP)
    }
  }

  /** Numeric base hash of a shingle: first 14 hex digits of md5 mod p.
    * Engine-portable: `CAST('0x'||substr(md5(x),1,14) AS BIGINT) % p`.
    */
  private def baseHash(c: Column): Column =
    pmod(conv(substring(md5(c), 1, 14), 16, 10).cast("long"), lit(MinhashP))

  /** Doc-id projection for the typed signature kernels: the kernel
    * surface addresses docs by NUMERIC id, so the id must cast to long
    * — loudly. A silent null would crash the encoder cryptically, and
    * numeric-STRING ids that collide after the cast ('007' vs '7')
    * would merge documents; corpora with non-numeric keys use the
    * expression pipelines, which keep the id column type-generic.
    */
  private def kernelId(id: Column): Column =
    coalesce(id.try_cast("long"),
      raise_error(concat(lit("signature kernels need long-castable doc " +
        "ids; got '"), id.cast("string"), lit("'"))).cast("long"))
      .as("_id")

  /** k minhashes per doc via the standard universal-hash construction
    * `h_i = (a_i·x + b_i) mod p` over ONE md5 per shingle (the MLlib
    * MinHashLSH scheme) — the per-i multiplies are permutations mod p, so
    * minima are independent-enough across i, unlike `a + i·b` whose
    * minima correlate and flood the bands with false positives. Banded
    * `bandSize` hashes per band; returns (doc_id, band_0..band_{k/bs-1}).
    */
  def minhashSignatures(sh: DataFrame, k: Int, bandSize: Int): DataFrame = {
    val withX = sh.select(col("doc_id"), baseHash(col("sh")).as("_x"))
    val hashes = minhashCoefs(k).zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("_x") + lit(b)) % lit(MinhashP)).as(s"h$i")
    }
    val mh = withX.groupBy("doc_id").agg(hashes.head, hashes.tail: _*)
    val bands = (0 until k / bandSize).map(b =>
      concat_ws("|",
        (0 until bandSize).map(j => col(s"h${b * bandSize + j}")): _*)
        .as(s"band_$b"))
    mh.select(col("doc_id") +: bands: _*)
  }

  /** Banded minhash signatures as a NARROW per-document kernel — the
    * zero-shuffle production path next to [[minhashSignatures]]'s
    * expression pipeline (same round-8 finding as the simhash kernel:
    * a per-document signature does not need the whole exploded shingle
    * stream shuffled through a groupBy just to regroup by document).
    * Token/shingle/hash semantics are bit-identical — `lower` →
    * `split("\\s+", -1)`, docs with < 3 words dropped, distinct word
    * 3-grams, first-14-hex-md5 base hash mod p, `(a·x + b) mod p`
    * minima, bandSize hashes joined with `|` — pinned by a DedupSpec
    * property against the expression pipeline, so the d02-family
    * DuckDB oracles state the same formula. Output:
    * `(doc_id, band_0..band_{k/bandSize-1})`.
    */
  def minhashBands(
      df: DataFrame, text: Column, id: Column,
      k: Int, bandSize: Int): DataFrame = {
    require(k % bandSize == 0, "bandSize must divide k")
    val coefs = minhashCoefs(k).toArray
    val p = MinhashP
    val spark = df.sparkSession
    import spark.implicits._
    val nBands = k / bandSize
    // measured (AbProbe d03/d11, min-of-5 interleaved): a Fanout.spread
    // here LOSES ~0.2-0.4 s — the one-MD5-per-shingle kernel is cheap
    // next to the exchange it would add, unlike the shingle-explode
    // pipelines where spread wins (see [[shingles]])
    df.select(kernelId(id), text.as("_t"))
      .where(col("_t").isNotNull) // expression paths drop null-text docs
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (did, t) =>
          val toks = TextAnalysis.tokenize(t)
          if (toks.length < 3) Iterator.empty
          else {
            val mins = Array.fill(coefs.length)(Long.MaxValue)
            val seen = new java.util.HashSet[String]()
            var i = 0
            while (i <= toks.length - 3) {
              val sh = s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}"
              if (seen.add(sh)) {
                md.reset()
                val dg = md.digest(
                  sh.getBytes(java.nio.charset.StandardCharsets.UTF_8))
                // first 14 hex digits = first 7 bytes, big-endian
                var x = 0L
                var bI = 0
                while (bI < 7) { x = (x << 8) | (dg(bI) & 0xffL); bI += 1 }
                x %= p
                var c = 0
                while (c < coefs.length) {
                  val (a, b) = coefs(c)
                  val h = (a * x + b) % p
                  if (h < mins(c)) mins(c) = h
                  c += 1
                }
              }
              i += 1
            }
            val bands = Array.tabulate(nBands)(bd =>
              (0 until bandSize).map(j => mins(bd * bandSize + j))
                .mkString("|"))
            Iterator.single(Row.fromSeq(did +: bands.toSeq))
          }
        }
      }(org.apache.spark.sql.Encoders.row(
        org.apache.spark.sql.types.StructType(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType) +:
            (0 until nBands).map(b => org.apache.spark.sql.types.StructField(
              s"band_$b", org.apache.spark.sql.types.StringType)))))
  }

  /** Default per-bucket cap for [[bucketPairs]]. A bucket of size s emits
    * s·(s-1)/2 pairs, so the candidate count is Σ_buckets s² — bounded by
    * cap·Σ s = cap·N·nBands once each bucket is clipped to `cap` ids.
    * Pathological buckets (mass near-duplicate floods) should be
    * exact-deduped first; the cap is the backstop that keeps the plan
    * linear when they are not.
    */
  val DefaultBucketCap: Int = 1024

  /** Bucket-grouped candidate-pair emit — the one shape every LSH-style
    * blocker here shares. Input: (bidx, bval, id) rows, one per
    * (band, element). ONE shuffle groups each bucket, ids sort, each
    * bucket is clipped to `cap` smallest ids (Σ bucket² → ≤ cap·N·nBands
    * pairs), and pairs emit bucket-locally before a distinct. The
    * upstream signature pipeline executes exactly once — a self-join
    * would run it once per side AND shuffle both sides.
    *
    * Clipped volume is observable without a second job via the Spark
    * `observe` metric `observeName` (dropped_ids, max_bucket) when a
    * name is given.
    */
  def bucketPairs(
      unpivoted: DataFrame, cap: Int = DefaultBucketCap,
      observeName: String = ""): DataFrame =
    bucketPairsCore(unpivoted, cap, grouped =>
      if (observeName.isEmpty) grouped
      else grouped.observe(observeName,
        capMetrics(cap).head, capMetrics(cap).tail: _*))(spreadEmit = false)

  /** [[bucketPairs]] with a blocking-readable [[Observation]]: after the
    * first action on the result, `observation.get` yields
    * `dropped_ids` (ids clipped by the cap) and `max_bucket` (largest
    * bucket seen) — the production knob for "did the cap actually bite,
    * and how hot is the hottest bucket".
    */
  def bucketPairsObserved(
      unpivoted: DataFrame, cap: Int,
      observation: org.apache.spark.sql.Observation): DataFrame =
    bucketPairsCore(unpivoted, cap,
      _.observe(observation, capMetrics(cap).head, capMetrics(cap).tail: _*))(
      spreadEmit = false)

  private def capMetrics(cap: Int): Seq[Column] = Seq(
    sum(greatest(size(col("ids")) - cap, lit(0))).as("dropped_ids"),
    max(size(col("ids"))).as("max_bucket"))

  private def bucketPairsCore(
      unpivoted: DataFrame, cap: Int,
      attach: DataFrame => DataFrame)(spreadEmit: Boolean): DataFrame =
    rawBucketPairs(unpivoted, cap, attach, spreadEmit).distinct()

  /** Pair emit WITHOUT the final distinct — for callers that shrink the
    * rows first (verify + project) so the dedup shuffle moves less.
    *
    * `spreadEmit` is a CALLER-KNOWN structural property, not a tuning
    * knob: the pair emit amplifies each bucket row ×|bucket|²/2 AFTER
    * the groupBy exchange — whose shuffle bytes are tiny (one row per
    * bucket), so AQE's coalescing collapses it to ONE partition and the
    * whole quadratic emit runs serially (measured: d06's 2.0 s
    * single-task stage at sf0.1). Pass true when the band-value domain
    * is SMALL relative to the corpus (simhash's 16-bit substrings →
    * occupancy scales with N/2^bandBits → big lists), so the grouped
    * frame must fan back out before exploding. Pass false when band
    * values are full-width hashes (minhash, 8-bit-scaled sign-LSH):
    * buckets only form on genuine near-collisions, the emit is cheap,
    * and the extra exchange is pure latency (measured: d02 0.73 → 1.20 s
    * min-of-5 interleaved with the spread forced on). At scale the
    * guard no-ops either way.
    */
  private def rawBucketPairs(
      unpivoted: DataFrame, cap: Int,
      attach: DataFrame => DataFrame, spreadEmit: Boolean): DataFrame = {
    val bucketed = unpivoted.groupBy("bidx", "bval")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")) > 1)
    // NOTE the xxhash64 spread key: a repartition on (bidx, bval)
    // itself would satisfy the groupBy's existing hash partitioning and
    // be ELIDED as redundant, handing the stage back to AQE coalescing
    val grouped =
      if (spreadEmit) Fanout.spread(bucketed, xxhash64(col("bidx"), col("bval")))
      else bucketed
    attach(grouped)
      .withColumn("ids", slice(col("ids"), 1, cap))
      .select(explode(flatten(
        transform(sequence(lit(0), size(col("ids")) - 2), i =>
          transform(slice(col("ids"), i + 2, size(col("ids"))),
            y => struct(element_at(col("ids"), i + 1).as("id_a"),
              y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
  }

  /** LSH candidate pairs: docs sharing at least one band signature.
    * Bands unpivot to (band_idx, band_val) rows and route through
    * [[bucketPairs]] (one shuffle, bucket-grouped sorted-id pair emit,
    * per-bucket cap).
    */
  def lshCandidates(
      sig: DataFrame, nBands: Int,
      cap: Int = DefaultBucketCap): DataFrame = {
    val unpivoted = sig.select(col("doc_id"), posexplode(
      array((0 until nBands).map(b => col(s"band_$b")): _*)))
      .toDF("id", "bidx", "bval")
    bucketPairs(unpivoted, cap, "d02_minhash_bucket_cap")
      .toDF("doc_a", "doc_b")
  }

  /** Connected components over an undirected near-duplicate pair graph
    * — the clustering step production dedup runs AFTER pair generation
    * (keep ONE doc per component, drop the rest; pairwise drops
    * over-delete when clusters overlap). Every vertex maps to the
    * smallest doc id reachable from it: `(doc_id, component_id)`.
    *
    * Spark-first shape, two-phase:
    *
    *  1. '''min-label propagation''' for up to `propagationRounds`
    *     rounds — one shuffle join (current labels into the edge list)
    *     + one min-aggregate per round, converging in diameter rounds.
    *     The per-round driver action is a single (count, sum) aggregate
    *     over the new labels: labels only ever DECREASE (min of a set
    *     containing the old label), so an unchanged label sum over the
    *     fixed vertex set ⟺ a fixpoint — no join-against-previous
    *     convergence pass. This phase is the right shape for the
    *     shallow clusters LSH emits (diameter ≤ a handful).
    *  2. if propagation has not converged, the residual graph is
    *     CONTRACTED by current labels (|labels| ≤ |vertices| and
    *     shrinking) and handed to
    *     [[connectedComponentsContraction]] — large-star/small-star in
    *     O(log n) rounds finishes any adversarially deep chain instead
    *     of burning diameter rounds (or, as before round 8, throwing).
    *     Propagation labels are ids within their own component and the
    *     component's min id always keeps itself as label, so the
    *     contracted graph's min-rooted stars compose exactly:
    *     final(v) = root(label(v)).
    *
    * Per-round storage is bounded to two label copies (the
    * GraphX-Pregel pattern) and lineage is cut with `localCheckpoint`s,
    * so the plan never nests with round count. Checkpoints are LAZY
    * wherever the convergence action materializes them anyway (one
    * driver-visible job instead of two — d11's wall time is dominated
    * by sequential-action count, not data volume, at bench scale), and
    * retired frames are released via [[Blocks.free]] (checkpoint
    * blocks are invisible to `Dataset.unpersist`).
    */
  def connectedComponents(
      pairs: DataFrame, a: String, b: String,
      maxIter: Int = 64, propagationRounds: Int = 4): DataFrame = {
    val e0 = pairs.select(
      col(a).cast("long").as("src"), col(b).cast("long").as("dst"))
    val edges = e0.unionAll(
        e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    val checkpointInterval = 4
    // Round 1 needs no join: propagating IDENTITY labels along edges is
    // the edge list itself, so labels₁ = min(self, min neighbor) in one
    // aggregate over the symmetrized edges. (With propagationRounds = 0
    // the caller asked for pure contraction — identity labels then.)
    var labels = (
      if (propagationRounds == 0)
        edges.select(col("src").as("id"), col("src").as("component_id"))
          .distinct()
      else
        edges.select(col("dst").as("id"), col("src").as("component_id"))
          .unionAll(edges.select(col("src").as("id"),
            col("src").as("component_id")))
          .groupBy("id").agg(min("component_id").as("component_id"))
      // lazy: the labelSum action right below materializes it
      ).localCheckpoint(false)
    // (vertex count, label sum) — sum as decimal so arbitrary long ids
    // cannot overflow the convergence accumulator
    def labelSum(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(col("component_id").cast("decimal(38,0)"))).collect()(0)
      (r.getLong(0), r.getDecimal(1))
    }
    var (nVerts, prevSum) = labelSum(labels)
    var converged = nVerts == 0L
    var i = math.min(1, propagationRounds)
    while (!converged && i < propagationRounds) {
      val prop = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("component_id"))
      val agg = labels.unionAll(prop)
        .groupBy("id").agg(min("component_id").as("component_id"))
      val next =
        if (i % checkpointInterval == checkpointInterval - 1)
          agg.localCheckpoint(false) // labelSum below materializes
        else agg.persist()
      val (_, nextSum) = labelSum(next) // materializes `next`
      Blocks.free(labels)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      i += 1
    }
    if (converged) {
      edges.unpersist()
      labels.select(col("id").as("doc_id"), col("component_id"))
    } else {
      // degrade: contract the graph by the partially-propagated labels
      // (every vertex within `propagationRounds` hops of its component
      // min already collapsed) and finish in O(log n) contraction
      // rounds. Checkpoint the contracted edge list eagerly so the big
      // edge cache can be dropped before the contraction loop runs.
      val byLabel = edges
        .join(labels.withColumnRenamed("id", "src")
          .withColumnRenamed("component_id", "_ls"), Seq("src"))
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("component_id", "_ld"), Seq("dst"))
        .where(col("_ls") =!= col("_ld"))
        .select(col("_ls"), col("_ld"))
        .distinct()
        .localCheckpoint(true)
      edges.unpersist()
      // checkpointResult: roots materialize inside the call and the
      // contraction's internal frames are released there, so after the
      // cheap labels⋈roots below, everything but the returned frame
      // can be freed deterministically
      val roots = connectedComponentsContraction(
        byLabel, "_ls", "_ld", maxIter, checkpointResult = true)
      val out = labels
        .join(roots.select(col("doc_id").as("component_id"),
          col("component_id").as("_root")), Seq("component_id"), "left")
        .select(col("id").as("doc_id"),
          coalesce(col("_root"), col("component_id")).as("component_id"))
        .localCheckpoint(true)
      Blocks.free(labels)
      Blocks.free(roots)
      Blocks.free(byLabel)
      out
    }
  }

  /** Connected components by alternating large-star/small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SOCC 2014) — O(log n) rounds regardless of graph
    * diameter, the scale path a 100-TB corpus with one viral
    * boilerplate chain needs. Output: `(doc_id, component_id)` with
    * `component_id` = the smallest id in the component, identical to
    * [[connectedComponents]].
    *
    * Each round is two edge-set rewrites over the same join/min-agg
    * primitives as label propagation:
    *
    *  - '''large-star''': per vertex u, connect every strictly-larger
    *    neighbor to `m = min(Γ(u) ∪ u)` — one groupBy-min over the
    *    symmetrized edges + one join back;
    *  - '''small-star''': orient edges larger→smaller; per vertex u,
    *    connect every smaller neighbor AND u itself to `m = min(Γ⁻(u))`
    *    — same shape.
    *
    * Both preserve connectivity and keep edges oriented larger→smaller,
    * so the fixpoint is a star forest whose centers are component
    * minima. Convergence is detected STRUCTURALLY (deterministic, no
    * hash-of-edge-set comparison): the edge set is a star forest iff no
    * edge's target is another edge's source (no chains) and every
    * source carries exactly one target (no leaf in two stars) — both
    * operators are no-ops exactly there, and both checks ride ONE
    * driver action. Per-round storage is one checkpointed edge set,
    * released deterministically as the round retires; the driver never
    * collects vertices. With `checkpointResult = true` the returned
    * frame is materialized and self-contained, and every internal
    * block is released before returning (the long-running-ingest
    * posture [[connectedComponents]]' degrade path uses).
    */
  def connectedComponentsContraction(
      pairs: DataFrame, a: String, b: String,
      maxIter: Int = 64, checkpointResult: Boolean = false): DataFrame = {
    val e0 = pairs.select(
      col(a).cast("long").as("src"), col(b).cast("long").as("dst"))
    // EVERY input vertex gets a label — including one whose only pair
    // is a self-loop, which the edge canonicalization below drops
    val vertices = e0.select(col("src").as("doc_id"))
      .unionAll(e0.select(col("dst").as("doc_id")))
      .distinct()
      .localCheckpoint(true)
    var edges = e0
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      // lazy: the first isStarForest action materializes it
      .localCheckpoint(false)
    // ONE driver action per round, not two: chains (an edge target
    // that is also a source) and double-starred sources checked via a
    // union — halves the convergence-check job count, and job count is
    // what sequential iterative queries pay scheduler noise on
    def isStarForest(e: DataFrame): Boolean =
      e.alias("x").join(e.alias("y"),
          col("x.dst") === col("y.src"), "left_semi")
        .select(lit(1L).as("_w"))
        .unionAll(e.groupBy("src").agg(count(lit(1)).as("n"))
          .where(col("n") > 1).select(lit(1L).as("_w")))
        .isEmpty
    var converged = isStarForest(edges)
    var i = 0
    while (!converged && i < maxIter) {
      // large-star: m = min over the full neighborhood (incl. self)
      val sym = edges.unionAll(
        edges.select(col("dst").as("src"), col("src").as("dst")))
      val minsL = sym.groupBy("src")
        .agg(min(col("dst")).as("_mn"))
        .select(col("src"), least(col("_mn"), col("src")).as("_m"))
      val large = sym.join(minsL, Seq("src"))
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), col("_m").as("dst"))
        .distinct()
      // small-star on the larger→smaller orientation (`large` already
      // emits (v, m) with v > m): every smaller neighbor and u itself
      // re-point at u's min neighbor
      val minsS = large.groupBy("src").agg(min(col("dst")).as("_m"))
      val small = large.join(minsS, Seq("src"))
        .select(col("dst").as("src"), col("_m").as("dst"))
        .where(col("src") =!= col("dst"))
        .unionAll(minsS.select(col("src"), col("_m").as("dst")))
        .distinct()
        // lazy: the isStarForest action right below materializes it
        .localCheckpoint(false)
      val prev = edges
      edges = small
      converged = isStarForest(edges) // materializes `small`
      Blocks.free(prev)
      i += 1
    }
    require(converged,
      s"star contraction did not converge in $maxIter rounds — " +
        "this exceeds the O(log n) bound on any real input; " +
        "raise maxIter only after checking the input for corruption")
    // star leaves point at their center (= component min); centers and
    // self-loop-only vertices fall back to themselves via the min over
    // the full vertex set (center ≤ every leaf, so min picks it)
    val result = edges
      .select(col("src").as("doc_id"), col("dst").as("component_id"))
      .unionAll(vertices.select(col("doc_id"), col("doc_id")))
      .groupBy("doc_id").agg(min("component_id").as("component_id"))
    // checkpointResult = true hands the caller a self-contained frame
    // and releases the internal edge/vertex blocks NOW instead of at
    // some future GC — the long-running-ingest posture
    if (checkpointResult) {
      val r = result.localCheckpoint(true)
      Blocks.free(edges)
      Blocks.free(vertices)
      r
    } else result
  }

  /** The KEEP-ONE verdict — the step every dedup pipeline actually ends
    * on: given the corpus and a `(doc_id, component_id)` clustering
    * (from [[connectedComponents]]), keep each cluster's canonical
    * document and every unclustered document, drop the rest. Pairwise
    * drop lists over-delete when clusters overlap; keying the verdict
    * on components is what makes the deletion set exactly
    * `|clustered| - |clusters|` (over clusters with a live member).
    *
    * The canonical is ELECTED: the minimum doc id among the cluster's
    * members PRESENT IN `df`. On a corpus that contains every clustered
    * doc this is exactly `component_id` (the component label is the min
    * member id), but when the clustering is a PERSISTED index
    * ([[graft.sources.CcIndex]]) the corpus can have moved on — a
    * deleted canonical must not silently drop its whole cluster, the
    * next-smallest live member takes over. Election costs one
    * aggregate over the CLUSTERED docs only (a small fraction of the
    * corpus) and the canon frame joins back broadcast-sized.
    * Output: `(doc_id, component_id NULL for unclustered, is_canonical)`
    * — survivors only.
    */
  def keepCanonical(
      df: DataFrame, id: Column, components: DataFrame): DataFrame = {
    val labeled = df.select(id.as("doc_id"))
      .join(components, Seq("doc_id"), "left")
    val canon = labeled.where(col("component_id").isNotNull)
      .groupBy("component_id").agg(min("doc_id").as("_canon"))
    labeled.join(canon, Seq("component_id"), "left")
      .where(col("component_id").isNull || col("doc_id") === col("_canon"))
      .select(col("doc_id"), col("component_id"),
        (col("component_id").isNotNull).as("is_canonical"))
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs, computed
    * by joining the pairs against the shingle sets (shuffles scale with
    * |candidates|·avg-shingles, not |docs|²).
    *
    * Plan-shape note (measured round 10): this is deliberately the
    * intersection-join + two size-joins layout, NOT
    * [[containmentPairs]]' single side-tagged verify join. The one-join
    * shape re-derives the shingle frame once instead of three times and
    * measured 2× faster for containment's large capped candidate sets —
    * but 60% SLOWER here (QueryProbe d03 min-of-8: 0.96 s vs 1.55 s at
    * sf0.1), where LSH hands over a few dozen pairs and the dominant
    * cost is the two cheap broadcast joins vs an extra wide two-level
    * hash aggregation over (pair, shingle) keys. Pick the verify shape
    * by candidate volume, not uniformity.
    */
  def ngramJaccard(cands: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cands
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .where(col("sh") === col("sh_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    cands
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
  }

  /** SimHash per-token ±1 contribution for bit `b`, as SQL that evaluates
    * identically in Spark and DuckDB over precomputed 32-bit hash words
    * `h0, h1, ...` (word w = hex digits [8w, 8w+8) of the token md5, so
    * each word is < 2^32 — inside DuckDB's overflow-checked int64). Bit b
    * is MSB-first within its word: `(h{b/32} >> (31 - b%32)) & 1` —
    * integer shift/mask per bit instead of per-bit string indexing, which
    * at 64 bits × every token is the difference between an integer-ALU
    * aggregation and a string-op one (measured 3.1s → integer ops cut the
    * token-side cost; the md5 and word conversion happen once per token).
    */
  def simhashTermSql(b: Int): String = {
    val w = b / 32
    val shift = 31 - (b % 32)
    s"(((h$w >> $shift) & 1) * 2 - 1)"
  }

  /** `bits`-bit SimHash (bits ≤ 128, 4 | bits) from the first bits/4 md5
    * hex digits of each distinct token: per bit, majority vote of ±1
    * contributions.
    *
    * SimHash is embarrassingly PER-DOCUMENT, so this runs as a narrow
    * typed kernel — tokenize, md5, bit-count inside one JVM loop per
    * row — with ZERO shuffle. The pre-round-8 shape (explode every
    * token + a 64-column groupBy aggregation) shuffled the whole
    * exploded token stream just to bring each document's tokens back
    * together; at corpus scale that shuffle IS the operator's cost,
    * and it buys nothing (the signature kernel is the same
    * interpreted-HOF-vs-JVM-loop finding as [[Similarity.signBuckets]]).
    * Token semantics are bit-identical to the expression pipeline
    * (`lower` → `split("\\s+", -1)` keeping empty trailing tokens →
    * first-occurrence distinct → md5 over UTF-8 bytes; a DedupSpec
    * property pins kernel ≡ expression on randomized unicode), so the
    * d04/d06 DuckDB oracles are unchanged.
    */
  def simhashBits(df: DataFrame, text: Column, id: Column, bits: Int): DataFrame = {
    require(bits > 0 && bits <= 128 && bits % 4 == 0, s"bad simhash width $bits")
    val spark = df.sparkSession
    import spark.implicits._
    // no Fanout.spread: measured a net loss here, same as minhashBands
    df.select(kernelId(id), text.as("_t"))
      .where(col("_t").isNotNull) // expression paths drop null-text docs
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (did, t) =>
          val toks = TextAnalysis.tokenize(t).distinct
          val counts = new Array[Int](bits)
          var i = 0
          while (i < toks.length) {
            md.reset()
            val dg = md.digest(
              toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
            // bit b reads MSB-first bit (b%32) of 32-bit md5 word b/32
            // = bit (7 - b%8) of digest byte 4*(b/32) + (b%32)/8
            var b = 0
            while (b < bits) {
              val j = b % 32
              val v = (dg(4 * (b / 32) + j / 8) >> (7 - j % 8)) & 1
              counts(b) += 2 * v - 1
              b += 1
            }
            i += 1
          }
          val chars = new Array[Char](bits)
          var b = 0
          while (b < bits) {
            chars(b) = if (counts(b) > 0) '1' else '0'
            b += 1
          }
          (did, new String(chars))
        }
      }.toDF("doc_id", "simhash")
  }

  /** 16-bit SimHash (kept for the compact signature surface; the
    * near-pair blocker uses 64 bits via [[simhashBits]]).
    */
  def simhash16(df: DataFrame, text: Column, id: Column): DataFrame =
    simhashBits(df, text, id, 16)

  /** Simhash near-duplicate pairs from a precomputed `sig(doc_id,
    * simhash)` frame: band blocking + exact Hamming verify.
    *
    * The signature splits into `nBands` equal bands and docs sharing ANY
    * band become candidates — by pigeonhole this is *complete* for
    * Hamming distance ≤ nBands - 1 (a distance-d pair differs in at most
    * d bands, so with d < nBands at least one band matches exactly), so
    * 4 bands give recall 1.0 for the dist ≤ 3 predicate. The signature
    * string rides through the bucket shuffle as the pair payload, so the
    * simhash aggregation runs exactly once and no join back to `sig` (an
    * aggregation subtree Catalyst would recompute per side) is needed.
    * Per-bucket caps bound pathological floods exactly as in
    * [[bucketPairs]].
    *
    * Requires [[graft.functions.HammingDistance]] registered for the
    * codegen'd verify. Output: (doc_a, doc_b, dist), dist ≤ maxDist.
    */
  def simhashNearPairsFromSig(
      sig: DataFrame, bits: Int, nBands: Int, maxDist: Int,
      cap: Int = DefaultBucketCap): DataFrame = {
    require(bits % nBands == 0, "nBands must divide bits")
    require(maxDist < nBands,
      s"band blocking is only complete for dist < nBands (got $maxDist >= $nBands)")
    val bandBits = bits / nBands
    val unpivoted = sig.select(
        struct(col("doc_id"), col("simhash")).as("id"), posexplode(
          array((0 until nBands).map(b =>
            substring(col("simhash"), b * bandBits + 1, bandBits)): _*)))
      .toDF("id", "bidx", "bval")
    // Hamming verify BEFORE the pair distinct: the codegen'd distance is
    // cheap per emit (≤ nBands emits per pair), and dropping the
    // signature payloads first means the distinct shuffles ~30-byte
    // (id, id, dist) rows instead of ~2·bits of signature per row.
    rawBucketPairs(unpivoted, cap, grouped =>
        grouped.observe("d06_band_cap",
          capMetrics(cap).head, capMetrics(cap).tail: _*),
        spreadEmit = true) // 16-bit band domain → big buckets, heavy emit
      .select(col("id_a.doc_id").as("doc_a"), col("id_b.doc_id").as("doc_b"),
        expr("hamming(id_a.simhash, id_b.simhash)").cast("long").as("dist"))
      .where(col("dist") <= maxDist)
      .distinct()
  }

  /** Train/eval decontamination — the benchmark-leak check every
    * training-data pipeline runs before a corpus ships: find
    * (train doc, eval doc) pairs sharing at least `minShared` distinct
    * word-3-gram shingles, ignoring boilerplate shingles present in more
    * than `maxDf` documents (common n-grams are noise, not contamination
    * signal — and they are exactly the hot keys that would skew the
    * shingle shuffle at scale).
    *
    * Plan shape: ONE shuffle groups each shingle's (eval ids, train ids)
    * lists — the shingle pipeline runs once, the df-guard is a size
    * filter on the grouped lists (no second aggregation), and pair emit
    * is bucket-local and bounded by maxDf² per shingle — then one hash
    * aggregation counts shared shingles per pair. Never an all-pairs
    * product; cost scales with Σ |eval∩bucket|·|train∩bucket|.
    *
    * Output: (train_id, eval_id, n_shared), n_shared >= minShared.
    */
  def decontaminate(
      df: DataFrame, text: Column, id: Column, isEval: Column,
      minShared: Int, maxDf: Int): DataFrame = {
    val base = Fanout.spread(
      df.select(id.as("doc_id"), isEval.as("is_eval"), text.as("_t")),
      col("doc_id"))
    val w = TextAnalysis.words(col("_t"))
    val sh = base
      .select(col("doc_id"), col("is_eval"), w.as("_w"))
      .where(size(col("_w")) >= 3)
      .select(col("doc_id"), col("is_eval"), explode(
        array_distinct(transform(sequence(lit(0), size(col("_w")) - 3),
          i => concat_ws(" ", slice(col("_w"), i + 1, lit(3)))))).as("sh"))
    // no emit-spread here (cf. [[rawBucketPairs]]): the df guard caps
    // every bucket at maxDf ids, so the tr×ev emit is bounded and an
    // extra exchange is pure latency (measured neutral-min, worse-median
    // with the spread forced on, AbProbe d08 min-of-5 interleaved)
    sh.groupBy("sh")
      .agg(
        sort_array(collect_list(when(col("is_eval"), col("doc_id"))))
          .as("ev"),
        sort_array(collect_list(when(!col("is_eval"), col("doc_id"))))
          .as("tr"))
      .where(size(col("ev")) > 0 && size(col("tr")) > 0 &&
        size(col("ev")) + size(col("tr")) <= maxDf)
      .select(explode(flatten(transform(col("tr"), t =>
        transform(col("ev"), e =>
          struct(t.as("train_id"), e.as("eval_id")))))).as("p"))
      .groupBy(col("p.train_id").as("train_id"), col("p.eval_id").as("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Asymmetric shingle-containment pairs — the quote/subset detector
    * symmetric Jaccard (and therefore MinHash LSH, which estimates
    * Jaccard) structurally misses: a short document fully quoted inside
    * a long one has containment C(a⊂b) = |A∩B|/|A| = 1.0 but Jaccard
    * |A∩B|/|A∪B| ≈ |A|/|B| → 0, so it never survives a Jaccard gate.
    * Training pipelines run this to catch excerpt/quotation duplicates
    * and partial crawls of the same page.
    *
    * Blocking CANNOT come from minhash bands (they approximate the very
    * measure that is ~0 here), so candidates come from raw shingle
    * collisions with a document-frequency guard — [[decontaminate]]'s
    * plan shape on a single corpus: ONE shuffle groups each shingle's
    * doc list, buckets past `maxDf` docs are dropped whole (common
    * n-grams are noise and exactly the would-be skew keys), pair emit is
    * bucket-local (bounded by maxDf² per shingle), and one hash
    * aggregation keeps pairs sharing >= `minShared` guarded shingles.
    * Exact intersection and sizes then come from the FULL shingle sets
    * in ONE |candidates|-scaled join: candidates explode to (pair, doc)
    * rows, one hash join against the shingle frame tags each shingle
    * with its side, and a two-level aggregate yields |A|, |B|, and
    * |A∩B| together — so the whole operator re-derives the (narrow,
    * un-shuffled) shingle frame exactly twice: once for blocking, once
    * for verification. The naive shape (separate intersection join +
    * two size joins, the [[ngramJaccard]] layout) re-derives it four
    * times and measured 2× slower at sf0.1. The emitted containments
    * are exact even where the df guard blinded the blocker.
    *
    * Output: (doc_a, doc_b, n_inter, n_a, n_b, cont_a, cont_b) with
    * doc_a < doc_b and max(cont_a, cont_b) >= `minContainment`;
    * cont_a = n_inter/n_a is the "a is contained in b" direction.
    */
  def containmentPairs(
      df: DataFrame, text: Column, id: Column,
      minShared: Int, maxDf: Int, minContainment: Double): DataFrame = {
    // The shingle frame is deliberately derived TWICE (blocking +
    // verify), not checkpointed once: an in-session A/B (min-of-8 at
    // sf0.1, the d03 methodology) measured checkpoint-once at 3.34 s
    // vs 3.44 s derived-twice — inside this box's ~0.4 s noise floor —
    // while the checkpoint's blocks outlive the call (the caller holds
    // only the result frame, so the blocks leak until GC, the exact
    // round-10 `Blocks` hazard). No measurable win, a real leak: keep
    // the stateless shape. (Spread also statistically unchanged:
    // 0.84 vs 1.06.)
    val sh = shingles(df, text, id)
    // shingles are distinct per doc, so the bucket list's size IS the
    // shingle's document frequency; i<j within the sorted list emits
    // each pair once with doc_a < doc_b
    // fan the grouped buckets back out before the quadratic emit —
    // the AQE-coalescing hazard of [[rawBucketPairs]]; guarded no-op
    // at scale
    val cands = Fanout.spread(
      sh.groupBy("sh")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .where(size(col("ids")).between(2, maxDf)),
      xxhash64(col("sh"))) // not `sh` — see rawBucketPairs' elision note
      .select(explode(flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))), b =>
          struct(a.as("doc_a"), b.as("doc_b")))))).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .select("doc_a", "doc_b")
    containmentVerify(cands, sh, minContainment)
  }

  /** The exact-containment verify stage of [[containmentPairs]], shared
    * with the incremental index refresh
    * ([[graft.sources.ContainIndex]]): ONE |candidates|-scaled join —
    * each pair contributes its two docs, every (pair, shingle) group
    * records which sides carry it, and the per-pair rollup counts |A|,
    * |B|, |A∩B| in the same aggregation. Exact regardless of how the
    * candidates were blocked.
    */
  def containmentVerify(
      cands: DataFrame, sh: DataFrame, minContainment: Double): DataFrame = {
    val pairDocs = cands
      .select(struct(col("doc_a"), col("doc_b")).as("_p"))
      .select(col("_p"), explode(array(col("_p.doc_a"), col("_p.doc_b")))
        .as("doc_id"))
      .withColumn("_isA", col("doc_id") === col("_p.doc_a"))
    pairDocs.join(sh, Seq("doc_id"))
      .groupBy(col("_p"), col("sh"))
      .agg(max(when(col("_isA"), 1L).otherwise(0L)).as("_a"),
        max(when(!col("_isA"), 1L).otherwise(0L)).as("_b"))
      .groupBy("_p")
      .agg(sum("_a").as("n_a"), sum("_b").as("n_b"),
        sum(col("_a") * col("_b")).as("n_inter"))
      .select(col("_p.doc_a").as("doc_a"), col("_p.doc_b").as("doc_b"),
        col("n_inter"), col("n_a"), col("n_b"),
        (col("n_inter").cast("double") / col("n_a")).as("cont_a"),
        (col("n_inter").cast("double") / col("n_b")).as("cont_b"))
      .where(greatest(col("cont_a"), col("cont_b")) >= minContainment)
  }

  /** Embedding near-duplicate pairs blocked on BANDED sign-LSH buckets —
    * the production-scale variant of [[embeddingNearDups]]. An
    * AND-over-all-planes block is too strict for moderate similarity, so
    * the planes split into bands (OR-construction, same shape as minhash
    * LSH): vectors colliding in ANY band become candidates, and exact
    * cosine verifies them. Bucketing is a narrow map
    * ([[Similarity.signBuckets]]) that runs EXACTLY once — candidates
    * come from the bucket-grouped pair emit of [[bucketPairs]] (one
    * shuffle, per-bucket cap), not a bands self-join that would
    * recompute the bucketing kernel per side. Band width must scale with
    * the corpus: expected bucket occupancy is N/2^bandSize per band, so
    * candidates ≈ nBands·N²/2^bandSize — pick bandSize ≈ log₂N (8 bits →
    * 256 buckets/band holds the expansion linear-ish at test scale; a
    * 100-TB corpus sizes up to 16-24 bits), and the cap clips what the
    * geometry misses. Cosine runs only on surviving candidates via two
    * hash joins back to the (narrow, cheap-to-rescan) vector projection.
    */
  def embeddingNearDupsLsh(
      emb: DataFrame, id: String, vec: String,
      nPlanes: Int, bandSize: Int, dims: Int, threshold: Double,
      cap: Int = DefaultBucketCap): DataFrame = {
    require(nPlanes % bandSize == 0, "nPlanes must be a multiple of bandSize")
    val nBands = nPlanes / bandSize
    val buckets = Similarity.signBuckets(emb, id, vec, nPlanes, dims)
    val bands = buckets.select(col("vec_id"), posexplode(
        array((0 until nBands).map(b =>
          substring(col("bucket"), b * bandSize + 1, bandSize)): _*)))
      .toDF("id", "bidx", "bval")
    val cands = bucketPairs(bands, cap, "d07_bucket_cap")
      .toDF("vec_a", "vec_b")
    val vd = Similarity.asDouble(col(vec))
    val e = emb.select(col(id).cast("long").as("_id"), vd.as("_v"))
      .withColumn("_n", Similarity.l2norm(col("_v")))
    Similarity.cosineFilterPairs(
      cands
        .join(e.select(col("_id").as("vec_a"), col("_v").as("_va"),
          col("_n").as("_na")), Seq("vec_a"))
        .join(e.select(col("_id").as("vec_b"), col("_v").as("_vb"),
          col("_n").as("_nb")), Seq("vec_b")),
      threshold)
  }

  /** LINE-level deduplication — the C4/MassiveText cleanup: drop every
    * line whose normalized form (trim + lowercase) appears in MORE than
    * `maxDf` distinct documents (boilerplate: navigation chrome, cookie
    * banners, license headers), and reassemble each document's
    * surviving lines in their original order. Empty lines never count
    * against the threshold and are preserved.
    *
    * Output: `(doc_id, clean_text, n_kept, n_dropped)`.
    *
    * Scale shape: one `posexplode` (narrow), one hash aggregation over
    * distinct normalized lines for the document-frequency table, one
    * shuffle join back on the line hash (cost scales with total LINES,
    * never docs²), and an order-preserving reassembly via
    * `array_sort(collect_list(struct(pos, line)))` — the per-doc group
    * is bounded by document size. The df join keys on `xxhash64` of the
    * normalized line, so shuffled rows carry an 8-byte key instead of
    * the line text.
    */
  def lineDedup(
      df: DataFrame, text: Column, id: Column, maxDf: Int): DataFrame = {
    require(maxDf >= 1, "maxDf must be >= 1")
    val lines = df.select(id.as("doc_id"), text.as("_t"))
      .select(col("doc_id"), posexplode(split(col("_t"), "\n")).as(Seq("pos", "line")))
      .withColumn("_norm", trim(lower(col("line"))))
      .withColumn("_lh",
        when(length(col("_norm")) > 0, xxhash64(col("_norm"))))
    val dfTable = lines
      .where(col("_lh").isNotNull)
      .groupBy("_lh")
      .agg(countDistinct(col("doc_id")).as("_line_df"))
      .where(col("_line_df") > maxDf) // ship only the drop set
    lines
      .join(dfTable, Seq("_lh"), "left")
      .withColumn("_keep", col("_line_df").isNull)
      .groupBy("doc_id")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("_keep"), struct(col("pos"), col("line"))))),
            x => x("line")),
          "\n").as("clean_text"),
        count(when(col("_keep"), 1)).as("n_kept"),
        count(when(!col("_keep"), 1)).as("n_dropped"))
  }

  /** SUBSTRING-level (span) deduplication — the sequence-level pass from
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better" (ACL 2022): any run of `spanLen` consecutive tokens that
    * appears in MORE than one document is a duplicated span; every
    * occurrence outside its canonical document (the smallest doc id
    * containing the span) is cut, and each document's surviving tokens
    * reassemble in original order. Document-level dedup ([[exact]],
    * MinHash) misses exactly this: near-identical boilerplate PARAGRAPHS
    * embedded in otherwise-distinct pages.
    *
    * Semantics on the normalized token stream (`lower` + whitespace
    * split — the engine's shared tokenizer): a token is dropped iff some
    * `spanLen`-token window covering it is (a) content-identical to a
    * window in ≥ 2 distinct documents and (b) this document is not that
    * window's canonical (min-doc-id) home. Canonical documents keep
    * their text unchanged; reassembly is single-space joined. Documents
    * with fewer than `spanLen` tokens have no windows and pass through.
    *
    * Scale shape (the suffix-array build of the paper is single-node;
    * this is the distributed rolling-window equivalent): window
    * generation is NARROW (one per-row transform; windows key by
    * `xxhash64` so shuffled rows carry 8-byte keys, the [[lineDedup]]
    * move); ONE hash aggregation computes each window's doc frequency
    * and canonical home, SHIPPING ONLY the duplicated windows back; the
    * coverage join keys on window hash (cost scales with duplicated
    * occurrences, never docs²); and per-doc dropped-position sets ride
    * one keyed join back to the document row — token arrays never
    * explode into a corpus-wide token table. Output:
    * `(doc_id, clean_text, n_kept, n_dropped)`.
    */
  def spanDedup(
      df: DataFrame, text: Column, id: Column, spanLen: Int): DataFrame = {
    require(spanLen >= 2, "spanLen must be >= 2")
    val docs = df.select(id.as("doc_id"), TextAnalysis.words(text).as("_w"))
    val wins = docs.where(size(col("_w")) >= spanLen)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("_w")) - spanLen),
          i => struct(i.cast("long").as("pos"),
            xxhash64(concat_ws(" ", slice(col("_w"), i + 1, lit(spanLen))))
              .as("wh")))).as("x"))
      .select(col("doc_id"), col("x.pos").as("pos"), col("x.wh").as("wh"))
    val dups = wins.groupBy("wh")
      .agg(countDistinct(col("doc_id")).as("_nd"),
        min(col("doc_id")).as("_canon"))
      .where(col("_nd") >= 2)
      .select("wh", "_canon")
    val dropped = wins.join(dups, Seq("wh"))
      .where(col("doc_id") =!= col("_canon"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + spanLen - 1)).as("tp"))
      .groupBy("doc_id").agg(collect_set(col("tp")).as("_drop"))
    docs.join(dropped, Seq("doc_id"), "left")
      .withColumn("_drop",
        coalesce(col("_drop"), array().cast("array<long>")))
      .withColumn("_kept", filter(col("_w"),
        (t, i) => !array_contains(col("_drop"), i.cast("long"))))
      .select(col("doc_id"),
        array_join(col("_kept"), " ").as("clean_text"),
        size(col("_kept")).cast("long").as("n_kept"),
        (size(col("_w")) - size(col("_kept"))).cast("long").as("n_dropped"))
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): semantic dedup of an
    * embedding corpus by k-means clustering + within-cluster cosine
    * pruning — the pass LAION/DataComp-style pipelines run where exact
    * and MinHash dedup ([[exact]], [[lshCandidates]]) cannot see
    * paraphrases. Two-stage shape:
    *
    *   1. cluster: every vector is assigned to its nearest of `k`
    *      centroids (squared L2, the k-means metric) by a narrow
    *      broadcast kernel — zero shuffle, same shape as IVF
    *      assignment.
    *   2. prune: within each cluster, a doc is dropped iff a LOWER-id
    *      doc in the same cluster has cosine >= `threshold`. This is
    *      the paper's released triangular-max rule (drop x_i when
    *      max_{j<i} sim(x_i, x_j) > eps) with the arbitrary tensor
    *      order replaced by id order, this engine's portable canon
    *      (same rule as [[keepCanonical]]).
    *
    * Deterministic variant, the s06 move: centroids are the
    * md5-ordered seed sample (`lloydIters = 0` — the k-means++ of a
    * frozen pipeline), so the whole pass (seed, assignment, pairing,
    * verdict) replays bit-for-bit cross-engine and the oracle gates
    * all of it. A production run swaps Lloyd-refined centroids into
    * the same shape, exactly as [[Similarity.pqTrain]] does.
    *
    * Scale: the within-cluster self-join is SemDeDup's real design —
    * quadratic per cluster, linear overall because `k` SCALES WITH N
    * (the paper uses k = 50k on LAION-440M, keeping expected cluster
    * size ~N/k constant). The join is a hash join on the cluster id,
    * never a cross product; the verify kernel touches only same-cluster
    * pairs. Output: (vec_id, cluster_id, kept).
    */
  def semDedup(
      emb: DataFrame, id: String, vec: String, k: Int,
      threshold: Double, salt: String = "sem"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = emb.sparkSession
    import spark.implicits._
    val vd = transform(col(vec), x => x.cast("double"))
    val e = emb.select(col(id).cast("long").as("_id"), vd.as("_v"))
      .withColumn("_n", sqrt(aggregate(col("_v"), lit(0.0d),
        (acc, x) => acc + x * x)))
    // Seed centroids: k rows in salted-md5 order (ties toward the lower
    // id) — O(k) driver state, the same contract as pqTrain's seed.
    val cents: Array[Array[Double]] = e
      .orderBy(md5(concat(lit(salt + "#"), col("_id").cast("string"))),
        col("_id"))
      .limit(k)
      .select(col("_v")).as[Array[Double]].collect()
    val centB = spark.sparkContext.broadcast(cents)
    // Assignment: ascending-index squared-L2 accumulation with a strict
    // less-than compare — ties toward the lower centroid index, matching
    // the oracle's ORDER BY d ASC, c. Narrow, no shuffle.
    val assign = e.select(col("_id"), col("_v"), col("_n"))
      .as[(Long, Array[Double], Double)]
      .mapPartitions { it =>
        val cs = centB.value
        it.map { case (vid, v, n) =>
          var best = 0
          var bestD = Double.PositiveInfinity
          var c = 0
          while (c < cs.length) {
            val cv = cs(c)
            var acc = 0.0
            var j = 0
            while (j < v.length) {
              val d = v(j) - cv(j); acc += d * d; j += 1
            }
            if (acc < bestD) { bestD = acc; best = c }
            c += 1
          }
          (vid, best.toLong, v, n)
        }
      }
      .toDF("_id", "_cid", "_v", "_n")
      // materialize the assignment ONCE: three consumers read it (both
      // pair-join branches and the final verdict join), and without
      // this the N·k argmin kernel re-runs per branch — the uncached
      // multi-scan pattern pqTopK was called out for (ADVICE r7)
      .localCheckpoint()
    val a = assign.select(col("_id").as("vec_a"), col("_cid"),
      col("_v").as("_va"), col("_n").as("_na"))
    val b = assign.select(col("_id").as("vec_b"), col("_cid"),
      col("_v").as("_vb"), col("_n").as("_nb"))
    val dropped = Similarity.cosineFilterPairs(
        a.join(b, Seq("_cid")).where(col("vec_a") < col("vec_b")),
        threshold)
      .select(col("vec_b").as("_id")).distinct()
    assign.join(dropped.withColumn("_dropped", lit(true)),
        Seq("_id"), "left")
      .select(col("_id").as("vec_id"), col("_cid").as("cluster_id"),
        coalesce(!col("_dropped"), lit(true)).as("kept"))
  }

  /** Embedding near-duplicate pairs: cosine >= threshold within a
    * blocking key (the label column here; [[embeddingNearDupsLsh]] blocks
    * on LSH buckets for the production path). The self-join is a hash
    * join on the blocking key, never a full cross product.
    */
  def embeddingNearDups(
      emb: DataFrame, id: String, vec: String, blockKey: String,
      threshold: Double): DataFrame = {
    val vd = transform(col(vec), x => x.cast("double"))
    val e = emb.select(col(id).as("_id"), col(blockKey).as("_bk"), vd.as("_v"))
      .withColumn("_norm", sqrt(aggregate(col("_v"), lit(0.0d),
        (acc, x) => acc + x * x)))
    val a = e.select(col("_id").as("vec_a"), col("_bk"),
      col("_v").as("_va"), col("_norm").as("_na"))
    val b = e.select(col("_id").as("vec_b"), col("_bk"),
      col("_v").as("_vb"), col("_norm").as("_nb"))
    Similarity.cosineFilterPairs(
      a.join(b, Seq("_bk")).where(col("vec_a") < col("vec_b")),
      threshold)
  }
}
