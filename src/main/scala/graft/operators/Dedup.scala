package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Distinct word-3-gram shingles per document (docs with <3 words are
    * dropped — they have no 3-gram).
    */
  def shingles(df: DataFrame, text: Column, id: Column): DataFrame = {
    val w = TextAnalysis.words(text)
    df.select(id.as("doc_id"), w.as("_w"))
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

  /** LSH candidate pairs: docs sharing at least one band signature.
    * Bands unpivot to (band_idx, band_val) rows, ONE shuffle groups each
    * bucket's doc ids, and pairs are emitted per bucket — the expensive
    * shingle→minhash pipeline executes exactly once (a self-join would
    * run it once per side). LSH buckets are tiny by construction, so the
    * per-bucket pair expansion is bounded; a pathological bucket (e.g.
    * thousands of identical docs) should be exact-deduped first.
    */
  def lshCandidates(sig: DataFrame, nBands: Int): DataFrame = {
    val unpivoted = sig.select(col("doc_id"), posexplode(
      array((0 until nBands).map(b => col(s"band_$b")): _*)))
      .toDF("doc_id", "bidx", "bval")
    val buckets = unpivoted.groupBy("bidx", "bval")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .where(size(col("ids")) > 1)
    buckets.select(explode(flatten(
        transform(sequence(lit(0), size(col("ids")) - 2), i =>
          transform(slice(col("ids"), i + 2, size(col("ids"))),
            y => struct(element_at(col("ids"), i + 1).as("doc_a"),
              y.as("doc_b")))))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b")).distinct()
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs, computed
    * by joining the pairs against the shingle sets (shuffles scale with
    * |candidates|·avg-shingles, not |docs|²).
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

  /** SimHash per-token ±1 contribution for bit `b` over a precomputed
    * md5-hex column `h`, as SQL that evaluates identically in Spark and
    * DuckDB (hex digit `b/4`, mask `8 >> b%4`). The md5 is hoisted into
    * `h` so it is computed once per token, not once per bit.
    */
  def simhashTermSql(b: Int): String = {
    val j = b / 4
    val m = 8 >> (b % 4)
    s"CASE WHEN ((instr('0123456789abcdef', substr(h, ${j + 1}, 1)) - 1) & $m) > 0 THEN 1 ELSE -1 END"
  }

  /** 16-bit SimHash from the first 4 md5 hex digits of each distinct
    * token: per bit, majority vote of +-1 contributions.
    */
  def simhash16(df: DataFrame, text: Column, id: Column): DataFrame = {
    val tokens = df
      .select(id.as("doc_id"), explode(array_distinct(TextAnalysis.words(text))).as("w"))
      .select(col("doc_id"), md5(col("w")).as("h"))
    val sums = (0 until 16).map(b => sum(expr(simhashTermSql(b))).as(s"s$b"))
    val agg = tokens.groupBy("doc_id").agg(sums.head, sums.tail: _*)
    agg.select(col("doc_id"),
      concat((0 until 16).map(b =>
        when(col(s"s$b") > 0, "1").otherwise("0")): _*).as("simhash"))
  }

  /** Embedding near-duplicate pairs blocked on BANDED sign-LSH buckets —
    * the production-scale variant of [[embeddingNearDups]]. An
    * AND-over-all-planes block is too strict for moderate similarity, so
    * the planes split into bands (OR-construction, same shape as minhash
    * LSH): vectors colliding in ANY band become candidates, and exact
    * cosine verifies them. Bucketing is a narrow map
    * ([[Similarity.signBuckets]]); candidate generation is one shuffle on
    * (band, sub-bucket); cosine runs only on candidates. Recall rises
    * with band count at linear cost — never an all-pairs product.
    */
  def embeddingNearDupsLsh(
      emb: DataFrame, id: String, vec: String,
      nPlanes: Int, bandSize: Int, dims: Int, threshold: Double): DataFrame = {
    require(nPlanes % bandSize == 0, "nPlanes must be a multiple of bandSize")
    val nBands = nPlanes / bandSize
    val buckets = Similarity.signBuckets(emb, id, vec, nPlanes, dims)
    val bands = buckets.select(col("vec_id"), posexplode(
        array((0 until nBands).map(b =>
          substring(col("bucket"), b * bandSize + 1, bandSize)): _*)))
      .toDF("vec_id", "bidx", "bval")
    val cands = bands.alias("x")
      .join(bands.alias("y"),
        col("x.bidx") === col("y.bidx") && col("x.bval") === col("y.bval") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
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
