package graft.queries

import graft.Tables
import graft.operators.{Dedup, Funnel, Multimodal, Packing, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators as driver-checkable queries:
  * deduplication (exact / MinHash+LSH / n-gram Jaccard / SimHash /
  * embedding-cosine), similarity search (brute-force top-k + sign-LSH
  * buckets), text analysis, and the multimodal metadata stub — each with
  * a DuckDB oracle reproducing the md5-based hashes byte-for-byte.
  */
object Pipeline {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d01_dedup_exact" -> d01,
    "d02_minhash_lsh" -> d02,
    "d03_ngram_jaccard" -> d03,
    "d04_simhash" -> d04,
    "d05_embedding_neardup" -> d05,
    "d06_simhash_near_pairs" -> d06,
    "d07_embedding_neardup_lsh" -> d07,
    "d08_decontaminate" -> d08,
    "d09_line_dedup" -> d09,
    "d10_exact_overlap" -> d10,
    "d11_dedup_components" -> d11,
    "d12_span_dedup" -> d12,
    "d13_dedup_survivors" -> d13,
    "d14_semdedup" -> d14,
    "d15_cc_incremental" -> d15,
    "d16_dedup_ingest" -> d16,
    "d17_semdedup_incremental" -> d17,
    "d18_dedup_ingest_strkeys" -> d18,
    "d19_semdedup_keyed" -> d19,
    "d20_containment" -> d20,
    "d21_containment_index" -> d21,
    "d22_contain_keyed" -> d22,
    "d23_contain_postings" -> d23,
    "p04_contain_gate" -> p04,
    "p05_shard_map" -> p05,
    "p06_seq_map" -> p06,
    "x01_approx_distinct" -> x01,
    "x02_exact_distinct" -> x02,
    "s01_ann_topk" -> s01,
    "s02_ann_lsh_buckets" -> s02,
    "s03_ann_ivf" -> s03,
    "s04_ann_lsh_topk" -> s04,
    "s05_ann_pq_exact" -> s05,
    "s06_ann_pq_adc" -> s06,
    "t01_text_tokens" -> t01,
    "t02_text_quality" -> t02,
    "t03_text_langid" -> t03,
    "t04_text_fingerprint" -> t04,
    "t05_rolling_fingerprint" -> t05,
    "t06_pii_scrub" -> t06,
    "t07_repetition" -> t07,
    "t08_split_assign" -> t08,
    "t09_length_histogram" -> t09,
    "t10_stratified_sample" -> t10,
    "t11_source_cap" -> t11,
    "t12_seq_packing" -> t12,
    "t13_source_mix" -> t13,
    "t14_shard_assign" -> t14,
    "t15_seq_emit" -> t15,
    "t16_rarity_score" -> t16,
    "t17_hash_classifier" -> t17,
    "t18_chunk_overlap" -> t18,
    "t21_term_search" -> t21,
    "t22_term_rank" -> t22,
    "t23_tfidf_rank" -> t23,
    "t24_phrase_search" -> t24,
    "t25_prefix_search" -> t25,
    "t26_near_search" -> t26,
    "t27_bm25_rank" -> t27,
    "t28_bm25_any" -> t28,
    "t19_lm_score" -> t19,
    "p01_filter_funnel" -> p01,
    "p02_index_funnel" -> p02,
    "p03_export_shards" -> p03,
    "p07_lm_gated_export" -> p07,
    "m01_multimodal_meta" -> m01,
    "m02_frame_sample" -> m02,
    "m03_resize" -> m03,
    "m04_feature_extract" -> m04)

  private def docs(s: SparkSession, dir: String) = Tables(s, dir, "documents")
  private def emb(s: SparkSession, dir: String) = Tables(s, dir, "embeddings")

  private def d01(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(docs(s, dir), col("text"), col("doc_id"))

  /** Signatures come from the zero-shuffle per-document kernel
    * ([[Dedup.minhashBands]]); the only shuffle left in candidate
    * generation is the bucket-grouped pair emit itself.
    */
  private def d02(s: SparkSession, dir: String): DataFrame =
    Dedup.lshCandidates(
      Dedup.minhashBands(docs(s, dir), col("text"), col("doc_id"),
        k = 8, bandSize = 2), 4)

  private def d03(s: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingles(docs(s, dir), col("text"), col("doc_id"))
    Dedup.ngramJaccard(d02(s, dir), sh)
  }

  private def d04(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash16(docs(s, dir), col("text"), col("doc_id"))

  private def d05(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDups(emb(s, dir), "vec_id", "embedding", "label", 0.4)

  /** Simhash near-duplicate pairs: 64-bit simhash, 4 × 16-bit band
    * blocking (pigeonhole-complete for dist ≤ 3 — every distance-3 pair
    * shares at least one whole band), per-bucket caps, exact Hamming
    * verify via the native codegen expression
    * [[graft.functions.HammingDistance]].
    */
  private def d06(s: SparkSession, dir: String): DataFrame = {
    graft.functions.HammingDistance.register(s)
    Dedup.simhashNearPairsFromSig(
      Dedup.simhashBits(docs(s, dir), col("text"), col("doc_id"), bits = 64),
      bits = 64, nBands = 4, maxDist = 3)
  }

  /** 32 planes → 4 bands × 8 bits (256 buckets/band): expected candidate
    * volume ≈ 4·N²/256, and the per-bucket cap clips floods the geometry
    * misses. See [[Dedup.embeddingNearDupsLsh]] for the scaling rule.
    */
  private def d07(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDupsLsh(emb(s, dir), "vec_id", "embedding",
      nPlanes = 32, bandSize = 8, dims = 64, threshold = 0.4)

  /** Train/eval decontamination: docs with doc_id % 10 == 0 stand in for
    * the eval set; contamination = ≥ 3 shared rare (df ≤ 20) 3-gram
    * shingles. One shingle shuffle, bucket-grouped pair emit.
    */
  private def d08(s: SparkSession, dir: String): DataFrame =
    Dedup.decontaminate(docs(s, dir), col("text"), col("doc_id"),
      col("doc_id") % 10 === 0, minShared = 3, maxDf = 20)

  /** Line-level boilerplate dedup (C4/MassiveText) under the oracle
    * gate. The shipped corpus is single-line documents with zero
    * cross-document repeated lines, so — the q36/q37 derived-lake
    * move — the query manufactures the semantics it gates: every doc
    * is wrapped in injected boilerplate (a copyright header on all
    * docs, a case/whitespace VARIANT sponsor line so the oracle must
    * express the trim+lower normalization, an empty line that must be
    * preserved and never counted, a newsletter line on every 3rd doc,
    * a per-doc unique line on the rest, a footer on all docs), then
    * [[Dedup.lineDedup]] with `maxDf = 5` must drop exactly the
    * above-threshold lines and reassemble survivors in original order.
    */
  private def d09(s: SparkSession, dir: String): DataFrame = {
    val derived = docs(s, dir).select(col("doc_id"),
      concat(
        lit("Copyright 2024 Example Corp"), lit("\n"),
        when(col("doc_id") % 2 === 0, lit("Visit Our Sponsor"))
          .otherwise(lit("  visit our sponsor  ")), lit("\n"),
        col("text"), lit("\n"),
        lit(""), lit("\n"),
        when(col("doc_id") % 3 === 0, lit("Subscribe to our newsletter!"))
          .otherwise(concat(lit("unique-"), col("doc_id").cast("string"))),
        lit("\n"),
        lit("All Rights Reserved")).as("text"))
    Dedup.lineDedup(derived, col("text"), col("doc_id"), maxDf = 5)
  }

  /** Exact-match decontamination ([[Dedup.exactOverlap]], the strict
    * companion of d08) under the oracle gate, on a derived corpus (the
    * shipped one has zero exact duplicates): every 7th doc gains an
    * eval twin at `doc_id + 1000000` whose text differs only by
    * leading whitespace — fingerprint-equal but not byte-equal, so the
    * match must flow through the normalizing fingerprint, and the
    * expected pairs are exactly the (doc, twin) rows.
    */
  private def d10(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
    val derived = base
      .select(col("doc_id"), col("text"), lit(false).as("is_eval"))
      .unionAll(base.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(lit("  "), col("text")).as("text"),
          lit(true).as("is_eval")))
    Dedup.exactOverlap(derived, col("text"), col("doc_id"), col("is_eval"))
  }

  /** Duplicate-CLUSTER assignment — the step after pair generation that
    * production dedup actually keys on (keep one doc per component):
    * connected components over the verified near-dup pairs (d03's
    * candidates at Jaccard >= 0.5), every clustered doc labeled with
    * the smallest doc id reachable from it. The DuckDB oracle computes
    * the same fixpoint via a recursive CTE over the symmetrized edge
    * list.
    */
  private def d11(s: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(
      d03(s, dir).where(col("jaccard") >= 0.5), "doc_a", "doc_b")

  /** The shared duplicated span for [[d12]]'s derived corpus: 13 tokens,
    * so with spanLen = 8 its six interior windows are shared by every
    * doc carrying the span and cover all 13 injected tokens, while the
    * windows straddling the span/text boundary stay doc-unique.
    */
  private val D12Span = "shared boilerplate segment alpha beta gamma " +
    "delta epsilon zeta eta theta iota kappa"

  /** Substring (span) dedup under the oracle gate, on a derived corpus
    * (the d09 move — the shipped corpus has no cross-doc duplicated
    * 8-gram): every doc_id % 3 == 0 doc APPENDS the 13-token
    * [[D12Span]], every % 3 == 1 doc PREPENDS it (so dropped positions
    * land at both ends), and [[Dedup.spanDedup]] must cut exactly the
    * injected tokens from every carrier except the canonical
    * (smallest-id) one, reassembling survivors in order.
    */
  private def d12(s: SparkSession, dir: String): DataFrame = {
    val derived = docs(s, dir).select(col("doc_id"),
      when(col("doc_id") % 3 === 0, concat(col("text"), lit(" " + D12Span)))
        .when(col("doc_id") % 3 === 1, concat(lit(D12Span + " "), col("text")))
        .otherwise(col("text")).as("text"))
    Dedup.spanDedup(derived, col("text"), col("doc_id"), spanLen = 8)
  }

  /** The persisted components index ([[graft.sources.CcIndex]]) for
    * this corpus, built INCREMENTALLY the way a crawl pipeline would:
    * the d11 pair graph arrives in two batches — first every pair
    * staying among `doc_id % 5 != 0` docs, then every pair touching a
    * `% 5 == 0` doc — and each batch merges into the assignment via
    * [[graft.sources.CcIndex.refreshWithPairs]] (so the second refresh
    * must MERGE previously-separate components and relabel their
    * members, the case a naive append-only index gets wrong).
    * Build-once cached per sf dir; deterministic, so cache ≡ rebuild.
    */
  private[queries] def componentsLake(s: SparkSession, dir: String): String =
    AzofQueries.cachedLake(dir, "ccidx-v1", "components") { l =>
      graft.sources.CcIndex.create(s, l, "components")
      val pairs = d03(s, dir).where(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b")).persist()
      pairs.count()
      val touchesHoldout =
        col("doc_a") % 5 === 0 || col("doc_b") % 5 === 0
      graft.sources.CcIndex.refreshWithPairs(s, l, "components",
        pairs.where(!touchesHoldout), "doc_a", "doc_b",
        java.time.Instant.parse("2024-02-01T00:00:00Z"))
      graft.sources.CcIndex.refreshWithPairs(s, l, "components",
        pairs.where(touchesHoldout), "doc_a", "doc_b",
        java.time.Instant.parse("2024-03-01T00:00:00Z"))
      pairs.unpersist()
      ()
    }

  /** The FULL incremental pipeline ([[graft.sources.DedupFlow]]) run
    * the way production would: the documents corpus lands as an azof
    * SOURCE TABLE in two crawl batches (`doc_id % 5 != 0`, then the
    * `% 5 == 0` holdout), and each batch is INGESTED end to end — CDC
    * churn keys → MinHash signature catch-up (streaming, exactly-once)
    * → churn-confined LSH candidates answered from the persisted
    * signature index → n-gram Jaccard verify ≥ 0.5 → component merge
    * with changed-labels-only commits. Unlike [[componentsLake]] (which
    * feeds PRECOMPUTED d03 pairs to the index), nothing here sees the
    * one-shot pair graph: every pair is rediscovered incrementally
    * from the indexes. Deterministic, so cache ≡ rebuild.
    */
  private[queries] def dedupFlowLake(s: SparkSession, dir: String): String =
    AzofQueries.cachedLake(dir, "ddflow-v1", "components") { l =>
      import graft.format.{ColumnDef, ColumnType, TableSchema}
      import graft.sources.{AzofWriter, DedupFlow}
      import java.time.Instant
      val srcSchema = graft.format.TableSchema(Seq(
        ColumnDef("text", ColumnType.AzString, nullable = true)))
      AzofWriter.createTable(s, l, "docs_src", srcSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      DedupFlow.create(s, l)
      def batch(holdout: Boolean, at: String) =
        docs(s, dir)
          .where((col("doc_id") % 5 === 0) === holdout)
          .select(col("doc_id").cast("string").as(TableSchema.KeyName),
            lit(java.sql.Timestamp.from(Instant.parse(at)))
              .as(TableSchema.EventTimeName),
            col("text"))
      AzofWriter.commitBase(s, l, "docs_src",
        batch(holdout = false, "2024-01-15T00:00:00Z"))
      DedupFlow.ingest(s, l, "docs_src", "text", l,
        s"$l/_ddf_ck", Instant.parse("2024-02-01T00:00:00Z"))
      AzofWriter.commitDelta(s, l, "docs_src",
        batch(holdout = true, "2024-02-15T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))
      DedupFlow.ingest(s, l, "docs_src", "text", l,
        s"$l/_ddf_ck", Instant.parse("2024-03-01T00:00:00Z"))
      ()
    }

  /** The survivors served from the end-to-end incrementally-ingested
    * indexes ([[dedupFlowLake]]): must hash-match the one-shot d13
    * oracle (LSH candidates → Jaccard ≥ 0.5 → recursive components →
    * keep-one) over the full corpus — the every-stage-incremental ≡
    * one-shot equivalence, end to end.
    */
  private def d16(s: SparkSession, dir: String): DataFrame = {
    val l = dedupFlowLake(s, dir)
    graft.sources.DedupFlow.survivors(s, l, "docs_src", l)
  }

  /** The STRING-keyed twin of [[dedupFlowLake]]: the same two-crawl
    * corpus keyed `doc-<id>` (URL-shaped, NOT long-castable), flowing
    * through the surrogate-id path — blocking and Jaccard on the raw
    * keys, [[graft.sources.KeyMap]] ids minted for pair-involved keys
    * only, CC over the surrogates.
    */
  private[queries] def dedupFlowStrLake(s: SparkSession, dir: String): String =
    AzofQueries.cachedLake(dir, "ddflowstr-v1", "components") { l =>
      import graft.format.{ColumnDef, ColumnType, TableSchema}
      import graft.sources.{AzofWriter, DedupFlow}
      import java.time.Instant
      val srcSchema = graft.format.TableSchema(Seq(
        ColumnDef("text", ColumnType.AzString, nullable = true)))
      AzofWriter.createTable(s, l, "docs_src", srcSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      DedupFlow.create(s, l, keyMap = Some("key_map"))
      def batch(holdout: Boolean, at: String) =
        docs(s, dir)
          .where((col("doc_id") % 5 === 0) === holdout)
          .select(concat(lit("doc-"), col("doc_id").cast("string"))
              .as(TableSchema.KeyName),
            lit(java.sql.Timestamp.from(Instant.parse(at)))
              .as(TableSchema.EventTimeName),
            col("text"))
      AzofWriter.commitBase(s, l, "docs_src",
        batch(holdout = false, "2024-01-15T00:00:00Z"))
      DedupFlow.ingest(s, l, "docs_src", "text", l,
        s"$l/_ddf_ck", Instant.parse("2024-02-01T00:00:00Z"),
        keyMap = Some("key_map"))
      AzofWriter.commitDelta(s, l, "docs_src",
        batch(holdout = true, "2024-02-15T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))
      DedupFlow.ingest(s, l, "docs_src", "text", l,
        s"$l/_ddf_ck", Instant.parse("2024-03-01T00:00:00Z"),
        keyMap = Some("key_map"))
      ()
    }

  /** The surrogate-keyed survivors: must match the d16 verdict with
    * every doc addressed by its URL-shaped key and each component's
    * canonical elected by MIN KEY — id-agnostic, so the oracle needs no
    * knowledge of minting order (connectivity is key-renaming-
    * invariant).
    */
  private def d18(s: SparkSession, dir: String): DataFrame = {
    val l = dedupFlowStrLake(s, dir)
    graft.sources.DedupFlow.survivorsKeyed(s, l, "docs_src", l)
  }

  /** The persisted SemDeDup index ([[graft.sources.SemDedupIndex]])
    * built INCREMENTALLY over the embeddings corpus: two crawl batches
    * split so the d14 seed docs all land in batch 1 (the index freezes
    * centroids at create, so batch-1 seeding ≡ full-corpus seeding by
    * construction — the frozen-model contract made oracle-checkable),
    * each followed by a change-feed refresh. The holdout batch carries
    * LOW ids too, so the second refresh must exercise the verdict
    * FLIP: existing keeps dominated by a late-arriving lower id.
    */
  private[queries] def semIndexLake(s: SparkSession, dir: String): String =
    AzofQueries.cachedLake(dir, "semidx-v1", "sem") { l =>
      import graft.format.{ColumnDef, ColumnType, TableSchema}
      import graft.sources.{AzofWriter, SemDedupIndex}
      import java.time.Instant
      val srcSchema = graft.format.TableSchema(Seq(
        ColumnDef("vec", ColumnType.AzString, nullable = false)))
      AzofWriter.createTable(s, l, "emb_src", srcSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      val e = emb(s, dir).select(col("vec_id"),
        concat(lit("["), concat_ws(",",
          transform(col("embedding"), x => x.cast("double").cast("string"))),
          lit("]")).as("vec"))
      val seedIds = e
        .orderBy(md5(concat(lit("sem#"), col("vec_id").cast("string"))),
          col("vec_id"))
        .limit(16).select(col("vec_id").cast("long"))
        .collect().map(_.getLong(0)).toSet
      def batch(holdout: Boolean, at: String) = e
        .where(((col("vec_id") % 5 === 0) &&
          !col("vec_id").isin(seedIds.toSeq: _*)) === holdout)
        .select(col("vec_id").cast("string").as(TableSchema.KeyName),
          lit(java.sql.Timestamp.from(Instant.parse(at)))
            .as(TableSchema.EventTimeName),
          col("vec"))
      AzofWriter.commitBase(s, l, "emb_src",
        batch(holdout = false, "2024-01-15T00:00:00Z"))
      SemDedupIndex.create(s, l, "emb_src", "vec", l, "sem",
        k = 16, threshold = 0.4)
      SemDedupIndex.refresh(s, l, "emb_src", "vec", l, "sem",
        s"$l/_sem_ck").awaitTermination()
      AzofWriter.commitDelta(s, l, "emb_src",
        batch(holdout = true, "2024-02-15T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))
      SemDedupIndex.refresh(s, l, "emb_src", "vec", l, "sem",
        s"$l/_sem_ck").awaitTermination()
      ()
    }

  /** The incrementally-built persisted verdicts, read back whole: must
    * hash-match the one-shot d14 oracle (full-corpus seed → assignment
    * → triangular verdict) — frozen-model increments ≡ one-shot
    * SemDeDup, flips included.
    */
  private def d17(s: SparkSession, dir: String): DataFrame =
    graft.sources.SemDedupIndex.verdicts(s, semIndexLake(s, dir), "sem")

  /** The STRING-keyed twin of [[semIndexLake]] (the d18 move applied to
    * the embedding modality): the same two-crawl corpus keyed
    * `doc-<id>` — URL-shaped, NOT long-castable — through
    * [[graft.sources.SemDedupIndex]]'s keyed mode, where the dominance
    * order is LEXICOGRAPHIC on the raw key. The batch split keeps every
    * KEYED seed doc in batch 1 (seeds rank by md5 of the KEY, so the
    * seed set differs from d17's), and the holdout carries keys like
    * `doc-10` that sort BELOW batch-1 keys like `doc-9` — the keyed
    * verdict flip, exercised by construction.
    */
  private[queries] def semIndexStrLake(s: SparkSession, dir: String): String =
    AzofQueries.cachedLake(dir, "semidxstr-v1", "sem") { l =>
      import graft.format.{ColumnDef, ColumnType, TableSchema}
      import graft.sources.{AzofWriter, SemDedupIndex}
      import java.time.Instant
      val srcSchema = graft.format.TableSchema(Seq(
        ColumnDef("vec", ColumnType.AzString, nullable = false)))
      AzofWriter.createTable(s, l, "emb_src", srcSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      val e = emb(s, dir).select(
        concat(lit("doc-"), col("vec_id").cast("string")).as("k"),
        col("vec_id"),
        concat(lit("["), concat_ws(",",
          transform(col("embedding"), x => x.cast("double").cast("string"))),
          lit("]")).as("vec"))
      val seedKeys = e
        .orderBy(md5(concat(lit("sem#"), col("k"))), col("k"))
        .limit(16).select(col("k"))
        .collect().map(_.getString(0)).toSet
      def batch(holdout: Boolean, at: String) = e
        .where(((col("vec_id") % 5 === 0) &&
          !col("k").isin(seedKeys.toSeq: _*)) === holdout)
        .select(col("k").as(TableSchema.KeyName),
          lit(java.sql.Timestamp.from(Instant.parse(at)))
            .as(TableSchema.EventTimeName),
          col("vec"))
      AzofWriter.commitBase(s, l, "emb_src",
        batch(holdout = false, "2024-01-15T00:00:00Z"))
      SemDedupIndex.create(s, l, "emb_src", "vec", l, "sem",
        k = 16, threshold = 0.4, keyed = true)
      SemDedupIndex.refresh(s, l, "emb_src", "vec", l, "sem",
        s"$l/_sem_ck").awaitTermination()
      AzofWriter.commitDelta(s, l, "emb_src",
        batch(holdout = true, "2024-02-15T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))
      SemDedupIndex.refresh(s, l, "emb_src", "vec", l, "sem",
        s"$l/_sem_ck").awaitTermination()
      ()
    }

  /** The keyed-mode persisted verdicts, read back whole: the oracle
    * replays the full frozen-model pass with `doc-<id>` keys and
    * LEXICOGRAPHIC dominance (`'doc-10' < 'doc-9'` — numerically
    * inverted, so a numeric-order bug cannot hash-match).
    */
  private def d19(s: SparkSession, dir: String): DataFrame =
    graft.sources.SemDedupIndex.verdictsKeyed(s, semIndexStrLake(s, dir),
      "sem")

  /** Asymmetric containment (quote/subset) dedup under the oracle gate,
    * on a derived corpus (the d09/d12 move — the shipped corpus has no
    * cross-doc quotes): every `doc_id % 10 == 0` doc is REPLACED by the
    * first 30 words of its successor, so its shingles are a strict
    * subset of the successor's (containment 1.0) while Jaccard stays
    * ~30/|successor| — pairs [[Dedup.ngramJaccard]]'s gate would never
    * pass and MinHash LSH would rarely even surface. The oracle replays
    * derivation → shingles → df-guarded collision blocking → exact
    * intersection verbatim.
    */
  /** The quote-injected derived corpus d20 and d21 share: every
    * `doc_id % 10 == 0` doc REPLACED by the first 30 words of its
    * successor (strict shingle subset → containment 1.0, Jaccard ≈ 0).
    */
  private[queries] def d20Derived(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val nb = d.select((col("doc_id") - 1).as("doc_id"),
      col("text").as("_ntext"))
    d.join(nb, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 0 && col("_ntext").isNotNull,
          array_join(slice(split(col("_ntext"), "\\s+"), 1, 30), " "))
          .otherwise(col("text")).as("text"))
  }

  private def d20(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(d20Derived(s, dir), col("text"), col("doc_id"),
      minShared = 3, maxDf = 20, minContainment = 0.9)

  /** The d20 derived corpus landed as an azof SOURCE table in two crawl
    * batches (`doc_id % 3 != 0`, then the `% 3 == 0` holdout — chosen so
    * containment pairs land both WITHIN batch 1 and ACROSS the batch
    * boundary), each batch ingested into the persisted
    * [[graft.sources.ContainIndex]]: CDC churn → churn-confined
    * df-guarded collision blocking answered from one map-side-pruned
    * corpus pass → exact containment verify → one mixed
    * upsert/tombstone commit. Deterministic, so cache ≡ rebuild.
    */
  private[queries] def containLake(s: SparkSession, dir: String): String =
    AzofQueries.cachedLake(dir, "contain-v1", "contain_pairs") { l =>
      import graft.format.{ColumnDef, ColumnType, TableSchema}
      import graft.sources.{AzofWriter, ContainIndex}
      import java.time.Instant
      val srcSchema = graft.format.TableSchema(Seq(
        ColumnDef("text", ColumnType.AzString, nullable = true)))
      AzofWriter.createTable(s, l, "docs_src", srcSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      ContainIndex.create(s, l)
      val derived = d20Derived(s, dir)
      def batch(holdout: Boolean, at: String) =
        derived.where((col("doc_id") % 3 === 0) === holdout)
          .select(col("doc_id").cast("string").as(TableSchema.KeyName),
            lit(java.sql.Timestamp.from(Instant.parse(at)))
              .as(TableSchema.EventTimeName),
            col("text"))
      AzofWriter.commitBase(s, l, "docs_src",
        batch(holdout = false, "2024-01-15T00:00:00Z"))
      ContainIndex.refresh(s, l, "docs_src", "text", l,
        at = Instant.parse("2024-02-01T00:00:00Z"))
      AzofWriter.commitDelta(s, l, "docs_src",
        batch(holdout = true, "2024-02-15T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))
      ContainIndex.refresh(s, l, "docs_src", "text", l,
        at = Instant.parse("2024-03-01T00:00:00Z"))
      ()
    }

  /** The persisted containment verdicts, read back whole
    * ([[containLake]]): must hash-match the d20 one-shot oracle over
    * the full derived corpus — incremental churn-confined blocking ≡
    * one-shot, the d15/d16 equivalence for the containment family.
    */
  private def d21(s: SparkSession, dir: String): DataFrame =
    graft.sources.ContainIndex.pairs(s, containLake(s, dir),
      "contain_pairs")

  /** The STRING-keyed twin of [[containLake]]: the derived corpus keyed
    * `doc-<id>` (URL-shaped, NOT long-castable), through the keyed
    * refresh — blocking/verify on raw keys, pairs ordered
    * LEXICOGRAPHICALLY.
    */
  private[queries] def containLakeKeyed(s: SparkSession, dir: String): String =
    AzofQueries.cachedLake(dir, "containk-v1", "contain_pairs") { l =>
      import graft.format.{ColumnDef, ColumnType, TableSchema}
      import graft.sources.{AzofWriter, ContainIndex}
      import java.time.Instant
      val srcSchema = graft.format.TableSchema(Seq(
        ColumnDef("text", ColumnType.AzString, nullable = true)))
      AzofWriter.createTable(s, l, "docs_src", srcSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      ContainIndex.create(s, l)
      val derived = d20Derived(s, dir)
      def batch(holdout: Boolean, at: String) =
        derived.where((col("doc_id") % 3 === 0) === holdout)
          .select(concat(lit("doc-"), col("doc_id").cast("string"))
              .as(TableSchema.KeyName),
            lit(java.sql.Timestamp.from(Instant.parse(at)))
              .as(TableSchema.EventTimeName),
            col("text"))
      AzofWriter.commitBase(s, l, "docs_src",
        batch(holdout = false, "2024-01-15T00:00:00Z"))
      ContainIndex.refresh(s, l, "docs_src", "text", l,
        at = Instant.parse("2024-02-01T00:00:00Z"), keyed = true)
      AzofWriter.commitDelta(s, l, "docs_src",
        batch(holdout = true, "2024-02-15T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))
      ContainIndex.refresh(s, l, "docs_src", "text", l,
        at = Instant.parse("2024-03-01T00:00:00Z"), keyed = true)
      ()
    }

  /** The keyed containment verdicts: must hash-match the one-shot
    * oracle re-keyed `doc-<id>` with LEXICOGRAPHIC pair order — the
    * `'doc-10' < 'doc-9'` inversion (d19's move) makes a
    * numeric-order bug un-hash-matchable.
    */
  private def d22(s: SparkSession, dir: String): DataFrame =
    graft.sources.ContainIndex.pairsKeyed(s, containLakeKeyed(s, dir),
      "contain_pairs")

  /** [[containLake]] rebuilt through the POSTING-LIST path: the same
    * two-batch ingest, but each refresh maintains the persisted
    * shingle→members posting table and serves blocking from it — NO
    * corpus pass per refresh (the [[graft.sources.ContainIndex]]
    * `postings` option). Verdicts must still hash-match the one-shot
    * oracle verbatim.
    */
  private[queries] def containLakePostings(
      s: SparkSession, dir: String): String =
    AzofQueries.cachedLake(dir, "containp-v1", "contain_pairs") { l =>
      import graft.format.{ColumnDef, ColumnType, TableSchema}
      import graft.sources.{AzofWriter, ContainIndex}
      import java.time.Instant
      val srcSchema = graft.format.TableSchema(Seq(
        ColumnDef("text", ColumnType.AzString, nullable = true)))
      AzofWriter.createTable(s, l, "docs_src", srcSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      ContainIndex.create(s, l)
      ContainIndex.createPostings(s, l)
      val derived = d20Derived(s, dir)
      def batch(holdout: Boolean, at: String) =
        derived.where((col("doc_id") % 3 === 0) === holdout)
          .select(col("doc_id").cast("string").as(TableSchema.KeyName),
            lit(java.sql.Timestamp.from(Instant.parse(at)))
              .as(TableSchema.EventTimeName),
            col("text"))
      AzofWriter.commitBase(s, l, "docs_src",
        batch(holdout = false, "2024-01-15T00:00:00Z"))
      ContainIndex.refresh(s, l, "docs_src", "text", l,
        at = Instant.parse("2024-02-01T00:00:00Z"),
        postings = Some("contain_postings"))
      AzofWriter.commitDelta(s, l, "docs_src",
        batch(holdout = true, "2024-02-15T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))
      ContainIndex.refresh(s, l, "docs_src", "text", l,
        at = Instant.parse("2024-03-01T00:00:00Z"),
        postings = Some("contain_postings"))
      ()
    }

  /** The posting-list-served containment verdicts: index built with NO
    * per-refresh corpus pass, yet pair-for-pair identical to the d20
    * one-shot — the amortization twin under the same hash gate as
    * every other index family.
    */
  private def d23(s: SparkSession, dir: String): DataFrame =
    graft.sources.ContainIndex.pairs(s, containLakePostings(s, dir),
      "contain_pairs")

  /** The incrementally-built persisted assignment, read back whole: must
    * hash-match the one-shot d11 clustering (the oracle recomputes the
    * full recursive fixpoint), proving the two-batch
    * [[graft.sources.CcIndex]] merge path ≡ batch connected components.
    */
  private def d15(s: SparkSession, dir: String): DataFrame =
    graft.sources.CcIndex.assignment(s, componentsLake(s, dir), "components")

  /** The keep-one verdict over the near-dup clusters: each component's
    * minimum-id doc plus every unclustered doc — the filtered corpus a
    * dedup pipeline actually ships. Serves from the PERSISTED
    * [[graft.sources.CcIndex]] assignment (one azof scan + one
    * broadcast-sized join), the production shape: the clustering is
    * amortized in the index (d11 measures the algorithm itself; d15
    * gates the index build), and the ship step does not re-cluster.
    */
  private def d13(s: SparkSession, dir: String): DataFrame =
    Dedup.keepCanonical(docs(s, dir), col("doc_id"),
      graft.sources.CcIndex.assignment(s, componentsLake(s, dir),
        "components"))

  /** Approximate distinct (HyperLogLog++ sketch). No oracle: sketch
    * estimates are implementation-specific, so the driver records the
    * weaker rows-only check by design; [[x02]] carries the
    * hash-checkable exact twin.
    */
  private def x01(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("approx_users"))

  /** Exact distinct-count twin of [[x01]], oracle-checked. */
  private def x02(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))

  private def s01(s: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(emb(s, dir), "vec_id", "embedding",
      col("vec_id") < 3, k = 10)
      .withColumnRenamed("rank", "rnk")

  private def s02(s: SparkSession, dir: String): DataFrame =
    Similarity.signBuckets(emb(s, dir), "vec_id", "embedding", 8, 64)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(col("vec_id")).as("min_vec"))

  /** IVF top-k with the same queries/k as the s01 brute-force baseline, so
    * recall is directly comparable. Centroids: a FIXED deterministic
    * sample of 32 (md5-ranked TakeOrdered — bounded at any table size,
    * unlike a modulus filter whose centroid count grows with N) refined
    * by one Lloyd pass; nprobe=12 gives recall 0.80 vs s01 on this
    * near-uniform synthetic corpus (0.60 before the Lloyd pass — and on
    * genuinely clustered data the refined centroids recover the cluster
    * structure, see SimilaritySpec's 10-cluster recall pin).
    */
  private def s03(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopKFixedK(emb(s, dir), "vec_id", "embedding",
      numCentroids = 32, col("vec_id") < 3, nprobe = 12, k = 10,
      lloydIters = 1)

  /** LSH-probed ANN top-k with s01's queries/k for direct recall
    * comparison. Search wants much narrower bands than dedup: a probe's
    * candidate cost is per-QUERY linear (nBands·N/2^bits), so 4 bands ×
    * 3 bits probes ~45% of this near-uniform corpus for recall 0.77 —
    * versus d07's 8-bit bands whose collisions are calibrated for the
    * cosine ≥ 0.4 near-dup threshold, not top-k of near-orthogonal
    * vectors. Clustered production embeddings reach the same recall at a
    * far smaller probed fraction.
    */
  private def s04(s: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(emb(s, dir), "vec_id", "embedding",
      col("vec_id") < 3, nPlanes = 12, bandSize = 3, dims = 64, k = 10)

  /** The product-quantization path's EXACT twin under the oracle gate
    * (the x02 move): with an exhaustive shortlist (`rerank` larger than
    * the table) the ADC pass keeps every candidate and the refine stage
    * exact-re-ranks them all, so the output IS exact L2 top-k — which
    * DuckDB states directly — while the query still drives the full PQ
    * machinery end to end (codebook training, encoding, ADC tables,
    * shortlist, refine join). Approximation QUALITY at bounded rerank
    * is spec-gated (SimilaritySpec recall ≥ 0.9), the same split as
    * x01 (sketch, rows-only) vs x02 (exact twin, hash-matched).
    */
  private def s05(s: SparkSession, dir: String): DataFrame =
    Similarity.pqTopK(emb(s, dir), "vec_id", "embedding",
      numSub = 8, codebookBits = 4, col("vec_id") < 3, k = 10,
      rerank = 1000000)

  /** The BARE-ADC ranking under the oracle gate — the part of PQ users
    * actually run at scale, closing the r7 split where only the refine
    * composition (s05) was hash-checked: with `lloydIters = 0` the
    * codebooks ARE the md5-deterministic seed sample and every encode
    * argmin and ADC sum is a fixed-order float fold, so DuckDB replays
    * seed → books → encode → per-query tables → ascending-subspace sum
    * bit-for-bit (the d09 derived-corpus move applied to ANN). Lloyd
    * REFINEMENT quality stays spec-gated (SimilaritySpec recall) —
    * cross-engine float reduction order still defies pinning there.
    */
  private def s06(s: SparkSession, dir: String): DataFrame =
    Similarity.pqTopK(emb(s, dir), "vec_id", "embedding",
      numSub = 8, codebookBits = 4, col("vec_id") < 3, k = 10,
      lloydIters = 0, rerank = 0)

  /** The composed filter funnel over a duplicate-injected derived
    * corpus (the shipped table is 100% fingerprint-distinct, so — the
    * d09 move — docs with `doc_id % 11 == 7` take the text of
    * `doc_id − 7`, manufacturing exact-dup groups the stage-3 gate must
    * catch AMONG stage-1/2 survivors). Stage thresholds chosen so every
    * funnel stage drops a non-empty set at sf0.01: en-only, quality
    * ≥ 0.42, per-source cap 12, margin > 0 under a −8.5 bias (the
    * corpus's median margin under this salt, so the classifier's
    * verdict actually splits its entrants).
    */
  private def p01(s: SparkSession, dir: String): DataFrame = {
    val d0 = docs(s, dir)
    val src = d0.select(col("doc_id").as("_sid"), col("text").as("_stext"))
    val derived = d0.join(src, d0("doc_id") - 7 === col("_sid"), "left")
      .select(d0("doc_id"),
        when(d0("doc_id") % 11 === 7 && col("_stext").isNotNull,
          col("_stext")).otherwise(d0("text")).as("text"),
        d0("source"))
    Funnel.verdicts(derived, col("text"), col("doc_id"), col("source"),
      keepLang = "en", qualityMin = 0.42, cap = 12, salt = "p1",
      clsBias = -8.5)
  }

  /** The production EXPORT GATE composed over the PERSISTED indexes —
    * the serving twin of [[p01]]'s from-scratch funnel: live docs that
    * are (a) their near-dup component's surviving canonical, served
    * from the persisted [[graft.sources.CcIndex]] assignment the
    * incremental [[graft.sources.DedupFlow]] maintains (d16's lake);
    * (b) SemDeDup keeps, served from the persisted
    * [[graft.sources.SemDedupIndex]] verdicts (d17's lake); and
    * (c) quality/PII-gated per row. The plan is one narrow corpus scan
    * + two index scans + two `doc_id` joins — NO re-shingling,
    * re-clustering, or embedding re-compare at export time: the
    * expensive stages are amortized in the indexes, which is the whole
    * point of maintaining them. (This corpus ships PII-free, so the
    * PII gate drops nothing here; FunnelSpec pins the bite on an
    * injected corpus.) The oracle recomputes both verdicts from
    * scratch, so the row also re-proves index ≡ one-shot.
    */
  private def p02(s: SparkSession, dir: String): DataFrame = {
    val ddl = dedupFlowLake(s, dir)
    val surv = graft.sources.DedupFlow.survivors(s, ddl, "docs_src", ddl)
      .select(col("doc_id"), col("component_id"))
    val keeps = graft.sources.SemDedupIndex
      .verdicts(s, semIndexLake(s, dir), "sem")
      .where(col("kept"))
      .select(col("vec_id").as("doc_id"), col("cluster_id"))
    docs(s, dir)
      .select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality_score"),
        TextAnalysis.piiEmailCount(col("text")).as("_ne"),
        TextAnalysis.piiIpCount(col("text")).as("_ni"))
      .where(col("quality_score") >= 0.42 &&
        col("_ne") === 0 && col("_ni") === 0)
      .join(surv, Seq("doc_id"))
      .join(keeps, Seq("doc_id"))
      .select(col("doc_id"), col("component_id"), col("cluster_id"),
        col("quality_score"))
  }

  /** LM-GATED export — the t20 composition: quality/PII-gated docs
    * intersected with the bigram-LM surprise gate, the surprise SERVED
    * from the persisted [[graft.sources.LmIndex]]
    * ([[AzofQueries.lmLake]]'s twice-refreshed stats — never a
    * retrain at export time). The oracle retrains the LM from scratch
    * and applies the identical cutoffs, so the composition re-proves
    * index-served ≡ retrain inside a multi-signal gate. One corpus
    * scan for the doc-side signals + one for the LM pairs + the
    * vocabulary-bounded stats read.
    */
  private def p07(s: SparkSession, dir: String): DataFrame = {
    val lake = AzofQueries.lmLake(s, dir)
    val scores = graft.sources.LmIndex
      .score(s, lake, "docs_lm", "text", lake, "lm_stats")
      .select(col("doc_id").cast("long").as("doc_id"), col("avg_surprise"))
      .where(col("avg_surprise") <= 4.5)
    docs(s, dir)
      .select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality_score"),
        TextAnalysis.piiEmailCount(col("text")).as("_ne"),
        TextAnalysis.piiIpCount(col("text")).as("_ni"))
      .where(col("quality_score") >= 0.42 &&
        col("_ne") === 0 && col("_ni") === 0)
      .join(scores, Seq("doc_id"))
      .select(col("doc_id"), col("quality_score"), col("avg_surprise"))
  }

  /** Containment-gated export over the quote-injected derived corpus —
    * what a pipeline DOES with the d21 verdicts: quality-gated live
    * docs minus the CONTAINED side of every persisted containment pair
    * (cont_a ≥ 0.9 ⇒ doc_a is the excerpt, drop it and keep the
    * container; mutual containment ⇒ keep the smaller id, the dedup
    * convention). Served from the persisted [[graft.sources
    * .ContainIndex]] (the [[containLake]] fixture) + ONE corpus scan —
    * no re-shingling at export time. The oracle recomputes the
    * containment pairs one-shot (the d20/d21 SQL as a CTE) and applies
    * the same drop rule + the quality formula, re-proving
    * index-served gating ≡ one-shot end to end.
    */
  private def p04(s: SparkSession, dir: String): DataFrame = {
    val t = 0.9
    val pairs = graft.sources.ContainIndex.pairs(
      s, containLake(s, dir), "contain_pairs")
    val drops = pairs.select(
      when(col("cont_a") >= t && col("cont_b") >= t, col("doc_b"))
        .when(col("cont_a") >= t, col("doc_a"))
        .otherwise(col("doc_b")).as("doc_id"))
      .distinct()
    d20Derived(s, dir)
      .select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality_score"))
      .where(col("quality_score") >= 0.42)
      .join(drops, Seq("doc_id"), "left_anti")
  }

  /** Two-crawl-batch [[graft.sources.ShardMap]] lake over the raw
    * documents table: epoch 1 = `doc_id % 3 != 0` (Jan 15), epoch 2 =
    * the holdout (Feb 15) — each refreshed into the persisted shard
    * map — then doc 7 tombstone-deleted (Mar) with a final refresh
    * proving deletes mint nothing.
    */
  private[queries] def shardLake(s: SparkSession, dir: String): String =
    AzofQueries.cachedLake(dir, "shardmap-v1", "shard_map") { l =>
      import graft.format.{ColumnDef, ColumnType, TableSchema}
      import graft.sources.{AzofWriter, ShardMap}
      import java.time.Instant
      val srcSchema = graft.format.TableSchema(Seq(
        ColumnDef("text", ColumnType.AzString, nullable = true)))
      AzofWriter.createTable(s, l, "docs_src", srcSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      ShardMap.create(s, l, shardSize = 64L, salt = "p5")
      val src = docs(s, dir)
      def batch(holdout: Boolean, at: String) =
        src.where((col("doc_id") % 3 === 0) === holdout)
          .select(col("doc_id").cast("string").as(TableSchema.KeyName),
            lit(java.sql.Timestamp.from(Instant.parse(at)))
              .as(TableSchema.EventTimeName),
            col("text"))
      AzofWriter.commitBase(s, l, "docs_src",
        batch(holdout = false, "2024-01-15T00:00:00Z"))
      ShardMap.refresh(s, l, "docs_src", l,
        at = Instant.parse("2024-02-01T00:00:00Z"))
      AzofWriter.commitDelta(s, l, "docs_src",
        batch(holdout = true, "2024-02-15T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))
      ShardMap.refresh(s, l, "docs_src", l,
        at = Instant.parse("2024-03-01T00:00:00Z"))
      AzofWriter.commitDelete(s, l, "docs_src", Seq("7"),
        Instant.parse("2024-03-15T00:00:00Z"))
      ShardMap.refresh(s, l, "docs_src", l,
        at = Instant.parse("2024-04-01T00:00:00Z"))
      ()
    }

  /** The INCREMENTAL export membership, served live: the persisted
    * shard map joined against the live corpus. The oracle replays both
    * epochs with window ranks — epoch 2 offset by epoch 1's count, the
    * epoch-1 permutation identical to the one-shot t14 formula — and
    * drops the deleted doc, so a mint that moved ANY epoch-1 slot (or
    * wrote anything on delete) cannot hash-match.
    */
  private def p05(s: SparkSession, dir: String): DataFrame = {
    val l = shardLake(s, dir)
    graft.sources.ShardMap.liveAssignment(s, l, "docs_src", l, "shard_map")
      .select(
        col(graft.format.TableSchema.KeyName).cast("long").as("doc_id"),
        col("shuffle_rank"), col("shard_id"), col("shard_pos"))
  }

  /** [[shardLake]]'s token-granular twin for [[graft.sources.SeqMap]]:
    * same two batches + the doc-7 delete, refreshed into the
    * persisted sequence map (budget 256, salt `p6`).
    */
  private[queries] def seqLake(s: SparkSession, dir: String): String =
    AzofQueries.cachedLake(dir, "seqmap-v1", "seq_map") { l =>
      import graft.format.{ColumnDef, ColumnType, TableSchema}
      import graft.sources.{AzofWriter, SeqMap}
      import java.time.Instant
      val srcSchema = graft.format.TableSchema(Seq(
        ColumnDef("text", ColumnType.AzString, nullable = true)))
      AzofWriter.createTable(s, l, "docs_src", srcSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      SeqMap.create(s, l, budget = 256L, salt = "p6")
      val src = docs(s, dir)
      def batch(holdout: Boolean, at: String) =
        src.where((col("doc_id") % 3 === 0) === holdout)
          .select(col("doc_id").cast("string").as(TableSchema.KeyName),
            lit(java.sql.Timestamp.from(Instant.parse(at)))
              .as(TableSchema.EventTimeName),
            col("text"))
      AzofWriter.commitBase(s, l, "docs_src",
        batch(holdout = false, "2024-01-15T00:00:00Z"))
      SeqMap.refresh(s, l, "docs_src", "text", l,
        at = Instant.parse("2024-02-01T00:00:00Z"))
      AzofWriter.commitDelta(s, l, "docs_src",
        batch(holdout = true, "2024-02-15T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))
      SeqMap.refresh(s, l, "docs_src", "text", l,
        at = Instant.parse("2024-03-01T00:00:00Z"))
      AzofWriter.commitDelete(s, l, "docs_src", Seq("7"),
        Instant.parse("2024-03-15T00:00:00Z"))
      SeqMap.refresh(s, l, "docs_src", "text", l,
        at = Instant.parse("2024-04-01T00:00:00Z"))
      ()
    }

  /** The incremental PACKING assignment, served live: p05's
    * token-granular twin. The oracle replays both epochs as weighted
    * exclusive prefix sums (epoch 2 offset by epoch 1's total tokens;
    * epoch 1 identical to the one-shot t12 formula) minus the deleted
    * doc — whose tokens still occupy their frozen span, so an engine
    * that reclaimed them would shift every epoch-2 offset and break
    * the hash.
    */
  private def p06(s: SparkSession, dir: String): DataFrame = {
    val l = seqLake(s, dir)
    graft.sources.SeqMap.liveAssignment(s, l, "docs_src", l, "seq_map")
      .select(
        col(graft.format.TableSchema.KeyName).cast("long").as("doc_id"),
        col("n_tokens"), col("tok_offset"),
        col("start_seq"), col("end_seq"), col("n_seqs"))
  }

  /** The pipeline's END PRODUCT: training sequences packed from the
    * index-served export gate ([[p02]]) and dealt into fixed-size
    * shards — gate ∘ pack ∘ shard in ONE query, every expensive verdict
    * served from the persisted indexes. The sequence text rides out as
    * its md5 (what the gate certifies is the packing, not megabytes of
    * concatenated text). The oracle recomputes the gate one-shot
    * (d16's fixpoint + d17's replay) and replays the t15 emit formulas
    * over the gated set — so this row hash-checks the whole
    * gate → pack → shard composition end to end.
    */
  private def p03(s: SparkSession, dir: String): DataFrame = {
    val corpus = docs(s, dir)
      .join(p02(s, dir).select("doc_id"), Seq("doc_id"))
    Packing.emitSequences(corpus, col("text"), col("doc_id"),
      budget = 256L, salt = "p3")
      .select(col("seq_id"), md5(col("seq_text")).as("seq_md5"),
        col("n_tokens"),
        expr("seq_id div 16L").as("shard_id"),
        pmod(col("seq_id"), lit(16L)).as("shard_pos"))
  }

  /** SemDeDup over the embedding corpus: 16 deterministic seed
    * centroids (k scales with N in production — the paper's 50k on
    * LAION-440M), cosine 0.4 within-cluster pruning, min-id survivor.
    * The oracle replays seed → L2 assignment → triangular cosine
    * verdict bit-for-bit (the s06 move).
    */
  private def d14(s: SparkSession, dir: String): DataFrame =
    Dedup.semDedup(emb(s, dir), "vec_id", "embedding", k = 16,
      threshold = 0.4)

  private def t01(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenStats(docs(s, dir), col("text"), col("doc_id"))

  private def t02(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.quality(docs(s, dir), col("text"), col("doc_id"))

  private def t03(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.langId(docs(s, dir), col("text"), col("doc_id"))

  private def t04(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"))

  /** Order-sensitive rolling-hash fingerprints: whole document plus the
    * first-16-token prefix (the chunk-fingerprint building block).
    */
  private def t05(s: SparkSession, dir: String): DataFrame = {
    val ws = TextAnalysis.words(col("text"))
    docs(s, dir).select(col("doc_id"),
      TextAnalysis.rollingFingerprint(ws).as("rh"),
      TextAnalysis.rollingFingerprint(slice(ws, 1, 16)).as("rh_prefix"))
  }

  private def t06(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.piiScrub(docs(s, dir), col("text"), col("doc_id"))

  private def t07(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetition(docs(s, dir), col("text"), col("doc_id"))

  private def t08(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.splitAssign(docs(s, dir), col("doc_id"))

  private def t09(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lengthHistogram(docs(s, dir), col("text"),
      width = 25, nBuckets = 10)

  /** Stratified subsample: synthetic strata from doc_id mod 4, rates
    * chosen exactly representable in binary so both engines' double
    * arithmetic lands on the same integer cutoffs.
    */
  private def t10(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.stratifiedSample(docs(s, dir), col("doc_id"),
      pmod(col("doc_id"), lit(4)).cast("string"),
      rates = Map("0" -> 1.0, "1" -> 0.5, "2" -> 0.25),
      defaultRate = 0.125, salt = "r3")

  /** Per-source hard cap (the C4-style domain cap): at most 10 docs
    * per source, survivors picked by the portable salted-md5 order so
    * the DuckDB oracle selects the identical set.
    */
  private def t11(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.sourceCap(docs(s, dir), col("doc_id"), col("source"),
      cap = 10, salt = "r7")

  /** Concat-and-chunk sequence packing: 256-token training sequences
    * over the salted-hash global order, via the distributed prefix sum
    * (never a single-partition window — [[Packing.prefixSum]]).
    */
  private def t12(s: SparkSession, dir: String): DataFrame =
    Packing.packSequences(docs(s, dir), col("text"), col("doc_id"),
      budget = 256L, salt = "r9")

  /** Temperature source mixing (α = 0.5) on a manufactured skewed
    * source class (the shipped `source` column is uniform — 25 docs
    * each — so the real column would make every rate 1.0 and gate
    * nothing): web 60% / books 30% / wiki 10% by doc_id mod 10, giving
    * cutoffs sqrt(1/6), sqrt(1/3), 1.0.
    */
  private def t13(s: SparkSession, dir: String): DataFrame = {
    val cls = when(pmod(col("doc_id"), lit(10)) < 6, "web")
      .when(pmod(col("doc_id"), lit(10)) < 9, "books")
      .otherwise("wiki")
    TextAnalysis.sourceMix(docs(s, dir), col("doc_id"), cls, salt = "r9")
  }

  /** Deterministic global shuffle + 64-doc shard assignment. */
  private def t14(s: SparkSession, dir: String): DataFrame =
    Packing.shardAssign(docs(s, dir), col("doc_id"), shardSize = 64L,
      salt = "r9")

  /** The packed sequences themselves — t12's assignment materialized,
    * docs split mid-sequence at exactly the 256-token boundaries.
    */
  private def t15(s: SparkSession, dir: String): DataFrame =
    Packing.emitSequences(docs(s, dir), col("text"), col("doc_id"),
      budget = 256L, salt = "r9")

  /** Occurrence-weighted corpus-frequency magnitude per doc (the
    * integer-portable unigram-rarity signal).
    */
  private def t16(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.rarityScore(docs(s, dir), col("text"), col("doc_id"))

  /** Hash-feature linear classifier margin (deterministic stub weights;
    * the operator shape is the fasttext-style curation filter).
    */
  private def t17(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.hashClassifier(docs(s, dir), col("text"), col("doc_id"),
      bias = 0.0, salt = "r9")

  private def t19(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lmScore(docs(s, dir), col("text"), col("doc_id"))

  /** Overlapping 64-token context windows every 48 tokens (the RAG /
    * long-context chunker): per-doc narrow kernel, zero shuffles,
    * chunk text as md5 ([[TextAnalysis.chunkWindows]]).
    */
  private def t18(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkWindows(docs(s, dir), col("text"), col("doc_id"),
      window = 64, stride = 48)

  /** Four-commit, four-times-refreshed [[graft.sources.TermIndex]] lake
    * over the documents corpus: base (⅔, Jan), delta (the rest, Feb),
    * a REVISION appending the marker term `zzrevterm` to every
    * `doc_id % 5 = 0` doc (Apr — tf upserts + vanished-term handling),
    * and a tombstone delete of docs 6 and 7 (May — full posting
    * retirement).
    */
  private[queries] def termLake(s: SparkSession, dir: String): String =
    AzofQueries.cachedLake(dir, "term-v4", "term_postings") { l =>
      import graft.format.{ColumnDef, ColumnType}
      import graft.sources.{AzofWriter, TermIndex}
      import java.time.Instant
      val schema = graft.format.TableSchema(Seq(
        ColumnDef("text", ColumnType.AzString, nullable = false)))
      val src = docs(s, dir)
      def rows(filter: org.apache.spark.sql.Column, at: String,
          txt: org.apache.spark.sql.Column = col("text")) =
        src.where(filter).select(
          col("doc_id").cast("string").as("key"),
          lit(java.sql.Timestamp.from(Instant.parse(at))).as("event_time"),
          txt.as("text"))
      AzofWriter.createTable(s, l, "docs_term", schema,
        Instant.parse("2024-01-01T00:00:00Z"))
      val ck = new java.io.File(l, "_term_ck").toString
      def refresh(): Unit = {
        val q = TermIndex.refresh(s, l, "docs_term", "text", l,
          "term_postings", ck)
        if (!q.awaitTermination(300000))
          throw new IllegalStateException(
            "term-postings refresh did not terminate within 300s")
      }
      AzofWriter.commitBase(s, l, "docs_term",
        rows(col("doc_id") % 3 =!= 0, "2024-01-02T00:00:00Z"))       // v2
      refresh()
      AzofWriter.commitDelta(s, l, "docs_term",
        rows(col("doc_id") % 3 === 0, "2024-02-05T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))                       // v3
      refresh()
      AzofWriter.commitDelta(s, l, "docs_term",
        rows(col("doc_id") % 5 === 0, "2024-04-05T00:00:00Z",
          txt = concat(col("text"), lit(" zzrevterm"))),
        Instant.parse("2024-04-01T00:00:00Z"),
        Instant.parse("2024-05-01T00:00:00Z"))                       // v4
      refresh()
      AzofWriter.commitDelete(s, l, "docs_term", Seq("6", "7"),
        Instant.parse("2024-05-05T00:00:00Z"))                       // v5
      refresh()
      // production posting maintenance: a BY-KEY fold re-clusters the
      // postings into disjoint key slices, so each query term's
      // key-range read FILE-SKIPS to its slice instead of scanning
      // every delta (view-preserving — the oracles are unchanged)
      AzofWriter.compact(s, l, "term_postings",
        Instant.parse("2024-06-01T00:00:00Z"), numFiles = 8,
        byKey = true)
      ()
    }

  /** AND search served from the persisted inverted index: documents
    * containing BOTH terms, with exact summed term frequencies. The
    * oracle re-tokenizes the reconstructed live corpus — a posting the
    * refresh dropped, double-counted, or failed to retire on the
    * delete/revision churn cannot hash-match.
    */
  private def t21(s: SparkSession, dir: String): DataFrame = {
    val l = termLake(s, dir)
    graft.sources.TermIndex.search(s, l, "term_postings",
      Seq("window", "dup"), requireAll = true)
  }

  /** OR search over the REVISION-minted marker term plus a corpus
    * term — proves the revision's postings landed and the deleted
    * docs' postings retired, with tf as the ranking evidence.
    */
  private def t22(s: SparkSession, dir: String): DataFrame = {
    val l = termLake(s, dir)
    graft.sources.TermIndex.search(s, l, "term_postings",
      Seq("zzrevterm", "dup"), requireAll = false)
  }

  /** Relevance-RANKED search: tf·idf in exact integer bit-magnitude
    * space (the t19 reasoning — floats hash-differ on summation order,
    * `length(bin(x))` is engine-exact), idf weights counted FROM the
    * postings. The live doc count comes from one source count here; a
    * production deployment serves it from a count [[graft.sources
    * .MatView]] so ranking stays corpus-scan-free end to end.
    */
  private def t23(s: SparkSession, dir: String): DataFrame = {
    val l = termLake(s, dir)
    val n = graft.operators.AzofScan.scan(s, l, "docs_term",
      projection = Some(Set(graft.format.TableSchema.KeyName))).count()
    graft.sources.TermIndex.searchRanked(s, l, "term_postings",
      Seq("window", "dup", "zzrevterm"), n)
  }

  /** PHRASE search served from the POSITIONAL postings: documents
    * where the three terms appear consecutively, with the exact
    * occurrence count — the oracle re-tokenizes the reconstructed live
    * corpus with positions and self-joins adjacency, so a position the
    * refresh dropped, shifted, or failed to retire on the
    * delete/revision churn cannot hash-match.
    */
  private def t24(s: SparkSession, dir: String): DataFrame = {
    val l = termLake(s, dir)
    graft.sources.TermIndex.searchPhrase(s, l, "term_postings",
      Seq("big", "order", "scan"))
  }

  /** PREFIX term search: one contiguous `KeyFilter.Range` posting read
    * (the `term ⊕ doc` key layout makes every prefix one key range) —
    * never a term enumeration or corpus scan.
    */
  private def t25(s: SparkSession, dir: String): DataFrame = {
    val l = termLake(s, dir)
    graft.sources.TermIndex.searchPrefix(s, l, "term_postings", "s")
  }

  /** PROXIMITY (NEAR) search: documents where the two terms occur
    * within 5 token positions, with pair count + min distance as
    * ranking evidence — two key-range posting reads, pair arithmetic
    * over tf-bounded decoded position arrays.
    */
  private def t26(s: SparkSession, dir: String): DataFrame = {
    val l = termLake(s, dir)
    graft.sources.TermIndex.searchNear(s, l, "term_postings",
      "window", "dup", maxDist = 5)
  }

  /** BM25-ranked search (AND): tf-saturated, length-normalized scoring
    * with integer bit-magnitude idf, served index-only — posting reads
    * per term, doc lengths from the incrementally-maintained `__dl`
    * table, corpus stats from the ONE-ROW `__st` table (N and total
    * length exact under the fixture's revision/delete churn). The
    * score's rational form evaluates in a fixed operand order so the
    * double hash-matches the DuckDB reconstruction bit-for-bit.
    */
  private def t27(s: SparkSession, dir: String): DataFrame = {
    val l = termLake(s, dir)
    graft.sources.TermIndex.searchBm25(s, l, "term_postings",
      Seq("window", "dup"))
  }

  /** BM25-ranked search (OR) — the standard IR disjunctive top-k
    * shape: documents matching ANY query term, a missing term
    * contributing exactly 0.0 (tf coalesces to 0 inside the same
    * fixed-operand-order rational, so the double still hash-matches
    * the DuckDB reconstruction bit-for-bit). One of the terms is the
    * revision-minted marker, so most matches carry only one term —
    * the asymmetric case that exercises the zero leg.
    */
  private def t28(s: SparkSession, dir: String): DataFrame = {
    val l = termLake(s, dir)
    graft.sources.TermIndex.searchBm25(s, l, "term_postings",
      Seq("zzrevterm", "dup"), requireAll = false)
  }

  private def m01(s: SparkSession, dir: String): DataFrame =
    Multimodal.documentMedia(s, docs(s, dir))

  /** Every-2nd-frame sample; the binary frame slice stays inside the
    * operator (binary columns don't hash-compare across engines), the
    * byte-range coordinates are the checkable surface.
    */
  private def m02(s: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(s,
        docs(s, dir).select(col("doc_id"),
          col("text").cast("binary").as("payload")), everyN = 2)
      .toDF()
      .select("doc_id", "frame_idx", "frame_off", "frame_len")

  /** Resize to a 16×16 "thumbnail"; the resized bytes stay inside the
    * operator, the dimension/size arithmetic is the checkable surface.
    */
  private def m03(s: SparkSession, dir: String): DataFrame =
    Multimodal.resize(s,
        docs(s, dir).select(col("doc_id"),
          col("text").cast("binary").as("payload")), w = 16, h = 16)
      .toDF()
      .select("doc_id", "out_width", "out_height", "out_octets")

  /** Feature extraction to a 16-dim vector; the checkable surface is
    * four leading components plus the L2 norm (the full vector feeds the
    * ANN operators — MultimodalSpec composes it with bruteForceTopK).
    */
  private def m04(s: SparkSession, dir: String): DataFrame = {
    val feats = Multimodal.featureExtract(s,
      docs(s, dir).select(col("doc_id"),
        col("text").cast("binary").as("payload")), dims = 16)
    val fd = Similarity.asDouble(col("feature"))
    feats.select(col("doc_id"),
      element_at(fd, 1).as("f0"), element_at(fd, 2).as("f1"),
      element_at(fd, 3).as("f2"), element_at(fd, 4).as("f3"),
      Similarity.l2norm(fd).as("norm"))
  }

  // ---------------------------------------------------------------- SQL

  private val wordsSql = """string_split_regex(lower(text), '\s+')"""

  /** Shared CTE prefix: distinct word-3-gram shingles per doc. */
  private val shinglesCte =
    s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
        u AS (SELECT DISTINCT doc_id, sh FROM
          (SELECT doc_id, unnest(list_transform(range(1, len(ws)-1),
             i -> array_to_string(ws[i:i+2], ' '))) AS sh
           FROM w WHERE len(ws) >= 3)),"""

  private val minhashCtes = {
    val p = Dedup.MinhashP
    val coefs = Dedup.minhashCoefs(8)
    s"""$shinglesCte
        xh AS (SELECT doc_id,
          CAST('0x' || substr(md5(sh), 1, 14) AS BIGINT) % $p AS x
          FROM u),
        mh AS (SELECT doc_id,
          ${coefs.zipWithIndex.map { case ((a, b), i) =>
            s"min((${a} * x + ${b}) % $p) AS h$i" }.mkString(", ")}
          FROM xh GROUP BY doc_id),"""
  } +
    s"""
        b AS (SELECT doc_id, ${(0 until 4).map(i =>
            s"h${2 * i}||'|'||h${2 * i + 1} AS b$i").mkString(", ")},
          ${(0 until 4).map(i =>
            s"""ROW_NUMBER() OVER (PARTITION BY h${2 * i}||'|'||h${2 * i + 1}
                ORDER BY doc_id) AS rn$i""").mkString(", ")} FROM mh),
        cand AS (SELECT DISTINCT doc_a, doc_b FROM (${(0 until 4).map(i =>
            s"""SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
                FROM b a JOIN b c ON a.b$i = c.b$i AND a.doc_id < c.doc_id
                WHERE a.rn$i <= ${Dedup.DefaultBucketCap}
                  AND c.rn$i <= ${Dedup.DefaultBucketCap}""")
          .mkString(" UNION ALL ")}))"""
          // explicit DISTINCT wrapper, not bare UNION dedup: DuckDB
          // 1.0 stops deduplicating a UNION inside a WITH RECURSIVE
          // chain (observed at sf0.1 — duplicated cand rows double
          // n_inter, identical docs divide by zero, and their pair
          // silently drops from the d11 fixpoint)

  private val fingerprintSql =
    """md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))"""

  /** Shared CTE chain for d11/d13: the d03 pair query (inlined,
    * thresholded at Jaccard ≥ 0.5) feeding a recursive min-label
    * fixpoint — `reach` = transitive closure over the symmetrized
    * edges; `min(dst) GROUP BY src` yields the component labels.
    */
  private lazy val componentCtes =
    s"""${minhashCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
        sizes AS (SELECT doc_id, count(*) AS n FROM u GROUP BY doc_id),
        inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
                  FROM cand c
                  JOIN u ua ON ua.doc_id = c.doc_a
                  JOIN u ub ON ub.doc_id = c.doc_b AND ua.sh = ub.sh
                  GROUP BY c.doc_a, c.doc_b),
        pairs AS (SELECT c.doc_a, c.doc_b FROM cand c
                  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
                  JOIN sizes sa ON sa.doc_id = c.doc_a
                  JOIN sizes sb ON sb.doc_id = c.doc_b
                  WHERE CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
                        / (sa.n + sb.n - COALESCE(i.n_inter, 0)) >= 0.5),
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        reach AS (SELECT src, src AS dst FROM edges
                  UNION
                  SELECT r.src, e.dst FROM reach r
                  JOIN edges e ON r.dst = e.src)"""

  /** Shared CTE chain (no `WITH` prefix, composable) replaying the
    * frozen-model SemDeDup pass bit-for-bit: deterministic md5-ranked
    * seeds → L2 argmin assignment (ties to the lower centroid index) →
    * triangular within-cluster cosine verdict. Ends in
    * `asg(vec_id, c)` + `drp(vec_id)` (kept ⟺ not in `drp`). Used by
    * the d14/d17 oracles and composed into p02's export gate.
    */
  private lazy val semCtes =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
          seed AS (SELECT c, v FROM (
              SELECT v, ROW_NUMBER() OVER (
                  ORDER BY md5('sem#' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS c
              FROM e) WHERE c < 16),
          asgd AS (SELECT e.vec_id, s.c,
                     list_sum(list_transform(list_zip(e.v, s.v),
                       x -> (x[1]-x[2])*(x[1]-x[2]))) AS d
                   FROM e CROSS JOIN seed s),
          asg AS (SELECT vec_id, c FROM (
              SELECT vec_id, c, ROW_NUMBER() OVER (
                  PARTITION BY vec_id ORDER BY d ASC, c) AS rn
              FROM asgd) WHERE rn = 1),
          drp AS (SELECT DISTINCT bb.vec_id AS vec_id
                  FROM asg aa
                  JOIN asg bb ON aa.c = bb.c AND aa.vec_id < bb.vec_id
                  JOIN embeddings a ON a.vec_id = aa.vec_id
                  JOIN embeddings b ON b.vec_id = bb.vec_id
                  WHERE ${cosSql("a", "b")} >= 0.4)"""

  private def cosSql(a: String, b: String): String =
    s"""list_dot_product(CAST($a.embedding AS DOUBLE[]), CAST($b.embedding AS DOUBLE[]))
        / (sqrt(list_dot_product(CAST($a.embedding AS DOUBLE[]), CAST($a.embedding AS DOUBLE[])))
         * sqrt(list_dot_product(CAST($b.embedding AS DOUBLE[]), CAST($b.embedding AS DOUBLE[]))))"""

  /** The one-shot recomputation of p02's index-served export gate,
    * ending in `gate(doc_id, component_id, cluster_id, quality_score)`:
    * [[componentCtes]] (d16's survivor fixpoint) + [[semCtes]] (d17's
    * frozen-model replay) + the t02 quality score + the t06 PII audit
    * counts, intersected. Shared by the p02 and p03 oracles.
    */
  /** The from-scratch bigram-LM retrain ending in
    * `lmsc(doc_id, n_bigrams, sum_surprise, avg_surprise)` — the t19
    * oracle's body, reused by p07's composed gate (the index-served ≡
    * retrain equivalence is the t20/LmIndexSpec job; an oracle may
    * always retrain).
    */
  private lazy val lmScoreCtes: String =
    s"""lmtoks AS (SELECT doc_id, $wordsSql AS w FROM documents),
        lmbgl AS (SELECT doc_id, w[i] || ' ' || w[i + 1] AS bg
          FROM (SELECT doc_id, w,
                  unnest(generate_series(1, len(w) - 1)) AS i
                FROM lmtoks WHERE len(w) >= 2)),
        lmpairs AS (SELECT doc_id, bg, count(*) AS n_occ
          FROM lmbgl GROUP BY doc_id, bg),
        lmgbl AS (SELECT bg, sum(n_occ) AS c_bg FROM lmpairs GROUP BY bg),
        lmctx AS (SELECT split_part(bg, ' ', 1) AS w1, sum(c_bg) AS c_ctx
          FROM lmgbl GROUP BY w1),
        lmv AS (SELECT count(*) AS vsz FROM lmctx),
        lmsc AS (SELECT doc_id,
            CAST(sum(n_occ) AS BIGINT) AS n_bigrams,
            CAST(sum(n_occ * (length(bin(c_ctx + vsz))
                              - length(bin(c_bg + 1)))) AS BIGINT)
              AS sum_surprise,
            CAST(sum(n_occ * (length(bin(c_ctx + vsz))
                              - length(bin(c_bg + 1)))) AS DOUBLE)
              / CAST(sum(n_occ) AS BIGINT) AS avg_surprise
          FROM lmpairs
          JOIN lmgbl USING (bg)
          JOIN lmctx ON split_part(bg, ' ', 1) = w1
          CROSS JOIN lmv
          GROUP BY doc_id)"""

  /** `q(doc_id, quality_score)` + `pii(doc_id, n_emails, n_ips)` — the
    * doc-side gate fragments shared by the export gates (p02/p03) and
    * the LM-gated export (p07).
    */
  private lazy val qualityPiiCtes: String = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val url = "https?://[^\\s]+"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    s"""q AS (SELECT doc_id,
                LEAST(CAST(sum_word_len AS DOUBLE) / n_words / 10.0, 1.0) * 0.5
                  + CAST(n_stopwords AS DOUBLE) / n_words * 0.3
                  + (1.0 - CAST(n_digits AS DOUBLE) / n_chars_m) * 0.2
                  AS quality_score
              FROM (SELECT doc_id,
                      CAST(len(ws) AS BIGINT) AS n_words,
                      CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS sum_word_len,
                      CAST(len(list_intersect(ws, $stopListSql)) AS BIGINT) AS n_stopwords,
                      CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits,
                      CAST(length(text) AS BIGINT) AS n_chars_m
                    FROM (SELECT doc_id, text, $wordsSql AS ws
                          FROM documents))),
        pii AS (SELECT doc_id,
                  len(regexp_extract_all(t1, '$email')) AS n_emails,
                  len(regexp_extract_all(
                    regexp_replace(t1, '$email', '<EMAIL>', 'g'), '$ip'))
                    AS n_ips
                FROM (SELECT doc_id,
                        regexp_replace(text, '$url', '<URL>', 'g') AS t1
                      FROM documents))"""
  }

  private lazy val exportGateCtes: String = {
    s"""$componentCtes,
        comp AS (SELECT src AS doc_id, min(dst) AS component_id
                 FROM reach GROUP BY src),
        $semCtes,
        $qualityPiiCtes,
        gate AS (SELECT d.doc_id, c.component_id,
                 CAST(asg.c AS BIGINT) AS cluster_id, q.quality_score
          FROM documents d
          LEFT JOIN comp c ON c.doc_id = d.doc_id
          JOIN asg ON asg.vec_id = d.doc_id
          LEFT JOIN drp ON drp.vec_id = d.doc_id
          JOIN q ON q.doc_id = d.doc_id
          JOIN pii ON pii.doc_id = d.doc_id
          WHERE (c.component_id IS NULL OR c.component_id = d.doc_id)
            AND drp.vec_id IS NULL
            AND q.quality_score >= 0.42
            AND pii.n_emails = 0 AND pii.n_ips = 0)"""
  }

  private def simhashTermSql(b: Int): String = Dedup.simhashTermSql(b)

  /** Shared CTE chain ending in `sig(doc_id, simhash)` — the SQL twin of
    * [[Dedup.simhashBits]] at the given width.
    */
  private def simhashCtes(bits: Int) = {
    val nWords = (bits + 31) / 32
    s"""WITH t AS (SELECT DISTINCT doc_id, w FROM
          (SELECT doc_id, unnest($wordsSql) AS w FROM documents)),
        th AS (SELECT doc_id, ${(0 until nWords).map(w =>
          s"CAST('0x' || substr(md5(w), ${w * 8 + 1}, 8) AS BIGINT) AS h$w")
          .mkString(", ")} FROM t),
        a AS (SELECT doc_id,
          ${(0 until bits).map(b => s"SUM(${simhashTermSql(b)}) AS s$b").mkString(", ")}
          FROM th GROUP BY doc_id),
        sig AS (SELECT doc_id, ${(0 until bits).map(b =>
          s"(CASE WHEN s$b > 0 THEN '1' ELSE '0' END)").mkString(" || ")} AS simhash
          FROM a)"""
  }

  /** Sign-LSH plane direction list for plane p, as DuckDB SQL — must
    * reproduce [[Similarity.planeDirections]] exactly.
    */
  private def planeSql(p: Int): String =
    s"""list_transform(range(0, 64), j -> CASE WHEN
        instr('0123456789abcdef',
          substr(md5('plane#$p#' || CAST(j // 32 AS VARCHAR)), CAST(j % 32 AS INT) + 1, 1)) - 1 < 8
        THEN -1.0 ELSE 1.0 END)"""

  private def stopListSql: String =
    TextAnalysis.langMarkers.flatMap(_._2).distinct
      .map(w => s"'$w'").mkString("[", ",", "]")

  private def markerListSql(lang: String): String =
    TextAnalysis.langMarkers.toMap.apply(lang).map(w => s"'$w'")
      .mkString("[", ",", "]")

  def oracleSql: Map[String, String] = Map(
    "d01_dedup_exact" ->
      s"""SELECT doc_id, canonical_id, dup_count, doc_id <> canonical_id AS is_dup
          FROM (SELECT doc_id,
                  min(doc_id) OVER (PARTITION BY fp) AS canonical_id,
                  count(*) OVER (PARTITION BY fp) AS dup_count
                FROM (SELECT doc_id, $fingerprintSql AS fp FROM documents))""",
    "d02_minhash_lsh" ->
      s"""$minhashCtes SELECT doc_a, doc_b FROM cand""",
    "d03_ngram_jaccard" ->
      s"""$minhashCtes,
          sizes AS (SELECT doc_id, count(*) AS n FROM u GROUP BY doc_id),
          inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
                    FROM cand c
                    JOIN u ua ON ua.doc_id = c.doc_a
                    JOIN u ub ON ub.doc_id = c.doc_b AND ua.sh = ub.sh
                    GROUP BY c.doc_a, c.doc_b)
          SELECT c.doc_a, c.doc_b,
            CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
              / (sa.n + sb.n - COALESCE(i.n_inter, 0)) AS jaccard
          FROM cand c
          LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
          JOIN sizes sa ON sa.doc_id = c.doc_a
          JOIN sizes sb ON sb.doc_id = c.doc_b""",
    "d04_simhash" ->
      s"""${simhashCtes(16)} SELECT doc_id, simhash FROM sig""",
    "d06_simhash_near_pairs" ->
      s"""${simhashCtes(64)},
          bands AS (SELECT doc_id, simhash, bidx,
                      substr(simhash, bidx * 16 + 1, 16) AS bval,
                      ROW_NUMBER() OVER (
                        PARTITION BY bidx, substr(simhash, bidx * 16 + 1, 16)
                        ORDER BY doc_id) AS rn
                    FROM sig, (SELECT unnest([0, 1, 2, 3]) AS bidx)),
          cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                   FROM bands x JOIN bands y
                     ON x.bidx = y.bidx AND x.bval = y.bval
                    AND x.doc_id < y.doc_id
                  WHERE x.rn <= ${Dedup.DefaultBucketCap}
                    AND y.rn <= ${Dedup.DefaultBucketCap})
          SELECT c.doc_a, c.doc_b,
            CAST(hamming(sx.simhash, sy.simhash) AS BIGINT) AS dist
          FROM cand c
          JOIN sig sx ON sx.doc_id = c.doc_a
          JOIN sig sy ON sy.doc_id = c.doc_b
          WHERE hamming(sx.simhash, sy.simhash) <= 3""",
    "d07_embedding_neardup_lsh" ->
      s"""WITH bk AS (SELECT vec_id, ${(0 until 32).map(p =>
            s"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ${planeSql(p)}) > 0 THEN '1' ELSE '0' END)")
            .mkString(" || ")} AS bucket
          FROM embeddings),
          bands AS (SELECT vec_id, bidx, substr(bucket, bidx * 8 + 1, 8) AS bval,
                      ROW_NUMBER() OVER (
                        PARTITION BY bidx, substr(bucket, bidx * 8 + 1, 8)
                        ORDER BY vec_id) AS rn
                    FROM bk, (SELECT unnest([0, 1, 2, 3]) AS bidx)),
          cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
                   FROM bands x JOIN bands y
                     ON x.bidx = y.bidx AND x.bval = y.bval
                    AND x.vec_id < y.vec_id
                  WHERE x.rn <= ${Dedup.DefaultBucketCap}
                    AND y.rn <= ${Dedup.DefaultBucketCap})
          SELECT c.vec_a, c.vec_b
          FROM cand c
          JOIN embeddings a ON a.vec_id = c.vec_a
          JOIN embeddings b ON b.vec_id = c.vec_b
          WHERE ${cosSql("a", "b")} >= 0.4""",
    "d05_embedding_neardup" ->
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id < b.vec_id
          WHERE ${cosSql("a", "b")} >= 0.4""",
    "s01_ann_topk" ->
      s"""SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rnk FROM
            (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY ${cosSql("q", "c")} DESC, c.vec_id) AS rn
             FROM embeddings q JOIN embeddings c
               ON q.vec_id < 3 AND q.vec_id <> c.vec_id)
          WHERE rn <= 10""",
    "x02_exact_distinct" ->
      s"""SELECT event_type, count(DISTINCT user_id) AS exact_users
          FROM events GROUP BY event_type""",
    "d08_decontaminate" ->
      s"""$shinglesCte
          f AS (SELECT sh FROM u GROUP BY sh HAVING count(*) <= 20),
          uf AS (SELECT u.doc_id, u.sh FROM u JOIN f USING (sh))
          SELECT t.doc_id AS train_id, e.doc_id AS eval_id,
                 count(*) AS n_shared
          FROM uf t JOIN uf e
            ON t.sh = e.sh AND t.doc_id % 10 <> 0 AND e.doc_id % 10 = 0
          GROUP BY 1, 2 HAVING count(*) >= 3""",
    // d09: derived corpus (boilerplate wrapped around every doc; the
    // sponsor line varies in case/whitespace so the df-count must
    // normalize), df-threshold drop, order-preserving reassembly
    "d09_line_dedup" ->
      """WITH derived AS (
           SELECT doc_id,
             'Copyright 2024 Example Corp' || chr(10) ||
             CASE WHEN doc_id % 2 = 0 THEN 'Visit Our Sponsor'
                  ELSE '  visit our sponsor  ' END || chr(10) ||
             text || chr(10) || '' || chr(10) ||
             CASE WHEN doc_id % 3 = 0 THEN 'Subscribe to our newsletter!'
                  ELSE 'unique-' || CAST(doc_id AS VARCHAR) END || chr(10) ||
             'All Rights Reserved' AS t
           FROM documents),
         lines AS (
           SELECT doc_id,
                  unnest(string_split(t, chr(10))) AS line,
                  generate_subscripts(string_split(t, chr(10)), 1) AS pos
           FROM derived),
         drops AS (
           SELECT trim(lower(line)) AS norm
           FROM lines
           WHERE length(trim(lower(line))) > 0
           GROUP BY 1
           HAVING count(DISTINCT doc_id) > 5)
         SELECT l.doc_id,
           coalesce(string_agg(l.line, chr(10) ORDER BY l.pos)
             FILTER (WHERE d.norm IS NULL), '') AS clean_text,
           count(*) FILTER (WHERE d.norm IS NULL) AS n_kept,
           count(*) FILTER (WHERE d.norm IS NOT NULL) AS n_dropped
         FROM lines l
         LEFT JOIN drops d ON trim(lower(l.line)) = d.norm
         GROUP BY l.doc_id""",
    // d11: the d03 pair query (inlined, thresholded) feeds a recursive
    // min-label fixpoint — WITH RECURSIVE reach = transitive closure
    // over the symmetrized edges, component = min reachable id
    "d11_dedup_components" ->
      s"""$componentCtes
          SELECT src AS doc_id, min(dst) AS component_id
          FROM reach GROUP BY src""",
    // d15: the persisted CcIndex, built in two incremental refreshes,
    // must equal the one-shot fixpoint over the full pair graph — the
    // oracle is d11's recursive CTE verbatim
    "d15_cc_incremental" ->
      s"""$componentCtes
          SELECT src AS doc_id, min(dst) AS component_id
          FROM reach GROUP BY src""",
    // d16: the end-to-end incrementally-ingested flow (azof source in
    // two crawl batches, MinHash index catch-up, churn-confined
    // candidates, Jaccard verify, component merges) must serve exactly
    // the one-shot keep-one verdict — d13's oracle verbatim
    "d16_dedup_ingest" ->
      s"""$componentCtes,
          comp AS (SELECT src AS doc_id, min(dst) AS component_id
                   FROM reach GROUP BY src)
          SELECT d.doc_id, c.component_id,
            c.component_id IS NOT NULL AS is_canonical
          FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
          WHERE c.component_id IS NULL OR c.component_id = d.doc_id""",
    // d18: the string-keyed flow must serve the SAME verdict as d16
    // with docs addressed by 'doc-<id>' keys and the canonical elected
    // by MIN KEY per component (lexicographic — 'doc-10' < 'doc-9', so
    // the min key is NOT 'doc-' || min(id)); connectivity is invariant
    // under the key renaming, so the oracle reuses the numeric pair
    // fixpoint and maps at the end
    "d18_dedup_ingest_strkeys" ->
      s"""$componentCtes,
          comp AS (SELECT src AS doc_id, min(dst) AS component_id
                   FROM reach GROUP BY src),
          mk AS (SELECT component_id,
                   min('doc-' || CAST(doc_id AS VARCHAR)) AS ck
                 FROM comp GROUP BY 1)
          SELECT 'doc-' || CAST(d.doc_id AS VARCHAR) AS doc_key,
            c.component_id IS NOT NULL AS is_canonical
          FROM documents d
          LEFT JOIN comp c ON c.doc_id = d.doc_id
          LEFT JOIN mk ON mk.component_id = c.component_id
          WHERE c.component_id IS NULL
             OR 'doc-' || CAST(d.doc_id AS VARCHAR) = mk.ck""",
    // d13: the keep-one verdict over d11's clusters — canonical doc per
    // component + every unclustered doc
    "d13_dedup_survivors" ->
      s"""$componentCtes,
          comp AS (SELECT src AS doc_id, min(dst) AS component_id
                   FROM reach GROUP BY src)
          SELECT d.doc_id, c.component_id,
            c.component_id IS NOT NULL AS is_canonical
          FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
          WHERE c.component_id IS NULL OR c.component_id = d.doc_id""",
    // d10: fingerprint equality ⟺ normalized-text equality, so the
    // oracle joins train to eval twins on the same md5 fingerprint
    "d10_exact_overlap" ->
      s"""WITH derived AS (
            SELECT doc_id, text, false AS is_eval FROM documents
            UNION ALL
            SELECT doc_id + 1000000, '  ' || text, true
            FROM documents WHERE doc_id % 7 = 0),
          fp AS (SELECT doc_id, $fingerprintSql AS fp, is_eval FROM derived)
          SELECT t.doc_id AS train_id, e.doc_id AS eval_id
          FROM fp t JOIN fp e ON t.fp = e.fp
          WHERE NOT t.is_eval AND e.is_eval""",
    // d12: derived corpus injects D12Span at the tail (doc_id%3==0) or
    // head (%3==1); windows = 8-token runs of the normalized stream,
    // duplicated iff in ≥2 docs, canonical home = min doc_id; tokens
    // covered by a non-canonical duplicated window drop, survivors
    // reassemble in order
    "d12_span_dedup" ->
      s"""WITH derived AS (
            SELECT doc_id,
              CASE WHEN doc_id % 3 = 0 THEN text || ' ${D12Span}'
                   WHEN doc_id % 3 = 1 THEN '${D12Span} ' || text
                   ELSE text END AS text
            FROM documents),
          w AS (SELECT doc_id, $wordsSql AS ws FROM derived),
          wins AS (SELECT doc_id,
              CAST(generate_subscripts(wl, 1) - 1 AS BIGINT) AS pos,
              unnest(wl) AS win
            FROM (SELECT doc_id,
                    list_transform(range(0, len(ws) - 7),
                      i -> array_to_string(ws[i+1:i+8], ' ')) AS wl
                  FROM w WHERE len(ws) >= 8)),
          dup AS (SELECT win, min(doc_id) AS canon FROM wins
                  GROUP BY win HAVING count(DISTINCT doc_id) >= 2),
          drops AS (SELECT w2.doc_id, w2.pos FROM wins w2
                    JOIN dup d ON w2.win = d.win AND w2.doc_id <> d.canon),
          cov AS (SELECT DISTINCT doc_id, tp FROM
                    (SELECT doc_id, unnest(range(pos, pos + 8)) AS tp
                     FROM drops)),
          toks AS (SELECT doc_id,
              CAST(generate_subscripts(ws, 1) - 1 AS BIGINT) AS tp,
              unnest(ws) AS tok
            FROM w)
          SELECT t.doc_id,
            coalesce(string_agg(t.tok, ' ' ORDER BY t.tp)
              FILTER (WHERE c.tp IS NULL), '') AS clean_text,
            count(*) FILTER (WHERE c.tp IS NULL) AS n_kept,
            count(*) FILTER (WHERE c.tp IS NOT NULL) AS n_dropped
          FROM toks t
          LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.tp = t.tp
          GROUP BY t.doc_id""",
    // t12: the packing assignment is a pure window cumsum in the oracle
    // (fine at sf scale; the ENGINE uses the two-phase distributed scan)
    "t12_seq_packing" ->
      s"""WITH d AS (SELECT doc_id,
              CAST(len($wordsSql) AS BIGINT) AS n_tokens,
              CAST('0x' || substr(md5('pack#r9#' || CAST(doc_id AS VARCHAR)), 1, 14)
                AS BIGINT) AS h
            FROM documents WHERE text IS NOT NULL),
          o AS (SELECT doc_id, n_tokens,
              CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY h, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS tok_offset
            FROM d)
          SELECT doc_id, n_tokens, tok_offset,
            tok_offset // 256 AS start_seq,
            (tok_offset + n_tokens - 1) // 256 AS end_seq,
            (tok_offset + n_tokens - 1) // 256 - tok_offset // 256 + 1
              AS n_seqs
          FROM o""",
    // t13: α=0.5 temperature mix over the manufactured source classes;
    // sqrt/divide/multiply/floor are exactly-rounded IEEE ops, so the
    // integer cutoffs match the engine bit-for-bit
    "t13_source_mix" ->
      """WITH b AS (SELECT doc_id,
              CASE WHEN doc_id % 10 < 6 THEN 'web'
                   WHEN doc_id % 10 < 9 THEN 'books'
                   ELSE 'wiki' END AS source
            FROM documents),
          c AS (SELECT source, count(*) AS n_source FROM b GROUP BY source),
          r AS (SELECT source, n_source,
              CAST(floor(sqrt(CAST((SELECT min(n_source) FROM c) AS DOUBLE)
                / CAST(n_source AS DOUBLE)) * 1000000) AS BIGINT)
                AS mix_cutoff
            FROM c)
          SELECT doc_id, source, n_source, mix_cutoff, mix_bucket FROM
            (SELECT b.doc_id, b.source, r.n_source, r.mix_cutoff,
               CAST('0x' || substr(md5('mix#r9#' || CAST(b.doc_id AS VARCHAR)), 1, 14)
                 AS BIGINT) % 1000000 AS mix_bucket
             FROM b JOIN r USING (source))
          WHERE mix_bucket < mix_cutoff""",
    // t15: t12's offset CTE feeds the token stream; global position =
    // doc offset + local position, sequence = position // budget
    "t15_seq_emit" ->
      s"""WITH d AS (SELECT doc_id, $wordsSql AS ws,
              CAST('0x' || substr(md5('pack#r9#' || CAST(doc_id AS VARCHAR)), 1, 14)
                AS BIGINT) AS h
            FROM documents WHERE text IS NOT NULL),
          o AS (SELECT doc_id, ws,
              CAST(COALESCE(SUM(CAST(len(ws) AS BIGINT)) OVER (
                ORDER BY h, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS tok_offset
            FROM d),
          toks AS (SELECT doc_id,
              tok_offset + CAST(generate_subscripts(ws, 1) - 1 AS BIGINT)
                AS tp,
              unnest(ws) AS tok
            FROM o)
          SELECT tp // 256 AS seq_id,
            string_agg(tok, ' ' ORDER BY tp) AS seq_text,
            count(*) AS n_tokens
          FROM toks GROUP BY 1""",
    // t17: left-fold in token order on both sides — float addition is
    // not associative, so the fold ORDER is the cross-engine contract
    // (list_reduce seeds with the first element; (0.0 + w1) ≡ w1)
    "t17_hash_classifier" ->
      s"""SELECT doc_id,
            CAST(len(ws) AS BIGINT) AS n_tokens,
            list_reduce(list_transform(ws,
              t -> (CAST('0x' || substr(md5('w#r9#' || t), 1, 14) AS BIGINT)
                    % 2001 - 1000) / 1000.0),
              (acc, x) -> acc + x) + 0.0 AS margin,
            list_reduce(list_transform(ws,
              t -> (CAST('0x' || substr(md5('w#r9#' || t), 1, 14) AS BIGINT)
                    % 2001 - 1000) / 1000.0),
              (acc, x) -> acc + x) + 0.0 > 0.0 AS keep
          FROM (SELECT doc_id, $wordsSql AS ws FROM documents)""",
    "t16_rarity_score" ->
      s"""WITH pairs AS (SELECT doc_id, tok, count(*) AS n_occ FROM
              (SELECT doc_id, unnest($wordsSql) AS tok FROM documents)
            GROUP BY doc_id, tok),
          vocab AS (SELECT tok,
              CAST(length(bin(sum(n_occ))) AS BIGINT) AS mag
            FROM pairs GROUP BY tok)
          SELECT doc_id,
            CAST(sum(n_occ) AS BIGINT) AS n_tokens,
            CAST(sum(n_occ * mag) AS BIGINT) AS sum_mag,
            CAST(sum(n_occ * mag) AS DOUBLE) / CAST(sum(n_occ) AS BIGINT)
              AS avg_mag
          FROM pairs JOIN vocab USING (tok)
          GROUP BY doc_id""",
    // bigram-LM surprise in INTEGER bit-magnitude space (the t16
    // reasoning: bin() is exact in both engines, a float ln + AVG would
    // hash-differ on summation order alone); docs with < 2 tokens have
    // no bigrams and are absent on both sides
    "t19_lm_score" ->
      s"""WITH $lmScoreCtes
          SELECT doc_id, n_bigrams, sum_surprise, avg_surprise
          FROM lmsc""",
    // p07: the from-scratch LM retrain composed with the q/pii gate —
    // the Spark side serves the surprise from the persisted stats
    "p07_lm_gated_export" ->
      s"""WITH $lmScoreCtes,
          $qualityPiiCtes
          SELECT d.doc_id, q.quality_score, lmsc.avg_surprise
          FROM documents d
          JOIN q USING (doc_id)
          JOIN pii USING (doc_id)
          JOIN lmsc USING (doc_id)
          WHERE q.quality_score >= 0.42
            AND pii.n_emails = 0 AND pii.n_ips = 0
            AND lmsc.avg_surprise <= 4.5""",
    // integer ceil-divide on both sides; DuckDB list slicing is
    // the term-index oracles re-tokenize the reconstructed live corpus
    // (docs 6/7 deleted; every doc_id % 5 = 0 doc carries the appended
    // marker term) with the engine's whitespace/lowercase contract
    "t21_term_search" ->
      """WITH live AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 5 = 0 THEN text || ' zzrevterm'
                       ELSE text END AS text
           FROM documents WHERE doc_id NOT IN (6, 7)),
         toks AS (
           SELECT CAST(doc_id AS VARCHAR) AS doc,
                  unnest(string_split_regex(lower(text), '\s+')) AS term
           FROM live),
         tfs AS (
           SELECT doc, term, COUNT(*) AS tf FROM toks
           WHERE term IN ('window', 'dup') GROUP BY 1, 2)
         SELECT doc, COUNT(DISTINCT term) AS n_terms,
                CAST(SUM(tf) AS BIGINT) AS sum_tf
         FROM tfs GROUP BY doc HAVING COUNT(DISTINCT term) = 2""",
    "t22_term_rank" ->
      """WITH live AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 5 = 0 THEN text || ' zzrevterm'
                       ELSE text END AS text
           FROM documents WHERE doc_id NOT IN (6, 7)),
         toks AS (
           SELECT CAST(doc_id AS VARCHAR) AS doc,
                  unnest(string_split_regex(lower(text), '\s+')) AS term
           FROM live),
         tfs AS (
           SELECT doc, term, COUNT(*) AS tf FROM toks
           WHERE term IN ('zzrevterm', 'dup') GROUP BY 1, 2)
         SELECT doc, COUNT(DISTINCT term) AS n_terms,
                CAST(SUM(tf) AS BIGINT) AS sum_tf
         FROM tfs GROUP BY doc""",
    // phrase adjacency over token positions: DuckDB zips parallel
    // unnests for (term, pos) — 1-based there, 0-based in the index,
    // but adjacency is offset-invariant
    "t24_phrase_search" ->
      """WITH live AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 5 = 0 THEN text || ' zzrevterm'
                       ELSE text END AS text
           FROM documents WHERE doc_id NOT IN (6, 7)),
         toks AS (
           SELECT doc, unnest(ws) AS term,
                  unnest(generate_series(1, len(ws))) AS pos
           FROM (SELECT CAST(doc_id AS VARCHAR) AS doc,
                        string_split_regex(lower(text), '\s+') AS ws
                 FROM live))
         SELECT a.doc, CAST(COUNT(*) AS BIGINT) AS n_hits
         FROM toks a
         JOIN toks b ON a.doc = b.doc AND b.pos = a.pos + 1
         JOIN toks c ON a.doc = c.doc AND c.pos = a.pos + 2
         WHERE a.term = 'big' AND b.term = 'order' AND c.term = 'scan'
         GROUP BY a.doc""",
    "t26_near_search" ->
      """WITH live AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 5 = 0 THEN text || ' zzrevterm'
                       ELSE text END AS text
           FROM documents WHERE doc_id NOT IN (6, 7)),
         toks AS (
           SELECT doc, unnest(ws) AS term,
                  unnest(generate_series(1, len(ws))) AS pos
           FROM (SELECT CAST(doc_id AS VARCHAR) AS doc,
                        string_split_regex(lower(text), '\s+') AS ws
                 FROM live)),
         a AS (SELECT doc, pos FROM toks WHERE term = 'window'),
         b AS (SELECT doc, pos FROM toks WHERE term = 'dup')
         SELECT a.doc, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                CAST(MIN(ABS(a.pos - b.pos)) AS BIGINT) AS min_dist
         FROM a JOIN b ON a.doc = b.doc AND ABS(a.pos - b.pos) <= 5
         GROUP BY a.doc""",
    "t25_prefix_search" ->
      """WITH live AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 5 = 0 THEN text || ' zzrevterm'
                       ELSE text END AS text
           FROM documents WHERE doc_id NOT IN (6, 7)),
         toks AS (
           SELECT CAST(doc_id AS VARCHAR) AS doc,
                  unnest(string_split_regex(lower(text), '\s+')) AS term
           FROM live),
         tfs AS (
           SELECT doc, term, COUNT(*) AS tf FROM toks
           WHERE term LIKE 's%' GROUP BY 1, 2)
         SELECT doc, COUNT(DISTINCT term) AS n_terms,
                CAST(SUM(tf) AS BIGINT) AS sum_tf
         FROM tfs GROUP BY doc""",
    // tf·idf in integer bit-magnitude space: df per term ≡ the posting
    // count (each live (term, doc) is one posting), N = live doc count
    "t23_tfidf_rank" ->
      """WITH live AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 5 = 0 THEN text || ' zzrevterm'
                       ELSE text END AS text
           FROM documents WHERE doc_id NOT IN (6, 7)),
         toks AS (
           SELECT CAST(doc_id AS VARCHAR) AS doc,
                  unnest(string_split_regex(lower(text), '\s+')) AS term
           FROM live),
         tfs AS (
           SELECT doc, term, COUNT(*) AS tf FROM toks
           WHERE term IN ('window', 'dup', 'zzrevterm') GROUP BY 1, 2),
         dfs AS (SELECT term, COUNT(*) AS df FROM tfs GROUP BY term),
         nn AS (SELECT COUNT(*) AS n FROM live)
         SELECT doc, COUNT(DISTINCT t.term) AS n_terms,
                CAST(SUM(tf * (length(bin((SELECT n FROM nn)))
                               - length(bin(df)))) AS BIGINT) AS score
         FROM tfs t JOIN dfs USING (term) GROUP BY doc""",
    // BM25 (k1 = 6/5, b = 3/4, shifted bit-magnitude idf) in its reduced
    // rational form, every double op in the SAME operand order as the
    // engine — IEEE correctly-rounded ops on exact-integer inputs are
    // bit-identical cross-engine (only ln and unordered SUMs are not)
    "t27_bm25_rank" ->
      """WITH live AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 5 = 0 THEN text || ' zzrevterm'
                       ELSE text END AS text
           FROM documents WHERE doc_id NOT IN (6, 7)),
         toks AS (
           SELECT doc, term FROM (
             SELECT CAST(doc_id AS VARCHAR) AS doc,
                    unnest(string_split_regex(lower(text), '\s+')) AS term
             FROM live)
           WHERE term <> ''),
         dl AS (SELECT doc, COUNT(*) AS len FROM toks GROUP BY doc),
         st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(len) AS BIGINT) AS l FROM dl),
         tfs AS (
           SELECT doc, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
           WHERE term IN ('window', 'dup') GROUP BY 1, 2),
         dfs AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                 FROM tfs GROUP BY term),
         cand AS (
           SELECT t0.doc, t0.tf AS tf0, t1.tf AS tf1
           FROM (SELECT doc, tf FROM tfs WHERE term = 'window') t0
           JOIN (SELECT doc, tf FROM tfs WHERE term = 'dup') t1
             USING (doc))
         SELECT c.doc, dl.len AS dl,
           CAST(1 + length(bin((SELECT n FROM st)))
                - length(bin((SELECT df FROM dfs WHERE term = 'window')))
                AS DOUBLE)
             * (44.0 * CAST(tf0 AS DOUBLE)
                     * CAST((SELECT l FROM st) AS DOUBLE))
             / (20.0 * CAST((SELECT l FROM st) AS DOUBLE)
                     * CAST(tf0 AS DOUBLE)
                + 6.0 * CAST((SELECT l FROM st) AS DOUBLE)
                + 18.0 * CAST(dl.len AS DOUBLE)
                       * CAST((SELECT n FROM st) AS DOUBLE))
           + CAST(1 + length(bin((SELECT n FROM st)))
                  - length(bin((SELECT df FROM dfs WHERE term = 'dup')))
                  AS DOUBLE)
             * (44.0 * CAST(tf1 AS DOUBLE)
                     * CAST((SELECT l FROM st) AS DOUBLE))
             / (20.0 * CAST((SELECT l FROM st) AS DOUBLE)
                     * CAST(tf1 AS DOUBLE)
                + 6.0 * CAST((SELECT l FROM st) AS DOUBLE)
                + 18.0 * CAST(dl.len AS DOUBLE)
                       * CAST((SELECT n FROM st) AS DOUBLE))
             AS score
         FROM cand c JOIN dl USING (doc)""",
    // disjunctive BM25: FULL OUTER over the per-term tf frames, a
    // missing term's tf COALESCEs to 0 so its rational is a true IEEE
    // zero — the left-to-right sum keeps t27's fixed operand order and
    // the double stays bit-identical cross-engine
    "t28_bm25_any" ->
      """WITH live AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 5 = 0 THEN text || ' zzrevterm'
                       ELSE text END AS text
           FROM documents WHERE doc_id NOT IN (6, 7)),
         toks AS (
           SELECT doc, term FROM (
             SELECT CAST(doc_id AS VARCHAR) AS doc,
                    unnest(string_split_regex(lower(text), '\s+')) AS term
             FROM live)
           WHERE term <> ''),
         dl AS (SELECT doc, COUNT(*) AS len FROM toks GROUP BY doc),
         st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(len) AS BIGINT) AS l FROM dl),
         tfs AS (
           SELECT doc, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
           WHERE term IN ('zzrevterm', 'dup') GROUP BY 1, 2),
         dfs AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                 FROM tfs GROUP BY term),
         cand AS (
           SELECT doc, COALESCE(t0.tf, 0) AS tf0,
                  COALESCE(t1.tf, 0) AS tf1
           FROM (SELECT doc, tf FROM tfs WHERE term = 'zzrevterm') t0
           FULL OUTER JOIN
                (SELECT doc, tf FROM tfs WHERE term = 'dup') t1
             USING (doc))
         SELECT c.doc, dl.len AS dl,
           CAST(1 + length(bin((SELECT n FROM st)))
                - length(bin((SELECT df FROM dfs
                              WHERE term = 'zzrevterm')))
                AS DOUBLE)
             * (44.0 * CAST(tf0 AS DOUBLE)
                     * CAST((SELECT l FROM st) AS DOUBLE))
             / (20.0 * CAST((SELECT l FROM st) AS DOUBLE)
                     * CAST(tf0 AS DOUBLE)
                + 6.0 * CAST((SELECT l FROM st) AS DOUBLE)
                + 18.0 * CAST(dl.len AS DOUBLE)
                       * CAST((SELECT n FROM st) AS DOUBLE))
           + CAST(1 + length(bin((SELECT n FROM st)))
                  - length(bin((SELECT df FROM dfs WHERE term = 'dup')))
                  AS DOUBLE)
             * (44.0 * CAST(tf1 AS DOUBLE)
                     * CAST((SELECT l FROM st) AS DOUBLE))
             / (20.0 * CAST((SELECT l FROM st) AS DOUBLE)
                     * CAST(tf1 AS DOUBLE)
                + 6.0 * CAST((SELECT l FROM st) AS DOUBLE)
                + 18.0 * CAST(dl.len AS DOUBLE)
                       * CAST((SELECT n FROM st) AS DOUBLE))
             AS score
         FROM cand c JOIN dl USING (doc)""",
    // 1-based-inclusive with tail clamping, matching Spark's
    // slice(arr, start, length) clamp
    "t18_chunk_overlap" ->
      s"""SELECT doc_id, ci AS chunk_id,
            CAST(ci * 48 AS BIGINT) AS start_tok,
            CAST(least(64, len(ws) - ci * 48) AS BIGINT) AS n_tok,
            md5(array_to_string(ws[ci*48+1 : ci*48+64], ' ')) AS chunk_md5
          FROM (SELECT doc_id, ws,
                  unnest(generate_series(0,
                    (greatest(len(ws) - 64, 0) + 47) // 48)) AS ci
                FROM (SELECT doc_id, $wordsSql AS ws FROM documents)
                WHERE len(ws) > 0)""",
    "t14_shard_assign" ->
      """SELECT doc_id, shuffle_rank,
            shuffle_rank // 64 AS shard_id,
            shuffle_rank % 64 AS shard_pos
          FROM (SELECT doc_id,
                  ROW_NUMBER() OVER (ORDER BY
                    CAST('0x' || substr(md5('shard#r9#' || CAST(doc_id AS VARCHAR)), 1, 14)
                      AS BIGINT), doc_id) - 1 AS shuffle_rank
                FROM documents)""",
    "t06_pii_scrub" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val url = "https?://[^\\s]+"
      val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      s"""SELECT doc_id,
            CAST(len(regexp_extract_all(t1, '$email')) AS BIGINT) AS n_emails,
            CAST(len(regexp_extract_all(text, '$url')) AS BIGINT) AS n_urls,
            CAST(len(regexp_extract_all(t2, '$ip')) AS BIGINT) AS n_ips,
            regexp_replace(t2, '$ip', '<IP>', 'g') AS scrubbed
          FROM (SELECT doc_id, text, t1,
                  regexp_replace(t1, '$email', '<EMAIL>', 'g') AS t2
                FROM (SELECT doc_id, text,
                        regexp_replace(text, '$url', '<URL>', 'g') AS t1
                      FROM documents))"""
    },
    "t07_repetition" ->
      s"""SELECT doc_id,
            CAST(len(ngs) AS BIGINT) AS n_ngrams,
            CAST(len(list_distinct(ngs)) AS BIGINT) AS n_distinct,
            CASE WHEN len(ngs) > 0
                 THEN 1.0 - CAST(len(list_distinct(ngs)) AS DOUBLE) / len(ngs)
                 ELSE 0.0 END AS rep_ratio
          FROM (SELECT doc_id,
                  CASE WHEN len(ws) >= 3
                       THEN list_transform(range(1, len(ws) - 1),
                              i -> array_to_string(ws[i:i+2], ' '))
                       ELSE [] END AS ngs
                FROM (SELECT doc_id, $wordsSql AS ws FROM documents))""",
    "s03_ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
                     FROM embeddings),
          cents0 AS (SELECT vec_id AS cid, embedding FROM e
                     ORDER BY md5('cent#' || CAST(vec_id AS VARCHAR)), vec_id
                     LIMIT 32),
          assign0 AS (SELECT vec_id, cid FROM
            (SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY ${cosSql("e", "c")} DESC, c.cid) AS rn
             FROM e CROSS JOIN cents0 c) WHERE rn = 1),
          cents AS (SELECT cid, list(m ORDER BY d) AS embedding FROM
            (SELECT a.cid, t.i AS d,
               floor(avg(e.embedding[CAST(t.i AS INT)]) * 1000000) / 1000000 AS m
             FROM assign0 a JOIN e ON e.vec_id = a.vec_id
             CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
             GROUP BY a.cid, t.i)
            GROUP BY cid),
          assign AS (SELECT vec_id, cid FROM
            (SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY ${cosSql("e", "c")} DESC, c.cid) AS rn
             FROM e CROSS JOIN cents c) WHERE rn = 1),
          probe AS (SELECT query_id, cid FROM
            (SELECT q.vec_id AS query_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY ${cosSql("q", "c")} DESC, c.cid) AS rn
             FROM e q CROSS JOIN cents c WHERE q.vec_id < 3) WHERE rn <= 12)
          SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rnk FROM
            (SELECT p.query_id, a.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY p.query_id
                 ORDER BY ${cosSql("q", "c")} DESC, a.vec_id) AS rn
             FROM probe p
             JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.query_id
             JOIN e q ON q.vec_id = p.query_id
             JOIN e c ON c.vec_id = a.vec_id)
          WHERE rn <= 10""",
    // s05: exhaustive-shortlist PQ ≡ exact L2 top-k; the L2 expression
    // sums ascending-index like the Spark refine kernel, so FP results
    // agree bit-for-bit
    "s05_ann_pq_exact" ->
      """SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rnk FROM
           (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY q.vec_id
                ORDER BY list_sum(list_transform(
                  list_zip(CAST(q.embedding AS DOUBLE[]),
                           CAST(c.embedding AS DOUBLE[])),
                  x -> (x[1] - x[2]) * (x[1] - x[2]))) ASC,
                c.vec_id) AS rn
            FROM embeddings q CROSS JOIN embeddings c
            WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id)
         WHERE rn <= 10""",
    // s06: full PQ-ADC replay with seed codebooks (lloydIters = 0) —
    // seed rank, per-subspace encode argmin (ties to the lower code),
    // per-query tables, and the ascending-subspace left-fold sum all
    // match the Spark kernels' float operation order exactly
    "s06_ann_pq_adc" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
          seed AS (SELECT c, v FROM (
              SELECT v, ROW_NUMBER() OVER (
                  ORDER BY md5('pq#' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS c
              FROM e) WHERE c < 16),
          books AS (SELECT s.s, seed.c, seed.v[s.s*8+1 : s.s*8+8] AS cv
                    FROM seed, (SELECT unnest(range(0, 8)) AS s) s),
          encd AS (SELECT e.vec_id, b.s, b.c,
                     list_sum(list_transform(
                       list_zip(e.v[b.s*8+1 : b.s*8+8], b.cv),
                       x -> (x[1]-x[2])*(x[1]-x[2]))) AS d
                   FROM e CROSS JOIN books b),
          enc AS (SELECT vec_id, s, c FROM (
              SELECT vec_id, s, c, ROW_NUMBER() OVER (
                  PARTITION BY vec_id, s ORDER BY d ASC, c) AS rn
              FROM encd) WHERE rn = 1),
          qt AS (SELECT e.vec_id AS query_id, b.s, b.c,
                   list_sum(list_transform(
                     list_zip(e.v[b.s*8+1 : b.s*8+8], b.cv),
                     x -> (x[1]-x[2])*(x[1]-x[2]))) AS d
                 FROM e CROSS JOIN books b WHERE e.vec_id < 3),
          ad AS (SELECT t.query_id, n.vec_id AS neighbor_id,
                   list_sum(list(t.d ORDER BY t.s)) AS adist
                 FROM enc n JOIN qt t ON t.s = n.s AND t.c = n.c
                 WHERE n.vec_id <> t.query_id
                 GROUP BY t.query_id, n.vec_id)
          SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rnk FROM
            (SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY adist ASC, neighbor_id) AS rn
             FROM ad)
          WHERE rn <= 10""",
    // d14: full SemDeDup replay — seed rank, L2 assignment argmin
    // (ties to the lower centroid index), triangular within-cluster
    // cosine verdict; every float fold matches the Spark kernels'
    // operation order (seed/assignment = the s06 machinery, cosine =
    // the d05 machinery)
    // d17: the persisted SemDeDup index, built in two incremental
    // change-feed refreshes over a seed-preserving batch split, must
    // equal the one-shot frozen-model pass — the oracle is d14's SQL
    // verbatim (the split keeps every seed doc in batch 1, so the
    // frozen centroids ARE the full-corpus seeds)
    "d17_semdedup_incremental" ->
      s"""WITH $semCtes
          SELECT asg.vec_id, CAST(asg.c AS BIGINT) AS cluster_id,
                 drp.vec_id IS NULL AS kept
          FROM asg LEFT JOIN drp USING (vec_id)""",
    // d19: the KEYED twin — same frozen-model replay with 'doc-<id>'
    // keys: seeds rank by md5 of the KEY, dominance is LEXICOGRAPHIC
    // ('doc-10' < 'doc-9', numerically inverted — a numeric-order bug
    // cannot hash-match), vectors/assignment identical to d17's
    "d19_semdedup_keyed" ->
      s"""WITH e AS (SELECT 'doc-' || CAST(vec_id AS VARCHAR) AS k,
                    CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
          seed AS (SELECT c, v FROM (
              SELECT v, ROW_NUMBER() OVER (
                  ORDER BY md5('sem#' || k), k) - 1 AS c
              FROM e) WHERE c < 16),
          asgd AS (SELECT e.k, s.c,
                     list_sum(list_transform(list_zip(e.v, s.v),
                       x -> (x[1]-x[2])*(x[1]-x[2]))) AS d
                   FROM e CROSS JOIN seed s),
          asg AS (SELECT k, c FROM (
              SELECT k, c, ROW_NUMBER() OVER (
                  PARTITION BY k ORDER BY d ASC, c) AS rn
              FROM asgd) WHERE rn = 1),
          drp AS (SELECT DISTINCT bb.k AS k
                  FROM asg aa
                  JOIN asg bb ON aa.c = bb.c AND aa.k < bb.k
                  JOIN e a ON a.k = aa.k
                  JOIN e b ON b.k = bb.k
                  WHERE list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v))
                     * sqrt(list_dot_product(b.v, b.v))) >= 0.4)
          SELECT asg.k AS vec_key, CAST(asg.c AS BIGINT) AS cluster_id,
                 drp.k IS NULL AS kept
          FROM asg LEFT JOIN drp USING (k)""",
    "d14_semdedup" ->
      s"""WITH $semCtes
          SELECT asg.vec_id, CAST(asg.c AS BIGINT) AS cluster_id,
                 drp.vec_id IS NULL AS kept
          FROM asg LEFT JOIN drp USING (vec_id)""",
    // d20: quote-injected derived corpus (doc_id % 10 == 0 -> first 30
    // words of its successor), shingles, df-guarded collision blocking,
    // exact containment from the full shingle sets. d21 (the persisted
    // incremental index) must serve the IDENTICAL verdicts, so it
    // shares the one-shot oracle verbatim — the same oracle-reuse as
    // d13/d16.
    "d21_containment_index" -> containmentOracle,
    "d22_contain_keyed" ->
      containmentOracleFor("'doc-' || CAST(d.doc_id AS VARCHAR)"),
    // d23: the POSTING-LIST-served index build (no corpus pass per
    // refresh) must serve the identical verdicts — same oracle again
    "d23_contain_postings" -> containmentOracle,
    "d20_containment" -> containmentOracle,
    // p04: the containment pairs recomputed ONE-SHOT (the shared d20/
    // d21 SQL as a CTE), the asymmetric drop rule (excerpt drops,
    // container stays; mutual -> keep min id), and the quality gate
    // over the derived corpus — the Spark row serves the same gate
    // from the persisted index
    "p04_contain_gate" ->
      s"""WITH cpairs AS ($containmentOracle),
          cdrops AS (SELECT DISTINCT
                       CASE WHEN cont_a >= 0.9 AND cont_b >= 0.9
                              THEN doc_b
                            WHEN cont_a >= 0.9 THEN doc_a
                            ELSE doc_b END AS doc_id
                     FROM cpairs),
          nb2 AS (SELECT doc_id - 1 AS doc_id, text AS ntext
                  FROM documents),
          der2 AS (SELECT d.doc_id,
                    CASE WHEN d.doc_id % 10 = 0 AND nb2.ntext IS NOT NULL
                      THEN array_to_string(
                        list_slice(string_split_regex(nb2.ntext, '\\s+'), 1, 30),
                        ' ')
                      ELSE d.text END AS text
                   FROM documents d LEFT JOIN nb2 USING (doc_id)),
          q2 AS (SELECT doc_id,
                  LEAST(CAST(sum_word_len AS DOUBLE) / n_words / 10.0, 1.0) * 0.5
                    + CAST(n_stopwords AS DOUBLE) / n_words * 0.3
                    + (1.0 - CAST(n_digits AS DOUBLE) / n_chars_m) * 0.2
                    AS quality_score
                FROM (SELECT doc_id,
                        CAST(len(ws) AS BIGINT) AS n_words,
                        CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS sum_word_len,
                        CAST(len(list_intersect(ws, $stopListSql)) AS BIGINT) AS n_stopwords,
                        CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits,
                        CAST(length(text) AS BIGINT) AS n_chars_m
                      FROM (SELECT doc_id, text, $wordsSql AS ws
                            FROM der2)))
          SELECT q2.doc_id, q2.quality_score
          FROM q2 LEFT JOIN cdrops USING (doc_id)
          WHERE cdrops.doc_id IS NULL AND q2.quality_score >= 0.42""",
    // p05: the persisted shard map replayed epoch by epoch — epoch 1
    // is EXACTLY the one-shot t14 permutation over its batch (same
    // salted-hash formula), epoch 2 offsets by epoch 1's count, and
    // the deleted doc drops from the LIVE serving join while its slot
    // stays minted (a hole — so any engine write on delete, or any
    // epoch-1 slot moved by the epoch-2 mint, breaks the hash)
    "p05_shard_map" ->
      """WITH b1 AS (SELECT doc_id FROM documents WHERE doc_id % 3 <> 0),
          r1 AS (SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY
                     CAST('0x' || substr(md5('shard#p5#' || CAST(doc_id AS VARCHAR)), 1, 14)
                       AS BIGINT),
                     CAST(doc_id AS VARCHAR)) - 1 AS shuffle_rank
                 FROM b1),
          b2 AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
          r2 AS (SELECT doc_id,
                   (SELECT COUNT(*) FROM b1) +
                   ROW_NUMBER() OVER (ORDER BY
                     CAST('0x' || substr(md5('shard#p5#' || CAST(doc_id AS VARCHAR)), 1, 14)
                       AS BIGINT),
                     CAST(doc_id AS VARCHAR)) - 1 AS shuffle_rank
                 FROM b2),
          m AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
          SELECT doc_id, shuffle_rank,
                 shuffle_rank // 64 AS shard_id,
                 shuffle_rank % 64 AS shard_pos
          FROM m WHERE doc_id <> 7""",
    // p06: p05's token-granular twin — weighted exclusive prefix sums
    // per epoch, epoch 2 offset by epoch 1's total tokens, the deleted
    // doc dropped live while its tokens keep occupying their frozen
    // span (reclaiming them would shift every epoch-2 offset)
    "p06_seq_map" ->
      s"""WITH b1 AS (SELECT doc_id,
                   CAST(len($wordsSql) AS BIGINT) AS n_tokens,
                   CAST('0x' || substr(md5('pack#p6#' || CAST(doc_id AS VARCHAR)), 1, 14)
                     AS BIGINT) AS h
                 FROM documents WHERE doc_id % 3 <> 0 AND text IS NOT NULL),
          r1 AS (SELECT doc_id, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY h, CAST(doc_id AS VARCHAR)
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS BIGINT) AS tok_offset
                 FROM b1),
          b2 AS (SELECT doc_id,
                   CAST(len($wordsSql) AS BIGINT) AS n_tokens,
                   CAST('0x' || substr(md5('pack#p6#' || CAST(doc_id AS VARCHAR)), 1, 14)
                     AS BIGINT) AS h
                 FROM documents WHERE doc_id % 3 = 0 AND text IS NOT NULL),
          r2 AS (SELECT doc_id, n_tokens,
                   CAST((SELECT COALESCE(SUM(n_tokens), 0) FROM b1)
                     + COALESCE(SUM(n_tokens) OVER (ORDER BY h, CAST(doc_id AS VARCHAR)
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS BIGINT) AS tok_offset
                 FROM b2),
          m AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
          SELECT doc_id, n_tokens, tok_offset,
                 tok_offset // 256 AS start_seq,
                 (tok_offset + n_tokens - 1) // 256 AS end_seq,
                 (tok_offset + n_tokens - 1) // 256 - tok_offset // 256 + 1
                   AS n_seqs
          FROM m WHERE doc_id <> 7""") ++
    moreOracles

  private val containmentOracle: String = containmentOracleFor("d.doc_id")

  /** The d20/d21/d22 one-shot containment SQL, parameterized by the
    * DOC KEY expression: `d.doc_id` (numeric pair order) or a derived
    * string key (LEXICOGRAPHIC pair order — `'doc-10' < 'doc-9'`, the
    * d19 inversion that makes a numeric-order bug un-hash-matchable).
    * Every downstream CTE compares keys generically, so the type
    * decides the order.
    */
  private def containmentOracleFor(keySel: String): String =
      s"""WITH nb AS (SELECT doc_id - 1 AS doc_id, text AS ntext
                     FROM documents),
          der AS (SELECT $keySel AS doc_id,
                   CASE WHEN d.doc_id % 10 = 0 AND nb.ntext IS NOT NULL
                     THEN array_to_string(
                       list_slice(string_split_regex(nb.ntext, '\\s+'), 1, 30),
                       ' ')
                     ELSE d.text END AS text
                  FROM documents d LEFT JOIN nb USING (doc_id)),
          w AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ws
                FROM der),
          u AS (SELECT DISTINCT doc_id, sh FROM
                 (SELECT doc_id, unnest(list_transform(range(1, len(ws)-1),
                    i -> array_to_string(ws[i:i+2], ' '))) AS sh
                  FROM w WHERE len(ws) >= 3)),
          g AS (SELECT sh FROM u GROUP BY sh
                HAVING count(*) BETWEEN 2 AND 20),
          ug AS (SELECT u.doc_id, u.sh FROM u JOIN g USING (sh)),
          cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM ug a JOIN ug b
                     ON a.sh = b.sh AND a.doc_id < b.doc_id
                   GROUP BY 1, 2 HAVING count(*) >= 3),
          sizes AS (SELECT doc_id, count(*) AS n FROM u GROUP BY doc_id),
          inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
                    FROM cand c
                    JOIN u ua ON ua.doc_id = c.doc_a
                    JOIN u ub ON ub.doc_id = c.doc_b AND ua.sh = ub.sh
                    GROUP BY 1, 2)
          SELECT c.doc_a, c.doc_b, i.n_inter, sa.n AS n_a, sb.n AS n_b,
            CAST(i.n_inter AS DOUBLE) / sa.n AS cont_a,
            CAST(i.n_inter AS DOUBLE) / sb.n AS cont_b
          FROM cand c
          JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
          JOIN sizes sa ON sa.doc_id = c.doc_a
          JOIN sizes sb ON sb.doc_id = c.doc_b
          WHERE greatest(CAST(i.n_inter AS DOUBLE) / sa.n,
                         CAST(i.n_inter AS DOUBLE) / sb.n) >= 0.9"""

  /** [[oracleSql]] continued (one Map literal strains scalac's
    * constant-pool appetite less when split).
    */
  private def moreOracles: Map[String, String] = Map(
    // p01: the composed funnel on the duplicate-injected derived corpus.
    // Stage formulas are the t03/t02/d01/t11/t17 oracles verbatim; the
    // composition is the same two conditional windows the Spark plan
    // uses (min-over-fp for the survivor canonical, conditional running
    // count over the salted cap order for the survivor rank).
    "p01_filter_funnel" ->
      """WITH srcd AS (SELECT doc_id AS sid, text AS stext FROM documents),
          d AS (SELECT d.doc_id,
                  CASE WHEN d.doc_id % 11 = 7 AND s.stext IS NOT NULL
                       THEN s.stext ELSE d.text END AS text,
                  d.source
                FROM documents d LEFT JOIN srcd s ON d.doc_id - 7 = s.sid),
          feat AS (SELECT doc_id, source,
              md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
              CAST('0x' || substr(md5('cap#p1#' || CAST(doc_id AS VARCHAR)), 1, 14)
                AS BIGINT) AS ck,
              CASE WHEN s_en > 0 AND s_en >= GREATEST(s_de, s_fr, s_es) THEN 'en'
                   WHEN s_de > 0 AND s_de >= GREATEST(s_fr, s_es) THEN 'de'
                   WHEN s_fr > 0 AND s_fr >= s_es THEN 'fr'
                   WHEN s_es > 0 THEN 'es'
                   ELSE 'unknown' END AS predicted,
              LEAST(CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
                  / len(ws) / 10.0, 1.0) * 0.5
                + CAST(len(list_intersect(ws, ['the','a','of','and','is','der','die','und','ein','ist','le','la','et','un','est','el','y','los','es'])) AS DOUBLE)
                  / len(ws) * 0.3
                + (1.0 - CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                  / length(text)) * 0.2 AS qs,
              list_reduce(list_transform(ws,
                t -> (CAST('0x' || substr(md5('w#p1#' || t), 1, 14) AS BIGINT)
                      % 2001 - 1000) / 1000.0),
                (acc, x) -> acc + x) + -8.5 AS margin
            FROM (SELECT doc_id, source, text,
                    string_split_regex(lower(text), '\s+') AS ws,
                    len(list_intersect(string_split_regex(lower(text), '\s+'), ['the','a','of','and','is'])) AS s_en,
                    len(list_intersect(string_split_regex(lower(text), '\s+'), ['der','die','und','ein','ist'])) AS s_de,
                    len(list_intersect(string_split_regex(lower(text), '\s+'), ['le','la','et','un','est'])) AS s_fr,
                    len(list_intersect(string_split_regex(lower(text), '\s+'), ['el','y','los','un','es'])) AS s_es
                  FROM d)),
          st AS (SELECT *,
              min(CASE WHEN predicted = 'en' AND qs >= 0.42 THEN doc_id END)
                OVER (PARTITION BY fp) AS canon
            FROM feat),
          st2 AS (SELECT *,
              sum(CASE WHEN predicted = 'en' AND qs >= 0.42 AND doc_id = canon
                       THEN 1 ELSE 0 END)
                OVER (PARTITION BY source ORDER BY ck, CAST(doc_id AS VARCHAR)
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cap_rank
            FROM st)
          SELECT doc_id, source,
            CASE WHEN predicted <> 'en' THEN '1_lang'
                 WHEN qs < 0.42 THEN '2_quality'
                 WHEN doc_id <> canon THEN '3_exact_dup'
                 WHEN cap_rank > 12 THEN '4_domain_cap'
                 WHEN margin <= 0.0 THEN '5_classifier'
                 ELSE 'kept' END AS verdict
          FROM st2""",
    // p02: the export gate SERVED from the persisted CC + SemDeDup
    // indexes; the oracle recomputes both verdicts one-shot —
    // componentCtes (d16's survivor fixpoint) + semCtes (d17's verdict
    // replay) + the t02 quality score + the t06 PII audit counts,
    // intersected — so the row re-proves index ≡ one-shot end to end
    "p02_index_funnel" ->
      s"""$exportGateCtes
          SELECT doc_id, component_id, cluster_id, quality_score
          FROM gate""",
    // p03: the gate's CTEs verbatim, then t15's pack/emit formulas over
    // the gated set only (salt p3), sequences dealt into 16-seq shards
    "p03_export_shards" ->
      s"""$exportGateCtes,
          pd AS (SELECT d.doc_id, $wordsSql AS ws,
              CAST('0x' || substr(md5('pack#p3#' || CAST(d.doc_id AS VARCHAR)), 1, 14)
                AS BIGINT) AS h
            FROM documents d JOIN gate g ON g.doc_id = d.doc_id
            WHERE d.text IS NOT NULL),
          po AS (SELECT doc_id, ws,
              CAST(COALESCE(SUM(CAST(len(ws) AS BIGINT)) OVER (
                ORDER BY h, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS tok_offset
            FROM pd),
          ptoks AS (SELECT doc_id,
              tok_offset + CAST(generate_subscripts(ws, 1) - 1 AS BIGINT)
                AS tp,
              unnest(ws) AS tok
            FROM po)
          SELECT seq_id, md5(seq_text) AS seq_md5, n_tokens,
            seq_id // 16 AS shard_id, seq_id % 16 AS shard_pos
          FROM (SELECT tp // 256 AS seq_id,
                  string_agg(tok, ' ' ORDER BY tp) AS seq_text,
                  count(*) AS n_tokens
                FROM ptoks GROUP BY 1)""",
    "s04_ann_lsh_topk" ->
      s"""WITH bk AS (SELECT vec_id, ${(0 until 12).map(p =>
            s"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ${planeSql(p)}) > 0 THEN '1' ELSE '0' END)")
            .mkString(" || ")} AS bucket
          FROM embeddings),
          bands AS (SELECT vec_id, bidx, substr(bucket, bidx * 3 + 1, 3) AS bval
                    FROM bk, (SELECT unnest([0, 1, 2, 3]) AS bidx)),
          cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
                   FROM bands q JOIN bands c
                     ON q.bidx = c.bidx AND q.bval = c.bval
                  WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id)
          SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rnk FROM
            (SELECT cd.query_id, cd.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY cd.query_id
                 ORDER BY ${cosSql("q", "c")} DESC, cd.neighbor_id) AS rn
             FROM cand cd
             JOIN embeddings q ON q.vec_id = cd.query_id
             JOIN embeddings c ON c.vec_id = cd.neighbor_id)
          WHERE rn <= 10""",
    "s02_ann_lsh_buckets" ->
      s"""SELECT bucket, COUNT(*) AS n, MIN(vec_id) AS min_vec FROM
            (SELECT vec_id, ${(0 until 8).map(p =>
              s"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ${planeSql(p)}) > 0 THEN '1' ELSE '0' END)")
              .mkString(" || ")} AS bucket
             FROM embeddings)
          GROUP BY bucket""",
    "t01_text_tokens" ->
      s"""SELECT doc_id,
          CAST(len($wordsSql) AS BIGINT) AS n_words,
          CAST(length(text) AS BIGINT) AS n_chars_m,
          CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens
          FROM documents""",
    "t02_text_quality" ->
      s"""SELECT doc_id, n_words, sum_word_len, n_stopwords, n_digits, n_chars_m,
            CAST(sum_word_len AS DOUBLE) / n_words AS avg_word_len,
            CAST(n_stopwords AS DOUBLE) / n_words AS stopword_ratio,
            CAST(n_digits AS DOUBLE) / n_chars_m AS digit_ratio,
            LEAST(CAST(sum_word_len AS DOUBLE) / n_words / 10.0, 1.0) * 0.5
              + CAST(n_stopwords AS DOUBLE) / n_words * 0.3
              + (1.0 - CAST(n_digits AS DOUBLE) / n_chars_m) * 0.2 AS quality_score
          FROM (SELECT doc_id,
                  CAST(len(ws) AS BIGINT) AS n_words,
                  CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS sum_word_len,
                  CAST(len(list_intersect(ws, $stopListSql)) AS BIGINT) AS n_stopwords,
                  CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits,
                  CAST(length(text) AS BIGINT) AS n_chars_m
                FROM (SELECT doc_id, text, $wordsSql AS ws FROM documents))""",
    "t03_text_langid" ->
      s"""SELECT doc_id, s_en, s_de, s_fr, s_es,
            CASE WHEN s_en > 0 AND s_en >= GREATEST(s_de, s_fr, s_es) THEN 'en'
                 WHEN s_de > 0 AND s_de >= GREATEST(s_fr, s_es) THEN 'de'
                 WHEN s_fr > 0 AND s_fr >= s_es THEN 'fr'
                 WHEN s_es > 0 THEN 'es'
                 ELSE 'unknown' END AS predicted
          FROM (SELECT doc_id,
                  ${TextAnalysis.langMarkers.map { case (l, _) =>
                    s"CAST(len(list_intersect(ws, ${markerListSql(l)})) AS BIGINT) AS s_$l"
                  }.mkString(", ")}
                FROM (SELECT doc_id, $wordsSql AS ws FROM documents))""",
    "t04_text_fingerprint" ->
      s"""SELECT doc_id, $fingerprintSql AS fp FROM documents""",
    "t08_split_assign" ->
      s"""SELECT doc_id, split_bucket,
            CASE WHEN split_bucket < 80 THEN 'train'
                 WHEN split_bucket < 90 THEN 'val'
                 ELSE 'test' END AS split
          FROM (SELECT doc_id,
                  CAST('0x' || substr(md5('split#' || CAST(doc_id AS VARCHAR)), 1, 14)
                    AS BIGINT) % 100 AS split_bucket
                FROM documents)""",
    "t10_stratified_sample" ->
      s"""SELECT doc_id, stratum, sample_bucket
          FROM (SELECT doc_id,
                  CAST(doc_id % 4 AS VARCHAR) AS stratum,
                  CAST('0x' || substr(md5('sample#r3#' || CAST(doc_id AS VARCHAR)), 1, 14)
                    AS BIGINT) % 1000000 AS sample_bucket
                FROM documents)
          WHERE sample_bucket < CAST(
            (CASE stratum WHEN '0' THEN 1.0 WHEN '1' THEN 0.5
                          WHEN '2' THEN 0.25 ELSE 0.125 END) * 1000000 AS BIGINT)""",
    "t11_source_cap" ->
      s"""SELECT doc_id, source, cap_rank FROM
            (SELECT doc_id, source,
               CAST(ROW_NUMBER() OVER (PARTITION BY source
                 ORDER BY CAST('0x' || substr(md5('cap#r7#' || CAST(doc_id AS VARCHAR)), 1, 14)
                   AS BIGINT),
                 CAST(doc_id AS VARCHAR)) AS BIGINT) AS cap_rank
             FROM documents)
          WHERE cap_rank <= 10""",
    "t09_length_histogram" ->
      s"""SELECT CAST(LEAST(n // 25, 9) AS BIGINT) AS bucket,
            count(*) AS n_docs,
            MIN(n) AS min_words, MAX(n) AS max_words
          FROM (SELECT CAST(len($wordsSql) AS BIGINT) AS n FROM documents)
          GROUP BY 1""",
    "t05_rolling_fingerprint" -> {
      val p = graft.operators.TextAnalysis.RollP
      val bb = graft.operators.TextAnalysis.RollB
      def roll(listExpr: String) =
        s"""CASE WHEN len($listExpr) = 0 THEN 0 ELSE list_reduce(
            list_transform($listExpr,
              w -> CAST('0x' || substr(md5(w), 1, 14) AS BIGINT) % $p),
            (acc, x) -> (acc * $bb + x) % $p) END"""
      s"""SELECT doc_id, ${roll("ws")} AS rh, ${roll("ws[1:16]")} AS rh_prefix
          FROM (SELECT doc_id, $wordsSql AS ws FROM documents)"""
    },
    "m02_frame_sample" ->
      s"""WITH meta AS (SELECT doc_id,
             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS octets,
             1 + CAST(ascii(substr(text, 1, 1)) AS BIGINT) % 8 AS n_frames
           FROM documents),
          f AS (SELECT doc_id, octets, n_frames,
             CAST(unnest(range(0, n_frames)) AS BIGINT) AS frame_idx
           FROM meta)
          SELECT doc_id, frame_idx,
            (octets // n_frames) * frame_idx AS frame_off,
            CASE WHEN frame_idx = n_frames - 1
                 THEN octets - (octets // n_frames) * frame_idx
                 ELSE octets // n_frames END AS frame_len
          FROM f WHERE frame_idx % 2 = 0""",
    "m03_resize" ->
      s"""SELECT doc_id,
            CAST(16 AS BIGINT) AS out_width,
            CAST(16 AS BIGINT) AS out_height,
            (octets + stride - 1) // stride AS out_octets
          FROM (SELECT doc_id, octets,
                  GREATEST(1, (octets + 255) // 256) AS stride
                FROM (SELECT doc_id,
                        CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS octets
                      FROM documents))""",
    "m04_feature_extract" ->
      s"""SELECT doc_id, fv[1] AS f0, fv[2] AS f1, fv[3] AS f2, fv[4] AS f3,
            sqrt(list_dot_product(fv, fv)) AS norm
          FROM (SELECT doc_id, list_transform(range(0, 16), d ->
                  CAST(CAST((octets * (d + 1) + first * (d + 3)) % 97 AS FLOAT)
                    / CAST(97 AS FLOAT) AS DOUBLE)) AS fv
                FROM (SELECT doc_id,
                        CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS octets,
                        CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first
                      FROM documents))""",
    "m01_multimodal_meta" ->
      s"""SELECT doc_id, octets,
            64 + octets % 576 AS width,
            64 + (octets * 7) % 448 AS height,
            1 + first % 8 AS n_frames,
            (octets * 31 + first) % 997 AS checksum
          FROM (SELECT doc_id,
                  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS octets,
                  CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first
                FROM documents)""")
}
