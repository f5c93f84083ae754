package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization stats, quality scoring, language-ID heuristics, document
  * fingerprinting. All pure narrow transformations (no shuffle): they
  * scale linearly with partitions, and every function is codegen'd
  * `functions._` composition — no UDFs.
  */
object TextAnalysis {

  /** Whitespace tokens of the lowercased text. */
  def words(text: Column): Column = split(lower(text), "\\s+")

  /** JVM-side twin of [[words]] for the per-document signature kernels
    * (simhash/minhash) — THE one tokenizer both share, so a future
    * tokenization change lands in exactly one kernel-side place (plus
    * [[words]] and the oracle SQL builder).
    *
    * Lowercasing pins `Locale.ROOT` DELIBERATELY: the DuckDB oracles'
    * `lower()` is locale-independent, and Spark's `lower` expression
    * inherits the JVM default locale — identical to ROOT everywhere
    * except tr/az-locale JVMs, where the EXPRESSION path (not this
    * kernel) is the one that would diverge from the oracle ('I' → 'ı').
    * Run driver and executors with a ROOT-equivalent default locale
    * (every test/bench environment here does) and all three agree.
    * `split(regex, -1)` keeps trailing empty tokens, matching Spark's
    * `split`.
    */
  private[operators] def tokenize(t: String): Array[String] =
    t.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)

  /** Marker stopword sets per language for the n-gram/stopword langid
    * heuristic. Tiny on purpose: langid on real corpora swaps in real
    * frequency tables; the operator shape (set-intersection scoring +
    * deterministic argmax) is what scales.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "und", "ein", "ist"),
    "fr" -> Seq("le", "la", "et", "un", "est"),
    "es" -> Seq("el", "y", "los", "un", "es"))

  /** Token statistics: whitespace tokens plus a BPE-ish regex token count
    * (letter runs / digit runs / single punctuation marks).
    */
  def tokenStats(df: DataFrame, text: Column, id: Column): DataFrame =
    df.select(
      id,
      size(words(text)).cast("long").as("n_words"),
      length(text).cast("long").as("n_chars_m"),
      regexp_count(text, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long")
        .as("n_bpe_tokens"))

  /** The composite score from its counting signals, in the pinned
    * operation order every caller (and every DuckDB oracle) replays:
    * `least(avgLen/10, 1)·0.5 + stopRatio·0.3 + (1 − digitRatio)·0.2`.
    */
  private def scoreExpr(sumLen: Column, nWords: Column, stop: Column,
      nDigits: Column, nChars: Column): Column =
    least(sumLen.cast("double") / nWords / lit(10.0), lit(1.0)) * lit(0.5) +
      stop.cast("double") / nWords * lit(0.3) +
      (lit(1.0) - nDigits.cast("double") / nChars) * lit(0.2)

  /** The composite quality score as ONE column expression — the per-row
    * gate the export funnels filter on without materializing the full
    * [[quality]] signal frame (same formula, same operation order, so a
    * funnel's threshold and a t02 audit always agree on a document).
    */
  def qualityScore(text: Column): Column = {
    val w = words(text)
    scoreExpr(
      aggregate(w, lit(0), (acc, x) => acc + length(x)).cast("long"),
      size(w).cast("long"),
      size(array_intersect(w,
        typedLit(langMarkers.flatMap(_._2).distinct))).cast("long"),
      regexp_count(text, lit("[0-9]")).cast("long"),
      length(text).cast("long"))
  }

  /** Quality signals: word counts, mean word length, stopword ratio,
    * digit ratio, and a composite score. The score formula is plain
    * double arithmetic in a fixed operation order.
    */
  def quality(df: DataFrame, text: Column, id: Column): DataFrame = {
    val w = words(text)
    val nWords = size(w).cast("long")
    val sumLen = aggregate(w, lit(0), (acc, x) => acc + length(x)).cast("long")
    val stop = size(array_intersect(w,
      typedLit(langMarkers.flatMap(_._2).distinct))).cast("long")
    val df2 = df.select(
      id,
      nWords.as("n_words"),
      sumLen.as("sum_word_len"),
      stop.as("n_stopwords"),
      regexp_count(text, lit("[0-9]")).cast("long").as("n_digits"),
      length(text).cast("long").as("n_chars_m"))
    df2.withColumn("avg_word_len",
        col("sum_word_len").cast("double") / col("n_words"))
      .withColumn("stopword_ratio",
        col("n_stopwords").cast("double") / col("n_words"))
      .withColumn("digit_ratio",
        col("n_digits").cast("double") / col("n_chars_m"))
      .withColumn("quality_score",
        scoreExpr(col("sum_word_len"), col("n_words"), col("n_stopwords"),
          col("n_digits"), col("n_chars_m")))
  }

  /** Stopword-set language scores + deterministic fixed-priority argmax. */
  def langId(df: DataFrame, text: Column, id: Column): DataFrame = {
    val w = words(text)
    val scored = langMarkers.foldLeft(df.select(id, w.as("_w"))) {
      case (acc, (lang, markers)) =>
        acc.withColumn(s"s_$lang",
          size(array_intersect(col("_w"), typedLit(markers))).cast("long"))
    }
    val Seq(en, de, fr, es) = langMarkers.map { case (l, _) => col(s"s_$l") }
    scored.withColumn("predicted",
        when(en > 0 && en >= greatest(de, fr, es), "en")
          .when(de > 0 && de >= greatest(fr, es), "de")
          .when(fr > 0 && fr >= es, "fr")
          .when(es > 0, "es")
          .otherwise("unknown"))
      .drop("_w")
  }

  /** PII / link patterns — deliberately expressible in both Java regex
    * (Spark codegen) and RE2 (DuckDB oracle): email, URL, IPv4.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII scrubbing — the redaction pass a training corpus gets before
    * tokenization: URLs → `<URL>`, emails → `<EMAIL>`, IPv4 → `<IP>`.
    * Replacement order is fixed URL → email → IP, and each category is
    * COUNTED on the text as it stands when that category is replaced, so
    * the audit counts equal the replacements actually made: a URL with
    * userinfo (`https://user@host.com/x`) scrubs — and counts — as one
    * URL, not as an email-then-mangled-URL, and an IP inside a URL
    * counts as part of the URL only. (Plain emails never match the URL
    * pattern — it requires an `https?://` prefix — so nothing is lost by
    * running URLs first.) A pure narrow projection of codegen'd regexp
    * expressions — no shuffle, no UDF.
    */
  def piiScrub(df: DataFrame, text: Column, id: Column): DataFrame = {
    val afterEmail =
      regexp_replace(regexp_replace(text, UrlPattern, "<URL>"),
        EmailPattern, "<EMAIL>")
    df.select(
      id,
      piiEmailCount(text).as("n_emails"),
      regexp_count(text, lit(UrlPattern)).cast("long").as("n_urls"),
      piiIpCount(text).as("n_ips"),
      regexp_replace(afterEmail, Ipv4Pattern, "<IP>").as("scrubbed"))
  }

  /** [[piiScrub]]'s email audit count as one column expression (counted
    * after URL replacement, per the fixed URL → email → IP order) — the
    * export funnels' PII-free gate without the scrub projection.
    */
  def piiEmailCount(text: Column): Column =
    regexp_count(regexp_replace(text, UrlPattern, "<URL>"),
      lit(EmailPattern)).cast("long")

  /** [[piiScrub]]'s IPv4 audit count (after URL and email replacement). */
  def piiIpCount(text: Column): Column =
    regexp_count(
      regexp_replace(regexp_replace(text, UrlPattern, "<URL>"),
        EmailPattern, "<EMAIL>"),
      lit(Ipv4Pattern)).cast("long")

  /** Within-document repetition score (the C4/Gopher-style quality
    * signal): fraction of word-3-grams that are repeats of an earlier
    * 3-gram in the same document. 0 for documents with fewer than 3
    * words. Narrow (no shuffle): the n-gram list never leaves the row.
    */
  def repetition(df: DataFrame, text: Column, id: Column): DataFrame = {
    val w = words(text)
    val ngs = when(size(w) >= 3,
        transform(sequence(lit(0), size(w) - 3),
          i => concat_ws(" ", slice(w, i + 1, lit(3)))))
      .otherwise(array().cast("array<string>"))
    df.select(id, ngs.as("_n"))
      .select(
        id,
        size(col("_n")).cast("long").as("n_ngrams"),
        size(array_distinct(col("_n"))).cast("long").as("n_distinct"))
      .withColumn("rep_ratio",
        when(col("n_ngrams") > 0,
          lit(1.0) - col("n_distinct").cast("double") / col("n_ngrams"))
          .otherwise(lit(0.0)))
  }

  /** Overlapping context windows (the RAG / long-context training
    * chunker): each document splits into `window`-token chunks every
    * `stride` tokens, the last chunk clamped to the document tail, so
    * consecutive chunks share `window - stride` tokens of overlap.
    * Chunk COUNT uses pure integer arithmetic
    * (`(max(n - window, 0) + stride - 1) / stride + 1`) — no float
    * ceil whose rounding an oracle could disagree with — and the chunk
    * text rides out as an md5 so rows stay fingerprint-sized however
    * wide the window.
    *
    * Scale shape: a per-document NARROW kernel — `transform(sequence)`
    * over the word array, one `explode`, zero shuffles, fully
    * codegen-friendly; output size is corpus tokens × (window/stride)
    * overlap factor, the operator's intrinsic cost. Empty documents
    * emit no chunks.
    */
  def chunkWindows(
      df: DataFrame, text: Column, id: Column,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    val w = words(text)
    val n = size(w)
    // Spark's `/` is fractional — floor(exact-double division) here IS
    // the integer ceil-divide: operands are far below 2^53 and an
    // integral quotient divides exactly in IEEE, so floor never lands
    // one short
    val lastIdx = floor(
      (greatest(n - window, lit(0)) + (stride - 1)) / stride).cast("int")
    val chunks = when(n > 0, transform(sequence(lit(0), lastIdx), i =>
      struct(
        i.cast("long").as("chunk_id"),
        (i * stride).cast("long").as("start_tok"),
        least(lit(window), n - i * stride).cast("long").as("n_tok"),
        md5(concat_ws(" ", slice(w, i * stride + 1, lit(window))))
          .as("chunk_md5"))))
      .otherwise(array().cast(
        "array<struct<chunk_id:bigint,start_tok:bigint,n_tok:bigint,chunk_md5:string>>"))
    df.select(id, explode(chunks).as("_c"))
      .select(id, col("_c.chunk_id"), col("_c.start_tok"),
        col("_c.n_tok"), col("_c.chunk_md5"))
  }

  /** Deterministic train/val/test split assignment: bucket =
    * md5("split#" || id) mod 100, so membership is a pure function of the
    * document id — stable across runs, clusters, and engines, joinable
    * from anywhere, and never resampled when the corpus grows (the
    * property that matters for decontamination audits). Narrow, no
    * shuffle. Thresholds are percentages (train < t1 <= val < t2 <= test).
    */
  def splitAssign(
      df: DataFrame, id: Column,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    val bucket = pmod(
      conv(substring(md5(concat(lit("split#"), id)), 1, 14), 16, 10)
        .cast("long"), lit(100)).cast("long")
    df.select(id.as("doc_id"), bucket.as("split_bucket"))
      .withColumn("split",
        when(col("split_bucket") < trainPct, "train")
          .when(col("split_bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Deterministic stratified sampling: keep a row iff its hash bucket
    * `md5("sample#" || salt || "#" || id) mod 1e6` falls under the
    * stratum's rate — the quality-weighted subsampling pass a corpus
    * build runs (keep all high-quality strata, thin the rest).
    * Membership is a pure function of (id, salt): stable across runs,
    * partitionings, and engines, never resampled as the corpus grows,
    * and a different salt draws an independent sample. Narrow — no
    * shuffle, no RNG state.
    */
  /** Per-source hard cap — the C4/RefinedWeb "domain cap" curation
    * step: keep at most `cap` docs per source, chosen DETERMINISTICALLY
    * by the portable salted-md5 order (reruns, task retries, and other
    * engines pick the same survivors), doc id as the total-order
    * tiebreak. One window over the source partition; a pathologically
    * hot source costs one partition's sort — at extreme skew,
    * pre-filter with a cheap per-source count and only window the
    * sources above cap (the filter is the same salted rank, so the
    * survivor set is unchanged).
    */
  def sourceCap(
      df: DataFrame, id: Column, source: Column, cap: Int,
      salt: String = "c1"): DataFrame = {
    require(cap >= 1, "cap must be >= 1")
    val rank = conv(
      substring(md5(concat(lit(s"cap#$salt#"), id.cast("string"))), 1, 14),
      16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(source)
      .orderBy(rank.asc, id.cast("string").asc)
    df.select(id.as("doc_id"), source.as("source"),
        row_number().over(w).cast("long").as("cap_rank"))
      .where(col("cap_rank") <= cap)
  }

  /** Temperature-based source mixing at α = 0.5 — the rebalancing pass a
    * multi-source corpus gets before export (Pile/ROOTS-style): source s
    * keeps docs at rate `sqrt(c_ref / c_s)` with `c_ref` the smallest
    * source's count, so over-represented sources thin toward the
    * uniform mix while the smallest keeps everything (α = 0.5 between
    * natural α = 1 and uniform α = 0). Membership is the deterministic
    * salted-hash bucket under a per-source cutoff.
    *
    * α is fixed at 0.5 DELIBERATELY: `sqrt`, double division, multiply,
    * and `floor` are all exactly-rounded IEEE-754 ops, so any engine
    * lands on the identical integer cutoff — a general `pow(x, α)` has
    * no cross-engine rounding guarantee (the same reproducibility
    * reasoning as the md5 hashes). Plan: one tiny per-source count
    * aggregate, a broadcast of |sources| cutoff rows, and a narrow
    * filter — no wide shuffle of the corpus itself.
    *
    * Output (survivors only): `(doc_id, source, n_source, mix_cutoff,
    * mix_bucket)`.
    */
  def sourceMix(
      df: DataFrame, id: Column, source: Column,
      salt: String = "m1"): DataFrame = {
    val denom = 1000000L
    val base = df.select(id.as("doc_id"), source.as("source"))
    val counts = base.groupBy("source").agg(count(lit(1)).as("n_source"))
    val cref = counts.agg(min(col("n_source")).as("_cref"))
    val cutoffs = counts.crossJoin(broadcast(cref))
      .withColumn("mix_cutoff",
        floor(sqrt(col("_cref").cast("double") / col("n_source").cast("double"))
          * denom).cast("long"))
      .drop("_cref")
    val bucket = pmod(
      conv(substring(md5(concat(lit(s"mix#$salt#"),
        col("doc_id").cast("string"))), 1, 14), 16, 10).cast("long"),
      lit(denom))
    base.join(broadcast(cutoffs), Seq("source"))
      .withColumn("mix_bucket", bucket)
      .where(col("mix_bucket") < col("mix_cutoff"))
      .select("doc_id", "source", "n_source", "mix_cutoff", "mix_bucket")
  }

  def stratifiedSample(
      df: DataFrame, id: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = "s1"): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 1),
      "sampling rates must be in [0, 1]")
    val denom = 1000000L
    val bucket = pmod(
      conv(substring(md5(concat(lit(s"sample#$salt#"), id.cast("string"))),
        1, 14), 16, 10).cast("long"), lit(denom))
    val rateCol = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(stratum === k, lit(r)).otherwise(acc)
    }
    // filter in the ORIGINAL column scope (bucket/rate reference the
    // caller's id/stratum expressions), then project the output names
    df.where(bucket < (rateCol * denom).cast("long"))
      .select(id.as("doc_id"), stratum.as("stratum"),
        bucket.cast("long").as("sample_bucket"))
  }

  /** Corpus-frequency rarity score — the unigram-LM-shaped quality
    * signal (docs dominated by rare tokens are OCR junk / codey noise;
    * docs of only ultra-common tokens are boilerplate): each token's
    * corpus-wide occurrence count reduces to its MAGNITUDE
    * `length(bin(count))` = floor(log2) + 1, and a document scores the
    * occurrence-weighted mean magnitude of its tokens. Magnitude
    * instead of `-log p` DELIBERATELY: `bin()` is pure integer/string
    * in both engines, where a float `log` carries no cross-engine
    * rounding guarantee (the α = 0.5 reasoning from [[sourceMix]]). A
    * production pipeline swaps a real LM (KenLM perplexity) into the
    * same shape — per-token statistic, corpus aggregate, join back,
    * weighted per-doc mean.
    *
    * Scale shape: one pre-aggregation to distinct `(doc, token,
    * n_occ)` (bounds the join volume at distinct pairs, not token
    * occurrences), one vocab aggregate, one join back keyed by token —
    * stop-word-grade hot keys pre-shrunk by the pair aggregation, AQE
    * skew-join handles the rest — and one per-doc sum. Output:
    * `(doc_id, n_tokens, sum_mag, avg_mag)`.
    */
  def rarityScore(df: DataFrame, text: Column, id: Column): DataFrame = {
    val pairs = df.select(id.as("doc_id"), explode(words(text)).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("n_occ"))
    val vocab = pairs.groupBy("tok")
      .agg(sum(col("n_occ")).as("_c"))
      .select(col("tok"), length(bin(col("_c"))).cast("long").as("_mag"))
    pairs.join(vocab, Seq("tok"))
      .groupBy("doc_id")
      .agg(sum(col("n_occ")).as("n_tokens"),
        sum(col("n_occ") * col("_mag")).as("sum_mag"))
      .withColumn("avg_mag",
        col("sum_mag").cast("double") / col("n_tokens"))
  }

  /** Corpus BIGRAM-LM surprise — the CCNet-perplexity-filter shape (a
    * doc whose token TRANSITIONS are improbable under the corpus's own
    * bigram statistics is OCR junk, shuffled boilerplate, or wrong-
    * language text that unigram rarity misses: every word common, the
    * sequence nonsense). Per bigram `w1 w2`, the surprise is the
    * integer-magnitude analogue of `-log2 P(w2|w1)` under add-one
    * smoothing:
    *
    *   surprise(w1 w2) = mag(c(w1·) + V) − mag(c(w1 w2) + 1)
    *
    * with `mag(x) = length(bin(x))` = floor(log2)+1, `c(w1 w2)` the
    * corpus bigram count, `c(w1·)` the context total, and `V` the
    * CONTEXT vocabulary size (distinct leading tokens — derivable from
    * the already-aggregated context table, where full-vocab V would
    * re-scan the corpus a fourth time; any fixed corpus constant works
    * as the smoothing mass, the SHAPE is the contract) — all INTEGER
    * arithmetic, so per-doc sums are exact and order-independent in
    * both engines (the [[rarityScore]] reasoning; a float `ln` + AVG
    * would hash-differ on summation order alone). The doc scores the
    * occurrence-weighted mean surprise; `< 2` tokens → no bigrams →
    * the doc is absent (nothing to score). A production pipeline swaps
    * a trained KenLM into the identical shape — per-transition
    * statistic, corpus aggregate, join back, weighted per-doc mean.
    *
    * Scale shape: pre-aggregation to distinct `(doc, bigram, n_occ)`
    * bounds the join at distinct pairs; the global bigram and context
    * tables are vocabulary-bounded aggregates over the SAME pair
    * lineage (Spark re-derives it per branch — three narrow corpus
    * scans; kept over a persist by the d03 rule, probed in-session at
    * sf0.1: min-of-6 re-derive 0.96 s vs checkpoint-once 0.99 s — the
    * materialization buys nothing because the scans prune to
    * `(doc_id, text)` and the pair aggregation dominates);
    * V rides in as a broadcast one-row cross join
    * (never a driver action); stop-word-grade hot contexts pre-shrunk
    * by the pair aggregation, AQE skew-join for the rest. Output:
    * `(doc_id, n_bigrams, sum_surprise, avg_surprise)`.
    */
  def lmScore(df: DataFrame, text: Column, id: Column): DataFrame = {
    val toks = df.select(id.as("doc_id"), words(text).as("_w"))
    val pairs = toks
      .where(size(col("_w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(_w) - 1), " +
          "i -> concat(element_at(_w, i), ' ', element_at(_w, i + 1)))"))
        .as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("n_occ"))
    val global = pairs.groupBy("bg").agg(sum(col("n_occ")).as("_c_bg"))
    val ctx = global
      .select(substring_index(col("bg"), " ", 1).as("_w1"), col("_c_bg"))
      .groupBy("_w1").agg(sum(col("_c_bg")).as("_c_ctx"))
    val vocabSize = ctx.agg(count(lit(1)).as("_v"))
    pairs
      .join(global, Seq("bg"))
      .withColumn("_w1", substring_index(col("bg"), " ", 1))
      .join(ctx, Seq("_w1"))
      .crossJoin(broadcast(vocabSize))
      .withColumn("_surprise",
        length(bin(col("_c_ctx") + col("_v"))).cast("long") -
          length(bin(col("_c_bg") + lit(1L))).cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("n_occ")).as("n_bigrams"),
        sum(col("n_occ") * col("_surprise")).as("sum_surprise"))
      .withColumn("avg_surprise",
        col("sum_surprise").cast("double") / col("n_bigrams"))
  }

  /** Hash-feature LINEAR classifier margin — the fasttext-shaped
    * model-based quality filter (the DCLM/FineWeb-Edu curation step):
    * every token hashes into a weight in [-1, 1] and the document's
    * margin is the left-fold sum in token order plus a bias; positive
    * margin = keep. The weights here are the deterministic md5 stub —
    * a PRODUCTION deployment swaps learned weights in by replacing
    * `weight` with a lookup against a broadcast vocabulary table, and
    * the shape (per-token weight → fixed-order fold → threshold) is
    * unchanged.
    *
    * Portability, stated precisely: the fold is LEFT-ASSOCIATED in
    * token order in both engines (Spark `aggregate(.., 0.0, +)` and
    * DuckDB `list_reduce(+)` produce the identical IEEE rounding
    * sequence — float addition is not associative, so the ORDER is the
    * contract), the weight `((h mod 2001) - 1000) / 1000.0` is one
    * exactly-rounded division, and no transcendental (sigmoid) enters:
    * the margin is the decision surface, monotone with the
    * probability. Narrow, no shuffle. Output:
    * `(doc_id, n_tokens, margin, keep)`.
    */
  def hashClassifier(
      df: DataFrame, text: Column, id: Column,
      bias: Double = 0.0, salt: String = "q1"): DataFrame = {
    val w = words(text)
    val weights = transform(w, t =>
      ((pmod(conv(substring(md5(concat(lit(s"w#$salt#"), t)), 1, 14),
        16, 10).cast("long"), lit(2001L)) - 1000L).cast("double")
        / lit(1000.0)))
    df.select(id.as("doc_id"),
        size(w).cast("long").as("n_tokens"),
        (aggregate(weights, lit(0.0d), (acc, x) => acc + x) + bias)
          .as("margin"))
      .withColumn("keep", col("margin") > 0.0d)
  }

  /** Corpus length histogram: fixed-width buckets over the word count
    * (last bucket open-ended) — the shape/shard-balance diagnostic every
    * corpus build reports. One partial-aggregated shuffle on ≤ nBuckets
    * keys.
    */
  def lengthHistogram(
      df: DataFrame, text: Column, width: Int, nBuckets: Int): DataFrame =
    df.select(size(words(text)).cast("long").as("_n"))
      .select(least(floor(col("_n") / width), lit(nBuckets - 1))
        .cast("long").as("bucket"), col("_n"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("_n")).as("min_words"), max(col("_n")).as("max_words"))

  /** Normalized-content fingerprint: md5 over lowercased,
    * whitespace-collapsed, trimmed text.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Rolling-hash parameters: polynomial base and a sub-2^30 prime so
    * `acc·B + x` never exceeds int64 under DuckDB's checked arithmetic.
    */
  val RollP: Long = 999999937L
  val RollB: Long = 100003L

  /** Polynomial rolling-hash fingerprint over the token stream:
    * `acc_i = (acc_{i-1}·B + h(w_i)) mod p` with `h` the portable
    * 14-hex-digit md5 base hash. Token-order-sensitive (unlike set-based
    * md5 fingerprints) and incrementally extendable, which is what makes
    * rolling hashes the tool for shift-tolerant chunk fingerprinting. A
    * narrow per-row fold — no shuffle.
    */
  def rollingFingerprint(tokens: Column): Column = {
    val hashed = transform(tokens, w =>
      pmod(conv(substring(md5(w), 1, 14), 16, 10).cast("long"), lit(RollP)))
    aggregate(hashed, lit(0L),
      (acc, x) => (acc * lit(RollB) + x) % lit(RollP))
  }
}
