package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed corpus-filter FUNNEL — the end-to-end verdict pass a
  * training-data build runs between ingestion and export (the C4 /
  * RefinedWeb / DCLM stage order): language gate → heuristic quality
  * gate → exact dedup → per-source domain cap → model-based quality
  * classifier. Stage k sees only stage k−1 SURVIVORS: the dedup
  * canonical is elected among docs that passed the language and quality
  * gates, the domain cap ranks only deduped survivors, and the
  * classifier spends its budget on docs that cleared everything else —
  * the composition semantics that per-stage parallel labels get wrong.
  *
  * Every doc receives the FIRST stage that dropped it (or `kept`), so
  * the output is both the ship list (`verdict = 'kept'`) and the funnel
  * report (`GROUP BY verdict`) in one result.
  *
  * Single-pass design, the part that matters at 100 TB: all five stage
  * verdicts are computed in ONE plan with conditional window aggregates
  * instead of per-stage anti-joins —
  *
  *   - dedup canonical: `min(CASE WHEN upstream-survivor THEN id END)
  *     OVER (PARTITION BY fingerprint)`;
  *   - domain-cap rank: a conditional running count over the
  *     salted-md5 order within the source partition —
  *     `SUM(CASE WHEN deduped-survivor THEN 1 END) OVER (PARTITION BY
  *     source ORDER BY hash, id ROWS UNBOUNDED PRECEDING)`, which
  *     equals ROW_NUMBER over the filtered set without materializing
  *     that set;
  *
  * so the whole funnel costs exactly TWO shuffles (one keyed by
  * fingerprint, one by source) regardless of stage count — no
  * per-stage materialization, no N-branch re-scan of the corpus, no
  * driver state. Per-row signals (lang scores, quality, classifier
  * margin) reuse the [[TextAnalysis]] formulas verbatim, so each
  * stage's semantics stay pinned by that stage's own oracle row.
  */
object Funnel {

  /** Per-doc funnel verdicts. Output: (doc_id, source, verdict) with
    * verdict ∈ {1_lang, 2_quality, 3_exact_dup, 4_domain_cap,
    * 5_classifier, kept} — the prefix fixes funnel order under the
    * driver's column-sorted compare.
    *
    * @param qualityMin  stage-2 floor on [[TextAnalysis.quality]]'s
    *                    composite score
    * @param keepLang    stage-1 language allowlist entry
    * @param cap         stage-4 per-source survivor cap
    * @param salt        salts the cap order and classifier weights
    *                    (`cap#salt#`, `w#salt#` — the t11/t17 contracts)
    */
  def verdicts(
      df: DataFrame, text: Column, id: Column, source: Column,
      keepLang: String, qualityMin: Double, cap: Int,
      salt: String, clsBias: Double = 0.0): DataFrame = {
    require(cap >= 1, "cap must be >= 1")
    val w = TextAnalysis.words(text)

    // stage signals, all narrow (the TextAnalysis formulas inline so the
    // whole funnel is one projection before the windows)
    val langScores = TextAnalysis.langMarkers.map { case (lang, markers) =>
      lang -> size(array_intersect(w, typedLit(markers))).cast("long")
    }
    val Seq(en, de, fr, es) = langScores.map(_._2)
    val predicted =
      when(en > 0 && en >= greatest(de, fr, es), "en")
        .when(de > 0 && de >= greatest(fr, es), "de")
        .when(fr > 0 && fr >= es, "fr")
        .when(es > 0, "es")
        .otherwise("unknown")
    val nWords = size(w).cast("long")
    val sumLen = aggregate(w, lit(0), (acc, x) => acc + length(x)).cast("long")
    val stop = size(array_intersect(w,
      typedLit(TextAnalysis.langMarkers.flatMap(_._2).distinct))).cast("long")
    val qualityScore =
      least(sumLen.cast("double") / nWords / lit(10.0), lit(1.0)) * lit(0.5) +
        stop.cast("double") / nWords * lit(0.3) +
        (lit(1.0) - regexp_count(text, lit("[0-9]")).cast("long")
          .cast("double") / length(text).cast("long")) * lit(0.2)
    val weights = transform(w, t =>
      ((pmod(conv(substring(md5(concat(lit(s"w#$salt#"), t)), 1, 14),
        16, 10).cast("long"), lit(2001L)) - 1000L).cast("double")
        / lit(1000.0)))
    val margin = aggregate(weights, lit(0.0d), (acc, x) => acc + x) + clsBias
    val capKey = conv(
      substring(md5(concat(lit(s"cap#$salt#"), id.cast("string"))), 1, 14),
      16, 10).cast("long")

    val base = df.select(
      id.as("doc_id"), source.as("source"),
      TextAnalysis.fingerprint(text).as("_fp"),
      predicted.as("_lang"), qualityScore.as("_qs"),
      margin.as("_margin"), capKey.as("_ck"))

    // stage 1+2 survivorship is per-row; stages 3 and 4 are the two
    // conditional windows described above
    val s12 = col("_lang") === keepLang && col("_qs") >= qualityMin
    val canon = min(when(s12, col("doc_id")))
      .over(Window.partitionBy(col("_fp")))
    val staged = base.withColumn("_canon", canon)
    val s3 = s12 && col("doc_id") === col("_canon")
    val capRank = sum(when(s3, 1L).otherwise(0L))
      .over(Window.partitionBy(col("source"))
        .orderBy(col("_ck").asc, col("doc_id").cast("string").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    staged.withColumn("_cap_rank", capRank)
      .select(col("doc_id"), col("source"),
        when(col("_lang") =!= keepLang, "1_lang")
          .when(col("_qs") < qualityMin, "2_quality")
          .when(col("doc_id") =!= col("_canon"), "3_exact_dup")
          .when(col("_cap_rank") > cap, "4_domain_cap")
          .when(col("_margin") <= 0.0d, "5_classifier")
          .otherwise("kept").as("verdict"))
  }
}
