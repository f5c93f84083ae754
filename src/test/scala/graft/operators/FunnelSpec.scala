package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the composed filter funnel's SURVIVOR semantics — the part
  * per-stage parallel labels get wrong:
  *
  *  - the dedup canonical is elected among upstream SURVIVORS: when a
  *    fingerprint-equal case/whitespace VARIANT group's min-id member
  *    fails the quality gate, the next-lowest survivor is the
  *    canonical (no 3_exact_dup label for it);
  *  - the domain cap ranks only deduped survivors, so a source always
  *    ships exactly `cap` docs into the classifier, dups not counted;
  *  - labels are FIRST-drop (a doc failing lang never reaches quality);
  *  - every doc gets exactly one verdict.
  */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)], qualityMin: Double,
      cap: Int, bias: Double = 1000.0): Map[Long, String] =
    Funnel.verdicts(rows.toDF("doc_id", "text", "source"),
        col("text"), col("doc_id"), col("source"),
        keepLang = "en", qualityMin = qualityMin, cap = cap,
        salt = "spec", clsBias = bias)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap

  // fp-equal variants: identical after lower+collapse+trim, but the
  // padded one scores LOWER (split("\\s+", -1) keeps empty tokens, so
  // padding inflates n_words and deflates avg_word_len/stopword_ratio)
  private val variantA = "X1  THE  OF  AND  IS   "
  private val variantB = "x1 the of and is"

  private def qs(text: String): Double = {
    val df = TextAnalysis.quality(
      Seq((1L, text)).toDF("doc_id", "text"), col("text"), col("doc_id"))
    df.select(col("quality_score")).collect()(0).getDouble(0)
  }

  test("canonical is elected among survivors, not raw min id") {
    val qa = qs(variantA)
    val qb = qs(variantB)
    assert(qa < qb, "padding must lower the score via empty tokens")
    val mid = (qa + qb) / 2
    // doc 1 (min id) is the variant that FAILS quality; doc 2 passes.
    // Parallel labeling would call doc 2 a dup of doc 1; the funnel
    // must elect doc 2 canonical because doc 1 never survived to dedup.
    val v = run(Seq(
      (1L, variantA, "s1"), (2L, variantB, "s1"),
      (3L, "the of and is plain english words here", "s1")), mid, cap = 10)
    assert(v(1L) == "2_quality")
    assert(v(2L) == "kept", s"got ${v(2L)}")
    assert(v(3L) == "kept")
  }

  test("first-drop labels, dup groups, and verdict conservation") {
    val good = "the of and is sufficiently wordy english content"
    val v = run(Seq(
      (1L, "der die und ein ist", "s1"),      // fails lang first
      (2L, good, "s1"),                        // canonical of {2,4}
      (3L, "el y los un es", "s1"),            // spanish
      (4L, good, "s1"),                        // exact dup of 2
      (5L, good + " extra", "s1")), 0.0, cap = 10)
    assert(v(1L) == "1_lang")
    assert(v(3L) == "1_lang")
    assert(v(2L) == "kept")
    assert(v(4L) == "3_exact_dup")
    assert(v(5L) == "kept")
    assert(v.size == 5)
  }

  test("cap ranks deduped survivors only; classifier fires after cap") {
    val mk = (i: Long) => (i, s"the of and is document number word$i", "s1")
    // 6 distinct survivors + 3 dups of doc 100; cap 4 must ship exactly
    // 4 docs regardless of the dups
    val rows = (100L to 105L).map(mk) ++ Seq(
      (201L, mk(100L)._2, "s1"), (202L, mk(100L)._2, "s1"),
      (203L, mk(100L)._2, "s1"))
    val v = run(rows, 0.0, cap = 4)
    assert(Seq(201L, 202L, 203L).forall(v(_) == "3_exact_dup"))
    val survivors = (100L to 105L).map(v)
    assert(survivors.count(_ == "kept") == 4)
    assert(survivors.count(_ == "4_domain_cap") == 2)
    // with a crushing negative bias everything past the cap drops at 5
    val v2 = run(rows, 0.0, cap = 4, bias = -1e6)
    assert((100L to 105L).map(v2).count(_ == "5_classifier") == 4)
    assert((100L to 105L).map(v2).count(_ == "4_domain_cap") == 2)
  }
}
