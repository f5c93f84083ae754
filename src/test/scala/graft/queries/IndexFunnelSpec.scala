package graft.queries

import graft.TestSpark
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for p02, the export gate served from the persisted indexes:
  *
  *  - the PLAN promise: export-time work is index scans + per-row
  *    gates — none of the dedup/SemDeDup kernels re-run (those all
  *    pivot on a `Generate` explode of shingles/bands, so a
  *    Generate-free plan IS the no-recomputation proof), and both
  *    persisted index lakes appear as scan inputs;
  *  - the GATE expressions ([[TextAnalysis.qualityScore]],
  *    [[TextAnalysis.piiEmailCount]]/[[TextAnalysis.piiIpCount]])
  *    agree exactly with the t02/t06 audit frames — the anti-drift pin
  *    that keeps a funnel threshold and an audit report consistent;
  *  - the PII gate BITES: the shipped corpus is PII-free (so the p02
  *    oracle can't show the drop), so pin it on an injected corpus —
  *    including the URL-with-userinfo case the fixed URL → email → IP
  *    replacement order exists for.
  */
class IndexFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("p02 plan serves from the persisted indexes, no kernel re-run") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val df = Pipeline.queries("p02_index_funnel")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("Generate"),
      "export gate must not re-explode shingles/bands:\n" + plan)
    assert(plan.contains("ddflow-v1"),
      "plan must scan the persisted CC index lake")
    assert(plan.contains("semidx-v1"),
      "plan must scan the persisted SemDeDup index lake")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length < nDocs, "the composed gates must drop something")
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("quality_score")) >= 0.42)
    }
  }

  test("gate expressions match the audit frames; PII gate bites") {
    val rows = Seq(
      (1L, "plain english the of and is text"),
      (2L, "contact bob@example.com for details the of and is"),
      (3L, "server at 10.0.0.1 responded the of and is"),
      // userinfo URL: the '@' belongs to the URL, which scrubs FIRST —
      // neither an email nor an IP, so this doc passes the PII gate
      (4L, "see https://user@host.com/a?x=1 the of and is"))
      .toDF("doc_id", "text")
    val gates = rows.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("qs"),
        TextAnalysis.piiEmailCount(col("text")).as("ne"),
        TextAnalysis.piiIpCount(col("text")).as("ni"))
      .collect().map(r => r.getLong(0) -> (
        (r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap

    // exact agreement with the audit frames (bit-equal doubles: same
    // expression, same operation order)
    val audit = TextAnalysis.quality(rows, col("text"), col("doc_id"))
      .select(col("doc_id"), col("quality_score"))
      .join(TextAnalysis.piiScrub(rows, col("text"), col("doc_id"))
        .select(col("doc_id"), col("n_emails"), col("n_ips")), "doc_id")
      .collect().map(r => r.getLong(0) -> (
        (r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    assert(gates == audit)

    // the bite: email and IP docs drop, clean and userinfo-URL docs pass
    val piiFree = gates.collect {
      case (id, (_, ne, ni)) if ne == 0 && ni == 0 => id
    }.toSet
    assert(piiFree == Set(1L, 4L), s"got $piiFree")
  }
}
