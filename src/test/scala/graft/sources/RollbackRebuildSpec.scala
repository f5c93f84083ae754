package graft.sources

import graft.TestSpark
import graft.format.{AzofTable, TableSchema}
import graft.operators.Dedup
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The rollback reconciliation contract, end to end: the change feed
  * deliberately skips `op = "rollback"` (its files' rows were fed when
  * first committed — re-feeding would double-apply in mirrors), so a
  * CDC-maintained dedup index goes STALE across a corpus rollback and
  * the documented escape hatch is the epoch rebuild. This spec proves
  * the whole path: bad batch ingested → corpus rolled back to the
  * tagged good version → the next ingest is a feed no-op and the old
  * index still carries the bad batch's labels → `rebuildEpoch` over
  * the restored corpus produces an assignment ≡ the one-shot pipeline
  * on the restored corpus, with the rolled-back docs' leftover
  * SIGNATURES unable to leak in (their candidates cannot verify — no
  * live text to shingle).
  */
class RollbackRebuildSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String) = Instant.parse(s)

  private val srcSchema = graft.format.TableSchema(Seq(
    graft.format.ColumnDef("text", graft.format.ColumnType.AzString,
      nullable = false)))

  private def rows(docs: Seq[(Long, String)], at: String) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map { case (i, t) =>
        Row(i.toString, Timestamp.from(ts(at)), t) }),
      srcSchema.toStruct)

  private def fam(prefix: String, last: String) =
    ((1 to 7).map(w => s"$prefix$w") :+ last).mkString(" ")

  private def oneShot(lake: String): Map[Long, Long] = {
    val cur = graft.operators.AzofScan.scan(spark, lake, "docs")
      .select(col(TableSchema.KeyName).cast("long").as("doc_id"),
        col("text"))
    val cands = Dedup.lshCandidates(
      Dedup.minhashBands(cur, col("text"), col("doc_id"),
        k = MinHashIndex.K, bandSize = MinHashIndex.BandSize),
      MinHashIndex.NBands)
    val pairs = Dedup.ngramJaccard(cands,
        Dedup.shingles(cur, col("text"), col("doc_id")))
      .where(col("jaccard") >= 0.5)
    Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def assignment(idxLake: String, cc: String): Map[Long, Long] =
    CcIndex.assignment(spark, idxLake, cc)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("bad batch → rollback to tag → stale index → rebuildEpoch ≡ one-shot on restored corpus") {
    val srcLake = Files.createTempDirectory("azof-rrb-src").toString
    val idxLake = Files.createTempDirectory("azof-rrb-idx").toString
    val ck = Files.createTempDirectory("azof-rrb-ck").toString
    AzofWriter.createTable(spark, srcLake, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))                                    // v1
    AzofWriter.commitBase(spark, srcLake, "docs", rows(Seq(
      1L -> fam("w", "alpha"),
      2L -> fam("w", "beta"),
      4L -> "completely different text entirely"),
      "2024-01-02T00:00:00Z"))                                       // v2
    AzofWriter.tagVersion(spark, srcLake, "docs", "known-good")      // v3
    DedupFlow.create(spark, idxLake)
    val r1 = DedupFlow.ingest(spark, srcLake, "docs", "text", idxLake,
      ck, ts("2024-02-01T00:00:00Z"))
    assert(!r1.noop)
    val good = assignment(idxLake, "components")
    assert(good == oneShot(srcLake) && good(1L) == 1L && good(2L) == 1L)

    // the BAD crawl batch: 7 joins the wfam cluster, 3/5 form a new one
    AzofWriter.commitDelta(spark, srcLake, "docs", rows(Seq(
      7L -> fam("w", "gamma"),
      3L -> fam("v", "alpha"),
      5L -> fam("v", "beta")),
      "2024-02-05T00:00:00Z"),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v4
    val r2 = DedupFlow.ingest(spark, srcLake, "docs", "text", idxLake,
      ck, ts("2024-03-01T00:00:00Z"))
    assert(r2.churned == 3)
    val bad = assignment(idxLake, "components")
    assert(bad(7L) == 1L && bad(3L) == 3L && bad(5L) == 3L,
      s"bad batch must have clustered: $bad")

    // ROLL BACK the corpus to the tagged good version
    val tagged = AzofTable(spark, srcLake, "docs")
      .resolveVersion("known-good").toLong
    AzofWriter.rollback(spark, srcLake, "docs", tagged)              // v5
    assert(oneShot(srcLake) == good, "restored corpus ≡ the good state")

    // the next ingest sees NO feed rows (the change feed skips the
    // rollback commit) — the index KEEPS the bad labels: this is the
    // documented staleness the rebuild hatch exists for
    val r3 = DedupFlow.ingest(spark, srcLake, "docs", "text", idxLake,
      ck, ts("2024-04-01T00:00:00Z"))
    assert(r3.churned == 0, s"rollback must feed no churn: $r3")
    assert(assignment(idxLake, "components") == bad,
      "the CDC-maintained index is (documented) stale after rollback")

    // the escape hatch: epoch rebuild over the restored corpus. The
    // rolled-back docs' signatures are still in the index lake — their
    // candidate pairs must NOT leak in (no live text to verify against)
    val n = DedupFlow.rebuildEpoch(spark, srcLake, "docs", "text",
      idxLake, ck, ts("2024-05-01T00:00:00Z"),
      newCcTable = "components_v2")
    val rebuilt = assignment(idxLake, "components_v2")
    assert(rebuilt == good,
      s"rebuild must equal the one-shot on the restored corpus: $rebuilt")
    assert(n == rebuilt.size.toLong)
    assert(!rebuilt.contains(7L) && !rebuilt.contains(3L),
      "ghost signatures must not resurrect rolled-back docs")

    // serving from the new epoch: survivors over the restored corpus
    val surv = DedupFlow.survivors(spark, srcLake, "docs",
      idxLake, "components_v2")
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    // keepCanonical EMITS survivors only: 1 (the cluster's min live
    // doc) and 4 (unclustered); 2 is deduplicated away, and none of
    // the rolled-back docs appear
    assert(surv.keySet == Set(1L, 4L), s"survivors: $surv")
    assert(surv(1L) && !surv(4L))
  }
}
