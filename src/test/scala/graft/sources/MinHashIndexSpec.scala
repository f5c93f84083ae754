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

/** Persisted MinHash signature index ([[MinHashIndex]]): incremental
  * refresh keeps the index ≡ recomputing d02's signature pipeline over
  * the evolved source, including the shrinking-document tombstone; and
  * candidate pairs answered from the index equal d02's.
  */
class MinHashIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Instant.parse(s)

  private val srcSchema = graft.format.TableSchema(Seq(
    graft.format.ColumnDef("text", graft.format.ColumnType.AzString,
      nullable = false)))

  private def doc(i: Long, words: String*) = (i, words.mkString(" "))

  private def rows(docs: Seq[(Long, String)], at: String) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map { case (i, t) =>
        Row(i.toString, Timestamp.from(ts(at)), t) }),
      srcSchema.toStruct)

  test("index ≡ d02 signature recompute across churn; shrunk docs tombstone; candidates match") {
    val lake = Files.createTempDirectory("azof-mhidx").toString
    val ck = Files.createTempDirectory("azof-mhidx-ck").toString
    AzofWriter.createTable(spark, lake, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    val base = Seq(
      doc(1, "the", "quick", "brown", "fox", "jumps"),
      doc(2, "the", "quick", "brown", "fox", "leaps"),
      doc(3, "lorem", "ipsum", "dolor", "sit", "amet"),
      doc(4, "completely", "different", "text", "entirely"),
      doc(5, "too", "short")) // < 3 words -> never signed
    AzofWriter.commitBase(spark, lake, "docs",
      rows(base, "2024-01-02T00:00:00Z"))                            // v2

    MinHashIndex.create(spark, lake, "sigs")
    def sync(): Unit = {
      MinHashIndex.refresh(spark, lake, "docs", "text", lake, "sigs", ck)
        .awaitTermination(120000); ()
    }
    sync()

    def persisted(): Map[Long, Seq[String]] =
      MinHashIndex.signatures(spark, lake, "sigs")
        .collect().map(r => r.getLong(0) ->
          (1 to MinHashIndex.NBands).map(r.getString).toSeq).toMap
    def recompute(): Map[Long, Seq[String]] = {
      val cur = graft.operators.AzofScan.scan(spark, lake, "docs")
      Dedup.minhashSignatures(
          Dedup.shingles(cur, col("text"),
            col(TableSchema.KeyName).cast("long")),
          MinHashIndex.K, MinHashIndex.BandSize)
        .collect().map(r => r.getLong(0) ->
          (1 to MinHashIndex.NBands).map(r.getString).toSeq).toMap
    }
    assert(persisted() == recompute())
    assert(persisted().keySet == Set(1L, 2L, 3L, 4L), "doc 5 has no 3-gram")

    // churn: new near-dup of 3, doc 1 rewritten, doc 4 deleted, doc 2
    // SHRINKS below the shingle floor (stale signature must tombstone)
    AzofWriter.commitDelta(spark, lake, "docs",
      rows(Seq(doc(6, "lorem", "ipsum", "dolor", "sit", "consectetur")),
        "2024-02-05T00:00:00Z"),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    AzofWriter.commitDelta(spark, lake, "docs",
      rows(Seq(doc(1, "totally", "new", "body", "now")),
        "2024-03-05T00:00:00Z"),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))        // v4
    AzofWriter.commitDelete(spark, lake, "docs", Seq("4"),
      ts("2024-04-02T00:00:00Z"))                                    // v5
    AzofWriter.commitDelta(spark, lake, "docs",
      rows(Seq(doc(2, "now", "tiny")), "2024-05-05T00:00:00Z"),
      ts("2024-05-01T00:00:00Z"), ts("2024-06-01T00:00:00Z"))        // v6
    val idxVerBefore = AzofTable(spark, lake, "sigs").currentVersion.toLong
    sync()

    val got = persisted()
    assert(got == recompute(),
      "persisted signatures diverged from recompute on the evolved source")
    assert(!got.contains(4L), "deleted doc's signature survived")
    assert(!got.contains(2L), "shrunk doc's stale signature survived")
    assert(got.contains(6L) && got.contains(1L))

    // candidates from the index ≡ candidates from full recompute
    val fromIndex = MinHashIndex.candidates(spark, lake, "sigs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cur = graft.operators.AzofScan.scan(spark, lake, "docs")
    val fromRecompute = Dedup.lshCandidates(
        Dedup.minhashSignatures(
          Dedup.shingles(cur, col("text"),
            col(TableSchema.KeyName).cast("long")),
          MinHashIndex.K, MinHashIndex.BandSize), MinHashIndex.NBands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromIndex == fromRecompute)
    assert(fromIndex.contains((3L, 6L)), "the near-dup pair must surface")

    // one catch-up commit carried exactly the churn (incl. both
    // tombstone kinds)
    val feed = AzofChangeFeed.between(spark, lake, "sigs",
        idxVerBefore, AzofTable(spark, lake, "sigs").currentVersion.toLong)
      .select(col(TableSchema.KeyName), col("_deleted"))
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toSet
    assert(feed == Set("6" -> false, "1" -> false, "4" -> true,
      "2" -> true), s"catch-up range must carry exactly the churn: $feed")
  }
}
