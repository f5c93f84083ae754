package graft.sources

import graft.TestSpark
import graft.format.{AzofTable, TableSchema}
import graft.operators.Similarity
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted PQ-code index ([[PqIndex]]): incremental refresh from the
  * source change feed must keep the index ≡ re-encoding the evolved
  * source under the FROZEN model — upserts, vector rewrites, deletes,
  * and delete-then-resurrect all included — and index-answered search
  * must equal recompute-based search batch-for-batch.
  */
class PqIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dims = 8
  private def ts(s: String) = Instant.parse(s)

  /** Deterministic little corpus: id → 8-dim vector. */
  private def vec(i: Long, salt: Int = 0): Array[Double] =
    Array.tabulate(dims)(d => ((i * 31 + d * 7 + salt * 13) % 97) / 97.0)

  private val srcSchema = graft.format.TableSchema(Seq(
    graft.format.ColumnDef("vec", graft.format.ColumnType.AzString,
      nullable = false)))

  private def rows(ids: Seq[Long], at: String, salt: Int = 0) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(ids.map(i => Row(
        i.toString, Timestamp.from(ts(at)),
        vec(i, salt).mkString("[", ",", "]")))),
      srcSchema.toStruct)

  test("index ≡ recompute across upserts, rewrites, deletes, resurrects; refreshes are incremental") {
    val lake = Files.createTempDirectory("azof-pqidx").toString
    val ck = Files.createTempDirectory("azof-pqidx-ck").toString
    AzofWriter.createTable(spark, lake, "src", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "src",
      rows(0L until 10L, "2024-01-02T00:00:00Z"))                    // v2

    val model = PqIndex.create(spark, lake, "src", "vec",
      lake, "codes", numSub = 2, codebookBits = 2, lloydIters = 0)
    def sync(): Unit = {
      PqIndex.refresh(spark, lake, "src", "vec", lake, "codes", ck)
        .awaitTermination(120000); ()
    }
    sync()

    // persisted codes ≡ pqEncode over the source's Current vectors
    def recompute(): Map[Long, Seq[Byte]] = {
      val e = graft.operators.AzofScan.scan(spark, lake, "src")
        .select(col(TableSchema.KeyName).cast("long").as("_id"),
          from_json(col("vec"), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)).as("_v"))
      Similarity.pqEncode(e, model).as[(Long, Array[Byte])]
        .collect().map { case (i, c) => i -> c.toSeq }.toMap
    }
    def persisted(): Map[Long, Seq[Byte]] =
      PqIndex.codesFrame(spark, lake, "codes").as[(Long, Array[Byte])]
        .collect().map { case (i, c) => i -> c.toSeq }.toMap
    assert(persisted() == recompute())
    assert(persisted().keySet == (0L until 10L).toSet)

    // evolve: new vectors, a changed vector, a delete, a resurrect
    AzofWriter.commitDelta(spark, lake, "src",
      rows(10L until 14L, "2024-02-05T00:00:00Z"),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    AzofWriter.commitDelta(spark, lake, "src",
      rows(Seq(3L), "2024-03-05T00:00:00Z", salt = 9),               // rewrite
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))        // v4
    AzofWriter.commitDelete(spark, lake, "src", Seq("7"),
      ts("2024-04-02T00:00:00Z"))                                    // v5
    AzofWriter.commitDelete(spark, lake, "src", Seq("5"),
      ts("2024-04-02T00:00:00Z"))                                    // v6
    AzofWriter.commitDelta(spark, lake, "src",
      rows(Seq(7L), "2024-05-05T00:00:00Z", salt = 2),               // resurrect
      ts("2024-05-01T00:00:00Z"), ts("2024-06-01T00:00:00Z"))        // v7
    val idxVerBefore = AzofTable(spark, lake, "codes").currentVersion.toLong
    sync()

    // the frozen-model equivalence on the EVOLVED source: persisted
    // codes == re-encoding today's Current, key for key (5 deleted,
    // 3 re-coded from its new vector, 7 back with its new vector)
    val want = recompute()
    assert(persisted() == want)
    assert(!persisted().contains(5L))
    assert(persisted()(3L) == Similarity.pqEncode(
      Seq((3L, vec(3L, 9))).toDF("_id", "_v"), model)
      .as[(Long, Array[Byte])].collect().head._2.toSeq)

    // INCREMENTAL: the catch-up refresh landed one delta commit whose
    // rows are exactly the churned keys — never a full re-encode
    val idxVerAfter = AzofTable(spark, lake, "codes").currentVersion.toLong
    assert(idxVerAfter == idxVerBefore + 1,
      s"expected one catch-up commit, got $idxVerBefore -> $idxVerAfter")
    val delivered = AzofChangeFeed.between(spark, lake, "codes",
        idxVerBefore, idxVerAfter)
      .select(col(TableSchema.KeyName), col("_deleted"))
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toSet
    assert(delivered == Set("10" -> false, "11" -> false, "12" -> false,
      "13" -> false, "3" -> false, "7" -> false, "5" -> true,
      "7" -> true),
      s"catch-up range must carry exactly the churn: $delivered")

    // index-answered ADC search ≡ recompute-based search on the same
    // frozen model (with and without the exact-refine join)
    val e = graft.operators.AzofScan.scan(spark, lake, "src")
      .select(col(TableSchema.KeyName).cast("long").as("_id"),
        from_json(col("vec"), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)).as("_v"))
    val queries = Array(0L, 3L, 11L).map(i => (i,
      e.where(col("_id") === i).as[(Long, Array[Double])].collect().head._2))
    for (rr <- Seq(0, 4)) {
      val fromIndex = PqIndex.topK(spark, lake, "codes", queries, k = 3,
        rerank = rr, rawVectors = if (rr > 0) Some(e) else None)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val fromRecompute = Similarity.pqSearchBatch(e,
        Similarity.pqEncode(e, model), model, queries, k = 3, rerank = rr)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(fromIndex == fromRecompute, s"rerank=$rr diverged")
      assert(fromIndex.map(_._1) == queries.map(_._1).toSet)
    }

    // the model sidecar round-trips exactly (frozen = bit-stable)
    val back = PqIndex.readModel(spark, lake, "codes")
    assert(back.numSub == model.numSub && back.subDim == model.subDim)
    assert(back.books.flatten.flatten.toSeq == model.books.flatten.flatten.toSeq)
  }
}
