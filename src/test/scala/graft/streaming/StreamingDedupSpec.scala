package graft.streaming

import graft.TestSpark
import graft.operators.Dedup
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for all-history streaming dedup:
  *
  *  - state crosses micro-batches (a later batch's doc is judged
  *    against a fingerprint first seen batches earlier — the thing the
  *    watermark-scoped `dropDuplicates` in IngestPipelineSpec cannot
  *    do);
  *  - id-ordered replay reproduces the batch [[Dedup.exact]] verdicts
  *    exactly (first-arrival ≡ min-id when arrival order is id order);
  *  - micro-batch slicing does not change verdicts.
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def drain(
      batches: Seq[Seq[(Long, String)]]): Seq[(Long, String, Long, Boolean)] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Boolean)]
    val q = StreamingDedup.verdicts(
        mem.toDF().toDF("doc_id", "text"), col("text"), col("doc_id"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        out.synchronized {
          out ++= b.collect().map(r =>
            (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
        }
        ()
      }
      .start()
    batches.foreach { rows =>
      mem.addData(rows: _*)
      q.processAllAvailable()
    }
    q.stop()
    out.toSeq
  }

  test("fingerprint state crosses micro-batches") {
    val got = drain(Seq(
      Seq((1L, "alpha beta gamma"), (2L, "Alpha  BETA gamma"),
        (5L, "wholly different")),
      Seq((3L, "ALPHA beta GAMMA"), (4L, "fresh content")),
      Seq((6L, "fresh  CONTENT"))))
      .map(v => v._1 -> ((v._3, v._4))).toMap
    assert(got(1L) == ((1L, false)))
    assert(got(2L) == ((1L, true)))
    assert(got(5L) == ((5L, false)))
    // batch-2 and batch-3 dups resolve against state from EARLIER batches
    assert(got(3L) == ((1L, true)))
    assert(got(4L) == ((4L, false)))
    assert(got(6L) == ((4L, true)))
    assert(got.size == 6)
  }

  test("id-ordered replay ≡ batch Dedup.exact; slicing-invariant") {
    import spark.implicits._
    val corpus = Seq(
      (10L, "one common text"), (11L, "one  COMMON text"),
      (12L, "unique a"), (13L, "unique b"), (14L, "ONE common TEXT"),
      (15L, "unique  A"))
    val expected = Dedup.exact(
        corpus.toDF("doc_id", "text"), col("text"), col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    for (slicing <- Seq(Seq(corpus), corpus.grouped(2).toSeq,
        corpus.map(Seq(_)))) {
      val got = drain(slicing)
        .map(v => (v._1, v._3, v._4)).sortBy(_._1)
      assert(got == expected, s"slicing ${slicing.map(_.size)}")
    }
  }
}
