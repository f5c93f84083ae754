package graft.sources

import graft.TestSpark
import graft.operators.Dedup
import java.nio.file.Files
import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite

/** Randomized property for the [[CcIndex]] star-merge: for ANY random
  * pair graph and ANY partition of its edges into ordered refresh
  * batches, the incrementally-merged assignment equals one-shot
  * connected components over the whole graph. Fixed seeds — failures
  * replay.
  */
class CcIndexPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def oneShot(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(
        pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("random edge batches merge to the one-shot fixpoint (5 seeded runs)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 7919)
      val nVerts = 30 + rnd.nextInt(20)
      val nEdges = 40 + rnd.nextInt(40)
      val pairs = Seq.fill(nEdges) {
        val a = rnd.nextInt(nVerts).toLong
        val b = rnd.nextInt(nVerts).toLong
        (a, if (a == b) (b + 1) % nVerts else b)
      }.distinct
      val nBatches = 2 + rnd.nextInt(3)
      val batches = pairs.groupBy(_ => rnd.nextInt(nBatches))
        .toSeq.sortBy(_._1).map(_._2)

      val lake = Files.createTempDirectory(s"azof-ccprop$seed").toString
      CcIndex.create(spark, lake, "cc")
      batches.zipWithIndex.foreach { case (b, i) =>
        CcIndex.refreshWithPairs(spark, lake, "cc",
          b.toDF("a", "b"), "a", "b",
          Instant.parse("2024-02-01T00:00:00Z").plusSeconds(i * 86400L))
      }
      val merged = CcIndex.assignment(spark, lake, "cc")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = oneShot(pairs)
      assert(merged == expect,
        s"seed $seed (${batches.size} batches, ${pairs.size} edges): " +
          s"merged $merged != one-shot $expect")
    }
  }
}
