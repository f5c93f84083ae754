package graft.sources

import graft.TestSpark
import graft.format.AzofTable
import graft.operators.Dedup
import java.nio.file.Files
import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite

/** Persisted component-assignment index ([[CcIndex]]): incremental
  * pair-batch refreshes must converge to exactly the one-shot
  * connected-components labeling — including the hard case where a
  * later batch MERGES previously-separate components and every member
  * relabels — while committing only changed rows and nothing at all
  * for a no-op batch.
  */
class CcIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Instant.parse(s)

  private def pairsDf(ps: Seq[(Long, Long)]) =
    ps.toDF("doc_a", "doc_b")

  private def labels(lake: String): Map[Long, Long] =
    CcIndex.assignment(spark, lake, "cc").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def freshIndex(): String = {
    val lake = Files.createTempDirectory("azof-ccidx").toString
    CcIndex.create(spark, lake, "cc")
    lake
  }

  test("incremental refreshes ≡ one-shot CC; merge relabels; no-op commits nothing") {
    val lake = freshIndex()
    // batch 1: two separate clusters {2,7,9} and {4,5}
    val b1 = Seq((7L, 2L), (9L, 7L), (5L, 4L))
    val n1 = CcIndex.refreshWithPairs(spark, lake, "cc", pairsDf(b1),
      "doc_a", "doc_b", ts("2024-02-01T00:00:00Z"))
    assert(n1 == 5, "first refresh writes every labeled doc once")
    assert(labels(lake) == Map(2L -> 2L, 7L -> 2L, 9L -> 2L,
      4L -> 4L, 5L -> 4L))

    // batch 2: a bridge 9-5 merges the clusters, and a new pair (11,12)
    // arrives; {4,5} must relabel to root 2, the new pair labels to 11
    val b2 = Seq((9L, 5L), (12L, 11L))
    val n2 = CcIndex.refreshWithPairs(spark, lake, "cc", pairsDf(b2),
      "doc_a", "doc_b", ts("2024-03-01T00:00:00Z"))
    assert(n2 == 4, s"merge writes exactly {4,5 relabel; 11,12 new}, got $n2")
    val expect = Map(2L -> 2L, 7L -> 2L, 9L -> 2L, 4L -> 2L, 5L -> 2L,
      11L -> 11L, 12L -> 11L)
    assert(labels(lake) == expect)

    // one-shot CC over the full pair set must agree
    val oneShot = Dedup.connectedComponents(
      pairsDf(b1 ++ b2), "doc_a", "doc_b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(oneShot == expect, "incremental ≢ batch clustering")

    // a batch of already-known pairs teaches nothing: no rows, no commit
    val vBefore = AzofTable(spark, lake, "cc").currentVersion
    val n3 = CcIndex.refreshWithPairs(spark, lake, "cc",
      pairsDf(Seq((7L, 2L), (9L, 5L))), "doc_a", "doc_b",
      ts("2024-04-01T00:00:00Z"))
    assert(n3 == 0)
    assert(AzofTable(spark, lake, "cc").currentVersion == vBefore,
      "no-op refresh must not commit a version")
  }

  test("time travel across clustering generations") {
    val lake = freshIndex()
    CcIndex.refreshWithPairs(spark, lake, "cc",
      pairsDf(Seq((3L, 1L), (8L, 6L))), "doc_a", "doc_b",
      ts("2024-02-01T00:00:00Z"))
    CcIndex.refreshWithPairs(spark, lake, "cc",
      pairsDf(Seq((6L, 3L))), "doc_a", "doc_b",
      ts("2024-03-01T00:00:00Z"))
    // current: all merged under 1
    assert(labels(lake) == Map(1L -> 1L, 3L -> 1L, 6L -> 1L, 8L -> 1L))
    // the pre-merge generation is still addressable by event time
    val before = graft.operators.AzofScan.scan(spark, lake, "cc",
      graft.format.AsOf.EventTime(ts("2024-02-15T00:00:00Z")))
      .select(graft.format.TableSchema.KeyName, "component_id")
      .collect().map(r => (r.getString(0).toLong, r.getString(1).toLong))
      .toMap
    assert(before == Map(1L -> 1L, 3L -> 1L, 6L -> 6L, 8L -> 6L),
      "event-time view must show the pre-merge labeling")
  }

  test("deep chain split across batches converges via the contraction path") {
    val lake = freshIndex()
    // a 400-vertex path, delivered as two interleaved halves: batch 1
    // has every even-start edge (a disjoint matching), batch 2 the odd
    // ones that stitch the matching into one long chain — the worst
    // case for pure propagation, which the contraction fallback owns
    val edges = (1L until 400L).map(i => (i + 1, i))
    val (b1, b2) = edges.partition(_._2 % 2 == 1)
    CcIndex.refreshWithPairs(spark, lake, "cc", pairsDf(b1),
      "doc_a", "doc_b", ts("2024-02-01T00:00:00Z"))
    CcIndex.refreshWithPairs(spark, lake, "cc", pairsDf(b2),
      "doc_a", "doc_b", ts("2024-03-01T00:00:00Z"))
    val got = labels(lake)
    assert(got.size == 400 && got.values.forall(_ == 1L),
      s"chain must collapse to root 1; got ${got.filter(_._2 != 1L).take(5)}")
  }
}
