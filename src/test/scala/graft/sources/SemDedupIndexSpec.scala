package graft.sources

import graft.TestSpark
import graft.format.TableSchema
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted SemDeDup verdict index ([[SemDedupIndex]]): incremental
  * refreshes keep the index ≡ a frozen-model brute force over the
  * evolved corpus — including the VERDICT FLIP, where a late-arriving
  * lower-id doc turns an existing keep into a drop — and deletes
  * tombstone without resurrecting anything.
  */
class SemDedupIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Instant.parse(s)

  private val srcSchema = graft.format.TableSchema(Seq(
    graft.format.ColumnDef("vec", graft.format.ColumnType.AzString,
      nullable = false)))

  // two obvious clusters on the axes; within-cluster cosine is high
  // (small angular jitter), across ~0
  private def vec(i: Long): Array[Double] = {
    val (bx, by) = if (i < 20) (1.0, 0.0) else (0.0, 1.0)
    val j = (i % 7).toDouble / 100.0
    Array(bx + j * by - j * bx * 0.0, by + j * bx) // unit-ish, jittered
  }

  private def rows(ids: Seq[Long], at: String) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(ids.map(i => Row(
        i.toString, Timestamp.from(ts(at)),
        vec(i).mkString("[", ",", "]")))),
      srcSchema.toStruct)

  /** Frozen-model brute force over the source's CURRENT corpus: assign
    * to the index's frozen centroids, drop iff a lower-id same-cluster
    * doc has cosine ≥ threshold. Plain Scala — the independent twin.
    */
  private def brute(
      srcLake: String, idxLake: String,
      idxTable: String = "sem"): Map[Long, (Long, Boolean)] = {
    val m = SemDedupIndex.readModel(spark, idxLake, idxTable)
    val cur = graft.operators.AzofScan.scan(spark, srcLake, "emb")
      .select(col(TableSchema.KeyName).cast("long"), col("vec"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getString(1).stripPrefix("[").stripSuffix("]")
          .split(',').map(_.trim.toDouble))
      .sortBy(_._1)
    def cluster(v: Array[Double]): Long = {
      var best = 0; var bestD = Double.PositiveInfinity
      for (c <- m.cents.indices) {
        val d = m.cents(c).zip(v).map { case (a, b) =>
          (a - b) * (a - b) }.sum
        if (d < bestD) { bestD = d; best = c }
      }
      best.toLong
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      dot / (na * nb)
    }
    val assigned = cur.map { case (i, v) => (i, cluster(v), v) }
    assigned.map { case (i, c, v) =>
      val dropped = assigned.exists { case (j, cj, vj) =>
        j < i && cj == c && cos(v, vj) >= m.threshold
      }
      i -> (c, !dropped)
    }.toMap
  }

  private def persisted(
      idxLake: String,
      idxTable: String = "sem"): Map[Long, (Long, Boolean)] =
    SemDedupIndex.verdicts(spark, idxLake, idxTable)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap

  test("index ≡ frozen-model brute force across churn; late lower-id arrival flips a keep; deletes tombstone") {
    val lake = Files.createTempDirectory("azof-semidx").toString
    val ck = Files.createTempDirectory("azof-semidx-ck").toString
    AzofWriter.createTable(spark, lake, "emb", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "emb",
      rows(Seq(10L, 11L, 20L), "2024-01-02T00:00:00Z"))              // v2

    SemDedupIndex.create(spark, lake, "emb", "vec", lake, "sem",
      k = 2, threshold = 0.9)
    def sync(): Unit = {
      SemDedupIndex.refresh(spark, lake, "emb", "vec", lake, "sem", ck)
        .awaitTermination(120000); ()
    }
    sync()

    val p1 = persisted(lake)
    assert(p1 == brute(lake, lake), s"backfill diverged: $p1")
    assert(p1(10L)._2 && !p1(11L)._2 && p1(20L)._2,
      "min id of the x-cluster keeps, its near-twin drops, y-cluster keeps")
    assert(p1(10L)._1 == p1(11L)._1 && p1(10L)._1 != p1(20L)._1)

    // batch 2: higher-id members join both clusters — verdicts against
    // the INDEX (no re-verdicting of existing rows expected)
    AzofWriter.commitDelta(spark, lake, "emb",
      rows(Seq(12L, 21L), "2024-02-05T00:00:00Z"),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    sync()
    val p2 = persisted(lake)
    assert(p2 == brute(lake, lake), s"batch 2 diverged: $p2")
    assert(!p2(12L)._2 && !p2(21L)._2,
      "both newcomers are dominated by their clusters' lower ids")

    // batch 3, the FLIP: id 5 lands in the x-cluster BELOW 10 — 5
    // keeps, 10 must flip kept -> dropped, 11/12 stay dropped
    AzofWriter.commitDelta(spark, lake, "emb",
      rows(Seq(5L), "2024-03-05T00:00:00Z"),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))        // v4
    sync()
    val p3 = persisted(lake)
    assert(p3 == brute(lake, lake), s"flip batch diverged: $p3")
    assert(p3(5L)._2, "the new minimum keeps")
    assert(!p3(10L)._2, "the old canonical must FLIP to dropped")
    assert(!p3(11L)._2 && !p3(12L)._2)

    // delete 20: tombstoned out of the verdicts; 21 stays dropped (the
    // monotone contract — no resurrect; an epoch re-create reconciles)
    AzofWriter.commitDelete(spark, lake, "emb", Seq("20"),
      ts("2024-04-02T00:00:00Z"))                                    // v5
    sync()
    val p4 = persisted(lake)
    assert(!p4.contains(20L), "deleted doc's verdict row survived")
    assert(!p4(21L)._2, "no resurrect under the monotone contract")

    // a second sync with nothing new: index version unchanged
    val verBefore = graft.format.AzofTable(spark, lake, "sem")
      .currentVersion.toLong
    sync()
    assert(graft.format.AzofTable(spark, lake, "sem")
      .currentVersion.toLong == verBefore)
  }

  private def rowsV(docs: Seq[(Long, Array[Double])], at: String) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map { case (i, v) => Row(
        i.toString, Timestamp.from(ts(at)),
        v.mkString("[", ",", "]")) }),
      srcSchema.toStruct)

  test("monotone under revision: a drifted dropped doc stays dropped; rebuildEpoch reconciles") {
    val lake = Files.createTempDirectory("azof-semrev").toString
    val ck = Files.createTempDirectory("azof-semrev-ck").toString
    AzofWriter.createTable(spark, lake, "emb", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "emb",
      rows(Seq(10L, 11L, 20L), "2024-01-02T00:00:00Z"))              // v2
    SemDedupIndex.create(spark, lake, "emb", "vec", lake, "sem",
      k = 2, threshold = 0.9)
    SemDedupIndex.refresh(spark, lake, "emb", "vec", lake, "sem", ck)
      .awaitTermination(120000)
    assert(!persisted(lake)(11L)._2, "11 starts dominated by 10")

    // 11's REVISION drifts to 60° off both axes: under a fresh
    // recompute no lower-id doc dominates it anymore — but the
    // documented contract is that revisions never resurrect a dropped
    // verdict, so the index must keep it dropped where the brute-force
    // twin (by design) disagrees
    AzofWriter.commitDelta(spark, lake, "emb",
      rowsV(Seq(11L -> Array(0.5, 0.866)), "2024-02-05T00:00:00Z"),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    SemDedupIndex.refresh(spark, lake, "emb", "vec", lake, "sem", ck)
      .awaitTermination(120000)
    val p = persisted(lake)
    assert(!p(11L)._2,
      "revision must NOT resurrect the dropped verdict (monotone)")
    assert(brute(lake, lake)(11L)._2,
      "sanity: a fresh recompute WOULD keep the drifted doc — the " +
        "divergence is exactly what the contract pins")

    // rebuildEpoch reconciles: fresh model over the current corpus,
    // one-shot verdicts ≡ the brute-force twin, drifted doc kept again
    var stats = List.empty[SemDedupIndex.RefreshStats]
    SemDedupIndex.rebuildEpoch(spark, lake, "emb", "vec", lake, "sem2",
      k = 2, threshold = 0.9, onStats = s => stats ::= s)
    val p2 = persisted(lake, "sem2")
    assert(p2 == brute(lake, lake, "sem2"),
      s"rebuilt epoch diverged from one-shot: $p2")
    assert(p2(11L)._2, "the rebuild ships the reconciled doc again")
    assert(stats.nonEmpty && stats.head.batchDocs == 3)
    assert(persisted(lake)(11L)._2 == false, "old epoch untouched")

    // the rebuilt epoch's cursor hands post-rebuild commits to refresh:
    // a FRESH checkpoint starts at the rebuild version, not at v1
    assert(SemDedupIndex.readCursor(spark, lake, "sem2").contains(3L))
    AzofWriter.commitDelta(spark, lake, "emb",
      rows(Seq(12L), "2024-03-05T00:00:00Z"),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))        // v4
    val ck2 = Files.createTempDirectory("azof-semrev-ck2").toString
    SemDedupIndex.refresh(spark, lake, "emb", "vec", lake, "sem2", ck2)
      .awaitTermination(120000)
    val p3 = persisted(lake, "sem2")
    assert(p3 == brute(lake, lake, "sem2"),
      s"post-rebuild refresh diverged: $p3")
    assert(p3.contains(12L) && !p3(12L)._2,
      "newcomer lands through the seeded cursor, dominated by 10")
  }

  test("refresh stats surface the mega-cluster signal (k frozen too small)") {
    val lake = Files.createTempDirectory("azof-semstat").toString
    val ck = Files.createTempDirectory("azof-semstat-ck").toString
    AzofWriter.createTable(spark, lake, "emb", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "emb",
      rows(1L to 10L, "2024-01-02T00:00:00Z"))                       // v2
    // k = 1: every doc lands in ONE cluster — the shape the signal is for
    SemDedupIndex.create(spark, lake, "emb", "vec", lake, "sem",
      k = 1, threshold = 0.9)
    var stats = List.empty[SemDedupIndex.RefreshStats]
    def sync(): Unit = {
      SemDedupIndex.refresh(spark, lake, "emb", "vec", lake, "sem", ck,
        onStats = s => stats ::= s,
        retain = 2, retainMinAgeMs = 0L).awaitTermination(120000); ()
    }
    sync()
    assert(stats.nonEmpty, "backfill batch must report stats")
    val backfill = stats.head
    assert(backfill.batchDocs == 10 && backfill.touchedClusters == 1)
    assert(backfill.maxTouchedCluster == 10,
      s"the whole corpus is one touched cluster: $backfill")
    assert(backfill.pairComparisons == 100,
      s"|cluster| x |batch| = 10*10: $backfill")

    // one newcomer: comparisons confined to the batch (11 = 10 existing
    // + the newcomer itself), but the mega-cluster size keeps growing —
    // the signal that k was frozen too small for the corpus
    AzofWriter.commitDelta(spark, lake, "emb",
      rows(Seq(15L), "2024-02-05T00:00:00Z"),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    sync()
    val inc = stats.head
    assert(inc.batchDocs == 1 && inc.touchedClusters == 1)
    assert(inc.maxTouchedCluster == 11, s"mega-cluster grows: $inc")
    assert(inc.pairComparisons == 11, s"cost ∝ cluster, not corpus²: $inc")

    // the retain knob kept the verdict table's history bounded across
    // the refreshes without changing the verdicts
    val snaps = new java.io.File(lake, "sem").listFiles
      .count(_.getName.matches("s\\d+\\.json"))
    assert(snaps <= 2, s"verdict-table history unbounded: $snaps")
    assert(persisted(lake).keySet == ((1L to 10L).toSet + 15L))
  }

  test("keyed mode: LEXICOGRAPHIC dominance over string keys, flip included") {
    val lake = Files.createTempDirectory("azof-semkey").toString
    val ck = Files.createTempDirectory("azof-semkey-ck").toString
    AzofWriter.createTable(spark, lake, "emb", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    def krows(docs: Seq[(String, Long)], at: String) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(docs.map { case (k, i) => Row(
          k, Timestamp.from(ts(at)), vec(i).mkString("[", ",", "]")) }),
        srcSchema.toStruct)
    // x-cluster carries doc-9/doc-11 — numerically 9 < 11 but
    // LEXICOGRAPHICALLY "doc-11" < "doc-9" ('1' < '9'), so the keyed
    // verdict must invert what numeric dominance would say. Seed check
    // (md5 'sem#<key>' order): doc-9 then url-b — one seed per cluster.
    AzofWriter.commitBase(spark, lake, "emb",
      krows(Seq(("doc-9", 10L), ("doc-11", 11L), ("url-b", 20L)),
        "2024-01-02T00:00:00Z"))                                     // v2
    SemDedupIndex.create(spark, lake, "emb", "vec", lake, "sem",
      k = 2, threshold = 0.9, keyed = true)
    assert(SemDedupIndex.readModel(spark, lake, "sem").keyed,
      "keyed mode must freeze into the model sidecar")
    def sync(): Unit = {
      SemDedupIndex.refresh(spark, lake, "emb", "vec", lake, "sem", ck)
        .awaitTermination(120000); ()
    }
    def served: Map[String, (Long, Boolean)] =
      SemDedupIndex.verdictsKeyed(spark, lake, "sem").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
        .toMap
    sync()
    val p1 = served
    assert(p1("doc-9")._1 == p1("doc-11")._1 &&
      p1("doc-9")._1 != p1("url-b")._1, s"cluster split wrong: $p1")
    assert(p1("doc-11")._2 && !p1("doc-9")._2 && p1("url-b")._2,
      s"lexicographic min key keeps — numeric order would say the " +
        s"opposite: $p1")

    // the keyed FLIP: doc-0 (identical vector to doc-11) arrives late;
    // "doc-0" < "doc-11", so the reigning keep flips
    AzofWriter.commitDelta(spark, lake, "emb",
      krows(Seq(("doc-0", 18L)), "2024-02-05T00:00:00Z"),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    sync()
    val p2 = served
    assert(p2("doc-0")._2, "the new lexicographic minimum keeps")
    assert(!p2("doc-11")._2, "the old canonical must FLIP to dropped")
    assert(!p2("doc-9")._2 && p2("url-b")._2)

    // the NUMERIC serving surface refuses a keyed table loudly
    val e = intercept[Exception] {
      SemDedupIndex.verdicts(spark, lake, "sem").collect()
    }
    assert(e.getMessage.contains("long-castable"),
      s"expected the loud cast guard, got: ${e.getMessage}")
  }
}
