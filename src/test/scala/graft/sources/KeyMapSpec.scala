package graft.sources

import graft.TestSpark
import graft.format.TableSchema
import java.nio.file.Files
import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite

/** Surrogate-id minting at scale: the rank that assigns fresh ids must
  * be the two-phase DISTRIBUTED prefix sum, never a partition-less
  * `row_number` window — a bootstrap ingest over a duplicate-heavy
  * corpus mints its entire pair-involved neighborhood in one batch, and
  * a global-sort window would funnel all of it through one task.
  * Pins: plan shape (no single-partition exchange), id density,
  * determinism across runs and partitionings, and the minted table's
  * end-to-end contract (known keys untouched, ids unique).
  */
class KeyMapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val lake = Files.createTempDirectory("azof-keymap").toString

  import org.apache.spark.sql.functions._

  private def keysDf(keys: Seq[String]) = {
    import spark.implicits._
    keys.toDF(TableSchema.KeyName)
  }

  test("rankedSids plan has NO single-partition global-sort window") {
    val fresh = keysDf((1 to 100).map(i => s"https://ex.com/p$i"))
    val ranked = KeyMap.rankedSids(fresh, 1000L)
    val plan = ranked.queryExecution.executedPlan.toString()
    assert(!plan.contains("SinglePartition"),
      s"minting rank funnels through one task:\n$plan")
    // and it still IS a dense id range
    val sids = ranked.select(col("sid").cast("long")).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(sids == (1000L until 1100L).toSeq)
  }

  test("rankedSids is deterministic across runs and partitionings") {
    val keys = (1 to 500).map(i => s"doc-$i")
    val a = KeyMap.rankedSids(keysDf(keys), 7L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val b = KeyMap.rankedSids(keysDf(scala.util.Random.shuffle(keys))
        .repartition(13), 7L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a == b)
    assert(a.values.toSet.size == 500)
  }

  test("mint end-to-end: fresh keys get dense new ids, known keys keep " +
    "theirs, empty batch commits nothing") {
    KeyMap.create(spark, lake, "km")
    val at = Instant.parse("2024-03-01T00:00:00Z")
    assert(KeyMap.mint(spark, lake, "km",
      keysDf(Seq("u1", "u2", "u3")), at) == 3L)
    val first = KeyMap.ids(spark, lake, "km").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(first.keySet == Set("u1", "u2", "u3") &&
      first.values.toSet.size == 3)

    // second batch: one known, two fresh — known id survives verbatim
    assert(KeyMap.mint(spark, lake, "km",
      keysDf(Seq("u2", "u4", "u5")), at.plusSeconds(60)) == 2L)
    val second = KeyMap.ids(spark, lake, "km").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(second("u2") == first("u2"))
    assert(second.keySet == Set("u1", "u2", "u3", "u4", "u5") &&
      second.values.toSet.size == 5)
    // fresh ids sit strictly above every first-batch id (hwm is monotone)
    assert((second("u4") min second("u5")) > first.values.max)

    // all-known batch: no mint, no commit
    val v = graft.format.AzofTable(spark, lake, "km").currentVersion
    assert(KeyMap.mint(spark, lake, "km",
      keysDf(Seq("u1", "u5")), at.plusSeconds(120)) == 0L)
    assert(graft.format.AzofTable(spark, lake, "km").currentVersion == v)
  }
}
