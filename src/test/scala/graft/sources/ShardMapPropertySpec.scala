package graft.sources

import graft.TestSpark
import graft.format.TableSchema
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Randomized property for the [[ShardMap]] mint: for ANY random
  * sequence of upsert/delete commits and ANY grouping of those commits
  * into catch-up refresh ranges, the persisted map equals a pure-Scala
  * replay — per range, the keys whose LAST change in the range is an
  * upsert and that hold no slot yet, ranked after the high-water mark
  * in `(md5 order-hash, key)` order — and the live-served assignment
  * equals that map restricted to the keys live at the end. Covers the
  * shapes the example spec can't: upsert-then-delete straddling a
  * multi-commit range, delete-then-re-add inside one range (slot
  * kept, no remint), and deletes that never touch the map. Fixed
  * seeds — failures replay.
  */
class ShardMapPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val srcSchema = graft.format.TableSchema(Seq(
    graft.format.ColumnDef("text", graft.format.ColumnType.AzString,
      nullable = false)))

  private def ts(i: Int): Instant =
    Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i * 86400L)

  /** JVM replay of [[graft.operators.Packing.orderHash]]: first 14 hex
    * digits of `md5(prefix || key)` as a long.
    */
  private def orderHash(prefix: String, key: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest((prefix + key).getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(7).map(b => f"$b%02x").mkString, 16)
  }

  test("random upsert/delete commits × random refresh ranges ≡ " +
    "pure replay (3 seeded runs)") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 104729)
      val universe = (0 until 24).map(i => f"k$i%02d")
      val lake = Files.createTempDirectory(s"azof-shprop$seed").toString
      AzofWriter.createTable(spark, lake, "docs", srcSchema, ts(0))
      val shardSize = 1 + rnd.nextInt(4)
      ShardMap.create(spark, lake, shardSize = shardSize.toLong,
        salt = s"pp$seed")

      // model state
      var live = Set.empty[String]
      var model = Map.empty[String, Long] // key -> rank
      var nextRank = 0L
      // pending per-key last change within the current refresh range:
      // true = upsert, false = delete
      var pending = Map.empty[String, Boolean]

      val nCommits = 5 + rnd.nextInt(3)
      var first = true
      for (c <- 1 to nCommits) {
        val ups = rnd.shuffle(universe).take(1 + rnd.nextInt(6))
        val rows = spark.createDataFrame(
          spark.sparkContext.parallelize(ups.map(k =>
            Row(k, Timestamp.from(ts(c)), s"text $k $c"))),
          srcSchema.toStruct)
        if (first) AzofWriter.commitBase(spark, lake, "docs", rows)
        else AzofWriter.commitDelta(spark, lake, "docs", rows, ts(c), ts(c))
        first = false
        live ++= ups
        pending ++= ups.map(_ -> true)

        val dels = rnd.shuffle(live.toSeq).take(rnd.nextInt(3))
        if (dels.nonEmpty) {
          AzofWriter.commitDelete(spark, lake, "docs", dels, ts(c), branch = None)
          live --= dels
          pending ++= dels.map(_ -> false)
        }

        // randomly close the refresh range here (always on the last)
        if (c == nCommits || rnd.nextBoolean()) {
          val r = ShardMap.refresh(spark, lake, "docs", lake,
            at = ts(c).plusSeconds(3600))
          val fresh = pending.collect {
            case (k, true) if !model.contains(k) => k
          }.toSeq.sortBy(k => (orderHash(s"shard#pp$seed#", k), k))
          assert(r.assigned == fresh.size,
            s"seed $seed commit $c: $r vs ${fresh.size}")
          model ++= fresh.zipWithIndex.map { case (k, i) =>
            k -> (nextRank + i) }
          nextRank += fresh.size
          pending = Map.empty
        }
      }

      val got = ShardMap.assignment(spark, lake, "shard_map")
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val want = model.map { case (k, rank) =>
        k -> ((rank, rank / shardSize, rank % shardSize)) }
      assert(got == want, s"seed $seed: map diverged\n$got\n$want")

      val gotLive = ShardMap.liveAssignment(spark, lake, "docs",
          lake, "shard_map")
        .collect().map(_.getString(0)).toSet
      assert(gotLive == (model.keySet & live),
        s"seed $seed: live serving diverged")
    }
  }
}
