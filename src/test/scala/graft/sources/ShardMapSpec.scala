package graft.sources

import graft.TestSpark
import graft.format.{AzofTable, TableSchema}
import graft.operators.Packing
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted incremental shard assignment ([[ShardMap]]): the
  * first refresh reproduces the one-shot [[Packing.shardAssign]]
  * permutation exactly; later refreshes append after the high-water
  * rank without moving any minted slot; deletes write nothing (holes
  * served away by the live join) and a re-added key keeps its
  * original slot.
  */
class ShardMapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Instant.parse(s)

  private val srcSchema = graft.format.TableSchema(Seq(
    graft.format.ColumnDef("text", graft.format.ColumnType.AzString,
      nullable = false)))

  private def rows(keys: Seq[String], at: String) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(keys.map { k =>
        Row(k, Timestamp.from(ts(at)), s"text of $k") }),
      srcSchema.toStruct)

  private def slots(idxLake: String): Map[String, (Long, Long, Long)] =
    ShardMap.assignment(spark, idxLake, "shard_map")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("first refresh ≡ one-shot shardAssign; a second batch appends " +
    "without moving epoch-1 slots; replay is a no-op") {
    val l = Files.createTempDirectory("azof-shardmap").toString
    AzofWriter.createTable(spark, l, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    val batch1 = (1 to 10).map(i => s"doc-$i")
    AzofWriter.commitBase(spark, l, "docs",
      rows(batch1, "2024-01-02T00:00:00Z"))
    ShardMap.create(spark, l, shardSize = 4L, salt = "t")

    val r1 = ShardMap.refresh(spark, l, "docs", l,
      at = ts("2024-02-01T00:00:00Z"))
    assert(r1.assigned == 10 && r1.nextRank == 10, s"$r1")
    val epoch1 = slots(l)
    // one-shot equivalence: same salt, same keys, same permutation
    val oneShot = Packing.shardAssign(
      rows(batch1, "2024-01-02T00:00:00Z")
        .select(col(TableSchema.KeyName)),
      col(TableSchema.KeyName), shardSize = 4L, salt = "t")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(epoch1 == oneShot, s"$epoch1 vs $oneShot")

    // second crawl batch: appends ranks 10.., epoch-1 slots untouched
    val batch2 = (11 to 13).map(i => s"doc-$i")
    AzofWriter.commitDelta(spark, l, "docs",
      rows(batch2, "2024-02-15T00:00:00Z"),
      ts("2024-02-15T00:00:00Z"), ts("2024-02-15T00:00:00Z"))
    val r2 = ShardMap.refresh(spark, l, "docs", l,
      at = ts("2024-03-01T00:00:00Z"))
    assert(r2.assigned == 3 && r2.nextRank == 13, s"$r2")
    val all = slots(l)
    assert(batch1.forall(k => all(k) == epoch1(k)),
      "epoch-1 slots moved")
    assert(batch2.map(all).map(_._1).toSet == Set(10L, 11L, 12L))
    // within the batch: the same salted-hash order as the one-shot
    val h2 = spark.createDataFrame(batch2.map(Tuple1(_))).toDF("k")
      .select(col("k"), Packing.orderHash("shard#t#", col("k")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val order2 = batch2.sortBy(k => (h2(k), k))
    assert(order2.zipWithIndex.forall { case (k, i) =>
      all(k)._1 == 10L + i }, s"$all")

    // replayed refresh with nothing new: no-op, no version moves
    val v = AzofTable(spark, l, "shard_map").currentVersion
    val r3 = ShardMap.refresh(spark, l, "docs", l,
      at = ts("2024-03-02T00:00:00Z"))
    assert(r3.noop && r3.assigned == 0)
    assert(AzofTable(spark, l, "shard_map").currentVersion == v)
  }

  test("delete writes nothing (a hole, served away live); re-add " +
    "keeps the original slot; a revision mints nothing") {
    val l = Files.createTempDirectory("azof-shardmap2").toString
    AzofWriter.createTable(spark, l, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "docs",
      rows(Seq("a", "b", "c"), "2024-01-02T00:00:00Z"))
    ShardMap.create(spark, l, shardSize = 2L, salt = "t")
    assert(ShardMap.refresh(spark, l, "docs", l,
      at = ts("2024-02-01T00:00:00Z")).assigned == 3)
    val before = slots(l)

    // delete 'b': the map is untouched, live serving drops the slot
    AzofWriter.commitDelete(spark, l, "docs", Seq("b"),
      ts("2024-02-10T00:00:00Z"))
    val rd = ShardMap.refresh(spark, l, "docs", l,
      at = ts("2024-03-01T00:00:00Z"))
    // the deleted key churns but is dead at the pinned version: no mint
    assert(rd.assigned == 0 && rd.churned == 1, s"$rd")
    assert(slots(l) == before, "delete must not touch the map")
    def liveKeys() = ShardMap.liveAssignment(spark, l, "docs", l,
      "shard_map").collect().map(_.getString(0)).toSet
    assert(liveKeys() == Set("a", "c"))

    // re-add 'b' with NEW text: original slot, no fresh mint
    AzofWriter.commitDelta(spark, l, "docs",
      rows(Seq("b"), "2024-03-10T00:00:00Z"),
      ts("2024-03-10T00:00:00Z"), ts("2024-03-10T00:00:00Z"))
    val rr = ShardMap.refresh(spark, l, "docs", l,
      at = ts("2024-04-01T00:00:00Z"))
    assert(rr.assigned == 0 && rr.churned == 1, s"$rr")
    assert(slots(l) == before)
    assert(liveKeys() == Set("a", "b", "c"))

    // upserted-then-deleted within ONE catch-up range: already dead at
    // the cursor, so no slot is minted (no hole for a doc that never
    // lived past the range)
    AzofWriter.commitDelta(spark, l, "docs",
      rows(Seq("e"), "2024-05-01T00:00:00Z"),
      ts("2024-05-01T00:00:00Z"), ts("2024-05-01T00:00:00Z"))
    AzofWriter.commitDelete(spark, l, "docs", Seq("e"),
      ts("2024-05-02T00:00:00Z"))
    val re = ShardMap.refresh(spark, l, "docs", l,
      at = ts("2024-06-01T00:00:00Z"))
    assert(re.assigned == 0 && re.churned == 1, s"$re")
    assert(!slots(l).contains("e") && liveKeys() == Set("a", "b", "c"))
  }

  test("a historical tombstone (older event_time) loses to the newer " +
    "row — the key is LIVE by the engine's own precedence and mints") {
    val l = Files.createTempDirectory("azof-shardmap4").toString
    AzofWriter.createTable(spark, l, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, l, "docs",
      rows(Seq("x"), "2024-03-01T00:00:00Z"))
    // tombstone dated BEFORE the row's event time: per event-time
    // precedence the newer row wins — x stays live, so a commit-order
    // liveness heuristic would wrongly exclude it from export forever
    AzofWriter.commitDelete(spark, l, "docs", Seq("x"),
      ts("2024-01-15T00:00:00Z"))
    ShardMap.create(spark, l, shardSize = 2L, salt = "t")
    val r = ShardMap.refresh(spark, l, "docs", l,
      at = ts("2024-04-01T00:00:00Z"))
    assert(r.assigned == 1, s"$r")
    val lv = ShardMap.liveAssignment(spark, l, "docs", l, "shard_map")
      .collect().map(_.getString(0)).toSet
    assert(lv == Set("x"), s"$lv")
  }

  test("emitShards writes exactly the newly-complete shards, " +
    "append-only; emitted bytes survive later batches; flush cuts " +
    "the trailing partial") {
    val l = Files.createTempDirectory("azof-shardmap3").toString
    val out = Files.createTempDirectory("azof-shardout").toString
    AzofWriter.createTable(spark, l, "docs", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    // 5 docs, shardSize 2: shards 0,1 complete, shard 2 partial
    AzofWriter.commitBase(spark, l, "docs",
      rows(Seq("a", "b", "c", "d", "e"), "2024-01-02T00:00:00Z"))
    ShardMap.create(spark, l, shardSize = 2L, salt = "t")
    ShardMap.refresh(spark, l, "docs", l, at = ts("2024-02-01T00:00:00Z"))

    val e1 = ShardMap.emitShards(spark, l, "docs", "text", l,
      "shard_map", out)
    assert(e1.fromShard == 0 && e1.untilShard == 2 && e1.docs == 4, s"$e1")
    def shardDirs() = new java.io.File(out).listFiles()
      .map(_.getName).filter(_.startsWith("shard_id=")).sorted.toSeq
    assert(shardDirs() == Seq("shard_id=0", "shard_id=1"))
    val bytes1 = spark.read.parquet(out).orderBy("shard_id", "shard_pos")
      .collect().toSeq

    // replay: nothing new to emit
    assert(ShardMap.emitShards(spark, l, "docs", "text", l,
      "shard_map", out).noop)

    // next batch fills shard 2 and starts shard 3; only shard 2 emits,
    // and the first emission's rows are byte-identical
    AzofWriter.commitDelta(spark, l, "docs",
      rows(Seq("f", "g"), "2024-02-15T00:00:00Z"),
      ts("2024-02-15T00:00:00Z"), ts("2024-02-15T00:00:00Z"))
    ShardMap.refresh(spark, l, "docs", l, at = ts("2024-03-01T00:00:00Z"))
    val e2 = ShardMap.emitShards(spark, l, "docs", "text", l,
      "shard_map", out)
    assert(e2.fromShard == 2 && e2.untilShard == 3 && e2.docs == 2, s"$e2")
    assert(shardDirs() == Seq("shard_id=0", "shard_id=1", "shard_id=2"))
    val again = spark.read.parquet(out).orderBy("shard_id", "shard_pos")
      .collect().toSeq
    assert(again.take(4) == bytes1, "emitted shards must be immutable")

    // flush: the trailing partial (shard 3, one doc) lands too
    val e3 = ShardMap.emitShards(spark, l, "docs", "text", l,
      "shard_map", out, flush = true)
    assert(e3.flushedPartial && e3.docs == 1, s"$e3")
    assert(shardDirs().size == 4)
    assert(spark.read.parquet(out).count() == 7)
  }
}
