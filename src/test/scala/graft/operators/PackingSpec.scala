package graft.operators

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Pins for the export operators:
  *
  *  - the two-phase distributed prefix sum must equal the naive
  *    single-window cumsum on random inputs, at several bucket widths
  *    (the scan is bucket-count-invariant by construction);
  *  - sequence packing must produce a gapless exclusive token-offset
  *    chain and consistent seq-range arithmetic;
  *  - shard assignment must be an exact permutation: ranks 0..N-1 each
  *    once, every shard full except the last, salt-keyed reshuffle.
  */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("prefixSum ≡ single-window cumsum on random inputs, any bucketBits") {
    val rnd = new Random(7)
    val rows = (0 until 300).map { i =>
      (i.toLong, rnd.nextInt(50).toLong)
    }.toDF("id", "w")
      .select(col("id"),
        Packing.orderHash("spec#", col("id")).as("_h"),
        col("id").cast("string").as("_tid"), col("w").as("_w"))
    val naive = rows.withColumn("_expect",
        coalesce(sum(col("_w")).over(Window.orderBy(col("_h"), col("_tid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("id"), col("_expect")).as[(Long, Long)].collect().toMap
    for (bits <- Seq(1, 4, 8, 12)) {
      val got = Packing.prefixSum(rows, bits)
        .select(col("id"), col("_prefix")).as[(Long, Long)].collect().toMap
      assert(got === naive, s"bucketBits=$bits diverged from naive scan")
    }
  }

  test("packSequences: gapless offsets, exact seq-range arithmetic") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "e"), (3L, "f g h"), (4L, "i j k l m n o p q"),
      (5L, "r s"), (6L, "t u v w x"), (7L, "y"), (8L, "z a2 b2 c2"))
      .toDF("doc_id", "text")
    val budget = 4L
    val out = Packing.packSequences(docs, col("text"), col("doc_id"), budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // exclusive prefix chain: sorted by offset, each offset = previous
    // offset + previous n_tokens, starting at 0
    val chain = out.sortBy(_._3)
    assert(chain.head._3 === 0L)
    chain.sliding(2).foreach {
      case Array((_, n0, o0, _, _, _), (_, _, o1, _, _, _)) =>
        assert(o1 === o0 + n0, "offset chain has a gap")
      case _ =>
    }
    out.foreach { case (id, n, off, s0, s1, ns) =>
      assert(s0 === off / budget, s"doc $id start_seq")
      assert(s1 === (off + n - 1) / budget, s"doc $id end_seq")
      assert(ns === s1 - s0 + 1, s"doc $id n_seqs")
      assert(n >= 1)
    }
    // total tokens conserved
    assert(chain.last._3 + chain.last._2 === out.map(_._2).sum)
  }

  test("emitSequences: budget-exact chunks, stream order, mid-doc splits") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "e f g"), (3L, "h i j k l"), (4L, "m n"))
      .toDF("doc_id", "text")
    val budget = 4L
    val seqs = Packing.emitSequences(docs, col("text"), col("doc_id"),
      budget, salt = "e")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    // every sequence but the last is exactly `budget` tokens
    seqs.dropRight(1).foreach { case (_, _, n) => assert(n === budget) }
    assert(seqs.map(_._3).sum === 14L)
    assert(seqs.map(_._1).toSeq === seqs.indices.map(_.toLong))
    // reassembling the sequences in order reproduces the concatenated
    // stream in the packSequences global order — docs split mid-seq
    // exactly where the assignment's offsets say
    val assign = Packing.packSequences(docs, col("text"), col("doc_id"),
      budget, salt = "e")
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._2)
    val byId = Map(1L -> "a b c d", 2L -> "e f g", 3L -> "h i j k l",
      4L -> "m n")
    val stream = assign.map { case (id, _) => byId(id) }.mkString(" ")
    assert(seqs.map(_._2).mkString(" ") === stream)
  }

  test("shardAssign: exact permutation, full shards, salt reshuffles") {
    val docs = (0 until 130).map(i => Tuple1(i.toLong)).toDF("doc_id")
    val out = Packing.shardAssign(docs, col("doc_id"), shardSize = 16L,
      salt = "a")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.map(_._2).sorted.toSeq === (0L until 130L))
    out.foreach { case (_, rank, shard, pos) =>
      assert(shard === rank / 16 && pos === rank % 16)
    }
    val sizes = out.groupBy(_._3).map { case (s, g) => (s, g.size) }
    assert(sizes.filter(_._1 < 8).forall(_._2 === 16),
      "non-final shards must be exactly full")
    assert(sizes(8L) === 130 - 8 * 16)
    // same salt reproduces; a different salt permutes differently
    val again = Packing.shardAssign(docs, col("doc_id"), 16L, salt = "a")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.forall { case (id, rank, _, _) => again(id) === rank })
    val other = Packing.shardAssign(docs, col("doc_id"), 16L, salt = "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.exists { case (id, rank, _, _) => other(id) !== rank })
  }

  test("export over a frozen azof version is reproducible as the table grows") {
    import graft.format.{ColumnDef, ColumnType, TableSchema}
    import graft.sources.AzofWriter
    import java.sql.Timestamp
    import java.time.Instant
    val lake = java.nio.file.Files.createTempDirectory("azof-export").toString
    val schema = TableSchema(Seq(
      ColumnDef("value", ColumnType.AzString, nullable = false)))
    def rows(rs: (String, String)*) = spark.createDataFrame(
      spark.sparkContext.parallelize(rs.map { case (k, v) =>
        org.apache.spark.sql.Row(k,
          Timestamp.from(Instant.parse("2024-01-01T00:00:00Z")), v)
      }), schema.toStruct)
    AzofWriter.createTable(spark, lake, "corpus", schema,
      Instant.parse("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "corpus", rows(
      (1 to 40).map(i => (s"d$i", s"tok$i alpha beta gamma")): _*))
    val frozen = graft.format.AzofTable(spark, lake, "corpus")
      .currentVersion
    def readAt(v: String) = spark.read.format("azof")
      .option("table", "corpus").option("versionAsOf", v).load(lake)
    def export(df: org.apache.spark.sql.DataFrame) =
      Packing.shardAssign(df, col("key"), shardSize = 8L, salt = "x")
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val first = export(readAt(frozen))
    // the corpus grows…
    AzofWriter.commitDelta(spark, lake, "corpus", rows(
      (41 to 60).map(i => (s"d$i", s"tok$i delta")): _*),
      Instant.parse("2024-01-02T00:00:00Z"),
      Instant.parse("2024-02-01T00:00:00Z"))
    // …the frozen-version export replays bit-for-bit
    assert(export(readAt(frozen)) === first)
    // while the Current export re-ranks (compact ranks shift — the
    // documented snapshot-scoped semantics): same 40 old docs, but at
    // least one sits at a different rank now
    val grown = export(spark.read.format("azof")
      .option("table", "corpus").load(lake))
    assert(grown.size === 60)
    val grownMap = grown.toMap
    assert(first.exists { case (k, r) => grownMap(k) !== r })
  }

  test("prefixSum plan: corpus window is partitioned, only the tiny base frame is not") {
    val rows = (0 until 100).map(i => (i.toLong, 1L)).toDF("id", "w")
      .select(col("id"), Packing.orderHash("plan#", col("id")).as("_h"),
        col("id").cast("string").as("_tid"), col("w").as("_w"))
    import org.apache.spark.sql.catalyst.expressions.Attribute
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val optimized = Packing.prefixSum(rows).queryExecution.optimizedPlan
    val windows = optimized.collect { case w: LWindow => w }
    assert(windows.size === 2, s"expected 2 windows, got:\n$optimized")
    // a window whose partition spec carries no real column (empty or
    // constant-keyed) executes in ONE task — it must sit above the
    // per-bucket Aggregate (a frame bounded at 2^bucketBits rows),
    // never above the corpus itself
    windows.filterNot(_.partitionSpec.exists(_.isInstanceOf[Attribute]))
      .foreach { w =>
        assert(w.collectFirst { case a: Aggregate => a }.nonEmpty,
          s"single-task window over a non-aggregated (corpus-sized) child:\n$w")
      }
    // and the corpus-side window must be hash-partitioned by bucket
    assert(windows.exists(_.partitionSpec.exists(_.isInstanceOf[Attribute])),
      s"no column-partitioned window found:\n$optimized")
  }
}
