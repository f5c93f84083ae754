package graft.sources

import graft.TestSpark
import graft.format._
import graft.operators.Zorder
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering compaction + the single-version closure-free
  * value-pruning path it exists to serve:
  *
  *   - [[Zorder.dimCode]] is order-preserving per dimension (incl.
  *     negative longs, multi-byte strings, NULL-first).
  *   - `compact(zorder = ...)` stamps `unique` provenance on the merged
  *     outputs, and [[ValueStats.prune]] then prunes uncorrelated value
  *     predicates WITHOUT the key-range closure — which provably cannot
  *     prune them on a byKey layout (every file matches) or any
  *     multi-version view (the closure re-adds everything).
  *   - A post-compaction delta breaks the single-version condition and
  *     the pruner falls back to the conservative closure.
  */
class ZorderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Instant.parse(s)
  private val schema = TableSchema(Seq(
    ColumnDef("kind", ColumnType.AzString, nullable = false),
    ColumnDef("amount", ColumnType.AzInt, nullable = false)))

  test("dimCode preserves order per type; zValue interleaves bytes round-robin") {
    import spark.implicits._
    // longs incl. negatives and extremes
    val longs = Seq(Long.MinValue, -7L, -1L, 0L, 1L, 42L, Long.MaxValue)
    val lCodes = longs.toDF("v")
      .select(Zorder.dimCode(col("v"), LongType)).collect().map(_.getString(0))
    assert(lCodes.toSeq == lCodes.sorted.toSeq,
      s"long codes must sort like the values: ${longs.zip(lCodes)}")
    // strings: multi-byte prefixes, extension-after-prefix
    val strs = Seq("", "a", "ab", "abc", "b", "ba")
    val sCodes = strs.toDF("v")
      .select(Zorder.dimCode(col("v"), StringType)).collect().map(_.getString(0))
    assert(sCodes.toSeq == sCodes.sorted.toSeq)
    // timestamps follow their millis
    val tss = Seq("2020-01-01T00:00:00Z", "2024-06-05T12:00:00Z",
      "2030-01-01T00:00:00Z").map(s => Timestamp.from(ts(s)))
    val tCodes = tss.toDF("v")
      .select(Zorder.dimCode(col("v"), TimestampType)).collect().map(_.getString(0))
    assert(tCodes.toSeq == tCodes.sorted.toSeq)
    // NULL sorts first
    val withNull = Seq[(java.lang.Long, Int)]((null, 0), (5L, 1))
      .toDF("v", "i")
      .select(Zorder.dimCode(col("v"), LongType)).collect().map(_.getString(0))
    assert(withNull(0) < withNull(1))
    // interleave: two dims' codes alternate in 2-char groups
    val z = Seq(("k", 1L)).toDF("a", "b")
      .select(Zorder.zValue(Seq(col("a") -> StringType, col("b") -> LongType)))
      .collect()(0).getString(0)
    val aCode = "6B" + "0" * 14                       // hex('k') padded
    val bCode = "8000000000000001"                    // 1 xor MinValue
    val expect = (0 until 8).flatMap(i => Seq(
      aCode.substring(2 * i, 2 * i + 2),
      bCode.substring(2 * i, 2 * i + 2))).mkString
    assert(z == expect, s"z=$z expect=$expect")
  }

  // kinds a/b/c/d: the dimension's FIRST byte varies — byte-granular
  // z-codes cluster on leading bytes, so a shared prefix ("kind0" vs
  // "kind1") would push the distinguishing byte behind the key's
  // padding and degrade to key-major order (the documented limitation)
  private def mkRows(n: Int): Seq[Row] = (0 until n).map { i =>
    Row(f"$i%02d", Timestamp.from(ts("2024-01-05T00:00:00Z").plusSeconds(i)),
      ('a' + i % 4).toChar.toString, (i * 13 % 100).toLong)
  }

  /** Build a 64-key corpus where `kind` is UNCORRELATED with key, land
    * it in one partitioned commit, compact at `at` into 16 files with
    * the given clustering, and return the Current entries.
    */
  private def build(mode: String): (String, Seq[FileEntry]) = {
    val lake = Files.createTempDirectory(s"azof-z-$mode").toString
    AzofWriter.createTable(spark, lake, "t", schema,
      ts("2024-01-01T00:00:00Z"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(mkRows(64)), schema.toStruct)
    AzofWriter.commitPartitioned(spark, lake, "t", df, numFiles = 4)
    mode match {
      case "bykey" => AzofWriter.compact(spark, lake, "t",
        ts("2024-06-01T00:00:00Z"), numFiles = 16, byKey = true)
      case "zorder" => AzofWriter.compact(spark, lake, "t",
        ts("2024-06-01T00:00:00Z"), numFiles = 16,
        zorder = Seq("kind"))
    }
    val snap = AzofTable(spark, lake, "t").currentSnapshot
    (lake, graft.operators.AzofScan.prunedEntries(snap, AsOf.Current))
  }

  test("z-order + unique provenance: uncorrelated value predicate prunes; byKey cannot") {
    val (zLake, zEntries) = build("zorder")
    assert(zEntries.size == 16)
    assert(zEntries.forall(_.unique), "merged outputs carry unique=true")
    val zKept = ValueStats.prune(schema, zEntries, Seq(EqualTo("kind", "c")))
    assert(zKept.size < 16,
      s"z-order must prune an uncorrelated kind predicate, kept ${zKept.size}")
    // ... and the pruned scan still answers exactly
    val zGot = spark.read.format("azof").option("table", "t").load(zLake)
      .where("kind = 'c'").select("key").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(zGot == (0 until 64).filter(_ % 4 == 2).map(i => f"$i%02d"))

    // byKey control: every file holds all kinds -> nothing prunes
    val (_, bEntries) = build("bykey")
    assert(bEntries.size == 16 && bEntries.forall(_.unique))
    val bKept = ValueStats.prune(schema, bEntries, Seq(EqualTo("kind", "c")))
    assert(bKept.size == 16,
      "byKey files span all kinds; the comparison documents why z-order exists")

    // z-order still bounds KEY ranges: a point lookup prunes too
    val k = "17"
    val keyKept = zEntries.filter(_.stats.exists(st =>
      st.keyMin <= k && k <= st.keyMax))
    assert(keyKept.size < 16,
      s"z-order files must keep bounded key ranges, ${keyKept.size} cover '$k'")
  }

  test("a post-compaction delta restores the conservative closure") {
    val (lake, _) = build("zorder")
    AzofWriter.commitDelta(spark, lake, "t",
      spark.createDataFrame(
        // key 18 was kind 'c' (18 % 4 == 2); the delta flips it to 'a'
        spark.sparkContext.parallelize(Seq(Row("18",
          Timestamp.from(ts("2024-07-01T00:00:00Z")), "a", 5L))),
        schema.toStruct),
      ts("2024-07-01T00:00:00Z"), ts("2024-07-01T00:00:00Z"))
    val snap = AzofTable(spark, lake, "t").currentSnapshot
    val entries = graft.operators.AzofScan.prunedEntries(snap, AsOf.Current)
    assert(entries.size == 17)
    assert(!entries.forall(_.unique))
    // key 18's winner is now kind 'a' — a kind='c' predicate must NOT
    // return it, which is exactly what the closure protects; and the
    // view must keep the overriding file reachable
    val kept = ValueStats.prune(schema, entries, Seq(EqualTo("kind", "c")))
    assert(kept.size == entries.size,
      "mixed view: uncorrelated predicate cannot soundly prune")
    val got = spark.read.format("azof").option("table", "t").load(lake)
      .where("kind = 'c'").select("key").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(got == (0 until 64).filter(i => i % 4 == 2 && i != 18)
      .map(i => f"$i%02d"),
      "the updated key's old kind-'c' row must not resurrect")
    // unique survives the codec round-trip
    val rt = SnapshotCodec.parse(SnapshotCodec.render(snap))
    assert(rt == snap)
  }

  test("zorder validation: unknown column, byKey conflict, single file") {
    val lake = Files.createTempDirectory("azof-z-val").toString
    AzofWriter.createTable(spark, lake, "t", schema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitDelta(spark, lake, "t",
      spark.createDataFrame(
        spark.sparkContext.parallelize(mkRows(4)), schema.toStruct),
      ts("2024-01-05T00:00:00Z"), ts("2024-01-06T00:00:00Z"))
    intercept[IllegalArgumentException] {
      AzofWriter.compact(spark, lake, "t", ts("2024-06-01T00:00:00Z"),
        numFiles = 4, zorder = Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      AzofWriter.compact(spark, lake, "t", ts("2024-06-01T00:00:00Z"),
        numFiles = 4, byKey = true, zorder = Seq("kind"))
    }
    intercept[IllegalArgumentException] {
      AzofWriter.compact(spark, lake, "t", ts("2024-06-01T00:00:00Z"),
        numFiles = 1, zorder = Seq("kind"))
    }
  }
}
