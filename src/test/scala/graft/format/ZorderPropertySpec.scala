package graft.format

import graft.TestSpark
import graft.sources.AzofWriter
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Randomized soundness property for the SINGLE-VERSION closure-free
  * value-pruning path ([[ValueStats.prune]]'s `unique` fast path) on
  * z-order-compacted corpora: random multi-commit corpora with
  * cross-commit key updates are compacted (z-order on `(key, kind)`)
  * into unique-flagged files, then every random predicate through the
  * production reader must equal the winners-then-filter model — the
  * fast path skips the closure, so any single-version assumption it
  * gets wrong (a key spanning two merged files, a stale row surviving
  * the merge) surfaces as a wrong answer here. A delta landed AFTER the
  * compaction flips the same corpus back to the conservative closure
  * path, re-checked against the updated model.
  */
class ZorderPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String) = Instant.parse(s)

  private val schema = TableSchema(Seq(
    ColumnDef("kind", ColumnType.AzString, nullable = false),
    ColumnDef("amount", ColumnType.AzInt, nullable = true)))

  test("random compacted corpora × random predicates: closure-free pruned scan ≡ model") {
    // single-char kinds: byte-granular z-codes cluster on leading
    // bytes, and the point here is the pruning PATH's soundness, which
    // must hold for any layout the clustering produces
    val kinds = Array("c", "v", "e", "s")
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 104729L)
      val lake = Files.createTempDirectory(s"azof-zp$seed").toString
      AzofWriter.createTable(spark, lake, "t", schema,
        ts("2024-01-01T00:00:00Z"))

      var hour = 0
      val model = scala.collection.mutable.Map.empty[Int, (Int, String, Long)]
      def land(): Unit = {
        val keys = rnd.shuffle((1 to 30).toList).take(5 + rnd.nextInt(10))
        val rows = keys.map { k =>
          hour += 1
          val kind = kinds(rnd.nextInt(kinds.length))
          val amount = rnd.nextInt(100).toLong
          if (model.get(k).forall(_._1 < hour))
            model(k) = (hour, kind, amount)
          (k, hour, kind, amount)
        }
        val t0 = ts("2024-01-01T00:00:00Z")
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(rows.map { case (k, h, kd, a) =>
            Row(f"$k%02d", Timestamp.from(t0.plusSeconds(h * 3600L)),
              kd, java.lang.Long.valueOf(a))
          }), schema.toStruct)
        AzofWriter.commitDelta(spark, lake, "t", df,
          t0.plusSeconds((hour - rows.size + 1) * 3600L),
          t0.plusSeconds(hour * 3600L))
      }
      for (_ <- 1 to 4) land()
      // compact just past every landed hour: the merged state is the
      // full winner set, z-ordered, unique-flagged — and the NEXT
      // land() (hour+1 onward) stays after the compaction point, so
      // the post-compaction delta is a legal open-segment commit
      AzofWriter.compact(spark, lake, "t",
        ts("2024-01-01T00:00:00Z").plusSeconds((hour.toLong + 1) * 3600L - 1800L),
        numFiles = 4 + rnd.nextInt(5), zorder = Seq("kind"))
      val snap = graft.format.AzofTable(spark, lake, "t").currentSnapshot
      val entries = graft.operators.AzofScan.prunedEntries(snap, AsOf.Current)
      assert(entries.nonEmpty && entries.forall(_.unique),
        s"seed=$seed: compacted view must be all-unique")

      def check(tag: String): Unit = {
        val reader = spark.read.format("azof").option("table", "t").load(lake)
        def got(pred: String): Set[String] =
          reader.where(pred).select("key").collect()
            .map(_.getString(0)).toSet
        def want(f: (String, Long) => Boolean): Set[String] =
          model.collect { case (k, (_, kd, a)) if f(kd, a) => f"$k%02d" }.toSet
        for (_ <- 1 to 8) {
          val kind = kinds(rnd.nextInt(kinds.length))
          val cut = rnd.nextInt(100)
          assert(got(s"kind = '$kind'") == want((kd, _) => kd == kind),
            s"seed=$seed $tag kind=$kind")
          assert(got(s"amount > $cut") == want((_, a) => a > cut),
            s"seed=$seed $tag amount>$cut")
          assert(got(s"kind = '$kind' AND amount <= $cut") ==
            want((kd, a) => kd == kind && a <= cut),
            s"seed=$seed $tag conj $kind/$cut")
        }
      }
      check("compacted")

      // a post-compaction delta: the view is mixed again, the pruner
      // must fall back to the closure, and answers must track the
      // updated model
      land()
      val entries2 = graft.operators.AzofScan.prunedEntries(
        graft.format.AzofTable(spark, lake, "t").currentSnapshot,
        AsOf.Current)
      assert(!entries2.forall(_.unique),
        s"seed=$seed: post-compaction delta must break all-unique")
      check("mixed")
    }
  }
}
