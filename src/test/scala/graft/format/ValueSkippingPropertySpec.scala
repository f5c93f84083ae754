package graft.format

import graft.TestSpark
import graft.sources.AzofWriter
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Randomized soundness property for the value-skipping closure
  * ([[ValueStats.prune]]): over random multi-commit corpora — same-key
  * updates across commits included, so winners and older rows land in
  * different files — a predicate scan through the production reader
  * must equal the brute-force model (resolve winners first, filter
  * after) for every random predicate. This is exactly the invariant a
  * naive value pruner breaks: dropping a can't-match file may promote
  * an older matching row of a key whose newer non-matching winner
  * lived there.
  */
class ValueSkippingPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String) = Instant.parse(s)

  private val schema = TableSchema(Seq(
    ColumnDef("kind", ColumnType.AzString, nullable = false),
    ColumnDef("amount", ColumnType.AzInt, nullable = true)))

  test("random corpora × random predicates: pruned scan ≡ winners-then-filter model") {
    val kinds = Array("click", "view", "error", "signup")
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 7919L)
      val lake = Files.createTempDirectory(s"azof-vsp$seed").toString
      AzofWriter.createTable(spark, lake, "t", schema,
        ts("2024-01-01T00:00:00Z"))

      // model: key -> (hour, kind, amount) winner by latest hour; hours
      // are globally unique so the model has no tie ambiguity
      var hour = 0
      val model = scala.collection.mutable.Map.empty[Int, (Int, String, Long)]
      for (c <- 1 to 4) {
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
          s"seed=$seed kind=$kind")
        assert(got(s"amount > $cut") == want((_, a) => a > cut),
          s"seed=$seed amount>$cut")
        assert(got(s"kind = '$kind' AND amount <= $cut") ==
          want((kd, a) => kd == kind && a <= cut),
          s"seed=$seed conj $kind/$cut")
      }
    }
  }
}
