package graft.sources

import graft.TestSpark
import graft.format.TableSchema
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Randomized property for the [[SeqMap]] mint: for ANY random
  * sequence of upsert/delete commits (with in-range REVISIONS — the
  * same key upserted twice with different texts) and ANY grouping into
  * catch-up refresh ranges, the persisted map equals a pure-Scala
  * replay: per range, last-change-is-upsert keys without a span,
  * weighted by the token count of their LAST text in the range (the
  * pinned-version read), offset `hwm + exclusive prefix sum` in
  * `(md5 pack-hash, key)` order. Fixed seeds — failures replay.
  */
class SeqMapPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val srcSchema = graft.format.TableSchema(Seq(
    graft.format.ColumnDef("text", graft.format.ColumnType.AzString,
      nullable = false)))

  private def ts(i: Int): Instant =
    Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i * 86400L)

  private def orderHash(prefix: String, key: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest((prefix + key).getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(7).map(b => f"$b%02x").mkString, 16)
  }

  test("random commits × random ranges × in-range revisions ≡ " +
    "weighted replay (3 seeded runs)") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 7907)
      val universe = (0 until 20).map(i => f"k$i%02d")
      val lake = Files.createTempDirectory(s"azof-sqprop$seed").toString
      AzofWriter.createTable(spark, lake, "docs", srcSchema, ts(0))
      val budget = 3 + rnd.nextInt(6)
      SeqMap.create(spark, lake, budget = budget.toLong,
        salt = s"qq$seed")

      var live = Set.empty[String]
      var model = Map.empty[String, (Long, Long)] // key -> (offset, n)
      var nextTok = 0L
      // last change in the open range: Some(text) = upsert, None = del
      var pending = Map.empty[String, Option[String]]

      val nCommits = 5 + rnd.nextInt(3)
      var first = true
      for (c <- 1 to nCommits) {
        val ups = rnd.shuffle(universe).take(1 + rnd.nextInt(5))
          .map(k => k -> Seq.fill(1 + rnd.nextInt(7))(
            s"w${rnd.nextInt(99)}").mkString(" "))
        val rows = spark.createDataFrame(
          spark.sparkContext.parallelize(ups.map { case (k, t) =>
            Row(k, Timestamp.from(ts(c)), t) }),
          srcSchema.toStruct)
        if (first) AzofWriter.commitBase(spark, lake, "docs", rows)
        else AzofWriter.commitDelta(spark, lake, "docs", rows, ts(c), ts(c))
        first = false
        live ++= ups.map(_._1)
        pending ++= ups.map { case (k, t) => k -> Some(t) }

        val dels = rnd.shuffle(live.toSeq).take(rnd.nextInt(3))
        if (dels.nonEmpty) {
          AzofWriter.commitDelete(spark, lake, "docs", dels, ts(c), branch = None)
          live --= dels
          pending ++= dels.map(_ -> None)
        }

        if (c == nCommits || rnd.nextBoolean()) {
          val r = SeqMap.refresh(spark, lake, "docs", "text", lake,
            at = ts(c).plusSeconds(3600))
          val fresh = pending.collect {
            case (k, Some(t)) if !model.contains(k) =>
              k -> t.split("\\s+").length.toLong
          }.toSeq.sortBy { case (k, _) =>
            (orderHash(s"pack#qq$seed#", k), k) }
          assert(r.assigned == fresh.size,
            s"seed $seed commit $c: $r vs ${fresh.size}")
          fresh.foreach { case (k, n) =>
            model += k -> ((nextTok, n)); nextTok += n }
          pending = Map.empty
        }
      }

      val got = SeqMap.assignment(spark, lake, "seq_map")
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(1))))
        .toMap
      assert(got == model, s"seed $seed: map diverged\n$got\n$model")

      val gotLive = SeqMap.liveAssignment(spark, lake, "docs",
          lake, "seq_map")
        .collect().map(_.getString(0)).toSet
      assert(gotLive == (model.keySet & live),
        s"seed $seed: live serving diverged")
    }
  }
}
