package graft.sources

import graft.TestSpark
import graft.format.{AzofTable, TableSchema}
import graft.operators.AzofScan
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the commit-sequence exact-tie ordering: over random
  * multi-commit corpora where later commits REWRITE keys at their
  * original event times (the DML shape generalized — window starts
  * deliberately vary so start-derived precedence alone would pick
  * wrong winners), the scan's winner for every key must be the row the
  * LAST commit touching that (key, newest event_time) wrote, at every
  * as-of. The brute-force model is "replay commits in order, last
  * writer wins the exact tie" — exactly the semantics a user expects
  * from sequential writes.
  */
class CommitSeqPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = TableSchema(Seq(
    graft.format.ColumnDef("value", graft.format.ColumnType.AzString,
      nullable = false)))

  private def df(rows: Seq[(String, Instant, String)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, v) =>
        Row(k, Timestamp.from(t), v) }, 2),
      schema.toStruct)

  test("random cross-commit rewrites at original event times: scan " +
    "winner == sequential last-writer replay, at every as-of") {
    val base = Instant.parse("2024-01-01T00:00:00Z")
    for (seed <- Seq(7, 21, 98)) {
      val rnd = new scala.util.Random(seed)
      val lake = Files.createTempDirectory(s"azof-seqprop$seed").toString
      AzofWriter.createTable(spark, lake, "t", schema, base)
      val keys = (1 to 8).map(i => s"k$i")
      val times = (1 to 5).map(d => base.plusSeconds(d * 86400L))
      // model: (key, event_time) -> value, replayed in commit order
      val model = scala.collection.mutable.Map.empty[(String, Instant), String]
      var commitN = 0
      for (c <- 1 to 6) {
        // each commit touches a random subset of (key, time) cells —
        // some fresh, some REWRITES of cells earlier commits wrote
        val cells = rnd.shuffle(for { k <- keys; t <- times } yield (k, t))
          .take(2 + rnd.nextInt(6))
        val rows = cells.map { case (k, t) =>
          val v = s"c${c}_${k}_${rnd.nextInt(1000)}"
          model((k, t)) = v
          (k, t, v)
        }
        val starts = rows.map(_._2)
        commitN += 1
        AzofWriter.commitDelta(spark, lake, "t", df(rows),
          starts.min, starts.max)
      }
      // every as-of boundary: winner per key = newest event_time <= asOf,
      // value = the LAST commit that wrote that cell
      for (asOfIdx <- times.indices) {
        val asOf = times(asOfIdx)
        val expected = keys.flatMap { k =>
          val eligible = times.filter(t => !t.isAfter(asOf))
            .filter(t => model.contains((k, t)))
          if (eligible.isEmpty) None
          else {
            val tw = eligible.max
            Some(k -> model((k, tw)))
          }
        }.toMap
        val got = AzofScan.scan(spark, lake, "t",
            graft.format.AsOf.EventTime(asOf))
          .collect().map(r => r.getString(0) -> r.getString(2)).toMap
        assert(got == expected,
          s"seed $seed asOf $asOf: got $got expected $expected")
      }
      // Current == the full model's newest cells
      val expCur = keys.flatMap { k =>
        val ts = times.filter(t => model.contains((k, t)))
        if (ts.isEmpty) None else Some(k -> model((k, ts.max)))
      }.toMap
      val gotCur = AzofScan.scan(spark, lake, "t")
        .collect().map(r => r.getString(0) -> r.getString(2)).toMap
      assert(gotCur == expCur, s"seed $seed Current diverged")
      // the snapshot carries a strictly increasing seq per delta
      val seqs = AzofTable(spark, lake, "t").currentSnapshot
        .segments.head.delta.flatMap(_.seq)
      assert(seqs.size == commitN && seqs == seqs.sorted &&
        seqs.distinct == seqs, s"seed $seed seqs: $seqs")
    }
  }
}
