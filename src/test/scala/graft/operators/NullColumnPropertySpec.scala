package graft.operators

import graft.TestSpark
import graft.format._
import graft.sources.AzofWriter
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Nullable value columns through the full writer → snapshot → scan round
  * trip — the one format dimension neither the reference nor the round-1
  * suite exercised (the reference carries `nullable` in its schema but
  * never appends a null; SURVEY.md §7.4). Properties:
  *
  *  - rows with NULL values survive commit + as-of scan verbatim
  *    (null stays null, never "", never dropped);
  *  - a NULL-valued row still claims its key in the merge-dedup (a null
  *    UPDATE shadows an older non-null row);
  *  - nulls ride through delta precedence, compaction, and the
  *    DataFrameReader surface identically.
  */
class NullColumnPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = true),
    ColumnDef("score", ColumnType.AzInt, nullable = true)))

  private val t0 = Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
  private val hour = 3600L * 1000

  // (key, hourOffset, value | null, score | null)
  private val rowGen = for {
    k <- Gen.chooseNum(1, 5)
    h <- Gen.chooseNum(0, 72)
    v <- Gen.option(Gen.alphaStr.map(_.take(4)))
    s <- Gen.option(Gen.chooseNum(0L, 999L))
  } yield (k.toString, h, v, s)

  private val datasetGen = for {
    n <- Gen.chooseNum(1, 30)
    rows <- Gen.listOfN(n, rowGen)
    cut <- Gen.chooseNum(0, 72)
    probe <- Gen.chooseNum(-1, 73)
  } yield (rows, cut, probe)

  private def distinctTs(rows: List[(String, Int, Option[String], Option[Long])]) =
    // one row per (key, hour): complete-duplicate ties are AzofScanSpec's
    // concern; here every surviving cell must round-trip exactly
    rows.groupBy(r => (r._1, r._2)).map(_._2.head).toList

  test("nulls round-trip writer → scan and claim keys in the merge (random)") {
    for (seed <- 1 to 10) {
      val (rawRows, cut, probeH) =
        datasetGen.apply(Gen.Parameters.default, Seed(seed.toLong * 13)).get
      val rows = distinctTs(rawRows)
      val lake = Files.createTempDirectory("azof-null").toString
      AzofWriter.createTable(spark, lake, "n", schema, Instant.ofEpochMilli(t0))

      val (baseRows, deltaRows) = rows.partition(_._2 <= cut)
      def df(rs: Seq[(String, Int, Option[String], Option[Long])]) =
        spark.createDataFrame(
          spark.sparkContext.parallelize(rs.map { case (k, h, v, s) =>
            Row(k, new Timestamp(t0 + h * hour), v.orNull,
              s.map(Long.box).orNull)
          }),
          schema.toStruct)
      var committed = false
      if (baseRows.nonEmpty) {
        AzofWriter.commitBase(spark, lake, "n", df(baseRows)); committed = true
      }
      if (deltaRows.nonEmpty) {
        if (!committed) AzofWriter.commitBase(spark, lake, "n", df(deltaRows))
        else AzofWriter.commitDelta(spark, lake, "n", df(deltaRows),
          Instant.ofEpochMilli(t0 + (cut + 1).toLong * hour),
          Instant.ofEpochMilli(t0 + 100 * hour))
      }
      if (rows.nonEmpty) {
        val asOfMs = t0 + probeH * hour
        def collectScan(dfOut: org.apache.spark.sql.DataFrame) = dfOut
          .select("key", "event_time", "value", "score").collect()
          .map(r => (r.getString(0), r.getTimestamp(1).getTime,
            Option(r.getString(2)),
            if (r.isNullAt(3)) None else Some(r.getLong(3))))
          .sortBy(_._1).toSeq
        val got = collectScan(AzofScan.scan(spark, lake, "n",
          AsOf.EventTime(Instant.ofEpochMilli(asOfMs))))

        val expected = rows.map { case (k, h, v, s) => (k, t0 + h * hour, v, s) }
          .filter(_._2 <= asOfMs)
          .groupBy(_._1).map { case (_, rs) => rs.maxBy(_._2) }
          .toSeq.sortBy(_._1)
        assert(got == expected, s"seed $seed: scan != brute force with nulls")

        // the DataFrameReader surface agrees cell-for-cell
        val viaReader = collectScan(spark.read.format("azof")
          .option("asOf", Instant.ofEpochMilli(asOfMs).toString)
          .load(s"$lake/n"))
        assert(viaReader == got, s"seed $seed: reader != scan with nulls")
      }
    }
  }

  test("null update shadows non-null, survives compaction") {
    val lake = Files.createTempDirectory("azof-null2").toString
    AzofWriter.createTable(spark, lake, "n", schema, Instant.ofEpochMilli(t0))
    def row(k: String, h: Int, v: String, s: java.lang.Long) =
      Row(k, new Timestamp(t0 + h * hour), v, s)
    val base = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      row("1", 1, "a", 10L), row("2", 1, null, null))), schema.toStruct)
    AzofWriter.commitBase(spark, lake, "n", base)
    val delta = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      row("1", 10, null, null), row("2", 10, "b", 20L))), schema.toStruct)
    AzofWriter.commitDelta(spark, lake, "n", delta,
      Instant.ofEpochMilli(t0 + 5 * hour), Instant.ofEpochMilli(t0 + 20 * hour))

    def current(): Seq[(String, Option[String], Option[Long])] =
      AzofScan.scan(spark, lake, "n", AsOf.Current)
        .select("key", "value", "score").collect()
        .map(r => (r.getString(0), Option(r.getString(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .sortBy(_._1).toSeq
    val expect = Seq(("1", None, None), ("2", Some("b"), Some(20L)))
    assert(current() == expect)

    // compacting re-materializes state through the scan; nulls must
    // survive the rewrite and the pre-compaction view stays intact
    AzofWriter.compact(spark, lake, "n", Instant.ofEpochMilli(t0 + 30 * hour))
    assert(current() == expect)
    val past = AzofScan.scan(spark, lake, "n",
        AsOf.EventTime(Instant.ofEpochMilli(t0 + 2 * hour)))
      .select("key", "value", "score").collect()
      .map(r => (r.getString(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(_._1).toSeq
    assert(past == Seq(("1", Some("a"), Some(10L)), ("2", None, None)))
  }
}
