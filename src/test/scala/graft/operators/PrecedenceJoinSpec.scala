package graft.operators

import graft.TestSpark
import graft.format._
import graft.sources.AzofWriter
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Delta-heavy tables must switch the precedence lookup from the inline
  * literal map to a broadcast join — identical results, still exactly ONE
  * parquet scan node (plan size stays O(1) in the file count instead of
  * bloating the expression tree / codegen linearly).
  */
class PrecedenceJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))
  private val t0 = Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
  private val hour = 3600L * 1000

  private def buildManyDeltas(nDeltas: Int): String = {
    val lake = Files.createTempDirectory("azof-prec").toString
    AzofWriter.createTable(spark, lake, "t", schema, Instant.ofEpochMilli(t0))
    def df(rows: (String, Int, String)*) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, h, v) =>
        Row(k, new Timestamp(t0 + h * hour), v) }),
      schema.toStruct)
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", 0, "base1"), ("2", 0, "base2")))
    // each delta updates key 1 and inserts a fresh key, in its own window
    (1 to nDeltas).foreach { i =>
      AzofWriter.commitDelta(spark, lake, "t",
        df(("1", i, s"v$i"), (s"k$i", i, s"new$i")),
        Instant.ofEpochMilli(t0 + i * hour),
        Instant.ofEpochMilli(t0 + (i + 1) * hour))
    }
    lake
  }

  private def scanVals(lake: String): Seq[(String, String)] =
    AzofScan.scan(spark, lake, "t", AsOf.Current)
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq

  test("broadcast-join precedence path: same results, one scan node") {
    val n = 10
    val lake = buildManyDeltas(n)
    val expected = (("1", s"v$n") +: ("2", "base2") +:
      (1 to n).map(i => (s"k$i", s"new$i"))).sortBy(_._1)

    // literal-map path (threshold above the file count)
    spark.conf.set("spark.azof.precedenceJoinThreshold", "64")
    val viaMap = scanVals(lake)
    assert(viaMap == expected)

    // broadcast-join path (threshold below the file count)
    spark.conf.set("spark.azof.precedenceJoinThreshold", "4")
    try {
      val df = AzofScan.scan(spark, lake, "t", AsOf.Current)
      val viaJoin = df.select("key", "value").collect()
        .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
      assert(viaJoin == expected)
      assert(viaJoin == viaMap)

      // exactly one parquet scan (the precedence side is a broadcast of
      // a local relation, not a second file scan)
      val plan = df.queryExecution.executedPlan
      val unwrapped = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val fileScans = unwrapped.collect { case s: FileSourceScanExec => s }
      assert(fileScans.size == 1, s"expected 1 parquet scan, got:\n$unwrapped")

      // as-of pruning composes with the join path: probe mid-history
      val past = AzofScan.scan(spark, lake, "t",
          AsOf.EventTime(Instant.ofEpochMilli(t0 + 3 * hour)))
        .select("key", "value").collect()
        .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
      assert(past == Seq(("1", "v3"), ("2", "base2"),
        ("k1", "new1"), ("k2", "new2"), ("k3", "new3")))
    } finally spark.conf.unset("spark.azof.precedenceJoinThreshold")
  }

  /** r18: below the threshold the scan is a UNION of per-file scans
    * (one partition per file — parallel decode for many-small-file
    * layouts, no per-row file-name work); the kill switch
    * (spark.azof.scan.perFileUnion=false) restores the r17 single-scan
    * + literal-map shape. Both must agree row-for-row, and the plan
    * shapes must actually differ as claimed.
    */
  test("per-file union (default) vs literal-map kill switch: same rows, claimed plans") {
    val n = 10
    val lake = buildManyDeltas(n)
    val expected = (("1", s"v$n") +: ("2", "base2") +:
      (1 to n).map(i => (s"k$i", s"new$i"))).sortBy(_._1)

    def fileScans(df: org.apache.spark.sql.DataFrame): Int = {
      val plan = df.queryExecution.executedPlan
      val unwrapped = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      unwrapped.collect { case s: FileSourceScanExec => s }.size
    }

    // default: one scan node per pruned file (base + n deltas)
    val viaUnion = AzofScan.scan(spark, lake, "t", AsOf.Current)
    assert(viaUnion.select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
      == expected)
    assert(fileScans(viaUnion) == n + 1,
      s"expected ${n + 1} per-file scans")

    // kill switch: single scan + literal map
    spark.conf.set("spark.azof.scan.perFileUnion", "false")
    try {
      val viaMap = AzofScan.scan(spark, lake, "t", AsOf.Current)
      assert(viaMap.select("key", "value").collect()
        .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
        == expected)
      assert(fileScans(viaMap) == 1, "kill switch must keep ONE scan node")
    } finally spark.conf.unset("spark.azof.scan.perFileUnion")
  }
}
