package graft.sources

import graft.TestSpark
import graft.format._
import graft.operators.AzofScan
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

/** The NATIVE DSv2 streaming sink (`df.writeStream.toTable("cat.t")`):
  * micro-batches land as delta commits through the task-parallel landed-
  * file path, epoch replay is a guarded no-op, tombstone markers pass
  * through, and update-mode streaming aggregations sink as appends
  * (exact under merge-on-read).
  */
class AzofStreamingSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private implicit lazy val sq: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  private def ts(s: String) = Instant.parse(s)

  private var catN = 0
  /** Fresh lake + table + registered catalog per test. */
  private def mkCat(): (String, String) = {
    val lake = Files.createTempDirectory("azof-stsink").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    catN += 1
    val cat = s"stsink$catN"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[AzofCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake)
    (lake, cat)
  }

  private def currentKv(lake: String): Seq[(String, String)] =
    AzofScan.scan(spark, lake, "t", AsOf.Current)
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq

  test("writeStream.toTable lands micro-batches as delta commits " +
    "with the replay stamp") {
    val (lake, cat) = mkCat()
    val ck = Files.createTempDirectory("azof-stsink-ck").toString
    val mem = MemoryStream[(String, Timestamp, String)]
    val q = mem.toDF().toDF("key", "event_time", "value")
      .writeStream
      .option("checkpointLocation", ck)
      .outputMode("append")
      .toTable(s"$cat.t")
    try {
      mem.addData(("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a1"),
        ("2", Timestamp.from(ts("2024-01-03T00:00:00Z")), "b1"))
      q.processAllAvailable()
      assert(currentKv(lake) == Seq("1" -> "a1", "2" -> "b1"))

      mem.addData(("1", Timestamp.from(ts("2024-02-05T00:00:00Z")), "a2"))
      q.processAllAvailable()
      assert(currentKv(lake) == Seq("1" -> "a2", "2" -> "b1"))

      val t = AzofTable(spark, lake, "t")
      val snap = t.currentSnapshot
      val appId = s"q:${q.id}"
      // two data batches committed = two versions past the created table
      assert(t.currentVersion.toLong == 3L, s"v=${t.currentVersion}")
      assert(snap.streamBatches.get(appId).contains(1L),
        s"replay stamp missing/wrong: ${snap.streamBatches}")
      assert(snap.op.exists(_.startsWith(s"stream-delta#$appId#")),
        s"op=${snap.op}")
      // as-of time travel sees through the stream's commits
      assert(AzofScan.scan(spark, lake, "t",
        AsOf.EventTime(ts("2024-01-15T00:00:00Z")))
        .select("key", "value").collect()
        .map(r => (r.getString(0), r.getString(1))).sorted.toSeq ==
        Seq("1" -> "a1", "2" -> "b1"))
    } finally q.stop()
  }

  test("a replayed epoch is a guarded no-op and its landed files are " +
    "cleaned up") {
    val (lake, cat) = mkCat()
    val ck = Files.createTempDirectory("azof-stsink-ck").toString
    val mem = MemoryStream[(String, Timestamp, String)]
    val q = mem.toDF().toDF("key", "event_time", "value")
      .writeStream
      .option("checkpointLocation", ck)
      .outputMode("append")
      .toTable(s"$cat.t")
    val queryId =
      try {
        mem.addData(("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a1"))
        q.processAllAvailable()
        q.id.toString
      } finally q.stop()
    val t = AzofTable(spark, lake, "t")
    val v = t.currentVersion.toLong
    assert(v == 2L)

    // zombie duplicate of the query re-commits epoch 0: land a file the
    // way a task would, then drive the sink's commit path directly
    val w = new AzofStreamingWrite(lake, "t", queryId,
      schema.toStruct)
    val fileName = "delta_str_replay_e0_p0_t0.parquet"
    Files.write(java.nio.file.Paths.get(lake, "t", fileName),
      Array[Byte](1, 2, 3))
    w.commit(0L, Array(AzofDeltaFileMessage(
      fileName, 1L, "9", "9",
      ts("2024-01-02T00:00:00Z").toEpochMilli * 1000L,
      ts("2024-01-02T00:00:00Z").toEpochMilli * 1000L,
      hasTombstone = false)))
    assert(AzofTable(spark, lake, "t").currentVersion.toLong == v,
      "replayed epoch must not commit a version")
    assert(!Files.exists(java.nio.file.Paths.get(lake, "t", fileName)),
      "replayed epoch's landed file must be deleted")
    assert(currentKv(lake) == Seq("1" -> "a1"))
  }

  test("tombstone marker rows pass through as deletes " +
    "(the CDC replication shape)") {
    val (lake, cat) = mkCat()
    val ck = Files.createTempDirectory("azof-stsink-ck").toString
    val mem = MemoryStream[(String, Timestamp, String, Boolean)]
    val q = mem.toDF()
      .toDF("key", "event_time", "value", TableSchema.DeletedName)
      .writeStream
      .option("checkpointLocation", ck)
      .outputMode("append")
      .toTable(s"$cat.t")
    try {
      mem.addData(
        ("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a1", false),
        ("2", Timestamp.from(ts("2024-01-03T00:00:00Z")), "b1", false))
      q.processAllAvailable()
      // one batch carries an upsert AND a tombstone (mixed delta file)
      mem.addData(
        ("1", Timestamp.from(ts("2024-02-05T00:00:00Z")), "a2", false),
        ("2", Timestamp.from(ts("2024-02-06T00:00:00Z")), null, true))
      q.processAllAvailable()
      assert(currentKv(lake) == Seq("1" -> "a2"))
      // pre-delete history still travels
      assert(AzofScan.scan(spark, lake, "t",
        AsOf.EventTime(ts("2024-01-15T00:00:00Z")))
        .select("key", "value").collect()
        .map(r => (r.getString(0), r.getString(1))).sorted.toSeq ==
        Seq("1" -> "a1", "2" -> "b1"))
    } finally q.stop()
  }

  test("update-mode streaming aggregation sinks as appends — exact " +
    "under merge-on-read, later commit wins the equal-event-time tie") {
    val (lake, cat) = mkCat()
    val ck = Files.createTempDirectory("azof-stsink-ck").toString
    val mem = MemoryStream[(String, Timestamp)]
    val q = mem.toDF().toDF("key", "event_time")
      .groupBy($"key")
      .agg(max($"event_time").as("event_time"),
        count(lit(1)).cast("string").as("value"))
      .writeStream
      .option("checkpointLocation", ck)
      .outputMode("update")
      .toTable(s"$cat.t")
    try {
      mem.addData(("1", Timestamp.from(ts("2024-01-10T00:00:00Z"))))
      q.processAllAvailable()
      assert(currentKv(lake) == Seq("1" -> "1"))
      // a LATE event: max(event_time) unchanged, so the updated count
      // lands at the SAME event_time — the commit-seq tie-break must
      // serve the newer aggregate
      mem.addData(("1", Timestamp.from(ts("2024-01-05T00:00:00Z"))),
        ("2", Timestamp.from(ts("2024-01-12T00:00:00Z"))))
      q.processAllAvailable()
      assert(currentKv(lake) == Seq("1" -> "2", "2" -> "1"))
    } finally q.stop()
  }

  test("a stream sunk under WAP session routing stages on the branch — " +
    "invisible to main, exactly-once stamps on the branch lineage, " +
    "published by fast-forward") {
    val (lake, cat) = mkCat()
    AzofWriter.createBranch(spark, lake, "t", "wapstr")
    val ck = Files.createTempDirectory("azof-stsink-ck").toString
    val mem = MemoryStream[(String, Timestamp, String)]
    try {
      spark.conf.set(AzofCatalog.WapBranchConf, "wapstr")
      // the streaming job's sink spec is UNCHANGED — the conf routes it
      val q = mem.toDF().toDF("key", "event_time", "value")
        .writeStream
        .option("checkpointLocation", ck)
        .outputMode("append")
        .toTable(s"$cat.t")
      try {
        mem.addData(("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a1"))
        q.processAllAvailable()
        mem.addData(("2", Timestamp.from(ts("2024-01-03T00:00:00Z")), "b1"))
        q.processAllAvailable()
        val t = AzofTable(spark, lake, "t")
        // main: untouched pointer, empty view
        assert(t.currentVersion == "1", s"v=${t.currentVersion}")
        assert(currentKv(lake).isEmpty, "main must not see the stream")
        // branch: both batches live, replay stamp on the branch head
        val head = t.branchHead("wapstr").get
        assert(head == 3L, s"head=$head")
        val bs = t.snapshot(head.toString)
        assert(bs.branch.contains("wapstr") &&
          bs.streamBatches.get(s"q:${q.id}").contains(1L),
          s"branch replay stamp: ${bs.streamBatches}")
      } finally q.stop()
    } finally spark.conf.unset(AzofCatalog.WapBranchConf)
    assert(AzofWriter.fastForward(spark, lake, "t", "wapstr") == 4L)
    assert(currentKv(lake) == Seq("1" -> "a1", "2" -> "b1"))
  }

  test("writeStream.toTable onto cat.t.branch_<b> targets the branch " +
    "lineage directly") {
    val (lake, cat) = mkCat()
    AzofWriter.createBranch(spark, lake, "t", "direct")
    val ck = Files.createTempDirectory("azof-stsink-ck").toString
    val mem = MemoryStream[(String, Timestamp, String)]
    val q = mem.toDF().toDF("key", "event_time", "value")
      .writeStream
      .option("checkpointLocation", ck)
      .outputMode("append")
      .toTable(s"$cat.t.branch_direct")
    try {
      mem.addData(("7", Timestamp.from(ts("2024-01-05T00:00:00Z")), "x1"))
      q.processAllAvailable()
      val t = AzofTable(spark, lake, "t")
      assert(t.currentVersion == "1" && currentKv(lake).isEmpty)
      assert(t.branchHead("direct").contains(2L))
      assert(AzofScan.scanSnapshot(spark, t, t.snapshot("2"), AsOf.Current)
        .select("key", "value").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq ==
        Seq("7" -> "x1"))
    } finally q.stop()
  }

  test("a stream whose schema does not match the table refuses loudly") {
    val (_, cat) = mkCat()
    val ck = Files.createTempDirectory("azof-stsink-ck").toString
    val mem = MemoryStream[(String, Timestamp, String)]
    val q = mem.toDF().toDF("key", "event_time", "wrong_name")
      .writeStream
      .option("checkpointLocation", ck)
      .outputMode("append")
      .toTable(s"$cat.t")
    try {
      mem.addData(("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "x"))
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(m =>
        m.contains("does not match") || m.contains("Cannot find data") ||
          m.contains("wrong_name")),
        s"unexpected failure: ${messages(e).mkString(" | ")}")
    } finally q.stop()
  }
}
