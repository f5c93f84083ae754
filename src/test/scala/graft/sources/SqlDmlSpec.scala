package graft.sources

import graft.TestSpark
import graft.format._
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** SQL row-level DML — UPDATE / MERGE INTO / non-translatable DELETE —
  * through Spark's native `SupportsRowLevelOperations` + `SupportsDelta`
  * machinery ([[AzofRowLevelOperation]]). Asserts merge-on-read
  * semantics end to end: changed rows land as delta rows (updates win
  * by event-time then commit precedence), MERGE deletes land as
  * tombstones the CDC feed surfaces, pre-DML history keeps
  * time-traveling, 0-row DML commits no version, and time-travel views
  * refuse DML.
  */
class SqlDmlSpec extends AnyFunSuite {
  private lazy val lake = Files.createTempDirectory("azof-dml").toString
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.dml", classOf[AzofCatalog].getName)
    s.conf.set("spark.sql.catalog.dml.path", lake)
    s
  }

  private def ts(s: String) = Instant.parse(s)
  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  private def df(rows: (String, String, String)*) = {
    val data = rows.map { case (k, t, v) =>
      Row(k, Timestamp.from(ts(t)), v)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq), schema.toStruct)
  }

  private def mk(table: String, rows: (String, String, String)*): Unit = {
    AzofWriter.createTable(spark, lake, table, schema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitDelta(spark, lake, table, df(rows: _*),
      ts(rows.map(_._2).min), ts(rows.map(_._2).max))
  }

  private def state(table: String, suffix: String = ""): Seq[(String, String)] =
    spark.sql(s"SELECT key, value FROM dml.$table $suffix").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq

  test("UPDATE rewrites current winners, history time-travels intact") {
    mk("u1",
      ("1", "2024-01-05T00:00:00Z", "a1"),
      ("2", "2024-01-06T00:00:00Z", "b1"),
      ("3", "2024-01-07T00:00:00Z", "c1"))
    val v0 = AzofTable(spark, lake, "u1").currentVersion

    spark.sql("UPDATE dml.u1 SET value = concat(value, '!') " +
      "WHERE value > 'a1'")

    assert(state("u1") == Seq("1" -> "a1", "2" -> "b1!", "3" -> "c1!"))
    // exactly one new version; registered as delta files with stats
    val t = AzofTable(spark, lake, "u1")
    assert(t.currentVersion.toLong == v0.toLong + 1)
    val snap = t.currentSnapshot
    assert(snap.op.contains("sql-dml"))
    val newDeltas = snap.segments.head.delta.drop(1)
    assert(newDeltas.nonEmpty && newDeltas.forall(d =>
      d.stats.nonEmpty && !d.tombstone))
    // DML task writers stamp value-column ranges in-flight, like every
    // other commit path — the landed rows are 'b1!' / 'c1!'
    val ranges = newDeltas.flatMap(_.stats.get.cols.get("value"))
    assert(ranges.nonEmpty &&
      ranges.map(_.min).min == "b1!" && ranges.map(_.max).max == "c1!")
    // commit-level history still travels: VERSION AS OF the pre-update
    // snapshot shows the original rows. EVENT-time as-of reflects the
    // rewrite at any instant >= the row's event_time — the update kept
    // the winners' event_time and wins the same-instant tie on commit
    // precedence (azof as-of is event-time travel, not commit-time)
    assert(state("u1", s"VERSION AS OF $v0") ==
      Seq("1" -> "a1", "2" -> "b1", "3" -> "c1"))
    assert(state("u1", "TIMESTAMP AS OF '2024-01-06T12:00:00Z'") ==
      Seq("1" -> "a1", "2" -> "b1!"))
    // an as-of BEFORE the touched rows' event_time predates them either way
    assert(state("u1", "TIMESTAMP AS OF '2024-01-05T12:00:00Z'") ==
      Seq("1" -> "a1"))
  }

  test("UPDATE matching no rows commits no version (SQL no-op)") {
    mk("u2", ("1", "2024-01-05T00:00:00Z", "a1"))
    val v0 = AzofTable(spark, lake, "u2").currentVersion
    spark.sql("UPDATE dml.u2 SET value = 'x' WHERE value = 'absent'")
    assert(AzofTable(spark, lake, "u2").currentVersion == v0)
    assert(state("u2") == Seq("1" -> "a1"))
  }

  test("MERGE INTO: update + insert + delete clauses in one statement") {
    mk("m1",
      ("1", "2024-01-05T00:00:00Z", "a1"),
      ("2", "2024-01-06T00:00:00Z", "b1"),
      ("3", "2024-01-07T00:00:00Z", "c1"))
    val v0 = AzofTable(spark, lake, "m1").currentVersion

    spark.sql(
      """MERGE INTO dml.m1 t USING (
           SELECT '2' AS key, TIMESTAMP'2024-02-01 00:00:00' AS event_time,
                  'b2' AS value
           UNION ALL SELECT '3', TIMESTAMP'2024-02-01 00:00:00', NULL
           UNION ALL SELECT '4', TIMESTAMP'2024-02-01 00:00:00', 'd1'
         ) s ON t.key = s.key
         WHEN MATCHED AND s.value IS NULL THEN DELETE
         WHEN MATCHED THEN UPDATE SET value = s.value,
                                      event_time = s.event_time
         WHEN NOT MATCHED THEN INSERT (key, event_time, value)
              VALUES (s.key, s.event_time, s.value)""")

    assert(state("m1") == Seq("1" -> "a1", "2" -> "b2", "4" -> "d1"))
    // ONE atomic version for the whole statement
    val t = AzofTable(spark, lake, "m1")
    assert(t.currentVersion.toLong == v0.toLong + 1)
    // the delete landed as a tombstone: CDC surfaces it as _deleted
    val changes = AzofChangeFeed.since(spark, lake, "m1", v0.toLong)
    val del = changes.where("_deleted").collect()
    assert(del.map(_.getAs[String]("key")).toSeq == Seq("3"))
    // pre-merge state fully time-travelable
    assert(state("m1", s"VERSION AS OF $v0") ==
      Seq("1" -> "a1", "2" -> "b1", "3" -> "c1"))
    assert(state("m1", "TIMESTAMP AS OF '2024-01-20T00:00:00Z'") ==
      Seq("1" -> "a1", "2" -> "b1", "3" -> "c1"))
  }

  test("MERGE with no matches and no insertable rows is a no-op") {
    mk("m2", ("1", "2024-01-05T00:00:00Z", "a1"))
    val v0 = AzofTable(spark, lake, "m2").currentVersion
    spark.sql(
      """MERGE INTO dml.m2 t USING (
           SELECT 'zz' AS key, TIMESTAMP'2024-02-01 00:00:00' AS event_time,
                  'x' AS value) s
         ON t.key = s.key
         WHEN MATCHED THEN UPDATE SET value = s.value""")
    assert(AzofTable(spark, lake, "m2").currentVersion == v0)
  }

  test("non-translatable DELETE falls back to the row-level tombstone path") {
    mk("d1",
      ("1", "2024-01-05T00:00:00Z", "aa"),
      ("2", "2024-01-06T00:00:00Z", "ab"),
      ("3", "2024-01-07T00:00:00Z", "bb"))
    val v0 = AzofTable(spark, lake, "d1").currentVersion
    // substring() is outside the pushed-filter algebra, so
    // canDeleteWhere refuses and Spark plans the row-level delete
    spark.sql("DELETE FROM dml.d1 WHERE substring(value, 1, 1) = 'a'")
    assert(state("d1") == Seq("3" -> "bb"))
    val t = AzofTable(spark, lake, "d1")
    assert(t.currentVersion.toLong == v0.toLong + 1)
    assert(t.currentSnapshot.segments.head.delta.exists(_.tombstone))
    // history before the delete still travels
    assert(state("d1", s"VERSION AS OF $v0") ==
      Seq("1" -> "aa", "2" -> "ab", "3" -> "bb"))
  }

  test("DML refuses time-travel views; updates survive a later scan") {
    mk("g1", ("1", "2024-01-05T00:00:00Z", "a1"))
    val e = intercept[Exception] {
      spark.sql("UPDATE dml.g1 VERSION AS OF 2 SET value = 'x'")
    }
    assert(e.getMessage.toLowerCase.contains("time-travel") ||
      e.getMessage.toLowerCase.contains("not supported") ||
      e.getMessage.toLowerCase.contains("syntax"))

    // an update then an ordinary upsert: newest event_time still wins
    spark.sql("UPDATE dml.g1 SET value = 'a2' WHERE key = '1'")
    AzofWriter.commitDelta(spark, lake, "g1",
      df(("1", "2024-03-01T00:00:00Z", "a3")),
      ts("2024-03-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
    assert(state("g1") == Seq("1" -> "a3"))
  }

  test("UPDATE may not reassign the key (row identity)") {
    mk("k1",
      ("1", "2024-01-05T00:00:00Z", "a1"),
      ("2", "2024-01-06T00:00:00Z", "b1"))
    val v0 = AzofTable(spark, lake, "k1").currentVersion
    val e = intercept[Exception] {
      spark.sql("UPDATE dml.k1 SET key = '9' WHERE key = '1'")
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("may not reassign"))))
    // nothing committed, table intact and readable
    assert(AzofTable(spark, lake, "k1").currentVersion == v0)
    assert(state("k1") == Seq("1" -> "a1", "2" -> "b1"))
  }

  test("DML row with NULL event_time fails the statement, commits nothing") {
    mk("n1", ("1", "2024-01-05T00:00:00Z", "a1"))
    val v0 = AzofTable(spark, lake, "n1").currentVersion
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO dml.n1 t USING (
             SELECT '7' AS key, CAST(NULL AS TIMESTAMP) AS event_time,
                    'x' AS value) s
           ON t.key = s.key
           WHEN NOT MATCHED THEN INSERT (key, event_time, value)
                VALUES (s.key, s.event_time, s.value)""")
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => Option(c.getMessage).exists(m =>
      m.contains("event_time") || m.toLowerCase.contains("null"))))
    assert(AzofTable(spark, lake, "n1").currentVersion == v0)
    assert(state("n1") == Seq("1" -> "a1"))
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE THEN DELETE (allow-list purge)") {
    mk("a1",
      ("1", "2024-01-05T00:00:00Z", "keep"),
      ("2", "2024-01-06T00:00:00Z", "drop-me"),
      ("3", "2024-01-07T00:00:00Z", "keep"))
    mk("allow",
      ("1", "2024-02-01T00:00:00Z", "x"),
      ("3", "2024-02-01T00:00:00Z", "x"))
    spark.sql(
      """MERGE INTO dml.a1 t USING dml.allow s
         ON t.key = s.key
         WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(state("a1") == Seq("1" -> "keep", "3" -> "keep"))
  }

  test("MERGE source can be another azof table (index-driven takedown)") {
    mk("big",
      ("1", "2024-01-05T00:00:00Z", "keep"),
      ("2", "2024-01-06T00:00:00Z", "dup"),
      ("3", "2024-01-07T00:00:00Z", "keep"))
    mk("verdicts", ("2", "2024-02-01T00:00:00Z", "drop"))

    spark.sql(
      """MERGE INTO dml.big t USING dml.verdicts s
         ON t.key = s.key
         WHEN MATCHED THEN DELETE""")
    assert(state("big") == Seq("1" -> "keep", "3" -> "keep"))
  }

  test("UPDATE keeping event_time sticks across keys from MULTIPLE earlier " +
    "deltas (commit-seq tie-break, not window-start position)") {
    // Two separate commits with DIFFERENT window starts: the DML file
    // that touches keys from both gets window start = min over its rows
    // (Jan 1), so delta B's newer start (Jan 5) outranks it in pure
    // precedence order — without the commit-seq tie-break, B's key kept
    // its STALE value on the exact event-time tie.
    AzofWriter.createTable(spark, lake, "md1", schema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitDelta(spark, lake, "md1",
      df(("1", "2024-01-01T00:00:00Z", "a1")),
      ts("2024-01-01T00:00:00Z"), ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitDelta(spark, lake, "md1",
      df(("2", "2024-01-05T00:00:00Z", "b1")),
      ts("2024-01-05T00:00:00Z"), ts("2024-01-05T00:00:00Z"))

    spark.sql("UPDATE dml.md1 SET value = concat(value, '!')")

    // BOTH rewrites win their exact event-time ties — key 2's is the
    // regression case (its original delta has the newer window start)
    assert(state("md1") == Seq("1" -> "a1!", "2" -> "b1!"))
    // event-time travel sees the rewrite at each row's own instant
    assert(state("md1", "TIMESTAMP AS OF '2024-01-05T00:00:00Z'") ==
      Seq("1" -> "a1!", "2" -> "b1!"))
    assert(state("md1", "TIMESTAMP AS OF '2024-01-02T00:00:00Z'") ==
      Seq("1" -> "a1!"))
    // and a SECOND same-shape UPDATE beats the first (seq strictly grows)
    spark.sql("UPDATE dml.md1 SET value = concat(value, '?')")
    assert(state("md1") == Seq("1" -> "a1!?", "2" -> "b1!?"))
  }
}
