package graft.sources

import graft.TestSpark
import graft.format._
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** SQL writes through the DSv2 catalog: CREATE TABLE / INSERT INTO /
  * ALTER TABLE ADD COLUMN route through the SAME commit protocol as the
  * library path (snapshot-JSON create-if-absent, partitioned delta
  * commit, metadata-only schema evolution) — so a SQL-built table and a
  * library-built twin fed the same rows are indistinguishable to every
  * read surface, and first-writer-wins is preserved.
  */
class AzofCatalogWriteSpec extends AnyFunSuite {
  private lazy val lake = Files.createTempDirectory("azof-wcat").toString
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.wcat", classOf[AzofCatalog].getName)
    s.conf.set("spark.sql.catalog.wcat.path", lake)
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

  private def scanAll(table: String, suffix: String = ""): Seq[(String, String)] =
    spark.sql(s"SELECT key, value FROM wcat.$table $suffix").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq

  test("CREATE + INSERT ≡ library-built twin on every read surface") {
    spark.sql(
      """CREATE TABLE wcat.t (key STRING, event_time TIMESTAMP, value STRING)
         USING azof TBLPROPERTIES ('start'='2024-01-01T00:00:00Z')""")
    assert(AzofTable(spark, lake, "t").currentVersion == "1")

    spark.sql(
      """INSERT INTO wcat.t VALUES
         ('1', TIMESTAMP'2024-01-05 00:00:00', 'a1'),
         ('2', TIMESTAMP'2024-01-06 00:00:00', 'b1')""")
    spark.sql(
      """INSERT INTO wcat.t VALUES
         ('1', TIMESTAMP'2024-02-05 00:00:00', 'a2'),
         ('3', TIMESTAMP'2024-02-06 00:00:00', 'c1')""")

    // library twin with identical rows and commit split
    AzofWriter.createTable(spark, lake, "twin", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitDelta(spark, lake, "twin",
      df(("1", "2024-01-05T00:00:00Z", "a1"), ("2", "2024-01-06T00:00:00Z", "b1")),
      ts("2024-01-05T00:00:00Z"), ts("2024-01-06T00:00:00Z"))
    AzofWriter.commitDelta(spark, lake, "twin",
      df(("1", "2024-02-05T00:00:00Z", "a2"), ("3", "2024-02-06T00:00:00Z", "c1")),
      ts("2024-02-05T00:00:00Z"), ts("2024-02-06T00:00:00Z"))

    assert(scanAll("t") == scanAll("twin"))
    assert(scanAll("t") == Seq("1" -> "a2", "2" -> "b1", "3" -> "c1"))
    val asOf = "TIMESTAMP AS OF '2024-01-15T00:00:00Z'"
    assert(scanAll("t", asOf) == scanAll("twin", asOf))
    assert(scanAll("t", asOf) == Seq("1" -> "a1", "2" -> "b1"))

    // the SQL inserts used the real commit protocol: snapshot chain with
    // delta commits and key stats stamped
    val snap = AzofTable(spark, lake, "t").currentSnapshot
    assert(snap.op.contains("commit-delta"))
    val deltas = snap.segments.head.delta
    assert(deltas.nonEmpty && deltas.forall(_.stats.nonEmpty))
  }

  test("empty INSERT is a no-op, not a failed or empty commit") {
    spark.sql(
      """CREATE TABLE wcat.t_empty (key STRING, event_time TIMESTAMP, value STRING)
         USING azof TBLPROPERTIES ('start'='2024-01-01T00:00:00Z')""")
    val before = AzofTable(spark, lake, "t_empty").currentVersion
    spark.sql("INSERT INTO wcat.t_empty SELECT * FROM wcat.t_empty WHERE 1=0")
    assert(AzofTable(spark, lake, "t_empty").currentVersion == before)
  }

  test("ALTER TABLE ADD COLUMN evolves the schema; old rows scan as NULL") {
    spark.sql(
      """CREATE TABLE wcat.t_evolve (key STRING, event_time TIMESTAMP, v STRING)
         USING azof TBLPROPERTIES ('start'='2024-01-01T00:00:00Z')""")
    spark.sql(
      "INSERT INTO wcat.t_evolve VALUES ('1', TIMESTAMP'2024-01-05 00:00:00', 'x')")
    spark.sql("ALTER TABLE wcat.t_evolve ADD COLUMN score BIGINT")
    spark.sql(
      """INSERT INTO wcat.t_evolve VALUES
         ('2', TIMESTAMP'2024-01-06 00:00:00', 'y', 7)""")
    val got = spark.sql(
      "SELECT key, v, score FROM wcat.t_evolve ORDER BY key").collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got == Seq(("1", "x", -1L), ("2", "y", 7L)))

    // DROP COLUMN narrows the schema (metadata-only) and retires the
    // name: re-ADDing it is refused (old files would resurrect values)
    spark.sql("ALTER TABLE wcat.t_evolve DROP COLUMN score")
    assert(spark.sql("SELECT * FROM wcat.t_evolve").columns.toSeq ==
      Seq("key", "event_time", "v"))
    val err = intercept[Exception] {
      spark.sql("ALTER TABLE wcat.t_evolve ADD COLUMN score BIGINT")
    }
    assert(err.getMessage.contains("RESURRECT"))
    spark.sql("ALTER TABLE wcat.t_evolve ADD COLUMN score_v2 BIGINT")
    assert(AzofTable(spark, lake, "t_evolve").currentSnapshot.retired ==
      Seq("score"))
  }

  test("DELETE FROM: key predicates are metadata-only; value predicates resolve via scan; truncate refuses") {
    spark.sql(
      """CREATE TABLE wcat.del (key STRING, event_time TIMESTAMP, value STRING)
         USING azof TBLPROPERTIES ('start'='2024-01-01T00:00:00Z')""")
    AzofWriter.commitBase(spark, lake, "del", df(
      ("1", "2024-01-02T00:00:00Z", "a1"),
      ("2", "2024-01-03T00:00:00Z", "b1"),
      ("3", "2024-01-04T00:00:00Z", "c1"),
      ("4", "2024-01-05T00:00:00Z", "d1")))

    spark.sql("DELETE FROM wcat.del WHERE key = '1'")
    assert(scanAll("del") == Seq("2" -> "b1", "3" -> "c1", "4" -> "d1"))
    spark.sql("DELETE FROM wcat.del WHERE key IN ('2', '3')")
    assert(scanAll("del") == Seq("4" -> "d1"))
    // the deletes are EVENTS: history still travels
    assert(scanAll("del",
      "TIMESTAMP AS OF '2024-01-10T00:00:00Z'").size == 4)
    // snapshot records them as tombstone commits
    val t = AzofTable(spark, lake, "del")
    assert(t.currentSnapshot.op.contains("commit-delete"))
    assert(t.currentSnapshot.tombstoneFiles.size == 2)

    // a contradictory-but-valid key conjunction intersects to the
    // EMPTY set: per SQL semantics that is a legal 0-row delete, not a
    // cannot-delete error — and a 0-row delete commits NO version
    val vBefore = AzofTable(spark, lake, "del").currentVersion
    spark.sql("DELETE FROM wcat.del WHERE key = '4' AND key = '9'")
    assert(AzofTable(spark, lake, "del").currentVersion == vBefore,
      "a 0-row delete must not commit a tombstone version")
    assert(scanAll("del") == Seq("4" -> "d1"))

    // a VALUE predicate resolves keys through the Current scan: a key
    // is deleted iff its CURRENT winner row matches (the takedown
    // shape: DELETE WHERE event_type = 'spam') — still an event, never
    // a rewrite
    spark.sql("DELETE FROM wcat.del WHERE value = 'd1'")
    assert(scanAll("del").isEmpty, "value-predicate delete missed key 4")
    assert(scanAll("del",
      "TIMESTAMP AS OF '2024-01-10T00:00:00Z'").size == 4,
      "value-predicate delete is an event: history still travels")

    // a predicate matching NO current winner: legal 0-row no-op
    val vNoHit = AzofTable(spark, lake, "del").currentVersion
    spark.sql("DELETE FROM wcat.del WHERE value = 'never-was'")
    assert(AzofTable(spark, lake, "del").currentVersion == vNoHit,
      "a 0-row value-predicate delete must not commit a version")

    // DELETE without WHERE (truncate) still refuses
    intercept[Exception] {
      spark.sql("DELETE FROM wcat.del")
    }
    assert(scanAll("del").isEmpty, "refused truncate changed nothing")
  }

  test("rejected writes: overwrite, bad schemas, duplicates, null keys") {
    spark.sql(
      """CREATE TABLE wcat.t_rej (key STRING, event_time TIMESTAMP, value STRING)
         USING azof""")
    // INSERT OVERWRITE: append-only engine
    val e1 = intercept[Exception] {
      spark.sql(
        "INSERT OVERWRITE wcat.t_rej VALUES ('1', TIMESTAMP'2024-01-05 00:00:00', 'x')")
    }
    assert(e1.getMessage.toLowerCase.contains("overwrite") ||
      e1.getMessage.contains("append-only"))
    // schema must lead with system columns
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE wcat.t_bad (id BIGINT, value STRING) USING azof")
    }
    assert(e2.getMessage.contains("system columns"))
    // value types limited to the format's four
    val e3 = intercept[Exception] {
      spark.sql(
        """CREATE TABLE wcat.t_bad2
           (key STRING, event_time TIMESTAMP, value DOUBLE) USING azof""")
    }
    assert(e3.getMessage.contains("unsupported type"))
    // duplicate create
    intercept[Exception] {
      spark.sql(
        """CREATE TABLE wcat.t_rej (key STRING, event_time TIMESTAMP, value STRING)
           USING azof""")
    }
    // null system column rejected before anything lands
    val before = AzofTable(spark, lake, "t_rej").currentVersion
    intercept[Exception] {
      spark.sql(
        "INSERT INTO wcat.t_rej VALUES (CAST(NULL AS STRING), TIMESTAMP'2024-01-05 00:00:00', 'x')")
    }
    assert(AzofTable(spark, lake, "t_rej").currentVersion == before)
  }
}
