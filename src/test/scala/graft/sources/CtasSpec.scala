package graft.sources

import graft.TestSpark
import graft.format.AzofTable
import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Atomic CTAS through the staging catalog
  * ([[AzofCatalog.stageCreate]] / [[AzofStagedCreateTable]]): the table
  * materializes under a dot-prefixed staging directory and publishes by
  * one rename — a successful CTAS is a complete queryable table, a
  * failed one leaves NOTHING under the final name, and REPLACE stays
  * refused (append-only history).
  */
class CtasSpec extends AnyFunSuite {
  private lazy val lake = Files.createTempDirectory("azof-ctas").toString
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.ccat", classOf[AzofCatalog].getName)
    s.conf.set("spark.sql.catalog.ccat.path", lake)
    s
  }

  private def lakeEntries(): Seq[String] = {
    val root = new Path(lake)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(root).map(_.getPath.getName).toSeq.sorted
  }

  test("CTAS lands the SELECT atomically: create + one insert commit, " +
    "no staging residue") {
    spark.sql(
      """CREATE TABLE ccat.t USING azof
         TBLPROPERTIES ('start'='2024-01-01T00:00:00Z')
         AS SELECT CAST(id AS STRING) AS key,
                   TIMESTAMP'2024-01-05 00:00:00' AS event_time,
                   concat('v', id) AS value
            FROM range(4)""")
    val got = spark.sql("SELECT key, value FROM ccat.t ORDER BY key")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq("0" -> "v0", "1" -> "v1", "2" -> "v2", "3" -> "v3"))
    // the published history is exactly create (v1) + the CTAS rows (v2)
    assert(AzofTable(spark, lake, "t").currentVersion == "2")
    assert(!lakeEntries().exists(_.startsWith(".stage-")),
      s"staging residue in $lake: ${lakeEntries()}")
  }

  test("CTAS into an existing name refuses and leaves the table intact") {
    spark.sql(
      """CREATE TABLE ccat.keep (key STRING, event_time TIMESTAMP, v STRING)
         USING azof""")
    spark.sql(
      "INSERT INTO ccat.keep VALUES ('1', TIMESTAMP'2024-01-05 00:00:00', 'orig')")
    val e = intercept[Exception] {
      spark.sql(
        """CREATE TABLE ccat.keep USING azof
           AS SELECT '9' AS key, TIMESTAMP'2024-01-06 00:00:00' AS event_time,
                     'clobber' AS v""")
    }
    assert(e.getMessage.toLowerCase.contains("already exists"), e.getMessage)
    assert(spark.sql("SELECT v FROM ccat.keep").collect()
      .map(_.getString(0)).toSeq == Seq("orig"))
    assert(!lakeEntries().exists(_.startsWith(".stage-")))
  }

  test("a failing CTAS query aborts: the final name never exists, " +
    "no staging residue") {
    val e = intercept[Exception] {
      spark.sql(
        """CREATE TABLE ccat.doomed USING azof
           AS SELECT CAST(id AS STRING) AS key,
                     TIMESTAMP'2024-01-05 00:00:00' AS event_time,
                     CAST(raise_error('ctas boom') AS STRING) AS value
              FROM range(4)""")
    }
    def rootCauses(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ rootCauses(t.getCause)
    assert(rootCauses(e).exists(_.contains("ctas boom")), e.toString)
    assert(intercept[Exception](
      spark.sql("SELECT * FROM ccat.doomed").collect()).getMessage
      .contains("doomed"))
    assert(!lakeEntries().exists(_.startsWith(".stage-")),
      s"staging residue in $lake: ${lakeEntries()}")
    // and a retry under the same name succeeds cleanly
    spark.sql(
      """CREATE TABLE ccat.doomed USING azof
         AS SELECT '1' AS key, TIMESTAMP'2024-01-05 00:00:00' AS event_time,
                   'ok' AS value""")
    assert(spark.sql("SELECT value FROM ccat.doomed").collect()
      .map(_.getString(0)).toSeq == Seq("ok"))
  }

  test("REPLACE TABLE refuses (append-only history); CREATE OR REPLACE " +
    "of a MISSING table creates it") {
    spark.sql(
      """CREATE TABLE ccat.hist USING azof
         AS SELECT '1' AS key, TIMESTAMP'2024-01-05 00:00:00' AS event_time,
                   'v' AS value""")
    val e = intercept[Exception] {
      spark.sql(
        """REPLACE TABLE ccat.hist USING azof
           AS SELECT '2' AS key, TIMESTAMP'2024-01-06 00:00:00' AS event_time,
                     'w' AS value""")
    }
    assert(e.getMessage.contains("append-only"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(
        """CREATE OR REPLACE TABLE ccat.hist USING azof
           AS SELECT '2' AS key, TIMESTAMP'2024-01-06 00:00:00' AS event_time,
                     'w' AS value""")
    }
    assert(e2.getMessage.contains("append-only"), e2.getMessage)
    assert(spark.sql("SELECT value FROM ccat.hist").collect()
      .map(_.getString(0)).toSeq == Seq("v"))
    // on a missing name, CREATE OR REPLACE is just an atomic create
    spark.sql(
      """CREATE OR REPLACE TABLE ccat.fresh USING azof
         AS SELECT '1' AS key, TIMESTAMP'2024-01-05 00:00:00' AS event_time,
                   'new' AS value""")
    assert(spark.sql("SELECT value FROM ccat.fresh").collect()
      .map(_.getString(0)).toSeq == Seq("new"))
  }

  test("an in-flight staging directory is invisible to listTables and " +
    "tableExists") {
    // simulate a concurrent CTAS mid-write: a staged table exists on disk
    import graft.format.{ColumnDef, ColumnType, TableSchema}
    AzofWriter.createTable(spark, lake, ".stage-deadbeef-ghost",
      TableSchema(Seq(ColumnDef("value", ColumnType.AzString, nullable = true))),
      java.time.Instant.EPOCH)
    val listed = spark.sql("SHOW TABLES IN ccat").collect()
      .map(_.getString(1)).toSeq
    assert(!listed.exists(_.contains("ghost")), listed.toString)
    assert(intercept[Exception](
      spark.sql("SELECT * FROM ccat.ghost").collect()).getMessage
      .contains("ghost"))
  }
}
