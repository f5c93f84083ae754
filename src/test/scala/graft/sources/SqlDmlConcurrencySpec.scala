package graft.sources

import graft.TestSpark
import graft.format._
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Concurrent row-level DML: each statement's task files land under
  * collision-free unique names and only the cheap metadata step
  * contends, so racing MERGE/UPDATE statements (and a racing library
  * delta commit) all land — the optimistic commit re-reads the winner's
  * snapshot and re-applies, never dropping a landed write.
  */
class SqlDmlConcurrencySpec extends AnyFunSuite {
  private lazy val lake = Files.createTempDirectory("azof-dmlc").toString
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.dmlc", classOf[AzofCatalog].getName)
    s.conf.set("spark.sql.catalog.dmlc.path", lake)
    s
  }

  private def ts(s: String) = Instant.parse(s)
  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  test("racing UPDATEs on disjoint keys all land") {
    AzofWriter.createTable(spark, lake, "t", schema,
      ts("2024-01-01T00:00:00Z"))
    val rows = (1 to 8).map(i =>
      Row(i.toString, Timestamp.from(ts("2024-01-05T00:00:00Z")), s"v$i"))
    AzofWriter.commitDelta(spark, lake, "t",
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows), schema.toStruct),
      ts("2024-01-05T00:00:00Z"), ts("2024-01-05T00:00:00Z"))
    val v0 = AzofTable(spark, lake, "t").currentVersion.toLong

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val statements = (1 to 4).map { i => () =>
      spark.sql(s"UPDATE dmlc.t SET value = concat(value, '_u$i') " +
        s"WHERE key IN ('${2 * i - 1}', '${2 * i}')")
    } :+ { () =>
      // a racing library commit contends for the same metadata slot
      AzofWriter.commitDelta(spark, lake, "t",
        spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(Row("9",
            Timestamp.from(ts("2024-01-06T00:00:00Z")), "v9"))),
          schema.toStruct),
        ts("2024-01-06T00:00:00Z"), ts("2024-01-06T00:00:00Z"))
      spark.emptyDataFrame
    }
    Await.result(
      Future.sequence(statements.map(f => Future(f()))), 120.seconds)

    // every statement landed exactly once: 5 new versions, all 8 keys
    // updated by exactly their thread, the racer's key present
    val t = AzofTable(spark, lake, "t")
    assert(t.currentVersion.toLong == v0 + 5)
    val got = spark.sql("SELECT key, value FROM dmlc.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    (1 to 8).foreach { k =>
      val owner = (k + 1) / 2
      assert(got(k.toString) == s"v${k}_u$owner")
    }
    assert(got("9") == "v9")
  }
}
