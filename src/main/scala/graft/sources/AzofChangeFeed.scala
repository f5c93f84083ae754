package graft.sources

import graft.format._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Change feed between two snapshot versions — the batch form of the
  * reference's "Streaming in scan" roadmap item (reference:
  * README.md:158-159): every row added by commits in `(fromVersion,
  * toVersion]`, tagged with `_commit_version`. Azof is insert/upsert-only
  * (no deletes), so the feed is exactly the new data files of each
  * data-adding commit; `compact` snapshots rewrite existing rows and are
  * skipped via the snapshot `op` marker.
  */
object AzofChangeFeed {

  def between(
      spark: SparkSession,
      lakehousePath: String,
      table: String,
      fromVersion: Long,
      toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion, "fromVersion must be <= toVersion")
    val t = AzofTable(spark, lakehousePath, table)
    val schema = t.snapshot(toVersion.toString).schema

    val batches = ((fromVersion + 1) to toVersion).flatMap { v =>
      val snap = t.snapshot(v.toString)
      if (snap.op.contains("compact")) Seq.empty
      else {
        val prev = t.snapshot((v - 1).toString)
        val newFiles = (snap.allFiles -- prev.allFiles).toSeq.sorted
        newFiles.map { f =>
          spark.read
            .schema(schema.toStruct)
            .parquet(new Path(t.tableDir, f).toString)
            .withColumn("_commit_version", lit(v))
        }
      }
    }

    if (batches.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema.toStruct.add("_commit_version", "long"))
    else batches.reduce(_ unionAll _)
  }

  /** Feed from a version up to the current snapshot. */
  def since(
      spark: SparkSession,
      lakehousePath: String,
      table: String,
      fromVersion: Long): DataFrame = {
    val t = AzofTable(spark, lakehousePath, table)
    between(spark, lakehousePath, table, fromVersion, t.currentVersion.toLong)
  }
}
