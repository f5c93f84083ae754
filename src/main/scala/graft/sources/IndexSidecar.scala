package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.format.AzofTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Tiny JSON sidecar files the index family keeps beside its azof
  * tables — frozen models, high-water marks, emission cursors. One
  * read/write implementation instead of a copy per index
  * ([[ShardMap]], [[SeqMap]]; [[KeyMap]] and [[DedupFlow]] predate it
  * and keep their documented file formats).
  */
private[sources] object IndexSidecar {

  def path(
      spark: SparkSession, idxLake: String, idxTable: String,
      name: String): Path =
    new Path(AzofTable(spark, idxLake, idxTable).tableDir, name)

  def readNode(
      spark: SparkSession, idxLake: String, idxTable: String,
      file: String): Option[JsonNode] = {
    val p = path(spark, idxLake, idxTable, file)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new ObjectMapper().readTree(in))
      finally in.close()
    }
  }

  def readLong(
      spark: SparkSession, idxLake: String, idxTable: String,
      file: String, field: String): Option[Long] =
    readNode(spark, idxLake, idxTable, file).map(_.get(field).asLong)

  /** Forward-only value (HWMs, cursors): overwrites. */
  def writeLong(
      spark: SparkSession, idxLake: String, idxTable: String,
      file: String, field: String, value: Long): Unit =
    write(spark, idxLake, idxTable, file, s"""{"$field":$value}""",
      overwrite = true)

  /** Frozen content (models): refuses to overwrite. */
  def writeOnce(
      spark: SparkSession, idxLake: String, idxTable: String,
      file: String, json: String): Unit =
    write(spark, idxLake, idxTable, file, json, overwrite = false)

  private def write(
      spark: SparkSession, idxLake: String, idxTable: String,
      file: String, json: String, overwrite: Boolean): Unit = {
    val p = path(spark, idxLake, idxTable, file)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, overwrite)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
