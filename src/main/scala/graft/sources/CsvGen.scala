package graft.sources

import graft.format.TableSchema
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV → parquet test-file generator, the Spark equivalent of the
  * reference CLI's `gen` subcommand (reference:
  * crates/azof-cli/src/main.rs:71-99, test_bench.rs:14-51): headerless
  * CSV `key,event_time,values...` parsed against the table's declared
  * schema, timestamps RFC3339 with milliseconds.
  */
object CsvGen {
  def readCsv(spark: SparkSession, schema: TableSchema, csvPath: String): DataFrame =
    spark.read
      .schema(schema.toStruct)
      .option("header", "false")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(csvPath)

  /** `gen` parity: CSV in, single ts-desc-sorted parquet data file out. */
  def gen(
      spark: SparkSession,
      schema: TableSchema,
      csvPath: String,
      tableDir: String,
      fileName: String): Unit =
    AzofWriter.writeDataFile(spark, readCsv(spark, schema, csvPath), tableDir, fileName)
}
