package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's flagship shape (filter → join → agg → top-k,
    * reference: crates/azof-datafusion/examples/query_example.rs:19-30).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_join_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.AzofQueries.queries ++
      graft.queries.Pipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
      graft.queries.AzofQueries.oracleSql ++
      graft.queries.Pipeline.oracleSql
}
