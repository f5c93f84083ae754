package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit harness: prints the executed plan's exchange count and
  * scan/window/exchange lines for the named SparkEntry queries — the
  * per-round "is this the plan I'd want at 100 TB" check (shuffle
  * count, pushdown, broadcast vs sort-merge) without spelunking logs.
  * Usage: `runMain graft.ExplainAudit q05_multi_join_agg d14_semdedup`.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.AzofExtensions).master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"===== $name")
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val nEx = "Exchange".r.findAllIn(plan).length
      val nBc = "BroadcastExchange".r.findAllIn(plan).length
      println(s"exchanges=$nEx (broadcast=$nBc)")
      println(plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Scan parquet") || l.contains("Window")).take(25).mkString("\n"))
    }
    spark.stop()
  }
}
