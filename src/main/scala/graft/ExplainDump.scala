package graft

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans of selected queries for plan review:
  * runMain graft.ExplainDump [sfDir] [query ...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q02_filter_project", "q03_join_topk", "q05_multi_join_agg")
    // extra confs for A/B plan dumps: SPARK_GRAFT_CONF="k=v;k2=v2"
    val extra = sys.env.getOrElse("SPARK_GRAFT_CONF", "").split(";")
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val spark = extra.foldLeft(SparkSession.builder().master("local[4]")
        .withExtensions(new graft.plans.AzofExtensions)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")) {
        case (b, (k, v)) => b.config(k, v)
      }.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
