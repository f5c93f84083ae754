package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for declared queries to files (test
  * scope, not shipped) — the r17+ optimization-round evidence trail.
  *
  * {{{ jrun.sh graft.PlanDump plans/r17 after d06_simhash_near_pairs,d20_containment }}}
  *
  * Extra confs via SPARK_GRAFT_CONF="k=v;k2=v2" (e.g. the
  * spark.azof.fanout kill switch to reproduce the "before" plans).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val extra = sys.env.getOrElse("SPARK_GRAFT_CONF", "").split(";")
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val spark = extra.foldLeft(SparkSession.builder()
        .withExtensions(new graft.plans.AzofExtensions)
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")) {
        case (b, (k, v)) => b.config(k, v)
      }.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // SPARK_GRAFT_PLAN_ACTION=1: dump the plan of a FRESH action over
    // the returned frame (df.select(all).count-shape re-planning) — the
    // plan the bench's count() / Verify's write actually executes,
    // which for conf-scoped queries can differ from the frame's own
    // QueryExecution (see AzofQueries.servedFrame)
    val actionMode = sys.env.contains("SPARK_GRAFT_PLAN_ACTION")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val qe =
        if (actionMode) df.groupBy().count().queryExecution
        else df.queryExecution
      val plan = qe.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val path = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
      java.nio.file.Files.write(path, plan.getBytes("UTF-8"))
      println(s"wrote $path (${plan.length} chars)")
    }
    spark.stop()
  }
}
