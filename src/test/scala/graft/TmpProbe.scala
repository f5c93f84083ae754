package graft

import org.apache.spark.sql.SparkSession

/** Disposable micro-probe (not shipped): does returning the REWRITTEN
  * optimized plan (instead of the conf-scoped Dataset) change count()
  * execution time and keep results identical?
  */
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q69_star_pinned_histogram")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.AzofExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001").count()
    fn(spark, dir).count()
    def ofOpt(df: org.apache.spark.sql.DataFrame) =
      org.apache.spark.sql.graft.StreamingBridge.ofRows(spark,
        df.queryExecution.optimizedPlan)
    // result equality
    val a = fn(spark, dir)
    val aRows = a.collect().map(_.toString).sorted.toSeq
    val b = ofOpt(fn(spark, dir))
    val bRows = b.collect().map(_.toString).sorted.toSeq
    println(s"rows equal: ${aRows == bRows} (${aRows.size} rows)")
    println(s"schema equal: ${a.schema == b.schema}")
    println("schema a: " + a.schema.map(f => (f.name, f.dataType, f.nullable)).mkString)
    println("schema b: " + b.schema.map(f => (f.name, f.dataType, f.nullable)).mkString)
    // timing: interleaved min-of-5 per arm
    var ta = Vector.empty[Double]; var tb = Vector.empty[Double]
    for (_ <- 1 to 5) {
      val t0 = System.nanoTime(); fn(spark, dir).count()
      ta :+= (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); ofOpt(fn(spark, dir)).count()
      tb :+= (System.nanoTime() - t1) / 1e9
    }
    println(f"plain count:  min ${ta.min}%.2f median ${ta.sorted.apply(2)}%.2f")
    println(f"served count: min ${tb.min}%.2f median ${tb.sorted.apply(2)}%.2f")
    spark.stop()
  }
}
