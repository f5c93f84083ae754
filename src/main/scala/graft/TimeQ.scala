package graft
import org.apache.spark.sql.SparkSession

/** Per-query micro-benchmark: warm each named query at sf0.001, then time
  * 3 runs at the target SF. Usage: runMain graft.TimeQ [sfDir] [query ...]
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.AzofExtensions).master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    names.foreach { n =>
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        println(f"$n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
