package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of named SparkEntry
  * queries (the per-round plan-audit loop — `.explain("formatted")`
  * every new operator until the plan is the one you'd want at 100 TB).
  *
  * {{{ sbt "runMain graft.Explain /root/testdata/sf0.001 d09_line_dedup" }}}
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Explain <sfDir> <query> [<query>...]")
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(
          s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      println(s"===== $name =====")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
