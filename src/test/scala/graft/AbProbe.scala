package graft

import org.apache.spark.sql.SparkSession

/** Same-session alternating A/B perf probe (test scope, not shipped) —
  * the round-14/16 protocol: toggle ONE boolean conf between arms in a
  * single warm JVM, interleave the runs (A B A B …), report min-of-N
  * per arm. Interleaving makes box-level noise land on both arms;
  * min-of-N reports plan cost, not scheduler spikes.
  *
  * {{{ sbt "Test/runMain graft.AbProbe d20_containment spark.azof.fanout /root/testdata/sf0.1 6" }}}
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val confKey = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 3) args(3).toInt else 6
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
    // warm both arms: JIT/codegen + lake builds untimed
    Seq("true", "false").foreach { v =>
      spark.conf.set(confKey, v)
      fn(spark, "/root/testdata/sf0.001").count()
      fn(spark, sfDir).count()
    }
    val times = collection.mutable.Map(
      "true" -> Vector.empty[Double], "false" -> Vector.empty[Double])
    for (i <- 1 to rounds; v <- Seq("true", "false")) {
      spark.conf.set(confKey, v)
      System.gc(); Thread.sleep(150)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      times(v) :+= t
      println(f"round $i $confKey=$v%-5s $t%.2f s")
    }
    val on = times("true"); val off = times("false")
    println(f"ON  (conf=true):  min ${on.min}%.2f  median ${on.sorted.apply(on.size / 2)}%.2f")
    println(f"OFF (conf=false): min ${off.min}%.2f  median ${off.sorted.apply(off.size / 2)}%.2f")
    spark.stop()
  }
}
