package graft

import org.apache.spark.sql.SparkSession

/** Local perf probe (test scope, not shipped): time one SparkEntry query
  * N times in a warm JVM to separate plan cost from box noise.
  *
  * {{{ sbt "Test/runMain graft.QueryProbe d11_dedup_components /root/testdata/sf0.1 8" }}}
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // extra confs: SPARK_GRAFT_CONF="k=v;k2=v2"
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
    // per-job timing: find WHERE a slow run stalls
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val slowJobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    if (sys.env.contains("SPARK_GRAFT_PROBE_JOBS"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobStarts.put(e.jobId, e.time)
          override def onJobEnd(
              e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val ms = e.time - jobStarts.getOrDefault(e.jobId, e.time)
            slowJobs.add(s"job ${e.jobId}: ${ms}ms")
          }
        })
    // per-stage wall + task time: find WHICH OPERATOR a slow job is in
    if (sys.env.contains("SPARK_GRAFT_PROBE_STAGES"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              e: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            val s = e.stageInfo
            val wall = (for {
              a <- s.submissionTime; b <- s.completionTime
            } yield b - a).getOrElse(-1L)
            val run = s.taskMetrics.executorRunTime
            val gc = s.taskMetrics.jvmGCTime
            val m = s.taskMetrics
            val floor = sys.env.getOrElse("SPARK_GRAFT_PROBE_STAGES", "100")
              .trim match { case "" | "1" => 100L; case v => v.toLong }
            if (wall >= floor) slowJobs.add(
              f"stage ${s.stageId}%d wall=${wall}ms run=${run}ms " +
                f"gc=${gc}ms tasks=${s.numTasks}%d " +
                f"in=${m.inputMetrics.recordsRead}%d " +
                f"sr=${m.shuffleReadMetrics.recordsRead}%d " +
                f"sw=${m.shuffleWriteMetrics.recordsWritten}%d " +
                f"out=${m.outputMetrics.recordsWritten}%d")
          }
        })
    if (name == "_cc_leak") {
      import spark.implicits._
      def mk(): Unit = {
        val pairs = (0L until 5000L).map(i => (i, i + 1)).toDF("a", "b")
        var r = graft.operators.Dedup.connectedComponents(pairs, "a", "b")
        r.count()
        println(s"  made: persistent=${spark.sparkContext.getPersistentRDDs.size}")
        r = null
      }
      (1 to 3).foreach(_ => mk())
      (1 to 5).foreach { i =>
        System.gc(); Thread.sleep(1000)
        println(s"  after gc $i: persistent=${spark.sparkContext.getPersistentRDDs.size}")
      }
      spark.stop(); return
    }
    if (name == "_ckpt_leak") {
      // isolated reproduction: does a dropped localCheckpoint frame get
      // its blocks reclaimed after GC?
      import spark.implicits._
      def mk(): Unit = {
        var df = spark.range(100000).toDF("id").localCheckpoint(true)
        println(s"  made: persistent=${spark.sparkContext.getPersistentRDDs.size}")
        df = null
      }
      (1 to 3).foreach { _ => mk() }
      (1 to 5).foreach { i =>
        System.gc(); Thread.sleep(1000)
        println(s"  after gc $i: persistent=${spark.sparkContext.getPersistentRDDs.size}")
      }
      spark.stop(); return
    }
    val fn = SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001").count() // JIT/codegen warm
    fn(spark, sfDir).count() // untimed lake build / page-cache warm
    val times = (1 to runs).map { i =>
      System.gc(); Thread.sleep(150)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      df.count()
      val t = (System.nanoTime() - t0) / 1e9
      if (sys.env.contains("SPARK_GRAFT_PROBE_RULES") && i == runs) {
        println(org.apache.spark.sql.catalyst.rules.RuleExecutor
          .dumpTimeSpent().linesIterator.take(25).mkString("\n"))
      }
      if (sys.env.contains("SPARK_GRAFT_PROBE_PHASES")) {
        val ph = df.queryExecution.tracker.phases.map { case (k, v) =>
          f"$k=${(v.endTimeMs - v.startTimeMs)}%dms"
        }.mkString(" ")
        println(f"  build=${tBuild}%.2f exec=${t - tBuild}%.2f  $ph")
      }
      val nRdds = spark.sparkContext.getPersistentRDDs.size
      val mem = java.lang.management.ManagementFactory.getMemoryMXBean
        .getHeapMemoryUsage.getUsed / (1 << 20)
      import scala.jdk.CollectionConverters._
      val gcMs = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
      println(f"RUN$i%d: $t%.2f  rdds=$nRdds%d heapMB=$mem%d gcTotMs=$gcMs%d")
      if (sys.env.contains("SPARK_GRAFT_PROBE_JOBS")) {
        slowJobs.forEach(s => println(s"  SLOW $s"))
        slowJobs.clear()
      }
      if (sys.env.contains("SPARK_GRAFT_PROBE_RDDS"))
        spark.sparkContext.getPersistentRDDs.toSeq.sortBy(_._1).foreach {
          case (id, rdd) => println(
            s"  RDD $id ${rdd.getStorageLevel.description} " +
              s"n=${rdd.name} ${rdd.getClass.getSimpleName}")
        }
      t
    }
    println(f"MIN: ${times.min}%.2f  MAX: ${times.max}%.2f  " +
      f"SPREAD: ${times.max - times.min}%.2f")
    spark.stop()
  }
}
