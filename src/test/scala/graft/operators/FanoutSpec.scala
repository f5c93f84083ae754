package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the scale-adaptive read fan-out (r17 optimization):
  *
  *  - spread is row-preserving — a pure redistribution, never a
  *    transformation;
  *  - the kill switch (`spark.azof.fanout=false`) restores the exact
  *    pass-through frame (the A/B-probe contract);
  *  - the guard is scale-adaptive: when the leaf input is big enough to
  *    split across a quarter of the cores at the configured split size,
  *    spread must return the frame UNTOUCHED (no shuffle added at
  *    production scale);
  *  - the spread key must survive planning next to an upstream groupBy
  *    on the same columns (the xxhash64-vs-raw-key elision hazard that
  *    let AQE serialize the d06 pair emit).
  */
class FanoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.toString.linesIterator
      .count(_.contains("Exchange"))

  test("spread preserves rows exactly and raises partition count") {
    val df = (1 to 1000).map(i => (i.toLong, s"doc$i")).toDF("id", "t")
      .coalesce(1)
    val out = Fanout.spread(df, col("id"))
    assert(out.rdd.getNumPartitions > 1)
    assert(out.collect().toSet === df.collect().toSet)
  }

  test("kill switch returns the input frame itself") {
    spark.conf.set("spark.azof.fanout", "false")
    try {
      val df = (1 to 10).toDF("id").coalesce(1)
      assert(Fanout.spread(df, col("id")) eq df)
    } finally spark.conf.unset("spark.azof.fanout")
  }

  test("guard no-ops when leaf input is large at the configured split size") {
    val dir = java.nio.file.Files.createTempDirectory("fanout").toString
    (1 to 5000).map(i => (i.toLong, "x" * 50)).toDF("id", "t")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val onDisk = spark.read.parquet(dir)
    // Force the guard closed: with a tiny split size the scan already
    // fans out on its own, so spread must NOT add an exchange.
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    try {
      assert(Fanout.spread(onDisk, col("id")) eq onDisk)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    // And open: at the default 128m split size one small file is one
    // task, so spread must redistribute.
    assert(!(Fanout.spread(onDisk, col("id")) eq onDisk))
  }

  test("xxhash64 spread key survives an upstream groupBy on the raw key") {
    val grouped = (1 to 500).map(i => (i % 7, i.toLong)).toDF("k", "id")
      .groupBy("k").agg(sort_array(collect_list(col("id"))).as("ids"))
    // raw-key repartition at the groupBy's own partition count is
    // elided as satisfying its hash partitioning; the xxhash64 key must
    // keep its exchange
    val n = spark.sessionState.conf.numShufflePartitions
    val raw = grouped.repartition(n, col("k"))
    val hashed = grouped.repartition(n, xxhash64(col("k")))
    assert(shuffleCount(hashed) > shuffleCount(raw))
  }
}
