package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the r18 lazy-frame cache in [[Tables]]: the cache removes
  * per-call schema re-inference (listing + footer read) but must stay a
  * pure metadata cache — identical rows, lazy plan only, kill-switch
  * bypass for the A/B probe.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("tables-cache").toString
    import spark.implicits._
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$d/things.parquet")
    d
  }

  test("cache hit returns the SAME lazy frame, with identical rows") {
    val a = Tables(spark, dir, "things")
    val b = Tables(spark, dir, "things")
    assert(a eq b) // plan reuse — no re-listing, no footer re-read
    assert(a.count() == 100)
    assert(a.where("id <= 3").collect().map(_.getString(1)).sorted.toSeq ==
      Seq("v1", "v2", "v3"))
  }

  test("kill switch bypasses the cache (fresh frame per call)") {
    spark.conf.set("spark.azof.tables.cache", "false")
    try {
      val a = Tables(spark, dir, "things")
      val b = Tables(spark, dir, "things")
      assert(!(a eq b))
      assert(a.count() == 100 && b.count() == 100)
    } finally spark.conf.unset("spark.azof.tables.cache")
  }

  test("cached and uncached frames agree row-for-row") {
    val cached = Tables(spark, dir, "things").collect().toSet
    spark.conf.set("spark.azof.tables.cache", "false")
    try {
      val fresh = Tables(spark, dir, "things").collect().toSet
      assert(cached == fresh)
    } finally spark.conf.unset("spark.azof.tables.cache")
  }
}
