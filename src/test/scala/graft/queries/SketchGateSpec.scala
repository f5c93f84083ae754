package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Error gate for the one rows-only query in the correctness suite:
  * x01's HyperLogLog++ estimate has no hash oracle (sketch values are
  * implementation-specific), so pin it against x02's oracle-checked
  * exact twin instead — within ±5% per group at the driver's gate scale
  * (HLL++ with default rsd 0.05 is well inside that on thousands of
  * distinct users). If a future change swaps the sketch or its
  * parameters, this is the spec that notices.
  */
class SketchGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("x01 approx_count_distinct within ±5% of x02 exact counts") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val approx = Pipeline.queries("x01_approx_distinct")(spark, dir)
    val exact = Pipeline.queries("x02_exact_distinct")(spark, dir)
    val joined = approx.join(exact, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val a = r.getLong(r.fieldIndex("approx_users")).toDouble
      val e = r.getLong(r.fieldIndex("exact_users")).toDouble
      assert(e > 0 && math.abs(a - e) / e <= 0.05,
        s"event_type ${r.get(0)}: approx $a vs exact $e")
    }
  }
}
