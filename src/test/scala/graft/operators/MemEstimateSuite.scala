package graft.operators

import graft.SparkSpec

/** O4 _estimate_mem_cost_cartesian port (pandance/pandance.py:894-917) as
  * a planning heuristic.
  */
class MemEstimateSuite extends SparkSpec {
  import spark.implicits._

  test("cartesian estimate = rows_a * rows_b * widths, in MiB") {
    val a = (0 until 1024).map(i => Tuple1(i.toLong)).toDF("x")
    val b = (0 until 1024).map(i => Tuple1(i.toDouble)).toDF("y")
    // 1024 * 1024 pairs * (8 + 8) bytes = 16 MiB
    assert(MemEstimate.cartesianMiB(a, "x", b, "y") == 16L)
  }

  test("warnIfLarge returns the estimate either way") {
    val a = (0 until 100).map(i => Tuple1(i.toLong)).toDF("x")
    val est = MemEstimate.warnIfLarge(a, "x", a, "x", warnMiB = 0)
    assert(est == MemEstimate.cartesianMiB(a, "x", a, "x"))
  }
}
