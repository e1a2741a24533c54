package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSuite extends SparkSpec {
  import spark.implicits._

  /** Scalar Morton reference: bit i of dimension c lands at i·n + c. */
  private def mortonRef(xs: Seq[Long], bits: Int): Long = {
    val n = xs.size
    var z = 0L
    for ((x, c) <- xs.zipWithIndex; i <- 0 until bits)
      z |= ((x >> i) & 1L) << (i * n + c)
    z
  }

  test("zorderValue == scalar bit-interleave reference; bounds enforced") {
    val rows = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zorderValue(Seq(col("x"), col("y")), bits = 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((x, y) <- rows)
      assert(got((x, y)) == mortonRef(Seq(x, y), 4), s"($x,$y)")
    val d3 = Seq((5L, 3L, 7L)).toDF("a", "b", "c")
      .select(Layout.zorderValue(Seq(col("a"), col("b"), col("c")), bits = 3))
      .head.getLong(0)
    assert(d3 == mortonRef(Seq(5L, 3L, 7L), 3))
    intercept[IllegalArgumentException] { Layout.zorderValue(Nil) }
    intercept[IllegalArgumentException] {
      Layout.zorderValue(Seq(col("a"), col("b")), bits = 32) // 64 bits > signed long
    }
  }

  test("minMaxBuckets: exact affine scaling; constant column maps to 0") {
    val df = Seq(0L, 5L, 10L).toDF("v").withColumn("c", lit(7L))
    val out = Layout.minMaxBuckets(df, Seq("v", "c"), bits = 2)
      .orderBy("v").collect()
      .map(r => (r.getAs[Long]("v_zb"), r.getAs[Long]("c_zb"))).toSeq
    // scale 3 over spread 10: (0·3) div 10 = 0, (5·3) div 10 = 1, (10·3) div 10 = 3
    assert(out == Seq((0L, 0L), (1L, 0L), (3L, 0L)))
    intercept[IllegalArgumentException] {
      Layout.minMaxBuckets(df.withColumn("v_zb", lit(1L)), Seq("v"))
    }
  }

  test("minMaxBuckets: overflow guard catches a WRAPPING spread") {
    // near-full-range longs (a 64-bit hash used as a z dimension):
    // mx - mn wraps negative in long arithmetic and would PASS a long
    // guard compare — the double-based guard cannot wrap and must trip
    val df = Seq((1L, Long.MinValue + 1L), (2L, Long.MaxValue - 1L))
      .toDF("id", "v")
    val e = intercept[Exception] {
      Layout.minMaxBuckets(df, Seq("v")).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.toString + msgs(t.getCause)
    assert(msgs(e).contains("overflows a signed long"), msgs(e).take(400))
  }

  test("zorderLayout: range exchange on zvalue; z quadrants bound BOTH dims") {
    val rows = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val z = Layout.zorderLayout(rows.toDF("x", "y"), Seq("x", "y"), bits = 6,
      outPartitions = 4)
    val plan = z.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"), plan)
    assert(plan.contains("Sort"), plan)
    val data = z.select("x", "y", "zvalue").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(data.length == 64 * 64)
    // on a 64×64 grid the buckets are the values themselves; the top two
    // z bits are (y_hi, x_hi), so every z quadrant spans exactly half of
    // EACH dimension — the two-sided pruning a lexicographic sort lacks
    for ((q, rowsQ) <- data.groupBy(_._3 >> 10)) {
      val xs = rowsQ.map(_._1); val ys = rowsQ.map(_._2)
      assert(xs.max - xs.min <= 31, s"z quadrant $q x spread")
      assert(ys.max - ys.min <= 31, s"z quadrant $q y spread")
    }
    intercept[IllegalArgumentException] {
      Layout.zorderLayout(rows.toDF("x", "y").withColumn("zvalue", lit(1L)),
        Seq("x", "y"))
    }
  }
}
