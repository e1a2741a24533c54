package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native DotProduct expression (codegen + interpreted paths) and the
  * column-level vector helpers built on it.
  */
class VectorFunctionsSuite extends SparkSpec {
  import spark.implicits._

  private def pairs = Seq(
    (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (Array(1.0, 0.0), Array(0.0, 1.0))).toDF("a", "b")

  test("dot product, hand-computed") {
    val out = pairs.select(VectorFunctions.dot($"a", $"b")).collect()
    assert(out(0).getDouble(0) == 32.0) // 4 + 10 + 18
    assert(out(1).getDouble(0) == 0.0)
  }

  test("float arrays are coerced to double before the kernel") {
    val f = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val out = f.select(VectorFunctions.dot($"a", $"b")).collect()
    assert(out(0).getDouble(0) == 11.0)
  }

  test("norm and cosine") {
    val df = Seq((Array(3.0, 4.0), Array(3.0, 4.0))).toDF("a", "b")
    val row = df.select(
      VectorFunctions.norm($"a"),
      VectorFunctions.cosine($"a", $"b")).collect()(0)
    assert(math.abs(row.getDouble(0) - 5.0) < 1e-12)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
  }

  test("null vector yields null, not a crash") {
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]])).toDF("a", "b")
    val out = df.select(VectorFunctions.dot($"a", $"b")).collect()
    assert(out(0).isNullAt(0))
  }

  test("interpreted eval agrees with codegen") {
    // nullSafeEval is exercised when codegen is disabled for the plan
    val df = pairs
    val expr = VectorFunctions.dot($"a", $"b")
    val viaCodegen = df.select(expr).collect().map(_.getDouble(0)).toSeq
    val viaFilterEval = df.filter(expr > lit(-1e18)).count() // forces predicate eval
    assert(viaCodegen == Seq(32.0, 0.0))
    assert(viaFilterEval == 2)
  }

  test("graft_dot is registered for SQL") {
    VectorFunctions.register(spark)
    pairs.createOrReplaceTempView("vf_pairs")
    val out = spark.sql("SELECT graft_dot(a, b) FROM vf_pairs").collect()
    assert(out.map(_.getDouble(0)).toSet == Set(32.0, 0.0))
  }

  test("native sign band keys == scalar hyperplane replica (UDF-era values)") {
    val (bits, bands) = (16, 4)
    val width = bits / bands
    val mask = (1L << width) - 1
    val vecs = Seq(
      Array(0.3, -1.2, 4.5, 0.0, 2.2),
      Array(-0.5, -0.5),
      Array(1e-9, -1e-9, 0.0),
      Array.tabulate(64)(i => math.sin(i.toDouble)))
    val got = vecs.zipWithIndex.map(_.swap).toDF("id", "v")
      .select($"id", VectorFunctions.signBandKeys(bits, bands)($"v").as("bks"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    for ((vec, id) <- vecs.zipWithIndex) {
      var sig = 0L
      for (b <- 0 until bits) {
        var s = 0.0
        for (i <- vec.indices) {
          val r = Hashing.splitmix64(b.toLong * 100003L + i)
          s += (if (r < 0) -vec(i) else vec(i))
        }
        if (s > 0) sig |= (1L << b)
      }
      val expected = (0 until bands).map(c => (sig >>> (c * width)) & mask)
      assert(got(id) == expected, s"vec $id")
    }
  }
}
