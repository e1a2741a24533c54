package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** O2 theta_join (reference pandance/pandance.py:331-566): expression
  * overload vs equi-transform oracle, opaque-UDF overload, argument-order
  * preservation, exception-swallowing.
  */
class ThetaJoinSuite extends SparkSpec {
  import spark.implicits._

  test("mod condition == equi join after key transformation") {
    // the reference checks theta against a pandas equi-merge the same way
    // (test/test_ops.py:207-216)
    val l = (0 until 40).map(i => (i, i)).toDF("lid", "x")
    val r = (0 until 40).map(i => (i, i)).toDF("rid", "y")
    val theta = ThetaJoin(l, r, (a, b) => a % 7 === b % 7,
      leftOn = Some("x"), rightOn = Some("y"))
    val equi = l.withColumn("k", col("x") % 7)
      .join(r.withColumn("k2", col("y") % 7), col("k") === col("k2"))
    assert(theta.count() == equi.count())
  }

  test("string containment condition, hand-computed") {
    // substring example from the reference docs
    // (pandance/pandance.py:436-454, test/test_ops.py:412-426)
    val kw = Seq((1, "spark"), (2, "flink")).toDF("kid", "kw")
    val docs = Seq((10, "apache spark rocks"), (20, "plain text")).toDF("did", "txt")
    val out = ThetaJoin(kw, docs, (k, t) => t.contains(k),
      leftOn = Some("kw"), rightOn = Some("txt"))
    assert(rowSet(out.select("kid", "did")) == Set(Seq("1", "10")))
  }

  test("argument order is preserved (condition is asymmetric)") {
    // reference re-swaps args after side selection
    // (pandance/pandance.py:507-526); prove the asymmetry matters
    val l = Seq((1, 10)).toDF("lid", "x")
    val r = Seq((10, 20)).toDF("rid", "y")
    val lt = ThetaJoin(l, r, (a, b) => a < b, leftOn = Some("x"), rightOn = Some("y"))
    val gt = ThetaJoin(l, r, (a, b) => a > b, leftOn = Some("x"), rightOn = Some("y"))
    assert(lt.count() == 1 && gt.count() == 0)
  }

  test("udf overload: opaque Scala predicate") {
    val l = Seq((1, 3), (2, 4)).toDF("lid", "x")
    val r = Seq((10, 7), (20, 8)).toDF("rid", "y")
    val out = ThetaJoin.udf[Int, Int](l, r, (a: Int, b: Int) => (a * b) % 2 == 1,
      leftOn = Some("x"), rightOn = Some("y"))
    assert(rowSet(out.select("lid", "rid")) == Set(Seq("1", "10")))
  }

  test("udf overload swallows predicate exceptions as non-match") {
    // mirrors the reference's decimal.InvalidOperation guard
    // (pandance/pandance.py:519-526)
    val l = Seq((1, "2"), (2, "oops")).toDF("lid", "x")
    val r = Seq((10, "4")).toDF("rid", "y")
    val out = ThetaJoin.udf[String, String](l, r,
      (a: String, b: String) => a.toInt < b.toInt,
      leftOn = Some("x"), rightOn = Some("y"))
    assert(rowSet(out.select("lid", "rid")) == Set(Seq("1", "10")))
  }

  test("unit-circle invariant: theta matches (cos t, sin t) pairs of the same angle") {
    // port of the reference's hypothesis test (test/test_ops.py:429-450):
    // join x-coords with y-coords on |x^2 + y^2 - 1| < eps; points from
    // the same angle always match, far-apart angles never do
    val rnd = new scala.util.Random(17)
    val angles = Seq.fill(30)(rnd.nextDouble() * 2 * math.Pi)
    val xs = angles.zipWithIndex.map { case (a, i) => (i, math.cos(a)) }.toDF("aid", "x")
    val ys = angles.zipWithIndex.map { case (a, i) => (i, math.sin(a)) }.toDF("bid", "y")
    val out = ThetaJoin.udf[Double, Double](xs, ys,
      (x: Double, y: Double) => math.abs(x * x + y * y - 1.0) < 1e-9,
      leftOn = Some("x"), rightOn = Some("y"))
    val pairs = out.select("aid", "bid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    angles.indices.foreach(i => assert(pairs.contains((i, i)), s"same angle $i must match"))
    // every matched pair genuinely satisfies the invariant
    pairs.foreach { case (i, j) =>
      val v = math.cos(angles(i)); val w = math.sin(angles(j))
      assert(math.abs(v * v + w * w - 1.0) < 1e-9)
    }
  }

  test("equality conjunct in an expression condition plans a hash join, not BNLJ") {
    // the Spark-first reason to prefer the Column overload: Catalyst
    // extracts equi-conjuncts and avoids the nested loop
    val l = (0 until 100).map(i => (i, i % 10, i)).toDF("lid", "k", "x")
    val r = (0 until 100).map(i => (i, i % 10, i)).toDF("rid", "k2", "y")
    val out = l.join(r, col("k") === col("k2") && col("x") < col("y"))
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin"), physical.take(500))
  }
}
