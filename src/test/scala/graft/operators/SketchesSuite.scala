package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{FreqSummary, FrequentItemsAggregator}

/** Misra–Gries heavy hitters: the deterministic no-false-negative
  * guarantee under k far below the distinct count, parallel-merge
  * soundness, and exactness of the two-pass plan vs a plain
  * GROUP BY HAVING.
  */
class SketchesSuite extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish stream: item i (1..50) appears ceil(3000/i) times —
    * 150k-ish values, 50 distinct, heavily skewed head.
    */
  private def zipf: Seq[String] =
    (1 to 50).flatMap(i => Seq.fill(3000 / i)(s"w$i"))

  test("embeddingDrift: identical snapshots ~1.0, orthogonal ~0.0, scalar replica") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(3)
    val vecs = (0 until 40).map(_ => Array.fill(8)(rnd.nextGaussian().toFloat))
    val a = vecs.map(Tuple1(_)).toDF("embedding")
    // same distribution against itself: cosine of identical means = 1
    val self = Sketches.embeddingDrift(a, a, "embedding").head()
    assert(self.getLong(0) == 40 && self.getLong(1) == 40)
    assert(self.getDouble(2) >= 0.9999, self.toString)
    // disjoint axes: means orthogonal
    val x = (0 until 10).map(_ => Tuple1(Array(1f, 0f))).toDF("embedding")
    val y = (0 until 20).map(_ => Tuple1(Array(0f, 1f))).toDF("embedding")
    val ortho = Sketches.embeddingDrift(x, y, "embedding").head()
    assert(math.abs(ortho.getDouble(2)) <= 0.0001, ortho.toString)
    // scalar replica of the exact-grid arithmetic on a random split
    val b = vecs.take(17).map(v => Tuple1(v.map(x2 => x2 + 0.3f))).toDF("embedding")
    val got = Sketches.embeddingDrift(a, b, "embedding").head().getDouble(2)
    def gridSums(vs: Seq[Array[Float]]): Array[BigInt] = {
      val s = Array.fill(8)(BigInt(0))
      for (v <- vs; d <- 0 until 8)
        s(d) += BigInt(math.floor(v(d).toDouble * 1.0e7).toLong)
      s
    }
    val sa = gridSums(vecs)
    val sb = gridSums(vecs.take(17).map(_.map(_ + 0.3f)))
    val num = (0 until 8).map(d => sa(d) * sb(d)).sum
    val da = (0 until 8).map(d => sa(d) * sa(d)).sum
    val db = (0 until 8).map(d => sb(d) * sb(d)).sum
    val want = math.floor(num.toDouble /
      (math.sqrt(da.toDouble) * math.sqrt(db.toDouble)) * 10000) / 10000
    assert(got == want)
    // dimension mismatch fails loudly AND names the differing keys
    val e = intercept[IllegalArgumentException] {
      Sketches.embeddingDrift(a, x, "embedding")
    }
    assert(e.getMessage.contains("dimension key mismatch") &&
      e.getMessage.contains("a-only"), e.getMessage)
  }

  test("embeddingDriftByGroup == pairwise embeddingDrift, ordered, guarded") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(11)
    val docs = (0 until 90).map { i =>
      val g = s"src${i % 3}"
      val base = (i % 3).toDouble
      (g, Array.fill(6)((rnd.nextGaussian() + base).toFloat))
    }
    val df = docs.toDF("source", "embedding")
    val matrix = Sketches.embeddingDriftByGroup(df, "source", "embedding")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(matrix.keySet ==
      Set(("src0", "src1"), ("src0", "src2"), ("src1", "src2")))
    for (((a, b), (na, nb, cos)) <- matrix) {
      val pair = Sketches.embeddingDrift(
        df.filter(col("source") === a).select("embedding"),
        df.filter(col("source") === b).select("embedding"), "embedding").head()
      assert(pair.getLong(0) == na && pair.getLong(1) == nb)
      assert(pair.getDouble(2) == cos, s"($a,$b)")
    }
    // a single group is a configuration error
    val one = Seq(("only", Array(1f, 0f))).toDF("source", "embedding")
    val e = intercept[IllegalArgumentException] {
      Sketches.embeddingDriftByGroup(one, "source", "embedding")
    }
    assert(e.getMessage.contains("groups"))
  }

  test("embeddingDrift rejects malformed vectors instead of skewing the measure") {
    // a NaN would cast to grid 0 and a null component would drop out of
    // its dimension's sum — both must FAIL, not move cos_means
    val good = Seq(Tuple1(Array(1f, 0f))).toDF("embedding")
    val nan = Seq(Tuple1(Array(Float.NaN, 1f))).toDF("embedding")
    val inf = Seq(Tuple1(Array(Float.PositiveInfinity, 1f))).toDF("embedding")
    for (bad <- Seq(nan, inf)) {
      val e = intercept[IllegalArgumentException] {
        Sketches.embeddingDrift(good, bad, "embedding")
      }
      assert(e.getMessage.contains("null/NaN/Inf"), e.getMessage)
    }
    val nullVec = Seq(Tuple1(Array(1f, 0f)), Tuple1(null: Array[Float]))
      .toDF("embedding")
    val e2 = intercept[IllegalArgumentException] {
      Sketches.embeddingDrift(good, nullVec, "embedding")
    }
    assert(e2.getMessage.contains("null vectors"), e2.getMessage)
  }

  test("summary never misses an item above n/(k+1), counts are lower bounds") {
    val data = new scala.util.Random(7).shuffle(zipf)
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = data.size.toLong
    val k = 10 // far below the 50 distinct values
    val s: FreqSummary = data.toDS().repartition(8)
      .select(new FrequentItemsAggregator(k).toColumn).head()
    assert(s.n == n)
    assert(s.counts.size <= k)
    val mustHave = truth.filter(_._2 > n / (k + 1).toDouble).keySet
    assert(mustHave.subsetOf(s.counts.keySet),
      s"missing guaranteed items: ${mustHave -- s.counts.keySet}")
    // reported counts never exceed the truth (MG only undercounts)
    s.counts.foreach { case (w, c) => assert(c <= truth(w), s"$w overcounted") }
  }

  test("heavyHitters equals the exact GROUP BY HAVING plan") {
    val df = new scala.util.Random(7).shuffle(zipf).toDF("value").repartition(8)
    val threshold = 25 // items above n/25 = 4%
    val got = Sketches.heavyHitters(df, col("value"), threshold)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val n = df.count()
    val exact = df.groupBy(col("value")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > n.toDouble / threshold)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == exact)
    assert(exact.nonEmpty, "test data must actually contain heavy hitters")
  }

  test("uniform data: no value above threshold, empty result, empty-safe") {
    val df = (1 to 1000).map(i => s"u${i % 100}").toDF("value")
    val out = Sketches.heavyHitters(df, col("value"), threshold = 50)
    assert(out.collect().isEmpty) // all values at exactly 1%, none above 2%
    val none = Sketches.heavyHitters(df.limit(0), col("value"), threshold = 50)
    assert(none.collect().isEmpty)
  }

  test("nulls are ignored, non-string values are counted via cast") {
    val df = Seq[(Integer, Int)]((7, 1), (7, 2), (null.asInstanceOf[Integer], 3), (8, 4))
      .toDF("value", "x")
    val out = Sketches.heavyHitters(df, col("value"), threshold = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // 3 non-null values, cutoff 1.5: only 7 (count 2) qualifies
    assert(out == Map("7" -> 2L))
  }

  /** Scalar replica of the grid-cosine-to-centroid score. */
  private def refCos(doc: Seq[Double], group: Seq[Seq[Double]]): Double = {
    def grid(v: Seq[Double]) = v.map(x => StrictMath.floor(x * 1.0e7).toLong)
    val gv = grid(doc)
    val cent = group.map(grid).transpose.map(_.sum)
    graft.functions.GridSumAggregator.cosFloored(gv, cent)
  }

  test("embeddingOutliers == scalar replica; leave-one-in; collision guards") {
    val rnd = new scala.util.Random(11)
    def vec(center: Double) =
      Seq.fill(8)(center + rnd.nextGaussian() * 0.3)
    val rows = (0L until 20L).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      val center = if (g == "a") 0.5 else -0.5
      // plant an outlier: doc 6 of group a points the other way
      val v = if (i == 6) vec(-0.9) else vec(center)
      (i, g, v)
    }
    val df = rows.toDF("id", "g", "emb")
    val byGroup = rows.groupBy(_._2).map { case (g, rs) => g -> rs.map(_._3) }
    val expected = rows.map { case (i, g, v) => (i, g, refCos(v, byGroup(g))) }
      .filter(_._3 <= 0.0).toSet
    val got = Sketches.embeddingOutliers(df, "g", "id", "emb", maxCos = 0.0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == expected)
    assert(got.exists(_._1 == 6L)) // the planted outlier surfaces
    // collision guard
    intercept[IllegalArgumentException] {
      Sketches.embeddingOutliers(
        df.withColumn("centroid", lit(1)), "g", "id", "emb", 0.0)
    }
  }

  test("centroid gate: reference-trained, unseen groups pass, STREAM-stateless") {
    val ref = (0L until 12L).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      (i, g, Seq.fill(6)(if (g == "a") 1.0 else -1.0))
    }
    val refDf = ref.toDF("id", "g", "emb")
    val cents = Sketches.embeddingCentroids(refDf, "g", "emb")
    // live rows: aligned keeps, anti-aligned drops, unseen group passes
    val live = Seq(
      (100L, "a", Seq.fill(6)(0.9)),   // cos 1 -> keep
      (101L, "a", Seq.fill(6)(-0.9)),  // cos -1 -> drop
      (102L, "b", Seq.fill(6)(-0.4)),  // cos 1 -> keep
      (103L, "zz", Seq.fill(6)(0.0)))  // unseen group -> pass
    val liveDf = live.toDF("id", "g", "emb")
    val kept = Sketches.filterByCentroidCosine(liveDf, "g", "emb", cents,
        minCos = 0.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(100L, 102L, 103L))
    // the same call serves a MemoryStream — stateless (no state store)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Seq[Double])]
    val gated = Sketches.filterByCentroidCosine(
      input.toDF().toDF("id", "g", "emb"), "g", "emb", cents, minCos = 0.0)
    val q = gated.writeStream.format("memory").queryName("centroid_gate")
      .outputMode("append").start()
    try {
      input.addData(live)
      q.processAllAvailable()
      val streamed = spark.table("centroid_gate")
        .select("id").collect().map(_.getLong(0)).toSet
      assert(streamed == kept)
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }
}
