package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic hash sampling/splits: stability across repartitioning,
  * split disjointness, per-stratum fraction behavior.
  */
class SamplingSuite extends SparkSpec {
  import spark.implicits._

  private def ids = (0 until 2000).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "g")

  test("hashSample keeps roughly the requested fraction, deterministically") {
    val a = Sampling.hashSample(ids, "id", 0.2).select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(ids.repartition(13), "id", 0.2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b) // identical under any partitioning
    assert(math.abs(a.size / 2000.0 - 0.2) < 0.05)
  }

  test("sampled set is monotone in the fraction (nested samples)") {
    val small = Sampling.hashSample(ids, "id", 0.1).select("id").collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(ids, "id", 0.3).select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
  }

  test("trainValTest covers every row exactly once with stable assignment") {
    val out = Sampling.trainValTest(ids, "id")
    assert(out.count() == 2000)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    // a row's split never changes when the dataset around it changes
    val subsetSplits = Sampling.trainValTest(ids.filter($"id" < 100), "id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val fullSplits = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    subsetSplits.foreach { case (id, s) => assert(fullSplits(id) == s) }
  }

  test("cappedPerGroup keeps exactly min(n, group size) rows, deterministically") {
    val df = (0 until 200).map(i => (i, s"g${i % 5}")).toDF("id", "grp")
      .union(Seq((9001, "tiny")).toDF("id", "grp"))
    val out = Sampling.cappedPerGroup(df, "grp", "id", n = 7)
    val sizes = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("g0" -> 7L, "g1" -> 7L, "g2" -> 7L, "g3" -> 7L, "g4" -> 7L,
      "tiny" -> 1L))
    // deterministic: same rows every run
    val a = out.collect().map(_.getInt(0)).toSet
    val b = Sampling.cappedPerGroup(df, "grp", "id", n = 7).collect().map(_.getInt(0)).toSet
    assert(a == b)
    // rank-limit pushdown reaches the plan (partial WindowGroupLimit
    // before the exchange keeps per-partition candidates at n)
    val plan = Sampling.cappedPerGroup(df, "grp", "id", n = 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(600))
  }

  test("stratifiedHashSample applies per-stratum fractions") {
    val out = Sampling.stratifiedHashSample(ids, "g", "id",
      Map("g0" -> 0.1, "g1" -> 1.0), defaultFraction = 0.0)
    val byG = out.groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byG.contains("g2")) // default 0.0 drops unlisted strata
    assert(byG("g1") > 600) // ~667 rows kept fully
    assert(byG("g0") < 150) // ~10% of 667
  }
}
