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

  test("mixSources hits the target mixture without upsampling; binding source keeps all") {
    // 600/300/300 rows over three sources; weights 0.5/0.3/0.2.
    // T = min(600/0.5, 300/0.3, 300/0.2) = 1000 with s1 binding at
    // rate 1.0; expected kept ≈ 500/300/200 (exact up to hash noise)
    val df = ((0 until 600).map(i => (i.toLong, "s0")) ++
      (1000 until 1300).map(i => (i.toLong, "s1")) ++
      (2000 until 2300).map(i => (i.toLong, "s2"))).toDF("id", "src")
    val out = Sampling.mixSources(df, "src", "id",
      Map("s0" -> 0.5, "s1" -> 0.3, "s2" -> 0.2))
    val byS = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS("s1") == 300, s"binding source must keep everything: $byS")
    // hash membership is bernoulli-ish per id: sd ~ sqrt(n*r*(1-r)) ≈ 11
    assert(math.abs(byS("s0") - 500) < 35 && math.abs(byS("s2") - 200) < 35, s"$byS")
    // unweighted sources are dropped entirely
    val withExtra = df.union(Seq((9999L, "s3")).toDF("id", "src"))
    assert(!Sampling.mixSources(withExtra, "src", "id", Map("s0" -> 1.0))
      .select("src").distinct().collect().map(_.getString(0)).contains("s3"))
    // deterministic: same rows under different partitioning
    val a = out.select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.mixSources(df.repartition(17), "src", "id",
      Map("s0" -> 0.5, "s1" -> 0.3, "s2" -> 0.2))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("mixSourcesTemperature upsamples small sources deterministically") {
    // 800 / 100 rows over two sources, alpha = 0.5, total = 900:
    // shares ∝ sqrt(n) → s0 ≈ 0.739, s1 ≈ 0.261 → f_s0 ≈ 0.83 (downsample),
    // f_s1 ≈ 2.35 (2 full copies + ~35% a third)
    val df = ((0 until 800).map(i => (i.toLong, "s0")) ++
      (1000 until 1100).map(i => (i.toLong, "s1"))).toDF("id", "src")
    val out = Sampling.mixSourcesTemperature(df, "src", "id",
      alpha = 0.5, totalRows = 900)
    val byS = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected ≈ 900·share: s0 ≈ 665, s1 ≈ 235 (hash noise ≈ sqrt-scale)
    assert(math.abs(byS("s0") - 665) < 40, s"$byS")
    assert(math.abs(byS("s1") - 235) < 25, s"$byS")
    // every s1 id appears at least twice (floor(f) = 2), never 4+ times
    val perId = out.filter($"src" === "s1").groupBy("id").count()
      .collect().map(_.getLong(1))
    assert(perId.forall(c => c == 2 || c == 3), s"copy counts: ${perId.toSet}")
    // copy indexes are dense 0..c-1
    val copies = out.filter($"id" === 1000L).select("mix_copy")
      .collect().map(_.getLong(0)).sorted
    assert(copies.sameElements(0L until copies.length))
    // deterministic under repartitioning
    val a = out.groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sampling.mixSourcesTemperature(df.repartition(17), "src", "id",
      alpha = 0.5, totalRows = 900)
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // alpha = 0 equalizes: both sources target 450
    val eq = Sampling.mixSourcesTemperature(df, "src", "id", alpha = 0.0, totalRows = 900)
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(eq("s0") - 450) < 40 && math.abs(eq("s1") - 450) < 15, s"$eq")
  }

  test("mixEpochs: floor copies + hash fraction, whitelist drop, determinism") {
    val df = ((0 until 400).map(i => (i.toLong, "a")) ++
      (1000 until 1400).map(i => (i.toLong, "b")) ++
      (2000 until 2400).map(i => (i.toLong, "stray"))).toDF("id", "src")
    val out = Sampling.mixEpochs(df, "src", "id",
      Map("a" -> 2.5, "b" -> 0.25))
    // unlisted source never passes through
    assert(out.filter($"src" === "stray").count() == 0)
    // a: every id 2 or 3 times, total ≈ 400·2.5
    val perA = out.filter($"src" === "a").groupBy("id").count()
      .collect().map(_.getLong(1))
    assert(perA.length == 400 && perA.forall(c => c == 2 || c == 3), perA.toSet)
    assert(math.abs(perA.sum - 1000) < 60, s"total ${perA.sum}")
    // b: ~25% of ids once, the rest absent
    val nB = out.filter($"src" === "b").count()
    assert(math.abs(nB - 100) < 35, s"b rows $nB")
    // copy indexes dense 0..c-1; zero-epoch source would drop (covered by b's absents)
    val copies = out.filter($"id" === 0L).select("epoch")
      .collect().map(_.getLong(0)).sorted
    assert(copies.sameElements(0L until copies.length))
    // deterministic under repartitioning
    val a1 = out.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a2 = Sampling.mixEpochs(df.repartition(13), "src", "id",
      Map("a" -> 2.5, "b" -> 0.25))
      .groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a1 == a2)
  }

  test("topFractionPerGroup == global rank replica (ties, rationals, determinism)") {
    // scores with heavy ties so the threshold lands INSIDE a tie set
    val rows = (0 until 300).map { i =>
      (i.toLong, s"g${i % 3}", (i % 7).toLong)
    }
    val df = rows.toDF("id", "grp", "sc")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    def refKeep(numer: Long, denom: Long): Set[Long] =
      rows.groupBy(_._2).flatMap { case (_, g) =>
        val keep = g.size * numer / denom
        g.sortBy { case (id, _, sc) => (-sc, md5hex(id.toString), id) }
          .take(keep.toInt).map(_._1)
      }.toSet
    for ((nu, de) <- Seq((3L, 10L), (1L, 4L), (1L, 1L), (0L, 5L), (2L, 3L))) {
      val got = Sampling.topFractionPerGroup(df, "grp", "id", $"sc", nu, de)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == refKeep(nu, de), s"fraction $nu/$de")
    }
    // deterministic under repartitioning
    val a = Sampling.topFractionPerGroup(df.repartition(11), "grp", "id", $"sc", 3, 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == refKeep(3, 10))
    // output schema is the input schema
    assert(Sampling.topFractionPerGroup(df, "grp", "id", $"sc", 1, 2).columns
      .sameElements(df.columns))
  }

  test("quantileLabelsPerGroup == global rank replica; partitions agree with topFraction") {
    val rows = (0 until 300).map { i => (i.toLong, s"g${i % 3}", (i % 7).toLong) }
    val df = rows.toDF("id", "grp", "sc")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    val cuts = Seq((1L, 3L), (2L, 3L))
    val labels = Seq("head", "middle", "tail")
    val want = rows.groupBy(_._2).flatMap { case (_, g) =>
      val sorted = g.sortBy { case (id, _, sc) => (-sc, md5hex(id.toString), id) }
      sorted.zipWithIndex.map { case ((id, _, _), i) =>
        val r = i + 1L
        val lbl = cuts.zip(labels.init)
          .collectFirst { case ((nu, de), l) if r * de <= g.size * nu => l }
          .getOrElse(labels.last)
        id -> lbl
      }
    }
    val got = Sampling.quantileLabelsPerGroup(df, "grp", "id", $"sc", cuts, labels)
      .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want)
    // the head bucket IS topFractionPerGroup at the same cut
    val top = Sampling.topFractionPerGroup(df, "grp", "id", $"sc", 1, 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got.filter(_._2 == "head").keySet == top)
    // every input row is labeled exactly once; schema = input + bucket
    assert(got.size == rows.size)
    assert(Sampling.quantileLabelsPerGroup(df, "grp", "id", $"sc", cuts, labels)
      .columns.sameElements(df.columns :+ "bucket"))
  }

  test("assignTokenShards == global cumsum replica; balanced, whole docs") {
    val rnd = new scala.util.Random(23)
    val docs = (0 until 500).map(i => (i.toLong, (1 + rnd.nextInt(50)).toLong))
    val df = docs.toDF("id", "toks").repartition(9)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    val shardTokens = 300L
    var acc = 0L
    val want = docs.sortBy { case (id, _) => (md5hex(id.toString), id) }
      .map { case (id, t) =>
        val shard = acc / shardTokens
        acc += t
        id -> ((shard, acc))
      }.toMap
    for (buckets <- Seq(0, 1, 7, 64)) {
      val got = Sampling.assignTokenShards(df, "id", $"toks", shardTokens, buckets)
        .select("id", "shard", "cum_tokens").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == want, s"buckets=$buckets")
    }
    // every shard except the last holds >= shardTokens (docs straddle,
    // never split): shard s starts before s*B and runs past (s+1)*B
    val byShard = want.values.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byShard.keySet == (0L until byShard.keySet.max + 1).toSet)
  }

  test("curriculumRank == global sort replica; dense, deterministic, both directions") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 400).map(i => (i.toLong, rnd.nextInt(9).toLong))
    val df = rows.toDF("id", "sc").repartition(7)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    for (asc <- Seq(true, false)) {
      val want = rows.sortBy { case (id, sc) =>
        (if (asc) sc else -sc, md5hex(id.toString), id)
      }.zipWithIndex.map { case ((id, _), r) => id -> r.toLong }.toMap
      val got = Sampling.curriculumRank(df, "id", $"sc", ascending = asc)
        .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"ascending=$asc")
      // dense 0..n-1
      assert(got.values.toSeq.sorted == (0L until 400L))
    }
  }

  test("scoreGrid quantizes continuous scores for the distinct-score walks") {
    // raw continuous doubles would make the walk's distinct table the
    // whole corpus; the knob applies the DOCUMENTED quantization —
    // floor(score·g) as a long — so the result must equal running the
    // operator on that pre-quantized column
    val rnd = new scala.util.Random(23)
    val rows = (0 until 300).map(i =>
      (i.toLong, s"src${i % 3}", rnd.nextGaussian()))
    val df = rows.toDF("id", "source", "sc").repartition(5)
    val pre = df.withColumn("q", floor($"sc" * 100).cast("long"))
    val viaKnob = Sampling.curriculumRank(df, "id", $"sc",
        scoreGrid = Some(100.0))
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaPre = Sampling.curriculumRank(pre.drop("sc"), "id", $"q")
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaKnob == viaPre)
    val topKnob = rowSet(Sampling.topFractionPerGroup(
      df, "source", "id", $"sc", 3, 10, scoreGrid = Some(100.0)).select("id"))
    val topPre = rowSet(Sampling.topFractionPerGroup(
      pre.drop("sc"), "source", "id", $"q", 3, 10).select("id"))
    assert(topKnob == topPre && topKnob.nonEmpty)
    val labKnob = rowSet(Sampling.quantileLabelsPerGroup(
      df, "source", "id", $"sc", Seq((1L, 3L), (2L, 3L)),
      Seq("head", "middle", "tail"), scoreGrid = Some(100.0))
      .select("id", "bucket"))
    val labPre = rowSet(Sampling.quantileLabelsPerGroup(
      pre.drop("sc"), "source", "id", $"q", Seq((1L, 3L), (2L, 3L)),
      Seq("head", "middle", "tail")).select("id", "bucket"))
    assert(labKnob == labPre)
    // a bad grid fails loudly
    val e = intercept[IllegalArgumentException] {
      Sampling.curriculumRank(df, "id", $"sc", scoreGrid = Some(0.0))
    }
    assert(e.getMessage.contains("scoreGrid"))
  }

  test("distinct-score walks reject inputs that collide with internal columns") {
    // withColumn would silently OVERWRITE a pre-existing __sc and the
    // final select would restore the corrupted value
    val bad = Seq((1L, "a", 2L, 9L)).toDF("id", "source", "sc", "__sc")
    val e1 = intercept[IllegalArgumentException] {
      Sampling.curriculumRank(bad, "id", $"sc")
    }
    assert(e1.getMessage.contains("__sc"))
    val e2 = intercept[IllegalArgumentException] {
      Sampling.topFractionPerGroup(bad, "source", "id", $"sc", 1, 2)
    }
    assert(e2.getMessage.contains("__sc"))
    val e3 = intercept[IllegalArgumentException] {
      Sampling.quantileLabelsPerGroup(bad, "source", "id", $"sc",
        Seq((1L, 2L)), Seq("a", "b"))
    }
    assert(e3.getMessage.contains("__sc"))
    // output-column collisions are rejected too, not silently duplicated
    val dupOut = Seq((1L, "a", 2L, 3L)).toDF("id", "source", "sc", "rank")
    val e4 = intercept[IllegalArgumentException] {
      Sampling.curriculumRank(dupOut, "id", $"sc")
    }
    assert(e4.getMessage.contains("rank"))
  }

  test("keepByProbability: per-row membership, endpoints, clamp, determinism") {
    val df = (0 until 2000).map(i => (i.toLong, i % 4)).toDF("id", "cls")
    // p = 0 keeps none, p = 1 keeps all, p out of range clamps
    assert(Sampling.keepByProbability(df, "id", lit(0.0)).count() == 0)
    assert(Sampling.keepByProbability(df, "id", lit(1.0)).count() == 2000)
    assert(Sampling.keepByProbability(df, "id", lit(-3.0)).count() == 0)
    assert(Sampling.keepByProbability(df, "id", lit(7.0)).count() == 2000)
    // per-row probability: class k kept at ~k/4 (hash noise ~ sqrt n)
    val kept = Sampling.keepByProbability(df, "id", col("cls") / lit(4.0))
      .groupBy("cls").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(!kept.contains(0))
    assert(math.abs(kept(1) - 125) < 40 && math.abs(kept(2) - 250) < 50 &&
      math.abs(kept(3) - 375) < 55, kept.toString)
    // deterministic under repartitioning
    val a = Sampling.keepByProbability(df.repartition(13), "id", col("cls") / lit(4.0))
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.keepByProbability(df, "id", col("cls") / lit(4.0))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("mixSources fails loudly when a weighted source is absent") {
    val df = (0 until 10).map(i => (i.toLong, "s0")).toDF("id", "src")
    val ex = intercept[IllegalArgumentException] {
      Sampling.mixSources(df, "src", "id", Map("s0" -> 0.5, "ghost" -> 0.5))
    }
    assert(ex.getMessage.contains("ghost"))
  }

  test("globalShuffleRank is the dense (md5, id) rank, without a global sort") {
    val df = (0 until 3000).map(i => Tuple1(i.toLong)).toDF("id")
    val out = Sampling.globalShuffleRank(df, "id", buckets = 64)
    val got = out.select("id", "shuffle_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // dense 0..n-1, and ordered exactly like the scalar (md5, id) sort
    assert(got.map(_._2).sorted.toSeq == (0L until 3000L).toSeq)
    def hex(l: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(l.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val expected = got.map(_._1).sortBy(id => (hex(id), id)).zipWithIndex
      .map { case (id, r) => (id, r.toLong) }.toMap
    got.foreach { case (id, r) => assert(r == expected(id), s"id=$id") }
    // the ranking window partitions by bucket — no single-partition sort
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"global rank degenerated to one partition:\n$plan")
  }

  test("globalShuffleRank derives its bucket count from data size by default") {
    // default (buckets <= 0): derived from the plan's row estimate with
    // a 10M-rows-per-bucket target, floored at the cluster parallelism —
    // on this tiny frame that floor binds, and the rank is still dense
    val df = (0 until 500).map(i => Tuple1(i.toLong)).toDF("id")
    val out = Sampling.globalShuffleRank(df, "id")
    assert(out.select("shuffle_rank").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 500L).toSeq)
    // a huge synthetic estimate still clamps to the 1 << 20 cap: the
    // derivation itself is pure arithmetic, pin it directly
    val target = Sampling.ShuffleRankTargetRowsPerBucket
    def derived(estRows: Long): Long =
      math.min(1L << 20, math.max(spark.sparkContext.defaultParallelism.toLong,
        (estRows + target - 1) / target))
    assert(derived(1L) == spark.sparkContext.defaultParallelism)
    assert(derived(1000L * 1000 * 1000 * 1000) == (1000L * 1000 * 1000 * 1000 + target - 1) / target)
    assert(derived(Long.MaxValue / 2) == 1L << 20)
  }

  test("sampleToTokenBudget: strict md5-order prefix, any bucket count") {
    val docs = (0 until 500).map(i => (i.toLong, (i % 37) + 1L)).toDF("id", "toks")
    // driver-side reference: sort by (md5(id), id), running sum, prefix
    def h(i: Long) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ordered = (0 until 500).map(i => (i.toLong, (i % 37) + 1L))
      .sortBy { case (i, _) => (h(i), i) }
    val budget = 3000L
    var acc = 0L
    val expect = ordered.flatMap { case (i, t) =>
      acc += t; if (acc <= budget) Some(i -> acc) else None
    }.toMap
    for (b <- Seq(1, 3, 8, 64)) {
      val got = Sampling.sampleToTokenBudget(docs, "id", col("toks"), budget, buckets = b)
        .select("id", "cum_tokens").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"bucket count $b changed the keep set")
    }
  }

  test("sampleToTokenBudget: zero-token rows are free; strict prefix does not refill") {
    val docs = Seq((1L, 10L), (2L, 0L), (3L, 25L), (4L, 5L)).toDF("id", "toks")
    // md5 order of 1..4: compute via the operator at a huge budget
    val order = Sampling.sampleToTokenBudget(docs, "id", col("toks"), 1000L, buckets = 2)
      .select("id", "cum_tokens").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(order.map(_._1).toSet == Set(1L, 2L, 3L, 4L))
    // pick a budget that lands mid-prefix: everything with cum<=that stays,
    // later smaller docs must NOT sneak in
    val sortedByCum = order.sortBy(_._2)
    val cut = sortedByCum(1)._2 // after two docs
    val kept = Sampling.sampleToTokenBudget(docs, "id", col("toks"), cut, buckets = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == sortedByCum.takeWhile(_._2 <= cut).map(_._1).toSet)
  }

  test("sampleToTokenBudgetByGroup: independent per-group prefixes; absent groups drop") {
    val docs = (0 until 300).map(i => (i.toLong, s"g${i % 3}", (i % 11) + 1L))
      .toDF("id", "g", "toks")
    val budgets = Map("g0" -> 120L, "g1" -> 55L) // g2 absent -> dropped
    def h(i: Long) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = (0 until 300).map(i => (i.toLong, s"g${i % 3}", (i % 11) + 1L))
      .groupBy(_._2).filter(x => budgets.contains(x._1))
      .flatMap { case (g, rows) =>
        var acc = 0L
        rows.sortBy { case (i, _, _) => (h(i), i) }.flatMap { case (i, _, t) =>
          acc += t
          if (acc <= budgets(g)) Some((i, g) -> acc) else None
        }
      }.toMap
    for (b <- Seq(1, 4, 16)) {
      val got = Sampling.sampleToTokenBudgetByGroup(
          docs, "g", "id", col("toks"), budgets, buckets = b)
        .select("id", "g", "cum_tokens").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == expect, s"bucket count $b changed the per-group keep sets")
    }
  }

  test("sampleToTokenBudget: zero budget keeps only leading zero-token rows") {
    val docs = Seq((1L, 3L), (2L, 0L)).toDF("id", "toks")
    val kept = Sampling.sampleToTokenBudget(docs, "id", col("toks"), 0L, buckets = 2)
      .select("id", "cum_tokens").collect().map(r => (r.getLong(0), r.getLong(1)))
    // only rows whose running total stays at 0 survive
    assert(kept.forall(_._2 == 0L))
  }

  // ---- weighted sampling without replacement ------------------------------

  /** Scalar reimplementation of the documented A-ES key: the double-log
    * form ln(-ln u) - ln w on the md5 uniform, floored onto the
    * RELATIVE 1e-12 grid (ascending = best).
    */
  private def esKey(id: Long, w: Double): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val u = (java.lang.Long.parseLong(hex.take(8), 16) + 0.5) / 4294967296.0
    math.floor((math.log(-math.log(u)) - math.log(w)) * 1e12).toLong
  }

  test("weightedSamplePerGroup matches the scalar A-ES rule per group") {
    val rows = (0 until 300).map(i => (i.toLong, s"g${i % 3}", (i % 7 + 1).toLong))
    val df = rows.toDF("id", "g", "w")
    val expect = rows.groupBy(_._2).flatMap { case (_, grp) =>
      grp.sortBy { case (id, _, w) => (esKey(id, w.toDouble), id) }.take(10)
    }.map(_._1).toSet
    val got = Sampling.weightedSamplePerGroup(df, "id", col("w"), n = 10,
        groupCols = Seq("g"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == expect)
    // stable under repartitioning, like every sampler in this file
    val got2 = Sampling.weightedSamplePerGroup(df.repartition(17), "id",
        col("w"), n = 10, groupCols = Seq("g"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got2 == expect)
  }

  test("weightedSamplePerGroup: non-positive/null/NaN weights never win") {
    val df = Seq(
      (1L, java.lang.Double.valueOf(0.0)),
      (2L, java.lang.Double.valueOf(-1.0)),
      (3L, java.lang.Double.valueOf(Double.NaN)),
      (4L, null.asInstanceOf[java.lang.Double]),
      (5L, java.lang.Double.valueOf(2.0))
    ).toDF("id", "w")
    val kept = Sampling.weightedSamplePerGroup(df, "id", col("w"), n = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(5L))
  }

  test("weightedSamplePerGroup: selection is weight-scale invariant (relative grid)") {
    // the advisor's round-12 failure shape: at weight ~1e8 an ABSOLUTE
    // 1e-8 grid collapsed the key to ~23 cells and ties fell to low
    // ids; the relative (double-log) grid keeps the ranking identical
    // whether weights are O(1) or O(1e9)
    val base = (0 until 300).map(i => (i.toLong, (i % 13 + 1).toDouble))
    val small = Sampling.weightedSamplePerGroup(
        base.toDF("id", "w"), "id", col("w"), n = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val huge = Sampling.weightedSamplePerGroup(
        base.map { case (i, w) => (i, w * 1e9) }.toDF("id", "w"),
        "id", col("w"), n = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(huge == small)
    assert(small != (0L until 10L).toSet,
      "selection degenerated to the lowest ids — grid collapse")
  }

  test("weightedSamplePerGroup: infinite weights are excluded") {
    val df = Seq(
      (1L, java.lang.Double.valueOf(Double.PositiveInfinity)),
      (2L, java.lang.Double.valueOf(3.0))
    ).toDF("id", "w")
    val kept = Sampling.weightedSamplePerGroup(df, "id", col("w"), n = 1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
  }

  test("weightedSamplePerGroup ungrouped form prunes before the unpartitioned window") {
    // groupCols = Nil ranks over an unpartitioned window; the plan is
    // safe ONLY because a rank-limit pushdown prunes each partition to
    // its local top-n BEFORE anything single-partition — either
    // LimitPushDownThroughWindow (TakeOrderedAndProject under the
    // window: per-partition heaps) or WindowGroupLimit. Pin that so a
    // Spark upgrade can't silently regress to a full global sort.
    val df = (0 until 100).map(i => (i.toLong, (i % 5 + 1).toDouble))
      .toDF("id", "w")
    val plan = Sampling.weightedSamplePerGroup(df, "id", col("w"), n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject") || plan.contains("WindowGroupLimit"),
      s"no rank-limit pruning before the unpartitioned window:\n$plan")
  }

  test("weightedSamplePerGroup guards its temp columns and n") {
    intercept[IllegalArgumentException] {
      Sampling.weightedSamplePerGroup(
        Seq((1L, 1.0)).toDF("id", "__wk"), "id", col("__wk"), n = 1)
    }
    intercept[IllegalArgumentException] {
      Sampling.weightedSamplePerGroup(
        Seq((1L, 1.0)).toDF("id", "w"), "id", col("w"), n = 0)
    }
  }

  // ---- group-score propagation --------------------------------------------

  test("filterByGroupScore keeps whole groups by grid-mean threshold") {
    val df = Seq(
      (1L, "a", 0.90), (2L, "a", 0.70), // mean 0.8
      (3L, "b", 0.60), (4L, "b", 0.40), // mean 0.5
      (5L, "c", 0.75), (6L, "c", 0.85)  // mean 0.8
    ).toDF("id", "g", "q")
    val out = Sampling.filterByGroupScore(df, "g", col("q"), minMean = 0.8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
    // >= is inclusive: both 0.8-mean groups survive, b drops entirely
    assert(out.map(_._1).toSet == Set(1L, 2L, 5L, 6L))
    assert(out.forall { case (_, g, m) => (g == "a" || g == "c") && m == 0.8 })
  }

  test("filterByGroupScore floors scores onto the grid before the mean") {
    // 0.74999 floors to 7499 on the 1e-4 grid: the group mean is
    // 0.74995, NOT the raw-mean 0.749995 — the documented contract
    val df = Seq((1L, "a", 0.74999), (2L, "a", 0.75))
      .toDF("id", "g", "q")
    val m = Sampling.filterByGroupScore(df, "g", col("q"), minMean = 0.0)
      .select("group_score").head().getDouble(0)
    assert(m == (7499L + 7500L) / (2 * 10000.0))
    assert(Sampling.filterByGroupScore(df, "g", col("q"), minMean = 0.74996)
      .count() == 0)
  }

  test("filterByGroupScore guards temp/output column collisions") {
    intercept[IllegalArgumentException] {
      Sampling.filterByGroupScore(
        Seq((1L, "a", 1.0)).toDF("id", "g", "group_score"), "g",
        col("group_score"), minMean = 0.0)
    }
  }

  test("normalizeScoresPerGroup: per-group percentiles, ties share, grid contract") {
    val df = Seq(
      (1L, "a", 10), (2L, "a", 20), (3L, "a", 20), (4L, "a", 40), (5L, "a", 50),
      (6L, "b", 7), (7L, "b", 9),
      (8L, "solo", 3)).toDF("id", "g", "len")
    val out = Sampling.normalizeScoresPerGroup(df, "g", col("len"))
      .select("id", "score_pct").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // group a (n=5): pct = (rank-1)/4; ties at 20 share rank 2
    assert(out(1L) == 0.0)
    assert(out(2L) == 0.25 && out(3L) == 0.25)
    assert(out(4L) == 0.75)
    assert(out(5L) == 1.0)
    // group b: 0 and 1; singleton group: 0
    assert(out(6L) == 0.0 && out(7L) == 1.0)
    assert(out(8L) == 0.0)
    // raw float scores quantize through the grid: equal-on-grid ties
    val fdf = Seq((1L, "a", 0.12341), (2L, "a", 0.12349), (3L, "a", 0.9))
      .toDF("id", "g", "s")
    val fout = Sampling.normalizeScoresPerGroup(
        fdf, "g", col("s"), scoreGrid = Some(1e4))
      .select("id", "score_pct").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fout(1L) == 0.0 && fout(2L) == 0.0 && fout(3L) == 1.0)
    intercept[IllegalArgumentException] {
      Sampling.normalizeScoresPerGroup(
        df.withColumn("score_pct", lit(1)), "g", col("len"))
    }
  }

  test("writeTokenShards roundtrip: budget + assignment preserved") {
    val docs = (0L until 40L).map(i => (i, 50L + (i % 7) * 10)).toDF("id", "toks")
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    graft.sources.Sources.writeTokenShards(docs, out, "id", col("toks"),
      shardTokens = 400L)
    val back = spark.read.parquet(out)
    assert(back.count() == 40)
    // every doc present exactly once; per-shard token sum stays under
    // budget + one max doc (a doc never splits)
    assert(back.select("id").distinct().count() == 40)
    val sums = back.groupBy("shard").agg(sum("toks").as("s"))
      .collect().map(_.getLong(1))
    assert(sums.forall(_ <= 400L + 110L))
    // layout equals the assignment operator's shard column (the
    // partition directory value reads back as its inferred int type)
    val assigned = Sampling.assignTokenShards(docs, "id", col("toks"), 400L)
      .select("id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val layout = back.select(col("id"), col("shard").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(layout == assigned)
  }
}
