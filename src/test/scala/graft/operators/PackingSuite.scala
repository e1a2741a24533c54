package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSuite extends SparkSpec {
  import spark.implicits._

  /** Independent scalar greedy packer. */
  private def expected(
      docs: Seq[(Long, Long)], maxLen: Long, chunkOf: Long => Long): Set[(Long, Long, Long, Long)] =
    docs.groupBy { case (id, _) => chunkOf(id) }.flatMap { case (chunk, ds) =>
      var bin = 0L; var fill = 0L; var first = true
      ds.sortBy(_._1).map { case (id, toks) =>
        if (!first && fill + toks > maxLen) { bin += 1; fill = 0 }
        first = false
        fill += toks
        (id, chunk, bin, fill)
      }
    }.toSet

  test("greedy packing matches an independent scalar packer") {
    val docs = Seq[(Long, Long)](
      (1, 40), (2, 50), (3, 30), (4, 100), (5, 10), (6, 10),
      (11, 60), (12, 60), (13, 1))
    val df = docs.toDF("doc_id", "n_tokens")
    val got = Packing.packGreedy(df, "doc_id", "n_tokens", maxLen = 100, chunk = expr("doc_id div 10"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected(docs, 100, _ / 10))
  }

  test("null token counts fail with a named contract error, not an encoder NPE") {
    val df = Seq[(Long, java.lang.Long)]((1L, 40L), (2L, null), (3L, 30L))
      .toDF("doc_id", "n_tokens")
    val ex = intercept[Exception] {
      Packing.packGreedy(df, "doc_id", "n_tokens", maxLen = 100,
        chunk = expr("doc_id div 10")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("packGreedy: tokensCol 'n_tokens'")),
      s"got: ${messages(ex)}")
  }

  test("no bin exceeds maxLen unless a single doc does") {
    val rnd = new scala.util.Random(11)
    val docs = (1L to 300L).map(i => (i, 1L + rnd.nextInt(80)))
    val out = Packing.packGreedy(docs.toDF("doc_id", "n_tokens"), "doc_id", "n_tokens",
        maxLen = 128, chunk = expr("doc_id div 50"))
      .groupBy("chunk", "bin").agg(max("bin_fill").as("total"), count(lit(1)).as("n"))
      .collect()
    assert(out.forall(r => r.getAs[Long]("total") <= 128))
    // sanity: packs multiple docs per bin, not one-per-bin
    assert(out.exists(_.getAs[Long]("n") > 1))
  }

  test("an oversized doc occupies a bin alone") {
    val docs = Seq[(Long, Long)]((1, 10), (2, 500), (3, 10))
    val out = Packing.packGreedy(docs.toDF("doc_id", "n_tokens"), "doc_id", "n_tokens",
        maxLen = 100, chunk = lit(0))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, 0L, 10L), (2L, 1L, 500L), (3L, 2L, 10L)))
  }

  test("packBestFitDecreasing == scalar replica; fuller bins, lower bound holds") {
    val rnd = new scala.util.Random(7)
    for (round <- 0 until 6) {
      val docs = (0 until 40 + rnd.nextInt(100)).map(i =>
        (i.toLong, 1L + rnd.nextInt(90)))
      val maxLen = 100L
      val df = docs.toDF("id", "toks").repartition(1 + rnd.nextInt(6))
      val got = Packing
        .packBestFitDecreasing(df, "id", "toks", maxLen, expr("id div 16"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      // scalar replica: sort desc (id tiebreak), fullest-that-fits,
      // lowest bin id on equal fills
      val want = docs.groupBy(_._1 / 16).flatMap { case (c, g) =>
        val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        g.sortBy { case (id, t) => (-t, id) }.map { case (id, t) =>
          val cand = fills.zipWithIndex.filter { case (f, _) => f + t <= maxLen }
          val idx =
            if (cand.isEmpty) { fills += 0L; fills.length - 1 }
            else cand.maxBy { case (f, i) => (f, -i) }._2
          fills(idx) += t
          id -> ((c, idx.toLong, fills(idx)))
        }
      }.toMap
      assert(got == want, s"round $round")
      // per-chunk lower bound: bins >= ceil(total / maxLen)
      docs.groupBy(_._1 / 16).foreach { case (c, g) =>
        val bins = got.filter(_._2._1 == c).values.map(_._2).max + 1
        val lb = (g.map(_._2).sum + maxLen - 1) / maxLen
        assert(bins >= lb, s"round $round chunk $c")
      }
    }
    // an oversized doc still gets its own bin
    val o = Packing.packBestFitDecreasing(
        Seq((1L, 500L), (2L, 50L)).toDF("id", "toks"), "id", "toks", 100, lit(0))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(o == Set((1L, 0L, 500L), (2L, 1L, 50L)))
  }

  test("IncrementalPacker carry guard: loud on high-cardinality chunks, silent below") {
    // 100 TB audit: the carry is one entry per DISTINCT chunk — a
    // per-row chunk expression (doc id) would grow it without bound
    // across a long stream and OOM the driver silently
    val chunkE = org.apache.spark.sql.functions.col("doc_id") // 1 chunk/row
    val p = new Packing.IncrementalPacker("doc_id", "n_tokens", 64, chunkE,
      maxCarryChunks = 2)
    val err = intercept[IllegalArgumentException] {
      p.addBatch(Seq((1L, 10L), (2L, 10L), (3L, 10L))
        .toDF("doc_id", "n_tokens")).count()
    }
    assert(err.getMessage.contains("maxCarryChunks"))
    // restoreState applies the same cap, counted BEFORE the collect
    val ok = new Packing.IncrementalPacker("doc_id", "n_tokens", 64,
      org.apache.spark.sql.functions.expr("doc_id div 8"))
    ok.addBatch((0L until 24L).map(i => (i, 20L)).toDF("doc_id", "n_tokens")).count()
    val path = java.nio.file.Files.createTempDirectory("graft_pack_cap_").toString
    ok.saveState(spark, path)
    val tight = new Packing.IncrementalPacker("doc_id", "n_tokens", 64,
      org.apache.spark.sql.functions.expr("doc_id div 8"), maxCarryChunks = 1)
    val err2 = intercept[IllegalArgumentException] {
      tight.restoreState(spark, path)
    }
    assert(err2.getMessage.contains("maxCarryChunks"))
    // below the cap: silent
    val fresh = new Packing.IncrementalPacker("doc_id", "n_tokens", 64,
      org.apache.spark.sql.functions.expr("doc_id div 8"))
    fresh.restoreState(spark, path)
    assert(fresh.state.size == 3)
  }

  test("packer restart from a saved state snapshot continues seamlessly") {
    val docs = (0L until 24L).map(i => (i, 20L + (i % 3) * 15L))
    val chunkE = org.apache.spark.sql.functions.expr("doc_id div 8")
    def run(batches: Seq[Seq[(Long, Long)]], restartAfter: Int): Seq[(Long, Long, Long, Long)] = {
      val path = java.nio.file.Files.createTempDirectory("graft_pack_state_").toString
      var p = new Packing.IncrementalPacker("doc_id", "n_tokens", 64, chunkE)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      batches.zipWithIndex.foreach { case (b, i) =>
        if (i == restartAfter) {
          // simulate a crash: a FRESH packer restored from the snapshot
          p = new Packing.IncrementalPacker("doc_id", "n_tokens", 64, chunkE)
          p.restoreState(spark, path)
        }
        out ++= p.addBatch(b.toDF("doc_id", "n_tokens")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        p.saveState(spark, path)
      }
      out.toSeq
    }
    val batches = Seq(docs.slice(0, 7), docs.slice(7, 15), docs.slice(15, 24))
    val withRestart = run(batches, restartAfter = 2)
    val continuous = run(batches, restartAfter = -1)
    assert(withRestart.toSet == continuous.toSet)
    // and both equal the one-shot batch packing
    val oneShot = Packing.packGreedy(docs.toDF("doc_id", "n_tokens"),
        "doc_id", "n_tokens", maxLen = 64, chunk = chunkE)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(withRestart.toSet == oneShot)
  }

  test("bins are chunk-local: chunks pack independently") {
    val docs = Seq[(Long, Long)]((1, 90), (10, 90), (11, 90))
    val out = Packing.packGreedy(docs.toDF("doc_id", "n_tokens"), "doc_id", "n_tokens",
        maxLen = 100, chunk = expr("doc_id div 10"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // doc 1 in chunk 0 bin 0; docs 10, 11 in chunk 1 bins 0, 1
    assert(out == Map((1L, 0L) -> 0L, (10L, 1L) -> 0L, (11L, 1L) -> 1L))
  }
}
