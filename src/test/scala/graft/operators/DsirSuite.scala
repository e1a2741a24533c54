package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR importance resampling (Dsir.scala): gram construction, the
  * groupBy scorer vs the in-row serving form (must be EXACTLY equal —
  * same per-bucket grid longs), profile additivity (the incremental-
  * maintenance contract), and the deterministic Gumbel-top-k sample.
  */
class DsirSuite extends SparkSpec {
  import spark.implicits._

  private val B = 512

  private lazy val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog ran in the park"),
    (3L, "el gato duerme en la casa"),
    (4L, "zzz qqq zzz qqq zzz"),
    (5L, "single"),
    (6L, "   "),
    (7L, "the the the the"),
    (8L, null.asInstanceOf[String])).toDF("doc_id", "text")

  private lazy val target = corpus.filter($"doc_id" <= 2)

  test("importanceScore: 2t-1 grams per doc, blank/null docs get no row") {
    val sc = Dsir.importanceScoreAgainst(corpus, "doc_id", "text",
      target, "text", B).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // token counts: 6,6,6,5,1,-,4,- → grams 11,11,11,9,1,-,7,-
    assert(sc == Map(1L -> 11L, 2L -> 11L, 3L -> 11L, 4L -> 9L,
      5L -> 1L, 7L -> 7L))
  }

  test("codegen gram buckets == the md5-Column composition on edge cases") {
    // the kernel (DsirGramBucketsExpr) must reproduce
    // bucketOf(gramsArray(text)) element-for-element: token boundaries
    // on every \s byte, unigrams-then-bigrams order, multi-byte UTF-8,
    // the \u0001 bigram separator colliding with one inside a token,
    // and null/blank/single-token docs
    val edge = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "  leading and trailing   "),
      (3L, "tab\tand\nnl\u000bvt\u000cff\rcr mix"),
      (4L, "único ñandú 汉字 🙂 mix"),
      (5L, "single"),
      (6L, ""),
      (7L, "   "),
      (8L, null.asInstanceOf[String]),
      (9L, "a\u0001b weird\u0001sep inside tokens")).toDF("doc_id", "text")
    val kernel = edge.select($"doc_id",
      Dsir.gramBucketsCol($"text", B).as("bk"))
    val hof = edge.select($"doc_id",
      transform(Dsir.gramsArray($"text"), g => Dsir.bucketOf(g, B)).as("bk"))
    assertSameRows(kernel, hof)
  }

  test("scoreInRow nulls: null text -> (null, null); blank -> (0, 0)") {
    val ratio = Array.fill(B)(7L)
    val r = Seq(("a", null.asInstanceOf[String]), ("b", "   "))
      .toDF("k", "text")
      .select($"k", Dsir.scoreInRow($"text", ratio, B).as("s"))
      .select($"k", $"s.n_ngrams", $"s.logw").orderBy("k").collect()
    assert(r(0).isNullAt(1) && r(0).isNullAt(2),
      "null text must score (null, null), struct itself non-null")
    assert(r(1).getLong(1) == 0L && r(1).getLong(2) == 0L,
      "a gram-less doc scores (0, 0) — the empty fold's initial value")
  }

  test("scoreInRow equals the groupBy scorer exactly") {
    val tp = Dsir.ngramProfile(target, "text", B)
    val rp = Dsir.ngramProfile(corpus, "text", B)
    val ratio = Dsir.ratioArray(tp, rp, B)
    val inRow = corpus
      .select($"doc_id", Dsir.scoreInRow($"text", ratio, B).as("s"))
      .filter($"s.n_ngrams" > 0)
      .select($"doc_id", $"s.n_ngrams".as("n_ngrams"), $"s.logw".as("logw"))
    val grouped = Dsir.importanceScore(corpus, "doc_id", "text", tp, rp, B)
    assertSameRows(grouped, inRow)
  }

  test("target-like docs outscore off-target docs (per-gram mean)") {
    val sc = Dsir.importanceScoreAgainst(corpus, "doc_id", "text",
      target, "text", B)
      .select($"doc_id", ($"logw".cast("double") / $"n_ngrams").as("avg"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sc(1L) > sc(3L) && sc(2L) > sc(3L),
      s"target members must beat the off-language doc: $sc")
    assert(sc(3L) > sc(4L),
      s"unique off-language grams must beat self-repeating junk: $sc")
    assert(sc(4L) < 0,
      s"junk whose grams the target never saw must score negative: $sc")
  }

  test("profiles are additive: halves sum to the whole") {
    val a = corpus.filter($"doc_id" % 2 === 0)
    val b = corpus.filter($"doc_id" % 2 =!= 0)
    val whole = Dsir.ngramProfile(corpus, "text", B)
    val summed = Dsir.ngramProfile(a, "text", B)
      .unionByName(Dsir.ngramProfile(b, "text", B))
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
    assertSameRows(whole.orderBy("bucket"), summed.orderBy("bucket"))
  }

  test("resampleTopK: deterministic across runs, k rows, keys exact") {
    val sc = Dsir.importanceScoreAgainst(corpus, "doc_id", "text",
      target, "text", B)
    val r1 = Dsir.resampleTopK(sc, "doc_id", k = 3)
    val r2 = Dsir.resampleTopK(sc, "doc_id", k = 3)
    assert(r1.count() == 3)
    assertSameRows(r1, r2)
    assert(r1.columns.toSeq ==
      Seq("doc_id", "n_ngrams", "logw", "gumbel_key"))
    // keys really are logw + gumbel: recompute one row by hand
    val row = r1.orderBy($"doc_id").head()
    val id = row.getLong(0)
    val u = (java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(
        id.toString).substring(0, 8), 16).toDouble + 0.5) / 4294967296.0
    val g = math.floor(-math.log(-math.log(u)) * 10000.0).toLong
    assert(row.getLong(3) == row.getLong(2) + g)
  }

  test("persisted model: build + appends serve the one-shot profile exactly") {
    val idx = java.nio.file.Files.createTempDirectory("graft_dsir_idx_").toString
    Dsir.buildDsirIndex(target, "text",
      corpus.filter($"doc_id" % 3 === 0), "text", B, idx)
    Dsir.appendToDsirIndex(corpus.filter($"doc_id" % 3 === 1), "text", idx)
    Dsir.appendToDsirIndex(corpus.filter($"doc_id" % 3 === 2), "text", idx)
    assert(Dsir.dsirIndexBuckets(spark, idx) == B)
    val (tp, rp) = Dsir.dsirIndexProfiles(spark, idx)
    // additive chain == one-shot raw profile
    assertSameRows(
      rp.orderBy("bucket"),
      Dsir.ngramProfile(corpus, "text", B).orderBy("bucket"))
    // end to end: scores from the chained model == direct scores
    assertSameRows(
      Dsir.importanceScore(corpus, "doc_id", "text", tp, rp, B).orderBy("doc_id"),
      Dsir.importanceScoreAgainst(corpus, "doc_id", "text", target, "text", B)
        .orderBy("doc_id"))
    // and the dense serving ratio round-trips through the artifact
    val (ratio, b) = Dsir.loadDsirRatio(spark, idx)
    assert(b == B)
    assert(ratio.sameElements(Dsir.ratioArray(
      Dsir.ngramProfile(target, "text", B),
      Dsir.ngramProfile(corpus, "text", B), B)))
  }

  private lazy val gcorpus = Seq(
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the dog ran in the park"),
    (3L, "es", "el gato duerme en la casa"),
    (4L, "es", "el perro corre en el parque"),
    (5L, "en", "the cat ran to the park"),
    (6L, "es", "la casa es grande")).toDF("doc_id", "lang", "text")

  private lazy val gtarget = gcorpus.filter($"doc_id" % 2 === 1)

  test("deleteFromDsirIndex: retraction == one-shot profile over the remainder") {
    val idx = java.nio.file.Files.createTempDirectory("graft_dsir_del_").toString
    Dsir.buildDsirIndex(target, "text",
      corpus.filter($"doc_id" % 3 === 0), "text", B, idx)
    Dsir.appendToDsirIndex(corpus.filter($"doc_id" % 3 === 1), "text", idx)
    Dsir.appendToDsirIndex(corpus.filter($"doc_id" % 3 === 2), "text", idx)
    Dsir.deleteFromDsirIndex(corpus.filter($"doc_id" % 3 === 2), "text", idx)
    val remaining = corpus.filter($"doc_id" % 3 =!= 2)
    val remainder = Dsir.ngramProfile(remaining, "text", B)
    val (tp, rp) = Dsir.dsirIndexProfiles(spark, idx)
    // the negative-count segment subtracts the batch EXACTLY (zero-sum
    // buckets dropped, so the chain sum IS the remainder's profile)
    assertSameRows(rp.orderBy("bucket"), remainder.orderBy("bucket"))
    assertSameRows(
      Dsir.importanceScore(corpus, "doc_id", "text", tp, rp, B).orderBy("doc_id"),
      Dsir.importanceScore(corpus, "doc_id", "text",
        Dsir.ngramProfile(target, "text", B), remainder, B).orderBy("doc_id"))
    // the dense serving form loads (all summed counts non-negative)
    val (ratio, b) = Dsir.loadDsirRatio(spark, idx)
    assert(b == B)
    assert(ratio.sameElements(Dsir.ratioArray(
      Dsir.ngramProfile(target, "text", B), remainder, B)))
    // chain-collapse across the retraction boundary: serving identical
    Dsir.compactDsirIndex(spark, idx)
    assert(graft.sources.IndexIO.segments(spark, idx).length == 1)
    val (_, rp2) = Dsir.dsirIndexProfiles(spark, idx)
    assertSameRows(rp2.orderBy("bucket"), remainder.orderBy("bucket"))
    assert(Dsir.loadDsirRatio(spark, idx)._1.sameElements(ratio))
    // compacting an already-single-segment chain is a no-op
    val v = graft.sources.IndexIO.resolve(spark, idx)
    Dsir.compactDsirIndex(spark, idx)
    assert(graft.sources.IndexIO.resolve(spark, idx) == v)
  }

  test("retracting never-appended data fails loudly at load and compact") {
    val idx = java.nio.file.Files.createTempDirectory("graft_dsir_neg_").toString
    Dsir.buildDsirIndex(target, "text", target, "text", B, idx)
    // doc 4's grams were never in the raw chain: counts go negative
    Dsir.deleteFromDsirIndex(corpus.filter($"doc_id" === 4L), "text", idx)
    def failsLoudly(action: => Unit): Unit = {
      val e = intercept[Exception] { action }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(msgs.contains("negative summed count"), s"unexpected: $msgs")
    }
    failsLoudly { Dsir.loadDsirRatio(spark, idx) }
    failsLoudly { Dsir.compactDsirIndex(spark, idx) }
    // the BATCH serving path fails at evaluation too (the row-level
    // guard rides dsirIndexProfiles): scoring against the over-retracted
    // profile must never silently feed ln(non-positive) into logw
    failsLoudly {
      val (tp, rp) = Dsir.dsirIndexProfiles(spark, idx)
      Dsir.importanceScore(corpus, "doc_id", "text", tp, rp, B).collect()
    }
    // compact failed BEFORE the pointer flip: the index still resolves
    // and still refuses to serve (no partial version was adopted)
    failsLoudly { Dsir.dsirIndexProfiles(spark, idx)._2.collect() }
  }

  test("importanceScoreByGroup == the ungrouped scorer run per group") {
    val tp = Dsir.ngramProfileByGroup(gtarget, "text", "lang", B)
    val rp = Dsir.ngramProfileByGroup(gcorpus, "text", "lang", B)
    val grouped = Dsir.importanceScoreByGroup(
      gcorpus, "doc_id", "text", "lang", tp, rp, B)
    for (g <- Seq("en", "es")) {
      val solo = Dsir.importanceScore(
        gcorpus.filter($"lang" === g), "doc_id", "text",
        Dsir.ngramProfile(gtarget.filter($"lang" === g), "text", B),
        Dsir.ngramProfile(gcorpus.filter($"lang" === g), "text", B), B)
      assertSameRows(
        solo.orderBy("doc_id"),
        grouped.filter($"lang" === g)
          .select("doc_id", "n_ngrams", "logw").orderBy("doc_id"))
    }
  }

  test("scoreInRowByGroup == importanceScoreByGroup; unknown group fails closed") {
    val tp = Dsir.ngramProfileByGroup(gtarget, "text", "lang", B)
    val rp = Dsir.ngramProfileByGroup(gcorpus, "text", "lang", B)
    val ratios = Dsir.ratioMaps(tp, rp, B)
    assert(ratios.keySet == Set("en", "es"))
    val inRow = gcorpus
      .select($"doc_id", $"lang",
        Dsir.scoreInRowByGroup($"text", $"lang", ratios, B).as("s"))
      .select($"doc_id", $"lang",
        $"s.n_ngrams".as("n_ngrams"), $"s.logw".as("logw"))
    assertSameRows(
      Dsir.importanceScoreByGroup(gcorpus, "doc_id", "text", "lang", tp, rp, B)
        .orderBy("doc_id"),
      inRow.orderBy("doc_id"))
    // a group the model doesn't know: null logw, n_ngrams still counted
    val unk = Seq(("fr", "bonjour le monde")).toDF("lang", "text")
      .select(Dsir.scoreInRowByGroup($"text", $"lang", ratios, B).as("s"))
      .select($"s.n_ngrams", $"s.logw").head
    assert(unk.getLong(0) == 5L && unk.isNullAt(1))
  }

  test("null groups: dropped from profiles, gate fails closed, scorer uniform") {
    val withNull = gcorpus.unionByName(
      Seq((9L, null.asInstanceOf[String], "mystery words here"))
        .toDF("doc_id", "lang", "text"))
    val tp = Dsir.ngramProfileByGroup(withNull.filter($"doc_id" % 2 === 1),
      "text", "lang", B)
    val rp = Dsir.ngramProfileByGroup(withNull, "text", "lang", B)
    // a null-group doc contributes to NO group's model
    assert(tp.filter($"grp".isNull).count() == 0)
    assert(rp.filter($"grp".isNull).count() == 0)
    // the in-row map loads (no null key) and the null-group row fails
    // closed: null logw
    val ratios = Dsir.ratioMaps(tp, rp, B)
    val nullRow = withNull.filter($"doc_id" === 9L)
      .select(Dsir.scoreInRowByGroup($"text", $"lang", ratios, B).as("s"))
      .select($"s.logw").head
    assert(nullRow.isNullAt(0))
    // the batch scorer still scores it — under the uniform model
    val sc = Dsir.importanceScoreByGroup(
      withNull, "doc_id", "text", "lang", tp, rp, B)
    assert(sc.filter($"doc_id" === 9L).count() == 1)
    // hand-built profiles with a null group are rejected loudly
    intercept[IllegalArgumentException] {
      Dsir.ratioMaps(
        tp.unionByName(Seq((null.asInstanceOf[String], 0L, 1L))
          .toDF("grp", "bucket", "cnt")), rp, B)
    }
  }

  test("per-group persisted model: build + append round-trips the profiles") {
    val idx = java.nio.file.Files.createTempDirectory("graft_dsir_grp_").toString
    Dsir.buildDsirIndexByGroup(gtarget, "text", "lang",
      gcorpus.filter($"doc_id" <= 3), "text", "lang", B, idx)
    Dsir.appendToDsirIndexByGroup(
      gcorpus.filter($"doc_id" > 3), "text", "lang", idx)
    val (tp, rp) = Dsir.dsirIndexProfilesByGroup(spark, idx)
    assertSameRows(
      tp.orderBy("grp", "bucket"),
      Dsir.ngramProfileByGroup(gtarget, "text", "lang", B)
        .orderBy("grp", "bucket"))
    assertSameRows(
      rp.orderBy("grp", "bucket"),
      Dsir.ngramProfileByGroup(gcorpus, "text", "lang", B)
        .orderBy("grp", "bucket"))
    val (ratios, b) = Dsir.loadDsirRatioByGroup(spark, idx)
    assert(b == B)
    val direct = Dsir.ratioMaps(
      Dsir.ngramProfileByGroup(gtarget, "text", "lang", B),
      Dsir.ngramProfileByGroup(gcorpus, "text", "lang", B), B)
    assert(ratios.keySet == direct.keySet &&
      ratios.forall { case (g, a) => direct(g).sameElements(a) })
    // loader/artifact layout mismatches fail LOUDLY: the ungrouped
    // loader on a grouped artifact would otherwise silently sum counts
    // across groups into a model no corpus ever had
    intercept[IllegalArgumentException] { Dsir.loadDsirRatio(spark, idx) }
    val uidx = java.nio.file.Files.createTempDirectory("graft_dsir_ug_").toString
    Dsir.buildDsirIndex(target, "text", corpus, "text", B, uidx)
    intercept[IllegalArgumentException] {
      Dsir.dsirIndexProfilesByGroup(spark, uidx)
    }
  }

  test("per-group retraction + schema-branching compact == per-group remainder") {
    val idx = java.nio.file.Files.createTempDirectory("graft_dsir_gdel_").toString
    Dsir.buildDsirIndexByGroup(gtarget, "text", "lang",
      gcorpus.filter($"doc_id" % 3 === 0), "text", "lang", B, idx)
    Dsir.appendToDsirIndexByGroup(
      gcorpus.filter($"doc_id" % 3 === 1), "text", "lang", idx)
    Dsir.appendToDsirIndexByGroup(
      gcorpus.filter($"doc_id" % 3 === 2), "text", "lang", idx)
    Dsir.deleteFromDsirIndexByGroup(
      gcorpus.filter($"doc_id" % 3 === 2), "text", "lang", idx)
    val remaining = gcorpus.filter($"doc_id" % 3 =!= 2)
    val remainder = Dsir.ngramProfileByGroup(remaining, "text", "lang", B)
    val (_, rp) = Dsir.dsirIndexProfilesByGroup(spark, idx)
    assertSameRows(rp.orderBy("grp", "bucket"),
      remainder.orderBy("grp", "bucket"))
    // compactDsirIndex branches on the stored schema: the grouped
    // chain collapses to one segment with identical profiles
    Dsir.compactDsirIndex(spark, idx)
    assert(graft.sources.IndexIO.segments(spark, idx).length == 1)
    val (tp2, rp2) = Dsir.dsirIndexProfilesByGroup(spark, idx)
    assertSameRows(rp2.orderBy("grp", "bucket"),
      remainder.orderBy("grp", "bucket"))
    assertSameRows(tp2.orderBy("grp", "bucket"),
      Dsir.ngramProfileByGroup(gtarget, "text", "lang", B)
        .orderBy("grp", "bucket"))
    // the in-row serving maps load across the compact (non-negative)
    val (ratios, b) = Dsir.loadDsirRatioByGroup(spark, idx)
    assert(b == B && ratios.keySet == Set("en", "es"))
    // over-retract: deleting the full remainder TWICE drives every
    // occupied bucket negative — the grouped BATCH serving path fails
    // at evaluation with the offending (grp, bucket) named, same guard
    // as the ungrouped form
    Dsir.deleteFromDsirIndexByGroup(remaining, "text", "lang", idx)
    Dsir.deleteFromDsirIndexByGroup(remaining, "text", "lang", idx)
    val e = intercept[Exception] {
      Dsir.dsirIndexProfilesByGroup(spark, idx)._2.collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(msgs.contains("negative summed count"), s"unexpected: $msgs")
  }

  test("resampleTopKPerGroup: k per group, deterministic, exact gumbel keys") {
    val tp = Dsir.ngramProfileByGroup(gtarget, "text", "lang", B)
    val rp = Dsir.ngramProfileByGroup(gcorpus, "text", "lang", B)
    val sc = Dsir.importanceScoreByGroup(
      gcorpus, "doc_id", "text", "lang", tp, rp, B)
    val r1 = Dsir.resampleTopKPerGroup(sc, "doc_id", "lang", k = 2)
    val r2 = Dsir.resampleTopKPerGroup(sc, "doc_id", "lang", k = 2)
    assertSameRows(r1, r2)
    val perLang = r1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang == Map("en" -> 2L, "es" -> 2L), s"got $perLang")
    assert(r1.columns.toSeq ==
      Seq("doc_id", "lang", "n_ngrams", "logw", "gumbel_key"))
    // the key is the doc's logw + its deterministic md5-fraction Gumbel
    val row = r1.orderBy("doc_id").head
    val id = row.getLong(0)
    val u = (java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(
        id.toString).substring(0, 8), 16).toDouble + 0.5) / 4294967296.0
    val g = math.floor(-math.log(-math.log(u)) * 10000.0).toLong
    assert(row.getLong(4) == row.getLong(3) + g)
    // per-group winners match a manual replay over the full scores
    val manual = sc.collect().map { r =>
      val did = r.getLong(0)
      val uu = (java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(
          did.toString).substring(0, 8), 16).toDouble + 0.5) / 4294967296.0
      val gg = math.floor(-math.log(-math.log(uu)) * 10000.0).toLong
      (r.getString(1), did, r.getLong(3) + gg)
    }.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(2).toSeq
    }.map(r => (r._1, r._2)).toSet
    assert(r1.select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet == manual)
  }

  test("ratioArray: bounds guard and smoothed floor for empty buckets") {
    intercept[IllegalArgumentException] {
      Dsir.ratioArray(Dsir.ngramProfile(target, "text", B),
        Dsir.ngramProfile(corpus, "text", B), 65537)
    }
    // a bucket no gram hashed to carries the default smoothed ratio
    val tp = Dsir.ngramProfile(target, "text", B)
    val rp = Dsir.ngramProfile(corpus, "text", B)
    val ratio = Dsir.ratioArray(tp, rp, B)
    assert(ratio.length == B)
    val nt = tp.agg(sum("cnt")).head.getLong(0)
    val nq = rp.agg(sum("cnt")).head.getLong(0)
    val base = math.floor(math.log(1.0 / (nt + B.toDouble)) * 10000.0).toLong -
      math.floor(math.log(1.0 / (nq + B.toDouble)) * 10000.0).toLong
    val used = tp.select("bucket").unionByName(rp.select("bucket"))
      .distinct().as[Long].collect().map(_.toInt).toSet
    (0 until B).filterNot(used).foreach(b => assert(ratio(b) == base))
  }

  test("applyDsirIndexCdc: one marked segment, exact net profile, replay-atomic") {
    val idx = java.nio.file.Files.createTempDirectory("graft_dsir_cdc1_").toString
    val oldRows = corpus.filter($"doc_id" <= 4)
    Dsir.buildDsirIndex(target, "text", oldRows, "text", B, idx)
    val segs0 = graft.sources.IndexIO.segments(spark, idx).length
    // one CDC batch: doc 5+7 added, doc 3+4 retracted — BOTH legs must
    // land in a SINGLE segment carrying the exactly-once marker (the
    // round-17 two-publish form could replay the unmarked retraction)
    val adds = corpus.filter($"doc_id".isin(5L, 7L))
    val dels = corpus.filter($"doc_id".isin(3L, 4L))
    Dsir.applyDsirIndexCdc(adds, dels, "text", idx, marker = Some("b1-atom"))
    assert(graft.sources.IndexIO.segments(spark, idx).length == segs0 + 1,
      "adds+retractions must publish exactly ONE segment")
    assert(graft.sources.IndexIO.segmentMarkers(spark, idx).contains("b1-atom"))
    val live = corpus.filter($"doc_id".isin(1L, 2L, 5L, 7L))
    val (_, rp) = Dsir.dsirIndexProfiles(spark, idx)
    assertSameRows(rp.orderBy("bucket"),
      Dsir.ngramProfile(live, "text", B).orderBy("bucket"))
    // a crash-replay of the same batch is recognized and skipped as a
    // WHOLE — the retraction cannot re-apply alone
    val applied = graft.streaming.Streaming.applyIndexBatch(
      spark, idx, "b1-atom") { fail("bootstrap must not run") } {
      Dsir.applyDsirIndexCdc(adds, dels, "text", idx, marker = Some("b1-atom"))
    }
    assert(!applied)
    val (_, rp2) = Dsir.dsirIndexProfiles(spark, idx)
    assertSameRows(rp2.orderBy("bucket"),
      Dsir.ngramProfile(live, "text", B).orderBy("bucket"))
  }
}
