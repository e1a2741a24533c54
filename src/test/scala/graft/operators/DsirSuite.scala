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
}
