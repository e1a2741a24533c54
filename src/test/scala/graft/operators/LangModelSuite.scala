package graft.operators

import graft.SparkSpec

class LangModelSuite extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the cat sat"),
    (2L, "the cat ran"),
    (3L, "the dog sat"),
    (4L, "zz")               // single token: no bigrams → no output row
  ).toDF("doc_id", "text")

  /** Independent scalar reimplementation of the documented formula. */
  private def expected(
      train: Seq[(Long, String)], docs: Seq[(Long, String)]): Map[Long, (Long, Double)] = {
    def toks(t: String) = t.split("\\s+").filter(_.nonEmpty).toSeq
    val trainToks = train.flatMap { case (_, t) => toks(t) }
    val uni = trainToks.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val bi = train.flatMap { case (_, t) => toks(t).sliding(2).filter(_.size == 2).map(p => (p(0), p(1))) }
      .groupBy(identity).map { case (p, g) => p -> g.size.toLong }
    val v = uni.size.toLong
    docs.flatMap { case (id, t) =>
      val pairs = toks(t).sliding(2).filter(_.size == 2).map(p => (p(0), p(1))).toSeq
      if (pairs.isEmpty) None
      else {
        val lps = pairs.map { p =>
          val cb = bi.getOrElse(p, 0L)
          val cu = uni.getOrElse(p._1, 0L)
          math.floor(math.log((cb + 1.0) / (cu + v)) * 1e4).toLong
        }
        Some(id -> (pairs.size.toLong,
          math.floor(lps.sum * 1.0 / pairs.size) / 1e4))
      }
    }.toMap
  }

  test("self-scoring matches an independent scalar implementation exactly") {
    val docs = corpus.as[(Long, String)].collect().toSeq
    val got = LangModel.score(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expected(docs, docs))
  }

  test("common continuations score higher than rare ones") {
    val got = LangModel.score(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // "the cat sat": both bigrams seen twice+ vs "the dog sat" ("dog sat" unique)
    assert(got(1L) > got(3L))
  }

  test("scoreAgainst holds the model fixed: unseen text gets the smoothed floor") {
    val novel = Seq((9L, "qq ww ee")).toDF("doc_id", "text")
    val docs = corpus.as[(Long, String)].collect().toSeq
    val got = LangModel.scoreAgainst(corpus, novel, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expected(docs, Seq((9L, "qq ww ee"))))
    // every bigram unseen, every unigram unseen → logp = floor4(ln(1/V))
    val v = docs.flatMap(_._2.split("\\s+")).distinct.size
    val floorLp = math.floor(math.log(1.0 / v) * 1e4) / 1e4
    assert(got(9L)._2 == floorLp)
  }
}
