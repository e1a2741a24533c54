package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-trained n-gram language-model scoring: train add-one-smoothed
  * bigram statistics over a (reference) corpus, then score every
  * document by its mean bigram log-probability — the classic
  * perplexity-proxy quality filter (CCNet-style: docs whose language
  * model score is far below the corpus norm are boilerplate, spam, or
  * wrong-language). No model dependencies: the "model" is two count
  * tables the engine itself aggregates.
  *
  * Beyond the reference surface (SURVEY.md §2.4); complements the
  * stateless signals in [[graft.functions.TextFunctions]] with a
  * corpus-relative one.
  *
  * Scale design: training is two hash aggregations keyed by xxhash64 of
  * the bigram / unigram (8-byte keys, never strings, map-side partial
  * agg). Scoring re-joins each doc's bigrams to the count tables by the
  * same hashed key — at web scale the count tables are themselves big
  * (billions of bigrams), so this is a plain shuffled hash join that
  * AQE can flip to broadcast when a domain-specific model is small. The
  * per-doc reduction ships one row per doc. Train and score may be
  * different datasets (`scoreAgainst`), which is the production shape:
  * score a candidate crawl against a trusted-corpus model.
  *
  * Determinism (oracle contract): `ln` is not correctly-rounded, so
  * each bigram's log-probability is floored to 4 decimals right after
  * the `ln`, scaled to an exact 1e-4-grid LONG, and summed as longs —
  * order-free; the mean divides two exact integers at the very end.
  */
object LangModel {

  /** Score `docs` against a bigram model trained on `train` (add-one
    * smoothing over the TRAIN vocabulary).
    *
    * Returns `(<idCol>, n_bigrams, avg_logp)` for every doc with ≥ 1
    * bigram; `avg_logp` = mean over the doc's bigram tokens of
    * floor4(ln((c(w1 w2) + 1) / (c(w1) + V))), floored to 4 decimals.
    * Unseen bigrams/unigrams get the smoothed floor, not −∞.
    */
  def scoreAgainst(
      train: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val trainBigrams = bigrams(train, textCol).select(
      xxhash64(col("__w1"), col("__w2")).as("__bh"))
    val bigramCounts = trainBigrams.groupBy("__bh").agg(count(lit(1)).as("__cb"))
    val trainTokens = train.select(
      explode(TextFunctions.tokens(col(textCol))).as("__w"))
    val unigramCounts = trainTokens
      .select(xxhash64(col("__w")).as("__uh"))
      .groupBy("__uh").agg(count(lit(1)).as("__cu"))
    // |V| of the train corpus: one scalar row, broadcast into scoring
    val vocab = unigramCounts.agg(count(lit(1)).as("__v"))

    val docBigrams = bigrams(docs.select(col(idCol), col(textCol)), textCol)
      .select(
        col(idCol),
        xxhash64(col("__w1"), col("__w2")).as("__bh"),
        xxhash64(col("__w1")).as("__uh"))

    docBigrams
      .join(bigramCounts, Seq("__bh"), "left")
      .join(unigramCounts, Seq("__uh"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("__lp",
        // floor4(ln(smoothed prob)) scaled to an exact 1e-4-grid long
        floor(log(
          (coalesce(col("__cb"), lit(0L)) + lit(1.0))
            / (coalesce(col("__cu"), lit(0L)) + col("__v"))) * lit(10000.0))
          .cast("long"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("__lp")).as("__lp_sum"))
      .select(
        col(idCol),
        col("n_bigrams"),
        (floor(col("__lp_sum") * lit(1.0) / col("n_bigrams")) / lit(10000.0))
          .as("avg_logp"))
  }

  /** Self-scoring: train on the corpus and score the same corpus —
    * the usual first pass for finding in-corpus outliers.
    */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreAgainst(docs, docs, idCol, textCol)

  /** Consecutive token pairs of `textCol`, NON-distinct (every
    * occurrence is a training/scoring event), other columns preserved.
    */
  private def bigrams(d: DataFrame, textCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    d.withColumn("__pair",
        explode(zip_with(
          slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
          slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))))
      .withColumn("__w1", col("__pair.w1"))
      .withColumn("__w2", col("__pair.w2"))
      .drop("__pair", textCol)
  }
}
