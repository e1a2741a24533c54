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

  /** A pruned bigram model held driver-side: sorted hash-key arrays
    * plus parallel counts, and the UNPRUNED vocabulary size (the
    * smoothing denominator — pruning changes which counts survive,
    * never the vocabulary the model was trained over).
    */
  final case class LmModel(
      bigramKeys: Array[Long], bigramCounts: Array[Long],
      unigramKeys: Array[Long], unigramCounts: Array[Long],
      vocab: Long)

  /** Train and persist a COUNT-PRUNED bigram model (KenLM-style count
    * cutoffs: bigrams below `minBigramCount` and unigrams below
    * `minUnigramCount` are dropped; a pruned entry scores as unseen).
    * Count cutoffs — not top-K — because the cutoff is replayable by
    * any engine without tiebreak coupling, and it is how n-gram models
    * are actually shipped. The artifact is hashes + counts only
    * (8+8 bytes per surviving n-gram), published atomically via
    * [[graft.sources.IndexIO]]; at web scale the cutoff is what turns
    * a billions-of-bigrams table into a broadcastable model.
    */
  def buildLmIndex(
      train: DataFrame, textCol: String, path: String,
      minBigramCount: Long = 2, minUnigramCount: Long = 2): Unit = {
    require(minBigramCount >= 1 && minUnigramCount >= 1,
      "buildLmIndex: count cutoffs must be >= 1")
    val spark = train.sparkSession
    import spark.implicits._
    val trainBigrams = bigrams(train, textCol).select(
      xxhash64(col("__w1"), col("__w2")).as("h"))
    val bigramCounts = trainBigrams.groupBy("h").agg(count(lit(1)).as("c"))
    // materialize the unigram aggregate ONCE: both the pre-prune |V|
    // count and the pruned write need it, and each is an action — an
    // unmaterialized frame would re-run the full tokenize+agg corpus
    // scan (|V| must be pre-prune, so it cannot come from the artifact)
    val unigramCounts = train
      .select(explode(TextFunctions.tokens(col(textCol))).as("__w"))
      .select(xxhash64(col("__w")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val vocab = unigramCounts.count() // |V| BEFORE pruning
    graft.sources.IndexIO.publish(spark, path) { vdir =>
      bigramCounts.filter(col("c") >= minBigramCount)
        .write.mode("overwrite").parquet(s"$vdir/bigrams")
      unigramCounts.filter(col("c") >= minUnigramCount)
        .write.mode("overwrite").parquet(s"$vdir/unigrams")
      Seq((vocab, minBigramCount, minUnigramCount))
        .toDF("vocab", "min_bigram", "min_unigram")
        .coalesce(1).write.mode("overwrite").parquet(s"$vdir/meta")
    }
    ()
  }

  /** Load a [[buildLmIndex]] artifact into driver memory (sorted for
    * the kernel's binary search). Size = the pruned model, bounded by
    * the cutoffs — the require mirrors the gate's other
    * driver-collected artifacts.
    */
  def loadLmModel(
      spark: org.apache.spark.sql.SparkSession, path: String,
      maxEntries: Long = 32L << 20): LmModel = {
    val vdir = graft.sources.IndexIO.resolve(spark, path)
    // guard BEFORE collecting: a count is one cheap job; a require that
    // fires after the driver holds the oversized Row arrays is
    // documentation, not protection
    val entries = spark.read.parquet(s"$vdir/bigrams").count() +
      spark.read.parquet(s"$vdir/unigrams").count()
    require(entries <= maxEntries,
      s"LM model at $path has $entries entries > $maxEntries; " +
        "raise the count cutoffs")
    def sorted(name: String): (Array[Long], Array[Long]) = {
      val rows = spark.read.parquet(s"$vdir/$name").sort("h")
        .collect()
      (rows.map(_.getLong(0)), rows.map(_.getLong(1)))
    }
    val (bk, bc) = sorted("bigrams")
    val (uk, uc) = sorted("unigrams")
    val vocab = spark.read.parquet(s"$vdir/meta").head().getLong(0)
    LmModel(bk, bc, uk, uc, vocab)
  }

  /** Score docs against a loaded pruned model with the in-row kernel —
    * one scan projection, no joins, no aggregation (stream-safe; the
    * suite pins it bit-equal to [[scoreAgainst]] when the cutoffs are
    * 1). Docs with zero bigrams get no row, like the batch path.
    */
  def scoreWithModel(
      docs: DataFrame, idCol: String, textCol: String, model: LmModel): DataFrame = {
    import org.apache.spark.sql.GraftInternals.{toColumn, toExpression}
    val sc = toColumn(graft.functions.LmScoreExpr(
      toExpression(col(textCol)), model.bigramKeys, model.bigramCounts,
      model.unigramKeys, model.unigramCounts, model.vocab))
    docs
      .withColumn("__lm", sc)
      .filter(col("__lm.n_bigrams") > 0)
      .select(
        col(idCol),
        col("__lm.n_bigrams").as("n_bigrams"),
        (floor(col("__lm.lp_sum") * lit(1.0) / col("__lm.n_bigrams")) / lit(10000.0))
          .as("avg_logp"))
  }

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
