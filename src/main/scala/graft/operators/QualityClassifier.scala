package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Weak-supervision document classifier — multinomial Naive Bayes over
  * the token stream. The model-based curation filter that complements
  * the perplexity gate ([[LangModel]]): label a slice of the corpus
  * with anything cheap (heuristic quality score, a trusted-domain
  * flag, an eval-set membership), train token log-odds, score the
  * whole corpus. The classic "quality classifier" recipe of the
  * GPT-3/LLaMA data pipelines, with fastText's role filled by NB —
  * same linear form (a score is a sum of per-token weights plus a
  * prior), no gradient loop, one aggregation to train.
  *
  * Scale shape: training is ONE token-count `groupBy` keyed by
  * `xxhash64(token)` (8-byte keys; the label folds into two partial
  * sums, so the shuffle carries `(hash, cp, cn)`), plus a single-row
  * scalar aggregate and a two-row prior count — both bounded
  * collects. Scoring explodes the token stream to `(id, hash)` and
  * equi-joins the model table: AQE broadcasts it when the vocabulary
  * is small, shuffles otherwise; head-word skew is irrelevant because
  * every frequent token IS in the model (no null-key hot spot).
  *
  * Determinism (oracle contract): `ln` is not correctly rounded, so
  * every log is floored to the 1e-4 grid immediately and all sums run
  * over exact longs ([[LangModel]]'s contract). A token's weight is
  * `floor4(ln((cp+1)/(Np+V))) − floor4(ln((cn+1)/(Nn+V)))` (add-one
  * smoothing over the shared train vocabulary); a token unseen in
  * training gets the same expression at `cp = cn = 0` — the smoothing
  * floor, not a silent zero.
  */
object QualityClassifier {

  /** Trained NB model: `tokenDelta` is `(__th, __delta)` — xxhash64 of
    * the token and its exact 1e-4-grid log-odds long; the two scalars
    * carry the unseen-token smoothing floor and the class-prior
    * log-odds on the same grid.
    */
  final case class NbModel(
      tokenDelta: DataFrame, defaultDelta: Long, priorDelta: Long)

  private def grid(x: Double): Long = math.floor(math.log(x) * 10000).toLong

  /** Train on `docs` with `positive` as the (weak) boolean label.
    * Both classes must be non-empty — a one-class "classifier" is a
    * configuration error, not a model.
    */
  def train(docs: DataFrame, textCol: String, positive: Column): NbModel = {
    val lab = docs.select(positive.cast("boolean").as("__pos"),
      col(textCol).as("__t"))
    val tc = lab
      .select(col("__pos"),
        explode(TextFunctions.tokens(col("__t"))).as("__w"))
      .select(col("__pos"), xxhash64(col("__w")).as("__th"))
      .groupBy("__th")
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("__cp"),
        sum(when(!col("__pos"), 1L).otherwise(0L)).as("__cn"))
    // three scalars in one row, and the two class doc-counts: bounded
    // collects (the guard runs BEFORE anything else can misbehave)
    val c = tc.agg(sum("__cp").as("np"), sum("__cn").as("nn"),
      count(lit(1)).as("v")).collect()(0)
    val docCounts = lab.groupBy("__pos").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val (dp, dn) = (docCounts.getOrElse(true, 0L), docCounts.getOrElse(false, 0L))
    require(dp > 0 && dn > 0,
      s"QualityClassifier.train: both classes must be non-empty (pos=$dp, neg=$dn)")
    val (np, nn, v) = (c.getLong(0), c.getLong(1), c.getLong(2))
    val delta = tc.select(col("__th"),
      (floor(log((col("__cp") + lit(1.0)) / lit((np + v).toDouble)) * lit(10000.0))
          .cast("long")
        - floor(log((col("__cn") + lit(1.0)) / lit((nn + v).toDouble)) * lit(10000.0))
          .cast("long")).as("__delta"))
    NbModel(delta,
      defaultDelta = grid(1.0 / (np + v)) - grid(1.0 / (nn + v)),
      priorDelta = grid(dp.toDouble / (dp + dn)) - grid(dn.toDouble / (dp + dn)))
  }

  /** Score `docs` with a trained model: `(<idCol>, n_tokens, score,
    * pred)` for every doc with ≥ 1 token — `score` is the grid sum of
    * per-token log-odds plus the prior, rendered back to a double
    * (exact: the long sum is far inside 2^53), `pred` its sign.
    */
  def scoreWith(docs: DataFrame, idCol: String, textCol: String,
      m: NbModel): DataFrame = {
    docs
      .select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("__w"))
      .select(col(idCol), xxhash64(col("__w")).as("__th"))
      .join(m.tokenDelta, Seq("__th"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("__delta"), lit(m.defaultDelta))).as("__s"))
      .select(col(idCol), col("n_tokens"),
        ((col("__s") + lit(m.priorDelta)) / lit(10000.0)).as("score"),
        (col("__s") + lit(m.priorDelta) > 0).as("pred"))
  }

  /** Self-train-and-score: weak-label the corpus, train, score the
    * same corpus — the one-pass curation form.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      positive: Column): DataFrame =
    scoreWith(docs, idCol, textCol, train(docs, textCol, positive))
}
