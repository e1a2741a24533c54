package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>` / `array<double>`). Two strategies:
  *
  *  - [[bruteForceTopK]] — exact: broadcast the query set, scan the
  *    corpus once, codegen'd dot product, per-query top-k via window.
  *    The correctness baseline, and the right plan whenever
  *    |queries| × |corpus| FLOPs fit the cluster (corpus is scanned
  *    exactly once regardless of query count).
  *  - [[lshTopK]] — random-hyperplane LSH bucketing: corpus and queries
  *    hashed to sign signatures; candidates = corpus vectors sharing at
  *    least one signature band with the query; exact rescore + top-k on
  *    candidates only. Recall < 1 by design, cost ~ bucket sizes instead
  *    of |corpus| per query — the 100 TB path (an IVF variant would swap
  *    the hash for learned centroids; same join skeleton).
  */
object SimilaritySearch {

  /** Exact top-k neighbors per query by cosine. `queries`/`corpus` carry
    * `(idCol, vecCol)`. Output: `(query_id, neighbor_id, cosine)`,
    * `k` rows per query, self-matches excluded, deterministic tie-break
    * (higher cosine first, then smaller neighbor id).
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"),
      VectorFunctions.asDouble(col(vecCol)).as("__qv"),
      VectorFunctions.norm(col(vecCol)).as("__qn"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      VectorFunctions.asDouble(col(vecCol)).as("__cv"),
      VectorFunctions.norm(col(vecCol)).as("__cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(q)
      .join(c, col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        (VectorFunctions.dot(col("__qv"), col("__cv")) /
          (col("__qn") * col("__cn"))).as("cosine"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Approximate top-k via random-hyperplane LSH banding (deterministic
    * hyperplanes from SplitMix64, same family as
    * [[Dedup.embeddingNearDupLsh]]). Exact rescoring on candidates, so
    * returned cosines are true cosines; only recall is approximate.
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      bits: Int = 32, bands: Int = 8): DataFrame = {
    def vecs(df: DataFrame, id: String, vecAlias: String, normAlias: String) = df
      .select(
        col(idCol).as(id),
        VectorFunctions.asDouble(col(vecCol)).as(vecAlias),
        VectorFunctions.norm(col(vecCol)).as(normAlias))
    // keys-only banding (shared VectorFunctions kernel — one UDF pass,
    // no vector payload replicated through the explode)
    def banded(df: DataFrame, id: String, vecAlias: String) = df
      .select(col(id),
        posexplode(VectorFunctions.signBandKeys(bits, bands)(col(vecAlias)))
          .as(Seq("__band", "__bv")))
    val qv = vecs(queries, "query_id", "__qv", "__qn")
    val cv = vecs(corpus, "neighbor_id", "__cv", "__cn")
    val q = banded(qv, "query_id", "__qv")
    val c = banded(cv, "neighbor_id", "__cv")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    q.join(c,
        q("__band") === c("__band") && q("__bv") === c("__bv") &&
          col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .join(qv, "query_id")
      .join(cv, "neighbor_id")
      .select(
        col("query_id"), col("neighbor_id"),
        (VectorFunctions.dot(col("__qv"), col("__cv")) /
          (col("__qn") * col("__cn"))).as("cosine"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
