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

  /** True when the query side's estimated size exceeds the session
    * broadcast threshold — the foot-gun guard for [[bruteForceTopK]],
    * which broadcasts the query set with a non-equi condition.
    */
  def querySideOversized(queries: DataFrame): Boolean = {
    val conf = queries.sparkSession.sessionState.conf
    // threshold <= 0 means the user disabled broadcasting entirely —
    // the strongest signal they fear large broadcasts, so fall back to
    // the stock 10 MB default as the warn cap instead of going silent
    val cap =
      if (conf.autoBroadcastJoinThreshold > 0) conf.autoBroadcastJoinThreshold
      else 10L << 20
    queries.queryExecution.optimizedPlan.stats.sizeInBytes > BigInt(cap)
  }

  /** Exact top-k neighbors per query by cosine. `queries`/`corpus` carry
    * `(idCol, vecCol)`. Output: `(query_id, neighbor_id, cosine)`,
    * `k` rows per query, self-matches excluded, deterministic tie-break
    * (higher cosine first, then smaller neighbor id).
    *
    * The plan broadcasts the QUERY side and scans the corpus exactly
    * once, so it is sized for `|queries| <<` broadcast threshold. A
    * larger query set still computes correctly but ships the whole set
    * to every corpus partition — the call warns ([[querySideOversized]])
    * and the caller should switch to [[lshTopK]] (or join per-batch).
    * Exactness is never silently traded for speed: the auto-route is
    * the caller's decision.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    if (querySideOversized(queries))
      System.err.println(
        "[graft] WARN: bruteForceTopK query side exceeds the broadcast " +
          "threshold; every corpus partition receives the full query set. " +
          "Consider lshTopK (approximate) or batching the queries.")
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

  /** IVF (inverted-file) approximate top-k — the learned-bucketing scale
    * path the spec pairs with LSH: k-means centroids partition the
    * corpus into `nCentroids` cells; a query probes only its `nProbe`
    * nearest cells and rescores those candidates exactly.
    *
    * Fully deterministic: centroids initialize from the corpus vectors
    * with the smallest md5-derived id hash (seedless, engine-stable) and
    * Lloyd iterations are plain averages. Centroids live on the driver
    * between iterations (k×dim doubles — that is how IVF training works
    * at any scale; the corpus itself never leaves the executors).
    *
    * Cost per query: `nCentroids` centroid dots + |corpus|·nProbe/
    * nCentroids candidate dots — vs |corpus| for brute force. Recall is
    * approximate at cell boundaries; returned cosines are exact.
    */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, iters: Int = 5): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCentroids)
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      VectorFunctions.asDouble(col(vecCol)).as("__cv"),
      VectorFunctions.norm(col(vecCol)).as("__cn"))
      .localCheckpoint(true) // scanned once per Lloyd iteration + search

    // deterministic seed vectors: smallest md5-hash of the id
    var centroids: Array[Array[Double]] = c
      .withColumn("__h", md5(col("neighbor_id").cast("string")))
      .orderBy(col("__h")).limit(nCentroids)
      .select("__cv").collect().map(_.getSeq[Double](0).toArray)

    def nearestUdf(cents: Array[Array[Double]], n: Int) =
      udf((vec: Seq[Double]) => {
        // top-n centroid ids by cosine (centroid norms folded in)
        val scored = cents.zipWithIndex.map { case (ct, i) =>
          var dp = 0.0; var nc = 0.0
          var j = 0
          while (j < ct.length && j < vec.length) { dp += ct(j) * vec(j); nc += ct(j) * ct(j); j += 1 }
          (if (nc > 0) dp / math.sqrt(nc) else 0.0, i)
        }
        scored.sortBy { case (s, i) => (-s, i) }.take(n).map(_._2)
      })

    var it = 0
    while (it < iters) {
      val assigned = c.withColumn("__cell", nearestUdf(centroids, 1)(col("__cv"))(0))
      val means = assigned
        .select(col("__cell"), posexplode(col("__cv")).as(Seq("__pos", "__v")))
        .groupBy(col("__cell"), col("__pos")).agg(avg(col("__v")).as("__m"))
        .groupBy(col("__cell"))
        .agg(array_sort(collect_list(struct(col("__pos"), col("__m")))).as("__ms"))
        .select(col("__cell"), col("__ms.__m").as("__centroid"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      // empty cells keep their previous centroid
      centroids = Array.tabulate(centroids.length)(i => means.getOrElse(i, centroids(i)))
      it += 1
    }

    val cells = c.withColumn("__cell", nearestUdf(centroids, 1)(col("__cv"))(0))
    val q = queries.select(
      col(idCol).as("query_id"),
      VectorFunctions.asDouble(col(vecCol)).as("__qv"),
      VectorFunctions.norm(col(vecCol)).as("__qn"))
      .withColumn("__cell", explode(nearestUdf(centroids, nProbe)(col("__qv"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(q)
      .join(cells, Seq("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        (VectorFunctions.dot(col("__qv"), col("__cv")) /
          (col("__qn") * col("__cn"))).as("cosine"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Micro-averaged recall of an approximate top-k result against the
    * exact one — the cross-implementation-oracle idea the reference's
    * tests use (test/test_ops.py:37-48), emitted AS the query output so
    * the driver's DuckDB gate can check the approximate operators too:
    * `(n_queries, n_results, recall)`, one row. Recall is
    * sum(hits)/sum(k) over integer counts (micro-average), so the value
    * is deterministic — no float summation-order wobble — and the gate
    * oracle can pin it.
    */
  /** SQ8-quantized brute-force top-k: both sides quantize to one byte
    * per component ([[VectorFunctions.sq8Quantize]]), so the broadcast
    * and the scan move 8× fewer bytes than [[bruteForceTopK]] and the
    * inner loop is the codegen'd integer [[graft.functions.ByteDot]].
    * Scores are approximate (per-component quantization error ≤ step/2);
    * ranking quality is measured by the recall gate, not assumed. At
    * 100 TB this is the memory-bandwidth-bound scan path — quantize
    * ONCE at write time, keep the float vectors out of the hot loop
    * entirely.
    */
  def sq8TopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    if (querySideOversized(queries))
      System.err.println(
        "[graft] WARN: sq8TopK query side exceeds the broadcast " +
          "threshold even quantized; consider batching the queries.")
    val q = queries.select(
      col(idCol).as("query_id"),
      VectorFunctions.sq8Quantize(col(vecCol)).as("__qq"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      VectorFunctions.sq8Quantize(col(vecCol)).as("__cq"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    broadcast(q)
      .join(c, col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        VectorFunctions.sq8Cosine(col("__qq"), col("__cq")).as("cosine"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  def recallSummary(approx: DataFrame, exact: DataFrame): DataFrame = {
    // both inputs feed two aggregate subtrees each; materialize the key
    // pairs once so the expensive ANN plans don't execute twice
    val a = approx.select("query_id", "neighbor_id").localCheckpoint(true)
    val e = exact.select("query_id", "neighbor_id").localCheckpoint(true)
    val hits = a.join(e, Seq("query_id", "neighbor_id"), "left_semi")
      .agg(count(lit(1)).as("__hits"))
    val totals = e.agg(
      countDistinct(col("query_id")).as("n_queries"),
      count(lit(1)).as("__k_total"))
    val nApprox = a.agg(count(lit(1)).as("n_results"))
    totals.crossJoin(nApprox).crossJoin(hits)
      .select(
        col("n_queries"), col("n_results"),
        (floor(col("__hits").cast("double") / col("__k_total") * 10000) / 10000)
          .as("recall"))
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
    // no vector payload replicated through the explode); first-shared-
    // band anchor = exactly-once without a dropDuplicates shuffle
    def banded(df: DataFrame, id: String, vecAlias: String, bksAlias: String) = df
      .withColumn(bksAlias, VectorFunctions.signBandKeys(bits, bands)(col(vecAlias)))
      .select(col(id), col(bksAlias),
        posexplode(col(bksAlias)).as(Seq("__band", "__bv")))
    val qv = vecs(queries, "query_id", "__qv", "__qn")
    val cv = vecs(corpus, "neighbor_id", "__cv", "__cn")
    val q = banded(qv, "query_id", "__qv", "__qbks")
    val c = banded(cv, "neighbor_id", "__cv", "__cbks")
    val firstShared =
      array_position(zip_with(col("__qbks"), col("__cbks"), (x, y) => x === y),
        true) - 1
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    q.join(c,
        q("__band") === c("__band") && q("__bv") === c("__bv") &&
          col("query_id") =!= col("neighbor_id") && q("__band") === firstShared)
      .select(col("query_id"), col("neighbor_id"))
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
