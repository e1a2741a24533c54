package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Keyword search over a document corpus: BM25 top-k ranking built from
  * one corpus scan, plus a persisted-inverted-index lifecycle for
  * serving many queries without rescanning.
  *
  * Beyond the reference surface (SURVEY.md §2.4): the retrieval
  * counterpart to [[SimilaritySearch]] — lexical top-k where that file
  * is dense top-k.
  *
  * Scale design: query terms are a handful, the corpus is ~100 TB. The
  * plan filters the exploded postings to the query terms BEFORE any
  * aggregation — so the only shuffles carry `(doc_id, term, tf)` rows
  * for matching terms and the per-doc `(doc_id, dl)` lengths, never
  * text. Corpus stats (N, total length) reduce to one row and the
  * per-term document frequencies to ≤ |query| rows; both broadcast back
  * into the scoring join. Final top-k is `ORDER BY … LIMIT k` —
  * Spark plans `TakeOrderedAndProject` (per-partition heaps, no global
  * sort).
  *
  * Determinism (oracle contract): BM25 uses `ln`, which is NOT
  * IEEE-correctly-rounded, so Spark's `Math.log` and another engine's
  * libm may differ in the last ulp. Each per-term idf is therefore
  * floored to 4 decimals immediately after the `ln` (a 1-ulp flip would
  * need the idf within ~1e-12 of a 1e-4 grid line), every other factor
  * is rational double arithmetic ordered identically on both sides, and
  * per-term contributions are floored to a 1e-8 grid and summed as
  * exact LONGS — summation order cannot flip a bit.
  */
object Search {

  /** BM25 (Robertson/Lucene form) top-k: returns
    * `(<idCol>, score, n_terms_hit)` for the `k` best-scoring docs,
    * score descending, doc id ascending on ties.
    *
    * idf = floor4(ln((N − df + 0.5) / (df + 0.5) + 1)) — the Lucene
    * variant, always ≥ 0. Per-term contribution
    * idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    val terms = queryTerms.distinct

    // one corpus scan: per-doc length is size(tokens) in the scan
    // projection — NO explode+re-aggregate shuffle for lengths — and
    // the doc's postings restrict to the query terms before the explode
    // output ever reaches a shuffle
    val lengths = docs.select(
        col(idCol).as("__id"),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("__dl"))
      .filter(col("__dl") > 0) // token-less docs are outside the corpus stats
    val postings = docs
      .select(col(idCol).as("__id"), explode(TextFunctions.tokens(col(textCol))).as("__t"))
      .filter(col("__t").isin(terms: _*))
      .groupBy("__id", "__t")
      .agg(count(lit(1)).as("__tf"))

    // corpus stats: one row; per-term df: ≤ |query| rows — broadcast both
    val stats = lengths.agg(
      count(lit(1)).as("__n_docs"),
      sum(col("__dl")).as("__total_dl"))
    val dfs = postings.groupBy("__t").agg(count(lit(1)).as("__df"))

    val scored = postings
      .join(broadcast(dfs), "__t")
      .join(lengths, "__id")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        floor(log(
          (col("__n_docs") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))
            + lit(1.0)) * lit(10000.0)) / lit(10000.0))
      .withColumn("__avgdl", col("__total_dl") * lit(1.0) / col("__n_docs"))
      .withColumn("__contrib",
        // floored to a 1e-8 grid as an exact long, so the per-doc sum
        // is order-independent
        floor(col("__idf") * (col("__tf") * lit(k1 + 1.0)
          / (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
          * lit(100000000.0)).cast("long"))

    scored
      .groupBy(col("__id"))
      .agg(
        sum(col("__contrib")).as("__scaled"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("__scaled").desc, col("__id").asc)
      .limit(k)
      .select(
        col("__id").as(idCol),
        (col("__scaled") / lit(100000000.0)).as("score"),
        col("n_terms_hit"))
  }

  /** Persist the full inverted index + doc stats so repeated queries
    * skip the corpus scan: `path/postings` holds `(term, doc_id, tf)`
    * BUCKETED BY term (a term lookup touches one bucket's files),
    * `path/lengths` holds `(doc_id, dl)`, `path/stats` the one-row
    * corpus stats. Written once per corpus snapshot, served by
    * [[bm25SearchIndex]].
    */
  def buildBm25Index(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      termBuckets: Int = 64): Unit = {
    // three tables, one atomic publish: postings/lengths/stats land in
    // a fresh version dir and the _LATEST pointer flips last, so a
    // mid-build failure or a rebuild under a reader never exposes
    // postings from one corpus snapshot with stats from another
    graft.sources.IndexIO.publish(docs.sparkSession, path) { vdir =>
      val lengths = docs.select(
          col(idCol).as("doc_id"),
          size(TextFunctions.tokens(col(textCol))).cast("long").as("dl"))
        .filter(col("dl") > 0)
      docs.select(col(idCol).as("doc_id"), explode(TextFunctions.tokens(col(textCol))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .repartition(termBuckets, col("term"))
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite").parquet(s"$vdir/postings")
      lengths.write.mode("overwrite").parquet(s"$vdir/lengths")
      lengths.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
        .write.mode("overwrite").parquet(s"$vdir/stats")
    }
    ()
  }

  /** Tombstone-delete docs from a [[buildBm25Index]] index WITHOUT a
    * rebuild (the takedown path, mirroring
    * [[SimilaritySearch.deleteFromAnnIndex]]): publishes a delta
    * segment carrying the tombstone ids plus CORRECTED corpus stats
    * (N and total length shrink by the deleted docs' live lengths —
    * serving stays O(1), no stats rescan per query). Readers anti-join
    * postings and lengths against the tombstone chain; per-term df is
    * computed from live postings at query time, so it corrects itself.
    * [[compactBm25Index]] drops dead rows physically.
    */
  def deleteFromBm25Index(
      spark: SparkSession, path: String, ids: DataFrame, idCol: String): Unit = {
    import spark.implicits._
    val vdir = graft.sources.IndexIO.resolve(spark, path)
    val tomb = ids.select(col(idCol).cast("long").as("doc_id")).distinct()
    // live lengths BEFORE this delete: only still-live docs may shrink
    // the stats (double-deleting an id must not subtract twice)
    val del = liveTable(spark, path, "lengths").join(tomb, "doc_id")
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("s"))
      .head()
    val stats = spark.read.parquet(s"$vdir/stats").head()
    graft.sources.IndexIO.publishDelta(spark, path) { seg =>
      tomb.coalesce(1).write.mode("overwrite").parquet(s"$seg/tombstones")
      Seq((stats.getLong(0) - del.getLong(0), stats.getLong(1) - del.getLong(1)))
        .toDF("n_docs", "total_dl")
        .coalesce(1).write.mode("overwrite").parquet(s"$seg/stats")
    }
    ()
  }

  /** Collapse a tombstoned [[buildBm25Index]] chain to ONE segment:
    * live postings re-bucketed by term, live lengths, the corrected
    * stats carried forward. Identical serving results by construction.
    */
  def compactBm25Index(
      spark: SparkSession, path: String, termBuckets: Int = 64): Unit = {
    if (graft.sources.IndexIO.segments(spark, path).length <= 1) return
    val vdir = graft.sources.IndexIO.resolve(spark, path)
    val postings = liveTable(spark, path, "postings")
    val lengths = liveTable(spark, path, "lengths")
    val stats = spark.read.parquet(s"$vdir/stats")
    graft.sources.IndexIO.publish(spark, path) { nv =>
      postings.repartition(termBuckets, col("term"))
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite").parquet(s"$nv/postings")
      lengths.write.mode("overwrite").parquet(s"$nv/lengths")
      stats.coalesce(1).write.mode("overwrite").parquet(s"$nv/stats")
    }
    ()
  }

  /** A chain table with the tombstone anti-join applied ([[
    * graft.sources.IndexIO.withoutTombstoned]] — log-ordered, so only
    * rows indexed BEFORE the delete die).
    */
  private def liveTable(spark: SparkSession, path: String, name: String): DataFrame =
    graft.sources.IndexIO.withoutTombstoned(
      graft.sources.IndexIO.chainTable(spark, path, name).getOrElse(
        throw new IllegalStateException(s"BM25 index at $path has no $name table")),
      graft.sources.IndexIO.chainTable(spark, path, "tombstones"),
      "doc_id")

  /** Serve a BM25 top-k from a [[buildBm25Index]] index. The postings
    * scan carries a pushed-down `term IN (…)` filter (row-group
    * min/max skips non-matching buckets' files outright); scoring
    * arithmetic is identical to [[bm25TopK]]. Postings and lengths
    * read through the tombstone chain; stats come from the newest
    * segment (corrected at delete time).
    */
  def bm25SearchIndex(
      spark: SparkSession,
      path: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25SearchIndex: empty query")
    val terms = queryTerms.distinct
    val vdir = graft.sources.IndexIO.resolve(spark, path)
    val postings = graft.sources.IndexIO.withoutTombstoned(
      graft.sources.IndexIO.chainTable(spark, path, "postings").getOrElse(
        throw new IllegalStateException(s"BM25 index at $path has no postings table"))
        .filter(col("term").isin(terms: _*)),
      graft.sources.IndexIO.chainTable(spark, path, "tombstones"),
      "doc_id")
    val lengths = liveTable(spark, path, "lengths")
    val stats = spark.read.parquet(s"$vdir/stats")
    val dfs = postings.groupBy("term").agg(count(lit(1)).as("df"))

    postings
      .join(broadcast(dfs), "term")
      .join(lengths, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        floor(log(
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
            + lit(1.0)) * lit(10000.0)) / lit(10000.0))
      .withColumn("__avgdl", col("total_dl") * lit(1.0) / col("n_docs"))
      .withColumn("__contrib",
        floor(col("__idf") * (col("tf") * lit(k1 + 1.0)
          / (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("__avgdl"))))
          * lit(100000000.0)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("__contrib")).as("__scaled"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("__scaled").desc, col("doc_id").asc)
      .limit(k)
      .select(
        col("doc_id"),
        (col("__scaled") / lit(100000000.0)).as("score"),
        col("n_terms_hit"))
  }
}
