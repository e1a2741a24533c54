package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SearchSuite extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark scan spark join"),
    (2L, "join join join filter filter"),
    (3L, "spark"),
    (4L, "scan filter scan filter scan filter scan filter"),
    (5L, "unrelated words only here")
  ).toDF("doc_id", "text")

  /** Independent scalar reimplementation of the documented formula. */
  private def expectedScores(
      docs: Seq[(Long, String)], terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): Map[Long, (Double, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val n = docs.size.toDouble
    val avgdl = toks.values.map(_.size).sum * 1.0 / n
    docs.flatMap { case (id, _) =>
      val contribs = terms.distinct.flatMap { term =>
        val tf = toks(id).count(_ == term).toDouble
        if (tf == 0) None else {
          val df = docs.count { case (i, _) => toks(i).contains(term) }.toDouble
          val idf = math.floor(math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e4) / 1e4
          val dl = toks(id).size.toDouble
          Some(math.floor(
            idf * (tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))) * 1e8).toLong)
        }
      }
      if (contribs.isEmpty) None
      else Some(id -> (contribs.sum / 1e8, contribs.size.toLong))
    }.toMap
  }

  test("bm25TopK matches an independent scalar implementation exactly") {
    val docs = corpus.as[(Long, String)].collect().toSeq
    val exp = expectedScores(docs, Seq("spark", "filter"))
    val got = Search.bm25TopK(corpus, "doc_id", "text", Seq("spark", "filter"), k = 10)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got == exp)
  }

  test("ranking is score-desc with doc-id tiebreak, truncated at k") {
    val top = Search.bm25TopK(corpus, "doc_id", "text", Seq("spark", "filter"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    val docs = corpus.as[(Long, String)].collect().toSeq
    val exp = expectedScores(docs, Seq("spark", "filter")).toSeq
      .sortBy { case (id, (s, _)) => (-s, id) }.take(2).map(_._1)
    assert(top == exp)
  }

  test("duplicate query terms do not double-count") {
    val a = Search.bm25TopK(corpus, "doc_id", "text", Seq("spark", "spark"), k = 10)
    val b = Search.bm25TopK(corpus, "doc_id", "text", Seq("spark"), k = 10)
    assertSameRows(a, b)
  }

  test("persisted index serves the same result as the inline scan") {
    val dir = Files.createTempDirectory("bm25idx").toString
    Search.buildBm25Index(corpus, "doc_id", "text", dir, termBuckets = 4)
    val inline = Search.bm25TopK(corpus, "doc_id", "text", Seq("spark", "filter"), k = 10)
    val served = Search.bm25SearchIndex(spark, dir, Seq("spark", "filter"), k = 10)
    assertSameRows(inline, served)
  }

  test("index probe pushes the term filter into the postings scan") {
    val dir = Files.createTempDirectory("bm25idx2").toString
    Search.buildBm25Index(corpus, "doc_id", "text", dir, termBuckets = 4)
    val plan = Search.bm25SearchIndex(spark, dir, Seq("spark"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("term"),
      s"term filter not pushed to parquet:\n$plan")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = Search.bm25TopK(corpus, "doc_id", "text", Seq("spark"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k operator in:\n$plan")
  }

  test("tombstone delete: serving == BM25 over the remaining corpus, no rebuild") {
    val dir = Files.createTempDirectory("bm25del").toString
    Search.buildBm25Index(corpus, "doc_id", "text", dir, termBuckets = 4)
    Search.deleteFromBm25Index(spark, dir,
      Seq(1L, 4L).toDF("doc_id"), "doc_id")
    val remaining = corpus.filter(!$"doc_id".isin(1L, 4L))
    val served = Search.bm25SearchIndex(spark, dir, Seq("spark", "filter"), k = 10)
    // deleting docs shifts df, N, and avgdl — the full rescore over the
    // remaining corpus is the ground truth
    assertSameRows(
      Search.bm25TopK(remaining, "doc_id", "text", Seq("spark", "filter"), k = 10),
      served)
    assert(!served.collect().map(_.getLong(0)).contains(1L))
    // double-delete of an already-dead id must not subtract stats twice
    Search.deleteFromBm25Index(spark, dir, Seq(1L).toDF("doc_id"), "doc_id")
    val stats = spark.read.parquet(
      graft.sources.IndexIO.resolve(spark, dir) + "/stats").head()
    assert(stats.getLong(0) == 3L, s"n_docs ${stats.getLong(0)} after double delete")
    // compaction drops dead rows physically; results identical
    val before = rowSet(Search.bm25SearchIndex(spark, dir, Seq("spark", "filter"), k = 10))
    Search.compactBm25Index(spark, dir, termBuckets = 4)
    assert(graft.sources.IndexIO.segments(spark, dir).length == 1)
    assert(rowSet(Search.bm25SearchIndex(spark, dir, Seq("spark", "filter"), k = 10)) == before)
    // the compacted postings physically exclude the tombstoned docs
    val live = spark.read.parquet(
      graft.sources.IndexIO.resolve(spark, dir) + "/postings")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(!live.contains(1L) && !live.contains(4L))
  }
}
