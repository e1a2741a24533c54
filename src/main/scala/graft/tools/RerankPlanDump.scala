package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch

/** Dumps the SERVE-side plan of the two-stage IVF×PQ retrieval
  * (`searchIvfPqRerank`) — the join-strategy evidence for the
  * broadcast-guard probe (round-18 verdict #5): with the estimate-only
  * guard the 20-row query slice was refused broadcast (the no-CBO size
  * estimate reports the whole table) and the rescore leg planned a
  * shuffle join of the corpus-sized vectors side-file; with the exact
  * probe the candidate set broadcasts and the vectors table is never
  * shuffled.
  *
  * Usage: runMain graft.tools.RerankPlanDump [sfDir] [outFile]
  */
object RerankPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("plans/r19/ann_topk_ivf_pq_rerank_serve_after.txt")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val idx = s"/tmp/graft_rrplan_${java.util.UUID.randomUUID().toString.take(8)}"
    SimilaritySearch.buildIvfPqIndex(e, "vec_id", "embedding", idx,
      nCentroids = 16, m = 32, kCodes = 32)
    val served = SimilaritySearch.searchIvfPqRerank(spark, idx, q,
      "vec_id", "embedding", k = 5, nProbe = 8)
    Files.createDirectories(Paths.get(out).getParent)
    Files.writeString(Paths.get(out), served.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    println(s"[plandump] wrote $out")
    spark.stop()
  }
}
