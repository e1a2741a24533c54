package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Throwaway: exact posting join vs banded LSH join for CROSS-corpus
  * dedup as shared boilerplate grows — the regime where the posting
  * join's shared-shingle pairs go quadratic (every batch doc shares
  * the boilerplate shingles with every corpus doc) while the LSH
  * join's candidate set stays pair-shaped.
  */
object CrossDedupBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").localCheckpoint(true)
    docs.count()

    def withBoilerplate(pct: Int) = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(100)) < pct,
        concat(lit("all rights reserved terms of service apply to every page on this site "),
          col("text")))
        .otherwise(col("text")).as("text")).localCheckpoint(true)

    def time(label: String, f: => Long): Unit = for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[xd] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $rows rows")
    }
    for ((label, d) <- Seq(
        ("plain", docs),
        ("boiler20", withBoilerplate(20)),
        ("boiler50", withBoilerplate(50)))) {
      val batch = d.filter(col("doc_id") % 2 === 0)
      val corpus = d.filter(col("doc_id") % 2 === 1)
      time(s"$label posting", Dedup.ngramJaccardJoin(
        batch, "doc_id", "text", corpus, "doc_id", "text",
        n = 3, threshold = 0.5).count())
      time(s"$label lsh    ", Dedup.minhashLshJoin(
        batch, "doc_id", "text", corpus, "doc_id", "text",
        n = 3, numHashes = 128, bands = 32, threshold = 0.5).count())
    }
    spark.stop()
  }
}
