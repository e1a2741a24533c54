package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** Throwaway: prefix-filtered vs plain ngram Jaccard at a given SF. */
object PrefixBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    for (i <- 1 to 2) {
      var t0 = System.nanoTime()
      val plain = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.6).count()
      println(f"[pb] plain run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $plain rows")
      t0 = System.nanoTime()
      val pref = Dedup.ngramJaccardPrefix(docs, "doc_id", "text", 3, 0.6).count()
      println(f"[pb] prefix run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $pref rows")
    }
    spark.stop()
  }
}
