package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Packing

/** First-fit (id order) vs best-fit-decreasing packing on a `copies`×
  * duplicated sf0.1 corpus: bins, mean fill, and wall time per
  * packer — the measured basis for "BFD when the corpus is on disk,
  * greedy when order is the contract".
  */
object PackBench {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val maxLen = args.lift(1).map(_.toLong).getOrElse(128L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val big = (0 until copies).map(i =>
      base.select((col("doc_id") + lit(i * 1000000)).as("doc_id"), col("text")))
      .reduce(_ union _)
      .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("toks"))
      .repartition(32)
      .localCheckpoint(true)
    val n = big.count()
    println(s"[packbench] corpus: $n docs, maxLen $maxLen, chunks of 25")
    for ((name, fn) <- Seq(
        ("first-fit (id order)", () => Packing.packGreedy(
          big, "doc_id", "toks", maxLen, expr("doc_id div 25"))),
        ("best-fit-decreasing", () => Packing.packBestFitDecreasing(
          big, "doc_id", "toks", maxLen, expr("doc_id div 25"))))) {
      val t0 = System.nanoTime()
      val out = fn()
      val stats = out.groupBy("chunk", "bin").agg(max("bin_fill").as("fill"))
        .agg(count(lit(1)).as("bins"), avg("fill").as("mean_fill")).head()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[packbench] $name: ${stats.getLong(0)} bins, " +
        f"mean fill ${stats.getDouble(1)}%.1f / $maxLen, $secs%.2f s")
    }
    spark.stop()
  }
}
