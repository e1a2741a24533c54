package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Throwaway: stage timing for pipeline_clean_corpus. */
object PipeBench {
  def t[T](l: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[pipe] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    d.count()
    for (round <- 1 to 2) {
      val scored = d.select(col("doc_id"), col("text"),
        TextFunctions.qualityScore(col("text")).as("__q"),
        TextFunctions.langId(col("text")).as("__lang"))
      val filtered = scored.filter(col("__q") >= 0.5 && col("__lang") === "en")
      t(s"r$round filtered count")(filtered.count())
      val exact = Dedup.exact(filtered, "text", "doc_id")
      t(s"r$round exact count")(exact.count())
      val pairs = t(s"r$round pairs build+count") {
        val p = Dedup.ngramJaccard(exact, "doc_id", "text", 3, 0.6).select("doc_a", "doc_b")
        p.count(); p
      }
      val comps = t(s"r$round CC build (eager)") {
        Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      }
      t(s"r$round final")(comps.count())
    }
    spark.stop()
  }
}
