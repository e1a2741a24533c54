package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale probe for the suffix-span family (charSpanPairs /
  * stripRepeatedCharSpans) on a DUPLICATED corpus — the worst-case
  * shape: every doc has `copies − 1` full-length clones, so the pair
  * count grows quadratically in the duplication factor (C(copies, 2)
  * full-doc spans per base doc) while gram postings grow linearly.
  * Measures pairs + strip seconds and row counts per multiplier, then
  * the hot-gram cutoff leg at the top multiplier: the cutoff is the
  * quadratic cap for crawl boilerplate, and the probe shows what it
  * costs (dropped spans) and buys (bounded hash blocks).
  *
  * Usage: runMain graft.tools.SpanStress [sfDir] [maxCopies]
  */
object SpanStress {
  def t[T](l: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[stress] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxCopies = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    for (m <- Seq(1, 4, maxCopies).distinct) {
      val docs = (0 until m).map(i =>
        base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"), col("text")))
        .reduce(_ unionByName _).repartition(32).localCheckpoint(true)
      val n = docs.count()
      val pairs = t(f"charSpanPairs @ ${m}x ($n docs)") {
        Dedup.charSpanPairs(docs, "doc_id", "text", k = 20, minSpanChars = 30)
          .count()
      }
      println(s"[stress]   -> $pairs span rows")
      val stripped = t(f"stripRepeatedCharSpans @ ${m}x") {
        Dedup.stripRepeatedCharSpans(docs, "doc_id", "text",
          k = 20, minSpanChars = 30)
          .agg(sum(length(col("text")))).head().getLong(0)
      }
      println(s"[stress]   -> $stripped chars kept")
      if (m == maxCopies) {
        // the quadratic cap: grams hotter than the cutoff drop before
        // the self-join; full-doc clone spans survive (their grams are
        // exactly `copies`-hot), hotter boilerplate is bounded
        val cut = t(f"charSpanPairs @ ${m}x, hotGramCutoff=${4 * m}") {
          Dedup.charSpanPairs(docs, "doc_id", "text", k = 20,
            minSpanChars = 30, hotGramCutoff = 4L * m).count()
        }
        println(s"[stress]   -> $cut span rows under the cutoff")
      }
    }
    spark.stop()
  }
}
