package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Throwaway stage-level timing for dedup perf investigation. */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
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
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    df.count()

    val sh = df.select(col("doc_id").as("__id"),
      TextFunctions.shingles(col("text"), 3).as("__sh"))
      .filter(size(col("__sh")) > 0)
    time("shingles count")(sh.count())
    time("shingles count warm")(sh.count())
    val tok = sh.select(col("__id"), explode(col("__sh")).as("__s"))
    time("tok count")(tok.count())
    time("tok count warm")(tok.count())
    val inter = tok.as("a")
      .join(tok.as("b"), col("a.__s") === col("b.__s") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("doc_a"), col("b.__id").as("doc_b"))
      .agg(count(lit(1)).as("intersection"))
    time("inter count")(inter.count())
    time("inter count warm")(inter.count())

    // with a pre-materialized tok (no recompute through self-join)
    val tokM = tok.cache()
    tokM.count()
    val interM = tokM.as("a")
      .join(tokM.as("b"), col("a.__s") === col("b.__s") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("doc_a"), col("b.__id").as("doc_b"))
      .agg(count(lit(1)).as("intersection"))
    time("inter cached")(interM.count())
    time("inter cached warm")(interM.count())
    spark.stop()
  }
}
