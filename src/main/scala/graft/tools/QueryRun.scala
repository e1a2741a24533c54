package graft.tools

import org.apache.spark.sql.SparkSession

/** Runs named [[graft.SparkEntry.queries]] entries against a testdata
  * dir and prints their results — the builder's loop for pinning
  * oracle constants (recall gates) and eyeballing new queries before
  * the driver's DuckDB pass. `args = <sfDir> <query> [query...]`.
  */
object QueryRun {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder()
      .appName("graft-queryrun").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // benchServe's serve-only rows are runnable here too (the bench's
    // timed plans are exactly these lambdas)
    val allFns = graft.SparkEntry.queries ++ graft.SparkEntry.benchServe
    for (name <- args.tail) {
      val t0 = System.nanoTime()
      val df = allFns(name)(spark, dir)
      val rows = df.collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"== $name (${rows.length} rows, $secs%.2f s) ==")
      df.limit(0).printSchema()
      rows.take(20).foreach(println)
    }
    spark.stop()
  }
}
