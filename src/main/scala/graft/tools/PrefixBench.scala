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
      .localCheckpoint(true)
    docs.count()

    // corpus variants with an injected hot shingle run: `pct`% of docs
    // share a boilerplate prefix (the real-world shape: site chrome,
    // license headers, templated wrappers) — posting lists for the
    // boilerplate shingles grow to pct*n docs and the plain inverted
    // index goes quadratic in them
    import org.apache.spark.sql.functions._
    def withBoilerplate(pct: Int) = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(100)) < pct,
        concat(lit("terms of service apply to all content on this site "), col("text")))
        .otherwise(col("text")).as("text")).localCheckpoint(true)

    def time(label: String, f: => Long): Unit = for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[pb] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $rows rows")
    }
    for ((label, d) <- Seq(
        ("plain-corpus", docs),
        ("boiler10", withBoilerplate(10)),
        ("boiler30", withBoilerplate(30)),
        ("boiler60", withBoilerplate(60))) ) {
      time(s"$label inverted", Dedup.ngramJaccard(d, "doc_id", "text", 3, 0.6).count())
      time(s"$label prefix  ", Dedup.ngramJaccardPrefix(d, "doc_id", "text", 3, 0.6).count())
      val t0 = System.nanoTime()
      val auto = Dedup.ngramJaccardAuto(d, "doc_id", "text", 3, 0.6).count()
      println(f"[pb] $label auto: ${(System.nanoTime() - t0) / 1e9}%.2f s, $auto rows")
    }
    spark.stop()
  }
}
