package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Chunking, CorpusDiff, QualityClassifier, Sampling}

/** Scale stress for the web-curation surface on a `copies`× duplicated
  * sf0.1 corpus: HTML extraction, URL canonicalization, Gopher rules,
  * the NB classifier (train + batch score + pruned-kernel serving),
  * rational top-fraction/quantile labeling, snapshot diff, and the
  * composed extract→scrub→gate→chunk path. Prints row counts so a
  * degenerate plan can't hide behind lazy evaluation.
  */
object WebIngestStress {
  def t[T](l: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[stress] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n = base.count()
    val big = (0 until copies).map(i =>
      base.select((col("doc_id") + lit(i * 1000000)).as("doc_id"),
        col("text"), col("lang"), col("source")))
      .reduce(_ union _)
      .repartition(32)
      .localCheckpoint(true)
    println(s"[stress] corpus: ${big.count()} docs (${copies}x $n)")

    val esc = regexp_replace(regexp_replace(regexp_replace(
      col("text"), "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    val page = concat(
      lit("<html><head><style>p{color:red}</style></head><body><h1>Doc "),
      col("doc_id"),
      lit("</h1><script>if (1 < 2) { alert(\"x&y\"); }</script><p>"), esc,
      lit("</p><!-- c --></body></html>"))

    t("extract_html (synthesized pages)") {
      println("[stress]   chars out: " + big
        .select(length(TextFunctions.extractHtml(page)).as("l"))
        .agg(sum("l")).head().getLong(0))
    }
    t("canonicalize urls (synthesized)") {
      val url = concat(lit("HTTP://Example"), col("doc_id") % 1000,
        lit(".COM:80/P"), col("doc_id"), lit("?utm_a=1&q=2#f"))
      println("[stress]   distinct hosts: " + big
        .select(TextFunctions.canonicalizeUrl(url).as("u"))
        .select(regexp_extract(col("u"), "://([^/]*)", 1).as("h"))
        .distinct().count())
    }
    t("gopher rules") {
      println("[stress]   pass: " + big
        .select(TextFunctions.gopherFlags(col("text"), minWords = 25).as("g"))
        .filter(col("g.pass")).count())
    }
    val idx = s"/tmp/graft_stress_nb_index_$copies"
    t("NB train + publish (pruned, cutoff 2)") {
      QualityClassifier.buildNbIndex(big, "text", col("lang") === "en",
        idx, minCount = 2)
    }
    t("NB batch score (train + join path)") {
      println("[stress]   positive: " + QualityClassifier
        .score(big, "doc_id", "text", col("lang") === "en")
        .filter(col("pred")).count())
    }
    val model = QualityClassifier.loadNbModel(spark, idx)
    t("NB serving kernel (pruned, in-row)") {
      println("[stress]   positive: " + QualityClassifier
        .scoreWithModel(big, "doc_id", "text", model)
        .filter(col("pred")).count())
    }
    t("top-fraction per source (3/10 by doc length)") {
      println("[stress]   kept: " + Sampling.topFractionPerGroup(
        big, "source", "doc_id", length(col("text")), 3, 10).count())
    }
    t("quantile labels per lang (terciles by doc length)") {
      println("[stress]   labeled: " + Sampling.quantileLabelsPerGroup(
        big, "lang", "doc_id", length(col("text")),
        Seq((1L, 3L), (2L, 3L)), Seq("head", "middle", "tail")).count())
    }
    t("corpus diff (5% removed, 7% edited, 9% added)") {
      val oldSnap = big.where(col("doc_id") % 20 =!= 0)
        .withColumn("text", when(col("doc_id") % 14 === 0,
          concat(col("text"), lit(" OLD"))).otherwise(col("text")))
      val newSnap = big.where(col("doc_id") % 11 =!= 3)
      println("[stress]   changes: " + CorpusDiff.diff(
        oldSnap, newSnap, "doc_id", Seq("text")).count())
    }
    t("composed extract -> scrub -> NB gate -> chunk") {
      val extracted = big.select(col("doc_id"),
        TextFunctions.scrubPii(TextFunctions.extractHtml(page)).as("text"))
      val gated = graft.streaming.Streaming.nbGate(
        spark, extracted, "doc_id", "text", idx, minScore = 0.0)
      println("[stress]   chunks: " + Chunking.chunkByTokens(
        gated.select("doc_id", "text"), "doc_id", "text",
        maxTokens = 64, overlap = 8).count())
    }
    spark.stop()
  }
}
