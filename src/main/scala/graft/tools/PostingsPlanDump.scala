package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Dumps the BUILD-side postings-frame plans for the inverted-index
  * families (round-18 verdict #9: the serve plans the lifecycle
  * queries return do not contain the build job, so build-side claims
  * need build-side dumps). Writes the formatted plan of
  *
  *  - the REPLACED shape: posexplode(tokens) -> groupBy(term, doc)
  *    .agg(count, sort_array(collect_list(pos))) -> repartition(term)
  *    (2 Exchanges, 2 HashAggregates, one shuffled row PER TOKEN), and
  *  - the SHIPPED shape: explode(graft_term_postings(text)) ->
  *    repartition(term) (1 Exchange, no aggregate — the per-doc fold
  *    happens inside the scan projection),
  *
  * for both the tf-only (bm25) and positional (unified lexical)
  * layouts, into plans/r19/.
  *
  * Usage: runMain graft.tools.PostingsPlanDump [sfDir] [outDir]
  */
object PostingsPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r19")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def dump(name: String, df: DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
      println(s"[plandump] wrote $outDir/$name.txt")
    }

    // ---- bm25 postings (tf-only, dl denormalized) ----
    dump("build_bm25_postings_before",
      docs.select(col("doc_id"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("dl"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
        .repartition(col("term"))
        .sortWithinPartitions("term", "doc_id"))
    dump("build_bm25_postings_after",
      docs.select(col("doc_id"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("dl"),
          explode(TextFunctions.termPostings(col("text"),
            withPositions = false)).as("__p"))
        .select(col("doc_id"), col("dl"),
          col("__p.term").as("term"), col("__p.tf").as("tf"))
        .repartition(col("term"))
        .sortWithinPartitions("term", "doc_id"))

    // ---- unified lexical postings (tf + positions) ----
    dump("build_lexical_postings_before",
      docs.select(col("doc_id").cast("long").as("doc_id"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("dl"),
          posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "term")))
        .groupBy("term", "doc_id", "dl")
        .agg(count(lit(1)).as("tf"),
          sort_array(collect_list(col("pos"))).as("positions"))
        .repartition(col("term"))
        .sortWithinPartitions("term", "doc_id"))
    dump("build_lexical_postings_after",
      docs.select(col("doc_id").cast("long").as("doc_id"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("dl"),
          explode(TextFunctions.termPostings(col("text"),
            withPositions = true)).as("__p"))
        .select(col("__p.term").as("term"), col("doc_id"), col("dl"),
          col("__p.tf").as("tf"), col("__p.positions").as("positions"))
        .repartition(col("term"))
        .sortWithinPartitions("term", "doc_id"))

    spark.stop()
  }
}
