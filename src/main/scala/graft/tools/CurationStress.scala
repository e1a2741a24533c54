package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Decontaminate, Dedup, LangModel, Packing, Search}

/** Scale stress for the round-6 curation surface on a `copies`×
  * duplicated sf0.1 corpus (worst case for window masking: every
  * window is a hot key with `copies`+ occurrences, and ALL duplicate
  * occurrences must surface — unlike keep-one dedup this output grows
  * with the duplication factor by construction). Also times the
  * incremental index lifecycle, decontamination, BM25, LM scoring, and
  * packing at the inflated size, printing rows so degenerate plans
  * can't hide behind lazy evaluation.
  */
object CurationStress {
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
      base.select((col("doc_id") + lit(i * 1000000)).as("doc_id"), col("text")))
      .reduce(_ union _)
      .repartition(32)
      .localCheckpoint(true)
    println(s"[stress] corpus: ${big.count()} docs (${copies}x $n)")

    t("mask repeated windows (k=5)") {
      val out = Dedup.maskRepeatedWindows(big, "doc_id", "text", k = 5)
      println("[stress]   surviving docs: " + out.count())
    }
    val idx = "/tmp/graft_stress_mh_index"
    t("build minhash index (corpus half)") {
      Dedup.buildMinhashIndex(big.filter(col("doc_id") % 2 === 1), "doc_id", "text", idx)
    }
    t("incremental dedup (delta half vs index)") {
      println("[stress]   pairs: " + Dedup.dedupAgainstMinhashIndex(
        spark, big.filter(col("doc_id") % 2 === 0), "doc_id", "text", idx, 0.8).count())
    }
    t("decontaminate (4% eval split)") {
      println("[stress]   flagged: " + Decontaminate.ngramOverlap(
        big.filter(col("doc_id") % 25 =!= 0), big.filter(col("doc_id") % 25 === 0),
        "doc_id", "text", n = 3).count())
    }
    t("bm25 top-20") {
      println("[stress]   rows: " + Search.bm25TopK(
        big, "doc_id", "text", Seq("vector", "stream", "spark"), k = 20).count())
    }
    t("lm score (self-trained bigram)") {
      println("[stress]   rows: " + LangModel.score(big, "doc_id", "text").count())
    }
    t("pack sequences (128-token bins)") {
      val d = big.select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tokens"))
      println("[stress]   rows: " + Packing.packGreedy(
        d, "doc_id", "n_tokens", 128, expr("doc_id div 25")).count())
    }
    // round-8 additions
    t("streaming decontamination gate (batch-unified, 4% eval)") {
      println("[stress]   kept: " + graft.streaming.Streaming.decontaminateGate(
        spark, big.filter(col("doc_id") % 25 =!= 0), "doc_id", "text",
        big.filter(col("doc_id") % 25 === 0), "text", n = 3).count())
    }
    t("token-budget prefix sample (half the corpus tokens)") {
      val total = big.select(coalesce(
        sum(TextFunctions.tokenCount(col("text"))), lit(0L))).head().getLong(0)
      println("[stress]   kept: " + graft.operators.Sampling.sampleToTokenBudget(
        big, "doc_id", TextFunctions.tokenCount(col("text")), total / 2).count() +
        s" (budget ${total / 2})")
    }
    t("lm gate (pruned model, threshold -3.42)") {
      val lmIdx = "/tmp/graft_stress_lm_index"
      graft.operators.LangModel.buildLmIndex(big, "text", lmIdx)
      println("[stress]   kept: " + graft.streaming.Streaming.lmGate(
        spark, big, "doc_id", "text", lmIdx, minAvgLogp = -3.42).count())
    }
    t("bpe tokenize (W=4096, M=256 corpus-trained)") {
      val merges = graft.operators.BpeTokenizer.trainBpe(big, "text")
      println("[stress]   tokens: " + big.select(coalesce(sum(
        graft.operators.BpeTokenizer.bpeTokenCount(col("text"), merges)), lit(0L)))
        .head().getLong(0) + s" (${merges.length} merges)")
    }
    spark.stop()
  }
}
