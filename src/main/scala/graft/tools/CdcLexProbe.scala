package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{CorpusDiff, Search}
import graft.streaming.Streaming

/** Phase breakdown of the stream_cdc_lexical gate: driver collects /
  * diff, the two-batch streaming maintenance, and the serve leg —
  * so optimization lands where the seconds are.
  *
  * Usage: runMain graft.tools.CdcLexProbe [sfDir]
  */
object CdcLexProbe {
  def t[T](l: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s")
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
    import spark.implicits._

    // warm the scan
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    for (round <- 1 to 2) {
      println(s"[probe] ---- round $round ----")
      val token = java.util.UUID.randomUUID().toString.take(8)
      val idx = s"/tmp/graft_probe_cdclex_$token"
      val ckpt = s"/tmp/graft_probe_cdclex_ck_$token"
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text")
      val old = d.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" stale revision"))).otherwise(col("text")))
        .unionByName(d.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"), col("text")))
      val batch1 = t("collect old") {
        old.collect().map(r => (r.getLong(0), "added", r.getString(1)))
          .sortBy(_._1).toSeq
      }
      val newText = t("collect new") {
        d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      }
      val batch2 = t("diff + collect") {
        CorpusDiff.diff(old, d, "doc_id", Seq("text"))
          .collect().map(r => (r.getLong(0), r.getString(1)))
          .sortBy(_._1)
          .map { case (id, st) => (id, st, newText.getOrElse(id, null: String)) }
          .toSeq
      }
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, String, String)]
      val q = Streaming.maintainLexicalIndexCdc(
        input.toDS().toDF("doc_id", "status", "text"),
        "doc_id", "status", "text", idx, ckpt)
      try {
        t("batch 1 (bootstrap build)") {
          input.addData(batch1); q.processAllAvailable()
        }
        t("batch 2 (tombstone + append)") {
          input.addData(batch2); q.processAllAvailable()
        }
      } finally q.stop()
      t("serve (phraseSearchIndex count)") {
        Search.phraseSearchIndex(spark, idx, Seq("vector", "stream"), k = 20)
          .count()
      }
    }
    spark.stop()
  }
}
