package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Dsir, SimilaritySearch}

/** Scale stress for the round-14 data-selection surface on a `copies`×
  * duplicated sf0.1 corpus: DSIR profile build vs serve (the model is
  * ≤`buckets` rows regardless of corpus size — the hashing trick's
  * point), the additive profile append (batch-sized, never
  * corpus-sized), the in-row gate's zero-join serving throughput, and
  * SemDeDup's cluster-blocked pair search vs the unblocked all-pairs
  * baseline on the duplicated embeddings (where every vector gains
  * `copies`−1 planted exact duplicates — the worst case the blocking
  * must absorb). Prints rows so degenerate plans can't hide behind
  * lazy evaluation; numbers quoted in PLANS.md.
  */
object SelectionStress {
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
    import spark.implicits._

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n = base.count()
    val big = (0 until copies).map(i =>
      base.select((col("doc_id") + lit(i * 1000000)).as("doc_id"),
        col("text"), col("lang")))
      .reduce(_ union _)
      .repartition(32)
      .localCheckpoint(true)
    println(s"[stress] corpus: ${big.count()} docs (${copies}x $n)")
    val B = 4096

    val target = big.filter(col("lang") === "en")
    val rawProfile = t(s"DSIR raw profile over ${copies}x corpus") {
      val p = Dsir.ngramProfile(big, "text", B).localCheckpoint(true)
      println("[stress]   profile rows: " + p.count() + s" (cap $B)")
      p
    }
    val targetProfile = t("DSIR target profile (en subset)") {
      val p = Dsir.ngramProfile(target, "text", B).localCheckpoint(true)
      p.count(); p
    }
    val idx = "/tmp/graft_stress_dsir_idx_" +
      java.util.UUID.randomUUID().toString.take(8)
    t(s"DSIR index build over the ${copies}x corpus (one-time)") {
      Dsir.buildDsirIndex(target, "text", big, "text", B, idx)
    }
    t("DSIR append: ONE extra copy's profile (batch-sized, not corpus)") {
      val extra = base.select((col("doc_id") + lit(copies * 1000000)).as("doc_id"),
        col("text"))
      Dsir.appendToDsirIndex(extra, "text", idx)
    }
    val ratio = t("DSIR ratio collect (the serving model)") {
      Dsir.ratioArray(targetProfile, rawProfile, B)
    }
    t("DSIR groupBy scorer over the full corpus") {
      val sc = Dsir.importanceScore(big, "doc_id", "text",
        targetProfile, rawProfile, B)
      println("[stress]   scored docs: " + sc.count())
    }
    t("DSIR in-row gate over the full corpus (zero-join serving)") {
      val kept = graft.streaming.Streaming.dsirGate(big,
        "doc_id", "text", ratio, B, minAvgLogw = -0.07)
      println("[stress]   kept docs: " + kept.count())
    }
    t("DSIR Gumbel-top-k resample (k = corpus/10)") {
      val sc = Dsir.importanceScore(big, "doc_id", "text",
        targetProfile, rawProfile, B)
      println("[stress]   sampled: " +
        Dsir.resampleTopK(sc, "doc_id", k = (n * copies / 10).toInt).count())
    }

    // embeddings: copies× duplication plants (copies choose 2) exact
    // dup pairs per vector id — the blocked search must absorb it
    // SemDeDup vs the unblocked all-pairs baseline as a SCALING table:
    // a single point flatters whichever side amortizes better — the
    // claim is the growth law (all-pairs work ×4 per corpus doubling
    // vs Σ|cluster|² ≈ ×2 when k doubles with the corpus), so measure
    // the doubling sequence. Duplication plants copies·(copies−1)/2
    // exact dup pairs per base vector — blocking must catch ALL of
    // them (exact duplicates always share a cluster).
    val ebase = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val en = ebase.count()
    for (ec <- Seq(2, 4, 8, 16).takeWhile(_ <= math.max(copies, 2))) {
      val ebig = (0 until ec).map(i =>
        ebase.select((col("vec_id") + lit(i * 1000000)).as("vec_id"),
          col("embedding")))
        .reduce(_ union _)
        .repartition(32)
        .localCheckpoint(true)
      val total = ebig.count()
      // k grows with the corpus so cluster sizes stay ~constant —
      // the paper's operating regime
      val k = 16 * ec
      t(s"SemDeDup (k=$k, blocked) on ${ec}x = $total vecs") {
        val out = SimilaritySearch.semDeDup(ebig, "vec_id", "embedding",
          k = k, threshold = 0.999, iters = 3)
        println("[stress]   pruned: " + out.filter(!col("kept")).count()
          + s" of $total (planted ${en * (ec - 1)})")
      }
      t(s"unblocked all-pairs baseline on ${ec}x = $total vecs") {
        println("[stress]   pairs: " +
          Dedup.embeddingNearDup(ebig, "vec_id", "embedding", 0.999).count())
      }
    }
    spark.stop()
  }
}
