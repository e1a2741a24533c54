package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Worst-case scale stress for the dedup path: replicate the sf0.1
  * corpus `copies`× (ids offset), so every document has `copies` exact
  * duplicates — posting lists grow `copies`×, candidate pairs
  * ~`copies`²×. Checks that nothing degenerates catastrophically at a
  * 10× corpus with pathological duplication.
  */
object ScaleStress {
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
      .localCheckpoint(true)
    println(s"[stress] corpus: ${big.count()} docs (${copies}x $n)")
    t("exact dedup")(println("[stress]   rows: " +
      Dedup.exact(big, "text", "doc_id").count()))
    t("minhash lsh")(println("[stress]   pairs: " +
      Dedup.minhashLsh(big, "doc_id", "text", 3, 128, 32, 0.8).count()))
    t("ngram jaccard")(println("[stress]   pairs: " +
      Dedup.ngramJaccard(big, "doc_id", "text", 3, 0.6).count()))
    t("simhash")(println("[stress]   pairs: " +
      Dedup.simhashPairs(big, "doc_id", "text", 7).count()))
    spark.stop()
  }
}

/** Worst-case round count for distributed connected components: a PATH
  * graph (diameter = edge count) is the adversarial input for label
  * propagation. Prints rounds-to-fixpoint and wall time so the
  * O(log₄ diameter) claim in [[graft.operators.Dedup.connectedComponents]]
  * stays measured, not asserted.
  */
object ScaleStressCC {
  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.map(_.toInt).getOrElse(600000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // path 0-1-2-...-nEdges: one component, diameter nEdges
    val pairs = spark.range(nEdges)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val t0 = System.nanoTime()
    val (labels, rounds) = graft.operators.Dedup.connectedComponentsImpl(
      pairs, "a", "b", maxIter = 40, localThreshold = 0L)
    val comps = labels.select("component").distinct().count()
    println(f"[stress-cc] path($nEdges): $rounds rounds, " +
      f"$comps component(s), ${(System.nanoTime() - t0) / 1e9}%.2f s")
    assert(comps == 1L, s"path graph must collapse to 1 component, got $comps")
    spark.stop()
  }
}

/** The FULL pipeline_clean_corpus composition (quality gate -> language
  * gate -> exact dedup -> adaptive near-dup clustering -> connected
  * components -> representative-per-cluster anti-join) on the `copies`×
  * duplicated stress corpus, with a per-stage wall-time breakdown. The
  * components are individually stress-measured above; this answers the
  * question they can't: does the COMPOSITION hold up when every doc has
  * `copies` exact duplicates (the order-of-operations claim — exact
  * dedup first collapses the k² posting blowup — under its own worst
  * case).
  */
object ScaleStressPipeline {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val big = (0 until copies).map(i =>
      base.select((col("doc_id") + lit(i * 1000000)).as("doc_id"), col("text")))
      .reduce(_ union _).localCheckpoint(true)
    println(s"[stress-pipe] corpus: ${big.count()} docs (${copies}x)")
    val tAll = System.nanoTime()
    def stage[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress-pipe] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // EXACTLY the SparkEntry composition, stage-materialized so each
    // phase gets its own wall clock (the extra checkpoints make the
    // breakdown; the one after exact dedup exists in the query too)
    val filtered = stage("quality+lang gates") {
      big.select(col("doc_id"), col("text"),
          TextFunctions.qualityScore(col("text")).as("__q"),
          TextFunctions.langId(col("text")).as("__lang"))
        .filter(col("__q") >= 0.5 && col("__lang") === "en")
        .localCheckpoint(true)
    }
    println(s"[stress-pipe]   gated docs: ${filtered.count()}")
    val exact = stage("exact dedup") {
      Dedup.exact(filtered, "text", "doc_id").localCheckpoint(true)
    }
    println(s"[stress-pipe]   unique docs: ${exact.count()}")
    val pairs = stage("adaptive near-dup join (incl. probe)") {
      Dedup.ngramJaccardAuto(exact, "doc_id", "text", n = 3, threshold = 0.6)
        .select("doc_a", "doc_b").localCheckpoint(true)
    }
    println(s"[stress-pipe]   near-dup pairs: ${pairs.count()}")
    val comps = stage("connected components") {
      Dedup.connectedComponents(pairs, "doc_a", "doc_b").localCheckpoint(true)
    }
    val kept = stage("representative anti-join") {
      val drops = comps.filter(col("id") =!= col("component"))
        .select(col("id").as("__dropid"))
      exact.join(drops, exact("doc_id") === col("__dropid"), "left_anti").count()
    }
    println(f"[stress-pipe] TOTAL: ${(System.nanoTime() - tAll) / 1e9}%.2f s, kept $kept docs")
    spark.stop()
  }
}

/** Prefix-filter variant on the same stress corpus. */
object ScaleStressPrefix {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val big = (0 until copies).map(i =>
      base.select((col("doc_id") + lit(i * 1000000)).as("doc_id"), col("text")))
      .reduce(_ union _).localCheckpoint(true)
    val t0 = System.nanoTime()
    val n = graft.operators.Dedup.ngramJaccardPrefix(big, "doc_id", "text", 3, 0.6).count()
    println(f"[stress] ngram prefix: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n pairs")
    spark.stop()
  }
}
