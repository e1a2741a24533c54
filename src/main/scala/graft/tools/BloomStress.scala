package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Decontaminate

/** Where the Bloom decontamination path earns its keep — and where it
  * doesn't. On the gate corpus the eval side is tiny, so the exact
  * path's broadcast join is cheap and bloom's two setup jobs make it
  * slower (the honest reading of the bench numbers). The regime this
  * operator exists for is the production one: a large, MOSTLY-CLEAN
  * train corpus against a benchmark suite with millions of distinct
  * n-grams. There:
  *
  *  - the exact path builds + ships a multi-hundred-MB broadcast hash
  *    relation and, worse, its per-doc aggregation keys EVERY train
  *    doc (n_shingles rides the groupBy even for clean docs, which are
  *    filtered only at the end);
  *  - the bloom path ships ~1.2 B/shingle and kills clean docs with a
  *    scan-local array filter, so the aggregation only ever sees the
  *    contaminated sliver.
  *
  * Train/eval are synthetic with globally unique tokens, so clean docs
  * are provably clean and contamination is exactly the planted docs.
  * Flag counts must agree across all three paths.
  */
object BloomStress {
  def t[T](l: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[bloom-stress] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  /** `n` docs of `toks` globally-unique tokens tagged `tag`. */
  private def mkDocs(spark: SparkSession, n: Long, toks: Int, tag: String): DataFrame =
    spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(toks - 1)),
        j => concat_ws("_", lit(tag), col("id"), j))).as("text"))

  def main(args: Array[String]): Unit = {
    val trainDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val evalDocs = args.lift(1).map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // NOTE: driver heap CANNOT be set here in local mode — the JVM is
      // already running. Launch with -Xmx16g (or --driver-memory 16g via
      // spark-submit); the forced-broadcast leg needs it.
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val eval = mkDocs(spark, evalDocs, 40, "e").repartition(32).localCheckpoint(true)
    // train: clean docs plus 0.2% planted contamination (eval text under
    // shifted train ids)
    val planted = eval.filter(col("doc_id") % 500 === 0)
      .select((col("doc_id") + lit(2000000000L)).as("doc_id"), col("text"))
    val train = mkDocs(spark, trainDocs, 40, "t").unionByName(planted)
      .repartition(32).localCheckpoint(true)
    println(s"[bloom-stress] train=${train.count()} docs " +
      s"(${planted.count()} planted), eval=${eval.count()} docs, " +
      s"~${evalDocs * 33} distinct eval 8-gram shingles")

    // stage breakdown of the bloom path (mirrors ngramOverlapBloom)
    {
      import graft.functions.TextFunctions
      val evalSh = eval
        .select(explode(TextFunctions.shingles(col("text"), 8)).as("__s"))
        .select(xxhash64(col("__s")).as("__h"))
      val bound = t("  stage: size bound") {
        eval.select(coalesce(sum(size(TextFunctions.shingles(col("text"), 8))), lit(0L)))
          .head().getLong(0)
      }
      val bloom = t("  stage: bloom build") {
        evalSh.stat.bloomFilter("__h", math.max(bound, 1L), 1e-5)
      }
      println(s"[bloom-stress]   bloom bits: ${bloom.bitSize()} (~${bloom.bitSize() / 8 / 1024 / 1024} MiB)")
      t("  stage: train scan -> candidates (native shingle + bloom-probe expressions)") {
        import org.apache.spark.sql.GraftInternals.{toColumn, toExpression}
        // fpp 1e-5: per-DOC false-positive rate is ~33x that
        val c = train
          .select(col("doc_id"), TextFunctions.shingles(col("text"), 8).as("__sh"))
          .filter(size(col("__sh")) > 0)
          .select(col("doc_id"),
            toColumn(graft.functions.BloomHitsExpr(toExpression(col("__sh")), bloom))
              .as("__cand"))
          .filter(size(col("__cand")) > 0).count()
        println(s"[bloom-stress]   candidates: $c")
      }
    }
    val flaggedBloom = t("bloom prefilter + exact confirm") {
      Decontaminate.ngramOverlapBloom(train, eval, "doc_id", "text", n = 8).count()
    }
    val flaggedBcast = t("exact, forced broadcast of the eval hash set") {
      Decontaminate.ngramOverlap(train, eval, "doc_id", "text", n = 8).count()
    }
    val flaggedShuffle = t("exact, shuffle join (broadcastEval=false)") {
      Decontaminate.ngramOverlap(train, eval, "doc_id", "text", n = 8,
        broadcastEval = false).count()
    }
    println(s"[bloom-stress] flagged: bloom=$flaggedBloom bcast=$flaggedBcast shuffle=$flaggedShuffle")
    assert(flaggedBloom == flaggedBcast && flaggedBcast == flaggedShuffle,
      "paths disagree — output-identity broken")
    spark.stop()
  }
}
