package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch

/** Diagnostic: builds a persisted IVF index from the embeddings table,
  * runs a [[SimilaritySearch.searchIvf]] probe, and reports whether the
  * candidate scan is partition-pruned (dynamic partition pruning from
  * the broadcast probe side) — the property that makes the persisted
  * index the 100 TB serving path: an nProbe=4 / nCentroids=16 search
  * must read 4 cell directories, not 16.
  *
  * Usage: runMain graft.tools.IvfIndexCheck [sfDir]
  */
object IvfIndexCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_check").toString
    val t0 = System.nanoTime()
    SimilaritySearch.buildIvfIndex(e, "vec_id", "embedding", idx)
    val tBuild = (System.nanoTime() - t0) / 1e9
    val q = e.filter(col("vec_id") < 5)
    val res = SimilaritySearch.searchIvf(spark, idx, q, "vec_id", "embedding", 5)
    val t1 = System.nanoTime()
    val n = res.count()
    val tSearch = (System.nanoTime() - t1) / 1e9
    val plan = res.queryExecution.executedPlan.toString
    val dpp = plan.contains("dynamicpruning")
    println(f"build=$tBuild%.2fs search=$tSearch%.2fs rows=$n dpp=$dpp")
    plan.linesIterator.filter(_.contains("PartitionFilters"))
      .foreach(l => println(l.trim.take(400)))
    spark.stop()
  }
}
