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

    // the SQ8 variant must keep the same pruning property with the
    // quantized cells, and its index should be materially smaller
    val idxQ = java.nio.file.Files.createTempDirectory("graft_ivf_sq8_check").toString
    val t2 = System.nanoTime()
    SimilaritySearch.buildIvfSq8Index(e, "vec_id", "embedding", idxQ)
    val tBuildQ = (System.nanoTime() - t2) / 1e9
    val resQ = SimilaritySearch.searchIvfSq8(spark, idxQ, q, "vec_id", "embedding", 5)
    val t3 = System.nanoTime()
    val nQ = resQ.count()
    val tSearchQ = (System.nanoTime() - t3) / 1e9
    val dppQ = resQ.queryExecution.executedPlan.toString.contains("dynamicpruning")
    def dirBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(p))
    }
    println(f"sq8: build=$tBuildQ%.2fs search=$tSearchQ%.2fs rows=$nQ dpp=$dppQ " +
      f"cells=${dirBytes(s"${graft.sources.IndexIO.resolve(spark, idxQ)}/cells")}%d B" +
      f" vs float ${dirBytes(s"${graft.sources.IndexIO.resolve(spark, idx)}/cells")}%d B")

    // PQ: the smallest index of the family — m code bytes per vector.
    // Report size vs the float cells and the search wall time.
    val idxP = java.nio.file.Files.createTempDirectory("graft_pq_check").toString
    val t4 = System.nanoTime()
    SimilaritySearch.buildPqIndex(e, "vec_id", "embedding", idxP)
    val tBuildP = (System.nanoTime() - t4) / 1e9
    val resP = SimilaritySearch.searchPqIndex(spark, idxP, q, "vec_id", "embedding", 5)
    val t5 = System.nanoTime()
    val nP = resP.count()
    val tSearchP = (System.nanoTime() - t5) / 1e9
    println(f"pq: build=$tBuildP%.2fs search=$tSearchP%.2fs rows=$nP " +
      f"codes=${dirBytes(s"${graft.sources.IndexIO.resolve(spark, idxP)}/codes")}%d B" +
      f" vs float cells ${dirBytes(s"${graft.sources.IndexIO.resolve(spark, idx)}/cells")}%d B")

    // IVF×PQ: PQ codes inside IVF cells — the probe reads nProbe of
    // nCentroids cell DIRECTORIES of code bytes, so the candidate bytes
    // actually scanned are (nProbe/nCentroids) × the PQ code payload:
    // below flat PQ (which streams ALL codes past each query) AND below
    // the float/SQ8 cells. Report the probed-bytes estimate explicitly.
    val idxC = java.nio.file.Files.createTempDirectory("graft_ivfpq_check").toString
    val t6 = System.nanoTime()
    SimilaritySearch.buildIvfPqIndex(e, "vec_id", "embedding", idxC)
    val tBuildC = (System.nanoTime() - t6) / 1e9
    val resC = SimilaritySearch.searchIvfPq(spark, idxC, q, "vec_id", "embedding", 5)
    val t7 = System.nanoTime()
    val nC = resC.count()
    val tSearchC = (System.nanoTime() - t7) / 1e9
    val dppC = resC.queryExecution.executedPlan.toString.contains("dynamicpruning")
    val vdirC = graft.sources.IndexIO.resolve(spark, idxC)
    val cellBytesC = dirBytes(s"$vdirC/cells")
    // probed bytes: sum the nProbe=4 largest cell=* dirs as the worst case
    val probed = new java.io.File(s"$vdirC/cells").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(f => dirBytes(f.toString)).sorted.reverse.take(4).sum
    println(f"ivfpq: build=$tBuildC%.2fs search=$tSearchC%.2fs rows=$nC dpp=$dppC " +
      f"cells=$cellBytesC%d B probed(4 largest)=$probed%d B " +
      f"vs flat pq codes ${dirBytes(s"${graft.sources.IndexIO.resolve(spark, idxP)}/codes")}%d B")
    spark.stop()
  }
}
