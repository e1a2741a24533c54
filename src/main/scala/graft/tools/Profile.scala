package graft.tools

import org.apache.spark.sql.SparkSession

/** Local profiling harness (not part of the driver contract): times the
  * named SparkEntry queries on a given SF dir, optionally printing the
  * formatted plan. Usage: runMain graft.tools.Profile <sfDir> q1,q2 [explain]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val explain = args.length > 2 && args(2) == "explain"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      if (explain) df.explain("formatted")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val cnt = df.count()
        println(f"[profile] $n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $cnt rows")
      }
    }
    spark.stop()
  }
}
