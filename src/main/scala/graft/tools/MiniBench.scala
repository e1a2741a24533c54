package graft.tools

import org.apache.spark.sql.SparkSession

/** Bench-methodology timing for a NAMED SUBSET of queries — the
  * optimization loop's fast inner measurement (the full `graft.Bench`
  * pass over 240 rows costs ~an hour; re-measuring the three rows an
  * operator change touches should not). Replicates Bench exactly:
  * same session config (local[$SPARK_GRAFT_CPUS], shuffle partitions =
  * cpus, AQE on, GraftExtensions), same sf0.001 warmup pass, then
  * `passes` timed construction+count passes interleaved across the
  * whole subset, reporting per-query median/min/max and all samples.
  *
  * Usage: runMain graft.tools.MiniBench <sfDir> q1,q2,... [passes]
  */
object MiniBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val allFns = graft.SparkEntry.queries ++ graft.SparkEntry.benchServe
    val known = names.filter(allFns.contains)
    names.diff(known).foreach(n => System.err.println(s"[minibench] unknown: $n"))
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      known.foreach { n =>
        try allFns(n)(spark, warmDir).count()
        catch { case _: Throwable => () }
      }
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    (1 to passes).foreach { p =>
      known.foreach { n =>
        spark.sparkContext.setJobDescription(s"minibench $n pass $p")
        val t0 = System.nanoTime()
        try {
          allFns(n)(spark, sfDir).count()
          val s = (System.nanoTime() - t0) / 1e9
          samples(n) = samples.getOrElse(n, Nil) :+ s
        } catch { case e: Throwable =>
          System.err.println(s"[minibench] $n failed: $e")
        }
      }
    }
    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    known.foreach { n =>
      samples.get(n).foreach { ss =>
        val all = ss.map(x => f"$x%.2f").mkString(",")
        println(f"[minibench] $n med=${median(ss)}%.2f min=${ss.min}%.2f " +
          f"max=${ss.max}%.2f samples=[$all]")
      }
    }
    spark.stop()
  }
}
