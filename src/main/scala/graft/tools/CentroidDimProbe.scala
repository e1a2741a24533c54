package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Validates `trainCentroids`' per-cell mean aggregation at REALISTIC
  * embedding dims (the sf testdata uses small vectors; production
  * embeddings are 768-1536-dim): the Lloyd pass aggregates d `sum`
  * columns per cell, and at d in the thousands the generated
  * HashAggregate code could exceed the JVM's 64KB method limit and
  * fall back out of whole-stage codegen — silently turning every
  * k-means pass interpreted (round-18 verdict #4).
  *
  * The probe builds a synthetic corpus at each dim, runs the exact
  * aggregate shape trainCentroids emits, times it, and reports whether
  * the executed plan kept WholeStageCodegen around the HashAggregate.
  *
  * Usage: runMain graft.tools.CentroidDimProbe [rows] [dims,dims,...]
  */
object CentroidDimProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(20000)
    val dims = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(64, 256, 768, 1536))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (dim <- dims) {
      // deterministic synthetic vectors; 16 cells like the ivf defaults
      val c = spark.range(rows.toLong).select(
        col("id").as("neighbor_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => (pmod(col("id") * lit(31) + i.cast("long"), lit(997)))
            .cast("double") / lit(997.0)).as("__cv"),
        pmod(col("id"), lit(16)).cast("int").as("__cell"))
        .localCheckpoint(true)
      val sums = (0 until dim).map(i => sum(col("__cv")(i)).as(s"__s$i"))
      val agg = c.groupBy(col("__cell")).agg(count(lit(1)).as("__n"), sums: _*)
      val t0 = System.nanoTime()
      val out = agg.collect()
      val secs = (System.nanoTime() - t0) / 1e9
      // inspect the EXECUTED plan: is the final HashAggregate inside a
      // WholeStageCodegen span, and did codegen compile at all?
      val executed = agg.queryExecution.executedPlan.toString
      val aggInWsc = executed.linesIterator.exists(l =>
        l.contains("HashAggregate") && l.contains("*("))
      // the fixed-size array-aggregate form trainCentroids uses past
      // the codegen field limit — time it and check the sums agree
      val vecSumCount = udaf(new graft.functions.VecSumCountAggregator())
      val agg2 = c.groupBy(col("__cell")).agg(vecSumCount(col("__cv")).as("__sc"))
        .select(col("__cell"), col("__sc._1").as("__sums"), col("__sc._2").as("__n"))
      val t1 = System.nanoTime()
      val out2 = agg2.collect()
      val secs2 = (System.nanoTime() - t1) / 1e9
      val colSums = out.map(r =>
        r.getInt(0) -> (0 until dim).map(i => r.getDouble(2 + i)).toVector).toMap
      val arrSums = out2.map(r =>
        r.getInt(0) -> r.getSeq[Double](1).toVector).toMap
      val same = colSums.keySet == arrSums.keySet &&
        colSums.forall { case (k, v) => arrSums(k) == v }
      println(f"[probe] dim=$dim%5d rows=$rows cells=${out.length}%3d " +
        f"dColumnAgg=$secs%6.2fs (codegen=$aggInWsc) arrayAgg=$secs2%6.2fs " +
        f"sumsBitIdentical=$same")
      // plan evidence at the first realistic dim: the d-column form's
      // HashAggregate outside codegen vs the array aggregate
      if (dim == 768) {
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get("plans/r19"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("plans/r19/centroid_lloyd_d768_before.txt"),
          agg.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("plans/r19/centroid_lloyd_d768_after.txt"),
          agg2.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
