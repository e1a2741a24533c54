package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset splitting for
  * training-data pipelines. Random-seed sampling ties reproducibility to
  * one engine's RNG stream and partitioning; hashing the row's stable id
  * instead makes the SAME rows land in the SAME split on any engine, any
  * partitioning, any day — which is what dataset versioning, leak-free
  * train/val separation, and incremental reruns actually need.
  */
object Sampling {

  /** Stable bucket in [0, buckets): first 8 hex chars of md5 of the id's
    * string form. md5 is md5 everywhere — Spark, DuckDB, Python — so the
    * assignment is reproducible across engines (unlike xxhash64/`hash`,
    * whose seeds and algorithms differ).
    */
  def hashBucket(id: Column, buckets: Int): Column = {
    require(buckets > 0)
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % buckets
  }

  /** Keep a deterministic `fraction` of rows by id hash. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      buckets: Int = 10000): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction in [0,1], got $fraction")
    df.filter(hashBucket(col(idCol), buckets) < (fraction * buckets).toLong)
  }

  /** Append a `split` column: "test" gets the first `testPct` of hash
    * space, "val" the next `valPct`, "train" the rest. Stable under
    * re-partitioning and incremental appends — a row's split never
    * changes when the dataset around it does.
    */
  def trainValTest(df: DataFrame, idCol: String,
      valPct: Double = 0.1, testPct: Double = 0.1,
      buckets: Int = 10000, splitCol: String = "split"): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 1)
    val b = hashBucket(col(idCol), buckets)
    val testEdge = (testPct * buckets).toLong
    val valEdge = testEdge + (valPct * buckets).toLong
    df.withColumn(splitCol,
      when(b < testEdge, "test").when(b < valEdge, "val").otherwise("train"))
  }

  /** Per-stratum deterministic downsampling: keep `fractions(stratum)`
    * of each stratum's rows (default fraction for unlisted strata), by
    * id hash — the class-rebalancing primitive, reproducible across
    * engines like everything above.
    */
  def stratifiedHashSample(
      df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 1.0,
      buckets: Int = 10000): DataFrame = {
    val b = hashBucket(col(idCol), buckets)
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(b < (frac * buckets).cast("long"))
  }

  /** At most `n` rows per group, chosen DETERMINISTICALLY by md5-of-id
    * order (ties impossible: ids are distinct; the hash order is a
    * stable, engine-portable "random" order, so the cap is an unbiased
    * sample that never changes across runs or engines). The dominant
    * corpus-curation primitive — "at most N documents per domain" —
    * planned as `row_number` over (group, hash): Spark's rank-limit
    * pushdown (`WindowGroupLimit`) keeps only n rows per group per
    * partition BEFORE the shuffle, so a 100 TB corpus with a billion-doc
    * domain never materializes that domain's full candidate list.
    */
  def cappedPerGroup(
      df: DataFrame, groupCol: String, idCol: String, n: Int): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")))
    df.withColumn("__graft_capn", row_number().over(w))
      .filter(col("__graft_capn") <= n)
      .drop("__graft_capn")
  }
}
