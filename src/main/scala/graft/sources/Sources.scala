package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface. The reference has no I/O layer at all (callers
  * hand it in-memory frames — SURVEY.md §2.4 "Scans: none"), so this is
  * the engine-side contract a 100 TB pipeline actually needs: schema-
  * explicit readers (inference is a full extra pass over the data at
  * scale) and partitioned columnar sinks.
  */
object Sources {

  /** Parquet scan. Predicate pushdown and column pruning reach the
    * row-group level for free — verify with
    * `df.explain("formatted")` → `PushedFilters`, `ReadSchema`.
    */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV with an explicit schema (never infer at scale: inference reads
    * the data twice and silently widens types).
    */
  def csv(
      spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** JSON-lines with an explicit schema. Unlisted fields are pruned at
    * parse time (Jackson never materializes them), so a 50-field log line
    * projected to 3 columns parses ~3 columns.
    */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC with an explicit schema — the other columnar lake format a
    * 100 TB pipeline meets (Hive-era lakes are ORC). Spark's native
    * vectorized ORC reader gives the same pushdown/pruning contract as
    * parquet: predicates reach stripe/row-group indexes, unprojected
    * columns are never decoded.
    */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Hive-style partitioned parquet sink: one directory per partition
    * value, enabling partition pruning for every downstream reader.
    * Cardinality rule of thumb: partition columns with <= ~10k distinct
    * values (dates, categories), never high-cardinality keys.
    */
  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** TOKEN-BALANCED training-shard sink: every row gets its shard from
    * [[graft.operators.Sampling.assignTokenShards]] (≈ `shardTokens`
    * tokens per shard, whole docs, deterministic md5 order), rows are
    * repartitioned BY the shard id so each shard is one output task,
    * and the sink writes `shard=N/` directories the trainer's loader
    * can consume file-per-shard. This is the writer row-count
    * partitioning can't replace: with skewed doc lengths, equal-count
    * files drift 2-4× in token mass, and the loader's steps-per-file
    * assumption breaks.
    */
  def writeTokenShards(
      df: DataFrame, path: String, idCol: String,
      tokens: org.apache.spark.sql.Column, shardTokens: Long,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions.col
    graft.operators.Sampling.assignTokenShards(df, idCol, tokens, shardTokens)
      .repartition(col("shard"))
      .write.mode(mode).partitionBy("shard").parquet(path)
  }

  /** Bucketed table sink: rows hash-partitioned into `numBuckets` files
    * per partition by `bucketCols` and sorted within each bucket.
    * Joins/aggregations between tables bucketed the same way on the same
    * keys skip the shuffle entirely (no Exchange in the plan) — THE
    * mechanism for repeated co-located joins over a shared key at scale.
    * Bucketing metadata lives in the session catalog, so readers go
    * through `spark.table(name)`.
    */
  def writeBucketed(
      df: DataFrame, table: String, bucketCols: Seq[String], numBuckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Range-clustered parquet sink: `repartitionByRange(keys)` +
    * `sortWithinPartitions(keys)` gives each FILE a contiguous,
    * non-overlapping key range (tight file-level min-max for file
    * skipping), run-length/delta-friendly pages, and row-group
    * statistics that make key-range scans skip row groups — the poor
    * man's clustering index for parquet lakes. (A hash `repartition`
    * would co-locate equal keys too, but every file would span the full
    * key range and file-level pruning would never fire.) Equal keys
    * still land in one partition — range partitioning never splits a
    * key.
    */
  def writeClustered(
      df: DataFrame, path: String, clusterCols: Seq[String], numFiles: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode(mode).parquet(path)
  }

  /** Z-ORDER clustered parquet sink: rows are laid out along a Morton
    * curve over `zCols`, so every file's min-max box is tight in EVERY
    * clustered dimension — one layout serves range scans on any of
    * them. [[writeClustered]] on `(a, b)` prunes only queries that
    * constrain `a`; a `b`-only predicate reads every file. At 100 TB
    * the difference is the whole scan.
    *
    * Mechanics:
    *  1. each dimension is rank-normalized to `bitsPerDim` bits through
    *     its own sampled quantiles (`approxQuantile`, driver-held
    *     boundaries — robust to skew, where min-max linear scaling
    *     collapses);
    *  2. per row, the dimension buckets' bits interleave into one long
    *     z-value. This is a Scala UDF by design: the boundary arrays
    *     are closure state a codegen expression cannot hold, and the
    *     write path evaluates it exactly once per row — the projection-
    *     collapse re-evaluation hazard that disqualifies UDFs in query
    *     paths does not apply;
    *  3. `repartitionByRange` on the z-value + a within-partition sort,
    *     so both FILES and row groups tile the curve.
    *
    * Timestamp/date dimensions normalize via their epoch value; nulls
    * sort first (bucket 0 in every dimension).
    *
    * Relationship to [[graft.operators.Layout]]: same curve, different
    * bucketizer. Layout.zorderLayout scales each dimension by exact
    * integral min-max arithmetic in a codegen expression — engine-
    * reproducible bit for bit (the `zorder_orders` oracle), but a
    * single outlier stretches its buckets. This sink rank-normalizes
    * through sampled quantiles instead — robust to skew and usable on
    * any numeric/timestamp column, at the cost of sample-dependent
    * (not engine-exact) bucket boundaries. Write path: either. Query
    * path / reproducible layout keys: Layout.
    */
  def writeZOrdered(
      df: DataFrame, path: String, zCols: Seq[String], numFiles: Int,
      bitsPerDim: Int = 12,
      saveMode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions._
    require(zCols.size >= 2, "z-ordering needs >= 2 dimensions (use writeClustered for 1)")
    require(zCols.size * bitsPerDim <= 63,
      s"${zCols.size} dims x $bitsPerDim bits exceeds one long")
    val buckets = 1 << bitsPerDim
    val numeric = zCols.map { c =>
      val e = df.schema(c).dataType match {
        case _: org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
        case _: org.apache.spark.sql.types.DateType => col(c).cast("long")
        case _ => col(c)
      }
      e.cast("double")
    }
    val tmpNames = zCols.indices.map(i => s"__graft_zd$i")
    val widened = df.withColumns(tmpNames.zip(numeric).toMap)
    // sampled quantile cut points per dimension (driver-held: at most
    // dims x 2^bits doubles — the same bounded-collect contract as the
    // IVF centroids)
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds: Array[Array[Double]] =
      tmpNames.map(n => widened.stat.approxQuantile(n, probes, 0.001)).toArray
    val nDims = zCols.size
    val bits = bitsPerDim
    val zOf = udf { (vs: Seq[java.lang.Double]) =>
      var z = 0L
      var i = 0
      while (i < nDims) {
        val v = if (vs(i) == null) Double.NegativeInfinity else vs(i).doubleValue()
        val bs = bounds(i)
        // first cut point > v == the bucket index (nulls -> 0)
        var lo = 0
        var hi = bs.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (bs(mid) <= v) lo = mid + 1 else hi = mid
        }
        var j = 0
        while (j < bits) {
          z |= ((lo.toLong >> j) & 1L) << (j * nDims + i)
          j += 1
        }
        i += 1
      }
      z
    }
    widened
      .withColumn("__graft_z", zOf(array(tmpNames.map(col): _*)))
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
      .drop(tmpNames: _*)
      .write.mode(saveMode).parquet(path)
  }
}
