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

  /** Hive-style partitioned parquet sink: one directory per partition
    * value, enabling partition pruning for every downstream reader.
    * Cardinality rule of thumb: partition columns with <= ~10k distinct
    * values (dates, categories), never high-cardinality keys.
    */
  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

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

  /** Sorted-within-partitions parquet sink: `repartition(keys)` +
    * `sortWithinPartitions(keys)` gives run-length/delta-friendly pages
    * and min-max row-group statistics that make key-range scans skip
    * row groups — the poor man's clustering index for parquet lakes.
    */
  def writeClustered(
      df: DataFrame, path: String, clusterCols: Seq[String], numFiles: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode(mode).parquet(path)
  }
}
