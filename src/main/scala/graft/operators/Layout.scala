package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning: Z-order (Morton)
  * clustering, so parquet row-group / file min-max stats stay narrow on
  * EVERY interleaved dimension at once and a predicate on any of them
  * skips most of a 100 TB table.
  *
  * Sorting by `(a, b)` gives perfect pruning on `a` and none on `b`;
  * interleaving the bits of both into one sort key gives ~√ pruning on
  * each — the standard lakehouse layout trick (Delta/Iceberg `ZORDER
  * BY`), here as a plain DataFrame transform: bucketize each dimension
  * to `bits` bits with exact min-max affine scaling, interleave, range-
  * repartition + sort within partitions by the interleaved key.
  *
  * Everything is exact integer arithmetic (affine scaling is integral
  * `(v − min)·(2^bits − 1) div max(1, max − min)`; interleaving is
  * shifts and masks), so the key — and therefore the layout — is
  * engine-reproducible bit for bit.
  *
  * Scale shape: one slim min-max aggregate per write (a 1-row
  * crossJoin broadcast back into the scan projection — the corpusReport
  * pattern), then ONE range exchange on the z key and a partition-local
  * sort. No global sort, no window, no second pass over the data.
  *
  * Relationship to [[graft.sources.Sources.writeZOrdered]]: same curve,
  * different bucketizer. That sink rank-normalizes dimensions through
  * sampled quantiles (skew-robust, any numeric type, sample-dependent
  * boundaries); this operator scales integral dimensions by exact
  * min-max arithmetic in pure codegen — bit-for-bit engine-reproducible
  * (the `zorder_orders` oracle), and the z key stays available as a
  * query-able column rather than being dropped at the sink.
  */
object Layout {

  /** Interleaved Morton code of already-bucketized dimensions: bit `i`
    * of `cols(c)` lands at output bit `i·n + c` (n = number of
    * dimensions). Inputs must be non-negative longs < 2^bits — the
    * contract [[minMaxBuckets]] produces. Static expansion to
    * `n·bits` shift-mask-or terms: pure codegen arithmetic, no UDF,
    * no loop at runtime.
    */
  def zorderValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zorderValue: no columns")
    require(bits > 0, s"zorderValue: bits must be positive, got $bits")
    require(cols.size * bits <= 63,
      s"zorderValue: ${cols.size} dims x $bits bits exceeds a signed long")
    val n = cols.size
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftright(c, i).bitwiseAND(lit(1L)) * lit(1L << (i * n + ci))
    terms.reduce(_ + _)
  }

  /** Exact min-max bucketization of integral dimensions onto
    * `[0, 2^bits)`: appends `<col>_zb` bucket columns computed as
    * `(v − min)·(2^bits − 1) div max(1, max − min)` against the
    * dataset-wide min/max (one slim aggregate, broadcast back via a
    * 1-row crossJoin). Integral inputs only — cast dates to epoch days
    * and timestamps to epoch seconds first. Null dimension values
    * normalize to the min (bucket 0), matching
    * [[graft.sources.Sources.writeZOrdered]], so null-dim rows cluster
    * at the curve origin instead of collecting in one null-key range
    * partition; an all-null dimension keeps null buckets (there is no
    * min to land on). The documented contract that
    * `(max − min)·(2^bits − 1)` fits a signed long is ENFORCED at run
    * time — a spread past ~1.4·10¹⁴ at 16 bits raises instead of
    * silently wrapping into a garbage layout.
    */
  def minMaxBuckets(df: DataFrame, valueCols: Seq[String], bits: Int = 16): DataFrame = {
    require(valueCols.nonEmpty, "minMaxBuckets: no columns")
    require(bits > 0 && bits <= 31, s"minMaxBuckets: bits out of range, got $bits")
    valueCols.foreach { c =>
      require(!df.columns.contains(s"${c}_zb"),
        s"minMaxBuckets: output column ${c}_zb collides with an input column")
    }
    val aggs = valueCols.flatMap { c =>
      Seq(min(col(c).cast("long")).as(s"__mn_$c"),
        max(col(c).cast("long")).as(s"__mx_$c"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val scale = (1L << bits) - 1L
    val bucketed = valueCols.foldLeft(df.crossJoin(broadcast(stats))) { (acc, c) =>
      val bucket = expr(
        s"((coalesce(CAST(`$c` AS BIGINT), `__mn_$c`) - `__mn_$c`) * ${scale}L) " +
          s"div greatest(1L, `__mx_$c` - `__mn_$c`)")
      // the guard compares two broadcast scalars per row (folds to a
      // compare in codegen); coalesce keeps an all-null dimension
      // on the null-bucket path instead of tripping the overflow
      // branch. The spread is computed in DOUBLE: a long `mx - mn`
      // would itself wrap negative past 2^63 (near-full-range hash
      // dims under non-ANSI sessions) and the wrapped value would
      // PASS a long compare — doubles cannot wrap. Each long→double
      // cast rounds by up to ulp/2 ≈ 512 near 2^63, so the threshold
      // is tightened by 4096 (> the 1024 worst-case combined error):
      // a spread inside that margin above Long.MaxValue/scale raises
      // instead of slipping past the rounded compare and wrapping in
      // the bucket arithmetic downstream. The 4096 slack only rejects
      // spreads within 2^-50 of the true limit — noise next to the
      // ~1.4e14 threshold at 16 bits.
      acc.withColumn(s"${c}_zb",
        when(coalesce(
            col(s"__mx_$c").cast("double") - col(s"__mn_$c").cast("double")
              <= lit((Long.MaxValue / scale - 4096L).toDouble),
            lit(true)), bucket)
          .otherwise(raise_error(lit(
            s"minMaxBuckets: spread of $c times (2^$bits - 1) overflows a " +
              "signed long — use fewer bits or pre-scale the dimension"))
            .cast("long")))
    }
    bucketed.drop(valueCols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c")): _*)
  }

  /** Z-order layout: bucketize `valueCols`, interleave into a
    * `zvalue` column, range-repartition into `outPartitions` and sort
    * within each — ready to `.write.parquet(...)`, one file span per
    * z range. Keeps `zvalue` (and drops the bucket temporaries) so
    * callers and specs can audit the clustering.
    */
  def zorderLayout(
      df: DataFrame, valueCols: Seq[String],
      bits: Int = 16, outPartitions: Int = 0): DataFrame = {
    require(!df.columns.contains("zvalue"),
      "zorderLayout: output column zvalue collides with an input column")
    val bucketed = minMaxBuckets(df, valueCols, bits)
    val z = bucketed.withColumn("zvalue",
        zorderValue(valueCols.map(c => col(s"${c}_zb")), bits))
      .drop(valueCols.map(c => s"${c}_zb"): _*)
    val parted =
      if (outPartitions > 0) z.repartitionByRange(outPartitions, col("zvalue"))
      else z.repartitionByRange(col("zvalue"))
    parted.sortWithinPartitions(col("zvalue"))
  }
}
