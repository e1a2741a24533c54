package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FrequentItemsAggregator

/** Reusable sketch operators (the approximate-percentile and HLL
  * distinct sketches ride Spark built-ins directly in the query layer;
  * the ones here need custom aggregation).
  */
object Sketches {

  /** EXACT heavy hitters via a two-pass sketch plan: all values whose
    * count strictly exceeds `totalCount / threshold` (e.g. threshold =
    * 100 → items above 1% frequency), returned as `(value, cnt)` with
    * exact counts.
    *
    *  1. CANDIDATES: one scan folded through the k-counter Misra–Gries
    *     [[FrequentItemsAggregator]] (`k = 2 × threshold`, so the
    *     deterministic guarantee `misses nothing above n/(k+1)` covers
    *     the `n/threshold` cutoff with margin). Map-side partial
    *     aggregation means only k-entry maps cross the shuffle — never
    *     the full distinct-value set.
    *  2. RECOUNT: a second scan counts ONLY the <= k candidate values
    *     (driver-held, broadcast in an `isin` filter — the same bounded
    *     `collect` contract as the IVF centroids) and keeps those above
    *     the cutoff. Counts are exact, so the result equals the full
    *     `GROUP BY HAVING` — which is how the oracle checks it — while
    *     shuffling only the heavy keys.
    *
    * At 100 TB: two scans, both with k-bounded shuffle. The exact
    * `groupBy` alternative shuffles every distinct value once.
    */
  def heavyHitters(
      df: DataFrame, valueCol: Column, threshold: Int): DataFrame = {
    require(threshold >= 2, s"threshold must be >= 2, got $threshold")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(valueCol.cast("string").as("value"))
      .filter(col("value").isNotNull).as[String]
    val k = 2 * threshold
    // one scan yields candidates AND the exact stream length
    val summary = vals
      .select(new FrequentItemsAggregator(k).toColumn)
      .head()
    val candidates = summary.counts.keys.toSeq
    if (candidates.isEmpty) return vals.toDF()
      .groupBy(col("value")).agg(count(lit(1)).as("cnt")).limit(0)
    vals.toDF()
      .filter(col("value").isin(candidates: _*))
      .groupBy(col("value"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > summary.n.toDouble / threshold)
  }
}
