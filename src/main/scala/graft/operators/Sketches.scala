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

  /** Embedding DISTRIBUTION-SHIFT monitor: cosine between the mean
    * vectors of two snapshots — the one-number drift signal that tells
    * an incremental pipeline "this crawl's embedding distribution
    * moved; re-examine the ANN index / classifier thresholds" before
    * anything downstream degrades quietly. Near 1.0 = stable; falling
    * = drift.
    *
    * Engine-exact by construction: each component is floored onto an
    * exact 1e-7 grid long FIRST, per-dimension sums run over exact
    * longs (order-free — no double-summation nondeterminism across
    * partitions, runs, or engines), and the cosine of the mean vectors
    * equals the cosine of the grid SUM vectors (the `1/(grid·n)` scale
    * factors cancel), so the final value is a fixed IEEE expression
    * over exact integers — `Σ sa·sb / (√Σsa² · √Σsb²)` in BigInt on
    * the driver, int128 in the SQL oracle. The only shuffle carries
    * one `(dim, sumA, sumB)` row per dimension; the collect is
    * dim-bounded.
    *
    * Output: one row `(n_a, n_b, cos_means)` (cosine floored to the
    * 1e-4 grid). Empty or zero-vector sides are contract errors.
    */
  def embeddingDrift(a: DataFrame, b: DataFrame, vecCol: String): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    def sums(df: DataFrame): (Long, Map[Int, BigInt]) = {
      // malformed inputs FAIL instead of skewing the measurement: a
      // NaN casts to grid 0 (non-ANSI double->long) and a null
      // component silently drops out of its dimension's sum — both
      // would move cos_means with no signal that the CORPUS, not the
      // distribution, changed. Null vectors would vanish in the
      // explode, so they're counted against the total on one pass.
      val counts = df.agg(
        count(lit(1)).as("__n"), count(col(vecCol)).as("__nv")).collect()(0)
      require(counts.getLong(0) == counts.getLong(1),
        s"embeddingDrift: ${counts.getLong(0) - counts.getLong(1)} null vectors")
      val rows = df
        .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("__d", "__v")))
        .select(col("__d"),
          when(col("__v").isNull || isnan(col("__v")) ||
              col("__v") === Double.PositiveInfinity ||
              col("__v") === Double.NegativeInfinity, lit(1L))
            .otherwise(lit(0L)).as("__bad"),
          floor(col("__v") * lit(1.0e7)).cast("long").as("__g"))
        .groupBy("__d")
        .agg(sum(col("__g")).as("__s"), sum(col("__bad")).as("__b"))
        .collect()
      val bad = rows.map(_.getLong(2)).sum
      require(bad == 0,
        s"embeddingDrift: $bad null/NaN/Inf vector components")
      (counts.getLong(0), rows.map(r => r.getInt(0) -> BigInt(r.getLong(1))).toMap)
    }
    val (nA, sa) = sums(a)
    val (nB, sb) = sums(b)
    require(nA > 0 && nB > 0, "embeddingDrift: empty snapshot")
    require(sa.keySet == sb.keySet, {
      val onlyA = (sa.keySet -- sb.keySet).toSeq.sorted.take(8)
      val onlyB = (sb.keySet -- sa.keySet).toSeq.sorted.take(8)
      s"embeddingDrift: dimension key mismatch — a-only dims $onlyA, " +
        s"b-only dims $onlyB (|a|=${sa.size}, |b|=${sb.size})"
    })
    val dims = sa.keys.toSeq.sorted
    val num = dims.map(d => sa(d) * sb(d)).sum
    val da = dims.map(d => sa(d) * sa(d)).sum
    val db = dims.map(d => sb(d) * sb(d)).sum
    require(da > 0 && db > 0, "embeddingDrift: zero mean vector")
    val cos = num.toDouble / (math.sqrt(da.toDouble) * math.sqrt(db.toDouble))
    Seq((nA, nB, math.floor(cos * 10000) / 10000))
      .toDF("n_a", "n_b", "cos_means")
  }

  /** Pairwise drift MATRIX across groups — which sources' embedding
    * distributions agree and which have diverged, in one pass: a
    * per-group exact grid-long sum vector
    * ([[graft.functions.GridSumAggregator]], the [[embeddingDrift]]
    * arithmetic keyed by `groupCol`), then the cosine of every group
    * pair on the driver. Output one row per unordered pair
    * `(group_a, group_b, n_a, n_b, cos_means)` with `group_a <
    * group_b` (string order) and the cosine on the 1e-4 grid — the
    * corpus-observability view a mixing recipe is tuned against.
    *
    * Scale shape: ONE aggregation whose state is a `long[dim]` + count
    * per GROUP (map-side merged); the collect is `#groups` rows
    * (guarded), the pairwise loop `#groups²` driver-side BigInt dot
    * products — groups are sources/domains-buckets, a small constant
    * next to the corpus. Same malformed-input contract as the
    * aggregator (null/NaN/Inf fail loudly).
    */
  def embeddingDriftByGroup(df: DataFrame, groupCol: String, vecCol: String,
      maxGroups: Int = 1000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val gridSum =
      org.apache.spark.sql.functions.udaf(new graft.functions.GridSumAggregator())
    val gcount = df.select(col(groupCol)).distinct().count()
    require(gcount >= 2 && gcount <= maxGroups,
      s"embeddingDriftByGroup: $gcount groups (need 2..$maxGroups)")
    val rows = df
      .groupBy(col(groupCol).cast("string").as("__g"))
      .agg(gridSum(col(vecCol).cast("array<double>")).as("__s"),
        count(lit(1)).as("__n"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toArray, r.getLong(2)))
      .sortBy(_._1)
    val out = for {
      i <- rows.indices; j <- (i + 1) until rows.length
    } yield {
      val (ga, sa, na) = rows(i)
      val (gb, sb, nb) = rows(j)
      (ga, gb, na, nb,
        graft.functions.GridSumAggregator.cosFloored(sa.toSeq, sb.toSeq))
    }
    out.toDF(groupCol + "_a", groupCol + "_b", "n_a", "n_b", "cos_means")
  }

  private def gridCos(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftInternals.{toColumn, toExpression}
    toColumn(graft.functions.GridCosExpr(toExpression(a), toExpression(b)))
  }

  /** The 1e-7-grid long form of a vector — the per-row twin of
    * [[graft.functions.GridSumAggregator]]'s accumulation (identical
    * `floor(v * 1e7)` per component, so a doc's grid vector and the
    * centroid sums live on the SAME grid).
    */
  private def gridVec(v: Column): Column =
    transform(v.cast("array<double>"), x => floor(x * lit(1.0e7)))

  /** Per-group exact grid centroid SUMS — the trainable artifact of
    * the outlier monitors: `(group, centroid: array<bigint>, n_docs)`,
    * one row per group, broadcast-sized. The SUM vector is
    * proportional to the mean, and cosine is scale-invariant, so
    * scoring against the sum IS scoring against the mean with no
    * division anywhere (the [[embeddingDrift]] exactness trick).
    * Malformed vectors (null / NaN / ±Inf / dimension drift) FAIL the
    * aggregation rather than skewing the centroid.
    */
  def embeddingCentroids(df: DataFrame, groupCol: String,
      vecCol: String): DataFrame = {
    val gridSum =
      org.apache.spark.sql.functions.udaf(new graft.functions.GridSumAggregator())
    df.groupBy(col(groupCol))
      .agg(gridSum(col(vecCol).cast("array<double>")).as("centroid"),
        count(lit(1)).as("n_docs"))
  }

  /** Embedding OUTLIERS: rows whose exact grid cosine to their own
    * group's centroid is at or below `maxCos` — mislabeled documents,
    * embedding-pipeline glitches, and off-topic contamination inside a
    * source, the per-document drill-down of the group-level
    * [[embeddingDriftByGroup]] matrix. Output
    * `(<idCol>, <groupCol>, cos_centroid)`.
    *
    * Engine-exact end to end: centroids are exact grid-long sums, the
    * doc vector is floored onto the identical grid, and
    * [[graft.functions.GridCosExpr]] evaluates BigInt dot products
    * cast to double once, floored onto the 1e-4 grid — no
    * summation-order or knife-edge hazard. Scale shape: ONE
    * partial-aggregable groupBy (|groups| rows out), a broadcast join
    * of that one-row-per-group table back into the scan, and a
    * per-row codegen kernel; the doc itself is part of its group's
    * centroid (leave-one-in — deterministic and one-pass).
    */
  def embeddingOutliers(df: DataFrame, groupCol: String, idCol: String,
      vecCol: String, maxCos: Double): DataFrame = {
    require(!df.columns.exists(
        Seq("centroid", "n_docs", "cos_centroid", "__gv").contains),
      "embeddingOutliers: input must not carry centroid/n_docs/cos_centroid/__gv")
    df.select(col(idCol), col(groupCol), gridVec(col(vecCol)).as("__gv"))
      .join(broadcast(embeddingCentroids(df, groupCol, vecCol)), Seq(groupCol))
      .withColumn("cos_centroid", gridCos(col("__gv"), col("centroid")))
      .filter(col("cos_centroid") <= maxCos)
      .select(col(idCol), col(groupCol), col("cos_centroid"))
  }

  /** The INGEST-GATE form: keep rows whose cosine to their group's
    * REFERENCE centroid ([[embeddingCentroids]] artifact) is at least
    * `minCos` — a stateless stream-static broadcast join + one per-row
    * kernel, no aggregation over the stream, no state store. Groups
    * unseen in the reference pass through unchanged.
    */
  def filterByCentroidCosine(df: DataFrame, groupCol: String,
      vecCol: String, centroids: DataFrame, minCos: Double): DataFrame = {
    require(!df.columns.exists(
        Seq("centroid", "n_docs", "__cos").contains),
      "filterByCentroidCosine: input must not carry centroid/n_docs/__cos")
    df.join(broadcast(centroids), Seq(groupCol), "left")
      .withColumn("__cos",
        when(col("centroid").isNull, lit(null))
          .otherwise(gridCos(gridVec(col(vecCol)), col("centroid"))))
      .filter(col("__cos").isNull || col("__cos") >= minCos)
      .drop("centroid", "n_docs", "__cos")
  }
}
