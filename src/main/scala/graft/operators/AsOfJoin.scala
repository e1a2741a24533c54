package graft.operators

import java.time.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** As-of join: for every left row, the single nearest right row on a
  * timestamp column, within an optional tolerance. A natural extension of
  * the reference's band join (`fuzzy_join` returns ALL matches in the
  * band, pandance/pandance.py:22-208; as-of keeps the best one —
  * SURVEY.md §2.4 flags it as the adjacent operator the reference lacks).
  *
  * Direction:
  *  - "nearest": smallest `|l.ts - r.ts| <= tol`
  *  - "backward": largest r.ts with `l.ts - tol <= r.ts <= l.ts`
  *  - "forward":  smallest r.ts with `l.ts <= r.ts <= l.ts + tol`
  *
  * Ties break deterministically: smaller |Δ| first, then earlier right
  * timestamp, then smallest `rightId`.
  *
  * == Scale design ==
  * Same bucketed-equi-join rewrite as [[FuzzyJoin]] (candidates land in
  * adjacent `floor(epoch_us / tol)` buckets), then a per-left-row window
  * (`row_number` over the left row id) keeps the best candidate. Both
  * stages are shuffle-partitioned: candidates per left row are bounded by
  * the band width, so the window partitions are tiny and skew-free.
  */
object AsOfJoin {

  private val RID = "__graft_asof_rowid"
  private val DELTA = "__graft_asof_delta"

  def time(
      left: DataFrame,
      right: DataFrame,
      tol: Duration,
      rightId: String,
      on: Option[String] = None,
      leftOn: Option[String] = None,
      rightOn: Option[String] = None,
      direction: String = "nearest",
      suffixes: (String, String) = ("_x", "_y")): DataFrame = {
    require(Set("nearest", "backward", "forward")(direction),
      s"direction must be nearest|backward|forward, got $direction")
    val tolUs = tol.toNanos / 1000L
    require(tolUs > 0, s"tolerance must be >= 1 microsecond, got $tol")
    val cols = JoinSpec.resolve(on, leftOn, rightOn)
    JoinSpec.requireColumn(left, cols.leftCol, "left")
    JoinSpec.requireColumn(right, cols.rightCol, "right")

    val lf = left.filter(col(cols.leftCol).isNotNull).withColumn(RID, monotonically_increasing_id())
    val rf = right.filter(col(cols.rightCol).isNotNull)
    val (l, r, c) = JoinSpec.applySuffixes(lf, rf, cols, suffixes)
    val ridCol = if (l.columns.contains(RID)) RID else RID + suffixes._1
    val idOut = if (r.columns.contains(rightId)) rightId else rightId + suffixes._2

    def bucket(v: org.apache.spark.sql.Column) =
      graft.functions.LongMath.floorDiv(unix_micros(v), tolUs)
    val signedDelta = unix_micros(col(c.leftCol)) - unix_micros(col(c.rightCol))
    val inBand = direction match {
      case "nearest"  => abs(signedDelta) <= lit(tolUs)
      case "backward" => signedDelta >= lit(0) && signedDelta <= lit(tolUs)
      case "forward"  => signedDelta <= lit(0) && -signedDelta <= lit(tolUs)
    }

    val lb = l.withColumn("__graft_bl", bucket(col(c.leftCol)))
    val rb = r.withColumn("__graft_br",
      explode(array(bucket(col(c.rightCol)) - 1, bucket(col(c.rightCol)), bucket(col(c.rightCol)) + 1)))
    val cands = lb
      .join(rb, col("__graft_bl") === col("__graft_br") && inBand, "inner")
      .withColumn(DELTA, abs(signedDelta))

    val w = Window
      .partitionBy(col(ridCol))
      .orderBy(col(DELTA).asc, unix_micros(col(c.rightCol)).asc, col(idOut).asc)
    val outCols = (l.columns.filterNot(_ == ridCol) ++ r.columns).map(col).toIndexedSeq
    cands
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .select(outCols: _*)
  }
}
