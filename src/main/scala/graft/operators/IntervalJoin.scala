package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampNTZType, TimestampType}

/** Interval-overlap inner join: match rows whose [start, end] ranges
  * intersect (`l.start <= r.end AND r.start <= l.end`). The natural
  * two-sided generalization of the reference's one-sided band join
  * (fuzzy_join is the degenerate case `[v-tol, v+tol]` vs `[w, w]` —
  * pandance/pandance.py:22-208); interval joins themselves are outside
  * the reference's surface (SURVEY.md §2.4 band/interval row).
  *
  * == Spark-first design (scale notes) ==
  * A literal `join(overlap)` is a BroadcastNestedLoopJoin — O(n·m). We
  * grid the domain into buckets of `bucketWidth` and equi-join on the
  * bucket id. Each side explodes an interval to the buckets it touches
  * (`sequence(floor(start/w), floor(end/w))`), so shuffle volume is
  * O(n·len/w) per side, and Catalyst plans a shuffled hash join.
  *
  * Exactly-once without a distinct: a qualifying pair shares every bucket
  * in the intersection of its ranges; we keep the match only in the
  * bucket of `greatest(l.start, r.start)` — a bucket both sides provably
  * cover (overlap implies `max(start) <= min(end)`), so each pair
  * survives in exactly one bucket and the expensive `dropDuplicates`
  * shuffle disappears.
  *
  * `bucketWidth` tuning: ~ the typical interval length. Too small
  * explodes many buckets per interval; too large piles unrelated
  * intervals into one bucket (AQE skew-split softens, doesn't solve).
  */
object IntervalJoin {

  /** Numeric intervals. Output: left columns ++ right columns (collisions
    * suffixed); both `start <= end` per row are the caller's contract
    * (rows violating it never match, same as an empty interval).
    */
  def numeric(
      left: DataFrame, right: DataFrame,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      bucketWidth: Double,
      suffixes: (String, String) = ("_x", "_y")): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    join(left, right, leftStart, leftEnd, rightStart, rightEnd, suffixes,
      v => floor(v.cast(DoubleType) / lit(bucketWidth)).cast(LongType))
  }

  /** Timestamp intervals; bucketing on epoch microseconds. */
  def time(
      left: DataFrame, right: DataFrame,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      bucketWidth: java.time.Duration,
      suffixes: (String, String) = ("_x", "_y")): DataFrame = {
    val w = bucketWidth.toNanos / 1000L
    require(w > 0, s"bucketWidth must be >= 1 microsecond, got $bucketWidth")
    def check(df: DataFrame, c: String): Unit = df.schema(c).dataType match {
      case _: TimestampType | _: TimestampNTZType => ()
      case other => throw new IllegalArgumentException(
        s"interval column `$c` must be a timestamp type, got $other")
    }
    Seq(leftStart -> left, leftEnd -> left, rightStart -> right, rightEnd -> right)
      .foreach { case (c, df) => check(df, c) }
    // NTZ casts to TimestampType under the session zone (UTC for this
    // engine) before the epoch bucketing; exact long floor-div (double
    // division drifts once |epoch/width| nears 2^52)
    join(left, right, leftStart, leftEnd, rightStart, rightEnd, suffixes,
      v => graft.functions.LongMath.floorDiv(unix_micros(v.cast(TimestampType)), w))
  }

  private val BL = "__graft_iv_bl"
  private val BR = "__graft_iv_br"

  private def join(
      left: DataFrame, right: DataFrame,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      suffixes: (String, String),
      bucket: Column => Column): DataFrame = {
    Seq(leftStart, leftEnd).foreach(JoinSpec.requireColumn(left, _, "left"))
    Seq(rightStart, rightEnd).foreach(JoinSpec.requireColumn(right, _, "right"))
    val lf = left.filter(col(leftStart).isNotNull && col(leftEnd).isNotNull)
    val rf = right.filter(col(rightStart).isNotNull && col(rightEnd).isNotNull)

    // reuse the suffix machinery: resolve both bound columns through the
    // same rename pass
    val overlapNames = lf.columns.toSet intersect rf.columns.toSet
    def post(c: String, suf: String): String = if (overlapNames(c)) c + suf else c
    val (l, r, _) =
      JoinSpec.applySuffixes(lf, rf, JoinSpec.Cols(leftStart, rightStart), suffixes)
    val (ls, le) = (post(leftStart, suffixes._1), post(leftEnd, suffixes._1))
    val (rs, re) = (post(rightStart, suffixes._2), post(rightEnd, suffixes._2))

    val outCols = l.columns ++ r.columns
    val lb = l.withColumn(BL,
      explode(sequence(bucket(col(ls)), bucket(col(le)))))
    val rb = r.withColumn(BR,
      explode(sequence(bucket(col(rs)), bucket(col(re)))))
    val overlap = col(ls) <= col(re) && col(rs) <= col(le)
    val anchor = col(BL) === bucket(greatest(col(ls), col(rs)))
    lb.join(rb, col(BL) === col(BR) && overlap && anchor, "inner")
      .select(outCols.map(col).toIndexedSeq: _*)
  }
}
