package graft.operators

import java.time.Duration

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fuzzy (band / tolerance) inner join: match rows where
  * `abs(left.col - right.col) <= tol` on one numeric, timestamp, or
  * decimal column per side.
  *
  * Reference semantics (pandance/pandance.py:22-208):
  *  - inclusive tolerance in both directions (pandance/pandance.py:29);
  *  - join type is always INNER;
  *  - rows whose join value is NULL/NaN/±Inf are silently dropped
  *    (pandance/pandance.py:296-312);
  *  - duplicate values on both sides produce the full M×N pair expansion;
  *  - output = left columns ++ right columns, collisions suffixed.
  *
  * == Spark-first design (scale notes) ==
  * The reference builds an interval tree on the longer side and probes it
  * (pandance/pandance.py:211-258) — a single-node index. A literal
  * translation (`join(abs(l-r) <= tol)`) degenerates to
  * BroadcastNestedLoopJoin, O(n·m) compute. Instead we rewrite the band
  * join into an *equi*-join Catalyst can shuffle-partition:
  *
  *   bucket(v) = floor(v / tol)          (one bucket per side on build,
  *   probe side explodes to {b-1, b, b+1})
  *
  * Any pair with `|l - r| <= tol` lands in adjacent buckets, so joining
  * `bucket(l) == exploded_bucket(r)` + the residual filter
  * `abs(l - r) <= tol` is exact, each qualifying pair is produced exactly
  * once (the probe row's three exploded keys are distinct), and the join
  * executes as a shuffled hash / sort-merge join that scales horizontally:
  * shuffle volume is O(n + 3m), never O(n·m). Skewed buckets are handled
  * by AQE skew-join splitting. This is the same rewrite skeleton reused by
  * the dedup/similarity operators (SURVEY.md §7.4).
  */
object FuzzyJoin {

  private val BL = "__graft_bucket_l"
  private val BR = "__graft_bucket_r"

  /** Numeric fuzzy join (int/long/float/double/decimal columns, double
    * tolerance). Timestamp columns must use [[time]] — mixing raises, as
    * in the reference (pandance/pandance.py:288-294).
    */
  def numeric(
      left: DataFrame,
      right: DataFrame,
      tol: Double,
      on: Option[String] = None,
      leftOn: Option[String] = None,
      rightOn: Option[String] = None,
      suffixes: (String, String) = ("_x", "_y")): DataFrame = {
    require(tol > 0, s"tolerance must be > 0, got $tol")
    val cols = JoinSpec.resolve(on, leftOn, rightOn)
    JoinSpec.requireColumn(left, cols.leftCol, "left")
    JoinSpec.requireColumn(right, cols.rightCol, "right")
    validateNumeric(left, cols.leftCol, "left")
    validateNumeric(right, cols.rightCol, "right")

    val lf = left.filter(isFiniteValue(left, cols.leftCol))
    val rf = right.filter(isFiniteValue(right, cols.rightCol))
    val (l, r, c) = JoinSpec.applySuffixes(lf, rf, cols, suffixes)

    def bucket(v: Column): Column = floor(v.cast(DoubleType) / lit(tol)).cast(LongType)
    val residual =
      abs(col(c.leftCol).cast(DoubleType) - col(c.rightCol).cast(DoubleType)) <= lit(tol)
    bucketedJoin(l, r, bucket(col(c.leftCol)), bucket(col(c.rightCol)), residual)
  }

  /** Timestamp/date fuzzy join with a time tolerance (reference requires
    * a timedelta tolerance for datetime columns,
    * pandance/pandance.py:291-294). Bucketing runs on epoch microseconds
    * (exact long arithmetic). DateType and TimestampNTZ columns are
    * widened to TimestampType under the session zone (UTC) first.
    */
  def time(
      left: DataFrame,
      right: DataFrame,
      tol: Duration,
      on: Option[String] = None,
      leftOn: Option[String] = None,
      rightOn: Option[String] = None,
      suffixes: (String, String) = ("_x", "_y")): DataFrame = {
    val tolUs = tol.toNanos / 1000L
    require(tolUs > 0, s"time tolerance must be >= 1 microsecond, got $tol")
    val cols = JoinSpec.resolve(on, leftOn, rightOn)
    JoinSpec.requireColumn(left, cols.leftCol, "left")
    JoinSpec.requireColumn(right, cols.rightCol, "right")
    validateTimestamp(left, cols.leftCol, "left")
    validateTimestamp(right, cols.rightCol, "right")

    def widen(df: DataFrame, c: String): DataFrame = df.schema(c).dataType match {
      case TimestampType => df
      case _ => df.withColumn(c, col(c).cast(TimestampType))
    }
    val lf = widen(left, cols.leftCol).filter(col(cols.leftCol).isNotNull)
    val rf = widen(right, cols.rightCol).filter(col(cols.rightCol).isNotNull)
    val (l, r, c) = JoinSpec.applySuffixes(lf, rf, cols, suffixes)

    def bucket(v: Column): Column = floor(unix_micros(v) / lit(tolUs)).cast(LongType)
    val residual =
      abs(unix_micros(col(c.leftCol)) - unix_micros(col(c.rightCol))) <= lit(tolUs)
    bucketedJoin(l, r, bucket(col(c.leftCol)), bucket(col(c.rightCol)), residual)
  }

  /** Decimal fuzzy join with exact decimal tolerance arithmetic — the
    * reference's `decimal.Decimal` escape hatch for high-precision joins
    * (pandance/pandance.py:139-168). Spark DecimalType caps precision at
    * 38 digits (documented delta vs Python's arbitrary precision).
    */
  def decimal(
      left: DataFrame,
      right: DataFrame,
      tol: java.math.BigDecimal,
      on: Option[String] = None,
      leftOn: Option[String] = None,
      rightOn: Option[String] = None,
      suffixes: (String, String) = ("_x", "_y")): DataFrame = {
    require(tol.signum > 0, s"tolerance must be > 0, got $tol")
    val cols = JoinSpec.resolve(on, leftOn, rightOn)
    JoinSpec.requireColumn(left, cols.leftCol, "left")
    JoinSpec.requireColumn(right, cols.rightCol, "right")
    def checkDec(df: DataFrame, c: String, side: String): Unit =
      df.schema(c).dataType match {
        case _: DecimalType => ()
        case other =>
          throw new IllegalArgumentException(
            s"$side join column `$c` must be DecimalType for decimal fuzzy join, got $other")
      }
    checkDec(left, cols.leftCol, "left")
    checkDec(right, cols.rightCol, "right")

    val lf = left.filter(col(cols.leftCol).isNotNull)
    val rf = right.filter(col(cols.rightCol).isNotNull)
    val (l, r, c) = JoinSpec.applySuffixes(lf, rf, cols, suffixes)

    val tolLit = lit(tol)
    def bucket(v: Column): Column = floor(v / tolLit).cast(LongType)
    val residual = abs(col(c.leftCol) - col(c.rightCol)) <= tolLit
    bucketedJoin(l, r, bucket(col(c.leftCol)), bucket(col(c.rightCol)), residual)
  }

  /** Naive form: the literal `abs(l - r) <= tol` non-equi join. Catalyst
    * plans it as BroadcastNestedLoopJoin — correct for any size, optimal
    * only when one side is small. Kept as the test oracle for the
    * bucketed rewrite (the reference tests do the same cross-check
    * against theta_join, test/test_ops.py:37-48).
    */
  def naive(
      left: DataFrame,
      right: DataFrame,
      tol: Double,
      on: Option[String] = None,
      leftOn: Option[String] = None,
      rightOn: Option[String] = None,
      suffixes: (String, String) = ("_x", "_y")): DataFrame = {
    require(tol > 0, s"tolerance must be > 0, got $tol")
    val cols = JoinSpec.resolve(on, leftOn, rightOn)
    val lf = left.filter(isFiniteValue(left, cols.leftCol))
    val rf = right.filter(isFiniteValue(right, cols.rightCol))
    val (l, r, c) = JoinSpec.applySuffixes(lf, rf, cols, suffixes)
    val cond =
      abs(l(c.leftCol).cast(DoubleType) - r(c.rightCol).cast(DoubleType)) <= lit(tol)
    l.join(r, cond, "inner")
  }

  /** Shared bucket-equi-join assembly. The probe (right) side explodes to
    * its bucket ±1; the join key is a plain equi-key so Catalyst picks a
    * shuffled hash or sort-merge join (or broadcast when one side is
    * small), never a nested loop.
    */
  private def bucketedJoin(
      l: DataFrame,
      r: DataFrame,
      lBucket: Column,
      rBucket: Column,
      residual: Column): DataFrame = {
    val outCols = l.columns ++ r.columns
    val lb = l.withColumn(BL, lBucket)
    val rb = r.withColumn(BR, explode(array(rBucket - 1, rBucket, rBucket + 1)))
    lb.join(rb, col(BL) === col(BR) && residual, "inner")
      .select(outCols.map(col).toIndexedSeq: _*)
  }

  /** NaN/±Inf/null are dropped before matching, as the reference does
    * (pandance/pandance.py:296-312). Non-float types only need the null
    * check (Spark decimals/ints cannot hold NaN).
    */
  private def isFiniteValue(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case DoubleType | FloatType =>
        col(c).isNotNull && !isnan(col(c)) &&
          col(c) =!= lit(Double.PositiveInfinity) && col(c) =!= lit(Double.NegativeInfinity)
      case _ => col(c).isNotNull
    }

  private def validateNumeric(df: DataFrame, c: String, side: String): Unit =
    df.schema(c).dataType match {
      case _: NumericType => ()
      case _: TimestampType | _: DateType =>
        throw new IllegalArgumentException(
          s"$side join column `$c` is a datetime column: use FuzzyJoin.time with a Duration tolerance")
      case other =>
        throw new IllegalArgumentException(
          s"$side join column `$c` must be numeric for fuzzy join, got $other")
    }

  private def validateTimestamp(df: DataFrame, c: String, side: String): Unit =
    df.schema(c).dataType match {
      case _: TimestampType | _: TimestampNTZType | _: DateType => ()
      case other =>
        throw new IllegalArgumentException(
          s"$side join column `$c` must be a timestamp/date type for time fuzzy join, got $other " +
            "(mixing datetime and numeric join columns is an error, as in the reference)")
    }
}
