package graft.operators

import java.time.Duration

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.LongMath

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
    * in the reference (pandance/pandance.py:288-294). `tol` defaults to
    * 1e-3 like the reference signature (pandance/pandance.py:24).
    */
  def numeric(
      left: DataFrame,
      right: DataFrame,
      tol: Double = 1e-3,
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

    if (isIntegral(left.schema(cols.leftCol).dataType) &&
        isIntegral(right.schema(cols.rightCol).dataType)) {
      // Exact integer path: DOUBLE bucketing mis-assigns buckets for
      // |v| > 2^53 (epoch-nanos, raw long keys) — a silent false
      // negative. For integer columns `|a - b| <= tol` is equivalent to
      // `|a - b| <= floor(tol)`, so both the bucket (exact long
      // floor-div) and the residual (DECIMAL(20,0) difference — no
      // overflow for any long pair) stay in exact arithmetic.
      val tolL = math.max(0L, math.floor(tol).toLong)
      val w = math.max(1L, tolL)
      def bucket(v: Column): Column = LongMath.floorDiv(v, w)
      bucketedJoin(l, r, bucket(col(c.leftCol)), bucket(col(c.rightCol)),
        integralResidual(col(c.leftCol), col(c.rightCol), tolL),
        adaptiveDrift = false)
    } else {
      def bucket(v: Column): Column = floor(v.cast(DoubleType) / lit(tol)).cast(LongType)
      val residual =
        abs(col(c.leftCol).cast(DoubleType) - col(c.rightCol).cast(DoubleType)) <= lit(tol)
      // fractional path: bucket drift from division rounding is possible
      // once |v/tol| approaches 2^52; bucketedJoin widens the explode
      // adaptively so those extremes stay exact too
      bucketedJoin(l, r, bucket(col(c.leftCol)), bucket(col(c.rightCol)), residual,
        adaptiveDrift = true)
    }
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

    // exact long floor-div on epoch micros (double division drifts once
    // |epoch/tol| nears 2^52 — reachable with a 1 µs tolerance)
    def bucket(v: Column): Column = LongMath.floorDiv(unix_micros(v), tolUs)
    val residual =
      abs(unix_micros(col(c.leftCol)) - unix_micros(col(c.rightCol))) <= lit(tolUs)
    bucketedJoin(l, r, bucket(col(c.leftCol)), bucket(col(c.rightCol)), residual,
      adaptiveDrift = false)
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
    // exact decimal bucketing: `floor(v / tol)` alone rounds the quotient
    // to the division result scale first, which can cross an integer
    // boundary (quotient within 5e-7 of an integer) and mis-bucket by
    // one on each side. `(v - pmod(v, tol)) / tol` divides an exact
    // multiple, so the quotient is an exact integer at any scale.
    def bucket(v: Column): Column = ((v - pmod(v, tolLit)) / tolLit).cast(LongType)
    val residual = abs(col(c.leftCol) - col(c.rightCol)) <= tolLit
    bucketedJoin(l, r, bucket(col(c.leftCol)), bucket(col(c.rightCol)), residual,
      adaptiveDrift = false)
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
    // integer columns compare in exact arithmetic (mirrors [[numeric]]'s
    // integral path, so naive ≡ bucketed holds at any long magnitude)
    val cond =
      if (isIntegral(left.schema(cols.leftCol).dataType) &&
          isIntegral(right.schema(cols.rightCol).dataType))
        integralResidual(l(c.leftCol), r(c.rightCol), math.max(0L, math.floor(tol).toLong))
      else
        abs(l(c.leftCol).cast(DoubleType) - r(c.rightCol).cast(DoubleType)) <= lit(tol)
    l.join(r, cond, "inner")
  }

  /** Shared bucket-equi-join assembly. The probe (right) side explodes to
    * its bucket ±1; the join key is a plain equi-key so Catalyst picks a
    * shuffled hash or sort-merge join (or broadcast when one side is
    * small), never a nested loop.
    *
    * `adaptiveDrift` (fractional path only): `floor(v / tol)` in DOUBLE
    * can drift from the true bucket once |v / tol| approaches 2^52
    * (division relative error ~ ulp scales with the quotient), so the
    * explode half-width grows by `|bucket| / 2^50` — zero extra buckets
    * for every normal input, correctness preserved at the extremes.
    */
  private def bucketedJoin(
      l: DataFrame,
      r: DataFrame,
      lBucket: Column,
      rBucket: Column,
      residual: Column,
      adaptiveDrift: Boolean): DataFrame = {
    val outCols = l.columns ++ r.columns
    val lb = l.withColumn(BL, lBucket)
    val rb =
      if (adaptiveDrift) {
        val d = (abs(rBucket) / lit(1L << 50)).cast(LongType)
        r.withColumn(BR,
          explode(sequence(rBucket - lit(1L) - d, rBucket + lit(1L) + d)))
      } else {
        r.withColumn(BR, explode(array(rBucket - 1, rBucket, rBucket + 1)))
      }
    lb.join(rb, col(BL) === col(BR) && residual, "inner")
      .select(outCols.map(col).toIndexedSeq: _*)
  }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Exact `|l - r| <= tolL` for integer columns: the difference is
    * computed in DECIMAL(20,0) (covers the full 2^64 span — no long
    * overflow, no double rounding above 2^53).
    */
  private def integralResidual(lc: Column, rc: Column, tolL: Long): Column = {
    val dec = DecimalType(20, 0)
    abs(lc.cast(dec) - rc.cast(dec)) <= lit(java.math.BigDecimal.valueOf(tolL))
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
