package graft.api

import java.time.Duration

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.{AsOfJoin, FuzzyJoin, IneqJoin, MemEstimate, ThetaJoin}

/** py4j-friendly facade over the parity operators — the JVM side of
  * `python/graft.py`. Every signature here is flat (nullable Strings
  * instead of Option, explicit suffix pair, micros instead of
  * Duration, BigDecimal-as-string) because py4j can construct none of
  * Scala's Option/Tuple/Duration conveniently. Semantics are entirely
  * the wrapped operators'; this object adds NO logic beyond argument
  * adaptation, so the Python surface inherits the reference parity
  * (pandance/pandance.py:22, :331, :614, :894) proven by the Scala
  * gates.
  */
object PyApi {

  private def opt(s: String): Option[String] = Option(s).filter(_.nonEmpty)

  def fuzzyJoinNumeric(
      left: DataFrame, right: DataFrame, tol: Double,
      on: String, leftOn: String, rightOn: String,
      sx: String, sy: String): DataFrame =
    FuzzyJoin.numeric(left, right, tol, opt(on), opt(leftOn), opt(rightOn), (sx, sy))

  def fuzzyJoinTime(
      left: DataFrame, right: DataFrame, tolMicros: Long,
      on: String, leftOn: String, rightOn: String,
      sx: String, sy: String): DataFrame =
    FuzzyJoin.time(left, right, Duration.ofNanos(tolMicros * 1000L),
      opt(on), opt(leftOn), opt(rightOn), (sx, sy))

  def fuzzyJoinDecimal(
      left: DataFrame, right: DataFrame, tol: String,
      on: String, leftOn: String, rightOn: String,
      sx: String, sy: String): DataFrame =
    FuzzyJoin.decimal(left, right, new java.math.BigDecimal(tol),
      opt(on), opt(leftOn), opt(rightOn), (sx, sy))

  /** Suffix-resolve the θ-join inputs; the Python side builds the
    * condition Column over the returned frames and joins natively.
    * Returns [leftSuffixed, rightSuffixed, leftColName, rightColName].
    */
  def thetaPrepare(
      left: DataFrame, right: DataFrame,
      on: String, leftOn: String, rightOn: String,
      sx: String, sy: String): Array[AnyRef] = {
    val cols = graft.operators.JoinSpec.resolve(opt(on), opt(leftOn), opt(rightOn))
    graft.operators.JoinSpec.requireColumn(left, cols.leftCol, "left")
    graft.operators.JoinSpec.requireColumn(right, cols.rightCol, "right")
    val (l, r, c) = graft.operators.JoinSpec.applySuffixes(left, right, cols, (sx, sy))
    Array(l, r, c.leftCol, c.rightCol)
  }

  /** Column-expression θ join with a pre-built condition (the Python
    * wrapper composes it from [[thetaPrepare]]'s frames).
    */
  def thetaJoin(l: DataFrame, r: DataFrame, condition: Column): DataFrame =
    l.join(r, condition, "inner")

  def ineqJoin(
      left: DataFrame, right: DataFrame, how: String,
      on: String, leftOn: String, rightOn: String,
      sx: String, sy: String, prune: Boolean): DataFrame =
    IneqJoin(left, right, how, opt(on), opt(leftOn), opt(rightOn), (sx, sy), prune)

  def asOfJoinTime(
      left: DataFrame, right: DataFrame, tolMicros: Long, rightId: String,
      on: String, leftOn: String, rightOn: String,
      direction: String, by: Array[String],
      sx: String, sy: String, joinType: String,
      allowExactMatches: Boolean): DataFrame =
    AsOfJoin.time(left, right, Duration.ofNanos(tolMicros * 1000L), rightId,
      opt(on), opt(leftOn), opt(rightOn), direction,
      Option(by).map(_.toSeq).getOrElse(Nil), (sx, sy), joinType,
      allowExactMatches)

  def estimateMemCostCartesianMiB(
      a: DataFrame, aCol: String, b: DataFrame, bCol: String): Long =
    MemEstimate.cartesianMiB(a, aCol, b, bCol)
}
