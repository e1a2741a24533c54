package graft.functions

import org.apache.spark.sql.{Column, GraftInternals}
import org.apache.spark.sql.catalyst.expressions.{Expression, If, IntegralDivide, LessThan, Literal, Remainder, Subtract}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact integer bucket arithmetic for the band-join rewrites.
  *
  * Bucketing a BIGINT column through DOUBLE division (`floor(v / w)`)
  * mis-assigns buckets for |v| > 2^53: the cast rounds by up to
  * ulp/2 = 1024 at the top of the long range, and the ±1 bucket explode
  * cannot recover a candidate whose bucket drifted further — a silent
  * false negative (e.g. epoch-nanos keys). These helpers keep the whole
  * computation in 64-bit integer arithmetic, so `floorDiv(v, w)` is the
  * mathematical floor for every representable long, including
  * `Long.MinValue` (the `q - 1` adjustment never overflows because the
  * truncated quotient is already >= Long.MinValue / w).
  */
object LongMath {

  /** Column form: exact floor(v / w) on BIGINT, w > 0. */
  def floorDiv(v: Column, w: Long): Column = {
    require(w > 0, s"divisor must be > 0, got $w")
    val ve = GraftInternals.toExpression(v.cast(LongType))
    val q = GraftInternals.toColumn(IntegralDivide(ve, Literal(w)))
    val r = GraftInternals.toColumn(Remainder(ve, Literal(w)))
    when(r < 0, q - 1).otherwise(q)
  }

  /** Expression form for optimizer rules: exact floor(ve / w), ve BIGINT. */
  def floorDivExpr(ve: Expression, w: Long): Expression = {
    require(w > 0, s"divisor must be > 0, got $w")
    val q = IntegralDivide(ve, Literal(w))
    If(
      LessThan(Remainder(ve, Literal(w)), Literal(0L)),
      Subtract(q, Literal(1L)),
      q)
  }
}
