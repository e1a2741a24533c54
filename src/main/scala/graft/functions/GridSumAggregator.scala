package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise EXACT-GRID vector sum aggregator: each component is
  * floored onto the 1e-7 grid as a long FIRST, then summed exactly —
  * the aggregation core of
  * [[graft.operators.Sketches.embeddingDrift]] in a form a STREAMING
  * window aggregation can hold as state (one long[] + nothing else per
  * window, merged map-side like any associative aggregate; no
  * double-summation order nondeterminism across partitions or
  * micro-batches).
  *
  * Same malformed-input contract as the batch monitor: a null vector,
  * a null/NaN/±Inf component, or a dimension mismatch FAILS the query
  * instead of quietly skewing the drift measurement.
  */
class GridSumAggregator
    extends Aggregator[Seq[Double], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], vec: Seq[Double]): Array[Long] = {
    require(vec != null, "gridSum: null vector")
    val out = if (buf.length == 0) new Array[Long](vec.length) else buf
    require(out.length == vec.length,
      s"gridSum: dimension mismatch (${out.length} vs ${vec.length})")
    var i = 0
    while (i < out.length) {
      val v = vec(i)
      require(!v.isNaN && !v.isInfinite, s"gridSum: non-finite component at $i")
      out(i) += StrictMath.floor(v * 1.0e7).toLong
      i += 1
    }
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.length == 0) b
    else if (b.length == 0) a
    else {
      require(a.length == b.length,
        s"gridSum: dimension mismatch (${a.length} vs ${b.length})")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object GridSumAggregator {

  /** Cosine of two exact grid-sum vectors — the fixed IEEE expression
    * the batch monitor and the SQL oracle both evaluate: exact BigInt
    * dot products (grid-sum products overflow a long), each cast to
    * double once (correctly rounded), `num / (sqrt(da) * sqrt(db))`,
    * floored onto the 1e-4 grid. Zero vectors are a contract error.
    */
  def cosFloored(a: Seq[Long], b: Seq[Long]): Double = {
    require(a.length == b.length && a.nonEmpty,
      s"cosFloored: dimension mismatch (${a.length} vs ${b.length})")
    var num = BigInt(0)
    var da = BigInt(0)
    var db = BigInt(0)
    var i = 0
    while (i < a.length) {
      val x = BigInt(a(i)); val y = BigInt(b(i))
      num += x * y; da += x * x; db += y * y
      i += 1
    }
    require(da > 0 && db > 0, "cosFloored: zero vector")
    val cos = num.toDouble / (math.sqrt(da.toDouble) * math.sqrt(db.toDouble))
    math.floor(cos * 10000) / 10000
  }

  /** [[cosFloored]] as the 1e-4-grid INTEGER `floor(cos · 10000)` —
    * the form exact integer objectives (MMR) combine with other grid
    * quantities without ever re-rounding a double.
    */
  def cosGrid(a: Seq[Long], b: Seq[Long]): Long = {
    require(a.length == b.length && a.nonEmpty,
      s"cosGrid: dimension mismatch (${a.length} vs ${b.length})")
    var num = BigInt(0)
    var da = BigInt(0)
    var db = BigInt(0)
    var i = 0
    while (i < a.length) {
      val x = BigInt(a(i)); val y = BigInt(b(i))
      num += x * y; da += x * x; db += y * y
      i += 1
    }
    require(da > 0 && db > 0, "cosGrid: zero vector")
    val cos = num.toDouble / (math.sqrt(da.toDouble) * math.sqrt(db.toDouble))
    math.floor(cos * 10000).toLong
  }

  /** [[cosFloored]] over Tungsten array data — the per-row entry of
    * [[GridCosExpr]] (no Seq boxing on the hot path beyond the BigInt
    * accumulation the exactness contract requires).
    */
  def cosFlooredData(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double =
    cosFloored(a.toLongArray().toSeq, b.toLongArray().toSeq)
}

/** `(array<bigint>, array<bigint>) -> double`: the EXACT grid cosine
  * ([[GridSumAggregator.cosFloored]]) as a native expression — BigInt
  * dot products of 1e-7-grid longs, each cast to double ONCE
  * (correctly rounded), `num / (sqrt(da) * sqrt(db))`, floored onto
  * the 1e-4 grid. The per-row side of the centroid/outlier monitors:
  * both engines evaluate the identical IEEE expression over identical
  * integers, so there is no summation-order or knife-edge hazard at
  * all. Zero vectors and dimension mismatches FAIL the query (the
  * drift-family malformed-input contract).
  */
case class GridCosExpr(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_grid_cos"

  override def nullSafeEval(a: Any, b: Any): Any =
    GridSumAggregator.cosFlooredData(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GridSumAggregator.cosFlooredData($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(left = newLeft, right = newRight)
}
