package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search"): a vector splits into `m` subspaces of
  * `subDim` components; each subvector is replaced by the index of its
  * nearest (L2) codeword out of `kCodes` per-subspace centroids — one
  * BYTE per subspace, so a 64-dim float64 vector compresses 64× while
  * dot products remain computable from a per-query lookup table (ADC).
  * Codebooks are flattened row-major: `cb[(j*kCodes + c)*subDim + t]`
  * is component `t` of codeword `c` in subspace `j`; they ride into
  * the executors as a plan reference (`addReferenceObj`), never a
  * shuffle.
  */
object PqKernel {

  /** Nearest codeword per subspace (L2, ties to the smaller code).
    * Returns `m` code bytes followed by nothing — the reconstructed
    * norm is computed separately so the encode output stays a compact
    * struct.
    */
  def encode(arr: ArrayData, m: Int, kCodes: Int, subDim: Int,
      cb: Array[Double]): Array[Byte] = {
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < kCodes) {
        var d = 0.0
        var t = 0
        val base = (j * kCodes + c) * subDim
        while (t < subDim) {
          val diff = arr.getDouble(j * subDim + t) - cb(base + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  /** Euclidean norm of the RECONSTRUCTED vector for a code array —
    * precomputed at encode time so query-time cosine needs no second
    * table pass.
    */
  def reconNorm(codes: Array[Byte], m: Int, kCodes: Int, subDim: Int,
      cb: Array[Double]): Double = {
    var s = 0.0
    var j = 0
    while (j < m) {
      val base = (j * kCodes + (codes(j) & 0xff)) * subDim
      var t = 0
      while (t < subDim) { val v = cb(base + t); s += v * v; t += 1 }
      j += 1
    }
    math.sqrt(s)
  }

  /** Per-query ADC table: `T[j*kCodes + c] = dot(q_j, codeword_{j,c})`.
    * Computed ONCE per query row (m×kCodes doubles), then every
    * corpus code scores with `m` array lookups — the whole point of PQ.
    */
  def table(arr: ArrayData, m: Int, kCodes: Int, subDim: Int,
      cb: Array[Double]): ArrayData = {
    val out = new Array[Double](m * kCodes)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < kCodes) {
        var s = 0.0
        var t = 0
        val base = (j * kCodes + c) * subDim
        while (t < subDim) { s += arr.getDouble(j * subDim + t) * cb(base + t); t += 1 }
        out(j * kCodes + c) = s
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric-distance dot product: sum of `m` table lookups. */
  def adc(codes: Array[Byte], table: ArrayData, kCodes: Int): Double = {
    var s = 0.0
    var j = 0
    while (j < codes.length) {
      s += table.getDouble(j * kCodes + (codes(j) & 0xff))
      j += 1
    }
    s
  }
}

/** Fused assign-and-encode kernel for the IVF×PQ composition (the
  * billion-vector index shape: PQ codes stored INSIDE learned IVF
  * cells, so a probe prunes to nProbe cells and scores candidates with
  * ADC — faiss's IndexIVFPQ, re-expressed as one scan expression).
  * Per corpus row:
  *
  *   1. cell = argmax-cosine centroid, replicating
  *      `SimilaritySearch.bestCellExpr`'s arithmetic exactly (same
  *      left-to-right dot, same `score > best` strict comparison, so
  *      ties keep the smaller cell, zero-norm centroids score 0.0);
  *   2. residual r = x − centroid(cell) — RESIDUAL encoding: residuals
  *      are centered near zero, so the same codebook bits carry far
  *      more precision than raw-vector PQ;
  *   3. codes = per-subspace nearest codeword of r ([[PqKernel]]'s L2
  *      rule, ties to the smaller code);
  *   4. rnorm = |centroid(cell) + decode(codes)| — the reconstructed
  *      vector's norm, precomputed so query-time cosine needs no
  *      second pass.
  *
  * Centroids ride flattened row-major (`cents[cell*dim + t]`) with
  * their norms precomputed, codebooks as in [[PqKernel]].
  */
object IvfPqKernel {

  /** Argmax-cosine cell, bit-compatible with `bestCellExpr` (suite-
    * pinned): products and sums accumulate left-to-right, zero-norm
    * centroids score 0.0, strict `>` keeps the first (smallest) cell.
    */
  def bestCell(arr: ArrayData, cents: Array[Double], cnorms: Array[Double],
      dim: Int): Int = {
    var best = -1
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < cnorms.length) {
      var score = 0.0
      if (cnorms(c) > 0) {
        var s = 0.0
        var t = 0
        while (t < dim) { s += cents(c * dim + t) * arr.getDouble(t); t += 1 }
        score = s / cnorms(c)
      }
      if (score > bestScore) { bestScore = score; best = c }
      c += 1
    }
    best
  }

  def encode(arr: ArrayData, cents: Array[Double], cnorms: Array[Double],
      dim: Int, m: Int, kCodes: Int, subDim: Int,
      cb: Array[Double]): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val cell = bestCell(arr, cents, cnorms, dim)
    val cbase = cell * dim
    val codes = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < kCodes) {
        var d = 0.0
        var t = 0
        val base = (j * kCodes + c) * subDim
        while (t < subDim) {
          val r = arr.getDouble(j * subDim + t) - cents(cbase + j * subDim + t)
          val diff = r - cb(base + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best.toByte
      j += 1
    }
    var s = 0.0
    j = 0
    while (j < m) {
      val base = (j * kCodes + (codes(j) & 0xff)) * subDim
      var t = 0
      while (t < subDim) {
        val v = cents(cbase + j * subDim + t) + cb(base + t)
        s += v * v
        t += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](cell, codes, math.sqrt(s)))
  }
}

/** `array<double> -> struct<cell: int, codes: binary, rnorm: double>`:
  * the IVF×PQ write-path expression — cell assignment, residual PQ
  * encode, and reconstructed norm in ONE pass over the scan, no
  * intermediate residual array materialized in the plan.
  */
case class IvfPqEncodeExpr(child: Expression, cents: Array[Double],
    cnorms: Array[Double], dim: Int, m: Int, kCodes: Int, subDim: Int,
    cb: Array[Double]) extends UnaryExpression {

  require(kCodes <= 256, "one byte per code: kCodes <= 256")
  require(m * subDim == dim, s"m ($m) x subDim ($subDim) must equal dim ($dim)")
  require(cnorms.nonEmpty, "at least one centroid")

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("codes", BinaryType, nullable = false),
    StructField("rnorm", DoubleType, nullable = false)))
  override def prettyName: String = "graft_ivfpq_encode"

  override def nullSafeEval(input: Any): Any =
    IvfPqKernel.encode(input.asInstanceOf[ArrayData], cents, cnorms, dim,
      m, kCodes, subDim, cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("graftIvfPqCents", cents, "double[]")
    val cnormsRef = ctx.addReferenceObj("graftIvfPqCnorms", cnorms, "double[]")
    val cbRef = ctx.addReferenceObj("graftIvfPqCb", cb, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.IvfPqKernel.encode($c, $centsRef, " +
        s"$cnormsRef, $dim, $m, $kCodes, $subDim, $cbRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<double> -> struct<codes: binary, rnorm: double>`: PQ-encode a
  * vector against literal codebooks. A write-path expression (one
  * evaluation per corpus row, output materialized or persisted), but
  * native so encode scans stay inside whole-stage codegen.
  */
case class PqEncodeExpr(child: Expression, m: Int, kCodes: Int, subDim: Int,
    cb: Array[Double]) extends UnaryExpression {

  require(kCodes <= 256, "one byte per code: kCodes <= 256")

  override def dataType: DataType = StructType(Seq(
    StructField("codes", BinaryType, nullable = false),
    StructField("rnorm", DoubleType, nullable = false)))
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val codes = PqKernel.encode(arr, m, kCodes, subDim, cb)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](codes, PqKernel.reconNorm(codes, m, kCodes, subDim, cb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("graftPqCb", cb, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val codes = ctx.freshName("codes")
      s"""
         |byte[] $codes = graft.functions.PqKernel.encode($c, $m, $kCodes, $subDim, $cbRef);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $codes,
         |    graft.functions.PqKernel.reconNorm($codes, $m, $kCodes, $subDim, $cbRef) });
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<double> -> array<double>`: the per-query ADC lookup table. */
case class PqTableExpr(child: Expression, m: Int, kCodes: Int, subDim: Int,
    cb: Array[Double]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_table"

  override def nullSafeEval(input: Any): Any =
    PqKernel.table(input.asInstanceOf[ArrayData], m, kCodes, subDim, cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("graftPqCb", cb, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqKernel.table($c, $m, $kCodes, $subDim, $cbRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `(binary, array<double>) -> double`: the query-time ADC score — `m`
  * lookups per pair, no per-pair float math beyond the adds. This is
  * the hot inner loop of a PQ scan; native + codegen for the same
  * reason as [[ByteDot]].
  */
case class PqAdcExpr(left: Expression, right: Expression, kCodes: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(a: Any, b: Any): Any =
    PqKernel.adc(a.asInstanceOf[Array[Byte]], b.asInstanceOf[ArrayData], kCodes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PqKernel.adc($a, $b, $kCodes);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
