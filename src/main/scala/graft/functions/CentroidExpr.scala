package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Centroid-assignment kernels: argmax-cosine cell over a flattened
  * literal centroid model. These replace the higher-order-function
  * composition (`aggregate` over `zip_with` per centroid) that
  * previously implemented `SimilaritySearch.bestCellStructExpr` /
  * `topCellsExpr`: HOFs are CodegenFallback expressions, so every row
  * paid an interpreted fold that allocated a fresh `zip_with` array per
  * centroid and evaluated each centroid dot twice (once in the `when`
  * predicate, once in the kept struct). The kernels below run the same
  * arithmetic as [[IvfPqKernel.bestCell]] — products and sums
  * accumulate left-to-right, zero-norm centroids score 0.0, strict `>`
  * keeps the first (smallest) cell on ties — inside whole-stage
  * codegen, with zero per-row allocation beyond the result.
  *
  * Bit-compatibility with the replaced HOF forms (suite-pinned):
  *   - dot: `s = ((0 + c0*v0) + c1*v1) + …` — identical association.
  *   - score: `s / cnorm` when `cnorm > 0`, else `0.0` — identical.
  *   - argmax: init `(cell = -1, score = -Infinity)`, strict `score >
  *     best` — a NaN score never wins (NaN > x is false), exactly like
  *     the HOF's `when(score > acc.score)`.
  *   - top-cells order: score DESC via `java.lang.Double.compare`
  *     (so +0.0 ranks above -0.0 and NaN ranks last — the same total
  *     order `array_sort` used on the negated score), ties to the
  *     smaller cell id.
  */
object CentroidKernel {

  /** Argmax cell + its score in one pass. Returns a 2-field row
    * `(cell: int, score: double)`; `cell` is `base + index` for the
    * winner, or `-1` (un-shifted, matching the HOF's initial
    * accumulator) when no centroid scored above -Infinity.
    */
  def bestStruct(arr: ArrayData, cents: Array[Double], cnorms: Array[Double],
      dim: Int, base: Int): GenericInternalRow = {
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
    new GenericInternalRow(
      Array[Any](if (best < 0) -1 else base + best, bestScore))
  }

  /** The `nProbe` highest-scoring cell ids, score DESC then cell ASC —
    * the in-row probe list of the streaming IVF gate. Fewer than
    * `nProbe` centroids returns them all (slice semantics).
    */
  def topCells(arr: ArrayData, cents: Array[Double], cnorms: Array[Double],
      dim: Int, nProbe: Int): ArrayData = {
    val k = cnorms.length
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      var score = 0.0
      if (cnorms(c) > 0) {
        var s = 0.0
        var t = 0
        while (t < dim) { s += cents(c * dim + t) * arr.getDouble(t); t += 1 }
        score = s / cnorms(c)
      }
      scores(c) = score
      c += 1
    }
    val n = math.min(nProbe, k)
    val out = new Array[Int](n)
    // selection of the n best, comparing NEGATED scores ascending —
    // the exact total order `array_sort(struct(-score, cell))` used
    // (so -NaN = NaN ranks last, and a +0.0 score outranks -0.0);
    // ties keep the earlier (smaller) cell. k is model-sized (<= a
    // few hundred), so n scans beat a full sort's boxing.
    val taken = new Array[Boolean](k)
    var i = 0
    while (i < n) {
      var best = -1
      var j = 0
      while (j < k) {
        if (!taken(j) && (best < 0 ||
            java.lang.Double.compare(-scores(j), -scores(best)) < 0))
          best = j
        j += 1
      }
      taken(best) = true
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<double> -> struct<cell: int, score: double>`: codegen argmax
  * cell assignment against a flattened literal centroid model (rides
  * into executors as a plan reference, never a shuffle).
  */
case class BestCellStructExpr(child: Expression, cents: Array[Double],
    cnorms: Array[Double], dim: Int, base: Int) extends UnaryExpression {

  require(cnorms.nonEmpty, "at least one centroid")

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("score", DoubleType, nullable = false)))
  override def prettyName: String = "graft_best_cell"

  override def nullSafeEval(input: Any): Any =
    CentroidKernel.bestStruct(input.asInstanceOf[ArrayData], cents, cnorms,
      dim, base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("graftBcCents", cents, "double[]")
    val cnormsRef = ctx.addReferenceObj("graftBcCnorms", cnorms, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CentroidKernel.bestStruct($c, " +
        s"$centsRef, $cnormsRef, $dim, $base);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<double> -> array<int>`: the `nProbe` nearest cells of a query
  * vector, in probe order — codegen replacement for the
  * transform/array_sort/slice HOF chain.
  */
case class TopCellsExpr(child: Expression, cents: Array[Double],
    cnorms: Array[Double], dim: Int, nProbe: Int) extends UnaryExpression {

  require(cnorms.nonEmpty, "at least one centroid")
  require(nProbe >= 1, "nProbe must be >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_top_cells"

  override def nullSafeEval(input: Any): Any =
    CentroidKernel.topCells(input.asInstanceOf[ArrayData], cents, cnorms,
      dim, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("graftTcCents", cents, "double[]")
    val cnormsRef = ctx.addReferenceObj("graftTcCnorms", cnorms, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CentroidKernel.topCells($c, " +
        s"$centsRef, $cnormsRef, $dim, $nProbe);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
