package graft.functions

import org.apache.spark.sql.{Column, GraftInternals, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dot product of two `array<double>` columns as a native Catalyst
  * expression with whole-stage codegen — the hot inner loop of every
  * embedding-similarity operator (SimilaritySearch, Dedup.embeddingNearDup).
  *
  * Preference order per the build spec: native `Expression` with
  * `doGenCode` > Scala UDF. A UDF would deserialize each array into a
  * `WrappedArray` per call (boxing every element); this expression reads
  * primitive doubles straight out of Tungsten `ArrayData`, stays inside
  * the WholeStageCodegen span, and makes a 25M-pair brute-force cosine
  * pass CPU-bound instead of allocation-bound.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are coerced to array<double> by the VectorFunctions wrappers
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Unsigned-byte dot product of two `binary` columns — the query-time
  * kernel of SQ8-quantized similarity search ([[VectorFunctions.sq8Quantize]]).
  * Same native-Expression rationale as [[DotProduct]]: the loop reads
  * raw `byte[]`, stays inside whole-stage codegen, and the integer
  * multiply-accumulate is what makes an 8× smaller vector also CHEAPER
  * to score, not just cheaper to shuffle.
  */
case class ByteDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_byte_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var s = 0L
    var i = 0
    while (i < n) { s += (x(i) & 0xff).toLong * (y(i) & 0xff).toLong; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long)($a[$i] & 0xff) * (long)($b[$i] & 0xff);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Kernel for [[SignBandKeysExpr]]: `bits` random-hyperplane sign bits
  * (components are deterministic ±1 from SplitMix64 — no stored model)
  * packed into one long, then sliced into `bands` keys of `bits/bands`
  * bits. Bit-identical to the UDF form it replaces (spec-pinned), so
  * persisted embedding-LSH band keys stay valid.
  */
object SignBandKeysKernel {
  def compute(arr: ArrayData, bits: Int, bands: Int, mask: Long): ArrayData = {
    val width = bits / bands
    val n = arr.numElements()
    var sig = 0L
    var b = 0
    while (b < bits) {
      var s = 0.0
      var i = 0
      while (i < n) {
        val r = Hashing.splitmix64(b.toLong * 100003L + i)
        val v = arr.getDouble(i)
        s += (if (r < 0) -v else v)
        i += 1
      }
      if (s > 0) sig |= (1L << b)
      b += 1
    }
    val out = new Array[Long](bands)
    var c = 0
    while (c < bands) { out(c) = (sig >>> (c * width)) & mask; c += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `array<double> -> array<long>`: random-hyperplane LSH band keys as a
  * native expression. Keeps the one-pass fusion of the UDF it replaces
  * (band keys computed directly — a signature column consumed by
  * per-band expressions would re-run the whole signature per band on
  * projection collapse) and drops the `Seq[Double]` boxing at the
  * catalyst boundary: the loop reads primitive doubles out of Tungsten
  * `ArrayData` inside the WholeStageCodegen span.
  */
case class SignBandKeysExpr(child: Expression, bits: Int, bands: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(bits % bands == 0, "bands must divide bits")
  require(bits <= 64, "at most 64 sign bits")

  private val mask = { val w = bits / bands; if (w >= 64) -1L else (1L << w) - 1 }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sign_band_keys"

  override def nullSafeEval(input: Any): Any =
    SignBandKeysKernel.compute(input.asInstanceOf[ArrayData], bits, bands, mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignBandKeysKernel.compute($c, $bits, $bands, ${mask}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One SQ8-quantized vector: `value[i] ~ vmin + step * (bytes[i] & 0xff)`,
  * with the byte sum and length precomputed so a full dot product needs
  * only ONE byte-dot pass at query time (see [[VectorFunctions.sq8Dot]]).
  */
final case class Sq8(bytes: Array[Byte], vmin: Double, step: Double, bsum: Long, n: Int)

/** Column-level vector helpers over `array<float>` / `array<double>`
  * embedding columns (testdata: `embeddings.embedding` is
  * `array<float>`, FIXTURES.md §B).
  */
object VectorFunctions {

  /** Cast any numeric array to `array<double>` for the native kernels. */
  def asDouble(v: Column): Column = v.cast(ArrayType(DoubleType))

  /** `graft_dot(a, b)` — codegen'd dot product. */
  def dot(a: Column, b: Column): Column =
    GraftInternals.toColumn(
      DotProduct(
        GraftInternals.toExpression(asDouble(a)),
        GraftInternals.toExpression(asDouble(b))))

  /** Euclidean norm. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity computed as dot(a,b) / (|a| * |b|) — the exact
    * formula the DuckDB oracle uses, so per-row results agree to the last
    * ulp modulo summation order.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Pre-normalized variant: when one side is reused across many pairs,
    * materialize `normalized` once and use plain `dot` — halves the
    * FLOPs of a brute-force all-pairs pass.
    */
  def normalized(v: Column): Column = {
    val d = asDouble(v)
    transform(d, x => x / sqrt(aggregate(d, lit(0.0), (acc, e) => acc + e * e)))
  }

  /** SQ8 scalar quantization: `array<double>` → struct
    * `(bytes, vmin, step, bsum, n)` with each component mapped to one
    * unsigned byte on the vector's own [min, max] range. 8× smaller
    * than `array<double>` — at 100 TB that is 8× less broadcast, 8×
    * less shuffle, and an integer inner loop ([[graft.functions.ByteDot]]).
    * A Scala UDF by design: quantization is a one-time WRITE-path
    * transform (materialize the struct column next to — or instead of —
    * the float vectors), so the projection-collapse re-evaluation
    * hazard that rules out UDFs in query paths does not apply.
    */
  def sq8Quantize(v: Column): Column = sq8Udf(asDouble(v))

  private val sq8Udf = udf { v: Seq[Double] =>
    val n = v.length
    if (n == 0) Sq8(Array.empty[Byte], 0.0, 0.0, 0L, 0)
    else {
      var mn = Double.PositiveInfinity
      var mx = Double.NegativeInfinity
      v.foreach { x => if (x < mn) mn = x; if (x > mx) mx = x }
      val step = if (mx > mn) (mx - mn) / 255.0 else 1.0
      val bytes = new Array[Byte](n)
      var s = 0L
      var i = 0
      while (i < n) {
        val b = math.max(0, math.min(255, math.round((v(i) - mn) / step).toInt))
        bytes(i) = b.toByte
        s += b
        i += 1
      }
      Sq8(bytes, mn, step, s, n)
    }
  }

  /** Approximate dot product of two SQ8 structs with ONE byte-dot pass:
    * expanding `Σ (mnA + stA·bA[i]) · (mnB + stB·bB[i])` gives
    * `stA·stB·Σ bA·bB + stA·mnB·ΣbA + stB·mnA·ΣbB + n·mnA·mnB`,
    * and the byte sums / length were precomputed at quantize time — so
    * the only per-pair work is the codegen'd integer kernel.
    */
  def sq8Dot(a: Column, b: Column): Column = {
    val byteDot = GraftInternals.toColumn(
      ByteDot(
        GraftInternals.toExpression(a.getField("bytes")),
        GraftInternals.toExpression(b.getField("bytes"))))
    a.getField("step") * b.getField("step") * byteDot +
      a.getField("step") * b.getField("vmin") * a.getField("bsum") +
      b.getField("step") * a.getField("vmin") * b.getField("bsum") +
      a.getField("n") * a.getField("vmin") * b.getField("vmin")
  }

  /** Approximate cosine from SQ8 structs (quantized norms — fully
    * self-contained, the float vectors are not needed at query time).
    */
  def sq8Cosine(a: Column, b: Column): Column =
    sq8Dot(a, b) / (sqrt(sq8Dot(a, a)) * sqrt(sq8Dot(b, b)))

  /** Register `graft_dot` for SQL use (`SELECT graft_dot(a.e, b.e) ...`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")

  /** Random-hyperplane LSH band keys for a vector — the native
    * [[SignBandKeysExpr]]. Bit-compatible with the banding previously
    * inlined in Dedup/SimilaritySearch (and with the UDF form this
    * replaces, spec-pinned): band c holds signature bits
    * [c*width, (c+1)*width).
    */
  def signBandKeys(bits: Int, bands: Int): Column => Column = { vec =>
    GraftInternals.toColumn(
      SignBandKeysExpr(GraftInternals.toExpression(asDouble(vec)), bits, bands))
  }
}
