package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DSIR hashed-n-gram kernels: the gram construction (unigrams +
  * ``-joined bigrams), md5 bucketing, and dense-ratio scoring of
  * [[graft.operators.Dsir]] as single whole-stage-codegen calls. These
  * replace the higher-order-function composition (`zip_with`/`filter`
  * grams, per-gram `md5`→`substring`→`conv` Columns, `aggregate` fold)
  * that previously ran the profile builders and the in-row serving
  * form: HOFs are CodegenFallback, so every document paid an
  * interpreted fold that materialized the token array, a second
  * shifted copy, a concat'd bigram array, and a hex STRING per gram
  * before parsing 8 chars of it back into a long.
  *
  * Bit-compatibility with the replaced Column forms (suite-pinned, and
  * re-proven by the full DuckDB-oracle gate):
  *   - tokens: maximal runs of non-`\s` bytes (`\s` = 0x20, 0x09–0x0d)
  *     — exactly `filter(split(trim(text), "\\s+"), _ =!= "")`, the
  *     [[TextFunctions.tokens]] semantics [[LmScoreKernel]] pins.
  *   - grams: all unigrams first, then adjacent-pair bigrams joined
  *     with 0x01, `2t−1` for `t ≥ 1` tokens, none for a blank doc —
  *     [[graft.operators.Dsir.gramsArray]]'s order and counts.
  *   - bucket: the first 4 md5 digest bytes as an unsigned big-endian
  *     int, mod `buckets` — exactly
  *     `conv(substring(md5(g), 1, 8), 16, 10) % buckets` (md5 of the
  *     gram's UTF-8 bytes; the bigram's bytes are tokA ++ 0x01 ++ tokB,
  *     so the digest streams straight from the document buffer with no
  *     gram string ever built).
  *   - score: `Σ ratio(bucket)` over exact longs (order-free), `0` for
  *     a gram-less doc (the HOF `aggregate`'s initial value), null
  *     when the text is null, null `logw` when the group is unknown —
  *     the `element_at`-map fail-closed rule of `scoreInRowByGroup`.
  */
object DsirKernel {

  private def isSep(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** `(null, null)` — the HOF struct over a null text. */
  def nullScore(): InternalRow =
    new GenericInternalRow(Array[Any](null, null))

  /** Token start/end byte offsets, packed `[s0, e0, s1, e1, …]`. */
  private def tokenRanges(bytes: Array[Byte]): (Array[Int], Int) = {
    val n = bytes.length
    var t = 0
    var i = 0
    while (i < n) {
      while (i < n && isSep(bytes(i))) i += 1
      if (i < n) {
        while (i < n && !isSep(bytes(i))) i += 1
        t += 1
      }
    }
    val out = new Array[Int](2 * t)
    var j = 0
    i = 0
    while (i < n) {
      while (i < n && isSep(bytes(i))) i += 1
      if (i < n) {
        out(j) = i
        while (i < n && !isSep(bytes(i))) i += 1
        out(j + 1) = i
        j += 2
      }
    }
    (out, t)
  }

  /** Unsigned big-endian int of the digest's first 4 bytes, mod
    * `buckets` — `conv(substring(md5(g),1,8),16,10) % buckets`.
    */
  private def bucketOf(md: java.security.MessageDigest, buckets: Int): Long = {
    val d = md.digest()
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v % buckets
  }

  /** The doc's gram bucket ids in gram order (unigrams, then bigrams):
    * what `bucketOf(explode(gramsArray(text)))` produced, minus the
    * gram strings.
    */
  def gramBuckets(text: UTF8String, buckets: Int): ArrayData = {
    val bytes = text.getBytes
    val (r, t) = tokenRanges(bytes)
    if (t == 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](2 * t - 1)
    val md = mdLocal.get()
    var i = 0
    while (i < t) {
      md.update(bytes, r(2 * i), r(2 * i + 1) - r(2 * i))
      out(i) = bucketOf(md, buckets)
      i += 1
    }
    i = 0
    while (i < t - 1) {
      md.update(bytes, r(2 * i), r(2 * i + 1) - r(2 * i))
      md.update(1.toByte)
      md.update(bytes, r(2 * i + 2), r(2 * i + 3) - r(2 * i + 2))
      out(t + i) = bucketOf(md, buckets)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** `(n_ngrams, logw)` against a dense ratio array — the ungrouped
    * in-row serving form. `(0, 0)` for a gram-less doc.
    */
  def score(text: UTF8String, ratio: Array[Long], buckets: Int): InternalRow = {
    val bytes = text.getBytes
    val (r, t) = tokenRanges(bytes)
    if (t == 0) return new GenericInternalRow(Array[Any](0L, 0L))
    val md = mdLocal.get()
    var logw = 0L
    var i = 0
    while (i < t) {
      md.update(bytes, r(2 * i), r(2 * i + 1) - r(2 * i))
      logw += ratio(bucketOf(md, buckets).toInt)
      i += 1
    }
    i = 0
    while (i < t - 1) {
      md.update(bytes, r(2 * i), r(2 * i + 1) - r(2 * i))
      md.update(1.toByte)
      md.update(bytes, r(2 * i + 2), r(2 * i + 3) - r(2 * i + 2))
      logw += ratio(bucketOf(md, buckets).toInt)
      i += 1
    }
    new GenericInternalRow(Array[Any](2L * t - 1L, logw))
  }

  /** The per-group form: the row's group picks its ratio array from
    * the model map; an unknown/null group scores `logw` null (gates
    * fail closed) with `n_ngrams` still counted — and a gram-less doc
    * scores `logw = 0` even then (the HOF `aggregate` over an empty
    * array returns its initial value without touching the null array).
    */
  def scoreByGroup(text: UTF8String, grp: UTF8String,
      ratios: java.util.HashMap[UTF8String, Array[Long]],
      buckets: Int): InternalRow = {
    if (text == null) return nullScore()
    val arr = if (grp == null) null else ratios.get(grp)
    if (arr != null) return score(text, arr, buckets)
    val (_, t) = tokenRanges(text.getBytes)
    val n = if (t == 0) 0L else 2L * t - 1L
    new GenericInternalRow(Array[Any](n, if (t == 0) 0L else null))
  }
}

/** `string -> array<long>`: the document's hashed-gram bucket ids as
  * ONE codegen call — the profile builders' and batch scorer's explode
  * source (`explode(graft_dsir_buckets(text))` replaces
  * `bucketOf(explode(gramsArray(text)))`).
  */
case class DsirGramBucketsExpr(child: Expression, buckets: Int)
    extends UnaryExpression {

  require(buckets >= 1, "buckets must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_dsir_buckets"

  override def nullSafeEval(input: Any): Any =
    DsirKernel.gramBuckets(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DsirKernel.gramBuckets($c, $buckets);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `string -> struct<n_ngrams: long, logw: long>`: the whole in-row
  * DSIR scoring of the streaming gate as ONE scan projection — the
  * dense ratio model rides to executors as a plan reference. A null
  * text yields `(null, null)` (the struct itself is never null),
  * matching the replaced `struct(size(grams), aggregate(grams, …))`.
  */
case class DsirScoreExpr(child: Expression, ratio: Array[Long], buckets: Int)
    extends UnaryExpression {

  require(ratio.length == buckets,
    s"ratio array length ${ratio.length} != buckets $buckets")

  override def dataType: DataType = StructType(Seq(
    StructField("n_ngrams", LongType, nullable = true),
    StructField("logw", LongType, nullable = true)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_dsir_score"

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) DsirKernel.nullScore()
    else DsirKernel.score(t.asInstanceOf[UTF8String], ratio, buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ratioRef = ctx.addReferenceObj("graftDsirRatio", ratio, "long[]")
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${c.code}
      $javaType ${ev.value} = ${c.isNull}
        ? graft.functions.DsirKernel.nullScore()
        : graft.functions.DsirKernel.score(${c.value}, $ratioRef, $buckets);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `(string, string) -> struct<n_ngrams: long, logw: long>`: the
  * per-group in-row scoring — the group→ratio model map rides as a
  * plan reference; an unknown or null group yields a null `logw`
  * (fail-closed), exactly the `element_at(map_literal, grp)` rule of
  * the replaced Column form.
  */
case class DsirScoreByGroupExpr(left: Expression, right: Expression,
    ratios: Map[String, Array[Long]], buckets: Int) extends BinaryExpression {

  require(ratios.nonEmpty, "empty ratio map")

  @transient private lazy val ratioMap: java.util.HashMap[UTF8String, Array[Long]] = {
    val m = new java.util.HashMap[UTF8String, Array[Long]](ratios.size * 2)
    ratios.foreach { case (g, a) => m.put(UTF8String.fromString(g), a) }
    m
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_ngrams", LongType, nullable = true),
    StructField("logw", LongType, nullable = true)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_dsir_score_by_group"

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    val g = right.eval(input)
    DsirKernel.scoreByGroup(
      t.asInstanceOf[UTF8String], g.asInstanceOf[UTF8String], ratioMap, buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = left.genCode(ctx)
    val g = right.genCode(ctx)
    // raw type: janino-generated code cannot carry generics
    val mapRef = ctx.addReferenceObj("graftDsirRatios", ratioMap,
      "java.util.HashMap")
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${t.code}
      ${g.code}
      $javaType ${ev.value} = graft.functions.DsirKernel.scoreByGroup(
        ${t.isNull} ? null : ${t.value},
        ${g.isNull} ? null : ${g.value}, $mapRef, $buckets);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
