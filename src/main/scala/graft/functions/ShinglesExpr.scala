package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level shingle kernel shared by the interpreted and generated
  * paths of [[ShinglesExpr]]. Operates directly on the UTF-8 bytes of
  * a Tungsten `UTF8String` — no decode to `java.lang.String`, no regex,
  * no re-encode of the result — while replicating
  * [[TextFunctions.distinctShingles]]' semantics EXACTLY (the
  * differential spec in TextFunctionsSuite pins them together):
  *
  *  - tokens are maximal runs of non-`\s` bytes, Java-regex
  *    `\s` = [ \t\n\x0B\f\r ] (ASCII-only by default — NBSP etc. are
  *    NOT separators; multi-byte UTF-8 sequences only use bytes
  *    >= 0x80, so byte scanning is exact). No `String.trim`-style
  *    `<= 0x20` edge strip: edge C0 controls stay attached to their
  *    token, matching the column path and the SQL oracles;
  *  - shingles are the n-token windows joined by a single space,
  *    DISTINCT in first-occurrence order (`UTF8String` equality is
  *    binary equality, same as `String` equality on the decoded text).
  */
object ShinglesKernel {

  private def isSep(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Token byte spans `(starts, ends, count)` of the trimmed text — the
    * ONE byte-level tokenizer under [[ShinglesExpr]] and
    * [[WindowHashesExpr]], positionally identical to
    * [[TextFunctions.tokenize]] / `tokens()` (suite-pinned).
    */
  private[functions] def tokenSpans(bytes: Array[Byte]): (Array[Int], Array[Int], Int) = {
    val lo = 0
    val hi = bytes.length
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var m = 0
    var i = lo
    while (i < hi) {
      while (i < hi && isSep(bytes(i))) i += 1
      if (i < hi) {
        val s = i
        while (i < hi && !isSep(bytes(i))) i += 1
        if (m == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(m) = s
        ends(m) = i
        m += 1
      }
    }
    (starts, ends, m)
  }

  def compute(u: UTF8String, n: Int): ArrayData = {
    if (u == null) return new GenericArrayData(Array.empty[Any])
    val bytes = u.getBytes
    val (starts, ends, m) = tokenSpans(bytes)
    if (m < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var k = 0
      while (k <= m - n) {
        var len = n - 1
        var j = 0
        while (j < n) { len += ends(k + j) - starts(k + j); j += 1 }
        val out = new Array[Byte](len)
        var p = 0
        j = 0
        while (j < n) {
          if (j > 0) { out(p) = 0x20; p += 1 }
          val l = ends(k + j) - starts(k + j)
          System.arraycopy(bytes, starts(k + j), out, p, l)
          p += l
          j += 1
        }
        seen.add(UTF8String.fromBytes(out))
        k += 1
      }
      new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size)))
    }
  }
}

/** `shingles(text, n)` as a native Catalyst expression (the build
  * spec's preference order: native `Expression` > Scala UDF). The UDF
  * form pays a full UTF-8 decode of the document, a regex split over
  * `java.lang.String`, per-shingle `String` allocation, and a
  * re-encode of every output element back to `UTF8String`; this
  * expression slices token byte ranges out of the input and emits
  * `UTF8String`s directly, and its generated code is a single static
  * call that stays inside the WholeStageCodegen span. Shingling sits
  * under every text-dedup/decontamination scan, so this is the
  * hottest text kernel in the engine (measured in PLANS.md round 7).
  *
  * Null text yields an EMPTY array (matching the UDF it replaces, so
  * `shingles` keeps its total-function contract); the expression is
  * therefore never null-producing on its own.
  */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"shingles: n must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    ShinglesKernel.compute(v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.ShinglesKernel.compute(
            ${childGen.isNull} ? null : ${childGen.value}, $n);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Kernel for [[WindowHashesExpr]]: every k-token window's position and
  * the xxhash64 of its space-joined text — computed by hashing the
  * window's bytes assembled in ONE reused scratch buffer. No window
  * string is ever allocated (the UDF form built and re-encoded one per
  * window); hashes equal `xxhash64(window_string)` bit-for-bit because
  * the assembled bytes ARE that string's UTF-8 encoding (suite-pinned).
  */
object WindowHashesKernel {
  def compute(u: UTF8String, k: Int): ArrayData = {
    if (u == null) return new GenericArrayData(Array.empty[Any])
    val bytes = u.getBytes
    val (starts, ends, m) = ShinglesKernel.tokenSpans(bytes)
    if (m < k) new GenericArrayData(Array.empty[Any])
    else {
      // scratch sized to the longest window
      var maxLen = 0
      var w = 0
      while (w <= m - k) {
        var len = k - 1
        var j = 0
        while (j < k) { len += ends(w + j) - starts(w + j); j += 1 }
        if (len > maxLen) maxLen = len
        w += 1
      }
      val buf = new Array[Byte](maxLen)
      val out = new Array[Any](m - k + 1)
      w = 0
      while (w <= m - k) {
        var p = 0
        var j = 0
        while (j < k) {
          if (j > 0) { buf(p) = 0x20; p += 1 }
          val l = ends(w + j) - starts(w + j)
          System.arraycopy(bytes, starts(w + j), buf, p, l)
          p += l
          j += 1
        }
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, p, 42L)
        out(w) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](w, h))
        w += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** `string -> array<struct<pos:int, h:long>>`: the occurrence stream of
  * [[graft.operators.Dedup.maskRepeatedWindows]] as a native
  * expression — window POSITIONS align with `posexplode(tokens(...))`
  * by sharing the byte tokenizer, and window HASHES equal
  * `xxhash64(window_text)` without ever materializing the text.
  */
case class WindowHashesExpr(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, s"windowHashes: k must be positive, got $k")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos", org.apache.spark.sql.types.IntegerType,
        nullable = false),
      org.apache.spark.sql.types.StructField("h", org.apache.spark.sql.types.LongType,
        nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_window_hashes"
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    WindowHashesKernel.compute(v.asInstanceOf[UTF8String], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.WindowHashesKernel.compute(
            ${childGen.isNull} ? null : ${childGen.value}, $k);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Kernel for [[MinHashBandKeysExpr]]: the fused signature+banding
  * pass of `Dedup.minhashBandKeys`, fed by the shingle `UTF8String`s'
  * raw bytes — FNV-1a over bytes equals FNV-1a over the decoded string
  * (both hash the UTF-8 encoding), so band keys are bit-identical to
  * the UDF form it replaces while skipping the per-shingle decode.
  */
object MinHashBandKeysKernel {
  def compute(
      arr: ArrayData, numHashes: Int, bands: Int,
      as: Array[Long], bs: Array[Long]): ArrayData = {
    val rows = numHashes / bands
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val m = arr.numElements()
    var e = 0
    while (e < m) {
      val base = Hashing.fnv1a64(arr.getUTF8String(e).getBytes)
      var i = 0
      while (i < numHashes) {
        val h = as(i) * base + bs(i)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      e += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var k = 0xcbf29ce484222325L
      var r = 0
      while (r < rows) {
        k = Hashing.splitmix64(k ^ sig(b * rows + r))
        r += 1
      }
      out(b) = k
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<string> -> array<long>`: MinHash band keys as a native
  * expression. The O(|shingles| × numHashes) signature loop was
  * already fused in the UDF form; this removes the remaining
  * per-shingle `UTF8String -> String` decode at the catalyst boundary
  * and keeps the call inside the WholeStageCodegen span.
  */
case class MinHashBandKeysExpr(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {

  require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")

  // per-permutation affine constants, precomputed once per plan
  private val as = Array.tabulate(numHashes)(i => Hashing.splitmix64(2L * i) | 1L)
  private val bs = Array.tabulate(numHashes)(i => Hashing.splitmix64(2L * i + 1))

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def prettyName: String = "graft_minhash_band_keys"

  override def nullSafeEval(input: Any): Any =
    MinHashBandKeysKernel.compute(input.asInstanceOf[ArrayData], numHashes, bands, as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("graftMinhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("graftMinhashBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashBandKeysKernel.compute(" +
        s"$c, $numHashes, $bands, $asRef, $bsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Kernel for [[SimHash64Expr]]: tokenize the text's bytes with the
  * shared span tokenizer (positionally identical to
  * `TextFunctions.tokens` — suite-pinned) and fold each token's FNV-1a
  * hash into the 64 SimHash bit counters, hashing token byte ranges in
  * place. Values are bit-identical to
  * `simhash64_udf(tokens(text))` because FNV over the span bytes
  * equals FNV over the decoded token string.
  */
object SimHashKernel {
  def compute(u: UTF8String): Long = {
    if (u == null) return 0L // empty token multiset, all counters at -0 -> sign bits 0
    val bytes = u.getBytes
    val (starts, ends, m) = ShinglesKernel.tokenSpans(bytes)
    val acc = new Array[Int](64)
    var t = 0
    while (t < m) {
      val h = Hashing.fnv1a64(bytes, starts(t), ends(t))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
        j += 1
      }
      t += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }
}

/** `string -> bigint`: 64-bit SimHash of the token multiset as a native
  * expression. Replaces the former `simhash64(tokens(text))` UDF chain:
  * the tokens ARRAY is never materialized (the spans feed the bit
  * counters directly), no UTF-8 decode happens, and the call stays
  * inside the WholeStageCodegen span. Null text hashes like an empty
  * document (signature 0), keeping the total-function contract of the
  * UDF it replaces.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_simhash64"
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    SimHashKernel.compute(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        long ${ev.value} = graft.functions.SimHashKernel.compute(
          ${childGen.isNull} ? null : ${childGen.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Kernel for [[BloomHitsExpr]]: xxhash64 each shingle's UTF-8 bytes
  * (identical to the `xxhash64` expression — same XXH64, same seed 42,
  * no decode to `String`) and keep the hashes the Bloom filter accepts.
  */
object BloomHitsKernel {
  def compute(arr: ArrayData, bloom: org.apache.spark.util.sketch.BloomFilter): ArrayData = {
    val m = arr.numElements()
    val hits = Array.newBuilder[Long]
    var i = 0
    while (i < m) {
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        arr.getUTF8String(i), StringType, 42L)
      if (bloom.mightContainLong(h)) hits += h
      i += 1
    }
    new GenericArrayData(hits.result())
  }
}

/** `array<string> -> array<long>`: the Bloom-filter membership probe of
  * Decontaminate's prefilter path as a native expression. A UDF here
  * would force catalyst to DECODE every shingle `UTF8String` into a
  * `java.lang.String` just so the UDF can hash its re-encoded bytes;
  * this expression hashes the Tungsten bytes in place and emits a
  * primitive long array. The filter rides the expression into the
  * executors via a plan reference (`addReferenceObj`), codegen is one
  * static call inside the whole-stage span.
  */
case class BloomHitsExpr(
    child: Expression,
    bloom: org.apache.spark.util.sketch.BloomFilter) extends UnaryExpression {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def prettyName: String = "graft_bloom_hits"

  override def nullSafeEval(input: Any): Any =
    BloomHitsKernel.compute(input.asInstanceOf[ArrayData], bloom)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("graftBloom", bloom,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BloomHitsKernel.compute($c, $bloomRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortedHitCountKernel {
  def compute(arr: ArrayData, sorted: Array[Long]): Long = {
    val m = arr.numElements()
    var i = 0
    var c = 0L
    while (i < m) {
      if (java.util.Arrays.binarySearch(sorted, arr.getLong(i)) >= 0) c += 1
      i += 1
    }
    c
  }
}

/** `array<long> -> long`: exact membership count of candidate hashes in
  * a sorted 64-bit hash set, via binary search. This is the streaming
  * decontamination gate's in-row EXACT confirm: the Bloom prefilter
  * ([[BloomHitsExpr]]) emits the might-contain hashes, this expression
  * counts the true hits, and the whole contamination decision stays a
  * stateless scan projection — no stream-static join, no aggregation
  * state, append mode. The sorted array rides to executors as a plan
  * reference (one broadcast-task-binary copy per executor, 8 bytes per
  * eval shingle); binary search costs log2(|eval|) probes but only
  * Bloom SURVIVORS (~contamination + fpp of shingles) ever pay it.
  */
case class SortedHitCountExpr(
    child: Expression,
    sorted: Array[Long]) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_sorted_hit_count"

  override def nullSafeEval(input: Any): Any =
    SortedHitCountKernel.compute(input.asInstanceOf[ArrayData], sorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("graftSortedSet", sorted, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SortedHitCountKernel.compute($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
