package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** In-row bigram LM scoring kernel for the streaming quality gate:
  * tokenizes the UTF-8 bytes with EXACTLY
  * [[TextFunctions.tokens]]' semantics (trim of chars <= U+0020,
  * split on ASCII `\s` runs, empties dropped — the byte-level rules
  * [[ShinglesKernel]] pins against the Column form), hashes each
  * token and adjacent pair with Spark's own `XxHash64Function` chain
  * (`xxhash64(w)` = seed 42; `xxhash64(w1, w2)` = w2 hashed with
  * w1's hash as seed — bit-identical to the batch path's keys), looks
  * both up in the PRUNED model's sorted key arrays by binary search,
  * and folds the add-one-smoothed log-probability on the exact
  * 1e-4-grid long ([[graft.operators.LangModel]]'s determinism
  * contract: floor4 right after the `ln`, long sums, order-free).
  *
  * Returns `(n_bigrams, lp_sum)`; a doc with < 2 tokens scores
  * `(0, 0)`.
  */
object LmScoreKernel {

  private def isSep(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  def compute(
      text: UTF8String,
      bigramKeys: Array[Long], bigramCounts: Array[Long],
      unigramKeys: Array[Long], unigramCounts: Array[Long],
      vocab: Long): InternalRow = {
    val bytes = text.getBytes
    // trim: String.trim strips chars <= U+0020 == bytes <= 0x20 in UTF-8
    val lo = 0
    val hi = bytes.length
    // token ranges
    var n = 0L
    var lpSum = 0L
    var prevHash = 0L          // xxhash64(w_{i-1}) with seed 42
    var i = lo
    var first = true
    while (i < hi) {
      while (i < hi && isSep(bytes(i))) i += 1
      if (i < hi) {
        val s = i
        while (i < hi && !isSep(bytes(i))) i += 1
        val tok = UTF8String.fromBytes(bytes, s, i - s)
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(tok, StringType, 42L)
        if (!first) {
          // xxhash64(w1, w2): w2 hashed with w1's hash-from-seed-42 as
          // seed — prevHash is exactly that value already
          val bh = org.apache.spark.sql.catalyst.expressions.XxHash64Function
            .hash(tok, StringType, prevHash)
          val cb =
            if (bigramKeys.length == 0) 0L
            else {
              val p = java.util.Arrays.binarySearch(bigramKeys, bh)
              if (p >= 0) bigramCounts(p) else 0L
            }
          val cu =
            if (unigramKeys.length == 0) 0L
            else {
              val p = java.util.Arrays.binarySearch(unigramKeys, prevHash)
              if (p >= 0) unigramCounts(p) else 0L
            }
          lpSum += math.floor(
            math.log((cb + 1.0) / (cu + vocab.toDouble)) * 10000.0).toLong
          n += 1L
        }
        prevHash = h
        first = false
      }
    }
    InternalRow(n, lpSum)
  }
}

/** Order-3 sibling of [[LmScoreKernel]]: stupid-backoff scoring
  * ([[graft.operators.LangModel.scoreAgainst3]]'s arithmetic, exactly
  * — same double evaluation order, floor4 after the `ln`, long sums)
  * over sorted pruned trigram/bigram/unigram arrays. The hash chains
  * reproduce Spark's `xxhash64(w1, w2, w3)` (each argument hashed
  * with the previous chain value as seed, from 42), so model keys
  * built by the batch aggregations match bit-for-bit.
  *
  * Returns `(n_trigrams, lp_sum)`; a doc with < 3 tokens scores
  * `(0, 0)`.
  */
object LmScore3Kernel {

  private def isSep(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  private def lookup(keys: Array[Long], counts: Array[Long], h: Long): Long =
    if (keys.length == 0) 0L
    else {
      val p = java.util.Arrays.binarySearch(keys, h)
      if (p >= 0) counts(p) else 0L
    }

  def compute(
      text: UTF8String,
      triKeys: Array[Long], triCounts: Array[Long],
      biKeys: Array[Long], biCounts: Array[Long],
      uniKeys: Array[Long], uniCounts: Array[Long],
      vocab: Long, nTokens: Long): InternalRow = {
    val bytes = text.getBytes
    val lo = 0
    val hi = bytes.length
    var n = 0L
    var lpSum = 0L
    var hPrev = 0L   // xxhash64(w_{i-1}) from seed 42
    var pPrev = 0L   // xxhash64(w_{i-2}, w_{i-1}) chain
    var seen = 0
    var i = lo
    while (i < hi) {
      while (i < hi && isSep(bytes(i))) i += 1
      if (i < hi) {
        val s = i
        while (i < hi && !isSep(bytes(i))) i += 1
        val tok = UTF8String.fromBytes(bytes, s, i - s)
        val F = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        val h = F.hash(tok, StringType, 42L)
        val p = if (seen >= 1) F.hash(tok, StringType, hPrev) else 0L
        if (seen >= 2) {
          val tr = F.hash(tok, StringType, pPrev)
          val c3 = lookup(triKeys, triCounts, tr)
          val c12 = lookup(biKeys, biCounts, pPrev)
          val x =
            if (c3 > 0 && c12 > 0) c3 * 1.0 / c12
            else {
              val c23 = lookup(biKeys, biCounts, p)
              val c2 = lookup(uniKeys, uniCounts, hPrev)
              if (c23 > 0 && c2 > 0) 0.4 * c23 / c2
              else {
                val c3u = lookup(uniKeys, uniCounts, h)
                0.16 * (c3u + 1.0) / (nTokens + vocab)
              }
            }
          lpSum += math.floor(math.log(x) * 10000.0).toLong
          n += 1L
        }
        pPrev = p
        hPrev = h
        seen += 1
      }
    }
    InternalRow(n, lpSum)
  }
}

/** Interpolated Kneser–Ney sibling of [[LmScoreKernel]]: per bigram
  * position, the discounted ratio interpolated with the continuation
  * probability ([[graft.operators.LangModel.scoreAgainstKN]]'s
  * arithmetic exactly — same paren/double order), over sorted pruned
  * arrays: bigram counts, unigram counts, per-word distinct
  * continuation counts (`N1+(w1·)`) and distinct left-context counts
  * (`N1+(·w2)`), plus the scalar bigram-type total `B` and vocab `V`.
  *
  * Returns `(n_bigrams, lp_sum)`; a doc with < 2 tokens scores
  * `(0, 0)`.
  */
object LmScoreKnKernel {

  private def isSep(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  private def lookup(keys: Array[Long], counts: Array[Long], h: Long): Long =
    if (keys.length == 0) 0L
    else {
      val p = java.util.Arrays.binarySearch(keys, h)
      if (p >= 0) counts(p) else 0L
    }

  def compute(
      text: UTF8String,
      biKeys: Array[Long], biCounts: Array[Long],
      uniKeys: Array[Long], uniCounts: Array[Long],
      fwKeys: Array[Long], fwCounts: Array[Long],
      bwKeys: Array[Long], bwCounts: Array[Long],
      bTypes: Long, vocab: Long): InternalRow = {
    val bytes = text.getBytes
    val lo = 0
    val hi = bytes.length
    var n = 0L
    var lpSum = 0L
    var prevHash = 0L
    var i = lo
    var first = true
    while (i < hi) {
      while (i < hi && isSep(bytes(i))) i += 1
      if (i < hi) {
        val s = i
        while (i < hi && !isSep(bytes(i))) i += 1
        val tok = UTF8String.fromBytes(bytes, s, i - s)
        val F = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        val h = F.hash(tok, StringType, 42L)
        if (!first) {
          val bh = F.hash(tok, StringType, prevHash)
          val pc = (lookup(bwKeys, bwCounts, h) + 1.0) / (bTypes + vocab)
          val cu = lookup(uniKeys, uniCounts, prevHash)
          val x =
            if (cu > 0) {
              val cb = lookup(biKeys, biCounts, bh)
              val n1p = lookup(fwKeys, fwCounts, prevHash)
              (math.max(cb - 0.75, 0.0) / cu) + ((0.75 * n1p / cu) * pc)
            } else pc
          lpSum += math.floor(math.log(x) * 10000.0).toLong
          n += 1L
        }
        prevHash = h
        first = false
      }
    }
    InternalRow(n, lpSum)
  }
}

/** ORDER-N sibling of [[LmScore3Kernel]]: the stupid-backoff walk
  * generalized to arbitrary order with ONE sorted key/count array per
  * order (`keys(k-1)` holds the k-grams) and a ring of hash-chain
  * values — `chain(k)` is Spark's `xxhash64` of the k-gram ending at
  * the current token, computed incrementally from the previous
  * token's `chain(k-1)` (each token hashed with the prior chain value
  * as seed, from 42), so every lookup key matches the batch
  * aggregations bit-for-bit. Backoff factors are the repeated product
  * `0.4·0.4·…` ([[graft.operators.LangModel.backoffFactors]] — the
  * N=3 instance therefore agrees with [[LmScore3Kernel]] only up to
  * the final ulp of its literal `0.16`).
  *
  * Returns `(n_ngrams, lp_sum)`; a doc with < order tokens scores
  * `(0, 0)`.
  */
object LmScoreNKernel {

  private def isSep(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  private def lookup(keys: Array[Long], counts: Array[Long], h: Long): Long =
    if (keys.length == 0) 0L
    else {
      val p = java.util.Arrays.binarySearch(keys, h)
      if (p >= 0) counts(p) else 0L
    }

  def compute(
      text: UTF8String, order: Int,
      keys: Array[Array[Long]], counts: Array[Array[Long]],
      vocab: Long, nTokens: Long): InternalRow = {
    val bytes = text.getBytes
    val lo = 0
    val hi = bytes.length
    val factors = graft.operators.LangModel.backoffFactors(order)
    // chainPrev(k) / chainCur(k): xxhash64 of the k-gram ending at the
    // previous / current token (1-indexed; valid when enough seen)
    val chainPrev = new Array[Long](order + 1)
    val chainCur = new Array[Long](order + 1)
    var seen = 0
    var n = 0L
    var lpSum = 0L
    var i = lo
    while (i < hi) {
      while (i < hi && isSep(bytes(i))) i += 1
      if (i < hi) {
        val s = i
        while (i < hi && !isSep(bytes(i))) i += 1
        val tok = UTF8String.fromBytes(bytes, s, i - s)
        val F = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        chainCur(1) = F.hash(tok, StringType, 42L)
        var k = 2
        while (k <= order) {
          chainCur(k) = if (seen >= k - 1) F.hash(tok, StringType, chainPrev(k - 1)) else 0L
          k += 1
        }
        if (seen >= order - 1) {
          // level j: numerator = (order−j)-gram ending HERE, denominator
          // = (order−1−j)-gram ending at the previous token
          var x = 0.0
          var hit = false
          var j = 0
          while (j <= order - 2 && !hit) {
            val cn = lookup(keys(order - j - 1), counts(order - j - 1),
              chainCur(order - j))
            val cd = lookup(keys(order - j - 2), counts(order - j - 2),
              chainPrev(order - j - 1))
            if (cn > 0 && cd > 0) {
              x = factors(j) * cn / cd
              hit = true
            }
            j += 1
          }
          if (!hit) {
            val cl = lookup(keys(0), counts(0), chainCur(1))
            x = factors(order - 1) * (cl + 1.0) / (nTokens + vocab)
          }
          lpSum += math.floor(math.log(x) * 10000.0).toLong
          n += 1L
        }
        System.arraycopy(chainCur, 0, chainPrev, 0, order + 1)
        seen += 1
      }
    }
    InternalRow(n, lpSum)
  }
}

/** `string -> struct<n_bigrams: long, lp_sum: long>`: the whole
  * per-document LM scoring of the streaming gate as ONE scan
  * projection — the pruned model rides to executors as plan
  * references (sorted key/count arrays), so scoring needs no join,
  * no aggregation, and no state: exactly what lets the quality gate
  * run on a stream.
  */
case class LmScoreExpr(
    child: Expression,
    bigramKeys: Array[Long], bigramCounts: Array[Long],
    unigramKeys: Array[Long], unigramCounts: Array[Long],
    vocab: Long) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("lp_sum", LongType, nullable = false)))
  override def prettyName: String = "graft_lm_score"

  override def nullSafeEval(input: Any): Any =
    LmScoreKernel.compute(input.asInstanceOf[UTF8String],
      bigramKeys, bigramCounts, unigramKeys, unigramCounts, vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bk = ctx.addReferenceObj("graftLmBk", bigramKeys, "long[]")
    val bc = ctx.addReferenceObj("graftLmBc", bigramCounts, "long[]")
    val uk = ctx.addReferenceObj("graftLmUk", unigramKeys, "long[]")
    val uc = ctx.addReferenceObj("graftLmUc", unigramCounts, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LmScoreKernel.compute($c, $bk, $bc, $uk, $uc, ${vocab}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `string -> struct<n_bigrams: long, lp_sum: long>`: interpolated-KN
  * scoring as ONE scan projection ([[LmScoreKnKernel]]) — the
  * streaming-gate shape for the KN model; all six count arrays ride
  * as plan references.
  */
case class LmScoreKnExpr(
    child: Expression,
    biKeys: Array[Long], biCounts: Array[Long],
    uniKeys: Array[Long], uniCounts: Array[Long],
    fwKeys: Array[Long], fwCounts: Array[Long],
    bwKeys: Array[Long], bwCounts: Array[Long],
    bTypes: Long, vocab: Long) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("lp_sum", LongType, nullable = false)))
  override def prettyName: String = "graft_lm_score_kn"

  override def nullSafeEval(input: Any): Any =
    LmScoreKnKernel.compute(input.asInstanceOf[UTF8String],
      biKeys, biCounts, uniKeys, uniCounts,
      fwKeys, fwCounts, bwKeys, bwCounts, bTypes, vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bk = ctx.addReferenceObj("graftKnBk", biKeys, "long[]")
    val bc = ctx.addReferenceObj("graftKnBc", biCounts, "long[]")
    val uk = ctx.addReferenceObj("graftKnUk", uniKeys, "long[]")
    val uc = ctx.addReferenceObj("graftKnUc", uniCounts, "long[]")
    val fk = ctx.addReferenceObj("graftKnFk", fwKeys, "long[]")
    val fc = ctx.addReferenceObj("graftKnFc", fwCounts, "long[]")
    val wk = ctx.addReferenceObj("graftKnWk", bwKeys, "long[]")
    val wc = ctx.addReferenceObj("graftKnWc", bwCounts, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LmScoreKnKernel.compute($c, $bk, $bc, $uk, $uc, $fk, $fc, $wk, $wc, ${bTypes}L, ${vocab}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `string -> struct<n_ngrams: long, lp_sum: long>`: order-N
  * stupid-backoff scoring as ONE scan projection ([[LmScoreNKernel]])
  * — the streaming-gate shape at arbitrary order; the per-order
  * key/count arrays ride as plan references.
  */
case class LmScoreNExpr(
    child: Expression,
    order: Int,
    keys: Array[Array[Long]], counts: Array[Array[Long]],
    vocab: Long, nTokens: Long) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_ngrams", LongType, nullable = false),
    StructField("lp_sum", LongType, nullable = false)))
  override def prettyName: String = "graft_lm_score_n"

  override def nullSafeEval(input: Any): Any =
    LmScoreNKernel.compute(input.asInstanceOf[UTF8String],
      order, keys, counts, vocab, nTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ks = ctx.addReferenceObj("graftLmNKs", keys, "long[][]")
    val cs = ctx.addReferenceObj("graftLmNCs", counts, "long[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LmScoreNKernel.compute($c, $order, $ks, $cs, ${vocab}L, ${nTokens}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `string -> struct<n_trigrams: long, lp_sum: long>`: order-3
  * stupid-backoff scoring as ONE scan projection ([[LmScore3Kernel]])
  * — the streaming-gate shape at order 3.
  */
case class LmScore3Expr(
    child: Expression,
    trigramKeys: Array[Long], trigramCounts: Array[Long],
    bigramKeys: Array[Long], bigramCounts: Array[Long],
    unigramKeys: Array[Long], unigramCounts: Array[Long],
    vocab: Long, nTokens: Long) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_trigrams", LongType, nullable = false),
    StructField("lp_sum", LongType, nullable = false)))
  override def prettyName: String = "graft_lm_score3"

  override def nullSafeEval(input: Any): Any =
    LmScore3Kernel.compute(input.asInstanceOf[UTF8String],
      trigramKeys, trigramCounts, bigramKeys, bigramCounts,
      unigramKeys, unigramCounts, vocab, nTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tk = ctx.addReferenceObj("graftLm3Tk", trigramKeys, "long[]")
    val tc = ctx.addReferenceObj("graftLm3Tc", trigramCounts, "long[]")
    val bk = ctx.addReferenceObj("graftLm3Bk", bigramKeys, "long[]")
    val bc = ctx.addReferenceObj("graftLm3Bc", bigramCounts, "long[]")
    val uk = ctx.addReferenceObj("graftLm3Uk", unigramKeys, "long[]")
    val uc = ctx.addReferenceObj("graftLm3Uc", unigramCounts, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LmScore3Kernel.compute($c, $tk, $tc, $bk, $bc, $uk, $uc, ${vocab}L, ${nTokens}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
