package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled unigram-LM tokenizer vocabulary: piece byte strings with
  * their 1e-4-grid log-probability scores (exact longs — the same
  * grid the LM/DSIR kernels ride), plus a bounded per-JVM cache of
  * word segmentations. Serializable; ships to executors as a plan
  * reference, the transient structures refill locally.
  *
  * The unknown-byte floor is DERIVED, not stored: one grid unit of
  * 1.0 (10000) below the vocabulary minimum — any single byte the
  * training never saw segments as itself at that score, keeping the
  * tokenizer total without an UNK table.
  */
final class UnigramModel(
    val pieces: Array[Array[Byte]], val scores: Array[Long]) extends Serializable {
  require(pieces.nonEmpty, "UnigramModel: empty vocabulary")

  val maxLen: Int = pieces.map(_.length).max
  val unkScore: Long = scores.min - 10000L

  @transient lazy val scoreMap: java.util.HashMap[String, java.lang.Long] = {
    val h = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      h.put(new String(pieces(i), java.nio.charset.StandardCharsets.ISO_8859_1),
        java.lang.Long.valueOf(scores(i)))
      i += 1
    }
    h
  }

  /** Piece bytes → vocabulary id. Ids are the piece's index in the
    * hex-sorted vocabulary (the artifact's storage order — a fixed,
    * engine-reproducible assignment); single bytes the vocabulary
    * lacks get the FALLBACK range `V + byte` (256 reserved ids), so
    * encode is total and decode lossless without an UNK collapse.
    */
  @transient lazy val idMap: java.util.HashMap[String, Integer] = {
    val h = new java.util.HashMap[String, Integer](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      h.put(new String(pieces(i), java.nio.charset.StandardCharsets.ISO_8859_1),
        Integer.valueOf(i))
      i += 1
    }
    h
  }

  @transient lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
}

/** Viterbi segmentation under a [[UnigramModel]] — the serving kernel
  * of the unigram tokenizer. The dynamic program is EXACT long
  * arithmetic over grid scores, and the backtrace tie rule (largest
  * piece on equal path scores) matches the SQL replay's
  * `ORDER BY k DESC` pick, so Spark and DuckDB segment every word
  * identically.
  */
object UnigramKernel {

  private val Hex = "0123456789ABCDEF".toCharArray
  // far below any reachable dp value (scores are small negative grid
  // longs), never equal to one, and safe to add a score to
  private val Sent = Long.MinValue / 4

  def compile(vocab: Seq[(String, Long)]): UnigramModel = {
    def un(h: String): Array[Byte] = {
      require(h.length % 2 == 0 && h.nonEmpty, s"bad hex piece: $h")
      Array.tabulate(h.length / 2)(i =>
        Integer.parseInt(h.substring(2 * i, 2 * i + 2), 16).toByte)
    }
    // hex-sort defensively: ids are positional, and the artifact's
    // storage order (hex-sorted) must hold for any caller-supplied
    // ordering of the same vocabulary
    val sorted = vocab.sortBy(_._1)
    new UnigramModel(sorted.map(v => un(v._1)).toArray, sorted.map(_._2).toArray)
  }

  private def pieceScore(
      bytes: Array[Byte], off: Int, len: Int, m: UnigramModel): java.lang.Long =
    m.scoreMap.get(
      new String(bytes, off, len, java.nio.charset.StandardCharsets.ISO_8859_1))

  /** Piece byte-lengths of ONE word, in order: forward Viterbi
    * (`dp[i] = max over k of dp[i-k] + score(piece ending at i)`, with
    * the unknown-byte floor making `k = 1` always viable), then a
    * backtrace choosing the LARGEST k on score ties.
    */
  private[graft] def segment(
      bytes: Array[Byte], s: Int, e: Int, m: UnigramModel): Array[Int] = {
    val L = e - s
    if (L == 0) return Array.empty
    val dp = new Array[Long](L + 1)
    var i = 1
    while (i <= L) {
      var best = Sent
      val maxK = math.min(m.maxLen, i)
      var k = 1
      while (k <= maxK) {
        val ps = pieceScore(bytes, s + i - k, k, m)
        val cand =
          if (ps != null) dp(i - k) + ps.longValue()
          else if (k == 1) dp(i - k) + m.unkScore
          else Sent
        if (cand > best) best = cand
        k += 1
      }
      dp(i) = best
      i += 1
    }
    val out = new Array[Int](L) // at most L pieces
    var w = 0
    var pos = L
    while (pos > 0) {
      var chosen = -1
      var k = math.min(m.maxLen, pos)
      while (k >= 1 && chosen < 0) {
        val ps = pieceScore(bytes, s + pos - k, k, m)
        val cand =
          if (ps != null) dp(pos - k) + ps.longValue()
          else if (k == 1) dp(pos - k) + m.unkScore
          else Sent
        if (cand != Sent && cand == dp(pos)) chosen = k
        k -= 1
      }
      out(w) = chosen // k = 1 is always viable, so chosen >= 1
      w += 1
      pos -= chosen
    }
    // emitted back-to-front: reverse into order
    val lens = new Array[Int](w)
    var j = 0
    while (j < w) { lens(j) = out(w - 1 - j); j += 1 }
    lens
  }

  private val CacheCap = 1 << 16

  private def wordLens(bytes: Array[Byte], s: Int, e: Int, m: UnigramModel): Array[Int] = {
    val key = new String(bytes, s, e - s, java.nio.charset.StandardCharsets.ISO_8859_1)
    val hit = m.cache.get(key)
    if (hit != null) return hit
    val lens = segment(bytes, s, e, m)
    if (m.cache.size < CacheCap) m.cache.put(key, lens)
    lens
  }

  /** Unigram token count of the whole document (0 for null/blank). */
  def count(u: UTF8String, m: UnigramModel): Int = {
    if (u == null) return 0
    val bytes = u.getBytes
    val (starts, ends, nw) = ShinglesKernel.tokenSpans(bytes)
    var total = 0
    var w = 0
    while (w < nw) {
      total += wordLens(bytes, starts(w), ends(w), m).length
      w += 1
    }
    total
  }

  /** The document's unigram tokens as UPPERCASE HEX strings, word
    * piece lists concatenated in order — hex for the same reason as
    * [[BpeKernel.tokensHex]]: a piece may end mid-UTF-8-sequence, and
    * `hex()` agrees byte-for-byte between Spark and DuckDB.
    */
  def tokensHex(u: UTF8String, m: UnigramModel): ArrayData = {
    if (u == null) return new GenericArrayData(Array.empty[Any])
    val bytes = u.getBytes
    val (starts, ends, nw) = ShinglesKernel.tokenSpans(bytes)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var w = 0
    while (w < nw) {
      val lens = wordLens(bytes, starts(w), ends(w), m)
      var off = starts(w)
      var t = 0
      while (t < lens.length) {
        val hex = new Array[Byte](2 * lens(t))
        var i = 0
        while (i < lens(t)) {
          val b = bytes(off + i) & 0xff
          hex(2 * i) = Hex(b >>> 4).toByte
          hex(2 * i + 1) = Hex(b & 0xf).toByte
          i += 1
        }
        out += UTF8String.fromBytes(hex)
        off += lens(t)
        t += 1
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** The document's unigram tokens as VOCABULARY IDS in order: the
    * piece's hex-sorted index, or `V + byte` for an unknown single
    * byte ([[UnigramModel.idMap]]'s fallback range) — text→ids for the
    * training consumer, total over any text.
    */
  def tokenIds(u: UTF8String, m: UnigramModel): ArrayData = {
    if (u == null) return new GenericArrayData(Array.empty[Any])
    val bytes = u.getBytes
    val (starts, ends, nw) = ShinglesKernel.tokenSpans(bytes)
    val ids = m.idMap
    val v = m.pieces.length
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var w = 0
    while (w < nw) {
      val lens = wordLens(bytes, starts(w), ends(w), m)
      var off = starts(w)
      var t = 0
      while (t < lens.length) {
        val key = new String(bytes, off, lens(t),
          java.nio.charset.StandardCharsets.ISO_8859_1)
        val id = ids.get(key)
        if (id != null) out += id.intValue()
        else {
          // the segmenter only ever emits out-of-vocabulary pieces as
          // SINGLE bytes (the unk floor), so this is the byte range
          if (lens(t) != 1) throw new IllegalStateException(
            s"unigram piece of length ${lens(t)} not in the vocabulary — " +
              "tokens were produced with a different vocabulary")
          out += (v + (bytes(off) & 0xff))
        }
        off += lens(t)
        t += 1
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** ids → text, the exact inverse of [[tokenIds]] up to the
    * pre-tokenizer (same contract as [[BpeKernel.decode]]): id < V is
    * a vocabulary piece, `V ≤ id < V + 256` the unknown-byte fallback;
    * anything else is a vocabulary mismatch and fails loudly.
    */
  def decode(ids: ArrayData, m: UnigramModel): UTF8String = {
    if (ids == null || ids.numElements() == 0) return UTF8String.EMPTY_UTF8
    val v = m.pieces.length
    val n = ids.numElements()
    var len = 0
    var i = 0
    while (i < n) {
      val id = ids.getInt(i)
      if (id < 0 || id >= v + 256) throw new IllegalArgumentException(
        s"unigram id $id outside the vocabulary [0, ${v + 256}) — " +
          "ids were produced with a different vocabulary")
      len += (if (id < v) m.pieces(id).length else 1)
      i += 1
    }
    val out = new Array[Byte](len)
    var off = 0
    i = 0
    while (i < n) {
      val id = ids.getInt(i)
      if (id < v) {
        val p = m.pieces(id)
        System.arraycopy(p, 0, out, off, p.length)
        off += p.length
      } else {
        out(off) = (id - v).toByte
        off += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** `unigram_tokens(text)`: the document's unigram-LM tokens as hex
  * strings. Total function: null/blank → empty array.
  */
case class UnigramTokensExpr(child: Expression, vocab: Seq[(String, Long)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unigram_tokens"
  override def nullable: Boolean = false

  @transient private lazy val model: UnigramModel = UnigramKernel.compile(vocab)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    UnigramKernel.tokensHex(v.asInstanceOf[UTF8String], model)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("graftUnigramModel", model, classOf[UnigramModel].getName)
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.UnigramKernel.tokensHex(
            ${childGen.isNull} ? null : ${childGen.value}, $mRef);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `unigram_count(text)`: subword token count under a trained unigram
  * vocabulary — [[BpeCountExpr]]'s drop-in sibling for token budgets.
  * Total function: null/blank → 0.
  */
case class UnigramCountExpr(child: Expression, vocab: Seq[(String, Long)])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_unigram_count"
  override def nullable: Boolean = false

  @transient private lazy val model: UnigramModel = UnigramKernel.compile(vocab)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    UnigramKernel.count(v.asInstanceOf[UTF8String], model)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("graftUnigramModel", model, classOf[UnigramModel].getName)
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        int ${ev.value} = graft.functions.UnigramKernel.count(
          ${childGen.isNull} ? null : ${childGen.value}, $mRef);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `unigram_token_ids(text)`: the document's unigram tokens as
  * vocabulary ids ([[UnigramKernel.tokenIds]]) — text→ids for the
  * training consumer. Total function: null/blank → empty array.
  */
case class UnigramIdsExpr(child: Expression, vocab: Seq[(String, Long)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_unigram_token_ids"
  override def nullable: Boolean = false

  @transient private lazy val model: UnigramModel = UnigramKernel.compile(vocab)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    UnigramKernel.tokenIds(v.asInstanceOf[UTF8String], model)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("graftUnigramModel", model, classOf[UnigramModel].getName)
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.UnigramKernel.tokenIds(
            ${childGen.isNull} ? null : ${childGen.value}, $mRef);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `unigram_decode(ids)`: ids → text ([[UnigramKernel.decode]]) — the
  * serving/audit inverse of [[UnigramIdsExpr]] up to the
  * pre-tokenizer. Total on null/empty input (→ empty string).
  */
case class UnigramDecodeExpr(child: Expression, vocab: Seq[(String, Long)])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unigram_decode"
  override def nullable: Boolean = false

  @transient private lazy val model: UnigramModel = UnigramKernel.compile(vocab)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    UnigramKernel.decode(v.asInstanceOf[ArrayData], model)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("graftUnigramModel", model, classOf[UnigramModel].getName)
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.unsafe.types.UTF8String ${ev.value} =
          graft.functions.UnigramKernel.decode(
            ${childGen.isNull} ? null : ${childGen.value}, $mRef);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
