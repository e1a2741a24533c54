package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled byte-level BPE merge list: rank-ordered `(left, right)`
  * token byte strings, plus a bounded per-JVM cache of word
  * tokenizations (Zipf makes the distinct-word working set tiny next
  * to the token stream, so almost every word hits the cache).
  *
  * Serializable — expressions ship it to executors as a plan
  * reference (`addReferenceObj`), never a closure; the cache is
  * transient and refills locally on each executor.
  */
final class BpeModel(
    val left: Array[Array[Byte]], val right: Array[Array[Byte]]) extends Serializable {
  @transient lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()

  /** `(left, right)` byte pair → lowest rank, for the priority-merge
    * inference kernel — built once per executor, O(numMerges).
    */
  @transient lazy val pairRank: java.util.HashMap[String, Integer] = {
    val h = new java.util.HashMap[String, Integer](left.length * 2)
    var i = 0
    while (i < left.length) {
      h.putIfAbsent(
        BpeKernel.pairKey(left(i), 0, left(i).length, right(i), 0, right(i).length),
        Integer.valueOf(i))
      i += 1
    }
    h
  }

  /** Token bytes (ISO-8859-1 key) → vocabulary id: ids 0–255 are the
    * single bytes, `256 + rank` the merge outputs (lowest rank wins on
    * a duplicate concatenation) — the fixed id assignment every
    * rank-ordered BPE vocabulary uses.
    */
  @transient lazy val tokenId: java.util.HashMap[String, Integer] = {
    val h = new java.util.HashMap[String, Integer](left.length * 2 + 512)
    var b = 0
    while (b < 256) {
      h.put(new String(Array(b.toByte), java.nio.charset.StandardCharsets.ISO_8859_1),
        Integer.valueOf(b))
      b += 1
    }
    var i = 0
    while (i < left.length) {
      val tok = new Array[Byte](left(i).length + right(i).length)
      System.arraycopy(left(i), 0, tok, 0, left(i).length)
      System.arraycopy(right(i), 0, tok, left(i).length, right(i).length)
      h.putIfAbsent(
        new String(tok, java.nio.charset.StandardCharsets.ISO_8859_1),
        Integer.valueOf(256 + i))
      i += 1
    }
    h
  }

  /** Vocabulary id → token bytes — the inverse of [[tokenId]]'s fixed
    * assignment (0–255 single bytes, 256+rank the merge outputs).
    * Decode never consults the dedup in [[tokenId]]: two merges that
    * concatenate to the same bytes are distinct ids with identical
    * byte expansions, so decode stays total over every id the encoder
    * can emit.
    */
  @transient lazy val idBytes: Array[Array[Byte]] = {
    val a = new Array[Array[Byte]](256 + left.length)
    var b = 0
    while (b < 256) { a(b) = Array(b.toByte); b += 1 }
    var i = 0
    while (i < left.length) {
      val tok = new Array[Byte](left(i).length + right(i).length)
      System.arraycopy(left(i), 0, tok, 0, left(i).length)
      System.arraycopy(right(i), 0, tok, left(i).length, right(i).length)
      a(256 + i) = tok
      i += 1
    }
    a
  }
}

/** Tokenization kernel shared by the interpreted and generated paths
  * of [[BpeCountExpr]] / [[BpeTokensExpr]]. Semantics (pinned by
  * BpeSuite and replayed verbatim by the DuckDB oracle):
  *
  *  - pre-tokenize with the ONE byte tokenizer
  *    ([[ShinglesKernel.tokenSpans]], positionally identical to
  *    `tokens()`), so BPE counts and whitespace counts are over the
  *    same words;
  *  - each word starts as its UTF-8 bytes (one token per byte) and the
  *    lowest-RANK adjacent pair merges first (leftmost on rank ties) —
  *    the min-rank priority loop, O(len·log len) per cold word and
  *    INDEPENDENT of merge-table size. On a training-produced merge
  *    table this is the exact evolution training produced (every
  *    merge's operands derive from strictly earlier ranks, so the
  *    rank-order replay and the priority loop agree — pinned by the
  *    32k-merge differential spec in BpeSuite, with
  *    [[BpeKernel.lensRankOrder]] kept as the oracle);
  *  - leftmost application: a merged token is never the left operand
  *    of the same merge in the same pass (run parity — `aaa` under
  *    `(a,a)` gives `[aa, a]`; the priority loop's leftmost-first
  *    tie-break reproduces it).
  *
  * Merges never cross word boundaries (the classic pre-tokenization
  * contract), so documents tokenize word-by-word and the per-word
  * cache in [[BpeModel]] carries the whole corpus.
  */
object BpeKernel {

  private val HexDigits = "0123456789ABCDEF".toCharArray

  def compile(merges: Seq[(String, String)]): BpeModel = {
    def un(h: String): Array[Byte] = {
      require(h.length % 2 == 0, s"odd-length hex token: $h")
      val out = new Array[Byte](h.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = Integer.parseInt(h.substring(2 * i, 2 * i + 2), 16).toByte
        i += 1
      }
      out
    }
    new BpeModel(merges.map(m => un(m._1)).toArray, merges.map(m => un(m._2)).toArray)
  }

  private def regionEq(bytes: Array[Byte], off: Int, len: Int, pat: Array[Byte]): Boolean = {
    if (len != pat.length) return false
    var i = 0
    while (i < len) {
      if (bytes(off + i) != pat(i)) return false
      i += 1
    }
    true
  }

  /** Collision-free key for a byte-pair: a length-prefix char plus the
    * two token byte regions widened to chars — cheap to build from a
    * word's byte regions with no intermediate copies.
    */
  private[functions] def pairKey(
      b1: Array[Byte], o1: Int, l1: Int,
      b2: Array[Byte], o2: Int, l2: Int): String = {
    val chars = new Array[Char](l1 + l2 + 1)
    chars(0) = l1.toChar
    var i = 0
    while (i < l1) { chars(i + 1) = (b1(o1 + i) & 0xff).toChar; i += 1 }
    i = 0
    while (i < l2) { chars(l1 + 1 + i) = (b2(o2 + i) & 0xff).toChar; i += 1 }
    new String(chars)
  }

  /** Token lengths of ONE word under the min-rank priority merge:
    * nodes form a doubly-linked list, a heap of `(rank << 32 | pos)`
    * longs orders candidate pairs lowest-rank-first (leftmost on
    * ties — node index = original byte offset, and a merge keeps the
    * LEFT node's index, so the order is stable), and stale entries are
    * dropped by the `alive`/`curRank` check (token bytes only ever
    * grow, so a pair's content — and therefore its rank — can never
    * revert to match an old entry). O(len·log len) per word, merge
    * lookups O(1) via [[BpeModel.pairRank]]: cost is independent of
    * merge-table size, unlike the rank-order replay.
    */
  private def mergeWordPriority(bytes: Array[Byte], s: Int, e: Int, m: BpeModel): Array[Int] = {
    val n0 = e - s
    val len = new Array[Int](n0)
    java.util.Arrays.fill(len, 1)
    if (n0 <= 1) return len
    val off = new Array[Int](n0)
    val nxt = new Array[Int](n0)
    val prv = new Array[Int](n0)
    val alive = new Array[Boolean](n0)
    val curRank = new Array[Int](n0)
    var i = 0
    while (i < n0) {
      off(i) = s + i; nxt(i) = i + 1; prv(i) = i - 1; alive(i) = true
      i += 1
    }
    nxt(n0 - 1) = -1
    val ranks = m.pairRank
    val heap = new java.util.PriorityQueue[java.lang.Long]()
    def push(a: Int): Unit = {
      val j = nxt(a)
      var r = Int.MaxValue
      if (j >= 0) {
        val hit = ranks.get(pairKey(bytes, off(a), len(a), bytes, off(j), len(j)))
        if (hit != null) r = hit.intValue()
      }
      curRank(a) = r
      if (r != Int.MaxValue) heap.add(java.lang.Long.valueOf((r.toLong << 32) | a))
    }
    i = 0
    while (i < n0) { push(i); i += 1 }
    var n = n0
    while (n > 1 && !heap.isEmpty) {
      val top = heap.poll().longValue()
      val r = (top >>> 32).toInt
      val a = (top & 0xffffffffL).toInt
      if (alive(a) && curRank(a) == r) {
        val j = nxt(a)
        len(a) += len(j)
        alive(j) = false
        curRank(j) = Int.MaxValue
        val k = nxt(j)
        nxt(a) = k
        if (k >= 0) prv(k) = a
        n -= 1
        push(a)
        val p = prv(a)
        if (p >= 0) push(p)
      }
    }
    val out = new Array[Int](n)
    var w = 0
    var cur = 0 // merges always kill the RIGHT node, so node 0 is the head
    while (cur >= 0) { out(w) = len(cur); w += 1; cur = nxt(cur) }
    out
  }

  /** Token lengths of ONE word replaying merges IN RANK ORDER, each
    * exhaustively left-to-right — the training-evolution semantics the
    * DuckDB oracle unrolls, kept as the differential oracle for
    * [[mergeWordPriority]] (O(numMerges·len), so not the serving
    * path). Lengths are offset-free, so one cache entry serves every
    * occurrence of the word anywhere in the corpus.
    */
  private def mergeWord(bytes: Array[Byte], s: Int, e: Int, m: BpeModel): Array[Int] = {
    var lens = new Array[Int](e - s)
    java.util.Arrays.fill(lens, 1)
    var n = e - s
    var r = 0
    while (r < m.left.length && n > 1) {
      val l = m.left(r)
      val rr = m.right(r)
      var i = 0
      var w = 0
      var off = s
      while (i < n) {
        if (i + 1 < n && regionEq(bytes, off, lens(i), l) &&
            regionEq(bytes, off + lens(i), lens(i + 1), rr)) {
          val merged = lens(i) + lens(i + 1)
          lens(w) = merged
          off += merged
          i += 2
        } else {
          val keep = lens(i)
          lens(w) = keep
          off += keep
          i += 1
        }
        w += 1
      }
      n = w
      r += 1
    }
    if (n == lens.length) lens else java.util.Arrays.copyOf(lens, n)
  }

  private val CacheCap = 1 << 16

  private def wordLens(bytes: Array[Byte], s: Int, e: Int, m: BpeModel): Array[Int] = {
    // ISO-8859-1 maps bytes 1:1 to chars: an exact, cheap cache key
    val key = new String(bytes, s, e - s, java.nio.charset.StandardCharsets.ISO_8859_1)
    val hit = m.cache.get(key)
    if (hit != null) return hit
    val lens = mergeWordPriority(bytes, s, e, m)
    if (m.cache.size < CacheCap) m.cache.put(key, lens)
    lens
  }

  /** Test hooks for the kernel differential (BpeSuite): the serving
    * priority loop vs the rank-order training-evolution oracle.
    */
  private[graft] def lensPriority(bytes: Array[Byte], s: Int, e: Int, m: BpeModel): Array[Int] =
    mergeWordPriority(bytes, s, e, m)
  private[graft] def lensRankOrder(bytes: Array[Byte], s: Int, e: Int, m: BpeModel): Array[Int] =
    mergeWord(bytes, s, e, m)

  /** BPE token count of the whole document (0 for null/blank). */
  def count(u: UTF8String, m: BpeModel): Int = {
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

  /** The document's BPE tokens as UPPERCASE HEX strings, word token
    * lists concatenated in order — hex because a merged token may end
    * mid-UTF-8-sequence, which a `string` column could not carry; the
    * hex rendering equals `hex()` in both Spark and DuckDB, which is
    * what lets the oracle replay byte-exactly.
    */
  def tokensHex(u: UTF8String, m: BpeModel): ArrayData = {
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
          hex(2 * i) = HexDigits(b >>> 4).toByte
          hex(2 * i + 1) = HexDigits(b & 0xf).toByte
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

  /** The document's BPE tokens as VOCABULARY IDS in order (0–255 the
    * bytes, 256+rank the merges — [[BpeModel.tokenId]]): the text→ids
    * step a training pipeline feeds the model. Total function:
    * null/blank → empty array. A merged token is by construction a
    * merge output (or a single byte), so the lookup cannot miss on a
    * model the tokens were produced with; a miss is a model/text
    * mismatch and fails loudly.
    */
  def tokenIds(u: UTF8String, m: BpeModel): ArrayData = {
    if (u == null) return new GenericArrayData(Array.empty[Any])
    val bytes = u.getBytes
    val (starts, ends, nw) = ShinglesKernel.tokenSpans(bytes)
    val ids = m.tokenId
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
        if (id == null) throw new IllegalStateException(
          s"BPE token of length ${lens(t)} not in the vocabulary — " +
            "tokens were produced with a different merge table")
        out += id.intValue()
        off += lens(t)
        t += 1
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** ids → text: concatenates each id's token bytes
    * ([[BpeModel.idBytes]]) — the exact inverse of [[tokenIds]] up to
    * the pre-tokenizer, so `decode(encode(text))` is the
    * concatenation of the text's whitespace words (separators are not
    * tokens and are not reconstructed; a production tokenizer that
    * must round-trip whitespace encodes it as part of the words, which
    * is a pre-tokenizer choice, not a decode one). Total on null/empty
    * input (→ empty string); an id outside `[0, 256+numMerges)` is a
    * vocabulary mismatch and fails loudly.
    */
  def decode(ids: ArrayData, m: BpeModel): UTF8String = {
    if (ids == null || ids.numElements() == 0) return UTF8String.EMPTY_UTF8
    val tab = m.idBytes
    val n = ids.numElements()
    var len = 0
    var i = 0
    while (i < n) {
      val id = ids.getInt(i)
      if (id < 0 || id >= tab.length) throw new IllegalArgumentException(
        s"BPE id $id outside the vocabulary [0, ${tab.length}) — " +
          "ids were produced with a different merge table")
      len += tab(id).length
      i += 1
    }
    val out = new Array[Byte](len)
    var off = 0
    i = 0
    while (i < n) {
      val t = tab(ids.getInt(i))
      System.arraycopy(t, 0, out, off, t.length)
      off += t.length
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** `bpe_count(text)`: subword token count under a trained merge list —
  * the REAL token accounting for chunking / packing / token-budget
  * mixing (whitespace counts drift 2-4× from subword counts by
  * language and code/prose mix). Total function: null/blank → 0.
  */
case class BpeCountExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bpe_count"
  override def nullable: Boolean = false

  @transient private lazy val model: BpeModel = BpeKernel.compile(merges)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    BpeKernel.count(v.asInstanceOf[UTF8String], model)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("graftBpeModel", model, classOf[BpeModel].getName)
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        int ${ev.value} = graft.functions.BpeKernel.count(
          ${childGen.isNull} ? null : ${childGen.value}, $mRef);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bpe_token_ids(text)`: the document's subword tokens as vocabulary
  * ids ([[BpeKernel.tokenIds]]) — text→ids for the training consumer.
  * Total function: null/blank → empty array.
  */
case class BpeIdsExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_bpe_token_ids"
  override def nullable: Boolean = false

  @transient private lazy val model: BpeModel = BpeKernel.compile(merges)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    BpeKernel.tokenIds(v.asInstanceOf[UTF8String], model)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("graftBpeModel", model, classOf[BpeModel].getName)
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.BpeKernel.tokenIds(
            ${childGen.isNull} ? null : ${childGen.value}, $mRef);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bpe_decode(ids)`: vocabulary ids → text ([[BpeKernel.decode]]) —
  * the ids→text leg a serving/inspection path needs (sample a packed
  * sequence back to readable text, audit a chunk boundary). Total
  * function: null/empty → empty string.
  */
case class BpeDecodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_decode"
  override def nullable: Boolean = false

  @transient private lazy val model: BpeModel = BpeKernel.compile(merges)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    BpeKernel.decode(v.asInstanceOf[ArrayData], model)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("graftBpeModel", model, classOf[BpeModel].getName)
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.unsafe.types.UTF8String ${ev.value} =
          graft.functions.BpeKernel.decode(
            ${childGen.isNull} ? null : ${childGen.value}, $mRef);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bpe_tokens(text)`: the document's subword tokens as hex strings
  * (see [[BpeKernel.tokensHex]] for why hex) — the chunking/packing
  * building block. Total function: null/blank → empty array.
  */
case class BpeTokensExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_tokens"
  override def nullable: Boolean = false

  @transient private lazy val model: BpeModel = BpeKernel.compile(merges)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    BpeKernel.tokensHex(v.asInstanceOf[UTF8String], model)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("graftBpeModel", model, classOf[BpeModel].getName)
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.BpeKernel.tokensHex(
            ${childGen.isNull} ? null : ${childGen.value}, $mRef);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
