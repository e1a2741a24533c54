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
}

/** Tokenization kernel shared by the interpreted and generated paths
  * of [[BpeCountExpr]] / [[BpeTokensExpr]]. Semantics (pinned by
  * BpeSuite and replayed verbatim by the DuckDB oracle):
  *
  *  - pre-tokenize with the ONE byte tokenizer
  *    ([[ShinglesKernel.tokenSpans]], positionally identical to
  *    `tokens()`), so BPE counts and whitespace counts are over the
  *    same words;
  *  - each word starts as its UTF-8 bytes (one token per byte) and
  *    merges apply IN RANK ORDER, each exhaustively left-to-right —
  *    the exact evolution training produced, so corpus words
  *    re-tokenize to their training-time form (cheaper than the
  *    min-rank-priority inference loop it agrees with there, and
  *    deterministic on unseen words too);
  *  - leftmost application: a merged token is never the left operand
  *    of the same merge in the same pass (run parity — `aaa` under
  *    `(a,a)` gives `[aa, a]`).
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

  /** Token lengths of ONE word after all merges, in order. Lengths are
    * offset-free, so one cache entry serves every occurrence of the
    * word anywhere in the corpus.
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
    val lens = mergeWord(bytes, s, e, m)
    if (m.cache.size < CacheCap) m.cache.put(key, lens)
    lens
  }

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
