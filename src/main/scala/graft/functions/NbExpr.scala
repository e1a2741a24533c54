package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** In-row serving kernel for the pruned Naive Bayes classifier
  * ([[graft.operators.QualityClassifier]]): walks the byte tokenizer's
  * spans, hashes each token with Spark's own `XxHash64Function`
  * (seed 42 — bit-identical to the batch path's `xxhash64(w)` keys),
  * binary-searches the sorted pruned log-odds array, and sums exact
  * 1e-4-grid longs; a token pruned out of the model contributes the
  * smoothing-floor `defaultDelta`, exactly like an unseen one (that
  * is what pruning MEANS here — the entry scores as unseen; the
  * DuckDB gate oracle replays the same rule with a count-cutoff
  * `WHERE`).
  *
  * Returns `(n_tokens, s_sum)`; an empty doc scores `(0, 0)`. The
  * class prior is a constant, applied by the caller outside the
  * kernel.
  */
object NbScoreKernel {

  private def isSep(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  def compute(
      text: UTF8String,
      keys: Array[Long], deltas: Array[Long],
      defaultDelta: Long): InternalRow = {
    val bytes = text.getBytes
    val lo = 0
    val hi = bytes.length
    var n = 0L
    var s = 0L
    var i = lo
    while (i < hi) {
      while (i < hi && isSep(bytes(i))) i += 1
      if (i < hi) {
        val st = i
        while (i < hi && !isSep(bytes(i))) i += 1
        val tok = UTF8String.fromBytes(bytes, st, i - st)
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(tok, StringType, 42L)
        val d =
          if (keys.length == 0) defaultDelta
          else {
            val p = java.util.Arrays.binarySearch(keys, h)
            if (p >= 0) deltas(p) else defaultDelta
          }
        s += d
        n += 1L
      }
    }
    InternalRow(n, s)
  }
}

/** In-row MULTICLASS NB prediction
  * ([[graft.operators.QualityClassifier.predictMulticlass]]'s serving
  * form): per-token binary search over sorted keys into a FLAT
  * `lps[keyIdx · nClasses + c]` log-prob table, per-class long
  * accumulators, a token missing from the pruned model adds each
  * class's smoothing floor. Argmax of `acc[c] + prior[c]` with the
  * batch path's deterministic tie rule — highest score, LOWEST class
  * index (class names are sorted at train time, so lowest index =
  * lowest name). Returns the class index; the caller maps it to the
  * name. A zero-token doc returns −1 (unclassifiable — callers fail
  * closed).
  */
object NbPredictKernel {

  private def isSep(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  def compute(
      text: UTF8String,
      keys: Array[Long], lps: Array[Long],
      defaults: Array[Long], priors: Array[Long]): Int = {
    val nc = priors.length
    val bytes = text.getBytes
    val lo = 0
    val hi = bytes.length
    val acc = new Array[Long](nc)
    var n = 0L
    var i = lo
    while (i < hi) {
      while (i < hi && isSep(bytes(i))) i += 1
      if (i < hi) {
        val st = i
        while (i < hi && !isSep(bytes(i))) i += 1
        val tok = UTF8String.fromBytes(bytes, st, i - st)
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(tok, StringType, 42L)
        val p =
          if (keys.length == 0) -1
          else java.util.Arrays.binarySearch(keys, h)
        var c = 0
        if (p >= 0) {
          val base = p * nc
          while (c < nc) { acc(c) += lps(base + c); c += 1 }
        } else {
          while (c < nc) { acc(c) += defaults(c); c += 1 }
        }
        n += 1L
      }
    }
    if (n == 0L) return -1
    var best = 0
    var bestScore = acc(0) + priors(0)
    var c = 1
    while (c < nc) {
      val s = acc(c) + priors(c)
      if (s > bestScore) { best = c; bestScore = s }
      c += 1
    }
    best
  }
}

/** `string -> int`: multiclass NB class-index prediction as ONE scan
  * projection — the model (sorted keys + flat per-class log-prob
  * table) rides as plan references, so the trained language-ID /
  * domain gate runs on a stream with no join, no agg, no state.
  */
case class NbPredictExpr(
    child: Expression,
    keys: Array[Long], lps: Array[Long],
    defaults: Array[Long], priors: Array[Long]) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_nb_predict"

  override def nullSafeEval(input: Any): Any =
    NbPredictKernel.compute(input.asInstanceOf[UTF8String],
      keys, lps, defaults, priors)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("graftNbMKeys", keys, "long[]")
    val l = ctx.addReferenceObj("graftNbMLps", lps, "long[]")
    val d = ctx.addReferenceObj("graftNbMDef", defaults, "long[]")
    val p = ctx.addReferenceObj("graftNbMPri", priors, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NbPredictKernel.compute($c, $k, $l, $d, $p);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `string -> struct<n_tokens: long, s_sum: long>`: pruned-NB scoring
  * as ONE scan projection — the model rides to executors as plan
  * references (sorted key/delta arrays), so classification needs no
  * join, no aggregation, and no state: the streaming-gate shape.
  */
case class NbScoreExpr(
    child: Expression,
    keys: Array[Long], deltas: Array[Long],
    defaultDelta: Long) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("s_sum", LongType, nullable = false)))
  override def prettyName: String = "graft_nb_score"

  override def nullSafeEval(input: Any): Any =
    NbScoreKernel.compute(input.asInstanceOf[UTF8String],
      keys, deltas, defaultDelta)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("graftNbKeys", keys, "long[]")
    val d = ctx.addReferenceObj("graftNbDeltas", deltas, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NbScoreKernel.compute($c, $k, $d, ${defaultDelta}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
