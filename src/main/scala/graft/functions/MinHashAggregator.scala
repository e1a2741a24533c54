package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature AGGREGATOR: folds every shingle array of a
  * group into one `numHashes`-long signature — the group-level analogue
  * of the per-document signature in [[graft.operators.Dedup.minhashLsh]].
  * `sig[i] = min over ALL shingles in the group of (a_i * fnv64(s) + b_i)`.
  *
  * Why an `Aggregator` (the guide's typed custom-aggregate form): the
  * merge is associative+commutative (element-wise min), so Spark runs it
  * with map-side partial aggregation — each partition reduces locally to
  * one k-long buffer and only buffers cross the shuffle. Estimating the
  * Jaccard similarity of two whole *collections* (sources, crawls, days)
  * then costs one signature comparison instead of a cross-corpus join:
  * `J(A,B) ~ fraction of equal signature slots`.
  */
class MinHashAggregator(numHashes: Int)
    extends Aggregator[Seq[String], Array[Long], Array[Long]] {

  private val as = Array.tabulate(numHashes)(i => Hashing.splitmix64(2L * i) | 1L)
  private val bs = Array.tabulate(numHashes)(i => Hashing.splitmix64(2L * i + 1))

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingles: Seq[String]): Array[Long] = {
    if (shingles != null) shingles.foreach { s =>
      val base = Hashing.fnv1a64(s)
      var i = 0
      while (i < numHashes) {
        val h = as(i) * base + bs(i)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAggregator {

  /** Estimated Jaccard similarity of the sets behind two signatures:
    * the fraction of agreeing slots (standard MinHash estimator,
    * unbiased, stderr ~ 1/sqrt(k)).
    */
  def estimateJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    require(a.length == b.length && a.nonEmpty)
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }
}
