package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A Misra–Gries summary: the k-bounded candidate counters plus the
  * exact stream length (carried so callers get `n` from the same scan).
  */
final case class FreqSummary(counts: Map[String, Long], n: Long)

/** Typed MISRA–GRIES frequent-items AGGREGATOR: a k-counter summary of
  * a value stream with the classic deterministic guarantee — every item
  * whose true count exceeds `n / (k+1)` (n = stream length) is present
  * in the summary, and each reported count undercounts the truth by at
  * most `n / (k+1)`. No randomness, no failure probability.
  *
  * Why an `Aggregator`: reduce and merge are both k-bounded, so Spark
  * runs map-side partial aggregation — each partition folds its rows
  * into ONE k-entry map locally and only those maps cross the shuffle.
  * Heavy hitters over 100 TB of tokens then cost a full scan but only
  * `#partitions × k` counters of shuffle, vs a full `groupBy(value)`
  * shuffling every distinct value. The merge implements the parallel
  * Misra–Gries of Agarwal et al. (sum summaries, then subtract the
  * (k+1)-th largest count and drop non-positives), which preserves the
  * error bound additively across partitions.
  *
  * The summary is a CANDIDATE set (counts are lower bounds). For exact
  * results, recount just the candidates in a second pass —
  * [[graft.operators.Sketches.heavyHitters]] packages the two passes.
  */
class FrequentItemsAggregator(k: Int)
    extends Aggregator[String, FreqSummary, FreqSummary] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: FreqSummary = FreqSummary(Map.empty, 0L)

  override def reduce(b: FreqSummary, x: String): FreqSummary = {
    val m = b.counts
    val counts = m.get(x) match {
      case Some(c) => m.updated(x, c + 1L)
      case None if m.size < k => m.updated(x, 1L)
      case None =>
        // decrement-all step: O(k), amortized O(1) per stream item
        // (each decrement round consumes k+1 prior increments)
        m.flatMap { case (w, c) => if (c > 1L) Some(w -> (c - 1L)) else None }
    }
    FreqSummary(counts, b.n + 1L)
  }

  override def merge(a: FreqSummary, b: FreqSummary): FreqSummary = {
    val sum = b.counts.foldLeft(a.counts) { case (m, (w, c)) =>
      m.updated(w, m.getOrElse(w, 0L) + c)
    }
    val trimmed =
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest count, keep strictly positive:
        // at most k survivors, error grows by that count (parallel MG)
        val kth = sum.valuesIterator.toArray.sortInPlace()(Ordering[Long].reverse)(k)
        sum.flatMap { case (w, c) => if (c > kth) Some(w -> (c - kth)) else None }
      }
    FreqSummary(trimmed, a.n + b.n)
  }

  override def finish(b: FreqSummary): FreqSummary = b

  override def bufferEncoder: Encoder[FreqSummary] =
    ExpressionEncoder[FreqSummary]()
  override def outputEncoder: Encoder[FreqSummary] =
    ExpressionEncoder[FreqSummary]()
}
