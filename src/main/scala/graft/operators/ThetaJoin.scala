package graft.operators

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic θ inner join: arbitrary Boolean condition over one join column
  * per side, evaluated over the conceptual cross product without
  * materializing it (reference: pandance/pandance.py:331-566).
  *
  * Two overloads, in preference order:
  *
  *  1. [[apply]] — the condition is a `(Column, Column) => Column`
  *     expression. This is the Spark-first form: the predicate stays
  *     inside Catalyst, so it is codegen'd, can be pushed into the join,
  *     and — when the condition happens to contain an equality conjunct —
  *     Catalyst extracts it and plans a hash join instead of a nested
  *     loop. Always prefer this form.
  *  2. [[udf]] — an opaque Scala `(L, R) => Boolean`, the analogue of the
  *     reference's arbitrary Python callable
  *     (pandance/pandance.py:366-369). Spark ships the closure to
  *     executors natively (the reference needs a pickling hack and a
  *     `multiprocessing.Pool`, pandance/pandance.py:321-328); the join
  *     itself is a nested loop, inherently O(n·m) — same asymptotics as
  *     the reference's serial/parallel scan, but distributed over all
  *     executor cores.
  *
  * Argument order of the condition is preserved (left value first), as
  * the reference guarantees even when it internally swaps sides
  * (pandance/pandance.py:507-526).
  */
object ThetaJoin {

  /** Column-expression θ join — Catalyst-visible predicate. */
  def apply(
      left: DataFrame,
      right: DataFrame,
      condition: (Column, Column) => Column,
      on: Option[String] = None,
      leftOn: Option[String] = None,
      rightOn: Option[String] = None,
      suffixes: (String, String) = ("_x", "_y")): DataFrame = {
    val cols = JoinSpec.resolve(on, leftOn, rightOn)
    JoinSpec.requireColumn(left, cols.leftCol, "left")
    JoinSpec.requireColumn(right, cols.rightCol, "right")
    val (l, r, c) = JoinSpec.applySuffixes(left, right, cols, suffixes)
    l.join(r, condition(l(c.leftCol), r(c.rightCol)), "inner")
  }

  /** Opaque-predicate θ join. `L`/`R` are the JVM types of the join
    * columns (e.g. `Long`, `String`, `java.sql.Timestamp`). Exceptions
    * thrown by the predicate are swallowed as non-match, mirroring the
    * reference's `decimal.InvalidOperation` guard
    * (pandance/pandance.py:519-526).
    */
  def udf[L: TypeTag, R: TypeTag](
      left: DataFrame,
      right: DataFrame,
      condition: (L, R) => Boolean,
      on: Option[String] = None,
      leftOn: Option[String] = None,
      rightOn: Option[String] = None,
      suffixes: (String, String) = ("_x", "_y")): DataFrame = {
    val safe = (a: L, b: R) =>
      try condition(a, b)
      catch { case scala.util.control.NonFatal(_) => false }
    val pred = org.apache.spark.sql.functions.udf(safe)
    apply(left, right, (lc, rc) => pred(lc, rc), on, leftOn, rightOn, suffixes)
  }
}
