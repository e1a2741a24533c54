package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Custom physical operator for single-column inequality inner joins
  * (`l.a OP r.b`, OP ∈ {<, <=, >=, >}): the reference's sort +
  * binary-search + transitivity algorithm (pandance/pandance.py:787-876)
  * re-expressed for Spark's execution model, replacing the O(n·m)
  * BroadcastNestedLoopJoin compare loop with O(n·log m + output).
  *
  * The build (right) side arrives via a broadcast exchange
  * (IdentityBroadcastMode); each task sorts it once by the join key and
  * probes it per left row with a binary search, emitting the contiguous
  * suffix/prefix of matches. Matching stops being the bottleneck — only
  * the inherent output size remains (SURVEY.md §4.1 M3: OSS Spark has no
  * range-join optimization; this is the "v2 stretch" custom strategy).
  *
  * Planned by [[RangeJoinStrategy]] (enable via GraftExtensions) only
  * when the join condition is a bare inequality conjunct set with no
  * equi-conjunct (hash joins beat us there) and the right side fits the
  * broadcast threshold; otherwise Catalyst's own strategies apply.
  */
case class BroadcastRangeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    op: String, // left-perspective operator: leftKey OP rightKey
    residual: Option[Expression])
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val broadcastRel = right.executeBroadcast[Array[InternalRow]]()
    val boundLeftKey = BindReferences.bindReference(leftKey, left.output)
    val boundRightKey = BindReferences.bindReference(rightKey, right.output)
    val boundResidual = residual.map(BindReferences.bindReference(_, output))
    val keyOrdering = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val opLocal = op
    val outputLocal = output

    left.execute().mapPartitions { leftIter =>
      // sort the broadcast build side once per task (cheap relative to
      // the probe loop; the array is shared, the sorted index is local)
      val rows = broadcastRel.value
      val keyed = new Array[(Any, InternalRow)](rows.length)
      var n = 0
      var i = 0
      while (i < rows.length) {
        val k = boundRightKey.eval(rows(i))
        if (k != null) { keyed(n) = (k, rows(i)); n += 1 }
        i += 1
      }
      val sorted = java.util.Arrays.copyOf(keyed, n)
      java.util.Arrays.sort(sorted,
        Ordering.by[(Any, InternalRow), Any](_._1)(keyOrdering))

      // first index with key >= v (lower) or key > v (upper)
      def bound(v: Any, strictUpper: Boolean): Int = {
        var lo = 0
        var hi = sorted.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          val c = keyOrdering.compare(sorted(mid)._1, v)
          if (c < 0 || (strictUpper && c == 0)) lo = mid + 1 else hi = mid
        }
        lo
      }

      val joined = new JoinedRow
      val toUnsafe = UnsafeProjection.create(outputLocal, outputLocal)
      leftIter.flatMap { lrow =>
        val v = boundLeftKey.eval(lrow)
        if (v == null) Iterator.empty
        else {
          // match range under the operator, by transitivity of the sort:
          //   v <  k : suffix from first k > v      v >= k : prefix to it
          //   v <= k : suffix from first k >= v     v >  k : prefix to it
          val (start, end) = opLocal match {
            case "<"  => (bound(v, strictUpper = true), sorted.length)
            case "<=" => (bound(v, strictUpper = false), sorted.length)
            case ">=" => (0, bound(v, strictUpper = true))
            case ">"  => (0, bound(v, strictUpper = false))
          }
          Iterator.range(start, end).map { j =>
            joined(lrow, sorted(j)._2)
          }.filter(r => boundResidual.forall(_.eval(r) == true))
            .map(toUnsafe)
        }
      }
    }
  }
}

/** Planner strategy: fires on inner joins whose condition splits into
  * exactly one cross-side inequality conjunct (plus optional residual
  * conjuncts, none of them equi) with a broadcastable right side.
  */
object RangeJoinStrategy extends SparkStrategy with PredicateHelper {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j @ Join(l, r, Inner, Some(cond), _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) => crossSide(a, b, j).isDefined
        case _ => false
      }
      val sqlConf = org.apache.spark.sql.internal.SQLConf.get
      val rightSmall =
        sqlConf.autoBroadcastJoinThreshold > 0 &&
          r.stats.sizeInBytes <= sqlConf.autoBroadcastJoinThreshold
      if (hasEqui || !rightSmall) Nil
      else {
        val ineq = conjuncts.flatMap {
          case c @ LessThan(a, b) => orient(a, b, "<", ">", j)
          case c @ LessThanOrEqual(a, b) => orient(a, b, "<=", ">=", j)
          case c @ GreaterThan(a, b) => orient(a, b, ">", "<", j)
          case c @ GreaterThanOrEqual(a, b) => orient(a, b, ">=", "<=", j)
          case _ => None
        }
        ineq.headOption match {
          case Some((lk, rk, op, src)) =>
            val residual = conjuncts.filterNot(_ fastEquals src).reduceOption(And)
            BroadcastRangeJoinExec(
              planLater(l), planLater(r), lk, rk, op, residual) :: Nil
          case None => Nil
        }
      }
    case _ => Nil
  }

  private def crossSide(a: Expression, b: Expression, j: Join): Option[Boolean] =
    if (refsOf(a, j.left) && refsOf(b, j.right)) Some(false)
    else if (refsOf(b, j.left) && refsOf(a, j.right)) Some(true)
    else None

  private def refsOf(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) && e.deterministic

  /** Normalize `a OP b` so the left-side expression comes first; the
    * operator mirrors when the sides arrive swapped.
    */
  private def orient(
      a: Expression, b: Expression, op: String, mirrored: String,
      j: Join): Option[(Expression, Expression, String, Expression)] = {
    val src = op match {
      case "<" => LessThan(a, b)
      case "<=" => LessThanOrEqual(a, b)
      case ">" => GreaterThan(a, b)
      case ">=" => GreaterThanOrEqual(a, b)
    }
    crossSide(a, b, j).map {
      case false => (a, b, op, src)
      case true => (b, a, mirrored, src)
    }
  }
}
