package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.functions.DotProduct

/** Transparent band-join optimization (SURVEY.md §7.5): an optimizer
  * rule that recognizes user-written inner joins whose condition contains
  * the conjunct `abs(l - r) <= tol` (tol a positive numeric literal, `l`
  * referencing only the left side, `r` only the right) and rewrites the
  * O(n·m) BroadcastNestedLoopJoin plan into the same bucketed equi-join
  * [[graft.operators.FuzzyJoin]] builds explicitly:
  *
  *   left:  + bucket = floor(l / tol)
  *   right: explode to buckets {b-1, b, b+1}
  *   join:  bucket equality AND the original condition (residual filter)
  *
  * The original condition is kept verbatim as the residual, so the
  * rewrite is exact for every input the naive plan handles (NaN/Inf rows
  * bucket somewhere but the residual comparison rejects them, same as the
  * nested loop). Non-DOUBLE-safe types (decimals) are left alone — the
  * nested loop is correct there and decimal bucket arithmetic has its own
  * rounding rules.
  *
  * Idempotence: the rewritten join's left child projects the bucket
  * column; its presence guards re-application (optimizer batches run to
  * fixed point, and AQE re-optimizes).
  */
object FuzzyJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val BL = "__graft_fzrw_bl"
  private val BR = "__graft_fzrw_br"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, _, Inner, Some(cond), _)
        if j.resolved && !left.output.exists(_.name == BL) =>
      findBand(splitConjunctivePredicates(cond), j) match {
        case Some((l, r, tol)) => rewrite(j, l, r, tol)
        case None => j
      }
  }

  /** Locate an `abs(a - b) <= tol` conjunct with sides cleanly split
    * across the join inputs; returns (leftExpr, rightExpr, tol).
    */
  private def findBand(
      conjuncts: Seq[Expression], j: Join): Option[(Expression, Expression, Double)] =
    conjuncts.collectFirst(Function.unlift {
      case LessThanOrEqual(Abs(Subtract(a, b, _), _), Literal(v, dt)) =>
        assign(a, b, v, dt, j)
      case GreaterThanOrEqual(Literal(v, dt), Abs(Subtract(a, b, _), _)) =>
        assign(a, b, v, dt, j)
      case _ => None
    })

  private def assign(
      a: Expression, b: Expression, v: Any, dt: DataType,
      j: Join): Option[(Expression, Expression, Double)] =
    for {
      tol <- literalToDouble(v, dt) if tol > 0
      sides <-
        if (fromSide(a, j.left) && fromSide(b, j.right)) Some((a, b))
        else if (fromSide(b, j.left) && fromSide(a, j.right)) Some((b, a))
        else None
      if bucketable(sides._1.dataType) && bucketable(sides._2.dataType)
    } yield (sides._1, sides._2, tol)

  private def fromSide(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  /** Types whose values bucket exactly through a DOUBLE division. */
  private def bucketable(dt: DataType): Boolean = dt match {
    case _: DecimalType => false
    case _: NumericType => true
    case _ => false
  }

  private def literalToDouble(v: Any, dt: DataType): Option[Double] = (v, dt) match {
    case (null, _) => None
    case (x: Number, _: NumericType) if !dt.isInstanceOf[DecimalType] =>
      Some(x.doubleValue())
    case (d: Decimal, _) => Some(d.toDouble)
    case _ => None
  }

  private def rewrite(
      j: Join, l: Expression, r: Expression, tol: Double): LogicalPlan = {
    def bucket(e: Expression): Expression =
      Cast(Floor(Divide(Cast(e, DoubleType), Literal(tol))), LongType)
    val blAlias = Alias(bucket(l), BL)()
    val left2 = Project(j.left.output :+ blAlias, j.left)
    val br = bucket(r)
    val brAttr = AttributeReference(BR, LongType, nullable = true)()
    val gen = Generate(
      Explode(CreateArray(Seq(
        Subtract(br, Literal(1L)), br, Add(br, Literal(1L))))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(brAttr), child = j.right)
    val newCond = And(EqualTo(blAlias.toAttribute, brAttr), j.condition.get)
    Project(j.output, Join(left2, gen, Inner, Some(newCond), j.hint))
  }
}

/** Session-extension entry point: enables the transparent band-join
  * rewrite and registers `graft_dot` as a SQL function. Activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => FuzzyJoinRewrite)
    ext.injectPlannerStrategy(_ => RangeJoinStrategy)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
  }
}
