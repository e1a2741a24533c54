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
  * nested loop). Each side-type pair gets its own exact bucket
  * arithmetic (see [[BucketMode]]): integral sides bucket in 64-bit
  * longs, decimal sides in exact decimal division (precision-gated),
  * TIMESTAMP sides with an `INTERVAL` tolerance on `unix_micros`, and
  * fractional sides in doubles with an adaptive drift-covering explode
  * width.
  *
  * Idempotence: the rewritten join's left child projects the bucket
  * column; its presence guards re-application (optimizer batches run to
  * fixed point, and AQE re-optimizes).
  */
object FuzzyJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val BL = "__graft_fzrw_bl"
  private val BR = "__graft_fzrw_br"

  /** How the rewrite buckets a given pair of side types (the types as
    * analysis coerced them — a long column compared against a fractional
    * column arrives here as a DOUBLE `Cast`, so each mode's bucket sees
    * exactly the value the naive plan's residual compares):
    *  - [[ExactLong]]: both sides integral (the condition subtracts in
    *    64-bit integers and only casts the |diff|) — bucket in exact
    *    long floor-division, width = ceil(tol) plus a slack covering the
    *    |diff|→double rounding at tolerances beyond 2^53. One deliberate
    *    non-equivalence: when `l - r` overflows (pairs >= 2^63 apart)
    *    the non-ANSI naive plan wraps and can spuriously "match"; the
    *    rewrite does not reproduce that artifact (ANSI mode would raise
    *    there).
    *  - [[DoubleBuckets]]: sides are fractional after coercion — DOUBLE
    *    bucketing with an adaptive explode width covering division
    *    drift once |v/tol| approaches 2^52.
    *  - [[ExactDecimal]]: both sides decimal with a decimal tolerance —
    *    exact decimal bucketing via `(v - pmod(v, tol)) / tol` (dividing
    *    an exact multiple, so the quotient never rounds across an
    *    integer boundary; plain `floor(v / tol)` can, because decimal
    *    division rounds to the result scale first). Gated to combined
    *    precision <= 18 so the quotient provably fits the division
    *    result type and a LONG bucket key.
    */
  private sealed trait BucketMode
  private case class ExactLong(w: Long) extends BucketMode
  private case object DoubleBuckets extends BucketMode
  private case class ExactDecimal(tol: Literal, ct: DecimalType) extends BucketMode
  /** Timestamp sides with a day-time interval tolerance: bucket on
    * `unix_micros` in exact 64-bit arithmetic (both the interval and the
    * timestamp are microsecond longs internally — no rounding anywhere,
    * so no slack is needed).
    */
  private case class ExactMicros(w: Long) extends BucketMode

  /** Matches the `|a - b|` shape of a band conjunct, looking through the
    * numeric cast analysis wraps around integral `abs` results. The
    * timestamp case matches the analyzer's `SubtractTimestamps` rewrite
    * of `ts - ts` (modern day-time-interval semantics only; the legacy
    * CalendarInterval mode compares differently and is left alone).
    */
  private object BandDiff {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Abs(Subtract(a, b, _), _) => Some((a, b))
      case Cast(Abs(Subtract(a, b, _), _), _: NumericType, _, _) => Some((a, b))
      case Abs(SubtractTimestamps(a, b, false, _), _) => Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, _, Inner, Some(cond), _)
        if j.resolved && !left.output.exists(_.name == BL) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // a cross-side equi conjunct means Catalyst already plans a hash
      // join — bucketing adds a 3x explode for nothing (this also keeps
      // the rule off FuzzyJoin's own explicit bucketed plans and off its
      // own output, beyond the BL marker guard)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) =>
          (fromSide(a, j.left) && fromSide(b, j.right)) ||
            (fromSide(b, j.left) && fromSide(a, j.right))
        case _ => false
      }
      if (hasEqui) j
      else findBand(conjuncts, j) match {
        case Some((l, r, tol, mode)) => rewrite(j, l, r, tol, mode)
        case None => j
      }
  }

  /** Locate an `abs(a - b) <= tol` conjunct with sides cleanly split
    * across the join inputs; returns (leftExpr, rightExpr, tol, mode).
    */
  private def findBand(
      conjuncts: Seq[Expression],
      j: Join): Option[(Expression, Expression, Double, BucketMode)] =
    conjuncts.collectFirst(Function.unlift {
      case LessThanOrEqual(BandDiff(a, b), Literal(v, dt)) =>
        assign(a, b, v, dt, j)
      case GreaterThanOrEqual(Literal(v, dt), BandDiff(a, b)) =>
        assign(a, b, v, dt, j)
      case _ => None
    })

  private def assign(
      a: Expression, b: Expression, v: Any, dt: DataType,
      j: Join): Option[(Expression, Expression, Double, BucketMode)] =
    for {
      tol <- literalToDouble(v, dt) if tol > 0
      sides <-
        if (fromSide(a, j.left) && fromSide(b, j.right)) Some((a, b))
        else if (fromSide(b, j.left) && fromSide(a, j.right)) Some((b, a))
        else None
      mode <- bucketMode(sides._1.dataType, sides._2.dataType, tol, v, dt)
    } yield (sides._1, sides._2, tol, mode)

  private def fromSide(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Slack on the exact-long bucket width: the naive plan computes the
    * integer |l - r| exactly and then casts it for the comparison, so a
    * matching pair can exceed ceil(tol) only by the |diff|→double
    * rounding error at tolerances beyond 2^53 (<= 2048 with a 2x
    * margin here). Costs nothing at normal tolerances.
    */
  private val LongCastSlack = 4096L

  private def bucketMode(
      l: DataType, r: DataType, tol: Double,
      v: Any, dt: DataType): Option[BucketMode] =
    (l, r) match {
      case (dl: DecimalType, dr: DecimalType) =>
        (v, dt) match {
          case (d: Decimal, dtol: DecimalType) if d.toBigDecimal.signum > 0 =>
            // common type holding every side value and the tolerance
            val s = Seq(dl.scale, dr.scale, dtol.scale).max
            val intDigits = Seq(
              dl.precision - dl.scale, dr.precision - dr.scale,
              dtol.precision - dtol.scale).max
            val p = intDigits + s
            // |v/tol| < 10^p must fit the division result's integral
            // capacity and a LONG key; p <= 18 guarantees both
            if (p <= 18) Some(ExactDecimal(Literal(d, dtol), DecimalType(p, s)))
            else None
          case _ => None
        }
      case (a, b) if isIntegral(a) && isIntegral(b) =>
        // ceil(tol) + slack must not overflow
        if (tol < (1L << 60).toDouble)
          Some(ExactLong(math.max(1L, math.ceil(tol).toLong) + LongCastSlack))
        else None
      case (TimestampType, TimestampType) => (v, dt) match {
        case (micros: java.lang.Long, _: DayTimeIntervalType) =>
          Some(ExactMicros(math.max(1L, micros.longValue())))
        case _ => None
      }
      case (_: NumericType, _: NumericType) => Some(DoubleBuckets)
      case _ => None
    }

  private def literalToDouble(v: Any, dt: DataType): Option[Double] = (v, dt) match {
    case (null, _) => None
    case (micros: java.lang.Long, _: DayTimeIntervalType) =>
      Some(micros.doubleValue())
    case (x: Number, _: NumericType) if !dt.isInstanceOf[DecimalType] =>
      Some(x.doubleValue())
    case (d: Decimal, _) => Some(d.toDouble)
    case _ => None
  }

  private def rewrite(
      j: Join, l: Expression, r: Expression, tol: Double,
      mode: BucketMode): LogicalPlan = {
    def bucket(e: Expression): Expression = mode match {
      case ExactLong(w) =>
        graft.functions.LongMath.floorDivExpr(Cast(e, LongType), w)
      case ExactMicros(w) =>
        graft.functions.LongMath.floorDivExpr(UnixMicros(e), w)
      case DoubleBuckets =>
        Cast(Floor(Divide(Cast(e, DoubleType), Literal(tol))), LongType)
      case ExactDecimal(tolLit, ct) =>
        // (v - pmod(v, tol)) / tol: dividing an exact multiple keeps the
        // quotient an exact integer at any result scale. All binary ops
        // are built on a single common decimal type (raw post-analysis
        // expressions get no coercion pass).
        val ec = Cast(e, ct)
        val tc = Cast(tolLit, ct)
        val pm = Cast(Pmod(ec, tc), ct)
        val wide = DecimalType(math.min(38, ct.precision + 1), ct.scale)
        val div = Divide(Cast(Subtract(ec, pm), wide), Cast(tc, wide))
        Cast(div, LongType)
    }
    val blAlias = Alias(bucket(l), BL)()
    val left2 = Project(j.left.output :+ blAlias, j.left)
    val br = bucket(r)
    val candidates: Expression = mode match {
      case ExactLong(_) | ExactDecimal(_, _) | ExactMicros(_) =>
        CreateArray(Seq(Subtract(br, Literal(1L)), br, Add(br, Literal(1L))))
      case DoubleBuckets =>
        // adaptive drift width (see FuzzyJoin.bucketedJoin): 0 extra
        // buckets below |bucket| = 2^50, grows with division drift above
        val d = Cast(
          Divide(Abs(Cast(br, DoubleType)), Literal((1L << 50).toDouble)),
          LongType)
        val half = Add(Literal(1L), d)
        new Sequence(Subtract(br, half), Add(br, half), None)
          .withTimeZone(conf.sessionLocalTimeZone)
    }
    val brAttr = AttributeReference(BR, LongType, nullable = true)()
    val gen = Generate(
      Explode(candidates),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(brAttr), child = j.right)
    val newCond = And(EqualTo(blAlias.toAttribute, brAttr), j.condition.get)
    Project(j.output, Join(left2, gen, Inner, Some(newCond), j.hint))
  }
}

/** Session-extension entry point: enables the transparent band-join
  * rewrite and registers the `graft_*` SQL functions — `graft_dot`
  * (native codegen Expression) plus the curation scalar kernels from
  * [[graft.functions.TextFunctions]], exposed to pure-SQL users by
  * converting the Column composition back to its Catalyst expression
  * (expression-built kernels stay codegen'd; the UDF-backed ones ride
  * the same ScalaUDF the DataFrame API uses). Activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import graft.functions.TextFunctions

  /** UDF-backed kernels: register the SAME raw lambda the DataFrame
    * `udf()` wrapper uses as a ScalaUDF expression (Column trees don't
    * convert to standalone Catalyst expressions through the classic
    * adapter; the encoder-less ScalaUDF path boxes UTF8String→String
    * exactly like `udf()` does).
    */
  private def scalarFn(name: String, f: AnyRef, dt: org.apache.spark.sql.types.DataType) = (
    new FunctionIdentifier(name),
    new ExpressionInfo("graft.functions.TextFunctions", name),
    (exprs: Seq[Expression]) => ScalaUDF(f, dt, exprs, udfName = Some(name)))

  /** Expression-built kernels re-stated as direct Catalyst trees — the
    * analyzer type-coerces them exactly as it does the Column forms, so
    * the SQL surface stays codegen'd (no UDF). Agreement with the
    * Column API is suite-asserted.
    */
  private def scrubExpr(e: Expression): Expression =
    RegExpReplace(
      RegExpReplace(
        RegExpReplace(e, Literal("https?://\\S+"), Literal("<URL>")),
        Literal("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), Literal("<EMAIL>")),
      Literal("[0-9]{7,}"), Literal("<NUM>"))

  private def fingerprintExpr(e: Expression): Expression =
    Md5(Cast(Lower(RegExpReplace(StringTrim(e), Literal("\\s+"), Literal(" "))), BinaryType))

  private def tokenEstimateExpr(e: Expression): Expression =
    Cast(Add(
      Ceil(Divide(Cast(Length(StringTrim(e)), DoubleType), Literal(4.0))),
      Cast(Length(RegExpReplace(e, Literal("[^.,!?;:]"), Literal(""))), LongType)), LongType)

  private def exprFn(name: String, f: Expression => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo("graft.functions.TextFunctions", name),
    (exprs: Seq[Expression]) => f(exprs.head))

  /** Column-API functions surfaced verbatim in SQL: the builder runs
    * the SAME Column composition the Scala API runs and unwraps the
    * tree, so SQL ≡ Column agreement holds by construction (and stays
    * codegen'd — these compositions are built-in expressions only).
    */
  private def colFn(name: String, f: org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column) = (
    new FunctionIdentifier(name),
    new ExpressionInfo("graft.functions.TextFunctions", name),
    (exprs: Seq[Expression]) => {
      import org.apache.spark.sql.GraftInternals.toRealExpression
      // run the Column composition over a named placeholder, then graft
      // the caller's argument into the unresolved tree — the analyzer
      // resolves/coerces it exactly like the Column API's output
      val template =
        toRealExpression(f(org.apache.spark.sql.functions.col("__graft_arg__")))
      template.transformUp {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            if a.nameParts == Seq("__graft_arg__") => exprs.head
      }
    })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => FuzzyJoinRewrite)
    ext.injectPlannerStrategy(_ => RangeJoinStrategy)
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction(scalarFn("graft_quality", TextFunctions.qualityFn, DoubleType))
    ext.injectFunction(scalarFn("graft_lang_id", TextFunctions.langIdFn, StringType))
    ext.injectFunction(scalarFn("graft_nfc", TextFunctions.nfcFn, StringType))
    ext.injectFunction(scalarFn("graft_strip_accents", TextFunctions.stripAccentsFn, StringType))
    ext.injectFunction(scalarFn("graft_dup_line_ratio", TextFunctions.dupLineRatioFn, DoubleType))
    ext.injectFunction(scalarFn("graft_top_token_ratio", TextFunctions.topTokenRatioFn, DoubleType))
    ext.injectFunction(exprFn("graft_scrub", scrubExpr))
    ext.injectFunction(exprFn("graft_fingerprint", fingerprintExpr))
    ext.injectFunction(exprFn("graft_token_estimate", tokenEstimateExpr))
    ext.injectFunction(colFn("graft_extract_html", TextFunctions.extractHtml))
    ext.injectFunction(colFn("graft_canonical_url", TextFunctions.canonicalizeUrl))
    ext.injectFunction(colFn("graft_clean_lines", TextFunctions.cleanLines(_)))
    ext.injectFunction(colFn("graft_fold_confusables", TextFunctions.foldConfusables))
    ext.injectFunction(colFn("graft_gopher", t => TextFunctions.gopherFlags(t)))
    // signature kernels on the SQL surface: the same native
    // expressions the Column API plans, so SQL ≡ Column bit-identity
    // holds by construction
    ext.injectFunction(exprFn("graft_simhash64",
      e => graft.functions.SimHash64Expr(e)))
    ext.injectFunction(exprFn("graft_ahash64",
      e => graft.functions.AHash64Expr(e)))
    ext.injectFunction(exprFn("graft_phash64",
      e => graft.functions.PHash64Expr(e)))
    ext.injectFunction(exprFn("graft_audiohash64",
      e => graft.functions.AudioHash64Expr(e)))
    ext.injectFunction((
      new FunctionIdentifier("graft_lcp"),
      new ExpressionInfo(classOf[graft.functions.LcpCharsExpr].getName, "graft_lcp"),
      (exprs: Seq[Expression]) =>
        graft.functions.LcpCharsExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_grid_cos"),
      new ExpressionInfo(classOf[graft.functions.GridCosExpr].getName,
        "graft_grid_cos"),
      (exprs: Seq[Expression]) =>
        graft.functions.GridCosExpr(exprs(0), exprs(1))))
    // subfingerprints take literal int parameters after the payload:
    // graft_audiosubfp(bin [, windowSamples, k, w])
    ext.injectFunction((
      new FunctionIdentifier("graft_audiosubfp"),
      new ExpressionInfo(classOf[graft.functions.AudioSubFpExpr].getName,
        "graft_audiosubfp"),
      (exprs: Seq[Expression]) => {
        def intArg(i: Int, dflt: Int): Int =
          if (exprs.length > i) {
            require(exprs(i).foldable,
              s"graft_audiosubfp: argument ${i + 1} must be a literal int")
            exprs(i).eval().asInstanceOf[Number].intValue
          } else dflt
        graft.functions.AudioSubFpExpr(
          exprs.head, intArg(1, 400), intArg(2, 16), intArg(3, 4))
      }))
  }
}
