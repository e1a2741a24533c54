package graft.plans

import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL surface for the band join (SURVEY.md §7.5 stretch; the
  * reference exposes `fuzzy_join` only as a library call —
  * pandance/pandance.py:376-418 — so this is a beyond-reference
  * convenience on top of the same semantics):
  *
  * {{{
  *   SELECT ... FROM l FUZZY JOIN r ON l.a NEAR r.b WITHIN 0.5 [AND ...]
  * }}}
  *
  * desugars, before delegation to Spark's parser, into
  *
  * {{{
  *   SELECT ... FROM l JOIN r ON abs((l.a) - (r.b)) <= (0.5) [AND ...]
  * }}}
  *
  * which [[FuzzyJoinRewrite]] then turns into the bucketed equi-join —
  * so the syntax and the transparent optimization share one plan path,
  * and the naive-join semantics (`abs(a−b) <= tol`) stay the single
  * source of truth.
  *
  * The desugarer is a character-accurate token scanner, not a regex: it
  * skips string literals (`'…'`, `"…"`, with `''`/backslash escapes),
  * backquoted identifiers, `--` line comments and nested `/* … */`
  * bracketed comments, and tracks parenthesis depth, so `FUZZY JOIN`
  * inside a string/comment is untouched and `NEAR`/`WITHIN` are only
  * keywords at the top level of the ON clause of a `FUZZY JOIN` (a
  * column actually named `near` can be written `` `near` ``). Multiple
  * fuzzy joins per statement (including inside subqueries) desugar
  * iteratively. Everything else — any statement without the phrase —
  * passes through byte-identical.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser.{desugar, desugarAsOf}

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(desugarAsOf(desugar(sqlText)))

  override def parsePlanWithParameters(
      sqlText: String, ctx: ParameterContext): LogicalPlan =
    delegate.parsePlanWithParameters(desugarAsOf(desugar(sqlText)), ctx)

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(desugarAsOf(desugar(sqlText)))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)

  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)

  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)

  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)

  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)

  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)

  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  /** One scanned token: uppercased word or single punctuation char, its
    * [start, end) slice of the original text, and the paren depth at its
    * position. String literals, quoted identifiers, and comments are
    * skipped entirely (they can never be keywords); other characters
    * (operators, digits, whitespace) are not cut points and are carried
    * through untouched by slice-based reassembly.
    */
  private final case class Tok(word: String, start: Int, end: Int, depth: Int)

  private def scan(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    val n = sql.length
    var i = 0
    var depth = 0
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"') {
        val q = c
        i += 1
        var done = false
        while (i < n && !done) {
          val ch = sql.charAt(i)
          if (ch == '\\') i += 2
          else if (ch == q) {
            if (i + 1 < n && sql.charAt(i + 1) == q) i += 2 else { done = true; i += 1 }
          } else i += 1
        }
      } else if (c == '`') {
        i += 1
        var done = false
        while (i < n && !done) {
          if (sql.charAt(i) == '`') {
            if (i + 1 < n && sql.charAt(i + 1) == '`') i += 2 else { done = true; i += 1 }
          } else i += 1
        }
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        var d = 1
        i += 2
        while (i < n && d > 0) {
          if (i + 1 < n && sql.charAt(i) == '/' && sql.charAt(i + 1) == '*') { d += 1; i += 2 }
          else if (i + 1 < n && sql.charAt(i) == '*' && sql.charAt(i + 1) == '/') { d -= 1; i += 2 }
          else i += 1
        }
      } else if (c == '(') {
        out += Tok("(", i, i + 1, depth); depth += 1; i += 1
      } else if (c == ')') {
        depth -= 1; out += Tok(")", i, i + 1, depth); i += 1
      } else if (c == ',' || c == ';') {
        out += Tok(c.toString, i, i + 1, depth); i += 1
      } else if (c.isLetter || c == '_') {
        val s = i
        while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
        out += Tok(sql.substring(s, i).toUpperCase(java.util.Locale.ROOT), s, i, depth)
      } else i += 1
    }
    out.result()
  }

  /** Keywords that end an ON clause at its own depth. */
  private val ClauseEnd: Set[String] = Set(
    "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "SEMI", "ANTI",
    "NATURAL", "FUZZY", "LATERAL", "WHERE", "GROUP", "HAVING", "WINDOW",
    "ORDER", "SORT", "CLUSTER", "DISTRIBUTE", "LIMIT", "OFFSET", "UNION",
    "EXCEPT", "INTERSECT", "MINUS", ",", ";")

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(
      s"[GRAFT] FUZZY JOIN syntax: $msg — expected " +
        "`FUZZY JOIN <rel> ON <expr> NEAR <expr> WITHIN <tolerance> [AND ...]`")

  /** Rewrite the first `FUZZY JOIN … ON a NEAR b WITHIN tol` in `sql`
    * into standard syntax; None when no fuzzy join is present.
    */
  private def desugarFirst(sql: String): Option[String] = {
    val toks = scan(sql)
    val fz = toks.indices.find { k =>
      toks(k).word == "FUZZY" && k + 1 < toks.length &&
        toks(k + 1).word == "JOIN" && toks(k + 1).depth == toks(k).depth
    }
    fz.map { k =>
      val d = toks(k).depth
      // the ON of this join: first ON at the same depth; another join or
      // clause keyword first means the fuzzy join has no direct ON
      var j = k + 2
      while (j < toks.length &&
          !(toks(j).depth == d && toks(j).word == "ON")) {
        if (toks(j).depth == d && ClauseEnd.contains(toks(j).word))
          fail("no ON clause directly after FUZZY JOIN")
        if (toks(j).depth < d) fail("no ON clause directly after FUZZY JOIN")
        j += 1
      }
      if (j >= toks.length) fail("no ON clause directly after FUZZY JOIN")
      val on = j
      // ON-clause region: up to a clause keyword at depth d, a token at
      // shallower depth (closing a subquery), or end of statement
      var e = on + 1
      while (e < toks.length && toks(e).depth >= d &&
          !(toks(e).depth == d && ClauseEnd.contains(toks(e).word))) e += 1
      val clauseEndPos = if (e < toks.length) toks(e).start else sql.length
      def findKw(from: Int, kw: String): Option[Int] =
        (from until e).find(x => toks(x).depth == d && toks(x).word == kw)
      val near = findKw(on + 1, "NEAR").getOrElse(fail("no NEAR in the ON clause"))
      val within = findKw(near + 1, "WITHIN").getOrElse(fail("no WITHIN after NEAR"))
      // tolerance runs to the first top-level AND/OR (trailing residual
      // conjuncts stay as written) or to the end of the ON clause
      val tolEnd = (within + 1 until e)
        .find(x => toks(x).depth == d && (toks(x).word == "AND" || toks(x).word == "OR"))
        .map(toks(_).start).getOrElse(clauseEndPos)
      val a = sql.substring(toks(on).end, toks(near).start).trim
      val b = sql.substring(toks(near).end, toks(within).start).trim
      val tol = sql.substring(toks(within).end, tolEnd).trim
      if (a.isEmpty || b.isEmpty || tol.isEmpty)
        fail("empty expression around NEAR/WITHIN")
      sql.substring(0, toks(k).start) +
        sql.substring(toks(k + 1).start, toks(on).end) +
        s" abs(($a) - ($b)) <= ($tol) " +
        sql.substring(tolEnd)
    }
  }

  /** Desugar every `FUZZY JOIN` in the statement; non-fuzzy SQL returns
    * unchanged (same String instance — zero cost on the common path).
    */
  def desugar(sql: String): String = {
    var cur = sql
    var guard = 0
    var more = true
    while (more && guard < 100) {
      desugarFirst(cur) match {
        case Some(next) => cur = next; guard += 1
        case None => more = false
      }
    }
    cur
  }

  // ---------------------------------------------------------------------
  // ASOF JOIN (DuckDB-compatible surface for AsOfJoin.unbounded):
  //
  //   SELECT ... FROM l ASOF JOIN r ON l.ts >= r.ts ...
  //   SELECT ... FROM l ASOF LEFT JOIN r ON l.ts >= r.ts ...
  //
  // `>=` matches the nearest PRECEDING right row (backward), `<=` the
  // nearest FOLLOWING (forward); `LEFT` keeps unmatched left rows with
  // null right columns (DuckDB's ASOF LEFT JOIN / pandas merge_asof) —
  // no tolerance either way, exactly
  // AsOfJoin.unbounded. Unlike FUZZY JOIN this cannot desugar to plain
  // SQL (the scalable plan is a range-shuffled union + windows, not a
  // join Catalyst could discover), so the parser builds the unbounded
  // plan for the two relations directly and splices it back into the
  // statement as a temp view.
  //
  // Contract (violations fail loudly, never silently):
  //  - each side of ASOF JOIN is a simple relation — a table/view name
  //    or a parenthesized subquery — not an unparenthesized join chain;
  //  - the ON clause is one `col >= col` / `col <= col` inequality plus
  //    optional same-name `col = col` equalities, which become the
  //    grouped join's by-keys (DuckDB's `ON l.k = r.k AND l.ts >= r.ts`
  //    shape); no OR, no expressions around the columns;
  //  - downstream references use the join's OUTPUT column names (the
  //    library call's suffix rules) — relation aliases do not survive
  //    the splice;
  //  - ties on equal right timestamps break to the largest (backward) /
  //    smallest (forward) right timestamp-column value, so results are
  //    deterministic when right timestamps are unique (the usual as-of
  //    precondition; pre-aggregate the right side otherwise);
  //  - the range-partition pass runs when the statement is PARSED
  //    (spark.sql), not at first action — the sort materializes once.
  // ---------------------------------------------------------------------

  private def asofFail(msg: String): Nothing =
    throw new IllegalArgumentException(
      s"[GRAFT] ASOF JOIN syntax: $msg — expected " +
        "`<rel> ASOF [LEFT] JOIN <rel> ON <leftCol> >= <rightCol>` " +
        "(or `<=` for a forward join); each side a simple relation, " +
        "one inequality, no other conjuncts")

  /** Bare (last-segment, unquoted) column name of a possibly-qualified
    * reference; None when the text is not a plain column reference.
    */
  private def bareColumn(text: String): Option[String] = {
    val seg = "(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)"
    val re = s"^$seg(\\.$seg)*$$".r
    val t = text.trim
    re.findFirstIn(t).map { _ =>
      val last = t.substring(t.lastIndexOf('.') + 1)
      if (last.startsWith("`")) last.stripPrefix("`").stripSuffix("`") else last
    }
  }

  private def desugarAsOfFirst(sql: String): Option[String] = {
    val toks = scan(sql)
    // ASOF JOIN or ASOF LEFT JOIN (the left-outer form)
    val az = toks.indices.find { k =>
      toks(k).word == "ASOF" && k + 1 < toks.length &&
        toks(k + 1).depth == toks(k).depth &&
        (toks(k + 1).word == "JOIN" ||
          (toks(k + 1).word == "LEFT" && k + 2 < toks.length &&
            toks(k + 2).word == "JOIN" && toks(k + 2).depth == toks(k).depth))
    }
    az.map { k =>
      val d = toks(k).depth
      val isLeft = toks(k + 1).word == "LEFT"
      val joinTok = if (isLeft) k + 2 else k + 1
      // left relation: back to the FROM / ',' introducing this item; any
      // join keyword in between means a compound left side (unsupported)
      var b = k - 1
      while (b >= 0 && !(toks(b).depth == d &&
          (toks(b).word == "FROM" || toks(b).word == ","))) {
        if (toks(b).depth == d &&
            (ClauseEnd.contains(toks(b).word) || toks(b).word == "ON"))
          asofFail(s"left side of ASOF JOIN is not a simple relation")
        if (toks(b).depth < d) asofFail("ASOF JOIN outside a FROM item")
        b -= 1
      }
      if (b < 0) asofFail("ASOF JOIN without a FROM clause")
      val leftStart = toks(b).end
      val leftText = sql.substring(leftStart, toks(k).start).trim
      // ON of this join
      var j = joinTok + 1
      while (j < toks.length && !(toks(j).depth == d && toks(j).word == "ON")) {
        if (toks(j).depth <= d && ClauseEnd.contains(toks(j).word))
          asofFail("no ON clause directly after ASOF JOIN")
        if (toks(j).depth < d) asofFail("no ON clause directly after ASOF JOIN")
        j += 1
      }
      if (j >= toks.length) asofFail("no ON clause directly after ASOF JOIN")
      val on = j
      val rightText = sql.substring(toks(joinTok).end, toks(on).start).trim
      if (leftText.isEmpty || rightText.isEmpty)
        asofFail("empty relation around ASOF JOIN")
      // ON-clause region: top-level AND splits conjuncts (DuckDB's
      // grouped form — equalities become by-keys); OR is unsupported
      var e = on + 1
      val andPos = Vector.newBuilder[Int]
      while (e < toks.length && toks(e).depth >= d &&
          !(toks(e).depth == d && ClauseEnd.contains(toks(e).word))) {
        if (toks(e).depth == d && toks(e).word == "OR")
          asofFail("OR in the ON clause is unsupported")
        if (toks(e).depth == d && toks(e).word == "AND") andPos += e
        e += 1
      }
      val clauseEndPos = if (e < toks.length) toks(e).start else sql.length
      val bounds = (toks(on).end +: andPos.result().map(toks(_).end)) zip
        (andPos.result().map(toks(_).start) :+ clauseEndPos)
      // classify each conjunct: exactly one `col >= col` / `col <= col`
      // (or the STRICT `>` / `<` — DuckDB's allow-exact-matches-false
      // forms) inequality; every other must be a same-name `col = col`
      // equality (the by-keys of a grouped as-of)
      var ineq: Option[(String, String, String)] = None
      val byKeys = Vector.newBuilder[String]
      bounds.foreach { case (cs, ce) =>
        val cond = sql.substring(cs, ce)
        def side(from: Int, to: Int, what: String): String =
          bareColumn(cond.substring(from, to)).getOrElse(
            asofFail(s"'${cond.substring(from, to).trim}' is not a plain " +
              s"column reference ($what)"))
        val gt = cond.indexOf('>')
        val lt = cond.indexOf('<')
        if (gt >= 0 || lt >= 0) {
          val p = if (gt >= 0 && (lt < 0 || gt < lt)) gt else lt
          val op =
            if (p + 1 < cond.length && cond(p + 1) == '=')
              cond.substring(p, p + 2)
            else cond.substring(p, p + 1)
          if (ineq.isDefined)
            asofFail("more than one timestamp inequality in the ON clause")
          ineq = Some((side(0, p, "inequality"),
            side(p + op.length, cond.length, "inequality"), op))
        } else {
          val eq = cond.indexOf('=')
          if (eq < 0) asofFail("each ON conjunct must be an equality or a >=/<= inequality")
          val a = side(0, eq, "equality")
          val b = side(eq + 1, cond.length, "equality")
          if (a != b)
            asofFail(s"by-key equality must reference the same column name " +
              s"on both sides, got '$a' = '$b'")
          byKeys += a
        }
      }
      val (aCol, bCol, op) = ineq.getOrElse(
        asofFail("ON clause must contain a >= or <= timestamp inequality"))

      val spark = org.apache.spark.sql.SparkSession.active
      def rel(text: String) = spark.sql(s"SELECT * FROM $text")
      val lDf = rel(leftText)
      val rDf = rel(rightText)
      // assign the inequality sides to the relations by column lookup;
      // `l.ts >= r.ts` is backward (nearest preceding), flipped operand
      // order flips the direction; the strict forms (`>` / `<`) exclude
      // the equal-timestamp match (allow_exact_matches = false)
      val allowExact = op == ">=" || op == "<="
      val opBackward = op == ">=" || op == ">"
      val (leftOn, rightOn, backward) =
        if (lDf.columns.contains(aCol) && rDf.columns.contains(bCol))
          (aCol, bCol, opBackward)
        else if (lDf.columns.contains(bCol) && rDf.columns.contains(aCol))
          (bCol, aCol, !opBackward)
        else asofFail(s"cannot resolve '$aCol' / '$bCol' against the two sides")
      val joined = graft.operators.AsOfJoin.unbounded(
        lDf, rDf, rightId = rightOn,
        leftOn = Some(leftOn), rightOn = Some(rightOn),
        direction = if (backward) "backward" else "forward",
        by = byKeys.result(),
        joinType = if (isLeft) "left" else "inner",
        allowExactMatches = allowExact)
      val view = s"graft_asof_${(sql.hashCode.toLong & 0xffffffffL).toHexString}_${toks(k).start}"
      joined.createOrReplaceTempView(view)
      sql.substring(0, leftStart) + s" $view " + sql.substring(clauseEndPos)
    }
  }

  /** Splice every `ASOF JOIN` in the statement into its unbounded-as-of
    * plan; statements without the phrase return unchanged (same String
    * instance).
    */
  def desugarAsOf(sql: String): String = {
    if (!sql.toUpperCase(java.util.Locale.ROOT).contains("ASOF")) return sql
    var cur = sql
    var guard = 0
    var more = true
    while (more && guard < 100) {
      desugarAsOfFirst(cur) match {
        case Some(next) => cur = next; guard += 1
        case None => more = false
      }
    }
    cur
  }
}
