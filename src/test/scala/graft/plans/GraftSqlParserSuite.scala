package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** FUZZY JOIN SQL syntax: desugaring correctness (token scanner edge
  * cases), end-to-end result equivalence with the operator API, and the
  * plan shape (the desugared join must ride the bucketed rewrite, not a
  * nested loop).
  */
class GraftSqlParserSuite extends SparkSpec {
  import GraftSqlParser.desugar

  test("plain SQL passes through unchanged (same instance)") {
    val q = "SELECT a, b FROM t WHERE abs(a - b) <= 0.5 ORDER BY a"
    assert(desugar(q) eq q)
  }

  test("basic desugar shape") {
    val q = "SELECT * FROM l FUZZY JOIN r ON l.a NEAR r.b WITHIN 0.5"
    assert(desugar(q) ==
      "SELECT * FROM l JOIN r ON abs((l.a) - (r.b)) <= (0.5) ")
  }

  test("trailing residual conjuncts and WHERE survive verbatim") {
    val q = "SELECT * FROM l FUZZY JOIN r ON l.a NEAR r.b WITHIN 1.5 " +
      "AND l.k < r.k WHERE l.a > 0"
    val d = desugar(q)
    assert(d.contains("ON abs((l.a) - (r.b)) <= (1.5) AND l.k < r.k"))
    assert(d.contains("WHERE l.a > 0"))
  }

  test("FUZZY JOIN inside strings and comments is untouched") {
    val q1 = "SELECT 'use FUZZY JOIN ON a NEAR b WITHIN 2' AS hint FROM t"
    assert(desugar(q1) eq q1)
    val q2 = "SELECT a FROM t -- FUZZY JOIN r ON x NEAR y WITHIN 1\nWHERE a > 0"
    assert(desugar(q2) eq q2)
    val q3 = "SELECT a FROM t /* nested /* FUZZY JOIN */ comment */ WHERE a > 0"
    assert(desugar(q3) eq q3)
  }

  test("backquoted identifiers named like the keywords are not keywords") {
    val q = "SELECT `near`, `within` FROM t FUZZY JOIN r ON t.a NEAR r.b WITHIN 2"
    val d = desugar(q)
    assert(d.startsWith("SELECT `near`, `within` FROM t JOIN r ON abs((t.a) - (r.b)) <= (2)"))
  }

  test("two fuzzy joins in one statement both desugar") {
    val q = "SELECT * FROM a FUZZY JOIN b ON a.x NEAR b.y WITHIN 1 " +
      "FUZZY JOIN c ON b.y NEAR c.z WITHIN 2"
    val d = desugar(q)
    assert(d.contains("JOIN b ON abs((a.x) - (b.y)) <= (1)"))
    assert(d.contains("JOIN c ON abs((b.y) - (c.z)) <= (2)"))
    assert(!d.toUpperCase.contains("FUZZY"))
  }

  test("fuzzy join inside a subquery desugars at its own depth") {
    val q = "SELECT * FROM (SELECT l.a AS a FROM l FUZZY JOIN r ON l.a NEAR r.b " +
      "WITHIN 0.25) s WHERE s.a > 1"
    val d = desugar(q)
    assert(d.contains("JOIN r ON abs((l.a) - (r.b)) <= (0.25) "))
    assert(d.endsWith("s WHERE s.a > 1"))
  }

  test("subquery as the join relation: ON found at the join's depth") {
    val q = "SELECT * FROM l FUZZY JOIN (SELECT b FROM r WHERE b > 0) rr " +
      "ON l.a NEAR rr.b WITHIN 3"
    val d = desugar(q)
    assert(d.contains("(SELECT b FROM r WHERE b > 0) rr ON abs((l.a) - (rr.b)) <= (3)"))
  }

  test("function calls in the NEAR operands keep their commas") {
    val q = "SELECT * FROM l FUZZY JOIN r ON round(l.a, 2) NEAR round(r.b, 2) WITHIN 1"
    assert(desugar(q).contains("ON abs((round(l.a, 2)) - (round(r.b, 2))) <= (1)"))
  }

  test("malformed fuzzy joins fail loudly, not silently") {
    def bad(q: String): Unit = {
      val e = intercept[IllegalArgumentException](desugar(q))
      assert(e.getMessage.contains("FUZZY JOIN"))
    }
    bad("SELECT * FROM l FUZZY JOIN r WHERE l.a > 0")            // no ON
    bad("SELECT * FROM l FUZZY JOIN r ON l.a < r.b")             // no NEAR
    bad("SELECT * FROM l FUZZY JOIN r ON l.a NEAR r.b")          // no WITHIN
    bad("SELECT * FROM l FUZZY JOIN r JOIN x ON a NEAR b WITHIN 1") // ON not direct
  }

  test("ASOF JOIN: plain SQL without the phrase passes through unchanged") {
    val q = "SELECT a FROM t WHERE a >= 1"
    assert(GraftSqlParser.desugarAsOf(q) eq q)
    // the word inside a string literal is not a keyword
    val q2 = "SELECT 'ASOF JOIN r ON a >= b' AS hint FROM t"
    assert(GraftSqlParser.desugarAsOf(q2) eq q2)
  }

  test("malformed ASOF joins fail loudly, not silently") {
    // desugarAsOf touches the session only after the shape checks pass,
    // so pure-syntax failures need no relations
    def bad(q: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](GraftSqlParser.desugarAsOf(q))
      assert(e.getMessage.contains("ASOF JOIN"), e.getMessage)
      assert(e.getMessage.contains(needle), e.getMessage)
    }
    bad("SELECT * FROM l ASOF JOIN r WHERE a >= b", "no ON clause")
    bad("SELECT * FROM l JOIN x ON p = q ASOF JOIN r ON a >= b",
      "not a simple relation")
    bad("SELECT * FROM l ASOF JOIN r ON a >= b AND c = d", "same column name")
    bad("SELECT * FROM l ASOF JOIN r ON a >= b AND c >= d",
      "more than one timestamp inequality")
    bad("SELECT * FROM l ASOF JOIN r ON a = a", ">= or <= timestamp inequality")
    // `a <> b` parses as a strict `<` with garbage operands: loud
    bad("SELECT * FROM l ASOF JOIN r ON a <> b", "plain column")
    bad("SELECT * FROM l ASOF JOIN r ON a >= b OR c >= d", "OR in the ON")
    bad("SELECT * FROM l ASOF JOIN r ON a + 1 >= b", "plain column")
  }

  test("end-to-end: ASOF JOIN SQL == AsOfJoin.unbounded, both directions") {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s.implicits._
      val quotes = Seq((10L, 100), (20L, 101), (30L, 102), (45L, 103))
        .toDF("qts", "qid")
      val trades = Seq((5L, 1), (12L, 2), (31L, 3), (60L, 4))
        .toDF("tts", "tid")
      trades.createOrReplaceTempView("asof_trades")
      quotes.createOrReplaceTempView("asof_quotes")
      val back = s.sql(
        """SELECT tid, qid, tts, qts FROM asof_trades ASOF JOIN asof_quotes
          |ON tts >= qts""".stripMargin)
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      // nearest preceding quote per trade; trade at 5 has none (inner)
      assert(back == Set((2, 100), (3, 102), (4, 103)))
      val fwd = s.sql(
        """SELECT tid, qid FROM asof_trades ASOF JOIN asof_quotes
          |ON tts <= qts""".stripMargin)
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      // nearest following quote per trade; trade at 60 has none
      assert(fwd == Set((1, 100), (2, 101), (3, 103)))
      // flipped operand order flips the assignment, not the semantics
      val flipped = s.sql(
        """SELECT tid, qid FROM asof_trades ASOF JOIN asof_quotes
          |ON qts <= tts""".stripMargin)
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(flipped == back.map { case (t, q) => (t, q) })
      // equivalence with the library call
      val viaApi = graft.operators.AsOfJoin.unbounded(
        trades, quotes, rightId = "qts",
        leftOn = Some("tts"), rightOn = Some("qts"))
        .select("tid", "qid")
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(back == viaApi)
      // grouped form: same-name equality conjuncts become by-keys
      val gq = Seq((10L, "a", 100), (20L, "a", 101), (15L, "b", 102))
        .toDF("qts", "sym", "qid")
      val gt = Seq((12L, "a", 1), (16L, "b", 2), (14L, "b", 3))
        .toDF("tts", "sym", "tid")
      gt.createOrReplaceTempView("asof_gtrades")
      gq.createOrReplaceTempView("asof_gquotes")
      val grouped = s.sql(
        """SELECT tid, qid FROM asof_gtrades ASOF JOIN asof_gquotes
          |ON sym = sym AND tts >= qts""".stripMargin)
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      // trade(12,a)->quote(10,a); trade(16,b)->quote(15,b); trade(14,b)
      // has no preceding b quote and must NOT borrow a's quote at 10
      assert(grouped == Set((1, 100), (2, 102)))
      // ASOF LEFT JOIN: the unmatched trade (tts=5) survives with a
      // null quote — DuckDB's left form, |out| == |left|
      val leftJ = s.sql(
        """SELECT tid, qid FROM asof_trades ASOF LEFT JOIN asof_quotes
          |ON tts >= qts""".stripMargin)
        .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
        .toSet
      assert(leftJ == Set((1, -1), (2, 100), (3, 102), (4, 103)))
      val leftG = s.sql(
        """SELECT tid, qid FROM asof_gtrades ASOF LEFT JOIN asof_gquotes
          |ON sym = sym AND tts >= qts""".stripMargin)
        .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
        .toSet
      assert(leftG == Set((1, 100), (2, 102), (3, -1)))
      // STRICT inequality (DuckDB's allow-exact-matches-false form):
      // quotes at exactly the trade's timestamp no longer match
      val exact = Seq((12L, 200), (5L, 201)).toDF("qts", "qid")
      exact.createOrReplaceTempView("asof_equotes")
      val strict = s.sql(
        """SELECT tid, qid FROM asof_trades ASOF LEFT JOIN asof_equotes
          |ON tts > qts""".stripMargin)
        .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
        .toSet
      // trade at 12 skips the equal-ts quote 200, taking quote 201 (5);
      // trade at 5 skips its own equal-ts quote and has nothing earlier
      assert(strict == Set((1, -1), (2, 201), (3, 200), (4, 200)))
    } finally {
      SparkSession.setActiveSession(orig)
      SparkSession.setDefaultSession(orig)
    }
  }

  test("end-to-end: FUZZY JOIN SQL == operator API == naive join") {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s.implicits._
      val l = (0 until 300).map(i => (i, i * 0.37)).toDF("lid", "a")
      val r = (0 until 200).map(i => (i, i * 0.61)).toDF("rid", "b")
      l.createOrReplaceTempView("fzl")
      r.createOrReplaceTempView("fzr")
      val viaSql = s.sql(
        "SELECT lid, rid FROM fzl FUZZY JOIN fzr ON a NEAR b WITHIN 0.5")
      // the desugared plan must ride the bucketed rewrite, not a loop
      val plan = viaSql.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
      val viaApi = graft.operators.FuzzyJoin.numeric(
        l, r, tol = 0.5, leftOn = Some("a"), rightOn = Some("b"))
        .select("lid", "rid")
      val naive = l.hint("broadcast").crossJoin(r)
        .filter(abs(col("a") - col("b")) <= 0.5).select("lid", "rid")
      val sqlRows = viaSql.collect().map(x => (x.getInt(0), x.getInt(1))).toSet
      assert(sqlRows == viaApi.collect().map(x => (x.getInt(0), x.getInt(1))).toSet)
      assert(sqlRows == naive.collect().map(x => (x.getInt(0), x.getInt(1))).toSet)
    } finally {
      // no s.stop(): the builder reuses the shared local SparkContext
      // (same pattern as BroadcastRangeJoinSuite.withStrategy)
      SparkSession.setActiveSession(orig)
      SparkSession.setDefaultSession(orig)
    }
  }
}
