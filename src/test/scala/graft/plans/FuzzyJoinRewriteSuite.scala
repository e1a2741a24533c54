package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec

/** The transparent band-join rewrite: plan shape (nested loop -> equi
  * join), result equality with the unrewritten plan, decimal opt-out,
  * and GraftExtensions session wiring.
  */
class FuzzyJoinRewriteSuite extends SparkSpec {
  import spark.implicits._

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations = Seq(FuzzyJoinRewrite)
    try f finally spark.experimental.extraOptimizations = Nil
  }

  private def l = Seq((1, 1.0), (2, 2.0), (3, 3.5), (4, Double.NaN)).toDF("lid", "v")
  private def r = Seq((10, 1.05), (20, 2.15), (30, 9.9)).toDF("rid", "w")

  test("user-written abs(l-r) <= tol join loses its nested loop under the rule") {
    val unoptimized = l.join(r, abs(col("v") - col("w")) <= lit(0.2))
    assert(unoptimized.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    withRule {
      val rewritten = l.join(r, abs(col("v") - col("w")) <= lit(0.2))
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    }
  }

  test("rewritten plan returns exactly the nested-loop results (NaN included)") {
    val expected = rowSet(l.join(r, abs(col("v") - col("w")) <= lit(0.2))
      .select("lid", "rid"))
    withRule {
      val got = rowSet(l.join(r, abs(col("v") - col("w")) <= lit(0.2))
        .select("lid", "rid"))
      assert(got == expected)
      assert(got == Set(Seq("1", "10"), Seq("2", "20")))
    }
  }

  test("reversed form tol >= abs(diff) and swapped sides also rewrite") {
    withRule {
      val p1 = l.join(r, lit(0.2) >= abs(col("v") - col("w")))
      assert(!p1.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      // abs(right - left): sides detected by reference sets, not order
      val p2 = l.join(r, abs(col("w") - col("v")) <= lit(0.2))
      assert(!p2.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(rowSet(p2.select("lid", "rid")) == Set(Seq("1", "10"), Seq("2", "20")))
    }
  }

  test("extra conjuncts survive as residual filters") {
    withRule {
      val out = l.join(r, abs(col("v") - col("w")) <= lit(5.0) && col("rid") > 15)
      assert(rowSet(out.select("lid", "rid")) ==
        Set(Seq("1", "20"), Seq("2", "20"), Seq("3", "20")))
    }
  }

  test("decimal columns with a DOUBLE tolerance stay on the nested loop") {
    // the naive residual is the double-rounded decimal diff; no bucket
    // scheme is exact against that coercion, so the rule stays away
    val ld = l.select($"lid", $"v".cast(DecimalType(10, 2)).as("v"))
    val rd = r.select($"rid", $"w".cast(DecimalType(10, 2)).as("w"))
    withRule {
      val out = ld.join(rd, abs(col("v") - col("w")) <= lit(0.2))
      assert(out.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(rowSet(out.select("lid", "rid")) == Set(Seq("1", "10"), Seq("2", "20")))
    }
  }

  test("decimal band joins with a DECIMAL tolerance rewrite through exact buckets") {
    val rnd = new scala.util.Random(12)
    val ldata = (0 until 60).map(i => (i, rnd.nextInt(20000)))
    val rdata = (0 until 50).map(i => (i + 100, rnd.nextInt(20000)))
    def dec(df: org.apache.spark.sql.DataFrame, c: String) =
      df.withColumn(c, (col(c) / 100.0).cast(DecimalType(10, 2)))
    val ld = dec(ldata.toDF("lid", "v"), "v")
    val rd = dec(rdata.toDF("rid", "w"), "w")
    val tol = lit(new java.math.BigDecimal("0.25"))
    val naive = rowSet(ld.join(rd, abs(col("v") - col("w")) <= tol).select("lid", "rid"))
    withRule {
      val out = ld.join(rd, abs(col("v") - col("w")) <= tol)
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
      assert(rowSet(out.select("lid", "rid")) == naive)
    }
    // over-wide precision opts out (quotient no longer provably exact)
    val wide = ld.withColumn("v", col("v").cast(DecimalType(38, 2)))
    val wider = rd.withColumn("w", col("w").cast(DecimalType(38, 2)))
    withRule {
      val out = wide.join(wider, abs(col("v") - col("w")) <= tol)
      assert(out.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    }
  }

  test("SQL-text band joins are rewritten too (no Scala API involved)") {
    withRule {
      l.createOrReplaceTempView("fz_l")
      r.createOrReplaceTempView("fz_r")
      val out = spark.sql(
        "SELECT lid, rid FROM fz_l JOIN fz_r ON abs(v - w) <= 0.2")
      assert(!out.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(rowSet(out) == Set(Seq("1", "10"), Seq("2", "20")))
    }
  }

  test("bigint band joins rewrite through exact long buckets (values above 2^53)") {
    val base = Long.MaxValue - 100000L
    val lb = Seq((1, base), (2, base + 3000L), (3, base + 50000L)).toDF("lid", "v")
    val rb = Seq((10, base + 1000L), (20, base + 3500L), (30, base + 49000L)).toDF("rid", "w")
    // ground truth = the naive nested-loop plan (the rewrite's contract
    // is exact equivalence with it, double coercion and all)
    val naive = rowSet(
      lb.join(rb, abs(col("v") - col("w")) <= lit(1500.0)).select("lid", "rid"))
    withRule {
      val rw = lb.join(rb, abs(col("v") - col("w")) <= lit(1500.0))
      val plan = rw.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
      assert(rowSet(rw.select("lid", "rid")) == naive)
    }
  }

  test("long-vs-fractional band joins rewrite on the COERCED value, drift-widened") {
    // analysis casts the long side to double, so the bucket and the
    // residual both see the coerced value; the adaptive explode width
    // covers division drift at |v/tol| >> 2^50 (buckets here are ~9e17)
    val lb = Seq((1, Long.MaxValue - 5000L), (2, 1000L)).toDF("lid", "v")
    val rb = Seq((10, (Long.MaxValue - 5000L).toDouble), (20, 990.5)).toDF("rid", "w")
    val naive = rowSet(
      lb.join(rb, abs(col("v") - col("w")) <= lit(10.0)).select("lid", "rid"))
    withRule {
      val rw = lb.join(rb, abs(col("v") - col("w")) <= lit(10.0))
      val plan = rw.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
      assert(rowSet(rw.select("lid", "rid")) == naive)
    }
  }

  test("timestamp band joins with an INTERVAL tolerance rewrite on unix_micros") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val lt = Seq((1, t("2024-01-01 00:00:00")), (2, t("2024-01-01 00:10:00")),
      (3, t("2024-01-01 00:10:00.000003"))).toDF("lid", "lts")
    val rt = Seq((10, t("2024-01-01 00:02:59")), (20, t("2024-01-01 00:03:01")),
      (30, t("2024-01-01 00:13:00")), (40, t("2024-01-01 00:10:00.000002")))
      .toDF("rid", "rts")
    val cond = abs(col("lts") - col("rts")) <= expr("INTERVAL '3' MINUTE")
    // ground truth from the naive nested loop, boundary-inclusive
    val naive = rowSet(lt.join(rt, cond).select("lid", "rid"))
    withRule {
      val rw = lt.join(rt, cond)
      val plan = rw.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
      assert(rowSet(rw.select("lid", "rid")) == naive)
      assert(naive.contains(Seq("1", "10")) && naive.contains(Seq("2", "30")),
        "tolerance boundary rows must be present for the spec to mean anything")
    }
  }

  test("FUZZY JOIN SQL with an INTERVAL tolerance gets the bucketed plan end-to-end") {
    // parser desugar (ts NEAR ts WITHIN INTERVAL) -> analyzer
    // (SubtractTimestamps) -> this rule (ExactMicros buckets): the full
    // SQL surface for the reference's fuzzy time join
    val s2 = {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      org.apache.spark.sql.SparkSession.builder()
        .master("local[4]").withExtensions(new GraftExtensions).getOrCreate()
    }
    try {
      import s2.implicits._
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      Seq((1, t("2024-01-01 00:00:00")), (2, t("2024-01-01 00:10:00")))
        .toDF("lid", "lts").createOrReplaceTempView("fz_ts_l")
      Seq((10, t("2024-01-01 00:02:00")), (30, t("2024-01-01 00:20:00")))
        .toDF("rid", "rts").createOrReplaceTempView("fz_ts_r")
      val out = s2.sql("SELECT lid, rid FROM fz_ts_l FUZZY JOIN fz_ts_r " +
        "ON lts NEAR rts WITHIN INTERVAL '3' MINUTE")
      assert(!out.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(out.collect().map(x => (x.getInt(0), x.getInt(1))).toSet == Set((1, 10)))
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
    }
  }

  test("GraftExtensions wires the rule and graft_dot into a fresh session") {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      val dot = s2.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
        .collect()(0).getDouble(0)
      assert(dot == 11.0)
      val l2 = Seq((1, 1.0)).toDF("lid", "v")
      val r2 = Seq((10, 1.05)).toDF("rid", "w")
      val j = l2.join(r2, abs(col("v") - col("w")) <= lit(0.2))
      assert(!j.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(j.count() == 1)
    } finally {
      SparkSession.setActiveSession(orig)
      SparkSession.setDefaultSession(orig)
    }
  }

  test("graft_* curation SQL functions equal their Column-API kernels") {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      val docs = Seq(
        (1, "The quick brown fox, it jumps over the lazy dog in the field."),
        (2, "el la de que y los el la"),
        (3, "reach me at someone@example.com or https://x.test/page 12345678"),
        (4, "École naïve ü text")
      ).toDF("doc_id", "text")
      docs.createOrReplaceTempView("gx_docs")
      val viaSql = s2.sql("""
        SELECT doc_id, graft_quality(text) AS q, graft_lang_id(text) AS l,
               graft_scrub(text) AS s, graft_fingerprint(text) AS f,
               graft_token_estimate(text) AS te, graft_nfc(text) AS n,
               graft_strip_accents(text) AS sa,
               graft_dup_line_ratio(text) AS dl, graft_top_token_ratio(text) AS tt
        FROM gx_docs""")
      val viaApi = docs.select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("q"),
        graft.functions.TextFunctions.langId(col("text")).as("l"),
        graft.functions.TextFunctions.scrubPii(col("text")).as("s"),
        graft.functions.TextFunctions.fingerprint(col("text")).as("f"),
        graft.functions.TextFunctions.tokenEstimate(col("text")).as("te"),
        graft.functions.TextFunctions.normalizeNfc(col("text")).as("n"),
        graft.functions.TextFunctions.stripAccents(col("text")).as("sa"),
        graft.functions.TextFunctions.dupLineRatio(col("text")).as("dl"),
        graft.functions.TextFunctions.topTokenRatio(col("text")).as("tt"))
      assert(rowSet(viaSql) == rowSet(viaApi))
      // spot-check semantics, not just agreement
      val byId = viaSql.collect().map(r => r.getInt(0) -> r).toMap
      assert(byId(2).getAs[String]("l") == "es")
      assert(byId(3).getAs[String]("s") == "reach me at <EMAIL> or <URL> <NUM>")
      assert(byId(4).getAs[String]("sa") == "Ecole naive u text")
      // the web-curation trio rides the SAME Column composition in SQL
      val web = Seq(
        (1, "<p>keep this.</p><script>drop() { x < 1; }</script>",
          "HTTP://Ex.COM:80/P?utm_a=1&b=2#f",
          "Good line stays here.\nHome | Nav\nCookie notice applies here.")
      ).toDF("id", "html", "url", "lines")
      web.createOrReplaceTempView("gx_web")
      val webSql = s2.sql("""
        SELECT graft_extract_html(html) AS h, graft_canonical_url(url) AS u,
               graft_clean_lines(lines) AS c FROM gx_web""").collect()(0)
      assert(webSql.getString(0) == "keep this.")
      assert(webSql.getString(1) == "http://ex.com/P?b=2")
      assert(webSql.getString(2) == "Good line stays here.")
      // gopher flags as a SQL struct, field access included
      val gq = s2.sql(
        "SELECT graft_gopher(lines).n_words AS n FROM gx_web").collect()(0)
      assert(gq.getLong(0) == 11, gq.toString)
      // signature kernels on the SQL surface: bit-identical to the
      // direct kernels (same Expression classes behind both)
      val sig = s2.sql("""
        SELECT graft_simhash64(text) AS sh,
               graft_ahash64(encode(text, 'UTF-8')) AS ah,
               graft_phash64(encode(text, 'UTF-8')) AS ph,
               graft_audiohash64(encode(text, 'UTF-8')) AS au,
               graft_lcp(text, 'The quick brown dog') AS lcp
        FROM gx_docs WHERE doc_id = 1""").collect()(0)
      val txt = "The quick brown fox, it jumps over the lazy dog in the field."
      val bytes = txt.getBytes("UTF-8")
      assert(sig.getLong(0) == graft.functions.SimHashKernel.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(txt)))
      assert(sig.getLong(1) == graft.multimodal.Multimodal.aHash64(bytes))
      assert(sig.getLong(2) == graft.multimodal.Multimodal.pHash64(bytes))
      assert(sig.getLong(3) == graft.multimodal.Multimodal.audioHash64(bytes))
      assert(sig.getInt(4) == 16, sig.toString) // "The quick brown " shared
      // round-13 kernels: exact grid cosine + audio subfingerprints
      val g2 = s2.sql(
        """SELECT graft_grid_cos(array(3L, 4L), array(6L, 8L)) AS c,
          |       graft_audiosubfp(encode(text, 'UTF-8')) AS fps,
          |       graft_audiosubfp(encode(text, 'UTF-8'), 200, 8, 2) AS fps2
          |FROM gx_docs WHERE doc_id = 1""".stripMargin).collect()(0)
      assert(g2.getDouble(0) == 1.0, g2.toString) // parallel vectors
      // non-audio payload: total, empty fingerprint arrays
      assert(g2.getSeq[Long](1) ==
        graft.multimodal.Multimodal.audioSubFingerprints(bytes).toSeq)
      assert(g2.getSeq[Long](2) ==
        graft.multimodal.Multimodal.audioSubFingerprints(bytes, 200, 8, 2).toSeq)
    } finally {
      SparkSession.setActiveSession(orig)
      SparkSession.setDefaultSession(orig)
    }
  }
}
