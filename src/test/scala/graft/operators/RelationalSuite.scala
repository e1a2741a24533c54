package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Top-k per group (incl. the rank-limit pushdown plan shape) and the
  * salted skew join (equivalence with the plain equi-join).
  */
class RelationalSuite extends SparkSpec {
  import spark.implicits._

  test("topKPerGroup keeps exactly k rows per group in order") {
    val df = Seq(
      ("a", 3), ("a", 1), ("a", 2), ("a", 9),
      ("b", 5), ("b", 6)).toDF("g", "v")
    val out = Relational.topKPerGroup(df,
      Seq(col("g")), Seq(col("v").desc), k = 2)
    assert(rowSet(out) == Set(
      Seq("a", "9", "1"), Seq("a", "3", "2"),
      Seq("b", "6", "1"), Seq("b", "5", "2")))
  }

  test("topKPerGroup plans with rank-limit pushdown (WindowGroupLimit)") {
    val df = (0 until 1000).map(i => (i % 7, i)).toDF("g", "v")
    val out = Relational.topKPerGroup(df, Seq(col("g")), Seq(col("v").desc), k = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(500))
  }

  test("saltedEquiJoin == plain equi-join (skewed key)") {
    // one hot key (90% of probe rows) + uniform rest
    val rnd = new scala.util.Random(5)
    val probe = (0 until 500)
      .map(i => (if (rnd.nextDouble() < 0.9) 1 else rnd.nextInt(20), i))
      .toDF("k", "pv")
    val build = (0 until 20).map(k => (k, s"dim$k")).toDF("bk", "bv")
    val plain = probe.join(build, probe("k") === build("bk")).select("k", "pv", "bk", "bv")
    val salted = Relational.saltedEquiJoin(probe, build, "k", "bk", salt = 8)
      .select("k", "pv", "bk", "bv")
    assertSameRows(salted, plain)
  }

  test("saltedEquiJoin spreads FULLY IDENTICAL hot-key probe rows across all slots") {
    // the pathological case a content-hash salt gets wrong: every probe
    // row is byte-identical, so hash(row) puts all of them in ONE slot
    // and the straggler survives. The round-robin counter must hit
    // min(salt, N) distinct slots even then.
    val salt = 8
    val n = 100
    // one map partition: the counter is per-partition, and the scenario
    // being modeled is a hot key with MANY rows per partition (a 3-row
    // local partition can only ever reach 3 slots)
    val probe = Seq.fill(n)((1, "same-payload")).toDF("k", "pv").coalesce(1)
    val slots = Relational.saltedProbe(probe, salt)
      .agg(countDistinct(col("__graft_salt"))).collect()(0).getLong(0)
    assert(slots == math.min(salt, n).toLong,
      s"identical rows clumped into $slots of $salt slots")
    // and the join output is still exactly the plain equi-join
    val build = Seq((1, "dim1"), (2, "dim2")).toDF("bk", "bv")
    val plain = probe.join(build, probe("k") === build("bk")).select("k", "pv", "bk", "bv")
    val salted = Relational.saltedEquiJoin(probe, build, "k", "bk", salt)
      .select("k", "pv", "bk", "bv")
    assertSameRows(salted, plain)
  }

  test("cross-corpus ngram jaccard join pairs only across the two inputs") {
    val incoming = Seq(
      (1, "the quick brown fox jumps over the lazy dog"),
      (2, "totally unrelated fresh content here now")).toDF("doc_id", "text")
    val corpus = Seq(
      (10, "the quick brown fox jumps over the lazy cat"),
      (11, "the quick brown fox jumps over the lazy dog"),
      (12, "other corpus text entirely different")).toDF("doc_id", "text")
    val out = Dedup.ngramJaccardJoin(incoming, "doc_id", "text",
      corpus, "doc_id", "text", n = 3, threshold = 0.5)
    val pairs = out.select("id_left", "id_right").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(pairs == Set((1, 10), (1, 11)))
    val exactDup = out.filter($"id_right" === 11).collect()(0)
    assert(exactDup.getAs[Double]("jaccard") == 1.0)
  }

  test("corpusReport: exact hand-computed card; dup fingerprints collapse") {
    val docs = Seq(
      (1L, "web", "en", "hello world"),        // 2 tokens, 11 chars
      (2L, "web", "de", "  Hello   World  "),  // normalizes to doc 1's text
      (3L, "books", "en", "one two three"),    // 3 tokens, 13 chars
      (4L, "books", "en", "")).toDF("id", "source", "lang", "text")
    val got = Relational.corpusReport(docs, "text", "source", "lang")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "n_docs" -> 4L,
      "n_sources" -> 2L,
      "n_langs" -> 2L,
      "total_chars" -> (11L + 17L + 13L + 0L),
      "total_tokens" -> (2L + 2L + 3L + 0L),
      "max_doc_chars" -> 17L,
      "min_doc_chars" -> 0L,
      // docs 1 and 2 share a normalized fingerprint: 3 distinct texts
      "n_distinct_texts" -> 3L))
  }
}
