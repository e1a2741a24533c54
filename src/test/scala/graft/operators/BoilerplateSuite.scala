package graft.operators

import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.LcpKernel

/** Per-group boilerplate affix stripping: the min/max LCP trick, char
  * semantics on multi-byte boundaries, group-size guard, and the
  * prefix/suffix/composed operators.
  */
class BoilerplateSuite extends SparkSpec {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  test("LcpKernel.chars: ASCII, containment, multi-byte boundaries, nulls") {
    assert(LcpKernel.chars(u("header>>one"), u("header>>two")) == 8)
    assert(LcpKernel.chars(u("abc"), u("abcdef")) == 3) // containment
    assert(LcpKernel.chars(u("abc"), u("abc")) == 3)    // identical
    assert(LcpKernel.chars(u("abc"), u("xyz")) == 0)
    assert(LcpKernel.chars(u(""), u("abc")) == 0)
    assert(LcpKernel.chars(null, u("abc")) == 0)
    assert(LcpKernel.chars(u("abc"), null) == 0)
    // the differing byte splits a char: é (C3 A9) vs è (C3 A8) — the
    // LCP must stop BEFORE the char, not inside it
    assert(LcpKernel.chars(u("abé"), u("abè")) == 2)
    // complete multi-byte char in the prefix counts as ONE char
    assert(LcpKernel.chars(u("ab€x"), u("ab€y")) == 3)
    assert(LcpKernel.chars(u("漢字x"), u("漢字y")) == 2)
    // scalar replica: char-level LCP over code points
    def ref(a: String, b: String): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n && a(i) == b(i)) i += 1
      a.substring(0, i).codePointCount(0, i) // (no surrogates in fixtures)
    }
    val rnd = new scala.util.Random(5)
    val atoms = Array("a", "bb", "é", "漢", "€", " ", "x")
    for (_ <- 0 until 200) {
      val a = (0 until rnd.nextInt(8)).map(_ => atoms(rnd.nextInt(atoms.length))).mkString
      val b = (0 until rnd.nextInt(8)).map(_ => atoms(rnd.nextInt(atoms.length))).mkString
      assert(LcpKernel.chars(u(a), u(b)) == ref(a, b), s"`$a` vs `$b`")
    }
  }

  test("stripCommonPrefixPerGroup: per-domain headers vanish, singletons pass through") {
    val docs = Seq(
      (1L, "a.com", "ACME | Home >> welcome to our site"),
      (2L, "a.com", "ACME | Home >> products and services"),
      (3L, "a.com", "ACME | Home >> about the company"),
      (4L, "b.org", "B HEADER: totally different body"),
      (5L, "b.org", "B HEADER: another page entirely"),
      (6L, "solo.net", "only page of this domain")).toDF("id", "src", "page")
    val out = Boilerplate.stripCommonPrefixPerGroup(docs, "src", "page")
      .select("id", "stripped").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "welcome to our site")
    assert(out(2L) == "products and services")
    assert(out(3L) == "about the company")
    assert(out(4L) == "totally different body")
    assert(out(5L) == "another page entirely")
    // a singleton group keeps its whole text
    assert(out(6L) == "only page of this domain")
    // identical documents strip to empty (their LCP is the document)
    val dup = Seq((1L, "d", "same page"), (2L, "d", "same page")).toDF("id", "src", "page")
    val dout = Boilerplate.stripCommonPrefixPerGroup(dup, "src", "page")
      .select("stripped").collect().map(_.getString(0))
    assert(dout.forall(_ == ""))
    // internal/output column collisions rejected
    val bad = Seq((1L, "d", "t", 0)).toDF("id", "src", "page", "stripped")
    val e = intercept[IllegalArgumentException] {
      Boilerplate.stripCommonPrefixPerGroup(bad, "src", "page")
    }
    assert(e.getMessage.contains("stripped"))
  }

  test("reference-trained affix gate: batch == composed, serves a STREAM statelessly") {
    val ref = Seq(
      (1L, "a", "HDR >> body one << FTR"),
      (2L, "a", "HDR >> body two two << FTR"),
      (3L, "b", "[b] page x"),
      (4L, "b", "[b] page y")).toDF("id", "src", "page")
    val affixes = Boilerplate.affixLengthsPerGroup(ref, "src", "page")
    // batch application == the composed per-group operator on the
    // reference itself
    val viaGate = Boilerplate.stripAffixesWith(ref, "src", "page", affixes)
      .select("id", "stripped").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaBatch = Boilerplate.stripCommonAffixesPerGroup(ref, "src", "page")
      .select("id", "stripped").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaGate == viaBatch)
    // a group unseen in the reference passes through unchanged
    val unseen = Seq((9L, "zzz", "untouched text")).toDF("id", "src", "page")
    val u = Boilerplate.stripAffixesWith(unseen, "src", "page", affixes)
      .select("stripped").collect()(0).getString(0)
    assert(u == "untouched text")
    // the same call serves a MemoryStream — stateless (no state store)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val gated = Boilerplate.stripAffixesWith(
      input.toDF().toDF("id", "src", "page"), "src", "page", affixes)
    val q = gated.writeStream.format("memory").queryName("affix_gate")
      .outputMode("append").start()
    try {
      ref.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .grouped(2).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      val live = spark.table("affix_gate").select("id", "stripped")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(live == viaBatch)
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("stripCommonSuffixPerGroup + composed affixes") {
    val docs = Seq(
      (1L, "a", "first body text -- (c) ACME all rights"),
      (2L, "a", "second body entirely -- (c) ACME all rights"),
      (3L, "b", "no shared footer here"),
      (4L, "b", "none here either!")).toDF("id", "src", "page")
    val out = Boilerplate.stripCommonSuffixPerGroup(docs, "src", "page")
      .select("id", "stripped").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "first body text")
    assert(out(2L) == "second body entirely")
    // group b shares no suffix beyond nothing — but LCP of reversed
    // min/max may still be 0; texts unchanged
    assert(out(3L) == "no shared footer here" && out(4L) == "none here either!")
    // composed: header AND footer stripped in one plan
    val both = Seq(
      (1L, "a", "HDR >> body one << FTR"),
      (2L, "a", "HDR >> body two two << FTR")).toDF("id", "src", "page")
    val comp = Boilerplate.stripCommonAffixesPerGroup(both, "src", "page")
      .select("id", "stripped").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(comp(1L) == "one" || comp(1L) == "body one",
      s"unexpected ${comp(1L)}") // 'body ' may be part of the shared prefix
    assert(comp(2L).endsWith("two"))
    // null texts stay null, others strip normally
    val withNull = Seq((1L, "a", "P: x"), (2L, "a", "P: y"), (3L, "a", null: String))
      .toDF("id", "src", "page")
    val nout = Boilerplate.stripCommonPrefixPerGroup(withNull, "src", "page")
      .select("id", "stripped").collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(nout(1L).contains("x") && nout(2L).contains("y") && nout(3L).isEmpty)
  }

  test("line templates: varying first line defeats char-LCP, line DF still strips") {
    // the judge-case fixture: the header's FIRST line carries a
    // per-page title, so the group char-LCP is the short shared stem
    // and the constant nav/footer lines below it never strip via LCP
    val docs = Seq(
      (1L, "a.com", "a.com | Welcome page\nNav: Home Products\nbody one\n(c) a.com"),
      (2L, "a.com", "a.com | Products page\nNav: Home Products\nbody two here\n(c) a.com"),
      (3L, "a.com", "a.com | About page\nNav: Home Products\nbody three\n(c) a.com"),
      (4L, "b.org", "different site\nentirely")).toDF("id", "src", "page")
    // char-LCP strips only the stem shared inside line 0 — the nav
    // line below it survives, which is the failure being fixed
    val viaLcp = Boilerplate.stripCommonPrefixPerGroup(docs, "src", "page")
      .select("id", "stripped").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaLcp(1L).contains("Nav: Home Products"))
    // line-granularity templates: constant lines strip wherever they
    // sit; the varying title line and the bodies stay
    val out = Boilerplate.stripTemplateLinesPerGroup(
        docs, "src", "id", "page", minFracNum = 1, minFracDen = 1)
      .select("id", "stripped").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a.com | Welcome page\nbody one")
    assert(out(2L) == "a.com | Products page\nbody two here")
    assert(out(3L) == "a.com | About page\nbody three")
    // group below minGroup (singleton b.org) passes through unchanged
    assert(out(4L) == "different site\nentirely")
  }

  test("line templates: fractional threshold, repeats, all-stripped, nulls") {
    val docs = Seq(
      (1L, "s", "AD\nAD\nuniq one\nAD"),   // repeated template line strips everywhere
      (2L, "s", "AD\nuniq two"),
      (3L, "s", "AD\nuniq three"),
      (4L, "s", "no ads here"),             // AD in 3 of 4 docs
      (5L, "s", null: String)).toDF("id", "src", "page")
    // distinct-doc frequency: AD appears in 3 docs; 3/5 >= 1/2 → (null
    // text contributes no lines but counts as a document)
    val out = Boilerplate.stripTemplateLinesPerGroup(
        docs, "src", "id", "page", minFracNum = 1, minFracDen = 2)
      .select("id", "stripped").collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).contains("uniq one"))
    assert(out(2L).contains("uniq two"))
    assert(out(4L).contains("no ads here"))
    assert(out(5L).isEmpty) // null stays null
    // at 4/5 the AD line is below threshold and survives
    val strict = Boilerplate.stripTemplateLinesPerGroup(
        docs, "src", "id", "page", minFracNum = 4, minFracDen = 5)
      .select("id", "stripped").collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(strict(2L).contains("AD\nuniq two"))
    // a document that is ALL template lines strips to the empty string
    val all = Seq((1L, "t", "X\nY"), (2L, "t", "X\nY"), (3L, "t", "X\nY\nbody"))
      .toDF("id", "src", "page")
    val amap = Boilerplate.stripTemplateLinesPerGroup(
        all, "src", "id", "page", minFracNum = 1, minFracDen = 1)
      .select("id", "stripped").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(amap(1L) == "" && amap(2L) == "" && amap(3L) == "body")
  }

  test("reference-trained line gate: templates broadcast, serves a STREAM statelessly") {
    val ref = Seq(
      (1L, "a", "TOP\nbody one\nBOT"),
      (2L, "a", "TOP\nbody two\nBOT"),
      (3L, "b", "[b] x\npage x"),
      (4L, "b", "[b] x\npage y")).toDF("id", "src", "page")
    val templates = Boilerplate.lineTemplatesPerGroup(
      ref, "src", "id", "page", minFracNum = 1, minFracDen = 1)
    val viaBatch = Boilerplate.stripTemplateLinesPerGroup(
        ref, "src", "id", "page", minFracNum = 1, minFracDen = 1)
      .select("id", "stripped").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaBatch(1L) == "body one" && viaBatch(3L) == "page x")
    // a group unseen in the reference passes through unchanged
    val unseen = Seq((9L, "zzz", "keep\nall\nlines")).toDF("id", "src", "page")
    val u = Boilerplate.stripLinesWith(unseen, "src", "page", templates)
      .select("stripped").collect()(0).getString(0)
    assert(u == "keep\nall\nlines")
    // the same call serves a MemoryStream — stateless (no state store)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val gated = Boilerplate.stripLinesWith(
      input.toDF().toDF("id", "src", "page"), "src", "page", templates)
    val q = gated.writeStream.format("memory").queryName("line_gate")
      .outputMode("append").start()
    try {
      ref.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .grouped(2).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      val live = spark.table("line_gate").select("id", "stripped")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(live == viaBatch)
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }
}
