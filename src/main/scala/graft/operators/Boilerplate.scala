package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group BOILERPLATE AFFIX removal — the curation step between
  * HTML extraction and dedup: pages of one domain share a rendered
  * header ("ACME Corp | Home | Products >> ") and footer ("© ACME,
  * all rights reserved") that survive text extraction, inflate
  * near-dup similarity, and feed junk tokens to every model
  * downstream. These operators find each group's common prefix/suffix
  * and strip it.
  *
  * Scale shape — the whole point: a group's common prefix equals the
  * common prefix of its lexicographic MIN and MAX (binary string
  * order — any divergence inside the group shows up between min and
  * max first), so detection is ONE `groupBy(min, max, count)` whose
  * partial aggregation keeps a single min/max string per partition
  * per group, a per-group char-LCP via the native
  * [[graft.functions.LcpCharsExpr]] on the two aggregated strings,
  * and a join of one small `(group, int)` row back into the scan
  * (AQE broadcasts it when the group count is small). Never a
  * cross-row comparison, never a per-group sort.
  *
  * Contracts: groups smaller than `minGroup` (default 2) pass
  * through unchanged — the "common prefix" of one document is the
  * whole document. A group of IDENTICAL documents strips to empty
  * strings by the same logic (their common prefix IS the document);
  * run exact dedup first if that is not intended. Null texts stay
  * null and contribute nothing to the group affix (min/max skip
  * nulls).
  */
object Boilerplate {

  private def lcpChars(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftInternals.{toColumn, toExpression}
    toColumn(graft.functions.LcpCharsExpr(toExpression(a), toExpression(b)))
  }

  /** Strip each group's common text PREFIX. Output: input columns with
    * `outCol` = the text minus the group prefix.
    */
  def stripCommonPrefixPerGroup(
      df: DataFrame, groupCol: String, textCol: String,
      outCol: String = "stripped", minGroup: Long = 2): DataFrame = {
    require(minGroup >= 1, s"minGroup must be >= 1, got $minGroup")
    require(!df.columns.contains("__lcp") && !df.columns.contains(outCol),
      s"stripCommonPrefixPerGroup: input must not carry __lcp/$outCol")
    val g = df.groupBy(col(groupCol))
      .agg(min(col(textCol)).as("__mn"), max(col(textCol)).as("__mx"),
        count(col(textCol)).as("__n"))
      .select(col(groupCol),
        when(col("__n") >= minGroup, lcpChars(col("__mn"), col("__mx")))
          .otherwise(lit(0)).as("__lcp"))
    df.join(g, Seq(groupCol))
      .withColumn(outCol,
        col(textCol).substr(col("__lcp") + lit(1), length(col(textCol))))
      .drop("__lcp")
  }

  /** Strip each group's common text SUFFIX — the footer form: the
    * same min/max trick over the REVERSED strings (a common suffix is
    * a common prefix of the reversals; `reverse` is char-wise in
    * Spark and DuckDB alike), stripped by keeping the leading
    * `length − lcs` characters.
    */
  def stripCommonSuffixPerGroup(
      df: DataFrame, groupCol: String, textCol: String,
      outCol: String = "stripped", minGroup: Long = 2): DataFrame = {
    require(minGroup >= 1, s"minGroup must be >= 1, got $minGroup")
    require(!df.columns.contains("__lcs") && !df.columns.contains(outCol),
      s"stripCommonSuffixPerGroup: input must not carry __lcs/$outCol")
    val g = df.groupBy(col(groupCol))
      .agg(min(reverse(col(textCol))).as("__mn"),
        max(reverse(col(textCol))).as("__mx"),
        count(col(textCol)).as("__n"))
      .select(col(groupCol),
        when(col("__n") >= minGroup, lcpChars(col("__mn"), col("__mx")))
          .otherwise(lit(0)).as("__lcs"))
    df.join(g, Seq(groupCol))
      .withColumn(outCol,
        col(textCol).substr(lit(1), length(col(textCol)) - col("__lcs")))
      .drop("__lcs")
  }

  /** Header + footer in one pass over the plan: prefix strip, then
    * suffix strip of the already-stripped text (the composition a web
    * corpus wants — both affixes are per-group constants after
    * extraction).
    */
  def stripCommonAffixesPerGroup(
      df: DataFrame, groupCol: String, textCol: String,
      outCol: String = "stripped", minGroup: Long = 2): DataFrame = {
    val pre = stripCommonPrefixPerGroup(
      df, groupCol, textCol, "__pre_stripped", minGroup)
    stripCommonSuffixPerGroup(pre, groupCol, "__pre_stripped", outCol, minGroup)
      .drop("__pre_stripped")
  }

  /** Per-group affix lengths from a REFERENCE corpus — the model
    * artifact of the streaming form: `(group, prefix_chars,
    * suffix_chars)`, where the suffix is measured on the
    * prefix-stripped text exactly as [[stripCommonAffixesPerGroup]]
    * composes them. One row per group; small enough to stream-static
    * join against a live feed.
    */
  def affixLengthsPerGroup(
      reference: DataFrame, groupCol: String, textCol: String,
      minGroup: Long = 2): DataFrame = {
    require(minGroup >= 1, s"minGroup must be >= 1, got $minGroup")
    val pre = reference.groupBy(col(groupCol))
      .agg(min(col(textCol)).as("__mn"), max(col(textCol)).as("__mx"),
        count(col(textCol)).as("__n"))
      .select(col(groupCol),
        when(col("__n") >= minGroup, lcpChars(col("__mn"), col("__mx")))
          .otherwise(lit(0)).as("prefix_chars"))
    val stripped = reference.join(pre, Seq(groupCol))
      .select(col(groupCol),
        col(textCol).substr(col("prefix_chars") + lit(1),
          length(col(textCol))).as("__t1"))
    val suf = stripped.groupBy(col(groupCol))
      .agg(min(reverse(col("__t1"))).as("__mn"),
        max(reverse(col("__t1"))).as("__mx"),
        count(col("__t1")).as("__n"))
      .select(col(groupCol),
        when(col("__n") >= minGroup, lcpChars(col("__mn"), col("__mx")))
          .otherwise(lit(0)).as("suffix_chars"))
    pre.join(suf, Seq(groupCol))
  }

  /** Apply [[affixLengthsPerGroup]] to a (possibly STREAMING) frame:
    * a stateless stream-static join + two substrings — the ingest-gate
    * form (no aggregation over the stream, no state store; groups
    * unseen in the reference pass through unstripped via the left
    * join's zero default). Batch/stream-unified like the other gates.
    */
  def stripAffixesWith(
      df: DataFrame, groupCol: String, textCol: String,
      affixes: DataFrame, outCol: String = "stripped"): DataFrame = {
    require(!df.columns.exists(
        Seq("prefix_chars", "suffix_chars", outCol).contains),
      s"stripAffixesWith: input must not carry prefix_chars/suffix_chars/$outCol")
    val t1 = col(textCol).substr(
      coalesce(col("prefix_chars"), lit(0)) + lit(1), length(col(textCol)))
    df.join(affixes, Seq(groupCol), "left")
      .withColumn(outCol,
        t1.substr(lit(1), length(t1) - coalesce(col("suffix_chars"), lit(0))))
      .drop("prefix_chars", "suffix_chars")
  }

  /** Per-group boilerplate LINE templates — the LINE-granularity form
    * the char-LCP cannot express: a page header whose FIRST line
    * carries a varying title or date makes the group's char-LCP zero,
    * yet the nav bar and copyright lines below it are byte-identical
    * on every page of the domain. A line is a template line of its
    * group iff it appears in at least `minFracNum/minFracDen` of the
    * group's documents (distinct-document frequency — a page repeating
    * its own nav bar counts once).
    *
    * Output: one row per group, `(group, template_lines:
    * array<string>)`, sorted for determinism — the model artifact of
    * [[stripLinesWith]], small enough to broadcast (a domain has a
    * handful of template lines, not thousands).
    *
    * Scale shape: the line explode ships `(group, id, line)` once; the
    * document-frequency count and the group size count are both
    * partial-aggregable shuffles keyed on `(group, line)` / `group`;
    * the threshold compare is exact integer cross-multiplication (no
    * float ratio); `collect_set` runs over the already-thresholded
    * template rows only. Nothing here is sized by pairs of documents.
    */
  def lineTemplatesPerGroup(
      df: DataFrame, groupCol: String, idCol: String, textCol: String,
      minFracNum: Int = 1, minFracDen: Int = 2,
      minGroup: Long = 2): DataFrame = {
    require(minFracNum >= 1 && minFracDen >= 1 && minFracNum <= minFracDen,
      s"lineTemplatesPerGroup: need 0 < minFracNum/minFracDen <= 1, " +
        s"got $minFracNum/$minFracDen")
    require(minGroup >= 1, s"minGroup must be >= 1, got $minGroup")
    val lines = df
      .select(col(groupCol), col(idCol).as("__id"),
        explode(split(col(textCol), "\n", -1)).as("__line"))
    val groupSizes = df.groupBy(col(groupCol))
      .agg(countDistinct(col(idCol)).as("__ndocs"))
    lines
      .groupBy(col(groupCol), col("__line"))
      .agg(countDistinct(col("__id")).as("__nd"))
      .join(groupSizes, Seq(groupCol))
      .filter(col("__ndocs") >= minGroup &&
        col("__nd") * lit(minFracDen.toLong) >= col("__ndocs") * lit(minFracNum.toLong))
      .groupBy(col(groupCol))
      .agg(array_sort(collect_set(col("__line"))).as("template_lines"))
  }

  /** Strip template lines from a (possibly STREAMING) frame given a
    * trained [[lineTemplatesPerGroup]] artifact: a stream-static left
    * join of the one-row-per-group template array, then a PER-ROW
    * higher-order filter (`filter` + `array_contains` + `array_join`)
    * — no line explode, no rebuild aggregation, no state store. The
    * application side is zero-shuffle beyond the broadcastable join;
    * every occurrence of a template line strips, wherever it sits in
    * the page. Groups absent from the template table pass through
    * unchanged; null texts stay null.
    */
  def stripLinesWith(
      df: DataFrame, groupCol: String, textCol: String,
      templates: DataFrame, outCol: String = "stripped"): DataFrame = {
    require(!df.columns.exists(Seq("template_lines", outCol).contains),
      s"stripLinesWith: input must not carry template_lines/$outCol")
    df.join(templates, Seq(groupCol), "left")
      .withColumn(outCol,
        array_join(
          filter(split(col(textCol), "\n", -1),
            l => !array_contains(
              coalesce(col("template_lines"), array()), l)),
          "\n"))
      .drop("template_lines")
  }

  /** Detect-and-strip in one call — train [[lineTemplatesPerGroup]] on
    * the input itself and apply it with [[stripLinesWith]] (the batch
    * curation form; the streaming gate trains on a reference corpus
    * and applies the artifact to the feed).
    */
  def stripTemplateLinesPerGroup(
      df: DataFrame, groupCol: String, idCol: String, textCol: String,
      outCol: String = "stripped",
      minFracNum: Int = 1, minFracDen: Int = 2,
      minGroup: Long = 2): DataFrame =
    stripLinesWith(df, groupCol, textCol,
      lineTemplatesPerGroup(df, groupCol, idCol, textCol,
        minFracNum, minFracDen, minGroup),
      outCol)
}
