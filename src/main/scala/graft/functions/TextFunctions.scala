package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar kernels for large-scale training-data pipelines:
  * tokenization, shingling, quality scoring, language-ID heuristics,
  * token-count estimation, and document fingerprinting. All are built
  * from codegen'd `org.apache.spark.sql.functions` (no UDFs), so they
  * inline into WholeStageCodegen and push down through Catalyst.
  *
  * These go beyond the reference's surface (it has no scalar-function
  * layer — SURVEY.md §2.4) and feed the dedup/similarity operators.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text, empty tokens removed. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= lit(""))

  /** The ONE JVM-side tokenizer behind every imperative kernel
    * ([[shingles]], `Dedup.maskRepeatedWindows`'s window spans) that
    * must agree positionally with the column-expression [[tokens]].
    * Kept here so a change to tokenization cannot desynchronize the
    * kernels from the expression; TextFunctionsSuite pins their
    * agreement on whitespace edge cases.
    *
    * Tokens are maximal runs of non-`\s` characters, NOTHING more: no
    * `String.trim` — its `<= U+0020` edge strip would detach leading
    * C0 controls (0x01–0x08, 0x0E–0x1F) from the first/last token
    * where the column path (whose SQL `trim` only strips spaces, in
    * Spark and in the DuckDB oracles alike) keeps them attached.
    */
  private[graft] val tokenize: String => Array[String] = { text =>
    if (text == null) Array.empty[String]
    else text.split("\\s+").filter(_.nonEmpty)
  }

  /** Word n-gram shingles (space-joined), distinct, first-occurrence
    * order. The unit of all Jaccard-based dedup (Dedup.ngramJaccard /
    * minhashLsh).
    *
    * Three implementations were measured (per the build spec's
    * preference order): the composed-built-ins expression tree
    * (`transform(sequence, slice, concat_ws)`) is interpreted —
    * higher-order functions have no codegen — and costs ~0.7 ms/doc;
    * a Scala UDF is ~100× faster but still decodes the document to
    * `String`, regex-splits, and re-encodes every output shingle; the
    * native [[ShinglesExpr]] slices token byte ranges straight out of
    * the Tungsten `UTF8String` with no decode/regex/re-encode and its
    * generated code is one static call inside the WholeStageCodegen
    * span (speedup measured in PLANS.md round 7; semantics pinned to
    * [[distinctShingles]] by a differential spec).
    */
  def shingles(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftInternals
    GraftInternals.toColumn(ShinglesExpr(GraftInternals.toExpression(text), n))
  }

  /** The JVM kernel behind [[shingles]] — exposed (package-private) so
    * fused kernels (e.g. Decontaminate's bloom probe) share the ONE
    * shingle definition instead of re-implementing tokenize+join.
    */
  private[graft] def distinctShingles(text: String, n: Int): Array[String] = {
    val toks = tokenize(text)
    if (toks.length < n) Array.empty[String]
    else {
      val seen = new java.util.LinkedHashSet[String]()
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      seen.toArray(new Array[String](seen.size))
    }
  }


  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A document's complete inverted-index posting rows
    * `array<struct<term, tf[, positions]>>` in one row-local pass —
    * the native replacement for `posexplode(tokens) -> groupBy(term,
    * doc).agg(count, sort_array(collect_list(pos)))` in the index
    * builds (see [[TermPostingsKernel]] for the shuffle this removes
    * and the bit-compat argument).
    */
  def termPostings(text: Column, withPositions: Boolean): Column = {
    import org.apache.spark.sql.GraftInternals
    GraftInternals.toColumn(
      TermPostingsExpr(GraftInternals.toExpression(text), withPositions))
  }

  /** BPE-ish subword token estimate: word pieces of <=4 chars plus
    * punctuation marks counted separately — a deterministic, cheap stand-in
    * for a real tokenizer's token count (useful for budget accounting on
    * 100 TB corpora where running the real tokenizer twice is wasteful).
    */
  def tokenEstimate(text: Column): Column =
    (ceil(length(trim(text)).cast("double") / lit(4.0)) +
      length(regexp_replace(text, "[^.,!?;:]", ""))).cast("long")

  /** Mean token length (0.0 for empty docs). */
  def avgTokenLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0)).otherwise(
      aggregate(t, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(t))
  }

  /** Punctuation-to-character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[^.,!?;:]", "")).cast("double") / length(text))

  /** PII scrub for corpus curation: email addresses → `<EMAIL>`,
    * URLs → `<URL>`, digit runs of 7+ (phone/account shapes) → `<NUM>`.
    * URLs scrub FIRST so an address embedded in one is swallowed whole;
    * the replacement tokens contain no digits, so the number pass can
    * never re-match inside them. Three codegen'd `regexp_replace`
    * passes over the scan projection — no UDF, no shuffle — with
    * patterns kept to the RE2-portable subset so external engines (and
    * the DuckDB gate) reproduce the bytes exactly.
    */
  def scrubPii(text: Column): Column = {
    val noUrl = regexp_replace(text, "https?://\\S+", "<URL>")
    val noEmail = regexp_replace(noUrl,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(noEmail, "[0-9]{7,}", "<NUM>")
  }

  /** The confusable-codepoint table of [[foldConfusables]]: Cyrillic
    * and Greek homoglyphs of Latin letters, typographic
    * quotes/dashes, and NBSP map to their ASCII lookalikes; the
    * zero-width tail (ZWSP/ZWNJ/ZWJ/BOM/soft hyphen) has no
    * counterpart in `to` and is DELETED (the PostgreSQL `translate`
    * rule, identical in Spark and DuckDB). Exposed so the SQL oracle
    * interpolates the very same literals.
    */
  val confusablesFrom: String =
    // Cyrillic lower (a e o p c y x i) + upper (A B E K M H O P C T X),
    // Greek (o A B E Z H I K M N O P T Y X), typographic punctuation +
    // NBSP, then the DELETED zero-width tail (ZWSP ZWNJ ZWJ BOM SHY)
    "\u0430\u0435\u043e\u0440\u0441\u0443\u0445\u0456\u0410\u0412\u0415\u041a\u041c\u041d\u041e\u0420\u0421\u0422\u0425\u03bf\u0391\u0392\u0395\u0396\u0397\u0399\u039a\u039c\u039d\u039f\u03a1\u03a4\u03a5\u03a7\u2018\u2019\u201c\u201d\u2013\u2014\u2212\u00a0\u200b\u200c\u200d\ufeff\u00ad"

  val confusablesTo: String =
    "aeopcyxiABEKMHOPCTXoABEZHIKMNOPTYX''\"\"--- "

  /** HOMOGLYPH folding — the adversarial-dedup normalizer: a spammer
    * swapping Latin 'o' for Cyrillic 'о' defeats every exact and
    * shingle fingerprint while rendering identically; folding the
    * confusable codepoints back to ASCII BEFORE fingerprinting makes
    * the spoofed copy collide again. One codegen `translate`
    * (codepoint-wise 1:1 map; unmatched zero-width characters are
    * deleted) — no regex, no UDF, engine-identical semantics.
    */
  def foldConfusables(text: Column): Column =
    translate(text, confusablesFrom, confusablesTo)

  /** The GOVERNANCE view of [[scrubPii]]: how many URL / email /
    * long-number spans the scrub redacts per document, as a
    * `struct<n_urls, n_emails, n_nums>` of longs. Counts follow the
    * scrubber's exact cascade (emails counted on the URL-scrubbed
    * text, numbers on both), so report and scrubbed output are
    * mutually consistent — applying [[scrubPii]] removes precisely
    * the counted spans, and `n_urls + n_emails + n_nums = 0` iff the
    * text passes untouched. Same RE2-portable patterns, codegen'd
    * `regexp_count`/`regexp_replace` in the scan projection.
    */
  def scrubReport(text: Column): Column = {
    val urlPat = "https?://\\S+"
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val numPat = "[0-9]{7,}"
    val noUrl = regexp_replace(text, urlPat, "<URL>")
    val noEmail = regexp_replace(noUrl, emailPat, "<EMAIL>")
    struct(
      regexp_count(text, lit(urlPat)).cast("long").as("n_urls"),
      regexp_count(noUrl, lit(emailPat)).cast("long").as("n_emails"),
      regexp_count(noEmail, lit(numPat)).cast("long").as("n_nums"))
  }

  /** Compression-ratio repetitiveness signal
    * ([[CompressionKernel.ratio]]): deflated-size / raw-size on the
    * 1e-4 grid. Low = diffusely redundant (templated/looped pages);
    * prose sits ~0.4-0.7. Suite-covered ordering signal, not
    * SQL-oracle-replayable (no portable deflate) — treat thresholds
    * as tunables.
    */
  def compressionRatio(text: Column): Column = {
    import org.apache.spark.sql.GraftInternals
    GraftInternals.toColumn(
      graft.functions.CompressionRatioExpr(GraftInternals.toExpression(text)))
  }

  /** HTML → text extraction for web-scrape curation (the step before
    * every quality/dedup signal on a CommonCrawl-shaped corpus):
    * drops `<script>`/`<style>` payloads whole, then comments, then
    * every remaining tag (each → one space so adjacent block texts
    * don't fuse into a single word), decodes the six ubiquitous named
    * entities (`&amp;` LAST, so `&amp;lt;` round-trips to the literal
    * `&lt;` the author wrote instead of double-decoding to `<`), and
    * collapses whitespace runs. Eight codegen'd `regexp_replace`
    * passes on the scan projection — no UDF, no shuffle. Patterns stay
    * inside the RE2-portable subset (no backreferences — script and
    * style get separate passes; explicit `[ \t\r\n\f]` classes, since
    * Java's `\s` and RE2's disagree on VT) so external engines and the
    * DuckDB gate reproduce the bytes exactly. Numeric character
    * references are out of scope for the regex subset (a general
    * `&#NNN;` decode needs arithmetic) — a corpus needing them adds a
    * native expression pass downstream.
    */
  def extractHtml(text: Column): Column = {
    val noScript = regexp_replace(text,
      "(?is)<script\\b[^>]*>.*?</script[ \\t\\r\\n\\f]*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style[ \\t\\r\\n\\f]*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val e1 = regexp_replace(noTags, "(?i)&nbsp;", " ")
    val e2 = regexp_replace(e1, "(?i)&lt;", "<")
    val e3 = regexp_replace(e2, "(?i)&gt;", ">")
    val e4 = regexp_replace(e3, "(?i)&quot;", "\"")
    val e5 = regexp_replace(e4, "(?i)(&apos;|&#39;)", "'")
    val e6 = regexp_replace(e5, "(?i)&amp;", "&")
    trim(regexp_replace(e6, "[ \\t\\r\\n\\f]+", " "))
  }

  /** Gopher-style rule-based quality flags (Rae et al. 2021 §A1.1, the
    * repetition signals living separately in [[dupLineRatio]] /
    * [[topTokenRatio]]): named boolean signals plus the conjunction,
    * so a pipeline can FILTER on `pass` and AUDIT on the per-rule
    * columns (which rule kills a doc matters operationally). Every
    * ratio compares EXACT INTEGER counts by cross-multiplication
    * (`10·symbols < words`, never `symbols/words < 0.1`) — no doubles,
    * no rounding drift between engines. `alpha` counts `[A-Za-z]`
    * explicitly (documented ASCII choice, engine-portable where
    * unicode letter classes are not); the stopword rule wants ≥ 2
    * DISTINCT hits from the classic 8-word list.
    *
    * Returns a struct
    * `(n_words, word_count_ok, word_len_ok, symbol_ok, alpha_ok,
    * stopword_ok, pass)`; bounds are parameters with Gopher's
    * defaults. One scan projection.
    */
  def gopherFlags(text: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      stopwords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with")): Column = {
    require(stopwords.nonEmpty, "gopherFlags: empty stopword list")
    val toks = tokens(text)
    val nWords = size(toks).cast("long")
    // character (not byte) length of the concatenated words
    val nChars = length(regexp_replace(trim(text), "\\s+", "")).cast("long")
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val ellipses =
      (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val nSym = (hashes + ellipses).cast("long")
    val nAlpha = size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("long")
    val tl = transform(toks, w => lower(w))
    val stopHits = stopwords
      .map(sw => when(array_contains(tl, sw), 1).otherwise(0))
      .reduce(_ + _)
    val wordCountOk = nWords >= minWords && nWords <= maxWords
    val wordLenOk = lit(3L) * nWords <= nChars && nChars <= lit(10L) * nWords
    val symbolOk = lit(10L) * nSym < nWords
    val alphaOk = lit(5L) * nAlpha > lit(4L) * nWords
    val stopwordOk = stopHits >= 2
    struct(
      nWords.as("n_words"),
      wordCountOk.as("word_count_ok"),
      wordLenOk.as("word_len_ok"),
      symbolOk.as("symbol_ok"),
      alphaOk.as("alpha_ok"),
      stopwordOk.as("stopword_ok"),
      (wordCountOk && wordLenOk && symbolOk && alphaOk && stopwordOk).as("pass"))
  }

  /** URL canonicalization — the exact-dedup KEY for web corpora (the
    * same page arrives under `HTTP://Host:80/x?utm_source=…#frag` and
    * `http://host/x`; crawl dedup keys on the canonical form):
    * scheme and host lowercase (they are case-insensitive; the path is
    * NOT and stays untouched), default ports dropped (`:80` for http,
    * `:443` for https), the fragment dropped (never sent to the
    * server), `utm_*` tracking parameters dropped (leading or not,
    * remaining params keep their order — canonicalization must not
    * reorder, `?b=2&a=1` and `?a=1&b=2` are different resources to a
    * strict server), and a bare `/` path dropped. A string without a
    * `scheme://` prefix passes through trimmed — fail-open, the
    * caller's corpus may mix keys. Pure `regexp_extract`/`replace`
    * composition in the scan projection (RE2-portable patterns);
    * compose with [[graft.operators.Dedup.exactBy]] for crawl dedup.
    */
  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = lower(regexp_extract(u, "^[^:/?#]+://([^/?#]*)", 1))
    val hostNoPort =
      when(scheme === "http", regexp_replace(host, ":80$", ""))
        .when(scheme === "https", regexp_replace(host, ":443$", ""))
        .otherwise(host)
    val rest = regexp_extract(u, "^[^:/?#]+://[^/?#]*(.*)$", 1)
    // fragment, then non-leading utm_*, then leading-utm-with-successor
    // (promotes the next param to leading), then lone leading utm,
    // then a bare "/" path
    val r1 = regexp_replace(rest, "#.*$", "")
    val r2 = regexp_replace(r1, "&utm_[^&]*", "")
    val r3 = regexp_replace(r2, "\\?utm_[^&]*&", "?")
    val r4 = regexp_replace(r3, "\\?utm_[^&]*$", "")
    val r5 = regexp_replace(r4, "^/$", "")
    when(scheme === "", u)
      .otherwise(concat(scheme, lit("://"), hostNoPort, r5))
  }

  /** Non-empty trimmed lines of the document — the unit of the
    * C4-family repetition signals and of [[graft.operators.Dedup.lineDedup]].
    */
  def lines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)

  /** C4-style LINE-level cleaning (Raffel et al. 2020 §2.2 — the
    * filter that turned CommonCrawl into C4, applied line-wise where
    * the document filters are doc-wise): keep only lines that (a) have
    * at least `minWords` whitespace words, (b) end in terminal
    * punctuation (`.`/`!`/`?`/`"` — navigation and boilerplate lines
    * don't), and (c) don't carry boilerplate markers (`javascript`,
    * `cookie`, `privacy policy`, `terms of use`, case-insensitive —
    * the classic C4 list minus the lorem-ipsum doc-level rule).
    * Returns the surviving lines rejoined with `\n` (empty string when
    * nothing survives — compose with a doc-level min-length gate).
    * Pure array projection in the scan: split → filter lambdas →
    * join, no UDF, no shuffle.
    */
  def cleanLines(text: Column, minWords: Int = 3): Column = {
    val kept = filter(transform(split(text, "\n"), l => trim(l)), l =>
      size(filter(split(l, "[ \\t]+"), w => length(w) > 0)) >= minWords &&
        l.rlike("[.!?\"]$") &&
        !lower(l).rlike("javascript|cookie|privacy policy|terms of use"))
    array_join(kept, "\n")
  }

  /** Fraction of lines that repeat an earlier line of the SAME document
    * (`1 − distinct/total`; 0.0 for line-less docs) — the Gopher-style
    * intra-document repetition gate: templated or scraper-looped pages
    * score high and get filtered before any expensive dedup join runs.
    */
  def dupLineRatio(text: Column): Column = {
    val ls = lines(text)
    when(size(ls) > 0,
      lit(1.0) - size(array_distinct(ls)).cast("double") / size(ls).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Frequency share of the single most repeated token (0.0 for empty
    * docs) — the top-n-gram repetition gate at n = 1. Evaluated per row
    * over the token array (O(distinct × tokens) interpreted, fine at
    * document granularity); the whole signal stays inside the scan
    * projection — no shuffle, no grouping.
    */
  def topTokenRatio(text: Column): Column = {
    val t = tokens(text)
    val top = aggregate(array_distinct(t), lit(0),
      (acc, w) => greatest(acc, size(filter(t, x => x === w))))
    when(size(t) > 0, top.cast("double") / size(t).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Raw kernels mirroring [[dupLineRatio]] / [[topTokenRatio]] for the
    * SQL surface (GraftExtensions registers them as ScalaUDFs — the
    * higher-order-function Column trees don't survive the conversion to
    * a standalone Catalyst expression). Agreement with the Column
    * forms is suite-asserted.
    */
  private[graft] val dupLineRatioFn: String => java.lang.Double = { text =>
    if (text == null) java.lang.Double.valueOf(0.0)
    else {
      val ls = text.split("\n", -1).map(_.trim).filter(_.nonEmpty)
      if (ls.length == 0) java.lang.Double.valueOf(0.0)
      else java.lang.Double.valueOf(1.0 - ls.distinct.length.toDouble / ls.length)
    }
  }

  private[graft] val topTokenRatioFn: String => java.lang.Double = { text =>
    if (text == null) java.lang.Double.valueOf(0.0)
    else {
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) java.lang.Double.valueOf(0.0)
      else {
        var top = 0
        toks.groupBy(identity).foreach { case (_, g) => if (g.length > top) top = g.length }
        java.lang.Double.valueOf(top.toDouble / toks.length)
      }
    }
  }

  /** Fraction of tokens found in `stopwords`. A standard fluency signal:
    * natural text has a stable stopword ratio; keyword-stuffed or
    * boilerplate text does not.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    val stops = array(stopwords.map(lit): _*)
    when(size(t) === 0, lit(0.0)).otherwise(
      size(filter(t, w => array_contains(stops, lower(w)))).cast("double") / size(t))
  }

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on", "with", "as")

  private val EnglishStopwordSet: Set[String] = EnglishStopwords.toSet

  /** Composite quality score in [0, 1]: long-enough docs with a healthy
    * stopword ratio and low punctuation noise score high. Deterministic
    * arithmetic only — reproducible across engines for the oracle.
    *
    * One imperative pass (same justification as [[shingles]], measured in
    * tools/BenchRepro): the expression form re-splits the text for the
    * token count and the stopword filter, and the higher-order `filter`
    * is interpreted — ~4 passes over every document, ~5x this UDF. The
    * arithmetic below is ORDERED IDENTICALLY to the DuckDB oracle SQL,
    * so the doubles are bit-equal.
    */
  def qualityScore(text: Column): Column = qualityUdf(text)

  private lazy val qualityUdf = udf(qualityFn)

  /** Raw kernel, exposed so GraftExtensions can register the same
    * function on the SQL surface as a ScalaUDF expression.
    */
  private[graft] val qualityFn: String => java.lang.Double = { text =>
    if (text == null) null
    else {
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val n = toks.length
      var sw = 0
      toks.foreach { t =>
        if (EnglishStopwordSet.contains(t.toLowerCase(java.util.Locale.ROOT))) sw += 1
      }
      var punct = 0
      var i = 0
      while (i < text.length) {
        (text.charAt(i): @annotation.switch) match {
          case '.' | ',' | '!' | '?' | ';' | ':' => punct += 1
          case _ => ()
        }
        i += 1
      }
      // ratio denominator in CODE POINTS — Spark's length() and the
      // oracle's length() count characters, not UTF-16 units
      val nChars = text.codePointCount(0, text.length)
      val lenScore = math.min(n / 50.0, 1.0)
      val stopScore = if (n == 0) 0.0 else math.min(sw.toDouble / n * 5.0, 1.0)
      val punctPenalty =
        if (nChars == 0) 0.0 else math.min(punct.toDouble / nChars * 5.0, 1.0)
      java.lang.Double.valueOf(
        lenScore * 0.5 + stopScore * 0.3 + (1.0 - punctPenalty) * 0.2)
    }
  }

  /** Language-ID heuristic: score = marker-token hits per language; the
    * best-scoring language wins, ties broken by fixed priority order
    * (en > es > de > fr). CJK text short-circuits on Unicode-script ratio.
    * An n-gram/marker heuristic, not a model — by design (no model deps
    * in a pure-SQL pipeline); precision is what a prefilter needs.
    */
  def langId(text: Column): Column = langIdUdf(text)

  private lazy val langIdUdf = udf(langIdFn)

  private val LangMarkers: Array[(String, Set[String])] = Array(
    "en" -> Set("the", "a", "and", "of", "to", "is"),
    "es" -> Set("el", "la", "los", "de", "que", "y"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht"),
    "fr" -> Set("le", "la", "les", "et", "est", "que"))

  /** One imperative pass (same justification as [[qualityScore]]): the
    * expression form ran four interpreted higher-order `filter`s over a
    * re-split token array, each duplicated by the greatest/when chains.
    * Semantics unchanged: marker-token hits per language, best score
    * wins, ties break en > es > de > fr, CJK short-circuits on
    * Unicode-script ratio > 0.3.
    */
  private[graft] val langIdFn: String => String = { text =>
    if (text == null) "und"
    else {
      var cjk = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        if (c >= '一' && c <= '鿿') cjk += 1
        i += 1
      }
      // denominator in CODE POINTS: Spark's length() and the oracle's
      // length() count characters, not UTF-16 units
      val nChars = text.codePointCount(0, text.length)
      if (nChars > 0 && cjk.toDouble / nChars > 0.3) "zh"
      else {
        val toks = text.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+").filter(_.nonEmpty)
        val scores = new Array[Int](LangMarkers.length)
        toks.foreach { t =>
          var j = 0
          while (j < LangMarkers.length) {
            if (LangMarkers(j)._2.contains(t)) scores(j) += 1
            j += 1
          }
        }
        var best = 0
        var bestIdx = -1
        var j = 0
        while (j < scores.length) {
          // strict > keeps the FIRST language on ties: en > es > de > fr
          if (scores(j) > best) { best = scores(j); bestIdx = j }
          j += 1
        }
        if (bestIdx < 0) "und" else LangMarkers(bestIdx)._1
      }
    }
  }

  /** Document fingerprint: MD5 of whitespace-normalized, lower-cased
    * text. Stable across engines (DuckDB/Spark both ship md5), the key
    * for exact dedup at scale — group on the 128-bit hex instead of
    * shuffling full document bodies.
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Winnowing fingerprints (Schleimer et al., the MOSS algorithm):
    * Rabin-Karp-style rolling hashes of character `k`-grams, then the
    * minimum hash of every window of `w` consecutive k-gram hashes —
    * the guarantee is that any shared substring of length ≥ k + w − 1
    * contributes at least one IDENTICAL fingerprint to both documents,
    * so overlap detection reduces to an equi-join on the selected
    * hashes. This is the rolling-hash document fingerprint (vs
    * [[fingerprint]]'s whole-document MD5): robust to insertions far
    * from the match, position-independent.
    *
    * Arithmetic is plain `(h·B + codepoint) mod M` over exact longs
    * (B = 257, M = 1e9+7), reproducible in any engine — the DuckDB
    * oracle recomputes it character-by-character. Returns the doc's
    * distinct selected hashes, sorted; empty for docs shorter than
    * k + w − 1 characters.
    */
  def winnowedFingerprints(text: Column, k: Int = 4, w: Int = 5): Column =
    winnowUdf(k, w)(text)

  private def winnowUdf(k: Int, w: Int) = udf { text: String =>
    if (text == null) Array.empty[Long]
    else {
      val cps = text.codePoints().toArray
      val n = cps.length
      val nh = n - k + 1
      if (nh < w) Array.empty[Long]
      else {
        val M = 1000000007L
        val B = 257L
        val hs = new Array[Long](nh)
        var i = 0
        while (i < nh) {
          var h = 0L
          var j = 0
          while (j < k) { h = (h * B + cps(i + j)) % M; j += 1 }
          hs(i) = h
          i += 1
        }
        val sel = new java.util.TreeSet[java.lang.Long]()
        var p = 0
        while (p <= nh - w) {
          var m = Long.MaxValue
          var q = p
          while (q < p + w) { if (hs(q) < m) m = hs(q); q += 1 }
          sel.add(m)
          p += 1
        }
        val out = new Array[Long](sel.size)
        var x = 0
        val it = sel.iterator()
        while (it.hasNext) { out(x) = it.next(); x += 1 }
        out
      }
    }
  }

  /** Unicode NFC normalization — the canonical first step of corpus
    * curation (mixed crawls carry the same glyph as composed and
    * decomposed codepoints; unnormalized text defeats exact dedup and
    * fingerprinting). UDF over `java.text.Normalizer` (Spark has no
    * normalization built-in); pure per-row scan work, no shuffle.
    */
  def normalizeNfc(text: Column): Column = nfcUdf(text)

  private lazy val nfcUdf = udf(nfcFn)

  private[graft] val nfcFn: String => String = { s =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
  }

  /** Accent folding: NFD-decompose, drop combining marks (Unicode
    * category Mn), leaving base letters — "école naïve ü" →
    * "ecole naive u". Matches the conventional utf8proc/DuckDB
    * `strip_accents` behavior on decomposable accents; letters with no
    * canonical decomposition (ø, ł) pass through on both engines.
    */
  def stripAccents(text: Column): Column = stripAccentsUdf(text)

  private lazy val stripAccentsUdf = udf(stripAccentsFn)

  private[graft] val stripAccentsFn: String => String = { s =>
    if (s == null) null
    else {
      val d = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(d.length)
      var i = 0
      while (i < d.length) {
        val ch = d.charAt(i)
        if (Character.getType(ch) != Character.NON_SPACING_MARK) sb.append(ch)
        i += 1
      }
      sb.toString
    }
  }
}
