package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Byte-level BPE: trainer pinned to an independent naive reference,
  * the native expression pinned to a scalar replay of the merge
  * application, and the persisted-index / chunking lifecycles.
  */
class BpeSuite extends SparkSpec {
  import spark.implicits._

  private def hexOf(s: String): String =
    s.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString

  /** Independent reference: apply merges sequentially, leftmost scan
    * with explicit index stepping (the textbook formulation — the
    * kernel uses offset-walking and the oracle a fold; all three must
    * agree).
    */
  private def applyRef(wordHex: String, merges: Seq[(String, String)]): Seq[String] = {
    var t: Seq[String] = (0 until wordHex.length / 2)
      .map(i => wordHex.substring(2 * i, 2 * i + 2))
    for ((l, r) <- merges) {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < t.length) {
        if (i + 1 < t.length && t(i) == l && t(i + 1) == r) { out += l + r; i += 2 }
        else { out += t(i); i += 1 }
      }
      t = out.toSeq
    }
    t
  }

  /** Independent reference trainer (map-based, different data layout
    * than trainLocal's).
    */
  private def trainRef(words: Seq[(String, Long)], m: Int): Seq[(String, String)] = {
    var state: Seq[(Seq[String], Long)] = words.map { case (w, c) =>
      ((0 until w.length / 2).map(i => w.substring(2 * i, 2 * i + 2)), c)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (merges.length < m && continue) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((t, c) <- state; i <- 0 until t.length - 1)
        pc((t(i), t(i + 1))) = pc.getOrElse((t(i), t(i + 1)), 0L) + c
      if (pc.isEmpty) continue = false
      else {
        val (l, r) = pc.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        merges += ((l, r))
        state = state.map { case (t, c) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < t.length) {
            if (i + 1 < t.length && t(i) == l && t(i + 1) == r) { out += l + r; i += 2 }
            else { out += t(i); i += 1 }
          }
          (out.toSeq, c)
        }
      }
    }
    merges.toSeq
  }

  test("trainLocal matches the independent reference (ties, runs, unicode)") {
    val words = Seq(
      (hexOf("the"), 10L), (hexOf("then"), 5L), (hexOf("aaaa"), 4L),
      (hexOf("é漢"), 3L), (hexOf("x"), 7L), (hexOf("abab"), 2L))
    for (m <- Seq(1, 3, 8, 50)) {
      assert(BpeTokenizer.trainLocal(words, m) == trainRef(words, m), s"numMerges=$m")
    }
  }

  test("trainLocal stops when the vocabulary exhausts (single-token words only)") {
    // every word collapses to one token long before 100 merges
    val words = Seq((hexOf("ab"), 3L), (hexOf("cd"), 2L))
    val merges = BpeTokenizer.trainLocal(words, 100)
    assert(merges == Seq(("61", "62"), ("63", "64")))
  }

  test("counting weighs every adjacent position (overlapping runs)") {
    // 'aaa' x1 has TWO (61,61) positions; 'bc' x3 has three (62,63):
    // Sennrich counting must prefer (62,63). A per-word-distinct
    // counter would tie at 1v1 and pick (61,61) by hex order.
    val words = Seq((hexOf("aaa"), 1L), (hexOf("bc"), 3L))
    assert(BpeTokenizer.trainLocal(words, 1).head == ("62", "63"))
  }

  test("native expression == scalar replay on edge cases") {
    val docs = Seq(
      (1, "the cat sat on the mat the cat"),
      (2, "aaaa aaaa aa a aaa the hat"),
      (3, "  the   thematic math the "),
      (4, "éé é 😀😀 the é"),
      (5, ""),
      (6, "   "),
      (7, null.asInstanceOf[String])).toDF("id", "text")
    val merges = BpeTokenizer.trainBpe(docs, "text", trainWords = 8, numMerges = 12)
    assert(merges.nonEmpty)
    val got = docs.select(col("id"),
        BpeTokenizer.bpeTokenCount(col("text"), merges).as("n"),
        BpeTokenizer.bpeTokens(col("text"), merges).as("toks"))
      .collect().map(r => r.getInt(0) -> ((r.getInt(1), r.getSeq[String](2)))).toMap
    for ((id, text) <- Seq(1 -> "the cat sat on the mat the cat",
        2 -> "aaaa aaaa aa a aaa the hat", 3 -> "  the   thematic math the ",
        4 -> "éé é 😀😀 the é", 5 -> "", 6 -> "   ", 7 -> null)) {
      val words =
        if (text == null) Array.empty[String]
        else text.trim.split("\\s+").filter(_.nonEmpty)
      val exp = words.toSeq.flatMap(w => applyRef(hexOf(w), merges))
      assert(got(id)._2 == exp, s"doc $id tokens")
      assert(got(id)._1 == exp.length, s"doc $id count")
    }
  }

  test("persisted index roundtrip: build once, load, same merges") {
    val docs = Seq((1, "red orange red yellow red orange")).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_idx").toString
    BpeTokenizer.buildBpeIndex(docs, "text", dir, trainWords = 8, numMerges = 10)
    val loaded = BpeTokenizer.loadBpeMerges(spark, dir)
    assert(loaded == BpeTokenizer.trainBpe(docs, "text", 8, 10))
    assert(loaded.nonEmpty)
  }

  test("chunkByBpe: budget-exact chunks, hex concat reassembles the doc") {
    val docs = Seq(
      (1, "alpha beta gamma delta epsilon zeta"),
      (2, "a"),
      (3, "")).toDF("id", "text")
    val merges = BpeTokenizer.trainBpe(docs, "text", trainWords = 8, numMerges = 6)
    val max = 4
    val chunks = BpeTokenizer.chunkByBpe(docs, "id", "text", merges, max)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // every chunk except a doc's last is exactly max tokens
    val byDoc = chunks.groupBy(_._1)
    assert(!byDoc.contains(3)) // empty doc chunks to nothing
    for ((id, cs) <- byDoc) {
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq, s"doc $id chunk ids")
      sorted.dropRight(1).foreach(c => assert(c._3 == max, s"doc $id non-final chunk"))
      assert(sorted.last._3 <= max && sorted.last._3 > 0)
      // reassembly: chunk hex concatenation == word-bytes concatenation
      val text = Map(1 -> "alpha beta gamma delta epsilon zeta", 2 -> "a")(id)
      val expHex = text.trim.split("\\s+").filter(_.nonEmpty).map(hexOf).mkString
      assert(sorted.map(_._4).mkString == expHex, s"doc $id reassembly")
      // chunk token counts match the hex payload against the replay
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => applyRef(hexOf(w), merges))
      assert(sorted.map(_._3).sum == toks.length)
    }
  }

  test("token ids: positionally aligned with hex tokens, fixed vocab assignment") {
    val docs = Seq(
      (1, "the cat sat on the mat the cat"),
      (2, "aaaa aaaa aa a aaa the hat"),
      (3, "éé é 😀😀 the é"),
      (4, ""),
      (5, null.asInstanceOf[String])).toDF("id", "text")
    val merges = BpeTokenizer.trainBpe(docs, "text", trainWords = 8, numMerges = 12)
    // vocabulary: 0-255 the bytes, 256+rank the merge outputs
    val vocab = (0 until 256).map(b => f"$b%02X" -> b).toMap ++
      merges.zipWithIndex.reverseIterator.map { case ((l, r), i) => (l + r) -> (256 + i) }.toMap
    val got = docs.select(col("id"),
        BpeTokenizer.bpeTokens(col("text"), merges).as("hex"),
        BpeTokenizer.bpeTokenIds(col("text"), merges).as("ids"))
      .collect().map(r => (r.getInt(0), r.getSeq[String](1), r.getSeq[Int](2)))
    got.foreach { case (id, hex, ids) =>
      assert(hex.length == ids.length, s"doc $id length mismatch")
      hex.zip(ids).foreach { case (h, i) =>
        assert(vocab(h) == i, s"doc $id: token $h mapped to $i, expected ${vocab(h)}")
      }
    }
    // empty/null docs produce empty id arrays
    assert(got.filter(g => g._1 >= 4).forall(_._3.isEmpty))
  }

  test("decode inverts tokenIds back to the word concat (unicode, empty, null)") {
    val docs = Seq(
      (1, "the cat sat on the mat the cat"),
      (2, "aaaa aaaa aa a aaa the hat"),
      (3, "éé é 😀😀 the é"),
      (4, "  spaced\tout\nwords  "),
      (5, ""),
      (6, null.asInstanceOf[String])).toDF("id", "text")
    val merges = BpeTokenizer.trainBpe(docs, "text", trainWords = 8, numMerges = 12)
    val got = docs.select(col("id"),
        BpeTokenizer.bpeDecode(
          BpeTokenizer.bpeTokenIds(col("text"), merges), merges).as("detok"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toMap
    val want = docs.collect().map { r =>
      val t = Option(r.getString(1)).getOrElse("")
      (r.getInt(0), t.trim.split("\\s+").filter(_.nonEmpty).mkString)
    }.toMap
    assert(got == want)
    // an id outside the vocabulary is a model mismatch and fails loudly
    val bad = intercept[Throwable] {
      Seq(Seq(0, 256 + merges.length)).toDF("ids")
        .select(BpeTokenizer.bpeDecode(col("ids"), merges)).collect()
    }
    assert(bad.getMessage.contains("different merge table") ||
      Option(bad.getCause).exists(_.getMessage.contains("different merge table")))
  }

  test("priority kernel == rank-order oracle at 32k merges (well-formed table)") {
    // well-formed construction mirroring what training produces: every
    // merge's operands are single bytes or tokens formed by STRICTLY
    // earlier merges, and no two merges create the same byte string
    // (the regime where the min-rank priority loop and the rank-order
    // replay provably coincide — a duplicate-token table can diverge)
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdef".getBytes("UTF-8").toSeq
    val vocab = scala.collection.mutable.ArrayBuffer[String](
      alphabet.map(b => f"${b.toInt & 0xff}%02X"): _*)
    val seen = scala.collection.mutable.Set[String](vocab.toSeq: _*)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (merges.length < 32768) {
      val l = vocab(rnd.nextInt(vocab.length))
      val r = vocab(rnd.nextInt(vocab.length))
      val c = l + r
      if (c.length <= 24 && seen.add(c)) { merges += ((l, r)); vocab += c }
    }
    val m = graft.functions.BpeKernel.compile(merges.toSeq)
    val K = graft.functions.BpeKernel
    for (trial <- 0 until 120) {
      val len = 1 + rnd.nextInt(32)
      val bytes = Array.fill(len)(alphabet(rnd.nextInt(alphabet.length)).toByte)
      val pri = K.lensPriority(bytes, 0, len, m).toSeq
      val ord = K.lensRankOrder(bytes, 0, len, m).toSeq
      assert(pri == ord,
        s"kernel divergence on ${new String(bytes, "UTF-8")} (trial $trial): $pri vs $ord")
      assert(pri.sum == len, s"lengths must cover the word (trial $trial)")
    }
  }

  test("priority kernel == rank-order oracle on trainer-produced merges (fuzz)") {
    val rnd = new scala.util.Random(11)
    // real trainer output over run-heavy text (ties, runs, multi-byte)
    val corpus = (0 until 60).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(8))(
        Seq("aa", "aaa", "ab", "the", "then", "éé", "abab", "ba")(rnd.nextInt(8)))
        .mkString(" "))
    }.toDF("id", "text")
    val merges = BpeTokenizer.trainBpe(corpus, "text", trainWords = 64, numMerges = 48)
    val m = graft.functions.BpeKernel.compile(merges)
    val K = graft.functions.BpeKernel
    val alpha = "abthené ".toCharArray
    for (trial <- 0 until 2000) {
      val w = Array.fill(1 + rnd.nextInt(12))(alpha(rnd.nextInt(alpha.length))).mkString
        .replace(" ", "a")
      val bytes = w.getBytes("UTF-8")
      assert(K.lensPriority(bytes, 0, bytes.length, m).toSeq ==
        K.lensRankOrder(bytes, 0, bytes.length, m).toSeq,
        s"divergence on '$w' (trial $trial)")
    }
  }

  test("chunkByBpe overlap: stride windows, tails repeat, zero overlap unchanged") {
    val docs = Seq((1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("id", "text")
    val merges = BpeTokenizer.trainBpe(docs, "text", trainWords = 16, numMerges = 6)
    val n = docs.select(BpeTokenizer.bpeTokenCount(col("text"), merges))
      .collect()(0).getInt(0)
    val max = 8
    val ov = 3
    val stride = max - ov
    val chunks = BpeTokenizer.chunkByBpe(docs, "id", "text", merges, max, ov)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3))).sortBy(_._1)
    // chunk count = 1 + ceil((n - max) / stride); every non-final chunk
    // is budget-exact; chunk c starts at token c*stride
    assert(chunks.length == 1 + math.ceil(math.max(n - max, 0) / stride.toDouble).toInt)
    chunks.dropRight(1).foreach(c => assert(c._2 == max, s"chunk ${c._1} not full"))
    val full = docs.select(BpeTokenizer.bpeTokens(col("text"), merges))
      .collect()(0).getSeq[String](0)
    chunks.foreach { case (cid, nt, hex) =>
      assert(hex == full.slice(cid * stride, cid * stride + max).mkString(""),
        s"chunk $cid payload")
      assert(nt == math.min(max, n - cid * stride), s"chunk $cid count")
    }
    // overlap=0 (default) stays the historical disjoint partition
    val disjoint = BpeTokenizer.chunkByBpe(docs, "id", "text", merges, max)
      .collect().map(r => r.getString(3)).mkString("")
    assert(disjoint == full.mkString(""), "disjoint chunks must reassemble")
  }

  test("bpe count on the gate corpus never exceeds byte count, beats whitespace x1") {
    // sanity on real data: merges only shrink the byte-token stream,
    // and subword counts are >= whitespace word counts
    val docs = Seq(
      (1, "one two three four"), (2, "supercalifragilistic")).toDF("id", "text")
    val merges = BpeTokenizer.trainBpe(docs, "text", 8, 8)
    val got = docs.select(col("id"),
        BpeTokenizer.bpeTokenCount(col("text"), merges).as("n"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("w"),
        length(col("text")).as("b"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    got.foreach { case (id, n, w, b) =>
      assert(n >= w, s"doc $id: subword count below word count")
      assert(n <= b, s"doc $id: subword count above byte count")
    }
  }
}
