package graft.operators

import graft.SparkSpec
import graft.functions.UnigramKernel
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer ([[UnigramTokenizer]]): deterministic hard-EM
  * trainer, Viterbi serving kernel == driver-side twin, totality over
  * unknown bytes, artifact round-trip.
  */
class UnigramSuite extends SparkSpec {
  import spark.implicits._

  private def hexOf(s: String): String =
    s.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString

  private val docs = Seq(
    (1L, "banana bandana banana"),
    (2L, "ana banana nab"),
    (3L, "band bandana banana ana"),
    (4L, "nan ban banana")
  ).toDF("doc_id", "text")

  private lazy val vocab = UnigramTokenizer.trainUnigram(docs, "text",
    trainWords = 8, maxPieceLen = 4, seedPieces = 16, emIters = 2)

  test("trainUnigram: deterministic, hex-sorted, all occurring singles present") {
    val again = UnigramTokenizer.trainUnigram(docs.repartition(5), "text",
      trainWords = 8, maxPieceLen = 4, seedPieces = 16, emIters = 2)
    assert(vocab == again, "training must be partitioning-invariant")
    assert(vocab.map(_._1) == vocab.map(_._1).sorted)
    // every byte of the corpus words is a single-piece (totality base)
    val singles = vocab.map(_._1).filter(_.length == 2).toSet
    for (b <- "bandn".getBytes("UTF-8"))
      assert(singles.contains(f"${b & 0xff}%02X"))
    // frequent substrings seeded as multi-byte pieces
    assert(vocab.exists(v => v._1.length > 2))
  }

  test("kernel segmentation == driver-side Viterbi twin on every corpus word") {
    val words = Seq("banana", "bandana", "ana", "nab", "band", "nan", "ban")
    val scoreMap = vocab.toMap
    val m = UnigramKernel.compile(vocab)
    val unk = vocab.map(_._2).min - 10000L
    for (w <- words) {
      val wh = hexOf(w)
      val viaKernel = UnigramTokenizer.kernelSegmentHex(wh, vocab)
      val viaDriver = UnigramTokenizer.viterbiHex(wh, scoreMap, 4, Some(unk))
      assert(viaKernel == viaDriver, s"word $w: $viaKernel vs $viaDriver")
      // the chosen segmentation is max-likelihood: at least as good as
      // the all-singles baseline
      val segScore = viaKernel.map(scoreMap).sum
      val singleScore = wh.grouped(2).map(p =>
        scoreMap.getOrElse(p, unk)).sum
      assert(segScore >= singleScore)
    }
  }

  test("unknown bytes segment as themselves at the derived floor (totality)") {
    val withUnknown = "bananaézq" // bytes the training never saw
    val wh = hexOf(withUnknown)
    val pieces = UnigramTokenizer.kernelSegmentHex(wh, vocab)
    // round-trip: pieces concatenate back to the word's bytes
    assert(pieces.mkString == wh)
    // the unknown bytes came out as single-byte pieces
    val known = vocab.map(_._1).toSet
    assert(pieces.filterNot(known).forall(_.length == 2))
    assert(pieces.exists(p => !known(p)))
  }

  test("expressions: tokens concatenate words in order; count == tokens length; null/blank total") {
    val df = Seq((1L, "banana nab"), (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, "   ")).toDF("id", "text")
    val out = df.select(col("id"),
        UnigramTokenizer.unigramTokens(col("text"), vocab).as("toks"),
        UnigramTokenizer.unigramTokenCount(col("text"), vocab).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[String](1), r.getInt(2))).toMap
    assert(out(2L)._1.isEmpty && out(2L)._2 == 0)
    assert(out(3L)._1.isEmpty && out(3L)._2 == 0)
    assert(out(4L)._1.isEmpty && out(4L)._2 == 0)
    val scoreMap = vocab.toMap
    val unk = vocab.map(_._2).min - 10000L
    val expected =
      UnigramTokenizer.viterbiHex(hexOf("banana"), scoreMap, 4, Some(unk)) ++
        UnigramTokenizer.viterbiHex(hexOf("nab"), scoreMap, 4, Some(unk))
    assert(out(1L)._1 == expected)
    assert(out(1L)._2 == expected.length)
  }

  test("artifact round-trip: build + load == trainUnigram; resolve-not-retrain") {
    val idx = java.nio.file.Files.createTempDirectory("graft_uni_idx_").toString
    UnigramTokenizer.buildUnigramIndex(docs, "text", idx,
      trainWords = 8, maxPieceLen = 4, seedPieces = 16, emIters = 2)
    assert(UnigramTokenizer.loadUnigramVocab(spark, idx) == vocab)
  }

  test("ids: hex-sorted assignment, unknown-byte fallback range, decode inverts exactly") {
    val df = Seq((1L, "banana nab"), (2L, "bananaézq"), (3L, "")).toDF("id", "text")
    val out = df.select(col("id"),
        UnigramTokenizer.unigramTokenIds(col("text"), vocab).as("ids"),
        hex(UnigramTokenizer.unigramDecode(
          UnigramTokenizer.unigramTokenIds(col("text"), vocab), vocab)).as("rt"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Int](1), r.getString(2))).toMap
    val v = vocab.size
    // known text: every id indexes the hex-sorted vocab
    assert(out(1L)._1.forall(id => id >= 0 && id < v))
    val pieces = out(1L)._1.map(id => vocab(id)._1)
    assert(pieces.mkString == hexOf("banana") + hexOf("nab"))
    // unknown bytes land in the V+byte fallback range
    assert(out(2L)._1.exists(id => id >= v))
    out(2L)._1.filter(_ >= v).foreach(id => assert(id < v + 256))
    // decode(encode) == word concat (the pre-tokenizer contract)
    assert(out(1L)._2 == hexOf("banana") + hexOf("nab"))
    assert(out(2L)._2 == hexOf("bananaézq"))
    assert(out(3L)._2 == "")
    // an id outside [0, V+256) is a vocabulary mismatch: loud failure
    val bad = Seq(Tuple1(Array(v + 256))).toDF("ids")
    val e = intercept[Exception] {
      bad.select(UnigramTokenizer.unigramDecode(col("ids"), vocab)).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("outside the vocabulary"), msgs)
  }

  test("chunkByUnigram: budget-exact windows over the Viterbi stream, overlap repeats tails") {
    val df = Seq((1L, "banana bandana banana ana nab band")).toDF("id", "text")
    val scoreMap = vocab.toMap
    val unk = vocab.map(_._2).min - 10000L
    val toks = "banana bandana banana ana nab band".split(" ").toSeq
      .flatMap(w => UnigramTokenizer.viterbiHex(hexOf(w), scoreMap, 4, Some(unk)))
    val out = UnigramTokenizer.chunkByUnigram(df, "id", "text", vocab, maxTokens = 4)
      .orderBy("chunk_id").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out.map(_._2).sum == toks.length)
    assert(out.map(_._3).mkString == toks.mkString)
    assert(out.dropRight(1).forall(_._2 == 4) && out.last._2 <= 4)
    // overlap: stride 2, each chunk re-reads the previous tail
    val ov = UnigramTokenizer.chunkByUnigram(df, "id", "text", vocab,
        maxTokens = 4, overlap = 2)
      .orderBy("chunk_id").collect().map(_.getString(3))
    assert(ov.head == toks.take(4).mkString)
    assert(ov(1) == toks.slice(2, 6).mkString)
  }

  test("EM moves probability mass to used pieces (starved pieces keep only the floor)") {
    // hard-EM: pieces the Viterbi never uses fall to the add-one floor,
    // so every used piece must score strictly above the global minimum
    val m = UnigramKernel.compile(vocab)
    val scoreMap = vocab.toMap
    val unk = vocab.map(_._2).min - 10000L
    val used = Seq("banana", "bandana", "ana").flatMap(w =>
      UnigramTokenizer.viterbiHex(hexOf(w), scoreMap, 4, Some(unk))).toSet
    val floor = vocab.map(_._2).min
    assert(used.forall(p => scoreMap(p) > floor))
  }
}
