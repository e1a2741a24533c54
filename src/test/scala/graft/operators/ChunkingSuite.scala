package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkingSuite extends SparkSpec {
  import spark.implicits._

  /** Independent scalar chunker. */
  private def expected(
      docs: Seq[(Long, String)], maxTokens: Int, overlap: Int): Set[(Long, Int, String, Long)] = {
    val stride = maxTokens - overlap
    docs.flatMap { case (id, text) =>
      val toks = Option(text).map(_.trim.split("\\s+").filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty)
      if (toks.isEmpty) Seq.empty
      else {
        val nc = 1 + math.ceil(math.max(toks.length - maxTokens, 0).toDouble / stride).toInt
        (0 until nc).map { c =>
          val chunk = toks.slice(c * stride, c * stride + maxTokens)
          (id, c, chunk.mkString(" "), chunk.length.toLong)
        }
      }
    }.toSet
  }

  private def run(docs: Seq[(Long, String)], maxTokens: Int, overlap: Int) =
    Chunking.chunkByTokens(docs.toDF("doc_id", "text"), "doc_id", "text", maxTokens, overlap)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet

  test("chunking matches the scalar reference across shapes") {
    val rnd = new scala.util.Random(55)
    for (round <- 0 until 8) {
      val maxT = 2 + rnd.nextInt(6)
      val over = rnd.nextInt(maxT)
      val docs = (0L until 25L).map { i =>
        (i, (0 until rnd.nextInt(30)).map(j => s"t${(i + j) % 7}").mkString("  "))
      }
      assert(run(docs, maxT, over) == expected(docs, maxT, over),
        s"round $round maxTokens=$maxT overlap=$over")
    }
  }

  test("short docs yield one chunk, empty and null docs none") {
    val docs = Seq((1L, "a b c"), (2L, ""), (3L, "   "), (4L, null: String))
    assert(run(docs, 10, 2) == Set((1L, 0, "a b c", 3L)))
  }

  test("consecutive chunks overlap by exactly `overlap` tokens") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val out = run(Seq((7L, text)), maxTokens = 4, overlap = 2).toSeq.sortBy(_._2)
    assert(out.map(_._3) == Seq(
      "w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8", "w7 w8 w9 w10"))
    // every token position is covered and n_tokens is the chunk's size
    assert(out.map(_._4).sum == 4 * 4)
  }

  test("chunking is a pure scan projection — no exchange in the plan") {
    val plan = Chunking.chunkByTokens(
        Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", 2, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking shuffled:\n$plan")
  }

  test("chunkBySentences == scalar replica; whole sentences; zero shuffle") {
    import scala.jdk.CollectionConverters._
    val docs = Seq(
      (1L, "One two three. Four five? Six seven eight! Nine ten eleven."),
      (2L, "NoTerminalPunctuation just words flowing here"),
      (3L, ""),
      (4L, "A. B. C. D. E. F. G. H."),
      (5L, "This single sentence is longer than any chunk budget here today."))
      .toDF("id", "text")
    def replica(text: String, maxTokens: Long): Seq[(Int, String, Long)] = {
      val m = java.util.regex.Pattern
        .compile("[^.!?]*[.!?]+[ \\t\\r\\n]*|[^.!?]+$").matcher(text)
      val sents = Iterator.continually(m).takeWhile(_.find())
        .map(_.group().trim).filter(_.nonEmpty).toSeq
      val cnts = sents.map(_.split("\\s+").count(_.nonEmpty).toLong)
      val cum = cnts.scanLeft(0L)(_ + _).init
      val ids = cum.map(cb => math.floor(cb / maxTokens.toDouble).toInt)
      ids.distinct.map { c =>
        val sel = sents.zip(cnts).zip(ids).filter(_._2 == c).map(_._1)
        (c, sel.map(_._1).mkString(" "), sel.map(_._2).sum)
      }
    }
    for (budget <- Seq(3L, 5L, 8L, 100L)) {
      val got = Chunking.chunkBySentences(docs, "id", "text", budget)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
        .toSet
      val want = (for {
        (id, t) <- Seq((1L, "One two three. Four five? Six seven eight! Nine ten eleven."),
          (2L, "NoTerminalPunctuation just words flowing here"), (3L, ""),
          (4L, "A. B. C. D. E. F. G. H."),
          (5L, "This single sentence is longer than any chunk budget here today."))
        (c, txt, n) <- replica(t, budget)
      } yield (id, c, txt, n)).toSet
      assert(got == want, s"budget=$budget")
    }
    // sentences are never split: every chunk text is a concatenation of
    // full sentences (ends with punctuation or the doc's own tail)
    val chunks = Chunking.chunkBySentences(docs, "id", "text", 5)
    val plan = chunks.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sentence chunking shuffled:\n$plan")
  }

  test("chunkBySentences overlap: interval membership replica, tails repeat") {
    val doc = "One two three. Four five. Six seven. Eight nine ten. Eleven twelve."
    val docs = Seq((1L, doc)).toDF("id", "text")
    def replica(maxTokens: Long, overlap: Long): Set[(Int, String, Long)] = {
      val stride = maxTokens - overlap
      val sents = doc.split("(?<=[.!?])\\s+").map(_.trim).filter(_.nonEmpty).toSeq
      val cnts = sents.map(_.split("\\s+").count(_.nonEmpty).toLong)
      val cum = cnts.scanLeft(0L)(_ + _).init
      val memberships = cum.map { cb =>
        val lo = math.max(0L,
          math.ceil((cb - maxTokens + 1) / stride.toDouble).toLong)
        val hi = math.floor(cb / stride.toDouble).toLong
        (lo to hi).toSet
      }
      memberships.flatten.toSet.map { (c: Long) =>
        val sel = sents.zip(cnts).zip(memberships).filter(_._2.contains(c)).map(_._1)
        (c.toInt, sel.map(_._1).mkString(" "), sel.map(_._2).sum)
      }
    }
    for ((mt, ov) <- Seq((6L, 2L), (5L, 1L), (8L, 3L), (6L, 0L))) {
      val got = Chunking.chunkBySentences(docs, "id", "text", mt, ov)
        .collect().map(r => (r.getInt(1), r.getString(2), r.getLong(3))).toSet
      assert(got == replica(mt, ov), s"max=$mt overlap=$ov")
    }
    // overlapping chunks actually share sentences
    val ov = Chunking.chunkBySentences(docs, "id", "text", 6, 2)
      .collect().map(_.getString(2))
    assert(ov.length >= 2)
    val allSents = ov.flatMap(_.split("(?<=[.!?])\\s+"))
    assert(allSents.length > allSents.distinct.length, ov.mkString(" | "))
  }
}
