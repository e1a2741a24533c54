package graft.tools

import graft.functions.BpeKernel

/** Throwaway: cold-cache BPE tokenization cost vs merge-table size —
  * the priority kernel should be FLAT in merge count (O(len·log len)
  * per word), the rank-order replay linear in it. No Spark session:
  * the kernel is a plain JVM function, and per-word cost is what the
  * codegen'd expression pays on every cache miss.
  */
object BpeKernelBench {
  def main(args: Array[String]): Unit = {
    val words = args.headOption.map(_.toInt).getOrElse(20000)
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdef".getBytes("UTF-8")
    // well-formed table (operands from strictly earlier merges, unique
    // concats), built once at the largest size; prefixes give the rest
    val vocab = scala.collection.mutable.ArrayBuffer[String](
      alphabet.map(b => f"${b.toInt & 0xff}%02X").toSeq: _*)
    val seen = scala.collection.mutable.Set[String](vocab.toSeq: _*)
    val all = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (all.length < 32768) {
      val l = vocab(rnd.nextInt(vocab.length))
      val r = vocab(rnd.nextInt(vocab.length))
      val c = l + r
      if (c.length <= 24 && seen.add(c)) { all += ((l, r)); vocab += c }
    }
    val corpus = Array.fill(words) {
      Array.fill(2 + rnd.nextInt(24))(alphabet(rnd.nextInt(alphabet.length)))
    }
    for (nm <- Seq(64, 1024, 8192, 32768)) {
      val m = BpeKernel.compile(all.take(nm).toSeq)
      m.pairRank // build the lookup outside the timed region
      for (pass <- 1 to 3) {
        var sink = 0L
        val t0 = System.nanoTime()
        var i = 0
        while (i < corpus.length) {
          val w = corpus(i)
          sink += BpeKernel.lensPriority(w, 0, w.length, m).length
          i += 1
        }
        val pri = (System.nanoTime() - t0) / 1e6
        val t1 = System.nanoTime()
        i = 0
        while (i < corpus.length) {
          val w = corpus(i)
          sink += BpeKernel.lensRankOrder(w, 0, w.length, m).length
          i += 1
        }
        val ord = (System.nanoTime() - t1) / 1e6
        if (pass == 3)
          println(f"[bpe-bench] merges=$nm%6d words=$words  priority=$pri%8.1f ms  rank-order=$ord%9.1f ms  (sink=$sink)")
      }
    }
  }
}
