package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.operators.Dedup

/** Scale stress for the PERCEPTUAL dedup family — the image-side
  * sibling of [[WebIngestStress]]: a synthetic crawl of `base × copies`
  * images where a `constFrac` fraction are ONE constant blank image
  * (spacers/tracking pixels — they all share a single aHash) and the
  * rest cycle over 32 structurally distinct renders. Measures the
  * decode+hash pass and the Hamming pair join in BOTH forms:
  *
  *  - collapsed (production [[Dedup.hammingPairs64]]): the block join
  *    runs over DISTINCT signatures (printed), so the hot signature
  *    contributes ONE row per chunk and the quadratic part is only the
  *    required same-signature output expansion (AQE-skew-splittable
  *    sig-keyed join);
  *  - uncollapsed (the pre-round-12 raw-row blocking,
  *    [[Dedup.hammingPairs64Uncollapsed]]): S constant-image rows make
  *    every one of the 8 chunk blocks S² — auto-skipped once the
  *    estimated single-task work exceeds ~500M comparisons, which is
  *    exactly the degeneracy the collapse removes.
  *
  * Args: `[base] [copies] [constPct]` (defaults 5000, 10, 10).
  */
object ImageDedupStress {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(_.toInt).getOrElse(5000)
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val constPct = args.lift(2).map(_.toInt).getOrElse(10)
    val n = base.toLong * copies
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def render(kind: Int): Array[Byte] = {
      // kind 0: flat blank (one constant signature, the spacer case);
      // kinds >= 1: a seeded-random 8x8 cell pattern -> 64 random hash
      // bits, so structural classes sit ~32 bits apart like real
      // diverse content
      val rnd = new scala.util.Random(kind * 7919L)
      val cells = Array.fill(64)(rnd.nextBoolean())
      val img = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 64) {
        val v =
          if (kind == 0) 200
          else if (cells((y / 8) * 8 + (x / 8))) 215 else 40
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", buf)
      buf.toByteArray
    }
    val pngs = (0 to 32).map(render) // 0 = blank, 1..32 structural
    val payload = when(col("id") % 100 < constPct, element_at(array(pngs.map(lit(_)): _*), 1))
      .otherwise(element_at(array(pngs.map(lit(_)): _*), (col("id") % 32).cast("int") + 2))
    val df = spark.range(n).select(col("id"), payload.as("payload"))

    def t[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[img-stress] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    println(s"[img-stress] corpus: $n images (${constPct}% constant blank)")
    val hashes = t("decode+hash pass (expression scan)") {
      val h = Multimodal.withAHash(df, "payload", Seq("id")).localCheckpoint(true)
      h.count()
      h
    }
    val distinctSigs = hashes.select("ahash").distinct().count()
    val hotRows = n * constPct / 100
    println(s"[img-stress]   distinct signatures: $distinctSigs (hot sig holds ~$hotRows rows)")
    val collapsed = t("collapsed hamming join (production)") {
      Dedup.hammingPairs64(hashes, "id", "ahash", 7).count()
    }
    println(s"[img-stress]   pairs: $collapsed")
    // estimated single-task block work for the raw-row form: the hot
    // signature alone puts hotRows² candidates in EACH of its 8 blocks
    val estWork = 8.0 * hotRows * hotRows
    if (estWork <= 5e8) {
      val uncollapsed = t("uncollapsed hamming join (pre-r12 form)") {
        Dedup.hammingPairs64Uncollapsed(hashes, "id", "ahash", 7).count()
      }
      println(s"[img-stress]   pairs: $uncollapsed" +
        (if (uncollapsed == collapsed) " (== collapsed)" else " *** MISMATCH ***"))
    } else
      println(f"[img-stress] uncollapsed SKIPPED: ~${estWork / 1e9}%.1fB single-task comparisons")
    // the two-corpus (probe-vs-index) path: first half as the "index",
    // second half probing it — both sides carry the hot signature
    val half = n / 2
    val idxSide = hashes.filter(col("id") < half)
    val probeSide = hashes.filter(col("id") >= half)
    val probed = t("collapsed probe-vs-index join (hammingJoin64)") {
      Dedup.hammingJoin64(probeSide, "id", "ahash",
        idxSide, "id", "ahash", 7).count()
    }
    println(s"[img-stress]   probe matches: $probed")
    spark.stop()
  }
}
