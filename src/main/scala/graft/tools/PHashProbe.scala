package graft.tools

import graft.multimodal.Multimodal

/** Throwaway margin probe for the pHash pins (driver-side only). */
object PHashProbe {
  def structImage(kind: Int, w: Int, h: Int, noise: Int, seed: Int = 0): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val fx = x.toDouble / w
      val fy = y.toDouble / h
      val bright = kind match {
        case 0 => fx < 0.5
        case 1 => fx > fy
        case 2 => (fx - 0.5) * (fx - 0.5) + (fy - 0.5) * (fy - 0.5) < 0.09
        case 3 => fy < 0.33 || fy > 0.66
        case _ => fx + fy < 0.7
      }
      val base = if (bright) 210 else 45
      val v = math.max(0, math.min(255,
        base + (if (noise > 0) rnd.nextInt(2 * noise + 1) - noise else 0)))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  def croppedPng(bytes: Array[Byte], border: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val sub = img.getSubimage(border, border,
      img.getWidth - 2 * border, img.getHeight - 2 * border)
    val out = new java.awt.image.BufferedImage(
      sub.getWidth, sub.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try g.drawImage(sub, 0, 0, null) finally g.dispose()
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", buf)
    buf.toByteArray
  }

  def main(args: Array[String]): Unit = {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (k <- 0 until 5) {
      val base = Multimodal.pHash64(structImage(k, 64, 64, 0))
      val up = Multimodal.pHash64(structImage(k, 96, 96, 0))
      val down = Multimodal.pHash64(structImage(k, 40, 40, 0))
      val crop = Multimodal.pHash64(croppedPng(structImage(k, 64, 64, 0), 4))
      val noisy = Multimodal.pHash64(structImage(k, 64, 64, 12, seed = 9))
      val noisy2 = Multimodal.pHash64(structImage(k, 64, 64, 6, seed = 5))
      println(s"kind $k: up=${ham(base, up)} down=${ham(base, down)} " +
        s"crop=${ham(base, crop)} noise12=${ham(base, noisy)} noise6=${ham(base, noisy2)}")
    }
    println("cross-kind distances (originals):")
    val hs = (0 until 5).map(k => Multimodal.pHash64(structImage(k, 64, 64, 0)))
    for (a <- 0 until 5; b <- a + 1 until 5)
      println(s"  d($a,$b)=${ham(hs(a), hs(b))}")
    // worst case: min cross-kind over all variant combos
    val variants = (0 until 5).map { k =>
      val orig = structImage(k, 64, 64, 0)
      Seq(Multimodal.pHash64(orig),
        Multimodal.pHash64(structImage(k, 96, 96, 0)),
        Multimodal.pHash64(croppedPng(orig, 4)))
    }
    var minCross = 64
    var maxSame = 0
    for (a <- 0 until 5; b <- 0 until 5; va <- variants(a); vb <- variants(b))
      if (a == b) maxSame = math.max(maxSame, ham(va, vb))
      else minCross = math.min(minCross, ham(va, vb))
    println(s"maxSame=$maxSame minCross=$minCross")
    for (a <- 0 until 5; b <- a + 1 until 5) {
      val m = (for (va <- variants(a); vb <- variants(b)) yield ham(va, vb)).min
      val s = math.max(
        (for (va <- variants(a); vb <- variants(a)) yield ham(va, vb)).max,
        (for (va <- variants(b); vb <- variants(b)) yield ham(va, vb)).max)
      println(s"  kinds($a,$b): minCross=$m maxSame=$s")
    }
  }
}
