package graft.images

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Image payload kernel: deterministic pixel synthesis, PNG (lossless) /
  * JPEG (lossy) codec via the JDK's javax.imageio, PSNR, and a 64-bit
  * average-hash — everything needed for the BASELINE.json input_hint
  * invariant (decoded pixels PSNR >= 40 dB for lossy + caption equality)
  * and the phash column. Pure JVM, no external deps. */
object ImageCodec {

  /** Deterministic RGB pixel pattern from a seed: smooth phase-shifted
    * sinusoidal gradients (no wrap discontinuities, low-frequency only) so
    * the 40 dB JPEG invariant is attainable at ordinary quality. */
  def genPixels(seed: Long, w: Int, h: Int): Array[Int] = {
    val px = new Array[Int](w * h)
    val p1 = ((seed ^ 0x9e3779b97f4a7c15L) & 0xff).toDouble / 255.0
    val p2 = (((seed >>> 17) ^ 0xc2b2ae3dL) & 0xff).toDouble / 255.0
    val p3 = (((seed >>> 31) ^ 0x27d4eb4fL) & 0xff).toDouble / 255.0
    val tau = 2 * math.Pi
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val fx = x.toDouble / math.max(1, w); val fy = y.toDouble / math.max(1, h)
        val r = 128 + 100 * math.sin(tau * (fx + p1))
        val g = 128 + 100 * math.sin(tau * (fy + p2))
        val b = 128 + 100 * math.sin(tau * (0.5 * (fx + fy) + p3))
        px(y * w + x) = (r.toInt << 16) | (g.toInt << 8) | b.toInt
        x += 1
      }
      y += 1
    }
    px
  }

  def toBuffered(px: Array[Int], w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    img
  }

  def encodePng(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(toBuffered(px, w, h), "png", bos)
    bos.toByteArray
  }

  def encodeJpeg(px: Array[Int], w: Int, h: Int, quality: Float = 0.92f): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(toBuffered(px, w, h), null, null), params)
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  /** Decode to RGB int pixels; null on corrupt bytes. */
  def decode(bytes: Array[Byte]): (Array[Int], Int, Int) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) return (null, 0, 0)
    val w = img.getWidth; val h = img.getHeight
    val px = new Array[Int](w * h)
    img.getRGB(0, 0, w, h, px, 0, w)
    var i = 0
    while (i < px.length) { px(i) &= 0xffffff; i += 1 } // drop alpha
    (px, w, h)
  }

  /** PSNR in dB between two same-size RGB images (per-channel MSE).
    * Double.PositiveInfinity for identical images. */
  def psnr(a: Array[Int], b: Array[Int]): Double = {
    require(a.length == b.length && a.nonEmpty)
    var se = 0.0
    var i = 0
    while (i < a.length) {
      val dr = ((a(i) >> 16) & 0xff) - ((b(i) >> 16) & 0xff)
      val dg = ((a(i) >> 8) & 0xff) - ((b(i) >> 8) & 0xff)
      val db = (a(i) & 0xff) - (b(i) & 0xff)
      se += dr * dr + dg * dg + db * db
      i += 1
    }
    val mse = se / (a.length * 3.0)
    if (mse <= 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / mse)
  }

  /** 64-bit average hash: box-downscale to 8x8 luma, bit = cell > mean.
    * Deterministic, DCT-free (FIXTURES.md §5). */
  def avgHash64(px: Array[Int], w: Int, h: Int): Long = {
    val cells = new Array[Double](64)
    val counts = new Array[Int](64)
    var y = 0
    while (y < h) {
      val cy = math.min(7, y * 8 / math.max(1, h))
      var x = 0
      while (x < w) {
        val cx = math.min(7, x * 8 / math.max(1, w))
        val p = px(y * w + x)
        val luma = 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
        cells(cy * 8 + cx) += luma
        counts(cy * 8 + cx) += 1
        x += 1
      }
      y += 1
    }
    var mean = 0.0
    var i = 0
    while (i < 64) { cells(i) /= math.max(1, counts(i)); mean += cells(i); i += 1 }
    mean /= 64
    var hash = 0L
    i = 0
    while (i < 64) { if (cells(i) > mean) hash |= (1L << i); i += 1 }
    hash
  }

  /** Hamming distance between two 64-bit hashes. */
  def hammingDist(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Bilinear resize (multimodal feature-extract/thumbnail op) — real JDK
    * implementation, no external libs. */
  def resize(px: Array[Int], w: Int, h: Int, nw: Int, nh: Int): Array[Int] = {
    val src = toBuffered(px, w, h)
    val dst = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
    val gfx = dst.createGraphics()
    gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    gfx.drawImage(src, 0, 0, nw, nh, null)
    gfx.dispose()
    val out = new Array[Int](nw * nh)
    dst.getRGB(0, 0, nw, nh, out, 0, nw)
    var i = 0
    while (i < out.length) { out(i) &= 0xffffff; i += 1 }
    out
  }

  /** Simple feature vector (multimodal feature-extract stage): 4x4 mean
    * luma grid + global mean/stddev, normalized to [0,1]. */
  def featureVector(px: Array[Int], w: Int, h: Int): Array[Float] = {
    val cells = new Array[Double](16); val counts = new Array[Int](16)
    var sum = 0.0; var sumSq = 0.0
    var y = 0
    while (y < h) {
      val cy = math.min(3, y * 4 / math.max(1, h))
      var x = 0
      while (x < w) {
        val cx = math.min(3, x * 4 / math.max(1, w))
        val p = px(y * w + x)
        val luma = 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
        cells(cy * 4 + cx) += luma; counts(cy * 4 + cx) += 1
        sum += luma; sumSq += luma * luma
        x += 1
      }
      y += 1
    }
    val n = (w * h).toDouble
    val mean = sum / n
    val std = math.sqrt(math.max(0, sumSq / n - mean * mean))
    val out = new Array[Float](18)
    var i = 0
    while (i < 16) { out(i) = (cells(i) / math.max(1, counts(i)) / 255.0).toFloat; i += 1 }
    out(16) = (mean / 255.0).toFloat
    out(17) = (std / 255.0).toFloat
    out
  }
}
