package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Jpeg

/** Baseline JPEG codec (multimodal/Jpeg.scala): encoder↔decoder
  * round-trips within quantization error, and cross-validation against
  * the JDK's independent ImageIO codec in both directions — our encoder
  * must be readable by ImageIO, and ImageIO's output (including its
  * chroma-subsampled variants) must be readable by our decoder. */
class JpegSpec extends AnyFunSuite {

  /** Smooth gradient test card — compresses well, so round-trip error
    * stays near the quantization floor. */
  private def gradient(w: Int, h: Int): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      px(o) = (x * 255 / math.max(1, w - 1)).toByte
      px(o + 1) = (y * 255 / math.max(1, h - 1)).toByte
      px(o + 2) = ((x + y) * 255 / math.max(1, w + h - 2)).toByte
    }
    px
  }

  private def maxAbsDiff(a: Array[Byte], b: Array[Byte]): Int = {
    require(a.length == b.length)
    var m = 0; var i = 0
    while (i < a.length) { m = math.max(m, math.abs((a(i) & 0xff) - (b(i) & 0xff))); i += 1 }
    m
  }

  test("RGB round-trip at quality 95 stays within quantization error") {
    val (w, h) = (64, 48)
    val src = gradient(w, h)
    val jpg = Jpeg.encodeJpeg(src, w, h, channels = 3, quality = 95)
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8) // SOI
    assert((jpg(jpg.length - 2) & 0xff) == 0xff && (jpg.last & 0xff) == 0xd9) // EOI
    val (dw, dh, n, rgb) = Jpeg.decodePixels(jpg)
    assert(dw == w && dh == h && n == 3)
    assert(maxAbsDiff(src, rgb) <= 24, s"max pixel error ${maxAbsDiff(src, rgb)}")
  }

  test("non-multiple-of-8 dimensions round-trip (edge replication)") {
    val (w, h) = (21, 13)
    val src = gradient(w, h)
    val jpg = Jpeg.encodeJpeg(src, w, h, quality = 90)
    val (dw, dh, _, rgb) = Jpeg.decodePixels(jpg)
    assert(dw == w && dh == h)
    assert(maxAbsDiff(src, rgb) <= 32)
  }

  test("grayscale 1-component round-trip") {
    val (w, h) = (32, 32)
    val src = new Array[Byte](w * h)
    for (i <- src.indices) src(i) = ((i * 7) % 256).toByte
    val jpg = Jpeg.encodeJpeg(src, w, h, channels = 1, quality = 92)
    val (dw, dh, n, rgb) = Jpeg.decodePixels(jpg)
    assert(dw == w && dh == h && n == 1)
    // grayscale replicates into RGB; compare channel 0 against source
    var m = 0
    for (i <- 0 until w * h)
      m = math.max(m, math.abs((src(i) & 0xff) - (rgb(i * 3) & 0xff)))
    assert(m <= 16, s"max gray error $m")
  }

  test("decodeJpeg summary stats are sane on a mid-gray card") {
    val (w, h) = (40, 24)
    val src = Array.fill[Byte](w * h * 3)(128.toByte)
    val info = Jpeg.decodeJpeg(Jpeg.encodeJpeg(src, w, h, quality = 90))
    assert(info.width == w && info.height == h && info.components == 3)
    assert(math.abs(info.meanR - 128) < 4 && math.abs(info.meanG - 128) < 4 &&
      math.abs(info.meanB - 128) < 4 && math.abs(info.meanLuma - 128) < 4)
  }

  test("our encoder's output decodes with the JDK's independent codec") {
    val (w, h) = (48, 32)
    val src = gradient(w, h)
    val jpg = Jpeg.encodeJpeg(src, w, h, quality = 95)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assume(img != null, "JDK has no JPEG reader in this environment")
    assert(img.getWidth == w && img.getHeight == h)
    var m = 0
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      val o = (y * w + x) * 3
      m = math.max(m, math.abs(((p >> 16) & 0xff) - (src(o) & 0xff)))
      m = math.max(m, math.abs(((p >> 8) & 0xff) - (src(o + 1) & 0xff)))
      m = math.max(m, math.abs((p & 0xff) - (src(o + 2) & 0xff)))
    }
    assert(m <= 24, s"ImageIO sees max error $m vs source")
  }

  test("the JDK encoder's output (incl. subsampled chroma) decodes here") {
    val (w, h) = (50, 34)
    val src = gradient(w, h)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      img.setRGB(x, y, ((src(o) & 0xff) << 16) | ((src(o + 1) & 0xff) << 8) | (src(o + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, "jpg", bos)
    assume(ok, "JDK has no JPEG writer in this environment")
    val (dw, dh, n, rgb) = Jpeg.decodePixels(bos.toByteArray)
    assert(dw == w && dh == h && n == 3)
    // ImageIO may subsample chroma — allow a wider band on the smooth card
    assert(maxAbsDiff(src, rgb) <= 48, s"max error ${maxAbsDiff(src, rgb)}")
  }

  test("restart markers (DRI/RSTn) round-trip and reset DC prediction") {
    val (w, h) = (64, 40) // 8x5 = 40 MCUs -> 9 RST markers at interval 4
    val src = gradient(w, h)
    val jpg = Jpeg.encodeJpeg(src, w, h, quality = 95, restartInterval = 4)
    // the stream must actually contain DRI and RSTn markers
    def hasMarker(m: Int): Boolean =
      jpg.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)
    assert(hasMarker(0xdd), "DRI segment missing")
    assert((0xd0 to 0xd7).exists(hasMarker), "no RSTn in entropy stream")
    val (dw, dh, _, rgb) = Jpeg.decodePixels(jpg)
    assert(dw == w && dh == h)
    assert(maxAbsDiff(src, rgb) <= 24, s"max error ${maxAbsDiff(src, rgb)}")
    // and the JDK's independent decoder agrees the stream is legal
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assume(img != null, "JDK has no JPEG reader in this environment")
    assert(img.getWidth == w && img.getHeight == h)
  }

  test("corrupted restart intervals fail loudly: wrong RSTn sequence or garbage") {
    val (w, h) = (64, 40)
    val src = gradient(w, h)
    val jpg = Jpeg.encodeJpeg(src, w, h, quality = 95, restartInterval = 4)
    val sosAt = jpg.sliding(2).indexWhere(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xda)
    var rstAt = sosAt + 2
    while (!((jpg(rstAt) & 0xff) == 0xff &&
      (jpg(rstAt + 1) & 0xff) >= 0xd0 && (jpg(rstAt + 1) & 0xff) <= 0xd7)) rstAt += 1
    // a dropped interval shows up as an out-of-sequence RSTn (T.81 E.1.4):
    // decoding must fail, not silently resync on misaligned MCU data
    val outOfSeq = jpg.clone()
    outOfSeq(rstAt + 1) =
      (0xd0 + ((jpg(rstAt + 1) & 0xff) - 0xd0 + 3) % 8).toByte
    val e1 = intercept[IllegalArgumentException](Jpeg.decodePixels(outOfSeq))
    assert(e1.getMessage.contains("restart"), e1.getMessage)
    // garbage bytes before the marker: only 0xFF fill is legal there
    val garbage = jpg.take(rstAt) ++ Array[Byte](0x12, 0x34) ++ jpg.drop(rstAt)
    val e2 = intercept[IllegalArgumentException](Jpeg.decodePixels(garbage))
    assert(e2.getMessage.contains("restart"), e2.getMessage)
  }

  test("4:2:0 and 4:2:2 chroma subsampling round-trip through our decoder") {
    val (w, h) = (52, 38) // non-multiple of every MCU size
    val src = gradient(w, h)
    for ((lh, lv, label) <- Seq((2, 2, "4:2:0"), (2, 1, "4:2:2"))) {
      val jpg = Jpeg.encodeJpeg(src, w, h, quality = 95, lumaH = lh, lumaV = lv)
      val (dw, dh, n, rgb) = Jpeg.decodePixels(jpg)
      assert(dw == w && dh == h && n == 3, label)
      // chroma varies slowly on the gradient card, so averaged-then-
      // replicated chroma costs only a few code values beyond 4:4:4
      assert(maxAbsDiff(src, rgb) <= 40, s"$label max error ${maxAbsDiff(src, rgb)}")
      // the JDK's independent decoder agrees the subsampled stream is legal
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      assume(img != null, "JDK has no JPEG reader in this environment")
      assert(img.getWidth == w && img.getHeight == h, label)
    }
  }

  test("fill bytes before markers are legal; capability sniff routes right") {
    val good = Jpeg.encodeJpeg(gradient(16, 16), 16, 16)
    // inject 0xFF fill padding between SOI and the first segment
    // (T.81 B.1.1.2 allows any number of fill bytes)
    val padded = good.take(2) ++ Array.fill[Byte](3)(0xff.toByte) ++ good.drop(2)
    val (w, h, _, _) = Jpeg.decodePixels(padded)
    assert(w == 16 && h == 16)
    assert(Jpeg.looksDecodable(good) && Jpeg.looksDecodable(padded))
    // a progressive (SOF2) stream is VALID jpeg we cannot decode: the
    // sniff must say no (so the feature dispatch stubs instead of dying)
    val progressive = good.clone()
    val sofAt = progressive.sliding(2).indexWhere(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc0)
    progressive(sofAt + 1) = 0xc2.toByte
    assert(!Jpeg.looksDecodable(progressive))
    intercept[IllegalArgumentException](Jpeg.decodePixels(progressive))
    assert(!Jpeg.looksDecodable(Array[Byte](1, 2, 3)))
    assert(!Jpeg.looksDecodable(good.take(6))) // truncated before any SOF
  }

  test("corrupt payloads fail loudly, not silently") {
    intercept[IllegalArgumentException](Jpeg.decodePixels(Array[Byte](1, 2, 3)))
    val good = Jpeg.encodeJpeg(gradient(16, 16), 16, 16)
    intercept[IllegalArgumentException](Jpeg.decodePixels(good.take(8))) // truncated pre-SOS
  }
}
