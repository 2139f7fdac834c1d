package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Real `javax.imageio` decode paths beyond what the mm_decode /
  * mm_phash_img oracle gates hash-check (those prove PNG encode→decode is
  * pixel-exact end-to-end against arithmetic ground truth): the other
  * JDK-shipped codecs decode through the same entry point, and corrupt
  * bytes take the quarantine branch instead of failing the task.
  */
class ImageCodecSpec extends AnyFunSuite {

  private def rgbOf(img: java.awt.image.BufferedImage, x: Int, y: Int) = {
    val p = img.getRGB(x, y)
    (((p >> 16) & 0xff), ((p >> 8) & 0xff), (p & 0xff))
  }

  test("PNG roundtrip is pixel-exact against the paint formula") {
    val img = Multimodal.decodeImage(Multimodal.synthPng(7L)).get
    assert(img.getWidth == Multimodal.ImgW && img.getHeight == Multimodal.ImgH)
    for (y <- 0 until Multimodal.ImgH; x <- 0 until Multimodal.ImgW)
      assert(rgbOf(img, x, y) == Multimodal.synthRgb(7L, x, y),
        s"pixel ($x,$y) diverged after PNG roundtrip")
  }

  private def encode(fmt: String, docId: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      Multimodal.ImgW, Multimodal.ImgH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until Multimodal.ImgH; x <- 0 until Multimodal.ImgW) {
      val (r, g, b) = Multimodal.synthRgb(docId, x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("BMP roundtrip is pixel-exact (second lossless codec)") {
    val img = Multimodal.decodeImage(encode("bmp", 11L)).get
    assert(img.getWidth == Multimodal.ImgW && img.getHeight == Multimodal.ImgH)
    for (y <- 0 until Multimodal.ImgH; x <- 0 until Multimodal.ImgW)
      assert(rgbOf(img, x, y) == Multimodal.synthRgb(11L, x, y))
  }

  test("JPEG decodes with correct dimensions and bounded lossy error") {
    val img = Multimodal.decodeImage(encode("jpg", 3L)).get
    assert(img.getWidth == Multimodal.ImgW && img.getHeight == Multimodal.ImgH)
    // lossy: assert every channel is within a generous DCT error band
    for (y <- 0 until Multimodal.ImgH; x <- 0 until Multimodal.ImgW) {
      val (r, g, b) = rgbOf(img, x, y)
      val (er, eg, eb) = Multimodal.synthRgb(3L, x, y)
      assert(math.abs(r - er).max(math.abs(g - eg)).max(math.abs(b - eb)) <= 128,
        s"JPEG error out of band at ($x,$y)")
    }
  }

  test("GIF decodes with correct dimensions (palette-quantized)") {
    val img = Multimodal.decodeImage(encode("gif", 5L)).get
    assert(img.getWidth == Multimodal.ImgW && img.getHeight == Multimodal.ImgH)
  }

  test("corrupt bytes quarantine to None, never throw") {
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(Array.empty[Byte]).isEmpty)
    // a PNG header with a truncated body must not escape as an exception
    val truncated = Multimodal.synthPng(1L).take(20)
    assert(Multimodal.decodeImage(truncated).isEmpty)
  }

  test("WAV roundtrip is sample-exact against the paint formula") {
    val samples = Multimodal.decodeWav(Multimodal.synthWav(13L)).get
    assert(samples.length == Multimodal.WavN)
    for (i <- 0 until Multimodal.WavN)
      assert(samples(i) == Multimodal.synthSample(13L, i),
        s"sample $i diverged after WAV roundtrip")
  }

  test("corrupt WAV bytes quarantine to None, never throw") {
    assert(Multimodal.decodeWav("not audio".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeWav(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeWav(Multimodal.synthWav(2L).take(30)).isEmpty)
  }

  test("JDK µ-law converter ≡ the G.711 expansion formula, all 256 codes") {
    // one clip containing every µ-law code once, decoded by the REAL
    // javax.sound.sampled ULAW→PCM codec; the formula (and therefore the
    // mm_ulaw oracle's SQL replay of it) must match sample-exact
    val codes = Array.tabulate(256)(identity)
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(codes.map(_.toByte)), fmt, 256L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val got = Multimodal.decodeCompandedWav(bos.toByteArray).get
    assert(got.length == 256)
    for (c <- 0 until 256)
      assert(got(c) == Multimodal.ulawExpand(c),
        s"µ-law code $c: JDK=${got(c)} formula=${Multimodal.ulawExpand(c)}")
  }

  test("JDK A-law converter ≡ the G.711 expansion formula, all 256 codes") {
    val codes = Array.tabulate(256)(identity)
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.ALAW, 8000f, 8, 1, 1, 8000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(codes.map(_.toByte)), fmt, 256L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val got = Multimodal.decodeCompandedWav(bos.toByteArray).get
    assert(got.length == 256)
    for (c <- 0 until 256)
      assert(got(c) == Multimodal.alawExpand(c),
        s"A-law code $c: JDK=${got(c)} formula=${Multimodal.alawExpand(c)}")
  }

  test("µ-law clip roundtrip matches formula; corrupt/PCM payloads quarantine") {
    val samples = Multimodal.decodeCompandedWav(Multimodal.synthUlaw(13L)).get
    assert(samples.length == Multimodal.UlawN)
    for (i <- 0 until Multimodal.UlawN)
      assert(samples(i) ==
        Multimodal.ulawExpand(Multimodal.synthUlawByte(13L, i)),
        s"sample $i diverged after µ-law roundtrip")
    assert(Multimodal.decodeCompandedWav("not audio".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeCompandedWav(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeCompandedWav(Multimodal.synthUlaw(2L).take(30)).isEmpty)
    // a LINEAR-PCM wav is not companded: this decoder must reject it
    // (and decodeWav must reject the companded one) — no cross-decode
    assert(Multimodal.decodeCompandedWav(Multimodal.synthWav(3L)).isEmpty)
    assert(Multimodal.decodeWav(Multimodal.synthUlaw(3L)).isEmpty)
  }

  test("A-law clip roundtrip matches formula; PCM payload quarantines") {
    val samples = Multimodal.decodeCompandedWav(Multimodal.synthAlaw(13L)).get
    assert(samples.length == Multimodal.UlawN)
    for (i <- 0 until Multimodal.UlawN)
      assert(samples(i) ==
        Multimodal.alawExpand(Multimodal.synthAlawByte(13L, i)),
        s"sample $i diverged after A-law roundtrip")
    assert(Multimodal.decodeWav(Multimodal.synthAlaw(3L)).isEmpty)
  }

  test("animated-GIF roundtrip is frame- and pixel-exact (≤256-color palette)") {
    val frames = Multimodal.decodeGifFrames(Multimodal.synthGif(9L)).get
    assert(frames.size == Multimodal.GifF)
    for (f <- 0 until Multimodal.GifF; y <- 0 until Multimodal.GifH;
         x <- 0 until Multimodal.GifW)
      assert((frames(f).getRGB(x, y) & 0xffffff) ==
        Multimodal.gifPalette(Multimodal.gifIndex(9L, f, x, y)),
        s"frame $f pixel ($x,$y) diverged after GIF roundtrip")
  }

  test("corrupt GIF bytes quarantine to None, never throw") {
    assert(Multimodal.decodeGifFrames("not a gif".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeGifFrames(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeGifFrames(Multimodal.synthGif(1L).take(25)).isEmpty)
  }
}
