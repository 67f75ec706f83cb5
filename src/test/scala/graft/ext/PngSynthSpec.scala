package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r13 hand-assembled synthetic containers to the real JDK
  * decoders: [[Multimodal.syntheticPng]] (minimal grayscale PNG written
  * without ImageIO) must decode via `ImageIO.read` to exactly the pixel
  * formula, and [[Multimodal.syntheticWav]] (hand-written 44-byte RIFF
  * header) must decode via the javax.sound path to exactly the sample
  * formula — the properties every multimodal oracle rests on.
  */
class PngSynthSpec extends AnyFunSuite {

  test("hand-assembled PNG decodes via ImageIO to the exact pixel formula") {
    for (id <- Seq(0L, 1L, 7L, 8L, 63L, 64L, 1234L, 99999L)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.syntheticPng(id)))
      assert(img != null, s"id=$id: not a decodable PNG")
      val w = 8 + (id % 8).toInt
      val h = 8 + ((id / 8) % 8).toInt
      assert(img.getWidth === w && img.getHeight === h, s"id=$id dims")
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        assert(raster.getSample(x, y, 0) ===
          ((id * 31 + x * 7 + y * 13) % 256).toInt,
          s"id=$id pixel ($x,$y)")
    }
  }

  test("hand-written WAV decodes via javax.sound to the exact sample formula") {
    for (id <- Seq(0L, 1L, 63L, 64L, 127L, 5000L)) {
      val (fmt, samples) = Multimodal.wavSamples(Multimodal.syntheticWav(id))
        .getOrElse(fail(s"id=$id: not decodable 8-bit unsigned PCM WAV"))
      assert(fmt.getSampleRate.toInt === 8000)
      assert(fmt.getChannels === 1)
      val n = 64 + (id % 64).toInt
      assert(samples.length === n)
      for (i <- 0 until n)
        assert(samples(i) === ((id * 17 + i * 29) % 256).toInt,
          s"id=$id sample $i")
    }
  }
}
