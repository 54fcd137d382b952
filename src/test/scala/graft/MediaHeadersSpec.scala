package graft

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{MediaFixtures, MediaHeaders}
import graft.llm.MediaHeaders.MediaMeta

/** Proves the byte-level header parser against REAL encoder output —
  * `javax.imageio.ImageIO` PNG/JPEG/GIF (including an animated GIF
  * written via `writeToSequence`) and `javax.sound.sampled.AudioSystem`
  * WAV — plus the deterministic [[MediaFixtures]] builders, truncation,
  * and garbage. No Spark session needed: this is pure byte logic, the
  * kind that runs inside an executor task.
  */
class MediaHeadersSpec extends AnyFunSuite {

  private def realPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    out.toByteArray
  }

  private def realJpeg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    out.toByteArray
  }

  private def realGif(w: Int, h: Int, frames: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    if (frames == 1) {
      writer.write(new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB))
    } else {
      writer.prepareWriteSequence(null)
      (0 until frames).foreach { _ =>
        writer.writeToSequence(new javax.imageio.IIOImage(
          new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB), null, null),
          writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
    }
    ios.close()
    writer.dispose()
    out.toByteArray
  }

  private def realWav(channels: Int, rate: Int, samples: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      rate.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](samples * channels * 2)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("ImageIO PNG round-trips through the parser") {
    // ImageIO writes TYPE_INT_RGB as 8-bit truecolor (color type 2)
    assert(MediaHeaders.sniff(realPng(17, 23)) ===
      Some(MediaMeta("png", Some(17), Some(23), Some(1), Some(3), None, Some(8))))
    assert(MediaHeaders.sniff(realPng(1, 1)) ===
      Some(MediaMeta("png", Some(1), Some(1), Some(1), Some(3), None, Some(8))))
  }

  test("ImageIO JPEG round-trips through the parser (SOF scan past APP/DQT/DHT)") {
    // baseline JFIF: 8-bit precision, 3 components (YCbCr)
    assert(MediaHeaders.sniff(realJpeg(640, 481)) ===
      Some(MediaMeta("jpeg", Some(640), Some(481), Some(1), Some(3), None, Some(8))))
    assert(MediaHeaders.sniff(realJpeg(3, 2)) ===
      Some(MediaMeta("jpeg", Some(3), Some(2), Some(1), Some(3), None, Some(8))))
  }

  test("ImageIO GIF: single frame and animated sequence frame counts") {
    // ImageIO's logical-screen color resolution varies by writer
    // version, so the GIF assertions check the parsed fields, not the
    // whole meta
    val still = MediaHeaders.sniff(realGif(12, 9, 1))
    assert(still.map(_.format) === Some("gif"))
    assert(still.flatMap(_.width) === Some(12))
    assert(still.flatMap(_.height) === Some(9))
    assert(still.flatMap(_.frames) === Some(1))
    assert(still.flatMap(_.bitDepth).exists(b => b >= 1 && b <= 8))
    val anim = MediaHeaders.sniff(realGif(12, 9, 4))
    assert(anim.map(_.format) === Some("gif"))
    assert(anim.flatMap(_.frames) === Some(4))
  }

  test("AudioSystem WAV round-trips channels / rate / sample frames") {
    assert(MediaHeaders.sniff(realWav(2, 16000, 777)) ===
      Some(MediaMeta("wav", None, None, Some(777), Some(2), Some(16000), Some(16))))
    assert(MediaHeaders.sniff(realWav(1, 44100, 1)) ===
      Some(MediaMeta("wav", None, None, Some(1), Some(1), Some(44100), Some(16))))
  }

  test("fixture builders parse back to their formulas with closed-form sizes") {
    for (w <- Seq(1, 17, 512); h <- Seq(1, 30, 512); extra <- Seq(0, 8, 39)) {
      val png = MediaFixtures.pngBytes(w, h, extra)
      assert(png.length === 57 + extra)
      assert(MediaHeaders.sniff(png) ===
        Some(MediaMeta("png", Some(w), Some(h), Some(1), Some(3), None, Some(8))))
    }
    for (w <- Seq(16, 641, 1015); h <- Seq(16, 480, 1015)) {
      val jpg = MediaFixtures.jpegBytes(w, h)
      assert(jpg.length === 59)
      assert(MediaHeaders.sniff(jpg) ===
        Some(MediaMeta("jpeg", Some(w), Some(h), Some(1), Some(3), None, Some(8))))
    }
    for (w <- Seq(1, 128, 256); f <- Seq(1, 7, 12)) {
      val gif = MediaFixtures.gifBytes(w, w, f)
      assert(gif.length === 14 + 17 * f)
      assert(MediaHeaders.sniff(gif) ===
        Some(MediaMeta("gif", Some(w), Some(w), Some(f), None, None, Some(1))))
    }
    for (ch <- Seq(1, 2); rate <- Seq(8000, 16000, 44100);
         n <- Seq(0, 64, 4159)) {
      val wav = MediaFixtures.wavBytes(ch, rate, n)
      assert(wav.length === 44 + n * ch * 2)
      assert(MediaHeaders.sniff(wav) ===
        Some(MediaMeta("wav", None, None, Some(n), Some(ch), Some(rate), Some(16))))
    }
  }

  test("garbage and truncation yield None, never fabricated dimensions") {
    assert(MediaHeaders.sniff(null) === None)
    assert(MediaHeaders.sniff(Array.emptyByteArray) === None)
    assert(MediaHeaders.sniff("plain text payload".getBytes("UTF-8")) === None)
    // PNG signature but no IHDR
    assert(MediaHeaders.sniff(realPng(5, 5).take(20)) === None)
    // JPEG cut before any SOF marker
    assert(MediaHeaders.sniff(realJpeg(5, 5).take(12)) === None)
    // GIF with the block stream cut mid-frame (no trailer reached)
    val gif = MediaFixtures.gifBytes(8, 8, 3)
    assert(MediaHeaders.sniff(gif.take(gif.length - 20)) === None)
    // WAV whose declared data size extends past the payload
    val wav = MediaFixtures.wavBytes(2, 8000, 100)
    assert(MediaHeaders.sniff(wav.take(wav.length - 10)) === None)
    // RIFF but not WAVE
    val avi = wav.clone(); avi(8) = 'A'; avi(9) = 'V'; avi(10) = 'I'
    assert(MediaHeaders.sniff(avi) === None)
    // zero-dimension PNG is rejected
    val zpng = MediaFixtures.pngBytes(1, 1, 0).clone()
    zpng(16) = 0; zpng(17) = 0; zpng(18) = 0; zpng(19) = 0
    assert(MediaHeaders.sniff(zpng) === None)
  }
}
