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

  // ---- MP4 / ISO-BMFF -----------------------------------------------------

  test("MP4 fixture round-trips brand / duration / tracks / tkhd dims") {
    for (ts <- Seq(600, 1000, 90000); k <- Seq(1, 2, 3)) {
      val dur = ts.toLong * 7 + 123
      val p = MediaFixtures.mp4Bytes("isom", ts, dur, 640, 480, k)
      assert(p.length === 164 + 100 * k) // closed-form size
      assert(MediaHeaders.sniff(p) ===
        Some(MediaMeta("mp4", Some(640), Some(480), None, None, None, None,
          Some("isom"), Some(dur * 1000L / ts), Some(k))))
    }
    // a different brand survives; dims come from track 1 only
    assert(MediaHeaders.sniff(
      MediaFixtures.mp4Bytes("mp42", 1000, 2500L, 1, 65535, 3)) ===
      Some(MediaMeta("mp4", Some(1), Some(65535), None, None, None, None,
        Some("mp42"), Some(2500L), Some(3))))
  }

  /** Spec shapes the fixture builder doesn't emit: version-1 mvhd/tkhd
    * (64-bit times), a 64-bit `largesize` moov, and a size-0
    * to-end-of-file box — built by hand so the parser is proven against
    * ISO/IEC 14496-12's escapes, not just our own writer.
    */
  test("MP4 parser handles v1 boxes, largesize, and size-0 boxes") {
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xffffffffL)
    def s(x: String): Array[Byte] = x.getBytes("US-ASCII")
    val matrix = be32(0x10000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(0x10000L) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0x40000000L)
    // mvhd v1: u64 creation/modification, u32 timescale, u64 duration
    val mvhd1Body = Array(1.toByte, 0.toByte, 0.toByte, 0.toByte) ++
      be64(0) ++ be64(0) ++ be32(90000) ++ be64(450000L) ++
      be32(0x10000L) ++ Array[Byte](1, 0, 0, 0) ++ be64(0) ++ matrix ++
      new Array[Byte](24) ++ be32(2)
    val mvhd1 = be32(8L + mvhd1Body.length) ++ s("mvhd") ++ mvhd1Body
    // tkhd v1: u64 creation/modification/duration
    val tkhd1Body = Array(1.toByte, 0.toByte, 0.toByte, 7.toByte) ++
      be64(0) ++ be64(0) ++ be32(1) ++ be32(0) ++ be64(450000L) ++
      be64(0) ++ be32(0) ++ be32(0) ++ matrix ++
      be32(1920L << 16) ++ be32(1080L << 16)
    val tkhd1 = be32(8L + tkhd1Body.length) ++ s("tkhd") ++ tkhd1Body
    val trak = be32(8L + tkhd1.length) ++ s("trak") ++ tkhd1
    val moovPayload = mvhd1 ++ trak
    val ftyp = be32(24) ++ s("ftyp") ++ s("avc1") ++ be32(0) ++
      s("isom") ++ s("mp41")
    // moov with a 64-bit largesize header (size=1 escape)
    val moovLarge = be32(1) ++ s("moov") ++
      be64(16L + moovPayload.length) ++ moovPayload
    assert(MediaHeaders.sniff(ftyp ++ moovLarge) ===
      Some(MediaMeta("mp4", Some(1920), Some(1080), None, None, None, None,
        Some("avc1"), Some(5000L), Some(1))))
    // size-0 mdat (extends to EOF) after a plain moov
    val moov = be32(8L + moovPayload.length) ++ s("moov") ++ moovPayload
    val mdat0 = be32(0) ++ s("mdat") ++ Array.fill[Byte](10)(0x5a)
    assert(MediaHeaders.sniff(ftyp ++ moov ++ mdat0) ===
      Some(MediaMeta("mp4", Some(1920), Some(1080), None, None, None, None,
        Some("avc1"), Some(5000L), Some(1))))
  }

  test("MP4 corruption yields None: truncation, overrun, missing moov") {
    val ok = MediaFixtures.mp4Bytes("isom", 1000, 3000L, 320, 240, 2)
    // cut inside the moov: child box overruns
    assert(MediaHeaders.sniff(ok.take(100)) === None)
    // ftyp alone (no moov / no mvhd)
    assert(MediaHeaders.sniff(ok.take(24)) === None)
    // box size smaller than a header (moov size bytes 25..28 -> 3)
    val bad = ok.clone(); bad(26) = 0; bad(27) = 3
    assert(MediaHeaders.sniff(bad) === None)
    // zero timescale rejected
    val zts = ok.clone()
    // mvhd timescale bytes 53..56 (1-indexed) -> indices 52..55
    zts(52) = 0; zts(53) = 0; zts(54) = 0; zts(55) = 0
    assert(MediaHeaders.sniff(zts) === None)
  }
}
