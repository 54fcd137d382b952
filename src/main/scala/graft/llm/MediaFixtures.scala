package graft.llm

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32

/** Deterministic builders for real-format media payloads — correct
  * signatures, chunk layouts, marker segments, and CRCs, with filler
  * pixel/sample data. [[MediaHeaders]] (and any spec-conformant header
  * reader) recovers the exact dimensions written here, which is what
  * lets the DuckDB oracle certify the build→parse round trip by
  * computing the same dimension formulas directly.
  *
  * Byte sizes are closed-form (mirrored in the oracles):
  * PNG = 57 + idatLen, JPEG = 59, GIF = 14 + 17·frames,
  * WAV = 44 + samples·channels·2.
  */
object MediaFixtures {

  /** PNG: signature, IHDR (8-bit truecolor), one IDAT of `idatLen`
    * deterministic filler bytes, IEND — all chunk CRCs valid.
    */
  def pngBytes(width: Int, height: Int, idatLen: Int): Array[Byte] = {
    require(width > 0 && height > 0 && idatLen >= 0)
    val out = new ByteArrayOutputStream(57 + idatLen)
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width)
    putBe32(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT",
      Array.tabulate[Byte](idatLen)(i => ((i * 31 + 7) & 0xff).toByte))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeChunk(out: ByteArrayOutputStream, kind: String,
                         data: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    putBe32(len, 0, data.length)
    out.write(len)
    val kindBytes = kind.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(kindBytes)
    out.write(data)
    val crc = new CRC32
    crc.update(kindBytes)
    crc.update(data)
    val crcOut = new Array[Byte](4)
    putBe32(crcOut, 0, crc.getValue.toInt)
    out.write(crcOut)
  }

  /** JPEG: SOI, JFIF APP0, baseline SOF0 (3 components), SOS, four
    * entropy filler bytes, EOI — 59 bytes total, dims in the SOF0.
    */
  def jpegBytes(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff)
    val out = new ByteArrayOutputStream(59)
    out.write(Array(0xff, 0xd8).map(_.toByte)) // SOI
    out.write(Array(0xff, 0xe0, 0x00, 0x10).map(_.toByte)) // APP0 len 16
    out.write("JFIF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(Array(0x00, 0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00,
      0x00).map(_.toByte)) // version 1.1, no density, no thumbnail
    out.write(Array(0xff, 0xc0, 0x00, 0x11, 0x08, // SOF0 len 17, 8-bit
      (height >> 8) & 0xff, height & 0xff,
      (width >> 8) & 0xff, width & 0xff,
      0x03, // 3 components
      0x01, 0x11, 0x00, 0x02, 0x11, 0x00, 0x03, 0x11, 0x00).map(_.toByte))
    out.write(Array(0xff, 0xda, 0x00, 0x0c, 0x03, // SOS len 12
      0x01, 0x00, 0x02, 0x00, 0x03, 0x00, 0x00, 0x3f, 0x00).map(_.toByte))
    out.write(Array(0x12, 0x34, 0x56, 0x78).map(_.toByte)) // entropy filler
    out.write(Array(0xff, 0xd9).map(_.toByte)) // EOI
    out.toByteArray
  }

  /** GIF89a: logical screen descriptor (no global color table), `frames`
    * image descriptors each with a minimal LZW sub-block chain, trailer.
    */
  def gifBytes(width: Int, height: Int, frames: Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff)
    require(frames > 0)
    val out = new ByteArrayOutputStream(14 + 17 * frames)
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(Array(width & 0xff, (width >> 8) & 0xff,
      height & 0xff, (height >> 8) & 0xff,
      0x00, 0x00, 0x00).map(_.toByte)) // no GCT, bg 0, square pixels
    var f = 0
    while (f < frames) {
      out.write(Array(0x2c, // image separator
        0x00, 0x00, 0x00, 0x00, // left, top
        width & 0xff, (width >> 8) & 0xff,
        height & 0xff, (height >> 8) & 0xff,
        0x00, // no local color table
        0x02, // LZW min code size
        0x04, 0x84, 0x51 + (f & 0x7f), 0x00, 0x01, // one 4-byte sub-block
        0x00 // sub-block terminator
      ).map(_.toByte))
      f += 1
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Canonical 44-byte-header PCM WAV: RIFF/WAVE, 16-byte `fmt `,
    * `data` of `samples` 16-bit frames of silence.
    */
  def wavBytes(channels: Int, sampleRate: Int, samples: Int): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && samples >= 0)
    val block = channels * 2
    val dataSize = samples * block
    val out = new ByteArrayOutputStream(44 + dataSize)
    def s(x: String): Unit =
      out.write(x.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    def le16(v: Int): Unit = out.write(Array(v & 0xff, (v >> 8) & 0xff)
      .map(_.toByte))
    def le32(v: Int): Unit = out.write(Array(v & 0xff, (v >> 8) & 0xff,
      (v >> 16) & 0xff, (v >> 24) & 0xff).map(_.toByte))
    s("RIFF"); le32(36 + dataSize); s("WAVE")
    s("fmt "); le32(16); le16(1) // PCM
    le16(channels); le32(sampleRate); le32(sampleRate * block)
    le16(block); le16(16)
    s("data"); le32(dataSize)
    out.write(new Array[Byte](dataSize))
    out.toByteArray
  }

  /** Minimal valid ISO-BMFF/MP4: `ftyp` (major brand + 'isom','mp41'
    * compatibles, 24 bytes), `moov` holding a version-0 `mvhd`
    * (timescale/duration, 108 bytes) and `nTraks` `trak` boxes each
    * holding only a version-0 `tkhd` (92 bytes; track 1 carries the
    * video dimensions as 16.16 fixed-point, the rest declare 0×0 like
    * audio tracks), then an 8+16-byte `mdat` of deterministic filler.
    * Closed-form size (mirrored in the oracle):
    * 24 + 8 + 108 + 100·nTraks + 24.
    */
  def mp4Bytes(brand: String, timescale: Int, duration: Long, width: Int,
               height: Int, nTraks: Int): Array[Byte] = {
    require(brand.length == 4, s"brand=$brand")
    require(timescale > 0 && duration >= 0 && duration <= 0xffffffffL)
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff)
    require(nTraks > 0)
    val out = new ByteArrayOutputStream(164 + 100 * nTraks)
    def s(x: String): Unit =
      out.write(x.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    def b32(v: Long): Unit = {
      val a = new Array[Byte](4); putBe32(a, 0, v.toInt); out.write(a)
    }
    val identityMatrix: () => Unit = () => {
      b32(0x00010000L); b32(0); b32(0)
      b32(0); b32(0x00010000L); b32(0)
      b32(0); b32(0); b32(0x40000000L)
    }
    // ftyp: major brand, minor version 0, compatible brands isom+mp41
    b32(24); s("ftyp"); s(brand); b32(0); s("isom"); s("mp41")
    // moov
    b32(8 + 108 + 100L * nTraks); s("moov")
    //   mvhd v0
    b32(108); s("mvhd"); b32(0) // version 0, flags 0
    b32(0); b32(0) // creation, modification
    b32(timescale); b32(duration)
    b32(0x00010000L) // rate 1.0
    out.write(Array(0x01, 0x00, 0x00, 0x00).map(_.toByte)) // volume+reserved
    b32(0); b32(0) // reserved u32[2]
    identityMatrix()
    (0 until 6).foreach(_ => b32(0)) // pre_defined
    b32(nTraks + 1L) // next_track_ID
    //   trak boxes (tkhd only)
    (1 to nTraks).foreach { tid =>
      b32(100); s("trak")
      b32(92); s("tkhd"); b32(7) // version 0, flags: enabled|movie|preview
      b32(0); b32(0) // creation, modification
      b32(tid.toLong) // track_ID
      b32(0) // reserved
      b32(duration)
      b32(0); b32(0) // reserved u32[2]
      b32(0) // layer + alternate_group
      b32(0) // volume + reserved
      identityMatrix()
      if (tid == 1) { b32(width.toLong << 16); b32(height.toLong << 16) }
      else { b32(0); b32(0) }
    }
    // mdat: 16 deterministic filler bytes
    b32(24); s("mdat")
    out.write(Array.tabulate[Byte](16)(i => ((i * 29 + 3) & 0xff).toByte))
    out.toByteArray
  }

  private def putBe32(a: Array[Byte], i: Int, v: Int): Unit = {
    a(i) = ((v >> 24) & 0xff).toByte
    a(i + 1) = ((v >> 16) & 0xff).toByte
    a(i + 2) = ((v >> 8) & 0xff).toByte
    a(i + 3) = (v & 0xff).toByte
  }
}
