package graft.functions

import java.util.zip.{CRC32, Deflater}

/** Deterministic in-JVM media fixture builders.
  *
  * The corpus has no real media table (repo:TESTDATA.md), so multimodal
  * queries plant synthetic payloads on `documents` rows. These builders
  * produce REAL, spec-conformant bytes — a PNG any decoder accepts and an
  * uncompressed RIFF/AVI any demuxer accepts — so the decode path under
  * test is the production one, not a fixture-shaped shortcut. Everything
  * is byte-deterministic given the inputs (the only compressor used is
  * the JDK Deflater at a pinned level), which keeps planted payloads
  * stable across runs for the DuckDB oracle.
  */
object MediaGen {

  private def be32(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)

  private def chunkPng(tag: String, body: Array[Byte]): Array[Byte] = {
    val crc = new CRC32
    val t = tag.getBytes("US-ASCII")
    crc.update(t); crc.update(body)
    be32(body.length) ++ t ++ body ++ be32(crc.getValue.toInt)
  }

  /** An 8-bit grayscale PNG: `pixels(y)(x)` are 0-255 luma values.
    * Scanlines use filter 0; IDAT is zlib at BEST_COMPRESSION (pinned so
    * the byte stream, not just the decoded raster, is deterministic). */
  def grayPng(pixels: Array[Array[Int]]): Array[Byte] = {
    val h = pixels.length
    val w = pixels.head.length
    val raw = new Array[Byte](h * (w + 1))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raw(y * (w + 1) + 1 + x) = pixels(y)(x).toByte
        x += 1
      }
      y += 1
    }
    val d = new Deflater(Deflater.BEST_COMPRESSION)
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val n = d.deflate(buf)
    d.end()
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 0, 0, 0, 0)
    Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunkPng("IHDR", ihdr) ++
      chunkPng("IDAT", buf.take(n)) ++
      chunkPng("IEND", Array.empty[Byte])
  }

  /** A grayscale PNG of constant luma `v` — the flat frames the video
    * fixture uses, so each decoded frame's mean luma IS `v`. */
  def flatGrayPng(w: Int, h: Int, v: Int): Array[Byte] =
    grayPng(Array.fill(h)(Array.fill(w)(v)))

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def list(listType: String, body: Array[Byte]): Array[Byte] =
    fourcc("LIST") ++ le32(body.length + 4) ++ fourcc(listType) ++ body

  private def chunkAvi(tag: String, body: Array[Byte]): Array[Byte] = {
    val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
    fourcc(tag) ++ le32(body.length) ++ body ++ pad
  }

  /** A minimal but well-formed RIFF/AVI container holding the given
    * video frames as `00dc` chunks (compressed-frame fourcc — the frames
    * we plant are PNG payloads standing in for MJPEG, exercising the
    * per-frame image decode). Headers carry the real width/height/count
    * so a demuxer that trusts `avih` agrees with one that walks `movi`. */
  def avi(frames: Seq[Array[Byte]], width: Int, height: Int): Array[Byte] = {
    val avih = le32(40000) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(width) ++ le32(height) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = fourcc("vids") ++ fourcc("MJPG") ++ le32(0) ++ le16(0) ++
      le16(0) ++ le32(0) ++ le32(1) ++ le32(25) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(-1) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(width) ++ le16(height)
    val strf = le32(40) ++ le32(width) ++ le32(height) ++ le16(1) ++
      le16(24) ++ fourcc("MJPG") ++ le32(width * height * 3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunkAvi("avih", avih) ++
        list("strl", chunkAvi("strh", strh) ++ chunkAvi("strf", strf)))
    val movi = list("movi",
      frames.flatMap(f => chunkAvi("00dc", f)).toArray)
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  /** A minimal canonical WAV: RIFF/WAVE with a 16-byte PCM `fmt ` chunk
    * (16-bit, mono, little-endian) and the samples as one `data` chunk —
    * exactly the container `javax.sound.sampled.AudioSystem` reads with
    * no codec beyond the JDK. */
  def wav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = le16(1) ++ le16(1) ++ le32(sampleRate) ++
      le32(sampleRate * 2) ++ le16(2) ++ le16(16)
    val body = fourcc("WAVE") ++
      fourcc("fmt ") ++ le32(fmt.length) ++ fmt ++
      fourcc("data") ++ le32(data.length) ++ data
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  private def be16(v: Int): Array[Byte] =
    Array(((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** A minimal JPEG carrying a little-endian EXIF APP1 segment —
    * SOI, APP1("Exif\0\0" + TIFF: "II"+42, IFD0 with ImageWidth /
    * ImageLength / Orientation / Make), SOF0 with the frame dims, EOI.
    * Not decodable (no scan data — none is needed: q388 is a
    * metadata WALK, not a decode), but marker- and TIFF-conformant so
    * the byte arithmetic under test is the real format's. `make` must
    * be ≤ 3 ASCII chars (inline IFD value). */
  def jpegExif(width: Int, height: Int, orientation: Int,
      make: String): Array[Byte] = {
    require(make.length <= 3, "make must fit the inline IFD value")
    def entry(tag: Int, tpe: Int, count: Int,
        value: Array[Byte]): Array[Byte] =
      le16(tag) ++ le16(tpe) ++ le32(count) ++ value.padTo(4, 0.toByte)
    val makeBytes = make.getBytes("US-ASCII") :+ 0.toByte
    val ifd0 = le16(4) ++
      entry(0x0100, 3, 1, le16(width)) ++
      entry(0x0101, 3, 1, le16(height)) ++
      entry(0x010f, 2, makeBytes.length, makeBytes) ++
      entry(0x0112, 3, 1, le16(orientation)) ++
      le32(0)
    val tiff = "II".getBytes("US-ASCII") ++ le16(42) ++ le32(8) ++ ifd0
    val exif = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val app1 = Array(0xff.toByte, 0xe1.toByte) ++
      be16(exif.length + 2) ++ exif
    val sof0 = Array(0xff.toByte, 0xc0.toByte) ++ be16(11) ++
      Array[Byte](8) ++ be16(height) ++ be16(width) ++
      Array[Byte](1, 1, 0x11, 0)
    Array(0xff.toByte, 0xd8.toByte) ++ app1 ++ sof0 ++
      Array(0xff.toByte, 0xd9.toByte)
  }

  /** A minimal GIF89a: logical screen descriptor with a 2-entry global
    * color table, then per frame a graphic-control extension + image
    * descriptor + a tiny LZW body, then the trailer — the block
    * grammar q392's walk parses. */
  def gif(width: Int, height: Int, nFrames: Int): Array[Byte] = {
    val lsd = le16(width) ++ le16(height) ++
      Array(0xf0.toByte, 0.toByte, 0.toByte)
    val gct = Array[Byte](0, 0, 0, -1, -1, -1)
    val frame =
      Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0) ++  // GCE
      Array[Byte](0x2c) ++ le16(0) ++ le16(0) ++            // image desc
        le16(width) ++ le16(height) ++ Array[Byte](0) ++
      Array[Byte](2, 2, 0x4c, 0x01, 0)                      // LZW body
    "GIF89a".getBytes("US-ASCII") ++ lsd ++ gct ++
      (0 until nFrames).flatMap(_ => frame).toArray ++
      Array[Byte](0x3b)
  }

  /** A minimal BMP: BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER + raw
    * pixel rows. `topDown` plants a NEGATIVE height (the format's
    * top-down flag) so q392's signed little-endian decode is
    * exercised, not just assumed. */
  def bmp(width: Int, height: Int, topDown: Boolean,
      bpp: Int): Array[Byte] = {
    val rowBytes = (width * (bpp / 8) + 3) / 4 * 4
    val pixels = new Array[Byte](rowBytes * height)
    val info = le32(40) ++ le32(width) ++
      le32(if (topDown) -height else height) ++
      le16(1) ++ le16(bpp) ++ le32(0) ++ le32(pixels.length) ++
      le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0)
    val offset = 14 + info.length
    "BM".getBytes("US-ASCII") ++ le32(offset + pixels.length) ++
      le16(0) ++ le16(0) ++ le32(offset) ++ info ++ pixels
  }

  /** A minimal MP3 head: ID3v2.3 tag (syncsafe tag size, one TIT2
    * text frame) followed by one MPEG frame-sync header — the
    * container prefix q393's syncsafe decode parses. */
  def id3(title: String): Array[Byte] = {
    val t = title.getBytes("US-ASCII")
    val frame = "TIT2".getBytes("US-ASCII") ++ be32(t.length + 1) ++
      Array[Byte](0, 0, 0) ++ t
    val size = frame.length
    val syncsafe = Array(((size >>> 21) & 0x7f).toByte,
      ((size >>> 14) & 0x7f).toByte, ((size >>> 7) & 0x7f).toByte,
      (size & 0x7f).toByte)
    "ID3".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0) ++ syncsafe ++
      frame ++ Array(0xff.toByte, 0xfb.toByte, 0x90.toByte, 0.toByte)
  }

  /** A bare MPEG audio frame header (4 bytes) + 8 payload bytes — the
    * sync-word grammar q396 decodes when no ID3 tag precedes it.
    * MPEG-1 Layer III: version bits 11, layer bits 01, no CRC. */
  def mpeg(bitrateIdx: Int, srIdx: Int, padding: Boolean,
      mono: Boolean): Array[Byte] = {
    val b1 = 0xff
    val b2 = 0xfb                       // 1111 1011: MPEG1, L3, no CRC
    val b3 = ((bitrateIdx & 0xf) << 4) | ((srIdx & 0x3) << 2) |
      (if (padding) 2 else 0)
    val b4 = (if (mono) 0xc0 else 0x00) // channel mode bits 7-6
    Array(b1.toByte, b2.toByte, b3.toByte, b4.toByte) ++
      Array.fill(8)(0x55.toByte)
  }

  /** A minimal ZIP: STORED (method 0) entries, pinned DOS time/date,
    * local headers + central directory + end-of-central-directory —
    * hand-rolled so every byte is deterministic (java.util.zip's
    * writer stamps wall-clock mtimes). The archive grammar q397 walks
    * backwards from the EOCD. */
  def zip(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val dosTime = le16(0x6020) // 12:01:00
    val dosDate = le16(0x5821) // 2024-01-01
    val crc = new CRC32
    val locals = new scala.collection.mutable.ArrayBuffer[Byte]
    val centrals = new scala.collection.mutable.ArrayBuffer[Byte]
    entries.foreach { case (name, data) =>
      val off = locals.length
      crc.reset(); crc.update(data)
      val c = le32(crc.getValue.toInt)
      val n = name.getBytes("US-ASCII")
      locals ++= fourcc("PK") ++ Array[Byte](3, 4) ++ le16(20) ++
        le16(0) ++ le16(0) ++ dosTime ++ dosDate ++ c ++
        le32(data.length) ++ le32(data.length) ++ le16(n.length) ++
        le16(0) ++ n ++ data
      centrals ++= fourcc("PK") ++ Array[Byte](1, 2) ++ le16(20) ++
        le16(20) ++ le16(0) ++ le16(0) ++ dosTime ++ dosDate ++ c ++
        le32(data.length) ++ le32(data.length) ++ le16(n.length) ++
        le16(0) ++ le16(0) ++ le16(0) ++ le16(0) ++ le32(0) ++
        le32(off)
    }
    val eocd = fourcc("PK") ++ Array[Byte](5, 6) ++ le16(0) ++
      le16(0) ++ le16(entries.length) ++ le16(entries.length) ++
      le32(centrals.length) ++ le32(locals.length) ++ le16(0)
    locals.toArray ++ centrals.toArray ++ eocd
  }

  def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02X").mkString
}
