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

  def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02X").mkString
}
