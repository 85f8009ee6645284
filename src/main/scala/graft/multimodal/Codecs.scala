package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Real pure-JVM media codecs for the two container formats that need no
  * native libraries: RIFF/WAVE (PCM16) and BMP (24-bit uncompressed).
  * These replace the [[Multimodal.DecodeStub]] for a genuinely decoded
  * end-to-end path: the parsers read geometry/sample data from the
  * container HEADERS AND PAYLOAD — nothing is passed in out-of-band — so
  * an offset, endianness, padding, or row-order bug anywhere in
  * encode∘decode breaks the oracle hash (q156/q157), not just a spec.
  *
  * Both formats are little-endian throughout; parsers walk the container
  * structure the way a production reader would (WAV: generic chunk walk,
  * not fixed offsets; BMP: honors the header-declared pixel-array offset,
  * 4-byte row padding, and bottom-up row order).
  */
object WavCodec {

  /** Decoded facts about a PCM16 WAV: everything from the fmt chunk plus
    * exact integer reductions over the decoded samples (integer, not
    * float, so cross-engine compares are exact).
    */
  case class WavInfo(sampleRate: Long, channels: Long, bits: Long,
                     nFrames: Long, durationMs: Long,
                     peakAbs: Long, sumSq: Long, sumAbs: Long)

  /** Encode interleaved PCM16 frames as a canonical 44-byte-header
    * RIFF/WAVE container. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataLen)
    bb.put("WAVE".getBytes(US_ASCII))
    bb.put("fmt ".getBytes(US_ASCII)).putInt(16)
    bb.putShort(1)                                // audio format: PCM
    bb.putShort(channels.toShort)
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * channels * 2)          // byte rate
    bb.putShort((channels * 2).toShort)           // block align
    bb.putShort(16)                               // bits per sample
    bb.put("data".getBytes(US_ASCII)).putInt(dataLen)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  /** Container layout facts shared by [[decode]] and [[decodeSamples]]:
    * fmt-chunk fields plus the located data chunk. */
  private case class Layout(sampleRate: Int, channels: Int, bits: Int,
                            dataOff: Int, dataLen: Int)

  /** Walk the RIFF chunk list generically (a real-world WAV may carry
    * LIST/fact/cue chunks before `data`; chunk bodies pad to even length
    * per RIFF) and locate fmt + data. */
  private def layout(bytes: Array[Byte]): Layout = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, US_ASCII)
    }
    require(fourCC() == "RIFF", "not a RIFF container")
    bb.getInt() // declared riff size — trust the actual buffer instead
    require(fourCC() == "WAVE", "not a WAVE form")
    var sampleRate = 0; var channels = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (bb.remaining() >= 8 && dataOff < 0) {
      val id = fourCC(); val size = bb.getInt()
      id match {
        case "fmt " =>
          val fmtStart = bb.position()
          val audioFormat = bb.getShort()
          require(audioFormat == 1, s"unsupported WAV format code $audioFormat (PCM only)")
          channels = bb.getShort()
          sampleRate = bb.getInt()
          bb.getInt(); bb.getShort()              // byte rate, block align
          bits = bb.getShort()
          require(bits == 16, s"unsupported bit depth $bits (PCM16 only)")
          bb.position(fmtStart + size + (size & 1))
        case "data" =>
          dataOff = bb.position(); dataLen = size
        case _ =>                                 // skip unknown chunk (even-padded)
          bb.position(bb.position() + size + (size & 1))
      }
    }
    require(dataOff >= 0 && sampleRate > 0 && channels > 0, "missing fmt /data chunk")
    Layout(sampleRate, channels, bits, dataOff, dataLen)
  }

  /** Parse a RIFF/WAVE container and decode its PCM16 payload into exact
    * integer reductions. */
  def decode(bytes: Array[Byte]): WavInfo = {
    val Layout(sampleRate, channels, bits, dataOff, dataLen) = layout(bytes)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nSamples = dataLen / 2
    var peak = 0L; var sumSq = 0L; var sumAbs = 0L
    var i = 0
    while (i < nSamples) {
      val s = bb.getShort(dataOff + 2 * i).toLong
      val a = math.abs(s)
      if (a > peak) peak = a
      sumSq += s * s
      sumAbs += a
      i += 1
    }
    val nFrames = nSamples / channels
    WavInfo(sampleRate.toLong, channels.toLong, bits.toLong, nFrames.toLong,
      nFrames.toLong * 1000L / sampleRate, peak, sumSq, sumAbs)
  }

  /** Parse a RIFF/WAVE container and return the decoded interleaved PCM16
    * samples themselves (same generic chunk walk as [[decode]]) — the
    * entry point for sample-level kernels like the q198 acoustic
    * fingerprint, where the per-window energies must come from bytes READ
    * BACK out of the container, not from the synthesis formula.
    */
  def decodeSamples(bytes: Array[Byte]): Array[Short] = {
    val l = layout(bytes)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Short](l.dataLen / 2)
    var i = 0
    while (i < out.length) { out(i) = bb.getShort(l.dataOff + 2 * i); i += 1 }
    out
  }
}

/** 24-bit uncompressed BMP (BITMAPINFOHEADER): the image twin of
  * [[WavCodec]]. */
object BmpCodec {

  /** Decoded facts: header geometry plus exact per-channel pixel sums
    * (storage order blue, green, red). */
  case class BmpInfo(width: Long, height: Long, bpp: Long,
                     nPixels: Long, fileBytes: Long,
                     sumB: Long, sumG: Long, sumR: Long)

  /** Row stride: pixel rows pad to a 4-byte boundary. */
  private def stride(width: Int): Int = (width * 3 + 3) / 4 * 4

  /** Encode a 24bpp image. The callback is invoked as `px(x, y)` and
    * returns (b, g, r), with y=0 the TOP row; BMP stores rows bottom-up,
    * which the encoder handles.
    */
  def encode(width: Int, height: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowLen = stride(width)
    val dataLen = rowLen * height
    val bb = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
    bb.putInt(0).putInt(54)                       // reserved, pixel-array offset
    bb.putInt(40)                                 // BITMAPINFOHEADER size
    bb.putInt(width).putInt(height)
    bb.putShort(1).putShort(24)                   // planes, bpp
    bb.putInt(0).putInt(dataLen)                  // BI_RGB, image size
    bb.putInt(2835).putInt(2835)                  // 72 DPI
    bb.putInt(0).putInt(0)                        // palette counts
    var y = height - 1                            // bottom-up
    while (y >= 0) {
      val rowStart = bb.position()
      var x = 0
      while (x < width) {
        val (b, g, r) = px(x, y)
        bb.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      bb.position(rowStart + rowLen)              // zero padding already there
      y -= 1
    }
    bb.array()
  }

  /** Header facts shared by [[decode]] and [[decodePixels]]. */
  private case class Header(width: Int, height: Int, pixelOff: Int)

  private def header(bytes: Array[Byte]): Header = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte, "not a BMP")
    bb.getInt(); bb.getInt()                      // file size, reserved
    val pixelOff = bb.getInt()
    val hdrSize = bb.getInt()
    require(hdrSize >= 40, s"unsupported BMP header size $hdrSize")
    val width = bb.getInt(); val height = bb.getInt()
    bb.getShort()                                 // planes
    val bpp = bb.getShort()
    require(bpp == 24, s"unsupported bit depth $bpp (24bpp only)")
    require(bb.getInt() == 0, "compressed BMP unsupported")
    require(height > 0, "top-down BMP unsupported")
    Header(width, height, pixelOff)
  }

  /** A decoded pixel grid: TOP-DOWN row-major, one packed
    * `(r << 16) | (g << 8) | b` int per pixel — the materialized form
    * sample-level kernels (perceptual hashing, resize) consume.
    */
  case class BmpImage(width: Int, height: Int, px: Array[Int])

  /** Parse a 24bpp BMP and return the full decoded pixel grid — same
    * header walk as [[decode]], but materializing every pixel (top-down,
    * undoing the container's bottom-up padded rows). The entry point for
    * pixel-level kernels like the q197 perceptual hash, where the hash
    * must be computed from bytes READ BACK out of the container.
    */
  def decodePixels(bytes: Array[Byte]): BmpImage = {
    val Header(width, height, pixelOff) = header(bytes)
    val rowLen = stride(width)
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val off = pixelOff + (height - 1 - y) * rowLen
      var x = 0
      while (x < width) {
        val b = bytes(off + 3 * x) & 0xff
        val g = bytes(off + 3 * x + 1) & 0xff
        val r = bytes(off + 3 * x + 2) & 0xff
        px(y * width + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    BmpImage(width, height, px)
  }

  /** Parse a 24bpp BMP: geometry from the headers, pixel sums from the
    * padded bottom-up pixel array at the header-declared offset. */
  def decode(bytes: Array[Byte]): BmpInfo = {
    val Header(width, height, pixelOff) = header(bytes)
    val rowLen = stride(width)
    var sumB = 0L; var sumG = 0L; var sumR = 0L
    var y = 0
    while (y < height) {
      // row y from the top lives at bottom-up position height-1-y
      val off = pixelOff + (height - 1 - y) * rowLen
      var x = 0
      while (x < width) {
        sumB += bytes(off + 3 * x) & 0xff
        sumG += bytes(off + 3 * x + 1) & 0xff
        sumR += bytes(off + 3 * x + 2) & 0xff
        x += 1
      }
      y += 1
    }
    BmpInfo(width.toLong, height.toLong, 24L, width.toLong * height, // bpp=24 enforced by header()
      bytes.length.toLong, sumB, sumG, sumR)
  }
}

/** PNG (truecolor RGB8, non-interlaced): the COMPRESSED third of the
  * codec family — WAV and BMP prove container parsing, PNG adds the two
  * layers real image formats live on: per-chunk CRC32 integrity and a
  * zlib-deflated, per-row-filtered pixel stream (`java.util.zip` — pure
  * JVM, no native libs). Format per the public PNG specification
  * (RFC 2083 / W3C PNG): 8-byte signature, big-endian length-typed
  * chunks (IHDR/IDAT/IEND) each carrying a CRC32 over type+data, IDAT =
  * zlib(scanlines), scanline = 1 filter byte + 3·width RGB bytes.
  *
  * The encoder alternates filter types per row — None (0) on even rows,
  * Sub (1) on odd rows — so the decoder must actually RECONSTRUCT
  * filtered bytes (recon(x) = filt(x) + recon(x−3)), not just skip the
  * filter byte: a reconstruction, stride, or CRC bug flips the decoded
  * pixel sums and with them the oracle hash. Compressed byte counts are
  * deliberately NOT part of the decoded facts — deflate output is
  * implementation-defined; everything emitted is arithmetic on the
  * ORIGINAL pixels, which the DuckDB oracle predicts independently.
  */
object PngCodec {
  import java.util.zip.{CRC32, Deflater, Inflater}

  /** Decoded facts: IHDR geometry, the inflated payload length (proves
    * the zlib round-trip restored every scanline byte), the number of
    * chunks whose CRC32 verified, and exact per-channel pixel sums
    * (proves filter reconstruction). */
  case class PngInfo(width: Long, height: Long, bitDepth: Long,
                     colorType: Long, nPixels: Long, payloadLen: Long,
                     chunksCrcOk: Long, sumR: Long, sumG: Long, sumB: Long)

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** One chunk: length(4 BE) + type(4) + data + CRC32(type+data)(4 BE). */
  private def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val tb = tpe.getBytes(US_ASCII)
    val bb = ByteBuffer.allocate(12 + data.length) // PNG is big-endian
    bb.putInt(data.length).put(tb).put(data)
    val crc = new CRC32
    crc.update(tb); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  /** Encode an RGB8 image. `px(x, y)` returns (r, g, b), y=0 the top
    * row; rows alternate None/Sub filters (see object doc). */
  def encode(width: Int, height: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowLen = 1 + 3 * width
    val raw = new Array[Byte](height * rowLen)
    var y = 0
    while (y < height) {
      val off = y * rowLen
      val sub = y % 2 == 1
      raw(off) = if (sub) 1 else 0
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, y)
        val o = off + 1 + 3 * x
        if (sub && x > 0) {
          // Sub filter is BYTEWISE with bpp=3: subtract the same channel
          // of the left pixel, mod 256 (toByte truncation)
          val (pr, pg, pb) = px(x - 1, y)
          raw(o) = (r - pr).toByte; raw(o + 1) = (g - pg).toByte
          raw(o + 2) = (b - pb).toByte
        } else {
          raw(o) = r.toByte; raw(o + 1) = g.toByte; raw(o + 2) = b.toByte
        }
        x += 1
      }
      y += 1
    }
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val ihdr = ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive filter, no interlace
      .array()
    Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Parse a PNG: verify the signature and every chunk CRC, read IHDR
    * geometry, concatenate IDAT bodies (real PNGs split them), inflate,
    * and reconstruct each scanline's filter before summing channels. */
  def decode(bytes: Array[Byte]): PngInfo = {
    require(bytes.length > 8 && bytes.take(8).sameElements(Signature), "not a PNG")
    val bb = ByteBuffer.wrap(bytes)
    bb.position(8)
    var width = 0; var height = 0; var bitDepth = 0; var colorType = 0
    var crcOk = 0L
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && bb.remaining() >= 12) {
      val len = bb.getInt()
      val tb = new Array[Byte](4); bb.get(tb)
      val tpe = new String(tb, US_ASCII)
      val data = new Array[Byte](len); bb.get(data)
      val declared = bb.getInt()
      val crc = new CRC32
      crc.update(tb); crc.update(data)
      require(crc.getValue.toInt == declared, s"CRC mismatch on $tpe chunk")
      crcOk += 1
      tpe match {
        case "IHDR" =>
          val h = ByteBuffer.wrap(data)
          width = h.getInt(); height = h.getInt()
          bitDepth = h.get() & 0xff; colorType = h.get() & 0xff
          require(bitDepth == 8 && colorType == 2,
            s"unsupported PNG flavor: depth=$bitDepth color=$colorType (RGB8 only)")
          require(h.get() == 0 && h.get() == 0 && h.get() == 0,
            "unsupported compression/filter/interlace method")
        case "IDAT" => idat.write(data)
        case "IEND" => done = true
        case _      => () // ancillary chunk: CRC-checked above, content ignored
      }
    }
    require(done && width > 0 && height > 0, "missing IHDR/IEND")
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    val rowLen = 1 + 3 * width
    val raw = new Array[Byte](height * rowLen)
    var got = 0
    while (!inf.finished() && got < raw.length)
      got += inf.inflate(raw, got, raw.length - got)
    val trailing = !inf.finished() && { inf.inflate(new Array[Byte](1)) > 0 }
    require(!trailing, "IDAT inflates past the expected scanline bytes")
    inf.end()
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var y = 0
    while (y < height) {
      val off = y * rowLen
      val filter = raw(off) & 0xff
      require(filter <= 1, s"unsupported scanline filter $filter (None/Sub only)")
      if (filter == 1) {
        // reconstruct Sub in place: recon(x) = filt(x) + recon(x - 3)
        var o = off + 4
        while (o < off + rowLen) {
          raw(o) = (raw(o) + raw(o - 3)).toByte
          o += 1
        }
      }
      var x = 0
      while (x < width) {
        val o = off + 1 + 3 * x
        sumR += raw(o) & 0xff; sumG += raw(o + 1) & 0xff; sumB += raw(o + 2) & 0xff
        x += 1
      }
      y += 1
    }
    PngInfo(width.toLong, height.toLong, bitDepth.toLong, colorType.toLong,
      width.toLong * height, got.toLong, crcOk, sumR, sumG, sumB)
  }
}
