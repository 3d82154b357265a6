package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** REAL decoder/encoder for PNG (ISO/IEC 15948) — the first COMPRESSED
  * image format in the media layer, and the piece that retires the
  * "image decode needs a codec library" caveat for lossless images: the
  * whole pipeline is in-JVM public Java SE — zlib DEFLATE via
  * `java.util.zip.Inflater/Deflater`, CRC-32 via `java.util.zip.CRC32`,
  * and the five scanline predictors (None/Sub/Up/Average/Paeth)
  * implemented from the published spec. Nothing here is a derived fake:
  * decode walks the real chunk grammar (length/type/data/CRC), verifies
  * every chunk CRC, inflates the real zlib stream, and unfilters real
  * predictor output byte-by-byte.
  *
  * Supported subset (everything else degrades to null, never an
  * exception — one corrupt blob in a 100 TB scan costs one null row):
  * 8-bit depth, color types 2 (truecolor RGB) and 0 (grayscale, widened
  * to r=g=b in the unified [[Ppm.Image]] surface), compression 0,
  * filter method 0, non-interlaced. Palette/16-bit/alpha/Adam7 are
  * documented unsupported-⇒-null, the same honesty contract as
  * [[Mp3]]'s MPEG-2/Layer-I rejection.
  *
  * Reference semantics (capability parity, not code): the reference
  * pipeline has no media handling at all — this layer is part of the
  * beyond-reference training-data surface the build prompt requires.
  */
object Png {

  private val SIG = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** Paeth predictor, straight from the spec: closest of left/up/up-left
    * to their sum-minus-corner initial estimate, ties broken a, b, c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Parse PNG bytes into the unified image surface ([[Ppm.Image]],
    * maxval 255, interleaved RGB ints); null on any malformation:
    * bad signature, CRC mismatch on ANY chunk, missing/short IHDR,
    * unsupported depth/color/interlace, zlib error, or an inflated
    * raster that is not exactly height·(1+width·channels) bytes. */
  def decode(bytes: Array[Byte]): Ppm.Image = {
    if (bytes == null || bytes.length < SIG.length + 12) return null
    var i = 0
    while (i < SIG.length) { if (bytes(i) != SIG(i)) return null; i += 1 }

    var w = 0; var h = 0; var colorType = -1; var channels = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    val crc = new CRC32()
    while (!seenIend) {
      if (i + 8 > bytes.length) return null
      val len = be32(bytes, i)
      if (len > Int.MaxValue - 8 || i + 12 + len > bytes.length) return null
      val dataOff = i + 8
      crc.reset()
      crc.update(bytes, i + 4, 4 + len.toInt) // type + data
      if (crc.getValue != be32(bytes, dataOff + len.toInt)) return null
      val typ = new String(bytes, i + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          if (seenIhdr || len != 13) return null
          seenIhdr = true
          val wl = be32(bytes, dataOff); val hl = be32(bytes, dataOff + 4)
          if (wl <= 0 || hl <= 0 || wl > (1 << 20) || hl > (1 << 20)) return null
          w = wl.toInt; h = hl.toInt
          val depth = bytes(dataOff + 8) & 0xff
          colorType = bytes(dataOff + 9) & 0xff
          val compression = bytes(dataOff + 10) & 0xff
          val filterMethod = bytes(dataOff + 11) & 0xff
          val interlace = bytes(dataOff + 12) & 0xff
          if (depth != 8 || (colorType != 2 && colorType != 0) ||
            compression != 0 || filterMethod != 0 || interlace != 0) return null
          channels = if (colorType == 2) 3 else 1
        case "IDAT" =>
          if (!seenIhdr) return null
          idat.write(bytes, dataOff, len.toInt)
        case "IEND" =>
          if (!seenIhdr || len != 0) return null
          seenIend = true
        case _ => () // ancillary chunk: CRC already verified, content skipped
      }
      i = dataOff + len.toInt + 4
    }

    // zlib-inflate the concatenated IDAT stream to exactly the filtered
    // raster size: h rows of (1 filter byte + w*channels raw bytes).
    val stride = w * channels
    val rasterLen = h.toLong * (1 + stride)
    if (rasterLen > Int.MaxValue / 2) return null
    val raster = new Array[Byte](rasterLen.toInt)
    val inf = new Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raster.length && !inf.finished()) {
        val n = inf.inflate(raster, got, raster.length - got)
        if (n == 0 && inf.needsInput()) return null // truncated stream
        got += n
      }
      if (got != raster.length) return null
      // stream must END here: trailing pixels would mean the header lied
      val probe = new Array[Byte](1)
      if (!inf.finished() && inf.inflate(probe, 0, 1) != 0) return null
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()

    // Unfilter in place, spec order: each row's predictor consumes the
    // RECONSTRUCTED previous row/pixel, so filters chain across rows.
    val out = new Array[Int](w * h * 3)
    val prev = new Array[Int](stride) // reconstructed previous row (0s for row 0)
    val cur = new Array[Int](stride)
    var r = 0
    while (r < h) {
      val rowOff = r * (1 + stride)
      val filter = raster(rowOff) & 0xff
      if (filter > 4) return null
      var x = 0
      while (x < stride) {
        val f = raster(rowOff + 1 + x) & 0xff
        val a = if (x >= channels) cur(x - channels) else 0 // left
        val b = prev(x)                                     // up
        val c = if (x >= channels) prev(x - channels) else 0 // up-left
        val rec = filter match {
          case 0 => f
          case 1 => f + a
          case 2 => f + b
          case 3 => f + (a + b) / 2
          case 4 => f + paeth(a, b, c)
        }
        cur(x) = rec & 0xff
        x += 1
      }
      // widen to the unified RGB surface (gray replicates to r=g=b)
      var px = 0
      while (px < w) {
        val o = (r * w + px) * 3
        if (channels == 3) {
          out(o) = cur(px * 3); out(o + 1) = cur(px * 3 + 1); out(o + 2) = cur(px * 3 + 2)
        } else {
          out(o) = cur(px); out(o + 1) = cur(px); out(o + 2) = cur(px)
        }
        px += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      r += 1
    }
    Ppm.Image(w, h, 255, out)
  }

  /** Serialize 8-bit RGB samples as a complete, spec-valid PNG:
    * signature, IHDR, one IDAT holding the zlib-deflated filtered
    * raster, IEND — all chunk CRCs real. `filterForRow` picks the
    * predictor (0-4) per scanline, so fixtures can exercise every
    * filter type in one file; the encoder computes the true filtered
    * deltas against the raw previous row/pixel exactly as the spec
    * prescribes, which is what makes [[decode]]'s unfilter chain
    * load-bearing in round-trip tests. */
  def encode(width: Int, height: Int, samples: Array[Int],
      filterForRow: Int => Int = _ => 0): Array[Byte] = {
    require(width > 0 && height > 0, s"invalid dims ${width}x$height")
    require(samples.length == width * height * 3,
      s"expected ${width * height * 3} samples, got ${samples.length}")
    val stride = width * 3
    val raster = new Array[Byte](height * (1 + stride))
    var r = 0
    while (r < height) {
      val filter = filterForRow(r)
      require(filter >= 0 && filter <= 4, s"bad filter $filter")
      val rowOff = r * (1 + stride)
      raster(rowOff) = filter.toByte
      var x = 0
      while (x < stride) {
        val raw = samples(r * stride + x) & 0xff
        val a = if (x >= 3) samples(r * stride + x - 3) & 0xff else 0
        val b = if (r > 0) samples((r - 1) * stride + x) & 0xff else 0
        val c = if (r > 0 && x >= 3) samples((r - 1) * stride + x - 3) & 0xff else 0
        val f = filter match {
          case 0 => raw
          case 1 => raw - a
          case 2 => raw - b
          case 3 => raw - (a + b) / 2
          case 4 => raw - paeth(a, b, c)
        }
        raster(rowOff + 1 + x) = f.toByte
        x += 1
      }
      r += 1
    }
    assemble(width, height, colorType = 2, raster)
  }

  /** Grayscale (color type 0) encode — one 8-bit sample per pixel; the
    * decoder widens gray to r=g=b, so round-trip tests can pin the
    * ct0 path with exact expected rasters. */
  def encodeGray(width: Int, height: Int, gray: Array[Int],
      filterForRow: Int => Int = _ => 0): Array[Byte] = {
    require(width > 0 && height > 0, s"invalid dims ${width}x$height")
    require(gray.length == width * height,
      s"expected ${width * height} samples, got ${gray.length}")
    val stride = width
    val raster = new Array[Byte](height * (1 + stride))
    var r = 0
    while (r < height) {
      val filter = filterForRow(r)
      require(filter >= 0 && filter <= 4, s"bad filter $filter")
      val rowOff = r * (1 + stride)
      raster(rowOff) = filter.toByte
      var x = 0
      while (x < stride) {
        val raw = gray(r * stride + x) & 0xff
        val a = if (x >= 1) gray(r * stride + x - 1) & 0xff else 0
        val b = if (r > 0) gray((r - 1) * stride + x) & 0xff else 0
        val c = if (r > 0 && x >= 1) gray((r - 1) * stride + x - 1) & 0xff else 0
        val f = filter match {
          case 0 => raw
          case 1 => raw - a
          case 2 => raw - b
          case 3 => raw - (a + b) / 2
          case 4 => raw - paeth(a, b, c)
        }
        raster(rowOff + 1 + x) = f.toByte
        x += 1
      }
      r += 1
    }
    assemble(width, height, colorType = 0, raster)
  }

  /** Shared encode tail: zlib-deflate the filtered raster and assemble
    * signature + IHDR + IDAT + IEND with real CRCs. */
  private def assemble(width: Int, height: Int, colorType: Int,
      raster: Array[Byte]): Array[Byte] = {
    val def_ = new Deflater(Deflater.DEFAULT_COMPRESSION)
    val compressed = try {
      def_.setInput(raster); def_.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!def_.finished()) buf.write(tmp, 0, def_.deflate(tmp))
      buf.toByteArray
    } finally def_.end()
    val ihdr = new Array[Byte](13)
    ihdr(0) = (width >>> 24).toByte; ihdr(1) = (width >>> 16).toByte
    ihdr(2) = (width >>> 8).toByte; ihdr(3) = width.toByte
    ihdr(4) = (height >>> 24).toByte; ihdr(5) = (height >>> 16).toByte
    ihdr(6) = (height >>> 8).toByte; ihdr(7) = height.toByte
    ihdr(8) = 8; ihdr(9) = colorType.toByte; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    val out = new java.io.ByteArrayOutputStream()
    out.write(SIG, 0, SIG.length)
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", compressed)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    def be(v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    be(data.length.toLong)
    val t = typ.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(t, 0, 4)
    crc.update(data, 0, data.length)
    be(crc.getValue)
  }

  /** Deterministic PNG fixture bytes for an id — REAL, complete PNG files
    * (signature/IHDR/IDAT/IEND, valid CRCs, real deflate): dims cycle
    * 3..5 x 2..3 with the id; sample j = (id*37 + j*11) mod 256 — a
    * DIFFERENT byte law from [[Ppm.fixtureBytes]] so a mixed-corpus
    * oracle can tell the two decoders apart; row r uses filter
    * (id + r) mod 5, so every predictor type is load-bearing across the
    * corpus. */
  def fixtureBytes(id: Long): Array[Byte] = {
    val w = (3 + java.lang.Math.floorMod(id, 3L)).toInt
    val h = (2 + java.lang.Math.floorMod(id, 2L)).toInt
    val samples = new Array[Int](w * h * 3)
    var j = 0
    while (j < samples.length) {
      samples(j) = java.lang.Math.floorMod(id * 37 + j * 11L, 256L).toInt
      j += 1
    }
    encode(w, h, samples, r => java.lang.Math.floorMod(id + r, 5L).toInt)
  }
}
