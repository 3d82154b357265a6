package graft.multimodal

/** Baseline TIFF codec — the fifth lossless image family, and the one
  * whose REAL difficulty is the metadata grammar: a TIFF is an
  * endianness-tagged ("II" little / "MM" big — BOTH implemented and both
  * exercised by the fixtures), offset-linked walk of IFD tag tables, and
  * the pixel data is reached only through StripOffsets/StripByteCounts
  * resolution — the same offset-table discipline as MP4's stsz/stsc/stco
  * layer, in image form. This is exactly the shape of EXIF parsing, the
  * metadata-extraction task a real ingestion pipeline meets constantly.
  *
  * Supported on purpose (the baseline-TIFF profile): 8-bit RGB or
  * grayscale, uncompressed (Compression=1), chunky planar config, any
  * strip layout. Everything else (LZW/PackBits/JPEG-in-TIFF, palettes,
  * tiles, 16-bit) → null, never an exception — the shared media decode
  * contract (reference ingests only sniff-validated formats:
  * src/file-to-sql-loader.py:175). Decoded pixels surface as the unified
  * [[Ppm.Image]] RGB raster (grayscale widened r=g=b).
  */
object Tiff {

  private final class Reader(b: Array[Byte], le: Boolean) {
    def u16(o: Int): Int =
      if (o < 0 || o + 2 > b.length) -1
      else if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (o < 0 || o + 4 > b.length) -1L
      else if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  }

  /** One resolved IFD entry value (first value only — enough for the
    * baseline profile's scalar tags; strip arrays are read separately). */
  private def tagValue(r: Reader, entryOff: Int): Long = {
    val typ = r.u16(entryOff + 2)
    // value-or-offset field at +8; SHORT(3) and LONG(4) with count 1 are
    // stored INLINE (left-justified in the byte order's sense — both
    // orders resolve through the same u16/u32 readers at offset +8)
    typ match {
      case 3 => r.u16(entryOff + 8).toLong
      case 4 => r.u32(entryOff + 8)
      case _ => -1L
    }
  }

  /** Array-valued tag (StripOffsets/StripByteCounts): `count` SHORTs or
    * LONGs, inline when they fit in the 4-byte field, else at offset. */
  private def tagArray(r: Reader, entryOff: Int, bytesLen: Int): Array[Long] = {
    val typ = r.u16(entryOff + 2)
    val count = r.u32(entryOff + 4)
    if (count <= 0 || count > 65535) return null
    val elemSize = typ match { case 3 => 2; case 4 => 4; case _ => return null }
    val total = elemSize * count.toInt
    val base =
      if (total <= 4) entryOff + 8
      else {
        val off = r.u32(entryOff + 8)
        if (off < 0 || off + total > bytesLen) return null
        off.toInt
      }
    Array.tabulate(count.toInt) { i =>
      if (elemSize == 2) r.u16(base + i * 2).toLong else r.u32(base + i * 4)
    }
  }

  def decode(bytes: Array[Byte]): Ppm.Image = {
    if (bytes == null || bytes.length < 8) return null
    val le =
      if (bytes(0) == 'I' && bytes(1) == 'I') true
      else if (bytes(0) == 'M' && bytes(1) == 'M') false
      else return null
    val r = new Reader(bytes, le)
    if (r.u16(2) != 42) return null
    val ifd = r.u32(4)
    if (ifd < 8 || ifd + 2 > bytes.length) return null
    val nEntries = r.u16(ifd.toInt)
    if (nEntries <= 0 || nEntries > 512) return null
    if (ifd + 2 + nEntries * 12 > bytes.length) return null
    var w = -1L; var h = -1L; var comp = 1L; var spp = 1L
    var planar = 1L; var photometric = -1L
    var bitsArr: Array[Long] = Array(8L) // absent tag defaults to 8 (TIFF 6.0)
    var stripOffsets: Array[Long] = null
    var stripCounts: Array[Long] = null
    var i = 0
    while (i < nEntries) {
      val e = ifd.toInt + 2 + i * 12
      r.u16(e) match {
        case 256 => w = tagValue(r, e)
        case 257 => h = tagValue(r, e)
        // BitsPerSample carries count=SamplesPerPixel values (TIFF 6.0) —
        // for RGB that is 3 SHORTs living at an OFFSET, so the inline
        // tagValue read would misparse half the offset as the value.
        // Resolve with the same inline-vs-offset logic as the strip arrays.
        case 258 => bitsArr = tagArray(r, e, bytes.length)
        case 259 => comp = tagValue(r, e)
        case 262 => photometric = tagValue(r, e)
        case 273 => stripOffsets = tagArray(r, e, bytes.length)
        case 277 => spp = tagValue(r, e)
        case 279 => stripCounts = tagArray(r, e, bytes.length)
        case 284 => planar = tagValue(r, e)
        case _ => ()
      }
      i += 1
    }
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return null
    if (comp != 1 || planar != 1) return null
    if (spp != 1 && spp != 3) return null
    // accept count=1 (legacy writers) or count=spp (conformant); every
    // sample must be 8 bits for the baseline profile
    if (bitsArr == null || bitsArr.isEmpty) return null
    if (bitsArr.length != 1 && bitsArr.length != spp) return null
    if (bitsArr.exists(_ != 8L)) return null
    // photometric must MATCH the sample layout: RGB(2) for 3 samples,
    // BlackIsZero(1) for grayscale — a palette file (3) would otherwise
    // decode its palette INDICES as pixels, and WhiteIsZero(0) needs an
    // inversion this baseline profile doesn't implement
    if (spp == 3 && photometric != 2) return null
    if (spp == 1 && photometric != 1) return null
    if (stripOffsets == null || stripCounts == null) return null
    if (stripOffsets.length != stripCounts.length) return null
    val need = w * h * spp
    // uncompressed pixel data cannot exceed the file: reject impossible
    // rasters BEFORE allocating — otherwise a crafted header whose strip
    // counts sum to w·h·spp (up to 3·2^40) wraps need.toInt or triggers a
    // multi-GB allocation instead of the documented null
    if (need > bytes.length) return null
    if (stripCounts.map(c => c max 0L).sum != need) return null
    val raw = new Array[Int](need.toInt)
    var pos = 0
    var sIdx = 0
    while (sIdx < stripOffsets.length) {
      val off = stripOffsets(sIdx); val cnt = stripCounts(sIdx)
      if (off < 0 || cnt < 0 || off + cnt > bytes.length) return null
      var j = 0
      while (j < cnt) { raw(pos) = bytes((off + j).toInt) & 0xff; pos += 1; j += 1 }
      sIdx += 1
    }
    val samples =
      if (spp == 3) raw
      else { // grayscale → widen to RGB
        val out = new Array[Int](raw.length * 3)
        var k = 0
        while (k < raw.length) {
          out(k * 3) = raw(k); out(k * 3 + 1) = raw(k); out(k * 3 + 2) = raw(k)
          k += 1
        }
        out
      }
    Ppm.Image(w.toInt, h.toInt, 255, samples)
  }

  /** Encode an RGB raster as baseline TIFF in the requested byte order,
    * split into `nStrips` strips — strip resolution is load-bearing in
    * the fixtures (a decoder that ignores StripOffsets cannot reproduce
    * the raster: strips are written in REVERSE file order). */
  def encode(width: Int, height: Int, samples: Array[Int], littleEndian: Boolean,
      nStrips: Int): Array[Byte] = {
    require(samples.length == width * height * 3, "raster size mismatch")
    val n = samples.length
    val strips = math.max(1, math.min(nStrips, height))
    // split the raster bytes into `strips` contiguous chunks (row-aligned)
    val rowsPer = (height + strips - 1) / strips
    val bounds = (0 until strips).map { s =>
      val r0 = s * rowsPer; val r1 = math.min(height, r0 + rowsPer)
      (r0 * width * 3, math.max(0, (r1 - r0) * width * 3))
    }.filter(_._2 > 0)
    val nTags = 9
    val headerLen = 8
    val ifdLen = 2 + nTags * 12 + 4
    val arraysLen = bounds.length * 8 // two LONG arrays when > 1 strip
    val ifdOff = headerLen
    // BitsPerSample is written CONFORMANTLY with count=3 (TIFF 6.0 requires
    // count=SamplesPerPixel): 3 SHORTs = 6 bytes live past the 4-byte value
    // field, so they get their own offset region (padded to 8 for alignment)
    val bpsOff = ifdOff + ifdLen
    val arrOff = bpsOff + 8
    val dataOff = arrOff + (if (bounds.length > 1) arraysLen * 2 else 0)
    val out = new Array[Byte](dataOff + n)
    def w16(o: Int, v: Int): Unit =
      if (littleEndian) { out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte }
      else { out(o) = ((v >> 8) & 0xff).toByte; out(o + 1) = (v & 0xff).toByte }
    def w32(o: Int, v: Long): Unit =
      if (littleEndian) {
        out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
        out(o + 2) = ((v >> 16) & 0xff).toByte; out(o + 3) = ((v >> 24) & 0xff).toByte
      } else {
        out(o) = ((v >> 24) & 0xff).toByte; out(o + 1) = ((v >> 16) & 0xff).toByte
        out(o + 2) = ((v >> 8) & 0xff).toByte; out(o + 3) = (v & 0xff).toByte
      }
    out(0) = if (littleEndian) 'I' else 'M'
    out(1) = out(0)
    w16(2, 42); w32(4, ifdOff)
    // strips land at dataOff.. in REVERSE order so offsets are non-monotone
    val stripFileOff = new Array[Long](bounds.length)
    var acc = dataOff
    for (s <- bounds.indices.reverse) {
      stripFileOff(s) = acc
      System.arraycopy(
        samples.map(_.toByte), bounds(s)._1, out, acc, bounds(s)._2)
      acc += bounds(s)._2
    }
    w16(ifdOff, nTags)
    var e = ifdOff + 2
    def tag(id: Int, typ: Int, count: Long, value: Long): Unit = {
      w16(e, id); w16(e + 2, typ); w32(e + 4, count)
      // SHORT with count 1 is stored inline; any multi-value tag's value
      // field is a LONG offset regardless of element type
      if (typ == 3 && count == 1) { w16(e + 8, value.toInt); w16(e + 10, 0) }
      else w32(e + 8, value)
      e += 12
    }
    tag(256, 4, 1, width)                  // ImageWidth
    tag(257, 4, 1, height)                 // ImageLength
    tag(258, 3, 3, bpsOff)                 // BitsPerSample: 3 SHORTs at offset
    w16(bpsOff, 8); w16(bpsOff + 2, 8); w16(bpsOff + 4, 8); w16(bpsOff + 6, 0)
    tag(259, 3, 1, 1)                      // Compression: none
    tag(262, 3, 1, 2)                      // Photometric: RGB
    if (bounds.length == 1) tag(273, 4, 1, stripFileOff(0))
    else tag(273, 4, bounds.length, arrOff)
    tag(277, 3, 1, 3)                      // SamplesPerPixel
    if (bounds.length == 1) tag(279, 4, 1, bounds(0)._2)
    else tag(279, 4, bounds.length, arrOff + arraysLen)
    tag(284, 3, 1, 1)                      // PlanarConfig: chunky
    w32(e, 0)                              // next-IFD terminator
    if (bounds.length > 1) {
      for (s <- bounds.indices) {
        w32(arrOff + s * 4, stripFileOff(s))
        w32(arrOff + arraysLen + s * 4, bounds(s)._2)
      }
    }
    out
  }

  /** Deterministic fixture: dims (3+id%3)×(2+id%2) like the sibling
    * codecs, sample law (id·47 + j·19) mod 256; byte order alternates by
    * id parity (even → II, odd → MM) and the raster splits into
    * 1+id%2 strips written in reverse file order — so a decoder only
    * reproduces the law by honoring endianness AND strip resolution. */
  def fixtureBytes(id: Long): Array[Byte] = {
    val w = (3 + java.lang.Math.floorMod(id, 3L)).toInt
    val h = (2 + java.lang.Math.floorMod(id, 2L)).toInt
    val samples = new Array[Int](w * h * 3)
    var j = 0
    while (j < samples.length) {
      samples(j) = java.lang.Math.floorMod(id * 47 + j * 19L, 256L).toInt
      j += 1
    }
    encode(w, h, samples, littleEndian = id % 2 == 0,
      nStrips = 1 + java.lang.Math.floorMod(id, 2L).toInt)
  }
}
