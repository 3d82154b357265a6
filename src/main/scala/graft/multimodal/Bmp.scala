package graft.multimodal

/** Windows BMP (DIB) codec — the fourth lossless image family next to
  * PPM/PNG/GIF: 24-bit uncompressed BI_RGB with the REAL layout quirks
  * that make a naive byte copy wrong — BGR channel order, BOTTOM-UP row
  * storage (positive biHeight), and 4-byte row padding. Top-down files
  * (negative biHeight) are accepted too. Decoded pixels surface as the
  * unified [[Ppm.Image]] RGB raster in reading order, so the shared
  * image-stats kernel and the arithmetic oracles see the same sample law
  * as every other codec.
  *
  * Grammar implemented from the public BITMAPFILEHEADER /
  * BITMAPINFOHEADER layout: 14-byte file header ("BM", file size,
  * pixel-data offset) + 40-byte info header (biSize=40, width, height,
  * planes=1, bitCount=24, compression=0). Unsupported variants (other
  * bit depths, RLE compression, V4/V5 headers beyond the core 40 bytes
  * the reader needs) → null, never an exception — the shared media
  * decode contract (reference ingests only sniff-validated formats:
  * src/file-to-sql-loader.py:175).
  */
object Bmp {

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def i32le(b: Array[Byte], o: Int): Int = u32le(b, o).toInt

  /** Decode 24-bit BI_RGB BMP bytes → RGB raster in reading order
    * (top row first), or null on any malformation / unsupported
    * variant. */
  def decode(bytes: Array[Byte]): Ppm.Image = {
    if (bytes == null || bytes.length < 54) return null
    if (bytes(0) != 'B' || bytes(1) != 'M') return null
    val dataOffset = u32le(bytes, 10)
    val biSize = u32le(bytes, 14)
    // biSize >= 40: BITMAPINFOHEADER or a superset (V4/V5 extend it);
    // the core 40 bytes this reader consumes sit at the same offsets
    if (biSize < 40) return null
    val w = i32le(bytes, 18)
    val rawH = i32le(bytes, 22)
    val topDown = rawH < 0
    val h = if (topDown) -rawH else rawH
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return null
    if (u16le(bytes, 26) != 1) return null      // planes
    if (u16le(bytes, 28) != 24) return null     // bitCount: 24-bit only
    if (u32le(bytes, 30) != 0) return null      // compression: BI_RGB only
    val rowSize = ((w * 3 + 3) / 4) * 4         // 4-byte padded rows
    val need = dataOffset + rowSize.toLong * h
    if (dataOffset < 54 || need > bytes.length) return null
    val samples = new Array[Int](w * h * 3)
    var row = 0
    while (row < h) {
      // positive height ⇒ rows stored bottom-up: raster row `row` lives
      // in stored row (h-1-row)
      val stored = if (topDown) row else h - 1 - row
      var src = dataOffset.toInt + stored * rowSize
      var dst = row * w * 3
      var x = 0
      while (x < w) {
        samples(dst) = bytes(src + 2) & 0xff     // B G R on disk → R G B
        samples(dst + 1) = bytes(src + 1) & 0xff
        samples(dst + 2) = bytes(src) & 0xff
        src += 3; dst += 3; x += 1
      }
      row += 1
    }
    Ppm.Image(w, h, 255, samples)
  }

  /** Encode an RGB reading-order raster as a bottom-up 24-bit BI_RGB
    * BMP — the layout inverse of [[decode]] (BGR, padded, flipped). */
  def encode(width: Int, height: Int, samples: Array[Int]): Array[Byte] = {
    require(samples.length == width * height * 3, "raster size mismatch")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataOffset = 54
    val fileSize = dataOffset + rowSize * height
    val out = new Array[Byte](fileSize)
    def w16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def w32(o: Int, v: Long): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte; out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    w32(2, fileSize); w32(10, dataOffset)
    w32(14, 40); w32(18, width); w32(22, height)
    w16(26, 1); w16(28, 24); w32(30, 0)
    w32(34, rowSize.toLong * height) // biSizeImage (may legally be 0)
    // resolution/palette fields stay 0
    var row = 0
    while (row < height) {
      var dst = dataOffset + (height - 1 - row) * rowSize
      var src = row * width * 3
      var x = 0
      while (x < width) {
        out(dst) = samples(src + 2).toByte       // R G B raster → B G R disk
        out(dst + 1) = samples(src + 1).toByte
        out(dst + 2) = samples(src).toByte
        src += 3; dst += 3; x += 1
      }
      row += 1
    }
    out
  }

  /** Deterministic fixture: dims (3+id%3)×(2+id%2) like the sibling
    * codecs, sample law (id·41 + j·13) mod 256 over the RGB reading
    * order — the encoder's flip/pad/BGR layout means a decoder only
    * reproduces this law by undoing all three. */
  def fixtureBytes(id: Long): Array[Byte] = {
    val w = (3 + java.lang.Math.floorMod(id, 3L)).toInt
    val h = (2 + java.lang.Math.floorMod(id, 2L)).toInt
    val samples = new Array[Int](w * h * 3)
    var j = 0
    while (j < samples.length) {
      samples(j) = java.lang.Math.floorMod(id * 41 + j * 13L, 256L).toInt
      j += 1
    }
    encode(w, h, samples)
  }
}
