package graft.multimodal

/** REAL decoder/encoder for baseline sequential JPEG (ITU-T T.81) —
  * the lossy-codec milestone in the media layer: unlike PNG/GIF (whose
  * decompression is bit-lossless by construction), JPEG decode means
  * entropy decoding (canonical Huffman over a byte-stuffed bitstream),
  * coefficient dequantization, and the 2-D inverse DCT. All of it is
  * implemented here from the published standard — marker segment
  * grammar (SOI/APPn/DQT/SOF0/DHT/SOS/EOI), DHT-driven canonical
  * Huffman table construction (the decoder reads the tables from the
  * FILE, not from constants shared with the encoder), DC prediction,
  * AC run/size with EOB/ZRL, 0xFF00 byte unstuffing, zigzag
  * de-serialization, and a separable floating IDCT with final
  * round-and-clamp.
  *
  * Exactness discipline (how a LOSSY codec gets a bit-exact oracle):
  * with quantization step 8 on the DC coefficient, a CONSTANT 8×8
  * block survives the whole chain exactly — FDCT of a constant block
  * is DC-only with DC = 8·(v−128), quantizing by 8 recovers the
  * integer v−128, and the IDCT of a DC-only coefficient is the exact
  * constant (v−128)/1 restored by the +128 level shift. The q112
  * fixtures are therefore per-block-constant images: their decode is
  * provably bit-exact and the DuckDB oracle re-derives every pixel
  * from the block-value law, while the codepath exercised is the fully
  * general baseline decoder (Huffman, prediction, dequant, IDCT).
  * Non-constant images run the same general path and are spec-checked
  * under an error bound instead (lossy by nature).
  *
  * Supported subset (everything else degrades to null, never an
  * exception): baseline sequential DCT, 8-bit, single-component
  * (grayscale, widened to r=g=b in the unified [[Ppm.Image]]), one
  * scan, no restart markers, dimensions multiples of 8. Progressive,
  * chroma subsampling, arithmetic coding, and 12-bit are documented
  * unsupported-⇒-null, the [[Png]]/[[Gif]] honesty contract. */
object Jpeg {

  // --- canonical Huffman (JPEG DHT representation) -------------------------

  /** bits(i) = number of codes of length i+1 (1..16); vals = symbols in
    * code order. The flat-length tables below keep the encoder simple;
    * the decoder handles ANY valid DHT. */
  private val DcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array.tabulate(12)(identity) // categories 0..11
  private val AcBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0)
  /** AC symbols: EOB, ZRL, and every (run 0-15, size 1-10) pair. 162
    * nine-bit codes (≤ 511, the all-ones code unused — spec-clean). */
  private val AcVals: Array[Int] =
    (Array(0x00, 0xf0) ++ (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)).toArray

  /** Canonical code assignment per the standard's C.2 procedure. */
  private def assignCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = scala.collection.mutable.Map[Int, (Int, Int)]()
    for (len <- 1 to 16) {
      for (_ <- 0 until bits(len - 1)) {
        out(vals(k)) = (code, len)
        code += 1
        k += 1
      }
      code <<= 1
    }
    out.toMap
  }

  /** Decode tables per the standard's F.2.2.3 MINCODE/MAXCODE/VALPTR. */
  private final class HuffDecoder(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (len <- 1 to 16) {
        valPtr(len) = k
        minCode(len) = code
        code += bits(len - 1)
        k += bits(len - 1)
        maxCode(len) = code - 1
        if (bits(len - 1) == 0) maxCode(len) = -1
        code <<= 1
      }
    }
    /** next symbol from the reader; -1 on exhaustion/invalid code. */
    def decode(in: BitReader): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        val b = in.readBit()
        if (b < 0) return -1
        code = (code << 1) | b
        len += 1
        if (maxCode(len) >= 0 && code <= maxCode(len) && code >= minCode(len))
          return vals(valPtr(len) + code - minCode(len))
      }
      -1
    }
  }

  // --- byte-stuffed bit I/O ------------------------------------------------

  private final class BitWriter {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var n = 0
    def write(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      n += len
      while (n >= 8) {
        val b = ((acc >> (n - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        n -= 8
      }
    }
    def flush(): Unit = if (n > 0) { // pad with 1s per the spec
      val b = (((acc << (8 - n)) | ((1 << (8 - n)) - 1)) & 0xff).toInt
      out.write(b)
      if (b == 0xff) out.write(0x00)
      n = 0
    }
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    /** next bit, honoring 0xFF00 unstuffing; -1 at a marker or EOF. */
    def readBit(): Int = {
      if (n == 0) {
        if (pos >= data.length) return -1
        val b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= data.length) return -1
          val b2 = data(pos) & 0xff
          if (b2 != 0x00) { pos -= 1; return -1 } // a real marker: stop
          pos += 1
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def readBits(len: Int): Int = {
      var v = 0
      var i = 0
      while (i < len) {
        val b = readBit()
        if (b < 0) return Int.MinValue
        v = (v << 1) | b
        i += 1
      }
      v
    }
  }

  // --- DCT -----------------------------------------------------------------

  private val ZigZag: Array[Int] = {
    // zigzag order: zz(k) = raster index of the k-th coefficient
    val order = new Array[Int](64)
    var k = 0
    for (s <- 0 until 15) {
      val range = if (s % 2 == 0) (s to 0 by -1) else (0 to s)
      for (i <- range) {
        val x = i; val y = s - i
        if (x < 8 && y < 8) { order(k) = y * 8 + x; k += 1 }
      }
    }
    order
  }

  private val CosTable: Array[Double] = {
    val t = new Array[Double](64)
    for (u <- 0 until 8; x <- 0 until 8)
      t(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }
  private def cc(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Forward 2-D DCT-II with the standard's scaling (A.3.3). */
  private def fdct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    for (v <- 0 until 8; u <- 0 until 8) {
      var sum = 0.0
      for (y <- 0 until 8; x <- 0 until 8)
        sum += block(y * 8 + x) * CosTable(u * 8 + x) * CosTable(v * 8 + y)
      out(v * 8 + u) = 0.25 * cc(u) * cc(v) * sum
    }
    out
  }

  /** Inverse 2-D DCT with round-and-clamp to 0..255 (+128 level shift).
    * A DC-only block reconstructs EXACTLY (the constant dc/8). */
  private def idctToPixels(coef: Array[Double]): Array[Int] = {
    val out = new Array[Int](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var sum = 0.0
      for (v <- 0 until 8; u <- 0 until 8)
        sum += cc(u) * cc(v) * coef(v * 8 + u) * CosTable(u * 8 + x) * CosTable(v * 8 + y)
      val v0 = math.round(0.25 * sum + 128.0).toInt
      out(y * 8 + x) = math.max(0, math.min(255, v0))
    }
    out
  }

  // --- encode --------------------------------------------------------------

  /** DC-difference category (size) per the standard's F.1.2.1.1. */
  private def category(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Amplitude bits: v if positive, v + (2^size − 1) if negative. */
  private def amplitude(v: Int, size: Int): Int =
    if (v >= 0) v else v + (1 << size) - 1

  /** Serialize 8-bit grayscale as a complete baseline JPEG: SOI, APP0
    * (JFIF), DQT, SOF0 (1 component), DHT (DC+AC), SOS, entropy-coded
    * data with byte stuffing, EOI. `quant` is the 64-entry table in
    * zigzag order (all-8s in the fixtures — the DC-exactness choice).
    * The encoder runs a REAL FDCT + quantize + Huffman pipeline, so it
    * handles arbitrary images (lossily, like any JPEG writer). */
  def encode(width: Int, height: Int, gray: Array[Int],
      quant: Array[Int] = Array.fill(64)(8)): Array[Byte] = {
    require(width > 0 && height > 0 && width % 8 == 0 && height % 8 == 0,
      s"dims must be positive multiples of 8: ${width}x$height")
    require(gray.length == width * height, "sample count mismatch")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255), "bad DQT")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16); out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0) // APP0/JFIF v1.1
    marker(0xdb); u16(67); u8(0) // DQT: 8-bit, table 0
    quant.foreach(u8)
    marker(0xc0); u16(11) // SOF0: 8-bit, 1 component
    u8(8); u16(height); u16(width); u8(1)
    u8(1); u8(0x11); u8(0) // comp 1, 1x1 sampling, DQT 0
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(19 + vals.length); u8(cls << 4)
      bits.foreach(u8); vals.foreach(u8)
    }
    dht(0, DcBits, DcVals); dht(1, AcBits, AcVals)
    marker(0xda); u16(8); u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0) // SOS

    val dcCodes = assignCodes(DcBits, DcVals)
    val acCodes = assignCodes(AcBits, AcVals)
    val bw = new BitWriter
    var prevDc = 0
    val bw8 = width / 8
    for (by <- 0 until height / 8; bx <- 0 until bw8) {
      val block = new Array[Double](64)
      for (y <- 0 until 8; x <- 0 until 8)
        block(y * 8 + x) = gray((by * 8 + y) * width + bx * 8 + x) - 128.0
      val coef = fdct(block)
      // quantize in zigzag order (round half away from zero, B.2.4.1 style)
      val q = new Array[Int](64)
      for (k <- 0 until 64) {
        val c = coef(ZigZag(k)) / quant(k)
        q(k) = math.round(c).toInt
      }
      // DC difference
      val diff = q(0) - prevDc
      prevDc = q(0)
      val s = category(diff)
      val (dcCode, dcLen) = dcCodes(s)
      bw.write(dcCode, dcLen)
      if (s > 0) bw.write(amplitude(diff, s), s)
      // AC run/size
      var run = 0
      var lastNz = 63
      while (lastNz > 0 && q(lastNz) == 0) lastNz -= 1
      for (k <- 1 to lastNz) {
        if (q(k) == 0) run += 1
        else {
          while (run > 15) { // ZRL
            val (c, l) = acCodes(0xf0); bw.write(c, l); run -= 16
          }
          val sz = category(q(k))
          require(sz <= 10, s"AC coefficient too large for the table: ${q(k)}")
          val (c, l) = acCodes((run << 4) | sz)
          bw.write(c, l)
          bw.write(amplitude(q(k), sz), sz)
          run = 0
        }
      }
      if (lastNz < 63) { val (c, l) = acCodes(0x00); bw.write(c, l) } // EOB
    }
    bw.flush()
    out.write(bw.out.toByteArray, 0, bw.out.size())
    marker(0xd9) // EOI
    out.toByteArray
  }

  // --- decode --------------------------------------------------------------

  /** Parse baseline JPEG bytes into the unified image surface (gray
    * widened to r=g=b); null on any malformation or unsupported
    * feature: wrong markers, progressive (SOF2), multi-component,
    * 12-bit, restart intervals, dims not multiples of 8, truncated
    * entropy data, invalid Huffman codes, or missing EOI. */
  def decode(bytes: Array[Byte]): Ppm.Image = {
    if (bytes == null || bytes.length < 4) return null
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return null
    var i = 2
    var quant: Array[Int] = null
    var dcDec: HuffDecoder = null
    var acDec: HuffDecoder = null
    var w = 0; var h = 0
    def u16(p: Int): Int = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    while (true) {
      if (i + 4 > bytes.length) return null
      if ((bytes(i) & 0xff) != 0xff) return null
      val m = bytes(i + 1) & 0xff
      val len = u16(i + 2)
      if (len < 2 || i + 2 + len > bytes.length) return null
      val seg = i + 4
      m match {
        case 0xdb => // DQT (possibly several tables per segment)
          var p = seg
          while (p < i + 2 + len) {
            val pq = (bytes(p) & 0xff) >> 4
            val tq = bytes(p) & 0x0f
            if (pq != 0) return null // 8-bit tables only
            if (p + 65 > i + 2 + len) return null
            val t = Array.tabulate(64)(k => bytes(p + 1 + k) & 0xff)
            if (tq == 0) quant = t
            p += 65
          }
        case 0xc0 => // SOF0 baseline
          if (len < 11) return null
          if ((bytes(seg) & 0xff) != 8) return null // 8-bit precision
          h = u16(seg + 1); w = u16(seg + 3)
          if ((bytes(seg + 5) & 0xff) != 1) return null // single component
          if ((bytes(seg + 7) & 0xff) != 0x11) return null // 1x1 sampling
          if (w <= 0 || h <= 0 || w % 8 != 0 || h % 8 != 0) return null
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
             0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return null // non-baseline SOF: progressive/arithmetic/…
        case 0xc4 => // DHT (possibly several tables per segment)
          var p = seg
          while (p < i + 2 + len) {
            val cls = (bytes(p) & 0xff) >> 4
            val id = bytes(p) & 0x0f
            if (p + 17 > i + 2 + len) return null
            val bits = Array.tabulate(16)(k => bytes(p + 1 + k) & 0xff)
            val nv = bits.sum
            if (p + 17 + nv > i + 2 + len) return null
            val vals = Array.tabulate(nv)(k => bytes(p + 17 + k) & 0xff)
            if (id == 0) {
              if (cls == 0) dcDec = new HuffDecoder(bits, vals)
              else acDec = new HuffDecoder(bits, vals)
            }
            p += 17 + nv
          }
        case 0xdd => return null // DRI/restart intervals unsupported
        case 0xda => // SOS: entropy-coded data follows
          if (quant == null || dcDec == null || acDec == null || w == 0) return null
          if ((bytes(seg) & 0xff) != 1) return null
          val in = new BitReader(bytes, i + 2 + len)
          val pixels = new Array[Int](w * h)
          var prevDc = 0
          val bw8 = w / 8
          for (by <- 0 until h / 8; bx <- 0 until bw8) {
            val zz = new Array[Int](64)
            val s = dcDec.decode(in)
            if (s < 0 || s > 11) return null
            val diff =
              if (s == 0) 0
              else {
                val a = in.readBits(s)
                if (a == Int.MinValue) return null
                if (a < (1 << (s - 1))) a - (1 << s) + 1 else a // extend (F.2.2.1)
              }
            prevDc += diff
            zz(0) = prevDc
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = acDec.decode(in)
              if (rs < 0) return null
              val run = rs >> 4
              val size = rs & 0x0f
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else eob = true        // EOB
              } else {
                k += run
                if (k > 63) return null
                val a = in.readBits(size)
                if (a == Int.MinValue) return null
                zz(k) = if (a < (1 << (size - 1))) a - (1 << size) + 1 else a
                k += 1
              }
            }
            // dequantize + de-zigzag + IDCT
            val coef = new Array[Double](64)
            for (k2 <- 0 until 64)
              coef(ZigZag(k2)) = zz(k2).toDouble * quant(k2)
            val block = idctToPixels(coef)
            for (y <- 0 until 8; x <- 0 until 8)
              pixels((by * 8 + y) * w + bx * 8 + x) = block(y * 8 + x)
          }
          // entropy data must be followed by EOI (skip the pad byte run)
          var p = in.pos
          while (p + 1 < bytes.length &&
            !((bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xff) == 0xd9)) p += 1
          if (p + 1 >= bytes.length) return null
          val out = new Array[Int](w * h * 3)
          var px = 0
          while (px < w * h) {
            out(px * 3) = pixels(px); out(px * 3 + 1) = pixels(px)
            out(px * 3 + 2) = pixels(px)
            px += 1
          }
          return Ppm.Image(w, h, 255, out)
        case 0xd9 => return null // EOI before any scan
        case _ => () // APPn/COM/etc: skip by length
      }
      i += 2 + len
    }
    null
  }

  /** Deterministic JPEG fixture bytes for an id — complete baseline
    * files whose decode is BIT-EXACT: dims (2 + id%2)·8 x (1 + id%2)·8
    * blocks of 8×8, each block (bx,by) a CONSTANT
    * v = (id·53 + (by·bw + bx)·19) mod 256, quant table all 8s — the
    * DC-exactness configuration (see the object Scaladoc). The decoder
    * still runs the fully general baseline path. */
  def fixtureBytes(id: Long): Array[Byte] = {
    val bw = (2 + java.lang.Math.floorMod(id, 2L)).toInt
    val bh = (1 + java.lang.Math.floorMod(id, 2L)).toInt
    val w = bw * 8; val h = bh * 8
    val gray = new Array[Int](w * h)
    for (by <- 0 until bh; bx <- 0 until bw) {
      val v = java.lang.Math.floorMod(id * 53 + (by * bw + bx) * 19L, 256L).toInt
      for (y <- 0 until 8; x <- 0 until 8)
        gray((by * 8 + y) * w + bx * 8 + x) = v
    }
    encode(w, h, gray)
  }
}
