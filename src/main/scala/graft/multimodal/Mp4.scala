package graft.multimodal

/** REAL parser/serializer for the ISO BMFF (MP4) CONTAINER layer — the
  * box/atom grammar: `[size:be32][type:4cc][payload]`, 64-bit
  * `largesize` when size==1, size==0 meaning to-end-of-file, unknown
  * boxes skipped, `moov` recursed into for the `mvhd` movie header
  * (version 0 and 1 layouts) that carries the movie timescale and
  * duration. This is the video analog of [[Wav]]'s RIFF move: the
  * container STRUCTURE and metadata parse end-to-end without any codec
  * library — sample/frame DECODE (h264 etc.) genuinely needs one and
  * stays behind the clearly-marked stub in [[Multimodal]] (the
  * frame-sampling plumbing consumes the REAL duration parsed here).
  *
  * Reference semantics (capability parity, not code): the reference
  * pipeline has no media handling at all — this layer is part of the
  * beyond-reference training-data surface the build prompt requires.
  */
object Mp4 {

  /** Parsed container metadata: the ftyp major brand, the mvhd movie
    * timescale (ticks/second) and duration (ticks), and the top-level
    * box count. duration_ms is floor integer math, the q14 convention. */
  final case class Meta(majorBrand: String, timescale: Int, duration: Long,
      nTopBoxes: Int) {
    def durationMs: Long = duration * 1000L / timescale
  }

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "US-ASCII")

  /** Parse the container; null on ANY malformation (header short of 8
    * bytes, size smaller than its own header, truncated box, missing or
    * malformed ftyp/moov/mvhd, zero timescale) — the expression layer
    * turns that into a NULL row, never an exception, so one corrupt blob
    * cannot fail a 100 TB scan. Unknown boxes (free, skip, uuid, mdat…)
    * are skipped by their declared size at BOTH nesting levels. */
  def decode(bytes: Array[Byte]): Meta = {
    if (bytes == null || bytes.length < 8) return null
    val n = bytes.length
    var brand: String = null
    var timescale = 0
    var duration = -1L
    var nTop = 0
    // walk one box level: returns (type, payloadStart, payloadEnd, nextBox)
    // or null on structural malformation
    def boxAt(i: Int, end: Int): (String, Int, Int, Int) = {
      if (i + 8 > end) return null
      val size32 = be32(bytes, i)
      val typ = fourcc(bytes, i + 4)
      var payload = i + 8
      val boxEnd: Long =
        if (size32 == 0L) end.toLong // to end of enclosing scope
        else if (size32 == 1L) {
          if (i + 16 > end) return null
          payload = i + 16
          i + be64(bytes, i + 8) // largesize counts from the box start
        } else i + size32
      if (boxEnd < payload || boxEnd > end) return null
      (typ, payload, boxEnd.toInt, boxEnd.toInt)
    }
    def parseMvhd(start: Int, end: Int): Boolean = {
      if (start >= end) return false
      val version = bytes(start) & 0xff
      // v0: ver/flags(4) ctime(4) mtime(4) timescale(4) duration(4)
      // v1: ver/flags(4) ctime(8) mtime(8) timescale(4) duration(8)
      if (version == 0) {
        if (start + 20 > end) return false
        timescale = be32(bytes, start + 12).toInt
        duration = be32(bytes, start + 16)
      } else if (version == 1) {
        if (start + 32 > end) return false
        timescale = be32(bytes, start + 20).toInt
        duration = be64(bytes, start + 24)
      } else return false
      timescale > 0 && duration >= 0
    }
    var i = 0
    while (i < n) {
      val box = boxAt(i, n)
      if (box == null) return null
      val (typ, payload, boxEnd, next) = box
      nTop += 1
      typ match {
        case "ftyp" =>
          if (boxEnd - payload < 8) return null // major brand + minor version
          brand = fourcc(bytes, payload)
        case "moov" =>
          // second level: find mvhd among moov's children
          var j = payload
          while (j < boxEnd) {
            val child = boxAt(j, boxEnd)
            if (child == null) return null
            val (ctyp, cpay, cend, cnext) = child
            if (ctyp == "mvhd" && !parseMvhd(cpay, cend)) return null
            j = cnext
          }
        case _ => () // mdat, free, skip, uuid, … — skip by declared size
      }
      i = next
    }
    if (brand == null || duration < 0) return null // no ftyp / no mvhd
    Meta(brand, timescale, duration, nTop)
  }

  /** Serialize a canonical minimal container: `ftyp` (major brand +
    * minor version only), `moov` holding one spec-complete version-0
    * `mvhd` (108 bytes), and an `mdat` with the given payload. Inverse
    * of [[decode]] for the metadata it carries. */
  def encode(majorBrand: String, timescale: Int, duration: Long,
      mdat: Array[Byte]): Array[Byte] = {
    require(majorBrand.length == 4, s"brand must be a 4cc: '$majorBrand'")
    require(timescale > 0, s"bad timescale $timescale")
    require(duration >= 0 && duration <= 0xffffffffL,
      s"v0 mvhd duration out of 32-bit range: $duration")
    val out = java.nio.ByteBuffer.allocate(16 + 116 + 8 + mdat.length)
    def put32(v: Long): Unit = out.putInt((v & 0xffffffffL).toInt)
    // ftyp
    put32(16); out.put("ftyp".getBytes("US-ASCII"))
    out.put(majorBrand.getBytes("US-ASCII")); put32(0) // minor version
    // moov > mvhd (v0, 108 bytes: 8 header + 100 payload)
    put32(116); out.put("moov".getBytes("US-ASCII"))
    put32(108); out.put("mvhd".getBytes("US-ASCII"))
    put32(0)          // version 0 + flags
    put32(0); put32(0) // creation/modification time
    put32(timescale); put32(duration)
    put32(0x00010000L) // rate 1.0
    out.putShort(0x0100.toShort); out.putShort(0) // volume 1.0 + reserved
    put32(0); put32(0) // reserved
    // identity matrix (9 × 4 bytes)
    put32(0x00010000L); put32(0); put32(0)
    put32(0); put32(0x00010000L); put32(0)
    put32(0); put32(0); put32(0x40000000L)
    for (_ <- 0 until 6) put32(0) // pre_defined
    put32(0)          // next_track_id
    // mdat
    put32(8L + mdat.length); out.put("mdat".getBytes("US-ASCII"))
    out.put(mdat)
    out.array()
  }

  /** Deterministic MP4 fixture bytes for an id — REAL, complete minimal
    * containers (box tree walkable by any BMFF tool): brand "isom",
    *   timescale   = 600 + (id mod 3)·400      (600 / 1000 / 1400)
    *   duration    = 1200 + (id mod 5)·700     (ticks)
    *   mdat bytes  = 1 + id mod 9, byte j = (id·13 + j·17) mod 256
    * — every field arithmetic-mirrorable in DuckDB without touching
    * bytes (the Ppm/Wav fixture move for video). */
  def fixtureBytes(id: Long): Array[Byte] = {
    val ts = (600 + java.lang.Math.floorMod(id, 3L) * 400).toInt
    val dur = 1200 + java.lang.Math.floorMod(id, 5L) * 700
    val nPayload = (1 + java.lang.Math.floorMod(id, 9L)).toInt
    val payload = new Array[Byte](nPayload)
    var j = 0
    while (j < nPayload) {
      payload(j) = java.lang.Math.floorMod(id * 13 + j * 17L, 256L).toByte
      j += 1
    }
    encode("isom", ts, dur, payload)
  }
}
