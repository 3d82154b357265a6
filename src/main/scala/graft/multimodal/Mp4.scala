package graft.multimodal

/** REAL parser/serializer for the ISO BMFF (MP4) CONTAINER layer — the
  * box/atom grammar: `[size:be32][type:4cc][payload]`, 64-bit
  * `largesize` when size==1, size==0 meaning to-end-of-file, unknown
  * boxes skipped, `moov` recursed into for the `mvhd` movie header
  * (version 0 and 1 layouts) that carries the movie timescale and
  * duration — and, since r9, the TRACK layer: `trak > tkhd` (track id),
  * `trak > mdia > mdhd` (media timescale/duration, v0 and v1) and
  * `trak > mdia > minf > stbl > stts` (the time-to-sample table whose
  * run-length entries carry the real per-track sample/frame count).
  * This is the video analog of [[Wav]]'s RIFF move: the container
  * STRUCTURE and metadata parse end-to-end without any codec
  * library — sample/frame DECODE (h264 etc.) genuinely needs one and
  * stays behind the clearly-marked stub in [[Multimodal]] (the
  * frame-sampling plumbing consumes the REAL durations and stts sample
  * counts parsed here).
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

  /** Parsed per-track metadata: tkhd track id, mdhd MEDIA timescale and
    * duration (track time is expressed in its own timescale, not the
    * movie's — the spec's one big trap), and the stts-derived sample
    * count (Σ entry sample_counts — for video tracks this IS the frame
    * count). */
  final case class Track(trackId: Long, timescale: Int, duration: Long,
      nSamples: Long) {
    def durationMs: Long = duration * 1000L / timescale
  }

  /** Encoding spec for one track: the stts run-length entries
    * (sampleCount, sampleDelta). Media duration is their exact integral:
    * Σ count·delta — encode derives it so the mdhd and stts layers can
    * never disagree in an encoded container. */
  final case class TrackSpec(trackId: Long, timescale: Int,
      stts: Seq[(Long, Long)]) {
    def duration: Long = stts.iterator.map { case (c, d) => c * d }.sum
    def nSamples: Long = stts.iterator.map(_._1).sum
  }

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "US-ASCII")

  /** Walk one box at `i` within `[i, end)`: (type, payloadStart,
    * payloadEnd, nextBox), or null on structural malformation (header
    * short of 8 bytes, largesize without room, size smaller than its own
    * header, box overrunning its enclosing scope). Shared by the movie-
    * and track-level walks so both enforce identical structure rules. */
  private def boxAt(bytes: Array[Byte], i: Int, end: Int): (String, Int, Int, Int) = {
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
      val box = boxAt(bytes, i, n)
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
            val child = boxAt(bytes, j, boxEnd)
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

  /** Parse the TRACK layer: one [[Track]] per `moov > trak`, in file
    * order. Same totality contract as [[decode]]: null on any structural
    * malformation — including a trak missing its tkhd, mdhd, or stts
    * (all three are mandatory in the spec; their absence means the
    * container is broken, not "a track with defaults") — and an EMPTY
    * array for a well-formed container with no tracks (metadata-only
    * files exist). Unknown siblings at every level (edts, udta, hdlr,
    * vmhd, stsd, stsz, stco, …) are skipped by declared size. */
  def decodeTracks(bytes: Array[Byte]): Array[Track] = {
    if (bytes == null || bytes.length < 8) return null
    val n = bytes.length
    val out = scala.collection.mutable.ArrayBuffer[Track]()
    // returns false on malformation
    def parseTrak(start: Int, end: Int): Boolean = {
      var trackId = -1L
      var timescale = 0
      var duration = -1L
      var nSamples = -1L
      def parseTkhd(s: Int, e: Int): Boolean = {
        if (s >= e) return false
        val v = bytes(s) & 0xff
        // v0: ver/flags(4) ctime(4) mtime(4) track_id(4)
        // v1: ver/flags(4) ctime(8) mtime(8) track_id(4)
        if (v == 0) { if (s + 16 > e) return false; trackId = be32(bytes, s + 12) }
        else if (v == 1) { if (s + 24 > e) return false; trackId = be32(bytes, s + 20) }
        else return false
        trackId > 0 // 0 is reserved/invalid per spec
      }
      def parseMdhd(s: Int, e: Int): Boolean = {
        if (s >= e) return false
        val v = bytes(s) & 0xff
        // layouts mirror mvhd exactly
        if (v == 0) {
          if (s + 20 > e) return false
          timescale = be32(bytes, s + 12).toInt
          duration = be32(bytes, s + 16)
        } else if (v == 1) {
          if (s + 32 > e) return false
          timescale = be32(bytes, s + 20).toInt
          duration = be64(bytes, s + 24)
        } else return false
        timescale > 0 && duration >= 0
      }
      def parseStts(s: Int, e: Int): Boolean = {
        // ver/flags(4) entry_count(4) then (sample_count, sample_delta)×n
        if (s + 8 > e) return false
        if ((bytes(s) & 0xff) != 0) return false // only version 0 exists
        val entries = be32(bytes, s + 4)
        if (s + 8 + entries * 8 > e) return false
        var total = 0L
        var k = 0L
        while (k < entries) {
          total += be32(bytes, s + 8 + (k * 8).toInt)
          k += 1
        }
        nSamples = total
        true
      }
      // walk a container box's children looking for one named target,
      // recursing through the given path: trak > {tkhd, mdia > {mdhd,
      // minf > stbl > stts}}
      def walk(s: Int, e: Int, handle: ((String, Int, Int)) => Boolean): Boolean = {
        var j = s
        while (j < e) {
          val child = boxAt(bytes, j, e)
          if (child == null) return false
          val (typ, pay, pend, next) = child
          if (!handle((typ, pay, pend))) return false
          j = next
        }
        true
      }
      val ok = walk(start, end, {
        case ("tkhd", s, e) => parseTkhd(s, e)
        case ("mdia", ms, me) => walk(ms, me, {
          case ("mdhd", s, e) => parseMdhd(s, e)
          case ("minf", fs, fe) => walk(fs, fe, {
            case ("stbl", bs, be) => walk(bs, be, {
              case ("stts", s, e) => parseStts(s, e)
              case _ => true // stsd, stsz, stco, … skipped
            })
            case _ => true // vmhd, smhd, dinf, … skipped
          })
          case _ => true // hdlr, elng, … skipped
        })
        case _ => true // edts, udta, … skipped
      })
      if (!ok || trackId < 0 || timescale <= 0 || duration < 0 || nSamples < 0)
        return false // mandatory box absent or malformed
      out += Track(trackId, timescale, duration, nSamples)
      true
    }
    var i = 0
    while (i < n) {
      val box = boxAt(bytes, i, n)
      if (box == null) return null
      val (typ, payload, boxEnd, next) = box
      if (typ == "moov") {
        var j = payload
        while (j < boxEnd) {
          val child = boxAt(bytes, j, boxEnd)
          if (child == null) return null
          val (ctyp, cpay, cend, cnext) = child
          if (ctyp == "trak" && !parseTrak(cpay, cend)) return null
          j = cnext
        }
      }
      i = next
    }
    out.toArray
  }

  /** Serialize a canonical minimal container: `ftyp` (major brand +
    * minor version only), `moov` holding one spec-complete version-0
    * `mvhd` (108 bytes), and an `mdat` with the given payload. Inverse
    * of [[decode]] for the metadata it carries. */
  def encode(majorBrand: String, timescale: Int, duration: Long,
      mdat: Array[Byte]): Array[Byte] =
    encodeWithTracks(majorBrand, timescale, duration, Nil, mdat)

  /** Serialize a canonical container with real track structure: each
    * [[TrackSpec]] becomes `trak > tkhd` (v0, 92-byte box) + `mdia >
    * mdhd` (v0, 32-byte box, language 'und') + `mdia > minf > stbl >
    * stts` with the spec's run-length entries; the mdhd duration is the
    * exact stts integral. Inverse of [[decodeTracks]]. */
  def encodeWithTracks(majorBrand: String, timescale: Int, duration: Long,
      tracks: Seq[TrackSpec], mdat: Array[Byte]): Array[Byte] = {
    require(majorBrand.length == 4, s"brand must be a 4cc: '$majorBrand'")
    require(timescale > 0, s"bad timescale $timescale")
    require(duration >= 0 && duration <= 0xffffffffL,
      s"v0 mvhd duration out of 32-bit range: $duration")
    tracks.foreach { t =>
      require(t.trackId > 0 && t.trackId <= 0xffffffffL, s"bad track id ${t.trackId}")
      require(t.timescale > 0, s"bad track timescale ${t.timescale}")
      require(t.duration <= 0xffffffffL,
        s"v0 mdhd duration out of 32-bit range: ${t.duration}")
      t.stts.foreach { case (c, d) =>
        require(c >= 0 && c <= 0xffffffffL && d >= 0 && d <= 0xffffffffL,
          s"stts entry out of 32-bit range: ($c, $d)")
      }
    }
    def trakSize(t: TrackSpec): Int = {
      val stts = 16 + 8 * t.stts.length
      val stbl = 8 + stts
      val minf = 8 + stbl
      val mdia = 8 + 32 + minf
      8 + 92 + mdia
    }
    val moovSize = 8 + 108 + tracks.map(trakSize).sum
    val out = java.nio.ByteBuffer.allocate(16 + moovSize + 8 + mdat.length)
    def put32(v: Long): Unit = out.putInt((v & 0xffffffffL).toInt)
    // ftyp
    put32(16); out.put("ftyp".getBytes("US-ASCII"))
    out.put(majorBrand.getBytes("US-ASCII")); put32(0) // minor version
    // moov > mvhd (v0, 108 bytes: 8 header + 100 payload)
    put32(moovSize); out.put("moov".getBytes("US-ASCII"))
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
    // moov > trak per spec'd track
    tracks.foreach { t =>
      val sttsBox = 16 + 8 * t.stts.length
      val stblBox = 8 + sttsBox
      val minfBox = 8 + stblBox
      val mdiaBox = 8 + 32 + minfBox
      put32(8 + 92 + mdiaBox); out.put("trak".getBytes("US-ASCII"))
      // tkhd v0 (92-byte box): the one field the track layer keys on is
      // track_id; duration here is in MOVIE timescale per spec (floor-
      // rescaled from media time), layer/volume/matrix canonical zeros.
      put32(92); out.put("tkhd".getBytes("US-ASCII"))
      put32(7)           // version 0 + flags (enabled | in movie | in preview)
      put32(0); put32(0) // creation/modification time
      put32(t.trackId)
      put32(0)           // reserved
      put32(t.duration * timescale / t.timescale) // movie-timescale duration
      put32(0); put32(0) // reserved
      out.putShort(0); out.putShort(0) // layer, alternate_group
      out.putShort(0); out.putShort(0) // volume (0 for video), reserved
      put32(0x00010000L); put32(0); put32(0)
      put32(0); put32(0x00010000L); put32(0)
      put32(0); put32(0); put32(0x40000000L)
      put32(0); put32(0)  // width, height (fixed-point; 0 = non-visual)
      // mdia > mdhd v0 (32-byte box)
      put32(mdiaBox); out.put("mdia".getBytes("US-ASCII"))
      put32(32); out.put("mdhd".getBytes("US-ASCII"))
      put32(0)           // version 0 + flags
      put32(0); put32(0) // creation/modification time
      put32(t.timescale); put32(t.duration)
      out.putShort(0x55c4.toShort) // language 'und' (5-bit packed)
      out.putShort(0)    // pre_defined
      // mdia > minf > stbl > stts
      put32(minfBox); out.put("minf".getBytes("US-ASCII"))
      put32(stblBox); out.put("stbl".getBytes("US-ASCII"))
      put32(sttsBox); out.put("stts".getBytes("US-ASCII"))
      put32(0)           // version 0 + flags
      put32(t.stts.length)
      t.stts.foreach { case (c, d) => put32(c); put32(d) }
    }
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

  /** Deterministic fixture with REAL track structure — [[fixtureBytes]]'
    * movie-level laws plus, for track k (0-based, of 1 + id mod 2):
    *   track_id        = k + 1
    *   media timescale = 1000 + ((id + k) mod 4)·500
    *   stts            = [(3 + (id + k) mod 5, 100), (1 + (id + k) mod 3, 250)]
    *   ⇒ n_samples     = n1 + n2,   media duration = n1·100 + n2·250
    * — pure id arithmetic end-to-end, so the track layer gets the same
    * full-arithmetic DuckDB oracle treatment as the movie layer. */
  def fixtureBytesWithTracks(id: Long): Array[Byte] = {
    val ts = (600 + java.lang.Math.floorMod(id, 3L) * 400).toInt
    val dur = 1200 + java.lang.Math.floorMod(id, 5L) * 700
    val nPayload = (1 + java.lang.Math.floorMod(id, 9L)).toInt
    val payload = new Array[Byte](nPayload)
    var j = 0
    while (j < nPayload) {
      payload(j) = java.lang.Math.floorMod(id * 13 + j * 17L, 256L).toByte
      j += 1
    }
    val nTracks = (1 + java.lang.Math.floorMod(id, 2L)).toInt
    val tracks = (0 until nTracks).map { k =>
      val n1 = 3 + java.lang.Math.floorMod(id + k, 5L)
      val n2 = 1 + java.lang.Math.floorMod(id + k, 3L)
      TrackSpec(k + 1L, (1000 + java.lang.Math.floorMod(id + k, 4L) * 500).toInt,
        Seq((n1, 100L), (n2, 250L)))
    }
    encodeWithTracks("isom", ts, dur, tracks, payload)
  }

  // ----------------------------------------------------------------------
  // SAMPLE TABLES — the stsz/stsc/stco(/co64) machinery that maps a
  // sample index to its exact byte range in mdat. With it, per-sample
  // byte EXTRACTION is real with zero codec involvement: only the
  // DECODE of those bytes (h264/aac) stays behind the codec stub.

  /** One sample's resolved location: which track, which index within the
    * track, and the absolute byte range in the file. */
  final case class SampleRef(trackId: Long, sampleIdx: Long, offset: Long,
      size: Int)

  /** Encoding spec for a track WITH sample data: stts runs as in
    * [[TrackSpec]], the per-sample byte payloads, and the chunk layout
    * (samples per chunk, summing to the sample count — real files chunk
    * their samples, and the encoder interleaves chunks across tracks so
    * stco/stsc genuinely matter). stts total sample count must equal
    * `samples.length`. */
  final case class SampledTrack(trackId: Long, timescale: Int,
      stts: Seq[(Long, Long)], samples: Seq[Array[Byte]],
      samplesPerChunk: Seq[Int]) {
    def duration: Long = stts.iterator.map { case (c, d) => c * d }.sum
    def nSamples: Int = samples.length
    require(stts.iterator.map(_._1).sum == samples.length,
      s"stts sample count != ${samples.length}")
    require(samplesPerChunk.sum == samples.length && samplesPerChunk.forall(_ > 0),
      s"chunk layout ${samplesPerChunk} must partition ${samples.length} samples")
  }

  /** Resolve EVERY sample of every track to its absolute byte range —
    * the full spec algorithm: stsz (uniform or per-sample sizes), stsc
    * run-length sample-to-chunk mapping, stco/co64 chunk offsets; sample
    * j's offset is its chunk's offset plus the sizes of the samples
    * before it in that chunk. Null on ANY malformation: missing or
    * inconsistent tables (stsz count ≠ stts count, stsc runs not
    * covering the chunks, samples overrunning the chunk count or the
    * file end). Empty array for a trackless container. */
  def sampleRefs(bytes: Array[Byte]): Array[SampleRef] = {
    if (bytes == null || bytes.length < 8) return null
    val n = bytes.length
    val out = scala.collection.mutable.ArrayBuffer[SampleRef]()
    def parseTrak(start: Int, end: Int): Boolean = {
      var trackId = -1L
      var sttsCount = -1L
      var sizes: Array[Int] = null        // per-sample sizes (expanded)
      var stscRuns: Array[(Long, Long)] = null // (first_chunk, samples_per_chunk)
      var chunkOffs: Array[Long] = null
      def parseTkhd(s: Int, e: Int): Boolean = {
        if (s >= e) return false
        val v = bytes(s) & 0xff
        if (v == 0) { if (s + 16 > e) return false; trackId = be32(bytes, s + 12) }
        else if (v == 1) { if (s + 24 > e) return false; trackId = be32(bytes, s + 20) }
        else return false
        trackId > 0
      }
      def parseStts(s: Int, e: Int): Boolean = {
        if (s + 8 > e || (bytes(s) & 0xff) != 0) return false
        val entries = be32(bytes, s + 4)
        if (s + 8 + entries * 8 > e) return false
        var total = 0L
        var k = 0L
        while (k < entries) { total += be32(bytes, s + 8 + (k * 8).toInt); k += 1 }
        sttsCount = total
        true
      }
      def parseStsz(s: Int, e: Int): Boolean = {
        // ver/flags(4) sample_size(4) sample_count(4) [sizes if size==0]
        if (s + 12 > e || (bytes(s) & 0xff) != 0) return false
        val uniform = be32(bytes, s + 4)
        val count = be32(bytes, s + 8)
        if (count > Int.MaxValue) return false
        if (uniform != 0L) {
          if (uniform > Int.MaxValue) return false
          // a uniform table is tiny on disk, so bound the EXPANSION by the
          // file itself (count samples of uniform>=1 bytes must fit) —
          // otherwise a hostile header allocates gigabytes before any
          // validity check can fail it
          if (count > n || uniform * count > n) return false
          sizes = Array.fill(count.toInt)(uniform.toInt)
        } else {
          if (s + 12 + count * 4 > e) return false
          sizes = new Array[Int](count.toInt)
          var k = 0
          while (k < sizes.length) {
            val v = be32(bytes, s + 12 + k * 4)
            if (v > Int.MaxValue) return false
            sizes(k) = v.toInt
            k += 1
          }
        }
        true
      }
      def parseStsc(s: Int, e: Int): Boolean = {
        // ver/flags(4) entry_count(4) then (first_chunk, samples_per_chunk,
        // sample_description_index) triples
        if (s + 8 > e || (bytes(s) & 0xff) != 0) return false
        val entries = be32(bytes, s + 4)
        if (s + 8 + entries * 12 > e) return false
        val runs = new Array[(Long, Long)](entries.toInt)
        var k = 0
        var prevFirst = 0L
        while (k < runs.length) {
          val first = be32(bytes, s + 8 + k * 12)
          val spc = be32(bytes, s + 12 + k * 12)
          if (first <= prevFirst || spc <= 0) return false // strictly ascending
          runs(k) = (first, spc)
          prevFirst = first
          k += 1
        }
        stscRuns = runs
        true
      }
      def parseStco(s: Int, e: Int, wide: Boolean): Boolean = {
        if (s + 8 > e || (bytes(s) & 0xff) != 0) return false
        val entries = be32(bytes, s + 4)
        val w = if (wide) 8 else 4
        if (s + 8 + entries * w > e) return false
        chunkOffs = new Array[Long](entries.toInt)
        var k = 0
        while (k < chunkOffs.length) {
          chunkOffs(k) = if (wide) be64(bytes, s + 8 + k * 8)
                         else be32(bytes, s + 8 + k * 4)
          k += 1
        }
        true
      }
      def walk(s: Int, e: Int, handle: ((String, Int, Int)) => Boolean): Boolean = {
        var j = s
        while (j < e) {
          val child = boxAt(bytes, j, e)
          if (child == null) return false
          val (typ, pay, pend, next) = child
          if (!handle((typ, pay, pend))) return false
          j = next
        }
        true
      }
      val ok = walk(start, end, {
        case ("tkhd", s, e) => parseTkhd(s, e)
        case ("mdia", ms, me) => walk(ms, me, {
          case ("minf", fs, fe) => walk(fs, fe, {
            case ("stbl", bs, be) => walk(bs, be, {
              case ("stts", s, e) => parseStts(s, e)
              case ("stsz", s, e) => parseStsz(s, e)
              case ("stsc", s, e) => parseStsc(s, e)
              case ("stco", s, e) => parseStco(s, e, wide = false)
              case ("co64", s, e) => parseStco(s, e, wide = true)
              case _ => true
            })
            case _ => true
          })
          case _ => true
        })
        case _ => true
      })
      if (!ok || trackId < 0 || sttsCount < 0 || sizes == null ||
        stscRuns == null || chunkOffs == null) return false
      if (sizes.length.toLong != sttsCount) return false // stsz vs stts
      // expand the stsc runs across the stco chunk list and resolve every
      // sample: run r applies from first_chunk(r) to first_chunk(r+1)-1
      var sample = 0
      var run = 0
      var chunk = 0 // 0-based; spec chunks are 1-based
      while (chunk < chunkOffs.length && sample < sizes.length) {
        if (run + 1 < stscRuns.length && chunk + 1 >= stscRuns(run + 1)._1) run += 1
        if (chunk + 1 < stscRuns(run)._1) return false // chunk before first run
        val inChunk = stscRuns(run)._2
        var off = chunkOffs(chunk)
        var k = 0L
        while (k < inChunk && sample < sizes.length) {
          val sz = sizes(sample)
          if (off < 0 || off + sz > n) return false // sample outside the file
          out += SampleRef(trackId, sample.toLong, off, sz)
          off += sz
          sample += 1
          k += 1
        }
        chunk += 1
      }
      if (sample != sizes.length) return false // chunks did not cover samples
      true
    }
    var i = 0
    while (i < n) {
      val box = boxAt(bytes, i, n)
      if (box == null) return null
      val (typ, payload, boxEnd, next) = box
      if (typ == "moov") {
        var j = payload
        while (j < boxEnd) {
          val child = boxAt(bytes, j, boxEnd)
          if (child == null) return null
          val (ctyp, cpay, cend, cnext) = child
          if (ctyp == "trak" && !parseTrak(cpay, cend)) return null
          j = cnext
        }
      }
      i = next
    }
    out.toArray
  }

  /** Extract one sample's actual bytes — the codec-free "frame
    * extraction" a training pipeline wants before decode. Null when the
    * container is malformed or the (trackId, sampleIdx) doesn't exist. */
  def sampleBytes(bytes: Array[Byte], trackId: Long, sampleIdx: Long): Array[Byte] = {
    val refs = sampleRefs(bytes)
    if (refs == null) return null
    refs.find(r => r.trackId == trackId && r.sampleIdx == sampleIdx) match {
      case Some(r) => java.util.Arrays.copyOfRange(bytes, r.offset.toInt,
        (r.offset + r.size).toInt)
      case None => null
    }
  }

  /** Serialize a container with FULL sample tables: per track stts +
    * stsz (per-sample sizes) + stsc (run-length chunk layout) + stco,
    * with the mdat chunks INTERLEAVED round-robin across tracks (chunk 0
    * of every track, then chunk 1 of every track, …) the way real muxers
    * interleave audio/video — so the chunk-offset table is load-bearing,
    * not decorative. Inverse of [[sampleRefs]]/[[sampleBytes]]. */
  def encodeWithSampleTables(majorBrand: String, timescale: Int,
      duration: Long, tracks: Seq[SampledTrack]): Array[Byte] = {
    require(majorBrand.length == 4, s"brand must be a 4cc: '$majorBrand'")
    require(timescale > 0 && duration >= 0 && duration <= 0xffffffffL)
    tracks.foreach { t =>
      require(t.trackId > 0 && t.timescale > 0 && t.duration <= 0xffffffffL)
    }
    def stscRuns(spc: Seq[Int]): Seq[(Int, Int)] = {
      // compress consecutive equal samples-per-chunk into spec runs
      val runs = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      spc.zipWithIndex.foreach { case (c, i) =>
        if (runs.isEmpty || runs.last._2 != c) runs += ((i + 1, c))
      }
      runs.toSeq
    }
    def boxSizes(t: SampledTrack): (Int, Int, Int, Int, Int) = {
      val stts = 16 + 8 * t.stts.length
      val stsz = 20 + 4 * t.nSamples
      val stsc = 16 + 12 * stscRuns(t.samplesPerChunk).length
      val stco = 16 + 4 * t.samplesPerChunk.length
      val stbl = 8 + stts + stsz + stsc + stco
      (stts, stsz, stsc, stco, stbl)
    }
    def trakSize(t: SampledTrack): Int = {
      val (_, _, _, _, stbl) = boxSizes(t)
      8 + 92 + (8 + 32 + (8 + stbl))
    }
    val moovSize = 8 + 108 + tracks.map(trakSize).sum
    val mdatPayload = tracks.map(_.samples.map(_.length).sum).sum
    // chunk offsets: walk the interleaved mdat layout first
    val mdatStart = 16 + moovSize + 8
    val nChunks = tracks.map(_.samplesPerChunk.length)
    val chunkOffsets = Array.fill(tracks.length)(
      scala.collection.mutable.ArrayBuffer[Long]())
    var cursor = mdatStart.toLong
    val maxChunks = if (nChunks.isEmpty) 0 else nChunks.max
    for (c <- 0 until maxChunks; ti <- tracks.indices) {
      val t = tracks(ti)
      if (c < t.samplesPerChunk.length) {
        chunkOffsets(ti) += cursor
        val firstSample = t.samplesPerChunk.take(c).sum
        val inChunk = t.samplesPerChunk(c)
        cursor += t.samples.slice(firstSample, firstSample + inChunk)
          .map(_.length).sum
      }
    }
    val out = java.nio.ByteBuffer.allocate(16 + moovSize + 8 + mdatPayload)
    def put32(v: Long): Unit = out.putInt((v & 0xffffffffL).toInt)
    put32(16); out.put("ftyp".getBytes("US-ASCII"))
    out.put(majorBrand.getBytes("US-ASCII")); put32(0)
    put32(moovSize); out.put("moov".getBytes("US-ASCII"))
    put32(108); out.put("mvhd".getBytes("US-ASCII"))
    put32(0); put32(0); put32(0)
    put32(timescale); put32(duration)
    put32(0x00010000L)
    out.putShort(0x0100.toShort); out.putShort(0)
    put32(0); put32(0)
    put32(0x00010000L); put32(0); put32(0)
    put32(0); put32(0x00010000L); put32(0)
    put32(0); put32(0); put32(0x40000000L)
    for (_ <- 0 until 6) put32(0)
    put32(0)
    tracks.zipWithIndex.foreach { case (t, ti) =>
      val (sttsB, stszB, stscB, stcoB, stblB) = boxSizes(t)
      val minfB = 8 + stblB
      val mdiaB = 8 + 32 + minfB
      put32(8 + 92 + mdiaB); out.put("trak".getBytes("US-ASCII"))
      put32(92); out.put("tkhd".getBytes("US-ASCII"))
      put32(7); put32(0); put32(0)
      put32(t.trackId); put32(0)
      put32(t.duration * timescale / t.timescale)
      put32(0); put32(0)
      out.putShort(0); out.putShort(0); out.putShort(0); out.putShort(0)
      put32(0x00010000L); put32(0); put32(0)
      put32(0); put32(0x00010000L); put32(0)
      put32(0); put32(0); put32(0x40000000L)
      put32(0); put32(0)
      put32(mdiaB); out.put("mdia".getBytes("US-ASCII"))
      put32(32); out.put("mdhd".getBytes("US-ASCII"))
      put32(0); put32(0); put32(0)
      put32(t.timescale); put32(t.duration)
      out.putShort(0x55c4.toShort); out.putShort(0)
      put32(minfB); out.put("minf".getBytes("US-ASCII"))
      put32(stblB); out.put("stbl".getBytes("US-ASCII"))
      put32(sttsB); out.put("stts".getBytes("US-ASCII"))
      put32(0); put32(t.stts.length)
      t.stts.foreach { case (c, d) => put32(c); put32(d) }
      put32(stszB); out.put("stsz".getBytes("US-ASCII"))
      put32(0); put32(0) // per-sample sizes follow
      put32(t.nSamples)
      t.samples.foreach(s => put32(s.length))
      put32(stscB); out.put("stsc".getBytes("US-ASCII"))
      val runs = stscRuns(t.samplesPerChunk)
      put32(0); put32(runs.length)
      runs.foreach { case (first, spc) => put32(first); put32(spc); put32(1) }
      put32(stcoB); out.put("stco".getBytes("US-ASCII"))
      put32(0); put32(chunkOffsets(ti).length)
      chunkOffsets(ti).foreach(put32)
    }
    put32(8L + mdatPayload); out.put("mdat".getBytes("US-ASCII"))
    // interleaved chunk data, same walk as the offset pass
    for (c <- 0 until maxChunks; ti <- tracks.indices) {
      val t = tracks(ti)
      if (c < t.samplesPerChunk.length) {
        val firstSample = t.samplesPerChunk.take(c).sum
        t.samples.slice(firstSample, firstSample + t.samplesPerChunk(c))
          .foreach(out.put)
      }
    }
    out.array()
  }

  /** Deterministic fixture with FULL sample tables — track laws of
    * [[fixtureBytesWithTracks]] plus, for track k, sample j of
    * n = n1 + n2 samples:
    *   size  = 2 + (id + k + j) mod 5          (2..6 bytes)
    *   byte t = (id·31 + k·7 + j·13 + t·3) mod 256
    *   chunks = [2, n − 2]                      (n ≥ 4 always)
    * with mdat chunks interleaved across tracks. Pure id arithmetic
    * end-to-end: the q84 oracle re-derives every size and checksum
    * without touching bytes, yet only a correct stsz/stsc/stco
    * resolution reproduces them from the file. */
  /** Deterministic MJPEG-in-MP4 fixture: ONE video track whose every
    * sample is a COMPLETE baseline JPEG ([[Jpeg.fixtureBytes]] of
    * fid = id·5 + j — the DC-exact per-block-constant configuration, so
    * frame decode is provably bit-exact), n = 2 + id%3 samples, chunk
    * layout [1, n−1] so stsc/stco resolution stays load-bearing. This is
    * the codec stub's first REAL closure: container walk → sample
    * extraction → full baseline-JPEG entropy decode + IDCT, no codec
    * library involved. */
  def fixtureBytesMjpeg(id: Long): Array[Byte] = {
    val n = (2 + java.lang.Math.floorMod(id, 3L)).toInt
    val samples = (0 until n).map(j => Jpeg.fixtureBytes(id * 5 + j))
    val track = SampledTrack(1L, 600, Seq((n.toLong, 100L)), samples,
      Seq(1, n - 1))
    encodeWithSampleTables("isom", 600, n * 100L, Seq(track))
  }

  def fixtureBytesWithSamples(id: Long): Array[Byte] = {
    val ts = (600 + java.lang.Math.floorMod(id, 3L) * 400).toInt
    val dur = 1200 + java.lang.Math.floorMod(id, 5L) * 700
    val nTracks = (1 + java.lang.Math.floorMod(id, 2L)).toInt
    val tracks = (0 until nTracks).map { k =>
      val n1 = 3 + java.lang.Math.floorMod(id + k, 5L)
      val n2 = 1 + java.lang.Math.floorMod(id + k, 3L)
      val nS = (n1 + n2).toInt
      val samples = (0 until nS).map { j =>
        val size = (2 + java.lang.Math.floorMod(id + k + j, 5L)).toInt
        Array.tabulate[Byte](size)(t =>
          java.lang.Math.floorMod(id * 31 + k * 7 + j * 13 + t * 3L, 256L).toByte)
      }
      SampledTrack(k + 1L,
        (1000 + java.lang.Math.floorMod(id + k, 4L) * 500).toInt,
        Seq((n1, 100L), (n2, 250L)), samples, Seq(2, nS - 2))
    }
    encodeWithSampleTables("isom", ts, dur, tracks)
  }
}
