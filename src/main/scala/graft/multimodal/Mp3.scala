package graft.multimodal

/** REAL parser/serializer for the MPEG-1 Layer III (MP3) FRAME layer —
  * the elementary-stream grammar: an optional ID3v2 tag (10-byte header
  * with a synchsafe 28-bit size, skipped whole), then a walk of audio
  * frames, each a 4-byte big-endian header (11-bit sync, version/layer
  * bits, bitrate index, sampling-rate index, padding bit) followed by
  * `floor(144·bitrate/sample_rate) + padding − 4` payload bytes. The
  * walk must get EVERY frame length right to stay on the sync
  * boundaries — one mis-sized frame desynchronizes the rest — which is
  * what makes the parse hash-checkable: per-frame bitrates vary in the
  * fixtures, so a frame-length bug breaks the count, the byte total,
  * and the bitrate sum. Audio sample DECODE (huffman/MDCT synthesis)
  * genuinely needs a codec and stays behind the marked stub, the same
  * boundary as [[Mp4]]'s frame decode.
  *
  * Scope: MPEG-1 Layer III without CRC (protection bit set), the
  * dominant encoding; anything else (MPEG-2/2.5, Layers I/II, CRC
  * frames, free-format bitrate) returns null — unsupported is a NULL
  * row, never an exception or a wrong answer.
  *
  * Reference semantics: the reference pipeline has no media handling —
  * this is part of the beyond-reference training-data surface.
  */
object Mp3 {

  /** MPEG-1 Layer III bitrate table, kbps; index 0 (free) and 15 (bad)
    * are unsupported. */
  val BitrateKbps: Array[Int] =
    Array(-1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)

  /** MPEG-1 sampling rates, Hz; index 3 is reserved. */
  val SampleRateHz: Array[Int] =
    Array(44100, 48000, 32000, -1)

  /** Samples per MPEG-1 Layer III frame. */
  val SamplesPerFrame = 1152

  /** Parsed stream facts: the sampling rate (constant across a valid
    * stream), the frame count, the Σ of per-frame bitrates (kbps — the
    * exact integer from which any averaging derives), and the audio
    * byte total INCLUDING any skipped ID3v2 tag. durationMs is floor
    * integer math over the exact sample count, the q14 convention. */
  final case class Info(sampleRate: Int, nFrames: Long, sumBitrateKbps: Long,
      nBytes: Long) {
    def nSamples: Long = nFrames * SamplesPerFrame
    def durationMs: Long = nSamples * 1000L / sampleRate
  }

  /** Frame length in bytes for MPEG-1 Layer III: header + payload. */
  private def frameLen(kbps: Int, rateHz: Int, padding: Int): Int =
    (144000 * kbps / rateHz) + padding

  /** Parse the stream; null on ANY malformation or unsupported variant:
    * too short, bad sync, non-MPEG-1-Layer-III, CRC-protected frames,
    * free/bad bitrate index, reserved sampling-rate index, a sampling
    * rate that changes mid-stream, a truncated final frame, an ID3v2
    * size overrunning the buffer, or zero audio frames. */
  def decode(bytes: Array[Byte]): Info = {
    if (bytes == null || bytes.length < 4) return null
    var i = 0
    val n = bytes.length
    // optional ID3v2 tag: "ID3" ver(2) flags(1) synchsafe-size(4)
    if (n >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      // synchsafe: 4 × 7 bits, high bit of each byte must be clear
      var sz = 0L
      var k = 6
      while (k < 10) {
        if ((bytes(k) & 0x80) != 0) return null
        sz = (sz << 7) | (bytes(k) & 0x7f)
        k += 1
      }
      val skip = 10L + sz
      if (skip > n) return null
      i = skip.toInt
    }
    var sampleRate = 0
    var nFrames = 0L
    var sumKbps = 0L
    while (i < n) {
      if (i + 4 > n) return null // trailing garbage shorter than a header
      val h = ((bytes(i) & 0xff) << 24) | ((bytes(i + 1) & 0xff) << 16) |
        ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
      if ((h >>> 21) != 0x7ff) return null        // 11-bit sync
      if (((h >>> 19) & 0x3) != 0x3) return null  // version: MPEG-1 only
      if (((h >>> 17) & 0x3) != 0x1) return null  // layer: III only
      if (((h >>> 16) & 0x1) != 0x1) return null  // CRC frames unsupported
      val brIdx = (h >>> 12) & 0xf
      val srIdx = (h >>> 10) & 0x3
      val padding = (h >>> 9) & 0x1
      val kbps = BitrateKbps(brIdx)
      val rate = SampleRateHz(srIdx)
      if (kbps < 0 || rate < 0) return null       // free/bad/reserved
      if (sampleRate == 0) sampleRate = rate
      else if (sampleRate != rate) return null    // rate must not change
      val len = frameLen(kbps, rate, padding)
      if (i + len > n) return null                // truncated final frame
      nFrames += 1
      sumKbps += kbps
      i += len
    }
    if (nFrames == 0) return null
    Info(sampleRate, nFrames, sumKbps, n.toLong)
  }

  /** Serialize a canonical stream: optional ID3v2 tag with a zeroed
    * payload of `id3Payload` bytes, then one frame per (bitrateIdx,
    * padding) pair at the given sampling-rate index — spec-exact frame
    * lengths with zeroed payloads (silence; real side-info/huffman data
    * needs a codec, which parsing does not). Inverse of [[decode]] for
    * the facts it carries. */
  def encode(srIdx: Int, frames: Seq[(Int, Int)], id3Payload: Int = -1): Array[Byte] = {
    require(srIdx >= 0 && srIdx <= 2, s"bad sampling-rate index $srIdx")
    frames.foreach { case (br, pad) =>
      require(br >= 1 && br <= 14, s"bad bitrate index $br")
      require(pad == 0 || pad == 1, s"bad padding bit $pad")
    }
    require(id3Payload < (1 << 28), "ID3v2 size field is 28-bit")
    val rate = SampleRateHz(srIdx)
    val total = (if (id3Payload >= 0) 10 + id3Payload else 0) +
      frames.map { case (br, pad) => frameLen(BitrateKbps(br), rate, pad) }.sum
    val out = new Array[Byte](total)
    var i = 0
    if (id3Payload >= 0) {
      out(0) = 'I'; out(1) = 'D'; out(2) = '3'
      out(3) = 4; out(4) = 0 // v2.4.0
      out(5) = 0             // flags
      out(6) = ((id3Payload >> 21) & 0x7f).toByte
      out(7) = ((id3Payload >> 14) & 0x7f).toByte
      out(8) = ((id3Payload >> 7) & 0x7f).toByte
      out(9) = (id3Payload & 0x7f).toByte
      i = 10 + id3Payload // tag payload stays zeroed
    }
    frames.foreach { case (br, pad) =>
      // sync(11)=all-ones | version(2)=11 | layer(2)=01 | no-CRC(1)=1
      // | bitrate(4) | samplerate(2) | padding(1) | private(1)=0
      // | mode(2)=11 mono | ext(2) copyright(1) original(1)=1 emphasis(2)
      val h = (0x7ff << 21) | (0x3 << 19) | (0x1 << 17) | (1 << 16) |
        (br << 12) | (srIdx << 10) | (pad << 9) | (0x3 << 6) | (1 << 2)
      out(i) = (h >>> 24).toByte; out(i + 1) = (h >>> 16).toByte
      out(i + 2) = (h >>> 8).toByte; out(i + 3) = h.toByte
      i += frameLen(BitrateKbps(br), rate, pad) // payload stays zeroed
    }
    out
  }

  /** Deterministic MP3 fixture bytes for an id — REAL, spec-exact
    * streams a frame walker must parse frame-by-frame:
    *   sampling rate  = [44100, 48000, 32000][id mod 3]
    *   frame count    = 2 + id mod 5
    *   frame j bitrate index = 9 + (id + j) mod 3   (128/160/192 kbps)
    *   frame j padding       = (id + j) mod 2
    *   ID3v2 tag iff id mod 4 = 0, payload = id mod 7 bytes
    * Per-frame bitrates VARY, so every frame length differs — pure id
    * arithmetic end-to-end for the DuckDB mirror, yet only a correct
    * walk reproduces the totals. */
  def fixtureBytes(id: Long): Array[Byte] = {
    val srIdx = java.lang.Math.floorMod(id, 3L).toInt
    val nFrames = (2 + java.lang.Math.floorMod(id, 5L)).toInt
    val frames = (0 until nFrames).map { j =>
      ((9 + java.lang.Math.floorMod(id + j, 3L)).toInt,
        java.lang.Math.floorMod(id + j, 2L).toInt)
    }
    val id3 = if (java.lang.Math.floorMod(id, 4L) == 0L)
      java.lang.Math.floorMod(id, 7L).toInt else -1
    encode(srIdx, frames, id3)
  }
}
