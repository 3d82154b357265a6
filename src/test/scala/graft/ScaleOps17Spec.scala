package graft

/** Ground-truth laws for the round-10 batch-16 operators: MJPEG
  * frame-level video decode (q149). */
class ScaleOps17Spec extends GraftSuite {

  private val sf = "/root/testdata/sf0.001"

  // --- q149 MJPEG frame decode ---------------------------------------------

  test("q149: fixture law — every decoded frame reproduces the per-block-constant pixels exactly") {
    for (id <- 0L to 24L) {
      val bytes = graft.multimodal.Mp4.fixtureBytesMjpeg(id)
      val refs = graft.multimodal.Mp4.sampleRefs(bytes)
      val n = (2 + java.lang.Math.floorMod(id, 3L)).toInt
      assert(refs != null && refs.length == n, s"container $id: $n samples expected")
      refs.foreach { r =>
        val sample = java.util.Arrays.copyOfRange(
          bytes, r.offset.toInt, (r.offset + r.size).toInt)
        val img = graft.multimodal.Jpeg.decode(sample)
        assert(img != null, s"container $id sample ${r.sampleIdx} must decode")
        val fid = id * 5 + r.sampleIdx
        val bw = (2 + java.lang.Math.floorMod(fid, 2L)).toInt
        val bh = (1 + java.lang.Math.floorMod(fid, 2L)).toInt
        assert(img.width == bw * 8 && img.height == bh * 8)
        // every pixel = its block's constant; RGB widened r=g=b
        for (py <- 0 until img.height; px <- 0 until img.width; c <- 0 until 3) {
          val v = java.lang.Math.floorMod(
            fid * 53 + ((py / 8) * bw + px / 8) * 19L, 256L).toInt
          assert(img.samples((py * img.width + px) * 3 + c) == v,
            s"container $id frame $fid pixel ($px,$py)")
        }
      }
    }
  }

  test("q149: kernel totality — mutations and truncations never throw; non-JPEG samples are skipped, not errored") {
    for (id <- Seq(4L, 5L)) {
      val fix = graft.multimodal.Mp4.fixtureBytesMjpeg(id)
      for (i <- fix.indices by 3) { // every 3rd byte keeps the loop fast
        val b = fix.clone(); b(i) = (b(i) ^ 0x5a).toByte
        graft.multimodal.DecodeKernels.mp4JpegFramesRow(b) // null/partial, no throw
      }
      for (i <- 0 to fix.length by 7)
        graft.multimodal.DecodeKernels.mp4JpegFramesRow(fix.take(i))
    }
    // q84's sample fixture carries 2–6 byte opaque samples — a valid
    // container whose samples are NOT JPEGs must yield zero frames
    val opaque = graft.multimodal.Mp4.fixtureBytesWithSamples(3L)
    val arr = graft.multimodal.DecodeKernels.mp4JpegFramesRow(opaque)
    assert(arr != null && arr.numElements() == 0,
      "non-JPEG samples must be skipped (empty array), not null/error")
  }

  test("q149: real corpus — frame stats re-derive from the law through the full plan") {
    val rows = graft.ops.ScaleOps17.q149MjpegFrames(spark, sf).collect()
    assert(rows.nonEmpty)
    // row count = Σ over docs of (2 + id%3)
    val ids = graft.ops.Relational.t(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id").cast("long"))
      .collect().map(_.getLong(0))
    assert(rows.length == ids.map(id => 2 + java.lang.Math.floorMod(id, 3L)).sum)
    rows.take(200).foreach { r =>
      val id = r.getAs[Long]("media_id")
      val j = r.getAs[Long]("sample_idx")
      val fid = id * 5 + j
      val bw = (2 + java.lang.Math.floorMod(fid, 2L)).toInt
      val bh = (1 + java.lang.Math.floorMod(fid, 2L)).toInt
      val w = bw * 8; val h = bh * 8
      assert(r.getAs[Long]("track_id") == 1L)
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      var sum = 0L; var chk = 0L
      for (t <- 0 until w * h * 3) {
        val p = t / 3
        val v = java.lang.Math.floorMod(
          fid * 53 + ((p / w / 8) * bw + (p % w) / 8) * 19L, 256L)
        sum += v; chk += v * (1 + t % 97)
      }
      assert(r.getAs[Long]("sum_samples") == sum, s"doc $id frame $j sum")
      assert(r.getAs[Long]("checksum") == chk, s"doc $id frame $j checksum")
    }
  }
}
