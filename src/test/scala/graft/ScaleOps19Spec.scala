package graft

/** Ground-truth laws for the round-10 batch-18 audio-analytics
  * operators: silence segmentation (q159) and Walsh–Hadamard band
  * energies (q160). */
class ScaleOps19Spec extends GraftSuite {

  private val sf = "/root/testdata/sf0.001"

  private def lawSamples(id: Long): Array[Int] = {
    val n = (32 + java.lang.Math.floorMod(id, 5L) * 8).toInt
    Array.tabulate(n)(j =>
      (java.lang.Math.floorMod(id * 37 + j * 769L, 65536L) - 32768L).toInt)
  }

  test("wav_samples: the long fixture decodes to exactly the LCG law; malformed bytes null; hand file round-trips") {
    for (id <- 0L to 9L) {
      val arr = graft.multimodal.DecodeKernels.wavSamplesArr(
        graft.multimodal.Wav.fixtureBytesLong(id))
      assert(arr != null)
      assert(arr.toIntArray().sameElements(lawSamples(id)), s"fixture $id")
    }
    assert(graft.multimodal.DecodeKernels.wavSamplesArr("nope".getBytes) == null)
    val hand = Array(0, 0, 20000, 0, -20000, 20000, 0, 0)
    val rt = graft.multimodal.DecodeKernels.wavSamplesArr(
      graft.multimodal.Wav.encode(1, 8000, 16, hand))
    assert(rt != null && rt.toIntArray().sameElements(hand))
  }

  test("q159: hand-law re-derivation — segments, lead/trail trim, active counts for every media") {
    val rows = graft.ops.ScaleOps19.q159SilenceSegments(spark, sf)
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_samples"), r.getAs[Long]("n_active"),
          r.getAs[Long]("n_segments"), r.getAs[Long]("lead_silence"),
          r.getAs[Long]("trail_silence"))).toMap
    assert(rows.nonEmpty)
    rows.keys.toSeq.sorted.take(40).foreach { id =>
      val v = lawSamples(id)
      val act = v.map(x => math.abs(x) >= 8192)
      val segs = act.indices.count(i => act(i) && (i == 0 || !act(i - 1)))
      val lead = act.indexOf(true) match { case -1 => v.length; case i => i }
      val trail = act.lastIndexOf(true) match {
        case -1 => v.length; case i => v.length - 1 - i
      }
      assert(rows(id) == (v.length.toLong, act.count(identity).toLong,
        segs.toLong, lead.toLong, trail.toLong), s"media $id")
    }
  }

  test("q160: Parseval — per clip, the 8 band energies sum to 8 x the sample energy (orthogonality of the real transform)") {
    val rows = graft.ops.ScaleOps19.q160WhtBands(spark, sf)
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("band"),
        r.getAs[Long]("energy")))
    assert(rows.nonEmpty)
    val byMedia = rows.groupBy(_._1)
    byMedia.foreach { case (id, bs) =>
      assert(bs.map(_._2).sorted.toSeq == (0 to 7), s"media $id bands")
      val v = lawSamples(id)
      val sampleEnergy = v.map(x => x.toLong * x).sum
      assert(bs.map(_._3).sum == 8L * sampleEnergy,
        s"media $id: Parseval violated")
    }
  }

  test("q160: hand window — DC band is the squared window sum; an alternating window loads band 7 only") {
    // scalar WHT over one window re-derived against the operator's law
    def wht(v: Array[Int]): Array[Long] =
      Array.tabulate(8) { b =>
        (0 until 8).map { k =>
          val p = Integer.bitCount(b & k) % 2
          v(k).toLong * (1 - 2 * p)
        }.sum
      }
    val dc = Array(5, 5, 5, 5, 5, 5, 5, 5)
    assert(wht(dc)(0) == 40 && wht(dc).drop(1).forall(_ == 0))
    // NATURAL (Hadamard) ordering: the alternating signal (-1)^k matches
    // row b=1, whose sign is (-1)^popcount(1&k) = (-1)^(k mod 2) — not
    // row 7 as sequency ordering would have it
    val alt = Array(7, -7, 7, -7, 7, -7, 7, -7)
    val c = wht(alt)
    assert(c(1) == 56 && c.zipWithIndex.filter(_._2 != 1).forall(_._1 == 0),
      s"alternating signal must load natural-order band 1: ${c.toSeq}")
    // and the operator's arithmetic parity sign equals bitCount parity
    for (b <- 0 until 8; k <- 0 until 8) {
      val v = b & k
      val arith = ((v & 1) + ((v >> 1) & 1) + ((v >> 2) & 1)) % 2
      assert(arith == Integer.bitCount(v) % 2)
    }
  }

  test("wav_samples kernel totality — every byte mutation and truncation of the long fixture: null or parsed, never a throw") {
    for (id <- Seq(2L, 3L)) {
      val fix = graft.multimodal.Wav.fixtureBytesLong(id)
      for (i <- fix.indices) {
        val b = fix.clone(); b(i) = (b(i) ^ 0x5a).toByte
        graft.multimodal.DecodeKernels.wavSamplesArr(b)
      }
      for (i <- 0 to fix.length by 3)
        graft.multimodal.DecodeKernels.wavSamplesArr(fix.take(i))
    }
  }

  test("the r10 SQL function surface: wav_samples/wav_fixture_long/mjpeg_fixture/mp4_jpeg_frames work from spark.sql") {
    import spark.implicits._
    // the shared test session already exists, so install via registerAll
    graft.functions.GraftExtensions.registerAll(spark)
    Seq(3L, 4L).toDF("media_id").createOrReplaceTempView("r10_sql_in")
    val r = spark.sql(
      """SELECT media_id,
        |  size(wav_samples(wav_fixture_long(media_id))) AS n_pcm,
        |  size(mp4_jpeg_frames(mjpeg_fixture(media_id))) AS n_frames
        |FROM r10_sql_in ORDER BY media_id""".stripMargin).collect()
    // laws: pcm = 32 + (id%5)*8; frames = 2 + id%3
    assert(r(0).getInt(1) == 32 + 3 * 8 && r(0).getInt(2) == 2 + 3 % 3)
    assert(r(1).getInt(1) == 32 + 4 * 8 && r(1).getInt(2) == 2 + 4 % 3)
  }
}
