package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Ground-truth laws for the TIFF layer (q142): IFD walk under both byte
  * orders, strip resolution, totality, and the fixture pixel law. */
class ScaleOps15Spec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    var i = 0
    while (i < n) {
      val r = g.doPureApply(Gen.Parameters.default, seed)
      f(r.retrieve.get)
      seed = r.seed.next
      i += 1
    }
  }

  test("Tiff: decode ∘ encode is the identity for BOTH byte orders and every strip split") {
    val gen = for {
      w <- Gen.choose(1, 9); h <- Gen.choose(1, 7)
      le <- Gen.oneOf(true, false)
      strips <- Gen.choose(1, 8)
      samples <- Gen.listOfN(w * h * 3, Gen.choose(0, 255))
    } yield (w, h, le, strips, samples.toArray)
    forAll(gen) { case (w, h, le, strips, s) =>
      val img = graft.multimodal.Tiff.decode(
        graft.multimodal.Tiff.encode(w, h, s, le, strips))
      assert(img != null && img.width == w && img.height == h,
        s"lost $w x $h le=$le strips=$strips")
      assert(img.samples.toSeq == s.toSeq)
    }
  }

  test("Tiff: decode total — random bytes, every 1-byte mutation, every truncation; non-baseline variants null") {
    val rnd = for {
      n <- Gen.choose(0, 200)
      bs <- Gen.listOfN(n, Gen.choose(0, 255).map(_.toByte))
    } yield bs.toArray
    forAll(rnd) { bytes =>
      graft.multimodal.Tiff.decode(bytes)
      graft.multimodal.Tiff.decode("II".getBytes("US-ASCII") ++ bytes)
      graft.multimodal.Tiff.decode("MM".getBytes("US-ASCII") ++ bytes)
      ()
    }
    for (id <- Seq(6L, 7L)) { // one fixture per byte order
      val fix = graft.multimodal.Tiff.fixtureBytes(id)
      for (i <- fix.indices) {
        val b = fix.clone(); b(i) = (b(i) ^ 0x5a).toByte
        graft.multimodal.Tiff.decode(b) // null or parsed; must not throw
      }
      for (i <- 0 to fix.length) graft.multimodal.Tiff.decode(fix.take(i))
    }
    // unsupported on purpose: LZW compression and 16-bit samples
    val fix = graft.multimodal.Tiff.fixtureBytes(2L)
    // Compression tag (259) value: find and flip via re-encode — simpler:
    // decode must reject a file whose compression word is patched. The
    // fixture is LE with the IFD at offset 8; tag 4 (259) value at
    // 8 + 2 + 3*12 + 8.
    val comp = fix.clone(); comp(8 + 2 + 3 * 12 + 8) = 5
    assert(graft.multimodal.Tiff.decode(comp) == null)
    // BitsPerSample is count=3 SHORTs at an offset region right after the
    // IFD (bpsOff = 8 + 2 + 9*12 + 4); patch the FIRST sample's bits to 16
    val bits = fix.clone(); bits(8 + 2 + 9 * 12 + 4) = 16
    assert(graft.multimodal.Tiff.decode(bits) == null)
    // and patch only the THIRD sample — a decoder reading just the first
    // value would wrongly accept this file
    val bits3 = fix.clone(); bits3(8 + 2 + 9 * 12 + 4 + 4) = 16
    assert(graft.multimodal.Tiff.decode(bits3) == null)
    // palette-color (photometric=3): the palette INDICES must never be
    // decoded as pixels — tag 262 is the 5th entry (LE fixture)
    val pal = fix.clone(); pal(8 + 2 + 4 * 12 + 8) = 3
    assert(graft.multimodal.Tiff.decode(pal) == null)
  }

  test("Tiff: fixture law — decoded sample j equals (id*47 + j*19) mod 256 across parities (both byte orders)") {
    for (id <- 0L to 24L) {
      val img = graft.multimodal.Tiff.decode(graft.multimodal.Tiff.fixtureBytes(id))
      assert(img != null, s"fixture $id failed to decode")
      assert(img.width == 3 + (id % 3).toInt && img.height == 2 + (id % 2).toInt)
      img.samples.zipWithIndex.foreach { case (v, j) =>
        assert(v == java.lang.Math.floorMod(id * 47 + j * 19L, 256L).toInt)
      }
    }
  }

  test("Tiff: strip resolution is load-bearing — swapping two equal strip offsets exchanges the raster halves") {
    // 3x4 raster in TWO equal 2-row strips (MM big-endian, strips in
    // reverse file order). Patch the StripOffsets array to swap the
    // strips: decode must yield the halves exchanged, proving offsets
    // are honored, not assumed sequential.
    val w = 3; val h = 4
    val samples = Array.tabulate(w * h * 3)(j => (j * 19 + 7) % 256)
    val file = graft.multimodal.Tiff.encode(w, h, samples,
      littleEndian = false, nStrips = 2)
    val good = graft.multimodal.Tiff.decode(file)
    assert(good != null && good.samples.toSeq == samples.toSeq)
    // MM layout: IFD at 8, 9 tags, then the 8-byte BitsPerSample region;
    // offsets array at arrOff, counts at arrOff + arraysLen (= 8·strips)
    val arrOff = 8 + 2 + 9 * 12 + 4 + 8
    def r32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    def w32(b: Array[Byte], o: Int, v: Long): Unit = {
      b(o) = ((v >> 24) & 0xff).toByte; b(o + 1) = ((v >> 16) & 0xff).toByte
      b(o + 2) = ((v >> 8) & 0xff).toByte; b(o + 3) = (v & 0xff).toByte
    }
    val counts = (r32(file, arrOff + 16), r32(file, arrOff + 20))
    assert(counts._1 == counts._2 && counts._1 == w * 2 * 3,
      s"equal 2-row strips expected, got $counts")
    val patched = file.clone()
    val (o1, o2) = (r32(file, arrOff), r32(file, arrOff + 4))
    assert(o1 > o2, "reverse file order: strip 0 must sit AFTER strip 1")
    w32(patched, arrOff, o2); w32(patched, arrOff + 4, o1)
    val swapped = graft.multimodal.Tiff.decode(patched)
    assert(swapped != null)
    val half = samples.length / 2
    assert(swapped.samples.toSeq ==
      (samples.drop(half) ++ samples.take(half)).toSeq)
  }

  test("q143: hand days — trailing-30-day MAU window law") {
    val dir = tempDir("q143-hand")
    def d(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 09:00:00")
    def d2(day: Int) = java.sql.Timestamp.valueOf(f"2024-02-$day%02d 09:00:00")
    // u1 active Jan 1 and Jan 31; u2 active Jan 1 and Jan 10
    Seq((1L, d(1), 1L), (2L, d(31), 1L), (3L, d(1), 2L), (4L, d(10), 2L))
      .map { case (id, ts, u) => (id, ts, u, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.ScaleOps15.q143Stickiness(spark, dir.toString)
      .collect().map(r => (r.getAs[java.sql.Timestamp]("day").toString.take(10),
        r.getAs[Long]("dau"), r.getAs[Long]("mau"),
        r.getAs[Double]("stickiness"))).toSeq
    // Jan 1: dau 2, mau 2; Jan 10: dau 1 (u2), mau 2 (both in window);
    // Jan 31: dau 1 (u1), mau 2 (u2's Jan 10 is within [Jan 2, Jan 31])
    assert(got == Seq(
      ("2024-01-01", 2L, 2L, 1.0),
      ("2024-01-10", 1L, 2L, 0.5),
      ("2024-01-31", 1L, 2L, 0.5)))
    assert(d2(1) != null) // silence unused helper warning-by-use
  }

  test("q143: real corpus — dau ≤ mau ≤ total users on every observed day") {
    val total = graft.ops.Relational.events(spark, sf)
      .select(col("user_id")).distinct().count()
    val rows = graft.ops.ScaleOps15.q143Stickiness(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dau, mau) = (r.getAs[Long]("dau"), r.getAs[Long]("mau"))
      assert(dau <= mau && mau <= total)
      assert(r.getAs[Double]("stickiness") == dau.toDouble / mau.toDouble)
    }
  }

  test("q144: hand sequence — the zero floor absorbs a deficit and counts the hit") {
    val dir = tempDir("q144-hand")
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // user 1: +100 (id 2), −300 (id 3, floor hit), +50 (id 4) → final 50
    Seq((2L, t(0), 1.00), (3L, t(1), 3.00), (4L, t(2), 0.50))
      .map { case (id, ts, v) => (id, ts, 1L, "pay", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.ops.ScaleOps15.q144CappedBalance(spark, dir.toString)
      .collect().head
    assert(r.getAs[Long]("final_cents") == 50L)
    assert(r.getAs[Long]("floor_hits") == 1L)
    assert(r.getAs[Long]("credits") == 150L && r.getAs[Long]("debits") == 300L)
    // an UNCAPPED running sum would say 100−300+50 = −150: the floor law
    // is observably different from what any window aggregate computes
    assert(r.getAs[Long]("final_cents") != -150L)
  }

  test("q144: real corpus — per-user fold re-derives scalar-side") {
    val ev = graft.ops.Relational.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[Double]("value")))
    val expected = ev.groupBy(_._1).map { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._3.getTime, r._2))
      var bal = 0L; var hits = 0L
      ordered.foreach { case (_, id, _, v) =>
        val cents = math.floor(v * 100.0 + 0.5).toLong
        val delta = if (id % 2 == 0) cents else -cents
        if (bal + delta < 0) { bal = 0; hits += 1 } else bal += delta
      }
      u -> (bal, hits)
    }
    val got = graft.ops.ScaleOps15.q144CappedBalance(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("final_cents"), r.getAs[Long]("floor_hits"))).toMap
    assert(got == expected && got.nonEmpty)
  }

  test("q145: hand durations — bit-length bucketing at the power boundaries") {
    val dir = tempDir("q145-hand")
    def t(sec: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime + sec * 1000L)
    // single-event sessions (0s) for users 1,2; a 1s session (user 3:
    // bucket len(bin(2))=2); a 63s session (user 4: len(bin(64))=7);
    // a 64s session (user 5: len(bin(65))=7)
    val rows = Seq(
      (1L, t(0), 1L), (2L, t(0), 2L),
      (3L, t(0), 3L), (4L, t(1), 3L),
      (5L, t(0), 4L), (6L, t(63), 4L),
      (7L, t(0), 5L), (8L, t(64), 5L))
    rows.map { case (id, ts, u) => (id, ts, u, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.ScaleOps15.q145LatencyBuckets(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("lo_sec"),
        r.getAs[Long]("hi_sec"), r.getAs[Long]("n_sessions"))).toSeq
    // bucket 1 = [0,0] (2 sessions), bucket 2 = [1,2] (1), bucket 7 =
    // [63,126] (2: the 63s and 64s sessions share the 2^6 bucket)
    assert(got == Seq((1L, 0L, 0L, 2L), (2L, 1L, 2L, 1L), (7L, 63L, 126L, 2L)))
  }

  test("q145: real corpus — every duration lies inside its bucket's [lo, hi]; shares sum to 1") {
    val rows = graft.ops.ScaleOps15.q145LatencyBuckets(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_sec") >= r.getAs[Long]("lo_sec"))
      assert(r.getAs[Long]("max_sec") <= r.getAs[Long]("hi_sec"))
    }
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-12)
  }

  test("q146: hand sources — the crossing source is IN the Pareto set, later ones are out") {
    val dir = tempDir("q146-hand")
    // tokens: a=6, b=3, c=1 → total 10; cum 6 (60% in), 9 (90%: before
    // it coverage was 60% < 80% ⇒ IN), 10 (before it 90% ⇒ out)
    val docs = Seq(
      (1L, "w w w w w w", "en", "a", 0L),
      (2L, "w w w", "en", "b", 0L),
      (3L, "w", "en", "c", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.ScaleOps15.q146Pareto(spark, dir.toString)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("cum"),
        r.getAs[Boolean]("in_pareto80"))).toSeq
    assert(got == Seq(("a", 6L, true), ("b", 9L, true), ("c", 10L, false)))
  }

  test("q146: real corpus — cum is monotone, flags form a prefix, last cum_share is 1") {
    val rows = graft.ops.ScaleOps15.q146Pareto(spark, sf).collect()
    assert(rows.nonEmpty)
    val cums = rows.map(_.getAs[Long]("cum")).toSeq
    assert(cums == cums.sorted)
    val flags = rows.map(_.getAs[Boolean]("in_pareto80")).toSeq
    assert(flags == flags.sortBy(!_), "in_pareto80 must be a rank prefix")
    assert(rows.last.getAs[Double]("cum_share") == 1.0)
  }

  test("q142: sniff reports tiff for every row; stats re-derive for a sample") {
    val rows = graft.ops.ScaleOps15.q142Tiff(spark, sf).collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getAs[String]("format") == "tiff"))
    rows.take(10).foreach { r =>
      val id = r.getAs[Long]("media_id")
      val n = r.getAs[Int]("n_pixels") * 3
      val expectedSum = (0 until n)
        .map(j => java.lang.Math.floorMod(id * 47 + j * 19L, 256L)).sum
      assert(r.getAs[Long]("sum_samples") == expectedSum)
    }
  }
}
