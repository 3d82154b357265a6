package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Ground-truth laws for the round-9 batch-10 operators: BMP codec +
  * four-way sniff (q128), exact-integer CUSUM (q129), positional phrase
  * search (q130), reciprocal-rank fusion (q131), per-nation Gini (q132). */
class ScaleOps11Spec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Deterministic property driver (the PropertySpec pattern — the
    * scalatest-scalacheck bridge isn't in the offline cache). */
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

  // --- Bmp codec -----------------------------------------------------------

  test("Bmp: decode ∘ encode is the identity for every dims/sample set (flip+pad+BGR undo)") {
    val gen = for {
      w <- Gen.choose(1, 9); h <- Gen.choose(1, 7)
      samples <- Gen.listOfN(w * h * 3, Gen.choose(0, 255))
    } yield (w, h, samples.toArray)
    forAll(gen) { case (w, h, s) =>
      val img = graft.multimodal.Bmp.decode(graft.multimodal.Bmp.encode(w, h, s))
      assert(img != null && img.width == w && img.height == h)
      assert(img.samples.toSeq == s.toSeq)
    }
  }

  test("Bmp: top-down (negative height) files decode to the same raster as bottom-up") {
    // hand-build a top-down variant of the 2x2 fixture: same pixel rows,
    // negative biHeight, rows stored in reading order
    val w = 2; val h = 2
    val samples = Array.tabulate(w * h * 3)(j => (j * 19 + 5) % 256)
    val up = graft.multimodal.Bmp.encode(w, h, samples)
    val down = up.clone()
    // biHeight at offset 22 (little-endian): overwrite with -h
    val neg = -h
    down(22) = (neg & 0xff).toByte; down(23) = ((neg >> 8) & 0xff).toByte
    down(24) = ((neg >> 16) & 0xff).toByte; down(25) = ((neg >> 24) & 0xff).toByte
    // rows are bottom-up in `up`; swap the two stored rows so the
    // top-down file carries them in reading order
    val rowSize = ((w * 3 + 3) / 4) * 4
    val off = 54
    for (i <- 0 until rowSize) {
      val a = down(off + i); down(off + i) = down(off + rowSize + i)
      down(off + rowSize + i) = a
    }
    val img = graft.multimodal.Bmp.decode(down)
    assert(img != null && img.samples.toSeq == samples.toSeq)
  }

  test("Bmp: decode total — random bytes, every 1-byte mutation, every truncation; unsupported variants null") {
    val rnd = for {
      n <- Gen.choose(0, 200)
      bs <- Gen.listOfN(n, Gen.choose(0, 255).map(_.toByte))
    } yield bs.toArray
    forAll(rnd) { bytes =>
      graft.multimodal.Bmp.decode(bytes)
      graft.multimodal.Bmp.decode("BM".getBytes("US-ASCII") ++ bytes)
      ()
    }
    val fix = graft.multimodal.Bmp.fixtureBytes(7L)
    for (i <- fix.indices) {
      val b = fix.clone(); b(i) = (b(i) ^ 0x5a).toByte
      graft.multimodal.Bmp.decode(b) // may be null or parsed; must not throw
    }
    for (i <- 0 to fix.length) graft.multimodal.Bmp.decode(fix.take(i))
    // unsupported on purpose: 8-bit palette and RLE8 compression
    val bpp8 = fix.clone(); bpp8(28) = 8
    assert(graft.multimodal.Bmp.decode(bpp8) == null)
    val rle = fix.clone(); rle(30) = 1
    assert(graft.multimodal.Bmp.decode(rle) == null)
  }

  test("Bmp: fixture law — decoded sample j equals (id*41 + j*13) mod 256") {
    for (id <- 0L to 24L) {
      val img = graft.multimodal.Bmp.decode(graft.multimodal.Bmp.fixtureBytes(id))
      assert(img.width == 3 + (id % 3).toInt && img.height == 2 + (id % 2).toInt)
      img.samples.zipWithIndex.foreach { case (v, j) =>
        assert(v == java.lang.Math.floorMod(id * 41 + j * 13L, 256L).toInt)
      }
    }
  }

  test("q128: sniff dispatch — each id%4 arm reports its format; corrupt blob degrades to null row") {
    val rows = graft.ops.ScaleOps11.q128BmpMixed(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val want = (id % 4) match {
        case 0 => "ppm"; case 1 => "png"; case 2 => "gif"; case _ => "bmp"
      }
      assert(r.getAs[String]("format") == want)
    }
  }

  // --- q129 CUSUM ----------------------------------------------------------

  test("q129: hand series — level shift lands the changepoint at the shift boundary; S telescopes to 0") {
    val dir = tempDir("q129-hand")
    // type "a": 6 days at 2/day then 6 days at 10/day → |S| max at day 6
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val rows = (0 until 12).flatMap { d =>
      val n = if (d < 6) 2 else 10
      (0 until n).map(k => (d * 100L + k,
        new Timestamp(base + d * 86400000L + k * 1000L), 1L, "a", 1.0, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.ScaleOps11.q129Cusum(spark, dir.toString).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_days") == 12 && r.getAs[Long]("total") == 72)
    // S_d for d<6: cumsum(12·2−72) = −48d → |S| max at day index 5 (the
    // last low day, 2024-03-06 bucket start 03-06? no: day 5 = 03-06)
    assert(r.getAs[Timestamp]("cp_day") == Timestamp.valueOf("2024-03-06 00:00:00"))
    assert(r.getAs[Long]("s_at_cp") == -48L * 6)
  }

  test("q129: real corpus — S at the LAST day telescopes to 0 for every type (re-derived), cp matches scalar argmax") {
    val daily = graft.ops.Relational.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Timestamp]("day"),
        r.getAs[Long]("c")))
    val expected = daily.groupBy(_._1).map { case (t, rows) =>
      val sorted = rows.sortBy(_._2.getTime)
      val dd = sorted.length.toLong
      val tot = sorted.map(_._3).sum
      var s = 0L
      val withS = sorted.map { case (_, day, c) => s += dd * c - tot; (day, s) }
      assert(withS.last._2 == 0L, s"telescoping broken for $t")
      val cp = withS.maxBy { case (day, sv) => (math.abs(sv), -day.getTime) }
      (t, (dd, tot, cp._1, cp._2))
    }
    val got = graft.ops.ScaleOps11.q129Cusum(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"),
        (r.getAs[Long]("n_days"), r.getAs[Long]("total"),
         r.getAs[Timestamp]("cp_day"), r.getAs[Long]("s_at_cp")))).toMap
    assert(got == expected && got.nonEmpty)
  }

  // --- q130 phrase search --------------------------------------------------

  test("q130: hand docs — adjacency only, overlaps count, cross-token-boundary matches don't") {
    val dir = tempDir("q130-hand")
    Seq(
      (1L, "batch batch batch run", "en", "src0", 0L),   // 2 overlapping
      (2L, "batch run batch", "en", "src0", 0L),          // co-occur, not adjacent
      (3L, "  Batch BATCH  ", "en", "src0", 0L),          // case+trim law → 1
      (4L, "batchbatch batch", "en", "src0", 0L))         // substring ≠ token
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.ScaleOps11.q130PhraseSearch(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_matches"))).toSeq
    assert(got == Seq((1L, 2L), (3L, 1L)))
  }

  test("q130: real corpus — every match re-verifies against a scalar token walk") {
    val texts = graft.ops.Relational.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toMap
    val expected = texts.flatMap { case (id, txt) =>
      val toks = txt.trim.toLowerCase.split("\\s+").toSeq
      val n = toks.sliding(2).count(p => p == Seq("batch", "batch"))
      if (n > 0) Some(id -> n.toLong) else None
    }
    val got = graft.ops.ScaleOps11.q130PhraseSearch(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_matches"))).toMap
    assert(got == expected && got.nonEmpty)
  }

  // --- q131 RRF ------------------------------------------------------------

  test("q131: fused score law re-derives from the two ranks; top-5 per query; ranks are permutations") {
    val rows = graft.ops.ScaleOps11.q131RrfFusion(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("query_id")).distinct.length == 10)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("fused_rank")).sorted.toSeq == (1 to 5))
    }
    rows.foreach { r =>
      val (rc, ri) = (r.getAs[Int]("rank_cos"), r.getAs[Int]("rank_ip"))
      assert(r.getAs[Long]("rrf_fp") ==
        1000000000L / (60 + rc) + 1000000000L / (60 + ri))
      assert(rc >= 1 && ri >= 1)
    }
  }

  test("q131: a corpus item that tops BOTH rankings tops the fusion (dominance law)") {
    // scalar re-derivation: for each query, recompute both rankings from
    // collected vectors with the exact in-order dot law, fuse, compare
    // the operator's winner
    val embs = graft.ops.Relational.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Float](1).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val winners = embs.filter(_._1 < 10).map { case (qid, qv) =>
      val scored = embs.filter(_._1 != qid).map { case (cid, cv) =>
        val ip = dot(cv, qv)
        val cos = ip / (math.sqrt(dot(cv, cv)) * math.sqrt(dot(qv, qv)))
        (cid, ip, cos)
      }
      val rankIp = scored.sortBy { case (cid, ip, _) => (-ip, cid) }
        .zipWithIndex.map { case ((cid, _, _), i) => cid -> (i + 1) }.toMap
      val rankCos = scored.sortBy { case (cid, _, cos) => (-cos, cid) }
        .zipWithIndex.map { case ((cid, _, _), i) => cid -> (i + 1) }.toMap
      val fused = scored.map { case (cid, _, _) =>
        (cid, 1000000000L / (60 + rankCos(cid)) + 1000000000L / (60 + rankIp(cid)))
      }.sortBy { case (cid, fp) => (-fp, cid) }
      qid -> fused.head._1
    }.toMap
    val got = graft.ops.ScaleOps11.q131RrfFusion(spark, sf).collect()
      .filter(_.getAs[Int]("fused_rank") == 1)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("corpus_id")).toMap
    assert(got == winners)
  }

  // --- q132 Gini -----------------------------------------------------------

  test("q132: hand balances — equal balances → Gini 0; known unequal case") {
    val dir = tempDir("q132-hand")
    // nation 1: all equal → gini 0; nation 2: [0, 0, 0, 100] →
    // num = 2·(4·10000) − 5·10000 = 30000, den = 4·10000 → 0.75
    Seq((1L, 1L, 5.0), (2L, 1L, 5.0), (3L, 1L, 5.0),
        (4L, 2L, 0.0), (5L, 2L, 0.0), (6L, 2L, 0.0), (7L, 2L, 100.0))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, "ALPHA", 0L), (2L, "BETA", 0L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val got = graft.ops.ScaleOps11.q132Gini(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("nationkey"), r.getAs[Double]("gini"))).toSeq
    assert(got == Seq((1L, 0.0), (2L, 0.75)))
  }

  test("q132: real corpus — gini ∈ [−?, 1) re-derives from sorted cents per nation") {
    val cents = graft.ops.Relational.t(spark, sf, "customer")
      .select(col("c_nationkey").cast("long"), col("c_custkey").cast("long"),
        floor(col("c_acctbal") * lit(100.0) + lit(0.5)).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = cents.groupBy(_._1).map { case (nk, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val n = sorted.length.toLong
      val sx = sorted.sum
      val iws = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      nk -> (2 * iws - (n + 1) * sx).toDouble / (n * sx).toDouble
    }
    val got = graft.ops.ScaleOps11.q132Gini(spark, sf).collect()
      .map(r => r.getAs[Number]("nationkey").longValue -> r.getAs[Double]("gini")).toMap
    assert(got == expected && got.nonEmpty)
  }
}
