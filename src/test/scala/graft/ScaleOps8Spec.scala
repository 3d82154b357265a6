package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.multimodal.{Png, Ppm}

/** Ground-truth laws for the round-9 batch-4 operators: PNG decode +
  * auto-sniffed image stats (q101), Tukey outlier fences (q102), Markov
  * transitions (q103), integer anomaly flags (q104). */
class ScaleOps8Spec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // --- PNG codec laws ------------------------------------------------------

  test("Png: decode ∘ encode is the identity for every filter type, chained rows, both color types") {
    // every single-filter file, plus a file cycling all five — filters
    // consume the RECONSTRUCTED previous row, so cycling proves chaining
    for (filter <- 0 to 4) {
      val w = 5; val h = 4
      val samples = Array.tabulate(w * h * 3)(j => (j * 29 + filter * 13) % 256)
      val img = Png.decode(Png.encode(w, h, samples, _ => filter))
      assert(img != null, s"filter $filter")
      assert(img.width == w && img.height == h && img.maxval == 255)
      assert(img.samples.toSeq == samples.toSeq, s"filter $filter round trip")
    }
    val w = 7; val h = 6
    val samples = Array.tabulate(w * h * 3)(j => (j * 31 + 5) % 256)
    val img = Png.decode(Png.encode(w, h, samples, r => r % 5))
    assert(img != null && img.samples.toSeq == samples.toSeq, "cycling filters")
    // grayscale (color type 0) widens to r=g=b
    val gray = Array.tabulate(12)(j => (j * 40 + 3) % 256)
    val gi = Png.decode(Png.encodeGray(4, 3, gray, r => (r + 2) % 5))
    assert(gi != null && gi.width == 4 && gi.height == 3)
    for (p <- 0 until 12; ch <- 0 until 3)
      assert(gi.samples(p * 3 + ch) == gray(p), s"gray pixel $p channel $ch")
  }

  test("Png: CRC verification is real — corrupting any chunk's data or CRC yields null") {
    val good = Png.fixtureBytes(7L)
    assert(Png.decode(good) != null)
    def corrupt(mut: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); mut(b); b
    }
    // flip a byte inside IHDR data (offset 8 sig + 8 len/type = 16)
    assert(Png.decode(corrupt(_(16) = (good(16) ^ 0x01).toByte)) == null, "IHDR data flip")
    // flip a byte inside the IDAT payload (IHDR spans 8+25; IDAT data starts at 41+8)
    assert(Png.decode(corrupt(_(50) = (good(50) ^ 0x40).toByte)) == null, "IDAT data flip")
    // flip the LAST byte (inside IEND's CRC)
    assert(Png.decode(corrupt(b => b(b.length - 1) = (good(good.length - 1) ^ 0x01).toByte))
      == null, "IEND CRC flip")
  }

  test("Png: unsupported variants degrade to null, never an exception") {
    assert(Png.decode(null) == null)
    assert(Png.decode(Array.emptyByteArray) == null)
    assert(Png.decode("not a png at all".getBytes) == null)
    val good = Png.fixtureBytes(3L)
    // every truncation of a valid file
    for (n <- 0 until good.length)
      assert(Png.decode(good.take(n)) == null, s"prefix $n")
    // patch IHDR fields and re-CRC so ONLY the unsupported feature differs:
    // depth 16, palette color (3), RGBA (6), interlace Adam7
    def patched(off: Int, value: Byte): Array[Byte] = {
      val b = good.clone()
      b(off) = value
      val crc = new java.util.zip.CRC32()
      crc.update(b, 12, 4 + 13) // IHDR type + data
      val v = crc.getValue
      b(29) = ((v >>> 24) & 0xff).toByte; b(30) = ((v >>> 16) & 0xff).toByte
      b(31) = ((v >>> 8) & 0xff).toByte; b(32) = (v & 0xff).toByte
      b
    }
    assert(Png.decode(patched(24, 16)) == null, "16-bit depth")
    assert(Png.decode(patched(25, 3)) == null, "palette")
    assert(Png.decode(patched(25, 6)) == null, "RGBA")
    assert(Png.decode(patched(28, 1)) == null, "Adam7 interlace")
  }

  test("Png: decode is total on random bytes and every 1-byte mutation of a fixture") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val b = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(b)
      Png.decode(b) // must not throw
    }
    val good = Png.fixtureBytes(11L)
    for (i <- good.indices) {
      val b = good.clone()
      b(i) = (b(i) ^ 0xff).toByte
      Png.decode(b) // must not throw; null or a still-valid parse both fine
    }
  }

  test("Png fixture law: dims, byte law, and per-row filters all reproduce") {
    for (id <- 0L to 12L) {
      val img = Png.decode(Png.fixtureBytes(id))
      assert(img != null, s"id $id")
      assert(img.width == 3 + (id % 3).toInt && img.height == 2 + (id % 2).toInt)
      for (j <- img.samples.indices)
        assert(img.samples(j) == ((id * 37 + j * 11) % 256).toInt, s"id $id sample $j")
    }
  }

  // --- q101 image decode ---------------------------------------------------

  test("q101: auto-sniff dispatches on magic — ppm stats for even ids, png for odd, exact law") {
    val rows = graft.ops.ScaleOps8.q101ImageDecode(spark, sf)
      .filter(col("media_id") < 6).collect()
    assert(rows.length == 6)
    for (r <- rows) {
      val id = r.getLong(0)
      val (mul, add) = if (id % 2 == 0) (31L, 7L) else (37L, 11L)
      assert(r.getString(1) == (if (id % 2 == 0) "ppm" else "png"), s"id $id format")
      val w = 3 + (id % 3).toInt; val h = 2 + (id % 2).toInt
      assert(r.getInt(2) == w && r.getInt(3) == h && r.getInt(4) == w * h)
      val n = w * h * 3
      val vs = (0 until n).map(j => (id * mul + j * add) % 256)
      assert(r.getLong(5) == vs.sum, s"id $id sum")
      assert(r.getLong(6) == vs.zipWithIndex.map { case (v, j) => v * (1 + j % 97) }.sum,
        s"id $id checksum")
      assert(r.getDouble(7) == vs.sum.toDouble / n.toDouble, s"id $id mean")
    }
  }

  // --- q102 outlier fences -------------------------------------------------

  test("q102: hand corpus — exact quartiles, 1.5·IQR fences, outlier counts") {
    val dir = tempDir("fences")
    // source a: lengths 1..8 plus outliers 100 and -50 → q1/q3 interpolated
    // over the 10 sorted values
    val docs = ((1 to 8).map(i => (i.toLong, "x", "en", "a", i.toLong)) ++
      Seq((9L, "x", "en", "a", 100L), (10L, "x", "en", "a", -50L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.ops.ScaleOps8.q102OutlierFences(spark, dir.toString).collect()
    assert(r.length == 1)
    val row = r(0)
    // sorted: -50,1,2,3,4,5,6,7,8,100 ⇒ h25 = 2.25 ⇒ q1 = 2.25; h75 = 6.75 ⇒ q3 = 6.75
    assert(row.getDouble(2) == 2.25, s"q1 ${row.getDouble(2)}")
    assert(row.getDouble(3) == 6.75, s"q3 ${row.getDouble(3)}")
    val iqr = 6.75 - 2.25
    assert(row.getDouble(4) == 2.25 - 1.5 * iqr)
    assert(row.getDouble(5) == 6.75 + 1.5 * iqr)
    assert(row.getLong(1) == 10L)
    assert(row.getLong(6) == 1L, "n_low: only -50")
    assert(row.getLong(7) == 1L, "n_high: only 100")
    assert(row.getDouble(8) == 2.0 / 10.0)
  }

  // --- q103 Markov transitions ---------------------------------------------

  test("q103: hand stream — per-user ordering, tiebreak, counts and probabilities") {
    val dir = tempDir("transitions")
    Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a", 0.0),
      (2L, ts("2024-01-01 00:01:00"), 1L, "b", 0.0),
      (3L, ts("2024-01-01 00:02:00"), 1L, "a", 0.0),
      (4L, ts("2024-01-01 00:03:00"), 1L, "c", 0.0),
      // user 2: same-ts pair ordered by event_id (5 before 6)
      (5L, ts("2024-01-01 00:00:00"), 2L, "a", 0.0),
      (6L, ts("2024-01-01 00:00:00"), 2L, "b", 0.0),
      // user 3: single event — no transition
      (7L, ts("2024-01-01 00:00:00"), 3L, "z", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.ops.ScaleOps8.q103Transitions(spark, dir.toString)
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getLong(3), x.getDouble(4)))
    // transitions: u1 a→b, b→a, a→c; u2 a→b  ⇒ from a: {b:2, c:1}; from b: {a:1}
    assert(r.toSeq == Seq(
      ("a", "b", 2L, 3L, 2.0 / 3.0),
      ("a", "c", 1L, 3L, 1.0 / 3.0),
      ("b", "a", 1L, 1L, 1.0)), r.toSeq.toString)
  }

  // --- q104 volume anomaly -------------------------------------------------

  test("q104: integer 3σ law — warm-up days unflagged, planted spike flagged") {
    val dir = tempDir("anomaly")
    // 8 quiet days (counts 10,11,10,11,...) then a day with 50 events
    val rows = (0 until 8).flatMap { d =>
      val cnt = 10 + d % 2
      (0 until cnt).map(i =>
        ((d * 100 + i).toLong, ts(f"2024-01-${d + 1}%02d 01:00:00"), i.toLong, "view", 0.0))
    } ++ (0 until 50).map(i =>
      ((900 + i).toLong, ts("2024-01-09 01:00:00"), i.toLong, "view", 0.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.ops.ScaleOps8.q104VolumeAnomaly(spark, dir.toString)
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getBoolean(5)))
    assert(r.length == 9)
    // warm-up: days 0-6 have n7 < 7 ⇒ never flagged
    for (i <- 0 until 7) {
      assert(r(i)._3 == i.toLong, s"n7 at day $i")
      assert(!r(i)._4, s"warm-up day $i must not flag")
    }
    // day 7 (cnt 11): full window, quiet — (7·11−73)² = 16 ≤ 9·(7·767−5329) = 3240
    assert(r(7)._3 == 7L && !r(7)._4, "quiet full-window day")
    // day 8 (cnt 50): (7·50−74)² = 76176 > 9·(7·778−5476) = −270 → wait, recompute in-test
    val win = Seq(11L, 10L, 11L, 10L, 11L, 10L, 11L) // days 1..7 counts
    val sum7 = win.sum; val sumsq7 = win.map(x => x * x).sum
    val dev = 7 * 50 - sum7
    assert(dev * dev > 9 * (7 * sumsq7 - sum7 * sum7), "law sanity")
    assert(r(8)._4, "spike day flags")
  }

  // --- q105 session paths --------------------------------------------------

  test("q105: hand stream — first-3 paths assembled in rank order, short streams keep short paths") {
    val dir = tempDir("paths")
    Seq(
      // user 1: a,b,c,d → path a>b>c (4th event ignored)
      (1L, ts("2024-01-01 00:00:00"), 1L, "a", 0.0),
      (2L, ts("2024-01-01 00:01:00"), 1L, "b", 0.0),
      (3L, ts("2024-01-01 00:02:00"), 1L, "c", 0.0),
      (4L, ts("2024-01-01 00:03:00"), 1L, "d", 0.0),
      // user 2: same path a>b>c via an event_id tiebreak on equal ts
      (5L, ts("2024-01-01 00:00:00"), 2L, "a", 0.0),
      (6L, ts("2024-01-01 00:00:00"), 2L, "b", 0.0),
      (7L, ts("2024-01-01 00:01:00"), 2L, "c", 0.0),
      // user 3: only two events → two-step path
      (8L, ts("2024-01-01 00:00:00"), 3L, "b", 0.0),
      (9L, ts("2024-01-01 00:01:00"), 3L, "a", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.ops.ScaleOps8.q105SessionPaths(spark, dir.toString)
      .collect().map(x => (x.getString(0), x.getLong(1)))
    assert(r.toSeq == Seq(("a>b>c", 2L), ("b>a", 1L)), r.toSeq.toString)
  }

  // --- q106 A/B test -------------------------------------------------------

  test("q106: cleared-integer z² law — hand-planted conversion gap flags exactly at the 2σ boundary") {
    val dir = tempDir("abtest")
    // 8 even users (variant 0), 8 odd (variant 1); all exposed via a view
    // event; conversions planted: variant 0 → 8/8 signups, variant 1 → 1/8
    val expose = (0 until 16).map(u =>
      ((100 + u).toLong, ts("2024-01-01 00:00:00"), u.toLong, "view", 0.0))
    val convs = (0 until 16).filter(u => u % 2 == 0 || u == 1).map(u =>
      ((200 + u).toLong, ts("2024-01-01 01:00:00"), u.toLong, "signup", 0.0))
    (expose ++ convs).toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.ops.ScaleOps8.q106AbTest(spark, dir.toString).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getString(0) == "signup")
    val (n0, c0, n1, c1) = (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
    assert((n0, c0, n1, c1) == (8L, 8L, 8L, 1L))
    // z² = (c0·n1 − c1·n0)²·N / (n0·n1·c·(N−c)) = (64−8)²·16 / (64·9·7)
    val num = (c0 * n1 - c1 * n0) * (c0 * n1 - c1 * n0) * (n0 + n1)
    val den = n0 * n1 * (c0 + c1) * (n0 + n1 - c0 - c1)
    assert(row.getDouble(5) == num.toDouble / den.toDouble)
    assert(num > 4 * den && row.getBoolean(6), "planted gap must be significant")
  }

  // --- GIF codec laws ------------------------------------------------------

  test("Gif: decode ∘ encode is the identity incl. dictionary growth and the KwKwK case") {
    import graft.multimodal.Gif
    // run-heavy image: "aaaa..." rows trigger code==dictSize (KwKwK)
    val pal4 = Array.tabulate(4 * 3)(c => (c * 37 + 5) % 256)
    val runs = Array.fill(8 * 6)(1)
    val ri = Gif.decode(Gif.encode(8, 6, pal4, runs))
    assert(ri != null && ri.width == 8 && ri.height == 6)
    for (p <- 0 until 48; ch <- 0 until 3)
      assert(ri.samples(p * 3 + ch) == pal4(1 * 3 + ch), s"run pixel $p")
    // varied image large enough to force at least one width growth
    val pal16 = Array.tabulate(16 * 3)(c => (c * 29 + 11) % 256)
    val idx = Array.tabulate(16 * 16)(j => (j * 7 + j / 5) % 16)
    val vi = Gif.decode(Gif.encode(16, 16, pal16, idx))
    assert(vi != null && vi.width == 16 && vi.height == 16)
    for (p <- idx.indices; ch <- 0 until 3)
      assert(vi.samples(p * 3 + ch) == pal16(idx(p) * 3 + ch), s"varied pixel $p")
    // big low-palette image: thousands of codes, forces width growth to
    // the 12-bit cap and a 4096-entry dictionary RESET mid-stream
    val big = Array.tabulate(128 * 100)(j => (j * j + j / 3) % 4)
    val bi = Gif.decode(Gif.encode(128, 100, pal4, big))
    assert(bi != null, "dictionary-reset round trip")
    for (p <- big.indices)
      assert(bi.samples(p * 3) == pal4(big(p) * 3), s"big pixel $p")
  }

  test("Gif: unsupported variants and corruption degrade to null, never an exception") {
    import graft.multimodal.Gif
    val good = Gif.fixtureBytes(5L)
    assert(Gif.decode(good) != null)
    assert(Gif.decode(null) == null)
    assert(Gif.decode(Array.emptyByteArray) == null)
    assert(Gif.decode("GIF89a then garbage".getBytes) == null)
    for (n <- 0 until good.length)
      assert(Gif.decode(good.take(n)) == null, s"prefix $n")
    def patched(off: Int, f: Byte => Byte): Array[Byte] = {
      val b = good.clone(); b(off) = f(b(off)); b
    }
    // no global color table
    assert(Gif.decode(patched(10, b => (b & 0x7f).toByte)) == null, "GCT absent")
    // image descriptor is at 13 + 16*3 = 61; flags byte at 61+9 = 70
    assert((good(61) & 0xff) == 0x2c, "fixture layout: descriptor at 61")
    assert(Gif.decode(patched(70, b => (b | 0x80).toByte)) == null, "local color table")
    assert(Gif.decode(patched(70, b => (b | 0x40).toByte)) == null, "interlace")
    // random bytes: total, never throws
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val b = new Array[Byte](rnd.nextInt(150)); rnd.nextBytes(b)
      Gif.decode(b)
    }
    // every 1-byte mutation: total (LZW overruns, bad codes, bad lengths)
    for (i <- good.indices) {
      val b = good.clone(); b(i) = (b(i) ^ 0xff).toByte
      Gif.decode(b)
    }
  }

  test("Gif: 89a extension blocks are skipped by their sub-block framing") {
    import graft.multimodal.Gif
    val good = Gif.fixtureBytes(3L)
    // splice a graphic-control extension between the GCT and the image
    // descriptor, and flip the version to 89a
    val ext = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val spliced = good.take(61) ++ ext ++ good.drop(61)
    spliced(4) = '9'
    val a = Gif.decode(good); val b = Gif.decode(spliced)
    assert(b != null && a.samples.toSeq == b.samples.toSeq)
  }

  test("Gif fixture law: palette and index laws reproduce through real LZW") {
    import graft.multimodal.Gif
    for (id <- 0L to 12L) {
      val img = Gif.decode(Gif.fixtureBytes(id))
      assert(img != null, s"id $id")
      assert(img.width == 3 + (id % 3).toInt && img.height == 2 + (id % 2).toInt)
      for (p <- 0 until img.width * img.height; ch <- 0 until 3) {
        val idx = ((id * 43 + p * 7) % 16).toInt
        val expect = ((id * 17 + (idx * 3 + ch) * 29) % 256).toInt
        assert(img.samples(p * 3 + ch) == expect, s"id $id pixel $p ch $ch")
      }
    }
  }

  // --- q107 three-format sniff ---------------------------------------------

  test("q107: three-way sniff — ppm/png/gif stats all match their laws") {
    val rows = graft.ops.ScaleOps8.q107GifMixed(spark, sf)
      .filter(col("media_id") < 9).collect()
    assert(rows.length == 9)
    for (r <- rows) {
      val id = r.getLong(0)
      val expectFmt = (id % 3) match {
        case 0 => "ppm"; case 1 => "png"; case _ => "gif"
      }
      assert(r.getString(1) == expectFmt, s"id $id format")
      val w = 3 + (id % 3).toInt; val h = 2 + (id % 2).toInt
      val n = w * h * 3
      val vs = (0 until n).map { j =>
        (id % 3) match {
          case 0 => (id * 31 + j * 7) % 256
          case 1 => (id * 37 + j * 11) % 256
          case _ =>
            val idx = (id * 43 + (j / 3) * 7) % 16
            (id * 17 + (idx * 3 + j % 3) * 29) % 256
        }
      }
      assert(r.getLong(5) == vs.sum, s"id $id sum")
      assert(r.getLong(6) == vs.zipWithIndex.map { case (v, j) => v * (1 + j % 97) }.sum,
        s"id $id checksum")
    }
  }

  // --- q108 skyline --------------------------------------------------------

  test("q108: hand corpus — frontier keeps strict improvements only, ties lose to the smaller size") {
    val dir = tempDir("skyline")
    // (size, price): frontier should be (1, 50), (3, 30), (7, 10);
    // (5, 30) ties size-3's price at a larger size → dominated;
    // (4, 40) is above the running best → dominated
    Seq((1, 50.0), (1, 90.0), (3, 30.0), (4, 40.0), (5, 30.0), (7, 10.0))
      .zipWithIndex.map { case ((sz, pr), i) =>
        (i.toLong, s"part$i", sz, java.math.BigDecimal.valueOf(pr))
      }
      .toDF("p_partkey", "p_name", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val r = graft.ops.ScaleOps8.q108Skyline(spark, dir.toString)
      .collect().map(x => (x.getInt(0), x.getDecimal(1).doubleValue(), x.getLong(2)))
    assert(r.toSeq == Seq((1, 50.0, 2L), (3, 30.0, 1L), (7, 10.0, 1L)), r.toSeq.toString)
  }

  // --- q109 weighted sampling ----------------------------------------------

  test("q109: priority follows bucket div weight; heavier docs rank ahead at equal hash") {
    val r = graft.ops.ScaleOps8.q109WeightedSample(spark, sf).collect()
    assert(r.nonEmpty)
    for (row <- r) {
      val (docId, nChars, priority) = (row.getLong(2), row.getLong(3), row.getLong(4))
      val a = 2654435761L
      val id32 = java.lang.Math.floorMod(docId, 4294967296L)
      val bucket = java.lang.Math.floorMod(
        java.lang.Math.floorMod((id32 >> 16) * a, 65536L) * 65536L
          + (id32 % 65536L) * a, 4294967296L)
      assert(priority == bucket / math.max(nChars, 1L), s"doc $docId priority law")
    }
    // exactly 5 per source, ranks 1..5
    val bySource = r.groupBy(_.getString(0))
    bySource.foreach { case (src, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4, 5), s"ranks for $src")
    }
    // determinism: a second run yields the identical selection
    val r2 = graft.ops.ScaleOps8.q109WeightedSample(spark, sf).collect()
    assert(r.map(_.toString).toSeq == r2.map(_.toString).toSeq)
  }

  // --- JPEG codec laws -----------------------------------------------------

  test("Jpeg: per-block-constant fixtures decode BIT-EXACTLY through the general baseline path") {
    import graft.multimodal.Jpeg
    for (id <- 0L to 9L) {
      val img = Jpeg.decode(Jpeg.fixtureBytes(id))
      assert(img != null, s"id $id")
      val bw = (2 + id % 2).toInt; val bh = (1 + id % 2).toInt
      assert(img.width == bw * 8 && img.height == bh * 8, s"id $id dims")
      for (by <- 0 until bh; bx <- 0 until bw; y <- 0 until 8; x <- 0 until 8) {
        val v = ((id * 53 + (by * bw + bx) * 19) % 256).toInt
        val got = img.samples(((by * 8 + y) * img.width + bx * 8 + x) * 3)
        assert(got == v, s"id $id block($bx,$by) pixel($x,$y)")
      }
    }
  }

  test("Jpeg: general lossy roundtrip stays within a tight error bound (real FDCT/Huffman/IDCT)") {
    import graft.multimodal.Jpeg
    val rnd = new scala.util.Random(5)
    val w = 16; val h = 16
    val gray = Array.tabulate(w * h)(_ => rnd.nextInt(256))
    val img = Jpeg.decode(Jpeg.encode(w, h, gray))
    assert(img != null)
    var maxErr = 0
    for (p <- 0 until w * h)
      maxErr = math.max(maxErr, math.abs(img.samples(p * 3) - gray(p)))
    // q=8 uniform quantization: worst-case reconstruction error is small;
    // a Huffman/zigzag/prediction bug would blow this bound wide open
    assert(maxErr <= 16, s"max error $maxErr")
    // smooth gradient: near-exact
    val grad = Array.tabulate(w * h)(p => (p % w) * 8 + 64)
    val gi = Jpeg.decode(Jpeg.encode(w, h, grad))
    var gErr = 0
    for (p <- 0 until w * h)
      gErr = math.max(gErr, math.abs(gi.samples(p * 3) - grad(p)))
    assert(gErr <= 8, s"gradient error $gErr")
  }

  test("Jpeg: unsupported variants and corruption degrade to null, never an exception") {
    import graft.multimodal.Jpeg
    val good = Jpeg.fixtureBytes(4L)
    assert(Jpeg.decode(good) != null)
    assert(Jpeg.decode(null) == null)
    assert(Jpeg.decode(Array.emptyByteArray) == null)
    assert(Jpeg.decode("not a jpeg".getBytes) == null)
    for (n <- 0 until good.length)
      assert(Jpeg.decode(good.take(n)) == null, s"prefix $n")
    // SOF0 → SOF2 (progressive) must be rejected: find the marker
    val sofAt = (0 until good.length - 1).find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0).get
    val prog = good.clone(); prog(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decode(prog) == null, "progressive")
    // totality: random bytes and every 1-byte mutation
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 200) {
      val b = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(b)
      Jpeg.decode(b)
    }
    for (i <- good.indices) {
      val b = good.clone(); b(i) = (b(i) ^ 0xff).toByte
      Jpeg.decode(b)
    }
  }

  // --- q112 four-codec sniff -----------------------------------------------

  test("q112: four-way sniff — jpeg stats match the block-constant law alongside ppm/png/gif") {
    val rows = graft.ops.ScaleOps8.q112JpegMixed(spark, sf)
      .filter(col("media_id") < 12).collect()
    assert(rows.length == 12)
    for (r <- rows) {
      val id = r.getLong(0)
      val expectFmt = (id % 4) match {
        case 0 => "ppm"; case 1 => "png"; case 2 => "gif"; case _ => "jpeg"
      }
      assert(r.getString(1) == expectFmt, s"id $id format")
      val (w, h) =
        if (id % 4 == 3) (((2 + id % 2) * 8).toInt, ((1 + id % 2) * 8).toInt)
        else ((3 + id % 3).toInt, (2 + id % 2).toInt)
      assert(r.getInt(2) == w && r.getInt(3) == h, s"id $id dims")
      val n = w * h * 3
      val vs = (0 until n).map { j =>
        (id % 4) match {
          case 0 => (id * 31 + j * 7) % 256
          case 1 => (id * 37 + j * 11) % 256
          case 2 =>
            val idx = (id * 43 + (j / 3) * 7) % 16
            (id * 17 + (idx * 3 + j % 3) * 29) % 256
          case _ =>
            val p = j / 3; val bx = (p % w) / 8; val by = (p / w) / 8
            (id * 53 + (by * (w / 8) + bx) * 19) % 256
        }
      }
      assert(r.getLong(5) == vs.sum, s"id $id sum")
      assert(r.getLong(6) == vs.zipWithIndex.map { case (v, j) => v * (1 + j % 97) }.sum,
        s"id $id checksum")
    }
  }

  // --- q110 distribution ranks ---------------------------------------------

  test("q110: ntile remainder rule, percent_rank and cume_dist laws on a hand partition") {
    val rows = graft.ops.ScaleOps8.q110WindowRanks(spark, sf).collect()
    assert(rows.nonEmpty)
    // per-partition re-derivation of all three laws
    rows.groupBy(_.getString(0)).foreach { case (prio, rs) =>
      val n = rs.length
      val sorted = rs.sortBy(r => (r.getDouble(2), r.getLong(1)))
      // ntile: first (n mod 4) buckets get ceil(n/4)
      val base = n / 4; val rem = n % 4
      var idx = 0
      for (b <- 1 to 4) {
        val size = base + (if (b <= rem) 1 else 0)
        for (_ <- 0 until size) {
          assert(sorted(idx).getInt(3) == b, s"$prio ntile at $idx")
          idx += 1
        }
      }
      // percent_rank/cume_dist with tie groups
      val prices = sorted.map(_.getDouble(2))
      for (i <- sorted.indices) {
        val rank = prices.indexWhere(_ == prices(i)) + 1
        val peers = prices.count(_ == prices(i))
        val expectedPr = if (n == 1) 0.0 else (rank - 1).toDouble / (n - 1).toDouble
        val expectedCd = (rank - 1 + peers).toDouble / n.toDouble
        assert(sorted(i).getDouble(4) == expectedPr, s"$prio pct_rank at $i")
        assert(sorted(i).getDouble(5) == expectedCd, s"$prio cume at $i")
      }
    }
  }

  // --- q111 gaps and islands -----------------------------------------------

  test("q111: hand stream — islands merge consecutive days, gaps counted inside the span") {
    val dir = tempDir("islands")
    // user 1 active days 0,1,2, 5, 7,8 → islands (3,1,2), longest 3,
    // active 6, span 9, gaps 3; user 2 single day → 1 island, 0 gaps
    val days1 = Seq(0, 1, 2, 5, 7, 8)
    val rows = days1.zipWithIndex.map { case (d, i) =>
      ((i + 1).toLong, ts(f"2024-01-${d + 1}%02d 09:00:00"), 1L, "view", 0.0)
    } ++ Seq((99L, ts("2024-01-04 09:00:00"), 2L, "view", 0.0),
      // duplicate event same day: distinct must collapse it
      (100L, ts("2024-01-04 17:00:00"), 2L, "click", 0.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.ops.ScaleOps8.q111GapsIslands(spark, dir.toString)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq((1L, 3L, 3L, 6L, 3L), (2L, 1L, 1L, 1L, 0L)),
      r.toSeq.toString)
  }

  test("q101-q104 match their DuckDB-mirror semantics on real data (row counts + invariants)") {
    val q101 = graft.ops.ScaleOps8.q101ImageDecode(spark, sf)
    assert(q101.count() == 500)
    assert(q101.filter(col("format") === "png").count() == 250)
    val q102 = graft.ops.ScaleOps8.q102OutlierFences(spark, sf)
    assert(q102.count() > 0)
    assert(q102.filter(col("outlier_share") < 0 || col("outlier_share") > 1).count() == 0)
    val q103 = graft.ops.ScaleOps8.q103Transitions(spark, sf)
    val probSums = q103.groupBy(col("from_type")).agg(sum(col("prob")).as("p"))
      .collect().map(_.getDouble(1))
    probSums.foreach(p => assert(math.abs(p - 1.0) < 1e-9, s"prob rows sum to 1, got $p"))
    val q104 = graft.ops.ScaleOps8.q104VolumeAnomaly(spark, sf)
    assert(q104.count() > 0)
    assert(q104.filter(col("n7") > 7).count() == 0)
  }
}
