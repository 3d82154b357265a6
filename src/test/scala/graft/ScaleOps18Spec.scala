package graft

/** Ground-truth laws for the round-10 batch-17 operators: skip-gram
  * pairs (q152), PMI-lift collocations (q153), MJPEG keyframes (q154). */
class ScaleOps18Spec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def writeDocs(dir: java.nio.file.Path,
                        rows: Seq[(Long, String)]): Unit =
    rows.map { case (id, txt) => (id, txt, "en", "src0", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  // --- q152 skip-grams -----------------------------------------------------

  test("q152: hand corpus — window-3 pairs, both directions, (cnt desc, center, context) rank") {
    val dir = tempDir("q152-hand")
    // "a b a": pos1 a pairs with b,a; pos2 b pairs with a,a; pos3 a with b,a
    // ⇒ (a,a):2 (a,b):2 (b,a):2, ranked lexicographically on the tie
    writeDocs(dir, Seq((1L, "a b a")))
    val got = graft.ops.ScaleOps18.q152SkipGrams(spark, dir.toString)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[String]("center"),
        r.getAs[String]("context"), r.getAs[Long]("cnt"))).toSeq
    assert(got == Seq((1, "a", "a", 2L), (2, "a", "b", 2L), (3, "b", "a", 2L)))
  }

  test("q152: real corpus — top-25 re-derives from a scalar window scan; counts are direction-symmetric") {
    val got = graft.ops.ScaleOps18.q152SkipGrams(spark, sf)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[String]("center"),
        r.getAs[String]("context"), r.getAs[Long]("cnt"))).toSeq
    assert(got.map(_._1) == (1 to 25))
    val docs = graft.ops.Relational.t(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val counts = scala.collection.mutable.HashMap[(String, String), Long]()
    docs.foreach { text =>
      val ts = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      for (i <- ts.indices; j <- math.max(0, i - 3) to math.min(ts.length - 1, i + 3)
           if j != i)
        counts((ts(i), ts(j))) = counts.getOrElse((ts(i), ts(j)), 0L) + 1
    }
    val expect = counts.toSeq
      .sortBy { case ((c, x), n) => (-n, c, x) }.take(25).zipWithIndex
      .map { case (((c, x), n), i) => (i + 1, c, x, n) }
    assert(got == expect)
    // the ±window is symmetric: every (a,b) count equals (b,a)
    got.foreach { case (_, c, x, n) => assert(counts((x, c)) == n) }
  }

  // --- q153 PMI-lift -------------------------------------------------------

  test("q153: hand corpus — exact fixed-point lift, min-count gate") {
    val dir = tempDir("q153-hand")
    // bigrams: (x,y)×5 (y,x)×4 (y,z)×1 — only (x,y) clears cxy ≥ 5.
    // T=11 tokens, B=10 bigrams, cx=cy=5:
    // lift_fp = 5·11²·10⁶ div (10·5·5) = 605000000 div 250 = 2420000
    writeDocs(dir, Seq((1L, "x y x y x y x y x y z")))
    val got = graft.ops.ScaleOps18.q153PmiLift(spark, dir.toString)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[String]("w1"),
        r.getAs[String]("w2"), r.getAs[Long]("cxy"), r.getAs[Long]("lift_fp"))).toSeq
    assert(got == Seq((1, "x", "y", 5L, 2420000L)))
  }

  test("q153: real corpus — every returned lift re-derives from exact integer counts") {
    val got = graft.ops.ScaleOps18.q153PmiLift(spark, sf)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[String]("w1"),
        r.getAs[String]("w2"), r.getAs[Long]("cxy"), r.getAs[Long]("lift_fp"))).toSeq
    assert(got.nonEmpty && got.map(_._1) == (1 to got.length))
    val docs = graft.ops.Relational.t(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val uni = scala.collection.mutable.HashMap[String, Long]()
    val bi = scala.collection.mutable.HashMap[(String, String), Long]()
    docs.foreach { text =>
      val ts = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      ts.foreach(t => uni(t) = uni.getOrElse(t, 0L) + 1)
      ts.sliding(2).foreach {
        case Array(a, b) => bi((a, b)) = bi.getOrElse((a, b), 0L) + 1
        case _ => ()
      }
    }
    val tt = BigInt(uni.values.sum); val bb = BigInt(bi.values.sum)
    got.foreach { case (_, w1, w2, cxy, lift) =>
      assert(bi((w1, w2)) == cxy && cxy >= 5)
      val expect = (BigInt(cxy) * tt * tt * 1000000) /
        (bb * uni(w1) * uni(w2))
      assert(BigInt(lift) == expect, s"($w1,$w2)")
    }
  }

  // --- q154 keyframes ------------------------------------------------------

  test("q154: frame deltas re-derive from the q149 pixel law; counts and maxima exact") {
    val rows = graft.ops.ScaleOps18.q154Keyframes(spark, sf)
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("n_frames"),
        r.getAs[Long]("n_cuts"), r.getAs[Long]("total_delta"),
        r.getAs[Long]("max_delta"))).toSeq
    assert(rows.nonEmpty)
    rows.take(30).foreach { case (id, nf, cuts, total, mx) =>
      val n = (2 + java.lang.Math.floorMod(id, 3L)).toInt
      assert(nf == n)
      val sums = (0 until n).map { j =>
        val fid = id * 5 + j
        val bw = 2 + java.lang.Math.floorMod(fid, 2L)
        val bh = 1 + java.lang.Math.floorMod(fid, 2L)
        val w = bw * 8; val h = bh * 8
        (0L until w * h * 3).map { t =>
          val p = t / 3
          java.lang.Math.floorMod(
            fid * 53 + ((p / w / 8) * bw + (p % w) / 8) * 19, 256L)
        }.sum
      }
      val deltas = sums.sliding(2).map { case Seq(a, b) => math.abs(b - a) }.toSeq
      assert(cuts == deltas.count(_ > 2000), s"media $id cuts")
      assert(total == deltas.sum, s"media $id total")
      assert(mx == deltas.max, s"media $id max")
    }
  }

  // --- q155 tokenizer fertility --------------------------------------------

  test("q155: per-source rollup agrees with q151's per-doc BPE counts; fertility law exact") {
    val bySrc = graft.ops.ScaleOps18.q155Fertility(spark, sf)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"),
          r.getAs[Long]("n_bpe_tokens"), r.getAs[Long]("fertility_fp"))).toMap
    assert(bySrc.nonEmpty)
    // q151's per-doc output joined to doc→source must roll up identically
    val docSrc = graft.ops.Relational.t(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id").cast("long"),
        org.apache.spark.sql.functions.col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val perDoc = graft.ops.ScaleOps17.q151BpeEncode(spark, sf).collect()
      .map(r => (docSrc(r.getAs[Long]("doc_id")), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_chars"), r.getAs[Long]("n_bpe_tokens")))
    val expect = perDoc.groupBy(_._1).map { case (src, rows) =>
      val nt = rows.map(_._2).sum; val nc = rows.map(_._3).sum
      val nb = rows.map(_._4).sum
      src -> (nt, nc, nb, nc * 1000 / nb)
    }
    assert(bySrc == expect)
  }

  // --- q156 vocabulary growth ----------------------------------------------

  test("q156: hand corpus — first-occurrence deciles, cumulative vocab, volume") {
    val dir = tempDir("q156-hand")
    // ids 0..9 → one per bucket; 'common' appears everywhere (first
    // bucket 0), each doc also carries a unique token
    writeDocs(dir, (0L until 10L).map(i => (i, s"common uniq$i")))
    val got = graft.ops.ScaleOps18.q156VocabGrowth(spark, dir.toString)
      .collect().map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("new_types"), r.getAs[Long]("vocab"))).toSeq
    val expect = (0 until 10).map { b =>
      (b, 2L, if (b == 0) 2L else 1L, if (b == 0) 2L else (b + 2).toLong)
    }
    assert(got == expect)
  }

  test("q156: real corpus — buckets partition ids, volumes sum to token count, vocab ends at distinct types") {
    val rows = graft.ops.ScaleOps18.q156VocabGrowth(spark, sf)
      .collect().map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("new_types"), r.getAs[Long]("vocab"))).toSeq
    assert(rows.map(_._1) == rows.map(_._1).sorted)
    assert(rows.map(_._3).sum == rows.last._4, "cumulative vocab = Σ new types")
    val docs = graft.ops.Relational.t(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val allToks = docs.flatMap(_.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
    assert(rows.map(_._2).sum == allToks.length.toLong)
    assert(rows.last._4 == allToks.distinct.length.toLong)
    // growth is monotone and new types never exceed volume
    rows.foreach { case (_, nt, nw, _) => assert(nw <= nt) }
  }

  // --- q157 incremental batch-vs-history dedup -----------------------------

  test("q157: hand corpus — a copied new doc quarantines, a fresh one doesn't; fractions exact") {
    val dir = tempDir("q157-hand")
    val eight = "w1 w2 w3 w4 w5 w6 w7 w8"
    writeDocs(dir, Seq(
      (0L, eight + " tail0 more0"),          // history
      (1L, eight),                           // new: ALL 1 shingle in history
      (3L, "f1 f2 f3 f4 f5 f6 f7 f8 f9")))   // new: 2 fresh shingles
    val got = graft.ops.ScaleOps18.q157IncrementalDedup(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_hist_dup"), r.getAs[Long]("dup_fp"),
        r.getAs[Boolean]("quarantined"))).toSeq
    assert(got == Seq((1L, 1L, 1L, 1000000L, true), (3L, 2L, 0L, 0L, false)))
  }

  test("q157: real corpus — per-doc fractions re-derive from a scalar shingle set") {
    val got = graft.ops.ScaleOps18.q157IncrementalDedup(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_hist_dup"), r.getAs[Long]("dup_fp"))).toSeq
    assert(got.nonEmpty)
    val docs = graft.ops.Relational.t(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id").cast("long"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def shingles(text: String): Seq[String] = {
      val ts = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      (0 to ts.length - 8).map(i => ts.slice(i, i + 8).mkString(" "))
    }
    val hist = docs.filter(_._1 % 2 == 0).flatMap(d => shingles(d._2)).toSet
    val expect = docs.filter(_._1 % 2 == 1)
      .map { case (id, text) =>
        val sh = shingles(text)
        (id, sh.length.toLong, sh.count(hist.contains).toLong)
      }
      .filter(_._2 > 0).sortBy(_._1)
      .map { case (id, n, d) => (id, n, d, d * 1000000L / n) }.toSeq
    assert(got == expect)
  }

  // --- q158 successor branching --------------------------------------------

  test("q158: hand corpus — top word, successor types, top-successor tie law") {
    val dir = tempDir("q158-hand")
    // 'a' x6 (top), successors: b x2, c x2, d x1 — top_succ 'b' by the
    // (cnt desc, succ asc) tie-break; one 'a' ends a doc (no successor)
    writeDocs(dir, Seq((1L, "a b a c a d"), (2L, "a b a c a")))
    val got = graft.ops.ScaleOps18.q158Branching(spark, dir.toString)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[String]("tok"),
        r.getAs[Long]("c"), r.getAs[Long]("n_succ_types"),
        r.getAs[Long]("n_succ"), r.getAs[String]("top_succ"),
        r.getAs[Long]("top_share_fp"))).toSeq
    assert(got.head == (1, "a", 6L, 3L, 5L, "b", 400000L))
    // 'b','c','d' have 1-2 occurrences each; every returned row is exact
    got.foreach { case (_, _, _, types, total, _, share) =>
      assert(types <= total && share >= 1000000L / math.max(total, 1L) - 1)
    }
  }

  test("q158: real corpus — every row re-derives from scalar bigram counts") {
    val got = graft.ops.ScaleOps18.q158Branching(spark, sf)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[String]("tok"),
        r.getAs[Long]("c"), r.getAs[Long]("n_succ_types"),
        r.getAs[Long]("n_succ"), r.getAs[String]("top_succ"),
        r.getAs[Long]("top_share_fp"))).toSeq
    assert(got.map(_._1) == (1 to got.length) && got.length <= 20)
    val docs = graft.ops.Relational.t(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val uni = scala.collection.mutable.HashMap[String, Long]()
    val bi = scala.collection.mutable.HashMap[(String, String), Long]()
    docs.foreach { text =>
      val ts = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      ts.foreach(t => uni(t) = uni.getOrElse(t, 0L) + 1)
      ts.sliding(2).foreach {
        case Array(a, b) => bi((a, b)) = bi.getOrElse((a, b), 0L) + 1
        case _ => ()
      }
    }
    got.foreach { case (_, tok, c, types, total, topSucc, share) =>
      assert(uni(tok) == c)
      val succ = bi.collect { case ((a, b), n) if a == tok => (b, n) }.toSeq
      assert(types == succ.length.toLong && total == succ.map(_._2).sum)
      val best = succ.minBy { case (b, n) => (-n, b) }
      assert(topSucc == best._1 && share == best._2 * 1000000L / total)
    }
  }
}
