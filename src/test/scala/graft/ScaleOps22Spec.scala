package graft

import org.apache.spark.sql.functions._

/** Ground-truth laws for the round-12 batch-22 operators: bigram-LM
  * document scoring (q167) and temperature-2 source mixing with exact
  * largest-remainder allocation (q168). */
class ScaleOps22Spec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def writeDocs(dir: java.nio.file.Path,
                        rows: Seq[(Long, String)]): Unit =
    rows.map { case (id, txt) => (id, txt, "en", "src0", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  /** Exact integer square root by Newton's method over BigInt — the
    * scalar reference for the [[graft.ops.ScaleOps22.withIsqrt]] column
    * kernel. */
  private def isqrtBig(n: BigInt): BigInt = {
    require(n >= 0)
    if (n < 2) n
    else {
      // monotone-descent Newton: seed 2^ceil(bits/2) ≥ √n, step while
      // strictly decreasing — the x != prev form 2-cycles around the
      // root and never terminates
      var x = BigInt(1) << ((n.bitLength + 1) / 2)
      var y = (x + n / x) >> 1
      while (y < x) { x = y; y = (x + n / x) >> 1 }
      assert(x * x <= n && (x + 1) * (x + 1) > n)
      x
    }
  }

  // --- q167 bigram-LM scoring ------------------------------------------------

  test("q167: hand corpus — MLE prefix denominators, per-bigram fixed point, integer mean, single-token doc excluded") {
    val dir = tempDir("q167-hand")
    writeDocs(dir, Seq(
      (1L, "a b"),       // (a,b)
      (2L, "a b c"),     // (a,b), (b,c)
      (3L, "a c"),       // (a,c)
      (4L, "solo")))     // no bigram — out of scope
    // c(a,b)=2, c(b,c)=1, c(a,c)=1; ctx(a)=3 (NOT the unigram count 4 —
    // doc-final 'a' would be wrong), ctx(b)=1.
    // p_fp: (a,b)=2000000 div 3=666666, (b,c)=1000000, (a,c)=333333.
    // doc1=666666, doc2=(666666+1000000) div 2=833333, doc3=333333.
    val got = graft.ops.ScaleOps22.q167BigramLmScore(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (3L, 1L, 333333L), (1L, 1L, 666666L), (2L, 2L, 833333L)))
  }

  test("q167: real corpus — bottom-15 re-derives from a scalar bigram LM (counts, prefix totals, floor arithmetic)") {
    val got = graft.ops.ScaleOps22.q167BigramLmScore(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.size == graft.ops.ScaleOps22.Q167BottomK)
    val docs = graft.ops.Relational.t(spark, sf, "documents")
      .select(col("doc_id").cast("long"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def bigrams(text: String): Seq[(String, String)] = {
      val ts = text.trim.toLowerCase.split("\\s+")
      if (ts.length < 2) Seq.empty
      else ts.sliding(2).map(p => (p(0), p(1)))
        .filter(p => p._1.nonEmpty && p._2.nonEmpty).toSeq
    }
    val all = docs.flatMap { case (id, txt) => bigrams(txt).map(b => (id, b)) }
    val cxy = all.groupBy(_._2).map { case (b, xs) => b -> xs.size.toLong }
    val ctx = cxy.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val pfp = cxy.map { case (b, c) => b -> (c * 1000000L) / ctx(b._1) }
    val expected = all.groupBy(_._1).toSeq.map { case (id, xs) =>
      val scores = xs.map(x => pfp(x._2))
      (id, scores.size.toLong, scores.sum / scores.size)
    }.sortBy(d => (d._3, d._1)).take(graft.ops.ScaleOps22.Q167BottomK)
    assert(got == expected, s"\n got=$got\n exp=$expected")
  }

  // --- q168 temperature mixing -----------------------------------------------

  test("isqrt column kernel: exact on 0..1024, perfect-square edges, and the int64 boundary where the squares need DECIMAL") {
    val adversarial: Seq[Long] = {
      val ks = Seq(2L, 3L, 1L << 26, (1L << 26) + 1, 94906265L /* isqrt(2^53) */,
        1000000000L, 3037000499L /* isqrt(Long.Max) */)
      ks.flatMap(k => Seq(k * k - 1, k * k, k * k + 1)) ++
        Seq(0L, 1L, (1L << 53) - 1, 1L << 53, (1L << 53) + 1, 1L << 62,
          Long.MaxValue)
    }
    val ns = ((0L to 1024L) ++ adversarial).distinct.filter(_ >= 0)
    val df = ns.toDF("n_tokens")
    val got = graft.ops.ScaleOps22.withIsqrt(df, "n_tokens", "s")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ns.foreach { n =>
      val want = isqrtBig(BigInt(n)).toLong
      assert(got(n) == want, s"isqrt($n): got ${got(n)}, want $want")
    }
  }

  test("isqrt column kernel: 500 seeded-random int64 draws across all magnitudes match the BigInt reference") {
    val rnd = new scala.util.Random(42)
    val ns = (1 to 500).map { _ =>
      // magnitude-uniform, not value-uniform: shift a positive draw by a
      // random amount so small, mid, and boundary magnitudes all appear
      (rnd.nextLong() & Long.MaxValue) >> rnd.nextInt(62)
    }.distinct
    val got = graft.ops.ScaleOps22.withIsqrt(ns.toDF("n_tokens"), "n_tokens", "s")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ns.foreach { n =>
      val want = isqrtBig(BigInt(n)).toLong
      assert(got(n) == want, s"isqrt($n): got ${got(n)}, want $want")
    }
  }

  test("q168: an all-whitespace corpus yields an EMPTY plan — never a divide-by-zero (the stot = 0 guard is the n >= 1 floor)") {
    val dir = tempDir("q168-empty")
    writeDocs(dir, Seq((1L, "   "), (2L, " \t ")))
    assert(graft.ops.ScaleOps22.q168TemperatureMix(spark, dir.toString)
      .collect().isEmpty)
  }

  test("q168: real corpus — weights, fixed-point shares, and the largest-remainder allocation re-derive scalar-exactly; allocations sum to the budget") {
    val got = graft.ops.ScaleOps22.q168TemperatureMix(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val budget = graft.ops.ScaleOps22.Q168Budget
    val perSrc = graft.ops.Relational.t(spark, sf, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0),
        r.getString(1).trim.toLowerCase.split("\\s+").count(_.nonEmpty).toLong))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }.toSeq
    val w = perSrc.map { case (s, n) => (s, n, isqrtBig(BigInt(n)).toLong) }
    val stot = w.map(_._3).sum
    val base = w.map { case (s, n, sq) =>
      (s, n, sq, (1000000L * sq) / stot, (budget * sq) / stot,
        (budget * sq) % stot)
    }
    val leftover = budget - base.map(_._5).sum
    // largest-remainder sanity: strictly fewer leftover samples than sources
    assert(leftover >= 0 && leftover < w.size)
    val bonusSet = base.sortBy(b => (-b._6, b._1)).take(leftover.toInt)
      .map(_._1).toSet
    val expected = base.map { case (s, n, sq, wfp, b, _) =>
      (s, n, sq, wfp, b + (if (bonusSet(s)) 1L else 0L))
    }.sortBy(_._1)
    assert(got == expected, s"\n got=$got\n exp=$expected")
    assert(got.map(_._5).sum == budget)
    // every weight is the true isqrt of the source's token total
    got.foreach { case (_, n, sq, _, _) =>
      assert(sq * sq <= n && (sq + 1) * (sq + 1) > n)
    }
  }
}
