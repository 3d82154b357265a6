package graft

import org.apache.spark.sql.functions._

/** r14 verdict #6: the score-vs-perplexity honesty ablation. The
  * engine's `score_fp` is an ARITHMETIC mean of per-bigram add-k
  * probabilities (exact integers — the cross-engine-checkable choice);
  * CCNet ranks by PERPLEXITY, the GEOMETRIC mean (log domain, libm).
  * The libm-free choice is documented; this spec makes its ranking
  * divergence a PINNED NUMBER instead of an unknown: Spearman rank
  * correlation between the two rankings and the per-language tertile
  * flip rate, computed on the real corpora against a scalar log-domain
  * reference (exact integer probabilities, Math.log only on the
  * spec side — the reference is a measurement, not an engine surface).
  *
  * Both corpora are immutable driver fixtures and every input to the
  * measurement is exact, so the measured values are constants — pinned
  * exactly (flip counts) and to 1e-9 (rho). If a testdata refresh moves
  * them, the pins fail and the new divergence gets re-read, which is
  * the point: the number stays KNOWN. */
class LmAblationSpec extends GraftSuite {

  /** Per-doc (score_fp ranking vs log-domain ranking) over the q183
    * reference-LM protocol: returns (lang, doc_id, score_fp, logScore)
    * rows. */
  private def measure(dir: String): Seq[(String, Long, Long, Double)] = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"), col("lang"))
    val ref = docs.filter(col("lang") === "en")
    val pairs = graft.ops.ScaleOps27.trainLmPairs(ref)
    val v = graft.ops.ScaleOps27.vocabSize(ref)
    assert(v >= 1)
    val kFp = graft.ops.ScaleOps24.Q175KFp
    // engine scores (the shipped integer arithmetic)
    val engine = graft.ops.ScaleOps27.scoreDocsWithLm(docs, "doc_id", "text",
        pairs, v)
      .select(col("doc_id"), col("score_fp"))
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("lang"), r.getAs[Long]("score_fp")))).toMap
    // scalar log-domain reference from the grouped per-doc (cxy, cx)
    // multiset — tiny at spec scale (distinct (doc, cxy, cx) triples)
    val ctx = pairs.groupBy(col("w1")).agg(sum(col("cxy")).as("cx"))
    val grouped = graft.ops.ScaleOps27
      .heldBigramCounts(docs, "doc_id", "text", pairs, ctx)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cxy"),
        r.getAs[Long]("cx"), r.getAs[Long]("n")))
    val logScore: Map[Long, Double] = grouped.groupBy(_._1).view.mapValues { rs =>
      val n = rs.map(_._4).sum.toDouble
      rs.map { case (_, cxy, cx, c) =>
        // p as the EXACT integer-cleared fraction, log'd once
        val num = BigDecimal(cxy) * 1000000 + kFp
        val den = BigDecimal(cx) * 1000000 + BigDecimal(kFp) * v
        c * math.log((num / den).toDouble)
      }.sum / n
    }.toMap
    logScore.keys.toSeq.sorted.map { id =>
      val (lang, sfp) = engine(id)
      (lang, id, sfp, logScore(id))
    }
  }

  /** Spearman rho with average ranks for ties. */
  private def spearman(xs: Seq[Double], ys: Seq[Double]): Double = {
    def ranks(v: Seq[Double]): Seq[Double] = {
      val sorted = v.zipWithIndex.sortBy(_._1)
      val r = new Array[Double](v.size)
      var i = 0
      while (i < sorted.size) {
        var j = i
        while (j + 1 < sorted.size && sorted(j + 1)._1 == sorted(i)._1) j += 1
        val avg = (i + j + 2) / 2.0
        (i to j).foreach(k => r(sorted(k)._2) = avg)
        i = j + 1
      }
      r.toSeq
    }
    val rx = ranks(xs); val ry = ranks(ys)
    val mx = rx.sum / rx.size; val my = ry.sum / ry.size
    val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val sx = math.sqrt(rx.map(a => (a - mx) * (a - mx)).sum)
    val sy = math.sqrt(ry.map(b => (b - my) * (b - my)).sum)
    cov / (sx * sy)
  }

  /** Per-language rank-tertile assignment (0/1/2 by position), the
    * bucket a CCNet mix would cut at — flip = a doc whose tertile
    * differs between the two rankings. */
  private def tertileFlips(rows: Seq[(String, Long, Long, Double)]): (Long, Long) = {
    var flips = 0L; var total = 0L
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val n = rs.size
      def tert(order: Seq[Long]): Map[Long, Int] =
        order.zipWithIndex.map { case (id, i) => id -> (3 * i / n) }.toMap
      val byFp = tert(rs.sortBy(r => (r._3, r._2)).map(_._2))
      val byLog = tert(rs.sortBy(r => (r._4, r._2)).map(_._2))
      rs.foreach { r =>
        total += 1
        if (byFp(r._2) != byLog(r._2)) flips += 1
      }
    }
    (flips, total)
  }

  /** The measured divergence, pinned: (rho, flips, total) per corpus.
    * Read: the arithmetic mean ranks ~96%/94% like the geometric mean,
    * but ~16% of documents change TERTILE — material for a mix that
    * cuts on tertiles, which is why the log-domain scorer (q190) exists
    * as the exact-integer alternative. */
  private val Pinned = Map(
    "/root/testdata/sf0.001" -> ((0.963833093, 81L, 500L)),
    "/root/testdata/sf0.01" -> ((0.944257765, 84L, 500L)))

  test("arithmetic-mean score_fp vs log-domain perplexity: the ranking divergence is a pinned number at sf0.001 and sf0.01, not an unknown — rho ~0.95 but ~16% of docs change tertile") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = measure(dir)
      assert(rows.nonEmpty)
      val rho = spearman(rows.map(_._3.toDouble), rows.map(_._4))
      val (flips, total) = tertileFlips(rows)
      info(f"$dir: n=${rows.size} rho=$rho%.9f flips=$flips/$total")
      val (expRho, expFlips, expTotal) = Pinned(dir)
      assert(math.abs(rho - expRho) < 1e-6,
        f"$dir: rho=$rho%.9f drifted from the pinned $expRho%.9f")
      assert(flips == expFlips && total == expTotal,
        s"$dir: flips $flips/$total drifted from pinned $expFlips/$expTotal")
      // the divergence is REAL (the two means are not a reparameterization)
      assert(flips > 0 && rho < 1.0)
    }
  }
}
