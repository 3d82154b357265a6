package graft

import org.apache.spark.sql.functions._

/** Batch-28 ground truth: an INDEPENDENT scalar interpolated Kneser–Ney
  * model (BigInt fixed point, plain Maps) for q186 — hand-derived
  * discount/continuation values, the "equal frequency, different
  * continuation" law that separates KN from add-k, and the V-counts-
  * single-token-docs law. */
class ScaleOps28Spec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def writeDocs(dir: java.nio.file.Path,
      rows: Seq[(Long, String)]): Unit =
    rows.map { case (id, txt) => (id, txt, "en", "src0", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def toksOf(t: String): Seq[String] =
    t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  /** (id, n_bigrams, n_unseen_ctx, score_fp) for every ≥2-token odd doc
    * — from the documented KN definition only. Nil when V = 0. */
  private def scalarKn(rows: Seq[(Long, String)])
      : Seq[(Long, Long, Long, Long)] = {
    def bigrams(sel: Long => Boolean) =
      rows.filter(r => sel(r._1)).flatMap { case (id, t) =>
        val ts = toksOf(t)
        if (ts.length < 2) Nil
        else ts.sliding(2).map(p => (id, p(0), p(1))).toSeq
      }
    val train = bigrams(_ % 2 == 0)
    val cxy = train.groupBy(b => (b._2, b._3)).view.mapValues(_.size.toLong).toMap
    val cx = train.groupBy(_._2).view
      .mapValues(_.size.toLong).toMap // prefix totals
    val n1 = cxy.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ncont = cxy.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val v = rows.filter(_._1 % 2 == 0).flatMap(r => toksOf(r._2))
      .distinct.size.toLong
    val tt = cxy.size.toLong
    if (v == 0) return Nil
    bigrams(_ % 2 == 1).groupBy(_._1).toSeq.map { case (id, bs) =>
      var unseen = 0L
      val ps = bs.map { case (_, w1, w2) =>
        val pc = BigInt(ncont.getOrElse(w2, 0L) + 1) * 1000000 / (tt + v)
        cx.get(w1) match {
          case None => unseen += 1; pc
          case Some(cxv) =>
            val p1 = cxy.get((w1, w2)) match {
              case Some(c) => BigInt(4 * c - 3) * 1000000 / (4 * cxv)
              case None => BigInt(0)
            }
            p1 + BigInt(3) * n1(w1) * pc / (4 * cxv)
        }
      }
      (id, bs.size.toLong, unseen, (ps.sum / ps.size).toLong)
    }
  }

  private def bottomK(s: Seq[(Long, Long, Long, Long)]) =
    s.sortBy(r => (r._4, r._1)).take(graft.ops.ScaleOps28.Q186BottomK)

  private def run(dir: String): Seq[(Long, Long, Long, Long)] =
    graft.ops.ScaleOps28.q186KneserNeyScore(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("n_unseen_ctx"), r.getAs[Long]("score_fp"))).toSeq

  test("q186 scalar law: hand-derived discount/continuation values; the KN law (equal raw frequency, different continuation => different score); unseen contexts back off to continuation; re-derives at sf0.001") {
    val dir = tempDir("q186-hand")
    // train (even): c(a,b)=2, c(b,a)=2, c(a,c)=1, c(b,c)=1 -> T = 4
    //   ctx(a)=3 n1(a)=2; ctx(b)=3 n1(b)=2
    //   ncont: a=1 {b}, b=1 {a}, c=2 {a,b}   <- b and c BOTH occur twice
    //   as a successor, but c completes TWO distinct contexts: the KN
    //   distinction add-k cannot express
    // V = {a,b,c} = 3, T+V = 7
    val rows = Seq(
      (0L, "a b a b a c"),
      (2L, "b c"),
      (1L, "a b z"),   // held: seen pair + seen-ctx miss
      (3L, "z q"),     // held: fully unseen context
      (5L, "w b"),     // held: unseen ctx -> pc(b) = 2e6 div 7 = 285714
      (7L, "w c"))     // held: unseen ctx -> pc(c) = 3e6 div 7 = 428571
    writeDocs(dir, rows)
    val expect = bottomK(scalarKn(rows))
    val got = run(dir.toString)
    assert(got == expect)
    val byId = got.map(r => r._1 -> r).toMap
    // hand pins:
    //   doc1 (a,b): (4*2-3)*1e6 div 12 = 416666; + 3*2*pc(b) div 12 =
    //     1714284 div 12 = 142857 -> 559523
    //   doc1 (b,z): 0 + 3*2*pc(z) div 12 = 857142 div 12 = 71428
    //   score = 630951 div 2 = 315475
    assert(byId(1L) == ((1L, 2L, 0L, 315475L)))
    // doc3: full backoff to pc(q) = 1e6 div 7
    assert(byId(3L) == ((3L, 1L, 1L, 142857L)))
    // THE KN LAW: b and c are equally frequent as successors (2 each),
    // but c continues two contexts vs b's one -> pc differs by the
    // continuation count, not the raw count
    assert(byId(5L)._4 == 285714L && byId(7L)._4 == 428571L)
    // ordering: unseen-everything sinks to the bottom
    assert(got.head._1 == 3L)
    // real corpus re-derivation
    val real = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(run(sf) == bottomK(scalarKn(real)))
  }

  test("q186: V counts tokens from single-token training docs (not derivable from the pair table), and an empty training half yields an EMPTY result") {
    val dir = tempDir("q186-vlaw")
    val base = Seq((0L, "a b a b a c"), (2L, "b c"), (1L, "a b z"))
    writeDocs(dir, base)
    val without = run(dir.toString)
    // add a SINGLE-TOKEN training doc: no new bigram, but V grows 3 -> 4
    // and every continuation denominator moves 7 -> 8
    val withSolo = base :+ (4L, "solo")
    writeDocs(dir, withSolo)
    val got = run(dir.toString)
    assert(got == bottomK(scalarKn(withSolo)))
    assert(got != without,
      "a single-token training doc must move V (and therefore pc)")
    // empty training half: no even docs at all
    writeDocs(dir, Seq((1L, "a b"), (3L, "c d")))
    assert(run(dir.toString).isEmpty)
  }

  test("q186 vs q175 (the smoothing ablation): on the hand corpus KN and add-k rank the same held docs differently — the continuation signal is real, not a reparameterized add-k") {
    val dir = tempDir("q186-ablate")
    // w2-frequency ties with continuation asymmetry, as above; both
    // scorers run the same train/held split on the same corpus
    writeDocs(dir, Seq(
      (0L, "a b a b a c"), (2L, "b c"),
      (5L, "w b"), (7L, "w c")))
    val kn = run(dir.toString).map(r => r._1 -> r._4).toMap
    val addk = graft.ops.ScaleOps24.q175SmoothedLmScore(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_fp")))
      .toMap
    // add-k sees (w,b) and (w,c) identically: unseen context -> the
    // uniform prior, SAME score for both docs
    assert(addk(5L) == addk(7L),
      s"add-k should not separate docs 5/7: $addk")
    // KN separates them by continuation count
    assert(kn(5L) < kn(7L), s"KN must rank b-completion below c-completion: $kn")
  }
}
