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

  // --- q187: the reference-slice KN scorer --------------------------------

  private def writeLangDocs(dir: java.nio.file.Path,
      rows: Seq[(Long, String, String)]): Unit =
    rows.map { case (id, txt, lang) => (id, txt, lang, "src0", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  /** (id, lang, n_bigrams, n_unseen_ctx, score_fp) for every ≥2-token
    * doc, model trained on the lang = "en" slice — q187's protocol from
    * the documented KN definition only. Nil when V = 0. */
  private def scalarKnRef(rows: Seq[(Long, String, String)])
      : Seq[(Long, String, Long, Long, Long)] = {
    def bigrams(sel: ((Long, String, String)) => Boolean) =
      rows.filter(sel).flatMap { case (id, t, lang) =>
        val ts = toksOf(t)
        if (ts.length < 2) Nil
        else ts.sliding(2).map(p => (id, lang, p(0), p(1))).toSeq
      }
    val train = bigrams(_._3 == "en")
    val cxy = train.groupBy(b => (b._3, b._4)).view.mapValues(_.size.toLong).toMap
    val cx = train.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val n1 = cxy.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ncont = cxy.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val v = rows.filter(_._3 == "en").flatMap(r => toksOf(r._2))
      .distinct.size.toLong
    val tt = cxy.size.toLong
    if (v == 0) return Nil
    bigrams(_ => true).groupBy(b => (b._1, b._2)).toSeq.map { case ((id, lang), bs) =>
      var unseen = 0L
      val ps = bs.map { case (_, _, w1, w2) =>
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
      (id, lang, bs.size.toLong, unseen, (ps.sum / ps.size).toLong)
    }
  }

  private def bottomKRef(s: Seq[(Long, String, Long, Long, Long)]) =
    s.sortBy(r => (r._5, r._1)).take(graft.ops.ScaleOps28.Q187BottomK)

  private def runQ187(dir: String): Seq[(Long, String, Long, Long, Long)] =
    graft.ops.ScaleOps28.q187RefLmKnScore(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_unseen_ctx"),
        r.getAs[Long]("score_fp"))).toSeq

  test("q187 scalar law: reference-slice KN (train on en, score everyone) re-derives by hand and at sf0.001; out-of-reference text pays the continuation backoff; q183 and q187 rank the same split differently (the smoothing is the only delta)") {
    val dir = tempDir("q187-hand")
    val rows = Seq(
      (0L, "a b a b a c", "en"), (2L, "b c", "en"),  // the reference slice
      (1L, "a b z", "fr"),                           // seen + seen-ctx miss
      (3L, "z q", "zh"),                             // full backoff
      (5L, "w b", "fr"), (7L, "w c", "fr"))          // the KN separation pair
    writeLangDocs(dir, rows)
    val got = runQ187(dir.toString)
    assert(got == bottomKRef(scalarKnRef(rows)))
    val byId = got.map(r => r._1 -> r).toMap
    // same hand arithmetic as q186's corpus (T=4, V=3): the reference
    // docs 0/2 are in-model; doc 3 is full backoff at pc(q) = 1e6 div 7
    assert(byId(3L) == ((3L, "zh", 1L, 1L, 142857L)))
    // the KN law survives the reference-slice protocol
    assert(byId(5L)._5 == 285714L && byId(7L)._5 == 428571L)
    // real corpus: scalar re-derivation
    val real = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(runQ187(sf) == bottomKRef(scalarKnRef(real)))
    // q183 (add-k) and q187 (KN) on the real corpus: same protocol, same
    // reference slice, different rankings — the ablation is observable
    val knBottom = runQ187(sf).map(_._1)
    val addkBottom = graft.ops.ScaleOps27.q183RefLmScore(spark, sf)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(knBottom != addkBottom,
      "KN and add-k produced identical bottom-K ordering — no ablation signal")
  }

  test("q187 corners: a reference slice with tokens but ZERO bigrams scores everyone at the uniform continuation floor 1e6 div V (T = 0 — total formula, no special case); no reference tokens at all yields empty") {
    val dir = tempDir("q187-corner")
    // en docs all single-token: V = 2, T = 0
    writeLangDocs(dir, Seq(
      (0L, "hello", "en"), (2L, "hi", "en"), (1L, "le chat", "fr")))
    val got = runQ187(dir.toString)
    // pc(w2) = (0 + 1)·1e6 div (0 + 2) = 500000 for every w2; the fr
    // doc's single bigram is unseen-ctx -> full backoff
    assert(got == Seq((1L, "fr", 1L, 1L, 500000L)))
    // V = 0: no model
    writeLangDocs(dir, Seq((1L, "le chat", "fr")))
    assert(runQ187(dir.toString).isEmpty)
  }

  // --- Config.lmSmoothing: KN reachable from the pipeline ------------------

  test("pipeline lm_mix with lmSmoothing = KneserNey over lmRefLang: the (1,0,0) stage equals the manual scoreDocsWithLmKn composition; KN with NO reference scorer fails loudly; KN and add-k stages really gate different sets") {
    import graft.pipeline.{Curation, TrainingPipeline}
    import graft.pipeline.TrainingPipeline.LmSmoothing
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val params = Curation.Params(minQuality = 0.0, minTokens = 1,
      keepLangs = Seq("en", "es", "de", "fr", "und"))
    val cfg = TrainingPipeline.Config(curation = params, ctxTokens = 256L,
      lmTertileMix = Some((1.0, 0.0, 0.0)), lmRefLang = Some("en"),
      lmSmoothing = LmSmoothing.KneserNey)
    val r = TrainingPipeline.curateToTraining(spark, docs, None,
      cfg = cfg, ledger = false)
    val gotIds = r.packed.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    r.free()
    // manual composition: the q187 kernel over the curated corpus with
    // (V, T) measured exactly as the stage measures them
    val curated = Curation.curate(docs, "doc_id", "text", params)
    val ref = curated.filter(col("lang_pred") === "en")
    val v = graft.ops.ScaleOps27.vocabSize(ref)
    val pairs = graft.ops.ScaleOps27.trainLmPairs(ref)
    val tt = pairs.count()
    val wl = graft.ops.ScaleOps28.scoreDocsWithLmKn(curated, "doc_id",
        "text", pairs, v, tt)
      .select(col("doc_id"), col("score_fp"))
      .join(curated.select(col("doc_id").cast("long").as("doc_id"),
        col("lang_pred").as("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("score_fp"))
    val heads = graft.ops.ScaleOps25.assignTertiles(wl, Long.MaxValue)
      .filter(col("bucket") === "head")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(heads.nonEmpty && gotIds == heads,
      s"pipeline KN head set (${gotIds.size}) != composed (${heads.size})")
    // the add-k stage on the same config gates a DIFFERENT set — the
    // smoothing switch is observable end to end
    val rAddk = TrainingPipeline.curateToTraining(spark, docs, None,
      cfg = cfg.copy(lmSmoothing = LmSmoothing.AddK), ledger = false)
    val addkIds = rAddk.packed.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    rAddk.free()
    assert(addkIds != gotIds,
      "KN and add-k stages gated identical sets — the switch is inert")
    // KN without a reference model: LOUD, never a silent MLE fallback
    val e = intercept[IllegalArgumentException] {
      TrainingPipeline.curateToTraining(spark, docs, None,
        cfg = cfg.copy(lmRefLang = None), ledger = false)
    }
    assert(e.getMessage.contains("Kneser-Ney needs a reference model"))
  }

  test("pipeline lm_mix with lmSmoothing = KneserNey over a PERSISTED artifact: T is the _rows stamp (no new metadata), and the stage equals the manual loadLm + scoreDocsWithLmKn composition") {
    import graft.pipeline.{Curation, TrainingPipeline}
    import graft.pipeline.TrainingPipeline.LmSmoothing
    import graft.ml.BigramLm
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val params = Curation.Params(minQuality = 0.0, minTokens = 1,
      keepLangs = Seq("en", "es", "de", "fr", "und"))
    val refDocs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox runs")).toDF("doc_id", "text")
    val lmPath = tempDir("lm-kn-pipe").toString + "/lm"
    BigramLm.writeLm(spark, graft.ops.ScaleOps27.trainLmPairs(refDocs),
      graft.ops.ScaleOps27.vocabSize(refDocs), lmPath)
    val cfg = TrainingPipeline.Config(curation = params, ctxTokens = 256L,
      lmTertileMix = Some((1.0, 0.0, 0.0)), lmArtifactPath = Some(lmPath),
      lmSmoothing = LmSmoothing.KneserNey)
    val r = TrainingPipeline.curateToTraining(spark, docs, None,
      cfg = cfg, ledger = false)
    val gotIds = r.packed.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    r.free()
    val curated = Curation.curate(docs, "doc_id", "text", params)
    val (lp, lv) = BigramLm.loadLm(spark, lmPath)
    val tt = BigramLm.lmRows(spark, lmPath)
    assert(tt == lp.count(), "the _rows stamp must BE the KN type count T")
    val wl = graft.ops.ScaleOps28.scoreDocsWithLmKn(curated, "doc_id",
        "text", lp, lv, tt)
      .select(col("doc_id"), col("score_fp"))
      .join(curated.select(col("doc_id").cast("long").as("doc_id"),
        col("lang_pred").as("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("score_fp"))
    val heads = graft.ops.ScaleOps25.assignTertiles(wl, Long.MaxValue)
      .filter(col("bucket") === "head")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(heads.nonEmpty && gotIds == heads,
      s"pipeline artifact-KN head set (${gotIds.size}) != composed (${heads.size})")
  }
}
