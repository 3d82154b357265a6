package graft

import org.apache.spark.sql.functions._

/** Batch-30 ground truth: an INDEPENDENT scalar fixed-point log₂ model
  * (BigInt shifts, plain Maps — the documented square-and-compare
  * algorithm re-implemented from its definition) for q190, the
  * approximation-error law against libm, and the corner pins. */
class ScaleOps30Spec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def writeLangDocs(dir: java.nio.file.Path,
      rows: Seq[(Long, String, String)]): Unit =
    rows.map { case (id, txt, lang) => (id, txt, lang, "src0", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def toksOf(t: String): Seq[String] =
    t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  /** −log₂(num/den) × 2²⁰ by the documented algorithm, BigInt only. */
  private def lneg(num: BigInt, den: BigInt): Long = {
    val r = ((num << 62) / den).max(1)
    val e = r.bitLength - 1
    var m = (r << 31) >> e
    var frac = 0L
    for (i <- 1 to 20) {
      val mm = (m * m) >> 31
      if (mm >= (BigInt(1) << 32)) { frac += 1L << (20 - i); m = mm >> 1 }
      else m = mm
    }
    (62L - e) * (1L << 20) - frac
  }

  /** (id, lang, n_bigrams, n_oov, plx_fp) for every ≥2-token doc under
    * the reference-slice add-k model, log-domain collapse. */
  private def scalarQ190(rows: Seq[(Long, String, String)])
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
    val v = rows.filter(_._3 == "en").flatMap(r => toksOf(r._2))
      .distinct.size.toLong
    if (v == 0) return Nil
    val k = graft.ops.ScaleOps24.Q175KFp
    bigrams(_ => true).groupBy(b => (b._1, b._2)).toSeq.map { case ((id, lang), bs) =>
      var oov = 0L
      val ls = bs.map { case (_, _, w1, w2) =>
        val c = cxy.getOrElse((w1, w2), 0L)
        if (c == 0L) oov += 1
        lneg(BigInt(c) * 1000000 + k,
          BigInt(cx.getOrElse(w1, 0L)) * 1000000 + BigInt(k) * v)
      }
      (id, lang, bs.size.toLong, oov, ls.sum / ls.size)
    }
  }

  private def topK(s: Seq[(Long, String, Long, Long, Long)]) =
    s.sortBy(r => (-r._5, r._1)).take(graft.ops.ScaleOps30.Q190TopK)

  private def run(dir: String): Seq[(Long, String, Long, Long, Long)] =
    graft.ops.ScaleOps30.q190LogPerplexityScore(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_oov"),
        r.getAs[Long]("plx_fp"))).toSeq

  test("q190 scalar law: the BigInt square-and-compare model re-derives the engine at sf0.001 and on a hand corpus; known-value pins; exact powers of two have ZERO error; v = 0 yields empty") {
    // hand pins straight from the algorithm (cross-checked against
    // DuckDB and libm during design): -log2(10^4/(2*10^12+10^4)) and
    // -log2(p)=0 at p=1
    assert(lneg(BigInt(10000), BigInt("2000000010000")) == 28914929L)
    assert(lneg(BigInt(5), BigInt(5)) == 0L)
    // exact powers of two: truncation contributes nothing
    assert(lneg(BigInt(1), BigInt(8)) == 3L * (1L << 20))
    assert(lneg(BigInt(1), BigInt(1) << 62) == 62L * (1L << 20))
    val dir = tempDir("q190-hand")
    val rows = Seq(
      (0L, "a b a b a c", "en"), (2L, "b c", "en"),
      (1L, "a b z", "fr"), (3L, "z q", "zh"),
      (5L, "w b", "fr"), (7L, "w c", "fr"))
    writeLangDocs(dir, rows)
    assert(run(dir.toString) == topK(scalarQ190(rows)))
    // real corpus
    val real = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(run(sf) == topK(scalarQ190(real)))
    // v = 0: no model, empty on both engines
    writeLangDocs(dir, Seq((1L, "le chat", "fr")))
    assert(run(dir.toString).isEmpty)
    // v >= 1 but ZERO scorable docs (every doc single-token): empty —
    // and FAST. This exact two-doc corpus hung the r15 build's planner
    // for >30 min (AQE empty propagation + project-collapse inlining
    // the 20-round alias tower into a ~2^20-node tree); the r16 interim
    // was an eager take(1) guard, and since r17 the chain lives inside
    // the single NegLog2Fp expression, so the kernel is lazy again and
    // this corner must plan linearly with no guard at all
    writeLangDocs(dir, Seq((1L, "hello", "en"), (2L, "le", "fr")))
    assert(run(dir.toString).isEmpty)
    // scope is exact about split()'s edge-empty tokens: a doc whose
    // tokens include a trailing empty ("a\t" — trim strips spaces only)
    // has 2 array slots but yields NO bigram and must stay out of scope,
    // while a genuine 2-token doc scores
    val docs2 = Seq((1L, "a\t"), (2L, "a b")).toDF("doc_id", "text")
    val pairs2 = Seq(("a", "b", 1L)).toDF("w1", "w2", "cxy")
    val got2 = graft.ops.ScaleOps30.scoreDocsWithLmLog2(docs2, "doc_id",
      "text", pairs2, 2L).select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    assert(got2 == Seq(2L), s"edge-empty-token doc leaked into scope: $got2")
  }

  test("q190 approximation law: plx_fp is within 3·2⁻²⁰ of libm's geometric mean on every sf0.001 document, and the log-domain integer ranking IS the perplexity ranking (rho vs Math.log > 0.99999)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"), col("lang"))
    val ref = docs.filter(col("lang") === "en")
    val pairs = graft.ops.ScaleOps27.trainLmPairs(ref)
    val v = graft.ops.ScaleOps27.vocabSize(ref)
    val kFp = graft.ops.ScaleOps24.Q175KFp
    val engine = graft.ops.ScaleOps30.scoreDocsWithLmLog2(docs, "doc_id",
        "text", pairs, v)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("plx_fp")).toMap
    val ctx = pairs.groupBy(col("w1")).agg(sum(col("cxy")).as("cx"))
    val grouped = graft.ops.ScaleOps27
      .heldBigramCounts(docs, "doc_id", "text", pairs, ctx)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cxy"),
        r.getAs[Long]("cx"), r.getAs[Long]("n")))
    val libm: Map[Long, Double] = grouped.groupBy(_._1).view.mapValues { rs =>
      val n = rs.map(_._4).sum.toDouble
      rs.map { case (_, cxy, cx, c) =>
        val num = BigDecimal(cxy) * 1000000 + kFp
        val den = BigDecimal(cx) * 1000000 + BigDecimal(kFp) * v
        -c * (math.log((num / den).toDouble) / math.log(2.0))
      }.sum / n
    }.toMap
    assert(engine.keySet == libm.keySet && engine.nonEmpty)
    val tol = 3.0 / (1L << 20)
    engine.foreach { case (id, plx) =>
      val got = plx.toDouble / (1L << 20)
      assert(math.abs(got - libm(id)) <= tol,
        f"doc $id: integer log2 $got%.7f vs libm ${libm(id)}%.7f")
    }
    // ranking fidelity: the integer ranking is the perplexity ranking
    def ranks(xs: Seq[Double]): Seq[Double] = {
      val sorted = xs.zipWithIndex.sortBy(_._1)
      val r = new Array[Double](xs.size)
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
    val ids = engine.keys.toSeq.sorted
    val rx = ranks(ids.map(engine(_).toDouble))
    val ry = ranks(ids.map(libm))
    val mx = rx.sum / rx.size; val my = ry.sum / ry.size
    val rho = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum /
      (math.sqrt(rx.map(a => (a - mx) * (a - mx)).sum) *
        math.sqrt(ry.map(b => (b - my) * (b - my)).sum))
    assert(rho > 0.99999, s"integer-log2 ranking drifted from libm: rho=$rho")
  }

  test("pipeline lm_mix with lmScoreDomain = LogPerplexity: the (1,0,0) stage equals the manual negated-plx composition, gates a DIFFERENT set than the arithmetic domain (the pinned ~16% tertile flips are live), and invalid domain combos fail loudly") {
    import graft.pipeline.{Curation, TrainingPipeline}
    import graft.pipeline.TrainingPipeline.{LmScoreDomain, LmSmoothing}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val params = Curation.Params(minQuality = 0.0, minTokens = 1,
      keepLangs = Seq("en", "es", "de", "fr", "und"))
    val cfg = TrainingPipeline.Config(curation = params, ctxTokens = 256L,
      lmTertileMix = Some((1.0, 0.0, 0.0)), lmRefLang = Some("en"),
      lmScoreDomain = LmScoreDomain.LogPerplexity)
    val r = TrainingPipeline.curateToTraining(spark, docs, None,
      cfg = cfg, ledger = false)
    val gotIds = r.packed.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    r.free()
    // manual composition: the q190 kernel, negated, through the same
    // tertile/mix chain
    val curated = Curation.curate(docs, "doc_id", "text", params)
    val ref = curated.filter(col("lang_pred") === "en")
    val v = graft.ops.ScaleOps27.vocabSize(ref)
    val wl = graft.ops.ScaleOps30.scoreDocsWithLmLog2(curated, "doc_id",
        "text", graft.ops.ScaleOps27.trainLmPairs(ref), v)
      .select(col("doc_id"), (-col("plx_fp")).as("score_fp"))
      .join(curated.select(col("doc_id").cast("long").as("doc_id"),
        col("lang_pred").as("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("score_fp"))
    val heads = graft.ops.ScaleOps25.assignTertiles(wl, Long.MaxValue)
      .filter(col("bucket") === "head")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(heads.nonEmpty && gotIds == heads,
      s"pipeline log-domain head set (${gotIds.size}) != composed (${heads.size})")
    // the arithmetic domain gates a DIFFERENT set on the same corpus
    val rA = TrainingPipeline.curateToTraining(spark, docs, None,
      cfg = cfg.copy(lmScoreDomain = LmScoreDomain.Arithmetic), ledger = false)
    val aIds = rA.packed.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    rA.free()
    assert(aIds != gotIds,
      "log and arithmetic domains gated identical sets — the switch is inert")
    // invalid combos: LOUD
    assert(intercept[IllegalArgumentException] {
      TrainingPipeline.curateToTraining(spark, docs, None,
        cfg = cfg.copy(lmSmoothing = LmSmoothing.KneserNey), ledger = false)
    }.getMessage.contains("log-domain twin"))
    assert(intercept[IllegalArgumentException] {
      TrainingPipeline.curateToTraining(spark, docs, None,
        cfg = cfg.copy(lmRefLang = None), ledger = false)
    }.getMessage.contains("zero probabilities"))
  }

  test("lmScoreDomain DEFAULT decision (r15 verdict #4, pinned): the default ranking is Arithmetic — because the default scorer is the MLE bootstrap, where the log domain is undefined — and the all-defaults lm_mix configuration actually RUNS; flipping the default would break it") {
    import graft.pipeline.{Curation, TrainingPipeline}
    import graft.pipeline.TrainingPipeline.{LmScoreDomain, LmSmoothing}
    // the decision itself, pinned where a default flip would trip it:
    // anyone changing the default must come read the rationale at
    // Config.lmScoreDomain and update this spec deliberately
    val dcfg = TrainingPipeline.Config()
    assert(dcfg.lmScoreDomain == LmScoreDomain.Arithmetic)
    assert(dcfg.lmSmoothing == LmSmoothing.AddK)
    assert(dcfg.lmRefLang.isEmpty && dcfg.lmArtifactPath.isEmpty,
      "the default scorer is the MLE bootstrap — the premise of the " +
        "Arithmetic default; if a reference scorer ever becomes the " +
        "default, revisit the domain default too")
    // composability law: lm_mix with ONLY the rates set (every other
    // knob at its default) must run — the exact configuration a
    // LogPerplexity default would make fail its own loud guard
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val params = Curation.Params(minQuality = 0.0, minTokens = 1,
      keepLangs = Seq("en", "es", "de", "fr", "und"))
    val r = TrainingPipeline.curateToTraining(spark, docs, None,
      cfg = TrainingPipeline.Config(curation = params, ctxTokens = 256L,
        lmTertileMix = Some((1.0, 0.5, 0.1))),
      ledger = false)
    assert(r.stages.exists(s => s.stage == "lm_mix" && s.rowsOut > 0))
    r.free()
  }
}
