package graft

import org.apache.spark.sql.functions._

/** Batch-27 ground truth: an INDEPENDENT scalar add-k reference-LM
  * (BigInt fixed point, plain Maps) for q183/q185, and the q184 /
  * [[graft.ml.BigramLm]] artifact lifecycle — warm loads, tamper/torn
  * self-heal, swap hygiene. */
class ScaleOps27Spec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def writeDocs(dir: java.nio.file.Path,
      rows: Seq[(Long, String, String)]): Unit =
    rows.map { case (id, txt, lang) => (id, txt, lang, "src0", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  // --- the independent scalar model ------------------------------------

  private val K = 10000L // ScaleOps24.Q175KFp, restated

  private def toksOf(t: String): Seq[String] =
    t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  /** (id, lang, n_bigrams, n_oov, score_fp) for every ≥2-token doc,
    * scored against the lang='en' reference slice — from the documented
    * definitions only. Nil when the reference has no tokens. */
  private def scalarRefScores(rows: Seq[(Long, String, String)])
      : Seq[(Long, String, Long, Long, Long)] = {
    val ref = rows.filter(_._3 == "en")
    val refBi = ref.flatMap { case (_, t, _) =>
      val ts = toksOf(t)
      if (ts.length < 2) Nil else ts.sliding(2).map(p => (p(0), p(1))).toSeq
    }
    val cxy = refBi.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cx = refBi.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val v = ref.flatMap(r => toksOf(r._2)).distinct.size.toLong
    if (v == 0) return Nil
    rows.flatMap { case (id, t, lang) =>
      val ts = toksOf(t)
      if (ts.length < 2) None
      else {
        val bs = ts.sliding(2).map(p => (p(0), p(1))).toSeq
        val ps = bs.map { b =>
          val c = cxy.getOrElse(b, 0L); val cxv = cx.getOrElse(b._1, 0L)
          (BigInt(c) * 1000000 + K) * 1000000 / (BigInt(cxv) * 1000000 + K * v)
        }
        Some((id, lang, bs.size.toLong,
          bs.count(b => !cxy.contains(b)).toLong,
          (ps.sum / ps.size).toLong))
      }
    }
  }

  private def runQ183(dir: String): Seq[(Long, String, Long, Long, Long)] =
    graft.ops.ScaleOps27.q183RefLmScore(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_oov"),
        r.getAs[Long]("score_fp"))).toSeq

  private def bottomK(scored: Seq[(Long, String, Long, Long, Long)])
      : Seq[(Long, String, Long, Long, Long)] =
    scored.sortBy(r => (r._5, r._1)).take(graft.ops.ScaleOps27.Q183BottomK)

  // --- q183 -------------------------------------------------------------

  test("q183 scalar law: reference docs carry ZERO OOV, fully-unseen text scores the uniform prior 10^6/V exactly, seen-context misses pay the context denominator; re-derives at sf0.001") {
    val dir = tempDir("q183-hand")
    val rows = Seq(
      (0L, "the cat sat", "en"),       // reference
      (2L, "the cat ran", "en"),       // reference; V = {the,cat,sat,ran} = 4
      (1L, "le chat", "fr"),           // fully unseen: 1 bigram, OOV
      (3L, "the dog", "de"),           // seen context 'the' (cx=2), unseen pair
      (5L, "solo", "fr"))              // single token: out of scope
    writeDocs(dir, rows)
    val scored = scalarRefScores(rows)
    val got = runQ183(dir.toString)
    assert(got == bottomK(scored))
    val byId = got.map(r => r._1 -> r).toMap
    // reference docs: every bigram in-model, zero OOV
    assert(byId(0L)._4 == 0L && byId(2L)._4 == 0L)
    // the uniform prior, hand-derived: (0 + k)·10^6 / (0 + k·4) = 250000
    assert(byId(1L) == ((1L, "fr", 1L, 1L, 250000L)))
    // seen-context miss: k·10^6 / (2·10^6 + k·4) = 10^10 / 2040000 = 4901
    assert(byId(3L) == ((3L, "de", 1L, 1L, 4901L)))
    assert(!byId.contains(5L))
    // the CCNet ordering: out-of-domain text sinks below reference text
    assert(byId(1L)._5 < byId(0L)._5 && byId(3L)._5 < byId(0L)._5)
    // real corpus re-derivation
    val real = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(runQ183(sf) == bottomK(scalarRefScores(real)))
  }

  test("q183: a corpus with NO reference-language tokens yields an EMPTY result — no model, no scores, no divide-by-zero") {
    val dir = tempDir("q183-noref")
    writeDocs(dir, Seq((1L, "le chat dort", "fr"), (2L, "der hund", "de")))
    assert(graft.ops.ScaleOps27.q183RefLmScore(spark, dir.toString)
      .collect().isEmpty)
    assert(graft.ops.ScaleOps27.q185RefLmTertileMix(spark, dir.toString)
      .collect().isEmpty)
  }

  // --- q184: the persisted LM artifact -----------------------------------

  test("q184 artifact lifecycle: result == q183 bit-for-bit; warm runs LOAD (stamp untouched); torn stamps, tampered pair files, and the mid-swap window all self-heal") {
    val dir = tempDir("q184-life")
    writeDocs(dir, Seq(
      (0L, "w1 w2 w3 w4 w2 w3", "en"),
      (2L, "w2 w3 w5", "en"),
      (1L, "w1 w2 w9", "fr"),
      (3L, "x1 x2", "de")))
    val expect = runQ183(dir.toString)
    def runQ184() = graft.ops.ScaleOps27.q184LmArtifactScore(spark, dir.toString)
      .collect().map(_.toSeq).toSeq
    val first = runQ184()
    assert(first == expect.map(r => Seq(r._1, r._2, r._3, r._4, r._5)),
      "the artifact round-trip must be invisible vs q183")
    val path = graft.ops.ScaleOps27.lmPathFor(spark, dir.toString)
    val stamp = new java.io.File(s"$path/_rows")
    assert(stamp.exists)
    val mtime = stamp.lastModified
    assert(runQ184() == first)
    assert(stamp.lastModified == mtime,
      "warm run must validate and LOAD the artifact, not rewrite the stamp")
    // torn stamp (writer died before _rows): self-heal, converge
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(new org.apache.hadoop.fs.Path(s"$path/_rows"), true)
    try os.write("999".getBytes("UTF-8")) finally os.close()
    assert(runQ184() == first, "torn stamp must self-heal")
    assert(graft.ml.BigramLm.lmRows(spark, path) > 0L &&
      graft.ml.BigramLm.lmRows(spark, path) != 999L)
    // the mid-swap crash window: pairs dir gone, stamps intact
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$path/pairs"), true))
    assert(runQ184() == first, "mid-swap death must self-heal")
    // out-of-API mutation: extra unstamped part file — stamps match the
    // signature but the on-disk count diverges; only loadLm's check sees
    // it, and the rebuild converges
    Seq(("zz", "zz", 1L)).toDF("w1", "w2", "cxy")
      .write.mode("append").parquet(s"$path/pairs")
    assert(runQ184() == first, "tampered pair table must self-heal")
    // no swap residue after all that
    assert(!new java.io.File(s"$path/pairs.swap").exists)
  }

  test("q184 hot path is METADATA-ONLY (r16 verdict #1): a stamped self-consistent LM artifact is loaded without re-deriving the reference signature — an internally-consistent forged model is trusted (the documented trade) until graft.artifact.audit=true catches it and self-heals") {
    val dir = tempDir("q184-hot")
    writeDocs(dir, Seq(
      (0L, "w1 w2 w3 w4 w2 w3", "en"),
      (2L, "w2 w3 w5", "en"),
      (1L, "w1 w2 w9", "fr"),
      (3L, "x1 x2", "de")))
    val honest = graft.ops.ScaleOps27.q184LmArtifactScore(spark, dir.toString)
      .collect().map(_.toSeq).toSeq
    assert(honest.nonEmpty)
    val path = graft.ops.ScaleOps27.lmPathFor(spark, dir.toString)
    // forge an internally-CONSISTENT wrong model: scale every count and
    // restamp (rows, xor) to match the forged pairs (keep _v)
    spark.read.parquet(s"$path/pairs")
      .withColumn("cxy", col("cxy") * 100L)
      .write.mode("overwrite").parquet(s"$path/pairs.tmp")
    spark.read.parquet(s"$path/pairs.tmp")
      .write.mode("overwrite").parquet(s"$path/pairs")
    val sig = spark.read.parquet(s"$path/pairs")
      .agg(count(lit(1)), coalesce(expr("bit_xor(xxhash64(w1, w2, cxy))"),
        lit(0L))).head()
    def scribble(p: String, v: String): Unit = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val os = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .create(hp, true)
      try os.write(v.getBytes("UTF-8")) finally os.close()
    }
    scribble(s"$path/_rows", sig.getLong(0).toString)
    scribble(s"$path/_xor", sig.getLong(1).toString)
    // hot path trusts the forgery — inflated counts shift the scores; if
    // the result still matched, the hot path re-ran the reference train
    val hot = graft.ops.ScaleOps27.q184LmArtifactScore(spark, dir.toString)
      .collect().map(_.toSeq).toSeq
    assert(hot != honest,
      "hot path rebuilt from the reference signature — it must be metadata-only")
    // audit mode re-derives the expected signature, catches, self-heals
    spark.conf.set("graft.artifact.audit", "true")
    try assert(graft.ops.ScaleOps27.q184LmArtifactScore(spark, dir.toString)
      .collect().map(_.toSeq).toSeq == honest)
    finally spark.conf.unset("graft.artifact.audit")
    // the healed artifact passes the hot path again
    assert(graft.ops.ScaleOps27.q184LmArtifactScore(spark, dir.toString)
      .collect().map(_.toSeq).toSeq == honest)
  }

  test("q184/BigramLm hygiene: writeLm refuses an empty model and v < 1; loadLm refuses a missing _v; a rewritten corpus gets a NEW artifact path") {
    import graft.ml.BigramLm
    val p = tempDir("lm-hyg").toString + "/m"
    intercept[IllegalArgumentException] {
      BigramLm.writeLm(spark,
        Seq.empty[(String, String, Long)].toDF("w1", "w2", "cxy"), 3L, p)
    }
    intercept[IllegalArgumentException] {
      BigramLm.writeLm(spark, Seq(("a", "b", 1L)).toDF("w1", "w2", "cxy"), 0L, p)
    }
    BigramLm.writeLm(spark, Seq(("a", "b", 1L)).toDF("w1", "w2", "cxy"), 2L, p)
    val (pairs, v) = BigramLm.loadLm(spark, p)
    assert(v == 2L && pairs.collect().map(_.toSeq).toSeq == Seq(Seq("a", "b", 1L)))
    // kill _v: the load must refuse loudly, not default
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$p/_v"), false))
    intercept[RuntimeException] { BigramLm.loadLm(spark, p) }
    // artifact path keys off corpus identity
    val d1 = tempDir("lm-key")
    writeDocs(d1, Seq((0L, "a b", "en")))
    val p1 = graft.ops.ScaleOps27.lmPathFor(spark, d1.toString)
    writeDocs(d1, Seq((0L, "a b c", "en")))
    val p2 = graft.ops.ScaleOps27.lmPathFor(spark, d1.toString)
    assert(p1 != p2, "a rewritten corpus must key a NEW artifact path")
  }

  test("q184 degenerate corpus (reference tokens but ZERO reference bigrams): the model EXISTS — uniform add-k prior — so q184 scores like q183 instead of returning empty, and nothing is persisted") {
    val dir = tempDir("q184-nobigram")
    // every en doc single-token: v = 2 ({hello, hi}), zero en bigrams;
    // the fr doc still scores — 1 bigram, OOV, uniform prior
    writeDocs(dir, Seq(
      (0L, "hello", "en"), (2L, "hi", "en"), (1L, "le chat", "fr")))
    val q183 = runQ183(dir.toString)
    val q184 = graft.ops.ScaleOps27.q184LmArtifactScore(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_oov"),
        r.getAs[Long]("score_fp"))).toSeq
    assert(q183.nonEmpty, "the uniform-prior model must score the fr doc")
    assert(q184 == q183, "q184 must match q183 on the no-bigram corner")
    // uniform prior hand-derived: (0 + k)·10^6 / (0 + k·2) = 500000
    assert(q184 == Seq((1L, "fr", 1L, 1L, 500000L)))
    // nothing persisted: writeLm refuses an empty pair table, so the
    // artifact path must not exist
    assert(!new java.io.File(
      graft.ops.ScaleOps27.lmPathFor(spark, dir.toString)).exists)
  }

  test("loadLm content-signature contract (r15): an out-of-API content swap that PRESERVES the row count refuses loudly at load — the stale-stamp / tampered-path window Config.lmArtifactPath crosses machines with") {
    import graft.ml.BigramLm
    val p = tempDir("lm-xor").toString + "/m"
    BigramLm.writeLm(spark, Seq(("a", "b", 1L)).toDF("w1", "w2", "cxy"), 2L, p)
    // same row count, different content — only the xor can see this
    Seq(("c", "d", 7L)).toDF("w1", "w2", "cxy")
      .write.mode("overwrite").parquet(s"$p/pairs")
    val e = intercept[IllegalArgumentException] { BigramLm.loadLm(spark, p) }
    assert(e.getMessage.contains("content signature"))
    // a missing _xor stamp is the same refusal class (one exception type
    // for ALL torn states — the r14 advice: sys.error escaped q184's
    // self-heal catch)
    BigramLm.writeLm(spark, Seq(("a", "b", 1L)).toDF("w1", "w2", "cxy"), 2L, p)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$p/_xor"), false))
    intercept[IllegalArgumentException] { BigramLm.loadLm(spark, p) }
    // ... and missing _v is now the same class too
    BigramLm.writeLm(spark, Seq(("a", "b", 1L)).toDF("w1", "w2", "cxy"), 2L, p)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$p/_v"), false))
    intercept[IllegalArgumentException] { BigramLm.loadLm(spark, p) }
  }

  test("writeLm unstamp-before-swap (r15): rewriting over a live artifact leaves fresh stamps; the formerly-silent same-count stale-stamp torn state is now refused by the xor check") {
    import graft.ml.BigramLm
    val p = tempDir("lm-order").toString + "/m"
    BigramLm.writeLm(spark, Seq(("a", "b", 3L)).toDF("w1", "w2", "cxy"), 2L, p)
    val x1 = BigramLm.lmXor(spark, p).get
    // rewrite with a DIFFERENT same-row-count model: stamps must follow
    BigramLm.writeLm(spark, Seq(("c", "d", 9L)).toDF("w1", "w2", "cxy"), 5L, p)
    val x2 = BigramLm.lmXor(spark, p).get
    assert(x1 != x2 && BigramLm.lmV(spark, p).contains(5L) &&
      BigramLm.lmRows(spark, p) == 1L)
    val (pairs, v) = BigramLm.loadLm(spark, p)
    assert(v == 5L &&
      pairs.collect().map(_.toSeq).toSeq == Seq(Seq("c", "d", 9L)))
    // emulate the pre-r15 torn state by hand: new pairs under OLD stamps
    // with the SAME row count — loadLm must refuse via the signature
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(new org.apache.hadoop.fs.Path(s"$p/_xor"), true)
    try os.write(x1.toString.getBytes("UTF-8")) finally os.close()
    intercept[IllegalArgumentException] { BigramLm.loadLm(spark, p) }
  }

  // --- the pipeline's reference-LM mix (Config.lmRefLang) -----------------

  test("pipeline lm_mix with a REFERENCE LM (lmRefLang = 'en', the q183 kernel): the (1,0,0) stage equals the manual composition; an absent reference language fails loudly; the bootstrap and reference scorers really differ") {
    import graft.pipeline.{Curation, TrainingPipeline}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val params = Curation.Params(minQuality = 0.0, minTokens = 1,
      keepLangs = Seq("en", "es", "de", "fr", "und"))
    val cfg = TrainingPipeline.Config(curation = params, ctxTokens = 256L,
      lmTertileMix = Some((1.0, 0.0, 0.0)), lmRefLang = Some("en"))
    val r = TrainingPipeline.curateToTraining(spark, docs, None,
      cfg = cfg, ledger = false)
    val gotIds = r.packed.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    r.free()
    // manual composition of the same pieces
    val curated = Curation.curate(docs, "doc_id", "text", params)
    val ref = curated.filter(col("lang_pred") === "en")
    val v = graft.ops.ScaleOps27.vocabSize(ref)
    assert(v >= 1)
    val refScores = graft.ops.ScaleOps27.scoreDocsWithLm(
        curated, "doc_id", "text",
        graft.ops.ScaleOps27.trainLmPairs(ref), v)
      .select(col("doc_id"), col("score_fp"))
    val wl = refScores
      .join(curated.select(col("doc_id").cast("long").as("doc_id"),
        col("lang_pred").as("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("score_fp"))
    val heads = graft.ops.ScaleOps25.assignTertiles(wl, Long.MaxValue)
      .filter(col("bucket") === "head")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(heads.nonEmpty && gotIds == heads,
      s"pipeline ref-LM head set (${gotIds.size}) != composed (${heads.size})")
    // a reference language with no tokens in the gated corpus: LOUD
    intercept[IllegalArgumentException] {
      TrainingPipeline.curateToTraining(spark, docs, None,
        cfg = cfg.copy(lmRefLang = Some("zz")), ledger = false)
    }
    // the bootstrap (corpus-as-own-LM) and reference scorers genuinely
    // differ on this corpus — otherwise lmRefLang would be untestable
    val mle = graft.ops.ScaleOps22.mleDocScoresOf(curated)
      .select(col("doc_id"), col("score_fp")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val rl = refScores.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(mle.exists { case (id, s) => rl.get(id).exists(_ != s) },
      "reference-LM scores coincide with the MLE bootstrap everywhere")
  }

  test("pipeline lm_mix against a PERSISTED artifact (lmArtifactPath — the q184 ship-the-model loop): equals the manual loadLm composition; a torn artifact fails the stage loudly") {
    import graft.pipeline.{Curation, TrainingPipeline}
    import graft.ml.BigramLm
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val params = Curation.Params(minQuality = 0.0, minTokens = 1,
      keepLangs = Seq("en", "es", "de", "fr", "und"))
    // an EXTERNAL reference model, trained on a planted corpus that is
    // NOT the pipeline's input — the cross-corpus shipping shape
    val refDocs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox runs")).toDF("doc_id", "text")
    val pairs = graft.ops.ScaleOps27.trainLmPairs(refDocs)
    val v = graft.ops.ScaleOps27.vocabSize(refDocs)
    val lmPath = tempDir("lm-pipe").toString + "/lm"
    BigramLm.writeLm(spark, pairs, v, lmPath)
    val cfg = TrainingPipeline.Config(curation = params, ctxTokens = 256L,
      lmTertileMix = Some((1.0, 0.0, 0.0)), lmArtifactPath = Some(lmPath))
    val r = TrainingPipeline.curateToTraining(spark, docs, None,
      cfg = cfg, ledger = false)
    val gotIds = r.packed.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    r.free()
    // manual composition through the loaded artifact
    val curated = Curation.curate(docs, "doc_id", "text", params)
    val (lp, lv) = BigramLm.loadLm(spark, lmPath)
    val wl = graft.ops.ScaleOps27.scoreDocsWithLm(curated, "doc_id", "text",
        lp, lv)
      .select(col("doc_id"), col("score_fp"))
      .join(curated.select(col("doc_id").cast("long").as("doc_id"),
        col("lang_pred").as("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("score_fp"))
    val heads = graft.ops.ScaleOps25.assignTertiles(wl, Long.MaxValue)
      .filter(col("bucket") === "head")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(heads.nonEmpty && gotIds == heads,
      s"pipeline artifact-LM head set (${gotIds.size}) != composed (${heads.size})")
    // torn artifact: the stage must refuse loudly, never score with it
    val fs = new org.apache.hadoop.fs.Path(lmPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(new org.apache.hadoop.fs.Path(s"$lmPath/_rows"), true)
    try os.write("12345".getBytes("UTF-8")) finally os.close()
    intercept[IllegalArgumentException] {
      TrainingPipeline.curateToTraining(spark, docs, None,
        cfg = cfg, ledger = false)
    }
  }

  // --- q185 -------------------------------------------------------------

  private def splitBucketScalar(id: Long): Long = {
    val a = 2654435761L
    val id32 = java.lang.Math.floorMod(id, 4294967296L)
    val hi = id32 >> 16; val lo = id32 % 65536L
    java.lang.Math.floorMod((hi * a % 65536L) * 65536L + lo * a, 4294967296L)
  }

  private def pct2(vs: Seq[Double], p: Double): Double = {
    val s = vs.sorted; val pos = p * (s.length - 1); val lo = pos.floor.toInt
    if (lo + 1 >= s.length) s(s.length - 1)
    else s(lo) * (lo + 1 - pos) + s(lo + 1) * (pos - lo)
  }

  test("q185 scalar law: reference-LM scores through per-language tertiles and the q180 keep rates — re-derives at sf0.001; head keeps everything; buckets partition the scored corpus") {
    val rates = Map("head" -> 1.0, "middle" -> 0.5, "tail" -> 0.1)
    def scalarMix(rows: Seq[(Long, String, String)])
        : Seq[(String, String, Long, Long, Long)] = {
      val scored = scalarRefScores(rows).map(r => (r._1, r._2, r._5))
      val buckets = scored.groupBy(_._2).toSeq.flatMap { case (lang, g) =>
        val ds = g.map(_._3.toDouble)
        val (b1, b2) = (pct2(ds, 1.0 / 3.0), pct2(ds, 2.0 / 3.0))
        g.map { r =>
          val b = if (r._3.toDouble > b2) "head"
                  else if (r._3.toDouble > b1) "middle" else "tail"
          (r._1, lang, b)
        }
      }
      buckets.groupBy(r => (r._2, r._3)).toSeq.sortBy(_._1)
        .map { case ((lang, b), g) =>
          val kept = g.count(r =>
            splitBucketScalar(r._1) < (rates(b) * 4294967296.0).toLong)
          (lang, b, g.size.toLong, kept.toLong,
            kept.toLong * 1000000L / g.size)
        }
    }
    def run(d: String) = graft.ops.ScaleOps27.q185RefLmTertileMix(spark, d)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[String]("bucket"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("kept_share_fp"))).toSeq
    val real = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val got = run(sf)
    assert(got == scalarMix(real))
    // head law + coverage
    val heads = got.filter(_._2 == "head")
    assert(heads.nonEmpty)
    heads.foreach { h => assert(h._4 == h._3 && h._5 == 1000000L) }
    assert(got.map(_._3).sum == scalarRefScores(real).size.toLong)
    // the REFERENCE language's docs score against their own training
    // text, so 'en' must populate a head (the CCNet shape: reference-like
    // text floats)
    assert(got.exists(r => r._1 == "en" && r._2 == "head" && r._3 > 0))
  }
}
