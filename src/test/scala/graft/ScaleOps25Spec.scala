package graft

import org.apache.spark.sql.functions._

/** Ground-truth laws for the batch-25 quality classifier (q176 train /
  * q177 apply): an INDEPENDENT scalar batch-perceptron written from the
  * documented definitions (BigInt margins, plain Maps), so a drifted
  * engine kernel can't hide behind an oracle that shares it. */
class ScaleOps25Spec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def writeDocs(dir: java.nio.file.Path,
      rows: Seq[(Long, String, String)]): Unit =
    rows.map { case (id, txt, lang) => (id, txt, lang, "src0", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  // --- the independent scalar model ------------------------------------

  private def fnv(s: String): Long = {
    var h = 0xcbf29ce484222325L
    s.getBytes("UTF-8").foreach { b => h = (h ^ (b & 0xffL)) * 1099511628211L }
    h
  }

  private def toksOf(t: String): Seq[String] =
    t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  /** (doc_id, y, bucket -> x) over non-empty docs, bias at bucket 64. */
  private def featuresOf(rows: Seq[(Long, String, String)])
      : Seq[(Long, Long, Map[Long, Long])] =
    rows.flatMap { case (id, text, lang) =>
      val ts = toksOf(text)
      if (ts.isEmpty) None
      else {
        val y = if (lang == "en") 1L else -1L
        val counts = ts.groupBy(tk => fnv(tk) & 63L)
          .map { case (b, g) => b -> g.size.toLong }
        Some((id, y, counts + (64L -> 1L)))
      }
    }

  /** K epochs of the batch perceptron over the doc_id-even half. */
  private def trainScalar(rows: Seq[(Long, String, String)],
      epochs: Int = graft.ops.ScaleOps25.Q176Epochs): Array[Long] = {
    val tr = featuresOf(rows).filter(_._1 % 2 == 0)
    val w = Array.fill(65)(0L)
    for (_ <- 1 to epochs) {
      val delta = Array.fill(65)(0L)
      tr.foreach { case (_, y, xs) =>
        val m = xs.map { case (b, x) => BigInt(x) * w(b.toInt) }.sum
        if (BigInt(y) * m <= 0)                       // tie counts as WRONG
          xs.foreach { case (b, x) => delta(b.toInt) += y * x }
      }
      (0 until 65).foreach(i => w(i) += delta(i))
    }
    w
  }

  private def scoreScalar(rows: Seq[(Long, String, String)], w: Array[Long])
      : Seq[(Long, Long, Long, Long, Long)] =
    featuresOf(rows).filter(_._1 % 2 == 1)
      .map { case (id, y, xs) =>
        val m = xs.map { case (b, x) => BigInt(x) * w(b.toInt) }.sum
        (id, m.toLong, y, if (m > 0) 1L else -1L,
          if ((m > 0) == (y > 0)) 1L else 0L)
      }
      .sortBy(r => (r._2, r._1)).take(graft.ops.ScaleOps25.Q177BottomK)

  private def runQ176(dir: String): Seq[(Long, Long)] =
    graft.ops.ScaleOps25.q176PerceptronTrain(spark, dir)
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("weight"))).toSeq

  private def runQ177(dir: String): Seq[(Long, Long, Long, Long, Long)] =
    graft.ops.ScaleOps25.q177PerceptronApply(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score"),
        r.getAs[Long]("y"), r.getAs[Long]("predicted"),
        r.getAs[Long]("correct"))).toSeq

  // --- laws -------------------------------------------------------------

  test("q176 scalar law: hand corpus — engine weights equal the independent BigInt batch perceptron; epoch 1 updates on EVERY doc (y·0 <= 0, the tie-is-wrong law)") {
    val dir = tempDir("q176-hand")
    val rows = Seq(
      (0L, "good solid prose here", "en"),
      (2L, "bon texte ici oui", "fr"),
      (4L, "good prose good prose good", "en"),
      (6L, "texte oui bon bon", "fr"),
      (8L, "   ", "en"),                  // all-whitespace: no features
      (1L, "good prose oui", "en"),       // held out (odd) — not trained on
      (3L, "bon texte here", "de"))
    writeDocs(dir, rows)
    val w = trainScalar(rows)
    assert(runQ176(dir.toString) ==
      w.zipWithIndex.map { case (wt, b) => (b.toLong, wt) }.toSeq)
    // the tie law, derived independently: with w0 = 0 every margin is 0
    // and y·0 <= 0, so epoch 1's update is Σ y·x over ALL trained docs —
    // including the bias bucket, whose epoch-1 weight is (#en − #rest)
    val e1 = trainScalar(rows, epochs = 1)
    val tr = featuresOf(rows).filter(_._1 % 2 == 0)
    val sumYX = Array.fill(65)(0L)
    tr.foreach { case (_, y, xs) =>
      xs.foreach { case (b, x) => sumYX(b.toInt) += y * x } }
    assert(e1.toSeq == sumYX.toSeq)
    assert(e1(64) == tr.count(_._2 == 1L) - tr.count(_._2 == -1L))
    // the whitespace-only doc contributed nothing anywhere (not even bias)
    assert(tr.forall(_._1 != 8L))
    // label law: en -> +1, anything else (fr, de) -> -1
    assert(featuresOf(rows).find(_._1 == 3L).get._2 == -1L)
  }

  test("q176 bucket law: B is a power of two, so the signed & 63 equals the mirror's UNSIGNED % 64 for every hash — including negative ones (2^64 = 0 mod 64)") {
    assert(Integer.bitCount(graft.ops.ScaleOps25.Q176Buckets) == 1)
    // a known-negative fnv (the q23 pin constant) and a sweep
    assert(fnv("neg10x") == -3976726914049493464L)
    val probes = "neg10x" +: (1 to 100).map(i => s"tk$i")
    probes.foreach { t =>
      val h = fnv(t)
      val unsignedMod = BigInt(java.lang.Long.toUnsignedString(h)).mod(64).toLong
      assert((h & 63L) == unsignedMod, s"token $t: signed & vs unsigned % split")
    }
  }

  test("q177 scalar law: held-out scores, predicted sign (score <= 0 -> -1), and correct flag re-derive; disjoint-vocab corpus ranks every non-en doc below every en doc") {
    val dir = tempDir("q177-hand")
    // vocabularies chosen DISJOINT in bucket space (verified below), so
    // the trained weights must separate the halves and the bottom of the
    // q177 ranking must be exactly the non-en docs
    val enToks = Seq("alpha", "bravo", "charlie")
    val frToks = Seq("zulu", "yankee", "xray")
    val enB = enToks.map(t => fnv(t) & 63L).toSet
    val frB = frToks.map(t => fnv(t) & 63L).toSet
    assert(enB.intersect(frB).isEmpty, "fixture bug: bucket collision — pick other tokens")
    val rows = Seq(
      (0L, "alpha bravo charlie alpha", "en"),
      (2L, "zulu yankee xray", "fr"),
      (4L, "alpha charlie bravo", "en"),
      (6L, "zulu xray zulu", "fr"),
      (1L, "alpha bravo", "en"),
      (3L, "zulu yankee", "fr"),
      (5L, "charlie alpha charlie", "en"),
      (7L, "xray xray", "fr"))
    writeDocs(dir, rows)
    val w = trainScalar(rows)
    val expect = scoreScalar(rows, w)
    val got = runQ177(dir.toString)
    assert(got == expect)
    // predicted law holds row-by-row on the engine output
    got.foreach { case (_, score, y, predicted, correct) =>
      assert(predicted == (if (score > 0) 1L else -1L))
      assert(correct == (if ((score > 0) == (y > 0)) 1L else 0L))
    }
    // separation: every non-en held-out doc scores strictly below every
    // en held-out doc (disjoint buckets make this a theorem, not luck)
    val en = got.filter(_._3 == 1L).map(_._2)
    val fr = got.filter(_._3 == -1L).map(_._2)
    assert(en.nonEmpty && fr.nonEmpty && fr.max < en.min)
    assert(got.forall(_._5 == 1L), "disjoint-vocab model must classify all held-out docs correctly")
  }

  test("q176/q177: empty training half -> all-zero weights; q177 then scores 0 with predicted -1 everywhere (the tie sign)") {
    val dir = tempDir("q176-empty")
    writeDocs(dir, Seq((1L, "a b c", "en"), (3L, "d e f", "fr")))
    assert(runQ176(dir.toString).forall(_._2 == 0L))
    val got = runQ177(dir.toString)
    assert(got.map(_._1) == Seq(1L, 3L))
    got.foreach { case (_, score, y, predicted, correct) =>
      assert(score == 0L && predicted == -1L)
      assert(correct == (if (y == -1L) 1L else 0L))
    }
  }

  test("q176/q177 differential at sf0.001: engine == independent scalar model over the real corpus") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val w = trainScalar(rows)
    assert(runQ176(sf) ==
      w.zipWithIndex.map { case (wt, b) => (b.toLong, wt) }.toSeq)
    assert(runQ177(sf) == scoreScalar(rows, w))
    // the model actually learned something: weights are not all zero and
    // epoch 4 differs from epoch 1 (the loop ran, not just the first pass)
    assert(w.exists(_ != 0L))
    assert(w.toSeq != trainScalar(rows, epochs = 1).toSeq)
  }

  // --- q178 / PerceptronModel: the persisted classifier artifact ---------

  test("q178 artifact law: score-through-the-loaded-model is IDENTICAL to q177 (round-trip invisibility), and a warm rerun trusts the artifact (stamp mtime unchanged)") {
    import graft.ml.PerceptronModel
    val dir = tempDir("q178-hand")
    writeDocs(dir, Seq(
      (0L, "alpha bravo charlie alpha", "en"), (2L, "zulu yankee xray", "fr"),
      (1L, "alpha bravo", "en"), (3L, "zulu yankee", "fr")))
    val q177 = runQ177(dir.toString)
    val got = graft.ops.ScaleOps25.q178PerceptronArtifact(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score"),
        r.getAs[Long]("y"), r.getAs[Long]("predicted"),
        r.getAs[Long]("correct"))).toSeq
    assert(got == q177 && got.nonEmpty)
    val path = PerceptronModel.modelPathFor(spark, dir.toString)
    val stamp = new java.io.File(s"$path/_rows")
    assert(stamp.exists)
    assert(PerceptronModel.modelRows(spark, path) == 65L)
    val mtime = stamp.lastModified
    assert(graft.ops.ScaleOps25.q178PerceptronArtifact(spark, dir.toString)
      .collect().map(_.toSeq).toSeq == got.map(t => Seq(t._1, t._2, t._3, t._4, t._5)))
    assert(stamp.lastModified == mtime,
      "warm rerun must LOAD the artifact, not rewrite it")
  }

  test("q178 self-heal: a torn stamp AND a same-size-different-weights artifact both rewrite in place; loadModel is loud on a parsing-but-wrong stamp") {
    import graft.ml.PerceptronModel
    val dir = tempDir("q178-heal")
    writeDocs(dir, Seq(
      (0L, "alpha bravo charlie", "en"), (2L, "zulu yankee xray", "fr"),
      (1L, "alpha charlie", "en"), (3L, "xray xray", "fr")))
    val expect = graft.ops.ScaleOps25.q178PerceptronArtifact(spark, dir.toString)
      .collect().map(_.toSeq).toSeq
    val path = PerceptronModel.modelPathFor(spark, dir.toString)
    // tamper through the Hadoop FS (raw NIO would desync the
    // LocalFileSystem's .crc sidecar and fail on checksum, not on the
    // validation under test)
    def writeStamp(v: String): Unit = {
      val hp = new org.apache.hadoop.fs.Path(s"$path/_rows")
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(hp, true)
      try out.write(v.getBytes("UTF-8")) finally out.close()
    }
    // torn stamp: garbage bytes read as "never stamped" -> rewrite
    writeStamp("garbage")
    assert(PerceptronModel.modelRows(spark, path) == -1L)
    assert(graft.ops.ScaleOps25.q178PerceptronArtifact(spark, dir.toString)
      .collect().map(_.toSeq).toSeq == expect)
    assert(PerceptronModel.modelRows(spark, path) == 65L)
    // same-size-different-weights (a semantics change under one corpus
    // signature): stamp validates, loadModel validates, only the CONTENT
    // compare catches it. Since r17 the HOT path trusts such an artifact
    // by design (path-keying + self-validating stamps — the documented
    // metadata-only trade); graft.artifact.audit=true retrains,
    // compares, and rewrites in place.
    val tampered = PerceptronModel.loadModel(spark, path).clone()
    // shift EVERY weight so whatever features fire, the scores move
    tampered.indices.foreach(i => tampered(i) += 1000000L)
    PerceptronModel.writeModel(spark, tampered, path)
    assert(graft.ops.ScaleOps25.q178PerceptronArtifact(spark, dir.toString)
      .collect().map(_.toSeq).toSeq != expect,
      "hot path retrained — it must trust a stamped self-consistent " +
        "artifact and cost metadata only")
    spark.conf.set("graft.artifact.audit", "true")
    try assert(graft.ops.ScaleOps25.q178PerceptronArtifact(spark, dir.toString)
      .collect().map(_.toSeq).toSeq == expect)
    finally spark.conf.unset("graft.artifact.audit")
    assert(PerceptronModel.loadModel(spark, path)(0) == tampered(0) - 1000000L,
      "the tampered artifact must have been rewritten with the trained weights")
    // and the healed artifact passes the hot path again
    assert(graft.ops.ScaleOps25.q178PerceptronArtifact(spark, dir.toString)
      .collect().map(_.toSeq).toSeq == expect)
    // a stamp that PARSES but disagrees is the loud path
    writeStamp("7")
    intercept[IllegalArgumentException] {
      PerceptronModel.loadModel(spark, path)
    }
  }

  // --- the pipeline's learned gate ---------------------------------------

  test("pipeline learned gate E2E: trains on the curated corpus, drops model-rejected docs before decontamination, ledgers the stage, and reruns bit-stably") {
    import graft.pipeline.{TrainingPipeline, Curation}
    // the gate trains on lang_pred == "en" vs rest: plant REAL stopword-y
    // English for the en half (langId must predict en) and gibberish for
    // the rest (predicts und — kept through curation via keepLangs so the
    // LEARNED gate, not the heuristic, does the dropping). Gibberish
    // tokens chosen bucket-DISJOINT from every English token (verified
    // below), so the separation is a theorem, not hash luck.
    val enTexts = Map(
      0L -> "the quick brown fox and the lazy dog are here",
      4L -> "this is a good and plain piece of english text",
      1L -> "the cat sat on the mat and it was happy there",
      5L -> "we should keep this document because it is fine")
    val gibTexts = Map(
      2L -> "gib1x gib3x gib4x gib5x",
      6L -> "gib5x gib7x gib12x gib16x",
      3L -> "gib3x gib15x gib16x gib1x",
      7L -> "gib12x gib15x gib4x gib7x")
    def fnvB(t: String): Long = fnv(t) & 63L
    val enB = enTexts.values.flatMap(_.split(" ")).map(fnvB).toSet
    val gibB = gibTexts.values.flatMap(_.split(" ")).map(fnvB).toSet
    assert(enB.intersect(gibB).isEmpty, "fixture bug: bucket collision")
    val docsReal = (enTexts ++ gibTexts).toSeq.sortBy(_._1)
      .map { case (id, tx) => (id, tx, "src0") }
      .toDF("doc_id", "text", "source")
    val cfg = TrainingPipeline.Config(
      curation = Curation.Params(minQuality = 0.0, minTokens = 1,
        keepLangs = Seq("en", "es", "de", "fr", "und"),
        nearDupThreshold = None),
      ctxTokens = 64L, learnedGate = true)
    val r = TrainingPipeline.curateToTraining(spark, docsReal, None,
      cfg = cfg, ledger = false)
    val kept = r.packed.select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    r.free()
    // the learned_gate stage ran between curation and decontamination
    val names = r.stages.map(_.stage)
    assert(names.containsSlice(Seq("curation", "learned_gate", "decontamination")))
    val gateStage = r.stages.find(_.stage == "learned_gate").get
    assert(gateStage.rowsIn == 8 && gateStage.rowsOut == kept.size)
    // the en half survived, the gibberish half did not
    assert(kept == Set(0L, 1L, 4L, 5L),
      s"expected the english docs to survive the learned gate, got $kept")
    // rerun: the exact-integer gate keeps the same set
    val r2 = TrainingPipeline.curateToTraining(spark, docsReal, None,
      cfg = cfg, ledger = false)
    val kept2 = r2.packed.select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    r2.free()
    assert(kept2 == kept)
    // gate off: everyone curation kept flows through
    val rOff = TrainingPipeline.curateToTraining(spark, docsReal, None,
      cfg = cfg.copy(learnedGate = false), ledger = false)
    assert(rOff.packed.count() == 8)
    assert(!rOff.stages.map(_.stage).contains("learned_gate"))
    rOff.free()
  }

  // --- q179: per-language LM-score tertiles --------------------------------

  /** Scalar MLE doc scores from the q167 definition (BigInt fixed point,
    * prefix-total denominators) — independent of the engine chain. */
  private def scalarMleScores(rows: Seq[(Long, String, String)])
      : Seq[(Long, String, Long)] = {
    def toks(t: String) = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val docBi = rows.flatMap { case (id, t, _) =>
      val ts = toks(t)
      if (ts.length < 2) Nil
      else ts.sliding(2).map(p => (id, p(0), p(1))).toSeq
    }
    val cxy = docBi.groupBy(b => (b._2, b._3)).view.mapValues(_.size.toLong).toMap
    val cx = docBi.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    def pFp(w1: String, w2: String): BigInt =
      BigInt(cxy((w1, w2))) * 1000000 / cx(w1)
    val langOfId = rows.map(r => r._1 -> r._3).toMap
    docBi.groupBy(_._1).toSeq.map { case (id, bs) =>
      val ps = bs.map(b => pFp(b._2, b._3))
      (id, langOfId(id), (ps.sum / ps.size).toLong)
    }
  }

  private def pct2(vs: Seq[Double], p: Double): Double = {
    val s = vs.sorted; val pos = p * (s.length - 1); val lo = pos.floor.toInt
    if (lo + 1 >= s.length) s(s.length - 1)
    else s(lo) * (lo + 1 - pos) + s(lo + 1) * (pos - lo)
  }

  private def scalarTertiles(scored: Seq[(Long, String, Long)])
      : Seq[(String, String, Long, Long, Long, Long)] = {
    val tt = scored.size.toLong
    scored.groupBy(_._2).toSeq.flatMap { case (lang, g) =>
      val ds = g.map(_._3.toDouble)
      val (b1, b2) = (pct2(ds, 1.0 / 3.0), pct2(ds, 2.0 / 3.0))
      g.groupBy { r =>
        if (r._3.toDouble > b2) "head"
        else if (r._3.toDouble > b1) "middle" else "tail"
      }.toSeq.map { case (bucket, bg) =>
        (lang, bucket, bg.size.toLong, bg.map(_._3).min, bg.map(_._3).max,
          bg.size.toLong * 1000000L / tt)
      }
    }.sortBy(r => (r._1, r._2))
  }

  private def runQ179(dir: String): Seq[(String, String, Long, Long, Long, Long)] =
    graft.ops.ScaleOps25.q179LmTertiles(spark, dir)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[String]("bucket"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("min_score_fp"),
        r.getAs[Long]("max_score_fp"), r.getAs[Long]("share_fp"))).toSeq

  test("q179 scalar law: per-LANGUAGE tertiles by the q167 MLE score; STRICT boundary comparison (equal-score languages are all tail, never a fabricated head); single-doc languages are tail; re-derives at sf0.001") {
    val dir = tempDir("q179-hand")
    val rows = Seq(
      // lang A: four docs with DISTINCT scores -> all three buckets land.
      // 'a a a' scores 10^6 (p(a|a)=5/6... derived by the scalar model,
      // not asserted by hand); repetition level varies the score
      (1L, "a a a a a a", "aa"),
      (2L, "a a a b a a", "aa"),
      (3L, "a b a b a b", "aa"),
      (4L, "b c d e f g", "aa"),
      // lang B: three docs with IDENTICAL text -> identical scores ->
      // b1 = b2 = the score and the strict > sends ALL to tail
      (5L, "x y x y", "bb"), (6L, "x y x y", "bb"), (7L, "x y x y", "bb"),
      // lang C: one doc -> its own b1 = b2 -> tail
      (8L, "q r q r", "cc"),
      // a sub-2-token doc: no bigrams, excluded from scoring entirely
      (9L, "solo", "aa"))
    writeDocs(dir, rows)
    val scored = scalarMleScores(rows)
    assert(!scored.exists(_._1 == 9L), "single-token docs never score")
    val expect = scalarTertiles(scored)
    val got = runQ179(dir.toString)
    assert(got == expect)
    val aa = got.filter(_._1 == "aa").map(_._2).toSet
    assert(aa == Set("head", "middle", "tail"),
      s"distinct-score language must populate all three buckets: $got")
    assert(got.filter(_._1 == "bb") ==
      Seq(("bb", "tail", 3L, got.find(_._1 == "bb").get._4,
        got.find(_._1 == "bb").get._4, 3000000L / (scored.size.toLong))),
      s"equal-score language must be ALL tail: $got")
    assert(got.filter(_._1 == "cc").map(_._2) == Seq("tail"))
    // share conservation: buckets partition the scored corpus
    assert(got.map(_._3).sum == scored.size.toLong)
    // real corpus differential
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(runQ179("/root/testdata/sf0.001") ==
      scalarTertiles(scalarMleScores(real)))
  }

  // --- q180: mix by tertile -------------------------------------------------

  test("q180 scalar law: per-bucket keep = portable hash < FLOOR(rate*2^32) (floor, not round — pinned on the 0.1 constant); head keeps EVERYTHING; the kept set nests under rate tightening; re-derives at sf0.001") {
    // the floor pin: 0.1 * 2^32 = 429496729.6 — floor 429496729, round
    // would be ...730; one doc whose bucket lands exactly on 429496729
    // would split the engines if either side rounded
    assert((0.1 * 4294967296.0).toLong == 429496729L)
    def splitBucketScalar(id: Long): Long = {
      val a = 2654435761L
      val id32 = java.lang.Math.floorMod(id, 4294967296L)
      val hi = id32 >> 16; val lo = id32 % 65536L
      java.lang.Math.floorMod((hi * a % 65536L) * 65536L + lo * a, 4294967296L)
    }
    val rates = Map("head" -> 1.0, "middle" -> 0.5, "tail" -> 0.1)
    def scalarMix(rows: Seq[(Long, String, String)])
        : Seq[(String, String, Long, Long, Long)] = {
      val scored = scalarMleScores(rows)
      // per-doc buckets from the q179 scalar machinery
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
    def run(d: String) = graft.ops.ScaleOps25.q180TertileMix(spark, d)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[String]("bucket"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("kept_share_fp"))).toSeq
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val got = run("/root/testdata/sf0.001")
    assert(got == scalarMix(real))
    // the head law: rate 1.0 keeps every document, bit-for-bit
    val heads = got.filter(_._2 == "head")
    assert(heads.nonEmpty)
    heads.foreach { h => assert(h._4 == h._3 && h._5 == 1000000L,
      s"head must keep everything: $h") }
    // sampling actually bites somewhere (tail rate 0.1 over real corpora)
    assert(got.filter(_._2 == "tail").exists(t => t._4 < t._3))
    // nesting law on the scalar model: every tail-kept doc would also be
    // kept at the middle rate (rate1 <= rate2 => keep1 subset of keep2)
    val tailThr = (0.1 * 4294967296.0).toLong
    val midThr = (0.5 * 4294967296.0).toLong
    real.foreach { case (id, _, _) =>
      if (splitBucketScalar(id) < tailThr)
        assert(splitBucketScalar(id) < midThr)
    }
  }

  test("q176 memo identity: rewriting the corpus retrains — the weight memo keys on corpus identity, not the path") {
    val dir = tempDir("q176-memo")
    writeDocs(dir, Seq((0L, "alpha bravo", "en"), (2L, "zulu xray", "fr")))
    val first = runQ176(dir.toString)
    // same path, different corpus: flipped labels must flip the model
    writeDocs(dir, Seq((0L, "alpha bravo", "fr"), (2L, "zulu xray", "en")))
    val second = runQ176(dir.toString)
    assert(first != second, "memo served a stale model for a rewritten corpus")
    assert(second == runQ176(dir.toString), "warm rerun must be stable")
  }
}
