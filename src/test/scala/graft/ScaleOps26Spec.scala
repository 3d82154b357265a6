package graft

import org.apache.spark.sql.functions._

/** Batch-26 ground truth: q181 (integer-exact tertile boundaries) and
  * q182 (sub-file shard routing) scalar laws; the q179 route's
  * differential pin — the histogram boundary arm must be BIT-equal to
  * the exact percentile arm, so routing can never move a bucket; the
  * scale-free `writeSharded(filesPerShard > 1)` layout contract; and
  * the pipeline's composed CCNet `lm_mix` stage laws (r13 verdict #1). */
class ScaleOps26Spec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def writeDocs(dir: java.nio.file.Path,
      rows: Seq[(Long, String, String)]): Unit =
    rows.map { case (id, txt, lang) =>
      (id, txt, lang, "src0", txt.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  // --- independent scalar models --------------------------------------------

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

  /** Scalar q181 from the documented definition: sort, pick the values
    * at the floor/ceil ranks of (n−1)/3 and 2(n−1)/3, interpolate at ×3
    * fixed point — pure integer arithmetic. */
  private def scalarQ181(scored: Seq[(Long, String, Long)])
      : Seq[(String, Long, Long, Long, Long, Long, Long, Long)] =
    scored.groupBy(_._2).toSeq.map { case (lang, g) =>
      val vs = g.map(_._3).sorted
      val n = vs.length.toLong
      def at(r: Long) = vs(r.toInt)
      val l1 = (n - 1) / 3; val r1 = (n - 1) % 3
      val l2 = (2 * (n - 1)) / 3; val r2 = (2 * (n - 1)) % 3
      val vl1 = at(l1); val vh1 = at(l1 + (if (r1 > 0) 1 else 0))
      val vl2 = at(l2); val vh2 = at(l2 + (if (r2 > 0) 1 else 0))
      (lang, n, vl1, vh1, vl2, vh2,
        3 * vl1 + r1 * (vh1 - vl1), 3 * vl2 + r2 * (vh2 - vl2))
    }.sortBy(_._1)

  private def runQ181(dir: String)
      : Seq[(String, Long, Long, Long, Long, Long, Long, Long)] =
    graft.ops.ScaleOps26.q181TertileBoundaries(spark, dir)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("vl1"), r.getAs[Long]("vh1"),
        r.getAs[Long]("vl2"), r.getAs[Long]("vh2"),
        r.getAs[Long]("b1_x3"), r.getAs[Long]("b2_x3"))).toSeq

  /** The q51 portable multiplicative hash, restated. */
  private def splitBucketScalar(id: Long): Long = {
    val a = 2654435761L
    val id32 = java.lang.Math.floorMod(id, 4294967296L)
    val hi = id32 >> 16; val lo = id32 % 65536L
    java.lang.Math.floorMod((hi * a % 65536L) * 65536L + lo * a, 4294967296L)
  }

  // --- q181 ------------------------------------------------------------------

  test("q181 scalar law: rank selection and x3 interpolation over a planted corpus covering every remainder/tie shape; re-derives at sf0.001") {
    val dir = tempDir("q181-hand")
    val rows = Seq(
      // lang aa: four docs with distinct scores -> n=4: r1=0 (boundary ON
      // a value, no interpolation: b1_x3 = 3*v[1]), r2=0 (b2_x3 = 3*v[2])
      (1L, "a a a a a a", "aa"),
      (2L, "a a a b a a", "aa"),
      (3L, "a b a b a b", "aa"),
      (4L, "b c d e f g", "aa"),
      // lang bb: three identical docs -> ties: vl=vh at both positions,
      // the early-return shape (b_x3 = 3*v regardless of r)
      (5L, "x y x y", "bb"), (6L, "x y x y", "bb"), (7L, "x y x y", "bb"),
      // lang cc: one doc -> n=1: every rank is 0, b1 = b2 = the value
      (8L, "q r q r", "cc"),
      // lang dd: two docs, distinct scores -> n=2: r1=1 (fraction 1/3),
      // r2=2 (fraction 2/3) — BOTH interpolating remainders exercised
      (10L, "m m m m m", "dd"),
      (11L, "m n o p", "dd"),
      // a sub-2-token doc: no bigrams, excluded from scoring entirely
      (9L, "solo", "aa"))
    writeDocs(dir, rows)
    val scored = scalarMleScores(rows)
    val expect = scalarQ181(scored)
    val got = runQ181(dir.toString)
    assert(got == expect)
    // the dd shape really interpolates: distinct values at both ranks
    val dd = got.find(_._1 == "dd").get
    assert(dd._3 != dd._4 && dd._5 != dd._6,
      s"dd must interpolate between distinct values: $dd")
    assert(dd._7 == 3 * dd._3 + 1 * (dd._4 - dd._3))
    assert(dd._8 == 3 * dd._5 + 2 * (dd._6 - dd._5))
    // the bb tie shape: all four rank values equal, b = 3*v
    val bb = got.find(_._1 == "bb").get
    assert(bb._3 == bb._4 && bb._5 == bb._6 && bb._7 == 3 * bb._3 &&
      bb._8 == 3 * bb._5)
    // real corpus re-derivation
    val real = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(runQ181(sf) == scalarQ181(scalarMleScores(real)))
  }

  test("q181/q179 consistency: the x3 integer boundaries resolve the SAME strict bucket comparisons as q179's doubles (3*score > b_x3 <=> score > b)") {
    // q179's bucket rule on doubles must equal the integer rule the x3
    // form implies — on the real corpus, re-bucket every scored doc both
    // ways and compare
    val bounds = runQ181(sf).map(r => r._1 -> (r._7, r._8)).toMap
    val assigned = graft.ops.ScaleOps25.assignTertiles(
      graft.ops.ScaleOps22.mleDocScoresOf(
        spark.read.parquet(s"$sf/documents.parquet"))
        .join(spark.read.parquet(s"$sf/documents.parquet")
          .select(col("doc_id").cast("long").as("doc_id"), col("lang")),
          Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("score_fp")),
      largestLangRows = 0L)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("score_fp"), r.getAs[String]("bucket")))
    assert(assigned.nonEmpty)
    assigned.foreach { case (id, lang, s, bucket) =>
      val (b1x3, b2x3) = bounds(lang)
      val want = if (3 * s > b2x3) "head"
                 else if (3 * s > b1x3) "middle" else "tail"
      assert(bucket == want, s"doc $id ($lang, $s): engine $bucket, x3 $want")
    }
  }

  // --- the differential boundary pin (r13 verdict #2) -------------------------

  test("q179 route differential: tertileBoundsHistogram is BIT-equal to the exact percentile arm on randomized tie-heavy corpora AND at sf0.001 (the vl==vh early return included)") {
    def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)
    def checkFrame(wl: org.apache.spark.sql.DataFrame): Unit = {
      val exact = wl.groupBy(col("lang"))
        .agg(percentile(col("sd"),
          typedLit(Seq(1.0 / 3.0, 2.0 / 3.0))).as("bs"))
        .select(col("lang"), col("bs")(0).as("b1"), col("bs")(1).as("b2"))
        .collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val hist = graft.ops.ScaleOps25.tertileBoundsHistogram(wl)
        .collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      assert(hist.keySet == exact.keySet)
      exact.foreach { case (lang, (e1, e2)) =>
        val (h1, h2) = hist(lang)
        assert(bits(h1) == bits(e1) && bits(h2) == bits(e2),
          s"$lang: exact ($e1, $e2) vs histogram ($h1, $h2) — not bit-equal")
      }
    }
    // randomized: language sizes 1..40, values drawn tie-heavy (0..9)
    // and sparse (0..10^6), across two seeds — and every third language
    // NEGATED (r16: the q191 log-ranking rides negated perplexities
    // through this pass, so the bit-equality must hold below zero too)
    for (seed <- Seq(7, 20260815)) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 14).flatMap { li =>
        val lang = s"l$li"
        val n = 1 + rnd.nextInt(40)
        val wide = li % 2 == 1
        (0 until n).map { i =>
          val mag = if (wide) rnd.nextInt(1000001).toLong else rnd.nextInt(10).toLong
          val v = if (li % 3 == 2) -mag else mag
          (li.toLong * 1000 + i, lang, v)
        }
      }
      checkFrame(rows.toDF("doc_id", "lang", "score_fp")
        .withColumn("sd", col("score_fp").cast("double")))
    }
    // and the real corpus through the real scoring chain
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    checkFrame(graft.ops.ScaleOps22.mleDocScoresOf(docs)
      .join(docs.select(col("doc_id").cast("long").as("doc_id"), col("lang")),
        Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("score_fp"))
      .withColumn("sd", col("score_fp").cast("double")))
  }

  test("q179 routing invisibility: forcing the histogram route (conf graft.tertile.maxLangRows) reproduces the default run bit-for-bit") {
    def run() = graft.ops.ScaleOps25.q179LmTertiles(spark, sf)
      .collect().map(_.toSeq).toSeq
    val default = run()
    spark.conf.set("graft.tertile.maxLangRows", "0")
    try assert(run() == default,
      "histogram-routed q179 diverged from the exact-routed run")
    finally spark.conf.unset("graft.tertile.maxLangRows")
    // and per-document: both explicit routes assign identical buckets
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val wl = graft.ops.ScaleOps22.mleDocScoresOf(docs)
      .join(docs.select(col("doc_id").cast("long").as("doc_id"), col("lang")),
        Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("score_fp"))
    def buckets(bound: Long) =
      graft.ops.ScaleOps25.assignTertiles(wl, bound)
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[String]("bucket"))).toSet
    assert(buckets(Long.MaxValue) == buckets(0L))
  }

  // --- q182 ------------------------------------------------------------------

  test("q182 scalar law: shard = bucket mod S, file = (bucket div S) mod F — re-derived per document at sf0.001; the cells partition the corpus and shard bits are file-split-invariant") {
    val real = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val s = graft.ops.ScaleOps26.Q182Shards
    val f = graft.ops.ScaleOps26.Q182FilesPerShard
    val expect = real
      .groupBy { case (id, _) =>
        val b = splitBucketScalar(id)
        (b % s, (b / s) % f)
      }
      .toSeq.sortBy(_._1)
      .map { case ((sh, fi), g) =>
        (sh, fi, g.size.toLong, g.map(_._2).sum) }
    val got = graft.ops.ScaleOps26.q182ShardFiles(spark, sf)
      .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("file_idx"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_chars"))).toSeq
    assert(got == expect)
    // partition law: cells cover every doc exactly once
    assert(got.map(_._3).sum == real.size.toLong)
    assert(got.forall(r => r._2 >= 0 && r._2 < f))
    // invariance law: rolling the cells up by shard reproduces the
    // single-file (q169-style) per-shard totals — the file split is
    // invisible at shard granularity
    val perShard = got.groupBy(_._1).view
      .mapValues(g => (g.map(_._3).sum, g.map(_._4).sum)).toMap
    val expectShard = real.groupBy { case (id, _) => splitBucketScalar(id) % s }
      .view.mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
    assert(perShard == expectShard)
  }

  // --- writeSharded filesPerShard (r13 verdict #4) ----------------------------

  private def leafDataFiles(outDir: String): Map[(Long, Long), java.io.File] = {
    val shardDirs = Option(new java.io.File(outDir).listFiles())
      .getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("shard="))
    shardDirs.flatMap { sd =>
      val sh = sd.getName.stripPrefix("shard=").toLong
      sd.listFiles().filter(f => f.isDirectory && f.getName.startsWith("file="))
        .map { fd =>
          val data = fd.listFiles().filter(x =>
            x.isFile && !x.getName.startsWith("_") && !x.getName.startsWith("."))
          assert(data.length == 1,
            s"${sd.getName}/${fd.getName}: expected exactly ONE data file, " +
              s"got ${data.map(_.getName).toSeq}")
          (sh, fd.getName.stripPrefix("file=").toLong) -> data.head
        }
    }.toMap
  }

  private def md5(f: java.io.File): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Files.readAllBytes(f.toPath))
      .map("%02x".format(_)).mkString

  test("writeSharded filesPerShard > 1 (q182's layout): one data file per leaf, docs land by the scalar (shard, file) arithmetic, byte-stable reruns per leaf, shard stats F-invariant, ledger carries n_files") {
    import graft.pipeline.TrainingPipeline
    val packed = (1L to 120L).map(i => (i, s"text $i", 10L + i % 7))
      .toDF("doc_id", "text", "n_tokens")
    val base = tempDir("wshard-files").toString
    val runId = "wshard-files-run"
    val s1 = TrainingPipeline.writeSharded(spark, packed, s"$base/a",
      shards = 4, filesPerShard = 3, runId = runId)
    val s2 = TrainingPipeline.writeSharded(spark, packed, s"$base/b",
      shards = 4, filesPerShard = 3, ledger = false)
    // F-invariance: shard-level stats identical to the single-file form
    val flat = TrainingPipeline.writeSharded(spark, packed, s"$base/flat",
      shards = 4, filesPerShard = 1, ledger = false)
    assert(s1 == flat, "raising filesPerShard must not move shard stats")
    assert(s1 == s2)
    // layout + byte stability per leaf
    val f1 = leafDataFiles(s"$base/a"); val f2 = leafDataFiles(s"$base/b")
    assert(f1.keySet == f2.keySet && f1.nonEmpty)
    f1.keySet.foreach { k => assert(md5(f1(k)) == md5(f2(k)),
      s"leaf $k: two writes of the same frame must be byte-identical") }
    // every doc landed in ITS scalar (shard, file) cell
    val landed = spark.read.parquet(s"$base/a")
      .select(col("doc_id"), col("shard"), col("file")).collect()
      .map(r => (r.getLong(0), r.getAs[Number]("shard").longValue(),
        r.getAs[Number]("file").longValue()))
    assert(landed.length == 120)
    landed.foreach { case (id, sh, fi) =>
      val b = splitBucketScalar(id)
      assert(sh == b % 4 && fi == (b / 4) % 3,
        s"doc $id landed in ($sh, $fi), scalar says (${b % 4}, ${(b / 4) % 3})")
    }
    // ledger: n_files per shard matches the on-disk leaf count
    val led = graft.ledger.Ledger.jobStats(spark)
      .filter(col("BatchJobID") === runId)
      .select(col("SourceFile"), col("ErrorMessage"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(led.size == 4)
    (0L until 4L).foreach { sh =>
      val want = f1.keySet.count(_._1 == sh)
      assert(led(s"pipeline:shard:$sh").contains(s"n_files=$want"),
        s"shard $sh: ledger ${led(s"pipeline:shard:$sh")} vs on-disk $want files")
    }
  }

  // --- PerceptronModel side-write-then-swap (r13 verdict #6) -------------------

  test("writeModel side-write-then-swap: rewrites leave no swap residue, a reader in the delete->rename window refuses loudly, and the next write self-heals (the q176/q178 artifact)") {
    import graft.ml.PerceptronModel
    val path = tempDir("model-swap").toString + "/m"
    val w1 = Array(1L, 2L, 3L)
    PerceptronModel.writeModel(spark, w1, path)
    assert(PerceptronModel.loadModel(spark, path).sameElements(w1))
    assert(!new java.io.File(s"$path/weights.swap").exists,
      "the side copy must be renamed away, not left behind")
    // retrain over a LIVE artifact: the swap path, not in-place overwrite
    val w2 = Array(9L, 8L, -7L)
    PerceptronModel.writeModel(spark, w2, path)
    assert(PerceptronModel.loadModel(spark, path).sameElements(w2))
    assert(!new java.io.File(s"$path/weights.swap").exists)
    // the mid-swap crash window, simulated exactly: delete succeeded,
    // rename never ran — stamps intact, data gone; the reader must fail
    // LOUDLY (the compactIndex terminal state, same recovery)
    val hp = new org.apache.hadoop.fs.Path(s"$path/weights")
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(hp, true))
    assert(PerceptronModel.modelRows(spark, path) == 3L,
      "the simulated crash must leave the stamp in place")
    intercept[org.apache.spark.sql.AnalysisException] {
      PerceptronModel.loadModel(spark, path)
    }
    // self-heal: the next write converges
    PerceptronModel.writeModel(spark, w2, path)
    assert(PerceptronModel.loadModel(spark, path).sameElements(w2))
  }

  // --- the pipeline lm_mix stage (r13 verdict #1) ------------------------------

  private def pipelineCfg(mix: Option[(Double, Double, Double)])
      : graft.pipeline.TrainingPipeline.Config =
    graft.pipeline.TrainingPipeline.Config(
      curation = graft.pipeline.Curation.Params(minQuality = 0.0,
        minTokens = 1, keepLangs = Seq("en", "es", "de", "fr", "und")),
      ctxTokens = 256L,
      lmTertileMix = mix)

  private def packedIds(
      r: graft.pipeline.TrainingPipeline.Result): Set[Long] = {
    val ids = r.packed.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    r.free(); ids
  }

  test("pipeline lm_mix E2E: the stage is ledgered between curation and decontamination, counts chain, (1,1,1) drops nothing, reruns are stable, and nesting holds on the pipeline path (q179/q180 through the composed entry point)") {
    import graft.pipeline.TrainingPipeline
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val base = TrainingPipeline.curateToTraining(spark, docs, None,
      cfg = pipelineCfg(None), ledger = false)
    val baseIds = packedIds(base)
    assert(!base.stages.map(_.stage).contains("lm_mix"))

    // (1,1,1): the mix stage runs but keeps everything — stage present,
    // counts chain, kept set unchanged
    val all = TrainingPipeline.curateToTraining(spark, docs, None,
      cfg = pipelineCfg(Some((1.0, 1.0, 1.0))), ledger = false)
    val st = all.stages.map(s => s.stage -> s).toMap
    assert(all.stages.map(_.stage).containsSlice(Seq("curation", "lm_mix",
      "decontamination")), s"stage order broke: ${all.stages.map(_.stage)}")
    assert(st("lm_mix").rowsIn == st("curation").rowsOut)
    assert(st("lm_mix").rowsOut == st("lm_mix").rowsIn,
      "rates (1,1,1) must keep every document")
    assert(st("decontamination").rowsIn == st("lm_mix").rowsOut)
    assert(packedIds(all) == baseIds)

    // the CCNet disposition bites, deterministically, and reruns land
    // the same set
    val mixed1 = TrainingPipeline.curateToTraining(spark, docs, None,
      cfg = pipelineCfg(Some((1.0, 0.5, 0.1))), ledger = false)
    val m1 = mixed1.stages.find(_.stage == "lm_mix").get
    assert(m1.rowsOut < m1.rowsIn, "tail rate 0.1 must drop documents")
    val ids1 = packedIds(mixed1)
    val ids1b = packedIds(TrainingPipeline.curateToTraining(spark, docs,
      None, cfg = pipelineCfg(Some((1.0, 0.5, 0.1))), ledger = false))
    assert(ids1b == ids1, "the mix stage must gate the same set on rerun")

    // nesting law ON THE PIPELINE PATH: tightening the middle rate only
    // ever removes documents
    val ids2 = packedIds(TrainingPipeline.curateToTraining(spark, docs,
      None, cfg = pipelineCfg(Some((1.0, 0.3, 0.1))), ledger = false))
    assert(ids2.subsetOf(ids1),
      "rate tightening must shrink the kept set monotonically")
  }

  test("pipeline lm_mix head law: with middle and tail rates 0, the packed corpus is EXACTLY the head tertile of the curated corpus (manual composition agrees with the stage), and unscored docs take the tail rate") {
    import graft.pipeline.{Curation, TrainingPipeline}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val headsOnly = TrainingPipeline.curateToTraining(spark, docs, None,
      cfg = pipelineCfg(Some((1.0, 0.0, 0.0))), ledger = false)
    val gotIds = packedIds(headsOnly)
    // manual composition of the same pieces the stage wires together
    val curated = Curation.curate(docs, "doc_id", "text",
      Curation.Params(minQuality = 0.0, minTokens = 1,
        keepLangs = Seq("en", "es", "de", "fr", "und")))
    val wl = graft.ops.ScaleOps22.mleDocScoresOf(curated)
      .join(curated.select(col("doc_id").cast("long").as("doc_id"),
        col("lang_pred").as("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("score_fp"))
    val heads = graft.ops.ScaleOps25.assignTertiles(wl, Long.MaxValue)
      .filter(col("bucket") === "head")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(heads.nonEmpty)
    assert(gotIds == heads,
      s"pipeline head set (${gotIds.size}) != composed head set (${heads.size})")
    // unscored (<2-token) curated docs exist at sf0.001 ONLY if some doc
    // tokenizes to < 2 tokens — whether or not any does, rate-0 tail
    // means NO unscored doc may survive
    val scoredIds = wl.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val curatedIds = curated.select(col("doc_id").cast("long"))
      .collect().map(_.getLong(0)).toSet
    assert(gotIds.subsetOf(scoredIds),
      "an unscored doc survived a tail rate of 0")
    assert(scoredIds.subsetOf(curatedIds))
  }
}
