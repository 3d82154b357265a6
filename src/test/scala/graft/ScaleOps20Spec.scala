package graft

import org.apache.spark.sql.functions.col

/** Ground-truth laws for the round-11 batch-20 operators: the persisted
  * BPE tokenizer artifact (q161 + Bpe.writeVocab/loadVocab), packing by
  * real trained-BPE counts (q162), subsampled skip-grams (q163), and the
  * batched trainer. Every law here is a SCALAR re-derivation or a
  * hand-computed fixture — never the cross-engine hash (the r10 rule:
  * hash parity cannot catch shared-primitive semantic errors). */
class ScaleOps20Spec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def writeDocs(dir: java.nio.file.Path,
                        rows: Seq[(Long, String)]): Unit =
    rows.map { case (id, txt) => (id, txt, "en", "src0", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  /** Scalar greedy BPE reference (the q151 spec's): one merge applied
    * left-to-right, non-overlapping. */
  private def mergeOnce(syms: List[String], p1: String, p2: String): List[String] =
    syms match {
      case a :: b :: rest if a == p1 && b == p2 => (p1 + p2) :: mergeOnce(rest, p1, p2)
      case a :: rest => a :: mergeOnce(rest, p1, p2)
      case Nil => Nil
    }

  private def scalarBpeCount(tok: String,
      merges: Seq[graft.text.Bpe.Merge]): Long = {
    var syms = tok.map(_.toString).toList
    merges.foreach { case (_, p1, p2, _) => syms = mergeOnce(syms, p1, p2) }
    syms.length.toLong
  }

  /** Tamper with a stamp THROUGH the Hadoop FS (raw NIO writes would
    * desync the LocalFileSystem's .crc sidecar and fail on checksum,
    * not on the validation under test). */
  private def writeStamp(path: String, v: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(s"$path/_rows")
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(hp, true)
    try out.write(v.getBytes("UTF-8")) finally out.close()
  }

  // --- vocab artifact lifecycle (q161) -------------------------------------

  test("Bpe artifact: write → load round-trips the exact merge list") {
    val dir = tempDir("bpe-vocab")
    val merges: Seq[graft.text.Bpe.Merge] =
      Seq((1, "t", "h", 100L), (2, "th", "e", 60L), (3, "a", "n", 40L))
    graft.text.Bpe.writeVocab(spark, merges, dir.toString)
    assert(graft.text.Bpe.vocabRows(spark, dir.toString) == 3L)
    assert(graft.text.Bpe.loadVocab(spark, dir.toString) == merges)
  }

  test("Bpe artifact: torn or mutated models are refused loudly") {
    val dir = tempDir("bpe-vocab-torn")
    val merges: Seq[graft.text.Bpe.Merge] = Seq((1, "a", "b", 5L), (2, "ab", "c", 2L))
    graft.text.Bpe.writeVocab(spark, merges, dir.toString)
    // (a) stamp disagrees with the table — the torn-write signature
    writeStamp(dir.toString, "7")
    val e1 = intercept[IllegalArgumentException](
      graft.text.Bpe.loadVocab(spark, dir.toString))
    assert(e1.getMessage.contains("stamp"))
    // (b) non-contiguous rounds
    Seq((1, "a", "b", 5L), (3, "ab", "c", 2L)).toDF("round", "p1", "p2", "cnt")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
    writeStamp(dir.toString, "2")
    val e2 = intercept[IllegalArgumentException](
      graft.text.Bpe.loadVocab(spark, dir.toString))
    assert(e2.getMessage.contains("non-contiguous"))
    // (c) a symbol with a space would corrupt the separator grammar
    Seq((1, "a b", "c", 5L)).toDF("round", "p1", "p2", "cnt")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
    writeStamp(dir.toString, "1")
    val e3 = intercept[IllegalArgumentException](
      graft.text.Bpe.loadVocab(spark, dir.toString))
    assert(e3.getMessage.contains("space"))
    // (d) empty list refused at write time
    val e4 = intercept[IllegalArgumentException](
      graft.text.Bpe.writeVocab(spark, Seq.empty, tempDir("bpe-empty").toString))
    assert(e4.getMessage.contains("empty"))
  }

  test("Bpe artifact: garbage or empty stamp reads as never-stamped (-1), not an NFE (r11 advice)") {
    val dir = tempDir("bpe-vocab-garbage")
    val merges: Seq[graft.text.Bpe.Merge] = Seq((1, "a", "b", 5L))
    graft.text.Bpe.writeVocab(spark, merges, dir.toString)
    // torn window: writer died between create's truncate and the write
    writeStamp(dir.toString, "")
    assert(graft.text.Bpe.vocabRows(spark, dir.toString) == -1L)
    writeStamp(dir.toString, "not-a-number")
    assert(graft.text.Bpe.vocabRows(spark, dir.toString) == -1L)
    // loadVocab still refuses loudly on the -1 mismatch (its contract)
    val e = intercept[IllegalArgumentException](
      graft.text.Bpe.loadVocab(spark, dir.toString))
    assert(e.getMessage.contains("stamp"))
  }

  test("q161: self-heals a stale same-size artifact and a torn stamp instead of failing forever (r11 advice)") {
    // recompute the (private) artifact path exactly as q161 derives it
    val sig = graft.ops.Relational.corpusSignature(spark, sf, "documents")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest((sf + "|" + sig).getBytes("UTF-8")).map("%02x".format(_)).mkString
    val path = s"${sys.props("java.io.tmpdir")}/graft_bpe_vocab/$md5"
    val expected = graft.ops.ScaleOps17.q151BpeEncode(spark, sf).collect().toSeq
    val realMerges = graft.ops.ScaleOps17.bpeTrain(spark, sf)
    // (a) same-SIZE different-CONTENT artifact at the real path — the
    // stamp matches and the vocab is structurally valid, so since r17
    // the HOT path trusts it by design (path-keying + self-validating
    // stamps — the metadata-only trade: "train once, ship the artifact,
    // encode anywhere" across JVMs); graft.artifact.audit=true retrains,
    // compares, and rewrites in place — the pre-r12 fail-forever state
    // can still never recur
    val impostor = (1 to realMerges.size)
      .map(r => (r, s"z$r", "q", 1L): graft.text.Bpe.Merge)
    graft.text.Bpe.writeVocab(spark, impostor, path)
    assert(graft.ops.ScaleOps20.q161BpeArtifactEncode(spark, sf)
      .collect().toSeq != expected,
      "hot path retrained — it must trust a stamped structurally-valid " +
        "vocab and cost metadata only")
    spark.conf.set("graft.artifact.audit", "true")
    try assert(graft.ops.ScaleOps20.q161BpeArtifactEncode(spark, sf)
      .collect().toSeq == expected)
    finally spark.conf.unset("graft.artifact.audit")
    assert(graft.text.Bpe.loadVocab(spark, path) == realMerges,
      "q161 must have rewritten the impostor artifact in place")
    // and the healed artifact passes the hot path again
    assert(graft.ops.ScaleOps20.q161BpeArtifactEncode(spark, sf)
      .collect().toSeq == expected)
    // (b) torn/garbage stamp at the real path — vocabRows -1 routes to
    // the rewrite branch instead of exploding inside the idempotence check
    writeStamp(path, "garbage")
    assert(graft.ops.ScaleOps20.q161BpeArtifactEncode(spark, sf)
      .collect().toSeq == expected)
    assert(graft.text.Bpe.vocabRows(spark, path) == realMerges.size.toLong)
  }

  test("BPE corpus exhausted before BpeRounds: encode/packing arms fail loudly, not silently diverging from the mirror (r11 advice)") {
    val dir = tempDir("bpe-exhausted")
    // one repeated 2-char token: round 1 merges (a,b); no pairs remain —
    // training exhausts after 1 of the 8 mirrored rounds
    writeDocs(dir, Seq((1L, "ab ab ab"), (2L, "ab")))
    val e1 = intercept[IllegalArgumentException](
      graft.ops.ScaleOps17.q151BpeEncode(spark, dir.toString).collect())
    assert(e1.getMessage.contains("exhausted"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      graft.ops.ScaleOps20.q162BpePacking(spark, dir.toString).collect())
    assert(e2.getMessage.contains("exhausted"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      graft.ops.ScaleOps20.q161BpeArtifactEncode(spark, dir.toString).collect())
    assert(e3.getMessage.contains("exhausted"), e3.getMessage)
    // q150 (train-only) keeps the documented truncate-in-step behavior:
    // its mirror's UNION ALL truncates at the same round the trainer stops
    assert(graft.ops.ScaleOps17.q150BpeTrain(spark, dir.toString).count() == 1L)
  }

  test("q161: encode-after-load is row-identical to the in-session q151 encode") {
    val viaArtifact = graft.ops.ScaleOps20.q161BpeArtifactEncode(spark, sf)
    val inSession = graft.ops.ScaleOps17.q151BpeEncode(spark, sf)
    assert(viaArtifact.collect().toSeq == inSession.collect().toSeq)
  }

  // --- batched trainer -----------------------------------------------------

  test("trainBatched(batchK=1) IS the sequential trainer — identical schedule on the real corpus") {
    val words = graft.ops.ScaleOps17.bpeWords(spark, sf)
    val seqM = graft.text.Bpe.trainSequential(words, 8)
    val batM = graft.text.Bpe.trainBatched(words, 8, batchK = 1)
    assert(batM == seqM)
  }

  test("trainBatched: disjoint top pairs land in ONE driver round, schedule equals sequential") {
    val dir = tempDir("bpe-batch-disjoint")
    // pairs: (a,b)=8 over 'abab'x4 (2 per token), (c,d)=3, (e,f)=2 —
    // symbol-disjoint and separated, so one K=3 batch must reproduce the
    // sequential schedule exactly... except 'abab' also yields (b,a)=4
    // which CONFLICTS with (a,b) and must be skipped, and sequential's
    // round 2 would pick the new-symbol pair (ab,ab)=4. Use 'ab' tokens
    // (no overlap) to keep the corpus in the guaranteed-equivalent
    // regime: (a,b)=8, (c,d)=3, (e,f)=2, nothing else.
    writeDocs(dir, Seq(
      (1L, "ab ab ab ab ab ab ab ab"),
      (2L, "cd cd cd ef ef")))
    val words = graft.ops.ScaleOps17.bpeWords(spark, dir.toString)
    val seqM = graft.text.Bpe.trainSequential(words, 3)
    val batM = graft.text.Bpe.trainBatched(words, 3, batchK = 3)
    assert(seqM == Seq((1, "a", "b", 8L), (2, "c", "d", 3L), (3, "e", "f", 2L)))
    assert(batM == seqM)
  }

  test("trainBatched: conflicting pairs are skipped within a batch (documented approximation boundary)") {
    val dir = tempDir("bpe-batch-conflict")
    // 'abab'x4 → (a,b)=8, (b,a)=4; 'cd'x3 → (c,d)=3.
    writeDocs(dir, Seq((1L, "abab abab abab abab cd cd cd")))
    val words = graft.ops.ScaleOps17.bpeWords(spark, dir.toString)
    val batM = graft.text.Bpe.trainBatched(words, 2, batchK = 2)
    // batch round: accept (a,b)=8; (b,a)=4 shares b → skipped; accept (c,d)=3
    assert(batM == Seq((1, "a", "b", 8L), (2, "c", "d", 3L)))
    // sequential instead recounts after merging (a,b): 'ab ab' now carries
    // (ab,ab)=4 which outranks (c,d)=3 — THE case where batched-BPE is an
    // approximation of the sequential schedule, pinned here so the
    // contract documented on trainBatched stays executable
    val seqM = graft.text.Bpe.trainSequential(words, 2)
    assert(seqM == Seq((1, "a", "b", 8L), (2, "ab", "ab", 4L)))
  }

  test("Bpe.train: graft.bpe.batchK=1 IS the sequential schedule; the batched default cuts driver rounds (r11 verdict #5)") {
    val words = graft.ops.ScaleOps17.bpeWords(spark, sf)
    val seqM = graft.text.Bpe.trainSequential(words, 8)
    assert(graft.text.Bpe.lastDriverRounds.get() == 8,
      "sequential = one driver round per merge, by definition")
    spark.conf.set("graft.bpe.batchK", "1")
    try assert(graft.text.Bpe.train(words, 8) == seqM)
    finally spark.conf.unset("graft.bpe.batchK")
    // default (batchK=16): same corpus, strictly fewer driver rounds —
    // the saving the batched trainer exists for. (The schedule may
    // legitimately diverge on conflicts; rounds are the pinned contract.)
    val defM = graft.text.Bpe.train(words, 8)
    val defRounds = graft.text.Bpe.lastDriverRounds.get()
    assert(defM.size == 8)
    assert(defRounds < 8, s"batched path must synchronize < merges times, took $defRounds")
  }

  test("curateToTraining(packByBpe): tokenizer_train ledger stage, conf-driven batched rounds, packs re-derive from the scalar encoder") {
    import graft.pipeline.{TrainingPipeline, Curation}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val cfg = TrainingPipeline.Config(
      curation = Curation.Params(minQuality = 0.0, minTokens = 1,
        keepLangs = Seq("en", "es", "de", "fr", "und")),
      packByBpe = true, bpeMerges = 8, ctxTokens = 256L)
    spark.conf.set("graft.bpe.batchK", "4")
    val r = try TrainingPipeline.curateToTraining(spark, docs, None,
      cfg = cfg, ledger = false)
    finally spark.conf.unset("graft.bpe.batchK")
    // the train stage is its own accounting row between split and packing
    assert(r.stages.map(_.stage) == Seq("pair_graph", "curation",
      "decontamination", "mixing", "split", "tokenizer_train", "packing"))
    // the batched path was ACTUALLY taken: 8 merges at batchK=4 is 2
    // ideal driver rounds; conflicts may add a few, but sequential's 8
    // would mean the conf was ignored
    val rounds = graft.text.Bpe.lastDriverRounds.get()
    assert(rounds >= 2 && rounds < 8, s"8 merges at batchK=4 took $rounds rounds")
    // packs: numbering restarts per (split, source) group and the layout
    // re-derives from the SCALAR greedy encoder over the packed corpus
    // (same corpus ⇒ deterministic retrain reproduces the merges)
    val packed = r.packed.select(col("doc_id"), col("split"), col("source"),
        col("text"), col("n_bpe_tokens"), col("pack_id"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2),
        x.getString(3), x.getLong(4), x.getLong(5)))
    assert(packed.nonEmpty)
    val merges = graft.text.Bpe.trainSequential(
      graft.text.Bpe.vocabWords(
        r.packed.select(col("text")), "text"), 8)
    spark.conf.set("graft.bpe.batchK", "4")
    val mergesBatched = try graft.text.Bpe.train(
      graft.text.Bpe.vocabWords(r.packed.select(col("text")), "text"), 8)
    finally spark.conf.unset("graft.bpe.batchK")
    // (on this corpus the batch schedule coincides; if a future testdata
    // refresh makes them diverge, re-derive with the BATCHED merges —
    // the pipeline trained with batchK=4)
    val m = if (mergesBatched == merges) merges else mergesBatched
    packed.groupBy(t => (t._2, t._3)).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (id, _, _, text, nBpe, packId) =>
        val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val scalarN = toks.map(scalarBpeCount(_, m)).sum
        assert(scalarN == nBpe, s"doc $id: scalar BPE count $scalarN != $nBpe")
        assert(packId == cum / cfg.ctxTokens, s"doc $id pack layout")
        cum += nBpe
      }
    }
    r.free()
  }

  // --- q162 packing by real counts -----------------------------------------

  test("q162: pack layout re-derives from the scalar greedy reference over per-doc scalar BPE counts") {
    val merges = graft.ops.ScaleOps17.bpeTrain(spark, sf)
    val docs = graft.ops.Relational.t(spark, sf, "documents")
      .select(col("doc_id").cast("long"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // scalar per-doc counts with the SCALAR encoder (not the replace chain)
    val perDoc = docs.map { case (id, src, text) =>
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      (id, src, toks.map(scalarBpeCount(_, merges)).sum)
    }
    // scalar greedy concat-then-chunk per source in doc_id order
    val ctx = graft.ops.ScaleOps20.Q162Ctx
    val expected = perDoc.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      var cum = 0L
      ds.sortBy(_._1).map { case (id, _, n) =>
        val packId = cum / ctx
        cum += n
        (src, packId, id, n)
      }
    }.groupBy(t => (t._1, t._2)).toSeq.map { case ((src, pack), rows) =>
      (src, pack, rows.length.toLong, rows.map(_._4).sum,
        rows.map(_._3).min, rows.map(_._3).max)
    }.sortBy(t => (t._1, t._2))
    val got = graft.ops.ScaleOps20.q162BpePacking(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("pack_id"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("pack_tokens"),
        r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc"))).toSeq
    assert(got == expected)
    // laws: pack fill sums to the corpus BPE total; packs are contiguous
    assert(got.map(_._4).sum == perDoc.map(_._3).sum)
    got.groupBy(_._1).foreach { case (src, packs) =>
      assert(packs.map(_._2).sorted == (0L until packs.length).toSeq, src)
    }
  }

  // --- q163 subsampled skip-grams ------------------------------------------

  /** Scalar Knuth 32-bit multiplicative bucket — the q51 reference. */
  private def scalarBucket(id: Long): Long = {
    val id32 = java.lang.Math.floorMod(id, 4294967296L)
    val hi = id32 >> 16
    val lo = id32 % 65536L
    java.lang.Math.floorMod(
      java.lang.Math.floorMod(hi * 2654435761L, 65536L) * 65536L
        + lo * 2654435761L, 4294967296L)
  }

  test("q163: full scalar re-derivation — subsample, re-index, ±3 pairs, top-25") {
    val docs = graft.ops.Relational.t(spark, sf, "documents")
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val insts = docs.flatMap { case (id, text) =>
      text.trim.toLowerCase.split("\\s+").zipWithIndex
        .filter(_._1.nonEmpty)
        .map { case (tok, pos) => (id, pos.toLong, tok) }
    }
    // NOTE: scalar positions must mirror posexplode's = index in the raw
    // split array INCLUDING empty entries. split of a trimmed string only
    // produces an empty first element when text is empty — covered by the
    // nonEmpty filter keeping original zipWithIndex positions.
    val freq = insts.groupBy(_._3).map { case (t, xs) => t -> xs.length.toLong }
    val total = insts.length.toLong
    val two64 = BigInt(2).pow(64)
    val kept = insts.filter { case (id, pos, tok) =>
      val b = BigInt(scalarBucket(id * 100003L + pos))
      b * b * graft.ops.ScaleOps20.Q163TDen * freq(tok) < two64 * total
    }
    assert(kept.length < insts.length, "subsampling must drop frequent-type instances")
    assert(kept.nonEmpty)
    // rare types always survive: every instance of a type with f <= t kept
    val keptCounts = kept.groupBy(_._3).map { case (t, xs) => t -> xs.length.toLong }
    freq.filter { case (_, c) => c * graft.ops.ScaleOps20.Q163TDen <= total }
      .foreach { case (t, c) => assert(keptCounts.getOrElse(t, 0L) == c, t) }
    // re-index per doc, generate ±3 pairs over survivors
    val pairs = kept.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val seq0 = xs.sortBy(_._2).map(_._3)
      for {
        i <- seq0.indices
        j <- math.max(0, i - 3) to math.min(seq0.length - 1, i + 3)
        if j != i
      } yield (seq0(i), seq0(j))
    }
    val expected = pairs.groupBy(identity).toSeq
      .map { case ((c, x), xs) => (c, x, xs.length.toLong) }
      .sortBy { case (c, x, n) => (-n, c, x) }
      .take(25).zipWithIndex
      .map { case ((c, x, n), i) => (i + 1, c, x, n) }
    val got = graft.ops.ScaleOps20.q163SkipGramsSubsampled(spark, sf).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("center"),
        r.getAs[String]("context"), r.getAs[Long]("cnt"))).toSeq
    assert(got == expected)
  }

  test("q163: deterministic — two runs agree row-for-row") {
    val a = graft.ops.ScaleOps20.q163SkipGramsSubsampled(spark, sf).collect().toSeq
    val b = graft.ops.ScaleOps20.q163SkipGramsSubsampled(spark, sf).collect().toSeq
    assert(a == b)
  }
}
