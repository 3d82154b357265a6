package graft

import org.apache.spark.sql.functions._

/** Ground-truth laws for the round-12 batch-21 operator: incremental
  * dedup through the persisted fingerprint index (q164) and the
  * [[graft.dedup.FingerprintIndex]] artifact lifecycle. */
class ScaleOps21Spec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def writeDocs(dir: java.nio.file.Path,
                        rows: Seq[(Long, String)]): Unit =
    rows.map { case (id, txt) => (id, txt, "en", "src0", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  /** Tamper with a stamp THROUGH the Hadoop FS (raw NIO writes would
    * desync the LocalFileSystem's .crc sidecar and fail on checksum,
    * not on the validation under test — the ScaleOps20Spec lesson). */
  private def writeStamp(path: String, v: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(s"$path/_rows")
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(hp, true)
    try out.write(v.getBytes("UTF-8")) finally out.close()
  }

  // --- q164 semantics -------------------------------------------------------

  test("q164: hand corpus — fractions re-derive from a scalar shingle set through the persisted index") {
    val dir = tempDir("q164-hand")
    val eight = "w1 w2 w3 w4 w5 w6 w7 w8"
    val rows = Seq(
      (0L, eight + " tail0 more0"),          // history: 3 shingles
      (1L, eight),                           // new: its 1 shingle is in history
      (3L, "f1 f2 f3 f4 f5 f6 f7 f8 f9"))    // new: 2 fresh shingles
    writeDocs(dir, rows)
    val got = graft.ops.ScaleOps21.q164IndexedIncrDedup(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_hist_dup"), r.getAs[Long]("dup_fp"),
        r.getAs[Boolean]("quarantined"))).toSeq
    // scalar re-derivation (the r10 rule): shingle STRING sets, not hashes
    def shingles(text: String): Seq[String] = {
      val ts = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      (0 to ts.length - 8).map(i => ts.slice(i, i + 8).mkString(" "))
    }
    val hist = rows.filter(_._1 % 2 == 0).flatMap(d => shingles(d._2)).toSet
    val expect = rows.filter(_._1 % 2 == 1)
      .map { case (id, text) =>
        val sh = shingles(text)
        (id, sh.length.toLong, sh.count(hist.contains).toLong)
      }
      .filter(_._2 > 0).sortBy(_._1)
      .map { case (id, n, d) =>
        (id, n, d, d * 1000000L / n, d * 1000000L / n >= 300000L) }
    assert(got == expect)
    assert(got == Seq((1L, 1L, 1L, 1000000L, true), (3L, 2L, 0L, 0L, false)))
  }

  test("q164 ≡ q157 on the real corpus — the artifact round-trip is invisible to the result") {
    val viaIndex = graft.ops.ScaleOps21.q164IndexedIncrDedup(spark, sf)
      .collect().map(_.toSeq).toSeq
    val direct = graft.ops.ScaleOps18.q157IncrementalDedup(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(viaIndex.nonEmpty && viaIndex == direct)
  }

  // --- artifact lifecycle ---------------------------------------------------

  test("q164: warm run LOADS the stamped artifact instead of rewriting it") {
    val dir = tempDir("q164-warm")
    writeDocs(dir, Seq(
      (0L, "h1 h2 h3 h4 h5 h6 h7 h8 h9"),
      (1L, "h1 h2 h3 h4 h5 h6 h7 h8")))
    val first = graft.ops.ScaleOps21.q164IndexedIncrDedup(spark, dir.toString)
      .collect().map(_.toSeq).toSeq
    val path = graft.ops.ScaleOps21.indexPathFor(spark, dir.toString)
    val stamp = new java.io.File(s"$path/_rows")
    assert(stamp.exists)
    val mtime = stamp.lastModified
    val second = graft.ops.ScaleOps21.q164IndexedIncrDedup(spark, dir.toString)
      .collect().map(_.toSeq).toSeq
    assert(second == first)
    assert(stamp.lastModified == mtime,
      "warm run must validate and LOAD the artifact, not rewrite the stamp")
  }

  test("q164: self-heal — torn stamp and same-size-different-content artifacts are rewritten in place") {
    import graft.dedup.FingerprintIndex
    val dir = tempDir("q164-heal")
    writeDocs(dir, Seq(
      (0L, "g1 g2 g3 g4 g5 g6 g7 g8 g9 g10"),
      (1L, "g1 g2 g3 g4 g5 g6 g7 g8 xx")))
    val expect = graft.ops.ScaleOps21.q164IndexedIncrDedup(spark, dir.toString)
      .collect().map(_.toSeq).toSeq
    val path = graft.ops.ScaleOps21.indexPathFor(spark, dir.toString)

    // 1. torn stamp (garbage bytes — the writer-died window): indexRows
    //    must read -1 and the query must rebuild, not crash
    writeStamp(path, "not-a-number")
    assert(FingerprintIndex.indexRows(spark, path) == -1L)
    assert(graft.ops.ScaleOps21.q164IndexedIncrDedup(spark, dir.toString)
      .collect().map(_.toSeq).toSeq == expect)
    assert(FingerprintIndex.indexRows(spark, path) > 0L, "stamp must be restored")

    // 2. same-size-different-content: a validly-stamped index whose SET
    //    differs (every hash +1) — row-count alone cannot tell them
    //    apart; the artifact is internally CONSISTENT (writeIndex
    //    restamped it), so since r17 the HOT path trusts it by design
    //    (the metadata-only trade); graft.artifact.audit=true re-derives
    //    the history signature, catches it, rewrites in place
    val real = FingerprintIndex.loadIndex(spark, path)
      .select((col("h") + lit(1L)).as("h"))
    val tmp = tempDir("q164-mut")
    real.write.parquet(s"$tmp/stage") // materialize BEFORE overwriting source
    FingerprintIndex.writeIndex(spark,
      spark.read.parquet(s"$tmp/stage"), path)
    assert(graft.ops.ScaleOps21.q164IndexedIncrDedup(spark, dir.toString)
      .collect().map(_.toSeq).toSeq != expect,
      "hot path re-scanned the history — it must trust a stamped " +
        "self-consistent artifact and cost metadata only")
    spark.conf.set("graft.artifact.audit", "true")
    try assert(graft.ops.ScaleOps21.q164IndexedIncrDedup(spark, dir.toString)
      .collect().map(_.toSeq).toSeq == expect)
    finally spark.conf.unset("graft.artifact.audit")
    // and the healed artifact passes the hot path again
    assert(graft.ops.ScaleOps21.q164IndexedIncrDedup(spark, dir.toString)
      .collect().map(_.toSeq).toSeq == expect)
  }

  // --- q165 length-bucketed batching ----------------------------------------

  test("q165: hand corpus — exact-integer buckets, batch fill, padding-waste law") {
    val dir = tempDir("q165-hand")
    // n_tokens: 4,5,6,7 → bucket 2; 8,9 → bucket 3; 1 → bucket 0.
    // BatchSize 32 ≫ docs, so each bucket is ONE batch and the waste law
    // is hand-computable: bucket 2 → max 7, real 22, padded 28, waste
    // 6/28; bucket 3 → max 9, real 17, padded 18, waste 1/18.
    def words(k: Int) = (1 to k).map(i => s"w$i").mkString(" ")
    writeDocs(dir, Seq(
      (1L, words(4)), (2L, words(5)), (3L, words(6)), (4L, words(7)),
      (5L, words(8)), (6L, words(9)), (7L, words(1)),
      (8L, "   ")))  // whitespace-only: zero tokens, excluded entirely
    val got = graft.ops.ScaleOps21.q165BucketedBatches(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      (0L, 1L, 1L, 1L, 1L, 0L),
      (2L, 1L, 4L, 22L, 28L, 6L * 1000000L / 28L),
      (3L, 1L, 2L, 17L, 18L, 1L * 1000000L / 18L)))
  }

  test("q165: real corpus — full scalar re-derivation (buckets, doc_id-ordered batch fill, waste) and the bucket law") {
    val got = graft.ops.ScaleOps21.q165BucketedBatches(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got.nonEmpty)
    val docs = graft.ops.Relational.t(spark, sf, "documents")
      .select(col("doc_id").cast("long"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val b = graft.ops.ScaleOps21.Q165BatchSize
    val perDoc = docs.map { case (id, text) =>
      (id, text.trim.toLowerCase.split("\\s+").count(_.nonEmpty).toLong)
    }.filter(_._2 >= 1)
    def bucketOf(n: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(n)
    val expected = perDoc.groupBy(d => bucketOf(d._2)).toSeq.map { case (bucket, ds) =>
      val batches = ds.sortBy(_._1).zipWithIndex
        .groupBy { case (_, i) => i / b }.values.toSeq
        .map { batch =>
          val lens = batch.map(_._1._2)
          (lens.size.toLong, lens.max, lens.sum)
        }
      val real = batches.map(_._3).sum
      val padded = batches.map(bt => bt._1 * bt._2).sum
      (bucket, batches.size.toLong, ds.size.toLong, real, padded,
        (padded - real) * 1000000L / padded)
    }.sortBy(_._1)
    assert(got == expected, s"\n got=$got\n exp=$expected")
    // bucket law: every doc's length fits [2^bucket, 2^(bucket+1))
    perDoc.foreach { case (_, n) =>
      val bk = bucketOf(n)
      assert(n >= (1L << bk) && n < (1L << (bk + 1)))
    }
  }

  // --- q166 batching-strategy padding ablation -------------------------------

  test("q166: hand corpus — interleaved long/short docs: doc-order pays 45% padding, bucketed and sorted pay zero") {
    val dir = tempDir("q166-hand")
    // 64 docs, ids 1..64: even ids 10 tokens, odd ids 1 token. Doc-order
    // batches mix them (every batch max 10); bucketed (buckets 3 vs 0)
    // and the global length sort both separate them perfectly.
    def words(k: Int) = (1 to k).map(i => s"w$i").mkString(" ")
    writeDocs(dir, (1 to 64).map(i =>
      (i.toLong, words(if (i % 2 == 0) 10 else 1))))
    val got = graft.ops.ScaleOps21.q166BatchSortAblation(spark, dir.toString)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      ("a_docid_global", 2L, 64L, 352L, 640L, 288L * 1000000L / 640L),
      ("b_bucketed_docid", 2L, 64L, 352L, 352L, 0L),
      ("c_sorted_global", 2L, 64L, 352L, 352L, 0L)))
  }

  test("q166: real corpus — all three strategies re-derive from a scalar batch fill; sorted never beats real tokens") {
    val got = graft.ops.ScaleOps21.q166BatchSortAblation(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val b = graft.ops.ScaleOps21.Q165BatchSize
    val perDoc = graft.ops.Relational.t(spark, sf, "documents")
      .select(col("doc_id").cast("long"), col("text")).collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.toLowerCase.split("\\s+").count(_.nonEmpty).toLong))
      .filter(_._2 >= 1).toSeq
    def fill(ordered: Seq[Long]): (Long, Long, Long, Long) = {
      val batches = ordered.grouped(b.toInt).toSeq
      (batches.size.toLong, ordered.size.toLong, ordered.sum,
        batches.map(bt => bt.size.toLong * bt.max).sum)
    }
    def bucketOf(n: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(n)
    val a = fill(perDoc.sortBy(_._1).map(_._2))
    val cS = fill(perDoc.sortBy(d => (-d._2, d._1)).map(_._2))
    val bParts = perDoc.groupBy(d => bucketOf(d._2)).values.toSeq
      .map(ds => fill(ds.sortBy(_._1).map(_._2)))
    val bT = (bParts.map(_._1).sum, bParts.map(_._2).sum,
      bParts.map(_._3).sum, bParts.map(_._4).sum)
    def row(name: String, t: (Long, Long, Long, Long)) =
      (name, t._1, t._2, t._3, t._4, (t._4 - t._3) * 1000000L / t._4)
    val expected = Seq(row("a_docid_global", a),
      row("b_bucketed_docid", bT), row("c_sorted_global", cS))
    assert(got == expected, s"\n got=$got\n exp=$expected")
    // the ablation's point, as a law on this corpus: the sorted fill
    // wastes no more than the naive doc-order fill
    val byName = got.map(r => r._1 -> r._5).toMap
    assert(byName("c_sorted_global") <= byName("a_docid_global"))
  }

  test("q166: forced-hierarchical routing (struct sort key through the range exchange) is row-identical to the default") {
    val default = graft.ops.ScaleOps21.q166BatchSortAblation(spark, sf)
      .collect().map(_.toSeq).toSeq
    spark.conf.set("graft.pack.maxGroupRows", "1")
    try {
      val forced = graft.ops.ScaleOps21.q166BatchSortAblation(spark, sf)
        .collect().map(_.toSeq).toSeq
      assert(forced == default)
    } finally spark.conf.unset("graft.pack.maxGroupRows")
  }

  // --- multimodal gates in curation (r10 #8) --------------------------------

  test("curateToTraining(media gates): planted bad-media docs drop FIRST, with their own ledger row") {
    import graft.pipeline.{TrainingPipeline, Curation}
    val goodText = "the quick brown fox jumps over the lazy dog and runs to the river"
    val png = graft.multimodal.Png.encodeGray(4, 4,
      Array.tabulate(16)(i => (i * 17) % 256))
    val loudWav = graft.multimodal.Wav.encode(1, 8000, 16,
      Array.tabulate(64)(i => if (i % 2 == 0) 8000 else -8000))
    val silentWav = graft.multimodal.Wav.encode(1, 8000, 16,
      Array.fill(64)(0))
    val rows = Seq(
      // (id, text, source, image, audio)
      (1L, goodText + " one", "src0", png, loudWav),             // all media good
      (2L, goodText + " two", "src0", Array[Byte](1, 2, 3), null), // corrupt image → drop
      (3L, goodText + " three", "src0", null, silentWav),        // dead air → drop
      (4L, goodText + " four", "src0", null, null),              // text-only → pass
      (5L, goodText + " five", "src0", png, null))               // image-only good → pass
    import spark.implicits._
    val docs = rows.toDF("doc_id", "text", "source", "image", "audio")
    val cfg = TrainingPipeline.Config(
      curation = Curation.Params(minQuality = 0.0, minTokens = 1,
        keepLangs = Seq("en", "es", "de", "fr", "und")),
      imageCol = Some("image"), audioCol = Some("audio"))
    val r = TrainingPipeline.curateToTraining(spark, docs, None, cfg = cfg)
    // the gate is its own FIRST stage and the chain stays count-linked
    assert(r.stages.map(_.stage) == Seq("media_gates", "pair_graph",
      "curation", "decontamination", "mixing", "split", "packing"))
    val mg = r.stages.head
    assert(mg.rowsIn == 5L && mg.rowsOut == 3L,
      s"exactly the corrupt-image and dead-air docs must drop: $mg")
    r.stages.sliding(2).foreach { case Seq(a, b) =>
      assert(a.rowsOut == b.rowsIn, s"${a.stage} -> ${b.stage}") }
    val survivors = r.packed.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 4L, 5L), s"got $survivors")
    // ledger: one row for the media stage under this run id, counts exact
    val ledger = graft.ledger.Ledger.jobStats(spark)
      .filter($"BatchJobID" === r.runId && $"SourceFile" === "pipeline:media_gates")
      .head()
    assert(ledger.getAs[Long]("RowsRead") == 5L &&
      ledger.getAs[Long]("RowsInserted") == 3L &&
      ledger.getAs[Long]("RowsFailed") == 2L)
    r.free()
  }

  test("mediaGate: NULL media passes, thresholds gate content not presence; metrics ride along") {
    import spark.implicits._
    val png = graft.multimodal.Png.encodeGray(2, 2, Array(0, 64, 128, 255))
    val quietWav = graft.multimodal.Wav.encode(1, 8000, 16,
      // 1 loud sample in 64 → silence_ratio 63/64 ≈ 0.984
      Array.tabulate(64)(i => if (i == 0) 8000 else 0))
    val docs = Seq(
      (1L, png, null.asInstanceOf[Array[Byte]]),
      (2L, null.asInstanceOf[Array[Byte]], quietWav),
      (3L, null.asInstanceOf[Array[Byte]], null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "image", "audio")
    // default maxSilenceRatio 0.95 drops doc 2; a loosened 0.99 keeps it
    val strict = graft.pipeline.Curation.mediaGate(docs, Some("image"),
      Some("audio")).select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(strict == Set(1L, 3L))
    val loose = graft.pipeline.Curation.mediaGate(docs, Some("image"),
      Some("audio"),
      graft.pipeline.Curation.MediaParams(maxSilenceRatio = 0.99))
    val looseRows = loose.collect()
    assert(looseRows.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L, 3L))
    // metric columns: decoded image format for doc 1, silence ratio for
    // doc 2, all-NULL for the text-only doc 3
    val byId = looseRows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[String]("img_format") == "png")
    assert(byId(1L).getAs[Number]("img_pixels").longValue == 4L)
    assert(math.abs(byId(2L).getAs[Double]("audio_silence_ratio") - 63.0 / 64) < 1e-9)
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("img_format")) &&
      byId(3L).isNullAt(byId(3L).fieldIndex("audio_silence_ratio")))
  }

  test("loadIndex is LOUD on a stamp/row-count mismatch (out-of-API mutation)") {
    import graft.dedup.FingerprintIndex
    val dir = tempDir("fp-loud")
    val hashes = Seq(11L, 22L, 33L).toDF("h")
    val path = s"$dir/idx"
    assert(FingerprintIndex.writeIndex(spark, hashes, path) == 3L)
    // reload is clean first
    assert(FingerprintIndex.loadIndex(spark, path).count() == 3L)
    // mutate the stamp out-of-API: claims 4 rows
    writeStamp(path, "4")
    val e = intercept[IllegalArgumentException] {
      FingerprintIndex.loadIndex(spark, path)
    }
    assert(e.getMessage.contains("stamp 4 != 3"))
  }

  test("writeIndex refuses an empty index; empty-history corpora probe the empty set without an artifact") {
    import graft.dedup.FingerprintIndex
    val e = intercept[IllegalArgumentException] {
      FingerprintIndex.writeIndex(spark,
        Seq.empty[Long].toDF("h"), tempDir("fp-empty").toString + "/idx")
    }
    assert(e.getMessage.contains("empty index"))
    // history docs all shorter than k=8 tokens → zero shingles → q164
    // degrades to the probe-empty-set branch, one row per batch doc
    val dir = tempDir("q164-nohist")
    writeDocs(dir, Seq(
      (0L, "too short"),
      (1L, "b1 b2 b3 b4 b5 b6 b7 b8 b9")))
    val got = graft.ops.ScaleOps21.q164IndexedIncrDedup(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 0L)))
  }
}
