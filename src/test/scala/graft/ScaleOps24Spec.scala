package graft

import org.apache.spark.sql.functions._

/** Ground-truth laws for the round-13 batch-24 operators: the
  * fingerprint-index APPEND/COMPACT lifecycle (q174 /
  * [[graft.dedup.FingerprintIndex.appendIndex]] /
  * [[graft.dedup.FingerprintIndex.compactIndex]]), smoothed bigram-LM
  * scoring (q175), and the pipeline's sharded writer stage
  * ([[graft.pipeline.TrainingPipeline.writeSharded]]). */
class ScaleOps24Spec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def writeDocs(dir: java.nio.file.Path,
                        rows: Seq[(Long, String)]): Unit =
    rows.map { case (id, txt) => (id, txt, "en", "src0", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  // --- q174 semantics -------------------------------------------------------

  test("q174: hand corpus — the APPENDED epoch-2 hash is live in the probe (scalar re-derivation; a dropped append reads 0 dups here)") {
    val dir = tempDir("q174-hand")
    val rows = Seq(
      (0L, "a b c d e f g h i"),        // epoch-1: shingles [a..h], [b..i]
      (1L, "c d e f g h i j"),          // epoch-2: ONE novel shingle [c..j]
      (2L, "c d e f g h i j"),          // probe: dup ONLY via the appended epoch-2
      (5L, "z1 z2 z3 z4 z5 z6 z7 z8"))  // probe: fresh shingle, 0 dups
    writeDocs(dir, rows)
    val got = graft.ops.ScaleOps24.q174AppendedIndexDedup(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_hist_dup"), r.getAs[Long]("dup_fp"),
        r.getAs[Boolean]("quarantined"))).toSeq
    // scalar re-derivation over shingle STRING sets (the r10 rule)
    def shingles(text: String): Seq[String] = {
      val ts = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      (0 to ts.length - 8).map(i => ts.slice(i, i + 8).mkString(" "))
    }
    val hist = rows.filter(_._1 % 3 != 2).flatMap(d => shingles(d._2)).toSet
    val expect = rows.filter(_._1 % 3 == 2)
      .map { case (id, text) =>
        val sh = shingles(text)
        (id, sh.length.toLong, sh.count(hist.contains).toLong)
      }
      .filter(_._2 > 0).sortBy(_._1)
      .map { case (id, n, d) =>
        (id, n, d, d * 1000000L / n, d * 1000000L / n >= 300000L) }
    assert(got == expect)
    // doc 2's sole shingle exists NOWHERE in epoch-1 — a lost append
    // would read (2,1,0,0,false) and this pin goes red
    assert(got == Seq((2L, 1L, 1L, 1000000L, true), (5L, 1L, 0L, 0L, false)))
  }

  test("q174 ≡ rebuild-from-scratch probe on the real corpus — the append lifecycle is invisible to the result") {
    import graft.dedup.FingerprintIndex
    val viaAppend = graft.ops.ScaleOps24.q174AppendedIndexDedup(spark, sf)
      .collect().map(_.toSeq).toSeq
    val docs = graft.ops.Relational.fanOut(
      spark.read.parquet(s"$sf/documents.parquet"))
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val direct = FingerprintIndex.probe(
        docs.filter(col("doc_id") % 3 === 2), "doc_id", "text",
        FingerprintIndex.buildIndex(
          docs.filter(col("doc_id") % 3 =!= 2), "doc_id", "text"))
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    assert(viaAppend.nonEmpty && viaAppend == direct)
  }

  // --- appendIndex laws -----------------------------------------------------

  test("appendIndex: append≡rebuild — identical (rows, xor) stamps and identical on-disk hash set") {
    import graft.dedup.FingerprintIndex
    val a = (0L until 40L).map(i => (i, s"a$i b$i c$i d$i e$i f$i g$i h$i i$i"))
      .toDF("doc_id", "text")
    val b = (100L until 130L).map(i => (i, s"a$i b$i c$i d$i e$i f$i g$i h$i i$i"))
      .toDF("doc_id", "text")
    // overlap: b also repeats a's first 10 docs verbatim — the delta must
    // dedup against the base, not blind-append
    val bFull = b.unionByName(
      (0L until 10L).map(i => (1000L + i, s"a$i b$i c$i d$i e$i f$i g$i h$i i$i"))
        .toDF("doc_id", "text"))
    val appended = tempDir("apnd-a").toString + "/idx"
    FingerprintIndex.writeIndex(spark,
      FingerprintIndex.buildIndex(a, "doc_id", "text"), appended)
    val rowsAfter = FingerprintIndex.appendIndex(spark,
      FingerprintIndex.shingleHashes(bFull, "doc_id", "text").select("h"),
      appended)
    val rebuilt = tempDir("apnd-r").toString + "/idx"
    FingerprintIndex.writeIndex(spark,
      FingerprintIndex.buildIndex(a.unionByName(bFull), "doc_id", "text"),
      rebuilt)
    assert(rowsAfter == FingerprintIndex.indexRows(spark, rebuilt))
    assert(FingerprintIndex.indexRows(spark, appended) ==
      FingerprintIndex.indexRows(spark, rebuilt))
    assert(FingerprintIndex.indexXor(spark, appended) ==
      FingerprintIndex.indexXor(spark, rebuilt))
    val sa = FingerprintIndex.loadIndex(spark, appended)
      .collect().map(_.getLong(0)).toSet
    val sr = FingerprintIndex.loadIndex(spark, rebuilt)
      .collect().map(_.getLong(0)).toSet
    assert(sa == sr && sa.nonEmpty)
  }

  test("appendIndex: an all-duplicate batch is a stamped no-op") {
    import graft.dedup.FingerprintIndex
    val a = (0L until 20L).map(i => (i, s"p$i q$i r$i s$i t$i u$i v$i w$i x$i"))
      .toDF("doc_id", "text")
    val path = tempDir("apnd-noop").toString + "/idx"
    val n0 = FingerprintIndex.writeIndex(spark,
      FingerprintIndex.buildIndex(a, "doc_id", "text"), path)
    val x0 = FingerprintIndex.indexXor(spark, path)
    val stamp = new java.io.File(s"$path/_rows")
    val mtime = stamp.lastModified
    val n1 = FingerprintIndex.appendIndex(spark,
      FingerprintIndex.shingleHashes(a, "doc_id", "text").select("h"), path)
    assert(n1 == n0)
    assert(FingerprintIndex.indexRows(spark, path) == n0)
    assert(FingerprintIndex.indexXor(spark, path) == x0)
    assert(stamp.lastModified == mtime,
      "a no-novel-hashes append must not rewrite the stamp")
    // and the artifact still validates end-to-end
    assert(FingerprintIndex.loadIndex(spark, path).count() == n0)
  }

  test("appendIndex: a torn base (stamp != rows) refuses loudly instead of stacking") {
    import graft.dedup.FingerprintIndex
    val a = (0L until 12L).map(i => (i, s"k$i l$i m$i n$i o$i p$i q$i r$i s$i"))
      .toDF("doc_id", "text")
    val path = tempDir("apnd-torn").toString + "/idx"
    FingerprintIndex.writeIndex(spark,
      FingerprintIndex.buildIndex(a, "doc_id", "text"), path)
    // tear the stamp through the Hadoop FS (raw NIO would desync .crc)
    val hp = new org.apache.hadoop.fs.Path(s"$path/_rows")
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(hp, true)
    try out.write("999999".getBytes("UTF-8")) finally out.close()
    val e = intercept[IllegalArgumentException] {
      FingerprintIndex.appendIndex(spark,
        FingerprintIndex.shingleHashes(a, "doc_id", "text").select("h"), path)
    }
    assert(e.getMessage.contains("torn write or out-of-API mutation"))
  }

  test("q174: torn APPEND self-heals — extra unstamped rows (writer died before restamp) trigger a rebuild, not garbage") {
    import graft.dedup.FingerprintIndex
    val dir = tempDir("q174-heal")
    writeDocs(dir, Seq(
      (0L, "m1 m2 m3 m4 m5 m6 m7 m8 m9"),
      (1L, "n1 n2 n3 n4 n5 n6 n7 n8 n9"),
      (2L, "m1 m2 m3 m4 m5 m6 m7 m8")))
    val expect = graft.ops.ScaleOps24.q174AppendedIndexDedup(spark, dir.toString)
      .collect().map(_.toSeq).toSeq
    val path = graft.ops.ScaleOps24.indexPathFor(spark, dir.toString)
    // simulate the mid-append death: land extra data files WITHOUT
    // restamping — exactly what appendIndex leaves if it dies between
    // the parquet append and the stamp writes
    Seq(123456789L, 987654321L).toDF("h")
      .write.mode("append").parquet(s"$path/hashes")
    // the torn artifact refuses a direct load…
    val e = intercept[IllegalArgumentException] {
      FingerprintIndex.loadIndex(spark, path)
    }
    assert(e.getMessage.contains("torn write or out-of-API mutation"))
    // …and the query self-heals: the stamps still match the memoized
    // union signature (the metadata check alone CANNOT see this tear —
    // the very gap this spec exists to pin), so the heal must come from
    // catching the load's stamp-vs-on-disk-count refusal, then
    // rebuild+append; the result is unchanged
    assert(graft.ops.ScaleOps24.q174AppendedIndexDedup(spark, dir.toString)
      .collect().map(_.toSeq).toSeq == expect)
    assert(FingerprintIndex.loadIndex(spark, path).count() ==
      FingerprintIndex.indexRows(spark, path))
  }

  // --- compactIndex laws ----------------------------------------------------

  test("compactIndex: shrinks the append loop's part-file count, stamps and probe results unchanged, stray side dir tolerated") {
    import graft.dedup.FingerprintIndex
    val path = tempDir("cmpct").toString + "/idx"
    def docsAt(lo: Long): org.apache.spark.sql.DataFrame =
      (lo until lo + 15L).map(i => (i, s"c$i d$i e$i f$i g$i h$i i$i j$i k$i"))
        .toDF("doc_id", "text")
    FingerprintIndex.writeIndex(spark,
      FingerprintIndex.buildIndex(docsAt(0L), "doc_id", "text"), path)
    (1 to 4).foreach { b =>
      FingerprintIndex.appendIndex(spark,
        FingerprintIndex.shingleHashes(docsAt(b * 100L), "doc_id", "text")
          .select("h"), path)
    }
    val filesBefore = FingerprintIndex.indexDataFiles(spark, path)
    assert(filesBefore > 4, s"5 write/append batches should leave >4 part files, got $filesBefore")
    val n0 = FingerprintIndex.indexRows(spark, path)
    val x0 = FingerprintIndex.indexXor(spark, path)
    val stamp = new java.io.File(s"$path/_rows")
    val mtime = stamp.lastModified
    val probe = docsAt(0L).unionByName(docsAt(900L))
    val before = FingerprintIndex.probe(probe, "doc_id", "text",
        FingerprintIndex.loadIndex(spark, path))
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    // stray side dir from a writer that died mid-compaction: overwritten,
    // never read
    Seq(1L).toDF("h").write.parquet(s"$path/hashes.compact")
    val n1 = FingerprintIndex.compactIndex(spark, path, targetFiles = 2)
    assert(n1 == n0)
    assert(FingerprintIndex.indexDataFiles(spark, path) <= 2)
    assert(FingerprintIndex.indexRows(spark, path) == n0)
    assert(FingerprintIndex.indexXor(spark, path) == x0)
    assert(stamp.lastModified == mtime,
      "compaction must be invisible to the stamps — it only rewrites data files")
    assert(!new java.io.File(s"$path/hashes.compact").exists,
      "the side dir must be swapped into place, not left behind")
    val after = FingerprintIndex.probe(probe, "doc_id", "text",
        FingerprintIndex.loadIndex(spark, path))
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    assert(after == before && after.nonEmpty)
    // and the lifecycle continues: append onto the compacted artifact
    val n2 = FingerprintIndex.appendIndex(spark,
      FingerprintIndex.shingleHashes(docsAt(777L), "doc_id", "text")
        .select("h"), path)
    assert(n2 > n1)
    assert(FingerprintIndex.loadIndex(spark, path).count() == n2)
  }

  test("compactIndex: the mid-swap crash window (data dir gone) is the torn-write terminal state — loadIndex refuses, q174 self-heals") {
    import graft.dedup.FingerprintIndex
    val dir = tempDir("cmpct-torn")
    writeDocs(dir, Seq(
      (0L, "t1 t2 t3 t4 t5 t6 t7 t8 t9"),
      (1L, "u1 u2 u3 u4 u5 u6 u7 u8"),
      (2L, "t1 t2 t3 t4 t5 t6 t7 t8")))
    val expect = graft.ops.ScaleOps24.q174AppendedIndexDedup(spark, dir.toString)
      .collect().map(_.toSeq).toSeq
    val path = graft.ops.ScaleOps24.indexPathFor(spark, dir.toString)
    // simulate dying between compactIndex's delete and rename
    val hp = new org.apache.hadoop.fs.Path(s"$path/hashes")
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(hp, true))
    intercept[Exception] { FingerprintIndex.loadIndex(spark, path) }
    assert(graft.ops.ScaleOps24.q174AppendedIndexDedup(spark, dir.toString)
      .collect().map(_.toSeq).toSeq == expect)
    assert(FingerprintIndex.loadIndex(spark, path).count() ==
      FingerprintIndex.indexRows(spark, path))
  }

  // --- q175 semantics -------------------------------------------------------

  /** Scalar add-k model from planted rows: (trainBi, ctx prefix totals,
    * vocab size) — BigInt throughout, independent of the engine. */
  private def scalarAddK(rows: Seq[(Long, String)])
      : (Map[(String, String), Long], Map[String, Long], Long) = {
    def toks(t: String) = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val trainBi = rows.filter(_._1 % 2 == 0).flatMap { case (_, t) =>
      val ts = toks(t); if (ts.length < 2) Nil else ts.sliding(2).map(p => (p(0), p(1))).toSeq
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ctx = trainBi.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val vocab = rows.filter(_._1 % 2 == 0).flatMap(r => toks(r._2)).distinct.size.toLong
    (trainBi, ctx, vocab)
  }

  test("q175: hand corpus — add-k scalar re-derivation; OOV pairs and unseen contexts score ABOVE the MLE zero floor") {
    val dir = tempDir("q175-hand")
    val rows = Seq(
      (0L, "a b a b c"),   // train: (a,b)x2 (b,a) (b,c)
      (2L, "c a b"),       // train: (c,a) (a,b) — c is doc-FINAL in doc 0
      (1L, "a b c x"),     // held: seen pair, seen pair, OOV pair w/ seen ctx
      (3L, "x y"),         // held: entirely unseen context
      (5L, "q"))           // held: single token — out of scope
    writeDocs(dir, rows)
    val (trainBi, ctx, vv) = scalarAddK(rows)
    // the doc-final-token trap, re-asserted (q167's r12 spec-pinned
    // class): ctx is the PREFIX total from the bigram table — c occurs
    // twice in train but has ONE successor, so ctx(c)=1; a raw unigram
    // count (2) is the wrong denominator and would shift (c,x)'s score
    assert(ctx("c") == 1L)
    val cUnigram = Seq("a b a b c", "c a b").flatMap(
      _.split("\\s+")).count(_ == "c").toLong
    assert(cUnigram == 2L && ctx("c") != cUnigram)
    val K = graft.ops.ScaleOps24.Q175KFp
    def pFp(w1: String, w2: String): Long = {
      val cxy = BigInt(trainBi.getOrElse((w1, w2), 0L))
      val cx = BigInt(ctx.getOrElse(w1, 0L))
      ((cxy * 1000000 + K) * 1000000 / (cx * 1000000 + K * vv)).toLong
    }
    def score(text: String): (Long, Long, Long) = {
      val ts = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val bs = ts.sliding(2).map(p => (p(0), p(1))).toSeq
      val ps = bs.map { case (w1, w2) => pFp(w1, w2) }
      (bs.size.toLong,
        bs.count { case (w1, w2) => !trainBi.contains((w1, w2)) }.toLong,
        ps.sum / bs.size)
    }
    val expect = rows.filter(r => r._1 % 2 == 1 &&
        r._2.trim.split("\\s+").count(_.nonEmpty) >= 2)
      .map { case (id, t) => val (n, o, s) = score(t); (id, n, o, s) }
      .sortBy(r => (r._4, r._1))
    val got = graft.ops.ScaleOps24.q175SmoothedLmScore(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("n_oov"), r.getAs[Long]("score_fp"))).toSeq
    assert(got == expect)
    // the anti-MLE-floor pins: every held doc carries an OOV pair here,
    // and every score is strictly positive — under MLE, (c,x) and (x,y)
    // would be hard zeros and doc 3 would be indistinguishable from
    // empty. Exact fixed-point values, hand-derived:
    //   (x,y): cxy=0, cx=0  → 10^10 div (K·3)     = 333333 (uniform prior 10^6/3)
    //   (c,x): cxy=0, cx=1  → 10^10 div 1030000   = 9708
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(3L) == ((3L, 1L, 1L, 333333L)))
    assert(byId(1L)._3 == 1L && byId(1L)._4 > 0L)
    assert(got.forall(_._4 > 0L))
    // single-token doc 5 is out of scope
    assert(!byId.contains(5L))
  }

  test("q175: empty training half (no even doc_id) yields an EMPTY result — no model, no scores, no divide-by-zero") {
    val dir = tempDir("q175-empty")
    writeDocs(dir, Seq((1L, "a b c"), (3L, "d e f")))
    assert(graft.ops.ScaleOps24.q175SmoothedLmScore(spark, dir.toString)
      .collect().isEmpty)
  }

  // --- writeSharded (the pipeline writer stage) -----------------------------

  /** Scalar restatement of [[graft.ops.Relational3.splitBucket]] (the
    * ScaleOps23Spec kernel). */
  private def splitBucketScalar(id: Long): Long = {
    val a = 2654435761L
    val id32 = java.lang.Math.floorMod(id, 4294967296L)
    val hi = id32 >> 16
    val lo = id32 % 65536L
    java.lang.Math.floorMod((hi * a % 65536L) * 65536L + lo * a, 4294967296L)
  }

  private def shardDataFiles(outDir: String): Map[Long, java.io.File] = {
    val dirs = Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    dirs.map { d =>
      val data = d.listFiles().filter(f =>
        f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      assert(data.length == 1,
        s"${d.getName}: expected exactly ONE data file per shard, got ${data.map(_.getName).toSeq}")
      d.getName.stripPrefix("shard=").toLong -> data.head
    }.toMap
  }

  private def md5(f: java.io.File): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Files.readAllBytes(f.toPath))
      .map("%02x".format(_)).mkString

  test("writeSharded E2E: pipeline → 8 shards, one data file each, scalar-re-derived balance stats, one ledger row per shard incl. the skew readout") {
    import graft.pipeline.{TrainingPipeline, Curation}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val r = TrainingPipeline.curateToTraining(spark, docs, None,
      cfg = TrainingPipeline.Config(
        curation = Curation.Params(minQuality = 0.0, minTokens = 1,
          keepLangs = Seq("en", "es", "de", "fr", "und")),
        ctxTokens = 256L),
      ledger = false)
    val outDir = tempDir("wshard-e2e").toString + "/shards"
    val runId = "wshard-e2e-run"
    val stats = TrainingPipeline.writeSharded(spark, r.packed, outDir,
      shards = 8, runId = runId)
    // scalar re-derivation of every stat from the packed frame itself
    val rows = r.packed.select(col("doc_id"), col("n_tokens"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(rows.nonEmpty)
    val byShard = rows.groupBy(t => java.lang.Math.floorMod(splitBucketScalar(t._1), 8L))
    val tt = rows.map(_._2).sum
    val expect = (0L until 8L).map { sh =>
      val g = byShard.getOrElse(sh, Seq.empty)
      val nt = g.map(_._2).sum
      TrainingPipeline.ShardStat(sh, g.size.toLong, nt,
        (BigInt(nt) * 1000000 / tt).toLong,
        (BigInt(nt) * 8 * 1000000 / tt - 1000000).toLong)
    }
    assert(stats == expect)
    assert(stats.map(_.nDocs).sum == rows.size.toLong)
    // layout: every landed shard dir holds exactly one data file, and
    // every doc landed in ITS portable-hash shard
    val files = shardDataFiles(outDir)
    assert(files.keySet == byShard.keySet)
    val landed = spark.read.parquet(outDir)
      .select(col("doc_id"), col("shard")).collect()
      .map(x => x.getLong(0) -> x.getAs[Number]("shard").longValue()).toSeq
    assert(landed.map(_._1).sorted == rows.map(_._1).sorted)
    landed.foreach { case (id, sh) =>
      assert(sh == java.lang.Math.floorMod(splitBucketScalar(id), 8L)) }
    // ledger: ONE row per shard id under the run, skew readout included
    val led = graft.ledger.Ledger.jobStats(spark)
      .filter(col("BatchJobID") === runId)
      .select(col("SourceFile"), col("RowsInserted"), col("ErrorMessage"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getString(2)))
    assert(led.length == 8)
    assert(led.map(_._1).toSet == (0L until 8L).map(s => s"pipeline:shard:$s").toSet)
    stats.foreach { st =>
      val row = led.find(_._1 == s"pipeline:shard:${st.shard}").get
      assert(row._2 == st.nDocs)
      assert(row._3.contains(s"skew_ppm=${st.skewPpm}"))
      assert(row._3.contains(s"n_tokens=${st.nTokens}"))
    }
    r.free()
  }

  test("writeSharded: re-running is BYTE-stable per shard, and an empty shard still gets its stat row (skew -1000000)") {
    import graft.pipeline.TrainingPipeline
    // ids picked so shard 4-of-4 coverage is INCOMPLETE: the multiplier
    // is ≡1 mod 4, so bucket%4 == id%4 — no id ≡0 leaves shard 0 empty
    val ids = Seq(1L, 2L, 3L, 5L, 7L, 13L)
    val packed = ids.map(i => (i, s"text $i", 10L + i))
      .toDF("doc_id", "text", "n_tokens")
    val presentShards = ids.map(i =>
      java.lang.Math.floorMod(splitBucketScalar(i), 4L)).toSet
    assume(presentShards.size < 4,
      "fixture must leave at least one empty shard — pick different ids")
    val base = tempDir("wshard-stable").toString
    val s1 = TrainingPipeline.writeSharded(spark, packed, s"$base/a",
      shards = 4, ledger = false)
    val s2 = TrainingPipeline.writeSharded(spark, packed, s"$base/b",
      shards = 4, ledger = false)
    assert(s1 == s2)
    val f1 = shardDataFiles(s"$base/a"); val f2 = shardDataFiles(s"$base/b")
    assert(f1.keySet == presentShards && f2.keySet == presentShards)
    presentShards.foreach { sh => assert(md5(f1(sh)) == md5(f2(sh)),
      s"shard $sh: two writes of the same frame must be byte-identical") }
    // overwrite-in-place is byte-stable too (the release-rerun contract)
    val firstBytes = presentShards.map(sh => sh -> md5(f1(sh))).toMap
    TrainingPipeline.writeSharded(spark, packed, s"$base/a",
      shards = 4, ledger = false)
    val f1b = shardDataFiles(s"$base/a")
    presentShards.foreach { sh => assert(md5(f1b(sh)) == firstBytes(sh)) }
    // the empty shards are REPORTED, not omitted
    val empty = s1.filter(s => !presentShards.contains(s.shard))
    assert(empty.nonEmpty)
    empty.foreach { s =>
      assert(s.nDocs == 0L && s.nTokens == 0L && s.shareFp == 0L &&
        s.skewPpm == -1000000L)
    }
  }

  test("q174: warm run LOADS the appended artifact instead of rebuilding it") {
    val dir = tempDir("q174-warm")
    writeDocs(dir, Seq(
      (0L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"),
      (1L, "v1 v2 v3 v4 v5 v6 v7 v8"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8")))
    val first = graft.ops.ScaleOps24.q174AppendedIndexDedup(spark, dir.toString)
      .collect().map(_.toSeq).toSeq
    val path = graft.ops.ScaleOps24.indexPathFor(spark, dir.toString)
    val stamp = new java.io.File(s"$path/_rows")
    assert(stamp.exists)
    val mtime = stamp.lastModified
    val second = graft.ops.ScaleOps24.q174AppendedIndexDedup(spark, dir.toString)
      .collect().map(_.toSeq).toSeq
    assert(second == first)
    assert(stamp.lastModified == mtime,
      "warm run must validate and LOAD the artifact, not rewrite the stamp")
  }
}
