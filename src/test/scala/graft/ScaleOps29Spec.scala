package graft

import org.apache.spark.sql.functions._

/** Batch-29 ground truth: the tertile-boundary artifact lifecycle
  * (tamper drills at the LOAD site — artifact #5 takes the
  * content-signature side of the load contract), and q188's round-trip
  * invariance law (the persisted boundaries must change NOTHING vs the
  * fused q185 pass). */
class ScaleOps29Spec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def fs(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def scribble(path: String, v: String): Unit = {
    val os = fs(path).create(new org.apache.hadoop.fs.Path(path), true)
    try os.write(v.getBytes("UTF-8")) finally os.close()
  }

  test("TertileBounds lifecycle: bit-exact double round-trip; empty table refused; every torn/tampered state refuses loudly at LOAD with one exception class") {
    import graft.ml.TertileBounds
    val p = tempDir("tb-life").toString + "/b"
    val rows = Seq(("en", 1.25, 7.75), ("fr", -3.5, -3.5))
    val n = TertileBounds.writeBounds(spark,
      rows.toDF("lang", "b1", "b2"), p, "addk:test:arith")
    assert(n == 2L && TertileBounds.boundsRows(spark, p) == 2L)
    val loaded = TertileBounds.loadBounds(spark, p)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    // doubles round-trip bit-exactly through parquet — the property the
    // stream-vs-batch bucket parity rests on
    assert(loaded == rows)
    // empty: refused at the persist site
    intercept[IllegalArgumentException] {
      TertileBounds.writeBounds(spark,
        spark.emptyDataset[(String, Double, Double)].toDF("lang", "b1", "b2"),
        p, "addk:test:arith")
    }
    // same-row-count content swap: only the xor can see it
    Seq(("en", 9.0, 9.5), ("de", 0.0, 1.0)).toDF("lang", "b1", "b2")
      .write.mode("overwrite").parquet(s"$p/bounds")
    val e = intercept[IllegalArgumentException] {
      TertileBounds.loadBounds(spark, p)
    }
    assert(e.getMessage.contains("content signature"))
    // missing _xor: same refusal class
    TertileBounds.writeBounds(spark, rows.toDF("lang", "b1", "b2"), p,
      "addk:test:arith")
    assert(fs(p).delete(new org.apache.hadoop.fs.Path(s"$p/_xor"), false))
    intercept[IllegalArgumentException] { TertileBounds.loadBounds(spark, p) }
    // garbage _rows stamp
    TertileBounds.writeBounds(spark, rows.toDF("lang", "b1", "b2"), p,
      "addk:test:arith")
    scribble(s"$p/_rows", "999")
    intercept[IllegalArgumentException] { TertileBounds.loadBounds(spark, p) }
  }

  test("TertileBounds structural contract: duplicate languages, b1 > b2, and NaN/null boundaries all refuse at load even when the stamps are consistent with the (tampered) data") {
    import graft.ml.TertileBounds
    def writeRaw(p: String, df: org.apache.spark.sql.DataFrame): Unit = {
      // forge a structurally bad artifact whose stamps MATCH its data —
      // only the structural checks can reject it
      df.write.mode("overwrite").parquet(s"$p/bounds")
      val sig = spark.read.parquet(s"$p/bounds")
        .agg(count(lit(1)), coalesce(expr("bit_xor(xxhash64(lang, b1, b2))"),
          lit(0L))).head()
      scribble(s"$p/_scorer", "addk:test:arith")
      scribble(s"$p/_xor", sig.getLong(1).toString)
      scribble(s"$p/_rows", sig.getLong(0).toString)
    }
    val p1 = tempDir("tb-dup").toString + "/b"
    writeRaw(p1, Seq(("en", 1.0, 2.0), ("en", 3.0, 4.0)).toDF("lang", "b1", "b2"))
    assert(intercept[IllegalArgumentException] {
      graft.ml.TertileBounds.loadBounds(spark, p1)
    }.getMessage.contains("duplicate language"))
    val p2 = tempDir("tb-inv").toString + "/b"
    writeRaw(p2, Seq(("en", 5.0, 2.0)).toDF("lang", "b1", "b2"))
    assert(intercept[IllegalArgumentException] {
      TertileBounds.loadBounds(spark, p2)
    }.getMessage.contains("structurally invalid"))
    val p3 = tempDir("tb-nan").toString + "/b"
    writeRaw(p3, Seq(("en", Double.NaN, 2.0)).toDF("lang", "b1", "b2"))
    intercept[IllegalArgumentException] { TertileBounds.loadBounds(spark, p3) }
  }

  test("TertileBounds unstamp-before-swap: rewriting over a live artifact leaves fresh stamps, and a hand-forged pre-r15-style torn state (new data under old stamps, same row count) is refused") {
    import graft.ml.TertileBounds
    val p = tempDir("tb-order").toString + "/b"
    TertileBounds.writeBounds(spark,
      Seq(("en", 1.0, 2.0)).toDF("lang", "b1", "b2"), p, "addk:a:arith")
    val x1 = TertileBounds.boundsXor(spark, p).get
    assert(TertileBounds.boundsScorer(spark, p).contains("addk:a:arith"))
    TertileBounds.writeBounds(spark,
      Seq(("fr", 3.0, 4.0)).toDF("lang", "b1", "b2"), p, "addk:b:arith")
    val x2 = TertileBounds.boundsXor(spark, p).get
    assert(x1 != x2 && TertileBounds.boundsRows(spark, p) == 1L)
    assert(TertileBounds.loadBounds(spark, p).collect().head.getString(0) == "fr")
    scribble(s"$p/_xor", x1.toString)
    intercept[IllegalArgumentException] { TertileBounds.loadBounds(spark, p) }
  }

  test("TertileBounds scorer identity (r15): boundaries carry the ranking semantics that produced them, and a consumer configured for a different ranking refuses loudly at load") {
    import graft.ml.TertileBounds
    val p = tempDir("tb-scorer").toString + "/b"
    TertileBounds.writeBounds(spark,
      Seq(("en", 1.0, 2.0)).toDF("lang", "b1", "b2"), p, "addk:ref=en:arith")
    // matching consumer: loads
    assert(TertileBounds.loadBoundsFor(spark, p, "addk:ref=en:arith")
      .count() == 1L)
    // a LOG-domain consumer against arithmetic-ranked boundaries: the
    // silently-wrong bucketing class, refused loudly
    val e = intercept[IllegalArgumentException] {
      TertileBounds.loadBoundsFor(spark, p, "addk:ref=en:log2")
    }
    assert(e.getMessage.contains("computed under scorer"))
    // a missing _scorer stamp is a torn write (one exception class)
    assert(fs(p).delete(new org.apache.hadoop.fs.Path(s"$p/_scorer"), false))
    intercept[IllegalArgumentException] { TertileBounds.loadBounds(spark, p) }
    // whitespace/empty tags refused at the persist site
    intercept[IllegalArgumentException] {
      TertileBounds.writeBounds(spark,
        Seq(("en", 1.0, 2.0)).toDF("lang", "b1", "b2"), p, "two words")
    }
  }

  // --- q188: the round-trip invariance law ---------------------------------

  private def writeLangDocs(dir: java.nio.file.Path,
      rows: Seq[(Long, String, String)]): Unit =
    rows.map { case (id, txt, lang) => (id, txt, lang, "src0", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def rollup(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[String]("lang"), r.getAs[String]("bucket"),
      r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
      r.getAs[Long]("kept_share_fp"))).toSeq

  test("q188 == q185 (the artifact round-trip is invisible) at sf0.001 and on a planted corpus; the artifact self-heals from a torn stamp; warm reruns validate by metadata") {
    val q185 = rollup(graft.ops.ScaleOps27.q185RefLmTertileMix(spark, sf))
    val q188 = rollup(graft.ops.ScaleOps29.q188BoundsArtifactMix(spark, sf))
    assert(q185.nonEmpty && q188 == q185)
    // the artifact landed at the signature-keyed path
    val path = graft.ops.ScaleOps29.boundsPathFor(spark, sf)
    assert(graft.ml.TertileBounds.boundsRows(spark, path) > 0)
    // torn stamp: the arm must rebuild and converge, not fail
    scribble(s"$path/_rows", "garbage-not-a-number")
    assert(rollup(graft.ops.ScaleOps29.q188BoundsArtifactMix(spark, sf)) == q185)
    assert(graft.ml.TertileBounds.boundsRows(spark, path) > 0)
    // content tamper with consistent rows: the xor pre-check rebuilds
    val bounds = spark.read.parquet(s"$path/bounds")
    bounds.withColumn("b1", col("b1") - 1000000.0)
      .write.mode("overwrite").parquet(s"$path/bounds.tmp")
    spark.read.parquet(s"$path/bounds.tmp")
      .write.mode("overwrite").parquet(s"$path/bounds")
    assert(rollup(graft.ops.ScaleOps29.q188BoundsArtifactMix(spark, sf)) == q185)
    // planted multi-language corpus exercises >1 boundary row
    val dir = tempDir("q188-mix")
    writeLangDocs(dir, Seq(
      (0L, "a b a b a c", "en"), (2L, "b c a b", "en"), (4L, "a c", "en"),
      (1L, "le chat noir", "fr"), (3L, "le chien", "fr"), (5L, "le", "fr"),
      (7L, "x", "zh")))
    val p185 = rollup(graft.ops.ScaleOps27.q185RefLmTertileMix(spark, dir.toString))
    val p188 = rollup(graft.ops.ScaleOps29.q188BoundsArtifactMix(spark, dir.toString))
    assert(p185.nonEmpty && p188 == p185)
  }

  test("scorer tags are DERIVED via TrainingPipeline.scorerTag (r16 verdict #4 — zero hand-built producer literals), and the tag FORMAT is pinned so artifacts stamped by earlier builds keep loading") {
    import graft.pipeline.TrainingPipeline.{LmSmoothing, LmScoreDomain, scorerTag}
    assert(graft.ops.ScaleOps29.Q188Scorer ==
      scorerTag(LmSmoothing.AddK, "ref=en", LmScoreDomain.Arithmetic))
    assert(graft.ops.ScaleOps31.Q192Scorer ==
      scorerTag(LmSmoothing.AddK, "ref=en", LmScoreDomain.LogPerplexity))
    // on-disk format stability — these strings are stamped in artifacts
    assert(graft.ops.ScaleOps29.Q188Scorer == "addk:ref=en:arith")
    assert(graft.ops.ScaleOps31.Q192Scorer == "addk:ref=en:log2")
  }

  test("acquire hot path is METADATA-ONLY (r16 verdict #1): an internally-consistent forged artifact is trusted without re-running the scoring chain — the documented trade — and graft.artifact.audit=true re-derives the expected signature, catches the forgery, and self-heals") {
    val q185 = rollup(graft.ops.ScaleOps27.q185RefLmTertileMix(spark, sf))
    assert(rollup(graft.ops.ScaleOps29.q188BoundsArtifactMix(spark, sf)) == q185)
    val path = graft.ops.ScaleOps29.boundsPathFor(spark, sf)
    // forge: shift every boundary far below the score domain AND restamp
    // (rows, xor) consistently with the forged content — the one state
    // the on-disk self-validation cannot distinguish from a real write
    spark.read.parquet(s"$path/bounds")
      .withColumn("b1", col("b1") - lit(1.0e9))
      .withColumn("b2", col("b2") - lit(1.0e8))
      .write.mode("overwrite").parquet(s"$path/bounds.tmp")
    spark.read.parquet(s"$path/bounds.tmp")
      .write.mode("overwrite").parquet(s"$path/bounds")
    val sig = spark.read.parquet(s"$path/bounds")
      .agg(count(lit(1)), coalesce(expr("bit_xor(xxhash64(lang, b1, b2))"),
        lit(0L))).head()
    scribble(s"$path/_rows", sig.getLong(0).toString)
    scribble(s"$path/_xor", sig.getLong(1).toString)
    // hot path trusts it: everything scores above the forged b2, so the
    // rollup must SHIFT — if it still equals q185 the hot path re-ran
    // the chain and rebuilt, i.e. it is not metadata-only
    val hot = rollup(graft.ops.ScaleOps29.q188BoundsArtifactMix(spark, sf))
    assert(hot != q185,
      "hot path rebuilt from the scoring chain — it must trust " +
        "path-keying + self-validating stamps and cost metadata only")
    // audit mode: the full expected-signature recompute catches the
    // forgery and self-heals in place
    spark.conf.set("graft.artifact.audit", "true")
    try assert(
      rollup(graft.ops.ScaleOps29.q188BoundsArtifactMix(spark, sf)) == q185)
    finally spark.conf.unset("graft.artifact.audit")
    // the healed artifact passes the hot path again
    assert(rollup(graft.ops.ScaleOps29.q188BoundsArtifactMix(spark, sf)) == q185)
  }

  test("q188 empty corner: a corpus with no scorable documents persists NO artifact and yields the empty rollup on both arms") {
    val dir = tempDir("q188-empty")
    // only single-token docs: nothing scores, no languages to bound
    writeLangDocs(dir, Seq((0L, "hello", "en"), (1L, "le", "fr")))
    assert(rollup(graft.ops.ScaleOps29.q188BoundsArtifactMix(spark, dir.toString)).isEmpty)
    assert(!new java.io.File(
      graft.ops.ScaleOps29.boundsPathFor(spark, dir.toString)).exists)
  }

  // --- q189 + writeShardedByBytes (r14 verdict #5) --------------------------

  private def splitBucketScalar(id: Long): Long = {
    val a = 2654435761L
    val id32 = java.lang.Math.floorMod(id, 4294967296L)
    val hi = id32 >> 16
    val lo = id32 % 65536L
    java.lang.Math.floorMod((hi * a % 65536L) * 65536L + lo * a, 4294967296L)
  }

  private def pow2CeilScalar(n: Long): Long = {
    var f = 1L
    while (f < n) f <<= 1
    f
  }

  /** The q189 law from the documented definition only: per (shard,
    * file_idx) over (doc_id, utf8 byte count) rows. */
  private def scalarQ189(rows: Seq[(Long, Long)], shards: Long,
      target: Long): Seq[(Long, Long, Long, Long, Long)] = {
    val byShard = rows.groupBy { case (id, _) => splitBucketScalar(id) % shards }
    val f = byShard.view.mapValues { rs =>
      val bytes = rs.map(_._2).sum
      pow2CeilScalar(if (bytes <= 0) 1L else (bytes + target - 1) / target)
    }.toMap
    rows.groupBy { case (id, _) =>
      val b = splitBucketScalar(id)
      val sh = b % shards
      (sh, (b / shards) % f(sh))
    }.toSeq.map { case ((sh, fi), rs) =>
      (sh, fi, rs.size.toLong, rs.map(_._2).sum, f(sh))
    }.sortBy(r => (r._1, r._2))
  }

  test("q189 scalar law: per-shard F = pow2ceil(ceil(bytes/target)) from measured text bytes, file = next hash bits mod F — re-derives at sf0.001 and on a skewed corpus where shards genuinely choose DIFFERENT file counts") {
    import graft.ops.ScaleOps29
    def run(dir: String) = ScaleOps29.q189ByteShardFiles(spark, dir)
      .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("file_idx"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_bytes"),
        r.getAs[Long]("n_files"))).toSeq
    val real = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).collect()
      .map(r => (r.getLong(0),
        r.getString(1).getBytes("UTF-8").length.toLong)).toSeq
    assert(run(sf) == scalarQ189(real, ScaleOps29.Q189Shards,
      ScaleOps29.Q189TargetBytes))
    // skewed plant: one enormous doc per chosen shard, tiny elsewhere —
    // the law must pick F > 1 there and F = 1 on the quiet shards
    val dir = tempDir("q189-skew")
    val plant = (1L to 64L).map { i =>
      val txt = if (i <= 4L) "x " * 6000 else "y z"
      (i, txt, "en")
    }
    writeLangDocs(dir, plant)
    val got = run(dir.toString)
    val scalar = scalarQ189(plant.map { case (id, txt, _) =>
      (id, txt.getBytes("UTF-8").length.toLong) },
      ScaleOps29.Q189Shards, ScaleOps29.Q189TargetBytes)
    assert(got == scalar)
    val fVals = got.map(r => (r._1, r._5)).distinct.map(_._2)
    assert(fVals.contains(1L) && fVals.exists(_ > 1L),
      s"the skew fixture must force BOTH F=1 and F>1 shards, got $fVals")
  }

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

  private def md5f(f: java.io.File): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Files.readAllBytes(f.toPath))
      .map("%02x".format(_)).mkString

  test("writeShardedByBytes: per-shard F from measured bytes; raising the target only MERGES leaf files (never moves a doc across shards or re-deals within one); byte-stable reruns; shard stats target-invariant; ledger n_files matches disk") {
    import graft.pipeline.TrainingPipeline
    // pow2Ceil unit pins
    assert(Seq(0L, 1L, 2L, 3L, 4L, 5L, 8L, 9L)
      .map(TrainingPipeline.pow2Ceil) == Seq(1L, 1L, 2L, 4L, 4L, 8L, 8L, 16L))
    // skewed corpus: a handful of fat docs concentrate bytes on their
    // shards so F varies per shard at the chosen target
    val packed = (1L to 160L).map { i =>
      val txt = if (i % 11 == 0L) "fat " * 800 else s"doc $i"
      (i, txt, 10L + i % 7)
    }.toDF("doc_id", "text", "n_tokens")
    val base = tempDir("wbytes").toString
    val runId = "wbytes-run"
    val target = 3000L
    val measure = Some(octet_length(col("text")).cast("long"))
    val s1 = TrainingPipeline.writeShardedByBytes(spark, packed, s"$base/a",
      target, shards = 4, runId = runId, byteMeasure = measure)
    val s2 = TrainingPipeline.writeShardedByBytes(spark, packed, s"$base/b",
      target, shards = 4, ledger = false, byteMeasure = measure)
    // target-invariance of shard-level stats: same as the fixed-F writer
    val flat = TrainingPipeline.writeSharded(spark, packed, s"$base/flat",
      shards = 4, filesPerShard = 1, ledger = false)
    assert(s1 == flat && s1 == s2,
      "byte-targeting must not move shard stats")
    // per-shard F matches the scalar law from the measured text bytes
    val docs = packed.collect().map(r =>
      (r.getLong(0), r.getString(1).getBytes("UTF-8").length.toLong)).toSeq
    val expF = docs.groupBy(d => splitBucketScalar(d._1) % 4).view
      .mapValues(rs => pow2CeilScalar(
        (rs.map(_._2).sum + target - 1) / target)).toMap
    val f1 = leafDataFiles(s"$base/a")
    (0L until 4L).foreach { sh =>
      assert(f1.keySet.count(_._1 == sh) ==
        f1.keys.filter(_._1 == sh).map(_._2).toSet.size)
      // non-empty shards: every file index 0..F-1 is populated here
      // (the fixture is dense enough) and none beyond F exists
      assert(f1.keys.filter(_._1 == sh).map(_._2).max < expF(sh),
        s"shard $sh: a leaf landed beyond its F=${expF(sh)}")
    }
    assert(expF.values.toSeq.distinct.size >= 2,
      s"fixture must force distinct per-shard F, got $expF")
    // byte-stable rerun per leaf
    val f2 = leafDataFiles(s"$base/b")
    assert(f1.keySet == f2.keySet && f1.nonEmpty)
    f1.keySet.foreach { k => assert(md5f(f1(k)) == md5f(f2(k)),
      s"leaf $k: two writes of the same frame must be byte-identical") }
    // RAISING the target: F' | F, shards untouched, file' = file mod F'
    val s4 = TrainingPipeline.writeShardedByBytes(spark, packed, s"$base/c",
      target * 4, shards = 4, ledger = false, byteMeasure = measure)
    assert(s4 == s1, "retargeting must not move shard stats")
    val expF4 = docs.groupBy(d => splitBucketScalar(d._1) % 4).view
      .mapValues(rs => pow2CeilScalar(
        (rs.map(_._2).sum + target * 4 - 1) / (target * 4))).toMap
    expF4.foreach { case (sh, fp) =>
      assert(expF(sh) % fp == 0L, s"shard $sh: F'=$fp must divide F=${expF(sh)}") }
    val fine = spark.read.parquet(s"$base/a")
      .select(col("doc_id"), col("shard"), col("file")).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Number]("shard").longValue(),
        r.getAs[Number]("file").longValue()))).toMap
    val coarse = spark.read.parquet(s"$base/c")
      .select(col("doc_id"), col("shard"), col("file")).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Number]("shard").longValue(),
        r.getAs[Number]("file").longValue()))).toMap
    assert(fine.keySet == coarse.keySet && fine.size == 160)
    fine.foreach { case (id, (sh, fi)) =>
      val (sh2, fi2) = coarse(id)
      assert(sh2 == sh, s"doc $id moved across shards on retarget")
      assert(fi2 == fi % expF4(sh),
        s"doc $id: coarse leaf $fi2 != fine $fi mod F'=${expF4(sh)} — " +
          "the merge-only contract broke")
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
    // the default (to_json) measure: runs, same shard stats, sane layout
    val sDef = TrainingPipeline.writeShardedByBytes(spark, packed,
      s"$base/d", target, shards = 4, ledger = false)
    assert(sDef == s1 && leafDataFiles(s"$base/d").nonEmpty)
  }

  test("releaseShardedByBytes (r15 verdict #6): the pipeline release stage measures bytes on the TEXT column — identical shard stats to the row-wide JSON default (measure-invariance), byte-identical leaves to the explicit-measure writer, and a missing text column refuses loudly") {
    import graft.pipeline.TrainingPipeline
    val packed = (1L to 160L).map { i =>
      val txt = if (i % 11 == 0L) "fat " * 800 else s"doc $i"
      (i, txt, 10L + i % 7)
    }.toDF("doc_id", "text", "n_tokens")
    val base = tempDir("release").toString
    val target = 3000L
    val rel = TrainingPipeline.releaseShardedByBytes(spark, packed,
      s"$base/rel", target, shards = 4, ledger = false)
    // measure-invariance: shard assignment never sees the measure, so
    // the per-shard balance stats equal the row-wide JSON default's —
    // only the leaf split may differ (the default measures MORE bytes
    // per row, so F per shard can only be >=)
    val dflt = TrainingPipeline.writeShardedByBytes(spark, packed,
      s"$base/dflt", target, shards = 4, ledger = false)
    assert(rel == dflt, "stats must be measure-invariant")
    // the release stage IS the explicit text measure: byte-identical
    // leaves to writeShardedByBytes(byteMeasure = octet_length(text))
    val exp = TrainingPipeline.writeShardedByBytes(spark, packed,
      s"$base/exp", target, shards = 4, ledger = false,
      byteMeasure = Some(octet_length(col("text"))))
    assert(rel == exp)
    val fRel = leafDataFiles(s"$base/rel"); val fExp = leafDataFiles(s"$base/exp")
    assert(fRel.keySet == fExp.keySet && fRel.nonEmpty)
    fRel.keySet.foreach { k => assert(md5f(fRel(k)) == md5f(fExp(k)),
      s"leaf $k: release layout != explicit-text-measure layout") }
    // and the text measure genuinely split LESS than the JSON default
    // on this fixture (text bytes < full-row JSON bytes): at least one
    // shard has fewer leaves
    val fDflt = leafDataFiles(s"$base/dflt")
    assert(fRel.size <= fDflt.size)
    // no text column: loud refusal pointing at the explicit escape hatch
    assert(intercept[IllegalArgumentException] {
      TrainingPipeline.releaseShardedByBytes(spark,
        packed.withColumnRenamed("text", "body"), s"$base/bad", target,
        shards = 4, ledger = false)
    }.getMessage.contains("byteMeasure"))
  }

  test("writeShardedByBytes cap: maxFilesPerShard rounds DOWN to a power of two (keeping the merge-only divisibility law) and clamps a runaway target misconfiguration") {
    import graft.pipeline.TrainingPipeline
    // 20 fat docs per shard vs a 64-byte target: uncapped F would be
    // 1024; cap 6 must act as 4 (the next power DOWN — a non-power cap
    // would break F' | F coarsening against past/future releases)
    val packed = (1L to 40L).map(i => (i, "fat " * 500, 5L))
      .toDF("doc_id", "text", "n_tokens")
    val base = tempDir("wbytes-cap").toString
    val stats = TrainingPipeline.writeShardedByBytes(spark, packed,
      s"$base/a", 64L, shards = 2, ledger = false,
      byteMeasure = Some(octet_length(col("text")).cast("long")),
      maxFilesPerShard = 6L)
    assert(stats.map(_.nDocs).sum == 40L)
    val leaves = leafDataFiles(s"$base/a")
    assert(leaves.keys.map(_._2).max == 3L,
      s"cap 6 must clamp to 4 leaves (indexes 0..3): ${leaves.keySet}")
    // docs still land by the scalar law at the CLAMPED F
    val landed = spark.read.parquet(s"$base/a")
      .select(col("doc_id"), col("shard"), col("file")).collect()
    landed.foreach { r =>
      val b = splitBucketScalar(r.getLong(0))
      assert(r.getAs[Number]("shard").longValue() == b % 2 &&
        r.getAs[Number]("file").longValue() == (b / 2) % 4)
    }
  }
}
