package graft

import org.apache.spark.sql.functions._

/** Batch-31 ground truth: an INDEPENDENT scalar model of the FULL
  * log-perplexity CCNet disposition (the BigInt square-and-compare log₂
  * from the q190 spec composed with the scalar tertile/keep model from
  * the q185 spec — both re-implemented from their documented
  * definitions, no engine code), the q191-vs-q185 materiality pin (the
  * two rankings must gate DIFFERENT rollups on the real corpus — the
  * reason q191 exists), and q192's artifact round-trip + ranking-seam
  * drills. */
class ScaleOps31Spec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def writeLangDocs(dir: java.nio.file.Path,
      rows: Seq[(Long, String, String)]): Unit =
    rows.map { case (id, txt, lang) => (id, txt, lang, "src0", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def fs(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def scribble(path: String, v: String): Unit = {
    val os = fs(path).create(new org.apache.hadoop.fs.Path(path), true)
    try os.write(v.getBytes("UTF-8")) finally os.close()
  }

  // --- the independent scalar model ------------------------------------

  private def toksOf(t: String): Seq[String] =
    t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  /** −log₂(num/den) × 2²⁰ by the documented algorithm, BigInt only —
    * the q190 spec's model, restated. */
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

  /** (id, lang, score_fp = −plx_fp) for every ≥2-token doc under the
    * reference-slice add-k model. Nil when the reference has no
    * tokens. */
  private def scalarLogScores(rows: Seq[(Long, String, String)])
      : Seq[(Long, String, Long)] = {
    val ref = rows.filter(_._3 == "en")
    val refBi = ref.flatMap { case (_, t, _) =>
      val ts = toksOf(t)
      if (ts.length < 2) Nil else ts.sliding(2).map(p => (p(0), p(1))).toSeq
    }
    val cxy = refBi.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cx = refBi.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val v = ref.flatMap(r => toksOf(r._2)).distinct.size.toLong
    if (v == 0) return Nil
    val k = graft.ops.ScaleOps24.Q175KFp
    rows.flatMap { case (id, t, lang) =>
      val ts = toksOf(t)
      if (ts.length < 2) None
      else {
        val ls = ts.sliding(2).map { p =>
          val c = cxy.getOrElse((p(0), p(1)), 0L)
          lneg(BigInt(c) * 1000000 + k,
            BigInt(cx.getOrElse(p(0), 0L)) * 1000000 + BigInt(k) * v)
        }.toSeq
        Some((id, lang, -(ls.sum / ls.size)))
      }
    }
  }

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

  private val rates = Map("head" -> 1.0, "middle" -> 0.5, "tail" -> 0.1)

  /** The full scalar disposition: log scores → per-language tertiles →
    * strict buckets → portable-hash keeps → (lang, bucket) rollup. */
  private def scalarLogMix(rows: Seq[(Long, String, String)])
      : Seq[(String, String, Long, Long, Long)] = {
    val scored = scalarLogScores(rows)
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

  private def rollup(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[String]("lang"), r.getAs[String]("bucket"),
      r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
      r.getAs[Long]("kept_share_fp"))).toSeq

  private def realRows(): Seq[(Long, String, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  // --- q191 -------------------------------------------------------------

  test("q191 scalar law: the composed log₂-score → tertile → keep model re-derives the engine at sf0.001 and on a hand corpus; head = LOWEST perplexity (the negation is live); buckets partition the scored corpus") {
    def run(d: String) =
      rollup(graft.ops.ScaleOps31.q191LogPlxTertileMix(spark, d))
    val real = realRows()
    val got = run(sf)
    assert(got == scalarLogMix(real))
    // coverage + head law (head rate 1.0 keeps everything)
    assert(got.map(_._3).sum == scalarLogScores(real).size.toLong)
    val heads = got.filter(_._2 == "head")
    assert(heads.nonEmpty)
    heads.foreach { h => assert(h._4 == h._3 && h._5 == 1000000L) }
    // the negation is live: within 'en', every head doc has LOWER
    // perplexity than every tail doc (head = highest score = lowest plx)
    val enScores = scalarLogScores(real).filter(_._2 == "en")
    val ds = enScores.map(_._3.toDouble)
    val (b1, b2) = (pct2(ds, 1.0 / 3.0), pct2(ds, 2.0 / 3.0))
    val headPlx = enScores.filter(_._3.toDouble > b2).map(r => -r._3)
    val tailPlx = enScores.filter(_._3.toDouble <= b1).map(r => -r._3)
    assert(headPlx.nonEmpty && tailPlx.nonEmpty &&
      headPlx.max < tailPlx.min,
      "head bucket must hold the lowest-perplexity documents")
    // hand corpus: multi-language, single-token out-of-scope doc
    val dir = tempDir("q191-hand")
    val rows = Seq(
      (0L, "a b a b a c", "en"), (2L, "b c a b", "en"), (4L, "a c", "en"),
      (1L, "le chat noir", "fr"), (3L, "le chien", "fr"), (5L, "le", "fr"),
      (7L, "a b z", "de"))
    writeLangDocs(dir, rows)
    assert(run(dir.toString) == scalarLogMix(rows))
    // no reference tokens: no model, empty rollup
    writeLangDocs(dir, Seq((1L, "le chat", "fr")))
    assert(run(dir.toString).isEmpty)
  }

  test("q191 vs q185 materiality: the perplexity ranking gates a DIFFERENT rollup than the arithmetic ranking on the real corpus — the pinned ~16% tertile flips are live on the oracle surface") {
    val arith = rollup(graft.ops.ScaleOps27.q185RefLmTertileMix(spark, sf))
    val log = rollup(graft.ops.ScaleOps31.q191LogPlxTertileMix(spark, sf))
    assert(arith.nonEmpty && log.nonEmpty)
    // same corpus, same coverage — only the ranking differs
    assert(arith.map(_._3).sum == log.map(_._3).sum)
    // and the rankings MUST disagree somewhere (kept sets/buckets move)
    assert(arith != log,
      "log and arithmetic dispositions produced identical rollups — " +
        "the ranking switch is inert, contradicting the pinned ablation")
  }

  // --- q192: the artifact round-trip under the log ranking ---------------

  test("q192 == q191 (the artifact round-trip is invisible) at sf0.001 and on a planted corpus; self-heals from torn stamps and content tampers; the artifact path never collides with q188's") {
    val q191 = rollup(graft.ops.ScaleOps31.q191LogPlxTertileMix(spark, sf))
    val q192 = rollup(graft.ops.ScaleOps31.q192LogBoundsArtifactMix(spark, sf))
    assert(q191.nonEmpty && q192 == q191)
    val path = graft.ops.ScaleOps31.boundsPathFor(spark, sf)
    assert(graft.ml.TertileBounds.boundsRows(spark, path) > 0)
    // the log artifact is a DIFFERENT artifact than the arithmetic one
    assert(path != graft.ops.ScaleOps29.boundsPathFor(spark, sf))
    assert(graft.ml.TertileBounds.boundsScorer(spark, path)
      .contains(graft.ops.ScaleOps31.Q192Scorer))
    // torn stamp: rebuild and converge
    scribble(s"$path/_rows", "garbage-not-a-number")
    assert(rollup(graft.ops.ScaleOps31.q192LogBoundsArtifactMix(spark, sf)) == q191)
    // content tamper with consistent rows: the xor pre-check rebuilds
    val bounds = spark.read.parquet(s"$path/bounds")
    bounds.withColumn("b1", col("b1") - 1000000.0)
      .write.mode("overwrite").parquet(s"$path/bounds.tmp")
    spark.read.parquet(s"$path/bounds.tmp")
      .write.mode("overwrite").parquet(s"$path/bounds")
    assert(rollup(graft.ops.ScaleOps31.q192LogBoundsArtifactMix(spark, sf)) == q191)
    // planted corpus exercises >1 boundary row
    val dir = tempDir("q192-mix")
    val rows = Seq(
      (0L, "a b a b a c", "en"), (2L, "b c a b", "en"), (4L, "a c", "en"),
      (1L, "le chat noir", "fr"), (3L, "le chien", "fr"), (5L, "le", "fr"),
      (7L, "x", "zh"))
    writeLangDocs(dir, rows)
    val p191 = rollup(graft.ops.ScaleOps31.q191LogPlxTertileMix(spark, dir.toString))
    val p192 = rollup(graft.ops.ScaleOps31.q192LogBoundsArtifactMix(spark, dir.toString))
    assert(p191.nonEmpty && p192 == p191)
  }

  test("q192 ranking seam: the persisted log-ranked boundaries REFUSE an arithmetic consumer (and q188's arithmetic boundaries refuse a log consumer) — cross-ranking bucketing cannot pass the artifact seam in either direction") {
    import graft.ml.TertileBounds
    // materialize both artifacts for the same corpus
    graft.ops.ScaleOps31.q192LogBoundsArtifactMix(spark, sf).collect()
    graft.ops.ScaleOps29.q188BoundsArtifactMix(spark, sf).collect()
    val logPath = graft.ops.ScaleOps31.boundsPathFor(spark, sf)
    val arithPath = graft.ops.ScaleOps29.boundsPathFor(spark, sf)
    // each loads under its own identity
    assert(TertileBounds.loadBoundsFor(spark, logPath,
      graft.ops.ScaleOps31.Q192Scorer).count() > 0)
    assert(TertileBounds.loadBoundsFor(spark, arithPath,
      graft.ops.ScaleOps29.Q188Scorer).count() > 0)
    // and each refuses the OTHER ranking's consumer
    assert(intercept[IllegalArgumentException] {
      TertileBounds.loadBoundsFor(spark, logPath,
        graft.ops.ScaleOps29.Q188Scorer)
    }.getMessage.contains("computed under scorer"))
    assert(intercept[IllegalArgumentException] {
      TertileBounds.loadBoundsFor(spark, arithPath,
        graft.ops.ScaleOps31.Q192Scorer)
    }.getMessage.contains("computed under scorer"))
    // the two boundary TABLES genuinely differ (different ranking, same
    // corpus): bit-equal tables would mean the negation never reached
    // the boundary pass
    val lb = TertileBounds.loadBounds(spark, logPath)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    val ab = TertileBounds.loadBounds(spark, arithPath)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(lb != ab)
  }

  test("q191 routing invisibility below zero: forcing the histogram boundary route reproduces the default (exact-percentile) q191 bit-for-bit — the negated-score domain routes like the arithmetic one") {
    def run() = rollup(graft.ops.ScaleOps31.q191LogPlxTertileMix(spark, sf))
    val default = run()
    assert(default.nonEmpty)
    spark.conf.set("graft.tertile.maxLangRows", "0")
    try assert(run() == default,
      "histogram-routed q191 diverged from the exact-routed run")
    finally spark.conf.unset("graft.tertile.maxLangRows")
  }

  test("q192 empty corner: a corpus with no scorable documents persists NO artifact and yields the empty rollup") {
    val dir = tempDir("q192-empty")
    writeLangDocs(dir, Seq((0L, "hello", "en"), (1L, "le", "fr")))
    assert(rollup(graft.ops.ScaleOps31
      .q192LogBoundsArtifactMix(spark, dir.toString)).isEmpty)
    assert(!new java.io.File(
      graft.ops.ScaleOps31.boundsPathFor(spark, dir.toString)).exists)
  }
}
