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
      rows.toDF("lang", "b1", "b2"), p)
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
        spark.emptyDataset[(String, Double, Double)].toDF("lang", "b1", "b2"), p)
    }
    // same-row-count content swap: only the xor can see it
    Seq(("en", 9.0, 9.5), ("de", 0.0, 1.0)).toDF("lang", "b1", "b2")
      .write.mode("overwrite").parquet(s"$p/bounds")
    val e = intercept[IllegalArgumentException] {
      TertileBounds.loadBounds(spark, p)
    }
    assert(e.getMessage.contains("content signature"))
    // missing _xor: same refusal class
    TertileBounds.writeBounds(spark, rows.toDF("lang", "b1", "b2"), p)
    assert(fs(p).delete(new org.apache.hadoop.fs.Path(s"$p/_xor"), false))
    intercept[IllegalArgumentException] { TertileBounds.loadBounds(spark, p) }
    // garbage _rows stamp
    TertileBounds.writeBounds(spark, rows.toDF("lang", "b1", "b2"), p)
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
    TertileBounds.writeBounds(spark, Seq(("en", 1.0, 2.0)).toDF("lang", "b1", "b2"), p)
    val x1 = TertileBounds.boundsXor(spark, p).get
    TertileBounds.writeBounds(spark, Seq(("fr", 3.0, 4.0)).toDF("lang", "b1", "b2"), p)
    val x2 = TertileBounds.boundsXor(spark, p).get
    assert(x1 != x2 && TertileBounds.boundsRows(spark, p) == 1L)
    assert(TertileBounds.loadBounds(spark, p).collect().head.getString(0) == "fr")
    scribble(s"$p/_xor", x1.toString)
    intercept[IllegalArgumentException] { TertileBounds.loadBounds(spark, p) }
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

  test("q188 empty corner: a corpus with no scorable documents persists NO artifact and yields the empty rollup on both arms") {
    val dir = tempDir("q188-empty")
    // only single-token docs: nothing scores, no languages to bound
    writeLangDocs(dir, Seq((0L, "hello", "en"), (1L, "le", "fr")))
    assert(rollup(graft.ops.ScaleOps29.q188BoundsArtifactMix(spark, dir.toString)).isEmpty)
    assert(!new java.io.File(
      graft.ops.ScaleOps29.boundsPathFor(spark, dir.toString)).exists)
  }
}
