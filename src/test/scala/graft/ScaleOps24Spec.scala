package graft

import org.apache.spark.sql.functions._

/** Ground-truth laws for the round-13 batch-24 operators: the
  * fingerprint-index APPEND lifecycle (q174 /
  * [[graft.dedup.FingerprintIndex.appendIndex]]) and smoothed bigram-LM
  * scoring (q175). */
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
