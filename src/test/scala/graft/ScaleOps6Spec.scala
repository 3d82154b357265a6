package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.functions.NormalizeKernels
import org.apache.spark.unsafe.types.UTF8String

/** Ground-truth laws for the round-9 batch-2 operators: BM25 retrieval
  * scoring (q91), Unicode normalization (q92), SCD Type-2 history (q93),
  * z-order layout profiling (q94), and character-diversity scoring (q95). */
class ScaleOps6Spec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def writeDocs(dir: java.nio.file.Path, docs: Seq[(Long, String)]): Unit =
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  // --- q91 BM25 ------------------------------------------------------------

  test("q91 BM25: exact log-free score law on a hand corpus") {
    val dir = tempDir("bm25")
    // N=3, dl = 3/2/1, Σdl = 6
    writeDocs(dir, Seq((1L, "spark join spark"), (2L, "join scan"), (3L, "window")))
    val out = graft.ops.ScaleOps6.q91Bm25(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getLong(2)) ->
        ((r.getInt(1), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(out.size == 5, out.toString)
    // spark: df=1, doc1 tf=2 dl=3: idf=(6-2+1)/3, den=10*6*2+3*6+9*3*3=219
    assert(out(("spark", 1L)) == ((1, 2L, 1L, 3L, (5.0 / 3.0) * (264.0 / 219.0))))
    // join: df=2; doc2 (tf=1, dl=2) den=60+18+54=132 -> tf_part exactly 1
    assert(out(("join", 2L)) == ((1, 1L, 2L, 2L, (3.0 / 5.0) * (132.0 / 132.0))))
    // doc1 (tf=1, dl=3) den=60+18+81=159 ranks below doc2
    assert(out(("join", 1L)) == ((2, 1L, 2L, 3L, (3.0 / 5.0) * (132.0 / 159.0))))
    assert(out(("scan", 2L)) == ((1, 1L, 1L, 2L, (5.0 / 3.0) * (132.0 / 132.0))))
    assert(out(("window", 3L)) == ((1, 1L, 1L, 1L, (5.0 / 3.0) * (132.0 / 105.0))))
  }

  test("q91 BM25: top-5 cap with doc_id tiebreak on equal scores") {
    val dir = tempDir("bm25cap")
    writeDocs(dir, (1L to 7L).map(i => (i, "spark")))
    val rows = graft.ops.ScaleOps6.q91Bm25(spark, dir.toString).collect()
    assert(rows.length == 5)
    // identical tf/dl/df ⇒ identical scores ⇒ rank order = doc_id order
    assert(rows.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(rows.map(_.getInt(1)).toSeq == Seq(1, 2, 3, 4, 5))
  }

  // --- q92 Unicode normalization -------------------------------------------

  test("normalize kernels: NFC/NFD round-trip, strip, non-Latin passthrough") {
    def u(s: String) = UTF8String.fromString(s)
    assert(NormalizeKernels.stripAccents(u("áéíóú")).toString == "aeiou")
    assert(NormalizeKernels.nfd(u("á")).toString == "á")
    assert(NormalizeKernels.nfc(u("á")).toString == "á")
    assert(NormalizeKernels.nfc(NormalizeKernels.nfd(u("thé fást kéy"))).toString
      == "thé fást kéy")
    // non-Latin text passes through strip untouched (no combining marks)
    assert(NormalizeKernels.stripAccents(u("漢字 kana カナ")).toString == "漢字 kana カナ")
    // strip recomposes what it keeps: ç = c + cedilla(Mn) -> c
    assert(NormalizeKernels.stripAccents(u("façade")).toString == "facade")
  }

  test("q92 normalize: NFD length law, round-trip, and strip on derived accents") {
    val dir = tempDir("norm")
    writeDocs(dir, Seq((1L, "the fast key"), (2L, "zzz"), (3L, "aeiou")))
    val out = graft.ops.ScaleOps6.q92Normalize(spark, dir.toString).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    // 'the fast key' has 3 vowels -> acc length 12, NFD length 15
    assert(out(1L) == (("thé fást kéy", 15L, "thé fást kéy", "the fast key")))
    // no vowels -> accent-free, NFD = identity
    assert(out(2L) == (("zzz", 3L, "zzz", "zzz")))
    // all five accent mappings in one string
    assert(out(3L) == (("áéíóú", 10L, "áéíóú", "aeiou")))
  }

  // --- q93 SCD Type-2 ------------------------------------------------------

  test("q93 SCD2: intra-day last-write-wins, change detection, interval chain") {
    val dir = tempDir("scd2")
    def ts(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    Seq(
      // custkey 1, day 1: two writes — higher orderkey (prio B) wins the day
      (1L, 1L, ts("2024-01-01"), "A"),
      (2L, 1L, ts("2024-01-01"), "B"),
      // day 2: unchanged attribute — must NOT open a new version
      (3L, 1L, ts("2024-01-02"), "B"),
      // day 3: change -> version 2
      (4L, 1L, ts("2024-01-03"), "C"),
      // custkey 2: single observation
      (5L, 2L, ts("2024-02-01"), "A"))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_totalprice", lit(1.0))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = graft.ops.ScaleOps6.q93Scd2(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))).toMap
    assert(rows.size == 3, rows.toString)
    assert(rows((1L, 1L)) == (("B", ts("2024-01-01"), Some(ts("2024-01-03")), false)))
    assert(rows((1L, 2L)) == (("C", ts("2024-01-03"), None, true)))
    assert(rows((2L, 1L)) == (("A", ts("2024-02-01"), None, true)))
  }

  test("q93 SCD2 plan: ONE business-key exchange serves all three window passes") {
    val p = graft.ops.ScaleOps6.q93Scd2(spark, sf)
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n == 1, s"expected 1 hash exchange (custkey), got $n\n$p")
    // the finer intra-day window must NOT have forced its own exchange
    assert(!p.contains("hashpartitioning(custkey#") ||
      "Exchange hashpartitioning\\(custkey".r.findAllIn(p).length == 1, p)
  }

  // --- q94 z-order ---------------------------------------------------------

  test("q94 z-order: Morton interleave arithmetic on hand coordinates") {
    val dir = tempDir("zorder")
    // (x=3,y=5): spread(3)=0b101=5, spread(5)=0b10001=17 -> z = 5 | 34 = 39
    // (x=255,y=255): z = 65535 -> bucket 1023
    // partkey 259 ≡ 3 (mod 256): folds into the same cell as partkey 3
    Seq((3L, 5L), (259L, 5L), (255L, 255L))
      .toDF("l_partkey", "l_suppkey")
      .withColumn("l_orderkey", lit(1L)).withColumn("l_quantity", lit(1.0))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = graft.ops.ScaleOps6.q94Zorder(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(rows.size == 2, rows.toString)
    assert(rows(0L) == ((2L, 3L, 3L, 5L, 5L)))     // z=39 div 64 = 0, two rows
    assert(rows(1023L) == ((1L, 255L, 255L, 255L, 255L)))
  }

  test("q94 z-order: every 64-z bucket bounds both dimensions to ≤8-wide extents") {
    val rows = graft.ops.ScaleOps6.q94Zorder(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (xSpan, ySpan) = (r.getLong(3) - r.getLong(2), r.getLong(5) - r.getLong(4))
      assert(xSpan <= 7 && ySpan <= 7,
        s"bucket ${r.getLong(0)} spans x=$xSpan y=$ySpan — z-locality broken")
    }
  }

  // --- q95 character diversity ---------------------------------------------

  test("charStats kernel: one-pass totals on ASCII, Unicode fallback, supplementary") {
    def stats(s: String) = {
      val a = NormalizeKernels.charStats(UTF8String.fromString(s))
      (a.getLong(0), a.getLong(1), a.getLong(2))
    }
    assert(stats("aaaa") == ((4L, 1L, 16L)))
    assert(stats("abab") == ((4L, 2L, 8L)))
    assert(stats("ééé") == ((3L, 1L, 9L)))       // non-ASCII map path
    assert(stats("aéaé") == ((4L, 2L, 8L)))      // mixed paths combine
    assert(stats("𝄞𝄞a") == ((3L, 2L, 5L)))       // supplementary-plane codepoints
  }

  test("q95 char diversity: exact Gini law; empty docs excluded") {
    val dir = tempDir("gini")
    writeDocs(dir, Seq((1L, "aaaa"), (2L, "abab"), (3L, ""), (4L, "ééé")))
    val out = graft.ops.ScaleOps6.q95CharDiversity(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(!out.contains(3L))
    assert(out(1L) == ((4L, 1L, 0.0)))
    assert(out(2L) == ((4L, 2L, 0.5)))           // (16-8)/16
    assert(out(4L) == ((3L, 1L, 0.0)))
  }

  test("SQL registration: normalize/char_stats kernels callable from spark.sql") {
    graft.functions.GraftExtensions.registerAll(spark)
    Seq((1L, "thé fást kéy"), (2L, "abab")).toDF("id", "s")
      .createOrReplaceTempView("norm_sql_in")
    val r = spark.sql(
      """SELECT id, strip_accents(s) AS st,
        |  length(nfd_normalize(s)) AS nfd_len,
        |  nfc_normalize(nfd_normalize(s)) AS rt,
        |  char_stats(s) AS cs
        |FROM norm_sql_in ORDER BY id""".stripMargin).collect()
    assert(r(0).getString(1) == "the fast key")
    assert(r(0).getInt(2) == 15 && r(0).getString(3) == "thé fást kéy")
    assert(r(1).getSeq[Long](4) == Seq(4L, 2L, 8L))
  }

  // --- plan pins for the scan-stage kernels --------------------------------

  test("q92/q95 plans: pure per-row kernels — no hash exchange before the sort") {
    for (q <- Seq(graft.ops.ScaleOps6.q92Normalize(spark, sf),
                  graft.ops.ScaleOps6.q95CharDiversity(spark, sf))) {
      val p = q.queryExecution.executedPlan.toString
      val n = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(n == 0, s"normalization/diversity must be a pure map; got $n exchanges\n$p")
    }
  }

  test("q91 plan: df and corpus stats broadcast; only candidate-bounded shuffles") {
    val p = graft.ops.ScaleOps6.q91Bm25(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange"), p)
    // token explode happens map-side; shuffles only on (doc,term) tf rows
    // and the shared per-term window (df count + ranking reuse ONE term
    // exchange)
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n == 2, s"expected 2 candidate-bounded hash exchanges, got $n\n$p")
  }
}
