package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Ground-truth laws for the round-9 batch-11 operators: df-capped sparse
  * similarity (q133), week-over-week growth (q134), join-key skew report
  * (q135), deterministic JL projection (q136). */
class ScaleOps12Spec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // --- q133 sparse similarity ----------------------------------------------

  test("q133: hand corpus — tf·tf weights over shared 5-grams; df cap drops template terms") {
    val dir = tempDir("q133-hand")
    // docs 1,2 share the 5-gram "a b c d e" (doc 1 has it twice via
    // overlap-free repetition) → w = 2·1 = 2, n_shared = 1.
    // docs 1,2,3 ALL contain "t t t t t" — df=3, 3·50 > 100 ⇒ capped out.
    // 97 fillers of unique tokens push N to 100 so df=2 passes (2·50 ≤ 100).
    val base = Seq(
      (1L, "a b c d e x a b c d e t t t t t"),
      (2L, "a b c d e y t t t t t"),
      (3L, "t t t t t z q r s u"))
    val fillers = (4L to 100L).map(i =>
      (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f"))
    (base ++ fillers).map { case (id, txt) => (id, txt, "en", "src0", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.ScaleOps12.q133SparseSim(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2"),
        r.getAs[Long]("w"), r.getAs[Long]("n_shared"))).toSeq
    // ONLY the (1,2) pair survives: "t t t t t" is capped, fillers unique
    assert(got == Seq((1L, 2L, 2L, 1L)))
  }

  test("q133: real corpus — weights re-derive from a scalar 5-gram walk with the same df cap") {
    val texts = graft.ops.Relational.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val n = texts.length
    val postings: Seq[(Long, String, Long)] = texts.toSeq.flatMap { case (id, txt) =>
      txt.trim.toLowerCase.split("\\s+").toSeq.sliding(5).filter(_.length == 5)
        .map(g => (id, g.mkString("_")))
        .toSeq.groupBy(identity).map { case ((d, t), o) => (d, t, o.size.toLong) }
    }
    val byTermDf = postings.groupBy(_._2).view.mapValues(_.size).toMap
    val capped = postings.filter(p => byTermDf(p._2) * 50 <= n)
    val pairW = capped.groupBy(_._2).values.flatMap { ps =>
      for (a <- ps; b <- ps if a._1 < b._1) yield ((a._1, b._1), a._3 * b._3)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expectedTop = pairW.toSeq
      .sortBy { case ((p1, p2), w) => (-w, p1, p2) }.take(25)
      .map { case ((p1, p2), w) => (p1, p2, w) }
    val got = graft.ops.ScaleOps12.q133SparseSim(spark, sf)
      .collect().map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2"),
        r.getAs[Long]("w"))).toSeq
    assert(got == expectedTop && got.nonEmpty)
  }

  // --- q134 week-over-week -------------------------------------------------

  test("q134: hand weeks — Monday ISO buckets, exact growth ratio, first week excluded") {
    val dir = tempDir("q134-hand")
    // 2024-01-01 is a Monday. Week 1: 4 events; week 2: 6; week 3: 3.
    val base = Timestamp.valueOf("2024-01-01 12:00:00").getTime
    val rows =
      (0 until 4).map(k => (k.toLong, new Timestamp(base + k * 3600000L))) ++
      (0 until 6).map(k => (10L + k, new Timestamp(base + 7L * 86400000L + k * 3600000L))) ++
      (0 until 3).map(k => (20L + k, new Timestamp(base + 14L * 86400000L + k * 3600000L)))
    rows.map { case (id, t) => (id, t, 1L, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.ScaleOps12.q134WowGrowth(spark, dir.toString)
      .collect().map(r => (r.getAs[Timestamp]("wk"), r.getAs[Long]("c"),
        r.getAs[Long]("prev"), r.getAs[Double]("growth"))).toSeq
    assert(got == Seq(
      (Timestamp.valueOf("2024-01-08 00:00:00"), 6L, 4L, 0.5),
      (Timestamp.valueOf("2024-01-15 00:00:00"), 3L, 6L, -0.5)))
  }

  test("q134: real corpus — each row's growth re-derives; weeks ascend per type") {
    val rows = graft.ops.ScaleOps12.q134WowGrowth(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (c, p) = (r.getAs[Long]("c"), r.getAs[Long]("prev"))
      assert(r.getAs[Double]("growth") == (c.toDouble - p.toDouble) / p.toDouble)
    }
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val wks = rs.map(_.getAs[Timestamp]("wk").getTime).toSeq
      assert(wks == wks.sorted)
    }
  }

  // --- q135 skew report ----------------------------------------------------

  test("q135: hand keys — hot-key detection via the integer cross-product law") {
    val dir = tempDir("q135-hand")
    // l_orderkey: key 1 ×6, keys 2..5 ×1 → n_keys=5 total=10 avg=2;
    // hot ⇔ cnt·5 > 20 ⇔ cnt > 4 ⇒ only key 1. top_share = 0.6.
    // l_partkey/l_suppkey: all distinct (no hot keys).
    val rows = Seq.fill(6)(1L) ++ Seq(2L, 3L, 4L, 5L)
    rows.zipWithIndex.map { case (ok, i) => (ok, 100L + i, 200L + i) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.ops.ScaleOps12.q135SkewReport(spark, dir.toString)
      .collect().map(r => (r.getAs[String]("key_col"), r.getAs[Long]("n_keys"),
        r.getAs[Long]("max_cnt"), r.getAs[Long]("top_key"),
        r.getAs[Double]("top_share"), r.getAs[Long]("n_hot"))).toSeq
    assert(got == Seq(
      ("l_orderkey", 5L, 6L, 1L, 0.6, 1L),
      ("l_partkey", 10L, 1L, 100L, 0.1, 0L),
      ("l_suppkey", 10L, 1L, 200L, 0.1, 0L)))
  }

  test("q135: real corpus — totals equal lineitem count ×1 per column; top key re-derives") {
    val li = graft.ops.Relational.t(spark, sf, "lineitem")
    val n = li.count()
    val rows = graft.ops.ScaleOps12.q135SkewReport(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach(r => assert(r.getAs[Long]("total") == n))
    // scalar re-derivation for l_suppkey (smallest cardinality)
    val counts = li.groupBy(col("l_suppkey")).count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val top = counts.minBy { case (k, c) => (-c, k) }
    val sk = rows.find(_.getAs[String]("key_col") == "l_suppkey").get
    assert(sk.getAs[Long]("top_key") == top._1 && sk.getAs[Long]("max_cnt") == top._2)
    assert(sk.getAs[Long]("n_keys") == counts.length.toLong)
  }

  // --- q136 JL projection --------------------------------------------------

  test("q136: coordinates re-derive from the sign matrix with the in-order accumulation law") {
    val m = graft.functions.VectorKernels.signMatrix(16, 64)
    val vecs = graft.ops.Relational.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Float](1).toArray)).toMap
    val rows = graft.ops.ScaleOps12.q136JlProject(spark, sf).collect()
    assert(rows.length == vecs.size)
    rows.take(50).foreach { r =>
      val v = vecs(r.getAs[Long]("vec_id"))
      for (k <- 0 until 16) {
        var s = 0.0
        var d = 0
        while (d < v.length) { s += v(d).toDouble * m(k)(d); d += 1 }
        assert(r.getAs[Double](s"y$k") == s * 0.25,
          s"coordinate y$k diverges for vec ${r.getAs[Long]("vec_id")}")
      }
    }
  }

  test("q136: projection is deterministic and shares the q24 hyperplane family (same sign matrix)") {
    val a = graft.ops.ScaleOps12.q136JlProject(spark, sf).collect().toSeq
    val b = graft.ops.ScaleOps12.q136JlProject(spark, sf).collect().toSeq
    assert(a == b)
    // the first 8 rows of the 16-row matrix ARE q24's 8-bit family —
    // memoized, so bucket bits and projection signs can never drift apart
    val m16 = graft.functions.VectorKernels.signMatrix(16, 64)
    val m8 = graft.functions.VectorKernels.signMatrix(8, 64)
    assert((0 until 8).forall(p => m16(p).toSeq == m8(p).toSeq))
  }
}
