package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Ground-truth laws for the round-9 batch-13 statistics: exact-integer
  * Kaplan–Meier (q139), Mann–Whitney U (q140), HHI (q141). */
class ScaleOps14Spec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def day(d: Int) = Timestamp.valueOf(f"2024-03-$d%02d 12:00:00")

  private def writeEvents(dir: java.nio.file.Path,
                          rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  // --- q139 Kaplan–Meier ---------------------------------------------------

  test("q139: hand sessions — per-step fixed-point survival; a censored open session shrinks risk but adds no step") {
    val dir = tempDir("q139-hand")
    def t(s: String) = Timestamp.valueOf(s)
    // corpus max ts = 12:00. All even user ids ⇒ one cohort (0).
    // u2: 10:00+10:10 → one session, 10 min, dead (ends 110 min before max)
    // u4: 10:00+10:05 → 5 min, dead
    // u6: 10:00       → 0 min, dead
    // u8: 11:50+12:00 → 10 min, ends AT max ts ⇒ CENSORED (≤ one gap):
    //     it must appear in n_at_risk at t=10 but contribute no death
    writeEvents(dir, Seq(
      (1L, t("2024-03-01 10:00:00"), 2L, "click", 1.0),
      (2L, t("2024-03-01 10:10:00"), 2L, "click", 1.0),
      (3L, t("2024-03-01 10:00:00"), 4L, "click", 1.0),
      (4L, t("2024-03-01 10:05:00"), 4L, "click", 1.0),
      (5L, t("2024-03-01 10:00:00"), 6L, "click", 1.0),
      (6L, t("2024-03-01 11:50:00"), 8L, "click", 1.0),
      (7L, t("2024-03-01 12:00:00"), 8L, "click", 1.0)))
    val got = graft.ops.ScaleOps14.q139KaplanMeier(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("t"),
        r.getAs[Long]("n_at_risk"), r.getAs[Long]("d"),
        r.getAs[Long]("s_fp"))).toSeq
    // S₀=10⁹: t=0 (n=4,d=1) → 75e7; t=5 (n=3,d=1) → 5e8;
    // t=10 (n=2: u2 dead + u8 censored-at-risk, d=1) → 25e7
    assert(got == Seq(
      (0L, 0L, 4L, 1L, 750000000L),
      (0L, 5L, 3L, 1L, 500000000L),
      (0L, 10L, 2L, 1L, 250000000L)))
  }

  test("q139: real corpus — S re-derives from a scalar fixed-point fold and is nonincreasing per cohort") {
    val rows = graft.ops.ScaleOps14.q139KaplanMeier(spark, sf)
      .collect().map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("t"),
        r.getAs[Long]("n_at_risk"), r.getAs[Long]("d"), r.getAs[Long]("s_fp")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      var s = 1000000000L
      sorted.foreach { case (_, _, n, d, sFp) =>
        s = (s * (n - d)) / n
        assert(sFp == s, s"fold diverges at step $sFp vs $s")
      }
      val svals = sorted.map(_._5).toSeq
      assert(svals == svals.sorted.reverse, "survival must be nonincreasing")
    }
  }

  // --- q140 Mann–Whitney ---------------------------------------------------

  test("q140: hand values — midrank tie law in doubled units matches pairwise counting") {
    val dir = tempDir("q140-hand")
    // type x: cohort0 (even uid) values {1,2,2}, cohort1 (odd) {2,3}
    // pairwise: U1 = 5 (u1_2=10), U2 = 1 (u2_2=2)
    writeEvents(dir, Seq(
      (1L, day(1), 2L, "x", 1.0), (2L, day(1), 2L, "x", 2.0),
      (3L, day(1), 4L, "x", 2.0), (4L, day(1), 1L, "x", 2.0),
      (5L, day(1), 3L, "x", 3.0)))
    val r = graft.ops.ScaleOps14.q140MannWhitney(spark, dir.toString).collect().head
    assert(r.getAs[Long]("n1") == 3 && r.getAs[Long]("n2") == 2)
    assert(r.getAs[Long]("r1_2") == 14)
    assert(r.getAs[Long]("u1_2") == 10 && r.getAs[Long]("u2_2") == 2)
    assert(r.getAs[Boolean]("identity_ok"))
  }

  test("q140: real corpus — U identity holds and n1+n2 equals the type's row count") {
    val counts = graft.ops.Relational.events(spark, sf)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = graft.ops.ScaleOps14.q140MannWhitney(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n1, n2) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"))
      assert(r.getAs[Long]("u1_2") + r.getAs[Long]("u2_2") == 2 * n1 * n2)
      assert(n1 + n2 == counts(r.getAs[String]("event_type")))
      assert(r.getAs[Boolean]("identity_ok"))
      assert(r.getAs[Long]("u1_2") >= 0 && r.getAs[Long]("u2_2") >= 0)
    }
  }

  // --- q141 HHI ------------------------------------------------------------

  test("q141: hand shares — fixed-point HHI and effective n") {
    val dir = tempDir("q141-hand")
    // source: a×3, b×1 → HHI = (9+1)/16 = 0.625, eff n = 1.6
    // lang: xx×4 → HHI = 1, eff n = 1
    Seq((1L, "t", "xx", "a", 1L), (2L, "t", "xx", "a", 1L),
        (3L, "t", "xx", "a", 1L), (4L, "t", "xx", "b", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.ScaleOps14.q141Hhi(spark, dir.toString)
      .collect().map(r => (r.getAs[String]("dim"), r.getAs[Long]("hhi_fp"),
        r.getAs[Double]("hhi"), r.getAs[Double]("effective_n"))).toSeq
    assert(got == Seq(
      ("lang", 100000000L, 1.0, 1.0),
      ("source", 62500000L, 0.625, 1.6)))
  }

  test("q141: real corpus — HHI within [1/n, 1], effective n within [1, n_values]") {
    val rows = graft.ops.ScaleOps14.q141Hhi(spark, sf).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val (n, hhi, eff) = (r.getAs[Long]("n_values"), r.getAs[Double]("hhi"),
        r.getAs[Double]("effective_n"))
      assert(hhi >= 1.0 / n && hhi <= 1.0)
      assert(eff >= 1.0 && eff <= n.toDouble)
    }
  }
}
