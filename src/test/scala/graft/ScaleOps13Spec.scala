package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Ground-truth laws for the round-9 batch-12 advisors: dictionary-
  * encoding benefit (q137) and event-stream disorder (q138). */
class ScaleOps13Spec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // --- q137 dictionary advisor ---------------------------------------------

  test("q137: hand columns — byte laws and savings re-derive") {
    val dir = tempDir("q137-hand")
    // source: "aaaa"×3 + "bb"×1 → plain 3·4+2 = 14, dict (4+2) + 4·4 = 22
    //   (dictionary LOSES on tiny n — savings negative, the advisor must
    //   say so rather than clamp);
    // lang: "xy"×4 → plain 8, dict 2 + 16 = 18.
    Seq((1L, "t", "xy", "aaaa", 1L), (2L, "t", "xy", "aaaa", 1L),
        (3L, "t", "xy", "aaaa", 1L), (4L, "t", "xy", "bb", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.ScaleOps13.q137DictAdvisor(spark, dir.toString)
      .collect().map(r => (r.getAs[String]("col_name"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_distinct"), r.getAs[Long]("plain_bytes"),
        r.getAs[Long]("dict_bytes"), r.getAs[Double]("savings"))).toSeq
    assert(got == Seq(
      ("lang", 4L, 1L, 8L, 18L, 1.0 - 18.0 / 8.0),
      ("source", 4L, 2L, 14L, 22L, 1.0 - 22.0 / 14.0)))
  }

  test("q137: real corpus — row totals match and dictionary wins on both categorical columns") {
    val n = graft.ops.Relational.t(spark, sf, "documents").count()
    val rows = graft.ops.ScaleOps13.q137DictAdvisor(spark, sf).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("dict_bytes") < r.getAs[Long]("plain_bytes") ||
        r.getAs[Double]("savings") <= 0.0)
      val expSav = 1.0 - r.getAs[Long]("dict_bytes").toDouble /
        r.getAs[Long]("plain_bytes").toDouble
      assert(r.getAs[Double]("savings") == expSav)
    }
  }

  // --- q138 disorder -------------------------------------------------------

  test("q138: hand stream — inversions counted in producer order, worst backstep exact") {
    val dir = tempDir("q138-hand")
    def t(s: String) = Timestamp.valueOf(s)
    // producer order (event_id): times 10:00, 10:05, 10:02, 10:10 —
    // ONE inversion (10:05 → 10:02, backstep 180 000 ms); 3 pairs
    Seq(
      (1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 10:05:00")),
      (3L, t("2024-01-01 10:02:00")), (4L, t("2024-01-01 10:10:00")))
      .map { case (id, ts) => (id, ts, 1L, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.ScaleOps13.q138Disorder(spark, dir.toString).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_pairs") == 3L)
    assert(r.getAs[Long]("n_inversions") == 1L)
    assert(r.getAs[Long]("max_backstep_ms") == 180000L)
    assert(r.getAs[Double]("inversion_share") == 1.0 / 3.0)
  }

  test("q138: ordered stream — zero inversions, max backstep clamps to 0") {
    val dir = tempDir("q138-ordered")
    def t(s: String) = Timestamp.valueOf(s)
    (1L to 5L).map(i => (i, t(s"2024-01-01 10:0$i:00"), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.ops.ScaleOps13.q138Disorder(spark, dir.toString).collect().head
    assert(r.getAs[Long]("n_inversions") == 0L)
    assert(r.getAs[Long]("max_backstep_ms") == 0L)
  }

  test("q138: real corpus — shares re-derive from a scalar walk per type") {
    val ev = graft.ops.Relational.events(spark, sf)
      .select(col("event_type"), col("event_id"), unix_millis(col("ts")).as("ms"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).map { case (t, rows) =>
      val sorted = rows.sortBy(_._2).map(_._3).toSeq
      val steps = sorted.zip(sorted.tail).map { case (a, b) => a - b }
      (t, (steps.length.toLong, steps.count(_ > 0).toLong,
        math.max(steps.maxOption.getOrElse(0L), 0L)))
    }
    val got = graft.ops.ScaleOps13.q138Disorder(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"),
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_inversions"),
         r.getAs[Long]("max_backstep_ms")))).toMap
    assert(got == expected && got.nonEmpty)
  }
}
