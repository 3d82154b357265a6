package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Ground-truth laws for the round-9 batch-3 operators: integer PageRank
  * (q96), dyadic-decay activity (q97), forward-fill densification (q98),
  * ordered funnel (q99), and retention cohorts (q100). */
class ScaleOps7Spec extends GraftSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def writeEvents(dir: java.nio.file.Path,
                          rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  // --- q96 PageRank --------------------------------------------------------

  test("q96 PageRank: three hand-computed integer damping rounds") {
    val dir = tempDir("pagerank")
    // suppliers {1,2}, customers {1,2}; trade pairs (1,1),(1,2),(2,2)
    // (order 10 carries a duplicate lineitem row — DISTINCT must fold it)
    Seq((10L, 1L), (10L, 1L), (11L, 1L), (12L, 2L))
      .toDF("l_orderkey", "l_suppkey")
      .withColumn("l_quantity", lit(1.0))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((10L, 1L), (11L, 2L), (12L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // nodes: s1→2 s2→4 c1→3 c2→5; undirected degree 2/1/1/2
    // round-by-round (base 150000, damping 85/100, floor):
    //   pr1 = 1425000/575000/575000/1425000 (nodes 2/3/4/5)
    //   pr2 = 1244375/755625/755625/1244375
    //   pr3 = 1321140/678859/678859/1321140
    val out = graft.ops.ScaleOps7.q96Pagerank(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      2L -> ((2L, 1321140L)), 3L -> ((1L, 678859L)),
      4L -> ((1L, 678859L)), 5L -> ((2L, 1321140L))), out.toString)
  }

  test("q96 plan: edge table with degree built once (cached, reused per round)") {
    val p = graft.ops.ScaleOps7.q96Pagerank(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("InMemoryTableScan"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  // --- q97 dyadic decay ----------------------------------------------------

  test("q97 decay: exact dyadic weights, day clamping") {
    val dir = tempDir("decay")
    writeEvents(dir, Seq(
      // user 1: two events on day 29 (weight 1), one on day 28 (weight 2)
      (1L, ts("2024-01-30 10:00:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-30 11:00:00"), 1L, "view", 1.0),
      (3L, ts("2024-01-29 09:00:00"), 1L, "click", 1.0),
      // user 2: one event BEFORE the window -> clamps to day 0, weight 2^29
      (4L, ts("2023-12-25 00:00:00"), 2L, "signup", 1.0)))
    val out = graft.ops.ScaleOps7.q97DecayScore(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 4L, 4.0 / (1L << 29).toDouble)))
    assert(out(2L) == ((1L, 1L << 29, 1.0)))
  }

  test("q97 plan: two partial-agg exchanges (daily, then user)") {
    val p = graft.ops.ScaleOps7.q97DecayScore(spark, sf)
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n == 2, s"expected 2 hash exchanges, got $n\n$p")
  }

  // --- q98 forward fill ----------------------------------------------------

  test("q98 forward fill: last-of-day wins, gaps carry, leading days stay null") {
    val dir = tempDir("ffill")
    writeEvents(dir, Seq(
      // user 1 day 0: later ts wins (5.0); day 2: 7.0
      (1L, ts("2024-01-01 08:00:00"), 1L, "view", 3.0),
      (2L, ts("2024-01-01 09:00:00"), 1L, "view", 5.0),
      (3L, ts("2024-01-03 12:00:00"), 1L, "view", 7.0),
      // user 2: single event on the last day
      (4L, ts("2024-01-30 00:00:00"), 2L, "view", 9.0)))
    val rows = graft.ops.ScaleOps7.q98ForwardFill(spark, dir.toString).collect()
    assert(rows.length == 60) // 2 users × 30 days
    val m = rows.map(r => (r.getLong(0), r.getTimestamp(1).toString.take(10)) ->
      ((Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3)))).toMap
    assert(m((1L, "2024-01-01")) == ((Some(5.0), true)))
    assert(m((1L, "2024-01-02")) == ((Some(5.0), false)))  // gap carries day-0 value
    assert(m((1L, "2024-01-03")) == ((Some(7.0), true)))
    assert(m((1L, "2024-01-30")) == ((Some(7.0), false)))
    assert(m((2L, "2024-01-29")) == ((None, false)))       // before first observation
    assert(m((2L, "2024-01-30")) == ((Some(9.0), true)))
  }

  test("q98 plan: day scaffold broadcasts (never an event-sized cross)") {
    val p = graft.ops.ScaleOps7.q98ForwardFill(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  // --- q99 funnel ----------------------------------------------------------

  test("q99 funnel: stage times require strict ordering after the previous stage") {
    val dir = tempDir("funnel")
    writeEvents(dir, Seq(
      // user 1: full ordered funnel
      (1L, ts("2024-01-02 10:00:00"), 1L, "signup", 0.0),
      (2L, ts("2024-01-03 10:00:00"), 1L, "view", 0.0),
      (3L, ts("2024-01-04 10:00:00"), 1L, "click", 0.0),
      (4L, ts("2024-01-05 10:00:00"), 1L, "purchase", 0.0),
      // user 2: view BEFORE signup does not count -> stage 1;
      // click with no qualifying view does not count either
      (5L, ts("2024-01-02 09:00:00"), 2L, "view", 0.0),
      (6L, ts("2024-01-02 10:00:00"), 2L, "signup", 0.0),
      (7L, ts("2024-01-03 10:00:00"), 2L, "click", 0.0),
      // user 3: never signs up -> stage 0 despite activity
      (8L, ts("2024-01-02 10:00:00"), 3L, "purchase", 0.0)))
    val out = graft.ops.ScaleOps7.q99Funnel(spark, dir.toString).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
          Option(r.getTimestamp(3)), Option(r.getTimestamp(4)), r.getLong(5)))).toMap
    assert(out(1L) == ((Some(ts("2024-01-02 10:00:00")), Some(ts("2024-01-03 10:00:00")),
      Some(ts("2024-01-04 10:00:00")), Some(ts("2024-01-05 10:00:00")), 4L)))
    assert(out(2L) == ((Some(ts("2024-01-02 10:00:00")), None, None, None, 1L)))
    assert(out(3L) == ((None, None, None, None, 0L)))
  }

  // --- q100 retention ------------------------------------------------------

  test("q100 retention: cohort by first-seen week, distinct users per offset") {
    val dir = tempDir("retention")
    writeEvents(dir, Seq(
      // user 1: cohort week 0; active weeks 0, 1, 2
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      (2L, ts("2024-01-09 10:00:00"), 1L, "view", 0.0),
      (3L, ts("2024-01-16 10:00:00"), 1L, "view", 0.0),
      // user 2: cohort week 1; two same-week events count once
      (4L, ts("2024-01-09 10:00:00"), 2L, "view", 0.0),
      (5L, ts("2024-01-10 10:00:00"), 2L, "view", 0.0),
      // user 3: cohort week 0; active weeks 0 and 2 (skips week 1)
      (6L, ts("2024-01-02 10:00:00"), 3L, "view", 0.0),
      (7L, ts("2024-01-17 10:00:00"), 3L, "view", 0.0)))
    val out = graft.ops.ScaleOps7.q100Retention(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 2L, (1L, 0L) -> 1L),
      out.toString)
  }

  test("q99/q100 plans: user-keyed joins only — no cartesian, no broadcast of events") {
    for (q <- Seq(graft.ops.ScaleOps7.q99Funnel(spark, sf),
                  graft.ops.ScaleOps7.q100Retention(spark, sf))) {
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
    }
  }
}
