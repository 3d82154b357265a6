package graft

import graft.ops.Scale
import org.apache.spark.sql.functions._

class ScaleSpec extends GraftSuite {
  import spark.implicits._

  test("salted aggregate equals the direct groupBy") {
    val df = Seq.tabulate(1000)(i => (if (i % 10 == 0) "cold" + i else "hot", i.toLong))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(
      sum($"v".cast("decimal(18,4)")).as("sum_v"), count(lit(1)).as("n"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2)))
    val salted = Scale.saltedAggregate(df, Seq("k"),
      Map("sum_v" -> $"v".cast("decimal(18,4)")), 8, Seq($"v"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2)))
    assert(salted.toSeq == direct.toSeq)
  }

  test("salted join equals the direct join") {
    val big = Seq.tabulate(500)(i => ("hot", i.toLong)).toDF("k", "v")
    val small = Seq(("hot", 99L)).toDF("k", "w")
    val direct = big.join(small, "k").agg(sum($"v"), sum($"w")).head()
    val salted = Scale.saltedJoin(big, small, Seq("k"), 8, Seq($"v"))
      .agg(sum($"v"), sum($"w")).head()
    assert(direct == salted)
  }

  test("partitioned mirror prunes partitions at plan time") {
    val t = s"part_docs_${System.nanoTime()}"
    Scale.partitionedMirror(
      Seq((1L, "aa", "en"), (2L, "bb", "en"), (3L, "cc", "de"))
        .toDF("doc_id", "text", "lang"), t, "lang")
    val q = spark.table(t).filter($"lang" === "en")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters"), p)
    // the partition filter actually carries the lang predicate
    assert(p.matches("(?s).*PartitionFilters: \\[[^\\]]*lang[^\\]]*\\].*"), p)
    assert(q.count() == 2)
  }

  test("bucketed mirror joins without any Exchange") {
    val a = s"bkt_a_${System.nanoTime()}"; val b = s"bkt_b_${System.nanoTime()}"
    Scale.bucketedMirror(Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "s"), a, "id", 4)
    Scale.bucketedMirror(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), b, "id", 4)
    // disable auto-broadcast so the planner actually uses the bucket layout
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(a).join(spark.table(b), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan) // no shuffle
      assert(joined.count() == 2)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
