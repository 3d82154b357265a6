package graft

import org.apache.spark.sql.functions._
import graft.ops.{Relational, Relational3}

/** Invariants for the third relational wave (q38-q46). Value-level ground
  * truth is the DuckDB oracle (driver + tools/compare_oracle.py); these
  * tests pin the structural properties the oracle can't see.  */
class Relational3Spec extends GraftSuite {
  private val sf = "/root/testdata/sf0.001"

  test("q38 bands partition the fact table (every row in exactly one band)") {
    val out = Relational3.q38RangeJoin(spark, sf)
    val total = out.agg(sum(col("n"))).head.getLong(0)
    val liRows = Relational.t(spark, sf, "lineitem").count()
    assert(total == liRows)
  }

  test("q39 set ops: result ⊆ O∩F and disjoint from P") {
    val o = Relational.t(spark, sf, "orders")
    val res = Relational3.q39SetOps(spark, sf)
    val p = o.filter(col("o_orderstatus") === "P").select("o_custkey")
    assert(res.join(p, Seq("o_custkey"), "left_semi").count() == 0)
    val open = o.filter(col("o_orderstatus") === "O").select("o_custkey").distinct()
    assert(res.join(open, Seq("o_custkey"), "left_semi").count() == res.count())
    assert(res.select("o_custkey").distinct().count() == res.count())
  }

  test("q40 grouping sets: per-set counts each total the table") {
    val out = Relational3.q40GroupingSets(spark, sf).cache()
    val liRows = Relational.t(spark, sf, "lineitem").count()
    // set (l_returnflag): g_rf=0, g_ls=1; set (l_linestatus): 1/0; (): 1/1
    val byRf = out.filter(col("g_rf") === 0 && col("g_ls") === 1)
      .agg(sum("n")).head.getLong(0)
    val byLs = out.filter(col("g_rf") === 1 && col("g_ls") === 0)
      .agg(sum("n")).head.getLong(0)
    val grand = out.filter(col("g_rf") === 1 && col("g_ls") === 1)
      .select("n").head.getLong(0)
    assert(byRf == liRows && byLs == liRows && grand == liRows)
    out.unpersist()
  }

  test("q41 string funcs: one row per part, extracts are consistent") {
    val out = Relational3.q41StringFuncs(spark, sf).cache()
    assert(out.count() == Relational.t(spark, sf, "part").count())
    // p_name is "word word"; the regex last word == last split token
    val bad = out.filter(col("last_word") === "").count()
    assert(bad == 0)
    out.unpersist()
  }

  test("q42 word count: exactly 20 rows, descending counts") {
    val rows = Relational3.q42WordCount(spark, sf).collect()
    assert(rows.length == 20)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("q43 above-avg: strictly fewer than all customers per segment") {
    val out = Relational3.q43AboveAvg(spark, sf)
    val perSeg = Relational.t(spark, sf, "customer")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_cust"))
    val joined = out.join(perSeg, "c_mktsegment")
    assert(joined.filter(col("n_above") >= col("n_cust")).count() == 0)
    assert(out.count() > 0)
  }

  test("q44 window nav: one row per order; quartile in 1..4; lag/lead inverse") {
    val out = Relational3.q44WindowNav(spark, sf).cache()
    assert(out.count() == Relational.t(spark, sf, "orders").count())
    assert(out.filter(col("quartile") < 1 || col("quartile") > 4).count() == 0)
    // a row's next_price must equal the successor row's o_totalprice:
    // round-trip via self-join on (custkey, successor key ordering) is
    // covered by the oracle; here just pin null structure — exactly one
    // null prev_price and one null next_price per customer group.
    val perCust = out.groupBy("o_custkey").agg(
      sum(when(col("prev_price").isNull, 1).otherwise(0)).as("n0"),
      sum(when(col("next_price").isNull, 1).otherwise(0)).as("n1"))
    assert(perCust.filter(col("n0") =!= 1 || col("n1") =!= 1).count() == 0)
    out.unpersist()
  }

  test("q45 interval join: one row per signup; follows are non-negative") {
    val out = Relational3.q45IntervalJoin(spark, sf).cache()
    val nSignups = Relational.events(spark, sf)
      .filter(col("event_type") === "signup").count()
    assert(out.count() == nSignups)
    assert(out.filter(col("n_follow") < 0).count() == 0)
    // at least one signup has follow-up activity in the hour
    assert(out.filter(col("n_follow") > 0).count() > 0)
    out.unpersist()
  }

  test("q47 count distinct: nd <= n and matches per-column distinct") {
    val out = Relational3.q47CountDistinct(spark, sf).cache()
    assert(out.filter(col("nd_parts") > col("n")).count() == 0)
    val li = Relational.t(spark, sf, "lineitem")
    val direct = li.filter(col("l_returnflag") === "R")
      .select("l_partkey").distinct().count()
    val got = out.filter(col("l_returnflag") === "R").head.getAs[Long]("nd_parts")
    assert(got == direct)
    out.unpersist()
  }

  test("q48 moving avg: one row per event; single-event frames equal value") {
    val out = Relational3.q48MovingAvg(spark, sf)
    val e = Relational.events(spark, sf)
    assert(out.count() == e.count())
    // every frame contains at least the current row → mv_avg never null
    assert(out.filter(col("mv_avg").isNull).count() == 0)
  }

  test("q50 variance: agrees with built-in var_pop to float tolerance") {
    val out = Relational3.q50Variance(spark, sf).cache()
    val builtin = Relational.t(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(var_pop(col("l_quantity")).as("v"))
    val joined = out.join(builtin, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val exact = r.getAs[Double]("var_pop"); val approx = r.getAs[Double]("v")
      assert(math.abs(exact - approx) <= 1e-9 * math.max(1.0, exact),
        s"${r.getString(0)}: $exact vs $approx")
    }
    out.unpersist()
  }

  test("q51 train split: covers all docs, roughly 80/10/10, stable across runs") {
    val out = Relational3.q51TrainSplit(spark, sf).cache()
    val total = out.agg(sum(col("n_docs"))).head.getLong(0)
    assert(total == Relational.t(spark, sf, "documents").count())
    val bySplit = out.groupBy("split").agg(sum("n_docs").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val train = bySplit.getOrElse("train", 0L).toDouble / total
    assert(train > 0.7 && train < 0.9, s"train fraction $train")
    // determinism: identical result on a re-run
    val again = Relational3.q51TrainSplit(spark, sf).collect().toSeq
    assert(again == out.orderBy(col("lang"), col("split")).collect().toSeq)
    out.unpersist()
  }

  test("q51 splitBucket: overflow-safe for ids above 2^63/A; matches BigInt reference") {
    import spark.implicits._
    // ids straddling the 64-bit-multiply overflow threshold (~3.47e9) and
    // the full long range: the banked 16-bit-half formulation must equal
    // exact BigInt arithmetic everywhere
    val ids = Seq(0L, 1L, 12345L, 3469999999L, 3470000000L, 4294967295L,
      4294967296L, 123456789012345L, Long.MaxValue)
    val got = ids.toDF("doc_id")
      .select(col("doc_id"), graft.ops.Relational3.splitBucket(col("doc_id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      val want = ((BigInt(id) % BigInt(2).pow(32)) * BigInt(2654435761L) % BigInt(2).pow(32)).toLong
      assert(got(id) == want, s"id=$id got=${got(id)} want=$want")
    }
  }

  test("sampleByHash: deterministic, near-fraction, and nested across fractions") {
    val docs = Relational.t(spark, sf, "documents")
    val n = docs.count().toDouble
    val s10 = Relational3.sampleByHash(docs, "doc_id", 0.10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s25 = Relational3.sampleByHash(docs, "doc_id", 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // deterministic: re-run identical
    val again = Relational3.sampleByHash(docs, "doc_id", 0.10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s10 == again)
    // near-fraction (multiplicative hash is well-mixed; generous tolerance)
    assert(math.abs(s10.size / n - 0.10) < 0.05, s"${s10.size / n}")
    assert(math.abs(s25.size / n - 0.25) < 0.07, s"${s25.size / n}")
    // nesting law: the 10% sample is a subset of the 25% sample
    assert(s10.subsetOf(s25))
    // edge fractions
    assert(Relational3.sampleByHash(docs, "doc_id", 0.0).count() == 0)
    assert(Relational3.sampleByHash(docs, "doc_id", 1.0).count() == n.toLong)
  }

  test("q52 corr: agrees with built-in corr/covar_pop to float tolerance") {
    val out = Relational3.q52Corr(spark, sf).cache()
    val builtin = Relational.t(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_discount")).as("c"),
        covar_pop(col("l_quantity"), col("l_discount")).as("cv"))
    val joined = out.join(builtin, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(math.abs(r.getAs[Double]("corr") - r.getAs[Double]("c")) < 1e-6)
      assert(math.abs(r.getAs[Double]("covar_pop") - r.getAs[Double]("cv")) < 1e-9)
    }
    out.unpersist()
  }

  test("q53 except all: multiset counts are O-count minus F-count, floored") {
    val o = Relational.t(spark, sf, "orders")
    val counts = o.groupBy("o_custkey").agg(
      sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("nO"),
      sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("nF"))
    val expect = counts.filter(col("nO") > col("nF"))
      .select(col("o_custkey"), (col("nO") - col("nF")).as("n_excess"))
    val got = Relational3.q53SetOpsAll(spark, sf)
    assert(got.orderBy("o_custkey").collect().toSeq ==
      expect.orderBy("o_custkey").collect().toSeq)
  }

  test("q55 unpivot: 3 rows per bucket; totals match the orders count") {
    val out = Relational3.q55Unpivot(spark, sf).cache()
    val perBucket = out.groupBy("cust_bucket").agg(count(lit(1)).as("k"))
    assert(perBucket.filter(col("k") =!= 3).count() == 0)
    val total = out.agg(sum(col("n"))).head.getLong(0)
    assert(total == Relational.t(spark, sf, "orders").count())
    out.unpersist()
  }

  test("q56 streaks: longest <= n_days; n_days = distinct active days") {
    val out = Relational3.q56Streaks(spark, sf).cache()
    assert(out.filter(col("longest_streak") > col("n_days")).count() == 0)
    val nDays = out.agg(sum(col("n_days"))).head.getLong(0)
    val direct = Relational.events(spark, sf)
      .select(col("user_id"), to_date(col("ts"))).distinct().count()
    assert(nDays == direct)
    out.unpersist()
  }

  test("q46 json: k extraction parses every row") {
    val e = Relational.events(spark, sf)
    val out = Relational3.q46Json(spark, sf)
    val total = out.agg(sum(col("n"))).head.getLong(0)
    assert(total == e.count())
    // sum_k present (props always has k) and bounded by n*max_k
    assert(out.filter(col("sum_k").isNull).count() == 0)
    assert(out.filter(col("sum_k") > col("n") * col("max_k")).count() == 0)
  }
}
