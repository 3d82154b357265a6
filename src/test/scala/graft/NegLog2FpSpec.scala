package graft

import org.apache.spark.sql.functions._

/** The r17 single-expression log₂ kernel against the documented BigInt
  * square-and-compare model — the same scalar model ScaleOps30Spec pins
  * the full scorer with, here drilled at the EXPRESSION level so the
  * bit-identity claim ("the codegen'd long loop computes exactly what
  * the DECIMAL tower and the DuckDB HUGEINT mirror compute") is pinned
  * where it is made, over the whole input domain shape. */
class NegLog2FpSpec extends GraftSuite {
  import spark.implicits._

  /** The documented algorithm, BigInt only — no shared code with the
    * expression under test (mirrors ScaleOps30Spec.lneg's core). */
  private def model(rIn: Long): Long = {
    val r = BigInt(rIn).max(1)
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

  /** Deterministic domain sweep: every exact power of two in [2⁰, 2⁶²],
    * both neighbors of each (the mantissa-normalization seams), and an
    * LCG walk masked to 62 bits (seeded — no Math.random, same values
    * every run). */
  private val sweep: Seq[Long] = {
    val powers = (0 to 62).map(k => 1L << k)
    val seams = powers.flatMap(p => Seq(p - 1, p, p + 1))
      .filter(x => x >= 1 && x <= (1L << 62))
    var s = 0x2545F4914F6CDD1DL
    val walk = Seq.fill(4000) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 2) & ((1L << 62) - 1)
    }.map(_.max(1L))
    (seams ++ walk).distinct
  }

  test("neg_log2_fp == the BigInt square-and-compare model over the full domain sweep (codegen path), the interpreted eval agrees with codegen, and the clamp/corner pins hold") {
    // interpreted twin first — cheap, exhaustive over the sweep
    sweep.foreach { r =>
      assert(graft.functions.NegLog2Fp.compute(r) == model(r),
        s"interpreted compute($r) drifted from the BigInt model")
    }
    // codegen path: the same sweep THROUGH a DataFrame projection
    val viaDf = sweep.toDF("r")
      .select(col("r"), graft.functions.NegLog2Fp.neg_log2_fp(col("r")).as("l"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    sweep.foreach { r =>
      assert(viaDf(r) == model(r), s"codegen neg_log2_fp($r) drifted")
    }
    // corner pins straight from the algorithm: -log2(1) at full scale,
    // exact powers of two carry ZERO truncation error, and the ratio
    // floor r=1 is the 62-bit ceiling
    assert(graft.functions.NegLog2Fp.compute(1L << 62) == 0L)
    assert(graft.functions.NegLog2Fp.compute(1L << 59) == 3L * (1L << 20))
    assert(graft.functions.NegLog2Fp.compute(1L) == 62L * (1L << 20))
    // defensive clamp: r < 1 floors to r = 1 (the ratio's GREATEST floor)
    assert(graft.functions.NegLog2Fp.compute(0L) ==
      graft.functions.NegLog2Fp.compute(1L))
    assert(graft.functions.NegLog2Fp.compute(-7L) ==
      graft.functions.NegLog2Fp.compute(1L))
  }

  test("NULL propagates, the SQL registration evaluates (both the object register and the GraftExtensions surface), and the expression stays inside whole-stage codegen") {
    graft.functions.NegLog2Fp.register(spark)
    val out = Seq[(Long, java.lang.Long)]((1L, 1L << 62), (2L, null))
      .toDF("id", "r")
      .selectExpr("id", "neg_log2_fp(r) AS l")
      .orderBy("id").collect()
    assert(out(0).getLong(1) == 0L)
    assert(out(1).isNullAt(1), "NULL input must yield NULL")
    // the engine's one SQL surface carries it too
    graft.functions.GraftExtensions.registerAll(spark)
    assert(spark.sql(s"SELECT neg_log2_fp(${1L << 59}L) AS l")
      .head().getLong(0) == 3L * (1L << 20))
    // codegen containment: the projection must sit inside a
    // whole-stage span (starred operator — no fallback to an
    // interpreted/un-starred Project; the PlanShapeSpec idiom)
    val df = spark.range(10).select(
      graft.functions.NegLog2Fp.neg_log2_fp(col("id") + 1).as("l"))
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined, plan)
    assert(plan.contains("neg_log2_fp"), plan)
    assert(df.collect().length == 10)
  }
}
