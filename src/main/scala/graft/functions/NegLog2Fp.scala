package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** −log₂(r / 2⁶²) × 2²⁰ as ONE codegen'd integer expression — the exact
  * fixed-point log₂ kernel of the perplexity-domain LM scorer
  * ([[graft.ops.ScaleOps30]], q190/q191/q192), bit-identical to the
  * documented square-and-compare algorithm the DuckDB mirror runs as a
  * 20-round CTE chain:
  *
  *   e    = ⌊log₂ r⌋            (bit length − 1; r clamped to ≥ 1)
  *   m₀   = ⌊r·2³¹ / 2ᵉ⌋        ∈ [2³¹, 2³²)  — exact: a pure shift,
  *                              since r/2^(e−31) floors ⟺ r >>> (e−31)
  *                              and e < 31 needs no floor at all
  *   mmᵢ  = ⌊mᵢ₋₁² / 2³¹⌋       bit i = [mmᵢ ≥ 2³²]; mᵢ = bit ? mmᵢ/2 : mmᵢ
  *   out  = (62 − e)·2²⁰ − Σ bitᵢ·2²⁰⁻ⁱ       ≥ 0
  *
  * Why an Expression (r17): the prior form spent one projection LEVEL per
  * round (20 `withColumn`s) with every multiply in `DECIMAL(38,0)` —
  * m² < 2⁶⁴ overflows a SIGNED long, so the SQL layer had to ride
  * BigDecimal. In Java the product is exact in the UNSIGNED low 64 bits
  * (m < 2³² always), so `(m*m) >>> 31` is the exact ⌊m²/2³¹⌋ and the
  * whole chain is ~60 primitive long ops in one whole-stage-codegen'd
  * loop — no Decimal allocation, no alias tower. That also removes the
  * r16 planner-blow-up hazard at the root: the blow-up came from 20
  * multiply-referencing projection levels that AQE's empty-relation
  * propagation let the physical project-collapse inline into a ~2²⁰-node
  * tree; a single expression has nothing to inline, so the kernel is
  * lazy again (no eager `take(1)` guard, no streaming-frame restriction,
  * no extra source scan per call).
  *
  * Unchanged by construction: the emitted VALUES. Each step floors once
  * on non-negative operands, exactly as the DECIMAL chain and the DuckDB
  * HUGEINT mirror do — pinned by NegLog2FpSpec's BigInt differential
  * sweep and by the standing ScaleOps30Spec scalar law, so q190/q191/
  * q192 results, tertile boundaries, and persisted boundary artifacts
  * are all byte-identical to the r16 build (no artifact re-salt needed).
  *
  * Input domain: r ∈ [1, 2⁶²] (the ratio step's GREATEST(…, 1) floor and
  * p ≤ 1 bound). Defensively clamps r < 1 to 1 — the same floor the
  * ratio applies — so the function is total on LongType. NULL → NULL. */
case class NegLog2Fp(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  // AbstractDataType is private[sql]; the inferred Seq[LongType.type]
  // conforms to the ImplicitCastInputTypes signature
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "neg_log2_fp"

  override def nullSafeEval(input: Any): Any =
    NegLog2Fp.compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import NegLog2Fp.{FracBits, MShift, PreShift}
    val r = ctx.freshName("r")
    val e = ctx.freshName("e")
    val m = ctx.freshName("m")
    val fr = ctx.freshName("frac")
    val i = ctx.freshName("i")
    val mm = ctx.freshName("mm")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |long $r = ($c) < 1L ? 1L : ($c);
         |int $e = 63 - java.lang.Long.numberOfLeadingZeros($r);
         |long $m = ($e >= $MShift) ? ($r >>> ($e - $MShift))
         |                          : ($r << ($MShift - $e));
         |long $fr = 0L;
         |for (int $i = 1; $i <= $FracBits; $i++) {
         |  long $mm = ($m * $m) >>> $MShift;
         |  if ($mm >= ${1L << (MShift + 1)}L) {
         |    $fr += 1L << ($FracBits - $i);
         |    $mm >>>= 1;
         |  }
         |  $m = $mm;
         |}
         |${ev.value} = (${PreShift}L - $e) * ${1L << FracBits}L - $fr;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NegLog2Fp =
    copy(child = newChild)
}

object NegLog2Fp {

  /** Ratio scale: r = num·2⁶² div den (p = num/den ≤ 1 ⇒ r ≤ 2⁶²). */
  val PreShift = 62

  /** Mantissa scale: m ∈ [2³¹, 2³²). m² < 2⁶⁴ rides the unsigned low
    * 64 bits exactly, which is the whole reason this can be plain-long. */
  val MShift = 31

  /** Truncated fractional bits of the fixed point (granularity 2⁻²⁰). */
  val FracBits = 20

  /** Interpreted twin of the generated loop — same ops, same order. */
  def compute(rIn: Long): Long = {
    val r = if (rIn < 1L) 1L else rIn
    val e = 63 - java.lang.Long.numberOfLeadingZeros(r)
    var m = if (e >= MShift) r >>> (e - MShift) else r << (MShift - e)
    var frac = 0L
    var i = 1
    while (i <= FracBits) {
      var mm = (m * m) >>> MShift
      if (mm >= (1L << (MShift + 1))) {
        frac += 1L << (FracBits - i)
        mm >>>= 1
      }
      m = mm
      i += 1
    }
    (PreShift.toLong - e) * (1L << FracBits) - frac
  }

  /** Column API (classic-session Expression↔Column bridge). */
  def neg_log2_fp(c: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(NegLog2Fp(GraftSqlBridge.expression(c)))
  }

  /** SQL registration: SELECT neg_log2_fp(col). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "neg_log2_fp", exprs => NegLog2Fp(exprs.head), "built-in")
}
