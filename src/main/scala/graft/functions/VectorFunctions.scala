package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType) embedding columns, built from
  * codegen'd higher-order functions (no UDFs — SURVEY north-star scale
  * layer). Accumulation is an in-order left fold in DOUBLE, which makes
  * results bit-reproducible (and bit-identical to an oracle computing
  * float64 in array order). */
object VectorFunctions {

  private def br = org.apache.spark.sql.GraftSqlBridge

  /** Σ aᵢ·bᵢ — each float widened to double BEFORE the multiply; in-order
    * accumulation (custom codegen expression; see VectorExpressions). */
  def dot(a: Column, b: Column): Column =
    br.column(DotProduct(br.expression(a), br.expression(b)))

  /** Σ aᵢ² (custom codegen expression). */
  def normSq(a: Column): Column =
    br.column(NormSq(br.expression(a)))

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Σ aᵢ·bᵢ with float-typed `a` against a double-typed computed vector
    * `b` (a centroid); same in-order accumulation law. */
  def dotFD(a: Column, b: Column): Column =
    br.column(DotProductFD(br.expression(a), br.expression(b)))

  /** Σ aᵢ² over a double-typed computed vector. */
  def normSqD(a: Column): Column =
    br.column(NormSqD(br.expression(a)))

  /** cosine(a,b) = dot/(‖a‖·‖b‖); null-safe only in that Spark propagates
    * null arrays to null. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Deterministic pseudo-random hyperplane component for plane `p`,
    * dimension `d`: xxhash64 of the pair folded to ±1. No RNG state —
    * reproducible across executors and runs. */
  def hyperplaneSign(p: Int, d: Column): Column =
    when(pmod(xxhash64(lit(p), d), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))

  /** `nBits`-bit signed-random-projection (SimHash for vectors) bucket id of
    * an embedding: bit p = sign(Σ_d v[d]·h(p,d)). Custom codegen expression
    * with memoized hyperplane signs (identical bucket ids to the
    * declarative pmod(xxhash64(p,d),2) formulation). */
  def rpBucket(vec: Column, nBits: Int): Column =
    br.column(RpBucket(br.expression(vec), nBits))
}
