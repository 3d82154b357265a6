package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType) embedding columns, built from
  * codegen'd higher-order functions (no UDFs — SURVEY north-star scale
  * layer). Accumulation is an in-order left fold in DOUBLE, which makes
  * results bit-reproducible (and bit-identical to an oracle computing
  * float64 in array order). */
object VectorFunctions {

  /** Σ aᵢ·bᵢ — each float widened to double BEFORE the multiply. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Σ aᵢ² */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))

  def norm(a: Column): Column = sqrt(normSq(a))

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
    * an embedding: bit p = sign(Σ_d v[d]·h(p,d)). Used by the LSH ANN path. */
  def rpBucket(vec: Column, nBits: Int): Column = {
    val bits = (0 until nBits).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, i) => v.cast("double") * hyperplaneSign(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
