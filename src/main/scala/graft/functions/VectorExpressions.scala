package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Custom codegen expressions for the embedding hot path.
  *
  * The declarative forms (zip_with + aggregate higher-order functions) are
  * interpreted per element; these replace them with tight JVM loops over
  * the ArrayData, keeping EXACTLY the same arithmetic: each element widened
  * float→double, accumulated in array order — so results stay
  * bit-identical to the DuckDB oracle (and to the HOF implementations). */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = VectorKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$k.dot($a, $b)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

case class NormSq(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm_sq"
  override def nullSafeEval(a: Any): Any =
    VectorKernels.normSq(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = VectorKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$k.normSq($a)")
  }
  override protected def withNewChildInternal(c: Expression): NormSq = copy(child = c)
}

/** Σ aᵢ·bᵢ where `a` is float-typed and `b` double-typed (a raw embedding
  * scored against a COMPUTED centroid, e.g. q113's Lloyd iteration) —
  * same in-order double accumulation as [[DotProduct]]. */
case class DotProductFD(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot_fd"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotFD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = VectorKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$k.dotFD($a, $b)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductFD =
    copy(left = l, right = r)
}

/** Σ aᵢ² over a DOUBLE-typed array (computed centroids). */
case class NormSqD(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm_sq_d"
  override def nullSafeEval(a: Any): Any =
    VectorKernels.normSqD(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = VectorKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$k.normSqD($a)")
  }
  override protected def withNewChildInternal(c: Expression): NormSqD = copy(child = c)
}

/** Random-hyperplane LSH bucket id. Hyperplane component (p, d) is the
  * xxhash64 chain hash(d, hash(p, 42)) folded to ±1 — identical to the
  * previous declarative `pmod(xxhash64(lit(p), d), 2)` formulation, so
  * bucket assignments are unchanged. Sign rows are memoized per dimension. */
case class RpBucket(child: Expression, nBits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rp_bucket"
  override def nullSafeEval(a: Any): Any =
    VectorKernels.rpBucket(a.asInstanceOf[ArrayData], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = VectorKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$k.rpBucket($a, $nBits)")
  }
  override protected def withNewChildInternal(c: Expression): RpBucket = copy(child = c)
}

object VectorKernels {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    acc
  }

  def normSqD(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = a.getDouble(i)
      acc += v * v
      i += 1
    }
    acc
  }

  def normSq(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = a.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    acc
  }

  // sign cache: signs(p)(d) for hyperplane p, dimension d — deterministic,
  // so a race on resize at worst recomputes identical values
  @volatile private var signCache: Array[Array[Double]] = Array.empty

  private def signs(p: Int, dims: Int): Array[Double] = {
    var cache = signCache
    if (cache.length <= p || cache(p) == null || cache(p).length < dims) {
      val grown = java.util.Arrays.copyOf(cache, math.max(cache.length, p + 1))
      val row = new Array[Double](dims)
      var d = 0
      val seedP = XXH64.hashInt(p, 42L)
      while (d < dims) {
        val h = XXH64.hashInt(d, seedP)
        // pmod(h, 2) == 0 -> +1 (pmod is non-negative, unlike %)
        row(d) = if (((h % 2) + 2) % 2 == 0) 1.0 else -1.0
        d += 1
      }
      grown(p) = row
      signCache = grown
      row
    } else cache(p)
  }

  /** The deterministic ±1 hyperplane sign matrix, exposed so SQL oracle
    * mirrors can inline it as literals (q24) — single source of truth
    * with the bucket kernel below. */
  def signMatrix(nBits: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(nBits)(p => signs(p, dims).take(dims))

  def rpBucket(a: ArrayData, nBits: Int): Long = {
    val n = a.numElements()
    var bucket = 0L
    var p = 0
    while (p < nBits) {
      val s = signs(p, n)
      var proj = 0.0
      var d = 0
      while (d < n) {
        proj += a.getFloat(d).toDouble * s(d)
        d += 1
      }
      if (proj >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}
