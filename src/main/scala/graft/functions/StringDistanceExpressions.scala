package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Unrestricted Damerau–Levenshtein edit distance (insert / delete /
  * substitute / transpose, with edits allowed BETWEEN the transposed
  * characters — the da/db "last match" algorithm, not the cheaper
  * optimal-string-alignment restriction). Spark ships `levenshtein` but
  * nothing transposition-aware; fuzzy record linkage over human-typed
  * keys wants the transposition edit at cost 1.
  *
  * Variant pin: DuckDB's `damerau_levenshtein` is the same unrestricted
  * algorithm — fuzz-verified over 20k random pairs (DL("CA","ABC") = 2
  * where OSA gives 3) — which is what lets q119 carry a full oracle
  * mirror. One deliberate divergence: this expression is over Unicode
  * CODE POINTS; DuckDB's is over raw UTF-8 BYTES (dl('', 'a漢') = 4
  * there). They agree on all-ASCII inputs, which the q119 corpus is; the
  * code-point unit is the semantically right one for a text library.
  *
  * Scale: per-row O(|a|·|b|) with one short-lived int matrix — a pure
  * map, no shuffle, codegen'd like the codec kernels. */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringDistanceKernels.damerau(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = StringDistanceKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$k.damerau($a, $b)")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DamerauLevenshtein = copy(left = l, right = r)
}

object StringDistanceKernels {

  /** The classic da/db formulation (Lowrance–Wagner): d is (n+2)×(m+2)
    * with a sentinel row/column of maxdist; da[ch] = last row where `ch`
    * occurred in a; db = last column in this row where b matched a. The
    * transposition candidate d(k-1, l-1) + (i-k-1) + 1 + (j-l-1) charges
    * for the characters BETWEEN the transposed pair, which is exactly
    * what OSA cannot express. */
  def damerau(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Int, Int]()
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val k = da.getOrDefault(b(j - 1), 0)
        val l = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(a(i - 1), i)
      i += 1
    }
    d(n + 1)(m + 1)
  }
}
