package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions at session build time —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  /** The engine's SQL function surface (also installable into an existing
    * session via [[registerAll]]). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("multi_format_timestamp"),
      info("multi_format_timestamp",
        "multi_format_timestamp(str) - first-match parse over the engine's 7 datetime patterns"),
      (exprs: Seq[Expression]) => MultiFormatTimestamp(exprs.head)),
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - float64 in-order dot product of float arrays"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))),
    (FunctionIdentifier("vec_norm_sq"),
      info("vec_norm_sq", "vec_norm_sq(a) - squared L2 norm of a float array"),
      (exprs: Seq[Expression]) => NormSq(exprs.head)),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)),
    (FunctionIdentifier("grouped_top_k"),
      info("grouped_top_k",
        "grouped_top_k(key, id, k) - aggregate: top-k (key,id) pairs per group, key DESC id ASC"),
      (exprs: Seq[Expression]) => {
        val k = exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"grouped_top_k: k must be an integer literal, got $other")
        }
        GroupedTopK(exprs(0), exprs(1), k)
      }))

  /** Install into an already-built session (extensions only run at session
    * construction). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
}
