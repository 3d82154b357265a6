package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a string column against a driver-built
  * [[BloomFilter]] (spark-sketch). The filter object is embedded in the
  * expression and ships with the task closure — the per-row probe is a
  * ref-object call inside whole-stage codegen (the NearestCentroid
  * pattern), no UDF and no per-row allocation: UTF8String.getBytes feeds
  * mightContainBinary directly, byte-identical to the putString path the
  * builder used (both hash the UTF-8 bytes with the fixed-seed
  * Murmur3_x86_32 of spark-sketch — deterministic across JVMs and runs).
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override def nullSafeEval(v: Any): Any =
    filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.mightContainBinary(($c).getBytes());")
  }
  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

/** Long-key twin of [[BloomMightContain]]: probes a LongType column with
  * mightContainLong — matching the putLong path `df.stat.bloomFilter` uses
  * for long columns (both hash the raw long with spark-sketch's fixed-seed
  * Murmur3), so build and probe agree across JVMs and runs. Same codegen
  * shape: filter rides the task closure as a reference object, the probe
  * is one primitive call inside whole-stage codegen. */
case class BloomMightContainLong(child: Expression, filter: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"
  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }
  override protected def withNewChildInternal(c: Expression): BloomMightContainLong =
    copy(child = c)
}

object BloomFunctions {
  def mightContain(c: Column, bf: BloomFilter): Column =
    GraftSqlBridge.column(BloomMightContain(GraftSqlBridge.expression(c), bf))
  def mightContainLong(c: Column, bf: BloomFilter): Column =
    GraftSqlBridge.column(BloomMightContainLong(GraftSqlBridge.expression(c), bf))
}
