package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-group top-k as a custom Catalyst aggregate — the one operator family
  * where composition measurably loses at scale: the window formulation
  * (`row_number over (partition by g order by key desc)` + filter) shuffles
  * EVERY row to its group's reducer and fully sorts each group, when only k
  * survivors matter. This aggregate keeps a bounded buffer of k (key, id)
  * pairs, so the map-side partial already discards everything below the
  * local top-k — at 100 TB the exchange carries `groups x k` rows instead
  * of the whole fact table, and no sort ever exceeds k elements.
  *
  * Ordering: key DESC, id ASC (full tie-break, deterministic for unique
  * ids). Output: array<struct<key double, id long>> best-first.
  *
  * Plan shape: ObjectHashAggregate(partial) -> exchange -> (final), the
  * standard TypedImperativeAggregate pipeline (asserted in
  * GroupedTopKSpec). */
case class GroupedTopK(
    keyExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"k must be positive, got $k")

  // Analysis-time rejection instead of executor ClassCastException when
  // constructed with an INT/FLOAT key or INT id (the SQL builder in
  // GraftExtensions inserts coercing Casts before this check runs).
  override def checkInputDataTypes(): TypeCheckResult =
    if (keyExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"grouped_top_k: key must be DOUBLE, got ${keyExpr.dataType.sql}")
    else if (idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"grouped_top_k: id must be BIGINT, got ${idExpr.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(keyExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "grouped_top_k"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val kv = keyExpr.eval(input)
    val iv = idExpr.eval(input)
    if (kv != null && iv != null)
      b.offer(kv.asInstanceOf[Double], iv.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { b.offer(other.keys(i), other.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKBuffer): Any = {
    val sorted = b.sortedIndices
    new GenericArrayData(sorted.map { i =>
      InternalRow(b.keys(i), b.ids(i)): Any
    })
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.size * 16)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putDouble(b.keys(i)); bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKBuffer(k)
    var i = 0
    while (i < n) { b.offer(bb.getDouble, bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): GroupedTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GroupedTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GroupedTopK =
    copy(keyExpr = newChildren(0), idExpr = newChildren(1))
}

/** Bounded buffer of the k best (key, id) pairs under (key DESC, id ASC).
  * Flat parallel arrays, no per-element allocation; the worst slot is
  * tracked so the common no-op case (incoming row worse than everything
  * kept) is a single comparison. */
final class TopKBuffer(k: Int) {
  val keys = new Array[Double](k)
  val ids = new Array[Long](k)
  var size: Int = 0
  private var worst: Int = -1 // index of the current worst kept pair

  /** a is strictly better than b under (key DESC, id ASC). Total order via
    * java.lang.Double.compare: NaN sorts greatest, matching Spark's DESC
    * ordering of the window formulation this aggregate replaces (zero-norm
    * vectors yield cos = 0/0 = NaN and must rank identically either way). */
  @inline private def better(ka: Double, ia: Long, kb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(ka, kb)
    if (c != 0) c > 0 else ia < ib
  }

  private def recomputeWorst(): Unit = {
    var w = 0
    var i = 1
    while (i < size) {
      if (better(keys(w), ids(w), keys(i), ids(i))) w = i
      i += 1
    }
    worst = w
  }

  def offer(key: Double, id: Long): Unit = {
    if (size < k) {
      keys(size) = key; ids(size) = id; size += 1
      if (size == k) recomputeWorst()
    } else if (better(key, id, keys(worst), ids(worst))) {
      keys(worst) = key; ids(worst) = id
      recomputeWorst()
    }
  }

  /** Indices of kept pairs, best first. */
  def sortedIndices: Array[Int] =
    Array.range(0, size).sortWith((a, b) =>
      better(keys(a), ids(a), keys(b), ids(b)))
}
