package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document signature kernels.
  *
  * SimHash and MinHash signatures are pure per-row functions of the token
  * array, so they do NOT need the explode + groupBy shuffle the exploded
  * formulation uses: these expressions compute the whole signature in one
  * tight loop inside the scan stage (map-side at any scale — the only
  * shuffle left in the LSH pipelines is the band-bucket candidate join).
  *
  * Hash scheme matches the previous exploded formulation exactly:
  * token/shingle hash = xxhash64(string) (XXH64 over UTF-8 bytes, seed 42);
  * minhash slot s = xxhash64(s, shingleHash) = hashLong(h, hashInt(s, 42)).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(a: Any): Any =
    TextHashKernels.simhash(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = TextHashKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$k.simhash($a)")
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

case class MinHashSig(child: Expression, k: Int, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(a: Any): Any =
    TextHashKernels.minhashSig(a.asInstanceOf[ArrayData], k, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kn = TextHashKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$kn.minhashSig($a, $k, $numHashes)")
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

object TextHashKernels {

  private def hashUtf8(s: UTF8String): Long = XXH64.hashUTF8String(s, 42L)

  /** 64-bit SimHash over the token array (duplicates weighted, matching the
    * exploded groupBy formulation). */
  def simhash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counters = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hashUtf8(tokens.getUTF8String(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  // memoized per-slot seed hashes: seedHash(s) = hashInt(s, 42)
  @volatile private var seedCache: Array[Long] = Array.empty
  private def seeds(n: Int): Array[Long] = {
    var c = seedCache
    if (c.length < n) {
      c = Array.tabulate(n)(s => XXH64.hashInt(s, 42L))
      seedCache = c
    }
    c
  }

  /** MinHash signature over k-word shingles of the token array. Shingle
    * construction mirrors Dedup.shinglesOf: windows of k tokens joined by
    * a single space; fewer than k tokens ⇒ one shingle of all tokens.
    * (min per slot is unaffected by duplicate shingles, so no distinct.) */
  def minhashSig(tokens: ArrayData, k: Int, numHashes: Int): ArrayData = {
    val n = tokens.numElements()
    val seedArr = seeds(numHashes)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val nShingles = math.max(n - k, 0) + 1
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < nShingles) {
      val end = math.min(i + k, n)
      val parts = new Array[UTF8String](end - i)
      var j = i
      while (j < end) { parts(j - i) = tokens.getUTF8String(j); j += 1 }
      val h = hashUtf8(UTF8String.concatWs(sep, parts: _*))
      var s = 0
      while (s < numHashes) {
        val v = XXH64.hashLong(h, seedArr(s))
        if (v < sig(s)) sig(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}
