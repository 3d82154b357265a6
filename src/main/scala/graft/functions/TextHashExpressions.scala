package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document signature kernels.
  *
  * SimHash, MinHash, fingerprint and bag-hash are pure per-row functions
  * of the token array, so they do NOT need the explode + groupBy shuffle
  * the exploded formulation uses: these expressions compute the whole
  * signature in one tight loop inside the scan stage (map-side at any
  * scale — the only shuffle left in the LSH pipelines is the band-bucket
  * candidate join).
  *
  * Hash scheme: token/shingle hash = FNV-1a-64 over UTF-8 bytes — chosen
  * over xxhash64 because signatures must be ENGINE-PORTABLE: a dedup
  * decision made here must be reproducible by any system that can do
  * 64-bit integer arithmetic (the DuckDB oracles re-derive every value in
  * SQL, the same way q51's split hash is engine-invariant). MinHash slot
  * s remixes the shingle hash as ((h XOR seed_s) * FNV_PRIME) mod 2^64
  * with seed_s = (s+1) * 0x9E3779B97F4A7C15 (golden-ratio odd constant).
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

/** Order-sensitive rolling fingerprint: left fold over tokens of
  * acc' = rotl(acc, 5) XOR fnv1a64(token). One tight loop, no HOF. */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"
  override def nullSafeEval(a: Any): Any =
    TextHashKernels.fingerprint(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = TextHashKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$k.fingerprint($a)")
  }
  override protected def withNewChildInternal(c: Expression): Fingerprint64 = copy(child = c)
}

/** Order-insensitive bag-of-tokens hash: Σ (fnv1a64(token) unsigned-mod
  * (2^31 − 1)) — a billion-token document stays far below Long overflow. */
case class BagHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bag_hash64"
  override def nullSafeEval(a: Any): Any =
    TextHashKernels.bagHash(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = TextHashKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$k.bagHash($a)")
  }
  override protected def withNewChildInternal(c: Expression): BagHash64 = copy(child = c)
}

/** Distinct FNV-1a-64 hashes of the k-token shingles of a token array —
  * the join-key table for Jaccard/LSH computed in ONE loop: no
  * interpreted transform/array_distinct, and no shingle STRINGS ever
  * leave the expression (the exchange carries longs). Shingle
  * construction matches Dedup.shinglesOf: windows of k joined by one
  * space; fewer than k tokens ⇒ one shingle of all tokens. */
case class ShingleHashSet(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_set"
  override def nullSafeEval(a: Any): Any =
    TextHashKernels.shingleHashSet(a.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kn = TextHashKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$kn.shingleHashSet($a, $k)")
  }
  override protected def withNewChildInternal(c: Expression): ShingleHashSet = copy(child = c)
}

/** FNV-1a-64 of each ALIGNED NON-OVERLAPPING k-token chunk (stride k,
  * tail partial chunk included; chunks joined by one space) — the join
  * keys for chunk-level dedup computed in one loop. NOT distinct, unlike
  * [[ShingleHashSet]]: chunk dedup counts per-POSITION duplication, so a
  * doc repeating its own chunk contributes both positions. Chunk strings
  * never leave the expression — exchanges carry longs. */
case class ChunkHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "chunk_hashes"
  override def nullSafeEval(a: Any): Any =
    TextHashKernels.chunkHashes(a.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kn = TextHashKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$kn.chunkHashes($a, $k)")
  }
  override protected def withNewChildInternal(c: Expression): ChunkHashes = copy(child = c)
}

/** POSITIONAL sliding k-shingle hashes: fnv1a64 of tokens[i..i+k-1] for
  * every start position i (stride 1, FULL windows only — a window
  * shorter than k is not a k-shingle), in position order, duplicates
  * preserved. The per-position stream the exact-substring duplication
  * signal (q85) needs: [[ShingleHashSet]] deduplicates (Jaccard wants a
  * set), [[ChunkHashes]] strides by k (chunk dedup wants alignment);
  * span detection wants every position. Shingle strings never leave the
  * expression — downstream exchanges carry longs. */
case class SlidingShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sliding_shingle_hashes"
  override def nullSafeEval(a: Any): Any =
    TextHashKernels.slidingShingleHashes(a.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kn = TextHashKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$kn.slidingShingleHashes($a, $k)")
  }
  override protected def withNewChildInternal(c: Expression): SlidingShingleHashes = copy(child = c)
}

/** Count of the most frequent adjacent token 2-gram (0 for < 2 tokens) —
  * the exact integer core of the Gopher-style top-2-gram repetition
  * signal; the fraction is derived in column space so the kernel output
  * stays engine-comparable. */
case class TopBigramCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "top_bigram_count"
  override def nullSafeEval(a: Any): Any =
    TextHashKernels.topBigramCount(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = TextHashKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$k.topBigramCount($a)")
  }
  override protected def withNewChildInternal(c: Expression): TopBigramCount = copy(child = c)
}

/** Fused repetition-signal kernel: distinct-token count AND top-bigram
  * multiplicity in ONE pass over the token array, returned as
  * struct<n_distinct, top_bigram>. Replaces the two-expression form
  * (size(array_distinct(toks)) + TopBigramCount) that walked the array
  * twice and materialized the distinct array just to take its size.
  * Value-identical to the split form (distinct = binary string equality,
  * bigram histogram on exact strings), so oracle arithmetic is unchanged. */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_bigram", LongType, nullable = false)))
  override def prettyName: String = "repetition_stats"
  override def nullSafeEval(a: Any): Any =
    TextHashKernels.repetitionStats(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = TextHashKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, a => s"$k.repetitionStats($a)")
  }
  override protected def withNewChildInternal(c: Expression): RepetitionStats = copy(child = c)
}

object TextHashKernels {

  final val FnvOffset = -3750763034362895579L // 14695981039346656037 as signed
  final val FnvPrime = 1099511628211L
  final val Golden = -7046029254386353131L    // 0x9E3779B97F4A7C15 as signed

  /** FNV-1a 64 over the UTF-8 bytes. Java's wrapping long arithmetic IS
    * mod-2^64 unsigned arithmetic, so any engine with 64-bit (or wider)
    * integers reproduces this exactly — see the DuckDB HUGEINT mirrors. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * FnvPrime
      i += 1
    }
    h
  }

  private def hashUtf8(s: UTF8String): Long = fnv1a64(s)

  /** Rolling rotl(5)-XOR fold of token hashes (order-sensitive). */
  def fingerprint(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = ((acc << 5) | (acc >>> 59)) ^ fnv1a64(tokens.getUTF8String(i))
      i += 1
    }
    acc
  }

  /** Distinct fnv1a64(shingle) set, insertion-ordered. */
  def shingleHashSet(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val nShingles = math.max(n - k, 0) + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long](nShingles * 2)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < nShingles) {
      val end = math.min(i + k, n)
      val parts = new Array[UTF8String](end - i)
      var j = i
      while (j < end) { parts(j - i) = tokens.getUTF8String(j); j += 1 }
      seen.add(fnv1a64(UTF8String.concatWs(sep, parts: _*)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** Per-position fnv1a64(shingle) for FULL sliding k-token windows (see
    * [[SlidingShingleHashes]]); n tokens ⇒ max(n − k + 1, 0) hashes. */
  def slidingShingleHashes(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val nShingles = math.max(n - k + 1, 0)
    val out = new Array[Long](nShingles)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < nShingles) {
      val parts = new Array[UTF8String](k)
      var j = i
      while (j < i + k) { parts(j - i) = tokens.getUTF8String(j); j += 1 }
      out(i) = fnv1a64(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-position fnv1a64(chunk) for aligned k-token chunks (see
    * [[ChunkHashes]]); n tokens ⇒ ceil(n/k) chunks, 0 tokens ⇒ none
    * (unreachable from the tokenizer, which yields [""] for empty text). */
  def chunkHashes(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val nChunks = (n + k - 1) / k
    val out = new Array[Long](nChunks)
    val sep = UTF8String.fromString(" ")
    var c = 0
    while (c < nChunks) {
      val start = c * k
      val end = math.min(start + k, n)
      val parts = new Array[UTF8String](end - start)
      var j = start
      while (j < end) { parts(j - start) = tokens.getUTF8String(j); j += 1 }
      out(c) = fnv1a64(UTF8String.concatWs(sep, parts: _*))
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct-token count + top-bigram multiplicity in one loop (see
    * [[RepetitionStats]]). UTF8String equals/hashCode are byte-exact, so
    * the distinct count matches array_distinct's binary equality. */
  def repetitionStats(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    val seen = new java.util.HashSet[UTF8String](n * 2)
    val bigrams = new java.util.HashMap[String, Long]()
    var best = 0L
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      seen.add(t)
      if (prev != null) {
        val c = bigrams.merge(prev.toString + " " + t.toString, 1L, (a, b) => a + b)
        if (c > best) best = c
      }
      prev = t
      i += 1
    }
    new GenericInternalRow(Array[Any](seen.size.toLong, best))
  }

  /** Highest multiplicity among adjacent token 2-grams. String keys (not
    * hashes) so the count is exact and any engine's histogram agrees. */
  def topBigramCount(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    if (n < 2) return 0L
    val m = new java.util.HashMap[String, Long]()
    var best = 0L
    var i = 0
    while (i < n - 1) {
      val k = tokens.getUTF8String(i).toString + " " + tokens.getUTF8String(i + 1).toString
      val c = m.merge(k, 1L, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best
  }

  /** Σ (unsigned h mod 2147483647) over tokens (order-insensitive). */
  def bagHash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.remainderUnsigned(
        fnv1a64(tokens.getUTF8String(i)), 2147483647L)
      i += 1
    }
    acc
  }

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

  // per-slot seeds: seed_s = (s+1) * golden-ratio constant (odd ⇒ distinct,
  // well-mixed; engine-reproducible integer arithmetic)
  @volatile private var seedCache: Array[Long] = Array.empty
  private def seeds(n: Int): Array[Long] = {
    var c = seedCache
    if (c.length < n) {
      c = Array.tabulate(n)(s => (s + 1) * Golden)
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
        val v = (h ^ seedArr(s)) * FnvPrime
        if (v < sig(s)) sig(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}
