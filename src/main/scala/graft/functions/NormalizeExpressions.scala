package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-normalization and character-statistics kernels.
  *
  * A multilingual ingest layer cannot treat text as opaque bytes: the same
  * user-visible string arrives in composed (NFC) and decomposed (NFD)
  * encodings depending on the source OS/editor, and exact-dedup or
  * key-matching must not split on that difference (the reference loads
  * text columns verbatim, file-to-sql-loader.py:519 — normalization is a
  * capability its RDBMS target would apply downstream; here it is a
  * first-class scan-stage kernel).
  *
  * All three are pure per-row functions: they run inside whole-stage
  * codegen in the scan stage, no shuffle, NULL-in/NULL-out. The Java
  * `java.text.Normalizer` implements the same Unicode normalization
  * algorithm (UAX #15) as DuckDB's utf8proc oracle, which is what makes
  * the q92 mirror exact.
  */
object NormalizeKernels {

  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))

  def nfd(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD))

  /** Accent strip = canonical decomposition, drop combining marks (Mn),
    * recompose what remains. Matches utf8proc/DuckDB `strip_accents` on
    * Latin text: 'á' → 'a', leaves base letters and non-mark codepoints
    * untouched. */
  def stripAccents(s: UTF8String): UTF8String = {
    val d = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(
      java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC))
  }

  /** Per-codepoint statistics in ONE pass: [total, distinct, Σ count²].
    * All-integer so the derived Gini diversity (total² − Σc²)/total² is a
    * single IEEE division of exact integers — bit-reproducible by any
    * engine (the q95 oracle re-derives it with unnest+GROUP BY).
    * ASCII fast path (dense array); general codepoints fall back to a
    * hash map, so the kernel is total on arbitrary Unicode. */
  def charStats(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, Long] = null
    var total = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (other == null) other = new java.util.HashMap[Integer, Long]()
        other.merge(cp, 1L, (a, b) => a + b)
      }
      total += 1L
      i += Character.charCount(cp)
    }
    var distinct = 0L
    var sumSq = 0L
    var c = 0
    while (c < 128) {
      val n = ascii(c)
      if (n > 0) { distinct += 1L; sumSq += n * n }
      c += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) { val n = it.next(); distinct += 1L; sumSq += n * n }
    }
    new GenericArrayData(Array(total, distinct, sumSq))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(s: Any): Any =
    NormalizeKernels.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = NormalizeKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, s => s"$k.nfc($s)")
  }
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
}

case class NfdNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfd_normalize"
  override def nullSafeEval(s: Any): Any =
    NormalizeKernels.nfd(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = NormalizeKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, s => s"$k.nfd($s)")
  }
  override protected def withNewChildInternal(c: Expression): NfdNormalize = copy(child = c)
}

case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"
  override def nullSafeEval(s: Any): Any =
    NormalizeKernels.stripAccents(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = NormalizeKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, s => s"$k.stripAccents($s)")
  }
  override protected def withNewChildInternal(c: Expression): StripAccents = copy(child = c)
}

/** [total_codepoints, distinct_codepoints, Σ per-codepoint count²] — the
  * exact-integer inputs of the Gini character-diversity quality signal. */
case class CharStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_stats"
  override def nullSafeEval(s: Any): Any =
    NormalizeKernels.charStats(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = NormalizeKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, s => s"$k.charStats($s)")
  }
  override protected def withNewChildInternal(c: Expression): CharStats = copy(child = c)
}
