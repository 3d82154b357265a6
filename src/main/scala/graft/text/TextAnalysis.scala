package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline layer: token
  * counting, language ID (stopword heuristic), quality scoring, document
  * fingerprinting. All pure column expressions (codegen'd, no UDFs), so
  * they ride whole-stage codegen over a 100 TB documents table. */
object TextAnalysis {

  /** Whitespace tokenization over the trimmed, lowercased text.
    *
    * PERF NOTE: higher-order functions are interpreted (not codegen'd) and
    * re-evaluate nested subtrees; project this ONCE into a column and feed
    * the `...Of(toks)` variants below — measured 6x+ faster at sf0.1 than
    * nesting the split inside each consumer. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))
  def tokenCountOf(toks: Column): Column = size(toks)

  /** NON-EMPTY whitespace-token count as a LONG — the batching/planning
    * family's shared length kernel (q165/q166 docLengths, q168/q173
    * per-source totals, q169 shards): `split` of an all-whitespace doc
    * yields [""], which must count 0 — exactly the SQL mirrors'
    * `len(list_filter(..., t -> len(t) >= 1))`. One definition so the
    * empty-token rule can never drift between consumers. */
  def nonEmptyTokenCount(text: Column): Column =
    size(filter(tokens(text), tk => length(tk) >= 1)).cast("long")

  /** BPE-ish subword count approximation: whitespace tokens plus an extra
    * unit per 6 chars of long words (a cheap stand-in for byte-pair merges;
    * deterministic and shuffle-free). */
  def approxBpeCount(text: Column): Column = approxBpeCountOf(tokens(text))
  def approxBpeCountOf(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => acc + greatest(lit(1L), ceil(length(t) / lit(6.0)).cast("long")))

  // --- language ID -------------------------------------------------------

  /** Tiny per-language stopword lists (public common-words lists). The
    * classifier is argmax of stopword hits with a fixed preference order on
    * ties — deterministic, SQL-mirrorable. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "se", "las"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est", "un", "une", "du", "que"))

  def stopwordHits(text: Column, lang: String): Column =
    stopwordHitsOf(tokens(text), lang)
  def stopwordHitsOf(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isin(Stopwords(lang): _*)))

  /** Predicted language: argmax over stopword hits, ties resolved by the
    * fixed order en > es > de > fr; no hits at all ⇒ 'und' (undetermined). */
  def langId(text: Column): Column = langIdOf(tokens(text))
  def langIdOf(toks: Column): Column = {
    val en = stopwordHitsOf(toks, "en")
    val es = stopwordHitsOf(toks, "es")
    val de = stopwordHitsOf(toks, "de")
    val fr = stopwordHitsOf(toks, "fr")
    when(en === 0 && es === 0 && de === 0 && fr === 0, lit("und"))
      .when(en >= es && en >= de && en >= fr, lit("en"))
      .when(es >= de && es >= fr, lit("es"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  // --- quality scoring ---------------------------------------------------

  /** Component signals (all double, deterministic arithmetic order):
    * alphaRatio = alphabetic+space chars / chars;
    * stopRatio  = english stopword hits / tokens;
    * avgWordLen = chars / tokens. */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(lower(text), "[^a-z ]", "")).cast("double") /
      length(text).cast("double")

  def stopRatio(text: Column): Column = stopRatioOf(text, tokens(text))
  def stopRatioOf(text: Column, toks: Column): Column =
    stopwordHitsOf(toks, "en").cast("double") / size(toks).cast("double")

  def avgWordLen(text: Column): Column = avgWordLenOf(text, tokens(text))
  def avgWordLenOf(text: Column, toks: Column): Column =
    length(text).cast("double") / size(toks).cast("double")

  /** Composite quality score in [0,1]: weighted mix of alpha ratio, English
    * stopword density (capped), and a word-length sweet-spot term. The
    * exact weights are engine policy (the capability is the scoring
    * pipeline, not the constants). */
  def qualityScore(text: Column): Column = qualityScoreOf(text, tokens(text))
  def qualityScoreOf(text: Column, toks: Column): Column =
    lit(0.4) * alphaRatio(text) +
      lit(0.3) * least(stopRatioOf(text, toks) * 4.0, lit(1.0)) +
      lit(0.3) * least(avgWordLenOf(text, toks) / 8.0, lit(1.0))

  // --- fingerprinting ----------------------------------------------------

  /** Order-sensitive rolling document fingerprint: left fold of
    * acc' = rotl(acc, 5) XOR fnv1a64(token). Pure mod-2^64 integer ops —
    * the same document fingerprints identically on ANY engine (the DuckDB
    * oracle re-derives it in SQL) — and position-sensitive (permuted docs
    * differ), unlike a bag hash. One tight codegen'd loop per row
    * (functions.Fingerprint64), not an interpreted HOF. */
  def fingerprint(text: Column): Column = fingerprintOf(tokens(text))
  def fingerprintOf(toks: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge._
    column(graft.functions.Fingerprint64(expression(toks)))
  }

  /** Order-insensitive content hash (bag-of-tokens): sum of token hashes
    * folded into [0, 2^31) so a billion-token document cannot overflow
    * Long. Near-dup candidate key where token order noise is irrelevant.
    * Engine-portable like [[fingerprint]]. */
  def bagHash(text: Column): Column = bagHashOf(tokens(text))
  def bagHashOf(toks: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge._
    column(graft.functions.BagHash64(expression(toks)))
  }

  // --- repetition signals ------------------------------------------------

  /** Gopher-style repetition signals (published quality filters for
    * LLM training corpora): duplicate-token fraction and the fraction of
    * tokens covered by the most frequent adjacent 2-gram. Highly
    * repetitious documents (boilerplate, template spam, generation loops)
    * score high on both. Pure per-row map — scan-parallel at any scale;
    * integer cores are exact, fractions are single IEEE divisions, so the
    * DuckDB oracle matches bit-for-bit. */
  def dupTokenFrac(toks: Column): Column =
    lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks).cast("double")

  def topBigramFrac(toks: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge._
    val cnt = column(graft.functions.TopBigramCount(expression(toks)))
    when(size(toks) < 2, lit(0.0))
      .otherwise(lit(2.0) * cnt.cast("double") / size(toks).cast("double"))
  }

  /** Both repetition cores from ONE kernel pass
    * (functions.RepetitionStats, struct<n_distinct, top_bigram>): project
    * this once, then derive the fractions with [[dupTokenFracFrom]] /
    * [[topBigramFracFrom]]. Value-identical to
    * [[dupTokenFrac]]+[[topBigramFrac]] but walks the token array once
    * instead of twice and never materializes the distinct array. */
  def repetitionStatsOf(toks: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge._
    column(graft.functions.RepetitionStats(expression(toks)))
  }

  def dupTokenFracFrom(rep: Column, toks: Column): Column =
    lit(1.0) - rep.getField("n_distinct").cast("double") / size(toks).cast("double")

  def topBigramFracFrom(rep: Column, toks: Column): Column =
    when(size(toks) < 2, lit(0.0))
      .otherwise(lit(2.0) * rep.getField("top_bigram").cast("double") / size(toks).cast("double"))

  // --- PII detection / redaction -----------------------------------------

  /** PII patterns, ordered by redaction precedence (SSN before phone so
    * the 3-2-4 digit shape is not half-eaten by the phone rule). All
    * patterns use only syntax with IDENTICAL semantics in Java regex and
    * RE2 (no lookaround/backrefs; `\b` is the ASCII word boundary in
    * both), so the DuckDB oracle mirrors them verbatim — a redaction
    * decision made by this engine is reproducible anywhere. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "ssn"   -> raw"\b\d{3}-\d{2}-\d{4}\b",
    "email" -> raw"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b",
    "phone" -> raw"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4"  -> raw"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b")

  /** Count of non-overlapping matches of one PII class. */
  def piiCount(text: Column, kind: String): Column =
    regexp_count(text, lit(PiiPatterns.toMap.apply(kind)))

  /** Text with every PII class replaced by its `[KIND]` placeholder, in
    * [[PiiPatterns]] order. Pure per-row map — scan-parallel at any scale. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (kind, pat)) =>
      regexp_replace(c, pat, s"[${kind.toUpperCase}]")
    }

  /** Full per-document text profile used by pipeline consumers. */
  def profile(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__toks", tokens(col(textCol)))
      .select(
        col("*"),
        tokenCountOf(col("__toks")).as("n_tokens"),
        approxBpeCountOf(col("__toks")).as("n_bpe_units"),
        langIdOf(col("__toks")).as("lang_pred"),
        qualityScoreOf(col(textCol), col("__toks")).as("quality"),
        fingerprintOf(col("__toks")).as("fingerprint"))
      .drop("__toks")
}
