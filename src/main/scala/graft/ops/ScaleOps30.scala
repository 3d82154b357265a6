package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Relational.t

/** Round-15 batch 30: EXACT FIXED-POINT LOG₂ scoring — perplexity-domain
  * document ranking with no libm anywhere (q190). The ablation spec
  * (LmAblationSpec) pinned WHY this exists: the engine's `score_fp`
  * (arithmetic mean of bigram probabilities) rank-correlates only
  * ~0.94–0.96 with CCNet's perplexity (geometric mean), and ~16% of
  * documents change TERTILE — material for a mix that cuts on tertiles.
  * `log` is the one operation the exact-integer discipline couldn't
  * reach; this batch builds it from integer ops both engines share:
  *
  *   1. ratio:    r = max(⌊num·2⁶² / den⌋, 1)   — p = num/den ≤ 1 always
  *                (cx ≥ cxy prefix totals, kV ≥ k), so r ∈ [1, 2⁶²];
  *                probabilities below 2⁻⁶² clamp to the floor (reachable
  *                only past den/num > 2⁶², documented);
  *   2. exponent: e = ⌊log₂ r⌋ = length(bin(r)) − 1  — the q145/q157
  *                bit-length staircase, exact in both engines;
  *   3. mantissa: m₀ = ⌊r·2³¹ / 2ᵉ⌋ ∈ [2³¹, 2³²) — normalize once;
  *   4. bits:     [[Q190FracBits]] rounds of the classic square-and-
  *                compare: mmᵢ = ⌊mᵢ₋₁² / 2³¹⌋; bit i = [mmᵢ ≥ 2³²];
  *                mᵢ = bit ? mmᵢ/2 : mmᵢ — each step floors once, so
  *                the bit string is the TRUNCATED binary expansion of
  *                the fractional part, identical on any engine;
  *   5. value:    −log₂ p ×2²⁰ = (62 − e)·2²⁰ − Σ bitᵢ·2²⁰⁻ⁱ ≥ 0 —
  *                every operand non-negative, so `div`/`//` agree.
  *
  * Approximation error ≤ 2⁻²⁰ (truncated bits) + 2⁻³¹ (ratio floor) per
  * bigram — ~1e-6, the same granularity as the 10⁻⁶ probability fixed
  * point, and differentially pinned against Math.log in the spec. The
  * per-document score is the mean: plx_fp = ⌊Σ(−log₂ pᵢ ×2²⁰) / n⌋ —
  * the log₂-perplexity in 2⁻²⁰ fixed point; HIGH plx = the tail CCNet
  * audits.
  *
  * Engine-shape note: the 20-round chain must NOT be expressed through
  * lateral column aliases / collapsed projections — each round
  * references its predecessor twice, so inlining re-expands the
  * expression tree exponentially (measured: DuckDB hangs at F=8
  * laterally; one generated CTE per round is 0.03 s at F=20). The
  * MIRROR therefore keeps one CTE level per round. The Spark side
  * (r17) runs the whole chain inside ONE custom Catalyst expression,
  * [[graft.functions.NegLog2Fp]] — a codegen'd plain-long loop
  * (m < 2³² ⇒ m² is exact in the unsigned low 64 bits, so no
  * DECIMAL(38,0) rides the hot path and there is no alias tower for
  * the planner to inline; the r16 planner-blow-up hazard is gone
  * structurally, values bit-identical by the Spec's BigInt sweep).
  *
  * Scale shape: q183's exactly — the same two co-partitioned model
  * joins, then the log₂ chain as a PURE MAP over the joined stream
  * (zero extra exchanges), one per-doc rollup, distributed top-K. */
object ScaleOps30 {

  /** How many highest-perplexity documents q190 surfaces. */
  val Q190TopK = 15

  /** Fractional bits of the fixed-point log₂ (canonical constant lives
    * with the kernel expression, [[graft.functions.NegLog2Fp]]). */
  val Q190FracBits: Int = graft.functions.NegLog2Fp.FracBits

  // ratio scale: r = num·2^62 div den / mantissa scale: m ∈ [2^31, 2^32)
  private[ops] val PreShift: Int = graft.functions.NegLog2Fp.PreShift
  private[ops] val MShift: Int = graft.functions.NegLog2Fp.MShift

  /** CASE-form 2^e for e ∈ [0, 62] — generated once, evaluated verbatim
    * by both engines (no float pow round-trip). */
  private def pow2CaseSql(v: String): String =
    (0 to 62).map(k => s"WHEN $v = $k THEN ${1L << k}")
      .mkString("CASE ", " ", " END")

  private[ops] def fracSum: String =
    (1 to Q190FracBits).map(i => s"b$i * ${1L << (Q190FracBits - i)}")
      .mkString(" + ")

  /** Library surface: score ANY document frame against an add-k bigram
    * model in the LOG domain — (idCol, n_bigrams, n_oov, plx_fp) per
    * ≥2-token document, plx_fp = mean −log₂ p at 2⁻²⁰ fixed point. The
    * probability arithmetic (num, den, k, V-literal) is byte-for-byte
    * [[ScaleOps27.scoreDocsWithLm]]'s; only the collapse differs.
    *
    * Overflow bound, documented rather than guarded (r15 advice): the
    * ratio numerator (cxy·10⁶ + k)·2⁶² rides DECIMAL(38,0), which
    * overflows to NULL at cxy ≳ 2.2·10¹³ — there `GREATEST(NULL, 1)`
    * silently floors the bigram to max perplexity while the DuckDB
    * HUGEINT mirror stays exact. Unreachable in practice: one bigram
    * repeated 22 trillion times in the training slice means ≳ 4·10¹⁴
    * bytes of that single pair — beyond a 100 TB corpus even if it
    * contained nothing else. A guard would cost a max(cxy) scan of the
    * pair table per score call; if corpora ever approach the bound,
    * assert it once at train time instead.
    *
    * Lazy like the arithmetic/KN kernels (r17): the r16 eager `take(1)`
    * degenerate-input guard is GONE — it existed because a runtime-empty
    * bigram stream let AQE's empty propagation strand the 20
    * multiply-referencing projection levels on a LocalRelation where the
    * physical project-collapse inlined them into a ~2²⁰-node tree
    * (planning >30 min). The chain now lives inside the single
    * [[graft.functions.NegLog2Fp]] expression, so there is nothing to
    * inline: an all-single-token micro-batch plans linearly and returns
    * empty (drilled in ScaleOps30Spec and DegenerateInputSpec). That
    * also lifts the r16 caller restriction — no per-call extra source
    * scan, and the kernel no longer throws if handed an unmaterialized
    * streaming frame (call sites still score through foreachBatch for
    * semantics, not for survival). */
  def scoreDocsWithLmLog2(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, v: Long): DataFrame = {
    require(v >= 1, s"scoreDocsWithLmLog2: vocabulary size must be >= 1, got $v")
    val kFp = ScaleOps24.Q175KFp
    val ctx = pairs.groupBy(col("w1")).agg(sum(col("cxy")).as("cx"))
    ScaleOps27.bigramsOf(docs, idCol, textCol)
      .join(pairs, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .withColumn("cxy", coalesce(col("cxy"), lit(0L)))
      .withColumn("cx", coalesce(col("cx"), lit(0L)))
      .withColumn("r", expr(
        s"GREATEST(CAST(((CAST(cxy AS DECIMAL(38,0)) * 1000000 + $kFp) * ${1L << PreShift}) " +
          s"div (CAST(cx AS DECIMAL(38,0)) * 1000000 + CAST($kFp AS DECIMAL(38,0)) * $v) " +
          s"AS BIGINT), CAST(1 AS BIGINT))"))
      .withColumn("lneg",
        graft.functions.NegLog2Fp.neg_log2_fp(col("r")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum((col("cxy") === 0L).cast("long")).as("n_oov"),
        sum(col("lneg")).as("sl"))
      .withColumn("plx_fp", expr("CAST(sl div n_bigrams AS BIGINT)"))
      .select(col("doc_id").as(idCol),
        col("n_bigrams").cast("long").as("n_bigrams"),
        col("n_oov").cast("long").as("n_oov"), col("plx_fp"))
  }

  /** q190: PERPLEXITY-RANKED reference-LM scoring — q183's protocol
    * (train add-k on the `lang = 'en'` slice, score everyone) collapsed
    * in the LOG domain: surface the [[Q190TopK]] HIGHEST-perplexity
    * documents (plx desc, doc_id) — the tail a CCNet mix audits, ranked
    * the way CCNet actually ranks it. q183 vs q190 on one corpus IS the
    * pinned ablation, now with both rankings oracle-checked. */
  def q190LogPerplexityScore(s: SparkSession, dir: String): DataFrame = {
    val (v, _) = ScaleOps27.refSigOf(s, dir)
    if (v == 0L)
      return s.range(0).select(col("id").as("doc_id"), lit("").as("lang"),
        col("id").as("n_bigrams"), col("id").as("n_oov"),
        col("id").as("plx_fp"))
    scoreDocsWithLmLog2(Relational.fanOut(t(s, dir, "documents")),
        "doc_id", "text", ScaleOps27.refPairs(s, dir), v)
      .join(t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("lang")),
        Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("n_oov"),
        col("plx_fp"))
      .orderBy(col("plx_fp").desc, col("doc_id"))
      .limit(Q190TopK)
  }

  /** The shared per-document log₂ CTE chain, ending in
    * `plx(doc_id, lang, n_bigrams, n_oov, plx_fp)` — q183's reference
    * slice and probability operands, the same ratio/exponent/mantissa
    * normalization, and the same 20 square-and-compare rounds — ONE CTE
    * LEVEL PER ROUND (see the object doc: a lateral-alias form
    * re-expands exponentially). Every operand non-negative, so `//`
    * agrees with `div` everywhere. Shared by q190 (the top-K readout)
    * and q191/q192 (the full log-domain CCNet disposition,
    * [[ScaleOps31]]) so the log-ranking arms pin identical scoring
    * arithmetic. */
  private[ops] val log2DocCtes: String = {
    val rounds = (1 to Q190FracBits).map { i =>
      val pm = s"m${i - 1}"
      s"""s${i}p AS (
         |  SELECT *, CAST((CAST($pm AS HUGEINT) * $pm) // ${1L << MShift} AS BIGINT) AS mm$i
         |  FROM s${i - 1}
         |), s$i AS (
         |  SELECT *, CASE WHEN mm$i >= ${1L << 32} THEN 1 ELSE 0 END AS b$i,
         |    CASE WHEN mm$i >= ${1L << 32} THEN mm$i // 2 ELSE mm$i END AS m$i
         |  FROM s${i}p
         |)""".stripMargin
    }.mkString(",\n")
    raw"""toks AS (
      |  SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
      |    regexp_split_to_array(trim(lower(text)), '\s+') AS ts
      |  FROM documents
      |), bi AS (
      |  SELECT doc_id, lang, ts[g] AS w1, ts[g + 1] AS w2 FROM (
      |    SELECT doc_id, lang, ts, unnest(generate_series(1, len(ts) - 1)) AS g
      |    FROM toks WHERE len(ts) >= 2)
      |  WHERE len(ts[g]) >= 1 AND len(ts[g + 1]) >= 1
      |), ref_bi AS (
      |  SELECT w1, w2, COUNT(*) AS cxy FROM bi WHERE lang = '${ScaleOps27.RefLang}'
      |  GROUP BY w1, w2
      |), ctx AS (
      |  SELECT w1, SUM(cxy) AS cx FROM ref_bi GROUP BY w1
      |), vocab AS (
      |  SELECT COUNT(DISTINCT tok) AS vv FROM (
      |    SELECT unnest(ts) AS tok FROM toks WHERE lang = '${ScaleOps27.RefLang}')
      |  WHERE len(tok) >= 1
      |), held AS (
      |  SELECT h.doc_id, h.lang, COALESCE(tb.cxy, 0) AS cxy,
      |    COALESCE(c.cx, 0) AS cx, v.vv
      |  FROM bi h
      |  LEFT JOIN ref_bi tb ON h.w1 = tb.w1 AND h.w2 = tb.w2
      |  LEFT JOIN ctx c ON h.w1 = c.w1
      |  CROSS JOIN vocab v
      |  WHERE v.vv >= 1
      |), rr AS (
      |  SELECT doc_id, lang, cxy,
      |    GREATEST(CAST(((CAST(cxy AS HUGEINT) * 1000000 + ${ScaleOps24.Q175KFp}) * ${1L << PreShift})
      |      // (CAST(cx AS HUGEINT) * 1000000 + ${ScaleOps24.Q175KFp}::HUGEINT * vv) AS BIGINT),
      |      CAST(1 AS BIGINT)) AS r
      |  FROM held
      |), s0 AS (
      |  SELECT doc_id, lang, cxy, r,
      |    CAST(length(bin(r)) - 1 AS BIGINT) AS e,
      |    CAST((CAST(r AS HUGEINT) * ${1L << MShift}) // (${pow2CaseSql("CAST(length(bin(r)) - 1 AS BIGINT)")}) AS BIGINT) AS m0
      |  FROM rr
      |),
      |$rounds,
      |plx AS (
      |  SELECT doc_id, lang,
      |    CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |    CAST(SUM(CASE WHEN cxy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |    CAST(SUM(($PreShift - e) * ${1L << Q190FracBits} - ($fracSum)) // COUNT(*) AS BIGINT) AS plx_fp
      |  FROM s$Q190FracBits GROUP BY doc_id, lang
      |)""".stripMargin
  }

  /** Mirror: the shared chain + the top-K readout. */
  val q190Sql: String =
    raw"""WITH $log2DocCtes
      |SELECT doc_id, lang, n_bigrams, n_oov, plx_fp FROM plx
      |ORDER BY plx_fp DESC, doc_id LIMIT ${Q190TopK}""".stripMargin
}
