package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Relational.t

/** Round-12 batch 22: the data-selection arithmetic between corpus
  * statistics and a training run — bigram-LM document likelihood scoring
  * (q167, the CCNet-style "filter by language-model score" signal in
  * exact fixed point) and temperature-based source mixing with an exact
  * integer budget allocation (q168 — the T=2 sampling-weight scheme with
  * largest-remainder rounding, every step engine-exact). */
object ScaleOps22 {

  // --- bigram-LM document scoring (q167) ------------------------------------

  /** How many lowest-scoring documents q167 surfaces. */
  val Q167BottomK = 15

  /** q167: BIGRAM-LM DOCUMENT LIKELIHOOD scoring — the quality signal
    * LM-based filters (CCNet and successors) gate on, with the corpus
    * itself as the training text and every probability cleared to
    * integers (libm-free, the q153 discipline): train MLE bigram counts
    * c(w1,w2) and PREFIX totals ctx(w1) = Σ_w2 c(w1,w2) (the count of
    * positions where w1 HAS a successor — exactly the MLE denominator,
    * not the raw unigram count, which differs at document-final
    * tokens), score each adjacent bigram at p_fp = (10⁶·c(w1,w2)) div
    * ctx(w1) in DECIMAL(38) (10⁶·c exceeds int64 past ~9·10¹² pair
    * occurrences), and score a document as the integer mean of its
    * bigram scores. The [[Q167BottomK]] lowest-likelihood documents —
    * the filter candidates — surface with (score asc, doc_id) order.
    * Single-token documents carry no bigram and are out of scope (the
    * q150 sequence guard).
    *
    * Scale shape: one token-sized bigram partial agg; one vocab-sized
    * prefix rollup joined back to the bigram table (vocab²-bounded, the
    * q153 marginal-join shape); ONE token-sized equi-join of the
    * document bigram stream against the scored bigram table,
    * co-partitioned on (w1, w2); a per-doc partial agg; a distributed
    * TakeOrdered of [[Q167BottomK]] — no global window, no driver loop
    * (train and score are the same two scans fused by the shared
    * lineage). */
  /** The q167 MLE scoring chain WITHOUT the bottom-K cut: per ≥2-token
    * document (doc_id, n_bigrams, score_fp). Shared by q167 and q179 so
    * the corpus-LM semantics (prefix-total denominators, the DECIMAL(38)
    * fixed point, the integer mean) can never drift between the two. */
  private[ops] def mleDocScores(s: SparkSession, dir: String): DataFrame =
    mleDocScoresOf(Relational.fanOut(t(s, dir, "documents")))

  /** [[mleDocScores]] generalized over ANY document frame (r13 verdict
    * #1: the chain was corpus-table-bound, so the composed pipeline
    * could not reach it) — `docs` carries (`idCol` castable to BIGINT,
    * `textCol`); returns (doc_id, n_bigrams, score_fp) for every
    * ≥2-token document. Same exact chain, same scale shape; the caller
    * owns partitioning (the dir arm wraps the scan in fanOut, the
    * pipeline passes its checkpointed stage frame). */
  def mleDocScoresOf(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      graft.text.TextAnalysis.tokens(col(textCol)).as("ts"))
    val docBi = toks
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ts) - 1), " +
          "i -> named_struct('w1', element_at(ts, i), 'w2', element_at(ts, i + 1)))"))
        .as("b"))
      .filter(length(col("b.w1")) >= 1 && length(col("b.w2")) >= 1)
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      // materialized once (localCheckpoint): the count subtree and the
      // scored stream are SEPARATE consumers — the count rides its own
      // (w1,w2) exchange while the stream side joins the broadcast
      // scored table with no exchange at all, so nothing is shared and
      // the tokenize+explode kernel ran twice per query. ContextCleaner
      // frees the blocks with the returned plan.
      .localCheckpoint()
    val biCnt = docBi.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cxy"))
    val ctx = biCnt.groupBy(col("w1")).agg(sum(col("cxy")).as("cx"))
    val biScored = biCnt.join(ctx, Seq("w1"))
      .withColumn("p_fp", expr(
        "CAST((CAST(cxy AS DECIMAL(38,0)) * 1000000) div cx AS BIGINT)"))
      .select(col("w1"), col("w2"), col("p_fp"))
    docBi.join(biScored, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_fp")).as("sfp"))
      .withColumn("score_fp", expr("CAST(sfp div n_bigrams AS BIGINT)"))
      .select(col("doc_id"), col("n_bigrams").cast("long").as("n_bigrams"),
        col("score_fp"))
  }

  def q167BigramLmScore(s: SparkSession, dir: String): DataFrame =
    mleDocScores(s, dir)
      .orderBy(col("score_fp"), col("doc_id"))
      .limit(Q167BottomK)

  /** The q167 mirror's scoring chain (ends with `scored(doc_id,
    * n_bigrams, score_fp)`) — the shared SQL twin of [[mleDocScores]],
    * opened with WITH by both q167Sql and the q179 mirror. */
  private[ops] val mleScoreCtes: String =
    raw"""toks AS (
      |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    regexp_split_to_array(trim(lower(text)), '\s+') AS ts
      |  FROM documents
      |), doc_bi AS (
      |  SELECT doc_id, ts[g] AS w1, ts[g + 1] AS w2 FROM (
      |    SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS g
      |    FROM toks WHERE len(ts) >= 2)
      |  WHERE len(ts[g]) >= 1 AND len(ts[g + 1]) >= 1
      |), bi_cnt AS (
      |  SELECT w1, w2, COUNT(*) AS cxy FROM doc_bi GROUP BY w1, w2
      |), ctx AS (
      |  SELECT w1, SUM(cxy) AS cx FROM bi_cnt GROUP BY w1
      |), bi_scored AS (
      |  SELECT b.w1, b.w2,
      |    CAST((CAST(b.cxy AS HUGEINT) * 1000000) // c.cx AS BIGINT) AS p_fp
      |  FROM bi_cnt b JOIN ctx c ON b.w1 = c.w1
      |), scored AS (
      |  SELECT d.doc_id,
      |    CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |    CAST(SUM(s.p_fp) // COUNT(*) AS BIGINT) AS score_fp
      |  FROM doc_bi d JOIN bi_scored s ON d.w1 = s.w1 AND d.w2 = s.w2
      |  GROUP BY d.doc_id
      |)""".stripMargin

  /** Mirror: identical bigram/prefix tables, the same DECIMAL(38)
    * fixed-point per-bigram score, the same integer mean. */
  val q167Sql: String =
    raw"""WITH $mleScoreCtes
      |SELECT doc_id, n_bigrams, score_fp FROM scored
      |ORDER BY score_fp, doc_id LIMIT ${Q167BottomK}""".stripMargin

  // --- temperature-based source mixing (q168) --------------------------------

  /** Sample budget q168 allocates across sources. */
  val Q168Budget = 1000000L

  /** q168: TEMPERATURE-2 SOURCE MIXING with an exact integer allocation
    * — the sampling-weight scheme multilingual/multi-domain pipelines
    * use to keep small sources from vanishing (w_d ∝ n_d^(1/T); T=2 is
    * the square root), done entirely in integers so the mix plan is
    * bit-identical on any engine:
    *   - per-source whitespace-token totals n_d (one partial agg);
    *   - s_d = isqrt(n_d) EXACTLY: the float sqrt is only a seed,
    *     corrected ±1 against the true integer square (squares compared
    *     in DECIMAL(38) — (s+1)² overflows int64 right at the 2³¹·⁵
    *     boundary, and Spark 4 runs ANSI where that RAISES);
    *   - weight_fp = (10⁶·s_d) div S at 10⁻⁶ fixed point, S = Σ s_d;
    *   - a [[Q168Budget]]-sample budget split by LARGEST REMAINDER:
    *     base_d = (B·s_d) div S, and the B − Σ base_d leftover samples
    *     go to the largest (B·s_d) mod S (ties: source asc) — the
    *     standard apportionment rule, so Σ alloc_d = B exactly and no
    *     float rounding can gain or lose a sample.
    * Downstream, alloc_d/B is the keep rate a deterministic mixing pass
    * ([[graft.pipeline.Packing.mixKeep]]) applies per source.
    *
    * Scale shape: one token-sized partial agg; everything after runs on
    * the per-source table (≤ thousands of rows) — two windows and the
    * remainder rank never touch corpus-sized data. */
  /** EXACT integer square root as a column pipeline: the float sqrt is
    * only a SEED — floor(sqrt(double)) is within ±1 of the true isqrt
    * for every non-negative int64 (double carries 52 mantissa bits;
    * the root has at most 32) — then one correction each way against
    * the true integer squares, compared in DECIMAL(38) because (s+1)²
    * overflows int64 right at the 2³¹·⁵ boundary and Spark 4's ANSI
    * mode RAISES there. Testable kernel shared with the SQL mirrors
    * (same three steps verbatim). */
  private[graft] def withIsqrt(df: DataFrame, inCol: String,
      outCol: String): DataFrame =
    df.withColumn("__s0", expr(
        s"CAST(floor(sqrt(CAST($inCol AS DOUBLE))) AS BIGINT)"))
      .withColumn("__s1", expr(
        s"__s0 - CAST(CAST(__s0 AS DECIMAL(38,0)) * __s0 > $inCol AS INT)"))
      .withColumn(outCol, expr(
        s"__s1 + CAST(CAST(__s1 + 1 AS DECIMAL(38,0)) * (__s1 + 1) <= $inCol AS INT)"))
      .drop("__s0", "__s1")

  /** Per-source non-empty-token totals with a `n_tokens >= 1` floor —
    * shared by q168 and q173 (the composed planning pair MUST agree on
    * which sources exist in a plan). The floor also makes the weight
    * divisions total: with every surviving source having n ≥ 1, every
    * isqrt weight is ≥ 1 and Σ√n ≥ 1 — an all-whitespace corpus yields
    * an EMPTY plan, never a divide-by-zero (Spark 4 ANSI raises where
    * DuckDB would NULL — the engines must agree). */
  private[ops] def perSourceTokens(s: SparkSession, dir: String): DataFrame =
    Relational.fanOut(t(s, dir, "documents"))
      .select(col("source"),
        graft.text.TextAnalysis.nonEmptyTokenCount(col("text")).as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("n_tokens"))
      .filter(col("n_tokens") >= 1)

  def q168TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val perSrc = perSourceTokens(s, dir)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wRem = Window.orderBy(col("rem").desc, col("source"))
    withIsqrt(perSrc, "n_tokens", "w_sqrt")
      .withColumn("stot", sum(col("w_sqrt")).over(wAll))
      .withColumn("weight_fp", expr(
        s"(1000000 * w_sqrt) div stot"))
      .withColumn("base", expr(s"($Q168Budget * w_sqrt) div stot"))
      .withColumn("rem", expr(s"($Q168Budget * w_sqrt) % stot"))
      .withColumn("leftover", lit(Q168Budget) - sum(col("base")).over(wAll))
      .withColumn("bonus",
        (row_number().over(wRem) <= col("leftover")).cast("long"))
      .withColumn("alloc_samples", col("base") + col("bonus"))
      .select(col("source"), col("n_tokens"), col("w_sqrt"),
        col("weight_fp"), col("alloc_samples"))
      .orderBy(col("source"))
  }

  /** Mirror: the same seed-and-correct isqrt, fixed-point weights, and
    * largest-remainder apportionment over the per-source table. */
  val q168Sql: String =
    raw"""WITH per_src AS (
      |  SELECT source, SUM(len(list_filter(
      |      regexp_split_to_array(trim(lower(text)), '\s+'),
      |      t -> len(t) >= 1))) AS n_tokens
      |  FROM documents GROUP BY source
      |  HAVING SUM(len(list_filter(regexp_split_to_array(trim(lower(text)),
      |      '\s+'), t -> len(t) >= 1))) >= 1
      |), isq AS (
      |  SELECT source, n_tokens,
      |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS s0
      |  FROM per_src
      |), isq1 AS (
      |  SELECT source, n_tokens,
      |    s0 - CAST(CAST(s0 AS HUGEINT) * s0 > n_tokens AS INT) AS s1
      |  FROM isq
      |), w AS (
      |  SELECT source, n_tokens,
      |    s1 + CAST(CAST(s1 + 1 AS HUGEINT) * (s1 + 1) <= n_tokens AS INT)
      |      AS w_sqrt
      |  FROM isq1
      |), shares AS (
      |  SELECT source, n_tokens, w_sqrt,
      |    (1000000 * w_sqrt) // SUM(w_sqrt) OVER () AS weight_fp,
      |    (${Q168Budget} * w_sqrt) // SUM(w_sqrt) OVER () AS base,
      |    (${Q168Budget} * w_sqrt) % SUM(w_sqrt) OVER () AS rem
      |  FROM w
      |), ranked AS (
      |  SELECT source, n_tokens, w_sqrt, weight_fp, base,
      |    ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rr,
      |    ${Q168Budget} - SUM(base) OVER () AS leftover
      |  FROM shares
      |)
      |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(w_sqrt AS BIGINT) AS w_sqrt,
      |  CAST(weight_fp AS BIGINT) AS weight_fp,
      |  CAST(base + CAST(rr <= leftover AS INT) AS BIGINT) AS alloc_samples
      |FROM ranked ORDER BY source""".stripMargin
}
