package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Relational.t

/** Round-7 additions to the profiling / pipeline-planning layer:
  * equi-depth (quantile-bin) histogram, token-budget mix planning, and
  * Count-Min-Sketch heavy-hitter verification — all with full DuckDB
  * oracles. */
object ScaleOps4 {

  // --- equi-depth histogram (q72) -----------------------------------------

  /** q72: 10-bin equi-depth histogram over document length
    * ([[graft.analyze.Analyze.equiDepthHistogram]]) — the quantile-bin
    * companion to q70's fixed-width buckets: boundaries are the exact
    * decile percentiles (the q34 percentile/quantile_cont equivalence),
    * bin assignment is a broadcast pure map. */
  def q72EquiDepth(s: SparkSession, dir: String): DataFrame =
    graft.analyze.Analyze.equiDepthHistogram(
      Relational.fanOut(t(s, dir, "documents")), "n_chars", nBins = 10)
      .orderBy(col("bin"))

  val q72Sql: String = {
    val ps = (1 until 10).map(i => (i / 10.0).toString).mkString("[", ", ", "]")
    raw"""WITH c AS (
      |  SELECT n_chars FROM documents WHERE n_chars IS NOT NULL
      |), b AS (
      |  SELECT quantile_cont(CAST(n_chars AS DOUBLE), $ps) AS bs FROM c
      |), r AS (
      |  SELECT n_chars,
      |    CAST(1 + len(list_filter(bs, x -> CAST(n_chars AS DOUBLE) > x)) AS BIGINT) AS bin
      |  FROM c, b
      |)
      |SELECT bin, COUNT(*) AS n, MIN(n_chars) AS min_v, MAX(n_chars) AS max_v,
      |  CAST(COUNT(*) AS DOUBLE) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS share
      |FROM r GROUP BY bin ORDER BY bin""".stripMargin
  }

  // --- token-budget mix planning (q73) ------------------------------------

  /** q73: plan a half-the-corpus token budget across sources with
    * weights 1..4 by source index ([[graft.pipeline.Packing
    * .tokenBudgetPlan]]): integer-exact targets, capped allocations,
    * deficits, and the keep rate a q62 mixing pass would then apply —
    * the planning step that precedes mixing in a real data-mix change. */
  def q73TokenBudget(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.fanOut(t(s, dir, "documents"))
      .withColumn("n_tokens",
        size(graft.text.TextAnalysis.tokens(col("text"))).cast("long"))
    val weight = (substring(col("source"), 4, 10).cast("int") % 4 + 1).cast("long")
    graft.pipeline.Packing.tokenBudgetPlan(
      docs, "source", "n_tokens", weight, budgetNum = 1L, budgetDen = 2L)
      .orderBy(col("source"))
  }

  val q73Sql: String =
    raw"""WITH toks AS (
      |  SELECT source,
      |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), per AS (
      |  -- CAST the sums back to BIGINT: DuckDB SUM(BIGINT) widens to
      |  -- HUGEINT, which would ride through // and least() and land as
      |  -- float64 on the comparison side
      |  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS avail_tokens,
      |    CAST(CAST(substr(source, 4, 10) AS INT) % 4 + 1 AS BIGINT) AS weight
      |  FROM toks GROUP BY source
      |), planned AS (
      |  SELECT source, avail_tokens, weight,
      |    CAST((weight * CAST(SUM(avail_tokens) OVER () AS BIGINT) * 1)
      |      // (CAST(SUM(weight) OVER () AS BIGINT) * 2) AS BIGINT)
      |      AS target_tokens
      |  FROM per
      |)
      |SELECT source, avail_tokens, weight, target_tokens,
      |  least(target_tokens, avail_tokens) AS alloc_tokens,
      |  target_tokens - least(target_tokens, avail_tokens) AS deficit_tokens,
      |  CAST(least(target_tokens, avail_tokens) AS DOUBLE)
      |    / CAST(avail_tokens AS DOUBLE) AS keep_rate
      |FROM planned ORDER BY source""".stripMargin

  // --- CMS heavy hitters (q74) --------------------------------------------

  /** q74: exact top-10 corpus tokens with Count-Min-Sketch verification
    * booleans ([[graft.text.HeavyHitters.topTokensWithSketchCheck]]) —
    * the sketch is the no-shuffle production path for vocabularies that
    * don't fit a shuffle; the exact arm plus never-underestimates /
    * within-5·eps·N booleans is the q37/q67 oracle pattern (5× margin so
    * the literal-true mirror's flake probability is ~1e-8 per probe, not
    * the ~1e-3 the raw eps·N bound leaves open). */
  def q74HeavyHitters(s: SparkSession, dir: String): DataFrame =
    graft.text.HeavyHitters.topTokensWithSketchCheck(
      t(s, dir, "documents"), "text", k = 10)
      .orderBy(col("rank"))

  val q74Sql: String =
    raw"""WITH toks AS (
      |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
      |  FROM documents
      |), tot AS (
      |  SELECT COUNT(*) AS n_total FROM toks
      |), cnt AS (
      |  SELECT token, COUNT(*) AS n FROM toks GROUP BY token
      |), ranked AS (
      |  SELECT token, n,
      |    CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS INT) AS rank
      |  FROM cnt
      |)
      |SELECT rank, token, n,
      |  CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE) AS share,
      |  true AS cms_no_underestimate,
      |  true AS cms_within_eps
      |FROM ranked CROSS JOIN tot
      |WHERE rank <= 10 ORDER BY rank""".stripMargin

  // --- canonical document selection (q75) ---------------------------------

  /** q75: canonical-representative selection — the decision step a real
    * dedup pass runs AFTER q60's cluster formation: within each near-dup
    * cluster, rank documents by (quality DESC, length DESC, doc_id ASC)
    * and keep exactly one. Composes two already-hash-exact mirrors (the
    * q60 clustering chain and the q17 quality arithmetic), so the DOUBLE
    * ordering key is bit-identical across engines; ties fall through to
    * the exact keys. The rank window shuffles on cluster_id — clusters
    * are near-dup groups (bounded by the capped pair engine), never the
    * corpus, so no partition can degenerate at scale. */
  def q75Canonical(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.canonicalKeep(
      Relational.fanOut(t(s, dir, "documents")), "doc_id", "text",
      k = 3, threshold = 0.5)
      .orderBy(col("doc_id"))

  /** Mirror = q60's shared clustering chain + q17's quality arithmetic
    * (copied expression-for-expression so the doubles agree bitwise) +
    * the same two windows. */
  val q75Sql: String = {
    val en = graft.text.TextAnalysis.Stopwords("en")
      .map(w => s"'$w'").mkString(", ")
    "WITH RECURSIVE " + ScaleOps2.clusterCtes + raw""", clusters AS (
      |  SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY node
      |), m AS (
      |  SELECT doc_id,
      |    CAST(length(text) AS BIGINT) AS n_chars,
      |    CAST(length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) AS alpha_ratio,
      |    CAST(len(list_filter(t, s -> s IN ($en))) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS stop_ratio,
      |    CAST(length(text) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS avg_word_len
      |  FROM toks JOIN documents USING (doc_id)
      |), q AS (
      |  SELECT doc_id, n_chars,
      |    0.4 * alpha_ratio + 0.3 * least(stop_ratio * 4.0, 1.0) + 0.3 * least(avg_word_len / 8.0, 1.0) AS quality
      |  FROM m
      |)
      |SELECT c.doc_id, c.cluster_id,
      |  CAST(COUNT(*) OVER (PARTITION BY c.cluster_id) AS BIGINT) AS cluster_size,
      |  q.quality, q.n_chars,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY c.cluster_id
      |    ORDER BY q.quality DESC, q.n_chars DESC, c.doc_id) AS INT) AS pick_rank,
      |  (ROW_NUMBER() OVER (PARTITION BY c.cluster_id
      |    ORDER BY q.quality DESC, q.n_chars DESC, c.doc_id) = 1) AS keep
      |FROM clusters c JOIN q ON c.doc_id = q.doc_id
      |ORDER BY c.doc_id""".stripMargin
  }

  // --- per-source corpus profile (q76) ------------------------------------

  /** q76: per-source document counts + exact length/quality percentiles
    * ([[graft.analyze.Analyze.sourceProfile]]) — the measurement a
    * curation-threshold decision reads (Curation.Params.production came
    * from exactly this query shape). */
  def q76SourceProfile(s: SparkSession, dir: String): DataFrame =
    graft.analyze.Analyze.sourceProfile(
      Relational.fanOut(t(s, dir, "documents")), "source", "text")
      .orderBy(col("source"))

  val q76Sql: String = {
    val en = graft.text.TextAnalysis.Stopwords("en")
      .map(w => s"'$w'").mkString(", ")
    raw"""WITH base AS (
      |  SELECT source, text, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents
      |), m AS (
      |  SELECT source,
      |    CAST(length(text) AS DOUBLE) AS chars,
      |    0.4 * (CAST(length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE))
      |      + 0.3 * least((CAST(len(list_filter(t, s -> s IN ($en))) AS DOUBLE) / CAST(len(t) AS DOUBLE)) * 4.0, 1.0)
      |      + 0.3 * least((CAST(length(text) AS DOUBLE) / CAST(len(t) AS DOUBLE)) / 8.0, 1.0) AS q
      |  FROM base
      |)
      |SELECT source, COUNT(*) AS n_docs,
      |  quantile_cont(chars, 0.25) AS p25_chars,
      |  quantile_cont(chars, 0.5)  AS p50_chars,
      |  quantile_cont(chars, 0.9)  AS p90_chars,
      |  quantile_cont(chars, 0.99) AS p99_chars,
      |  quantile_cont(q, 0.5) AS p50_quality,
      |  quantile_cont(q, 0.9) AS p90_quality,
      |  CAST(MIN(chars) AS BIGINT) AS min_chars,
      |  CAST(MAX(chars) AS BIGINT) AS max_chars
      |FROM m GROUP BY source ORDER BY source""".stripMargin
  }

  // --- per-document boilerplate share (q77) --------------------------------

  /** q77: phrase-level boilerplate share per document
    * ([[graft.text.Relevance.boilerplateShare]]); commonDf=2 fits the
    * sf corpora (max shingle df ≈ 10 at sf0.01 — measured, not guessed). */
  def q77Boilerplate(s: SparkSession, dir: String): DataFrame =
    graft.text.Relevance.boilerplateShare(
      t(s, dir, "documents"), "doc_id", "text", k = 3, commonDf = 2L)
      .orderBy(col("doc_id"))

  /** Mirror reuses the shared toks/sh text-shingle CTEs (the q19/q60
    * equivalence between the hashed and literal shingle tables). */
  val q77Sql: String =
    raw"""WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, sh FROM (
      |    SELECT doc_id, unnest(
      |      CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |           ELSE list_transform(generate_series(0, len(t) - 3),
      |                               i -> array_to_string(list_slice(t, i + 1, i + 3), ' '))
      |      END) AS sh
      |    FROM toks)
      |), dfreq AS (
      |  SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh
      |)
      |SELECT s.doc_id,
      |  COUNT(*) AS n_shingles,
      |  CAST(SUM(CASE WHEN d.df > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
      |  CAST(SUM(CASE WHEN d.df > 2 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS boilerplate_share
      |FROM sh s JOIN dfreq d USING (sh)
      |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin

  // --- per-source dedup savings (q78) --------------------------------------

  /** q78: the governance rollup a dedup DECISION needs — per source, how
    * many documents and tokens canonical near-dup resolution
    * ([[graft.dedup.Dedup.canonicalKeep]], the q75 machinery) would
    * remove. This is the "is corpus X worth deduping before we pay for
    * tokenizing it" report: integer doc/token counts plus one final IEEE
    * division for the savings rate. */
  def q78DedupSavings(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val decided = graft.dedup.Dedup.canonicalKeep(
      docs, "doc_id", "text", k = 3, threshold = 0.5)
    dedupSavings(docs, decided, "source", "doc_id", "text")
  }

  /** Precomputed-decision form of the savings rollup — the reuse API
    * matching [[graft.dedup.Dedup.canonicalKeepFromClusters]]: `decided`
    * is any (idCol, keep) assignment the pipeline already built (q78
    * feeds it canonicalKeep's output; a composed run feeds the SAME
    * decision frame to curation, this report, and the ledger, paying for
    * the pair graph + CC once). Pure rollup: one partial-agg groupBy on
    * source after an equi-join on the doc id. */
  def dedupSavings(docs: DataFrame, decided: DataFrame, sourceCol: String,
      idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), col(sourceCol),
      size(graft.text.TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
    toks.join(decided.select(col(idCol), col("keep")), idCol)
      .groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"),
        sum(col("n_tokens")).as("tokens_total"),
        sum(when(col("keep"), 0L).otherwise(col("n_tokens"))).as("tokens_dropped"))
      .withColumn("token_savings_rate",
        col("tokens_dropped").cast("double") / col("tokens_total").cast("double"))
      .orderBy(col(sourceCol))
  }

  // --- WAV audio decode (q79) ----------------------------------------------

  /** q79: REAL RIFF/WAVE PCM decode over fixture audio — the audio twin
    * of q26's image path. The payload is a complete PCM WAV file built by
    * [[graft.multimodal.Wav.fixtureBytes]] from doc_id alone; the Spark
    * side genuinely PARSES those bytes back (container grammar, chunk
    * walk, fmt validation, 8/16-bit raster) into format fields + exact
    * integer sample stats. A header/raster/sign-extension bug breaks the
    * hash against the oracle's arithmetic re-derivation. */
  def q79WavDecode(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val media = docs.select(
      col("doc_id").cast("long").as("media_id"),
      column(graft.multimodal.WavFixture(
        expression(col("doc_id").cast("long")))).as("content"))
    graft.multimodal.Multimodal.decodeWavFeatures(media)
      .orderBy(col("media_id"))
  }

  /** DuckDB mirror of q79: the fixture is deterministic in doc_id
    * (channels = 1 + id%2, bits = 8 iff id%3=0, rate = 8000 + (id%4)·2000,
    * frames = 4 + id%5, sample j = ((id·37 + j·11) mod 2^bits) −
    * 2^(bits−1)), so every output re-derives arithmetically without
    * touching bytes: n_bytes = 44-byte canonical header + data + RIFF pad
    * byte on an odd data size; duration_ms is floor integer division;
    * mean_abs is exact integer Σ|s| with ONE final double division —
    * matching DecodeKernels.wavDecodeRow's order exactly. The sample
    * expansion is a 16-row-per-doc bounded cross join (max frames×channels
    * = 16), j < n_samples pruning the rest. */
  val q79Sql: String =
    """WITH d AS (
      |  SELECT CAST(doc_id AS BIGINT) AS media_id,
      |    1 + doc_id % 2 AS ch,
      |    CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS bits,
      |    8000 + (doc_id % 4) * 2000 AS sr,
      |    4 + doc_id % 5 AS nf
      |  FROM documents
      |), dd AS (
      |  SELECT *, nf * ch AS ns,
      |    CASE WHEN bits = 8 THEN 1 ELSE 2 END AS bps
      |  FROM d
      |), s AS (
      |  SELECT media_id, j,
      |    abs(CASE WHEN bits = 8 THEN ((media_id * 37 + j * 11) % 256) - 128
      |         ELSE ((media_id * 37 + j * 11) % 65536) - 32768 END) AS av
      |  FROM dd CROSS JOIN range(0, 16) AS r(j)
      |  WHERE j < ns
      |), agg AS (
      |  SELECT media_id, MAX(av) AS peak_abs, SUM(av) AS sum_abs
      |  FROM s GROUP BY media_id
      |)
      |SELECT dd.media_id,
      |  CAST(44 + ns * bps + (ns * bps) % 2 AS BIGINT) AS n_bytes,
      |  CAST(ch AS INTEGER) AS channels,
      |  CAST(sr AS INTEGER) AS sample_rate,
      |  CAST(bits AS INTEGER) AS bits_per_sample,
      |  CAST(nf AS BIGINT) AS n_frames,
      |  CAST(nf * 1000 // sr AS BIGINT) AS duration_ms,
      |  CAST(agg.peak_abs AS INTEGER) AS peak_abs,
      |  CAST(agg.sum_abs AS DOUBLE) / CAST(ns AS DOUBLE) AS mean_abs
      |FROM dd JOIN agg USING (media_id) ORDER BY media_id""".stripMargin

  /** q80: audio sample ANALYSIS over the real WAV decoder — zero
    * crossings, silence ratio, RMS energy per document (the audio quality
    * gates a multimodal curation pass filters on, past q79's format
    * surface). Pure map like q79: fixture bytes built in-plan, genuinely
    * re-parsed, analyzed in the same codegen kernel pass. */
  def q80AudioStats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val media = docs.select(
      col("doc_id").cast("long").as("media_id"),
      column(graft.multimodal.WavFixture(
        expression(col("doc_id").cast("long")))).as("content"))
    graft.multimodal.Multimodal.analyzeWavSamples(media)
      .orderBy(col("media_id"))
  }

  /** DuckDB mirror of q80: the q79 fixture law expanded to raw signed
    * samples; zero crossings join sample j with j−channels (the
    * interleaved per-channel neighbor), silence threshold is the integer
    * 2^(bits−1)/100 (327 for 16-bit, 1 for 8-bit), and rms is exact
    * integer Σs² with one double division then sqrt — both engines'
    * sqrt is IEEE-correctly-rounded so the bits match. */
  val q80Sql: String =
    """WITH d AS (
      |  SELECT CAST(doc_id AS BIGINT) AS media_id,
      |    1 + doc_id % 2 AS ch,
      |    CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS bits,
      |    4 + doc_id % 5 AS nf
      |  FROM documents
      |), dd AS (
      |  SELECT *, nf * ch AS ns,
      |    CASE WHEN bits = 8 THEN 1 ELSE 327 END AS thr
      |  FROM d
      |), s AS (
      |  SELECT media_id, ch, thr, j,
      |    CASE WHEN bits = 8 THEN ((media_id * 37 + j * 11) % 256) - 128
      |         ELSE ((media_id * 37 + j * 11) % 65536) - 32768 END AS v
      |  FROM dd CROSS JOIN range(0, 16) AS r(j)
      |  WHERE j < ns
      |), agg AS (
      |  SELECT media_id,
      |    COUNT(*) AS n_samples,
      |    SUM(CASE WHEN abs(v) < thr THEN 1 ELSE 0 END) AS n_silent,
      |    SUM(CAST(v AS BIGINT) * CAST(v AS BIGINT)) AS sum_sq
      |  FROM s GROUP BY media_id
      |), zc AS (
      |  SELECT a.media_id,
      |    SUM(CASE WHEN (a.v >= 0) <> (b.v >= 0) THEN 1 ELSE 0 END) AS nzc
      |  FROM s a JOIN s b ON a.media_id = b.media_id AND a.j = b.j + a.ch
      |  GROUP BY a.media_id
      |)
      |SELECT agg.media_id,
      |  CAST(n_samples AS BIGINT) AS n_samples,
      |  CAST(COALESCE(nzc, 0) AS BIGINT) AS zero_crossings,
      |  CAST(n_silent AS BIGINT) AS n_silent,
      |  CAST(n_silent AS DOUBLE) / CAST(n_samples AS DOUBLE) AS silence_ratio,
      |  sqrt(CAST(sum_sq AS DOUBLE) / CAST(n_samples AS DOUBLE)) AS rms
      |FROM agg LEFT JOIN zc USING (media_id) ORDER BY agg.media_id""".stripMargin

  /** q81: REAL ISO-BMFF (MP4) container probe over fixture video — the
    * box-tree walk + mvhd movie-header extraction that completes the
    * multimodal triad (image decode REAL, audio decode REAL, video
    * CONTAINER REAL; frame decode honestly stays stubbed behind a codec
    * boundary). The Spark side genuinely WALKS the box tree it built —
    * a size-arithmetic, nesting, or big-endian bug breaks the hash. */
  def q81Mp4Probe(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val media = docs.select(
      col("doc_id").cast("long").as("media_id"),
      column(graft.multimodal.Mp4Fixture(
        expression(col("doc_id").cast("long")))).as("content"))
    graft.multimodal.Multimodal.probeMp4(media)
      .orderBy(col("media_id"))
  }

  /** DuckDB mirror of q81: the fixture law is pure id arithmetic
    * (brand "isom", timescale = 600 + (id%3)·400, duration = 1200 +
    * (id%5)·700, mdat payload = 1 + id%9 bytes), so every output
    * re-derives without touching bytes: n_bytes = 16-byte ftyp +
    * 116-byte moov (8 + the spec-complete 108-byte v0 mvhd) + 8-byte
    * mdat header + payload = 141 + id%9; duration_ms is floor integer
    * division ticks·1000/timescale. */
  val q81Sql: String =
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |  CAST(141 + doc_id % 9 AS BIGINT) AS n_bytes,
      |  'isom' AS major_brand,
      |  CAST(600 + (doc_id % 3) * 400 AS INTEGER) AS timescale,
      |  CAST(1200 + (doc_id % 5) * 700 AS BIGINT) AS duration,
      |  CAST((1200 + (doc_id % 5) * 700) * 1000
      |    // (600 + (doc_id % 3) * 400) AS BIGINT) AS duration_ms,
      |  3 AS n_top_boxes
      |FROM documents ORDER BY media_id""".stripMargin

  /** q82: REAL ISO-BMFF TRACK-layer probe — the r9 depth step past q81's
    * movie header: per-track tkhd/mdhd/stts extraction over fixture
    * containers that carry real trak box trees. The Spark side walks
    * four nesting levels (moov>trak>mdia>minf>stbl>stts) and sums the
    * stts run-lengths; a size, nesting, or big-endian bug at ANY level
    * breaks the hash. Explode of a kernel-produced array — still
    * shuffle-free up to the final order-by. */
  def q82TrackStats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val media = docs.select(
      col("doc_id").cast("long").as("media_id"),
      column(graft.multimodal.Mp4FixtureTracks(
        expression(col("doc_id").cast("long")))).as("content"))
    graft.multimodal.Multimodal.probeTracks(media)
      .orderBy(col("media_id"), col("track_id"))
  }

  /** DuckDB mirror of q82: the track fixture law is pure id arithmetic
    * (1 + id%2 tracks; track k has timescale 1000 + ((id+k)%4)·500 and
    * stts [(3+(id+k)%5, 100), (1+(id+k)%3, 250)]), so media duration
    * (= the stts integral), sample count, floor-div duration_ms, and
    * the mean sample rate all re-derive without touching bytes. The
    * double math mirrors Spark's op order exactly: CAST(n AS DOUBLE) ·
    * timescale / duration. */
  val q82Sql: String =
    """WITH d AS (
      |  SELECT CAST(doc_id AS BIGINT) AS media_id,
      |    1 + doc_id % 2 AS ntracks
      |  FROM documents
      |), t AS (
      |  SELECT media_id, k + 1 AS track_id,
      |    CAST(1000 + ((media_id + k) % 4) * 500 AS INTEGER) AS track_timescale,
      |    3 + (media_id + k) % 5 AS n1,
      |    1 + (media_id + k) % 3 AS n2
      |  FROM d CROSS JOIN range(0, 2) AS r(k) WHERE k < ntracks
      |)
      |SELECT media_id,
      |  CAST(track_id AS BIGINT) AS track_id,
      |  track_timescale,
      |  CAST(n1 * 100 + n2 * 250 AS BIGINT) AS track_duration,
      |  CAST(n1 + n2 AS BIGINT) AS n_samples,
      |  CAST((n1 * 100 + n2 * 250) * 1000 // track_timescale AS BIGINT) AS duration_ms,
      |  CAST(n1 + n2 AS DOUBLE) * track_timescale / (n1 * 100 + n2 * 250) AS sample_rate
      |FROM t ORDER BY media_id, track_id""".stripMargin

  /** q83: REAL MPEG-1 Layer III frame walk over fixture audio streams —
    * the third audio surface past q79/q80's RIFF/WAVE: an
    * elementary-stream format where frame N+1's position is only
    * knowable by sizing frame N correctly (sync stepping), with ID3v2
    * tags on a quarter of the corpus. Per-frame bitrates VARY, so the
    * byte total, frame count, and bitrate sum all prove the walk. */
  def q83Mp3Scan(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val media = docs.select(
      col("doc_id").cast("long").as("media_id"),
      column(graft.multimodal.Mp3Fixture(
        expression(col("doc_id").cast("long")))).as("content"))
    graft.multimodal.Multimodal.scanMp3(media)
      .orderBy(col("media_id"))
  }

  /** DuckDB mirror of q83: the fixture law is pure id arithmetic
    * (rate = [44100,48000,32000][id%3]; 2 + id%5 frames; frame j has
    * bitrate [128,160,192][(id+j)%3] and padding (id+j)%2; ID3v2 of
    * 10 + id%7 bytes iff id%4=0), so the spec frame-length formula
    * floor(144000·kbps/rate) + pad re-derives every total without
    * touching bytes. */
  val q83Sql: String =
    """WITH d AS (
      |  SELECT CAST(doc_id AS BIGINT) AS media_id,
      |    2 + doc_id % 5 AS nf,
      |    CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END AS rate
      |  FROM documents
      |), f AS (
      |  SELECT media_id, rate, nf, j,
      |    CASE (media_id + j) % 3 WHEN 0 THEN 128 WHEN 1 THEN 160 ELSE 192 END AS kbps,
      |    (media_id + j) % 2 AS pad
      |  FROM d CROSS JOIN range(0, 7) AS r(j) WHERE j < nf
      |), agg AS (
      |  SELECT media_id, rate, nf,
      |    SUM(144000 * kbps // rate + pad) AS audio_bytes,
      |    SUM(kbps) AS sum_kbps
      |  FROM f GROUP BY media_id, rate, nf
      |)
      |SELECT media_id,
      |  CAST(CASE WHEN media_id % 4 = 0 THEN 10 + media_id % 7 ELSE 0 END
      |    + audio_bytes AS BIGINT) AS n_bytes,
      |  rate AS sample_rate,
      |  CAST(nf AS BIGINT) AS n_frames,
      |  CAST(nf * 1152 AS BIGINT) AS n_samples,
      |  CAST(nf * 1152 * 1000 // rate AS BIGINT) AS duration_ms,
      |  CAST(sum_kbps AS DOUBLE) / CAST(nf AS DOUBLE) AS avg_kbps
      |FROM agg ORDER BY media_id""".stripMargin

  /** q84: REAL ISO-BMFF SAMPLE extraction — the r9 endpoint of the video
    * surface: resolve stsz sizes, stsc chunk runs, and stco offsets over
    * containers whose mdat chunks are INTERLEAVED across tracks, extract
    * every sample's actual bytes, and checksum them. The checksum only
    * comes out right if the entire table resolution and the byte copy
    * do; the oracle re-derives it from the fixture byte law without
    * touching the file. */
  def q84Mp4Samples(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val media = docs.select(
      col("doc_id").cast("long").as("media_id"),
      column(graft.multimodal.Mp4FixtureSamples(
        expression(col("doc_id").cast("long")))).as("content"))
    graft.multimodal.Multimodal.extractSamples(media)
      .orderBy(col("media_id"), col("track_id"), col("sample_idx"))
  }

  /** DuckDB mirror of q84: the sample fixture law is pure id arithmetic
    * (1 + id%2 tracks; track k has n = (3+(id+k)%5) + (1+(id+k)%3)
    * samples; sample j has size 2 + (id+k+j)%5 and byte t =
    * (id·31 + k·7 + j·13 + t·3) mod 256), so sizes and byte checksums
    * re-derive entirely in SQL. */
  val q84Sql: String =
    """WITH d AS (
      |  SELECT CAST(doc_id AS BIGINT) AS media_id,
      |    1 + doc_id % 2 AS ntracks
      |  FROM documents
      |), tr AS (
      |  SELECT media_id, k,
      |    (3 + (media_id + k) % 5) + (1 + (media_id + k) % 3) AS n
      |  FROM d CROSS JOIN range(0, 2) AS r(k) WHERE k < ntracks
      |), s AS (
      |  SELECT media_id, k, j, 2 + (media_id + k + j) % 5 AS size
      |  FROM tr CROSS JOIN range(0, 10) AS rj(j) WHERE j < n
      |), b AS (
      |  SELECT media_id, k, j, size,
      |    SUM((media_id * 31 + k * 7 + j * 13 + tb * 3) % 256) AS checksum
      |  FROM s CROSS JOIN range(0, 6) AS rb(tb) WHERE tb < size
      |  GROUP BY media_id, k, j, size
      |)
      |SELECT media_id,
      |  CAST(k + 1 AS BIGINT) AS track_id,
      |  CAST(j AS BIGINT) AS sample_idx,
      |  CAST(size AS INTEGER) AS size,
      |  CAST(checksum AS BIGINT) AS checksum
      |FROM b ORDER BY media_id, track_id, sample_idx""".stripMargin

  /** q85: EXACT-SUBSTRING duplication signal — the sliding-window
    * variant of q64's aligned chunk dedup, the scalable analog of
    * suffix-array substring dedup from the public training-data-dedup
    * literature: hash EVERY k-token window (k=8, stride 1,
    * [[graft.functions.SlidingShingleHashes]] — strings never leave the
    * kernel, exchanges carry longs), mark positions whose shingle occurs
    * in ≥2 distinct documents, and merge adjacent duplicated positions
    * into maximal spans per doc. Emits per doc: window count, duplicated
    * window count, the duplicated fraction (the filter signal), and the
    * span count.
    *
    * Scale notes: two hash exchanges on the 8-byte shingle hash (the
    * distinct-doc-frequency aggregate and the join back) + one doc-keyed
    * window/aggregate — all equi-key, no pair blowup: cost is linear in
    * token count. Boilerplate mega-shingles concentrate on single keys;
    * at 100 TB the same df-cap discipline as the near-dup candidate
    * engine applies (cap the docs-per-shingle list; a shingle in >cap
    * docs is duplicated regardless, so capping changes no verdict —
    * count-distinct here already reduces per-key state to a counter). */
  def q85DupSpans(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    import org.apache.spark.sql.expressions.Window
    val k = 8
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val toks = docs.select(col("doc_id"),
      graft.text.TextAnalysis.tokens(col("text")).as("t"))
    val ph = toks.select(col("doc_id"),
      posexplode(column(graft.functions.SlidingShingleHashes(
        expression(col("t")), k))).as(Seq("pos", "h")))
    val dupHashes = ph.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h"))
    val dup = ph.join(dupHashes, "h")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = dup
      .withColumn("lagp", lag(col("pos"), 1).over(w))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_dup_positions"),
        sum(when(col("lagp").isNull || col("pos") - col("lagp") > 1, 1L)
          .otherwise(0L)).as("n_spans"))
    toks.select(col("doc_id"),
        greatest(size(col("t")) - lit(k - 1), lit(0)).cast("long").as("n_positions"))
      .join(spans, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_positions"),
        coalesce(col("n_dup_positions"), lit(0L)).as("n_dup_positions"),
        when(col("n_positions") === 0, lit(0.0))
          .otherwise(coalesce(col("n_dup_positions"), lit(0L)).cast("double")
            / col("n_positions").cast("double")).as("dup_fraction"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB mirror of q85: the same FNV-1a-64 arithmetic as the q21–q23
    * mirrors (HUGEINT = exact mod-2^64), applied to each sliding 8-token
    * window string, then the identical distinct-doc-frequency /
    * adjacency-merge pipeline in SQL. */
  val q85Sql: String = {
    val fnvScalar =
      """list_reduce(
        |      list_prepend(14695981039346656037::HUGEINT,
        |        [ord(substr(s, i, 1))::HUGEINT FOR i IN range(1, length(s) + 1)]),
        |      (acc, b) -> (xor(acc, b) * 1099511628211) % 18446744073709551616::HUGEINT)""".stripMargin
    raw"""WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents
      |), pos AS (
      |  SELECT doc_id, unnest(range(0, greatest(len(t) - 7, 0))) AS p, t FROM toks
      |), ph AS (
      |  SELECT doc_id, p, $fnvScalar AS hv
      |  FROM (SELECT doc_id, p, array_to_string(t[p + 1 : p + 8], ' ') AS s FROM pos)
      |), phs AS (
      |  SELECT doc_id, p,
      |    CAST(CASE WHEN hv >= 9223372036854775808::HUGEINT
      |              THEN hv - 18446744073709551616::HUGEINT ELSE hv END AS BIGINT) AS h
      |  FROM ph
      |), duph AS (
      |  SELECT h FROM phs GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
      |), lagged AS (
      |  SELECT doc_id, p, LAG(p) OVER (PARTITION BY doc_id ORDER BY p) AS lagp
      |  FROM phs JOIN duph USING (h)
      |), spans AS (
      |  SELECT doc_id, COUNT(*) AS n_dup,
      |    SUM(CASE WHEN lagp IS NULL OR p - lagp > 1 THEN 1 ELSE 0 END) AS n_spans
      |  FROM lagged GROUP BY doc_id
      |), tot AS (
      |  SELECT doc_id, greatest(len(t) - 7, 0) AS n_pos FROM toks
      |)
      |SELECT tot.doc_id,
      |  CAST(n_pos AS BIGINT) AS n_positions,
      |  CAST(COALESCE(n_dup, 0) AS BIGINT) AS n_dup_positions,
      |  CASE WHEN n_pos = 0 THEN 0.0
      |       ELSE CAST(COALESCE(n_dup, 0) AS DOUBLE) / CAST(n_pos AS DOUBLE)
      |  END AS dup_fraction,
      |  CAST(COALESCE(n_spans, 0) AS BIGINT) AS n_spans
      |FROM tot LEFT JOIN spans USING (doc_id) ORDER BY tot.doc_id""".stripMargin
  }

  /** q86: EXACT-SUBSTRING dedup as a TRANSFORM — q85's signal applied:
    * remove from each document every token covered by a duplicated
    * 8-token window whose canonical owner (MIN doc_id over the documents
    * containing that shingle) is another document; the owner keeps its
    * copy. Emits the cleaned text (tokens re-joined in order) plus
    * before/after token counts — the per-doc string itself is part of
    * the oracle surface, so the whole mask-and-rebuild transform is
    * hash-checked, not just its counts.
    *
    * Scale: q85's two equi-exchanges plus one covered-position
    * anti-join and one doc-keyed ordered rebuild — all equi-key, linear
    * in token count. The rebuild aggregates (position, token) pairs per
    * doc: group state is one document's tokens, the same bounded-group
    * contract as the q75 keeper windows. */
  def q86DedupClean(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val k = 8
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val toks = docs.select(col("doc_id"),
      graft.text.TextAnalysis.tokens(col("text")).as("t"))
    val ph = toks.select(col("doc_id"),
      posexplode(column(graft.functions.SlidingShingleHashes(
        expression(col("t")), k))).as(Seq("pos", "h")))
    // duplicated shingles with their canonical owner in ONE aggregate
    val duph = ph.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"), min(col("doc_id")).as("owner"))
      .filter(col("nd") >= 2)
      .select(col("h"), col("owner"))
    // token positions covered by a non-owned duplicated window
    val covered = ph.join(duph, "h")
      .filter(col("doc_id") =!= col("owner"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("i"))
      .distinct()
    // enumerate tokens, drop covered positions, rebuild in order
    val indexed = toks.select(col("doc_id"),
      posexplode(col("t")).as(Seq("i", "tok")))
    val kept = indexed.join(covered, Seq("doc_id", "i"), "left_anti")
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("i"), col("tok")))),
          x => x.getField("tok")), " ").as("cleaned_text"))
    toks.select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB mirror of q86: q85's shingle/frequency chain, plus the owner
    * (MIN doc_id per duplicated shingle), the covered-position expansion,
    * and the identical order-preserving token rebuild via
    * string_agg(... ORDER BY position). */
  val q86Sql: String = {
    val fnvScalar =
      """list_reduce(
        |      list_prepend(14695981039346656037::HUGEINT,
        |        [ord(substr(s, i, 1))::HUGEINT FOR i IN range(1, length(s) + 1)]),
        |      (acc, b) -> (xor(acc, b) * 1099511628211) % 18446744073709551616::HUGEINT)""".stripMargin
    raw"""WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents
      |), pos AS (
      |  SELECT doc_id, unnest(range(0, greatest(len(t) - 7, 0))) AS p, t FROM toks
      |), ph AS (
      |  SELECT doc_id, p, $fnvScalar AS hv
      |  FROM (SELECT doc_id, p, array_to_string(t[p + 1 : p + 8], ' ') AS s FROM pos)
      |), phs AS (
      |  SELECT doc_id, p,
      |    CAST(CASE WHEN hv >= 9223372036854775808::HUGEINT
      |              THEN hv - 18446744073709551616::HUGEINT ELSE hv END AS BIGINT) AS h
      |  FROM ph
      |), duph AS (
      |  SELECT h, MIN(doc_id) AS owner FROM phs
      |  GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
      |), cov AS (
      |  SELECT DISTINCT phs.doc_id, p + u AS i
      |  FROM phs JOIN duph USING (h) CROSS JOIN range(0, 8) AS r(u)
      |  WHERE phs.doc_id <> duph.owner
      |), idx AS (
      |  SELECT doc_id, unnest(t) AS tok,
      |    unnest(range(0, len(t))) AS i
      |  FROM toks
      |), kept AS (
      |  SELECT idx.doc_id, idx.i, idx.tok FROM idx
      |  LEFT JOIN cov ON idx.doc_id = cov.doc_id AND idx.i = cov.i
      |  WHERE cov.doc_id IS NULL
      |), rebuilt AS (
      |  SELECT doc_id, COUNT(*) AS n_kept,
      |    string_agg(tok, ' ' ORDER BY i) AS cleaned_text
      |  FROM kept GROUP BY doc_id
      |)
      |SELECT toks.doc_id,
      |  CAST(len(t) AS BIGINT) AS n_tokens,
      |  CAST(len(t) - COALESCE(n_kept, 0) AS BIGINT) AS n_removed,
      |  COALESCE(cleaned_text, '') AS cleaned_text
      |FROM toks LEFT JOIN rebuilt USING (doc_id) ORDER BY toks.doc_id""".stripMargin
  }

  /** q87: corpus-relative TOKEN RARITY scoring — a cheap, exact proxy
    * for LM-filter quality signals: each token scores its integer
    * inverse corpus frequency floor(T / count) (T = total corpus
    * tokens), and a document reports the mean and max over its tokens.
    * Common-boilerplate docs score low, rare-token-heavy docs score
    * high — the corpus-relative outlier axis the per-doc q17 heuristics
    * cannot see. All arithmetic is exact integers until one final
    * double division, so the oracle is bit-exact (no transcendentals —
    * ln/log2 are NOT identically rounded across engines and would break
    * the hash contract).
    *
    * Scale: one token-keyed count (partial-agg before its exchange),
    * one equi-join of the token stream against the count table (both
    * sides token-partitioned — vocab is far too large to broadcast at
    * 100 TB), a 1-row total broadcast, one doc-keyed rollup. Linear,
    * skew-bounded: the hottest token key carries a counter, not a
    * token list. */
  def q87TokenRarity(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val tk = docs.select(col("doc_id"),
      explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok"))
    val counts = tk.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("T")) // 1 row
    tk.join(counts, "tok")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), expr("T div cnt").as("ifreq"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        (sum(col("ifreq")).cast("double") / count(lit(1))).as("mean_inv_freq"),
        max(col("ifreq")).as("max_inv_freq"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB mirror of q87: identical count/total/floor-div/rollup chain;
    * the only double op is the final mean division, mirrored exactly. */
  val q87Sql: String =
    raw"""WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents
      |), tk AS (
      |  SELECT doc_id, unnest(t) AS tok FROM toks
      |), counts AS (
      |  SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY tok
      |), tot AS (
      |  SELECT SUM(cnt) AS T FROM counts
      |)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(SUM(T // cnt) AS DOUBLE) / COUNT(*) AS mean_inv_freq,
      |  CAST(MAX(T // cnt) AS BIGINT) AS max_inv_freq
      |FROM tk JOIN counts USING (tok) CROSS JOIN tot
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Mirror = the shared q60/q75 clustering chain + the same
    * quality-ranked keeper window, rolled up per source with
    * HUGEINT-safe integer sums. */
  val q78Sql: String = {
    val en = graft.text.TextAnalysis.Stopwords("en")
      .map(w => s"'$w'").mkString(", ")
    "WITH RECURSIVE " + ScaleOps2.clusterCtes + raw""", clusters AS (
      |  SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY node
      |), m AS (
      |  SELECT doc_id,
      |    CAST(length(text) AS BIGINT) AS n_chars,
      |    CAST(length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) AS alpha_ratio,
      |    CAST(len(list_filter(t, s -> s IN ($en))) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS stop_ratio,
      |    CAST(length(text) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS avg_word_len,
      |    CAST(len(t) AS BIGINT) AS n_tokens
      |  FROM toks JOIN documents USING (doc_id)
      |), q AS (
      |  SELECT doc_id, n_chars, n_tokens,
      |    0.4 * alpha_ratio + 0.3 * least(stop_ratio * 4.0, 1.0) + 0.3 * least(avg_word_len / 8.0, 1.0) AS quality
      |  FROM m
      |), decided AS (
      |  SELECT c.doc_id,
      |    (ROW_NUMBER() OVER (PARTITION BY c.cluster_id
      |      ORDER BY q.quality DESC, q.n_chars DESC, c.doc_id) = 1) AS keep,
      |    q.n_tokens
      |  FROM clusters c JOIN q ON c.doc_id = q.doc_id
      |)
      |SELECT d.source,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
      |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
      |  CAST(SUM(CASE WHEN keep THEN 0 ELSE n_tokens END) AS BIGINT) AS tokens_dropped,
      |  CAST(SUM(CASE WHEN keep THEN 0 ELSE n_tokens END) AS DOUBLE)
      |    / CAST(SUM(n_tokens) AS DOUBLE) AS token_savings_rate
      |FROM decided JOIN documents d USING (doc_id)
      |GROUP BY d.source ORDER BY d.source""".stripMargin
  }
}
