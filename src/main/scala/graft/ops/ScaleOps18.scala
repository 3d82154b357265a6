package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import Relational.t

/** Round-10 batch 17: embedding-training data generation — skip-gram
  * context pairs (q152) and fixed-point PMI-lift collocations (q153) —
  * plus keyframe detection over decoded MJPEG frames (q154): the
  * word2vec-style pair generator a training pipeline runs before
  * embedding training, the collocation detector that finds multi-word
  * units worth merging, and the scene-change readout over the q149
  * video surface. */
object ScaleOps18 {

  // --- skip-gram context pairs (q152) --------------------------------------

  /** q152: SKIP-GRAM training-pair generation (the word2vec/fastText
    * input): for every token position, every (center, context) pair
    * within window w=3 (both directions, context ≠ position), counted
    * corpus-wide — top 25 by (count desc, center, context).
    *
    * Spark side generates (doc, pos±k) probe rows (k ∈ ±1..3, a 6-way
    * explode — bounded fan-out, never a doc-length blowup) and
    * equi-joins back on (doc_id, pos): the range condition becomes a
    * hash join on a dense composite key, and the pair count partial-
    * aggregates map-side (Zipf-hot pairs like "the of" fold before the
    * exchange). One corpus-sized explode, one equi-join, one count
    * aggregate, one 25-row TakeOrdered. */
  def q152SkipGrams(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.fanOut(t(s, dir, "documents"))
    // Pairs assembled per document from the token ARRAY — a pure map
    // over the scan. The former shape posexploded every token, 6-way
    // exploded probe rows, and equi-joined them back on (doc_id, pos):
    // ~7x the token volume crossed TWO exchanges just to look up an
    // array neighbor each row already knew. Same pair multiset: probe
    // rows paired (center at pos, context at pos+k) for k ∈ ±1..3 with
    // both tokens non-empty and in bounds — exactly the lambda below
    // over the ORIGINAL (gap-preserving, un-reindexed) positions.
    val pairs = docs
      .select(col("doc_id"), graft.text.TextAnalysis.tokens(col("text")).as("ts"))
      .select(explode(expr(
        "flatten(transform(sequence(1, size(ts)), i -> " +
          "filter(transform(array(-3, -2, -1, 1, 2, 3), k -> " +
          "CASE WHEN i + k >= 1 AND i + k <= size(ts) " +
          "AND length(element_at(ts, i)) >= 1 " +
          "AND length(element_at(ts, i + k)) >= 1 " +
          "THEN named_struct('center', element_at(ts, i), " +
          "'context', element_at(ts, i + k)) END), " +
          "p -> p IS NOT NULL)))")).as("pr"))
      .select(col("pr.center").as("center"), col("pr.context").as("context"))
    // top-k via orderBy+limit = TakeOrderedAndProject, a DISTRIBUTED
    // top-25 — the pair table is co-occurrence-matrix-sized (unlike
    // q120's ≤|charset|² table), so a global rank window over it would
    // be a single-task sort at 100 TB; the rank window runs on the 25
    // survivors only
    val top = pairs
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("center"), col("context"))
      .limit(25)
    top
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("center"), col("context"))))
      .select(col("rank"), col("center"), col("context"), col("cnt"))
      .orderBy(col("rank"))
  }

  /** Mirror: positions via UNNEST WITH ORDINALITY-style generate_subscripts
    * over the split array, pairs via the same ±3 window join. */
  val q152Sql: String =
    raw"""WITH toks AS (
      |  SELECT doc_id, g AS pos, s[g] AS tok FROM (
      |    SELECT doc_id, s, unnest(generate_series(1, len(s))) AS g
      |    FROM (SELECT doc_id,
      |            regexp_split_to_array(trim(lower(text)), '\s+') AS s
      |          FROM documents))
      |  WHERE len(s[g]) >= 1
      |), pairs AS (
      |  SELECT a.tok AS center, b.tok AS context
      |  FROM toks a JOIN toks b
      |    ON a.doc_id = b.doc_id
      |   AND b.pos BETWEEN a.pos - 3 AND a.pos + 3
      |   AND b.pos <> a.pos
      |), counted AS (
      |  SELECT center, context, COUNT(*) AS cnt FROM pairs
      |  GROUP BY center, context
      |)
      |SELECT rank, center, context, CAST(cnt AS BIGINT) AS cnt FROM (
      |  SELECT center, context, cnt,
      |    ROW_NUMBER() OVER (ORDER BY cnt DESC, center, context) AS rank
      |  FROM counted)
      |WHERE rank <= 25 ORDER BY rank""".stripMargin

  // --- PMI-lift collocations (q153) ----------------------------------------

  /** q153: collocation detection by PMI-LIFT — which adjacent bigrams
    * occur far more often than their unigram frequencies predict (the
    * multi-word-unit detector run before tokenizer/vocab decisions).
    * Log-PMI would ride libm; the LIFT form clears it to integers the
    * q147 way: lift = p(xy)/(p(x)p(y)) = c_xy·T² / (B·c_x·c_y), scored
    * at 10⁻⁶ fixed point in DECIMAL(38)/HUGEINT (c_xy·T²·10⁶ exceeds
    * int64 once T > ~3M tokens; the 38-digit bound holds to T ≈ 3·10¹⁴
    * — document-scale math, the q147 bound discipline). Bigrams with
    * c_xy ≥ 5 rank by (lift desc, w1, w2), top 20.
    *
    * Scale shape: one token-sized bigram partial agg, one vocab-sized
    * unigram partial agg, two broadcast-able marginal joins (vocab-sized
    * against the bigram table), 1-row totals broadcast, 20-row
    * TakeOrdered. */
  def q153PmiLift(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val toks = docs.select(col("doc_id"),
      graft.text.TextAnalysis.tokens(col("text")).as("ts"))
    val uni = toks.select(explode(col("ts")).as("tok"))
      .filter(length(col("tok")) >= 1)
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val biAll = toks
      // size < 2 would make sequence(1, size-1) DESCEND in Spark (the
      // q150 guard): single-token docs carry no bigram
      .filter(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ts) - 1), " +
          "i -> named_struct('w1', element_at(ts, i), 'w2', element_at(ts, i + 1)))"))
        .as("b"))
      .filter(length(col("b.w1")) >= 1 && length(col("b.w2")) >= 1)
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("cxy"))
    // B is the UNFILTERED bigram total — p(xy) = c_xy/B over all pairs;
    // the min-count gate prunes candidates, it must not shrink the
    // probability space (computing B post-gate doubles every lift on a
    // corpus where half the pairs are rare — caught by the hand-law spec,
    // invisibly to the oracle hash since both engines would agree)
    val bi = biAll.filter(col("cxy") >= 5)
    val totals = uni.agg(sum(col("c")).as("tt"))
      .crossJoin(biAll.agg(sum(col("cxy")).as("bb")))
    val dec = DecimalType(38, 0)
    bi
      .join(uni.select(col("tok").as("w1"), col("c").as("cx")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("c").as("cy")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("lift_fp", expr(
        "CAST((CAST(cxy AS DECIMAL(38,0)) * tt * tt * 1000000) div " +
          "(CAST(bb AS DECIMAL(38,0)) * cx * cy) AS BIGINT)"))
      // distributed TakeOrdered, then rank over the 20 survivors — the
      // scored bigram table is vocab²-bounded, too big for a global
      // rank window at 100 TB (the q152 note)
      .orderBy(col("lift_fp").desc, col("w1"), col("w2"))
      .limit(20)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("lift_fp").desc, col("w1"), col("w2"))))
      .select(col("rank"), col("w1"), col("w2"), col("cxy"), col("lift_fp"))
      .orderBy(col("rank"))
  }

  val q153Sql: String =
    raw"""WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ts
      |  FROM documents
      |), uni AS (
      |  SELECT tok, COUNT(*) AS c FROM (
      |    SELECT unnest(ts) AS tok FROM toks) WHERE len(tok) >= 1
      |  GROUP BY tok
      |), bi_all AS (
      |  SELECT w1, w2, COUNT(*) AS cxy FROM (
      |    SELECT ts[g] AS w1, ts[g + 1] AS w2 FROM (
      |      SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS g FROM toks))
      |  WHERE len(w1) >= 1 AND len(w2) >= 1
      |  GROUP BY w1, w2
      |), bi AS (
      |  SELECT w1, w2, cxy FROM bi_all WHERE cxy >= 5
      |), totals AS (
      |  SELECT (SELECT SUM(c) FROM uni) AS tt,
      |         (SELECT SUM(cxy) FROM bi_all) AS bb
      |), scored AS (
      |  SELECT w1, w2, cxy,
      |    CAST((cxy::HUGEINT * tt * tt * 1000000)
      |      // (bb::HUGEINT * cx.c * cy.c) AS BIGINT) AS lift_fp
      |  FROM bi
      |  JOIN uni cx ON cx.tok = bi.w1
      |  JOIN uni cy ON cy.tok = bi.w2
      |  CROSS JOIN totals
      |)
      |SELECT rank, w1, w2, CAST(cxy AS BIGINT) AS cxy, lift_fp FROM (
      |  SELECT w1, w2, cxy, lift_fp,
      |    ROW_NUMBER() OVER (ORDER BY lift_fp DESC, w1, w2) AS rank
      |  FROM scored)
      |WHERE rank <= 20 ORDER BY rank""".stripMargin

  // --- MJPEG keyframe detection (q154) -------------------------------------

  /** q154: scene-change detection over DECODED video frames — the
    * keyframe-sampling readout a multimodal pipeline runs after q149's
    * frame decode: per media, consecutive-frame deltas of the exact
    * pixel stats (|Δ sum_samples| on the (media, track) stream in
    * sample order), count of "cuts" (delta above a fixed threshold),
    * total and max delta. Exact integers end-to-end.
    *
    * Scale shape: q149's pure map+explode, then ONE media-keyed lag
    * window and a per-media partial agg — no corpus-sized exchange
    * beyond the window's hash partition. */
  def q154Keyframes(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val media = docs.select(
      col("doc_id").cast("long").as("media_id"),
      column(graft.multimodal.MjpegFixture(
        expression(col("doc_id").cast("long")))).as("content"))
    val frames = graft.multimodal.Multimodal.decodeMjpegFrames(media)
    val w = Window.partitionBy(col("media_id"), col("track_id"))
      .orderBy(col("sample_idx"))
    frames
      .withColumn("delta",
        abs(col("sum_samples") - lag(col("sum_samples"), 1).over(w)))
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("delta") > 2000, 1L).otherwise(0L)).as("n_cuts"),
        coalesce(sum(col("delta")), lit(0L)).as("total_delta"),
        coalesce(max(col("delta")), lit(0L)).as("max_delta"))
      .orderBy(col("media_id"))
  }

  /** Mirror: the q149 frame-stat law re-derived per frame, then the same
    * lag/threshold/rollup chain. */
  val q154Sql: String =
    """WITH d AS (
      |  SELECT CAST(doc_id AS BIGINT) AS media_id, 2 + doc_id % 3 AS n
      |  FROM documents
      |), s AS (
      |  SELECT media_id, j, media_id * 5 + j AS fid
      |  FROM d CROSS JOIN range(0, 4) AS rj(j) WHERE j < n
      |), dims AS (
      |  SELECT media_id, j, fid,
      |    (2 + fid % 2) * 8 AS w, (1 + fid % 2) * 8 AS h
      |  FROM s
      |), px AS (
      |  SELECT media_id, j, w, h, tb,
      |    (fid * 53
      |      + ((((tb // 3) // w) // 8) * (w // 8) + ((tb // 3) % w) // 8) * 19)
      |      % 256 AS v
      |  FROM dims CROSS JOIN range(0, 1152) AS rt(tb) WHERE tb < w * h * 3
      |), fr AS (
      |  SELECT media_id, j, SUM(v) AS sum_samples
      |  FROM px GROUP BY media_id, j
      |), lagged AS (
      |  SELECT media_id,
      |    ABS(sum_samples - LAG(sum_samples) OVER (
      |      PARTITION BY media_id ORDER BY j)) AS delta
      |  FROM fr
      |)
      |SELECT media_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_frames,
      |  CAST(SUM(CASE WHEN delta > 2000 THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
      |  CAST(COALESCE(SUM(delta), 0) AS BIGINT) AS total_delta,
      |  CAST(COALESCE(MAX(delta), 0) AS BIGINT) AS max_delta
      |FROM lagged GROUP BY media_id ORDER BY media_id""".stripMargin

  // --- tokenizer fertility per source (q155) -------------------------------

  /** q155: TOKENIZER FERTILITY per source — chars-per-BPE-token, the
    * readout that tells a pipeline which sources tokenize poorly (low
    * fertility = byte-soup the vocab never learned). Reuses the q150
    * trained merges (the per-corpus memo: train once, report many) and
    * rolls q151's per-token BPE counts up per SOURCE at 10⁻³ fixed
    * point: fertility_fp = Σchars·1000 div Σbpe. Exact integers.
    *
    * Scale shape: q151's pure-map replace chain + ONE source-keyed
    * partial agg (sources ≪ corpus). */
  def q155Fertility(s: SparkSession, dir: String): DataFrame = {
    val merges = ScaleOps17.bpeTrain(s, dir)
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val toks = docs.select(col("source"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .filter(length(col("tok")) >= 1)
    toks
      .withColumn("n_bpe", graft.text.Bpe.bpeCountOf(col("tok"), merges))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(length(col("tok"))).as("n_chars"),
        sum(col("n_bpe")).cast("long").as("n_bpe_tokens"))
      .withColumn("fertility_fp",
        expr("CAST(n_chars * 1000 div n_bpe_tokens AS BIGINT)"))
      .orderBy(col("source"))
  }

  /** Mirror: the q150 CTE chain (re-derives the merges), the q151 apply
    * chain keyed by source. */
  val q155Sql: String = {
    val rounds = ScaleOps17.BpeRounds
    val applyChain = (1 to rounds).foldLeft("regexp_replace(tok, '(.)', ' \\1 ', 'g')") {
      case (acc, r) =>
        s"replace($acc, ' ' || m$r.p1 || '  ' || m$r.p2 || ' ', ' ' || m$r.p1 || m$r.p2 || ' ')"
    }
    ScaleOps17.bpeSqlRounds(rounds) +
      s""",
        |dtoks AS (
        |  SELECT source, tok FROM (
        |    SELECT source,
        |      unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
        |    FROM documents)
        |  WHERE len(tok) >= 1
        |), enc AS (
        |  SELECT source, tok,
        |    len(string_split(trim($applyChain), '  ')) AS n_bpe
        |  FROM dtoks ${(1 to rounds).map(r => s"CROSS JOIN m$r").mkString(" ")}
        |), rolled AS (
        |  SELECT source,
        |    CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(SUM(len(tok)) AS BIGINT) AS n_chars,
        |    CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens
        |  FROM enc GROUP BY source
        |)
        |SELECT source, n_tokens, n_chars, n_bpe_tokens,
        |  CAST(n_chars * 1000 // n_bpe_tokens AS BIGINT) AS fertility_fp
        |FROM rolled ORDER BY source""".stripMargin
  }

  // --- vocabulary growth / Heaps-law readout (q156) ------------------------

  /** q156: VOCABULARY GROWTH over ingest order (the Heaps-law readout —
    * "is the vocabulary still growing, or has the crawl gone stale?"):
    * docs bucket into 10 id-range deciles (VALUE-based: bucket =
    * (doc_id − min)·10 div (max − min + 1) — broadcast min/max, no
    * global row-number window, so the op has no single-task stage at
    * any scale), each token's FIRST bucket is a vocab-sized min
    * aggregate, and the curve is a 10-row cumulative sum: per decile,
    * token volume, new types, cumulative vocabulary. Exact integers.
    *
    * Scale shape: one corpus-sized token partial agg (min bucket per
    * type), one 10-row window — nothing else. */
  def q156VocabGrowth(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val bounds = broadcast(docs.agg(
      min(col("doc_id").cast("long")).as("lo"),
      max(col("doc_id").cast("long")).as("hi")))
    val toks = docs.select(col("doc_id").cast("long").as("did"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .filter(length(col("tok")) >= 1)
      .crossJoin(bounds)
      .withColumn("bucket",
        expr("CAST((did - lo) * 10 div (hi - lo + 1) AS INT)"))
    val volume = toks.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_tokens"))
    val firsts = toks.groupBy(col("tok"))
      .agg(min(col("bucket")).as("fb"))
      .groupBy(col("fb")).agg(count(lit(1)).as("new_types"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    volume
      .join(firsts.withColumnRenamed("fb", "bucket"), Seq("bucket"), "left")
      .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
      .withColumn("vocab", sum(col("new_types")).over(w))
      .select(col("bucket"), col("n_tokens"), col("new_types"), col("vocab"))
      .orderBy(col("bucket"))
  }

  val q156Sql: String =
    raw"""WITH bounds AS (
      |  SELECT MIN(CAST(doc_id AS BIGINT)) AS lo,
      |         MAX(CAST(doc_id AS BIGINT)) AS hi
      |  FROM documents
      |), toks AS (
      |  SELECT CAST((CAST(doc_id AS BIGINT) - lo) * 10 // (hi - lo + 1) AS INTEGER) AS bucket,
      |    tok
      |  FROM (
      |    SELECT doc_id,
      |      unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      |    FROM documents) CROSS JOIN bounds
      |  WHERE len(tok) >= 1
      |), volume AS (
      |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens
      |  FROM toks GROUP BY bucket
      |), firsts AS (
      |  SELECT fb AS bucket, CAST(COUNT(*) AS BIGINT) AS new_types FROM (
      |    SELECT tok, MIN(bucket) AS fb FROM toks GROUP BY tok)
      |  GROUP BY fb
      |)
      |SELECT v.bucket, v.n_tokens,
      |  CAST(COALESCE(f.new_types, 0) AS BIGINT) AS new_types,
      |  CAST(SUM(COALESCE(f.new_types, 0)) OVER (
      |    ORDER BY v.bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab
      |FROM volume v LEFT JOIN firsts f ON f.bucket = v.bucket
      |ORDER BY v.bucket""".stripMargin

  // --- incremental batch-vs-history dedup (q157) ---------------------------

  /** q157: INCREMENTAL dedup — today's crawl against yesterday's corpus
    * (doc parity stands in for the batch split: even = history, odd =
    * new batch): per NEW document, the fraction of its 8-token shingles
    * already present anywhere in HISTORY, at 10⁻⁶ fixed point, with a
    * ≥30 % quarantine flag. The production shape of the q85 machinery:
    * the candidate side is a batch, the filter side is an index-shaped
    * DISTINCT hash set.
    *
    * Scale shape: history collapses to DISTINCT shingle hashes (one
    * partial-agg exchange — at 100 TB this set is the persisted
    * fingerprint index, not a recompute); the batch side LEFT
    * SEMI-joins its shingles against it on the 8-byte hash and rolls up
    * per doc. Strings never leave the kernel (FNV-1a-64, the q21–q23
    * oracle-proven hash). */
  def q157IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val toks = docs.select(col("doc_id"),
      graft.text.TextAnalysis.tokens(col("text")).as("t"))
    val ph = toks.select(col("doc_id"),
      explode(column(graft.functions.SlidingShingleHashes(
        expression(col("t")), 8))).as("h"))
    val history = ph.filter(col("doc_id") % 2 === 0).select(col("h")).distinct()
    val batch = ph.filter(col("doc_id") % 2 === 1)
    val hits = batch.join(history, Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hist_dup"))
    batch.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_hist_dup", coalesce(col("n_hist_dup"), lit(0L)))
      .withColumn("dup_fp",
        expr("CAST(n_hist_dup * 1000000 div n_shingles AS BIGINT)"))
      .withColumn("quarantined", col("dup_fp") >= 300000L)
      .select(col("doc_id"), col("n_shingles"), col("n_hist_dup"),
        col("dup_fp"), col("quarantined"))
      .orderBy(col("doc_id"))
  }

  /** Mirror: the q85 FNV-1a-64 HUGEINT chain, split by parity. */
  val q157Sql: String = {
    val fnvScalar =
      """list_reduce(
        |      list_prepend(14695981039346656037::HUGEINT,
        |        [ord(substr(s, i, 1))::HUGEINT FOR i IN range(1, length(s) + 1)]),
        |      (acc, b) -> (xor(acc, b) * 1099511628211) % 18446744073709551616::HUGEINT)""".stripMargin
    raw"""WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents
      |), pos AS (
      |  SELECT doc_id, unnest(range(0, greatest(len(t) - 7, 0))) AS p, t FROM toks
      |), ph AS (
      |  SELECT doc_id, $fnvScalar AS hv
      |  FROM (SELECT doc_id, p, array_to_string(t[p + 1 : p + 8], ' ') AS s FROM pos)
      |), hist AS (
      |  SELECT DISTINCT hv FROM ph WHERE doc_id % 2 = 0
      |), batch AS (
      |  SELECT doc_id, hv FROM ph WHERE doc_id % 2 = 1
      |), rolled AS (
      |  SELECT b.doc_id,
      |    COUNT(*) AS n_shingles,
      |    SUM(CASE WHEN hist.hv IS NOT NULL THEN 1 ELSE 0 END) AS n_hist_dup
      |  FROM batch b LEFT JOIN hist ON b.hv = hist.hv
      |  GROUP BY b.doc_id
      |)
      |SELECT doc_id,
      |  CAST(n_shingles AS BIGINT) AS n_shingles,
      |  CAST(n_hist_dup AS BIGINT) AS n_hist_dup,
      |  CAST(n_hist_dup * 1000000 // n_shingles AS BIGINT) AS dup_fp,
      |  n_hist_dup * 1000000 // n_shingles >= 300000 AS quarantined
      |FROM rolled ORDER BY doc_id""".stripMargin
  }

  // --- successor branching factor (q158) -----------------------------------

  /** q158: NEXT-TOKEN BRANCHING for the top-20 unigrams — how
    * predictable is the text after its commonest words: distinct
    * successor types, successor volume, the top successor (tie-break:
    * count desc, token asc) and its share at 10⁻⁶ fixed point. High
    * top-share + low branching = templated/boilerplate context; the
    * conditional-distribution readout behind the q89 bigram-LM axis.
    *
    * Scale shape: one bigram partial agg (the q153 table), one
    * vocab-sized unigram agg for the top-20 anchor set, per-anchor
    * rollups over the ≤|V| successor table — nothing corpus-sized past
    * the two partial aggs. */
  def q158Branching(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val toks = docs.select(col("doc_id"),
      graft.text.TextAnalysis.tokens(col("text")).as("ts"))
    val uni = toks.select(explode(col("ts")).as("tok"))
      .filter(length(col("tok")) >= 1)
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val top = uni
      .withColumn("rank", row_number().over(
        Window.orderBy(col("c").desc, col("tok"))))
      .filter(col("rank") <= 20)
    val bi = toks
      .filter(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ts) - 1), " +
          "i -> named_struct('w1', element_at(ts, i), 'w2', element_at(ts, i + 1)))"))
        .as("b"))
      .filter(length(col("b.w1")) >= 1 && length(col("b.w2")) >= 1)
      .groupBy(col("b.w1").as("tok"), col("b.w2").as("succ"))
      .agg(count(lit(1)).as("sc"))
    val anchored = bi.join(broadcast(top.select(col("tok"), col("rank"), col("c"))), Seq("tok"))
    val wTop = Window.partitionBy(col("tok"))
      .orderBy(col("sc").desc, col("succ"))
    anchored
      .withColumn("srank", row_number().over(wTop))
      .groupBy(col("rank"), col("tok"), col("c"))
      .agg(count(lit(1)).as("n_succ_types"),
        sum(col("sc")).as("n_succ"),
        max(when(col("srank") === 1, col("succ"))).as("top_succ"),
        max(when(col("srank") === 1, col("sc"))).as("top_succ_cnt"))
      .withColumn("top_share_fp",
        expr("CAST(top_succ_cnt * 1000000 div n_succ AS BIGINT)"))
      .select(col("rank"), col("tok"), col("c"), col("n_succ_types"),
        col("n_succ"), col("top_succ"), col("top_share_fp"))
      .orderBy(col("rank"))
  }

  val q158Sql: String =
    raw"""WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ts
      |  FROM documents
      |), uni AS (
      |  SELECT tok, COUNT(*) AS c FROM (
      |    SELECT unnest(ts) AS tok FROM toks) WHERE len(tok) >= 1
      |  GROUP BY tok
      |), top AS (
      |  SELECT tok, c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rank
      |  FROM uni QUALIFY rank <= 20
      |), bi AS (
      |  SELECT w1 AS tok, w2 AS succ, COUNT(*) AS sc FROM (
      |    SELECT ts[g] AS w1, ts[g + 1] AS w2 FROM (
      |      SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS g FROM toks))
      |  WHERE len(w1) >= 1 AND len(w2) >= 1
      |  GROUP BY w1, w2
      |), anchored AS (
      |  SELECT top.rank, top.tok, top.c, bi.succ, bi.sc,
      |    ROW_NUMBER() OVER (PARTITION BY top.tok
      |                       ORDER BY bi.sc DESC, bi.succ) AS srank
      |  FROM bi JOIN top ON bi.tok = top.tok
      |), rolled AS (
      |  SELECT rank, tok, c,
      |    COUNT(*) AS n_succ_types,
      |    SUM(sc) AS n_succ,
      |    MAX(CASE WHEN srank = 1 THEN succ END) AS top_succ,
      |    MAX(CASE WHEN srank = 1 THEN sc END) AS top_succ_cnt
      |  FROM anchored GROUP BY rank, tok, c
      |)
      |SELECT rank, tok, CAST(c AS BIGINT) AS c,
      |  CAST(n_succ_types AS BIGINT) AS n_succ_types,
      |  CAST(n_succ AS BIGINT) AS n_succ,
      |  top_succ,
      |  CAST(top_succ_cnt * 1000000 // n_succ AS BIGINT) AS top_share_fp
      |FROM rolled ORDER BY rank""".stripMargin
}
