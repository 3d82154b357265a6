package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Relational.t

/** Round-9 batch 4: the PNG-capable auto-sniffed image surface (q101)
  * and three data-quality/behavioral ops — per-source Tukey outlier
  * fences (q102), event-type Markov transitions (q103), and
  * integer-exact trailing-window anomaly flags (q104).
  *
  * Shared discipline (the ScaleOps7 rules): cross-engine-compared
  * numbers are exact integers or a SINGLE IEEE operation on exact
  * int64s; the one double-on-double surface (q102's fences) reuses the
  * q34/q76-proven percentile equivalence and mirrors the arithmetic
  * tree verbatim. */
object ScaleOps8 {

  // --- auto-sniffed image decode over a mixed PPM/PNG corpus (q101) -------

  /** q101: REAL image decode over a MIXED-format corpus — even ids carry
    * PPM (P6) bytes, odd ids carry PNG bytes ([[graft.multimodal.Png]]:
    * real zlib DEFLATE, real CRC-32 chunk verification, all five
    * scanline predictors exercised via the per-row filter law), and ONE
    * auto-sniffing kernel ([[graft.multimodal.ImageDecode]]) dispatches
    * on the actual magic bytes — `ingest.Detect`'s format-sniffing
    * discipline applied at the media layer. The oracle re-derives every
    * pixel from the two fixture byte laws without touching bytes, so the
    * stats only hash-match if signature parse, chunk CRCs, inflate, and
    * the unfilter chain are all exactly right.
    *
    * The compressed byte count is deliberately NOT in the output: it is
    * a deflate-implementation detail, not image semantics.
    *
    * Scale shape: pure map — fixture synthesis, decode, and stats in one
    * WholeStageCodegen projection, no exchange until the presentation
    * order-by. A corrupt blob degrades to a NULL row, never an error. */
  def q101ImageDecode(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val media = docs.select(
      col("doc_id").cast("long").as("media_id"),
      when(col("doc_id") % 2 === 0,
        column(graft.multimodal.PpmFixture(
          expression(col("doc_id").cast("long")))))
        .otherwise(column(graft.multimodal.PngFixture(
          expression(col("doc_id").cast("long"))))).as("content"))
    graft.multimodal.Multimodal.decodeImageStats(media)
      .drop("n_bytes") // deflate-implementation detail, not image semantics
      .orderBy(col("media_id"))
  }

  /** DuckDB mirror of q101: both fixture laws are pure id arithmetic —
    * dims 3+id%3 x 2+id%2 either way; sample j is (id·31+j·7) mod 256
    * for the PPM arm (even ids) and (id·37+j·11) mod 256 for the PNG
    * arm (odd ids) — so Σ samples, the order-sensitive checksum
    * Σ v·(1+j mod 97), and the single-division mean all re-derive in
    * SQL. 45 = the max raster (5·3·3 samples). */
  val q101Sql: String =
    """WITH d AS (
      |  SELECT CAST(doc_id AS BIGINT) AS media_id,
      |    3 + doc_id % 3 AS w, 2 + doc_id % 2 AS h
      |  FROM documents
      |), px AS (
      |  SELECT media_id, w, h, j,
      |    CASE WHEN media_id % 2 = 0 THEN (media_id * 31 + j * 7) % 256
      |         ELSE (media_id * 37 + j * 11) % 256 END AS v
      |  FROM d CROSS JOIN range(0, 45) AS r(j) WHERE j < w * h * 3
      |), agg AS (
      |  SELECT media_id, w, h,
      |    SUM(v) AS sum_samples,
      |    SUM(v * (1 + j % 97)) AS checksum
      |  FROM px GROUP BY media_id, w, h
      |)
      |SELECT media_id,
      |  CASE WHEN media_id % 2 = 0 THEN 'ppm' ELSE 'png' END AS format,
      |  CAST(w AS INTEGER) AS width,
      |  CAST(h AS INTEGER) AS height,
      |  CAST(w * h AS INTEGER) AS n_pixels,
      |  CAST(sum_samples AS BIGINT) AS sum_samples,
      |  CAST(checksum AS BIGINT) AS checksum,
      |  CAST(sum_samples AS DOUBLE) / CAST(w * h * 3 AS DOUBLE) AS mean_sample
      |FROM agg ORDER BY media_id""".stripMargin

  // --- per-source Tukey outlier fences (q102) ------------------------------

  /** q102: distribution-based outlier detection — the data-profiling op
    * behind automated quality gates: per source, exact Q1/Q3 of document
    * length, Tukey fences at 1.5·IQR, and the count/share of documents
    * outside them. The reference profiles columns (null/len stats); this
    * is the next profiling step — WHICH rows are anomalous, not just the
    * moments. Exact `percentile` (the q34/q76-proven quantile_cont
    * equivalence) keeps the fences bit-identical across engines; the
    * fence arithmetic tree (q1 − 1.5·iqr, q3 + 1.5·iqr) is mirrored
    * verbatim so the boundary comparisons agree on every row.
    *
    * Scale shape: one partial-agg exchange to the per-source stats table
    * (sources ≪ docs), broadcast back onto the corpus (never a
    * doc-sized shuffle), one partial-agg rollup. At 100 TB the exact
    * percentile swaps for approx_percentile exactly as q76 documents. */
  def q102OutlierFences(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.fanOut(t(s, dir, "documents"))
      .select(col("source"), col("n_chars"))
    val stats = docs.groupBy(col("source")).agg(
      percentile(col("n_chars"), lit(0.25)).as("q1"),
      percentile(col("n_chars"), lit(0.75)).as("q3"))
    val fenced = docs.join(broadcast(stats), Seq("source"))
      .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
      .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
    fenced.groupBy(col("source"), col("q1"), col("q3"), col("lo"), col("hi"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_chars") < col("lo"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("n_chars") > col("hi"), 1L).otherwise(0L)).as("n_high"))
      .withColumn("outlier_share",
        (col("n_low") + col("n_high")).cast("double") / col("n_docs").cast("double"))
      .select(col("source"), col("n_docs"), col("q1"), col("q3"),
        col("lo"), col("hi"), col("n_low"), col("n_high"), col("outlier_share"))
      .orderBy(col("source"))
  }

  /** DuckDB mirror of q102: quantile_cont = Spark `percentile` (proven
    * q34/q76); the fence trees and the share division are written in the
    * same operation order. */
  val q102Sql: String =
    """WITH stats AS (
      |  SELECT source,
      |    quantile_cont(n_chars, 0.25) AS q1,
      |    quantile_cont(n_chars, 0.75) AS q3
      |  FROM documents GROUP BY source
      |), fenced AS (
      |  SELECT d.source, d.n_chars, s.q1, s.q3,
      |    s.q1 - (s.q3 - s.q1) * 1.5 AS lo,
      |    s.q3 + (s.q3 - s.q1) * 1.5 AS hi
      |  FROM documents d JOIN stats s ON d.source = s.source
      |)
      |SELECT source,
      |  COUNT(*) AS n_docs, q1, q3, lo, hi,
      |  CAST(SUM(CASE WHEN n_chars < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
      |  CAST(SUM(CASE WHEN n_chars > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
      |  CAST(SUM(CASE WHEN n_chars < lo THEN 1 ELSE 0 END)
      |     + SUM(CASE WHEN n_chars > hi THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS outlier_share
      |FROM fenced GROUP BY source, q1, q3, lo, hi
      |ORDER BY source""".stripMargin

  // --- event-type Markov transition matrix (q103) --------------------------

  /** q103: first-order Markov transitions over per-user event streams —
    * the behavioral model behind next-action prediction and
    * funnel-dropoff diagnosis (q99's funnel is one PATH through this
    * matrix): for each user's time-ordered stream, count (type → next
    * type) transitions, then the per-from transition probability. The
    * (ts, event_id) ordering tiebreak is the q09/q27 convention.
    *
    * Scale shape: one user-keyed exchange for the lead() window (same
    * partitioning q27's sessionizer uses), one partial-agg exchange to
    * the (from, to) count table — at most |types|² rows, so the
    * probability window over from_type runs on a trivially small
    * table. No event-sized shuffle after the first. */
  def q103Transitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Relational.events(s, dir)
      .select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_from",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .withColumn("prob", col("n").cast("double") / col("n_from").cast("double"))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"), col("prob"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** DuckDB mirror of q103: same lead() window, same tiebreak, same
    * single int64/int64 division. */
  val q103Sql: String =
    """WITH nxt AS (
      |  SELECT event_type AS from_type,
      |    LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events
      |), c AS (
      |  SELECT from_type, to_type, COUNT(*) AS n
      |  FROM nxt WHERE to_type IS NOT NULL
      |  GROUP BY from_type, to_type
      |)
      |SELECT from_type, to_type, n,
      |  CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from,
      |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS prob
      |FROM c ORDER BY from_type, to_type""".stripMargin

  // --- integer-exact trailing-window anomaly flags (q104) ------------------

  /** q104: time-series anomaly detection on daily event volume with ZERO
    * floating point — the monitoring op a production ingest ledger
    * needs (the reference emails failures; a volume collapse or spike
    * is the failure you can't see row-by-row). Each day compares
    * against its trailing 7-day window by the 3σ rule with the algebra
    * cleared of divisions and square roots:
    *
    *   |cnt − mean| > 3·stddev   ⇔   (n·cnt − Σ)² > 9·(n·Σx² − Σ²)
    *
    * — both sides exact int64, so the flag is bit-reproducible in any
    * engine (a double-σ formulation would hash-diverge at the
    * boundary). Warm-up days (fewer than 7 prior days) emit n7 < 7 and
    * flag=false, distinguishable by the n7 column.
    *
    * Scale shape: one partial-agg exchange to the per-day table; the
    * trailing window then runs on ~days rows — the q08 global-top-k
    * class (bounded input), where a single-partition window is the
    * right plan, not a hazard. */
  def q104VolumeAnomaly(s: SparkSession, dir: String): DataFrame = {
    val daily = Relational.events(s, dir)
      .select(datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("day")).rowsBetween(-7, -1)
    daily
      .withColumn("n7", count(col("cnt")).over(w))
      .withColumn("sum7", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("sumsq7", coalesce(sum(col("cnt") * col("cnt")).over(w), lit(0L)))
      .withColumn("is_anomaly",
        col("n7") === 7 &&
          (col("n7") * col("cnt") - col("sum7")) * (col("n7") * col("cnt") - col("sum7"))
            > lit(9L) * (col("n7") * col("sumsq7") - col("sum7") * col("sum7")))
      .select(col("day"), col("cnt"), col("n7"), col("sum7"), col("sumsq7"),
        col("is_anomaly"))
      .orderBy(col("day"))
  }

  /** DuckDB mirror of q104: same frame (7 PRECEDING AND 1 PRECEDING),
    * same cleared-integer 3σ inequality. Gaps in the day sequence are
    * part of the law on both sides (ROWS frame, not RANGE — the window
    * is "last 7 OBSERVED days", the robust choice when a source can go
    * dark). */
  val q104Sql: String =
    """WITH daily AS (
      |  SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
      |    COUNT(*) AS cnt
      |  FROM events GROUP BY 1
      |), win AS (
      |  SELECT day, cnt,
      |    COUNT(cnt) OVER w AS n7,
      |    CAST(COALESCE(SUM(cnt) OVER w, 0) AS BIGINT) AS sum7,
      |    CAST(COALESCE(SUM(cnt * cnt) OVER w, 0) AS BIGINT) AS sumsq7
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
      |)
      |SELECT CAST(day AS INTEGER) AS day, cnt, n7, sum7, sumsq7,
      |  n7 = 7 AND
      |    (n7 * cnt - sum7) * (n7 * cnt - sum7) > 9 * (n7 * sumsq7 - sum7 * sum7)
      |    AS is_anomaly
      |FROM win ORDER BY day""".stripMargin
  // --- leading-path mining (q105) ------------------------------------------

  /** q105: entry-path mining — each user's first three event types as an
    * ordered path string, rolled up to path frequencies: the onboarding
    * diagnosis behind q99's funnel (the funnel asks "did they reach
    * stage N"; this asks "what did they actually do first"). Ordering
    * is the (ts, event_id) tiebreak convention; the path string is
    * assembled from an array SORTED BY RANK, never from collect_list's
    * arrival order (which is partition-nondeterministic).
    *
    * Scale shape: one user-keyed exchange for the rank window (shared
    * convention with q27/q103), rank≤3 truncation map-side BEFORE the
    * path rollup, then a partial-agg exchange on the path string — at
    * most |types|³ distinct paths, a bounded table. */
  def q105SessionPaths(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Relational.events(s, dir)
      .select(col("user_id"), col("event_type"), row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .groupBy(col("user_id"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("rn"),
        col("event_type")))), x => x.getField("event_type")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
  }

  /** DuckDB mirror of q105: string_agg ORDER BY rank is the same
    * sorted-assembly the engine does with array_sort. */
  val q105Sql: String =
    """WITH ranked AS (
      |  SELECT user_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events
      |), paths AS (
      |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      |  FROM ranked WHERE rn <= 3 GROUP BY user_id
      |)
      |SELECT path, COUNT(*) AS n_users
      |FROM paths GROUP BY path
      |ORDER BY n_users DESC, path""".stripMargin

  // --- integer-exact two-proportion A/B test (q106) ------------------------

  /** q106: experiment readout — two-proportion conversion comparison
    * with the z-test algebra cleared to pure int64, so "significant" is
    * a bit-reproducible flag, not a float that may straddle the
    * threshold differently per engine. Variant assignment is the
    * deterministic user_id parity split; for each candidate conversion
    * type, exposure = all distinct users, conversion = users with ≥1
    * such event, and
    *
    *   z² > 4  (the 2σ rule)  ⇔  (c₁n₂ − c₂n₁)²·N > 4·n₁n₂·c·(N−c)
    *
    * with N = n₁+n₂, c = c₁+c₂ — both sides exact integers (int64-safe
    * to ~10⁴ users per arm; beyond that the cleared form moves to
    * DECIMAL, documented here rather than silently overflowing). z² is
    * also emitted as ONE division of the two exact sides (·4 removed),
    * mirrored verbatim.
    *
    * Scale shape: distinct (variant, user, converted?) collapses
    * event-sized data in ONE partial-agg pass per side; everything
    * after runs on ≤2·|types| rows. */
  def q106AbTest(s: SparkSession, dir: String): DataFrame = {
    val events = Relational.events(s, dir)
      .select(col("user_id"), col("event_type"),
        (col("user_id") % 2).cast("int").as("variant"))
    val exposed = events.select(col("variant"), col("user_id")).distinct()
      .groupBy(col("variant")).agg(count(lit(1)).as("n"))
    val conv = events.filter(col("event_type").isin("signup", "purchase"))
      .select(col("variant"), col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type"), col("variant")).agg(count(lit(1)).as("c"))
    val wide = conv.join(broadcast(exposed), Seq("variant"))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("variant") === 0, col("n")).otherwise(0L)).as("n0"),
        sum(when(col("variant") === 0, col("c")).otherwise(0L)).as("c0"),
        sum(when(col("variant") === 1, col("n")).otherwise(0L)).as("n1"),
        sum(when(col("variant") === 1, col("c")).otherwise(0L)).as("c1"))
    wide
      .withColumn("num",
        (col("c0") * col("n1") - col("c1") * col("n0"))
          * (col("c0") * col("n1") - col("c1") * col("n0"))
          * (col("n0") + col("n1")))
      .withColumn("den",
        col("n0") * col("n1") * (col("c0") + col("c1"))
          * (col("n0") + col("n1") - col("c0") - col("c1")))
      // den = 0 ⇔ zero or total conversion in BOTH arms pooled (c=0 or
      // c=N), which forces num = 0 as well — the undefined-z² cases are
      // exactly the no-evidence cases: z² NULL, flag false, both engines.
      .withColumn("z2",
        col("num").cast("double") / nullif(col("den"), lit(0L)).cast("double"))
      .withColumn("significant", col("num") > lit(4L) * col("den"))
      .select(col("event_type"), col("n0"), col("c0"), col("n1"), col("c1"),
        col("z2"), col("significant"))
      .orderBy(col("event_type"))
  }

  /** DuckDB mirror of q106: identical distinct/rollup chain and the same
    * cleared-integer inequality; the one division is int64/int64. */
  val q106Sql: String =
    """WITH exposed AS (
      |  SELECT CAST(user_id % 2 AS INTEGER) AS variant,
      |    COUNT(DISTINCT user_id) AS n
      |  FROM events GROUP BY 1
      |), conv AS (
      |  SELECT event_type, CAST(user_id % 2 AS INTEGER) AS variant,
      |    COUNT(DISTINCT user_id) AS c
      |  FROM events WHERE event_type IN ('signup', 'purchase')
      |  GROUP BY 1, 2
      |), wide AS (
      |  SELECT conv.event_type,
      |    CAST(SUM(CASE WHEN conv.variant = 0 THEN exposed.n ELSE 0 END) AS BIGINT) AS n0,
      |    CAST(SUM(CASE WHEN conv.variant = 0 THEN conv.c ELSE 0 END) AS BIGINT) AS c0,
      |    CAST(SUM(CASE WHEN conv.variant = 1 THEN exposed.n ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN conv.variant = 1 THEN conv.c ELSE 0 END) AS BIGINT) AS c1
      |  FROM conv JOIN exposed ON conv.variant = exposed.variant
      |  GROUP BY conv.event_type
      |)
      |SELECT event_type, n0, c0, n1, c1,
      |  CAST((c0*n1 - c1*n0) * (c0*n1 - c1*n0) * (n0+n1) AS DOUBLE)
      |    / CAST(NULLIF(n0*n1 * (c0+c1) * (n0+n1-c0-c1), 0) AS DOUBLE) AS z2,
      |  (c0*n1 - c1*n0) * (c0*n1 - c1*n0) * (n0+n1)
      |    > 4 * n0*n1 * (c0+c1) * (n0+n1-c0-c1) AS significant
      |FROM wide ORDER BY event_type""".stripMargin

  // --- three-format image sniff incl. GIF/LZW (q107) -----------------------

  /** q107: the image surface widened to THREE real codecs in one
    * auto-sniffed scan — ids cycle PPM (raw P6 raster), PNG (zlib
    * DEFLATE, [[graft.multimodal.Png]]), and GIF ([[graft.multimodal.Gif]]:
    * REAL variable-width LZW with dictionary growth, clear/end codes,
    * sub-block framing, palette mapping — a from-spec implementation of
    * the second compression ALGORITHM in the engine after DEFLATE).
    * The GIF arm's oracle re-derives RGB as palette[index] with both
    * the palette and index laws in pure id arithmetic, so the stats
    * only match if LZW decompression reconstructs every pixel index
    * exactly.
    *
    * Scale shape: identical to q101 — pure map, decode in the scan
    * stage, no exchange before the presentation order-by. */
  def q107GifMixed(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val id = col("doc_id").cast("long")
    val media = docs.select(
      id.as("media_id"),
      when(id % 3 === 0, column(graft.multimodal.PpmFixture(expression(id))))
        .when(id % 3 === 1, column(graft.multimodal.PngFixture(expression(id))))
        .otherwise(column(graft.multimodal.GifFixture(expression(id))))
        .as("content"))
    graft.multimodal.Multimodal.decodeImageStats(media)
      .drop("n_bytes") // compression-implementation detail (q101 rule)
      .orderBy(col("media_id"))
  }

  /** DuckDB mirror of q107: dims 3+id%3 x 2+id%2 for all formats;
    * sample j is (id·31+j·7) mod 256 for PPM, (id·37+j·11) mod 256 for
    * PNG, and palette[(id·43+⌊j/3⌋·7) mod 16] for GIF, where palette
    * channel c is (id·17+c·29) mod 256 — every law pure id arithmetic. */
  val q107Sql: String =
    """WITH d AS (
      |  SELECT CAST(doc_id AS BIGINT) AS media_id,
      |    3 + doc_id % 3 AS w, 2 + doc_id % 2 AS h
      |  FROM documents
      |), px AS (
      |  SELECT media_id, w, h, j,
      |    CASE media_id % 3
      |      WHEN 0 THEN (media_id * 31 + j * 7) % 256
      |      WHEN 1 THEN (media_id * 37 + j * 11) % 256
      |      ELSE (media_id * 17
      |        + (((media_id * 43 + (j // 3) * 7) % 16) * 3 + j % 3) * 29) % 256
      |    END AS v
      |  FROM d CROSS JOIN range(0, 45) AS r(j) WHERE j < w * h * 3
      |), agg AS (
      |  SELECT media_id, w, h,
      |    SUM(v) AS sum_samples,
      |    SUM(v * (1 + j % 97)) AS checksum
      |  FROM px GROUP BY media_id, w, h
      |)
      |SELECT media_id,
      |  CASE media_id % 3 WHEN 0 THEN 'ppm' WHEN 1 THEN 'png' ELSE 'gif'
      |    END AS format,
      |  CAST(w AS INTEGER) AS width,
      |  CAST(h AS INTEGER) AS height,
      |  CAST(w * h AS INTEGER) AS n_pixels,
      |  CAST(sum_samples AS BIGINT) AS sum_samples,
      |  CAST(checksum AS BIGINT) AS checksum,
      |  CAST(sum_samples AS DOUBLE) / CAST(w * h * 3 AS DOUBLE) AS mean_sample
      |FROM agg ORDER BY media_id""".stripMargin

  // --- 2-D skyline via per-key pre-reduction (q108) ------------------------

  /** q108: the skyline (Pareto-frontier) operator from the OLAP
    * literature — parts that no other part beats on BOTH size and
    * retail price (minimize both). The naive formulation is an O(n²)
    * domination anti-join; the scalable identity used here is that the
    * 2-D skyline survives per-key pre-reduction: any part that is not
    * min-price for its size is dominated by the one that is, so the
    * frontier computes over ≤|sizes| rows — one partial-agg exchange,
    * then a running-min window on a BOUNDED key domain (the q08/q104
    * class). A point is on the frontier iff its price is strictly
    * below every smaller size's min price (ties lose to the smaller
    * size: equal price + strictly larger size = dominated).
    *
    * Emits the frontier with n_candidates at each surviving size —
    * exact integers + the q34-proven decimal surface only. */
  def q108Skyline(s: SparkSession, dir: String): DataFrame = {
    val parts = Relational.fanOut(t(s, dir, "part"))
      .select(col("p_size"), col("p_retailprice"))
    val bySize = parts.groupBy(col("p_size"))
      .agg(min(col("p_retailprice")).as("min_price"),
        count(lit(1)).as("n_candidates"))
    val w = Window.orderBy(col("p_size"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bySize
      .withColumn("prev_best", min(col("min_price")).over(w))
      .filter(col("prev_best").isNull || col("min_price") < col("prev_best"))
      .select(col("p_size"), col("min_price"), col("n_candidates"))
      .orderBy(col("p_size"))
  }

  /** DuckDB mirror of q108: same pre-reduction + running-min frame. */
  val q108Sql: String =
    """WITH by_size AS (
      |  SELECT p_size, MIN(p_retailprice) AS min_price,
      |    COUNT(*) AS n_candidates
      |  FROM part GROUP BY p_size
      |), sky AS (
      |  SELECT p_size, min_price, n_candidates,
      |    MIN(min_price) OVER (ORDER BY p_size
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_best
      |  FROM by_size
      |)
      |SELECT p_size, min_price, n_candidates
      |FROM sky WHERE prev_best IS NULL OR min_price < prev_best
      |ORDER BY p_size""".stripMargin

  // --- weighted priority sampling (q109) -----------------------------------

  /** q109: deterministic weighted sampling — the corpus-downsampling
    * primitive where longer documents should be likelier survivors:
    * priority = portable_hash(doc_id) div weight (the q51
    * multiplicative-hash bucket, proven engine-identical), keep the k
    * smallest priorities per source. Doubling a document's weight
    * halves its priority scale — weighted priority sampling with ZERO
    * randomness: the same document survives on any engine, layout, or
    * run (the q51/q69 determinism discipline, now weight-aware), and
    * rerunning with a larger k yields a superset.
    *
    * Scale shape: the hash+division is a pure map; one source-keyed
    * exchange for the top-k window with partial WindowGroupLimit
    * truncation map-side (the q49 pattern). */
  def q109WeightedSample(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("priority"), col("doc_id"))
    Relational.fanOut(t(s, dir, "documents"))
      .select(col("source"), col("doc_id"), col("n_chars"),
        graft.ops.Relational3.splitBucket(col("doc_id")).as("bucket"))
      // `div`, not `/`: Spark's / on integers is DOUBLE division, and a
      // cast-back truncation is only floor-exact while the quotient's
      // distance to the next integer (≥ 1/weight) dwarfs the rounding
      // error — an invariant a wider weight column would silently break
      .withColumn("priority", expr("bucket div greatest(n_chars, 1L)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("source"), col("rank"), col("doc_id"), col("n_chars"),
        col("priority"))
      .orderBy(col("source"), col("rank"))
  }

  /** DuckDB mirror of q109: the q51 split-halves hash chain verbatim,
    * then the same floor division and per-source rank. */
  val q109Sql: String =
    """WITH h AS (
      |  SELECT source, doc_id, n_chars, doc_id % 4294967296 AS id32
      |  FROM documents
      |), b AS (
      |  SELECT source, doc_id, n_chars,
      |    ((((id32 // 65536) * 2654435761) % 65536) * 65536
      |      + (id32 % 65536) * 2654435761) % 4294967296 AS bucket
      |  FROM h
      |), p AS (
      |  SELECT source, doc_id, n_chars,
      |    CAST(bucket // GREATEST(n_chars, 1) AS BIGINT) AS priority,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY bucket // GREATEST(n_chars, 1), doc_id) AS rank
      |  FROM b
      |)
      |SELECT source, CAST(rank AS INTEGER) AS rank, doc_id, n_chars, priority
      |FROM p WHERE rank <= 5
      |ORDER BY source, rank""".stripMargin

  // --- distribution-rank window family (q110) ------------------------------

  /** q110: the distribution-rank window family — ntile, percent_rank,
    * cume_dist — over order values within priority classes, completing
    * the window surface past q13/q44/q48's running/nav/frame forms.
    * percent_rank = (rank−1)/(n−1) and cume_dist = peers≤x / n are the
    * SQL-standard laws in BOTH engines (each ONE division of exact
    * int64s), and ntile's remainder-to-early-buckets rule is likewise
    * standard — so the whole family mirrors with no tolerance.
    *
    * Scale shape: one hash exchange on the partition key; ties and
    * bucket boundaries are engine-identical by the standard's
    * definitions, no arbitrary-order hazard (orderkey tiebreak in the
    * presentation sort only). */
  def q110WindowRanks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"))
    Relational.fanOut(t(s, dir, "orders"))
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .orderBy(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
  }

  /** DuckDB mirror of q110: the same standard window functions. */
  val q110Sql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice,
      |  NTILE(4) OVER w AS quartile,
      |  PERCENT_RANK() OVER w AS pct_rank,
      |  CUME_DIST() OVER w AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
      |ORDER BY o_orderpriority, o_totalprice, o_orderkey""".stripMargin

  // --- gaps and islands (q111) ---------------------------------------------

  /** q111: gaps-and-islands over per-user activity days — the classic
    * sequential-SQL operator behind streak and coverage analysis
    * (q56's value-streaks generalized to TIME continuity): consecutive
    * active days group into islands via the day − dense-rank constant,
    * then per user: island count, longest streak, active days, and the
    * total gap days inside the active span. All whole-day integer
    * arithmetic from the q97 epoch convention.
    *
    * Scale shape: distinct (user, day) collapses the event table in a
    * partial agg; ONE user-keyed exchange serves the rank window AND
    * the per-user rollup (same partitioning). */
  def q111GapsIslands(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    Relational.events(s, dir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("day"))
      .distinct()
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"),
        max(col("day")).as("end_day"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        max(col("len")).as("longest_streak"),
        sum(col("len")).as("active_days"),
        (max(col("end_day")) - min(col("start_day")) + 1 - sum(col("len")))
          .as("gap_days"))
      .orderBy(col("user_id"))
  }

  /** DuckDB mirror of q111: same day law, same island constant, same
    * two-level rollup. */
  val q111Sql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id,
      |    datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
      |  FROM events
      |), isl AS (
      |  SELECT user_id, day,
      |    day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS island
      |  FROM days
      |), grp AS (
      |  SELECT user_id, island, COUNT(*) AS len,
      |    MIN(day) AS start_day, MAX(day) AS end_day
      |  FROM isl GROUP BY user_id, island
      |)
      |SELECT user_id,
      |  COUNT(*) AS n_islands,
      |  CAST(MAX(len) AS BIGINT) AS longest_streak,
      |  CAST(SUM(len) AS BIGINT) AS active_days,
      |  CAST(MAX(end_day) - MIN(start_day) + 1 - SUM(len) AS BIGINT) AS gap_days
      |FROM grp GROUP BY user_id ORDER BY user_id""".stripMargin

  // --- four-codec image sniff incl. baseline JPEG (q112) -------------------

  /** q112: the image surface at FOUR real codecs — the id%4 corpus adds
    * baseline JPEG ([[graft.multimodal.Jpeg]]: marker grammar, DHT-driven
    * canonical Huffman entropy decode over the byte-stuffed stream, DC
    * prediction, dequantization, 2-D IDCT) to the PPM/PNG/GIF sniff.
    * JPEG is LOSSY, so its bit-exact oracle rides the DC-exactness
    * configuration: per-block-CONSTANT fixtures with quant step 8, for
    * which the entire FDCT→quantize→Huffman→decode chain provably
    * round-trips exactly (see the Jpeg Scaladoc) while the decoder runs
    * its fully general baseline path. The JPEG arm's pixels re-derive
    * from the block-value law — per-pixel block coordinates computed in
    * SQL — so the hash only matches if entropy decode, prediction,
    * dequant, and the IDCT all land every pixel.
    *
    * Scale shape: q101/q107's pure map — no exchange before the
    * presentation order-by. */
  def q112JpegMixed(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val id = col("doc_id").cast("long")
    val media = docs.select(
      id.as("media_id"),
      when(id % 4 === 0, column(graft.multimodal.PpmFixture(expression(id))))
        .when(id % 4 === 1, column(graft.multimodal.PngFixture(expression(id))))
        .when(id % 4 === 2, column(graft.multimodal.GifFixture(expression(id))))
        .otherwise(column(graft.multimodal.JpegFixture(expression(id))))
        .as("content"))
    graft.multimodal.Multimodal.decodeImageStats(media)
      .drop("n_bytes") // compression-implementation detail (q101 rule)
      .orderBy(col("media_id"))
  }

  /** DuckDB mirror of q112: the q107 laws for the ppm/png/gif arms
    * (dims 3+id%3 x 2+id%2); the JPEG arm has block dims
    * (2+id%2)·8 x (1+id%2)·8 and pixel value = the constant of its 8×8
    * block, v = (id·53 + (by·bw + bx)·19) mod 256 — block coordinates
    * derived per sample index in SQL. */
  val q112Sql: String =
    """WITH d AS (
      |  SELECT CAST(doc_id AS BIGINT) AS media_id,
      |    CASE WHEN doc_id % 4 = 3 THEN (2 + doc_id % 2) * 8
      |         ELSE 3 + doc_id % 3 END AS w,
      |    CASE WHEN doc_id % 4 = 3 THEN (1 + doc_id % 2) * 8
      |         ELSE 2 + doc_id % 2 END AS h
      |  FROM documents
      |), px AS (
      |  SELECT media_id, w, h, j,
      |    CASE media_id % 4
      |      WHEN 0 THEN (media_id * 31 + j * 7) % 256
      |      WHEN 1 THEN (media_id * 37 + j * 11) % 256
      |      WHEN 2 THEN (media_id * 17
      |        + (((media_id * 43 + (j // 3) * 7) % 16) * 3 + j % 3) * 29) % 256
      |      ELSE (media_id * 53
      |        + ((((j // 3) // w) // 8) * (w // 8) + ((j // 3) % w) // 8) * 19) % 256
      |    END AS v
      |  FROM d CROSS JOIN range(0, 1152) AS r(j) WHERE j < w * h * 3
      |), agg AS (
      |  SELECT media_id, w, h,
      |    SUM(v) AS sum_samples,
      |    SUM(v * (1 + j % 97)) AS checksum
      |  FROM px GROUP BY media_id, w, h
      |)
      |SELECT media_id,
      |  CASE media_id % 4 WHEN 0 THEN 'ppm' WHEN 1 THEN 'png'
      |    WHEN 2 THEN 'gif' ELSE 'jpeg' END AS format,
      |  CAST(w AS INTEGER) AS width,
      |  CAST(h AS INTEGER) AS height,
      |  CAST(w * h AS INTEGER) AS n_pixels,
      |  CAST(sum_samples AS BIGINT) AS sum_samples,
      |  CAST(checksum AS BIGINT) AS checksum,
      |  CAST(sum_samples AS DOUBLE) / CAST(w * h * 3 AS DOUBLE) AS mean_sample
      |FROM agg ORDER BY media_id""".stripMargin
}
