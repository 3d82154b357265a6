package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Relational.t

/** Round-9 batch 14: the TIFF/EXIF-grammar layer (q142), DAU/MAU
  * stickiness (q143), and a capped running balance — a NON-LINEAR
  * recurrence no window aggregate can express, handled by the q139
  * explicit-fold machinery (q144). */
object ScaleOps15 {

  /** q142: TIFF decode over a corpus that alternates BYTE ORDER by id
    * parity (even → "II" little-endian, odd → "MM" big-endian) and
    * splits odd rasters into multiple strips written in REVERSE file
    * order — so the stats hash-match only if the IFD tag walk honors
    * both endiannesses AND the StripOffsets/StripByteCounts resolution
    * (the image-side twin of q84's stsz/stsc/stco machinery). Decoded
    * through the same auto-sniffing kernel as q101/q107/q112/q128 —
    * "II"/"MM" join P6/PNG/GIF/JPEG/BMP in one dispatch.
    *
    * Scale shape: pure map — fixture synthesis, sniff, IFD walk, strip
    * assembly, stats in one WholeStageCodegen projection; corrupt blobs
    * degrade to NULL rows. */
  def q142Tiff(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val media = docs.select(
      col("doc_id").cast("long").as("media_id"),
      column(graft.multimodal.TiffFixture(
        expression(col("doc_id").cast("long")))).as("content"))
    graft.multimodal.Multimodal.decodeImageStats(media)
      .drop("n_bytes")
      .orderBy(col("media_id"))
  }

  /** Mirror: the fixture law is pure id arithmetic — (id·47 + j·19) mod
    * 256 over 3+id%3 × 2+id%2 rasters; endianness and strip layout are
    * DECODE-side obstacles the law is independent of, which is the
    * point: only a correct walk reproduces it. */
  val q142Sql: String =
    """WITH d AS (
      |  SELECT CAST(doc_id AS BIGINT) AS media_id,
      |    3 + doc_id % 3 AS w, 2 + doc_id % 2 AS h
      |  FROM documents
      |), px AS (
      |  SELECT media_id, w, h, j, (media_id * 47 + j * 19) % 256 AS v
      |  FROM d CROSS JOIN range(0, 45) AS r(j) WHERE j < w * h * 3
      |), agg AS (
      |  SELECT media_id, w, h,
      |    SUM(v) AS sum_samples,
      |    SUM(v * (1 + j % 97)) AS checksum
      |  FROM px GROUP BY media_id, w, h
      |)
      |SELECT media_id, 'tiff' AS format,
      |  CAST(w AS INTEGER) AS width,
      |  CAST(h AS INTEGER) AS height,
      |  CAST(w * h AS INTEGER) AS n_pixels,
      |  CAST(sum_samples AS BIGINT) AS sum_samples,
      |  CAST(checksum AS BIGINT) AS checksum,
      |  CAST(sum_samples AS DOUBLE) / CAST(w * h * 3 AS DOUBLE) AS mean_sample
      |FROM agg ORDER BY media_id""".stripMargin

  // --- DAU/MAU stickiness (q143) -------------------------------------------

  /** q143: daily active users, trailing-30-day monthly actives, and the
    * DAU/MAU stickiness ratio — the canonical engagement dashboard
    * number. MAU is EXACT (not a sliding approximation): the (user, day)
    * distinct table is exploded 30× (each active day claims membership
    * in the next 30 daily windows) and distinct-counted per window day —
    * the standard exact-sliding-distinct rewrite; the 30× factor is a
    * CONSTANT, and the explode runs on the user-DAY table (already
    * collapsed from events), not the event stream. Output days are
    * restricted to the observed corpus days (the windows a dashboard
    * would show). Stickiness is ONE division of exact counts.
    *
    * Scale shape: one (user, day) distinct exchange from events, a 30×
    * constant-factor explode of that (much smaller) table, one (day)
    * partial-agg distinct; nothing event-sized shuffles twice. */
  def q143Stickiness(s: SparkSession, dir: String): DataFrame = {
    val ev = Relational.events(s, dir)
    val userDays = ev.select(col("user_id"),
        date_trunc("day", col("ts")).as("day")).distinct()
    val dau = userDays.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val membership = userDays
      .select(col("user_id"), explode(sequence(lit(0), lit(29))).as("k"),
        col("day"))
      .select(col("user_id"),
        (col("day") + expr("make_interval(0, 0, 0, k)")).as("wday"))
    val mau = membership.groupBy(col("wday"))
      .agg(countDistinct(col("user_id")).as("mau"))
    dau.join(mau, dau("day") === mau("wday"))
      .select(col("day"), col("dau"), col("mau"),
        (col("dau").cast("double") / col("mau").cast("double")).as("stickiness"))
      .orderBy(col("day"))
  }

  val q143Sql: String =
    """WITH user_days AS (
      |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
      |), dau AS (
      |  SELECT day, COUNT(*) AS dau FROM user_days GROUP BY day
      |), membership AS (
      |  SELECT user_id, day + to_days(CAST(k AS INTEGER)) AS wday
      |  FROM user_days CROSS JOIN range(0, 30) AS r(k)
      |), mau AS (
      |  SELECT wday, COUNT(DISTINCT user_id) AS mau
      |  FROM membership GROUP BY wday
      |)
      |SELECT day, CAST(dau AS BIGINT) AS dau, CAST(mau AS BIGINT) AS mau,
      |  CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE) AS stickiness
      |FROM dau JOIN mau ON day = wday
      |ORDER BY day""".stripMargin

  // --- capped running balance (q144) ---------------------------------------

  /** q144: per-user running balance with a FLOOR AT ZERO — credits and
    * debits in event order, but the balance can never go negative
    * (failed debits are lost, and counted): Sᵢ = max(0, Sᵢ₋₁ + xᵢ). This
    * recurrence is NON-LINEAR — no window aggregate in either engine can
    * express it (a plain running sum lets the floor "remember" through
    * negatives) — so it runs on the q139 explicit-fold machinery:
    * per-user event deltas in integer cents, sorted by (ts, event_id)
    * via a single packed int64 (rank·10¹⁰ + shifted cents), folded left
    * with the cap inside the lambda. Alternating credit/debit sign comes
    * from event_id parity; the readout is each user's final balance,
    * floor-hit count (packed into the fold accumulator: hits·10¹⁴ +
    * balance), and deposit/withdrawal totals as cross-checkable sums.
    *
    * Scale shape: one user-partitioned window (rank), one groupBy
    * collecting the per-user list — state per user is its event count,
    * the same bound the q27/q48 per-user windows already carry; the fold
    * itself is one pass, no prefix re-folds (only the final value is
    * needed). */
  def q144CappedBalance(s: SparkSession, dir: String): DataFrame = {
    val ev = Relational.events(s, dir)
    val wU = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // delta in cents: credits on even event ids, debits on odd; value is
    // nonnegative in the corpus and floor(v·100+0.5) ≤ 10⁷ keeps the
    // shifted packing exact
    val deltas = ev
      .withColumn("cents", floor(col("value") * lit(100.0) + lit(0.5)).cast("long"))
      .withColumn("delta",
        when(col("event_id") % 2 === 0, col("cents")).otherwise(-col("cents")))
      .withColumn("rn", row_number().over(wU))
      // pack (rank, delta) into one int64: rank·10¹⁰ + (delta + 10⁹) —
      // the 10⁹ shift keeps the field nonnegative so integer sort by the
      // packed value IS rank order
      .select(col("user_id"),
        (col("rn").cast("long") * lit(10000000000L) + col("delta") + lit(1000000000L))
          .as("packed"),
        col("delta"))
    deltas.groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("packed"))).as("arr"),
        count(lit(1)).as("n_events"),
        sum(when(col("delta") > 0, col("delta"))).as("credits"),
        sum(when(col("delta") < 0, -col("delta"))).as("debits"))
      // fold accumulator packs (floor_hits, balance): hits·10¹⁴ + balance;
      // balance < 10¹⁴ guaranteed by credits ≤ n·10⁷
      .withColumn("acc", expr("""aggregate(arr, 0L, (s, x) ->
        CASE WHEN (s % 100000000000000L) + ((x % 10000000000L) - 1000000000L) < 0L
             THEN (s div 100000000000000L + 1L) * 100000000000000L
             ELSE s + ((x % 10000000000L) - 1000000000L) END)"""))
      .select(col("user_id"), col("n_events"), col("credits"), col("debits"),
        (col("acc") % lit(100000000000000L)).as("final_cents"),
        expr("acc div 100000000000000L").as("floor_hits"))
      .orderBy(col("user_id"))
  }

  /** Mirror: same packing, same fold — `list_reduce` seeds from a
    * prepended 0 accumulator. */
  val q144Sql: String =
    """WITH deltas AS (
      |  SELECT user_id,
      |    CASE WHEN event_id % 2 = 0
      |         THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
      |         ELSE -CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) END AS delta,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events
      |), packed AS (
      |  SELECT user_id,
      |    CAST(rn AS BIGINT) * 10000000000 + delta + 1000000000 AS packed,
      |    delta
      |  FROM deltas
      |), agg AS (
      |  SELECT user_id, list_sort(list(packed)) AS arr,
      |    COUNT(*) AS n_events,
      |    SUM(CASE WHEN delta > 0 THEN delta END) AS credits,
      |    SUM(CASE WHEN delta < 0 THEN -delta END) AS debits
      |  FROM packed GROUP BY user_id
      |), folded AS (
      |  SELECT user_id, n_events, credits, debits,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT), arr), (s, x) ->
      |      CASE WHEN (s % 100000000000000) + ((x % 10000000000) - 1000000000) < 0
      |           THEN (s // 100000000000000 + 1) * 100000000000000
      |           ELSE s + ((x % 10000000000) - 1000000000) END) AS acc
      |  FROM agg
      |)
      |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
      |  CAST(credits AS BIGINT) AS credits, CAST(debits AS BIGINT) AS debits,
      |  CAST(acc % 100000000000000 AS BIGINT) AS final_cents,
      |  CAST(acc // 100000000000000 AS BIGINT) AS floor_hits
      |FROM folded ORDER BY user_id""".stripMargin

  // --- log2 latency buckets (q145) -----------------------------------------

  /** q145: session durations on a LOG₂ bucket scale — the latency
    * histogram every monitoring stack draws (1-2s, 2-4s, 4-8s, …).
    * The bucket index is floor(log₂(sec+1))+1 computed WITHOUT log:
    * `length(bin(x))` — the bit length of the integer — is exact in both
    * engines where a libm log2 would be 1-ulp fragile at the power
    * boundaries. Each bucket row carries its true [lo, hi] second range
    * as integers, its session count, and the share as one division.
    *
    * Scale shape: the q27 sessionize window, then one ≤64-group
    * partial-agg groupBy. */
  def q145LatencyBuckets(s: SparkSession, dir: String): DataFrame = {
    val sessions = graft.streaming.Streaming.sessionizeBatch(
      Relational.events(s, dir), "user_id", "ts", gapMs = 30 * 60 * 1000L)
    val durs = sessions.select(
      expr("(unix_millis(session_end) - unix_millis(session_start)) div 1000")
        .as("sec"))
    val wAll = Window.partitionBy()
    durs
      .withColumn("bucket", length(bin(col("sec") + 1)).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_sessions"),
        min(col("sec")).as("min_sec"), max(col("sec")).as("max_sec"))
      .withColumn("total", sum(col("n_sessions")).over(wAll))
      .select(col("bucket"),
        (pow(lit(2.0), col("bucket") - 1) - 1).cast("long").as("lo_sec"),
        (pow(lit(2.0), col("bucket")) - 2).cast("long").as("hi_sec"),
        col("n_sessions"), col("min_sec"), col("max_sec"),
        (col("n_sessions").cast("double") / col("total").cast("double"))
          .as("share"))
      .orderBy(col("bucket"))
  }

  /** Mirror: bit_length via bin() string length in both engines; the
    * 2^k bucket bounds are small-integer powers (exact doubles). */
  val q145Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |), seq AS (
      |  SELECT user_id, ts,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM flagged
      |), sess AS (
      |  SELECT (epoch_ms(MAX(ts)) - epoch_ms(MIN(ts))) // 1000 AS sec
      |  FROM seq GROUP BY user_id, session_seq
      |), bucketed AS (
      |  SELECT CAST(LENGTH(bin(sec + 1)) AS BIGINT) AS bucket, sec FROM sess
      |), agg AS (
      |  SELECT bucket, COUNT(*) AS n_sessions,
      |    MIN(sec) AS min_sec, MAX(sec) AS max_sec
      |  FROM bucketed GROUP BY bucket
      |)
      |SELECT bucket,
      |  CAST(POWER(2.0, bucket - 1) - 1 AS BIGINT) AS lo_sec,
      |  CAST(POWER(2.0, bucket) - 2 AS BIGINT) AS hi_sec,
      |  CAST(n_sessions AS BIGINT) AS n_sessions,
      |  CAST(min_sec AS BIGINT) AS min_sec, CAST(max_sec AS BIGINT) AS max_sec,
      |  CAST(n_sessions AS DOUBLE) / CAST(SUM(n_sessions) OVER () AS DOUBLE)
      |    AS share
      |FROM agg ORDER BY bucket""".stripMargin

  // --- Pareto coverage (q146) ----------------------------------------------

  /** q146: the Pareto / "how many sources cover 80 % of the tokens"
    * readout — sources ranked by token mass with cumulative share and an
    * in-80 flag decided by the INTEGER cross-product 5·(cum−tokens) <
    * 4·total (true while coverage before this source was below 80 %, so
    * the crossing source is included — the standard Pareto-set
    * convention). The one float is the printable cumulative share.
    *
    * Scale shape: one doc-sized partial-agg groupBy to source totals,
    * then windows over |sources| rows. */
  def q146Pareto(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val bySource = docs
      .select(col("source"),
        size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("toks"))
      .groupBy(col("source")).agg(sum(col("toks")).as("tokens"))
    val wAll = Window.partitionBy()
    val wCum = Window.orderBy(col("tokens").desc, col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bySource
      .withColumn("total", sum(col("tokens")).over(wAll))
      .withColumn("cum", sum(col("tokens")).over(wCum))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("tokens").desc, col("source"))))
      .withColumn("in_pareto80",
        lit(5L) * (col("cum") - col("tokens")) < lit(4L) * col("total"))
      .select(col("rank"), col("source"), col("tokens"), col("cum"),
        (col("cum").cast("double") / col("total").cast("double"))
          .as("cum_share"),
        col("in_pareto80"))
      .orderBy(col("rank"))
  }

  val q146Sql: String =
    raw"""WITH by_source AS (
      |  SELECT source,
      |    SUM(len(regexp_split_to_array(trim(lower(text)), '\s+'))) AS tokens
      |  FROM documents GROUP BY source
      |), ranked AS (
      |  SELECT source, tokens,
      |    SUM(tokens) OVER () AS total,
      |    SUM(tokens) OVER (ORDER BY tokens DESC, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    ROW_NUMBER() OVER (ORDER BY tokens DESC, source) AS rank
      |  FROM by_source
      |)
      |SELECT CAST(rank AS INTEGER) AS rank, source,
      |  CAST(tokens AS BIGINT) AS tokens, CAST(cum AS BIGINT) AS cum,
      |  CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share,
      |  5 * (cum - tokens) < 4 * total AS in_pareto80
      |FROM ranked ORDER BY rank""".stripMargin
}
