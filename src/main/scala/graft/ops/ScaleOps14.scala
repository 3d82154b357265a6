package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Relational.t

/** Round-9 batch 13: survival / nonparametric-test statistics —
  * exact-integer Kaplan–Meier curves with right-censoring (q139), the
  * Mann–Whitney U test in doubled-rank integers (q140), and
  * Herfindahl–Hirschman concentration (q141).
  *
  * The q139 mirror rides the q90-proven explicit-fold machinery
  * (DuckDB `list_reduce` / Spark `aggregate` both fold LEFT in list
  * order), so even a multiplicative recurrence with per-step integer
  * floors is bit-identical across engines.
  */
object ScaleOps14 {

  // --- exact-integer Kaplan–Meier (q139) -----------------------------------

  /** q139: Kaplan–Meier survival of SESSION DURATION (minutes from first
    * to last event of each q27 gap-session) with RIGHT-CENSORING — a
    * session whose last event lies within one gap (30 min) of the
    * corpus's final timestamp may still be open and is censored, not
    * dead; dropping censoring (the naive mistake) biases survival down.
    * Cohorts are the q106 parity split, so the readout is the A/B
    * session-length-curve comparison a product team actually runs.
    *
    * Exact-integer law: the KM estimator S(t) = Π_{tᵢ≤t} (nᵢ−dᵢ)/nᵢ is
    * a multiplicative recurrence — engine float products are
    * order-and-rounding fragile, so S is computed in 10⁻⁹ FIXED POINT
    * with a per-step floor: S ← (S·(nᵢ−dᵢ)) div nᵢ, S₀ = 10⁹. Steps are
    * packed into one int64 each (t·10¹⁴ + n·10⁷ + d — valid for
    * t < 92 000 minutes and cohorts under 10⁷ sessions, both far above
    * any shipped SF and asserted by the packing being reversible),
    * sorted ascending (t leads the packing, so integer sort IS time
    * order), and each output row's S folds the step prefix with an
    * explicit left fold — Spark `aggregate` / DuckDB `list_reduce`, the
    * q90 machinery. Prefix re-folds cost O(steps²) on a ≤|distinct
    * durations| list — bounded by the session-length range in minutes,
    * not the corpus.
    *
    * Scale shape: the q27 sessionize window is the only data-sized
    * work; a 1-row max-ts broadcast, then everything runs on the
    * (cohort, duration) table. */
  def q139KaplanMeier(s: SparkSession, dir: String): DataFrame = {
    val ev = Relational.events(s, dir)
    val sessions = graft.streaming.Streaming.sessionizeBatch(
      ev, "user_id", "ts", gapMs = 30 * 60 * 1000L)
    val maxd = ev.agg(max(col("ts")).as("maxts"))
    val lt = sessions.crossJoin(broadcast(maxd))
      .select((col("user_id") % 2).cast("long").as("cohort"),
        expr("(unix_millis(session_end) - unix_millis(session_start)) div 60000")
          .as("t"),
        when(unix_millis(col("maxts")) - unix_millis(col("session_end"))
          > 30 * 60 * 1000L, 1L).otherwise(0L).as("dead"))
    val byT = lt.groupBy(col("cohort"), col("t"))
      .agg(count(lit(1)).as("cnt_all"), sum(col("dead")).as("d"))
    val wC = Window.partitionBy(col("cohort"))
    val wCum = wC.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = byT
      .withColumn("total", sum(col("cnt_all")).over(wC))
      .withColumn("cum_before", coalesce(sum(col("cnt_all")).over(wCum), lit(0L)))
      .withColumn("n", col("total") - col("cum_before"))
      .filter(col("d") >= 1)
      .select(col("cohort"),
        (col("t") * lit(100000000000000L) + col("n") * lit(10000000L) + col("d"))
          .as("packed"))
    val arrs = risk.groupBy(col("cohort"))
      .agg(sort_array(collect_list(col("packed"))).as("arr"))
    arrs.select(col("cohort"), posexplode(col("arr")).as(Seq("pos", "elem")),
        col("arr"))
      .select(col("cohort"),
        // integer div, NOT `/`: Spark's `/` is double division, and a
        // packed value above 2^53 would round before the truncating cast
        // (the mirror's `//` is exact — the hashes would diverge)
        expr("elem div 100000000000000L").as("t"),
        expr("(elem div 10000000L) % 10000000L").as("n_at_risk"),
        (col("elem") % lit(10000000L)).as("d"),
        expr("""aggregate(slice(arr, 1, pos + 1), 1000000000L,
          (s, x) -> (s * (((x div 10000000L) % 10000000L) - (x % 10000000L)))
                    div ((x div 10000000L) % 10000000L))""").as("s_fp"))
      .withColumn("survival", col("s_fp").cast("double") / lit(1e9))
      .orderBy(col("cohort"), col("t"))
  }

  /** Mirror: identical packing and the same explicit left fold —
    * `list_reduce(list_prepend(10⁹, prefix), …)` seeds the accumulator
    * the way Spark's `aggregate` initial value does. Integer `//` and
    * `div` agree on these non-negative operands. */
  val q139Sql: String =
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
      |  SELECT user_id, session_seq, MIN(ts) AS st, MAX(ts) AS en
      |  FROM seq GROUP BY user_id, session_seq
      |), m AS (
      |  SELECT MAX(ts) AS maxts FROM events
      |), lt AS (
      |  SELECT user_id % 2 AS cohort,
      |    (epoch_ms(en) - epoch_ms(st)) // 60000 AS t,
      |    CASE WHEN epoch_ms(maxts) - epoch_ms(en) > 1800000
      |         THEN 1 ELSE 0 END AS dead
      |  FROM sess CROSS JOIN m
      |), byt AS (
      |  SELECT cohort, t, COUNT(*) AS cnt_all, SUM(dead) AS d
      |  FROM lt GROUP BY cohort, t
      |), risk AS (
      |  SELECT cohort, t, d,
      |    SUM(cnt_all) OVER (PARTITION BY cohort)
      |      - COALESCE(SUM(cnt_all) OVER (PARTITION BY cohort ORDER BY t
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n
      |  FROM byt
      |), steps AS (
      |  SELECT cohort,
      |    CAST(t * 100000000000000 + n * 10000000 + d AS BIGINT) AS packed
      |  FROM risk WHERE d >= 1
      |), arrs AS (
      |  SELECT cohort, list_sort(list(packed)) AS arr FROM steps GROUP BY cohort
      |), ex AS (
      |  SELECT cohort, arr,
      |    unnest(generate_series(1, len(arr))) AS i
      |  FROM arrs
      |)
      |SELECT cohort,
      |  CAST(arr[i] // 100000000000000 AS BIGINT) AS t,
      |  CAST((arr[i] // 10000000) % 10000000 AS BIGINT) AS n_at_risk,
      |  CAST(arr[i] % 10000000 AS BIGINT) AS d,
      |  CAST(list_reduce(list_prepend(CAST(1000000000 AS BIGINT), arr[1:i]),
      |    (s, x) -> (s * (((x // 10000000) % 10000000) - (x % 10000000)))
      |              // ((x // 10000000) % 10000000)) AS BIGINT) AS s_fp,
      |  CAST(list_reduce(list_prepend(CAST(1000000000 AS BIGINT), arr[1:i]),
      |    (s, x) -> (s * (((x // 10000000) % 10000000) - (x % 10000000)))
      |              // ((x // 10000000) % 10000000)) AS DOUBLE) / 1e9
      |    AS survival
      |FROM ex ORDER BY cohort, t""".stripMargin

  // --- Mann–Whitney U in doubled ranks (q140) ------------------------------

  /** q140: the Mann–Whitney U test (cohort A vs B event values, per
    * event type) — the nonparametric twin of q106's z² proportion test
    * and q121's KS distance: U detects stochastic dominance without
    * normality assumptions. All arithmetic is DOUBLED-rank integers:
    * tied values take the midrank (min_rank + max_rank)/2, which is
    * half-integer, so the law works in 2× units — r2 = 2·cum_before +
    * cnt + 1 per distinct value, R1₂ = Σ cnt₁·r2, and
    * U1₂ = 2·n₁·n₂ + n₁(n₁+1) − R1₂. The identity U1₂ + U2₂ = 2·n₁·n₂
    * is emitted as a checked column (the mirror computes it
    * independently, so the hash proves it).
    *
    * Scale shape: one (type, value) partial-agg groupBy collapses the
    * stream; the rank windows run over DISTINCT values per type —
    * data-bounded but per-TYPE parallel, the same per-group global-sort
    * class as the q13 running windows; the final readout is |types|
    * rows. */
  def q140MannWhitney(s: SparkSession, dir: String): DataFrame = {
    val ev = Relational.events(s, dir)
    val byVal = ev.select(col("event_type"), col("value"),
        (col("user_id") % 2).cast("long").as("cohort"))
      .groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("cnt1"))
    val wT = Window.partitionBy(col("event_type"))
    val wCum = wT.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byVal
      .withColumn("cum_before", coalesce(sum(col("cnt")).over(wCum), lit(0L)))
      .withColumn("r2", lit(2L) * col("cum_before") + col("cnt") + 1)
    ranked.groupBy(col("event_type"))
      .agg(sum(col("cnt1")).as("n1"),
        (sum(col("cnt")) - sum(col("cnt1"))).as("n2"),
        sum(col("cnt1") * col("r2")).as("r1_2"))
      .withColumn("u1_2",
        lit(2L) * col("n1") * col("n2") + col("n1") * (col("n1") + 1) - col("r1_2"))
      .withColumn("u2_2", lit(2L) * col("n1") * col("n2") - col("u1_2"))
      .withColumn("identity_ok",
        col("u1_2") + col("u2_2") === lit(2L) * col("n1") * col("n2"))
      .select(col("event_type"), col("n1"), col("n2"), col("r1_2"),
        col("u1_2"), col("u2_2"), col("identity_ok"))
      .orderBy(col("event_type"))
  }

  val q140Sql: String =
    """WITH byval AS (
      |  SELECT event_type, value, COUNT(*) AS cnt,
      |    SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS cnt1
      |  FROM events GROUP BY event_type, value
      |), ranked AS (
      |  SELECT event_type, cnt, cnt1,
      |    2 * COALESCE(SUM(cnt) OVER (PARTITION BY event_type ORDER BY value
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      + cnt + 1 AS r2
      |  FROM byval
      |), agg AS (
      |  SELECT event_type, SUM(cnt1) AS n1, SUM(cnt) - SUM(cnt1) AS n2,
      |    SUM(cnt1 * r2) AS r1_2
      |  FROM ranked GROUP BY event_type
      |)
      |SELECT event_type, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  CAST(r1_2 AS BIGINT) AS r1_2,
      |  CAST(2 * n1 * n2 + n1 * (n1 + 1) - r1_2 AS BIGINT) AS u1_2,
      |  CAST(2 * n1 * n2 - (2 * n1 * n2 + n1 * (n1 + 1) - r1_2) AS BIGINT)
      |    AS u2_2,
      |  (2 * n1 * n2 + n1 * (n1 + 1) - r1_2)
      |    + (2 * n1 * n2 - (2 * n1 * n2 + n1 * (n1 + 1) - r1_2))
      |    = 2 * n1 * n2 AS identity_ok
      |FROM agg ORDER BY event_type""".stripMargin

  // --- Herfindahl–Hirschman concentration (q141) ---------------------------

  /** q141: HHI market-concentration of the document corpus along its
    * two categorical dimensions (source, lang) — the one-number
    * companion to q132's Gini and q62's mixing weights: HHI = Σ shareᵢ²
    * says how dominated a dimension is (1/HHI = the "effective number"
    * of sources a mixer is really drawing from). Computed at 10⁻⁸ fixed
    * point — HHI_fp = (Σ cntᵢ²·10⁸) div total² — so the readout is an
    * exact integer; the effective-n and float HHI are single divisions
    * of exact integers.
    *
    * Scale shape: one stack projection + one (dim, value) partial-agg
    * groupBy; the HHI algebra runs on |values| rows. */
  def q141Hhi(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val stacked = docs.select(expr(
      "stack(2, 'source', source, 'lang', lang) AS (dim, value)"))
    stacked.groupBy(col("dim"), col("value")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n_values"), sum(col("cnt")).as("total"),
        sum(col("cnt") * col("cnt")).as("sum_sq"))
      .withColumn("hhi_fp",
        expr("(sum_sq * 100000000L) div (total * total)"))
      .withColumn("hhi", col("sum_sq").cast("double")
        / (col("total").cast("double") * col("total").cast("double")))
      .withColumn("effective_n",
        (col("total").cast("double") * col("total").cast("double"))
          / col("sum_sq").cast("double"))
      .select(col("dim"), col("n_values"), col("total"), col("sum_sq"),
        col("hhi_fp"), col("hhi"), col("effective_n"))
      .orderBy(col("dim"))
  }

  val q141Sql: String =
    """WITH stacked AS (
      |  SELECT 'source' AS dim, source AS value FROM documents
      |  UNION ALL
      |  SELECT 'lang', lang FROM documents
      |), counts AS (
      |  SELECT dim, value, COUNT(*) AS cnt FROM stacked GROUP BY dim, value
      |), agg AS (
      |  SELECT dim, COUNT(*) AS n_values, SUM(cnt) AS total,
      |    SUM(cnt * cnt) AS sum_sq
      |  FROM counts GROUP BY dim
      |)
      |SELECT dim, CAST(n_values AS BIGINT) AS n_values,
      |  CAST(total AS BIGINT) AS total, CAST(sum_sq AS BIGINT) AS sum_sq,
      |  CAST((sum_sq * 100000000) // (total * total) AS BIGINT) AS hhi_fp,
      |  CAST(sum_sq AS DOUBLE)
      |    / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)) AS hhi,
      |  (CAST(total AS DOUBLE) * CAST(total AS DOUBLE))
      |    / CAST(sum_sq AS DOUBLE) AS effective_n
      |FROM agg ORDER BY dim""".stripMargin
}
