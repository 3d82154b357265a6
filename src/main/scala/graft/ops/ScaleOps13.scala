package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Relational.t

/** Round-9 batch 12: storage-layout and stream-hygiene advisors —
  * dictionary-encoding benefit estimation (q137) and event-stream
  * disorder measurement (q138). Both are the INSTRUMENTS a platform
  * runs before committing to a layout or a watermark, the same genre as
  * q135's skew report (measure first, then pick q28/q29/q94/watermarks).
  *
  * Exactness: pure integer byte/count laws with one final division per
  * readout.
  */
object ScaleOps13 {

  // --- dictionary-encoding advisor (q137) ----------------------------------

  /** q137: per-column dictionary-encoding benefit estimate over the
    * document table's two categorical columns (source, lang) — the
    * layout advisory a 100 TB writer consults before choosing parquet
    * encodings: plain bytes = Σ len(value), dict bytes = Σ len over
    * DISTINCT values + 4 bytes/row of codes; the savings ratio says
    * whether the column is dictionary-friendly (source/lang: yes;
    * free text: no). Lengths are CHARACTER counts (both engines'
    * length() law on these ASCII columns — byte = char here, pinned by
    * the schema canary's ASCII contract for the generated corpus).
    *
    * Scale shape: one stack projection, one (col, value) partial-agg
    * groupBy — value cardinality ≪ rows — then a |values|-sized rollup.
    * Nothing row-sized crosses the second exchange. */
  def q137DictAdvisor(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val stacked = docs.select(expr(
      "stack(2, 'source', source, 'lang', lang) AS (col_name, value)"))
    val perValue = stacked.groupBy(col("col_name"), col("value"))
      .agg(count(lit(1)).as("cnt"), length(col("value")).cast("long").as("len"))
    perValue.groupBy(col("col_name"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_distinct"),
        sum(col("cnt") * col("len")).as("plain_bytes"),
        (sum(col("len")) + sum(col("cnt")) * lit(4L)).as("dict_bytes"))
      .withColumn("savings",
        lit(1.0) - col("dict_bytes").cast("double") / col("plain_bytes").cast("double"))
      .select(col("col_name"), col("n_rows"), col("n_distinct"),
        col("plain_bytes"), col("dict_bytes"), col("savings"))
      .orderBy(col("col_name"))
  }

  val q137Sql: String =
    """WITH stacked AS (
      |  SELECT 'source' AS col_name, source AS value FROM documents
      |  UNION ALL
      |  SELECT 'lang', lang FROM documents
      |), per_value AS (
      |  SELECT col_name, value, COUNT(*) AS cnt,
      |    CAST(LENGTH(value) AS BIGINT) AS len
      |  FROM stacked GROUP BY col_name, value
      |), agg AS (
      |  SELECT col_name,
      |    CAST(SUM(cnt) AS BIGINT) AS n_rows,
      |    COUNT(*) AS n_distinct,
      |    CAST(SUM(cnt * len) AS BIGINT) AS plain_bytes,
      |    CAST(SUM(len) + SUM(cnt) * 4 AS BIGINT) AS dict_bytes
      |  FROM per_value GROUP BY col_name
      |)
      |SELECT col_name, n_rows, n_distinct, plain_bytes, dict_bytes,
      |  1.0 - CAST(dict_bytes AS DOUBLE) / CAST(plain_bytes AS DOUBLE)
      |    AS savings
      |FROM agg ORDER BY col_name""".stripMargin

  // --- event-stream disorder metrics (q138) --------------------------------

  /** q138: out-of-order arrival measurement — per event type, walk
    * events in ARRIVAL order (event_id, the producer sequence) and count
    * adjacent pairs whose event TIME goes backwards, plus the worst
    * backstep. This is the instrument that sizes a Structured Streaming
    * watermark: `withWatermark(max_backstep)` bounds state correctly iff
    * this readout is measured, not guessed. The q27/q123 session layer
    * assumes time-ordered processing; this op says how wrong arrival
    * order is before that sort.
    *
    * Integer law: backstep_ms = lag(ts) − ts in epoch millis when
    * positive; inversions = count of positive backsteps; share is ONE
    * division of exact counts.
    *
    * Scale shape: one hash-partitioned window per event_type (at 100 TB
    * one would sub-partition by producer/shard id — the per-type walk
    * here mirrors the per-partition disorder a Kafka consumer sees). */
  def q138Disorder(s: SparkSession, dir: String): DataFrame = {
    val ev = Relational.events(s, dir)
    val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
    val stepped = ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_ts").isNotNull)
      .withColumn("backstep_ms",
        (unix_millis(col("prev_ts")) - unix_millis(col("ts"))))
    stepped.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("backstep_ms") > 0, 1L).otherwise(0L)).as("n_inversions"),
        greatest(max(col("backstep_ms")), lit(0L)).as("max_backstep_ms"))
      .withColumn("inversion_share",
        col("n_inversions").cast("double") / col("n_pairs").cast("double"))
      .orderBy(col("event_type"))
  }

  val q138Sql: String =
    """WITH stepped AS (
      |  SELECT event_type,
      |    epoch_ms(lag(ts) OVER (PARTITION BY event_type ORDER BY event_id))
      |      - epoch_ms(ts) AS backstep_ms
      |  FROM events
      |)
      |SELECT event_type,
      |  COUNT(*) AS n_pairs,
      |  CAST(SUM(CASE WHEN backstep_ms > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_inversions,
      |  GREATEST(CAST(MAX(backstep_ms) AS BIGINT), 0) AS max_backstep_ms,
      |  CAST(SUM(CASE WHEN backstep_ms > 0 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS inversion_share
      |FROM stepped WHERE backstep_ms IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin
}
