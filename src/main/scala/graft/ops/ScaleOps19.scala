package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Relational.t

/** Round-10 batch 18: the audio-ANALYTICS layer over the real WAV
  * decoder — silence segmentation (q159, the VAD-style trimming readout
  * an ASR-training pipeline runs before cutting clips) and
  * Walsh–Hadamard band energies (q160, an integer-EXACT spectral
  * transform: WHT is ±1 arithmetic, so unlike an FFT its band energies
  * hash bit-for-bit across engines). */
object ScaleOps19 {

  private def longWavs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val docs = Relational.fanOut(t(s, dir, "documents"))
    docs.select(
      col("doc_id").cast("long").as("media_id"),
      column(graft.multimodal.WavSamples(
        graft.multimodal.WavFixtureLong(expression(
          col("doc_id").cast("long"))))).as("smp"))
  }

  /** Shared oracle CTE: the long-fixture sample law, positions 0-based.
    * max frames = 32 + 4·8 = 64. */
  private val samplesCte: String =
    """WITH d AS (
      |  SELECT CAST(doc_id AS BIGINT) AS media_id,
      |    32 + (doc_id % 5) * 8 AS n
      |  FROM documents
      |), smp AS (
      |  SELECT media_id, n, j,
      |    ((media_id * 37 + j * 769) % 65536) - 32768 AS v
      |  FROM d CROSS JOIN range(0, 64) AS r(j) WHERE j < n
      |)""".stripMargin

  // --- silence segmentation (q159) -----------------------------------------

  /** q159: SILENCE SEGMENTATION — the trim/VAD readout: a sample is
    * silent when |v| < 8192 (25 % of full scale); per clip: total and
    * active samples, number of ACTIVE SEGMENTS (runs of consecutive
    * non-silent samples — one lag flag per boundary, the q111 islands
    * discipline on sample positions), and the leading/trailing silence
    * lengths a trimmer would cut. Exact integers end-to-end.
    *
    * Scale shape: decode + posexplode is a pure map; ONE media-keyed
    * exchange serves the boundary lag window and every rollup. */
  def q159SilenceSegments(s: SparkSession, dir: String): DataFrame = {
    val sm = longWavs(s, dir)
      .select(col("media_id"), posexplode(col("smp")).as(Seq("pos", "v")))
      .withColumn("active", abs(col("v")) >= 8192)
    val w = Window.partitionBy(col("media_id")).orderBy(col("pos"))
    sm
      .withColumn("seg_start",
        col("active") && !coalesce(lag(col("active"), 1).over(w), lit(false)))
      .groupBy(col("media_id"))
      .agg(
        count(lit(1)).as("n_samples"),
        sum(when(col("active"), 1L).otherwise(0L)).as("n_active"),
        sum(when(col("seg_start"), 1L).otherwise(0L)).as("n_segments"),
        coalesce(min(when(col("active"), col("pos"))), count(lit(1)))
          .cast("long").as("lead_silence"),
        (count(lit(1)) - lit(1)
          - coalesce(max(when(col("active"), col("pos"))), lit(-1)))
          .cast("long").as("trail_silence"))
      .orderBy(col("media_id"))
  }

  /** Mirror: same law, same lag-flag islands, same lead/trail algebra. */
  val q159Sql: String =
    samplesCte +
      """, f AS (
        |  SELECT media_id, j, v, ABS(v) >= 8192 AS active
        |  FROM smp
        |), flagged AS (
        |  SELECT media_id, j, active,
        |    active AND NOT COALESCE(
        |      LAG(active) OVER (PARTITION BY media_id ORDER BY j), false)
        |      AS seg_start
        |  FROM f
        |)
        |SELECT media_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  CAST(SUM(CASE WHEN active THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
        |  CAST(SUM(CASE WHEN seg_start THEN 1 ELSE 0 END) AS BIGINT) AS n_segments,
        |  CAST(COALESCE(MIN(CASE WHEN active THEN j END), COUNT(*)) AS BIGINT)
        |    AS lead_silence,
        |  CAST(COUNT(*) - 1
        |    - COALESCE(MAX(CASE WHEN active THEN j END), -1) AS BIGINT)
        |    AS trail_silence
        |FROM flagged GROUP BY media_id ORDER BY media_id""".stripMargin

  // --- Walsh–Hadamard band energies (q160) ---------------------------------

  /** q160: WALSH–HADAMARD band energies — a REAL spectral transform in
    * exact integer arithmetic: samples tile into non-overlapping
    * windows of 8; coefficient b of a window is Σ_k v_k·H(b,k) with
    * H(b,k) = (−1)^popcount(b AND k) (the natural-ordered Hadamard
    * matrix, computed arithmetically — no literal table); per clip and
    * band, energy = Σ over windows of coef². WHT is the
    * integer-exact stand-in for an FFT band readout: same
    * energy-compaction idea (band 0 = DC), ±1 arithmetic, so both
    * engines hash identically where a float FFT never could. Bound:
    * |coef| ≤ 8·32768, coef² ≤ 6.9e10, ×8 windows ≪ int64.
    *
    * Scale shape: decode + posexplode map, an 8-way bounded band
    * explode, one (media, window, band) partial agg, one (media, band)
    * partial agg — all equi-key, nothing corpus-quadratic. */
  def q160WhtBands(s: SparkSession, dir: String): DataFrame = {
    val sm = longWavs(s, dir)
      .select(col("media_id"), posexplode(col("smp")).as(Seq("pos", "v")))
      .withColumn("w", expr("pos div 8"))
      .withColumn("k", expr("pos % 8"))
      .withColumn("band", explode(expr("sequence(0, 7)")))
      // (−1)^popcount(band & k) via 3-bit parity — portable integer ops
      .withColumn("sgn", expr(
        "1 - 2 * ((((band & k) & 1) + (((band & k) >> 1) & 1) " +
          "+ (((band & k) >> 2) & 1)) % 2)"))
    sm.groupBy(col("media_id"), col("w"), col("band"))
      .agg(sum(col("v") * col("sgn")).as("coef"))
      .groupBy(col("media_id"), col("band"))
      .agg(sum(col("coef") * col("coef")).as("energy"))
      .orderBy(col("media_id"), col("band"))
  }

  /** Mirror: identical windowing, parity sign, and two-level rollup. */
  val q160Sql: String =
    samplesCte +
      """, b AS (
        |  SELECT media_id, j // 8 AS w, j % 8 AS k, v, band
        |  FROM smp CROSS JOIN range(0, 8) AS rb(band)
        |), signed AS (
        |  SELECT media_id, w, band,
        |    v * (1 - 2 * ((((band & k) & 1) + (((band & k) >> 1) & 1)
        |      + (((band & k) >> 2) & 1)) % 2)) AS sv
        |  FROM b
        |), coefs AS (
        |  SELECT media_id, w, band, SUM(sv) AS coef
        |  FROM signed GROUP BY media_id, w, band
        |)
        |SELECT media_id, CAST(band AS INTEGER) AS band,
        |  CAST(SUM(coef * coef) AS BIGINT) AS energy
        |FROM coefs GROUP BY media_id, band
        |ORDER BY media_id, band""".stripMargin
}
