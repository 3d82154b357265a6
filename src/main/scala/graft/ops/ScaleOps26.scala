package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Relational.t

/** Round-14 batch 26: the two new oracle arms behind this round's scale
  * work — q181 puts the HISTOGRAM tertile-boundary kernel (the q179
  * route's above-bound arm, r13 verdict #2) under the cross-engine
  * oracle in pure integers, and q182 oracle-checks the sub-file shard
  * routing arithmetic `TrainingPipeline.writeSharded(filesPerShard > 1)`
  * lays a training release out with (r13 verdict #4).
  *
  * Ref behavior class: the reference's deterministic batch/shard
  * accounting (`file-to-sql-loader.py:1386-1500` — every capability
  * reachable from the composed entry point, with per-unit ledger rows);
  * the arithmetic itself is beyond-reference LLM-pipeline surface like
  * the rest of the q1xx family. */
object ScaleOps26 {

  // --- exact tertile boundaries from the histogram kernel (q181) ------------

  /** q181: PER-LANGUAGE TERTILE BOUNDARIES, integer-exact — the
    * rank-selection machinery of the scale arm
    * ([[ScaleOps25.tertileRankSelect]]) as an oracle-checked readout.
    * Per language over the q167/q179 corpus-LM scores: the scored doc
    * count, the exact score values at the floor/ceil ranks of the 1/3
    * and 2/3 two-sided percentile positions (vl1/vh1/vl2/vh2), and the
    * interpolated boundaries at ×3 fixed point:
    *
    *   b_p × 3 = 3·vl_p + r_p·(vh_p − vl_p)
    *
    * where r_p = ((n−1)·3p) mod 3 — EXACT integer arithmetic end to
    * end, because for p ∈ {1/3, 2/3} the interpolation fraction is
    * always 0, 1/3, or 2/3. The float-free restatement is what makes
    * the boundary kernel cross-engine checkable at all: the double form
    * both engines' exact percentiles compute agrees with it everywhere
    * (the ×3 values are what q179's strict `> b` comparisons resolve
    * against after clearing denominators), but its raw doubles differ
    * by engine-specific rounding at the last ulp, which a hash compare
    * cannot tolerate — so the oracle pins the integers and the
    * differential spec pins the doubles.
    *
    * Scale shape: the q167 scoring chain + one (lang, value) HISTOGRAM
    * partial agg (bounded by distinct fixed-point scores ≤ 10⁶+1 per
    * language, never by docs), one per-language window over histogram
    * rows, one ≤#langs rollup — the whole point of the arm q179 routes
    * to above the per-language row bound. */
  def q181TertileBoundaries(s: SparkSession, dir: String): DataFrame = {
    val scored = ScaleOps22.mleDocScores(s, dir)
    val langs = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("lang"))
    val wl = scored.join(langs, Seq("doc_id"))
      .select(col("lang"), col("score_fp").as("v"))
    ScaleOps25.tertileRankSelect(wl)
      .select(col("lang"), col("nl").as("n_docs"),
        col("vl1"), col("vh1"), col("vl2"), col("vh2"),
        (lit(3L) * col("vl1") + col("r1") * (col("vh1") - col("vl1")))
          .as("b1_x3"),
        (lit(3L) * col("vl2") + col("r2") * (col("vh2") - col("vl2")))
          .as("b2_x3"))
      .orderBy(col("lang"))
  }

  /** Mirror: the shared q167 scoring CTEs, then the histogram/cumulative
    * rank selection and the same ×3 integer interpolation — no float
    * anywhere on either engine. */
  val q181Sql: String =
    raw"""WITH ${ScaleOps22.mleScoreCtes}, wl AS (
      |  SELECT d.lang, sc.score_fp AS v
      |  FROM scored sc JOIN (
      |    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang FROM documents) d
      |  ON sc.doc_id = d.doc_id
      |), hist AS (
      |  SELECT lang, v, COUNT(*) AS c FROM wl GROUP BY lang, v
      |), ranked AS (
      |  SELECT lang, v, c,
      |    SUM(c) OVER (PARTITION BY lang ORDER BY v
      |                 ROWS UNBOUNDED PRECEDING) AS cum,
      |    SUM(c) OVER (PARTITION BY lang) AS nl
      |  FROM hist
      |), marks AS (
      |  SELECT lang, v, cum, nl,
      |    (nl - 1) // 3 AS l1, (nl - 1) % 3 AS r1,
      |    (2 * (nl - 1)) // 3 AS l2, (2 * (nl - 1)) % 3 AS r2
      |  FROM ranked
      |), sel AS (
      |  SELECT lang, MAX(nl) AS nl, MAX(r1) AS r1, MAX(r2) AS r2,
      |    MIN(CASE WHEN cum > l1 THEN v END) AS vl1,
      |    MIN(CASE WHEN cum > l1 + LEAST(r1, 1) THEN v END) AS vh1,
      |    MIN(CASE WHEN cum > l2 THEN v END) AS vl2,
      |    MIN(CASE WHEN cum > l2 + LEAST(r2, 1) THEN v END) AS vh2
      |  FROM marks GROUP BY lang
      |)
      |SELECT lang, CAST(nl AS BIGINT) AS n_docs,
      |  CAST(vl1 AS BIGINT) AS vl1, CAST(vh1 AS BIGINT) AS vh1,
      |  CAST(vl2 AS BIGINT) AS vl2, CAST(vh2 AS BIGINT) AS vh2,
      |  CAST(3 * vl1 + r1 * (vh1 - vl1) AS BIGINT) AS b1_x3,
      |  CAST(3 * vl2 + r2 * (vh2 - vl2) AS BIGINT) AS b2_x3
      |FROM sel ORDER BY lang""".stripMargin

  // --- sub-file shard routing (q182) -----------------------------------------

  /** Shard count q182 routes into — a small power of two so the test
    * corpus populates every (shard, file) cell. */
  val Q182Shards = 8L

  /** Files per shard — the [[graft.pipeline.TrainingPipeline
    * .writeSharded]] `filesPerShard` split this mirrors. */
  val Q182FilesPerShard = 4L

  /** q182: SUB-FILE SHARD ROUTING — the deterministic two-level layout
    * the scale-free writer uses (r13 verdict #4: one task and one file
    * per shard is ~1.5 TB at 100 TB/64 shards; the file split must be a
    * pure function of the document id or the byte-stable release
    * contract dies). shard = portable-hash bucket mod S (q169's
    * assignment, unchanged — raising filesPerShard never moves a doc
    * across SHARDS), file_idx = (bucket div S) mod F — the next hash
    * bits up, so the split is engine/partitioning/run-reproducible and
    * INDEPENDENT of the shard bits by construction. Per (shard, file):
    * docs and total chars — the balance readout that says whether the
    * file split inherits the shard hash's uniformity.
    *
    * Scale shape: one pure-map assignment fused into the scan, ONE
    * partial-agg exchange on ≤ S·F groups. */
  def q182ShardFiles(s: SparkSession, dir: String): DataFrame =
    Relational.fanOut(t(s, dir, "documents"))
      .select(col("doc_id").cast("long").as("doc_id"),
        col("n_chars").cast("long").as("n_chars"))
      .withColumn("__bucket", Relational3.splitBucket(col("doc_id")))
      .withColumn("shard", pmod(col("__bucket"), lit(Q182Shards)))
      .withColumn("file_idx",
        pmod(expr(s"__bucket div $Q182Shards"), lit(Q182FilesPerShard)))
      .groupBy(col("shard"), col("file_idx"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .orderBy(col("shard"), col("file_idx"))

  /** Mirror: the q51/q63/q169 portable-hash restatement + the same
    * div/mod split. Every operand is non-negative, so `%` and `//`
    * agree with Spark's pmod/div everywhere. */
  val q182Sql: String =
    raw"""WITH b AS (
      |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    CAST(n_chars AS BIGINT) AS n_chars,
      |    (((((doc_id % 4294967296) // 65536) * 2654435761) % 65536) * 65536
      |      + ((doc_id % 4294967296) % 65536) * 2654435761) % 4294967296
      |      AS bucket
      |  FROM documents
      |)
      |SELECT bucket % ${Q182Shards} AS shard,
      |  (bucket // ${Q182Shards}) % ${Q182FilesPerShard} AS file_idx,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS n_chars
      |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
