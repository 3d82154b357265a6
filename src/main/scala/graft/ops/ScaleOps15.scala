package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Relational.t

/** Round-9 batch 14: the TIFF/EXIF-grammar layer (q142) — offset-linked
  * IFD metadata walking, the file shape a real ingestion pipeline meets
  * as EXIF/GeoTIFF/scanner output. */
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
}
