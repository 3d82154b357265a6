package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * BINARY columns with a typed metadata struct; decode / feature-extract /
  * resize / frame-sample run as plan-native codegen expressions
  * (DecodeExpressions.scala).
  *
  * The media codec libraries are NOT in this container, so the decode step
  * is STUBBED with a deterministic fake (clearly marked below); everything
  * Spark-side — schema, batch iteration shape, partitioning, output
  * contract — is real and tested. Swapping `StubCodec` for a JNI/FFI codec
  * (or a `mapInPandas`/`mapInArrow` Python worker with PIL/torchaudio on a
  * PySpark front end) changes no plan shape.
  */
object Multimodal {

  /** media metadata struct carried next to every binary payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),    // image | audio | video
    StructField("format", StringType),        // jpeg | wav | mp4 | ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", mediaMetaType)))

  /** Wrap any table into the media schema, treating a column's bytes as the
    * payload (in production the payload comes from the lake as raw bytes —
    * binaryFile source or parquet BINARY). */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String, format: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("content"),
      struct(
        lit(mediaType).as("media_type"),
        lit(format).as("format"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  // ======================================================================
  // STUB CODEC — deterministic fake in lieu of real image/audio libraries.
  // Real deployment: replace decode() with the actual codec call; the
  // iterator/batch shape and schemas stay identical.
  // ======================================================================
  object StubCodec {
    /** ??? real codec goes here — deterministic fake derived from the bytes
      * so tests are reproducible: "pixels" = rolling byte hash per cell. */
    def decode(content: Array[Byte], w: Int, h: Int): Array[Float] = {
      val out = new Array[Float](w * h)
      var acc = 1469598103934665603L // FNV offset basis
      var i = 0
      while (i < out.length) {
        val b = if (content.nonEmpty) content(i % content.length) else 0
        acc = (acc ^ b) * 1099511628211L
        out(i) = ((acc >>> 40).toInt & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Decode + feature-extract as a plan-native projection: the decode
    * kernel is a codegen'd Catalyst expression (StubDecode), so the whole
    * pipeline — null handling, byte length, decode — stays in one
    * WholeStageCodegen span with column pruning intact (the earlier RDD
    * mapPartitions formulation deserialized every row and split the
    * stage). `cellW×cellH` is the decode target ("resize"). */
  def decodeFeatures(media: DataFrame, cellW: Int = 8, cellH: Int = 8): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val content = coalesce(col("content"), lit(Array.emptyByteArray))
    media.select(
      col("media_id"),
      length(content).cast("long").as("n_bytes"),
      column(StubDecode(expression(content), cellW, cellH)).as("feat"))
  }

  /** Frame sampling for video-typed rows: emit one (media_id, frame_idx,
    * frame_feat) row per sampled frame — pure plan-side explode over a
    * deterministic frame index sequence, decode stubbed per frame. */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L, cellW: Int = 4,
      cellH: Int = 4): DataFrame = {
    val withFrames = media
      .filter(col("meta.media_type") === "video")
      .select(col("media_id"), col("content"),
        explode(sequence(lit(0L),
          (coalesce(col("meta.duration_ms"), lit(0L)) / lit(everyMs))
            .cast("long"))).as("frame_idx"))
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val content = coalesce(col("content"), lit(Array.emptyByteArray))
    withFrames.select(
      col("media_id"), col("frame_idx"),
      column(StubFrameDecode(expression(content), expression(col("frame_idx")),
        cellW, cellH)).as("frame_feat"))
  }
}
