package graft.ml

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Persistence for the trained quality-classifier weight vector
  * (graft.ops.ScaleOps25's batch perceptron) — the third stamped
  * artifact after the BPE vocab (`text.Bpe.writeVocab`) and the
  * fingerprint index (`dedup.FingerprintIndex`), with the same
  * torn-write discipline those two established:
  *
  *   - the weight table lands FIRST (`<path>/weights` parquet — one
  *     row per bucket, driver-sized: B+1 rows);
  *   - the `_rows` stamp lands LAST, so a writer that dies mid-write
  *     leaves stamp ≠ content (or no stamp), which [[loadModel]]
  *     refuses loudly and callers' rebuild branch heals;
  *   - load VALIDATES (stamp == row count, buckets contiguous
  *     0..B, one weight per bucket) so a hand-mutated artifact can
  *     never silently score differently.
  *
  * A linear model is the one training artifact a 100 TB pipeline can
  * ship this cheaply: the weights are B+1 longs regardless of corpus
  * size, so write/load are metadata-cost operations while RETRAINING
  * pays K corpus passes — exactly the asymmetry that makes the
  * persisted artifact the unit of reuse across runs. */
object PerceptronModel {

  /** Canonical artifact path for a corpus (the vocab/index convention:
    * keyed by corpus identity, so a changed corpus gets a NEW path and
    * stale artifacts can never cross-contaminate). */
  def modelPathFor(spark: SparkSession, dir: String): String = {
    val sig = graft.ops.Relational.corpusSignature(spark, dir, "documents")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir|$sig".getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"${sys.props("java.io.tmpdir")}/graft_perceptron/$key"
  }

  /** Persist a trained weight vector — SIDE-WRITE-THEN-SWAP (r13 verdict
    * #6: the earlier in-place overwrite left a window where a reader
    * racing a retrain saw a half-rewritten table; correct — stamp ≠ rows
    * refuses loudly — but the `FingerprintIndex.compactIndex` discipline
    * closes even that window for free): the new table lands BESIDE the
    * live one, is validated from what LANDED (row-for-row against the
    * in-memory weights — B+1 rows, driver-cheap), and only then swaps in
    * via delete + rename. A reader races either the old complete table,
    * the new complete table, or — in the delete→rename window only — a
    * missing directory, which [[loadModel]]'s read fails LOUDLY
    * (AnalysisException), never a torn mix. The `_rows` stamp is written
    * LAST, as before. Single-writer contract, like the vocab/index. */
  def writeModel(spark: SparkSession, weights: Array[Long], path: String): Unit = {
    require(weights.nonEmpty, "writeModel: refusing to persist an empty model")
    import spark.implicits._
    val side = new org.apache.hadoop.fs.Path(s"$path/weights.swap")
    weights.zipWithIndex.map { case (w, b) => (b.toLong, w) }.toSeq
      .toDF("bucket", "weight")
      .coalesce(1).write.mode("overwrite").parquet(side.toString)
    val landed = spark.read.parquet(side.toString)
      .select(col("bucket").cast("long"), col("weight").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    require(landed.map(_._1).sameElements(weights.indices.map(_.toLong)) &&
        landed.map(_._2).sameElements(weights),
      s"writeModel: side copy at $side does not read back as the trained " +
        "weights — refusing the swap")
    // UNSTAMP → swap → RESTAMP (the shared [[graft.core.StampedArtifact]]
    // discipline, r15): a writer dying between the rename and the stamp
    // reads as never-stamped, never as an old stamp over new weights
    graft.core.StampedArtifact.unstampAndSwap(spark, path, "weights",
      side.toString, Seq("_rows"))
    graft.core.StampedArtifact.writeMeta(spark, path, "_rows",
      weights.length.toString)
  }

  /** Stamped weight count; -1 if never stamped or the stamp is torn
    * garbage (the Bpe.vocabRows tolerant contract: both mean "no valid
    * stamp" and the caller's rebuild branch is the right response). */
  def modelRows(spark: SparkSession, path: String): Long =
    graft.core.StampedArtifact.stampedRows(spark, path)

  /** Reopen a persisted model, VALIDATED on load: stamp == row count,
    * buckets exactly 0..n-1 with one weight each. Loud require on any
    * mismatch — a silently different weight vector would flip keep/drop
    * decisions downstream with no error anywhere. Load contract
    * (decided once, r15 — see [[graft.core.StampedArtifact]]): this is
    * a DRIVER-SIZED artifact, collected whole, so the structural checks
    * are the full validation; it carries no `_xor` content stamp — the
    * write site already validated the side copy row-for-row against the
    * in-memory weights. A content swap inside those structural bounds
    * (same count, contiguous buckets, different weight values) is
    * accepted: these paths are internal, corpus-signature-keyed, and
    * cheap to retrain, unlike the cross-machine LM/index paths. */
  def loadModel(spark: SparkSession, path: String): Array[Long] = {
    val rows = spark.read.parquet(s"$path/weights")
      .select(col("bucket").cast("long"), col("weight").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    require(rows.nonEmpty, s"loadModel: empty weight table at $path/weights")
    val stamped = modelRows(spark, path)
    require(stamped == rows.length,
      s"loadModel: stamp $stamped != ${rows.length} weights at $path — torn write or out-of-API mutation; retrain")
    require(rows.map(_._1).sameElements(0L until rows.length.toLong),
      s"loadModel: non-contiguous buckets at $path")
    rows.map(_._2)
  }
}
