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
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$path/weights")
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
    if (fs.exists(live))
      require(fs.delete(live, true), s"writeModel: could not remove $live")
    require(fs.rename(side, live), s"writeModel: could not swap $side into place")
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$path/_rows"), true)
    try out.write(weights.length.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Stamped weight count; -1 if never stamped or the stamp is torn
    * garbage (the Bpe.vocabRows tolerant contract: both mean "no valid
    * stamp" and the caller's rebuild branch is the right response). */
  def modelRows(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_rows")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](64)
        var total = 0
        var n = in.read(buf, total, buf.length - total)
        while (n > 0 && total + n < buf.length) {
          total += n
          n = in.read(buf, total, buf.length - total)
        }
        if (n > 0) total += n
        val s = new String(buf, 0, total, "UTF-8").trim
        try s.toLong catch { case _: NumberFormatException => -1L }
      } finally in.close()
    }
  }

  /** Reopen a persisted model, VALIDATED on load: stamp == row count,
    * buckets exactly 0..n-1 with one weight each. Loud require on any
    * mismatch — a silently different weight vector would flip keep/drop
    * decisions downstream with no error anywhere. */
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
