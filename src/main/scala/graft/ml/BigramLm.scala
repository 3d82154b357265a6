package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.StampedArtifact

/** Persisted add-k bigram language model — the FOURTH stamped artifact
  * (after the BPE vocab, the fingerprint index, and the perceptron
  * weights), and the one CCNet actually ships: the reference-corpus LM
  * is trained once and every curation run SCORES against it; retraining
  * per consumer would repay the reference scan that dwarfs any single
  * batch. Ref behavior class: the reference pipeline's persisted,
  * validated state advancing between runs (`file-to-sql-loader.py:162-291`).
  *
  * Contents: the bigram count table `pairs/` (w1, w2, cxy) as parquet —
  * a DISTRIBUTED artifact like the fingerprint index (vocab²-bounded,
  * which at 100 TB is far too large to pass through a driver), plus the
  * `_v` vocabulary-size meta (distinct non-empty training tokens —
  * needed for the add-k denominator and NOT derivable from the pairs:
  * a token that only ever appears in single-token documents is in V but
  * in no bigram). Context totals ctx(w1) = Σ_w2 cxy are DERIVED on load
  * by one vocab-sized rollup — exact by construction, so they are never
  * stored (a stored copy could only drift).
  *
  * Write discipline: UNSTAMP → SIDE-WRITE-THEN-SWAP → RESTAMP (the
  * compactIndex / writeModel swap, hardened r15): the table lands
  * beside the live one, its (count, xor-of-row-hash) is re-derived
  * from what LANDED, then the OLD stamps are deleted (`_rows` first —
  * the gate [[loadLm]] validates), then delete + rename, then `_v`,
  * `_xor`, and `_rows` LAST. A reader races old-complete,
  * new-complete, a loud missing directory, or — anywhere in the
  * unstamp→restamp window — a NEVER-STAMPED artifact (lmRows = -1),
  * which callers' rebuild branch heals; before r15 a writer dying
  * between the rename and the stamps left the OLD stamps on NEW pairs,
  * silently accepted whenever the two models happened to share a row
  * count. The row hash is xxhash64(w1, w2, cxy) — Spark-side only (the
  * cross-engine oracle re-derives the MODEL from scratch; the stamp
  * never crosses engines), order-independent under xor, so the
  * signature is insensitive to partitioning and write order.
  * Single-writer contract.
  *
  * Load contract (decided once for all artifacts, r15): DISTRIBUTED
  * artifacts — this LM and the fingerprint index — validate the
  * CONTENT SIGNATURE on load (one partial-agg scan of a
  * vocab²-bounded table), because their paths cross runs and machines
  * (`Config.lmArtifactPath` is user-supplied) where an out-of-API
  * content swap preserving the row count is exactly the cheap-to-miss
  * tamper. Driver-sized artifacts (BPE vocab, perceptron weights)
  * validate stamp == rows plus FULL STRUCTURE (contiguity, ranges) —
  * they are collected whole anyway, and carry no content stamp. */
object BigramLm {

  /** Persist a trained model: `pairs` carries exactly (w1, w2, cxy);
    * `v` is the training vocabulary size. Returns the stamped row
    * count. An EMPTY model (no bigrams) is refused like the empty
    * fingerprint index — there is nothing to score with, and callers'
    * guard (V ≥ 1, pairs ≥ 1) should route around persistence. */
  def writeLm(spark: SparkSession, pairs: DataFrame, v: Long, path: String): Long = {
    require(pairs.columns.toSeq == Seq("w1", "w2", "cxy"),
      s"writeLm: expected (w1, w2, cxy), got ${pairs.columns.toSeq}")
    require(v >= 1, s"writeLm: vocabulary size must be >= 1, got $v")
    val side = new org.apache.hadoop.fs.Path(s"$path/pairs.swap")
    pairs.write.mode("overwrite").parquet(side.toString)
    val landed = spark.read.parquet(side.toString)
      .agg(count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(w1, w2, cxy))"), lit(0L)).as("x"))
      .head()
    val n = landed.getLong(0); val x = landed.getLong(1)
    require(n > 0, s"writeLm: refusing to stamp an empty model at $path")
    // UNSTAMP (`_rows` first — the gate loadLm validates) → swap →
    // RESTAMP (`_rows` last): a writer dying anywhere in the window
    // reads as NEVER-STAMPED (lmRows = -1 → rebuild), never as old
    // stamps over new pairs
    StampedArtifact.unstampAndSwap(spark, path, "pairs", side.toString,
      Seq("_rows", "_xor", "_v"))
    StampedArtifact.writeMeta(spark, path, "_v", v.toString)
    StampedArtifact.writeMeta(spark, path, "_xor", x.toString)
    StampedArtifact.writeMeta(spark, path, "_rows", n.toString)
    n
  }

  /** Stamped pair-row count; -1 if never stamped or torn garbage (the
    * vocab/index tolerant contract — the caller's rebuild branch is the
    * right response to both). */
  def lmRows(spark: SparkSession, path: String): Long =
    StampedArtifact.stampedRows(spark, path)

  /** Stamped content signature; None if absent or torn. */
  def lmXor(spark: SparkSession, path: String): Option[Long] =
    StampedArtifact.readMetaLong(spark, path, "_xor")

  /** Stamped vocabulary size; None if absent or torn. */
  def lmV(spark: SparkSession, path: String): Option[Long] =
    StampedArtifact.readMetaLong(spark, path, "_v")

  /** Reopen a persisted model, VALIDATED: (w1, w2, cxy) schema, stamp ==
    * on-disk row count, AND `_xor` == the xor-of-row-hash of what is
    * actually on disk (one partial-agg scan of the vocab²-bounded pair
    * table — r15, the distributed-artifact load contract: an
    * out-of-API content swap that preserves the row count must refuse
    * loudly, because `Config.lmArtifactPath` crosses runs and
    * machines), `_v` present and ≥ 1. Every failure is a `require`
    * (IllegalArgumentException) so callers' self-heal catch covers ALL
    * torn-state classes with one exception type. Returns the
    * DISTRIBUTED pair table plus V — never collected; the derived
    * context rollup stays a lazy plan the scorer's join consumes. */
  def loadLm(spark: SparkSession, path: String): (DataFrame, Long) = {
    val df = spark.read.parquet(s"$path/pairs")
    require(df.columns.toSeq == Seq("w1", "w2", "cxy"),
      s"bigram loadLm: unexpected schema ${df.schema.simpleString} at $path")
    val vOpt = lmV(spark, path)
    require(vOpt.isDefined,
      s"bigram loadLm: no _v stamp at $path — torn write; retrain")
    val v = vOpt.get
    require(v >= 1, s"bigram loadLm: stamped vocabulary $v < 1 at $path")
    val stamped = lmRows(spark, path)
    val xorOpt = lmXor(spark, path)
    require(xorOpt.isDefined,
      s"bigram loadLm: no _xor stamp at $path — torn write; retrain")
    // count + content signature from ONE scan
    val sig = df.agg(count(lit(1)).as("n"),
      coalesce(expr("bit_xor(xxhash64(w1, w2, cxy))"), lit(0L)).as("x")).head()
    val n = sig.getLong(0); val x = sig.getLong(1)
    require(stamped == n,
      s"bigram loadLm: stamp $stamped != $n rows at $path — torn write or " +
        "out-of-API mutation; retrain")
    require(xorOpt.get == x,
      s"bigram loadLm: content signature ${xorOpt.get} != $x at $path — " +
        "out-of-API content swap; retrain")
    (df, v)
  }

}
