package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.StampedArtifact

/** Persisted per-language tertile boundaries — the FIFTH stamped
  * artifact (r14 verdict #4), and the piece that lets a STREAM run the
  * full CCNet disposition: `lmScoreStream` can score continuously
  * against the shipped LM, but head/middle/tail bucketing needs global
  * per-language boundaries only a batch pass over the whole scored
  * corpus can compute ([[graft.ops.ScaleOps25.tertileBounds]] — the
  * routed exact/histogram pass). So the batch computes and ships
  * (lang, b1, b2); the stream reopens it per micro-batch and applies it
  * statelessly ([[graft.streaming.Streaming.lmMixStream]]). Ref
  * behavior class: the reference's persisted state advancing between
  * runs (`file-to-sql-loader.py:162-291`).
  *
  * Contents: `bounds/` (lang string, b1 double, b2 double) as parquet —
  * ≤ #languages rows, driver-sized. The doubles round-trip bit-exactly
  * through parquet, so a bucket decided against the loaded table equals
  * one decided against the in-memory table (the parity specs pin this).
  *
  * Write discipline: the shared [[StampedArtifact]] lifecycle — UNSTAMP
  * (`_rows` first) → side-write-then-swap → RESTAMP (`_rows` last), the
  * (count, xor) re-derived from what LANDED. An empty boundary table is
  * refused like the empty LM/index: no languages means nothing to
  * bucket with, and callers' guard should route around persistence.
  *
  * Load contract: although driver-SIZED, this table's path crosses the
  * batch→stream hand-off (and machines) exactly like
  * `Config.lmArtifactPath`, so it takes the DISTRIBUTED-artifact side
  * of the contract — `_xor` content signature validated on load (free
  * at ≤ #langs rows) — PLUS the full structural checks a driver-sized
  * artifact gets: non-null distinct languages, finite b1 ≤ b2. Every
  * failure is a `require` (IllegalArgumentException), one exception
  * class for all torn states. Single-writer contract. */
object TertileBounds {

  /** Persist a boundary table: `bounds` carries exactly (lang, b1, b2);
    * `scorer` is the producer's RANKING-SEMANTICS identity (smoothing +
    * domain + reference choice, e.g. "addk:ref=en:arith") — boundaries
    * are only meaningful against scores from the SAME ranking, and a
    * batch→stream hand-off where the consumer is configured differently
    * must refuse loudly instead of silently bucketing one ranking's
    * scores against another's cut points. The tag deliberately does NOT
    * pin model CONTENT: a retrained model under the same semantics is
    * the legitimate rotation case (boundaries lag the model until the
    * next boundary batch — CCNet's own design). Returns the stamped row
    * count. */
  def writeBounds(spark: SparkSession, bounds: DataFrame, path: String,
      scorer: String): Long =
    sideWriteAndStamp(spark, bounds, path, scorer, allowEmpty = false)

  /** [[writeBounds]] that tolerates an EMPTY bounds table — the caller's
    * no-scorable-documents corner: nothing lands, nothing is stamped,
    * the artifact root is removed (a bare root directory must not look
    * like a half-written artifact), and 0 is returned. One chain run
    * either way: emptiness is discovered from the LANDED side copy, not
    * a separate pre-count of the (expensive) boundary computation. */
  def writeBoundsIfAny(spark: SparkSession, bounds: DataFrame, path: String,
      scorer: String): Long =
    sideWriteAndStamp(spark, bounds, path, scorer, allowEmpty = true)

  private def sideWriteAndStamp(spark: SparkSession, bounds: DataFrame,
      path: String, scorer: String, allowEmpty: Boolean): Long = {
    require(bounds.columns.toSeq == Seq("lang", "b1", "b2"),
      s"writeBounds: expected (lang, b1, b2), got ${bounds.columns.toSeq}")
    require(scorer.nonEmpty && !scorer.exists(_.isWhitespace),
      s"writeBounds: scorer tag must be a non-empty token, got '$scorer'")
    val side = new org.apache.hadoop.fs.Path(s"$path/bounds.swap")
    bounds.write.mode("overwrite").parquet(side.toString)
    val landed = spark.read.parquet(side.toString)
      .agg(count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(lang, b1, b2))"), lit(0L)).as("x"))
      .head()
    val n = landed.getLong(0); val x = landed.getLong(1)
    if (n == 0 && allowEmpty) {
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(root, true)
      return 0L
    }
    require(n > 0, s"writeBounds: refusing to stamp an empty boundary table at $path")
    StampedArtifact.unstampAndSwap(spark, path, "bounds", side.toString,
      Seq("_rows", "_xor", "_scorer"))
    StampedArtifact.writeMeta(spark, path, "_scorer", scorer)
    StampedArtifact.writeMeta(spark, path, "_xor", x.toString)
    StampedArtifact.writeMeta(spark, path, "_rows", n.toString)
    n
  }

  /** Stamped scorer identity; None if absent or torn. Reads through
    * the shared read-until-EOF loop ([[StampedArtifact.readMetaString]]
    * — r15 advice: a one-shot `in.read(buf)` can return fewer bytes
    * than available on chunked streams, truncating the tag into a
    * spurious scorer-mismatch refusal of a VALID artifact). */
  def boundsScorer(spark: SparkSession, path: String): Option[String] =
    StampedArtifact.readMetaString(spark, path, "_scorer")

  /** [[loadBounds]] plus the ranking-semantics check: the consumer
    * states what scorer ITS scores come from, and a boundary table
    * produced under any other ranking refuses loudly. */
  def loadBoundsFor(spark: SparkSession, path: String,
      expectedScorer: String): DataFrame = {
    val df = loadBounds(spark, path)
    val got = boundsScorer(spark, path)
    require(got.contains(expectedScorer),
      s"loadBounds: boundary table at $path was computed under scorer " +
        s"'${got.getOrElse("<unstamped>")}' but the consumer scores with " +
        s"'$expectedScorer' — bucketing one ranking's scores against " +
        "another's cut points is silently wrong; recompute the boundaries")
    df
  }

  /** Stamped boundary-row count; -1 if never stamped or torn garbage. */
  def boundsRows(spark: SparkSession, path: String): Long =
    StampedArtifact.stampedRows(spark, path)

  /** Stamped content signature; None if absent or torn. */
  def boundsXor(spark: SparkSession, path: String): Option[Long] =
    StampedArtifact.readMetaLong(spark, path, "_xor")

  /** Reopen a persisted boundary table, VALIDATED: (lang, b1, b2)
    * schema, stamp == on-disk rows, `_xor` == the content signature of
    * what is actually on disk, languages non-null and DISTINCT (two
    * rows for one language would bucket nondeterministically), b1 and
    * b2 finite with b1 ≤ b2. Returns the ≤ #langs-row table — small
    * enough that the consumer's join broadcasts it. */
  def loadBounds(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(s"$path/bounds")
    require(df.columns.toSeq == Seq("lang", "b1", "b2"),
      s"loadBounds: unexpected schema ${df.schema.simpleString} at $path")
    val xorOpt = boundsXor(spark, path)
    require(xorOpt.isDefined,
      s"loadBounds: no _xor stamp at $path — torn write; rebuild")
    require(boundsScorer(spark, path).isDefined,
      s"loadBounds: no _scorer stamp at $path — torn write; rebuild")
    // count + signature + every structural invariant from ONE scan of
    // the ≤#langs-row table
    val sig = df.agg(count(lit(1)).as("n"),
      coalesce(expr("bit_xor(xxhash64(lang, b1, b2))"), lit(0L)).as("x"),
      count_distinct(col("lang")).as("nlang"),
      sum((col("lang").isNull || isnan(col("b1")) || isnan(col("b2")) ||
        col("b1").isNull || col("b2").isNull ||
        col("b1") > col("b2")).cast("long")).as("bad"))
      .head()
    val n = sig.getLong(0)
    require(StampedArtifact.stampedRows(spark, path) == n,
      s"loadBounds: stamp ${StampedArtifact.stampedRows(spark, path)} != $n " +
        s"rows at $path — torn write or out-of-API mutation; rebuild")
    require(xorOpt.get == sig.getLong(1),
      s"loadBounds: content signature ${xorOpt.get} != ${sig.getLong(1)} at " +
        s"$path — out-of-API content swap; rebuild")
    require(sig.getLong(2) == n,
      s"loadBounds: duplicate language rows at $path (${sig.getLong(2)} " +
        s"distinct of $n) — rebuild")
    require(sig.getLong(3) == 0L,
      s"loadBounds: ${sig.getLong(3)} structurally invalid rows at $path " +
        "(null/NaN boundary or b1 > b2) — rebuild")
    df
  }

  /** Per-path memo of the audit mode's expected (rows, xor) signature —
    * the path is already corpus-signature + ranking keyed, so one audit
    * derivation per artifact per JVM suffices. */
  private val auditSigMemo =
    scala.collection.concurrent.TrieMap[String, (Long, Long)]()

  private[graft] def clearAuditMemo(): Unit = auditSigMemo.clear()

  /** The full boundary-artifact acquisition lifecycle, shared by every
    * producer/consumer pair (q188, q192, the pipeline's `lm_bounds`
    * stage): return the VALIDATED boundary table at `path`, building or
    * self-healing it from `compute` when needed; None when the corpus
    * has no scorable documents (nothing to persist — the caller routes
    * to its in-memory empty composition).
    *
    * HOT PATH (r16 verdict #1 — this is the design change that makes a
    * warm artifact cost METADATA ONLY on a cold JVM): a stamped artifact
    * is trusted on the strength of (a) its PATH — callers key it by the
    * corpus content signature plus the ranking salt, so an artifact at
    * this path cannot be stale for this corpus — and (b) its
    * SELF-VALIDATING stamps: [[loadBounds]] re-derives the content
    * signature of what is actually on disk and compares it to `_xor`,
    * so every torn write, partial copy, or content tamper that does not
    * also forge consistent stamps still self-heals here. What the hot
    * path deliberately does NOT do is re-run the full score→boundaries
    * chain to re-derive the EXPECTED signature per fresh JVM — that
    * recompute defended only against an internally-consistent-but-wrong
    * producer (forged content AND forged matching stamps), and at 100 TB
    * it priced one redundant full corpus pass into every session's
    * first artifact touch (measured: q192 floored at ~2× q191 cold).
    *
    * AUDIT MODE (`spark.conf graft.artifact.audit=true`): the full
    * expected-signature recompute, for exactly that forged-producer
    * case — re-derives (rows, xor) from `compute` (memoized per path
    * per JVM), compares to the stamps, and rebuilds on mismatch.
    * Ref behavior class: checkpoint reuse without re-validation scans
    * (`file-to-sql-loader.py:231-251`), with the audit as the explicit
    * deep-check escape hatch. */
  def acquire(spark: SparkSession, path: String, scorer: String,
      compute: () => DataFrame): Option[DataFrame] = {
    def freshLoad(): Option[DataFrame] =
      if (writeBoundsIfAny(spark, compute(), path, scorer) == 0L) None
      else Some(loadBoundsFor(spark, path, scorer))
    val stamped = boundsRows(spark, path) > 0 &&
      boundsXor(spark, path).isDefined &&
      boundsScorer(spark, path).contains(scorer)
    if (!stamped) return freshLoad()
    val hot =
      try Some(loadBoundsFor(spark, path, scorer))
      catch {
        case _: IllegalArgumentException |
            _: org.apache.spark.sql.AnalysisException => None
      }
    hot match {
      case None => freshLoad() // torn or inconsistently tampered: self-heal
      case some if !spark.conf.get("graft.artifact.audit", "false").toBoolean =>
        some
      case some =>
        val (n, x) = auditSigMemo.getOrElseUpdate(path, {
          val r = compute()
            .agg(count(lit(1)).as("n"),
              coalesce(expr("bit_xor(xxhash64(lang, b1, b2))"), lit(0L)).as("x"))
            .head()
          (r.getLong(0), r.getLong(1))
        })
        if (boundsRows(spark, path) == n && boundsXor(spark, path).contains(x))
          some
        else freshLoad() // internally consistent but WRONG: audit caught it
    }
  }
}
