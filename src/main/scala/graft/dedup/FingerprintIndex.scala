package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.StampedArtifact

/** Persisted shingle-fingerprint index — the artifact form of q157's
  * history side (ref behavior class: the reference's checkpoint/resume
  * ledger applied to dedup state; see `file-to-sql-loader.py:162-291`
  * for the resume discipline this generalizes).
  *
  * q157 recomputes `DISTINCT hash` over the whole history every run; at
  * 100 TB the history scan dwarfs the batch probe, and a production
  * incremental-dedup loop keeps the fingerprint set as a PERSISTED,
  * stamped index it probes (and later appends to) instead. This module
  * is the [[graft.text.Bpe.writeVocab]] lifecycle discipline applied to
  * a DISTRIBUTED artifact: parquet rows + a `_rows` stamp written LAST
  * (torn-writer canary) + an order-independent `_xor` content signature
  * (cheap set identity — a vocab-style driver-side element compare would
  * collect an index that is gigabytes at scale).
  *
  * Unlike the BPE vocab (driver-sized by design), the index NEVER
  * passes through the driver: build is a distinct partial-agg, write is
  * a distributed parquet write, validation is metadata counts + one
  * xor aggregate, probe is a distributed semi-join.
  */
object FingerprintIndex {

  /** Default shingle width — the q157/q85 kernel's 8 tokens. */
  val DefaultK = 8

  /** Per-document shingle hashes (idCol, h): the q157 kernel — k-token
    * sliding windows over the whitespace tokenization, FNV-1a-64 per
    * shingle (strings never leave the expression). Pure map + explode. */
  def shingleHashes(docs: DataFrame, idCol: String, textCol: String,
      k: Int = DefaultK): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    docs.select(col(idCol),
      graft.text.TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(col(idCol),
        explode(column(graft.functions.SlidingShingleHashes(
          expression(col("__t")), k))).as("h"))
  }

  /** The index content for a history corpus: DISTINCT shingle hashes —
    * one partial-agg exchange, hash-partitioned on the 8-byte value. */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String,
      k: Int = DefaultK): DataFrame =
    shingleHashes(docs, idCol, textCol, k).select(col("h")).distinct()

  /** Persist an index: `path/hashes` parquet (distributed write), then
    * the `_xor` content signature, then the `_rows` stamp LAST — a
    * writer that died mid-way leaves stamp ≠ count (or no stamp) and
    * [[loadIndex]] refuses loudly / the idempotence branch rewrites.
    * Count and xor are computed from what actually landed ON DISK, so
    * the stamp can never certify rows the write lost. Returns the
    * stamped row count. Single-writer contract, like the vocab. */
  def writeIndex(spark: SparkSession, hashes: DataFrame, path: String): Long = {
    require(hashes.columns.toSeq == Seq("h"),
      s"writeIndex: expected a single 'h' column, got ${hashes.columns.toSeq}")
    // UNSTAMP before the overwrite (`_rows` first — the shared
    // StampedArtifact discipline, r15): the overwrite destroys the old
    // data, so from here until the restamp the artifact must read as
    // NEVER-STAMPED, not as old stamps over whatever landed
    StampedArtifact.deleteMeta(spark, path, "_rows")
    StampedArtifact.deleteMeta(spark, path, "_xor")
    hashes.write.mode("overwrite").parquet(s"$path/hashes")
    val landed = spark.read.parquet(s"$path/hashes")
      .agg(count(lit(1)).as("n"),
        coalesce(expr("bit_xor(h)"), lit(0L)).as("x")).head()
    val n = landed.getLong(0); val x = landed.getLong(1)
    require(n > 0, s"writeIndex: refusing to stamp an empty index at $path")
    StampedArtifact.writeMeta(spark, path, "_xor", x.toString)
    StampedArtifact.writeMeta(spark, path, "_rows", n.toString)
    n
  }

  /** Fold a batch's hashes into an existing index WITHOUT rebuilding —
    * the lifecycle step a production incremental-dedup loop runs after
    * probing each batch (r12 verdict #1: the only write path was a full
    * rebuild, and at 100 TB the rebuild is the history scan the
    * artifact exists to avoid; the reference's ledger advances state
    * incrementally the same way, `file-to-sql-loader.py:162-291`).
    *
    * Steps, torn-write-safe in the same order discipline as
    * [[writeIndex]]:
    *   1. validate the existing artifact ([[loadIndex]] — stamp must
    *      equal the on-disk count, so an append can never stack on top
    *      of a torn base);
    *   2. novel = distinct(batch hashes) ANTI-JOIN the on-disk index —
    *      one co-partitioned 8-byte-key exchange, batch-sized output;
    *      the raw document history is NEVER rescanned and the index is
    *      read, not rewritten;
    *   3. append the novel rows as NEW part files (`mode("append")` —
    *      existing files are untouched, so a dying writer can only
    *      leave extra unstamped rows, never corrupt stamped ones);
    *   4. re-derive the delta's (count, xor) from the files that
    *      actually LANDED (the listing diff — the writeIndex
    *      stamp-certifies-only-what-landed rule, applied to the delta);
    *   5. stamp `_xor` then `_rows` LAST, incrementally: rows' = rows +
    *      Δrows, xor' = xor ⊕ Δxor — exact because the delta is
    *      disjoint from the index (step 2) and xor is associative,
    *      commutative, and self-inverse.
    * A writer dying between 3 and 5 leaves stamp ≠ on-disk count, which
    * [[loadIndex]] refuses loudly and the callers' signature-validation
    * branch rewrites (self-heal) — spec-pinned.
    *
    * Cost ∝ batch + one pass over the COMPACT index (8 bytes/shingle,
    * orders of magnitude under the corpus scan a rebuild pays);
    * `ScaleStress apnd` measures append vs rebuild directly. Returns
    * the new stamped row count. Single-writer contract, like the
    * vocab. */
  def appendIndex(spark: SparkSession, newHashes: DataFrame, path: String): Long = {
    require(newHashes.columns.toSeq == Seq("h"),
      s"appendIndex: expected a single 'h' column, got ${newHashes.columns.toSeq}")
    val existing = loadIndex(spark, path)
    val oldRows = indexRows(spark, path)
    val oldXorOpt = indexXor(spark, path)
    require(oldXorOpt.isDefined,
      s"appendIndex: index at $path has no _xor stamp — rebuild")
    val oldXor = oldXorOpt.get
    val novel = newHashes.select(col("h")).distinct()
      .join(existing, Seq("h"), "left_anti")
    val hp = new org.apache.hadoop.fs.Path(s"$path/hashes")
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(): Map[String, org.apache.hadoop.fs.Path] =
      fs.listStatus(hp).filterNot(st =>
          st.getPath.getName.startsWith("_") ||
            st.getPath.getName.startsWith("."))
        .map(st => st.getPath.getName -> st.getPath).toMap
    val before = dataFiles()
    novel.write.mode("append").parquet(s"$path/hashes")
    val landedPaths = (dataFiles() -- before.keySet).values.toSeq
    if (landedPaths.isEmpty) return oldRows // nothing novel, stamps stand
    val landed = spark.read.parquet(landedPaths.map(_.toString): _*)
      .agg(count(lit(1)).as("n"),
        coalesce(expr("bit_xor(h)"), lit(0L)).as("x")).head()
    val dn = landed.getLong(0); val dx = landed.getLong(1)
    if (dn == 0L) return oldRows // only empty part files landed
    StampedArtifact.writeMeta(spark, path, "_xor", (oldXor ^ dx).toString)
    StampedArtifact.writeMeta(spark, path, "_rows", (oldRows + dn).toString)
    oldRows + dn
  }

  /** Number of data part files currently backing the index — the
    * small-files readout that tells an operator the append loop is due
    * a [[compactIndex]]. Listing-only, no data read. */
  def indexDataFiles(spark: SparkSession, path: String): Int = {
    val hp = new org.apache.hadoop.fs.Path(s"$path/hashes")
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hp)) 0
    else fs.listStatus(hp).count(st => !st.getPath.getName.startsWith("_") &&
      !st.getPath.getName.startsWith("."))
  }

  /** Rewrite the index's data files into `targetFiles` part files
    * WITHOUT changing its content — the compaction half of the
    * append/compact lifecycle: every [[appendIndex]] batch lands its
    * delta as new part files, so a long-running incremental-dedup loop
    * accumulates one small file-set per batch and the probe's scan
    * eventually pays more in file opens than in bytes. Content identity
    * is enforced, not assumed: the compacted copy is written BESIDE the
    * live data, its (count, xor) is re-derived from what landed and
    * must equal the live stamps BEFORE the swap, and the stamps
    * themselves never change (compaction is invisible to every reader
    * by construction).
    *
    * Crash windows, by step: dying during the side write leaves a stray
    * `hashes.compact` the next compaction overwrites (readers never
    * look at it); dying between the delete and the rename leaves no
    * data directory, which [[loadIndex]] refuses loudly and the
    * callers' signature-validation branch rebuilds (the q174 self-heal
    * discipline — same terminal state as a torn write, same recovery).
    * Single-writer contract, like the vocab.
    *
    * Cost: one pass over the COMPACT index (8 bytes/shingle) + one
    * exchange to `targetFiles` partitions — never touches the corpus.
    * Returns the (unchanged) stamped row count. */
  def compactIndex(spark: SparkSession, path: String,
      targetFiles: Int = 8): Long = {
    require(targetFiles >= 1,
      s"compactIndex: targetFiles must be >= 1, got $targetFiles")
    val df = loadIndex(spark, path) // validates stamp == on-disk count
    val n = indexRows(spark, path)
    val xOpt = indexXor(spark, path)
    require(xOpt.isDefined,
      s"compactIndex: index at $path has no _xor stamp — rebuild")
    val x = xOpt.get
    val side = s"$path/hashes.compact"
    df.repartition(targetFiles).write.mode("overwrite").parquet(side)
    val landed = spark.read.parquet(side)
      .agg(count(lit(1)).as("n"),
        coalesce(expr("bit_xor(h)"), lit(0L)).as("x")).head()
    require(landed.getLong(0) == n && landed.getLong(1) == x,
      s"compactIndex: compacted copy at $side reads (${landed.getLong(0)}, " +
        s"${landed.getLong(1)}), live stamps say ($n, $x) — refusing the swap")
    // swap WITHOUT unstamping: content identity was just enforced, so
    // the live stamps are correct for both the old and the new files —
    // compaction must stay invisible to a reader racing it
    StampedArtifact.unstampAndSwap(spark, path, "hashes", side, Nil)
    n
  }

  /** Stamped row count; -1 if never stamped or the stamp is torn
    * garbage (same tolerant contract as [[graft.text.Bpe.vocabRows]]:
    * both mean "no valid stamp" and the caller's rebuild branch is the
    * right response to both). */
  def indexRows(spark: SparkSession, path: String): Long =
    StampedArtifact.stampedRows(spark, path)

  /** Stamped content signature (bit-xor of all hashes); None if absent
    * or torn. Order-independent, so it is insensitive to partitioning
    * and write order — exactly what a distributed set identity needs. */
  def indexXor(spark: SparkSession, path: String): Option[Long] =
    StampedArtifact.readMetaLong(spark, path, "_xor")

  /** Reopen a persisted index, VALIDATED: single long `h` column, stamp
    * == on-disk row count (metadata-cheap). A torn or out-of-API
    * mutated artifact surfaces as a loud require, never a silently
    * different dedup verdict. Returns the DISTRIBUTED hash set — never
    * collected.
    *
    * Load contract (decided once, r15 — see
    * [[graft.core.StampedArtifact]]): this load runs INSIDE hot loops —
    * the incremental-dedup stream reopens the index per MICRO-BATCH —
    * and the index is corpus-bounded (one row per distinct shingle), so
    * the default validation is stamp == count; the `_xor` signature is
    * enforced at every WRITE boundary instead (writeIndex and
    * appendIndex re-derive it from what landed; compactIndex refuses a
    * swap whose copy mismatches the live stamps). Pass
    * `verifyContent = true` for the cross-machine hand-off case (an
    * index shipped by path between runs, the `Config.lmArtifactPath`
    * threat model) — one extra xor partial-agg scan per load. */
  def loadIndex(spark: SparkSession, path: String,
      verifyContent: Boolean = false): DataFrame = {
    val df = spark.read.parquet(s"$path/hashes")
    require(df.columns.toSeq == Seq("h") &&
        df.schema("h").dataType == org.apache.spark.sql.types.LongType,
      s"fingerprint loadIndex: unexpected schema ${df.schema.simpleString} at $path")
    val stamped = indexRows(spark, path)
    if (verifyContent) {
      val xorOpt = indexXor(spark, path)
      require(xorOpt.isDefined,
        s"fingerprint loadIndex: no _xor stamp at $path — torn write; rebuild")
      val sig = df.agg(count(lit(1)).as("n"),
        coalesce(expr("bit_xor(h)"), lit(0L)).as("x")).head()
      require(stamped == sig.getLong(0),
        s"fingerprint loadIndex: stamp $stamped != ${sig.getLong(0)} rows at $path — torn write or out-of-API mutation; rebuild")
      require(xorOpt.get == sig.getLong(1),
        s"fingerprint loadIndex: content signature ${xorOpt.get} != ${sig.getLong(1)} at $path — out-of-API content swap; rebuild")
    } else {
      val n = df.count()
      require(stamped == n,
        s"fingerprint loadIndex: stamp $stamped != $n rows at $path — torn write or out-of-API mutation; rebuild")
    }
    df
  }

  /** Probe a batch against an index: per batch document, how much of it
    * history has already seen — n_shingles, n_hist_dup, dup fraction at
    * 10⁻⁶ fixed point, and the ≥30 % quarantine flag (exactly q157's
    * readout). `batch` carries (idCol, textCol); the join is a LEFT
    * SEMI on the 8-byte hash — the index side is hash-partitioned,
    * the batch side streams through, no strings cross an exchange. */
  def probe(batch: DataFrame, idCol: String, textCol: String,
      index: DataFrame, k: Int = DefaultK): DataFrame = {
    val ph = shingleHashes(batch, idCol, textCol, k)
    val hits = ph.join(index, Seq("h"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hist_dup"))
    ph.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
      .join(hits, Seq(idCol), "left")
      .withColumn("n_hist_dup", coalesce(col("n_hist_dup"), lit(0L)))
      .withColumn("dup_fp",
        expr("CAST(n_hist_dup * 1000000 div n_shingles AS BIGINT)"))
      .withColumn("quarantined", col("dup_fp") >= 300000L)
      .select(col(idCol), col("n_shingles"), col("n_hist_dup"),
        col("dup_fp"), col("quarantined"))
  }

}
