package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Relational.t

/** Round-12 batch 21: the incremental-dedup HISTORY made a persisted,
  * stamped artifact (q164 — the r10/r11 verdicts' "streaming incremental
  * dedup" item's batch half: q157 rebuilds the history fingerprint set
  * every run; a production loop builds it once, ships it, probes it —
  * from batch here, from a stream via
  * [[graft.streaming.Streaming.incrementalDedupStream]]). */
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
    val valid = FingerprintIndex.indexRows(s, path) == n &&
      FingerprintIndex.indexXor(s, path).contains(x)
    if (!valid) {
      val written = FingerprintIndex.writeIndex(s,
        FingerprintIndex.buildIndex(history, "doc_id", "text"), path)
      require(written == n,
        s"q164: freshly written index at $path stamped $written rows, expected $n")
    }
    val index = FingerprintIndex.loadIndex(s, path)
    FingerprintIndex.probe(batch, "doc_id", "text", index)
      .orderBy(col("doc_id"))
  }

  /** Mirror: identical to q157's — the artifact round-trip must be
    * invisible to the result. */
  val q164Sql: String = ScaleOps18.q157Sql
}
