package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 batch 29: the persisted TERTILE-BOUNDARY artifact as an
  * oracle-checked arm — q188 is q185 (the full CCNet disposition under
  * the reference LM) with the per-language boundaries going THROUGH the
  * fifth stamped artifact ([[graft.ml.TertileBounds]], r14 verdict #4):
  * compute boundaries from the batch-scored corpus → persist
  * (side-write-then-swap, stamps last) → reload (validated) → bucket
  * and mix with the LOADED table. The mirror is q185's, so the artifact
  * round-trip is provably invisible — the property the batch→stream
  * hand-off ([[graft.streaming.Streaming.lmMixStream]]) rests on:
  * boundaries are a global property only a batch pass can compute, and
  * shipping them must not move a single document between buckets.
  *
  * Ref behavior class: the reference pipeline's persisted, validated
  * state advancing between runs (`file-to-sql-loader.py:162-291`).
  *
  * Scale shape: q185's exactly (the scoring chain + the routed boundary
  * pass), plus one ≤#langs-row parquet write and a metadata-sized
  * validated load — the artifact is driver-sized, the persist cost is
  * noise next to the scoring chain it caches the output of. */
object ScaleOps29 {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Artifact location for the q188 boundary table — keyed by dir AND
    * the part-file signature (the q161/q164/q184 discipline) so a
    * rewritten corpus can never reuse stale boundaries. */
  private[graft] def boundsPathFor(s: SparkSession, dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_tertile_bounds/" +
      md5hex(dir + "|" + Relational.corpusSignature(s, dir, "documents"))

  /** Per-corpus memo of the expected boundary-table (rows, xor)
    * signature — deterministic in the corpus, so warm runs validate the
    * artifact by metadata and never re-run the scoring chain. */
  private val sigMemo =
    scala.collection.concurrent.TrieMap[(String, String), (Long, Long)]()

  private def scoredOf(s: SparkSession, dir: String): DataFrame =
    ScaleOps27.refFullScores(s, dir)
      .select(col("doc_id"), col("lang"), col("score_fp"))

  private def routingBound(s: SparkSession, dir: String): Long =
    graft.pipeline.Packing.largestGroupRowsMemo(
      Relational.t(s, dir, "documents").select(col("lang")), "lang",
      s"q185|$dir|${Relational.corpusSignature(s, dir, "documents")}")

  private def boundsOf(s: SparkSession, dir: String): DataFrame =
    ScaleOps25.tertileBounds(scoredOf(s, dir), routingBound(s, dir))

  private def boundsSig(s: SparkSession, dir: String): (Long, Long) =
    sigMemo.getOrElseUpdate(
      (dir, Relational.corpusSignature(s, dir, "documents")), {
        val r = boundsOf(s, dir)
          .agg(count(lit(1)).as("n"),
            coalesce(expr("bit_xor(xxhash64(lang, b1, b2))"), lit(0L)).as("x"))
          .head()
        (r.getLong(0), r.getLong(1))
      })

  /** q188: q185 THROUGH the persisted boundary artifact — the q184
    * lifecycle pattern applied to artifact #5. Idempotent persist with
    * SELF-HEAL: the artifact is trusted only when its (rows, xor)
    * stamps match the memoized expected signature; never-stamped, torn,
    * or tampered artifacts are rewritten in place and the query
    * converges. A load that fails anyway self-heals through the same
    * rebuild (both exception classes). A corpus with NO scorable
    * documents has no boundary table to persist (writeBounds rightly
    * refuses an empty one) — both engines yield an empty rollup, so the
    * arm skips persistence and runs the in-memory composition, exactly
    * q184's no-bigram discipline. */
  def q188BoundsArtifactMix(s: SparkSession, dir: String): DataFrame = {
    import graft.ml.TertileBounds
    val (n, x) = boundsSig(s, dir)
    val scored = scoredOf(s, dir)
    if (n == 0L)
      // no scored languages at all: nothing to persist, and the rollup
      // is empty on both engines (q185's empty-corpus shape)
      return ScaleOps27.mixRollup(
        ScaleOps25.assignTertiles(scored, routingBound(s, dir)))
    val path = boundsPathFor(s, dir)
    def rebuild(): Unit = {
      val written = TertileBounds.writeBounds(s, boundsOf(s, dir), path)
      require(written == n,
        s"q188: freshly written bounds at $path stamped $written rows, expected $n")
    }
    val valid = TertileBounds.boundsRows(s, path) == n &&
      TertileBounds.boundsXor(s, path).contains(x)
    if (!valid) rebuild()
    val loaded =
      try TertileBounds.loadBounds(s, path)
      catch {
        case _: IllegalArgumentException |
            _: org.apache.spark.sql.AnalysisException =>
          rebuild()
          TertileBounds.loadBounds(s, path)
      }
    ScaleOps27.mixRollup(ScaleOps25.bucketWithBounds(scored, loaded))
  }

  /** Mirror: identical to q185's — the boundary-artifact round-trip
    * must be invisible to the result. */
  val q188Sql: String = ScaleOps27.q185Sql
}
