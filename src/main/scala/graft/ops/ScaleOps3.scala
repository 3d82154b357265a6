package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.{BloomDedup, ChunkDedup, SemDedup}
import graft.text.Relevance
import Relational.t

/** Round-6 additions to the training-data pipeline layer: chunk-level
  * (substring) dedup, TF-IDF term relevance, semantic dedup over embedding
  * clusters, and bloom-filter incremental dedup — all with full DuckDB
  * oracles (q66's centroid-literal mirror follows the q35 pattern).
  *
  * The synthetic corpus has no natural duplicate chunks, no natural
  * near-dup embeddings (max pairwise cosine 0.513 at sf0.01), and no
  * natural exact-dup documents, so q64/q66/q67 PLANT deterministic
  * duplicates (the q25/q59 move) — each oracle exercises real detection
  * semantics instead of passing vacuously on empty results. */
object ScaleOps3 {

  // --- chunk-level (substring) dedup (q64) --------------------------------

  /** q64: aligned 10-token-chunk duplication stats per document
    * ([[ChunkDedup.chunkStats]]). Planted rows (source doc_id % 10 == 0,
    * planted id = source + 10000000000) start with the source's first 10 tokens
    * — a chunk-aligned duplicated span — followed by a unique marker
    * token, so planted docs measure dup_frac 0.5 and their sources gain
    * one duplicated chunk. */
  def q64ChunkDedup(s: SparkSession, dir: String): DataFrame = {
    // no call-site fanOut: chunkStats fans out the (docs ∪ planted) input
    // itself — fanning here too would stack a second exchange
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val tk = graft.text.TextAnalysis.tokens(col("text"))
    val planted = docs.filter(col("doc_id") % 10 === 0).select(
      (col("doc_id") + 10000000000L).as("doc_id"),
      concat(array_join(slice(tk, 1, 10), " "),
        lit(" zzuniq"), col("doc_id").cast("string")).as("text"))
    ChunkDedup.chunkStats(docs.unionByName(planted), "doc_id", "text",
      chunkTokens = 10, dropFrac = 0.3)
      .orderBy(col("doc_id"))
  }

  val q64Sql: String =
    raw"""WITH base AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000000 AS doc_id,
      |    array_to_string(list_slice(regexp_split_to_array(trim(lower(text)), '\s+'), 1, 10), ' ')
      |      || ' zzuniq' || CAST(doc_id AS VARCHAR) AS text
      |  FROM documents WHERE doc_id % 10 = 0
      |), toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM base
      |), chunks AS (
      |  SELECT doc_id, unnest(list_transform(
      |    generate_series(0, CAST(ceil(len(t) / 10.0) AS BIGINT) - 1),
      |    i -> array_to_string(list_slice(t, i * 10 + 1, i * 10 + 10), ' '))) AS ch
      |  FROM toks
      |), cf AS (
      |  SELECT ch, COUNT(DISTINCT doc_id) AS df_docs FROM chunks GROUP BY ch
      |), per AS (
      |  SELECT c.doc_id, COUNT(*) AS n_chunks,
      |    CAST(SUM(CASE WHEN cf.df_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
      |  FROM chunks c JOIN cf USING (ch) GROUP BY c.doc_id
      |)
      |SELECT doc_id, n_chunks, n_dup_chunks,
      |  CAST(n_dup_chunks AS DOUBLE) / CAST(n_chunks AS DOUBLE) AS dup_frac,
      |  (CAST(n_dup_chunks AS DOUBLE) / CAST(n_chunks AS DOUBLE) >= 0.3) AS drop_doc
      |FROM per ORDER BY doc_id""".stripMargin

  // --- TF-IDF term relevance (q65) ----------------------------------------

  /** q65: top-3 terms per document by tf·idf
    * ([[Relevance.tfIdfTopTerms]] — unlogged engine-portable idf N/df;
    * see its doc for why ln() can't be hash-compared across engines). */
  def q65Tfidf(s: SparkSession, dir: String): DataFrame =
    Relevance.tfIdfTopTerms(t(s, dir, "documents"), "doc_id", "text", k = 3)
      .orderBy(col("doc_id"), col("rank"))

  val q65Sql: String =
    raw"""WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents
      |), terms AS (
      |  SELECT doc_id, unnest(t) AS term FROM toks
      |), tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term
      |), dfreq AS (
      |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
      |), n AS (
      |  SELECT COUNT(*) AS n_docs FROM documents
      |), scored AS (
      |  SELECT doc_id, term, tf, df,
      |    CAST(tf * n_docs AS DOUBLE) / CAST(df AS DOUBLE) AS score
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN n
      |), ranked AS (
      |  SELECT doc_id, term, tf, df, score,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
      |  FROM scored
      |)
      |SELECT doc_id, rank, term, CAST(tf AS BIGINT) AS tf,
      |  CAST(df AS BIGINT) AS df, score
      |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  // --- semantic dedup over embedding clusters (q66) -----------------------

  @volatile private var q66LastDir: Option[String] = None

  /** q66: SemDeDup — IVF coarse-quantizer clusters (the q35 centroids,
    * shared memo) + within-cluster cosine near-dup pairs at 0.95
    * ([[SemDedup.clusterDupStats]]). Planted near-dups: vec_id < 50
    * duplicated at id+1000000 with the first component HALVED — exact in
    * float AND double, so the perturbation mirrors bit-for-bit in SQL
    * (cos to the source ≈ 0.998, far above the 0.513 natural maximum).
    * Centroids train on the BASE corpus (the historical index); the
    * planted "new" vectors are assigned against them. */
  def q66Semdedup(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents = ScaleOps.trainedCentroids(emb, dir)
    q66LastDir = Some(dir)
    val planted = emb.filter(col("vec_id") < 50).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      concat(
        array((element_at(col("embedding"), 1) * lit(0.5)).cast("float")),
        slice(col("embedding"), lit(2), size(col("embedding")) - 1)).as("embedding"))
    val corpus = emb.select(col("vec_id"), col("embedding")).unionByName(planted)
    val assigned = graft.sim.Ivf.assign(corpus, "vec_id", "embedding", cents)
    SemDedup.clusterDupStats(assigned, threshold = 0.95)
      .orderBy(col("centroid_id"))
  }

  /** DuckDB mirror of q66 — data-dependent like q35: inlines the shared
    * memoized centroids as DOUBLE[] literals; assignment tie-breaks and
    * the zero-norm CASE copy the proven q35 asg CTE verbatim. Dir-keyed
    * like [[ScaleOps.q35SqlFor]]: present only after the shared quantizer
    * has trained on `dir` in this JVM. */
  def q66SqlFor(dir: String): Option[String] = ScaleOps.trainedCentroidsOpt(dir).map { cents =>
    val values = cents.map { case (i, v) =>
      s"($i, ${v.map(f => ScaleOps5.doubleLit(f.toDouble)).mkString("[", ", ", "]")}::DOUBLE[])"
    }.mkString(",\n")
    raw"""WITH cent(centroid_id, cvec) AS (
      |    VALUES $values
      |), u AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000 AS vec_id,
      |    list_prepend(CAST(embedding[1] * CAST(0.5 AS REAL) AS REAL), embedding[2:]) AS embedding
      |  FROM embeddings WHERE vec_id < 50
      |), b AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      |  FROM u
      |), asg AS (
      |  SELECT vec_id, embedding, nrm, centroid_id FROM (
      |    SELECT b.vec_id, b.embedding, b.nrm, cent.centroid_id,
      |      ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
      |        CASE WHEN list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]) = 0
      |               OR list_inner_product(cent.cvec, cent.cvec) = 0 THEN -1.0
      |             ELSE list_inner_product(b.embedding::DOUBLE[], cent.cvec)
      |                  / (sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))
      |                   * sqrt(list_inner_product(cent.cvec, cent.cvec))) END DESC,
      |        cent.centroid_id) AS rn
      |    FROM b, cent) WHERE rn = 1
      |), mem AS (
      |  SELECT centroid_id, COUNT(*) AS n_members FROM asg GROUP BY centroid_id
      |), pairs AS (
      |  SELECT a.centroid_id, a.vec_id AS id_a, b2.vec_id AS id_b
      |  FROM asg a JOIN asg b2
      |    ON a.centroid_id = b2.centroid_id AND a.vec_id < b2.vec_id
      |  WHERE list_inner_product(a.embedding::DOUBLE[], b2.embedding::DOUBLE[])
      |        / (a.nrm * b2.nrm) >= 0.95
      |), pa AS (
      |  SELECT centroid_id, COUNT(*) AS n_dup_pairs FROM pairs GROUP BY centroid_id
      |), rm AS (
      |  SELECT centroid_id, COUNT(*) AS n_removed,
      |    CAST(SUM(id_b) AS BIGINT) AS removed_id_sum
      |  FROM (SELECT DISTINCT centroid_id, id_b FROM pairs) GROUP BY centroid_id
      |)
      |SELECT m.centroid_id, m.n_members,
      |  COALESCE(pa.n_dup_pairs, 0) AS n_dup_pairs,
      |  COALESCE(rm.n_removed, 0) AS n_removed,
      |  CAST(COALESCE(rm.removed_id_sum, 0) AS BIGINT) AS removed_id_sum
      |FROM mem m
      |LEFT JOIN pa USING (centroid_id)
      |LEFT JOIN rm USING (centroid_id)
      |ORDER BY centroid_id""".stripMargin
  }

  /** Legacy no-arg accessor: the mirror for the most recently run corpus
    * (the single-corpus Verify contract). Prefer [[q66SqlFor]]. */
  def q66SqlOpt: Option[String] = q66LastDir.flatMap(q66SqlFor)

  // --- bloom-filter incremental dedup (q67) -------------------------------

  /** q67: incremental dedup of a "new batch" against a historical corpus
    * through a broadcast bloom filter ([[BloomDedup.bloomDedupStats]]).
    * History = even doc_ids; new batch = odd doc_ids plus planted exact
    * copies of every doc_id % 10 == 0 history doc (id + 20000000000) — the true
    * duplicates the filter must catch. Exact counts + sketch-property
    * booleans (q37 oracle pattern). */
  def q67BloomDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val hist = docs.filter(col("doc_id") % 2 === 0)
    val fresh = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 20000000000L).as("doc_id"), col("text")))
    BloomDedup.bloomDedupStats(hist, fresh, "doc_id", "text")
  }

  val q67Sql: String =
    """WITH newb AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
      |  UNION ALL
      |  SELECT doc_id + 20000000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
      |), hist AS (
      |  SELECT DISTINCT md5(text) AS k FROM documents WHERE doc_id % 2 = 0
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_new,
      |  CAST(SUM(CASE WHEN h.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_true_dup,
      |  true AS bloom_caught_all_dups,
      |  true AS fpr_within_bound
      |FROM (SELECT md5(text) AS k FROM newb) n
      |LEFT JOIN hist h USING (k)""".stripMargin

  // --- shingle containment dedup (q68) ------------------------------------

  /** q68: Broder containment pairs ([[graft.dedup.Dedup.containmentPairs]],
    * production df-capped path, cap mirrored in the oracle like q60) —
    * catches SUBSET duplication that Jaccard misses: planted rows (source
    * doc_id % 10 == 0, id + 30000000000) are the source's first 15 tokens, a
    * sub-document whose shingle set is fully contained in its source
    * (contain_b = 1.0) while its Jaccard against it stays well under the
    * q19 threshold. */
  def q68Containment(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.fanOut(t(s, dir, "documents"))
      .select(col("doc_id"), col("text"))
    val tk = graft.text.TextAnalysis.tokens(col("text"))
    val planted = docs.filter(col("doc_id") % 10 === 0).select(
      (col("doc_id") + 30000000000L).as("doc_id"),
      array_join(slice(tk, 1, 15), " ").as("text"))
    graft.dedup.Dedup.containmentPairs(docs.unionByName(planted),
      "doc_id", "text", k = 3, threshold = 0.9)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Shared DuckDB CTE chain mirroring the capped pair-candidate engine
    * (`Dedup.overlapTable`): toks→sh→eligible→shc→sizes→inter over
    * `srcRel`. Single source of truth for the q68 and q71 mirrors, so
    * tokenization, the df cap, and the short-doc degenerate rule can
    * never diverge between them. */
  private[ops] def cappedPairCtes(srcRel: String): String =
    raw"""toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM $srcRel
      |), sh AS (
      |  SELECT DISTINCT doc_id, sh FROM (
      |    SELECT doc_id, unnest(
      |      CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |           ELSE list_transform(generate_series(0, len(t) - 3),
      |                               i -> array_to_string(list_slice(t, i + 1, i + 3), ' '))
      |      END) AS sh
      |    FROM toks)
      |), eligible AS (
      |  SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= ${graft.dedup.Dedup.DefaultNearDupMaxDf}
      |), shc AS (
      |  SELECT s.doc_id, s.sh FROM sh s JOIN eligible e USING (sh)
      |), sizes AS (
      |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      |  FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)""".stripMargin

  val q68Sql: String =
    raw"""WITH base AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 30000000000 AS doc_id,
      |    array_to_string(list_slice(regexp_split_to_array(trim(lower(text)), '\s+'), 1, 15), ' ') AS text
      |  FROM documents WHERE doc_id % 10 = 0
      |), """.stripMargin + cappedPairCtes("base") +
    raw"""
      |SELECT doc_a, doc_b, n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
      |  CAST(n_common AS DOUBLE) / CAST(sa.n_sh AS DOUBLE) AS contain_a,
      |  CAST(n_common AS DOUBLE) / CAST(sb.n_sh AS DOUBLE) AS contain_b
      |FROM inter
      |JOIN sizes sa ON doc_a = sa.doc_id
      |JOIN sizes sb ON doc_b = sb.doc_id
      |WHERE greatest(CAST(n_common AS DOUBLE) / CAST(sa.n_sh AS DOUBLE),
      |               CAST(n_common AS DOUBLE) / CAST(sb.n_sh AS DOUBLE)) >= 0.9
      |ORDER BY doc_a, doc_b""".stripMargin

  // --- deterministic stratified exact-k sample (q69) ----------------------

  /** q69: exact-k-per-stratum sample ([[graft.pipeline.Packing
    * .stratifiedSample]] — smallest q51 portable-hash bucket wins, id
    * tie-break), stratified by language. The eval-set construction
    * primitive: same rows on any engine/run, exactly 5 per language. */
  def q69StratifiedSample(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Packing.stratifiedSample(
      t(s, dir, "documents"), "doc_id", "lang", k = 5)
      .select(col("lang"), col("sample_rank"), col("doc_id"), col("source"))
      .orderBy(col("lang"), col("sample_rank"))

  val q69Sql: String =
    """WITH b AS (
      |  SELECT doc_id, lang, source,
      |    (((((doc_id % 4294967296) // 65536) * 2654435761) % 65536) * 65536
      |      + ((doc_id % 4294967296) % 65536) * 2654435761) % 4294967296 AS bucket
      |  FROM documents
      |), ranked AS (
      |  SELECT lang, doc_id, source,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY bucket, doc_id) AS sample_rank
      |  FROM b
      |)
      |SELECT lang, sample_rank, doc_id, source FROM ranked
      |WHERE sample_rank <= 5 ORDER BY lang, sample_rank""".stripMargin

  // --- fixed-width numeric histogram (q70) --------------------------------

  /** q70: document-length distribution ([[graft.analyze.Analyze
    * .histogram]], width 50 over n_chars) — the profiling companion to
    * q34's percentiles: one partial-agg groupBy on the bucket id plus a
    * window over the driver-small bucket table for shares. */
  def q70Histogram(s: SparkSession, dir: String): DataFrame =
    graft.analyze.Analyze.histogram(
      Relational.fanOut(t(s, dir, "documents")), "n_chars", width = 50L)
      .orderBy(col("bucket"))

  val q70Sql: String =
    """WITH h AS (
      |  SELECT CAST(floor(CAST(n_chars AS DOUBLE) / 50.0) AS BIGINT) AS bucket,
      |    COUNT(*) AS n, MIN(n_chars) AS min_v, MAX(n_chars) AS max_v
      |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
      |)
      |SELECT bucket, bucket * 50 AS lo, n, min_v, max_v,
      |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) AS share
      |FROM h ORDER BY bucket""".stripMargin

  // --- cross-source duplication matrix (q71) ------------------------------

  /** q71: corpus-governance view of near-duplication — the q19/q60 pair
    * graph (production df-capped path, cap mirrored) rolled up to SOURCE
    * pairs: which corpora mirror each other, and how hard. The matrix is
    * what a data-mixing decision (q62 rates) consumes when two sources
    * turn out to be substantially the same crawl. */
  def q71SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = graft.dedup.Dedup.nearDupPairs(
      Relational.fanOut(docs), "doc_id", "text", k = 3, threshold = 0.5)
    val srcOf = docs.select(col("doc_id"), col("source"))
    pairs
      .join(srcOf.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("source", "src_a"), Seq("doc_a"))
      .join(srcOf.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("source", "src_b"), Seq("doc_b"))
      .groupBy(least(col("src_a"), col("src_b")).as("source_x"),
        greatest(col("src_a"), col("src_b")).as("source_y"))
      .agg(count(lit(1)).as("n_pairs"), max(col("jaccard")).as("max_jaccard"))
      .orderBy(col("source_x"), col("source_y"))
  }

  val q71Sql: String =
    "WITH " + cappedPairCtes("documents") +
    raw""", pairs AS (
      |  SELECT doc_a, doc_b,
      |    CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) AS jaccard
      |  FROM inter
      |  JOIN sizes sa ON doc_a = sa.doc_id
      |  JOIN sizes sb ON doc_b = sb.doc_id
      |  WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5
      |)
      |SELECT least(da.source, db.source) AS source_x,
      |  greatest(da.source, db.source) AS source_y,
      |  COUNT(*) AS n_pairs, MAX(jaccard) AS max_jaccard
      |FROM pairs
      |JOIN documents da ON pairs.doc_a = da.doc_id
      |JOIN documents db ON pairs.doc_b = db.doc_id
      |GROUP BY 1, 2 ORDER BY source_x, source_y""".stripMargin
}
