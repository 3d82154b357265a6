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

  /** DuckDB mirror of q60: the q19 shingle/Jaccard arithmetic with the
    * df cap applied to CANDIDATE GENERATION only (sizes stay uncapped,
    * matching jaccardPairsCapped), then transitive closure via a
    * recursive CTE — label of a node = MIN over all reachable ids. */
  val q60Sql: String =
    raw"""WITH RECURSIVE toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, sh FROM (
      |    SELECT doc_id, unnest(
      |      CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |           ELSE list_transform(generate_series(0, len(t) - 3),
      |                               i -> array_to_string(list_slice(t, i + 1, i + 3), ' '))
      |      END) AS sh
      |    FROM toks)
      |), eligible AS (
      |  SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= ${Dedup.DefaultNearDupMaxDf}
      |), shc AS (
      |  SELECT s.doc_id, s.sh FROM sh s JOIN eligible e USING (sh)
      |), sizes AS (
      |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      |  FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), pairs AS (
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
      |)
      |SELECT node AS doc_id, MIN(lab) AS cluster_id
      |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin
}
