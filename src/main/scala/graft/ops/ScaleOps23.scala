package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Relational.t

/** Round-12 batch 23: corpus-layout planning readouts — deterministic
  * output-shard balance (q169), the token-frequency spectrum behind
  * vocabulary-size decisions (q170), and the pairwise source-overlap
  * matrix that tells a mixing plan which corpora are secretly the same
  * data (q171). */
object ScaleOps23 {

  // --- deterministic shard balance (q169) ------------------------------------

  /** Output shard count for q169. */
  val Q169Shards = 64L

  /** q169: DETERMINISTIC SHARD BALANCE — training output is written in
    * fixed shards (files/tasks consume them in order), and the shard
    * assignment must be engine/partitioning/run-independent, so it
    * rides the q51 portable multiplicative hash
    * ([[graft.ops.Relational3.splitBucket]] mod [[Q169Shards]]), NOT
    * `hash()` or a round-robin. Per shard: docs, whitespace tokens,
    * corpus share at 10⁻⁶ fixed point, and the signed skew vs the ideal
    * 1/shards slice in ppm — the readout that says whether hash-sharding
    * this corpus produces balanced training files. Token products ride
    * DECIMAL(38): n_tokens·shards·10⁶ passes int64 at ~10¹¹ tokens per
    * shard, document-scale at 100 TB.
    *
    * Scale shape: one pure-map shard assignment fused into the scan,
    * ONE partial-agg exchange on the shard id (≤ [[Q169Shards]] groups),
    * a 1-row total broadcast back onto the shard table. */
  def q169ShardBalance(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.fanOut(t(s, dir, "documents"))
      .select(col("doc_id").cast("long").as("doc_id"),
        size(filter(graft.text.TextAnalysis.tokens(col("text")),
          tk => length(tk) >= 1)).cast("long").as("n"))
      .withColumn("shard",
        pmod(Relational3.splitBucket(col("doc_id")), lit(Q169Shards)))
    val per = docs.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
    val totals = per.agg(sum(col("n_tokens")).as("tt"))
    per.crossJoin(broadcast(totals))
      .withColumn("share_fp", expr(
        "CAST((CAST(n_tokens AS DECIMAL(38,0)) * 1000000) div tt AS BIGINT)"))
      .withColumn("skew_ppm", expr(
        s"CAST((CAST(n_tokens AS DECIMAL(38,0)) * ${Q169Shards} * 1000000) div tt" +
          " AS BIGINT) - 1000000"))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        col("share_fp"), col("skew_ppm"))
      .orderBy(col("shard"))
  }

  /** Mirror: the q51 multiplicative-hash restatement mod the shard
    * count, same DECIMAL share/skew arithmetic. */
  val q169Sql: String =
    raw"""WITH docs AS (
      |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        t -> len(t) >= 1)) AS n
      |  FROM documents
      |), sharded AS (
      |  SELECT n,
      |    (((((doc_id % 4294967296) // 65536) * 2654435761) % 65536) * 65536
      |      + ((doc_id % 4294967296) % 65536) * 2654435761) % 4294967296
      |      % ${Q169Shards} AS shard
      |  FROM docs
      |), per AS (
      |  SELECT shard, COUNT(*) AS n_docs, SUM(n) AS n_tokens
      |  FROM sharded GROUP BY shard
      |), tot AS (SELECT SUM(n_tokens) AS tt FROM per)
      |SELECT CAST(shard AS BIGINT) AS shard,
      |  CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST((CAST(n_tokens AS HUGEINT) * 1000000) // tt AS BIGINT) AS share_fp,
      |  CAST((CAST(n_tokens AS HUGEINT) * ${Q169Shards} * 1000000) // tt
      |    AS BIGINT) - 1000000 AS skew_ppm
      |FROM per, tot ORDER BY shard""".stripMargin

  // --- token-frequency spectrum (q170) ----------------------------------------

  /** q170: TOKEN-FREQUENCY SPECTRUM — the counts-of-counts histogram at
    * power-of-two frequency buckets (the Zipf readout behind
    * vocabulary-size and min-frequency decisions: how many types live
    * at each frequency scale, and how much corpus MASS they carry).
    * bucket = floor(log2(c)) computed exactly as `length(bin(c)) - 1`
    * (the q165 discipline — no float log at bucket boundaries). Per
    * bucket: type count, occurrence mass, type share of the vocabulary
    * and mass share of the corpus at 10⁻⁶ fixed point (mass·10⁶ rides
    * DECIMAL(38), past int64 at a 10¹³-token corpus).
    *
    * Scale shape: one token-sized partial agg to the vocab table, one
    * ≤64-row bucket rollup, a 1-row totals broadcast. */
  def q170FreqSpectrum(s: SparkSession, dir: String): DataFrame = {
    val uni = Relational.fanOut(t(s, dir, "documents"))
      .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) >= 1)
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val buckets = uni
      .withColumn("bucket", (length(bin(col("c"))) - 1).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_types"), sum(col("c")).as("n_occurrences"))
    val totals = buckets.agg(sum(col("n_types")).as("vv"),
      sum(col("n_occurrences")).as("tt"))
    buckets.crossJoin(broadcast(totals))
      .withColumn("type_share_fp", expr(
        "CAST(n_types * 1000000 div vv AS BIGINT)"))
      .withColumn("mass_share_fp", expr(
        "CAST((CAST(n_occurrences AS DECIMAL(38,0)) * 1000000) div tt AS BIGINT)"))
      .select(col("bucket"), col("n_types"), col("n_occurrences"),
        col("type_share_fp"), col("mass_share_fp"))
      .orderBy(col("bucket"))
  }

  /** Mirror: same exact-integer bucket and share arithmetic over the
    * unigram table. */
  val q170Sql: String =
    raw"""WITH uni AS (
      |  SELECT tok, COUNT(*) AS c FROM (
      |    SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      |    FROM documents) WHERE len(tok) >= 1
      |  GROUP BY tok
      |), buckets AS (
      |  SELECT length(bin(c)) - 1 AS bucket, COUNT(*) AS n_types,
      |    SUM(c) AS n_occurrences
      |  FROM uni GROUP BY 1
      |), tot AS (
      |  SELECT SUM(n_types) AS vv, SUM(n_occurrences) AS tt FROM buckets
      |)
      |SELECT CAST(bucket AS BIGINT) AS bucket,
      |  CAST(n_types AS BIGINT) AS n_types,
      |  CAST(n_occurrences AS BIGINT) AS n_occurrences,
      |  CAST(n_types * 1000000 // vv AS BIGINT) AS type_share_fp,
      |  CAST((CAST(n_occurrences AS HUGEINT) * 1000000) // tt AS BIGINT)
      |    AS mass_share_fp
      |FROM buckets, tot ORDER BY bucket""".stripMargin

  // --- pairwise source-overlap matrix (q171) ----------------------------------

  /** How many top source pairs q171 surfaces. */
  val Q171TopK = 20

  /** q171: SOURCE-OVERLAP MATRIX — which corpora secretly share content:
    * distinct 8-token sliding-shingle types per source (the q85/q157
    * FNV-1a kernel — shingle STRINGS never leave the codegen kernel),
    * pairwise shared-type counts via a self-equi-join on the 8-byte
    * hash, and an overlap coefficient shared/min(|A|,|B|) at 10⁻⁶ fixed
    * point — the signal a mixing plan reads before up-weighting two
    * "different" sources that are the same crawl. Top [[Q171TopK]]
    * pairs by (shared desc, source_a, source_b).
    *
    * Scale shape: one distinct agg to the (source, hash) table; the
    * self-join is equi on the hash with per-hash fanout bounded by
    * sources² (a SOURCE-level matrix — sources are O(10²), never
    * corpus-sized); per-source totals broadcast; distributed
    * TakeOrdered. */
  def q171SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val pairs = docs
      .select(col("source"),
        explode(column(graft.functions.SlidingShingleHashes(
          expression(graft.text.TextAnalysis.tokens(col("text"))), 8))).as("h"))
      .distinct()
    val perSrc = pairs.groupBy(col("source")).agg(count(lit(1)).as("n_types"))
    val shared = pairs.as("a")
      .join(pairs.as("b"), col("a.h") === col("b.h")
        && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared_types"))
    shared
      .join(broadcast(perSrc.select(col("source").as("source_a"),
        col("n_types").as("na"))), Seq("source_a"))
      .join(broadcast(perSrc.select(col("source").as("source_b"),
        col("n_types").as("nb"))), Seq("source_b"))
      .withColumn("overlap_fp", expr(
        "CAST(shared_types * 1000000 div least(na, nb) AS BIGINT)"))
      .orderBy(col("shared_types").desc, col("source_a"), col("source_b"))
      .limit(Q171TopK)
      .withColumn("rank", row_number().over(Window.orderBy(
        col("shared_types").desc, col("source_a"), col("source_b"))))
      .select(col("rank"), col("source_a"), col("source_b"),
        col("shared_types"), col("na"), col("nb"), col("overlap_fp"))
      .orderBy(col("rank"))
  }

  /** Mirror: the q157 sliding-window FNV chain per source, the same
    * self-join and overlap arithmetic. */
  val q171Sql: String = {
    val fnvScalar =
      """list_reduce(
        |      list_prepend(14695981039346656037::HUGEINT,
        |        [ord(substr(s, i, 1))::HUGEINT FOR i IN range(1, length(s) + 1)]),
        |      (acc, b) -> (xor(acc, b) * 1099511628211) % 18446744073709551616::HUGEINT)""".stripMargin
    raw"""WITH toks AS (
      |  SELECT source, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents
      |), pos AS (
      |  SELECT source, unnest(range(0, greatest(len(t) - 7, 0))) AS p, t FROM toks
      |), ph AS (
      |  SELECT DISTINCT source, $fnvScalar AS hv
      |  FROM (SELECT source, p, array_to_string(t[p + 1 : p + 8], ' ') AS s FROM pos)
      |), per_src AS (
      |  SELECT source, COUNT(*) AS n_types FROM ph GROUP BY source
      |), shared AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |    COUNT(*) AS shared_types
      |  FROM ph a JOIN ph b ON a.hv = b.hv AND a.source < b.source
      |  GROUP BY 1, 2
      |), topk AS (
      |  SELECT s.source_a, s.source_b, s.shared_types,
      |    pa.n_types AS na, pb.n_types AS nb,
      |    ROW_NUMBER() OVER (ORDER BY s.shared_types DESC, s.source_a,
      |      s.source_b) AS rank
      |  FROM shared s
      |  JOIN per_src pa ON s.source_a = pa.source
      |  JOIN per_src pb ON s.source_b = pb.source
      |)
      |SELECT CAST(rank AS INT) AS rank, source_a, source_b,
      |  CAST(shared_types AS BIGINT) AS shared_types,
      |  CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
      |  CAST(shared_types * 1000000 // least(na, nb) AS BIGINT) AS overlap_fp
      |FROM topk WHERE rank <= ${Q171TopK} ORDER BY rank""".stripMargin
  }
}
