package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Relational.t

/** Round-9 batch 2: retrieval scoring (q91 BM25), Unicode normalization
  * (q92), slowly-changing-dimension history (q93 SCD2), multi-dimensional
  * z-order layout profiling (q94), and character-diversity quality
  * scoring (q95) — all with full DuckDB oracles.
  *
  * Shared discipline: every DOUBLE in an oracle-compared column is
  * produced by a SMALL, EXPLICIT tree of IEEE ops over exact integers
  * (single divisions / one multiply), written identically in the Spark
  * plan and the SQL mirror, so results are bit-equal with no tolerance. */
object ScaleOps6 {

  // --- BM25 retrieval scoring (q91) ---------------------------------------

  private val q91Terms = Seq("spark", "join", "window", "scan")

  /** q91: BM25 relevance of every document against a fixed query-term
    * set, top-5 docs per term — the retrieval-side companion to q65's
    * TF-IDF (a curation pipeline scores corpus docs against probe
    * queries for targeted sampling / decontamination-adjacent auditing).
    *
    * Law (k1 = 6/5, b = 3/4, log-free): classic BM25 replaces
    * ln((N−df+.5)/(df+.5)+1) with the raw odds ratio (2N−2df+1)/(2df+1)
    * — the same ordering (ln is monotone), but exactly representable:
    * both factors are single IEEE divisions of exact int64s, and the
    * tf saturation term (k1+1)·tf / (tf + k1·(1−b+b·dl/avgdl)) is
    * cleared of fractions by multiplying through by 10·Σdl:
    * 22·tf·Σdl / (10·Σdl·tf + 3·Σdl + 9·dl·N). Two divisions and one
    * multiply, identical trees in both engines ⇒ bit-equal scores.
    *
    * Scale shape (pinned at 2 hash exchanges): tokenization + dl are
    * scan-stage maps; the only corpus shuffle is the (doc,term) tf
    * groupBy AFTER filtering to the query terms (candidate rows ≪
    * corpus). df is NOT a separate aggregate-and-join: it is a
    * whole-partition window count over the SAME term partitioning the
    * ranking window needs, so one term exchange serves df, scoring and
    * top-5. The 1-row corpus stats broadcast. No all-token exchange. */
  def q91Bm25(s: SparkSession, dir: String): DataFrame = {
    val toks = Relational.fanOut(t(s, dir, "documents"))
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("t"))
      .withColumn("dl", size(col("t")).cast("long"))
    val stats = toks.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sumdl"))
    val tf = toks
      .select(col("doc_id"), col("dl"), explode(col("t")).as("term"))
      .filter(col("term").isInCollection(q91Terms))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val wTerm = Window.partitionBy(col("term"))
    val w = Window.partitionBy(col("term")).orderBy(col("score").desc, col("doc_id"))
    tf.crossJoin(broadcast(stats))
      .withColumn("df", count(lit(1)).over(wTerm))
      .withColumn("idf_part",
        (lit(2L) * col("n_docs") - lit(2L) * col("df") + lit(1L)).cast("double") /
          (lit(2L) * col("df") + lit(1L)).cast("double"))
      .withColumn("tf_part",
        (lit(22L) * col("tf") * col("sumdl")).cast("double") /
          (lit(10L) * col("sumdl") * col("tf") + lit(3L) * col("sumdl") +
            lit(9L) * col("dl") * col("n_docs")).cast("double"))
      .withColumn("score", col("idf_part") * col("tf_part"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("term"), col("rank"), col("doc_id"), col("tf"), col("df"),
        col("dl"), col("score"))
      .orderBy(col("term"), col("rank"))
  }

  /** Mirror: identical tokenization (q65's), identical integer clearing,
    * identical (a/b)·(c/d) double tree. */
  val q91Sql: String =
    raw"""WITH dls AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t,
      |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS dl
      |  FROM documents
      |), stats AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sumdl FROM dls
      |), tf AS (
      |  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, dl, unnest(t) AS term FROM dls)
      |  WHERE term IN ('spark', 'join', 'window', 'scan')
      |  GROUP BY doc_id, dl, term
      |), withdf AS (
      |  SELECT doc_id, term, tf, dl, n_docs, sumdl,
      |    CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
      |  FROM tf CROSS JOIN stats
      |), scored AS (
      |  SELECT doc_id, term, tf, df, dl,
      |    (CAST(2 * n_docs - 2 * df + 1 AS DOUBLE) / CAST(2 * df + 1 AS DOUBLE)) *
      |    (CAST(22 * tf * sumdl AS DOUBLE) /
      |     CAST(10 * sumdl * tf + 3 * sumdl + 9 * dl * n_docs AS DOUBLE)) AS score
      |  FROM withdf
      |)
      |SELECT term, ROW_NUMBER() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rank,
      |  doc_id, tf, df, dl, score
      |FROM scored
      |QUALIFY rank <= 5
      |ORDER BY term, rank""".stripMargin

  // --- Unicode normalization (q92) ----------------------------------------

  private def br = org.apache.spark.sql.GraftSqlBridge
  private def nfcCol(c: Column): Column =
    br.column(graft.functions.NfcNormalize(br.expression(c)))
  private def nfdCol(c: Column): Column =
    br.column(graft.functions.NfdNormalize(br.expression(c)))
  private def stripAccentsCol(c: Column): Column =
    br.column(graft.functions.StripAccents(br.expression(c)))

  /** q92: Unicode normalization as a scan-stage kernel. The corpus is
    * ASCII, so the query first derives an accented variant
    * deterministically (vowels → composed Latin-1 accents via
    * `translate`, same builtin in both engines), then exercises the
    * kernels where every output is independently re-derivable:
    *   - nfd_len: NFD decomposition length (each accent becomes base +
    *     combining mark ⇒ length grows by exactly the vowel count; the
    *     oracle BUILDS the decomposed string with replace+chr(769) and
    *     counts it — Java's Normalizer and the replace chain must agree
    *     codepoint-for-codepoint);
    *   - recomposed: NFC(NFD(acc)) round-trip (oracle: utf8proc
    *     nfc_normalize over its replace-chain NFD);
    *   - stripped: accent strip back to the ASCII base (oracle:
    *     utf8proc strip_accents).
    * All three kernels are pure per-row codegen maps — at 100 TB this is
    * exactly a scan stage, no exchange (plan-pinned). */
  def q92Normalize(s: SparkSession, dir: String): DataFrame = {
    val acc = translate(substring(trim(lower(col("text"))), 1, 40), "aeiou", "áéíóú")
    Relational.fanOut(t(s, dir, "documents"))
      .select(col("doc_id"), acc.as("acc"))
      .select(
        col("doc_id"),
        col("acc"),
        length(nfdCol(col("acc"))).cast("long").as("nfd_len"),
        nfcCol(nfdCol(col("acc"))).as("recomposed"),
        stripAccentsCol(col("acc")).as("stripped"))
      .orderBy(col("doc_id"))
  }

  val q92Sql: String =
    """WITH basec AS (
      |  SELECT doc_id,
      |    translate(substring(trim(lower(text)), 1, 40), 'aeiou', 'áéíóú') AS acc
      |  FROM documents
      |), dec AS (
      |  SELECT doc_id, acc,
      |    replace(replace(replace(replace(replace(acc,
      |      'á', 'a' || chr(769)), 'é', 'e' || chr(769)), 'í', 'i' || chr(769)),
      |      'ó', 'o' || chr(769)), 'ú', 'u' || chr(769)) AS nfd
      |  FROM basec
      |)
      |SELECT doc_id, acc, CAST(length(nfd) AS BIGINT) AS nfd_len,
      |  nfc_normalize(nfd) AS recomposed, strip_accents(acc) AS stripped
      |FROM dec ORDER BY doc_id""".stripMargin

  // --- SCD Type-2 history build (q93) -------------------------------------

  /** q93: slowly-changing-dimension (type 2) history from an event-keyed
    * fact — the temporal generalization of the reference's upsert
    * (file-to-sql-loader.py:1158 holds only the LATEST row per key; a
    * warehouse dimension needs every version with validity intervals).
    * Business key = o_custkey, tracked attribute = o_orderpriority,
    * effective time = o_orderdate.
    *
    * Three window passes, ALL served by ONE exchange on the business key
    * (pinned): the input is explicitly repartitioned on custkey, which
    * satisfies the clustered distribution of the FINER intra-day window
    * too (equal (custkey, day) pairs are co-located when custkey is), so
    * Catalyst adds only local sorts between passes:
    *   1. intra-day last-write-wins (row_number by o_orderkey desc per
    *      (custkey, day)) — the deterministic tiebreak upsert also uses;
    *   2. change detection: lag(attr) per custkey by day, keep rows
    *      where the attribute actually changed (or first observation);
    *   3. interval assembly: version = row_number, valid_to =
    *      lead(valid_from), open interval ⇒ is_current (2 and 3 share
    *      one Window operator — same partition/order spec).
    * At 100 TB the whole history builds with ONE shuffle on the business
    * key — no self-joins, no driver state. */
  def q93Scd2(s: SparkSession, dir: String): DataFrame = {
    val o = Relational.fanOut(t(s, dir, "orders"))
    val dayW = Window.partitionBy(col("custkey"), col("eff_date"))
      .orderBy(col("o_orderkey").desc)
    val seqW = Window.partitionBy(col("custkey")).orderBy(col("eff_date"))
    o.select(
        col("o_custkey").as("custkey"),
        col("o_orderdate").as("eff_date"),
        col("o_orderkey"),
        col("o_orderpriority").as("prio"))
      .repartition(col("custkey"))
      .withColumn("rn", row_number().over(dayW))
      .filter(col("rn") === 1)
      .withColumn("prev", lag(col("prio"), 1).over(seqW))
      .filter(col("prev").isNull || col("prev") =!= col("prio"))
      .withColumn("version", row_number().over(seqW).cast("long"))
      .withColumn("valid_from", col("eff_date"))
      .withColumn("valid_to", lead(col("eff_date"), 1).over(seqW))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col("custkey"), col("version"), col("prio"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy(col("custkey"), col("version"))
  }

  /** Mirror: same three windows. The change-detect window and the
    * interval window both re-rank AFTER the previous filter, exactly as
    * the Spark chain does (row_number over the filtered set). */
  val q93Sql: String =
    """WITH daily AS (
      |  SELECT o_custkey AS custkey, o_orderdate AS eff_date,
      |    o_orderpriority AS prio,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
      |                       ORDER BY o_orderkey DESC) AS rn
      |  FROM orders
      |), lastofday AS (
      |  SELECT custkey, eff_date, prio FROM daily WHERE rn = 1
      |), changes AS (
      |  SELECT custkey, eff_date, prio,
      |    LAG(prio) OVER (PARTITION BY custkey ORDER BY eff_date) AS prev
      |  FROM lastofday
      |), hist AS (
      |  SELECT custkey, eff_date, prio FROM changes
      |  WHERE prev IS NULL OR prev <> prio
      |)
      |SELECT custkey,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY custkey ORDER BY eff_date) AS BIGINT) AS version,
      |  prio, eff_date AS valid_from,
      |  LEAD(eff_date) OVER (PARTITION BY custkey ORDER BY eff_date) AS valid_to,
      |  (LEAD(eff_date) OVER (PARTITION BY custkey ORDER BY eff_date) IS NULL) AS is_current
      |FROM hist ORDER BY custkey, version""".stripMargin

  // --- z-order layout profiling (q94) -------------------------------------

  /** 8-bit → 16-bit Morton spread: classic mask-shift doubling, three
    * shift/or/and steps — the same integer ops (`<<`, `|`, `&`) exist
    * with identical semantics in DuckDB, so the oracle re-derives every
    * z-value arithmetically. */
  private def spreadBits(c: Column): Column = {
    val a = (c.bitwiseOR(shiftleft(c, 4))).bitwiseAND(lit(0x0F0FL))
    val b = (a.bitwiseOR(shiftleft(a, 2))).bitwiseAND(lit(0x3333L))
    b.bitwiseOR(shiftleft(b, 1)).bitwiseAND(lit(0x5555L))
  }

  /** q94: z-order (Morton) multi-dimensional clustering profile. A 100 TB
    * table queried by BOTH part and supplier cannot be range-partitioned
    * to serve either predicate from a sorted layout alone; interleaving
    * the key bits gives ONE linear order in which both dimensions stay
    * locally bounded, so range-partitioned files carry tight min/max on
    * EVERY interleaved column and the scan planner skips files for
    * predicates on any of them (the layout trick behind Delta/Iceberg
    * OPTIMIZE ZORDER — here as a first-class, oracle-checked kernel).
    *
    * The query computes z = interleave(partkey mod 256, suppkey mod 256)
    * per row, buckets the z-line into 64-wide file surrogates, and emits
    * each bucket's row count + per-dimension min/max extents — the
    * data-skipping index a writer would persist. The law that makes
    * z-order work is VISIBLE in the result: every bucket's x-extent and
    * y-extent are ≤ 8-wide (√64) windows, while a 1-D sort would leave
    * the second dimension spanning the full 0..255 range. */
  def q94Zorder(s: SparkSession, dir: String): DataFrame = {
    Relational.fanOut(t(s, dir, "lineitem"))
      .select((col("l_partkey") % 256).as("x"), (col("l_suppkey") % 256).as("y"))
      .withColumn("z", spreadBits(col("x")).bitwiseOR(shiftleft(spreadBits(col("y")), 1)))
      .withColumn("zbucket", expr("z div 64"))
      .groupBy(col("zbucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .orderBy(col("zbucket"))
  }

  val q94Sql: String =
    """WITH xy AS (
      |  SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y FROM lineitem
      |), sx AS (
      |  SELECT x, y,
      |    ((x | (x << 4)) & 3855) AS xa, ((y | (y << 4)) & 3855) AS ya
      |  FROM xy
      |), sb AS (
      |  SELECT x, y,
      |    ((xa | (xa << 2)) & 13107) AS xb, ((ya | (ya << 2)) & 13107) AS yb
      |  FROM sx
      |), sz AS (
      |  SELECT x, y,
      |    ((xb | (xb << 1)) & 21845) AS xs, ((yb | (yb << 1)) & 21845) AS ys
      |  FROM sb
      |), z AS (
      |  SELECT x, y, (xs | (ys << 1)) // 64 AS zbucket FROM sz
      |)
      |SELECT zbucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
      |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin

  // --- character-diversity quality score (q95) ----------------------------

  private def charStatsCol(c: Column): Column =
    br.column(graft.functions.CharStats(br.expression(c)))

  /** q95: per-document character-diversity quality signal. Encoder junk,
    * binary spill and padded boilerplate all show up as LOW codepoint
    * diversity; natural prose sits in a band. The signal is the Gini
    * impurity of the codepoint distribution, 1 − Σpᵢ², computed from the
    * one-pass [total, distinct, Σcount²] kernel (CharStats — scan-stage
    * codegen, no explode) as (total² − Σc²)/total²: a numerator and
    * denominator of exact int64s and ONE IEEE division ⇒ bit-equal with
    * the oracle, which re-derives the same integers the expensive way
    * (unnest every character, GROUP BY, sum squares — affordable for
    * DuckDB at oracle scale, never done by the engine).
    *
    * 100 TB shape: pure map over the corpus — the entropy-flavored
    * quality gates (q17 length/punct ratios, q57 repetition, q89 LM
    * surprisal, this) all fuse into ONE whole-stage-codegen scan. */
  def q95CharDiversity(s: SparkSession, dir: String): DataFrame = {
    Relational.fanOut(t(s, dir, "documents"))
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), charStatsCol(col("text")).as("cs"))
      .select(
        col("doc_id"),
        element_at(col("cs"), 1).as("total_chars"),
        element_at(col("cs"), 2).as("distinct_chars"),
        element_at(col("cs"), 3).as("sumsq"))
      .withColumn("gini",
        (col("total_chars") * col("total_chars") - col("sumsq")).cast("double") /
          (col("total_chars") * col("total_chars")).cast("double"))
      .select(col("doc_id"), col("total_chars"), col("distinct_chars"), col("gini"))
      .orderBy(col("doc_id"))
  }

  val q95Sql: String =
    """WITH chars AS (
      |  SELECT doc_id, unnest(string_split(text, '')) AS ch
      |  FROM documents WHERE length(text) > 0
      |), cnt AS (
      |  SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS n FROM chars GROUP BY doc_id, ch
      |), agg AS (
      |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS total_chars,
      |    CAST(COUNT(*) AS BIGINT) AS distinct_chars,
      |    CAST(SUM(n * n) AS BIGINT) AS sumsq
      |  FROM cnt GROUP BY doc_id
      |)
      |SELECT doc_id, total_chars, distinct_chars,
      |  CAST(total_chars * total_chars - sumsq AS DOUBLE) /
      |    CAST(total_chars * total_chars AS DOUBLE) AS gini
      |FROM agg ORDER BY doc_id""".stripMargin
}
