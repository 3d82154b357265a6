package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Relational.t

/** Round-9 batch 11: inverted-index weighted document similarity with a
  * df-cap scale guard (q133), week-over-week volume growth (q134),
  * join-key skew diagnostics (q135), and a deterministic ±1
  * Johnson–Lindenstrauss projection of the embedding corpus (q136).
  *
  * Cross-engine exactness discipline (ScaleOps7–11 rules): integer laws
  * for every ranking/selection; the only doubles are single divisions of
  * exact integers (q134/q135) and q136's in-order signed sums — the same
  * float→double-then-multiply accumulation law the q20/q24 oracles
  * already prove against list_inner_product.
  */
object ScaleOps12 {

  // --- inverted-index weighted similarity (q133) ---------------------------

  /** q133: top-25 most similar document pairs by shared-5-gram WEIGHT —
    * Σ tf_a·tf_b over shared terms, the unnormalized sparse dot product
    * computed the way a search engine actually computes it: postings
    * partitioned by term, partial products merged per pair. The q19/q68
    * siblings rank by set overlap; this is the tf-weighted variant that
    * separates "shares one template 50 times" from "shares 50 distinct
    * phrases once".
    *
    * Scale guard: terms with df·50 > N (present in >2 % of the corpus)
    * are dropped BEFORE the posting self-join — the df-cap discipline of
    * the dedup engine (a template 5-gram shared by millions of documents
    * would otherwise make one reducer quadratic). 5-gram terms keep
    * natural df low (vocab⁵ ≫ corpus), so the cap only fires on true
    * templates; the drop is a documented precision trade, not a bug.
    *
    * Scale shape: tokenize+window per doc (doc-partitioned), ONE term
    * shuffle for tf, one term-partitioned df count reusing the same
    * partitioning, the capped posting self-join shuffles on term, and
    * the pair agg map-side combines. No all-pairs stage exists. */
  def q133SparseSim(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.fanOut(t(s, dir, "documents"))
    // 5-grams assembled per document from the materialized token ARRAY
    // (the ScaleOps28.bigramsOf idiom) — a pure map over the scan. The
    // former posexplode + doc-partitioned window with a lead() chain
    // shuffled and sorted EVERY token, and the window compute re-ran in
    // each consumer branch on top of the reused exchange (8 Window nodes
    // in the r18 before-plan). Same term multiset per document: window
    // rows with t4 non-null are exactly positions 1..n-4, which is
    // exactly the sequence below; docs under 5 tokens emit nothing on
    // both forms, so the posting table (and the oracle row set) is
    // bit-identical.
    val grams = docs
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("ts"))
      .filter(size(col("ts")) >= 5)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ts) - 4), " +
          "i -> concat_ws('_', element_at(ts, i), element_at(ts, i + 1), " +
          "element_at(ts, i + 2), element_at(ts, i + 3), element_at(ts, i + 4)))"))
        .as("term"))
    val postings = grams.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val capped = postings.join(df, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") * 50 <= col("n_docs"))
      .select(col("term"), col("doc_id"), col("tf"))
    val a = capped.select(col("term"), col("doc_id").as("p1"), col("tf").as("tf1"))
    val b = capped.select(col("term"), col("doc_id").as("p2"), col("tf").as("tf2"))
    a.join(b, Seq("term")).filter(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(sum(col("tf1") * col("tf2")).as("w"), count(lit(1)).as("n_shared"))
      .orderBy(col("w").desc, col("p1"), col("p2"))
      .limit(25)
  }

  val q133Sql: String =
    raw"""WITH toks AS (
      |  SELECT doc_id,
      |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok,
      |    unnest(generate_series(1,
      |      len(regexp_split_to_array(trim(lower(text)), '\s+')))) AS pos
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id,
      |    concat_ws('_', tok, lead(tok, 1) OVER w, lead(tok, 2) OVER w,
      |      lead(tok, 3) OVER w, lead(tok, 4) OVER w) AS term,
      |    lead(tok, 4) OVER w AS t4
      |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      |), postings AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM grams
      |  WHERE t4 IS NOT NULL GROUP BY doc_id, term
      |), dfreq AS (
      |  SELECT term, COUNT(*) AS df FROM postings GROUP BY term
      |), n AS (
      |  SELECT COUNT(*) AS n_docs FROM documents
      |), capped AS (
      |  SELECT p.term, p.doc_id, p.tf
      |  FROM postings p JOIN dfreq USING (term) CROSS JOIN n
      |  WHERE df * 50 <= n_docs
      |)
      |SELECT a.doc_id AS p1, b.doc_id AS p2,
      |  CAST(SUM(a.tf * b.tf) AS BIGINT) AS w,
      |  COUNT(*) AS n_shared
      |FROM capped a JOIN capped b ON a.term = b.term AND a.doc_id < b.doc_id
      |GROUP BY a.doc_id, b.doc_id
      |ORDER BY w DESC, p1, p2 LIMIT 25""".stripMargin

  // --- week-over-week growth (q134) ----------------------------------------

  /** q134: week-over-week relative growth of per-type event volume — the
    * trend readout next to q104's anomaly flags and q129's changepoint
    * (those find discontinuities; this is the smooth-trend dashboard
    * number). Weeks are ISO date_trunc buckets (Monday start in both
    * engines); growth = (c − prev)/prev, ONE division of exact integer
    * counts; the first week of each type has no predecessor and is
    * excluded rather than poisoned with a null/∞ convention.
    *
    * Scale shape: one partial-agg groupBy to (type, week) — the only
    * data-sized exchange — then a lag window over |weeks| rows/type. */
  def q134WowGrowth(s: SparkSession, dir: String): DataFrame = {
    val ev = Relational.events(s, dir)
    val weekly = ev.groupBy(col("event_type"),
        date_trunc("week", col("ts")).as("wk"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("wk"))
    weekly
      .withColumn("prev", lag(col("c"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"), col("wk"), col("c"), col("prev"),
        ((col("c").cast("double") - col("prev").cast("double"))
          / col("prev").cast("double")).as("growth"))
      .orderBy(col("event_type"), col("wk"))
  }

  val q134Sql: String =
    """WITH weekly AS (
      |  SELECT event_type, date_trunc('week', ts) AS wk, COUNT(*) AS c
      |  FROM events GROUP BY event_type, date_trunc('week', ts)
      |), lagged AS (
      |  SELECT event_type, wk, c,
      |    lag(c) OVER (PARTITION BY event_type ORDER BY wk) AS prev
      |  FROM weekly
      |)
      |SELECT event_type, wk, CAST(c AS BIGINT) AS c,
      |  CAST(prev AS BIGINT) AS prev,
      |  (CAST(c AS DOUBLE) - CAST(prev AS DOUBLE)) / CAST(prev AS DOUBLE)
      |    AS growth
      |FROM lagged WHERE prev IS NOT NULL
      |ORDER BY event_type, wk""".stripMargin

  // --- join-key skew diagnostics (q135) ------------------------------------

  /** q135: per-join-key skew report over lineitem's three foreign keys —
    * the diagnostic a platform runs BEFORE choosing a join strategy
    * (q28/q29 are the salted cures; this is the instrument that says
    * which keys need them). Per key column: cardinality, total rows, the
    * hottest key and its share, and how many keys are "hot" (count >
    * 2·average, evaluated as the integer cross-product cnt·n_keys >
    * 2·total — no division enters the predicate).
    *
    * Scale shape: stack() explodes 3 key columns in the scan projection
    * (no join), ONE map-side-combined groupBy on (key_col, key_val),
    * then windows over per-column partitions. At 100 TB one would run
    * the three columns as three scans to halve peak shuffle width; the
    * single-pass form keeps the plan one exchange deep. */
  def q135SkewReport(s: SparkSession, dir: String): DataFrame = {
    val li = Relational.fanOut(t(s, dir, "lineitem"))
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val stacked = li.select(expr(
      "stack(3, 'l_orderkey', l_orderkey, 'l_partkey', l_partkey, " +
        "'l_suppkey', l_suppkey) AS (key_col, key_val)"))
    val counts = stacked.groupBy(col("key_col"), col("key_val"))
      .agg(count(lit(1)).as("cnt"))
    val wC = Window.partitionBy(col("key_col"))
    val staged = counts
      .withColumn("n_keys", count(lit(1)).over(wC))
      .withColumn("total", sum(col("cnt")).over(wC))
      .withColumn("rn", row_number().over(wC.orderBy(col("cnt").desc, col("key_val"))))
      .withColumn("is_hot",
        when(col("cnt") * col("n_keys") > lit(2L) * col("total"), 1L).otherwise(0L))
    staged.groupBy(col("key_col"))
      .agg(max(col("n_keys")).as("n_keys"), max(col("total")).as("total"),
        max(when(col("rn") === 1, col("cnt"))).as("max_cnt"),
        max(when(col("rn") === 1, col("key_val"))).as("top_key"),
        sum(col("is_hot")).as("n_hot"))
      .withColumn("top_share",
        col("max_cnt").cast("double") / col("total").cast("double"))
      .select(col("key_col"), col("n_keys"), col("total"), col("max_cnt"),
        col("top_key"), col("top_share"), col("n_hot"))
      .orderBy(col("key_col"))
  }

  val q135Sql: String =
    """WITH stacked AS (
      |  SELECT 'l_orderkey' AS key_col, l_orderkey AS key_val FROM lineitem
      |  UNION ALL
      |  SELECT 'l_partkey', l_partkey FROM lineitem
      |  UNION ALL
      |  SELECT 'l_suppkey', l_suppkey FROM lineitem
      |), counts AS (
      |  SELECT key_col, key_val, COUNT(*) AS cnt
      |  FROM stacked GROUP BY key_col, key_val
      |), staged AS (
      |  SELECT key_col, key_val, cnt,
      |    COUNT(*) OVER (PARTITION BY key_col) AS n_keys,
      |    SUM(cnt) OVER (PARTITION BY key_col) AS total,
      |    ROW_NUMBER() OVER (PARTITION BY key_col
      |      ORDER BY cnt DESC, key_val) AS rn,
      |    CASE WHEN cnt * COUNT(*) OVER (PARTITION BY key_col)
      |           > 2 * SUM(cnt) OVER (PARTITION BY key_col)
      |         THEN 1 ELSE 0 END AS is_hot
      |  FROM counts
      |)
      |SELECT key_col, CAST(MAX(n_keys) AS BIGINT) AS n_keys,
      |  CAST(MAX(total) AS BIGINT) AS total,
      |  CAST(MAX(CASE WHEN rn = 1 THEN cnt END) AS BIGINT) AS max_cnt,
      |  CAST(MAX(CASE WHEN rn = 1 THEN key_val END) AS BIGINT) AS top_key,
      |  CAST(MAX(CASE WHEN rn = 1 THEN cnt END) AS DOUBLE)
      |    / CAST(MAX(total) AS DOUBLE) AS top_share,
      |  CAST(SUM(is_hot) AS BIGINT) AS n_hot
      |FROM staged GROUP BY key_col ORDER BY key_col""".stripMargin

  // --- deterministic JL projection (q136) ----------------------------------

  /** q136: Johnson–Lindenstrauss dimensionality reduction 64→16 with the
    * engine's deterministic ±1 hyperplane family — the SAME memoized
    * xxhash64 sign matrix the LSH bucketer (q24) uses, so the projection
    * is reproducible across executors, runs, and engines with no RNG
    * state. Output: the 16 projected coordinates per vector, each scaled
    * by 1/√16 = 0.25 (an EXACT dyadic multiply). Downstream, these are
    * the compact vectors a first-pass ANN or clustering sweep reads
    * instead of the full 64-dim corpus — 4× less vector I/O.
    *
    * Each coordinate is one in-order float→double signed sum (the
    * q20/q24-proven accumulation law); nothing is engine-ordered.
    *
    * Scale shape: pure map over the corpus — 16 fused codegen dot
    * kernels per row, no exchange before the presentation order-by. */
  def q136JlProject(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{VectorFunctions => V}
    val m = graft.functions.VectorKernels.signMatrix(16, 64)
    val emb = Relational.fanOut(t(s, dir, "embeddings"))
      .select(col("vec_id"), col("embedding"))
    val projected = (0 until 16).foldLeft(emb) { (df, k) =>
      val signs = array(m(k).map(v => lit(v)): _*)
      df.withColumn(s"y$k",
        V.dotFD(col("embedding"), signs) * lit(0.25))
    }
    projected.drop("embedding").orderBy(col("vec_id"))
  }

  /** Mirror: the 16 sign rows inlined as DOUBLE[] literals (the q24
    * sign-matrix technique); 0.25 is dyadic so the scale costs nothing. */
  val q136Sql: String = {
    val m = graft.functions.VectorKernels.signMatrix(16, 64)
    def arr(k: Int) =
      m(k).map(v => if (v > 0) "1" else "-1").mkString("[", ",", "]")
    val cols = (0 until 16).map { k =>
      s"list_inner_product(embedding::DOUBLE[], ${arr(k)}::DOUBLE[]) * CAST(0.25 AS DOUBLE) AS y$k"
    }.mkString(",\n      |  ")
    s"""SELECT vec_id,
      |  $cols
      |FROM embeddings ORDER BY vec_id""".stripMargin
  }
}
