package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Relational.t

/** Round-9 batch 10: the BMP-completing four-way image sniff (q128), an
  * exact-integer CUSUM changepoint detector (q129), positional phrase
  * search over an inverted token index (q130), reciprocal-rank fusion of
  * two ANN rankings (q131), and per-nation Gini concentration (q132).
  *
  * Cross-engine exactness discipline (ScaleOps7–10 rules): exact integer
  * laws everywhere a comparison or ranking depends on a value; the only
  * doubles are q131's q20-proven cosine/inner-product scoring (fixed
  * in-order trees mirrored by DuckDB's list_inner_product) and single
  * final divisions of exact integers.
  */
object ScaleOps11 {

  // --- four-way auto-sniffed image decode (q128) ---------------------------

  /** q128: the full lossless image surface in ONE query — a mixed corpus
    * cycling PPM / PNG / GIF / BMP by doc_id % 4, every blob decoded by
    * the same auto-sniffing kernel ([[graft.multimodal.ImageDecode]]).
    * The BMP arm is REAL layout work: BGR channel order, bottom-up row
    * storage, 4-byte row padding ([[graft.multimodal.Bmp]]) — the oracle
    * re-derives each arm's pixels from its id-arithmetic law, so the
    * stats hash-match only if signature dispatch AND all four decode
    * paths (P6 grammar; CRC+inflate+unfilter; variable-width LZW +
    * palette; BGR/flip/pad undo) are exactly right.
    *
    * Scale shape: pure map — fixture synthesis, sniff, decode, stats in
    * one WholeStageCodegen projection; no exchange before the
    * presentation order-by; a corrupt blob degrades to NULL. */
  def q128BmpMixed(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val id = col("doc_id").cast("long")
    val media = docs.select(
      id.as("media_id"),
      when(id % 4 === 0, column(graft.multimodal.PpmFixture(expression(id))))
        .when(id % 4 === 1, column(graft.multimodal.PngFixture(expression(id))))
        .when(id % 4 === 2, column(graft.multimodal.GifFixture(expression(id))))
        .otherwise(column(graft.multimodal.BmpFixture(expression(id))))
        .as("content"))
    graft.multimodal.Multimodal.decodeImageStats(media)
      .drop("n_bytes")
      .orderBy(col("media_id"))
  }

  /** Mirror: all four fixture laws are pure id arithmetic over the same
    * 3+id%3 × 2+id%2 dims — PPM (id·31+j·7), PNG (id·37+j·11), GIF
    * (palette-quantized: 16-entry palette (id·43+p·7)%16 indexed per
    * pixel, channel c adds c·29 within the entry), BMP (id·41+j·13),
    * all mod 256. 45 = the max raster (5·3·3). */
  val q128Sql: String =
    """WITH d AS (
      |  SELECT CAST(doc_id AS BIGINT) AS media_id,
      |    3 + doc_id % 3 AS w, 2 + doc_id % 2 AS h
      |  FROM documents
      |), px AS (
      |  SELECT media_id, w, h, j,
      |    CASE media_id % 4
      |      WHEN 0 THEN (media_id * 31 + j * 7) % 256
      |      WHEN 1 THEN (media_id * 37 + j * 11) % 256
      |      WHEN 2 THEN (media_id * 17
      |        + (((media_id * 43 + (j // 3) * 7) % 16) * 3 + j % 3) * 29) % 256
      |      ELSE (media_id * 41 + j * 13) % 256
      |    END AS v
      |  FROM d CROSS JOIN range(0, 45) AS r(j) WHERE j < w * h * 3
      |), agg AS (
      |  SELECT media_id, w, h,
      |    SUM(v) AS sum_samples,
      |    SUM(v * (1 + j % 97)) AS checksum
      |  FROM px GROUP BY media_id, w, h
      |)
      |SELECT media_id,
      |  CASE media_id % 4 WHEN 0 THEN 'ppm' WHEN 1 THEN 'png'
      |    WHEN 2 THEN 'gif' ELSE 'bmp' END AS format,
      |  CAST(w AS INTEGER) AS width,
      |  CAST(h AS INTEGER) AS height,
      |  CAST(w * h AS INTEGER) AS n_pixels,
      |  CAST(sum_samples AS BIGINT) AS sum_samples,
      |  CAST(checksum AS BIGINT) AS checksum,
      |  CAST(sum_samples AS DOUBLE) / CAST(w * h * 3 AS DOUBLE) AS mean_sample
      |FROM agg ORDER BY media_id""".stripMargin

  // --- exact-integer CUSUM changepoint (q129) ------------------------------

  /** q129: CUSUM changepoint detection on the daily volume of each event
    * type — the drift detector a streaming ingest layer runs next to
    * q104's trailing-window anomaly flags (q104 finds spikes; CUSUM
    * finds sustained LEVEL SHIFTS a spike detector misses).
    *
    * Exact-integer law: with D observed days and total T for a type, the
    * classic mean-centered cusum Σ(cᵢ − T/D) is scaled by D to
    * S_d = Σ_{i≤d} (D·cᵢ − T) — pure int64, no division anywhere — and
    * the changepoint is the day maximizing |S_d| (ties → earliest day).
    * S is identically 0 at the last day (telescoping), so the argmax is
    * an interior day whenever any drift exists.
    *
    * Scale shape: one partial-agg groupBy to (type, day) — the only
    * data-sized exchange — then windows over |days| rows per type. */
  def q129Cusum(s: SparkSession, dir: String): DataFrame = {
    val ev = Relational.events(s, dir)
    val daily = ev.groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val wT = Window.partitionBy(col("event_type"))
    val wOrd = wT.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = daily
      .withColumn("d_days", count(lit(1)).over(wT))
      .withColumn("total", sum(col("c")).over(wT))
      .withColumn("s",
        sum(col("d_days") * col("c") - col("total")).over(wOrd))
    staged
      .withColumn("rn", row_number().over(wT.orderBy(abs(col("s")).desc, col("day"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("d_days").as("n_days"), col("total"),
        col("day").as("cp_day"), col("s").as("s_at_cp"))
      .orderBy(col("event_type"))
  }

  val q129Sql: String =
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS c
      |  FROM events GROUP BY event_type, date_trunc('day', ts)
      |), staged AS (
      |  SELECT event_type, day, c,
      |    COUNT(*) OVER (PARTITION BY event_type) AS d_days,
      |    SUM(c) OVER (PARTITION BY event_type) AS total
      |  FROM daily
      |), cusum AS (
      |  SELECT event_type, day, d_days, total,
      |    SUM(d_days * c - total) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
      |  FROM staged
      |), pick AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
      |    ORDER BY ABS(s) DESC, day) AS rn
      |  FROM cusum
      |)
      |SELECT event_type, CAST(d_days AS BIGINT) AS n_days,
      |  CAST(total AS BIGINT) AS total, day AS cp_day,
      |  CAST(s AS BIGINT) AS s_at_cp
      |FROM pick WHERE rn = 1 ORDER BY event_type""".stripMargin

  // --- positional phrase search (q130) -------------------------------------

  /** q130: exact phrase search — the positional-index primitive BM25
    * (q91) cannot express: "batch batch" must appear as ADJACENT tokens,
    * not merely co-occur. Tokenization is the corpus-wide q115/q42 law
    * (whitespace split of trimmed lowercase); adjacency is lead(tok)
    * over the per-document position order; overlapping matches count
    * ("batch batch batch" → 2).
    *
    * Scale shape: posexplode then ONE hash-partitioned window per
    * doc_id — on a cluster this is the standard build order of a
    * positional posting list (doc-partitioned, position-sorted); the
    * phrase filter collapses it to matching docs before the final agg,
    * so nothing document-sized survives the window. */
  def q130PhraseSearch(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val toks = docs.select(col("doc_id"),
        posexplode(split(trim(lower(col("text"))), "\\s+")).as(Seq("pos", "tok")))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    toks
      .withColumn("nxt", lead(col("tok"), 1).over(wDoc))
      .filter(col("tok") === "batch" && col("nxt") === "batch")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_matches"))
      .orderBy(col("doc_id"))
  }

  val q130Sql: String =
    raw"""WITH toks AS (
      |  SELECT doc_id,
      |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok,
      |    unnest(generate_series(1,
      |      len(regexp_split_to_array(trim(lower(text)), '\s+')))) AS pos
      |  FROM documents
      |), pairs AS (
      |  SELECT doc_id, tok,
      |    lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
      |  FROM toks
      |)
      |SELECT doc_id, COUNT(*) AS n_matches
      |FROM pairs WHERE tok = 'batch' AND nxt = 'batch'
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --- reciprocal-rank fusion (q131) ---------------------------------------

  /** q131: reciprocal-rank fusion of two retrieval rankings — cosine
    * similarity and raw inner product — for each of the 10 query
    * vectors: the standard hybrid-search combiner (vector + keyword
    * arms in production; two vector metrics here so both arms stay
    * oracle-exact). Scores are the q20-proven in-order double trees;
    * ranks are integer row_numbers with (score DESC, corpus_id) ties;
    * the fused score is the INTEGER fixed point
    * Σ floor(10⁹/(60+rank)) — RRF's k=60 — so fusion and the final
    * ranking never compare engine-summed floats.
    *
    * Scale shape: 10 broadcast query rows against the corpus (fused
    * codegen projection, no corpus shuffle); two per-query windows over
    * corpus-sized partitions — at 100 TB each window is a top-k
    * pushdown candidate, but the RANK (not just top-k membership) is
    * load-bearing for RRF, so the full per-query sort is the honest
    * cost; it is per-query parallel. */
  def q131RrfFusion(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{VectorFunctions => V}
    val emb = Relational.fanOut(t(s, dir, "embeddings"))
      .select(col("vec_id"), col("embedding"))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val wQ = Window.partitionBy(col("query_id"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("ip", V.dot(col("embedding"), col("qv")))
      .withColumn("cos", V.dot(col("embedding"), col("qv"))
        / (sqrt(V.normSq(col("embedding"))) * sqrt(V.normSq(col("qv")))))
      .withColumn("rank_cos",
        row_number().over(wQ.orderBy(col("cos").desc, col("vec_id"))))
      .withColumn("rank_ip",
        row_number().over(wQ.orderBy(col("ip").desc, col("vec_id"))))
      .withColumn("rrf_fp",
        expr("1000000000L div (60 + rank_cos) + 1000000000L div (60 + rank_ip)"))
      .withColumn("fused_rank",
        row_number().over(wQ.orderBy(col("rrf_fp").desc, col("vec_id"))))
    scored.filter(col("fused_rank") <= 5)
      .select(col("query_id"), col("fused_rank"), col("vec_id").as("corpus_id"),
        col("rrf_fp"), col("rank_cos"), col("rank_ip"))
      .orderBy(col("query_id"), col("fused_rank"))
  }

  val q131Sql: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      |  WHERE vec_id < 10
      |), scored AS (
      |  SELECT q.query_id, c.vec_id AS corpus_id,
      |    list_inner_product(c.embedding::DOUBLE[], q.qv::DOUBLE[]) AS ip,
      |    list_inner_product(c.embedding::DOUBLE[], q.qv::DOUBLE[]) /
      |      (sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])) *
      |       sqrt(list_inner_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))) AS cos
      |  FROM embeddings c, q WHERE c.vec_id <> q.query_id
      |), ranked AS (
      |  SELECT query_id, corpus_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY cos DESC, corpus_id) AS rank_cos,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY ip DESC, corpus_id) AS rank_ip
      |  FROM scored
      |), fused AS (
      |  SELECT query_id, corpus_id, rank_cos, rank_ip,
      |    CAST(1000000000 // (60 + rank_cos)
      |       + 1000000000 // (60 + rank_ip) AS BIGINT) AS rrf_fp
      |  FROM ranked
      |), final AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY rrf_fp DESC, corpus_id) AS fused_rank
      |  FROM fused
      |)
      |SELECT query_id, CAST(fused_rank AS INTEGER) AS fused_rank, corpus_id,
      |  rrf_fp, CAST(rank_cos AS INTEGER) AS rank_cos,
      |  CAST(rank_ip AS INTEGER) AS rank_ip
      |FROM final WHERE fused_rank <= 5
      |ORDER BY query_id, fused_rank""".stripMargin

  // --- per-nation Gini concentration (q132) --------------------------------

  /** q132: Gini coefficient of customer account balances per nation —
    * the inequality/concentration profile a mixing layer reads next to
    * q62's source mix and q74's heavy hitters (a source whose token mass
    * concentrates in few documents mixes differently from a flat one;
    * same statistic, relational form here).
    *
    * Exact law: with per-nation balances in integer cents sorted
    * ascending (rank i from 1, ties broken by custkey), Gini =
    * (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) — numerator and denominator are
    * exact int64 sums, the quotient is ONE IEEE division. No float ever
    * enters a Σ.
    *
    * Scale shape: one hash-partitioned window per nation (rank), one
    * partial-agg groupBy, broadcast nation-name join. */
  def q132Gini(s: SparkSession, dir: String): DataFrame = {
    val cust = Relational.fanOut(t(s, dir, "customer"))
      .select(col("c_nationkey"), col("c_custkey"),
        floor(col("c_acctbal") * lit(100.0) + lit(0.5)).cast("long").as("cents"))
    val wN = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("cents"), col("c_custkey"))
    val ranked = cust.withColumn("i", row_number().over(wN))
    val agg = ranked.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        sum(col("i") * col("cents")).as("iws"))
      .withColumn("num", lit(2L) * col("iws") - (col("n") + 1) * col("sum_cents"))
      .withColumn("den", col("n") * col("sum_cents"))
    agg.join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_nationkey").as("nationkey"), col("n_name"), col("n"),
        col("sum_cents"),
        (col("num").cast("double") / col("den").cast("double")).as("gini"))
      .orderBy(col("nationkey"))
  }

  val q132Sql: String =
    """WITH cust AS (
      |  SELECT c_nationkey, c_custkey,
      |    CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
      |  FROM customer
      |), ranked AS (
      |  SELECT c_nationkey, cents,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |      ORDER BY cents, c_custkey) AS i
      |  FROM cust
      |), agg AS (
      |  SELECT c_nationkey, COUNT(*) AS n, SUM(cents) AS sum_cents,
      |    SUM(i * cents) AS iws
      |  FROM ranked GROUP BY c_nationkey
      |)
      |SELECT c_nationkey AS nationkey, n_name, CAST(n AS BIGINT) AS n,
      |  CAST(sum_cents AS BIGINT) AS sum_cents,
      |  CAST(2 * iws - (n + 1) * sum_cents AS DOUBLE)
      |    / CAST(n * sum_cents AS DOUBLE) AS gini
      |FROM agg JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY nationkey""".stripMargin
}
