package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Relational.t

/** Round-9 additions: blocked fuzzy record-linkage (q88), corpus bigram
  * language-model scoring (q89), and product-quantization ANN (q90) —
  * all with full DuckDB oracles (q90's inlines its deterministically
  * trained codebooks, the q35 move). */
object ScaleOps5 {

  // --- blocked fuzzy record linkage (q88) ---------------------------------

  /** q88: entity resolution by blocked edit-distance matching — the
    * approximate-STRING-matching companion to the near-dup text family
    * (reference's exact key matching generalized the way a curation
    * pipeline needs for merging noisy source catalogs).
    *
    * Scale shape, in order: (1) collapse the corpus to DISTINCT keys
    * with counts — the 100 TB row space becomes a key space orders of
    * magnitude smaller before any pairing; (2) equi-join on a BLOCKING
    * key (here the head noun of the name), so candidate pairs are
    * per-block cartesian, never corpus-wide — the same
    * candidate-bounding discipline as the LSH band join (q21); (3) only
    * within a block, score `levenshtein` (codegen'd built-in) and keep
    * pairs at distance ≤ 4. `name_a < name_b` halves the pair space and
    * makes the output orientation-canonical. */
  def q88FuzzyJoin(s: SparkSession, dir: String): DataFrame = {
    val names = Relational.fanOut(t(s, dir, "part"))
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
      .withColumn("blk", element_at(split(col("p_name"), " "), 2))
    val a = names.select(col("blk"), col("p_name").as("name_a"),
      col("n_parts").as("n_a"))
    val b = names.select(col("blk"), col("p_name").as("name_b"),
      col("n_parts").as("n_b"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("lev", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("lev") <= 4)
      .select(col("name_a"), col("name_b"), col("lev"), col("n_a"), col("n_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  /** Mirror: identical distinct→block→pair→levenshtein chain; both
    * engines implement unit-cost Wagner–Fischer edit distance (already
    * oracle-proven equal in q41). */
  val q88Sql: String =
    raw"""WITH names AS (
      |  SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts,
      |    split_part(p_name, ' ', 2) AS blk
      |  FROM part GROUP BY p_name
      |)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev,
      |  a.n_parts AS n_a, b.n_parts AS n_b
      |FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 4
      |ORDER BY name_a, name_b""".stripMargin

  // --- corpus bigram LM scoring (q89) -------------------------------------

  /** q89: bigram language-model surprisal proxy — q87's corpus-relative
    * rarity lifted from unigrams to ADJACENT PAIRS, the cheapest
    * n-gram-LM quality signal (a doc whose transitions are all
    * corpus-rare reads as noise or boilerplate-mangled text; one whose
    * transitions are corpus-common reads as fluent). Same exact-integer
    * law as q87: per-bigram inverse frequency `T div cnt` (corpus total
    * over bigram count, floor division), rolled up per doc as mean/max.
    *
    * Scale shape: bigrams explode ~L rows/doc (narrow, no shuffle until
    * the count), the count groupBy partial-aggregates map-side, the doc
    * rollup joins on the bigram-partitioned count table, and only the
    * 1-row corpus total broadcasts — identical topology to q87, which
    * survives 100× with the token exchange as the one real shuffle.
    * Docs with fewer than two tokens have no transitions and drop out
    * (mirrored by the empty generate_series). */
  def q89BigramLm(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.fanOut(t(s, dir, "documents"))
    val bg = docs
      .select(col("doc_id"), graft.text.TextAnalysis.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t)-2), i -> concat(t[i], ' ', t[i+1]))")).as("bg"))
    val counts = bg.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("T")) // 1 row
    bg.join(counts, "bg")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), expr("T div cnt").as("ifreq"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        (sum(col("ifreq")).cast("double") / count(lit(1))).as("mean_inv_freq"),
        max(col("ifreq")).as("max_inv_freq"))
      .orderBy(col("doc_id"))
  }

  /** Mirror: same tokenization as q87, bigrams via 1-based index list
    * (empty below 2 tokens), identical floor-div/rollup; the only double
    * op is the final mean division, mirrored exactly. */
  val q89Sql: String =
    raw"""WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents
      |), bg AS (
      |  SELECT doc_id, t[g] || ' ' || t[g + 1] AS bg FROM (
      |    SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS g
      |    FROM toks WHERE len(t) >= 2)
      |), counts AS (
      |  SELECT bg, COUNT(*) AS cnt FROM bg GROUP BY bg
      |), tot AS (
      |  SELECT SUM(cnt) AS T FROM counts
      |)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(T // cnt) AS DOUBLE) / COUNT(*) AS mean_inv_freq,
      |  CAST(MAX(T // cnt) AS BIGINT) AS max_inv_freq
      |FROM bg JOIN counts USING (bg) CROSS JOIN tot
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --- product-quantization ANN (q90) -------------------------------------

  /** Deterministic PQ codebooks, memoized per (dir, params) exactly like
    * the q35/q66 coarse quantizer: one Verify/Bench session trains at
    * most once per corpus; determinism makes the memo semantically
    * invisible. */
  private val pqModelMemo =
    new java.util.concurrent.ConcurrentHashMap[String, graft.sim.Pq.PqModel]()

  @volatile private var pqLastDir: Option[String] = None

  private[graft] def trainedPq(emb: DataFrame, dir: String): graft.sim.Pq.PqModel =
    pqModelMemo.computeIfAbsent(s"$dir|m=16|k=64|iters=3",
      _ => graft.sim.Pq.train(emb, "vec_id", "embedding", m = 16, k = 64, iters = 3))

  private[graft] def trainedPqOpt(dir: String): Option[graft.sim.Pq.PqModel] =
    Option(pqModelMemo.get(s"$dir|m=16|k=64|iters=3"))

  /** q90: PQ/ADC top-k — the COMPRESSED-CODES ANN path (see
    * [[graft.sim.Pq]]): corpus stored as 16 sub-space code indices (16
    * bytes/vector at k=64 vs 256 float bytes — 16× compression), queries
    * scan codes with per-query lookup tables. m=16/k=64 was picked by a
    * measured recall sweep on the shipped corpus (recall@5 vs exact L2:
    * m=4/k=16 0.17, m=8/k=64 0.33, m=16/k=64 0.53 — near-random
    * embeddings are PQ's worst case, so these are floor numbers). topK=5
    * over queries vec_id<20, ranked by approximate L2² ascending, lowest
    * corpus_id on ties. */
  def q90PqAnn(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val model = trainedPq(emb, dir)
    pqLastDir = Some(dir)
    val codes = graft.sim.Pq.encode(Relational.fanOut(emb), "vec_id", "embedding", model)
    graft.sim.Pq.search(codes, emb.filter(col("vec_id") < 20), model, topK = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Sequential-fold inner product for the q90 mirror:
    * `list_reduce(list_transform(...i -> a[i]*b[i]), +)` — an explicit
    * left fold, so the accumulation ORDER is guaranteed. DuckDB's
    * `list_inner_product` is NOT usable here: its accumulation order is
    * path-dependent (the same 16-dim pair summed from a sliced column vs
    * from literals differs by 1 ULP — measured while building this
    * mirror), and the mirror must reproduce the kernel's in-order fold
    * bit-for-bit. The fold seeds from the first product instead of 0.0;
    * `0.0 + x == x` for every x the kernel can produce, so the two are
    * bit-identical. */
  private def ip(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i]), (x, y) -> x + y)"

  /** DOUBLE literal that DuckDB parses with the correctly-rounded
    * string→double parser. A BARE decimal literal is parsed as DECIMAL
    * and only then cast — and when a list literal unifies elements to a
    * wide DECIMAL scale, that int128 round-trip DOUBLE-ROUNDS: measured
    * 1-ULP drift on 17-significant-digit values while building the q90
    * mirror. A literal with an exponent is typed DOUBLE from the start,
    * so appending `e0` (when Java didn't already print an exponent)
    * guarantees the exact value. Shared by the q35/q66 centroid mirrors,
    * which carried the same latent fragility. */
  private[graft] def doubleLit(d: Double): String = {
    val s = d.toString
    if (s.indexOf('E') >= 0 || s.indexOf('e') >= 0) s else s + "e0"
  }

  /** DuckDB mirror of q90 (m=16, k=64, iters=3, topK=5, queries
    * vec_id<20). Like q35's centroid inlining: the codebooks are
    * deterministic per corpus, so the oracle inlines them as DOUBLE[]
    * literals (shortest-repr round-trip is bit-exact) and re-derives
    * BOTH stages arithmetically — encode (per-sub-space argmin of
    * `(Σx² − 2Σx·c) + Σc²`, ROW_NUMBER tie-break code ASC = kernel's
    * first-argmin) and ADC (per-query sub-space distance table joined
    * back by code, summed left-assoc `((d0+d1)+d2)+d3` = the kernel's
    * in-order fold). Every Σ is the [[ip]] sequential fold (see there
    * for why not `list_inner_product`). Sub-space slice boundaries are
    * baked from the model's dim (1-based inclusive DuckDB slices).
    * Data-dependent by necessity — present only after q90PqAnn has
    * trained on `dir` in this JVM. */
  def q90SqlFor(dir: String): Option[String] = trainedPqOpt(dir).map { model =>
    val st = model.starts
    val cbValues = (0 until model.m).flatMap { mi =>
      model.codebooks(mi).zipWithIndex.map { case (v, code) =>
        s"($mi, $code, ${v.map(f => doubleLit(f.toDouble)).mkString("[", ", ", "]")}::DOUBLE[])"
      }
    }.mkString(",\n")
    val subSelects = (0 until model.m).map { mi =>
      s"SELECT vec_id, $mi AS m, e[${st(mi) + 1}:${st(mi + 1)}] AS s FROM b"
    }.mkString("\n  UNION ALL ")
    val codeCols = (0 until model.m).map { mi =>
      s"MAX(CASE WHEN m = $mi THEN code END) AS c$mi"
    }.mkString(",\n    ")
    val lutJoins = (0 until model.m).map { mi =>
      val qj = if (mi == 0) "" else s" AND l$mi.query_id = l0.query_id"
      s"JOIN lutt l$mi ON l$mi.m = $mi AND l$mi.code = c.c$mi$qj"
    }.mkString("\n  ")
    val adcSum = (1 until model.m).foldLeft("l0.d")((acc, mi) => s"($acc + l$mi.d)")
    raw"""WITH cb(m, code, cvec) AS (
      |    VALUES $cbValues
      |), b AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
      |), sub AS (
      |  $subSelects
      |), subx AS (
      |  SELECT vec_id, m, s, ${ip("s", "s")} AS xx FROM sub
      |), cbx AS (
      |  SELECT m, code, cvec, ${ip("cvec", "cvec")} AS cc FROM cb
      |), enc AS (
      |  SELECT vec_id, m, code FROM (
      |    SELECT subx.vec_id, subx.m, cbx.code,
      |      ROW_NUMBER() OVER (PARTITION BY subx.vec_id, subx.m ORDER BY
      |        (subx.xx - 2 * ${ip("subx.s", "cbx.cvec")}) + cbx.cc ASC,
      |        cbx.code) AS rn
      |    FROM subx JOIN cbx ON cbx.m = subx.m) WHERE rn = 1
      |), codes AS (
      |  SELECT vec_id AS corpus_id,
      |    $codeCols
      |  FROM enc GROUP BY vec_id
      |), lutt AS (
      |  SELECT q.vec_id AS query_id, q.m, cbx.code,
      |    (q.xx - 2 * ${ip("q.s", "cbx.cvec")}) + cbx.cc AS d
      |  FROM subx q JOIN cbx ON cbx.m = q.m WHERE q.vec_id < 20
      |), cand AS (
      |  SELECT l0.query_id, c.corpus_id, $adcSum AS adc
      |  FROM codes c
      |  $lutJoins
      |  WHERE l0.query_id <> c.corpus_id
      |), ranked AS (
      |  SELECT query_id, corpus_id, adc,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc ASC, corpus_id) AS rank
      |  FROM cand
      |)
      |SELECT query_id, rank, corpus_id, adc FROM ranked WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin
  }

  /** Legacy no-arg accessor: the mirror for the most recently trained
    * corpus (the single-corpus Verify contract). Prefer [[q90SqlFor]]. */
  def q90SqlOpt: Option[String] = pqLastDir.flatMap(q90SqlFor)
}
