package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Relational.{t, events, fanOut}

/** Third wave of relational operators: range/band join, set operations,
  * grouping sets, string functions, explode word-count, decorrelated
  * scalar subquery, window navigation functions, temporal interval join,
  * JSON extraction. All oracle-checked against DuckDB.
  *
  * Reference surface: the loader's per-row transform layer
  * (`/root/reference/src/file-to-sql-loader.py` datetime/string handling)
  * only needs scalar projections; everything here is the relational
  * closure a user of that loader reaches for next once the data is in a
  * queryable table.
  */
object Relational3 {

  // ----------------------------------------------------------------------
  // Range (band) join: classify each lineitem row into a price band by a
  // non-equi BETWEEN join. The band dim is tiny → broadcast nested-loop is
  // the right physical plan at any scale (3 comparisons/row, no shuffle on
  // the fact side). For a large interval table the rewrite is banding:
  // floor(price/width) equi-key + residual filter — documented knob, not
  // needed for a 3-row dim.
  def q38RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      ("low", 0.0, 20000.0),
      ("mid", 20000.0, 50000.0),
      ("high", 50000.0, 1000000000.0)).toDF("band", "lo", "hi")
    t(s, dir, "lineitem")
      .select(col("l_extendedprice"), col("l_quantity"))
      .join(broadcast(bands),
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"))
      .orderBy(col("band"))
  }

  val q38Sql: String =
    """SELECT band, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |JOIN (VALUES ('low', 0.0, 20000.0), ('mid', 20000.0, 50000.0),
      |             ('high', 50000.0, 1000000000.0)) AS b(band, lo, hi)
      |  ON l_extendedprice >= lo AND l_extendedprice < hi
      |GROUP BY band ORDER BY band""".stripMargin

  // ----------------------------------------------------------------------
  // Set operations: INTERSECT / EXCEPT with SQL set (distinct) semantics.
  // Catalyst plans both as aggregated joins (semi/anti over distinct keys)
  // — one shuffle per op on the key, no row blowup.
  def q39SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def keys(status: String) =
      o.filter(col("o_orderstatus") === status).select(col("o_custkey"))
    keys("O").intersect(keys("F")).except(keys("P"))
      .orderBy(col("o_custkey"))
  }

  val q39Sql: String =
    """SELECT o_custkey FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
      |) ORDER BY o_custkey""".stripMargin

  // ----------------------------------------------------------------------
  // Explicit GROUPING SETS with grouping() indicators — the generalization
  // of rollup (q12) / cube (q33): caller-chosen aggregation lattice, one
  // Expand + one shuffle regardless of how many sets.
  def q40GroupingSets(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.createOrReplaceTempView("graft_q40_lineitem")
    s.sql("""
      SELECT l_returnflag, l_linestatus,
        CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        COUNT(*) AS n
      FROM graft_q40_lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
  }

  val q40Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
      |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ----------------------------------------------------------------------
  // String-function projection: regex extract, split/element access, case
  // fold, length, edit distance — all codegen'd builtins, pure map over
  // the scan (no shuffle, survives any scale).
  def q41StringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        element_at(split(col("p_name"), " "), 1).as("first_tok"),
        upper(col("p_brand")).as("brand_up"),
        length(col("p_name")).cast("long").as("name_len"),
        levenshtein(col("p_name"), lit("widget")).cast("long").as("lev"))
      .orderBy(col("p_partkey"))

  val q41Sql: String =
    """SELECT p_partkey,
      |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
      |  string_split(p_name, ' ')[1] AS first_tok,
      |  upper(p_brand) AS brand_up,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  CAST(levenshtein(p_name, 'widget') AS BIGINT) AS lev
      |FROM part ORDER BY p_partkey""".stripMargin

  // ----------------------------------------------------------------------
  // Explode + aggregate (word count): the canonical flatten-then-reduce.
  // Map-side: split+explode stays in whole-stage codegen; one shuffle on
  // the token; top-k by (count, token) is a total order so LIMIT is
  // deterministic.
  def q42WordCount(s: SparkSession, dir: String): DataFrame =
    Relational.fanOut(t(s, dir, "documents"))
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  val q42Sql: String =
    """SELECT token, COUNT(*) AS n FROM (
      |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
      |) WHERE token <> ''
      |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin

  // ----------------------------------------------------------------------
  // Correlated scalar subquery, decorrelated: customers with more orders
  // than their market segment's average. Spark-first this is two
  // aggregations + a broadcast of the 5-row per-segment average — the
  // decorrelation Catalyst would do for the subquery form, written
  // explicitly so the segment-average exchange is visibly tiny.
  // Float discipline: avg(long) is sum/count in double on both engines —
  // counts are exact in double, so the boundary comparison agrees.
  def q43AboveAvg(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select("o_custkey")
    val c = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
    val perCust = o.join(c, col("o_custkey") === col("c_custkey"))  // customer scales with SF: no forced hint
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    // segment average as a window over the per-customer agg: perCust is
    // computed ONCE (vs the naive two-branch plan that re-joins and
    // re-aggregates it), and the final per-segment count reuses the
    // window's hash partitioning — 2 exchanges total instead of 4.
    val w = Window.partitionBy(col("c_mktsegment"))
    perCust
      .withColumn("seg_avg", avg(col("n_orders")).over(w))
      .filter(col("n_orders") > col("seg_avg"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_above"))
      .orderBy(col("c_mktsegment"))
  }

  val q43Sql: String =
    """WITH per_cust AS (
      |  SELECT c_mktsegment, c_custkey, COUNT(*) AS n_orders
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2
      |), seg AS (
      |  SELECT c_mktsegment AS seg, AVG(n_orders) AS seg_avg FROM per_cust GROUP BY 1
      |)
      |SELECT c_mktsegment, COUNT(*) AS n_above
      |FROM per_cust JOIN seg ON c_mktsegment = seg
      |WHERE n_orders > seg_avg
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ----------------------------------------------------------------------
  // Window navigation: lag/lead/ntile/first_value per customer ordered by
  // (o_orderdate, o_orderkey) — full tie-break so every engine sorts
  // identically. One shuffle on o_custkey serves all four functions.
  def q44WindowNav(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(
        col("o_orderkey"), col("o_custkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        ntile(4).over(w).cast("long").as("quartile"),
        first_value(col("o_orderkey")).over(w).as("first_key"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q44Sql: String =
    """SELECT o_orderkey, o_custkey,
      |  lag(o_totalprice, 1) OVER w AS prev_price,
      |  lead(o_totalprice, 1) OVER w AS next_price,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  first_value(o_orderkey) OVER w AS first_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ----------------------------------------------------------------------
  // Temporal interval join: for every signup, how many non-signup events
  // the same user produced within the following hour. Equi key (user_id)
  // + range predicate → sort-merge join with a range filter: the shuffle
  // is on user_id only, so the plan scales with user cardinality, not
  // with the interval width.
  def q45IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"),
        col("ts").as("signup_ts"))
    val others = e.filter(col("event_type") =!= "signup")
      .select(col("user_id").as("u2"), col("ts").as("ets"))
    signups.join(others,
        col("user_id") === col("u2") &&
          col("ets") >= col("signup_ts") &&
          col("ets") <= col("signup_ts") + expr("INTERVAL 1 HOUR"),
        "left")
      .groupBy(col("user_id"), col("signup_id"))
      .agg(count(col("ets")).as("n_follow"))
      .orderBy(col("user_id"), col("signup_id"))
  }

  val q45Sql: String =
    """SELECT s.user_id, s.event_id AS signup_id, COUNT(o.ts) AS n_follow
      |FROM events s
      |LEFT JOIN events o ON o.user_id = s.user_id AND o.event_type <> 'signup'
      |  AND o.ts >= s.ts AND o.ts <= s.ts + INTERVAL 1 HOUR
      |WHERE s.event_type = 'signup'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ----------------------------------------------------------------------
  // JSON extraction from a string column (events.props = {"k": N}):
  // path-extract + cast + aggregate. get_json_object is a codegen'd
  // builtin; the JSON parse happens once per row map-side.
  def q46Json(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val q46Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ----------------------------------------------------------------------
  // Multi-column exact COUNT(DISTINCT): Catalyst plans N distinct columns
  // as one Expand (N+1 projections) + two-phase aggregate — one shuffle,
  // no N-pass scan. The exact companion to q37's HLL sketches.
  def q47CountDistinct(s: SparkSession, dir: String): DataFrame =
    fanOut(t(s, dir, "lineitem"))
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("nd_parts"),
        countDistinct(col("l_suppkey")).as("nd_supps"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  val q47Sql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS nd_parts,
      |  COUNT(DISTINCT l_suppkey) AS nd_supps,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ----------------------------------------------------------------------
  // RANGE-frame moving aggregate: per user, the trailing-1-hour average of
  // `value` — an event-TIME frame (peers by timestamp distance), not a row
  // count. Frame key is epoch MICROseconds on both engines so boundaries
  // are bit-identical; the sum inside the frame is exact decimal so
  // accumulation order can't drift.
  def q48MovingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, 0L)
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        (sum(col("value").cast("decimal(18,4)")).over(w).cast("double") /
          count(lit(1)).over(w)).as("mv_avg"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q48Sql: String =
    """SELECT user_id, event_id, ts,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
      |    / COUNT(*) OVER w AS mv_avg
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  // ----------------------------------------------------------------------
  // Per-group top-k via the custom bounded-buffer aggregate
  // (functions.GroupedTopK): map-side partials keep only k pairs per
  // group, so the exchange carries groups x k rows — vs the window
  // formulation shuffling and sorting the entire input. Same rows as the
  // row_number() oracle (key DESC, id ASC tie-break, unique ids).
  def q49GroupedTopK(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge._
    val topk = column(graft.functions.GroupedTopK(
      expression(col("p_retailprice")), expression(col("p_partkey")), k = 3)
      .toAggregateExpression())
    fanOut(t(s, dir, "part"))
      .groupBy(col("p_type"))
      .agg(topk.as("topk"))
      .select(col("p_type"), posexplode(col("topk")))
      .select(col("p_type"), (col("pos") + 1).cast("long").as("rank"),
        col("col.key").as("price"), col("col.id").as("p_partkey"))
      .orderBy(col("p_type"), col("rank"))
  }

  val q49Sql: String =
    """SELECT p_type, rank, price, p_partkey FROM (
      |  SELECT p_type,
      |    row_number() OVER (PARTITION BY p_type
      |      ORDER BY p_retailprice DESC, p_partkey) AS rank,
      |    p_retailprice AS price, p_partkey
      |  FROM part
      |) WHERE rank <= 3 ORDER BY p_type, rank""".stripMargin

  // ----------------------------------------------------------------------
  // Population variance / stddev from exact decimal moments: built-in
  // stddev accumulates doubles in partition order (non-reproducible
  // across runs/cluster layouts, and engine-dependent); summing x and x²
  // as exact decimals makes the moments order-independent, and the final
  // (m2 - m1²/n)/n arithmetic is the same double ops in the same order on
  // both engines — bit-reproducible at any parallelism. l_quantity is
  // 2-dp ≤ 50, so x² is an exact 4-dp decimal and the sums stay far
  // below the 2^53 double-exact ceiling after lossless scale reduction.
  def q50Variance(s: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast("decimal(12,2)")
    fanOut(t(s, dir, "lineitem"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("decimal(20,2)").cast("double").as("sum_x"),
        sum((x * x).cast("decimal(16,4)")).cast("decimal(24,4)").cast("double").as("sum_x2"))
      .select(
        col("l_returnflag"), col("n"),
        ((col("sum_x2") - col("sum_x") * col("sum_x") / col("n")) / col("n"))
          .as("var_pop"),
        sqrt((col("sum_x2") - col("sum_x") * col("sum_x") / col("n")) / col("n"))
          .as("stddev_pop"))
      .orderBy(col("l_returnflag"))
  }

  val q50Sql: String =
    """WITH m AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) AS sum_x,
      |    CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(16,4))) AS DECIMAL(24,4)) AS DOUBLE) AS sum_x2
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l_returnflag, n,
      |  (sum_x2 - sum_x * sum_x / n) / n AS var_pop,
      |  sqrt((sum_x2 - sum_x * sum_x / n) / n) AS stddev_pop
      |FROM m ORDER BY l_returnflag""".stripMargin

  // ----------------------------------------------------------------------
  // Deterministic train/val/test split: Knuth multiplicative hash of the
  // document id into 2^32 buckets, 80/10/10 by bucket range. Pure integer
  // arithmetic — the same document lands in the same split on any engine,
  // any cluster layout, any run (the property a reproducible training
  // pipeline needs; seeded `sample()` is engine- and partitioning-
  // dependent). A pure map over the scan: no shuffle until the audit agg.
  /** Overflow-safe Knuth 32-bit multiplicative hash bucket for [[q51TrainSplit]]:
    * mask the id to 32 bits, then compute (id32 * A) mod 2^32 as split
    * 16-bit halves so no intermediate exceeds 2^49 — a naive 64-bit
    * multiply silently wraps in Spark (and raises in DuckDB) for
    * doc_id ≳ 3.47e9, breaking the "same split on any engine" guarantee.
    * Precondition: id ≥ 0. */
  def splitBucket(id: Column): Column = {
    val a = 2654435761L
    val id32 = pmod(id, lit(4294967296L))
    val hi = shiftright(id32, 16)
    val lo = pmod(id32, lit(65536L))
    pmod(pmod(hi * lit(a), lit(65536L)) * lit(65536L) + lo * lit(a),
      lit(4294967296L))
  }

  /** Split assignment from [[splitBucket]]: 80/10/10 by bucket range. */
  def splitAssign(id: Column): Column = {
    val bucket = splitBucket(id)
    when(bucket < lit(3435973836L), "train")   // floor(0.8 * 2^32)
      .when(bucket < lit(3865470565L), "val")  // floor(0.9 * 2^32)
      .otherwise("test")
  }

  /** Deterministic hash-sample: keep rows whose [[splitBucket]] falls
    * below fraction·2^32. Unlike seeded `sample()` (engine- and
    * partitioning-dependent), the same row is kept on any engine, any
    * layout, any run — and samples NEST: sampleByHash(f1) ⊆
    * sampleByHash(f2) for f1 ≤ f2, so a 1% debug run is always a subset
    * of the 10% run. Pure map over the scan. */
  def sampleByHash(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction out of [0,1]")
    df.filter(splitBucket(col(idCol)) < lit(math.round(fraction * 4294967296.0)))
  }

  def q51TrainSplit(s: SparkSession, dir: String): DataFrame = {
    val split = splitAssign(col("doc_id"))
    fanOut(t(s, dir, "documents"))
      .select(col("doc_id"), col("lang"), split.as("split"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
      .orderBy(col("lang"), col("split"))
  }

  val q51Sql: String =
    """WITH h AS (
      |  SELECT doc_id, lang, doc_id % 4294967296 AS id32 FROM documents
      |), b AS (
      |  SELECT doc_id, lang,
      |    ((((id32 // 65536) * 2654435761) % 65536) * 65536
      |      + (id32 % 65536) * 2654435761) % 4294967296 AS bucket
      |  FROM h
      |), assigned AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN bucket < 3435973836 THEN 'train'
      |         WHEN bucket < 3865470565 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM b
      |)
      |SELECT lang, split, COUNT(*) AS n_docs,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
      |FROM assigned
      |GROUP BY lang, split ORDER BY lang, split""".stripMargin

  // ----------------------------------------------------------------------
  // Pearson correlation + covariance from exact decimal moments (same
  // discipline as q50): builtin corr() accumulates doubles in partition
  // order; exact decimal sums of x, y, x², y², xy are order-independent
  // and the closed-form finish is identical double arithmetic on both
  // engines. x = quantity (2-dp ≤ 50), y = discount (4-dp ≤ 0.1): every
  // moment's unscaled sum stays far below 2^53 (largest is Σx² ≈ 1.5e13
  // at sf0.1), so the decimal→double casts are exact. price² would NOT
  // fit (Σy² ≈ 7e19 unscaled) — pick moment columns so the invariant
  // holds, or pre-scale with a lossy documented epsilon.
  def q52Corr(s: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast("decimal(12,2)")
    val y = col("l_discount").cast("decimal(8,4)")
    fanOut(t(s, dir, "lineitem"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("decimal(20,2)").cast("double").as("sx"),
        sum(y).cast("decimal(20,4)").cast("double").as("sy"),
        sum((x * x).cast("decimal(16,4)")).cast("decimal(26,4)").cast("double").as("sxx"),
        sum((y * y).cast("decimal(16,8)")).cast("decimal(26,8)").cast("double").as("syy"),
        sum((x * y).cast("decimal(16,6)")).cast("decimal(26,6)").cast("double").as("sxy"))
      .select(
        col("l_returnflag"), col("n"),
        ((col("sxy") - col("sx") * col("sy") / col("n")) / col("n")).as("covar_pop"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
           sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("corr"))
      .orderBy(col("l_returnflag"))
  }

  val q52Sql: String =
    """WITH m AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS DOUBLE) AS sx,
      |    CAST(CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DECIMAL(20,4)) AS DOUBLE) AS sy,
      |    CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(16,4))) AS DECIMAL(26,4)) AS DOUBLE) AS sxx,
      |    CAST(CAST(SUM(CAST(CAST(l_discount AS DECIMAL(8,4)) * CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(16,8))) AS DECIMAL(26,8)) AS DOUBLE) AS syy,
      |    CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(16,6))) AS DECIMAL(26,6)) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l_returnflag, n,
      |  (sxy - sx * sy / n) / n AS covar_pop,
      |  (n * sxy - sx * sy) /
      |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr
      |FROM m ORDER BY l_returnflag""".stripMargin

  // ----------------------------------------------------------------------
  // Multiset set operations (ALL variants keep duplicates): Catalyst
  // plans both as a count-compare aggregate join — one shuffle, no
  // row-by-row matching.
  def q53SetOpsAll(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def keys(status: String) =
      o.filter(col("o_orderstatus") === status).select(col("o_custkey"))
    keys("O").exceptAll(keys("F"))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_excess"))
      .orderBy(col("o_custkey"))
  }

  val q53Sql: String =
    """SELECT o_custkey, COUNT(*) AS n_excess FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |  EXCEPT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |) GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // ----------------------------------------------------------------------
  // Snapshot diff (CDC): classify every key between the orders table and
  // a deterministically-mutated copy (drop keys %11=0, bump price on
  // %5=0, insert shifted copies of %13=0) via load.Upsert.snapshotDiff —
  // one full-outer join, null-safe column compare. The audit feed the
  // reference's row-at-a-time upsert loop never produced.
  def q54SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val mutated = o.filter(col("o_orderkey") % 11 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
    val inserts = o.filter(col("o_orderkey") % 13 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
    val newSnap = mutated.unionByName(inserts)
    graft.load.Upsert.snapshotDiff(o, newSnap, Seq("o_orderkey"))
      .groupBy(col("change"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("change"))
  }

  val q54Sql: String =
    """WITH newsnap AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
      |         ELSE o_totalprice END AS o_totalprice,
      |    o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 11 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice,
      |    o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 13 = 0
      |), j AS (
      |  SELECT o.o_orderkey IS NOT NULL AS in_old,
      |    n.o_orderkey IS NOT NULL AS in_new,
      |    (o.o_custkey IS NOT DISTINCT FROM n.o_custkey)
      |      AND (o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus)
      |      AND (o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice)
      |      AND (o.o_orderdate IS NOT DISTINCT FROM n.o_orderdate)
      |      AND (o.o_orderpriority IS NOT DISTINCT FROM n.o_orderpriority) AS same
      |  FROM orders o FULL OUTER JOIN newsnap n ON o.o_orderkey = n.o_orderkey
      |)
      |SELECT CASE WHEN NOT in_old THEN 'inserted'
      |            WHEN NOT in_new THEN 'deleted'
      |            WHEN same THEN 'unchanged' ELSE 'changed' END AS change,
      |  COUNT(*) AS n
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  // ----------------------------------------------------------------------
  // Unpivot (wide → long), the inverse of q32's conditional pivot: the
  // per-segment status counts melt into (segment, status, n) rows. A pure
  // Expand projection — no shuffle beyond the underlying aggregate.
  def q55Unpivot(s: SparkSession, dir: String): DataFrame = {
    val wide = t(s, dir, "orders")
      .groupBy(col("o_custkey") % 100 as "cust_bucket")
      .agg(
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_filled"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_partial"))
    wide.unpivot(
        Array(col("cust_bucket")),
        Array(col("n_open"), col("n_filled"), col("n_partial")),
        "status", "n")
      .orderBy(col("cust_bucket"), col("status"))
  }

  val q55Sql: String =
    """SELECT cust_bucket, status, n FROM (
      |  UNPIVOT (
      |    SELECT o_custkey % 100 AS cust_bucket,
      |      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
      |      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
      |      CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
      |    FROM orders GROUP BY 1
      |  ) ON n_open, n_filled, n_partial INTO NAME status VALUE n
      |) ORDER BY cust_bucket, status""".stripMargin

  // ----------------------------------------------------------------------
  // Gaps-and-islands: longest run of consecutive active days per user.
  // The island key is day_number - row_number (constant within a
  // consecutive run) — two window-free aggregations after one window
  // pass, the standard O(n log n) formulation.
  def q56Streaks(s: SparkSession, dir: String): DataFrame = {
    val days = events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val grouped = days
      .withColumn("grp",
        datediff(col("d"), to_date(lit("1970-01-01"))).cast("long")
          - row_number().over(w))
    grouped.groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("len")).as("n_days"))
      .orderBy(col("user_id"))
  }

  val q56Sql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
      |), num AS (
      |  SELECT user_id,
      |    date_diff('day', DATE '1970-01-01', d)
      |      - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
      |  FROM days
      |), st AS (
      |  SELECT user_id, grp, COUNT(*) AS len FROM num GROUP BY 1, 2
      |)
      |SELECT user_id, MAX(len) AS longest_streak, COUNT(*) AS n_streaks,
      |  CAST(SUM(len) AS BIGINT) AS n_days
      |FROM st GROUP BY user_id ORDER BY user_id""".stripMargin
}
