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
  * document's pack is the window its FIRST token lands in. One window
  * shuffle per group column; everything else is arithmetic on the running
  * sum — no data movement proportional to tokens.
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
    * the greedy contiguous fill of the concat-then-chunk layout. */
  def packAssignments(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, ctxTokens: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    graft.ops.Relational.fanOut(docs)
      .withColumn("__n", size(TextAnalysis.tokens(col(textCol))).cast("long"))
      .withColumn("__cum", sum(col("__n")).over(w))
      .withColumn("pack_id", floor((col("__cum") - col("__n")) / lit(ctxTokens)))
      .drop("__cum")
      .withColumnRenamed("__n", "n_tokens")
  }

  /** Pack-level roll-up: docs per pack, token fill, id span. */
  def packSummary(assignments: DataFrame, idCol: String,
      groupCol: String): DataFrame =
    assignments.groupBy(col(groupCol), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
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
