package graft.load

import org.apache.spark.sql.{DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** The four table modes × two transaction modes as DataFrame programs
  * (reference dispatch src/file-to-sql-loader.py:947-963; strict insert
  * :965-1012; tolerant insert :1014-1068; upserts :1169-1270).
  *
  * Semantic restatement (SURVEY §7.4 note 1): the reference aborts a
  * tolerant load after the first `maxRowErrors` failures in file order and
  * rolls back. Order-dependence doesn't survive distribution; here the
  * budget check is `invalidCount > maxRowErrors` over the whole file —
  * deterministic, order-free, and identical on every test the reference
  * ships.
  */
object Loader {

  /** Validity split: `good` rows satisfy all NOT NULL constraints after
    * casting; `bad` rows violate at least one. */
  def split(castDf: DataFrame, notNull: Seq[String]): (DataFrame, DataFrame) = {
    if (notNull.isEmpty) (castDf, castDf.limit(0))
    else {
      val ok = notNull.foldLeft(lit(true))((acc, c) => acc && col(c).isNotNull)
      (castDf.filter(ok), castDf.filter(!ok))
    }
  }

  /** Existing-table handling (reference handle_existing_table :908-926). */
  def prepareTable(spark: SparkSession, table: String, mode: TableMode,
      sink: TableSink = CatalogSink): Unit = mode match {
    case TableMode.DropRecreate => sink.drop(spark, table)
    case TableMode.Fail =>
      if (sink.exists(spark, table))
        throw new IllegalStateException(s"table $table already exists (table_mode=fail)")
    case TableMode.Append | TableMode.Upsert => ()
  }

  private def saveModeFor(mode: TableMode): SaveMode = mode match {
    case TableMode.Append => SaveMode.Append
    case _ => SaveMode.Overwrite
  }

  /** Strict insert (I6): any invalid row ⇒ whole file rejected. The
    * existence probe is a limit-1 job, not a full count; the inserted-row
    * count is observed DURING the write job (no second scan). */
  def loadStrict(spark: SparkSession, good: DataFrame, bad: DataFrame, table: String,
      mode: TableMode, sink: TableSink = CatalogSink): LoadResult = {
    if (!bad.isEmpty)
      return LoadResult("Failed", -1, 0, 0, -1,
        Some("validation failed in strict mode: at least one invalid row"))
    val obs = Observation()
    sink.write(good.observe(obs, count(lit(1)).as("n")), table, saveModeFor(mode))
    val rows = obs.get("n").asInstanceOf[Long]
    LoadResult("Completed", rows, rows, 0, 0)
  }

  /** Tolerant insert (I7): load valid rows, reject only when the invalid
    * count blows the budget. The bad side is counted up front (it gates
    * the write); the good side is observed during the write. */
  def loadTolerant(spark: SparkSession, good: DataFrame, bad: DataFrame, table: String,
      mode: TableMode, maxRowErrors: Int, sink: TableSink = CatalogSink): LoadResult = {
    val nBad = bad.count()
    if (nBad > maxRowErrors)
      return LoadResult("Failed", -1, 0, 0, nBad,
        Some(s"row errors $nBad exceed budget $maxRowErrors"))
    val obs = Observation()
    sink.write(good.observe(obs, count(lit(1)).as("n")), table, saveModeFor(mode))
    val nGood = obs.get("n").asInstanceOf[Long]
    val status = if (nBad > 0) "CompletedWithErrors" else "Completed"
    LoadResult(status, nGood + nBad, nGood, 0, nBad)
  }

  /** Upsert (I8/I9): dedup-last-wins → full-outer merge → write-temp → swap.
    * Insert/update counts are observed during the single merge write.
    * The temp-table + rename swap stands in for an atomic catalog commit
    * (MERGE INTO on a lakehouse table format at production scale —
    * SURVEY §7.4 note 4). */
  def loadUpsert(spark: SparkSession, source: DataFrame, badRows: DataFrame, table: String,
      pk: Seq[String], ordinalCol: String, strict: Boolean, maxRowErrors: Int,
      sink: TableSink = CatalogSink): LoadResult = {
    val nBad = badRows.count()
    if (strict && nBad > 0)
      return LoadResult("Failed", -1, 0, 0, nBad,
        Some("validation failed in strict mode: at least one invalid row"))
    if (!strict && nBad > maxRowErrors)
      return LoadResult("Failed", -1, 0, 0, nBad,
        Some(s"row errors $nBad exceed budget $maxRowErrors"))

    val deduped = Upsert.dedupLastWins(source, pk, ordinalCol)
    val status = if (nBad > 0) "CompletedWithErrors" else "Completed"

    if (!sink.exists(spark, table)) {
      // no target yet: the merge degenerates to insert-all
      val obs = Observation()
      sink.write(deduped.observe(obs, count(lit(1)).as("n")), table, SaveMode.Overwrite)
      val n = obs.get("n").asInstanceOf[Long]
      return LoadResult(status, n + nBad, n, 0, nBad)
    }

    // sinks with a native server-side merge (JDBC MERGE pushdown) take it:
    // the full target never crosses the wire, work scales with the batch
    sink.mergeUpsert(spark, deduped, table, pk) match {
      case Some((inserted, updated)) =>
        return LoadResult(status, inserted + updated + nBad, inserted, updated, nBad)
      case None => ()
    }

    // insert/update counts are observed DURING the single merge write —
    // no extra key-join count jobs, no second scan of target or source
    val target = sink.read(spark, table)
    val next = s"${table}__upsert_next"
    val obs = Observation()
    sink.write(
      Upsert.merge(target, deduped, pk)
        .observe(obs,
          sum(when(col("__merge_action") === "inserted", 1L).otherwise(0L)).as("ins"),
          sum(when(col("__merge_action") === "updated", 1L).otherwise(0L)).as("upd"))
        .drop("__merge_action"),
      next, SaveMode.Overwrite)
    val inserted = Option(obs.get("ins")).map(_.asInstanceOf[Long]).getOrElse(0L)
    val updated = Option(obs.get("upd")).map(_.asInstanceOf[Long]).getOrElse(0L)
    sink.rename(spark, next, table)
    LoadResult(status, inserted + updated + nBad, inserted, updated, nBad)
  }
}
