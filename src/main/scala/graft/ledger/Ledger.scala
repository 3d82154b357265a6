package graft.ledger

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{BatchStats, JobError, JobStats}

/** Job/batch ledger — the reference's three system tables
  * (EtlJobStatistics :511-525, EtlJobError :548-557,
  * EtlBatchJobStatistics :574-588 + resume columns :258-284) as Spark
  * catalog parquet tables.
  *
  * Design: APPEND-ONLY. The reference mutates its batch row in place
  * (`UPDATE … SET FilesProcessed…`, :1628-1633); an in-place update of a
  * distributed table is an anti-pattern, so state transitions append a new
  * version row and readers resolve current state last-wins by
  * `_version_ts` — the same ledger idiom the engine's own upsert teaches.
  * All three tables are tiny relative to data volume (one row per
  * file-job / error / batch transition).
  */
object Ledger {

  val JobStatsTable  = "etl_job_statistics"
  val JobErrorTable  = "etl_job_error"
  val BatchStatsTable = "etl_batch_job_statistics"

  /** Idempotent create-if-missing for the three catalog tables. Holds
    * [[writeLock]] itself (r15 advice): the exists-then-create pair
    * races table creation if two threads run it concurrently, and
    * while today's batch runner only scans outside the parallel
    * window, that invariant was implicit — any future scan from
    * inside a parallel file job would have raced. The lock is
    * reentrant, so the write sinks (which already hold it) are
    * unchanged. */
  def ensureTables(spark: SparkSession): Unit = writeLock.synchronized {
    import spark.implicits._
    def ensure(name: String, empty: => DataFrame): Unit =
      if (!spark.catalog.tableExists(name)) {
        try empty.write.format("parquet").saveAsTable(name)
        catch {
          // catalog lost but warehouse data survived (e.g. in-memory catalog
          // across JVMs): re-attach the existing location as the table
          case e: Exception if Option(e.getMessage).exists(_.contains("LOCATION_ALREADY_EXISTS")) =>
            val loc = spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") + s"/$name"
            val ddlCols = empty.schema.fields
              .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
            spark.sql(s"CREATE TABLE `$name` ($ddlCols) USING parquet LOCATION '$loc'")
        }
      }
    ensure(JobStatsTable,
      Seq.empty[JobStats].toDS.toDF.withColumn("_version_ts", lit(0L)))
    ensure(JobErrorTable, Seq.empty[JobError].toDS.toDF)
    ensure(BatchStatsTable,
      Seq.empty[BatchStats].toDS.toDF.withColumn("_version_ts", lit(0L)))
  }

  // --- sinks (I11-I13) --------------------------------------------------

  /** Serializes ledger appends across driver threads (the parallel
    * batch runner, r15): the rows are single-digit-millisecond writes,
    * but `ensureTables`' exists-then-create and two concurrent appends
    * into ONE catalog table would race — the ledger is the one piece of
    * state every parallel file job shares, so it takes the one lock.
    * Data loads never hold it (the batch runner keeps same-target-table
    * files sequential instead). */
  private val writeLock = new Object

  def writeJobStats(spark: SparkSession, stats: JobStats): Unit =
    writeLock.synchronized {
      import spark.implicits._
      ensureTables(spark)
      Seq(stats).toDS.toDF.withColumn("_version_ts", lit(System.nanoTime()))
        .write.mode(SaveMode.Append).format("parquet").saveAsTable(JobStatsTable)
    }

  def writeErrors(spark: SparkSession, errors: DataFrame): Unit =
    writeLock.synchronized {
      ensureTables(spark)
      val cols = spark.table(JobErrorTable).columns.map(col).toSeq
      errors.select(cols: _*)
        .write.mode(SaveMode.Append).format("parquet").saveAsTable(JobErrorTable)
    }

  def writeBatchStats(spark: SparkSession, b: BatchStats): Unit =
    writeLock.synchronized {
      import spark.implicits._
      ensureTables(spark)
      Seq(b).toDS.toDF.withColumn("_version_ts", lit(System.nanoTime()))
        .write.mode(SaveMode.Append).format("parquet").saveAsTable(BatchStatsTable)
    }

  // --- scans (A7) -------------------------------------------------------

  /** Current batch state: last-wins per BatchJobID over version appends. */
  def currentBatches(spark: SparkSession): DataFrame = {
    ensureTables(spark)
    val w = Window.partitionBy(col("BatchJobID")).orderBy(col("_version_ts").desc)
    spark.table(BatchStatsTable)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "_version_ts")
  }

  def jobStats(spark: SparkSession): DataFrame = {
    ensureTables(spark)
    spark.table(JobStatsTable).drop("_version_ts")
  }

  // --- resume queries (C4/C5/F1) ---------------------------------------

  /** Most recent resumable batch for a directory (reference :186-223):
    * status InProgress/Failed, younger than maxAgeHours, files remaining. */
  def findResumableBatch(spark: SparkSession, inputDir: String, maxAgeHours: Int)
      : Option[BatchStats] = {
    import spark.implicits._
    val cutoff = new java.sql.Timestamp(
      System.currentTimeMillis() - maxAgeHours.toLong * 3600 * 1000)
    currentBatches(spark)
      .filter(col("DirectoryPath") === inputDir &&
        col("BatchStatus").isin("InProgress", "Failed") &&
        col("BatchStartTime") > lit(cutoff) &&
        col("TotalFiles") - col("FilesProcessed") - col("FilesFailed") > 0)
      .orderBy(col("BatchStartTime").desc)
      .limit(1)
      .as[BatchStats]
      .collect()
      .headOption
  }

  /** Files already Completed in a batch (reference get_pending_files
    * :231-251) — feeds the left_anti pending-files filter. */
  def completedFiles(spark: SparkSession, batchJobId: String): DataFrame = {
    ensureTables(spark)
    spark.table(JobStatsTable)
      .filter(col("BatchJobID") === batchJobId &&
        col("JobStatus").isin("Completed", "CompletedWithErrors"))
      .select(col("SourceFile")).distinct()
  }
}
