package graft.core

import java.nio.file.{Files, Paths}
import org.yaml.snakeyaml.Yaml
import scala.jdk.CollectionConverters._

/** Engine configuration — mirrors the reference's YAML surface
  * (`src/loader_config.yaml:1-75` + upsert keys from
  * `test/test_upsert_config.yaml:10-19`), loaded with snakeyaml (present in
  * /opt/spark/jars). Unknown keys are ignored; absent keys take the
  * reference's defaults. */
final case class TableOverride(
    overrideTableName: Option[String],
    primaryKeyColumns: Seq[String],
    disputedColumns: Map[String, Int]) // column -> max_length override (:806-811)

final case class EngineConfig(
    // database.* — the catalog the engine writes to (warehouse dir here)
    warehouseDir: String,
    database: String,
    // loader.*
    tableMode: TableMode,
    transactionMode: TransactionMode,
    maxRowErrors: Int,          // loader.max-row-errors, default 100 (:489)
    maxRetries: Int,            // loader.max_retries, default 1 (:1579)
    // ddl.*
    notNullColumns: Map[String, Seq[String]], // table -> columns (:871-875)
    // job_statistics.* / error_logging.*
    jobStatisticsEnabled: Boolean,
    errorLoggingEnabled: Boolean,
    // batch_processing.* (:46-50)
    checkpointEnabled: Boolean,
    resumeIncompleteBatches: Boolean,
    maxResumeAgeHours: Int,
    /** batch_processing.parallelism (beyond-reference, r14 verdict #8):
      * how many TARGET TABLES the batch runner drives concurrently. The
      * reference's per-file driver loop is sequential (:1517-1659); at
      * 1 (the default) this engine is too. Above 1, pending files are
      * grouped by their target table (a pure function of path + config,
      * so the grouping is decidable up front) and groups run on a
      * bounded pool — files of ONE table stay strictly sequential in
      * listing order, so every single-table semantic (drop_recreate
      * ordering, append order, retry/quarantine, per-file ledger rows)
      * is byte-for-byte the sequential behavior; only independent
      * tables overlap. */
    batchParallelism: Int,
    // tables.<name>.*
    tables: Map[String, TableOverride],
    // upsert defaults (test_upsert_config.yaml:17)
    defaultPrimaryKeyColumns: Seq[String],
    // email_notifications.* — report rendering only (no SMTP offline)
    emailEnabled: Boolean,
    emailReportDir: String) {

  def overridesFor(table: String): TableOverride =
    tables.getOrElse(table, TableOverride(None, defaultPrimaryKeyColumns, Map.empty))

  def primaryKeyFor(table: String): Seq[String] = {
    val o = overridesFor(table)
    if (o.primaryKeyColumns.nonEmpty) o.primaryKeyColumns else defaultPrimaryKeyColumns
  }
}

object EngineConfig {

  val default: EngineConfig = EngineConfig(
    warehouseDir = "spark-warehouse",
    database = "default",
    tableMode = TableMode.DropRecreate,
    transactionMode = TransactionMode.Strict,
    maxRowErrors = 100,
    maxRetries = 1,
    notNullColumns = Map.empty,
    jobStatisticsEnabled = true,
    errorLoggingEnabled = true,
    checkpointEnabled = true,
    resumeIncompleteBatches = true,
    maxResumeAgeHours = 24,
    batchParallelism = 1,
    tables = Map.empty,
    defaultPrimaryKeyColumns = Seq("id"),
    emailEnabled = false,
    emailReportDir = "reports")

  def load(path: String): EngineConfig = {
    val text = Files.readString(Paths.get(path))
    fromYaml(text)
  }

  def fromYaml(text: String): EngineConfig = {
    val root = Option(new Yaml().load[java.util.Map[String, Object]](text))
      .map(_.asScala.toMap).getOrElse(Map.empty[String, Object])

    def section(name: String): Map[String, Object] = root.get(name) match {
      case Some(m: java.util.Map[_, _]) =>
        m.asScala.toMap.map { case (k, v) => k.toString -> v.asInstanceOf[Object] }
      case _ => Map.empty
    }
    def str(m: Map[String, Object], k: String, d: String): String =
      m.get(k).map(_.toString).getOrElse(d)
    def int(m: Map[String, Object], k: String, d: Int): Int =
      m.get(k).map(_.toString.toInt).getOrElse(d)
    def bool(m: Map[String, Object], k: String, d: Boolean): Boolean =
      m.get(k).map(_.toString.toBoolean).getOrElse(d)
    def strList(v: Object): Seq[String] = v match {
      case l: java.util.List[_] => l.asScala.map(_.toString).toSeq
      case s => Seq(s.toString)
    }

    val db = section("database")
    val loader = section("loader")
    val ddl = section("ddl")
    val stats = section("job_statistics")
    val errs = section("error_logging")
    val batch = section("batch_processing")
    val email = section("email_notifications")
    val upsert = section("upsert")

    val notNull: Map[String, Seq[String]] = ddl.get("not_null_columns") match {
      case Some(m: java.util.Map[_, _]) =>
        m.asScala.toMap.map { case (k, v) => k.toString -> strList(v.asInstanceOf[Object]) }
      case _ => Map.empty
    }

    val tables: Map[String, TableOverride] = root.get("tables") match {
      case Some(m: java.util.Map[_, _]) =>
        m.asScala.toMap.map { case (tname, tv) =>
          val tm = tv.asInstanceOf[java.util.Map[String, Object]].asScala.toMap
          val disputed: Map[String, Int] = tm.get("disputed_columns") match {
            case Some(dm: java.util.Map[_, _]) =>
              dm.asScala.toMap.map { case (c, spec) =>
                val sm = spec.asInstanceOf[java.util.Map[String, Object]].asScala
                c.toString -> sm.get("max_length").map(_.toString.toInt).getOrElse(255)
              }
            case _ => Map.empty
          }
          tname.toString -> TableOverride(
            overrideTableName = tm.get("override_table_name").map(_.toString),
            primaryKeyColumns = tm.get("primary_key_columns").map(strList).getOrElse(Nil),
            disputedColumns = disputed)
        }
      case _ => Map.empty
    }

    EngineConfig(
      warehouseDir = str(db, "warehouse_dir", default.warehouseDir),
      database = str(db, "database", default.database),
      tableMode = TableMode.fromName(str(loader, "table_mode", "drop_recreate")),
      transactionMode = TransactionMode.fromName(str(loader, "transaction_mode", "strict")),
      maxRowErrors = int(loader, "max-row-errors", default.maxRowErrors),
      maxRetries = int(loader, "max_retries", default.maxRetries),
      notNullColumns = notNull,
      jobStatisticsEnabled = bool(stats, "enabled", default.jobStatisticsEnabled),
      errorLoggingEnabled = bool(errs, "enabled", default.errorLoggingEnabled),
      checkpointEnabled = bool(batch, "enable_checkpointing", default.checkpointEnabled),
      resumeIncompleteBatches = bool(batch, "resume_incomplete_batches", default.resumeIncompleteBatches),
      maxResumeAgeHours = int(batch, "max_resume_age_hours", default.maxResumeAgeHours),
      batchParallelism = int(batch, "parallelism", default.batchParallelism),
      tables = tables,
      defaultPrimaryKeyColumns =
        upsert.get("primary_key_columns").map(strList).getOrElse(default.defaultPrimaryKeyColumns),
      emailEnabled = bool(email, "enabled", default.emailEnabled),
      emailReportDir = str(email, "report_dir", default.emailReportDir))
  }
}
