package graft.load

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Where loaded tables land. The reference's entire purpose is loading
  * files into SQL Server over a driver connection
  * (src/file-to-sql-loader.py:661-694 connect, :989-995 insert); this
  * engine's default target is the Spark catalog (parquet warehouse
  * tables), with the same write surface behind a trait so a JDBC target
  * is a constructor argument, not a rewrite — the same seam pattern as
  * report.ReportSender.
  *
  * The upsert swap (write-next-then-rename) is part of the contract: a
  * concurrent reader sees old-or-new, never partial. */
trait TableSink {
  def write(df: DataFrame, table: String, mode: SaveMode): Unit
  def read(spark: SparkSession, table: String): DataFrame
  def exists(spark: SparkSession, table: String): Boolean
  def drop(spark: SparkSession, table: String): Unit
  /** Atomic-ish publish: `from` must exist; `to` is replaced. */
  def rename(spark: SparkSession, from: String, to: String): Unit
  /** Server-side key-merge capability: sinks that can upsert `staged`
    * into an existing `table` natively (SQL MERGE executed where the
    * data lives) do so and return `Some((inserted, updated))`; the
    * default `None` routes the caller to the generic Spark-side
    * read-merge-swap. */
  def mergeUpsert(spark: SparkSession, staged: DataFrame, table: String,
      pk: Seq[String]): Option[(Long, Long)] = None
}

/** Default sink: managed parquet tables in the session catalog. At
  * production scale this is the lakehouse path (swap = catalog commit). */
object CatalogSink extends TableSink {
  override def write(df: DataFrame, table: String, mode: SaveMode): Unit =
    df.write.mode(mode).format("parquet").saveAsTable(table)
  override def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
  override def exists(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(table)
  override def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
  override def rename(spark: SparkSession, from: String, to: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$to`")
    spark.sql(s"ALTER TABLE `$from` RENAME TO `$to`")
  }
}

/** JDBC sink completing the reference's SQL-Server story
  * (src/file-to-sql-loader.py:661-694, :989-995). Writes go through
  * Spark's built-in JDBC source — executor-parallel batched INSERTs, not
  * the reference's single-connection row loop — and control statements
  * (exists/drop/rename) through one driver-side connection.
  *
  * `dialect` ∈ {"sqlserver", "derby", ansi default} selects the rename
  * form (sp_rename / RENAME TABLE / ALTER TABLE … RENAME TO); drops are
  * existence-guarded instead of IF EXISTS (Derby has none).
  *
  * Integration-tested in LoaderSpec against the embedded Derby that
  * ships with Spark; the SQL-Server path differs only in the rename
  * statement. */
final case class JdbcSink(
    url: String,
    properties: Map[String, String] = Map.empty,
    dialect: String = "sqlserver",
    mergePushdown: Boolean = true) extends TableSink {

  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    properties.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  override def write(df: DataFrame, table: String, mode: SaveMode): Unit =
    df.write.mode(mode).jdbc(url, table, props)

  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.jdbc(url, table, props)

  private def withConnection[A](f: java.sql.Connection => A): A = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  /** Case-robust existence probe: unquoted identifiers are stored
    * upper-case by Derby/ANSI engines and lower-case by others. */
  private def existsOn(conn: java.sql.Connection, table: String): Boolean =
    Seq(table, table.toUpperCase, table.toLowerCase).distinct.exists { t =>
      val rs = conn.getMetaData.getTables(null, null, t, null)
      try rs.next() finally rs.close()
    }

  override def exists(spark: SparkSession, table: String): Boolean =
    withConnection(existsOn(_, table))

  override def drop(spark: SparkSession, table: String): Unit =
    withConnection { conn =>
      if (existsOn(conn, table)) {
        val st = conn.createStatement()
        try st.execute(s"DROP TABLE $table") finally st.close()
      }
    }

  override def rename(spark: SparkSession, from: String, to: String): Unit =
    withConnection { conn =>
      val st = conn.createStatement()
      try {
        if (existsOn(conn, to)) st.execute(s"DROP TABLE $to")
        dialect match {
          case "sqlserver" => st.execute(s"EXEC sp_rename '$from', '$to'")
          case "derby"     => st.execute(s"RENAME TABLE $from TO $to")
          case _           => st.execute(s"ALTER TABLE $from RENAME TO $to")
        }
      } finally st.close()
    }

  /** Server-side MERGE upsert (reference `_generate_merge_sql`,
    * src/file-to-sql-loader.py:1340-1366): stage the batch via the
    * executor-parallel JDBC writer, MERGE on the server, drop the stage.
    * The FULL TARGET NEVER CROSSES THE WIRE — against a real RDBMS this
    * replaces the read-everything / merge-in-Spark / rename-swap round
    * trip, which scales with target size instead of batch size. The
    * updated count is the staged key overlap measured just before the
    * MERGE (same statement connection) via EXISTS — each staged row
    * counts at most once even against a duplicate-key target, so
    * inserted = staged − updated can never go negative.
    *
    * Any server rejection of the pushdown (schema drift the MERGE can't
    * express, a key type the dialect won't compare — e.g. Derby CLOB
    * equality for string pks the JDBC writer created as CLOB) returns
    * None instead of failing the load: the caller's Spark-side
    * read-merge-swap path handles every case the old route did, so
    * enabling pushdown can only ever improve, not regress. */
  override def mergeUpsert(spark: SparkSession, staged: DataFrame, table: String,
      pk: Seq[String]): Option[(Long, Long)] = {
    if (!mergePushdown) return None
    val staging = s"${table}__merge_stage"
    try {
      staged.write.mode(SaveMode.Overwrite).jdbc(url, staging, props)
      val q = graft.analyze.Ddl.jdbcQuote(dialect)
      withConnection { conn =>
        val st = conn.createStatement()
        try {
          def count(sql: String): Long = {
            val rs = st.executeQuery(sql)
            try { rs.next(); rs.getLong(1) } finally rs.close()
          }
          val total = count(s"SELECT COUNT(*) FROM $staging")
          val on = pk.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
          val updated = count(s"SELECT COUNT(*) FROM $staging s WHERE EXISTS " +
            s"(SELECT 1 FROM $table t WHERE $on)")
          st.execute(graft.analyze.Ddl.mergeSql(
            table, staging, staged.columns.toSeq, pk, dialect))
          Some((total - updated, updated))
        } finally st.close()
      }
    } catch {
      case e: java.sql.SQLException =>
        // getMessage can be null (driver-dependent) and linesIterator.next()
        // throws on an empty string — either would turn the fallback handler
        // itself into the failure. Guard both so rejection always degrades
        // to the Spark-side merge.
        val msg = Option(e.getMessage).iterator
          .flatMap(_.linesIterator).find(_.nonEmpty).getOrElse(e.toString)
        System.err.println(s"[graft] MERGE pushdown for $table declined " +
          s"(${e.getSQLState}: $msg); falling back to Spark-side merge")
        None
    } finally drop(spark, staging)
  }
}
