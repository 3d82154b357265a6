package graft.analyze

import graft.core.InferredType

/** Table-name normalization + DDL rendering (SURVEY §2 B6 / I1).
  *
  * Name derivation (reference src/file-to-sql-loader.py:855-866):
  * strip extension, strip a trailing `_\d{3,}` batch suffix, squash
  * non-word chars to `_`, prefix `t_` if it starts with a digit.
  *
  * The DDL renderer produces SQL-Server-dialect (bracket-quoted) or
  * SQLite/ANSI (bare) text for audit/compat parity (reference
  * `generate_ddl` :868-893); the engine's actual tables are Spark catalog
  * parquet tables created from the same column list.
  */
object Ddl {

  sealed trait Dialect
  case object SqlServer extends Dialect
  case object Sqlite    extends Dialect

  def tableName(filePath: String): String = {
    val base = filePath.split('/').last
    val stem = base.lastIndexOf('.') match {
      case -1 => base
      case i  => base.substring(0, i)
    }
    val noBatch = stem.replaceAll("_\\d{3,}$", "")
    val words = noBatch.replaceAll("[^\\w]", "_")
    if (words.headOption.exists(_.isDigit)) "t_" + words else words
  }

  def render(table: String, columns: Seq[(String, InferredType, Boolean)],
      dialect: Dialect = SqlServer): String = {
    def q(ident: String): String = dialect match {
      case SqlServer => s"[$ident]"
      case Sqlite    => ident
    }
    val colDefs = columns.map { case (name, t, nullable) =>
      val nullClause = if (nullable) "NULL" else "NOT NULL"
      s"    ${q(name)} ${t.sqlServerType} $nullClause"
    }
    s"CREATE TABLE ${q(table)} (\n${colDefs.mkString(",\n")}\n)"
  }

  /** Identifier quoting for server-side JDBC statements, keyed by the
    * JdbcSink dialect string: SQL Server brackets (reference style);
    * everything else ANSI double quotes — matching how Spark's JDBC
    * writer quotes the column identifiers it creates, so generated
    * statements resolve the same case-sensitive names. */
  def jdbcQuote(dialect: String): String => String =
    if (dialect == "sqlserver") c => s"[$c]" else c => "\"" + c + "\""

  /** Server-side upsert statement (reference `_generate_merge_sql`,
    * src/file-to-sql-loader.py:1340-1366): MERGE the staged batch into
    * the target keyed on `pk`, updating non-key columns on match and
    * inserting the full row otherwise. When every column is a key the
    * WHEN MATCHED clause is omitted (nothing to update — Derby rejects an
    * empty SET list). Table names stay unquoted, matching JdbcSink's
    * control statements; SQL Server requires the terminating semicolon. */
  def mergeSql(target: String, staging: String, cols: Seq[String],
      pk: Seq[String], dialect: String = "sqlserver"): String = {
    require(pk.nonEmpty && pk.forall(cols.contains), s"pk $pk must be ⊆ cols $cols")
    val q = jdbcQuote(dialect)
    val on = pk.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
    val nonKey = cols.filterNot(pk.contains)
    val update =
      if (nonKey.isEmpty) ""
      else "\nWHEN MATCHED THEN UPDATE SET " +
        nonKey.map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
    val terminator = if (dialect == "sqlserver") ";" else ""
    s"MERGE INTO $target t USING $staging s ON ($on)$update\n" +
      s"WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(", ")}) " +
      s"VALUES (${cols.map(c => s"s.${q(c)}").mkString(", ")})$terminator"
  }

  /** The engine-side DDL: a Spark catalog parquet table. */
  def sparkDdl(table: String, columns: Seq[(String, InferredType, Boolean)]): String = {
    val colDefs = columns.map { case (name, t, nullable) =>
      val nn = if (nullable) "" else " NOT NULL"
      s"  `$name` ${t.sparkType.sql}$nn"
    }
    s"CREATE TABLE `$table` (\n${colDefs.mkString(",\n")}\n) USING parquet"
  }
}
