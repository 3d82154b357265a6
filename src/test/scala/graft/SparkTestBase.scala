package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** Shared local SparkSession for all suites (one JVM-wide session; suites
  * run sequentially under sbt's default test execution). */
object SparkTestBase {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      Files.createTempDirectory("graft-warehouse").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

abstract class GraftSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark

  def tempDir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  def writeFile(dir: Path, name: String, content: String): String = {
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  /** dates_iso_format.csv fixture (FIXTURES.md §1) — 10 rows. */
  val datesIsoCsv: String =
    """id,name,birth_date,created_date,last_login
      |1,John Doe,1985-03-15,2024-01-01,2024-01-15 10:30:00
      |2,Jane Smith,1990-07-22,2024-01-02,2024-01-16 14:45:30
      |3,Bob Johnson,1978-11-08,2024-01-03,2024-01-17 09:15:45
      |4,Alice Brown,1995-02-28,2024-01-04,2024-01-18 16:20:10
      |5,Charlie Wilson,1982-09-14,2024-01-05,2024-01-19 11:05:25
      |6,Diana Lee,1988-12-03,2024-01-06,2024-01-20 13:40:55
      |7,Frank Miller,1975-06-18,2024-01-07,2024-01-21 08:25:15
      |8,Grace Taylor,1992-04-09,2024-01-08,2024-01-22 15:50:40
      |9,Henry Davis,1980-10-27,2024-01-09,2024-01-23 12:35:20
      |10,Ivy Anderson,1987-01-31,2024-01-10,2024-01-24 17:10:05
      |""".stripMargin

  /** dates_psv_format.psv fixture — pipe-delimited, dd/MM/yyyy expiry stays
    * string (pattern intentionally unsupported). */
  val datesPsv: String =
    """id|account_name|account_created|last_transaction|expiry_date
      |1|Premium Account|2020-03-15|2024-01-15 10:30:00|31/12/2025
      |2|Standard Account|2021-06-20|2024-01-16 11:45:15|30/06/2025
      |3|Basic Account|2022-09-10|2024-01-17 14:20:30|31/03/2026
      |""".stripMargin

  /** dates_json_format.json fixture — array-of-records. */
  val datesJson: String =
    """[
      |  {"id": 1, "name": "Alpha", "birth_date": "1985-03-15", "created_at": "2024-01-01T08:00:00", "last_login": "2024-01-15 10:30:00"},
      |  {"id": 2, "name": "Beta", "birth_date": "1990-07-22", "created_at": "2024-01-02T09:30:00", "last_login": "2024-01-16 14:45:30"},
      |  {"id": 3, "name": "Gamma", "birth_date": "1978-11-08", "created_at": "2024-01-03T10:45:00", "last_login": "2024-01-17 09:15:45"}
      |]""".stripMargin

  /** upsert initial/update fixtures (FIXTURES.md §2 canonical schema subset). */
  val upsertInitialCsv: String =
    """id,name,email,age,salary
      |1,Alice,alice@x.com,30,1000.50
      |2,Bob,bob@x.com,40,2000.75
      |3,Carol,carol@x.com,50,3000.00
      |""".stripMargin

  val upsertUpdateCsv: String =
    """id,name,email,age,salary
      |2,Bobby,bobby@x.com,41,2100.00
      |3,Carol,carol@y.com,50,3000.00
      |4,Dave,dave@x.com,25,1500.25
      |4,Dave II,dave2@x.com,26,1600.25
      |""".stripMargin
}
