package graft

import java.nio.file.Files
import graft.core._
import graft.orchestrate.ProcessFile
import graft.ledger.Ledger
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The remaining reference behavioral contracts (SURVEY §5.1 /
  * FIXTURES.md): date-format suite fixtures and the upsert suite's
  * NULL / unicode / boundary / multi-format / strict-rollback / statistics
  * cases, recreated as fixtures and run through the real pipeline. */
class DateFormatContractSpec extends GraftSuite {

  private def load(name: String, content: String): (ProcessFile.FileJob, String) = {
    val dir = tempDir("dates")
    val f = writeFile(dir, name, content)
    val job = ProcessFile.run(spark, f, EngineConfig.default)
    (job, job.targetTable)
  }

  test("US format dates (MM/dd/yyyy) infer DATETIME2") {
    val csv =
      """id,employee_name,hire_date,review_date,last_update
        |1,Sarah Johnson,03/15/2020,03/15/2024 02:30:15,12/25/2023
        |2,Mike Chen,07/04/2019,07/04/2024 11:45:30,11/30/2023
        |""".stripMargin
    val (job, table) = load("dates_us_format.csv", csv)
    assert(job.result.status == "Completed")
    val t = spark.table(table)
    assert(t.schema("hire_date").dataType == TimestampType)
    assert(t.schema("review_date").dataType == TimestampType)
    assert(t.schema("last_update").dataType == TimestampType)
    val hd = t.filter(col("id") === 1).select("hire_date").head().getTimestamp(0)
    assert(hd.toString.startsWith("2020-03-15"))
  }

  test("European dd/MM/yyyy stays string but round-trips non-null") {
    val csv =
      """id,customer_name,registration_date,last_order_date,next_contact
        |1,Alessandro Rossi,15/03/2023,15/03/2024 14:30:15,25/12/2024
        |2,Marie Dubois,20/06/2022,20/06/2024 09:15:45,14/07/2025
        |""".stripMargin
    val (job, table) = load("dates_european_format.csv", csv)
    assert(job.result.status == "Completed")
    val t = spark.table(table)
    assert(t.schema("registration_date").dataType == StringType)
    assert(t.filter(col("registration_date").isNull).count() == 0)
    assert(t.filter(col("id") === 1).select("registration_date").head().getString(0) == "15/03/2023")
  }

  test("mixed separators: per-column outcomes (ISO->ts, dots->string, US->ts)") {
    val csv =
      """id,transaction_date,due_date,payment_date,created_timestamp
        |1,2024-01-15,15.01.2024,01/15/2024,2024-01-15 10:30:00
        |2,2024-02-20,20.02.2024,02/20/2024,2024-02-20 14:45:30
        |""".stripMargin
    val (job, table) = load("dates_mixed_separators.csv", csv)
    assert(job.result.status == "Completed")
    val t = spark.table(table)
    assert(t.schema("transaction_date").dataType == TimestampType)
    assert(t.schema("due_date").dataType == StringType)       // dot separator unsupported
    assert(t.schema("payment_date").dataType == TimestampType)
    assert(t.schema("created_timestamp").dataType == TimestampType)
  }

  test("edge cases: leap day, historical and future dates parse") {
    val csv =
      """id,description,test_date,notes
        |1,Leap Year Feb 29,2024-02-29,Valid leap year date
        |2,Historical,1900-01-15,19th century adjacent
        |3,Future,2050-12-31,far future
        |4,Month end,2024-04-30,end of April
        |""".stripMargin
    val (job, table) = load("dates_edge_cases.csv", csv)
    assert(job.result.status == "Completed")
    val t = spark.table(table)
    assert(t.schema("test_date").dataType == TimestampType)
    assert(t.filter(col("test_date").isNull).count() == 0)
    val leap = t.filter(col("id") === 1).select("test_date").head().getTimestamp(0)
    assert(leap.toString.startsWith("2024-02-29"))
  }

  test("invalid dates degrade the column to string without crashing") {
    val csv =
      """id,description,invalid_date,expected_behavior
        |1,Invalid Month,2024-13-15,Should handle gracefully
        |2,Invalid Day,2024-02-30,Should handle gracefully
        |3,Non-leap Feb29,2023-02-29,Should handle gracefully
        |4,Malformed,not-a-date,Should handle gracefully
        |5,Empty,,Should handle gracefully
        |""".stripMargin
    val (job, table) = load("dates_invalid_formats.csv", csv)
    assert(job.result.status == "Completed")
    val t = spark.table(table)
    assert(t.schema("invalid_date").dataType == StringType)
    assert(t.count() == 5)
    // the empty cell is a true NULL, the malformed strings survive verbatim
    assert(t.filter(col("invalid_date").isNull).count() == 1)
    assert(t.filter(col("invalid_date") === "2024-13-15").count() == 1)
  }
}

class UpsertContractSpec extends GraftSuite {

  private val table = "upsert_contract"
  private def cfg(strict: Boolean = false) = EngineConfig.default.copy(
    tableMode = TableMode.Upsert,
    transactionMode = if (strict) TransactionMode.Strict else TransactionMode.Tolerant,
    tables = Map(table -> TableOverride(Some(table), Seq("id"), Map.empty)))

  private def seed(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val dir = tempDir("ups_seed")
    val f = writeFile(dir, s"$table.csv",
      """id,name,email,age,department,salary,created_date,is_active
        |1,John Doe,john@example.com,30,IT,50000,2023-01-15,true
        |2,Jane Roe,jane@example.com,25,HR,45000,2023-02-20,true
        |3,Max Mustermann,max@example.com,41,OPS,61000,2023-03-25,false
        |""".stripMargin)
    assert(ProcessFile.run(spark, f, cfg()).result.status == "Completed")
  }

  private def upsert(content: String, strict: Boolean = false): ProcessFile.FileJob = {
    val dir = tempDir("ups_file")
    val f = writeFile(dir, s"$table.csv", content)
    ProcessFile.run(spark, f, cfg(strict))
  }

  test("NULL values: explicit empty cells set columns to NULL") {
    seed()
    val job = upsert(
      """id,name,email,age,department
        |2,Jane Roe,,,Finance
        |""".stripMargin)
    assert(job.result.status == "Completed" && job.result.rowsUpdated == 1)
    val r = spark.table(table).filter(col("id") === 2).head()
    assert(r.getAs[Any]("email") == null)
    assert(r.getAs[Any]("age") == null)
    assert(r.getAs[String]("department") == "Finance")
    // columns absent from the update file keep their target values
    assert(r.getAs[Any]("created_date") != null)
  }

  test("unicode: CJK / Cyrillic / Arabic / accented text survives the round trip") {
    seed()
    val job = upsert(
      """id,name,email,age,department,salary,created_date,is_active
        |1,山田太郎,yamada@example.com,30,IT,50000,2023-01-15,true
        |4,Алексей Иванов,alexei@example.com,35,R&D,70000,2023-04-01,true
        |5,أحمد محمد,ahmed@example.com,28,QA,52000,2023-05-10,true
        |6,José García-Müller,jose@example.com,44,IT,58000,2023-06-15,false
        |""".stripMargin)
    assert(job.result.status == "Completed")
    assert(job.result.rowsUpdated == 1 && job.result.rowsInserted == 3)
    val names = spark.table(table).orderBy("id").collect().map(_.getAs[String]("name"))
    assert(names.contains("山田太郎"))
    assert(names.contains("Алексей Иванов"))
    assert(names.contains("أحمد محمد"))
    assert(names.contains("José García-Müller"))
  }

  test("boundary values: long names, age extremes, salary range, date range") {
    seed()
    val longName = "N" * 255
    val job = upsert(
      s"""id,name,age,salary,created_date,is_active
         |7,$longName,0,0.01,1900-01-01,true
         |8,Min Max,150,999999.99,2099-12-31,false
         |""".stripMargin)
    assert(job.result.status == "Completed" && job.result.rowsInserted == 2)
    val t = spark.table(table)
    assert(t.filter(col("id") === 7).head().getAs[String]("name").length == 255)
    assert(t.filter(col("id") === 8).head().getAs[java.math.BigDecimal]("salary")
      .doubleValue() == 999999.99)
  }

  test("multi-format: CSV + JSON + PSV land in ONE table via override_table_name") {
    seed()
    val dir = tempDir("ups_multi")
    val conf = EngineConfig.default.copy(
      tableMode = TableMode.Upsert, transactionMode = TransactionMode.Tolerant,
      tables = Map(
        "multi_csv" -> TableOverride(Some(table), Seq("id"), Map.empty),
        "multi_json" -> TableOverride(Some(table), Seq("id"), Map.empty),
        "multi_psv" -> TableOverride(Some(table), Seq("id"), Map.empty)))
    val f1 = writeFile(dir, "multi_csv.csv",
      "id,name,email,age,department,salary,created_date,is_active\n10,Csv Person,c@x.com,20,IT,1000,2023-01-01,true\n")
    val f2 = writeFile(dir, "multi_json.json",
      """[{"id": 11, "name": "Json Person", "email": "j@x.com", "age": 21, "department": "HR", "salary": 2000, "created_date": "2023-01-02", "is_active": false}]""")
    val f3 = writeFile(dir, "multi_psv.psv",
      "id|name|email|age|department|salary|created_date|is_active\n12|Psv Person|p@x.com|22|OPS|3000|2023-01-03|true\n")
    assert(ProcessFile.run(spark, f1, conf).result.status == "Completed")
    assert(ProcessFile.run(spark, f2, conf).result.status == "Completed")
    assert(ProcessFile.run(spark, f3, conf).result.status == "Completed")
    val t = spark.table(table)
    assert(t.filter(col("id").isin(10, 11, 12)).count() == 3)
    assert(t.filter(col("id") === 11).head().getAs[String]("name") == "Json Person")
  }

  test("strict rollback: one invalid row rejects the whole file, target untouched") {
    seed()
    val before = spark.table(table).orderBy("id").collect().toSeq
    val conf = cfg(strict = true).copy(notNullColumns = Map(table -> Seq("id")))
    val dir = tempDir("ups_strict")
    val f = writeFile(dir, s"$table.csv",
      """id,name,email,age,department,salary,created_date,is_active
        |2,Should Not Apply,x@x.com,99,XX,1,2023-01-01,true
        |,Missing Id,y@y.com,30,YY,2,2023-01-02,false
        |""".stripMargin)
    val job = ProcessFile.run(spark, f, conf)
    assert(job.result.status == "Failed")
    val after = spark.table(table).orderBy("id").collect().toSeq
    assert(before == after) // nothing applied
    assert(Files.exists(dir.resolve(s"error/$table.csv"))) // quarantined
  }

  test("statistics counters: RowsRead/Inserted/Updated recorded in the ledger") {
    seed()
    val job = upsert(
      """id,name,email,age,department,salary,created_date,is_active
        |1,John Doe Jr,john@example.com,31,IT,51000,2023-01-15,true
        |2,Jane Roe II,jane@example.com,26,HR,46000,2023-02-20,true
        |20,Newbie One,n1@example.com,22,IT,40000,2024-01-01,true
        |21,Newbie Two,n2@example.com,23,IT,41000,2024-01-02,true
        |21,Newbie Two B,n2b@example.com,24,IT,42000,2024-01-03,true
        |""".stripMargin)
    assert(job.result.status == "Completed")
    assert(job.result.rowsUpdated == 2)
    assert(job.result.rowsInserted == 2)   // 21 deduped last-wins before insert
    val stats = Ledger.jobStats(spark)
      .filter(col("JobRunID") === job.jobRunId).head()
    assert(stats.getAs[Long]("RowsUpdated") == 2)
    assert(stats.getAs[Long]("RowsInserted") == 2)
    assert(stats.getAs[String]("TableMode") == "upsert")
    // last-wins applied for the duplicate id
    assert(spark.table(table).filter(col("id") === 21).head()
      .getAs[String]("name") == "Newbie Two B")
  }

  test("1500-row upsert (500 updates + 1000 inserts) completes well under the 300s budget") {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val seedRows = (1 to 1000).map(i =>
      s"$i,Person $i,p$i@example.com,${20 + i % 50},D${i % 5},${1000 + i},2023-01-01,true")
    val dirS = tempDir("ups_large_seed")
    val fs = writeFile(dirS, s"$table.csv",
      "id,name,email,age,department,salary,created_date,is_active\n" + seedRows.mkString("\n") + "\n")
    assert(ProcessFile.run(spark, fs, cfg()).result.status == "Completed")

    val upRows = (501 to 2000).map(i =>
      s"$i,Person $i v2,p$i@example.com,${21 + i % 50},D${i % 7},${2000 + i},2023-06-01,false")
    val dirU = tempDir("ups_large")
    val fu = writeFile(dirU, s"$table.csv",
      "id,name,email,age,department,salary,created_date,is_active\n" + upRows.mkString("\n") + "\n")
    val t0 = System.nanoTime()
    val job = ProcessFile.run(spark, fu, cfg())
    val secs = (System.nanoTime() - t0) / 1e9
    assert(job.result.status == "Completed")
    assert(job.result.rowsUpdated == 500 && job.result.rowsInserted == 1000)
    assert(spark.table(table).count() == 2000)
    assert(secs < 300, s"took $secs s") // reference budget; typical run ~ seconds
  }
}
