package graft.report

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.core.EngineConfig
import graft.orchestrate.{BatchRunner, ProcessFile}

/** HTML job/batch summaries (reference EmailNotificationManager
  * src/file-to-sql-loader.py:294-469). No SMTP exists offline, so delivery
  * is behind a trait: the capability is report *generation*; the default
  * sender writes the rendered HTML to a file (SURVEY §7.4 note 7). */
trait ReportSender {
  def send(subject: String, htmlBody: String): Unit
}

final class FileReportSender(dir: String) extends ReportSender {
  override def send(subject: String, htmlBody: String): Unit = {
    val d = Paths.get(dir)
    if (!Files.exists(d)) Files.createDirectories(d)
    val safe = subject.replaceAll("[^\\w.-]+", "_").take(120)
    Files.writeString(d.resolve(s"${System.currentTimeMillis()}_$safe.html"), htmlBody)
  }
}

object Report {

  /** Status glyphs match the reference's subject convention (✅/⚠️/❌). */
  def statusGlyph(status: String): String = status match {
    case "Completed" => "✅"
    case "CompletedWithErrors" => "⚠️"
    case _ => "❌"
  }

  def jobSubject(job: ProcessFile.FileJob): String =
    s"${statusGlyph(job.result.status)} ETL Job ${job.result.status}: ${job.sourceFile}"

  def renderJob(job: ProcessFile.FileJob): String = {
    val r = job.result
    s"""<html><body>
       |<h2>${statusGlyph(r.status)} ETL Job Summary</h2>
       |<table border="1" cellpadding="4">
       |<tr><td>Source file</td><td>${job.sourceFile}</td></tr>
       |<tr><td>Target table</td><td>${job.targetTable}</td></tr>
       |<tr><td>Status</td><td>${r.status}</td></tr>
       |<tr><td>Rows read</td><td>${r.rowsRead}</td></tr>
       |<tr><td>Rows inserted</td><td>${r.rowsInserted}</td></tr>
       |<tr><td>Rows updated</td><td>${r.rowsUpdated}</td></tr>
       |<tr><td>Rows errored</td><td>${r.rowsErrored}</td></tr>
       |${r.errorMessage.map(e => s"<tr><td>Error</td><td>$e</td></tr>").getOrElse("")}
       |</table>
       |</body></html>""".stripMargin
  }

  def renderBatch(outcome: BatchRunner.BatchOutcome): String = {
    val rows = outcome.jobs.map { j =>
      s"<tr><td>${j.sourceFile}</td><td>${j.targetTable}</td><td>${j.result.status}</td>" +
        s"<td>${j.result.rowsInserted}</td><td>${j.result.rowsUpdated}</td>" +
        s"<td>${j.result.rowsErrored}</td>" +
        s"<td>${j.result.errorMessage.getOrElse("")}</td></tr>"
    }.mkString("\n")
    // per-file error details (reference email body's "Error Details"
    // section, src/file-to-sql-loader.py:406-414) so a failed batch is
    // debuggable from the report alone, without opening the ledger
    val failed = outcome.jobs.filter(_.result.errorMessage.isDefined)
    val errorSection =
      if (failed.isEmpty) ""
      else {
        val items = failed.map { j =>
          s"<p><strong>${j.sourceFile}</strong> (job ${j.jobRunId}):</p>" +
            s"<pre>${j.result.errorMessage.get}</pre>"
        }.mkString("\n")
        s"\n<h3>Error Details</h3>\n$items"
      }
    s"""<html><body>
       |<h2>${statusGlyph(outcome.status)} ETL Batch Summary</h2>
       |<p>Batch ${outcome.batchJobId}: ${outcome.status} —
       |${outcome.processed}/${outcome.totalFiles} processed, ${outcome.failed} failed.</p>
       |<table border="1" cellpadding="4">
       |<tr><th>File</th><th>Table</th><th>Status</th><th>Inserted</th><th>Updated</th><th>Errored</th><th>Error</th></tr>
       |$rows
       |</table>$errorSection
       |</body></html>""".stripMargin
  }

  def writeJobReport(spark: SparkSession, job: ProcessFile.FileJob,
      config: EngineConfig, sender: Option[ReportSender] = None): Unit = {
    val s = sender.getOrElse(new FileReportSender(config.emailReportDir))
    s.send(jobSubject(job), renderJob(job))
  }

  def writeBatchReport(spark: SparkSession, outcome: BatchRunner.BatchOutcome,
      config: EngineConfig, sender: Option[ReportSender] = None): Unit = {
    val s = sender.getOrElse(new FileReportSender(config.emailReportDir))
    val subject = s"${statusGlyph(outcome.status)} ETL Batch ${outcome.status}: " +
      s"${outcome.processed}/${outcome.totalFiles} files"
    s.send(subject, renderBatch(outcome))
  }
}
