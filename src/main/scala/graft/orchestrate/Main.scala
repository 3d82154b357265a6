package graft.orchestrate

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.core.EngineConfig
import graft.report.Report

/** CLI (reference `main()` src/file-to-sql-loader.py:1503-1515 + shell
  * wrapper arg surface run-file-to-sql-loader.sh:44-85):
  * `graft.orchestrate.Main <input_path> [--config f] [--file|--directory]
  * [--setup-only] [-v]`. A file argument runs the single-file job; a
  * directory runs the checkpointed batch; `--setup-only` just provisions
  * the ledger tables. Exit code 1 on failure (reference :1686-1687). */
object Main {

  final case class CliArgs(
      input: Option[String], config: Option[String], forceFile: Boolean,
      forceDir: Boolean, setupOnly: Boolean, verbose: Boolean)

  def main(args: Array[String]): Unit = {
    val cli = parseArgs(args)
    val config = cli.config.map(EngineConfig.load).getOrElse(EngineConfig.default)

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-etl")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", config.warehouseDir)
      .config("spark.ui.enabled", "false")
      // persistent metastore: catalog tables (incl. the ledger) survive
      // across CLI invocations — the analog of the reference's RDBMS-backed
      // system tables
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel(if (cli.verbose) "INFO" else "WARN")

    try {
      if (cli.setupOnly) {
        graft.ledger.Ledger.ensureTables(spark)
        println("[graft] setup complete: ledger tables provisioned")
        return
      }
      val inputPath = cli.input.getOrElse {
        System.err.println("usage: Main <input_path> [--config file.yaml] " +
          "[--file|--directory] [--setup-only] [-v]")
        spark.stop(); sys.exit(1); ""
      }
      val path = Paths.get(inputPath)
      if (!Files.exists(path)) {
        System.err.println(s"[graft] error: input path does not exist: $inputPath")
        spark.stop()
        sys.exit(1)
      }
      if (cli.forceFile && Files.isDirectory(path)) {
        System.err.println(s"[graft] error: --file given but $inputPath is a directory")
        spark.stop(); sys.exit(1)
      }
      if (cli.forceDir && !Files.isDirectory(path)) {
        System.err.println(s"[graft] error: --directory given but $inputPath is a file")
        spark.stop(); sys.exit(1)
      }
      val ok =
        if (Files.isDirectory(path)) {
          val outcome = BatchRunner.run(spark, inputPath, config)
          println(s"[graft] batch ${outcome.batchJobId}: ${outcome.status} " +
            s"(${outcome.processed}/${outcome.totalFiles} processed, ${outcome.failed} failed)")
          outcome.status != "Failed"
        } else {
          val job = ProcessFile.run(spark, inputPath, config)
          if (config.emailEnabled) Report.writeJobReport(spark, job, config)
          println(s"[graft] job ${job.jobRunId}: ${job.result.status} " +
            s"(read=${job.result.rowsRead} ins=${job.result.rowsInserted} " +
            s"upd=${job.result.rowsUpdated} err=${job.result.rowsErrored})")
          job.result.status != "Failed"
        }
      if (!ok) sys.exit(1)
    } finally spark.stop()
  }

  private def parseArgs(args: Array[String]): CliArgs = {
    var cli = CliArgs(None, None, forceFile = false, forceDir = false,
      setupOnly = false, verbose = false)
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--config" if i + 1 < args.length =>
          cli = cli.copy(config = Some(args(i + 1))); i += 2
        case "--file" => cli = cli.copy(forceFile = true); i += 1
        case "--directory" => cli = cli.copy(forceDir = true); i += 1
        case "--setup-only" => cli = cli.copy(setupOnly = true); i += 1
        case "-v" | "--verbose" => cli = cli.copy(verbose = true); i += 1
        case a if !a.startsWith("-") => cli = cli.copy(input = Some(a)); i += 1
        case a => throw new IllegalArgumentException(s"unknown argument: $a")
      }
    }
    if (!cli.setupOnly && cli.input.isEmpty)
      throw new IllegalArgumentException(
        "usage: Main <input_path> [--config file.yaml] [--file|--directory] [--setup-only] [-v]")
    cli
  }
}
