package graft
import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` output for named driver queries to
  * files — the optimization-round evidence trail (plans/rNN/<q>_before
  * /_after.txt). Not part of the driver contract.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [qname ...]
  * (no qnames = all). Memo-backed queries may run small measurement jobs
  * during construction; the plan itself is not executed. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = if (args.length > 3) args.drop(3).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"PLANDUMP unknown query $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            val f = new java.io.File(outDir, s"${name}_$suffix.txt")
            val w = new java.io.PrintWriter(f, "UTF-8")
            try w.write(txt) finally w.close()
            println(s"PLANDUMP wrote $f (${txt.length} chars)")
          } catch {
            case e: Throwable =>
              println(s"PLANDUMP $name ERROR ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
