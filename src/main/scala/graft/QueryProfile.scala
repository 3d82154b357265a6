package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-stage profile of one driver query at one SF — the measure-first
  * tool of the optimization rounds (guide §1): where do the seconds go —
  * which stage, how many tasks, how many shuffle bytes. Not part of the
  * driver contract.
  *
  * Usage: runMain graft.QueryProfile <sfDir> <reps> <qname> [qname ...]
  * Each query: one warmup at sf0.001, then `reps` timed runs at sfDir
  * with the SQL cache cleared between runs (the Bench methodology);
  * stage rows printed for the LAST run only. */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(id: Int, name: String, ms: Long, tasks: Int,
                  shRead: Long, shWrite: Long, input: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (record) {
          val si = sc.stageInfo
          val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
          stages.add(St(si.stageId, si.name.takeWhile(_ != '\n').take(90), ms,
            si.numTasks, si.taskMetrics.shuffleReadMetrics.totalBytesRead,
            si.taskMetrics.shuffleWriteMetrics.bytesWritten,
            si.taskMetrics.inputMetrics.bytesRead))
        }
      override def onJobStart(js: SparkListenerJobStart): Unit = ()
    })

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"PROFILE unknown query $name")
        case Some(fn) =>
          try fn(spark, warmDir).count() catch { case _: Throwable => () }
          spark.catalog.clearCache()
          var last = 0.0
          (1 to reps).foreach { i =>
            val timed = i == reps
            if (timed) { stages.clear(); record = true }
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            last = (System.nanoTime() - t0) / 1e9
            if (timed) record = false
            spark.catalog.clearCache()
            println(f"PROFILE $name rep$i $last%.3f s")
          }
          import scala.jdk.CollectionConverters._
          val rows = stages.asScala.toSeq.sortBy(-_.ms)
          println(f"PROFILE $name stages=${rows.size} stageMsSum=${rows.map(_.ms).sum}")
          rows.take(25).foreach { s =>
            println(f"  stage ${s.id}%5d ${s.ms}%6d ms tasks=${s.tasks}%3d " +
              f"shR=${s.shRead / 1024}%8dK shW=${s.shWrite / 1024}%8dK in=${s.input / 1024}%8dK  ${s.name}")
          }
      }
    }
    spark.stop()
  }
}
