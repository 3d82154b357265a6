package graft
import org.apache.spark.sql.SparkSession

/** Prints a one-line physical-plan summary per driver query: join
  * strategies and exchange count. Audit tool for catching accidental
  * cartesians / redundant shuffles across the whole contract surface. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        def n(s: String) = s.r.findAllIn(p).length
        val joins = Seq(
          "BroadcastHashJoin" -> n("BroadcastHashJoin"),
          "SortMergeJoin" -> n("SortMergeJoin"),
          "ShuffledHashJoin" -> n("ShuffledHashJoin"),
          "BroadcastNestedLoopJoin" -> n("BroadcastNestedLoopJoin"),
          "CartesianProduct" -> n("CartesianProduct"))
          .filter(_._2 > 0).map { case (k, v) => s"$k=$v" }.mkString(",")
        println(s"AUDIT $name exch=${n("Exchange hashpartitioning")}+${n("Exchange rangepartitioning")}r " +
          s"joins=[$joins] agg=${n("HashAggregate")} sort=${n("Sort ")}")
      } catch { case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
