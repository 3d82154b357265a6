package graft
import org.apache.spark.sql.SparkSession

/** Interleaved A/B of the eager-cache-materialization routing
  * (`graft.cache.eager`) for the queries that carry it. Host drift on
  * this sandbox swamps cross-run comparisons, so both arms run
  * interleaved eager,lazy,eager,lazy,… in ONE JVM (the MicroBench
  * discipline) with the SQL cache cleared between runs. Not part of the
  * driver contract.
  *
  * Usage: runMain graft.AbEager [conf=<key>] <sfDir> <reps> <qname> ...
  * (default key graft.cache.eager; pass e.g. conf=graft.cache.shared to
  * A/B the shared-persist routing instead — arm "eager" sets the key
  * true, arm "lazy" false). */
object AbEager {
  def main(args: Array[String]): Unit = {
    val (confKey, rest) =
      if (args(0).startsWith("conf=")) (args(0).drop(5), args.drop(1))
      else ("graft.cache.eager", args)
    val sfDir = rest(0)
    val reps = rest(1).toInt
    val names = rest.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
      val res = scala.collection.mutable.Map(
        "eager" -> List.empty[Double], "lazy" -> List.empty[Double])
      for (i <- 1 to reps; mode <- Seq("eager", "lazy")) {
        spark.conf.set(confKey, (mode == "eager").toString)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        res(mode) = dt :: res(mode)
        println(f"AB $name $mode rep$i $dt%.3f")
      }
      spark.conf.unset(confKey)
      def med(xs: List[Double]) = { val s = xs.sorted; s(s.size / 2) }
      println(f"AB $name MEDIAN eager=${med(res("eager"))}%.3f " +
        f"lazy=${med(res("lazy"))}%.3f")
    }
    spark.stop()
  }
}
