package graft
import org.apache.spark.sql.SparkSession

/** One-off scale-stress harness: times the lineitem-heavy queries on an
  * N-times-replicated copy of the fact table (multi-row-group, so scans
  * split into real parallel tasks) and prints seconds per query. Used to
  * check that runtimes scale ~linearly in fact rows and plans stay stable
  * (same joins/aggregates, no spills) before claiming 100 TB viability. */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfbig")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = Seq(
      "q01_pricing_summary", "q02_filter_scan", "q03_join_revenue",
      "q08_topk", "q12_rollup", "q33_cube", "q38_range_join",
      // text layer over the token-mutated 10x documents corpus (every
      // shingle distinct across replicas -> df flat, corpus 10x: the
      // fair "new text" scaling shape, not pathological duplication)
      "q15_dedup_exact", "q16_token_count", "q17_quality_score",
      "q18_lang_id", "q19_ngram_jaccard", "q21_minhash_lsh", "q22_simhash",
      "q23_fingerprint", "q57_repetition")
    qs.foreach { n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count() }
    spark.catalog.clearCache()
    for (rep <- 1 to 2) qs.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      println(f"STRESS rep$rep $n ${(System.nanoTime() - t0) / 1e9}%.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
