package graft

/** Driver-contract mechanics that CORRECTNESS_r{N} depends on. */
class SparkEntrySpec extends GraftSuite {

  test("oracle coverage is total: every registered query carries a DuckDB mirror") {
    // q35's and q66's mirrors are data-dependent (inlined trained
    // centroids) and appear after the queries have trained — the Verify
    // main runs every query BEFORE dumping oracleSql, which this test
    // re-enacts.
    graft.ops.ScaleOps.q35AnnIvf(spark, "/root/testdata/sf0.001").count()
    graft.ops.ScaleOps3.q66Semdedup(spark, "/root/testdata/sf0.001").count()
    val sql = SparkEntry.oracleSql
    assert(SparkEntry.queries.keySet == sql.keySet,
      s"queries without an oracle: ${SparkEntry.queries.keySet -- sql.keySet}")
  }

  test("q35 mirror inlines the kernel's own centroids as DOUBLE[] literals") {
    graft.ops.ScaleOps.q35AnnIvf(spark, "/root/testdata/sf0.001").count()
    val q35 = SparkEntry.oracleSql("q35_ann_ivf")
    assert(q35.contains("::DOUBLE[])"), "centroid arrays must be DOUBLE[] literals")
    // all 16 centroid rows present, ids 0..15
    assert((0 until 16).forall(i => q35.contains(s"($i, [")), "16 centroid rows")
    // the re-rank mirrors GroupedTopK's (cos DESC, corpus_id) tie-break
    assert(q35.contains("ORDER BY cos DESC, corpus_id"))
  }
}
