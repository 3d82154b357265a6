package graft

/** Driver-contract mechanics that CORRECTNESS_r{N} depends on. */
class SparkEntrySpec extends GraftSuite {

  test("oracle coverage is total: every registered query carries a DuckDB mirror") {
    // q35's, q66's and q90's mirrors are data-dependent (inlined trained
    // centroids/codebooks) and appear after the queries have trained —
    // the Verify main runs every query BEFORE dumping oracleSql, which
    // this test re-enacts.
    graft.ops.ScaleOps.q35AnnIvf(spark, "/root/testdata/sf0.001").count()
    graft.ops.ScaleOps3.q66Semdedup(spark, "/root/testdata/sf0.001").count()
    graft.ops.ScaleOps5.q90PqAnn(spark, "/root/testdata/sf0.001").count()
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

  test("data-dependent mirrors are dir-keyed: two corpora in one JVM each get their own centroids") {
    val dirA = "/root/testdata/sf0.001"
    val dirB = "/root/testdata/sf0.01"
    // interleave: train A, then B — the legacy last-run accessor now
    // points at B, but the dir-keyed form must still mirror A correctly
    graft.ops.ScaleOps.q35AnnIvf(spark, dirA).count()
    graft.ops.ScaleOps3.q66Semdedup(spark, dirB).count()
    val a35 = graft.ops.ScaleOps.q35SqlFor(dirA)
    val b35 = graft.ops.ScaleOps.q35SqlFor(dirB)
    val a66 = graft.ops.ScaleOps3.q66SqlFor(dirA)
    val b66 = graft.ops.ScaleOps3.q66SqlFor(dirB)
    assert(a35.isDefined && b35.isDefined && a66.isDefined && b66.isDefined)
    // different corpora train different centroids — a mixed-up mirror
    // would collapse these to equal strings
    assert(a35.get != b35.get, "q35 mirrors for different corpora must differ")
    assert(a66.get != b66.get, "q66 mirrors for different corpora must differ")
    // each mirror inlines the centroids trained on ITS corpus
    def firstCentroid(dir: String): String = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val cents = graft.sim.Ivf.train(emb, "vec_id", "embedding", k = 16, iters = 3)
      cents.find(_._1 == 0).get._2
        .map(f => graft.ops.ScaleOps5.doubleLit(f.toDouble))
        .mkString("(0, [", ", ", "]")
    }
    assert(a35.get.contains(firstCentroid(dirA)), "q35 mirror for A carries A's centroids")
    assert(b35.get.contains(firstCentroid(dirB)), "q35 mirror for B carries B's centroids")
    // the dir-keyed oracle map routes the right mirror per dir
    assert(SparkEntry.oracleSqlFor(dirA)("q35_ann_ivf") == a35.get)
    assert(SparkEntry.oracleSqlFor(dirB)("q66_semdedup") == b66.get)
  }
}
