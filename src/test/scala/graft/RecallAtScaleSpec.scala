package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.sim.{Ann, Ivf}
import graft.ops.Relational

/** Ground truth at the driver's correctness scale (sf0.01) for the
  * rows-only approximate operators: the tiny-fixture specs pin exact
  * behavior; these pin RECALL against the exact computation on the real
  * 5k-document / 5k-vector tables — the property the DuckDB oracle cannot
  * express. */
class RecallAtScaleSpec extends GraftSuite {
  private val sf = "/root/testdata/sf0.01"

  test("minhash LSH at sf0.01: recovers >=90% of exact jaccard>=0.8 pairs") {
    val docs = Relational.t(spark, sf, "documents")
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture has no near-dup pairs at 0.8 — test is vacuous")
    val mh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 32, 8, 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & mh).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall (${(exact -- mh).take(5)} missed)")
  }

  test("IVF ANN at sf0.01: recall >=0.8 at nProbe=4, >=0.9 at nProbe=8") {
    val emb = Relational.t(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Ann.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = Ivf.build(emb, k = 16, iters = 3, cache = false)
    def recallAt(nProbe: Int): Double = {
      val got = Ivf.search(idx, queries, topK = 5, nProbe = nProbe)
        .select("query_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    // the recall/cost dial: more probed lists -> strictly more of the
    // exact neighbor set, approaching 1.0 as nProbe -> k
    val r4 = recallAt(4); val r8 = recallAt(8)
    assert(r4 >= 0.8, s"nProbe=4 recall $r4")
    assert(r8 >= 0.9 && r8 >= r4, s"nProbe=8 recall $r8 (nProbe=4 was $r4)")
  }
}
