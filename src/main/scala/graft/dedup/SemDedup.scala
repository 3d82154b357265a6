package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
  * embedding space with a cheap coarse quantizer, then search for
  * near-duplicate pairs ONLY inside each cluster — pruning the O(N²)
  * pairwise cosine space to O(N²/k) by construction.
  *
  * The coarse quantizer is the IVF centroid set ([[graft.sim.Ivf]]) — the
  * same deterministic k-means both the ANN index and this operator share,
  * so a pipeline that builds one pays for training once. Pairs that
  * straddle clusters are missed by design (the paper's recall/cost trade);
  * at production scale k is chosen ≈ N/targetClusterSize so each cluster's
  * pairwise block fits one executor's task.
  */
object SemDedup {

  /** Per-cluster near-dup decision summary over an IVF assignment
    * ([[graft.sim.Ivf.assign]] output: corpus_id, cv, centroid_id, cnorm).
    *
    * Returns one row per cluster: member count, number of within-cluster
    * pairs at cosine ≥ `threshold`, and the PAIR-GREEDY removal set —
    * every distinct higher-id pair endpoint (with its id checksum so the
    * oracle pins the exact removed SET, not just its size). Pair-greedy
    * is deliberately conservative on similarity CHAINS: for pairs (A,B),
    * (B,C) with A≁C it removes {B,C}, where a sequential greedy pass
    * would keep C once B is gone — the same one-shot choice Curation's
    * near-dup stage documents (near-similarity is not transitive; the
    * order-dependent sequential variant is not expressible as one
    * deterministic parallel pass). Chain-aware keeper selection is what
    * [[Dedup.clusterPairs]] (connected components, q60) provides.
    *
    * Shuffle shape: the self-join shuffles both sides on centroid_id once;
    * the per-cluster aggregates reuse that partitioning. Norms are folded
    * once per vector (cnorm from the assignment), not per pair. */
  def clusterDupStats(assigned: DataFrame, threshold: Double): DataFrame = {
    val a = assigned.select(col("centroid_id"), col("corpus_id").as("id_a"),
      col("cv").as("va"), col("cnorm").as("na"))
    val b = assigned.select(col("centroid_id"), col("corpus_id").as("id_b"),
      col("cv").as("vb"), col("cnorm").as("nb"))
    val pairs = a.join(b, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        VectorFunctions.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("centroid_id"), col("id_a"), col("id_b"))
    val members = assigned.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_members"))
    val pairAgg = pairs.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_dup_pairs"))
    val removed = pairs.select(col("centroid_id"), col("id_b")).distinct()
      .groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_removed"), sum(col("id_b")).as("removed_id_sum"))
    members
      .join(pairAgg, Seq("centroid_id"), "left")
      .join(removed, Seq("centroid_id"), "left")
      .select(col("centroid_id"), col("n_members"),
        coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("removed_id_sum"), lit(0L)).as("removed_id_sum"))
  }
}
