package graft.sim

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - `bruteForceTopK`: exact cosine top-k — the correctness baseline.
  *    Queries are broadcast (small side), the corpus streams partition-
  *    parallel through a codegen'd cosine, and per-query top-k is a
  *    window over (query, -cos). No corpus shuffle of vectors: the only
  *    exchange is the (query_id, corpus_id, cos) triples, pre-pruned.
  *  - `lshTopK`: the 100 TB scale path — random-hyperplane buckets with
  *    multi-probe (query probes its bucket plus single-bit flips), exact
  *    re-rank inside the probed buckets. Corpus is bucketed once
  *    (write-time partitioning in production), so each query touches
  *    ~nProbe/2^nBits of the data.
  */
object Ann {

  /** Per-query top-k over (query_id, corpus_id, cos) triples via the
    * bounded-buffer aggregate (functions.GroupedTopK): map-side partials
    * keep only k candidates per query, so the exchange carries
    * |queries| x k rows — the window-rank formulation this replaced
    * shuffled EVERY scored pair to its query's reducer and sorted there
    * (2x measured at 600k rows; the gap grows with candidates/query).
    * Tie-break (cos DESC, corpus_id ASC) matches row_number ordering
    * exactly, so results are bit-identical. */
  private[graft] def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val agg = column(graft.functions.GroupedTopK(
      expression(col("cos")), expression(col("corpus_id")), k)
      .toAggregateExpression())
    scored.groupBy(col("query_id")).agg(agg.as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("corpus_id"), col("col.key").as("cos"))
  }

  /** Exact top-k by cosine for each query vector. Deterministic tiebreak
    * on corpus id. The global k-cut is the bounded-buffer aggregate
    * (topKPerQuery), not a window sort. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "vec_id", queryVec: String = "embedding"): DataFrame = {
    // norms are folded ONCE per vector (not once per pair): ‖c‖ rides the
    // corpus scan, ‖q‖ rides the broadcast side.
    val c = graft.ops.Relational.fanOut(
      corpus.select(col(corpusId).as("corpus_id"), col(corpusVec).as("cv")))
      .withColumn("cnorm", sqrt(normSq(col("cv"))))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))
      .withColumn("qnorm", sqrt(normSq(col("qv"))))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos", dot(col("cv"), col("qv")) / (col("cnorm") * col("qnorm")))
    topKPerQuery(scored, k)
  }

  /** LSH ANN: bucket corpus by `nBits` hyperplane signs; each query probes
    * its own bucket plus all single-bit-flip buckets (multi-probe), then
    * exact cosine re-ranks the candidates. Returns the same schema as
    * bruteForceTopK (candidates may be < k if buckets are sparse). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int = 8,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "vec_id", queryVec: String = "embedding"): DataFrame = {
    val c = graft.ops.Relational.fanOut(
      corpus.select(col(corpusId).as("corpus_id"), col(corpusVec).as("cv")))
      .withColumn("bucket", rpBucket(col("cv"), nBits))
      .withColumn("cnorm", sqrt(normSq(col("cv"))))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))
      .withColumn("bucket0", rpBucket(col("qv"), nBits))
      .withColumn("qnorm", sqrt(normSq(col("qv"))))
    // multi-probe: own bucket + nBits single-bit flips
    val probes = q.select(col("query_id"), col("qv"), col("qnorm"),
      explode(array(
        col("bucket0") +: (0 until nBits)
          .map(b => col("bucket0").bitwiseXOR(lit(1L << b))): _*)).as("bucket"))
    val cand = c.join(broadcast(probes), Seq("bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos", dot(col("cv"), col("qv")) / (col("cnorm") * col("qnorm")))
    topKPerQuery(cand, k)
  }
}
