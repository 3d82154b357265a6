package graft.sim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** IVF (inverted-file) ANN index — the second scale path next to LSH.
  *
  * Build: a deterministic coarse quantizer (k-means over a fixed-size
  * sample, seeded by the lowest-id vectors, fixed iteration count and
  * deterministic tie-breaks) assigns every corpus vector to its nearest
  * centroid — ONE pass over the corpus per refinement plus one for the
  * final assignment; centroids are driver-small and ride as broadcast
  * literals. At production scale the assignment becomes the write-time
  * partition key (each centroid = one inverted list / partition), so a
  * query touches only `nProbe` partitions of the corpus.
  *
  * Search: each query scores the centroids driver-free (small cross join),
  * keeps its `nProbe` nearest lists, and exact-cosine re-ranks only the
  * vectors in those lists.
  */
object Ivf {

  final case class IvfIndex(centroids: Array[(Int, Array[Float])], assigned: DataFrame)

  private def toArr(s: Seq[Float]): Array[Float] = s.toArray

  private def cosArr(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0 || nb == 0) -1.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Deterministic k-means on a sample: seed = k lowest-id vectors,
    * `iters` Lloyd rounds over a `sampleN`-row sample (sample = lowest ids
    * — deterministic; at scale a hash-sample keyed on the id). */
  def train(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 5, sampleN: Int = 2048): Array[(Int, Array[Float])] = {
    val sample: Array[Array[Float]] = corpus
      .select(col(idCol).cast("long"), col(vecCol))
      .orderBy(col(idCol).cast("long"))
      .limit(sampleN)
      .collect()
      .map(r => toArr(r.getSeq[Float](1)))
    var centroids: Array[Array[Float]] = sample.take(k)
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](centroids(0).length))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0; var bestCos = -2.0
        var c = 0
        while (c < centroids.length) {
          val cs = cosArr(v, centroids(c))
          if (cs > bestCos) { bestCos = cs; best = c }
          c += 1
        }
        counts(best) += 1
        var d = 0
        while (d < v.length) { sums(best)(d) += v(d); d += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else sums(c).map(x => (x / counts(c)).toFloat)
      }
      it += 1
    }
    centroids.zipWithIndex.map { case (v, i) => (i, v) }
  }

  /** Assign every corpus vector to its nearest centroid (one narrow pass;
    * the centroid set travels as a broadcast literal array). */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[(Int, Array[Float])]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cdf = broadcast(centroids.toSeq.map { case (i, v) => (i, v.toSeq) }
      .toDF("centroid_id", "cvec"))
    val scored = graft.ops.Relational.fanOut(
        corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv")))
      .crossJoin(cdf)
      .withColumn("ccos", cosine(col("cv"), col("cvec")))
    val w = Window.partitionBy(col("corpus_id"))
      .orderBy(col("ccos").desc, col("centroid_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("corpus_id"), col("cv"), col("centroid_id"))
  }

  def build(corpus: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      k: Int = 16, iters: Int = 5): IvfIndex = {
    val cents = train(corpus, idCol, vecCol, k, iters)
    IvfIndex(cents, assign(corpus, idCol, vecCol, cents).cache())
  }

  /** Top-k search probing the `nProbe` nearest inverted lists per query. */
  def search(index: IvfIndex, queries: DataFrame, topK: Int, nProbe: Int = 4,
      queryId: String = "vec_id", queryVec: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cdf = broadcast(index.centroids.toSeq.map { case (i, v) => (i, v.toSeq) }
      .toDF("centroid_id", "cvec"))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))
    val probes = {
      val scored = q.crossJoin(cdf)
        .withColumn("ccos", cosine(col("qv"), col("cvec")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("ccos").desc, col("centroid_id"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= nProbe)
        .select(col("query_id"), col("qv"), col("centroid_id"))
    }
    val cand = index.assigned.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cos"))
  }
}
