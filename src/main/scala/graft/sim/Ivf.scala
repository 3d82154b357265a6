package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import graft.functions.VectorFunctions._

/** IVF (inverted-file) ANN index — the second scale path next to LSH.
  *
  * Build: a deterministic coarse quantizer (k-means over a fixed-size
  * sample, seeded by the lowest-id vectors, fixed iteration count and
  * deterministic tie-breaks) assigns every corpus vector to its nearest
  * centroid in ONE NARROW MAP (custom expression carrying the centroid
  * matrix — no crossJoin, no shuffle, every row kept even under duplicate
  * ids). At production scale the assignment becomes the write-time
  * partition key (each centroid = one inverted list / partition), so a
  * query touches only `nProbe` partitions of the corpus.
  *
  * Search: each query scores the driver-small centroid set (tiny
  * crossJoin), keeps its `nProbe` nearest lists, and exact-cosine re-ranks
  * only the vectors in those lists (norms folded once per vector, not per
  * pair).
  */
object Ivf {

  final case class IvfIndex(centroids: Array[(Int, Array[Float])], assigned: DataFrame) {
    /** Release the cached inverted lists (no-op if built with cache=false). */
    def close(): Unit = assigned.unpersist()
  }

  private def toArr(s: Seq[Float]): Array[Float] = s.toArray

  /** cosine over driver-side arrays; tolerates ragged lengths (min-dim). */
  private[sim] def cosArr(a: Array[Float], b: Array[Float]): Double = {
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
    require(sample.nonEmpty, s"IVF train: corpus is empty ($idCol/$vecCol)")
    var centroids: Array[Array[Float]] = sample.take(k)
    var it = 0
    while (it < iters) {
      // per-centroid sums sized to THAT centroid's dims; accumulation is
      // min-dim guarded so ragged vectors degrade instead of crashing
      val sums = centroids.map(c => new Array[Double](c.length))
      val counts = new Array[Long](centroids.length)
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
        val lim = math.min(v.length, sums(best).length)
        while (d < lim) { sums(best)(d) += v(d); d += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else sums(c).map(x => (x / counts(c)).toFloat)
      }
      it += 1
    }
    centroids.zipWithIndex.map { case (v, i) => (i, v) }
  }

  /** Assign every corpus vector to its nearest centroid: one narrow map
    * with the centroid matrix inside the expression — no join, no shuffle,
    * no row loss on duplicate ids. */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[(Int, Array[Float])]): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val nc: Column = GraftSqlBridge.column(
      NearestCentroid(GraftSqlBridge.expression(col("cv")), centroids.map(_._2)))
    graft.ops.Relational.fanOut(
        corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv")))
      .withColumn("centroid_id", nc)
      .withColumn("cnorm", sqrt(normSq(col("cv"))))
  }

  def build(corpus: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      k: Int = 16, iters: Int = 5, cache: Boolean = true): IvfIndex = {
    val cents = train(corpus, idCol, vecCol, k, iters)
    val assigned = assign(corpus, idCol, vecCol, cents)
    IvfIndex(cents, if (cache) assigned.cache() else assigned)
  }

  /** Persist the index with each inverted list as a PARTITION
    * (`partitionBy(centroid_id)`): at production scale this is the
    * write-time layout investment that makes a search touch only its
    * `nProbe` partitions of a 100 TB corpus — [[search]] prunes
    * statically, visible as `PartitionFilters` on the scan (asserted in
    * IvfSpec). Centroids (O(k·dim)) land beside the lists. */
  def writeIndex(index: IvfIndex, path: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.assigned.write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$path/lists")
    index.centroids.toSeq.map { case (i, v) => (i, v.toSeq) }
      .toDF("centroid_id", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    stampIndex(spark, path)
  }

  /** Row-count stamp beside the lists: written at build, refreshed by
    * every [[addToIndex]] — lets an operator detect a layout that was
    * mutated outside the API (stamp != footer count ⇒ rebuild). Parquet
    * footer counts only; no data scan. */
  private[sim] def stampIndex(spark: org.apache.spark.sql.SparkSession, path: String): Long = {
    val rows = spark.read.parquet(s"$path/lists").count()
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$path/_rows"), true)
    try out.write(rows.toString.getBytes("UTF-8")) finally out.close()
    rows
  }

  /** Stamped row count of a persisted index (-1 if never stamped). */
  def indexRows(spark: org.apache.spark.sql.SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_rows")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try {
        // loop to EOF: a single read() may legally return a short count
        // (remote/chunked streams), which would silently truncate the
        // decimal and yield a wrong-but-plausible row count
        val buf = new Array[Byte](64)
        var total = 0
        var n = in.read(buf, total, buf.length - total)
        while (n > 0 && total + n < buf.length) {
          total += n
          n = in.read(buf, total, buf.length - total)
        }
        if (n > 0) total += n
        new String(buf, 0, total, "UTF-8").trim.toLong
      } finally in.close()
    }
  }

  /** Incrementally add vectors to a PERSISTED index without retraining —
    * the growing-corpus production path (yesterday's 100 TB index +
    * today's crawl): assign `newVecs` against the index's EXISTING
    * centroids (the same narrow-map kernel as build — no shuffle) and
    * APPEND them to the partitioned list layout, where each lands in its
    * centroid's partition directory; no existing list file is rewritten,
    * and probe-time partition pruning keeps working unchanged. The coarse
    * quantizer is deliberately not retrained: the centroids are the
    * index's immutable addressing scheme, and re-deriving them would
    * re-address every existing list — that is a rebuild, not an add.
    * Search over (build + add) is therefore IDENTICAL to search over a
    * rebuild that assigns the union against the same centroids (asserted
    * in spec), and the nProbe recall bound holds for added vectors
    * exactly as for originals. Re-stamps the index; returns rows added.
    *
    * SINGLE-WRITER CONTRACT (also applies to [[writeIndex]]): at most one
    * writer may mutate an index path at a time — the lists append and the
    * `_rows` re-stamp are two separate filesystem operations with no
    * transaction around them. Two concurrent adds race the stamp (a
    * returned "rows added" may include another writer's rows), and a crash
    * between append and stamp leaves `_rows` stale. Both failure modes are
    * SAFE but lossy-of-evidence: [[indexRows]] consumers observe a count
    * smaller than the lists, which reads as "mutated outside the API" and
    * forces the documented recovery — recount (`spark.read.parquet(lists)
    * .count()`) or rebuild. Serialize adds externally (one ingest job per
    * index path, the same discipline any parquet append requires). */
  def addToIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      newVecs: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): Long = {
    // an index persisted before stamping existed has no _rows file;
    // count its lists once so the contract (rows ADDED) holds there too
    // instead of returning the whole index size
    val before = indexRows(spark, path) match {
      case -1L => spark.read.parquet(s"$path/lists").count()
      case n => n
    }
    assign(newVecs, idCol, vecCol, loadIndex(spark, path).centroids)
      .write.mode("append").partitionBy("centroid_id")
      .parquet(s"$path/lists")
    stampIndex(spark, path) - before
  }

  /** Reopen a persisted index. The lists DataFrame is the partitioned
    * parquet layout — no data is read until a search probes it. */
  def loadIndex(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val cents = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    IvfIndex(cents, spark.read.parquet(s"$path/lists"))
  }

  /** Top-k search probing the `nProbe` nearest inverted lists per query. */
  def search(index: IvfIndex, queries: DataFrame, topK: Int, nProbe: Int = 4,
      queryId: String = "vec_id", queryVec: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cdf = broadcast(index.centroids.toSeq.map { case (i, v) => (i, v.toSeq) }
      .toDF("centroid_id", "cvec"))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))
      .withColumn("qnorm", sqrt(normSq(col("qv"))))
    // query×centroid scoring is tiny (|q| × k rows) — a window top-n here
    // costs nothing; the corpus never joins the centroid table
    val probes = {
      val scored = q.crossJoin(cdf)
        .withColumn("ccos", cosine(col("qv"), col("cvec")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("ccos").desc, col("centroid_id"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= nProbe)
        .select(col("query_id"), col("qv"), col("qnorm"), col("centroid_id"))
    }
    // Static probe pruning: the probed centroid set is ≤ k values by
    // construction (k is driver-small — same O(k) budget as the centroid
    // collect), so materialize it and filter BEFORE the join. Over a
    // partitionBy(centroid_id) layout (writeIndex) this becomes plan-time
    // partition pruning — the scan reads only the probed inverted lists.
    val probedIds = probes.select(col("centroid_id")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val cand = index.assigned.filter(col("centroid_id").isin(probedIds: _*))
      .join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos", dot(col("cv"), col("qv")) / (col("cnorm") * col("qnorm")))
    Ann.topKPerQuery(cand, topK)
  }
}

/** argmax-cosine centroid id for a vector, centroid matrix embedded in the
  * expression (broadcast with the task closure). Deterministic tie-break:
  * first (lowest-id) centroid wins, matching Ivf.train's driver loop. */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"
  @transient private lazy val cents = centroids
  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData].toFloatArray()
    var best = 0; var bestCos = -2.0
    var c = 0
    while (c < cents.length) {
      val cs = Ivf.cosArr(v, cents(c))
      if (cs > bestCos) { bestCos = cs; best = c }
      c += 1
    }
    best
  }
  // kernel calls a driver-constructed object; interpreted eval via
  // CodegenFallback-style reference object keeps it simple and correct
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this,
      classOf[NearestCentroid].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (Integer) $ref.nullSafeEval($c);
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
}
