package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Product quantization (PQ) — the third ANN scale path next to LSH (q24)
  * and IVF (q35). The embedding space is split into `m` contiguous
  * sub-spaces; each sub-space gets its own small codebook (`k` centroids,
  * deterministic Lloyd training); a corpus vector is stored as `m` code
  * indices — at k≤256 that is m BYTES per vector instead of 4·dim, a
  * 64× compression at dim=64/m=4. Search is asymmetric distance
  * computation (ADC): the query builds one m×k lookup table of exact
  * sub-space distances (driver-side, O(m·k·dim/m) — corpus-independent),
  * and the corpus scan is then CODES-ONLY: per row, m array lookups and
  * m−1 additions; the float vectors are never read again. At 100 TB this
  * is the layout that makes exhaustive re-rank affordable — the code
  * table is ~1/64th the corpus bytes, scans stay in whole-stage codegen,
  * and PQ composes with IVF (store codes per inverted list; probe then
  * ADC-scan) without changing either kernel.
  *
  * Determinism contract (mirrors q35's): training seeds from the
  * lowest-id sample vectors with fixed iteration count and first-argmin
  * tie-breaks, so the codebooks are a pure function of (corpus, params) —
  * an oracle can inline them as literals and re-derive codes and ADC
  * distances arithmetically. Every distance here is the three-term form
  * `(Σx² − 2·Σx·c) + Σc²` with each Σ an in-order double fold, which is
  * bit-identical to DuckDB's `list_inner_product` composition in the
  * q90 mirror.
  */
object Pq {

  /** `codebooks(mi)(code)` = centroid vector of sub-space `mi`;
    * sub-space `mi` covers dims `[starts(mi), starts(mi+1))` of a
    * `dim`-wide embedding (proportional integer split). */
  final case class PqModel(codebooks: Array[Array[Array[Float]]], dim: Int) {
    def m: Int = codebooks.length
    def k: Int = if (codebooks.isEmpty) 0 else codebooks(0).length
    def starts: Array[Int] = Array.tabulate(m + 1)(i => i * dim / m)
  }

  /** Three-term L2²: `(Σx² − 2·Σx·c) + Σc²`, each sum an in-order double
    * fold over min(|v|,|c|) dims — the exact expression the q90 mirror
    * computes with `list_inner_product`, so kernel and oracle agree
    * bit-for-bit. Never negative-zero (the sums are ≥ +0.0). */
  private[graft] def dist(v: Array[Float], c: Array[Float]): Double = {
    var xx = 0.0; var xc = 0.0; var cc = 0.0
    val n = math.min(v.length, c.length)
    var i = 0
    while (i < n) {
      val x = v(i).toDouble; val y = c(i).toDouble
      xx += x * x; xc += x * y; cc += y * y; i += 1
    }
    (xx - 2.0 * xc) + cc
  }

  /** argmin-L2² code; strict `<` keeps the FIRST (lowest) code on ties,
    * matching the mirror's `ORDER BY dist ASC, code ASC`. */
  private[sim] def nearest(v: Array[Float], cents: Array[Array[Float]]): Int = {
    var best = 0; var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cents.length) {
      val d = dist(v, cents(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def subvec(v: Array[Float], s0: Int, s1: Int): Array[Float] =
    java.util.Arrays.copyOfRange(v, math.min(s0, v.length), math.min(s1, v.length))

  /** Deterministic per-sub-space Lloyd training on a fixed sample (lowest
    * `sampleN` ids — at scale a hash-sample keyed on the id, same note as
    * Ivf.train). Seeds = the first k sample subvectors; empty clusters
    * keep their previous centroid. Training arithmetic only needs
    * internal determinism (the trained codebooks are literals in the
    * mirror); the MIRRORED arithmetic is encode + ADC. */
  def train(corpus: DataFrame, idCol: String, vecCol: String, m: Int = 4,
      k: Int = 16, iters: Int = 3, sampleN: Int = 2048): PqModel = {
    val sample: Array[Array[Float]] = corpus
      .select(col(idCol).cast("long"), col(vecCol))
      .orderBy(col(idCol).cast("long"))
      .limit(sampleN)
      .collect()
      .map(r => r.getSeq[Float](1).toArray)
    require(sample.nonEmpty, s"PQ train: corpus is empty ($idCol/$vecCol)")
    val dim = sample(0).length
    val starts = Array.tabulate(m + 1)(i => i * dim / m)
    val books = Array.tabulate(m) { mi =>
      val s0 = starts(mi); val s1 = starts(mi + 1); val sd = s1 - s0
      val subs = sample.map(subvec(_, s0, s1))
      var cents: Array[Array[Float]] = subs.take(k).map(_.clone)
      var it = 0
      while (it < iters) {
        val sums = cents.map(_ => new Array[Double](sd))
        val counts = new Array[Long](cents.length)
        subs.foreach { v =>
          val c = nearest(v, cents)
          counts(c) += 1
          var d = 0
          val lim = math.min(v.length, sd)
          while (d < lim) { sums(c)(d) += v(d); d += 1 }
        }
        cents = cents.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0) old
          else sums(c).map(x => (x / counts(c)).toFloat)
        }
        it += 1
      }
      cents
    }
    PqModel(books, dim)
  }

  /** Encode every corpus vector to its m code indices: ONE NARROW MAP
    * with the codebooks inside the expression (task-closure broadcast) —
    * no join, no shuffle, no row loss on duplicate ids. At scale this is
    * the write-time compression pass; the output is the scan table. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      model: PqModel): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val codes: Column = GraftSqlBridge.column(
      PqEncode(GraftSqlBridge.expression(col(vecCol)), model.codebooks, model.starts))
    corpus.select(col(idCol).as("corpus_id"), codes.as("codes"))
  }

  /** Per-query ADC lookup table: `lut(mi)(code)` = exact sub-space
    * distance from the query's mi-th subvector to that code's centroid.
    * O(m·k) doubles per query, corpus-independent. */
  private[sim] def lutFor(q: Array[Float], model: PqModel): Array[Array[Double]] = {
    val st = model.starts
    Array.tabulate(model.m) { mi =>
      val sub = subvec(q, st(mi), st(mi + 1))
      model.codebooks(mi).map(c => dist(sub, c))
    }
  }

  /** ADC top-k: the corpus-side scan reads ONLY the code table; each
    * query ships its m×k lookup table (broadcast — driver work is
    * O(|queries|·m·k), the same bounded budget as the centroid collects
    * in Ivf). Approximate distance = in-order sum of the m table hits
    * (`aggregate` left fold = the mirror's left-assoc addition chain).
    * Ties rank lowest corpus_id first. Self-pairs are excluded, matching
    * q20/q35. */
  def search(corpusCodes: DataFrame, queries: DataFrame, model: PqModel,
      topK: Int, queryId: String = "vec_id",
      queryVec: String = "embedding"): DataFrame = {
    val spark = corpusCodes.sparkSession
    import spark.implicits._
    val qluts: Seq[(Long, Seq[Seq[Double]])] = queries
      .select(col(queryId).cast("long"), col(queryVec))
      .collect()
      .map(r => (r.getLong(0), lutFor(r.getSeq[Float](1).toArray, model)
        .map(_.toSeq).toSeq))
      .toSeq
    val lutDf = broadcast(qluts.toDF("query_id", "lut"))
    val cand = corpusCodes.crossJoin(lutDf)
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("adc", expr(
        s"aggregate(sequence(0, ${model.m - 1}), cast(0.0 as double), " +
          "(acc, i) -> acc + lut[i][codes[i]])"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("corpus_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("adc"))
  }

  /** PQ-encode an IVF-assigned corpus ([[Ivf.assign]] output): each code
    * row keeps its inverted-list id. This is the composed production
    * layout — 100 TB of floats becomes m bytes/vector PER LIST, and a
    * search touches only its probed lists' codes. */
  def encodeAssigned(assigned: DataFrame, model: PqModel): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val codes: Column = GraftSqlBridge.column(
      PqEncode(GraftSqlBridge.expression(col("cv")), model.codebooks, model.starts))
    assigned.select(col("corpus_id"), col("centroid_id"), codes.as("codes"))
  }

  /** Persist the composed layout with each inverted list as a PARTITION —
    * the same write-time investment as [[Ivf.writeIndex]], but holding
    * CODES: a probe-filtered scan becomes plan-time partition pruning
    * over data that is already 16× smaller than the float lists. */
  def writeCodes(codesByList: DataFrame, path: String): Unit =
    codesByList.write.mode("overwrite").partitionBy("centroid_id").parquet(path)

  /** A reopened COMPLETE IVF+PQ index: probe-prunable code lists, the
    * coarse centroids, and the trained codebooks — everything
    * [[searchIvfPq]] needs with zero retraining. */
  final case class PqIndex(codesByList: DataFrame,
      centroids: Array[(Int, Array[Float])], model: PqModel) {
    def search(queries: DataFrame, topK: Int, nProbe: Int = 4,
        queryId: String = "vec_id", queryVec: String = "embedding"): DataFrame =
      searchIvfPq(codesByList, centroids, model, queries, topK, nProbe,
        queryId, queryVec)
  }

  /** Persist the COMPLETE IVF+PQ index — the r9 verdict's lifecycle gap
    * made whole: [[writeCodes]] persisted the lists while the codebooks
    * retrained per session; this writes lists (`path/lists`, partitioned
    * — pruning unchanged), coarse centroids (`path/centroids`, the
    * [[Ivf.writeIndex]] shape), AND the trained model (`path/model`:
    * one row per (mi, code) sub-centroid plus the embedding dim), then
    * refreshes the `_rows` stamp LAST, the same mutated-outside-the-API
    * canary as IVF ([[Ivf.indexRows]] vs footer count). Single-writer
    * contract as documented on [[Ivf.addToIndex]]. */
  def writeIndex(codesByList: DataFrame, centroids: Array[(Int, Array[Float])],
      model: PqModel, path: String): Unit = {
    val spark = codesByList.sparkSession
    import spark.implicits._
    codesByList.write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$path/lists")
    centroids.toSeq.map { case (i, v) => (i, v.toSeq) }
      .toDF("centroid_id", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val modelRows = for {
      mi <- model.codebooks.indices
      code <- model.codebooks(mi).indices
    } yield (mi, code, model.codebooks(mi)(code).toSeq, model.dim)
    modelRows.toDF("mi", "code", "cvec", "dim")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/model")
    Ivf.stampIndex(spark, path)
  }

  /** Reopen a persisted IVF+PQ index. The codebooks are VALIDATED on
    * load — contiguous sub-spaces 0..m−1, each with the same contiguous
    * code range 0..k−1, one dim — so a torn or hand-mutated model
    * surfaces as a loud require, not silently-wrong ADC distances. The
    * lists DataFrame reads nothing until a search probes it. */
  def loadIndex(spark: org.apache.spark.sql.SparkSession, path: String): PqIndex = {
    val cents = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val rows = spark.read.parquet(s"$path/model")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray, r.getInt(3)))
      .sortBy(t => (t._1, t._2))
    require(rows.nonEmpty, s"PQ loadIndex: empty model at $path/model")
    val dims = rows.map(_._4).distinct
    require(dims.length == 1, s"PQ loadIndex: inconsistent dims ${dims.toSeq}")
    val m = rows.map(_._1).max + 1
    require(rows.map(_._1).distinct.sorted.sameElements(0 until m),
      s"PQ loadIndex: non-contiguous sub-spaces at $path/model")
    val books = Array.tabulate(m) { mi =>
      val b = rows.filter(_._1 == mi)
      require(b.map(_._2).sameElements(b.indices),
        s"PQ loadIndex: non-contiguous codes in sub-space $mi")
      b.map(_._3)
    }
    require(books.map(_.length).distinct.length == 1,
      s"PQ loadIndex: ragged codebooks ${books.map(_.length).toSeq}")
    PqIndex(spark.read.parquet(s"$path/lists"), cents, PqModel(books, dims(0)))
  }

  /** IVF+PQ search: probe selection AND re-rank both use the PQ metric
    * (three-term L2² — [[dist]]), driver-side per query (probes and LUT
    * are O(k + m·k) doubles, corpus-independent). The corpus-side scan
    * filters to the probed lists FIRST (static `isin` — plan-time
    * partition pruning over a [[writeCodes]] layout), equi-joins the
    * broadcast (query, probed-list, LUT) table on `centroid_id`, and
    * ADC-scans codes only. Relative to [[search]]'s exhaustive scan this
    * reads nProbe/k of the corpus; relative to [[Ivf.search]] it never
    * touches float vectors after encode. */
  def searchIvfPq(codesByList: DataFrame, centroids: Array[(Int, Array[Float])],
      model: PqModel, queries: DataFrame, topK: Int, nProbe: Int = 4,
      queryId: String = "vec_id", queryVec: String = "embedding"): DataFrame = {
    val spark = codesByList.sparkSession
    import spark.implicits._
    val qRows: Seq[(Long, Seq[Int], Seq[Seq[Double]])] = queries
      .select(col(queryId).cast("long"), col(queryVec))
      .collect()
      .map { r =>
        val q = r.getSeq[Float](1).toArray
        val probes = centroids.map { case (cid, cv) => (cid, dist(q, cv)) }
          .sortBy { case (cid, d) => (d, cid) }.take(nProbe).map(_._1).toSeq
        (r.getLong(0), probes, lutFor(q, model).map(_.toSeq).toSeq)
      }.toSeq
    val lutDf = broadcast(qRows.toDF("query_id", "probes", "lut")
      .select(col("query_id"), explode(col("probes")).as("centroid_id"), col("lut")))
    val probedIds = qRows.flatMap(_._2).distinct
    val cand = codesByList.filter(col("centroid_id").isin(probedIds: _*))
      .join(lutDf, Seq("centroid_id"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("adc", expr(
        s"aggregate(sequence(0, ${model.m - 1}), cast(0.0 as double), " +
          "(acc, i) -> acc + lut[i][codes[i]])"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("corpus_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("adc"))
  }
}

/** PQ encoder: m sub-space argmin-L2² code indices for one embedding,
  * codebooks embedded in the expression. Deterministic tie-break: lowest
  * code wins (Pq.nearest strict `<`). */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]],
    starts: Array[Int]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData].toFloatArray()
    val out = new Array[Any](codebooks.length)
    var mi = 0
    while (mi < codebooks.length) {
      val sub = java.util.Arrays.copyOfRange(v,
        math.min(starts(mi), v.length), math.min(starts(mi + 1), v.length))
      out(mi) = Pq.nearest(sub, codebooks(mi))
      mi += 1
    }
    new GenericArrayData(out)
  }
  // kernel calls a driver-constructed object (same pattern as
  // NearestCentroid): reference-object codegen keeps the hot loop in
  // compiled code without duplicating the argmin in Java source
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}
