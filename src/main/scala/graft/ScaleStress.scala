package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Scale-stress harness backing the 100 TB-viability claims with measured
  * evidence instead of plan reading alone. Three modes:
  *
  *  - (default) `<dir>`: legacy fact-table mode — times the lineitem-heavy
  *    queries on an N-times-replicated copy (multi-row-group) and prints
  *    seconds per query.
  *  - `curve <base> [reps]`: 3-point scaling curves (1×/3×/10× corpora
  *    from [[StressGen]]) for the near-dup/ANN layer — capped Jaccard,
  *    MinHash LSH, SimHash, embedding near-dup, IVF search over the
  *    persisted partitioned index — and prints the fitted exponent of
  *    t ∝ n^e per op (least squares over the 3 points). The corpora are
  *    token-mutated per replica, so this is the "new data" scaling shape.
  *  - `skew <base>`: the boilerplate-skew adversarial case — one sentence
  *    shared by ~30% of documents. Prints the candidate-pair space
  *    Σ df·(df−1)/2 with and without the df cap (the uncapped number is
  *    the join size a production run would have to materialize) and times
  *    the CAPPED production path ([[Dedup.nearDupPairs]]) at 1× and 10×,
  *    plus the uncapped path at 1× for contrast.
  *  - `packskew <base> [nDocs]`: the one-dominant-source packing corpus —
  *    differential + balance evidence for the r12 hierarchical prefix
  *    sum ([[graft.pipeline.Packing.packAssignmentsByCount]]). */
object ScaleStress {

  private def session(): SparkSession = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private def time(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = f
    ((System.nanoTime() - t0) / 1e9, n)
  }

  /** Median-of-reps wall time plus the (stable) result count. */
  private def timed(spark: SparkSession, reps: Int)(f: => Long): (Double, Long) = {
    val runs = (1 to reps).map { _ =>
      val r = time(f)
      spark.catalog.clearCache()
      r
    }
    (runs.map(_._1).sorted.apply(reps / 2), runs.head._2)
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("curve") => curve(args.lift(1).getOrElse("/tmp/stress_r5"),
      args.lift(2).map(_.toInt).getOrElse(3), args.lift(3))
    case Some("skew") => skew(args.lift(1).getOrElse("/tmp/stress_r5"))
    case Some("audit") => audit(args.lift(1).getOrElse("/root/testdata/sf0.1"))
    case Some("single") => single(args(1),
      args.lift(2).getOrElse("/root/testdata/sf0.1"),
      args.lift(3).map(_.toInt).getOrElse(5))
    case Some("pipeline") => pipelineStress(args.lift(1).getOrElse("/tmp/stress_r6/x100"),
      reuse = !args.lift(2).contains("noreuse"))
    case Some("snmskew") => snmSkew(args.lift(1).getOrElse("/tmp/stress_snm"),
      args.lift(2).map(_.toInt).getOrElse(120000))
    case Some("packskew") => packSkew(args.lift(1).getOrElse("/tmp/stress_pack"),
      args.lift(2).map(_.toInt).getOrElse(400000))
    case Some("graphcurve") => graphCurve(args.lift(1).getOrElse("/tmp/stress_facts"),
      args.lift(2).map(_.toInt).getOrElse(3))
    case Some("mediacurve") => mediaCurve(args.lift(1).getOrElse("/tmp/stress_facts"),
      args.lift(2).map(_.toInt).getOrElse(3))
    case Some("bpebatch") => bpeBatch(args.lift(1).getOrElse("/tmp/stress_facts/x10"),
      args.lift(2).map(_.toInt).getOrElse(256))
    case Some("overlapskew") => overlapSkew(args.lift(1).getOrElse("/tmp/stress_overlap"),
      args.lift(2).map(_.toInt).getOrElse(400000))
    case Some("apnd") => apnd(args.lift(1).getOrElse("/tmp/stress_apnd"),
      args.lift(2).map(_.toInt).getOrElse(100000))
    case Some("tert") => tert(args.lift(1).getOrElse("/tmp/stress_tert"),
      args.lift(2).map(_.toInt).getOrElse(4000000))
    case Some("disp") => disp(args.lift(1).getOrElse("/tmp/stress_disp"),
      args.lift(2).map(_.toInt).getOrElse(4000000))
    case Some("plx") => plx(args.lift(1).getOrElse("/tmp/stress_plx"),
      args.lift(2).map(_.toInt).getOrElse(4000000))
    case Some("clf") => clf(args.lift(1).getOrElse("/tmp/stress_clf"),
      args.lift(2).map(_.toInt).getOrElse(200000))
    case _ => facts(args.headOption.getOrElse("/tmp/sfbig"))
  }

  // --- graph-family curve mode ---------------------------------------------

  /** 4-point scaling curves (x1/x3/x10/x100 FACTS corpora — `StressGen
    * facts <src> <base>/xN N`) for the graph family: q96 PageRank, q114
    * triangle counting, q127 BFS — the three heaviest graph ops, whose
    * edge sets grow superlinearly in basket density (the r9 verdict's
    * missing-evidence item: the curve discipline sparse_sim/phrase_search
    * already had, applied to the graph ops). Same least-squares exponent
    * protocol as `curve`. */
  def graphCurve(base: String, reps: Int): Unit = {
    val spark = session()
    val scales = Seq(1, 3, 10, 100)
      .filter(n => new java.io.File(s"$base/x$n/lineitem.parquet").exists())
    require(scales.nonEmpty,
      s"no facts corpora under $base (expected x1/x3/... with lineitem) — " +
        "generate with `runMain graft.StressGen facts <src> $base/xN N`")
    println(s"GRAPHCURVE scales=${scales.mkString(",")}")
    val qs = Seq("q96_pagerank", "q114_triangles", "q127_bfs_hops")
    qs.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    spark.catalog.clearCache()
    val results = for (name <- qs) yield {
      val pts = scales.map { n =>
        val (sec, rows) = timed(spark, reps)(
          SparkEntry.queries(name)(spark, s"$base/x$n").count())
        println(f"CURVE $name x$n%-3d ${sec}%.2fs rows=$rows")
        (n.toDouble, sec)
      }
      val xs = pts.map(p => math.log(p._1)); val ys = pts.map(p => math.log(p._2))
      val xm = xs.sum / xs.size; val ym = ys.sum / ys.size
      val e = xs.zip(ys).map { case (x, y) => (x - xm) * (y - ym) }.sum /
        xs.map(x => (x - xm) * (x - xm)).sum
      println(f"CURVE $name exponent=${e}%.2f")
      name -> e
    }
    val worst = results.maxBy(_._2)
    println(f"CURVE worst ${worst._1} exponent=${worst._2}%.2f")
    spark.stop()
  }

  // --- media decode family curve mode --------------------------------------

  /** 4-point scaling curves for the MEDIA DECODE family (the r10
    * verdict's missing scale-curve evidence, item #6): q149 MJPEG
    * container walk + per-sample JPEG decode, q154 keyframe lag
    * windows, q159 WAV silence segmentation, q160 WHT band energies.
    * All four synthesize their media fixtures per DOCUMENT row (fixture
    * laws are pure id arithmetic), so a facts corpus's ×n documents IS
    * ×n media byte volume at constant per-item size — the existing
    * `StressGen facts` corpora are the media-growth corpora, no
    * separate generator needed. Decode is a pure map and the windows
    * are media-keyed (≫ tasks, tiny partitions), so the family should
    * land at exponent ≈ 1.0 in bytes with no skew term. Same
    * least-squares protocol as `curve`/`graphcurve`. */
  def mediaCurve(base: String, reps: Int): Unit = {
    val spark = session()
    val scales = Seq(1, 3, 10, 100)
      .filter(n => new java.io.File(s"$base/x$n/documents.parquet").exists())
    require(scales.nonEmpty,
      s"no facts corpora under $base (expected x1/x3/... with documents) — " +
        "generate with `runMain graft.StressGen facts <src> $base/xN N`")
    println(s"MEDIACURVE scales=${scales.mkString(",")}")
    val qs = Seq("q149_mjpeg_frames", "q154_keyframes", "q159_silence",
      "q160_wht_bands")
    qs.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    spark.catalog.clearCache()
    val results = for (name <- qs) yield {
      val pts = scales.map { n =>
        val (sec, rows) = timed(spark, reps)(
          SparkEntry.queries(name)(spark, s"$base/x$n").count())
        println(f"CURVE $name x$n%-3d ${sec}%.2fs rows=$rows")
        (n.toDouble, sec)
      }
      val xs = pts.map(p => math.log(p._1)); val ys = pts.map(p => math.log(p._2))
      val xm = xs.sum / xs.size; val ym = ys.sum / ys.size
      val e = xs.zip(ys).map { case (x, y) => (x - xm) * (y - ym) }.sum /
        xs.map(x => (x - xm) * (x - xm)).sum
      println(f"CURVE $name exponent=${e}%.2f")
      name -> e
    }
    val worst = results.maxBy(_._2)
    println(f"CURVE worst ${worst._1} exponent=${worst._2}%.2f")
    spark.stop()
  }

  // --- batched-BPE driver-round saving mode ---------------------------------

  /** Measured driver-round saving of the conf-driven batched trainer at
    * a REAL vocab size (the r11 verdict's "wire it in and measure"):
    * trains `merges` merges over a stress corpus sequentially (one
    * driver sync per merge) and at batchK = [[graft.text.Bpe.DefaultBatchK]],
    * reporting wall time, driver rounds, and the schedule-prefix overlap
    * (batched is an approximation on conflict-heavy corpora; the
    * boundary is spec-documented, the overlap is reported, not
    * asserted). */
  def bpeBatch(dir: String, merges: Int): Unit = {
    val spark = session()
    require(new java.io.File(s"$dir/documents.parquet").exists(),
      s"no documents at $dir — generate with StressGen facts")
    val words = graft.text.Bpe.vocabWords(
      spark.read.parquet(s"$dir/documents.parquet"), "text").cache()
    words.count()
    def timedTrain(f: => Seq[graft.text.Bpe.Merge])
        : (Double, Seq[graft.text.Bpe.Merge], Int) = {
      val t0 = System.nanoTime()
      val m = f
      ((System.nanoTime() - t0) / 1e9, m, graft.text.Bpe.lastDriverRounds.get())
    }
    val (seqSec, seqM, seqRounds) =
      timedTrain(graft.text.Bpe.trainSequential(words, merges))
    val (batSec, batM, batRounds) =
      timedTrain(graft.text.Bpe.trainBatched(words, merges,
        graft.text.Bpe.DefaultBatchK))
    val overlap = seqM.map(m => (m._2, m._3)).toSet
      .intersect(batM.map(m => (m._2, m._3)).toSet).size
    println(f"BPEBATCH merges=$merges sequential=${seqSec}%.1fs rounds=$seqRounds " +
      f"batched=${batSec}%.1fs rounds=$batRounds " +
      f"speedup=${seqSec / batSec}%.2fx roundRatio=${seqRounds.toDouble / batRounds}%.1fx " +
      f"scheduleOverlap=$overlap/${merges}")
    words.unpersist()
    spark.stop()
  }

  // --- SNM blocking skew mode ----------------------------------------------

  /** Adversarial corpus for q148's sorted-neighborhood blocking: ≥30 %
    * of documents share ONE 24-char sort-key (identical skey AND
    * identical 2-char block — the worst case for the r9 per-block
    * window, which would sort all of them in a single task). Verifies
    * the r10 rank-join path is (a) row-identical to the windowed
    * reference and (b) balanced: prints the hot block's mass fraction
    * (the windowed form's largest window partition) against the range
    * exchange's max/mean partition sizes, and both paths' wall times. */
  def snmSkew(base: String, nDocs: Int): Unit = {
    val spark = session()
    import spark.implicits._
    val dir = s"$base/skewdocs"
    val hot = "the quick brown fox jump" // 24 chars — one skey, one block
    val docs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      when(col("id") % 10 < 3, // 30% in the hot key run, tails diverge
        concat(lit(hot + "s over lazy dog number "), col("id")))
        .otherwise(concat(
          // spread the rest across blocks: two pseudo-random letters
          org.apache.spark.sql.functions.chr(lit(97) + pmod(col("id") * 131, lit(26))),
          org.apache.spark.sql.functions.chr(lit(97) + pmod(col("id") * 37, lit(26))),
          lit(" document body text idx "), col("id"))).as("text"))
      .withColumn("lang", lit("en")).withColumn("source", lit("stress"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // hot-block mass = the windowed form's single-task window partition
    val keyed = spark.read.parquet(s"$dir/documents.parquet")
      .select(substring(trim(lower(col("text"))), 1, 2).as("block"))
    val largestBlock = keyed.groupBy("block").count()
      .agg(max(col("count"))).head().getLong(0)
    val hotFrac = largestBlock.toDouble / nDocs
    println(f"SNMSKEW n=$nDocs hot_block_fraction=$hotFrac%.3f")

    // balance evidence: explicit 32-way range partition of the sort the
    // rank-join branch rides (unique composite key ⇒ splits the hot key
    // run; explicit numPartitions so AQE's small-data coalescing doesn't
    // mask the mechanism at stress scale)
    val sorted = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        substring(trim(lower(col("text"))), 1, 24).as("skey"))
      .repartitionByRange(32, col("skey"), col("doc_id"))
    val sizes = sorted.rdd.mapPartitions(it => Iterator(it.size)).collect()
      .filter(_ > 0)
    println(s"SNMSKEW range_partitions n=${sizes.length} " +
      s"max=${sizes.max} mean=${sizes.sum / sizes.length} " +
      f"max_fraction=${sizes.max.toDouble / nDocs}%.3f")

    // the adaptive entry must pick the windowed branch here (blocks are
    // stress-sized, not 100TB-sized) — reported from the SAME measurement
    // the real q148SnmDedup entry branches on (largest block count vs
    // graft.snm.maxBlockRows), not a parallel heuristic that could
    // disagree with the operator's actual pick (the r10 advice)
    val snmBound = spark.conf.getOption("graft.snm.maxBlockRows")
      .map(_.toLong).getOrElse(1000000L)
    println(s"SNMSKEW adaptive_pick=" +
      (if (largestBlock <= snmBound) "windowed" else "rankjoin") +
      s" largest_block=$largestBlock bound=$snmBound")
    // … and the rank-join branch, forced, must agree row-for-row
    val fast = graft.ops.ScaleOps16.q148SnmDedupRankJoin(spark, dir)
    val ref = graft.ops.ScaleOps16.q148SnmDedupWindowed(spark, dir)
    val (fastSec, fastRows) = timed(spark, 3)(
      graft.ops.ScaleOps16.q148SnmDedupRankJoin(spark, dir).count())
    val (refSec, refRows) = timed(spark, 3)(
      graft.ops.ScaleOps16.q148SnmDedupWindowed(spark, dir).count())
    val diff = fast.unionByName(ref).except(fast.intersect(ref)).count()
    println(f"SNMSKEW rankjoin ${fastSec}%.2fs pairs=$fastRows | " +
      f"windowed ${refSec}%.2fs pairs=$refRows | sym_diff=$diff")
    spark.stop()
  }

  /** Adversarial corpus for the packing prefix sum (the r11 verdict's one
    * `weak`): ~95 % of documents in ONE source — the shape where the old
    * per-source running-sum window serialized nearly the whole corpus
    * into a single task. Verifies the r12 hierarchical two-phase form is
    * (a) row-identical to the windowed reference, (b) balanced: prints
    * the dominant source's mass against the range exchange's max
    * partition size (max-task input ≪ source size is the fix's claim),
    * and (c) both paths' wall times. */
  def packSkew(base: String, nDocs: Int): Unit = {
    val spark = session()
    val dir = s"$base/packdocs"
    spark.range(nDocs).select(
      col("id").as("doc_id"),
      when(pmod(col("id"), lit(20)) === 19,
        concat(lit("minor"), pmod(col("id"), lit(8))))
        .otherwise(lit("dominant")).as("source"),
      (lit(1L) + pmod(col("id") * 7919, lit(50))).as("n_tokens"))
      .repartition(16)
      .write.mode("overwrite").parquet(s"$dir/docs.parquet")
    val docs = spark.read.parquet(s"$dir/docs.parquet")
    val domRows = docs.filter(col("source") === "dominant").count()
    println(f"PACKSKEW n=$nDocs dominant_fraction=${domRows.toDouble / nDocs}%.3f")

    // balance evidence: the exchange the hierarchical form opens with —
    // range partition on (source, doc_id); the unique trailing id splits
    // the dominant source across partitions (explicit 32-way so AQE's
    // small-data coalescing doesn't mask the mechanism at stress scale,
    // the snmSkew discipline)
    val sizes = docs.repartitionByRange(32, col("source"), col("doc_id"))
      .rdd.mapPartitions(it => Iterator(it.size)).collect().filter(_ > 0)
    println(s"PACKSKEW range_partitions n=${sizes.length} " +
      s"max=${sizes.max} mean=${sizes.sum / sizes.length} " +
      f"max_task_vs_dominant=${sizes.max.toDouble / domRows}%.3f " +
      f"(windowed form would put fraction 1.000 of the source in one task)")

    val ctx = 2048L
    val (hierSec, hierRows) = timed(spark, 3)(
      graft.pipeline.Packing.packAssignmentsByCountHierarchical(
        docs, "doc_id", "n_tokens", "source", ctx).count())
    val (winSec, winRows) = timed(spark, 3)(
      graft.pipeline.Packing.packAssignmentsByCountWindowed(
        docs, "doc_id", "n_tokens", "source", ctx).count())
    val h = graft.pipeline.Packing.packAssignmentsByCountHierarchical(
      docs, "doc_id", "n_tokens", "source", ctx)
    val w = graft.pipeline.Packing.packAssignmentsByCountWindowed(
      docs, "doc_id", "n_tokens", "source", ctx)
    val diff = h.unionByName(w).except(h.intersect(w)).count()
    println(f"PACKSKEW hierarchical ${hierSec}%.2fs rows=$hierRows | " +
      f"windowed ${winSec}%.2fs rows=$winRows | sym_diff=$diff")
    spark.stop()
  }

  /** Tertile-boundary route evidence (q179 /
    * [[graft.ops.ScaleOps25.assignTertiles]], r13 verdict #2): a
    * 95%-one-language scored corpus — the exact `percentile` arm funnels
    * the dominant language's per-(value, count) state through ONE
    * aggregation buffer, the HISTOGRAM arm never holds more than a
    * constant per group (its exchange carries the value histogram,
    * ≤ 10⁶+1 rows per language, and its window runs over histogram rows).
    * Evidence: identical assignments (sym diff 0 — the differential spec's
    * bit-equality, re-checked at stress scale) and the measured cost of
    * each arm. Scores are synthesized directly: the boundary pass is what
    * routes; the scoring chain is shared by both arms and orthogonal. */
  def tert(base: String, nDocs: Int): Unit = {
    import graft.ops.ScaleOps25
    val spark = session()
    val dir = s"$base/scored"
    spark.range(nDocs).select(
      col("id").as("doc_id"),
      when(pmod(col("id"), lit(20)) === 19,
        concat(lit("minor"), pmod(col("id"), lit(8))))
        .otherwise(lit("dominant")).as("lang"),
      pmod(col("id") * 7919, lit(1000001L)).as("score_fp"))
      .repartition(16)
      .write.mode("overwrite").parquet(dir)
    val wl = spark.read.parquet(dir)
    val domRows = wl.filter(col("lang") === "dominant").count()
    println(f"TERT n=$nDocs dominant_fraction=${domRows.toDouble / nDocs}%.3f")
    val (exSec, exRows) = timed(spark, 3)(
      ScaleOps25.assignTertiles(wl, 0L).count())            // exact route
    val (hiSec, hiRows) = timed(spark, 3)(
      ScaleOps25.assignTertiles(wl, Long.MaxValue).count()) // histogram route
    val e = ScaleOps25.assignTertiles(wl, 0L)
    val h = ScaleOps25.assignTertiles(wl, Long.MaxValue)
    val diff = e.unionByName(h).except(e.intersect(h)).count()
    println(f"TERT exact ${exSec}%.2fs rows=$exRows | " +
      f"histogram ${hiSec}%.2fs rows=$hiRows | sym_diff=$diff")
    spark.stop()
  }

  /** Log-domain scoring cost at scale (q190 /
    * [[graft.ops.ScaleOps30.scoreDocsWithLmLog2]]): the r15 claim —
    * the 20-round integer log₂ chain is a PURE MAP over the joined
    * bigram stream (plan-pinned to q183's exact operator shape), so
    * its price at scale is a bounded constant factor over the add-k
    * arithmetic scorer, not a new bottleneck. Synthetic corpus:
    * nDocs × 24 tokens from a 5k vocabulary via modular mixing
    * (deterministic, hash-spread bigram distribution), model trained
    * on the even half, EVERYONE scored — nDocs·23 bigrams through two
    * co-partitioned model joins, then either one fixed-point division
    * (arith) or the 62-bit ratio + 20 squarings (log; since r17 the
    * squarings are one codegen'd long loop,
    * [[graft.functions.NegLog2Fp]], so expect ≈ parity — the shared
    * DECIMAL ratio dominates both arms). Order note: arith runs first
    * and pays JIT/page-cache warmup; the honest warm-vs-warm
    * comparison is rep 2+ (median-of-3 mostly absorbs it). */
  def plx(base: String, nDocs: Int): Unit = {
    import graft.ops.{ScaleOps27, ScaleOps30}
    val spark = session()
    val vocabN = 5000L
    spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 24).map(j =>
        concat(lit("w"), pmod(col("id") * lit(2654435761L) + lit(j * 7919L),
          lit(vocabN)))): _*).as("text"))
      .repartition(16)
      .write.mode("overwrite").parquet(s"$base/docs.parquet")
    val docs = spark.read.parquet(s"$base/docs.parquet")
    val ref = docs.filter(pmod(col("doc_id"), lit(2L)) === 0)
    ScaleOps27.trainLmPairs(ref)
      .write.mode("overwrite").parquet(s"$base/pairs.parquet")
    val pairs = spark.read.parquet(s"$base/pairs.parquet")
    val v = ScaleOps27.vocabSize(ref)
    println(s"PLX n=$nDocs v=$v pair_types=${pairs.count()}")
    // r16 CORRECTION: the r15 form measured `.count()` over the scoring
    // aggregate — and Catalyst PRUNES unreferenced aggregate
    // expressions through a count, so the probability collapse (the
    // very thing under test) never executed in EITHER arm and the
    // "ratio ~1.0" was two identical pruned plans racing. The arms now
    // force full evaluation by SUMMING the score column (prune-proof:
    // the collapse feeds the result), which is also what any real
    // consumer does. See the `disp` arm for the composed-disposition
    // costs and ROUND16_NOTES.md for the corrected claim.
    val (aSec, aRows) = timed(spark, 3)(
      ScaleOps27.scoreDocsWithLm(docs, "doc_id", "text", pairs, v)
        .agg(count(lit(1)), sum(col("score_fp"))).head().getLong(0))
    val (lSec, lRows) = timed(spark, 3)(
      ScaleOps30.scoreDocsWithLmLog2(docs, "doc_id", "text", pairs, v)
        .agg(count(lit(1)), sum(col("plx_fp"))).head().getLong(0))
    println(f"PLX arith ${aSec}%.2fs rows=$aRows | " +
      f"log2 ${lSec}%.2fs rows=$lRows | ratio ${lSec / aSec}%.2f")
    require(aRows == lRows, s"scored-doc counts diverged: $aRows vs $lRows")
    spark.stop()
  }

  /** Full-DISPOSITION cost at scale under both rankings (q185 vs q191 —
    * the r16 claim): the log-domain CCNet loop (log₂ score → routed
    * per-language boundaries → strict buckets → portable-hash keeps)
    * prices at the arithmetic loop plus the chain the `plx` arm already
    * measured free — no new exchange (plan-pinned at sf0.1: q191
    * carries exactly q185's operator counts), so the ranking choice is
    * a SEMANTIC decision, not a scale trade-off. Corpus: the `plx`
    * arm's synthetic bigram distribution with the `tert` arm's skewed
    * language split (95% dominant + 8 minor, so the boundary pass
    * routes and the per-language groups are non-trivial); model
    * trained on the dominant slice, everyone scored. Also measures the
    * ABLATION at stress scale: the fraction of documents whose tertile
    * FLIPS between rankings (the pinned ~16% at sf, re-observed at
    * nDocs), and cross-checks both dispositions cover identical
    * scored-doc sets. */
  def disp(base: String, nDocs: Int): Unit = {
    import graft.ops.{ScaleOps25, ScaleOps27, ScaleOps30}
    import graft.pipeline.Packing
    val spark = session()
    val vocabN = 5000L
    // per-position multiplicative mixing (id·(A+j) mod V) PLUS per-doc
    // pseudo-random token noise, xxhash64(id, j)-seeded (r16 verdict
    // #5): the multiplicative form alone grows bigram TYPES toward V²
    // (the model joins are genuinely sort-merge-sized), but every doc's
    // 24 bigrams share one algebraic (cxy, cx) profile, so the SCORE
    // distribution collapsed to ~47 distinct (lang, score) pairs at 1M
    // docs and the stress-scale flip share read 0 — materiality was
    // only pinned at sf scale. The hash term is deterministic in
    // (doc_id, position) — no Math.random, reruns bit-stable — and
    // makes each doc's bigram profile its own draw, so scores are dense
    // and the ranking ablation is OBSERVABLE at stress scale.
    spark.range(nDocs).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(20)) === 19,
        concat(lit("minor"), pmod(col("id"), lit(8))))
        .otherwise(lit("dominant")).as("lang"),
      concat_ws(" ", (0 until 24).map(j =>
        // reduce the (full-range signed) hash mod V BEFORE adding so
        // the sum never leaves long range under ANSI arithmetic
        concat(lit("w"), pmod(col("id") * lit(2654435761L + j)
          + pmod(xxhash64(col("id"), lit(j)), lit(vocabN)),
          lit(vocabN)))): _*).as("text"))
      .repartition(16)
      .write.mode("overwrite").parquet(s"$base/docs.parquet")
    val docs = spark.read.parquet(s"$base/docs.parquet")
    val ref = docs.filter(col("lang") === "dominant")
    ScaleOps27.trainLmPairs(ref)
      .write.mode("overwrite").parquet(s"$base/pairs.parquet")
    val pairs = spark.read.parquet(s"$base/pairs.parquet")
    val v = ScaleOps27.vocabSize(ref)
    println(s"DISP n=$nDocs v=$v pair_types=${pairs.count()}")
    val langs = docs.select(col("doc_id"), col("lang"))
    def wlArith = ScaleOps27.scoreDocsWithLm(docs, "doc_id", "text", pairs, v)
      .select(col("doc_id"), col("score_fp"))
      .join(langs, Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("score_fp"))
    def wlLog = ScaleOps30.scoreDocsWithLmLog2(docs, "doc_id", "text", pairs, v)
      .select(col("doc_id"), (-col("plx_fp")).as("score_fp"))
      .join(langs, Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("score_fp"))
    val rate = when(col("bucket") === "head", ScaleOps25.Q180HeadRate)
      .when(col("bucket") === "middle", ScaleOps25.Q180MiddleRate)
      .otherwise(ScaleOps25.Q180TailRate)
    // phase decomposition, one timing each: the scored frames are
    // MATERIALIZED first (the scoring chain is the plx arm's already-
    // measured quantity), so the boundary/bucket/keep timings isolate
    // what the DISPOSITION adds per ranking — including the log
    // ranking's bigger histogram (its value domain is 62·2²⁰ vs the
    // arithmetic 10⁶ — the ScaleOps31 scale-shape constant)
    def mat(wl: DataFrame, name: String): DataFrame = {
      val t0 = System.nanoTime()
      wl.write.mode("overwrite").parquet(s"$base/$name.parquet")
      val out = spark.read.parquet(s"$base/$name.parquet")
      println(f"DISP score[$name] ${(System.nanoTime() - t0) / 1e9}%.2fs " +
        s"rows=${out.count()}")
      out
    }
    val sa = mat(wlArith, "scored_arith")
    val sl = mat(wlLog, "scored_log")
    def histRows(wl: DataFrame): Long =
      wl.groupBy(col("lang"), col("score_fp")).count().count()
    println(s"DISP hist_rows arith=${histRows(sa)} log=${histRows(sl)}")
    def phase(name: String)(body: => Long): Long = {
      val t0 = System.nanoTime()
      val n = body
      println(f"DISP $name ${(System.nanoTime() - t0) / 1e9}%.2fs n=$n")
      n
    }
    // nDocs is a valid routing upper bound; at stress scale the
    // dominant language rides the histogram arm, exactly like 100 TB
    phase("bounds[arith]")(ScaleOps25.tertileBounds(sa, nDocs.toLong).count())
    phase("bounds[log]")(ScaleOps25.tertileBounds(sl, nDocs.toLong).count())
    val aKept = phase("disposition[arith]")(
      ScaleOps25.assignTertiles(sa, nDocs.toLong)
        .filter(Packing.mixKeep(col("doc_id"), rate)).count())
    val lKept = phase("disposition[log]")(
      ScaleOps25.assignTertiles(sl, nDocs.toLong)
        .filter(Packing.mixKeep(col("doc_id"), rate)).count())
    println(s"DISP kept arith=$aKept log=$lKept")
    // materiality + coverage at stress scale: same scored set, measured
    // tertile-flip share between the rankings
    val ba = ScaleOps25.assignTertiles(sa, nDocs.toLong)
      .select(col("doc_id"), col("bucket").as("ba"))
    val bl = ScaleOps25.assignTertiles(sl, nDocs.toLong)
      .select(col("doc_id"), col("bucket").as("bl"))
    val j = ba.join(bl, Seq("doc_id"), "full")
      .agg(count(lit(1)).as("n"),
        sum((col("ba").isNull || col("bl").isNull).cast("long")).as("uncov"),
        sum((col("ba") =!= col("bl")).cast("long")).as("flips"))
      .head()
    require(j.getLong(1) == 0L,
      s"dispositions covered different doc sets: ${j.getLong(1)} unmatched")
    println(f"DISP flips=${j.getLong(2)}/${j.getLong(0)} " +
      f"(${100.0 * j.getLong(2) / j.getLong(0)}%.1f%% tertile flips between rankings)")
    spark.stop()
  }

  /** Append-lifecycle evidence (q174 /
    * [[graft.dedup.FingerprintIndex.appendIndex]]): the r12 verdict's
    * "done =" clause — append cost must track the BATCH, not the
    * history. Builds history indexes at 1× and 4× nDocs (docs carry 5
    * doc-unique shingles each), appends the SAME fixed-size batch (5%
    * of 1×) to both, and rebuilds the 4× union from raw docs for
    * contrast. Claim: append(4×)/append(1×) stays near 1 (flat in
    * history — the only history-proportional term is one pass over the
    * COMPACT 8-byte index), while rebuild re-pays the full corpus
    * shingle scan + distinct. Each append rep runs against a freshly
    * re-written base so no-op re-appends never flatter the medians. */
  def apnd(base: String, nDocs: Int): Unit = {
    import graft.dedup.FingerprintIndex
    val spark = session()
    def mkDocs(n: Int, tag: String): DataFrame =
      spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 12).map(j =>
          concat(lit(tag), col("id"), lit(s"_w$j"))): _*).as("text"))
    def materialize(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$base/$name.parquet")
      spark.read.parquet(s"$base/$name.parquet")
    }
    val h1 = materialize(mkDocs(nDocs, "h"), "hist_x1")
    val h4 = materialize(mkDocs(4 * nDocs, "h"), "hist_x4") // superset tags: x1 ⊂ x4
    val batch = materialize(mkDocs(nDocs / 20, "b"), "batch")
    val batchHashes = FingerprintIndex.shingleHashes(batch, "doc_id", "text")
      .select("h")
    def appendMedian(hist: DataFrame, path: String): (Double, Long) = {
      val runs = (1 to 3).map { _ =>
        org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(path), true)
        FingerprintIndex.writeIndex(spark,
          FingerprintIndex.buildIndex(hist, "doc_id", "text"), path)
        val t0 = System.nanoTime()
        val n = FingerprintIndex.appendIndex(spark, batchHashes, path)
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (runs.map(_._1).sorted.apply(1), runs.head._2)
    }
    val (a1, n1) = appendMedian(h1, s"$base/idx_x1")
    val (a4, n4) = appendMedian(h4, s"$base/idx_x4")
    val (reb, nr) = timed(spark, 3) {
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(s"$base/idx_reb"), true)
      FingerprintIndex.writeIndex(spark,
        FingerprintIndex.buildIndex(h4.unionByName(batch), "doc_id", "text"),
        s"$base/idx_reb")
    }
    require(n4 == nr, s"append(4x) stamped $n4 rows, rebuild stamped $nr")
    println(f"APND docs=$nDocs batch=${nDocs / 20} " +
      f"append_x1=${a1}%.2fs append_x4=${a4}%.2fs " +
      f"append_growth=${a4 / a1}%.2fx (4x history) " +
      f"rebuild_x4=${reb}%.2fs rebuild_vs_append=${reb / a4}%.2fx " +
      f"rows_x1=$n1 rows_x4=$n4")
    spark.stop()
  }

  /** Adversarial corpus for the source-overlap matrix (q171): a pool of
    * shingle types planted into EVERY source, so the hottest hashes are
    * each held by all S sources at once — the worst per-hash self-join
    * fanout C(S,2). The scale claim under stress is the DISTINCT-first
    * discipline: (source, hash) collapses raw occurrences to ≤ S rows
    * per hash BEFORE the self-join, so the join input is sources·types
    * and the pair table is C(S,2)·pool — never corpus-sized. Prints the
    * collapse factor, the pair-table row count against that bound, and
    * the matrix wall time. 30% of documents carry a pool shingle
    * (poolSize types), the rest are doc-unique. */
  def overlapSkew(base: String, nDocs: Int): Unit = {
    val spark = session()
    val dir = s"$base/docs"
    val nSrc = 24
    val poolSize = 1000
    // each document is EXACTLY one 8-token shingle: pool docs repeat one
    // of poolSize shared texts; the rest are unique per id
    // source = (id/10) mod S and pool key = (id/10) div S mod pool:
    // consecutive m = id/10 blocks sweep ALL S sources per key, so every
    // pool key is held by every source — the true worst-case fanout
    spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat(lit("src"), pmod(expr("id div 10"), lit(nSrc))).as("source"),
      when(pmod(col("id"), lit(10)) < 3,
        concat_ws(" ", (1 to 8).map(j =>
          concat(lit(s"p${j}_"),
            pmod(expr(s"(id div 10) div $nSrc"), lit(poolSize)))): _*))
        .otherwise(concat_ws(" ", (1 to 8).map(j =>
          concat(lit(s"u${j}_"), col("id"))): _*)).as("text"))
      .repartition(16)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val occ = docs.count()
    val pairs = docs.select(col("source"),
      explode(column(graft.functions.SlidingShingleHashes(
        expression(graft.text.TextAnalysis.tokens(col("text"))), 8))).as("h"))
      .distinct()
    val distinctPairs = pairs.count()
    val joinRows = pairs.as("a")
      .join(pairs.as("b"), col("a.h") === col("b.h")
        && col("a.source") < col("b.source")).count()
    val bound = poolSize.toLong * nSrc * (nSrc - 1) / 2
    println(f"OVERLAPSKEW n=$nDocs sources=$nSrc pool=$poolSize " +
      f"occurrences=$occ distinct_pairs=$distinctPairs " +
      f"collapse=${occ.toDouble / distinctPairs}%.1fx " +
      s"pair_rows=$joinRows bound=$bound within=${joinRows <= bound}")
    val (sec, rows) = timed(spark, 3)(
      graft.ops.ScaleOps23.q171SourceOverlap(spark, dir).count())
    val top = graft.ops.ScaleOps23.q171SourceOverlap(spark, dir)
      .limit(1).collect().headOption
      .map(r => s"${r.getString(1)}~${r.getString(2)} shared=${r.getLong(3)}")
      .getOrElse("none")
    println(f"OVERLAPSKEW matrix ${sec}%.2fs rows=$rows top=$top")
    spark.stop()
  }

  /** Stress the COMPOSED one-call training pipeline on a StressGen corpus
    * (the x100 run is the point: 500k docs through curation →
    * decontamination → mixing → cluster-keyed split → packing in one
    * call). Prints per-stage counts and wall clock plus PEAK block-manager
    * storage (memory + disk) sampled concurrently — the number that
    * validates the per-stage free discipline: peak must track TWO adjacent
    * stages, not the whole chain. Decontamination runs against a small
    * planted test set so that stage does real work. */
  def pipelineStress(dir: String, reuse: Boolean = true): Unit = {
    val spark = session()
    @volatile var peak = 0L
    @volatile var stop = false
    val monitor = new Thread(() => {
      while (!stop) {
        val infos = spark.sparkContext.getRDDStorageInfo
        val used = infos.map(i => i.memSize + i.diskSize).sum
        if (used > peak) peak = used
        Thread.sleep(100)
      }
    })
    monitor.setDaemon(true)
    monitor.start()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("source", concat(lit("src"), pmod(col("doc_id"), lit(8))))
    val testSet = docs.orderBy(col("doc_id")).limit(50)
      .select(col("doc_id"), col("text"))
    val t0 = System.nanoTime()
    val r = graft.pipeline.TrainingPipeline.curateToTraining(
      spark, docs, Some(testSet),
      cfg = graft.pipeline.TrainingPipeline.Config(
        curation = graft.pipeline.Curation.Params.production
          .copy(minQuality = 0.0, minTokens = 1,
            keepLangs = Seq("en", "es", "de", "fr", "und")),
        mixRates = Map("src0" -> 0.5),
        reusePairGraph = reuse),
      ledger = false)
    val total = (System.nanoTime() - t0) / 1e9
    stop = true
    r.stages.foreach(s =>
      println(f"PIPELINE stage=${s.stage}%-16s in=${s.rowsIn} out=${s.rowsOut}"))
    println(f"PIPELINE total=${total}%.1fs peak_storage=${peak / (1 << 20)}MiB " +
      f"packed=${r.stages.last.rowsOut}")
    r.free()
    spark.stop()
  }

  /** Repeat ONE registered query in a fresh JVM: isolates a bench outlier
    * from suite-interference (JIT/GC state accumulated by the 57 queries
    * that ran before it in the full Bench pass). */
  def single(name: String, dir: String, reps: Int): Unit = {
    val spark = session()
    val fn = SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001").count() // warmup: JIT + codegen
    spark.catalog.clearCache()
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      println(f"SINGLE $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }

  // --- audit mode ---------------------------------------------------------

  /** Oracle-precondition audit for the hash-mirrored queries (q19/q21/q58):
    * (a) FNV-1a-64 collision-freeness over the corpus's shingle set —
    * Spark joins on 64-bit shingle hashes while the DuckDB mirrors join on
    * the shingle STRINGS, so a collision would silently diverge them;
    * (b) no whitespace outside [ \t\n\r\f] — Spark's Java `\s` and
    * DuckDB's RE2 `\s` disagree on vertical tab and some Unicode spaces,
    * which would shift tokenization between the engines. */
  def audit(dir: String): Unit = {
    val spark = session()
    import graft.text.TextAnalysis
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val toks = graft.ops.Relational.fanOut(docs)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
    val strings = toks
      .select(explode(Dedup.shinglesOf(col("t"), 3)).as("sh"))
      .agg(countDistinct(col("sh"))).head().getLong(0)
    val hashes = Dedup.shingleTable(docs, "doc_id", "text", 3)
      .agg(countDistinct(col("sh"))).head().getLong(0)
    println(s"AUDIT $dir distinct_shingle_strings=$strings " +
      s"distinct_fnv_hashes=$hashes collisions=${strings - hashes}")
    // same precondition for q64's chunk keys (ChunkDedup joins on
    // fnv1a64(chunk) while the mirror groups on chunk strings) — audited
    // over the q64 surface: base corpus + the planted prefix rows
    locally {
      import org.apache.spark.sql.GraftSqlBridge._
      val tk = TextAnalysis.tokens(col("text"))
      val planted = docs.filter(col("doc_id") % 10 === 0).select(
        (col("doc_id") + 20000L).as("doc_id"),
        concat(array_join(slice(tk, 1, 10), " "),
          lit(" zzuniq"), col("doc_id").cast("string")).as("text"))
      val t64 = graft.ops.Relational.fanOut(docs.unionByName(planted))
        .select(TextAnalysis.tokens(col("text")).as("t"))
      val cStrings = t64.select(explode(transform(
          sequence(lit(0), (ceil(size(col("t")) / lit(10.0)).cast("int") - 1)),
          i => array_join(slice(col("t"), i * 10 + 1, lit(10)), " "))).as("c"))
        .agg(countDistinct(col("c"))).head().getLong(0)
      val cHashes = t64.select(explode(column(
          graft.functions.ChunkHashes(expression(col("t")), 10))).as("h"))
        .agg(countDistinct(col("h"))).head().getLong(0)
      println(s"AUDIT $dir distinct_chunk_strings=$cStrings " +
        s"distinct_chunk_hashes=$cHashes collisions=${cStrings - cHashes}")
    }
    val exotic = docs.filter(col("text").rlike("[\\x0b\\u0085\\u00a0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000]"))
      .count()
    println(s"AUDIT $dir docs_with_exotic_whitespace=$exotic")
    spark.stop()
  }

  // --- curve mode ---------------------------------------------------------

  /** opFilter: comma-separated op-name substring filter — re-measure one
    * op's curve after a routing change without re-running the suite. */
  def curve(base: String, reps: Int, opFilter: Option[String] = None): Unit = {
    val spark = session()
    def docs(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
    def emb(dir: String) = spark.read.parquet(s"$dir/embeddings.parquet")

    // the 100× decade joins the curve when StressGen has written it
    // (`runMain graft.StressGen <src> <base> 100`)
    val scales = Seq(1, 3, 10, 100)
      .filter(n => new java.io.File(s"$base/x$n/documents.parquet").exists())
    require(scales.nonEmpty,
      s"no StressGen corpora under $base (expected x1/x3/... dirs) — " +
        "a mistyped base must fail loudly, not record an empty green run")
    println(s"CURVE scales=${scales.mkString(",")}")
    // IVF: build+persist each index once (untimed — the 100 TB story
    // amortizes the build over many searches); search time is what curves.
    // The index dir is stamped with its source corpus (path + row count)
    // and rebuilt on mismatch, so an index left over from a previous
    // StressGen run can never silently skew search timings/results.
    // populated (untimed) below ONLY when ivf_search is in the filtered op
    // set — a `curve ... tfidf` re-measure must not pay per-scale k-means
    // builds for an op it never runs
    var idxPaths: Map[Int, String] = Map.empty
    def buildIndexes(): Unit = idxPaths = scales.map { n =>
      val dir = s"$base/x$n"
      val path = s"$base/ivf_idx_x$n"
      val stamp = s"$dir|rows=${emb(dir).count()}"
      val stampFile = java.nio.file.Paths.get(path, "_stamp")
      val reusable = java.nio.file.Files.exists(stampFile) &&
        java.nio.file.Files.readString(stampFile) == stamp
      if (!reusable) {
        val idx = graft.sim.Ivf.build(emb(dir), k = 16, iters = 3, cache = false)
        graft.sim.Ivf.writeIndex(idx, path)
        java.nio.file.Files.writeString(stampFile, stamp)
      }
      n -> path
    }.toMap

    // PQ (r9): train codebooks + persist the composed centroid-partitioned
    // code layout once per scale (untimed, stamped+reused like the IVF
    // indexes): the search curves must measure the SCAN, not the driver
    // Lloyd trains or the one-time encode pass. Training re-runs even on
    // stamp reuse — it is deterministic driver work whose VALUES the
    // search needs, and it is outside the timed region either way.
    var pqState: Map[Int, (graft.sim.Pq.PqModel, Array[(Int, Array[Float])], String)] =
      Map.empty
    def buildPq(): Unit = pqState = scales.map { n =>
      val dir = s"$base/x$n"
      val path = s"$base/pq_idx_x$n"
      val model = graft.sim.Pq.train(emb(dir), "vec_id", "embedding",
        m = 16, k = 64, iters = 3)
      val cents = graft.sim.Ivf.train(emb(dir), "vec_id", "embedding",
        k = 16, iters = 3)
      val stamp = s"$dir|rows=${emb(dir).count()}|m=16|k=64|ivfk=16"
      val stampFile = java.nio.file.Paths.get(path, "_stamp")
      val reusable = java.nio.file.Files.exists(stampFile) &&
        java.nio.file.Files.readString(stampFile) == stamp
      if (!reusable) {
        graft.sim.Pq.writeCodes(graft.sim.Pq.encodeAssigned(
          graft.sim.Ivf.assign(emb(dir), "vec_id", "embedding", cents), model), path)
        java.nio.file.Files.writeString(stampFile, stamp)
      }
      n -> ((model, cents, path))
    }.toMap

    val allOps: Seq[(String, String => Long)] = Seq(
      "jaccard_capped" -> (dir => Dedup.nearDupPairs(
        docs(dir), "doc_id", "text", k = 3, threshold = 0.5).count()),
      "minhash_lsh" -> (dir => Dedup.minhashLshPairs(
        docs(dir), "doc_id", "text", k = 3, numHashes = 32, bands = 8,
        threshold = 0.5).count()),
      // production path: band-bucket cap on (curve r6 found the uncapped
      // self-join superlinear in the 10x->100x decade — 1.4s -> 36s)
      "simhash" -> (dir => Dedup.simhashPairs(
        docs(dir), "doc_id", "text", maxDist = 3,
        maxBucket = Dedup.DefaultSimhashMaxBucket).count()),
      // 0.9 (not the q25 oracle's 0.999): the mutated replicas are near
      // but not exact twins, and the threshold must keep the exact-verify
      // stage doing real work (nonzero surviving pairs) at every scale
      "embedding_dup" -> (dir => Dedup.embeddingDupPairs(
        emb(dir), "vec_id", "embedding", threshold = 0.9, nBits = 12).count()),
      "dedup_clusters" -> { dir =>
        val d = docs(dir)
        Dedup.clusterPairs(d, "doc_id",
          Dedup.nearDupPairs(d, "doc_id", "text", k = 3, threshold = 0.5)).count()
      },
      "ivf_search" -> { dir =>
        val n = scales.find(s => dir.endsWith(s"x$s")).get
        val idx = graft.sim.Ivf.loadIndex(spark, idxPaths(n))
        val q = emb(dir).filter(col("vec_id") < 20)
        graft.sim.Ivf.search(idx, q, topK = 5, nProbe = 4).count()
      },
      // r6 additions — the linearity claims measured, not asserted:
      // chunk dedup has NO pair space (explode + df groupBy + join back)
      "chunk_dedup" -> (dir => graft.dedup.ChunkDedup.chunkStats(
        docs(dir), "doc_id", "text").count()),
      // bloom incremental dedup: distributed build over one half, map-side
      // probe of the other; counts force both split outputs
      "bloom_dedup" -> { dir =>
        val d = docs(dir)
        val bloom = graft.dedup.BloomDedup.buildContentBloom(
          d.filter(col("doc_id") % 2 === 0), "text", capacity = 2000000L)
        val (defNew, cands) = graft.dedup.BloomDedup.splitByBloom(
          d.filter(col("doc_id") % 2 === 1), "text", bloom)
        defNew.count() + cands.count()
      },
      // SemDeDup with k ∝ N (constant target cluster size — the documented
      // production rule): within-cluster pair space stays N·clusterSize/2,
      // so the curve should hold near-linear instead of the quadratic a
      // FIXED k would measure
      "semdedup" -> { dir =>
        val n = scales.find(s => dir.endsWith(s"x$s")).get
        val e = emb(dir)
        val cents = graft.sim.Ivf.train(e, "vec_id", "embedding",
          k = 16 * n, iters = 3)
        graft.dedup.SemDedup.clusterDupStats(
          graft.sim.Ivf.assign(e, "vec_id", "embedding", cents),
          threshold = 0.9).count()
      },
      // containment shares jaccard's capped candidate engine; its curve
      // should track jaccard_capped's
      "containment" -> (dir => Dedup.containmentPairs(
        docs(dir), "doc_id", "text", k = 3, threshold = 0.9).count()),
      "tfidf" -> (dir => graft.text.Relevance.tfIdfTopTerms(
        docs(dir), "doc_id", "text", k = 3).count()),
      // r7 additions — profiling/planning ops. The stress corpora carry
      // only (doc_id, text), so the inputs q72/q73 take from the real
      // documents table (n_chars, source) are derived here; the curve
      // measures the operators' scaling, not the oracle shape.
      "equidepth" -> (dir => graft.analyze.Analyze.equiDepthHistogram(
        docs(dir).withColumn("n_chars", length(col("text"))),
        "n_chars", nBins = 10).count()),
      "token_budget" -> (dir => graft.pipeline.Packing.tokenBudgetPlan(
        docs(dir)
          .withColumn("source", concat(lit("src"), pmod(col("doc_id"), lit(8))))
          .withColumn("n_tokens",
            size(graft.text.TextAnalysis.tokens(col("text"))).cast("long")),
        "source", "n_tokens",
        pmod(col("doc_id"), lit(8)).cast("long") + lit(1L)).count()),
      // includes the exact arm (distinct-token shuffle), the CMS
      // treeAggregate, and the k driver probes — the full q74 surface
      "heavy_hitters" -> (dir => graft.text.HeavyHitters
        .topTokensWithSketchCheck(docs(dir), "text", k = 10).count()),
      // canonical = the dedup_clusters pair graph + CC, plus the quality
      // features and two cluster-partitioned windows — its curve should
      // track dedup_clusters' with a near-constant window overhead
      "canonical" -> (dir => graft.dedup.Dedup.canonicalKeep(
        docs(dir), "doc_id", "text").count()),
      "source_profile" -> (dir => graft.analyze.Analyze.sourceProfile(
        docs(dir).withColumn("source",
          concat(lit("src"), pmod(col("doc_id"), lit(8)))),
        "source", "text").count()),
      // dedup_savings = the canonical CC chain + one partial-agg rollup
      // per source (q78) — expected to track canonical/dedup_clusters'
      // exponent band with a near-constant rollup overhead
      "dedup_savings" -> (dir => {
        val d = docs(dir).withColumn("source",
          concat(lit("src"), pmod(col("doc_id"), lit(8))))
        val decided = graft.dedup.Dedup.canonicalKeep(d, "doc_id", "text")
        graft.ops.ScaleOps4.dedupSavings(
          d, decided, "source", "doc_id", "text").count()
      }),
      // r9 PQ scan paths over the persisted code layouts: pq_adc =
      // exhaustive codes scan (expected ~linear — every list read, but 16x
      // fewer bytes than floats); ivfpq_search = probe-pruned partitions
      // at fixed nProbe=4 of k=16 (expected to hold well under pq_adc's
      // wall since only probed lists are read)
      "pq_adc" -> { dir =>
        val n = scales.find(s => dir.endsWith(s"x$s")).get
        val (model, _, path) = pqState(n)
        graft.sim.Pq.search(
          spark.read.parquet(path).select(col("corpus_id"), col("codes")),
          emb(dir).filter(col("vec_id") < 20), model, topK = 5).count()
      },
      "ivfpq_search" -> { dir =>
        val n = scales.find(s => dir.endsWith(s"x$s")).get
        val (model, cents, path) = pqState(n)
        graft.sim.Pq.searchIvfPq(spark.read.parquet(path), cents, model,
          emb(dir).filter(col("vec_id") < 20), topK = 5, nProbe = 4).count()
      },
      // bigram LM (q89): the token-pair shuffle — expected to track the
      // other token-exchange ops' linearity
      "bigram_lm" -> (dir =>
        graft.ops.ScaleOps5.q89BigramLm(spark, dir).count()),
      // BM25 (q91): explode→filter-to-query-terms→tf groupBy; candidate
      // rows scale with corpus but stay term-bounded — expected linear
      // with the tf exchange as the only corpus-sized shuffle
      "bm25" -> (dir =>
        graft.ops.ScaleOps6.q91Bm25(spark, dir).count()),
      // char diversity (q95): pure one-pass kernel, zero shuffles —
      // expected flat-to-linear like the other scan-stage kernels
      "char_diversity" -> (dir =>
        graft.ops.ScaleOps6.q95CharDiversity(spark, dir).count()),
      // wav_decode = the q79 pure-map codec kernel (fixture bytes built
      // in-plan, then genuinely parsed back) — expected flat-to-linear
      // with zero shuffles
      "wav_decode" -> (dir => {
        import org.apache.spark.sql.GraftSqlBridge.{column, expression}
        val media = docs(dir).select(
          col("doc_id").cast("long").as("media_id"),
          column(graft.multimodal.WavFixture(
            expression(col("doc_id").cast("long")))).as("content"))
        graft.multimodal.Multimodal.decodeWavFeatures(media).count()
      }),
      // image_decode (q101, r9): the mixed PPM/PNG auto-sniff kernel — for
      // PNG rows a full zlib inflate + CRC verify + unfilter per blob;
      // expected flat-to-linear like wav_decode (pure map, zero shuffles)
      "image_decode" -> (dir => {
        import org.apache.spark.sql.GraftSqlBridge.{column, expression}
        val media = docs(dir).select(
          col("doc_id").cast("long").as("media_id"),
          when(col("doc_id") % 2 === 0,
            column(graft.multimodal.PpmFixture(
              expression(col("doc_id").cast("long")))))
            .otherwise(column(graft.multimodal.PngFixture(
              expression(col("doc_id").cast("long"))))).as("content"))
        graft.multimodal.Multimodal.decodeImageStats(media).count()
      }),
      // transitions (q103, r9): the user-keyed lead() window over the
      // replicated events corpus (new users per replica, so the window
      // exchange scales in key cardinality too) — expected linear, the
      // one event-sized exchange dominating
      "transitions" -> (dir =>
        graft.ops.ScaleOps8.q103Transitions(spark, dir).count()),
      // ab_test (q106, r9): two distinct-collapse partial-agg passes over
      // events; everything after runs on a constant-size table — expected
      // linear with the distinct exchanges, flat tail
      "ab_test" -> (dir =>
        graft.ops.ScaleOps8.q106AbTest(spark, dir).count()),
      // sparse_sim (q133, r9): the df-capped 5-gram posting self-join —
      // the cap is RELATIVE (2% of N), so template grams are dropped at
      // every decade and the join should stay collision-bounded, not
      // quadratic; this curve is the evidence
      "sparse_sim" -> (dir =>
        graft.ops.ScaleOps12.q133SparseSim(spark, dir).count()),
      // phrase_search (q130, r9): posexplode + one doc-partitioned window
      // — expected linear
      "phrase_search" -> (dir =>
        graft.ops.ScaleOps11.q130PhraseSearch(spark, dir).count()),
      // concurrency (q123, r9): sessionize + two-pass sweep; the only
      // unpartitioned window is over |hours| rows (calendar-bounded), so
      // the curve should track the sessionize window, ~linear
      "concurrency" -> (dir =>
        graft.ops.ScaleOps10.q123Concurrency(spark, dir).count()),
      // cusum (q129, r9): one (type, day) partial agg then tiny windows —
      // expected linear with a flat tail
      "cusum" -> (dir =>
        graft.ops.ScaleOps11.q129Cusum(spark, dir).count()),
      // rrf_fusion (q131, r9): 10 broadcast queries × corpus scoring +
      // two per-query corpus-sized window sorts — expected ~linear·log
      "rrf_fusion" -> (dir =>
        graft.ops.ScaleOps11.q131RrfFusion(spark, dir).count()),
      // jl_project (q136, r9): pure map, 16 fused dot kernels per row —
      // expected linear
      "jl_project" -> (dir =>
        graft.ops.ScaleOps12.q136JlProject(spark, dir).count()),
      // skip_grams (q152, r10): 6-way probe explode + (doc,pos) equi-join
      // + pair count — expected linear (pair space is 6·tokens, Zipf-hot
      // pairs fold map-side)
      "skip_grams" -> (dir =>
        graft.ops.ScaleOps18.q152SkipGrams(spark, dir).count()),
      // pmi_lift (q153, r10): bigram/unigram partial aggs + vocab-sized
      // marginal joins — expected linear with a vocab-bounded tail
      "pmi_lift" -> (dir =>
        graft.ops.ScaleOps18.q153PmiLift(spark, dir).count()),
      // incr_dedup (q157, r10): history-distinct + batch semi-join on the
      // 8-byte shingle hash — expected linear (both sides are one
      // hash-partitioned pass; replicas share shingles so the history
      // set stays near-constant while the batch side scales)
      "incr_dedup" -> (dir =>
        graft.ops.ScaleOps18.q157IncrementalDedup(spark, dir).count()))

    val opsRun = opFilter match {
      case None => allOps
      case Some(f) =>
        val pats = f.split(",").toSeq
        allOps.filter { case (name, _) => pats.exists(name.contains) }
    }
    require(opsRun.nonEmpty,
      s"op filter '${opFilter.getOrElse("")}' matches nothing; " +
        s"available: ${allOps.map(_._1).mkString(", ")}")
    if (opsRun.exists(_._1 == "ivf_search")) buildIndexes()
    if (opsRun.exists(p => p._1 == "pq_adc" || p._1 == "ivfpq_search")) buildPq()

    // warmup (JIT + codegen) on the smallest corpus
    opsRun.foreach { case (_, f) => f(s"$base/x1") }
    spark.catalog.clearCache()

    val results = for ((name, f) <- opsRun) yield {
      val pts = scales.map { n =>
        val (sec, rows) = timed(spark, reps)(f(s"$base/x$n"))
        println(f"CURVE $name x$n%-3d ${sec}%.2fs rows=$rows")
        (n.toDouble, sec)
      }
      // least-squares slope of ln t vs ln n over the 3 points
      val xs = pts.map(p => math.log(p._1)); val ys = pts.map(p => math.log(p._2))
      val xm = xs.sum / xs.size; val ym = ys.sum / ys.size
      val e = xs.zip(ys).map { case (x, y) => (x - xm) * (y - ym) }.sum /
        xs.map(x => (x - xm) * (x - xm)).sum
      println(f"CURVE $name exponent=${e}%.2f")
      name -> e
    }
    val worst = results.maxBy(_._2)
    println(f"CURVE worst ${worst._1} exponent=${worst._2}%.2f")
    spark.stop()
  }

  // --- skew mode ----------------------------------------------------------

  def skew(base: String): Unit = {
    val spark = session()
    val cap = Dedup.DefaultNearDupMaxDf
    // warmup both plan shapes (JIT + codegen) before any timing
    val w = spark.read.parquet(s"$base/skew1/documents.parquet")
    Dedup.nearDupPairs(w, "doc_id", "text", k = 3, threshold = 0.5).count()
    spark.catalog.clearCache()
    Dedup.jaccardPairs(w, "doc_id", "text", k = 3, threshold = 0.5).count()
    spark.catalog.clearCache()
    for (n <- Seq(1, 10)) {
      val dir = s"$base/skew$n"
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      // candidate-pair space Σ df·(df−1)/2, capped vs uncapped — the
      // equi-join row count the self-join must materialize
      val stats = Dedup.shingleTable(docs, "doc_id", "text", 3)
        .groupBy("sh").agg(count(lit(1)).as("df"))
        .agg(
          sum(col("df") * (col("df") - 1) / 2).as("pairs_uncapped"),
          sum(when(col("df") <= cap, col("df") * (col("df") - 1) / 2)
            .otherwise(0)).as("pairs_capped"),
          max(col("df")).as("max_df")).head()
      println(s"SKEW skew$n candidate_pairs uncapped=${stats.get(0)} " +
        s"capped=${stats.get(1)} max_df=${stats.get(2)}")
      spark.catalog.clearCache()
      val (capSec, capRows) = timed(spark, 3)(
        Dedup.nearDupPairs(docs, "doc_id", "text", k = 3, threshold = 0.5).count())
      println(f"SKEW skew$n capped_path ${capSec}%.2fs pairs=$capRows")
      if (n == 1) { // uncapped contrast is affordable at 1× only
        val (unSec, unRows) = timed(spark, 3)(
          Dedup.jaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.5).count())
        println(f"SKEW skew$n uncapped_path ${unSec}%.2fs pairs=$unRows")
      }
    }
    spark.stop()
  }

  // --- legacy fact-table mode ---------------------------------------------

  def facts(dir: String): Unit = {
    val spark = session()
    val qs = Seq(
      "q01_pricing_summary", "q02_filter_scan", "q03_join_revenue",
      "q08_topk", "q12_rollup", "q33_cube", "q38_range_join",
      // text layer over the token-mutated 10x documents corpus (every
      // shingle distinct across replicas -> df flat, corpus 10x: the
      // fair "new text" scaling shape, not pathological duplication)
      "q15_dedup_exact", "q16_token_count", "q17_quality_score",
      "q18_lang_id", "q19_ngram_jaccard", "q21_minhash_lsh", "q22_simhash",
      "q23_fingerprint", "q57_repetition",
      // r6 text/pipeline additions with linearity claims to check at 100×
      "q64_chunk_dedup", "q65_tfidf", "q69_stratified_sample",
      // r9 batch-2 fact-table ops: SCD2 (one business-key exchange) and
      // z-order layout profiling (one zbucket aggregation exchange)
      "q93_scd2", "q94_zorder",
      // r9 batch-3: integer PageRank — the Pregel-round join/groupBy pair
      // over the N×-replicated trade graph
      "q96_pagerank",
      // r9 batch-9/11 fact-table ops: basket pair generation (per-order
      // self-join — quadratic only in basket size), frontier BFS over the
      // replicated co-purchase graph, Benford/MAD scans, key-skew report
      // (events in the facts corpus is a byte copy — q123 runs on the
      // CURVE corpora where events replicate; here the fact tables scale)
      "q124_basket_lift", "q125_benford", "q126_mad_outliers",
      "q127_bfs_hops", "q135_skew_report")
    qs.foreach { n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count() }
    spark.catalog.clearCache()
    for (rep <- 1 to 2) qs.foreach { n =>
      val t0 = System.nanoTime()
      // per-query catch: a stale corpus (e.g. documents written before
      // lang/source were preserved) must cost ONE query's timing and say
      // why, not abort the rest of the protocol
      try {
        SparkEntry.queries(n)(spark, dir).count()
        println(f"STRESS rep$rep $n ${(System.nanoTime() - t0) / 1e9}%.2f")
      } catch {
        // NonFatal only: an OOM/VM error must abort the protocol (timings
        // after it are meaningless); getMessage is null-guarded so the
        // handler can't itself throw and kill the remaining reps.
        case scala.util.control.NonFatal(e) =>
          val msg = Option(e.getMessage).iterator
            .flatMap(_.linesIterator).find(_.nonEmpty).getOrElse(e.toString)
          println(s"STRESS rep$rep $n FAILED ${e.getClass.getSimpleName}: " +
            s"$msg (stale corpus? regenerate with StressGen)")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }

  /** Classifier training-cost rep (q176): train the batch perceptron on
    * n and 4n synthetic docs. The claim under test: cost scales
    * ~LINEARLY in corpus size and nothing else — K bounded epochs, each
    * one token-sized partial agg + a broadcast of 65 longs; the model,
    * the driver traffic, and the epoch count are all corpus-independent.
    * A super-linear ratio (≳ 6× for the 4× corpus) means an epoch is
    * paying something corpus-quadratic and the rep fails the claim. */
  def clf(base: String, nDocs: Int): Unit = {
    val spark = session()
    def mkDocs(n: Int): DataFrame =
      spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 16).map(j =>
          concat(lit("w"), (col("id") * 31 + lit(j)) % 9973)): _*).as("text"),
        when(col("id") % 4 < 2, "en").otherwise("zz").as("lang"))
    def materialize(n: Int, name: String): DataFrame = {
      mkDocs(n).write.mode("overwrite").parquet(s"$base/$name.parquet")
      spark.read.parquet(s"$base/$name.parquet")
    }
    val x1 = materialize(nDocs, "clf_x1")
    val x4 = materialize(4 * nDocs, "clf_x4")
    // warm the codegen/JIT path once on the small corpus
    graft.ops.ScaleOps25.trainClassifier(spark, x1)
    def timedTrain(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      val w = graft.ops.ScaleOps25.trainClassifier(spark, df)
      require(w.exists(_ != 0L), "training degenerated to a zero model")
      (System.nanoTime() - t0) / 1e9
    }
    val s1 = timedTrain(x1)
    val s4 = timedTrain(x4)
    println(f"CLF x1($nDocs docs) ${s1}%.2fs  x4(${4 * nDocs}) ${s4}%.2fs  " +
      f"ratio ${s4 / s1}%.2f (linear target ~4, fail > 6)")
    require(s4 / s1 < 6.0,
      f"classifier training scaled super-linearly: ${s4 / s1}%.2fx for a 4x corpus")
    spark.stop()
  }
}
