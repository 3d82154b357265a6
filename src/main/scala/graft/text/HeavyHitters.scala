package graft.text

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Heavy hitters (most frequent tokens) with a Count-Min-Sketch
  * cross-check — the 100 TB shape for "what are the dominant tokens /
  * boilerplate markers in this corpus": the exact arm is a partial-agg
  * token count (fine when the distinct-token set fits a shuffle), while
  * the CMS arm is what production runs when it does NOT — a fixed-size
  * sketch built map-side (treeAggregate, executors merge row-wise), no
  * token-key shuffle at all.
  *
  * Oracle design (q37/q67 pattern): sketch internals cannot be mirrored
  * in DuckDB, so the query emits the EXACT top-k plus the two properties
  * that make the sketch trustworthy — CMS never underestimates
  * (structural), and the overestimate stays within eps·N (holds with
  * probability ≥ confidence per query; both margins carried). DuckDB
  * mirrors the exact arm + literal true. */
object HeavyHitters {

  /** Per-token exact counts — the shared aggregate [[topTokens]] ranks
    * and [[topTokensWithSketchCheck]] also sums for the corpus total (so
    * the total costs a vocabulary-sized aggregate, not a third corpus
    * scan). */
  private def tokenCounts(docs: DataFrame, textCol: String): DataFrame =
    graft.ops.Relational.fanOut(docs.select(col(textCol).as("__text")))
      .select(explode(TextAnalysis.tokens(col("__text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))

  /** Exact top-k tokens by frequency — (count DESC, token ASC) ties. */
  def topTokens(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("token"))
    // the window input is the per-token AGGREGATE (distinct tokens), not
    // the corpus; for true web-scale vocabularies swap in GroupedTopK
    tokenCounts(docs, textCol)
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Distributed CMS over every token occurrence. Deterministic: fixed
    * seed, and CMS merge is commutative counting. */
  def tokenSketch(docs: DataFrame, textCol: String,
      eps: Double = 0.0001, confidence: Double = 0.999,
      seed: Int = 42): CountMinSketch =
    graft.ops.Relational.fanOut(docs.select(col(textCol).as("__text")))
      .select(explode(TextAnalysis.tokens(col("__text"))).as("token"))
      .as[String](Encoders.STRING)
      .rdd.treeAggregate(CountMinSketch.create(eps, confidence, seed))(
        (s, t) => { s.add(t); s },
        (a, b) => a.mergeInPlace(b))

  /** The SAME sketch built from a (token, n) count table instead of the
    * raw occurrence stream: CMS counting is additive, so add(token, n)
    * lands the identical counters as n single adds — bit-identical
    * estimates (spec-pinned against [[tokenSketch]]). Lets a caller that
    * already aggregated counts (q74's exact arm) skip a second full
    * corpus tokenize + row conversion; the vocabulary-sized input also
    * makes the treeAggregate itself far smaller. */
  def tokenSketchFromCounts(counts: DataFrame,
      eps: Double = 0.0001, confidence: Double = 0.999,
      seed: Int = 42): CountMinSketch =
    counts.select(col("token"), col("n"))
      .as[(String, Long)](Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .rdd.treeAggregate(CountMinSketch.create(eps, confidence, seed))(
        (s, tc) => { s.add(tc._1, tc._2); s },
        (a, b) => a.mergeInPlace(b))

  /** q74 surface: exact top-k with per-token sketch verification booleans.
    * The k sketch probes are a driver-side O(k) step (the q35 centroid
    * budget); the allowed overestimate is 5·eps·N tokens plus a +10
    * absolute floor (the q67 small-population guard). The 5× multiplier
    * is the q67 precedent applied to the oracle's literal-true mirror:
    * the raw eps·N bound only holds with probability ≥ confidence per
    * probe (~1% flake risk across 10 probes at 0.999), while at 5× the
    * per-probe failure odds are (1/(5e))^depth ≈ 1e-8 with depth 7 — each
    * of the sketch's depth rows exceeds 5·eps·N only with Markov
    * probability ≤ 1/(5e), independently per row. */
  def topTokensWithSketchCheck(docs: DataFrame, textCol: String, k: Int,
      eps: Double = 0.0001, confidence: Double = 0.999): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE counts aggregate feeds both the ranked top-k and the corpus
    // total (sum over the vocabulary-sized table) — a separate
    // corpus-scan sum here would tokenize 100 TB a third time for one long
    val counts = tokenCounts(docs, textCol).cache()
    try {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("token"))
      val top = counts.withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= k)
      // null on an empty/all-null corpus — no tokens means no hitters
      val totalRow = counts.agg(sum(col("n")).cast("long")).collect()(0)
      if (totalRow.isNullAt(0)) {
        Seq.empty[(Int, String, Long, Double, Boolean, Boolean)]
          .toDF("rank", "token", "n", "share",
            "cms_no_underestimate", "cms_within_eps")
      } else {
        val totalN = totalRow.getLong(0)
        // the sketch reads the CACHED count table, not the corpus — the
        // third full tokenize pass (and its row-conversion) is gone;
        // counters are bit-identical (CMS addition is commutative and
        // add(token, n) == n adds)
        val cms = tokenSketchFromCounts(counts, eps, confidence)
        val bound = math.max(10.0, 5.0 * eps * totalN)
        val rows = top.collect().map { r =>
          val token = r.getAs[String]("token")
          val exact = r.getAs[Long]("n")
          val est = cms.estimateCount(token)
          (r.getAs[Int]("rank"), token, exact,
            exact.toDouble / totalN.toDouble,
            est >= exact,                 // CMS never underestimates
            est <= exact + bound)         // overestimate within 5·eps·N (+floor)
        }
        rows.toSeq.toDF("rank", "token", "n", "share",
          "cms_no_underestimate", "cms_within_eps")
      }
    } finally counts.unpersist(blocking = false)
  }
}
