package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-relative term relevance (the TF-IDF family) — the signal behind
  * keyword extraction, topic tagging, and source-quality heuristics in
  * training-data pipelines.
  */
object Relevance {

  /** Top-`k` terms per document ranked by tf·idf.
    *
    * idf here is the UNLOGGED ratio N/df (a published tf-idf variant), so
    * the score `tf·N/df` is one exact integer product and one IEEE
    * division — engine-portable bit-for-bit. The classical `ln(N/df)`
    * variant ranks identically per term and differs only in the score's
    * scale compression, but `ln` carries no cross-engine bit-exactness
    * guarantee (Java's Math.log is 1-ulp semi-monotonic, not correctly
    * rounded), which would poison a hash-compared oracle; same trade as
    * the q51 portable split hash.
    *
    * Plan: explode → groupBy(doc,term) (partial-agg shuffle) →
    * groupBy(term) for df (second partial-agg shuffle, reused by the join
    * back on term) → broadcast the 1-row corpus count → per-doc window
    * top-k. No driver-side data beyond the single N row.
    */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    // fanOut inside the operator (the shingleTable convention) so bare
    // callers get scan parallelism for the tokenize/explode stage too
    val docs = graft.ops.Relational.fanOut(df)
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val terms = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
      .select(col("doc_id"), explode(col("tk")).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf") * col("n_docs")).cast("double") / col("df").cast("double"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"),
        col("tf"), col("df"), col("score"))
  }
}
