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

  /** Per-document boilerplate share: the fraction of a document's
    * distinct k-shingles that are corpus-COMMON (document frequency >
    * `commonDf`) — the phrase-level "how much of this doc is template
    * text" signal (license headers, navigation chrome, form letters)
    * that complements [[TextAnalysis]]'s WITHIN-document repetition
    * score and tf-idf's per-term relevance. High share + low repetition
    * = a doc that looks clean alone but is template sludge at corpus
    * level — exactly what a curation gate wants to rank down.
    *
    * Plan: the [[graft.dedup.Dedup.shingleTable]] hash table (no text
    * shuffled), one partial-agg groupBy for df, an equi-join back on the
    * shingle hash, one per-doc partial-agg rollup. All counts integer;
    * the share is a single final IEEE division — engine-portable. */
  def boilerplateShare(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, commonDf: Long = 10L): DataFrame = {
    val sh = graft.dedup.Dedup.shingleTable(df, idCol, textCol, k)
    val dfreq = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    sh.join(dfreq, "sh")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") > commonDf, 1L).otherwise(0L)).as("n_common"))
      .select(col("doc").as(idCol), col("n_shingles"), col("n_common"),
        (col("n_common").cast("double") / col("n_shingles").cast("double"))
          .as("boilerplate_share"))
  }
}
