package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew + data-layout tools for the 100 TB path.
  *
  * - `saltedAggregate`: two-phase aggregation for low-cardinality /
  *   heavy-hitter grouping keys. Phase 1 groups on (keys, salt) so the hot
  *   key's rows spread across `saltBuckets` reducers; phase 2 combines the
  *   per-salt partials. Results are identical to a direct groupBy (both
  *   phases use the same associative aggregates).
  * - `saltedJoin`: big-side salting + small-side replication for skewed
  *   equi-joins that AQE's skew-join split can't fix (e.g. one key is 90%
  *   of the table). Inner joins only.
  * - `bucketedMirror`: write-once bucket layout so repeated joins on the
  *   bucket key are exchange-free (co-located).
  */
object Scale {

  /** Deterministic row salt in [0, n): hash of the given columns. */
  def salt(n: Int, cols: Seq[Column]): Column =
    pmod(xxhash64(cols: _*), lit(n.toLong))

  /** Two-phase salted sum/count aggregation. `sums` maps output column name
    * to the (pre-cast, exact) column to sum. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], sums: Map[String, Column],
      saltBuckets: Int, saltSource: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", salt(saltBuckets, saltSource))
    val partialAggs = sums.map { case (name, c) => sum(c).as(s"__p_$name") }.toSeq :+
      count(lit(1)).as("__p_n")
    val partial = salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = sums.keys.map(name => sum(col(s"__p_$name")).as(name)).toSeq :+
      sum(col("__p_n")).as("n")
    partial.groupBy(keys.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Inner equi-join with a salted big side and a `saltBuckets`-way
    * replicated small side — every reducer gets ≤ 1/saltBuckets of any hot
    * key. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltBuckets: Int, bigSaltSource: Seq[Column]): DataFrame = {
    val bigSalted = big.withColumn("__salt", salt(saltBuckets, bigSaltSource))
    val smallRep = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    bigSalted.join(smallRep, keys :+ "__salt").drop("__salt")
  }

  /** Persist `df` bucketed+sorted by `key` into the catalog: subsequent
    * equi-joins between tables bucketed the same way plan with ZERO
    * Exchange (verified in ScaleSpec). At 100 TB this is the write-once
    * layout investment that removes the shuffle from every downstream
    * join/agg on the key. */
  def bucketedMirror(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Persist `df` hive-partitioned by `partCol` (e.g. curated documents by
    * language, facts by date): a filter on the partition column prunes
    * whole directories at plan time — the scan never lists, let alone
    * reads, the excluded partitions (verified in ScaleSpec via
    * PartitionFilters). The other write-once layout investment next to
    * bucketing; at 100 TB partition pruning is the difference between
    * scanning a day and scanning a decade. */
  def partitionedMirror(df: DataFrame, table: String, partCol: String): Unit =
    df.write.mode("overwrite")
      .partitionBy(partCol)
      .format("parquet").saveAsTable(table)

  // --- driver-contract queries ------------------------------------------

  /** Salted two-phase aggregation over the pathologically-skewed
    * event_type key (5 distinct values across the whole events table).
    * Oracle: the plain GROUP BY — results must be identical. */
  def q28SaltedAgg(s: SparkSession, dir: String): DataFrame = {
    val e = Relational.events(s, dir)
    saltedAggregate(e,
      keys = Seq("event_type"),
      sums = Map("sum_value" -> col("value").cast("decimal(18,4)")),
      saltBuckets = 16,
      saltSource = Seq(col("event_id")))
      .select(col("event_type"), col("sum_value").cast("double").as("sum_value"), col("n"))
      .orderBy(col("event_type"))
  }

  val q28Sql: String =
    """SELECT event_type,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
      |  COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Salted skewed join: events (hot event_type keys) joined to a tiny
    * per-type dimension; salting spreads each hot key over 16 reducers.
    * Oracle: the plain join+agg. */
  def q29SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Relational.events(s, dir).select(col("event_type"), col("value"), col("event_id"))
    val dim = Relational.events(s, dir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("type_total"))
    val joined = saltedJoin(e, dim, Seq("event_type"), 16, Seq(col("event_id")))
    joined.groupBy(col("event_type"), col("type_total"))
      .agg(sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  }

  val q29Sql: String =
    """WITH dim AS (SELECT event_type, COUNT(*) AS type_total FROM events GROUP BY event_type)
      |SELECT e.event_type, d.type_total,
      |  CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events e JOIN dim d ON e.event_type = d.event_type
      |GROUP BY e.event_type, d.type_total
      |ORDER BY e.event_type""".stripMargin
}
