package graft

import org.apache.spark.sql.SparkSession

/** Schema-drift canary for the driver-provided testdata tables.
  *
  * r8 lesson: the driver regenerated /root/testdata mid-round and the
  * events table's `ts` column changed physical encoding (TIMESTAMP(NANOS)
  * → native timestamp[us]); ten queries broke with nothing louder than
  * per-query stderr noise. This canary turns the next silent environment
  * change into a one-line diagnosis: every table's read-time schema is
  * checked against the known-good shape, with the handful of encodings the
  * engine intentionally supports (events.ts in either physical world)
  * listed explicitly.
  *
  * Design: assertions are on the SPARK-SIDE dtype (what the engine's
  * operators actually see), not raw parquet physical types — that is the
  * contract the queries depend on. The check is metadata-only (schema
  * inference reads footers, no data scan), so running it as a Verify
  * preamble costs milliseconds even at 100 TB table sizes.
  */
object Schemas {

  /** table → ordered (column, accepted Spark dtype simpleStrings). */
  val expected: Seq[(String, Seq[(String, Set[String])])] = Seq(
    "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> Set("timestamp", "timestamp_ntz"),
      "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> Set("timestamp", "timestamp_ntz")),
    // events.ts: bigint = TIMESTAMP(NANOS) read under nanosAsLong;
    // timestamp/timestamp_ntz = native µs. All three are supported by
    // Relational.events(); anything else is drift.
    "events" -> Seq("event_id" -> Set("bigint"),
      "ts" -> Set("bigint", "timestamp", "timestamp_ntz"),
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>"), "label" -> Set("int"))
  )

  /** The embedding dimensionality every ANN/dedup operator assumes. */
  val EmbeddingDim = 64

  /** Check every driver table under `dir`; returns drift messages (empty =
    * healthy). Missing table files are reported, extra columns are
    * reported, per-column dtype mismatches name the offender and what was
    * expected — the "pointed message" a 3 a.m. debugging session wants. */
  def check(spark: SparkSession, dir: String): Seq[String] = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true") // so NANOS-era events files remain readable
    try {
      expected.flatMap { case (table, cols) =>
        val path = s"$dir/$table.parquet"
        if (!new java.io.File(path).exists())
          Seq(s"$table: MISSING file $path")
        else util.Try(spark.read.parquet(path).schema) match {
          case util.Failure(e) =>
            Seq(s"$table: UNREADABLE ($path): ${String.valueOf(e.getMessage).take(120)}")
          case util.Success(schema) =>
            val have = schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
            val missing = cols.collect { case (c, _) if !have.contains(c) =>
              s"$table.$c: MISSING (have: ${schema.fieldNames.mkString(", ")})" }
            val drifted = cols.collect {
              case (c, ok) if have.contains(c) && !ok.contains(have(c)) =>
                s"$table.$c: dtype ${have(c)} not in accepted {${ok.mkString(", ")}}" }
            val extra = schema.fieldNames.filterNot(cols.map(_._1).toSet)
              .map(c => s"$table.$c: UNEXPECTED extra column (${have(c)})")
            missing ++ drifted ++ extra
        }
      }
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  /** Data-level canary for the one shape assumption schema can't carry:
    * embedding dim. One-row collect — bounded at any SF. */
  def checkEmbeddingDim(spark: SparkSession, dir: String): Seq[String] = {
    val path = s"$dir/embeddings.parquet"
    if (!new java.io.File(path).exists()) return Seq(s"embeddings: MISSING $path")
    val row = spark.read.parquet(path).select("embedding").limit(1).collect()
    row.headOption.map(_.getSeq[Float](0).length) match {
      case Some(EmbeddingDim) | None => Nil
      case Some(d) => Seq(s"embeddings.embedding: dim $d, engine assumes $EmbeddingDim")
    }
  }
}
