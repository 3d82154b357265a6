package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** r9 hardening: the r8 testdata refresh broke 10 queries with zero red
  * local tests (coverage-only specs never EXECUTED q09/q14/q27–q30). This
  * suite closes that class of escape three ways:
  *  1. every SparkEntry query is executed end-to-end on sf0.001;
  *  2. the schema canary is green on all shipped SFs and loud on forced
  *     drift;
  *  3. Relational.events() reads BOTH physical encodings the driver has
  *     shipped (nanos-as-long and native timestamp) to identical values.
  */
class ContractCanarySpec extends GraftSuite {

  test("every registered query executes on sf0.001 (no-throw, empties pinned)") {
    val dir = "/root/testdata/sf0.001"
    val failures = scala.collection.mutable.ListBuffer[String]()
    val empties  = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try { if (fn(spark, dir).count() == 0L) empties += name }
      catch { case e: Throwable =>
        failures += s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}" }
      graft.dedup.Dedup.freeCandidateCaches(spark)
    }
    assert(failures.isEmpty, s"queries threw:\n  ${failures.mkString("\n  ")}")
    // Queries allowed to be empty at sf0.001 ONLY — an unexpected empty is
    // a regression signal even when nothing throws. (Populated at r9 from
    // an audited run; update deliberately, not reflexively.)
    // q05: the anti-join has no unmatched rows at the smallest SF — the
    // DuckDB oracle returns the same empty set (hash-green in r8).
    val allowedEmpty = Set("q05_anti_join")
    assert(empties.toSet.subsetOf(allowedEmpty),
      s"unexpectedly empty at sf0.001: ${(empties.toSet -- allowedEmpty).toSeq.sorted.mkString(", ")}")
  }

  test("schema canary is green on every shipped SF") {
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val drift = Schemas.check(spark, s"/root/testdata/sf$sf") ++
        Schemas.checkEmbeddingDim(spark, s"/root/testdata/sf$sf")
      assert(drift.isEmpty, s"sf$sf drift:\n  ${drift.mkString("\n  ")}")
    }
  }

  test("schema canary is loud on forced drift (negative test)") {
    val dir = tempDir("canary-neg")
    // events with ts as STRING (a type the engine has never supported) and
    // a missing props column and an extra col — all three drift kinds fire
    import spark.implicits._
    Seq((1L, "2024-01-01", 7L, "click", 0.5, "x"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "surprise")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val drift = Schemas.check(spark, dir.toString)
    assert(drift.exists(_.contains("events.ts: dtype string")), drift.mkString("; "))
    assert(drift.exists(_.contains("events.props: MISSING")), drift.mkString("; "))
    assert(drift.exists(_.contains("events.surprise: UNEXPECTED")), drift.mkString("; "))
    // other tables report missing files rather than passing vacuously
    assert(drift.exists(_.startsWith("lineitem: MISSING")))
  }

  test("events() reads nanos-as-long and native-timestamp encodings to identical values") {
    val native = graft.ops.Relational.events(spark, "/root/testdata/sf0.001")
    assert(native.schema("ts").dataType == TimestampType,
      s"native path must surface TimestampType, got ${native.schema("ts").dataType}")

    // Synthesize the legacy world: same rows, ts as nanos-since-epoch long
    // (exactly what a TIMESTAMP(NANOS) file presents under nanosAsLong).
    val dir = tempDir("events-nanos")
    native
      .withColumn("ts", (unix_micros(col("ts")) * lit(1000L) + lit(789L)).as("ts"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val legacy = graft.ops.Relational.events(spark, dir.toString)
    assert(legacy.schema("ts").dataType == TimestampType)
    // sub-µs nanos (the +789) truncate away; both worlds agree row-for-row
    val mismatch = native.select("event_id", "ts")
      .except(legacy.select("event_id", "ts"))
    assert(mismatch.isEmpty, "nanos-as-long and native reads must agree after ns→µs truncation")
  }
}
