package graft

import java.nio.file.Files
import graft.streaming.Streaming
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends GraftSuite {
  import spark.implicits._

  test("file ingest stream: landed CSV files append to the parquet sink exactly once") {
    val in = tempDir("stream_in"); val out = tempDir("stream_out")
    val ckpt = tempDir("stream_ckpt")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType)))
    writeFile(in, "a.csv", "id,name\n1,x\n2,y\n")
    val q = Streaming.fileIngest(spark, in.toString, schema, "csv", ",",
      out.toString, ckpt.toString)
    try {
      q.processAllAvailable()
      writeFile(in, "b.csv", "id,name\n3,z\n")
      q.processAllAvailable()
      val got = spark.read.parquet(out.toString)
      assert(got.count() == 3)
      assert(got.agg(sum("id")).head().getLong(0) == 6)
    } finally q.stop()
  }

  test("curation stream: same survivors as the batch pipeline on a replay") {
    val in = tempDir("stream_cur_in"); val ckpt = tempDir("stream_cur_ckpt")
    val docs = Seq(
      (1L, "the cat and the dog of the house sit in the sun for a while today", "2024-01-01 00:00:01"),
      (2L, "the cat and the dog of the house sit in the sun for a while today", "2024-01-01 00:00:02"), // dup
      (3L, "short text", "2024-01-01 00:00:03"),                                  // < minTokens
      (4L, "zzz qqq www rrr ttt yyy uuu iii ooo ppp aaa sss", "2024-01-01 00:00:04"), // lang und
      (5L, "the quick brown fox jumps over the lazy dog and runs to the river", "2024-01-01 00:00:05"))
    docs.toDF("doc_id", "text", "ts_str")
      .withColumn("ts", to_timestamp($"ts_str")).drop("ts_str")
      .write.mode("overwrite").parquet(in.toString)
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("ts", TimestampType))))
      .parquet(in.toString)
    val params = graft.pipeline.Curation.Params(minQuality = 0.3, minTokens = 10)
    val cur = Streaming.curationStream(stream, "doc_id", "text", "ts", "10 minutes", params)
    val q = cur.writeStream.format("memory").queryName("curout")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
    // batch keeps min-id of a dup group; the single-batch replay keeps one
    // of the two identical texts — compare surviving TEXT sets + count
    val got = spark.table("curout")
    val batch = graft.pipeline.Curation.curate(
      docs.map(d => (d._1, d._2)).toDF("doc_id", "text"), "doc_id", "text", params)
    assert(got.count() == batch.count())
    assert(got.select("text").collect().map(_.getString(0)).toSet ==
      batch.select("text").collect().map(_.getString(0)).toSet)
    // gates agree row-for-row on the metrics columns
    assert(got.select("lang_pred").collect().map(_.getString(0)).toSet == Set("en"))
  }

  test("curation stream scrubs PII statelessly when enabled") {
    val in = tempDir("stream_pii_in"); val ckpt = tempDir("stream_pii_ckpt")
    Seq((1L,
      "the cat and the dog of the house mail me at j.doe@example.org for more sun today",
      "2024-01-01 00:00:01"))
      .toDF("doc_id", "text", "ts_str")
      .withColumn("ts", to_timestamp($"ts_str")).drop("ts_str")
      .write.mode("overwrite").parquet(in.toString)
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("ts", TimestampType))))
      .parquet(in.toString)
    val cur = Streaming.curationStream(stream, "doc_id", "text", "ts", "10 minutes",
      graft.pipeline.Curation.Params(minQuality = 0.0, minTokens = 1), scrubPii = true)
    val q = cur.writeStream.format("memory").queryName("piiout")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
    val txt = spark.table("piiout").select("text").head().getString(0)
    assert(txt.contains("[EMAIL]") && !txt.contains("example.org"), txt)
  }

  test("streaming decontamination drops exact test-set matches, stateless") {
    val in = tempDir("stream_dc_in"); val ckpt = tempDir("stream_dc_ckpt")
    Seq(
      (1L, "we hold these truths to be self evident", "2024-01-01 00:00:01"),
      (2L, "a perfectly clean training document here", "2024-01-01 00:00:02"))
      .toDF("doc_id", "text", "ts_str")
      .withColumn("ts", to_timestamp($"ts_str")).drop("ts_str")
      .write.mode("overwrite").parquet(in.toString)
    val test = Seq((101L, "we hold these truths to be self evident")).toDF("doc_id", "text")
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("ts", TimestampType))))
      .parquet(in.toString)
    val out = Streaming.decontaminateStream(stream, test, "text")
    val q = out.writeStream.format("memory").queryName("dcout")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
    val ids = spark.table("dcout").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L), s"got $ids")
    // agrees with the batch exact detector on the same data
    val batch = graft.dedup.Dedup.decontaminate(
      Seq((1L, "we hold these truths to be self evident"),
        (2L, "a perfectly clean training document here")).toDF("doc_id", "text"),
      test, "doc_id", "text")
    assert(batch.select("doc_id").collect().map(_.getLong(0)).toSet == ids)
  }

  test("windowed counts with watermark match the batch equivalent") {
    val in = tempDir("stream_w_in"); val ckpt = tempDir("stream_w_ckpt")
    val rows = Seq(
      ("2024-01-01 00:00:10", "click", 1.0),
      ("2024-01-01 00:00:50", "click", 2.0),
      ("2024-01-01 00:01:10", "view", 3.0),
      ("2024-01-01 00:02:30", "click", 4.0))
    rows.toDF("ts_str", "event_type", "value")
      .withColumn("ts", to_timestamp($"ts_str")).drop("ts_str")
      .write.mode("overwrite").parquet(in.toString)

    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("event_type", StringType), StructField("value", DoubleType),
        StructField("ts", TimestampType))))
      .parquet(in.toString)
    val agg = Streaming.windowedCounts(stream, "ts", "event_type",
      "1 minute", "1 minute", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("winout")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
    // append mode only emits finalized windows; check totals via complete
    // batch computation instead
    val batch = Streaming.windowedCounts(
      spark.read.parquet(in.toString), "ts", "event_type",
      "1 minute", "1 minute", "10 minutes")
    val b = batch.orderBy("window_start", "event_type").collect()
    assert(b.length == 3)
    assert(b(0).getAs[Long]("n") == 2) // two clicks in minute 0
  }

  test("stateful sessionization matches the batch window reference") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      Streaming.Event(1L, ts("2024-01-01 00:00:00"), "a"),
      Streaming.Event(1L, ts("2024-01-01 00:00:30"), "b"),
      Streaming.Event(1L, ts("2024-01-01 00:10:00"), "c"), // gap > 5min ⇒ new session
      Streaming.Event(2L, ts("2024-01-01 00:00:05"), "a"))
    val gapMs = 5 * 60 * 1000L

    val batch = Streaming.sessionizeBatch(
      events.toDF(), "user_id", "ts", gapMs)
      .orderBy("user_id", "session_start").collect()
    assert(batch.length == 3)
    assert(batch(0).getAs[Long]("n_events") == 2)
    assert(batch(1).getAs[Long]("n_events") == 1)
    assert(batch(2).getAs[Long]("n_events") == 1)

    // streaming path: closed sessions are emitted when a later event opens
    // a new one; the final open sessions stay in state (emitted on timeout)
    val in = tempDir("sess_in")
    events.toDS.write.mode("overwrite").parquet(in.toString)
    val stream = spark.readStream.schema(events.toDS.schema).parquet(in.toString)
      .as[Streaming.Event]
    val sessions = Streaming.sessionize(stream, gapMs, idleTimeout = false)
    // AvailableNow: process the backlog then stop — processAllAvailable
    // never settles under ProcessingTimeTimeout (timeouts keep scheduling
    // batches)
    val q = sessions.writeStream.format("memory").queryName("sessout")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000L), "stream did not drain in time")
      val emitted = spark.table("sessout").collect()
      // user 1's first session (2 events) closed when event c arrived
      assert(emitted.length == 1)
      assert(emitted.head.getAs[Int]("n_events") == 2)
    } finally q.stop()
  }

  test("events table runs through the streaming window path (batch parity)") {
    // same aggregation shape as q14_time_bucket but through readStream
    val dir = "/root/testdata/sf0.001"
    val batchEvents = graft.ops.Relational.events(spark, dir)
    val hourly = Streaming.windowedCounts(batchEvents, "ts", "event_type",
      "1 hour", "1 hour", "1 hour")
    assert(hourly.count() > 0)
  }

  test("streaming dedup drops watermark-window duplicates exactly once") {
    val in = tempDir("dedup_in"); val ckpt = tempDir("dedup_ckpt")
    val rows = Seq(
      (1L, "2024-01-01 00:00:00", "a"),
      (1L, "2024-01-01 00:00:20", "a-dup"),   // same key within watermark
      (2L, "2024-01-01 00:00:30", "b"),
      (3L, "2024-01-01 00:01:00", "c"))
    rows.toDF("k", "ts_str", "payload")
      .withColumn("ts", to_timestamp($"ts_str")).drop("ts_str")
      .write.mode("overwrite").parquet(in.toString)
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("k", LongType), StructField("payload", StringType),
        StructField("ts", TimestampType))))
      .parquet(in.toString)
    val deduped = Streaming.streamingDedup(stream, "ts", "10 minutes", Seq("k"))
    val q = deduped.writeStream.format("memory").queryName("dedupout")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000L), "stream did not drain in time")
      val got = spark.table("dedupout")
      assert(got.count() == 3)
      assert(got.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch interval join") {
    val inL = tempDir("ssj_l"); val inR = tempDir("ssj_r")
    def mk(rows: Seq[(Long, String)], dir: java.nio.file.Path) =
      rows.toDF("k", "ts_str").withColumn("ts", to_timestamp($"ts_str"))
        .drop("ts_str").write.mode("overwrite").parquet(dir.toString)
    mk(Seq((1L, "2024-01-01 00:00:00"), (2L, "2024-01-01 01:00:00")), inL)
    mk(Seq(
      (1L, "2024-01-01 00:30:00"),  // within 1h of left(1) → joins
      (1L, "2024-01-01 02:00:00"),  // outside → dropped
      (2L, "2024-01-01 01:59:00")), // within 1h of left(2) → joins
      inR)
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("ts", TimestampType)))
    val l = spark.readStream.schema(schema).parquet(inL.toString)
      .withColumnRenamed("ts", "lts")
    val r = spark.readStream.schema(schema).parquet(inR.toString)
      .withColumnRenamed("ts", "rts")
    val joined = Streaming.intervalJoinStream(l, r, "k", "lts", "rts",
      "2 hours", "1 HOUR")
      .select(col("l.k").as("lk"), col("l.lts"), col("r.rts"))
    val q = joined.writeStream.format("memory").queryName("ssjout")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000L), "stream did not drain in time")
      val got = spark.table("ssjout").select("lk").as[Long].collect().sorted
      assert(got.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("heavy hitters stream: MG bounds hold vs exact counts, state bounded, resumes across batches") {
    val in = tempDir("stream_hh_in"); val ckpt = tempDir("stream_hh_ckpt")
    // skewed corpus with vocabulary >> capacity so decrements really fire:
    // "hot" x50, "warm" x20, 100 unique fillers
    val batch1 = (Seq.fill(50)("hot") ++ Seq.fill(20)("warm") ++
      (0 until 100).map(i => s"filler$i")).zipWithIndex
      .map { case (tok, i) => (i.toLong, tok) }
    batch1.toDF("doc_id", "text").repartition(1)
      .write.mode("overwrite").parquet(in.toString)

    val sink = tempDir("stream_hh_sink")
    def run(): Unit = {
      val stream = spark.readStream
        .schema(StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType))))
        .parquet(in.toString)
      val out = Streaming.heavyHittersStream(stream, "text",
        nShards = 2, capacity = 4)
      // foreachBatch (not the memory sink): the restart half of this test
      // needs checkpoint recovery, which the memory sink refuses
      val q = out.writeStream
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[Streaming.HeavyHitterCandidate], _: Long) =>
          ds.write.mode("append").parquet(sink.toString); () }
        .option("checkpointLocation", ckpt.toString)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    // latest emission per (shard, token) = the one with the largest
    // shard_tokens (n is monotone per shard)
    def latest() = spark.read.parquet(sink.toString)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"shard", $"token").orderBy($"shard_tokens".desc)))
      .filter($"rk" === 1).drop("rk")
    val got1 = latest().as[Streaming.HeavyHitterCandidate].collect()
    val hot1 = got1.find(_.token == "hot").get
    assert(hot1.count_lb <= 50L && 50L <= hot1.count_ub,
      s"MG bounds must bracket the exact count: $hot1")
    assert(got1.count(_.token == "warm") == 1, "freq > dec bound => guaranteed present")
    // bounded state: no shard ever holds more than `capacity` candidates
    val perShard = got1.groupBy(_.shard).view.mapValues(_.length)
    assert(perShard.values.forall(_ <= 4), perShard.toMap.toString)

    // second batch lands, query restarts from the checkpoint: MG state
    // must resume, not reset — "hot" grows to a cumulative 80
    (0 until 30).map(i => (1000L + i, "hot")).toDF("doc_id", "text")
      .repartition(1).write.mode("append").parquet(in.toString)
    run()
    val hot2 = latest().as[Streaming.HeavyHitterCandidate]
      .collect().find(_.token == "hot").get
    assert(hot2.count_lb <= 80L && 80L <= hot2.count_ub, s"cumulative: $hot2")
    assert(hot2.count_lb > hot1.count_lb, s"state resumed: $hot1 -> $hot2")
  }

  test("heavy hitters stream: evicted tokens get a retraction row, not a stale bound") {
    val in = tempDir("stream_hhr_in"); val ckpt = tempDir("stream_hhr_ckpt")
    val sink = tempDir("stream_hhr_sink")
    def run(): Unit = {
      val stream = spark.readStream
        .schema(StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType))))
        .parquet(in.toString)
      val out = Streaming.heavyHittersStream(stream, "text",
        nShards = 1, capacity = 2)
      val q = out.writeStream
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[Streaming.HeavyHitterCandidate], _: Long) =>
          ds.write.mode("append").parquet(sink.toString); () }
        .option("checkpointLocation", ckpt.toString)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      try q.processAllAvailable() finally q.stop()
    }
    // batch 1: "aa" tracked with count 2 and emitted
    Seq((1L, "aa aa bb")).toDF("doc_id", "text")
      .repartition(1).write.mode("overwrite").parquet(in.toString)
    run()
    val first = spark.read.parquet(sink.toString)
      .filter($"token" === "aa").as[Streaming.HeavyHitterCandidate]
      .collect().head
    assert(first.count_lb == 2L, first.toString)
    // batch 2: a flood of unique tokens decrements "aa" to zero — it must
    // be RETRACTED (lb=0, ub=decrements), else a latest-emission reader
    // would keep ub=2 as current while the true count can keep growing
    Seq((2L, "c1 c2 c3 c4 c5 c6 c7 c8")).toDF("doc_id", "text")
      .repartition(1).write.mode("append").parquet(in.toString)
    run()
    val latestAa = spark.read.parquet(sink.toString)
      .filter($"token" === "aa").as[Streaming.HeavyHitterCandidate]
      .collect().maxBy(_.shard_tokens)
    assert(latestAa.count_lb == 0L && latestAa.count_ub > 0L,
      s"eviction must retract the bound: $latestAa")
  }

  test("currentTopK: merged stream view == batch topTokens when capacity covers the vocabulary; MG bounds otherwise") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text")
    val in = tempDir("stream_topk_in")
    docs.repartition(1).write.mode("overwrite").parquet(in.toString)
    def emissions(name: String, nShards: Int, capacity: Int) = {
      val stream = spark.readStream.schema(docs.schema).parquet(in.toString)
      val out = Streaming.heavyHittersStream(stream, "text", nShards, capacity)
      val q = out.toDF.writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      try q.processAllAvailable() finally q.stop()
      spark.table(name)
    }
    // arm 1: capacity ≥ the whole vocabulary → MG never decrements, so
    // lb = ub = exact count and the merged view must equal the batch
    // rollup POSITIONALLY — rank, token, count, tie-break and all
    val vocab = docs.select(explode(
      graft.text.TextAnalysis.tokens($"text")).as("t"))
      .distinct().count().toInt
    val exactView = Streaming.currentTopK(
        emissions("hh_topk_exact", 4, vocab), 10)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("token"),
        r.getAs[Long]("count_lb"), r.getAs[Long]("count_ub")))
    val batch = graft.text.HeavyHitters.topTokens(docs, "text", 10)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("token"),
        r.getAs[Long]("n")))
    assert(exactView.length == batch.length)
    exactView.zip(batch).foreach { case ((vr, vt, lb, ub), (br, bt, bn)) =>
      assert(vr == br && vt == bt && lb == bn && ub == bn,
        s"stream ($vr,$vt,$lb,$ub) != batch ($br,$bt,$bn)")
    }
    // arm 2: capacity << vocabulary → decrements fire; every reported
    // candidate's [lb, ub] must still bracket the true count
    val exactCounts = docs.select(explode(
        graft.text.TextAnalysis.tokens($"text")).as("t"))
      .groupBy($"t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val boundedView = Streaming.currentTopK(
      emissions("hh_topk_bounded", 2, 8), 10).collect()
    assert(boundedView.nonEmpty)
    boundedView.foreach { r =>
      val t = r.getAs[String]("token")
      val n = exactCounts(t)
      assert(r.getAs[Long]("count_lb") <= n && n <= r.getAs[Long]("count_ub"),
        s"bounds must bracket exact: token=$t n=$n row=$r")
    }
  }

  test("bloom dedup stream: drops rows already in the historical corpus, stateless") {
    val in = tempDir("stream_bl_in"); val ckpt = tempDir("stream_bl_ckpt")
    Seq(
      (1L, "already seen last month", "2024-01-01 00:00:01"),
      (2L, "genuinely fresh content one", "2024-01-01 00:00:02"),
      (3L, "genuinely fresh content two", "2024-01-01 00:00:03"))
      .toDF("doc_id", "text", "ts_str")
      .withColumn("ts", to_timestamp($"ts_str")).drop("ts_str")
      .write.mode("overwrite").parquet(in.toString)
    val hist = Seq((100L, "already seen last month")).toDF("doc_id", "text")
    val bloom = graft.dedup.BloomDedup.buildContentBloom(hist, "text")
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("ts", TimestampType))))
      .parquet(in.toString)
    val out = Streaming.bloomDedupStream(stream, "text", bloom)
    val q = out.writeStream.format("memory").queryName("blout")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
    val ids = spark.table("blout").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L, 3L), s"got $ids")
    // stateless: agrees with the batch splitByBloom definitely-new side
    val (defNew, _) = graft.dedup.BloomDedup.splitByBloom(
      Seq((1L, "already seen last month"), (2L, "genuinely fresh content one"),
        (3L, "genuinely fresh content two")).toDF("doc_id", "text"), "text", bloom)
    assert(defNew.select("doc_id").collect().map(_.getLong(0)).toSet == ids)
  }

  test("streaming funnel: latest emission per user matches the batch funnel") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // the q99 spec fixture: full funnel / pre-signup view / no signup
    val rows = Seq(
      (1L, ts("2024-01-02 10:00:00"), 1L, "signup", 0.0),
      (2L, ts("2024-01-03 10:00:00"), 1L, "view", 0.0),
      (3L, ts("2024-01-04 10:00:00"), 1L, "click", 0.0),
      (4L, ts("2024-01-05 10:00:00"), 1L, "purchase", 0.0),
      (5L, ts("2024-01-02 09:00:00"), 2L, "view", 0.0),
      (6L, ts("2024-01-02 10:00:00"), 2L, "signup", 0.0),
      (7L, ts("2024-01-03 10:00:00"), 2L, "click", 0.0),
      (8L, ts("2024-01-02 10:00:00"), 3L, "purchase", 0.0))
    val dir = tempDir("funnel_parity")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.ops.ScaleOps7.q99Funnel(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> ((Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
        Option(r.getTimestamp(3)), Option(r.getTimestamp(4)), r.getLong(5)))).toMap

    val in = tempDir("funnel_in")
    rows.map(r => Streaming.Event(r._3, r._2, r._4)).toDS
      .write.mode("overwrite").parquet(in.toString)
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streaming.Event]].schema)
      .parquet(in.toString).as[Streaming.Event]
    val q = Streaming.funnelStream(stream)
      .writeStream.format("memory").queryName("funout")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try assert(q.awaitTermination(120000L)) finally q.stop()
    val emitted = spark.table("funout").collect()
      .map(r => r.getLong(0) -> ((Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
        Option(r.getTimestamp(3)), Option(r.getTimestamp(4)), r.getLong(5)))).toMap
    // users 1 and 2 emit their final funnel rows; user 3 (no signup, batch
    // stage 0) holds no state and emits nothing
    assert(emitted.keySet == Set(1L, 2L), emitted.toString)
    assert(emitted(1L) == batch(1L), s"${emitted(1L)} vs ${batch(1L)}")
    assert(emitted(2L) == batch(2L), s"${emitted(2L)} vs ${batch(2L)}")
    assert(batch(3L)._5 == 0L)
  }

  test("streaming funnel: stage advances across micro-batches from O(1) state") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val in = tempDir("funnel_batches")
    val ckpt = tempDir("funnel_ckpt")
    def write(name: String, evs: Seq[Streaming.Event]): Unit =
      evs.toDS.coalesce(1).write.parquet(s"$in/$name")
    write("b1", Seq(
      Streaming.Event(1L, ts("2024-01-02 10:00:00"), "signup"),
      Streaming.Event(1L, ts("2024-01-03 10:00:00"), "view")))
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Streaming.Event]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*")
      .as[Streaming.Event]
    val q = Streaming.funnelStream(stream)
      .writeStream.format("memory").queryName("funsteps")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("funsteps").collect().map(_.getLong(5)).toSeq == Seq(2L))
      // the click+purchase arrive later; state carries t_view across batches
      write("b2", Seq(
        Streaming.Event(1L, ts("2024-01-04 10:00:00"), "click"),
        Streaming.Event(1L, ts("2024-01-05 10:00:00"), "purchase")))
      q.processAllAvailable()
      val stages = spark.table("funsteps").collect().map(_.getLong(5)).sorted.toSeq
      assert(stages == Seq(2L, 4L), stages.toString)
    } finally q.stop()
  }

  test("streaming volume anomaly matches the batch q104 flags (multi-batch re-emissions)") {
    val in = tempDir("anom_in"); val ckpt = tempDir("anom_ckpt")
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // the q104 fixture: 8 quiet days then a 50-event spike on day 9 —
    // INTERLEAVED across three files so days re-emit across micro-batches
    // and currentAnomalies' latest-per-day reconstruction is load-bearing
    val all = ((0 until 8).flatMap { d =>
      (0 until (10 + d % 2)).map(i =>
        ((d * 100 + i).toLong, t(f"2024-01-${d + 1}%02d 01:00:00"), i.toLong,
          "view", 0.0))
    } ++ (0 until 50).map(i =>
      ((900 + i).toLong, t("2024-01-09 01:00:00"), i.toLong, "view", 0.0)))
    val parts = all.grouped((all.size + 2) / 3).toSeq
    parts.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .coalesce(1).write.mode("append").parquet(in.toString)
    }
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(in.toString)
    val daily = Streaming.dailyCountsStream(stream, "ts")
    val q = daily.writeStream.format("memory").queryName("anomout")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000L), "stream did not drain in time")
      val emissions = spark.table("anomout")
      // multi-batch: at least one day must have re-emitted a grown count
      val multi = emissions.groupBy("day_date").count()
        .filter(col("count") > 1).count()
      assert(multi > 0, "interleaved files should force re-emissions")
      val streamView = Streaming.currentAnomalies(emissions)
        .orderBy(col("day"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
      // batch reference over the SAME events
      val dir = tempDir("anom_batch")
      all.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batch = graft.ops.ScaleOps8.q104VolumeAnomaly(spark, dir.toString)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
      assert(streamView == batch, s"stream $streamView vs batch $batch")
      assert(streamView.last._6, "the planted spike must flag in both views")
    } finally q.stop()
  }

  test("currentChangepoint over typedDailyCountsStream is bit-identical to batch q129 (continuous CUSUM)") {
    val in = tempDir("cusum_in")
    val ckpt = tempDir("cusum_ckpt")
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // type "a": 5 days at 2/day then 5 days at 8/day (level shift at day 6);
    // type "b": flat 3/day (S≡ interior zeros, cp = earliest max-|S| day).
    // INTERLEAVED across three files so (type, day) rows re-emit and the
    // latest-per-key reconstruction is load-bearing.
    // day-interleaved across BOTH types so event time advances
    // monotonically with file order — a type-blocked layout would push
    // the watermark past the other type's early days and drop them
    val all = (0 until 10).flatMap { d =>
      val n = if (d < 5) 2 else 8
      (0 until n).map(i =>
        ((d * 100 + i).toLong, t(f"2024-02-${d + 1}%02d 03:00:00"), i.toLong,
          "a", 0.0)) ++
      (0 until 3).map(i =>
        ((5000 + d * 100 + i).toLong, t(f"2024-02-${d + 1}%02d 05:00:00"),
          i.toLong, "b", 0.0))
    }
    val parts = all.grouped((all.size + 2) / 3).toSeq
    parts.foreach { rows =>
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .coalesce(1).write.mode("append").parquet(in.toString)
    }
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(in.toString)
    val daily = Streaming.typedDailyCountsStream(stream, "event_type", "ts")
    val q = daily.writeStream.format("memory").queryName("cusumout")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000L), "stream did not drain in time")
      val emissions = spark.table("cusumout")
      val multi = emissions.groupBy("event_type", "day_date").count()
        .filter(col("count") > 1).count()
      assert(multi > 0, "interleaved files should force re-emissions")
      val streamView = Streaming.currentChangepoint(emissions)
        .orderBy(col("event_type"))
        .collect().map(r => (r.getAs[String]("event_type"),
          r.getAs[Long]("n_days"), r.getAs[Long]("total"),
          r.getAs[java.sql.Date]("cp_day").toString,
          r.getAs[Long]("s_at_cp"))).toSeq
      val dir = tempDir("cusum_batch")
      all.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batch = graft.ops.ScaleOps11.q129Cusum(spark, dir.toString)
        .collect().map(r => (r.getAs[String]("event_type"),
          r.getAs[Long]("n_days"), r.getAs[Long]("total"),
          r.getAs[java.sql.Timestamp]("cp_day").toLocalDateTime.toLocalDate.toString,
          r.getAs[Long]("s_at_cp"))).toSeq
      assert(streamView == batch, s"stream $streamView vs batch $batch")
      // the planted level shift: type a's changepoint is the last low day
      assert(streamView.find(_._1 == "a").get._4 == "2024-02-05")
    } finally q.stop()
  }

  test("currentDisorder over disorderStream is bit-identical to batch q138 (continuous disorder monitor)") {
    val in = tempDir("disorder_in")
    val ckpt = tempDir("disorder_ckpt")
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // type "a": one planted inversion (id 3 goes back 3 min) and one
    // larger late regression (id 6 back 5 min); type "b": fully ordered.
    // Files split by PRODUCER ranges (ids 1-3 | 4-6 | 7-9) so the
    // cross-batch state handoff is load-bearing (the id-3→4 pair spans
    // a batch boundary).
    val all = Seq(
      (1L, t("2024-01-01 10:00:00"), "a"), (2L, t("2024-01-01 10:04:00"), "a"),
      (3L, t("2024-01-01 10:01:00"), "a"), (4L, t("2024-01-01 10:06:00"), "a"),
      (5L, t("2024-01-01 10:10:00"), "a"), (6L, t("2024-01-01 10:05:00"), "a"),
      (7L, t("2024-01-01 10:12:00"), "b"), (8L, t("2024-01-01 10:13:00"), "b"),
      (9L, t("2024-01-01 10:14:00"), "b"))
    all.grouped(3).foreach { rows =>
      rows.map { case (id, ts, ty) => (id, ts, 1L, ty, 0.0) }
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .coalesce(1).write.mode("append").parquet(in.toString)
    }
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(in.toString)
    import spark.implicits._
    val typed = stream.select(col("event_type"), col("event_id"), col("ts"))
      .as[Streaming.SeqEvent]
    val q = Streaming.disorderStream(typed)
      .writeStream.format("memory").queryName("disout")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000L), "stream did not drain in time")
      val emissions = spark.table("disout")
      // each type must have emitted from more than one micro-batch
      assert(emissions.groupBy("event_type").count()
        .filter(col("count") > 1).count() >= 1)
      val streamView = Streaming.currentDisorder(emissions)
        .orderBy(col("event_type"))
        .collect().map(r => (r.getAs[String]("event_type"),
          r.getAs[Long]("n_pairs"), r.getAs[Long]("n_inversions"),
          r.getAs[Long]("max_backstep_ms"),
          r.getAs[Double]("inversion_share"))).toSeq
      val dir = tempDir("disorder_batch")
      all.map { case (id, ts, ty) => (id, ts, 1L, ty, 0.0) }
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batch = graft.ops.ScaleOps13.q138Disorder(spark, dir.toString)
        .collect().map(r => (r.getAs[String]("event_type"),
          r.getAs[Long]("n_pairs"), r.getAs[Long]("n_inversions"),
          r.getAs[Long]("max_backstep_ms"),
          r.getAs[Double]("inversion_share"))).toSeq
      assert(streamView == batch, s"stream $streamView vs batch $batch")
      // planted: a has 2 inversions, worst 5 min; b fully ordered
      assert(streamView == Seq(
        ("a", 5L, 2L, 300000L, 0.4), ("b", 2L, 0L, 0L, 0.0)))
    } finally q.stop()
  }

  test("incremental dedup stream: probing the persisted fingerprint index matches the batch probe (q157/q164 parity, index reloaded from disk)") {
    import graft.dedup.FingerprintIndex
    // the q157 parity split over the real corpus: evens = history (the
    // persisted index), odds = the arriving stream
    val docs = graft.ops.Relational.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val history = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val idxPath = tempDir("fp-stream").toString + "/idx"
    FingerprintIndex.writeIndex(spark,
      FingerprintIndex.buildIndex(history, "doc_id", "text"), idxPath)
    // reload STRICTLY from disk — the cross-session path: nothing below
    // touches the in-memory build above
    val index = FingerprintIndex.loadIndex(spark, idxPath)

    val in = tempDir("fp-stream-in"); val ckpt = tempDir("fp-stream-ckpt")
    batch.withColumn("ts", to_timestamp(lit("2024-01-01 00:00:01")))
      .write.mode("overwrite").parquet(in.toString)
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("ts", TimestampType))))
      .parquet(in.toString)
    val probed = Streaming.incrementalDedupStream(stream, "doc_id", "text",
      "ts", "1 hour", index)
    val q = probed.writeStream.format("memory").queryName("fpout")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()

    // latest emission per doc (a doc's shingles ride in one row → one
    // batch → its emission is final; the dedup is belt-and-braces)
    val got = spark.table("fpout")
      .groupBy("doc_id")
      .agg(max(struct(col("n_shingles"), col("n_hist_dup"), col("dup_fp"),
        col("quarantined"))).as("s"))
      .select(col("doc_id"), col("s.n_shingles"), col("s.n_hist_dup"),
        col("s.dup_fp"), col("s.quarantined"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val expect = FingerprintIndex.probe(batch, "doc_id", "text", index)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == expect,
      s"stream probe diverged: ${got.take(3)} vs ${expect.take(3)}")
    // and the batch arm itself is q157 (proven in ScaleOps21Spec) — so
    // the stream view is transitively parity-checked against the oracle
  }

  test("index rotation mid-stream: appendIndex'd hashes are live in the rotating stream's NEXT micro-batch; the stream-static form provably cannot see them") {
    import graft.dedup.FingerprintIndex
    val novel = "r1 r2 r3 r4 r5 r6 r7 r8" // ONE shingle, absent from the base index
    def freshIndex(tag: String): String = {
      val p = tempDir(tag).toString + "/idx"
      FingerprintIndex.writeIndex(spark,
        FingerprintIndex.buildIndex(
          Seq((100L, "h1 h2 h3 h4 h5 h6 h7 h8 h9")).toDF("doc_id", "text"),
          "doc_id", "text"), p)
      p
    }
    def land(in: java.nio.file.Path, id: Long): Unit =
      Seq((id, novel)).toDF("doc_id", "text")
        .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:01")))
        .write.mode("append").parquet(in.toString)
    def rotate(idxPath: String): Unit =
      FingerprintIndex.appendIndex(spark,
        FingerprintIndex.shingleHashes(
          Seq((200L, novel)).toDF("doc_id", "text"), "doc_id", "text")
          .select("h"),
        idxPath)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ts", TimestampType)))

    // --- the ROTATING form: reopens the index per micro-batch ------------
    val idxR = freshIndex("fp-rot")
    val inR = tempDir("fp-rot-in"); val outR = tempDir("fp-rot-out")
    land(inR, 1L)
    val qR = Streaming.incrementalDedupRotatingStream(
      spark.readStream.schema(schema).parquet(inR.toString),
      "doc_id", "text", idxR, outR.toString,
      tempDir("fp-rot-ckpt").toString)
    try {
      qR.processAllAvailable()
      rotate(idxR) // between micro-batches: new part files + restamp
      land(inR, 2L)
      qR.processAllAvailable()
      val got = spark.read.parquet(outR.toString)
        .select("doc_id", "n_hist_dup", "quarantined")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
        .toMap
      assert(got(1L) == ((0L, false)),
        s"doc 1 arrived BEFORE the rotation and must read clean: $got")
      assert(got(2L) == ((1L, true)),
        s"doc 2 arrived AFTER the rotation: the appended hash must be live: $got")
    } finally qR.stop()

    // --- the negative pin: the stream-static join's file listing is ------
    // snapshotted at query start, so the SAME rotation is invisible to
    // incrementalDedupStream — exactly why the rotating form exists (and
    // why its Scaladoc routes advancing-index callers there)
    val idxS = freshIndex("fp-stat")
    val inS = tempDir("fp-stat-in")
    land(inS, 1L)
    val qS = Streaming.incrementalDedupStream(
        spark.readStream.schema(schema).parquet(inS.toString),
        "doc_id", "text", "ts", "1 hour",
        FingerprintIndex.loadIndex(spark, idxS))
      .writeStream.format("memory").queryName("fpstat")
      .option("checkpointLocation", tempDir("fp-stat-ckpt").toString)
      .outputMode("update").start()
    try {
      qS.processAllAvailable()
      rotate(idxS)
      land(inS, 2L)
      qS.processAllAvailable()
      val r2 = spark.table("fpstat").filter($"doc_id" === 2).head()
      assert(r2.getAs[Long]("n_hist_dup") == 0L,
        "static-join form unexpectedly saw appended part files — if Spark's " +
          "listing semantics changed, incrementalDedupStream's Scaladoc and " +
          "this pin should both be revisited")
    } finally qS.stop()
  }

  test("compaction under rotation: append -> compactIndex between micro-batches is INVISIBLE to the rotating stream (verdicts identical to the uncompacted run, stamps unchanged, file count collapsed)") {
    import graft.dedup.FingerprintIndex
    val novel = "c1 c2 c3 c4 c5 c6 c7 c8" // ONE shingle, absent from the base
    def freshIndex(tag: String): String = {
      val p = tempDir(tag).toString + "/idx"
      FingerprintIndex.writeIndex(spark,
        FingerprintIndex.buildIndex(
          Seq((100L, "h1 h2 h3 h4 h5 h6 h7 h8 h9")).toDF("doc_id", "text"),
          "doc_id", "text"), p)
      p
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ts", TimestampType)))
    def land(in: java.nio.file.Path, id: Long): Unit =
      Seq((id, novel)).toDF("doc_id", "text")
        .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:01")))
        .write.mode("append").parquet(in.toString)
    def rotate(idxPath: String): Unit =
      FingerprintIndex.appendIndex(spark,
        FingerprintIndex.shingleHashes(
          Seq((200L, novel)).toDF("doc_id", "text"), "doc_id", "text")
          .select("h"),
        idxPath)
    // two identical streams over identical inputs; one index compacts
    // mid-stream, the other does not — the verdicts must be identical
    def run(tag: String, compact: Boolean): (Map[Long, (Long, Boolean)], Int) = {
      val idx = freshIndex(tag)
      val in = tempDir(s"$tag-in"); val out = tempDir(s"$tag-out")
      land(in, 1L)
      val q = Streaming.incrementalDedupRotatingStream(
        spark.readStream.schema(schema).parquet(in.toString),
        "doc_id", "text", idx, out.toString, tempDir(s"$tag-ckpt").toString)
      try {
        q.processAllAvailable()
        rotate(idx)
        val (rowsBefore, xorBefore) =
          (FingerprintIndex.indexRows(spark, idx),
            FingerprintIndex.indexXor(spark, idx))
        if (compact) {
          FingerprintIndex.compactIndex(spark, idx, targetFiles = 1)
          // compaction is stamp-invariant BY CONTRACT — pin it here, on
          // the live rotating path
          assert(FingerprintIndex.indexRows(spark, idx) == rowsBefore &&
            FingerprintIndex.indexXor(spark, idx) == xorBefore,
            "compactIndex changed the stamps")
        }
        land(in, 2L)
        q.processAllAvailable()
        (spark.read.parquet(out.toString)
          .select("doc_id", "n_hist_dup", "quarantined")
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
          .toMap,
          FingerprintIndex.indexDataFiles(spark, idx))
      } finally q.stop()
    }
    val (gotC, filesC) = run("fp-cmp-c", compact = true)
    val (gotU, filesU) = run("fp-cmp-u", compact = false)
    assert(gotC == gotU,
      s"mid-stream compaction changed a verdict: compacted $gotC vs $gotU")
    assert(gotC(1L) == ((0L, false)) && gotC(2L) == ((1L, true)),
      s"rotation semantics must hold under compaction too: $gotC")
    // the compaction actually did something: the append's extra part
    // files collapsed to the target on the compacted side only
    assert(filesC == 1 && filesU > 1,
      s"expected compacted=1 < uncompacted=$filesU data files")
  }

  test("torn mid-swap compaction: stamps intact but the data directory gone — the rotating stream's next micro-batch refuses LOUDLY via loadIndex, never a silent wrong verdict") {
    import graft.dedup.FingerprintIndex
    val idx = tempDir("fp-torn-cmp").toString + "/idx"
    FingerprintIndex.writeIndex(spark,
      FingerprintIndex.buildIndex(
        Seq((100L, "t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text"),
        "doc_id", "text"), idx)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ts", TimestampType)))
    val in = tempDir("fp-torn-cmp-in"); val out = tempDir("fp-torn-cmp-out")
    def land(id: Long): Unit =
      Seq((id, "t1 t2 t3 t4 t5 t6 t7 t8")).toDF("doc_id", "text")
        .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:01")))
        .write.mode("append").parquet(in.toString)
    land(1L)
    val q = Streaming.incrementalDedupRotatingStream(
      spark.readStream.schema(schema).parquet(in.toString),
      "doc_id", "text", idx, out.toString, tempDir("fp-torn-cmp-ckpt").toString)
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(out.toString).count() == 1L)
      // the compactIndex mid-swap crash window, simulated exactly: the
      // delete succeeded, the rename never ran — stamps intact, no data
      val hp = new org.apache.hadoop.fs.Path(s"$idx/hashes")
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.delete(hp, true))
      assert(FingerprintIndex.indexRows(spark, idx) > 0L,
        "the simulated crash must leave the stamps in place")
      land(2L)
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      // and nothing was emitted for the batch that hit the torn artifact
      assert(spark.read.parquet(out.toString)
        .filter($"doc_id" === 2L).count() == 0L,
        "a verdict landed from a micro-batch whose index load failed")
    } finally q.stop()
  }

  test("LM rotation mid-stream: a RETRAINED reference bigram-LM written between micro-batches scores the next batch (q183/q184 kernel); stream == batch; a torn LM refuses loudly") {
    import graft.ml.BigramLm
    val lmPath = tempDir("lm-rot").toString + "/lm"
    // model A: one known pair, vocab {a, b}
    val pairsA = Seq(("a", "b", 2L)).toDF("w1", "w2", "cxy")
    BigramLm.writeLm(spark, pairsA, 2L, lmPath)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val in = tempDir("lm-rot-in"); val out = tempDir("lm-rot-out")
    def land(id: Long): Unit =
      Seq((id, "a b c")).toDF("doc_id", "text")
        .write.mode("append").parquet(in.toString)
    land(1L)
    val q = Streaming.lmScoreStream(
      spark.readStream.schema(schema).parquet(in.toString),
      "doc_id", "text", lmPath, out.toString,
      tempDir("lm-rot-ckpt").toString)
    try {
      q.processAllAvailable()
      // rotation: retrained reference — new pair table AND new V land
      // via the side-write-then-swap; the same text must score
      // differently in the next micro-batch
      val pairsB = Seq(("a", "b", 1L), ("b", "c", 3L)).toDF("w1", "w2", "cxy")
      BigramLm.writeLm(spark, pairsB, 3L, lmPath)
      land(2L)
      q.processAllAvailable()
      val got = spark.read.parquet(out.toString)
        .select("doc_id", "score_fp", "n_oov")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val doc = Seq((9L, "a b c")).toDF("doc_id", "text")
      def batchScore(pairs: org.apache.spark.sql.DataFrame, v: Long) = {
        val r = graft.ops.ScaleOps27.scoreDocsWithLm(doc, "doc_id", "text",
          pairs, v).collect().head
        (r.getAs[Long]("score_fp"), r.getAs[Long]("n_oov"))
      }
      val sA = batchScore(pairsA, 2L); val sB = batchScore(pairsB, 3L)
      assert(got(1L) == sA && got(2L) == sB,
        s"stream scores $got must equal the batch kernel under each model ($sA, $sB)")
      assert(sA != sB, "the rotation fixture must actually change the score")
      // under model A the pair (b, c) is OOV; under model B it is not
      assert(sA._2 == 1L && sB._2 == 0L)
      // torn LM mid-stream: the next micro-batch must refuse LOUDLY
      val hp = new org.apache.hadoop.fs.Path(s"$lmPath/_rows")
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val os = fs.create(hp, true)
      try os.write("17".getBytes("UTF-8")) finally os.close()
      land(3L)
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
    } finally q.stop()
  }

  test("lmMixStream == the batch CCNet disposition: kept docs and buckets match the composed batch kernels over the real corpus, unscored docs take the tail rate, a language with no boundary row takes the tail rate") {
    import graft.ml.{BigramLm, TertileBounds}
    import graft.ops.{ScaleOps25, ScaleOps27}
    import graft.pipeline.Packing
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"), col("lang"))
    // the shipped artifacts: reference LM (en slice) + boundary table
    // computed by the batch pass over the whole scored corpus
    val ref = docs.filter(col("lang") === "en")
    val pairs = ScaleOps27.trainLmPairs(ref)
    val v = ScaleOps27.vocabSize(ref)
    val lmPath = tempDir("mix-lm").toString + "/lm"
    val bPath = tempDir("mix-bounds").toString + "/b"
    BigramLm.writeLm(spark, pairs, v, lmPath)
    val scoredWl = ScaleOps27.scoreDocsWithLm(docs, "doc_id", "text", pairs, v)
      .select(col("doc_id"), col("score_fp"))
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("score_fp"))
    TertileBounds.writeBounds(spark,
      ScaleOps25.tertileBounds(scoredWl, Long.MaxValue), bPath,
      "addk:ref=en:arith")
    // batch expectation: every doc gets a bucket (scored via the strict
    // boundary comparisons, unscored/unknown-lang coalesced to tail),
    // kept iff the portable-hash sampler keeps it at its bucket's rate
    val (hr, mr, tr) = (1.0, 0.5, 0.1)
    val assigned = ScaleOps25.bucketWithBounds(scoredWl,
      TertileBounds.loadBounds(spark, bPath))
    val extra = Seq((900001L, "a b c", "qq")) // lang with NO boundary row
    val allDocs = docs.union(extra.toDF("doc_id", "text", "lang"))
    val rate = when(col("bucket") === "head", hr)
      .when(col("bucket") === "middle", mr).otherwise(tr)
    val expect = allDocs.select(col("doc_id"), col("lang"))
      .join(assigned.select(col("doc_id"), col("bucket")), Seq("doc_id"), "left")
      .withColumn("bucket", coalesce(col("bucket"), lit("tail")))
      .filter(Packing.mixKeep(col("doc_id"), rate))
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(expect.nonEmpty)
    // drive the stream over the same corpus + the unknown-lang doc
    val in = tempDir("mix-in"); val out = tempDir("mix-out")
    docs.write.mode("append").parquet(in.toString)
    extra.toDF("doc_id", "text", "lang").write.mode("append").parquet(in.toString)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val q = Streaming.lmMixStream(
      spark.readStream.schema(schema).parquet(in.toString),
      "doc_id", "text", "lang", lmPath, bPath, hr, mr, tr,
      out.toString, tempDir("mix-ckpt").toString, "ref=en")
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(out.toString)
    assert(got.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[String]("bucket"))).toSet == expect,
      "stream kept set / buckets diverge from the batch composition")
    // unscored docs ride with a NULL score and the tail bucket; if the
    // unknown-lang doc was kept it must be tail too
    val unscored = got.filter(col("score_fp").isNull)
    assert(unscored.filter(col("bucket") =!= "tail").count() == 0L)
    assert(got.filter(col("doc_id") === 900001L)
      .collect().forall(_.getAs[String]("bucket") == "tail"))
  }

  test("boundary rotation mid-stream: re-computed tertile boundaries written between micro-batches re-bucket the next batch; a torn boundary artifact refuses loudly and emits nothing") {
    import graft.ml.{BigramLm, TertileBounds}
    val lmPath = tempDir("brot-lm").toString + "/lm"
    val bPath = tempDir("brot-b").toString + "/b"
    BigramLm.writeLm(spark, Seq(("a", "b", 1L)).toDF("w1", "w2", "cxy"), 2L, lmPath)
    // bounds A: the doc's positive score lands strictly between b1 and
    // b2 -> middle
    TertileBounds.writeBounds(spark,
      Seq(("en", 0.0, 1.0e12)).toDF("lang", "b1", "b2"), bPath,
      "addk:ref=en:arith")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val in = tempDir("brot-in"); val out = tempDir("brot-out")
    def land(id: Long, text: String): Unit =
      Seq((id, text, "en")).toDF("doc_id", "text", "lang")
        .write.mode("append").parquet(in.toString)
    land(1L, "a b")
    land(2L, "solo") // unscored: tail under ANY bounds
    val q = Streaming.lmMixStream(
      spark.readStream.schema(schema).parquet(in.toString),
      "doc_id", "text", "lang", lmPath, bPath, 1.0, 1.0, 1.0,
      out.toString, tempDir("brot-ckpt").toString, "ref=en")
    try {
      q.processAllAvailable()
      // rotation: the batch recomputed boundaries (say the corpus
      // drifted down) — the SAME text must land in a different bucket
      TertileBounds.writeBounds(spark,
        Seq(("en", -2.0, -1.0)).toDF("lang", "b1", "b2"), bPath,
        "addk:ref=en:arith")
      land(3L, "a b")
      q.processAllAvailable()
      val got = spark.read.parquet(out.toString)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[String]("bucket")).toMap
      assert(got(1L) == "middle" && got(3L) == "head",
        s"rotation must re-bucket identical text: $got")
      assert(got(2L) == "tail", s"unscored doc must ride the tail: $got")
      // torn boundary artifact: loud, and nothing emitted for the batch
      val hp = new org.apache.hadoop.fs.Path(s"$bPath/_rows")
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val os = fs.create(hp, true)
      try os.write("17".getBytes("UTF-8")) finally os.close()
      land(4L, "a b")
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(spark.read.parquet(out.toString)
        .filter(col("doc_id") === 4L).count() == 0L,
        "a mix verdict landed from a micro-batch whose boundary load failed")
    } finally q.stop()
  }

  test("lmMixStream scorer-identity seam: boundaries ranked under a DIFFERENT scorer than the stream's refuse loudly and emit nothing — the silently-wrong cross-ranking bucketing class") {
    import graft.ml.{BigramLm, TertileBounds}
    val lmPath = tempDir("bscr-lm").toString + "/lm"
    val bPath = tempDir("bscr-b").toString + "/b"
    BigramLm.writeLm(spark, Seq(("a", "b", 1L)).toDF("w1", "w2", "cxy"), 2L, lmPath)
    // boundaries ranked in the LOG domain; the stream scores arithmetic
    TertileBounds.writeBounds(spark,
      Seq(("en", 0.0, 1.0e12)).toDF("lang", "b1", "b2"), bPath,
      "addk:ref=en:log2")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val in = tempDir("bscr-in"); val out = tempDir("bscr-out")
    Seq((1L, "a b", "en")).toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(in.toString)
    val q = Streaming.lmMixStream(
      spark.readStream.schema(schema).parquet(in.toString),
      "doc_id", "text", "lang", lmPath, bPath, 1.0, 1.0, 1.0,
      out.toString, tempDir("bscr-ckpt").toString, "ref=en")
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("computed under scorer") ||
        Option(e.getCause).exists(_.getMessage.contains("computed under scorer")))
      // nothing landed: no parquet data file under the sink dir
      val landedFiles = Option(new java.io.File(out.toString).listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      assert(landedFiles.isEmpty,
        s"a mix verdict landed despite the scorer mismatch: ${landedFiles.toSeq}")
    } finally q.stop()
  }

  test("lmMixStream kernel dispatch (r15 verdict #2): the stream runs the batch's smoothing/domain kernels — (add-k, log2) and (KN, arith) each match the composed batch disposition over the real corpus") {
    import graft.ml.{BigramLm, TertileBounds}
    import graft.ops.{ScaleOps25, ScaleOps27, ScaleOps28, ScaleOps30}
    import graft.pipeline.Packing
    import graft.pipeline.TrainingPipeline.{LmSmoothing, LmScoreDomain, scorerTag}
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"), col("lang"))
    val ref = docs.filter(col("lang") === "en")
    val pairs = ScaleOps27.trainLmPairs(ref)
    val v = ScaleOps27.vocabSize(ref)
    val t = pairs.count()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val (hr, mr, tr) = (1.0, 0.5, 0.1)

    def drill(label: String, smoothing: graft.pipeline.TrainingPipeline.LmSmoothing,
        domain: graft.pipeline.TrainingPipeline.LmScoreDomain,
        batchScores: org.apache.spark.sql.DataFrame): Unit = {
      val lmPath = tempDir(s"kd-$label-lm").toString + "/lm"
      val bPath = tempDir(s"kd-$label-b").toString + "/b"
      BigramLm.writeLm(spark, pairs, v, lmPath)
      val wl = batchScores
        .select(col("doc_id"), col("score_fp"))
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("score_fp"))
      // boundaries under the DERIVED tag — exactly what a batch
      // producer sharing scorerTag would stamp
      TertileBounds.writeBounds(spark,
        ScaleOps25.tertileBounds(wl, Long.MaxValue), bPath,
        scorerTag(smoothing, "ref=en", domain))
      val rate = when(col("bucket") === "head", hr)
        .when(col("bucket") === "middle", mr).otherwise(tr)
      val expect = docs.select(col("doc_id"), col("lang"))
        .join(ScaleOps25.bucketWithBounds(wl,
            TertileBounds.loadBounds(spark, bPath))
          .select(col("doc_id"), col("bucket")), Seq("doc_id"), "left")
        .withColumn("bucket", coalesce(col("bucket"), lit("tail")))
        .filter(Packing.mixKeep(col("doc_id"), rate))
        .collect().map(r => (r.getLong(0), r.getString(2))).toSet
      assert(expect.nonEmpty, s"$label: empty batch expectation")
      val in = tempDir(s"kd-$label-in"); val out = tempDir(s"kd-$label-out")
      docs.write.mode("append").parquet(in.toString)
      val q = Streaming.lmMixStream(
        spark.readStream.schema(schema).parquet(in.toString),
        "doc_id", "text", "lang", lmPath, bPath, hr, mr, tr,
        out.toString, tempDir(s"kd-$label-ckpt").toString, "ref=en",
        smoothing, domain)
      try q.processAllAvailable() finally q.stop()
      val got = spark.read.parquet(out.toString)
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[String]("bucket"))).toSet
      assert(got == expect,
        s"$label: stream kept set/buckets diverge from the batch composition")
    }

    drill("log2", LmSmoothing.AddK, LmScoreDomain.LogPerplexity,
      ScaleOps30.scoreDocsWithLmLog2(docs, "doc_id", "text", pairs, v)
        .withColumn("score_fp", -col("plx_fp")))
    drill("kn", LmSmoothing.KneserNey, LmScoreDomain.Arithmetic,
      ScaleOps28.scoreDocsWithLmKn(docs, "doc_id", "text", pairs, v, t))
  }

  test("lmMixStream derived scorer tag (r15 advice #1 closed): a kernel/bounds RANKING mismatch refuses with zero emissions no matter what refId the caller claims — and KN+log2 refuses at construction") {
    import graft.ml.{BigramLm, TertileBounds}
    import graft.pipeline.TrainingPipeline.{LmSmoothing, LmScoreDomain}
    val lmPath = tempDir("dtag-lm").toString + "/lm"
    val bPath = tempDir("dtag-b").toString + "/b"
    BigramLm.writeLm(spark, Seq(("a", "b", 1L)).toDF("w1", "w2", "cxy"), 2L, lmPath)
    // boundaries ranked ARITHMETIC; the stream will run the log2 kernel
    TertileBounds.writeBounds(spark,
      Seq(("en", 0.0, 1.0e12)).toDF("lang", "b1", "b2"), bPath,
      "addk:ref=en:arith")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    // the vouch attempt: the caller hands the ARTIFACT'S OWN tag as
    // refId — pre-r16 this sailed through; now the derived tag is
    // "addk:<refId>:log2", which can never end ":arith", so the
    // kernel's true ranking always wins the comparison
    for (claimedRefId <- Seq("ref=en", "addk:ref=en:arith")) {
      val in = tempDir(s"dtag-in-${claimedRefId.length}")
      val out = tempDir(s"dtag-out-${claimedRefId.length}")
      Seq((1L, "a b", "en")).toDF("doc_id", "text", "lang")
        .write.mode("append").parquet(in.toString)
      val q = Streaming.lmMixStream(
        spark.readStream.schema(schema).parquet(in.toString),
        "doc_id", "text", "lang", lmPath, bPath, 1.0, 1.0, 1.0,
        out.toString, tempDir(s"dtag-ckpt-${claimedRefId.length}").toString,
        claimedRefId, LmSmoothing.AddK, LmScoreDomain.LogPerplexity)
      try {
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        assert(e.getMessage.contains("computed under scorer") ||
          Option(e.getCause).exists(_.getMessage.contains("computed under scorer")))
        val landed = Option(new java.io.File(out.toString).listFiles())
          .getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        assert(landed.isEmpty,
          s"refId '$claimedRefId' vouched a mix verdict past the ranking seam")
      } finally q.stop()
    }
    // KN + log2: refused at stream CONSTRUCTION (the batch stage's rule)
    assert(intercept[IllegalArgumentException] {
      Streaming.lmMixStream(
        spark.readStream.schema(schema).parquet(tempDir("dtag-in3").toString),
        "doc_id", "text", "lang", lmPath, bPath, 1.0, 1.0, 1.0,
        tempDir("dtag-out3").toString, tempDir("dtag-ckpt3").toString,
        "ref=en", LmSmoothing.KneserNey, LmScoreDomain.LogPerplexity)
    }.getMessage.contains("log-domain twin"))
  }

  test("lmMixStream log2 kernel survives a degenerate micro-batch (only single-token docs): the kernel's guard returns empty scores, every doc rides the tail rate, the stream keeps running — the exact production input whose runtime-empty bigram stream used to hang planning") {
    import graft.ml.{BigramLm, TertileBounds}
    import graft.pipeline.TrainingPipeline.{LmSmoothing, LmScoreDomain}
    val lmPath = tempDir("dgen-lm").toString + "/lm"
    val bPath = tempDir("dgen-b").toString + "/b"
    BigramLm.writeLm(spark, Seq(("a", "b", 1L)).toDF("w1", "w2", "cxy"), 2L, lmPath)
    TertileBounds.writeBounds(spark,
      Seq(("en", -1.0e18, 1.0e18)).toDF("lang", "b1", "b2"), bPath,
      "addk:ref=en:log2")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val in = tempDir("dgen-in"); val out = tempDir("dgen-out")
    // micro-batch 1: ONLY single-token docs — zero bigrams at runtime
    Seq((1L, "solo", "en"), (2L, "x", "en")).toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(in.toString)
    val q = Streaming.lmMixStream(
      spark.readStream.schema(schema).parquet(in.toString),
      "doc_id", "text", "lang", lmPath, bPath, 1.0, 1.0, 1.0,
      out.toString, tempDir("dgen-ckpt").toString, "ref=en",
      LmSmoothing.AddK, LmScoreDomain.LogPerplexity)
    try {
      q.processAllAvailable()
      val b1 = spark.read.parquet(out.toString)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[String]("bucket")).toMap
      assert(b1 == Map(1L -> "tail", 2L -> "tail"),
        s"unscorable docs must ride the tail, got $b1")
      // micro-batch 2: a scorable doc — the stream is still alive and
      // the kernel scores normally after the degenerate batch
      Seq((3L, "a b", "en")).toDF("doc_id", "text", "lang")
        .write.mode("append").parquet(in.toString)
      q.processAllAvailable()
      val b3 = spark.read.parquet(out.toString)
        .filter(col("doc_id") === 3L).collect()
      assert(b3.length == 1 && b3.head.getAs[String]("bucket") == "middle" &&
        b3.head.getAs[Long]("score_fp") < 0L,
        "the scorable doc must score (negated plx) and bucket after the degenerate batch")
    } finally q.stop()
  }

  test("config-drivable batch→stream hand-off (r16 verdict #4): the pipeline's lm_bounds stage PRODUCES the boundary artifact under the derived tag, buckets with the loaded table invisibly, and a stream configured from the same (smoothing, domain, refId) consumes it — keep decisions equal end to end; misconfigurations refuse loudly") {
    import graft.ml.{BigramLm, TertileBounds}
    import graft.ops.ScaleOps27
    import graft.pipeline.{Curation, TrainingPipeline}
    import graft.pipeline.TrainingPipeline.{LmSmoothing, LmScoreDomain, scorerTag}
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val params = Curation.Params(minQuality = 0.0, minTokens = 1,
      keepLangs = Seq("en", "es", "de", "fr", "und"))
    // the shared LM artifact: trained on the curated en slice — the
    // identity BOTH sides state as refId
    val curated = Curation.curate(docs, "doc_id", "text", params)
    val ref = curated.filter(col("lang_pred") === "en")
    val lmPath = tempDir("hoff-lm").toString + "/lm"
    val bPath = tempDir("hoff-b").toString + "/b"
    BigramLm.writeLm(spark, ScaleOps27.trainLmPairs(ref),
      ScaleOps27.vocabSize(ref), lmPath)
    val cfg = TrainingPipeline.Config(curation = params, ctxTokens = 256L,
      lmTertileMix = Some((1.0, 0.5, 0.1)),
      lmArtifactPath = Some(lmPath),
      lmBoundsArtifactPath = Some(bPath),
      lmBoundsRefId = Some("lm=ref0"),
      lmScoreDomain = LmScoreDomain.LogPerplexity)
    val r = TrainingPipeline.curateToTraining(spark, docs, None,
      cfg = cfg, ledger = false)
    val keptIds = r.packed.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    r.free()
    // the producer stage ran, loudly, with the boundary-table row count
    val lb = r.stages.find(_.stage == "lm_bounds")
    assert(lb.exists(s => s.rowsOut > 0 && s.rowsIn == s.rowsOut),
      s"lm_bounds stage missing or empty: ${r.stages}")
    // the artifact carries the DERIVED tag — config, not caller literal
    val tag = scorerTag(LmSmoothing.AddK, "lm=ref0", LmScoreDomain.LogPerplexity)
    assert(tag == "addk:lm=ref0:log2")
    assert(TertileBounds.boundsScorer(spark, bPath).contains(tag))
    assert(TertileBounds.boundsRows(spark, bPath) == lb.get.rowsOut)
    // producing + bucketing-with-the-loaded-artifact is INVISIBLE: the
    // same config without the producer gates the identical set
    val rPlain = TrainingPipeline.curateToTraining(spark, docs, None,
      cfg = cfg.copy(lmBoundsArtifactPath = None, lmBoundsRefId = None),
      ledger = false)
    val plainIds = rPlain.packed.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    rPlain.free()
    assert(keptIds == plainIds,
      "the lm_bounds round-trip moved documents between buckets")
    // the STREAM consumer, configured from the same pieces, re-decides
    // the batch's keeps over the same corpus — the hand-off is config
    // alone: (AddK, LogPerplexity, "lm=ref0") + the two artifact paths
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val in = tempDir("hoff-in"); val out = tempDir("hoff-out")
    curated.select(col("doc_id").cast("long").as("doc_id"), col("text"),
        col("lang_pred").as("lang"))
      .write.mode("append").parquet(in.toString)
    val q = Streaming.lmMixStream(
      spark.readStream.schema(schema).parquet(in.toString),
      "doc_id", "text", "lang", lmPath, bPath, 1.0, 0.5, 0.1,
      out.toString, tempDir("hoff-ckpt").toString, "lm=ref0",
      LmSmoothing.AddK, LmScoreDomain.LogPerplexity)
    try q.processAllAvailable() finally q.stop()
    val streamKept = spark.read.parquet(out.toString)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(streamKept == keptIds,
      s"stream kept ${streamKept.size} docs, batch kept ${keptIds.size} — " +
        "the config-driven hand-off diverged")
    // a stream stating a different RANKING refuses the shipped artifact
    val in2 = tempDir("hoff-in2")
    Seq((1L, "a b", "en")).toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(in2.toString)
    val qBad = Streaming.lmMixStream(
      spark.readStream.schema(schema).parquet(in2.toString),
      "doc_id", "text", "lang", lmPath, bPath, 1.0, 0.5, 0.1,
      tempDir("hoff-out2").toString, tempDir("hoff-ckpt2").toString,
      "lm=ref0", LmSmoothing.AddK, LmScoreDomain.Arithmetic)
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        qBad.processAllAvailable()
      }
      assert(e.getMessage.contains("computed under scorer") ||
        Option(e.getCause).exists(_.getMessage.contains("computed under scorer")))
    } finally qBad.stop()
    // misconfigured producers refuse loudly at the stage
    assert(intercept[IllegalArgumentException] {
      TrainingPipeline.curateToTraining(spark, docs, None,
        cfg = cfg.copy(lmBoundsRefId = None), ledger = false)
    }.getMessage.contains("lmBoundsRefId"))
    assert(intercept[IllegalArgumentException] {
      TrainingPipeline.curateToTraining(spark, docs, None,
        cfg = cfg.copy(lmArtifactPath = None, lmBoundsRefId = None,
          lmScoreDomain = LmScoreDomain.Arithmetic), ledger = false)
    }.getMessage.contains("reference scorer"))
    // default refId derivation: lmRefLang = en stamps "addk:ref=en:arith"
    val bPath2 = tempDir("hoff-b2").toString + "/b"
    val r2 = TrainingPipeline.curateToTraining(spark, docs, None,
      cfg = TrainingPipeline.Config(curation = params, ctxTokens = 256L,
        lmTertileMix = Some((1.0, 0.5, 0.1)), lmRefLang = Some("en"),
        lmBoundsArtifactPath = Some(bPath2)),
      ledger = false)
    r2.free()
    assert(TertileBounds.boundsScorer(spark, bPath2)
      .contains("addk:ref=en:arith"))
  }

  test("KN through the streaming rotation (r15 verdict #7): a RETRAINED LM rotates T with the artifact's _rows stamp mid-stream — stream == the batch KN kernel under each model; torn-artifact refusal unchanged") {
    import graft.ml.{BigramLm, TertileBounds}
    import graft.pipeline.TrainingPipeline.{LmSmoothing, LmScoreDomain}
    val lmPath = tempDir("knrot-lm").toString + "/lm"
    val bPath = tempDir("knrot-b").toString + "/b"
    // model A: ONE bigram type (T = 1 = the _rows stamp), vocab 2
    val pairsA = Seq(("a", "b", 2L)).toDF("w1", "w2", "cxy")
    BigramLm.writeLm(spark, pairsA, 2L, lmPath)
    // wide-open bounds so every scored doc lands middle — the drill is
    // about SCORES, the bucket just must be deterministic
    TertileBounds.writeBounds(spark,
      Seq(("en", -1.0e18, 1.0e18)).toDF("lang", "b1", "b2"), bPath,
      "kn:ref=test:arith")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val in = tempDir("knrot-in"); val out = tempDir("knrot-out")
    def land(id: Long): Unit =
      Seq((id, "a b c", "en")).toDF("doc_id", "text", "lang")
        .write.mode("append").parquet(in.toString)
    land(1L)
    val q = Streaming.lmMixStream(
      spark.readStream.schema(schema).parquet(in.toString),
      "doc_id", "text", "lang", lmPath, bPath, 1.0, 1.0, 1.0,
      out.toString, tempDir("knrot-ckpt").toString, "ref=test",
      LmSmoothing.KneserNey, LmScoreDomain.Arithmetic)
    try {
      q.processAllAvailable()
      // rotation: the retrained model has a DIFFERENT T (2 types) — the
      // artifact's _rows stamp carries it, no other metadata moved
      val pairsB = Seq(("a", "b", 1L), ("b", "c", 3L)).toDF("w1", "w2", "cxy")
      BigramLm.writeLm(spark, pairsB, 3L, lmPath)
      land(2L)
      q.processAllAvailable()
      val got = spark.read.parquet(out.toString)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Long]("score_fp")).toMap
      val doc = Seq((9L, "a b c")).toDF("doc_id", "text")
      def knScore(pairs: org.apache.spark.sql.DataFrame, v: Long, t: Long) =
        graft.ops.ScaleOps28.scoreDocsWithLmKn(doc, "doc_id", "text",
          pairs, v, t).collect().head.getAs[Long]("score_fp")
      val sA = knScore(pairsA, 2L, 1L)
      val sB = knScore(pairsB, 3L, 2L)
      assert(sA != sB, "the rotation fixture must actually change the KN score")
      assert(got(1L) == sA && got(2L) == sB,
        s"stream KN scores $got must equal the batch kernel under each " +
          s"model's (V, T): ($sA, $sB)")
      // torn LM mid-stream: loud refusal, nothing emitted for the batch
      val hp = new org.apache.hadoop.fs.Path(s"$lmPath/_rows")
      val hfs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val os = hfs.create(hp, true)
      try os.write("17".getBytes("UTF-8")) finally os.close()
      land(3L)
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(spark.read.parquet(out.toString)
        .filter(col("doc_id") === 3L).count() == 0L)
    } finally q.stop()
  }

  test("model rotation mid-stream: a RETRAINED perceptron written between micro-batches scores the next batch; stream == batch kernel; a torn model refuses loudly") {
    import graft.ml.PerceptronModel
    val modelPath = tempDir("clf-rot").toString + "/model"
    // model A: trained on en="alpha"-vocab corpus
    val trainA = Seq((0L, "alpha bravo alpha", "en"), (2L, "zulu xray", "fr"))
      .toDF("doc_id", "text", "lang")
    val wA = graft.ops.ScaleOps25.trainClassifier(spark, trainA)
    PerceptronModel.writeModel(spark, wA, modelPath)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val in = tempDir("clf-rot-in"); val out = tempDir("clf-rot-out")
    def land(id: Long): Unit =
      Seq((id, "alpha bravo", "en")).toDF("doc_id", "text", "lang")
        .write.mode("append").parquet(in.toString)
    land(1L)
    val q = Streaming.classifierScoreStream(
      spark.readStream.schema(schema).parquet(in.toString),
      "doc_id", "text", "lang", modelPath, out.toString,
      tempDir("clf-rot-ckpt").toString)
    try {
      q.processAllAvailable()
      // rotation: model B = labels flipped -> weights negate; same doc
      // text must score OPPOSITE sign in the next micro-batch
      val trainB = Seq((0L, "alpha bravo alpha", "fr"), (2L, "zulu xray", "en"))
        .toDF("doc_id", "text", "lang")
      val wB = graft.ops.ScaleOps25.trainClassifier(spark, trainB)
      PerceptronModel.writeModel(spark, wB, modelPath)
      land(2L)
      q.processAllAvailable()
      val got = spark.read.parquet(out.toString)
        .select("doc_id", "score")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val doc = Seq((9L, "alpha bravo", "en")).toDF("doc_id", "text", "lang")
      val sA = graft.ops.ScaleOps25.scoreDocs(doc, wA)
        .collect().head.getLong(1)
      val sB = graft.ops.ScaleOps25.scoreDocs(doc, wB)
        .collect().head.getLong(1)
      assert(got(1L) == sA && got(2L) == sB,
        s"stream scores $got must equal the batch kernel under each epoch's model ($sA, $sB)")
      assert(sA > 0 && sB < 0 && sB == -sA,
        "flipped labels on a disjoint-vocab corpus negate the model exactly")
      // torn model mid-stream: the next micro-batch must refuse LOUDLY,
      // never score with garbage
      val hp = new org.apache.hadoop.fs.Path(s"$modelPath/_rows")
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val os = fs.create(hp, true)
      try os.write("3".getBytes("UTF-8")) finally os.close()
      land(3L)
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
    } finally q.stop()
  }
}
