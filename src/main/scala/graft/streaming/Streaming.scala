package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming front-end.
  *
  * The reference is strictly batch (SURVEY §2 K); its closest concept is
  * checkpoint/resume. The engine keeps the file pipeline pure, so the same
  * transforms run under `readStream`: a landing directory becomes a
  * continuous ingest (micro-batched, checkpointed, exactly-once into the
  * parquet sink) — the streaming analog of the reference's
  * directory-batch-with-resume loop. Windowed aggregation and custom
  * session state come from watermarks + flatMapGroupsWithState. */
object Streaming {

  /** Continuous file ingest: every file that lands in `inputDir` is parsed
    * with the (pre-inferred) schema and appended to `outPath` exactly once.
    * Schema comes from a batch profiling pass over seed files — streaming
    * sources require a static schema, so inference runs once up front
    * (analyze.Analyze) and the stream applies it. */
  def fileIngest(spark: SparkSession, inputDir: String, schema: StructType,
      format: String, sep: String, outPath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    val df = format match {
      case "json" => reader.json(inputDir)
      case _      => reader.option("header", "true").option("sep", sep).csv(inputDir)
    }
    df.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .start()
  }

  /** Tumbling/sliding event-time window counts with a watermark bounding
    * state (late rows beyond the watermark are dropped — bounded state at
    * 100 TB/day event volume). */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowDur: String, slideDur: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur, slideDur), col(keyCol))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(keyCol), col("n"), col("sum_value"))

  /** Streaming exact dedup — the continuous form of the batch
    * `dedup.Dedup.exactDedup`: keep the first row per key, with state
    * bounded by the watermark (a duplicate arriving later than
    * `watermark` after its twin is out of scope, so per-key state is
    * dropped once the event-time watermark passes — without this the
    * state store grows with key cardinality forever, which is the thing
    * that kills exact streaming dedup at 100 TB/day). */
  def streamingDedup(df: DataFrame, tsCol: String, watermark: String,
      keyCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming decontamination: drop stream documents whose exact text
    * appears in a STATIC benchmark/test corpus — the continuous form of
    * `Dedup.decontaminate`'s exact detector, for filtering an incoming
    * crawl against held-out evaluation sets before it ever lands.
    * A stream-static left-anti equi-join on the md5: stateless (the
    * static side is a broadcast-able hash set, no streaming state at
    * all), so it runs indefinitely at scan parallelism. The n-gram
    * overlap detector needs per-(doc, test-doc) aggregation and belongs
    * in the batch decontamination pass over landed data. */
  def decontaminateStream(stream: DataFrame, test: DataFrame,
      textCol: String): DataFrame = {
    val testHashes = test.select(md5(col(textCol)).as("__h")).distinct()
    stream.withColumn("__h", md5(col(textCol)))
      .join(testHashes, Seq("__h"), "left_anti")
      .drop("__h")
  }

  /** Streaming incremental dedup against a HISTORICAL corpus via a
    * broadcast bloom filter ([[graft.dedup.BloomDedup]]): keep only rows
    * whose content hash the filter has definitely never seen. Fully
    * STATELESS — the filter rides in the task closure as a codegen
    * ref-object probe, so unlike `streamingDedup` (watermark-bounded
    * state for WITHIN-stream twins) this guards against the 100 TB
    * already on disk with zero streaming state and no join. The two
    * compose: bloom-probe first (vs history), dropDuplicatesWithinWatermark
    * second (vs the stream itself). Bloom hits are dropped here — the
    * ~fpp false-positive rows are the price of statelessness; route hits
    * to a side topic for batch exact-confirmation when recall of new
    * content matters more than pipeline simplicity. */
  def bloomDedupStream(stream: DataFrame, textCol: String,
      historical: org.apache.spark.util.sketch.BloomFilter): DataFrame =
    // coalesce: a NULL text row has no content hash, cannot duplicate
    // history, and must pass through — not be dropped by NULL-probe
    // three-valued logic (same contract as BloomDedup.splitByBloom)
    stream.filter(!coalesce(graft.functions.BloomFunctions.mightContain(
      md5(col(textCol)), historical), lit(false)))

  /** Streaming incremental dedup against a PERSISTED fingerprint index
    * ([[graft.dedup.FingerprintIndex]]) — the continuous form of
    * q157/q164 and the EXACT complement of [[bloomDedupStream]]: the
    * bloom probe is stateless but approximate (fpp false drops) and
    * whole-document; this one is exact and SHINGLE-grained — per stream
    * document, the fraction of its k-token shingles history has already
    * seen, with the q157 quarantine readout. Load the index once with
    * `FingerprintIndex.loadIndex` (validated: stamp == rows) and hand it
    * here; the stream-static LEFT join re-executes the static side per
    * micro-batch, but the parquet FILE LISTING is snapshotted when the
    * DataFrame is created (InMemoryFileIndex) — part files APPENDED to
    * the index after query start are NOT visible to this form
    * (measured, r13: the rotation spec pins it on
    * [[incrementalDedupRotatingStream]] instead). Use THIS form when
    * the index is fixed for the query's lifetime; use the rotating form
    * when the index advances mid-stream via
    * [[graft.dedup.FingerprintIndex.appendIndex]].
    *
    * Scale/state shape: the shingle explode and hash are a stateless
    * codegen projection; the join is stream-static on the 8-byte hash
    * (the index side shuffles/partitions, no streaming state); the ONLY
    * stateful operator is the per-document rollup, which groups by
    * (event-time window, doc) under the watermark so a document's state
    * is dropped once the watermark passes its window — bounded by the
    * in-flight window span, never the stream's document count. A
    * document's shingles all ride in its ONE input row, so they land in
    * one micro-batch and the rollup's update-mode emission is final for
    * that document (late duplicates of the same doc_id would re-emit —
    * upstream exact dedup's job, [[streamingDedup]]).
    *
    * Parity law (spec-checked): for documents inside a fully-ingested
    * window, rows are bit-identical to the batch
    * `FingerprintIndex.probe` (= q157/q164) on the same corpus and
    * index. Documents with < k tokens have no shingles and emit
    * nothing, exactly like the batch arm. */
  def incrementalDedupStream(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermark: String, index: DataFrame,
      k: Int = graft.dedup.FingerprintIndex.DefaultK,
      windowDur: String = "1 day"): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val ph = docs.select(col(idCol), col(tsCol),
        graft.text.TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(col(idCol), col(tsCol),
        explode(column(graft.functions.SlidingShingleHashes(
          expression(col("__t")), k))).as("h"))
    ph.join(index.withColumn("__hit", lit(1L)), Seq("h"), "left")
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hist_dup"))
      .withColumn("dup_fp",
        expr("CAST(n_hist_dup * 1000000 div n_shingles AS BIGINT)"))
      .withColumn("quarantined", col("dup_fp") >= 300000L)
      .select(col(idCol), col("n_shingles"), col("n_hist_dup"),
        col("dup_fp"), col("quarantined"))
  }

  /** ROTATION-AWARE streaming incremental dedup: the continuous loop a
    * production pipeline actually runs once the index ADVANCES while
    * the stream is up — probe a batch, quarantine, fold the clean
    * batch's hashes back in ([[graft.dedup.FingerprintIndex
    * .appendIndex]]), and have the NEXT micro-batch see them. The
    * stream-static form ([[incrementalDedupStream]]) cannot do this:
    * its parquet file listing is snapshotted at query start, so
    * appended part files stay invisible for the query's lifetime
    * (measured — the r13 rotation spec is red on that form). Here each
    * micro-batch REOPENS the index from `indexPath` inside
    * `foreachBatch` — a fresh validated `loadIndex` (new listing, new
    * stamps, torn artifacts refuse loudly) — and probes through the
    * BATCH kernel, so stream and batch verdicts cannot drift by
    * construction.
    *
    * State shape: NONE. A document's shingles all ride in its one input
    * row, so the per-doc rollup completes within the micro-batch and
    * the emission is final — the q157 readout needs no cross-batch
    * state, no watermark, no window. (Late duplicates of the same
    * doc_id re-emit — upstream exact dedup's job, [[streamingDedup]],
    * same contract as the stream-static form.) Per micro-batch cost:
    * one pure-map shingle explode, one LEFT SEMI on the 8-byte hash
    * against the current index, one batch-sized rollup, one parquet
    * append. foreachBatch is at-least-once — a replayed batch re-probes
    * idempotently against a same-or-larger index; sinks that must be
    * exactly-once dedup on (batch_id, doc id) downstream, which is why
    * the batch id is emitted as a column. */
  def incrementalDedupRotatingStream(docs: DataFrame, idCol: String,
      textCol: String, indexPath: String, outPath: String, ckptPath: String,
      k: Int = graft.dedup.FingerprintIndex.DefaultK)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", ckptPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val index = graft.dedup.FingerprintIndex.loadIndex(spark, indexPath)
        graft.dedup.FingerprintIndex
          .probe(batch.toDF(), idCol, textCol, index, k)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()

  /** MODEL-ROTATION-AWARE streaming classifier scoring — the continuous
    * form of the pipeline's learned gate: score each arriving document
    * against the PERSISTED perceptron artifact
    * ([[graft.ml.PerceptronModel]]), reopening the model per micro-batch
    * inside `foreachBatch` (the [[incrementalDedupRotatingStream]]
    * discipline) so a RETRAINED model written mid-stream — same path,
    * new weights, stamp-last — is live in the next micro-batch, and a
    * torn artifact refuses loudly instead of scoring with garbage.
    * Scoring goes through the BATCH kernel
    * ([[graft.ops.ScaleOps25.scoreDocs]]), so stream and batch scores
    * cannot drift by construction.
    *
    * State shape: NONE — the score is a per-document projection + one
    * batch-local rollup; no watermark, no window, no cross-batch state.
    * Per micro-batch cost: one (B+1)-long model load (metadata-sized),
    * one broadcast join, one batch-sized agg, one parquet append.
    * foreachBatch is at-least-once — a replayed batch re-scores
    * idempotently under whatever model is then current; exactly-once
    * sinks dedup on (batch_id, doc id) downstream, which is why the
    * batch id is emitted as a column. */
  def classifierScoreStream(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, modelPath: String, outPath: String, ckptPath: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", ckptPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val w = graft.ml.PerceptronModel.loadModel(spark, modelPath)
        graft.ops.ScaleOps25.scoreDocs(batch.toDF(), w, idCol, textCol, langCol)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()

  /** LM-ROTATION-AWARE streaming document scoring — the continuous form
    * of the q183 reference-LM scorer: score each arriving document
    * against the PERSISTED bigram LM ([[graft.ml.BigramLm]] — the
    * fourth stamped artifact), reopening the model per micro-batch
    * inside `foreachBatch` (the [[incrementalDedupRotatingStream]] /
    * [[classifierScoreStream]] discipline) so a RETRAINED reference
    * model written mid-stream — side-write-then-swap, stamps last — is
    * live in the next micro-batch, and a torn artifact refuses loudly
    * instead of scoring with garbage. Scoring goes through the BATCH
    * kernel ([[graft.ops.ScaleOps27.scoreDocsWithLm]]), so stream and
    * batch scores cannot drift by construction.
    *
    * State shape: NONE — a document's bigrams all ride in its one input
    * row, the per-doc rollup completes within the micro-batch, the
    * emission is final. Per micro-batch cost: one validated LM load
    * (metadata counts; the pair table itself stays a distributed lazy
    * scan the two model joins consume), two co-partitioned token-sized
    * joins, one batch-sized rollup, one parquet append. foreachBatch is
    * at-least-once — replays re-score idempotently under whatever model
    * is then current; exactly-once sinks dedup on (batch_id, doc id)
    * downstream, which is why the batch id is emitted as a column. */
  def lmScoreStream(docs: DataFrame, idCol: String, textCol: String,
      lmPath: String, outPath: String, ckptPath: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", ckptPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val (pairs, v) = graft.ml.BigramLm.loadLm(spark, lmPath)
        graft.ops.ScaleOps27.scoreDocsWithLm(batch.toDF(), idCol, textCol,
            pairs, v)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()

  /** The FULL CCNet disposition as a stream (r14 verdict #4): score
    * each arriving document against the persisted bigram LM, bucket it
    * head/middle/tail against the persisted per-language tertile
    * boundaries ([[graft.ml.TertileBounds]] — the fifth stamped
    * artifact: boundaries are a GLOBAL property only a batch pass can
    * compute, so the batch ships them and the stream applies them
    * statelessly), and keep it at its bucket's rate through the
    * portable-hash sampler ([[graft.pipeline.Packing.mixKeep]] — the
    * same documents survive in batch and stream by construction).
    * Emits the kept rows: (doc id, lang, score_fp, bucket, batch_id).
    *
    * Both artifacts reopen per micro-batch inside `foreachBatch` (the
    * [[lmScoreStream]] discipline), so a retrained LM or re-computed
    * boundary table written mid-stream — side-write-then-swap, stamps
    * last — is live in the next micro-batch, and a torn artifact of
    * either kind refuses loudly instead of mixing with garbage.
    * Bucketing goes through the BATCH kernel
    * ([[graft.ops.ScaleOps25.bucketWithBounds]] — the q179 strict
    * comparisons), so batch and stream buckets cannot drift.
    *
    * Tail-rate documents, decided exactly as the batch `lm_mix` stage
    * decides them: a document the scorer cannot score (< 2 non-empty
    * tokens — no bigram evidence) takes the TAIL rate; so does a
    * document whose language has NO boundary row (a language unseen by
    * the boundary-computing batch — the stream-only case). The audit
    * slice is where evidence-free documents belong.
    *
    * State shape: NONE — scoring is per-document, the boundary join is
    * a ≤#langs broadcast, the keep decision a pure map; no watermark,
    * no cross-batch state. foreachBatch is at-least-once — replays
    * re-decide idempotently under whatever artifacts are then current
    * (the keep decision is a pure function of (doc id, bucket), so a
    * replay under unchanged artifacts emits identical rows);
    * exactly-once sinks dedup on (batch_id, doc id) downstream. */
  /** Scorer identity (r15 verdict #2 / advice #1 — the seam the tag
    * exists for, closed): the stream DERIVES the `_scorer` tag it
    * demands from the boundary artifact out of the kernel it actually
    * runs ([[graft.pipeline.TrainingPipeline.scorerTag]] — `smoothing`
    * and `domain` pick the kernel AND the tag components in one
    * place), so a caller cannot vouch arithmetic scores past
    * log-domain boundaries by passing the artifact's own tag: the only
    * caller-stated component is `refId` (e.g. "ref=en"), the
    * model-identity part that deliberately does not pin content
    * (retrained-model rotation under the same semantics is CCNet's own
    * design). Kernel dispatch matches the batch `lm_mix` stage:
    * add-k/arithmetic (q183), add-k/log₂ (q190, negated so head =
    * lowest perplexity), KN/arithmetic (q187 — T is the LM artifact's
    * `_rows` stamp, re-read per micro-batch so rotation changes T with
    * the model); KN/log₂ refuses at stream CONSTRUCTION exactly like
    * the batch stage (the KN per-term floors have no log-domain twin). */
  def lmMixStream(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, lmPath: String, boundsPath: String,
      headRate: Double, middleRate: Double, tailRate: Double,
      outPath: String, ckptPath: String,
      refId: String,
      smoothing: graft.pipeline.TrainingPipeline.LmSmoothing =
        graft.pipeline.TrainingPipeline.LmSmoothing.AddK,
      domain: graft.pipeline.TrainingPipeline.LmScoreDomain =
        graft.pipeline.TrainingPipeline.LmScoreDomain.Arithmetic)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.pipeline.TrainingPipeline.{LmSmoothing, LmScoreDomain}
    require(domain == LmScoreDomain.Arithmetic ||
      smoothing == LmSmoothing.AddK,
      "lmMixStream: LogPerplexity ranking is only defined for the AddK " +
        "smoother (the KN kernel's per-term floors have no log-domain twin)")
    val scorer = graft.pipeline.TrainingPipeline.scorerTag(
      smoothing, refId, domain)
    docs.writeStream
      .option("checkpointLocation", ckptPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val (pairs, v) = graft.ml.BigramLm.loadLm(spark, lmPath)
        val bounds = graft.ml.TertileBounds.loadBoundsFor(spark, boundsPath,
          scorer)
        val b = batch.toDF()
        val scored = ((smoothing, domain) match {
          case (LmSmoothing.AddK, LmScoreDomain.Arithmetic) =>
            graft.ops.ScaleOps27.scoreDocsWithLm(b, idCol, textCol, pairs, v)
          case (LmSmoothing.AddK, LmScoreDomain.LogPerplexity) =>
            graft.ops.ScaleOps30.scoreDocsWithLmLog2(b, idCol, textCol,
                pairs, v)
              .withColumn("score_fp", -col("plx_fp"))
          case (LmSmoothing.KneserNey, _) =>
            // loadLm above just validated stamp == on-disk rows, so the
            // stamp IS the bigram type count T (the batch stage's rule)
            graft.ops.ScaleOps28.scoreDocsWithLmKn(b, idCol, textCol,
              pairs, v, graft.ml.BigramLm.lmRows(spark, lmPath))
        }).select(col(idCol).cast("long").as("doc_id"), col("score_fp"))
        val wl = b.select(col(idCol).cast("long").as("doc_id"),
            col(langCol).as("lang"))
          .join(scored, Seq("doc_id"), "left")
        val bucketed = graft.ops.ScaleOps25.bucketWithBounds(
          wl.filter(col("score_fp").isNotNull), bounds)
        val rate = when(col("bucket") === "head", headRate)
          .when(col("bucket") === "middle", middleRate)
          .otherwise(tailRate)
        wl.join(bucketed.select(col("doc_id"), col("bucket")),
            Seq("doc_id"), "left")
          .withColumn("bucket", coalesce(col("bucket"), lit("tail")))
          .filter(graft.pipeline.Packing.mixKeep(col("doc_id"), rate))
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
  }

  /** Continuous corpus curation — the streaming form of
    * `pipeline.Curation.curate`: exact content dedup becomes
    * watermark-bounded dropDuplicatesWithinWatermark on the md5 (state
    * evictable — the only formulation that runs indefinitely); every
    * other gate (quality, token bounds, language, repetition) is a
    * stateless codegen'd projection, so the stream curates at scan
    * parallelism. Difference from batch, documented: batch keeps the
    * min-id copy of a duplicate group; a stream keeps the FIRST-ARRIVED
    * copy — over an ordered replay they agree. */
  /** @param scrubPii replace detected PII with placeholders in the
    *        emitted text (stateless map — safe in any streaming mode);
    *        default off so historical outputs are unchanged. */
  def curationStream(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermark: String,
      params: graft.pipeline.Curation.Params = graft.pipeline.Curation.Params(),
      scrubPii: Boolean = false): DataFrame = {
    import graft.text.TextAnalysis
    val deduped = docs
      .withColumn("__md5", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("__md5"))
      .drop("__md5")
    val outText =
      if (scrubPii) TextAnalysis.redactPii(col(textCol)).as(textCol)
      else col(textCol)
    deduped
      .withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      // fused one-pass repetition kernel — same routing as the batch
      // pipeline (Curation.curate), bit-identical to the split form
      .withColumn("__rep", TextAnalysis.repetitionStatsOf(col("__toks")))
      .select(
        col(idCol), outText, col(tsCol),
        TextAnalysis.tokenCountOf(col("__toks")).cast("long").as("n_tokens"),
        TextAnalysis.qualityScoreOf(col(textCol), col("__toks")).as("quality"),
        TextAnalysis.langIdOf(col("__toks")).as("lang_pred"),
        TextAnalysis.dupTokenFracFrom(col("__rep"), col("__toks")).as("dup_token_frac"),
        TextAnalysis.topBigramFracFrom(col("__rep"), col("__toks")).as("top_bigram_frac"))
      .filter(col("quality") >= params.minQuality)
      .filter(col("n_tokens") >= params.minTokens && col("n_tokens") <= params.maxTokens)
      .filter(col("lang_pred").isin(params.keepLangs: _*))
      .filter(col("dup_token_frac") <= params.maxDupTokenFrac)
      .filter(col("top_bigram_frac") <= params.maxTopBigramFrac)
  }

  /** Stream-stream interval join — the continuous form of the batch
    * interval join (ops.Relational3.q45IntervalJoin): left rows join right
    * rows for the same key within `[left.ts, left.ts + within]`. Both
    * sides carry watermarks and the join condition bounds event-time on
    * both sides, so each side's buffered state is evictable — the only
    * formulation of a stream-stream join that runs indefinitely. */
  def intervalJoinStream(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, watermark: String,
      within: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $within"))
  }

  // --- custom state: sessionization ------------------------------------

  final case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int)

  /** Gap-based sessionization via flatMapGroupsWithState: a session closes
    * when a later event for the key falls outside `gapMs`, or — with
    * `idleTimeout = true` — when the processing-time timeout fires for an
    * idle key. State per user is O(1). Tests run with `idleTimeout = false`
    * because armed timeouts keep a drain-style trigger (AvailableNow /
    * processAllAvailable) from ever terminating. */
  def sessionize(events: Dataset[Event], gapMs: Long,
      idleTimeout: Boolean = true): Dataset[Session] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeoutConf) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed ::= Session(userId, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (idleTimeout) state.setTimeoutDuration(gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  // --- custom state: streaming conversion funnel ------------------------

  /** Stage times in epoch-millis; -1 = not reached. O(1) per user. */
  final case class FunnelState(s: Long, v: Long, c: Long, p: Long)
  final case class FunnelRow(user_id: Long,
      t_signup: Option[java.sql.Timestamp], t_view: Option[java.sql.Timestamp],
      t_click: Option[java.sql.Timestamp], t_purchase: Option[java.sql.Timestamp],
      stage: Long)

  /** Continuous counterpart of the batch funnel (ScaleOps7.q99Funnel):
    * signup → first view strictly after it → first click after that →
    * first purchase after that, maintained per user in O(1) state and
    * re-emitted whenever a stage advances (latest emission per user =
    * current funnel row; users who never sign up hold no state and emit
    * nothing — the batch query's stage-0 rows).
    *
    * Parity law (spec-checked): when events are delivered in timestamp
    * order — within a micro-batch the kernel sorts, across batches the
    * source must not reorder — the greedy first-qualifying-event IS the
    * batch MIN, so the final emission per user equals the batch row
    * exactly. Out-of-order delivery degrades the same way any
    * min-refinement does in an append-only stream: an earlier-qualifying
    * event arriving late cannot retract an already-advanced stage. */
  def funnelStream(events: Dataset[Event]): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          val before = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L, -1L))
          var st = before
          sorted.foreach { e =>
            val t = e.ts.getTime
            e.event_type match {
              case "signup"   if st.s < 0 => st = st.copy(s = t)
              case "view"     if st.s >= 0 && st.v < 0 && t > st.s => st = st.copy(v = t)
              case "click"    if st.v >= 0 && st.c < 0 && t > st.v => st = st.copy(c = t)
              case "purchase" if st.c >= 0 && st.p < 0 && t > st.c => st = st.copy(p = t)
              case _ =>
            }
          }
          if (st != before) {
            state.update(st)
            def o(t: Long) = if (t < 0) None else Some(new java.sql.Timestamp(t))
            val stage = Seq(st.s, st.v, st.c, st.p).count(_ >= 0).toLong
            Iterator(FunnelRow(userId, o(st.s), o(st.v), o(st.c), o(st.p), stage))
          } else Iterator.empty
      }
  }

  // --- custom state: streaming heavy hitters ----------------------------

  final case class HeavyHitterCandidate(shard: Int, token: String,
      count_lb: Long, count_ub: Long, shard_tokens: Long)
  final case class MgState(counts: Map[String, Long], decrements: Long,
      n: Long)

  /** Streaming heavy hitters with BOUNDED state — the continuous
    * complement of the batch CMS arm ([[graft.text.HeavyHitters]]).
    * Tokens are sharded by hash, so each token lives in exactly ONE
    * shard and per-shard summaries merge disjointly; each shard keeps a
    * Misra-Gries summary of `capacity` counters. Total state is
    * nShards × capacity counters REGARDLESS of vocabulary size — a
    * naive streaming `groupBy(token).count()` would grow state with the
    * vocabulary, which is exactly what a 100 TB stream cannot afford.
    *
    * After each micro-batch a shard re-emits its surviving candidates
    * with the classic MG deterministic bounds:
    * `count_lb ≤ true count ≤ count_ub`, and any token whose true
    * frequency exceeds `decrements` (≤ shard_tokens/(capacity+1)) is
    * guaranteed present. Update-mode output — the latest emission per
    * token (largest `shard_tokens`) supersedes earlier ones. A token
    * EVICTED during a batch gets an explicit retraction row
    * (`count_lb = 0, count_ub = decrements` — the MG bound for any
    * untracked token), so the latest-emission read rule stays sound:
    * without it, a consumer would keep the token's stale pre-eviction
    * `count_ub` as current while the true count kept growing past it. */
  def heavyHittersStream(docs: DataFrame, textCol: String,
      nShards: Int = 32, capacity: Int = 64)
      : Dataset[HeavyHitterCandidate] = {
    require(nShards > 0 && capacity > 0, s"bad shape $nShards/$capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs
      .select(explode(graft.text.TextAnalysis.tokens(col(textCol))).as("token"))
      .select(col("token"),
        pmod(xxhash64(col("token")), lit(nShards)).cast("int").as("shard"))
      .as[(String, Int)]
    toks.groupByKey(_._2)
      .flatMapGroupsWithState[MgState, HeavyHitterCandidate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[(String, Int)],
            state: GroupState[MgState]) =>
          val before = state.getOption.map(_.counts)
            .getOrElse(Map.empty[String, Long])
          var counts = before
          var dec = state.getOption.map(_.decrements).getOrElse(0L)
          var n = state.getOption.map(_.n).getOrElse(0L)
          rows.foreach { case (token, _) =>
            n += 1
            counts.get(token) match {
              case Some(c) => counts = counts.updated(token, c + 1)
              case None if counts.size < capacity =>
                counts = counts.updated(token, 1L)
              case None =>
                // decrement-all: every stored count absorbs one unit of
                // the unmatched token; zeroed counters free their slot
                dec += 1
                counts = counts.flatMap { case (t, c) =>
                  if (c > 1) Some(t -> (c - 1)) else None }
            }
          }
          state.update(MgState(counts, dec, n))
          // retractions for tokens this batch evicted: their bound is the
          // untracked-token bound [0, dec], not their stale last emission
          val evicted = (before.keySet -- counts.keySet).iterator
            .map(t => HeavyHitterCandidate(shard, t, 0L, dec, n))
          counts.iterator.map { case (t, c) =>
            HeavyHitterCandidate(shard, t, c, c + dec, n)
          } ++ evicted
      }
  }

  /** Consumer-side merged "current top-k" over [[heavyHittersStream]]
    * emissions — the read-path companion the stream's update-mode contract
    * implies: a token's CURRENT bound is its LATEST emission (largest
    * `shard_tokens` — n is monotone per shard and a token lives in exactly
    * one shard), retracted tokens (count_lb = 0) drop out, and the live
    * candidates rank globally by (count_lb DESC, token ASC) — the q74
    * rollup shape, so the stream view and the batch
    * [[graft.text.HeavyHitters.topTokens]] agree positionally whenever MG
    * had no decrements (capacity ≥ shard vocabulary), and otherwise agree
    * up to the MG bound (spec'd both ways). Scale shape: both windows run
    * over the CANDIDATE table — at most nShards×capacity live tokens plus
    * their retraction history, never the stream — so the global rank
    * window's single-partition sort is over a sketch-sized input by
    * construction (same argument as q74's O(k) driver probes). */
  def currentTopK(emissions: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val latest = Window.partitionBy(col("shard"), col("token"))
      .orderBy(col("shard_tokens").desc)
    val rankW = Window.orderBy(col("count_lb").desc, col("token"))
    emissions
      .withColumn("__latest", row_number().over(latest))
      .filter(col("__latest") === 1 && col("count_lb") > 0)
      .withColumn("rank", row_number().over(rankW).cast("int"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("token"), col("count_lb"), col("count_ub"))
  }

  /** Continuous daily-volume counting — the streaming half of the q104
    * anomaly detector ([[graft.ops.ScaleOps8.q104VolumeAnomaly]]): a
    * watermarked tumbling 1-day event-time window count in update mode.
    * Fully distributed and state-bounded (a day's state drops once the
    * watermark passes it); per-day counts are MONOTONE across update
    * emissions, which is what lets [[currentAnomalies]] reconstruct the
    * current day table from the latest emission per day. */
  def dailyCountsStream(events: DataFrame, tsCol: String,
      watermark: String = "1 day"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 day"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").cast("date").as("day_date"), col("cnt"))

  /** Consumer-side anomaly view over [[dailyCountsStream]] emissions —
    * the [[currentTopK]] split applied to monitoring: latest emission
    * per day (largest cnt — counts only grow), then EXACTLY the q104
    * integer 3σ law over the trailing 7 observed days:
    *
    *   flag ⇔ n7 = 7 ∧ (n7·cnt − Σ)² > 9·(n7·Σx² − Σ²)
    *
    * so for fully-ingested days the stream view is bit-identical to the
    * batch `q104VolumeAnomaly` flags (parity spec). Scale shape: both
    * windows run over the DAY table — bounded by the time span, never
    * the stream (the q08/q104 bounded-input argument). `epoch` anchors
    * the day numbering to the batch convention. */
  def currentAnomalies(emissions: DataFrame, epoch: String = "2024-01-01"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val latest = Window.partitionBy(col("day_date")).orderBy(col("cnt").desc)
    val w = Window.orderBy(col("day")).rowsBetween(-7, -1)
    emissions
      .withColumn("__latest", row_number().over(latest))
      .filter(col("__latest") === 1)
      .withColumn("day", datediff(col("day_date"), to_date(lit(epoch))))
      .withColumn("n7", count(col("cnt")).over(w))
      .withColumn("sum7", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("sumsq7", coalesce(sum(col("cnt") * col("cnt")).over(w), lit(0L)))
      .withColumn("is_anomaly",
        col("n7") === 7 &&
          (col("n7") * col("cnt") - col("sum7")) * (col("n7") * col("cnt") - col("sum7"))
            > lit(9L) * (col("n7") * col("sumsq7") - col("sum7") * col("sum7")))
      .select(col("day"), col("cnt"), col("n7"), col("sum7"), col("sumsq7"),
        col("is_anomaly"))
  }

  /** Per-type daily counts stream — the [[dailyCountsStream]] shape keyed
    * by event type, feeding the continuous changepoint view below. Update
    * mode re-emits a (type, day) row whenever its count grows; the
    * consumer keeps the latest per key. */
  def typedDailyCountsStream(events: DataFrame, typeCol: String, tsCol: String,
      watermark: String = "1 day"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(typeCol), window(col(tsCol), "1 day"))
      .agg(count(lit(1)).as("cnt"))
      .select(col(typeCol).as("event_type"),
        col("window.start").cast("date").as("day_date"), col("cnt"))

  /** Consumer-side CUSUM changepoint view over [[typedDailyCountsStream]]
    * emissions — the continuous form of q129: latest emission per
    * (type, day) (counts only grow), then EXACTLY the batch integer law
    * S_d = Σ_{i≤d}(D·cᵢ − T) with the changepoint at max |S| (ties →
    * earliest day). For fully-ingested days this is bit-identical to
    * `q129Cusum` (parity spec). Scale shape: all windows run over the
    * (type, day) table — bounded by types × calendar span, never the
    * stream (the q08/q104 bounded-input argument). */
  def currentChangepoint(emissions: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val latest = Window.partitionBy(col("event_type"), col("day_date"))
      .orderBy(col("cnt").desc)
    val wT = Window.partitionBy(col("event_type"))
    val wOrd = wT.orderBy(col("day_date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    emissions
      .withColumn("__latest", row_number().over(latest))
      .filter(col("__latest") === 1)
      .withColumn("d_days", count(lit(1)).over(wT))
      .withColumn("total", sum(col("cnt")).over(wT))
      .withColumn("s", sum(col("d_days") * col("cnt") - col("total")).over(wOrd))
      .withColumn("rn",
        row_number().over(wT.orderBy(abs(col("s")).desc, col("day_date"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("d_days").as("n_days"), col("total"),
        col("day_date").as("cp_day"), col("s").as("s_at_cp"))
  }

  // --- custom state: stream-disorder monitor (continuous q138) ---------

  final case class SeqEvent(event_type: String, event_id: Long,
      ts: java.sql.Timestamp)
  final case class DisorderState(lastId: Long, lastTs: Long, nPairs: Long,
      nInv: Long, maxBack: Long)
  final case class DisorderRow(event_type: String, n_pairs: Long,
      n_inversions: Long, max_backstep_ms: Long)

  /** Continuous form of q138's disorder metrics: per event type, walk
    * events in PRODUCER order (event_id) and track adjacent-pair time
    * regressions — O(1) state per type (last id/ts + three counters),
    * one cumulative emission per type per micro-batch (Update mode; the
    * consumer keeps the latest per type, [[currentDisorder]]).
    *
    * Parity contract: bit-identical to batch `q138Disorder` whenever
    * arrival respects producer order ACROSS micro-batches (within a
    * batch any arrival order is fine — the walk sorts by event_id
    * before folding). A source that interleaves producer ranges across
    * batches measures ITS OWN arrival disorder — still the number a
    * watermark must cover, just a different observation point. */
  def disorderStream(events: Dataset[SeqEvent]): Dataset[DisorderRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[DisorderState, DisorderRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (typ: String, rows: Iterator[SeqEvent], state: GroupState[DisorderState]) =>
          val sorted = rows.toSeq.sortBy(_.event_id)
          var st = state.getOption
            .getOrElse(DisorderState(Long.MinValue, 0L, 0L, 0L, 0L))
          sorted.foreach { e =>
            if (st.lastId != Long.MinValue) {
              val back = st.lastTs - e.ts.getTime
              st = st.copy(
                nPairs = st.nPairs + 1,
                nInv = st.nInv + (if (back > 0) 1 else 0),
                maxBack = math.max(st.maxBack, math.max(back, 0L)))
            }
            st = st.copy(lastId = e.event_id, lastTs = e.ts.getTime)
          }
          state.update(st)
          if (st.nPairs > 0)
            Iterator(DisorderRow(typ, st.nPairs, st.nInv, st.maxBack))
          else Iterator.empty
      }
  }

  /** Consumer-side view over [[disorderStream]] emissions: latest per
    * type (pair counts only grow), plus the q138 share division — the
    * same shape as the batch readout for the parity spec. */
  def currentDisorder(emissions: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val latest = Window.partitionBy(col("event_type"))
      .orderBy(col("n_pairs").desc)
    emissions
      .withColumn("__latest", row_number().over(latest))
      .filter(col("__latest") === 1)
      .withColumn("inversion_share",
        col("n_inversions").cast("double") / col("n_pairs").cast("double"))
      .select(col("event_type"), col("n_pairs"), col("n_inversions"),
        col("max_backstep_ms"), col("inversion_share"))
  }

  /** Batch reference implementation of gap sessionization (same semantics,
    * pure SQL window functions) — used to cross-check the stateful stream
    * and as the backfill path: new-session flag = gap > threshold, session
    * id = running sum of flags. */
  def sessionizeBatch(events: DataFrame, userCol: String, tsCol: String,
      gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val flagged = events
      .withColumn("__prev", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          (unix_millis(col(tsCol)) - unix_millis(col("__prev"))) > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("__new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col(userCol), col("session_seq"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
