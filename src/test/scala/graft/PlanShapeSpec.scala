package graft

import graft.ops.{Relational, Relational3}

/** Physical-plan shape assertions for the scale-critical properties: the
  * 100 TB design claims (pushdown, broadcast, partial aggregation, equi-key
  * extraction) are checked against the actual Catalyst output, not just
  * stated in docs. Uses sf0.001 — plan shape is scale-invariant for these
  * properties (broadcasts come from explicit hints, pushdown from the
  * declarative filter position).  */
class PlanShapeSpec extends GraftSuite {
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q02: filters are pushed to the parquet scan and columns pruned") {
    val p = plan(Relational.q02FilterScan(spark, sf))
    assert(p.contains("PushedFilters: ["), p)
    assert(!p.contains("PushedFilters: []"), p)
    // projection requires only 4 columns — the scan must not read the rest
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), readSchema)
    assert(!readSchema.contains("l_returnflag"), readSchema)
  }

  test("q03/q04: dimension joins broadcast (no fact-side shuffle for the join)") {
    assert(plan(Relational.q03JoinRevenue(spark, sf)).contains("BroadcastHashJoin"))
    assert(plan(Relational.q04BroadcastDim(spark, sf)).contains("BroadcastHashJoin"))
  }

  test("q01: aggregation is two-phase (map-side partial before the shuffle)") {
    val p = plan(Relational.q01PricingSummary(spark, sf))
    val n = "HashAggregate".r.findAllIn(p).length
    assert(n >= 2, s"expected partial+final HashAggregate, got $n in\n$p")
  }

  test("q42: explode word count keeps map-side combine") {
    val p = plan(Relational3.q42WordCount(spark, sf))
    val n = "HashAggregate".r.findAllIn(p).length
    assert(n >= 2, s"expected partial+final HashAggregate, got $n in\n$p")
  }

  test("q38: tiny band dim uses broadcast nested-loop (no shuffle, no cartesian)") {
    val p = plan(Relational3.q38RangeJoin(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q45: interval join extracts the equi key (never a cartesian/NLJ plan)") {
    val p = plan(Relational3.q45IntervalJoin(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the range predicate rides the equi join as a post-join condition
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")
      || p.contains("ShuffledHashJoin"), p)
  }

  test("q44: all four window functions share one hash exchange") {
    val p = plan(Relational3.q44WindowNav(spark, sf))
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n == 1, s"expected a single window shuffle, got $n in\n$p")
  }

  test("q23/q57/q59: per-document kernels are pure maps — no hash exchange below the sort") {
    // one scan stage, codegen'd kernels, and the only exchange is the
    // final presentation orderBy (rangepartitioning) — the plan a 100 TB
    // per-document map must have
    for (q <- Seq(graft.ops.ScaleOps.q23Fingerprint _, graft.ops.ScaleOps.q57Repetition _,
        graft.ops.ScaleOps2.q59PiiRedact _)) {
      val df = q(spark, sf)
      df.collect() // finalize THIS df's AQE plan so codegen stages are visible
      val p = plan(df)
      assert(!p.contains("Exchange hashpartitioning"), p)
      // "*(n)" prefixes mark operators inside a WholeStageCodegen stage;
      // the kernel projection must sit inside one
      assert("\\*\\(\\d+\\) Project".r.findFirstIn(p).isDefined, p)
    }
  }

  test("q36: the whole curation pipeline is two hash shuffles end-to-end") {
    val df = graft.ops.ScaleOps.q36Curation(spark, sf)
    df.collect()
    // the AQE plan string repeats everything under "== Initial Plan ==" —
    // count only the final section
    val p = plan(df).split("== Initial Plan ==").head
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    // exactly: the dedup hash-groupBy and the report agg; the repetition/
    // quality gates must add NO exchange
    assert(n == 2, s"expected 2 hash exchanges, got $n in\n$p")
  }

  test("q58: decontamination joins broadcast the small test side, never cartesian") {
    val df = graft.ops.ScaleOps.q58Decontaminate(spark, sf)
    df.collect() // finalize AQE so runtime join selections are visible
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the test split is ~10% of the corpus: AQE must broadcast it in the
    // md5/shingle equi-joins instead of shuffling the train side
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("curation near-dup stage: candidate generation carries the df cap") {
    val docs = graft.ops.Relational.t(spark, sf, "documents")
    val out = graft.pipeline.Curation.curate(docs, "doc_id", "text",
      graft.pipeline.Curation.Params(nearDupThreshold = Some(0.8)))
    // the capped path blacklists over-cap shingles via a partial-agg +
    // anti-join before the self-join — both must be in the plan (the
    // uncapped exact join has neither)
    val p = out.queryExecution.optimizedPlan.toString
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("_df"), p)
  }

  test("q61: packing is one window shuffle; map-side partial agg above it") {
    val df = graft.ops.ScaleOps2.q61SequencePack(spark, sf)
    df.collect()
    val p = plan(df).split("== Initial Plan ==").head
    // exactly one hash exchange: the per-source window; the pack roll-up
    // rides the same partitioning (source is a prefix of its keys… it is
    // not — but partial aggregation bounds the second exchange's input
    // to one row per (source, pack))
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n <= 2, s"expected at most window+agg exchanges, got $n in\n$p")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p) // partial+final
  }

  test("q62: mixing is a map-side filter; aggregations partial; no cartesian") {
    val df = graft.ops.ScaleOps2.q62SourceMix(spark, sf)
    df.collect()
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    // the hash-threshold keep-filter must sit in the scan stage (a Filter,
    // not a join against a sampled id list)
    assert("HashAggregate".r.findAllIn(p).length >= 2, p) // partial+final
  }

  test("q21: LSH band join is an equi hash join, never cartesian") {
    val p = plan(graft.ops.ScaleOps.q21MinhashLsh(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")
      || p.contains("ShuffledHashJoin"), p)
  }

  test("q64: chunk dedup is equi-join only (the linear-shape claim) with partial aggs") {
    val p = plan(graft.ops.ScaleOps3.q64ChunkDedup(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // df groupBy and the per-doc rollup both partial-aggregate before
    // their shuffles
    assert(p.contains("partial_count"), p)
  }

  test("q85/q86: sliding-window dup ops are equi-join only — shingle strings never leave the kernel") {
    for (df <- Seq(graft.ops.ScaleOps4.q85DupSpans(spark, sf),
        graft.ops.ScaleOps4.q86DedupClean(spark, sf))) {
      val p2 = plan(df)
      assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"), p2)
      assert(p2.contains("sliding_shingle_hashes"), p2)
    }
    val p = plan(graft.ops.ScaleOps4.q85DupSpans(spark, sf))
    // the per-position stream is hashed in the kernel: exchanges carry the
    // 8-byte shingle hash, never shingle strings
    assert(p.contains("sliding_shingle_hashes"), p)
    // the distinct-doc-frequency aggregate partial-aggregates before its
    // shuffle (count-distinct two-phase)
    assert(p.contains("partial_"), p)
  }

  test("q87: token rarity joins token-partitioned count table; only the 1-row total broadcasts") {
    val p = plan(graft.ops.ScaleOps4.q87TokenRarity(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    // the 1-row total joins as a broadcast nested loop (it has no key);
    // the vocab join must be an equi hash/sort-merge join, never a
    // broadcast of the token stream
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("partial_count"), p)
  }

  test("q72: equi-depth bin assignment is a broadcast pure map (no shuffle before the bin agg)") {
    // the 1-row boundary table must reach the scan side via broadcast —
    // a hash-partitioned join here would shuffle the whole corpus just to
    // attach 9 doubles
    val p = plan(graft.ops.ScaleOps4.q72EquiDepth(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
    // percentile boundaries + 10-bin agg: partial aggregation everywhere
    assert(p.contains("partial_"), p)
  }

  test("q73/q76: per-source planning/profiling aggregate partially before their one shuffle") {
    for (df <- Seq(graft.ops.ScaleOps4.q73TokenBudget(spark, sf),
        graft.ops.ScaleOps4.q76SourceProfile(spark, sf))) {
      val p = plan(df)
      assert(p.contains("partial_"), p)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    }
  }

  test("q74: the exact heavy-hitter arm shuffles distinct tokens, not occurrences") {
    // partial_count before the token exchange = the map-side combine that
    // keeps the shuffle at vocabulary size
    val p = plan(graft.text.HeavyHitters.topTokens(
      graft.ops.Relational.t(spark, sf, "documents"), "text", 10))
    assert(p.contains("partial_count"), p)
  }

  test("q67: bloom probe is a map-side filter — no exchange between scan and probe") {
    // the probe expression must sit in the same codegen stage as the new-
    // batch scan: assert the filter references bloom_might_contain and the
    // only exchanges in the whole plan are the exact-arm distinct + the
    // final single-row aggregate (never one feeding the probe itself)
    val p = plan(graft.ops.ScaleOps3.q67BloomDedup(spark, sf))
    assert(p.contains("bloom_might_contain"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected <=2 hash exchanges (hist distinct + final agg), got $exchanges\n$p")
  }

  test("q75/q78: keeper windows share ONE cluster_id exchange; clusters are bounded groups, never the corpus") {
    // canonicalKeep's two windows (size + rank) both partition on
    // cluster_id — they must ride a single hash exchange, and nothing in
    // the decision layer may degenerate to a cartesian or an
    // unpartitioned window (the corpus-wide single-partition failure)
    for (df <- Seq(graft.ops.ScaleOps4.q75Canonical(spark, sf),
        graft.ops.ScaleOps4.q78DedupSavings(spark, sf))) {
      val p = plan(df)
      assert(p.contains("Window"), p)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
      val clusterExchanges = "Exchange hashpartitioning\\(cluster_id".r.findAllIn(p).length
      assert(clusterExchanges == 1,
        s"expected the two keeper windows to share 1 cluster_id exchange, got $clusterExchanges\n$p")
      // every WindowExec must carry a partition spec (no global window)
      p.linesIterator.filter(_.trim.startsWith("Window ")).foreach { l =>
        assert(l.contains("cluster_id"), s"unpartitioned window in plan line: $l")
      }
    }
  }

  test("q77: boilerplate share is equi-join only with partial aggregation (no pair blowup path)") {
    val p = plan(graft.ops.ScaleOps4.q77Boilerplate(spark, sf))
    assert(p.contains("partial_"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")
      || p.contains("ShuffledHashJoin"), p)
  }

  test("q79/q80: WAV decode/analyze are pure maps — codegen kernel in the scan stage, no hash exchange, no join") {
    for ((df, kernel) <- Seq(
        (graft.ops.ScaleOps4.q79WavDecode(spark, sf), "wav_decode"),
        (graft.ops.ScaleOps4.q80AudioStats(spark, sf), "wav_analyze"),
        (graft.ops.ScaleOps4.q81Mp4Probe(spark, sf), "mp4_probe"),
        (graft.ops.ScaleOps4.q82TrackStats(spark, sf), "mp4_tracks"),
        (graft.ops.ScaleOps4.q83Mp3Scan(spark, sf), "mp3_scan"),
        (graft.ops.ScaleOps4.q84Mp4Samples(spark, sf), "mp4_samples"))) {
      val p = plan(df)
      assert(p.contains(kernel), p)
      assert(!p.contains("Join"), p)
      val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(hashExchanges == 0,
        s"decode must not shuffle — only the final order-by range exchange; got $hashExchanges\n$p")
    }
  }

  test("q88: fuzzy linkage pairs only within blocks — distinct-key agg feeds an equi hash join, never a cartesian") {
    val p = plan(graft.ops.ScaleOps5.q88FuzzyJoin(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the blocking key is an equi join key; levenshtein is only a
    // post-join filter inside the block
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), p)
    // the corpus collapses to distinct names (two-phase) BEFORE pairing:
    // pair space is keys x keys-in-block, never rows x rows
    assert(p.contains("partial_count"), p)
    // only p_name is read from the scan
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("p_retailprice") && !readSchema.contains("p_partkey"), readSchema)
  }

  test("q89: bigram LM has the q87 topology — equi-join on the bigram count table, only the 1-row total broadcasts") {
    val p = plan(graft.ops.ScaleOps5.q89BigramLm(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("partial_count"), p)
    // the per-doc rollup partial-aggregates before its doc_id shuffle
    assert(p.contains("partial_sum"), p)
  }

  test("q90: PQ encode is a pure-map kernel in the scan stage; ADC scan shuffles once (query_id top-k) with partial group-limit") {
    val p = plan(graft.ops.ScaleOps5.q90PqAnn(spark, sf))
    // the corpus side: pq_encode directly over the scan, no exchange
    // before the candidate join
    assert(p.contains("pq_encode"), p)
    // the per-query LUTs arrive as a driver-small broadcast local table —
    // the corpus float vectors are never joined
    assert(p.contains("LocalTableScan"), p)
    assert(p.contains("BroadcastExchange"), p)
    // exactly ONE hash exchange: the query_id window for top-k; the
    // candidate stream is pre-truncated map-side (partial WindowGroupLimit)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges\n$p")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q101: auto-sniffed image decode is a pure map — fixture synthesis + decode in the scan stage, no exchange before the order-by") {
    val p = plan(graft.ops.ScaleOps8.q101ImageDecode(spark, sf))
    assert(p.contains("image_decode"), p)
    assert(!p.contains("Join"), p)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 0,
      s"decode must not shuffle — only the final order-by range exchange; got $hashExchanges\n$p")
  }

  test("q102: fence stats BROADCAST back onto the corpus — never a doc-sided shuffle join") {
    val p = plan(graft.ops.ScaleOps8.q102OutlierFences(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("partial_percentile") || p.contains("HashAggregate"), p)
  }

  test("q103: transitions shuffle events ONCE (user window); the matrix work runs on the tiny (from,to) table") {
    val p = plan(graft.ops.ScaleOps8.q103Transitions(spark, sf))
    assert(!p.contains("Join"), p)
    // user window + (from,to) partial-agg + from_type prob window = 3
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges <= 3, s"expected ≤3 hash exchanges, got $hashExchanges\n$p")
    assert(p.contains("partial_count") || p.contains("partial"), p)
  }

  test("q104: anomaly flags cost one partial-agg exchange; the trailing window runs on the bounded day table") {
    val p = plan(graft.ops.ScaleOps8.q104VolumeAnomaly(spark, sf))
    assert(!p.contains("Join"), p)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1, s"expected 1 hash exchange (daily rollup), got $hashExchanges\n$p")
    // the map-side partial count precedes the shuffle
    assert(p.contains("partial_count") || p.contains("partial"), p)
  }

  test("q107/q112: multi-codec sniffs are pure maps — LZW/DEFLATE/Huffman+IDCT decode in the scan stage, no exchange before the order-by") {
    for (df <- Seq(graft.ops.ScaleOps8.q107GifMixed(spark, sf),
        graft.ops.ScaleOps8.q112JpegMixed(spark, sf))) {
      val p = plan(df)
      assert(p.contains("image_decode"), p)
      assert(!p.contains("Join"), p)
      val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(hashExchanges == 0, s"expected 0 hash exchanges, got $hashExchanges\n$p")
    }
  }

  test("q108: skyline pre-reduces per size before the frontier window — one partial-agg exchange, bounded window input") {
    val p = plan(graft.ops.ScaleOps8.q108Skyline(spark, sf))
    assert(!p.contains("Join"), p)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1, s"expected 1 hash exchange (size rollup), got $hashExchanges\n$p")
    assert(p.contains("partial_min") || p.contains("partial"), p)
  }

  test("q109: weighted sampling is hash+div in the scan stage; ONE source exchange with partial window-group-limit") {
    val p = plan(graft.ops.ScaleOps8.q109WeightedSample(spark, sf))
    assert(!p.contains("Join"), p)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1, s"expected 1 hash exchange (source top-k), got $hashExchanges\n$p")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q110/q111: rank family costs one partition exchange; islands share ONE user exchange for window and rollup") {
    val p110 = plan(graft.ops.ScaleOps8.q110WindowRanks(spark, sf))
    assert(!p110.contains("Join"), p110)
    val he110 = "Exchange hashpartitioning".r.findAllIn(p110).length
    assert(he110 == 1, s"q110: expected 1 hash exchange, got $he110\n$p110")
    val p111 = plan(graft.ops.ScaleOps8.q111GapsIslands(spark, sf))
    assert(!p111.contains("Join"), p111)
    // distinct partial-agg + user window; the island/user rollups reuse
    // the user partitioning
    val he111 = "Exchange hashpartitioning".r.findAllIn(p111).length
    assert(he111 <= 2, s"q111: expected ≤2 hash exchanges, got $he111\n$p111")
  }

  test("q105: rank≤3 truncation happens BEFORE the path rollup; path agg runs on the bounded path table") {
    val p = plan(graft.ops.ScaleOps8.q105SessionPaths(spark, sf))
    assert(!p.contains("Join"), p)
    // user window + per-user path agg + path-count agg
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges <= 3, s"expected ≤3 hash exchanges, got $hashExchanges\n$p")
  }

  test("q106: event stream collapses in distinct partial-aggs; the z² algebra runs on ≤2·|types| rows") {
    val p = plan(graft.ops.ScaleOps8.q106AbTest(spark, sf))
    // the exposed-side join onto conv is a broadcast of the tiny per-variant table
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q128/q136: four-way sniff and JL projection are pure maps — kernels in the scan stage, no exchange before the order-by") {
    for (df <- Seq(graft.ops.ScaleOps11.q128BmpMixed(spark, sf),
        graft.ops.ScaleOps12.q136JlProject(spark, sf))) {
      val p = plan(df)
      assert(!p.contains("Join"), p)
      assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
        s"pure map must not shuffle — only the final order-by range exchange\n$p")
    }
  }

  test("q123: the sweep line broadcasts its calendar-bounded offset table — the data-sized window stays hour-partitioned") {
    val p = plan(graft.ops.ScaleOps10.q123Concurrency(spark, sf))
    // per-hour running sums are hash-partitioned windows; the |hours|-row
    // offset table must come back via broadcast, never a data-sized shuffle join
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q124/q133: pair generation joins on the grouping key; count sides broadcast; aggs are partial") {
    for (df <- Seq(graft.ops.ScaleOps10.q124BasketLift(spark, sf),
        graft.ops.ScaleOps12.q133SparseSim(spark, sf))) {
      val p = plan(df)
      assert(p.contains("partial_"), p)
      assert(!p.contains("CartesianProduct"), p)
    }
    // q124's item-count and basket-total tables are explicit broadcasts
    assert(plan(graft.ops.ScaleOps10.q124BasketLift(spark, sf))
      .contains("BroadcastHashJoin"))
  }

  test("q125/q135/q137: scan-stage laws partial-aggregate before their one shuffle; no joins beyond broadcasts") {
    for (df <- Seq(graft.ops.ScaleOps10.q125Benford(spark, sf),
        graft.ops.ScaleOps12.q135SkewReport(spark, sf),
        graft.ops.ScaleOps13.q137DictAdvisor(spark, sf))) {
      val p = plan(df)
      assert(p.contains("partial_"), p)
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    }
  }

  test("q131: query vectors broadcast against the corpus — scoring never shuffles the embedding table for the join") {
    val p = plan(graft.ops.ScaleOps11.q131RrfFusion(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q149/q154: frame decode is a pure map+explode — the container walk and JPEG decode never precede a join") {
    for (df <- Seq(graft.ops.ScaleOps17.q149MjpegFrames(spark, sf))) {
      val p = plan(df)
      assert(p.contains("mp4_jpeg_frames") || p.contains("Generate"), p)
      assert(!p.contains("Join") && !p.contains("CartesianProduct"), p)
    }
    // keyframes add exactly one windowed lag over the decoded stream
    val pk = plan(graft.ops.ScaleOps18.q154Keyframes(spark, sf))
    assert(pk.contains("Window"), pk)
    assert(!pk.contains("Join") && !pk.contains("CartesianProduct"), pk)
  }

  test("q152: skip-gram pairs come straight off the token array — NO join, no range NLJ, partial pair aggregation") {
    val p = plan(graft.ops.ScaleOps18.q152SkipGrams(spark, sf))
    // r18: the probe-row equi-join on (doc, pos) is gone — pairs are a
    // pure map over array adjacency, so no join of ANY kind remains in
    // the pair path (the only acceptable join-free plan is also the
    // cheapest one: explode → partial agg → exchange → final agg)
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p)
    assert(p.contains("partial_"), p)
    // the top-25 is a DISTRIBUTED TakeOrdered over the pair table — a
    // global rank window here would be a single-task sort at 100 TB
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q153/q158: marginal joins stay equi-keyed; the only nested-loop is the 1-row totals/anchor broadcast") {
    for (df <- Seq(graft.ops.ScaleOps18.q153PmiLift(spark, sf),
        graft.ops.ScaleOps18.q158Branching(spark, sf))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), p)
      assert(p.contains("partial_"), p)
    }
  }

  test("q157: history collapses to a DISTINCT hash set probed by a LEFT SEMI join — shingle strings never reach an exchange") {
    val p = plan(graft.ops.ScaleOps18.q157IncrementalDedup(spark, sf))
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
    // exchanges carry the 8-byte hash, not shingle text
    p.linesIterator.filter(_.contains("Exchange hashpartitioning")).foreach { l =>
      assert(!l.contains("text"), l)
    }
  }

  test("q156: decile bounds broadcast; the curve window runs on the 10-row bucket table") {
    val p = plan(graft.ops.ScaleOps18.q156VocabGrowth(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("partial_"), p)
  }

  test("q164: the probe through the LOADED index keeps q157's shape — LEFT SEMI on the 8-byte hash, strings never exchange") {
    val p = plan(graft.ops.ScaleOps21.q164IndexedIncrDedup(spark, sf))
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
    p.linesIterator.filter(_.contains("Exchange hashpartitioning")).foreach { l =>
      assert(!l.contains("text"), l)
    }
  }

  test("q162: above the adaptive bound the pack prefix-sum is hierarchical — range exchange on (source, doc_id), windows keyed by partition id, no per-source-only window") {
    // force the big-group branch (sf0.001 groups are far under the 4M
    // default — the q148 forced-threshold routing discipline)
    spark.conf.set("graft.pack.maxGroupRows", "1")
    try {
      val p = plan(graft.ops.ScaleOps20.q162BpePacking(spark, sf))
      assert(p.contains("rangepartitioning"), p)
      // every running-sum window spec carries the stamped partition id —
      // a spec partitioned by source alone would be the r11 single-task
      // bottleneck sneaking back in
      val windows = p.linesIterator
        .filter(_.contains("windowspecdefinition(")).toSeq
      assert(windows.nonEmpty, p)
      windows.filter(_.contains("source")).foreach { l =>
        assert(l.contains("__pid"), s"per-source-only window found:\n$l")
      }
    } finally spark.conf.unset("graft.pack.maxGroupRows")
  }

  test("q166: above the adaptive bound every batch-fill rank is hierarchical — range exchanges, every running-sum window keyed by partition id (no global single-task window)") {
    // the global strategies pass a CONSTANT group: without the
    // hierarchical branch they would be ONE window partition = the
    // whole corpus in one task
    spark.conf.set("graft.pack.maxGroupRows", "1")
    try {
      val p = plan(graft.ops.ScaleOps21.q166BatchSortAblation(spark, sf))
      // the range exchange + pid stamp live behind the persisted-RDD
      // boundary (the q148 identity discipline), which surfaces here as
      // an ExistingRDD scan — rangepartitioning itself is in the child
      // job, not this plan string
      assert(p.contains("ExistingRDD"), p)
      val windows = p.linesIterator
        .filter(_.contains("windowspecdefinition(")).toSeq
      assert(windows.nonEmpty, p)
      windows.foreach { l =>
        assert(l.contains("__pid"), s"window without the partition-id key:\n$l")
      }
    } finally spark.conf.unset("graft.pack.maxGroupRows")
  }

  test("q167: the doc-bigram stream joins the scored bigram table equi-keyed with partial aggregation; bottom-K is a distributed TakeOrdered, never a global rank window") {
    val p = plan(graft.ops.ScaleOps22.q167BigramLmScore(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")
      || p.contains("ShuffledHashJoin"), p)
    assert(p.contains("partial_"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("q169/q170: planning readouts cost one partial-agg exchange each; only 1-row totals broadcast; text never exchanges") {
    for (df <- Seq(graft.ops.ScaleOps23.q169ShardBalance(spark, sf),
        graft.ops.ScaleOps23.q170FreqSpectrum(spark, sf))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), p)
      assert(p.contains("partial_"), p)
      assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"), p)
      p.linesIterator.filter(_.contains("Exchange hashpartitioning")).foreach { l =>
        assert(!l.contains("text"), l)
      }
    }
  }

  test("q171: the matrix self-join is equi on the 8-byte hash — shingle strings never exchange, the top-20 is a distributed TakeOrdered") {
    val p = plan(graft.ops.ScaleOps23.q171SourceOverlap(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")
      || p.contains("ShuffledHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    p.linesIterator.filter(_.contains("Exchange hashpartitioning")).foreach { l =>
      assert(!l.contains("text"), l)
    }
  }

  test("q172: above the adaptive bound both epoch ranks are hierarchical (windows keyed by partition id); the batch and pair joins stay equi-keyed") {
    spark.conf.set("graft.pack.maxGroupRows", "1")
    try {
      val p = plan(graft.ops.ScaleOps23.q172EpochShuffle(spark, sf))
      assert(p.contains("ExistingRDD"), p)
      assert(!p.contains("CartesianProduct"), p)
      assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")
        || p.contains("ShuffledHashJoin"), p)
      val windows = p.linesIterator
        .filter(_.contains("windowspecdefinition(")).toSeq
      assert(windows.nonEmpty, p)
      windows.foreach { l =>
        assert(l.contains("__pid"), s"window without the partition-id key:\n$l")
      }
    } finally spark.conf.unset("graft.pack.maxGroupRows")
  }

  test("q168/q173: one partial-agg exchange over the corpus; document text never reaches an exchange; no join at all") {
    for (df <- Seq(graft.ops.ScaleOps22.q168TemperatureMix(spark, sf),
        graft.ops.ScaleOps23.q173EpochBudget(spark, sf))) {
      val p = plan(df)
      assert(p.contains("partial_"), p)
      assert(!p.toLowerCase.contains("join"), p)
      p.linesIterator.filter(_.contains("Exchange hashpartitioning")).foreach { l =>
        assert(!l.contains("text"), l)
      }
    }
  }

  test("q175/q177: the model/weight side always BROADCASTS (never shuffles the token stream against it); aggregations are partial; no cartesian beyond the 1-row vocab") {
    // q175: the vocab count is the only nested-loop input (1 row,
    // explicitly broadcast); the bigram-model joins must be hash joins
    val p175 = plan(graft.ops.ScaleOps24.q175SmoothedLmScore(spark, sf))
    assert(p175.contains("partial_"), p175)
    val bnl175 = p175.linesIterator
      .count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnl175 <= 1, s"q175 grew a second nested-loop join:\n$p175")
    assert(!p175.contains("CartesianProduct"), p175)
    // q177: the 65-row weight table rides a broadcast hash join — the
    // corpus-token-sized feature stream must never exchange FOR the join
    val p177 = plan(graft.ops.ScaleOps25.q177PerceptronApply(spark, sf))
    assert(p177.contains("BroadcastHashJoin"), p177)
    assert(!p177.contains("CartesianProduct") &&
      !p177.contains("SortMergeJoin"), p177)
    assert(p177.contains("partial_"), p177)
    assert(p177.contains("TakeOrderedAndProject"),
      s"q177's bottom-k must be a distributed TakeOrdered, not a global sort:\n$p177")
  }

  test("q181/q182 + the tertile histogram route: histogram aggs are partial, the boundary table broadcasts back, the shard-file rollup is one partial-agg exchange with no join") {
    import org.apache.spark.sql.functions.col
    // q181: the rank-selection chain aggregates partially and never
    // grows a cartesian/nested-loop join anywhere
    val p181 = plan(graft.ops.ScaleOps26.q181TertileBoundaries(spark, sf))
    assert(p181.contains("partial_"), p181)
    assert(!p181.contains("CartesianProduct") &&
      !p181.contains("BroadcastNestedLoopJoin"), p181)
    // the ROUTED assignment on the histogram arm: the ≤#langs boundary
    // table must BROADCAST back onto the doc stream — a doc-sided
    // shuffle for the lang join would defeat the arm's purpose
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val wl = graft.ops.ScaleOps22.mleDocScoresOf(docs)
      .join(docs.select(col("doc_id").cast("long").as("doc_id"), col("lang")),
        Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("score_fp"))
    val pa = plan(graft.ops.ScaleOps25.assignTertiles(wl, Long.MaxValue))
    assert(pa.contains("BroadcastHashJoin"), pa)
    assert(!pa.contains("CartesianProduct"), pa)
    // q182: pure-map assignment + ONE partial-agg exchange on the
    // (shard, file) cell — no join, and no exchange ever carries text
    val p182 = plan(graft.ops.ScaleOps26.q182ShardFiles(spark, sf))
    assert(p182.contains("partial_"), p182)
    assert(!p182.toLowerCase.contains("join"), p182)
    p182.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .foreach { l => assert(!l.contains("text"), l) }
  }

  test("q183: the reference-LM scorer has ZERO nested-loop joins (V rides as a literal, unlike q175's 1-row vocab cross join); model joins are equi; bottom-k distributed") {
    val p = plan(graft.ops.ScaleOps27.q183RefLmScore(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"q183 must carry no nested-loop join at all:\n$p")
    assert(p.contains("partial_"), p)
    assert(p.contains("TakeOrderedAndProject"),
      s"q183's bottom-k must be a distributed TakeOrdered:\n$p")
  }

  test("q190: the 20-round log2 chain is a PURE MAP — the same joins and exchanges as q183 (zero nested-loop, equi model joins, partial aggs, distributed top-k), with no exchange, join, or generator added by the chain itself") {
    val p = plan(graft.ops.ScaleOps30.q190LogPerplexityScore(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"q190 must carry no nested-loop join at all:\n$p")
    assert(p.contains("partial_"), p)
    assert(p.contains("TakeOrderedAndProject"),
      s"q190's top-k must be a distributed TakeOrdered:\n$p")
    // the chain must cost projections only: q190's plan has exactly the
    // operator counts of q183's (same scans, joins, exchanges, aggs)
    val q183 = plan(graft.ops.ScaleOps27.q183RefLmScore(spark, sf))
    def count(s: String, op: String) = s.sliding(op.length).count(_ == op)
    Seq("Exchange", "SortMergeJoin", "BroadcastHashJoin", "Generate")
      .foreach { op =>
        assert(count(p, op) == count(q183, op),
          s"q190 added $op beyond q183's shape:\n$p")
      }
  }

  test("q191: the log-domain disposition carries EXACTLY q185's operator counts — the q190 chain plus the score negation cost projections only, and the boundary pass/rollup shape is byte-for-byte the arithmetic arm's") {
    val p = plan(graft.ops.ScaleOps31.q191LogPlxTertileMix(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"q191 must carry no nested-loop join at all:\n$p")
    assert(p.contains("partial_"), p)
    val q185 = plan(graft.ops.ScaleOps27.q185RefLmTertileMix(spark, sf))
    def count(s: String, op: String) = s.sliding(op.length).count(_ == op)
    Seq("Exchange", "SortMergeJoin", "BroadcastHashJoin", "Generate")
      .foreach { op =>
        assert(count(p, op) == count(q185, op),
          s"q191 added $op beyond q185's shape:\n$p")
      }
  }
}
