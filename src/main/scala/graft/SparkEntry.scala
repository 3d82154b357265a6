package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops.{Relational, ScaleOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.q01PricingSummary _),
    "q02_filter_scan"     -> (Relational.q02FilterScan _),
    "q03_join_revenue"    -> (Relational.q03JoinRevenue _),
    "q04_broadcast_dim"   -> (Relational.q04BroadcastDim _),
    "q05_anti_join"       -> (Relational.q05AntiJoin _),
    "q06_semi_join"       -> (Relational.q06SemiJoin _),
    "q07_distinct"        -> (Relational.q07Distinct _),
    "q08_topk"            -> (Relational.q08TopK _),
    "q09_last_wins"       -> (Relational.q09LastWins _),
    "q10_upsert_merge"    -> (Relational.q10UpsertMerge _),
    "q11_union"           -> (Relational.q11Union _),
    "q12_rollup"          -> (Relational.q12Rollup _),
    "q13_window_running"  -> (Relational.q13WindowRunning _),
    "q14_time_bucket"     -> (Relational.q14TimeBucket _),
    "q15_dedup_exact"     -> (ScaleOps.q15DedupExact _),
    "q16_token_count"     -> (ScaleOps.q16TokenCount _),
    "q17_quality_score"   -> (ScaleOps.q17Quality _),
    "q18_lang_id"         -> (ScaleOps.q18LangId _),
    "q19_ngram_jaccard"   -> (ScaleOps.q19NgramJaccard _),
    "q20_ann_cosine"      -> (ScaleOps.q20AnnBruteForce _),
    "q21_minhash_lsh"     -> (ScaleOps.q21MinhashLsh _),
    "q22_simhash"         -> (ScaleOps.q22Simhash _),
    "q23_fingerprint"     -> (ScaleOps.q23Fingerprint _),
    "q24_ann_lsh"         -> (ScaleOps.q24AnnLsh _),
    "q25_embedding_dup"   -> (ScaleOps.q25EmbeddingDup _),
    "q26_multimodal"      -> (ScaleOps.q26Multimodal _),
    "q27_sessionize"      -> (ScaleOps.q27Sessionize _),
    "q28_salted_agg"      -> (graft.ops.Scale.q28SaltedAgg _),
    "q29_salted_join"     -> (graft.ops.Scale.q29SaltedJoin _),
    "q30_asof_join"       -> (graft.ops.Relational2.q30AsofJoin _),
    "q31_exists_agg"      -> (graft.ops.Relational2.q31ExistsAgg _),
    "q32_pivot"           -> (graft.ops.Relational2.q32Pivot _),
    "q33_cube"            -> (graft.ops.Relational2.q33Cube _),
    "q34_percentile"      -> (graft.ops.Relational2.q34Percentile _),
    "q35_ann_ivf"         -> (ScaleOps.q35AnnIvf _),
    "q36_curation"        -> (ScaleOps.q36Curation _),
    "q37_approx_sketches" -> (ScaleOps.q37ApproxSketches _),
    "q38_range_join"      -> (graft.ops.Relational3.q38RangeJoin _),
    "q39_setops"          -> (graft.ops.Relational3.q39SetOps _),
    "q40_grouping_sets"   -> (graft.ops.Relational3.q40GroupingSets _),
    "q41_string_funcs"    -> (graft.ops.Relational3.q41StringFuncs _),
    "q42_wordcount"       -> (graft.ops.Relational3.q42WordCount _),
    "q43_above_avg"       -> (graft.ops.Relational3.q43AboveAvg _),
    "q44_window_nav"      -> (graft.ops.Relational3.q44WindowNav _),
    "q45_interval_join"   -> (graft.ops.Relational3.q45IntervalJoin _),
    "q46_json"            -> (graft.ops.Relational3.q46Json _),
    "q47_count_distinct"  -> (graft.ops.Relational3.q47CountDistinct _),
    "q48_moving_avg"      -> (graft.ops.Relational3.q48MovingAvg _),
    "q49_grouped_topk"    -> (graft.ops.Relational3.q49GroupedTopK _),
    "q50_variance"        -> (graft.ops.Relational3.q50Variance _),
    "q51_train_split"     -> (graft.ops.Relational3.q51TrainSplit _),
    "q52_corr"            -> (graft.ops.Relational3.q52Corr _),
    "q53_setops_all"      -> (graft.ops.Relational3.q53SetOpsAll _),
    "q54_snapshot_diff"   -> (graft.ops.Relational3.q54SnapshotDiff _),
    "q55_unpivot"         -> (graft.ops.Relational3.q55Unpivot _),
    "q56_streaks"         -> (graft.ops.Relational3.q56Streaks _),
    "q57_repetition"      -> (ScaleOps.q57Repetition _),
    "q58_decontaminate"   -> (ScaleOps.q58Decontaminate _),
    "q59_pii_redact"      -> (graft.ops.ScaleOps2.q59PiiRedact _),
    "q60_dedup_clusters"  -> (graft.ops.ScaleOps2.q60DedupClusters _),
    "q61_sequence_pack"   -> (graft.ops.ScaleOps2.q61SequencePack _),
    "q62_source_mix"      -> (graft.ops.ScaleOps2.q62SourceMix _),
    "q63_leakage_safe_split" -> (graft.ops.ScaleOps2.q63LeakageSafeSplit _),
    "q64_chunk_dedup"     -> (graft.ops.ScaleOps3.q64ChunkDedup _),
    "q65_tfidf"           -> (graft.ops.ScaleOps3.q65Tfidf _),
    "q66_semdedup"        -> (graft.ops.ScaleOps3.q66Semdedup _),
    "q67_bloom_dedup"     -> (graft.ops.ScaleOps3.q67BloomDedup _),
    "q68_containment"     -> (graft.ops.ScaleOps3.q68Containment _),
    "q69_stratified_sample" -> (graft.ops.ScaleOps3.q69StratifiedSample _),
    "q70_histogram"       -> (graft.ops.ScaleOps3.q70Histogram _),
    "q71_source_overlap"  -> (graft.ops.ScaleOps3.q71SourceOverlap _),
    "q72_equidepth"       -> (graft.ops.ScaleOps4.q72EquiDepth _),
    "q73_token_budget"    -> (graft.ops.ScaleOps4.q73TokenBudget _),
    "q74_heavy_hitters"   -> (graft.ops.ScaleOps4.q74HeavyHitters _),
    "q75_canonical"       -> (graft.ops.ScaleOps4.q75Canonical _),
    "q76_source_profile"  -> (graft.ops.ScaleOps4.q76SourceProfile _),
    "q77_boilerplate"     -> (graft.ops.ScaleOps4.q77Boilerplate _),
    "q78_dedup_savings"   -> (graft.ops.ScaleOps4.q78DedupSavings _),
    "q79_wav_decode"      -> (graft.ops.ScaleOps4.q79WavDecode _),
    "q80_audio_stats"     -> (graft.ops.ScaleOps4.q80AudioStats _),
    "q81_mp4_probe"       -> (graft.ops.ScaleOps4.q81Mp4Probe _),
    "q82_mp4_tracks"      -> (graft.ops.ScaleOps4.q82TrackStats _),
    "q83_mp3_scan"        -> (graft.ops.ScaleOps4.q83Mp3Scan _),
    "q84_mp4_samples"     -> (graft.ops.ScaleOps4.q84Mp4Samples _),
    "q85_dup_spans"       -> (graft.ops.ScaleOps4.q85DupSpans _),
    "q86_dedup_clean"     -> (graft.ops.ScaleOps4.q86DedupClean _),
    "q87_token_rarity"    -> (graft.ops.ScaleOps4.q87TokenRarity _),
    "q88_fuzzy_join"      -> (graft.ops.ScaleOps5.q88FuzzyJoin _),
    "q89_bigram_lm"       -> (graft.ops.ScaleOps5.q89BigramLm _),
    "q90_pq_ann"          -> (graft.ops.ScaleOps5.q90PqAnn _),
    "q91_bm25"            -> (graft.ops.ScaleOps6.q91Bm25 _),
    "q92_normalize"       -> (graft.ops.ScaleOps6.q92Normalize _),
    "q93_scd2"            -> (graft.ops.ScaleOps6.q93Scd2 _),
    "q94_zorder"          -> (graft.ops.ScaleOps6.q94Zorder _),
    "q95_char_diversity"  -> (graft.ops.ScaleOps6.q95CharDiversity _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * The driver contract form: the two data-dependent mirrors (q35/q66
    * inline trained centroids) resolve for the most recently trained
    * corpus. A caller that knows its corpus dir — like Verify — should
    * use [[oracleSqlFor]], which keys those mirrors by dir and cannot be
    * confused by another session training a different corpus in the same
    * JVM. */
  def oracleSql: Map[String, String] =
    staticOracleSql ++
    ScaleOps.q35SqlOpt.map("q35_ann_ivf" -> _) ++
    graft.ops.ScaleOps3.q66SqlOpt.map("q66_semdedup" -> _) ++
    graft.ops.ScaleOps5.q90SqlOpt.map("q90_pq_ann" -> _)

  /** Dir-keyed oracle set: identical to [[oracleSql]] except the
    * data-dependent q35/q66/q90 mirrors are built from the centroids /
    * codebooks trained on exactly `dir` (absent if that corpus has not
    * been trained in this JVM). */
  def oracleSqlFor(dir: String): Map[String, String] =
    staticOracleSql ++
    ScaleOps.q35SqlFor(dir).map("q35_ann_ivf" -> _) ++
    graft.ops.ScaleOps3.q66SqlFor(dir).map("q66_semdedup" -> _) ++
    graft.ops.ScaleOps5.q90SqlFor(dir).map("q90_pq_ann" -> _)

  private def staticOracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> Relational.q01Sql,
    "q02_filter_scan"     -> Relational.q02Sql,
    "q03_join_revenue"    -> Relational.q03Sql,
    "q04_broadcast_dim"   -> Relational.q04Sql,
    "q05_anti_join"       -> Relational.q05Sql,
    "q06_semi_join"       -> Relational.q06Sql,
    "q07_distinct"        -> Relational.q07Sql,
    "q08_topk"            -> Relational.q08Sql,
    "q09_last_wins"       -> Relational.q09Sql,
    "q10_upsert_merge"    -> Relational.q10Sql,
    "q11_union"           -> Relational.q11Sql,
    "q12_rollup"          -> Relational.q12Sql,
    "q13_window_running"  -> Relational.q13Sql,
    "q14_time_bucket"     -> Relational.q14Sql,
    "q15_dedup_exact"     -> ScaleOps.q15Sql,
    "q16_token_count"     -> ScaleOps.q16Sql,
    "q17_quality_score"   -> ScaleOps.q17Sql,
    "q18_lang_id"         -> ScaleOps.q18Sql,
    "q19_ngram_jaccard"   -> ScaleOps.q19Sql,
    "q20_ann_cosine"      -> ScaleOps.q20Sql,
    "q21_minhash_lsh"     -> ScaleOps.q21Sql,
    "q22_simhash"         -> ScaleOps.q22Sql,
    "q23_fingerprint"     -> ScaleOps.q23Sql,
    "q24_ann_lsh"         -> graft.ops.ScaleOps2.q24Sql,
    "q25_embedding_dup"   -> ScaleOps.q25Sql,
    "q26_multimodal"      -> ScaleOps.q26Sql,
    "q27_sessionize"      -> ScaleOps.q27Sql,
    "q28_salted_agg"      -> graft.ops.Scale.q28Sql,
    "q29_salted_join"     -> graft.ops.Scale.q29Sql,
    "q30_asof_join"       -> graft.ops.Relational2.q30Sql,
    "q31_exists_agg"      -> graft.ops.Relational2.q31Sql,
    "q32_pivot"           -> graft.ops.Relational2.q32Sql,
    "q33_cube"            -> graft.ops.Relational2.q33Sql,
    "q34_percentile"      -> graft.ops.Relational2.q34Sql,
    "q36_curation"        -> ScaleOps.q36Sql,
    "q37_approx_sketches" -> ScaleOps.q37Sql,
    "q38_range_join"      -> graft.ops.Relational3.q38Sql,
    "q39_setops"          -> graft.ops.Relational3.q39Sql,
    "q40_grouping_sets"   -> graft.ops.Relational3.q40Sql,
    "q41_string_funcs"    -> graft.ops.Relational3.q41Sql,
    "q42_wordcount"       -> graft.ops.Relational3.q42Sql,
    "q43_above_avg"       -> graft.ops.Relational3.q43Sql,
    "q44_window_nav"      -> graft.ops.Relational3.q44Sql,
    "q45_interval_join"   -> graft.ops.Relational3.q45Sql,
    "q46_json"            -> graft.ops.Relational3.q46Sql,
    "q47_count_distinct"  -> graft.ops.Relational3.q47Sql,
    "q48_moving_avg"      -> graft.ops.Relational3.q48Sql,
    "q49_grouped_topk"    -> graft.ops.Relational3.q49Sql,
    "q50_variance"        -> graft.ops.Relational3.q50Sql,
    "q51_train_split"     -> graft.ops.Relational3.q51Sql,
    "q52_corr"            -> graft.ops.Relational3.q52Sql,
    "q53_setops_all"      -> graft.ops.Relational3.q53Sql,
    "q54_snapshot_diff"   -> graft.ops.Relational3.q54Sql,
    "q55_unpivot"         -> graft.ops.Relational3.q55Sql,
    "q56_streaks"         -> graft.ops.Relational3.q56Sql,
    "q57_repetition"      -> ScaleOps.q57Sql,
    "q58_decontaminate"   -> ScaleOps.q58Sql,
    "q59_pii_redact"      -> graft.ops.ScaleOps2.q59Sql,
    "q60_dedup_clusters"  -> graft.ops.ScaleOps2.q60Sql,
    "q61_sequence_pack"   -> graft.ops.ScaleOps2.q61Sql,
    "q62_source_mix"      -> graft.ops.ScaleOps2.q62Sql,
    "q63_leakage_safe_split" -> graft.ops.ScaleOps2.q63Sql,
    "q64_chunk_dedup"     -> graft.ops.ScaleOps3.q64Sql,
    "q65_tfidf"           -> graft.ops.ScaleOps3.q65Sql,
    "q67_bloom_dedup"     -> graft.ops.ScaleOps3.q67Sql,
    "q68_containment"     -> graft.ops.ScaleOps3.q68Sql,
    "q69_stratified_sample" -> graft.ops.ScaleOps3.q69Sql,
    "q70_histogram"       -> graft.ops.ScaleOps3.q70Sql,
    "q71_source_overlap"  -> graft.ops.ScaleOps3.q71Sql,
    "q72_equidepth"       -> graft.ops.ScaleOps4.q72Sql,
    "q73_token_budget"    -> graft.ops.ScaleOps4.q73Sql,
    "q74_heavy_hitters"   -> graft.ops.ScaleOps4.q74Sql,
    "q75_canonical"       -> graft.ops.ScaleOps4.q75Sql,
    "q76_source_profile"  -> graft.ops.ScaleOps4.q76Sql,
    "q77_boilerplate"     -> graft.ops.ScaleOps4.q77Sql,
    "q78_dedup_savings"   -> graft.ops.ScaleOps4.q78Sql,
    "q79_wav_decode"      -> graft.ops.ScaleOps4.q79Sql,
    "q80_audio_stats"     -> graft.ops.ScaleOps4.q80Sql,
    "q81_mp4_probe"       -> graft.ops.ScaleOps4.q81Sql,
    "q82_mp4_tracks"      -> graft.ops.ScaleOps4.q82Sql,
    "q83_mp3_scan"        -> graft.ops.ScaleOps4.q83Sql,
    "q84_mp4_samples"     -> graft.ops.ScaleOps4.q84Sql,
    "q85_dup_spans"       -> graft.ops.ScaleOps4.q85Sql,
    "q86_dedup_clean"     -> graft.ops.ScaleOps4.q86Sql,
    "q87_token_rarity"    -> graft.ops.ScaleOps4.q87Sql,
    "q88_fuzzy_join"      -> graft.ops.ScaleOps5.q88Sql,
    "q89_bigram_lm"       -> graft.ops.ScaleOps5.q89Sql,
    "q91_bm25"            -> graft.ops.ScaleOps6.q91Sql,
    "q92_normalize"       -> graft.ops.ScaleOps6.q92Sql,
    "q93_scd2"            -> graft.ops.ScaleOps6.q93Sql,
    "q94_zorder"          -> graft.ops.ScaleOps6.q94Sql,
    "q95_char_diversity"  -> graft.ops.ScaleOps6.q95Sql,
    // q21-q24 carry full DuckDB mirrors: FNV-1a signature arithmetic for
    // q21-q23 (ScaleOps.duckFnv) and the inlined ±1 hyperplane sign
    // matrix + list_inner_product double accumulation for q24
    // (ScaleOps2.q24Sql).
    // q35/q66 (data-dependent centroid-literal mirrors) are appended by
    // oracleSql/oracleSqlFor above.
  )
}
