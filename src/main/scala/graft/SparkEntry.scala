package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.operators.{Relational, Windows, Scalars, TimeSeries, LlmOps, TrainingData, IntervalJoin, Analytics, Graph}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is one operator from the SURVEY.md §2 inventory;
  * `oracleSql` carries the DuckDB-equivalent SQL the driver hash-compares
  * against (graft.Oracle documents the few dialect/type alignments).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggPricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 scans
    "scan_project" -> (Relational.scanProject _),
    "scan_range_pruned" -> (Relational.scanRangePruned _),
    "scan_partition_pruned" -> (Relational.scanPartitionPruned _),
    "scan_zorder_pruned" -> (Relational.scanZorderPruned _),
    "source_csv_roundtrip" -> (Relational.sourceCsvRoundtrip _),
    "source_json_roundtrip" -> (Relational.sourceJsonRoundtrip _),
    "source_orc_roundtrip" -> (Relational.sourceOrcRoundtrip _),
    // §2.2 filters
    "filter_predicates" -> (Relational.filterPredicates _),
    "filter_like_null" -> (Relational.filterLikeNull _),
    // §2.3 joins
    "join_broadcast" -> (Relational.joinBroadcast _),
    "join_shuffle" -> (Relational.joinShuffle _),
    "join_bucketed" -> (Relational.joinBucketed _),
    "join_star_5way" -> (Relational.joinStar5Way _),
    "join_left_outer" -> (Relational.joinLeftOuter _),
    "join_full_outer" -> (Relational.joinFullOuter _),
    "join_right_outer" -> (Relational.joinRightOuter _),
    "join_semi" -> (Relational.joinSemi _),
    "join_anti" -> (Relational.joinAnti _),
    "join_range_theta" -> (Relational.joinRangeTheta _),
    "join_interval_bucketed" -> (IntervalJoin.joinIntervalBucketed _),
    "join_asof" -> (Relational.joinAsof _),
    "join_asof_native" -> (Relational.joinAsofNative _),
    "join_cross" -> (Relational.joinCross _),
    "join_skew_salted" -> (Relational.joinSkewSalted _),
    // §2.4 aggregations
    "agg_pricing_summary" -> (Relational.aggPricingSummary _),
    "agg_count_distinct" -> (Relational.aggCountDistinct _),
    "agg_kmv_distinct" -> (Relational.aggKmvDistinct _),
    "agg_filtered" -> (Relational.aggFiltered _),
    "agg_rollup" -> (Relational.aggRollup _),
    "agg_cube" -> (Relational.aggCube _),
    "agg_grouping_sets" -> (Relational.aggGroupingSets _),
    "agg_stats" -> (Relational.aggStats _),
    "agg_regression" -> (Relational.aggRegression _),
    "agg_percentile" -> (Relational.aggPercentile _),
    "agg_having" -> (Relational.aggHaving _),
    "agg_bool" -> (Relational.aggBool _),
    "agg_string_agg" -> (Relational.aggStringAgg _),
    "agg_array_sorted" -> (Relational.aggArraySorted _),
    // §2.5 windows
    "win_rank_topk_per_group" -> (Windows.winRankTopkPerGroup _),
    "win_rank_dense" -> (Windows.winRankDense _),
    "win_dense_rank_global" -> (Windows.winDenseRankGlobal _),
    "win_rank_string_global" -> (Windows.winRankStringGlobal _),
    "win_rank_value_global" -> (Windows.winRankValueGlobal _),
    "win_lag_lead" -> (Windows.winLagLead _),
    "win_lag_ignore_nulls" -> (Windows.winLagIgnoreNulls _),
    "win_rolling_median" -> (Windows.winRollingMedian _),
    "win_nth_value" -> (Windows.winNthValue _),
    "win_cume_dist" -> (Windows.winCumeDist _),
    "win_moving_avg" -> (Windows.winMovingAvg _),
    "win_cumsum" -> (Windows.winCumsum _),
    "win_range_time" -> (Windows.winRangeTime _),
    "win_range_numeric" -> (Windows.winRangeNumeric _),
    "win_first_last" -> (Windows.winFirstLast _),
    "win_ntile_pctrank" -> (Windows.winNtilePctrank _),
    // §2.6 sorts / top-k
    "sort_multi" -> (Relational.sortMulti _),
    "topk_global" -> (Relational.topkGlobal _),
    // §2.7 set ops
    "set_union" -> (Relational.setUnion _),
    "set_union_all" -> (Relational.setUnionAll _),
    "set_intersect" -> (Relational.setIntersect _),
    "set_intersect_all" -> (Relational.setIntersectAll _),
    "set_except" -> (Relational.setExcept _),
    "set_except_all" -> (Relational.setExceptAll _),
    // §2.8 scalar functions
    "fn_string" -> (Scalars.fnString _),
    "fn_string_extras" -> (Scalars.fnStringExtras _),
    "fn_try_cast" -> (Scalars.fnTryCast _),
    "fn_regexp" -> (Scalars.fnRegexp _),
    "fn_date" -> (Scalars.fnDate _),
    "fn_math" -> (Scalars.fnMath _),
    "fn_bitwise" -> (Scalars.fnBitwise _),
    "fn_binhex" -> (Scalars.fnBinhex _),
    "fn_case_coalesce" -> (Scalars.fnCaseCoalesce _),
    "fn_json" -> (Scalars.fnJson _),
    "fn_json_struct" -> (Scalars.fnJsonStruct _),
    "fn_array" -> (Scalars.fnArray _),
    "fn_array_lambda" -> (Scalars.fnArrayLambda _),
    "fn_explode_wordcount" -> (Scalars.fnExplodeWordcount _),
    "fn_posexplode" -> (Scalars.fnPosexplode _),
    // §2.9 time-series / streaming (batch forms)
    "stream_tumbling" -> (TimeSeries.streamTumbling _),
    "stream_sliding" -> (TimeSeries.streamSliding _),
    "stream_session" -> (TimeSeries.streamSession _),
    "stream_session_native" -> (TimeSeries.streamSessionNative _),
    "stream_dedup" -> (TimeSeries.streamDedup _),
    "stream_late_filter" -> (TimeSeries.streamLateFilter _),
    // §2.9/§2.4/§2.5 product analytics (added round 9)
    "ts_funnel" -> (Analytics.tsFunnel _),
    "win_gaps_islands" -> (Analytics.winGapsIslands _),
    "ts_retention_cohort" -> (Analytics.tsRetentionCohort _),
    "agg_histogram" -> (Analytics.aggHistogram _),
    "agg_mode" -> (Analytics.aggMode _),
    "ts_ohlc_resample" -> (Analytics.tsOhlcResample _),
    "ts_gap_fill" -> (Analytics.tsGapFill _),
    // §2.10 LLM-data-pipeline
    "llm_exact_dedup" -> (LlmOps.llmExactDedup _),
    "llm_dedup_keep_first" -> (LlmOps.llmDedupKeepFirst _),
    "llm_docstats" -> (LlmOps.llmDocstats _),
    "llm_ngrams" -> (LlmOps.llmNgrams _),
    "llm_cosine_topk" -> (LlmOps.llmCosineTopk _),
    "llm_knn_label" -> (LlmOps.llmKnnLabel _),
    "llm_minhash_jaccard" -> (LlmOps.llmMinhashJaccard _),
    "llm_importance_sample" -> (LlmOps.llmImportanceSample _),
    "llm_dedup_append" -> (LlmOps.llmDedupAppend _),
    "llm_dedup_clusters" -> (TrainingData.llmDedupClusters _),
    "llm_curate_chain" -> (LlmOps.llmCurateChain _),
    // §2.11 subqueries
    "join_lateral" -> (Relational.joinLateral _),
    "agg_moments" -> (Relational.aggMoments _),
    "sample_stratified" -> (Relational.sampleStratified _),
    "graph_pagerank" -> (Graph.graphPagerank _),
    "graph_common_neighbors" -> (Graph.graphCommonNeighbors _),
    "graph_triangle_count" -> (Graph.graphTriangleCount _),
    "join_asof_forward" -> (Relational.joinAsofForward _),
    "join_asof_tolerance" -> (Relational.joinAsofTolerance _),
    "ts_session_stats" -> (TimeSeries.tsSessionStats _),
    "win_running_distinct" -> (Windows.winRunningDistinct _),
    "ts_changepoint" -> (TimeSeries.tsChangepoint _),
    "fn_date_extras" -> (Scalars.fnDateExtras _),
    "agg_bitops" -> (Relational.aggBitops _),
    "fn_round_modes" -> (Scalars.fnRoundModes _),
    "ts_inter_arrival" -> (TimeSeries.tsInterArrival _),
    "ts_autocorr" -> (TimeSeries.tsAutocorr _),
    "ts_time_weighted_avg" -> (TimeSeries.tsTimeWeightedAvg _),
    "ts_ewma" -> (TimeSeries.tsEwma _),
    "ts_anomaly_zscore" -> (TimeSeries.tsAnomalyZscore _),
    "hrv_band_power" -> (TrainingData.hrvBandPower _),
    "hrv_sampen" -> (TrainingData.hrvSampen _),
    "fn_url" -> (Scalars.fnUrl _),
    "subq_scalar_corr" -> (Relational.subqScalarCorr _),
    "subq_in" -> (Relational.subqIn _),
    "subq_not_in" -> (Relational.subqNotIn _),
    // §2.13 training-data pipeline
    "text_quality" -> (TrainingData.textQuality _),
    "text_tokencount" -> (TrainingData.textTokencount _),
    "text_langid" -> (TrainingData.textLangid _),
    "text_fingerprint" -> (TrainingData.textFingerprint _),
    "text_winnow_fingerprint" -> (TrainingData.textWinnowFingerprint _),
    "text_tfidf" -> (TrainingData.textTfidf _),
    "dedup_simhash" -> (TrainingData.dedupSimhash _),
    "dedup_ngram_jaccard" -> (TrainingData.dedupNgramJaccard _),
    "dedup_levenshtein" -> (TrainingData.dedupLevenshtein _),
    "text_normalize" -> (TrainingData.textNormalize _),
    "llm_pack_sequences" -> (TrainingData.llmPackSequences _),
    "llm_chunk_text" -> (TrainingData.llmChunkText _),
    "text_unigram_logprob" -> (TrainingData.textUnigramLogprob _),
    "llm_bigram_logprob" -> (TrainingData.llmBigramLogprob _),
    "dedup_winnow" -> (TrainingData.dedupWinnow _),
    "dedup_minhash_lsh" -> (TrainingData.dedupMinhashLsh _),
    "dedup_embedding" -> (TrainingData.dedupEmbedding _),
    "dedup_cc_clusters" -> (TrainingData.dedupCcClusters _),
    "hrv_rmssd" -> (TrainingData.hrvRmssd _),
    "hrv_clean_interp" -> (TrainingData.hrvCleanInterp _),
    "hrv_resample" -> (TrainingData.hrvResample _),
    "hrv_poincare" -> (TrainingData.hrvPoincare _),
    "agg_corr" -> (TrainingData.aggCorr _),
    "agg_pivot" -> (TrainingData.aggPivot _),
    "agg_unpivot" -> (TrainingData.aggUnpivot _),
    "agg_argmax" -> (TrainingData.aggArgmax _),
    "llm_train_split" -> (TrainingData.llmTrainSplit _),
    "text_pii_redact" -> (TrainingData.textPiiRedact _),
    "text_decontaminate" -> (TrainingData.textDecontaminate _),
    "llm_negative_sample" -> (TrainingData.llmNegativeSample _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracle.sql
}
