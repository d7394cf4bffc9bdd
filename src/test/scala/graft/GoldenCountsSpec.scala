package graft

/** Golden row counts for every judged query at sf0.001 (SURVEY.md §5.4,
  * numbers from Appendix A). Catches nondeterminism/regression drift
  * cheaply without a DuckDB dependency. */
class GoldenCountsSpec extends SparkSpecBase {

  private val expected: Map[String, Long] = Map(
    "scan_project" -> 100, "scan_range_pruned" -> 296,
    "scan_partition_pruned" -> 5, "scan_zorder_pruned" -> 5,
    "source_csv_roundtrip" -> 3, "source_json_roundtrip" -> 5,
    "source_orc_roundtrip" -> 3, "graph_triangle_count" -> 200,
    "llm_importance_sample" -> 67, "join_asof_tolerance" -> 202,
    "ts_session_stats" -> 15, "llm_dedup_clusters" -> 45,
    "filter_predicates" -> 433, "filter_like_null" -> 39,
    "join_broadcast" -> 25, "join_shuffle" -> 20, "join_bucketed" -> 20,
    "join_star_5way" -> 5,
    "join_left_outer" -> 50, "join_full_outer" -> 21,
    "join_right_outer" -> 100,
    "join_semi" -> 150, "join_anti" -> 18, "join_bloom_prefilter" -> 3,
    "join_range_theta" -> 10, "join_interval_bucketed" -> 36,
    "join_asof" -> 500, "join_asof_native" -> 202,
    "join_cross" -> 25,
    "join_skew_salted" -> 5,
    "agg_pricing_summary" -> 6, "agg_count_distinct" -> 5, "agg_filtered" -> 15,
    "agg_kmv_distinct" -> 10, "llm_dedup_append" -> 500,
    "agg_cms_freq" -> 15, "fn_map" -> 15,
    "join_asof_nearest" -> 202, "llm_lsh_append" -> 28,
    "ts_cross_corr" -> 15, "hrv_dfa" -> 10,
    "hrv_csi_cvi" -> 15, "hrv_geometry" -> 15, "hrv_time_extras" -> 15,
    "hrv_tinn" -> 15, "ts_mad_anomaly" -> 95, "dedup_containment" -> 196,
    "win_frame_exclude" -> 1000, "agg_heavy_hitters" -> 5, "ts_sax" -> 94,
    "agg_percentile_disc" -> 3, "win_frame_groups" -> 1000,
    "graph_bfs" -> 10, "text_repetition" -> 500,
    "ts_dow_profile" -> 105, "subq_exists_having" -> 93,
    "agg_weighted_median" -> 3, "ts_multires" -> 164,
    "win_distinct_frame" -> 1000, "source_schema_evolution" -> 6,
    "graph_kcore" -> 10, "dedup_prefix" -> 21, "hrv_mse" -> 45,
    "hrv_ectopic" -> 15, "hrv_rolling_rmssd" -> 1000, "hrv_sdann" -> 15, "hrv_feature_table" -> 15,
    "agg_rollup" -> 10, "agg_cube" -> 24, "agg_grouping_sets" -> 21,
    "agg_stats" -> 5, "agg_percentile" -> 5, "agg_having" -> 50,
    "agg_bool" -> 6, "agg_string_agg" -> 5,
    "agg_array_sorted" -> 150,
    "win_rank_topk_per_group" -> 449, "win_rank_dense" -> 100,
    "win_dense_rank_global" -> 500, "win_rank_string_global" -> 300,
    "win_rank_value_global" -> 500,
    "win_lag_lead" -> 500, "win_lag_ignore_nulls" -> 650,
    "win_rolling_median" -> 650, "win_nth_value" -> 149, "win_cume_dist" -> 500, "win_moving_avg" -> 500, "win_cumsum" -> 500,
    "win_range_time" -> 500, "win_first_last" -> 500, "win_ntile_pctrank" -> 150,
    "sort_multi" -> 100, "topk_global" -> 10,
    "set_union" -> 25, "set_union_all" -> 1, "set_intersect" -> 10, "set_except" -> 15,
    "set_intersect_all" -> 10, "set_except_all" -> 140,
    "fn_string" -> 100, "fn_string_extras" -> 100, "fn_try_cast" -> 200,
    "fn_regexp" -> 200, "fn_date" -> 200, "fn_math" -> 200,
    "fn_bitwise" -> 200, "fn_binhex" -> 100,
    "fn_case_coalesce" -> 200, "fn_json" -> 500, "fn_json_struct" -> 500,
    "fn_array" -> 200,
    "fn_explode_wordcount" -> 31, "fn_posexplode" -> 1081,
    "stream_tumbling" -> 868, "stream_sliding" -> 979, "stream_session" -> 946,
    "stream_session_native" -> 946,
    "stream_dedup" -> 1, "stream_late_filter" -> 1,
    "ts_funnel" -> 15, "win_gaps_islands" -> 60, "ts_retention_cohort" -> 5,
    "agg_histogram" -> 29, "agg_mode" -> 15, "dedup_cc_clusters" -> 77,
    "ts_ohlc_resample" -> 268, "ts_gap_fill" -> 299,
    "fn_array_lambda" -> 200, "win_range_numeric" -> 500,
    "llm_chunk_text" -> 217, "text_unigram_logprob" -> 500,
    "llm_bigram_logprob" -> 500,
    "agg_regression" -> 5,
    "llm_exact_dedup" -> 500, "llm_dedup_keep_first" -> 75, "llm_docstats" -> 5,
    "llm_ngrams" -> 30, "llm_cosine_topk" -> 50, "llm_knn_label" -> 10,
    "llm_minhash_jaccard" -> 763, "llm_curate_chain" -> 477,
    "subq_scalar_corr" -> 48, "subq_in" -> 193, "subq_not_in" -> 98,
    "text_quality" -> 300, "text_tokencount" -> 5, "text_langid" -> 10,
    "text_fingerprint" -> 300, "text_char_entropy" -> 500, "text_winnow_fingerprint" -> 50,
    "dedup_simhash" -> 100,
    "dedup_ngram_jaccard" -> 342, "dedup_levenshtein" -> 6, "text_normalize" -> 200,
    "llm_pack_sequences" -> 500, "dedup_winnow" -> 108, "dedup_embedding" -> 56,
    "hrv_rmssd" -> 15, "hrv_clean_interp" -> 1000,
    "agg_pivot" -> 5, "agg_unpivot" -> 6, "agg_argmax" -> 15, "text_tfidf" -> 738,
    "hrv_resample" -> 3483, "hrv_resample_interp" -> 3483, "hrv_poincare" -> 15, "agg_corr" -> 15,
    "llm_train_split" -> 15,
    "text_pii_redact" -> 200, "text_decontaminate" -> 150,
    "llm_negative_sample" -> 300,
    "join_lateral" -> 572, "agg_moments" -> 3, "sample_stratified" -> 3,
    "graph_pagerank" -> 160, "ts_ewma" -> 397, "ts_anomaly_zscore" -> 50,
    "hrv_band_power" -> 15, "hrv_sampen" -> 15, "fn_url" -> 150,
    "ts_inter_arrival" -> 15, "ts_autocorr" -> 15,
    "ts_time_weighted_avg" -> 15, "fn_round_modes" -> 200, "agg_bitops" -> 3,
    "graph_common_neighbors" -> 45, "join_asof_forward" -> 202,
    "win_running_distinct" -> 514, "win_rolling_corr" -> 1000, "ts_changepoint" -> 15,
    "fn_date_extras" -> 200, "dedup_minhash_lsh" -> 28,
    // round 12
    "source_upsert" -> 5, "agg_quantile_sketch" -> 3,
    "agg_pivot_dynamic" -> 7, "mm_image_ahash" -> 200,
    "mm_audio_energy" -> 150, "mm_image_png" -> 200,
    "mm_video_frames" -> 10, "source_quality_profile" -> 4,
    // round 13
    "fn_decimal" -> 200, "agg_decimal_money" -> 6, "agg_grouping_id" -> 10,
    "source_scd2" -> 716, "hrv_rolling_sampen" -> 25,
    "mm_video_mp4_meta" -> 10,
    "win_decimal_cumsum" -> 1001, "fn_timezone" -> 201,
    "source_scd2_asof" -> 6, "text_url_canonical" -> 200,
    // round 14
    "fn_decimal_div" -> 200, "ann_ivf_exact" -> 50,
    "ann_pq_rerank_exact" -> 50, "dedup_lsh_capped" -> 28,
    "source_scd2_pruned" -> 6, "source_avro_roundtrip" -> 3,
    "mm_video_mp4_samples" -> 55, "ann_ivfpq_exact" -> 50,
    "mm_image_exif" -> 200, "source_avro_quarantine" -> 3,
    "source_avro_split" -> 3, "mm_image_exif_gps" -> 200,
    "text_bpe_tokencount" -> 300, "llm_pack_bpe" -> 500,
    "mm_sniff_route" -> 161, "source_warc_extract" -> 151
  )

  test("every SURVEY §2 query is registered with an oracle") {
    assert(SparkEntry.queries.keySet == expected.keySet)
    assert(SparkEntry.oracleSql.keySet == expected.keySet)
  }

  expected.toSeq.sortBy(_._1).foreach { case (name, rows) =>
    test(s"$name returns $rows rows at sf0.001") {
      assert(SparkEntry.queries(name)(spark, sf()).count() == rows)
    }
  }
}
