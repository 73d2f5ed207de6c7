package graft

/** One spec per registry operator (driver requirement): each query runs on
  * sf0.001 and returns exactly the golden row count (values are separately
  * hash-checked against the DuckDB oracle by the verify gate — see
  * tools/check_oracles.py; this suite pins execution health + cardinality).
  *
  * Mirrors the reference's per-query test layout (reference:
  * tests/tpch.rs:21-131 — one test case per TPC-H query).
  */
class RegistrySpec extends SparkSpec {

  private val golden: Map[String, Long] = Map(
    "m_media_features" -> 1, "m_frame_stats" -> 4, "x_sql_path" -> 10,
    "e_funnel" -> 1, "e_hourly_stats" -> 868, "e_json_extract" -> 5,
    "e_retention" -> 30, "t_top_tokens" -> 20, "e_asof_join" -> 15,
    "e_range_join" -> 3,
    "e_sessionize" -> 15, "e_top_users" -> 10,
    "q01_pricing_summary" -> 6, "q02_min_within_group" -> 4,
    "q03_topk_revenue" -> 10, "q04_semi_join_exists" -> 5,
    "q05_local_supplier_volume" -> 1, "q06_scalar_agg" -> 1,
    "q07_volume_shipping" -> 0, "q08_market_share" -> 7,
    "q09_product_profit" -> 70, "q10_returned_items" -> 20,
    "q11_having_scalar_subquery" -> 8, "q12_conditional_counts" -> 2,
    "q13_outer_join_distribution" -> 15, "q14_promo_ratio" -> 1,
    "q15_top_supplier_view" -> 1, "q16_distinct_anti_join" -> 24,
    "q17_corr_avg_subquery" -> 1, "q18_in_subquery_having" -> 100,
    "q19_disjunctive_join" -> 1, "q20_nested_semi_join" -> 0,
    "q21_exists_not_exists" -> 1, "q22_substring_anti_join" -> 3,
    "t_exact_dedup" -> 500, "t_fingerprint" -> 500, "t_lang_profile" -> 5,
    "t_langid" -> 10, "t_minhash_lsh" -> 28, "t_minhash_lsh_mat" -> 28,
    "t_ngram_jaccard" -> 28,
    "p_clean_corpus" -> 20,
    "t_quality_score" -> 500, "t_simhash" -> 500, "t_simhash_neardup" -> 25,
    "t_token_count" -> 500,
    "t_sample_stratified" -> 20, "t_contamination" -> 6, "t_normalize" -> 500,
    "t_pack_sequences" -> 20, "t_repetition" -> 500,
    "v_ivf_ann" -> 9, "v_quantize" -> 64,
    "v_centroids" -> 640, "v_knn_brute" -> 15, "v_knn_native" -> 15,
    "v_lsh_ann" -> 9, "v_cos_neardup" -> 11,
    "v_lsh_buckets" -> 204,
    "x_cross_join" -> 125, "x_date_funcs" -> 100, "x_distinct" -> 6,
    "x_except" -> 7, "x_full_outer" -> 25, "x_intersect" -> 86,
    "x_rollup" -> 10, "x_cube" -> 12, "x_pivot" -> 3, "x_decimal_arith" -> 3,
    "x_string_funcs" -> 50, "x_union_distinct" -> 25,
    "x_window_rank" -> 449, "x_window_running_sum" -> 1500,
    "x_window_range_frame" -> 1500,
    "x_grouping_sets" -> 6, "x_array_funcs" -> 5, "x_percentiles" -> 3,
    "x_regex_funcs" -> 30, "x_lateral_explode" -> 166, "x_bitwise" -> 40,
    "x_scalar_funcs" -> 60,
    "t_chunk_dedup" -> 20, "t_tfidf" -> 10, "e_interval_join" -> 2,
    "v_mrl_ann" -> 9, "v_bq_ann" -> 9, "v_cluster_select" -> 390,
    "v_dim_stats" -> 64,
    "t_dedup_clusters" -> 45, "p_dedup_canonical" -> 21,
    "p_split_leakfree" -> 3,
    "g_triangle_count" -> 1, "g_degree_hist" -> 3, "g_jaccard_links" -> 10,
    "x_map_funcs" -> 20, "x_cond_agg" -> 3, "x_stats_agg" -> 3,
    "x_window_lead_lag" -> 306, "a_rfm_segments" -> 38, "p_pii_mask" -> 25,
    "x_lateral_join" -> 20, "a_daily_rollup" -> 80, "e_upsert_compact" -> 15,
    "v_pq_ann" -> 9, "e_anomaly_zscore" -> 60, "x_unpivot" -> 9,
    "t_bigram_lm" -> 10, "p_clean_corpus_mat" -> 20,
    "t_mixture_balance" -> 2, "v_ivfpq_ann" -> 9,
    "c_type_timestamp" -> 10, "c_type_array" -> 10,
    "c_type_map_entries" -> 10, "c_type_float_edge" -> 5,
    "c_type_decimal18" -> 1, "c_type_repr" -> 5, "v_semdedup" -> 72,
    "r_bm25_search" -> 10, "r_doc_perplexity" -> 20,
    "x_window_distribution" -> 150, "p_novelty_batch" -> 100,
    "a_fuzzy_match" -> 2,
    "r_dsir_select" -> 20, "r_ppl_buckets" -> 15,
    "g_pagerank" -> 10, "e_scd2" -> 802,
    "t_dup_ngrams" -> 20, "p_split" -> 15,
    "t_gopher_rules" -> 20, "t_bpe_train" -> 8, "t_bpe_apply" -> 20,
    "r_hybrid_rrf" -> 15,
    "m_phash_buckets" -> 10,
    "x_variant_json" -> 5, "e_attribution" -> 30, "v_drift_monitor" -> 10,
    "x_set_ops_all" -> 1, "e_funnel_steps" -> 1,
    "e_sliding_stats" -> 3457, "e_markov_transitions" -> 25,
    "v_pca_power" -> 64, "r_mmr_rerank" -> 8,
    "g_bfs_hops" -> 10, "x_recursive_cte" -> 31, "x_sql_udf" -> 3,
    "a_basket_pairs" -> 20, "a_cohort_ltv" -> 5, "g_kcore" -> 10,
    "t_feature_hash" -> 500, "x_try_funcs" -> 201,
    "v_outliers" -> 10, "p_quality_trim" -> 20, "x_zorder" -> 16,
    "e_interpolate" -> 15, "v_knn_graph" -> 1500, "x_string_agg" -> 5,
    "t_substr_runs" -> 27, "x_damerau" -> 3, "e_streaks" -> 18,
    "r_rank_eval" -> 4, "x_hll_distinct" -> 1, "x_cms_topk" -> 15,
    "x_bloom_join" -> 1, "x_histo_quantile" -> 3, "x_salted_join" -> 10,
    "x_range_sorted" -> 3, "x_skew_aqe" -> 10, "x_rebalance_write" -> 6,
    "p_novelty_incr" -> 100, "p_novelty_multi" -> 100, "x_salted_agg" -> 7,
    "t_containment" -> 28, "t_weighted_sample" -> 25, "t_profile" -> 4,
    "x_union_by_name" -> 6, "a_incr_rollup" -> 80, "t_topk_group" -> 25,
    "e_decimate" -> 954,
    "x_part_prune" -> 12, "x_dpp" -> 5, "p_k_anon" -> 1,
    "t_sliding_chunks" -> 20, "e_out_of_order" -> 3,
    "x_bucket_join" -> 5, "v_radius_search" -> 5,
    "e_pattern_match" -> 3, "p_dlq" -> 5, "m_shard_manifest" -> 43,
    "x_time_travel" -> 3, "a_seasonality" -> 7, "t_winnow" -> 20,
    "g_assortativity" -> 1, "a_cohort_matrix" -> 5,
    "g_clustering_coeff" -> 1, "e_stickiness" -> 5,
    "s_hourly_stats" -> 868, "s_sessionize" -> 15, "s_dedup_keys" -> 75,
    "s_cdc_latest" -> 15, "s_interval_join" -> 2, "s_late_data" -> 846,
    "s_dedup_late" -> 964, "s_sessionize_late" -> 15,
    "c_gs_empty" -> 21)

  test("registry is complete: every query present, every oracle key valid") {
    assert(Registry.all.map(_.name).distinct.size === Registry.all.size)
    assert(golden.keySet === Registry.all.map(_.name).toSet)
  }

  Registry.all.foreach { q =>
    test(s"${q.name}: runs at sf0.001 with golden cardinality") {
      val n = q.run(spark, sf0001).count()
      assert(n === golden(q.name), s"row count drift for ${q.name}")
    }
  }

  test("execConf applies for its query's execution and restores before the next") {
    val key = "spark.sql.codegen.wholeStage"
    val before = spark.conf.get(key)
    // t_simhash_neardup declares wholeStage=false (the expansion tail's
    // buffered-copy GC regime, r12) — SIZE-GATED since r13: at sf0.001
    // the measured expansion mass is tiny, so the override must NOT
    // apply (codegen keeps its ~15% toy-scale edge)...
    val dfSmall = SparkEntry.queries("t_simhash_neardup")(spark, sf0001)
    assert(spark.conf.get("graft.simhash.interpretedTail") === "false",
      "toy-scale corpus must measure below the interpreted-tail threshold")
    assert(spark.conf.get(key) === before,
      "size gate failed: execConf applied at toy scale")
    dfSmall.count()
    // ...but when the gate signal says the dangerous regime, the
    // override applies for ITS execution (force the signal to isolate
    // the apply/restore mechanics from corpus size)...
    val q = Registry.byName("t_simhash_neardup")
    val forced = q.copy(execConfIf = Some(_ => true))
    SparkEntry.tuned(forced)(spark, sf0001)
    assert(spark.conf.get(key) === "false", "execConf not applied")
    // ...and is gone by the time the NEXT query's body builds
    SparkEntry.queries("q01_pricing_summary")(spark, sf0001).count()
    assert(spark.conf.get(key) === before, "execConf leaked to the next query")
  }
}
