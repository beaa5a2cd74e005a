package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.9. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (RelationalQueries.q01PricingSummary _),
    "q02_top_customers" -> (RelationalQueries.q02TopCustomers _),
    "q03_star_join" -> (RelationalQueries.q03StarJoin _),
    "q04_semi_anti" -> (RelationalQueries.q04SemiAnti _),
    "q05_rollup_cube" -> (RelationalQueries.q05RollupCube _),
    "q06_window_rank" -> (RelationalQueries.q06WindowRank _),
    "q07_running_window" -> (RelationalQueries.q07RunningWindow _),
    "q08_lag_sessions" -> (RelationalQueries.q08LagSessions _),
    "q09_event_windows" -> (RelationalQueries.q09EventWindows _),
    "q10_json_props" -> (RelationalQueries.q10JsonProps _),
    "q11_distinct_users" -> (RelationalQueries.q11DistinctUsers _),
    "q11b_approx_distinct" -> (RelationalQueries.q11bApproxDistinct _),
    "q12_set_ops" -> (RelationalQueries.q12SetOps _),
    "q13_text_tokens" -> (TextOps.q13TextTokens _),
    "q14_exact_dedup" -> (TextOps.q14ExactDedup _),
    "q15_knn_bruteforce" -> (VectorOps.q15KnnBruteforce _),
    "q16_queen_surrounded" -> (BoardOps.q16QueenSurrounded _),
    "q17_placement_targets" -> (BoardOps.q17PlacementTargets _),
    "q18_queen_moves" -> (BoardOps.q18QueenMoves _),
    "q18b_beetle_moves" -> (BoardOps.q18bBeetleMoves _),
    "q19_grasshopper_moves" -> (BoardOps.q19GrasshopperMoves _),
    "q20_spider_moves" -> (BoardOps.q20SpiderMoves _),
    "q21_ant_reachability" -> (BoardOps.q21AntReachability _),
    "q22_hive_connected" -> (BoardOps.q22HiveConnected _),
    "q23_stack_tops" -> (BoardOps.q23StackTops _),
    "q24_game_replay" -> (Replay.q24GameReplay _),
    "q25_ema_smoothing" -> (Replay.q25EmaSmoothing _),
    "q26_minhash_neardup" -> (TextOps.q26MinhashNeardup _),
    "q27_shingle_jaccard" -> (TextOps.q27ShingleJaccard _),
    "q28_simhash_dups" -> (TextOps.q28SimhashDups _),
    "q29_lang_trigram_id" -> (TextOps.q29LangTrigramId _),
    "q30_quality_score" -> (TextOps.q30QualityScore _),
    "q31_token_stats" -> (TextOps.q31TokenStats _),
    "q32_doc_fingerprint" -> (TextOps.q32DocFingerprint _),
    "q33_embed_topk_pairs" -> (VectorOps.q33EmbedTopkPairs _),
    "q34_ann_lsh" -> (VectorOps.q34AnnLsh _),
    "q35_multimodal_features" -> (Multimodal.q35MultimodalFeatures _),
    "q36_asof_join" -> (RelationalQueries.q36AsofJoin _),
    "q37_range_join" -> (RelationalQueries.q37RangeJoin _),
    "q38_cube" -> (RelationalQueries.q38Cube _),
    "q39_supplier_part" -> (RelationalQueries.q39SupplierPart _),
    "q40_outer_join" -> (RelationalQueries.q40OuterJoin _),
    "q41_pivot" -> (RelationalQueries.q41Pivot _),
    "q42_hex_projection" -> (BoardOps.q42HexProjection _),
    "q43_percentiles" -> (RelationalQueries.q43Percentiles _),
    "q43b_approx_percentiles" -> (RelationalQueries.q43bApproxPercentiles _),
    "q44_reserves" -> (BoardOps.q44Reserves _),
    "q45_board_hover" -> (BoardOps.q45BoardHover _),
    "q46_session_windows" -> (RelationalQueries.q46SessionWindows _),
    "q47_dedup_keep" -> (TextOps.q47DedupKeep _),
    "q48_embed_neardup" -> (VectorOps.q48EmbedNeardup _),
    "q49_ivf_ann" -> (VectorOps.q49IvfAnn _),
    "q50_media_pipeline" -> (Multimodal.q50MediaPipeline _),
    "q51_ring_key" -> (BoardOps.q51RingKey _),
    "q52_legal_moves" -> (BoardOps.q52LegalMoves _),
    "q53_viewport" -> (BoardOps.q53Viewport _),
    "q54_stratified_sample" -> (TextOps.q54StratifiedSample _),
    "q55_dup_clusters" -> (VectorOps.q55DupClusters _),
    "q56_decontamination" -> (TextOps.q56Decontamination _),
    "q57_shard_packing" -> (TextOps.q57ShardPacking _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> OracleSql.q01,
    "q02_top_customers" -> OracleSql.q02,
    "q03_star_join" -> OracleSql.q03,
    "q04_semi_anti" -> OracleSql.q04,
    "q05_rollup_cube" -> OracleSql.q05,
    "q06_window_rank" -> OracleSql.q06,
    "q07_running_window" -> OracleSql.q07,
    "q08_lag_sessions" -> OracleSql.q08,
    "q09_event_windows" -> OracleSql.q09,
    "q10_json_props" -> OracleSql.q10,
    "q11_distinct_users" -> OracleSql.q11,
    "q12_set_ops" -> OracleSql.q12,
    "q13_text_tokens" -> OracleSql.q13,
    "q14_exact_dedup" -> OracleSql.q14,
    "q15_knn_bruteforce" -> OracleSql.q15,
    "q16_queen_surrounded" -> BoardOracleSql.q16,
    "q17_placement_targets" -> BoardOracleSql.q17,
    "q18_queen_moves" -> BoardOracleSql.q18,
    "q18b_beetle_moves" -> BoardOracleSql.q18b,
    "q19_grasshopper_moves" -> BoardOracleSql.q19,
    "q20_spider_moves" -> BoardOracleSql.q20,
    "q21_ant_reachability" -> BoardOracleSql.q21,
    "q22_hive_connected" -> BoardOracleSql.q22,
    "q23_stack_tops" -> BoardOracleSql.q23,
    "q27_shingle_jaccard" -> OracleSql.q27,
    "q29_lang_trigram_id" -> OracleSql.q29,
    "q30_quality_score" -> OracleSql.q30,
    "q31_token_stats" -> OracleSql.q31,
    "q33_embed_topk_pairs" -> OracleSql.q33,
    "q36_asof_join" -> OracleSql.q36,
    "q37_range_join" -> OracleSql.q37,
    "q38_cube" -> OracleSql.q38,
    "q39_supplier_part" -> OracleSql.q39,
    "q40_outer_join" -> OracleSql.q40,
    "q41_pivot" -> OracleSql.q41,
    "q42_hex_projection" -> BoardOracleSql.q42,
    "q43_percentiles" -> OracleSql.q43,
    "q44_reserves" -> BoardOracleSql.q44,
    "q45_board_hover" -> BoardOracleSql.q45,
    "q46_session_windows" -> OracleSql.q46,
    "q47_dedup_keep" -> OracleSql.q47,
    "q48_embed_neardup" -> OracleSql.q48,
    "q51_ring_key" -> BoardOracleSql.q51,
    "q52_legal_moves" -> BoardOracleSql.q52,
    "q53_viewport" -> BoardOracleSql.q53,
    "q54_stratified_sample" -> OracleSql.q54,
    "q55_dup_clusters" -> OracleSql.q55,
    "q56_decontamination" -> OracleSql.q56,
    "q57_shard_packing" -> OracleSql.q57
    // q24/q25 (sequential per-key), q26/q28/q32/q34/q49 (engine-specific
    // hashes / sketch- or iteration-specific candidate sets), q35 (payload
    // synthesis is engine-side), q43b (approx sketch) — driver records
    // rows-only checks; ScalaTest covers their semantics instead.
  )
}
