package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has an entry in
  * `queries`, and since r11 EVERY entry also has a DuckDB oracle in
  * `oracleSql` (column names aliased identically on both sides — the
  * driver sorts columns by name before hashing). Queries whose
  * semantics depend on engine-specific hash functions (minhash /
  * simhash / LSH / HLL / generator / ANN buckets) are ACCURACY-GATED:
  * the engine runs its real probe/funnel, measures the accuracy claim
  * (recall / precision / bit-identity / tolerance), and emits a
  * DuckDB-pinnable ground truth plus claim columns the oracle fixes
  * at TRUE — a regression hash-mismatches AND trips graft.Verify's
  * claim gate (exit 3).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    KpiQueries.kpiDaily(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.3 reference-parity KPI aggregations (A1-A8) + §2.2 scalars
    "q_kpi_daily" -> (KpiQueries.kpiDaily _),
    "q_kpi_total" -> (KpiQueries.kpiTotal _),
    "q_events_clean" -> (KpiQueries.eventsClean _),
    "q_events_hourly" -> (KpiQueries.eventsHourly _),
    "q_events_rollup" -> (KpiQueries.eventsRollup _),
    "q_events_props_json" -> (KpiQueries.eventsPropsJson _),
    "q_exists_fresh" -> (KpiQueries.existsFresh _),
    "q_sessionize" -> (KpiQueries.sessionize _),
    "q_session_window" -> (KpiQueries.sessionWindow _),
    "q_sliding_window" -> (KpiQueries.slidingWindow _),
    "q_resample_hourly" -> (KpiQueries.resampleHourly _),
    "q_funnel" -> (KpiQueries.funnel _),
    "q_retention_cohorts" -> (KpiQueries.retentionCohorts _),
    "q_event_transitions" -> (KpiQueries.eventTransitions _),
    "q_anomaly_hours" -> (KpiQueries.anomalyHours _),
    "q_drift_psi" -> (ExperimentQueries.driftPsi _),
    "q_ab_srm" -> (ExperimentQueries.abSrm _),
    "q_ab_lift" -> (ExperimentQueries.abLift _),
    "q_cuped" -> (ExperimentQueries.cupedLift _),
    "q_feature_assoc" -> (ExperimentQueries.featureAssoc _),
    "q_ks_drift" -> (ExperimentQueries.ksDrift _),
    "q_sample_stratified" -> (ExperimentQueries.stratifiedSample _),
    "q_sample_bernoulli" -> (ExperimentQueries.bernoulliSample _),
    "q_woe_iv" -> (ExperimentQueries.woeIv _),
    "q_holt_trend" -> (ForecastQueries.holtTrend _),
    "q_ols_trend" -> (ForecastQueries.olsTrend _),
    "q_stl_decompose" -> (ForecastQueries.stlDecompose _),
    "q_cusum" -> (ForecastQueries.cusum _),
    "q_rfm_segments" -> (KpiQueries.rfmSegments _),
    "q_approx_distinct" -> (KpiQueries.approxDistinct _),
    "q_approx_distinct_fast" -> (KpiQueries.approxDistinctFast _),
    "q_sketch_rollup" -> (KpiQueries.sketchRollup _),
    "q_quantile_rollup" -> (TpchQueries.quantileRollupChecked _),
    "q_pivot_events" -> (KpiQueries.pivotEvents _),
    "q_unpivot_kpis" -> (KpiQueries.unpivotKpis _),
    // §2.4 joins / §2.5 windows / §2.6 sorts / §2.7 set ops
    "q1_pricing_summary" -> (TpchQueries.q1PricingSummary _),
    "q3_shipping_priority" -> (TpchQueries.q3ShippingPriority _),
    "q5_local_supplier" -> (TpchQueries.q5LocalSupplier _),
    "q_join_semi" -> (TpchQueries.joinSemi _),
    "q_join_anti" -> (TpchQueries.joinAnti _),
    "q_join_outer_counts" -> (TpchQueries.joinOuterCounts _),
    "q_join_full" -> (TpchQueries.joinFull _),
    "q_topk_orders" -> (TpchQueries.topkOrders _),
    "q_window_top_per_customer" -> (TpchQueries.windowTopPerCustomer _),
    "q_window_running_sum" -> (TpchQueries.windowRunningSum _),
    "q_window_lag" -> (TpchQueries.windowLag _),
    "q_set_ops" -> (TpchQueries.setOps _),
    "q_set_ops_all" -> (TpchQueries.setOpsAll _),
    "q_user_overlap" -> (KpiQueries.userOverlap _),
    "q_kmv_overlap" -> (KpiQueries.kmvOverlap _),
    "q_distinct_brand_type" -> (TpchQueries.distinctBrandType _),
    "q_agg_stats" -> (TpchQueries.aggStats _),
    "q_approx_percentile" -> (TpchQueries.approxPercentile _),
    "q_string_funcs" -> (TpchQueries.stringFuncs _),
    "q_date_funcs" -> (TpchQueries.dateFuncs _),
    "q_above_avg_orders" -> (TpchQueries.aboveAvgOrders _),
    "q_agg_corr" -> (TpchQueries.aggCorr _),
    "q_table_stats" -> (TpchQueries.tableStats _),
    "q_table_stats_approx" -> (TpchQueries.tableStatsApprox _),
    "q_sliding_distinct_hll" -> (AnalyticsExtras.slidingDistinctHll _),
    "q_simjoin_prefix" -> (TextQueries.simJoinPrefix _),
    "q_simjoin_incremental" -> (TextQueries.simJoinIncremental _),
    "q_containment_join" -> ((s, d) => TextQueries.containmentJoin(s, d)),
    "q_stream_neardup" -> (PipelineQueries.streamNearDup _),
    "q_merge_upsert" -> (AnalyticsWave4.mergeUpsert _),
    "q_cum_distinct" -> (AnalyticsWave4.cumulativeDistinct _),
    "q_rolling_median" -> (AnalyticsWave4.rollingMedian _),
    "q_join_card_est" -> (TpchQueries.joinCardinalityEst _),
    "q_histogram" -> (TpchQueries.histogram _),
    "q_dq_checks" -> (TpchQueries.dqChecks _),
    "q_window_firstlast" -> (TpchQueries.windowFirstLast _),
    "q6_forecast_revenue" -> (TpchQueries.q6ForecastRevenue _),
    "q12_priority" -> (TpchQueries.q12Priority _),
    "q14_promo_share" -> (TpchQueries.q14PromoShare _),
    "q_asof_join" -> (TpchQueries.asofLineitemOrder _),
    "q_cube_orders" -> (TpchQueries.cubeOrders _),
    "q_grouping_sets" -> (TpchQueries.groupingSetsOrders _),
    "q_ffill" -> (TpchQueries.forwardFill _),
    "q_snapshot_diff" -> (TpchQueries.snapshotDiff _),
    "q_range_join" -> (TpchQueries.rangeJoinShipments _),
    "q_bucketed_join" -> (BucketedJoin.ordersPerKey _),
    // §2.11 E1/E2/E4 text & dedup
    "q_dedup_exact" -> (TextQueries.dedupExact _),
    "q_dedup_wordset" -> (TextQueries.dedupWordset _),
    "q_incremental_dedup" -> (TextQueries.incrementalDedup _),
    "q_array_funcs" -> (TextQueries.arrayFuncs _),
    "q_token_count" -> (TextQueries.tokenCount _),
    "q_token_bpe" -> (TextQueries.tokenBpe _),
    "q_text_quality" -> (TextQueries.textQuality _),
    "q_lang_id" -> (TextQueries.langId _),
    "q_fingerprint" -> (TextQueries.fingerprint _),
    "q_vocab_topk" -> ((s, d) => TextQueries.vocabTopk(s, d)),
    "q_bpe_pairs" -> ((s, d) => TextQueries.bpePairs(s, d)),
    "q_bpe_train" -> ((s, d) => TextQueries.bpeTrain(s, d)),
    "q_bpe_encode" -> ((s, d) => TextQueries.bpeEncode(s, d)),
    "q_rep_filter" -> (TextQueries.repFilter _),
    "q_bm25" -> ((s, d) => TextQueries.bm25(s, d)),
    "q_hybrid_rank" -> ((s, d) => TextQueries.hybridRank(s, d)),
    "q_hybrid_rank_ann" -> ((s, d) => TextQueries.hybridRankAnn(s, d)),
    "q_rag_context" -> ((s, d) => TextQueries.ragContext(s, d)),
    "q_inverted_index" -> (TextQueries.invertedIndex _),
    "q_heavy_hitters" -> ((s, d) => TextQueries.heavyHitters(s, d)),
    "q_pii_scrub" -> (TextQueries.piiScrub _),
    "q_stratified_sample" -> (TextQueries.stratifiedSample _),
    "q_sample_topk" -> ((s, d) => TextQueries.sampleTopkPerStratum(s, d)),
    "q_sample_hash" -> ((s, d) => TextQueries.sampleHashCutoff(s, d)),
    "q_ngram_jaccard" -> (TextQueries.ngramJaccard _),
    "q_dup_substrings" -> ((s, d) => TextQueries.dupSubstrings(s, d)),
    "q_dup_substrings_incremental" ->
      ((s, d) => TextQueries.dupSubstringsIncremental(s, d)),
    "q_dup_substrings_clean" -> ((s, d) => TextQueries.dupSubstringsClean(s, d)),
    "q_dup_clusters" -> (DupClusters.nearDupClusters _),
    "q_minhash_dedup" -> (TextQueries.minhashDedup _),
    "q_rep_signals" -> (TextQueries.repetitionSignals _),
    "q_tfidf" -> ((s, d) => TextQueries.tfidf(s, d)),
    "q_simhash" -> (TextQueries.simhash _),
    "q_ngram_novelty" -> ((s, d) => TextQueries.ngramNovelty(s, d)),
    "q_doc_percentiles" -> (TextQueries.docPercentiles _),
    "q_source_minhash" -> (TextQueries.sourceMinhash _),
    // §2.11 training-data pipeline: packing, pruning, decontamination
    "q_pack_sequences" -> ((s, d) => TrainingQueries.packSequences(s, d)),
    "q_chunk_docs" -> ((s, d) => TextQueries.chunkDocs(s, d)),
    "q_quality_prune" -> (TrainingQueries.qualityPrune _),
    "q_mixture_sample" -> (TrainingQueries.mixtureSample _),
    "q_decontaminate" -> ((s, d) => TrainingQueries.decontaminate(s, d)),
    "q_decontam_bloom" -> ((s, d) => TrainingQueries.decontaminateBloom(s, d)),
    "q_epoch_shuffle" -> ((s, d) => TrainingQueries.epochShuffle(s, d)),
    "q_token_budget" -> ((s, d) => TrainingQueries.tokenBudget(s, d)),
    "q_corpus_pipeline" -> ((s, d) => TrainingQueries.corpusPipeline(s, d)),
    "q_dsir_sample" -> ((s, d) => TrainingQueries.dsirSample(s, d)),
    // §2.11 E5 multimodal binary columns
    "q_media_stats" -> (MultimodalQueries.mediaStats _),
    "q_frame_sample" -> (MultimodalQueries.frameSample _),
    "q_media_features" -> (MultimodalQueries.mediaFeatures _),
    "q_media_dedup" -> (MultimodalQueries.mediaDedup _),
    "q_media_neardup" -> (MultimodalQueries.mediaNearDup _),
    // §3 end-to-end pipeline (EP2 streaming ingest / EP3 raw-zone KPIs)
    "q_raw_kpis" -> (PipelineQueries.rawKpis _),
    "q_stream_hourly" -> (PipelineQueries.streamHourly _),
    "q_stream_enrich" -> (PipelineQueries.streamEnrich _),
    "q_stream_dedup" -> (PipelineQueries.streamDedup _),
    "q_stream_dedup_wm" -> (PipelineQueries.streamDedupWatermark _),
    "q_stream_upsert" -> (PipelineQueries.streamUpsertKpis _),
    "q_stream_sketch" -> (PipelineQueries.streamSketchTable _),
    "q_stream_drift" -> (PipelineQueries.streamDriftPsi _),
    "q_dsv2_scan" -> (PipelineQueries.dsv2Scan _),
    "q_dsv2_daily" -> (PipelineQueries.dsv2Daily _),
    "q_stream_join" -> (PipelineQueries.streamJoin _),
    "q_csv_scan" -> (PipelineQueries.csvScan _),
    "q_orc_scan" -> (PipelineQueries.orcScan _),
    "q_schema_evolution" -> (PipelineQueries.schemaEvolution _),
    "q_salted_join" -> (PipelineQueries.saltedJoin _),
    "q_bloom_join" -> (BloomJoin.bloomSemiLineitems _),
    "q_sorted_scan" -> (SortedLayout.tsRangeKpis _),
    "q_zorder_scan" -> (ZOrderLayout.userTimeBoxKpis _),
    "q_file_manifest" -> (SortedLayout.manifestAudit _),
    "q_manifest_kpis" -> (SortedLayout.manifestPrunedKpis _),
    "q_pruned_kpis" -> (PipelineQueries.prunedKpis _),
    "q_compact_kpis" -> (PipelineQueries.compactKpis _),
    "q_stateful_sessions" -> (PipelineQueries.statefulSessions _),
    "q_tws_sessions" -> (PipelineQueries.twsSessions _),
    // §2.11 E3 vectors
    "q_knn_brute" -> (VectorQueries.knnBrute _),
    "q_vec_norms" -> (VectorQueries.vecNorms _),
    "q_vec_quantize" -> (VectorQueries.vecQuantize _),
    "q_centroid_outliers" -> ((s, d) => VectorQueries.centroidOutliers(s, d)),
    "q_cosine_dedup" -> (VectorQueries.cosineDedup _),
    "q_vec_clusters" -> (DupClusters.cosineClusters _),
    "q_cosine_dedup_lsh" -> (VectorQueries.cosineDedupLsh _),
    "q_semdedup" -> (VectorQueries.semDedup _),
    "q_semdedup_incremental" -> (VectorQueries.semDedupIncremental _),
    "q_ann_lsh" -> (VectorQueries.annLshOracle _),
    "q_ann_ivf" -> (VectorQueries.annIvfOracle _),
    "q_ann_ivf_kmeans" -> (VectorQueries.annIvfKmeansOracle _),
    "q_stream_ann" -> (VectorQueries.streamAnn _),
    "q_knn_batch" -> ((s, d) => VectorQueries.knnBatch(s, d)),
    "q_knn_batch_agg" -> ((s, d) => VectorQueries.knnBatchAgg(s, d)),
    // §2.11 E7 second-wave analytics + training-pipeline extras
    "q_top_paths" -> (AnalyticsExtras.topPaths _),
    "q_scd2_dims" -> (AnalyticsExtras.scd2Dims _),
    "q_sliding_distinct" -> (AnalyticsExtras.slidingDistinct _),
    "q_train_split" -> (AnalyticsExtras.trainSplit _),
    "q_fuzzy_join" -> (AnalyticsExtras.fuzzyJoin _),
    "q_variant_json" -> (AnalyticsExtras.variantShred _),
    "q_ewma_hours" -> (AnalyticsExtras.ewmaSmooth _),
    "q_lm_score" -> (TextQueries.lmScore _),
    "q_split_leakage" -> (TextQueries.splitLeakage _),
    "q_hard_negatives" -> ((s, d) => VectorQueries.hardNegatives(s, d)),
    "q_bloom_scan" -> (BloomScan.bloomScan _),
    "q10_returned_items" -> (TpchQueries.q10ReturnedItems _),
    "q_concurrency" -> (AnalyticsExtras.concurrency _),
    "q_weighted_sample" -> ((s, d) => AnalyticsExtras.weightedSample(s, d)),
    "q4_priority_exists" -> (TpchDeep.q4PriorityExists _),
    "q7_volume_shipping" -> (TpchDeep.q7VolumeShipping _),
    "q8_market_share" -> (TpchDeep.q8MarketShare _),
    "q9_product_profit" -> (TpchDeep.q9ProductProfit _),
    "q13_custdist" -> (TpchDeep.q13Custdist _),
    "q15_top_supplier" -> (TpchDeep.q15TopSupplier _),
    "q16_supplier_cnt" -> (TpchDeep.q16SupplierCnt _),
    "q17_small_qty_revenue" -> (TpchDeep.q17SmallQtyRevenue _),
    "q18_large_orders" -> (TpchDeep.q18LargeOrders _),
    "q19_disjunctive" -> (TpchDeep.q19Disjunctive _),
    "q21_waiting_suppliers" -> (TpchDeep.q21WaitingSuppliers _),
    "q22_idle_customers" -> (TpchDeep.q22IdleCustomers _),
    "q_window_ranks" -> (AnalyticsWave3.windowRanks _),
    "q_median_groups" -> (AnalyticsWave3.medianGroups _),
    "q_bitmap_distinct" -> (AnalyticsWave3.bitmapDistinct _),
    "q_interpolate" -> (AnalyticsWave3.interpolate _),
    "q_attribution" -> (AnalyticsWave3.attribution _),
    "q_oov_rate" -> (AnalyticsWave3.oovRate _),
    "q_equidepth_hist" -> (AnalyticsWave3.equidepthHist _),
    "q2_min_cost_supplier" -> (TpchDeep.q2MinCostSupplier _),
    "q11_important_stock" -> (TpchDeep.q11ImportantStock _),
    "q20_part_shippers" -> (TpchDeep.q20PartShippers _),
    "q_dup_canonical" -> (DupClusters.canonicalReps _),
    "q_cluster_radius" -> ((s, d) => DupClusters.clusterRadius(s, d)),
    "q_mode_groups" -> (AnalyticsWave3.modeGroups _),
    "q_gaps_islands" -> (AnalyticsWave3.gapsIslands _),
    "q_share_of_day" -> (AnalyticsWave3.shareOfDay _),
    "q_yoy_growth" -> (AnalyticsWave3.yoyGrowth _),
    "q_stream_outer_join" -> (PipelineQueries.streamJoinOuter _),
    "q_dpp_scan" -> (PipelineQueries.dppScan _),
    "q_mad_outliers" -> (AnalyticsWave3.madOutliers _),
    "q_pagerank" -> (ClickstreamGraph.pagerank _),
    "q_bounce_rate" -> (ClickstreamGraph.bounceRate _),
    "q_dwell_time" -> (ClickstreamGraph.dwellTime _),
    "q_cooccurrence" -> (ClickstreamGraph.cooccurrence _),
    "q_cms_counts" -> (KpiQueries.cmsCounts _),
    "q_vec_dimstats" -> (VectorQueries.vecDimstats _),
    "q_source_entropy" -> (TextQueries.sourceEntropy _),
    "q_rand_project" -> (VectorQueries.randProjectOracle _),
    "q_ann_projected" -> (VectorQueries.annProjectedOracle _),
    "q_forget_users" -> (KpiQueries.forgetUsers _),
    "q_user_lifetime" -> (ClickstreamGraph.userLifetime _),
    "q_triangle_count" -> (ClickstreamGraph.triangleAudit _),
    "q_asof_native" -> (TpchQueries.asofNativeLineitemOrder _),
    "q_asof_fwd" -> (TpchQueries.asofNativeForward _),
    "q_bigram_topk" -> ((s, d) => TextQueries.bigramTopk(s, d)),
    "q_scd2_lookup" -> (AnalyticsExtras.scd2Lookup _),
  )

  /** Shared by q_asof_join (union+window formulation) and
    * q_asof_native (custom AsOfMergeJoinExec): one DuckDB ASOF oracle
    * pins both implementations to identical semantics. */
  private val AsofSql: String =
    """WITH r AS (
      |  SELECT o_custkey % 10 AS k, o_orderdate AS asof_ts,
      |    max(o_orderkey) AS asof_orderkey
      |  FROM orders GROUP BY 1, 2),
      |l AS (
      |  SELECT l_orderkey, l_linenumber, CAST(l_suppkey % 10 AS INT) AS k, l_shipdate
      |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01')
      |SELECT l.l_orderkey, l.l_linenumber, l.k, r.asof_orderkey,
      |  strftime(r.asof_ts, '%Y-%m-%d') AS asof_orderdate
      |FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.l_shipdate >= r.asof_ts""".stripMargin

  /** Shared BM25-scored CTE chain (every doc containing ≥ 1 query
    * term, scored, unordered): q_bm25 cuts its top-15; the r13 hybrid
    * RRF ranker uses it as the lexical leg. */
  private val Bm25ScoredCtes: String =
    """tok AS (SELECT doc_id,
      |  unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents),
      |td AS (SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
      |dfs AS (SELECT token, count(*) AS df FROM td GROUP BY 1),
      |q AS (SELECT token, df FROM (
      |    SELECT token, df, row_number() OVER (ORDER BY df DESC, token) AS r
      |    FROM dfs) WHERE r BETWEEN 11 AND 13),
      |dl AS (SELECT doc_id,
      |  CAST(len(regexp_split_to_array(text, '\s+')) AS DOUBLE) AS dl
      |  FROM documents),
      |g AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
      |  avg(CAST(len(regexp_split_to_array(text, '\s+')) AS DOUBLE)) AS avgdl
      |  FROM documents),
      |bm AS (SELECT td.doc_id AS doc_id,
      |  round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
      |    (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS bm25,
      |  count(*) AS n_terms
      |FROM td JOIN q USING (token) JOIN dl USING (doc_id), g
      |GROUP BY 1)""".stripMargin

  /** Shared span-table CTE chain for the substring-dedup pair
    * (q_dup_substrings lists the spans; q_dup_substrings_clean cuts
    * them): merged per-doc spans of 8-token windows repeated across
    * >= 2 distinct documents. The oracle groups by the window STRING;
    * the engine groups by its xxhash64 (no window text ever shuffles)
    * — identical answers modulo ~1e-11 64-bit collisions, the
    * repo-wide fingerprint idiom. */
  private val DupSubstrSpanCtes: String =
    """d AS (SELECT doc_id,
      |    regexp_split_to_array(text, '\s+') AS toks FROM documents),
      |wl AS (SELECT doc_id, list_transform(range(1, len(toks) - 6),
      |    i -> struct_pack(pos := i - 1,
      |      win := array_to_string(toks[i:i+7], ' '))) AS ws
      |  FROM d WHERE len(toks) >= 8),
      |wins AS (SELECT doc_id, unnest(ws) AS u FROM wl),
      |flat AS (SELECT doc_id, u.pos AS pos, u.win AS win FROM wins),
      |dup AS (SELECT win FROM flat GROUP BY win
      |  HAVING count(DISTINCT doc_id) >= 2),
      |p AS (SELECT doc_id, pos FROM flat JOIN dup USING (win)),
      |g AS (SELECT doc_id, pos, CASE WHEN lag(pos) OVER w IS NULL
      |    OR pos - lag(pos) OVER w > 7 THEN 1 ELSE 0 END AS ni
      |  FROM p WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |i AS (SELECT doc_id, pos, sum(ni) OVER (
      |    PARTITION BY doc_id ORDER BY pos) AS island FROM g),
      |spans AS (SELECT doc_id, min(pos) AS span_start,
      |    max(pos) + 7 AS span_end
      |  FROM i GROUP BY doc_id, island)""".stripMargin

  /** Unrolled DuckDB twin of the N-step BPE training loop (r14): each
    * step is one pair-count CTE + one argmax CTE + one merge-applied
    * vocab CTE — the exact recount-argmax-replace sequence the engine
    * iterates, replayed by the oracle from the raw corpus. Multi-
    * referenced CTEs are declared MATERIALIZED (the r9 closure-oracle
    * lesson: DuckDB re-inlines them otherwise, and v_k is read by both
    * p_k and v_{k+1} — naive inlining doubles work per step). */
  private def bpeCtes(steps: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH w AS (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word
      |  FROM documents),
      |v1 AS MATERIALIZED (SELECT word, array_to_string(
      |    list_transform(range(1, length(word) + 1), i -> word[CAST(i AS INT)]),
      |    ' ') AS seq, count(*) AS wf
      |  FROM w WHERE length(word) >= 2 GROUP BY 1)""".stripMargin
    for (k <- 1 to steps) {
      sb ++= s""",
        |p$k AS (SELECT syms[CAST(i AS INT)] AS l, syms[CAST(i AS INT) + 1] AS r,
        |    CAST(sum(wf) AS BIGINT) AS cnt
        |  FROM (SELECT wf, syms, unnest(range(1, len(syms))) AS i
        |        FROM (SELECT regexp_split_to_array(seq, ' ') AS syms, wf FROM v$k))
        |  GROUP BY 1, 2),
        |m$k AS MATERIALIZED (SELECT $k AS step, l, r, cnt FROM p$k
        |  ORDER BY cnt DESC, l, r LIMIT 1),
        |v${k + 1} AS MATERIALIZED (SELECT word, trim(replace(' ' || seq || ' ',
        |    (SELECT ' ' || l || ' ' || r || ' ' FROM m$k),
        |    (SELECT ' ' || l || r || ' ' FROM m$k))) AS seq, wf FROM v$k)""".stripMargin
    }
    sb.toString
  }

  private def bpeTrainSql(steps: Int): String =
    bpeCtes(steps) +
      "\nSELECT step, l AS lhs, r AS rhs, l || r AS merged, cnt\nFROM (" +
      (1 to steps).map(k => s"SELECT * FROM m$k").mkString(" UNION ALL ") +
      ")\nORDER BY step"

  /** The encode twin (r14): the loop's final vocab state IS the
    * trained tokenizer's segmentation of every corpus word. */
  private def bpeEncodeSql(steps: Int): String =
    bpeCtes(steps) +
      s"""
        |SELECT word, wf,
        |  CAST(len(regexp_split_to_array(seq, ' ')) AS INT) AS n_subwords,
        |  seq AS encoded
        |FROM v${steps + 1} ORDER BY word""".stripMargin

  /** Shared by q_ngram_jaccard and (as the edge-list CTE) the
    * q_dup_clusters recursive-closure oracle. */
  private val NgramJaccardSql: String =
    """WITH d AS (
      |  SELECT doc_id, source, lang, regexp_split_to_array(text, '\s+') AS toks
      |  FROM documents),
      |bgs AS (
      |  SELECT doc_id, source, lang, list_distinct(list_transform(
      |    range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS bg
      |  FROM d WHERE len(toks) >= 2)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  round(len(list_intersect(a.bg, b.bg)) /
      |    CAST(len(list_distinct(a.bg || b.bg)) AS DOUBLE), 6) AS jaccard
      |FROM bgs a JOIN bgs b
      |  ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id
      |WHERE len(list_intersect(a.bg, b.bg)) /
      |  CAST(len(list_distinct(a.bg || b.bg)) AS DOUBLE) >= 0.05
      |ORDER BY a_id, b_id""".stripMargin

  /** Definitional all-pairs trigram-shingle jaccard at J >= 1/2 —
    * shared by q_stream_neardup (the accumulated streaming manifest
    * must equal it) and, with a TRUE recall_ok appended, by the
    * accuracy-gated q_minhash_dedup (r11). */
  private val ExactHalfJaccardSql: String =
    """WITH d AS (SELECT doc_id,
      |    regexp_split_to_array(text, '\s+') AS toks FROM documents),
      |g AS (SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(toks) - 1),
      |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS s
      |  FROM d WHERE len(toks) >= 3),
      |t AS (SELECT doc_id, unnest(s) AS h, len(s) AS n FROM g),
      |i AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |    a.n AS na, b.n AS nb, count(*) AS ix
      |  FROM t a JOIN t b ON a.h = b.h AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2, 3, 4)
      |SELECT a_id, b_id,
      |  round(ix / CAST(na + nb - ix AS DOUBLE), 6) AS jaccard
      |FROM i WHERE 2 * ix >= (na + nb - ix)
      |ORDER BY a_id, b_id""".stripMargin

  /** Exact brute-force top-10 cosine neighbors of the lowest-vec_id
    * query vector — q_knn_brute's oracle, and (with a TRUE recall_ok
    * claim appended) the oracle for the four accuracy-gated ANN
    * queries (r10): the engine runs the real ANN probe, stamps
    * recall@10 vs this exact answer into recall_ok, and emits the
    * exact rows, so DuckDB pins both the ground truth and the claim. */
  private val KnnBruteSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT vec_id AS q_id, v AS qv FROM e ORDER BY vec_id LIMIT 1)
      |SELECT e.vec_id, round(list_cosine_similarity(e.v, q.qv), 4) AS cos
      |FROM e, q WHERE e.vec_id <> q.q_id
      |ORDER BY cos DESC, e.vec_id LIMIT 10""".stripMargin

  /** ANN oracle: the exact neighbors plus the oracle-fixed claim. */
  private val AnnOracleSql: String =
    s"""WITH brute AS ($KnnBruteSql)
      |SELECT vec_id, cos, TRUE AS recall_ok FROM brute
      |ORDER BY cos DESC, vec_id""".stripMargin

  /** Shared by q_decontaminate and its bloom-pruned twin
    * q_decontam_bloom (which must hash-match it exactly). */
  private val DecontamSql: String =
    """WITH t AS (SELECT doc_id, source,
      |  regexp_split_to_array(text, '\s+') AS toks FROM documents),
      |g AS (SELECT doc_id, source,
      |  array_to_string(toks[i.g : i.g + 7], ' ') AS gram
      |  FROM t, LATERAL (SELECT unnest(generate_series(1,
      |    greatest(0, len(toks) - 7))) AS g) i),
      |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < 25),
      |bad AS (SELECT DISTINCT g.doc_id, g.source FROM g
      |  JOIN bench USING (gram) WHERE g.doc_id >= 25)
      |SELECT source, count(*) AS n_contaminated, min(doc_id) AS first_bad
      |FROM bad GROUP BY 1 ORDER BY 1""".stripMargin

  /** Shared by q_cosine_dedup, (as the edge-list CTE) the
    * q_vec_clusters closure oracle, and the accuracy-gated
    * q_cosine_dedup_lsh / q_semdedup graduations. */
  private val CosineDedupSql: String =
    """WITH e AS (SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |  round(list_cosine_similarity(a.v, b.v), 4) AS cos
      |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.v, b.v) >= 0.3
      |ORDER BY a_id, b_id""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_kpi_daily" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS dt,
        |  count(*) AS total_events,
        |  count(DISTINCT user_id) AS unique_users,
        |  CAST(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('view','pageview','page_view') THEN 1 ELSE 0 END) AS BIGINT) AS pageviews,
        |  CAST(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('purchase','order','checkout') THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
        |  round(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('purchase','order','checkout') THEN coalesce(value, 0) ELSE 0 END), 2) AS revenue_usd
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_kpi_total" ->
      """SELECT count(*) AS total_events,
        |  count(DISTINCT user_id) AS unique_users,
        |  count(DISTINCT event_type) AS unique_event_types,
        |  CAST(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('view','pageview','page_view') THEN 1 ELSE 0 END) AS BIGINT) AS pageviews,
        |  CAST(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('purchase','order','checkout') THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
        |  round(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('purchase','order','checkout') THEN coalesce(value, 0) ELSE 0 END), 2) AS revenue_usd
        |FROM events""".stripMargin,
    "q_events_clean" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d') AS dt,
        |  CAST(extract(hour FROM ts) AS INT) AS hh,
        |  lower(coalesce(event_type, '')) AS event_type,
        |  coalesce(CAST(value AS DOUBLE), 0.0) AS value, user_id
        |FROM events
        |WHERE lower(coalesce(event_type, '')) IN ('view','click','purchase')
        |ORDER BY event_id""".stripMargin,
    "q_events_hourly" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS dt,
        |  CAST(extract(hour FROM ts) AS INT) AS hh,
        |  count(*) AS n_events, count(DISTINCT user_id) AS unique_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_rollup" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS dt, event_type,
        |  count(*) AS n_events,
        |  round(sum(coalesce(value, 0)), 2) AS total_value
        |FROM events GROUP BY ROLLUP(1, 2)
        |ORDER BY dt NULLS FIRST, event_type NULLS FIRST""".stripMargin,
    "q_events_props_json" ->
      """SELECT event_type,
        |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 2) AS avg_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_exists_fresh" ->
      """SELECT (SELECT count(*) FROM (
        |  SELECT 1 FROM events
        |  WHERE ts >= (SELECT max(ts) - INTERVAL 20 MINUTE FROM events)
        |  LIMIT 1)) > 0 AS fresh""".stripMargin,
    "q_sessionize" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(new_sess) AS BIGINT) AS n_sessions
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    // session_window convention: split at gap STRICTLY > 1800 s — an
    // event arriving exactly at session_end (= last + gap) still
    // merges (verified empirically: two events exactly gap apart form
    // ONE session). Same convention as q_sessionize; the r3 ">= 1800"
    // note was wrong and latent until sf0.1 produced an exact-1800 gap.
    "q_session_window" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(new_sess) AS BIGINT) AS n_sessions
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    // HLL accuracy gate: the estimate itself is engine-defined, but the
    // 5%-accuracy CLAIM is oracle-checkable (deterministic per input).
    "q_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  TRUE AS within_5pct
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_approx_percentile" ->
      """SELECT c_mktsegment, round(median(c_acctbal), 2) AS median_bal,
        |  TRUE AS within_tol
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pivot_events" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS dt,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_unpivot_kpis" ->
      """WITH k AS (SELECT strftime(ts, '%Y-%m-%d') AS dt,
        |  count(*) AS total_events,
        |  CAST(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('view','pageview','page_view') THEN 1 ELSE 0 END) AS BIGINT) AS pageviews,
        |  CAST(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('purchase','order','checkout') THEN 1 ELSE 0 END) AS BIGINT) AS purchases
        |  FROM events GROUP BY 1)
        |SELECT dt, 'total_events' AS metric, total_events AS value FROM k
        |UNION ALL SELECT dt, 'pageviews', pageviews FROM k
        |UNION ALL SELECT dt, 'purchases', purchases FROM k
        |ORDER BY dt, metric""".stripMargin,
    "q_sliding_window" ->
      """WITH w AS (
        |  SELECT date_trunc('hour', ts) AS ws FROM events
        |  UNION ALL
        |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR FROM events)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M') AS window_start,
        |  count(*) AS n_events
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rfm_segments" ->
      """WITH per AS (SELECT user_id,
        |    date_diff('day', max(CAST(ts AS DATE)), DATE '2024-01-31') AS recency_days,
        |    count(*) AS frequency,
        |    round(sum(coalesce(value, 0)), 2) AS monetary
        |  FROM events
        |  WHERE lower(coalesce(event_type, '')) IN ('purchase','order','checkout')
        |  GROUP BY 1),
        |s AS (SELECT *,
        |    ntile(4) OVER (ORDER BY recency_days, user_id) AS r_q,
        |    ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f_q,
        |    ntile(4) OVER (ORDER BY monetary DESC, user_id) AS m_q
        |  FROM per)
        |SELECT r_q, f_q, m_q, count(*) AS n_users,
        |  round(avg(monetary), 2) AS avg_monetary
        |FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_anomaly_hours" ->
      """WITH hourly AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n
        |  FROM events GROUP BY 1),
        |s AS (SELECT h, n,
        |    avg(n) OVER w AS mu, stddev_samp(n) OVER w AS sd
        |  FROM hourly
        |  WINDOW w AS (ORDER BY h
        |    RANGE BETWEEN INTERVAL 6 HOUR PRECEDING AND INTERVAL 1 HOUR PRECEDING))
        |SELECT strftime(h, '%Y-%m-%d %H:00') AS hour, n,
        |  round(mu, 4) AS mu, round(sd, 4) AS sd,
        |  round((n - mu) / sd, 3) AS z
        |FROM s WHERE sd IS NOT NULL AND sd > 0
        |ORDER BY 1""".stripMargin,
    // PSI drift vs first-day reference: Laplace-0.5-smoothed shares
    // over the zero-filled day x type grid (K = global type count)
    "q_drift_psi" ->
      """WITH c AS (SELECT strftime(ts, '%Y-%m-%d') AS dt, event_type,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |ty AS (SELECT DISTINCT event_type FROM c),
        |k AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM ty),
        |d AS (SELECT dt, CAST(sum(cnt) AS BIGINT) AS n_day FROM c GROUP BY 1),
        |grid AS (SELECT d.dt, ty.event_type, d.n_day,
        |    coalesce(c.cnt, 0) AS cnt
        |  FROM d CROSS JOIN ty
        |  LEFT JOIN c ON c.dt = d.dt AND c.event_type = ty.event_type),
        |sm AS (SELECT dt, event_type, n_day,
        |    (cnt + 0.5) / (n_day + 0.5 * k.k) AS share
        |  FROM grid CROSS JOIN k),
        |r AS (SELECT event_type, share AS ref_share FROM sm
        |  WHERE dt = (SELECT min(dt) FROM sm))
        |SELECT sm.dt, max(sm.n_day) AS n_events,
        |  round(sum((share - ref_share) * ln(share / ref_share)), 6) AS psi
        |FROM sm JOIN r USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // md5-bucketed 50/50 assignment (same engine-portable recipe as
    // q_train_split) + sample-ratio-mismatch chi-square at alpha=.05
    "q_ab_srm" ->
      """WITH u AS (SELECT user_id,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 2) < '80'
        |         THEN 'A' ELSE 'B' END AS variant,
        |    count(*) AS n_events,
        |    max(CASE WHEN lower(coalesce(event_type, '')) = 'purchase'
        |        THEN 1 ELSE 0 END) AS converted,
        |    sum(CASE WHEN lower(coalesce(event_type, '')) = 'purchase'
        |        THEN coalesce(value, 0) ELSE 0 END) AS revenue
        |  FROM events GROUP BY 1, 2),
        |v AS (SELECT variant, count(*) AS n_users,
        |    CAST(sum(n_events) AS BIGINT) AS n_events,
        |    CAST(sum(converted) AS BIGINT) AS n_converted,
        |    round(sum(revenue), 2) AS revenue
        |  FROM u GROUP BY 1),
        |t AS (SELECT CAST(sum(n_users) AS DOUBLE) / 2 AS exp_users FROM v),
        |c AS (SELECT sum(pow(n_users - t.exp_users, 2) / t.exp_users) AS chi2
        |  FROM v CROSS JOIN t)
        |SELECT v.variant, v.n_users, v.n_events, v.n_converted,
        |  round(CAST(v.n_converted AS DOUBLE) / v.n_users, 4) AS conv_rate,
        |  v.revenue, round(c.chi2, 4) AS srm_chi2,
        |  c.chi2 >= 3.841 AS srm_detected
        |FROM v CROSS JOIN c ORDER BY 1""".stripMargin,
    // CUPED from the six per-variant sums: var(Y') expands in closed
    // form, so no per-user adjusted value is summed (order-dependent
    // float addition would break engine parity); population variance
    "q_cuped" ->
      s"""WITH u AS (SELECT user_id,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 2) < '80'
        |         THEN 'A' ELSE 'B' END AS variant,
        |    sum(CASE WHEN CAST(ts AS DATE) < DATE '${operators.ExperimentQueries.CupedSplit}'
        |        THEN 1 ELSE 0 END) AS x,
        |    sum(CASE WHEN CAST(ts AS DATE) < DATE '${operators.ExperimentQueries.CupedSplit}'
        |        THEN 0 ELSE 1 END) AS y
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT variant, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx,
        |    CAST(sum(y * y) AS DOUBLE) AS syy,
        |    CAST(sum(x * y) AS DOUBLE) AS sxy
        |  FROM u GROUP BY 1),
        |g AS (SELECT *,
        |    sum(n) OVER () AS gn, sum(sx) OVER () AS gsx,
        |    sum(sy) OVER () AS gsy, sum(sxx) OVER () AS gsxx,
        |    sum(sxy) OVER () AS gsxy
        |  FROM s),
        |t AS (SELECT *,
        |    gsxx / gn - (gsx / gn) * (gsx / gn) AS gvarx,
        |    gsxy / gn - (gsx / gn) * (gsy / gn) AS gcov,
        |    sy / n AS mean_y
        |  FROM g),
        |t2 AS (SELECT *,
        |    CASE WHEN gvarx > 0 THEN gcov / gvarx ELSE 0.0 END AS theta,
        |    syy / n - mean_y * mean_y AS var_y,
        |    sxx / n - (sx / n) * (sx / n) AS var_x,
        |    sxy / n - (sx / n) * mean_y AS cov_xy
        |  FROM t),
        |t3 AS (SELECT *,
        |    mean_y - theta * (sx / n - gsx / gn) AS mean_y_cuped,
        |    var_y - 2.0 * theta * cov_xy + theta * theta * var_x
        |      AS var_y_cuped
        |  FROM t2)
        |SELECT variant, CAST(n AS BIGINT) AS n_users,
        |  round(theta, 6) AS theta,
        |  round(mean_y, 6) AS mean_y, round(var_y, 6) AS var_y,
        |  round(mean_y_cuped, 6) AS mean_y_cuped,
        |  round(var_y_cuped, 6) AS var_y_cuped,
        |  CASE WHEN var_y > 0
        |    THEN round(CAST(1 AS DOUBLE) - var_y_cuped / var_y, 6) END
        |    AS var_reduction
        |FROM t3 ORDER BY 1""".stripMargin,
    // switchback design: (user, day) randomization unit, same-day
    // purchase conversion, pooled two-proportion z-test; degenerate
    // variance (p in {0,1}) yields NULL z / false verdict
    "q_ab_lift" ->
      """WITH u AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS dt,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || ':' ||
        |        strftime(ts, '%Y-%m-%d')), 1, 2) < '80'
        |      THEN 'A' ELSE 'B' END AS variant,
        |    max(CASE WHEN lower(coalesce(event_type, '')) = 'purchase'
        |        THEN 1 ELSE 0 END) AS converted
        |  FROM events GROUP BY 1, 2, 3),
        |w AS (SELECT
        |    CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN variant = 'A' THEN converted ELSE 0 END)
        |      AS BIGINT) AS conv_a,
        |    CAST(sum(CASE WHEN variant = 'B' THEN converted ELSE 0 END)
        |      AS BIGINT) AS conv_b
        |  FROM u),
        |s AS (SELECT n_a, n_b, conv_a, conv_b,
        |    conv_a / CAST(n_a AS DOUBLE) AS ra,
        |    conv_b / CAST(n_b AS DOUBLE) AS rb,
        |    (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE) AS p
        |  FROM w),
        |s2 AS (SELECT *, sqrt(p * (CAST(1 AS DOUBLE) - p) *
        |    (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)) AS se
        |  FROM s)
        |SELECT n_a, n_b, conv_a, conv_b,
        |  round(ra, 6) AS rate_a, round(rb, 6) AS rate_b,
        |  round(ra - rb, 6) AS lift_abs,
        |  CASE WHEN rb > 0 THEN round((ra - rb) / rb, 6) END AS lift_rel,
        |  CASE WHEN se > 0 THEN round((ra - rb) / se, 6) END AS z,
        |  coalesce(abs(CASE WHEN se > 0 THEN (ra - rb) / se END) >= 1.96,
        |    FALSE) AS significant
        |FROM s2""".stripMargin,
    // Holt level+trend recursion as a recursive CTE, identical
    // operation shapes to the Spark fold (0.5/0.3/0.7 literals parse
    // to the same doubles both engines)
    "q_holt_trend" ->
      """WITH RECURSIVE d AS (SELECT event_type,
        |    strftime(ts, '%Y-%m-%d') AS dt, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |o AS (SELECT event_type, CAST(x AS DOUBLE) AS x,
        |    row_number() OVER (PARTITION BY event_type ORDER BY dt) AS t
        |  FROM d),
        |h AS (
        |  SELECT a.event_type, 1 AS t, a.x AS level, b.x - a.x AS trend,
        |    CAST(0.0 AS DOUBLE) AS ape
        |  FROM o a JOIN o b ON b.event_type = a.event_type AND b.t = 2
        |  WHERE a.t = 1
        |  UNION ALL
        |  SELECT h.event_type, h.t + 1,
        |    0.5 * o.x + 0.5 * (h.level + h.trend),
        |    0.3 * ((0.5 * o.x + 0.5 * (h.level + h.trend)) - h.level)
        |      + 0.7 * h.trend,
        |    h.ape + abs(o.x - (h.level + h.trend)) / o.x
        |  FROM h JOIN o ON o.event_type = h.event_type AND o.t = h.t + 1)
        |SELECT h.event_type, CAST(m.n AS BIGINT) AS n_days,
        |  round(h.level, 6) AS level, round(h.trend, 6) AS trend,
        |  round(h.level + h.trend, 6) AS forecast_next,
        |  round(h.ape / (m.n - 1), 6) AS mape
        |FROM h JOIN (SELECT event_type, max(t) AS n FROM o GROUP BY 1) m
        |  ON m.event_type = h.event_type AND h.t = m.n
        |ORDER BY 1""".stripMargin,
    // two-sided CUSUM on the standardized daily count; mu/sigma from
    // exact integer sums (no Welford path), k=0.5, h=4
    "q_cusum" ->
      """WITH RECURSIVE d AS (SELECT strftime(ts, '%Y-%m-%d') AS dt,
        |    count(*) AS x
        |  FROM events GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS cnt,
        |    CAST(sum(x) AS DOUBLE) AS sx,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx
        |  FROM d),
        |o AS (SELECT dt, x, row_number() OVER (ORDER BY dt) AS t,
        |    (x - st.sx / st.cnt) /
        |      sqrt(st.sxx / st.cnt - (st.sx / st.cnt) * (st.sx / st.cnt))
        |      AS z
        |  FROM d CROSS JOIN st),
        |h AS (
        |  SELECT dt, x, t, z,
        |    greatest(0.0, z - 0.5) AS spos,
        |    greatest(0.0, -z - 0.5) AS sneg
        |  FROM o WHERE t = 1
        |  UNION ALL
        |  SELECT o.dt, o.x, o.t, o.z,
        |    greatest(0.0, h.spos + o.z - 0.5),
        |    greatest(0.0, h.sneg - o.z - 0.5)
        |  FROM h JOIN o ON o.t = h.t + 1)
        |SELECT dt, x AS n, round(z, 6) AS z,
        |  round(spos, 6) AS cusum_pos, round(sneg, 6) AS cusum_neg,
        |  (spos > 4.0 OR sneg > 4.0) AS alarm
        |FROM h ORDER BY 1""".stripMargin,
    // STL-lite: 7-day centered MA trend, dow seasonal re-centered to
    // sum to zero over the series, 2-sigma residual anomaly;
    // Spark dayofweek - 1 == DuckDB dayofweek (Sunday = 0)
    "q_stl_decompose" ->
      """WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS dt, count(*) AS n
        |  FROM events GROUP BY 1),
        |t AS (SELECT dt, n, dayofweek(CAST(dt AS DATE)) AS dow,
        |    CASE WHEN count(*) OVER w7 = 7
        |      THEN CAST(sum(n) OVER w7 AS DOUBLE) / 7.0 END AS trend
        |  FROM d
        |  WINDOW w7 AS (ORDER BY dt ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |t2 AS (SELECT *, n - trend AS detrended FROM t),
        |t3 AS (SELECT *, avg(detrended) OVER (PARTITION BY dow) AS s_raw
        |  FROM t2),
        |t4 AS (SELECT *, s_raw - avg(s_raw) OVER () AS seasonal FROM t3),
        |t5 AS (SELECT *, n - trend - seasonal AS resid FROM t4),
        |t6 AS (SELECT *, stddev_pop(resid) OVER () AS sigma FROM t5)
        |SELECT dt, n, CAST(dow AS INT) AS dow, round(trend, 6) AS trend,
        |  round(seasonal, 6) AS seasonal, round(resid, 6) AS resid,
        |  coalesce(abs(resid) > 2.0 * sigma, FALSE) AS anomaly
        |FROM t6 ORDER BY 1""".stripMargin,
    // closed-form OLS from the five sums; t and y are integer-valued
    // so the sums are exact and every derived double is
    // engine-identical
    "q_ols_trend" ->
      """WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS dt,
        |    count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |o AS (SELECT event_type,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY dt)
        |      AS DOUBLE) AS t,
        |    CAST(x AS DOUBLE) AS y
        |  FROM d),
        |s AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        |    sum(t) AS sx, sum(y) AS sy, sum(t * t) AS sxx,
        |    sum(y * y) AS syy, sum(t * y) AS sxy
        |  FROM o GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |  round((sy - sx * ((n * sxy - sx * sy) / (n * sxx - sx * sx))) / n,
        |    6) AS intercept,
        |  round(pow(n * sxy - sx * sy, 2) /
        |    ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2,
        |  round(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * (n + 1) +
        |    (sy - sx * ((n * sxy - sx * sy) / (n * sxx - sx * sx))) / n,
        |    6) AS fit_next
        |FROM s ORDER BY 1""".stripMargin,
    // MI over observed cells, chi2 over the zero-filled grid (an
    // empty cell contributes its expectation), Cramer's V normalizer
    // n * min(r-1, c-1)
    "q_feature_assoc" ->
      """WITH c AS (SELECT event_type, CAST(hour(ts) AS INT) AS hr,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |n AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM c),
        |mx AS (SELECT event_type, CAST(sum(cnt) AS DOUBLE) AS nx
        |  FROM c GROUP BY 1),
        |my AS (SELECT hr, CAST(sum(cnt) AS DOUBLE) AS ny FROM c GROUP BY 1),
        |g AS (SELECT mx.event_type, my.hr, mx.nx, my.ny, n.n,
        |    coalesce(c.cnt, 0) AS cnt
        |  FROM mx CROSS JOIN my CROSS JOIN n
        |  LEFT JOIN c ON c.event_type = mx.event_type AND c.hr = my.hr),
        |s AS (SELECT max(n) AS n,
        |    count(DISTINCT event_type) AS n_types,
        |    count(DISTINCT hr) AS n_hours,
        |    sum(CASE WHEN cnt > 0
        |        THEN (cnt / n) * ln(cnt * n / (nx * ny)) ELSE 0 END) AS mi,
        |    sum(pow(cnt - nx * ny / n, 2) / (nx * ny / n)) AS chi2
        |  FROM g)
        |SELECT CAST(n AS BIGINT) AS n, n_types, n_hours,
        |  CAST((n_types - 1) * (n_hours - 1) AS BIGINT) AS dof,
        |  round(mi, 6) AS mi, round(chi2, 6) AS chi2,
        |  round(sqrt(chi2 / (n * least(n_types - 1, n_hours - 1))), 6)
        |    AS cramers_v
        |FROM s""".stripMargin,
    // binned two-sample KS vs the first-day reference: 64 equal-width
    // bins over the global value range, ECDF from integer bin counts
    "q_ks_drift" ->
      """WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS dt, value
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT min(value) AS lo, max(value) AS hi FROM e),
        |b AS (SELECT dt,
        |    CASE WHEN r.hi > r.lo THEN least(63, greatest(0,
        |        CAST(floor((value - r.lo) / ((r.hi - r.lo) / 64))
        |          AS BIGINT)))
        |      ELSE 0 END AS bin,
        |    count(*) AS cnt
        |  FROM e CROSS JOIN r GROUP BY 1, 2),
        |d AS (SELECT dt, CAST(sum(cnt) AS BIGINT) AS n_day FROM b GROUP BY 1),
        |g AS (SELECT d.dt, t.bin, d.n_day, coalesce(b.cnt, 0) AS cnt
        |  FROM d CROSS JOIN (SELECT unnest(range(64)) AS bin) t
        |  LEFT JOIN b ON b.dt = d.dt AND b.bin = t.bin),
        |c AS (SELECT dt, bin, n_day,
        |    CAST(sum(cnt) OVER (PARTITION BY dt ORDER BY bin) AS DOUBLE)
        |      / n_day AS cdf
        |  FROM g),
        |rf AS (SELECT bin, cdf AS ref_cdf, n_day AS n_ref FROM c
        |  WHERE dt = (SELECT min(dt) FROM c)),
        |s AS (SELECT c.dt, max(c.n_day) AS n, max(rf.n_ref) AS m,
        |    max(abs(c.cdf - rf.ref_cdf)) AS ks
        |  FROM c JOIN rf USING (bin) GROUP BY 1)
        |SELECT dt, CAST(n AS BIGINT) AS n, round(ks, 6) AS ks,
        |  round(1.36 * sqrt((n + m) / CAST(n * m AS DOUBLE)), 6) AS ks_crit,
        |  ks > 1.36 * sqrt((n + m) / CAST(n * m AS DOUBLE)) AS drift_detected
        |FROM s ORDER BY 1""".stripMargin,
    // exact stratified sample: ceil(0.1 * n_g) md5-smallest rows per
    // stratum — rank is a pure function of event_id on both engines
    "q_sample_stratified" ->
      """WITH b AS (SELECT event_id, user_id, event_type,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n_g
        |  FROM events)
        |SELECT event_type, rn AS sample_rank, event_id, user_id,
        |  n_g AS stratum_n
        |FROM b WHERE rn <= ceil(n_g * 0.1)""".stripMargin,
    "q_sample_bernoulli" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 4) < '1999'"""
        .stripMargin,
    // WOE/IV with Laplace 0.5 smoothing over fixed published cuts —
    // formula mirrored term-for-term (ln on identical doubles)
    "q_woe_iv" ->
      """WITH c AS (SELECT
        |    CASE WHEN n_chars < 180 THEN 1 WHEN n_chars < 300 THEN 2
        |         WHEN n_chars < 420 THEN 3 ELSE 4 END AS bin,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
        |  FROM documents GROUP BY 1),
        |t AS (SELECT sum(n_pos) AS pos, sum(n_neg) AS neg FROM c),
        |s AS (SELECT bin, n_pos, n_neg,
        |    (n_pos + 0.5) / (pos + 2.0) AS p,
        |    (n_neg + 0.5) / (neg + 2.0) AS q FROM c, t),
        |iv AS (SELECT sum((p - q) * ln(p / q)) AS iv FROM s)
        |SELECT bin, n_pos, n_neg, round(ln(p / q), 6) AS woe,
        |  round(iv.iv, 6) AS iv
        |FROM s, iv ORDER BY bin""".stripMargin,
    "q_retention_cohorts" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cohort FROM ud GROUP BY 1)
        |SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort,
        |  date_diff('day', f.cohort, ud.d) AS day_k,
        |  count(*) AS n_active
        |FROM ud JOIN f ON ud.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_event_transitions" ->
      """WITH s AS (SELECT user_id, lower(coalesce(event_type, '')) AS et,
        |    lead(lower(coalesce(event_type, ''))) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS next_et
        |  FROM events)
        |SELECT et, next_et, count(*) AS n FROM s
        |WHERE next_et IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_funnel" ->
      """WITH e AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS dt,
        |    lower(coalesce(event_type, '')) AS et, ts FROM events),
        |v AS (SELECT user_id, dt, min(ts) AS tv FROM e
        |  WHERE et = 'view' GROUP BY 1, 2),
        |c AS (SELECT e.user_id, e.dt, min(e.ts) AS tc FROM e
        |  JOIN v ON e.user_id = v.user_id AND e.dt = v.dt
        |  WHERE e.et = 'click' AND e.ts > v.tv GROUP BY 1, 2),
        |p AS (SELECT e.user_id, e.dt, min(e.ts) AS tp FROM e
        |  JOIN c ON e.user_id = c.user_id AND e.dt = c.dt
        |  WHERE e.et = 'purchase' AND e.ts > c.tc GROUP BY 1, 2)
        |SELECT v.dt AS dt, count(DISTINCT v.user_id) AS n_view,
        |  count(DISTINCT c.user_id) AS n_view_click,
        |  count(DISTINCT p.user_id) AS n_full_funnel
        |FROM v
        |LEFT JOIN c ON v.user_id = c.user_id AND v.dt = c.dt
        |LEFT JOIN p ON v.user_id = p.user_id AND v.dt = p.dt
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_resample_hourly" ->
      """WITH grid AS (SELECT unnest(generate_series(
        |    TIMESTAMP '2024-01-01 00:00:00',
        |    TIMESTAMP '2024-01-05 23:00:00', INTERVAL 1 HOUR)) AS h),
        |c AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
        |    count(*) AS n_events,
        |    round(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('purchase','order','checkout') THEN coalesce(value, 0) ELSE 0 END), 2) AS rev
        |  FROM events WHERE ts < TIMESTAMP '2024-01-06' GROUP BY 1)
        |SELECT strftime(grid.h, '%Y-%m-%d %H:00') AS hour,
        |  coalesce(n_events, 0) AS n_events,
        |  coalesce(rev, 0) AS revenue_usd
        |FROM grid LEFT JOIN c ON strftime(grid.h, '%Y-%m-%d %H:00') = c.hour
        |ORDER BY 1""".stripMargin,
    "q_raw_kpis" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS dt,
        |  count(*) AS total_events,
        |  count(DISTINCT user_id) AS unique_users,
        |  count(DISTINCT event_id) AS unique_sessions,
        |  CAST(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('page_view','pageview','view') THEN 1 ELSE 0 END) AS BIGINT) AS pageviews,
        |  CAST(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('purchase','order','checkout') THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
        |  round(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('purchase','order','checkout') THEN coalesce(value, 0) ELSE 0 END), 2) AS revenue_usd
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_hourly" ->
      s"""SELECT strftime(ts, '%Y-%m-%d') AS dt, strftime(ts, '%H') AS hh,
        |  count(*) AS n_events
        |FROM events WHERE CAST(ts AS DATE) < DATE '${operators.PipelineQueries.HourlyCutoff}'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_stream_upsert" ->
      s"""SELECT strftime(ts, '%Y-%m-%d') AS dt,
        |  count(*) AS total_events,
        |  CAST(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('page_view','pageview','view') THEN 1 ELSE 0 END) AS BIGINT) AS pageviews,
        |  CAST(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('purchase','order','checkout') THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
        |  round(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('purchase','order','checkout') THEN coalesce(value, 0) ELSE 0 END), 2) AS revenue_usd
        |FROM events WHERE CAST(ts AS DATE) < DATE '${operators.PipelineQueries.StreamCutoff}'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_enrich" ->
      s"""WITH m(et, category) AS (VALUES
        |  ${operators.PipelineQueries.EnrichDim.map { case (k, v) => s"('$k', '$v')" }.mkString(", ")}),
        |e AS (SELECT lower(coalesce(event_type, '')) AS et, value FROM events
        |  WHERE CAST(ts AS DATE) < DATE '${operators.PipelineQueries.StreamCutoff}')
        |SELECT coalesce(m.category, 'other') AS category, count(*) AS n_events,
        |  round(sum(coalesce(e.value, 0)), 2) AS revenue
        |FROM e LEFT JOIN m ON e.et = m.et
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_dedup" ->
      s"""SELECT strftime(ts, '%Y-%m-%d') AS dt, count(DISTINCT event_id) AS n_events
        |FROM events WHERE CAST(ts AS DATE) < DATE '${operators.PipelineQueries.StreamCutoff}'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // both dedup regimes pin to the same exact-distinct oracle
    "q_stream_dedup_wm" ->
      s"""SELECT strftime(ts, '%Y-%m-%d') AS dt, count(DISTINCT event_id) AS n_events
        |FROM events WHERE CAST(ts AS DATE) < DATE '${operators.PipelineQueries.StreamCutoff}'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_sketch" ->
      s"""SELECT strftime(ts, '%Y-%m-%d') AS dt,
        |  count(DISTINCT user_id) AS exact_users, TRUE AS within_5pct
        |FROM events WHERE CAST(ts AS DATE) < DATE '${operators.PipelineQueries.StreamCutoff}'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // same PSI math as q_drift_psi, over the stream-cutoff window —
    // the engine side computes it from the incrementally maintained
    // day x type count table, not raw history
    "q_stream_drift" ->
      s"""WITH c AS (SELECT strftime(ts, '%Y-%m-%d') AS dt, event_type,
        |    count(*) AS cnt
        |  FROM events WHERE CAST(ts AS DATE) < DATE '${operators.PipelineQueries.StreamCutoff}'
        |  GROUP BY 1, 2),
        |ty AS (SELECT DISTINCT event_type FROM c),
        |k AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM ty),
        |d AS (SELECT dt, CAST(sum(cnt) AS BIGINT) AS n_day FROM c GROUP BY 1),
        |grid AS (SELECT d.dt, ty.event_type, d.n_day,
        |    coalesce(c.cnt, 0) AS cnt
        |  FROM d CROSS JOIN ty
        |  LEFT JOIN c ON c.dt = d.dt AND c.event_type = ty.event_type),
        |sm AS (SELECT dt, event_type, n_day,
        |    (cnt + 0.5) / (n_day + 0.5 * k.k) AS share
        |  FROM grid CROSS JOIN k),
        |r AS (SELECT event_type, share AS ref_share FROM sm
        |  WHERE dt = (SELECT min(dt) FROM sm))
        |SELECT sm.dt, max(sm.n_day) AS n_events,
        |  round(sum((share - ref_share) * ln(share / ref_share)), 6) AS psi
        |FROM sm JOIN r USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_salted_join" ->
      """SELECT o_orderkey, count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_bloom_join" ->
      """SELECT l_returnflag, count(*) AS n_lines,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_manifest_kpis" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS dt,
        |  count(*) AS total_events,
        |  count(DISTINCT user_id) AS unique_users,
        |  round(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('purchase','order','checkout') THEN coalesce(value, 0) ELSE 0 END), 2) AS revenue_usd
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-13'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sorted_scan" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS dt,
        |  count(*) AS total_events,
        |  count(DISTINCT user_id) AS unique_users,
        |  round(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('purchase','order','checkout') THEN coalesce(value, 0) ELSE 0 END), 2) AS revenue_usd
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-13'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_zorder_scan" ->
      """SELECT user_id, strftime(ts, '%Y-%m-%d') AS dt,
        |  count(*) AS total_events,
        |  round(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('purchase','order','checkout') THEN coalesce(value, 0) ELSE 0 END), 2) AS revenue_usd
        |FROM events
        |WHERE user_id < 3
        |  AND ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-13'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_compact_kpis" ->
      s"""SELECT strftime(ts, '%Y-%m-%d') AS dt,
        |  count(*) AS total_events,
        |  count(DISTINCT user_id) AS unique_users,
        |  count(DISTINCT event_id) AS unique_sessions,
        |  CAST(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('page_view','pageview','view') THEN 1 ELSE 0 END) AS BIGINT) AS pageviews,
        |  CAST(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('purchase','order','checkout') THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
        |  round(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('purchase','order','checkout') THEN coalesce(value, 0) ELSE 0 END), 2) AS revenue_usd
        |FROM events
        |WHERE CAST(ts AS DATE) < DATE '${operators.PipelineQueries.StreamCutoff}'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pruned_kpis" ->
      s"""SELECT strftime(ts, '%Y-%m-%d') AS dt,
        |  count(*) AS total_events,
        |  count(DISTINCT user_id) AS unique_users,
        |  count(DISTINCT event_id) AS unique_sessions,
        |  CAST(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('page_view','pageview','view') THEN 1 ELSE 0 END) AS BIGINT) AS pageviews,
        |  CAST(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('purchase','order','checkout') THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
        |  round(sum(CASE WHEN lower(coalesce(event_type,'')) IN ('purchase','order','checkout') THEN coalesce(value, 0) ELSE 0 END), 2) AS revenue_usd
        |FROM events
        |WHERE strftime(ts, '%Y-%m-%d') = '${operators.PipelineQueries.PruneDay}'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stateful_sessions" ->
      s"""WITH g AS (
        |  SELECT user_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR date_diff('millisecond', lag(ts) OVER w, ts) > 1800000 THEN 1 ELSE 0 END AS new_sess
        |  FROM events WHERE CAST(ts AS DATE) < DATE '${operators.PipelineQueries.SessionCutoff}'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    // transformWithState variant: same sessions, same oracle (the two
    // stateful APIs are pinned to agree)
    "q_tws_sessions" ->
      s"""WITH g AS (
        |  SELECT user_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR date_diff('millisecond', lag(ts) OVER w, ts) > 1800000 THEN 1 ELSE 0 END AS new_sess
        |  FROM events WHERE CAST(ts AS DATE) < DATE '${operators.PipelineQueries.SessionCutoff}'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_outer_counts" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  round(sum(coalesce(o_totalprice, 0)), 2) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_join_full" ->
      """WITH o AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |    count(*) AS n_orders, round(sum(o_totalprice), 2) AS ordered_value
        |  FROM orders GROUP BY 1),
        |r AS (SELECT strftime(l_shipdate, '%Y-%m') AS month,
        |    count(*) AS n_returns, round(sum(l_extendedprice), 2) AS returned_value
        |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1)
        |SELECT coalesce(o.month, r.month) AS month,
        |  coalesce(n_orders, 0) AS n_orders,
        |  coalesce(ordered_value, 0.0) AS ordered_value,
        |  coalesce(n_returns, 0) AS n_returns,
        |  coalesce(returned_value, 0.0) AS returned_value
        |FROM o FULL OUTER JOIN r ON o.month = r.month
        |ORDER BY 1""".stripMargin,
    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_window_top_per_customer" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    // l_extendedprice completes the order: the fixture reuses
    // (orderkey, linenumber), so the shorter key has engine-ambiguous
    // ties (see TpchQueries.windowRunningSum)
    "q_window_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  round(sum(l_extendedprice) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'""".stripMargin,
    "q_window_lag" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(date_diff('day',
        |    CAST(lag(l_shipdate) OVER (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber) AS DATE),
        |    CAST(l_shipdate AS DATE)) AS INT) AS days_since_prev
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01'""".stripMargin,
    "q_set_ops" ->
      """WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |  w_orders AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
        |SELECT c_custkey, 'union' AS op FROM (SELECT c_custkey FROM building UNION SELECT c_custkey FROM w_orders)
        |UNION ALL
        |SELECT c_custkey, 'intersect' AS op FROM (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM w_orders)
        |UNION ALL
        |SELECT c_custkey, 'except' AS op FROM (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM w_orders)
        |ORDER BY op, c_custkey""".stripMargin,
    "q_distinct_brand_type" ->
      """SELECT DISTINCT p_brand, p_type FROM part ORDER BY 1, 2""".stripMargin,
    "q_agg_stats" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  round(min(c_acctbal), 2) AS min_bal,
        |  round(max(c_acctbal), 2) AS max_bal,
        |  round(avg(c_acctbal), 2) AS avg_bal,
        |  round(stddev_samp(c_acctbal), 2) AS sd_bal,
        |  round(quantile_cont(c_acctbal, 0.5), 2) AS median_bal
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_uc,
        |  substring(p_name, 1, 8) AS name_prefix,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  regexp_extract(p_type, '^(\w+)', 1) AS type_head,
        |  replace(p_brand, '#', '_') AS brand_us,
        |  concat_ws('|', p_brand, p_type) AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS month_rev
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_above_avg_orders" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        |FROM orders o
        |JOIN (SELECT o_custkey AS ck, avg(o_totalprice) AS avg_price
        |      FROM orders GROUP BY 1) a ON o.o_custkey = a.ck
        |WHERE o_totalprice > avg_price * 1.5
        |ORDER BY o_orderkey""".stripMargin,
    "q_set_ops_all" ->
      """WITH a AS (SELECT l_suppkey FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-07-01'),
        |b AS (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'),
        |ia AS (SELECT l_suppkey FROM a INTERSECT ALL SELECT l_suppkey FROM b),
        |ea AS (SELECT l_suppkey FROM a EXCEPT ALL SELECT l_suppkey FROM b),
        |ua AS (SELECT l_suppkey FROM a UNION ALL SELECT l_suppkey FROM b)
        |SELECT 'except_all' AS op, count(*) AS n_rows,
        |  count(DISTINCT l_suppkey) AS n_keys FROM ea
        |UNION ALL SELECT 'intersect_all', count(*), count(DISTINCT l_suppkey) FROM ia
        |UNION ALL SELECT 'union_all', count(*), count(DISTINCT l_suppkey) FROM ua
        |ORDER BY op""".stripMargin,
    "q_dq_checks" ->
      """SELECT 'lineitem_orphans' AS check_name, count(*) AS n_violations
        |  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |UNION ALL
        |SELECT 'orders_dup_keys', count(*) FROM (
        |  SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
        |UNION ALL
        |SELECT 'lineitem_null_qty', count(*) FROM lineitem WHERE l_quantity IS NULL
        |UNION ALL
        |SELECT 'orders_negative_price', count(*) FROM orders WHERE o_totalprice < 0
        |ORDER BY check_name""".stripMargin,
    "q_histogram" ->
      """SELECT least(CAST(floor(l_extendedprice / 5000) AS BIGINT), 21) AS bucket,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_table_stats" ->
      """SELECT 'l_quantity' AS col_name, round(min(l_quantity), 2) AS min_v,
        |  round(max(l_quantity), 2) AS max_v,
        |  count(DISTINCT l_quantity) AS ndv,
        |  count(*) - count(l_quantity) AS n_nulls FROM lineitem
        |UNION ALL
        |SELECT 'l_extendedprice', round(min(l_extendedprice), 2),
        |  round(max(l_extendedprice), 2), count(DISTINCT l_extendedprice),
        |  count(*) - count(l_extendedprice) FROM lineitem
        |UNION ALL
        |SELECT 'l_discount', round(min(l_discount), 2),
        |  round(max(l_discount), 2), count(DISTINCT l_discount),
        |  count(*) - count(l_discount) FROM lineitem
        |UNION ALL
        |SELECT 'l_tax', round(min(l_tax), 2), round(max(l_tax), 2),
        |  count(DISTINCT l_tax), count(*) - count(l_tax) FROM lineitem
        |ORDER BY col_name""".stripMargin,
    "q_sliding_distinct_hll" ->
      """WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
        |days AS (SELECT DISTINCT d AS day FROM ud)
        |SELECT strftime(day, '%Y-%m-%d') AS d,
        |  count(DISTINCT user_id) AS users_7d, TRUE AS within_5pct
        |FROM days JOIN ud ON ud.d BETWEEN day - 6 AND day
        |GROUP BY day ORDER BY 1""".stripMargin,
    "q_merge_upsert" ->
      s"""WITH t AS (SELECT strftime(ts, '%Y-%m-%d') AS dt, count(*) AS n,
        |    count(DISTINCT user_id) AS u,
        |    round(sum(CASE WHEN lower(coalesce(event_type, '')) IN ('purchase','order','checkout') THEN coalesce(value, 0) ELSE 0 END), 2) AS rev
        |  FROM events
        |  WHERE CAST(ts AS DATE) < DATE '${operators.AnalyticsWave4.MergeCutoff}'
        |    AND lower(coalesce(event_type, '')) <> 'error'
        |  GROUP BY 1),
        |s AS (SELECT strftime(ts, '%Y-%m-%d') AS dt, count(*) AS n,
        |    count(DISTINCT user_id) AS u,
        |    round(sum(CASE WHEN lower(coalesce(event_type, '')) IN ('purchase','order','checkout') THEN coalesce(value, 0) ELSE 0 END), 2) AS rev
        |  FROM events
        |  WHERE CAST(ts AS DATE) >= DATE '${operators.AnalyticsWave4.MergeSplit}'
        |  GROUP BY 1)
        |SELECT coalesce(s.dt, t.dt) AS dt,
        |  coalesce(s.n, t.n) AS total_events,
        |  coalesce(s.u, t.u) AS unique_users,
        |  coalesce(s.rev, t.rev) AS revenue_usd,
        |  CASE WHEN s.dt IS NOT NULL AND t.dt IS NOT NULL THEN 'update'
        |       WHEN t.dt IS NULL THEN 'insert' ELSE 'keep' END AS action
        |FROM t FULL OUTER JOIN s ON t.dt = s.dt ORDER BY 1""".stripMargin,
    "q_cum_distinct" ->
      """WITH f AS (SELECT user_id, min(strftime(ts, '%Y-%m-%d')) AS dt
        |  FROM events GROUP BY 1),
        |d AS (SELECT dt, count(*) AS new_users FROM f GROUP BY 1),
        |days AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS dt FROM events)
        |SELECT days.dt, coalesce(d.new_users, 0) AS new_users,
        |  CAST(sum(coalesce(d.new_users, 0))
        |    OVER (ORDER BY days.dt) AS BIGINT) AS cum_users
        |FROM days LEFT JOIN d ON d.dt = days.dt ORDER BY 1""".stripMargin,
    "q_rolling_median" ->
      """WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS dt,
        |    round(sum(CASE WHEN lower(coalesce(event_type, '')) IN ('purchase','order','checkout') THEN coalesce(value, 0) ELSE 0 END), 2) AS rev
        |  FROM events GROUP BY 1)
        |SELECT dt, rev, round(median(rev) OVER w, 2) AS rev_med7,
        |  round(avg(rev) OVER w, 2) AS rev_avg7
        |FROM d WINDOW w AS (ORDER BY dt ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY dt""".stripMargin,
    // accuracy gates (r8): exact ground truth is hash-pinned; each
    // estimator's claim is a boolean the oracle fixes at TRUE
    "q_table_stats_approx" ->
      """SELECT 'l_quantity' AS col_name, round(min(l_quantity), 2) AS min_v,
        |  round(max(l_quantity), 2) AS max_v,
        |  count(DISTINCT l_quantity) AS ndv,
        |  count(*) - count(l_quantity) AS n_nulls, TRUE AS ndv_ok
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_extendedprice', round(min(l_extendedprice), 2),
        |  round(max(l_extendedprice), 2), count(DISTINCT l_extendedprice),
        |  count(*) - count(l_extendedprice), TRUE FROM lineitem
        |UNION ALL
        |SELECT 'l_discount', round(min(l_discount), 2),
        |  round(max(l_discount), 2), count(DISTINCT l_discount),
        |  count(*) - count(l_discount), TRUE FROM lineitem
        |UNION ALL
        |SELECT 'l_tax', round(min(l_tax), 2), round(max(l_tax), 2),
        |  count(DISTINCT l_tax), count(*) - count(l_tax), TRUE FROM lineitem
        |ORDER BY col_name""".stripMargin,
    // accuracy-gated (r9, formerly rows-only): exact per-group
    // distinct hash-pinned; the pure-HLL estimate rides as the
    // within_5pct claim the oracle fixes at TRUE
    "q_approx_distinct_fast" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS within_5pct
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sketch_rollup" ->
      """SELECT event_type, count(DISTINCT strftime(ts, '%Y-%m-%d')) AS days,
        |  count(DISTINCT user_id) AS exact_users, TRUE AS within_5pct
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_quantile_rollup" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  count(DISTINCT strftime(l_shipdate, '%Y-%m')) AS months,
        |  TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_user_overlap" ->
      """WITH ud AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS dt,
        |    CAST(ts AS DATE) AS d, user_id FROM events),
        |n AS (SELECT dt, d, count(*) AS nd FROM ud GROUP BY 1, 2),
        |ov AS (SELECT a.dt AS day_a, count(*) AS n_ov
        |  FROM ud a JOIN ud b ON b.d = a.d + 1 AND b.user_id = a.user_id
        |  GROUP BY 1)
        |SELECT na.dt AS day_a, nb.dt AS day_b, na.nd AS exact_a,
        |  nb.nd AS exact_b, coalesce(ov.n_ov, 0) AS exact_overlap,
        |  TRUE AS within_tol
        |FROM n na JOIN n nb ON nb.d = na.d + 1
        |LEFT JOIN ov ON ov.day_a = na.dt
        |ORDER BY 1""".stripMargin,
    "q_kmv_overlap" ->
      """WITH ud AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS dt,
        |    CAST(ts AS DATE) AS d, user_id FROM events),
        |n AS (SELECT dt, d, count(*) AS nd FROM ud GROUP BY 1, 2),
        |ov AS (SELECT a.dt AS day_a, count(*) AS n_ov
        |  FROM ud a JOIN ud b ON b.d = a.d + 1 AND b.user_id = a.user_id
        |  GROUP BY 1)
        |SELECT na.dt AS day_a, nb.dt AS day_b, na.nd AS exact_a,
        |  nb.nd AS exact_b, coalesce(ov.n_ov, 0) AS exact_overlap,
        |  TRUE AS within_tol
        |FROM n na JOIN n nb ON nb.d = na.d + 1
        |LEFT JOIN ov ON ov.day_a = na.dt
        |ORDER BY 1""".stripMargin,
    "q_join_card_est" ->
      """SELECT count(*) AS exact_join_rows,
        |  count(DISTINCT l_orderkey) AS exact_join_keys,
        |  TRUE AS rows_ok, TRUE AS keys_ok
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,
    "q_file_manifest" ->
      """SELECT count(*) AS total_rows,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS min_ts,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts,
        |  TRUE AS ranges_disjoint
        |FROM events""".stripMargin,
    "q_agg_corr" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_s,
        |  round(covar_pop(l_quantity, l_extendedprice), 2) AS covar_p,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 4) AS r2
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_window_firstlast" ->
      """WITH w AS (SELECT o_orderkey, o_custkey, o_orderdate,
        |    round(first_value(o_totalprice) OVER win, 2) AS first_price,
        |    round(last_value(o_totalprice) OVER win, 2) AS last_price,
        |    round(nth_value(o_totalprice, 2) OVER win, 2) AS second_price
        |  FROM orders
        |  WINDOW win AS (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT o_orderkey, o_custkey, first_price, last_price, second_price
        |FROM w WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |ORDER BY o_orderkey""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q12_priority" ->
      """SELECT CAST(year(l_shipdate) AS INT) AS ship_yr,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_promo_share" ->
      """SELECT round(sum(CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) * 100.0 /
        |  sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,
    "q_asof_join" -> AsofSql,
    // the native AsOfMergeJoinExec path answers the same question —
    // both implementations pin to one external ASOF semantics
    "q_asof_native" -> AsofSql,
    // forward direction: EARLIEST right at-or-after — DuckDB ASOF
    // with the inequality flipped pins the next-event semantics
    "q_asof_fwd" ->
      """WITH r AS (
        |  SELECT o_custkey % 10 AS k, o_orderdate AS asof_ts,
        |    max(o_orderkey) AS asof_orderkey
        |  FROM orders GROUP BY 1, 2),
        |l AS (
        |  SELECT l_orderkey, l_linenumber, CAST(l_suppkey % 10 AS INT) AS k, l_shipdate
        |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01')
        |SELECT l.l_orderkey, l.l_linenumber, l.k, r.asof_orderkey,
        |  strftime(r.asof_ts, '%Y-%m-%d') AS next_orderdate
        |FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.l_shipdate <= r.asof_ts""".stripMargin,
    "q_range_join" ->
      """SELECT o_orderkey, count(*) AS n_shipped_90d
        |FROM orders JOIN lineitem
        |  ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate < o_orderdate + INTERVAL 90 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cube_orders" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM orders GROUP BY CUBE(1, 2)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    "q_ffill" ->
      """WITH b AS (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    CASE WHEN l_linenumber % 3 = 1 THEN NULL
        |         ELSE round(l_extendedprice, 2) END AS price_gappy
        |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'),
        |w AS (
        |  SELECT l_orderkey, l_linenumber, price_gappy,
        |    last_value(price_gappy IGNORE NULLS) OVER (
        |      PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS price_ffill,
        |    first_value(price_gappy IGNORE NULLS) OVER (
        |      PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS price_bfill
        |  FROM b)
        |SELECT l_orderkey, l_linenumber, price_gappy, price_ffill,
        |  coalesce(price_ffill, price_bfill) AS price_filled
        |FROM w""".stripMargin,
    "q_snapshot_diff" ->
      """WITH a AS (
        |  SELECT o_orderkey AS key_a, round(o_totalprice, 2) AS price_a
        |  FROM orders WHERE o_orderkey % 5 <> 0),
        |b AS (
        |  SELECT o_orderkey AS key_b,
        |    round(CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1
        |               ELSE o_totalprice END, 2) AS price_b
        |  FROM orders WHERE o_orderkey % 7 <> 0)
        |SELECT CASE WHEN key_a IS NULL THEN 'insert'
        |            WHEN key_b IS NULL THEN 'delete'
        |            WHEN price_a <> price_b THEN 'update'
        |            ELSE 'unchanged' END AS change,
        |  count(*) AS n, min(coalesce(key_a, key_b)) AS min_key,
        |  max(coalesce(key_a, key_b)) AS max_key
        |FROM a FULL OUTER JOIN b ON key_a = key_b
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_dedup_exact" ->
      """WITH g AS (SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keep_id
        |  FROM documents GROUP BY 1)
        |SELECT count(*) AS n_distinct_texts, CAST(sum(n) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT) AS n_redundant
        |FROM g""".stripMargin,
    "q_incremental_dedup" ->
      """WITH k AS (SELECT doc_id, source,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
        |  FROM documents),
        |c AS (SELECT DISTINCT nt FROM k WHERE doc_id % 2 = 0),
        |b AS (SELECT k.doc_id, k.source,
        |    (c.nt IS NOT NULL) AS in_corpus,
        |    min(k.doc_id) OVER (PARTITION BY k.nt) AS keep_id
        |  FROM k LEFT JOIN c ON k.nt = c.nt WHERE k.doc_id % 2 = 1)
        |SELECT source,
        |  CASE WHEN in_corpus THEN 'dup_corpus'
        |       WHEN doc_id <> keep_id THEN 'dup_batch'
        |       ELSE 'kept' END AS status,
        |  count(*) AS n, min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_array_funcs" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_split_to_array(text, '\s+') AS toks FROM documents)
        |SELECT doc_id,
        |  len(toks) AS n_toks,
        |  len(list_distinct(toks)) AS n_unique,
        |  array_to_string(list_slice(list_sort(list_distinct(toks)), 1, 3), '|')
        |    AS first3,
        |  list_max(list_transform(toks, x -> length(x))) AS max_len,
        |  len(list_filter(toks, x -> length(x) > 6)) AS n_long,
        |  CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sum_len
        |FROM t""".stripMargin,
    "q_dedup_wordset" ->
      """SELECT count(*) AS n, min(doc_id) AS keep_id, max(doc_id) AS max_id
        |FROM documents
        |GROUP BY array_to_string(list_sort(list_distinct(
        |  regexp_split_to_array(text, '\s+'))), ' ')
        |HAVING count(*) > 1 ORDER BY keep_id""".stripMargin,
    "q_token_count" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(regexp_split_to_array(text, '\s+'))) AS BIGINT) AS total_tokens,
        |  round(avg(len(regexp_split_to_array(text, '\s+'))), 2) AS avg_tokens
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_token_bpe" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS total_pieces,
        |  round(avg(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]'))), 2) AS avg_pieces
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_text_quality" ->
      """WITH t AS (SELECT doc_id, text, regexp_split_to_array(text, '\s+') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
        |  round(len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE), 4) AS ttr,
        |  round((length(text) - len(toks) + 1) / CAST(len(toks) AS DOUBLE), 2) AS avg_word_len,
        |  round(len(list_filter(toks, t -> t IN ('the','a','of','and','to'))) / CAST(len(toks) AS DOUBLE), 4) AS stopword_ratio
        |FROM t ORDER BY doc_id""".stripMargin,
    "q_lang_id" ->
      """WITH t AS (SELECT lang, regexp_split_to_array(text, '\s+') AS toks FROM documents),
        |s AS (SELECT lang,
        |  len(list_filter(toks, t -> t IN ('the','and','of','to','is'))) AS s_en,
        |  len(list_filter(toks, t -> t IN ('le','la','et','les','des'))) AS s_fr,
        |  len(list_filter(toks, t -> t IN ('el','los','las','una','es'))) AS s_es,
        |  len(list_filter(toks, t -> t IN ('der','die','das','und','ist'))) AS s_de
        |  FROM t),
        |p AS (SELECT lang, CASE
        |  WHEN greatest(s_en, s_fr, s_es, s_de) = 0 THEN 'unknown'
        |  WHEN s_en = greatest(s_en, s_fr, s_es, s_de) THEN 'en'
        |  WHEN s_fr = greatest(s_en, s_fr, s_es, s_de) THEN 'fr'
        |  WHEN s_es = greatest(s_en, s_fr, s_es, s_de) THEN 'es'
        |  ELSE 'de' END AS pred FROM s)
        |SELECT lang, pred, count(*) AS n FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id, list_reduce(
        |  list_prepend(CAST(0 AS BIGINT), list_transform(
        |    regexp_split_to_array(text, '\s+'),
        |    t -> CAST(ascii(t) * 131 + length(t) AS BIGINT))),
        |  (acc, x) -> (acc * 31 + x) % 1000003) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_vocab_topk" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents),
        |g AS (SELECT token, doc_id, count(*) AS n FROM t GROUP BY 1, 2)
        |SELECT token, CAST(sum(n) AS BIGINT) AS tf, count(*) AS df
        |FROM g GROUP BY 1 ORDER BY tf DESC, token LIMIT 20""".stripMargin,
    "q_bpe_pairs" ->
      """WITH w AS (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word
        |  FROM documents),
        |wf AS (SELECT word, count(*) AS wf FROM w
        |  WHERE length(word) >= 2 GROUP BY 1),
        |p AS (SELECT substring(word, CAST(i AS INT), 2) AS pair, wf
        |  FROM (SELECT word, wf, unnest(range(1, length(word))) AS i FROM wf))
        |SELECT pair, CAST(sum(wf) AS BIGINT) AS cnt
        |FROM p GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 30""".stripMargin,
    // the full N-step training loop (r14): DuckDB replays the same
    // recount → argmax → literal-replace iteration as unrolled CTEs
    "q_bpe_train" -> bpeTrainSql(20),
    // the serving half: the trained tokenizer's segmentation of every
    // corpus word (the loop's final vocab state), served engine-side
    // from the memoized artifact
    "q_bpe_encode" -> bpeEncodeSql(20),
    "q_rep_filter" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks
        |  FROM documents),
        |u1 AS (SELECT doc_id, w, count(*) AS c
        |  FROM (SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY 1, 2),
        |u AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_toks,
        |    CAST(max(c) AS BIGINT) AS max_tok_cnt FROM u1 GROUP BY 1),
        |bg0 AS (SELECT doc_id,
        |    toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1] AS bg
        |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t)),
        |b1 AS (SELECT doc_id, bg, count(*) AS c FROM bg0 GROUP BY 1, 2),
        |b AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |    CAST(max(c) AS BIGINT) AS max_bigram_cnt FROM b1 GROUP BY 1)
        |SELECT u.doc_id, n_toks, max_tok_cnt,
        |  coalesce(n_bigrams, 0) AS n_bigrams,
        |  coalesce(max_bigram_cnt, 0) AS max_bigram_cnt,
        |  (coalesce(max_bigram_cnt, 0) * 100 > coalesce(n_bigrams, 0) * 18
        |   OR max_tok_cnt * 100 > n_toks * 30) AS rep_flag
        |FROM u LEFT JOIN b USING (doc_id) ORDER BY u.doc_id""".stripMargin,
    "q_bm25" ->
      s"""WITH $Bm25ScoredCtes
        |SELECT doc_id, bm25, n_terms FROM bm
        |ORDER BY bm25 DESC, doc_id LIMIT 15""".stripMargin,
    // hybrid RRF retrieval ranking (r13, Cormack et al. 2009): both
    // legs truncated to their top-100 (the production formulation —
    // never a corpus-wide rank), reciprocal-rank fused over a full
    // outer join; a doc absent from one leg contributes only the
    // other leg's reciprocal
    "q_hybrid_rank" ->
      s"""WITH $Bm25ScoredCtes,
        |lex AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
        |  FROM (SELECT doc_id, bm25 FROM bm
        |        ORDER BY bm25 DESC, doc_id LIMIT 100)),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |qv AS (SELECT vec_id AS q_id, v AS qvec FROM e ORDER BY vec_id LIMIT 1),
        |cosd AS (SELECT e.vec_id AS doc_id,
        |    round(list_cosine_similarity(e.v, qv.qvec), 4) AS cos
        |  FROM e, qv WHERE e.vec_id <> qv.q_id),
        |dense AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY cos DESC, doc_id) AS dense_rank
        |  FROM (SELECT doc_id, cos FROM cosd
        |        ORDER BY cos DESC, doc_id LIMIT 100)),
        |f AS (SELECT coalesce(lex.doc_id, dense.doc_id) AS doc_id,
        |    lex_rank, dense_rank,
        |    round(coalesce(CAST(1 AS DOUBLE) / (60 + lex_rank), 0) +
        |          coalesce(CAST(1 AS DOUBLE) / (60 + dense_rank), 0), 6) AS rrf
        |  FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id),
        |r AS (SELECT doc_id, lex_rank, dense_rank, rrf,
        |    row_number() OVER (ORDER BY rrf DESC, doc_id) AS rn FROM f)
        |SELECT doc_id, lex_rank, dense_rank, rrf FROM r WHERE rn <= 15
        |ORDER BY doc_id""".stripMargin,
    // ANN-served hybrid retrieval (r14, verdict `weak` fix): the dense
    // leg runs through the multi-table hyperplane-LSH index instead of
    // a corpus scan; the emitted rows are the exact fusion (identical
    // SQL twin) plus the oracle-fixed top-k agreement claim.
    "q_hybrid_rank_ann" ->
      s"""WITH $Bm25ScoredCtes,
        |lex AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
        |  FROM (SELECT doc_id, bm25 FROM bm
        |        ORDER BY bm25 DESC, doc_id LIMIT 100)),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |qv AS (SELECT vec_id AS q_id, v AS qvec FROM e ORDER BY vec_id LIMIT 1),
        |cosd AS (SELECT e.vec_id AS doc_id,
        |    round(list_cosine_similarity(e.v, qv.qvec), 4) AS cos
        |  FROM e, qv WHERE e.vec_id <> qv.q_id),
        |dense AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY cos DESC, doc_id) AS dense_rank
        |  FROM (SELECT doc_id, cos FROM cosd
        |        ORDER BY cos DESC, doc_id LIMIT 100)),
        |f AS (SELECT coalesce(lex.doc_id, dense.doc_id) AS doc_id,
        |    lex_rank, dense_rank,
        |    round(coalesce(CAST(1 AS DOUBLE) / (60 + lex_rank), 0) +
        |          coalesce(CAST(1 AS DOUBLE) / (60 + dense_rank), 0), 6) AS rrf
        |  FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id),
        |r AS (SELECT doc_id, lex_rank, dense_rank, rrf,
        |    row_number() OVER (ORDER BY rrf DESC, doc_id) AS rn FROM f)
        |SELECT doc_id, lex_rank, dense_rank, rrf, TRUE AS recall_ok
        |FROM r WHERE rn <= 15
        |ORDER BY doc_id""".stripMargin,
    // RAG context assembly (r14): greedy whole-document packing of the
    // fused top-15 into a 400-token context budget, in fusion-score
    // order — the manifest a retrieval-augmented pipeline hands the
    // model
    "q_rag_context" ->
      s"""WITH $Bm25ScoredCtes,
        |lex AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
        |  FROM (SELECT doc_id, bm25 FROM bm
        |        ORDER BY bm25 DESC, doc_id LIMIT 100)),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |qv AS (SELECT vec_id AS q_id, v AS qvec FROM e ORDER BY vec_id LIMIT 1),
        |cosd AS (SELECT e.vec_id AS doc_id,
        |    round(list_cosine_similarity(e.v, qv.qvec), 4) AS cos
        |  FROM e, qv WHERE e.vec_id <> qv.q_id),
        |dense AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY cos DESC, doc_id) AS dense_rank
        |  FROM (SELECT doc_id, cos FROM cosd
        |        ORDER BY cos DESC, doc_id LIMIT 100)),
        |f AS (SELECT coalesce(lex.doc_id, dense.doc_id) AS doc_id,
        |    round(coalesce(CAST(1 AS DOUBLE) / (60 + lex_rank), 0) +
        |          coalesce(CAST(1 AS DOUBLE) / (60 + dense_rank), 0), 6) AS rrf
        |  FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id),
        |r AS (SELECT doc_id, rrf,
        |    row_number() OVER (ORDER BY rrf DESC, doc_id) AS rn FROM f),
        |top AS (SELECT doc_id, rrf FROM r WHERE rn <= 15),
        |dl2 AS (SELECT doc_id,
        |  CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_toks
        |  FROM documents),
        |c AS (SELECT CAST(row_number() OVER
        |      (ORDER BY rrf DESC, t.doc_id) AS INT) AS ctx_rank,
        |    t.doc_id AS doc_id, n_toks,
        |    sum(n_toks) OVER (ORDER BY rrf DESC, t.doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum_toks
        |  FROM top t JOIN dl2 USING (doc_id))
        |SELECT ctx_rank, doc_id, n_toks, CAST(cum_toks AS BIGINT) AS cum_toks
        |FROM c WHERE cum_toks <= 400 ORDER BY ctx_rank""".stripMargin,
    "q_inverted_index" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(regexp_split_to_array(text, '\s+')) AS term FROM documents)
        |SELECT term, count(DISTINCT doc_id) AS df, count(*) AS tf,
        |  array_to_string((list_sort(list(DISTINCT doc_id)))[1:16], ',') AS postings
        |FROM t GROUP BY 1 HAVING count(DISTINCT doc_id) >= 10
        |ORDER BY term""".stripMargin,
    "q_heavy_hitters" ->
      """WITH t AS (SELECT unnest(regexp_split_to_array(text, '\s+')) AS token
        |  FROM documents)
        |SELECT token, count(*) AS tf FROM t
        |GROUP BY 1 ORDER BY tf DESC, token LIMIT 10""".stripMargin,
    "q_pii_scrub" ->
      """WITH r AS (SELECT source, text,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g'),
        |    '\b\d{6,}\b', '<ID>', 'g'),
        |    '\bcustomer\b', '<TERM>', 'g') AS redacted
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN text <> redacted THEN 1 ELSE 0 END) AS BIGINT)
        |    AS docs_redacted,
        |  CAST(sum(len(regexp_extract_all(text, '\bcustomer\b'))) AS BIGINT)
        |    AS n_matches,
        |  CAST(sum(length(text)) AS BIGINT) AS chars_before,
        |  CAST(sum(length(redacted)) AS BIGINT) AS chars_after
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stratified_sample" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |r AS (SELECT lang, doc_id, row_number() OVER (
        |  PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT r.lang AS lang, r.doc_id AS doc_id
        |FROM r JOIN c ON r.lang = c.lang
        |WHERE rn <= CAST(ceil(n / 10.0) AS BIGINT)
        |ORDER BY r.lang, r.doc_id""".stripMargin,
    "q_sample_hash" ->
      """SELECT lang, doc_id FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
        |  % 1000 < 100
        |ORDER BY lang, doc_id""".stripMargin,
    // 13 hex chars = 52 bits: double-exact on the Spark side, BIGINT
    // here — the two cuts agree bit-for-bit
    "q_sample_topk" ->
      """WITH r AS (SELECT lang, doc_id, row_number() OVER (
        |  PARTITION BY lang ORDER BY
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT),
        |    doc_id) AS rn
        |  FROM documents)
        |SELECT lang, doc_id FROM r WHERE rn <= 5 ORDER BY lang, doc_id""".stripMargin,
    "q_pack_sequences" ->
      """WITH t AS (SELECT source, doc_id,
        |  len(regexp_split_to_array(text, '\s+')) AS n FROM documents),
        |c AS (SELECT source, doc_id, n, sum(n) OVER (
        |  PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT source, CAST(floor((cum - n) / 256.0) AS BIGINT) AS seq_id,
        |  count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS seq_tokens,
        |  min(doc_id) AS first_doc
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // chunks = ceil(max(0, n-64)/48) + 1; last chunk may be short
    "q_chunk_docs" ->
      """WITH t AS (SELECT doc_id,
        |  len(regexp_split_to_array(text, '\s+')) AS n FROM documents),
        |c AS (SELECT doc_id, n, unnest(generate_series(0,
        |  CAST(ceil(greatest(n - 64, 0) / 48.0) AS INT))) AS chunk_id FROM t)
        |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
        |  CAST(least(64, n - chunk_id * 48) AS INT) AS chunk_tokens
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "q_quality_prune" ->
      """WITH t AS (SELECT source, doc_id,
        |  len(list_distinct(regexp_split_to_array(text, '\s+'))) /
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS DOUBLE) AS ttr
        |  FROM documents),
        |m AS (SELECT source, median(ttr) AS med FROM t GROUP BY 1)
        |SELECT t.source AS source, count(*) AS n_kept,
        |  round(avg(t.ttr), 6) AS avg_ttr_kept,
        |  min(t.doc_id) AS min_kept, max(t.doc_id) AS max_kept
        |FROM t JOIN m ON t.source = m.source WHERE t.ttr >= m.med
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_mixture_sample" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        |a AS (SELECT avg(n) AS avg_n FROM c),
        |q AS (SELECT source, least(n,
        |  CAST(ceil(sqrt(n * avg_n) * 0.8) AS BIGINT)) AS k FROM c, a),
        |r AS (SELECT source, doc_id, row_number() OVER (
        |  PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT r.source AS source, r.doc_id AS doc_id
        |FROM r JOIN q ON r.source = q.source WHERE rn <= k
        |ORDER BY r.source, r.doc_id""".stripMargin,
    "q_ngram_novelty" ->
      """WITH t AS (SELECT doc_id, source,
        |  regexp_split_to_array(text, '\s+') AS toks FROM documents),
        |g AS (SELECT DISTINCT doc_id, source,
        |  array_to_string(toks[i.g : i.g + 2], ' ') AS gram
        |  FROM t, LATERAL (SELECT unnest(generate_series(1,
        |    greatest(0, len(toks) - 2))) AS g) i),
        |f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY 1),
        |novel AS (SELECT first_doc AS doc_id, count(*) AS novel_n
        |  FROM f GROUP BY 1),
        |tot AS (SELECT doc_id, source, count(*) AS tot_n FROM g GROUP BY 1, 2),
        |d AS (SELECT tot.source,
        |  CAST(coalesce(novel.novel_n, 0) AS DOUBLE) / tot.tot_n AS nov
        |  FROM tot LEFT JOIN novel USING (doc_id))
        |SELECT source, count(*) AS n_docs, round(avg(nov), 4) AS avg_novelty,
        |  CAST(sum(CASE WHEN nov = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_all_novel,
        |  CAST(sum(CASE WHEN nov < 0.25 THEN 1 ELSE 0 END) AS BIGINT) AS n_dupey
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_epoch_shuffle" ->
      """SELECT doc_id,
        |  md5('1:' || CAST(doc_id AS VARCHAR)) AS skey
        |FROM documents ORDER BY skey""".stripMargin,
    // exact global token-budget prefix cut in epoch-1 shuffle order;
    // the engine's two-pass distributed prefix scan must reproduce
    // the window-cumsum answer exactly (same md5 order, same
    // floor(total·0.4) budget)
    "q_token_budget" ->
      """WITH t AS (SELECT doc_id, source,
        |  len(regexp_split_to_array(text, '\s+')) AS n,
        |  md5('1:' || CAST(doc_id AS VARCHAR)) AS skey FROM documents),
        |b AS (SELECT CAST(floor(sum(n) * 0.4) AS BIGINT) AS budget FROM t),
        |c AS (SELECT doc_id, source, n, sum(n) OVER (
        |  ORDER BY skey, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM t)
        |SELECT source, count(*) AS n_docs_kept,
        |  CAST(sum(n) AS BIGINT) AS n_tokens_kept
        |FROM c, b WHERE cum <= budget GROUP BY 1 ORDER BY 1""".stripMargin,
    // composed corpus-cleaning lineage (r14): exact dedup → near-dup
    // canonical drop (J >= 9/10) → decontam (bench docs + 8-gram hits)
    // → integer-exact quality prune → 60% token-budget cut; the oracle
    // replays the whole chain from raw text and pins every stage
    // boundary's (count, token mass, id checksum)
    "q_corpus_pipeline" ->
      """WITH t AS MATERIALIZED (SELECT doc_id,
        |    regexp_split_to_array(text, '\s+') AS toks,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
        |  FROM documents),
        |s1 AS MATERIALIZED (SELECT doc_id, toks, n FROM (
        |    SELECT doc_id, toks, n,
        |      min(doc_id) OVER (PARTITION BY nt) AS keep FROM t)
        |  WHERE doc_id = keep),
        |g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS s
        |  FROM s1 WHERE len(toks) >= 3),
        |tt AS (SELECT doc_id, unnest(s) AS h, len(s) AS ns FROM g),
        |px AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    a.ns AS na, b.ns AS nb, count(*) AS ix
        |  FROM tt a JOIN tt b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4),
        |drop2 AS (SELECT DISTINCT b_id FROM px WHERE 10 * ix >= 9 * (na + nb - ix)),
        |s2 AS MATERIALIZED (SELECT * FROM s1
        |  WHERE doc_id NOT IN (SELECT b_id FROM drop2)),
        |gr AS (SELECT doc_id, array_to_string(toks[i.g : i.g + 7], ' ') AS gram
        |  FROM t, LATERAL (SELECT unnest(generate_series(1,
        |    greatest(0, len(toks) - 7))) AS g) i),
        |bench AS (SELECT DISTINCT gram FROM gr WHERE doc_id < 25),
        |bad AS (SELECT DISTINCT gr.doc_id FROM gr
        |  JOIN bench USING (gram) WHERE gr.doc_id >= 25),
        |s3 AS MATERIALIZED (SELECT * FROM s2 WHERE doc_id >= 25
        |  AND doc_id NOT IN (SELECT doc_id FROM bad)),
        |s4 AS MATERIALIZED (SELECT * FROM s3
        |  WHERE n >= 5 AND n <= 2000 AND len(list_distinct(toks)) * 2 >= n),
        |b5 AS (SELECT CAST(floor(sum(n) * 0.6) AS BIGINT) AS budget FROM s4),
        |c5 AS (SELECT doc_id, n, sum(n) OVER (
        |  ORDER BY md5('1:' || CAST(doc_id AS VARCHAR)), doc_id
        |  ROWS UNBOUNDED PRECEDING) AS cum FROM s4),
        |s5 AS (SELECT doc_id, n FROM c5, b5 WHERE cum <= budget)
        |SELECT * FROM (
        |  SELECT 0 AS stage, 'raw' AS stage_name, count(*) AS n_docs,
        |    CAST(coalesce(sum(n), 0) AS BIGINT) AS n_tokens,
        |    CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum FROM t
        |  UNION ALL SELECT 1, 'exact_dedup', count(*),
        |    CAST(coalesce(sum(n), 0) AS BIGINT),
        |    CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM s1
        |  UNION ALL SELECT 2, 'near_dup_drop', count(*),
        |    CAST(coalesce(sum(n), 0) AS BIGINT),
        |    CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM s2
        |  UNION ALL SELECT 3, 'decontam', count(*),
        |    CAST(coalesce(sum(n), 0) AS BIGINT),
        |    CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM s3
        |  UNION ALL SELECT 4, 'quality', count(*),
        |    CAST(coalesce(sum(n), 0) AS BIGINT),
        |    CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM s4
        |  UNION ALL SELECT 5, 'token_budget', count(*),
        |    CAST(coalesce(sum(n), 0) AS BIGINT),
        |    CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM s5)
        |ORDER BY stage""".stripMargin,
    "q_decontaminate" -> DecontamSql,
    // bloom-pruned decontamination is EXACT (no false negatives +
    // exact confirm) — it must hash-match the same oracle
    "q_decontam_bloom" -> DecontamSql,
    // DSIR importance resampling (r13, Xie et al. 2023): hashed
    // uni+bigram buckets via md5 mod 128 (engine-portable), smoothed
    // target(lang='en')/raw log-likelihood-ratio scores, deterministic
    // Gumbel-top-20 from md5(doc_id) — DuckDB recomputes the entire
    // recipe from raw text
    "q_dsir_sample" ->
      """WITH d AS (SELECT doc_id, lang,
        |    regexp_split_to_array(text, '\s+') AS toks FROM documents),
        |g0 AS (SELECT doc_id, lang, unnest(toks ||
        |    list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i + 1])) AS gram FROM d),
        |g AS (SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT) % 128 AS b
        |  FROM g0),
        |rawc AS (SELECT b, count(*) AS rc FROM g GROUP BY b),
        |tgtc AS (SELECT b, count(*) AS tc FROM g WHERE lang = 'en' GROUP BY b),
        |tot AS (SELECT count(*) AS r_n,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_n FROM g),
        |lr AS (SELECT rawc.b,
        |    ln(((coalesce(tc, 0) + 0.5) / (t_n + 64.0)) /
        |       ((rc + 0.5) / (r_n + 64.0))) AS lw
        |  FROM rawc LEFT JOIN tgtc ON rawc.b = tgtc.b CROSS JOIN tot),
        |dc AS (SELECT doc_id, b, count(*) AS c FROM g GROUP BY 1, 2),
        |docw AS (SELECT dc.doc_id, sum(c * lw) AS logw
        |  FROM dc JOIN lr ON dc.b = lr.b GROUP BY 1),
        |ky AS (SELECT doc_id, logw, logw + (-ln(-ln(
        |    (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) + 1) / 4294967296.0))) AS gk FROM docw),
        |r AS (SELECT doc_id, logw,
        |    row_number() OVER (ORDER BY gk DESC, doc_id) AS rn FROM ky)
        |SELECT doc_id, round(logw, 6) AS logw FROM r WHERE rn <= 20
        |ORDER BY doc_id""".stripMargin,
    "q_rep_signals" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
        |wc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
        |top AS (SELECT doc_id, max(c) AS top_c FROM wc GROUP BY 1),
        |base AS (SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
        |  len(list_distinct(toks)) AS n_distinct,
        |  len(toks) - 1 AS n_bigrams,
        |  len(list_distinct(list_transform(generate_series(1, len(toks) - 1),
        |    i -> toks[i] || chr(31) || toks[i + 1]))) AS n_db
        |  FROM t)
        |SELECT base.doc_id AS doc_id, n_tokens,
        |  round(1 - n_distinct / CAST(n_tokens AS DOUBLE), 4) AS dup_word_frac,
        |  round(top_c / CAST(n_tokens AS DOUBLE), 4) AS top_word_frac,
        |  CASE WHEN n_bigrams > 0 THEN
        |    round(1 - n_db / CAST(n_bigrams AS DOUBLE), 4) END AS dup_bigram_frac
        |FROM base JOIN top USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q_tfidf" ->
      """WITH tok AS (SELECT doc_id,
        |  unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents),
        |td AS (SELECT token, doc_id, count(*) AS n FROM tok GROUP BY 1, 2),
        |s AS (SELECT token, CAST(sum(n) AS BIGINT) AS tf, count(*) AS df FROM td GROUP BY 1),
        |nd AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT token, tf, df,
        |  round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
        |FROM s, nd ORDER BY tfidf DESC, token LIMIT 20""".stripMargin,
    "q_stream_join" ->
      s"""WITH e AS (SELECT user_id, date_trunc('second', ts) AS ts,
        |  lower(event_type) AS et FROM events
        |  WHERE CAST(ts AS DATE) < DATE '${operators.PipelineQueries.JoinCutoff}'),
        |p AS (SELECT user_id, ts FROM e WHERE et = 'purchase'),
        |v AS (SELECT user_id, ts FROM e WHERE et IN ('view', 'click')),
        |j AS (SELECT p.user_id AS user_id, p.ts AS p_ts FROM p JOIN v
        |  ON p.user_id = v.user_id
        |  AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts)
        |SELECT strftime(p_ts, '%Y-%m-%d') AS dt, count(*) AS n_pairs,
        |  count(DISTINCT user_id) AS n_buyers
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_csv_scan" ->
      """SELECT coalesce(event_type, '') AS event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  round(sum(coalesce(value, 0)), 2) AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_schema_evolution" ->
      """SELECT CASE WHEN o_orderkey % 2 = 0 THEN o_orderpriority
        |    ELSE '<missing>' END AS priority,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_orc_scan" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-07-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_ngram_jaccard" -> NgramJaccardSql,
    // substring-level dedup (r12, Lee et al. 2021 ExactSubstr at
    // token-window grain): the span table (see [[DupSubstrSpanCtes]]).
    "q_dup_substrings" ->
      s"""WITH $DupSubstrSpanCtes
        |SELECT doc_id, span_start, span_end FROM spans
        |ORDER BY doc_id, span_start""".stripMargin,
    // incremental substring dedup (r14): spans of BATCH (odd-id)
    // windows whose window text the indexed corpus (even ids) already
    // contains — the oracle probes the same membership on window
    // STRINGS (the engine's fp is xxhash64 of the window, the
    // repo-wide fingerprint idiom)
    "q_dup_substrings_incremental" ->
      """WITH d AS (SELECT doc_id,
        |    regexp_split_to_array(text, '\s+') AS toks FROM documents),
        |wl AS (SELECT doc_id, list_transform(range(1, len(toks) - 6),
        |    i -> struct_pack(pos := i - 1,
        |      win := array_to_string(toks[i:i+7], ' '))) AS ws
        |  FROM d WHERE len(toks) >= 8),
        |wins AS (SELECT doc_id, unnest(ws) AS u FROM wl),
        |flat AS (SELECT doc_id, u.pos AS pos, u.win AS win FROM wins),
        |cw AS (SELECT DISTINCT win FROM flat WHERE doc_id % 2 = 0),
        |p AS (SELECT doc_id, pos FROM flat JOIN cw USING (win)
        |  WHERE doc_id % 2 = 1),
        |g AS (SELECT doc_id, pos, CASE WHEN lag(pos) OVER w IS NULL
        |    OR pos - lag(pos) OVER w > 7 THEN 1 ELSE 0 END AS ni
        |  FROM p WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |i AS (SELECT doc_id, pos, sum(ni) OVER (
        |    PARTITION BY doc_id ORDER BY pos) AS island FROM g)
        |SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end
        |FROM i GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,
    // r13, the operation's second half: CUT the duplicated spans.
    // Every distinct span text keeps its globally-first occurrence
    // (min (doc_id, span_start)); other occurrences are removed and
    // each affected document is re-emitted with those token ranges
    // cut. DuckDB performs the same string surgery over the same span
    // CTE: slice out span text, rank occurrences, anti-range-join the
    // token positions, reassemble with string_agg.
    "q_dup_substrings_clean" ->
      s"""WITH $DupSubstrSpanCtes,
        |st AS (SELECT sp.doc_id, sp.span_start, sp.span_end,
        |    array_to_string(list_slice(d.toks, sp.span_start + 1,
        |      sp.span_end + 1), ' ') AS stext
        |  FROM spans sp JOIN d ON d.doc_id = sp.doc_id),
        |k AS (SELECT doc_id, span_start, span_end, row_number() OVER (
        |    PARTITION BY stext ORDER BY doc_id, span_start) AS rn FROM st),
        |rem AS (SELECT doc_id, span_start, span_end FROM k WHERE rn > 1),
        |aff AS (SELECT DISTINCT doc_id FROM spans),
        |tl AS (SELECT d.doc_id, d.toks,
        |    list_transform(range(1, len(d.toks) + 1),
        |      i -> struct_pack(pos := i - 1, tok := d.toks[i])) AS ts
        |  FROM d JOIN aff USING (doc_id)),
        |tp AS (SELECT doc_id, unnest(ts) AS u FROM tl),
        |tok AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM tp),
        |kept AS (SELECT t.doc_id, t.pos, t.tok FROM tok t
        |  WHERE NOT EXISTS (SELECT 1 FROM rem r WHERE r.doc_id = t.doc_id
        |    AND t.pos BETWEEN r.span_start AND r.span_end)),
        |ca AS (SELECT doc_id, count(*) AS n_kept,
        |    string_agg(tok, ' ' ORDER BY pos) AS clean_text
        |  FROM kept GROUP BY doc_id)
        |SELECT tl.doc_id, coalesce(ca.clean_text, '') AS clean_text,
        |  len(tl.toks) - coalesce(ca.n_kept, 0) AS n_removed
        |FROM tl LEFT JOIN ca USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // engine side is prefix-filtered over shingle HASHES; the oracle
    // is the definition over trigram STRINGS — |∩| via the shingle
    // equi-join count (a pair with zero shared shingles cannot reach
    // J >= 0.9), |∪| = na + nb − |∩|, integer-math threshold
    // 10|∩| >= 9|∪|. Hash-set and string-set cardinalities agree
    // (64-bit collisions ~1e-11).
    "q_simjoin_prefix" ->
      """WITH d AS (SELECT doc_id,
        |    regexp_split_to_array(text, '\s+') AS toks FROM documents),
        |g AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS s
        |  FROM d WHERE len(toks) >= 3),
        |t AS (SELECT doc_id, unnest(s) AS h, len(s) AS n FROM g),
        |i AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    a.n AS na, b.n AS nb, count(*) AS ix
        |  FROM t a JOIN t b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT a_id, b_id,
        |  round(ix / CAST(na + nb - ix AS DOUBLE), 6) AS jaccard
        |FROM i WHERE 10 * ix >= 9 * (na + nb - ix)
        |ORDER BY a_id, b_id""".stripMargin,
    // streaming incremental near-dup: the accumulated batch-by-batch
    // manifest must equal the all-pairs J >= 1/2 join — each pair is
    // found exactly once, in the later doc's batch, so streaming
    // maintenance provably loses nothing vs a full re-dedup
    "q_stream_neardup" -> ExactHalfJaccardSql,
    // accuracy-gated MinHash+LSH dedup (r11, formerly rows-only +
    // claim): the engine runs the real 16-perm/4-band funnel, measures
    // its recall vs the exact J >= 1/2 ground truth, and emits the
    // exact pairs + recall_ok, which the oracle fixes at TRUE — a
    // banding regression hash-mismatches AND trips the Verify claim
    // gate. precision_ok (r12) pins found ⊆ exact: structural today
    // (candidates are exact-verified before emission), claimed so a
    // verifier/threshold drift fails loudly instead of silently.
    "q_minhash_dedup" ->
      s"""WITH x AS ($ExactHalfJaccardSql)
        |SELECT a_id, b_id, jaccard, TRUE AS recall_ok,
        |  TRUE AS precision_ok FROM x
        |ORDER BY a_id, b_id""".stripMargin,
    // accuracy-gated SimHash dedup (r11, formerly rows-only + claim),
    // at per-source grain so the gate is non-empty at every SF (exact
    // text dups exist only at sf0.1): DuckDB pins the per-source text
    // statistics; collide_ok (every same-(source,text) dup group
    // fingerprints to ONE simhash — kernel determinism) and
    // precision_ok (every hamming-0 collision group has min pairwise
    // exact trigram jaccard >= 0.5, measured >= 0.954 and ACTIVE at
    // all SFs) are oracle-fixed TRUE
    "q_simhash" ->
      """WITH g AS (SELECT source, text, count(*) AS c
        |  FROM documents GROUP BY source, text)
        |SELECT source, count(*) AS n_texts,
        |  CAST(sum(c) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
        |  TRUE AS collide_ok, TRUE AS precision_ok
        |FROM g GROUP BY source ORDER BY source""".stripMargin,
    // directed shingle-containment at C >= 9/10 — the sub-document
    // duplication primitive; oracle is the definitional directed
    // intersection-over-|a| over distinct trigram shingles
    "q_containment_join" ->
      """WITH d AS (SELECT doc_id,
        |    regexp_split_to_array(text, '\s+') AS toks FROM documents),
        |g AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS s
        |  FROM d WHERE len(toks) >= 3),
        |t AS (SELECT doc_id, unnest(s) AS h, len(s) AS n FROM g),
        |i AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    a.n AS na, count(*) AS ix
        |  FROM t a JOIN t b ON a.h = b.h AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2, 3)
        |SELECT a_id, b_id, round(ix / CAST(na AS DOUBLE), 6) AS containment
        |FROM i WHERE 10 * ix >= 9 * na
        |ORDER BY a_id, b_id""".stripMargin,
    // incremental near-dup: batch (odd doc_ids) similarity-joined
    // against the corpus (even doc_ids) at exact J >= 1/2 — the
    // engine side is the two-sided corpus-df prefix filter; the
    // oracle is the definitional cross-parity trigram jaccard
    "q_simjoin_incremental" ->
      """WITH d AS (SELECT doc_id,
        |    regexp_split_to_array(text, '\s+') AS toks FROM documents),
        |g AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS s
        |  FROM d WHERE len(toks) >= 3),
        |t AS (SELECT doc_id, unnest(s) AS h, len(s) AS n FROM g),
        |i AS (SELECT a.doc_id AS corpus_id, b.doc_id AS batch_id,
        |    a.n AS na, b.n AS nb, count(*) AS ix
        |  FROM t a JOIN t b ON a.h = b.h
        |    AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        |  GROUP BY 1, 2, 3, 4)
        |SELECT corpus_id, batch_id,
        |  round(ix / CAST(na + nb - ix AS DOUBLE), 6) AS jaccard
        |FROM i WHERE 2 * ix >= (na + nb - ix)
        |ORDER BY corpus_id, batch_id""".stripMargin,
    // triangle count via the definitional 3-way join over the
    // near-dup edge list (engine side is the degree-ordered
    // wedge-closing formulation — same count, O(|E|^1.5) wedges)
    "q_triangle_count" ->
      s"""WITH pairs AS ($NgramJaccardSql),
        |e AS (SELECT a_id AS a, b_id AS b FROM pairs),
        |deg AS (SELECT id, count(*) AS deg FROM
        |    (SELECT a AS id FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
        |w AS (SELECT CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges FROM deg),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
        |  FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
        |SELECT n.n_edges, w.n_wedges, t.n_triangles,
        |  round(CASE WHEN w.n_wedges > 0
        |    THEN t.n_triangles * 3.0 / w.n_wedges ELSE 0.0 END, 6) AS transitivity
        |FROM n, w, t""".stripMargin,
    // accuracy-gated (r9, formerly rows-only): the engine emits the
    // EXACT per-source-pair trigram-shingle-set jaccard (oracle pins
    // it by hash) plus the within_tol claim on the 16-perm signature
    // estimate (oracle fixes TRUE); trigram construction mirrors the
    // q_simjoin_prefix oracle, keyed by source with DISTINCT shingles
    "q_source_minhash" ->
      """WITH d AS (SELECT source,
        |    regexp_split_to_array(text, '\s+') AS toks FROM documents),
        |g AS (SELECT source,
        |    unnest(list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS h
        |  FROM d WHERE len(toks) >= 3),
        |s AS (SELECT DISTINCT source, h FROM g),
        |n AS (SELECT source, count(*) AS n FROM s GROUP BY 1),
        |i AS (SELECT a.source AS a_src, b.source AS b_src, count(*) AS ix
        |  FROM s a JOIN s b ON a.h = b.h AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT na.source AS a_src, nb.source AS b_src,
        |  round(coalesce(i.ix, 0) /
        |    CAST(na.n + nb.n - coalesce(i.ix, 0) AS DOUBLE), 6) AS exact_jaccard,
        |  TRUE AS within_tol
        |FROM n na JOIN n nb ON na.source < nb.source
        |LEFT JOIN i ON i.a_src = na.source AND i.b_src = nb.source
        |ORDER BY 1, 2""".stripMargin,
    // per-cluster BFS radius from the keeper — components via the
    // same closure as q_dup_clusters, then a bounded breadth walk
    // (d < 64 — the SAME bound as the engine's clusterRadius
    // MaxRounds, so oracle and engine can only diverge by failing
    // loudly, never by silent truncation; min(d) per node = shortest
    // distance); engine side is the iterative frontier loop
    "q_cluster_radius" ->
      s"""WITH RECURSIVE pairs AS MATERIALIZED ($NgramJaccardSql),
        |e AS MATERIALIZED (SELECT a_id AS x, b_id AS y FROM pairs
        |  UNION ALL SELECT b_id, a_id FROM pairs),
        |reach(id, r) AS (
        |  SELECT x, x FROM e
        |  UNION
        |  SELECT e.x, reach.r FROM e JOIN reach ON e.y = reach.id),
        |comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
        |walk(comp, id, d) AS (
        |  SELECT comp, comp, 0 FROM (SELECT DISTINCT comp FROM comp)
        |  UNION
        |  SELECT w.comp, e.y, w.d + 1 FROM walk w JOIN e ON e.x = w.id
        |  WHERE w.d < 64),
        |dist AS (SELECT comp, id, min(d) AS d FROM walk GROUP BY 1, 2)
        |SELECT comp AS keep_id, CAST(count(*) AS BIGINT) AS n_members,
        |  CAST(max(d) AS BIGINT) AS radius, round(avg(d), 6) AS avg_dist
        |FROM dist GROUP BY 1 ORDER BY 1""".stripMargin,
    // components via transitive closure: reach(id, r) = ids reachable
    // from id over the symmetrized pair edges; comp = min(reachable)
    "q_dup_clusters" ->
      s"""WITH RECURSIVE pairs AS MATERIALIZED ($NgramJaccardSql),
        |e AS MATERIALIZED (SELECT a_id AS a, b_id AS b FROM pairs
        |  UNION ALL SELECT b_id, a_id FROM pairs),
        |reach(id, r) AS (
        |  SELECT a, a FROM e
        |  UNION
        |  SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.id),
        |comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id)
        |SELECT comp AS keep_id, count(*) AS n_members, max(id) AS max_id
        |FROM comp GROUP BY 1 ORDER BY keep_id""".stripMargin,
    "q_media_stats" ->
      """WITH m AS (SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  100 + doc_id % 50 AS n_bytes FROM documents)
        |SELECT kind, count(*) AS n_media,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(min(n_bytes) AS INT) AS min_bytes,
        |  CAST(max(n_bytes) AS INT) AS max_bytes
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_frame_sample" ->
      """SELECT doc_id,
        |  CAST((1000 + doc_id % 9000) // 1000 + 1 AS BIGINT) AS n_frames,
        |  CAST(((1000 + doc_id % 9000) // 1000) * 1000 AS BIGINT) AS last_ts_ms
        |FROM documents WHERE doc_id % 3 = 2 ORDER BY doc_id""".stripMargin,
    // payload byte i = (doc_id*31 + i*7) mod 256; stub features scale
    // by 1/256 (exact dyadic) ⇒ feat_sum = sum(bytes)/256 exactly
    "q_media_features" ->
      """WITH m AS (SELECT doc_id, 100 + doc_id % 50 AS len,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind
        |  FROM documents)
        |SELECT doc_id AS media_id, kind, CAST(len AS INT) AS n_bytes,
        |  round(list_sum(list_transform(generate_series(0, CAST(len AS BIGINT) - 1),
        |    i -> CAST((doc_id * 31 + i * 7) % 256 AS DOUBLE))) / 256.0, 4) AS feat_sum
        |FROM m ORDER BY media_id""".stripMargin,
    // exact payload dedup (r13): the engine groups by the payload byte
    // VALUE; the oracle predicts the classes from doc_id arithmetic
    // because the dedup corpus's payload is a pure function of
    // (g, v) = (doc_id % 17, (doc_id DIV 17) % 3) with a class-id tail
    // byte making cross-class payloads byte-distinct by construction.
    "q_media_dedup" ->
      """SELECT min(doc_id) AS media_id, count(*) AS n_copies
        |FROM documents
        |GROUP BY doc_id % 17, CAST(FLOOR(doc_id / 17) AS BIGINT) % 3
        |ORDER BY media_id""".stripMargin,
    // perceptual near-dup (r13): the engine runs the dHash banding
    // funnel on the bounded slice, measures structural recall (= 1.0:
    // a <= 6-bit pair always shares >= 2 of 8 bands by pigeonhole) and
    // found-⊆-truth precision, and emits the formula truth (same
    // pattern group) + the oracle-fixed claims.
    // the slice modulus scales with corpus size (r14 advisor) so the
    // funnel slice stays O(1) ids — both engines derive it from the
    // same count
    "q_media_neardup" ->
      """WITH p AS (SELECT GREATEST(7, CAST(CEIL(count(*) / 120.0) AS BIGINT)) AS m
        |  FROM documents),
        |m AS (SELECT doc_id AS id, doc_id % 17 AS g FROM documents, p
        |  WHERE doc_id % p.m = 0 OR doc_id < 120)
        |SELECT a.id AS a_id, b.id AS b_id,
        |  TRUE AS recall_ok, TRUE AS precision_ok
        |FROM m a JOIN m b ON a.g = b.g AND a.id < b.id
        |ORDER BY a_id, b_id""".stripMargin,
    "q_bucketed_join" ->
      """SELECT o_orderkey, count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(max(o_totalprice), 2) AS total_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_knn_batch" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e ORDER BY vec_id LIMIT 5),
        |s AS (SELECT q.q_id, e.vec_id,
        |  round(list_cosine_similarity(e.v, q.qv), 4) AS cos
        |  FROM e, q WHERE e.vec_id <> q.q_id),
        |r AS (SELECT q_id, vec_id, cos,
        |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
        |  FROM s)
        |SELECT q_id, vec_id, cos FROM r WHERE rn <= 5
        |ORDER BY q_id, cos DESC, vec_id""".stripMargin,
    "q_knn_batch_agg" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e ORDER BY vec_id LIMIT 5),
        |s AS (SELECT q.q_id, e.vec_id,
        |  round(list_cosine_similarity(e.v, q.qv), 4) AS cos
        |  FROM e, q WHERE e.vec_id <> q.q_id),
        |r AS (SELECT q_id, vec_id, cos,
        |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
        |  FROM s)
        |SELECT q_id, vec_id, cos FROM r WHERE rn <= 5
        |ORDER BY q_id, cos DESC, vec_id""".stripMargin,
    // the connector's per-day closed-form aggregate pushdown, pinned
    // by DuckDB recomputing the same published generator arithmetic
    // (id → trunc(id·step) micros → day / formatted second) — the
    // pushdown's constants are cross-checked, not self-certified.
    // Constants: n=50000, days=7, start=2025-09-01T00:00:00Z
    // (epoch micros 1756684800000000), step = 7·86400·10⁶/50000 µs;
    // every id·step product is an exact integer below 2^53, so the
    // double arithmetic is exact in both engines.
    // JL projection audit, graduated (r10): the engine runs the full
    // projection + per-label norm-ratio check; the oracle pins the
    // per-label nonzero-norm counts and fixes the JL claim at TRUE
    "q_rand_project" ->
      """SELECT label, count(*) AS n, TRUE AS recall_ok
        |FROM embeddings
        |WHERE sqrt(list_sum(list_transform(
        |  CAST(embedding AS DOUBLE[]), x -> x * x))) > 0
        |GROUP BY label ORDER BY label""".stripMargin,
    "q_dsv2_daily" ->
      """WITH ids AS (SELECT unnest(range(0, 50000)) AS id),
        |e AS (SELECT CAST(trunc(id * (7.0 * 86400 * 1000000.0 / 50000)) AS BIGINT) AS us
        |  FROM ids),
        |d AS (SELECT us // 86400000000 AS day,
        |  strftime(make_timestamp(1756684800000000 + (us // 1000000) * 1000000),
        |    '%Y-%m-%dT%H:%M:%S') || 'Z' AS ts FROM e)
        |SELECT CAST(day AS INT) AS day, count(*) AS n_events,
        |  min(ts) AS min_ts, max(ts) AS max_ts
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    // oracle-gated DSv2 row scan (r11, the last formerly-no_oracle
    // row): per-day rollup of the FILTERED connector read, recomputed
    // by DuckDB in closed form through the pushed event_ts filter;
    // bits_ok (oracle-fixed TRUE) carries the engine-side full-width
    // row comparison against the independent column-expression twin
    "q_dsv2_scan" ->
      """WITH ids AS (SELECT unnest(range(0, 50000)) AS id),
        |e AS (SELECT CAST(trunc(id * (7.0 * 86400 * 1000000.0 / 50000)) AS BIGINT) AS us
        |  FROM ids),
        |d AS (SELECT us // 86400000000 AS day,
        |  strftime(make_timestamp(1756684800000000 + (us // 1000000) * 1000000),
        |    '%Y-%m-%dT%H:%M:%S') || 'Z' AS ts FROM e)
        |SELECT CAST(day AS INT) AS day, count(*) AS n_events,
        |  min(ts) AS min_ts, max(ts) AS max_ts, TRUE AS bits_ok
        |FROM d WHERE ts >= '2025-09-04' GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_knn_brute" -> KnnBruteSql,
    // accuracy-gated ANN family (r10, formerly rows-only): each query
    // runs its real probe (LSH / IVF / IVF-kmeans / JL projection),
    // measures recall@10 vs the exact brute answer, and emits the
    // exact rows + recall_ok, which the oracle fixes at TRUE — a
    // recall regression hash-mismatches AND trips Verify's claim gate
    "q_ann_lsh" -> AnnOracleSql,
    "q_ann_ivf" -> AnnOracleSql,
    "q_ann_ivf_kmeans" -> AnnOracleSql,
    "q_ann_projected" -> AnnOracleSql,
    // streaming ANN index maintenance (r11): the probe runs against
    // the incrementally MAINTAINED bucket index (built by AvailableNow
    // micro-batches, O(new vectors) per trigger — StreamAnnSpec pins
    // the incrementality), then emits the exact rows + recall_ok
    "q_stream_ann" -> AnnOracleSql,
    "q_vec_norms" ->
      """SELECT label, count(*) AS n,
        |  round(avg(sqrt(list_sum(list_transform(
        |    CAST(embedding AS DOUBLE[]), x -> x * x)))), 4) AS avg_norm
        |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_vec_quantize" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT label, v,
        |  list_max(list_transform(v, x -> abs(x))) / 127.0 AS s FROM e
        |  WHERE list_max(list_transform(v, x -> abs(x))) > 0),
        |r AS (SELECT label,
        |  sqrt(list_sum(list_transform(v,
        |    x -> (x - floor(x / s + 0.5) * s) * (x - floor(x / s + 0.5) * s))))
        |  / sqrt(list_sum(list_transform(v, x -> x * x))) AS rel FROM q)
        |SELECT label, count(*) AS n, round(avg(rel), 4) AS avg_err,
        |  round(max(rel), 4) AS max_err
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_centroid_outliers" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |c AS (SELECT label, i.p AS p, avg(v[i.p]) AS m
        |  FROM e, LATERAL (SELECT unnest(generate_series(1, len(v))) AS p) i
        |  GROUP BY 1, 2),
        |cent AS (SELECT label,
        |  CAST(CAST(list(m ORDER BY p) AS FLOAT[]) AS DOUBLE[]) AS cv
        |  FROM c GROUP BY 1),
        |s AS (SELECT e.label, e.vec_id,
        |  round(list_cosine_similarity(e.v, cent.cv), 4) AS cos
        |  FROM e JOIN cent USING (label)),
        |r AS (SELECT label, vec_id, cos, CAST(row_number() OVER (
        |  PARTITION BY label ORDER BY cos, vec_id) AS INT) AS rn FROM s)
        |SELECT label, rn, vec_id, cos FROM r WHERE rn <= 3
        |ORDER BY label, rn""".stripMargin,
    "q_doc_percentiles" ->
      """WITH w AS (SELECT source, n_chars,
        |  ntile(4) OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS q4,
        |  percent_rank() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS pr,
        |  cume_dist() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS cd
        |  FROM documents)
        |SELECT source, CAST(q4 AS INT) AS q4, count(*) AS n,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  round(avg(pr), 4) AS avg_pr, round(avg(cd), 4) AS avg_cd
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_cosine_dedup" -> CosineDedupSql,
    // accuracy-gated LSH near-dup (r11, formerly rows-only + claim):
    // the engine runs the real multi-table hyperplane funnel, measures
    // recall vs the exact label-blocked pair set, and emits the exact
    // pairs + recall_ok, which the oracle fixes at TRUE; precision_ok
    // (r12) pins same-label found ⊆ exact (the cross-label found pairs
    // lie outside the blocked twin's domain by construction)
    "q_cosine_dedup_lsh" ->
      s"""WITH x AS ($CosineDedupSql)
        |SELECT a_id, b_id, cos, TRUE AS recall_ok,
        |  TRUE AS precision_ok FROM x
        |ORDER BY a_id, b_id""".stripMargin,
    // SemDeDup (r11): k-means-cluster-blocked semantic near-dup — the
    // engine soft-assigns the corpus to its top-8 trained centroids
    // (r13: probing raised from top-3; recall 1.0/1.0/0.983 across
    // SFs at the fixture's hard-end 0.3 cut), searches within lists,
    // measures recall vs the exact pair set, and emits the same exact
    // ground truth + oracle-fixed recall_ok; precision_ok (r12) pins
    // same-label found ⊆ exact
    "q_semdedup" ->
      s"""WITH x AS ($CosineDedupSql)
        |SELECT a_id, b_id, cos, TRUE AS recall_ok,
        |  TRUE AS precision_ok FROM x
        |ORDER BY a_id, b_id""".stripMargin,
    // incremental SemDeDup (r14): a new batch (odd vec_ids) probes the
    // memoized corpus-side IVF index (even vec_ids); the emitted rows
    // are the exact label-blocked CROSS ground truth — the batch answer
    // on the union corpus restricted to corpus×batch pairs — plus the
    // oracle-fixed recall/precision claims measured on the live probe
    "q_semdedup_incremental" ->
      """WITH e AS (SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS corpus_id, b.vec_id AS batch_id,
        |  round(list_cosine_similarity(a.v, b.v), 4) AS cos,
        |  TRUE AS recall_ok, TRUE AS precision_ok
        |FROM e a JOIN e b ON a.label = b.label
        |WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
        |  AND list_cosine_similarity(a.v, b.v) >= 0.3
        |ORDER BY corpus_id, batch_id""".stripMargin,
    "q_vec_clusters" ->
      s"""WITH RECURSIVE pairs AS MATERIALIZED ($CosineDedupSql),
        |ed AS MATERIALIZED (SELECT a_id AS a, b_id AS b FROM pairs
        |  UNION ALL SELECT b_id, a_id FROM pairs),
        |reach(id, r) AS (
        |  SELECT a, a FROM ed
        |  UNION
        |  SELECT ed.a, reach.r FROM ed JOIN reach ON ed.b = reach.id),
        |comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id)
        |SELECT comp AS keep_id, count(*) AS n_members, max(id) AS max_id
        |FROM comp GROUP BY 1 ORDER BY keep_id""".stripMargin,
    // §2.11 E7 second-wave analytics + training-pipeline extras
    "q_top_paths" ->
      """WITH e AS (SELECT user_id, event_id, ts,
        |    lower(coalesce(event_type, '')) AS et FROM events),
        |g AS (SELECT user_id, event_id, ts, et,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |    OR date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, et, ts, event_id,
        |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_id
        |  FROM g),
        |r AS (SELECT user_id, sess_id, et,
        |  row_number() OVER (PARTITION BY user_id, sess_id ORDER BY ts, event_id) AS rn
        |  FROM s),
        |p AS (SELECT user_id, sess_id, string_agg(et, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 8 GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions FROM p
        |GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    "q_scd2_dims" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
        |    o_orderpriority AS priority FROM orders),
        |c AS (SELECT o_custkey, o_orderkey, od, priority,
        |  lag(priority) OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey) AS prev
        |  FROM o),
        |ch AS (SELECT o_custkey, o_orderkey, od, priority FROM c
        |  WHERE prev IS NULL OR prev <> priority),
        |v AS (SELECT o_custkey, priority, od,
        |  lead(od) OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey) AS vt
        |  FROM ch)
        |SELECT o_custkey, priority, strftime(od, '%Y-%m-%d') AS valid_from,
        |  strftime(vt, '%Y-%m-%d') AS valid_to, vt IS NULL AS is_current
        |FROM v ORDER BY o_custkey, valid_from, priority""".stripMargin,
    "q_sliding_distinct" ->
      """WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
        |days AS (SELECT DISTINCT d AS day FROM ud)
        |SELECT strftime(day, '%Y-%m-%d') AS d,
        |  count(DISTINCT user_id) AS users_7d
        |FROM days JOIN ud ON ud.d BETWEEN day - 6 AND day
        |GROUP BY day ORDER BY 1""".stripMargin,
    "q_train_split" ->
      """WITH s AS (SELECT n_chars,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h2 FROM documents)
        |SELECT CASE WHEN h2 < 'cd' THEN 'train'
        |            WHEN h2 < 'e6' THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_fuzzy_join" ->
      """SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
        |  a.p_name AS a_name, b.p_name AS b_name,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM part a JOIN part b
        |  ON a.p_type = b.p_type AND a.p_size = b.p_size
        |  AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 4
        |ORDER BY a_key, b_key""".stripMargin,
    "q_variant_json" ->
      """SELECT lower(coalesce(event_type, '')) AS et,
        |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_ewma_hours" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS hr,
        |    CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT) AS idx,
        |    sum(coalesce(value, 0)) AS rev
        |  FROM events GROUP BY 1, 2)
        |SELECT strftime(a.hr, '%Y-%m-%d %H:00') AS hour, round(a.rev, 2) AS rev,
        |  round(sum(pow(0.6, a.idx - b.idx) * b.rev) /
        |        sum(pow(0.6, a.idx - b.idx)), 2) AS rev_ewma
        |FROM h a JOIN h b ON b.idx BETWEEN a.idx - 11 AND a.idx
        |GROUP BY a.hr, a.rev, a.idx ORDER BY 1""".stripMargin,
    "q_lm_score" ->
      """WITH t AS (SELECT doc_id, source, lang,
        |    unnest(regexp_split_to_array(text, '\s+')) AS tok FROM documents),
        |v AS (SELECT tok, count(*) AS cnt FROM t GROUP BY 1),
        |n AS (SELECT sum(cnt) AS n_total FROM v),
        |d AS (SELECT t.doc_id, t.source, t.lang,
        |    avg(-ln(v.cnt / n.n_total)) AS nll
        |  FROM t JOIN v USING (tok) CROSS JOIN n GROUP BY 1, 2, 3)
        |SELECT source, lang, count(*) AS n_docs,
        |  round(avg(nll), 2) AS avg_nll
        |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_split_leakage" ->
      """WITH s AS (SELECT doc_id,
        |    array_to_string(list_sort(list_distinct(
        |      regexp_split_to_array(text, '\s+'))), ' ') AS key,
        |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
        |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |tr AS (SELECT key, doc_id FROM s WHERE split = 'train'),
        |ev AS (SELECT split, doc_id, key FROM s WHERE split <> 'train')
        |SELECT ev.split AS split,
        |  count(DISTINCT ev.doc_id) AS n_leaked_eval_docs,
        |  count(DISTINCT tr.doc_id) AS n_train_dups
        |FROM ev JOIN tr ON ev.key = tr.key
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv FROM e WHERE vec_id % 10 = 0),
        |s AS (SELECT q.q_id, e.vec_id,
        |    round(list_cosine_similarity(e.v, q.qv), 4) AS cos
        |  FROM e JOIN q ON e.label <> q.q_label),
        |r AS (SELECT q_id, vec_id, cos,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
        |  FROM s)
        |SELECT q_id, vec_id, cos FROM r WHERE rn <= 3
        |ORDER BY q_id, cos DESC, vec_id""".stripMargin,
    "q_bloom_scan" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CASE WHEN lower(coalesce(event_type, '')) IN
        |    ('purchase', 'order', 'checkout') THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
        |  round(sum(CASE WHEN lower(coalesce(event_type, '')) IN
        |    ('purchase', 'order', 'checkout') THEN coalesce(value, 0) ELSE 0 END), 2) AS revenue_usd
        |FROM events WHERE user_id IN (7, 42, 99)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q_concurrency" ->
      """WITH e AS (SELECT user_id, event_id, ts FROM events),
        |g AS (SELECT user_id, event_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |    OR date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts,
        |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_id
        |  FROM g),
        |b AS (SELECT user_id, sess_id, min(ts) AS st, max(ts) AS en
        |  FROM s GROUP BY 1, 2),
        |h AS (SELECT unnest(generate_series(date_trunc('hour', st),
        |    date_trunc('hour', en), INTERVAL 1 HOUR)) AS hr FROM b)
        |SELECT strftime(hr, '%Y-%m-%d %H:00') AS hour,
        |  count(*) AS n_active_sessions
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_weighted_sample" ->
      """WITH s AS (SELECT source, doc_id, n_chars,
        |    ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
        |       / 4294967296.0) / greatest(n_chars, 1) AS key
        |  FROM documents),
        |r AS (SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY key DESC, doc_id) AS rn
        |  FROM s)
        |SELECT source, doc_id, n_chars FROM r WHERE rn <= 10
        |ORDER BY source, doc_id""".stripMargin,
    "q4_priority_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |        year(l_shipdate) AS l_year,
        |        l_extendedprice * (1 - l_discount) AS volume
        |      FROM lineitem
        |      JOIN orders ON l_orderkey = o_orderkey
        |      JOIN supplier ON l_suppkey = s_suppkey
        |      JOIN customer ON o_custkey = c_custkey
        |      JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |        AND l_shipdate >= TIMESTAMP '1996-01-01'
        |        AND l_shipdate < TIMESTAMP '1998-01-01') t
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      """SELECT o_year,
        |  round(sum(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END)
        |        / sum(volume), 4) AS mkt_share
        |FROM (SELECT year(o_orderdate) AS o_year,
        |        l_extendedprice * (1 - l_discount) AS volume,
        |        n2.n_name AS nation
        |      FROM lineitem
        |      JOIN part ON l_partkey = p_partkey
        |      JOIN orders ON l_orderkey = o_orderkey
        |      JOIN customer ON o_custkey = c_custkey
        |      JOIN supplier ON l_suppkey = s_suppkey
        |      JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |      JOIN region ON n1.n_regionkey = r_regionkey
        |      JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        |        AND o_orderdate >= TIMESTAMP '1996-01-01'
        |        AND o_orderdate < TIMESTAMP '1998-01-01') t
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    - 0.4 * p_retailprice * l_quantity AS DECIMAL(20,4))) AS DOUBLE), 2)
        |    AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q13_custdist" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer
        |      LEFT JOIN (SELECT * FROM orders
        |                 WHERE o_orderpriority <> '4-NOT SPECIFIED') o
        |        ON c_custkey = o_custkey
        |      GROUP BY c_custkey) t
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#4'
        |  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q17_small_qty_revenue" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#4' AND p_size < 15
        |  AND l_quantity < (SELECT 0.5 * avg(l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = part.p_partkey)""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |  round(o_totalprice, 2) AS o_totalprice, round(sum_qty, 2) AS sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300) big
        |  ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY round(o_totalprice, 2) DESC, o_orderkey LIMIT 100""".stripMargin,
    "q19_disjunctive" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
        |       AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
        |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin,
    "q21_waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "q22_idle_customers" ->
      """SELECT CAST(c_custkey % 7 AS INT) AS cntry, count(*) AS numcust,
        |  round(sum(c_acctbal), 2) AS totacctbal
        |FROM customer
        |WHERE c_custkey % 7 IN (0, 1, 2, 3)
        |  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_window_ranks" ->
      """SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS price,
        |  dense_rank() OVER w AS dr, percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd, ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY round(o_totalprice, 2) DESC, o_orderkey)
        |ORDER BY o_orderpriority, dr, o_orderkey""".stripMargin,
    "q_median_groups" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS q1,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS median,
        |  round(quantile_cont(l_quantity, 0.75), 4) AS q3,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_bitmap_distinct" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS dt,
        |  count(DISTINCT user_id) AS unique_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_interpolate" ->
      """WITH grid AS (SELECT unnest(generate_series(
        |    TIMESTAMP '2024-01-01 00:00:00',
        |    TIMESTAMP '2024-01-30 23:00:00', INTERVAL 1 HOUR)) AS hr),
        |k AS (SELECT date_trunc('hour', ts) AS hr, avg(value) AS v
        |  FROM events WHERE lower(coalesce(event_type,'')) = 'purchase'
        |  GROUP BY 1),
        |g AS (SELECT grid.hr, k.v FROM grid LEFT JOIN k ON grid.hr = k.hr),
        |a AS (SELECT hr, v,
        |  last_value(v IGNORE NULLS) OVER
        |    (ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |  last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER
        |    (ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        |  first_value(v IGNORE NULLS) OVER
        |    (ORDER BY hr ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |  first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER
        |    (ORDER BY hr ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        |  FROM g)
        |SELECT strftime(hr, '%Y-%m-%d %H:00') AS hour,
        |  round(CASE WHEN v IS NOT NULL THEN v
        |    WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |      pv + (nv - pv) * ((epoch(hr) - epoch(ph)) / (epoch(nh) - epoch(ph)))
        |    ELSE coalesce(pv, nv) END, 4) AS value_interp
        |FROM a ORDER BY 1""".stripMargin,
    "q_attribution" ->
      """WITH e AS (SELECT user_id, event_id, ts, coalesce(value, 0) AS value,
        |    lower(coalesce(event_type, '')) AS et FROM events),
        |a AS (SELECT *,
        |  last_value(CASE WHEN et IN ('view','click') THEN et END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM e)
        |SELECT strftime(ts, '%Y-%m-%d') AS dt, coalesce(touch, 'direct') AS channel,
        |  count(*) AS purchases, round(sum(value), 2) AS revenue
        |FROM a WHERE et = 'purchase' GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_oov_rate" ->
      """WITH t AS (SELECT source, tok
        |  FROM (SELECT source,
        |        unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
        |        FROM documents) x
        |  WHERE tok <> ''),
        |v AS (SELECT tok FROM (SELECT tok, count(*) AS cnt FROM t GROUP BY 1
        |                       ORDER BY cnt DESC, tok LIMIT 1000))
        |SELECT source, count(*) AS n_tokens,
        |  round(1.0 - sum(CASE WHEN tok IN (SELECT tok FROM v)
        |                       THEN 1 ELSE 0 END) / count(*), 6) AS oov_rate
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_equidepth_hist" ->
      """SELECT o_orderpriority, bucket, count(*) AS n,
        |  round(min(price), 2) AS lo, round(max(price), 2) AS hi
        |FROM (SELECT o_orderpriority, round(o_totalprice, 2) AS price,
        |      ntile(8) OVER (PARTITION BY o_orderpriority
        |                     ORDER BY round(o_totalprice, 2), o_orderkey) AS bucket
        |      FROM orders) t
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    round(min(l_extendedprice / l_quantity), 4) AS cost
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part
        |                      WHERE p_type = 'STANDARD' AND p_size < 10)
        |  GROUP BY 1, 2),
        |eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |r AS (SELECT ps.l_partkey, ps.cost, eu.s_name, eu.s_acctbal, eu.n_name,
        |    row_number() OVER (PARTITION BY l_partkey
        |                       ORDER BY cost, l_suppkey) AS rn
        |  FROM ps JOIN eu ON l_suppkey = s_suppkey)
        |SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
        |  p_partkey, p_brand, cost
        |FROM r JOIN part ON l_partkey = p_partkey
        |WHERE rn = 1
        |ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 100""".stripMargin,
    "q11_important_stock" ->
      """WITH scoped AS (
        |  SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(20,4)) AS v
        |  FROM lineitem
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
        |                      JOIN nation ON s_nationkey = n_nationkey
        |                      WHERE n_name = 'NATION_3')),
        |byp AS (SELECT l_partkey, sum(v) AS value FROM scoped GROUP BY 1)
        |SELECT l_partkey, round(CAST(value AS DOUBLE), 2) AS value
        |FROM byp
        |WHERE CAST(value AS DOUBLE) >
        |  (SELECT CAST(sum(value) AS DOUBLE) FROM byp)
        |    / (SELECT count(*) FROM byp) * 3.0
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "q20_part_shippers" ->
      """SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_4'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE l_partkey IN (SELECT p_partkey FROM part
        |                        WHERE p_name LIKE '%blue%')
        |      AND l_shipdate >= TIMESTAMP '1996-01-01'
        |      AND l_shipdate < TIMESTAMP '1997-01-01'
        |    GROUP BY 1 HAVING sum(l_quantity) > 100)
        |ORDER BY s_suppkey""".stripMargin,
    "q_dup_canonical" ->
      s"""WITH RECURSIVE pairs AS MATERIALIZED ($NgramJaccardSql),
        |e AS MATERIALIZED (SELECT a_id AS a, b_id AS b FROM pairs
        |  UNION ALL SELECT b_id, a_id FROM pairs),
        |reach(id, r) AS (
        |  SELECT a, a FROM e
        |  UNION
        |  SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.id),
        |comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
        |m AS (SELECT comp.comp, comp.id, d.n_chars
        |  FROM comp JOIN documents d ON comp.id = d.doc_id),
        |rr AS (SELECT comp, id, n_chars,
        |    row_number() OVER (PARTITION BY comp
        |                       ORDER BY n_chars DESC, id) AS rn FROM m)
        |SELECT comp AS cluster,
        |  max(CASE WHEN rn = 1 THEN id END) AS rep_id,
        |  max(CASE WHEN rn = 1 THEN n_chars END) AS rep_chars,
        |  count(*) AS n_members
        |FROM rr GROUP BY 1 ORDER BY cluster""".stripMargin,
    "q_mode_groups" ->
      """WITH c AS (SELECT strftime(ts, '%Y-%m-%d') AS dt,
        |    lower(coalesce(event_type, '')) AS et, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY dt
        |                                   ORDER BY cnt DESC, et) AS rn FROM c)
        |SELECT dt, et AS mode_event, cnt FROM r WHERE rn = 1 ORDER BY dt""".stripMargin,
    "q_gaps_islands" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |g AS (SELECT user_id, d,
        |    date_diff('day', DATE '1970-01-01', d)
        |      - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
        |  FROM days)
        |SELECT user_id, strftime(min(d), '%Y-%m-%d') AS island_start,
        |  strftime(max(d), '%Y-%m-%d') AS island_end, count(*) AS len
        |FROM g GROUP BY user_id, grp
        |HAVING count(*) >= 3
        |ORDER BY user_id, island_start""".stripMargin,
    "q_share_of_day" ->
      """WITH c AS (SELECT strftime(ts, '%Y-%m-%d') AS dt,
        |    lower(coalesce(event_type, '')) AS et, count(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT dt, et, cnt,
        |  round(cnt / sum(cnt) OVER (PARTITION BY dt), 6) AS share
        |FROM c ORDER BY dt, et""".stripMargin,
    "q_yoy_growth" ->
      """WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |    sum(CAST(o_totalprice AS DECIMAL(20,4))) AS rev
        |  FROM orders GROUP BY 1),
        |l AS (SELECT month, rev,
        |    lag(rev, 12) OVER (ORDER BY month) AS prev FROM m)
        |SELECT month, round(CAST(rev AS DOUBLE), 2) AS revenue,
        |  round((CAST(rev AS DOUBLE) - CAST(prev AS DOUBLE))
        |        / CAST(prev AS DOUBLE), 6) AS yoy_growth
        |FROM l ORDER BY month""".stripMargin,
    "q_stream_outer_join" ->
      """WITH e AS (SELECT user_id, date_trunc('second', ts) AS ts0,
        |    lower(coalesce(event_type, '')) AS et
        |  FROM events
        |  WHERE CAST(ts AS DATE) < DATE '2024-01-03'
        |    AND lower(coalesce(event_type, '')) IN ('view','click','purchase')),
        |p AS (SELECT user_id, ts0 FROM e WHERE et = 'purchase'
        |      AND CAST(ts0 AS DATE) < DATE '2024-01-02'),
        |v AS (SELECT user_id, ts0 FROM e WHERE et IN ('view','click'))
        |SELECT strftime(p.ts0, '%Y-%m-%d %H:00') AS hour,
        |  count(v.ts0) AS n_pairs,
        |  CAST(sum(CASE WHEN v.ts0 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unmatched,
        |  count(DISTINCT p.user_id) AS n_buyers
        |FROM p LEFT JOIN v ON p.user_id = v.user_id
        |  AND v.ts0 >= p.ts0 - INTERVAL 1 HOUR AND v.ts0 <= p.ts0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_dpp_scan" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS date, count(*) AS n_events,
        |  round(sum(coalesce(value, 0)), 2) AS revenue
        |FROM events
        |WHERE CAST(ts AS DATE) < DATE '2024-01-06'
        |  AND day(CAST(ts AS DATE)) % 2 = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_mad_outliers" ->
      """WITH med AS (SELECT o_orderpriority AS p,
        |    quantile_cont(o_totalprice, 0.5) AS med FROM orders GROUP BY 1),
        |d AS (SELECT o.o_orderpriority AS p, o.o_totalprice, m.med,
        |    abs(o.o_totalprice - m.med) AS adev
        |  FROM orders o JOIN med m ON o.o_orderpriority = m.p),
        |mad AS (SELECT p, quantile_cont(adev, 0.5) AS mad FROM d GROUP BY 1)
        |SELECT d.p AS o_orderpriority, round(max(d.med), 2) AS med,
        |  round(max(mad.mad), 2) AS mad,
        |  CAST(sum(CASE WHEN d.adev > 3 * 1.4826 * mad.mad
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  count(*) AS n
        |FROM d JOIN mad ON d.p = mad.p
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pagerank" ->
      """WITH s AS (SELECT lower(coalesce(event_type, '')) AS src,
        |    lead(lower(coalesce(event_type, ''))) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS dst
        |  FROM events),
        |e AS (SELECT src, dst, count(*) AS n FROM s
        |  WHERE dst IS NOT NULL GROUP BY 1, 2),
        |o AS (SELECT src, sum(n) AS out_n FROM e GROUP BY 1),
        |w AS (SELECT e.src, e.dst, CAST(e.n AS DOUBLE) / o.out_n AS w
        |  FROM e JOIN o ON e.src = o.src),
        |nd AS (SELECT DISTINCT node FROM
        |  (SELECT src AS node FROM e UNION SELECT dst FROM e)),
        |nn AS (SELECT count(*) AS n_nodes FROM nd),
        |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n_nodes AS pr
        |  FROM nd CROSS JOIN nn),
        |r1 AS (SELECT nd.node,
        |    (CAST(1.0 AS DOUBLE) - 0.85) / nn.n_nodes
        |      + 0.85 * coalesce(c.cv, 0) AS pr
        |  FROM nd CROSS JOIN nn LEFT JOIN
        |    (SELECT w.dst, sum(r0.pr * w.w) AS cv FROM r0
        |     JOIN w ON r0.node = w.src GROUP BY 1) c ON nd.node = c.dst),
        |r2 AS (SELECT nd.node,
        |    (CAST(1.0 AS DOUBLE) - 0.85) / nn.n_nodes
        |      + 0.85 * coalesce(c.cv, 0) AS pr
        |  FROM nd CROSS JOIN nn LEFT JOIN
        |    (SELECT w.dst, sum(r1.pr * w.w) AS cv FROM r1
        |     JOIN w ON r1.node = w.src GROUP BY 1) c ON nd.node = c.dst),
        |r3 AS (SELECT nd.node,
        |    (CAST(1.0 AS DOUBLE) - 0.85) / nn.n_nodes
        |      + 0.85 * coalesce(c.cv, 0) AS pr
        |  FROM nd CROSS JOIN nn LEFT JOIN
        |    (SELECT w.dst, sum(r2.pr * w.w) AS cv FROM r2
        |     JOIN w ON r2.node = w.src GROUP BY 1) c ON nd.node = c.dst)
        |SELECT node, round(pr, 6) AS pr FROM r3 ORDER BY node""".stripMargin,
    "q_bounce_rate" ->
      """WITH s AS (SELECT user_id, event_id, ts,
        |    lower(coalesce(event_type, '')) AS et,
        |    row_number() OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    CASE WHEN lag(ts) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      OR date_diff('second', lag(ts) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |s2 AS (SELECT *, sum(new_sess) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM s),
        |g AS (SELECT user_id, sess, arg_min(et, rn) AS entry_et,
        |    count(*) AS n_ev
        |  FROM s2 GROUP BY 1, 2)
        |SELECT entry_et, count(*) AS n_sessions,
        |  CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bounce,
        |  round(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END)
        |    * CAST(1.0 AS DOUBLE) / count(*), 6) AS bounce_rate
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_dwell_time" ->
      """WITH s AS (SELECT lower(coalesce(event_type, '')) AS et, ts,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS next_ts
        |  FROM events),
        |d AS (SELECT et, date_diff('second', ts, next_ts) AS dwell
        |  FROM s WHERE next_ts IS NOT NULL)
        |SELECT et, count(*) AS n, round(avg(dwell), 4) AS avg_dwell_s
        |FROM d WHERE dwell <= 1800 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cooccurrence" ->
      """WITH ue AS (SELECT DISTINCT user_id,
        |    lower(coalesce(event_type, '')) AS et FROM events),
        |t AS (SELECT et, count(*) AS n_et FROM ue GROUP BY 1),
        |nu AS (SELECT count(DISTINCT user_id) AS n_users FROM ue),
        |p AS (SELECT a.et AS et_a, b.et AS et_b, count(*) AS n_both
        |  FROM ue a JOIN ue b
        |    ON a.user_id = b.user_id AND a.et < b.et GROUP BY 1, 2)
        |SELECT p.et_a AS et_a, p.et_b AS et_b, p.n_both AS n_both,
        |  ta.n_et AS n_a, tb.n_et AS n_b,
        |  round(p.n_both * nu.n_users * CAST(1.0 AS DOUBLE)
        |    / (ta.n_et * tb.n_et), 6) AS lift
        |FROM p JOIN t ta ON p.et_a = ta.et
        |JOIN t tb ON p.et_b = tb.et CROSS JOIN nu
        |ORDER BY 1, 2""".stripMargin,
    // CMS point estimates never undercount and, at width 2048 over the
    // fixture's 5-key vocabulary, are collision-free — so the sketch
    // rollup is gated against EXACT per-type counts (deterministic:
    // fixed seeds; verified at both scales).
    "q_cms_counts" ->
      """SELECT lower(coalesce(event_type, '')) AS et, count(*) AS est_n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_vec_dimstats" ->
      """WITH e AS (SELECT label, generate_subscripts(embedding, 1) AS d1,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings)
        |SELECT label, d1 - 1 AS dim,
        |  round(sum(x) / count(*), 4) AS mean,
        |  round(sqrt(sum(x * x) / count(*)
        |    - pow(sum(x) / count(*), 2)), 4) AS std
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_source_entropy" ->
      """WITH t AS (SELECT source,
        |    unnest(regexp_split_to_array(text, '\s+')) AS token
        |  FROM documents),
        |g AS (SELECT source, token, count(*) AS c FROM t GROUP BY 1, 2)
        |SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  count(*) AS vocab,
        |  round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4)
        |    AS entropy_bits
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_forget_users" ->
      """WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS dt, user_id, value
        |  FROM events),
        |dels AS (SELECT DISTINCT user_id FROM e WHERE user_id % 37 = 0),
        |aff AS (SELECT DISTINCT dt FROM e
        |  WHERE user_id IN (SELECT user_id FROM dels))
        |SELECT e.dt, count(*) AS n_events,
        |  count(DISTINCT e.user_id) AS n_users,
        |  round(sum(coalesce(e.value, 0)), 2) AS revenue
        |FROM e JOIN aff ON e.dt = aff.dt
        |WHERE e.user_id NOT IN (SELECT user_id FROM dels)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_user_lifetime" ->
      """WITH per AS (SELECT user_id,
        |    min(CAST(ts AS DATE)) AS first_day,
        |    max(CAST(ts AS DATE)) AS last_day,
        |    count(*) AS n_ev
        |  FROM events GROUP BY 1)
        |SELECT strftime(first_day, '%Y-%m-%d') AS cohort,
        |  count(*) AS n_users,
        |  round(avg(date_diff('day', first_day, last_day)), 4)
        |    AS avg_lifetime_days,
        |  CAST(sum(CASE WHEN date_diff('day', first_day, last_day) < 7
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_week1_churn,
        |  round(avg(n_ev), 4) AS avg_events_per_user
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_scd2_lookup" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
        |    o_orderpriority AS priority FROM orders),
        |c AS (SELECT o_custkey, o_orderkey, od, priority,
        |  lag(priority) OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey) AS prev
        |  FROM o),
        |ch AS (SELECT o_custkey, o_orderkey, od, priority FROM c
        |  WHERE prev IS NULL OR prev <> priority),
        |v AS (SELECT o_custkey, priority, od AS vf,
        |  lead(od) OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey) AS vt
        |  FROM ch),
        |f AS (SELECT ord.o_custkey, CAST(l.l_shipdate AS DATE) AS sd
        |  FROM lineitem l JOIN orders ord ON l.l_orderkey = ord.o_orderkey)
        |SELECT v.priority, v.vt IS NULL AS is_current,
        |  count(*) AS n_shipments
        |FROM f JOIN v ON f.o_custkey = v.o_custkey
        |  AND f.sd >= v.vf AND (v.vt IS NULL OR f.sd < v.vt)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_bigram_topk" ->
      """WITH d AS (SELECT list_filter(
        |    regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |g AS (SELECT unnest(list_transform(range(1, len(toks)),
        |    i -> toks[i] || ' ' || toks[i + 1])) AS gram
        |  FROM d WHERE len(toks) >= 2)
        |SELECT gram, count(*) AS n FROM g
        |GROUP BY 1 ORDER BY n DESC, gram LIMIT 20""".stripMargin,
  )
}
