package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` has one entry per implemented operator family from
  * SURVEY.md §2; `oracleSql` holds a DuckDB-equivalent for each, written
  * so the two engines agree bit-for-bit (decimal-routed sums, explicit
  * tie-breaks, epoch-millis timestamps for the ns-precision events table).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggPushdown(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_pushdown"    -> (Relational.aggPushdown _),
    "q02_filter_project"  -> (Relational.filterProject _),
    "q03_join_broadcast"  -> (Relational.joinBroadcast _),
    "q04_semi_join"       -> (Relational.semiJoin _),
    "q05_anti_join"       -> (Relational.antiJoin _),
    "q06_distinct_sort"   -> (Relational.distinctSort _),
    "q07_union_distinct"  -> (Relational.unionDistinct _),
    "q08_ordered_limit"   -> (Relational.orderedLimit _),
    "q09_first_per_group" -> (Relational.firstPerGroup _),
    "q10_window_baseline" -> (Relational.windowBaseline _),
    "q11_nearest_asof"    -> (Relational.nearestAsof _),
    "q12_group_collect"   -> (Relational.groupCollect _),
    "q13_date_parts"      -> (Relational.dateParts _),
    "q14_string_format"   -> (Relational.stringFormat _),
    "q15_byte_codec"      -> (Relational.byteCodec _),
    "q16_arithmetic"      -> (Relational.arithmetic _),
    "q17_topk_per_group"  -> (Relational.topkPerGroup _),
    "q18_rollup"          -> (Relational.rollupAgg _),
    "q19_conditional_pivot" -> (Relational.conditionalPivot _),
    "q20_range_filter_agg"  -> (Relational.rangeFilterAgg _),
    "q21_tumbling_window"   -> (Relational.tumblingWindow _),
    "q22_sessionize"        -> (Relational.sessionize _),
    "q23_distinct_count"    -> (Relational.distinctCount _),
    "q24_dedup_exact"       -> (Dedup.exactDedup _),
    "q25_ngram_jaccard"     -> (Dedup.ngramJaccard _),
    "q26_minhash_lsh"       -> (Dedup.minhashLsh _),
    "q27_simhash"           -> (Dedup.simhash _),
    "q28_simhash_pairs"     -> (Dedup.simhashPairs _),
    "q29_ann_brute"         -> (Similarity.annBrute _),
    "q30_lsh_ann"           -> (Similarity.lshAnn _),
    "q31_langid"            -> (TextAnalysis.langid _),
    "q32_quality_score"     -> (TextAnalysis.qualityScore _),
    "q33_token_count"       -> (TextAnalysis.tokenCount _),
    "q34_fingerprint"       -> (TextAnalysis.fingerprint _),
    "q35_blob_meta"         -> (Multimodal.blobMeta _),
    // hash-gated since round 4: offset-quantized power absorbs libm
    // non-portability (see the q36 oracle below and Spectral.fftPower)
    "q36_fft_power"         -> (Spectral.fftPower _),
    "q37_cosine_neardup"    -> (Similarity.cosineNearDup _),
    "q38_ivf_ann"           -> (Similarity.ivfAnn _),
    "q39_frame_sample"      -> (Multimodal.frameSample _),
    "q40_blob_features"     -> (Multimodal.blobFeatures _),
    "q41_asof_merge"        -> (Relational.asofMergeCustom _),
    "q42_quantiles"         -> (Relational.quantiles _),
    "q43_cube"              -> (Relational.cubeAgg _),
    "q44_range_join"        -> (RangeJoin.priceBandAgg _),
    "q45_interpolate"       -> (Interp.gridInterp _),
    "q46_lag_delta"         -> (Relational.lagDelta _),
    "q47_stratified_sample" -> (Sampling.langStratified _),
    "q48_hash_split"        -> (Sampling.trainValTest _),
    "q49_seq_pack"          -> (Sampling.seqPack _),
    "q50_salted_agg"        -> (Skew.saltedAggQuery _),
    "q51_salted_join"       -> (Skew.saltedJoinQuery _),
    "q52_sliding_window"    -> (Relational.slidingWindow _),
    "q53_vocab_topk"        -> (TextAnalysis.vocabTopK _),
    "q54_group_sample"      -> (Sampling.perGroupSample _),
    "q55_revenue_rollup"    -> (Relational.revenueRollup _),
    "q56_json_extract"      -> (Relational.jsonExtract _),
    "q57_set_ops"           -> (Relational.setOps _),
    "q58_contamination"     -> (Dedup.contamination _),
    "q59_blob_resize"       -> (Multimodal.blobResize _),
    "q60_stats_profile"     -> (Relational.statsProfile _),
    "q61_moving_agg"        -> (Relational.movingAgg _),
    "q62_dup_clusters"      -> (Graph.dupClusters _),
    "q63_locf_gapfill"      -> (Interp.gridLocf _),
    "q64_pii_redact"        -> (Curation.piiRedact _),
    "q65_repetition"        -> (Curation.repetitionStats _),
    "q66_url_canon"         -> (Curation.urlCanon _),
    "q67_embed_quant"       -> (Quantize.embedQuant _),
    "q68_kmeans_step"       -> (Quantize.kmeansStep _),
    "q69_ohlc_downsample"   -> (Relational.ohlcDownsample _),
    "q70_token_ids"         -> (TextAnalysis.tokenIds _),
    "q71_keep_latest"       -> (Relational.keepLatest _),
    "q72_winsorize"         -> (Relational.winsorize _),
    "q73_zscore"            -> (Relational.zscore _),
    "q74_linear_trend"      -> (Relational.linearTrend _),
    "q75_wht_power"         -> (Spectral.whtPower _),
    "q76_psi_slice_max3d"   -> (Relational.psiSliceMax3d _),
    "q77_mixture_sample"    -> (Sampling.mixtureSample _),
    "q78_salient_terms"     -> (TextAnalysis.salientTerms _),
    "q79_cluster_keepers"   -> (Graph.clusterKeepers _),
    "q80_bm25_score"        -> (TextAnalysis.bm25Score _),
    "q81_length_histogram"  -> (Relational.lengthHistogram _),
    "q82_curation_pipeline" -> (Curation.curationPipeline _),
    "q83_bloom_semijoin"    -> (Relational.bloomSemiJoin _),
    "q84_boilerplate"       -> (Curation.boilerplate _),
    "q85_bpe_pairs"         -> (TextAnalysis.bpePairs _),
    "q86_edit_verify"       -> (Dedup.editVerify _),
    "q87_unigram_surprisal" -> (TextAnalysis.unigramSurprisal _),
    "q88_source_overlap"    -> (Dedup.sourceOverlap _),
    "q89_winnow_overlap"    -> (Dedup.winnowOverlap _),
    "q90_tf_cosine"         -> (Dedup.tfCosinePairs _),
    "q91_chunk_windows"     -> (Sampling.chunkDocs _),
    "q92_embed_gram"        -> (Quantize.embedGram _),
    "q93_token_budget"      -> (Sampling.tokenBudgetSelect _),
    "q94_semantic_dedup"    -> (Similarity.semanticDedup _),
    "q95_hash_classifier"   -> (TextAnalysis.hashClassifier _),
    "q96_source_kl"         -> (TextAnalysis.sourceKl _),
    "q97_bigram_stats"      -> (TextAnalysis.bigramStats _),
    "q98_pq_encode"         -> (Quantize.pqEncode _),
    "q99_pca_project"       -> (Quantize.pcaProject _),
    "q100_dup_spans"        -> (Dedup.dupSpans _),
    "q101_priority_sample"  -> (Sampling.prioritySample _),
    "q102_cms_heavy"        -> (TextAnalysis.cmsHeavyHitters _),
    "q103_pagerank"         -> (Graph.pageRank _),
    "q104_zorder_layout"    -> (Layout.zorderKeys _),
    "q105_mad_outliers"     -> (Relational.madOutliers _),
    "q106_margin_mining"    -> (Similarity.marginMining _),
    "q107_cluster_terms"    -> (Quantize.clusterTerms _),
    "q108_vocab_coverage"   -> (TextAnalysis.vocabCoverage _),
    "q109_delta_dedup"      -> (Dedup.deltaDedup _),
    "q110_event_trigrams"   -> (Relational.eventTrigrams _),
    "q111_pmi_collocations" -> (TextAnalysis.pmiCollocations _),
    "q112_decayed_score"    -> (Relational.decayedEngagement _),
    "q113_lag_xcorr"        -> (Relational.lagCrossCorr _),
    "q114_funnel"           -> (Relational.funnelSteps _),
    "q115_quantile_norm"    -> (Relational.quantileNormalize _),
    "q116_spectrogram"      -> (Spectral.spectrogram _),
    "q117_benford"          -> (Relational.benfordAudit _),
    "q118_cusum"            -> (Timeseries.cusumChangePoint _),
    "q119_hampel"           -> (Timeseries.hampelDespike _),
    "q120_auc"              -> (Evaluate.aucBySource _),
    "q121_calibration"      -> (Evaluate.calibrationBins _),
    "q122_char_entropy"     -> (TextAnalysis.charEntropy _),
    "q123_weak_labels"      -> (Curation.weakLabels _),
    "q124_lf_agreement"     -> (Curation.lfAgreement _),
    "q125_containment"      -> (Dedup.containmentPairs _),
    "q126_bradley_terry"    -> (Preference.bradleyTerry _),
    "q127_triangles"        -> (Graph.supplierTriangles _),
    "q128_retention"        -> (Relational.retentionCohorts _),
    "q129_vocab_nucleus"    -> (TextAnalysis.vocabNucleus _),
    "q130_canon_dedup"      -> (Curation.canonDedup _),
    "q131_novelty"          -> (Dedup.ngramNovelty _),
    "q132_cohen_kappa"      -> (Curation.cohenKappa _),
    "q133_minhash_audit"    -> (Dedup.minhashEstAudit _),
    "q134_survival"         -> (Timeseries.survivalCurve _),
    "q135_temporal_split"   -> (Sampling.temporalSplit _),
    "q136_fleiss_kappa"     -> (Curation.fleissKappa _),
    "q137_vocab_growth"     -> (TextAnalysis.vocabGrowth _),
    "q138_hubness"          -> (Similarity.hubness _),
    "q139_markov"           -> (Timeseries.markovTransitions _),
    "q140_good_turing"      -> (TextAnalysis.goodTuring _),
    "q141_conformal"        -> (Evaluate.conformalThreshold _),
    "q142_rank_overlap"     -> (Similarity.rankOverlap _),
    "q143_rrf_fusion"       -> (Similarity.rrfFusion _),
    "q144_ks_test"          -> (Evaluate.ksTest _),
    "q145_entropy_rate"     -> (Timeseries.entropyRate _),
    "q146_langid_margin"    -> (TextAnalysis.langidMargin _),
    "q147_source_profile"   -> (Relational.sourceProfile _),
    "q148_activity_gini"    -> (Relational.activityGini _),
    "q149_psi_drift"        -> (Relational.psiDrift _),
    "q150_key_skew"         -> (Skew.keySkewAudit _),
    "q151_theil_sen"        -> (Timeseries.theilSen _),
    "q152_hod_profile"      -> (Timeseries.hourOfDayProfile _),
    "q153_mann_kendall"     -> (Timeseries.mannKendall _),
    "q154_lorenz"           -> (Timeseries.lorenzDeciles _),
    "q155_eb_rates"         -> (Relational.ebSmoothedRates _),
    "q156_user_surprisal"   -> (Timeseries.userSurprisal _),
    "q157_coverage_curve"   -> (TextAnalysis.coverageCurve _),
    "q158_basket_lift"      -> (Relational.basketLift _),
    "q159_doc_ppl"          -> (TextAnalysis.docPerplexity _),
    "q160_tfidf_terms"      -> (TextAnalysis.tfidfTerms _),
    "q161_hll_distinct"     -> (Relational.hllDistinct _),
    "q162_confusion"        -> (Evaluate.langidConfusion _),
    "q163_bootstrap_ci"     -> (Evaluate.bootstrapCi _),
    "q164_dup_token_rate"   -> (Dedup.dupTokenRate _),
    "q165_hot_cells"        -> (Timeseries.hotCells _),
    "q166_label_prop"       -> (Curation.labelProp _),
    "q167_ndcg"             -> (Evaluate.ndcgAt10 _),
    "q168_scd2_history"     -> (Relational.scd2History _),
    "q169_budget_alloc"     -> (Sampling.budgetAllocation _),
    "q170_hist_quantiles"   -> (Relational.histQuantiles _),
    "q171_chi2_ab"          -> (Evaluate.chiSquareAb _),
    "q172_lsh_recall"       -> (Dedup.lshRecallAudit _),
    "q173_top_paths"        -> (Relational.topSessionPaths _),
    "q174_dataset_card"     -> (Curation.datasetCard _),
    "q175_mmr_diversify"    -> (Similarity.mmrDiversify _),
    "q176_attribution"      -> (Relational.touchAttribution _),
    "q177_cuped"            -> (Evaluate.cupedAdjust _),
    "q178_sorted_nbhd"      -> (Dedup.sortedNeighborhood _),
    "q179_fdr_drift"        -> (Evaluate.fdrDrift _),
    "q180_ewma_forecast"    -> (Timeseries.ewmaForecast _),
    "q181_acf_hourly"       -> (Timeseries.acfHourly _),
    "q182_js_divergence"    -> (TextAnalysis.jsDivergence _),
    "q183_jl_audit"         -> (Similarity.jlAudit _),
    "q184_hits"             -> (Graph.hitsBipartite _),
    "q185_did"              -> (Evaluate.diffInDiff _),
    "q186_kripp_alpha"      -> (Curation.krippendorffAlpha _),
    "q187_kcenter"          -> (Similarity.kCenterGreedy _),
    "q188_strat_ate"        -> (Evaluate.stratifiedAte _),
    "q189_perm_test"        -> (Evaluate.permTest _),
    "q190_split_leakage"    -> (Dedup.splitLeakage _),
    "q191_mann_whitney"     -> (Evaluate.mannWhitney _),
    "q192_decile_lift"      -> (Evaluate.decileLift _),
    "q193_pit_features"     -> (Relational.pitFeatures _),
    "q194_neg_sampling"     -> (Sampling.negativeSampling _),
    "q195_wilson_bound"     -> (Evaluate.wilsonBound _),
    "q196_mrr_eval"         -> (Evaluate.mrrEval _),
    "q197_rfm_segments"     -> (Relational.rfmSegments _),
    "q198_coherence"        -> (Spectral.coherence _),
    "q199_sequential_ab"    -> (Evaluate.sequentialAb _),
    "q200_markov_eval"      -> (Evaluate.markovEval _),
    "q201_blob_phash"       -> (Multimodal.blobPhash _),
    "q202_item_cf"          -> (Graph.itemCf _),
    "q203_exp_gof"          -> (Timeseries.expGapFit _),
    "q204_mixture_weights"  -> (Sampling.mixtureWeights _),
    "q205_pack_efficiency"  -> (Sampling.packEfficiency _),
    "q206_active_select"    -> (TextAnalysis.activeSelect _),
    "q207_k_anonymity"      -> (Curation.kAnonymity _),
    "q208_corpus_diff"      -> (Dedup.corpusDiff _),
    "q209_dsir_select"      -> (Sampling.dsirSelect _),
    "q210_filter_funnel"    -> (Curation.filterFunnel _),
    "q211_dup_source_matrix" -> (Dedup.dupSourceMatrix _),
    "q212_truncation_waste" -> (Sampling.truncationWaste _),
    "q213_threshold_sweep"  -> (Dedup.thresholdSweep _),
    "q214_interval_union"   -> (Timeseries.intervalUnion _),
    "q215_unimax_alloc"     -> (Sampling.unimaxAlloc _),
    "q216_l_diversity"      -> (Curation.lDiversity _),
    "q217_order_bias"       -> (Sampling.orderBias _),
    "q218_skyline"          -> (Relational.paretoSkyline _),
    "q219_chao1"            -> (TextAnalysis.chao1Richness _),
    "q220_jackknife_src"    -> (Evaluate.jackknifeSource _),
    "q221_burst_episodes"   -> (Timeseries.burstEpisodes _),
    "q222_broken_stick"     -> (Timeseries.brokenStick _),
    "q223_centroid_shift"   -> (Similarity.centroidShift _),
    "q224_dim_variance"     -> (Quantize.dimVariance _),
    "q225_knn_purity"       -> (Similarity.knnLabelPurity _),
    "q226_hill_tail"        -> (Relational.hillTail _),
    "q227_psm_att"          -> (Evaluate.psmAtt _),
    "q228_self_bleu"        -> (TextAnalysis.selfBleu _),
    "q229_w1_drift"         -> (Evaluate.w1Drift _),
    "q230_dup_core"         -> (Graph.dupCore _),
    "q231_transitivity"     -> (Dedup.transitivityAudit _),
    "q232_cv_auc"           -> (Evaluate.cvAuc _),
    "q233_ari_langid"       -> (Evaluate.ariLangid _),
    "q234_split_oov"        -> (TextAnalysis.splitOov _),
    "q235_assortativity"    -> (Graph.degreeAssortativity _),
    "q236_split_balance"    -> (Sampling.splitBalance _),
    "q237_spearman"         -> (Evaluate.spearmanLenTypes _),
    "q238_cluster_sizes"    -> (Graph.clusterSizes _),
    "q239_z_outliers"       -> (Quantize.zOutliers _),
    "q240_vocab_overlap"    -> (TextAnalysis.vocabOverlap _),
    "q241_calibration_ece"  -> (Evaluate.calibrationEce _),
    "q242_sliced_w1"        -> (Evaluate.slicedW1 _),
    "q243_lex_sem"          -> (Dedup.lexSemAgreement _),
    "q244_cell_label_ari"   -> (Similarity.cellLabelAri _),
    "q245_radius_sweep"     -> (Dedup.radiusSweep _),
    "q246_dedup_savings"    -> (Graph.dedupSavings _),
    "q247_t_closeness"      -> (Curation.tCloseness _),
    "q248_neyman_alloc"     -> (Sampling.neymanAlloc _),
    "q249_participation"    -> (Quantize.participationRatio _),
    "q250_modularity"       -> (Graph.sourceModularity _),
    "q251_cohen_kappa"      -> (Evaluate.cohenKappa _),
    "q252_lsh_curve"        -> (Dedup.lshOperatingCurve _),
    "q253_hybrid_rrf"       -> (Similarity.hybridFusion _),
    "q254_bpe_merges"       -> (TextAnalysis.bpeMerges _),
    "q255_cluster_split"    -> (Sampling.clusterSplit _),
    "q256_translated_dups"  -> (Similarity.translatedDups _),
    "q257_fs_weights"       -> (Dedup.fsWeights _),
    "q258_zipf_slope"       -> (TextAnalysis.zipfSlope _),
    "q259_cdc_chunks"       -> (Dedup.cdcChunks _),
    "q260_burstiness"       -> (TextAnalysis.termBurstiness _),
    "q261_sttr"             -> (TextAnalysis.sttr _),
    "q262_readability"      -> (TextAnalysis.readability _),
    "q263_isotropy"         -> (Similarity.isotropy _),
    "q264_quant_fidelity"   -> (Quantize.quantFidelity _),
    "q265_pq_distortion"    -> (Quantize.pqDistortion _),
    "q266_mcnemar"          -> (Evaluate.mcnemar _),
    "q267_brier_decomp"     -> (Evaluate.brierDecomp _),
    "q268_welch_psd"        -> (Spectral.welchPsd _),
    "q269_hjorth"           -> (Timeseries.hjorth _),
    "q270_local_cc"         -> (Dedup.localClustering _),
    "q271_variance_ratio"   -> (Timeseries.varianceRatio _),
    "q272_spiegelhalter"    -> (Evaluate.spiegelhalterZ _),
    "q273_vocab_gini"       -> (TextAnalysis.vocabGini _),
    "q274_savgol"           -> (Timeseries.savgol _),
    "q275_peaks"            -> (Timeseries.peaks _),
    "q276_rank_stability"   -> (Quantize.rankStability _),
    "q277_auc_ci"           -> (Evaluate.aucCi _),
    "q278_kendall_w"        -> (Evaluate.kendallW _),
    "q279_mode_track"       -> (Spectral.modeTrack _),
    "q280_hurst"            -> (Timeseries.hurst _),
    "q281_runs_test"        -> (Timeseries.runsTest _),
    "q282_xcorr_matrix"     -> (Timeseries.xcorrMatrix _),
    "q283_phash_radius"     -> (Multimodal.phashRadius _),
    "q284_ivf_pq_adc"       -> (Similarity.ivfPqAdc _),
    "q285_wedge_sample"     -> (Dedup.wedgeSample _),
    "q286_cell_label_js"    -> (Similarity.cellLabelJs _),
    "q287_benford"          -> (Evaluate.benford _),
    "q288_bootstrap_ci"     -> (Sampling.bootstrapCi _),
    "q289_doc_ce"           -> (TextAnalysis.docCrossEntropy _),
    "q290_adc_recall"       -> (Similarity.adcRecall _),
    "q291_ngram_contam"     -> (Dedup.ngramContam _),
    "q292_hll_distinct"     -> (TextAnalysis.hllDistinct _),
    "q293_blob_entropy"     -> (Multimodal.blobEntropy _),
    "q294_cell_silhouette"  -> (Similarity.cellSilhouette _),
    "q295_retention"        -> (Timeseries.retentionCohorts _),
    "q296_interarrival_b"   -> (Timeseries.interarrivalBurstiness _),
    "q297_code_usage"       -> (Quantize.codeUsage _),
    "q298_weighted_median"  -> (Relational.weightedMedian _),
    "q299_pq_semdedup"      -> (Similarity.pqSemDedup _),
    "q300_opq_permute"      -> (Quantize.opqPermute _),
    "q301_unigram_em"       -> (TextAnalysis.unigramEmStep _),
    "q302_sketch_jaccard"   -> (TextAnalysis.sketchJaccard _),
    "q303_unigram_comp"     -> (TextAnalysis.unigramCompression _),
    "q304_probe_sweep"      -> (Similarity.ivfRecallSweep _),
    "q305_lomb_scargle"     -> (Spectral.lombScargle _),
    "q306_suffix_dup"       -> (Dedup.suffixDup _),
    "q307_session_overlap"  -> (RangeJoin.sessionEpisodeOverlap _),
    "q308_rq_encode"        -> (Quantize.rqEncode _),
    "q309_isotonic"         -> (Evaluate.isotonicCalibration _),
    "q310_kmv_intersect"    -> (TextAnalysis.kmvIntersect _),
    "q311_bloom_fp"         -> (TextAnalysis.bloomFpAudit _),
    "q312_ensemble_dedup"   -> (Dedup.ensembleDedup _),
    "q313_kn_entropy"       -> (TextAnalysis.knCrossEntropy _),
    "q314_confident_joint"  -> (Evaluate.confidentJoint _),
    "q315_hopkins"          -> (Similarity.hopkins _),
    "q316_dup_coverage"     -> (Dedup.dupCoverage _),
    "q317_keyness"          -> (TextAnalysis.keyness _),
    "q318_ljung_box"        -> (Timeseries.ljungBox _),
    "q319_gap_statistic"    -> (Similarity.gapStatistic _),
    "q320_textrank"         -> (TextAnalysis.textrank _),
    "q321_kmeans_par"       -> (Quantize.kmeansParInit _),
    "q322_dbscan_core"      -> (Similarity.dbscanCore _),
    "q323_facility_select"  -> (Similarity.facilitySelect _),
    "q324_ppr_seeds"        -> (Graph.pprSeeds _),
    "q325_lpa_communities"  -> (Graph.lpaCommunities _),
    "q326_fisher_g"         -> (Spectral.fisherG _),
  )

  def oracleSql: Map[String, String] = {
    val base = Map(
    "q01_agg_pushdown" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         cast(sum(cast(l_extendedprice AS decimal(12,2))) AS double) AS sum_base_price,
         cast(sum(cast(l_extendedprice AS decimal(12,2)) * cast(1.0 - l_discount AS decimal(12,2))) AS double) AS sum_disc_price,
         avg(l_quantity) AS avg_qty,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= timestamp '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, l_shipdate
         FROM lineitem
         WHERE l_shipdate BETWEEN timestamp '1997-01-01' AND timestamp '1997-03-31'
           AND l_quantity < 5""",
    "q03_join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
         cast(sum(cast(o_totalprice AS decimal(12,2))) AS double) AS sum_totalprice
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "q04_semi_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)""",
    "q05_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""",
    "q06_distinct_sort" ->
      """SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders
         ORDER BY o_orderpriority, o_orderstatus""",
    "q07_union_distinct" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
         UNION
         SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0
         UNION
         SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'""",
    "q08_ordered_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""",
    "q09_first_per_group" ->
      """SELECT o_custkey, o_orderkey AS first_orderkey, o_orderdate AS first_orderdate
         FROM orders
         QUALIFY row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate ASC, o_orderkey ASC) = 1""",
    "q10_window_baseline" ->
      """WITH ranked AS (
           SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
           FROM events),
         based AS (
           SELECT user_id, event_id, value,
             cast(sum(CASE WHEN rn <= 20 THEN cast(value AS decimal(18,6)) END)
                  OVER (PARTITION BY user_id) AS double) AS base_sum,
             count(CASE WHEN rn <= 20 THEN 1 END) OVER (PARTITION BY user_id) AS base_n
           FROM ranked)
         SELECT user_id, event_id, value - base_sum / base_n AS value_dc FROM based""",
    "q11_nearest_asof" ->
      """SELECT o_orderkey, l_linenumber AS nearest_linenumber, l_shipdate AS nearest_shipdate
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         QUALIFY row_number() OVER (
           PARTITION BY o_orderkey
           ORDER BY abs(epoch(l_shipdate) - epoch(o_orderdate)) ASC,
                    l_linenumber ASC, l_shipdate ASC) = 1""",
    "q12_group_collect" ->
      """SELECT o_custkey, count(*) AS n_orders,
         string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
         string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities
         FROM orders GROUP BY o_custkey""",
    "q13_date_parts" ->
      """SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
         count(*) AS n_orders,
         cast(sum(cast(o_totalprice AS decimal(12,2))) AS double) AS sum_totalprice
         FROM orders GROUP BY 1, 2""",
    "q14_string_format" ->
      """SELECT p_partkey,
         'P-' || lpad(cast(p_partkey AS varchar), 8, '0') AS part_code,
         upper(substr(p_name, 1, 12)) AS name_prefix,
         p_brand || '/' || p_type AS brand_type
         FROM part""",
    "q15_byte_codec" ->
      """SELECT event_id,
         (event_id // 1) % 256 AS b0,
         (event_id // 256) % 256 AS b1,
         (event_id // 65536) % 256 AS b2,
         (event_id // 16777216) % 256 AS b3,
         ((event_id // 1) % 256) + ((event_id // 256) % 256) * 256
           + ((event_id // 65536) % 256) * 65536
           + ((event_id // 16777216) % 256) * 16777216 AS decoded
         FROM events""",
    "q16_arithmetic" ->
      """SELECT l_orderkey,
         l_extendedprice * (1.0 - l_discount) AS revenue,
         l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge,
         abs(l_discount - 0.05) AS disc_dev,
         sqrt(l_quantity) AS qty_sqrt,
         cast(ceil(l_extendedprice / 100.0) AS bigint) AS price_bucket,
         cast(floor(l_quantity / 7.0) AS bigint) AS qty_floor
         FROM lineitem WHERE l_linenumber = 1""",
    "q17_topk_per_group" ->
      """SELECT l_suppkey,
         row_number() OVER (PARTITION BY l_suppkey
           ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rk,
         l_orderkey, l_linenumber, l_extendedprice
         FROM lineitem
         QUALIFY rk <= 3""",
    "q18_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q19_conditional_pivot" ->
      """SELECT o_orderpriority,
         cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS bigint) AS n_f,
         cast(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS bigint) AS n_o,
         cast(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS bigint) AS n_p,
         count(*) AS n_total
         FROM orders GROUP BY o_orderpriority""",
    "q20_range_filter_agg" ->
      """SELECT event_type, max(value) AS max_value, min(value) AS min_value, count(*) AS n
         FROM events
         WHERE ts >= timestamp '2024-01-08 00:00:00' AND ts < timestamp '2024-01-15 00:00:00'
           AND value BETWEEN 10.0 AND 100.0
         GROUP BY event_type""",
    "q21_tumbling_window" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, event_type,
         count(*) AS n,
         cast(sum(cast(value AS decimal(18,6))) AS double) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q22_sessionize" ->
      """WITH flagged AS (
           SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 30*60*1000
                  THEN 1 ELSE 0 END AS new_sess
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
         sess AS (
           SELECT user_id, ts,
             cast(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bigint) AS session_id
           FROM flagged)
         SELECT user_id, session_id, count(*) AS n_events,
           epoch_ms(min(ts)) AS session_start_ms,
           epoch_ms(max(ts)) AS session_end_ms
         FROM sess GROUP BY user_id, session_id""",
    "q23_distinct_count" ->
      """SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_orderkey) AS n_orders
         FROM lineitem GROUP BY l_suppkey""",
    "q24_dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY 1""",
    "q25_ngram_jaccard" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                  generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents),
         sh AS (
           SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
           FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                      JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
         card AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
         shared AS (
           SELECT c.doc_a, c.doc_b, count(*) AS n_shared
           FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
                       JOIN sh sb ON sb.doc_id = c.doc_b AND sa.shingle = sb.shingle
           GROUP BY 1, 2)
         SELECT s.doc_a, s.doc_b, s.n_shared,
                s.n_shared / (ca.n + cb.n - s.n_shared) AS jaccard
         FROM shared s JOIN card ca ON ca.doc_id = s.doc_a
                       JOIN card cb ON cb.doc_id = s.doc_b
         WHERE s.n_shared / (ca.n + cb.n - s.n_shared) >= 0.6""",
    "q26_minhash_lsh" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                  generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents),
         sh AS (
           SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
           FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                      JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
         mh AS (SELECT s.doc_id, sd.seed, min(md5(sd.seed || ':' || s.shingle)) AS mh
                FROM sh s, range(12) sd(seed) GROUP BY 1, 2),
         bands AS (SELECT doc_id, seed // 3 AS band,
                          string_agg(mh, ',' ORDER BY seed) AS sig
                   FROM mh GROUP BY 1, 2),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         card AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         shared AS (
           SELECT c.doc_a, c.doc_b, count(*) AS n_shared
           FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
                       JOIN sh sb ON sb.doc_id = c.doc_b AND sa.shingle = sb.shingle
           GROUP BY 1, 2)
         SELECT s.doc_a, s.doc_b,
                s.n_shared / (ca.n + cb.n - s.n_shared) AS jaccard
         FROM shared s JOIN card ca ON ca.doc_id = s.doc_a
                       JOIN card cb ON cb.doc_id = s.doc_b
         WHERE s.n_shared / (ca.n + cb.n - s.n_shared) >= 0.5""",
    "q27_simhash" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
         bits AS (
           SELECT doc_id, j.j,
                  sum(tf * CASE WHEN substr(md5(tok), j.j + 1, 1) >= '8'
                           THEN 1 ELSE -1 END) AS s
           FROM tf, range(32) j(j) GROUP BY 1, 2)
         SELECT doc_id,
                CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
                  AS simhash
         FROM bits GROUP BY 1""",
    "q28_simhash_pairs" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
         bits AS (
           SELECT doc_id, j.j,
                  sum(tf * CASE WHEN substr(md5(tok), j.j + 1, 1) >= '8'
                           THEN 1 ELSE -1 END) AS s
           FROM tf, range(32) j(j) GROUP BY 1, 2),
         sh AS (
           SELECT doc_id,
                  CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
                    AS simhash
           FROM bits GROUP BY 1),
         banded AS (SELECT doc_id, simhash, b.band,
                           (simhash // (1::BIGINT << (b.band * 8))) % 256 AS byte
                    FROM sh, range(4) b(band)),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sh_a,
                         b.doc_id AS doc_b, b.simhash AS sh_b
                  FROM banded a JOIN banded b
                    ON a.band = b.band AND a.byte = b.byte AND a.doc_id < b.doc_id)
         SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
         FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 1""",
    "q29_ann_brute" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                    FROM embeddings),
         n AS (SELECT vec_id, emb,
                      sqrt(list_reduce(list_transform(emb, x -> x * x), (a, b) -> a + b))
                        AS nrm
               FROM e),
         q AS (SELECT vec_id AS query_id, emb AS qemb, nrm AS qnrm FROM n
               WHERE vec_id < 10),
         scored AS (
           SELECT q.query_id, c.vec_id,
                  list_reduce(list_transform(c.emb, (x, i) -> x * q.qemb[i]),
                              (a, b) -> a + b) / (q.qnrm * c.nrm) AS cos
           FROM n c, q WHERE c.vec_id <> q.query_id)
         SELECT query_id, rank, neighbor_id FROM (
           SELECT query_id, vec_id AS neighbor_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, vec_id ASC) AS rank
           FROM scored) WHERE rank <= 5""",
    // q30: L=4 independent 8-bit tables (plane id = 8*table + bit, same
    // md5 sign family), probes per table = all masks with hamming <= 2
    // (j=8/k=8 encode "no flip"; k=8 OR j<k enumerates the 37 distinct
    // masks exactly once). Candidates dedup via DISTINCT before ranking.
    "q30_lsh_ann" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                    FROM embeddings),
         n AS (SELECT vec_id, emb,
                      sqrt(list_reduce(list_transform(emb, x -> x * x), (a, b) -> a + b))
                        AS nrm
               FROM e),
         proj AS (
           SELECT vec_id, p.p,
                  list_reduce(list_transform(emb, (x, i) ->
                    x * CASE WHEN substr(md5(p.p || ':' || i), 1, 1) >= '8'
                        THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END),
                    (a, b) -> a + b) AS proj
           FROM n, range(32) p(p)),
         bucket AS (SELECT vec_id, p // 8 AS tbl,
                           CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << (p % 8))
                                    ELSE 0 END) AS BIGINT) AS bucket
                    FROM proj GROUP BY 1, 2),
         b AS (SELECT n.vec_id, tbl, bucket, emb, nrm FROM n JOIN bucket USING (vec_id)),
         q AS (SELECT vec_id AS query_id, tbl, bucket AS qbucket, emb AS qemb, nrm AS qnrm
               FROM b WHERE vec_id < 10),
         probes AS (SELECT query_id, qemb, qnrm, tbl,
                    xor(xor(qbucket,
                        CASE WHEN j.j < 8 THEN (1::BIGINT << j.j) ELSE 0 END),
                        CASE WHEN k.k < 8 THEN (1::BIGINT << k.k) ELSE 0 END) AS probe
                    FROM q, range(9) j(j), range(9) k(k)
                    WHERE k.k = 8 OR j.j < k.k),
         scored AS (
           SELECT DISTINCT q.query_id, c.vec_id,
                  list_reduce(list_transform(c.emb, (x, i) -> x * q.qemb[i]),
                              (a, b) -> a + b) / (q.qnrm * c.nrm) AS cos
           FROM b c, probes q
           WHERE c.tbl = q.tbl AND c.bucket = q.probe AND c.vec_id <> q.query_id)
         SELECT query_id, rank, neighbor_id FROM (
           SELECT query_id, vec_id AS neighbor_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, vec_id ASC) AS rank
           FROM scored) WHERE rank <= 3""",
    "q31_langid" ->
      """WITH s AS (
           SELECT doc_id,
             CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'he ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'nd ', ''))) / 3 AS BIGINT) AS score_en,
             CAST((length(text) - length(replace(text, 'der', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'ein', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'sch', ''))) / 3 AS BIGINT) AS score_de,
             CAST((length(text) - length(replace(text, 'le ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'ent', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'es ', ''))) / 3 AS BIGINT) AS score_fr,
             CAST((length(text) - length(replace(text, 'de ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'la ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'os ', ''))) / 3 AS BIGINT) AS score_es
           FROM documents)
         SELECT doc_id, score_en, score_de, score_fr, score_es,
           CASE WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es THEN 'en'
                WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
                WHEN score_fr >= score_es THEN 'fr'
                ELSE 'es' END AS predicted
         FROM s""",
    "q32_quality_score" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
         s AS (SELECT doc_id, text, CAST(len(toks) AS BIGINT) AS n_tokens,
                      CAST(list_sum(list_transform(toks, x ->
                        CASE WHEN x IN ('the','a','of','and','to','in','is','it')
                        THEN 1 ELSE 0 END)) AS BIGINT) AS n_stop
               FROM t)
         SELECT doc_id, n_tokens,
                length(text) / n_tokens AS avg_token_len,
                n_stop / n_tokens AS stopword_ratio,
                least(n_tokens / 100.0, CAST(1.0 AS DOUBLE)) * 0.5
                  + least(n_stop / n_tokens * 5.0, CAST(1.0 AS DOUBLE)) * 0.5 AS quality
         FROM s""",
    "q33_token_count" ->
      """SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(list_sum(list_transform(string_split(text, ' '),
              t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS n_subwords
         FROM documents""",
    "q34_fingerprint" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                  generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents)
         SELECT doc_id,
           CAST(sum(((CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 2147483647)
                     * ((i * 2654435761) % 2147483647)) % 2147483647)
                % 2147483647 AS BIGINT) AS fingerprint
         FROM tok GROUP BY 1""",
    // PRECONDITION (q35/q39/q40): these oracles compare character
    // codepoints/offsets (ord, substr on text) against Spark's unsigned
    // bytes and byte offsets, and q39 caps frame offsets at range(1024).
    // They agree because the generated documents corpus is pure ASCII and
    // every doc is <64 KiB (both verified against the testdata); a
    // non-ASCII or >64 KiB corpus would need the oracle rewritten over
    // CAST(text AS BLOB) bytes.
    "q35_blob_meta" ->
      """SELECT doc_id,
         CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
         CAST(octet_length(CAST(text AS BLOB)) % 64 + 1 AS BIGINT) AS width,
         CAST(octet_length(CAST(text AS BLOB))
              // (octet_length(CAST(text AS BLOB)) % 64 + 1) AS BIGINT) AS height,
         CAST(list_sum(list_transform(string_split(substr(text, 1, 32), ''),
              c -> ord(c))) AS BIGINT) AS checksum32
         FROM documents""",
    // q36: naive trig DFT in DuckDB vs the radix-2 FFT expression in Spark.
    // Raw |X_k|^2 doubles are not bit-portable (libm vs JVM trig, sum
    // order), but the two engines agree to ~1e-7 absolute at these
    // magnitudes, so unit quantization with a 1/3 offset on BOTH sides
    // makes the hash exact. The offset matters: even-bin powers are exact
    // lattice rationals m/10000 that land exactly on integer AND
    // half-integer boundaries, but never within 1e-7 of k - 1/3 (see
    // Spectral.fftPower). Sign of the sin term is irrelevant to power.
    "q36_fft_power" ->
      """WITH ranked AS (
           SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) - 1 AS t
           FROM events QUALIFY t <= 7),
         full8 AS (SELECT user_id FROM ranked GROUP BY 1 HAVING count(*) = 8),
         terms AS (
           SELECT r.user_id, k.k,
             r.value * cos(2*pi()*k.k*r.t/8) AS c,
             r.value * sin(2*pi()*k.k*r.t/8) AS s
           FROM ranked r JOIN full8 USING (user_id), range(8) k(k)),
         spec AS (SELECT user_id, k, sum(c) AS re, sum(s) AS im
                  FROM terms GROUP BY 1, 2)
         SELECT user_id, CAST(k AS BIGINT) AS bin,
           CAST(floor(re*re + im*im + 0.3333333333333333) AS BIGINT) AS qpower
         FROM spec""",
    "q37_cosine_neardup" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                    FROM embeddings),
         n AS (SELECT vec_id, emb,
                      sqrt(list_reduce(list_transform(emb, x -> x*x), (a,b)->a+b)) AS nrm
               FROM e),
         proj AS (SELECT vec_id, p.p,
                list_reduce(list_transform(emb, (x, i) ->
                  x * CASE WHEN substr(md5(p.p || ':' || i), 1, 1) >= '8'
                      THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END),
                  (a, b) -> a + b) AS proj
              FROM n, range(36) p(p)),
         bits AS (SELECT vec_id, p // 6 AS band,
                  CAST(sum(CASE WHEN proj > 0
                           THEN (1::BIGINT << CAST(p % 6 AS INT)) ELSE 0 END) AS BIGINT) AS bits
                  FROM proj GROUP BY 1, 2),
         cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
                  FROM bits a JOIN bits b
                    ON a.band = b.band AND a.bits = b.bits AND a.vec_id < b.vec_id)
         SELECT c.vec_a, c.vec_b,
           list_reduce(list_transform(na.emb, (x,i) -> x * nb.emb[i]), (a,b)->a+b)
             / (na.nrm*nb.nrm) AS cos
         FROM cand c JOIN n na ON na.vec_id = c.vec_a JOIN n nb ON nb.vec_id = c.vec_b
         WHERE list_reduce(list_transform(na.emb, (x,i) -> x * nb.emb[i]), (a,b)->a+b)
             / (na.nrm*nb.nrm) >= 0.4""",
    "q38_ivf_ann" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                    FROM embeddings),
         n AS (SELECT vec_id, emb,
                      sqrt(list_reduce(list_transform(emb, x -> x*x), (a,b)->a+b)) AS nrm
               FROM e),
         cent AS (SELECT vec_id AS cent_id, emb AS cemb, nrm AS cnrm FROM n WHERE vec_id < 8),
         ranked AS (
           SELECT vec_id, cent_id, ccos,
                  row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS crk
           FROM (SELECT n.vec_id, c.cent_id,
                   list_reduce(list_transform(n.emb, (x,i) -> x * c.cemb[i]), (a,b)->a+b)
                     / (n.nrm*c.cnrm) AS ccos
                 FROM n, cent c)),
         assigned AS (SELECT vec_id, cent_id AS cell FROM ranked WHERE crk = 1),
         probes AS (SELECT vec_id AS query_id, cent_id AS cell FROM ranked
                    WHERE crk <= 2 AND vec_id < 10),
         scored AS (
           SELECT p.query_id, a.vec_id,
             list_reduce(list_transform(q.emb, (x,i) -> x * t.emb[i]), (a2,b2)->a2+b2)
               / (q.nrm*t.nrm) AS cos
           FROM probes p JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
                JOIN n q ON q.vec_id = p.query_id JOIN n t ON t.vec_id = a.vec_id)
         SELECT query_id, rank, neighbor_id FROM (
           SELECT query_id, vec_id AS neighbor_id,
                  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
           FROM scored) WHERE rank <= 3""",
    "q39_frame_sample" ->
      """SELECT d.doc_id, f.f AS frame_idx,
         CAST(least(64, octet_length(CAST(d.text AS BLOB)) - f.f*64) AS BIGINT) AS frame_len,
         CAST(list_sum(list_transform(
              string_split(substr(d.text, CAST(f.f*64+1 AS INT), 64), ''),
              c -> ord(c))) AS BIGINT) AS frame_sum
         FROM documents d, range(1024) f(f)
         WHERE f.f*64 < octet_length(CAST(d.text AS BLOB)) AND f.f % 2 = 0""",
    "q40_blob_features" ->
      """WITH c AS (SELECT doc_id, unnest(string_split(text,'')) AS ch,
                           generate_subscripts(string_split(text,''),1) AS i FROM documents)
         SELECT doc_id,
           CAST(sum(CASE WHEN (i-1)%8=0 THEN ord(ch) ELSE 0 END) AS BIGINT) AS f0,
           CAST(sum(CASE WHEN (i-1)%8=1 THEN ord(ch) ELSE 0 END) AS BIGINT) AS f1,
           CAST(sum(CASE WHEN (i-1)%8=2 THEN ord(ch) ELSE 0 END) AS BIGINT) AS f2,
           CAST(sum(CASE WHEN (i-1)%8=3 THEN ord(ch) ELSE 0 END) AS BIGINT) AS f3,
           CAST(sum(CASE WHEN (i-1)%8=4 THEN ord(ch) ELSE 0 END) AS BIGINT) AS f4,
           CAST(sum(CASE WHEN (i-1)%8=5 THEN ord(ch) ELSE 0 END) AS BIGINT) AS f5,
           CAST(sum(CASE WHEN (i-1)%8=6 THEN ord(ch) ELSE 0 END) AS BIGINT) AS f6,
           CAST(sum(CASE WHEN (i-1)%8=7 THEN ord(ch) ELSE 0 END) AS BIGINT) AS f7
         FROM c GROUP BY 1""",
    "q41_asof_merge" ->
      """SELECT o_orderkey, l_linenumber AS nearest_linenumber, l_shipdate AS nearest_shipdate
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         QUALIFY row_number() OVER (
           PARTITION BY o_orderkey
           ORDER BY abs(epoch(l_shipdate) - epoch(o_orderdate)) ASC,
                    l_shipdate ASC, l_linenumber ASC) = 1""",
    "q42_quantiles" ->
      """SELECT l_returnflag,
         quantile_cont(l_quantity, 0.25) AS q25,
         quantile_cont(l_quantity, 0.5) AS median,
         quantile_cont(l_quantity, 0.9) AS q90,
         count(*) AS n
         FROM lineitem GROUP BY l_returnflag""",
    "q43_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "q44_range_join" ->
      """SELECT p_partkey, count(*) AS n_matches, sum(l_quantity) AS sum_qty
         FROM lineitem JOIN part
           ON l_extendedprice / l_quantity BETWEEN p_retailprice - 2 AND p_retailprice + 2
         GROUP BY 1""",
    "q45_interpolate" ->
      """WITH ev AS (SELECT user_id, epoch_ms(ts) AS tms, min(value) AS v
                     FROM events GROUP BY 1, 2),
         users AS (SELECT DISTINCT user_id FROM ev),
         probes AS (SELECT u.user_id, g.t FROM users u,
                    generate_series(1704067200000, 1706745600000, 21600000) g(t)),
         prev AS (SELECT p.user_id, p.t, e.tms AS t0, e.v AS v0 FROM probes p
                  ASOF JOIN ev e ON p.user_id = e.user_id AND e.tms <= p.t),
         nxt AS (SELECT p.user_id, p.t, e.tms AS t1, e.v AS v1 FROM probes p
                 ASOF JOIN ev e ON p.user_id = e.user_id AND e.tms >= p.t)
         SELECT p.user_id, p.t AS t_ms,
           CASE WHEN n.t1 = p.t0 THEN p.v0
                ELSE p.v0 + (n.v1 - p.v0) * CAST(p.t - p.t0 AS DOUBLE)
                     / CAST(n.t1 - p.t0 AS DOUBLE) END AS value_interp
         FROM prev p JOIN nxt n ON p.user_id = n.user_id AND p.t = n.t""",
    "q46_lag_delta" ->
      """SELECT user_id, event_id, epoch_ms(ts) AS t_ms,
         epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS delta_ms,
         ntile(4) OVER w AS quartile
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts) ASC, event_id ASC)""",
    "q47_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE CAST('0x' || substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
               / 4294967296.0
             < CASE lang WHEN 'en' THEN 0.9 WHEN 'de' THEN 0.6 WHEN 'es' THEN 0.5
                         WHEN 'fr' THEN 0.4 WHEN 'zh' THEN 0.3 ELSE 0.2 END""",
    "q48_hash_split" ->
      """SELECT doc_id,
         CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
         FROM (SELECT doc_id,
                 CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                 / 4294967296.0 AS u
               FROM documents)""",
    "q49_seq_pack" ->
      """WITH d AS (
           SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 8 AS shard
           FROM documents),
         s AS (
           SELECT doc_id, shard, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens AS start_tok
           FROM d)
         SELECT doc_id, shard, start_tok // 2048 AS pack_id, n_tokens, start_tok FROM s""",
    "q50_salted_agg" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_l_quantity, count(*) AS n,
         min(l_extendedprice) AS min_l_extendedprice,
         max(l_extendedprice) AS max_l_extendedprice
         FROM lineitem GROUP BY 1""",
    "q51_salted_join" ->
      """SELECT s_suppkey, s_name, count(*) AS n_items, sum(l_quantity) AS sum_qty
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey GROUP BY 1, 2""",
    // Sliding 1h/30min windows: each event belongs to exactly the two
    // epoch-aligned 30-min starts at floor(t/30min) and one slide earlier.
    "q52_sliding_window" ->
      """WITH e AS (SELECT epoch_ms(ts) AS tms, event_type, value FROM events),
         w AS (SELECT tms, event_type, value,
                 unnest([(tms // 1800000) * 1800000,
                         (tms // 1800000) * 1800000 - 1800000]) AS ws
               FROM e)
         SELECT ws AS window_start_ms, event_type, count(*) AS n,
           cast(sum(cast(value AS decimal(18,6))) AS double) AS sum_value
         FROM w WHERE tms >= ws AND tms < ws + 3600000
         GROUP BY 1, 2""",
    "q53_vocab_topk" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         a AS (SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df
               FROM t GROUP BY 1)
         SELECT tok, tf, df, row_number() OVER (ORDER BY tf DESC, tok ASC) AS rk
         FROM a QUALIFY rk <= 200""",
    "q54_group_sample" ->
      """SELECT source, rk, doc_id FROM (
           SELECT source, doc_id,
             row_number() OVER (PARTITION BY source ORDER BY
               CAST('0x' || substr(md5('pick:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                 / 4294967296.0 ASC, doc_id ASC) AS rk
           FROM documents)
         WHERE rk <= 3""",
    "q55_revenue_rollup" ->
      """SELECT n_name, year(o_orderdate) AS o_year,
         cast(sum(cast(l_extendedprice AS decimal(12,2))
                  * cast(1.0 - l_discount AS decimal(12,2))) AS double) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY 1, 2""",
    "q56_json_extract" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
         FROM events GROUP BY 1""",
    "q57_set_ops" ->
      """SELECT 'both' AS tag, c_custkey AS custkey FROM (
           SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
           INTERSECT
           SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
         UNION ALL
         SELECT 'building_only' AS tag, c_custkey FROM (
           SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
           EXCEPT
           SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')""",
    "q58_contamination" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                  generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents),
         sh AS (
           SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
           FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                      JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
         bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 11 = 0),
         train AS (SELECT * FROM sh WHERE doc_id % 11 != 0),
         shared AS (SELECT t.doc_id, count(*) AS n_shared
                    FROM train t JOIN bench USING (shingle) GROUP BY 1),
         card AS (SELECT doc_id, count(*) AS n_total FROM train GROUP BY 1)
         SELECT s.doc_id, s.n_shared, c.n_total,
                s.n_shared / c.n_total AS contamination
         FROM shared s JOIN card c USING (doc_id)""",
    // stride-4 byte subsample; ASCII/size precondition as q35/q39/q40
    "q59_blob_resize" ->
      """WITH c AS (SELECT doc_id, unnest(string_split(text,'')) AS ch,
                           generate_subscripts(string_split(text,''),1) AS i FROM documents)
         SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_in,
           CAST(count(*) FILTER ((i-1) % 4 = 0) AS BIGINT) AS n_out,
           CAST(sum(CASE WHEN (i-1) % 4 = 0 THEN ord(ch) ELSE 0 END) AS BIGINT) AS out_sum
         FROM c GROUP BY 1""",
    "q60_stats_profile" ->
      """WITH b AS (
           SELECT event_type,
             CAST(value AS decimal(18,6)) AS xd,
             CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS decimal(18,6)) AS yd
           FROM events),
         s AS (
           SELECT event_type, count(*) AS n,
             CAST(sum(xd) AS double) AS sx, CAST(sum(yd) AS double) AS sy,
             CAST(floor(sum(xd*xd) * 100) AS BIGINT) / 100.0 AS sxx,
             CAST(floor(sum(yd*yd) * 100) AS BIGINT) / 100.0 AS syy,
             CAST(floor(sum(xd*yd) * 100) AS BIGINT) / 100.0 AS sxy
           FROM b GROUP BY 1)
         SELECT event_type, n, sx / n AS mean_value,
           (sxx - sx*sx/n) / (n-1) AS var_value,
           sqrt((sxx - sx*sx/n) / (n-1)) AS std_value,
           (sxy - sx*sy/n) / (sqrt(sxx - sx*sx/n) * sqrt(syy - sy*sy/n)) AS corr_vk
         FROM s""",
    "q61_moving_agg" ->
      """SELECT user_id, event_id, epoch_ms(ts) AS t_ms,
         CAST(sum(CAST(value AS decimal(18,6))) OVER frame AS double)
           / count(*) OVER frame AS ma5,
         CAST(sum(CAST(value AS decimal(18,6))) OVER cum AS double) AS running_sum
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts) ASC, event_id ASC),
           frame AS (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
           cum AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    // connected components of the q28 simhash near-dup pair graph:
    // cluster_id = min doc_id reachable (the oracle takes the transitive
    // closure; the engine label-propagates to the same fixpoint)
    "q62_dup_clusters" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
         bits AS (
           SELECT doc_id, j.j,
                  sum(tf * CASE WHEN substr(md5(tok), j.j + 1, 1) >= '8'
                           THEN 1 ELSE -1 END) AS s
           FROM tf, range(32) j(j) GROUP BY 1, 2),
         sh AS (
           SELECT doc_id,
                  CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
                    AS simhash
           FROM bits GROUP BY 1),
         banded AS (SELECT doc_id, simhash, b.band,
                           (simhash // (1::BIGINT << (b.band * 8))) % 256 AS byte
                    FROM sh, range(4) b(band)),
         pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM banded a JOIN banded b
                     ON a.band = b.band AND a.byte = b.byte AND a.doc_id < b.doc_id
                   WHERE bit_count(xor(a.simhash, b.simhash)) <= 1),
         edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
                   UNION SELECT doc_b, doc_a FROM pairs),
         reach(s, d) AS (
           SELECT s, d FROM edges
           UNION
           SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         mn AS (SELECT s AS doc_id, min(d) AS mn FROM reach GROUP BY 1)
         SELECT doc.doc_id, least(doc.doc_id, coalesce(mn.mn, doc.doc_id)) AS cluster_id
         FROM documents doc LEFT JOIN mn USING (doc_id)""",
    "q63_locf_gapfill" ->
      """WITH ev AS (SELECT user_id, epoch_ms(ts) AS tms, min(value) AS v
                     FROM events GROUP BY 1, 2),
         users AS (SELECT DISTINCT user_id FROM ev),
         probes AS (SELECT u.user_id, g.t FROM users u,
                    generate_series(1704067200000, 1706745600000, 21600000) g(t)),
         prev AS (SELECT p.user_id, p.t, e.tms AS t0, e.v AS v0 FROM probes p
                  ASOF JOIN ev e ON p.user_id = e.user_id AND e.tms <= p.t)
         SELECT user_id, t AS t_ms, v0 AS value_ff, t - t0 AS staleness FROM prev""",
    // synthesized contact strings (the corpus has none); patterns stay in
    // the RE2 n java.util.regex common subset
    "q64_pii_redact" ->
      """WITH a AS (
           SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
           FROM documents),
         r AS (
           SELECT doc_id, aug,
             regexp_replace(regexp_replace(aug,
               '[a-z0-9]+@[a-z][a-z.]*[a-z]', '<EMAIL>', 'g'),
               '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS red
           FROM a)
         SELECT doc_id,
           CAST(len(regexp_extract_all(aug, '[a-z0-9]+@[a-z][a-z.]*[a-z]')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(aug, '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phones,
           md5(red) AS redacted_md5,
           CAST(length(red) AS BIGINT) AS redacted_len
         FROM r""",
    "q65_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
                    WHERE len(string_split(text, ' ')) >= 3),
         tok AS (SELECT doc_id, unnest(toks) AS tok,
                        generate_subscripts(toks, 1) AS i FROM t),
         bg AS (SELECT a.doc_id, a.tok || ' ' || b.tok AS bigram
                FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
         bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
         big AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                        CAST(max(c) AS BIGINT) AS top_bigram_n FROM bc GROUP BY 1),
         tg AS (SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS tri
                FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                           JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
         tri AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
                        CAST(count(DISTINCT tri) AS BIGINT) AS n_trigrams_distinct
                 FROM tg GROUP BY 1)
         SELECT big.doc_id, n_bigrams, top_bigram_n,
                top_bigram_n / n_bigrams AS top_bigram_frac,
                n_trigrams, n_trigrams_distinct,
                1.0 - n_trigrams_distinct / n_trigrams AS dup_trigram_frac
         FROM big JOIN tri USING (doc_id)""",
    "q66_url_canon" ->
      """WITH u AS (SELECT doc_id,
           (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://WWW.' ELSE 'https://www.' END)
           || source || '.example.com/' || lang || '/item'
           || CAST(doc_id % 50 AS VARCHAR)
           || (CASE WHEN doc_id % 2 = 0
               THEN '/?utm_source=feed&ref=' || CAST(doc_id AS VARCHAR)
               ELSE '' END) AS url
           FROM documents),
         c AS (SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             lower(url), '^https?://', ''), '^www\.', ''), '\?.*$', ''),
             '/$', '') AS canon_url
           FROM u)
         SELECT canon_url, count(*) AS n_urls, min(doc_id) AS keep_id
         FROM c GROUP BY 1""",
    "q67_embed_quant" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                    FROM embeddings),
         r AS (SELECT vec_id, emb, list_min(emb) AS lo, list_max(emb) AS hi FROM e),
         s AS (SELECT vec_id, emb, lo, hi, (hi - lo) / 255.0 AS scale FROM r),
         q AS (SELECT vec_id, emb, lo, hi, scale,
                 list_transform(emb, x -> CASE WHEN scale = 0 THEN CAST(0 AS BIGINT)
                   ELSE least(CAST(255 AS BIGINT), CAST(floor((x - lo) / scale) AS BIGINT)) END)
                   AS codes
               FROM s)
         SELECT vec_id, lo, hi,
           CAST(list_reduce(codes, (a, b) -> a + b) AS BIGINT) AS q_sum,
           list_reduce(list_transform(emb, (x, i) ->
             abs(x - (lo + codes[i] * scale))), (a, b) -> greatest(a, b)) AS err_max
         FROM q""",
    "q68_kmeans_step" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                    FROM embeddings),
         n AS (SELECT vec_id, emb,
                      sqrt(list_reduce(list_transform(emb, x -> x*x), (a,b)->a+b)) AS nrm
               FROM e),
         cent AS (SELECT vec_id AS cent_id, emb AS cemb, nrm AS cnrm FROM n WHERE vec_id < 8),
         ranked AS (
           SELECT vec_id, cent_id,
                  row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS crk
           FROM (SELECT n.vec_id, c.cent_id,
                   list_reduce(list_transform(n.emb, (x,i) -> x * c.cemb[i]), (a,b)->a+b)
                     / (n.nrm*c.cnrm) AS ccos
                 FROM n, cent c)),
         assigned AS (SELECT vec_id, cent_id AS cell FROM ranked WHERE crk = 1),
         comp AS (SELECT a.cell, generate_subscripts(e2.emb, 1) - 1 AS dim,
                         unnest(e2.emb) AS x
                  FROM assigned a JOIN n e2 ON e2.vec_id = a.vec_id)
         SELECT cell, CAST(dim AS BIGINT) AS dim, count(*) AS n_members,
           CAST(sum(CAST(floor(x * 1000000) AS BIGINT)) AS BIGINT) / 1000000.0 / count(*)
             AS centroid
         FROM comp GROUP BY 1, 2""",
    "q69_ohlc_downsample" ->
      """WITH e AS (SELECT user_id, epoch_ms(date_trunc('hour', ts)) AS bucket_ms,
                           epoch_ms(ts) AS tms, event_id, value FROM events),
         o AS (SELECT user_id, bucket_ms, value AS open FROM e
               QUALIFY row_number() OVER (PARTITION BY user_id, bucket_ms
                 ORDER BY tms ASC, event_id ASC) = 1),
         c AS (SELECT user_id, bucket_ms, value AS close FROM e
               QUALIFY row_number() OVER (PARTITION BY user_id, bucket_ms
                 ORDER BY tms DESC, event_id DESC) = 1),
         a AS (SELECT user_id, bucket_ms, max(value) AS high, min(value) AS low,
                      count(*) AS n FROM e GROUP BY 1, 2)
         SELECT a.user_id, a.bucket_ms, o.open, a.high, a.low, c.close, a.n
         FROM a JOIN o USING (user_id, bucket_ms) JOIN c USING (user_id, bucket_ms)""",
    // encode against the q53 vocabulary: id = rank-1 (top-200 by tf), OOV -> -1;
    // checksum weights ids by 1-based token position
    "q70_token_ids" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         a AS (SELECT tok, count(*) AS tf FROM t GROUP BY 1),
         v AS (SELECT tok, CAST(row_number() OVER (ORDER BY tf DESC, tok ASC) - 1 AS BIGINT)
                 AS tok_id
               FROM a QUALIFY row_number() OVER (ORDER BY tf DESC, tok ASC) <= 200),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                        generate_subscripts(string_split(text, ' '), 1) AS i
                 FROM documents),
         enc AS (SELECT tok.doc_id, tok.i, coalesce(v.tok_id, -1) AS id
                 FROM tok LEFT JOIN v USING (tok))
         SELECT doc_id, count(*) AS n_tokens,
           CAST(sum(CASE WHEN id = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(sum(id * i) AS BIGINT) AS ids_checksum
         FROM enc GROUP BY 1""",
    "q71_keep_latest" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS tms, event_id, value
                    FROM events),
         latest AS (SELECT user_id, event_type, tms AS last_ms,
                           event_id AS last_event_id, value AS last_value
                    FROM e QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                      ORDER BY tms DESC, event_id DESC, value DESC) = 1),
         c AS (SELECT user_id, event_type, count(*) - 1 AS n_superseded
               FROM e GROUP BY 1, 2)
         SELECT l.user_id, l.event_type, l.last_ms, l.last_event_id, l.last_value,
                c.n_superseded
         FROM latest l JOIN c USING (user_id, event_type)""",
    "q72_winsorize" ->
      """WITH th AS (SELECT l_returnflag,
                            quantile_cont(l_quantity, 0.1) AS p10,
                            quantile_cont(l_quantity, 0.9) AS p90
                     FROM lineitem GROUP BY 1),
         c AS (SELECT l.l_returnflag,
                 least(greatest(l.l_quantity, th.p10), th.p90) AS clip,
                 CASE WHEN l.l_quantity < th.p10 THEN 1 ELSE 0 END AS lo,
                 CASE WHEN l.l_quantity > th.p90 THEN 1 ELSE 0 END AS hi
               FROM lineitem l JOIN th USING (l_returnflag))
         SELECT l_returnflag,
           cast(sum(cast(clip AS decimal(18,6))) AS double) AS sum_clipped,
           CAST(sum(lo) AS BIGINT) AS n_clipped_low,
           CAST(sum(hi) AS BIGINT) AS n_clipped_high,
           count(*) AS n
         FROM c GROUP BY 1""",
    // mean/std from exact decimal sums (the q60 machinery) so both
    // engines normalize with identical doubles
    "q73_zscore" ->
      """WITH b AS (SELECT event_type, event_id, value,
                           CAST(value AS decimal(18,6)) AS xd FROM events),
         s AS (SELECT event_type, count(*) AS n, CAST(sum(xd) AS double) AS sx,
                      CAST(floor(sum(xd*xd) * 100) AS BIGINT) / 100.0 AS sxx
               FROM b GROUP BY 1),
         t AS (SELECT event_type, sx / n AS mean,
                      sqrt((sxx - sx*sx/n) / (n-1)) AS std FROM s)
         SELECT b.event_id, b.event_type, (b.value - t.mean) / t.std AS z
         FROM b JOIN t USING (event_type)""",
    // least-squares per user from exact decimal sums (q60 machinery);
    // time rebased to seconds from the corpus epoch. The xd products are
    // upcast to decimal(28,6) first: DuckDB computes width<=18 decimal
    // multiplications in int64, and epoch-second offsets squared overflow
    // it (the upcast routes through int128; the exact value is identical)
    "q74_linear_trend" ->
      """WITH b AS (SELECT user_id,
                           CAST((epoch_ms(ts) - 1704067200000) / 1000.0
                                AS decimal(18,6)) AS xd,
                           CAST(value AS decimal(18,6)) AS yd
                    FROM events),
         s AS (SELECT user_id, count(*) AS n,
                      CAST(sum(xd) AS double) AS sx, CAST(sum(yd) AS double) AS sy,
                      CAST(floor(sum(CAST(xd AS decimal(28,6)) * xd) * 100) AS BIGINT) / 100.0 AS sxx,
                      CAST(floor(sum(CAST(xd AS decimal(28,6)) * yd) * 100) AS BIGINT) / 100.0 AS sxy
               FROM b GROUP BY 1)
         SELECT user_id, n,
           (n*sxy - sx*sy) / (n*sxx - sx*sx) AS slope,
           (sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n AS intercept
         FROM s WHERE n >= 2 AND (n*sxx - sx*sx) <> 0.0""",
    // Walsh-Hadamard: H(k,j) = (-1)^popcount(k&j) is integer-exact, so
    // the spectral sum is an exact decimal — the oracle-checkable twin of
    // the rows-only FFT (q36)
    "q75_wht_power" ->
      """WITH ranked AS (
           SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) - 1 AS j
           FROM events QUALIFY j <= 7),
         full8 AS (SELECT user_id FROM ranked GROUP BY 1 HAVING count(*) = 8),
         terms AS (SELECT r.user_id, k.k,
             CASE WHEN bit_count(k.k & r.j) % 2 = 0
                  THEN CAST(r.value AS decimal(18,6))
                  ELSE -CAST(r.value AS decimal(18,6)) END AS term
           FROM ranked r JOIN full8 USING (user_id), range(8) k(k))
         SELECT user_id, CAST(k AS BIGINT) AS k, CAST(sum(term) AS double) AS coef
         FROM terms GROUP BY 1, 2""",
    // q76: 3-D contour path — grid cells derive from lineitem DOUBLEs with
    // exact dyadic arithmetic; max over doubles is order-independent, so
    // no quantization is needed
    "q76_psi_slice_max3d" ->
      """WITH cells AS (
           SELECT CAST(l_orderkey % 20 AS BIGINT) AS t,
                  10.0 + l_linenumber * 0.5 AS rv,
                  (l_suppkey % 10) * 0.25 AS zv,
                  max(l_extendedprice / 100.0) AS psi
           FROM lineitem GROUP BY 1, 2, 3),
         sliced AS (SELECT * FROM cells
                    WHERE rv BETWEEN 10.5 AND 12.5 AND zv BETWEEN 0.5 AND 2.0),
         ranked AS (SELECT t, rv, zv, psi,
             row_number() OVER (PARTITION BY t ORDER BY psi DESC, rv ASC, zv ASC) AS rn,
             count(*) OVER (PARTITION BY t) AS n_cells
           FROM sliced)
         SELECT t, CAST(n_cells AS BIGINT) AS n_cells,
                rv AS r_at_max, zv AS z_at_max, psi AS max_psi
         FROM ranked WHERE rn = 1""",
    // q77: the per-language thresholds repeat the Spark arithmetic term
    // for term (left-associative, sqrt not pow); the +1/3 offset makes
    // the integer thresholds immune to the renormalization sum's
    // engine-order 1-ulp wobble
    "q77_mixture_sample" ->
      """WITH s AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY 1),
         e AS (SELECT lang, n_l,
                 CAST(sum(n_l) OVER () AS BIGINT) AS n_total,
                 sqrt(CAST(n_l AS DOUBLE) / CAST(sum(n_l) OVER () AS BIGINT)) AS w
               FROM s),
         t AS (SELECT lang,
                 CAST(floor(least(1.0, w / sum(w) OVER () * 0.5 * n_total / n_l)
                      * 4294967296.0 + 1.0/3) AS BIGINT) AS thr
               FROM e)
         SELECT d.doc_id, d.lang FROM documents d JOIN t USING (lang)
         WHERE CAST('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
               < t.thr""",
    // q78: salience = tf/df on exact longs — the double division is the
    // identical IEEE value in both engines, so the ranking is exact with
    // no quantization (unlike ln-based tf-idf)
    "q78_salient_terms" ->
      """WITH tf AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         tfc AS (SELECT doc_id, tok, count(*) AS tf FROM tf GROUP BY 1, 2),
         dfc AS (SELECT tok, count(*) AS df FROM tfc GROUP BY 1),
         ranked AS (
           SELECT doc_id, tok, tf, df,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY CAST(tf AS DOUBLE) / df DESC, tok ASC) AS rk
           FROM tfc JOIN dfc USING (tok))
         SELECT doc_id, CAST(rk AS BIGINT) AS rk, tok, tf, df
         FROM ranked WHERE rk <= 3""",
    // q79: q62's recursive-CTE cluster closure composed with q32's
    // quality expression; keeper = highest quality, doc_id asc on ties
    "q79_cluster_keepers" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
         bits AS (
           SELECT doc_id, j.j,
                  sum(tf * CASE WHEN substr(md5(tok), j.j + 1, 1) >= '8'
                           THEN 1 ELSE -1 END) AS s
           FROM tf, range(32) j(j) GROUP BY 1, 2),
         sh AS (
           SELECT doc_id,
                  CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
                    AS simhash
           FROM bits GROUP BY 1),
         banded AS (SELECT doc_id, simhash, b.band,
                           (simhash // (1::BIGINT << (b.band * 8))) % 256 AS byte
                    FROM sh, range(4) b(band)),
         pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM banded a JOIN banded b
                     ON a.band = b.band AND a.byte = b.byte AND a.doc_id < b.doc_id
                   WHERE bit_count(xor(a.simhash, b.simhash)) <= 1),
         edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
                   UNION SELECT doc_b, doc_a FROM pairs),
         reach(s, d) AS (
           SELECT s, d FROM edges
           UNION
           SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         mn AS (SELECT s AS doc_id, min(d) AS mn FROM reach GROUP BY 1),
         clusters AS (
           SELECT doc.doc_id, least(doc.doc_id, coalesce(mn.mn, doc.doc_id)) AS cluster_id
           FROM documents doc LEFT JOIN mn USING (doc_id)),
         qt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         qs AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                       CAST(list_sum(list_transform(toks, x ->
                         CASE WHEN x IN ('the','a','of','and','to','in','is','it')
                         THEN 1 ELSE 0 END)) AS BIGINT) AS n_stop
                FROM qt),
         q AS (SELECT doc_id,
                 least(n_tokens / 100.0, CAST(1.0 AS DOUBLE)) * 0.5
                   + least(n_stop / n_tokens * 5.0, CAST(1.0 AS DOUBLE)) * 0.5 AS quality
               FROM qs),
         j AS (SELECT c.doc_id, c.cluster_id, q.quality
               FROM clusters c JOIN q USING (doc_id)),
         k AS (SELECT cluster_id, doc_id AS keeper_id FROM (
                 SELECT cluster_id, doc_id,
                   row_number() OVER (PARTITION BY cluster_id
                     ORDER BY quality DESC, doc_id ASC) AS rn
                 FROM j) WHERE rn = 1),
         n AS (SELECT cluster_id, count(*) AS n_docs FROM j GROUP BY 1)
         SELECT j.doc_id, j.cluster_id, k.keeper_id,
                j.doc_id = k.keeper_id AS is_keeper, n.n_docs
         FROM j JOIN k USING (cluster_id) JOIN n USING (cluster_id)""",
    // q80: BM25 with every formula input exact (integer tf/dl/df/N; avgdl
    // = exact long sum / count), per-term contributions added in FIXED
    // literal order, and ln()'s 1-ulp libm wobble absorbed by the q36-
    // style offset quantization floor(x*1e4 + 1/3)
    "q80_bm25_score" ->
      """WITH base AS (
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
             CAST(len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS BIGINT) AS tf_spark,
             CAST(len(list_filter(string_split(text, ' '), x -> x = 'join')) AS BIGINT) AS tf_join,
             CAST(len(list_filter(string_split(text, ' '), x -> x = 'query')) AS BIGINT) AS tf_query
           FROM documents),
         stats AS (
           SELECT count(*) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
             sum(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark,
             sum(CASE WHEN tf_join  > 0 THEN 1 ELSE 0 END) AS df_join,
             sum(CASE WHEN tf_query > 0 THEN 1 ELSE 0 END) AS df_query
           FROM base)
         SELECT doc_id, tf_spark, tf_join, tf_query,
           CAST(floor((
               ln((n_docs - df_spark + 0.5) / (df_spark + 0.5) + 1.0)
                 * (CAST(tf_spark AS DOUBLE) * 2.2)
                 / (CAST(tf_spark AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln((n_docs - df_join + 0.5) / (df_join + 0.5) + 1.0)
                 * (CAST(tf_join AS DOUBLE) * 2.2)
                 / (CAST(tf_join AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl))
             + ln((n_docs - df_query + 0.5) / (df_query + 0.5) + 1.0)
                 * (CAST(tf_query AS DOUBLE) * 2.2)
                 / (CAST(tf_query AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl))
             ) * 10000 + 1.0/3) AS BIGINT) AS score_q
         FROM base, stats""",
    // q82: the composed curation verdict — langid (q31 scoring) +
    // quality (q32 formula) + exact-dedup keeper (q24 fingerprint), one
    // row per document. quality's IEEE ops are order-identical to q32's
    // (hash-proven there), so the >= 0.5 verdict agrees bit-for-bit.
    "q82_curation_pipeline" ->
      """WITH s AS (
           SELECT doc_id, text,
             CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'he ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'nd ', ''))) / 3 AS BIGINT) AS score_en,
             CAST((length(text) - length(replace(text, 'der', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'ein', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'sch', ''))) / 3 AS BIGINT) AS score_de,
             CAST((length(text) - length(replace(text, 'le ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'ent', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'es ', ''))) / 3 AS BIGINT) AS score_fr,
             CAST((length(text) - length(replace(text, 'de ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'la ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'os ', ''))) / 3 AS BIGINT) AS score_es,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(list_sum(list_transform(string_split(text, ' '), x ->
               CASE WHEN x IN ('the','a','of','and','to','in','is','it')
               THEN 1 ELSE 0 END)) AS BIGINT) AS n_stop,
             doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_keeper
           FROM documents),
         v AS (
           SELECT doc_id,
             CASE WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es THEN 'en'
                  WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
                  WHEN score_fr >= score_es THEN 'fr'
                  ELSE 'es' END AS predicted,
             n_tokens,
             least(n_tokens / 100.0, CAST(1.0 AS DOUBLE)) * 0.5
               + least(n_stop / n_tokens * 5.0, CAST(1.0 AS DOUBLE)) * 0.5 AS quality,
             is_keeper
           FROM s)
         SELECT doc_id, predicted, n_tokens, quality, is_keeper,
                is_keeper AND quality >= 0.5 AS kept
         FROM v""",
    // q83: the bloom prefilter is a pure pruning step — the exact semi
    // join guarantees the result equals the plain semi join, so the
    // oracle is the plain form
    "q83_bloom_semijoin" ->
      """SELECT l_returnflag, count(*) AS n_items,
           sum(l_quantity) AS sum_qty,
           cast(sum(cast(l_extendedprice AS decimal(12,2))) AS double) AS sum_price
         FROM lineitem
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_orderkey = l_orderkey AND o_totalprice > 150000.0)
         GROUP BY 1""",
    // q84: boilerplate synthesis mirrors the Spark side (q64 pattern);
    // line identity via md5 on both engines; 5%-of-corpus threshold
    "q84_boilerplate" ->
      """WITH a AS (
           SELECT doc_id, text
             || CASE WHEN doc_id % 3 = 0 THEN ' | subscribe to our newsletter for daily updates' ELSE '' END
             || CASE WHEN doc_id % 7 = 0 THEN ' | all rights reserved contact us for details' ELSE '' END AS aug
           FROM documents),
         l0 AS (SELECT doc_id, unnest(string_split(aug, ' | ')) AS line FROM a),
         l AS (SELECT doc_id, md5(line) AS lh FROM l0),
         d AS (SELECT lh, count(DISTINCT doc_id) AS line_df FROM l GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents),
         g AS (
           SELECT doc_id, count(*) AS n_lines,
             CAST(sum(CASE WHEN line_df >= n_docs * 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
           FROM l JOIN d USING (lh), n
           GROUP BY doc_id)
         SELECT doc_id, n_lines, n_boiler,
           n_boiler / n_lines AS boiler_frac,
           n_boiler / n_lines <= 0.5 AS kept
         FROM g""",
    // q86: q28's candidate chain + exact Levenshtein verify on the
    // 200-char prefix (both engines implement standard Levenshtein;
    // norm_sim's single int/int division is IEEE-identical)
    "q86_edit_verify" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
         bits AS (
           SELECT doc_id, j.j,
                  sum(tf * CASE WHEN substr(md5(tok), j.j + 1, 1) >= '8'
                           THEN 1 ELSE -1 END) AS s
           FROM tf, range(32) j(j) GROUP BY 1, 2),
         sh AS (
           SELECT doc_id,
                  CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
                    AS simhash
           FROM bits GROUP BY 1),
         banded AS (SELECT doc_id, simhash, b.band,
                           (simhash // (1::BIGINT << (b.band * 8))) % 256 AS byte
                    FROM sh, range(4) b(band)),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sh_a,
                         b.doc_id AS doc_b, b.simhash AS sh_b
                  FROM banded a JOIN banded b
                    ON a.band = b.band AND a.byte = b.byte AND a.doc_id < b.doc_id),
         p AS (SELECT doc_a, doc_b,
                      CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
               FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 1)
         SELECT doc_a, doc_b, hamming,
           CAST(levenshtein(substring(da.text, 1, 200), substring(db.text, 1, 200)) AS BIGINT) AS edit_dist,
           1.0 - levenshtein(substring(da.text, 1, 200), substring(db.text, 1, 200))
                 / greatest(length(substring(da.text, 1, 200)), length(substring(db.text, 1, 200))) AS norm_sim
         FROM p
         JOIN documents da ON p.doc_a = da.doc_id
         JOIN documents db ON p.doc_b = db.doc_id""",
    // q89: winnowing — positional 8-shingle md5s, sliding 4-window min
    // (identical frame semantics both engines), distinct fingerprints,
    // equality-joined pairs with a >= 3 shared-fp floor
    "q89_winnow_overlap" ->
      """WITH t AS (
           SELECT doc_id,
             string_split(text || CASE WHEN doc_id % 53 = 0
               THEN ' winnow shared passage marker alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu'
               ELSE '' END, ' ') AS toks
           FROM documents),
         w AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 8),
         sh AS (
           SELECT doc_id,
             unnest(range(1, len(toks) - 6)) AS pos,
             unnest(list_transform(range(1, len(toks) - 6),
               i -> md5(array_to_string(toks[i:i+7], ' ')))) AS h
           FROM w),
         m AS (
           SELECT doc_id,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
           FROM sh),
         f AS (SELECT DISTINCT doc_id, fp FROM m),
         g AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  CAST(count(*) AS BIGINT) AS n_shared_fp
           FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT doc_a, doc_b, n_shared_fp FROM g WHERE n_shared_fp >= 3""",
    // q90: inverted-index tf-cosine over positional 3-shingles — all
    // arithmetic on BIGINT counts; the cos >= 4/5 test is cross-
    // multiplied (25·dot² >= 16·|a|²·|b|²) so neither engine touches
    // sqrt/division. Norms are over the FULL tf vector; the df cut
    // sparsifies only the dot dimensions (conservative for dedup)
    "q90_tf_cosine" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         sh0 AS (
           SELECT doc_id,
             unnest(list_transform(range(1, len(toks) - 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS sh
           FROM t WHERE len(toks) >= 3),
         tf AS (SELECT doc_id, sh, CAST(count(*) AS BIGINT) AS tf
                FROM sh0 GROUP BY 1, 2),
         nd AS (SELECT count(*) AS n_docs FROM documents),
         keptt AS (SELECT sh FROM tf, nd GROUP BY sh, n_docs
                   HAVING count(*) * 4 <= n_docs),
         kept AS (SELECT tf.* FROM tf JOIN keptt USING (sh)),
         nrm AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS nrm2
                 FROM tf GROUP BY 1),
         d AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  CAST(sum(a.tf * b.tf) AS BIGINT) AS dot,
                  CAST(count(*) AS BIGINT) AS n_shared_terms
           FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT doc_a, doc_b, n_shared_terms, dot,
                na.nrm2 AS nrm2_a, nb.nrm2 AS nrm2_b
         FROM d
         JOIN nrm na ON na.doc_id = d.doc_a
         JOIN nrm nb ON nb.doc_id = d.doc_b
         WHERE dot * dot * 25 >= na.nrm2 * nb.nrm2 * 16""",
    // q93: q32's quality, quantized to a 1e-6 integer grid, drives a
    // histogram-cumsum cutoff at budget = total_tokens div 4; the
    // boundary bucket resolves by doc_id running sum — all integer
    // comparisons, so the kept set is engine-exact
    "q93_token_budget" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
         s AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                      CAST(list_sum(list_transform(toks, x ->
                        CASE WHEN x IN ('the','a','of','and','to','in','is','it')
                        THEN 1 ELSE 0 END)) AS BIGINT) AS n_stop
               FROM t),
         scored AS (SELECT doc_id, n_tokens,
           CAST(floor((least(n_tokens / 100.0, CAST(1.0 AS DOUBLE)) * 0.5
             + least(n_stop / n_tokens * 5.0, CAST(1.0 AS DOUBLE)) * 0.5)
             * 1000000 + 1.0/3) AS BIGINT) AS score_q
           FROM s),
         tot AS (SELECT sum(n_tokens) // 4 AS budget FROM scored),
         h AS (SELECT score_q, sum(n_tokens) AS tok_s FROM scored GROUP BY 1),
         cum AS (SELECT score_q, tok_s,
                   sum(tok_s) OVER (ORDER BY score_q DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_incl
                 FROM h),
         cum2 AS (SELECT score_q, cum_incl, cum_incl - tok_s AS cum_before, budget
                  FROM cum, tot),
         full_k AS (SELECT scored.doc_id, scored.n_tokens, scored.score_q
                    FROM scored JOIN cum2 USING (score_q)
                    WHERE cum_incl <= budget),
         bnd AS (SELECT scored.doc_id, scored.n_tokens, scored.score_q,
                   cum_before, budget,
                   sum(scored.n_tokens) OVER (PARTITION BY scored.score_q
                     ORDER BY scored.doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS doc_cum
                 FROM scored JOIN cum2 USING (score_q)
                 WHERE cum_incl > budget AND cum_before < budget)
         SELECT doc_id, n_tokens, score_q FROM full_k
         UNION ALL
         SELECT doc_id, n_tokens, score_q FROM bnd
         WHERE cum_before + doc_cum <= budget""",
    // q92: upper-triangle Gram matrix; products offset-quantized to
    // BIGINT before the sum (sum-of-longs is shuffle-order-free; the
    // doubles themselves are identical IEEE on both engines)
    "q92_embed_gram" ->
      """WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                    FROM embeddings),
         x AS (SELECT vec_id,
                 generate_subscripts(emb, 1) - 1 AS i,
                 unnest(emb) AS vi
               FROM e)
         SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(a.vi * b.vi * 1000000 + 1.0/3) AS BIGINT)) AS BIGINT) AS gram_q
         FROM x a JOIN x b ON a.vec_id = b.vec_id AND b.i >= a.i
         GROUP BY 1, 2""",
    // q91: chunk count ceil(max(n-16,1)/48) = greatest((n+31)//48, 1);
    // both engines' list slices truncate past the end, so the tail
    // chunk hashes identically
    "q91_chunk_windows" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_toks FROM t),
         c AS (SELECT doc_id, toks, n_toks,
                 unnest(range(0, greatest((n_toks + 31) // 48, 1))) AS k
               FROM n)
         SELECT doc_id, n_toks,
           CAST(k + 1 AS BIGINT) AS chunk_id,
           CAST(k * 48 + 1 AS BIGINT) AS start_tok,
           CAST(least(64, n_toks - k * 48) AS BIGINT) AS n_chunk_toks,
           md5(array_to_string(toks[CAST(k*48+1 AS INT) : CAST(k*48+64 AS INT)], ' ')) AS chunk_hash
         FROM c""",
    // q88: q26's seed-keyed md5 minhash construction, aggregated per
    // SOURCE; string mins are engine-exact (hex md5 compares as ASCII)
    "q88_source_overlap" ->
      """WITH tok AS (
           SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok,
                  generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents),
         sh AS (
           SELECT DISTINCT a.source, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
           FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                      JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
         mh AS (SELECT s.source, sd.seed, min(md5(sd.seed || ':' || s.shingle)) AS mh
                FROM sh s, range(12) sd(seed) GROUP BY 1, 2),
         g AS (
           SELECT a.source AS src_a, b.source AS src_b,
             CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_match
           FROM mh a JOIN mh b ON a.seed = b.seed AND a.source < b.source
           GROUP BY 1, 2)
         SELECT src_a, src_b, n_match, n_match / 12 AS est_jaccard FROM g""",
    // q87: per-token surprisal quantized to LONG before the per-doc sum
    // — sum-of-longs is order-free, so shuffle order can't perturb the
    // hash; only the mean's single long/long division stays IEEE
    "q87_unigram_surprisal" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         v AS (SELECT tok, count(*) AS n_t FROM t GROUP BY 1),
         s AS (SELECT sum(n_t) AS n_total FROM v),
         g AS (
           SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(CAST(floor(ln(n_total / n_t) * 10000 + 1.0/3) AS BIGINT)) AS BIGINT)
               AS surprisal_q
           FROM t JOIN v USING (tok), s
           GROUP BY doc_id)
         SELECT doc_id, n_tokens, surprisal_q,
                surprisal_q / n_tokens AS mean_surprisal_q
         FROM g""",
    // q85: BPE pair counting — integer counts, deterministic tie-break
    // by pair text so the LIMIT cut agrees on every engine
    "q85_bpe_pairs" ->
      """WITH toks AS (
           SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         pairs AS (
           SELECT unnest(list_transform(range(1, length(tok)),
             i -> substring(tok, CAST(i AS INT), 2))) AS pair
           FROM toks)
         SELECT pair, count(*) AS n FROM pairs
         GROUP BY 1 ORDER BY n DESC, pair LIMIT 20""",
    // q81: integer-exact equal-width binning — no float edges to wobble
    "q81_length_histogram" ->
      """WITH bounds AS (SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM documents)
         SELECT ((n_chars - mn) * 16) // (mx + 1 - mn) AS bin,
           count(*) AS n, min(n_chars) AS lo_chars, max(n_chars) AS hi_chars
         FROM documents, bounds
         GROUP BY 1""",
    // q94: SemDeDup — cell assignment identical to q38/q68 (argmax by
    // cosine, min-cent_id tie); within-cell cosines are the same
    // left-to-right IEEE sums on both engines, so the >= 0.35 verdict
    // needs no quantization — only the reported max cos is quantized
    "q94_semantic_dedup" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                    FROM embeddings),
         n AS (SELECT vec_id, emb,
                      sqrt(list_reduce(list_transform(emb, x -> x*x), (a,b)->a+b)) AS nrm
               FROM e),
         cent AS (SELECT vec_id AS cent_id, emb AS cemb, nrm AS cnrm FROM n WHERE vec_id < 8),
         ranked AS (
           SELECT vec_id, cent_id,
                  row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS crk
           FROM (SELECT n.vec_id, c.cent_id,
                   list_reduce(list_transform(n.emb, (x,i) -> x * c.cemb[i]), (a,b)->a+b)
                     / (n.nrm*c.cnrm) AS ccos
                 FROM n, cent c)),
         assigned AS (SELECT r.vec_id, r.cent_id AS cell, n.emb, n.nrm
                      FROM ranked r JOIN n USING (vec_id) WHERE crk = 1),
         d AS (
           SELECT b.vec_id, count(*) AS n_earlier_dups,
             CAST(floor(max(cos) * 1000000 + 1.0/3) AS BIGINT) AS max_cos_q
           FROM (SELECT a.vec_id AS va, b.vec_id,
                   list_reduce(list_transform(a.emb, (x,i) -> x * b.emb[i]), (a2,b2)->a2+b2)
                     / (a.nrm*b.nrm) AS cos
                 FROM assigned a JOIN assigned b
                   ON a.cell = b.cell AND a.vec_id < b.vec_id) b
           WHERE cos >= 0.35
           GROUP BY 1)
         SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell,
                CAST(coalesce(d.n_earlier_dups, 0) AS BIGINT) AS n_earlier_dups,
                CAST(coalesce(d.max_cos_q, -2000000) AS BIGINT) AS max_cos_q,
                d.n_earlier_dups IS NULL AS kept
         FROM assigned a LEFT JOIN d USING (vec_id)""",
    // q95: hashing-trick linear classifier — all-integer weights from
    // md5, so the margin matches bit-for-bit with no quantization
    "q95_hash_classifier" ->
      """SELECT doc_id, n_tokens, margin, margin > 0 AS keep FROM (
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(coalesce(list_sum(list_transform(string_split(text, ' '),
               t -> (CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) % 201) - 100)), 0)
               AS BIGINT) AS margin
           FROM documents)""",
    // q96: KL numerator as a sum of longs — each term's ln is offset-
    // quantized BEFORE the per-source sum (the q87 associativity dodge);
    // the ln argument is one IEEE division of exact-long products
    "q96_source_kl" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
         st AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS n_st FROM t GROUP BY 1, 2),
         tt AS (SELECT tok, CAST(sum(n_st) AS BIGINT) AS n_t FROM st GROUP BY 1),
         srct AS (SELECT source, CAST(sum(n_st) AS BIGINT) AS n_s FROM st GROUP BY 1),
         tot AS (SELECT CAST(sum(n_t) AS BIGINT) AS n_total FROM tt)
         SELECT source, max(n_s) AS n_tokens, count(*) AS n_distinct_toks,
           CAST(sum(n_st * CAST(floor(
             ln(CAST(n_st * n_total AS DOUBLE) / (n_t * n_s)) * 10000 + 1.0/3)
             AS BIGINT)) AS BIGINT) AS kl_q
         FROM st JOIN tt USING (tok) JOIN srct USING (source), tot
         GROUP BY source""",
    // q97: bigrams from adjacent-position self-join (the oracle twin of
    // the engine's array-tail zip); counts and KN continuation counts are
    // exact integers, p_cont is one long/long IEEE division
    "q97_bigram_stats" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                  generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents),
         p AS (SELECT a.tok AS w1, b.tok AS w2
               FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
         counts AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM p GROUP BY 1, 2),
         fert AS (SELECT w1, CAST(count(*) AS BIGINT) AS fert_w1 FROM counts GROUP BY 1),
         cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS cont_w2 FROM counts GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_bigrams FROM counts),
         top AS (SELECT * FROM counts ORDER BY c DESC, w1, w2 LIMIT 30)
         SELECT w1, w2, c, fert_w1, cont_w2, cont_w2 / n_bigrams AS p_cont
         FROM top JOIN fert USING (w1) JOIN cont USING (w2), tot""",
    // q98: PQ encode — dist = (‖x‖² − 2·x·c) + ‖c‖², every term a fixed
    // left-to-right IEEE sum matching the engine's native dot kernel
    // (argmin needs no quantization, ties break to the min code); only
    // the reported distance is offset-quantized
    "q98_pq_encode" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                    FROM embeddings),
         cb AS (SELECT vec_id AS code, emb AS cemb FROM e WHERE vec_id < 8),
         sd AS (
           SELECT e.vec_id, s.s AS sub, cb.code,
             (list_reduce(list_transform(
                 e.emb[CAST(s.s*8+1 AS INT):CAST(s.s*8+8 AS INT)], x -> x*x),
                 (a, b) -> a + b)
              - 2.0 * list_reduce(list_transform(
                  e.emb[CAST(s.s*8+1 AS INT):CAST(s.s*8+8 AS INT)],
                  (x, i) -> x * cb.cemb[CAST(s.s*8 + i AS INT)]),
                  (a, b) -> a + b))
             + list_reduce(list_transform(
                 cb.cemb[CAST(s.s*8+1 AS INT):CAST(s.s*8+8 AS INT)], x -> x*x),
                 (a, b) -> a + b) AS dist
           FROM e, range(8) s(s), cb),
         r AS (SELECT vec_id, sub, code, dist,
                 row_number() OVER (PARTITION BY vec_id, sub
                   ORDER BY dist ASC, code ASC) AS rk
               FROM sd)
         SELECT vec_id, CAST(sub AS BIGINT) AS sub, CAST(code AS BIGINT) AS code,
           CAST(floor(dist * 1000000 + 1.0/3) AS BIGINT) AS dist_q
         FROM r WHERE rk = 1""",
    // q99: integer-exact end to end — q92's quantized Gram, 4 power
    // steps renormalized to the 1e6 grid with trunc-toward-zero (the
    // CASE emulates trunc over // floor division; sums promote to
    // HUGEINT so nothing overflows), long projection sums
    "q99_pca_project" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                    FROM embeddings),
         x AS (SELECT vec_id, generate_subscripts(emb, 1) - 1 AS i, unnest(emb) AS vi
               FROM e),
         g0 AS (SELECT a.i AS i, b.i AS j,
                  CAST(sum(CAST(floor(a.vi * b.vi * 1000000 + 1.0/3) AS BIGINT)) AS BIGINT) AS g
                FROM x a JOIN x b ON a.vec_id = b.vec_id AND b.i >= a.i
                GROUP BY 1, 2),
         g AS (SELECT i, j, g FROM g0
               UNION ALL
               SELECT j AS i, i AS j, g FROM g0 WHERE i < j),
         w0 AS (SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS w FROM g),
         v1 AS (SELECT g.i, sum(CAST(g.g AS HUGEINT) * w0.w) AS v
                FROM g JOIN w0 ON w0.i = g.j GROUP BY g.i),
         m1 AS (SELECT max(abs(v)) AS mx FROM v1),
         w1 AS (SELECT i, CAST(CASE WHEN v >= 0 THEN (v * 1000000) // mx
                                    ELSE -(((-v) * 1000000) // mx) END AS BIGINT) AS w
                FROM v1, m1),
         v2 AS (SELECT g.i, sum(CAST(g.g AS HUGEINT) * w1.w) AS v
                FROM g JOIN w1 ON w1.i = g.j GROUP BY g.i),
         m2 AS (SELECT max(abs(v)) AS mx FROM v2),
         w2 AS (SELECT i, CAST(CASE WHEN v >= 0 THEN (v * 1000000) // mx
                                    ELSE -(((-v) * 1000000) // mx) END AS BIGINT) AS w
                FROM v2, m2),
         v3 AS (SELECT g.i, sum(CAST(g.g AS HUGEINT) * w2.w) AS v
                FROM g JOIN w2 ON w2.i = g.j GROUP BY g.i),
         m3 AS (SELECT max(abs(v)) AS mx FROM v3),
         w3 AS (SELECT i, CAST(CASE WHEN v >= 0 THEN (v * 1000000) // mx
                                    ELSE -(((-v) * 1000000) // mx) END AS BIGINT) AS w
                FROM v3, m3),
         v4 AS (SELECT g.i, sum(CAST(g.g AS HUGEINT) * w3.w) AS v
                FROM g JOIN w3 ON w3.i = g.j GROUP BY g.i),
         m4 AS (SELECT max(abs(v)) AS mx FROM v4),
         w4 AS (SELECT i, CAST(CASE WHEN v >= 0 THEN (v * 1000000) // mx
                                    ELSE -(((-v) * 1000000) // mx) END AS BIGINT) AS w
                FROM v4, m4),
         xq AS (SELECT vec_id, i, CAST(floor(vi * 1000000) AS BIGINT) AS xq FROM x)
         SELECT vec_id, CAST(sum(xq.xq * w4.w) AS BIGINT) AS proj_q
         FROM xq JOIN w4 USING (i)
         GROUP BY 1""",
    // q100: duplicate-substring spans — 5-token windows present in >= 2
    // distinct docs, merged per doc into maximal spans (gaps-and-islands
    // on 1-based window positions). All integer arithmetic.
    "q100_dup_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         sh AS (
           SELECT doc_id,
             unnest(range(1, len(toks) - 3)) AS pos,
             unnest(list_transform(range(1, len(toks) - 3),
               i -> array_to_string(toks[i:i+4], ' '))) AS sh
           FROM t WHERE len(toks) >= 5),
         dup AS (SELECT sh FROM sh GROUP BY sh
                 HAVING count(DISTINCT doc_id) >= 2),
         hit AS (SELECT s.doc_id, s.pos FROM sh s JOIN dup USING (sh)),
         isl AS (
           SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 5
                  THEN 0 ELSE 1 END AS brk
           FROM hit),
         g AS (
           SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM isl)
         SELECT doc_id,
           min(pos) AS span_start,
           max(pos) + 4 AS span_end,
           max(pos) + 5 - min(pos) AS span_tokens,
           CAST(count(*) AS BIGINT) AS n_dup_windows
         FROM g GROUP BY doc_id, grp""",
    // q101: priority sampling (weighted, without replacement): priority
    // u/w from the canonical md5 draw over doc length; k = 100 smallest
    // win. int/int division IEEE-rounds identically in both engines.
    "q101_priority_sample" ->
      """SELECT doc_id, lang, n_chars,
           CAST('0x' || substr(md5('prio:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS draw
         FROM documents
         ORDER BY CAST(draw AS DOUBLE) / n_chars ASC, doc_id ASC
         LIMIT 100""",
    // q102: count-min sketch (d=4, w=256) from fixed md5 seeds — the
    // deterministic sketch, so estimates are engine-exact integers.
    // Heavy = estimate clears total/200 (integer cross-multiply).
    "q102_cms_heavy" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY tok),
         cm AS (
           SELECT tok, cnt, j.j,
             CAST('0x' || substr(md5(CAST(j.j AS VARCHAR) || '#cms:' || tok), 1, 8)
               AS BIGINT) % 256 AS cell
           FROM tf, range(4) j(j)),
         sk AS (SELECT j, cell, CAST(sum(cnt) AS BIGINT) AS c FROM cm GROUP BY 1, 2),
         est AS (
           SELECT cm.tok, min(sk.c) AS est, max(cm.cnt) AS true_cnt
           FROM cm JOIN sk ON sk.j = cm.j AND sk.cell = cm.cell
           GROUP BY 1),
         tot AS (SELECT sum(cnt) AS tot FROM tf)
         SELECT tok, est, true_cnt FROM est, tot WHERE est * 200 >= tot""",
    // q103: 5 unrolled PageRank rounds over the symmetrized q28 near-dup
    // graph, all integer on a 1e6 scale: contribution r//deg, damping
    // (85*s)//100 — identical longs in every engine.
    "q103_pagerank" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
         bits AS (
           SELECT doc_id, j.j,
                  sum(tf * CASE WHEN substr(md5(tok), j.j + 1, 1) >= '8'
                           THEN 1 ELSE -1 END) AS s
           FROM tf, range(32) j(j) GROUP BY 1, 2),
         sh AS (
           SELECT doc_id,
                  CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
                    AS simhash
           FROM bits GROUP BY 1),
         banded AS (SELECT doc_id, simhash, b.band,
                           (simhash // (1::BIGINT << (b.band * 8))) % 256 AS byte
                    FROM sh, range(4) b(band)),
         p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM banded a JOIN banded b
                 ON a.band = b.band AND a.byte = b.byte AND a.doc_id < b.doc_id
               WHERE bit_count(xor(a.simhash, b.simhash)) <= 1),
         e AS (SELECT doc_a AS src, doc_b AS dst FROM p
               UNION ALL SELECT doc_b, doc_a FROM p),
         deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
         r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
         r1 AS (SELECT e.dst AS node,
                       CAST(150000 + (85 * sum(r.r // d.deg)) // 100 AS BIGINT) AS r
                FROM e JOIN r0 r ON r.node = e.src JOIN deg d ON d.src = e.src
                GROUP BY e.dst),
         r2 AS (SELECT e.dst AS node,
                       CAST(150000 + (85 * sum(r.r // d.deg)) // 100 AS BIGINT) AS r
                FROM e JOIN r1 r ON r.node = e.src JOIN deg d ON d.src = e.src
                GROUP BY e.dst),
         r3 AS (SELECT e.dst AS node,
                       CAST(150000 + (85 * sum(r.r // d.deg)) // 100 AS BIGINT) AS r
                FROM e JOIN r2 r ON r.node = e.src JOIN deg d ON d.src = e.src
                GROUP BY e.dst),
         r4 AS (SELECT e.dst AS node,
                       CAST(150000 + (85 * sum(r.r // d.deg)) // 100 AS BIGINT) AS r
                FROM e JOIN r3 r ON r.node = e.src JOIN deg d ON d.src = e.src
                GROUP BY e.dst),
         r5 AS (SELECT e.dst AS node,
                       CAST(150000 + (85 * sum(r.r // d.deg)) // 100 AS BIGINT) AS r
                FROM e JOIN r4 r ON r.node = e.src JOIN deg d ON d.src = e.src
                GROUP BY e.dst)
         SELECT node AS doc_id, r AS rank_q FROM r5""",
    // q104: 16-bit Morton interleave of (length band, hashed lang) —
    // pure integer arithmetic, identical keys in every engine.
    "q104_zorder_layout" ->
      """WITH d AS (
           SELECT doc_id,
             least(n_chars // 4, 255) AS d_len,
             CAST('0x' || substr(md5('zlang:' || lang), 1, 8) AS BIGINT) % 256 AS d_lang
           FROM documents)
         SELECT doc_id, d_len, d_lang,
           CAST(list_sum(list_transform(range(0, 8), i ->
             ((d_len // (1::BIGINT << i)) % 2) * (1::BIGINT << (2*i + 1)) +
             ((d_lang // (1::BIGINT << i)) % 2) * (1::BIGINT << (2*i))))
             AS BIGINT) AS zkey,
           CAST(list_sum(list_transform(range(0, 8), i ->
             ((d_len // (1::BIGINT << i)) % 2) * (1::BIGINT << (2*i + 1)) +
             ((d_lang // (1::BIGINT << i)) % 2) * (1::BIGINT << (2*i))))
             AS BIGINT) // 1024 AS file_id
         FROM d""",
    // q105: per-lang lower-median + MAD outliers — rank-select medians
    // with doc_id tie-break, all integer comparisons.
    "q105_mad_outliers" ->
      """WITH d AS (SELECT doc_id, lang, n_chars FROM documents),
         r1 AS (SELECT lang, n_chars,
                  row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
                  count(*) OVER (PARTITION BY lang) AS n
                FROM d),
         med AS (SELECT lang, n_chars AS med FROM r1 WHERE rn = (n + 1) // 2),
         dev AS (SELECT d.doc_id, d.lang, d.n_chars, med.med,
                   abs(d.n_chars - med.med) AS abs_dev
                 FROM d JOIN med USING (lang)),
         r2 AS (SELECT lang, abs_dev,
                  row_number() OVER (PARTITION BY lang ORDER BY abs_dev, doc_id) AS rn,
                  count(*) OVER (PARTITION BY lang) AS n
                FROM dev),
         mad AS (SELECT lang, abs_dev AS mad FROM r2 WHERE rn = (n + 1) // 2)
         SELECT dev.doc_id, dev.lang, dev.n_chars, dev.med, mad.mad, dev.abs_dev
         FROM dev JOIN mad USING (lang)
         WHERE dev.abs_dev > mad.mad * 2""",
    // q106: margin-criterion pair mining label-0 -> label-1; cosines
    // accumulate left-to-right exactly as the native expressions, the
    // margin combines rank-pivoted values in fixed order, then the
    // offset-quantized floor.
    "q106_margin_mining" ->
      """WITH e AS (SELECT vec_id, label,
                    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                    FROM embeddings),
         n AS (SELECT vec_id, label, emb,
                      sqrt(list_reduce(list_transform(emb, x -> x * x), (a, b) -> a + b))
                        AS nrm
               FROM e),
         q AS (SELECT vec_id AS query_id, emb AS qemb, nrm AS qnrm FROM n
               WHERE label = 0),
         c AS (SELECT vec_id, emb, nrm FROM n WHERE label = 1),
         scored AS (
           SELECT q.query_id, c.vec_id,
                  list_reduce(list_transform(c.emb, (x, i) -> x * q.qemb[i]),
                              (a, b) -> a + b) / (q.qnrm * c.nrm) AS cos
           FROM c, q WHERE c.vec_id <> q.query_id),
         rk AS (SELECT query_id, vec_id, cos,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, vec_id ASC) AS rk
                FROM scored),
         p AS (SELECT query_id,
                 max(CASE WHEN rk = 1 THEN vec_id END) AS neighbor_id,
                 max(CASE WHEN rk = 1 THEN cos END) AS c1,
                 max(CASE WHEN rk = 2 THEN cos END) AS c2,
                 max(CASE WHEN rk = 3 THEN cos END) AS c3,
                 max(CASE WHEN rk = 4 THEN cos END) AS c4
               FROM rk WHERE rk <= 4 GROUP BY 1)
         SELECT query_id, neighbor_id,
           CAST(floor((c1 - (c2 + c3 + c4) / 3) * 10000 + 1.0/3) AS BIGINT) AS margin_q,
           CAST(floor(c1 * 10000 + 1.0/3) AS BIGINT) AS cos_q
         FROM p""",
    // q107: q68's cosine cluster assignment joined to documents; top-3
    // tokens per cluster by tf/df salience (int/int double, tok tie).
    "q107_cluster_terms" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                    FROM embeddings),
         n AS (SELECT vec_id, emb,
                      sqrt(list_reduce(list_transform(emb, x -> x*x), (a,b)->a+b)) AS nrm
               FROM e),
         cent AS (SELECT vec_id AS cent_id, emb AS cemb, nrm AS cnrm FROM n WHERE vec_id < 8),
         ranked AS (
           SELECT vec_id, cent_id,
                  row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS crk
           FROM (SELECT n.vec_id, c.cent_id,
                   list_reduce(list_transform(n.emb, (x,i) -> x * c.cemb[i]), (a,b)->a+b)
                     / (n.nrm*c.cnrm) AS ccos
                 FROM n, cent c)),
         assigned AS (SELECT vec_id, cent_id AS cell FROM ranked WHERE crk = 1),
         tok AS (SELECT d.doc_id, a.cell, unnest(string_split(d.text, ' ')) AS tok
                 FROM documents d JOIN assigned a ON d.doc_id = a.vec_id),
         tf AS (SELECT cell, tok, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
         dfr AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM (
                   SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
                   FROM documents) GROUP BY 1)
         SELECT cell, CAST(rk AS BIGINT) AS rk, tok, tf, df FROM (
           SELECT tf.cell, tf.tok, tf.tf, dfr.df,
                  row_number() OVER (PARTITION BY tf.cell
                    ORDER BY CAST(tf.tf AS DOUBLE) / dfr.df DESC, tf.tok ASC) AS rk
           FROM tf JOIN dfr USING (tok))
         WHERE rk <= 3""",
    // q108: OOV tokens/types/ppm per language against the q70 top-200
    // vocabulary — rate by pure integer division.
    "q108_vocab_coverage" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         a AS (SELECT tok, count(*) AS tf FROM t GROUP BY 1),
         v AS (SELECT tok FROM a
               QUALIFY row_number() OVER (ORDER BY tf DESC, tok ASC) <= 200),
         tagged AS (
           SELECT d.lang, s.tok, v.tok IS NULL AS oov
           FROM documents d, unnest(string_split(d.text, ' ')) AS s(tok)
           LEFT JOIN v ON v.tok = s.tok),
         counts AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
                      CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
                    FROM tagged GROUP BY 1),
         types AS (SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS n_oov_types
                   FROM tagged WHERE oov GROUP BY 1)
         SELECT c.lang, c.n_tokens, c.n_oov,
           coalesce(t2.n_oov_types, 0) AS n_oov_types,
           (c.n_oov * 1000000) // c.n_tokens AS oov_ppm
         FROM counts c LEFT JOIN types t2 USING (lang)""",
    // q109: q26's minhash-band machinery with a delta/corpus split —
    // new batch (doc_id % 5 = 0) screened against the indexed rest.
    "q109_delta_dedup" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                  generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents),
         sh AS (
           SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
           FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                      JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
         mh AS (SELECT s.doc_id, sd.seed, min(md5(sd.seed || ':' || s.shingle)) AS mh
                FROM sh s, range(12) sd(seed) GROUP BY 1, 2),
         bands AS (SELECT doc_id, seed // 3 AS band,
                          string_agg(mh, ',' ORDER BY seed) AS sig
                   FROM mh GROUP BY 1, 2),
         cand AS (SELECT DISTINCT a.doc_id AS new_doc, b.doc_id AS corpus_doc
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.sig = b.sig
                  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0),
         card AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         shared AS (
           SELECT c.new_doc, c.corpus_doc, CAST(count(*) AS BIGINT) AS n_shared
           FROM cand c JOIN sh sa ON sa.doc_id = c.new_doc
                       JOIN sh sb ON sb.doc_id = c.corpus_doc
                         AND sa.shingle = sb.shingle
           GROUP BY 1, 2)
         SELECT s.new_doc, s.corpus_doc, s.n_shared,
                s.n_shared / (ca.n + cb.n - s.n_shared) AS jaccard
         FROM shared s JOIN card ca ON ca.doc_id = s.new_doc
                       JOIN card cb ON cb.doc_id = s.corpus_doc
         WHERE s.n_shared / (ca.n + cb.n - s.n_shared) >= 0.5""",
    // q110: frequent event-type trigrams per user stream, (ts, event_id)
    // ordered; support 5 floor. All integer counts.
    "q110_event_trigrams" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS tms, event_id
                    FROM events),
         s AS (SELECT user_id, event_type AS e1,
                 lead(event_type, 1) OVER w AS e2,
                 lead(event_type, 2) OVER w AS e3
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id))
         SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n_occurrences,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM s WHERE e3 IS NOT NULL
         GROUP BY 1, 2, 3 HAVING count(*) >= 5""",
    // q111: PMI of adjacent token pairs — ln of an exact integer ratio,
    // offset-quantized to 1e-4 (the q87 recipe); joint floor 5,
    // positive PMI only.
    "q111_pmi_collocations" ->
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
         bg AS (
           SELECT unnest(toks[1:len(toks)-1]) AS w1,
                  unnest(toks[2:len(toks)]) AS w2
           FROM t WHERE len(toks) >= 2),
         joint AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
                   FROM bg GROUP BY 1, 2),
         l AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM joint GROUP BY 1),
         r AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM joint GROUP BY 1),
         tot AS (SELECT CAST(sum(c12) AS BIGINT) AS n_bg FROM joint)
         SELECT j.w1, j.w2, j.c12, l.c1, r.c2,
           CAST(floor(ln(CAST(j.c12 AS DOUBLE) * n_bg / (c1 * c2)) * 10000
             + 1.0/3) AS BIGINT) AS pmi_q
         FROM joint j JOIN l USING (w1) JOIN r USING (w2), tot
         WHERE j.c12 >= 5
           AND CAST(floor(ln(CAST(j.c12 AS DOUBLE) * n_bg / (c1 * c2)) * 10000
             + 1.0/3) AS BIGINT) > 0""",
    // q112: 1-day half-life decay as an EXACT integer power of two
    // (1 << age), per-term offset-quantized to longs before the sum.
    "q112_decayed_score" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS tms, value FROM events),
         h AS (SELECT max(tms) AS t_max FROM e),
         terms AS (
           SELECT user_id,
             CAST(floor(value / (1::BIGINT << CAST(least((t_max - tms) // 86400000, 62)
               AS INT)) * 1000000 + 1.0/3) AS BIGINT) AS term_q
           FROM e, h)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(term_q) AS BIGINT) AS decayed_q
         FROM terms GROUP BY 1""",
    // q113: hourly click/purchase series (offset-quantized longs),
    // xcorr(l) = Σ a(h)·b(h+l) for l = 0..5 — all integer.
    "q113_lag_xcorr" ->
      """WITH e AS (
           SELECT event_type, epoch_ms(ts) // 3600000 AS h,
                  CAST(floor(value * 1000 + 1.0/3) AS BIGINT) AS vq
           FROM events WHERE event_type IN ('click', 'purchase')),
         hourly AS (SELECT event_type, h, CAST(sum(vq) AS BIGINT) AS s
                    FROM e GROUP BY 1, 2),
         a AS (SELECT h, s AS sa FROM hourly WHERE event_type = 'click'),
         b AS (SELECT h AS hb, s AS sb FROM hourly WHERE event_type = 'purchase'),
         lags AS (SELECT unnest(range(0, 6)) AS lag)
         SELECT lag, CAST(count(*) AS BIGINT) AS n_hours,
                CAST(sum(sa * sb) AS BIGINT) AS xcorr_q
         FROM a, lags JOIN b ON hb = h + lag
         GROUP BY lag""",
    // q114: strictly-ordered view -> click -> purchase funnel; ppm by
    // integer division against step-1 reach.
    "q114_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS tms FROM events),
         s1 AS (SELECT user_id, min(tms) AS t1 FROM e
                WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, min(tms) AS t2 FROM e JOIN s1 USING (user_id)
                WHERE event_type = 'click' AND tms > t1 GROUP BY 1),
         s3 AS (SELECT e.user_id, min(tms) AS t3 FROM e JOIN s2 USING (user_id)
                WHERE event_type = 'purchase' AND tms > t2 GROUP BY 1),
         base AS (SELECT CAST(count(*) AS BIGINT) AS b FROM s1),
         n AS (SELECT 1 AS step, CAST(count(*) AS BIGINT) AS n_users FROM s1
               UNION ALL SELECT 2, count(*) FROM s2
               UNION ALL SELECT 3, count(*) FROM s3)
         SELECT CAST(step AS BIGINT) AS step, n_users,
                (n_users * 1000000) // b AS conv_ppm
         FROM n, base""",
    // q115: empirical-CDF rank transform per event_type, (value,
    // event_id)-ordered; ppm by integer division.
    "q115_quantile_norm" ->
      """SELECT event_id, event_type,
           CAST(row_number() OVER w AS BIGINT) AS rk,
           ((CAST(row_number() OVER w AS BIGINT) - 1) * 1000000)
             // (count(*) OVER (PARTITION BY event_type) - 1) AS qnorm_ppm
         FROM events
         WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)""",
    // q116: STFT — q36's quantized-power DFT per non-overlapping 8-sample
    // frame (first 16 samples -> frames 0 and 1); same 1/3-offset gate.
    "q116_spectrogram" ->
      """WITH ranked AS (
           SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) - 1 AS rn0
           FROM events QUALIFY rn0 <= 15),
         framed AS (SELECT user_id, rn0 // 8 AS frame, rn0 % 8 AS t, value
                    FROM ranked),
         full8 AS (SELECT user_id, frame FROM framed GROUP BY 1, 2
                   HAVING count(*) = 8),
         terms AS (
           SELECT f.user_id, f.frame, k.k,
             f.value * cos(2*pi()*k.k*f.t/8) AS c,
             f.value * sin(2*pi()*k.k*f.t/8) AS s
           FROM framed f JOIN full8 USING (user_id, frame), range(8) k(k)),
         spec AS (SELECT user_id, frame, k, sum(c) AS re, sum(s) AS im
                  FROM terms GROUP BY 1, 2, 3)
         SELECT user_id, CAST(frame AS BIGINT) AS frame, CAST(k AS BIGINT) AS bin,
           CAST(floor(re*re + im*im + 0.3333333333333333) AS BIGINT) AS qpower
         FROM spec""",
    // q117: per-type first-digit histogram vs Benford's law; shares by
    // integer division, the expectation log10 offset-quantized per digit.
    "q117_benford" ->
      """WITH d AS (
           SELECT event_type,
             CAST(substr(CAST(CAST(floor(value) AS BIGINT) AS VARCHAR), 1, 1)
               AS BIGINT) AS digit
           FROM events WHERE value >= 1.0),
         h AS (SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n_d
               FROM d GROUP BY 1, 2),
         t AS (SELECT event_type, CAST(sum(n_d) AS BIGINT) AS n
               FROM h GROUP BY 1)
         SELECT h.event_type, h.digit, h.n_d,
           (h.n_d * 1000000) // t.n AS share_ppm,
           CAST(floor(log10(1.0 + 1.0 / digit) * 1000000 + 1.0/3) AS BIGINT)
             AS benford_ppm,
           abs((h.n_d * 1000000) // t.n
             - CAST(floor(log10(1.0 + 1.0 / digit) * 1000000 + 1.0/3) AS BIGINT))
             AS dev_ppm
         FROM h JOIN t USING (event_type)""",
    // q118: CUSUM change-point; integer scale-by-n deviation, argmax by
    // (|cusum| desc, event_id) rank — identical tie-break both engines.
    "q118_cusum" ->
      """WITH v AS (
           SELECT event_type, event_id, epoch_ms(ts) AS tms,
             CAST(floor(value * 1000 + 1.0/3) AS BIGINT) AS vq
           FROM events),
         s AS (SELECT event_type, CAST(sum(vq) AS BIGINT) AS s,
                 CAST(count(*) AS BIGINT) AS n
               FROM v GROUP BY 1),
         c AS (SELECT v.event_type, event_id, tms, n,
             n * CAST(sum(vq) OVER w AS BIGINT)
               - CAST(row_number() OVER w AS BIGINT) * s AS cusum
           FROM v JOIN s USING (event_type)
           WINDOW w AS (PARTITION BY v.event_type ORDER BY tms, event_id
                        ROWS UNBOUNDED PRECEDING)),
         r AS (SELECT *, row_number() OVER
                 (PARTITION BY event_type
                  ORDER BY abs(cusum) DESC, event_id) AS rk
               FROM c)
         SELECT event_type, event_id AS cp_event_id, tms AS cp_tms,
           abs(cusum) AS max_abs_cusum, n
         FROM r WHERE rk = 1""",
    // q119: Hampel despike; x2/x4 integer scales keep edge-window
    // (even-k) medians exact; spike test 2*|2vq-med2| > 3*mad4.
    "q119_hampel" ->
      """WITH v AS (
           SELECT event_type, event_id, epoch_ms(ts) AS tms,
             CAST(floor(value * 1000 + 1.0/3) AS BIGINT) AS vq
           FROM events),
         w AS (SELECT event_type, event_id, tms, vq,
             list_sort(list(vq) OVER win) AS a
           FROM v
           WINDOW win AS (PARTITION BY event_type ORDER BY tms, event_id
                          ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)),
         m AS (SELECT *, a[CAST((len(a)+1)//2 AS INT)]
                 + a[CAST(len(a)//2 + 1 AS INT)] AS med2 FROM w),
         d AS (SELECT *,
             list_sort(list_transform(a, x -> abs(x*2 - med2))) AS b
           FROM m),
         f AS (SELECT *, b[CAST((len(b)+1)//2 AS INT)]
                 + b[CAST(len(b)//2 + 1 AS INT)] AS mad4 FROM d)
         SELECT event_type, event_id, tms, vq, med2, mad4,
           CAST(CASE WHEN abs(vq*2 - med2)*2 > mad4*3 THEN 1 ELSE 0 END
             AS BIGINT) AS is_spike,
           CASE WHEN abs(vq*2 - med2)*2 > mad4*3 THEN med2 ELSE vq*2 END
             AS clean2
         FROM f""",
    // q120: tie-correct Mann-Whitney AUC per source; the cumulative
    // window runs on the (source, n_chars) aggregate, not the corpus.
    "q120_auc" ->
      """WITH g AS (
           SELECT source, n_chars,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS p,
             CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS q
           FROM documents GROUP BY 1, 2),
         c AS (SELECT *, COALESCE(CAST(sum(q) OVER
                 (PARTITION BY source ORDER BY n_chars
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS BIGINT), 0) AS cq
               FROM g),
         t AS (SELECT source, CAST(sum(p) AS BIGINT) AS n_pos,
                 CAST(sum(q) AS BIGINT) AS n_neg,
                 CAST(sum(p*cq*2 + p*q) AS BIGINT) AS num2
               FROM c GROUP BY 1)
         SELECT source, n_pos, n_neg,
           (num2 * 1000000) // (2 * n_pos * n_neg) AS auc_ppm
         FROM t WHERE n_pos > 0 AND n_neg > 0""",
    // q121: reliability table over fixed 100-char bins; all-integer
    // ppm rates and floor means.
    "q121_calibration" ->
      """SELECT n_chars // 100 AS bin, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos,
           (CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
             * 1000000) // count(*) AS pos_ppm,
           CAST(sum(n_chars) AS BIGINT) // count(*) AS mean_chars
         FROM documents GROUP BY 1""",
    // q122: per-doc Shannon entropy over codepoints; each -p*ln(p) term
    // quantized to a long BEFORE the per-doc sum (q87 recipe) so the
    // unordered sum is associative. ln inputs are exact int/int ratios.
    "q122_char_entropy" ->
      """WITH ch AS (
           SELECT doc_id, unnest(string_split(text, '')) AS ch
           FROM documents),
         c AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS n_c
               FROM ch WHERE ch <> '' GROUP BY 1, 2),
         l AS (SELECT doc_id, CAST(sum(n_c) AS BIGINT) AS len,
                 CAST(count(*) AS BIGINT) AS n_distinct
               FROM c GROUP BY 1),
         t AS (SELECT c.doc_id, len, n_distinct,
             CAST(floor((-(n_c / len)) * ln(n_c / len) * 10000 + 1.0/3)
               AS BIGINT) AS term_q
           FROM c JOIN l USING (doc_id))
         SELECT doc_id, max(len) AS len, max(n_distinct) AS n_distinct,
           CAST(sum(term_q) AS BIGINT) AS entropy_q,
           CAST(CASE WHEN sum(term_q) < 25000 THEN 1 ELSE 0 END AS BIGINT)
             AS flag_low
         FROM t GROUP BY 1""",
    // q123: weak-supervision majority vote over 4 labeling functions.
    // DuckDB regexp_replace needs 'g' to match Spark's replace-all.
    "q123_weak_labels" ->
      """WITH f AS (
           SELECT doc_id,
             CAST(CASE WHEN length(text) >= 200 THEN 1 ELSE 0 END
               AS BIGINT) AS lf_len,
             CAST(CASE WHEN strpos(lower(text), ' the ') > 0 THEN 1 ELSE 0
               END AS BIGINT) AS lf_stop,
             CAST(CASE WHEN (length(text)
                 - length(regexp_replace(text, '[.!?,;]', '', 'g'))) * 20
                 >= length(text) THEN 1 ELSE 0 END AS BIGINT) AS lf_punct,
             CAST(CASE WHEN (length(text)
                 - length(regexp_replace(text, '[0-9]', '', 'g'))) * 50
                 <= length(text) THEN 1 ELSE 0 END AS BIGINT) AS lf_digit
           FROM documents)
         SELECT doc_id, lf_len, lf_stop, lf_punct, lf_digit,
           lf_len + lf_stop + lf_punct + lf_digit AS n_votes,
           CAST(CASE WHEN lf_len + lf_stop + lf_punct + lf_digit >= 3
             THEN 1 ELSE 0 END AS BIGINT) AS majority
         FROM f""",
    // q124: per-LF vote rate and majority-agreement rate (unpivot of
    // the q123 relation, |LFs|-row output).
    "q124_lf_agreement" ->
      """WITH f AS (
           SELECT doc_id,
             CAST(CASE WHEN length(text) >= 200 THEN 1 ELSE 0 END
               AS BIGINT) AS lf_len,
             CAST(CASE WHEN strpos(lower(text), ' the ') > 0 THEN 1 ELSE 0
               END AS BIGINT) AS lf_stop,
             CAST(CASE WHEN (length(text)
                 - length(regexp_replace(text, '[.!?,;]', '', 'g'))) * 20
                 >= length(text) THEN 1 ELSE 0 END AS BIGINT) AS lf_punct,
             CAST(CASE WHEN (length(text)
                 - length(regexp_replace(text, '[0-9]', '', 'g'))) * 50
                 <= length(text) THEN 1 ELSE 0 END AS BIGINT) AS lf_digit
           FROM documents),
         m AS (SELECT *, CAST(CASE WHEN lf_len + lf_stop + lf_punct
                 + lf_digit >= 3 THEN 1 ELSE 0 END AS BIGINT) AS majority
               FROM f),
         u AS (
           SELECT 'lf_len' AS lf, lf_len AS v, majority FROM m
           UNION ALL
           SELECT 'lf_stop', lf_stop, majority FROM m
           UNION ALL
           SELECT 'lf_punct', lf_punct, majority FROM m
           UNION ALL
           SELECT 'lf_digit', lf_digit, majority FROM m)
         SELECT lf, CAST(sum(v) AS BIGINT) AS n_vote,
           (CAST(sum(v) AS BIGINT) * 1000000) // count(*) AS vote_ppm,
           (CAST(sum(CASE WHEN v = majority THEN 1 ELSE 0 END) AS BIGINT)
             * 1000000) // count(*) AS agree_ppm
         FROM u GROUP BY 1""",
    // q125: asymmetric containment |A∩B|/|A| >= 0.8 with A the smaller
    // set (canonical direction). The oracle joins all shingles naively —
    // the Spark side's prefix filter is a pruning, output identical.
    "q125_containment" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                  generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents),
         sh AS (
           SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
           FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                      JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
         card AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
         shared AS (
           SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b,
                  CAST(count(*) AS BIGINT) AS n_shared
           FROM sh sa JOIN sh sb ON sa.shingle = sb.shingle
           JOIN card ca ON ca.doc_id = sa.doc_id
           JOIN card cb ON cb.doc_id = sb.doc_id
           WHERE ca.n < cb.n OR (ca.n = cb.n AND sa.doc_id < sb.doc_id)
           GROUP BY 1, 2)
         SELECT s.doc_a, s.doc_b, ca.n AS n_a, cb.n AS n_b, s.n_shared,
           (s.n_shared * 1000000) // ca.n AS cont_ppm
         FROM shared s JOIN card ca ON ca.doc_id = s.doc_a
                       JOIN card cb ON cb.doc_id = s.doc_b
         WHERE (s.n_shared * 1000000) // ca.n >= 800000""",
    // q126: Bradley-Terry MM, 3 iterations unrolled; every step integer
    // (per-term // then sums, max-rescale to 1e6) — identical algebra to
    // the Spark loop, GREATEST guard on the strength-pair divisor.
    "q126_bradley_terry" ->
      """WITH li AS (
           SELECT l_orderkey AS ok, p_brand AS brand, l_quantity AS qty
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         m AS (
           SELECT a.brand AS bi, b.brand AS bj,
             CAST(CASE WHEN a.qty > b.qty THEN 1 ELSE 0 END AS BIGINT) AS wi
           FROM li a JOIN li b
             ON a.ok = b.ok AND a.brand < b.brand AND a.qty <> b.qty),
         pair AS (SELECT bi, bj, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(wi) AS BIGINT) AS w
                  FROM m GROUP BY 1, 2),
         directed AS (SELECT bi AS i, bj AS j, n FROM pair
                      UNION ALL SELECT bj, bi, n FROM pair),
         wins AS (SELECT i, CAST(sum(ww) AS BIGINT) AS n_wins FROM
                    (SELECT bi AS i, w AS ww FROM pair
                     UNION ALL SELECT bj, n - w FROM pair)
                  GROUP BY 1),
         nm AS (SELECT i, CAST(sum(n) AS BIGINT) AS n_matches
                FROM directed GROUP BY 1),
         w0 AS (SELECT i, CAST(1000000 AS BIGINT) AS s FROM wins),
         d1 AS (SELECT d.i, CAST(sum((d.n * 1000000000000)
                  // GREATEST(wi.s + wj.s, 1)) AS BIGINT) AS denom
                FROM directed d JOIN w0 wi ON d.i = wi.i
                                JOIN w0 wj ON d.j = wj.i GROUP BY 1),
         r1 AS (SELECT w.i, (w.n_wins * 1000000000000) // d.denom AS r
                FROM wins w JOIN d1 d ON w.i = d.i),
         w1 AS (SELECT i, (r * 1000000) // (SELECT max(r) FROM r1) AS s
                FROM r1),
         d2 AS (SELECT d.i, CAST(sum((d.n * 1000000000000)
                  // GREATEST(wi.s + wj.s, 1)) AS BIGINT) AS denom
                FROM directed d JOIN w1 wi ON d.i = wi.i
                                JOIN w1 wj ON d.j = wj.i GROUP BY 1),
         r2 AS (SELECT w.i, (w.n_wins * 1000000000000) // d.denom AS r
                FROM wins w JOIN d2 d ON w.i = d.i),
         w2 AS (SELECT i, (r * 1000000) // (SELECT max(r) FROM r2) AS s
                FROM r2),
         d3 AS (SELECT d.i, CAST(sum((d.n * 1000000000000)
                  // GREATEST(wi.s + wj.s, 1)) AS BIGINT) AS denom
                FROM directed d JOIN w2 wi ON d.i = wi.i
                                JOIN w2 wj ON d.j = wj.i GROUP BY 1),
         r3 AS (SELECT w.i, (w.n_wins * 1000000000000) // d.denom AS r
                FROM wins w JOIN d3 d ON w.i = d.i),
         w3 AS (SELECT i, (r * 1000000) // (SELECT max(r) FROM r3) AS s
                FROM r3)
         SELECT w.i AS brand, w.n_wins, nm.n_matches, w3.s AS strength_ppm
         FROM wins w JOIN nm ON nm.i = w.i JOIN w3 ON w3.i = w.i""",
    // q127: ordered-wedge triangle enumeration (x<y<z once each) over
    // the >=3-shared-orders supplier graph; per-node counts by corner
    // union — orientation-invariant, matches the Spark degree-note.
    "q127_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
                     FROM lineitem),
         e AS (SELECT a.sk AS u, b.sk AS v
               FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk
               GROUP BY 1, 2 HAVING count(*) >= 3),
         tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
                 FROM e e1 JOIN e e2 ON e1.v = e2.u
                 JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
         corners AS (SELECT x AS supp FROM tri
                     UNION ALL SELECT y FROM tri
                     UNION ALL SELECT z FROM tri)
         SELECT supp, CAST(count(*) AS BIGINT) AS n_tri
         FROM corners GROUP BY 1""",
    // q128: retention cohorts on the tz-free order DATE; month index
    // year*12+month subtracts exactly in both engines.
    "q128_retention" ->
      """WITH cm AS (SELECT DISTINCT o_custkey,
                  CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                    AS ym
                FROM orders),
         f AS (SELECT o_custkey, min(ym) AS cohort FROM cm GROUP BY 1),
         sizes AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_n
                   FROM f GROUP BY 1),
         act AS (SELECT cohort, ym - cohort AS offset,
                   CAST(count(*) AS BIGINT) AS n_active
                 FROM cm JOIN f USING (o_custkey) GROUP BY 1, 2)
         SELECT a.cohort, a.offset, a.n_active, s.cohort_n,
           (a.n_active * 1000000) // s.cohort_n AS retained_ppm
         FROM act a JOIN sizes s ON a.cohort = s.cohort""",
    // q129: nucleus (top-p) vocab mass at 90%; integer cross-multiply
    // test, rank ties broken (n desc, tok asc) identically.
    "q129_vocab_nucleus" ->
      """WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
         c AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS n
               FROM t GROUP BY 1, 2),
         tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS total_tokens,
                   CAST(count(*) AS BIGINT) AS vocab
                 FROM c GROUP BY 1),
         cum AS (SELECT lang, tok, n,
             CAST(row_number() OVER w AS BIGINT) AS rk,
             CAST(sum(n) OVER w AS BIGINT) AS cum
           FROM c
           WINDOW w AS (PARTITION BY lang ORDER BY n DESC, tok ASC
                        ROWS UNBOUNDED PRECEDING)),
         k AS (SELECT cum.lang, min(rk) AS k_nucleus
               FROM cum JOIN tot USING (lang)
               WHERE cum * 10 >= total_tokens * 9 GROUP BY 1)
         SELECT k.lang, tot.total_tokens, tot.vocab, k.k_nucleus,
           cum.cum AS cum_at_k,
           (k.k_nucleus * 1000000) // tot.vocab AS nucleus_ppm
         FROM k JOIN cum ON cum.lang = k.lang AND cum.rk = k.k_nucleus
                JOIN tot ON tot.lang = k.lang""",
    // q130: canonical-form dedup (lower / punct->space / collapse /
    // trim); DuckDB regexp_replace needs 'g' for replace-all.
    "q130_canon_dedup" ->
      """SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fp,
           min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_raw_forms
         FROM documents GROUP BY 1""",
    // q131: per-doc fraction of corpus-unique (df=1) shingles, ppm.
    "q131_novelty" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                  generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents),
         sh AS (
           SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
           FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                      JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
         df AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df
                FROM sh GROUP BY 1)
         SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_sh,
           CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           (CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             * 1000000) // CAST(count(*) AS BIGINT) AS novelty_ppm
         FROM sh s JOIN df USING (shingle) GROUP BY 1""",
    // q132: pairwise Cohen's kappa over the q123 LFs; all-integer
    // chance correction, signed ppm truncates identically both engines.
    "q132_cohen_kappa" ->
      """WITH f AS (
           SELECT doc_id,
             CAST(CASE WHEN length(text) >= 200 THEN 1 ELSE 0 END
               AS BIGINT) AS lf_len,
             CAST(CASE WHEN strpos(lower(text), ' the ') > 0 THEN 1 ELSE 0
               END AS BIGINT) AS lf_stop,
             CAST(CASE WHEN (length(text)
                 - length(regexp_replace(text, '[.!?,;]', '', 'g'))) * 20
                 >= length(text) THEN 1 ELSE 0 END AS BIGINT) AS lf_punct,
             CAST(CASE WHEN (length(text)
                 - length(regexp_replace(text, '[0-9]', '', 'g'))) * 50
                 <= length(text) THEN 1 ELSE 0 END AS BIGINT) AS lf_digit
           FROM documents),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(lf_len) AS BIGINT) AS s_len,
             CAST(sum(lf_stop) AS BIGINT) AS s_stop,
             CAST(sum(lf_punct) AS BIGINT) AS s_punct,
             CAST(sum(lf_digit) AS BIGINT) AS s_digit,
             CAST(sum(CASE WHEN lf_len = lf_stop THEN 1 ELSE 0 END) AS BIGINT) AS ag_ls,
             CAST(sum(CASE WHEN lf_len = lf_punct THEN 1 ELSE 0 END) AS BIGINT) AS ag_lp,
             CAST(sum(CASE WHEN lf_len = lf_digit THEN 1 ELSE 0 END) AS BIGINT) AS ag_ld,
             CAST(sum(CASE WHEN lf_stop = lf_punct THEN 1 ELSE 0 END) AS BIGINT) AS ag_sp,
             CAST(sum(CASE WHEN lf_stop = lf_digit THEN 1 ELSE 0 END) AS BIGINT) AS ag_sd,
             CAST(sum(CASE WHEN lf_punct = lf_digit THEN 1 ELSE 0 END) AS BIGINT) AS ag_pd
           FROM f),
         p AS (
           SELECT 'lf_len' AS lf_a, 'lf_stop' AS lf_b, ag_ls AS agree,
                  s_len AS a1, s_stop AS b1, n FROM a
           UNION ALL SELECT 'lf_len', 'lf_punct', ag_lp, s_len, s_punct, n FROM a
           UNION ALL SELECT 'lf_len', 'lf_digit', ag_ld, s_len, s_digit, n FROM a
           UNION ALL SELECT 'lf_stop', 'lf_punct', ag_sp, s_stop, s_punct, n FROM a
           UNION ALL SELECT 'lf_stop', 'lf_digit', ag_sd, s_stop, s_digit, n FROM a
           UNION ALL SELECT 'lf_punct', 'lf_digit', ag_pd, s_punct, s_digit, n FROM a)
         SELECT lf_a, lf_b, n, agree,
           agree * n - (a1*b1 + (n-a1)*(n-b1)) AS kappa_num,
           n * n - (a1*b1 + (n-a1)*(n-b1)) AS kappa_den,
           ((agree * n - (a1*b1 + (n-a1)*(n-b1))) * 1000000)
             // (n * n - (a1*b1 + (n-a1)*(n-b1))) AS kappa_ppm
         FROM p""",
    // q133: MinHash estimator audit on q26's band-collision candidates;
    // per-seed signature match fraction vs exact set Jaccard, ppm.
    "q133_minhash_audit" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                  generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents),
         sh AS (
           SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
           FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                      JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
         card AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
         mh AS (SELECT s.doc_id, sd.seed, min(md5(sd.seed || ':' || s.shingle)) AS mh
                FROM sh s, range(12) sd(seed) GROUP BY 1, 2),
         bands AS (SELECT doc_id, seed // 3 AS band,
                          string_agg(mh, ',' ORDER BY seed) AS sig
                   FROM mh GROUP BY 1, 2),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.sig = b.sig
                       AND a.doc_id < b.doc_id),
         est AS (SELECT c.doc_a, c.doc_b,
                   CAST(sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END)
                     AS BIGINT) AS est12
                 FROM cand c JOIN mh ma ON ma.doc_id = c.doc_a
                             JOIN mh mb ON mb.doc_id = c.doc_b
                                       AND mb.seed = ma.seed
                 GROUP BY 1, 2),
         shared AS (SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS n_shared
                    FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
                                JOIN sh sb ON sb.doc_id = c.doc_b
                                          AND sa.shingle = sb.shingle
                    GROUP BY 1, 2)
         SELECT e.doc_a, e.doc_b, e.est12,
           (e.est12 * 1000000) // 12 AS est_ppm,
           (s.n_shared * 1000000) // (ca.n + cb.n - s.n_shared) AS exact_ppm,
           abs((e.est12 * 1000000) // 12
             - (s.n_shared * 1000000) // (ca.n + cb.n - s.n_shared)) AS err_ppm
         FROM est e
         JOIN shared s ON s.doc_a = e.doc_a AND s.doc_b = e.doc_b
         JOIN card ca ON ca.doc_id = e.doc_a
         JOIN card cb ON cb.doc_id = e.doc_b""",
    // q134: Kaplan-Meier over user lifetimes; per-term ln quantized to
    // a long (q87 recipe), cumsum in the deterministic duration order;
    // d = n_risk rows (S = 0) excluded identically by both engines.
    "q134_survival" ->
      """WITH ev AS (SELECT user_id, epoch_ms(ts) AS t FROM events),
         u AS (SELECT user_id, min(t) AS tmin, max(t) AS tmax
               FROM ev GROUP BY 1),
         durs AS (SELECT (tmax - tmin) // 3600000 AS dur_h,
             CASE WHEN (SELECT max(t) FROM ev) - tmax < 43200000
               THEN 1 ELSE 0 END AS cens
           FROM u),
         byt AS (SELECT dur_h, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(1 - cens) AS BIGINT) AS d,
             CAST(sum(cens) AS BIGINT) AS c
           FROM durs GROUP BY 1),
         r AS (SELECT *, CAST((SELECT sum(m) FROM byt) AS BIGINT)
             - COALESCE(CAST(sum(m) OVER (ORDER BY dur_h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS BIGINT), 0) AS n_risk
           FROM byt),
         f AS (SELECT dur_h, n_risk, d, c,
             CAST(floor(ln((n_risk - d) / n_risk) * 1000000 + 1.0/3)
               AS BIGINT) AS term_q
           FROM r WHERE d > 0 AND d < n_risk)
         SELECT dur_h, n_risk, d, c,
           CAST(sum(term_q) OVER (ORDER BY dur_h ROWS UNBOUNDED PRECEDING)
             AS BIGINT) AS surv_lnq
         FROM f""",
    // q135: leave-last-out temporal split; rank desc by (ts, event_id).
    "q135_temporal_split" ->
      """WITH r AS (SELECT event_type, user_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rk
           FROM events)
         SELECT CASE WHEN rk = 1 THEN 'test' WHEN rk = 2 THEN 'val'
                     ELSE 'train' END AS split,
           event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM r GROUP BY 1, 2""",
    // q136: Fleiss' kappa over the q123 LF panel, cleared to the
    // all-integer fraction (R = 4, binary categories); signed ppm
    // truncates identically both engines.
    "q136_fleiss_kappa" ->
      """WITH v AS (
           SELECT (CASE WHEN length(text) >= 200 THEN 1 ELSE 0 END
             + CASE WHEN strpos(lower(text), ' the ') > 0 THEN 1 ELSE 0 END
             + CASE WHEN (length(text)
                 - length(regexp_replace(text, '[.!?,;]', '', 'g'))) * 20
                 >= length(text) THEN 1 ELSE 0 END
             + CASE WHEN (length(text)
                 - length(regexp_replace(text, '[0-9]', '', 'g'))) * 50
                 <= length(text) THEN 1 ELSE 0 END)::BIGINT AS s
           FROM documents),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(s) AS BIGINT) AS s_pos,
             CAST(sum(s*s + (4-s)*(4-s) - 4) AS BIGINT) AS p_sum
           FROM v),
         b AS (SELECT n, s_pos, p_sum,
             s_pos*s_pos + (4*n - s_pos)*(4*n - s_pos) AS chance2
           FROM a)
         SELECT n, s_pos, p_sum,
           4*n*p_sum - 3*chance2 AS kappa_num,
           48*n*n - 3*chance2 AS kappa_den,
           ((4*n*p_sum - 3*chance2) * 1000000)
             // (48*n*n - 3*chance2) AS kappa_ppm
         FROM b WHERE 48*n*n - 3*chance2 <> 0""",
    // q137: Heaps-law growth — vocab_cum(d) counts tokens whose FIRST
    // occurrence decile <= d; window over the 10-row decile relation.
    "q137_vocab_growth" ->
      """WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         d AS (SELECT doc_id,
             least((doc_id * 10) // n_docs, 9) AS dec,
             string_split(text, ' ') AS toks
           FROM documents, nd),
         per AS (SELECT dec, CAST(count(*) AS BIGINT) AS n_docs_dec,
             CAST(sum(len(toks)) AS BIGINT) AS n_toks_dec
           FROM d GROUP BY 1),
         fs AS (SELECT min(dec) AS first_dec, t
           FROM (SELECT dec, unnest(toks) AS t FROM d) GROUP BY t),
         nw AS (SELECT first_dec, CAST(count(*) AS BIGINT) AS n_new_types
           FROM fs GROUP BY 1),
         j AS (SELECT per.dec, per.n_docs_dec, per.n_toks_dec,
             COALESCE(nw.n_new_types, 0) AS n_new_types
           FROM per LEFT JOIN nw ON per.dec = nw.first_dec)
         SELECT dec,
           CAST(sum(n_docs_dec) OVER w AS BIGINT) AS docs_cum,
           CAST(sum(n_toks_dec) OVER w AS BIGINT) AS tokens_cum,
           n_new_types,
           CAST(sum(n_new_types) OVER w AS BIGINT) AS vocab_cum
         FROM j WINDOW w AS (ORDER BY dec ROWS UNBOUNDED PRECEDING)""",
    // q138: reverse-kNN in-degree over the 16-plane / 4x4-bit sign-LSH
    // candidate graph (same md5 hyperplane family as q37).
    "q138_hubness" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                    FROM embeddings),
         n AS (SELECT vec_id, emb,
                      sqrt(list_reduce(list_transform(emb, x -> x*x), (a,b)->a+b)) AS nrm
               FROM e),
         proj AS (SELECT vec_id, p.p,
                list_reduce(list_transform(emb, (x, i) ->
                  x * CASE WHEN substr(md5(p.p || ':' || i), 1, 1) >= '8'
                      THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END),
                  (a, b) -> a + b) AS proj
              FROM n, range(16) p(p)),
         bits AS (SELECT vec_id, p // 4 AS band,
                  CAST(sum(CASE WHEN proj > 0
                           THEN (1::BIGINT << CAST(p % 4 AS INT)) ELSE 0 END) AS BIGINT) AS bits
                  FROM proj GROUP BY 1, 2),
         capped AS (SELECT vec_id, band, bits FROM (
             SELECT vec_id, band, bits, row_number() OVER (
               PARTITION BY band, bits ORDER BY
                 CAST('0x' || substr(md5('hub:' || CAST(band AS VARCHAR)
                   || ':' || CAST(bits AS VARCHAR) || ':'
                   || CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT),
                 vec_id) AS crk
             FROM bits) WHERE crk <= 64),
         cand AS (SELECT DISTINCT a.vec_id AS qid, b.vec_id AS nid
                  FROM bits a JOIN capped b
                    ON a.band = b.band AND a.bits = b.bits
                       AND a.vec_id <> b.vec_id),
         scored AS (SELECT c.qid, c.nid,
             list_reduce(list_transform(na.emb, (x,i) -> x * nb.emb[i]), (a,b)->a+b)
               / (na.nrm*nb.nrm) AS cos
           FROM cand c JOIN n na ON na.vec_id = c.qid
                       JOIN n nb ON nb.vec_id = c.nid),
         topk AS (SELECT qid, nid FROM (
             SELECT qid, nid, row_number() OVER (
               PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rk
             FROM scored) WHERE rk <= 3)
         SELECT nid AS vec_id, CAST(count(*) AS BIGINT) AS in_deg
         FROM topk GROUP BY 1""",
    // q139: per-user lag-1 transition matrix with row-normalized and
    // marginal (independence) ppm side by side.
    "q139_markov" ->
      """WITH t AS (SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
           FROM events),
         m AS (SELECT prev, event_type AS next,
             CAST(count(*) AS BIGINT) AS n
           FROM t WHERE prev IS NOT NULL GROUP BY 1, 2),
         rt AS (SELECT prev, CAST(sum(n) AS BIGINT) AS row_total
                FROM m GROUP BY 1),
         ct AS (SELECT next, CAST(sum(n) AS BIGINT) AS next_total
                FROM m GROUP BY 1),
         g AS (SELECT CAST(sum(n) AS BIGINT) AS grand_total FROM m)
         SELECT m.prev, m.next, m.n, rt.row_total,
           (m.n * 1000000) // rt.row_total AS p_ppm,
           (ct.next_total * 1000000) // g.grand_total AS exp_ppm
         FROM m JOIN rt USING (prev) JOIN ct USING (next), g""",
    // q140: Good-Turing freq-of-freqs; r* via adjacent-N_{r+1} lead.
    "q140_good_turing" ->
      """WITH c AS (SELECT tok, CAST(count(*) AS BIGINT) AS r
           FROM (SELECT unnest(string_split(text, ' ')) AS tok
                 FROM documents) GROUP BY 1),
         nr AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r
                FROM c GROUP BY 1),
         l AS (SELECT r, n_r,
             lead(r) OVER (ORDER BY r) AS r_next,
             lead(n_r) OVER (ORDER BY r) AS n_next
           FROM nr)
         SELECT r, n_r,
           CASE WHEN r_next = r + 1
             THEN ((r + 1) * n_next * 1000000) // n_r
             ELSE 0 END AS r_star_ppm
         FROM l""",
    // q141: split-conformal 90% threshold per source; k-th order
    // statistic via cumulative counts over distinct scores.
    "q141_conformal" ->
      """WITH g AS (SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
         tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
             least((9 * (sum(c) + 1) + 9) // 10, sum(c))::BIGINT AS k
           FROM g GROUP BY 1),
         cum AS (SELECT source, n_chars,
             CAST(sum(c) OVER (PARTITION BY source ORDER BY n_chars
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           FROM g)
         SELECT cum.source, tot.n, tot.k,
           CAST(min(cum.n_chars) AS BIGINT) AS threshold
         FROM cum JOIN tot USING (source)
         WHERE cum.cum >= tot.k
         GROUP BY 1, 2, 3""",
    // q142: top-10 overlap between cosine and raw-dot rankers over the
    // q29 query set; ties broken (score desc, vec_id asc) identically.
    "q142_rank_overlap" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                    FROM embeddings),
         n AS (SELECT vec_id, emb,
                      sqrt(list_reduce(list_transform(emb, x -> x*x), (a,b)->a+b)) AS nrm
               FROM e),
         q AS (SELECT vec_id AS query_id, emb AS qemb, nrm AS qnrm FROM n
               WHERE vec_id < 10),
         scored AS (SELECT q.query_id, c.vec_id,
             list_reduce(list_transform(c.emb, (x, i) -> x * q.qemb[i]),
                         (a, b) -> a + b) AS dot,
             q.qnrm * c.nrm AS nn
           FROM n c, q WHERE c.vec_id <> q.query_id),
         r AS (SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY dot / nn DESC, vec_id ASC) AS rk_cos,
             row_number() OVER (PARTITION BY query_id
               ORDER BY dot DESC, vec_id ASC) AS rk_dot
           FROM scored)
         SELECT query_id,
           CAST(sum(CASE WHEN rk_cos <= 10 AND rk_dot <= 10
             THEN 1 ELSE 0 END) AS BIGINT) AS overlap10,
           CAST(max(CASE WHEN rk_cos = 1 THEN vec_id END) AS BIGINT)
             AS top1_cos,
           CAST(max(CASE WHEN rk_dot = 1 THEN vec_id END) AS BIGINT)
             AS top1_dot
         FROM r WHERE rk_cos <= 10 OR rk_dot <= 10
         GROUP BY 1""",
    // q143: reciprocal-rank fusion of the two rankers — each term is
    // the INTEGER 10^9 div (60+rank), so fusion is float-free.
    "q143_rrf_fusion" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                    FROM embeddings),
         n AS (SELECT vec_id, emb,
                      sqrt(list_reduce(list_transform(emb, x -> x*x), (a,b)->a+b)) AS nrm
               FROM e),
         q AS (SELECT vec_id AS query_id, emb AS qemb, nrm AS qnrm FROM n
               WHERE vec_id < 10),
         scored AS (SELECT q.query_id, c.vec_id,
             list_reduce(list_transform(c.emb, (x, i) -> x * q.qemb[i]),
                         (a, b) -> a + b) AS dot,
             q.qnrm * c.nrm AS nn
           FROM n c, q WHERE c.vec_id <> q.query_id),
         r AS (SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY dot / nn DESC, vec_id ASC) AS rk_cos,
             row_number() OVER (PARTITION BY query_id
               ORDER BY dot DESC, vec_id ASC) AS rk_dot
           FROM scored),
         f AS (SELECT query_id, vec_id,
             1000000000 // (60 + rk_cos)
               + 1000000000 // (60 + rk_dot) AS rrf_q
           FROM r)
         SELECT query_id,
           CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY rrf_q DESC, vec_id ASC) AS BIGINT) AS frank,
           vec_id AS neighbor_id, CAST(rrf_q AS BIGINT) AS rrf_q
         FROM f
         QUALIFY frank <= 5""",
    // q144: pairwise two-sample KS over source length distributions in
    // cross-multiplied integers (no float CDFs).
    "q144_ks_test" ->
      """WITH g AS (SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
         grid AS (SELECT DISTINCT n_chars FROM g),
         tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
                 FROM g GROUP BY 1),
         filled AS (SELECT t.source, t.n, gr.n_chars,
             COALESCE(g.c, 0) AS c
           FROM tot t CROSS JOIN grid gr
           LEFT JOIN g ON g.source = t.source AND g.n_chars = gr.n_chars),
         cdf AS (SELECT source, n, n_chars,
             CAST(sum(c) OVER (PARTITION BY source ORDER BY n_chars
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           FROM filled)
         SELECT a.source AS src_a, b.source AS src_b,
           a.n AS n_a, b.n AS n_b,
           CAST(max(abs(a.cum * b.n - b.cum * a.n)) AS BIGINT) AS d_num,
           (CAST(max(abs(a.cum * b.n - b.cum * a.n)) AS BIGINT) * 1000000)
             // (a.n * b.n) AS d_ppm
         FROM cdf a JOIN cdf b
           ON a.n_chars = b.n_chars AND a.source < b.source
         GROUP BY 1, 2, 3, 4""",
    // q145: conditional entropy per prev state; -p ln p terms
    // offset-quantized to longs (q87 recipe) before the sum.
    "q145_entropy_rate" ->
      """WITH t AS (SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
           FROM events),
         m AS (SELECT prev, event_type AS next,
             CAST(count(*) AS BIGINT) AS n
           FROM t WHERE prev IS NOT NULL GROUP BY 1, 2),
         rt AS (SELECT prev, CAST(sum(n) AS BIGINT) AS row_total
                FROM m GROUP BY 1),
         q AS (SELECT m.prev, rt.row_total,
             CAST(floor((m.n / rt.row_total) * ln(rt.row_total / m.n)
               * 1000000 + 1.0/3) AS BIGINT) AS term_q
           FROM m JOIN rt USING (prev))
         SELECT prev, row_total, CAST(count(*) AS BIGINT) AS n_succ,
           CAST(sum(term_q) AS BIGINT) AS h_q
         FROM q GROUP BY 1, 2""",
    // q146: q31 scores + top1-top2 margin from the sorted score list;
    // low_conf flags margin*4 < top1.
    "q146_langid_margin" ->
      """WITH s AS (
           SELECT doc_id,
             CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'he ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'nd ', ''))) / 3 AS BIGINT) AS score_en,
             CAST((length(text) - length(replace(text, 'der', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'ein', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'sch', ''))) / 3 AS BIGINT) AS score_de,
             CAST((length(text) - length(replace(text, 'le ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'ent', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'es ', ''))) / 3 AS BIGINT) AS score_fr,
             CAST((length(text) - length(replace(text, 'de ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'la ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'os ', ''))) / 3 AS BIGINT) AS score_es
           FROM documents),
         l AS (SELECT doc_id, score_en, score_de, score_fr, score_es,
             CASE WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es THEN 'en'
                  WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
                  WHEN score_fr >= score_es THEN 'fr'
                  ELSE 'es' END AS predicted,
             list_sort([score_en, score_de, score_fr, score_es]) AS srt
           FROM s)
         SELECT doc_id, predicted,
           srt[4] AS s_top, srt[3] AS s_second,
           srt[4] - srt[3] AS margin,
           CAST(CASE WHEN (srt[4] - srt[3]) * 4 < srt[4]
             THEN 1 ELSE 0 END AS BIGINT) AS low_conf
         FROM l""",
    // q147: per-source dataset card; lower median by rank-select over
    // the per-source length histogram.
    "q147_source_profile" ->
      """WITH stats AS (SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT)
               AS total_tokens,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_en
           FROM documents GROUP BY 1),
         h AS (SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
               FROM documents GROUP BY 1, 2),
         cum AS (SELECT source, n_chars,
             CAST(sum(c) OVER (PARTITION BY source ORDER BY n_chars
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           FROM h),
         med AS (SELECT cum.source,
             CAST(min(cum.n_chars) AS BIGINT) AS p50_chars
           FROM cum JOIN stats USING (source)
           WHERE cum.cum * 2 >= stats.n_docs GROUP BY 1)
         SELECT s.source, s.n_docs, s.total_tokens,
           s.sum_chars // s.n_docs AS mean_chars, m.p50_chars,
           s.n_langs, (s.n_en * 1000000) // s.n_docs AS en_ppm
         FROM stats s JOIN med m ON s.source = m.source""",
    // q148: exact integer Gini of per-user event counts via the
    // count-of-counts histogram (run contribution v*(m*s + m(m-1)/2)).
    "q148_activity_gini" ->
      """WITH pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS v
           FROM events GROUP BY 1),
         h AS (SELECT v, CAST(count(*) AS BIGINT) AS m FROM pu GROUP BY 1),
         r AS (SELECT v, m,
             COALESCE(CAST(sum(m) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) + 1 AS s
           FROM h),
         agg AS (SELECT CAST(sum(m) AS BIGINT) AS n_users,
             CAST(sum(v * m) AS BIGINT) AS total_events,
             CAST(sum(v * (m * s + (m * (m - 1)) // 2)) AS BIGINT) AS iw
           FROM r)
         SELECT n_users, total_events,
           2 * iw - (n_users + 1) * total_events AS g_num,
           n_users * total_events AS g_den,
           ((2 * iw - (n_users + 1) * total_events) * 1000000)
             // (n_users * total_events) AS gini_ppm
         FROM agg""",
    // q149: PSI drift first vs second half; bins from per-type bounds
    // on floor(value*100); (p-q)*ln(p/q) terms offset-quantized.
    "q149_psi_drift" ->
      """WITH ev AS (SELECT event_type,
             CAST(floor(value * 100) AS BIGINT) AS cv,
             epoch_ms(ts) < 1705363200000 AS first_half
           FROM events),
         bounds AS (SELECT event_type, CAST(min(cv) AS BIGINT) AS lo,
             CAST(max(cv) AS BIGINT) AS hi
           FROM ev GROUP BY 1),
         binned AS (SELECT e.event_type,
             ((e.cv - b.lo) * 10) // (b.hi + 1 - b.lo) AS bin,
             CAST(sum(CASE WHEN e.first_half THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN NOT e.first_half THEN 1 ELSE 0 END) AS BIGINT) AS b
           FROM ev e JOIN bounds b USING (event_type) GROUP BY 1, 2),
         tot AS (SELECT event_type, CAST(sum(a) AS BIGINT) AS na,
             CAST(sum(b) AS BIGINT) AS nb
           FROM binned GROUP BY 1),
         q AS (SELECT bi.event_type,
             CAST(floor(((bi.a / t.na - bi.b / t.nb)
               * ln((bi.a / t.na) / (bi.b / t.nb))) * 1000000 + 1.0/3)
               AS BIGINT) AS term_q
           FROM binned bi JOIN tot t USING (event_type)
           WHERE bi.a > 0 AND bi.b > 0)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum(term_q) AS BIGINT) AS psi_q
         FROM q GROUP BY 1""",
    // q150: join-key skew audit per lineitem key column; hottest key by
    // (count, key) struct-max tie-break, entropy terms quantized.
    "q150_key_skew" ->
      """WITH src AS (SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem),
         ko AS (SELECT 'l_orderkey' AS key_col, l_orderkey AS k FROM src),
         kp AS (SELECT 'l_partkey' AS key_col, l_partkey AS k FROM src),
         ks AS (SELECT 'l_suppkey' AS key_col, l_suppkey AS k FROM src),
         u AS (SELECT * FROM ko UNION ALL SELECT * FROM kp
               UNION ALL SELECT * FROM ks),
         c AS (SELECT key_col, k, CAST(count(*) AS BIGINT) AS c
               FROM u GROUP BY 1, 2),
         tot AS (SELECT key_col, CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(c) AS BIGINT) AS n_rows,
             max(struct_pack(c := c, k := k)) AS top
           FROM c GROUP BY 1),
         ent AS (SELECT c.key_col,
             CAST(sum(CAST(floor(((c.c / t.n_rows) * ln(t.n_rows / c.c))
               * 1000000 + 1.0/3) AS BIGINT)) AS BIGINT) AS entropy_q
           FROM c JOIN tot t USING (key_col) GROUP BY 1)
         SELECT t.key_col, t.n_keys, t.n_rows,
           CAST(t.top.c AS BIGINT) AS top_count,
           CAST(t.top.k AS BIGINT) AS top_key,
           (t.top.c * 1000000) // t.n_rows AS top_share_ppm,
           e.entropy_q
         FROM tot t JOIN ent e ON t.key_col = e.key_col""",
    // q151: Theil-Sen median pairwise slope of the hourly count series;
    // deterministic (slope, ha, hb) rank picks the median element.
    "q151_theil_sen" ->
      """WITH hourly AS (SELECT event_type,
             epoch_ms(ts) // 3600000 AS h, CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         pairs AS (SELECT a.event_type, a.h AS ha, b.h AS hb,
             (b.c - a.c) / (b.h - a.h) AS slope
           FROM hourly a JOIN hourly b
             ON a.event_type = b.event_type AND a.h < b.h),
         np AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs
                FROM pairs GROUP BY 1),
         r AS (SELECT event_type, slope,
             row_number() OVER (PARTITION BY event_type
               ORDER BY slope, ha, hb) AS rk
           FROM pairs)
         SELECT r.event_type, np.n_pairs,
           CAST(floor(r.slope * 1000000 + 1.0/3) AS BIGINT) AS med_slope_q
         FROM r JOIN np USING (event_type)
         WHERE r.rk = (np.n_pairs + 1) // 2""",
    // q152: hour-of-day eta^2 + peak hour; q60 exact-decimal discipline
    // (centi-floored sums before double casts, quantized per-bin terms).
    "q152_hod_profile" ->
      """WITH b AS (SELECT event_type,
             (epoch_ms(ts) // 3600000) % 24 AS hod,
             CAST(value AS decimal(18,6)) AS xd
           FROM events),
         byh AS (SELECT event_type, hod, CAST(count(*) AS BIGINT) AS nh,
             sum(xd) AS sh
           FROM b GROUP BY 1, 2),
         byh2 AS (SELECT event_type, hod, nh,
             CAST(floor((CAST(floor(sh * sh * 100) AS BIGINT) / 100.0)
               / nh * 100) AS BIGINT) AS ssb_cq,
             (CAST(floor(sh * 100) AS BIGINT) * 1000000) // nh AS mean_cq
           FROM byh),
         bet AS (SELECT event_type,
             CAST(sum(ssb_cq) AS BIGINT) AS ssb_cq,
             max(struct_pack(mean_cq := mean_cq, hod := hod)) AS peak
           FROM byh2 GROUP BY 1),
         g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xd) AS double) AS s,
             CAST(floor(sum(xd * xd) * 100) AS BIGINT) / 100.0 AS q
           FROM b GROUP BY 1)
         SELECT g.event_type, g.n,
           CAST(bet.peak.hod AS BIGINT) AS peak_hod,
           CAST(bet.peak.mean_cq AS BIGINT) AS peak_mean_cq,
           CASE WHEN g.q - g.s * g.s / g.n <= 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(floor(((bet.ssb_cq / 100.0 - g.s * g.s / g.n)
                  / (g.q - g.s * g.s / g.n)) * 1000000) AS BIGINT)
           END AS eta2_ppm
         FROM g JOIN bet USING (event_type)""",
    // q153: Mann-Kendall S + tie-corrected variance on an 18x integer
    // scale — no sqrt, no floats.
    "q153_mann_kendall" ->
      """WITH hourly AS (SELECT event_type,
             epoch_ms(ts) // 3600000 AS h, CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         s AS (SELECT a.event_type,
             CAST(sum(CASE WHEN b.c > a.c THEN 1
                           WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
           FROM hourly a JOIN hourly b
             ON a.event_type = b.event_type AND a.h < b.h
           GROUP BY 1),
         n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_points
               FROM hourly GROUP BY 1),
         ties AS (SELECT event_type,
             CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
           FROM (SELECT event_type, c, CAST(count(*) AS BIGINT) AS t
                 FROM hourly GROUP BY 1, 2)
           WHERE t > 1 GROUP BY 1)
         SELECT s.event_type, n.n_points, s.s_stat,
           n.n_points * (n.n_points - 1) * (2 * n.n_points + 5)
             - COALESCE(ties.tie18, 0) AS var18
         FROM s JOIN n USING (event_type)
         LEFT JOIN ties USING (event_type)""",
    // q154: Lorenz deciles of event volume by user activity rank;
    // histogram runs sliced across decile boundaries with integer ceils.
    "q154_lorenz" ->
      """WITH pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS v
           FROM events GROUP BY 1),
         h AS (SELECT v, CAST(count(*) AS BIGINT) AS m FROM pu GROUP BY 1),
         tot AS (SELECT CAST(sum(m) AS BIGINT) AS n_users,
             CAST(sum(v * m) AS BIGINT) AS n_events
           FROM h),
         r AS (SELECT v, m,
             COALESCE(CAST(sum(m) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) AS s
           FROM h),
         dgrid AS (SELECT * FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7),
             (8),(9)) AS t(d)),
         sliced AS (SELECT g.d,
             greatest(r.s, (g.d * tot.n_users + 9) // 10) AS lo,
             least(r.s + r.m, ((g.d + 1) * tot.n_users + 9) // 10) AS hi,
             r.v
           FROM r, tot, dgrid g),
         dec AS (SELECT d,
             CAST(sum((hi - lo) * v) AS BIGINT) AS dec_events,
             CAST(sum(hi - lo) AS BIGINT) AS dec_users
           FROM sliced WHERE hi > lo GROUP BY 1)
         SELECT d AS decile, dec_users, dec_events,
           (CAST(sum(dec_users) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
             AS BIGINT) * 1000000) // tot.n_users AS cum_users_ppm,
           (CAST(sum(dec_events) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
             AS BIGINT) * 1000000) // tot.n_events AS cum_events_ppm
         FROM dec, tot""",
    // q155: Dirichlet-smoothed per-source English rate, m=20 pseudo-
    // count toward the corpus prior (entered as truncated ppm).
    "q155_eb_rates" ->
      """WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_en
           FROM documents GROUP BY 1),
         prior AS (SELECT (CAST(sum(n_en) AS BIGINT) * 1000000)
             // CAST(sum(n) AS BIGINT) AS corpus_ppm
           FROM per)
         SELECT per.source, per.n, per.n_en, prior.corpus_ppm,
           (per.n_en * 1000000) // per.n AS raw_ppm,
           (per.n_en * 1000000 + 20 * prior.corpus_ppm) // (per.n + 20)
             AS smoothed_ppm
         FROM per, prior""",
    // q156: per-user avg surprisal under the global lag-1 transition
    // model; -ln p terms q87-quantized on the 25-row matrix.
    "q156_user_surprisal" ->
      """WITH t AS (SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
           FROM events),
         seq AS (SELECT user_id, prev, event_type AS next
                 FROM t WHERE prev IS NOT NULL),
         m AS (SELECT prev, next, CAST(count(*) AS BIGINT) AS n
               FROM seq GROUP BY 1, 2),
         rt AS (SELECT prev, CAST(sum(n) AS BIGINT) AS row_total
                FROM m GROUP BY 1),
         terms AS (SELECT m.prev, m.next,
             CAST(floor(ln(rt.row_total / m.n) * 1000000 + 1.0/3)
               AS BIGINT) AS term_q
           FROM m JOIN rt USING (prev))
         SELECT seq.user_id, CAST(count(*) AS BIGINT) AS n_trans,
           CAST(sum(terms.term_q) AS BIGINT) AS surprisal_q,
           CAST(sum(terms.term_q) AS BIGINT) // CAST(count(*) AS BIGINT)
             AS avg_surprisal_q
         FROM seq JOIN terms USING (prev, next)
         GROUP BY 1""",
    // q157: coverage at fixed vocab sizes; q53's (tf desc, tok asc)
    // rank over the type relation.
    "q157_coverage_curve" ->
      """WITH c AS (SELECT tok, CAST(count(*) AS BIGINT) AS tf
           FROM (SELECT unnest(string_split(text, ' ')) AS tok
                 FROM documents) GROUP BY 1),
         tot AS (SELECT CAST(sum(tf) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS vocab
           FROM c),
         r AS (SELECT tok, tf,
             CAST(row_number() OVER (ORDER BY tf DESC, tok ASC) AS BIGINT)
               AS rk,
             CAST(sum(tf) OVER (ORDER BY tf DESC, tok ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           FROM c)
         SELECT r.rk AS k, r.cum AS covered, tot.total, tot.vocab,
           (r.cum * 1000000) // tot.total AS coverage_ppm
         FROM r, tot
         WHERE r.rk IN (10, 20, 50, 100, 200, 500, 1000)""",
    // q158: within-session (30-min gap) pair lift over session-level
    // type presence; exact cross-multiplied ppm.
    "q158_basket_lift" ->
      """WITH o AS (SELECT user_id, event_id, ts, event_type,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_ts
           FROM events),
         s AS (SELECT user_id, event_type,
             CAST(sum(CASE WHEN prev_ts IS NULL
                 OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000
               THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS session_id
           FROM o),
         pres AS (SELECT DISTINCT user_id, session_id, event_type FROM s),
         totals AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
                    FROM pres GROUP BY 1),
         ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions
                FROM (SELECT DISTINCT user_id, session_id FROM pres)),
         pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_ab
           FROM pres a JOIN pres b
             ON a.user_id = b.user_id AND a.session_id = b.session_id
                AND a.event_type < b.event_type
           GROUP BY 1, 2)
         SELECT p.type_a, p.type_b, p.n_ab,
           ta.n_t AS n_a, tb.n_t AS n_b,
           (p.n_ab * ns.n_sessions * 1000000) // (ta.n_t * tb.n_t)
             AS lift_ppm
         FROM pairs p
         JOIN totals ta ON ta.event_type = p.type_a
         JOIN totals tb ON tb.event_type = p.type_b, ns""",
    // q159: per-doc bigram surprisal — the w1 marginal is a window over
    // the bigram-count relation; each ln is offset-quantized BEFORE the
    // per-doc sum (the q87 associativity dodge)
    "q159_doc_ppl" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                  generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents),
         bg AS (SELECT a.doc_id, a.tok AS w1, b.tok AS w2
                FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
         m AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
               FROM bg GROUP BY 1, 2),
         mm AS (SELECT w1, w2, c12,
                  CAST(sum(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1
                FROM m),
         g AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(CAST(floor(ln(c1 / c12) * 10000 + 1.0/3) AS BIGINT))
               AS BIGINT) AS surprisal_q
           FROM bg JOIN mm USING (w1, w2)
           GROUP BY doc_id)
         SELECT doc_id, n_bigrams, surprisal_q,
                surprisal_q / n_bigrams AS mean_surprisal_q
         FROM g""",
    // q160: integer tf·idf_q score (idf quantized once per term), top-3
    // per doc by (score desc, token)
    "q160_tfidf_terms" ->
      """WITH tf AS (
           SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents)
           GROUP BY 1, 2),
         df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         s AS (
           SELECT t.doc_id, t.tok, t.tf, d.df,
             t.tf * CAST(floor(ln(n_docs / d.df) * 10000 + 1.0/3) AS BIGINT)
               AS score
           FROM tf t JOIN df d USING (tok), nd),
         r AS (SELECT doc_id, tok, tf, df, score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, tok) AS rn
               FROM s)
         SELECT doc_id, CAST(rn AS BIGINT) AS rank, tok, tf, df, score
         FROM r WHERE rn <= 3 AND score > 0""",
    // q161: HLL sketch — register harmonic sum computed EXACTLY as
    // Σ 2^(55−M_j) in bigints; the single float step (constant / S) is
    // the same integer-valued-double op sequence on both engines
    "q161_hll_distinct" ->
      """WITH h AS (
           SELECT event_type, user_id,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
               AS BIGINT) AS hv
           FROM events),
         r AS (SELECT event_type, hv % 64 AS reg, hv // 64 AS rest FROM h),
         rr AS (SELECT event_type, reg,
                  max(CASE WHEN rest = 0 THEN 55
                           ELSE 55 - len(bin(rest)) END) AS m_j
                FROM r GROUP BY 1, 2),
         sk AS (SELECT event_type,
                  CAST(sum(1::BIGINT << CAST(55 - m_j AS INT)) AS BIGINT)
                    AS s_obs,
                  CAST(count(*) AS BIGINT) AS n_regs
                FROM rr GROUP BY 1),
         sv AS (SELECT event_type, 64 - n_regs AS v_empty,
                  s_obs + (64 - n_regs) * 36028797018963968 AS s_sum
                FROM sk),
         ex AS (SELECT event_type,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
                FROM events GROUP BY 1),
         est AS (
           SELECT event_type, CAST(v_empty AS BIGINT) AS v_empty,
             CAST(s_sum AS BIGINT) AS s_sum,
             CASE WHEN v_empty > 0 AND
               CAST(2904064 AS DOUBLE) * CAST(36028797018963968 AS DOUBLE)
                 / s_sum / CAST(1000 AS DOUBLE) < 160.0
             THEN CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE) / v_empty)
             ELSE CAST(2904064 AS DOUBLE) * CAST(36028797018963968 AS DOUBLE)
                 / s_sum / CAST(1000 AS DOUBLE) END AS e
           FROM sv)
         SELECT est.event_type, v_empty, s_sum,
           CAST(floor(e * 100) AS BIGINT) AS est_q, n_exact,
           (abs(CAST(floor(e * 100) AS BIGINT) - n_exact * 100) * 1000000)
             // (n_exact * 100) AS err_ppm
         FROM est JOIN ex ON est.event_type = ex.event_type""",
    // q162: q31's predictor vs the gold lang column; precision/recall
    // are exact integer ppm over the bounded confusion matrix
    "q162_confusion" ->
      """WITH s AS (
           SELECT lang,
             CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'he ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'nd ', ''))) / 3 AS BIGINT) AS score_en,
             CAST((length(text) - length(replace(text, 'der', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'ein', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'sch', ''))) / 3 AS BIGINT) AS score_de,
             CAST((length(text) - length(replace(text, 'le ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'ent', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'es ', ''))) / 3 AS BIGINT) AS score_fr,
             CAST((length(text) - length(replace(text, 'de ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'la ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'os ', ''))) / 3 AS BIGINT) AS score_es
           FROM documents),
         p AS (
           SELECT lang AS gold,
             CASE WHEN score_en >= score_de AND score_en >= score_fr
                       AND score_en >= score_es THEN 'en'
                  WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
                  WHEN score_fr >= score_es THEN 'fr'
                  ELSE 'es' END AS predicted
           FROM s),
         cm AS (SELECT gold, predicted, CAST(count(*) AS BIGINT) AS n
                FROM p GROUP BY 1, 2)
         SELECT gold, predicted, n,
           (n * 1000000) // CAST(sum(n) OVER (PARTITION BY predicted) AS BIGINT)
             AS precision_ppm,
           (n * 1000000) // CAST(sum(n) OVER (PARTITION BY gold) AS BIGINT)
             AS recall_ppm
         FROM cm""",
    // q163: deterministic Poisson bootstrap — integer CDF thresholds
    // (floor(2^20·cdf)), integer replica means, ranks 6/95 of 100
    "q163_bootstrap_ci" ->
      """WITH b AS (SELECT unnest(range(100)) AS b),
         w AS (
           SELECT d.source, d.n_chars, b.b,
             CASE WHEN u < 385749 THEN 0 WHEN u < 771498 THEN 1
                  WHEN u < 964372 THEN 2 WHEN u < 1028665 THEN 3
                  WHEN u < 1044738 THEN 4 ELSE 5 END AS w
           FROM (SELECT source, n_chars, doc_id FROM documents) d, b,
             LATERAL (SELECT CAST('0x' || substr(md5(
               CAST(d.doc_id AS VARCHAR) || '_b' || CAST(b.b AS VARCHAR)),
               1, 8) AS BIGINT) % 1048576 AS u) uu),
         reps AS (
           SELECT source, b,
             (CAST(sum(w * n_chars) AS BIGINT) * 1000)
               // CAST(sum(w) AS BIGINT) AS mean_q
           FROM w GROUP BY 1, 2
           HAVING sum(w) > 0),
         rk AS (SELECT source, mean_q,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY mean_q, b) AS rn
                FROM reps),
         pt AS (SELECT source,
                  (CAST(sum(n_chars) AS BIGINT) * 1000) // count(*) AS point_q
                FROM documents GROUP BY 1)
         SELECT r.source, CAST(count(*) AS BIGINT) AS n_reps, pt.point_q,
           min(CASE WHEN rn = 6 THEN mean_q END) AS lo_q,
           min(CASE WHEN rn = 95 THEN mean_q END) AS hi_q
         FROM rk r JOIN pt ON r.source = pt.source
         GROUP BY r.source, pt.point_q""",
    // q164: q100's spans aggregated to per-source duplicated-token ppm
    "q164_dup_token_rate" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         sh AS (
           SELECT doc_id,
             unnest(range(1, len(toks) - 3)) AS pos,
             unnest(list_transform(range(1, len(toks) - 3),
               i -> array_to_string(toks[i:i+4], ' '))) AS sh
           FROM t WHERE len(toks) >= 5),
         dup AS (SELECT sh FROM sh GROUP BY sh
                 HAVING count(DISTINCT doc_id) >= 2),
         hit AS (SELECT s.doc_id, s.pos FROM sh s JOIN dup USING (sh)),
         isl AS (
           SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 5
                  THEN 0 ELSE 1 END AS brk
           FROM hit),
         g AS (
           SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM isl),
         spans AS (SELECT doc_id, max(pos) + 5 - min(pos) AS span_tokens
                   FROM g GROUP BY doc_id, grp),
         perdoc AS (SELECT doc_id, CAST(sum(span_tokens) AS BIGINT) AS dup_tokens
                    FROM spans GROUP BY doc_id),
         lens AS (SELECT doc_id, source,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                  FROM documents)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(coalesce(dup_tokens, 0)) AS BIGINT) AS dup_tokens,
           CAST(sum(CASE WHEN dup_tokens > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_hit,
           (CAST(sum(coalesce(dup_tokens, 0)) AS BIGINT) * 1000000)
             // CAST(sum(n_tokens) AS BIGINT) AS dup_ppm
         FROM lens LEFT JOIN perdoc USING (doc_id)
         GROUP BY source""",
    // q165: hourly hot cells — top-20 exact-integer excess ratios over
    // bounded (type, day, hour) aggregates; deterministic tie-break
    "q165_hot_cells" ->
      """WITH cells AS (
           SELECT event_type, CAST(ts AS DATE) AS d, hour(ts) AS hod,
             CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2, 3),
         prof AS (SELECT event_type, hod, CAST(sum(c) AS BIGINT) AS total
                  FROM cells GROUP BY 1, 2),
         nd AS (SELECT CAST(count(DISTINCT d) AS BIGINT) AS n_days FROM cells)
         SELECT c.event_type, c.d AS day, CAST(c.hod AS BIGINT) AS hod,
           c.c, p.total, nd.n_days,
           (c.c * nd.n_days * 1000000) // p.total AS ratio_ppm
         FROM cells c
         JOIN prof p ON c.event_type = p.event_type AND c.hod = p.hod, nd
         WHERE c.c >= 3
         ORDER BY ratio_ppm DESC, c.event_type, c.d, c.hod
         LIMIT 20""",
    // q166: weak-label seeds (q123's LFs) densified by top-tf-idf-term
    // group consensus (q160's rank-1 term, df <= 20)
    "q166_label_prop" ->
      """WITH f AS (
           SELECT doc_id,
             CAST(CASE WHEN length(text) >= 200 THEN 1 ELSE 0 END AS BIGINT)
           + CAST(CASE WHEN strpos(lower(text), ' the ') > 0 THEN 1 ELSE 0
               END AS BIGINT)
           + CAST(CASE WHEN (length(text)
               - length(regexp_replace(text, '[.!?,;]', '', 'g'))) * 20
               >= length(text) THEN 1 ELSE 0 END AS BIGINT)
           + CAST(CASE WHEN (length(text)
               - length(regexp_replace(text, '[0-9]', '', 'g'))) * 50
               <= length(text) THEN 1 ELSE 0 END AS BIGINT) AS votes
           FROM documents),
         seeds AS (
           SELECT doc_id,
             CAST(CASE WHEN votes >= 3 THEN 1 WHEN votes <= 1 THEN 0
               ELSE 2 END AS BIGINT) AS seed
           FROM f),
         tf AS (
           SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents)
           GROUP BY 1, 2),
         df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         s AS (
           SELECT t.doc_id, t.tok, d.df,
             t.tf * CAST(floor(ln(n_docs / d.df) * 10000 + 1.0/3) AS BIGINT)
               AS score
           FROM tf t JOIN df d USING (tok), nd
           WHERE d.df * 4 <= nd.n_docs),
         top1 AS (
           SELECT doc_id, tok FROM (
             SELECT doc_id, tok, df, score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, tok) AS rn
             FROM s)
           WHERE rn = 1 AND score > 0),
         grp AS (SELECT t.doc_id, t.tok, seeds.seed
                 FROM top1 t JOIN seeds USING (doc_id)),
         cons AS (
           SELECT tok,
             CAST(sum(CASE WHEN seed = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN seed = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
           FROM grp GROUP BY 1)
         SELECT g.doc_id, g.tok, g.seed,
           CAST(CASE WHEN g.seed <> 2 THEN g.seed
                WHEN c.n1 > c.n0 THEN 1
                WHEN c.n0 > c.n1 THEN 0
                ELSE 2 END AS BIGINT) AS label,
           c.n1, c.n0
         FROM grp g JOIN cons c USING (tok)""",
    // q167: NDCG@10 — discount weights are precomputed integer literals
    // identical on both engines; no runtime libm
    "q167_ndcg" ->
      """WITH d AS (
           SELECT source, doc_id, n_chars,
             CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS rel
           FROM documents),
         nr AS (SELECT source, CAST(sum(rel) AS BIGINT) AS n_rel
                FROM d GROUP BY 1),
         rk AS (SELECT source, rel,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY n_chars DESC, doc_id) AS rn
                FROM d),
         dcg AS (
           SELECT source,
             CAST(sum(rel * ([1000000, 630929, 500000, 430676, 386852,
               356207, 333333, 315464, 301029, 289064])[rn]) AS BIGINT)
               AS dcg_q
           FROM rk WHERE rn <= 10 GROUP BY 1)
         SELECT dcg.source, nr.n_rel, dcg.dcg_q,
           CAST(([1000000, 1630929, 2130929, 2561605, 2948457, 3304664,
             3637997, 3953461, 4254490, 4543554])
             [CASE WHEN nr.n_rel < 10 THEN nr.n_rel ELSE 10 END]
             AS BIGINT) AS idcg_q,
           (dcg.dcg_q * 1000000) // CAST(([1000000, 1630929, 2130929,
             2561605, 2948457, 3304664, 3637997, 3953461, 4254490,
             4543554])[CASE WHEN nr.n_rel < 10 THEN nr.n_rel ELSE 10 END]
             AS BIGINT) AS ndcg_ppm
         FROM dcg JOIN nr ON dcg.source = nr.source
         WHERE nr.n_rel > 0""",
    // q168: SCD2 versions — islands of equal quantized value per user
    "q168_scd2_history" ->
      """WITH v AS (
           SELECT user_id, event_id, epoch_ms(ts) AS tms,
             CAST(floor(value * 1000 + 1.0/3) AS BIGINT) AS vq
           FROM events),
         ch AS (
           SELECT * FROM (
             SELECT user_id, event_id, tms, vq,
               lag(vq) OVER (PARTITION BY user_id
                             ORDER BY tms, event_id) AS prev_vq
             FROM v)
           WHERE prev_vq IS NULL OR prev_vq <> vq)
         SELECT user_id,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY tms, event_id) AS BIGINT)
             AS version,
           vq, tms AS valid_from,
           lead(tms) OVER (PARTITION BY user_id
                           ORDER BY tms, event_id) AS valid_to,
           lead(tms) OVER (PARTITION BY user_id
                           ORDER BY tms, event_id) IS NULL AS is_current
         FROM ch""",
    // q169: Hamilton largest-remainder apportionment of a 10k budget
    "q169_budget_alloc" ->
      """WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
                      FROM documents GROUP BY 1),
         tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM per),
         base AS (
           SELECT source, n_docs,
             (10000 * n_docs) // n_total AS base,
             10000 * n_docs - ((10000 * n_docs) // n_total) * n_total AS rem
           FROM per, tot),
         k AS (SELECT 10000 - CAST(sum(base) AS BIGINT) AS k FROM base),
         rk AS (SELECT source, n_docs, base, rem,
                  CAST(row_number() OVER (ORDER BY rem DESC, source)
                    AS BIGINT) AS rk
                FROM base)
         SELECT source, n_docs, CAST(base AS BIGINT) AS base,
           CAST(base + CASE WHEN rk <= k.k THEN 1 ELSE 0 END AS BIGINT)
             AS alloc
         FROM rk, k""",
    // q170: 32-bucket histogram quantile sketch vs exact type-1
    // percentiles — all integer bucket arithmetic
    "q170_hist_quantiles" ->
      """WITH v AS (SELECT source, n_chars FROM documents),
         b AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM v),
         hist AS (
           SELECT source, lo, hi,
             ((n_chars - lo) * 32) // (hi + 1 - lo) AS bucket,
             CAST(count(*) AS BIGINT) AS c
           FROM v, b GROUP BY 1, 2, 3, 4),
         tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
                 FROM hist GROUP BY 1),
         cum AS (
           SELECT h.source, h.lo, h.hi, h.bucket, t.n,
             CAST(sum(h.c) OVER (PARTITION BY h.source ORDER BY h.bucket
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           FROM hist h JOIN tot t ON h.source = t.source),
         bv AS (SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
                FROM v GROUP BY 1, 2),
         cv AS (
           SELECT b2.source, b2.n_chars, t.n,
             CAST(sum(b2.c) OVER (PARTITION BY b2.source ORDER BY b2.n_chars
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           FROM bv b2 JOIN tot t ON b2.source = t.source),
         e50 AS (SELECT source,
                   min(lo + (bucket * (hi + 1 - lo)) // 32) AS est_p50
                 FROM cum WHERE cum * 100 >= n * 50 GROUP BY 1),
         e90 AS (SELECT source,
                   min(lo + (bucket * (hi + 1 - lo)) // 32) AS est_p90
                 FROM cum WHERE cum * 100 >= n * 90 GROUP BY 1),
         x50 AS (SELECT source, min(n_chars) AS exact_p50
                 FROM cv WHERE cum * 100 >= n * 50 GROUP BY 1),
         x90 AS (SELECT source, min(n_chars) AS exact_p90
                 FROM cv WHERE cum * 100 >= n * 90 GROUP BY 1)
         SELECT source, est_p50, exact_p50, est_p90, exact_p90
         FROM e50 JOIN e90 USING (source) JOIN x50 USING (source)
         JOIN x90 USING (source)""",
    // q171: 2x2 chi-square; the one float step is a single expression
    // in identical op order on both engines, quantized at 1e3
    "q171_chi2_ab" ->
      """WITH cells AS (
           SELECT event_type,
             CAST(sum(CASE WHEN epoch_ms(ts) < 1705363200000 AND value >= 10.0
               THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN epoch_ms(ts) < 1705363200000 AND value < 10.0
               THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN epoch_ms(ts) >= 1705363200000 AND value >= 10.0
               THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN epoch_ms(ts) >= 1705363200000 AND value < 10.0
               THEN 1 ELSE 0 END) AS BIGINT) AS d
           FROM events GROUP BY 1)
         SELECT event_type, a, b, c, d,
           CAST(floor((CAST(a + b + c + d AS DOUBLE)
             * CAST(a * d - b * c AS DOUBLE)
             * CAST(a * d - b * c AS DOUBLE)
             / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
               * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)))
             * 1000) AS BIGINT) AS chi2_milli
         FROM cells
         WHERE a + b > 0 AND c + d > 0 AND a + c > 0 AND b + d > 0""",
    // q172: q26's band candidates audited against exact Jaccard >= 0.5
    // ground truth (naive all-pairs in the oracle; PPJoin in the engine
    // - same provably-identical truth set)
    "q172_lsh_recall" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                  generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents),
         sh AS (
           SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
           FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                      JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
         mh AS (SELECT s.doc_id, sd.seed, min(md5(sd.seed || ':' || s.shingle)) AS mh
                FROM sh s, range(12) sd(seed) GROUP BY 1, 2),
         bands AS (SELECT doc_id, seed // 3 AS band,
                          string_agg(mh, ',' ORDER BY seed) AS sig
                   FROM mh GROUP BY 1, 2),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         card AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         tpairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                    FROM sh a JOIN sh b
                      ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
         tshared AS (
           SELECT p.doc_a, p.doc_b, count(*) AS n_shared
           FROM tpairs p JOIN sh sa ON sa.doc_id = p.doc_a
                         JOIN sh sb ON sb.doc_id = p.doc_b
                                   AND sa.shingle = sb.shingle
           GROUP BY 1, 2),
         truth AS (
           SELECT s.doc_a, s.doc_b
           FROM tshared s JOIN card ca ON ca.doc_id = s.doc_a
                          JOIN card cb ON cb.doc_id = s.doc_b
           WHERE s.n_shared / (ca.n + cb.n - s.n_shared) >= 0.5),
         m AS (SELECT
             CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
             CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_cand,
             CAST((SELECT count(*) FROM cand JOIN truth USING (doc_a, doc_b))
               AS BIGINT) AS n_hit)
         SELECT n_truth, n_cand, n_hit,
           (n_hit * 1000000) // n_truth AS recall_ppm,
           (n_hit * 1000000) // n_cand AS precision_ppm
         FROM m""",
    // q173: 30-min-gap sessions; path = first 3 event types; top-10
    "q173_top_paths" ->
      """WITH o AS (SELECT user_id, event_id, ts, event_type,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_ts
           FROM events),
         s AS (SELECT user_id, event_id, ts, event_type,
             CAST(sum(CASE WHEN prev_ts IS NULL
                 OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000
               THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS session_id
           FROM o),
         st AS (SELECT user_id, session_id, event_type,
                  row_number() OVER (PARTITION BY user_id, session_id
                                     ORDER BY ts, event_id) AS step
                FROM s),
         p AS (
           SELECT user_id, session_id,
             max(CASE WHEN step = 1 THEN event_type END) || '>' ||
             max(CASE WHEN step = 2 THEN event_type END) || '>' ||
             max(CASE WHEN step = 3 THEN event_type END) AS path
           FROM st WHERE step <= 3
           GROUP BY 1, 2 HAVING count(*) = 3)
         SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
         FROM p GROUP BY 1
         ORDER BY n_sessions DESC, path LIMIT 10""",
    // q174: per-source dataset card; entropy terms ln-quantized before
    // the bounded sum; dup rate from the fingerprint groupBy
    "q174_dataset_card" ->
      """WITH d AS (
           SELECT doc_id, source, lang, n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
             md5(text) AS fp
           FROM documents),
         base AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS nl,
                    CAST(sum(n_toks) AS BIGINT) AS tl,
                    CAST(sum(n_chars) AS BIGINT) AS cl
                  FROM d GROUP BY 1, 2),
         ps AS (SELECT source, lang, nl, tl, cl,
                  CAST(sum(nl) OVER (PARTITION BY source) AS BIGINT) AS n
                FROM base),
         agg AS (
           SELECT source, CAST(sum(nl) AS BIGINT) AS n_docs,
             CAST(sum(tl) AS BIGINT) AS n_tokens,
             CAST(sum(cl) AS BIGINT) AS nc,
             CAST(count(*) AS BIGINT) AS n_langs,
             CAST(sum(CAST(floor((nl / n) * ln(n / nl) * 1000000 + 1.0/3)
               AS BIGINT)) AS BIGINT) AS lang_entropy_q
           FROM ps GROUP BY 1),
         dp AS (SELECT source, CAST(count(*) AS BIGINT) AS n_dup_docs
                FROM d JOIN (SELECT fp FROM d GROUP BY fp
                             HAVING count(*) > 1) f USING (fp)
                GROUP BY 1)
         SELECT a.source, n_docs, n_tokens,
           (nc * 1000) // n_docs AS mean_chars_milli,
           n_langs, lang_entropy_q,
           coalesce(dp.n_dup_docs, 0) AS n_dup_docs,
           (coalesce(dp.n_dup_docs, 0) * 1000000) // n_docs AS dup_ppm
         FROM agg a LEFT JOIN dp ON a.source = dp.source""",
    // q175: 3-step greedy MMR per source over the top-8 pool; cosine
    // quantized at 1e6 before the integer 7*rel - 3*pen score
    "q175_mmr_diversify" ->
      """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
         b AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM d),
         pool AS (
           SELECT source, doc_id, ((n_chars - lo) * 1000000) // (hi + 1 - lo)
             AS rel_ppm
           FROM (SELECT d.doc_id, d.source, d.n_chars, b.lo, b.hi,
                   row_number() OVER (PARTITION BY source
                     ORDER BY n_chars DESC, doc_id) AS rk
                 FROM d, b)
           WHERE rk <= 8),
         n AS (SELECT vec_id AS doc_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
         nn AS (SELECT doc_id, emb,
                  sqrt(list_reduce(list_transform(emb, x -> x*x),
                    (a,b) -> a+b)) AS nrm
                FROM n),
         p AS (SELECT pool.source, pool.doc_id, pool.rel_ppm, nn.emb, nn.nrm
               FROM pool JOIN nn USING (doc_id)),
         s1 AS (SELECT * FROM (
             SELECT source, doc_id AS d1, rel_ppm AS rel1,
               rel_ppm * 7 AS m1, emb AS e1, nrm AS nrm1,
               row_number() OVER (PARTITION BY source
                 ORDER BY rel_ppm * 7 DESC, doc_id) AS rk
             FROM p) WHERE rk = 1),
         r2 AS (
           SELECT p.source, p.doc_id, p.rel_ppm, p.emb, p.nrm,
             s1.d1, s1.e1, s1.nrm1,
             p.rel_ppm * 7 - CAST(floor(
               list_reduce(list_transform(p.emb, (x,i) -> x * s1.e1[i]),
                 (a,b) -> a+b) / (p.nrm * s1.nrm1) * 1000000) AS BIGINT) * 3
               AS mmr_q
           FROM p JOIN s1 ON p.source = s1.source AND p.doc_id <> s1.d1),
         s2 AS (SELECT * FROM (
             SELECT source, doc_id AS d2, rel_ppm AS rel2, mmr_q AS m2,
               emb AS e2, nrm AS nrm2, d1, e1, nrm1,
               row_number() OVER (PARTITION BY source
                 ORDER BY mmr_q DESC, doc_id) AS rk
             FROM r2) WHERE rk = 1),
         r3 AS (
           SELECT p.source, p.doc_id, p.rel_ppm,
             p.rel_ppm * 7 - greatest(
               CAST(floor(list_reduce(list_transform(p.emb,
                 (x,i) -> x * s2.e1[i]), (a,b) -> a+b)
                 / (p.nrm * s2.nrm1) * 1000000) AS BIGINT),
               CAST(floor(list_reduce(list_transform(p.emb,
                 (x,i) -> x * s2.e2[i]), (a,b) -> a+b)
                 / (p.nrm * s2.nrm2) * 1000000) AS BIGINT)) * 3 AS mmr_q
           FROM p JOIN s2 ON p.source = s2.source
             AND p.doc_id <> s2.d1 AND p.doc_id <> s2.d2),
         s3 AS (SELECT * FROM (
             SELECT source, doc_id AS d3, rel_ppm AS rel3, mmr_q AS m3,
               row_number() OVER (PARTITION BY source
                 ORDER BY mmr_q DESC, doc_id) AS rk
             FROM r3) WHERE rk = 1)
         SELECT source, CAST(1 AS BIGINT) AS pick, d1 AS doc_id,
           rel1 AS rel_ppm, m1 AS mmr_q FROM s1
         UNION ALL
         SELECT source, CAST(2 AS BIGINT), d2, rel2, m2 FROM s2
         UNION ALL
         SELECT source, CAST(3 AS BIGINT), d3, rel3, m3 FROM s3""",
    // q176: first-touch / last-touch purchase attribution over 30-min
    // sessions; a purchase opening its session credits 'direct'
    "q176_attribution" ->
      """WITH o AS (SELECT user_id, event_id, ts, event_type,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_ts
           FROM events),
         s AS (SELECT user_id, event_id, ts, event_type,
             CAST(sum(CASE WHEN prev_ts IS NULL
                 OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000
               THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS session_id
           FROM o),
         st AS (SELECT user_id, session_id, event_type,
             row_number() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts, event_id) AS step,
             lag(event_type) OVER (PARTITION BY user_id, session_id
                                   ORDER BY ts, event_id) AS prev_type,
             first_value(event_type) OVER (PARTITION BY user_id, session_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_first
           FROM s),
         c AS (SELECT
             CASE WHEN step = 1 THEN 'direct' ELSE sess_first END
               AS first_touch,
             coalesce(prev_type, 'direct') AS last_touch
           FROM st WHERE event_type = 'purchase'),
         ft AS (SELECT first_touch AS touch_type,
                  CAST(count(*) AS BIGINT) AS n_first FROM c GROUP BY 1),
         lt AS (SELECT last_touch AS touch_type,
                  CAST(count(*) AS BIGINT) AS n_last FROM c GROUP BY 1)
         SELECT touch_type, coalesce(n_first, 0) AS n_first,
           coalesce(n_last, 0) AS n_last
         FROM ft FULL JOIN lt USING (touch_type)""",
    // q177: CUPED — integer cross-moment theta, n-scaled adjusted means
    "q177_cuped" ->
      """WITH u AS (
           SELECT user_id,
             CAST(sum(CASE WHEN epoch_ms(ts) < 1705363200000
               THEN 1 ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN epoch_ms(ts) >= 1705363200000
               THEN 1 ELSE 0 END) AS BIGINT) AS y,
             CAST(user_id % 2 AS BIGINT) AS arm
           FROM events GROUP BY 1),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
           FROM u),
         t AS (SELECT n, sx,
                 ((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx)
                   AS theta_ppm
               FROM m)
         SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
           CAST(min(theta_ppm) AS BIGINT) AS theta_ppm,
           (CAST(sum(y) AS BIGINT) * 1000000) // count(*) AS mean_y_ppm,
           CAST(sum(n * y * 1000000 - theta_ppm * (n * x - sx)) AS BIGINT)
             // (CAST(min(n) AS BIGINT) * count(*)) AS mean_y_adj_ppm
         FROM u, t GROUP BY 1""",
    // q178: sorted-neighborhood blocking — global rank over the
    // normalization key, w=3 windowed pairs, exact trigram-Jaccard
    // verify at 0.4 (the oracle's single global window is the
    // semantic twin of the engine's two-phase segmented rank)
    "q178_sorted_nbhd" ->
      """WITH r AS (SELECT doc_id,
             CAST(row_number() OVER (
               ORDER BY substr(replace(lower(text), ' ', ''), 1, 24),
                 doc_id) AS BIGINT) AS rn
           FROM documents),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents),
         sh AS (SELECT DISTINCT a.doc_id,
             a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
           FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                      JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
         card AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                  FROM sh GROUP BY 1),
         cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(b.rn - a.rn AS BIGINT) AS gap
           FROM r a JOIN r b ON b.rn BETWEEN a.rn + 1 AND a.rn + 3),
         shared AS (SELECT c.doc_a, c.doc_b, c.gap,
             CAST(count(*) AS BIGINT) AS n_shared
           FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
                       JOIN sh sb ON sb.doc_id = c.doc_b
                                 AND sb.shingle = sa.shingle
           GROUP BY 1, 2, 3)
         SELECT s.doc_a, s.doc_b, s.gap, s.n_shared,
           (s.n_shared * 1000000) // (ca.n + cb.n - s.n_shared) AS jac_ppm
         FROM shared s JOIN card ca ON ca.doc_id = s.doc_a
                       JOIN card cb ON cb.doc_id = s.doc_b
         WHERE (s.n_shared * 1000000) // (ca.n + cb.n - s.n_shared)
           >= 400000""",
    // q179: per-type first-vs-second-half KS with exact integer D,
    // asymptotic p in ppb, then Benjamini-Hochberg step-up at alpha=.05
    "q179_fdr_drift" ->
      """WITH g AS (SELECT event_type,
             CAST(floor(value * 1000 + 1.0/3) AS BIGINT) AS vq,
             CAST(sum(CASE WHEN epoch_ms(ts) < 1705363200000
               THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN epoch_ms(ts) >= 1705363200000
               THEN 1 ELSE 0 END) AS BIGINT) AS cb
           FROM events GROUP BY 1, 2),
         c AS (SELECT event_type, vq,
             CAST(sum(ca) OVER (PARTITION BY event_type ORDER BY vq
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_a,
             CAST(sum(cb) OVER (PARTITION BY event_type ORDER BY vq
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_b,
             CAST(sum(ca) OVER (PARTITION BY event_type) AS BIGINT) AS n_a,
             CAST(sum(cb) OVER (PARTITION BY event_type) AS BIGINT) AS n_b
           FROM g),
         d AS (SELECT event_type, n_a, n_b,
             max(abs(cum_a * n_b - cum_b * n_a)) AS d_num
           FROM c WHERE n_a > 0 AND n_b > 0 GROUP BY 1, 2, 3),
         p AS (SELECT event_type, n_a, n_b,
             (d_num * 1000000) // (n_a * n_b) AS d_ppm,
             CAST(floor(least(1.0, 2.0 * exp(-2.0
               * CAST(d_num AS DOUBLE) * CAST(d_num AS DOUBLE)
               / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                 * CAST(n_a + n_b AS DOUBLE))))
               * 1000000000 + 1.0/3) AS BIGINT) AS p_ppb
           FROM d),
         r AS (SELECT *, CAST(count(*) OVER () AS BIGINT) AS m,
             CAST(row_number() OVER (ORDER BY p_ppb, event_type)
               AS BIGINT) AS rk
           FROM p),
         k AS (SELECT *, max(CASE WHEN p_ppb * m <= rk * 50000000
                 THEN rk ELSE 0 END) OVER () AS k_star
               FROM r)
         SELECT event_type, n_a, n_b, d_ppm, p_ppb, rk,
           CAST(CASE WHEN rk <= k_star THEN 1 ELSE 0 END AS BIGINT)
             AS discovery
         FROM k""",
    // q180: alpha=1/2 depth-24 EWMA hourly forecast; dyadic weights
    // keep every float op exact, so the milli floor is bit-identical
    "q180_ewma_forecast" ->
      """WITH cells AS (SELECT event_type, epoch_ms(ts) // 3600000 AS h,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         b AS (SELECT min(h) AS lo, max(h) AS hi FROM cells),
         hours AS (SELECT unnest(range(lo, hi + 1)) AS h FROM b),
         types AS (SELECT DISTINCT event_type FROM cells),
         grid AS (SELECT t.event_type, hh.h, coalesce(c.x, 0) AS x
           FROM types t CROSS JOIN hours hh
           LEFT JOIN cells c ON c.event_type = t.event_type
             AND c.h = hh.h),
         lo2 AS (SELECT event_type, min(h) AS lo FROM grid GROUP BY 1),
         conv AS (SELECT t.event_type, t.h, t.x,
             CAST(floor(sum(power(0.5, t.h - s.h) * s.x) * 1000)
               AS BIGINT) AS forecast_milli
           FROM grid t JOIN grid s ON s.event_type = t.event_type
             AND s.h BETWEEN t.h - 24 AND t.h - 1
           GROUP BY 1, 2, 3)
         SELECT c.event_type, CAST(count(*) AS BIGINT) AS n_scored,
           CAST(sum(abs(forecast_milli - x * 1000)) AS BIGINT)
             AS sum_abs_err,
           CAST(sum(abs(forecast_milli - x * 1000)) AS BIGINT)
             // count(*) AS mae_milli
         FROM conv c JOIN lo2 USING (event_type)
         WHERE c.h >= lo2.lo + 24
         GROUP BY 1""",
    // q181: lag 1..6 ACF of the dense hourly grid; integer moments,
    // one float sqrt/divide quantized at ppm
    "q181_acf_hourly" ->
      """WITH cells AS (SELECT event_type, epoch_ms(ts) // 3600000 AS h,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         b AS (SELECT min(h) AS lo, max(h) AS hi FROM cells),
         hours AS (SELECT unnest(range(lo, hi + 1)) AS h FROM b),
         types AS (SELECT DISTINCT event_type FROM cells),
         grid AS (SELECT t.event_type, hh.h, coalesce(c.x, 0) AS x
           FROM types t CROSS JOIN hours hh
           LEFT JOIN cells c ON c.event_type = t.event_type
             AND c.h = hh.h),
         l AS (SELECT unnest(range(1, 7)) AS lag_k),
         m AS (SELECT a.event_type, CAST(l.lag_k AS BIGINT) AS lag_k,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a.x) AS BIGINT) AS sx,
             CAST(sum(bb.x) AS BIGINT) AS sy,
             CAST(sum(a.x * bb.x) AS BIGINT) AS sxy,
             CAST(sum(a.x * a.x) AS BIGINT) AS sxx,
             CAST(sum(bb.x * bb.x) AS BIGINT) AS syy
           FROM grid a CROSS JOIN l
           JOIN grid bb ON bb.event_type = a.event_type
             AND bb.h = a.h - l.lag_k
           GROUP BY 1, 2)
         SELECT event_type, lag_k, n, n * sxy - sx * sy AS num,
           CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
               * CAST(n * syy - sy * sy AS DOUBLE))
             * 1000000 + 1.0/3) AS BIGINT) AS r_ppm
         FROM m
         WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0""",
    // q182: pairwise JS divergence; per-term ln quantized at 1e4, the
    // single-source tail is the closed-form (n - m) * floor(ln2 * 1e4)
    "q182_js_divergence" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         stc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS n
                 FROM t GROUP BY 1, 2),
         tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS nt
                 FROM stc GROUP BY 1),
         sh AS (SELECT a.source AS src_a, b.source AS src_b,
             ta.nt AS n_a, tb.nt AS n_b, a.n AS n_at, b.n AS n_bt
           FROM stc a JOIN stc b ON a.tok = b.tok AND a.source < b.source
           JOIN tot ta ON ta.source = a.source
           JOIN tot tb ON tb.source = b.source),
         agg AS (SELECT src_a, src_b, n_a, n_b,
             CAST(sum(n_at * CAST(floor(
               ln(CAST(2 * n_at * n_b AS DOUBLE)
                 / CAST(n_at * n_b + n_bt * n_a AS DOUBLE)) * 10000
               + 1.0/3) AS BIGINT)) AS BIGINT) AS sh_a_q,
             CAST(sum(n_bt * CAST(floor(
               ln(CAST(2 * n_bt * n_a AS DOUBLE)
                 / CAST(n_at * n_b + n_bt * n_a AS DOUBLE)) * 10000
               + 1.0/3) AS BIGINT)) AS BIGINT) AS sh_b_q,
             CAST(sum(n_at) AS BIGINT) AS m_a,
             CAST(sum(n_bt) AS BIGINT) AS m_b
           FROM sh GROUP BY 1, 2, 3, 4),
         j AS (SELECT src_a, src_b, n_a, n_b,
             sh_a_q + (n_a - m_a)
               * CAST(floor(ln(2) * 10000 + 1.0/3) AS BIGINT) AS js_a_q,
             sh_b_q + (n_b - m_b)
               * CAST(floor(ln(2) * 10000 + 1.0/3) AS BIGINT) AS js_b_q
           FROM agg)
         SELECT src_a, src_b, n_a, n_b, js_a_q, js_b_q,
           ((js_a_q * n_b + js_b_q * n_a) * 50) // (n_a * n_b) AS js_ppm
         FROM j""",
    // q183: JL projection audit — integer-exact: milli-quantized
    // inputs, +/-1 md5-sign matrix, squared-distance ratio in ppm
    "q183_jl_audit" ->
      """WITH x AS (SELECT vec_id, i.i AS i,
             CAST(floor(CAST(embedding[i.i + 1] AS DOUBLE) * 1000
               + 1.0/3) AS BIGINT) AS xq
           FROM embeddings CROSS JOIN range(64) i(i)
           WHERE vec_id < 50),
         planes AS (SELECT j.j AS j, i.i AS i,
             CASE WHEN substr(md5('jl' || CAST(j.j AS VARCHAR) || ':'
               || CAST(i.i AS VARCHAR)), 1, 1) >= '8'
               THEN 1 ELSE -1 END AS sgn
           FROM range(16) j(j) CROSS JOIN range(64) i(i)),
         proj AS (SELECT x.vec_id, p.j,
             CAST(sum(p.sgn * x.xq) AS BIGINT) AS pj
           FROM x JOIN planes p ON p.i = x.i GROUP BY 1, 2),
         dproj AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(sum((a.pj - b.pj) * (a.pj - b.pj)) AS BIGINT)
               AS d2_proj_num
           FROM proj a JOIN proj b ON a.j = b.j AND a.vec_id < b.vec_id
           GROUP BY 1, 2),
         dorig AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(sum((a.xq - b.xq) * (a.xq - b.xq)) AS BIGINT)
               AS d2_orig_q
           FROM x a JOIN x b ON a.i = b.i AND a.vec_id < b.vec_id
           GROUP BY 1, 2)
         SELECT d.vec_a, d.vec_b, o.d2_orig_q, d.d2_proj_num,
           (d.d2_proj_num * 1000000) // (16 * o.d2_orig_q)
             AS distortion_ppm
         FROM dproj d JOIN dorig o USING (vec_a, vec_b)
         WHERE o.d2_orig_q > 0""",
    // q184: 3-round integer-renormalized HITS on the distinct
    // customer->supplier purchase edges; top-10 per role
    "q184_hits" ->
      """WITH edges AS (SELECT DISTINCT o.o_custkey AS cust,
             l.l_suppkey AS supp
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         h0 AS (SELECT DISTINCT cust, CAST(1000000 AS BIGINT) AS h
                FROM edges),
         a1r AS (SELECT supp, CAST(sum(h) AS BIGINT) AS a
                 FROM edges JOIN h0 USING (cust) GROUP BY 1),
         a1 AS (SELECT supp, (a * 1000000) // (SELECT max(a) FROM a1r)
                  AS a FROM a1r),
         h1r AS (SELECT cust, CAST(sum(a) AS BIGINT) AS h
                 FROM edges JOIN a1 USING (supp) GROUP BY 1),
         h1 AS (SELECT cust, (h * 1000000) // (SELECT max(h) FROM h1r)
                  AS h FROM h1r),
         a2r AS (SELECT supp, CAST(sum(h) AS BIGINT) AS a
                 FROM edges JOIN h1 USING (cust) GROUP BY 1),
         a2 AS (SELECT supp, (a * 1000000) // (SELECT max(a) FROM a2r)
                  AS a FROM a2r),
         h2r AS (SELECT cust, CAST(sum(a) AS BIGINT) AS h
                 FROM edges JOIN a2 USING (supp) GROUP BY 1),
         h2 AS (SELECT cust, (h * 1000000) // (SELECT max(h) FROM h2r)
                  AS h FROM h2r),
         a3r AS (SELECT supp, CAST(sum(h) AS BIGINT) AS a
                 FROM edges JOIN h2 USING (cust) GROUP BY 1),
         a3 AS (SELECT supp, (a * 1000000) // (SELECT max(a) FROM a3r)
                  AS a FROM a3r),
         h3r AS (SELECT cust, CAST(sum(a) AS BIGINT) AS h
                 FROM edges JOIN a3 USING (supp) GROUP BY 1),
         h3 AS (SELECT cust, (h * 1000000) // (SELECT max(h) FROM h3r)
                  AS h FROM h3r),
         ta AS (SELECT 'authority' AS role, supp AS node_id, a AS score
                FROM a3 ORDER BY a DESC, supp LIMIT 10),
         th AS (SELECT 'hub' AS role, cust AS node_id, h AS score
                FROM h3 ORDER BY h DESC, cust LIMIT 10)
         SELECT * FROM ta UNION ALL SELECT * FROM th""",
    // q185: difference-in-differences on floored ppm cell means;
    // arm = user parity, period split at the stream midpoint
    "q185_did" ->
      """WITH cells AS (SELECT CAST(user_id % 2 AS BIGINT) AS arm,
             CASE WHEN epoch_ms(ts) < 1705363200000
               THEN 'pre' ELSE 'post' END AS period,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(value * 1000 + 1.0/3) AS BIGINT))
               AS BIGINT) AS s
           FROM events GROUP BY 1, 2),
         m AS (SELECT arm, period, n, (s * 1000) // n AS mean_ppm
               FROM cells),
         w AS (SELECT
             CAST(sum(CASE WHEN arm = 0 AND period = 'pre' THEN n END)
               AS BIGINT) AS n_a_pre,
             CAST(sum(CASE WHEN arm = 0 AND period = 'post' THEN n END)
               AS BIGINT) AS n_a_post,
             CAST(sum(CASE WHEN arm = 1 AND period = 'pre' THEN n END)
               AS BIGINT) AS n_b_pre,
             CAST(sum(CASE WHEN arm = 1 AND period = 'post' THEN n END)
               AS BIGINT) AS n_b_post,
             CAST(sum(CASE WHEN arm = 0 AND period = 'pre'
               THEN mean_ppm END) AS BIGINT) AS mean_a_pre_ppm,
             CAST(sum(CASE WHEN arm = 0 AND period = 'post'
               THEN mean_ppm END) AS BIGINT) AS mean_a_post_ppm,
             CAST(sum(CASE WHEN arm = 1 AND period = 'pre'
               THEN mean_ppm END) AS BIGINT) AS mean_b_pre_ppm,
             CAST(sum(CASE WHEN arm = 1 AND period = 'post'
               THEN mean_ppm END) AS BIGINT) AS mean_b_post_ppm
           FROM m)
         SELECT *, (mean_b_post_ppm - mean_b_pre_ppm)
           - (mean_a_post_ppm - mean_a_pre_ppm) AS did_ppm
         FROM w""",
    // q186: Krippendorff's alpha over ABSTAINING label functions;
    // (m-1) | 6 keeps the coincidence mass in exact longs
    "q186_kripp_alpha" ->
      """WITH lf AS (SELECT doc_id,
             CASE WHEN length(text) >= 300 THEN 1
                  WHEN length(text) < 150 THEN 0 END AS lf_len,
             CASE WHEN (length(text) - length(regexp_replace(text,
                 ' the ', '', 'g'))) / 5 >= 3 THEN 1
               WHEN (length(text) - length(regexp_replace(text,
                 ' the ', '', 'g'))) / 5 = 0 THEN 0 END AS lf_stop,
             CASE WHEN (length(text) - length(regexp_replace(text,
                 '[.!?,;]', '', 'g'))) * 20 >= length(text) THEN 1
               WHEN (length(text) - length(regexp_replace(text,
                 '[.!?,;]', '', 'g'))) * 50 <= length(text) THEN 0
               END AS lf_punct,
             CASE WHEN (length(text) - length(regexp_replace(text,
                 '[0-9]', '', 'g'))) * 50 <= length(text) THEN 1
               WHEN (length(text) - length(regexp_replace(text,
                 '[0-9]', '', 'g'))) * 10 >= length(text) THEN 0
               END AS lf_digit
           FROM documents),
         per AS (SELECT doc_id,
             CAST((lf_len IS NOT NULL)::INT + (lf_stop IS NOT NULL)::INT
               + (lf_punct IS NOT NULL)::INT + (lf_digit IS NOT NULL)::INT
               AS BIGINT) AS m,
             CAST(coalesce(lf_len, 0) + coalesce(lf_stop, 0)
               + coalesce(lf_punct, 0) + coalesce(lf_digit, 0)
               AS BIGINT) AS n1
           FROM lf),
         per2 AS (SELECT doc_id, m, n1, m - n1 AS n0
                  FROM per WHERE m >= 2),
         agg AS (SELECT CAST(count(*) AS BIGINT) AS n_units,
             CAST(sum(m) AS BIGINT) AS n_ratings,
             CAST(sum(n0) AS BIGINT) AS n0_tot,
             CAST(sum(n1) AS BIGINT) AS n1_tot,
             CAST(sum((6 // (m - 1)) * n0 * n1) AS BIGINT) AS o6
           FROM per2)
         SELECT n_units, n_ratings, n0_tot, n1_tot, o6,
           CASE WHEN n0_tot > 0 AND n1_tot > 0
             THEN 1000000 - (o6 * (n_ratings - 1) * 1000000)
               // (6 * n0_tot * n1_tot)
           END AS alpha_ppm
         FROM agg""",
    // q187: 5-round Gonzalez k-center unrolled; milli-quantized
    // squared distances, maximin argmax with vec_id tie-break
    "q187_kcenter" ->
      """WITH x AS (SELECT vec_id, i.i AS i,
             CAST(floor(CAST(embedding[i.i + 1] AS DOUBLE) * 1000
               + 1.0/3) AS BIGINT) AS xq
           FROM embeddings CROSS JOIN range(64) i(i)),
         d1 AS (SELECT a.vec_id,
             CAST(sum((a.xq - c.xq) * (a.xq - c.xq)) AS BIGINT) AS md
           FROM x a JOIN x c ON c.vec_id = 0 AND c.i = a.i GROUP BY 1),
         p2 AS (SELECT vec_id, md FROM d1 WHERE vec_id <> 0
                ORDER BY md DESC, vec_id LIMIT 1),
         d2 AS (SELECT a.vec_id, least(CAST(max(d1.md) AS BIGINT),
             CAST(sum((a.xq - c.xq) * (a.xq - c.xq)) AS BIGINT)) AS md
           FROM x a JOIN x c ON c.vec_id = (SELECT vec_id FROM p2)
             AND c.i = a.i
           JOIN d1 ON d1.vec_id = a.vec_id
           GROUP BY a.vec_id),
         p3 AS (SELECT vec_id, md FROM d2
                WHERE vec_id <> 0 AND vec_id <> (SELECT vec_id FROM p2)
                ORDER BY md DESC, vec_id LIMIT 1),
         d3 AS (SELECT a.vec_id, least(CAST(max(d2.md) AS BIGINT),
             CAST(sum((a.xq - c.xq) * (a.xq - c.xq)) AS BIGINT)) AS md
           FROM x a JOIN x c ON c.vec_id = (SELECT vec_id FROM p3)
             AND c.i = a.i
           JOIN d2 ON d2.vec_id = a.vec_id
           GROUP BY a.vec_id),
         p4 AS (SELECT vec_id, md FROM d3
                WHERE vec_id <> 0 AND vec_id <> (SELECT vec_id FROM p2)
                  AND vec_id <> (SELECT vec_id FROM p3)
                ORDER BY md DESC, vec_id LIMIT 1),
         d4 AS (SELECT a.vec_id, least(CAST(max(d3.md) AS BIGINT),
             CAST(sum((a.xq - c.xq) * (a.xq - c.xq)) AS BIGINT)) AS md
           FROM x a JOIN x c ON c.vec_id = (SELECT vec_id FROM p4)
             AND c.i = a.i
           JOIN d3 ON d3.vec_id = a.vec_id
           GROUP BY a.vec_id),
         p5 AS (SELECT vec_id, md FROM d4
                WHERE vec_id <> 0 AND vec_id <> (SELECT vec_id FROM p2)
                  AND vec_id <> (SELECT vec_id FROM p3)
                  AND vec_id <> (SELECT vec_id FROM p4)
                ORDER BY md DESC, vec_id LIMIT 1)
         SELECT CAST(1 AS BIGINT) AS pick, CAST(0 AS BIGINT) AS vec_id,
           CAST(-1 AS BIGINT) AS radius2_q
         UNION ALL SELECT CAST(2 AS BIGINT), vec_id, md FROM p2
         UNION ALL SELECT CAST(3 AS BIGINT), vec_id, md FROM p3
         UNION ALL SELECT CAST(4 AS BIGINT), vec_id, md FROM p4
         UNION ALL SELECT CAST(5 AS BIGINT), vec_id, md FROM p5""",
    // q188: stratified ATE over event_type strata; __all__ row carries
    // the n_s-weighted treatment effect
    "q188_strat_ate" ->
      """WITH cells AS (SELECT event_type,
             CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n0,
             CAST(sum(CASE WHEN user_id % 2 = 0
               THEN CAST(floor(value * 1000 + 1.0/3) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS s0,
             CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n1,
             CAST(sum(CASE WHEN user_id % 2 = 1
               THEN CAST(floor(value * 1000 + 1.0/3) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS s1
           FROM events GROUP BY 1),
         strata AS (SELECT event_type AS stratum, n0 + n1 AS n_s,
             n0, n1, s0, s1,
             (s0 * 1000) // n0 AS mean0_ppm,
             (s1 * 1000) // n1 AS mean1_ppm,
             (s1 * 1000) // n1 - (s0 * 1000) // n0 AS diff_ppm
           FROM cells WHERE n0 > 0 AND n1 > 0),
         overall AS (SELECT '__all__' AS stratum,
             CAST(sum(n_s) AS BIGINT) AS n_s,
             CAST(sum(n0) AS BIGINT) AS n0, CAST(sum(n1) AS BIGINT) AS n1,
             (CAST(sum(s0) AS BIGINT) * 1000) // CAST(sum(n0) AS BIGINT)
               AS mean0_ppm,
             (CAST(sum(s1) AS BIGINT) * 1000) // CAST(sum(n1) AS BIGINT)
               AS mean1_ppm,
             CAST(sum(n_s * diff_ppm) AS BIGINT)
               // CAST(sum(n_s) AS BIGINT) AS diff_ppm
           FROM strata)
         SELECT stratum, n_s, n0, n1, mean0_ppm, mean1_ppm, diff_ppm
         FROM strata
         UNION ALL
         SELECT stratum, n_s, n0, n1, mean0_ppm, mean1_ppm, diff_ppm
         FROM overall""",
    // q189: 100-rep permutation test on per-user counts; md5-derived
    // re-randomization, floored ppm diffs, add-one p in milli
    "q189_perm_test" ->
      """WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS y,
             CAST(user_id % 2 AS BIGINT) AS arm
           FROM events GROUP BY 1),
         obs AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST((sum(CASE WHEN arm = 1 THEN y ELSE 0 END) * 1000000)
               // sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
             - (sum(CASE WHEN arm = 0 THEN y ELSE 0 END) * 1000000)
               // sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS diff_obs_ppm
           FROM u),
         reps AS (SELECT s.b,
             CAST((sum(CASE WHEN parm = 1 THEN y ELSE 0 END) * 1000000)
               // sum(CASE WHEN parm = 1 THEN 1 ELSE 0 END)
             - (sum(CASE WHEN parm = 0 THEN y ELSE 0 END) * 1000000)
               // sum(CASE WHEN parm = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS diff_ppm
           FROM (SELECT u.user_id, u.y, b.b,
               CAST('0x' || substr(md5('perm' || CAST(b.b AS VARCHAR)
                 || ':' || CAST(u.user_id AS VARCHAR)), 1, 8) AS BIGINT)
                 % 2 AS parm
             FROM u CROSS JOIN range(100) b(b)) s
           GROUP BY s.b)
         SELECT max(o.n_users) AS n_users,
           max(o.diff_obs_ppm) AS diff_obs_ppm,
           CAST(count(*) AS BIGINT) AS n_reps,
           CAST(sum(CASE WHEN abs(r.diff_ppm) >= abs(o.diff_obs_ppm)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
           ((CAST(sum(CASE WHEN abs(r.diff_ppm) >= abs(o.diff_obs_ppm)
             THEN 1 ELSE 0 END) AS BIGINT) + 1) * 1000)
             // (CAST(count(*) AS BIGINT) + 1) AS p_milli
         FROM reps r CROSS JOIN obs o""",
    // q190: split-leakage audit — q48's exact split, per-test-doc
    // fraction of shingles present anywhere in train; >= 50% reported
    "q190_split_leakage" ->
      """WITH s AS (SELECT doc_id,
             CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val'
               ELSE 'test' END AS split
           FROM (SELECT doc_id,
               CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                 1, 8) AS BIGINT) / 4294967296.0 AS u
             FROM documents)),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents),
         sh AS (SELECT DISTINCT a.doc_id,
             a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
           FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                      JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
         trainsh AS (SELECT DISTINCT shingle
           FROM sh JOIN s USING (doc_id) WHERE s.split = 'train'),
         test AS (SELECT sh.doc_id, sh.shingle
           FROM sh JOIN s USING (doc_id) WHERE s.split = 'test'),
         per AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_sh,
             CAST(sum(CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_shared
           FROM test t LEFT JOIN trainsh tr ON tr.shingle = t.shingle
           GROUP BY 1)
         SELECT doc_id, n_sh, n_shared,
           (n_shared * 1000000) // n_sh AS overlap_ppm
         FROM per WHERE (n_shared * 1000000) // n_sh >= 500000""",
    // q191: tie-corrected Mann-Whitney U from the (type, vq, arm)
    // count grid; 2U exact longs, z at milli
    "q191_mann_whitney" ->
      """WITH g AS (SELECT event_type,
             CAST(floor(value * 1000 + 1.0/3) AS BIGINT) AS vq,
             CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS c0,
             CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS c1
           FROM events GROUP BY 1, 2),
         c AS (SELECT event_type, vq, c0, c1,
             CAST(coalesce(sum(c0) OVER (PARTITION BY event_type
               ORDER BY vq ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS cum0
           FROM g),
         m AS (SELECT event_type,
             CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c1 * (2 * cum0 + c0)) AS BIGINT) AS u2,
             CAST(sum((c0 + c1) * (c0 + c1) * (c0 + c1) - (c0 + c1))
               AS BIGINT) AS tie3
           FROM c GROUP BY 1),
         v AS (SELECT *, n0 + n1 AS n,
             CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)
               * (CAST(n0 + n1 + 1 AS DOUBLE)
                 - CAST(tie3 AS DOUBLE) / (CAST(n0 + n1 AS DOUBLE)
                   * CAST(n0 + n1 - 1 AS DOUBLE))) / 3.0 AS var4
           FROM m WHERE n0 > 0 AND n1 > 0)
         SELECT event_type, n0, n1, u2, tie3,
           CAST(floor(CAST(u2 - n0 * n1 AS DOUBLE) / sqrt(var4) * 1000
             + 1.0/3) AS BIGINT) AS z_milli
         FROM v WHERE var4 > 0""",
    // q192: value-group deciles of the length ranker, cumulative
    // capture + integer lift vs base rate
    "q192_decile_lift" ->
      """WITH g AS (SELECT n_chars, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
               AS BIGINT) AS rel
           FROM documents GROUP BY 1),
         a AS (SELECT *,
             CAST(coalesce(sum(cnt) OVER (ORDER BY n_chars DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_gt,
             CAST(sum(cnt) OVER () AS BIGINT) AS n_tot,
             CAST(sum(rel) OVER () AS BIGINT) AS r_tot
           FROM g),
         d AS (SELECT (cum_gt * 10) // n_tot + 1 AS decile,
             CAST(sum(cnt) AS BIGINT) AS n_docs,
             CAST(sum(rel) AS BIGINT) AS n_rel,
             CAST(max(n_tot) AS BIGINT) AS n_tot,
             CAST(max(r_tot) AS BIGINT) AS r_tot
           FROM a GROUP BY 1),
         c AS (SELECT *,
             CAST(sum(n_docs) OVER (ORDER BY decile
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_docs,
             CAST(sum(n_rel) OVER (ORDER BY decile
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rel
           FROM d)
         SELECT decile, n_docs, n_rel, cum_docs, cum_rel,
           (cum_rel * n_tot * 1000000) // (cum_docs * r_tot) AS lift_ppm
         FROM c WHERE r_tot > 0""",
    // q193: leakage-free point-in-time features — trailing-7d features
    // and forward-7d label resolved in one conditional aggregation
    "q193_pit_features" ->
      """WITH c(cutoff_ms) AS (VALUES (1704931200000), (1705363200000),
           (1705795200000), (1706227200000)),
         e AS (SELECT user_id, epoch_ms(ts) AS tms, event_type
               FROM events),
         j AS (SELECT c.cutoff_ms, e.user_id, e.tms, e.event_type,
             e.tms < c.cutoff_ms AS is_trail
           FROM e CROSS JOIN c
           WHERE e.tms >= c.cutoff_ms - 604800000
             AND e.tms < c.cutoff_ms + 604800000)
         SELECT CAST(cutoff_ms AS BIGINT) AS cutoff_ms, user_id,
           CAST(sum(CASE WHEN is_trail THEN 1 ELSE 0 END) AS BIGINT)
             AS n_7d,
           CAST(sum(CASE WHEN is_trail AND event_type = 'purchase'
             THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_7d,
           CAST(count(DISTINCT CASE WHEN is_trail THEN event_type END)
             AS BIGINT) AS n_types_7d,
           CAST(max(CASE WHEN NOT is_trail THEN 1 ELSE 0 END) AS BIGINT)
             AS label_next_7d
         FROM j GROUP BY 1, 2""",
    // q194: hash-deterministic PROPOSAL negative sampling — each
    // customer draws 16 md5 catalog positions, rejects owned ones,
    // keeps the first 2 survivors in draw order
    "q194_neg_sampling" ->
      """WITH inter AS (SELECT DISTINCT o.o_custkey AS custkey,
             l.l_suppkey AS suppkey
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         pos AS (SELECT custkey, CAST(count(*) AS BIGINT) AS n_pos
                 FROM inter GROUP BY 1),
         mx AS (SELECT min(s_suppkey) AS minsk, max(s_suppkey) AS maxsk
                FROM supplier),
         prop AS (SELECT p.custkey, p.n_pos,
             CAST('0x' || substr(md5('negp:' || CAST(p.custkey AS VARCHAR)
               || ':' || CAST(g.i AS VARCHAR)), 1, 8) AS BIGINT) AS draw
           FROM pos p CROSS JOIN
             (SELECT CAST(x AS BIGINT) AS i
              FROM generate_series(0, 15) t(x)) g),
         cand AS (SELECT pr.custkey, pr.n_pos, pr.draw,
             (pr.draw % (mx.maxsk - mx.minsk + 1)) + mx.minsk AS cand_sk
           FROM prop pr CROSS JOIN mx),
         keep AS (SELECT c.custkey, c.n_pos, c.cand_sk, c.draw
           FROM cand c JOIN supplier s ON s.s_suppkey = c.cand_sk
           WHERE NOT EXISTS (SELECT 1 FROM inter i
             WHERE i.custkey = c.custkey AND i.suppkey = c.cand_sk)),
         ded AS (SELECT custkey, n_pos, cand_sk, min(draw) AS draw
           FROM keep GROUP BY 1, 2, 3),
         r AS (SELECT *, CAST(row_number() OVER (PARTITION BY custkey
               ORDER BY draw, cand_sk) AS BIGINT) AS rk
             FROM ded)
         SELECT custkey, n_pos, cand_sk AS neg_suppkey, rk, draw
         FROM r WHERE rk <= 2""",
    // q195: Wilson lower bound at z=1.96; identical float expression
    // order in both engines, ppm-quantized with the +1/3 offset
    "q195_wilson_bound" ->
      """WITH g AS (SELECT l_suppkey AS suppkey,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS s
           FROM lineitem GROUP BY 1)
         SELECT suppkey, n, s, (s * 1000000) // n AS rate_ppm,
           CAST(floor(
             ((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
               + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE)))
              - 1.96 * sqrt(
                  (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    * (1.0 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    / CAST(n AS DOUBLE)
                  + (1.96 * 1.96)
                    / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
             / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE))
             * 1000000 + 1.0/3) AS BIGINT) AS wilson_ppm
         FROM g""",
    // q196: held-out MRR@10 of the popularity recommender with the
    // user-filtered-rank protocol; reciprocals as 1e6 div rank
    "q196_mrr_eval" ->
      """WITH inter AS (SELECT DISTINCT o.o_custkey AS custkey,
             l.l_suppkey AS suppkey
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         tag AS (SELECT custkey, suppkey,
             (CAST('0x' || substr(md5('mrr:' || CAST(custkey AS VARCHAR)
               || ':' || CAST(suppkey AS VARCHAR)), 1, 8) AS BIGINT)
               % 5) = 0 AS held
           FROM inter),
         train AS (SELECT custkey, suppkey FROM tag WHERE NOT held),
         pop AS (SELECT suppkey, CAST(count(*) AS BIGINT) AS pop
                 FROM train GROUP BY 1),
         ranked AS (SELECT suppkey, CAST(row_number() OVER (
               ORDER BY pop DESC, suppkey) AS BIGINT) AS r
             FROM pop),
         heldp AS (SELECT t.custkey, t.suppkey, rk.r
           FROM tag t JOIN ranked rk USING (suppkey) WHERE t.held),
         fr AS (SELECT h.custkey, h.suppkey, h.r,
             h.r - CAST(sum(CASE WHEN tr.rt IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS rank_f
           FROM heldp h LEFT JOIN (SELECT t.custkey, r2.r AS rt
               FROM train t JOIN ranked r2 USING (suppkey)) tr
             ON tr.custkey = h.custkey AND tr.rt < h.r
           GROUP BY 1, 2, 3)
         SELECT CAST(count(*) AS BIGINT) AS n_heldout,
           CAST(sum(CASE WHEN rank_f <= 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS hit10,
           (CAST(sum(CASE WHEN rank_f <= 10 THEN 1 ELSE 0 END)
             AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT)
             AS hit10_ppm,
           CAST(sum(1000000 // rank_f) AS BIGINT)
             // CAST(count(*) AS BIGINT) AS mrr_ppm
         FROM fr""",
    // q197: RFM quintile segmentation; value-group quintiles on each
    // dimension's bounded grid, 5 = best, per-order floored spend
    "q197_rfm_segments" ->
      """WITH hz AS (SELECT CAST(max(epoch_ms(o_orderdate)) AS BIGINT)
             AS h FROM orders),
         rfm AS (SELECT o_custkey AS custkey,
             (hz.h - CAST(max(epoch_ms(o_orderdate)) AS BIGINT))
               // 86400000 AS r,
             CAST(count(*) AS BIGINT) AS f,
             CAST(sum(CAST(floor(o_totalprice + 1.0/3) AS BIGINT))
               AS BIGINT) AS m
           FROM orders, hz GROUP BY o_custkey, hz.h),
         rq AS (SELECT r,
             5 - (CAST(coalesce(sum(cnt) OVER (ORDER BY r ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) * 5) // CAST(sum(cnt) OVER () AS BIGINT) AS r_q
           FROM (SELECT r, CAST(count(*) AS BIGINT) AS cnt
                 FROM rfm GROUP BY 1)),
         fq AS (SELECT f,
             5 - (CAST(coalesce(sum(cnt) OVER (ORDER BY f DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) * 5) // CAST(sum(cnt) OVER () AS BIGINT) AS f_q
           FROM (SELECT f, CAST(count(*) AS BIGINT) AS cnt
                 FROM rfm GROUP BY 1)),
         mq AS (SELECT m,
             5 - (CAST(coalesce(sum(cnt) OVER (ORDER BY m DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) * 5) // CAST(sum(cnt) OVER () AS BIGINT) AS m_q
           FROM (SELECT m, CAST(count(*) AS BIGINT) AS cnt
                 FROM rfm GROUP BY 1))
         SELECT (r_q * 100 + f_q * 10 + m_q) AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(m) AS BIGINT) AS total_m,
           CAST(sum(m) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_m
         FROM rfm JOIN rq USING (r) JOIN fq USING (f) JOIN mq USING (m)
         GROUP BY 1""",
    // q198: Welch coherence click<->purchase over 16h segments;
    // integer detrend (scale cancels in the ratio), milli-quantized
    "q198_coherence" ->
      """WITH cellsAll AS (SELECT event_type, epoch_ms(ts) // 3600000
             AS h, CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         b AS (SELECT min(h) AS lo, max(h) AS hi FROM cellsAll),
         hours AS (SELECT unnest(range(lo, hi + 1)) AS h FROM b),
         types AS (SELECT unnest(['click', 'purchase']) AS event_type),
         grid AS (SELECT t.event_type, hh.h, coalesce(c.x, 0) AS x
           FROM types t CROSS JOIN hours hh
           LEFT JOIN cellsAll c ON c.event_type = t.event_type
             AND c.h = hh.h),
         seg AS (SELECT event_type,
             (h - (SELECT lo FROM b)) // 16 AS seg,
             (h - (SELECT lo FROM b)) % 16 AS j, x
           FROM grid),
         st AS (SELECT event_type, seg, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx
           FROM seg GROUP BY 1, 2),
         xd AS (SELECT s.event_type, s.seg, s.j, 16 * s.x - st.sx AS xd
           FROM seg s JOIN st ON st.event_type = s.event_type
             AND st.seg = s.seg AND st.n = 16),
         spec AS (SELECT event_type, seg, k.k,
             sum(xd * cos(2 * pi() * k.k * j / 16)) AS re,
             sum(xd * sin(2 * pi() * k.k * j / 16)) AS im
           FROM xd CROSS JOIN range(1, 9) k(k) GROUP BY 1, 2, 3),
         ab AS (SELECT a.seg, a.k, a.re AS re_a, a.im AS im_a,
             bb.re AS re_b, bb.im AS im_b
           FROM spec a JOIN spec bb ON bb.seg = a.seg AND bb.k = a.k
             AND a.event_type = 'click'
             AND bb.event_type = 'purchase'),
         agg AS (SELECT k, CAST(count(*) AS BIGINT) AS n_segments,
             sum(re_a * re_b + im_a * im_b) AS pab_re,
             sum(im_a * re_b - re_a * im_b) AS pab_im,
             sum(re_a * re_a + im_a * im_a) AS paa,
             sum(re_b * re_b + im_b * im_b) AS pbb
           FROM ab GROUP BY 1)
         SELECT CAST(k AS BIGINT) AS k, n_segments,
           CAST(floor((pab_re * pab_re + pab_im * pab_im) / (paa * pbb)
             * 1000 + 1.0/3) AS BIGINT) AS gamma2_milli,
           CAST(floor(atan2(pab_im, pab_re) * 1000 + 1.0/3) AS BIGINT)
             AS phase_milli
         FROM agg WHERE paa > 0 AND pbb > 0""",
    // q199: O'Brien-Fleming group-sequential boundaries at 4 looks;
    // pooled-variance z from exact moments, milli-quantized
    "q199_sequential_ab" ->
      """WITH l(look, cutoff_ms, boundary_milli) AS (VALUES
           (1, 1704931200000, 4049), (2, 1705363200000, 2863),
           (3, 1705795200000, 2337), (4, 1706227200000, 2024)),
         e AS (SELECT user_id, epoch_ms(ts) AS tms,
             CAST(floor(value * 1000 + 1.0/3) AS BIGINT) AS vq
           FROM events),
         cells AS (SELECT l.look, l.boundary_milli,
             CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n0,
             CAST(sum(CASE WHEN user_id % 2 = 0 THEN vq ELSE 0 END)
               AS BIGINT) AS s0,
             CAST(sum(CASE WHEN user_id % 2 = 0 THEN vq * vq ELSE 0 END)
               AS BIGINT) AS q0,
             CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n1,
             CAST(sum(CASE WHEN user_id % 2 = 1 THEN vq ELSE 0 END)
               AS BIGINT) AS s1,
             CAST(sum(CASE WHEN user_id % 2 = 1 THEN vq * vq ELSE 0 END)
               AS BIGINT) AS q1
           FROM e CROSS JOIN l WHERE e.tms < l.cutoff_ms
           GROUP BY 1, 2),
         z AS (SELECT look, n0, n1, boundary_milli,
             CAST(floor(
               (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                 - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
               / sqrt(((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE)
                   * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                 + (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)
                   * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)))
                 / CAST(n0 + n1 - 2 AS DOUBLE)
                 * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
               * 1000 + 1.0/3) AS BIGINT) AS z_milli
           FROM cells WHERE n0 > 1 AND n1 > 1)
         SELECT CAST(look AS BIGINT) AS look, n0, n1, z_milli,
           CAST(boundary_milli AS BIGINT) AS boundary_milli,
           CAST(CASE WHEN abs(z_milli) >= boundary_milli
             THEN 1 ELSE 0 END AS BIGINT) AS crossed
         FROM z""",
    // q200: Markov next-event top-1 accuracy; trained strictly on
    // first-half transitions, scored strictly on second-half ones
    "q200_markov_eval" ->
      """WITH o AS (SELECT user_id, event_type,
             lead(event_type) OVER w AS nxt,
             lead(epoch_ms(ts)) OVER w AS nxt_tms,
             epoch_ms(ts) AS tms
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         bi AS (SELECT event_type AS cur, nxt, tms, nxt_tms
                FROM o WHERE nxt IS NOT NULL),
         trans AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS c
           FROM bi WHERE nxt_tms < 1705363200000 GROUP BY 1, 2),
         pred AS (SELECT cur, nxt AS predicted FROM (
             SELECT cur, nxt, row_number() OVER (PARTITION BY cur
               ORDER BY c DESC, nxt) AS rk
             FROM trans) WHERE rk = 1)
         SELECT b.cur, p.predicted, CAST(count(*) AS BIGINT) AS n_eval,
           CAST(sum(CASE WHEN b.nxt = p.predicted THEN 1 ELSE 0 END)
             AS BIGINT) AS n_correct,
           (CAST(sum(CASE WHEN b.nxt = p.predicted THEN 1 ELSE 0 END)
             AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT) AS acc_ppm
         FROM bi b JOIN pred p USING (cur)
         WHERE b.tms >= 1705363200000
         GROUP BY 1, 2""",
    // q201: 64-bit aHash over blob chunks; 4x16-bit band blocking
    // (perceptual bits are content-correlated — wide bands or bust),
    // hamming <= 3 verify — all integer
    "q201_blob_phash" ->
      """WITH sig0 AS (SELECT doc_id, text FROM documents
           WHERE length(text) >= 64),
         bits AS (SELECT doc_id, b.i AS i,
             substring(text, (length(text) * b.i) // 64 + 1,
               (length(text) * (b.i + 1)) // 64
                 - (length(text) * b.i) // 64) AS ch
           FROM sig0 CROSS JOIN range(64) b(i)),
         sigt AS (SELECT doc_id,
             CAST(sum(CASE WHEN i < 32 AND length(ch) > 0
                 AND 2 * (length(ch)
                   - length(translate(ch, 'nopqrstuvwxyz', '')))
                 >= length(ch)
               THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT)
               AS sig_lo,
             CAST(sum(CASE WHEN i >= 32 AND length(ch) > 0
                 AND 2 * (length(ch)
                   - length(translate(ch, 'nopqrstuvwxyz', '')))
                 >= length(ch)
               THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END)
               AS BIGINT) AS sig_hi
           FROM bits GROUP BY 1),
         cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.sig_lo AS lo_a, a.sig_hi AS hi_a,
             b.sig_lo AS lo_b, b.sig_hi AS hi_b
           FROM sigt a CROSS JOIN range(4) j(j)
           JOIN sigt b ON a.doc_id < b.doc_id
             AND ((CASE WHEN j.j < 2 THEN a.sig_lo ELSE a.sig_hi END
                 >> (16 * (j.j % 2))) & 65535)
               = ((CASE WHEN j.j < 2 THEN b.sig_lo ELSE b.sig_hi END
                 >> (16 * (j.j % 2))) & 65535))
         SELECT DISTINCT doc_a, doc_b, lo_a, hi_a, lo_b, hi_b,
           CAST(bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b))
             AS BIGINT) AS hamming
         FROM cand
         WHERE bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b))
           <= 12""",
    // q202: item-item CF cosine neighbors from the co-purchase counts;
    // the sqrt is the only float, ppm-quantized. Hot-customer cap:
    // customers with >64 distinct suppliers are excluded from pair
    // generation (frequent-rater cut; degrees stay full) — must match
    // Graph.ItemCfDegCap.
    "q202_item_cf" ->
      """WITH inter AS (SELECT DISTINCT o.o_custkey AS custkey,
             l.l_suppkey AS suppkey
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         deg AS (SELECT suppkey, CAST(count(*) AS BIGINT) AS d
                 FROM inter GROUP BY 1),
         keep AS (SELECT custkey FROM inter
                  GROUP BY 1 HAVING count(*) <= 64),
         capped AS (SELECT i.custkey, i.suppkey
                    FROM inter i JOIN keep USING (custkey)),
         co AS (SELECT a.suppkey AS s_a, b.suppkey AS s_b,
             CAST(count(*) AS BIGINT) AS c_ab
           FROM capped a JOIN capped b ON a.custkey = b.custkey
             AND a.suppkey < b.suppkey
           GROUP BY 1, 2),
         sims AS (SELECT co.s_a, co.s_b, co.c_ab,
             CAST(floor(CAST(co.c_ab AS DOUBLE)
               / sqrt(CAST(da.d AS DOUBLE) * CAST(db.d AS DOUBLE))
               * 1000000 + 1.0/3) AS BIGINT) AS sim_ppm
           FROM co JOIN deg da ON da.suppkey = co.s_a
                   JOIN deg db ON db.suppkey = co.s_b),
         directed AS (SELECT s_a AS item, s_b AS neighbor, sim_ppm, c_ab
             FROM sims
           UNION ALL
           SELECT s_b, s_a, sim_ppm, c_ab FROM sims),
         r AS (SELECT *, CAST(row_number() OVER (PARTITION BY item
               ORDER BY sim_ppm DESC, neighbor) AS BIGINT) AS rk
             FROM directed)
         SELECT item, rk, neighbor, c_ab, sim_ppm FROM r WHERE rk <= 3""",
    // q203: exponential MLE + KS goodness-of-fit on whole-second
    // inter-event gaps; one float pipeline, milli-quantized
    "q203_exp_gof" ->
      """WITH o AS (SELECT event_type, user_id, epoch_ms(ts) AS tms,
             lag(epoch_ms(ts)) OVER (PARTITION BY event_type, user_id
               ORDER BY ts, event_id) AS prev
           FROM events),
         gaps AS (SELECT event_type, (tms - prev) // 1000 AS g
                  FROM o WHERE prev IS NOT NULL),
         grid AS (SELECT event_type, g, CAST(count(*) AS BIGINT) AS c
                  FROM gaps GROUP BY 1, 2),
         cdf AS (SELECT event_type, g,
             CAST(sum(c) OVER (PARTITION BY event_type ORDER BY g
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             CAST(sum(g * c) OVER (PARTITION BY event_type) AS BIGINT)
               AS sum_g
           FROM grid),
         d AS (SELECT event_type, n, sum_g,
             max(abs(CAST(cum AS DOUBLE) / CAST(n AS DOUBLE)
               - (1.0 - exp(-1.0 * CAST(n AS DOUBLE)
                 / CAST(sum_g AS DOUBLE) * CAST(g + 1 AS DOUBLE)))))
               AS dmax
           FROM cdf WHERE sum_g > 0 GROUP BY 1, 2, 3)
         SELECT event_type, n, (n * 3600000) // sum_g
             AS lambda_per_hour_milli,
           CAST(floor(dmax * 1000 + 1.0/3) AS BIGINT) AS ks_d_milli
         FROM d""",
    // q204: DoReMi-lite mixture weights from per-source excess
    // surprisal; one exp per source, quantized before normalization
    "q204_mixture_weights" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_t
                   FROM t GROUP BY 1),
         tot AS (SELECT CAST(sum(n_t) AS BIGINT) AS n_total FROM vocab),
         ps AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(CAST(floor(ln(CAST(n_total AS DOUBLE) / n_t)
               * 10000 + 1.0/3) AS BIGINT)) AS BIGINT) AS surp_q
           FROM t JOIN vocab USING (tok), tot GROUP BY 1),
         c AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS n_all,
             CAST(sum(surp_q) AS BIGINT) AS surp_all FROM ps),
         s AS (SELECT source, n_tokens, surp_q,
             CAST(floor(exp((CAST(surp_q AS DOUBLE)
                 / CAST(n_tokens AS DOUBLE)
               - CAST(surp_all AS DOUBLE) / CAST(n_all AS DOUBLE))
               / 10000.0) * 1000000 + 1.0/3) AS BIGINT) AS score_q
           FROM ps, c),
         nrm AS (SELECT CAST(sum(score_q) AS BIGINT) AS score_sum FROM s)
         SELECT source, n_tokens, surp_q // n_tokens AS mean_surprisal_q,
           score_q, (score_q * 1000000) // score_sum AS weight_ppm
         FROM s, nrm""",
    // q205: fill histogram of q49's packs (6.25% buckets: bucket =
    // (n_toks*16) div 2048 capped at 16, 17 possible values 0..16;
    // straddle overflow folded into bucket 16)
    "q205_pack_efficiency" ->
      """WITH d AS (
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)),
               1, 8) AS BIGINT) % 8 AS shard
           FROM documents),
         s AS (
           SELECT doc_id, shard, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) - n_tokens AS start_tok
           FROM d),
         packs AS (SELECT shard, start_tok // 2048 AS pack_id,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS n_toks
           FROM s GROUP BY 1, 2)
         SELECT least((n_toks * 16) // 2048, 16) AS bucket,
           CAST(count(*) AS BIGINT) AS n_packs,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           (CAST(sum(n_toks) AS BIGINT) * 1000000)
             // (CAST(count(*) AS BIGINT) * 2048) AS mean_fill_ppm
         FROM packs GROUP BY 1""",
    // q206: uncertainty sampling — 20 docs with the smallest per-token
    // |margin| from the q95 hash classifier
    "q206_active_select" ->
      """WITH m AS (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(sum((CAST('0x' || substr(md5(tok.tok), 1, 8) AS BIGINT)
               % 201) - 100) AS BIGINT) AS margin
           FROM documents,
             unnest(string_split(text, ' ')) AS tok(tok)
           GROUP BY doc_id, text),
         u AS (SELECT doc_id, n_tokens, margin,
             (abs(margin) * 1000000) // n_tokens AS uncertainty_ppm
           FROM m WHERE n_tokens > 0)
         SELECT doc_id, n_tokens, margin, uncertainty_ppm
         FROM u ORDER BY uncertainty_ppm ASC, doc_id ASC LIMIT 20""",
    // q207: k-anonymity audit over (lang, source, length-decile) QI
    // classes; k=5 risk line, value-group deciles, all integer
    "q207_k_anonymity" ->
      """WITH g AS (SELECT n_chars, CAST(count(*) AS BIGINT) AS cnt
           FROM documents GROUP BY 1),
         a AS (SELECT n_chars,
             CAST(coalesce(sum(cnt) OVER (ORDER BY n_chars DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_gt,
             CAST(sum(cnt) OVER () AS BIGINT) AS n_tot
           FROM g),
         dec AS (SELECT n_chars, (cum_gt * 10) // n_tot + 1 AS decile
                 FROM a),
         classes AS (SELECT d.lang, d.source, dec.decile,
             CAST(count(*) AS BIGINT) AS class_size
           FROM documents d JOIN dec USING (n_chars)
           GROUP BY 1, 2, 3),
         b AS (SELECT CASE WHEN class_size = 1 THEN '1_unique'
               WHEN class_size < 5 THEN '2_to_4'
               WHEN class_size < 10 THEN '5_to_9'
               WHEN class_size < 50 THEN '10_to_49'
               ELSE '50_plus' END AS bucket,
             CAST(count(*) AS BIGINT) AS n_classes,
             CAST(sum(class_size) AS BIGINT) AS n_records,
             CAST(sum(CASE WHEN class_size < 5 THEN class_size
               ELSE 0 END) AS BIGINT) AS n_at_risk
           FROM classes GROUP BY 1)
         SELECT bucket, n_classes, n_records,
           (n_at_risk * 1000000)
             // CAST(sum(n_records) OVER () AS BIGINT) AS risk_ppm
         FROM b""",
    // q208: snapshot diff by id + content hash; v2 simulated
    // deterministically (drop %17, retext %13, reid %19)
    "q208_corpus_diff" ->
      """WITH v1 AS (SELECT doc_id, source, md5(text) AS h
           FROM documents),
         -- the retext CASE tests the ORIGINAL doc_id (old_id), never
         -- the %19-remapped one; the inner subquery makes that explicit
         v2 AS (SELECT
             CASE WHEN old_id % 19 = 0
               THEN old_id + 1000000 ELSE old_id END AS doc_id,
             source,
             CASE WHEN old_id % 13 = 0 THEN md5(text || ' v2')
               ELSE md5(text) END AS h
           FROM (SELECT doc_id AS old_id, source, text FROM documents
                 WHERE doc_id % 17 <> 0)),
         j AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             coalesce(a.source, b.source) AS source,
             a.h AS h_a, b.h AS h_b
           FROM v1 a FULL JOIN v2 b ON a.doc_id = b.doc_id)
         SELECT source,
           CASE WHEN h_a IS NULL THEN 'added'
             WHEN h_b IS NULL THEN 'removed'
             WHEN h_a = h_b THEN 'unchanged'
             ELSE 'changed' END AS status,
           CAST(count(*) AS BIGINT) AS n_docs
         FROM j GROUP BY 1, 2""",
    // q209: DSIR importance selection — hashed unigram buckets (B=256),
    // +1 smoothing both sides, one quantized ln per bucket (exact-long
    // products inside the quotient), order-free long doc weights,
    // deterministic top-50
    "q209_dsir_select" ->
      """WITH tok AS (SELECT doc_id, source = 'src0' AS is_t,
             CAST('0x' || substr(md5('dsir:' || t.tok), 1, 8) AS BIGINT)
               % 256 AS bucket
           FROM documents, unnest(string_split(text, ' ')) t(tok)),
         counts AS (SELECT bucket,
             CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
             CAST(sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS cr
           FROM tok GROUP BY 1),
         totals AS (SELECT CAST(sum(ct) AS BIGINT) AS nt,
             CAST(sum(cr) AS BIGINT) AS nr FROM counts),
         lam AS (SELECT bucket,
             CAST(floor(ln(CAST((ct + 1) * (nr + 256) AS DOUBLE)
               / CAST((cr + 1) * (nt + 256) AS DOUBLE)) * 10000
               + 1.0/3) AS BIGINT) AS lam_q
           FROM counts CROSS JOIN totals),
         perdoc AS (SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_toks,
             CAST(sum(l.lam_q) AS BIGINT) AS w_q
           FROM tok t JOIN lam l ON t.bucket = l.bucket
           WHERE NOT t.is_t GROUP BY 1)
         SELECT CAST(row_number() OVER (ORDER BY w_q DESC, doc_id)
             AS BIGINT) AS rk, doc_id, n_toks, w_q
         FROM perdoc ORDER BY w_q DESC, doc_id LIMIT 50""",
    // q210: ordered drop rules, first-fail attribution + independent
    // fire counts + funnel survivors; all integer thresholds
    "q210_filter_funnel" ->
      """WITH f AS (SELECT
             len(string_split(text, ' ')) < 20 AS f1,
             lang <> 'en' AS f2,
             (length(replace(text, ' ', '')) * 100)
               // len(string_split(text, ' ')) < 420
               OR (length(replace(text, ' ', '')) * 100)
               // len(string_split(text, ' ')) > 480 AS f3,
             ((len(string_split(text, ' '))
               - len(list_distinct(string_split(text, ' ')))) * 100)
               // len(string_split(text, ' ')) >= 60 AS f4
           FROM documents),
         one AS (SELECT CAST(count(*) AS BIGINT) AS total,
             CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS a1,
             CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS a2,
             CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS a3,
             CAST(sum(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT) AS a4,
             CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN NOT f1 AND f2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
             CAST(sum(CASE WHEN NOT f1 AND NOT f2 AND f3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
             CAST(sum(CASE WHEN NOT f1 AND NOT f2 AND NOT f3 AND f4 THEN 1 ELSE 0 END) AS BIGINT) AS c4
           FROM f)
         SELECT '1_too_short' AS stage, c1 AS n_first_fail, a1 AS n_any_fail,
             total - c1 AS survivors_after FROM one
         UNION ALL SELECT '2_non_english', c2, a2, total - c1 - c2 FROM one
         UNION ALL SELECT '3_word_len', c3, a3, total - c1 - c2 - c3 FROM one
         UNION ALL SELECT '4_repetition', c4, a4,
             total - c1 - c2 - c3 - c4 FROM one
         UNION ALL SELECT '5_kept', total - c1 - c2 - c3 - c4,
             CAST(0 AS BIGINT), total - c1 - c2 - c3 - c4 FROM one""",
    // q211: q28's near-dup pair graph resolved to sources, census'd per
    // unordered source pair (least/greatest canonicalization)
    "q211_dup_source_matrix" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
         bits AS (
           SELECT doc_id, j.j,
                  sum(tf * CASE WHEN substr(md5(tok), j.j + 1, 1) >= '8'
                           THEN 1 ELSE -1 END) AS s
           FROM tf, range(32) j(j) GROUP BY 1, 2),
         sh AS (
           SELECT doc_id,
                  CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
                    AS simhash
           FROM bits GROUP BY 1),
         banded AS (SELECT doc_id, simhash, b.band,
                           (simhash // (1::BIGINT << (b.band * 8))) % 256 AS byte
                    FROM sh, range(4) b(band)),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sh_a,
                         b.doc_id AS doc_b, b.simhash AS sh_b
                  FROM banded a JOIN banded b
                    ON a.band = b.band AND a.byte = b.byte AND a.doc_id < b.doc_id),
         p AS (SELECT doc_a, doc_b FROM cand
               WHERE bit_count(xor(sh_a, sh_b)) <= 1)
         SELECT least(da.source, db.source) AS source_a,
             greatest(da.source, db.source) AS source_b,
             CAST(count(*) AS BIGINT) AS n_pairs
         FROM p JOIN documents da ON p.doc_a = da.doc_id
                JOIN documents db ON p.doc_b = db.doc_id
         GROUP BY 1, 2""",
    // q212: per-L overflow docs + tokens lost to truncation, ppm of
    // corpus token mass; one conditional aggregation, 4-row report
    "q212_truncation_waste" ->
      """WITH d AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
           FROM documents),
         one AS (SELECT CAST(sum(n) AS BIGINT) AS total_toks,
             CAST(sum(CASE WHEN n > 16 THEN 1 ELSE 0 END) AS BIGINT) AS o16,
             CAST(sum(CASE WHEN n > 16 THEN n - 16 ELSE 0 END) AS BIGINT) AS l16,
             CAST(sum(CASE WHEN n > 32 THEN 1 ELSE 0 END) AS BIGINT) AS o32,
             CAST(sum(CASE WHEN n > 32 THEN n - 32 ELSE 0 END) AS BIGINT) AS l32,
             CAST(sum(CASE WHEN n > 64 THEN 1 ELSE 0 END) AS BIGINT) AS o64,
             CAST(sum(CASE WHEN n > 64 THEN n - 64 ELSE 0 END) AS BIGINT) AS l64,
             CAST(sum(CASE WHEN n > 96 THEN 1 ELSE 0 END) AS BIGINT) AS o96,
             CAST(sum(CASE WHEN n > 96 THEN n - 96 ELSE 0 END) AS BIGINT) AS l96
           FROM d)
         SELECT CAST(16 AS BIGINT) AS max_len, o16 AS n_docs_over,
             l16 AS tokens_lost, (l16 * 1000000) // total_toks AS lost_ppm
           FROM one
         UNION ALL SELECT 32, o32, l32, (l32 * 1000000) // total_toks FROM one
         UNION ALL SELECT 64, o64, l64, (l64 * 1000000) // total_toks FROM one
         UNION ALL SELECT 96, o96, l96, (l96 * 1000000) // total_toks FROM one""",
    // q213: q25's pair machinery at the permissive t=0.5 floor, bucketed
    // by exact integer Jaccard decile with cumulative at-or-above counts
    "q213_threshold_sweep" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                  generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents),
         sh AS (
           SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
           FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                      JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
         card AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
         shared AS (
           SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS n_shared
           FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
                       JOIN sh sb ON sb.doc_id = c.doc_b AND sa.shingle = sb.shingle
           GROUP BY 1, 2),
         pairs AS (
           SELECT s.n_shared, ca.n AS n_a, cb.n AS n_b
           FROM shared s JOIN card ca ON ca.doc_id = s.doc_a
                         JOIN card cb ON cb.doc_id = s.doc_b
           WHERE s.n_shared / (ca.n + cb.n - s.n_shared) >= 0.5),
         dec AS (SELECT (n_shared * 10) // (n_a + n_b - n_shared) AS decile,
             CAST(count(*) AS BIGINT) AS n_pairs
           FROM pairs GROUP BY 1)
         SELECT decile, n_pairs,
             CAST(sum(n_pairs) OVER (ORDER BY decile DESC) AS BIGINT)
               AS n_at_or_above
         FROM dec""",
    // q214: gaps-and-islands on [ts, ts + 60*floor(value*1000) ms)
    // spans; running-max merge is tie-order-free
    "q214_interval_union" ->
      """WITH iv AS (
           SELECT user_id, epoch_ms(ts) AS s,
               epoch_ms(ts) + CAST(floor(value * 1000) AS BIGINT) * 60 AS e
           FROM events),
         fl AS (
           SELECT user_id, s, e,
             CASE WHEN coalesce(max(e) OVER (PARTITION BY user_id
                   ORDER BY s ASC, e ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                 >= s THEN 0 ELSE 1 END AS new_isl
           FROM iv),
         isl AS (
           SELECT user_id, s, e,
             sum(new_isl) OVER (PARTITION BY user_id ORDER BY s ASC, e ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
           FROM fl),
         grp AS (SELECT user_id, isl, min(s) AS i_start, max(e) AS i_end
                 FROM isl GROUP BY 1, 2)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
             CAST(sum(i_end - i_start) AS BIGINT) AS covered_ms,
             CAST(max(i_end - i_start) AS BIGINT) AS max_island_ms
         FROM grp GROUP BY user_id""",
    // q215: closed-form waterfill; saturation test is prefix-monotone
    // on the cap-ascending order
    "q215_unimax_alloc" ->
      """WITH lt AS (
           SELECT lang,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_toks
           FROM documents GROUP BY 1),
         caps AS (SELECT lang, n_toks, (n_toks * 6) // 5 AS cap FROM lt),
         tot AS (SELECT CAST(sum(n_toks) AS BIGINT) AS b,
                     CAST(count(*) AS BIGINT) AS nl FROM caps),
         rk AS (SELECT lang, n_toks, cap, b, nl,
             CAST(row_number() OVER (ORDER BY cap ASC, lang ASC)
               AS BIGINT) AS i,
             CAST(sum(cap) OVER (ORDER BY cap ASC, lang ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS c
           FROM caps, tot),
         st AS (SELECT *, CASE WHEN cap * (nl - i) <= b - c
                 THEN 1 ELSE 0 END AS sat FROM rk),
         kk AS (SELECT max(CASE WHEN sat = 1 THEN i ELSE 0 END) AS k,
                    max(CASE WHEN sat = 1 THEN c ELSE 0 END) AS ck
                FROM st)
         SELECT lang, n_toks, cap AS cap_toks,
             CAST(sat AS BIGINT) AS saturated,
             CAST(CASE WHEN sat = 1 THEN cap
               ELSE (b - ck) // (nl - k) END AS BIGINT) AS alloc_toks,
             (CAST(CASE WHEN sat = 1 THEN cap
               ELSE (b - ck) // (nl - k) END AS BIGINT) * 1000000)
               // n_toks AS epochs_ppm
         FROM st, kk""",
    // q216: q207's exact decile grid; sensitive value = leading token
    "q216_l_diversity" ->
      """WITH g AS (SELECT n_chars, CAST(count(*) AS BIGINT) AS cnt
           FROM documents GROUP BY 1),
         a AS (SELECT n_chars,
             CAST(coalesce(sum(cnt) OVER (ORDER BY n_chars DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_gt,
             CAST(sum(cnt) OVER () AS BIGINT) AS n_tot
           FROM g),
         dec AS (SELECT n_chars, (cum_gt * 10) // n_tot + 1 AS decile
                 FROM a),
         cls AS (SELECT d.lang, d.source, dec.decile,
             CAST(count(DISTINCT string_split(d.text, ' ')[1])
               AS BIGINT) AS l,
             CAST(count(*) AS BIGINT) AS class_size
           FROM documents d JOIN dec USING (n_chars)
           GROUP BY 1, 2, 3),
         h AS (SELECT l, CAST(count(*) AS BIGINT) AS n_classes,
             CAST(sum(class_size) AS BIGINT) AS n_records
           FROM cls GROUP BY 1)
         SELECT l, n_classes, n_records,
             (n_records * 1000000)
               // CAST(sum(n_records) OVER () AS BIGINT) AS mass_ppm
         FROM h""",
    // q217: adjacent-pair source agreement in salted-hash order vs the
    // exchangeability expectation (n_s-1)/(N-1)
    "q217_order_bias" ->
      """WITH k AS (SELECT doc_id, source,
             md5('ob' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
         ord AS (SELECT source,
             lead(source) OVER (ORDER BY h ASC, doc_id ASC) AS nxt
           FROM k),
         p AS (SELECT source, CAST(count(*) AS BIGINT) AS n_prev,
             CAST(sum(CASE WHEN source = nxt THEN 1 ELSE 0 END)
               AS BIGINT) AS n_same
           FROM ord WHERE nxt IS NOT NULL GROUP BY 1),
         c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
               FROM documents GROUP BY 1),
         t AS (SELECT CAST(sum(n_s) AS BIGINT) AS n FROM c)
         SELECT p.source, c.n_s, p.n_prev, p.n_same,
             (p.n_same * 1000000) // p.n_prev AS same_ppm,
             ((c.n_s - 1) * 1000000) // (t.n - 1) AS exp_ppm
         FROM p JOIN c ON p.source = c.source, t""",
    // q218: Pareto skyline on (n_chars, type-token-ratio); dominance =
    // >= on both dims with > on one, equal points tie and both survive
    "q218_skyline" ->
      """WITH p AS (
           SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               * 1000000 // len(string_split(text, ' ')) AS ttr_ppm
           FROM documents)
         SELECT doc_id, n_chars, ttr_ppm FROM p a
         WHERE NOT EXISTS (
           SELECT 1 FROM p b
           WHERE b.n_chars >= a.n_chars AND b.ttr_ppm >= a.ttr_ppm
             AND (b.n_chars > a.n_chars OR b.ttr_ppm > a.ttr_ppm))""",
    // q219: Chao1 richness on bigram types per language; N2=0 falls back
    // to the bias-corrected V + N1(N1-1)/2 form
    "q219_chao1" ->
      """WITH tk AS (SELECT lang, string_split(text, ' ') AS toks
                     FROM documents),
         b AS (SELECT lang, toks[i] || ' ' || toks[i+1] AS bg
               FROM tk, UNNEST(range(1, len(toks))) AS r(i)),
         c AS (SELECT lang, bg, CAST(count(*) AS BIGINT) AS c
               FROM b GROUP BY 1, 2),
         a AS (SELECT lang, CAST(count(*) AS BIGINT) AS v,
                 CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                 CAST(sum(c) AS BIGINT) AS n_tokens
               FROM c GROUP BY 1),
         ch AS (SELECT *,
                  CASE WHEN n2 > 0 THEN 1000*v + (1000*n1*n1) // (2*n2)
                       ELSE 1000*v + (1000*n1*(n1-1)) // 2
                  END AS chao1_milli
                FROM a)
         SELECT lang, v, n1, n2, n_tokens, chao1_milli,
           ((chao1_milli - 1000*v) * 1000000) // chao1_milli AS unseen_ppm
         FROM ch""",
    // q220: delete-one-source jackknife of the corpus mean-length
    // statistic; all leave-one-out means floored to milli units
    "q220_jackknife_src" ->
      """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS t_chars
           FROM documents GROUP BY 1),
         t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_all,
             CAST(sum(t_chars) AS BIGINT) AS t_all,
             CAST(count(*) AS BIGINT) AS g FROM s)
         SELECT source, n_docs,
           (1000 * t_all) // n_all AS theta_milli,
           (1000 * (t_all - t_chars)) // (n_all - n_docs) AS theta_loo_milli,
           g * ((1000 * t_all) // n_all)
             - (g - 1) * ((1000 * (t_all - t_chars)) // (n_all - n_docs))
             AS pseudo_milli,
           (1000 * t_all) // n_all
             - (1000 * (t_all - t_chars)) // (n_all - n_docs)
             AS influence_milli
         FROM s, t""",
    // q221: burst episodes = maximal consecutive-hour runs sitting >= 2
    // Poisson sigmas above the type's lower-median hourly rate ((c-med)^2
    // >= 4*med, all-integer); islands via h - row_number
    "q221_burst_episodes" ->
      """WITH h AS (SELECT event_type,
             CAST(epoch_ms(ts) // 3600000 AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         r AS (SELECT *,
             row_number() OVER (PARTITION BY event_type ORDER BY c, h) AS rk,
             count(*) OVER (PARTITION BY event_type) AS nh FROM h),
         m AS (SELECT event_type, c AS med FROM r WHERE rk = (nh + 1) // 2),
         bh AS (SELECT h.event_type, h.h, h.c
                FROM h JOIN m USING (event_type)
                WHERE h.c > m.med
                  AND (h.c - m.med) * (h.c - m.med) >= 4 * m.med),
         i AS (SELECT *, h - row_number() OVER
                 (PARTITION BY event_type ORDER BY h) AS grp FROM bh)
         SELECT event_type, min(h) AS start_h, max(h) AS end_h,
           CAST(count(*) AS BIGINT) AS n_hours, max(c) AS peak_c,
           CAST(sum(c) AS BIGINT) AS total_c
         FROM i GROUP BY event_type, grp""",
    // q222: broken-stick regression around the hourly series' max-|CUSUM|
    // hour (rank restricted to [2, n-2] so both segments have >= 2 points);
    // exact integer fit sums, slope floored to milli via correctly-rounded
    // double division
    "q222_broken_stick" ->
      """WITH h AS (SELECT event_type,
             CAST(epoch_ms(ts) // 3600000 AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         s AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS tot,
                 CAST(count(*) AS BIGINT) AS n FROM h GROUP BY 1),
         cu AS (SELECT h.event_type, h.h, h.c, n, tot,
             CAST(sum(c) OVER w AS BIGINT) AS pref,
             CAST(row_number() OVER w AS BIGINT) AS k
           FROM h JOIN s USING (event_type)
           WINDOW w AS (PARTITION BY h.event_type ORDER BY h
                        ROWS UNBOUNDED PRECEDING)),
         cp AS (SELECT event_type, h AS cp_h,
             row_number() OVER (PARTITION BY event_type
               ORDER BY abs(n * pref - k * tot) DESC, h) AS rk
           FROM cu WHERE k >= 2 AND k <= n - 2),
         c1 AS (SELECT event_type, cp_h FROM cp WHERE rk = 1),
         seg AS (SELECT h.event_type, c1.cp_h, h.h, h.c,
             CASE WHEN h.h <= cp_h THEN 0 ELSE 1 END AS side
           FROM h JOIN c1 USING (event_type)),
         reb AS (SELECT event_type, cp_h, side, c,
             h - min(h) OVER (PARTITION BY event_type, side) AS x
           FROM seg),
         fit AS (SELECT event_type, cp_h, side,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(c) AS BIGINT) AS sy,
             CAST(sum(x * c) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
           FROM reb GROUP BY 1, 2, 3),
         sl AS (SELECT event_type, cp_h, side, n,
             CAST(floor(1000.0 * (n * sxy - sx * sy)
               / (n * sxx - sx * sx) + 1.0/3) AS BIGINT) AS slope_milli
           FROM fit)
         SELECT event_type, cp_h,
           max(CASE WHEN side = 0 THEN n END) AS n_pre,
           max(CASE WHEN side = 1 THEN n END) AS n_post,
           max(CASE WHEN side = 0 THEN slope_milli END) AS slope_pre_milli,
           max(CASE WHEN side = 1 THEN slope_milli END) AS slope_post_milli,
           max(CASE WHEN side = 1 THEN slope_milli END)
             - max(CASE WHEN side = 0 THEN slope_milli END) AS delta_milli
         FROM sl GROUP BY 1, 2""",
    // q223: pairwise inter-label centroid squared distance; components on
    // the 1e6 grid, exact per-(label,dim) sums, one double division per
    // centroid mean, per-dim terms floor-quantized before the long sum
    "q223_centroid_shift" ->
      """WITH e AS (SELECT CAST(label AS BIGINT) AS label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
           FROM embeddings),
         c AS (SELECT label, generate_subscripts(emb, 1) AS i,
             CAST(floor(unnest(emb) * 1000000 + 1.0/3) AS BIGINT) AS xq
           FROM e),
         s AS (SELECT label, i, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xq) AS BIGINT) AS s
           FROM c GROUP BY 1, 2),
         p AS (SELECT a.label AS label_a, b.label AS label_b,
             a.n AS n_a, b.n AS n_b,
             (CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n) AS dd
           FROM s a JOIN s b ON a.i = b.i AND a.label < b.label)
         SELECT label_a, label_b, n_a, n_b,
           CAST(sum(CAST(floor(dd * dd + 1.0/3) AS BIGINT)) AS BIGINT)
             AS dist2_q
         FROM p GROUP BY 1, 2, 3, 4""",
    // q224: per-dimension variance census; HUGEINT-exact sums cast once
    // to double, one-pass population variance, 5%-of-max dead flag
    "q224_dim_variance" ->
      """WITH e AS (SELECT list_transform(embedding,
             x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
         c AS (SELECT generate_subscripts(emb, 1) - 1 AS i0,
             CAST(floor(unnest(emb) * 1000000 + 1.0/3) AS BIGINT) AS xq
           FROM e),
         s AS (SELECT CAST(i0 AS BIGINT) AS i, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(xq AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(xq AS HUGEINT) * xq) AS DOUBLE) AS sxx
           FROM c GROUP BY 1),
         d AS (SELECT i, n,
             CAST(floor(sx / n + 1.0/3) AS BIGINT) AS mean_micro,
             CAST(floor((sxx - sx * sx / n) / n + 1.0/3) AS BIGINT)
               AS var_micro2
           FROM s),
         m AS (SELECT max(var_micro2) AS max_var FROM d)
         SELECT i, n, mean_micro, var_micro2,
           CAST(CASE WHEN var_micro2 * 20 < max_var THEN 1 ELSE 0 END
             AS BIGINT) AS dead
         FROM d, m""",
    // q225: kNN label purity over q138's banded sign-LSH neighbor graph
    // (identical candidate generation and top-3 ranking)
    "q225_knn_purity" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
           FROM embeddings),
         n AS (SELECT vec_id, label, emb,
                 sqrt(list_reduce(list_transform(emb, x -> x*x),
                   (a,b) -> a+b)) AS nrm
               FROM e),
         proj AS (SELECT vec_id, p.p,
             list_reduce(list_transform(emb, (x, i) ->
               x * CASE WHEN substr(md5(p.p || ':' || i), 1, 1) >= '8'
                   THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END),
               (a, b) -> a + b) AS proj
           FROM n, range(16) p(p)),
         bits AS (SELECT vec_id, p // 4 AS band,
             CAST(sum(CASE WHEN proj > 0
               THEN (1::BIGINT << CAST(p % 4 AS INT)) ELSE 0 END)
               AS BIGINT) AS bits
           FROM proj GROUP BY 1, 2),
         capped AS (SELECT vec_id, band, bits FROM (
             SELECT vec_id, band, bits, row_number() OVER (
               PARTITION BY band, bits ORDER BY
                 CAST('0x' || substr(md5('hub:' || CAST(band AS VARCHAR)
                   || ':' || CAST(bits AS VARCHAR) || ':'
                   || CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT),
                 vec_id) AS crk
             FROM bits) WHERE crk <= 64),
         cand AS (SELECT DISTINCT a.vec_id AS qid, b.vec_id AS nid
           FROM bits a JOIN capped b
             ON a.band = b.band AND a.bits = b.bits
                AND a.vec_id <> b.vec_id),
         scored AS (SELECT c.qid, na.label AS q_label, c.nid,
             nb.label AS n_label,
             list_reduce(list_transform(na.emb, (x,i) -> x * nb.emb[i]),
               (a,b) -> a+b) / (na.nrm * nb.nrm) AS cos
           FROM cand c JOIN n na ON na.vec_id = c.qid
                       JOIN n nb ON nb.vec_id = c.nid),
         topk AS (SELECT qid, q_label, n_label FROM (
             SELECT qid, q_label, n_label, row_number() OVER (
               PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rk
             FROM scored) WHERE rk <= 3)
         SELECT q_label AS label,
           CAST(count(DISTINCT qid) AS BIGINT) AS n_queries,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END)
             AS BIGINT) AS n_agree,
           (CAST(sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END)
             AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT)
             AS purity_ppm
         FROM topk GROUP BY 1""",
    // q226: Hill tail-index of doc length per language, adaptive
    // k = min(10, (n-1) div 2); per-term ln quantized before the sum
    "q226_hill_tail" ->
      """WITH n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
                    FROM documents GROUP BY 1),
         r AS (SELECT lang, CAST(n_chars AS BIGINT) AS x, doc_id,
             CAST(row_number() OVER (PARTITION BY lang
               ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rk
           FROM documents),
         kk AS (SELECT lang, n_docs,
                  least(10, (n_docs - 1) // 2) AS k FROM n),
         thr AS (SELECT r.lang, kk.k, kk.n_docs, r.x AS x_k1
                 FROM r JOIN kk ON r.lang = kk.lang AND r.rk = kk.k + 1),
         t AS (SELECT r.lang, thr.k, thr.n_docs, thr.x_k1,
                 CAST(floor(ln(CAST(r.x AS DOUBLE) / thr.x_k1) * 10000
                   + 1.0/3) AS BIGINT) AS lnq
               FROM r JOIN thr ON r.lang = thr.lang AND r.rk <= thr.k),
         est AS (SELECT lang, max(n_docs) AS n_docs,
           max(x_k1) AS x_k1, CAST(sum(lnq) AS BIGINT) AS hill_sum_q,
           CASE WHEN sum(lnq) > 0
             THEN CAST(floor(CAST(max(k) AS DOUBLE) * 10000000 / sum(lnq)
               + 1.0/3) AS BIGINT)
             ELSE 0 END AS alpha_milli
         FROM t GROUP BY 1)
         SELECT kk.lang, CAST(kk.k AS BIGINT) AS k, kk.n_docs,
           est.x_k1,
           CAST(COALESCE(est.hill_sum_q, 0) AS BIGINT) AS hill_sum_q,
           CAST(COALESCE(est.alpha_milli, 0) AS BIGINT) AS alpha_milli
         FROM kk LEFT JOIN est ON kk.lang = est.lang""",
    // q227: PSM ATT — nearest-score representative-control matching with
    // replacement, +-5 caliper; matching on the bounded distinct-score
    // grid; signed ATT division in double (integer div truncation
    // differs across engines on negatives)
    "q227_psm_att" ->
      """WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS score,
             CAST(sum(CASE WHEN event_type = 'purchase'
               THEN CAST(floor(value * 1000 + 1.0/3) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS y,
             CASE WHEN sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
               END) * 5 > count(*) THEN 1 ELSE 0 END AS treated
           FROM events GROUP BY 1),
         rep AS (SELECT score AS rs, y AS y_c FROM (
             SELECT score, y, row_number() OVER (PARTITION BY score
               ORDER BY user_id DESC) AS rr
             FROM u WHERE treated = 0) WHERE rr = 1),
         grid AS (SELECT DISTINCT score FROM u),
         g AS (SELECT grid.score, rep.rs, rep.y_c
               FROM grid LEFT JOIN rep ON grid.score = rep.rs),
         car AS (SELECT score,
             max_by(rs, rs) OVER wp AS prev_s,
             max_by(y_c, rs) OVER wp AS prev_y,
             min_by(rs, rs) OVER wn AS next_s,
             min_by(y_c, rs) OVER wn AS next_y
           FROM g
           WINDOW wp AS (ORDER BY score ASC ROWS UNBOUNDED PRECEDING),
                  wn AS (ORDER BY score DESC ROWS UNBOUNDED PRECEDING)),
         m AS (SELECT score,
             CASE WHEN prev_s IS NOT NULL AND (next_s IS NULL
                 OR score - prev_s <= next_s - score)
               THEN prev_s ELSE next_s END AS ms,
             CASE WHEN prev_s IS NOT NULL AND (next_s IS NULL
                 OR score - prev_s <= next_s - score)
               THEN prev_y ELSE next_y END AS my
           FROM car),
         j AS (SELECT u.score, u.y, m.my,
             CASE WHEN m.ms IS NOT NULL AND abs(u.score - m.ms) <= 5
               THEN 1 ELSE 0 END AS matched
           FROM u JOIN m ON u.score = m.score WHERE u.treated = 1)
         SELECT score // 10 AS band, CAST(count(*) AS BIGINT) AS n_treated,
           CAST(sum(matched) AS BIGINT) AS n_matched,
           CAST(sum(CASE WHEN matched = 1 THEN y - my ELSE 0 END)
             AS BIGINT) AS sum_diff_milli,
           CASE WHEN sum(matched) > 0
             THEN CAST(floor(CAST(sum(CASE WHEN matched = 1 THEN y - my
               ELSE 0 END) AS DOUBLE) / sum(matched) + 1.0/3) AS BIGINT)
             ELSE 0 END AS att_milli
         FROM j GROUP BY 1""",
    // q228: Self-BLEU diversity over a deterministic hash-drawn k=20
    // sample; distinct-bigram precision, zero-overlap pairs count in the
    // (k-1) mean denominator
    "q228_self_bleu" ->
      """WITH s AS (SELECT doc_id, text FROM documents
           ORDER BY CAST('0x' || substr(md5('sb:' || CAST(doc_id AS VARCHAR)), 1, 8)
             AS BIGINT) ASC, doc_id ASC
           LIMIT 20),
         tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM s),
         bg AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] AS bg
                FROM tk, UNNEST(range(1, len(toks))) r(i)),
         card AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bg
                  FROM bg GROUP BY 1),
         k AS (SELECT CAST(count(*) - 1 AS BIGINT) AS km1 FROM s),
         sh AS (SELECT a.doc_id, b.doc_id AS doc_b,
                  CAST(count(*) AS BIGINT) AS shared
                FROM bg a JOIN bg b
                  ON a.bg = b.bg AND a.doc_id <> b.doc_id GROUP BY 1, 2),
         pp AS (SELECT sh.doc_id, (sh.shared * 1000000) // card.n_bg AS ppm
                FROM sh JOIN card USING (doc_id)),
         agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS pairs_hit,
                   CAST(sum(ppm) AS BIGINT) AS s FROM pp GROUP BY 1)
         SELECT card.doc_id, card.n_bg,
           CAST(COALESCE(agg.pairs_hit, 0) AS BIGINT) AS pairs_hit,
           CAST(COALESCE(agg.s, 0) // k.km1 AS BIGINT) AS mean_overlap_ppm
         FROM card LEFT JOIN agg USING (doc_id), k""",
    // q229: Wasserstein-1 length drift per source vs the corpus; exact
    // cross-multiplied CDFs on the bounded length grid, one normalizing
    // double division floored to milli-chars
    "q229_w1_drift" ->
      """WITH g AS (SELECT source, CAST(n_chars AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
         all_g AS (SELECT x, CAST(sum(c) AS BIGINT) AS ca FROM g GROUP BY 1),
         tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s
                 FROM g GROUP BY 1),
         n AS (SELECT CAST(sum(c) AS BIGINT) AS n_all FROM g),
         grid AS (SELECT t.source, a.x, t.n_s, COALESCE(g.c, 0) AS c, a.ca
                  FROM all_g a CROSS JOIN tot t
                  LEFT JOIN g ON g.source = t.source AND g.x = a.x),
         cum AS (SELECT source, x, n_s,
             CAST(sum(c) OVER w AS BIGINT) AS cum_s,
             CAST(sum(ca) OVER w AS BIGINT) AS cum_a,
             lead(x) OVER (PARTITION BY source ORDER BY x) AS x_next
           FROM grid
           WINDOW w AS (PARTITION BY source ORDER BY x
                        ROWS UNBOUNDED PRECEDING)),
         w1 AS (SELECT source, max(n_s) AS n_s,
             CAST(sum(CASE WHEN x_next IS NULL THEN 0
               ELSE abs(cum_s * (SELECT n_all FROM n) - cum_a * n_s)
                 * (x_next - x) END) AS BIGINT) AS raw
           FROM cum GROUP BY 1)
         SELECT source, n_s,
           CAST(floor(CAST(raw AS DOUBLE) * 1000
             / (n_s * (SELECT n_all FROM n)) + 1.0/3) AS BIGINT) AS w1_milli
         FROM w1""",
    // q232: 4-fold out-of-fold AUC of the token-rate classifier; fold-
    // complement weights = (global - fold) sums, q120's tie-correct AUC
    "q232_cv_auc" ->
      """WITH dt AS (SELECT doc_id,
             CAST('0x' || substr(md5('cv:' || CAST(doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) % 4 AS fold,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             unnest(list_distinct(string_split(text, ' '))) AS tok
           FROM documents),
         ft AS (SELECT fold, tok, CAST(count(*) AS BIGINT) AS cnt,
                  CAST(sum(y) AS BIGINT) AS pos
                FROM dt GROUP BY 1, 2),
         gt AS (SELECT tok, CAST(sum(cnt) AS BIGINT) AS gcnt,
                  CAST(sum(pos) AS BIGINT) AS gpos
                FROM ft GROUP BY 1),
         wts AS (SELECT f.fold, gt.tok,
             ((gpos - COALESCE(ft.pos, 0)) * 1000000)
               // (gcnt - COALESCE(ft.cnt, 0)) AS rate_ppm
           FROM gt CROSS JOIN range(4) f(fold)
           LEFT JOIN ft ON ft.fold = f.fold AND ft.tok = gt.tok
           WHERE gcnt - COALESCE(ft.cnt, 0) > 0),
         sc AS (SELECT dt.doc_id, dt.fold, dt.y,
             CAST(sum(COALESCE(w.rate_ppm, 0)) AS BIGINT) AS score
           FROM dt LEFT JOIN wts w
             ON w.fold = dt.fold AND w.tok = dt.tok
           GROUP BY 1, 2, 3),
         g AS (SELECT fold, score, CAST(sum(y) AS BIGINT) AS p,
                 CAST(sum(1 - y) AS BIGINT) AS q
               FROM sc GROUP BY 1, 2),
         c AS (SELECT *, COALESCE(CAST(sum(q) OVER (PARTITION BY fold
                 ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING) AS BIGINT), 0) AS cq FROM g),
         t AS (SELECT fold, CAST(sum(p) AS BIGINT) AS n_pos,
                 CAST(sum(q) AS BIGINT) AS n_neg,
                 CAST(sum(p*cq*2 + p*q) AS BIGINT) AS num2
               FROM c GROUP BY 1)
         SELECT fold, n_pos, n_neg,
           (num2 * 1000000) // (2 * n_pos * n_neg) AS auc_ppm
         FROM t WHERE n_pos > 0 AND n_neg > 0""",
    // q233: adjusted Rand index of langid vs gold — pair counts over the
    // contingency table, Hubert-Arabie normalizer cross-multiplied in
    // HUGEINT, one double division floored to ppm (signed)
    "q233_ari_langid" ->
      """WITH s AS (
           SELECT lang,
             CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'he ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'nd ', ''))) / 3 AS BIGINT) AS score_en,
             CAST((length(text) - length(replace(text, 'der', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'ein', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'sch', ''))) / 3 AS BIGINT) AS score_de,
             CAST((length(text) - length(replace(text, 'le ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'ent', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'es ', ''))) / 3 AS BIGINT) AS score_fr,
             CAST((length(text) - length(replace(text, 'de ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'la ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'os ', ''))) / 3 AS BIGINT) AS score_es
           FROM documents),
         pr AS (
           SELECT lang AS gold,
             CASE WHEN score_en >= score_de AND score_en >= score_fr
                       AND score_en >= score_es THEN 'en'
                  WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
                  WHEN score_fr >= score_es THEN 'fr'
                  ELSE 'es' END AS predicted
           FROM s),
         cm AS (SELECT gold, predicted, CAST(count(*) AS BIGINT) AS n
                FROM pr GROUP BY 1, 2),
         idx AS (SELECT CAST(sum((n * (n - 1)) // 2) AS BIGINT) AS index_pairs,
                   CAST(sum(n) AS BIGINT) AS n_docs FROM cm),
         ra AS (SELECT CAST(sum((a * (a - 1)) // 2) AS BIGINT) AS sum_a
                FROM (SELECT CAST(sum(n) AS BIGINT) AS a FROM cm GROUP BY gold)),
         cb AS (SELECT CAST(sum((b * (b - 1)) // 2) AS BIGINT) AS sum_b
                FROM (SELECT CAST(sum(n) AS BIGINT) AS b FROM cm GROUP BY predicted)),
         z AS (SELECT n_docs, index_pairs, sum_a, sum_b,
                 (n_docs * (n_docs - 1)) // 2 AS c2n FROM idx, ra, cb),
         f AS (SELECT *,
                 CAST(index_pairs AS HUGEINT) * c2n
                   - CAST(sum_a AS HUGEINT) * sum_b AS numh,
                 CAST(c2n AS HUGEINT) * (sum_a + sum_b)
                   - CAST(sum_a AS HUGEINT) * sum_b * 2 AS denh
               FROM z)
         SELECT n_docs, index_pairs, sum_a, sum_b,
           CASE WHEN CAST(denh AS DOUBLE) > 0
             THEN CAST(floor(CAST(numh AS DOUBLE) * 2 * 1000000
               / CAST(denh AS DOUBLE) + 1.0/3) AS BIGINT)
             ELSE 0 END AS ari_ppm
         FROM f""",
    // q234: train->val/test OOV occurrence rate under the q236 hash split
    "q234_split_oov" ->
      """WITH t AS (SELECT
             CASE WHEN h <= 7 THEN 'train' WHEN h = 8 THEN 'val'
                  ELSE 'test' END AS split, tok
           FROM (SELECT
               CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                 AS BIGINT) % 10 AS h,
               unnest(string_split(text, ' ')) AS tok
             FROM documents)),
         v AS (SELECT DISTINCT tok FROM t WHERE split = 'train'),
         e AS (SELECT t.split, t.tok,
                 CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
               FROM t LEFT JOIN v ON t.tok = v.tok
               WHERE t.split <> 'train'),
         a AS (SELECT split, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(oov) AS BIGINT) AS n_oov,
                 CAST(count(DISTINCT CASE WHEN oov = 1 THEN tok END)
                   AS BIGINT) AS n_oov_types
               FROM e GROUP BY 1)
         SELECT split, n_tokens, n_oov, n_oov_types,
           (n_oov * 1000000) // n_tokens AS oov_ppm
         FROM a""",
    // q236: chi-square independence of lang x hash split; doubles on
    // both engines follow the identical op order so floor agrees
    "q236_split_balance" ->
      """WITH h AS (SELECT lang,
             CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) % 10 AS h
           FROM documents),
         cell AS (SELECT lang,
             CASE WHEN h <= 7 THEN 'train' WHEN h = 8 THEN 'val'
                  ELSE 'test' END AS split,
             CAST(count(*) AS BIGINT) AS o
           FROM h GROUP BY 1, 2),
         m AS (SELECT lang, split, o,
                 CAST(sum(o) OVER (PARTITION BY lang) AS BIGINT) AS n_lang,
                 CAST(sum(o) OVER (PARTITION BY split) AS BIGINT) AS n_split,
                 CAST(sum(o) OVER () AS BIGINT) AS n
               FROM cell),
         d AS (SELECT *, o * n - n_lang * n_split AS dd FROM m),
         e AS (SELECT lang, split, o,
                 CAST(floor(CAST(CAST(n_lang AS HUGEINT) * n_split AS DOUBLE)
                   * 1000 / CAST(n AS DOUBLE)) AS BIGINT) AS exp_milli,
                 CAST(floor(CAST(CAST(dd AS HUGEINT) * dd AS DOUBLE) * 1000000
                   / CAST(CAST(n AS HUGEINT) * n_lang * n_split AS DOUBLE))
                   AS BIGINT) AS contrib_micro
               FROM d)
         SELECT lang, split, o, exp_milli, contrib_micro,
           CAST(sum(contrib_micro) OVER () AS BIGINT) AS chi2_micro
         FROM e""",
    // q237: Spearman rho per lang, average ranks off the value grid
    // (doubled to stay integral), HUGEINT moments, one double sqrt+div
    "q237_spearman" ->
      """WITH d AS (SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS x,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS y
           FROM documents),
         gx AS (SELECT lang, x, CAST(count(*) AS BIGINT) AS c
                FROM d GROUP BY 1, 2),
         rx AS (SELECT lang, x,
             CAST(2 * COALESCE(sum(c) OVER (PARTITION BY lang ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + c + 1 AS BIGINT) AS r_x
           FROM gx),
         gy AS (SELECT lang, y, CAST(count(*) AS BIGINT) AS c
                FROM d GROUP BY 1, 2),
         ry AS (SELECT lang, y,
             CAST(2 * COALESCE(sum(c) OVER (PARTITION BY lang ORDER BY y
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + c + 1 AS BIGINT) AS r_y
           FROM gy),
         t AS (SELECT d.lang, rx.r_x, ry.r_y FROM d
             JOIN rx ON d.lang = rx.lang AND d.x = rx.x
             JOIN ry ON d.lang = ry.lang AND d.y = ry.y),
         a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             sum(CAST(r_x AS HUGEINT)) AS sx,
             sum(CAST(r_y AS HUGEINT)) AS sy,
             sum(CAST(r_x AS HUGEINT) * r_y) AS sxy,
             sum(CAST(r_x AS HUGEINT) * r_x) AS sxx,
             sum(CAST(r_y AS HUGEINT) * r_y) AS syy
           FROM t GROUP BY 1)
         SELECT lang, n_docs, CAST(sxy AS BIGINT) AS sum_rxy,
           CASE WHEN CAST(n_docs * sxx - sx * sx AS DOUBLE) > 0
                 AND CAST(n_docs * syy - sy * sy AS DOUBLE) > 0
             THEN CAST(floor(CAST(n_docs * sxy - sx * sy AS DOUBLE) * 1000
               / sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE)
                 * CAST(n_docs * syy - sy * sy AS DOUBLE)) + 1.0/3)
               AS BIGINT)
             ELSE 0 END AS rho_milli
         FROM a""",
    // q239: top-20 diagonal-Mahalanobis embedding outliers; per-dim
    // terms floor to milli BEFORE the per-vector sum (order-free longs)
    "q239_z_outliers" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding,
             x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
         c AS (SELECT vec_id,
             CAST(generate_subscripts(emb, 1) - 1 AS BIGINT) AS i,
             CAST(floor(unnest(emb) * 1000000 + 1.0/3) AS BIGINT) AS xq
           FROM e),
         s AS (SELECT i, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(xq AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(xq AS HUGEINT) * xq) AS DOUBLE) AS sxx
           FROM c GROUP BY 1),
         d AS (SELECT i,
             CAST(floor(sx / n + 1.0/3) AS BIGINT) AS mean_micro,
             CAST(floor((sxx - sx * sx / n) / n + 1.0/3) AS BIGINT)
               AS var_micro2
           FROM s),
         t AS (SELECT c.vec_id,
             CASE WHEN d.var_micro2 > 0
               THEN CAST(floor(CAST((c.xq - d.mean_micro)
                   * (c.xq - d.mean_micro) AS DOUBLE) * 1000
                 / CAST(d.var_micro2 AS DOUBLE)) AS BIGINT)
               ELSE 0 END AS term_milli
           FROM c JOIN d ON c.i = d.i),
         sc AS (SELECT vec_id, CAST(sum(term_milli) AS BIGINT)
                  AS score_milli FROM t GROUP BY 1),
         r AS (SELECT vec_id, score_milli,
             CAST(row_number() OVER (ORDER BY score_milli DESC, vec_id ASC)
               AS BIGINT) AS rank
           FROM sc)
         SELECT rank, vec_id, score_milli FROM r WHERE rank <= 20""",
    // q240: type-level vocabulary Jaccard between source pairs
    "q240_vocab_overlap" ->
      """WITH ty AS (SELECT DISTINCT source, tok FROM
             (SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM documents)),
         sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n_types
                FROM ty GROUP BY 1),
         pr AS (SELECT a.source AS src_a, b.source AS src_b,
                  CAST(count(*) AS BIGINT) AS n_shared
                FROM ty a JOIN ty b
                  ON a.tok = b.tok AND a.source < b.source
                GROUP BY 1, 2)
         SELECT pr.src_a, pr.src_b, pr.n_shared,
           sa.n_types AS n_a, sb.n_types AS n_b,
           (pr.n_shared * 1000000) // (sa.n_types + sb.n_types - pr.n_shared)
             AS jaccard_ppm
         FROM pr JOIN sz sa ON pr.src_a = sa.source
           JOIN sz sb ON pr.src_b = sb.source""",
    // q241: reliability table + ECE of the token-rate classifier —
    // integer ppm div chains end to end
    "q241_calibration_ece" ->
      """WITH dt AS (SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             unnest(list_distinct(string_split(text, ' '))) AS tok
           FROM documents),
         rate AS (SELECT tok,
             (CAST(sum(y) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT)
               AS rate_ppm
           FROM dt GROUP BY 1),
         sc AS (SELECT dt.doc_id, dt.y,
             CAST(sum(rate.rate_ppm) AS BIGINT) // CAST(count(*) AS BIGINT)
               AS pred_ppm
           FROM dt JOIN rate ON dt.tok = rate.tok
           GROUP BY 1, 2),
         gb AS (SELECT pred_ppm, CAST(count(*) AS BIGINT) AS c
                FROM sc GROUP BY 1),
         bins AS (SELECT pred_ppm,
             (CAST(COALESCE(sum(c) OVER (ORDER BY pred_ppm
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) * 10)
               // (SELECT CAST(count(*) AS BIGINT) FROM sc) AS bin
           FROM gb),
         b AS (SELECT bins.bin, sc.y, sc.pred_ppm
               FROM sc JOIN bins ON sc.pred_ppm = bins.pred_ppm),
         cal AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(pred_ppm) AS BIGINT) // CAST(count(*) AS BIGINT)
               AS conf_ppm,
             (CAST(sum(y) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT)
               AS acc_ppm
           FROM b GROUP BY 1),
         gp AS (SELECT bin, n_docs, conf_ppm, acc_ppm,
                  abs(acc_ppm - conf_ppm) AS gap_ppm FROM cal)
         SELECT bin, n_docs, conf_ppm, acc_ppm, gap_ppm,
           CAST(sum(n_docs * gap_ppm) OVER () AS BIGINT)
             // CAST(sum(n_docs) OVER () AS BIGINT) AS ece_ppm
         FROM gp""",
    // q242: per-label sliced W1 on 4 md5 sign planes; micro-lattice
    // projections, HUGEINT strip sums, one double division per cell
    "q242_sliced_w1" ->
      """WITH sgn AS (SELECT p.p AS plane, d.d - 1 AS i,
             CASE WHEN substr(md5(CAST(p.p AS VARCHAR) || ':'
                 || CAST(d.d AS VARCHAR)), 1, 1) >= '8'
               THEN 1 ELSE -1 END AS s
           FROM range(4) p(p), range(1, 65) d(d)),
         xq AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
             CAST(generate_subscripts(emb, 1) - 1 AS BIGINT) AS i,
             CAST(floor(unnest(emb) * 1000000 + 1.0/3) AS BIGINT) AS xq
           FROM (SELECT vec_id, label, list_transform(embedding,
                   x -> CAST(x AS DOUBLE)) AS emb FROM embeddings)),
         pj AS (SELECT xq.vec_id, xq.label, sgn.plane,
             CAST(sum(CASE WHEN sgn.s = 1 THEN xq.xq ELSE -xq.xq END)
               AS BIGINT) AS v
           FROM xq JOIN sgn ON xq.i = sgn.i GROUP BY 1, 2, 3),
         g AS (SELECT plane, label, v, CAST(count(*) AS BIGINT) AS c
               FROM pj GROUP BY 1, 2, 3),
         ag AS (SELECT plane, v, CAST(sum(c) AS BIGINT) AS ca
                FROM g GROUP BY 1, 2),
         tt AS (SELECT plane, label, CAST(sum(c) AS BIGINT) AS n_s
                FROM g GROUP BY 1, 2),
         na AS (SELECT plane, CAST(sum(c) AS BIGINT) AS n_all
                FROM g GROUP BY 1),
         grid AS (SELECT ag.plane, tt.label, ag.v, tt.n_s,
             COALESCE(g.c, 0) AS c, ag.ca
           FROM ag JOIN tt ON ag.plane = tt.plane
           LEFT JOIN g ON g.plane = ag.plane AND g.label = tt.label
             AND g.v = ag.v),
         cum AS (SELECT plane, label, v, n_s, ca,
             CAST(sum(c) OVER (PARTITION BY plane, label ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_s,
             CAST(sum(ca) OVER (PARTITION BY plane, label ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_a,
             lead(v) OVER (PARTITION BY plane, label ORDER BY v) AS v_next
           FROM grid),
         pp AS (SELECT cum.plane, cum.label,
             CAST(max(cum.n_s) AS BIGINT) AS n_s,
             CAST(max(na.n_all) AS BIGINT) AS n_all,
             sum(CASE WHEN v_next IS NULL THEN CAST(0 AS HUGEINT)
               ELSE abs(CAST(cum_s AS HUGEINT) * na.n_all
                 - CAST(cum_a AS HUGEINT) * cum.n_s) * (v_next - v)
               END) AS raw
           FROM cum JOIN na ON cum.plane = na.plane
           GROUP BY 1, 2),
         w1 AS (SELECT plane, label, n_s,
             CAST(floor(CAST(raw AS DOUBLE)
               / CAST(CAST(n_s AS HUGEINT) * n_all AS DOUBLE) + 1.0/3)
               AS BIGINT) AS w1_micro
           FROM pp)
         SELECT plane, label, n_s, w1_micro,
           CAST(sum(w1_micro) OVER (PARTITION BY label) AS BIGINT) // 4
             AS swd_micro
         FROM w1""",
    )
    // q230: 2-core of the q28 near-dup graph — the oracle REUSES q28's
    // SQL verbatim as the pair source and unrolls 8 materialized peel
    // rounds (MATERIALIZED: each round references its predecessor three
    // times; inlined CTEs would re-expand the base scan 3^8 times).
    // Fixed 8 rounds == the engine's early-exit fixpoint because peeling
    // is idempotent once converged (spec asserts convergence <= 8).
    val kcorePeel = (1 to 8).map { r =>
      s""",
         a$r AS MATERIALIZED (SELECT u FROM (SELECT u, count(*) AS c
             FROM s${r - 1} GROUP BY 1) WHERE c >= 2),
         s$r AS MATERIALIZED (SELECT s.u, s.v FROM s${r - 1} s
             JOIN a$r x ON s.u = x.u JOIN a$r y ON s.v = y.u)"""
    }.mkString
    // q231: wedge-closure audit over the same q28 pair relation —
    // wedge centers degree-capped at TransDegCap, mirroring the engine
    val transOracle =
      s"""WITH p0 AS MATERIALIZED (
${base("q28_simhash_pairs")}),
         p AS MATERIALIZED (SELECT doc_a, doc_b FROM p0),
         s AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM p
           UNION ALL SELECT doc_b, doc_a FROM p),
         deg AS (SELECT u, CAST(count(*) AS BIGINT) AS du
                 FROM s GROUP BY 1),
         sc AS (SELECT s.u, s.v FROM s JOIN deg USING (u)
                WHERE deg.du <= ${graft.operators.Dedup.TransDegCap}),
         w AS (SELECT DISTINCT x.v AS a, y.v AS c
               FROM sc x JOIN sc y ON x.u = y.u AND x.v < y.v),
         cl AS (SELECT w.a, w.c,
             CASE WHEN p.doc_a IS NOT NULL THEN 1 ELSE 0 END AS closed
           FROM w LEFT JOIN p ON p.doc_a = w.a AND p.doc_b = w.c)
         SELECT CAST((SELECT count(*) FROM p) AS BIGINT) AS n_pairs,
           CAST(count(*) AS BIGINT) AS n_wedge_pairs,
           CAST(sum(closed) AS BIGINT) AS n_closed,
           CASE WHEN count(*) > 0
             THEN (CAST(sum(closed) AS BIGINT) * 1000000)
               // CAST(count(*) AS BIGINT)
             ELSE 0 END AS closure_ppm
         FROM cl"""
    // q235: degree assortativity over the same q28 pair relation —
    // HUGEINT moment sums, one double division floored to milli
    val assortOracle =
      s"""WITH p0 AS MATERIALIZED (
${base("q28_simhash_pairs")}),
         p AS MATERIALIZED (SELECT doc_a, doc_b FROM p0),
         s AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM p
           UNION ALL SELECT doc_b, doc_a FROM p),
         deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM s GROUP BY 1),
         e AS (SELECT du.d AS du, dv.d AS dv
               FROM s JOIN deg du ON s.u = du.u JOIN deg dv ON s.v = dv.u),
         a AS (SELECT CAST(count(*) AS BIGINT) AS m,
                 sum(CAST(du AS HUGEINT)) AS sxd,
                 sum(CAST(du AS HUGEINT) * dv) AS sxyd,
                 sum(CAST(du AS HUGEINT) * du) AS sxxd
               FROM e)
         SELECT m, CAST(sxd AS BIGINT) AS sum_deg,
           CAST(sxyd AS BIGINT) AS sum_prod,
           CAST(sxxd AS BIGINT) AS sum_deg_sq,
           CASE WHEN CAST(m AS DOUBLE) * CAST(sxxd AS DOUBLE)
                  - CAST(sxd AS DOUBLE) * CAST(sxd AS DOUBLE) > 0
             THEN CAST(floor((CAST(m AS DOUBLE) * CAST(sxyd AS DOUBLE)
                 - CAST(sxd AS DOUBLE) * CAST(sxd AS DOUBLE)) * 1000
               / (CAST(m AS DOUBLE) * CAST(sxxd AS DOUBLE)
                 - CAST(sxd AS DOUBLE) * CAST(sxd AS DOUBLE)) + 1.0/3)
               AS BIGINT)
             ELSE 0 END AS r_milli
         FROM a"""
    // q238: size census of q62's components — the q62 oracle runs as a
    // derived table (nested WITH RECURSIVE), two shrinking groupBys on top
    val clusterSizesOracle =
      s"""WITH lbl AS (SELECT * FROM (
${base("q62_dup_clusters")})),
         cl AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz
                FROM lbl GROUP BY 1)
         SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sz * count(*) AS BIGINT) AS n_docs,
           CAST((sz - 1) * count(*) AS BIGINT) AS n_removable
         FROM cl GROUP BY 1"""
    // q243: lexical (exact 3-gram Jaccard >= 0.5) vs semantic (q37's
    // banded cosine >= 0.4) pair-set agreement; the lex side is the
    // naive-join form (exact == PPJoin by the q25 equivalence), the sem
    // side reuses q37's SQL verbatim as a derived table
    val lexSemOracle =
      s"""WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                  generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents),
         sh AS (
           SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
           FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                      JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
         card AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
         shared AS (
           SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS n_shared
           FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
                       JOIN sh sb ON sb.doc_id = c.doc_b AND sa.shingle = sb.shingle
           GROUP BY 1, 2),
         lexp AS (
           SELECT s.doc_a, s.doc_b
           FROM shared s JOIN card ca ON ca.doc_id = s.doc_a
                         JOIN card cb ON cb.doc_id = s.doc_b
           WHERE s.n_shared / (ca.n + cb.n - s.n_shared) >= 0.5),
         semp AS (SELECT vec_a AS doc_a, vec_b AS doc_b FROM (
${base("q37_cosine_neardup")})),
         la AS (SELECT CAST(count(*) AS BIGINT) AS n_lex FROM lexp),
         sa2 AS (SELECT CAST(count(*) AS BIGINT) AS n_sem FROM semp),
         bo AS (SELECT CAST(count(*) AS BIGINT) AS n_both
                FROM lexp JOIN semp USING (doc_a, doc_b))
         SELECT n_lex, n_sem, n_both,
           CASE WHEN n_lex > 0 THEN (n_both * 1000000) // n_lex
             ELSE 0 END AS recall_vs_lex_ppm,
           CASE WHEN n_sem > 0 THEN (n_both * 1000000) // n_sem
             ELSE 0 END AS precision_vs_lex_ppm,
           CASE WHEN n_lex + n_sem - n_both > 0
             THEN (n_both * 1000000) // (n_lex + n_sem - n_both)
             ELSE 0 END AS pair_jaccard_ppm
         FROM la, sa2, bo"""
    // q244: ARI between q38's cell assignment and gold labels — the
    // assignment CTEs mirror q38's oracle, the agreement math q233's
    val cellAriOracle =
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
           FROM embeddings),
         n AS (SELECT vec_id, label, emb,
                 sqrt(list_reduce(list_transform(emb, x -> x*x),
                   (a,b)->a+b)) AS nrm
               FROM e),
         cent AS (SELECT vec_id AS cent_id, emb AS cemb, nrm AS cnrm
                  FROM n WHERE vec_id < 8),
         ranked AS (
           SELECT vec_id, label, cent_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY ccos DESC, cent_id ASC) AS crk
           FROM (SELECT n.vec_id, n.label, c.cent_id,
                   list_reduce(list_transform(n.emb, (x,i) -> x * c.cemb[i]),
                     (a,b)->a+b) / (n.nrm*c.cnrm) AS ccos
                 FROM n, cent c)),
         cm AS (SELECT label AS gold, cent_id AS predicted,
                  CAST(count(*) AS BIGINT) AS n
                FROM ranked WHERE crk = 1 GROUP BY 1, 2),
         idx AS (SELECT CAST(sum((n * (n - 1)) // 2) AS BIGINT) AS index_pairs,
                   CAST(sum(n) AS BIGINT) AS n_docs FROM cm),
         ra AS (SELECT CAST(sum((a * (a - 1)) // 2) AS BIGINT) AS sum_a
                FROM (SELECT CAST(sum(n) AS BIGINT) AS a FROM cm GROUP BY gold)),
         cb AS (SELECT CAST(sum((b * (b - 1)) // 2) AS BIGINT) AS sum_b
                FROM (SELECT CAST(sum(n) AS BIGINT) AS b FROM cm GROUP BY predicted)),
         z AS (SELECT n_docs, index_pairs, sum_a, sum_b,
                 (n_docs * (n_docs - 1)) // 2 AS c2n FROM idx, ra, cb),
         f AS (SELECT *,
                 CAST(index_pairs AS HUGEINT) * c2n
                   - CAST(sum_a AS HUGEINT) * sum_b AS numh,
                 CAST(c2n AS HUGEINT) * (sum_a + sum_b)
                   - CAST(sum_a AS HUGEINT) * sum_b * 2 AS denh
               FROM z)
         SELECT n_docs, index_pairs, sum_a, sum_b,
           CASE WHEN CAST(denh AS DOUBLE) > 0
             THEN CAST(floor(CAST(numh AS DOUBLE) * 2 * 1000000
               / CAST(denh AS DOUBLE) + 1.0/3) AS BIGINT)
             ELSE 0 END AS ari_ppm
         FROM f"""
    // q245: radius sweep — q28's chain with the candidate hamming cap
    // raised to 2 (sound: <=2 differing bits break <=2 of 4 bands),
    // then a 3-row census
    val radiusOracle =
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
         bits AS (
           SELECT doc_id, j.j,
                  sum(tf * CASE WHEN substr(md5(tok), j.j + 1, 1) >= '8'
                           THEN 1 ELSE -1 END) AS s
           FROM tf, range(32) j(j) GROUP BY 1, 2),
         sh AS (
           SELECT doc_id,
                  CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
                    AS simhash
           FROM bits GROUP BY 1),
         banded AS (SELECT doc_id, simhash, b.band,
                           (simhash // (1::BIGINT << (b.band * 8))) % 256 AS byte
                    FROM sh, range(4) b(band)),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sh_a,
                         b.doc_id AS doc_b, b.simhash AS sh_b
                  FROM banded a JOIN banded b
                    ON a.band = b.band AND a.byte = b.byte AND a.doc_id < b.doc_id),
         pairs AS (SELECT doc_a, doc_b,
                     CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
                   FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 2),
         ex AS (SELECT doc_a, doc_b, hamming,
                  CAST(unnest(range(hamming, 3)) AS BIGINT) AS radius
                FROM pairs),
         counts AS (SELECT radius, CAST(count(*) AS BIGINT) AS n_pairs_cum,
             CAST(sum(CASE WHEN hamming = radius THEN 1 ELSE 0 END)
               AS BIGINT) AS n_pairs_at
           FROM ex GROUP BY 1),
         cover AS (SELECT radius, CAST(count(DISTINCT d) AS BIGINT)
                     AS n_docs_covered
                   FROM (SELECT radius, unnest([doc_a, doc_b]) AS d FROM ex)
                   GROUP BY 1)
         SELECT CAST(r.radius AS BIGINT) AS radius,
           CAST(COALESCE(counts.n_pairs_at, 0) AS BIGINT) AS n_pairs_at,
           CAST(COALESCE(counts.n_pairs_cum, 0) AS BIGINT) AS n_pairs_cum,
           CAST(COALESCE(cover.n_docs_covered, 0) AS BIGINT) AS n_docs_covered
         FROM range(3) r(radius)
         LEFT JOIN counts ON counts.radius = r.radius
         LEFT JOIN cover ON cover.radius = r.radius"""
    // q246: keep-one-per-cluster token savings, per source, over q62's
    // labeling (same nested-recursive-CTE reuse as q238)
    val dedupSavingsOracle =
      s"""WITH lbl AS (SELECT * FROM (
${base("q62_dup_clusters")})),
         tk AS (SELECT doc_id, source,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
                FROM documents),
         j AS (SELECT lbl.doc_id, lbl.cluster_id, tk.source, tk.n_tok
               FROM lbl JOIN tk USING (doc_id)),
         kp AS (SELECT cluster_id, min(doc_id) AS keep_id
                FROM j GROUP BY 1),
         r AS (SELECT j.source, j.n_tok,
                 CASE WHEN j.doc_id <> kp.keep_id THEN 1 ELSE 0 END
                   AS removed
               FROM j JOIN kp USING (cluster_id))
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(removed) AS BIGINT) AS n_removed,
           CAST(sum(n_tok) AS BIGINT) AS tokens_total,
           CAST(sum(CASE WHEN removed = 1 THEN n_tok ELSE 0 END)
             AS BIGINT) AS tokens_removed,
           (CAST(sum(CASE WHEN removed = 1 THEN n_tok ELSE 0 END)
             AS BIGINT) * 1000000)
             // CAST(sum(n_tok) AS BIGINT) AS removed_ppm
         FROM r GROUP BY 1"""
    // q247: t-closeness — q216's decile construction, per-class vs global
    // cumulative mass, EMD over the ordered scale
    val tClosenessOracle =
      """WITH g AS (SELECT n_chars, CAST(count(*) AS BIGINT) AS cnt
           FROM documents GROUP BY 1),
         a AS (SELECT n_chars,
             CAST(coalesce(sum(cnt) OVER (ORDER BY n_chars DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_gt,
             CAST(sum(cnt) OVER () AS BIGINT) AS n_tot
           FROM g),
         dec_map AS (SELECT n_chars, (cum_gt * 10) // n_tot + 1 AS decile
                     FROM a),
         tag AS (SELECT d.lang, d.source, dec_map.decile
                 FROM documents d JOIN dec_map USING (n_chars)),
         gdist AS (SELECT decile, CAST(count(*) AS BIGINT) AS g
                  FROM tag GROUP BY 1),
         gc AS (SELECT decile,
             CAST(sum(g) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_g,
             CAST(sum(g) OVER () AS BIGINT) AS n_total
           FROM gdist),
         cls AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs
                 FROM tag GROUP BY 1, 2),
         cc AS (SELECT lang, source, decile, CAST(count(*) AS BIGINT) AS c
                FROM tag GROUP BY 1, 2, 3),
         grid AS (SELECT cls.lang, cls.source, cls.n_docs,
             CAST(r.d AS BIGINT) AS decile,
             CAST(COALESCE(cc.c, 0) AS BIGINT) AS c
           FROM cls CROSS JOIN range(1, 11) r(d)
           LEFT JOIN cc ON cc.lang = cls.lang AND cc.source = cls.source
             AND cc.decile = r.d),
         cum AS (SELECT lang, source, n_docs, decile,
             CAST(sum(c) OVER (PARTITION BY lang, source ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_c
           FROM grid),
         j AS (SELECT cum.*, gc.cum_g, gc.n_total
               FROM cum JOIN gc USING (decile)),
         e AS (SELECT lang, source, n_docs, any_value(n_total) AS n_total,
             sum(abs(CAST(cum_c AS HUGEINT) * n_total
               - CAST(cum_g AS HUGEINT) * n_docs)) AS sd
           FROM j GROUP BY 1, 2, 3)
         SELECT lang, source, n_docs,
           CAST(floor(CAST(sd AS DOUBLE) * 1000000
             / (9 * CAST(n_docs AS DOUBLE) * CAST(n_total AS DOUBLE))
             + 1.0/3) AS BIGINT) AS emd_ppm,
           CAST(CASE WHEN floor(CAST(sd AS DOUBLE) * 1000000
             / (9 * CAST(n_docs AS DOUBLE) * CAST(n_total AS DOUBLE))
             + 1.0/3) > 200000 THEN 1 ELSE 0 END AS BIGINT) AS breach
         FROM e"""
    // q248: Neyman allocation over per-source n_chars variance
    val neymanOracle =
      """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             sum(CAST(n_chars AS HUGEINT)) AS sx,
             sum(CAST(n_chars AS HUGEINT) * n_chars) AS sxx
           FROM documents GROUP BY 1),
         v AS (SELECT source, n_docs,
             CAST(floor(sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE)
               / (CAST(n_docs AS DOUBLE) * n_docs)) * 1000 + 1.0/3)
               AS BIGINT) AS sd_milli
           FROM s),
         w AS (SELECT source, n_docs, sd_milli,
             n_docs * sd_milli AS w FROM v),
         t AS (SELECT CAST(sum(w) AS BIGINT) AS t,
             CAST(sum(n_docs) AS BIGINT) AS n_total,
             sum(CAST(n_docs AS HUGEINT) * sd_milli * sd_milli) AS b
           FROM w)
         SELECT source, n_docs, sd_milli,
           CAST((10000 * CAST(w AS HUGEINT)) // t AS BIGINT)
             AS alloc_neyman,
           (10000 * n_docs) // n_total AS alloc_prop,
           CAST(floor(CAST(CAST(t AS HUGEINT) * t AS DOUBLE) * 1000000
             / (CAST(n_total AS DOUBLE) * CAST(b AS DOUBLE)) + 1.0/3)
             AS BIGINT) AS deff_ppm
         FROM w, t"""
    // q249: participation ratio — one aggregate over q224's census
    val prOracle =
      s"""WITH dv AS (
${base("q224_dim_variance")}),
         s AS (SELECT CAST(count(*) AS BIGINT) AS n_dims,
             CAST(sum(dead) AS BIGINT) AS n_dead,
             sum(CAST(var_micro2 AS HUGEINT)) AS sv,
             sum(CAST(var_micro2 AS HUGEINT) * var_micro2) AS svv,
             CAST(max(var_micro2) AS BIGINT) AS max_var
           FROM dv)
         SELECT n_dims, n_dead, CAST(sv AS BIGINT) AS sum_var,
           CASE WHEN svv > 0 THEN CAST(floor(CAST(sv * sv AS DOUBLE) * 1000
             / CAST(svv AS DOUBLE) + 1.0/3) AS BIGINT) ELSE 0 END
             AS pr_milli,
           CASE WHEN sv > 0 THEN CAST(floor(CAST(max_var AS DOUBLE) * 1000000
             / CAST(sv AS DOUBLE) + 1.0/3) AS BIGINT) ELSE 0 END
             AS top_share_ppm
         FROM s"""
    // q251: Cohen's kappa — q233's langid confusion matrix, marginal
    // chance correction instead of pair-counting
    val kappaOracle =
      """WITH s AS (
           SELECT lang,
             CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'he ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'nd ', ''))) / 3 AS BIGINT) AS score_en,
             CAST((length(text) - length(replace(text, 'der', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'ein', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'sch', ''))) / 3 AS BIGINT) AS score_de,
             CAST((length(text) - length(replace(text, 'le ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'ent', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'es ', ''))) / 3 AS BIGINT) AS score_fr,
             CAST((length(text) - length(replace(text, 'de ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'la ', ''))) / 3 AS BIGINT)
           + CAST((length(text) - length(replace(text, 'os ', ''))) / 3 AS BIGINT) AS score_es
           FROM documents),
         pr AS (
           SELECT lang AS gold,
             CASE WHEN score_en >= score_de AND score_en >= score_fr
                       AND score_en >= score_es THEN 'en'
                  WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
                  WHEN score_fr >= score_es THEN 'fr'
                  ELSE 'es' END AS predicted
           FROM s),
         cm AS (SELECT gold, predicted, CAST(count(*) AS BIGINT) AS n
                FROM pr GROUP BY 1, 2),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN gold = predicted THEN n ELSE 0 END)
               AS BIGINT) AS n_agree FROM cm),
         ma AS (SELECT gold AS lbl, CAST(sum(n) AS BIGINT) AS a
                FROM cm GROUP BY 1),
         mb AS (SELECT predicted AS lbl, CAST(sum(n) AS BIGINT) AS b
                FROM cm GROUP BY 1),
         pe AS (SELECT sum(CAST(a AS HUGEINT) * b) AS sab
                FROM ma JOIN mb USING (lbl))
         SELECT n_docs, n_agree,
           (n_agree * 1000000) // n_docs AS po_ppm,
           CAST(floor(CAST(sab AS DOUBLE) * 1000000
             / (CAST(n_docs AS DOUBLE) * n_docs) + 1.0/3) AS BIGINT)
             AS pe_ppm,
           CASE WHEN CAST(n_docs AS HUGEINT) * n_docs <> sab
             THEN CAST(floor(CAST(CAST(n_docs AS HUGEINT) * n_agree - sab
               AS DOUBLE) * 1000
               / CAST(CAST(n_docs AS HUGEINT) * n_docs - sab AS DOUBLE)
               + 1.0/3) AS BIGINT)
             ELSE 0 END AS kappa_milli
         FROM tot, pe"""
    // q250: source-partition modularity over the q28 near-dup graph
    val modularityOracle =
      s"""WITH p0 AS MATERIALIZED (
${base("q28_simhash_pairs")}),
         p AS (SELECT doc_a, doc_b FROM p0),
         pa AS (SELECT p.doc_a, p.doc_b, da.source AS src_a,
                  db.source AS src_b
                FROM p JOIN documents da ON p.doc_a = da.doc_id
                       JOIN documents db ON p.doc_b = db.doc_id),
         mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pa),
         wi AS (SELECT src_a AS source, CAST(count(*) AS BIGINT)
                  AS e_within
                FROM pa WHERE src_a = src_b GROUP BY 1),
         dg AS (SELECT source, CAST(count(*) AS BIGINT) AS d_sum FROM (
             SELECT src_a AS source FROM pa
             UNION ALL SELECT src_b FROM pa) GROUP BY 1)
         SELECT dg.source,
           CAST(COALESCE(wi.e_within, 0) AS BIGINT) AS e_within,
           dg.d_sum,
           CAST(floor(CAST(CAST(4 * m AS HUGEINT)
             * COALESCE(wi.e_within, 0)
             - CAST(d_sum AS HUGEINT) * d_sum AS DOUBLE) * 1000000
             / CAST(CAST(m AS HUGEINT) * m * 4 AS DOUBLE) + 1.0/3)
             AS BIGINT) AS contrib_ppm
         FROM dg LEFT JOIN wi USING (source), mm"""
    // q252: banding S-curve per (b, r) config over q213's decile
    // histogram — the power chains are unrolled from the same literal
    // config list the Spark side uses
    val lshOcOracle = {
      val cfgSelects = graft.operators.Dedup.lshConfigs.map { case (b, r) =>
        val a = (List("CAST(jc AS HUGEINT)") ++ List.fill(r - 1)("jc"))
          .mkString(" * ")
        val dr = BigInt(100).pow(r).toString
        val dd = BigInt(100).pow(r * b).toString
        val cc = List.fill(b)("bb").mkString(" * ")
        s"""SELECT CAST($b AS BIGINT) AS b, CAST($r AS BIGINT) AS r,
           decile, jc, n_pairs,
           1000000 - CAST(floor(CAST($cc AS DOUBLE) * 1000000
             / CAST(CAST('$dd' AS HUGEINT) AS DOUBLE) + 1.0/3) AS BIGINT)
             AS p_ppm
           FROM (SELECT decile, jc, n_pairs,
                 CAST('$dr' AS HUGEINT) - $a AS bb FROM hist)"""
      }.mkString("\n         UNION ALL\n")
      s"""WITH ts AS (
${base("q213_threshold_sweep")}),
         hist AS (SELECT decile, n_pairs,
             least(decile * 10 + 5, 100) AS jc FROM ts),
         pc AS (
$cfgSelects)
         SELECT b, r, decile, jc, n_pairs, p_ppm,
           CAST((sum(n_pairs * p_ppm) OVER (PARTITION BY b, r))
             // (sum(n_pairs) OVER (PARTITION BY b, r)) AS BIGINT)
             AS recall_ppm
         FROM pc"""
    }
    // q253: RRF fusion of the q29 dense ranking (vec_id < 8, top-20)
    // and the q25 lexical shingle ranking for the same 8 query docs
    val rrfOracle =
      """WITH e AS (SELECT vec_id, list_transform(embedding,
             x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
         n AS (SELECT vec_id, emb,
                 sqrt(list_reduce(list_transform(emb, x -> x * x),
                   (a, b) -> a + b)) AS nrm
               FROM e),
         q AS (SELECT vec_id AS query_id, emb AS qemb, nrm AS qnrm
               FROM n WHERE vec_id < 8),
         scored AS (SELECT q.query_id, c.vec_id,
             list_reduce(list_transform(c.emb, (x, i) -> x * q.qemb[i]),
               (a, b) -> a + b) / (q.qnrm * c.nrm) AS cos
           FROM n c, q WHERE c.vec_id <> q.query_id),
         dense AS (SELECT query_id, vec_id AS doc_id, rank_dense FROM (
             SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, vec_id ASC) AS rank_dense
             FROM scored) WHERE rank_dense <= 20),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                 generate_subscripts(string_split(text, ' '), 1) AS i
                 FROM documents),
         sh AS (SELECT DISTINCT a.doc_id,
                  a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
                FROM tok a JOIN tok b ON a.doc_id = b.doc_id
                    AND b.i = a.i + 1
                  JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
         qsh AS (SELECT doc_id AS query_id, shingle FROM sh
                 WHERE doc_id < 8),
         lexs AS (SELECT qsh.query_id, sh.doc_id,
             CAST(count(*) AS BIGINT) AS n_shared
           FROM sh JOIN qsh USING (shingle)
           WHERE sh.doc_id <> qsh.query_id GROUP BY 1, 2),
         lex AS (SELECT query_id, doc_id, rank_lex FROM (
             SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY n_shared DESC, doc_id ASC) AS rank_lex
             FROM lexs) WHERE rank_lex <= 20),
         fused AS (SELECT COALESCE(d.query_id, l.query_id) AS query_id,
             COALESCE(d.doc_id, l.doc_id) AS doc_id,
             d.rank_dense, l.rank_lex,
             COALESCE(1000000 // (60 + d.rank_dense), 0)
               + COALESCE(1000000 // (60 + l.rank_lex), 0) AS score_micro
           FROM dense d FULL OUTER JOIN lex l
             ON d.query_id = l.query_id AND d.doc_id = l.doc_id)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
           score_micro,
           CAST(CASE WHEN rank_dense IS NOT NULL THEN 1 ELSE 0 END
             AS BIGINT) AS in_dense,
           CAST(CASE WHEN rank_lex IS NOT NULL THEN 1 ELSE 0 END
             AS BIGINT) AS in_lex
         FROM (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY score_micro DESC, doc_id ASC) AS rank FROM fused)
         WHERE rank <= 10"""
    // q254: 5 BPE merge rounds — each block counts weighted adjacent
    // pairs, takes the deterministic argmax, and rewrites via greedy
    // non-overlapping selection (alternate positions within candidate
    // runs == the Spark side's left-to-right fold)
    val bpeOracle = {
      def round(r: Int): String =
        s"""pc$r AS MATERIALIZED (SELECT a.s AS pa, b.s AS pb,
             CAST(sum(a.f) AS BIGINT) AS cnt
           FROM syms$r a JOIN syms$r b ON a.w = b.w AND b.i = a.i + 1
           GROUP BY 1, 2),
         mx$r AS MATERIALIZED (SELECT pa, pb, cnt FROM pc$r
           ORDER BY cnt DESC, pa ASC, pb ASC LIMIT 1),
         cand$r AS MATERIALIZED (SELECT a.w, a.i FROM syms$r a
           JOIN syms$r b ON a.w = b.w AND b.i = a.i + 1, mx$r
           WHERE a.s = mx$r.pa AND b.s = mx$r.pb),
         sel$r AS MATERIALIZED (SELECT w, i FROM (
             SELECT w, i,
               i - row_number() OVER (PARTITION BY w ORDER BY i) AS grp
             FROM cand$r)
           QUALIFY (i - min(i) OVER (PARTITION BY w, grp)) % 2 = 0),
         syms${r + 1} AS MATERIALIZED (SELECT t.w,
             CAST(row_number() OVER (PARTITION BY t.w ORDER BY t.i)
               AS BIGINT) AS i,
             t.s2 AS s, t.f
           FROM (SELECT y.w, y.i, y.f,
               CASE WHEN s1.i IS NOT NULL THEN y.s || y.nxt ELSE y.s END
                 AS s2,
               s0.i AS dropme
             FROM (SELECT w, i, s, f,
                 lead(s) OVER (PARTITION BY w ORDER BY i) AS nxt
               FROM syms$r) y
             LEFT JOIN sel$r s1 ON s1.w = y.w AND s1.i = y.i
             LEFT JOIN sel$r s0 ON s0.w = y.w AND s0.i = y.i - 1) t
           WHERE t.dropme IS NULL)"""
      s"""WITH v AS (SELECT tok AS w, CAST(count(*) AS BIGINT) AS f FROM (
             SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
           WHERE tok <> '' GROUP BY 1),
         syms1 AS MATERIALIZED (SELECT w, CAST(u + 1 AS BIGINT) AS i,
             substr(w, CAST(u + 1 AS INTEGER), 1) AS s, f
           FROM (SELECT w, f, unnest(range(length(w))) AS u FROM v)),
         ${(1 to 5).map(round).mkString(",\n         ")}
         ${(1 to 5).map(r => s"SELECT CAST($r AS BIGINT) AS merge_rank, " +
          s"pa AS sym_a, pb AS sym_b, cnt AS pair_count FROM mx$r")
          .mkString("\n         UNION ALL ")}"""
    }
    // q255: naive vs cluster-hash split, leakage measured on q28 pairs
    // against the q62 CC labeling
    val clusterSplitOracle =
      s"""WITH lbl AS MATERIALIZED (SELECT * FROM (
${base("q62_dup_clusters")})),
         p0 AS MATERIALIZED (SELECT doc_a, doc_b FROM (
${base("q28_simhash_pairs")})),
         asg AS MATERIALIZED (SELECT doc_id,
             CASE WHEN hn <= 7 THEN 'train' WHEN hn = 8 THEN 'val'
               ELSE 'test' END AS naive,
             CASE WHEN hc <= 7 THEN 'train' WHEN hc = 8 THEN 'val'
               ELSE 'test' END AS clus
           FROM (SELECT doc_id,
               CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                 1, 8) AS BIGINT) % 10 AS hn,
               CAST('0x' || substr(md5('csplit:'
                 || CAST(cluster_id AS VARCHAR)), 1, 8) AS BIGINT) % 10
                 AS hc
             FROM lbl)),
         sz AS (SELECT 'naive' AS scheme,
             CAST(sum(CASE WHEN naive = 'train' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_train,
             CAST(sum(CASE WHEN naive = 'val' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_val,
             CAST(sum(CASE WHEN naive = 'test' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_test
           FROM asg
           UNION ALL SELECT 'cluster',
             CAST(sum(CASE WHEN clus = 'train' THEN 1 ELSE 0 END)
               AS BIGINT),
             CAST(sum(CASE WHEN clus = 'val' THEN 1 ELSE 0 END)
               AS BIGINT),
             CAST(sum(CASE WHEN clus = 'test' THEN 1 ELSE 0 END)
               AS BIGINT)
           FROM asg),
         pj AS (SELECT a.naive AS na, a.clus AS ca, b.naive AS nb,
             b.clus AS cb
           FROM p0 JOIN asg a ON p0.doc_a = a.doc_id
                   JOIN asg b ON p0.doc_b = b.doc_id),
         cr AS (SELECT 'naive' AS scheme,
             CAST(sum(CASE WHEN na <> nb THEN 1 ELSE 0 END) AS BIGINT)
               AS cross_pairs,
             CAST(count(*) AS BIGINT) AS np
           FROM pj
           UNION ALL SELECT 'cluster',
             CAST(sum(CASE WHEN ca <> cb THEN 1 ELSE 0 END) AS BIGINT),
             CAST(count(*) AS BIGINT)
           FROM pj)
         SELECT sz.scheme, n_train, n_val, n_test, cross_pairs,
           CASE WHEN np > 0 THEN (cross_pairs * 1000000) // np
             ELSE 0 END AS leak_ppm
         FROM sz JOIN cr USING (scheme)"""
    // q256: language-pair census of the q37 embedding near-dup relation
    val translatedDupsOracle =
      s"""WITH semp AS MATERIALIZED (SELECT vec_a, vec_b FROM (
${base("q37_cosine_neardup")})),
         j AS (SELECT least(da.lang, db.lang) AS lang_lo,
             greatest(da.lang, db.lang) AS lang_hi
           FROM semp JOIN documents da ON semp.vec_a = da.doc_id
                     JOIN documents db ON semp.vec_b = db.doc_id),
         g AS (SELECT lang_lo, lang_hi, CAST(count(*) AS BIGINT)
                 AS n_pairs
               FROM j GROUP BY 1, 2)
         SELECT lang_lo, lang_hi, n_pairs,
           CAST(CASE WHEN lang_lo <> lang_hi THEN 1 ELSE 0 END AS BIGINT)
             AS cross_lang,
           (n_pairs * 1000000) // CAST(sum(n_pairs) OVER () AS BIGINT)
             AS share_ppm
         FROM g"""
    // q257: Fellegi–Sunter m/u estimation — matched pairs from q28,
    // exchangeable baseline from the salted-hash adjacent permutation
    val fsOracle =
      s"""WITH g AS (SELECT n_chars, CAST(count(*) AS BIGINT) AS cnt
           FROM documents GROUP BY 1),
         a AS (SELECT n_chars,
             CAST(coalesce(sum(cnt) OVER (ORDER BY n_chars DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_gt,
             CAST(sum(cnt) OVER () AS BIGINT) AS n_tot
           FROM g),
         dm AS (SELECT n_chars, (cum_gt * 10) // n_tot + 1 AS dec10
                FROM a),
         feat AS MATERIALIZED (SELECT d.doc_id, d.lang, d.source,
             dm.dec10, string_split(d.text, ' ')[1] AS tok1
           FROM documents d JOIN dm USING (n_chars)),
         mp AS MATERIALIZED (SELECT doc_a, doc_b FROM (
${base("q28_simhash_pairs")})),
         up AS MATERIALIZED (SELECT doc_a, doc_b FROM (
             SELECT doc_id AS doc_a,
               lead(doc_id) OVER (ORDER BY
                 md5('fs:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC)
                 AS doc_b
             FROM documents) WHERE doc_b IS NOT NULL),
         ma AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN fa.lang = fb.lang THEN 1 ELSE 0 END)
               AS BIGINT) AS c_lang,
             CAST(sum(CASE WHEN fa.source = fb.source THEN 1 ELSE 0 END)
               AS BIGINT) AS c_source,
             CAST(sum(CASE WHEN fa.dec10 = fb.dec10 THEN 1 ELSE 0 END)
               AS BIGINT) AS c_decile,
             CAST(sum(CASE WHEN fa.tok1 = fb.tok1 THEN 1 ELSE 0 END)
               AS BIGINT) AS c_tok1
           FROM mp JOIN feat fa ON mp.doc_a = fa.doc_id
                   JOIN feat fb ON mp.doc_b = fb.doc_id),
         ua AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN fa.lang = fb.lang THEN 1 ELSE 0 END)
               AS BIGINT) AS c_lang,
             CAST(sum(CASE WHEN fa.source = fb.source THEN 1 ELSE 0 END)
               AS BIGINT) AS c_source,
             CAST(sum(CASE WHEN fa.dec10 = fb.dec10 THEN 1 ELSE 0 END)
               AS BIGINT) AS c_decile,
             CAST(sum(CASE WHEN fa.tok1 = fb.tok1 THEN 1 ELSE 0 END)
               AS BIGINT) AS c_tok1
           FROM up JOIN feat fa ON up.doc_a = fa.doc_id
                   JOIN feat fb ON up.doc_b = fb.doc_id),
         ms AS (SELECT 'lang' AS field, c_lang AS m_cnt, n AS n_m FROM ma
           UNION ALL SELECT 'source', c_source, n FROM ma
           UNION ALL SELECT 'decile', c_decile, n FROM ma
           UNION ALL SELECT 'tok1', c_tok1, n FROM ma),
         us AS (SELECT 'lang' AS field, c_lang AS u_cnt, n AS n_u FROM ua
           UNION ALL SELECT 'source', c_source, n FROM ua
           UNION ALL SELECT 'decile', c_decile, n FROM ua
           UNION ALL SELECT 'tok1', c_tok1, n FROM ua),
         z AS (SELECT field,
             ((m_cnt + 1) * 1000000) // (n_m + 2) AS m_ppm,
             ((u_cnt + 1) * 1000000) // (n_u + 2) AS u_ppm
           FROM ms JOIN us USING (field))
         SELECT field, m_ppm, u_ppm,
           CAST(floor(ln(CAST(m_ppm AS DOUBLE) / u_ppm)
             * 1442.6950408889634 + 1.0/3) AS BIGINT) AS weight_milli
         FROM z"""
    // q259: token-granular CDC chunk census — boundary token = md5 first
    // hex >= 'c'; chunk id = count of strictly-preceding boundaries;
    // chunk hash = md5 of the space-joined span; ppm through HUGEINT.
    val cdcOracle =
      """WITH t AS (SELECT doc_id, source,
             unnest(string_split(text, ' ')) AS tok,
             CAST(generate_subscripts(string_split(text, ' '), 1)
               AS BIGINT) AS pos
           FROM documents),
         b AS (SELECT doc_id, source, tok, pos,
             CASE WHEN substr(md5(tok), 1, 1) >= 'c'
               THEN 1 ELSE 0 END AS bf
           FROM t),
         c AS (SELECT doc_id, source, tok, pos,
             coalesce(sum(bf) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS chunk
           FROM b),
         ch AS (SELECT doc_id, source, chunk,
             CAST(count(*) AS BIGINT) AS len,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS chash
           FROM c GROUP BY 1, 2, 3),
         g AS (SELECT source, chash, CAST(count(*) AS BIGINT) AS cnt,
             max(len) AS len
           FROM ch GROUP BY 1, 2)
         SELECT source, CAST(sum(cnt) AS BIGINT) AS n_chunks,
           CAST(count(*) AS BIGINT) AS n_distinct_chunks,
           CAST((CAST(sum(cnt) - count(*) AS HUGEINT) * 1000000)
             // sum(cnt) AS BIGINT) AS dup_chunk_ppm,
           CAST(sum((cnt - 1) * len) AS BIGINT) AS dup_tokens
         FROM g GROUP BY 1"""
    // q260: Church–Gale VMR over per-doc counts incl. zeros — pure
    // integer moments in HUGEINT, one floor division to milli.
    val burstOracle =
      """WITH tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents)
           WHERE tok <> '' GROUP BY 1, 2),
         st AS (SELECT tok, CAST(count(*) AS BIGINT) AS df,
             sum(CAST(tf AS HUGEINT)) AS cf,
             sum(CAST(tf AS HUGEINT) * tf) AS s2
           FROM tf GROUP BY 1),
         top AS (SELECT * FROM st ORDER BY df DESC, tok ASC LIMIT 50),
         n AS (SELECT CAST(count(*) AS HUGEINT) AS n_docs FROM documents)
         SELECT tok, df, CAST(cf AS BIGINT) AS cf,
           CAST((1000 * (n.n_docs * s2 - cf * cf)) // (n.n_docs * cf)
             AS BIGINT) AS vmr_milli
         FROM top, n"""
    // q261: STTR — distinct-per-complete-25-token-segment, mean per
    // source; ttr_milli = distinct * 40 exactly.
    val sttrOracle =
      """WITH t AS (SELECT source, doc_id,
             unnest(string_split(text, ' ')) AS tok,
             CAST(generate_subscripts(string_split(text, ' '), 1)
               AS BIGINT) AS pos
           FROM documents),
         nz AS (SELECT source, doc_id, tok,
             row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1
               AS rn0
           FROM t WHERE tok <> ''),
         seg AS (SELECT source, doc_id, rn0 // 25 AS seg,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT tok) AS BIGINT) AS n_types
           FROM nz GROUP BY 1, 2, 3)
         SELECT source, CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(n_types * 40) // count(*) AS BIGINT) AS mean_ttr_milli
         FROM seg WHERE n = 25 GROUP BY 1"""
    // q262: Flesch reading ease — vowel-run syllables, terminator-run
    // sentences (>= 1 guards), identical left-associated double chain.
    val readabilityOracle =
      """WITH w AS (SELECT source, doc_id, tok FROM (
             SELECT source, doc_id,
               unnest(string_split(text, ' ')) AS tok
             FROM documents WHERE text IS NOT NULL)
           WHERE tok <> ''),
         ws AS (SELECT source, doc_id, CAST(count(*) AS BIGINT) AS w,
             CAST(sum(greatest(1,
               len(regexp_extract_all(lower(tok), '[aeiouy]+'))))
               AS BIGINT) AS y
           FROM w GROUP BY 1, 2),
         ss AS (SELECT source, doc_id,
             CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
               AS BIGINT) AS s
           FROM documents WHERE text IS NOT NULL),
         j AS (SELECT ws.source, ws.w, ws.y, ss.s
           FROM ws JOIN ss USING (source, doc_id))
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(w) AS BIGINT) AS n_words,
           CAST(sum(s) AS BIGINT) AS n_sentences,
           CAST(sum(y) AS BIGINT) AS n_syllables,
           CAST(floor((206.835
             - 1.015 * (CAST(sum(w) AS DOUBLE) / CAST(sum(s) AS BIGINT))
             - 84.6 * (CAST(sum(y) AS DOUBLE) / CAST(sum(w) AS BIGINT)))
             * 1000 + 1.0/3) AS BIGINT) AS flesch_milli
         FROM j GROUP BY 1 HAVING sum(w) > 0"""
    // q263: mean pairwise cosine over the vec_id<100 sample; per-pair
    // milli quantization, +1000 shift so trunc-div == floor-div.
    val isotropyOracle =
      """WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
           FROM embeddings WHERE vec_id < 100),
         n AS (SELECT vec_id, emb,
             sqrt(list_reduce(list_transform(emb, x -> x*x), (a,b)->a+b))
               AS nrm
           FROM e),
         p AS (SELECT CAST(floor(
             (list_reduce(list_transform(a.emb, (x,i) -> x * b.emb[i]),
               (s,t)->s+t) / (a.nrm * b.nrm)) * 1000 + 1.0/3) AS BIGINT)
               AS cq
           FROM n a JOIN n b ON a.vec_id < b.vec_id)
         SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(cq + 1000) // count(*) - 1000 AS BIGINT)
             AS mean_cos_milli,
           CAST((sum(CASE WHEN cq > 0 THEN 1 ELSE 0 END) * 1000000)
             // count(*) AS BIGINT) AS pos_ppm,
           CAST((sum(CASE WHEN cq >= 500 THEN 1 ELSE 0 END) * 1000000)
             // count(*) AS BIGINT) AS hi_ppm
         FROM p"""
    // q264: Kendall concordance between float-cosine and dequantized
    // int8-cosine rankings; 1e6 quantization before pairing, shifted div.
    // shared q264/q276 scoring CTEs (float + dequantized-int8 cosines)
    val qfScoredCtes =
      """WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
           FROM embeddings WHERE vec_id < 60),
         r AS (SELECT vec_id, emb, list_min(emb) AS lo,
             (list_max(emb) - list_min(emb)) / 255.0 AS scale FROM e),
         q AS (SELECT vec_id, emb, lo, scale,
             list_transform(emb, x ->
               CASE WHEN scale = 0 THEN CAST(0 AS BIGINT)
                 ELSE least(CAST(255 AS BIGINT),
                   CAST(floor((x - lo) / scale) AS BIGINT)) END) AS codes
           FROM r),
         rec AS (SELECT vec_id, emb,
             list_transform(codes, c -> lo + c * scale) AS rec
           FROM q),
         n AS (SELECT vec_id, emb, rec,
             sqrt(list_reduce(list_transform(emb, x -> x*x), (a,b)->a+b))
               AS enrm,
             sqrt(list_reduce(list_transform(rec, x -> x*x), (a,b)->a+b))
               AS rnrm
           FROM rec),
         qry AS (SELECT vec_id AS query_id, emb AS qemb, rec AS qrec,
             enrm AS qenrm, rnrm AS qrnrm
           FROM n WHERE vec_id < 10),
         cand AS (SELECT * FROM n WHERE vec_id >= 10),
         scored AS (SELECT q.query_id, c.vec_id,
             CAST(floor((list_reduce(
               list_transform(q.qemb, (x,i) -> x * c.emb[i]), (s,t)->s+t)
               / (q.qenrm * c.enrm)) * 1e6 + 1.0/3) AS BIGINT) AS eq,
             CAST(floor((list_reduce(
               list_transform(q.qrec, (x,i) -> x * c.rec[i]), (s,t)->s+t)
               / (q.qrnrm * c.rnrm)) * 1e6 + 1.0/3) AS BIGINT) AS aq
           FROM cand c, qry q)"""
    val quantFidelityOracle =
      s"""$qfScoredCtes,
         p AS (SELECT x.query_id, x.eq - y.eq AS de, x.aq - y.aq AS da
           FROM scored x JOIN scored y
             ON x.query_id = y.query_id AND x.vec_id < y.vec_id)
         SELECT query_id, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN de*da > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_conc,
           CAST(sum(CASE WHEN de*da < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_disc,
           CAST(sum(CASE WHEN de = 0 OR da = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_tie,
           CAST((((sum(CASE WHEN de*da > 0 THEN 1 ELSE 0 END)
             - sum(CASE WHEN de*da < 0 THEN 1 ELSE 0 END))
             + 1000 * count(*)) * 1000) // count(*) - 1000000 AS BIGINT)
             AS tau_milli
         FROM p GROUP BY 1"""
    // q276: float-vs-int8 top-10 set overlap per query — both rankings
    // on the shared quantized scores with vec_id tie-break.
    val rankStabilityOracle =
      s"""$qfScoredCtes,
         te AS (SELECT query_id, vec_id FROM scored
           QUALIFY row_number() OVER (PARTITION BY query_id
             ORDER BY eq DESC, vec_id ASC) <= 10),
         ta AS (SELECT query_id, vec_id FROM scored
           QUALIFY row_number() OVER (PARTITION BY query_id
             ORDER BY aq DESC, vec_id ASC) <= 10),
         j AS (SELECT coalesce(te.query_id, ta.query_id) AS query_id,
             CASE WHEN te.vec_id IS NOT NULL AND ta.vec_id IS NOT NULL
               THEN 1 ELSE 0 END AS b,
             CASE WHEN te.vec_id IS NOT NULL THEN 1 ELSE 0 END AS e,
             CASE WHEN ta.vec_id IS NOT NULL THEN 1 ELSE 0 END AS a
           FROM te FULL JOIN ta
             ON te.query_id = ta.query_id AND te.vec_id = ta.vec_id)
         SELECT query_id, CAST(sum(b) AS BIGINT) AS n_both,
           CAST((sum(b) * 1000000) // (sum(e) + sum(a) - sum(b))
             AS BIGINT) AS jaccard_ppm
         FROM j GROUP BY 1"""
    // q265: per-subspace PQ distortion — rides the q98 encode verbatim.
    val pqDistortionOracle =
      s"""WITH enc AS (
${base("q98_pq_encode")})
         SELECT sub, CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(dist_q) // count(*) AS BIGINT) AS mean_dist_q,
           CAST(max(dist_q) AS BIGINT) AS max_dist_q,
           CAST((sum(CASE WHEN dist_q = 0 THEN 1 ELSE 0 END) * 1000000)
             // count(*) AS BIGINT) AS zero_ppm
         FROM enc GROUP BY 1"""
    // q266: McNemar contingency — hash-margin filter vs stopword LF
    // against the length rule; chi² with continuity correction.
    val mcnemarOracle =
      """WITH s AS (SELECT
             (coalesce(list_sum(list_transform(string_split(text, ' '),
               t -> (CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) % 201)
                 - 100)), 0) > 0) AS a,
             (instr(lower(text), ' the ') > 0) AS b,
             (n_chars >= 200) AS y
           FROM documents),
         r AS (SELECT (a = y) AS a_right, (b = y) AS b_right FROM s),
         c AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN a_right AND b_right THEN 1 ELSE 0 END)
               AS BIGINT) AS n_both,
             CAST(sum(CASE WHEN a_right AND NOT b_right THEN 1 ELSE 0 END)
               AS BIGINT) AS n_a_only,
             CAST(sum(CASE WHEN NOT a_right AND b_right THEN 1 ELSE 0 END)
               AS BIGINT) AS n_b_only,
             CAST(sum(CASE WHEN NOT a_right AND NOT b_right
               THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
           FROM r)
         SELECT n, n_both, n_a_only, n_b_only, n_neither,
           CASE WHEN n_a_only + n_b_only > 0 THEN
             CAST(((CAST(abs(n_a_only - n_b_only) - 1 AS HUGEINT)
               * (abs(n_a_only - n_b_only) - 1)) * 1000)
               // (n_a_only + n_b_only) AS BIGINT)
           ELSE 0 END AS chi2_milli
         FROM c"""
    // q267: Murphy decomposition of the Brier score at forecast deciles;
    // per-bin floor divisions mirrored, one global ppm division each.
    val brierOracle =
      """WITH b0 AS (SELECT (n_chars * 1000000) // (n_chars + 500) AS p_ppm,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM documents),
         b1 AS (SELECT p_ppm, y, p_ppm // 100000 AS bin FROM b0),
         bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_k,
             sum(CAST(p_ppm AS HUGEINT)) AS a_k,
             CAST(sum(y) AS BIGINT) AS p_k,
             sum(CAST(p_ppm - y * 1000000 AS HUGEINT)
               * (p_ppm - y * 1000000)) AS sq_k
           FROM b1 GROUP BY 1),
         g AS (SELECT CAST(sum(n_k) AS HUGEINT) AS n,
             CAST(sum(p_k) AS HUGEINT) AS p FROM bins),
         t AS (SELECT g.n AS n, g.p AS p,
             sum(sq_k) AS bs,
             sum(((a_k - CAST(p_k AS HUGEINT) * 1000000)
               * (a_k - CAST(p_k AS HUGEINT) * 1000000)) // n_k) AS rel,
             sum(((p_k * 1000000 * g.n - g.p * 1000000 * n_k)
               * (p_k * 1000000 * g.n - g.p * 1000000 * n_k))
               // (CAST(n_k AS HUGEINT) * g.n * g.n)) AS res
           FROM bins, g GROUP BY g.n, g.p)
         SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(bs // (n * 1000000) AS BIGINT) AS brier_ppm,
           CAST(rel // (n * 1000000) AS BIGINT) AS rel_ppm,
           CAST(res // (n * 1000000) AS BIGINT) AS res_ppm,
           CAST((p * 1000000 * (n - p)) // (n * n) AS BIGINT) AS unc_ppm
         FROM t"""
    // q268: Welch PSD — integer mean of the q116 per-frame powers.
    val welchOracle =
      s"""WITH sp AS (
${base("q116_spectrogram")})
         SELECT user_id, bin, CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(qpower) // count(*) AS BIGINT) AS welch_qpower
         FROM sp GROUP BY 1, 2"""
    // q269: Hjorth activity/mobility/complexity on the 1e3 sample grid;
    // exact HUGEINT variance numerators, double ratios + sqrt at milli.
    val hjorthOracle =
      """WITH e AS (SELECT user_id, ts, event_id,
             CAST(floor(value * 1000 + 1.0/3) AS BIGINT) AS vq
           FROM events),
         d AS (SELECT user_id, ts, event_id, vq,
             vq - lag(vq) OVER w AS d1
           FROM e
           WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
         dd AS (SELECT user_id, vq, d1,
             d1 - lag(d1) OVER w AS d2
           FROM d
           WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
         m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n0,
             sum(CAST(vq AS HUGEINT)) AS s0,
             sum(CAST(vq AS HUGEINT) * vq) AS q0,
             CAST(count(d1) AS BIGINT) AS n1,
             sum(CAST(d1 AS HUGEINT)) AS s1,
             sum(CAST(d1 AS HUGEINT) * d1) AS q1,
             CAST(count(d2) AS BIGINT) AS n2,
             sum(CAST(d2 AS HUGEINT)) AS s2,
             sum(CAST(d2 AS HUGEINT) * d2) AS q2
           FROM dd GROUP BY 1 HAVING count(d2) >= 2),
         v AS (SELECT user_id, n0, n1, n2,
             CAST(n0 AS HUGEINT) * q0 - s0 * s0 AS v0,
             CAST(n1 AS HUGEINT) * q1 - s1 * s1 AS v1,
             CAST(n2 AS HUGEINT) * q2 - s2 * s2 AS v2
           FROM m)
         SELECT user_id, n0,
           CAST(v0 // (CAST(n0 AS HUGEINT) * n0) AS BIGINT) AS activity_q,
           CAST(floor(sqrt((CAST(v1 AS DOUBLE)
               * CAST(CAST(n0 AS HUGEINT) * n0 AS DOUBLE))
             / (CAST(v0 AS DOUBLE)
               * CAST(CAST(n1 AS HUGEINT) * n1 AS DOUBLE)))
             * 1000 + 1.0/3) AS BIGINT) AS mobility_milli,
           CAST(floor(sqrt(
             ((CAST(v2 AS DOUBLE)
               * CAST(CAST(n1 AS HUGEINT) * n1 AS DOUBLE))
              / (CAST(v1 AS DOUBLE)
               * CAST(CAST(n2 AS HUGEINT) * n2 AS DOUBLE)))
             / ((CAST(v1 AS DOUBLE)
               * CAST(CAST(n0 AS HUGEINT) * n0 AS DOUBLE))
              / (CAST(v0 AS DOUBLE)
               * CAST(CAST(n1 AS HUGEINT) * n1 AS DOUBLE))))
             * 1000 + 1.0/3) AS BIGINT) AS complexity_milli
         FROM v WHERE v0 > 0 AND v1 > 0"""
    // q270: per-node clustering coefficient on the q28 graph, decile
    // histogram; centers degree-capped at 64 exactly as Spark does.
    val localCcOracle =
      s"""WITH pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM (
${base("q28_simhash_pairs")})),
         s AS (SELECT doc_a AS u, doc_b AS v FROM pairs
           UNION ALL SELECT doc_b, doc_a FROM pairs),
         deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d
           FROM s GROUP BY 1),
         ctr AS (SELECT u, d FROM deg WHERE d >= 2 AND d <= 64),
         w AS (SELECT x.u AS u, x.v AS a, y.v AS c
           FROM s x JOIN s y ON x.u = y.u AND x.v < y.v
           JOIN ctr ON ctr.u = x.u),
         cl AS (SELECT w.u,
             CAST(sum(CASE WHEN p.doc_a IS NULL THEN 0 ELSE 1 END)
               AS BIGINT) AS t
           FROM w LEFT JOIN pairs p ON p.doc_a = w.a AND p.doc_b = w.c
           GROUP BY 1),
         cc AS (SELECT (coalesce(cl.t, 0) * 2000000)
             // (ctr.d * (ctr.d - 1)) AS cc_ppm
           FROM ctr LEFT JOIN cl ON cl.u = ctr.u)
         SELECT cc_ppm // 100000 AS bucket,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(cc_ppm) // count(*) AS BIGINT) AS mean_cc_ppm
         FROM cc GROUP BY 1"""
    // q271: Lo–MacKinlay VR(4) per user — q269's exact-variance recipe
    // with two lags, one fixed-order double chain to milli.
    val vrOracle =
      """WITH e AS (SELECT user_id, ts, event_id,
             CAST(floor(value * 1000 + 1.0/3) AS BIGINT) AS vq
           FROM events),
         d AS (SELECT user_id, vq,
             vq - lag(vq, 1) OVER w AS d1,
             vq - lag(vq, 4) OVER w AS d4
           FROM e
           WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
         m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n0,
             CAST(count(d1) AS BIGINT) AS n1,
             sum(CAST(d1 AS HUGEINT)) AS s1,
             sum(CAST(d1 AS HUGEINT) * d1) AS q1,
             CAST(count(d4) AS BIGINT) AS n4,
             sum(CAST(d4 AS HUGEINT)) AS s4,
             sum(CAST(d4 AS HUGEINT) * d4) AS q4
           FROM d GROUP BY 1 HAVING count(d4) >= 2),
         v AS (SELECT user_id, n0, n1, n4,
             CAST(n1 AS HUGEINT) * q1 - s1 * s1 AS v1,
             CAST(n4 AS HUGEINT) * q4 - s4 * s4 AS v4
           FROM m)
         SELECT user_id, n0,
           CAST(floor((CAST(v4 AS DOUBLE)
               * CAST(CAST(n1 AS HUGEINT) * n1 AS DOUBLE))
             / (CAST(v1 AS DOUBLE)
               * CAST(CAST(n4 AS HUGEINT) * n4 AS DOUBLE))
             / 4 * 1000 + 1.0/3) AS BIGINT) AS vr_milli
         FROM v WHERE v1 > 0"""
    // q272: Spiegelhalter calibration Z per source — exact decimal
    // moment terms, one double ratio + sqrt, milli floor of a double
    // (identical in both engines for negatives; no integer division).
    val spiegelhalterOracle =
      """WITH t AS (SELECT source,
             (n_chars * 1000000) // (n_chars + 500) AS p,
             CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS y
           FROM documents),
         s AS (SELECT source,
             (CAST(y AS HUGEINT) - p) * (1000000 - p * 2) AS num_t,
             (CAST(1000000 AS HUGEINT) - p * 2) * (1000000 - p * 2)
               * p * (1000000 - p) AS den_t
           FROM t)
         SELECT source, CAST(count(*) AS BIGINT) AS n,
           CAST(floor(CAST(sum(num_t) AS DOUBLE)
             / sqrt(CAST(sum(den_t) AS DOUBLE)) * 1000 + 1.0/3)
             AS BIGINT) AS z_milli
         FROM s GROUP BY 1 HAVING sum(den_t) > 0"""
    // q273: per-language vocabulary Gini on the (lang, tf) grid —
    // equal-frequency blocks contribute tf·c·(2·cumB + c − n) exactly.
    val vocabGiniOracle =
      """WITH tf AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS tf
           FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
                 FROM documents)
           WHERE tok <> '' GROUP BY 1, 2),
         grid AS (SELECT lang, tf, CAST(count(*) AS BIGINT) AS c
           FROM tf GROUP BY 1, 2),
         gx AS (SELECT lang, tf, c,
             coalesce(sum(c) OVER (PARTITION BY lang ORDER BY tf ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_b,
             sum(c) OVER (PARTITION BY lang) AS n,
             sum(CAST(tf AS HUGEINT) * c) OVER (PARTITION BY lang) AS tot
           FROM grid),
         agg AS (SELECT lang, max(n) AS n_types, max(tot) AS tot,
             sum(CAST(tf AS HUGEINT) * c * (cum_b * 2 + c - n)) AS num
           FROM gx GROUP BY 1)
         SELECT lang, CAST(n_types AS BIGINT) AS n_types,
           CAST((num * 1000000) // (CAST(n_types AS HUGEINT) * tot)
             AS BIGINT) AS gini_ppm
         FROM agg"""
    // q274: 5-point Savitzky–Golay on the UNNORMALIZED ×35 grid — the
    // /35 never happens, so everything is exact integers to one floor.
    val savgolOracle =
      """WITH e AS (SELECT user_id, ts, event_id,
             CAST(floor(value * 1000 + 1.0/3) AS BIGINT) AS vq
           FROM events),
         f AS (SELECT user_id, vq,
             lag(vq, 2) OVER w * -3 + lag(vq, 1) OVER w * 12 + vq * 17
               + lead(vq, 1) OVER w * 12 + lead(vq, 2) OVER w * -3 AS num
           FROM e
           WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
         g AS (SELECT user_id, num, vq * 35 - num AS r
           FROM f WHERE num IS NOT NULL)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_interior,
           CAST(sum(num) AS BIGINT) AS sm_sum,
           CAST(max(abs(num)) AS BIGINT) AS sm_abs_max,
           CAST((CAST(count(*) AS HUGEINT) * sum(CAST(r AS HUGEINT) * r)
             - sum(CAST(r AS HUGEINT)) * sum(CAST(r AS HUGEINT)))
             // (CAST(count(*) AS HUGEINT) * count(*)) AS BIGINT)
             AS resid_var_q
         FROM g GROUP BY 1 HAVING count(*) >= 2"""
    // q275: strict local maxima above mean + 2·sd, the sigma test
    // cross-multiplied and squared — no sqrt, no division, no float.
    val peaksOracle =
      """WITH e AS (SELECT user_id, ts, event_id,
             CAST(floor(value * 1000 + 1.0/3) AS BIGINT) AS vq
           FROM events),
         s AS (SELECT user_id, vq,
             row_number() OVER w AS rn,
             lag(vq, 1) OVER w AS prev,
             lead(vq, 1) OVER w AS next,
             CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
             sum(CAST(vq AS HUGEINT)) OVER (PARTITION BY user_id) AS s1,
             sum(CAST(vq AS HUGEINT) * vq) OVER (PARTITION BY user_id)
               AS s2
           FROM e
           WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
         p AS (SELECT user_id, n, rn, vq,
             CASE WHEN prev IS NOT NULL AND next IS NOT NULL
               AND vq > prev AND vq > next
               AND (CAST(n AS HUGEINT) * vq - s1) > 0
               AND (CAST(n AS HUGEINT) * vq - s1)
                 * (CAST(n AS HUGEINT) * vq - s1)
                 >= (CAST(n AS HUGEINT) * s2 - s1 * s1) * 4
               THEN 1 ELSE 0 END AS pk
           FROM s)
         SELECT user_id, max(n) AS n,
           CAST(sum(pk) AS BIGINT) AS n_peaks,
           CAST(coalesce(min(CASE WHEN pk = 1 THEN rn END), 0) AS BIGINT)
             AS first_peak_rn,
           CAST(coalesce(max(CASE WHEN pk = 1 THEN vq END), 0) AS BIGINT)
             AS max_peak_q
         FROM p GROUP BY 1"""
    // q277: DeLong AUC variance on the grouped score grid — exact
    // decimal deviation sums, one fixed-order double chain + sqrt.
    val aucCiOracle =
      """WITH g AS (SELECT source, n_chars,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
               AS BIGINT) AS p,
             CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END)
               AS BIGINT) AS q
           FROM documents GROUP BY 1, 2),
         r1 AS (SELECT source, n_chars, p, q,
             coalesce(sum(q) OVER (PARTITION BY source ORDER BY n_chars
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cq,
             coalesce(sum(p) OVER (PARTITION BY source
               ORDER BY n_chars DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cp_above
           FROM g),
         r2 AS (SELECT *,
             sum(p) OVER (PARTITION BY source) AS m,
             sum(q) OVER (PARTITION BY source) AS n,
             sum(p * cq * 2 + p * q) OVER (PARTITION BY source) AS num2
           FROM r1),
         t AS (SELECT source, m, n, num2,
             CAST(p AS HUGEINT)
               * ((CAST(cq AS HUGEINT) * 2 + q) * m - num2)
               * ((CAST(cq AS HUGEINT) * 2 + q) * m - num2) AS sa_t,
             CAST(q AS HUGEINT)
               * ((CAST(cp_above AS HUGEINT) * 2 + p) * n - num2)
               * ((CAST(cp_above AS HUGEINT) * 2 + p) * n - num2) AS sb_t
           FROM r2 WHERE m > 1 AND n > 1),
         a AS (SELECT source, m, n, num2,
             sum(sa_t) AS sa, sum(sb_t) AS sb
           FROM t GROUP BY 1, 2, 3, 4),
         f AS (SELECT source, m, n, num2,
             sqrt(CAST(sa AS DOUBLE)
               / (CAST(CAST(m AS HUGEINT) * (m - 1) AS DOUBLE)
                 * CAST((CAST(n AS HUGEINT) * m * 2)
                   * (CAST(n AS HUGEINT) * m * 2) AS DOUBLE))
             + CAST(sb AS DOUBLE)
               / (CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)
                 * CAST((CAST(n AS HUGEINT) * m * 2)
                   * (CAST(n AS HUGEINT) * m * 2) AS DOUBLE))) AS se
           FROM a),
         o AS (SELECT source,
             CAST(m AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg,
             CAST((CAST(num2 AS HUGEINT) * 1000000) // (2 * m * n)
               AS BIGINT) AS auc_ppm,
             CAST(floor(se * 1e6 + 1.0/3) AS BIGINT) AS se_ppm
           FROM f)
         SELECT source, n_pos, n_neg, auc_ppm, se_ppm,
           CAST(greatest(0, auc_ppm - (se_ppm * 1960) // 1000)
             AS BIGINT) AS lo_ppm,
           CAST(least(1000000, auc_ppm + (se_ppm * 1960) // 1000)
             AS BIGINT) AS hi_ppm
         FROM o"""
    // q278: Kendall's W over three rankers; exact global permutation
    // ranks with doc_id tie-break, doubled-deviation integer form.
    val kendallWOracle =
      """WITH base AS (SELECT doc_id, n_chars AS s1,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS s2,
             CAST(coalesce(list_sum(list_transform(string_split(text, ' '),
               t -> (CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) % 201)
                 - 100)), 0) AS BIGINT) AS s3
           FROM documents),
         r AS (SELECT doc_id,
             CAST(row_number() OVER (ORDER BY s1 ASC, doc_id ASC)
               + row_number() OVER (ORDER BY s2 ASC, doc_id ASC)
               + row_number() OVER (ORDER BY s3 ASC, doc_id ASC)
               AS BIGINT) AS rsum
           FROM base),
         n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM r),
         d AS (SELECT n1.n,
             (CAST(rsum AS HUGEINT) * 2 - 3 * (n1.n + 1))
               * (CAST(rsum AS HUGEINT) * 2 - 3 * (n1.n + 1)) AS d2
           FROM r, n1)
         SELECT n AS n_docs,
           CAST((sum(d2) * 1000000)
             // (CAST(n AS HUGEINT) * 3 * (n * n - 1)) AS BIGINT)
             AS w_ppm
         FROM d WHERE n > 1 GROUP BY 1"""
    // q279: dominant spectrogram bin per frame + hop census.
    val modeTrackOracle =
      s"""WITH sp AS (
${base("q116_spectrogram")}),
         dom AS (SELECT user_id, frame, bin AS dom_bin FROM sp
           QUALIFY row_number() OVER (PARTITION BY user_id, frame
             ORDER BY qpower DESC, bin ASC) = 1),
         h AS (SELECT user_id, frame, dom_bin,
             lag(dom_bin) OVER (PARTITION BY user_id ORDER BY frame ASC)
               AS prev
           FROM dom)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> dom_bin
             THEN 1 ELSE 0 END) AS BIGINT) AS n_hops,
           CAST(arg_min(dom_bin, frame) AS BIGINT) AS dom_first,
           CAST(arg_max(dom_bin, frame) AS BIGINT) AS dom_last
         FROM h GROUP BY 1"""
    // q280: R/S Hurst at sizes 8/16/32 — scaled integer partial-sum
    // deviations, per-block double ratio quantized BEFORE the mean,
    // q258-style quantized-ln OLS over the 3 points.
    val hurstOracle =
      """WITH e AS (SELECT user_id, ts, event_id,
             CAST(floor(value * 1000 + 1.0/3) AS BIGINT) AS vq
           FROM events),
         r AS (SELECT user_id, vq,
             CAST(row_number() OVER (PARTITION BY user_id
               ORDER BY ts ASC, event_id ASC) AS BIGINT) - 1 AS rn0
           FROM e),
         b AS (SELECT user_id, rn0, vq, CAST(s.s AS BIGINT) AS s,
             rn0 // s.s AS blk, rn0 % s.s + 1 AS k
           FROM r, (VALUES (8), (16), (32)) s(s) WHERE rn0 < 32),
         d AS (SELECT user_id, s, blk, vq, k,
             sum(vq) OVER (PARTITION BY user_id, s, blk ORDER BY rn0
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pk,
             sum(vq) OVER (PARTITION BY user_id, s, blk) AS s1
           FROM b),
         blocks AS (SELECT user_id, s, blk,
             CAST(count(*) AS BIGINT) AS n,
             max(s * pk - k * s1) - min(s * pk - k * s1) AS rng,
             CAST(s AS HUGEINT) * sum(CAST(vq AS HUGEINT) * vq)
               - sum(CAST(vq AS HUGEINT)) * sum(CAST(vq AS HUGEINT))
               AS vnum
           FROM d GROUP BY 1, 2, 3),
         rs AS (SELECT user_id, s,
             CAST(floor(CAST(rng AS DOUBLE) / sqrt(CAST(vnum AS DOUBLE))
               * 1000 + 1.0/3) AS BIGINT) AS rs_q
           FROM blocks WHERE n = s AND vnum > 0),
         bysize AS (SELECT user_id,
             CAST(floor(ln(CAST(s AS DOUBLE)) * 10000 + 1.0/3)
               AS BIGINT) AS xq,
             CAST(floor(ln(CAST(sum(rs_q) // count(*) AS DOUBLE))
               * 10000 + 1.0/3) AS BIGINT) AS yq
           FROM rs GROUP BY user_id, s
           HAVING count(*) = 32 // s AND sum(rs_q) > 0),
         ols AS (SELECT user_id, CAST(count(*) AS BIGINT) AS np,
             sum(CAST(xq AS HUGEINT)) AS sx,
             sum(CAST(yq AS HUGEINT)) AS sy,
             sum(CAST(xq AS HUGEINT) * yq) AS sxy,
             sum(CAST(xq AS HUGEINT) * xq) AS sxx
           FROM bysize GROUP BY 1 HAVING count(*) = 3)
         SELECT user_id,
           CAST(floor(CAST(CAST(np AS HUGEINT) * sxy - sx * sy AS DOUBLE)
             * 1000
             / CAST(CAST(np AS HUGEINT) * sxx - sx * sx AS DOUBLE)
             + 1.0/3) AS BIGINT) AS hurst_milli
         FROM ols"""
    // q281: Wald–Wolfowitz runs test — exact cross-multiplied
    // above-mean dichotomy, exact decimal z numerator, one sqrt.
    val runsOracle =
      """WITH e AS (SELECT user_id, ts, event_id,
             CAST(floor(value * 1000 + 1.0/3) AS BIGINT) AS vq
           FROM events),
         s AS (SELECT user_id, ts, event_id, vq,
             CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
             sum(CAST(vq AS HUGEINT)) OVER (PARTITION BY user_id) AS s1
           FROM e),
         bt AS (SELECT user_id, n, ts, event_id,
             CASE WHEN CAST(n AS HUGEINT) * vq > s1
               THEN 1 ELSE 0 END AS b
           FROM s),
         c AS (SELECT user_id, n, b,
             lag(b) OVER (PARTITION BY user_id
               ORDER BY ts ASC, event_id ASC) AS pb
           FROM bt),
         m AS (SELECT user_id, max(n) AS n,
             CAST(sum(b) AS BIGINT) AS n1,
             max(n) - CAST(sum(b) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN pb IS NOT NULL AND pb <> b
               THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_runs
           FROM c GROUP BY 1),
         v AS (SELECT user_id, n, n1, n2, n_runs,
             CAST(n AS HUGEINT) * (n_runs - 1)
               - CAST(n1 AS HUGEINT) * n2 * 2 AS num,
             (CAST(n1 AS HUGEINT) * n2 * 2)
               * (CAST(n1 AS HUGEINT) * n2 * 2 - n) AS vnum
           FROM m WHERE n1 > 0 AND n2 > 0)
         SELECT user_id, CAST(n AS BIGINT) AS n, n_runs,
           CAST(floor(CAST(num AS DOUBLE)
             / sqrt(CAST(vnum AS DOUBLE) / CAST(n - 1 AS DOUBLE))
             * 1000 + 1.0/3) AS BIGINT) AS z_milli
         FROM v WHERE vnum > 0"""
    // q282: pairwise channel cross-correlation at lags -2..2 — exact
    // decimal moments per (pair, lag), per-r quantize, integer argmax.
    val xcorrMatrixOracle =
      """WITH chans AS (SELECT DISTINCT user_id FROM events
           ORDER BY 1 LIMIT 8),
         e AS (SELECT ev.user_id, ev.ts, ev.event_id,
             CAST(floor(ev.value * 1000 + 1.0/3) AS BIGINT) AS vq
           FROM events ev JOIN chans USING (user_id)),
         s AS (SELECT user_id, vq,
             CAST(row_number() OVER (PARTITION BY user_id
               ORDER BY ts ASC, event_id ASC) AS BIGINT) AS k
           FROM e QUALIFY k <= 32),
         l AS (SELECT a.user_id AS user_a, b.user_id AS user_b,
             b.k - a.k AS lag, a.vq AS x, b.vq AS y
           FROM s a JOIN s b ON a.user_id < b.user_id
             AND b.k >= a.k - 2 AND b.k <= a.k + 2),
         m AS (SELECT user_a, user_b, lag,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy
           FROM l GROUP BY 1, 2, 3),
         r AS (SELECT user_a, user_b, lag,
             CAST(floor(CAST(CAST(n AS HUGEINT) * sxy - sx * sy
               AS DOUBLE) * 1000
               / sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
                 * CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE))
               + 1.0/3) AS BIGINT) AS r_milli
           FROM m
           WHERE CAST(n AS HUGEINT) * sxx - sx * sx > 0
             AND CAST(n AS HUGEINT) * syy - sy * sy > 0),
         best AS (SELECT user_a, user_b, lag, r_milli FROM r
           QUALIFY row_number() OVER (PARTITION BY user_a, user_b
             ORDER BY abs(r_milli) DESC, lag ASC) = 1),
         g AS (SELECT user_a, user_b,
             max(CASE WHEN lag = 0 THEN r_milli END) AS r0_milli
           FROM r GROUP BY 1, 2)
         SELECT g.user_a, g.user_b, g.r0_milli,
           CAST(b.lag AS BIGINT) AS best_lag,
           b.r_milli AS best_r_milli
         FROM g JOIN best b USING (user_a, user_b)"""
    // q283: hamming radius 0..3 census over the q201 aHash relation —
    // exact by the 4x16-bit band soundness argument.
    val phashRadiusOracle =
      s"""WITH pp AS (SELECT doc_a, doc_b, hamming FROM (
${base("q201_blob_phash")}) WHERE hamming <= 3),
         rr AS (SELECT CAST(r.r AS BIGINT) AS radius FROM range(4) r(r)),
         byr AS (SELECT rr.radius, pp.doc_a, pp.doc_b
           FROM rr LEFT JOIN pp ON pp.hamming <= rr.radius),
         census AS (SELECT radius, CAST(count(doc_a) AS BIGINT) AS n_pairs
           FROM byr GROUP BY 1),
         cov AS (SELECT radius, CAST(count(DISTINCT d) AS BIGINT) AS n_docs
           FROM (SELECT radius, unnest([doc_a, doc_b]) AS d
                 FROM byr WHERE doc_a IS NOT NULL)
           GROUP BY 1)
         SELECT census.radius, census.n_pairs,
           CAST(coalesce(cov.n_docs, 0) AS BIGINT) AS n_docs
         FROM census LEFT JOIN cov USING (radius)"""
    // q284: IVF-PQ ADC — q38's cell probe scoring q98's PQ codes via a
    // per-query 1e6-quantized cosine-ADC LUT (q_s·c_s and ‖c_s‖², same
    // left-to-right float order as the q98 encode), shortlist of 32 by
    // the double ratio, exact cosine rerank of the survivors only.
    val ivfPqAdcOracle =
      s"""WITH enc AS (
${base("q98_pq_encode")}),
         e AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
         n AS (SELECT vec_id, emb,
                 sqrt(list_reduce(list_transform(emb, x -> x*x),
                   (a,b)->a+b)) AS nrm
               FROM e),
         cent AS (SELECT vec_id AS cent_id, emb AS cemb, nrm AS cnrm
                  FROM n WHERE vec_id < 8),
         ranked AS (
           SELECT vec_id, cent_id,
                  row_number() OVER (PARTITION BY vec_id
                    ORDER BY ccos DESC, cent_id ASC) AS crk
           FROM (SELECT n.vec_id, c.cent_id,
                   list_reduce(list_transform(n.emb, (x,i) -> x * c.cemb[i]),
                     (a,b)->a+b) / (n.nrm*c.cnrm) AS ccos
                 FROM n, cent c)),
         assigned AS (SELECT vec_id, cent_id AS cell FROM ranked
                      WHERE crk = 1),
         probes AS (SELECT vec_id AS query_id, cent_id AS cell FROM ranked
                    WHERE crk <= 2 AND vec_id < 10),
         cb AS (SELECT vec_id AS code, emb AS cemb FROM e WHERE vec_id < 8),
         q AS (SELECT vec_id AS query_id, emb FROM e WHERE vec_id < 10),
         lut AS (
           SELECT q.query_id, s.s AS sub, cb.code,
             CAST(floor(list_reduce(list_transform(
                 q.emb[CAST(s.s*8+1 AS INT):CAST(s.s*8+8 AS INT)],
                 (x, i) -> x * cb.cemb[CAST(s.s*8 + i AS INT)]),
                 (a, b) -> a + b) * 1000000 + 1.0/3)
               AS BIGINT) AS ip_q,
             CAST(floor(list_reduce(list_transform(
                 cb.cemb[CAST(s.s*8+1 AS INT):CAST(s.s*8+8 AS INT)],
                 x -> x*x), (a, b) -> a + b) * 1000000 + 1.0/3)
               AS BIGINT) AS rn_q
           FROM q, range(8) s(s), cb),
         cand AS (SELECT p.query_id, a.vec_id
                  FROM probes p JOIN assigned a
                    ON a.cell = p.cell AND a.vec_id <> p.query_id),
         adc AS (SELECT c.query_id, c.vec_id,
                   CAST(sum(l.ip_q) AS DOUBLE)
                     / sqrt(CAST(sum(l.rn_q) AS DOUBLE)) AS adc_cos
                 FROM cand c JOIN enc t ON t.vec_id = c.vec_id
                      JOIN lut l ON l.query_id = c.query_id
                        AND l.sub = t.sub AND l.code = t.code
                 GROUP BY 1, 2),
         short AS (SELECT query_id, vec_id FROM adc
                   QUALIFY row_number() OVER (PARTITION BY query_id
                     ORDER BY adc_cos DESC, vec_id ASC) <= 32),
         rer AS (SELECT s.query_id, s.vec_id,
                   list_reduce(list_transform(qe.emb, (x,i) -> x * te.emb[i]),
                     (a,b)->a+b) / (qe.nrm*te.nrm) AS cos
                 FROM short s JOIN n qe ON qe.vec_id = s.query_id
                      JOIN n te ON te.vec_id = s.vec_id)
         SELECT query_id, rank, neighbor_id FROM (
           SELECT query_id, vec_id AS neighbor_id,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, vec_id ASC) AS rank
           FROM rer) WHERE rank <= 3"""
    // q285: Schank–Wagner sampled wedge closure — md5-deterministic
    // draws (center ∝ C(deg,2) via prefix-sum lookup, neighbor pair by
    // exact combinatorial unranking), K = 2000 closure probes.
    val wedgeSampleOracle =
      s"""WITH pairs AS MATERIALIZED (
${base("q28_simhash_pairs")}),
         s AS (SELECT doc_a AS u, doc_b AS v FROM pairs
               UNION ALL SELECT doc_b, doc_a FROM pairs),
         adj AS (SELECT u, v,
                   row_number() OVER (PARTITION BY u ORDER BY v) - 1 AS idx
                 FROM s),
         cw AS (SELECT u, count(*) AS d, (count(*)*(count(*)-1))//2 AS w
                FROM s GROUP BY 1 HAVING count(*) >= 2),
         cum AS (SELECT u, d, w,
                   coalesce(sum(w) OVER (ORDER BY u
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS cum_lo
                 FROM cw),
         tot AS (SELECT sum(w) AS wtot, count(*) AS n_centers FROM cw),
         probes AS (SELECT r.i AS i,
             CAST('0x' || substr(md5('ws:' || r.i), 1, 15) AS BIGINT)
               % (SELECT wtot FROM tot) AS pp
           FROM range(2000) r(i)),
         chosen0 AS (SELECT p.i, c.u, c.w,
             CAST('0x' || substr(md5('wp:' || p.i), 1, 15) AS BIGINT)
               % c.w AS m
           FROM probes p JOIN cum c
             ON p.pp >= c.cum_lo AND p.pp < c.cum_lo + c.w),
         unrk AS (SELECT i, u, m,
             CAST(floor((1.0 + sqrt(1.0 + 8.0 * CAST(m AS DOUBLE))) / 2)
               AS BIGINT) AS k0
           FROM chosen0),
         k1t AS (SELECT i, u, m,
             CASE WHEN (k0*(k0-1))//2 > m THEN k0-1 ELSE k0 END AS k1
           FROM unrk),
         jk AS (SELECT i, u, m - (kk*(kk-1))//2 AS jj, kk
           FROM (SELECT i, u, m,
                   CASE WHEN ((k1+1)*k1)//2 <= m THEN k1+1 ELSE k1 END AS kk
                 FROM k1t)),
         sampled AS (SELECT jk.i, least(a.v, c.v) AS lo,
                       greatest(a.v, c.v) AS hi
           FROM jk JOIN adj a ON a.u = jk.u AND a.idx = jk.jj
                JOIN adj c ON c.u = jk.u AND c.idx = jk.kk),
         cl AS (SELECT s2.i,
             CASE WHEN p.doc_a IS NOT NULL THEN 1 ELSE 0 END AS closed
           FROM sampled s2 LEFT JOIN pairs p
             ON p.doc_a = s2.lo AND p.doc_b = s2.hi)
         SELECT CAST((SELECT n_centers FROM tot) AS BIGINT) AS n_centers,
           CAST((SELECT wtot FROM tot) AS BIGINT) AS n_wedges,
           CAST(count(*) AS BIGINT) AS k_samples,
           CAST(sum(closed) AS BIGINT) AS n_closed,
           CAST((sum(closed) * 1000000) // count(*) AS BIGINT) AS est_ppm
         FROM cl"""
    // q286: embedding-cell JS per label pair — q38's pinned cell
    // assignment feeding q182's integer JS machinery on the
    // (label, cell) histogram.
    val cellLabelJsOracle =
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
         n AS (SELECT vec_id, label, emb,
                 sqrt(list_reduce(list_transform(emb, x -> x*x),
                   (a,b)->a+b)) AS nrm
               FROM e),
         cent AS (SELECT vec_id AS cent_id, emb AS cemb, nrm AS cnrm
                  FROM n WHERE vec_id < 8),
         ranked AS (
           SELECT vec_id, label, cent_id,
                  row_number() OVER (PARTITION BY vec_id
                    ORDER BY ccos DESC, cent_id ASC) AS crk
           FROM (SELECT n.vec_id, n.label, c.cent_id,
                   list_reduce(list_transform(n.emb, (x,i) -> x * c.cemb[i]),
                     (a,b)->a+b) / (n.nrm*c.cnrm) AS ccos
                 FROM n, cent c)),
         stc AS (SELECT label AS source, cent_id AS tok,
                   CAST(count(*) AS BIGINT) AS n
                 FROM ranked WHERE crk = 1 GROUP BY 1, 2),
         tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS nt
                 FROM stc GROUP BY 1),
         sh AS (SELECT a.source AS src_a, b.source AS src_b,
             ta.nt AS n_a, tb.nt AS n_b, a.n AS n_at, b.n AS n_bt
           FROM stc a JOIN stc b ON a.tok = b.tok AND a.source < b.source
           JOIN tot ta ON ta.source = a.source
           JOIN tot tb ON tb.source = b.source),
         agg AS (SELECT src_a, src_b, n_a, n_b,
             CAST(sum(n_at * CAST(floor(
               ln(CAST(2 * n_at * n_b AS DOUBLE)
                 / CAST(n_at * n_b + n_bt * n_a AS DOUBLE)) * 10000
               + 1.0/3) AS BIGINT)) AS BIGINT) AS sh_a_q,
             CAST(sum(n_bt * CAST(floor(
               ln(CAST(2 * n_bt * n_a AS DOUBLE)
                 / CAST(n_at * n_b + n_bt * n_a AS DOUBLE)) * 10000
               + 1.0/3) AS BIGINT)) AS BIGINT) AS sh_b_q,
             CAST(sum(n_at) AS BIGINT) AS m_a,
             CAST(sum(n_bt) AS BIGINT) AS m_b
           FROM sh GROUP BY 1, 2, 3, 4)
         SELECT src_a AS label_a, src_b AS label_b, n_a, n_b,
           (((sh_a_q + (n_a - m_a)
                * CAST(floor(ln(2) * 10000 + 1.0/3) AS BIGINT)) * n_b
             + (sh_b_q + (n_b - m_b)
                * CAST(floor(ln(2) * 10000 + 1.0/3) AS BIGINT)) * n_a)
            * 50) // (n_a * n_b) AS js_ppm
         FROM agg"""
    // q287: Benford first-digit χ² per event type — exact integer-cents
    // digits, shared 1e6-grid expected-mass literals, decimal-routed
    // squared terms.
    val benfordOracle =
      """WITH dg AS (SELECT event_type,
             CAST(substr(CAST(CAST(floor(abs(value)*100) AS BIGINT)
               AS VARCHAR), 1, 1) AS BIGINT) AS d
           FROM events
           WHERE CAST(floor(abs(value)*100) AS BIGINT) >= 1),
         o AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS o
               FROM dg GROUP BY 1, 2),
         nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
                FROM dg GROUP BY 1),
         grid AS (SELECT nn.event_type, nn.n, r.r + 1 AS d,
             ([301030, 176091, 124939, 96910, 79181, 66947, 57992,
               51152, 45757])[CAST(r.r + 1 AS INT)] AS p
           FROM nn, range(9) r(r)),
         t AS (SELECT g.event_type, g.n,
             ((CAST(coalesce(o.o, 0) AS HUGEINT) * 1000000
                - CAST(g.n AS HUGEINT) * g.p)
              * (CAST(coalesce(o.o, 0) AS HUGEINT) * 1000000
                - CAST(g.n AS HUGEINT) * g.p) * 1000)
             // (CAST(g.n AS HUGEINT) * g.p * 1000000) AS term
           FROM grid g LEFT JOIN o
             ON o.event_type = g.event_type AND o.d = g.d)
         SELECT event_type, n, CAST(sum(term) AS BIGINT) AS chi2_milli,
           CAST(sum(term) AS BIGINT) <= 15507 AS benford_ok
         FROM t GROUP BY 1, 2"""
    // q288: Poisson-bootstrap CI — per-row md5 Poisson(1) multiplicities
    // (tail truncated at 5), 200 replicate means on the exact ppm grid,
    // (5th smallest, 5th largest) order statistics.
    val bootstrapCiOracle =
      """WITH d AS (SELECT source, doc_id, n_chars FROM documents),
         rows_ AS (SELECT d.source, d.n_chars,
             b.b AS b,
             CAST('0x' || substr(md5(d.doc_id || ':' || b.b), 1, 15)
               AS BIGINT) % 1000000 AS u
           FROM d, range(200) b(b)),
         w AS (SELECT source, b, n_chars,
             CASE WHEN u < 367879 THEN 0 WHEN u < 735758 THEN 1
                  WHEN u < 919698 THEN 2 WHEN u < 981011 THEN 3
                  WHEN u < 996340 THEN 4 ELSE 5 END AS w
           FROM rows_),
         means AS (SELECT source, b,
             (sum(w * n_chars) * 1000000) // sum(w) AS m_ppm
           FROM w GROUP BY 1, 2 HAVING sum(w) > 0),
         rk AS (SELECT source, m_ppm,
             row_number() OVER (PARTITION BY source
               ORDER BY m_ppm ASC, b ASC) AS ra,
             row_number() OVER (PARTITION BY source
               ORDER BY m_ppm DESC, b DESC) AS rd
           FROM means),
         ci AS (SELECT source, CAST(count(*) AS BIGINT) AS n_reps,
             CAST(max(CASE WHEN ra = 5 THEN m_ppm END) AS BIGINT) AS lo_ppm,
             CAST(max(CASE WHEN rd = 5 THEN m_ppm END) AS BIGINT) AS hi_ppm
           FROM rk GROUP BY 1),
         pt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST((sum(n_chars) * 1000000) // count(*) AS BIGINT) AS mean_ppm
           FROM d GROUP BY 1)
         SELECT pt.source, pt.n_docs, pt.mean_ppm, ci.n_reps,
           ci.lo_ppm, ci.hi_ppm
         FROM pt JOIN ci ON ci.source = pt.source"""
    // q289: per-doc bigram cross-entropy under the corpus bigram LM —
    // ln quantized per bigram TYPE at 1e4, exact long sums per doc.
    val docCeOracle =
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                  generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents),
         p AS (SELECT a.doc_id, a.tok AS w1, b.tok AS w2
               FROM tok a JOIN tok b
                 ON a.doc_id = b.doc_id AND b.i = a.i + 1),
         c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
                 FROM p GROUP BY 1, 2),
         c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
                FROM p GROUP BY 1),
         terms AS (SELECT w1, w2,
             CAST(floor(ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))
               * 10000 + 1.0/3) AS BIGINT) AS lnq
           FROM c12 JOIN c1 USING (w1)),
         s AS (SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(t.lnq) AS BIGINT) AS s
           FROM p JOIN terms t ON t.w1 = p.w1 AND t.w2 = p.w2
           GROUP BY 1)
         SELECT doc_id, n_bigrams,
           CAST((-s) // n_bigrams AS BIGINT) AS ce_e4
         FROM s"""
    // q290: ADC recall audit — q284's pipeline joined against the q29
    // brute truth, per-query hit census.
    val adcRecallOracle =
      s"""WITH adc AS (
$ivfPqAdcOracle),
         brute AS (
${base("q29_ann_brute")}),
         b3 AS (SELECT query_id, neighbor_id FROM brute WHERE rank <= 3),
         j AS (SELECT b3.query_id,
             CASE WHEN adc.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
           FROM b3 LEFT JOIN adc
             ON adc.query_id = b3.query_id
               AND adc.neighbor_id = b3.neighbor_id)
         SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth,
           CAST(sum(hit) AS BIGINT) AS n_hits,
           CAST((sum(hit) * 1000000) // count(*) AS BIGINT) AS recall_ppm
         FROM j GROUP BY 1"""
    // q291: cross-source 8-gram contamination — distinct doc×source
    // shingle hits over the full ordered source-pair grid.
    val ngramContamOracle =
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
                    FROM documents),
         tk AS (SELECT doc_id, source, toks,
             generate_subscripts(toks, 1) AS i
           FROM t),
         sh AS (SELECT DISTINCT doc_id, source,
             array_to_string(toks[CAST(i AS INT):CAST(i+7 AS INT)],
               ' ') AS sh
           FROM tk WHERE i + 7 <= len(toks)),
         ss AS (SELECT DISTINCT source AS src_b, sh FROM sh),
         hits AS (SELECT DISTINCT sh.source AS src_a, ss.src_b, sh.doc_id
           FROM sh JOIN ss ON ss.sh = sh.sh AND ss.src_b <> sh.source),
         per AS (SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_contam
                 FROM hits GROUP BY 1, 2),
         tot AS (SELECT source AS src_a, CAST(count(*) AS BIGINT) AS n_docs_a
                 FROM documents GROUP BY 1),
         grid AS (SELECT a.src_a, b.src_a AS src_b, a.n_docs_a
                  FROM tot a JOIN tot b ON a.src_a <> b.src_a)
         SELECT g.src_a, g.src_b, g.n_docs_a,
           CAST(coalesce(per.n_contam, 0) AS BIGINT) AS n_contam,
           CAST((coalesce(per.n_contam, 0) * 1000000) // g.n_docs_a
             AS BIGINT) AS contam_ppm
         FROM grid g LEFT JOIN per
           ON per.src_a = g.src_a AND per.src_b = g.src_b"""
    // q292: deterministic HyperLogLog (m=256) vs exact distinct —
    // integer bit-length ranks, exact long harmonic sum, one shared
    // double literal chain.
    val hllOracle =
      """WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
         h AS (SELECT lang,
             CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
           FROM t),
         r AS (SELECT lang, h % 256 AS b,
             CASE WHEN h // 256 = 0 THEN 53
                  ELSE 53 - length(bin(h // 256)) END AS rho
           FROM h),
         regs AS (SELECT lang, b, CAST(max(rho) AS BIGINT) AS m
                  FROM r GROUP BY 1, 2),
         s AS (SELECT lang,
             CAST(sum(CAST(1 AS BIGINT) << CAST(53 - m AS INT)) AS BIGINT)
               + (256 - count(*)) * 9007199254740992 AS s,
             256 - CAST(count(*) AS BIGINT) AS v
           FROM regs GROUP BY 1),
         ex AS (SELECT lang, CAST(count(DISTINCT tok) AS BIGINT)
               AS exact_distinct
           FROM t GROUP BY 1),
         est AS (SELECT s.lang, ex.exact_distinct, s.v,
             CAST(floor(((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
               * 9007199254740992.0) / CAST(s.s AS DOUBLE)) AS BIGINT)
               AS raw
           FROM s JOIN ex ON ex.lang = s.lang)
         SELECT lang, exact_distinct,
           CASE WHEN v > 0 AND raw < 640
             THEN CAST(floor(256.0 * ln(256.0 / CAST(v AS DOUBLE))
               + 1.0/3) AS BIGINT)
             ELSE raw END AS hll_est,
           CAST((abs((CASE WHEN v > 0 AND raw < 640
             THEN CAST(floor(256.0 * ln(256.0 / CAST(v AS DOUBLE))
               + 1.0/3) AS BIGINT)
             ELSE raw END) - exact_distinct) * 1000000) // exact_distinct
             AS BIGINT) AS err_ppm
         FROM est"""
    // q293: per-blob byte-histogram entropy — c·lnq(c/n) exact long
    // sums on the 1e4 ln grid.
    val blobEntropyOracle =
      """WITH c AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
                    FROM documents),
         cnt AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS k
                 FROM c GROUP BY 1, 2),
         n AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n
               FROM cnt GROUP BY 1),
         t AS (SELECT cnt.doc_id, n.n,
             cnt.k * CAST(floor(ln(CAST(cnt.k AS DOUBLE)
               / CAST(n.n AS DOUBLE)) * 10000 + 1.0/3) AS BIGINT) AS t
           FROM cnt JOIN n ON n.doc_id = cnt.doc_id)
         SELECT doc_id, n AS n_bytes,
           CAST((-sum(t)) // n AS BIGINT) AS ent_e4
         FROM t GROUP BY 1, 2"""
    // q294: silhouette of the coarse cell assignment on the pinned
    // 60-vector audit panel — quantized cosine distances, trunc-div
    // means, +max shift for the one signed division.
    val cellSilhouetteOracle =
      """WITH e AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings WHERE vec_id < 60),
         n AS (SELECT vec_id, emb,
                 sqrt(list_reduce(list_transform(emb, x -> x*x),
                   (a,b)->a+b)) AS nrm
               FROM e),
         cent AS (SELECT vec_id AS cent_id, emb AS cemb, nrm AS cnrm
                  FROM n WHERE vec_id < 8),
         assigned AS (
           SELECT vec_id, emb, nrm, cent_id AS cell FROM (
             SELECT n.vec_id, n.emb, n.nrm, c.cent_id,
                    row_number() OVER (PARTITION BY n.vec_id
                      ORDER BY list_reduce(list_transform(n.emb,
                          (x,i) -> x * c.cemb[i]), (a,b)->a+b)
                        / (n.nrm*c.cnrm) DESC, c.cent_id ASC) AS crk
             FROM n, cent c) WHERE crk = 1),
         pairs AS (SELECT x.vec_id, x.cell, y.cell AS ocell,
             1000000 - CAST(floor(list_reduce(list_transform(x.emb,
                 (v,i) -> v * y.emb[i]), (a,b)->a+b)
               / (x.nrm*y.nrm) * 1000000 + 1.0/3) AS BIGINT) AS dq
           FROM assigned x JOIN assigned y ON x.vec_id <> y.vec_id),
         bycell AS (SELECT vec_id, cell, ocell,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(dq) AS BIGINT) AS sd
           FROM pairs GROUP BY 1, 2, 3),
         a AS (SELECT vec_id, cell, sd // cnt AS a_q
               FROM bycell WHERE ocell = cell),
         b AS (SELECT vec_id, min(sd // cnt) AS b_q
               FROM bycell WHERE ocell <> cell GROUP BY 1)
         SELECT a.vec_id, a.cell, CAST(a.a_q AS BIGINT) AS a_q,
           CAST(b.b_q AS BIGINT) AS b_q,
           CAST(((b.b_q - a.a_q + greatest(a.a_q, b.b_q)) * 1000)
             // greatest(a.a_q, b.b_q) - 1000 AS BIGINT) AS sil_milli
         FROM a JOIN b ON b.vec_id = a.vec_id
         WHERE greatest(a.a_q, b.b_q) > 0"""
    // q295: weekly retention cohorts — exact epoch-ms week grid,
    // distinct (user, week) relation, trunc-div retention.
    val retentionOracle =
      """WITH w AS (SELECT DISTINCT user_id,
             CAST(epoch_ms(ts) AS BIGINT) // 604800000 AS wk
           FROM events),
         f AS (SELECT user_id, CAST(min(wk) AS BIGINT) AS cohort
               FROM w GROUP BY 1),
         sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_cohort
                FROM f GROUP BY 1),
         act AS (SELECT f.cohort, w.wk - f.cohort AS offset,
             CAST(count(*) AS BIGINT) AS n_active
           FROM w JOIN f ON f.user_id = w.user_id
           GROUP BY 1, 2)
         SELECT act.cohort, CAST(act.offset AS BIGINT) AS offset,
           sz.n_cohort, act.n_active,
           CAST((act.n_active * 1000000) // sz.n_cohort AS BIGINT)
             AS retained_ppm
         FROM act JOIN sz ON sz.cohort = act.cohort"""
    // q296: Goh–Barabási inter-arrival burstiness per user — exact
    // decimal moments, one double chain + sqrt, milli floor.
    val interarrivalBOracle =
      """WITH g AS (SELECT user_id,
             CAST(epoch_ms(ts) AS BIGINT)
               - lag(CAST(epoch_ms(ts) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
               AS g
           FROM events),
         m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(g AS HUGEINT)) AS sg,
             sum(CAST(g AS HUGEINT) * g) AS sg2
           FROM g WHERE g IS NOT NULL GROUP BY 1
           HAVING count(*) >= 2 AND sum(g) > 0)
         SELECT user_id, n AS n_gaps,
           CAST(sg // n AS BIGINT) AS mean_gap_ms,
           CAST(floor(
             (sqrt(CAST(sg2 * n - sg * sg AS DOUBLE)) - CAST(sg AS DOUBLE))
             / (sqrt(CAST(sg2 * n - sg * sg AS DOUBLE)) + CAST(sg AS DOUBLE))
             * 1000 + 1.0/3) AS BIGINT) AS b_milli
         FROM m"""
    // q297: PQ code usage per subspace — q293's entropy discipline on
    // the (sub, code) histogram over the q98 encode.
    val codeUsageOracle =
      s"""WITH enc AS (
${base("q98_pq_encode")}),
         cnt AS (SELECT sub, code, CAST(count(*) AS BIGINT) AS k
                 FROM enc GROUP BY 1, 2),
         nn AS (SELECT sub, CAST(sum(k) AS BIGINT) AS n
                FROM cnt GROUP BY 1),
         t AS (SELECT cnt.sub, nn.n, cnt.k,
             cnt.k * CAST(floor(ln(CAST(cnt.k AS DOUBLE)
               / CAST(nn.n AS DOUBLE)) * 10000 + 1.0/3) AS BIGINT) AS t
           FROM cnt JOIN nn ON nn.sub = cnt.sub)
         SELECT sub, CAST(count(*) AS BIGINT) AS n_codes_used,
           CAST((-sum(t)) // n AS BIGINT) AS usage_ent_e4,
           CAST((max(k) * 1000000) // n AS BIGINT) AS top_code_share_ppm
         FROM t GROUP BY sub, n"""
    // q300: parametric OPQ by variance-balanced dimension permutation —
    // q92-grid moments rank the dims, a snake draft assigns them to
    // subspaces, both layouts re-encode on q98's float discipline
    // (permuted gather order pinned by list(vi ORDER BY pos)), and the
    // q297/q265 stats ride their exact-long paths per variant.
    val opqOracle =
      s"""WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
           FROM embeddings),
         x AS (SELECT vec_id, generate_subscripts(emb, 1) - 1 AS i,
                 unnest(emb) AS vi
               FROM e),
         mom AS (SELECT i,
             CAST(sum(CAST(floor(vi * vi * 1000000 + 1.0/3) AS BIGINT))
               AS BIGINT) AS mm
           FROM x GROUP BY 1),
         rnk AS (SELECT i AS dim,
             row_number() OVER (ORDER BY mm DESC, i ASC) - 1 AS r
           FROM mom),
         asg AS (SELECT dim, r // 8 AS pos,
             CASE WHEN (r // 8) % 2 = 0 THEN r % 8 ELSE 7 - (r % 8) END AS sub
           FROM rnk),
         pv AS (SELECT x.vec_id, asg.sub, list(x.vi ORDER BY asg.pos) AS sl
               FROM x JOIN asg ON asg.dim = x.i
               GROUP BY 1, 2),
         cbp AS (SELECT vec_id AS code, sub, sl AS csl FROM pv WHERE vec_id < 8),
         sdp AS (SELECT pv.vec_id, pv.sub, cbp.code,
             (list_reduce(list_transform(pv.sl, x -> x*x), (a, b) -> a + b)
              - 2.0 * list_reduce(list_transform(pv.sl,
                  (x, i) -> x * cbp.csl[i]), (a, b) -> a + b))
             + list_reduce(list_transform(cbp.csl, x -> x*x),
                 (a, b) -> a + b) AS dist
           FROM pv JOIN cbp USING (sub)),
         rp AS (SELECT vec_id, sub, code, dist,
                 row_number() OVER (PARTITION BY vec_id, sub
                   ORDER BY dist ASC, code ASC) AS rk
               FROM sdp),
         encp AS (SELECT vec_id, CAST(sub AS BIGINT) AS sub,
             CAST(code AS BIGINT) AS code,
             CAST(floor(dist * 1000000 + 1.0/3) AS BIGINT) AS dist_q
           FROM rp WHERE rk = 1),
         encb AS (
${base("q98_pq_encode")}),
         allenc AS (SELECT 'base' AS variant, vec_id, sub, code, dist_q FROM encb
                    UNION ALL
                    SELECT 'opq', vec_id, sub, code, dist_q FROM encp),
         cnt AS (SELECT variant, sub, code, CAST(count(*) AS BIGINT) AS k
                 FROM allenc GROUP BY 1, 2, 3),
         nn AS (SELECT variant, sub, CAST(sum(k) AS BIGINT) AS n
                FROM cnt GROUP BY 1, 2),
         t AS (SELECT cnt.variant, cnt.sub, nn.n, cnt.k,
             cnt.k * CAST(floor(ln(CAST(cnt.k AS DOUBLE)
               / CAST(nn.n AS DOUBLE)) * 10000 + 1.0/3) AS BIGINT) AS t
           FROM cnt JOIN nn ON nn.variant = cnt.variant AND nn.sub = cnt.sub),
         ent AS (SELECT variant, sub, n,
             CAST(count(*) AS BIGINT) AS n_codes_used,
             CAST((-sum(t)) // n AS BIGINT) AS usage_ent_e4
           FROM t GROUP BY variant, sub, n),
         dst AS (SELECT variant, sub, CAST(count(*) AS BIGINT) AS n_vecs,
             CAST(sum(dist_q) // count(*) AS BIGINT) AS mean_dist_q
           FROM allenc GROUP BY 1, 2)
         SELECT ent.variant, ent.sub, dst.n_vecs, ent.n_codes_used,
           ent.usage_ent_e4, dst.mean_dist_q
         FROM ent JOIN dst ON dst.variant = ent.variant AND dst.sub = ent.sub"""
    // q301: unigram-LM Viterbi-EM round — candidate substring pieces
    // scored by quantized log-frequency, the 8-position max-score DP and
    // the 8-step backtrack unrolled as CTEs (the q254/q99 recipe), then
    // the M-step recount. Tie-breaks: (score desc, piece-length asc) in
    // the DP, (count desc, piece asc) in the report.
    val unigramCtes: String = {
      val dpCtes = (1 to 8).map { i =>
        val branches = (1 to math.min(4, i)).map { l =>
          s"""SELECT wl.w, dp${i - l}.sc + sc.sq AS nsc, $l AS l
             FROM wl JOIN dp${i - l} ON dp${i - l}.w = wl.w
             JOIN sc ON sc.piece = substr(wl.w, ${i - l + 1}, $l)
             WHERE wl.len >= $i"""
        }.mkString("\nUNION ALL\n")
        s"""dp$i AS MATERIALIZED (
           SELECT w, nsc AS sc, l AS bl FROM (
             SELECT w, nsc, l, row_number() OVER (PARTITION BY w
               ORDER BY nsc DESC, l ASC) AS rk
             FROM ($branches) br) rkd WHERE rk = 1)"""
      }.mkString(",\n")
      val dpAll = (1 to 8).map(i =>
        s"SELECT w, $i AS pos, bl FROM dp$i").mkString("\nUNION ALL\n")
      val walkCtes = (1 to 8).map { k =>
        s"""em$k AS MATERIALIZED (
             SELECT b.w, substr(b.w, CAST(d.pos - d.bl + 1 AS INT),
               CAST(d.bl AS INT)) AS piece, d.pos - d.bl AS npos
             FROM bw${k - 1} b JOIN dpall d ON d.w = b.w AND d.pos = b.pos
             WHERE b.pos > 0),
           bw$k AS (SELECT w, npos AS pos FROM em$k)"""
      }.mkString(",\n")
      val emAll = (1 to 8).map(k => s"SELECT w, piece FROM em$k")
        .mkString("\nUNION ALL\n")
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok
             FROM documents),
         wv AS (SELECT substr(tok, 1, 8) AS w,
             CAST(count(*) AS BIGINT) AS freq
           FROM tok WHERE length(tok) > 0 GROUP BY 1),
         wl AS MATERIALIZED (SELECT w, freq, length(w) AS len FROM wv),
         occ AS (SELECT substr(wl.w, CAST(i.i AS INT), CAST(l.l AS INT)) AS piece,
             wl.freq
           FROM wl, range(1, 9) i(i), range(1, 5) l(l)
           WHERE i.i + l.l - 1 <= wl.len),
         kept AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
           FROM occ GROUP BY 1
           HAVING sum(freq) >= 5 OR length(piece) = 1),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM kept),
         sc AS MATERIALIZED (SELECT piece,
             CAST(floor(ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
               * 1000000 + 1.0/3) AS BIGINT) AS sq
           FROM kept, tot),
         dp0 AS (SELECT w, CAST(0 AS BIGINT) AS sc FROM wl),
         $dpCtes,
         dpall AS MATERIALIZED (
$dpAll),
         bw0 AS (SELECT w, len AS pos FROM wl),
         $walkCtes,
         emall AS (
$emAll)"""
    }
    val unigramOracle: String =
      s"""$unigramCtes,
         emc AS (SELECT piece, CAST(sum(wl.freq) AS BIGINT) AS em_count
           FROM emall JOIN wl USING (w) GROUP BY 1),
         top AS (SELECT piece, em_count,
             row_number() OVER (ORDER BY em_count DESC, piece ASC) AS r
           FROM emc)
         SELECT piece, em_count, CAST(r AS BIGINT) AS vit_rank
         FROM top WHERE r <= 50"""
    // q303: compression rate of the q301 segmentation — same CTE body,
    // per-word piece counts folded into one frequency-weighted row.
    val unigramCompressionOracle: String =
      s"""$unigramCtes,
         perw AS (SELECT w, CAST(count(*) AS BIGINT) AS np
           FROM emall GROUP BY 1),
         agg AS (SELECT CAST(count(*) AS BIGINT) AS n_word_types,
             CAST(sum(wl.freq) AS BIGINT) AS n_tokens,
             CAST(sum(wl.freq * wl.len) AS BIGINT) AS n_chars,
             CAST(sum(wl.freq * perw.np) AS BIGINT) AS n_pieces
           FROM perw JOIN wl USING (w))
         SELECT n_word_types, n_tokens, n_chars, n_pieces,
           CAST((n_pieces * 1000) // n_tokens AS BIGINT)
             AS pieces_per_kilotok,
           CAST((n_chars * 1000000) // n_pieces AS BIGINT)
             AS chars_per_piece_ppm
         FROM agg"""
    // q302: HLL sketch-algebra Jaccard between sources vs the exact
    // vocabulary Jaccard — q292's register/estimate formulas keyed by
    // source, union = per-bucket MAX of the two sources' registers.
    val sketchJaccardOracle =
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
             FROM documents),
         h AS (SELECT source,
             CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM t),
         r AS (SELECT source, h % 256 AS b,
             CASE WHEN h // 256 = 0 THEN 53
                  ELSE 53 - length(bin(h // 256)) END AS rho
           FROM h),
         regs AS (SELECT source, b, CAST(max(rho) AS BIGINT) AS m
                  FROM r GROUP BY 1, 2),
         est1 AS (SELECT source,
             CASE WHEN v > 0 AND raw < 640
               THEN CAST(floor(256.0 * ln(256.0 / CAST(v AS DOUBLE))
                 + 1.0/3) AS BIGINT)
               ELSE raw END AS hll_est
           FROM (SELECT source,
               CAST(floor(((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
                 * 9007199254740992.0) / CAST(s AS DOUBLE)) AS BIGINT) AS raw,
               v
             FROM (SELECT source,
                 CAST(sum(CAST(1 AS BIGINT) << CAST(53 - m AS INT))
                   AS BIGINT) + (256 - count(*)) * 9007199254740992 AS s,
                 256 - CAST(count(*) AS BIGINT) AS v
               FROM regs GROUP BY 1) s0) e0),
         prs AS (SELECT a.source AS src_a, b.source AS src_b
           FROM (SELECT DISTINCT source FROM regs) a,
                (SELECT DISTINCT source FROM regs) b
           WHERE a.source < b.source),
         mreg AS (SELECT prs.src_a, prs.src_b, regs.b,
             CAST(max(regs.m) AS BIGINT) AS m
           FROM prs JOIN regs
             ON regs.source = prs.src_a OR regs.source = prs.src_b
           GROUP BY 1, 2, 3),
         estu AS (SELECT src_a, src_b,
             CASE WHEN v > 0 AND raw < 640
               THEN CAST(floor(256.0 * ln(256.0 / CAST(v AS DOUBLE))
                 + 1.0/3) AS BIGINT)
               ELSE raw END AS hll_union
           FROM (SELECT src_a, src_b,
               CAST(floor(((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
                 * 9007199254740992.0) / CAST(s AS DOUBLE)) AS BIGINT) AS raw,
               v
             FROM (SELECT src_a, src_b,
                 CAST(sum(CAST(1 AS BIGINT) << CAST(53 - m AS INT))
                   AS BIGINT) + (256 - count(*)) * 9007199254740992 AS s,
                 256 - CAST(count(*) AS BIGINT) AS v
               FROM mreg GROUP BY 1, 2) s1) e1),
         tsrc AS (SELECT DISTINCT source AS src, tok FROM t),
         ns AS (SELECT src, CAST(count(*) AS BIGINT) AS n
                FROM tsrc GROUP BY 1),
         inter AS (SELECT x.src AS src_a, y.src AS src_b,
             CAST(count(*) AS BIGINT) AS n_inter
           FROM tsrc x JOIN tsrc y ON x.tok = y.tok AND x.src < y.src
           GROUP BY 1, 2)
         SELECT prs.src_a, prs.src_b, na.n AS n_a, nb.n AS n_b,
           CAST(COALESCE(inter.n_inter, 0) AS BIGINT) AS n_inter,
           CAST((COALESCE(inter.n_inter, 0) * 1000000)
             // (na.n + nb.n - COALESCE(inter.n_inter, 0)) AS BIGINT)
             AS exact_jaccard_ppm,
           ea.hll_est AS hll_a, eb.hll_est AS hll_b, estu.hll_union,
           CAST((greatest(0, ea.hll_est + eb.hll_est - estu.hll_union)
             * 1000000) // estu.hll_union AS BIGINT) AS sketch_jaccard_ppm
         FROM prs
         LEFT JOIN inter ON inter.src_a = prs.src_a AND inter.src_b = prs.src_b
         JOIN ns na ON na.src = prs.src_a
         JOIN ns nb ON nb.src = prs.src_b
         JOIN est1 ea ON ea.source = prs.src_a
         JOIN est1 eb ON eb.source = prs.src_b
         JOIN estu ON estu.src_a = prs.src_a AND estu.src_b = prs.src_b"""
    // q304: IVF recall-vs-nprobe tuning curve — shared cell ranking +
    // brute truth CTEs, one probe/score/top-3/recall block per sweep
    // point, unioned.
    val probeSweepOracle: String = {
      val sweep = Seq(1, 2, 4).map { np =>
        s"""SELECT CAST($np AS BIGINT) AS nprobe,
             CAST(count(*) AS BIGINT) AS n_truth,
             CAST(sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hits,
             CAST((sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
               * 1000000) // count(*) AS BIGINT) AS recall_ppm
           FROM truth t LEFT JOIN (
             SELECT query_id, neighbor_id FROM (
               SELECT p.query_id, a.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY p.query_id
                   ORDER BY list_reduce(list_transform(q.emb,
                       (x, i) -> x * c.emb[i]), (a2, b2) -> a2 + b2)
                     / (q.nrm * c.nrm) DESC, a.vec_id ASC) AS rank
               FROM (SELECT vec_id AS query_id, cent_id AS cell FROM ranked
                     WHERE crk <= $np AND vec_id < 10) p
               JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
               JOIN n q ON q.vec_id = p.query_id
               JOIN n c ON c.vec_id = a.vec_id) rk
             WHERE rank <= 3) s
           ON s.query_id = t.query_id AND s.neighbor_id = t.neighbor_id"""
      }.mkString("\nUNION ALL\n")
      s"""WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
           FROM embeddings),
         n AS (SELECT vec_id, emb,
             sqrt(list_reduce(list_transform(emb, x -> x*x),
               (a, b) -> a + b)) AS nrm
           FROM e),
         cent AS (SELECT vec_id AS cent_id, emb AS cemb, nrm AS cnrm
                  FROM n WHERE vec_id < 8),
         ranked AS MATERIALIZED (
           SELECT vec_id, cent_id, ccos,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY ccos DESC, cent_id ASC) AS crk
           FROM (SELECT n.vec_id, c.cent_id,
               list_reduce(list_transform(n.emb, (x, i) -> x * c.cemb[i]),
                 (a, b) -> a + b) / (n.nrm * c.cnrm) AS ccos
             FROM n, cent c)),
         assigned AS MATERIALIZED (
           SELECT vec_id, cent_id AS cell FROM ranked WHERE crk = 1),
         truth AS MATERIALIZED (
           SELECT query_id, neighbor_id FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY list_reduce(list_transform(c.emb,
                     (x, i) -> x * q.emb[i]), (a, b) -> a + b)
                   / (q.nrm * c.nrm) DESC, c.vec_id ASC) AS rank
             FROM n c, (SELECT * FROM n WHERE vec_id < 10) q
             WHERE c.vec_id <> q.vec_id) b
           WHERE rank <= 3)
         $sweep"""
    }
    // q305: Lomb–Scargle — 9 quantized sufficient sums per (series, k),
    // closing algebra in doubles over identical longs (same literal
    // chain as Spectral.lombScargle).
    val lombScargleOracle: String =
      """WITH ev AS (SELECT event_type, CAST(epoch_ms(ts) AS BIGINT) AS tms,
             value AS v FROM events),
         b AS (SELECT event_type, min(tms) AS t0,
                 max(tms) - min(tms) AS span, CAST(count(*) AS BIGINT) AS n
               FROM ev GROUP BY 1
               HAVING max(tms) - min(tms) > 0 AND count(*) >= 16),
         tt AS (SELECT ev.event_type, CAST(k.k AS BIGINT) AS k, b.n,
                  (CAST(k.k * (ev.tms - b.t0) AS DOUBLE)
                    / CAST(b.span AS DOUBLE)) * 6.283185307179586 AS ang,
                  ev.v
                FROM ev JOIN b USING (event_type), range(1, 9) k(k)),
         q AS (SELECT event_type, k, n,
                 CAST(floor(cos(ang) * 1000000 + 1.0/3) AS BIGINT) AS qc,
                 CAST(floor(sin(ang) * 1000000 + 1.0/3) AS BIGINT) AS qs,
                 CAST(floor(cos(ang) * cos(ang) * 1000000 + 1.0/3) AS BIGINT) AS qcc,
                 CAST(floor(sin(ang) * sin(ang) * 1000000 + 1.0/3) AS BIGINT) AS qss,
                 CAST(floor(cos(ang) * sin(ang) * 1000000 + 1.0/3) AS BIGINT) AS qcs,
                 CAST(floor(v * cos(ang) * 1000 + 1.0/3) AS BIGINT) AS qvc,
                 CAST(floor(v * sin(ang) * 1000 + 1.0/3) AS BIGINT) AS qvs,
                 CAST(floor(v * 100 + 1.0/3) AS BIGINT) AS qv,
                 CAST(floor(v * v * 100 + 1.0/3) AS BIGINT) AS qvv
               FROM tt),
         s AS (SELECT event_type, k, max(n) AS n,
                 CAST(sum(qc) AS BIGINT) AS s_qc,
                 CAST(sum(qs) AS BIGINT) AS s_qs,
                 CAST(sum(qcc) AS BIGINT) AS s_qcc,
                 CAST(sum(qss) AS BIGINT) AS s_qss,
                 CAST(sum(qcs) AS BIGINT) AS s_qcs,
                 CAST(sum(qvc) AS BIGINT) AS s_qvc,
                 CAST(sum(qvs) AS BIGINT) AS s_qvs,
                 CAST(sum(qv) AS BIGINT) AS s_qv,
                 CAST(sum(qvv) AS BIGINT) AS s_qvv
               FROM q GROUP BY 1, 2),
         d AS (SELECT event_type, k, n, CAST(n AS DOUBLE) AS n_d,
                 CAST(s_qc AS DOUBLE) / 1000000.0 AS sc,
                 CAST(s_qs AS DOUBLE) / 1000000.0 AS ssn,
                 CAST(s_qcc AS DOUBLE) / 1000000.0 AS scc,
                 CAST(s_qss AS DOUBLE) / 1000000.0 AS sss,
                 CAST(s_qcs AS DOUBLE) / 1000000.0 AS scs,
                 CAST(s_qvc AS DOUBLE) / 1000.0 AS svc,
                 CAST(s_qvs AS DOUBLE) / 1000.0 AS svs,
                 CAST(s_qv AS DOUBLE) / 100.0 AS sv,
                 CAST(s_qvv AS DOUBLE) / 100.0 AS svv
               FROM s),
         e AS (SELECT event_type, k, n, n_d,
                 svc - sv * sc / n_d AS cbar,
                 svs - sv * ssn / n_d AS sbar,
                 scc - sc * sc / n_d AS ccbar,
                 sss - ssn * ssn / n_d AS ssbar,
                 scs - sc * ssn / n_d AS csbar,
                 svv - sv * sv / n_d AS vv
               FROM d),
         f AS (SELECT *, ccbar * ssbar - csbar * csbar AS det FROM e)
         SELECT event_type, k, n,
           CAST(floor((ssbar * cbar * cbar + ccbar * sbar * sbar
             - 2.0 * csbar * cbar * sbar) / det / vv * 1000.0 + 1.0/3)
             AS BIGINT) AS power_milli
         FROM f WHERE det > 0.000000001 AND vv > 0.000000001"""
    // q311: Bloom FP audit — m=8192/k=3 filter from three md5-slice
    // positions over the 'en' vocabulary; probes are other-language
    // tokens verifiably NOT in it; theory column is the (fill)^3
    // chain over exact longs.
    val bloomFpOracle: String =
      """WITH t0 AS (SELECT source AS src, doc_id,
             unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents),
         t AS (SELECT a.src, a.tok || ' ' || b.tok || ' ' || c.tok AS tok
               FROM t0 a
               JOIN t0 b ON a.doc_id = b.doc_id AND b.i = a.i + 1
               JOIN t0 c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
         ix AS (SELECT min(src) AS idx_src FROM t),
         env AS (SELECT DISTINCT tok FROM t, ix WHERE t.src = ix.idx_src),
         bits AS (SELECT DISTINCT b FROM (
             SELECT CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 8192
               AS b FROM env
             UNION ALL
             SELECT CAST('0x' || substr(md5(tok), 9, 8) AS BIGINT) % 8192
               FROM env
             UNION ALL
             SELECT CAST('0x' || substr(md5(tok), 17, 8) AS BIGINT) % 8192
               FROM env)),
         nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bits_set FROM bits),
         pr0 AS (SELECT DISTINCT src, tok FROM t, ix WHERE t.src <> ix.idx_src),
         probes AS (SELECT pr0.src, pr0.tok FROM pr0
                    LEFT JOIN env ON env.tok = pr0.tok
                    WHERE env.tok IS NULL),
         ph AS (SELECT src, tok,
                  CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 8192 AS b
                FROM probes
                UNION ALL
                SELECT src, tok,
                  CAST('0x' || substr(md5(tok), 9, 8) AS BIGINT) % 8192
                FROM probes
                UNION ALL
                SELECT src, tok,
                  CAST('0x' || substr(md5(tok), 17, 8) AS BIGINT) % 8192
                FROM probes),
         fps AS (SELECT src, CAST(count(*) AS BIGINT) AS n_fp FROM (
                   SELECT ph.src, ph.tok FROM ph JOIN bits USING (b)
                   GROUP BY 1, 2 HAVING count(*) = 3) f0 GROUP BY 1),
         np AS (SELECT src, CAST(count(*) AS BIGINT) AS n_probes
                FROM probes GROUP BY 1)
         SELECT np.src, np.n_probes, coalesce(fps.n_fp, 0) AS n_fp,
           (coalesce(fps.n_fp, 0) * 1000000) // np.n_probes AS fp_ppm,
           nb.n_bits_set,
           (nb.n_bits_set * 1000000) // 8192 AS fill_ppm,
           CAST(floor((CAST(nb.n_bits_set AS DOUBLE) / 8192.0)
             * (CAST(nb.n_bits_set AS DOUBLE) / 8192.0)
             * (CAST(nb.n_bits_set AS DOUBLE) / 8192.0) * 1000000.0
             + 1.0/3) AS BIGINT) AS theory_fp_ppm
         FROM np LEFT JOIN fps ON fps.src = np.src, nb"""
    // q312: ensemble dedup — exact/minhash/simhash pairs unioned with
    // detector bits, one combined-graph CC (q62's reach closure),
    // mask census + union summary (-1 sentinels keep the gate
    // NULL-free).
    val ensembleOracle: String =
      s"""WITH RECURSIVE
         mh AS (SELECT doc_a, doc_b, 1 AS det FROM (
${base("q26_minhash_lsh")}) m0),
         sh2 AS (SELECT doc_a, doc_b, 2 AS det FROM (
${base("q28_simhash_pairs")}) s0),
         exh AS (SELECT doc_id, md5(text) AS h FROM documents),
         ex AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 4 AS det
                FROM exh a JOIN exh b
                  ON a.h = b.h AND a.doc_id < b.doc_id),
         tagged AS (SELECT * FROM mh UNION ALL SELECT * FROM sh2
                    UNION ALL SELECT * FROM ex),
         prs AS (SELECT doc_a, doc_b, CAST(sum(DISTINCT det) AS BIGINT)
                   AS mask
                 FROM tagged GROUP BY 1, 2),
         pm AS (SELECT 'mask_' || CAST(mask AS VARCHAR) AS part,
                  CAST(count(*) AS BIGINT) AS n_pairs,
                  CAST(-1 AS BIGINT) AS n_clusters,
                  CAST(-1 AS BIGINT) AS max_cluster
                FROM prs GROUP BY mask),
         edges AS (SELECT doc_a AS s, doc_b AS d FROM prs
                   UNION SELECT doc_b, doc_a FROM prs),
         reach(s, d) AS (
           SELECT s, d FROM edges
           UNION
           SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         mn AS (SELECT s AS doc_id, min(d) AS mn FROM reach GROUP BY 1),
         nodes AS (SELECT DISTINCT s AS doc_id FROM edges),
         lab AS (SELECT n.doc_id,
                   least(n.doc_id, coalesce(mn.mn, n.doc_id)) AS comp
                 FROM nodes n LEFT JOIN mn USING (doc_id)),
         sizes AS (SELECT comp, CAST(count(*) AS BIGINT) AS sz
                   FROM lab GROUP BY 1),
         un AS (SELECT 'union' AS part,
                  (SELECT CAST(count(*) AS BIGINT) FROM prs) AS n_pairs,
                  CAST(count(*) AS BIGINT) AS n_clusters,
                  CAST(max(sz) AS BIGINT) AS max_cluster
                FROM sizes)
         SELECT * FROM pm UNION ALL SELECT * FROM un"""
    // q313: interpolated Kneser–Ney bigram cross-entropy per source —
    // D = 0.75 discount, continuation-count backoff, ln quantized per
    // bigram TYPE before the frequency-weighted sum.
    val knOracle: String =
      """WITH t0 AS (SELECT source, doc_id,
             unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents),
         bg AS (SELECT a.source, a.tok AS w1, b.tok AS w2
                FROM t0 a JOIN t0 b
                  ON a.doc_id = b.doc_id AND b.i = a.i + 1),
         c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
                 FROM bg GROUP BY 1, 2),
         c1 AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c1,
                  CAST(count(*) AS BIGINT) AS n1r
                FROM c12 GROUP BY 1),
         cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS cont
                  FROM c12 GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM c12),
         probs AS (SELECT c12.w1, c12.w2,
             CAST(floor(ln(
               greatest(CAST(c AS DOUBLE) - 0.75, 0.0) / CAST(c1 AS DOUBLE)
               + ((0.75 * CAST(n1r AS DOUBLE)) / CAST(c1 AS DOUBLE))
                 * (CAST(cont AS DOUBLE) / CAST(nb AS DOUBLE))
             ) * 10000 + 1.0/3) AS BIGINT) AS lnq
           FROM c12 JOIN c1 USING (w1) JOIN cont USING (w2), tot)
         SELECT bg.source, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST((-sum(lnq)) // count(*) AS BIGINT) AS kn_ce_e4
         FROM bg JOIN probs USING (w1, w2) GROUP BY 1"""
    // q314: confident-joint label noise — q95 scores shifted to the
    // positive lattice (floor == trunc), per-label mean thresholds,
    // both-confident ties to the larger margin then 'en'.
    val confidentJointOracle: String =
      s"""WITH sc AS (SELECT doc_id, n_tokens, margin FROM (
${base("q95_hash_classifier")}) q95 WHERE n_tokens > 0),
         lab AS (SELECT doc_id,
                   CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS y
                 FROM documents),
         s AS (SELECT sc.doc_id, lab.y,
                 ((margin + 100 * n_tokens) * 1000000) // n_tokens AS s
               FROM sc JOIN lab USING (doc_id)),
         th AS (SELECT y, CAST(sum(s) // count(*) AS BIGINT) AS t_pos,
                  CAST(sum(200000000 - s) // count(*) AS BIGINT) AS t_neg
                FROM s GROUP BY 1),
         te AS (SELECT t_pos AS t_en FROM th WHERE y = 'en'),
         tox AS (SELECT t_neg AS t_oth FROM th WHERE y = 'other'),
         a AS (SELECT s.y, s.s, te.t_en, tox.t_oth,
                 s.s >= te.t_en AS c_en,
                 (200000000 - s.s) >= tox.t_oth AS c_oth
               FROM s, te, tox),
         b AS (SELECT y,
                 CASE WHEN c_en AND c_oth THEN
                     CASE WHEN (s - t_en) >= (200000000 - s - t_oth)
                       THEN 'en' ELSE 'other' END
                   WHEN c_en THEN 'en' ELSE 'other' END AS j_hat
               FROM a WHERE c_en OR c_oth),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_assigned FROM b)
         SELECT y, j_hat, CAST(count(*) AS BIGINT) AS n,
           (CAST(count(*) AS BIGINT) * 1000000) // n_assigned AS frac_ppm
         FROM b, tot GROUP BY 1, 2, n_assigned"""
    // q316: exact-substring dup coverage — per-suffix best cross-doc
    // LCP via segmented running mins over the global suffix order
    // (range-min lemma), ≥20-char spans merged per doc (q214 islands).
    val dupCoverageOracle: String =
      """WITH sfx AS (
           SELECT doc_id, CAST(i AS BIGINT) AS pos,
             substr(text, CAST(i AS INT), 48) AS sfx
           FROM documents, range(1, 4097) AS g(i)
           WHERE i <= length(text)
             AND (i = 1 OR substr(text, CAST(i - 1 AS INT), 1) = ' ')
             AND substr(text, CAST(i AS INT), 1) <> ' '),
         r AS (SELECT doc_id, pos, sfx,
                 row_number() OVER (ORDER BY sfx ASC, doc_id ASC, pos ASC)
                   AS rn
               FROM sfx),
         adj AS (SELECT a.rn,
                   coalesce(list_min(list_filter(
                     range(1, 1 + least(length(a.sfx), length(b.sfx))),
                     j -> substr(a.sfx, CAST(j AS INT), 1)
                       <> substr(b.sfx, CAST(j AS INT), 1))) - 1,
                     least(length(a.sfx), length(b.sfx))) AS lcp
                 FROM r a JOIN r b ON b.rn = a.rn + 1),
         rows0 AS (SELECT r.doc_id, r.pos, r.rn,
                     coalesce(p.lcp, -1) AS lp,
                     coalesce(nx.lcp, -1) AS ln2
                   FROM r LEFT JOIN adj p ON p.rn = r.rn - 1
                          LEFT JOIN adj nx ON nx.rn = r.rn),
         runs AS (SELECT *, rn - row_number() OVER
                    (PARTITION BY doc_id ORDER BY rn) AS run
                  FROM rows0),
         mm AS (SELECT doc_id, pos,
                  greatest(
                    min(lp) OVER (PARTITION BY doc_id, run ORDER BY rn
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                    min(ln2) OVER (PARTITION BY doc_id, run ORDER BY rn
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                  ) AS m
                FROM runs),
         sp AS (SELECT doc_id, pos, pos + m AS e FROM mm WHERE m >= 20),
         il AS (SELECT doc_id, pos, e,
                  CASE WHEN max(e) OVER w IS NULL OR pos > max(e) OVER w
                       THEN 1 ELSE 0 END AS newi
                FROM sp
                WINDOW w AS (PARTITION BY doc_id ORDER BY pos, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         il2 AS (SELECT doc_id, pos, e,
                   sum(newi) OVER (PARTITION BY doc_id ORDER BY pos, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS isl
                 FROM il),
         pi AS (SELECT doc_id, isl, min(pos) AS s, max(e) AS e2
                FROM il2 GROUP BY 1, 2),
         pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                  CAST(sum(e2 - s) AS BIGINT) AS covered
                FROM pi GROUP BY 1)
         SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
           coalesce(pd.n_spans, 0) AS n_spans,
           coalesce(pd.covered, 0) AS covered_chars,
           (coalesce(pd.covered, 0) * 1000000) // length(d.text)
             AS coverage_ppm
         FROM documents d LEFT JOIN pd USING (doc_id)"""
    // q315: Hopkins clusterability — real probes (vec_ids 16..31) vs
    // md5-chain uniform pseudo-points in the per-dim box; each nearest
    // distance floor-quantized before the two sums; H in exact ppm.
    val hopkinsOracle: String =
      """WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
           FROM embeddings),
         box AS (SELECT generate_subscripts(emb, 1) - 1 AS dim,
                   unnest(emb) AS v FROM e),
         bx AS (SELECT dim, min(v) AS lo, max(v) AS hi
                FROM box GROUP BY 1),
         u AS (SELECT 1000 + i.i AS pid, bx.dim,
                 bx.lo + ((CAST('0x' || substr(md5(CAST(i.i AS VARCHAR)
                   || ':' || CAST(bx.dim AS VARCHAR)), 1, 8) AS BIGINT)
                   % 10001) / 10000.0) * (bx.hi - bx.lo) AS v
               FROM range(16) i(i), bx),
         up AS (SELECT pid, list(v ORDER BY dim) AS pv FROM u GROUP BY 1),
         rp AS (SELECT vec_id AS pid, emb AS pv FROM e
                WHERE vec_id >= 16 AND vec_id < 32),
         wd AS (SELECT rp.pid,
                  min(list_reduce(list_transform(e.emb,
                    (x, i2) -> (x - rp.pv[i2]) * (x - rp.pv[i2])),
                    (a, b) -> a + b)) AS d2
                FROM rp, e WHERE e.vec_id <> rp.pid GROUP BY 1),
         ud AS (SELECT up.pid,
                  min(list_reduce(list_transform(e.emb,
                    (x, i2) -> (x - up.pv[i2]) * (x - up.pv[i2])),
                    (a, b) -> a + b)) AS d2
                FROM up, e GROUP BY 1),
         wq AS (SELECT CAST(sum(CAST(floor(d2 * 1000000 + 1.0/3)
                    AS BIGINT)) AS BIGINT) AS sum_w_q,
                  CAST(count(*) AS BIGINT) AS n_real FROM wd),
         uq AS (SELECT CAST(sum(CAST(floor(d2 * 1000000 + 1.0/3)
                    AS BIGINT)) AS BIGINT) AS sum_u_q,
                  CAST(count(*) AS BIGINT) AS n_uniform FROM ud)
         SELECT n_real, n_uniform, sum_w_q, sum_u_q,
           (sum_u_q * 1000000) // (sum_u_q + sum_w_q) AS hopkins_ppm
         FROM wq, uq"""
    // q317: Dunning G² keyness — four exact-long contingency cells, each
    // ln term is ln of one IEEE division of long products quantized at
    // 1e4 (the q96 recipe); top 10 per source, positive keyness only
    val keynessOracle: String =
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         st AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS a
                FROM t GROUP BY 1, 2),
         tt AS (SELECT tok, CAST(sum(a) AS BIGINT) AS n_t FROM st GROUP BY 1),
         srct AS (SELECT source, CAST(sum(a) AS BIGINT) AS n_s
                  FROM st GROUP BY 1),
         tot AS (SELECT CAST(sum(n_t) AS BIGINT) AS nn FROM tt),
         cells AS (SELECT st.source, st.tok, st.a, tt.n_t - st.a AS b,
                     tt.n_t, srct.n_s, tot.nn
                   FROM st JOIN tt USING (tok) JOIN srct USING (source)
                   CROSS JOIN tot),
         sc AS (SELECT source, tok, a, b,
             2 * ((CASE WHEN a > 0 THEN a * CAST(floor(ln(
                     CAST(a * nn AS DOUBLE) / CAST(n_t * n_s AS DOUBLE))
                     * 10000 + 1.0/3) AS BIGINT) ELSE 0 END)
               + (CASE WHEN b > 0 THEN b * CAST(floor(ln(
                     CAST(b * nn AS DOUBLE)
                     / CAST(n_t * (nn - n_s) AS DOUBLE))
                     * 10000 + 1.0/3) AS BIGINT) ELSE 0 END)
               + (CASE WHEN n_s - a > 0 THEN (n_s - a) * CAST(floor(ln(
                     CAST((n_s - a) * nn AS DOUBLE)
                     / CAST((nn - n_t) * n_s AS DOUBLE))
                     * 10000 + 1.0/3) AS BIGINT) ELSE 0 END)
               + (CASE WHEN nn - n_s - b > 0
                   THEN (nn - n_s - b) * CAST(floor(ln(
                     CAST((nn - n_s - b) * nn AS DOUBLE)
                     / CAST((nn - n_t) * (nn - n_s) AS DOUBLE))
                     * 10000 + 1.0/3) AS BIGINT) ELSE 0 END)) AS g2_q
           FROM cells
           WHERE a * (nn - n_s) > b * n_s)
         SELECT source, CAST(row_number() OVER (PARTITION BY source
             ORDER BY g2_q DESC, tok ASC) AS BIGINT) AS rk,
           tok, a, b, g2_q
         FROM sc
         QUALIFY row_number() OVER (PARTITION BY source
           ORDER BY g2_q DESC, tok ASC) <= 10"""
    // q318: Ljung–Box Q on the q181 ACF longs — all-integer after the
    // shared r_ppm quantization; decimal(38)/HUGEINT for n(n+2)·Σterm
    val ljungBoxOracle: String =
      """WITH cells AS (SELECT event_type, epoch_ms(ts) // 3600000 AS h,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         b AS (SELECT min(h) AS lo, max(h) AS hi FROM cells),
         hours AS (SELECT unnest(range(lo, hi + 1)) AS h FROM b),
         types AS (SELECT DISTINCT event_type FROM cells),
         grid AS (SELECT t.event_type, hh.h, coalesce(c.x, 0) AS x
           FROM types t CROSS JOIN hours hh
           LEFT JOIN cells c ON c.event_type = t.event_type
             AND c.h = hh.h),
         nh AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours
                FROM grid GROUP BY 1),
         l AS (SELECT unnest(range(1, 7)) AS lag_k),
         m AS (SELECT a.event_type, CAST(l.lag_k AS BIGINT) AS lag_k,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a.x) AS BIGINT) AS sx,
             CAST(sum(bb.x) AS BIGINT) AS sy,
             CAST(sum(a.x * bb.x) AS BIGINT) AS sxy,
             CAST(sum(a.x * a.x) AS BIGINT) AS sxx,
             CAST(sum(bb.x * bb.x) AS BIGINT) AS syy
           FROM grid a CROSS JOIN l
           JOIN grid bb ON bb.event_type = a.event_type
             AND bb.h = a.h - l.lag_k
           GROUP BY 1, 2),
         r AS (SELECT event_type, lag_k, n,
             CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
               / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                 * CAST(n * syy - sy * sy AS DOUBLE))
               * 1000000 + 1.0/3) AS BIGINT) AS r_ppm
           FROM m
           WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0),
         agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_lags,
             CAST(sum((r_ppm * r_ppm * 1000) // n) AS BIGINT) AS sum_term
           FROM r GROUP BY 1)
         SELECT agg.event_type, nh.n_hours, agg.n_lags,
           CAST((CAST(nh.n_hours AS HUGEINT) * (nh.n_hours + 2)
             * agg.sum_term) // 1000000000000 AS BIGINT) AS q_milli,
           CAST(CASE WHEN (CAST(nh.n_hours AS HUGEINT) * (nh.n_hours + 2)
             * agg.sum_term) // 1000000000000 > 12592
             THEN 1 ELSE 0 END AS BIGINT) AS reject_white
         FROM agg JOIN nh USING (event_type)"""
    // q324: PPR from the 3 lowest-id near-dup-graph nodes — q103's
    // integer lattice with a per-seed restart union, 5 unrolled rounds
    val pprOracle: String = {
      def round(i: Int): String =
        s"""pr$i AS (SELECT seed, node, CAST(sum(r) AS BIGINT) AS r FROM (
              SELECT p.seed, e.dst AS node,
                CAST((85 * CAST(sum(p.r // d.deg) AS BIGINT)) // 100
                  AS BIGINT) AS r
              FROM e JOIN pr${i - 1} p ON p.node = e.src
                JOIN deg d ON d.src = e.src
              GROUP BY 1, 2
              UNION ALL SELECT seed, seed, 150000 FROM seeds)
            GROUP BY 1, 2)"""
      s"""WITH prs AS (SELECT doc_a, doc_b FROM (
${base("q28_simhash_pairs")})),
         e AS (SELECT doc_a AS src, doc_b AS dst FROM prs
               UNION ALL SELECT doc_b, doc_a FROM prs),
         deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
                 FROM e GROUP BY 1),
         seeds AS (SELECT src AS seed FROM deg ORDER BY src ASC LIMIT 3),
         pr0 AS (SELECT seed, seed AS node, CAST(1000000 AS BIGINT) AS r
                 FROM seeds),
         ${(1 to 5).map(round).mkString(",\n         ")}
         SELECT seed, CAST(row_number() OVER (PARTITION BY seed
             ORDER BY r DESC, node ASC) AS BIGINT) AS rk,
           node AS doc_id, r AS rank_q
         FROM pr5
         QUALIFY row_number() OVER (PARTITION BY seed
           ORDER BY r DESC, node ASC) <= 10"""
    }
    // q325: synchronous LPA, 4 unrolled rounds; adoption is an exact
    // (count desc, label asc) argmax
    val lpaOracle: String = {
      def round(i: Int): String =
        s"""g$i AS (SELECT e.dst AS node, l.label AS lb,
              CAST(count(*) AS BIGINT) AS c
            FROM e JOIN lbl${i - 1} l ON l.node = e.src GROUP BY 1, 2),
           lbl$i AS (SELECT node, lb AS label FROM g$i
            QUALIFY row_number() OVER (PARTITION BY node
              ORDER BY c DESC, lb ASC) = 1)"""
      s"""WITH prs AS (SELECT doc_a, doc_b FROM (
${base("q28_simhash_pairs")})),
         e AS (SELECT doc_a AS src, doc_b AS dst FROM prs
               UNION ALL SELECT doc_b, doc_a FROM prs),
         lbl0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
         ${(1 to 4).map(round).mkString(",\n         ")}
         SELECT label AS community, CAST(count(*) AS BIGINT) AS n_members,
           min(node) AS min_node
         FROM lbl4 GROUP BY 1"""
    }
    // q326: Fisher's g on the q36 quantized ordinates k=1..3 —
    // p = 3(1−g)² exactly rational, HUGEINT-routed
    val fisherGOracle: String =
      s"""WITH spec AS (SELECT user_id, bin, qpower FROM (
${base("q36_fft_power")})),
         agg AS (SELECT user_id,
             CAST(max(qpower) AS BIGINT) AS maxq,
             CAST(sum(qpower) AS BIGINT) AS sumq,
             CAST(count(*) AS BIGINT) AS m,
             CAST(min(CASE WHEN qpower = mq THEN bin END) AS BIGINT)
               AS k_peak
           FROM (SELECT user_id, bin, qpower,
                   max(qpower) OVER (PARTITION BY user_id) AS mq
                 FROM spec WHERE bin >= 1 AND bin <= 3)
           GROUP BY 1)
         SELECT user_id, k_peak, maxq, sumq,
           (maxq * 1000000) // sumq AS g_ppm,
           CAST((3000000 * CAST(sumq - maxq AS HUGEINT) * (sumq - maxq))
             // (CAST(sumq AS HUGEINT) * sumq) AS BIGINT) AS p_ppm
         FROM agg WHERE sumq > 0"""
    // q321: k-means‖ — 3 unrolled oversampling rounds; the Bernoulli
    // draw is an exact HUGEINT/decimal product comparison on the
    // shared md5 hash and quantized-long distances
    val kmeansParOracle: String = {
      // MATERIALIZED: c_i is referenced by both d_{i+1} and c_{i+1},
      // so inlining would re-expand the whole prior chain per reference
      def round(i: Int): String =
        s"""d$i AS MATERIALIZED (SELECT p.vec_id,
              CAST(floor(min(list_reduce(list_transform(p.emb,
                (x, ii) -> (x - c.emb[ii]) * (x - c.emb[ii])),
                (a, b) -> a + b)) * 1000000 + 1.0/3) AS BIGINT) AS dq
            FROM e p JOIN c${i - 1} c ON TRUE GROUP BY 1),
           p$i AS (SELECT CAST(sum(dq) AS BIGINT) AS phi FROM d$i),
           n$i AS MATERIALIZED (SELECT d$i.vec_id FROM d$i, p$i
            WHERE CAST((CAST('0x' || substr(md5('kp$i:' ||
                CAST(d$i.vec_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000000)
                AS HUGEINT) * phi
              < 8 * CAST(dq AS HUGEINT) * 1000000),
           c$i AS MATERIALIZED (SELECT * FROM c${i - 1} UNION ALL
            SELECT vec_id, emb FROM e
            WHERE vec_id IN (SELECT vec_id FROM n$i))"""
      s"""WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
           FROM embeddings),
         c0 AS (SELECT vec_id, emb FROM e WHERE vec_id = 0),
         ${round(1)}, ${round(2)}, ${round(3)},
         rounds AS (SELECT vec_id, CAST(0 AS BIGINT) AS round_added FROM c0
           UNION ALL SELECT vec_id, 1 FROM n1
           UNION ALL SELECT vec_id, 2 FROM n2
           UNION ALL SELECT vec_id, 3 FROM n3),
         asg AS (SELECT p.vec_id, c.vec_id AS cand_id,
             row_number() OVER (PARTITION BY p.vec_id
               ORDER BY list_reduce(list_transform(p.emb,
                 (x, ii) -> (x - c.emb[ii]) * (x - c.emb[ii])),
                 (a, b) -> a + b) ASC, c.vec_id ASC) AS rk
           FROM e p JOIN c3 c ON TRUE),
         w AS (SELECT cand_id, CAST(count(*) AS BIGINT) AS weight
               FROM asg WHERE rk = 1 GROUP BY 1)
         SELECT r.vec_id AS cand_id, r.round_added,
           coalesce(w.weight, 0) AS weight
         FROM rounds r LEFT JOIN w ON w.cand_id = r.vec_id"""
    }
    // q322: DBSCAN census over the q37 banded candidate pairs at the
    // looser ε = 0.3 density radius (the 0.4 near-dup cut yields a
    // constant-status census on this corpus — q311's degenerate-set
    // lesson); the literal swap reuses q37's band pipeline verbatim
    val dbscanCoreOracle: String =
      s"""WITH semp AS (SELECT vec_a, vec_b FROM (
${base("q37_cosine_neardup").replace(">= 0.4", ">= 0.3")})),
         sym AS (SELECT vec_a AS vec_id, vec_b AS nb FROM semp
                 UNION ALL SELECT vec_b, vec_a FROM semp),
         deg AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS n_nb
                 FROM sym GROUP BY 1),
         core AS (SELECT vec_id FROM deg WHERE n_nb >= 3),
         nearc AS (SELECT DISTINCT s.vec_id
                   FROM sym s JOIN core c ON s.nb = c.vec_id)
         SELECT em.vec_id, coalesce(deg.n_nb, 0) AS n_nb,
           CAST(CASE WHEN core.vec_id IS NOT NULL THEN 2
             WHEN nearc.vec_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
             AS status
         FROM embeddings em
         LEFT JOIN deg ON deg.vec_id = em.vec_id
         LEFT JOIN core ON core.vec_id = em.vec_id
         LEFT JOIN nearc ON nearc.vec_id = em.vec_id"""
    // q323: facility-location greedy — 8 unrolled rounds over the
    // clamped quantized coverage relation; argmax by (gain, cand_id)
    val facilityOracle: String = {
      // every CTE here MATERIALIZED: b_i/sel_i are referenced twice
      // downstream, so un-materialized inlining re-expands the whole
      // prior-round tree per reference — 2^8 copies of pc (measured:
      // the oracle never returned at sf0.001 without this)
      def round(i: Int): String =
        s"""g$i AS MATERIALIZED (SELECT pc.cand_id,
              CAST(sum(greatest(0, pc.covq - b${i - 1}.best)) AS BIGINT)
                AS gain
            FROM pc JOIN b${i - 1} USING (vec_id)
            WHERE pc.cand_id NOT IN (SELECT cand_id FROM sel${i - 1})
            GROUP BY 1),
           s$i AS MATERIALIZED (SELECT cand_id, gain FROM g$i
            ORDER BY gain DESC, cand_id ASC LIMIT 1),
           sel$i AS MATERIALIZED (SELECT cand_id FROM sel${i - 1}
            UNION ALL SELECT cand_id FROM s$i),
           b$i AS MATERIALIZED (SELECT b${i - 1}.vec_id,
              greatest(b${i - 1}.best, pc.covq) AS best
            FROM b${i - 1} JOIN pc ON pc.vec_id = b${i - 1}.vec_id
            JOIN s$i ON pc.cand_id = s$i.cand_id)"""
      s"""WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
           FROM embeddings),
         n AS (SELECT vec_id, emb,
                 sqrt(list_reduce(list_transform(emb, x -> x * x),
                   (a, b) -> a + b)) AS nrm
               FROM e),
         cd AS (SELECT vec_id AS cand_id, emb AS cemb, nrm AS cnrm
                FROM n WHERE vec_id < 32),
         pc AS MATERIALIZED (SELECT p.vec_id, c.cand_id,
             greatest(0, CAST(floor(
               list_reduce(list_transform(p.emb, (x, ii) -> x * c.cemb[ii]),
                 (a, b) -> a + b) / (p.nrm * c.cnrm) * 1000000 + 1.0/3)
               AS BIGINT)) AS covq
           FROM n p JOIN cd c ON TRUE),
         b0 AS MATERIALIZED (SELECT vec_id, CAST(0 AS BIGINT) AS best
           FROM n),
         sel0 AS MATERIALIZED (SELECT cand_id FROM cd WHERE FALSE),
         ${(1 to 8).map(round).mkString(",\n         ")},
         allsel AS (
           ${(1 to 8).map(i =>
             s"SELECT $i AS rk, cand_id, gain FROM s$i")
             .mkString("\n           UNION ALL ")})
         SELECT CAST(rk AS BIGINT) AS rk, cand_id, gain AS gain_q,
           CAST(sum(gain) OVER (ORDER BY rk) AS BIGINT) AS obj_q
         FROM allsel"""
    }
    // q319: gap statistic — one Lloyd step per (side, k); centroid
    // means replay the q68 recipe ((xq AS DOUBLE)/1e6/n, same division
    // order); W quantized per point before the sum; empty cells keep
    // their seed (LEFT JOIN coalesce)
    val gapStatOracle: String = {
      def side(pts: String, tag: String): String =
        s"""seeds_$tag AS (SELECT ks.k, p.vec_id AS cid, p.emb AS cemb
              FROM $pts p, ks WHERE p.vec_id < ks.k),
            asg_$tag AS (SELECT k, vec_id, cid FROM (
                SELECT s.k, p.vec_id, s.cid,
                  row_number() OVER (PARTITION BY s.k, p.vec_id
                    ORDER BY list_reduce(list_transform(p.emb,
                      (x, i) -> (x - s.cemb[i]) * (x - s.cemb[i])),
                      (a, b) -> a + b) ASC, s.cid ASC) AS rk
                FROM $pts p JOIN seeds_$tag s ON TRUE)
              WHERE rk = 1),
            sx_$tag AS (SELECT a.k, a.cid,
                generate_subscripts(p.emb, 1) - 1 AS dim,
                unnest(p.emb) AS x
              FROM asg_$tag a JOIN $pts p ON p.vec_id = a.vec_id),
            sums_$tag AS (SELECT k, cid, dim,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(x * 1000000) AS BIGINT)) AS BIGINT)
                  AS xq
              FROM sx_$tag GROUP BY 1, 2, 3),
            cent_$tag AS (SELECT s.k, s.cid,
                coalesce(list(CAST(m.xq AS DOUBLE) / 1000000.0 / m.n
                    ORDER BY m.dim),
                  any_value(s.cemb)) AS cemb
              FROM seeds_$tag s LEFT JOIN sums_$tag m
                ON m.k = s.k AND m.cid = s.cid
              GROUP BY 1, 2),
            w_$tag AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(dmin * 1000000 + 1.0/3) AS BIGINT))
                  AS BIGINT) AS w_q
              FROM (SELECT c.k, p.vec_id,
                  min(list_reduce(list_transform(p.emb,
                    (x, i) -> (x - c.cemb[i]) * (x - c.cemb[i])),
                    (a, b) -> a + b)) AS dmin
                FROM $pts p JOIN cent_$tag c ON TRUE
                GROUP BY 1, 2)
              GROUP BY 1)"""
      s"""WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
           FROM embeddings),
         ks AS (SELECT CAST(unnest([2, 4, 8]) AS BIGINT) AS k),
         box AS (SELECT generate_subscripts(emb, 1) - 1 AS dim,
                   unnest(emb) AS v FROM e),
         bx AS (SELECT dim, min(v) AS lo, max(v) AS hi
                FROM box GROUP BY 1),
         uu AS (SELECT i.i AS vec_id, bx.dim,
                 bx.lo + ((CAST('0x' || substr(md5('g' ||
                   CAST(i.i AS VARCHAR) || ':' ||
                   CAST(bx.dim AS VARCHAR)), 1, 8) AS BIGINT)
                   % 10001) / 10000.0) * (bx.hi - bx.lo) AS v
               FROM range(256) i(i), bx),
         up AS (SELECT vec_id, list(v ORDER BY dim) AS emb
                FROM uu GROUP BY 1),
         ${side("e", "d")},
         ${side("up", "r")}
         SELECT d.k, d.n AS n_data, d.w_q AS w_data_q,
           r.n AS n_ref, r.w_q AS w_ref_q,
           CAST(floor((ln(CAST(r.w_q AS DOUBLE) / r.n)
             - ln(CAST(d.w_q AS DOUBLE) / d.n)) * 1000 + 1.0/3)
             AS BIGINT) AS gap_milli
         FROM w_d d JOIN w_r r USING (k)"""
    }
    // q320: TextRank — 5 unrolled integer-lattice PageRank rounds over
    // the undirected adjacency graph; every op is a long product or
    // trunc-div on nonnegative values, no float at any round
    val textrankOracle: String = {
      val round = (i: Int) =>
        s"""r$i AS (SELECT e2.v AS tok,
              CAST(150 + (850 * CAST(sum((e2.w * r${i - 1}.r) // e2.wu)
                AS BIGINT)) // 1000 AS BIGINT) AS r
            FROM e2 JOIN r${i - 1} ON r${i - 1}.tok = e2.u GROUP BY 1)"""
      s"""WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                  generate_subscripts(string_split(text, ' '), 1) AS i
           FROM documents),
         p AS (SELECT a.tok AS w1, b.tok AS w2
               FROM tok a JOIN tok b ON a.doc_id = b.doc_id
                 AND b.i = a.i + 1
               WHERE a.tok <> b.tok),
         ed AS (SELECT u, v, CAST(count(*) AS BIGINT) AS w
                FROM (SELECT w1 AS u, w2 AS v FROM p
                      UNION ALL SELECT w2, w1 FROM p)
                GROUP BY 1, 2),
         wd AS (SELECT u, CAST(sum(w) AS BIGINT) AS wu FROM ed GROUP BY 1),
         e2 AS (SELECT ed.u, ed.v, ed.w, wd.wu FROM ed JOIN wd USING (u)),
         r0 AS (SELECT DISTINCT u AS tok, CAST(1000 AS BIGINT) AS r
                FROM ed),
         ${round(1)}, ${round(2)}, ${round(3)}, ${round(4)}, ${round(5)}
         SELECT r5.tok, r5.r AS r_milli, wd.wu AS strength
         FROM r5 JOIN wd ON wd.u = r5.tok
         ORDER BY r_milli DESC, tok ASC LIMIT 20"""
    }
    // q310: KMV bottom-k sketch intersection — k smallest distinct
    // 60-bit token hashes per source; pair merge re-ranks ≤2k rows;
    // ρ/k is the direct Jaccard estimate; (k−1)·2⁶⁰ rides HUGEINT.
    val kmvOracle: String =
      """WITH t0 AS (SELECT source AS src,
             unnest(string_split(text, ' ')) AS tok FROM documents),
         t AS (SELECT DISTINCT src, tok FROM t0),
         h0 AS (SELECT DISTINCT src,
             CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM t),
         sk AS (SELECT src, h,
             row_number() OVER (PARTITION BY src ORDER BY h ASC) AS rk
           FROM h0),
         s AS (SELECT src, h FROM sk WHERE rk <= 128),
         ps AS (SELECT src, CAST(count(*) AS BIGINT) AS n_kept, max(h) AS hk
                FROM s GROUP BY 1),
         pe AS (SELECT src, CASE WHEN n_kept < 128 THEN n_kept
                  ELSE CAST((CAST(127 AS HUGEINT) * 1152921504606846976)
                    // hk AS BIGINT) END AS kmv
                FROM ps),
         prs AS (SELECT a.src AS src_a, b.src AS src_b
                 FROM pe a, pe b WHERE a.src < b.src),
         mg AS (SELECT prs.src_a, prs.src_b, s.h,
                  max(CASE WHEN s.src = prs.src_a THEN 1 ELSE 0 END) AS in_a,
                  max(CASE WHEN s.src = prs.src_b THEN 1 ELSE 0 END) AS in_b
                FROM prs JOIN s ON s.src = prs.src_a OR s.src = prs.src_b
                GROUP BY 1, 2, 3),
         mk AS (SELECT *, row_number() OVER (PARTITION BY src_a, src_b
                  ORDER BY h ASC) AS rk FROM mg),
         pu AS (SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_kept,
                  max(h) AS hk,
                  CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS rho
                FROM mk WHERE rk <= 128 GROUP BY 1, 2),
         pu2 AS (SELECT src_a, src_b, rho, n_kept,
                   CASE WHEN n_kept < 128 THEN n_kept
                     ELSE CAST((CAST(127 AS HUGEINT) * 1152921504606846976)
                       // hk AS BIGINT) END AS kmv_union
                 FROM pu),
         pe2 AS (SELECT src_a, src_b, rho, kmv_union,
                   (rho * 1000000) // n_kept AS kmv_jac_ppm,
                   CAST((CAST(rho AS HUGEINT) * kmv_union) // n_kept
                     AS BIGINT) AS kmv_inter
                 FROM pu2),
         ns AS (SELECT src, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1),
         iv AS (SELECT x.src AS src_a, y.src AS src_b,
                  CAST(count(*) AS BIGINT) AS n_inter
                FROM t x JOIN t y ON x.tok = y.tok AND x.src < y.src
                GROUP BY 1, 2)
         SELECT p.src_a, p.src_b, na.n AS n_a, nb.n AS n_b,
           coalesce(iv.n_inter, 0) AS n_inter,
           (coalesce(iv.n_inter, 0) * 1000000)
             // (na.n + nb.n - coalesce(iv.n_inter, 0)) AS exact_jac_ppm,
           ea.kmv AS kmv_a, eb.kmv AS kmv_b, p.kmv_union, p.rho,
           p.kmv_jac_ppm, p.kmv_inter
         FROM pe2 p
         LEFT JOIN iv ON iv.src_a = p.src_a AND iv.src_b = p.src_b
         JOIN ns na ON na.src = p.src_a
         JOIN ns nb ON nb.src = p.src_b
         JOIN pe ea ON ea.src = p.src_a
         JOIN pe eb ON eb.src = p.src_b"""
    // q309: isotonic calibration fit via the Ayer minimax identity over
    // the 10-char score-bin grid — ppm-exact prefix-sum block averages,
    // min/max over longs (monotone by construction of the formula).
    val isotonicOracle: String =
      """WITH b AS (SELECT n_chars // 10 AS bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pos
           FROM documents GROUP BY 1),
         p AS (SELECT bin, n, n_pos,
                 CAST(sum(n) OVER w AS BIGINT) AS cn,
                 CAST(sum(n_pos) OVER w AS BIGINT) AS cp
               FROM b WINDOW w AS (ORDER BY bin ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         pr AS (SELECT j.bin AS jb, k.bin AS kb,
                  ((k.cp - (j.cp - j.n_pos)) * 1000000)
                    // (k.cn - (j.cn - j.n)) AS avg_ppm
                FROM p j JOIN p k ON k.bin >= j.bin),
         t AS (SELECT i.bin AS ib, pr.jb, min(pr.avg_ppm) AS mn
               FROM p i JOIN pr ON pr.jb <= i.bin AND pr.kb >= i.bin
               GROUP BY 1, 2),
         iso AS (SELECT ib, CAST(max(mn) AS BIGINT) AS iso_ppm
                 FROM t GROUP BY 1)
         SELECT b.bin, b.n, b.n_pos,
           (b.n_pos * 1000000) // b.n AS raw_ppm, iso.iso_ppm
         FROM b JOIN iso ON iso.ib = b.bin"""
    // q308: residual quantization — stage-1 coarse snap on the FULL
    // vector, stage-2 residual codebook (residuals of vecs 8..15 under
    // their own stage-1 assignment), both argmins (dist asc, code asc);
    // the q98 left-fold double chain end to end.
    val rqEncodeOracle: String =
      """WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
           FROM embeddings),
         cb1 AS (SELECT vec_id AS code, emb AS cemb FROM e WHERE vec_id < 8),
         d1 AS (SELECT e.vec_id, cb1.code,
             list_reduce(list_transform(e.emb, x -> x * x), (a, b) -> a + b)
             - 2.0 * list_reduce(list_transform(e.emb,
                 (x, i) -> x * cb1.cemb[CAST(i AS INT)]), (a, b) -> a + b)
             + list_reduce(list_transform(cb1.cemb, x -> x * x),
                 (a, b) -> a + b) AS dist
           FROM e, cb1),
         a1 AS (SELECT vec_id, code, dist,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY dist ASC, code ASC) AS rk
           FROM d1),
         s1 AS (SELECT vec_id, code AS code1, dist AS dist1
                FROM a1 WHERE rk = 1),
         res AS (SELECT e.vec_id, s1.code1, s1.dist1,
             list_transform(e.emb,
               (x, i) -> x - cb1.cemb[CAST(i AS INT)]) AS r
           FROM e JOIN s1 USING (vec_id) JOIN cb1 ON cb1.code = s1.code1),
         cb2 AS (SELECT vec_id - 8 AS code2, r AS cemb2
                 FROM res WHERE vec_id >= 8 AND vec_id < 16),
         d2 AS (SELECT res.vec_id, res.code1, res.dist1, cb2.code2,
             list_reduce(list_transform(res.r, x -> x * x), (a, b) -> a + b)
             - 2.0 * list_reduce(list_transform(res.r,
                 (x, i) -> x * cb2.cemb2[CAST(i AS INT)]), (a, b) -> a + b)
             + list_reduce(list_transform(cb2.cemb2, x -> x * x),
                 (a, b) -> a + b) AS dist
           FROM res, cb2),
         a2 AS (SELECT vec_id, code1, dist1, code2, dist,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY dist ASC, code2 ASC) AS rk
           FROM d2)
         SELECT vec_id, CAST(code1 AS BIGINT) AS code1,
           CAST(code2 AS BIGINT) AS code2,
           CAST(floor(dist1 * 1000000 + 1.0/3) AS BIGINT) AS d1_q,
           CAST(floor(dist * 1000000 + 1.0/3) AS BIGINT) AS d2_q
         FROM a2 WHERE rk = 1"""
    // q306: longest cross-document repeated substring per doc — the
    // suffix-sort dedup primitive; oracle = same word-start 48-capped
    // suffix relation, one global row_number sort, adjacent
    // different-doc LCPs credited to both sides (the adjacent-pair
    // reduction proof is at Dedup.suffixDup).
    val suffixDupOracle: String =
      """WITH sfx AS (
           -- static position range (docs are < 4096 chars; DuckDB's
           -- generate_series rejects lateral column bounds)
           SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 48) AS sfx
           FROM documents, range(1, 4097) AS g(i)
           WHERE i <= length(text)
             AND (i = 1 OR substr(text, CAST(i - 1 AS INT), 1) = ' ')
             AND substr(text, CAST(i AS INT), 1) <> ' '),
         r AS (SELECT doc_id, sfx,
                 row_number() OVER (ORDER BY sfx ASC, doc_id ASC) AS rn
               FROM sfx),
         p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.sfx AS sa, b.sfx AS sb
                FROM r a JOIN r b ON b.rn = a.rn + 1
                WHERE a.doc_id <> b.doc_id),
         p AS (SELECT doc_a, doc_b,
                 coalesce(list_min(list_filter(
                     range(1, 1 + least(length(sa), length(sb))),
                     j -> substr(sa, CAST(j AS INT), 1)
                       <> substr(sb, CAST(j AS INT), 1))) - 1,
                   least(length(sa), length(sb))) AS lcp,
                 sa
               FROM p0),
         c AS (SELECT doc_a AS doc_id, lcp,
                 substr(sa, 1, CAST(lcp AS INT)) AS sub FROM p
               UNION ALL
               SELECT doc_b, lcp, substr(sa, 1, CAST(lcp AS INT)) FROM p),
         ns AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sfx
                FROM sfx GROUP BY 1),
         m AS (SELECT doc_id, CAST(lcp AS BIGINT) AS max_lcp, sub AS top_sub,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY lcp DESC, sub DESC) AS rk
               FROM c)
         SELECT m.doc_id, ns.n_sfx, m.max_lcp, m.top_sub
         FROM m JOIN ns USING (doc_id) WHERE rk = 1"""
    // q307: session×episode interval-overlap census — q22 sessions
    // joined to q221 burst episodes on inclusive ms overlap; the Spark
    // side is the bucketed rewrite, the oracle the direct inequality
    // join (exact-long overlap arithmetic on both).
    val sessionOverlapOracle: String =
      s"""WITH sess AS (
${base("q22_sessionize")}),
         ep0 AS (
${base("q221_burst_episodes")}),
         ep AS (SELECT event_type, start_h,
                  start_h * 3600000 AS e_lo,
                  (end_h + 1) * 3600000 - 1 AS e_hi
                FROM ep0),
         ov AS (SELECT ep.event_type, ep.start_h, sess.user_id,
                  least(sess.session_end_ms, ep.e_hi)
                    - greatest(sess.session_start_ms, ep.e_lo) AS o
                FROM sess JOIN ep
                  ON sess.session_start_ms <= ep.e_hi
                 AND ep.e_lo <= sess.session_end_ms)
         SELECT event_type, start_h,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(o) AS BIGINT) AS total_overlap_ms,
           CAST(max(o) AS BIGINT) AS max_overlap_ms
         FROM ov GROUP BY 1, 2"""
    // q298: token-weighted vs unweighted lower-median doc length per
    // source — rank/weight-rank select on exact integers.
    val weightedMedianOracle =
      """WITH d AS (SELECT source, doc_id, n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS w
           FROM documents),
         c AS (SELECT source, doc_id, n_chars, w,
             sum(w) OVER (PARTITION BY source
               ORDER BY n_chars ASC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
             sum(w) OVER (PARTITION BY source) AS totw,
             row_number() OVER (PARTITION BY source
               ORDER BY n_chars ASC, doc_id ASC) AS rk,
             count(*) OVER (PARTITION BY source) AS n
           FROM d),
         wm AS (SELECT source, CAST(n AS BIGINT) AS n_docs,
             CAST(totw AS BIGINT) AS n_tokens,
             n_chars AS wmedian_len
           FROM c WHERE cumw * 2 >= totw
           QUALIFY row_number() OVER (PARTITION BY source
             ORDER BY n_chars ASC, doc_id ASC) = 1),
         dm AS (SELECT source, n_chars AS median_len
           FROM c WHERE rk * 2 >= n
           QUALIFY row_number() OVER (PARTITION BY source
             ORDER BY n_chars ASC, doc_id ASC) = 1)
         SELECT wm.source, wm.n_docs, wm.n_tokens, dm.median_len,
           wm.wmedian_len
         FROM wm JOIN dm ON dm.source = wm.source"""
    // q299: compressed-domain SemDeDup funnel — q94's cell pairs scored
    // symmetric-ADC from the 512-entry code LUT, 0.25 pre-filter, exact
    // 0.35 verify on survivors only.
    val pqSemDedupOracle =
      s"""WITH enc AS (
${base("q98_pq_encode")}),
         e AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
         n AS (SELECT vec_id, emb,
                 sqrt(list_reduce(list_transform(emb, x -> x*x),
                   (a,b)->a+b)) AS nrm
               FROM e),
         cent AS (SELECT vec_id AS cent_id, emb AS cemb, nrm AS cnrm
                  FROM n WHERE vec_id < 8),
         ranked AS (
           SELECT vec_id, cent_id,
                  row_number() OVER (PARTITION BY vec_id
                    ORDER BY ccos DESC, cent_id ASC) AS crk
           FROM (SELECT n.vec_id, c.cent_id,
                   list_reduce(list_transform(n.emb, (x,i) -> x * c.cemb[i]),
                     (a,b)->a+b) / (n.nrm*c.cnrm) AS ccos
                 FROM n, cent c)),
         assigned AS (SELECT r.vec_id, r.cent_id AS cell, n.emb, n.nrm
                      FROM ranked r JOIN n USING (vec_id) WHERE crk = 1),
         cb AS (SELECT vec_id AS code, emb AS cemb FROM e WHERE vec_id < 8),
         lut AS (SELECT s.s AS sub, a.code AS code_a, b.code AS code_b,
             CAST(floor(list_reduce(list_transform(
                 a.cemb[CAST(s.s*8+1 AS INT):CAST(s.s*8+8 AS INT)],
                 (x, i) -> x * b.cemb[CAST(s.s*8 + i AS INT)]),
                 (p, q) -> p + q) * 1000000 + 1.0/3) AS BIGINT) AS ip_q
           FROM cb a, cb b, range(8) s(s)),
         rnlut AS (SELECT s.s AS sub, a.code,
             CAST(floor(list_reduce(list_transform(
                 a.cemb[CAST(s.s*8+1 AS INT):CAST(s.s*8+8 AS INT)],
                 x -> x*x), (p, q) -> p + q) * 1000000 + 1.0/3)
               AS BIGINT) AS rn_q
           FROM cb a, range(8) s(s)),
         rn2 AS (SELECT enc.vec_id, CAST(sum(r.rn_q) AS BIGINT) AS rn2
                 FROM enc JOIN rnlut r
                   ON r.sub = enc.sub AND r.code = enc.code
                 GROUP BY 1),
         pairs AS (SELECT a.vec_id AS va, b.vec_id AS vb, a.cell
                   FROM assigned a JOIN assigned b
                     ON a.cell = b.cell AND a.vec_id < b.vec_id),
         sdc AS (SELECT p.va, p.vb, p.cell,
             CAST(sum(l.ip_q) AS BIGINT) AS ip
           FROM pairs p
             JOIN enc ea ON ea.vec_id = p.va
             JOIN enc eb ON eb.vec_id = p.vb AND eb.sub = ea.sub
             JOIN lut l ON l.sub = ea.sub AND l.code_a = ea.code
               AND l.code_b = eb.code
           GROUP BY 1, 2, 3),
         adcpass AS (SELECT s.va, s.vb, s.cell
           FROM sdc s JOIN rn2 ra ON ra.vec_id = s.va
                JOIN rn2 rb ON rb.vec_id = s.vb
           WHERE CAST(s.ip AS DOUBLE)
             / sqrt(CAST(ra.rn2 AS DOUBLE) * CAST(rb.rn2 AS DOUBLE))
             >= 0.25),
         ver AS (SELECT p.va, p.vb,
             CASE WHEN list_reduce(list_transform(a.emb,
                 (x,i) -> x * b.emb[i]), (p2,q2)->p2+q2)
               / (a.nrm*b.nrm) >= 0.35 THEN 1 ELSE 0 END AS hit
           FROM adcpass p JOIN assigned a ON a.vec_id = p.va
                JOIN assigned b ON b.vec_id = p.vb),
         nc AS (SELECT vb AS vec_id, CAST(count(*) AS BIGINT) AS n_cands
                FROM pairs GROUP BY 1),
         np AS (SELECT vb AS vec_id, CAST(count(*) AS BIGINT) AS n_adc_pass
                FROM adcpass GROUP BY 1),
         nv AS (SELECT vb AS vec_id, CAST(sum(hit) AS BIGINT) AS n_verified
                FROM ver GROUP BY 1)
         SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell,
           CAST(coalesce(nc.n_cands, 0) AS BIGINT) AS n_cands,
           CAST(coalesce(np.n_adc_pass, 0) AS BIGINT) AS n_adc_pass,
           CAST(coalesce(nv.n_verified, 0) AS BIGINT) AS n_verified,
           coalesce(nv.n_verified, 0) = 0 AS kept
         FROM assigned a
           LEFT JOIN nc ON nc.vec_id = a.vec_id
           LEFT JOIN np ON np.vec_id = a.vec_id
           LEFT JOIN nv ON nv.vec_id = a.vec_id"""
    // q258: per-language Zipf OLS on the 1e4-quantized ln grid
    val zipfOracle =
      """WITH tf AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
           FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
                 FROM documents)
           WHERE tok <> '' GROUP BY 1, 2),
         hd AS (SELECT lang,
             CAST(floor(ln(CAST(rk AS DOUBLE)) * 10000 + 1.0/3)
               AS BIGINT) AS xq,
             CAST(floor(ln(CAST(cnt AS DOUBLE)) * 10000 + 1.0/3)
               AS BIGINT) AS yq
           FROM (SELECT lang, cnt,
               row_number() OVER (PARTITION BY lang
                 ORDER BY cnt DESC, tok ASC) AS rk
             FROM tf)
           WHERE rk <= 50),
         s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
             sum(CAST(xq AS HUGEINT)) AS sx,
             sum(CAST(yq AS HUGEINT)) AS sy,
             sum(CAST(xq AS HUGEINT) * yq) AS sxy,
             sum(CAST(xq AS HUGEINT) * xq) AS sxx
           FROM hd GROUP BY 1)
         SELECT lang, n_types,
           CASE WHEN CAST(n_types AS HUGEINT) * sxx <> sx * sx
             THEN CAST(floor(CAST(CAST(n_types AS HUGEINT) * sxy
               - sx * sy AS DOUBLE) * 1000
               / CAST(CAST(n_types AS HUGEINT) * sxx - sx * sx AS DOUBLE)
               + 1.0/3) AS BIGINT)
             ELSE 0 END AS slope_milli
         FROM s"""
    base + ("q231_transitivity" -> transOracle) +
      ("q257_fs_weights" -> fsOracle) +
      ("q258_zipf_slope" -> zipfOracle) +
      ("q259_cdc_chunks" -> cdcOracle) +
      ("q260_burstiness" -> burstOracle) +
      ("q261_sttr" -> sttrOracle) +
      ("q262_readability" -> readabilityOracle) +
      ("q263_isotropy" -> isotropyOracle) +
      ("q264_quant_fidelity" -> quantFidelityOracle) +
      ("q265_pq_distortion" -> pqDistortionOracle) +
      ("q266_mcnemar" -> mcnemarOracle) +
      ("q267_brier_decomp" -> brierOracle) +
      ("q268_welch_psd" -> welchOracle) +
      ("q269_hjorth" -> hjorthOracle) +
      ("q270_local_cc" -> localCcOracle) +
      ("q271_variance_ratio" -> vrOracle) +
      ("q272_spiegelhalter" -> spiegelhalterOracle) +
      ("q273_vocab_gini" -> vocabGiniOracle) +
      ("q274_savgol" -> savgolOracle) +
      ("q275_peaks" -> peaksOracle) +
      ("q276_rank_stability" -> rankStabilityOracle) +
      ("q277_auc_ci" -> aucCiOracle) +
      ("q278_kendall_w" -> kendallWOracle) +
      ("q279_mode_track" -> modeTrackOracle) +
      ("q280_hurst" -> hurstOracle) +
      ("q281_runs_test" -> runsOracle) +
      ("q282_xcorr_matrix" -> xcorrMatrixOracle) +
      ("q283_phash_radius" -> phashRadiusOracle) +
      ("q284_ivf_pq_adc" -> ivfPqAdcOracle) +
      ("q285_wedge_sample" -> wedgeSampleOracle) +
      ("q286_cell_label_js" -> cellLabelJsOracle) +
      ("q287_benford" -> benfordOracle) +
      ("q288_bootstrap_ci" -> bootstrapCiOracle) +
      ("q289_doc_ce" -> docCeOracle) +
      ("q290_adc_recall" -> adcRecallOracle) +
      ("q291_ngram_contam" -> ngramContamOracle) +
      ("q292_hll_distinct" -> hllOracle) +
      ("q293_blob_entropy" -> blobEntropyOracle) +
      ("q294_cell_silhouette" -> cellSilhouetteOracle) +
      ("q295_retention" -> retentionOracle) +
      ("q296_interarrival_b" -> interarrivalBOracle) +
      ("q297_code_usage" -> codeUsageOracle) +
      ("q298_weighted_median" -> weightedMedianOracle) +
      ("q299_pq_semdedup" -> pqSemDedupOracle) +
      ("q300_opq_permute" -> opqOracle) +
      ("q301_unigram_em" -> unigramOracle) +
      ("q302_sketch_jaccard" -> sketchJaccardOracle) +
      ("q303_unigram_comp" -> unigramCompressionOracle) +
      ("q304_probe_sweep" -> probeSweepOracle) +
      ("q305_lomb_scargle" -> lombScargleOracle) +
      ("q306_suffix_dup" -> suffixDupOracle) +
      ("q308_rq_encode" -> rqEncodeOracle) +
      ("q309_isotonic" -> isotonicOracle) +
      ("q310_kmv_intersect" -> kmvOracle) +
      ("q311_bloom_fp" -> bloomFpOracle) +
      ("q312_ensemble_dedup" -> ensembleOracle) +
      ("q313_kn_entropy" -> knOracle) +
      ("q314_confident_joint" -> confidentJointOracle) +
      ("q315_hopkins" -> hopkinsOracle) +
      ("q316_dup_coverage" -> dupCoverageOracle) +
      ("q317_keyness" -> keynessOracle) +
      ("q318_ljung_box" -> ljungBoxOracle) +
      ("q319_gap_statistic" -> gapStatOracle) +
      ("q320_textrank" -> textrankOracle) +
      ("q321_kmeans_par" -> kmeansParOracle) +
      ("q322_dbscan_core" -> dbscanCoreOracle) +
      ("q323_facility_select" -> facilityOracle) +
      ("q324_ppr_seeds" -> pprOracle) +
      ("q325_lpa_communities" -> lpaOracle) +
      ("q326_fisher_g" -> fisherGOracle) +
      ("q307_session_overlap" -> sessionOverlapOracle) +
      ("q255_cluster_split" -> clusterSplitOracle) +
      ("q256_translated_dups" -> translatedDupsOracle) +
      ("q254_bpe_merges" -> bpeOracle) +
      ("q250_modularity" -> modularityOracle) +
      ("q252_lsh_curve" -> lshOcOracle) +
      ("q253_hybrid_rrf" -> rrfOracle) +
      ("q247_t_closeness" -> tClosenessOracle) +
      ("q248_neyman_alloc" -> neymanOracle) +
      ("q249_participation" -> prOracle) +
      ("q251_cohen_kappa" -> kappaOracle) +
      ("q235_assortativity" -> assortOracle) +
      ("q238_cluster_sizes" -> clusterSizesOracle) +
      ("q243_lex_sem" -> lexSemOracle) +
      ("q244_cell_label_ari" -> cellAriOracle) +
      ("q245_radius_sweep" -> radiusOracle) +
      ("q246_dedup_savings" -> dedupSavingsOracle) + ("q230_dup_core" ->
      (s"""WITH pairs AS MATERIALIZED (
${base("q28_simhash_pairs")}),
         s0 AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM pairs
           UNION ALL SELECT doc_b, doc_a FROM pairs)""" + kcorePeel + """
         SELECT u AS doc_id, CAST(count(*) AS BIGINT) AS core_deg
         FROM s8 GROUP BY 1"""))
  }
}
