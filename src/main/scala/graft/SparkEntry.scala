package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The composite corpus-cleaning pipeline: quality gate → exact dedup →
    * near-dup removal — one query exercising tokenization, scoring,
    * window dedup, and the shingle self-join.
    */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.cleanCorpus(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Relational.q1Agg _),
    "q2_join" -> (Relational.q2Join _),
    "q3_topk" -> (Relational.q3TopK _),
    "q4_window" -> (Relational.q4Window _),
    "q5_semijoin" -> (Relational.q5SemiJoin _),
    "q6_antijoin" -> (Relational.q6AntiJoin _),
    "q7_setops" -> (Relational.q7SetOps _),
    "q8_rollup" -> (Relational.q8Rollup _),
    "q9_scalar" -> (Relational.q9Scalar _),
    "q10_distinct_agg" -> (Relational.q10DistinctAgg _),
    "q11_having" -> (Relational.q11Having _),
    "q12_subquery" -> (Relational.q12Subquery _),
    "q13_case_agg" -> (Relational.q13CaseAgg _),
    "wc_wordcount" -> (TextQueries.wordCount _),
    "wc_inverted_index" -> (TextQueries.invertedIndex _),
    "ta_tokens" -> (TextAnalysis.tokens _),
    "ta_quality" -> (TextAnalysis.quality _),
    "ta_langid" -> (TextAnalysis.langId _),
    "ta_fingerprint" -> (TextAnalysis.fingerprint _),
    "ta_profile" -> (TextAnalysis.profile _),
    "ta_charngrams" -> (TextAnalysis.charNgrams _),
    "ta_winnow" -> (TextAnalysis.winnow _),
    "ta_zipf" -> (TextAnalysis.zipf _),
    "ta_gopher" -> (TextAnalysis.gopher _),
    "dd_exact" -> (Dedup.exact _),
    "dd_ngram_jaccard" -> (Dedup.ngramJaccard _),
    "dd_minhash" -> (Dedup.minhash _),
    "dd_simhash" -> (Dedup.simhash _),
    "dd_embed_cosine" -> (Dedup.embedCosine _),
    "dd_embed_bucketed" -> (Dedup.embedCosineBucketed _),
    "dd_embed_hi" -> (Dedup.embedHi _),
    "dd_clusters" -> (Dedup.clusters _),
    "dd_keep_best" -> (Dedup.keepBest _),
    "ann_topk" -> (Similarity.annTopK _),
    "ann_ivf" -> (Similarity.annIvf _),
    "ann_ivf_kmeans" -> (Similarity.annIvfKmeans _),
    "ann_ivf_pq" -> (Similarity.annIvfPq _),
    "ann_lsh" -> (Similarity.annLsh _),
    "ann_ivf_append" -> (Similarity.annIvfAppend _),
    "ev_window_agg" -> (Events.windowAgg _),
    "ev_sessionize" -> (Events.sessionize _),
    "ev_json" -> (Events.jsonExtract _),
    "ev_topusers" -> (Events.topUsersPerHour _),
    "ev_attribution" -> (Events.attribution _),
    "ev_props_map" -> (Events.propsMap _),
    "q15_range_join" -> (Events.rangeJoin _),
    "q16_sketch" -> (Events.approxSketch _),
    "q17_percentile" -> (Relational.q17Percentile _),
    "q17b_approx_percentile" -> (Relational.q17bApproxPercentile _),
    "q19_setops_all" -> (Relational.q19SetOpsAll _),
    "q20_corr_subquery" -> (Relational.q20CorrSubquery _),
    "q21_stringagg" -> (Relational.q21StringAgg _),
    "q22_datefns" -> (Relational.q22DateFns _),
    "q23_arrays" -> (Relational.q23Arrays _),
    "q18_pivot" -> (Relational.q18Pivot _),
    "q24_cube" -> (Relational.q24Cube _),
    "q25_windowfns" -> (Relational.q25WindowFns _),
    "dd_editdist" -> (Dedup.editDistance _),
    "q14_asof" -> (graft.operators.AsOfJoin.query _),
    "mm_frames" -> (graft.multimodal.Multimodal.frameSample _),
    "mm_audio_windows" -> (graft.multimodal.Multimodal.audioWindows _),
    "mm_resize_meta" -> (graft.multimodal.Multimodal.resizeMeta _),
    "mm_features" -> (graft.multimodal.Multimodal.features _),
    "pipeline_clean_corpus" -> (Pipeline.cleanCorpus _),
    "ta_tfidf" -> (CorpusOps.tfidf _),
    "ta_repetition" -> (CorpusOps.repetition _),
    "ta_perplexity" -> (CorpusOps.perplexity _),
    "dd_decontaminate" -> (CorpusOps.decontaminate _),
    "dd_decontaminate_fuzzy" -> (CorpusOps.decontaminateFuzzy _),
    // The staged-basis deployment form inside the correctness gate
    // (round 17): stage once, dispatch reads the staged table, same
    // oracles as the recompute forms.
    "dd_minhash_staged" -> (Dedup.minhashStagedEntry _),
    "dd_decontaminate_fuzzy_staged" -> (CorpusOps.decontaminateFuzzyStaged _),
    "ds_mix" -> (CorpusOps.sourceMix _),
    "ds_pack" -> (CorpusOps.pack _),
    // Structured Streaming pipelines run to completion (file source →
    // stateful operator → sink), result returned as a batch DataFrame.
    "st_window_agg" -> (graft.streaming.StreamingQueries.windowAgg _),
    "st_sessionize" -> (graft.streaming.StreamingQueries.sessionize _),
    "ds_split" -> (CorpusOps.split3Way _),
    "ev_funnel" -> (Events.funnel _),
    "ev_retention" -> (Events.retention _),
    "ev_anomaly" -> (Events.anomaly _),
    "dd_embed_auto" -> (Dedup.embedAuto _),
    "ta_ngram_stats" -> (TextAnalysis.ngramStats _),
    "ta_scrub" -> (TextAnalysis.scrub _),
    "q26_grouping_sets" -> (Relational.q26GroupingSets _),
    "ev_markov" -> (Events.markov _),
    "ev_rolling" -> (Events.rolling _),
    "dd_winnow" -> (Dedup.winnowPairs _),
    "dd_substring" -> (Dedup.substringDup _),
    "dd_substring_cut" -> (Dedup.substringCut _),
    "dd_dup_stats" -> (Dedup.dupStats _),
    "st_dedup" -> (graft.streaming.StreamingQueries.dedup _),
    "ev_paths" -> (Events.paths _),
    "ev_histogram" -> (Events.histogram _),
    "ds_buckets" -> (CorpusOps.buckets _),
    "ds_curriculum" -> (CorpusOps.curriculum _),
    "ds_weights" -> (CorpusOps.weights _),
    "ta_readability" -> (TextAnalysis.readability _),
    "ta_entropy" -> (TextAnalysis.entropy _),
    "ann_range" -> (Similarity.annRange _),
    "q27_salted_agg" -> (Relational.q27SaltedAgg _),
    "st_sliding" -> (graft.streaming.StreamingQueries.sliding _),
    "st_interval_join" -> (graft.streaming.StreamingQueries.intervalJoin _),
    "ev_ab_test" -> (Events.abTest _),
    "dd_lines" -> (Dedup.lines _),
    "dd_delta" -> (Dedup.deltaDedup _),
    // approximate (IVF under a metadata predicate) → rows-only like the
    // rest of the ANN family; recall floor vs the exact filtered brute
    // force in SimilaritySpec + RecallProbe
    "ann_filtered" -> (Similarity.annFiltered _),
    // the ~1% stratum: same index, probe depth re-calibrated per stratum
    "ann_filtered_rare" -> (Similarity.annFilteredRare _),
    // selectivity-axis dispatch: exact stratum brute force below the
    // 2.5*N^(-1/4) crossover (recall 1.0 AND fewer rows than the index
    // would touch), the re-calibrated IVF path above it. At oracle scale
    // the decision is exact-by-cost-rule, so it carries a full oracle.
    "ann_filtered_auto" -> (Similarity.annFilteredAuto _),
    "ann_filtered_range" -> (Similarity.annFilteredRange _),
    "mm_phash" -> (graft.multimodal.Multimodal.phash _),
    "dd_embed_hi768" -> (Dedup.embedHi768 _),
    "dd_embed_hi768_staged" -> (Dedup.embedHi768StagedEntry _),
    "dd_delta_embed" -> (Dedup.deltaEmbed _),
    "dd_delta_chain" -> (Dedup.deltaChain _),
    "dd_delta_embed_chain" -> (Dedup.deltaEmbedChain _),
    // The IVF deployment form inside the correctness gate (round 19):
    // stage the serving index (postings + centroids + calibrated probe
    // depth), then run ann_ivf's plan off the staged artifacts. Shares
    // ann_ivf's dynamic oracle — staged ≡ recompute proven by hash.
    "ann_ivf_staged" -> (Similarity.annIvfStagedEntry _),
    // The flagship with the eval-set decontamination stage composed in
    // (round 19): lines → quality → exact → near-dup → decontaminate.
    "pipeline_v2" -> (Pipeline.cleanCorpusV2 _)
  )
  /** DuckDB oracles whose SQL depends on the corpus (the approximate-ANN
    * family: the frozen index artifacts — centroids, codebooks, planes,
    * calibrated probe depths — are deterministic per corpus and are
    * inlined into the SQL as literals; every distributed search stage is
    * independently recomputed by DuckDB). Verify merges these into
    * oracle_sql.json next to [[oracleSql]].
    */
  def dynamicOracleSql(spark: SparkSession, sfDir: String): Map[String, String] =
    Similarity.oracleSqlDynamic(spark, sfDir)
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1AggSql,
    "q2_join" -> Relational.q2JoinSql,
    "q3_topk" -> Relational.q3TopKSql,
    "q4_window" -> Relational.q4WindowSql,
    "q5_semijoin" -> Relational.q5SemiJoinSql,
    "q6_antijoin" -> Relational.q6AntiJoinSql,
    "q7_setops" -> Relational.q7SetOpsSql,
    "q8_rollup" -> Relational.q8RollupSql,
    "q9_scalar" -> Relational.q9ScalarSql,
    "q10_distinct_agg" -> Relational.q10DistinctAggSql,
    "q11_having" -> Relational.q11HavingSql,
    "q12_subquery" -> Relational.q12SubquerySql,
    "q13_case_agg" -> Relational.q13CaseAggSql,
    "wc_wordcount" -> TextQueries.wordCountSql,
    "wc_inverted_index" -> TextQueries.invertedIndexSql,
    "ta_tokens" -> TextAnalysis.tokensSql,
    "ta_quality" -> TextAnalysis.qualitySql,
    "ta_langid" -> TextAnalysis.langIdSql,
    "ta_fingerprint" -> TextAnalysis.fingerprintSql,
    "ta_profile" -> TextAnalysis.profileSql,
    "ta_charngrams" -> TextAnalysis.charNgramsSql,
    "dd_exact" -> Dedup.exactSql,
    "dd_ngram_jaccard" -> Dedup.ngramJaccardSql,
    "dd_minhash" -> Dedup.minhashSql,
    "dd_simhash" -> Dedup.simhashSql,
    "dd_embed_cosine" -> Dedup.embedCosineSql,
    // same oracle: the bucketed path must equal the all-pairs form
    "dd_embed_bucketed" -> Dedup.embedCosineSql,
    // production-threshold (τ=0.8) pass over the planted corpus — the
    // oracle restates the plant construction + all-pairs form
    "dd_embed_hi" -> Dedup.embedHiSql,
    "dd_clusters" -> Dedup.clustersSql,
    "dd_keep_best" -> Dedup.keepBestSql,
    "ann_topk" -> Similarity.annTopKSql,
    // ann_filtered_auto: the dispatch picks the EXACT stratum brute force
    // below the cost crossover — every oracle-scale corpus is — so this
    // one member of the filtered family is fully SQL-restatable; a
    // decision flip at oracle scale is a loud gate failure by design.
    "ann_filtered_auto" -> Similarity.annFilteredAutoSql,
    // ann_ivf / ann_ivf_kmeans / ann_ivf_pq / ann_lsh / ann_ivf_append:
    // approximate BY CONSTRUCTION — an exact SQL restatement would be ann_topk's
    // oracle, which they must NOT equal (that's the speed/recall trade).
    // Driver rows-only; SimilaritySpec asserts recall@5 floors vs
    // ann_topk, and RecallProbe measures the multi-scale curve.
    // q16_sketch / q17b: the raw sketch estimates are engine-specific
    // (DuckDB's HLL and quantile sketches differ by design), so since
    // round 11 each entry carries its error contract IN-BAND — exact
    // ndv / rank-fraction counts plus assert_true'd *_ok booleans — and
    // the oracle restates the deterministic columns (verdict r10 #6).
    "q16_sketch" -> Events.approxSketchSql,
    "q17b_approx_percentile" -> Relational.q17bApproxPercentileSql,
    "ta_winnow" -> TextAnalysis.winnowSql,
    "ta_zipf" -> TextAnalysis.zipfSql,
    "ta_gopher" -> TextAnalysis.gopherSql,
    "ev_window_agg" -> Events.windowAggSql,
    "ev_sessionize" -> Events.sessionizeSql,
    "ev_json" -> Events.jsonExtractSql,
    "ev_topusers" -> Events.topUsersPerHourSql,
    "ev_attribution" -> Events.attributionSql,
    "ev_props_map" -> Events.propsMapSql,
    "q15_range_join" -> Events.rangeJoinSql,
    "q17_percentile" -> Relational.q17PercentileSql,
    "q19_setops_all" -> Relational.q19SetOpsAllSql,
    "q20_corr_subquery" -> Relational.q20CorrSubquerySql,
    "q21_stringagg" -> Relational.q21StringAggSql,
    "q22_datefns" -> Relational.q22DateFnsSql,
    "q23_arrays" -> Relational.q23ArraysSql,
    "q18_pivot" -> Relational.q18PivotSql,
    "q24_cube" -> Relational.q24CubeSql,
    "q25_windowfns" -> Relational.q25WindowFnsSql,
    "dd_editdist" -> Dedup.editDistanceSql,

    "q14_asof" -> graft.operators.AsOfJoin.querySql,
    "mm_frames" -> graft.multimodal.Multimodal.frameSampleSql,
    "mm_audio_windows" -> graft.multimodal.Multimodal.audioWindowsSql,
    "mm_resize_meta" -> graft.multimodal.Multimodal.resizeMetaSql,
    // mm_features: the decode is real (ImageIO pixels / PCM samples /
    // RIFF-DIB frames), and because the synthetic payloads derive from
    // integer-deterministic closed forms and the round trips are
    // bit-lossless, the oracle restates every decoded statistic
    // analytically over generate_series (no codec in DuckDB needed).
    "mm_features" -> graft.multimodal.Multimodal.featuresSql,
    "pipeline_clean_corpus" -> Pipeline.cleanCorpusSql,
    "pipeline_v2" -> Pipeline.cleanCorpusV2Sql,
    "ta_tfidf" -> CorpusOps.tfidfSql,
    "ta_repetition" -> CorpusOps.repetitionSql,
    "ta_perplexity" -> CorpusOps.perplexitySql,
    "dd_decontaminate" -> CorpusOps.decontaminateSql,
    // bipartite MinHash funnel ≡ the exact quadratic form (the
    // dd_minhash equivalence argument, bipartite)
    "dd_decontaminate_fuzzy" -> CorpusOps.decontaminateFuzzySql,
    // staged ≡ recompute: the dispatch is row-identical by construction
    // (StagedBasisSpec), so the staged entries share their recompute
    // forms' oracles — the driver's hash gate re-proves the identity.
    "dd_minhash_staged" -> Dedup.minhashSql,
    "dd_decontaminate_fuzzy_staged" -> CorpusOps.decontaminateFuzzySql,
    "ds_mix" -> CorpusOps.sourceMixSql,
    "ds_pack" -> CorpusOps.packSql,
    "st_window_agg" -> graft.streaming.StreamingQueries.windowAggSql,
    "st_sessionize" -> graft.streaming.StreamingQueries.sessionizeSql,
    "ds_split" -> CorpusOps.split3WaySql,
    "ev_funnel" -> Events.funnelSql,
    "ev_retention" -> Events.retentionSql,
    "ev_anomaly" -> Events.anomalySql,
    // the dispatch is output-identical to both embed forms — same oracle
    "dd_embed_auto" -> Dedup.embedCosineSql,
    "ta_ngram_stats" -> TextAnalysis.ngramStatsSql,
    "ta_scrub" -> TextAnalysis.scrubSql,
    "q26_grouping_sets" -> Relational.q26GroupingSetsSql,
    "ev_markov" -> Events.markovSql,
    "ev_rolling" -> Events.rollingSql,
    "dd_winnow" -> Dedup.winnowPairsSql,
    "dd_substring" -> Dedup.substringDupSql,
    "dd_substring_cut" -> Dedup.substringCutSql,
    "dd_dup_stats" -> Dedup.dupStatsSql,
    "st_dedup" -> graft.streaming.StreamingQueries.dedupSql,
    "ev_paths" -> Events.pathsSql,
    "ev_histogram" -> Events.histogramSql,
    "ds_buckets" -> CorpusOps.bucketsSql,
    "ds_curriculum" -> CorpusOps.curriculumSql,
    "ds_weights" -> CorpusOps.weightsSql,
    "ta_readability" -> TextAnalysis.readabilitySql,
    "ta_entropy" -> TextAnalysis.entropySql,
    "ann_range" -> Similarity.annRangeSql,
    "q27_salted_agg" -> Relational.q27SaltedAggSql,
    "st_sliding" -> graft.streaming.StreamingQueries.slidingSql,
    "st_interval_join" -> graft.streaming.StreamingQueries.intervalJoinSql,
    "ev_ab_test" -> Events.abTestSql,
    "dd_lines" -> Dedup.linesSql,
    // bipartite funnel ≡ exact quadratic form restricted to batch-touching
    // pairs (the dd_minhash equivalence argument)
    "dd_delta" -> Dedup.deltaDedupSql,
    // same bipartite restriction over the deterministic embed-plant
    // corpus; the even/odd plant split means the oracle actively rejects
    // old×old re-emission
    "dd_delta_embed" -> Dedup.deltaEmbedSql,
    // pigeonhole funnel complete for hamming ≤ 4; pixels are closed-form
    // (the mm_features analytic-oracle argument), so the exact all-pairs
    // dHash form is SQL-restatable
    "mm_phash" -> graft.multimodal.Multimodal.phashSql,
    // production-dimension (768-d) plant corpus from the shared md5
    // primitive — construction + all-pairs form restated bit-exactly
    "dd_embed_hi768" -> Dedup.embedHi768Sql,
    "dd_embed_hi768_staged" -> Dedup.embedHi768Sql,
    // multi-batch lifecycle: per-step bipartite restriction — step 1 as
    // of B1's arrival, step 2 over old ∪ B1, so re-emission of an earlier
    // batch's pairs (or any old×old pair) hash-mismatches
    "dd_delta_chain" -> Dedup.deltaChainSql,
    "dd_delta_embed_chain" -> Dedup.deltaEmbedChainSql
  )
}
