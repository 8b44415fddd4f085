package graft

/** Fleet-wide single-partition audit: every gated query's executed plan is
  * scanned for `Exchange SinglePartition` — the stage that funnels ALL
  * rows through one reducer and the classic 100 TB scale-killer when the
  * input is corpus-sized.
  *
  * A small allowlist is legitimate: a single partition is fine when what
  * flows through it is (a) the handful of partial aggregates of a global
  * aggregation (map-side combine happened below), or (b) a frame bounded
  * by data CARDINALITY (distinct dates, labels, stat rows), not corpus
  * size. Anything outside the allowlist fails this spec, so a new query
  * cannot silently ship a global sort/window over raw rows.
  */
class WindowAuditSpec extends SparkSpec {

  /** query -> why its single-partition stage is bounded at scale */
  private val allowed: Map[String, String] = Map(
    "q_adf" -> "global scalar agg: six distributed sums, one output row",
    "q_adf_lag1" ->
      "lag window + scalar agg over the PRE-AGGREGATED daily series",
    "q_adf_autolag" ->
      "lag window + 31-sum scalar agg over the PRE-AGGREGATED daily series",
    "q_ann_recall" ->
      "final scalar agg over the queries×k-bounded pair frame (one row)",
    "q_ar_forecast" ->
      "lag window + scalar agg over the PRE-AGGREGATED daily series",
    "q_sarima_lite" -> ("seasonal-diff lag + AR lag windows + the " +
      "period-bounded anchor index, all over the PRE-AGGREGATED series"),
    "q_temperature_mix" -> ("pinned-order normalizer fold + 1-row " +
      "total scalar, both over the SOURCES-bounded frame"),
    "q_source_shrinkage" ->
      "1-row global-sums scalar agg over the sources-bounded frame",
    "q_bpe_encode" -> ("merge-list collect: k-row (model-sized) learned-" +
      "merge frame folded into one broadcast array row"),
    "q_unigram_train" -> ("vocab-map collect + count-total scalar: the " +
      "seed-capped (model-sized) piece table folded into one broadcast " +
      "map row per EM round, plus the seed top-K TakeOrdered over the " +
      "substring-bounded seed frame (q_bpe_encode shape)"),
    "q_unigram_encode" -> ("vocab-map collect: the PUBLISHED " +
      "(model-sized) piece table folded into one broadcast map row"),
    "q_tokenizer_compare" -> ("two model collects: BPE merge array + " +
      "unigram vocab map, both model-sized broadcast 1-row frames"),
    "q_windowed_fertility" -> ("vocab-map collect: the PUBLISHED " +
      "(model-sized) piece table folded into one broadcast map row " +
      "for the constant-key stream-static join"),
    "q_bpe_fertility" -> ("merge-list collect: k-row (model-sized) " +
      "learned-merge frame folded into one broadcast array row " +
      "(q_bpe_encode shape)"),
    "q_brier" -> "global scalar agg (one output row)",
    "q_gbt_eval" -> ("global F0/ybar scalar aggs + the final n/RMSE/MAE/" +
      "R² summary agg (one output row)"),
    "q_gbt_depth2_eval" -> ("global F0/ybar scalar aggs + the final " +
      "n/RMSE/MAE/R² summary agg (one output row; q_gbt_eval shape)"),
    // q_gbt_score / q_gbt_pdp / q_gbt_depth2_score left the allowlist
    // in round 16: the compiled scorers pull the model at plan time, so
    // no single-partition model-list collect remains in those plans
    // (q_gbt_pdp's mean folds stay GRID-partitioned, outside this audit)
    "q_gbt_perm_importance" -> ("per-feature 1-row RMSE scalar aggs; " +
      "the permutation windows are BUCKET-partitioned (n/256 rows " +
      "each); the compiled scorer removed the model-list collect"),
    "q_gbt_importance" -> ("pinned-order gain folds over the " +
      "MODEL-SIZED published split rows (3·rounds frame)"),
    "q_calendar_gapfill" -> "global min/max date agg feeding sequence()",
    "q_chrono_split" -> "cumulative window over the DISTINCT-DATE frame",
    "q_concurrency" ->
      "midnight-carry prefix sum over the PER-DAY net-delta frame",
    "q_cumulative_users" ->
      "running sum over the FIRST-SEEN-DAY frame (calendar-bounded)",
    "q_mutual_info" ->
      "cell-total scalar agg (one row, broadcast back to the cell table)",
    "q_modularity" -> ("edge-count scalar agg + pinned Newman fold over " +
      "the COMMUNITIES-bounded frame"),
    "q_louvain" -> ("edge-count scalar aggs (per-move-round 2m + the " +
      "Newman m) + pinned Newman fold over the COMMUNITIES-bounded " +
      "frame; move argmax windows are node-partitioned"),
    "q_louvain2" -> ("q_louvain's scalar aggs + pinned Newman fold; " +
      "the coarse move rounds run on the COMMUNITIES-bounded super " +
      "graph with node-partitioned argmax windows"),
    "q_hurst" -> ("row-number index + pinned ln-ln OLS folds over the " +
      "DAYS-bounded daily series / <= 5 block-size rows"),
    "q_keyness" ->
      "side-token-total scalar agg (one row, broadcast back)",
    "q_hill_tail" -> ("frequency rank window over the KEY-DOMAIN-" +
      "bounded count frame (the q_zipf shape) + pinned ln folds over " +
      "<= max(k)+1 rows"),
    "q_heaps" -> ("pinned ln-ln OLS folds over the <= log2(shards)+1 " +
      "checkpoint rows (SHARDS-bounded)"),
    "q_louvain_multi" -> ("per-level 1-row exact-int Q summary aggs " +
      "(<= 5 single-row collects drive the documented early stop — " +
      "convergence control flow cannot stay lazy) + q_louvain2's " +
      "coarse-move shapes per level"),
    "q_survival" -> "max-date horizon scalar agg (one row)",
    "q_nelson_aalen" -> "max-date horizon scalar agg (one row)",
    "q_growth" -> "max-week horizon scalar agg (one row)",
    "q_abc" -> ("pinned (revenue DESC, item) cumulative-share fold " +
      "over the ITEMS-bounded per-part revenue frame (one map-side-" +
      "combined corpus pass upstream)"),
    "q_gini" -> ("pinned Lorenz folds over the BINS-bounded dyadic " +
      "revenue histogram (value-range/2^11 rows, not customers)"),
    "q_assoc_rules" ->
      "capped-basket-count scalar agg (one row, broadcast back)",
    "q_rfm" -> ("horizon + three quantile-edge scalar aggs (1 row each, " +
      "weighted over the dyadic value histogram)"),
    "q_collocations" ->
      "bigram-total scalar agg (one row, broadcast back to the pair table)",
    "q_corr_matrix" -> "global scalar agg (one output row)",
    "q_curation_funnel" -> "final 5-row stage-count aggregate + stack()",
    "q_curation_funnel_minhash" -> "final 5-row stage-count aggregate",
    "q_describe" -> "global stats agg (one output row)",
    "q_dq_report" ->
      "global rule-counter scalar agg (one row in, k rule rows out)",
    "q_describe_multi" -> "per-column stats over the histogrammed frame",
    "q_emb_quantize" -> ("per-dim edge collect: dims-bounded (64-row) " +
      "min/max frame folded into one broadcast array row"),
    "q_error_rate" -> "global ratio agg (one output row)",
    "q_eval_classify" ->
      "summary-row agg over the classes²-row confusion frame",
    "q_fit_linear" ->
      "global scalar agg: 15 distributed moment sums, one output row",
    "q_fit_logistic" -> ("fixed Newton rounds: each a 6-sum global " +
      "scalar agg, one output row"),
    "q_quality_classifier" -> ("fixture-bounded training side (44-row " +
      "labeled frame, 64-row bucket table, 1-row moment/Newton aggs); " +
      "corpus scoring stays a keyed groupBy"),
    "q_quality_classifier2" -> ("fixture-bounded training side (44-row " +
      "labeled frame, 4096-row bucket table, 1-row per-feature moment " +
      "and 3x3 Newton aggs); corpus scoring stays a keyed groupBy"),
    "q_get_or_create" -> "id assignment over the NEW-rows-only frame",
    "q_ivf_topk" -> "deterministic seed selection: orderBy+limit(nCells)",
    "q_diverse_sample" -> ("the nCells-row centroid table folded into " +
      "the 1-row broadcast candidate array (the nearest_cos kernel's " +
      "collapse, r17 — parameter-sized by construction); the per-cell " +
      "pick windows stay cell-partitioned"),
    "q_cluster_profile" -> ("deterministic seed selection (orderBy+" +
      "limit) + the share fold over the CELLS-bounded profile frame"),
    "q_pq_topk" -> ("Spark's own InjectRuntimeFilter bloom build on the " +
      "refine join's query ids: a 1-row bloom-buffer aggregate, not rows"),
    "q_ann_quality" -> ("deterministic seed selection (orderBy+limit) " +
      "and the 1-row exact-count scalar agg over the queries×k-bounded " +
      "baseline frame"),
    "q_lsh_quality" -> ("1-row exact-count scalar agg over the " +
      "queries×k-bounded baseline frame (the q_ann_quality shape)"),
    "q_jl_project" -> ("final 1-row distortion summary agg over the " +
      "bounded sampled pair frame"),
    "q_label_encode" -> "window over the distinct-label frame",
    "q_lm_perplexity" ->
      "global scalar agg: vocabulary size V, one output row",
    "q_lm_trigram" ->
      "global scalar agg: train N and V, one output row",
    "q_ccnet_buckets" -> ("global scalar aggs (train N/V, scored n, " +
      "the 1-row threshold frame) + the cumulative ECDF window over " +
      "the bounded distinct-ppl domain (the q_ks_drift class)"),
    "q_lm_5gram" ->
      "global scalar agg: train N and V, one output row",
    "q_lm_published" -> ("global scalar agg: N and V derived from the " +
      "published index's n=1 slice, one output row (the q_lm_5gram " +
      "shape)"),
    "q_lm_index_merge" -> ("global scalar agg: N and V derived from " +
      "the MERGED index's n=1 slice, one output row (the " +
      "q_lm_published shape)"),
    "q_training_order" -> ("the cumulative ECDF window over the bounded " +
      "distinct-score domain (the q_ccnet_buckets class) feeding the " +
      "1-row stage-threshold frame"),
    "q_ccnet_buckets5" -> ("global scalar aggs (train N/V, scored n, " +
      "the 1-row threshold frame) + the cumulative ECDF window over " +
      "the bounded distinct-ppl domain (the q_ccnet_buckets shape)"),
    "q_dsir" -> ("global gram-total scalars + the rank window over the " +
      "k survivors of the TakeOrdered top-k (k-bounded frame)"),
    "q_dsir_mix" -> ("the q_dsir chain's scalars and k-bounded rank " +
      "window, plus the 1-row corpus/selected count scalars"),
    "q_mix_budget" -> ("pinned-order normalizer and waterfill folds + " +
      "1-row total scalar, all over the SOURCES-bounded frame (the " +
      "q_temperature_mix shape)"),
    "q_mix_budget_apply" -> ("the q_mix_budget chain's sources-" +
      "bounded folds; the execution side is a keyed join + source " +
      "groupBy"),
    "q_pipeline_mix" -> ("the q_mix_budget chain's sources-bounded " +
      "waterfill folds + 1-row total scalar, here over the funnel-" +
      "SURVIVOR per-source frame (the funnel verdict is a published " +
      "parameter table since r17 — a bounded parquet scan)"),
    "q_filter_attribution" -> ("global rule-counter scalar agg (one " +
      "row in, five rule rows out; the q_dq_report shape)"),
    "q_lsh_calibrate" -> ("pinned-order mass folds over the " +
      "splits×grid parameter table (128 rows) and the chosen-rank " +
      "window over the log-bounded 8-split frame"),
    "q_ccnet_pipeline" -> ("the final 1-row funnel aggregate + " +
      "stack() over the checkpointed flags frame (the composed " +
      "chains' own bounded shapes — ECDF window, N/V scalars, " +
      "fixture-bounded training aggs — execute behind the " +
      "localCheckpoint, each exactly once)"),
    "q_community_mix" ->
      "global scalar agg: total revenue cents, one output row",
    "q_ks_drift" ->
      "cumulative ECDF window over the bounded distinct-value domain",
    "q_score_ks" ->
      "cumulative ECDF window over the bounded distinct-score domain",
    "q_welch_t" -> "two global scalar moment aggs (one output row)",
    "q_ab_test" ->
      "z scalar agg over the TWO-ROW arms frame (one output row)",
    "q_cuped" -> ("pooled 6-sum moment scalar + conditional arm scalar " +
      "over the TWO-ROW arms frame (one output row each)"),
    "q_did" -> ("conditional 6-sum arm scalar over the TWO-ROW arms " +
      "frame (one output row)"),
    "q_msprt" -> ("running-min p fold + per-day conditional sums over " +
      "the DAYS-bounded grid (cumulative windows are arm-partitioned)"),
    "q_uplift" -> ("two per-arm Newton 6-sum scalar chains + grid-" +
      "weighted decile edges over the GRID-bounded score frame"),
    "q_srm" -> "distinct-user conditional-count scalar agg (one row)",
    "q_jackknife" -> ("final leave-one-out variance scalar agg (one " +
      "output row) over the UNITS-bounded pseudo-value frame; the " +
      "per-unit totals/mean it consumes are 1-row broadcast scalars"),
    "q_fdr" -> ("BH rank/step-up folds over the FAMILY-bounded " +
      "p-value frame (one row per tested metric, 25 nations here)"),
    "q_shapley" -> ("v(full)/v(empty) efficiency scalar agg over the " +
      "2^C-bounded lattice (one row)"),
    "q_qte" -> ("two grid-weighted percentile scalar aggs (one row " +
      "each, GRID-bounded)"),
    "q_bootstrap_ci" -> ("rank + pinned mean/se folds over the B-row " +
      "(64) replicate frame; final scalar agg (one output row)"),
    "q_markov_attribution" -> ("pinned share fold over the CHANNELS-" +
      "bounded effects frame (journey windows are user-partitioned)"),
    "q_psm" -> ("Newton 6-sum scalar aggs + grid-weighted percentile " +
      "edges + pinned ATT folds over the BUCKETS-bounded frame"),
    "q_mmd_drift" ->
      "pinned MMD fold over the DIMS-bounded mean-gap frame",
    "q_als" -> ("per-round RMSE scalar aggs + the distinct-count " +
      "summary agg (one output row each)"),
    "q_acf" -> ("lag window + scalar product-sum agg over the " +
      "PRE-AGGREGATED daily series"),
    "q_ljung_box" -> ("lag window + scalar product-sum agg over the " +
      "PRE-AGGREGATED daily series; Q fold is maxLag-bounded"),
    "q_granger" -> ("lag window + 10-sum scalar agg over the " +
      "PRE-AGGREGATED daily two-channel series"),
    "q_causal_impact" -> ("pre-period moment scalar + pinned effect " +
      "folds over the POST-DAYS-bounded frame"),
    "q_power" -> ("three exact-integer baseline scalar aggs (one row " +
      "each) feeding the LIFTS-bounded projection"),
    "q_entropy_rate" -> ("pinned entropy-rate fold over the TYPE-" +
      "DOMAIN-bounded transition frame (pair window is user-keyed)"),
    "q_logrank" -> ("pinned U/V folds + summary scalars over the " +
      "TIME-GRID-bounded per-time frame"),
    "q_pacf" -> ("lag window + scalar moment aggs over the " +
      "PRE-AGGREGATED daily series (Durbin-Levinson on 1 row)"),
    "q_ccf" -> ("per-series scalar moment aggs over the PRE-AGGREGATED " +
      "daily channels (numerator join is lag-keyed, not windowed)"),
    "q_quantile_bins" ->
      "global scalar percentile agg (one 3-edge output row)",
    "q_zorder" ->
      "global scalar zkey-percentile agg (one 15-edge output row)",
    "q_skyline" -> ("prefix-max window over the PER-PARTITION-MAXIMA " +
      "frame (bounded by the range-partition COUNT; the distinct-x " +
      "cumulative max itself runs partitioned)"),
    "q_length_buckets" ->
      "global scalar token-count percentile agg (one 3-edge output row)",
    "q_winsorize" ->
      "global scalar percentile agg (one 2-edge output row)",
    "q_skew_report" ->
      "global scalar distribution agg over the keys-bounded count frame",
    "q_rolling_corr" ->
      "trailing window over the PRE-AGGREGATED daily two-channel frame",
    "q_target_encode" -> "global-mean prior scalar agg (1 row out)",
    "q_ref_integrity" ->
      "orphan/childless scalar count aggs (1 row each per FK edge)",
    "q_benford" -> "global scalar total agg (one row, 9-digit frame out)",
    "q_mann_whitney" -> ("cumulative rank window over the pooled " +
      "bounded distinct-value domain + one scalar agg"),
    "q_anova" -> ("pinned ANOVA decomposition folds over the GROUPS-" +
      "bounded per-group sums frame (one corpus pass upstream)"),
    "q_assortativity" -> ("final one-row degree-moment scalar agg " +
      "(map-side-combined over the edge list)"),
    "q_trend_test" -> ("pinned trend-statistic folds over the SCORES-" +
      "bounded (7 weekday rows) frame (one corpus pass upstream)"),
    "q_kappa" -> ("pinned marginal folds over the CLASSES-bounded " +
      "agreement frame (one (a,b)-keyed corpus pass upstream)"),
    "q_langid_agreement" -> ("pinned marginal folds over the LANGS-" +
      "bounded agreement frame (q_kappa shape over langId output)"),
    "q_kruskal" -> ("cumulative rank window over the pooled bounded " +
      "distinct-value domain + pinned fold over the GROUPS-bounded " +
      "frame (the mann_whitney shape, k groups)"),
    "q_k_anonymity" -> ("scalar privacy rollup + worst-class pick over " +
      "the QI-CLASSES-bounded frame"),
    "q_ece" -> ("pinned weighted-gap fold over the BINS-bounded " +
      "reliability table (one corpus pass upstream)"),
    "q_isotonic" -> ("prefix-sum and cumulative-max windows over the " +
      "BINS-bounded score histogram frame"),
    "q_js_drift" -> "bin-count scalar agg + window over the k-bin frame",
    "q_pr_auc" ->
      "precision/recall windows over the bounded distinct-score domain",
    "q_lift_gain" -> ("rank-band windows over the bounded distinct-score " +
      "domain, then over the buckets-row band frame"),
    "q_spearman" -> ("cumulative rank windows over the bounded " +
      "distinct-value domains + one scalar corr agg"),
    "q_chi_square" -> ("marginal/total windows over the category-product" +
      "-bounded contingency frame (one scalar row out)"),
    "q_null_counts" -> "global scalar agg (one output row)",
    "q_psi_drift" -> "bin-count scalar agg + window over the k-bin frame",
    "q_roc_auc" ->
      "rank-sum windows over the bounded distinct-score domain",
    "q_percentile_extremes" -> "exact percentile over the value histogram",
    "q_seasonal_decompose" -> "window over one per-month series (12 rows)",
    "q_season_strength" -> ("decomposition windows over the ONE daily " +
      "series + the final 1-row variance agg"),
    "q_seq_funnel" ->
      "per-step global count over USER-bounded anchor frames (k rows out)",
    "q_share_of_total" ->
      "grand-total scalar agg over the GROUPS-bounded sum frame (1 row)",
    "q_seasonal_even" -> "window over one per-month series (12 rows)",
    "q_tfidf" -> "corpus-size scalar agg broadcast back (lazy count)",
    "q_bm25" -> "(N, avgdl) corpus scalar agg broadcast back (1 row)",
    "q_token_budget" ->
      "cumulative window over the bounded distinct-quality bucket frame")

  test("no query outside the allowlist funnels rows to a single partition") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { q =>
      SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan
        .toString.contains("Exchange SinglePartition")
    }
    val unexpected = offenders.filterNot(allowed.contains)
    assert(unexpected.isEmpty,
      s"new single-partition exchanges (add only if provably bounded): " +
        unexpected.mkString(", "))
    // keep the allowlist honest: drop entries that no longer apply
    val stale = allowed.keys.toSeq.filterNot(offenders.contains)
    assert(stale.isEmpty, s"allowlist entries no longer needed: " +
      stale.mkString(", "))
  }
}
