package graft

/** Physical-plan regression guards: the scale properties that make these
  * queries viable at 100 TB — parquet filter/column pushdown, broadcast
  * joins on dimensions, key-partitioned windows, native expressions — must
  * be visible in the executed plan, not just hoped for.
  */
class PlanSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString

  test("q_proj_filter: predicates and projection reach the parquet scan") {
    val p = plan("q_proj_filter")
    assert(p.contains("PushedFilters") &&
      p.contains("EqualTo(o_orderstatus,O)"), p.take(800))
    // column pruning: the scan must not read the unused priority column
    // (a REAL orders column — see FIXTURES.md)
    assert(!p.contains("o_orderpriority"))
  }

  test("q_multi_join_agg: all dimension joins broadcast, no sort-merge") {
    val p = plan("q_multi_join_agg")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_funnel: left joins preserved, dims broadcast, no cartesian") {
    val p = plan("q_funnel")
    assert(p.contains("LeftOuter"), p.take(800))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_lag_features: window partitioned by the series key (no global window)") {
    val p = plan("q_lag_features")
    assert(p.contains("hashpartitioning(user_id"), p.take(800))
  }

  test("q_emb_cosine_dup: gated plan is the LSH path — native cosine_sim " +
    "verify over bucketed candidates, no brute-force pair join") {
    val p = plan("q_emb_cosine_dup")
    assert(p.contains("cosine_sim"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    val bnlj = p.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnlj.forall(l => l.contains("Cross") && !l.contains("vec_id")),
      bnlj.mkString("\n"))
  }

  /** query -> why its BroadcastNestedLoopJoin's build side is bounded
    * (scalar aggregate / constant table / sampled query set), i.e. why the
    * nested loop is O(n·k) with small broadcast k, not O(n²).
    */
  private val allowedBnlj: Map[String, String] = Map(
    "q_ann_topk" -> "Cross of the broadcast md5 hyperplane constant table",
    "q_ann_recall" -> ("exact baseline inside the recall monitor: query " +
      "side is the sampled (broadcast-bounded) set, corpus streams"),
    "q_ar_forecast" -> ("Cross of the broadcast 1-row scalar frames " +
      "(standardization stats, max-date anchor, coefficients)"),
    "q_sarima_lite" -> ("Cross of the broadcast 1-row scalar frames " +
      "(the q_ar_forecast shape over the seasonally differenced series)"),
    "q_temperature_mix" ->
      "Cross of the broadcast 1-row corpus-token-total scalar",
    "q_source_shrinkage" ->
      "Cross of the broadcast 1-row global-sums scalar",
    "q_ann_topk_pair" ->
      "Cross of the broadcast md5 hyperplane constant table (both sides)",
    "q_chrono_split" -> "Cross of the broadcast 1-row total/cutoff scalars",
    "q_collocations" -> "Cross of the broadcast 1-row bigram-total scalar",
    "q_mutual_info" -> "Cross of the broadcast 1-row cell-total scalar",
    "q_modularity" -> "Cross of the broadcast 1-row edge-count scalar",
    "q_louvain" -> ("Cross of the broadcast 1-row edge-count scalars " +
      "(the 2m gain term per move round + the Newman m); all other " +
      "joins are node-/community-keyed equi-joins"),
    "q_louvain2" -> ("q_louvain's 1-row 2m/m scalar crosses, plus the " +
      "same per-round scalar at the SUPER level (communities-bounded " +
      "frames everywhere else)"),
    "q_louvain_multi" -> ("q_louvain2's scalar crosses once per " +
      "coarsen level, plus the 1-row (2m) scalar inside each level's " +
      "exact-int Q summary"),
    "q_survival" -> "Cross of the broadcast 1-row max-date horizon scalar",
    "q_nelson_aalen" ->
      "Cross of the broadcast 1-row max-date horizon scalar",
    "q_growth" -> "Cross of the broadcast 1-row max-week horizon scalar",
    "q_share_of_total" -> "Cross of the broadcast 1-row grand-total scalar",
    "q_welch_t" ->
      "Cross of the two broadcast 1-row moment-scalar frames",
    "q_kruskal" -> "Cross of the broadcast 1-row (N, ties) scalar frame",
    "q_acf" -> "Cross of the broadcast 1-row series-mean scalar",
    "q_ljung_box" -> "Cross of the broadcast 1-row series-mean scalar",
    "q_granger" ->
      "Cross of the broadcast 1-row two-channel standardization scalar",
    "q_causal_impact" ->
      "Cross of the broadcast 1-row pre-period OLS-fit scalar",
    "q_power" -> ("Cross of the broadcast 1-row baseline/conversion/" +
      "traffic scalars"),
    "q_logrank" -> ("Cross of the broadcast horizon/group-min/side " +
      "scalars and the TIME-GRID-bounded times x sides grid"),
    "q_pacf" -> "Cross of the broadcast 1-row series-mean scalar",
    "q_zorder" -> ("Cross of the broadcast 1-row zkey quantile-edge " +
      "array (the range-writer's sampled bounds, exact)"),
    "q_length_buckets" ->
      "Cross of the broadcast 1-row token-count quantile-edge array",
    "q_winsorize" ->
      "Cross of the broadcast 1-row (p_lo, p_hi) percentile edges",
    "q_ab_test" -> ("Cross of the broadcast 1-row arm-summary and " +
      "z-score frames (two arms, one z)"),
    "q_cuped" -> ("Cross of the broadcast 1-row pooled-moment, " +
      "arm-summary, and adjusted-z frames"),
    "q_did" -> "Cross of the broadcast 1-row DiD-estimate scalar",
    "q_msprt" -> ("Cross of the DAYS-bounded calendar grid with the " +
      "broadcast 2-row arm frame"),
    "q_uplift" -> ("Cross of the broadcast 1-row standardization, two " +
      "per-arm fitted-beta, and decile-edge scalars"),
    "q_qte" -> "Cross of the two broadcast 1-row per-arm decile arrays",
    "q_jackknife" -> ("Cross of the broadcast 1-row totals scalar " +
      "(sum-num/sum-den/count over units) and the broadcast 1-row " +
      "pseudo-value mean scalar; left sides are UNITS-bounded frames"),
    "q_bootstrap_ci" ->
      "Cross of the broadcast 1-row point-estimate scalar",
    "q_markov_attribution" -> ("Cross of the TYPE-DOMAIN-bounded " +
      "removal-variants frame and the broadcast 1-row total scalar"),
    "q_shapley" -> ("containment/marginal joins over the 2^C-bounded " +
      "subset lattice (16 rows) and the broadcast 1-row efficiency " +
      "scalar"),
    "q_psm" -> ("Cross of the broadcast 1-row standardization, fitted-" +
      "beta, and propensity-quintile-edge scalars"),
    "q_als" -> "Cross of the broadcast 1-row per-round RMSE scalars",
    "q_als_recommend" -> ("Cross of the broadcast 5-row md5 user panel " +
      "against the item-factor frame (panel-bounded fan-out)"),
    "q_target_encode" ->
      "Cross of the broadcast 1-row global-mean prior scalar",
    "q_ref_integrity" -> ("Cross of the broadcast 1-row orphan/childless " +
      "count scalars (one pair per FK edge)"),
    "q_ccf" -> ("Cross of the broadcast 1-row per-series mean and " +
      "sum-of-squares scalars (4 one-row frames)"),
    "q_quantile_bins" -> "Cross of the broadcast 1-row quantile-edge frame",
    "q_benford" -> "Cross of the broadcast 1-row total scalar",
    "q_brier" -> "Cross of the broadcast 1-row weight-vector frame",
    "q_calibration" -> "Cross of the broadcast 1-row weight-vector frame",
    "q_ece" -> "Cross of the broadcast 1-row weight-vector frame",
    "q_isotonic" -> ("bins²-bounded PAV pair join over the broadcast " +
      "≤bins-row score histogram (plus the 1-row weight-vector frame " +
      "feeding the scores)"),
    "q_confusion" -> "Cross of the broadcast 1-row weight-vector frame",
    // q_kappa needs NO entry: cohenKappa's localCheckpoint truncates
    // the scored-demo cross out of the audited plan (the q_raking case)
    "q_hybrid_search" -> ("the embedding arm is the q_cosine_topk " +
      "brute-force baseline (1-query broadcast side); the fusion join " +
      "runs on the two <= top-k ranked lists"),
    "q_cosine_topk" -> ("brute-force baseline BY DESIGN: query side is " +
      "the sampled (broadcast-bounded) set, corpus streams — O(n·q)"),
    "q_ndcg" -> ("ranking eval over the brute-force retrieval baseline: " +
      "query side is the sampled (broadcast-bounded) set, corpus " +
      "streams (the q_cosine_topk shape); label and histogram joins " +
      "stay equi-keyed"),
    "q_eval_classify" -> "Cross of the broadcast 1-row weight-vector frame",
    "q_cursor_manifest" -> ("Cross of the broadcast `runs`-row cursor " +
      "window schedule (3 rows — one per batch run)"),
    "q_emb_cosine_dup" -> "Cross of the broadcast hyperplane constant table",
    "q_emb_decontaminate" -> ("Cross of the broadcast hyperplane table " +
      "(both sides bucket; candidates stay (table,bucket) equi-joined)"),
    "q_hard_negatives" -> ("Cross of the broadcast hyperplane table " +
      "(bucketing only; candidates stay (table,bucket) equi-joined)"),
    "q_emb_quantize" -> ("Cross of the broadcast 1-row per-dim [min,max] " +
      "edge arrays (dims-bounded parameter frame)"),
    "q_emb_cosine_dup_lsh" -> "Cross of the broadcast hyperplane table",
    "q_emb_cosine_dup_auto" -> ("Cross of the broadcast hyperplane table " +
      "(count-sized plane count, same bucketed-candidate plan)"),
    "q_fit_linear" ->
      "Cross of the broadcast 1-row standardization-moments scalars",
    "q_fit_logistic" -> ("Cross of the broadcast 1-row standardization " +
      "and per-round Newton-state scalars"),
    "q_quality_classifier" -> ("Cross of the broadcast 1-row frames the " +
      "model rides in: class totals, standardization moments, per-round " +
      "Newton-state scalars, and the published round-6 coefficients " +
      "(q_fit_logistic shape; the bucket weight table joins by key)"),
    "q_quality_classifier2" -> ("Cross of the broadcast 1-row frames " +
      "the 2-feature model rides in: class totals, per-feature " +
      "standardization moments, per-round 3x3 Newton-state scalars, " +
      "published round-6 coefficients (the q_quality_classifier shape; " +
      "the seen-flagged bucket weight table joins by key)"),
    "q_bpe_encode" -> ("Cross of the broadcast 1-row merge-list array " +
      "(k learned merges — model-sized, like any parameter frame)"),
    "q_unigram_train" -> ("Cross of the broadcast 1-row vocab-map (the " +
      "seed-capped piece table, model-sized by construction) and 1-row " +
      "count-total scalars against the distinct-word frame, once per " +
      "EM round (the q_bpe_encode shape)"),
    "q_unigram_encode" -> ("Cross of the broadcast 1-row PUBLISHED " +
      "vocab-map against the distinct-word frame (q_unigram_train's " +
      "seed cap bounds it)"),
    "q_tokenizer_compare" -> ("Cross of the two broadcast 1-row model " +
      "frames (BPE merge array + unigram vocab map) against the " +
      "distinct-word frame (q_bpe_encode / q_unigram_encode shapes)"),
    "q_windowed_fertility" -> ("Cross of the broadcast 1-row PUBLISHED " +
      "vocab-map against the word stream (the constant-key " +
      "stream-static join folds to a bounded broadcast nested loop; " +
      "q_unigram_encode shape)"),
    "q_bpe_fertility" -> ("Cross of the broadcast 1-row merge-list " +
      "array against the distinct-word frame (q_bpe_encode shape; all " +
      "checkpoints in one projection)"),
    "q_gbt_eval" -> ("Cross of the broadcast 1-row F0/ybar scalars and " +
      "per-round 1-row best-split frames feeding the final summary scan"),
    "q_gbt_depth2_eval" -> ("Cross of the broadcast 1-row F0/ybar " +
      "scalars and per-round 1-row tree-parameter frames feeding the " +
      "final summary scan (the q_gbt_eval shape, depth-2 params)"),
    // q_gbt_score / q_gbt_pdp / q_gbt_depth2_score left the allowlist in
    // round 16: the compiled scorers unroll the published model into
    // plan-time literals, so the broadcast model-array cross is gone
    "q_gbt_perm_importance" -> ("Cross of the broadcast 1-row " +
      "base-RMSE scalar (the compiled scorer removed the model-array " +
      "cross); the permutation join is bucket-keyed"),
    "q_get_or_create" -> "Cross of the broadcast 1-row max-id scalar",
    "q_holt_winters_auto" -> ("Cross of the broadcast 12-row dyadic " +
      "candidate grid (constant table) into the per-key series frame"),
    "q_ks_drift" -> "Cross of the broadcast 1-row total/max-gap scalars",
    "q_score_ks" -> ("Cross of the broadcast 1-row total/max-gap scalars " +
      "(ksDrift over the scored corpus) and the weight-vector frame"),
    "q_psi_drift" -> "Cross of the broadcast 1-row bin-total scalars",
    "q_js_drift" -> "Cross of the broadcast 1-row bin-total scalars",
    "q_pr_auc" -> ("Cross of the broadcast 1-row class-total scalars " +
      "(and the weight-vector frame feeding the scores)"),
    "q_lift_gain" -> ("Cross of the broadcast 1-row corpus-total scalars " +
      "(and the weight-vector frame feeding the scores)"),
    "q_roc_auc" -> ("Cross of the broadcast 1-row class-total scalars " +
      "(and the weight-vector frame feeding the scores)"),
    "q_ivf_topk" -> "Cross of the broadcast k-row centroid table",
    "q_cluster_profile" -> "Cross of the broadcast k-row centroid table",
    "q_diverse_sample" -> "Cross of the broadcast k-row centroid table",
    "q_silhouette" -> "Cross of the broadcast k-row centroid table",
    "q_centroid_drift" ->
      "Cross of the broadcast 1-row global-centroid vector",
    "q_hill_tail" ->
      "Cross of the broadcast 1-row (k+1)-th-count threshold scalar",
    "q_keyness" ->
      "Cross of the broadcast 1-row side-token-total scalar",
    "q_heaps" ->
      "Cross of the broadcast 1-row checkpoint token-total scalar",
    "q_pq_topk" ->
      "Cross of the broadcast centroid table (IVF cells + PQ seeds)",
    "q_label_noise" -> ("exact-cosine knn inside the screen: query side " +
      "is the sampled (broadcast-bounded) set, corpus streams — the " +
      "q_ann_recall baseline shape"),
    "q_jl_project" -> ("Cross of the broadcast sampled B side and the " +
      "broadcast kDims-row ±1 plane constant table — the SAMPLE pays " +
      "the pair fan-out, never the corpus"),
    "q_lsh_quality" -> ("Cross of the broadcast md5 hyperplane constant " +
      "table, the |configs|-row sweep frame, and the 1-row exact-count " +
      "scalar; the exact baseline's query side is the sampled broadcast " +
      "set (the q_ann_recall shape)"),
    "q_ann_quality" -> ("Cross of the broadcast centroid/codebook " +
      "tables, the |configs|-row sweep frames, and the 1-row " +
      "exact-count scalar; the exact baseline's query side is the " +
      "sampled broadcast set (the q_ann_recall shape)"),
    "q_centroid_sim" -> ("label-pair nested loop over the LABELS-bounded " +
      "broadcast centroid frame (labels², never corpus-sized)"),
    "q_assoc_rules" -> "Cross of the broadcast 1-row basket-count scalar",
    "q_rfm" -> ("Cross of the broadcast 1-row horizon scalar and the " +
      "three 1-row quantile-edge frames"),
    "q_lm_perplexity" -> "Cross of the broadcast 1-row vocabulary scalar",
    "q_lm_trigram" -> ("Cross of the broadcast 1-row N/V scalar frame " +
      "(q_lm_perplexity shape; all count tables join by n-gram key)"),
    "q_lm_5gram" -> ("Cross of the broadcast 1-row N/V scalar frame " +
      "(the q_lm_trigram shape; all five count tables join by " +
      "n-gram key)"),
    "q_lm_published" -> ("Cross of the broadcast 1-row N/V scalar " +
      "frame (the q_lm_5gram shape through the published-index path; " +
      "N/V derive from the index's n=1 slice, still one row)"),
    "q_lm_index_merge" -> ("Cross of the broadcast 1-row N/V scalar " +
      "frame (the q_lm_published shape; the merged index feeds the " +
      "same scoring chain, N/V still derive from the n=1 slice)"),
    "q_training_order" -> ("Cross of the broadcast 1-row stage-threshold " +
      "frame (the q_ccnet_buckets percentile shape; stage and shuffle " +
      "key are per-row projections, the order is a range-partitioned " +
      "sort)"),
    "q_ctx_sweep" -> ("Cross of the broadcast 4-row context-length " +
      "table against the per-doc token projection and the " +
      "nGroups-bounded group totals (a deliberate |ctxs|-fold map-side " +
      "fan-out, both sides aggregate immediately)"),
    "q_ccnet_buckets" -> ("Cross of the broadcast 1-row N/V scalar and " +
      "the 1-row percentile-threshold frame (two bounded scalars; the " +
      "bucket CASE is a per-row projection)"),
    "q_ccnet_buckets5" -> ("Cross of the broadcast 1-row N/V scalar " +
      "and the 1-row percentile-threshold frame (the q_ccnet_buckets " +
      "shape over the 5-gram chain)"),
    "q_dsir" -> ("Cross of the broadcast 1-row target/raw gram-total " +
      "scalars (the lambda table itself joins by bucket key)"),
    "q_dsir_mix" -> ("Cross of the broadcast 1-row target/raw " +
      "gram-total scalars plus the 1-row corpus/selected count scalars " +
      "(the q_dsir chain; the selection joins the corpus by id key)"),
    "q_mix_budget" -> ("Cross of the broadcast 1-row corpus-token-" +
      "total scalar (the q_temperature_mix shape)"),
    "q_mix_budget_apply" -> ("the q_mix_budget chain's 1-row total " +
      "scalar cross; the plan joins the corpus by the source key"),
    "q_pipeline_mix" -> ("the q_mix_budget chain's 1-row total scalar " +
      "cross over the SOURCES-bounded survivor frame (the funnel " +
      "verdict is a published parameter table since r17 — flags are " +
      "a parquet scan; the apply side joins survivors by the source " +
      "key)"),
    // q_ccnet_pipeline needs NO entry: the flags localCheckpoint
    // truncates the composed chains' scalar crosses out of the audited
    // plan (the q_kappa case); the live tail is id-keyed joins only
    "q_community_mix" -> ("Cross of the broadcast 1-row total-revenue " +
      "scalar over the COMMUNITIES-bounded mix frame"),
    "q_model_score" -> "Cross of the broadcast 1-row weight-vector frame",
    "q_percentile_extremes" -> ("Cross of the broadcast 1-row percentile " +
      "threshold scalar (condition pushed into the join)"),
    "q_seasonal_decompose" -> "Cross of the broadcast 1-row period scalar",
    "q_season_strength" -> ("Cross of the broadcast season-center and " +
      "phase-mean frames (period-bounded) inside the decomposition"),
    "q_seasonal_even" -> "Cross of the broadcast 1-row period scalar",
    "q_tfidf" -> "Cross of the broadcast 1-row corpus-size scalar",
    "q_bm25" -> ("Cross of the broadcast 1-row (N, avgdl) corpus scalars " +
      "— once into the |terms|-row idf frame, once into the scored rows"))

  test("fleet audit: no gated query's plan contains a cartesian product, " +
    "and every nested-loop join is an allowlisted bounded broadcast") {
    // mirrors WindowAuditSpec: the O(n²) pair join is the other classic
    // 100 TB scale-killer. CartesianProduct (non-broadcast cross) is never
    // acceptable — if the small side outgrows broadcast, the query needs a
    // different plan, not a silent full cross. BroadcastNestedLoopJoin is
    // acceptable ONLY when the broadcast side is provably bounded (a
    // 1-row scalar, a k-row constant table, a sampled query set) — each
    // such query must be allowlisted with its justification so a future
    // query cannot silently ship a brute-force pair join.
    val withBnlj = SparkEntry.queries.keys.toSeq.sorted.flatMap { q =>
      val p = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      val cart = p.linesIterator.filter(_.contains("CartesianProduct")).toSeq
      assert(cart.isEmpty, s"$q ships a CartesianProduct:\n  " +
        cart.mkString("\n  "))
      val bnlj = p.linesIterator
        .filter(_.contains("BroadcastNestedLoopJoin")).toSeq
      if (bnlj.isEmpty) None else Some(q -> bnlj)
    }.toMap
    val unexpected = (withBnlj.keySet -- allowedBnlj.keySet).toSeq.sorted
    assert(unexpected.isEmpty,
      "new nested-loop joins (allowlist only if the broadcast side is " +
        "provably bounded):\n" + unexpected.map(q =>
        s"$q:\n  ${withBnlj(q).mkString("\n  ")}").mkString("\n"))
    // keep the allowlist honest: drop entries that no longer apply
    val stale = (allowedBnlj.keySet -- withBnlj.keySet).toSeq.sorted
    assert(stale.isEmpty,
      s"allowlist entries no longer needed: ${stale.mkString(", ")}")
  }

  test("audit mode (spark.graft.audit.noCheckpoint) exposes the FULL " +
    "composed chains the gates' lazy checkpoints normally truncate — " +
    "and those full chains are cartesian-free with Cross-only " +
    "nested loops") {
    // the checkpoint blind spot: a lazy localCheckpoint replaces its
    // upstream chain with a Scan ExistingRDD leaf, so the fleet audit
    // above cannot see a regression introduced INSIDE the LM/classifier/
    // langId chains. Par.cp honors this conf, so the same gate builders
    // yield the un-truncated plan for inspection (values are identical
    // either way — audit mode merely re-executes shared subtrees).
    spark.conf.set("spark.graft.audit.noCheckpoint", "true")
    try {
      for (q <- Seq("q_ccnet_pipeline", "q_ccnet_buckets5",
          "q_pipeline_mix", "q_selection_diversity")) {
        val p = SparkEntry.queries(q)(spark, sfDir)
          .queryExecution.executedPlan.toString
        assert(!p.contains("Scan ExistingRDD"),
          s"$q: a checkpoint still truncates the audited plan " +
            "(use Par.cp, not a bare localCheckpoint)")
        assert(!p.contains("CartesianProduct"),
          s"$q: the full chain ships a CartesianProduct")
        val bnlj = p.linesIterator
          .filter(_.contains("BroadcastNestedLoopJoin")).toSeq
        assert(bnlj.forall(_.contains("Cross")),
          s"$q: non-cross nested loop inside the full chain:\n" +
            bnlj.mkString("\n"))
      }
    } finally spark.conf.unset("spark.graft.audit.noCheckpoint")
  }

  test("q_minhash_lsh: candidate generation is an equi-join (no cartesian)") {
    val p = plan("q_minhash_lsh")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("chronoSplitByDateCutoff: no window operator anywhere in the plan " +
    "(the W5 scale path must not inherit q_chrono_split's global sort)") {
    val df = graft.ops.Windows.chronoSplitByDateCutoff(
      Tables.orders(spark, sfDir), "o_orderdate", 0.8)
    val p = df.queryExecution.executedPlan.toString
    // the exact path's only window runs over the distinct-date frame; the
    // approximate scale path must be window-free entirely — one scalar
    // approx-quantile agg broadcast back over a full scan
    assert(!p.contains("Window"), p.take(800))
    assert(p.contains("percentile_approx") || p.contains("approx_percentile"),
      p.take(800))
  }

  test("q_chrono_split: the unpartitioned window reads the per-date " +
    "aggregate, never the raw table (calendar-bounded, not corpus-bounded)") {
    val p = plan("q_chrono_split")
    // partial per-date aggregation must sit below the window's exchange —
    // the single partition then carries one row per DISTINCT date
    assert(p.contains("HashAggregate(keys=[o_orderdate"), p.take(1200))
    assert(!p.contains("row_number"), p.take(1200))
  }

  test("q_sessions: windows partitioned by the user key, no global sort " +
    "except the final presentation ORDER BY") {
    val p = plan("q_sessions")
    assert(p.contains("hashpartitioning(user_id"), p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_curation_funnel: capped near-dup stage — no window, no " +
    "nested-loop join, single jaccard self-join lineage") {
    val p = plan("q_curation_funnel")
    assert(!p.contains("WindowExec"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("q_curation_funnel_minhash: banded candidates stay equi-joined " +
    "inside the funnel") {
    val p = plan("q_curation_funnel_minhash")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("q_decontaminate: shingle semi-join stays equi-keyed, no pair blowup") {
    val p = plan("q_decontaminate")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("q_hash_sample: pure filter — no shuffle, no join, no window") {
    val p = plan("q_hash_sample")
    // only the presentation ORDER BY may exchange: EVERY Exchange line
    // must be a rangepartitioning (a whole-plan contains() would let a
    // stray hash shuffle hide behind the sort's exchange)
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      exchanges.mkString("\n"))
    assert(!p.contains("Join"), p.take(800))
    assert(!p.contains("Window"), p.take(800))
  }

  test("q_rate_limit: admission window partitioned by api, not global") {
    val p = plan("q_rate_limit")
    assert(p.contains("hashpartitioning(api"), p.take(800))
  }

  test("q_simhash: signature aggregate is one wide agg keyed on the doc " +
    "id — no 60-way bit explode in the plan") {
    val p = plan("q_simhash")
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the printed plan shows both self-join subtrees, each with exactly
    // two legitimate Generate nodes (token split explode + 4-chunk band
    // explode) = 4 total; the old bit-explode spelling adds one more per
    // side (constant-folded to an array literal, so matching on
    // 'sequence' text would be vacuous — count nodes instead)
    val generates = p.linesIterator.filter(_.contains("Generate")).toSeq
    assert(generates.size <= 4, generates.mkString("\n"))
  }

  test("q_emb_cosine_dup_lsh: bucketed candidates, no nested-loop pair join") {
    val p = plan("q_emb_cosine_dup_lsh")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("cosine_sim"), p.take(800))
    // the only nested-loop join allowed is the deliberate Cross broadcast
    // of the 48-row hyperplane table against the scan; pair generation and
    // cosine verify must be hash-equi-joins (a brute-force pair join would
    // surface as a BNLJ with an Inner vec_id condition)
    val bnlj = p.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnlj.forall(l => l.contains("Cross") && !l.contains("vec_id")),
      bnlj.mkString("\n"))
  }
}
