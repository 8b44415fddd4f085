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

  test("q_emb_cosine_dup: native cosine_sim expression in the join plan") {
    val p = plan("q_emb_cosine_dup")
    assert(p.contains("cosine_sim"), p.take(800))
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
