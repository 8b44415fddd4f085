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
}
