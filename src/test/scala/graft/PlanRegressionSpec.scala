package graft

/** Plan-shape regression guards for the scale-critical properties
  * documented in PLANS.md.
  */
class PlanRegressionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("scan: predicate pushdown and column pruning reach parquet") {
    val p = plan("q_scan_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"), p)
    assert(p.contains("ReadSchema") && !p.contains("l_returnflag"),
      "unused columns must not be read")
  }

  test("stage-2 spine: broadcast join, no shuffle exchange") {
    val p = plan("q_stage2_spine")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("ShuffleExchange") && !p.contains("SortMergeJoin"), p)
  }

  test("window lag: exactly one exchange") {
    val p = plan("q_window_lag")
    assert("Exchange".r.findAllIn(p).size -
      "BroadcastExchange".r.findAllIn(p).size === 1, p)
  }

  test("similarity top-k: custom operator, not a full-sort window") {
    val p = plan("q_cosine_topk")
    assert(p.contains("TopKPerKey"), p)
  }

  test("jaccard pairs: no quadratic join operator anywhere in the plan") {
    val p = plan("q_jaccard_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("stratified sample: map-only, zero exchanges") {
    val p = plan("q_stratified_sample")
    assert(!p.contains("Exchange"),
      s"hash-based sampling must not shuffle:\n$p")
  }

  test("sequence packing: exactly one exchange (the per-source window)") {
    val p = plan("q_pack_sequences")
    assert("Exchange".r.findAllIn(p).size -
      "BroadcastExchange".r.findAllIn(p).size === 1, p)
  }
}
