package graft

/** Plan-shape regression guard: no declared query may plan a
  * CartesianProduct, and BroadcastNestedLoopJoin is allowed only where the
  * build side is a bounded broadcast (single-row scalar threshold or a
  * fixed probe set) — the shapes that stay O(n) at 100 TB. A refactor that
  * silently degrades a join to an unbounded nested loop fails here, not in
  * production.
  */
class PlanAuditSpec extends SparkSpec {

  /** Queries whose plan legitimately contains a BroadcastNestedLoopJoin:
    * the build side is a bounded broadcast by construction.
    */
  private val boundedBnlj = Set(
    "q_subquery_scalar", // 1-row aggregated threshold
    "q_sim_cosine_topk", "q_embed_neardup", "q_sim_cosine_ivf", // fixed probe set
    "q_media_features_topk",
    "q_cross_join") // region × nation: two single-digit-row dims

  private val skip = Set("stream_bus_e2e") // streaming run, not a relational plan

  SparkEntry.queries.keys.toSeq.sorted.filterNot(skip).foreach { name =>
    test(s"$name plans no cartesian product / unbounded nested loop") {
      val plan = query(name).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      if (!boundedBnlj(name)) {
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin outside the allowed set")
      }
    }
  }
}
