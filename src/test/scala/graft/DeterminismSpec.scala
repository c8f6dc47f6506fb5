package graft

/** Partition-independence: declared queries must return identical rows (in
  * order) regardless of `spark.sql.shuffle.partitions` — the local proxy
  * for "the same answer on a 4-core laptop and a 1000-executor cluster".
  * Exact-decimal aggregation and total ordering are what make this hold;
  * a float-sum or under-specified ORDER BY breaks it.
  */
class DeterminismSpec extends SparkSpec {

  private val sample = Seq(
    "q_agg_group", "q_window_rank", "q_dedup_exact", "q_minhash_neardup",
    "q_range_join", "q_left_join", "q_sim_cosine_topk", "q_explode_tokens",
    "q_dedup_docs_exact", "stream_bus_e2e", "q_window_dist", "q_top_bigrams",
    "q_pipeline_clean",
    // round-3 additions with partition-sensitive shapes: iterative CC,
    // sketch rollup, two-phase salted agg, TF-IDF join+window, exact
    // moments, gaps-and-islands, bucket-expansion levenshtein
    "q_dedup_clusters", "q_salted_agg", "q_tfidf", "q_exact_moments",
    "q_session_gaps", "q_edit_distance", "q_window_range_frame",
    "q_date_spine", "q_sim_cosine_ivf", "q_hll_union", "q_media_audio",
    "q_array_hof")

  sample.foreach { name =>
    test(s"$name is identical under shuffle.partitions 3 and 13") {
      def runWith(parts: String): Seq[String] = {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try query(name).collect().map(_.toString).toSeq
        finally spark.conf.set("spark.sql.shuffle.partitions", "4")
      }
      val a = runWith("3")
      val b = runWith("13")
      assert(a == b, s"$name diverged across partition counts")
    }
  }
}
