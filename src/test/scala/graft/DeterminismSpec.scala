package graft

/** Run-to-run determinism within Spark for the queries whose output
  * could silently depend on partition/task ordering — the oracle gate
  * compares one run against DuckDB; this guards against "matched once
  * by luck" (aggregation order, window ties, LSH candidate sets).
  */
class DeterminismSpec extends SparkSpec {

  private val risky = Seq(
    "q_agg_pricing",     // parallel decimal partial aggregation
    "q_window_running",  // windowed prefix sums
    "q_window_rank",     // ranking with tiebreakers
    "q_sessionize",      // lag + cumsum chain
    "q_dedup_minhash",   // banded LSH candidates
    "q_dedup_simhash",   // signature groups
    "q_sim_bruteforce",  // double cosine ordering
    "q_topk_typed",      // custom aggregator merge order
    "q_rollup",          // grouping-set expansion
    "q_tfidf",           // ln-score ranking + localCheckpoint reuse
    "q_asof_join",       // last-ignoreNulls over union ordering
    "q_sim_ivf",         // Lloyd means MUST be decimal-exact
    "q_embed_dedup",     // LSH bucket assignment
    "q_corpus_clean",    // digest keeper election
    "q_concurrency",     // two-level prefix sum + day carry
    "q_frequent_items",  // MG summary merge order (flags must absorb it)
    "q_window_nav",      // explicit-frame navigation + rank ratios
    "q_hits",            // decimal-pinned iterative normalization
    "q_mutual_nn",       // double cosine ranking both directions
    "q_sax")             // collect_list word assembly + z banding

  risky.foreach { name =>
    test(s"$name is identical across two independent executions") {
      val a = SparkEntry.queries(name)(spark, Sf0001).collect().toSeq
      val b = SparkEntry.queries(name)(spark, Sf0001).collect().toSeq
      assert(a == b, s"$name differs across runs")
    }
  }
}
