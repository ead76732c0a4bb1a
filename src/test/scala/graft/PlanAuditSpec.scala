package graft

/** Plan-shape regression guards: the properties the 100 TB design
  * depends on must survive future refactors — filter/projection
  * pushdown into the parquet scan, broadcast joins for bounded dims,
  * top-k without a full sort, and no shuffle on the fact side of the
  * flagship enrichment.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, Sf0001).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)

  test("q_filter_project pushes both predicates into the parquet scan") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount)")
      || p.contains("LessThan(l_shipdate"), s"missing pushdown:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_discount,0.02)"), s"missing range pushdown:\n$p")
  }

  test("q_filter_project scan reads only the referenced columns") {
    val p = plan("q_filter_project")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"),
      s"scan reads unreferenced columns: $readSchema")
  }

  test("q_star_join broadcasts every DIMENSION join (fact-fact SMJ allowed)") {
    // A blanket "no SortMergeJoin anywhere" would pin small-SF AQE
    // behavior: at real scale SMJ on l_orderkey = o_orderkey is the
    // CORRECT plan for the fact-fact join. The scale-good property is
    // narrower — bounded dimensions (nation/region/customer) must
    // never shuffle-join, i.e. no SMJ keyed on a dimension key.
    val p = plan("q_star_join")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts:\n$p")
    val exec = SparkEntry.queries("q_star_join")(spark, Sf0001)
      .queryExecution.executedPlan
    val unwrapped = exec match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val dimKeys = Seq("nationkey", "regionkey", "custkey")
    val smjOnDim = unwrapped.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
          if (j.leftKeys ++ j.rightKeys).exists(k =>
            dimKeys.exists(k.toString.contains)) => j
    }
    assert(smjOnDim.isEmpty, s"dimension join fell back to SMJ:\n$smjOnDim")
  }

  test("q_topk plans as TakeOrderedAndProject (no full sort)") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("q_hard_negatives broadcasts the anchor side, never a shuffled cartesian") {
    // the anchor set (vec_id < 10) is the bounded side: the non-equi
    // join must plan as a BroadcastNestedLoopJoin building the anchors
    // (corpus streams past them) — a CartesianProduct would shuffle
    // the corpus against itself at scale
    val p = plan("q_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin"), s"expected BNLJ:\n$p")
    assert(!p.contains("CartesianProduct"), s"shuffled cartesian crept in:\n$p")
  }

  test("q_sim_ivfpq composes broadcast stages: no CartesianProduct anywhere") {
    // the only cross joins allowed are the bounded K=16 centroid and
    // PqM×PqK codebook broadcasts (BroadcastNestedLoopJoin Cross);
    // candidate/LUT joins hash-broadcast; the probes×assigned cell
    // join may SMJ (cell-keyed shuffle — correct at scale)
    val p = plan("q_sim_ivfpq")
    assert(!p.contains("CartesianProduct"), s"shuffled cartesian crept in:\n$p")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj >= 4, s"expected >=4 broadcast hash joins, got $bhj:\n$p")
  }

  test("q_asof_join is one window shuffle, no join operator, no range explosion") {
    val p = plan("q_asof_join")
    assert(!p.contains("Join"), s"as-of must be union+window, not a join:\n$p")
    val shuffles = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    // one hash exchange on user_id + the harness ORDER BY — a range
    // join would instead explode candidate pairs per user
    assert(shuffles == 2, s"expected 2 shuffles (window + sort), got $shuffles:\n$p")
  }

  test("q_tfidf shuffles the exploded token stream once (repartition reused by agg+window)") {
    val p = plan("q_tfidf")
    // the doc_id repartition must satisfy both the (doc_id, token)
    // aggregate and the per-doc ranking window; df stays broadcast
    assert(p.contains("BroadcastHashJoin"), s"df join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"df join fell back to SMJ:\n$p")
  }

  test("q_join_volume_flow filters nations at the dims and broadcasts them") {
    // the Q7 shape's scale property: the 2-row filtered nation dims
    // broadcast into supplier/customer BEFORE the fact joins — the
    // nation predicate must never wait for the post-join filter
    val p = plan("q_join_volume_flow")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 2, s"expected both nation joins broadcast:\n$p")
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("In(n_name")),
      s"nation name filter not pushed to the nation scan:\n$p")
  }

  test("q_market_share broadcasts only O(1) dims; part/supplier joins stay shuffles") {
    // part and supplier scale with SF — hinting them broadcast would
    // OOM a real cluster. Only nation (x2) and region are O(1).
    val p = plan("q_market_share")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 3, s"nation x2 + region must broadcast:\n$p")
    val exec = SparkEntry.queries("q_market_share")(spark, Sf0001)
      .queryExecution.executedPlan
    val unwrapped = exec match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    // left-semi against the EU customer set must prune, not duplicate:
    // no row-count change operator after it (semi join emits <= left)
    val semis = unwrapped.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.joinType.toString.contains("LeftSemi") => j
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
          if j.joinType.toString.contains("LeftSemi") => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
          if j.joinType.toString.contains("LeftSemi") => j
    }
    assert(semis.nonEmpty, s"EU-customer filter must plan as a semi join:\n$unwrapped")
  }

  test("q_enrich fact side has no shuffle before the join (broadcast only)") {
    val p = plan("q_enrich")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    // the ONLY shuffle Exchange allowed is the rangepartitioning for
    // the final deterministic ORDER BY (+ the broadcast exchange)
    val shuffles = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(shuffles == 1, s"expected exactly 1 shuffle (the sort), got $shuffles:\n$p")
    assert(p.contains("rangepartitioning"), s"the one shuffle should be the sort:\n$p")
  }

  test("q_chunk is pure narrow maps: no shuffle except the harness sort") {
    val p = plan("q_chunk")
    val shuffles = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(shuffles == 1, s"chunking must not shuffle, got $shuffles exchanges:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("n_chars") && !readSchema.contains("source"),
      s"scan reads unreferenced columns: $readSchema")
  }

  test("q_winnow fingerprint extraction is shuffle-free narrow maps") {
    // the 100 TB property: winnowing fingerprints are computed
    // entirely per-row (gram hashes + window minima as array ops) —
    // the only Exchange is the harness ORDER BY, and the scan reads
    // only the two referenced columns
    val p = plan("q_winnow")
    val shuffles = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(shuffles == 1, s"extraction must not shuffle, got $shuffles:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("n_chars") && !readSchema.contains("source"),
      s"scan reads unreferenced columns: $readSchema")
  }

  test("q_embed_project is a shuffle-free narrow map (JL of 100 TB is embarrassingly parallel)") {
    val p = plan("q_embed_project")
    val shuffles = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(shuffles == 1, s"projection must not shuffle before the harness sort, got $shuffles:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("label"), s"scan reads unreferenced columns: $readSchema")
  }

  test("q_markov broadcasts the |types|²-row totals — no cartesian, no shuffled totals join") {
    val p = plan("q_markov")
    assert(p.contains("BroadcastHashJoin"), s"totals join should broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"tiny-side join regressed to a shuffle:\n$p")
  }

  test("HOF-heavy paths keep the transform(array(x), v -> …) let binding") {
    // CollapseProject inlines a once-referenced alias into lambda
    // bodies, where it re-evaluates PER ELEMENT — measured 9–20× on
    // the winnow path (5.2 s → 0.4 s, 47 s → 2.4 s at sf0.01) and
    // O(d²) on every quantizer whose scale wasn't also an output
    // column. The let idiom binds the expensive array/scalar as the
    // HOF argument, so the plan must show it INSIDE transform(array(…)
    // and the lambda must reference the bound variable.
    for (q <- Seq("q_winnow", "q_embed_project", "q_centroid_outliers")) {
      val p = SparkEntry.queries(q)(spark, Sf0001)
        .queryExecution.executedPlan.toString
      assert(p.contains("transform(array("),
        s"$q: the let binding was collapsed away — per-element rebuild is back:\n${p.take(2000)}")
    }
  }

  test("q_winnow_pairs joins only on fingerprint keys — never all-pairs") {
    val p = plan("q_winnow_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pair generation must stay fingerprint-keyed:\n$p")
  }

  test("q_pack_sequences reuses the per-lang window partitioning for the aggregate") {
    // HashPartitioning(lang) from the running-sum window must satisfy
    // the (lang, seq_id) group clustering — a second exchange before
    // the aggregate would re-shuffle the whole corpus for nothing
    val p = plan("q_pack_sequences")
    val shuffles = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(shuffles == 2, s"expected 2 shuffles (window + sort), got $shuffles:\n$p")
  }

  test("q_heavy_hitters aggregates map-side before the exchange") {
    val p = plan("q_heavy_hitters")
    assert(p.contains("partial_count"),
      s"token counting must partial-aggregate before shuffling:\n$p")
  }

  test("q_dedup_incremental reduces the corpus side before the join") {
    // the scale property: the big side enters the join as DISTINCT
    // (digest, keeper) — partial-aggregated map-side — never as raw rows
    val p = plan("q_dedup_incremental")
    assert(p.contains("partial_min"),
      s"corpus keeper set must partial-aggregate before shuffling:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("n_chars") && !readSchema.contains("source"),
      s"scan reads unreferenced columns: $readSchema")
  }

  test("q_collocations and q_lm_score broadcast only the 1-row scalar") {
    // the bigram count table must JOIN on its own partitioning, and
    // only the single-row N / vocab aggregate may broadcast — a
    // broadcast of the pair table would OOM at corpus vocab sizes
    for (q <- Seq("q_collocations", "q_lm_score")) {
      val p = plan(q)
      assert(p.contains("BroadcastExchange"), s"$q: missing scalar broadcast:\n$p")
      assert(p.contains("partial_count") || p.contains("partial_sum"),
        s"$q: marginals must partial-aggregate map-side:\n$p")
    }
  }

  test("q_anomaly joins the 3-row stats frame as a broadcast") {
    val p = plan("q_anomaly")
    assert(p.contains("BroadcastHashJoin"), s"stats join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"stats join fell back to SMJ:\n$p")
  }

  test("q_pca_power touches the corpus once: Spark job count stays O(1), not O(rounds)") {
    // the r7 Gram rewrite's scale property: 60 power rounds run
    // driver-side on the collected 64x64 matrix, so executing the
    // query schedules a handful of jobs (gram pass + result), never
    // one-per-round. A refactor back to a corpus pass per round jumps
    // this to 60+ — fail with the count.
    spark.sparkContext.setJobGroup("pca-job-count", "pca job count probe")
    try {
      SparkEntry.queries("q_pca_power")(spark, Sf0001).collect()
      // collect() returns only after every job it scheduled completed,
      // and setJobGroup tags each at submission — the tracker is exact
      val jobs = spark.sparkContext.statusTracker
        .getJobIdsForGroup("pca-job-count").length
      assert(jobs > 0 && jobs <= 10,
        s"q_pca_power scheduled $jobs jobs — the one-pass Gram build " +
          "regressed toward a corpus pass per power round")
    } finally spark.sparkContext.clearJobGroup()
  }

  test("AQE splits a genuinely skewed shuffle-join partition (OptimizeSkewedJoin)") {
    // the planner-visible half of the skew story: q_join_salted proves
    // MANUAL salting, this proves the RUNTIME re-plan — one hot key
    // lands one shuffle partition far above the median and AQE must
    // split it (SortMergeJoin flips isSkewJoin=true) instead of letting
    // a single straggler task carry the whole key. At 100 TB this is
    // the default defense for skew you didn't predict; thresholds are
    // tuned down because the fixture is far below production sizes.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val restore = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "262144")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      // hot key 1 carries 200k of 201k left rows (plus a payload so the
      // partition is heavy in BYTES, which is what AQE measures)
      val left = spark.range(0, 200000)
        .select(lit(1L).as("k"), concat(lit("x" * 64), $"id").as("payload"))
        .union(spark.range(2, 1002)
          .select($"id".as("k"), concat(lit("y"), $"id").as("payload")))
      val right = spark.range(1, 1002).select($"id".as("k"), ($"id" * 2).as("v"))
      val j = left.join(right, "k").select(sum(length($"payload")).as("s"))
      assert(j.collect().head.getLong(0) > 0) // execute → AQE final plan
      val adaptive = j.queryExecution.executedPlan.collectFirst {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a
      }.getOrElse(fail("no AdaptiveSparkPlanExec in executed plan"))
      // materialized QueryStageExec nodes are leaves to collect(), so
      // assert on the final plan's rendering: OptimizeSkewedJoin marks
      // the SMJ `skew=true` and the shuffle read `AQEShuffleRead skewed`
      val rendered = adaptive.executedPlan.toString
      assert(rendered.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire (no skew=true join):\n$rendered")
      assert(rendered.contains("AQEShuffleRead skewed"),
        s"skewed partition was not split by an AQEShuffleRead:\n$rendered")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q_link_jaccard tops out via TakeOrderedAndProject with no cartesian") {
    val p = plan("q_link_jaccard")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("q_cusum reads only the order-date column") {
    val p = plan("q_cusum")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("o_orderdate") && !readSchema.contains("o_totalprice")
      && !readSchema.contains("o_custkey"),
      s"scan should read only o_orderdate: $readSchema")
  }

  test("q_vocab_growth scans only (doc_id, text)") {
    val p = plan("q_vocab_growth")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text")
      && !readSchema.contains("lang") && !readSchema.contains("source"),
      s"scan reads unreferenced columns: $readSchema")
  }

  test("q_blocklist matches terms with a literal set, not a join") {
    // the blocklist rides the plan as an isin literal — any Join node
    // means the term list started shuffling corpus-sized streams
    val p = plan("q_blocklist")
    assert(!p.contains("Join"), s"blocklist must not plan a join:\n$p")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
      s"expected hash aggregate:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"scan reads unreferenced columns: $readSchema")
  }

  test("q_dedup_stats aggregates with map-side partials and no join") {
    val p = plan("q_dedup_stats")
    assert(!p.contains("Join"), s"rollup must not plan a join:\n$p")
    // two cascaded aggregates, each with a partial stage before the
    // exchange (4 HashAggregate nodes total)
    val aggs = "HashAggregate".r.findAllIn(p).length
    assert(aggs >= 4, s"expected partial+final for both aggregates, got $aggs:\n$p")
  }

  test("q_adamic_adar tops out via TakeOrderedAndProject with no cartesian") {
    val p = plan("q_adamic_adar")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("q_link_scores tops out via TakeOrderedAndProject over the checkpointed scored frame") {
    val p = plan("q_link_scores")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
    // the consumer is a projection over the memoized one-pass frame —
    // no join/aggregate may appear ABOVE the checkpoint scan
    assert(!p.contains("SortMergeJoin") && !p.contains("HashAggregate"),
      s"consumer must not replay the scored-frame build:\n$p")
  }

  test("q_image_dedup: decode feeds the cluster join once, no cartesian") {
    val p = plan("q_image_dedup")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
    // the decode stage is pinned (localCheckpoint) — the executed plan
    // must consume Scan ExistingRDD frames, not re-run mapPartitions
    // per consumer
    assert(p.contains("ExistingRDD"), s"expected checkpointed decode scan:\n$p")
  }

  test("q_supplier_part_counts plans the NOT IN as a broadcast anti join") {
    // the exclusion list is a ≤|suppliers| frame: it must broadcast
    // (null-aware anti join), never shuffle the pair stream against it
    val p = plan("q_supplier_part_counts")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast for the NOT IN side:\n$p")
    assert(p.contains("LeftAnti"), s"expected an anti join:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("q_dominant_suppliers gates the supplier scan through a broadcast left-semi join") {
    val p = plan("q_dominant_suppliers")
    assert(p.contains("LeftSemi"), s"expected a left-semi join:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("q_kneser_ney aggregates bigrams with map-side partials") {
    val p = plan("q_kneser_ney")
    // the pair-count aggregate must stage a partial before its exchange
    val aggs = "HashAggregate".r.findAllIn(p).length
    assert(aggs >= 4, s"expected partial+final aggregate stages, got $aggs:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("q_audio_stats is a narrow pipeline: no join, no aggregate, one oracle sort") {
    val p = plan("q_audio_stats")
    assert(!p.contains("Join"), s"decode path must not join:\n$p")
    assert(!p.contains("HashAggregate"), s"decode path must not aggregate:\n$p")
  }

  test("q_training_manifest stays on keyed joins: no cartesian, no unpartitioned window") {
    val p = plan("q_training_manifest")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
    // both windows are partitioned (norm_md5 / source) — a global
    // single-partition window here would serialize the whole corpus
    assert(!p.contains("Window [") || !p.contains("windowspecdefinition()"),
      s"unpartitioned window:\n$p")
  }

  test("q_deciles / q_rfm rank with ZERO unpartitioned windows (two-level ScaleRank)") {
    // the r9 verdict's scale-killer class: ntile/row_number OVER a
    // global ORDER BY serializes the corpus onto one executor. The
    // two-level rewrite must keep every WindowExec partitioned —
    // pinned on the OPTIMIZED LOGICAL plan so AQE re-planning can't
    // hide a regression.
    // q_mann_whitney's prefix sum and q_common_paths' lead() hops ride
    // bucket-/user-partitioned windows; q_rolling_distinct is pure
    // cover-explode hash aggregation — none may global-sort the corpus
    // r11 additions: q_spearman (customer-grain ranks), q_skipping_stats
    // (part-table ntile layouts), and the whole retrieval family
    // (per-doc score/cosine/relevance ranks + the running relevant-count)
    // — all rewritten onto ScaleRank/limit this round
    for (q <- Seq("q_deciles", "q_rfm", "q_mann_whitney", "q_common_paths",
        "q_rolling_distinct", "q_trend", "q_gap_fill",
        "q_spearman", "q_skipping_stats", "q_bm25", "q_ndcg",
        "q_retrieval_metrics", "q_eval_multiprobe", "q_exact_quantiles")) {
      val lp = SparkEntry.queries(q)(spark, Sf0001).queryExecution.optimizedPlan
      val bad = lp.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty, s"$q has unpartitioned window(s):\n${bad.mkString("\n")}")
    }
  }

  test("q_vocab_growth / q_changepoint: unpartitioned windows are aggregate-grain only") {
    for (q <- Seq("q_vocab_growth", "q_changepoint")) {
      val lp = SparkEntry.queries(q)(spark, Sf0001)
        .queryExecution.optimizedPlan
      val global = lp.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      // every global window must sit ABOVE an Aggregate — its input is
      // a grain-reduced frame (the 10-row decile rollup / the calendar
      // day-grain series), never the corpus
      global.foreach { w =>
        val reduced = w.child.collectFirst {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        }
        assert(reduced.nonEmpty,
          s"$q: global window runs over a non-aggregated (corpus-shaped) input:\n$w")
      }
    }
  }

  test("q_ppr: seed joins broadcast, iteration joins stay node-keyed, no cartesian") {
    val p = plan("q_ppr")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"seed-indicator join must broadcast:\n$p")
  }

  test("q_mrl_recall: no cartesian anywhere in the overlap plan") {
    // the probe join (non-equi q_id <> c_id, broadcast(q) hinted) sits
    // BEHIND the scored frame's localCheckpoint, so the final plan
    // starts at the checkpointed scan — pin what is visible: the
    // overlap joins and unions must never fall back to a cartesian
    val p = plan("q_mrl_recall")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("q_psi shuffles nothing beyond the event_type aggregate") {
    val p = plan("q_psi")
    // every join in the plan is a broadcast of a scalar/model frame
    assert(!p.contains("SortMergeJoin"), s"model-frame join fell back to SMJ:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("q_dsir_weights joins the model-sized λ table by broadcast only") {
    // the (doc, f) aggregate is the ONLY corpus-sized frame; λ lives
    // on ≤4096 rows and must never pull the corpus into a shuffle join
    val p = plan("q_dsir_weights")
    assert(!p.contains("SortMergeJoin"), s"λ join fell back to SMJ:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast λ join:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-200 should avoid a full sort:\n$p")
  }

  test("q_cms_watchlist exact recount joins only the broadcast watchlist") {
    val p = plan("q_cms_watchlist")
    assert(!p.contains("SortMergeJoin"), s"watchlist join fell back to SMJ:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("q_concurrency: the delta prefix sum is day-partitioned, never a global window") {
    // the scale design is the two-level prefix sum: the data-sized
    // window must carry day_idx in its partition spec; only the
    // model-sized day-grain carry window may be unpartitioned
    val exec = SparkEntry.queries("q_concurrency")(spark, Sf0001)
      .queryExecution.optimizedPlan
    val windows = exec.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.size >= 3, s"expected session+running+carry windows:\n$exec")
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.size == 1,
      s"exactly the day-grain carry window may be global, got ${unpartitioned.size}")
  }

  test("q_frequent_items: the MG summary aggregates with map-side partials") {
    val p = plan("q_frequent_items")
    // ObjectHashAggregate partial+final proves the ≤k-entry summary —
    // not the token stream — crosses the exchange
    assert(p.contains("ObjectHashAggregate"), s"expected object hash agg:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 should avoid a full sort:\n$p")
  }

  test("q_image_phash: decode map is narrow; the only shuffle keys on the hash") {
    val p = plan("q_image_phash")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"unexpected join in a map+window plan:\n$p")
  }

  test("q_mase: one fact aggregate; spine/grid joins stay broadcast") {
    val p = plan("q_mase")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast grid joins:\n$p")
  }

  test("GLOBAL-WINDOW SWEEP: every unpartitioned window in EVERY query plan " +
      "is declared and grain-reduced") {
    // q_spearman/q_skipping_stats survived TWO manual sweeps before the
    // r10 verdict caught them — so the sweep is now automatic: walk all
    // registered queries' OPTIMIZED logical plans, and require each
    // unpartitioned Window to (a) belong to a query on this explicit
    // allow-list with a documented grain, and (b) sit above an Aggregate
    // or a Limit in its own child lineage — structural proof its input
    // frame is grain-reduced, never the corpus. Anyone adding a global
    // window over a corpus-shaped frame fails this test by name.
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate, GlobalLimit, LocalLimit, Window => LWindow}
    val allow: Map[String, String] = Map(
      "q_auc" -> "cumulative TPR/FPR over DISTINCT-SCORE groups",
      "q_benford" -> "9-row leading-digit frame",
      "q_bm25_wand" -> "rank over the k=20 survivors of a TakeOrdered limit",
      "q_boilerplate" -> "DF-thresholded boilerplate-gram ranks",
      "q_hybrid_rrf" -> "rank over the 20 survivors of a TakeOrdered limit",
      "q_changepoint" -> "calendar day-grain series",
      "q_chi2" -> "contingency-cell grain (|segments|x|flags|)",
      "q_collocations" -> "PMI rank over count-thresholded bigram vocabulary",
      "q_concurrency" -> "day-grain delta carry (PlanAuditSpec pins exactly one)",
      "q_corpus_mix" -> "language-grain budget frames (|langs| rows)",
      "q_cusum" -> "calendar day-grain series",
      "q_histogram" -> "fixed bin-grain frame",
      "q_lang_temperature" -> "language-grain weight frame",
      "q_sample_weighted" -> "rank over the 64 survivors of a TakeOrdered limit",
      "q_session_paths" -> "rank over count-thresholded distinct journey paths",
      "q_skyline" -> "dominance scan over the skyline-candidate aggregate",
      "q_vocab_growth" -> "decile-grain growth curve (10 rows)")
    val offenders = scala.collection.mutable.ListBuffer[String]()
    for (q <- SparkEntry.queries.keys.toSeq.sorted) {
      val lp = SparkEntry.queries(q)(spark, Sf0001).queryExecution.optimizedPlan
      val global = lp.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
      if (global.nonEmpty) {
        if (!allow.contains(q))
          offenders += s"$q: UNDECLARED global window(s) — declare the grain " +
            s"here or re-rank via ScaleRank:\n${global.mkString("\n")}"
        else global.foreach { w =>
          val reduced = w.child.collectFirst {
            case a: Aggregate => a
            case l: GlobalLimit => l
            case l: LocalLimit => l
          }
          if (reduced.isEmpty)
            offenders += s"$q: global window input has NO Aggregate/Limit below " +
              s"(corpus-shaped?) despite allow-list entry '${allow(q)}':\n$w"
        }
      }
    }
    assert(offenders.isEmpty,
      s"${offenders.size} global-window violation(s):\n${offenders.mkString("\n\n")}")
  }
}
