package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Empirical scaling probe for the dedup/ANN suite — converts the
  * "survives 100 TB" posture from a plan-shape argument into a
  * measured time exponent. Synthesizes m× blowups of a base corpus,
  * times each sub-quadratic path at two multipliers, and asserts the
  * growth stays near-linear (t(16×)/t(4×) < 6, i.e. well under the
  * 16× a quadratic path would show).
  *
  * Corpus synthesis (the `doubled` id-shift trick generalized, with
  * one crucial twist): a plain m-fold id-shifted union would make
  * every document an exact duplicate of its m−1 siblings, so the TRUE
  * near-dup pair count — the output itself — would grow as m²·n and
  * no sub-quadratic algorithm could look linear. Each copy is instead
  * DECORRELATED from the others while keeping the ORIGINAL corpus's
  * internal duplicate structure intact:
  *
  *  - documents: every token in copy c gets a copy-unique prefix
  *    (`foo` → `c3xfoo`), so shingle/token/signature overlap across
  *    copies is zero while overlap within a copy is exactly the base
  *    corpus's — the corpus is m disjoint replicas of the original
  *    duplicate density.
  *  - embeddings: copy c is multiplied elementwise by a deterministic
  *    ±1 sign pattern. cos(s∘u, s∘v) = cos(u, v) (the pattern cancels
  *    within a copy: s_j² = 1), so every intra-copy near-dup pair and
  *    ANN neighborhood is preserved EXACTLY, while cross-copy cosines
  *    become sign-scrambled sums that stay far below the 0.9 near-dup
  *    threshold — no m² cross-copy pair blowup.
  *
  * The LSH paths re-derive their plane counts per corpus size via
  * LshParams.forCorpus — the documented deployment knob that holds
  * expected bucket width constant as n grows (log₂-more planes, not
  * wider buckets). That derivation is exactly what the probe is
  * validating: with it, candidate volume per item is bounded and the
  * measured exponent stays near 1.
  */
object ScaleProbe {

  /** Deterministic ±1 pattern for copy c — same no-RNG-state scheme
    * as VectorOps.planes, keyed off (copy, dim index). */
  private def signs(c: Int, dim: Int): Seq[Float] =
    (0 until dim).map { j =>
      val h = scala.util.hashing.MurmurHash3.productHash((c, j))
      if ((h & 1) == 0) 1.0f else -1.0f
    }

  /** Write documents.parquet + embeddings.parquet at m× the base
    * corpus under `outDir` (copy 0 verbatim; copies 1..m−1 id-shifted
    * by c·10⁷ — clear of the 10⁶ shift the dedup queries' internal
    * doubling adds — and decorrelated as documented above). */
  def writeScaled(s: SparkSession, srcDir: String, outDir: String,
      m: Int): Unit = {
    require(m >= 1)
    val docs = Tables.documents(s, srcDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val scaledDocs = (0 until m).map { c =>
      if (c == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(c * 10000000L))
        .withColumn("text",
          concat(lit(s"c${c}x"), regexp_replace(col("text"), " ", s" c${c}x")))
    }.reduce(_ union _)
    scaledDocs.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val emb = Tables.embeddings(s, srcDir).select("vec_id", "embedding", "label")
    val scaledEmb = (0 until m).map { c =>
      if (c == 0) emb
      else emb
        .withColumn("vec_id", col("vec_id") + lit(c * 10000000L))
        .withColumn("sgn", typedlit(signs(c, 64)))
        .withColumn("embedding",
          zip_with(col("embedding"), col("sgn"),
            (x, sg) => (x * sg).cast("float")))
        .select("vec_id", "embedding", "label")
    }.reduce(_ union _)
    scaledEmb.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    // lineitem (for the co-occurrence graph path): copy c shifts BOTH
    // l_orderkey and l_partkey into copy-disjoint key spaces, so the
    // graph becomes m disjoint replicas — edges, wedges, and triangles
    // all scale exactly m× while per-order widths (the pair-join
    // fan-out bound) stay the base corpus's.
    val li = Tables.lineitem(s, srcDir)
    val scaledLi = (0 until m).map { c =>
      if (c == 0) li
      else li
        .withColumn("l_orderkey", col("l_orderkey") + lit(c * 10000000L))
        .withColumn("l_partkey", col("l_partkey") + lit(c * 10000000L))
    }.reduce(_ union _)
    scaledLi.write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    // orders (q_hits bipartite graph + q_stock_replay demand): copy c
    // shifts o_orderkey in lockstep with lineitem (intra-copy joins
    // stay intact, cross-copy joins impossible) and o_custkey into the
    // same disjoint space — the purchase graph becomes m disjoint
    // replicas. o_orderdate is kept verbatim: the stock-replay month
    // spine (the recursion depth) stays FIXED while demand volume
    // grows m× — exactly the 100-TB shape (more rows, same calendar).
    val ord = Tables.orders(s, srcDir)
    val scaledOrd = (0 until m).map { c =>
      if (c == 0) ord
      else ord
        .withColumn("o_orderkey", col("o_orderkey") + lit(c * 10000000L))
        .withColumn("o_custkey", col("o_custkey") + lit(c * 10000000L))
    }.reduce(_ union _)
    scaledOrd.write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    // customer replicas keep c_nationkey, so every copy's demand maps
    // onto the SAME region set (the stock grid stays region × months);
    // nation/region are genuine dims — verbatim.
    val cust = Tables.customer(s, srcDir)
    val scaledCust = (0 until m).map { c =>
      if (c == 0) cust
      else cust.withColumn("c_custkey", col("c_custkey") + lit(c * 10000000L))
    }.reduce(_ union _)
    scaledCust.write.mode("overwrite").parquet(s"$outDir/customer.parquet")
    Tables.nation(s, srcDir).write.mode("overwrite").parquet(s"$outDir/nation.parquet")
    Tables.region(s, srcDir).write.mode("overwrite").parquet(s"$outDir/region.parquet")
    // part (q_brand_mixing brand labels): copy c shifts p_partkey in
    // lockstep with lineitem's l_partkey shift; brand/size columns
    // verbatim — every replica carries the base brand mix, so the
    // co-purchase graph's degree-brand moments scale m× under an
    // unchanged mixing matrix.
    val part = Tables.part(s, srcDir)
    val scaledPart = (0 until m).map { c =>
      if (c == 0) part
      else part.withColumn("p_partkey", col("p_partkey") + lit(c * 10000000L))
    }.reduce(_ union _)
    scaledPart.write.mode("overwrite").parquet(s"$outDir/part.parquet")
    // events (q_concurrency sweep line): copy c shifts user_id and
    // event_id into disjoint spaces, timestamps verbatim — m× the
    // users over the SAME day range, so per-day delta volume grows m×
    // while the day-grain carry model stays constant-sized.
    val ev = Tables.events(s, srcDir)
    val scaledEv = (0 until m).map { c =>
      if (c == 0) ev
      else ev
        .withColumn("event_id", col("event_id") + lit(c * 10000000L))
        .withColumn("user_id", col("user_id") + lit(c * 10000000L))
    }.reduce(_ union _)
    scaledEv.write.mode("overwrite").parquet(s"$outDir/events.parquet")
  }

  /** The probed paths. Text-dedup paths run exactly the suite
    * queries (their blocking is DF-capped / signature-bounded, no
    * size-dependent parameter); the two LSH vector paths re-derive
    * plane counts from the corpus size, mirroring a real deployment.
    * q_simhash_clusters covers the driver-coordinated CC loop — the
    * one stage whose cost is rounds × per-round shuffle rather than a
    * single plan, so its exponent is the least provable on paper and
    * the most worth measuring. */
  private def paths(nEmb: Long): Seq[(String, (SparkSession, String) => DataFrame)] = {
    val dedupP = VectorOps.LshParams.forCorpus(2 * nEmb, 64L, bands = 5)
    val annP = VectorOps.LshParams.forCorpus(nEmb, 16L, bands = 4)
    Seq(
      "q_dedup_minhash" -> TextOps.queries("q_dedup_minhash"),
      "q_line_dedup" -> TextOps.queries("q_line_dedup"),
      // span dedup is the purest linear path (token-bounded explode,
      // no pair join); its planted trailer is shared across copies,
      // which only raises per-key occurrence COUNTS — membership
      // counting, not pairs, so no cross-copy blowup
      "q_span_dedup" -> TextOps.queries("q_span_dedup"),
      "q_dedup_ngram" -> TextOps.queries("q_dedup_ngram"),
      // prefix filtering's worst case is the hot-shingle join the
      // rare-first canonical order is supposed to neutralize — the
      // probe measures that claim instead of trusting it
      "q_dedup_prefix" -> TextOps.queries("q_dedup_prefix"),
      "q_dedup_edit" -> TextOps.queries("q_dedup_edit"),
      "q_dedup_simhash" -> TextOps.queries("q_dedup_simhash"),
      "q_simhash_clusters" -> TextOps.queries("q_simhash_clusters"),
      "q_pagerank" -> TextOps.queries("q_pagerank"),
      "q_embed_dedup" ->
        ((s: SparkSession, d: String) => VectorOps.embedDedupAt(s, d, dedupP)),
      "q_sim_lsh" ->
        ((s: SparkSession, d: String) => VectorOps.simLshTopK(s, d, annP)),
      "q_sim_ivf" -> VectorOps.queries("q_sim_ivf"),
      // PQ's codebook is corpus-size-INdependent (PqM×PqK model);
      // training/encode are O(n·M·K) narrow scans and the ADC join is
      // O(n·M) with a Q=10 constant — the probe validates that no
      // stage hides a super-linear exchange
      "q_sim_pq" -> VectorOps.queries("q_sim_pq"),
      // the composed path: cell pruning × ADC — its candidate join is
      // the product of two bounded reductions, but the composition is
      // exactly where a hidden cross-stage blowup would live
      "q_sim_ivfpq" -> VectorOps.queries("q_sim_ivfpq"),
      // the degree-ordered wedge join is the one stage here whose
      // worst case is m^1.5 — the probe checks the co-occurrence
      // graph's real exponent stays linear when the graph grows as
      // disjoint replicas (per-copy density constant)
      "q_triangles" -> GraphOps.queries("q_triangles"),
      // the suite's #1 bench line: rides the same oriented wedge
      // machinery as q_triangles plus the 3·T corner explode — probed
      // directly so the artifact carries the measurement, not the
      // shared-path argument
      "q_local_cc" -> GraphOps.queries("q_local_cc"),
      // keeper selection joins the dedup-cluster labels (the CC loop)
      // against per-doc quality — the top bench line of the curation
      // family, probed for the same carry-the-measurement reason
      "q_keeper_quality" -> TextOps.queries("q_keeper_quality"),
      // k-core peeling: disjoint replicas keep the degree distribution
      // (hence the derived K and the peel depth) exactly the base
      // corpus's, so cost should scale as rounds × m — linear, with
      // the driver-coordinated loop overhead the probe prices in
      "q_kcore" -> GraphOps.queries("q_kcore"),
      // winnowing pairs: copy-rewritten texts keep fingerprints
      // copy-local, so the fp-keyed join should scale m× — the probe
      // prices the df-capped fan-out claim the same way it does the
      // shingle and LSH paths
      "q_winnow_pairs" -> TextOps.queries("q_winnow_pairs"),
      // Kneser–Ney joins the full doc-bigram stream back through
      // three model tables (pair counts, context stats, predecessor
      // diversity); every join is bigram-keyed so the probe checks
      // the stream stays linear when the corpus grows as replicas
      // (replicas multiply COUNTS, not the type inventory)
      "q_kneser_ney" -> TextOps.queries("q_kneser_ney"),
      // synchronous LPA: rounds are constant, each round is one
      // edge-keyed join + agg — the second driver-coordinated loop
      // (after the CC/k-core family) whose exponent is worth
      // measuring rather than arguing
      "q_communities" -> GraphOps.queries("q_communities"),
      // link Jaccard: the wedge machinery again (the probe clears the
      // graph memo, so this prices the full cold build) plus the 3·T
      // corner explode and an edge-keyed agg — probed directly so the
      // new bench line carries its own measurement
      "q_link_jaccard" -> GraphOps.queries("q_link_jaccard"),
      // Adamic–Adar — the suite's #1 bench line: same wedge machinery
      // + the one-pass scored-edge frame (per-node decimal terms, one
      // (u,v) agg); probed directly so the top line carries a measured
      // exponent instead of the shared-path argument
      "q_adamic_adar" -> GraphOps.queries("q_adamic_adar"),
      // modularity rides the LPA label memo (cleared per pass here) +
      // one edge-keyed label join — prices the full synchronous-LPA
      // rebuild cold, the third driver-coordinated loop
      "q_modularity" -> GraphOps.queries("q_modularity"),
      // ANN recall composes all four index chains + pinned brute
      // force; each part is bounded (fixed Q, blocked candidates) but
      // the composition is where a hidden blowup would live — probed
      // as the one number that prices the whole ANN family
      "q_ann_recall" -> VectorOps.queries("q_ann_recall"),
      // SimHash near-dup chain: the banded Hamming-≤3 pair stream
      // (sizes) and its transitive closure (the pointer-doubling CC
      // loop whose round count is data-dependent) — the two md5-twin
      // estimate queries the r7 bench tops carried unmeasured
      "q_simhash_sizes" -> TextOps.queries("q_simhash_sizes"),
      "q_simhash_closure" -> TextOps.queries("q_simhash_closure"),
      // landmark BFS: rounds ≈ diameter, each a frontier×adjacency
      // equi join — probed so "≤ diameter rounds" stays measured, not
      // assumed, as the graph densifies with SF
      "q_closeness" -> GraphOps.queries("q_closeness"),
      // bipartite HITS: two pinned iterations, each one edge equi-join
      // + node-keyed agg over the DISTINCT (cust, part) purchase edges
      // — O(|E|) per iteration on paper; probed because the r9 bench
      // priced it at 6.4 s with no measured exponent
      "q_hits" -> GraphOps.queries("q_hits"),
      // WITH RECURSIVE stateful replay: the recursion depth is the
      // month-spine length (fixed by the calendar, NOT by row count),
      // so cost should scale as m× demand aggregation + a constant
      // number of grid-joined recursion steps — the probe checks the
      // materialized-grid plan holds that shape as rows grow
      "q_stock_replay" -> Relational.queries("q_stock_replay"),
      // sweep-line concurrency: session windows + the two-level prefix
      // sum (day-partitioned running sums, day-grain broadcast carry)
      // — the claim the two-level rewrite makes is exactly linearity,
      // so it carries its own measurement
      "q_concurrency" -> Windows.queries("q_concurrency"),
      // the ScaleRank two-level exact-rank family — the r9 verdict's
      // single-partition-window fixes. Their entire reason to exist is
      // the scale exponent, so each carries its own measurement:
      // corpus-grain ntile (deciles), three ranked dimensions at
      // customer grain (rfm), and the value-grain prefix sum
      // (mann_whitney)
      "q_deciles" -> Functions2.queries("q_deciles"),
      "q_rfm" -> Analytics.queries("q_rfm"),
      "q_mann_whitney" -> Analytics.queries("q_mann_whitney"),
      // the heavy round-10 additions (r10 verdict asked for exponents):
      // personalized PageRank — two unrolled power iterations over the
      // cold co-purchase graph build; each iteration is one edge join +
      // node agg, so the replica construction should hold it linear
      "q_ppr" -> GraphOps.queries("q_ppr"),
      // Newman assortativity: one scored-edge frame + degree-grain
      // moment aggregates — probed because its bench line (3.7 s)
      // rides the same cold co-graph build as q_ppr
      "q_brand_mixing" -> GraphOps.queries("q_brand_mixing"),
      // banding recall/precision vs exact Jaccard on a probe-broadcast
      // O(|probes|·n) plan — the probe validates the asymmetric-join
      // claim (fixed probe set, corpus side grows m×)
      "q_minhash_recall" -> TextOps.queries("q_minhash_recall"),
      // exact-rational gap fill: spine grid join + per-key carry
      // windows — all key-partitioned, measured rather than argued
      "q_gap_fill" -> Relational.queries("q_gap_fill"),
      // exact corpus order statistics via value-grain counting + the
      // two-level prefix sum — the "exact p99 with no global sort"
      // claim carries its own exponent
      "q_exact_quantiles" -> Functions2.queries("q_exact_quantiles")
    )
  }

  /** Median of `passes` noop-sink materializations (first pass doubles
    * as warmup — the median sheds it; `useMin` switches the estimator
    * to min-of-passes for ScalingSpec's retry, where late-session JVM
    * stalls are strictly one-sided additive noise). Residue is dropped
    * outside the clock, as in Bench. */
  private def timeMedian(s: SparkSession, passes: Int,
      useMin: Boolean = false,
      sink: Seq[Double] => Unit = _ => ())(f: => DataFrame): Double = {
    val ts = Seq.fill(passes) {
      // memo first (as in Bench): unpersist would orphan its
      // checkpoint blocks, and the probe's exponents must price the
      // full COLD build per pass — a memo hit on pass 2+ would fake a
      // sub-linear exponent for the md5-family paths
      TextOps.clearGraphCache()
      GraphOps.clearGraphCache()
      VectorOps.clearModelCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      // GC → settle → GC, not a single collection: unpersist only
      // QUEUES block drops to the async ContextCleaner; without the
      // settle the next pass starts with the previous paths' checkpoint
      // blocks still resident and pays their eviction + full GC
      // mid-flight — the documented random-victim spike class (Bench's
      // barrier rationale; observed here as one heavy path per probe
      // run spiking 4-20× with a different victim each run)
      System.gc(); Thread.sleep(150); System.gc()
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    sink(ts)
    estimate(ts, useMin)
  }

  /** The pass-vector estimator, extracted so ScalingSpec can pin its
    * discriminating property as a fixture: min-of-passes sheds
    * ONE-SIDED additive stalls (some passes inflated, the fastest
    * clean) but still trips on a genuine super-linear path, whose
    * growth inflates EVERY pass — including the minimum. */
  private[graft] def estimate(ts: Seq[Double], useMin: Boolean): Double =
    if (useMin) ts.min
    else {
      // even pass counts average the two middle elements — the
      // upper-middle pick biases 2-sample estimates high exactly when
      // a budget truncation leaves an even sample (same rule as
      // Bench.stat and AbWedge)
      val s = ts.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

  /** Synthesize each multiplier under `workDir` and time every path
    * (or just the ones named by `only` — the Scaling merge mode and
    * ScalingSpec's retry). `useMin` = estimate each path by the
    * MINIMUM of its passes instead of the median: in a long probe JVM
    * session (39 paths × 2 scales × builds, ~40 min) late-session
    * stalls (code-cache/GC storms) are strictly ONE-SIDED additive
    * noise that can inflate all 3 consecutive passes of a single
    * path 10-25× (observed: the same plan on the same corpus measures
    * 6-12 s under an interleaved A/B in a fresh JVM), while a genuine
    * super-linear exponent inflates EVERY pass including the minimum —
    * so min-of-passes still fails a real quadratic blowup
    * deterministically but sheds the stall class.
    * @param spreadSink called with (path, multiplier, per-pass times)
    *   after each path's passes — ScalingSpec's retry logs the full
    *   spread through it so a bimodal path (min fast, median 10×) is
    *   surfaced in test output rather than silently passed by the min
    * @return multiplier → (path → seconds) */
  def run(s: SparkSession, baseDir: String, workDir: String,
      multipliers: Seq[Int], passes: Int = 3,
      only: Option[Set[String]] = None,
      useMin: Boolean = false,
      spreadSink: (String, Int, Seq[Double]) => Unit = (_, _, _) => ())
      : Map[Int, Map[String, Double]] =
    multipliers.map { m =>
      val dir = s"$workDir/x$m"
      writeScaled(s, baseDir, dir, m)
      val nEmb = s.read.parquet(s"$dir/embeddings.parquet").count()
      val selected = only.fold(paths(nEmb)) { names =>
        val ps = paths(nEmb).filter(p => names(p._1))
        require(ps.map(_._1).toSet == names,
          s"unknown probe paths: ${(names -- ps.map(_._1)).mkString(", ")}")
        ps
      }
      m -> selected.map { case (name, q) =>
        name -> timeMedian(s, passes, useMin,
          sink = ts => spreadSink(name, m, ts))(q(s, dir))
      }.toMap
    }.toMap
}
