package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interleaved same-JVM A/B for the round-13 wedge/prefix rewrites —
  * the measurement protocol the host's cross-run variance forces: two
  * back-to-back `graft.Bench` runs of UNCHANGED queries have differed
  * by ±2× on this class of machine (r11/r12 drift family;
  * BENCH_NOTES.md), so an old-run-vs-new-run comparison cannot
  * attribute a delta to code. Here each pass times every variant once,
  * variants alternate WITHIN the pass (A, B, A', B', …), and the
  * verdict reads the per-variant median across passes — host drift
  * moves both sides of each pair together, so the PAIRWISE delta
  * survives it.
  *
  * Variants (old form first, suite form second) — see the Seq below
  * for the authoritative list; families:
  *   prefix_hash / prefix_ge  — q_dedup_prefix verify:
  *     size(array_intersect) vs graft_sorted_intersect_ge early-exit
  *   lcc_union3 / lcc_explode — q_local_cc corners: 3× unionAll
  *     re-read of the triangle checkpoint vs one explode pass
  *   links_hash / links_merge — scored-edge family triangle stream:
  *     explode(array_intersect) vs explode(graft_sorted_intersect)
  *   skip_nopin / skip_pin   — q_skipping_stats base-frame pin:
  *     recompute per branch vs localCheckpoint once
  *   lpa_* / keeperq_* / sedge_* / coedge_* — r14 ≥5 s-family trims
  *   closure_s* / linkch_s* / hits_s*      — chain-prefix cost profiles
  *   cc_* / dsim_* / hits_plain|ckpt / sig* — r14 second trim wave
  *
  * Usage: SPARK_GRAFT_SF_DIR=… SPARK_GRAFT_CPUS=32
  *        sbt "runMain graft.AbWedge [passes] [variantSubstr,…]"
  */
object AbWedge {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val allVariants: Seq[(String, () => DataFrame)] = Seq(
      "prefix_hash" -> (() =>
        graft.operators.TextOps.dedupPrefixPlan(spark, sfDir, geVerify = false)),
      "prefix_ge" -> (() =>
        graft.operators.TextOps.dedupPrefixPlan(spark, sfDir, geVerify = true)),
      "lcc_union3" -> (() =>
        graft.operators.GraphOps.localCcPlan(spark, sfDir, singleExplode = false)),
      "lcc_explode" -> (() =>
        graft.operators.GraphOps.localCcPlan(spark, sfDir, singleExplode = true)),
      "links_hash" -> (() =>
        graft.operators.GraphOps.linkScoresPlan(spark, sfDir, merge = false)),
      "links_merge" -> (() =>
        graft.operators.GraphOps.linkScoresPlan(spark, sfDir, merge = true)),
      // the r12-flagged unvalidated pin (verdict "what's wrong" #3)
      "skip_nopin" -> (() =>
        graft.operators.Functions2.skippingStatsPlan(spark, sfDir, pinBase = false)),
      "skip_pin" -> (() =>
        graft.operators.Functions2.skippingStatsPlan(spark, sfDir, pinBase = true)),
      // r14 ≥5 s-family trim: LPA per-round winner — row_number window
      // (sort per round) vs max(struct) hash argmax (identical winner,
      // map-side partial agg). Timed through qModularity's full
      // consumer chain, the heaviest LPA rider.
      "lpa_window" -> (() =>
        graft.operators.GraphOps.modularityPlan(spark, sfDir, argMax = false)),
      "lpa_argmax" -> (() =>
        graft.operators.GraphOps.modularityPlan(spark, sfDir, argMax = true)),
      // same pattern on the quality-aware keeper election (the window
      // is doc-grain there — one sort over every labeled document)
      "keeperq_window" -> (() =>
        graft.operators.TextOps.keeperQualityPlan(spark, sfDir, argMax = false)),
      "keeperq_argmax" -> (() =>
        graft.operators.TextOps.keeperQualityPlan(spark, sfDir, argMax = true)),
      // strong-edge support counting: countDistinct over the ~36 M-row
      // pair stream vs distinct BEFORE the pair join + plain count
      "sedge_cd" -> (() =>
        graft.operators.GraphOps.strongEdgesPlan(spark, sfDir, distinctFirst = false)),
      "sedge_dc" -> (() =>
        graft.operators.GraphOps.strongEdgesPlan(spark, sfDir, distinctFirst = true)),
      "sedge_dcp" -> (() =>
        graft.operators.GraphOps.strongEdgesPlan(spark, sfDir,
          distinctFirst = true, prepart = true)),
      // co-occurrence edge build: raw lineitem pairs vs dedup before
      // the pair join (shrinks the quadratic product; same output)
      "coedge_raw" -> (() =>
        graft.operators.GraphOps.coEdgesPlan(spark, sfDir, distinctFirst = false)),
      "coedge_dc" -> (() =>
        graft.operators.GraphOps.coEdgesPlan(spark, sfDir, distinctFirst = true)),
      // co-occurrence edge build, round 2: one pre-exchange shared by
      // both join sides, and the no-join grouped in-row pair form
      "coedge_prepart" -> (() =>
        graft.operators.GraphOps.coEdgesPlan(spark, sfDir,
          distinctFirst = false, mode = "prepart")),
      "coedge_grouped" -> (() =>
        graft.operators.GraphOps.coEdgesPlan(spark, sfDir,
          distinctFirst = false, mode = "grouped")),
      // ---- cold chain-prefix cost profiles (r14 trim targeting):
      // each stage prices the chain cut at a memoized prefix, so
      // stage(i+1) − stage(i) locates the expensive link
      "closure_s1" -> (() =>
        graft.operators.TextOps.simhashClosureStage(spark, sfDir, 1)),
      "closure_s2" -> (() =>
        graft.operators.TextOps.simhashClosureStage(spark, sfDir, 2)),
      "closure_s3" -> (() =>
        graft.operators.TextOps.simhashClosureStage(spark, sfDir, 3)),
      "closure_s4" -> (() =>
        graft.operators.TextOps.simhashClosureStage(spark, sfDir, 4)),
      "linkch_s1" -> (() =>
        graft.operators.GraphOps.linkChainStage(spark, sfDir, 1)),
      "linkch_s2" -> (() =>
        graft.operators.GraphOps.linkChainStage(spark, sfDir, 2)),
      "linkch_s3" -> (() =>
        graft.operators.GraphOps.linkChainStage(spark, sfDir, 3)),
      "hits_s1" -> (() =>
        graft.operators.GraphOps.hitsStage(spark, sfDir, 1)),
      "hits_s2" -> (() =>
        graft.operators.GraphOps.hitsStage(spark, sfDir, 2)),
      "hits_s3" -> (() =>
        graft.operators.GraphOps.hitsStage(spark, sfDir, 3)),
      // q_dedup_simhash group materialization: rely on exchange reuse
      // across the three groups consumers vs one localCheckpoint
      "dsim_plain" -> (() =>
        graft.operators.TextOps.dedupSimhashPlan(spark, sfDir, ckpt = false)),
      "dsim_ckpt" -> (() =>
        graft.operators.TextOps.dedupSimhashPlan(spark, sfDir, ckpt = true)),
      // CC doubling deferral over the md5 keeper graph: unconditional
      // pointer doubling vs plain min-prop for the first 4 rounds
      "cc_dbl" -> (() =>
        graft.operators.TextOps.closureCcPlan(spark, sfDir, doubleAfter = 0)),
      "cc_hybrid" -> (() =>
        graft.operators.TextOps.closureCcPlan(spark, sfDir, doubleAfter = 4)),
      // HITS normalizer subtree duplication: lazy denominator frames
      // vs per-iteration node-sized checkpoints
      "hits_plain" -> (() =>
        graft.operators.GraphOps.hitsStage(spark, sfDir, 3, ckptIters = false)),
      "hits_ckpt" -> (() =>
        graft.operators.GraphOps.hitsStage(spark, sfDir, 3, ckptIters = true)),
      // modularity chain-prefix profile (r15 adjudication: the one
      // non-stall-shaped r14 regression — 2.4x on both driver passes
      // while q_communities, sharing stages 1-2, priced 1.05x)
      "mod_s1" -> (() =>
        graft.operators.GraphOps.modularityStage(spark, sfDir, 1)),
      "mod_s2" -> (() =>
        graft.operators.GraphOps.modularityStage(spark, sfDir, 2)),
      "mod_s3" -> (() =>
        graft.operators.GraphOps.modularityStage(spark, sfDir, 3)),
      // signature build form: token-grain aggregate pipeline vs the
      // one-pass per-doc scalar expression (graft_simhash_doc_*)
      "sigxx_agg" -> (() =>
        graft.operators.TextOps.sigBuildPlan(spark, sfDir, "xx", onePass = false)),
      "sigxx_expr" -> (() =>
        graft.operators.TextOps.sigBuildPlan(spark, sfDir, "xx", onePass = true)),
      "sigmd5_agg" -> (() =>
        graft.operators.TextOps.sigBuildPlan(spark, sfDir, "md5", onePass = false)),
      "sigmd5_expr" -> (() =>
        graft.operators.TextOps.sigBuildPlan(spark, sfDir, "md5", onePass = true)),
      // ---- r15 optimization-round pairs ----
      // closeness BFS state: (seed, node) pair rows vs MS-BFS bitmask
      "close_pair" -> (() =>
        graft.operators.GraphOps.closenessPlan(spark, sfDir, msbfs = false)),
      "close_msbfs" -> (() =>
        graft.operators.GraphOps.closenessPlan(spark, sfDir, msbfs = true)),
      // stock replay fold: WITH RECURSIVE UnionLoop vs the Lindley
      // reflection-identity windows
      "stock_rec" -> (() =>
        graft.operators.Relational.stockReplayPlan(spark, sfDir, recursiveSim = true)),
      "stock_win" -> (() =>
        graft.operators.Relational.stockReplayPlan(spark, sfDir, recursiveSim = false)),
      // PPR blend scaffold: deg ⋈ seeds ⋈ contrib per round vs blending
      // directly on contrib (same node set by construction)
      "ppr_scaffold" -> (() =>
        graft.operators.GraphOps.pprPlan(spark, sfDir, slimBlend = false)),
      "ppr_slim" -> (() =>
        graft.operators.GraphOps.pprPlan(spark, sfDir, slimBlend = true)),
      // scored-edge triangle stream: O(T) checkpoint between triangle
      // build and the single-consumer explode+agg vs fusing it
      "links_trickpt" -> (() =>
        graft.operators.GraphOps.linkScoresPlan(spark, sfDir, merge = false)),
      "links_fused" -> (() =>
        graft.operators.GraphOps.linkScoresPlan(spark, sfDir,
          merge = false, fuseTri = true)),
      // q_ann_recall model training: pre-r15 duplicate Lloyd/PQ builds
      // vs the per-pass model memo (flag reset by the thunks below)
      "annrec_dup" -> (() =>
        try {
          graft.operators.VectorOps.modelMemoEnabled = false
          SparkEntry.queries("q_ann_recall")(spark, sfDir)
        } finally graft.operators.VectorOps.modelMemoEnabled = true),
      "annrec_memo" -> (() =>
        SparkEntry.queries("q_ann_recall")(spark, sfDir)))

    // optional second arg: comma-separated substring filter so a
    // 2-variant question doesn't pay the whole sweep
    val variants = args.drop(1).headOption match {
      case Some(f) =>
        val subs = f.split(",").toSeq
        allVariants.filter { case (n, _) => subs.exists(n.contains) }
      case None => allVariants
    }
    require(variants.nonEmpty, "variant filter matched nothing")

    // Bench's cold-path discipline verbatim: clear cross-query memos +
    // cached blocks, then a GC → settle → GC barrier before the clock
    def clearResidue(): Unit = {
      graft.operators.TextOps.clearGraphCache()
      graft.operators.GraphOps.clearGraphCache()
      graft.operators.VectorOps.clearModelCache()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    def timed(build: () => DataFrame): Double = {
      clearResidue()
      System.gc(); Thread.sleep(150); System.gc()
      val t0 = System.nanoTime()
      build().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    // one untimed warmup sweep (JIT/codegen/parquet footers), then the
    // interleaved timed passes
    variants.foreach { case (_, b) => timed(b) }
    (1 to passes).foreach { p =>
      variants.foreach { case (n, b) =>
        val t = timed(b)
        times(n) = times(n) :+ t
        System.err.println(f"[ab] pass $p $n%-12s $t%7.3f s")
      }
    }
    println(variants.map { case (n, _) =>
      val ts = times(n).sorted
      // even pass counts average the two middle elements — an
      // upper-middle pick would bias the stat high exactly when the
      // user asks for an even number of passes
      val med =
        if (ts.size % 2 == 1) ts(ts.size / 2)
        else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2.0
      f""""$n":{"median":$med%.3f,"min":${ts.head}%.3f,"max":${ts.last}%.3f}"""
    }.mkString("{", ",", "}"))
    spark.stop()
  }
}
