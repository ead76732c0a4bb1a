package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE final JSON line with per-query stats,
  * and — crucially — a complete, parseable PARTIAL JSON line after
  * EVERY finished pass: the driver keeps the tail of stdout and kills
  * the run at a fixed wall budget, so a timeout must still yield an
  * artifact of record.
  *
  * Execution order is PASS-MAJOR (r14): sweep 1 runs every query once
  * (warmup + 1 timed pass), so a complete 295/295 artifact exists as
  * early as possible; sweeps 2..N add one timed pass per query each,
  * upgrading the per-query stat from single-sample to median as they
  * land. The r13 driver run was killed at 3 575 s mid-suite and the
  * old query-major order (all passes of q_a before any pass of q_b)
  * priced only an alphabetical PREFIX — 236/295 with 59 queries
  * carrying no number at all. Pass-major turns the same kill into
  * 295/295 single-pass prices: strictly more information for the same
  * wall.
  *
  * Comparability note: in pass-major order a query's 2nd/3rd passes
  * run ~294 queries after its 1st, so its codegen'd classes have
  * usually left the bounded Janino cache and each pass repays plan
  * compilation. That cost is real and identical for every query, and
  * the per-query warmup before the first timed pass still absorbs the
  * one-time JIT/parquet-footer work — but medians are expected to sit
  * a hair above the r12 query-major medians on sub-second lines.
  *
  * Two more r14 guards:
  *  - stall shedding: a timed pass measuring >4x the previous
  *    artifact's price for that query (and >2 s absolute) gets ONE
  *    immediate retry, and the pass records the min of the two — the
  *    q_sim_ivf class (one block-eviction stall pricing a 1.3 s query
  *    at 21.6 s in the artifact of record) costs a loud stderr line
  *    instead of a poisoned number. A genuine regression is slow on
  *    the retry too and still lands.
  *  - soft wall budget (SPARK_GRAFT_WALL_BUDGET, default 3300 s):
  *    once sweep 1 is complete, later sweeps stop between queries
  *    when the budget is reached and the run exits 0 with the stats
  *    gathered so far — a clean artifact instead of a driver rc-124
  *    kill. Sweep 1 itself never stops early: full coverage first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val wall0 = System.nanoTime()
    def wallSec: Double = (System.nanoTime() - wall0) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val wallBudget = sys.env.getOrElse("SPARK_GRAFT_WALL_BUDGET", "3300").toDouble
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
    // materialize through the noop sink, NOT count(): count() lets
    // Catalyst prune every projection and drop the sort, so parse and
    // derived-column work would never be evaluated — the timed plan
    // must produce every output column
    // a throwing query must never land in the artifact as a plausible
    // small number (elapsed-until-throw LOWERS the total, and the >2x
    // tripwire only fires on slower): record the failure, keep it out
    // of the JSON numbers, and exit nonzero at the end
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def clearResidue(): Unit = {
      // drop cross-query residue BEFORE the clock starts: the several
      // queries using localCheckpoint leave their blocks
      // registered until the ContextCleaner catches up, and ~200
      // executions of residue in one JVM turns into GC churn that lands
      // on whichever query runs when the heap fills (measured: a 1.3 s
      // query spiking to 16 s mid-suite)
      // the graph memo must go FIRST: unpersisting would orphan its
      // localCheckpoint blocks anyway, and clearing it keeps every
      // timed repetition COLD-path — the cross-query sharing speeds up
      // pipeline runs (graft.Verify), never the published numbers
      graft.operators.TextOps.clearGraphCache()
      graft.operators.GraphOps.clearGraphCache()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    def gcSettle(): Unit = {
      // GC → settle → GC barrier: the first collection queues the
      // now-unreferenced checkpoint/shuffle blocks to the async
      // ContextCleaner, the settle gives the cleaner thread a beat to
      // actually drop them (block files included), and the second
      // collection reclaims the freed heap — so the timed pass starts
      // from a quiet heap instead of paying the PREVIOUS query's full
      // GC mid-flight (the documented ±30%-plus swing class on the
      // heavy graph lines: same binary, 15 vs 31 s across artifacts)
      System.gc(); Thread.sleep(150); System.gc()
    }
    def run(name: String, barrier: Boolean): Option[Double] = {
      clearResidue()
      if (barrier) gcSettle()
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed += name
          None
      }
    }
    // optional arg: comma-separated query-name filter (local iteration).
    // Unknown names ABORT: silently dropping a typo would overwrite
    // BENCH_FULL.json with a misleading near-zero partial total.
    val names = args.headOption match {
      case Some(f) =>
        val asked = f.split(",").toSeq
        val unknown = asked.filterNot(SparkEntry.queries.contains)
        if (unknown.nonEmpty) {
          System.err.println(
            s"[bench] unknown queries: ${unknown.mkString(", ")} — aborting")
          spark.stop()
          sys.exit(1)
        }
        asked
      case None => SparkEntry.queries.keys.toSeq.sorted
    }
    // regression tripwire + stall-shed baseline: load the previous
    // artifact's per-query stats BEFORE overwriting it, and flag live
    // per query (one loud stderr line beats round-over-round JSON
    // archaeology).
    // optional exponent: 1.0E-4 must parse as 1e-4, not 1.0 — a
    // sub-millisecond prior time would otherwise corrupt the baseline
    val prevFile = java.nio.file.Paths.get("BENCH_FULL.json")
    val prevTimes: Map[String, Double] =
      if (java.nio.file.Files.exists(prevFile)) {
        val prev = new String(java.nio.file.Files.readAllBytes(prevFile), "UTF-8")
        // the baseline only means anything at the SAME scale factor: a
        // local sf0.01 iteration run compared against the committed
        // sf0.1 artifact would flag every query as a stall/regression
        if (prev.contains(s""""sf":"$sfDir"""")) {
          val entry = "\"(q_[a-z0-9_]+)\":([0-9.]+(?:[Ee][+-]?[0-9]+)?)".r
          entry.findAllMatchIn(prev)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
        } else {
          System.err.println(
            s"[bench] BENCH_FULL.json is for a different sf than $sfDir — no tripwire baseline")
          Map.empty[String, Double]
        }
      } else Map.empty
    // target of 3 timed passes per query: single-pass totals swung
    // 79 vs 93 s across runs of the SAME binary from host contention
    // alone, so a per-query median (and a total OF medians) is the
    // smallest sample that yields a reproducible regression signal.
    // Under the soft wall budget a query may finish with fewer passes;
    // the spread's third element records how many actually landed.
    val passes = 3
    // Barrier policy (r12): the full GC-settle barrier runs before
    // every query's warmup pass (clearing the PREVIOUS query's
    // residue), but before the timed passes of a SUB-SECOND query it
    // is skipped — a query that finishes in <1 s neither leaves enough
    // residue to poison its own next pass nor amortizes a ~1 s
    // barrier. ~270 of 297 queries are sub-second-to-low-second, so
    // this alone buys back ~800 of the ~930 barrier-seconds that
    // helped push r11 past the driver's wall budget. Cache clears
    // (cheap, race-free) still run before every pass. The decision is
    // made once from the warmup time (which includes one-time
    // JIT/codegen cost — conservatively biased: over-barriering only
    // costs wall, never measurement quality) and remembered across
    // sweeps.
    val BarrierSeconds = 1.0
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // Locale.ROOT: the f-interpolator honors the JVM default locale,
    // and a comma decimal separator would corrupt the JSON
    val perQueryBarrier = scala.collection.mutable.Map[String, Boolean]()
    val samples = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    val stallRetried = scala.collection.mutable.LinkedHashSet[String]()
    val warned = scala.collection.mutable.Set[String]()
    // median of the passes gathered so far; even sizes average the two
    // middle elements (an upper-middle pick would bias 2-sample stats
    // high exactly when the wall budget truncates a sweep)
    def stat(ts: Vector[Double]): Double = {
      val s = ts.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // one complete JSON line per finished (query, pass), headline
    // fields LAST: the driver's artifact keeps the TAIL of the stdout
    // stream, so whatever was flushed most recently survives a
    // wall-clock kill, and within a line the totals sit at the
    // truncation-safe end. "partial":true marks every line but the
    // last; a parser that takes the final complete JSON line gets the
    // full artifact on a clean run and the best-available state on a
    // timeout — after sweep 1 that state already prices EVERY query.
    def artifactLine(partial: Boolean): String = {
      val sorted = samples.toSeq.map { case (k, ts) => (k, stat(ts)) }.sortBy(_._2)
      val qs = sorted.map { case (k, v) => s""""$k":${ms(v)}""" }
        .mkString("{", ",", "}")
      val sp = sorted.map { case (k, _) =>
        val ts = samples(k).sorted
        s""""$k":[${ms(ts.head)},${ms(ts.last)},${ts.size}]"""
      }.mkString("{", ",", "}")
      val total = sorted.map(_._2).sum
      val failedJson =
        if (failed.isEmpty) ""
        else s""","failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
      val retriedJson =
        if (stallRetried.isEmpty) ""
        else s""","stall_retried":${stallRetried.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
      val partialJson = if (partial) s""","partial":true""" else ""
      s"""{"spread":$sp,"queries":$qs$failedJson$retriedJson$partialJson,"order":"pass_major","passes_per_query":$passes,"stat":"median","n_queries":${samples.size},"n_asked":${names.size},"sf":"$sfDir","metric":"total","unit":"sec","value":${ms(total)}}"""
    }
    @volatile var lastLine = ""
    def emit(partial: Boolean): Unit = {
      lastLine = artifactLine(partial)
      println(lastLine)
      System.out.flush()
    }
    // belt-and-braces for a SIGTERM kill: flush one final complete
    // line from the shutdown hook (sbt's forked-process destroy sends
    // TERM, so hooks run; if the pipe is already gone this is a no-op)
    val hook = new Thread(() => if (lastLine.nonEmpty) {
      println(lastLine); System.out.flush()
    })
    Runtime.getRuntime.addShutdownHook(hook)
    // one timed pass with stall shedding: a pass >4x the previous
    // artifact's price (and >2 s over it — sub-second lines jitter
    // past 4x on noise alone) gets ONE immediate retry and records the
    // min. Only fires with a baseline (a brand-new query can't shed),
    // and at most twice per query across the whole run: a GENUINE 4×
    // regression is slow on its retries too, and letting it re-retry
    // every sweep would double its suite cost for no extra signal.
    val retryCount = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    def timedPass(n: String, barrier: Boolean): Option[Double] =
      run(n, barrier).map { t =>
        prevTimes.get(n) match {
          case Some(p) if t > 4 * p && t - p > 2.0 && retryCount(n) < 2 =>
            retryCount(n) += 1
            System.err.println(
              f"[bench] STALL? $n: $t%.2f s vs prev $p%.2f s — one retry")
            run(n, barrier) match {
              case Some(t2) =>
                stallRetried += n
                System.err.println(f"[bench] retry $n: $t2%.2f s (keeping min)")
                math.min(t, t2)
              case None => t // retry threw; keep the measured pass,
                             // n is in `failed` and drops below anyway
            }
          case _ => t
        }
      }
    def record(n: String, t: Double): Unit = {
      samples(n) = samples.getOrElse(n, Vector.empty) :+ t
      val med = stat(samples(n))
      prevTimes.get(n).filter(p => med > 2 * p && med - p > 0.5).foreach { p =>
        if (warned.add(n))
          System.err.println(
            f"[bench] REGRESSION $n: $p%.2f s -> $med%.2f s (${med / p}%.1fx)")
      }
    }
    // ---- sweep 1: warmup + first timed pass for EVERY query --------
    names.zipWithIndex.foreach { case (n, i) =>
      // warmup pass (always behind a full barrier): JVM/codegen warmup,
      // parquet footer caches, and plan compilation jitter land here,
      // so the timed passes are comparable round over round
      run(n, barrier = true) match {
        case None => // warmup threw — timed passes would throw the same
          // way; n is already in `failed`, skip it in every sweep
        case Some(w) =>
          perQueryBarrier(n) = w > BarrierSeconds
          timedPass(n, perQueryBarrier(n)) match {
            case Some(t) => record(n, t)
            case None => samples.remove(n) // failed: no numeric entry
          }
      }
      emit(partial = true)
      System.err.println(
        f"[bench] sweep 1: ${i + 1}/${names.size}, wall $wallSec%.0f s, sum ${samples.valuesIterator.map(stat).sum}%.1f s")
    }
    // ---- sweeps 2..passes: one more pass per query, budget-gated ---
    val survivors = names.filterNot(failed.contains)
    var budgetStop = false
    (2 to passes).foreach { sweep =>
      survivors.zipWithIndex.foreach { case (n, i) =>
        if (!budgetStop && !failed.contains(n)) {
          if (wallSec > wallBudget) {
            budgetStop = true
            System.err.println(
              f"[bench] wall budget $wallBudget%.0f s reached at sweep $sweep ($i/${survivors.size}) — stopping; every query keeps its gathered passes")
          } else {
            timedPass(n, perQueryBarrier.getOrElse(n, true)) match {
              case Some(t) => record(n, t)
              // a query that fails ANY pass keeps NO numeric entry — a
              // partial median would still under-report it (and the
              // `failed` list + nonzero exit surface the breakage)
              case None => samples.remove(n)
            }
            emit(partial = true)
          }
        }
      }
      if (!budgetStop)
        System.err.println(
          f"[bench] sweep $sweep done, wall $wallSec%.0f s, sum-of-stats ${samples.valuesIterator.map(stat).sum}%.1f s")
    }
    // the one non-partial line of the run (budget-stopped or clean) —
    // every in-loop emission is partial:true, so the final state is
    // re-emitted exactly once without the flag
    emit(partial = false)
    Runtime.getRuntime.removeShutdownHook(hook)
    // belt-and-braces: the full result also lands in the repo so no
    // stdout truncation can lose per-query times. FULL runs only — a
    // filtered run must never replace the suite-wide artifact with a
    // partial total (the same misleading-near-zero trap as a typo'd
    // filter, just intentional), and neither may a run with failures
    // (its total silently omits the broken queries). A budget-stopped
    // run still qualifies: every query is priced, just from fewer
    // passes.
    if (args.isEmpty && failed.isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
        lastLine.getBytes("UTF-8"))
    else if (args.nonEmpty)
      System.err.println("[bench] filtered run — BENCH_FULL.json not updated")
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(
        s"[bench] FAILED queries (no numeric entry): ${failed.mkString(", ")}")
      sys.exit(1)
    }
  }
}
