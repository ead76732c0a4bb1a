package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    def run(name: String): Option[Double] = {
      // drop cross-query residue BEFORE the clock starts: queries using
      // localCheckpoint (CC loop, tfidf, minhash) leave their blocks
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
      // GC → settle → GC barrier: the first collection queues the
      // now-unreferenced checkpoint/shuffle blocks to the async
      // ContextCleaner, the settle gives the cleaner thread a beat to
      // actually drop them (block files included), and the second
      // collection reclaims the freed heap — so the timed pass starts
      // from a quiet heap instead of paying the PREVIOUS query's full
      // GC mid-flight (the documented ±30%-plus swing class on the
      // heavy graph lines: same binary, 15 vs 31 s across artifacts)
      System.gc(); Thread.sleep(150); System.gc()
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
    // full warmup pass: JVM/codegen warmup, parquet footer caches, and
    // per-query plan compilation jitter land here, so the timed pass
    // is comparable round over round
    names.foreach(run)
    // median of 3 timed passes per query: single-pass totals swung
    // 79 vs 93 s across runs of the SAME binary from host contention
    // alone, so a per-query median (and a total OF medians) is the
    // smallest sample that yields a reproducible regression signal.
    // HEAVY lines (median > 5 s) get 2 extra passes (median of 5):
    // they are exactly where host contention lands hardest (2x driver-
    // vs-builder swings on the same code), and 5 samples cost little
    // relative to the lines themselves while halving the chance one
    // contended pass decides the published number. The artifact
    // records each query's per-pass [min, max] spread so a cross-run
    // delta can be read against the measured within-run envelope
    // instead of guessed at.
    val passes = 3
    val HeavySeconds = 5.0
    val HeavyExtraPasses = 2
    val spreads = scala.collection.mutable.LinkedHashMap[String, (Double, Double, Int)]()
    val results = names.flatMap { n =>
      val base = Seq.fill(passes)(run(n)).flatten
      // a query that failed ANY pass gets no numeric entry — a partial
      // median would still under-report it
      if (base.size != passes) None
      else {
        val isHeavy = base.sorted.apply(passes / 2) > HeavySeconds
        val extra =
          if (isHeavy) Seq.fill(HeavyExtraPasses)(run(n)).flatten else Nil
        // extra passes obey the same rule: a failed pass voids the
        // entry (a partial 4-sample set would publish its upper-middle
        // value as a "median" while the query also sits in `failed`)
        if (isHeavy && extra.size != HeavyExtraPasses) None
        else {
          val ts = (base ++ extra).sorted
          spreads(n) = (ts.head, ts.last, ts.size)
          Some(n -> ts(ts.size / 2))
        }
      }
    }
    // regression tripwire: compare per-query medians against the
    // previous artifact BEFORE overwriting it — with median-of-3 the
    // numbers are stable enough that a >2x jump (beyond sub-second
    // noise) is signal, and it should be one loud stderr line instead
    // of round-over-round JSON archaeology
    val prevFile = java.nio.file.Paths.get("BENCH_FULL.json")
    if (java.nio.file.Files.exists(prevFile)) {
      val prev = new String(java.nio.file.Files.readAllBytes(prevFile), "UTF-8")
      // optional exponent: 1.0E-4 must parse as 1e-4, not 1.0 — a
      // sub-millisecond prior time would otherwise corrupt the baseline
      val entry = "\"(q_[a-z0-9_]+)\":([0-9.]+(?:[Ee][+-]?[0-9]+)?)".r
      val prevTimes = entry.findAllMatchIn(prev)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
      results.foreach { case (n, t) =>
        prevTimes.get(n).filter(p => t > 2 * p && t - p > 0.5).foreach { p =>
          System.err.println(
            f"[bench] REGRESSION $n: $p%.2f s -> $t%.2f s (${t / p}%.1fx)")
        }
      }
    }
    // the driver's artifact keeps the TAIL of the stdout line (BENCH_r*
    // "tail" fields all start mid-line and end at sbt's success line),
    // so the end of the JSON object is what survives truncation: put
    // the FASTEST queries first (heavy hitters last → kept) and the
    // headline metric/value/sf fields AFTER the queries map — key order
    // is irrelevant to any JSON parser that sees the whole line, and
    // the truncated tail now carries the numbers that matter. Times are
    // ms-precision (3 decimals) to shorten the line; BENCH_FULL.json
    // keeps the same rounding (sub-ms digits are noise at this scale).
    // Locale.ROOT: the f-interpolator honors the JVM default locale,
    // and a comma decimal separator would corrupt the JSON
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.sortBy(_._2).map { case (k, v) => s""""$k":${ms(v)}""" }
      .mkString("{", ",", "}")
    // per-pass spreads lead the object (truncation-safe position: the
    // driver keeps the TAIL of the line, so queries + headline survive
    // even if the spreads don't): [min, max, n_passes] per query
    val sp = results.sortBy(_._2).map { case (k, _) =>
      val (lo, hi, np) = spreads(k)
      s""""$k":[${ms(lo)},${ms(hi)},$np]"""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson =
      if (failed.isEmpty) ""
      else s""","failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
    val json =
      s"""{"spread":$sp,"queries":$qs$failedJson,"passes_per_query":$passes,"heavy_extra_passes":$HeavyExtraPasses,"stat":"median","n_queries":${results.size},"sf":"$sfDir","metric":"total","unit":"sec","value":${ms(total)}}"""
    println(json)
    // belt-and-braces: the full result also lands in the repo so no
    // stdout truncation can lose per-query times. FULL runs only — a
    // filtered run must never replace the suite-wide artifact with a
    // partial total (the same misleading-near-zero trap as a typo'd
    // filter, just intentional), and neither may a run with failures
    // (its total silently omits the broken queries)
    if (args.isEmpty && failed.isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
        json.getBytes("UTF-8"))
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
