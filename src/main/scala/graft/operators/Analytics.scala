package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Corpus- and series-analytics beyond the per-family modules: robust
  * location statistics, exponentially-weighted series smoothing,
  * distribution divergence between sources, out-of-vocabulary rates
  * across data splits, and cross-split contamination — the checks a
  * training-data pipeline runs between curation and training.
  *
  * Determinism contract (same as the rest of the engine): every
  * compared double is either a single IEEE expression over exact
  * integers/decimals (identical cross-engine) or a sum of
  * DECIMAL(18,9)-pinned terms (exact, order-free). Rank-based
  * statistics break ties on row identity so both engines elect the
  * same row.
  */
object Analytics {

  private def tokens(c: String = "text"): Column = split(col(c), " ")

  // ---- q_robust_stats: median / MAD / trimmed mean per source ------
  //
  // Outlier-robust location stats over documents.n_chars. All three
  // statistics are RANK-based (lower median at row (n+1) DIV 2 in the
  // (value, doc_id) order; MAD the same over |x − med|; 10 % trimmed
  // mean over ranks (n DIV 10, n − n DIV 10]) so every elected value
  // is an exact BIGINT and the only doubles are final divisions.
  // Scale shape: two source-partitioned window sorts plus a broadcast
  // of the ≤|sources| per-source medians — range-partitionable by the
  // group key; nothing global ever sorts.
  private def qRobustStats(s: SparkSession, d: String): DataFrame = {
    val bySrc = Window.partitionBy("source")
    val byVal = bySrc.orderBy(col("n_chars"), col("doc_id"))
    val ranked = Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rn", row_number().over(byVal).cast("long"))
      .withColumn("n", count(lit(1)).over(bySrc))
    val med = ranked.filter(col("rn") === expr("(n + 1) DIV 2"))
      .select(col("source"), col("n_chars").as("median"))
    val byDev = bySrc.orderBy(col("dev"), col("doc_id"))
    val mad = ranked.join(broadcast(med), Seq("source"))
      .withColumn("dev", abs(col("n_chars") - col("median")))
      .withColumn("dn", row_number().over(byDev).cast("long"))
      .filter(col("dn") === expr("(n + 1) DIV 2"))
      .select(col("source"), col("dev").as("mad"))
    val agg = ranked.groupBy("source").agg(
      max(col("n")).as("n"),
      sum(col("n_chars")).as("sx"),
      sum(when(col("rn") > expr("n DIV 10") && col("rn") <= expr("n - n DIV 10"),
        col("n_chars")).otherwise(0L)).as("sx_trim"),
      sum(when(col("rn") > expr("n DIV 10") && col("rn") <= expr("n - n DIV 10"),
        1L).otherwise(0L)).as("n_trim"))
    agg.join(broadcast(med), Seq("source")).join(broadcast(mad), Seq("source"))
      .select(col("source"), col("n"),
        (col("sx").cast("double") / col("n").cast("double")).as("mean"),
        col("median"), col("mad"),
        (col("sx_trim").cast("double") / col("n_trim").cast("double")).as("trimmed_mean"))
      .orderBy("source")
  }

  // ---- q_ewma: exponentially-weighted daily order volume -----------
  //
  // 10-day adjusted EWMA (α = 0.1 ⇒ decay 0.9^lag) of the daily order
  // count, the smoothing a volume monitor runs before spike-flagging.
  // The decay weights 0.9^lag for lag ≤ 9 are EXACT decimals of scale
  // ≤ 9, inlined as literals on both engines, so numerator and
  // denominator are exact DECIMAL sums and the one division per day
  // is deterministic. Shape: day-grain aggregate, then a 10-way lag
  // explode equi-joined back on the day key — an equi shuffle join on
  // a frame whose size is days×10, NOT a range nested-loop; at any
  // corpus scale the day-grain frame is tiny.
  private val EwmaWeights: IndexedSeq[java.math.BigDecimal] =
    (0 to 9).map(l => new java.math.BigDecimal("0.9").pow(l))

  private def ewmaWeightCase(lagCol: String): String =
    (0 to 9).map(l => s"WHEN $l THEN CAST('${EwmaWeights(l).toPlainString}' AS DECIMAL(18,9))")
      .mkString(s"CASE $lagCol ", " ", " END")

  private def qEwma(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val probes = daily.select(col("day"), explode(expr("sequence(0, 9)")).as("lag"))
      .withColumn("look_day", expr("date_add(day, -lag)"))
      .withColumn("w", expr(ewmaWeightCase("lag")))
    val hist = daily.select(col("day").as("look_day"), col("n_orders").as("h_n"))
    probes.join(hist, Seq("look_day"))
      .groupBy("day")
      .agg(
        expr("SUM(CAST(CAST(h_n AS DECIMAL(18,9)) * w AS DECIMAL(18,9)))").as("num"),
        expr("SUM(w)").as("den"))
      .join(daily, Seq("day"))
      // day re-cast to TIMESTAMP for the cross-engine compare (the
      // q_active_users convention: both engines emit µs timestamps)
      .select(col("day").cast("timestamp").as("day"), col("n_orders"),
        (col("num").cast("double") / col("den").cast("double")).as("ewma10"))
      .withColumn("ratio", col("n_orders").cast("double") / col("ewma10"))
      .orderBy("day")
  }

  // ---- q_js_divergence: pairwise source distribution divergence ----
  //
  // Jensen–Shannon divergence between every pair of per-source
  // unigram distributions — the mixing-time answer to "which sources
  // are interchangeable and which add diversity". Distributions are
  // exact-count ratios p = f/total (one IEEE division each); each
  // term's KL contribution p·ln(2p/(p+q)) is computed per-row and
  // DECIMAL(18,9)-pinned before the pair sum, so the aggregation is
  // order-free. Terms absent from one source contribute only on the
  // present side (the zero side's limit is 0). Scale shape: one
  // (source, term) hash agg, a vocab×K zero-filled grid, and a
  // term-keyed self-join producing vocab×K(K−1)/2 rows — K is the
  // catalog-bounded source count, so the join is linear in vocabulary.
  private def qJsDivergence(s: SparkSession, d: String): DataFrame = {
    val tf = Tables.documents(s, d)
      .select(col("source"), explode(tokens()).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("f"))
    val tot = tf.groupBy("source").agg(sum(col("f")).as("tot"))
    val vocab = tf.select("term").distinct()
    val grid = vocab.crossJoin(broadcast(tot))
      .join(tf, Seq("source", "term"), "left_outer")
      .select(col("source"), col("term"),
        (coalesce(col("f"), lit(0L)).cast("double") / col("tot").cast("double")).as("p"))
    val a = grid.select(col("source").as("source_a"), col("term"), col("p").as("pa"))
    val b = grid.select(col("source").as("source_b"), col("term"), col("p").as("pb"))
    a.join(b, Seq("term"))
      .filter(col("source_a") < col("source_b") && (col("pa") > 0.0 || col("pb") > 0.0))
      .groupBy("source_a", "source_b")
      .agg(
        count(lit(1)).as("n_terms"),
        sum(when(col("pa") > 0.0 && col("pb") > 0.0, 1L).otherwise(0L)).as("n_shared"),
        expr("""CAST(SUM(CAST(
                  CASE WHEN pa > 0 THEN pa * ln(2 * pa / (pa + pb)) ELSE 0 END
                AS DECIMAL(18,9))) AS DOUBLE)""").as("kl_a"),
        expr("""CAST(SUM(CAST(
                  CASE WHEN pb > 0 THEN pb * ln(2 * pb / (pa + pb)) ELSE 0 END
                AS DECIMAL(18,9))) AS DOUBLE)""").as("kl_b"))
      .withColumn("js_div", lit(0.5) * (col("kl_a") + col("kl_b")))
      .select("source_a", "source_b", "n_terms", "n_shared", "js_div")
      .orderBy("source_a", "source_b")
  }

  // ---- q_oov: out-of-vocabulary rate of eval splits ----------------
  //
  // The vocabulary is every distinct token of the TRAIN split (the
  // q_split_assign hash rule); each eval (val/test) document's token
  // occurrences are scored against it and the OOV mass is reported
  // per (source, split) — the "will my tokenizer see unknowns"
  // pre-training check. Counts are exact BIGINTs; the one division is
  // final. Scale shape: token explode → distinct vocab (term-keyed
  // agg), then a term-keyed left join of eval occurrences against the
  // vocab — both sides linear in corpus tokens, no pair joins.
  private def qOov(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("split", Sampling.splitOf(Sampling.hexKey(col("doc_id"))))
    val vocab = docs.filter(col("split") === "train")
      .select(explode(tokens()).as("term")).distinct()
      .withColumn("known", lit(1L))
    docs.filter(col("split") =!= "train")
      .select(col("source"), col("split"), col("doc_id"), explode(tokens()).as("term"))
      .join(vocab, Seq("term"), "left_outer")
      .groupBy("source", "split")
      .agg(
        count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("known").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
      .orderBy("source", "split")
  }

  // ---- q_leakage: cross-split exact-text contamination -------------
  //
  // Exact duplicates whose copies land in DIFFERENT splits leak eval
  // answers into training — the first contamination check after any
  // split assignment. Run over the doubled corpus (the dedup family's
  // planted-duplicate device: every doc re-appears under doc_id + 1e6,
  // and the hash split of the twin is independent of the original's),
  // it reports every text digest with a train copy AND an eval copy,
  // with per-split counts and representative ids. Scale shape: one
  // digest-keyed hash agg over the corpus — the q_dedup_exact shuffle
  // — then a filter; no joins at all.
  private def qLeakage(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val doubled = docs.unionAll(
      docs.select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text")))
    doubled
      .withColumn("split", Sampling.splitOf(Sampling.hexKey(col("doc_id"))))
      .withColumn("dig", md5(col("text")))
      .groupBy("dig")
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"),
        min(when(col("split") === "train", col("doc_id"))).as("min_train_id"),
        min(when(col("split") =!= "train", col("doc_id"))).as("min_eval_id"))
      .filter(col("n_train") > 0 && (col("n_val") > 0 || col("n_test") > 0))
      .orderBy("dig")
  }

  // ---- q_cusum: change-point scan over the daily volume series -----
  //
  // CUSUM drift detection: the cumulative deviation of the daily order
  // count from the series mean, C_k = S_k − k·(N/D), peaking at the
  // day where the level shifts — the first thing a volume monitor
  // computes when "did ingest change regime?" comes up. S_k and k are
  // EXACT BIGINT window sums over the day order, N and D exact corpus
  // totals, so every C_k is ONE IEEE expression over exact integers,
  // parenthesized identically in both engines; the peak flag compares
  // those bit-identical doubles. Scale shape: day-grain aggregate
  // (tiny at any corpus size) + one window pass over days.
  private def qCusum(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val byDay = Window.orderBy(col("day"))
    val all = Window.partitionBy()
    daily
      .withColumn("k", row_number().over(byDay).cast("long"))
      .withColumn("run_sum", sum(col("n_orders")).over(byDay))
      .withColumn("tot", sum(col("n_orders")).over(all))
      .withColumn("n_days", count(lit(1)).over(all))
      .withColumn("cusum",
        expr("""CAST(run_sum AS DOUBLE)
                - (CAST(k AS DOUBLE) * CAST(tot AS DOUBLE)) / CAST(n_days AS DOUBLE)"""))
      .withColumn("is_peak",
        abs(col("cusum")) === max(abs(col("cusum"))).over(all))
      .select(col("day").cast("timestamp").as("day"), col("n_orders"),
        col("run_sum"), col("cusum"), col("is_peak"))
      .orderBy("day")
  }

  // ---- q_cohort_ltv: acquisition-cohort revenue triangle ----------
  //
  // The classic cohort LTV readout: customers grouped by FIRST-order
  // month, revenue laid out by months-since-acquisition k ≤ 11, with
  // per-cohort size, active-customer counts and the cumulative
  // (running) revenue curve. All money stays DECIMAL(18,2)-exact
  // through both the cell sums and the running window; the only
  // doubles are final casts. Scale shape: the fact scan aggregates to
  // (customer → first month) and joins back on the SAME custkey
  // hash partitioning (co-partitioned, no extra exchange class);
  // cohort cells are month×12 model-sized, where the running window
  // and the broadcast size join are free.
  private def qCohortLtv(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_custkey"),
      expr("CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)").as("m"),
      expr("CAST(o_totalprice AS DECIMAL(18,2))").as("price"))
    val cohort = o.groupBy(col("o_custkey")).agg(min(col("m")).as("cm"))
      .localCheckpoint() // feeds the fact join AND the cohort sizes
    val sizes = cohort.groupBy(col("cm")).agg(count(lit(1)).as("cohort_size"))
    val cells = o.join(cohort, Seq("o_custkey"))
      .withColumn("k", col("m") - col("cm"))
      .filter(col("k") <= 11)
      .groupBy(col("cm"), col("k"))
      .agg(countDistinct(col("o_custkey")).as("n_active"),
        sum(col("price")).as("rev_dec"))
    val w = Window.partitionBy(col("cm")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.join(broadcast(sizes), Seq("cm"))
      .withColumn("cum_dec", sum(col("rev_dec")).over(w))
      .select(
        expr("CAST(make_date(CAST(cm DIV 12 AS INT), CAST(cm % 12 + 1 AS INT), 1) AS TIMESTAMP)")
          .as("cohort_month"),
        col("k"), col("cohort_size"), col("n_active"),
        expr("CAST(rev_dec AS DOUBLE)").as("revenue"),
        expr("CAST(cum_dec AS DOUBLE)").as("cum_revenue"))
      .orderBy("cohort_month", "k")
  }

  // ---- q_benford: first-digit law audit ---------------------------
  //
  // Benford's-law conformance of order totals — the data-quality /
  // fraud screen an audit pipeline runs over any money column. The
  // leading digit is taken STRING-wise from floor(x) (identical
  // cross-engine; no double log10, no double→int cast-rounding
  // divergence), Benford probabilities log10(1+1/d) are DRIVER-
  // computed DECIMAL(18,9) literals inlined into both engines, the
  // expected count n·p stays exact decimal (n as DECIMAL(18,0):
  // 18+18+1 = 37 ≤ 38 so the product never overflows, and the row-
  // count ceiling is 10^18 — comfortably past 100 TB), and each
  // chi² term (obs−e)²/e is one fixed-shape IEEE composite over those
  // exact inputs, DECIMAL-pinned before the sum. Scale: one hash
  // aggregate to 9 digit rows; everything after is model-sized.
  private val BenfordP: IndexedSeq[java.math.BigDecimal] =
    (1 to 9).map { d0 =>
      new java.math.BigDecimal(math.log10(1.0 + 1.0 / d0))
        .setScale(9, java.math.RoundingMode.HALF_UP)
    }

  private def benfordCase(digitCol: String): String =
    s"CASE $digitCol " + (1 to 9).map(d0 =>
      s"WHEN $d0 THEN CAST('${BenfordP(d0 - 1).toPlainString}' AS DECIMAL(18,9))")
      .mkString(" ") + " END"

  private def qBenford(s: SparkSession, d: String): DataFrame = {
    val digits = Tables.orders(s, d)
      .select(expr(
        "CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 1, 1) AS BIGINT)")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val tot = digits.agg(sum(col("n_obs")).as("n"))
    digits.crossJoin(broadcast(tot))
      .withColumn("p_benford", expr(benfordCase("digit")))
      .withColumn("expected_dec",
        expr("CAST(n AS DECIMAL(18,0)) * p_benford"))
      .withColumn("term_dec", expr(
        """CAST((CAST(n_obs AS DOUBLE) - CAST(expected_dec AS DOUBLE))
               * (CAST(n_obs AS DOUBLE) - CAST(expected_dec AS DOUBLE))
               / CAST(expected_dec AS DOUBLE) AS DECIMAL(18,9))"""))
      .withColumn("chi2", expr(
        "CAST(SUM(term_dec) OVER () AS DOUBLE)"))
      .select(col("digit"), col("n_obs"),
        expr("CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE)").as("share"),
        expr("CAST(p_benford AS DOUBLE)").as("p_benford"),
        expr("CAST(expected_dec AS DOUBLE)").as("expected"),
        expr("CAST(term_dec AS DOUBLE)").as("chi2_term"),
        col("chi2"))
      .orderBy("digit")
  }

  // ---- q_mase: seasonal-naive forecast skill ----------------------
  //
  // The forecasting-eval standard (Hyndman–Koehler MASE): per
  // priority, the weekly seasonal-naive forecast ŷ_d = y_{d−7} is
  // scored over the LAST 28 days against the same forecaster's
  // in-sample MAE — mase = (Σ_eval|err| · n_train) / (Σ_train|err| ·
  // n_eval), one IEEE division over four exact BIGINTs (a value < 1
  // means the recent horizon is MORE weekly-predictable than history).
  // The day spine is DENSE (zero-order days count as y = 0), so the
  // lag-7 lookup is a plain window lag over the grid — no self-join,
  // no gap hazard. Scale shape: one fact-table day-grain aggregate
  // (the only big scan), then spine/grid frames are day×priority
  // model-sized; the day bounds ride a 1-row broadcast.
  private def qMase(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .select(col("o_orderpriority").as("priority"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000").as("day"))
      .groupBy("priority", "day").agg(count(lit(1)).as("n"))
      .localCheckpoint() // feeds bounds, the priority list, and the grid
    val bounds = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val spine = bounds.select(col("hi"), explode(expr("sequence(lo, hi)")).as("day"))
    val grid = spine.crossJoin(broadcast(daily.select("priority").distinct()))
      .join(daily, Seq("priority", "day"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val w = Window.partitionBy("priority").orderBy("day")
    grid
      .withColumn("n_lag", lag(col("n"), 7).over(w))
      .filter(col("n_lag").isNotNull)
      .withColumn("abs_err", abs(col("n") - col("n_lag")))
      .withColumn("is_eval", col("day") > col("hi") - 28)
      .groupBy(col("priority"))
      .agg(
        sum(when(!col("is_eval"), 1L).otherwise(0L)).as("n_train"),
        sum(when(!col("is_eval"), col("abs_err")).otherwise(0L)).as("sum_train"),
        sum(when(col("is_eval"), 1L).otherwise(0L)).as("n_eval"),
        sum(when(col("is_eval"), col("abs_err")).otherwise(0L)).as("sum_eval"))
      .withColumn("mase", expr(
        """(CAST(sum_eval AS DOUBLE) * CAST(n_train AS DOUBLE))
           / (CAST(sum_train AS DOUBLE) * CAST(n_eval AS DOUBLE))"""))
      .select("priority", "n_train", "sum_train", "n_eval", "sum_eval", "mase")
      .orderBy("priority")
  }

  // ---- q_autocorr: lag-1 autocorrelation of daily volumes ----------
  //
  // Per-priority lag-1 autocorrelation of the daily order count — the
  // "is today's volume predictive of tomorrow's" seasonality probe.
  // Pairs (x_t, x_{t+1}) come from one lead() over the observed day
  // sequence; Pearson r is assembled from SIX exact BIGINT sums
  // (n, Σx, Σy, Σxy, Σx², Σy²) in a single IEEE expression — the
  // integer sums are far below 2^53 at any tested SF (and the 100 TB
  // variant would swap the same sums to DECIMAL(38,0) unchanged).
  // Scale shape: day-grain aggregate + one window lead + one
  // per-priority hash agg — never a self-join.
  private def qAutocorr(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("x"))
    val byDay = Window.partitionBy("priority").orderBy("day")
    daily
      .withColumn("y", lead(col("x"), 1).over(byDay))
      .filter(col("y").isNotNull)
      .groupBy("priority")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("r", expr(
        """(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"""))
      .select("priority", "n", "sx", "sy", "sxy", "sxx", "syy", "r")
      .orderBy("priority")
  }

  // ---- q_vocab_growth: Heaps-law vocabulary curve ------------------
  //
  // Cumulative vocabulary size vs cumulative token count over corpus
  // PREFIXES (deciles of the doc_id order) — the curve that answers
  // "does more of this source still add new types, or is the
  // vocabulary saturated?" (Heaps' law V ≈ K·nᵝ; a flattening curve
  // means diminishing lexical return). Each term is attributed to the
  // decile of its FIRST occurrence (min doc rank over the corpus
  // order), each doc's token count to its own decile, and both roll
  // up through a 10-row running sum — all counts exact BIGINTs, the
  // doubles are two final per-row ln() calls. Scale shape: one token
  // explode → term-keyed min-agg (linear in corpus tokens), one
  // doc-grain agg, and a 10-row window. The doc rank comes from the
  // two-level ScaleRank technique (doc_id-bucketed parallel local
  // ranks + collected bucket offsets) — NO corpus-sized
  // single-partition sort; the only unpartitioned window left is the
  // 10-row decile running sum (aggregate-grain by construction).
  private def qVocabGrowth(s: SparkSession, d: String): DataFrame = {
    val ranked = ScaleRank.withGlobalRank(
      Tables.documents(s, d).select(col("doc_id"), col("text")),
      col("doc_id"), Seq(col("doc_id")), "rn", "n")
      .withColumn("decile", expr("(rn * 10 + n - 1) DIV n"))
    val docTok = ranked
      .withColumn("n_toks", size(tokens()).cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    val firstSeen = ranked
      .select(col("rn"), col("n"), explode(tokens()).as("term"))
      .groupBy("term").agg(min(col("rn")).as("first_rn"), max(col("n")).as("n"))
      .withColumn("decile", expr("(first_rn * 10 + n - 1) DIV n"))
      .groupBy("decile").agg(count(lit(1)).as("new_terms"))
    val byDecile = Window.orderBy(col("decile"))
    docTok.join(firstSeen, Seq("decile"), "left_outer")
      .withColumn("new_terms", coalesce(col("new_terms"), lit(0L)))
      .withColumn("cum_docs", sum(col("n_docs")).over(byDecile))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(byDecile))
      .withColumn("cum_vocab", sum(col("new_terms")).over(byDecile))
      .withColumn("heaps_beta", expr(
        "ln(CAST(cum_vocab AS DOUBLE)) / ln(CAST(cum_tokens AS DOUBLE))"))
      .select("decile", "n_docs", "new_terms", "cum_docs", "cum_tokens",
        "cum_vocab", "heaps_beta")
      .orderBy("decile")
  }

  // ---- q_rfm: recency / frequency / monetary segmentation ---------
  //
  // The classic customer-value rollup: per customer, days since last
  // order (vs the corpus max day, so the query is self-contained and
  // deterministic), order count, and DECIMAL-exact spend, each scored
  // into quintiles (5 = best) over a deterministic total order
  // (metric, then custkey), then a fixed CASE segment label. The
  // quintiles keep EXACT ntile(5) semantics but come from the
  // two-level ScaleRank technique — one bucket-partitioned rank per
  // dimension over the once-checkpointed customer frame (descending
  // metrics bucket on the negated value) — so the plan has NO
  // single-partition window even when the customer grain is itself
  // corpus-shaped at 100 TB. Scale shape: one custkey aggregate over
  // the fact table, then three parallel window passes at customer
  // grain.
  private val RfmSegmentCase =
    """CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
      |     WHEN r_score >= 4 AND f_score <= 2 THEN 'recent'
      |     WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
      |     WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
      |     ELSE 'regular' END""".stripMargin

  private def qRfm(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(
        max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("n_orders"),
        expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)))").as("spend_dec"))
    val ref = Tables.orders(s, d)
      .agg(max(to_date(col("o_orderdate"))).as("ref_day"))
    val base = cust.crossJoin(broadcast(ref))
      .withColumn("recency_days",
        datediff(col("ref_day"), col("last_day")).cast("long"))
      .localCheckpoint() // rank passes + their model scans share one materialization
    ScaleRank.withGlobalRanks(base, Seq(
      (col("recency_days"), Seq(col("recency_days"), col("custkey")), "__rk_r"),
      (-col("n_orders"), Seq(col("n_orders").desc, col("custkey")), "__rk_f"),
      (-col("spend_dec"), Seq(col("spend_dec").desc, col("custkey")), "__rk_m")),
      "__n")
      .withColumn("r_score",
        (lit(6) - ScaleRank.ntileExpr(5, "__rk_r", "__n")).cast("long"))
      .withColumn("f_score",
        (lit(6) - ScaleRank.ntileExpr(5, "__rk_f", "__n")).cast("long"))
      .withColumn("m_score",
        (lit(6) - ScaleRank.ntileExpr(5, "__rk_m", "__n")).cast("long"))
      .drop("__rk_r", "__rk_f", "__rk_m", "__n")
      .withColumn("segment", expr(RfmSegmentCase))
      .select(col("custkey"), col("recency_days"), col("n_orders"),
        col("spend_dec").cast("double").as("spend"),
        col("r_score"), col("f_score"), col("m_score"), col("segment"))
      .orderBy("custkey")
  }

  // ---- q_ab_lift: two-proportion experiment readout ----------------
  //
  // The A/B evaluation a data pipeline runs on its own event stream:
  // users deterministically hash-split into two arms (first md5 hex
  // char < '8' — the same reproducible-randomness device as the
  // Sampling module, identical text in both engines), per-user
  // conversion = "ever made a ≥200-value purchase" (the threshold
  // keeps the rate off 0 and 1 at every fixture SF — a saturated
  // pool has zero variance and the z-ratio correctly fails loud
  // under ANSI), then the pooled two-proportion z-statistic. Every
  // count is an exact BIGINT from one user-keyed
  // aggregate; the rates, lift, and z are single IEEE expressions over
  // those integers (no double ever summed). Scale shape: one
  // user-keyed hash aggregate (map-side combined) collapsing straight
  // to a 1-row frame — nothing else shuffles at any corpus size.
  private def qAbLift(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") >= 200.0, 1L)
        .otherwise(0L)).as("conv"))
      .withColumn("in_a",
        when(substring(md5(col("user_id").cast("string")), 1, 1) < "8", 1L).otherwise(0L))
      .agg(
        sum(col("in_a")).as("n_a"),
        sum(lit(1L) - col("in_a")).as("n_b"),
        sum(col("in_a") * col("conv")).as("conv_a"),
        sum((lit(1L) - col("in_a")) * col("conv")).as("conv_b"))
      .withColumn("rate_a", col("conv_a").cast("double") / col("n_a").cast("double"))
      .withColumn("rate_b", col("conv_b").cast("double") / col("n_b").cast("double"))
      .withColumn("lift", col("rate_b") - col("rate_a"))
      .withColumn("p_pool",
        (col("conv_a") + col("conv_b")).cast("double")
          / (col("n_a") + col("n_b")).cast("double"))
      .withColumn("z_stat",
        col("lift") / sqrt(col("p_pool") * (lit(1.0) - col("p_pool"))
          * (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double"))))
      .select("n_a", "n_b", "conv_a", "conv_b", "rate_a", "rate_b",
        "lift", "p_pool", "z_stat")

  // ---- q_ks_test: two-sample Kolmogorov–Smirnov drift, per pair ----
  //
  // The distribution-drift check between every pair of sources over
  // doc length: D = max_v |F_a(v) − F_b(v)|. INTEGER-EXACT: the
  // deviation is maximized as |c_a·n_b − c_b·n_a| (cross-multiplied
  // cumulative counts — BIGINTs, no division until the final 1-row-
  // per-pair readout), evaluated at every distinct value AFTER ties
  // are absorbed (one row per (pair, value)), which is exactly where
  // the empirical CDFs can differ. at_value is the smallest value
  // attaining the max, so the row is fully determined. Scale shape:
  // one (source, value) aggregate, a broadcast nested-loop against
  // the ≤|S|² pair frame (model-sized), one pair-keyed window — the
  // corpus is touched once.
  private def qKsTest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val srcs = docs.select(col("source")).distinct()
    val pairs = srcs.select(col("source").as("source_a"))
      .crossJoin(srcs.select(col("source").as("source_b")))
      .filter(col("source_a") < col("source_b"))
    val perVal = docs.groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("cnt"))
    val byPair = perVal.join(broadcast(pairs),
        col("source") === col("source_a") || col("source") === col("source_b"))
      .groupBy("source_a", "source_b", "n_chars")
      .agg(
        sum(when(col("source") === col("source_a"), col("cnt")).otherwise(0L)).as("d1"),
        sum(when(col("source") === col("source_b"), col("cnt")).otherwise(0L)).as("d2"))
    val w = Window.partitionBy("source_a", "source_b").orderBy("n_chars")
    val cum = byPair
      .withColumn("c1", sum(col("d1")).over(w))
      .withColumn("c2", sum(col("d2")).over(w))
    val tot = cum.groupBy(col("source_a").as("t_a"), col("source_b").as("t_b"))
      .agg(max(col("c1")).as("n_a"), max(col("c2")).as("n_b"))
    cum.join(broadcast(tot),
        col("source_a") === col("t_a") && col("source_b") === col("t_b"))
      .withColumn("dev", abs(col("c1") * col("n_b") - col("c2") * col("n_a")))
      .withColumn("dmax",
        max(col("dev")).over(Window.partitionBy("source_a", "source_b")))
      .filter(col("dev") === col("dmax"))
      .groupBy("source_a", "source_b", "n_a", "n_b", "dmax")
      .agg(min(col("n_chars")).cast("long").as("at_value"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("dmax").as("d_num"), col("at_value"),
        (col("dmax").cast("double")
          / (col("n_a") * col("n_b")).cast("double")).as("d_stat"))
      .orderBy("source_a", "source_b")
  }

  // ---- q_mann_whitney: two-sample rank-sum test --------------------
  //
  // Mann–Whitney U between the returned ('R') and accepted ('A')
  // populations of l_extendedprice — the distribution-free "did this
  // segment shift" test an eval pipeline runs where a t-test's
  // normality assumption won't hold. Everything is integer-exact up
  // to the final z: U_A is computed value-grain as
  // 2·U = Σ_v ca(v)·(2·prefix_cb(v) + cb(v)) (ties get the ½ credit
  // via the ×2 trick, so 2U stays a BIGINT), the tie-correction term
  // Σ(t³−t) is exact per-value BIGINT arithmetic summed through
  // DECIMAL(38,0), and z is ONE fixed-shape IEEE composite over those
  // exact casts — bit-identical cross-engine. Scale shape: one
  // value-grain hash aggregate over the fact table, then the
  // TWO-LEVEL prefix sum (ScaleRank.withPrefixSum: deterministic
  // value buckets, bucket-partitioned running sums, collected
  // bucket-grain offsets) — the value-grain frame is itself
  // corpus-shaped at 100 TB and never single-partitions. Per-term
  // BIGINT products fault loudly under ANSI if a single value ever
  // carries >~2×10⁶ rows per arm (t³ ceiling) instead of drifting.
  private def qMannWhitney(s: SparkSession, d: String): DataFrame = {
    val vals = Tables.lineitem(s, d)
      .filter(col("l_returnflag").isin("R", "A"))
      .groupBy(col("l_extendedprice").as("p"))
      .agg(
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("ca"),
        sum(when(col("l_returnflag") === "A", 1L).otherwise(0L)).as("cb"))
    ScaleRank.withPrefixSum(vals, col("p"), Seq(col("p")), col("cb"), "pb")
      .agg(
        sum(col("ca")).as("n_a"),
        sum(col("cb")).as("n_b"),
        expr("CAST(SUM(CAST(ca * (2*pb + cb) AS DECIMAL(38,0))) AS BIGINT)")
          .as("two_u_a"),
        expr("""CAST(SUM(CAST((ca+cb)*(ca+cb)*(ca+cb) - (ca+cb)
                 AS DECIMAL(38,0))) AS BIGINT)""").as("tie_term"))
      .withColumn("z", expr(
        """(CAST(two_u_a AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
           / sqrt((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 3.0)
                  * (CAST(n_a + n_b + 1 AS DOUBLE)
                     - CAST(tie_term AS DOUBLE)
                       / (CAST(n_a + n_b AS DOUBLE)
                          * CAST(n_a + n_b - 1 AS DOUBLE))))"""))
      .select("n_a", "n_b", "two_u_a", "tie_term", "z")
  }

  // ---- q_weekday_mix: χ² uniformity of order volume by weekday ------
  //
  // Order volume per weekday plus Pearson's χ² against the uniform
  // null — the seasonality sanity check behind capacity planning.
  // Weekday is epoch-day mod 7 (locale-free, identical in both
  // engines — Spark dayofweek() and DuckDB dayofweek() disagree on
  // the week origin, so neither is used). χ² against uniform clears
  // to (7·Σoᵢ² − n²)/n — ONE IEEE division — and the 95 % rejection
  // (critical value 12.592 at 6 dof) is decided in exact integer
  // arithmetic: 1000·(7·Σoᵢ² − n²) > 12592·n. The squared terms are
  // routed through DECIMAL(38,0) (Spark) / HUGEINT (oracle) so the
  // n² and Σoᵢ² products stay exact past the ~3×10⁹-order BIGINT
  // square ceiling instead of faulting at corpus scale.
  private def qWeekdayMix(s: SparkSession, d: String): DataFrame = {
    val byDay = Tables.orders(s, d)
      .groupBy((datediff(col("o_orderdate"), lit("1970-01-01")) % 7).cast("long")
        .as("weekday"))
      .agg(count(lit(1)).as("n_orders"))
    val tot = byDay.agg(sum(col("n_orders")).as("n"),
      expr("SUM(CAST(n_orders AS DECIMAL(19,0)) * CAST(n_orders AS DECIMAL(19,0)))")
        .as("sq"))
    byDay.crossJoin(broadcast(tot))
      .withColumn("share", col("n_orders").cast("double") / col("n").cast("double"))
      .withColumn("__num", expr(
        "7 * sq - CAST(n AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0))"))
      .withColumn("chi2", col("__num").cast("double") / col("n").cast("double"))
      .withColumn("reject_uniform",
        expr("1000 * __num > 12592 * CAST(n AS DECIMAL(19,0))"))
      .select("weekday", "n_orders", "share", "chi2", "reject_uniform")
      .orderBy("weekday")
  }

  // ---- q_burstiness: index of dispersion per event type --------------
  //
  // Fano factor / index of dispersion D = s²/ȳ of the daily event
  // counts per type — the "is this traffic Poisson or bursty"
  // readout (D > 1 ⇔ over-dispersed) that decides whether a rate
  // alert needs a burst-tolerant threshold. Two hash aggregates
  // (event grain → day grain → type grain); D is ONE IEEE division of
  // the exact cross-terms n·Σy²−S² and (n−1)·S, and the bursty flag
  // is decided by the same exact-integer comparison, so the boundary
  // never hinges on a float. The squares route through DECIMAL(38,0)
  // (Spark) / HUGEINT (oracle) so S² stays exact past the ~3×10⁹
  // BIGINT square ceiling; only the reported syy COLUMN narrows back
  // to BIGINT (per-day counts — faults loudly under ANSI if a single
  // type ever logs >3×10⁹ events/day).
  private def qBurstiness(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) DIV 86400000000").as("day_idx"))
      .agg(count(lit(1)).as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum(col("y")).as("total"),
        expr("SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))")
          .as("__syy"))
      .withColumn("syy", col("__syy").cast("long"))
      .withColumn("mean", col("total").cast("double") / col("n_days").cast("double"))
      .withColumn("__num", expr(
        """CAST(n_days AS DECIMAL(19,0)) * __syy
           - CAST(total AS DECIMAL(19,0)) * CAST(total AS DECIMAL(19,0))"""))
      .withColumn("dispersion", when(col("n_days") > 1L,
        col("__num").cast("double")
          / ((col("n_days") - 1L).cast("double") * col("total").cast("double"))))
      .withColumn("is_bursty",
        expr("__num > CAST(n_days - 1 AS DECIMAL(19,0)) * CAST(total AS DECIMAL(19,0))"))
      .select("event_type", "n_days", "total", "syy", "mean", "dispersion",
        "is_bursty")
      .orderBy("event_type")
  }

  // ---- q_k_anonymity: privacy audit over quasi-identifiers ----------
  //
  // The k-anonymity / l-diversity readout a training-data pipeline
  // runs before releasing user-derived records: bucket every customer
  // into its quasi-identifier cell (nation × $2000 account-balance
  // band), then report per nation how many cells violate k=5 (any
  // record in such a cell is re-identifiable to ≤4 candidates), how
  // many rows a suppress-small-cells policy would drop, and how many
  // cells have NO diversity in the sensitive attribute (market
  // segment — an l=1 cell leaks the segment of everyone in it even
  // when k holds). Shape: two hash aggregates (record grain → cell
  // grain → nation grain), no joins, no windows — embarrassingly
  // parallel at any corpus size. The balance band floors an exact
  // DECIMAL(12,2)/100 quotient, so the bucket boundary can never
  // hinge on a float representation; suppression_rate is ONE IEEE
  // division of exact BIGINTs.
  private val AnonK = 5L
  private def qKAnonymity(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.customer(s, d)
      .select(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        expr("CAST(FLOOR(CAST(c_acctbal AS DECIMAL(12,2)) / 2000) AS BIGINT)")
          .as("bal_bucket"))
      .groupBy("nation", "bal_bucket")
      .agg(count(lit(1)).as("n"), countDistinct(col("segment")).as("l"))
    cells.groupBy("nation")
      .agg(count(lit(1)).as("n_cells"), sum(col("n")).as("n_rows"),
        min(col("n")).as("min_cell"),
        sum(when(col("n") < AnonK, 1L).otherwise(0L)).as("k_violations"),
        sum(when(col("n") < AnonK, col("n")).otherwise(0L)).as("suppressed_rows"),
        sum(when(col("l") === 1L, 1L).otherwise(0L)).as("l1_cells"))
      .withColumn("suppression_rate",
        col("suppressed_rows").cast("double") / col("n_rows").cast("double"))
      .orderBy("nation")
  }

  // ---- q_dp_release: ε-DP noisy count release (Laplace mechanism) ---
  //
  // The differential-privacy release step a pipeline runs AFTER the
  // k-anonymity audit: per-nation customer counts (sensitivity 1 —
  // one customer moves one cell by one) released with Laplace(1/ε)
  // noise at ε=0.5, via the inverse-CDF branch form
  // noise = (1/ε)·ln(2u) for u<½, −(1/ε)·ln(2(1−u)) otherwise. The
  // noise SOURCE is the deterministic md5-uniform device from
  // q_sample_weighted (u = (int(md5₈)+0.5)/2³² — strictly inside
  // (0,1), never exactly ½ since the numerator is a half-integer), so
  // the whole mechanism — sensitivity, scale, budget column — is
  // testable bit-for-bit cross-engine; a production deployment swaps
  // in a real entropy source and keeps every other line. Shape: one
  // hash aggregate + per-row IEEE math — embarrassingly parallel.
  //
  // NON-PRIVATE BY CONSTRUCTION — the column names say so: the
  // deterministic u is a publicly computable function of the group
  // key, so released_test = true_n + f(nation) is exactly invertible
  // and provides ZERO differential privacy. `epsilon_nominal` is the
  // budget the mechanism WOULD spend with a real entropy source;
  // `released_test` is the deterministic test-harness release. The
  // names exist so the output schema cannot be mistaken for a private
  // release and wired into production as-is.
  private val DpEps = 0.5
  private def qDpRelease(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d)
      .groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(count(lit(1)).as("true_n"))
      .withColumn("u",
        (expr("CAST(conv(substring(md5(CAST(nation AS STRING)), 1, 8), 16, 10) AS BIGINT)")
          .cast("double") + lit(0.5)) / lit(4294967296.0))
      .withColumn("epsilon_nominal", lit(DpEps))
      // ln is a libm call — Spark (Math.log) and DuckDB (C libm) can
      // differ in the last ulp, so the noise is pinned to
      // DECIMAL(18,9) (the BM25 per-term device) before exposure;
      // released is then ONE IEEE add of two identical doubles
      .withColumn("noise", expr(
        s"""CAST(CAST(
              CASE WHEN u < 0.5 THEN (1.0 / $DpEps) * ln(2.0 * u)
                   ELSE -(1.0 / $DpEps) * ln(2.0 * (1.0 - u)) END
            AS DECIMAL(18,9)) AS DOUBLE)"""))
      .withColumn("released_test", col("true_n").cast("double") + col("noise"))
      .select("nation", "true_n", "epsilon_nominal", "u", "noise", "released_test")
      .orderBy("nation")
  }

  // ---- q_trend: grouped OLS regression over monthly volumes ---------
  //
  // Per-priority least-squares trend line of monthly order volume —
  // the "is this segment growing" readout every reporting layer fits.
  // The corpus-shaped work is ONE hash aggregate to (priority, month)
  // grain plus one 6-sum rollup to priority grain; the closed-form
  // slope/intercept/r² then run on a model-sized frame. Exactness: x
  // is months since the GLOBAL min month (small ints), so n, Σx, Σy,
  // Σxy, Σx², Σy² are all exact BIGINTs; slope and intercept are each
  // ONE IEEE division of two exact casts, and r² is the fixed shape
  // (num·num)/(denx·deny) over casts that stay ≤2⁵³ while per-month
  // segment volume stays under ~10⁸ rows (ANSI faults loudly past the
  // BIGINT product ceiling rather than drifting).
  private def qTrend(s: SparkSession, d: String): DataFrame = {
    val monthly = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("priority"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("m"))
      .agg(count(lit(1)).as("y"))
    val lo = broadcast(monthly.agg(min(col("m")).as("m0")))
    monthly.crossJoin(lo)
      .withColumn("x", (col("m") - col("m0")).cast("long"))
      .groupBy("priority")
      .agg(count(lit(1)).as("n_months"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
      .withColumn("num", col("n_months") * col("sxy") - col("sx") * col("sy"))
      .withColumn("denx", col("n_months") * col("sxx") - col("sx") * col("sx"))
      .withColumn("deny", col("n_months") * col("syy") - col("sy") * col("sy"))
      .withColumn("slope", when(col("denx") =!= 0L,
        col("num").cast("double") / col("denx").cast("double")))
      .withColumn("intercept", when(col("denx") =!= 0L,
        (col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double")
          / col("denx").cast("double")))
      .withColumn("r2", when(col("denx") =!= 0L && col("deny") =!= 0L,
        (col("num").cast("double") * col("num").cast("double"))
          / (col("denx").cast("double") * col("deny").cast("double"))))
      .select("priority", "n_months", "sy", "slope", "intercept", "r2")
      .orderBy("priority")
  }

  // ---- q_changepoint: binary-segmentation mean shift -----------------
  //
  // The single change point that maximizes the between-segment
  // sum-of-squares reduction over the daily order-count series — the
  // first split of binary segmentation (the batch twin of q_cusum's
  // peak election, but scored by variance reduction rather than
  // cumulative deviation). Shape: one day-grain hash aggregate over
  // orders, then prefix sums over the DAY-GRAIN frame (a global window
  // ABOVE an Aggregate — calendar-sized, never corpus-sized), then a
  // deterministic top-1. Exactness: counts and prefix sums are
  // BIGINTs; the score for split i is num²/(i·(n−i)·n) with
  // num = S_i·n − S·i, computed as the fixed IEEE shape
  // (numD·numD)/(denD·nD) from casts ≤2⁵³ — bit-identical in both
  // engines, so the argmax (score DESC, day ASC) elects the same day.
  private def qChangepoint(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("day_idx"))
      .agg(count(lit(1)).as("y"))
    val w = Window.orderBy("day_idx")
    val tot = broadcast(daily.agg(count(lit(1)).as("n"), sum(col("y")).as("s")))
    daily.crossJoin(tot)
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("s_l", sum(col("y")).over(w))
      .filter(col("i") < col("n"))
      .withColumn("num", col("s_l") * col("n") - col("s") * col("i"))
      .withColumn("score",
        (col("num").cast("double") * col("num").cast("double"))
          / ((col("i") * (col("n") - col("i"))).cast("double")
             * col("n").cast("double")))
      .withColumn("mean_l", col("s_l").cast("double") / col("i").cast("double"))
      .withColumn("mean_r", (col("s") - col("s_l")).cast("double")
        / (col("n") - col("i")).cast("double"))
      .orderBy(col("score").desc, col("day_idx"))
      .limit(1)
      .select(col("day_idx").as("split_day"), col("i").as("n_left"),
        (col("n") - col("i")).as("n_right"), col("s_l").as("sum_left"),
        (col("s") - col("s_l")).as("sum_right"), col("mean_l"), col("mean_r"),
        col("score"))
  }

  // ---- q_gini: length-share inequality per source --------------------
  //
  // The Lorenz/Gini concentration of characters over documents within
  // each source — the "does a handful of docs carry the corpus"
  // curation readout. Exact rank formula G = (2·Σi·xᵢ − (n+1)·Σx) /
  // (n·Σx) over the (x, doc_id)-sorted ranks: every sum is a BIGINT,
  // the single division is the output. Scale shape: one per-source
  // window sort (range-partitionable by the group key) + one
  // aggregate.
  private def qGini(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars").cast("long").as("x"))
    val w = Window.partitionBy("source").orderBy(col("x"), col("doc_id"))
    docs.withColumn("i", row_number().over(w).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sum_chars"),
        sum(col("i") * col("x")).as("six"))
      .select(col("source"), col("n"), col("sum_chars"),
        ((lit(2L) * col("six") - (col("n") + lit(1L)) * col("sum_chars")).cast("double")
          / (col("n") * col("sum_chars")).cast("double")).as("gini"))
      .orderBy("source")
  }

  // ---- q_moments: binned skewness / kurtosis per priority ------------
  //
  // Distribution-shape diagnostics from raw power sums over a fixed
  // $1000 price quantization (the q_auc integer-over-histograms
  // discipline): k is exact cents arithmetic rounded half-up, the
  // four power sums are exact BIGINTs (k ≤ ~600 keeps k⁴·n ≪ 2⁶³;
  // ANSI faults the overflow loudly if a corpus ever breaks that),
  // and mean/var/skew/kurtosis are fixed-shape IEEE expressions over
  // those integers — identical text both engines, nothing summed in
  // floating point. Scale shape: one partial+final hash aggregate.
  private def qMoments(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("k", expr(
        "(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) + 50000) DIV 100000"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("s1"),
        sum(col("k") * col("k")).as("s2"),
        sum(col("k") * col("k") * col("k")).as("s3"),
        sum(col("k") * col("k") * col("k") * col("k")).as("s4"))
      .withColumn("mean_k", col("s1").cast("double") / col("n").cast("double"))
      .withColumn("var_k",
        col("s2").cast("double") / col("n").cast("double")
          - col("mean_k") * col("mean_k"))
      .withColumn("skew",
        (col("s3").cast("double") / col("n").cast("double")
          - lit(3.0) * col("mean_k") * (col("s2").cast("double") / col("n").cast("double"))
          + lit(2.0) * col("mean_k") * col("mean_k") * col("mean_k"))
          / (col("var_k") * sqrt(col("var_k"))))
      .withColumn("kurt",
        (col("s4").cast("double") / col("n").cast("double")
          - lit(4.0) * col("mean_k") * (col("s3").cast("double") / col("n").cast("double"))
          + lit(6.0) * col("mean_k") * col("mean_k") * (col("s2").cast("double") / col("n").cast("double"))
          - lit(3.0) * col("mean_k") * col("mean_k") * col("mean_k") * col("mean_k"))
          / (col("var_k") * col("var_k")))
      .select("o_orderpriority", "n", "s1", "s2", "mean_k", "var_k", "skew", "kurt")
      .orderBy("o_orderpriority")

  // ---- q_hill_tail: heavy-tail index per source ----------------------
  //
  // Hill's estimator α̂ = k / Σ ln(x_i/x_ref) over the top-k order
  // statistics of doc length — the "is this source's length
  // distribution power-law-tailed" curation diagnostic (a small α̂
  // flags sources whose few giant docs would dominate token budgets).
  // k derives from the slice size (max(min(n DIV 4, 100), 5)), x_ref
  // is the (k+1)-th order statistic, each ln term is a
  // DECIMAL(18,9)-pinned double of an exact-integer ratio (the q_zipf
  // discipline), and a CASE guards the all-ties degenerate slice with
  // NULL on both engines. A source with fewer than kk+1 (≥ 6) docs has
  // no (k+1)-th order statistic: it still appears in the output — all
  // metric columns NULL — via a left join from the distinct source
  // list, so a small source reads as "too small to judge" rather than
  // silently vanishing from the diagnostic. Scale shape: one
  // source-partitioned window rank (range-partitionable) + a
  // broadcast of the ≤|S| reference rows + one model-sized aggregate.
  private def qHillTail(s: SparkSession, d: String): DataFrame = {
    val bySrc = Window.partitionBy("source")
    val ranked = Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars").cast("long").as("x"))
      .withColumn("rn", row_number().over(
        bySrc.orderBy(col("x").desc, col("doc_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(bySrc))
      .withColumn("kk", expr("greatest(least(n DIV 4, 100L), 5L)"))
    val ref = ranked.filter(col("rn") === col("kk") + lit(1L))
      .select(col("source").as("r_src"), col("x").as("x_ref"))
    val agg = ranked.filter(col("rn") <= col("kk"))
      .join(broadcast(ref), col("source") === col("r_src"))
      .withColumn("term", expr(
        "CAST(ln(CAST(x AS DOUBLE) / CAST(x_ref AS DOUBLE)) AS DECIMAL(18,9))"))
      .groupBy(col("source"), col("x_ref"))
      .agg(count(lit(1)).as("k"), expr("CAST(SUM(term) AS DOUBLE)").as("lsum"))
      .withColumn("hill_alpha", when(col("lsum") > 0.0,
        col("k").cast("double") / col("lsum")))
    Tables.documents(s, d).select("source").distinct()
      .join(agg, Seq("source"), "left_outer")
      .select("source", "k", "x_ref", "lsum", "hill_alpha")
      .orderBy("source")
  }

  // ---- q_spearman: rank correlation frequency vs spend -------------
  //
  // Spearman's ρ between "how often a customer orders" and "how much
  // they spend" — the monotone-association check that Pearson-on-
  // values misses under heavy tails. Both rankings are TIE-FREE total
  // orders ((metric, custkey) — the q_deciles discipline), so the
  // permutation form ρ = 1 − 6·Σd²/(n·(n²−1)) is EXACT: Σd² is a
  // BIGINT and ρ one IEEE expression (denominator assembled in DOUBLE
  // so n³ can't overflow the integer envelope at corpus scale).
  // Scale shape: one o_custkey hash agg, then BOTH global ranks via
  // the two-level ScaleRank primitive — the per-customer frame grows
  // linearly with the corpus (q_rfm grain), so a single-partition
  // window sort here would put every customer on one executor at
  // 100 TB; ScaleRank ranks in bucket-partitioned parallel windows
  // with only bucket-grain (≤256-row) model state collected.
  private def qSpearman(s: SparkSession, d: String): DataFrame = {
    // pin the per-customer frame: ScaleRank's model passes (combined
    // min/max agg + the exploded counts pass) plus the ranked output
    // plan each replay the upstream lineage — without the pin the
    // orders scan + hash agg recompute 3× (the q_bm25 multi-consumer
    // discipline)
    val per = Tables.orders(s, d).groupBy(col("o_custkey")).agg(
      count(lit(1)).as("n_orders"),
      sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
      .localCheckpoint()
    val ranked = ScaleRank.withGlobalRanks(per, Seq(
      (col("n_orders"), Seq(col("n_orders"), col("o_custkey")), "r_freq"),
      (col("spend"), Seq(col("spend"), col("o_custkey")), "r_spend")),
      "__n_total")
    ranked.agg(
        count(lit(1)).as("n"),
        sum((col("r_freq") - col("r_spend")) * (col("r_freq") - col("r_spend")))
          .as("sum_d2"))
      .withColumn("rho", expr(
        "1.0 - (6.0 * CAST(sum_d2 AS DOUBLE)) / " +
          "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0))"))
      .select("n", "sum_d2", "rho")
  }

  // ---- q_psi: population stability index across time halves --------
  //
  // The model-monitoring standard for "did the input distribution
  // move": split events at the midpoint of the observed time range,
  // take the event_type distribution on each side, and report
  // PSI = Σ (p_i − q_i)·ln(p_i/q_i) (≥ 0, 0 iff identical; the
  // industry rule of thumb flags > 0.2). Counts are exact BIGINTs;
  // each term is ONE IEEE expression over them (ln argument assembled
  // in DOUBLE so c·n products can't overflow at corpus scale) pinned
  // to DECIMAL(18,9) and summed exactly. Totals are over the types
  // present on BOTH sides (PSI is undefined at a zero bin; the spec
  // asserts nothing was excluded on this fixture). Scale shape: one
  // event_type hash agg with map-side partials + three broadcast
  // scalar joins — nothing beyond the agg ever shuffles.
  private def qPsi(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), expr("unix_micros(ts)").as("us"))
    val mid = ev.agg(expr("(MIN(us) + MAX(us)) DIV 2").as("mid"))
    // pin the ≤|types|-row count table: totals, terms, and the psi
    // aggregate all consume it, and each would otherwise re-scan the
    // events table (the multi-consumer lineage-replay trap)
    val counts = ev.crossJoin(broadcast(mid))
      .groupBy("event_type")
      .agg(sum(when(col("us") <= col("mid"), 1L).otherwise(0L)).as("c_ref"),
        sum(when(col("us") > col("mid"), 1L).otherwise(0L)).as("c_cur"))
      .filter(col("c_ref") > 0L && col("c_cur") > 0L)
      .localCheckpoint()
    val tot = counts.agg(sum(col("c_ref")).as("n_ref"), sum(col("c_cur")).as("n_cur"))
    val terms = counts.crossJoin(broadcast(tot))
      .withColumn("term", expr(
        "CAST((CAST(c_ref AS DOUBLE) / CAST(n_ref AS DOUBLE) - " +
          "CAST(c_cur AS DOUBLE) / CAST(n_cur AS DOUBLE)) * " +
          "ln((CAST(c_ref AS DOUBLE) * CAST(n_cur AS DOUBLE)) / " +
          "(CAST(c_cur AS DOUBLE) * CAST(n_ref AS DOUBLE))) AS DECIMAL(18,9))"))
    val psi = terms.agg(expr("CAST(SUM(term) AS DOUBLE)").as("psi"))
    terms.crossJoin(broadcast(psi))
      .select(col("event_type"), col("c_ref"), col("c_cur"),
        expr("CAST(term AS DOUBLE)").as("term"), col("psi"))
      .orderBy("event_type")
  }

  // ---- q_token_median: token-mass-weighted median length -----------
  //
  // "Half the TOKENS live in docs of at least L characters" — the
  // weighted median that drives packing and truncation decisions
  // (the unweighted doc median over-represents short docs that carry
  // almost no training mass). Per source: order docs by (n_chars,
  // doc_id), run an exact BIGINT cumulative token sum, and elect the
  // FIRST row where 2·cum ≥ total — a rank election over integers,
  // no interpolation, so both engines pick the same row. Scale
  // shape: one source-partitioned window sort (range-partitionable)
  // + a broadcast of the ≤|sources| totals.
  private def qTokenMedian(s: SparkSession, d: String): DataFrame = {
    val bySrc = Window.partitionBy("source")
    val ordered = bySrc.orderBy(col("n_chars"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars"),
        size(tokens()).cast("long").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("n_tok")).over(bySrc))
      .withColumn("n_docs", count(lit(1)).over(bySrc))
      .filter(col("cum") * 2 >= col("total"))
      .withColumn("rn", row_number().over(ordered))
      .filter(col("rn") === 1)
      .select(col("source"), col("n_docs"), col("total").as("total_tokens"),
        col("n_chars").as("weighted_median_len"), col("cum").as("cum_at_cross"))
      .orderBy("source")
  }

  // ---- q_allen: Allen interval-algebra census ----------------------
  //
  // Classifies the temporal relation between a customer's CONSECUTIVE
  // order-fulfilment intervals — A = [o_orderdate, last l_shipdate]
  // of one order vs B = the same for the customer's next order (next
  // by (orderdate, orderkey)) — into Allen's 13 interval relations
  // (Allen 1983, "Maintaining knowledge about temporal intervals"):
  // the full qualitative-temporal-reasoning surface that point
  // predicates (q_join_range's overlap test) collapse. The CASE
  // ladder is ordered so disjointness and the meets/equality
  // degeneracies are captured before the strict containment/overlap
  // splits; after the first four branches the interiors provably
  // intersect, so the remaining nine branches are exhaustive and
  // mutually exclusive — a totality argument both engines replay
  // identically on exact DATE comparisons. The span end is clamped to
  // greatest(orderdate, last shipdate) so every interval is well-
  // formed even where the synthetic generator ships before ordering;
  // with pairs then ordered by start date, a1 ≤ b1 ≤ b2 always:
  // 'after' and 'overlapped_by' are structurally impossible and their
  // absence from the census is itself an asserted invariant. One
  // order-grain agg + one lead() window + a priority×rel hash agg:
  // embarrassingly parallel.
  private def qAllen(s: SparkSession, d: String): DataFrame = {
    val spans = Tables.orders(s, d)
      .join(Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o_orderkey"), col("l_shipdate")),
        Seq("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_custkey"),
        col("o_orderpriority").as("priority"), col("o_orderdate").as("a1"))
      .agg(greatest(max(col("l_shipdate")), col("a1")).as("a2"))
    val byCust = Window.partitionBy("o_custkey")
      .orderBy(col("a1"), col("o_orderkey"))
    spans
      .withColumn("b1", lead(col("a1"), 1).over(byCust))
      .withColumn("b2", lead(col("a2"), 1).over(byCust))
      .filter(col("b1").isNotNull)
      .withColumn("rel", expr(
        """CASE WHEN a2 < b1 THEN 'before'
                WHEN b2 < a1 THEN 'after'
                WHEN a2 = b1 THEN 'meets'
                WHEN b2 = a1 THEN 'met_by'
                WHEN a1 = b1 AND a2 = b2 THEN 'equals'
                WHEN a1 = b1 AND a2 < b2 THEN 'starts'
                WHEN a1 = b1 THEN 'started_by'
                WHEN a2 = b2 AND a1 > b1 THEN 'finishes'
                WHEN a2 = b2 THEN 'finished_by'
                WHEN a1 > b1 AND a2 < b2 THEN 'during'
                WHEN a1 < b1 AND a2 > b2 THEN 'contains'
                WHEN a1 < b1 THEN 'overlaps'
                ELSE 'overlapped_by' END"""))
      .groupBy("priority", "rel").agg(count(lit(1)).as("n"))
      .withColumn("share", expr(
        """CAST(n AS DOUBLE)
           / CAST(SUM(n) OVER (PARTITION BY priority) AS DOUBLE)"""))
      .select("priority", "rel", "n", "share")
      .orderBy("priority", "rel")
  }

  // ---- q_sax: symbolic aggregate approximation of the order series --
  //
  // SAX (Lin/Keogh/Lonardi/Chiu 2003) over the weekly order-volume
  // series: PAA-aggregate days into 7-day windows FIRST (so the
  // piecewise means stay exact BIGINT sums over a dense week spine —
  // missing weeks count as 0), THEN z-normalize each weekly sum in
  // the algebraically cleared form z = (n·S_w − T) / sqrt(n·ΣS² − T²)
  // — numerator and radicand exact BIGINTs, so the whole z is one
  // IEEE division over one IEEE sqrt, bit-identical cross-engine —
  // and discretize against the literal 4-symbol Gaussian breakpoints
  // (±0.6745 ≈ the quartiles). Eight-week SAX words are the motif
  // alphabet downstream indexers bucket on. Scale shape: day-grain
  // agg → week-grain agg → one broadcast 3-number moment frame → a
  // 10²-row word roll-up; nothing super-linear anywhere.
  private def qSax(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000")
        .as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
    val bounds = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val weekly = daily.crossJoin(broadcast(bounds))
      .withColumn("w", expr("(day - lo) DIV 7"))
      .groupBy("w").agg(sum(col("n")).as("sw"))
    val series = bounds
      .select(explode(expr("sequence(0L, (hi - lo) DIV 7)")).as("w"))
      .join(weekly, Seq("w"), "left")
      .withColumn("sw", coalesce(col("sw"), lit(0L)))
      .localCheckpoint() // feeds both the moment frame and the z scan
    val stats = series.agg(count(lit(1)).as("nw"), sum(col("sw")).as("t"),
      sum(col("sw") * col("sw")).as("t2"))
    series.crossJoin(broadcast(stats))
      .withColumn("z", expr(
        "CAST(nw * sw - t AS DOUBLE) / sqrt(CAST(nw * t2 - t * t AS DOUBLE))"))
      .withColumn("sym", expr(
        """CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0.0 THEN 'b'
                WHEN z < 0.6745 THEN 'c' ELSE 'd' END"""))
      .withColumn("word_idx", expr("w DIV 8"))
      .groupBy("word_idx")
      .agg(count(lit(1)).as("n_weeks"),
        expr("array_join(transform(array_sort(collect_list(struct(w, sym))), x -> x.sym), '')")
          .as("word"),
        min(col("z")).as("z_min"), max(col("z")).as("z_max"))
      .orderBy("word_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_allen" -> (qAllen _),
    "q_sax" -> (qSax _),
    "q_ks_test" -> (qKsTest _),
    "q_mann_whitney" -> (qMannWhitney _),
    "q_trend" -> (qTrend _),
    "q_k_anonymity" -> (qKAnonymity _),
    "q_dp_release" -> (qDpRelease _),
    "q_burstiness" -> (qBurstiness _),
    "q_weekday_mix" -> (qWeekdayMix _),
    "q_changepoint" -> (qChangepoint _),
    "q_hill_tail" -> (qHillTail _),
    "q_spearman" -> (qSpearman _),
    "q_psi" -> (qPsi _),
    "q_token_median" -> (qTokenMedian _),
    "q_gini" -> (qGini _),
    "q_moments" -> (qMoments _),
    "q_rfm" -> (qRfm _),
    "q_ab_lift" -> (qAbLift _),
    "q_robust_stats" -> (qRobustStats _),
    "q_ewma" -> (qEwma _),
    "q_js_divergence" -> (qJsDivergence _),
    "q_oov" -> (qOov _),
    "q_leakage" -> (qLeakage _),
    "q_cusum" -> (qCusum _),
    "q_autocorr" -> (qAutocorr _),
    "q_mase" -> (qMase _),
    "q_benford" -> (qBenford _),
    "q_cohort_ltv" -> (qCohortLtv _),
    "q_vocab_growth" -> (qVocabGrowth _)
  )

  val oracle: Map[String, String] = Map(
    "q_weekday_mix" ->
      """WITH byday AS (
        |  SELECT CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') % 7 AS BIGINT) AS weekday,
        |         CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1
        |), tot AS (
        |  SELECT CAST(SUM(n_orders) AS BIGINT) AS n,
        |         SUM(CAST(n_orders AS HUGEINT) * CAST(n_orders AS HUGEINT)) AS sq
        |  FROM byday
        |)
        |SELECT weekday, n_orders,
        |       CAST(n_orders AS DOUBLE) / CAST(n AS DOUBLE) AS share,
        |       CAST(7 * sq - CAST(n AS HUGEINT) * CAST(n AS HUGEINT) AS DOUBLE)
        |         / CAST(n AS DOUBLE) AS chi2,
        |       1000 * (7 * sq - CAST(n AS HUGEINT) * CAST(n AS HUGEINT))
        |         > 12592 * CAST(n AS HUGEINT) AS reject_uniform
        |FROM byday CROSS JOIN tot ORDER BY weekday""".stripMargin,
    "q_burstiness" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx,
        |         CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2
        |), t AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |         CAST(SUM(y) AS BIGINT) AS total,
        |         SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy_h
        |  FROM daily GROUP BY 1
        |)
        |SELECT event_type, n_days, total, CAST(syy_h AS BIGINT) AS syy,
        |       CAST(total AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean,
        |       CASE WHEN n_days > 1 THEN
        |         CAST(n_days * syy_h - CAST(total AS HUGEINT) * CAST(total AS HUGEINT)
        |              AS DOUBLE)
        |           / (CAST(n_days - 1 AS DOUBLE) * CAST(total AS DOUBLE)) END
        |         AS dispersion,
        |       n_days * syy_h - CAST(total AS HUGEINT) * CAST(total AS HUGEINT)
        |         > (n_days - 1) * CAST(total AS HUGEINT) AS is_bursty
        |FROM t ORDER BY event_type""".stripMargin,
    "q_k_anonymity" ->
      """WITH cells AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |         CAST(FLOOR(CAST(c_acctbal AS DECIMAL(12,2)) / 2000) AS BIGINT) AS bal_bucket,
        |         CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l
        |  FROM customer GROUP BY 1, 2
        |)
        |SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_cells,
        |       CAST(SUM(n) AS BIGINT) AS n_rows, MIN(n) AS min_cell,
        |       CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS k_violations,
        |       CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS suppressed_rows,
        |       CAST(SUM(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT) AS l1_cells,
        |       CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS DOUBLE)
        |         / CAST(SUM(n) AS DOUBLE) AS suppression_rate
        |FROM cells GROUP BY nation ORDER BY nation""".stripMargin,
    "q_dp_release" ->
      """WITH c AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |         CAST(COUNT(*) AS BIGINT) AS true_n
        |  FROM customer GROUP BY 1
        |), withu AS (
        |  SELECT nation, true_n,
        |         (CAST(CAST('0x' || substring(md5(CAST(nation AS VARCHAR)), 1, 8)
        |                    AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0 AS u
        |  FROM c
        |), withn AS (
        |  SELECT nation, true_n, u,
        |         CAST(CAST(
        |           CASE WHEN u < 0.5 THEN (1.0 / 0.5) * ln(2.0 * u)
        |                ELSE -(1.0 / 0.5) * ln(2.0 * (1.0 - u)) END
        |         AS DECIMAL(18,9)) AS DOUBLE) AS noise
        |  FROM withu
        |)
        |SELECT nation, true_n, CAST(0.5 AS DOUBLE) AS epsilon_nominal, u, noise,
        |       CAST(true_n AS DOUBLE) + noise AS released_test
        |FROM withn ORDER BY nation""".stripMargin,
    "q_trend" ->
      """WITH monthly AS (
        |  SELECT o_orderpriority AS priority,
        |         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS m,
        |         CAST(COUNT(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1, 2
        |), lo AS (SELECT MIN(m) AS m0 FROM monthly
        |), sums AS (
        |  SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_months,
        |         CAST(SUM(m - m0) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |         CAST(SUM((m - m0) * y) AS BIGINT) AS sxy,
        |         CAST(SUM((m - m0) * (m - m0)) AS BIGINT) AS sxx,
        |         CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM monthly CROSS JOIN lo GROUP BY 1
        |), t AS (
        |  SELECT *, n_months * sxy - sx * sy AS num,
        |         n_months * sxx - sx * sx AS denx,
        |         n_months * syy - sy * sy AS deny
        |  FROM sums
        |)
        |SELECT priority, n_months, sy,
        |       CASE WHEN denx <> 0 THEN CAST(num AS DOUBLE) / CAST(denx AS DOUBLE) END AS slope,
        |       CASE WHEN denx <> 0 THEN CAST(sy * sxx - sx * sxy AS DOUBLE) / CAST(denx AS DOUBLE) END AS intercept,
        |       CASE WHEN denx <> 0 AND deny <> 0 THEN
        |         (CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
        |         / (CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)) END AS r2
        |FROM t ORDER BY priority""".stripMargin,
    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_idx,
        |         CAST(COUNT(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s FROM daily
        |), pre AS (
        |  SELECT day_idx, n, s,
        |         CAST(ROW_NUMBER() OVER (ORDER BY day_idx) AS BIGINT) AS i,
        |         CAST(SUM(y) OVER (ORDER BY day_idx
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s_l
        |  FROM daily CROSS JOIN tot
        |), scored AS (
        |  SELECT *, s_l * n - s * i AS num,
        |         (CAST(s_l * n - s * i AS DOUBLE) * CAST(s_l * n - s * i AS DOUBLE))
        |         / (CAST(i * (n - i) AS DOUBLE) * CAST(n AS DOUBLE)) AS score
        |  FROM pre WHERE i < n
        |)
        |SELECT day_idx AS split_day, i AS n_left, n - i AS n_right,
        |       s_l AS sum_left, s - s_l AS sum_right,
        |       CAST(s_l AS DOUBLE) / CAST(i AS DOUBLE) AS mean_l,
        |       CAST(s - s_l AS DOUBLE) / CAST(n - i AS DOUBLE) AS mean_r,
        |       score
        |FROM scored ORDER BY score DESC, day_idx LIMIT 1""".stripMargin,
    "q_mann_whitney" ->
      """WITH v AS (
        |  SELECT l_extendedprice AS p,
        |         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |         CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM lineitem WHERE l_returnflag IN ('R','A') GROUP BY 1
        |), w AS (
        |  SELECT p, ca, cb,
        |         CAST(COALESCE(SUM(cb) OVER (ORDER BY p
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pb
        |  FROM v
        |), agg AS (
        |  SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b,
        |         CAST(SUM(ca * (2*pb + cb)) AS BIGINT) AS two_u_a,
        |         CAST(SUM((ca+cb)*(ca+cb)*(ca+cb) - (ca+cb)) AS BIGINT) AS tie_term
        |  FROM w
        |)
        |SELECT n_a, n_b, two_u_a, tie_term,
        |       (CAST(two_u_a AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
        |       / sqrt((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 3.0)
        |              * (CAST(n_a + n_b + 1 AS DOUBLE)
        |                 - CAST(tie_term AS DOUBLE)
        |                   / (CAST(n_a + n_b AS DOUBLE)
        |                      * CAST(n_a + n_b - 1 AS DOUBLE)))) AS z
        |FROM agg""".stripMargin,
    "q_allen" ->
      """WITH spans AS (
        |  SELECT o.o_orderkey, o.o_custkey, o.o_orderpriority AS priority,
        |         o.o_orderdate AS a1, GREATEST(MAX(l.l_shipdate), o.o_orderdate) AS a2
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY o.o_orderkey, o.o_custkey, o.o_orderpriority, o.o_orderdate
        |), iv AS (
        |  SELECT priority, a1, a2,
        |         LEAD(a1) OVER (PARTITION BY o_custkey ORDER BY a1, o_orderkey) AS b1,
        |         LEAD(a2) OVER (PARTITION BY o_custkey ORDER BY a1, o_orderkey) AS b2
        |  FROM spans
        |), rel AS (
        |  SELECT priority,
        |         CASE WHEN a2 < b1 THEN 'before'
        |              WHEN b2 < a1 THEN 'after'
        |              WHEN a2 = b1 THEN 'meets'
        |              WHEN b2 = a1 THEN 'met_by'
        |              WHEN a1 = b1 AND a2 = b2 THEN 'equals'
        |              WHEN a1 = b1 AND a2 < b2 THEN 'starts'
        |              WHEN a1 = b1 THEN 'started_by'
        |              WHEN a2 = b2 AND a1 > b1 THEN 'finishes'
        |              WHEN a2 = b2 THEN 'finished_by'
        |              WHEN a1 > b1 AND a2 < b2 THEN 'during'
        |              WHEN a1 < b1 AND a2 > b2 THEN 'contains'
        |              WHEN a1 < b1 THEN 'overlaps'
        |              ELSE 'overlapped_by' END AS rel
        |  FROM iv WHERE b1 IS NOT NULL
        |), agg AS (
        |  SELECT priority, rel, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM rel GROUP BY priority, rel
        |)
        |SELECT priority, rel, n,
        |       CAST(n AS DOUBLE)
        |         / CAST(SUM(n) OVER (PARTITION BY priority) AS DOUBLE) AS share
        |FROM agg
        |ORDER BY priority, rel""".stripMargin,
    "q_sax" ->
      """WITH daily AS (
        |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1
        |), bounds AS (
        |  SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily
        |), weekly AS (
        |  SELECT (day - lo) // 7 AS w, CAST(SUM(n) AS BIGINT) AS sw
        |  FROM daily CROSS JOIN bounds GROUP BY 1
        |), series AS (
        |  SELECT r.w, COALESCE(weekly.sw, 0) AS sw
        |  FROM (SELECT unnest(range(0, (hi - lo) // 7 + 1)) AS w FROM bounds) r
        |  LEFT JOIN weekly ON weekly.w = r.w
        |), stats AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS nw, CAST(SUM(sw) AS BIGINT) AS t,
        |         CAST(SUM(sw * sw) AS BIGINT) AS t2
        |  FROM series
        |), z AS (
        |  SELECT w, (w // 8) AS word_idx,
        |         CAST(nw * sw - t AS DOUBLE)
        |           / sqrt(CAST(nw * t2 - t * t AS DOUBLE)) AS z
        |  FROM series CROSS JOIN stats
        |), sym AS (
        |  SELECT word_idx, w, z,
        |         CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0.0 THEN 'b'
        |              WHEN z < 0.6745 THEN 'c' ELSE 'd' END AS sym
        |  FROM z
        |)
        |SELECT word_idx, CAST(COUNT(*) AS BIGINT) AS n_weeks,
        |       string_agg(sym, '' ORDER BY w) AS word,
        |       MIN(z) AS z_min, MAX(z) AS z_max
        |FROM sym GROUP BY word_idx
        |ORDER BY word_idx""".stripMargin,
    "q_token_median" ->
      """WITH t AS (
        |  SELECT source, doc_id, n_chars,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents
        |), c AS (
        |  SELECT source, doc_id, n_chars, n_tok,
        |         CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY n_chars, doc_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |         CAST(SUM(n_tok) OVER (PARTITION BY source) AS BIGINT) AS total,
        |         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_docs
        |  FROM t
        |), f AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn
        |  FROM c WHERE cum * 2 >= total
        |)
        |SELECT source, n_docs, total AS total_tokens,
        |       n_chars AS weighted_median_len, cum AS cum_at_cross
        |FROM f WHERE rn = 1
        |ORDER BY source""".stripMargin,
    "q_spearman" ->
      """WITH per AS (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders GROUP BY o_custkey
        |), ranked AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_orders, o_custkey) AS BIGINT) AS r_freq,
        |         CAST(ROW_NUMBER() OVER (ORDER BY spend, o_custkey) AS BIGINT) AS r_spend
        |  FROM per
        |), agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM((r_freq - r_spend) * (r_freq - r_spend)) AS BIGINT) AS sum_d2
        |  FROM ranked
        |)
        |SELECT n, sum_d2,
        |       1.0 - (6.0 * CAST(sum_d2 AS DOUBLE)) /
        |         (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0)) AS rho
        |FROM agg""".stripMargin,
    "q_psi" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) AS us FROM events
        |), mid AS (
        |  SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM ev
        |), counts AS (
        |  SELECT event_type,
        |         CAST(SUM(CASE WHEN us <= mid THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
        |         CAST(SUM(CASE WHEN us > mid THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
        |  FROM ev, mid GROUP BY event_type
        |  HAVING c_ref > 0 AND c_cur > 0
        |), tot AS (
        |  SELECT CAST(SUM(c_ref) AS BIGINT) AS n_ref,
        |         CAST(SUM(c_cur) AS BIGINT) AS n_cur FROM counts
        |), terms AS (
        |  SELECT event_type, c_ref, c_cur,
        |         CAST((CAST(c_ref AS DOUBLE) / CAST(n_ref AS DOUBLE) -
        |               CAST(c_cur AS DOUBLE) / CAST(n_cur AS DOUBLE)) *
        |              ln((CAST(c_ref AS DOUBLE) * CAST(n_cur AS DOUBLE)) /
        |                 (CAST(c_cur AS DOUBLE) * CAST(n_ref AS DOUBLE)))
        |              AS DECIMAL(18,9)) AS term
        |  FROM counts, tot
        |), psi AS (
        |  SELECT CAST(SUM(term) AS DOUBLE) AS psi FROM terms
        |)
        |SELECT event_type, c_ref, c_cur, CAST(term AS DOUBLE) AS term, psi
        |FROM terms, psi
        |ORDER BY event_type""".stripMargin,
    "q_hill_tail" ->
      """WITH ranked AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS x,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY source
        |           ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rn,
        |         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM documents
        |), kd AS (
        |  SELECT source, x, rn, greatest(least(n // 4, 100), 5) AS kk
        |  FROM ranked
        |), ref AS (
        |  SELECT source AS r_src, x AS x_ref FROM kd WHERE rn = kk + 1
        |), agg AS (
        |  SELECT source, x_ref, CAST(COUNT(*) AS BIGINT) AS k,
        |         CAST(SUM(CAST(ln(CAST(x AS DOUBLE) / CAST(x_ref AS DOUBLE))
        |                        AS DECIMAL(18,9))) AS DOUBLE) AS lsum
        |  FROM kd JOIN ref ON source = r_src
        |  WHERE rn <= kk
        |  GROUP BY source, x_ref
        |), srcs AS (
        |  SELECT DISTINCT source FROM documents
        |)
        |SELECT srcs.source, k, x_ref, lsum,
        |       CASE WHEN lsum > 0.0
        |            THEN CAST(k AS DOUBLE) / lsum END AS hill_alpha
        |FROM srcs LEFT JOIN agg ON agg.source = srcs.source
        |ORDER BY srcs.source""".stripMargin,
    "q_ks_test" ->
      """WITH perval AS (
        |  SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY source, n_chars
        |), pairs AS (
        |  SELECT a.source AS source_a, b.source AS source_b
        |  FROM (SELECT DISTINCT source FROM documents) a,
        |       (SELECT DISTINCT source FROM documents) b
        |  WHERE a.source < b.source
        |), j AS (
        |  SELECT source_a, source_b, n_chars,
        |         CAST(SUM(CASE WHEN source = source_a THEN cnt ELSE 0 END) AS BIGINT) AS d1,
        |         CAST(SUM(CASE WHEN source = source_b THEN cnt ELSE 0 END) AS BIGINT) AS d2
        |  FROM perval JOIN pairs ON source = source_a OR source = source_b
        |  GROUP BY source_a, source_b, n_chars
        |), cum AS (
        |  SELECT source_a, source_b, n_chars,
        |         CAST(SUM(d1) OVER (PARTITION BY source_a, source_b ORDER BY n_chars) AS BIGINT) AS c1,
        |         CAST(SUM(d2) OVER (PARTITION BY source_a, source_b ORDER BY n_chars) AS BIGINT) AS c2
        |  FROM j
        |), tot AS (
        |  SELECT source_a AS t_a, source_b AS t_b,
        |         MAX(c1) AS n_a, MAX(c2) AS n_b
        |  FROM cum GROUP BY source_a, source_b
        |), dev AS (
        |  SELECT source_a, source_b, n_chars, n_a, n_b,
        |         abs(c1 * n_b - c2 * n_a) AS dev,
        |         MAX(abs(c1 * n_b - c2 * n_a))
        |           OVER (PARTITION BY source_a, source_b) AS dmax
        |  FROM cum JOIN tot ON source_a = t_a AND source_b = t_b
        |)
        |SELECT source_a, source_b, n_a, n_b,
        |       CAST(dmax AS BIGINT) AS d_num,
        |       CAST(MIN(n_chars) AS BIGINT) AS at_value,
        |       CAST(dmax AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS d_stat
        |FROM dev WHERE dev = dmax
        |GROUP BY source_a, source_b, n_a, n_b, dmax
        |ORDER BY source_a, source_b""".stripMargin,
    "q_gini" ->
      """WITH ranked AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS x,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY source
        |           ORDER BY n_chars, doc_id) AS BIGINT) AS i
        |  FROM documents
        |), agg AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(x) AS BIGINT) AS sum_chars,
        |         CAST(SUM(i * x) AS BIGINT) AS six
        |  FROM ranked GROUP BY source
        |)
        |SELECT source, n, sum_chars,
        |       CAST(2 * six - (n + 1) * sum_chars AS DOUBLE)
        |         / CAST(n * sum_chars AS DOUBLE) AS gini
        |FROM agg
        |ORDER BY source""".stripMargin,
    "q_moments" ->
      """WITH b AS (
        |  SELECT o_orderpriority,
        |         (CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) + 50000) // 100000 AS k
        |  FROM orders
        |), agg AS (
        |  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(k) AS BIGINT) AS s1, CAST(SUM(k*k) AS BIGINT) AS s2,
        |         CAST(SUM(k*k*k) AS BIGINT) AS s3, CAST(SUM(k*k*k*k) AS BIGINT) AS s4
        |  FROM b GROUP BY o_orderpriority
        |), m AS (
        |  SELECT *, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_k FROM agg
        |), v AS (
        |  SELECT *, CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - mean_k * mean_k AS var_k FROM m
        |)
        |SELECT o_orderpriority, n, s1, s2, mean_k, var_k,
        |       (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
        |          - 3.0 * mean_k * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
        |          + 2.0 * mean_k * mean_k * mean_k)
        |         / (var_k * sqrt(var_k)) AS skew,
        |       (CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
        |          - 4.0 * mean_k * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
        |          + 6.0 * mean_k * mean_k * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
        |          - 3.0 * mean_k * mean_k * mean_k * mean_k)
        |         / (var_k * var_k) AS kurt
        |FROM v
        |ORDER BY o_orderpriority""".stripMargin,
    "q_ab_lift" ->
      """WITH per_user AS (
        |  SELECT user_id,
        |         MAX(CASE WHEN event_type = 'purchase' AND value >= 200.0 THEN 1 ELSE 0 END) AS conv,
        |         CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |              THEN 1 ELSE 0 END AS in_a
        |  FROM events GROUP BY user_id
        |), cells AS (
        |  SELECT CAST(SUM(in_a) AS BIGINT) AS n_a,
        |         CAST(SUM(1 - in_a) AS BIGINT) AS n_b,
        |         CAST(SUM(in_a * conv) AS BIGINT) AS conv_a,
        |         CAST(SUM((1 - in_a) * conv) AS BIGINT) AS conv_b
        |  FROM per_user
        |), m AS (
        |  SELECT n_a, n_b, conv_a, conv_b,
        |         CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
        |         CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
        |         CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS p_pool
        |  FROM cells
        |)
        |SELECT n_a, n_b, conv_a, conv_b, rate_a, rate_b,
        |       rate_b - rate_a AS lift, p_pool,
        |       (rate_b - rate_a)
        |         / sqrt(p_pool * (1.0 - p_pool)
        |                * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) AS z_stat
        |FROM m""".stripMargin,
    "q_rfm" ->
      s"""WITH cust AS (
         |  SELECT o_custkey AS custkey,
         |         MAX(CAST(o_orderdate AS DATE)) AS last_day,
         |         COUNT(*) AS n_orders,
         |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_dec
         |  FROM orders GROUP BY o_custkey
         |), r AS (
         |  SELECT *,
         |         CAST(date_diff('day', last_day,
         |           (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)) AS BIGINT)
         |           AS recency_days
         |  FROM cust
         |), sc AS (
         |  SELECT custkey, recency_days, n_orders,
         |         CAST(spend_dec AS DOUBLE) AS spend,
         |         CAST(6 - ntile(5) OVER (ORDER BY recency_days, custkey) AS BIGINT) AS r_score,
         |         CAST(6 - ntile(5) OVER (ORDER BY n_orders DESC, custkey) AS BIGINT) AS f_score,
         |         CAST(6 - ntile(5) OVER (ORDER BY spend_dec DESC, custkey) AS BIGINT) AS m_score
         |  FROM r
         |)
         |SELECT custkey, recency_days, n_orders, spend,
         |       r_score, f_score, m_score,
         |       $RfmSegmentCase AS segment
         |FROM sc
         |ORDER BY custkey""".stripMargin,
    "q_robust_stats" ->
      """WITH ranked AS (
        |  SELECT source, doc_id, n_chars,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY source
        |                                 ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
        |         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM documents
        |), med AS (
        |  SELECT source, n_chars AS median FROM ranked WHERE rn = (n + 1) // 2
        |), mad AS (
        |  SELECT source, dev AS mad FROM (
        |    SELECT r.source, abs(r.n_chars - m.median) AS dev, r.doc_id, r.n,
        |           CAST(ROW_NUMBER() OVER (PARTITION BY r.source
        |                ORDER BY abs(r.n_chars - m.median), r.doc_id) AS BIGINT) AS dn
        |    FROM ranked r JOIN med m USING (source))
        |  WHERE dn = (n + 1) // 2
        |), agg AS (
        |  SELECT source, MAX(n) AS n, CAST(SUM(n_chars) AS BIGINT) AS sx,
        |         CAST(SUM(CASE WHEN rn > n // 10 AND rn <= n - n // 10
        |                       THEN n_chars ELSE 0 END) AS BIGINT) AS sx_trim,
        |         CAST(SUM(CASE WHEN rn > n // 10 AND rn <= n - n // 10
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_trim
        |  FROM ranked GROUP BY source
        |)
        |SELECT a.source, a.n,
        |       CAST(a.sx AS DOUBLE) / CAST(a.n AS DOUBLE) AS mean,
        |       m.median, d.mad,
        |       CAST(a.sx_trim AS DOUBLE) / CAST(a.n_trim AS DOUBLE) AS trimmed_mean
        |FROM agg a JOIN med m USING (source) JOIN mad d USING (source)
        |ORDER BY source""".stripMargin,
    "q_ewma" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_orders
         |  FROM orders GROUP BY 1
         |), probes AS (
         |  SELECT day, CAST(lag AS BIGINT) AS lag, day - CAST(lag AS INTEGER) AS look_day,
         |         ${ewmaWeightCase("lag")} AS w
         |  FROM daily CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS lag)
         |), j AS (
         |  SELECT p.day,
         |         SUM(CAST(CAST(h.n_orders AS DECIMAL(18,9)) * p.w AS DECIMAL(18,9))) AS num,
         |         SUM(p.w) AS den
         |  FROM probes p JOIN daily h ON h.day = p.look_day
         |  GROUP BY p.day
         |)
         |SELECT CAST(d.day AS TIMESTAMP) AS day, d.n_orders,
         |       CAST(j.num AS DOUBLE) / CAST(j.den AS DOUBLE) AS ewma10,
         |       CAST(d.n_orders AS DOUBLE)
         |         / (CAST(j.num AS DOUBLE) / CAST(j.den AS DOUBLE)) AS ratio
         |FROM j JOIN daily d USING (day)
         |ORDER BY day""".stripMargin,
    "q_js_divergence" ->
      """WITH tf AS (
        |  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS f
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY source, term
        |), tot AS (
        |  SELECT source, CAST(SUM(f) AS BIGINT) AS tot FROM tf GROUP BY source
        |), vocab AS (SELECT DISTINCT term FROM tf),
        |grid AS (
        |  SELECT t.source, v.term,
        |         CAST(COALESCE(tf.f, 0) AS DOUBLE) / CAST(t.tot AS DOUBLE) AS p
        |  FROM vocab v CROSS JOIN tot t
        |  LEFT JOIN tf ON tf.source = t.source AND tf.term = v.term
        |), pairs AS (
        |  SELECT a.source AS source_a, b.source AS source_b, a.p AS pa, b.p AS pb
        |  FROM grid a JOIN grid b ON a.term = b.term AND a.source < b.source
        |  WHERE a.p > 0 OR b.p > 0
        |), agg AS (
        |  SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_terms,
        |         CAST(SUM(CASE WHEN pa > 0 AND pb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |         CAST(SUM(CAST(
        |           CASE WHEN pa > 0 THEN pa * ln(2 * pa / (pa + pb)) ELSE 0 END
        |         AS DECIMAL(18,9))) AS DOUBLE) AS kl_a,
        |         CAST(SUM(CAST(
        |           CASE WHEN pb > 0 THEN pb * ln(2 * pb / (pa + pb)) ELSE 0 END
        |         AS DECIMAL(18,9))) AS DOUBLE) AS kl_b
        |  FROM pairs GROUP BY source_a, source_b
        |)
        |SELECT source_a, source_b, n_terms, n_shared,
        |       0.5 * (kl_a + kl_b) AS js_div
        |FROM agg
        |ORDER BY source_a, source_b""".stripMargin,
    "q_oov" ->
      s"""WITH marked AS (
         |  SELECT doc_id, source, text, ${Sampling.splitSql} AS split FROM documents
         |), vocab AS (
         |  SELECT DISTINCT unnest(string_split(text, ' ')) AS term
         |  FROM marked WHERE split = 'train'
         |), ev AS (
         |  SELECT source, split, doc_id, unnest(string_split(text, ' ')) AS term
         |  FROM marked WHERE split <> 'train'
         |)
         |SELECT ev.source, ev.split,
         |       CAST(COUNT(DISTINCT ev.doc_id) AS BIGINT) AS n_docs,
         |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |       CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |       CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |         / CAST(COUNT(*) AS DOUBLE) AS oov_rate
         |FROM ev LEFT JOIN vocab v USING (term)
         |GROUP BY ev.source, ev.split
         |ORDER BY ev.source, ev.split""".stripMargin,
    "q_leakage" ->
      s"""WITH doubled AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
         |), marked AS (
         |  SELECT doc_id, md5(text) AS dig, ${Sampling.splitSql} AS split FROM doubled
         |)
         |SELECT dig,
         |       CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         |       CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
         |       CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
         |       MIN(CASE WHEN split = 'train' THEN doc_id END) AS min_train_id,
         |       MIN(CASE WHEN split <> 'train' THEN doc_id END) AS min_eval_id
         |FROM marked
         |GROUP BY dig
         |HAVING SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) > 0
         |   AND (SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) > 0
         |     OR SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) > 0)
         |ORDER BY dig""".stripMargin,
    "q_cusum" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1
        |), c AS (
        |  SELECT day, n_orders,
        |         CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS k,
        |         CAST(SUM(n_orders) OVER (ORDER BY day) AS BIGINT) AS run_sum,
        |         CAST(SUM(n_orders) OVER () AS BIGINT) AS tot,
        |         CAST(COUNT(*) OVER () AS BIGINT) AS n_days
        |  FROM daily
        |), cc AS (
        |  SELECT day, n_orders, run_sum,
        |         CAST(run_sum AS DOUBLE)
        |           - (CAST(k AS DOUBLE) * CAST(tot AS DOUBLE)) / CAST(n_days AS DOUBLE)
        |           AS cusum
        |  FROM c
        |)
        |SELECT CAST(day AS TIMESTAMP) AS day, n_orders, run_sum, cusum,
        |       abs(cusum) = MAX(abs(cusum)) OVER () AS is_peak
        |FROM cc
        |ORDER BY day""".stripMargin,
    "q_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS m,
        |         CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders
        |), c AS (
        |  SELECT o_custkey, MIN(m) AS cm FROM o GROUP BY o_custkey
        |), sizes AS (
        |  SELECT cm, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM c GROUP BY cm
        |), j AS (
        |  SELECT o.o_custkey, c.cm, o.m - c.cm AS k, o.price
        |  FROM o JOIN c ON o.o_custkey = c.o_custkey
        |  WHERE o.m - c.cm <= 11
        |), cells AS (
        |  SELECT cm, k, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_active,
        |         SUM(price) AS rev_dec
        |  FROM j GROUP BY cm, k
        |), cum AS (
        |  SELECT cm, k, n_active, rev_dec,
        |         SUM(rev_dec) OVER (PARTITION BY cm ORDER BY k
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_dec
        |  FROM cells
        |)
        |SELECT CAST(make_date(CAST(cm // 12 AS INT), CAST(cm % 12 + 1 AS INT), 1)
        |            AS TIMESTAMP) AS cohort_month,
        |       k, s.cohort_size, n_active,
        |       CAST(rev_dec AS DOUBLE) AS revenue,
        |       CAST(cum_dec AS DOUBLE) AS cum_revenue
        |FROM cum JOIN sizes s USING (cm)
        |ORDER BY cohort_month, k""".stripMargin,
    "q_benford" -> {
      s"""WITH digits AS (
         |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
         |  FROM orders
         |), counts AS (
         |  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM digits GROUP BY digit
         |), tot AS (
         |  SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM counts
         |), terms AS (
         |  SELECT digit, n_obs, n,
         |         ${benfordCase("digit")} AS p_benford,
         |         CAST(n AS DECIMAL(18,0)) * (${benfordCase("digit")}) AS expected_dec
         |  FROM counts, tot
         |), pinned AS (
         |  SELECT digit, n_obs, n, p_benford, expected_dec,
         |         CAST((CAST(n_obs AS DOUBLE) - CAST(expected_dec AS DOUBLE))
         |              * (CAST(n_obs AS DOUBLE) - CAST(expected_dec AS DOUBLE))
         |              / CAST(expected_dec AS DOUBLE) AS DECIMAL(18,9)) AS term_dec
         |  FROM terms
         |)
         |SELECT digit, n_obs,
         |       CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE) AS share,
         |       CAST(p_benford AS DOUBLE) AS p_benford,
         |       CAST(expected_dec AS DOUBLE) AS expected,
         |       CAST(term_dec AS DOUBLE) AS chi2_term,
         |       CAST(SUM(term_dec) OVER () AS DOUBLE) AS chi2
         |FROM pinned
         |ORDER BY digit""".stripMargin
    },
    "q_mase" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS priority,
        |         epoch_us(o_orderdate) // 86400000000 AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1, 2
        |), bounds AS (
        |  SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily
        |), spine AS (
        |  SELECT hi, unnest(range(lo, hi + 1)) AS day FROM bounds
        |), grid AS (
        |  SELECT p.priority, s.day, s.hi, COALESCE(d.n, 0) AS n
        |  FROM spine s
        |  CROSS JOIN (SELECT DISTINCT priority FROM daily) p
        |  LEFT JOIN daily d ON d.priority = p.priority AND d.day = s.day
        |), lagged AS (
        |  SELECT priority, day, hi, n,
        |         LAG(n, 7) OVER (PARTITION BY priority ORDER BY day) AS n_lag
        |  FROM grid
        |), terms AS (
        |  SELECT priority, abs(n - n_lag) AS abs_err, day > hi - 28 AS is_eval
        |  FROM lagged WHERE n_lag IS NOT NULL
        |), agg AS (
        |  SELECT priority,
        |         CAST(SUM(CASE WHEN NOT is_eval THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        |         CAST(SUM(CASE WHEN NOT is_eval THEN abs_err ELSE 0 END) AS BIGINT) AS sum_train,
        |         CAST(SUM(CASE WHEN is_eval THEN 1 ELSE 0 END) AS BIGINT) AS n_eval,
        |         CAST(SUM(CASE WHEN is_eval THEN abs_err ELSE 0 END) AS BIGINT) AS sum_eval
        |  FROM terms GROUP BY priority
        |)
        |SELECT priority, n_train, sum_train, n_eval, sum_eval,
        |       (CAST(sum_eval AS DOUBLE) * CAST(n_train AS DOUBLE))
        |         / (CAST(sum_train AS DOUBLE) * CAST(n_eval AS DOUBLE)) AS mase
        |FROM agg
        |ORDER BY priority""".stripMargin,
    "q_autocorr" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS x
        |  FROM orders GROUP BY 1, 2
        |), pairs AS (
        |  SELECT priority, x,
        |         LEAD(x, 1) OVER (PARTITION BY priority ORDER BY day) AS y
        |  FROM daily
        |), agg AS (
        |  SELECT priority, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |         CAST(SUM(x * y) AS BIGINT) AS sxy,
        |         CAST(SUM(x * x) AS BIGINT) AS sxx,
        |         CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM pairs WHERE y IS NOT NULL GROUP BY priority
        |)
        |SELECT priority, n, sx, sy, sxy, sxx, syy,
        |       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |         / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |         AS r
        |FROM agg
        |ORDER BY priority""".stripMargin,
    "q_vocab_growth" ->
      """WITH ranked AS (
        |  SELECT doc_id, text,
        |         CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS rn,
        |         CAST(COUNT(*) OVER () AS BIGINT) AS n
        |  FROM documents
        |), doc_tok AS (
        |  SELECT (rn * 10 + n - 1) // n AS decile,
        |         CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM ranked GROUP BY 1
        |), first_seen AS (
        |  SELECT ((MIN(rn) * 10 + MAX(n) - 1) // MAX(n)) AS decile,
        |         term
        |  FROM (SELECT rn, n, unnest(string_split(text, ' ')) AS term FROM ranked)
        |  GROUP BY term
        |), new_terms AS (
        |  SELECT decile, CAST(COUNT(*) AS BIGINT) AS new_terms
        |  FROM first_seen GROUP BY decile
        |), cum AS (
        |  SELECT d.decile, d.n_docs,
        |         CAST(COALESCE(t.new_terms, 0) AS BIGINT) AS new_terms,
        |         CAST(SUM(d.n_docs) OVER (ORDER BY d.decile) AS BIGINT) AS cum_docs,
        |         CAST(SUM(d.n_tokens) OVER (ORDER BY d.decile) AS BIGINT) AS cum_tokens,
        |         CAST(SUM(COALESCE(t.new_terms, 0)) OVER (ORDER BY d.decile) AS BIGINT) AS cum_vocab
        |  FROM doc_tok d LEFT JOIN new_terms t ON t.decile = d.decile
        |)
        |SELECT decile, n_docs, new_terms, cum_docs, cum_tokens, cum_vocab,
        |       ln(CAST(cum_vocab AS DOUBLE)) / ln(CAST(cum_tokens AS DOUBLE)) AS heaps_beta
        |FROM cum
        |ORDER BY decile""".stripMargin
  )
}
