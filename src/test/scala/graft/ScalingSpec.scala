package graft

/** Empirical near-linearity tripwire for the dedup/ANN suite: times
  * every sub-quadratic path on 4× and 16× synthetic blowups of the
  * sf0.01 corpus (decorrelated id-shifted copies — see ScaleProbe's
  * synthesis notes) and fails if t(16×)/t(4×) reaches 6 — linear
  * growth measures ~4, a quadratic path ~16, so the threshold leaves
  * noise headroom on both sides. This is the test that catches an
  * accidental all-pairs join or a blocking parameter that stops
  * scaling with corpus size, BEFORE it ships as a 100 TB stall.
  *
  * Runs the real production code paths (suite queries; LSH params
  * re-derived per corpus size, the documented deployment override).
  * Small-scale fixed costs (plan compile, task launch) inflate the
  * small run and DEFLATE the measured ratio, so a pass here is
  * conservative evidence of boundedness, and the committed
  * SCALING.json from graft.Scaling measures the same exponent at
  * sf0.1 sizes.
  */
class ScalingSpec extends SparkSpec {

  test("dedup and ANN paths scale near-linearly from 4x to 16x corpus") {
    val work = java.nio.file.Files.createTempDirectory("graft-scale").toString
    val res = graft.operators.ScaleProbe.run(spark, Sf001, work, Seq(4, 16))
    val ratios = res(4).keys.map { n =>
      val r = res(16)(n) / res(4)(n)
      info(f"$n%-18s t4=${res(4)(n)}%6.2fs t16=${res(16)(n)}%6.2fs ratio=$r%4.2f")
      n -> r
    }.toMap
    // Late-session JVM stalls (code-cache/GC storms ~40 min into the
    // probe session) have produced 10-26× ratios on paths that measure
    // 2-5 in the adjacent run AND 6-12 s under an interleaved A/B on
    // the SAME x16 corpus in a fresh JVM (r13: q_winnow_pairs 23.95
    // then 2.56; q_hits 2.23 then 9.08; q_link_jaccard/q_adamic_adar
    // tripping only as the LAST retries of a long session — different
    // victim each run, code untouched or exonerated head-to-head). A
    // genuinely super-linear exponent is a property of the PLAN and
    // inflates every pass of every run, so tripped paths get ONE
    // retry measured by MIN-of-passes (stalls are one-sided additive
    // noise; the minimum sheds them, while a real quadratic blowup —
    // ratio ~16 — still fails the 6.0 gate from its fastest pass).
    val tripped = ratios.filter(_._2 >= 6.0).keys.toSet
    val finalRatios =
      if (tripped.isEmpty) ratios
      else {
        // the retry logs its FULL per-pass spread: min-of-passes
        // deliberately sheds one-sided stalls, so a bimodal path (min
        // fast, median 10×) must at least be visible in test output —
        // a silent min would hide exactly the case worth investigating
        val again = graft.operators.ScaleProbe.run(
          spark, Sf001, work, Seq(4, 16), only = Some(tripped), useMin = true,
          spreadSink = (n, m, ts) => {
            val spread = ts.map(t => f"$t%.2f").mkString("[", ", ", "]")
            val ratio = ts.max / ts.min
            info(f"RETRY-SPREAD $n%-18s x$m%-2d passes=$spread max/min=$ratio%.1f" +
              (if (ratio > 4.0) "  << BIMODAL — min shed a recurring slow pass" else ""))
          })
        ratios ++ tripped.map { n =>
          val r = again(16)(n) / again(4)(n)
          info(f"RETRY $n%-18s t4=${again(4)(n)}%6.2fs " +
            f"t16=${again(16)(n)}%6.2fs ratio=$r%4.2f (min-of-passes)")
          n -> r
        }
      }
    finalRatios.foreach { case (n, r) =>
      assert(r < 6.0, f"$n grew super-linearly: t(16x)/t(4x) = $r%.2f >= 6.0" +
        (if (tripped(n)) " (reproduced on isolated retry)" else ""))
    }
  }

  test("min-of-passes estimator sheds one-sided stalls but a genuine " +
      "quadratic still trips from its fastest pass") {
    import graft.operators.ScaleProbe.estimate
    // stall class (the case the retry exists for): one-sided ADDITIVE
    // noise lands on some passes only — the fastest pass of each scale
    // is clean, so the min-of-passes ratio reads the true ~4× linear
    // growth and the 6.0 gate passes
    val stall4 = Seq(1.0, 11.4, 1.1)   // stall on pass 2 at 4×
    val stall16 = Seq(4.1, 4.0, 25.0)  // stall on pass 3 at 16×
    assert(estimate(stall16, useMin = true) / estimate(stall4, useMin = true) < 6.0)
    // the property a future loosening of the gate must NOT lose: a
    // genuinely super-linear path inflates EVERY pass — its t(16×)
    // MINIMUM is ~16× the t(4×) minimum (ratio ~16 for quadratic), so
    // min-of-passes still fails the 6.0 gate deterministically even
    // with stalls stacked on top of the growth
    val quad4 = Seq(1.0, 1.2, 9.0)        // stall on a 4× pass too
    val quad16 = Seq(16.0, 17.5, 40.0)    // every pass carries the x16 growth
    val quadRatio = estimate(quad16, useMin = true) / estimate(quad4, useMin = true)
    assert(quadRatio >= 6.0,
      f"quadratic must still trip from its fastest pass: $quadRatio%.1f")
    // and the median estimator (the non-retry path) agrees on both
    assert(estimate(quad16, useMin = false) / estimate(quad4, useMin = false) >= 6.0)
  }

  test("ScaleRank under zipf skew: quantile refinement rebalances buckets; " +
      "ranks stay the exact total order") {
    import org.apache.spark.sql.functions._
    // deterministic zipf-ish column: v = n DIV (id+1) → value 1 holds
    // ~50% of the mass and the value RANGE is stretched to n, so
    // equal-width buckets would drop ~every row into bucket 0 (worst
    // fraction ≈ 1.0). The sampled-quantile refinement must pull the
    // worst bucket back to ≈ the heavy value's own mass — the
    // irreducible floor, since a bucket is a pure function of the
    // value and equal sort keys cannot split.
    val n = 200000L
    val df = spark.range(n)
      .select(col("id"), expr(s"CAST($n DIV (id + 1) AS BIGINT)").as("v"))
    var frac = -1.0
    val ranked = graft.operators.ScaleRank.withGlobalRank(
      df, col("v"), Seq(col("v"), col("id")), "rk", "nn",
      skewSink = f => frac = f)
    info(f"worst-bucket fraction under zipf skew: $frac%.3f (heavy-value mass ≈ 0.5)")
    assert(frac < 0.6,
      f"quantile refinement failed to rebalance: worst bucket $frac%.2f of mass")
    // exactness: rank must equal the corpus-wide row_number over the
    // same tie-broken order (the test may use the global window the
    // production path exists to avoid)
    val expected = df.withColumn("xrk", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("v"), col("id")))
      .cast("long"))
    val mism = ranked.join(expected, Seq("id"))
      .filter(col("rk") =!= col("xrk")).count()
    assert(mism == 0L, s"$mism rows rank differently from the global sort")
  }

  test("Scaling merge mode parses its own artifact and refuses a base-dir mismatch") {
    val f = java.nio.file.Files.createTempFile("scaling", ".json")
    val json = """{"base":"/data/sf0.1","multipliers":[4,16],"linear_ratio":4.0,""" +
      """"threshold":6.0,"paths":{"q_a":{"t4x":1.5,"t16x":6.0,"ratio":4.0},""" +
      """"q_b":{"t4x":2.0E-1,"t16x":0.8,"ratio":4.0}}}"""
    java.nio.file.Files.write(f, json.getBytes("UTF-8"))
    val rows = Scaling.existingRows(f, "/data/sf0.1").toMap
    assert(rows.keySet == Set("q_a", "q_b"))
    assert(rows("q_a") == ((1.5, 6.0, 4.0)))
    assert(rows("q_b")._1 == 0.2) // exponent form must parse
    // a merge against a different corpus must fail loudly, not mix rows
    intercept[IllegalArgumentException] {
      Scaling.existingRows(f, "/data/sf0.01")
    }
    // absent artifact → clean slate, not an error
    assert(Scaling.existingRows(
      java.nio.file.Paths.get("/nonexistent/SCALING.json"), "/data/sf0.1").isEmpty)
  }
}
