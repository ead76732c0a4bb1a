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
    ratios.foreach { case (n, r) =>
      assert(r < 6.0, f"$n grew super-linearly: t(16x)/t(4x) = $r%.2f >= 6.0")
    }
  }
}
