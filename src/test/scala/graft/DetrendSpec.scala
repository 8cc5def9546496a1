package graft

import org.apache.spark.sql.functions._
import graft.ops.Detrend

/** T3 full-mode detrenders: the spline and GP baselines must track a
  * smooth injected trend (mirror of the reference's only unit test,
  * tests/test_Detrend.py — made assertive). */
class DetrendSpec extends SparkSpec {
  import spark.implicits._

  private val E = 1704067200000000L

  private def trended(n: Int, seed: Int): (Array[Double], Array[Double], Array[Double]) = {
    val rng = new scala.util.Random(seed)
    val t = Array.tabulate(n)(i => i * 30.0 / n)          // days over 30 d
    val trend = t.map(ti => 10.0 * math.sin(2 * math.Pi * ti / 15.0))
    val y = Array.tabulate(n)(i => 100.0 + trend(i) + 0.5 * rng.nextGaussian())
    val e = Array.fill(n)(0.5)
    (t, y, e)
  }

  test("spline baseline tracks a slow sinusoidal trend") {
    val (t, y, e) = trended(2000, 3)
    val base = Detrend.splineBaseline(t, y, timescale = 2.0)
    val resid = y.indices.map(i => y(i) - base(i))
    val rms = math.sqrt(resid.map(r => r * r).sum / resid.length)
    assert(rms < 1.0, s"spline residual rms $rms (raw trend amplitude 10)")
  }

  test("GP (Matern-3/2 state-space) baseline tracks the trend") {
    val (t, y, e) = trended(2000, 5)
    val base = Detrend.gpBaseline(t, y, e, sigma = 10.0, rho = 2.0)
    val resid = y.indices.map(i => y(i) - base(i))
    val rms = math.sqrt(resid.map(r => r * r).sum / resid.length)
    assert(rms < 1.0, s"gp residual rms $rms")
  }

  test("GP baseline golden values are stable (fixed input, fixed seed)") {
    // Pins the exact Kalman/RTS arithmetic: any change to the
    // state-space transition or smoother shows up here first. Values
    // captured from the current kernel on a deterministic input.
    val (t, y, e) = trended(64, 7)
    val base = Detrend.gpBaseline(t, y, e, sigma = 10.0, rho = 2.0)
    // Re-captured after the round-5 expQ change (the transition decay
    // e^{−λΔt} is quantized at 1e9 so the DuckDB oracle can replay the
    // recurrence engine-neutrally) — shifted ~1e-9 from the unquantized
    // kernel, exactly the quantization scale.
    val got = Seq(base(0), base(16), base(32), base(63))
    val want = Seq(100.186306364, 99.586157926, 99.985301207, 97.922401122)
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-9, s"golden anchor drifted: $g vs $w")
    }
    // determinism across invocations
    val base2 = Detrend.gpBaseline(t, y, e, sigma = 10.0, rho = 2.0)
    assert(base.sameElements(base2))
  }

  test("distributed detrend runs per (part, region) and centers at 1") {
    val rng = new scala.util.Random(9)
    val rows = (0 until 2000).map { i =>
      val gap = if (i >= 1000) 7200000000L else 0L
      (("c" + (i % 2)), i.toLong, E + i * 120000000L + gap,
        1.0 + 0.05 * math.sin(i / 300.0) + 0.002 * rng.nextGaussian(), 0.002)
    }
    val df = rows.toDF("part", "id", "t_us", "value", "err")
    val out = Detrend.detrend(df, Seq("part"), "t_us", "id", "value", "err",
      gapUs = 3600000000L, mode = "Spline", timescaleDays = 0.5)
    assert(out.count() === 2000)
    val meanDetr = out.agg(avg("detr")).head.getDouble(0)
    assert(math.abs(meanDetr - 1.0) < 0.01, s"detrended mean $meanDetr")
    val sd = out.agg(stddev_pop(col("detr"))).head.getDouble(0)
    assert(sd < 0.01, s"detrended scatter $sd should be ~noise level")
  }
}
