package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.Ensemble

/** T13 — the ensemble sampler recovers injected box-transit parameters
  * (the reference's 100×100-walker fit volume, main.py:12131–12133,
  * on a collected fit window). Driver-side only: no Spark needed. */
class EnsembleSpec extends AnyFunSuite {

  test("stretch-move sampler recovers injected depth and epoch") {
    val rng = new scala.util.Random(23)
    val n = 1500
    val t = Array.tabulate(n)(i => i * 10.0 / n)     // 10 days
    val trueDepth = 0.02; val trueEpoch = 1.3; val period = 2.7; val dur = 0.2
    val model = Ensemble.boxModel(t, trueEpoch, period, dur, trueDepth)
    val y = model.map(_ + 0.004 * rng.nextGaussian())
    val yerr = Array.fill(n)(0.004)

    def ll(p: Array[Double]): Double = {
      val m = Ensemble.boxModel(t, p(1), period, dur, p(0))
      Ensemble.gaussianLogLik(y, yerr, m)
    }
    val (samples, acc) = Ensemble.sample(ll,
      lo = Array(0.0, 1.0), hi = Array(0.1, 1.6),
      nWalkers = 24, nSteps = 300, seed = 42L)
    assert(acc > 0.1 && acc < 0.9, s"acceptance $acc out of healthy range")
    val pct = Ensemble.percentiles(samples)
    val depthMed = pct(0)(1); val epochMed = pct(1)(1)
    assert(math.abs(depthMed - trueDepth) < 0.005, s"depth $depthMed vs $trueDepth")
    assert(math.abs(epochMed - trueEpoch) < 0.05, s"epoch $epochMed vs $trueEpoch")
    // 16/84 interval should bracket the truth
    assert(pct(0)(0) <= trueDepth + 0.003 && pct(0)(2) >= trueDepth - 0.003)
  }

  test("sampler is deterministic under a fixed seed") {
    def ll(p: Array[Double]): Double = -0.5 * (p(0) - 3.0) * (p(0) - 3.0)
    val (s1, _) = Ensemble.sample(ll, Array(0.0), Array(10.0), 8, 50, seed = 7L)
    val (s2, _) = Ensemble.sample(ll, Array(0.0), Array(10.0), 8, 50, seed = 7L)
    assert(s1.map(_.toSeq) sameElements s2.map(_.toSeq))
  }
}
