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

  test("GP likelihood fit at reference volume (100x100, ball init) beats the white-noise trap") {
    // 200-bin folded curve with correlated baseline wiggle + 1-day box:
    // the Matérn-3/2 marginal likelihood must recover the depth the
    // white-noise likelihood biases (baseline wiggle leaks into depth).
    val nb = 200; val period = 7.0
    val t = Array.tabulate(nb)(b => (b + 0.5) * period / nb)
    val trueDepth = 0.021
    val wiggle = t.map(ti => 0.002 * math.sin(2 * math.Pi * ti / 3.1))
    val box = Ensemble.boxModel(t, 0.0, period, 1.0, trueDepth)
    val rng = new scala.util.Random(5)
    val y = Array.tabulate(nb)(i => box(i) + wiggle(i) + 0.0004 * rng.nextGaussian())
    val yerr = Array.fill(nb)(0.0004)
    def ll(p: Array[Double]): Double = {
      val m = Ensemble.boxModel(t, p(1), period, p(2), p(0))
      val resid = Array.tabulate(nb)(i => y(i) - m(i))
      graft.ops.Detrend.gpLogLik(t, resid, yerr, sigma = 0.002, rho = 5.0)
    }
    val guess = Ensemble.boxGuess(t, y, period, 1.0)
    assert(math.abs(guess(1)) < 0.5, s"mini-BLS epoch guess off: ${guess(1)}")
    val (samples, acc) = Ensemble.sample(ll,
      lo = Array(-0.2, -3.5, 0.2), hi = Array(0.2, 3.5, 2.0),
      nWalkers = 100, nSteps = 100, burnFrac = 0.3, seed = 42L,
      init = Some(guess), ballFrac = 0.005)
    assert(acc > 0.1 && acc < 0.9, s"acceptance $acc unhealthy")
    val pct = Ensemble.percentiles(samples)
    assert(math.abs(pct(0)(1) - trueDepth) < 0.003,
      s"GP-likelihood depth ${pct(0)(1)} vs $trueDepth")
    assert(math.abs(pct(1)(1)) < 0.2, s"epoch ${pct(1)(1)} not near 0")
    assert(math.abs(pct(2)(1) - 1.0) < 0.3, s"dur ${pct(2)(1)} not near 1")
  }

  test("sampleQ (cross-engine-exact path) recovers an injected box at t13 volume") {
    val nb = 200; val period = 7.0
    val t = Array.tabulate(nb)(b => (b + 0.5) * period / nb)
    val trueDepth = 0.03
    val box = Ensemble.boxModel(t, 0.0, period, 1.0, trueDepth)
    // deterministic integer-hash noise, the t13 fixture's scale
    val y = Array.tabulate(nb)(i =>
      box(i) + ((Ensemble.draw(99L, i) + 1).toDouble / 2147483649.0 - 0.5) * 0.0008)
    val yq = y.map(v => graft.expr.VecExprs.roundHalfAway(v * 1e9))
    val guess = Ensemble.boxGuessQ(t, yq, period, 1.0)
    val llq = Ensemble.boxLlq(t, y, scale = 3.125e12, period = period) _
    val (samples, acc) = Ensemble.sampleQ(llq,
      lo = Array(-0.2, -3.5, 0.2), hi = Array(0.2, 3.5, 2.0),
      nWalkers = 100, nSteps = 100, burnFrac = 0.3, seed = 42L,
      init = guess, ballFrac = 0.005)
    assert(acc > 0.1 && acc < 0.9, s"acceptance $acc unhealthy")
    val pct = Ensemble.percentiles(samples)
    assert(math.abs(pct(0)(1) - trueDepth) < 0.003, s"depth ${pct(0)(1)}")
    assert(math.abs(pct(1)(1)) < 0.2, s"epoch ${pct(1)(1)}")
    assert(math.abs(pct(2)(1) - 1.0) < 0.3, s"dur ${pct(2)(1)}")
    // bit-reproducible: the exactness contract, not just statistics
    val (s2, acc2) = Ensemble.sampleQ(llq,
      lo = Array(-0.2, -3.5, 0.2), hi = Array(0.2, 3.5, 2.0),
      nWalkers = 100, nSteps = 100, burnFrac = 0.3, seed = 42L,
      init = guess, ballFrac = 0.005)
    assert(acc == acc2)
    assert(samples.length == 7000 && samples.zip(s2).forall {
      case (a, b) => a.sameElements(b) })
  }

  test("boxGuessQ matches boxGuess semantics on integer-quantized flux") {
    val nb = 200; val period = 7.0
    val t = Array.tabulate(nb)(b => (b + 0.5) * period / nb)
    val box = Ensemble.boxModel(t, 0.5, period, 1.0, 0.02)
    val y = box.clone(); y(30) -= 0.004
    val g = Ensemble.boxGuess(t, y, period, 1.0)
    val yq = y.map(v => graft.expr.VecExprs.roundHalfAway(v * 1e9))
    val gq = Ensemble.boxGuessQ(t, yq, period, 1.0)
    // same window argmin (integer vs float sums agree off the
    // degenerate-tie case), same epoch; depth within the 1e-9 quantum
    assert(gq(1) == g(1), s"epoch ${gq(1)} vs ${g(1)}")
    assert(math.abs(gq(0) - g(0)) < 1e-7, s"depth ${gq(0)} vs ${g(0)}")
    assert(gq(2) == g(2))
  }

  test("indexed draws are uniform-ish and decorrelated across channels") {
    val n = 30000
    val us = Array.tabulate(n)(i => (Ensemble.draw(42L, i) + 1).toDouble / 2147483649.0)
    val mean = us.sum / n
    assert(math.abs(mean - 0.5) < 0.01, s"mean $mean")
    // adjacent-index correlation (the degenerate-LCG failure mode the
    // xorshift mixing rounds exist to kill)
    val c = (0 until n - 1).map(i => (us(i) - 0.5) * (us(i + 1) - 0.5)).sum / (n - 1)
    assert(math.abs(c) < 0.005, s"lag-1 covariance $c")
  }

  test("boxGuess centers the deepest circular window, not an edge bin") {
    val nb = 200; val period = 7.0
    val t = Array.tabulate(nb)(b => (b + 0.5) * period / nb)
    // dip straddling the fold boundary; deepest single bin forced onto
    // the dip EDGE by a noise spike there
    val box = Ensemble.boxModel(t, 0.0, period, 1.0, 0.02)
    val y = box.clone()
    y(nb - 15) -= 0.005 // spike near the trailing edge
    val g = Ensemble.boxGuess(t, y, period, 1.0)
    assert(math.abs(g(1)) < 0.3, s"epoch guess ${g(1)} should be ~0")
    assert(g(0) > 0.01 && g(0) < 0.03, s"depth guess ${g(0)}")
  }

  test("gpInnovSteady: truncated innovation filter tracks the exact Kalman GP likelihood") {
    // On a uniform grid, llq differences between two residual vectors
    // must match the EXACT sequential Kalman marginal likelihood
    // (Detrend.gpLogLik) up to the additive log-det constant and the
    // truncation/quantization tail — this pins the steady-state
    // + lag-truncation derivation against the recurrence it replaces.
    val nb = 200; val dt = 7.0 / 200
    val t = Array.tabulate(nb)(b => (b + 0.5) * dt)
    val sigma = 0.001; val rho = 0.15; val yerr = 4e-4
    val (cw, sInn) = graft.ops.Detrend.gpInnovSteady(sigma, rho, dt, yerr, 32)
    val cq = cw.map(c => graft.expr.VecExprs.roundHalfAway(c * 1e6))
    val scale = 1e6 / (2 * sInn)
    def mkR(seed: Int): Array[Double] = {
      val rng = new scala.util.Random(seed)
      // correlated-ish residuals at the fixture's magnitude
      val w = Array.fill(nb)(rng.nextGaussian() * 0.001)
      Array.tabulate(nb)(i => w(math.max(0, i - 1)) * 0.5 + w(i) * 0.5)
    }
    val ye = Array.fill(nb)(yerr)
    def llqOf(r: Array[Double]): Long = {
      // gpBoxLlq with a zero model: y = r, depth 0 box
      Ensemble.gpBoxLlq(t, r.map(_ + 1.0), cq, scale, 7.0)(Array(0.0, 0.0, 0.5))
    }
    val r1 = mkR(7); val r2 = mkR(8)
    val dLlq = (llqOf(r1) - llqOf(r2)).toDouble / 1e6 // nats
    val dExact = graft.ops.Detrend.gpLogLik(t, r1, ye, sigma, rho) -
      graft.ops.Detrend.gpLogLik(t, r2, ye, sigma, rho)
    // exact path carries the first bins' transient (non-steady gains)
    // and no truncation; agreement to ~1% of the difference magnitude
    assert(math.abs(dLlq - dExact) < 0.02 * math.abs(dExact) + 2.0,
      s"innovation-filter delta $dLlq vs exact Kalman delta $dExact")
  }

  test("t13c fixture-volume GP fit recovers the injection through the correlated wiggle") {
    // mirrors the declared query's construction driver-side (no Spark):
    // box + white LCG noise + the 8-bin moving-sum wiggle, then the
    // 50x60 sampleQ walk under the GP innovation likelihood
    val nb = 200
    val t = Array.tabulate(nb)(b => (b + 0.5) * 7.0 / 200)
    val y = Array.tabulate(nb) { b =>
      val box = Ensemble.boxModel(Array(t(b)), 0.0, 7.0, 1.0, 0.03)(0)
      val wigq = (0 until 8).map(k =>
        ((((b + 200 - k) % 200).toLong * 1103515245L + 54321L) % 2147483648L) % 1000L).sum
      box + (wigq - 4000L).toDouble * 1.25e-6
    }
    val (cw, sInn) = graft.ops.Detrend.gpInnovSteady(0.001, 0.15, 7.0 / 200, 4e-4, 32)
    val cq = cw.map(c => graft.expr.VecExprs.roundHalfAway(c * 1e6))
    val llq = Ensemble.gpBoxLlq(t, y, cq, 1e6 / (2 * sInn), 7.0) _
    val yq = y.map(v => graft.expr.VecExprs.roundHalfAway(v * 1e9))
    val guess = Ensemble.boxGuessQ(t, yq, 7.0, 1.0)
    val (samples, acc) = Ensemble.sampleQ(llq,
      lo = Array(-0.2, -3.5, 0.2), hi = Array(0.2, 3.5, 2.0),
      nWalkers = 50, nSteps = 60, seed = 42L, init = guess, ballFrac = 0.005)
    val pct = Ensemble.percentiles(samples)
    assert(acc > 0.1 && acc < 0.9, s"acceptance $acc")
    assert(math.abs(pct(0)(1) - 0.03) < 0.006, s"depth p50 ${pct(0)(1)}")
    assert(math.abs(pct(1)(1)) < 0.1, s"epoch p50 ${pct(1)(1)}")
    assert(math.abs(pct(2)(1) - 1.0) < 0.15, s"dur p50 ${pct(2)(1)}")
  }

  test("r10: the declared exp reduction tracks libm exp to ~1e-4 relative on [0, 40]") {
    var x = 0.0
    while (x <= 40.0) {
      val got = graft.model.Flare.expNegCore(x)
      val want = math.exp(-x)
      val rel = math.abs(got - want) / want
      assert(rel < 1.5e-4, s"expNegCore($x) = $got vs $want (rel $rel)")
      x += 0.0137
    }
  }

  test("r10: nelderMeadQ climbs a smooth integer likelihood to its optimum deterministically") {
    // quadratic bowl with optimum at (0.3, -1.2, 5.0), integer llq
    def llq(p: Array[Double]): Long = {
      val d0 = p(0) - 0.3; val d1 = p(1) + 1.2; val d2 = p(2) - 5.0
      -graft.expr.VecExprs.roundHalfAway(
        (d0 * d0 + d1 * d1 * 0.1 + d2 * d2 * 0.01) * 1e12)
    }
    val (v1, l1) = Ensemble.nelderMeadQ(llq,
      lo = Array(0.0, -3.0, 0.0), hi = Array(1.0, 3.0, 10.0),
      init = Array(0.5, 0.0, 2.0), nIter = 200)
    assert(math.abs(v1(0) - 0.3) < 1e-4, s"x0 ${v1(0)}")
    assert(math.abs(v1(1) + 1.2) < 1e-3, s"x1 ${v1(1)}")
    assert(math.abs(v1(2) - 5.0) < 1e-2, s"x2 ${v1(2)}")
    // determinism: a second run is bit-identical
    val (v2, l2) = Ensemble.nelderMeadQ(llq,
      lo = Array(0.0, -3.0, 0.0), hi = Array(1.0, 3.0, 10.0),
      init = Array(0.5, 0.0, 2.0), nIter = 200)
    assert(l1 == l2 && v1.zip(v2).forall { case (a, b) =>
      java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b) })
  }
}
