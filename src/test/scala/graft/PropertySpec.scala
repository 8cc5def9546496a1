package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator property tests for the pure kernels
  * (FIXTURES.md §2 invariants): phase-fold arithmetic, the rebin
  * error formula, box-model evaluation, kernel weights — the
  * reference's ad-hoc booldiag assertions as real properties.
  * (Raw Gen + seeded sampling: the scalatest/scalacheck bridge
  * artifact is not in the offline cache.) */
class PropertySpec extends AnyFunSuite {

  private def forAllN[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(0xC0FFEE + i)).foreach(f)
    }

  private def phaseUs(t: Long, e: Long, p: Long): Long = {
    val m = (t - e) % p
    if (m < 0) m + p else m
  }

  test("phase fold lands in [0, P) and is P-periodic for any inputs") {
    val gen = for {
      t <- Gen.chooseNum(-2000000000000L, 2000000000000L)
      e <- Gen.chooseNum(-1000000000L, 1000000000L)
      p <- Gen.chooseNum(1L, 100000000000L)
    } yield (t, e, p)
    forAllN(gen) { case (t, e, p) =>
      val ph = phaseUs(t, e, p)
      assert(ph >= 0 && ph < p)
      assert(phaseUs(t + p, e, p) === ph)
      assert(phaseUs(t - p, e, p) === ph)
    }
  }

  test("rebin error formula equals reference composition (main.py:3805-3811)") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-1000, 1000).map(_ / 10.0))
    forAllN(gen) { vs =>
      val n = vs.length
      // reference: sqrt((sqrt(Σe²)/n)² + std_pop²) with unit errors
      val stdvFrst = math.sqrt(n.toDouble) / n
      val mean = vs.sum / n
      val stdvSeco = math.sqrt(vs.map(v => (v - mean) * (v - mean)).sum / n)
      val combined = math.sqrt(stdvFrst * stdvFrst + stdvSeco * stdvSeco)
      // engine: sqrt(1/n + var_pop) from exact sums
      val s = vs.sum; val q = vs.map(v => v * v).sum
      val varPop = (q - s * s / n) / n
      val engine = math.sqrt(1.0 / n + math.max(varPop, 0.0))
      assert(math.abs(combined - engine) < 1e-6, s"$combined vs $engine")
    }
  }

  test("box model: in-transit fraction ≈ duty cycle; values only {1, 1-depth}") {
    val gen = for {
      period <- Gen.chooseNum(1.0, 20.0)
      duty <- Gen.chooseNum(0.01, 0.2)
      depth <- Gen.chooseNum(0.005, 0.05)  // depth≈0 makes in-transit
                                           // indistinguishable from baseline
    } yield (period, duty, depth)
    forAllN(gen, 50) { case (period, dutyFrac, depth) =>
      val dur = period * dutyFrac
      val n = 5000
      val t = Array.tabulate(n)(i => i * 10 * period / n)
      val m = graft.model.Ensemble.boxModel(t, period / 2, period, dur, depth)
      assert(m.forall(v => v == 1.0 || math.abs(v - (1.0 - depth)) < 1e-12))
      val frac = m.count(v => v != 1.0).toDouble / n
      assert(math.abs(frac - dutyFrac) < 0.02, s"in-transit frac $frac vs $dutyFrac")
    }
  }

  test("matched-filter kernel weights are demeaned, deterministic, decaying") {
    forAllN(Gen.chooseNum(0.5, 10.0), 50) { tau =>
      val w = graft.search.MatchedFilter.kernelWeights(tau)
      assert(w.length === graft.search.MatchedFilter.KernelSize)
      assert(math.abs(w.sum) <= w.length / 2 + 4) // demeaned up to rounding
      assert(w === graft.search.MatchedFilter.kernelWeights(tau))
      assert(w.head === w.max) // first lag dominates
    }
  }

  test("ensemble percentiles are ordered and inside the sample hull") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(-100.0, 100.0))
      .suchThat(_.length >= 3)
    forAllN(gen, 100) { xs =>
      val arr = xs.map(x => Array(x)).toArray
      val p = graft.model.Ensemble.percentiles(arr)(0)
      assert(p(0) <= p(1) && p(1) <= p(2))
      assert(p(0) >= xs.min - 1e-9 && p(2) <= xs.max + 1e-9)
    }
  }

  test("GP baseline is exact interpolant in the zero-noise wide-kernel limit") {
    forAllN(Gen.chooseNum(1L, 1000L), 20) { seed =>
      val rng = new scala.util.Random(seed)
      val n = 200
      val t = Array.tabulate(n)(i => i * 0.01)
      val y = t.map(ti => 5.0 + math.sin(ti))       // smooth signal
      val e = Array.fill(n)(1e-4)                    // tiny noise
      val base = graft.ops.Detrend.gpBaseline(t, y, e, sigma = 5.0, rho = 1.0)
      val resid = y.indices.map(i => math.abs(y(i) - base(i))).max
      assert(resid < 0.05, s"max residual $resid")
      val _ = rng
    }
  }
}
