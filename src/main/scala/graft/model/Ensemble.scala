package graft.model

import scala.util.Random

/** T13 — inference driver (ref proc_modl main.py:3928–4170; tdpy.samp
  * is an emcee-style affine-invariant ensemble sampler, 100 walkers ×
  * 100 steps, 30% burn-in, main.py:12131–12133).
  *
  * Spark division of labor mirrors the reference's: the fit window is
  * small (it was collect()ed after Spark-side cleaning/folding), so
  * the walker loop runs on the driver; Spark parallelizes ACROSS fits
  * (per energy bin / per target, ref main.py:12301–12316) — not per
  * step, where task latency would dominate.
  */
object Ensemble {

  /** Affine-invariant "stretch move" ensemble sampler (Goodman & Weare
    * 2010, the algorithm under emcee). Deterministic under `seed`.
    *
    * @param logLik  log-likelihood of a parameter vector
    * @param lo,hi   per-parameter uniform prior bounds
    * @param init    optional walker-initialization center: walkers
    *                start in a ±ballFrac·(hi−lo) ball around it (the
    *                emcee/tdpy.samp pattern — the reference seeds
    *                walkers around the prior parameter means,
    *                meangauspara main.py:12128; a sharply peaked
    *                likelihood is never found from uniform init).
    *                None → uniform over the prior box.
    * @return (samples, acceptance rate): samples after burn-in,
    *         flattened across walkers, each row one parameter vector.
    */
  def sample(logLik: Array[Double] => Double,
             lo: Array[Double], hi: Array[Double],
             nWalkers: Int = 32, nSteps: Int = 200, burnFrac: Double = 0.3,
             seed: Long = 42L, a: Double = 2.0,
             init: Option[Array[Double]] = None,
             ballFrac: Double = 0.02): (Array[Array[Double]], Double) = {
    require(lo.length == hi.length)
    val nd = lo.length
    val rng = new Random(seed)
    def clamp(v: Double, d: Int): Double = math.min(hi(d), math.max(lo(d), v))

    var walkers = Array.fill(nWalkers) {
      init match {
        case Some(c) => Array.tabulate(nd)(d => clamp(
          c(d) + (2 * rng.nextDouble() - 1) * ballFrac * (hi(d) - lo(d)), d))
        case None =>
          Array.tabulate(nd)(d => lo(d) + rng.nextDouble() * (hi(d) - lo(d)))
      }
    }
    var lls = walkers.map(logLik)
    val burn = (nSteps * burnFrac).toInt
    val out = Array.newBuilder[Array[Double]]
    var accepted = 0L; var proposed = 0L

    for (step <- 0 until nSteps) {
      val next = walkers.map(_.clone); val nextLl = lls.clone
      for (k <- 0 until nWalkers) {
        val j = { var x = rng.nextInt(nWalkers - 1); if (x >= k) x += 1; x }
        // stretch move: z ~ g(z) ∝ 1/√z on [1/a, a]
        val z = math.pow((a - 1.0) * rng.nextDouble() + 1.0, 2) / a
        val prop = Array.tabulate(nd)(d =>
          clamp(walkers(j)(d) + z * (walkers(k)(d) - walkers(j)(d)), d))
        val ll = logLik(prop)
        proposed += 1
        val logAccept = (nd - 1) * math.log(z) + ll - lls(k)
        if (math.log(rng.nextDouble()) < logAccept) {
          next(k) = prop; nextLl(k) = ll; accepted += 1
        }
      }
      walkers = next; lls = nextLl
      if (step >= burn) walkers.foreach(w => out += w.clone)
    }
    (out.result(), accepted.toDouble / proposed)
  }

  /** Walker-ball center for a box fit on a phase-binned curve: slide a
    * `durGuess`-wide CIRCULAR window over the bins (a mini-BLS) and
    * take the deepest window's center as the epoch and its deficit
    * below the global mean as the depth — robust where the single
    * deepest bin sits on a transit edge (which strands the ball in a
    * no-overlap local optimum). Deterministic: first index wins ties.
    * Returns Array(depth0, epoch0 ∈ [−P/2, P/2), durGuess). */
  def boxGuess(t: Array[Double], y: Array[Double],
               period: Double, durGuess: Double): Array[Double] = {
    val nb = y.length
    val h = math.max(1, math.rint(nb * durGuess / period).toInt / 2)
    def winMean(c: Int): Double = {
      var s = 0.0; var k = -h
      while (k <= h) { s += y(((c + k) % nb + nb) % nb); k += 1 }
      s / (2 * h + 1)
    }
    val best = (0 until nb).minBy(winMean)
    val eRaw = t(best)
    val epoch0 = if (eRaw >= period / 2) eRaw - period else eRaw
    Array(y.sum / nb - winMean(best), epoch0, durGuess)
  }

  /** Posterior 16/50/84 percentiles per parameter (ref A3,
    * main.py:1558–1571), linear interpolation. */
  def percentiles(samples: Array[Array[Double]], qs: Seq[Double] = Seq(0.16, 0.5, 0.84))
      : Array[Array[Double]] = {
    val nd = samples.head.length
    Array.tabulate(nd) { d =>
      val xs = samples.map(_(d)).sorted
      qs.map { q =>
        val idx = q * (xs.length - 1)
        val i = idx.toInt
        if (i + 1 >= xs.length) xs.last
        else xs(i) + (xs(i + 1) - xs(i)) * (idx - i)
      }.toArray
    }
  }

  /** T12-style box-transit model on a time axis (days):
    * flux(t) = 1 − depth·[|centered phase| < dur/2]. */
  def boxModel(t: Array[Double], epoch: Double, period: Double,
               dur: Double, depth: Double): Array[Double] = {
    // hot path: ~10⁴ calls per ensemble fit — primitive while loop, no
    // ArrayOps.map boxing
    val out = new Array[Double](t.length)
    val half = period / 2; val dhalf = dur / 2
    var i = 0
    while (i < t.length) {
      val m = (t(i) - epoch + half) % period
      val ph = (if (m < 0) m + period else m) - half
      out(i) = if (math.abs(ph) < dhalf) 1.0 - depth else 1.0
      i += 1
    }
    out
  }

  /** Gaussian log-likelihood of data vs model (ref retr_llik_mile
    * main.py:735–850, white-noise branch). */
  def gaussianLogLik(y: Array[Double], yerr: Array[Double], model: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < y.length) {
      val r = (y(i) - model(i)) / yerr(i)
      s += -0.5 * r * r - math.log(yerr(i))
      i += 1
    }
    s
  }
}
