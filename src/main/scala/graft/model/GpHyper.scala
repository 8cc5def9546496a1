package graft.model

/** T13l fidelity core — GP-baseline HYPERPARAMETERS join the MCMC
  * walk (the one reference inference surface t13c left fixed): when
  * `typemodlblinshap == 'GaussianProcess'` the reference REGISTERS
  * `sigmgprobase`/`rhoogprobase` as sampled parameters — pulled from
  * the parameter vector per likelihood call
  * (/root/reference/miletos/main.py:320–322, registered at
  * main.py:4588–4594) — and REBUILDS the Matérn-3/2 kernel from them
  * on every call (setp_gpro main.py:716, called from retr_llik_mile's
  * GP branch at main.py:778). t13c fits under the GP likelihood with
  * FIXED hyperparameters; here (σ_gp, ρ_gp) walk jointly with the
  * transit parameters.
  *
  * The likelihood keeps t13c's declared form — the steady-state
  * Kalman innovation filter of the Matérn-3/2 state space on the
  * uniform 200-bin grid (Detrend.gpInnovSteady's derivation) — but
  * since the hyperparameters are now WALKED, the lag weights, the
  * innovation variance S, and the log-det term must be recomputed
  * PER PROPOSAL by both engines identically:
  *
  *   - exp(−λ·dt) with λ = √3/ρ of a walked ρ goes through
  *     [[Flare.expNegCore]] (range-reduce /64 + degree-7 Taylor + 6
  *     squarings — IEEE ±×÷ only, the r10 t13k reduction);
  *   - the predicted-covariance Riccati recursion runs a FIXED
  *     [[NIter]] = 48 iterations (geometric convergence; fully
  *     converged for ρ ≲ 0.8 d where the posterior lives, and for
  *     larger ρ the declared likelihood IS the 48-iteration filter —
  *     both engines agree bit-for-bit by construction);
  *   - [[NLags]] = 40 lag weights follow by the same 2×2 power
  *     iteration as gpInnovSteady, quantized per proposal at 1e6;
  *   - the log-det term −(N/2)·ln(S) — proposal-DEPENDENT now, it no
  *     longer cancels in the accept ratio — uses [[Ensemble.lnQ6]]
  *     (libm ln quantized to micro-nats with the proven ≤1-ulp
  *     rounding margin, the same discipline as the sampler's accept
  *     draws).
  *
  * Every layer is spelled once as SQL (valid in BOTH dialects) and
  * mirrored op-for-op in [[weights]]; GpHyperSpec bit-compares the
  * two over a (σ, ρ) grid spanning the prior box.
  */
object GpHyper {

  import Sql.D

  /** Uniform fold-bin spacing (days): 200 bins over the 7-day fold. */
  val DT: Double = 7.0 / 200
  /** √3 as a shared literal (IEEE sqrt is correctly rounded, but a
    * literal keeps both engines trivially identical). */
  val SQRT3: Double = math.sqrt(3.0)
  /** Fixed measurement-noise variance R = (4e-4)² — the reference
    * treats per-point errors as data, not parameters. */
  val RV: Double = 4e-4 * 4e-4
  /** Fixed Riccati iteration count (the declared filter). */
  val NIter = 48
  /** Innovation-filter lag truncation (t13c used 32 at ρ=0.15; the
    * walked box reaches ρ=1.2 where decay per lag is slower, so 40). */
  val NLags = 40

  private val DTL = D(DT)
  private val RVL = D(RV)

  // ---------------------------------------------------------------
  // Scala mirror of the declared per-proposal chain
  // ---------------------------------------------------------------

  /** (lag weights w_1..w_NLags, steady innovation variance S) for
    * walked (σ, ρ) — op-for-op the SQL layers of [[chainSql]]. */
  def weights(sigma: Double, rho: Double): (Array[Double], Double) = {
    val lam = SQRT3 / rho
    val x = lam * DT
    val e = Flare.expNegCore(x)
    val a00 = e * (1.0 + lam * DT); val a01 = e * DT
    val a10 = -e * lam * lam * DT; val a11 = e * (1.0 - lam * DT)
    val p11 = sigma * sigma
    val p22 = (sigma * sigma) * lam * lam
    val q00 = p11 - (a00 * (a00 * p11) + a01 * (a01 * p22))
    val q01 = -(a10 * (a00 * p11) + a11 * (a01 * p22))
    val q11 = p22 - (a10 * (a10 * p11) + a11 * (a11 * p22))
    var c00 = p11; var c01 = 0.0; var c11 = p22
    var it = 0
    while (it < NIter) {
      val pc00 = (1.0 - c00 / (c00 + RV)) * c00
      val pc01 = (1.0 - c00 / (c00 + RV)) * c01
      val pc11 = c11 - (c01 / (c00 + RV)) * c01
      val n00 = (a00 * pc00 + a01 * pc01) * a00 + (a00 * pc01 + a01 * pc11) * a01 + q00
      val n01 = (a00 * pc00 + a01 * pc01) * a10 + (a00 * pc01 + a01 * pc11) * a11 + q01
      val n11 = (a10 * pc00 + a11 * pc01) * a10 + (a10 * pc01 + a11 * pc11) * a11 + q11
      c00 = n00; c01 = n01; c11 = n11
      it += 1
    }
    val sInn = c00 + RV
    val k0 = c00 / sInn; val k1 = c01 / sInn
    val at00 = (1.0 - k0) * a00; val at01 = (1.0 - k0) * a01
    val at10 = a10 - k1 * a00; val at11 = a11 - k1 * a01
    var v0 = k0; var v1 = k1
    val w = new Array[Double](NLags)
    var l = 0
    while (l < NLags) {
      w(l) = a00 * v0 + a01 * v1
      val nv0 = at00 * v0 + at01 * v1; val nv1 = at10 * v0 + at11 * v1
      v0 = nv0; v1 = nv1
      l += 1
    }
    (w, sInn)
  }

  /** Integer micro-nat GP marginal log-likelihood with WALKED
    * hyperparameters, p = (depth, epoch, dur, σ_gp, ρ_gp):
    *   −Σ_i round(ν_i²·1e6/(2S)) − (N/2)·lnQ6(S)
    * with ν from the per-proposal 40-lag filter on integer residuals
    * (the gpBoxLlq shape; all int64 bounds re-derived in the t13l
    * query comment). N = 200 bins, so the log-det multiplier is the
    * literal 100 in both engines. */
  def llq(t: Array[Double], y: Array[Double], period: Double)
         (p: Array[Double]): Long = {
    import graft.expr.VecExprs.roundHalfAway
    val (w, sInn) = weights(p(3), p(4))
    val cq = new Array[Long](NLags)
    var l = 0
    while (l < NLags) { cq(l) = roundHalfAway(w(l) * 1e6); l += 1 }
    val scale = 1e6 / (2 * sInn)
    val ldq = Ensemble.lnQ6(sInn)
    val model = Ensemble.boxModel(t, p(1), period, p(2), p(0))
    val n = y.length
    val rq = new Array[Long](n)
    var i = 0
    while (i < n) { rq(i) = roundHalfAway((y(i) - model(i)) * 1e8); i += 1 }
    var s = 0L
    i = 0
    while (i < n) {
      var nuq = rq(i) * 1000000L
      var lg = 1
      while (lg <= NLags && lg <= i) { nuq -= cq(lg - 1) * rq(i - lg); lg += 1 }
      val nu = nuq.toDouble / 1e14
      s += roundHalfAway(nu * nu * scale)
      i += 1
    }
    -(s + 100L * ldq)
  }

  // ---------------------------------------------------------------
  // SQL layer chain (both dialects; ±×÷/CASE + one guarded ln)
  // ---------------------------------------------------------------

  /** Nested-subquery expansion of [[weights]]: wraps `inner` (which
    * must expose DOUBLE columns `sg`, `rho` plus `keep`) with the
    * reduction/Riccati/power-iteration layers, exposing `sinn` and
    * `w1`..`w{NLags}`. One copy of text; engines evaluate it per
    * proposal row. */
  def chainSql(inner: String, keep: Seq[String]): String = {
    def ks(extra: String*) = (keep ++ extra).mkString(", ")
    var q = s"SELECT ${ks("sg", "rho")}, ${D(SQRT3)} / rho AS lam FROM ($inner) gh0"
    q = s"SELECT ${ks("sg", "lam")}, lam * $DTL AS x FROM ($q) gh1"
    q = Flare.expNegNestedSql(q, "x", keep ++ Seq("sg", "lam"))
    q = s"SELECT ${ks("sg", "lam")}, g * (${D(1.0)} + lam * $DTL) AS a00, " +
      s"g * $DTL AS a01, -g * lam * lam * $DTL AS a10, " +
      s"g * (${D(1.0)} - lam * $DTL) AS a11 FROM ($q) gha"
    val as = Seq("a00", "a01", "a10", "a11")
    q = s"SELECT ${ks(as: _*)}, sg * sg AS p11, " +
      s"(sg * sg) * lam * lam AS p22 FROM ($q) ghp"
    q = s"SELECT ${ks(as: _*)}, p11, p22, " +
      s"p11 - (a00 * (a00 * p11) + a01 * (a01 * p22)) AS q00, " +
      s"-(a10 * (a00 * p11) + a11 * (a01 * p22)) AS q01, " +
      s"p22 - (a10 * (a10 * p11) + a11 * (a11 * p22)) AS q11 FROM ($q) ghq"
    val aq = as ++ Seq("q00", "q01", "q11")
    q = s"SELECT ${ks(aq: _*)}, p11 AS c00, ${D(0.0)} AS c01, p22 AS c11 " +
      s"FROM ($q) ghi"
    var it = 0
    while (it < NIter) {
      q = s"SELECT ${ks(aq: _*)}, " +
        s"(${D(1.0)} - c00 / (c00 + $RVL)) * c00 AS pc00, " +
        s"(${D(1.0)} - c00 / (c00 + $RVL)) * c01 AS pc01, " +
        s"c11 - (c01 / (c00 + $RVL)) * c01 AS pc11 FROM ($q) ra$it"
      q = s"SELECT ${ks(aq: _*)}, " +
        s"(a00 * pc00 + a01 * pc01) * a00 + (a00 * pc01 + a01 * pc11) * a01 + q00 AS c00, " +
        s"(a00 * pc00 + a01 * pc01) * a10 + (a00 * pc01 + a01 * pc11) * a11 + q01 AS c01, " +
        s"(a10 * pc00 + a11 * pc01) * a10 + (a10 * pc01 + a11 * pc11) * a11 + q11 AS c11 " +
        s"FROM ($q) rb$it"
      it += 1
    }
    q = s"SELECT ${ks(as: _*)}, c00, c01, c00 + $RVL AS sinn FROM ($q) ghs"
    q = s"SELECT ${ks(as: _*)}, sinn, c00 / sinn AS k0, c01 / sinn AS k1 " +
      s"FROM ($q) ghk"
    q = s"SELECT ${ks("a00", "a01", "sinn")}, " +
      s"(${D(1.0)} - k0) * a00 AS at00, (${D(1.0)} - k0) * a01 AS at01, " +
      s"a10 - k1 * a00 AS at10, a11 - k1 * a01 AS at11, " +
      s"k0 AS v0, k1 AS v1 FROM ($q) ghv"
    val wbase = Seq("a00", "a01", "at00", "at01", "at10", "at11", "sinn")
    // Alternate (v0,v1)/(u0,u1) write aliases so no layer's SELECT
    // list shadows a column it also reads — both engines resolved
    // the shadowed form to the FROM column, but that's dialect luck,
    // not SQL semantics (mirrors the Scala nv0/nv1 temporaries).
    var c0 = "v0"; var c1 = "v1"
    var l = 1
    while (l <= NLags) {
      val ws = (1 until l).map(j => s"w$j")
      val (n0, n1) = if (c0 == "v0") ("u0", "u1") else ("v0", "v1")
      q = s"SELECT ${ks(wbase ++ ws: _*)}, a00 * $c0 + a01 * $c1 AS w$l, " +
        s"at00 * $c0 + at01 * $c1 AS $n0, at10 * $c0 + at11 * $c1 AS $n1 " +
        s"FROM ($q) wl$l"
      c0 = n0; c1 = n1
      l += 1
    }
    s"SELECT ${ks(("sinn" +: (1 to NLags).map(j => s"w$j")): _*)} FROM ($q) ghw"
  }

  // ---------------------------------------------------------------
  // Fixture injection (driver-side literals — libm is fine here: the
  // weights ship verbatim to both engines, the t12e literal-table
  // discipline)
  // ---------------------------------------------------------------

  /** Truncated-MA(L) synthesis weights for a stationary Matérn-3/2
    * realization on the uniform bin grid: the state-space output
    *   g_i = Σ_{l≥0} e₀ᵀ Aˡ L_chol u_{i−l},  u 2-dim unit white,
    * truncated at `nLags` and quantized so the fixture is an INTEGER
    * closed form. Returns (αq_l, βq_l) in 1e-9 flux units per
    * centered draw dc ∈ {−999..999} (dc = 2·lcg − 999, std
    * √((10⁶−1)/3)); the injected process std is ≈ `sigma`. */
  def injectionWeights(sigma: Double, rho: Double,
                       nLags: Int): Array[(Long, Long)] = {
    import graft.expr.VecExprs.roundHalfAway
    val lam = math.sqrt(3.0) / rho
    val s2 = sigma * sigma
    val p11 = s2; val p22 = s2 * lam * lam
    val e = math.exp(-lam * DT)
    val a00 = e * (1 + lam * DT); val a01 = e * DT
    val a10 = -e * lam * lam * DT; val a11 = e * (1 - lam * DT)
    val q00 = p11 - (a00 * (a00 * p11) + a01 * (a01 * p22))
    val q01 = -(a10 * (a00 * p11) + a11 * (a01 * p22))
    val q11 = p22 - (a10 * (a10 * p11) + a11 * (a11 * p22))
    val l11 = math.sqrt(q00)
    val l21 = q01 / l11
    val l22 = math.sqrt(math.max(q11 - l21 * l21, 0.0))
    val dstd = math.sqrt((1e6 - 1.0) / 3.0)
    var m00 = l11; var m01 = 0.0; var m10 = l21; var m11 = l22
    val out = new Array[(Long, Long)](nLags)
    var l = 0
    while (l < nLags) {
      out(l) = (roundHalfAway(m00 / dstd * 1e9), roundHalfAway(m01 / dstd * 1e9))
      val n00 = a00 * m00 + a01 * m10; val n01 = a00 * m01 + a01 * m11
      val n10 = a10 * m00 + a11 * m10; val n11 = a10 * m01 + a11 * m11
      m00 = n00; m01 = n01; m10 = n10; m11 = n11
      l += 1
    }
    out
  }

  /** The injected wiggle at bin `b` (exact int64):
    *   wigq(b) = Σ_l αq_l·dc₁((b−l) mod 200) + βq_l·dc₂((b−l) mod 200)
    * with dcₛ(x) = 2·(Ensemble.draw(seedₛ, x) mod 1000) − 999 — the
    * sampler's 2-round LCG+xorshift draw (a t13c-style single-round
    * LCG has lag-1 serial correlation −0.29, which distorts the
    * injected covariance; measured in GpHyperSpec). Circular indexing
    * keeps the process stationary on the 200-bin fold. The 200 values
    * ship to BOTH engines as quantized literals (the t13h/t13i
    * "fixture is data" discipline), so no draw arithmetic crosses
    * engines. */
  def wigQ(b: Long, wq: Array[(Long, Long)]): Long = {
    var s = 0L; var l = 0
    while (l < wq.length) {
      val x = (b + (200 - l)) % 200
      def dc(seed: Long): Long = 2 * (Ensemble.draw(seed, x) % 1000L) - 999
      s += wq(l)._1 * dc(77777L) + wq(l)._2 * dc(99999L)
      l += 1
    }
    s
  }
}
