package graft.model

/** T12e — the quadratic-LD occultation WITHOUT the small-planet
  * approximation (the last model-fidelity gap the r9 verdict names:
  * the reference's `ephesos.eval_modl` with typelmdk='quadkipp', ref
  * main.py:511, is the exact quadratic form; LimbDark.scala documents
  * its small-planet factorization I(μ(z))·lam as an approximation).
  *
  * DECLARED MODEL: the exact overlap integral
  *
  *   deficit(z, p) = ∫₀¹ I(r) · (α(r)/π) · 2r dr,
  *   α(r) = π                    r ≤ p − z        (annulus swallowed)
  *        = 0                    r ≤ z − p or r ≥ z + p
  *        = acos((z²+r²−p²)/(2zr)) otherwise       (partial arc)
  *   F = 1 − deficit/Ω4
  *
  * evaluated as: the closed-form antiderivative A(r) over the
  * fully-covered inner disk r < p − z, plus a FIXED 256-node midpoint
  * quadrature over the partial band [|z−p|, min(1, z+p)] (interior
  * error O(h²); the √-type band edges dominate at O(h^1.5), measured
  * worst ≈ 1e-5 at p = 0.45 — 20× below the binned fixture
  * noise; the node contributions are quantized at 1e-12 and summed
  * as integers so the Σ is order-free). The published analytic form
  * (Mandel & Agol 2002) evaluates the same integral via elliptic
  * integrals; this declared quadrature of the same integrand is
  * validated in LimbDarkExactSpec against an independent 20 000-node
  * reference integration — measured worst |Δ| ≈ 1e-5 (at p = 0.45,
  * the widest band) — ~800× inside the gap to the small-planet form
  * it replaces (measured 8.4e-3 at p = 0.25).
  *
  * Cross-engine exactness: acos is libm — banned at eval time — so
  * the declared model uses acos(x) = 2·atan(√((1−x)/(1+x))) with
  * atan by an 8-segment LITERAL-TABLE reduction (constants
  * atan(i/8) computed once driver-side and shared verbatim with the
  * oracle — the harmBasis principle) plus a degree-7 Taylor tail
  * (|d| ≤ 1/16 ⇒ error ≲ 2e-12). Everything else is IEEE ±×÷/√ with
  * identical expression shapes, so raw doubles replay bit-for-bit.
  */
object LimbDarkExact {
  import LimbDark.{B, U1, U2, OM4, D}

  val PI: Double = 3.141592653589793
  val HALFPI: Double = 1.5707963267948966
  val N = 256

  /** Literal atan table: c(i) = atan(i/8), i = 0..8 — libm runs ONCE
    * here; both engines consume the same literals. */
  lazy val AtanC: IndexedSeq[Double] = (0 to 8).map(i => math.atan(i / 8.0))

  private val AT3 = -1.0 / 3.0
  private val AT5 = 0.2
  private val AT7 = -1.0 / 7.0

  // ---------------------------------------------------------------
  // Scala mirror
  // ---------------------------------------------------------------

  /** atan on [0, 1] via the literal-table reduction. */
  private def atan01(x: Double): Double = {
    val i = graft.expr.VecExprs.roundHalfAway(x * 8.0).toInt
    val ti = i.toDouble / 8.0
    val d = (x - ti) / (1.0 + x * ti)
    val d2 = d * d
    AtanC(i) + d * (1.0 + d2 * (AT3 + d2 * (AT5 + d2 * AT7)))
  }

  /** atan for x ≥ 0 (any magnitude). */
  def atanP(x: Double): Double =
    if (x > 1.0) HALFPI - atan01(1.0 / x) else atan01(x)

  /** acos on (−1, 1] via the half-angle identity. */
  def acosP(x: Double): Double =
    2.0 * atanP(math.sqrt((1.0 - x) / (1.0 + x)))

  /** Closed-form ∫₀^r I(s)·2s ds for the quadratic LD law
    * (A(1) = Ω4). */
  def aInner(r: Double): Double = {
    val mu3 = {
      val m = math.sqrt(math.max(0.0, 1.0 - r * r)); m * m * m
    }
    (1.0 - U1 - U2) * r * r + (U1 + 2.0 * U2) * (2.0 / 3.0) * (1.0 - mu3) -
      U2 * (r * r - r * r * r * r / 2.0)
  }

  /** The exact-model flux at normalized separation z (planet/star
    * ratio p), by the declared inner-disk + N-node band quadrature.
    * Matches the SQL shapes op for op. */
  def flux(z: Double, p: Double): Double = fluxN(z, p, N)

  /** [[flux]] with the node count a parameter — t13i's FIT model runs
    * the same shapes at a declared coarser band (NFit = 64: worst
    * |Δ| vs the analytic form scales as (256/n)^1.5 off t12e's
    * measured 1e-5 ⇒ ~8e-5 at 64 — still 5× under the binned fixture
    * noise and ~100× inside the small-planet error the fit removes)
    * so the per-proposal quadrature stays oracle-replayable at MCMC
    * volume. */
  def fluxN(z: Double, p: Double, n: Int): Double = {
    if (z >= 1.0 + p) 1.0
    else {
      val rin = math.max(0.0, p - z)
      val ain = aInner(rin)
      val rlo = math.abs(z - p)
      val rhi = math.min(1.0, z + p)
      val w = (rhi - rlo) / n
      var sq = 0L
      var j = 0
      while (j < n) {
        val r = rlo + (j + 0.5) * w
        val x0 = (z * z + r * r - p * p) / (2.0 * z * r)
        val x = math.min(1.0, math.max(-1.0, x0))
        val alpha = acosP(x)
        val mu = math.sqrt(math.max(0.0, 1.0 - r * r))
        val iz = 1.0 - U1 * (1.0 - mu) - U2 * ((1.0 - mu) * (1.0 - mu))
        val c = iz * (alpha / PI) * 2.0 * r * w
        sq += graft.expr.VecExprs.roundHalfAway(c * 1e12)
        j += 1
      }
      1.0 - (ain + sq.toDouble / 1e12) / OM4
    }
  }

  /** Duration-parametrized wrapper (the t12d z-chain): aph in days,
    * p, T14. */
  def fluxAph(aph: Double, p: Double, t14: Double): Double =
    fluxAphN(aph, p, t14, N)

  /** [[fluxAph]] at a parametrized node count (the t13i fit model). */
  def fluxAphN(aph: Double, p: Double, t14: Double, n: Int): Double = {
    val hu = aph / (t14 * 0.5)
    if (hu >= 1.0) 1.0
    else {
      val z = math.sqrt(B * B + ((1.0 + p) * (1.0 + p) - B * B) * (hu * hu))
      fluxN(z, p, n)
    }
  }

  // ---------------------------------------------------------------
  // SQL layer shapes (both dialects; expects prior layers to have
  // named `hu`, `z`, `pp` like the t12d chain)
  // ---------------------------------------------------------------

  /** Per-(row × node) contribution layers, given columns z, pp and a
    * node index column `j` (0..N−1). Returns the SELECT fragments to
    * be chained as named layers:
    *  q1: rin/rlo/rhi/w;  q2: r;  q3: x (clamped);  q4: tq (the
    *  half-angle tangent), then the atan reduction, then qj (the
    *  1e-12-quantized integer contribution). */
  def q1Sql: Seq[(String, String)] = Seq(
    "rin" -> s"GREATEST(${D(0.0)}, pp - z)",
    "rlo" -> "abs(z - pp)",
    "rhi" -> s"LEAST(${D(1.0)}, z + pp)")

  def wSql: String = wSqlN(N)

  /** Band width at a parametrized node count — for n = N this is the
    * byte-identical t12e string (D(n.toDouble) round-trips). */
  def wSqlN(n: Int): String = s"(rhi - rlo) / ${D(n.toDouble)}"

  def rSql: String = "rlo + (CAST(j AS DOUBLE) + 0.5) * w"

  def xSql: String =
    s"LEAST(${D(1.0)}, GREATEST(${D(-1.0)}, (z * z + r * r - pp * pp) / (2.0 * z * r)))"

  /** Half-angle tangent t = √((1−x)/(1+x)). */
  def tqSql: String = "sqrt((1.0 - x) / (1.0 + x))"

  /** Reduced argument (into [0,1]) + flip flag. */
  def xrSql: String = s"(CASE WHEN tq > 1.0 THEN 1.0 / tq ELSE tq END)"
  def flipSql: String = "(tq > 1.0)"

  /** Table index ai = roundHalfAway(xr·8) — `round` is half-away in
    * BOTH engines for positive args. (Named `ai`, not `i`: the t12
    * grid index already owns `i`.) */
  def aiSql: String = "CAST(round(xr * 8.0) AS BIGINT)"

  /** The literal-table CASE c(ai). */
  def ciSql: String =
    "(CASE " + (0 to 8).map(i => s"WHEN ai = $i THEN ${D(AtanC(i))}").mkString(" ") +
      s" ELSE ${D(0.0)} END)"

  def dSql: String = "(xr - CAST(ai AS DOUBLE) / 8.0) / (1.0 + xr * (CAST(ai AS DOUBLE) / 8.0))"

  def atSql: String =
    s"ci + d * (1.0 + (d * d) * (${D(AT3)} + (d * d) * (${D(AT5)} + (d * d) * ${D(AT7)})))"

  def alphaSql: String =
    s"2.0 * (CASE WHEN flip THEN ${D(HALFPI)} - atv ELSE atv END)"

  /** Node contribution, 1e-12-quantized integer. Guarded on w > 0:
    * out-of-transit rows (z ≥ 1+p ⇔ hu ≥ 1 ⇔ w ≤ 0) would feed NaN
    * into the cast (both engines error on CAST(NaN AS BIGINT)); the
    * closing flux CASE discards them anyway, so they contribute 0. */
  def qjSql: String = {
    val mu = s"sqrt(GREATEST(${D(0.0)}, 1.0 - r * r))"
    val iz = s"(1.0 - ${D(U1)} * (1.0 - $mu) - ${D(U2)} * ((1.0 - $mu) * (1.0 - $mu)))"
    s"(CASE WHEN w > 0.0 THEN " +
      s"CAST(round($iz * (alpha / ${D(PI)}) * 2.0 * r * w * 1e12) AS BIGINT) " +
      s"ELSE CAST(0 AS BIGINT) END)"
  }

  /** Closed-form inner-disk integral A(rin) (layer after q1). */
  def ainSql: String = {
    val mu = s"sqrt(GREATEST(${D(0.0)}, 1.0 - rin * rin))"
    s"(1.0 - ${D(U1)} - ${D(U2)}) * rin * rin + " +
      s"(${D(U1)} + 2.0 * ${D(U2)}) * (2.0 / 3.0) * (1.0 - $mu * $mu * $mu) - " +
      s"${D(U2)} * (rin * rin - rin * rin * rin * rin / 2.0)"
  }

  /** The closing flux from the grouped integer sum `sq` and `ain`. */
  def fluxSql(hu: String, ain: String, sq: String): String =
    s"(CASE WHEN $hu >= 1.0 THEN ${D(1.0)} " +
      s"ELSE 1.0 - ($ain + CAST($sq AS DOUBLE) / 1e12) / ${D(OM4)} END)"
}
