package graft.model

/** T12/T13 fidelity core — quadratic limb-darkened transit model (the
  * reference's physical model is `ephesos.eval_modl`, ref
  * main.py:497–528, a limb-darkened occultation light curve; every
  * fit in `init()` main.py:12178–12330 evaluates it). Public form:
  * the Mandel & Agol (2002) SMALL-PLANET approximation for quadratic
  * limb darkening I(μ) = 1 − u1(1−μ) − u2(1−μ)², μ = √(1−r²), with
  * the standard linear-overlap ("LD trapezoid") ingress/egress ramp —
  * the declared model is:
  *
  *   z(φ)  = √(b² + ((1+p)² − b²)·(φ/(T14/2))²)   |φ| < T14/2
  *   lam   = 1                    z ≤ 1−p   (fully inside)
  *         = (1+p−z)/(2p)         1−p < z < 1+p (linear overlap)
  *   z_eff = min(z, 1−p);  μ = √(max(0, 1−z_eff²))
  *   F     = 1 − (p²·I(μ)/Ω4)·lam,   Ω4 = 1 − u1/3 − u2/6
  *
  * with p the planet/star radius ratio, b the impact parameter, T14
  * the total (first-to-fourth-contact) duration, and φ the centered
  * phase in days. Parametrizing z by (b, T14) instead of (a/R★, i)
  * is the standard duration-parametrized transit form; it keeps the
  * whole model inside IEEE +−×÷ / √ / min / max — every op is
  * correctly rounded and therefore bit-identical across engines, so
  * the DuckDB oracle replays the model (and the t13d MCMC that fits
  * it) with NO quantization of the model itself. The ONE discipline
  * needed is identical expression SHAPES: the SQL below is the
  * source of truth, generated per layer and composed by textual
  * substitution, and [[flux]] mirrors it op for op.
  *
  * b is a fixed model constant here; u1, u2 are constants in THIS
  * object's shapes (t12d/t13d/t13e) and walk dimensions in the
  * parametrized shapes below (t13g fits them — the reference
  * registers coeflmdklinr/coeflmdkquad via setp_para). The
  * small-planet factorization itself is closed by t12e
  * (model/LimbDarkExact.scala), which integrates the exact overlap
  * integrand and measures this form's error at 8.4e-3 for p = 0.25.
  */
object LimbDark {

  /** Fixed geometry/LD constants: impact parameter and quadratic LD
    * coefficients (u1, u2 of a solar-ish star). */
  val B = 0.3
  val U1 = 0.4
  val U2 = 0.25

  /** Disk-integrated intensity norm Ω4 = 1 − u1/3 − u2/6. */
  val OM4: Double = 1.0 - U1 / 3.0 - U2 / 6.0

  /** Ω4 / I(μ_b): converts an observed central depth to p² (used by
    * the walker-ball initial guess: p0 = √(depth·KK)). */
  val KK: Double = {
    val mu = math.sqrt(1.0 - B * B)
    OM4 / (1.0 - U1 * (1.0 - mu) - U2 * ((1.0 - mu) * (1.0 - mu)))
  }

  /** Double literal, explicit CAST so neither engine parses it as
    * DECIMAL (Scala's Double.toString round-trips exactly). */
  def D(x: Double): String = Sql.D(x)

  // ---------------------------------------------------------------
  // per-layer SQL shapes — valid in BOTH the Spark and DuckDB
  // dialects (CASE/abs/sqrt/LEAST/GREATEST only). Compose them as
  // named columns (Spark withColumn / DuckDB CTE layers) or inline
  // via [[fluxInlineSql]]; both spell the identical arithmetic DAG.
  // ---------------------------------------------------------------

  /** Half-duration phase ratio: hu = aph / (T14·0.5); |hu| ≥ 1 is out
    * of transit. `aph` must be the ABSOLUTE centered phase in days. */
  def huSql(aph: String, tt: String): String = s"$aph / ($tt * 0.5)"

  /** Normalized separation z(hu). */
  def zSql(hu: String, pp: String): String =
    s"sqrt(${D(B)} * ${D(B)} + ((1.0 + $pp) * (1.0 + $pp) - ${D(B)} * ${D(B)}) * ($hu * $hu))"

  /** Linear overlap fraction lam(z). */
  def lamSql(z: String, pp: String): String =
    s"(CASE WHEN $z <= 1.0 - $pp THEN ${D(1.0)} ELSE (1.0 + $pp - $z) / (2.0 * $pp) END)"

  /** μ at z_eff = min(z, 1−p). */
  def muSql(z: String, pp: String): String =
    s"sqrt(GREATEST(${D(0.0)}, 1.0 - LEAST($z, 1.0 - $pp) * LEAST($z, 1.0 - $pp)))"

  /** Quadratic-LD intensity I(μ). */
  def izSql(mu: String): String =
    s"(1.0 - ${D(U1)} * (1.0 - $mu) - ${D(U2)} * ((1.0 - $mu) * (1.0 - $mu)))"

  /** The flux: out-of-transit guard + LD dip. */
  def fluxSql(hu: String, pp: String, iz: String, lam: String): String =
    s"(CASE WHEN $hu >= 1.0 THEN ${D(1.0)} ELSE 1.0 - (($pp * $pp) * $iz / ${D(OM4)}) * $lam END)"

  /** Full single-expression expansion (for contexts that can't name
    * intermediates, e.g. the correlated llq subquery in the t13d
    * oracle) — built by substituting the SAME layer strings, so the
    * arithmetic DAG is identical to the layered form. */
  def fluxInlineSql(aph: String, pp: String, tt: String): String = {
    val hu = s"(${huSql(aph, tt)})"
    val z = s"(${zSql(hu, pp)})"
    fluxSql(hu, pp, izSql(muSql(z, pp)), lamSql(z, pp))
  }

  // ---------------------------------------------------------------
  // r9: PARAMETRIZED-LD shapes — u1/u2 as SQL expressions instead of
  // baked constants, for fits that walk the LD coefficients
  // themselves (the reference registers coeflmdklinr/coeflmdkquad as
  // fit parameters via setp_para, ref main.py:440–447, 3821–3831 —
  // t13g). The constant-LD shapes above are left byte-identical: the
  // t12d/t13d/t13e oracles replay THOSE strings.
  // ---------------------------------------------------------------

  /** Quadratic-LD intensity I(μ) with u1/u2 free. */
  def izSqlU(mu: String, u1: String, u2: String): String =
    s"(1.0 - $u1 * (1.0 - $mu) - $u2 * ((1.0 - $mu) * (1.0 - $mu)))"

  /** Disk-integrated norm Ω4(u1, u2) = 1 − u1/3 − u2/6. */
  def om4SqlU(u1: String, u2: String): String =
    s"(1.0 - $u1 / 3.0 - $u2 / 6.0)"

  /** Flux with u1/u2 free: out-of-transit guard + LD dip over the
    * parametrized norm. */
  def fluxSqlU(hu: String, pp: String, iz: String, lam: String,
               om4: String): String =
    s"(CASE WHEN $hu >= 1.0 THEN ${D(1.0)} ELSE 1.0 - (($pp * $pp) * $iz / $om4) * $lam END)"

  /** Full single-expression expansion with u1/u2 free — same
    * substitution composition as [[fluxInlineSql]]. */
  def fluxInlineSqlU(aph: String, pp: String, tt: String,
                     u1: String, u2: String): String = {
    val hu = s"(${huSql(aph, tt)})"
    val z = s"(${zSql(hu, pp)})"
    fluxSqlU(hu, pp, izSqlU(muSql(z, pp), u1, u2), lamSql(z, pp),
      om4SqlU(u1, u2))
  }

  /** Driver-side mirror of the parametrized shapes, op for op —
    * used by the t13g walker-loop likelihood. Same IEEE-exactness
    * argument as [[flux]]: ±×÷/√/min/max only. */
  def fluxU(aph: Double, p: Double, t14: Double,
            u1: Double, u2: Double): Double = {
    val hu = aph / (t14 * 0.5)
    if (hu >= 1.0) 1.0
    else {
      val z = math.sqrt(B * B + ((1.0 + p) * (1.0 + p) - B * B) * (hu * hu))
      val lam = if (z <= 1.0 - p) 1.0 else (1.0 + p - z) / (2.0 * p)
      val mu = math.sqrt(math.max(0.0, 1.0 - math.min(z, 1.0 - p) * math.min(z, 1.0 - p)))
      val iz = 1.0 - u1 * (1.0 - mu) - u2 * ((1.0 - mu) * (1.0 - mu))
      val om4 = 1.0 - u1 / 3.0 - u2 / 6.0
      1.0 - ((p * p) * iz / om4) * lam
    }
  }

  /** Driver-side mirror of the SQL shapes, op for op (same
    * parenthesization, same evaluation order) — used by the t13d
    * walker-loop likelihood. sqrt/min/max/±×÷ are all IEEE
    * correctly-rounded, so this produces the bit-identical double the
    * SQL produces for the same (aph, p, t14). */
  def flux(aph: Double, p: Double, t14: Double): Double = {
    val hu = aph / (t14 * 0.5)
    if (hu >= 1.0) 1.0
    else {
      val z = math.sqrt(B * B + ((1.0 + p) * (1.0 + p) - B * B) * (hu * hu))
      val lam = if (z <= 1.0 - p) 1.0 else (1.0 + p - z) / (2.0 * p)
      val mu = math.sqrt(math.max(0.0, 1.0 - math.min(z, 1.0 - p) * math.min(z, 1.0 - p)))
      val iz = 1.0 - U1 * (1.0 - mu) - U2 * ((1.0 - mu) * (1.0 - mu))
      1.0 - ((p * p) * iz / OM4) * lam
    }
  }
}
