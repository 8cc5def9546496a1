package graft.model

/** T13h fidelity core — eccentric Keplerian radial-velocity model
  * (ref: `retr_rvel` takes the companion's eccentricity and argument
  * of periastron — call site main.py:646–647, model main.py:644–647;
  * the prior consolidation defaults cover `ecce`, main.py:11543–11580
  * — t13f fits only the e = 0 circular slice). Public form:
  *
  *   M   = 2π·φ                      (mean anomaly; t_peri fixed at 0)
  *   E   : M = E − e·sin E           (Kepler's equation)
  *   cosν = (cos E − e)/(1 − e·cos E)
  *   sinν = √(1−e²)·sin E/(1 − e·cos E)
  *   RV  = γ + K·(cos(ν+ω) + e·cos ω)
  *       = γ + K·cos ω·(cosν + e) − K·sin ω·sinν
  *
  * Cross-engine exactness: libm sin/cos differ by ~1 ulp between
  * engines and the arguments here depend on WALKED parameters, so no
  * output-rounding margin is provable (the t15 trick doesn't apply).
  * Instead the DECLARED model replaces sin/cos with fixed-degree
  * TAYLOR POLYNOMIALS on the folded quadrant (degree 13 / 12 —
  * max error ≈ 6e-9 at the quadrant edge, far below the fixture
  * noise) and solves
  * Kepler's equation with a FIXED count of Newton steps from
  * E₀ = M. Every operation is IEEE ±×÷/√ with literal coefficients,
  * so Spark codegen, the Scala mirror, and the DuckDB replay produce
  * bit-identical doubles — the LimbDark discipline extended to a
  * transcendental model. The SQL is generated per layer (each Newton
  * step = named intermediate columns, nested subqueries in the
  * oracle's correlated llq) so no expression is textually exploded.
  */
object Kepler {

  def D(x: Double): String = Sql.D(x)

  val PI: Double = 3.141592653589793
  val TWOPI: Double = 6.283185307179586
  val HALFPI: Double = 1.5707963267948966

  // Taylor coefficients (literals shared by all three mirrors)
  private val S3 = -1.0 / 6.0
  private val S5 = 1.0 / 120.0
  private val S7 = -1.0 / 5040.0
  private val S9 = 1.0 / 362880.0
  private val S11 = -1.0 / 39916800.0
  private val S13 = 1.0 / 6227020800.0
  private val C2 = -0.5
  private val C4 = 1.0 / 24.0
  private val C6 = -1.0 / 720.0
  private val C8 = 1.0 / 40320.0
  private val C10 = -1.0 / 3628800.0
  private val C12 = 1.0 / 479001600.0

  // ---------------------------------------------------------------
  // Scala mirror (op-for-op the SQL shapes below)
  // ---------------------------------------------------------------

  /** sin via quadrant folding + odd Taylor; x must lie in
    * (−π−0.75, 2π+0.75) — the range E/ω reach under the prior box. */
  def sinP(x: Double): Double = {
    val xn = if (x >= PI) x - TWOPI else if (x < -PI) x + TWOPI else x
    val r = if (xn > HALFPI) PI - xn else if (xn < -HALFPI) -PI - xn else xn
    val r2 = r * r
    r * (1.0 + r2 * (S3 + r2 * (S5 + r2 * (S7 + r2 * (S9 + r2 * (S11 + r2 * S13))))))
  }

  /** cos via quadrant folding + even Taylor (same domain as sinP). */
  def cosP(x: Double): Double = {
    val xn = if (x >= PI) x - TWOPI else if (x < -PI) x + TWOPI else x
    val r = if (xn > HALFPI) PI - xn else if (xn < -HALFPI) -PI - xn else xn
    val sg = if (xn > HALFPI || xn < -HALFPI) -1.0 else 1.0
    val r2 = r * r
    sg * (1.0 + r2 * (C2 + r2 * (C4 + r2 * (C6 + r2 * (C8 + r2 * (C10 + r2 * C12))))))
  }

  /** Eccentric anomaly: `steps` Newton iterations from E₀ = M (the
    * declared model — both engines run exactly this count). */
  def eccAnomaly(m: Double, e: Double, steps: Int = 8): Double = {
    var ek = m
    var k = 0
    while (k < steps) {
      ek = ek - (ek - e * sinP(ek) - m) / (1.0 - e * cosP(ek))
      k += 1
    }
    ek
  }

  /** The model: RV at mean anomaly `m` for p = (γ, K, e, ω). */
  def rv(m: Double, gamma: Double, kAmp: Double, e: Double,
         omega: Double, steps: Int = 8): Double = {
    val ee = eccAnomaly(m, e, steps)
    val se = sinP(ee); val ce = cosP(ee)
    val den = 1.0 - e * ce
    val cosNu = (ce - e) / den
    val sinNu = math.sqrt(1.0 - e * e) * se / den
    gamma + kAmp * cosP(omega) * (cosNu + e) - kAmp * sinP(omega) * sinNu
  }

  // ---------------------------------------------------------------
  // SQL layer shapes (Spark AND DuckDB dialects: CASE/sqrt/±×÷ only)
  // ---------------------------------------------------------------

  /** Normalized-angle fold: xn ∈ (−π, π]. */
  def xnSql(x: String): String =
    s"(CASE WHEN $x >= ${D(PI)} THEN $x - ${D(TWOPI)} " +
    s"WHEN $x < ${D(-PI)} THEN $x + ${D(TWOPI)} ELSE $x END)"

  /** Quadrant-folded argument r ∈ [−π/2, π/2]. */
  def rSql(xn: String): String =
    s"(CASE WHEN $xn > ${D(HALFPI)} THEN ${D(PI)} - $xn " +
    s"WHEN $xn < ${D(-HALFPI)} THEN ${D(-PI)} - $xn ELSE $xn END)"

  /** cos sign after folding. */
  def sgSql(xn: String): String =
    s"(CASE WHEN $xn > ${D(HALFPI)} OR $xn < ${D(-HALFPI)} " +
    s"THEN ${D(-1.0)} ELSE ${D(1.0)} END)"

  /** Odd Taylor from the folded argument and its square. */
  def sinPolySql(r: String, r2: String): String =
    s"($r * (1.0 + $r2 * (${D(S3)} + $r2 * (${D(S5)} + $r2 * (${D(S7)} " +
    s"+ $r2 * (${D(S9)} + $r2 * (${D(S11)} + $r2 * ${D(S13)})))))))"

  /** Even Taylor (multiply by the fold sign). */
  def cosPolySql(sg: String, r2: String): String =
    s"($sg * (1.0 + $r2 * (${D(C2)} + $r2 * (${D(C4)} + $r2 * (${D(C6)} " +
    s"+ $r2 * (${D(C8)} + $r2 * (${D(C10)} + $r2 * ${D(C12)})))))))"

  /** One Newton step: e_{k+1} from (e_k, sin e_k, cos e_k, e, m). */
  def newtonSql(ek: String, sk: String, ck: String, e: String,
                m: String): String =
    s"($ek - ($ek - $e * $sk - $m) / (1.0 - $e * $ck))"

  /** The RV closing layer from (sE, cE, e, ω-trig, γ, K). */
  def rvSql(se: String, ce: String, e: String, so: String, co: String,
            gamma: String, kAmp: String): String =
    s"($gamma + $kAmp * $co * (($ce - $e) / (1.0 - $e * $ce) + $e) " +
    s"- $kAmp * $so * (sqrt(1.0 - $e * $e) * $se / (1.0 - $e * $ce)))"

  /** Nested-subquery expansion of the WHOLE model for contexts that
    * can't chain named layers across statements (the oracle's
    * correlated llq): starting from an inner SELECT exposing columns
    * `$m` (mean anomaly) plus whatever `carry` columns must survive,
    * wraps `steps` Newton iterations (3 sub-layers each) and a
    * closing ω-trig + RV layer exposing the model as column `rv`.
    * `gamma/kAmp/e/omega` are SQL expressions constant per proposal
    * (outer-scope correlated references are fine in DuckDB). */
  def rvNestedSql(innerSelect: String, m: String, carry: Seq[String],
                  gamma: String, kAmp: String, e: String, omega: String,
                  steps: Int = 8): String = {
    val keep = (carry :+ m).mkString(", ")
    var q = s"SELECT $keep, $m AS ek FROM ($innerSelect) k0"
    for (k <- 1 to steps) {
      // layer A: fold e_k
      q = s"SELECT $keep, ek, ${xnSql("ek")} AS xn FROM ($q) a$k"
      // layer B: folded arg, square, sign
      q = s"SELECT $keep, ek, ${rSql("xn")} AS r, ${sgSql("xn")} AS sg FROM ($q) b$k"
      q = s"SELECT $keep, ek, r, sg, r * r AS r2 FROM ($q) c$k"
      // layer C: trig + Newton update
      q = s"SELECT $keep, ${newtonSql("ek", sinPolySql("r", "r2"),
        cosPolySql("sg", "r2"), e, m)} AS ek FROM ($q) d$k"
    }
    // closing layer: E's trig, ω's trig, the RV
    q = s"SELECT $keep, ek, ${xnSql("ek")} AS xn, ${xnSql(omega)} AS oxn FROM ($q) e0"
    q = s"SELECT $keep, ${rSql("xn")} AS r, ${sgSql("xn")} AS sg, " +
      s"${rSql("oxn")} AS orr, ${sgSql("oxn")} AS osg FROM ($q) e1"
    q = s"SELECT $keep, r, sg, r * r AS r2, orr, osg, orr * orr AS or2 FROM ($q) e2"
    q = s"SELECT $keep, ${sinPolySql("r", "r2")} AS se, ${cosPolySql("sg", "r2")} AS ce, " +
      s"${sinPolySql("orr", "or2")} AS so, ${cosPolySql("osg", "or2")} AS co FROM ($q) e3"
    s"SELECT $keep, ${rvSql("se", "ce", e, "so", "co", gamma, kAmp)} AS rv FROM ($q) e4"
  }
}
