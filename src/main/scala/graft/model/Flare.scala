package graft.model

/** T13k fidelity core — the StarFlaring model fit (ref: the flare
  * model component main.py:362–382 — an amplitude × exponential-decay
  * light-curve term after the flare peak — registered through the
  * same `proc_modl` fitting machinery as the transit models,
  * main.py:4231, 4517–4518; the engine EVALUATES this model in t12
  * and DETECTS flares in t8/t9/st10 but never FITS one). Public form:
  *
  *   F(t) = 1 + A · exp(−(t − t0)/τ)   for t ≥ t0,   1 otherwise
  *
  * fitted over p = (A, t0, τ).
  *
  * Cross-engine exactness: exp is libm and its argument is WALKED, so
  * no output-rounding margin is provable (the Kepler.scala problem).
  * The DECLARED model replaces exp(−x) with range reduction +
  * fixed-degree Taylor + repeated squaring — all IEEE ±×÷:
  *
  *   exp(−x) ≡ (e^{−x/64})^64,  e^{−t} ≈ degree-7 Taylor on
  *   t ∈ [0, 0.625] (remainder ≤ t⁸/8! ≈ 5.8e-7), then 6 squarings
  *   (relative error amplified ×64 ⇒ ≤ ~7e-5 of a value ≤ 1 — with
  *   A ≤ 0.15 the worst model |Δ| is ~1e-5, far under the binned
  *   fixture noise). Arguments past x = 40 (exp(−40) ≈ 4e-18) are
  *   declared 0 by an explicit CASE, so the reduction domain stays
  *   bounded; both engines branch on the identical double.
  */
object Flare {

  def D(x: Double): String = Sql.D(x)

  // degree-7 Taylor coefficients of e^{-t} (literals shared by the
  // Scala mirror and both SQL dialects)
  private val C3 = -1.0 / 6.0
  private val C4 = 1.0 / 24.0
  private val C5 = -1.0 / 120.0
  private val E6 = 1.0 / 720.0
  private val E7 = -1.0 / 5040.0

  /** The unguarded reduction chain: e^{−x} for x ∈ [0, 40] (callers
    * apply the dt < 0 / x > 40 gates). Op-for-op the SQL layers. */
  def expNegCore(x: Double): Double = {
    val tq = x / 64.0
    val p = 1.0 + tq * (-1.0 + tq * (0.5 + tq * (C3 + tq * (C4 + tq *
      (C5 + tq * (E6 + tq * E7))))))
    val p2 = p * p
    val p4 = p2 * p2
    val p8 = p4 * p4
    val p16 = p8 * p8
    val p32 = p16 * p16
    p32 * p32
  }

  /** The model flux at time t for p = (A, t0, τ). */
  def flux(t: Double, a: Double, t0: Double, tau: Double): Double = {
    val dt = t - t0
    val xx = dt / tau
    1.0 + (if (dt < 0.0) 0.0 else if (xx > 40.0) 0.0 else a * expNegCore(xx))
  }

  // ---------------------------------------------------------------
  // SQL layer shapes (both dialects; ±×÷/CASE only)
  // ---------------------------------------------------------------

  def tqSql(x: String): String = s"($x / 64.0)"

  def pSql(tq: String): String =
    s"(1.0 + $tq * (-1.0 + $tq * (0.5 + $tq * (${D(C3)} + $tq * (${D(C4)} " +
    s"+ $tq * (${D(C5)} + $tq * (${D(E6)} + $tq * ${D(E7)})))))))"

  /** Nested-subquery expansion of exp(−x) for correlated-llq contexts
    * (the rvNestedSql pattern): wraps `innerSelect` (which must expose
    * column `$x` plus `carry`) with the reduction + 6 squaring layers,
    * exposing the unguarded value as column `g`. */
  def expNegNestedSql(innerSelect: String, x: String,
                      carry: Seq[String]): String = {
    val keep = (carry :+ x).mkString(", ")
    var q = s"SELECT $keep, ${tqSql(x)} AS tq FROM ($innerSelect) f0"
    q = s"SELECT $keep, ${pSql("tq")} AS p1 FROM ($q) f1"
    q = s"SELECT $keep, p1 * p1 AS p2 FROM ($q) f2"
    q = s"SELECT $keep, p2 * p2 AS p4 FROM ($q) f3"
    q = s"SELECT $keep, p4 * p4 AS p8 FROM ($q) f4"
    q = s"SELECT $keep, p8 * p8 AS p16 FROM ($q) f5"
    q = s"SELECT $keep, p16 * p16 AS p32 FROM ($q) f6"
    s"SELECT $keep, p32 * p32 AS g FROM ($q) f7"
  }
}
