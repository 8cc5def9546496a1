package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** T3 `bdtr_tser` full modes (ref main.py:6653–6904): per gap-delimited
  * region, fit a smooth baseline and divide/subtract it out.
  *
  * - 'medi'  : rolling median (window/aggregation path, see TsOps /
  *             t3_detrend_median — stays in whole-stage codegen).
  * - 'Spline': least-squares cubic smoothing per region
  *             (LSQUnivariateSpline analog, knots every `timescale`
  *             days, main.py:6834–6891).
  * - 'GaussianProcess': Matérn-3/2 GP posterior mean via its exact
  *             state-space (Kalman) form — O(n) like celerite
  *             (main.py:6797–6833), no O(n³) dense solve.
  *
  * Regions are group-local and bounded (a few ×10⁴ rows — one TESS
  * sector), so the kernels run per-group inside `flatMapGroups`: the
  * shuffle key is (chunk, region), exactly the reference's per-region
  * loop made parallel.
  */
object Detrend {

  /** Least-squares cubic polynomial pieces per knot interval with
    * continuity at knots is overkill for a baseline; the reference's
    * default is a smoothing spline with knots every `timescale`. We fit
    * a cubic B-spline-like basis via ridge-regularized normal equations
    * on a truncated power basis — small dense system, one per region. */
  def splineBaseline(t: Array[Double], y: Array[Double], timescale: Double): Array[Double] = {
    val n = t.length
    if (n < 8) return Array.fill(n)(mean(y))
    val t0 = t.head; val t1 = t.last
    val nKnots = math.max(1, math.min(20, ((t1 - t0) / timescale).toInt))
    val knots = Array.tabulate(nKnots)(i => t0 + (t1 - t0) * (i + 1) / (nKnots + 1.0))
    // basis: [1, t, t², t³, (t−k₁)³₊, …]
    val nb = 4 + nKnots
    val basis = (ti: Double) => {
      val b = new Array[Double](nb)
      val x = (ti - t0) / (t1 - t0)
      b(0) = 1; b(1) = x; b(2) = x * x; b(3) = x * x * x
      var k = 0
      while (k < nKnots) {
        val d = (ti - knots(k)) / (t1 - t0)
        b(4 + k) = if (d > 0) d * d * d else 0.0
        k += 1
      }
      b
    }
    // normal equations A'A c = A'y with tiny ridge for conditioning
    val ata = Array.ofDim[Double](nb, nb)
    val aty = new Array[Double](nb)
    var i = 0
    while (i < n) {
      val b = basis(t(i))
      var r = 0
      while (r < nb) {
        aty(r) += b(r) * y(i)
        var c = 0
        while (c < nb) { ata(r)(c) += b(r) * b(c); c += 1 }
        r += 1
      }
      i += 1
    }
    var d = 0
    while (d < nb) { ata(d)(d) += 1e-9; d += 1 }
    val coef = solve(ata, aty)
    t.map(ti => dot(basis(ti), coef))
  }

  /** Matérn-3/2 GP marginal log-likelihood of residuals `r` at times
    * `t` — the same exact state-space form as [[gpBaseline]], forward
    * pass only: the Kalman innovations give the marginal likelihood
    * Σ −½(ν²/S + log(2πS)) in O(n) (ref retr_llik_mile main.py:735–850,
    * GP-baseline branch; kernel main.py:6797–6833). Used as the T13
    * fit likelihood so correlated baseline wiggle is marginalized out
    * instead of absorbed into the transit depth. */
  def gpLogLik(t: Array[Double], r: Array[Double], yerr: Array[Double],
               sigma: Double, rho: Double): Double = {
    val n = t.length
    if (n == 0) return 0.0
    val lam = math.sqrt(3.0) / rho
    val s2 = sigma * sigma
    val p11 = s2; val p22 = s2 * lam * lam
    var m0 = 0.0; var m1 = 0.0
    var c00 = p11; var c01 = 0.0; var c11 = p22
    var ll = 0.0
    var i = 0
    while (i < n) {
      if (i > 0) {
        val dt = t(i) - t(i - 1)
        val e = math.exp(-lam * dt)
        val a00 = e * (1 + lam * dt); val a01 = e * dt
        val a10 = -e * lam * lam * dt; val a11 = e * (1 - lam * dt)
        val nm0 = a00 * m0 + a01 * m1
        val nm1 = a10 * m0 + a11 * m1
        val q00 = p11 - (a00 * (a00 * p11) + a01 * (a01 * p22))
        val q01 = -(a10 * (a00 * p11) + a11 * (a01 * p22))
        val q11 = p22 - (a10 * (a10 * p11) + a11 * (a11 * p22))
        val t00 = a00 * c00 + a01 * c01; val t01 = a00 * c01 + a01 * c11
        val t10 = a10 * c00 + a11 * c01; val t11 = a10 * c01 + a11 * c11
        c00 = t00 * a00 + t01 * a01 + q00
        c01 = t00 * a10 + t01 * a11 + q01
        c11 = t10 * a10 + t11 * a11 + q11
        m0 = nm0; m1 = nm1
      }
      val rv = yerr(i) * yerr(i)
      val sInn = c00 + rv
      val nu = r(i) - m0
      ll += -0.5 * (nu * nu / sInn + math.log(2.0 * math.Pi * sInn))
      val k0 = c00 / sInn; val k1 = c01 / sInn
      m0 += k0 * nu; m1 += k1 * nu
      val nc00 = (1 - k0) * c00
      val nc01 = (1 - k0) * c01
      val nc11 = c11 - k1 * c01
      c00 = nc00; c01 = nc01; c11 = nc11
      i += 1
    }
    ll
  }

  /** Matérn-3/2 GP posterior mean by Kalman filtering + RTS smoothing
    * of its exact state-space representation (state = [f, f']):
    * kernel k(τ) = σ²(1 + λτ)e^(−λτ), λ = √3/ρ. O(n), numerically
    * benign — the same complexity class as celerite's semiseparable
    * solve (ref main.py:716, 6797–6833). */
  def gpBaseline(t: Array[Double], y: Array[Double], yerr: Array[Double],
                 sigma: Double, rho: Double): Array[Double] = {
    val n = t.length
    if (n == 0) return Array.empty
    val lam = math.sqrt(3.0) / rho
    val s2 = sigma * sigma
    // stationary covariance of the state
    val p11 = s2; val p22 = s2 * lam * lam
    // filtered means/covs
    val mf = Array.ofDim[Double](n, 2)
    val pf = Array.ofDim[Double](n, 3) // packed symmetric (p00,p01,p11)
    val mp = Array.ofDim[Double](n, 2)
    val pp = Array.ofDim[Double](n, 3)
    var m0 = 0.0; var m1 = 0.0
    var c00 = p11; var c01 = 0.0; var c11 = p22
    var i = 0
    while (i < n) {
      if (i > 0) {
        val dt = t(i) - t(i - 1)
        val e = math.exp(-lam * dt)
        // transition for Matérn-3/2: A = e^{−λdt} [[1+λdt, dt], [−λ²dt, 1−λdt]]
        val a00 = e * (1 + lam * dt); val a01 = e * dt
        val a10 = -e * lam * lam * dt; val a11 = e * (1 - lam * dt)
        val nm0 = a00 * m0 + a01 * m1
        val nm1 = a10 * m0 + a11 * m1
        // P' = A P A' + Q with Q = Pinf − A Pinf A'
        val q00 = p11 - (a00 * (a00 * p11) + a01 * (a01 * p22))
        val q01 = -(a10 * (a00 * p11) + a11 * (a01 * p22))
        val q11 = p22 - (a10 * (a10 * p11) + a11 * (a11 * p22))
        val t00 = a00 * c00 + a01 * c01; val t01 = a00 * c01 + a01 * c11
        val t10 = a10 * c00 + a11 * c01; val t11 = a10 * c01 + a11 * c11
        c00 = t00 * a00 + t01 * a01 + q00
        c01 = t00 * a10 + t01 * a11 + q01
        c11 = t10 * a10 + t11 * a11 + q11
        m0 = nm0; m1 = nm1
      }
      mp(i)(0) = m0; mp(i)(1) = m1
      pp(i)(0) = c00; pp(i)(1) = c01; pp(i)(2) = c11
      // measurement update: z = y(i), H = [1, 0]
      val r = yerr(i) * yerr(i)
      val sInn = c00 + r
      val k0 = c00 / sInn; val k1 = c01 / sInn
      val resid = y(i) - m0
      m0 += k0 * resid; m1 += k1 * resid
      val nc00 = (1 - k0) * c00
      val nc01 = (1 - k0) * c01
      val nc11 = c11 - k1 * c01
      c00 = nc00; c01 = nc01; c11 = nc11
      mf(i)(0) = m0; mf(i)(1) = m1
      pf(i)(0) = c00; pf(i)(1) = c01; pf(i)(2) = c11
      i += 1
    }
    // Rauch–Tung–Striebel backward smoother on the mean
    val ms = Array.ofDim[Double](n, 2)
    ms(n - 1)(0) = mf(n - 1)(0); ms(n - 1)(1) = mf(n - 1)(1)
    i = n - 2
    while (i >= 0) {
      val dt = t(i + 1) - t(i)
      val e = math.exp(-lam * dt)
      val a00 = e * (1 + lam * dt); val a01 = e * dt
      val a10 = -e * lam * lam * dt; val a11 = e * (1 - lam * dt)
      // G = Pf A' Pp⁻¹  (2×2 inverse of predicted cov at i+1)
      val det = pp(i + 1)(0) * pp(i + 1)(2) - pp(i + 1)(1) * pp(i + 1)(1)
      if (math.abs(det) < 1e-300) { ms(i)(0) = mf(i)(0); ms(i)(1) = mf(i)(1) }
      else {
        val i00 = pp(i + 1)(2) / det; val i01 = -pp(i + 1)(1) / det
        val i11 = pp(i + 1)(0) / det
        val pa00 = pf(i)(0) * a00 + pf(i)(1) * a01
        val pa01 = pf(i)(0) * a10 + pf(i)(1) * a11
        val pa10 = pf(i)(1) * a00 + pf(i)(2) * a01
        val pa11 = pf(i)(1) * a10 + pf(i)(2) * a11
        val g00 = pa00 * i00 + pa01 * i01
        val g01 = pa00 * i01 + pa01 * i11
        val g10 = pa10 * i00 + pa11 * i01
        val g11 = pa10 * i01 + pa11 * i11
        val d0 = ms(i + 1)(0) - mp(i + 1)(0)
        val d1 = ms(i + 1)(1) - mp(i + 1)(1)
        ms(i)(0) = mf(i)(0) + g00 * d0 + g01 * d1
        ms(i)(1) = mf(i)(1) + g10 * d0 + g11 * d1
      }
      i -= 1
    }
    Array.tabulate(n)(j => ms(j)(0))
  }

  /** Distributed detrend: regions via TsOps.withRegion, then one
    * spline/GP kernel per (parts..., region) group. Input columns:
    * parts ++ (tUs: long, id: long, value: double, err: double).
    * Output: input rows + baseline + detr (value − baseline + 1). */
  def detrend(df: DataFrame, parts: Seq[String], tUs: String, id: String,
              value: String, err: String, gapUs: Long, mode: String,
              timescaleDays: Double): DataFrame = {
    val spark = df.sparkSession
    val withReg = TsOps.withRegion(df, parts, tUs, id, gapUs)
    val keyCols = parts :+ "region"
    val schema = StructType(
      keyCols.map(c => withReg.schema(c)) ++ Seq(
        StructField(id, LongType), StructField(tUs, LongType),
        StructField(value, DoubleType), StructField(err, DoubleType),
        StructField("baseline", DoubleType), StructField("detr", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    withReg
      .groupByKey(r => keyCols.map(c => r.get(r.fieldIndex(c)).toString).mkString("|"))(
        org.apache.spark.sql.Encoders.STRING)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(r => (r.getAs[Long](tUs), r.getAs[Long](id)))
        if (rows.isEmpty) Iterator.empty
        else {
          val t = rows.map(_.getAs[Long](tUs).toDouble / 86400e6)
          val y = rows.map(_.getAs[Double](value))
          val e = rows.map(_.getAs[Double](err))
          val base = mode match {
            case "Spline" => splineBaseline(t, y, timescaleDays)
            case "GaussianProcess" => gpBaseline(t, y, e, stddev(y), timescaleDays)
            case _ => Array.fill(t.length)(mean(y))
          }
          rows.iterator.zipWithIndex.map { case (r, i) =>
            // Seq[Any]: a plain Seq would widen the Longs to Double
            Row.fromSeq(keyCols.map(c => r.get(r.fieldIndex(c))) ++ Seq[Any](
              r.getAs[Long](id), r.getAs[Long](tUs), y(i), e(i),
              base(i), y(i) - base(i) + 1.0))
          }
        }
      }(enc)
  }

  private def mean(a: Array[Double]): Double = if (a.isEmpty) 0.0 else a.sum / a.length
  private def stddev(a: Array[Double]): Double = {
    val m = mean(a); math.sqrt(a.map(x => (x - m) * (x - m)).sum / math.max(1, a.length))
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Gaussian elimination with partial pivoting (small dense systems). */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val m = Array.tabulate(n)(i => a(i) :+ b(i))
    var col = 0
    while (col < n) {
      var piv = col
      var r = col + 1
      while (r < n) { if (math.abs(m(r)(col)) > math.abs(m(piv)(col))) piv = r; r += 1 }
      val tmp = m(col); m(col) = m(piv); m(piv) = tmp
      val p = m(col)(col)
      if (math.abs(p) > 1e-300) {
        r = col + 1
        while (r < n) {
          val f = m(r)(col) / p
          var c = col
          while (c <= n) { m(r)(c) -= f * m(col)(c); c += 1 }
          r += 1
        }
      }
      col += 1
    }
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = m(i)(n)
      var j = i + 1
      while (j < n) { s -= m(i)(j) * x(j); j += 1 }
      x(i) = if (math.abs(m(i)(i)) > 1e-300) s / m(i)(i) else 0.0
      i -= 1
    }
    x
  }
}
