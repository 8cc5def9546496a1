package graft.expr

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{toCol, toExpr}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Scalar kernel behind [[RoundHalfUpK]]. Kept as a plain object so the
  * generated Java can call the static forwarder on the rare slow path.
  */
object RoundKernels {

  /** Bit-identical replacement for Spark's `round(x, k)` on DOUBLE
    * (BigDecimal.valueOf(x).setScale(k, HALF_UP).doubleValue() with
    * NaN/Inf passthrough), ~1 µs/row cheaper on the hot path.
    *
    * Fast path: y = x·10^k in binary, frac = y − floor(y), and decide
    * the HALF_UP comparison against 0.5 directly — UNLESS y sits
    * within `1e-12·max(1,|y|)` of the .5 boundary, where binary
    * product error could disagree with BigDecimal's shortest-decimal
    * digits; those rows (and non-finite / huge |y| where the tolerance
    * swallows the interval) take the exact BigDecimal path.
    *
    * Why the guard is sound: |fl(x·p) − decimal(x)·p| ≤ ~2 ulp(y)
    * ≈ 4.4e-16·max(1,|y|) (one product rounding + the ≤0.5 ulp gap
    * between x and its shortest-decimal rendering), 2000× inside the
    * 1e-12 tolerance — so whenever the fast path fires, the binary
    * comparison and BigDecimal's decimal comparison agree on BOTH the
    * integer cell and the side of the tie. The final n/10^k division
    * of exact doubles is correctly rounded, which is also exactly what
    * BigDecimal.doubleValue() returns for the decimal n·10^-k. Signed
    * zero: BigDecimal never returns −0.0, so the zero cell is pinned
    * to +0.0. (Scale-0 integer rounding has a cheaper exact form in
    * Tables.roundAway; this handles the scale-k display/quantize
    * columns the r15 verdict flagged — t9's round(z,6) at 100 M rows,
    * e7's 32 M-row projection.)
    */
  def rhu(x: Double, k: Int, p: Double): Double = {
    val y = x * p
    val fl = math.floor(y)
    val d = (y - fl) - 0.5
    val ay = math.abs(y)
    val tol = 1e-12 * (if (ay > 1.0) ay else 1.0)
    if (d > tol) { val n = fl + 1.0; if (n == 0.0) 0.0 else n / p }
    else if (d < -tol) { if (fl == 0.0) 0.0 else fl / p }
    else rhuSlow(x, k)
  }

  /** Exact Spark semantics: BigDecimal HALF_UP over the shortest-
    * decimal rendering of x, NaN/±Inf passed through (Spark's
    * RoundBase guards non-finite doubles the same way). */
  def rhuSlow(x: Double, k: Int): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(k, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Scale-0 HALF_UP (away-from-zero) integer rounding, bit-identical
    * to Spark `round(x)` for ALL doubles — the scalar behind
    * Tables.roundAway. Comparison form, no +0.5 addition (exact at
    * x = ±0.49999999999999994), identity for |x| ≥ 2^52 (every such
    * double is an integer; also passes ±Inf through), NaN propagates
    * through the arithmetic, and the zero cell is pinned to +0.0
    * (BigDecimal never returns −0.0). See Tables.roundAway's scaladoc
    * for the full exactness argument. */
  def roundAway(x: Double): Double = {
    val a = math.abs(x)
    if (a >= 4503599627370496.0) return x // 2^52: integral, ±Inf
    val fl = math.floor(a) // NaN falls through: n = NaN, returned as-is
    val n = if (a - fl >= 0.5) fl + 1.0 else fl
    if (x < 0 && n > 0) -n else n
  }
}

/** Codegen'd scale-0 half-away rounding as a SINGLE static call per
  * site (r16): the Column-formula version of Tables.roundAway expands
  * to a ~25-line when-chain per call site, which blows generated code
  * past janino's method limits in mega-expression plans (e9's power
  * iteration builds 64 dims × 2 of them per round — its whole-stage
  * codegen failed to compile and fell back to interpreted). One
  * static-call expression keeps those plans inside codegen and the
  * JIT inlines the kernel. */
case class RoundAwayD(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(v: Any): Any =
    RoundKernels.roundAway(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expr.RoundKernels.roundAway($x);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RoundAwayD {
  def round_away(c: Column): Column = toCol(RoundAwayD(toExpr(c)))
}

/** Codegen'd decimal-scale HALF_UP rounding, bit-identical to Spark's
  * `round(x, k)` on DoubleType (and therefore to the DuckDB oracle
  * wherever Spark's round already matched it). Requires 0 ≤ k ≤ 15 so
  * 10^k is an exact double. Reference analog: the quantized derived-
  * feature layer (miletos main.py:1329–1468).
  */
case class RoundHalfUpK(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 0 && k <= 15, s"RoundHalfUpK scale out of range: $k")

  private val p: Double = math.pow(10.0, k)

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(v: Any): Any =
    RoundKernels.rhu(v.asInstanceOf[Double], k, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val y = ctx.freshName("y")
      val fl = ctx.freshName("fl")
      val d = ctx.freshName("d")
      val ay = ctx.freshName("ay")
      val tol = ctx.freshName("tol")
      val n = ctx.freshName("n")
      s"""
        double $y = $x * ${p}D;
        double $fl = java.lang.Math.floor($y);
        double $d = ($y - $fl) - 0.5D;
        double $ay = java.lang.Math.abs($y);
        double $tol = 1.0E-12D * ($ay > 1.0D ? $ay : 1.0D);
        if ($d > $tol) {
          double $n = $fl + 1.0D;
          ${ev.value} = ($n == 0.0D) ? 0.0D : $n / ${p}D;
        } else if ($d < -$tol) {
          ${ev.value} = ($fl == 0.0D) ? 0.0D : $fl / ${p}D;
        } else {
          ${ev.value} = graft.expr.RoundKernels.rhuSlow($x, $k);
        }
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RoundHalfUpK {
  /** Column wrapper: drop-in for functions.round(c, k) on doubles. */
  def rhu(c: Column, k: Int): Column = toCol(RoundHalfUpK(toExpr(c), k))

  /** SQL registration for queries built from SQL strings:
    * SELECT graft_round6(x). Scale fixed at 6 (the quantize scale every
    * SQL-string call site uses). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_round6", exprs => RoundHalfUpK(exprs.head, 6), "scala_udf")
}
