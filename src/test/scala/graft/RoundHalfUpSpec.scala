package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import graft.expr.{RoundHalfUpK, RoundKernels}

/** Bit-identity proof for RoundHalfUpK vs Spark's round(x, k) — the
  * r15-verdict lead item (the scale-k BigDecimal tax). Discipline as
  * for Tables.roundAway: boundary cases where naive
  * floor(x·10^k+0.5)/10^k formulas diverge, signed zero, non-finite,
  * huge magnitudes that must take the slow path, plus a seeded random
  * sweep across magnitudes and scales, compared via
  * doubleToLongBits (so +0.0 vs −0.0 and NaN canonicalization are
  * part of the contract) on BOTH the interpreted kernel and the
  * codegen path inside a real plan.
  */
class RoundHalfUpSpec extends SparkSpec {

  /** Spark's exact semantics, restated (RoundBase on DoubleType). */
  private def ref(x: Double, k: Int): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(k, java.math.RoundingMode.HALF_UP).doubleValue()

  private val boundary: Seq[Double] = Seq(
    0.0, -0.0, 0.5, -0.5, 1.5, -1.5, 2.5, -2.5,
    // the double just below 0.5 whose +0.5 SUM rounds up to 1.0
    0.49999999999999994, -0.49999999999999994,
    // shortest-decimal tie cases: binary value below the tie, decimal AT it
    2.675, -2.675, 0.145, -0.145, 1.005, -1.005,
    // k=6 tie-region values
    0.0000005, -0.0000005, 1.0000005, 0.1234565, -0.1234565,
    1.0 / 3.0, -1.0 / 3.0, math.Pi, -math.E,
    // integer-boundary fractions (frac ≈ 0 / ≈ 1 cells)
    math.nextAfter(1.0, 0.0), math.nextAfter(1.0, 2.0),
    math.nextAfter(-1.0, 0.0), math.nextAfter(-1.0, -2.0),
    // magnitudes that push y past the guard → slow path
    1e11, -1e11, 1e15 + 3.0, -(1e15 + 3.0), 9.007199254740993e15,
    4.503599627370497e15, 1e300, -1e300, Double.MaxValue, Double.MinValue,
    // subnormals / tiny
    4.9e-324, -4.9e-324, 1e-300, Double.MinPositiveValue,
    Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)

  private val rnd = new scala.util.Random(4616)
  private val randoms: Seq[Double] = Seq.fill(20000) {
    // log-uniform magnitude in [1e-9, 1e12), signed; plus occasional
    // exact 6-decimals so the tie/slow path is exercised, not just
    // asserted reachable
    rnd.nextInt(10) match {
      case 0 => rnd.nextInt(2000000) / 1e6 - 1.0
      case 1 => (rnd.nextInt(2000001) * 5 - 5000000) / 1e7 // x.xxxxxx5 ties
      case _ =>
        val m = math.pow(10.0, rnd.nextDouble() * 21 - 9)
        (rnd.nextDouble() * 2 - 1) * m
    }
  }

  private val scales = Seq(0, 1, 2, 3, 4, 6, 9, 12, 15)

  test("interpreted kernel is bit-identical to BigDecimal HALF_UP") {
    for (k <- scales; x <- boundary ++ randoms) {
      val got = RoundKernels.rhu(x, k, math.pow(10.0, k))
      val want = ref(x, k)
      assert(java.lang.Double.doubleToLongBits(got) ==
             java.lang.Double.doubleToLongBits(want),
        s"rhu($x, $k) = $got, BigDecimal HALF_UP = $want")
    }
  }

  test("codegen path matches Spark round(x, k) inside a plan, incl. nulls") {
    val vals = (boundary ++ randoms).map(v => Row(java.lang.Double.valueOf(v))) :+ Row(null)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vals.toList, 4),
      StructType(Seq(StructField("x", DoubleType, nullable = true))))
    // bit-level compare driver-side (doubleToLongBits distinguishes
    // -0.0, which SQL equality would hide)
    for (k <- scales) {
      val rows = df.select(col("x"), round(col("x"), k).as("s"),
        RoundHalfUpK.rhu(col("x"), k).as("r")).collect()
      rows.foreach { r =>
        assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch at ${r.get(0)} k=$k")
        if (!r.isNullAt(1)) {
          assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
                 java.lang.Double.doubleToLongBits(r.getDouble(2)),
            s"x=${r.get(0)} k=$k spark=${r.getDouble(1)} rhu=${r.getDouble(2)}")
        }
      }
    }
  }

  test("SQL registration: graft_round6 == round(x, 6)") {
    RoundHalfUpK.register(spark)
    import spark.implicits._
    val df = (boundary ++ randoms.take(2000)).toDF("x")
    df.createOrReplaceTempView("rhu_probe")
    val rows = spark.sql(
      "SELECT x, round(x, 6) AS s, graft_round6(x) AS r FROM rhu_probe").collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"x=${r.getDouble(0)} spark=${r.getDouble(1)} graft_round6=${r.getDouble(2)}")
    }
  }

  test("Tables.roundAway comparison form matches round(x) at the r15-advice edges") {
    import spark.implicits._
    val edge = Seq(0.49999999999999994, -0.49999999999999994,
      4.503599627370497e15, -4.503599627370497e15, // 2^52 + 1
      9.007199254740993e15, 2.5, -2.5, 0.5, -0.5, -0.0, 0.0,
      // the ≥2^52 identity branch: integral doubles far past long range
      1e300, -1e300, 1.8e19, -1.8e19, Double.MaxValue, Double.MinValue,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity) ++
      randoms.take(5000)
    val rows = edge.toDF("x")
      .select(col("x"), round(col("x")).as("s"), graft.core.Tables.roundAway(col("x")).as("r"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"x=${r.getDouble(0)} round=${r.getDouble(1)} roundAway=${r.getDouble(2)}")
    }
  }
}
