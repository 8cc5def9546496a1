package graft

import org.apache.spark.sql.functions._
import graft.ops.TsOps

/** S4 / F-LC6 — the energy (wavelength) axis in long format: a
  * (time × 12 ener) spectral cube with wavelength-dependent injected
  * transit depth; per-energy fold + in-transit depth measurement must
  * reproduce the injected depth-vs-ener curve (transmission-spectrum
  * analog, ref main.py:12343–12381, per-energy-bin fits 12301–12316).
  */
class SpectralSpec extends SparkSpec {
  import spark.implicits._

  private val E = 1704067200000000L
  private val DAY = 86400000000L

  test("per-energy fold recovers wavelength-dependent transit depth") {
    val rng = new scala.util.Random(41)
    val p = 4 * DAY; val dur = p / 10
    val nT = 2500; val nE = 12
    // long format (ener, time, value): depth grows linearly with ener
    val rows = for (i <- 0 until nT; e <- 0 until nE) yield {
      val tU = E + (i.toLong * 20 * DAY) / nT
      val ph = ((tU - E + p / 2) % p + p) % p - p / 2
      val depth = 0.01 + 0.001 * e
      val v = 1.0 - (if (math.abs(ph) < dur / 2) depth else 0.0) +
        0.001 * rng.nextGaussian()
      (e, i.toLong, tU, v)
    }
    val cube = rows.toDF("ener", "id", "t_us", "value")
      .withColumn("vc", round(col("value") * 100000).cast("long"))

    val inT = TsOps.inTransit(col("t_us"), lit(E), lit(p), lit(dur))
    val perEner = cube
      .withColumn("in_transit", inT)
      .groupBy("ener")
      .agg(
        (sum(when(col("in_transit"), col("vc"))).cast("double") /
          count(when(col("in_transit"), 1))).as("in_mean"),
        (sum(when(!col("in_transit"), col("vc"))).cast("double") /
          count(when(!col("in_transit"), 1))).as("out_mean"))
      .withColumn("depth_meas", (col("out_mean") - col("in_mean")) / 100000.0)
      .orderBy("ener")
      .collect()

    assert(perEner.length === nE)
    perEner.foreach { r =>
      val e = r.getAs[Int]("ener")
      val injected = 0.01 + 0.001 * e
      val measured = r.getAs[Double]("depth_meas")
      assert(math.abs(measured - injected) < 0.002,
        s"ener $e: measured $measured vs injected $injected")
    }
    // monotonic trend across the spectrum (the transmission signature)
    val depths = perEner.map(_.getAs[Double]("depth_meas"))
    assert(depths.last > depths.head + 0.005)
  }
}
