package graft

import org.apache.spark.sql.functions._
import graft.ops.{Detrend, TsOps}

/** W2's discontinuity break (ref retr_timeedge `booladdddiscbdtr`,
  * main.py:6599–6605 — default True in bdtr_tser at 6683): the 20σ
  * one-sided diff gate plus the 3-point local-mean guard, and its
  * wiring into the Detrend region path (default ON). Pins:
  *  - the guard's glitch-vs-shift asymmetry (spike breaks, step does
  *    not) and the k<3 vacuous exclusion;
  *  - Detrend.detrend region counts change EXACTLY at an injected
  *    jump when discBreaks is on, and not when off;
  *  - the t3b/t3c sim is break-free, so those declared queries are
  *    bit-identical under either flag (their oracles assume one
  *    region per part).
  */
class DiscBreakSpec extends SparkSpec {

  /** Dense 30-min-cadence series, one part, values in micro-units:
    * flat 1e6 + deterministic ±5e3 noise; callers inject features. */
  private def series(n: Int, tweak: (Long, Long) => Long) = {
    import spark.implicits._
    (0L until n.toLong).map { i =>
      val noise = ((i * i % 65536) * 1103515245L + i * 12345L) % 10000L - 5000L
      ("p0", i, i * 1800000000L, tweak(i, 1000000L + noise))
    }.toDF("part", "id", "t_us", "vq")
  }

  test("single-sample spike breaks; persistent step is guard-rejected") {
    val df = series(2000, (i, v) =>
      v - (if (i == 500) 300000L else 0L) - (if (i >= 1200) 300000L else 0L))
    val reg = TsOps.withRegionDisc(df, Seq("part"), "t_us", "id", "vq", 3600000000L)
      .groupBy("region").agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
      .orderBy("region").collect()
    // one break, exactly at the spike (row 500 starts region 1); the
    // step at 1200 must NOT split (2J/3 > J·√2/3 in the guard algebra)
    assert(reg.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 499L), (500L, 1999L)))
  }

  test("k<3 exclusion: a 20-sigma spike at row 1 cannot break") {
    // numpy's lcur[-3+k:k] slice is empty for k<3 → mean NaN → guard
    // false; the engine replicates via the left-frame count(*)==3 gate
    val df = series(2000, (i, v) => v - (if (i == 1) 300000L else 0L))
    val n = TsOps.withRegionDisc(df, Seq("part"), "t_us", "id", "vq", 3600000000L)
      .agg(countDistinct(col("region"))).collect()(0).getLong(0)
    assert(n === 1L)
  }

  test("gap break and disc break at the same boundary count once") {
    val df = series(2000, (i, v) => v - (if (i == 500) 300000L else 0L))
      .withColumn("t_us", col("t_us") +
        when(col("id") >= 500, 86400000000L).otherwise(0L))
    val reg = TsOps.withRegionDisc(df, Seq("part"), "t_us", "id", "vq", 3600000000L)
      .groupBy("region").agg(min(col("id")).as("lo")).orderBy("region").collect()
    assert(reg.map(_.getLong(1)).toSeq === Seq(0L, 500L))
  }

  test("Detrend region count changes exactly at an injected jump (default on)") {
    import spark.implicits._
    // t3-family-shaped input: double flux ~1.0, one part, 30-min cadence,
    // a single-sample −0.3 glitch at i=250 inside a contiguous chunk
    val rows = (0L until 1500L).map { i =>
      val noise = (((i * i % 65536) * 1103515245L + i * 12345L) % 10000L - 5000L) / 1e6
      ("p0", i, i * 1800000000L, 1.0 + noise - (if (i == 250) 0.3 else 0.0), 0.01)
    }.toDF("part", "id", "t_us", "value", "err")
    def regionsAt(disc: Boolean) =
      Detrend.detrend(rows, Seq("part"), "t_us", "id", "value", "err",
          gapUs = 3600000000L, mode = "medi", timescaleDays = 2.0,
          discBreaks = disc)
        .select("region").distinct().count()
    assert(regionsAt(disc = false) === 1L)
    assert(regionsAt(disc = true) === 2L)
    // and the boundary is exactly the glitch row
    val bounds = Detrend.detrend(rows, Seq("part"), "t_us", "id", "value", "err",
        gapUs = 3600000000L, mode = "medi", timescaleDays = 2.0)
      .groupBy("region").agg(min(col("id")).as("lo")).orderBy("region").collect()
    assert(bounds.map(_.getLong(1)).toSeq === Seq(0L, 250L))
  }

  test("t3b/t3c sim is break-free: one region per part under the default flag") {
    // the t3b/t3c oracles replay ONE region per part; this pins that
    // turning the default on cannot move them (the sim's periodic dips
    // are 0.02, an order below the ~0.1 20σ threshold of its diffs)
    val sim = graft.queries.Advanced.t3Sim(spark, sf, err = 1.0)
      .withColumn("_vq", round(col("value") * 1e6).cast("long"))
    val perPart = TsOps.withRegionDisc(sim, Seq("part"), "t_us", "id", "_vq",
        3600000000L)
      .groupBy("part").agg(countDistinct(col("region")).as("nr"))
      .collect()
    assert(perPart.length === 8)
    assert(perPart.forall(_.getLong(1) === 1L))
  }
}
