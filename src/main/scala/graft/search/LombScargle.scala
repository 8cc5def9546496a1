package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T5 — Lomb–Scargle periodogram (ref exec_lspe main.py:4888–5028),
  * built from closed-form normal-equation sums: for each trial
  * frequency, the least-squares sine+cosine fit amplitude over the
  * mean-subtracted series, normalized by the population variance
  * (generalized LS with pre-subtracted exact mean).
  *
  * Execution shape (scales): broadcast the frequency grid, crossJoin
  * (one pass over the data per partition, map-side partial aggregation),
  * shuffle only the per-frequency sums — never the samples. At 100 TB
  * the shuffle volume is #freqs × #partitions tiny rows.
  *
  * Determinism: cos/sin terms are integerized (round(c·1e6)) so all
  * aggregation is over exact integers; every floating value derives
  * from those sums with one fixed formula.
  */
object LombScargle {

  /** df must expose integer micros `tUs` and integer scaled value
    * `vc` (cents). Returns (k, power[, fap]) for k = 0..nFreq-1 with
    * f_k = (1 + k/subdiv)/baseline — subdiv=1 is the plain
    * 1/baseline-spaced grid; subdiv=6 reproduces the reference's
    * oversampled deltfreq = minmfreq/factosam/2 with factosam=3
    * (main.py:4956–4958). `fapProb`: when set, adds the constant
    * false-alarm power level at that probability (ref 5% line,
    * main.py:5011–5012) via the classic independent-frequencies
    * formula z = 1 − (1 − (1−p)^(1/M))^(2/(N−3)) for the
    * variance-normalized power. */
  def periodogram(df: DataFrame, tUs: String, vc: String, nFreq: Int,
                  subdiv: Int = 1, fapProb: Option[Double] = None): DataFrame = {
    val mm = df.agg(
      min(col(tUs)).as("t0"), max(col(tUs)).as("t1"),
      count(lit(1)).as("n"), sum(col(vc)).as("s"),
      sum(col(vc) * col(vc)).as("q"))
    val freqs = mm
      .withColumn("k", explode(sequence(lit(0), lit(nFreq - 1))))
      .withColumn("bl", (col("t1") - col("t0")).cast("double") / 1000000.0)
      .withColumn("omega", lit(2.0) * lit(math.Pi) *
        (col("k").cast("double") / lit(subdiv.toDouble) + lit(1.0)) / col("bl"))
      .withColumn("mean", col("s").cast("double") / col("n") / 100.0)
      .withColumn("varx",
        (col("q") - col("s").cast("double") * col("s") / col("n")) / col("n") / 10000.0)
      .select("k", "t0", "omega", "mean", "varx")
    val out = df.crossJoin(broadcast(freqs))
      .withColumn("ts", (col(tUs) - col("t0")).cast("double") / 1000000.0)
      .withColumn("ci", graft.core.Tables.roundAway(cos(col("omega") * col("ts")) * 1e6).cast("long"))
      .withColumn("si", graft.core.Tables.roundAway(sin(col("omega") * col("ts")) * 1e6).cast("long"))
      .withColumn("dx", col(vc) / 100.0 - col("mean"))
      .withColumn("rxc", graft.core.Tables.roundAway(col("ci") * col("dx")).cast("long"))
      .withColumn("rxs", graft.core.Tables.roundAway(col("si") * col("dx")).cast("long"))
      .groupBy("k")
      .agg(
        min(col("varx")).as("varx"), count(lit(1)).as("n"),
        sum(col("ci") * col("ci")).as("cc"), sum(col("si") * col("si")).as("ss"),
        sum(col("ci") * col("si")).as("cs"),
        sum(col("rxc")).as("xc"), sum(col("rxs")).as("xs"))
      .withColumn("acc", col("cc").cast("double") / 1e12)
      .withColumn("ass", col("ss").cast("double") / 1e12)
      .withColumn("acs", col("cs").cast("double") / 1e12)
      .withColumn("axc", col("xc").cast("double") / 1e6)
      .withColumn("axs", col("xs").cast("double") / 1e6)
      .withColumn("power", graft.core.Tables.round6(
        (col("ass") * col("axc") * col("axc")
          - lit(2.0) * col("acs") * col("axc") * col("axs")
          + col("acc") * col("axs") * col("axs"))
          / nullif(col("acc") * col("ass") - col("acs") * col("acs"), lit(0.0))
          / nullif(lit(2.0) * col("varx") * col("n"), lit(0.0))))
    fapProb match {
      case Some(p) =>
        out.withColumn("fap", graft.core.Tables.round6(
          lit(1.0) - pow(lit(1.0) - pow(lit(1 - p), lit(1.0 / nFreq)),
            lit(2.0) / (col("n") - lit(3)))))
          .select("k", "n", "power", "fap")
      case None => out.select("k", "n", "power")
    }
  }
}
