package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** T8 — matched-filter flare search (ref srch_flar/corr_tmpt
  * main.py:6073–6417): correlate a one-sided exponential-decay kernel
  * A·exp(−Δt/τ) (model main.py:362–382) against the series at every
  * lag ('valid' mode), threshold, cluster consecutive triggers into
  * islands, keep the per-island peak (main.py:6347–6368).
  *
  * The demeaned kernel weights are integerized CONSTANTS computed once
  * on the driver, so the per-row correlation is a sum of 8 integer
  * products via lead() — fully codegen'd, one window pass, no joins.
  */
object MatchedFilter {

  val KernelSize = 8

  /** Demeaned exponential kernel, integer-scaled ×1e6. */
  def kernelWeights(tauSteps: Double): Seq[Long] = {
    val w = (0 until KernelSize).map(j => math.exp(-j / tauSteps))
    val m = w.sum / KernelSize
    w.map(x => math.round((x - m) * 1e6))
  }

  /** df: parts ++ (tUs, id, vc). Returns per-island flare peaks:
    * (parts, island, peak_id, n_trig, corr). Threshold = q-quantile of
    * the correlation (exact percentile). */
  def flares(df: DataFrame, parts: Seq[String], tUs: String, id: String,
             vc: String, tauSteps: Double, q: Double): DataFrame = {
    val wd = kernelWeights(tauSteps)
    val w = Window.partitionBy(parts.map(col): _*).orderBy(col(tUs), col(id))
    val corr = df
      .withColumn("rn", row_number().over(w))
      .withColumn("corr_i",
        wd.zipWithIndex.map { case (c, j) =>
          lit(c) * lead(col(vc), j).over(w)
        }.reduce(_ + _))
      .filter(col("corr_i").isNotNull)
    val thr = corr.agg(expr(s"percentile(corr_i, $q)").as("thr"))
    val flagged = corr.crossJoin(broadcast(thr))
      .filter(col("corr_i").cast("double") > col("thr"))
      .withColumn("grp", col("rn") - row_number().over(w))
    val wp = Window.partitionBy(parts.map(col) :+ col("grp"): _*)
      .orderBy(col("corr_i").desc, col(id).asc)
    flagged
      .withColumn("prn", row_number().over(wp))
      .withColumn("n_trig", count(lit(1)).over(
        Window.partitionBy(parts.map(col) :+ col("grp"): _*)))
      .filter(col("prn") === 1)
      .select(parts.map(col) ++ Seq(col(id).as("peak_id"), col("n_trig"),
        (col("corr_i").cast("double") / 1e6 / 100.0).as("corr")): _*)
  }
}
