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

  /** Per-kernel demeaned exponential weights for a ladder of fall
    * timescales (ref main.py:6081–6118): kernel k has 3·τ_k taps of
    * exp(−j/τ_k), demeaned, integer-scaled ×1e6 — driver constants. */
  def multiKernelWeights(tauSteps: Seq[Double]): Seq[Seq[Long]] =
    tauSteps.map { tau =>
      val nt = math.max(2, (3 * tau).toInt)
      val w = (0 until nt).map(j => math.exp(-j / tau))
      val m = w.sum / nt
      w.map(x => math.round((x - m) * 1e6)).toSeq
    }

  /** T8 full fidelity (ref main.py:6081–6118 kernels, 6225–6295
    * chunking + uniform resample): split each partition into chunks at
    * gaps > gapUs, lay a uniform grid at stepUs over each chunk
    * (dropping chunks filled below `fillFrac`, ref 0.8), linearly
    * interpolate onto the grid, then correlate a LADDER of demeaned
    * exponential kernels (fall timescales tauSteps, taps 3·τ) at every
    * grid lag ('valid' mode). Triggers = corr above the q-quantile per
    * (partition, kernel) — a per-partition WINDOW percentile, not a
    * global aggregate, so the threshold distributes at scale. Islands
    * of consecutive triggered grid indices reduce to their peak.
    *
    * Everything is exact integer arithmetic after one floor() at the
    * interpolation (microcents on the grid): correlations are integer
    * dot products, reproducible across engines and partitionings.
    * Returns (parts, kern, region, peak_i, n_trig, corr). */
  def flaresMulti(df: DataFrame, parts: Seq[String], tUs: String, id: String,
                  vc: String, gapUs: Long, stepUs: Long,
                  tauSteps: Seq[Double], fillFrac: Double, q: Double): DataFrame = {
    val pc = parts.map(col)
    val wreg = Window.partitionBy(pc: _*).orderBy(col(tUs), col(id))
    val reg = df
      .withColumn("_gap", col(tUs) - lag(col(tUs), 1).over(wreg))
      .withColumn("region", sum(when(col("_gap") > gapUs, 1).otherwise(0))
        .over(wreg.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      .drop("_gap")
    val pr = parts :+ "region"
    val prc = pr.map(col)
    val bnd = reg.groupBy(prc: _*)
      .agg(min(col(tUs)).as("t0r"), max(col(tUs)).as("t1r"),
        count(lit(1)).as("n_samp"))
      .withColumn("n_grid", expr(s"(t1r - t0r + $stepUs - 1) div $stepUs"))
      .filter(col("n_grid") >= 1 && col("n_samp") >= 2 &&
        col("n_samp") >= lit(fillFrac) * col("n_grid"))
    val wseg = Window.partitionBy(prc: _*).orderBy(col(tUs), col(id))
    // one select: both leads share the spec → one WindowExec (r14)
    val seg = reg
      .select(col("*"), lead(col(tUs), 1).over(wseg).as("_t1"),
        lead(col(vc), 1).over(wseg).as("_v1"))
      .filter(col("_t1").isNotNull)
    // Grid slots are GENERATED from their unique covering segment
    // instead of range-joined to it: every grid point g = t0r + i·step
    // lies in exactly one [t_us, _t1) interval, so exploding each
    // segment into the slot indices it covers is output-identical to
    // the theta join the r6 form used — but O(grid) instead of
    // O(grid × segments) per region. The r6 nested-loop shape was the
    // 100× sweep's finding: within one region the range join paired
    // every slot with every segment before filtering (~4e7 rows per
    // key at 100×, 240 s; this form re-measures at ~linear).
    val interp = seg
      .join(bnd.select(prc :+ col("t0r") :+ col("n_grid"): _*), pr)
      .withColumn("_i0", expr(s"($tUs - t0r + $stepUs - 1) div $stepUs"))
      .withColumn("_i1", least(expr(s"(_t1 - t0r - 1) div $stepUs"),
        col("n_grid") - 1))
      .filter(col("_i1") >= col("_i0"))
      .withColumn("i", explode(sequence(col("_i0"), col("_i1"))))
      .withColumn("g_us", col("t0r") + col("i") * stepUs)
      .select(prc ++ Seq(col("i"),
        floor(lit(1e6) * (col(vc) +
          (col("_v1") - col(vc)) *
          ((col("g_us") - col(tUs)) / (col("_t1") - col(tUs)))))
          .cast("long").as("vi")): _*)
    val wg = Window.partitionBy(prc: _*).orderBy(col("i"))
    val weights = multiKernelWeights(tauSteps)
    // ALL kernels correlate in ONE window pass (r14): the per-kernel
    // branch form recomputed the whole interp chain (join + slot
    // explode + its windows) once per kernel and planned one
    // WindowExec each; here the shared leads evaluate once and the
    // (kern, corr) pairs explode row-locally — output-identical
    // (null corr rows, i.e. leads past the partition end, are dropped
    // either way).
    val corrCols = weights.zipWithIndex.map { case (wd, k) =>
      wd.zipWithIndex.map { case (c, j) =>
        lit(c) * lead(col("vi"), j).over(wg)
      }.reduce(_ + _).as(s"_corr$k")
    }
    val kerns = interp.select(col("*") +: corrCols: _*)
      .withColumn("_kc", explode(array(weights.indices.map(k =>
        struct(lit(k).as("kern"), col(s"_corr$k").as("corr"))): _*)))
      .select((prc :+ col("i")) ++ Seq(
        col("_kc.kern").as("kern"), col("_kc.corr").as("corr")): _*)
      .filter(col("corr").isNotNull)
    val wthr = Window.partitionBy((parts :+ "kern").map(col): _*)
    val trig = kerns
      .withColumn("thr", expr(s"percentile(corr, $q)").over(wthr))
      .filter(col("corr").cast("double") > col("thr"))
    val wisl = Window.partitionBy((pr :+ "kern").map(col): _*).orderBy(col("i"))
    val isl = trig.withColumn("grp", col("i") - row_number().over(wisl))
    val grpPart = (pr ++ Seq("kern", "grp")).map(col)
    val wpk = Window.partitionBy(grpPart: _*).orderBy(col("corr").desc, col("i").asc)
    // count over the SAME ordered spec with an unbounded frame ==
    // count over the unordered partition, and the two then share one
    // WindowExec (r14)
    isl
      .select(col("*"), row_number().over(wpk).as("prn"),
        count(lit(1)).over(wpk.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)).as("n_trig"))
      .filter(col("prn") === 1)
      .select(pc ++ Seq(col("kern"), col("region"), col("i").as("peak_i"),
        col("n_trig"), graft.core.Tables.round6(col("corr").cast("double") / 1e12).as("corr")): _*)
  }

  /** df: parts ++ (tUs, id, vc). Returns per-island flare peaks:
    * (parts, island, peak_id, n_trig, corr). Threshold = q-quantile of
    * the correlation — a GLOBAL exact percentile (one ObjectHashAgg
    * buffering all values), kept for the oracle-checked t8 query; at
    * 100 TB use [[flaresMulti]], whose threshold is a per-partition
    * window percentile, or approx_percentile here. */
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
