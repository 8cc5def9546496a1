package graft.search

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** T6 — box least squares (ref srch_boxsperi main.py:5282–5965).
  *
  * The reference evaluates an explicit (period × duty-cycle × epoch)
  * trial grid against every sample in worker processes. Spark-first
  * reformulation: no trial crossJoin at all. For a trial period P and
  * an epoch grid at half-duration steps (factdeltepocdura=0.5,
  * main.py:5319), a sample's phase lies in exactly TWO candidate
  * boxes, found arithmetically:
  *
  *   m1 = floor(phase·M / P),  m0 = (m1 − 1 + M) mod M
  *
  * where M = 2/dutyCycle is the number of epoch steps. So each sample
  * explodes into #periods × #duties × 2 rows and one shuffle on
  * (P, M, m) computes every trial's in-box sum — map-side combined,
  * skew-free (keys are uniform by construction). At scale, samples
  * can be pre-binned in time at a handful of resolutions first (the
  * reference's multi-resolution rebinning, main.py:5586–5605) to cut
  * the explode factor.
  *
  * All box membership is exact integer arithmetic; depths derive from
  * integer sums.
  */
object Bls {

  /** Integer period ladder from the frequency grid 1/baseline,
    * k = 0..nPeriods-1 → P = baseline div (k+2)  (micros). */
  def periodLadder(nPeriods: Int): Seq[Int] = 2 to (nPeriods + 1)

  /** df: integer micros `tUs`, integer cents `vc`. `dutyM`: epoch-step
    * counts M = 2/dc (e.g. Seq(20, 40) for dc = 10%, 5%).
    * Returns per period the deepest box: (p_us, m_steps, m, n_in,
    * box_mean, depth). */
  def spectrum(df: DataFrame, tUs: String, vc: String,
               nPeriods: Int, dutyM: Seq[Int]): DataFrame = {
    val mm = df.agg(
      min(col(tUs)).as("t0"), max(col(tUs)).as("t1"),
      count(lit(1)).as("nall"), sum(col(vc)).as("sall"))
    val trials = mm
      .withColumn("kp", explode(sequence(lit(2), lit(nPeriods + 1))))
      .withColumn("p_us", expr("(t1 - t0) div kp"))
      .withColumn("m_steps", explode(array(dutyM.map(lit(_)): _*)))
      .withColumn("gmean", col("sall").cast("double") / col("nall") / 100.0)
      .select("t0", "p_us", "m_steps", "gmean")
    val boxes = df.crossJoin(broadcast(trials))
      .withColumn("phase_us", pmod(col(tUs) - col("t0"), col("p_us")))
      .withColumn("m1", expr("(phase_us * m_steps) div p_us"))
      .withColumn("d", explode(array(lit(0), lit(1))))
      .withColumn("m", pmod(col("m1") - col("d") + col("m_steps"), col("m_steps")))
      .groupBy("p_us", "m_steps", "m")
      .agg(count(lit(1)).as("n_in"), sum(col(vc)).as("s_in"),
        min(col("gmean")).as("gmean"))
      .withColumn("box_mean", col("s_in").cast("double") / col("n_in") / 100.0)
      .withColumn("depth", col("gmean") - col("box_mean"))
    val w = Window.partitionBy("p_us")
      .orderBy(col("box_mean").asc, col("m_steps").asc, col("m").asc)
    boxes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_us"), col("m_steps"), col("m"), col("n_in"),
        round(col("box_mean"), 6).as("box_mean"), round(col("depth"), 6).as("depth"))
  }
}
