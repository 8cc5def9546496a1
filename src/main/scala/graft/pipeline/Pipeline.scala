package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Tables
import graft.ops.TsOps
import graft.search.{Bls, LombScargle, MatchedFilter}

/** §3.1 — the `init()`-equivalent orchestrator, as a thin declarative
  * layer over the operator library. The reference's god-object +
  * eager-CSV-per-stage design (gdat, main.py:8062; CSV caches
  * 10826–11128) becomes:
  *
  *  - a typed [[PipelineConfig]] instead of kwargs-on-gdat;
  *  - a named-stage registry where each stage is a lazy DataFrame,
  *    `persist()`ed at the boundaries the reference wrote to disk
  *    ('Raw' → 'maskcust' → 'Detrended', main.py:10840–11105);
  *  - analyses (LS / BLS / flares / outlier-period) as plan builders
  *    over the 'Detrended' stage.
  *
  * Catalyst sees the whole lineage, so filters/projections written
  * after a stage still push down into the scan unless a persist
  * boundary was explicitly requested.
  */
case class PipelineConfig(
    dataDir: String,
    maskWindowsUs: Seq[(Long, Long)] = Nil,
    clipSigma: Double = 3.0,
    clipIters: Int = 3,
    gapUs: Long = 3600000000L,
    foldEpochUs: Long = 1704067200000000L,
    foldPeriodUs: Long = 86400000000L,
    nFreq: Int = 40,
    nPeriods: Int = 30,
    dutyM: Seq[Int] = Seq(20, 40),
    persistStages: Boolean = true)

class Pipeline(spark: SparkSession, cfg: PipelineConfig) {
  private val stages = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]

  /** Register (and optionally persist) a named stage — the reference's
    * stage-name dict made lazy. */
  def stage(name: String)(build: => DataFrame): DataFrame =
    stages.getOrElseUpdate(name, {
      val df = build
      if (cfg.persistStages) df.persist(StorageLevel.MEMORY_AND_DISK) else df
    })

  def stageNames: Seq[String] = stages.keys.toSeq

  /** 'Raw': ingest + quality filtering (S1/F1 semantics). */
  def raw: DataFrame = stage("Raw") {
    Tables.events(spark, cfg.dataDir).select(
      col("event_id"), col("user_id"), col("value"),
      unix_micros(col("ts")).as("t_us"),
      Tables.cents(col("value")).as("vc"))
      .filter(col("value").isNotNull && abs(col("value")) < 1e10)
  }

  /** 'maskcust': custom interval mask (F2, main.py:10840–10865). */
  def masked: DataFrame = stage("maskcust") {
    cfg.maskWindowsUs.foldLeft(raw) { case (df, (lo, hi)) =>
      df.filter(!(col("t_us") >= lo && col("t_us") < hi))
    }
  }

  /** 'Detrended': iterative sigma clip (T4) — the cleaning boundary the
    * reference persists per timescale (main.py:11097–11105). */
  def detrended: DataFrame = stage("Detrended") {
    TsOps.sigmaClip(masked, Seq("user_id"), "vc", cfg.clipSigma, cfg.clipIters)
  }

  /** Analyses over 'Detrended' (§3.1 step 7). */
  def lombScargle: DataFrame = LombScargle.periodogram(detrended, "t_us", "vc", cfg.nFreq)
  def bls: DataFrame = Bls.spectrum(detrended, "t_us", "vc", cfg.nPeriods, cfg.dutyM)
  def flares: DataFrame =
    MatchedFilter.flares(detrended, Seq("user_id"), "t_us", "event_id", "vc", 2.0, 0.99)

  /** Phase-folded + binned product (§3.1 step 9). */
  def folded: DataFrame = stage("Folded") {
    detrended.withColumn("phase_us",
      TsOps.phaseUs(col("t_us"), lit(cfg.foldEpochUs), lit(cfg.foldPeriodUs)))
  }

  /** One-row summary — the `dictmileoutp` analog (main.py:12554),
    * appended to a results table with key-dedup (S12). */
  def summary: DataFrame = {
    val peak = lombScargle.orderBy(desc("power"), asc("k")).limit(1)
      .select(col("k").as("ls_peak_k"), col("power").as("ls_peak_power"))
    val deepest = bls.orderBy(desc("depth"), asc("p_us")).limit(1)
      .select(col("p_us").as("bls_p_us"), col("depth").as("bls_depth"))
    raw.agg(count(lit(1)).as("n_raw"))
      .crossJoin(detrended.agg(count(lit(1)).as("n_clean")))
      .crossJoin(peak).crossJoin(deepest)
  }

  /** Results sink with dedup-on-key (S12, main.py:12458–12539). */
  def appendResults(path: String, key: String, row: DataFrame): Unit = {
    val existing = scala.util.Try(spark.read.parquet(path)).toOption
    val all = existing.map(_.unionByName(row, allowMissingColumns = true)).getOrElse(row)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(monotonically_increasing_id())
    all.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
      .write.mode("overwrite").parquet(path + "_tmp")
    spark.read.parquet(path + "_tmp").write.mode("overwrite").parquet(path)
  }

  def unpersistAll(): Unit = stages.values.foreach(_.unpersist())
}
