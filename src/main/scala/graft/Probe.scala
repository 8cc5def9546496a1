package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage probe (not part of the driver contract): times the
  * sub-stages of one query under Bench session conditions to localize
  * a floor. Delete or repurpose freely between rounds. r16b: t5
  * Lomb–Scargle — where do its ~4 s go (trig? rounding? join+agg
  * machinery? the grid subquery)? */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Bench.warmup(spark, sfDir)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache(); System.gc()
      r
    }

    import graft.core.Exec.runCount
    val base = graft.core.Tables.events(spark, sfDir)
      .selectExpr("event_id", "unix_micros(ts) AS t_us",
        "CAST(round(value*100) AS BIGINT) AS vc")
    val nFreq = 120; val subdiv = 6
    def mm = base.agg(
      min(col("t_us")).as("t0"), max(col("t_us")).as("t1"),
      count(lit(1)).as("n"), sum(col("vc")).as("s"),
      sum(col("vc") * col("vc")).as("q"))
    def freqs = mm
      .withColumn("k", explode(sequence(lit(0), lit(nFreq - 1))))
      .withColumn("bl", (col("t1") - col("t0")).cast("double") / 1000000.0)
      .withColumn("omega", lit(2.0) * lit(math.Pi) *
        (col("k").cast("double") / lit(subdiv.toDouble) + lit(1.0)) / col("bl"))
      .withColumn("mean", col("s").cast("double") / col("n") / 100.0)
      .withColumn("varx",
        (col("q") - col("s").cast("double") * col("s") / col("n")) / col("n") / 10000.0)
      .select("k", "t0", "omega", "mean", "varx")
    def joined = base.crossJoin(broadcast(freqs))
      .withColumn("ts", (col("t_us") - col("t0")).cast("double") / 1000000.0)

    (1 to 3).foreach { rep =>
      println(s"--- rep $rep")
      t("t5 full")(runCount(
        SparkEntry.queries("t5_lombscargle")(spark, sfDir)))
      t("A base scan only")(runCount(base))
      t("B mm agg")(runCount(mm))
      t("C crossJoin+agg, no trig no rounds")(runCount(
        joined
          .withColumn("dx", col("vc") / 100.0 - col("mean"))
          .groupBy("k").agg(count(lit(1)).as("n"), sum(col("dx")).as("sx"))))
      t("D + trig only (no rounds)")(runCount(
        joined
          .withColumn("c", cos(col("omega") * col("ts")))
          .withColumn("si", sin(col("omega") * col("ts")))
          .groupBy("k").agg(count(lit(1)).as("n"),
            sum(col("c")).as("sc"), sum(col("si")).as("ss"))))
      t("E + trig + 2 roundAway")(runCount(
        joined
          .withColumn("ci", graft.core.Tables.roundAway(cos(col("omega") * col("ts")) * 1e6).cast("long"))
          .withColumn("si", graft.core.Tables.roundAway(sin(col("omega") * col("ts")) * 1e6).cast("long"))
          .groupBy("k").agg(count(lit(1)).as("n"),
            sum(col("ci")).as("sc"), sum(col("si")).as("ss"))))
    }
    spark.stop()
  }
}
