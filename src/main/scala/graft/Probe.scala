package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage probe (not part of the driver contract): times the
  * sub-stages of one query under Bench session conditions to localize
  * a floor. Delete or repurpose freely between rounds. */
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

    import graft.core.Tables
    import graft.core.Exec.runCount
    val cust = Tables.customer(spark, sfDir)
    def mkVars = cust.select(col("c_name").as("tok")).distinct()
      .withColumn("vr", explode(expr(
        """transform(sequence(0, length(tok)), i -> struct(
          |  i AS pos,
          |  CASE WHEN i = 0 THEN tok
          |       ELSE concat(substr(tok, 1, i - 1), substr(tok, i + 1)) END AS v))"""
          .stripMargin)))
      .select(col("tok"), col("vr.pos").as("pos"), col("vr.v").as("v"))
    def cond = col("a.v") === col("b.v") && col("a.tok") < col("b.tok") &&
      ((length(col("a.tok")) === length(col("b.tok")) &&
        col("a.pos") === col("b.pos") && col("a.pos") > 0) ||
       (length(col("a.tok")) === length(col("b.tok")) + 1 &&
        col("a.pos") > 0 && col("b.pos") === 0) ||
       (length(col("b.tok")) === length(col("a.tok")) + 1 &&
        col("b.pos") > 0 && col("a.pos") === 0))
    def sel(j: org.apache.spark.sql.DataFrame) = j
      .select(col("a.tok").as("a_name"), col("b.tok").as("b_name"),
        when(length(col("a.tok")) === length(col("b.tok")), "sub")
          .otherwise("indel").as("kind"))
      .distinct()
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep")
      t("j10 full")(runCount(
        SparkEntry.queries("j10_fuzzy_ed1")(spark, sfDir)))
      val vars = mkVars
      t("vars runCount")(runCount(vars))
      val joined = vars.as("a").join(vars.as("b"), cond)
      t("join runCount")(runCount(joined))
      t("join+distinct runCount")(runCount(sel(joined)))
      t("full no-sort+sort runCount")(runCount(
        sel(joined).orderBy("a_name", "b_name")))
      // variant A: force a shuffled self-join so the exploded frame is
      // computed once and the exchange reused on both sides
      val vA = mkVars
      val jA = vA.as("a").hint("shuffle_hash").join(vA.as("b"), cond)
      t("variant A shj runCount")(runCount(
        sel(jA).orderBy("a_name", "b_name")))
      // variant B: broadcast join keyed on the 64-bit hash of the
      // variant, v equality kept as residual (narrower build key)
      val vB = mkVars.withColumn("hv", xxhash64(col("v")))
      val jB = vB.as("a").join(vB.as("b"),
        col("a.hv") === col("b.hv") && cond)
      t("variant B hashkey runCount")(runCount(
        sel(jB).orderBy("a_name", "b_name")))
    }
    spark.stop()
  }
}
