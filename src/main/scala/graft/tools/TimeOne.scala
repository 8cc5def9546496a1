package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch query timer: runMain graft.tools.TimeOne <q1[,q2,...]> [runs] [sfDir].
  * Mirrors Bench's session config at SPARK_GRAFT_CPUS (default 4). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val qs = args(0).split(',')
    val runs = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    qs.foreach { q =>
      val times = (1 to runs).map { i =>
        val t0 = System.nanoTime()
        graft.core.Exec.runCount(graft.SparkEntry.queries(q)(spark, sfDir))
        spark.catalog.clearCache(); System.gc()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"$q run $i: $s%.2f s")
        s
      }
      println(f"$q median ${times.sorted.apply(runs / 2)}%.2f s (${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
