package graft

import org.apache.spark.sql.SparkSession

/** One-off plan audit for the disc-break scan (r14): prints the number
  * of Exchange and Window nodes in the detrend plan with discBreaks
  * on vs off — the structural claim behind the measured on/off ratio
  * is "extra window columns, ZERO extra exchanges".
  * Run: `Test/runMain graft.DiscPlanCheck`. */
object DiscPlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false") // structural audit: no AQE wrapper
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = ScaleFixture.dir(spark, 1)
    for (disc <- Seq(true, false)) {
      val df = graft.ops.Detrend.detrend(DetrendDiscDecade.series(spark, d),
        Seq("part"), "t_us", "id", "value", "err", gapUs = 86400000000L,
        mode = "GaussianProcess", timescaleDays = 2.0, discBreaks = disc)
      val plan = df.queryExecution.executedPlan
      def cnt(p: org.apache.spark.sql.execution.SparkPlan,
              f: org.apache.spark.sql.execution.SparkPlan => Boolean): Int =
        (if (f(p)) 1 else 0) + p.children.map(cnt(_, f)).sum
      val nEx = cnt(plan, _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
      val nWin = cnt(plan, _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec])
      val nSort = cnt(plan, _.isInstanceOf[org.apache.spark.sql.execution.SortExec])
      println(s"disc=$disc shuffles=$nEx windowExecs=$nWin sorts=$nSort")
    }
    spark.stop()
  }
}
