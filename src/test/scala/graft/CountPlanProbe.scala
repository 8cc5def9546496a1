package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** r15 probe: which declared queries lose real work under `.count()`?
  * Catalyst prunes cardinality-preserving operators (Project, Sort,
  * Window) below a count aggregate, so a bench that times
  * `query.count()` measures only a scan-count for queries whose heavy
  * work is windows/projections. Prints, per query, the heavy node
  * types present in the query's own optimized plan but absent from
  * its count plan. Run: Test/runMain graft.CountPlanProbe [sfDir]. */
object CountPlanProbe {
  def heavy(p: LogicalPlan): Map[String, Int] = {
    val names = p.collect {
      case n if Seq("Window", "Join", "Aggregate", "Generate", "Expand",
        "Union", "Distinct", "Deduplicate", "FlatMapGroups", "MapGroups",
        "MapPartitions", "CoGroup", "Intersect", "Except", "Sort")
        .exists(n.nodeName.startsWith) => n.nodeName
    }
    names.groupBy(identity).map { case (k, v) => k -> v.size }
  }
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val full = heavy(df.queryExecution.optimizedPlan)
        val cnt = heavy(df.groupBy().count().queryExecution.optimizedPlan)
        val lost = full.flatMap { case (k, n) =>
          val miss = n - cnt.getOrElse(k, 0)
          if (miss > 0) Some(s"$k x$miss") else None
        }
        if (lost.nonEmpty) println(s"[countprune] $name LOSES ${lost.mkString(", ")}")
      } catch { case e: Throwable =>
        println(s"[countprune] $name probe-error ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
