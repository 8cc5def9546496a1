package graft

import org.apache.spark.sql.SparkSession

/** r9 verdict #8 (stretch) — px2 at 10× TARGET CARDINALITY: the
  * ×100 ScaleDecade row ran 3 000 files / 1 200 targets; real survey
  * cluster mode is ~10⁴–10⁵ targets, where the stress moves from row
  * volume to the (target, bin) shuffle's KEY cardinality, the
  * per-file medians broadcast (one row per FILE), and the 10⁴-group
  * rank-1 window. px2 reads nothing from the corpus tables — its
  * inputs are the derived multi-target FITS dir (file count =
  * 12·`_scale_mult` targets × 1–4 sectors) — so a marker-only dir
  * drives the cardinality directly without building a ×850 corpus.
  *
  * Run: `SPARK_DRIVER_MEM=24g sbt "Test/runMain graft.Px2Cardinality [mult]"`
  * (default mult = 850 → 10 200 targets, ~25 500 files, ~25.5 M
  * samples). Numbers recorded in BASELINE.md §scale.
  */
object Px2Cardinality {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(850)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_px2_card_$mult")
    dir.mkdirs()
    val sm = new java.io.File(dir, "_scale_mult")
    java.nio.file.Files.write(sm.toPath, mult.toString.getBytes("UTF-8"))
    // fixture generation is timed separately from the query (the
    // derivedFixture cache makes re-runs query-only)
    val t0 = System.nanoTime()
    val n = SparkEntry.queries("px2_multi_target")(spark, dir.getAbsolutePath).count()
    val dt1 = (System.nanoTime() - t0) / 1e9
    // second run: fixture warm — the number that lands in BASELINE
    val t1 = System.nanoTime()
    val n2 = SparkEntry.queries("px2_multi_target")(spark, dir.getAbsolutePath).count()
    val dt2 = (System.nanoTime() - t1) / 1e9
    println(f"[px2card] mult=$mult targets=${12 * mult} rows=$n%d (cold ${dt1}%.1f s incl. fixture build) / rows=$n2%d warm ${dt2}%.1f s")
    spark.stop()
  }
}
