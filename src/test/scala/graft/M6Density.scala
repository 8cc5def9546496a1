package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r12 verdict #4 — m6 PAST the 16-bit hash-space saturation: the ×10→
  * ×1000 ladder showed a ×12.2 time jump for ×10 data THROUGH the
  * saturation transition, and the claim was that the 128-cap sub-cell
  * salt makes candidates O(n) AFTERWARDS — an argument, not a
  * measurement. This runner measures it Px2Cardinality-style: the
  * expensive decode (the REAL ×1000 PNG hash population, 1.67 M
  * images) runs ONCE, then the population is density-doubled by
  * replication with distinct media_ids (the post-saturation regime:
  * fixed hash space, every bucket's population scales with n) and the
  * pair machinery (Multimodal.phashCandidates / phashBestMatch — the
  * exact code m6 declares) is timed per density. Flattening criterion:
  * candidates/n and seconds/n stay ~constant from ×1000 → ×2000 →
  * ×4000-equivalent density.
  *
  * Run: `SPARK_DRIVER_MEM=24g sbt "Test/runMain graft.M6Density [ks]"`
  * (default ks = 1,2,4). Numbers recorded in BASELINE.md §scale.
  */
object M6Density {
  def main(args: Array[String]): Unit = {
    val ks = args.headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 2, 4))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = ScaleFixture.dir(spark, 1000)
    // one-time decode: the real ×1000 aHash population, parqueted.
    // The cache dir is keyed on the fixture's _manifest token (r13
    // advice): a ScaleFixture regeneration under a new Version bumps
    // the token, so stale hashes are rebuilt instead of silently
    // reused against different content.
    val token = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(d, "_manifest")), "UTF-8").replace('|', '_')
    val hdir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_m6_hashes_x1000_$token")
    if (!new java.io.File(hdir, "_SUCCESS").exists()) {
      val media = graft.multimodal.Multimodal.fromDocuments(
        graft.core.Tables.documents(spark, d).filter(col("doc_id") % 3 === 0))
      graft.multimodal.Multimodal.aHashes(media)
        .write.mode("overwrite").parquet(hdir.getAbsolutePath)
    }
    val base = spark.read.parquet(hdir.getAbsolutePath)
    val n0 = base.count()
    for (k <- ks) {
      // k density-replicas with disjoint id ranges — each bucket's
      // population grows ×k, exactly the past-saturation growth shape
      val pop = (0 until k).map(i =>
          base.select((col("media_id") + lit(i.toLong * 1000000000L)).as("media_id"),
            col("ahash")))
        .reduce(_ unionByName _).localCheckpoint(true)
      val t0 = System.nanoTime()
      val cand = graft.multimodal.Multimodal.phashCandidates(pop).count()
      val t1 = System.nanoTime()
      val best = graft.multimodal.Multimodal.phashBestMatch(pop).count()
      val t2 = System.nanoTime()
      val n = n0 * k
      // Predef.printf, not functions.printf (the wildcard import shadows)
      println(f"[m6density] n $n%9d  candidates $cand%12d (${cand.toDouble / n}%.1f/img, ${(t1 - t0) / 1e9}%6.1f s)  best $best%9d (${(t2 - t1) / 1e9}%6.1f s)  total ${(t2 - t0) / 1e9}%6.1f s")
      pop.queryExecution.analyzed.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
        case _ => ()
      }
    }
    spark.stop()
  }
}
