package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage probe (not part of the driver contract): delete or
  * repurpose freely between rounds. r17: e6 SemDeDup at ×100 with
  * CORPUS-SCALED k (verdict #6) — the declared query pins k=16 (the
  * oracle contract), so at ×100 its within-cluster pair stage is
  * Σ csize² ≈ n²/16 by design; the SemDeDup paper scales k with the
  * corpus so csize stays bounded. This probe runs the e6 SHAPE
  * (row-local assignment → within-cluster exact-integer cosine pairs →
  * min-rep dedup) at k = n/125 using the PqAssign kernel for the
  * assignment (1600 literal least() structs would blow the janino
  * method limit — the kernel holds the codebook as reference objects,
  * which is also the honest deployment shape at large k). Reports the
  * candidate-pair volume both ways (k=16 vs scaled k) and times the
  * scaled run; numbers go to COVERAGE.md / OPTIMIZATION_r17.md.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_scale_x100"
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
    import graft.core.Exec.runCount
    import graft.expr.VecExprs.{dot_i12}

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    // The fixture admits a HARD clustering floor: the generator's ramp
    // noise (pmod(vec_id*64+k, 1000)) has period 250 in vec_id, so the
    // ×100 corpus holds only 250 DISTINCT embedding values (measured:
    // count(DISTINCT) = 250 over 200k rows) — identical vectors are
    // inseparable by any codebook and csize can never drop below the
    // duplicate multiplicity (n/250 = 800). The SemDeDup-scaled
    // codebook for THIS corpus is therefore one cell per distinct
    // value: a first-occurrence exemplar table, collected as driver
    // model state like e3's centroids. (A naive every-stride-th sample
    // was measured first: stride 125 aliases the period and collapses
    // the codebook to 2 distinct values → Σ csize² WORSE than k=16 —
    // recorded in OPTIMIZATION_r17.md as the aliasing trap.)
    val cb = emb
      .groupBy(col("embedding")).agg(min(col("vec_id")).as("mv"))
      .orderBy("mv")
      .collect().zipWithIndex
      .map { case (r, i) =>
        val arr = r.getSeq[Float](0)
        val nrmc = arr.map(x =>
          graft.expr.VecExprs.roundHalfAway(x.toDouble * x.toDouble * 1e12)).sum
        (0, i, arr, nrmc)
      }.toSeq
    println(s"[probe] e6-scaled-k: n=$n, k=${cb.size} distinct-value cells " +
      s"(csize floor = duplicate multiplicity ${n / cb.size})")

    val withNorm = emb.withColumn("nrm", dot_i12(col("embedding"), col("embedding")))
    val cidScaled = graft.expr.PqAssign.pq_assign(
      col("embedding"), lit(0), col("nrm"), cb, nSub = 1, k = cb.size, dim = 64)
    // the assignment is O(k·dim) per row (~100k integer ops at k=1600)
    // — at deployment it runs ONCE per curation pass and the pair
    // stage consumes the materialized frame (the d31 edge lifecycle);
    // checkpoint so the timed reps measure the pair stage, with the
    // assignment cost reported separately below
    val tA0 = System.nanoTime()
    val assigned = withNorm.withColumn("cid", cidScaled)
      .select(col("vec_id"), col("cid"), col("embedding"), col("nrm"))
      .localCheckpoint()
    println(f"[probe] one-time assignment + checkpoint: ${(System.nanoTime() - tA0) / 1e9}%.2f s")

    // candidate-pair volume both ways: Σ csize·(csize−1)/2
    def pairVolume(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy("cid").agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) / 2"))).head.getDouble(0).toLong
    val volScaled = pairVolume(assigned)
    println(s"[probe] within-cluster pair volume at scaled k: $volScaled")

    // the declared k=16 volume for contrast (count only — running the
    // dots over it is the quadratic wall the probe demonstrates avoiding)
    val cb16 = (0 until 16).map { cid =>
      val arr = Array.tabulate(64) { j =>
        val u = ((cid * 64 + j).toLong * 2654435761L) % 2147483648L
        ((u % 1025) - 512).toFloat / 1024.0f
      }
      val nrmc = arr.map(x =>
        graft.expr.VecExprs.roundHalfAway(x.toDouble * x.toDouble * 1e12)).sum
      (0, cid, arr.toSeq: Seq[Float], nrmc)
    }
    val vol16 = pairVolume(withNorm.withColumn("cid",
      graft.expr.PqAssign.pq_assign(
        col("embedding"), lit(0), col("nrm"), cb16, nSub = 1, k = 16, dim = 64)))
    println(s"[probe] within-cluster pair volume at declared k=16: $vol16 " +
      f"(scaled-k cut x${vol16.toDouble / math.max(1L, volScaled)}%.1f)")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache(); System.gc()
      r
    }

    // the full e6 tail at scaled k (assignment + pairs + dedup decision)
    (1 to 3).foreach { rep =>
      t(s"e6-shape at k=${cb.size}, rep $rep") {
        val a = assigned.withColumn("csize",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("cid")))
        val b = assigned.select(col("cid").as("b_cid"), col("vec_id").as("vb"),
          col("embedding").as("eb"), col("nrm").as("nb"))
        val dups = a.join(b, col("cid") === col("b_cid") && col("vec_id") < col("vb"))
          .withColumn("sim", (dot_i12(col("embedding"), col("eb")) / 1e12) /
            nullif(sqrt(col("nrm") / 1e12) * sqrt(col("nb") / 1e12), lit(0.0)))
          .filter(col("sim") >= 0.45)
          .groupBy(col("vb").as("vec_id2")).agg(min(col("vec_id")).as("rep"))
        runCount(a.join(dups, col("vec_id") === col("vec_id2"), "left")
          .withColumn("is_dup", col("rep").isNotNull)
          .withColumn("keep_id", coalesce(col("rep"), col("vec_id")))
          .select("vec_id", "cid", "csize", "is_dup", "keep_id"))
      }
    }
    spark.stop()
  }
}

/** r17 t13m decomposition (verdict #7): TimeOne showed t13m FLAT at
  * ~3.4 s across local[2/4/8/32] — if the four per-transit MCMC fits
  * were the wall, halving cores below the 4-way fan-out would double
  * the time; it did not move. This probe times the fit math ITSELF
  * (pure Scala, zero Spark): the 500-bin per-transit series is a pure
  * function of literals (the query's `t0` anchor is a 1-row anchor
  * only), so the exact (t, y) inputs are rebuilt here with the same
  * integer arithmetic and the 4 boxGuessQ+sampleQ chains run serially.
  */
object ProbeT13m {
  def main(args: Array[String]): Unit = {
    val PDAY = 86400000000L; val P7 = 7L * PDAY; val HP = P7 / 2
    val nb = 500; val n = 4500L; val step = 604800000L
    val ttvInj = graft.queries.Advanced.TtvInjUs
    // per-k 500-bin series, exactly the query's integer chain
    val series = (1L to 4L).map { k =>
      val cells = scala.collection.mutable.Map[Long, (Long, Long)]()
      var i = 0L
      while (i < n) {
        val tl = i * step
        val kk = (tl + HP) / P7
        if (kk == k) {
          val off = tl - kk * P7
          val ttv = ttvInj((kk - 1).toInt)
          val r = (i % 65536L * 1103515245L + 12345L) % 2147483648L
          val noise = (r.toDouble / 2147483648.0 - 0.5) * 0.004
          val flux = 1.0 -
            (if (math.abs(off - ttv) < PDAY / 2) 0.03 else 0.0) + noise
          val fc = graft.expr.VecExprs.roundHalfAway(flux * 1e6)
          val ph = (off + (P7 + P7 / 4)) % P7
          val b = (ph * nb) / P7
          val (c0, s0) = cells.getOrElse(b, (0L, 0L))
          cells(b) = (c0 + 1, s0 + fc)
        }
        i += 1
      }
      k -> cells.toSeq.sortBy(_._1)
    }
    (1 to 3).foreach { rep =>
      var total = 0.0
      series.foreach { case (k, rs) =>
        val t0 = System.nanoTime()
        val t = rs.map { case (b, _) => (b.toDouble + 0.5) * 7.0 / nb }.toArray
        val y = rs.map { case (_, (cn, sv)) => sv.toDouble / cn / 1e6 }.toArray
        val llq = graft.model.Ensemble.boxLlq(t, y, scale = 7.5e11, period = 7.0) _
        val yq = y.map(v => graft.expr.VecExprs.roundHalfAway(v * 1e9))
        val guess = graft.model.Ensemble.boxGuessQ(t, yq, 7.0, 1.0)
        val (samples, _) = graft.model.Ensemble.sampleQ(llq,
          lo = Array(-0.2, -3.5, 0.2), hi = Array(0.2, 3.5, 2.0),
          nWalkers = 100, nSteps = 100, burnFrac = 0.3, seed = 42L + k,
          init = guess, ballFrac = 0.005)
        val pct = graft.model.Ensemble.percentiles(samples)
        val sec = (System.nanoTime() - t0) / 1e9
        total += sec
        println(f"[probe-t13m] rep $rep fit k=$k: $sec%.3f s " +
          f"(oc=${(pct(1)(1) - 1.75) * 1440.0}%.3f)")
      }
      println(f"[probe-t13m] rep $rep all 4 fits serial: $total%.3f s")
    }
    // Part 2: stage-level decomposition of the DECLARED query — does
    // the fit stage run its 4 tasks concurrently (stage wall ≈ one
    // fit) or serialized (stage wall ≈ 4 fits)?
    if (args.nonEmpty) {
      val sfDir = args(0)
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val ms = for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s
          println(f"[probe-t13m] stage ${si.stageId}%3d tasks=${si.numTasks}%3d " +
            f"wall=${ms.getOrElse(-1L) / 1000.0}%6.2f s  ${si.name.take(60)}")
        }
      })
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        graft.core.Exec.runCount(SparkEntry.queries("t13m_mcmc_ttv")(spark, sfDir))
        println(f"[probe-t13m] declared query rep $rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.catalog.clearCache()
      }
      spark.stop()
    }
  }
}
