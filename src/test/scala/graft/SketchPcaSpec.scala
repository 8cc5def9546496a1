package graft

import org.apache.spark.sql.functions._

/** Properties of d29 (CountMin sketch) and e9 (power iteration) that
  * the DuckDB oracle replay can't state on its own:
  *
  * - d29: the CMS guarantee est ≥ true for every reported token, and
  *   that the 4×64 grid actually collides on this corpus (otherwise
  *   min-of-rows would be vacuously est = true), plus conservation —
  *   each sketch row's cells sum to the total token stream length.
  * - e9: the 3-round quantized integer iteration lands on the SAME
  *   dominant eigenvector as an independent 50-round float power
  *   iteration run driver-side on the collected corpus (|cos| close
  *   to 1) — i.e. the integerization is an arithmetic contract, not a
  *   different algorithm.
  */
class SketchPcaSpec extends SparkSpec {

  test("d29: est >= true count everywhere, collisions exercised, rows conserve the stream") {
    val rows = SparkEntry.queries("d29_cms_heavy")(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (cnt, est) = (r.getLong(1), r.getLong(2))
      assert(est >= cnt, s"CMS must overestimate: ${r.getString(0)} est=$est < cnt=$cnt")
    }
    assert(rows.exists(r => r.getLong(2) > r.getLong(1)),
      "64-wide grid over this vocabulary should collide at least once")
    // conservation: every one of the 4 sketch rows distributes the
    // whole token stream across its 64 cells (Σ cells = stream length)
    val toks = graft.core.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("h", expr(graft.text.TextOps.md5Hash32Fast("tok")))
    val nTok = toks.count()
    val perRow = toks.select(explode(array((0 until 4).map(i =>
        struct(lit(i.toLong).as("rw"),
          (expr(graft.text.TextOps.minhashExpr("h", i)) % 64).as("bucket"))): _*)).as("c"))
      .groupBy(col("c.rw").as("rw")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1))
    assert(perRow.length == 4 && perRow.forall(_ == nTok),
      s"each sketch row must conserve the stream: ${perRow.toSeq} vs $nTok")
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
  }

  test("e9: the integer recurrence IS float power iteration (same 3 rounds, |cos|~1)") {
    // Quantization at 1e6 must be an arithmetic detail, not a different
    // algorithm: an unquantized double replica of the same 3 rounds
    // (same max|w| renormalization) lands on the same direction.
    val out = SparkEntry.queries("e9_power_iter")(spark, sf).collect()
      .map(r => r.getLong(2).toDouble / 1e6)
    val xs = graft.core.Tables.embeddings(spark, sf)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    var v = Array.fill(64)(1.0)
    (1 to 3).foreach { _ =>
      val w = new Array[Double](64)
      xs.foreach { x =>
        var dot = 0.0; var j = 0
        while (j < 64) { dot += x(j) * v(j); j += 1 }
        j = 0; while (j < 64) { w(j) += x(j) * dot; j += 1 }
      }
      val m = w.map(math.abs).max
      v = w.map(_ / m)
    }
    val c = math.abs(cos(out, v))
    assert(c > 0.9999, s"quantized rounds diverged from the float rounds: |cos|=$c")
  }

  test("e9 kernel converges to a planted dominant direction in 3 rounds") {
    // The embeddings fixture is isotropic (top eigenvalue ratios ~0.98
    // — no eigengap, so NO round count converges there; that is a
    // property of the data, not the operator). Convergence is proven
    // where convergence is defined: rows = 5·u + deterministic noise
    // plant a spectral gap, and 3 rounds of the SAME kernel recover u.
    import spark.implicits._
    val dims = 16
    val u = Array.tabulate(dims)(j => math.sin(j + 1.0))
    val un = { val n = math.sqrt(u.map(x => x * x).sum); u.map(_ / n) }
    val rows = (0 until 200).map { r =>
      Array.tabulate(dims) { j =>
        val noise = math.sin(r * 37.0 + j * 11.0) * 0.5 // deterministic
        (5.0 * un(j) + noise).toFloat
      }.toSeq
    }
    val df = rows.toDF("embedding")
    val (_, vq) = graft.ann.PowerIter.iterate(df, "embedding", dims, rounds = 3)
    val c = math.abs(cos(vq.map(_.toDouble / 1e6), un))
    assert(c > 0.99, s"planted direction not recovered: |cos|=$c")
  }
}
