package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.VecExprs.roundHalfAway

/** Matrix-free power iteration over a table of float vectors (the
  * PCA/whitening stage ahead of semantic dedup / clustering). Each
  * round computes w ← Σ_r x·(xᵀv) as ONE scalar aggregation — `dims`
  * map-side-combined integer sums, no shuffle key, one partial row per
  * partition — and renormalizes v ← w/max|w| on the driver, which
  * holds only the dims-long state vector between rounds (the e3/d26
  * division of labor). The Gram/covariance matrix is never built.
  *
  * Arithmetic contract (cross-engine exact): v is quantized at 1e6;
  * per-row projections dd = Σ_j round(x_j·vq_j) and column sums
  * w_j = Σ_r round(x_j·dd_r) use half-away rounding over DOUBLE
  * products (the explicit cast matters: Spark's numeric precedence
  * would otherwise run float×long in FLOAT while DuckDB runs DOUBLE),
  * and the renormalization round(w/m·1e6) is the same op sequence in
  * Scala, Spark SQL, and DuckDB — so an unrolled CTE replay matches
  * bit-for-bit at any round count.
  *
  * On an isotropic corpus (no eigengap — the synthetic embeddings
  * fixture) a small round count is a partial iterate, not a converged
  * eigenvector; convergence in few rounds needs a spectral gap
  * (planted-direction property test in SketchPcaSpec). BIGINT
  * headroom at 100 TB: |w_j| ≤ N·max|x|·max|dd| — past ~1e9 rows drop
  * the projection quantum to 1e4 (same formula, 100× headroom) or
  * renormalize per shard before the final merge.
  */
object PowerIter {

  /** Run `rounds` integer power-iteration rounds over `vecs` (one
    * ArrayType(FloatType) column named `col`). Returns (w, vq): the
    * final round's raw integer column sums and the quantized (1e6)
    * renormalized vector. */
  def iterate(vecs: DataFrame, vecCol: String, dims: Int, rounds: Int):
      (Array[Long], Array[Long]) = {
    def el(j: Int): Column = element_at(col(vecCol), j + 1).cast("double")
    // primitive half-away round: the BigDecimal round() costs ~1 us/row
    // and this runs per (vector x dim x round) — see Tables.roundAway
    def roundL(c: Column): Column = graft.core.Tables.roundAway(c).cast("long")
    var vq = Array.fill(dims)(1000000L) // v0 = all-ones, quantized 1e6
    var w = new Array[Long](dims)
    (1 to rounds).foreach { _ =>
      val dd = (0 until dims).map(j => roundL(el(j) * lit(vq(j)))).reduce(_ + _)
      val sums = (0 until dims).map(j => sum(roundL(el(j) * col("dd"))).as(s"w$j"))
      val row = vecs.withColumn("dd", dd).agg(sums.head, sums.tail: _*).collect()(0)
      w = Array.tabulate(dims)(row.getLong)
      val m = w.map(math.abs).max.toDouble
      // same op sequence as the oracle's round(w / m * 1000000)
      vq = w.map(x => roundHalfAway(x.toDouble / m * 1e6))
    }
    (w, vq)
  }
}
