package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{toCol, toExpr}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Scalar kernel behind [[PqAssign]]: nearest sub-space centroid by
  * exact integer L2 (dist = |s|² − 2·s·c + |c|² at the DotI12 1e12
  * contract), iterating candidate codes ascending so a strict `<`
  * reproduces min(struct(dist, c))'s lowest-code tie-break. */
object PqKernels {
  def assign(sub: ArrayData, m: Int, nrm: Long,
             cvecs: Array[Float], nrmcs: Array[Long], valid: Array[Boolean],
             k: Int, dim: Int): Int = {
    var best = -1
    var bestD = Long.MaxValue
    var c = 0
    while (c < k) {
      val cell = m * k + c
      if (valid(cell)) {
        var dot = 0L
        var j = 0
        val off = cell * dim
        while (j < dim) {
          dot += VecExprs.roundHalfAway(
            sub.getFloat(j).toDouble * cvecs(off + j).toDouble * 1e12)
          j += 1
        }
        val dist = nrm - 2L * dot + nrmcs(cell)
        if (dist < bestD) { bestD = dist; best = c }
      }
      c += 1
    }
    best
  }
}

/** Row-local product-quantization sub-space assignment (r16, guide
  * §2.3/§2.4): the codebook is driver-held model state (≤ k·dim floats
  * per sub-space), so the per-(vector, sub-space) argmin is one codegen
  * expression over the sub-vector array — the earlier
  * join(broadcast(codebook)) + per-(vec, m) min-aggregation shape paid
  * a k× row blowup plus a corpus-scale aggregation exchange per
  * assignment pass, and the Lloyd-sums join-back additionally shuffled
  * the sub-vector payload. Distances are the same exact integers as
  * the retired form (DotI12's per-element 1e12 rounding, long
  * arithmetic), ties to the lowest code; absent (empty-cluster) cells
  * are skipped exactly like their missing rows. Children:
  * (sub: array<float>, m: int, nrm_s: long). */
case class PqAssign(sub: Expression, m: Expression, nrm: Expression,
                    cvecs: Array[Float], nrmcs: Array[Long],
                    valid: Array[Boolean], k: Int, dim: Int)
  extends TernaryExpression {

  override def first: Expression = sub
  override def second: Expression = m
  override def third: Expression = nrm
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(s: Any, mv: Any, nv: Any): Any =
    PqKernels.assign(s.asInstanceOf[ArrayData], mv.asInstanceOf[Int],
      nv.asInstanceOf[Long], cvecs, nrmcs, valid, k, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cv = ctx.addReferenceObj("pqCvecs", cvecs, "float[]")
    val nc = ctx.addReferenceObj("pqNrmcs", nrmcs, "long[]")
    val vd = ctx.addReferenceObj("pqValid", valid, "boolean[]")
    nullSafeCodeGen(ctx, ev, (s, mv, nv) =>
      s"${ev.value} = graft.expr.PqKernels.assign($s, $mv, $nv, $cv, $nc, $vd, $k, $dim);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(sub = f, m = s, nrm = t)
}

object PqAssign {
  /** Column wrapper: codebook rows as (m, c, cvec: Seq[Float],
    * nrmc: Long) — the collect of the codebook frame. `nSub` is the
    * number of sub-spaces (m ∈ 0..nSub−1). */
  def pq_assign(sub: Column, m: Column, nrm: Column,
                codebook: Seq[(Int, Int, Seq[Float], Long)],
                nSub: Int, k: Int, dim: Int): Column = {
    val cvecs = new Array[Float](nSub * k * dim max 1)
    val nrmcs = new Array[Long](nSub * k max 1)
    val valid = new Array[Boolean](nSub * k max 1)
    codebook.foreach { case (mm, c, v, n) =>
      val cell = mm * k + c
      valid(cell) = true
      nrmcs(cell) = n
      var j = 0
      v.foreach { x => cvecs(cell * dim + j) = x; j += 1 }
    }
    // r17 (advice #2): the kernel returns -1 when EVERY cell of a
    // sub-space is invalid, which the retired join+aggregate form
    // expressed by dropping the (vec, m) row entirely — a silent
    // divergence if a caller ever built such a codebook. Unreachable
    // from e5 (cb0 populates all m), so enforce it at construction.
    (0 until nSub).foreach { mm =>
      require((0 until k).exists(c => valid(mm * k + c)),
        s"pq_assign: sub-space $mm has no valid cell — the -1 sentinel " +
        "must never reach output (the retired form dropped those rows)")
    }
    toCol(PqAssign(toExpr(sub), toExpr(m), toExpr(nrm),
      cvecs, nrmcs, valid, k, dim))
  }
}
