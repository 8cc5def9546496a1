package graft

import org.apache.spark.sql.functions._
import graft.expr.VecExprs.dot_i12

/** r16: the row-local PqAssign codegen argmin must be IDENTICAL to the
  * retired join(broadcast(codebook)) + per-(vec, m) min(struct)
  * aggregation it replaced — including the lowest-code tie-break and
  * empty-cluster (absent-cell) handling — on both e5 codebooks (the
  * sampled init and a refined one with a deliberately removed cell). */
class PqEquivSpec extends SparkSpec {

  private def subsFrame = {
    val emb = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    emb
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(7))).as("m"), col("embedding"))
      .withColumn("sub", expr("slice(embedding, m * 8 + 1, 8)"))
      .withColumn("nrm_s", dot_i12(col("sub"), col("sub")))
      .drop("embedding")
  }

  private def retired(subs: org.apache.spark.sql.DataFrame,
                      cb: org.apache.spark.sql.DataFrame) =
    subs.join(broadcast(cb), "m")
      .withColumn("dist",
        col("nrm_s") - lit(2) * dot_i12(col("sub"), col("cvec")) + col("nrmc"))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("dist"), col("c"))).as("mm"))
      .select(col("vec_id"), col("m"), col("mm.c").as("c"))

  test("PqAssign == retired join+aggregate argmin, incl. tie-break and absent cells") {
    val subs = subsFrame.localCheckpoint()
    val cb0df = subs.filter(col("vec_id") < 16)
      .select(col("m"), col("vec_id").cast("int").as("c"),
        col("sub").as("cvec"), col("nrm_s").as("nrmc"))
      // drop one cell so the absent-cell path is exercised like an
      // empty refined cluster
      .filter(!(col("m") === 3 && col("c") === 7))
      .localCheckpoint()
    val cb = cb0df.collect().toSeq.map(r =>
      (r.getInt(0), r.getInt(1), r.getSeq[Float](2), r.getLong(3)))
    val neu = subs.select(col("vec_id"), col("m"),
      graft.expr.PqAssign.pq_assign(col("sub"), col("m"), col("nrm_s"),
        cb, nSub = 8, k = 16, dim = 8).as("c"))
    val old = retired(subs, cb0df)
    assert(neu.except(old).isEmpty && old.except(neu).isEmpty,
      "row-local PQ assignment diverged from the aggregated argmin")
  }
}
