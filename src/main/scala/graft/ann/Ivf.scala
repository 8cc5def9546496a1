package graft.ann

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) approximate nearest neighbor over an embedding
  * column — the coarse-quantizer scale path next to sign-LSH
  * (TextQueries e2): k-means-lite centroids, vectors bucketed by
  * nearest centroid, queries probe the `nProbe` nearest lists and run
  * exact cosine only inside them. At 100 TB the centroid set stays
  * broadcast-sized and the posting lists are the shuffle key.
  *
  * Deterministic: centroids seed from the lowest vec_ids, Lloyd
  * iterations are plain DataFrame aggregations (driver loop).
  */
object Ivf {

  /** (vec_id, pos, x) exploded dims of an embeddings table. */
  private def dims(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .withColumn("x", col("x").cast("double"))

  /** Assign every vector to its nearest centroid (squared L2).
    * centroids: (cid, pos, c). Returns (vec_id, cid). */
  private def assign(d: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(asc("dist"), asc("cid"))
    d.join(broadcast(centroids), "pos")
      .groupBy("vec_id", "cid")
      .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "cid")
  }

  /** Train k centroids with `iters` Lloyd rounds. */
  def train(emb: DataFrame, k: Int, iters: Int = 2): DataFrame = {
    val d = dims(emb).persist()
    var centroids = d
      .join(emb.select(col("vec_id")).orderBy("vec_id").limit(k)
        .withColumn("cid", (row_number().over(Window.orderBy("vec_id")) - 1)), "vec_id")
      .select(col("cid"), col("pos"), col("x").as("c"))
    for (_ <- 1 to iters) {
      val a = assign(d, centroids)
      centroids = d.join(a, "vec_id")
        .groupBy("cid", "pos").agg(avg(col("x")).as("c"))
    }
    val out = centroids.persist()
    out.count()
    d.unpersist()
    out
  }

  /** Probe: for query vec_ids, search the `nProbe` nearest posting
    * lists, exact cosine inside. Returns (q_id, rank, vec_id, sim). */
  def search(emb: DataFrame, centroids: DataFrame, queryIds: Seq[Long],
             nProbe: Int, topK: Int): DataFrame = {
    val d = dims(emb).persist()
    val assigned = assign(d, centroids).persist()
    val qd = d.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("pos").as("qpos"), col("x").as("qx"))
    // nearest nProbe centroids per query
    val wq = Window.partitionBy("q_id").orderBy(asc("dist"), asc("cid"))
    val probes = qd.join(broadcast(centroids), col("qpos") === col("pos"))
      .groupBy("q_id", "cid")
      .agg(sum((col("qx") - col("c")) * (col("qx") - col("c"))).as("dist"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select("q_id", "cid")
    // candidates: vectors in probed lists
    val cands = probes.join(assigned, "cid")
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id").distinct()
    val norms = d.groupBy("vec_id").agg(sum(col("x") * col("x")).as("nrm"))
    val dots = cands
      .join(qd, "q_id")
      .join(d.select(col("vec_id"), col("pos"), col("x")),
        Seq("vec_id"), "inner")
      .filter(col("qpos") === col("pos"))
      .groupBy("q_id", "vec_id")
      .agg(sum(col("qx") * col("x")).as("dot"))
    val wr = Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))
    val out = dots
      .join(norms.select(col("vec_id").as("q_id"), col("nrm").as("qn")), "q_id")
      .join(norms, "vec_id")
      .withColumn("sim", col("dot") / sqrt(col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= topK)
      .select("q_id", "rank", "vec_id", "sim")
    out
  }
}
