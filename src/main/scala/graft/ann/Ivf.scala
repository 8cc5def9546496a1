package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.expr.VecExprs.{dot_i12, l2sq_fd}

/** IVF (inverted-file) approximate nearest neighbor over an embedding
  * column — the coarse-quantizer scale path next to sign-LSH
  * (TextQueries e2): k-means-lite centroids, vectors bucketed by
  * nearest centroid, queries probe the `nProbe` nearest lists and run
  * exact cosine only inside them. At 100 TB the centroid set stays
  * broadcast-sized (k·dim doubles) and the posting lists are the
  * shuffle key.
  *
  * ALL vector math is array-local — the codegen'd L2SqFD / DotI12
  * kernels run over the embedding arrays in place. (The round-1 form
  * exploded every vector into (vec_id, pos, x) rows: a dim× row blowup
  * plus a row_number window per assignment round. At dim 768 that is
  * 768× the shuffle volume for the same answer.)
  *
  * Deterministic: centroids seed from the lowest vec_ids; the centroid
  * update accumulates Σ round(x·1e6) per dim as LONG (order-independent
  * across partitions); assignment ties break on lowest cid via a
  * lexicographic least() over (dist, cid) structs — no windows
  * anywhere in the per-vector path.
  *
  * r16 (guide §2.3/§2.4): assignment is ROW-LOCAL. The centroid set is
  * driver-held model state by contract, so the per-vector argmin is one
  * codegen projection over the embedding array — the earlier
  * crossJoin(k×) + per-vector min-aggregation + join-back shape paid a
  * k× row blowup, an aggregation exchange, AND a full shuffle of the
  * embedding payload per Lloyd round, all to recompute information
  * that never left the row.
  */
object Ivf {

  /** Materialize driver-side centroids as a broadcastable (cid, cvec)
    * DataFrame — k·dim doubles, tiny by contract. (Probe routing still
    * joins this frame; per-vector assignment uses [[nearestCid]].) */
  private def centroidDF(spark: SparkSession,
                         cents: Array[(Int, Array[Double])]): DataFrame = {
    import spark.implicits._
    cents.toSeq.map { case (cid, v) => (cid, v.toSeq) }.toDF("cid", "cvec")
  }

  /** Nearest-centroid id as a single row-local expression: least() over
    * k (dist, cid) structs compares lexicographically — exactly the
    * retired min(struct(dist, cid)) aggregation semantics (ties to the
    * lowest cid; every centroid present; no nulls) with zero exchanges
    * and no k× intermediate rows. Distances go through the same L2SqFD
    * kernel against the same double centroid arrays, so the assignment
    * is bit-identical to the aggregated form. */
  private def nearestCid(cents: Array[(Int, Array[Double])]): Column =
    if (cents.length == 1) lit(cents.head._1)
    else least(cents.map { case (cid, v) =>
      struct(l2sq_fd(col("embedding"), typedLit(v.toSeq)).as("d"),
        lit(cid).as("c"))
    }.toIndexedSeq: _*).getField("c")

  /** Assign every vector to its nearest centroid (squared L2, ties to
    * the lowest cid). Pure projection — no shuffle. Returns
    * (vec_id, cid). */
  def assign(emb: DataFrame, cents: Array[(Int, Array[Double])]): DataFrame =
    emb.select(col("vec_id"), nearestCid(cents).as("cid"))

  /** Train k centroids with `iters` Lloyd rounds. `dim` is the
    * embedding dimensionality (IVF config, like k). The per-round
    * centroid update is dim parallel integer sums — codegen'd,
    * map-side combined, order-independent — over the row-local
    * assignment, so each round is ONE map-side-combined aggregation
    * job (k groups) with no embedding-payload shuffle. The k×dim
    * result is collected to the driver each round (by design: it is
    * the broadcast model state, not data). */
  def train(emb: DataFrame, k: Int, iters: Int = 2, dim: Int = 64):
      Array[(Int, Array[Double])] = {
    var cents: Array[(Int, Array[Double])] =
      emb.select(col("vec_id"), col("embedding")).orderBy("vec_id").limit(k)
        .collect().zipWithIndex.map { case (r, i) =>
          (i, r.getSeq[Float](1).map(_.toDouble).toArray)
        }
    // RoundAwayD, not functions.round: bit-identical HALF_UP in this
    // envelope (|x·1e6| ≪ 2^52) without the per-row-per-dim BigDecimal
    // allocation (the r15/r16 rounding-tax lesson, applied to the one
    // engine-side round() site that remained).
    val sums = (0 until dim).map(j =>
      sum(graft.core.Tables.roundAway(
        element_at(col("embedding"), j + 1).cast("double") * 1e6)
        .cast("long")).as(s"s$j"))
    for (_ <- 1 to iters) {
      val upd = emb
        .withColumn("cid", nearestCid(cents))
        .groupBy("cid")
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
      cents = upd.map { r =>
        val n = r.getLong(r.fieldIndex("n")).toDouble
        (r.getInt(r.fieldIndex("cid")),
          (0 until dim).map(j => r.getLong(r.fieldIndex(s"s$j")) / 1e6 / n).toArray)
      }.sortBy(_._1)
    }
    cents
  }

  /** Probe: for query vec_ids, search the `nProbe` nearest posting
    * lists, exact integerized cosine inside (same 1e12 contract as
    * e1/e2). Returns (q_id, rank, vec_id, sim). */
  def search(emb: DataFrame, cents: Array[(Int, Array[Double])],
             queryIds: Seq[Long], nProbe: Int, topK: Int): DataFrame = {
    val spark = emb.sparkSession
    val cdf = centroidDF(spark, cents)
    val assigned = assign(emb, cents)
    val withNorm = emb.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", dot_i12(col("embedding"), col("embedding")))
    val q = withNorm.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    // nearest nProbe centroids per query: |queries|·k rows, tiny.
    val wq = Window.partitionBy("q_id").orderBy(asc("dist"), asc("cid"))
    val probes = q.crossJoin(broadcast(cdf))
      .withColumn("dist", l2sq_fd(col("qe"), col("cvec")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select("q_id", "cid")
    // candidates: vectors in probed lists — cid is the shuffle key.
    val cands = probes.join(assigned, "cid")
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id").distinct()
    val wr = Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))
    cands
      .join(withNorm, "vec_id")
      .join(broadcast(q), "q_id")
      .withColumn("dot", dot_i12(col("qe"), col("embedding")))
      .withColumn("sim", (col("dot") / 1e12) /
        nullif(sqrt(col("qn") / 1e12) * sqrt(col("nrm") / 1e12), lit(0.0)))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= topK)
      .select("q_id", "rank", "vec_id", "sim")
  }
}
