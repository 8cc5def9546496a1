package graft

import org.apache.spark.sql.functions._
import graft.ann.Ivf

/** IVF ANN must find a healthy fraction of the exact top-k while
  * searching only a few posting lists. */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF recall@10 vs brute force is high with nProbe=4 of k=8") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val queries = Seq(0L, 1L, 2L)

    // exact top-10 per query (cosine)
    val d = emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .withColumn("x", col("x").cast("double"))
    val norms = d.groupBy("vec_id").agg(sum(col("x") * col("x")).as("nrm"))
    val qd = d.filter(col("vec_id").isin(queries: _*))
      .select(col("vec_id").as("q_id"), col("pos"), col("x").as("qx"))
    val exact = qd.join(d, "pos")
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id").agg(sum(col("qx") * col("x")).as("dot"))
      .join(norms.select(col("vec_id").as("q_id"), col("nrm").as("qn")), "q_id")
      .join(norms, "vec_id")
      .withColumn("sim", col("dot") / sqrt(col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(desc("sim"), asc("vec_id"))))
      .filter(col("rank") <= 10)
      .select("q_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    val centroids = Ivf.train(emb, k = 8, iters = 2)
    val approx = Ivf.search(emb, centroids, queries, nProbe = 4, topK = 10)
      .select("q_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    queries.foreach { q =>
      val recall = (exact(q) intersect approx.getOrElse(q, Set.empty)).size / 10.0
      assert(recall >= 0.5, s"query $q recall $recall; got ${approx.get(q)}")
    }
  }
}
