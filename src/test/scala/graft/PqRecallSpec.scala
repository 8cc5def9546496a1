package graft

/** Quality gate for e5_pq_adc: the oracle pins WHAT the operator
  * computes bit-exactly; this spec pins that what it computes is a
  * decent ANN — mean recall@5 of the ADC-shortlist + exact-rerank
  * output against brute-force exact L2 top-5. The codebook is a
  * sampled init refined by one Lloyd round; on this near-isotropic
  * corpus ADC distortion saturates with codebook quality, so the
  * 50-wide rerank shortlist is what carries the ≥0.8 bar (width 20
  * measured 0.48–0.64 across K∈{16,32,64} × 1–3 rounds). */
class PqRecallSpec extends SparkSpec {

  test("e5 ADC+rerank mean recall@5 vs exact L2") {
    val emb = graft.core.Tables.embeddings(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toMap
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val exact = (0L until 5L).map { q =>
      q -> emb.keys.filter(_ != q).toSeq
        .sortBy(v => (d2(emb(q), emb(v)), v)).take(5).toSet
    }.toMap

    val out = SparkEntry.queries("e5_pq_adc")(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }

    val recalls = (0L until 5L).map(q =>
      (exact(q) & out.getOrElse(q, Set.empty)).size / 5.0)
    val mean = recalls.sum / recalls.size
    info(s"per-query recall@5: ${recalls.mkString(", ")} (mean $mean)")
    assert(mean >= 0.8, s"mean recall@5 $mean below the sampled-codebook floor")
    // every reranked hit must be a genuine shortlist member: rank
    // column dense 1..5 per query
    assert(out.values.forall(_.size == 5))
  }
}
