package graft

import org.apache.spark.sql.functions._

/** d2's dense/sparse strategy gate: the fixtures' small bigram
  * universe always selects the dense bitmap path, so the sparse
  * shared-bigram bucket join — the 100 TB shape — would otherwise
  * ship untested. A synthetic corpus with >4096 distinct bigrams
  * forces the sparse gate through the REAL plan (AQE empty-relation
  * pruning of the dense branch), checked against brute-force Jaccard
  * computed in Scala. */
class JaccardSparseSpec extends SparkSpec {
  import spark.implicits._

  test("sparse bucket-join path activates past the universe gate and matches brute force") {
    // 100 docs, each 120 tokens drawn from a per-doc-salted LCG over a
    // 9000-word vocabulary → bigram universe ≫ 4096; consecutive doc
    // pairs (2k, 2k+1) share a long prefix so real near-dups exist.
    def tokens(doc: Int): Seq[String] = {
      val salt = doc / 2 // pair-mates share a stream...
      val own = doc % 2  // ...then diverge in the tail
      (0 until 120).map { i =>
        val stream = if (i < 100) salt * 7919 + i else salt * 7919 + own * 131071 + i
        s"w${(stream.toLong * 1103515245L + 12345L) % 9001L}" // prime modulus — a composite one collapses the LCG range (gcd with the multiplier)
      }
    }
    val docs = (0 until 100).map(i => (i.toLong, tokens(i).mkString(" "), "s0"))
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft_sparse").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("d2_ngram_jaccard")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    // brute-force oracle in plain Scala
    def bigrams(doc: Int): Set[String] =
      tokens(doc).sliding(2).map(_.mkString(" ")).toSet
    val expected = (for {
      a <- 0 until 100; b <- a + 1 until 100
      ba = bigrams(a); bb = bigrams(b)
      inter = (ba intersect bb).size
      j = inter.toDouble / (ba.size + bb.size - inter)
      if j > 0.4
    } yield (a.toLong, b.toLong) -> ((inter.toLong, math.rint(j * 1e6) / 1e6))).toMap

    assert(expected.nonEmpty, "fixture produced no near-dup pairs")
    assert(out.keySet === expected.keySet,
      s"pair sets differ: extra=${out.keySet diff expected.keySet} missing=${expected.keySet diff out.keySet}")
    out.foreach { case (k, v) => assert(v === expected(k), s"pair $k differs") }

    // and the gate really chose sparse: the universe exceeds the gate
    val nu = docs.select(explode(expr(
      """array_distinct(zip_with(
        |  slice(split(text, ' '), 1, size(split(text, ' ')) - 1),
        |  slice(split(text, ' '), 2, size(split(text, ' ')) - 1),
        |  (x, y) -> concat(x, ' ', y)))""".stripMargin)).as("bg"))
      .agg(countDistinct("bg")).head.getLong(0)
    assert(nu > 4096, s"fixture universe $nu does not force the sparse gate")
  }
}
