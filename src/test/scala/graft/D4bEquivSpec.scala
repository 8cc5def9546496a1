package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactness pin for d4b's 2×16-bit MULTIPROBE banding (r16): any
  * 2-band variant of the Manku 4-band pigeonhole needs its own proof
  * (H≤3 does NOT guarantee an exactly-agreeing 16-bit half — only a
  * half with ≤1 differing bit, which the one-bit-flip probes cover).
  * This spec grounds the argument two independent ways on the sf0.001
  * corpus:
  *   (a) BRUTE FORCE — every doc pair's popcount over the same 32-bit
  *       simhashes, thresholded at 3 (no banding at all);
  *   (b) the retired 4×8 EXACT-BAND reference plan (agree on ≥1 byte
  *       band, popcount gate, shared-band count via groupBy).
  * The declared d4b must equal both, frame-for-frame (values AND
  * order), including the hamming and n_shared_bands columns.
  */
class D4bEquivSpec extends SparkSpec {

  private def collectFrame(df: DataFrame): Seq[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  private def simhashes: DataFrame = {
    // reuse the DECLARED query's signature stage by projecting it back
    // out of d4b's lineage is not possible — rebuild the same simhash
    // (32-bit vote aggregation over distinct tokens, identical exprs)
    val H = graft.text.TextOps.md5Hash32Fast("tok")
    val toks = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "").distinct()
      .withColumn("h", expr(H))
    val votes = (0 until 32).map(j =>
      sum(expr(s"2 * ((h div ${1L << j}) % 2) - 1")).as(s"s$j"))
    toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .withColumn("simhash", (0 until 32).map(j =>
        when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _))
      .select("doc_id", "simhash")
  }

  test("multiprobe d4b == brute-force popcount pairs == 4x8 exact-band reference") {
    val declared = collectFrame(SparkEntry.queries("d4b_simhash_pairs")(spark, sf))

    val sh = simhashes.cache()
    val rhsAll = sh.select(col("doc_id").as("b_id"), col("simhash").as("sh2"))
    // (a) brute force: full i<j cross join + popcount threshold
    val brute = sh.join(rhsAll, col("doc_id") < col("b_id"))
      .withColumn("hamming", expr("bit_count(simhash ^ sh2)"))
      .filter(col("hamming") <= 3)
      .withColumn("x32", expr("simhash ^ sh2"))
      .select(col("doc_id").as("a_id"), col("b_id"),
        col("hamming").cast("long").as("hamming"),
        (0 until 4).map(b => when(expr(s"(x32 div ${1L << (8 * b)}) % 256") === 0,
          1L).otherwise(0L)).reduce(_ + _).as("n_shared_bands"))
      .orderBy("a_id", "b_id")
    assert(collectFrame(brute) == declared,
      "multiprobe d4b diverges from brute-force popcount pairs")

    // (b) the retired exact-band reference (agree on >=1 of 4 byte
    // bands; n_shared_bands as the per-pair band count)
    val bands = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        expr(s"(simhash div ${1L << (8 * b)}) % 256").as("bv"))): _*)).as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    val rhs = bands.select(col("band").as("band2"), col("bv").as("bv2"),
      col("doc_id").as("b_id"), col("simhash").as("sh2"))
    val reference = bands.join(rhs,
        col("band") === col("band2") && col("bv") === col("bv2") &&
        col("doc_id") < col("b_id"))
      .withColumn("hamming", expr("bit_count(simhash ^ sh2)"))
      .filter(col("hamming") <= 3)
      .groupBy(col("doc_id").as("a_id"), col("b_id"), col("hamming"))
      .agg(count(lit(1)).as("n_shared_bands"))
      .select(col("a_id"), col("b_id"), col("hamming").cast("long").as("hamming"),
        col("n_shared_bands").cast("long").as("n_shared_bands"))
      .orderBy("a_id", "b_id")
    assert(collectFrame(reference) == declared,
      "multiprobe d4b diverges from the 4x8 exact-band reference")
    assert(declared.nonEmpty, "vacuous corpus: no Hamming<=3 pairs at sf0.001")
    sh.unpersist()
  }
}
