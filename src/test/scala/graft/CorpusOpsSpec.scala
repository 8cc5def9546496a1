package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-4 corpus operators (d18–d20, e6)
  * beyond the DuckDB hash gate: redaction consistency, decontamination
  * flag logic, sampling-rate/cap discipline, and SemDeDup's
  * representative ordering.
  */
class CorpusOpsSpec extends SparkSpec {

  test("d18: scrub hash differs from raw hash exactly when a hit was redacted") {
    val out = SparkEntry.queries("d18_pii_scrub")(spark, sf)
    val raw = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("raw_md5"))
    val joined = out.join(raw, "doc_id").cache()
    try {
      assert(joined.filter(col("n_hits") > 0 && col("scrub_md5") === col("raw_md5")).count() === 0)
      assert(joined.filter(col("n_hits") === 0 && col("scrub_md5") =!= col("raw_md5")).count() === 0)
      // redaction must exist somewhere in the fixture, else the test is vacuous
      assert(joined.filter(col("n_hits") > 0).count() > 0)
    } finally joined.unpersist()
  }

  test("d19: contaminated implies ratio >= 0.8; overlap never exceeds trigram count") {
    val out = SparkEntry.queries("d19_decontaminate")(spark, sf).cache()
    try {
      assert(out.filter(col("n_overlap") > col("n_tg")).count() === 0)
      assert(out.filter(col("contaminated") && col("n_overlap") * 10 < col("n_tg") * 8).count() === 0)
      // benchmark docs themselves never appear as training rows
      assert(out.filter(col("doc_id") % 50 === 0).count() === 0)
      assert(out.count() > 0)
    } finally out.unpersist()
  }

  test("d20: hash gate below rate, per-language cap respected") {
    val out = SparkEntry.queries("d20_stratified_sample")(spark, sf).cache()
    try {
      val rates = Map("en" -> 9, "de" -> 6, "es" -> 4, "fr" -> 3, "zh" -> 2)
      val byLang = out.groupBy("lang")
        .agg(count(lit(1)).as("n"), max(col("h")).as("maxh"), max(col("rn")).as("maxrn"))
        .collect()
      byLang.foreach { r =>
        val lang = r.getString(0)
        assert(r.getLong(1) <= 40, s"$lang over cap")
        assert(r.getLong(2) < rates(lang), s"$lang hash >= rate")
        assert(r.getInt(3) <= 40)
      }
      // the gate is a pure filter: every sampled doc must exist verbatim
      val docs = graft.core.Tables.documents(spark, sf).select("doc_id", "lang", "source")
      assert(out.select("doc_id", "lang", "source").except(docs).count() === 0)
    } finally out.unpersist()
  }

  test("e6: representative precedes its duplicates and shares the cluster") {
    val out = SparkEntry.queries("e6_semdedup")(spark, sf).cache()
    try {
      assert(out.filter(col("is_dup") && col("keep_id") >= col("vec_id")).count() === 0)
      assert(out.filter(!col("is_dup") && col("keep_id") =!= col("vec_id")).count() === 0)
      // keep_id always references a vector of the SAME cluster
      val reps = out.select(col("vec_id").as("rid"), col("cid").as("rcid"))
      assert(out.filter(col("is_dup")).join(reps, col("keep_id") === col("rid"))
        .filter(col("cid") =!= col("rcid")).count() === 0)
      // every vector of the corpus is listed exactly once
      assert(out.count() === graft.core.Tables.embeddings(spark, sf).count())
    } finally out.unpersist()
  }
}
