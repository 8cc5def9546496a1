package graft

/** Driver-contract smoke: every declared query runs at sf0.001 and the
  * flagship entry returns rows. The duckdb hash-match itself is the
  * external gate (tools/verify_local.py / driver CORRECTNESS). */
class QueriesSmokeSpec extends SparkSpec {

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet diff SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      df.count() // just must not throw
    }
  }

  test("t13b per-ener fits recover the injected transmission depth ramp") {
    val rows = SparkEntry.queries("t13b_mcmc_perener")(spark, sf)
      .orderBy("ener").collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      val ener = r.getLong(0)
      val truth = 0.015 + 0.003 * ener
      val (p16, p50, p84) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(math.abs(p50 - truth) < 0.003, s"ener $ener p50 $p50 vs $truth")
      assert(p16 < p50 && p50 < p84, s"ener $ener percentiles disordered")
      assert(p84 - p16 < 0.01, s"ener $ener posterior too wide: ${p84 - p16}")
    }
    // the transmission slope: median depth strictly increases with ener
    val p50s = rows.map(_.getDouble(2))
    p50s.sliding(2).foreach { case Array(a, b) =>
      assert(b > a, s"depth ramp not monotone: ${p50s.mkString(", ")}")
    }
  }
}
