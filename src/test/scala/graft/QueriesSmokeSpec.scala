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
}
