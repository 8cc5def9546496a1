package graft

import org.apache.spark.sql.functions._
import graft.expr.PhaseFoldUs
import graft.ops.TsOps

/** The codegen'd PhaseFoldUs expression must agree with the column-
  * expression formulation everywhere (including negative offsets), and
  * be callable from SQL after registration. */
class PhaseFoldExprSpec extends SparkSpec {
  import spark.implicits._

  test("expression equals column formula on fixture events") {
    val E = 1704067200000000L; val P = 86400000000L
    val df = graft.core.Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("t_us"))
      .withColumn("a", PhaseFoldUs.phase_fold_us(col("t_us"), lit(E), lit(P)))
      .withColumn("b", TsOps.phaseUs(col("t_us"), lit(E), lit(P)))
    assert(df.filter(col("a") =!= col("b")).count() === 0)
  }

  test("handles times before the epoch (negative dividend)") {
    val df = Seq(-100L, -1L, 0L, 1L, 99L).toDF("t")
      .withColumn("p", PhaseFoldUs.phase_fold_us(col("t"), lit(0L), lit(7L)))
    val got = df.collect().map(_.getLong(1)).toSeq
    assert(got === Seq(5L, 6L, 0L, 1L, 1L))
  }

  test("SQL registration works") {
    PhaseFoldUs.register(spark)
    val r = spark.sql("SELECT phase_fold_us(CAST(10 AS BIGINT), CAST(3 AS BIGINT), CAST(4 AS BIGINT)) AS p")
    assert(r.head.getLong(0) === 3L)
  }
}
