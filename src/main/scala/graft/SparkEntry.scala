package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — aggregates every operator query declared by the
  * domain modules (SURVEY.md §2 inventory). Each entry has a duckdb
  * oracle in [[oracleSql]] unless the operator is not SQL-expressible.
  */
object SparkEntry {

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (_root_.graft.queries.Relational.queries, _root_.graft.queries.Relational.oracle),
      (_root_.graft.queries.TimeSeries.queries, _root_.graft.queries.TimeSeries.oracle),
      (_root_.graft.queries.Search.queries, _root_.graft.queries.Search.oracle),
      (_root_.graft.queries.TextQueries.queries, _root_.graft.queries.TextQueries.oracle),
      (_root_.graft.queries.Extras.queries, _root_.graft.queries.Extras.oracle),
      (_root_.graft.queries.Advanced.queries, _root_.graft.queries.Advanced.oracle)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * revenue summary by region over the full join chain. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    import graft.core.Tables._
    val li = lineitem(spark, d); val o = orders(spark, d)
    val c = customer(spark, d); val n = nation(spark, d); val r = region(spark, d)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg((sum(graft.core.Tables.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .cast("long") / 100.0).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
