package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loaders + numeric helpers shared by every query.
  *
  * Determinism discipline (drives the duckdb-oracle hash match):
  * float aggregation order differs between engines, so every
  * aggregate that feeds a verified result is computed over exact
  * integers (money in cents, timestamps in microseconds) and the
  * final floating value is derived from those exact sums with a
  * single, identical formula on both sides.
  */
object Tables {
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects.
    * Read nanos as long (legacy conf) and truncate to micros — the same
    * ns→us truncation duckdb applies when it surfaces the column as
    * TIMESTAMP, so both engines see identical instants. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Session-level conf mutation at plan-build time: benign in the
    // single-tenant drivers here (Verify/Bench also set it at session
    // build), but racy if a shared session plans other queries
    // concurrently — a multi-tenant caller should set it once at
    // session construction instead.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Exact integer money: round(x*100) as cents. The double product is
    * identical across engines (IEEE), so the rounded integer is too. */
  def cents(c: Column): Column = round(c * lit(100)).cast("long")

  /** Scaled exact integer for arbitrary doubles (scale = 10^k). */
  def scaled(c: Column, scale: Long): Column = round(c * lit(scale)).cast("long")

  /** Positive modulus via explicit floor arithmetic — identical formula
    * on the duckdb side (avoids engine-specific mod sign conventions). */
  def pmodPos(x: Column, p: Column): Column = x - floor(x / p) * p

  /** Event time in microseconds since epoch (exact long). */
  def tUs(ts: Column): Column = unix_micros(ts)

  /** Event time in (double) seconds — single exact-int division. */
  def tSec(ts: Column): Column = unix_micros(ts) / lit(1000000.0)
}
