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
  /** `events.ts` arrives in fixture-generation-dependent layouts:
    * TIMESTAMP(NANOS) (pre-r6 fixtures; Spark 4 rejects it as a
    * timestamp, so read nanos as long and truncate to micros — the
    * same ns→us truncation duckdb applies) or TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (r6 fixtures; surfaces as TIMESTAMP_NTZ).
    * Both normalize to session-TZ TIMESTAMP — sessions here run UTC,
    * so the NTZ→LTZ cast is identity on the stored micros and both
    * engines see identical instants either way. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Session-level conf mutation at plan-build time: benign in the
    // single-tenant drivers here (Verify/Bench also set it at session
    // build), but racy if a shared session plans other queries
    // concurrently — a multi-tenant caller should set it once at
    // session construction instead.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(spark, dir, "events"))
  }

  /** Normalize a raw events frame's `ts` to session-TZ TIMESTAMP
    * whichever physical layout the fixture generation produced (see
    * [[events]]). Works on batch and streaming frames alike. */
  def normalizeTs(raw: DataFrame): DataFrame = raw.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case org.apache.spark.sql.types.TimestampNTZType =>
      raw.withColumn("ts", col("ts").cast("timestamp"))
    case _ => raw // already session-TZ TIMESTAMP
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Read a fixture table, normalizing any TIMESTAMP_NTZ column (r6
    * fixtures write isAdjustedToUTC=false micros) to session-TZ
    * TIMESTAMP — sessions run UTC, so the cast is identity on the
    * stored micros and matches what duckdb reads from the same file. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.filter(_.dataType == org.apache.spark.sql.types.TimestampNTZType)
      .foldLeft(raw)((df, f) => df.withColumn(f.name, col(f.name).cast("timestamp")))
  }

  /** Half-away-from-zero integer rounding of a double, PRIMITIVE form
    * (r15): Spark's `round(double)` routes through
    * BigDecimal.valueOf(x).setScale(0, HALF_UP) — ~1 µs/row, measured
    * 19→3.4 s on t5's 12 M-row trig stream and ~1 µs × 600 M rows on
    * a ×1000 lineitem scan. signum·floor(abs+0.5) is bit-identical to
    * it for |x| < 2^51: the +0.5 addition is exact there (0.5 is a
    * multiple of ulp(x) for exponents ≤ 51), half-integer boundaries
    * are exactly representable so binary comparison against them
    * equals BigDecimal's shortest-decimal comparison (shortest-repr
    * round-trips uniquely and preserves order vs representable
    * decimals), signum handles HALF_UP's away-from-zero negatives,
    * and NaN/±Inf propagate identically. Verified value-identical on
    * the full t5 output and the whole 196-query strict oracle gate.
    * DuckDB's round() is half-away-from-zero too, so the oracle
    * contract is unchanged. Scale-k rounds (round(x, 6) display
    * columns) keep Spark's round — floor(x·10^k + 0.5)/10^k is NOT
    * equivalent (the product reintroduces binary rounding). */
  def roundAway(c: Column): Column = signum(c) * floor(abs(c) + lit(0.5))

  /** Exact integer money: round(x*100) as cents. The double product is
    * identical across engines (IEEE), so the rounded integer is too. */
  def cents(c: Column): Column = roundAway(c * lit(100)).cast("long")

  /** Scaled exact integer for arbitrary doubles (scale = 10^k). */
  def scaled(c: Column, scale: Long): Column = roundAway(c * lit(scale)).cast("long")

  /** Positive modulus via explicit floor arithmetic — identical formula
    * on the duckdb side (avoids engine-specific mod sign conventions). */
  def pmodPos(x: Column, p: Column): Column = x - floor(x / p) * p

  /** Quantize a transcendental-derived double to BIGINT with a
    * runtime boundary-margin proof (the t13 `lnQ6` discipline, moved
    * IN-PLAN for values computed distributed): the generated SQL
    * asserts the scaled value sits ≥ `margin` quanta away from a .5
    * rounding boundary before rounding, so any libm within a few ulps
    * of the true value (Java's Math.log vs C libm differ by ≤1 ulp)
    * rounds to the SAME integer in both engines. This turns the
    * "ln of identical doubles rounds identically" assumption from
    * empirically-true-today into a guarantee verified on the actual
    * data every run: a violation raises with the offending value
    * (remedy: perturb the quantum or the fixture), never silently
    * hash-diverges. Inline the value SQL only on grid-sized frames
    * (it is repeated 4×). */
  def guardedRoundQ(valueSql: String, margin: Double): String =
    s"CASE WHEN abs(($valueSql) - round($valueSql)) < 0.5 - $margin " +
      s"THEN CAST(round($valueSql) AS BIGINT) " +
      "ELSE CAST(raise_error(concat('quantized value ', " +
      s"CAST(($valueSql) AS STRING), ' sits within $margin of a " +
      "rounding boundary - cross-engine exactness unprovable')) " +
      "AS BIGINT) END"

  /** Event time in microseconds since epoch (exact long). */
  def tUs(ts: Column): Column = unix_micros(ts)

  /** Event time in (double) seconds — single exact-int division. */
  def tSec(ts: Column): Column = unix_micros(ts) / lit(1000000.0)
}
