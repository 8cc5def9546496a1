package graft

import org.apache.spark.sql.functions._
import graft.expr.VecExprs

/** The codegen vector kernels must be bit-identical to the SQL
  * higher-order-function forms they replaced — that equivalence IS the
  * oracle-compatibility contract for e1/e2/d9/d2. */
class VecExprsSpec extends SparkSpec {
  import spark.implicits._

  test("roundHalfAway matches Spark SQL CAST(round(x) AS BIGINT) semantics") {
    // exact .5 boundaries away from zero; near-boundary doubles exact
    val cases = Seq(2.5 -> 3L, -2.5 -> -3L, 2.4999999999999996 -> 2L,
      -2.4999999999999996 -> -2L, 0.49999999999999994 -> 0L,
      -0.49999999999999994 -> 0L, 1e12 + 0.5 -> (1e12.toLong + 1))
    cases.foreach { case (x, want) =>
      assert(VecExprs.roundHalfAway(x) == want, s"roundHalfAway($x)")
    }
  }

  test("roundHalfAway equals BigDecimal HALF_UP (Spark's round) on random doubles") {
    // Spark's Round evaluates BigDecimal.valueOf(d).setScale(0, HALF_UP);
    // the kernel must agree on arbitrary magnitudes in the i12 range.
    val rng = new scala.util.Random(59)
    (0 until 20000).foreach { _ =>
      val x = (rng.nextDouble() - 0.5) * math.pow(10, rng.nextInt(13))
      val want = java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      assert(VecExprs.roundHalfAway(x) == want, s"x=$x")
    }
  }

  test("DotI12 equals the aggregate/zip_with SQL form on random arrays") {
    val rng = new scala.util.Random(41)
    val rows = (0 until 200).map { i =>
      (i.toLong,
        Array.fill(64)((rng.nextGaussian() * 0.3).toFloat).toSeq,
        Array.fill(64)((rng.nextGaussian() * 0.3).toFloat).toSeq)
    }.toDF("id", "a", "b")
    val got = rows.select(col("id"),
      VecExprs.dot_i12(col("a"), col("b")).as("fast"),
      expr("""aggregate(zip_with(a, b, (x, y) ->
        CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1e12) AS BIGINT)),
        0L, (acc, v) -> acc + v)""").as("slow")).collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"row ${r.getLong(0)}")
    }
  }

  test("SignBucket equals the per-dim CASE chain") {
    val rng = new scala.util.Random(43)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)((rng.nextGaussian()).toFloat).toSeq)
    }.toDF("id", "a")
    val slow = (1 to 12).map(j =>
      when(element_at(col("a"), j) > 0.0f, math.pow(2, j - 1).toLong)
        .otherwise(0L)).reduce(_ + _)
    val got = rows.select(
      VecExprs.sign_bucket(col("a"), lit(12)).as("fast"), slow.as("slow")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("BitmapFromIndices + BitmapAndCount equal exact set intersection") {
    val rng = new scala.util.Random(47)
    val sets = (0 until 100).map { i =>
      (i.toLong, (0 until 40).map(_ => rng.nextInt(300)).distinct.sorted)
    }
    val df = sets.toDF("id", "idxs")
      .select(col("id"), col("idxs"),
        VecExprs.bitmap_from_indices(col("idxs"), lit(5)).as("bm"))
    val rows = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        VecExprs.bitmap_and_count(col("a.bm"), col("b.bm")).as("inter"),
        size(array_intersect(col("a.idxs"), col("b.idxs"))).as("want"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == r.getInt(3).toLong,
        s"pair (${r.getLong(0)},${r.getLong(1)})")
    }
  }

  test("L2SqFD is the fixed-order squared distance") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(0.5, 1.5, 3.25)
    val df = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
    val got = df.select(VecExprs.l2sq_fd(col("a"), col("b"))).head.getDouble(0)
    val want = (1.0 - 0.5) * (1.0 - 0.5) + (2.0 - 1.5) * (2.0 - 1.5) +
      (3.0 - 3.25) * (3.0 - 3.25)
    assert(math.abs(got - want) < 1e-15)
  }
}
