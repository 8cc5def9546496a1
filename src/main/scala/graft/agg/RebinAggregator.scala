package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A1 `rebn_tser` as a typed `Aggregator[IN, BUF, OUT]` (SURVEY §7.3):
  * single-pass mean + reference error model per bin —
  * err = sqrt((sqrt(Σe²)/n)² + std_pop²), ref main.py:3805–3811.
  *
  * The SQL-surface queries (t2/a1) compute the same statistics from
  * exact integer sums for duckdb parity; this typed form is the
  * Dataset API for callers that want compile-time row types, and it
  * merges associatively so partial aggregation applies.
  */
case class TsPoint(x: Double, value: Double, err: Double)
case class RebinBuf(n: Long, sum: Double, sumSq: Double, sumErrSq: Double)
case class RebinOut(n: Long, mean: Double, err: Double)

object RebinAggregator extends Aggregator[TsPoint, RebinBuf, RebinOut] {
  override def zero: RebinBuf = RebinBuf(0L, 0.0, 0.0, 0.0)

  override def reduce(b: RebinBuf, p: TsPoint): RebinBuf =
    RebinBuf(b.n + 1, b.sum + p.value, b.sumSq + p.value * p.value,
      b.sumErrSq + p.err * p.err)

  override def merge(a: RebinBuf, b: RebinBuf): RebinBuf =
    RebinBuf(a.n + b.n, a.sum + b.sum, a.sumSq + b.sumSq,
      a.sumErrSq + b.sumErrSq)

  override def finish(b: RebinBuf): RebinOut = {
    if (b.n == 0) RebinOut(0L, Double.NaN, Double.NaN)
    else {
      val mean = b.sum / b.n
      val varPop = math.max(0.0, b.sumSq / b.n - mean * mean)
      val stdvFrst = math.sqrt(b.sumErrSq) / b.n
      RebinOut(b.n, mean, math.sqrt(stdvFrst * stdvFrst + varPop))
    }
  }

  override def bufferEncoder: Encoder[RebinBuf] = Encoders.product[RebinBuf]
  override def outputEncoder: Encoder[RebinOut] = Encoders.product[RebinOut]
}
