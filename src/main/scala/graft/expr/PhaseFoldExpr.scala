package graft.expr

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{toCol, toExpr}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd phase-fold expression (SURVEY §4: the one custom Catalyst
  * expression worth having): positive modulus of (t − epoch) by period
  * on exact integer micros — the kernel under T1 fold, F3 transit
  * membership and T6 BLS phase decomposition (ref fold_tser
  * main.py:7346–7380). Stays inside whole-stage codegen, unlike a
  * Scala UDF. Inputs are expected LongType (micros).
  */
case class PhaseFoldUs(t: Expression, epoch: Expression, period: Expression)
    extends TernaryExpression {

  override def first: Expression = t
  override def second: Expression = epoch
  override def third: Expression = period

  override def dataType: DataType = LongType

  override protected def nullSafeEval(tv: Any, ev: Any, pv: Any): Any = {
    val p = pv.asInstanceOf[Long]
    val m = (tv.asInstanceOf[Long] - ev.asInstanceOf[Long]) % p
    if (m < 0) m + p else m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tv, e, p) => s"""
      long ${ev.value}_m = ($tv - $e) % $p;
      ${ev.value} = ${ev.value}_m < 0 ? ${ev.value}_m + $p : ${ev.value}_m;
    """)

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      th: Expression): Expression = copy(t = f, epoch = s, period = th)
}

object PhaseFoldUs {
  /** Column wrapper. */
  def phase_fold_us(t: Column, epoch: Column, period: Column): Column =
    toCol(PhaseFoldUs(toExpr(t), toExpr(epoch), toExpr(period)))

  /** SQL registration: SELECT phase_fold_us(t, e, p). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "phase_fold_us", exprs => PhaseFoldUs(exprs(0), exprs(1), exprs(2)), "scala_udf")
}
