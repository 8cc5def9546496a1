package graft

import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan contracts of the two join-scale operators: these
  * queries exist to demonstrate a LAYOUT property (bucketed
  * co-location) and a PARTITIONING property (hot-key salting), so the
  * specs assert the plan shape itself, not just the result — the
  * result is already oracle-checked by the driver gate. */
class JoinScaleSpec extends SparkSpec {

  private def executed(name: String): SparkPlan = {
    val df = SparkEntry.queries(name)(spark, sf)
    // execute THIS DataFrame (not a derived .count(), which builds its
    // own QueryExecution) so df.queryExecution holds the AQE-finalized
    // plan the assertions inspect
    df.collect()
    df.queryExecution.executedPlan
  }

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    // QueryStageExec is a LeafExecNode — the finalized stage tree is
    // reachable only through .plan (and ReusedExchange through .child)
    val here = p match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(pf)
      case q: QueryStageExec => collectAll(q.plan)(pf)
      case r: ReusedExchangeExec => collectAll(r.child)(pf)
      case _ => p.children.flatMap(c => collectAll(c)(pf))
    }
    (pf.lift(p).toSeq ++ here) ++ (p.subqueries.flatMap(s => collectAll(s)(pf)))
  }

  test("b1: sort-merge join over bucketed tables has no Exchange on either side") {
    val plan = executed("b1_bucketed_join")
    val smjs = collectAll(plan) { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, s"expected a SortMergeJoin in\n$plan")
    // No shuffle anywhere BELOW the join: both inputs come straight
    // from the bucketed file scans. (The groupBy above the join may
    // shuffle; that one is legitimate.)
    val shufflesUnderJoin = smjs.flatMap(j =>
      collectAll(j.asInstanceOf[SparkPlan]) { case e: ShuffleExchangeExec => e })
    assert(shufflesUnderJoin.isEmpty,
      s"bucketed join must be Exchange-free below the join:\n$plan")
  }

  test("j9: shuffle join keys include the salt column") {
    val plan = executed("j9_salted_join")
    val shjs = collectAll(plan) { case j: ShuffledHashJoinExec => j }
    assert(shjs.nonEmpty, s"expected a ShuffledHashJoin in\n$plan")
    val keyNames = shjs.head.leftKeys.flatMap(_.references.map(_.name))
    assert(keyNames.exists(_.startsWith("salt")),
      s"salt must be part of the join partitioning keys, got $keyNames")
    assert(keyNames.exists(_.startsWith("skey")),
      s"skey must be part of the join partitioning keys, got $keyNames")
  }
}
