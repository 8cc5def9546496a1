package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The d15 ×1000 wall, pinned as a unit test: `localCheckpoint`
  * truncates LINEAGE but `rewriteStatsAndConstraints` copies the
  * plan's ESTIMATED stats into the checkpointed LogicalRDD, so in an
  * iterative self-join loop the size-only join estimate (a product
  * over children) compounds multiplicatively across rounds — the
  * exponent grows geometrically until BigInteger overflows inside
  * `SizeInBytesOnlyStatsPlanVisitor` (measured: d15 at 5 M docs,
  * ~20 propagation rounds). `TextQueries.checkpointReset` rebuilds
  * the frame from the checkpointed RDD, which gives a DEFAULT-stats
  * leaf each round: bounded per-round products, identical rows. */
class CheckpointResetSpec extends SparkSpec {

  /** One d15-shaped pointer-jumping round: a left self-join. */
  private def round(df: DataFrame): DataFrame =
    df.hint("shuffle_hash").join(
        df.select(col("node").as("pn"), col("label").as("pl")),
        col("label") === col("pn"), "left")
      .select(col("node"),
        least(col("label"), coalesce(col("pl"), col("label"))).as("label"))

  test("checkpointReset keeps iterated-join stats bounded; bare localCheckpoint compounds") {
    val init = spark.range(64).toDF("node").withColumn("label", col("node"))
    var bare = init
    var rst = init
    val bareStats = Seq.newBuilder[BigInt]
    val rstStats = Seq.newBuilder[BigInt]
    (1 to 5).foreach { _ =>
      bare = round(bare).localCheckpoint(true)
      rst = graft.queries.TextQueries.checkpointReset(round(rst))
      bareStats += bare.queryExecution.optimizedPlan.stats.sizeInBytes
      rstStats += rst.queryExecution.optimizedPlan.stats.sizeInBytes
    }
    val bs = bareStats.result(); val rs = rstStats.result()
    info(s"bare  sizeInBytes per round: ${bs.mkString(", ")}")
    info(s"reset sizeInBytes per round: ${rs.mkString(", ")}")
    // the propagated estimate grows strictly round over round (the
    // mechanism that overflows BigInteger at the ×1000 corpus)...
    assert(bs.sliding(2).forall { case Seq(a, b) => b > a },
      s"expected bare-checkpoint stats to compound: $bs")
    // ...while the rebuilt-leaf estimate is CONSTANT across rounds
    assert(rs.distinct.size == 1,
      s"expected reset stats constant across rounds: $rs")
    // and the rows are identical either way (the rebuild is a re-wrap)
    val a = bare.orderBy("node").collect().map(_.toSeq)
    val b = rst.orderBy("node").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }
}
