package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FastSS-style edit-distance-≤1 similarity join (Bocek et al. 2007,
  * deletion neighborhoods): the scalable exact fuzzy-join pattern —
  * each string expands to its ≤len+1 single-deletion variants
  * (position 0 = the identity), candidates come from an EQUI-join on
  * the variant string, and a position predicate makes the match exact
  * with no Levenshtein call:
  *
  *  - substitution: both sides deleted the SAME position of
  *    equal-length strings (same-variant @ different positions is NOT
  *    ed≤1 — e.g. "ab"/"ba" share variants "a" and "b" at ed 2, and
  *    the pos equality rejects them);
  *  - insert/delete: the longer side's deletion equals the shorter
  *    side's identity.
  *
  * Scale: runs on the DISTINCT-key table (vocabulary/entity names —
  * Heaps-law bounded, orders of magnitude below corpus row count);
  * the variant explosion factor is the mean string length; every
  * shuffle keys on the variant string — no cross join, no UDF, pure
  * codegen string slicing. The 100 TB deployment joins a query set's
  * neighborhoods against an indexed corpus neighborhood table the
  * same way.
  */
object FuzzyJoin {

  /** All a<b pairs of `df`'s DISTINCT `c` values at edit distance
    * exactly 1, with the edit kind ('sub' | 'indel'). */
  def ed1Pairs(df: DataFrame, c: String): DataFrame = {
    val vars = df.select(col(c).as("tok")).distinct()
      .withColumn("vr", explode(expr(
        """transform(sequence(0, length(tok)), i -> struct(
          |  i AS pos,
          |  CASE WHEN i = 0 THEN tok
          |       ELSE concat(substr(tok, 1, i - 1), substr(tok, i + 1)) END AS v))"""
          .stripMargin)))
      .select(col("tok"), col("vr.pos").as("pos"), col("vr.v").as("v"))
    // SHUFFLE_HASH self-join (r16): the planner's default broadcasts
    // one side, which computes the exploded-variant subtree TWICE
    // (stream + broadcast build — no reuse across distributions) and
    // pays the broadcast materialization. Hinted shuffled-hash, both
    // sides hash-partition on v and the two identical subtrees
    // collapse into ONE Exchange + ReusedExchange — the explode runs
    // once and nothing broadcasts. Measured at sf0.1: 5.2-6.8 s →
    // 2.0-2.7 s for the whole query. This is also the only shape that
    // survives deep scale (a corpus-sized neighborhood table cannot
    // broadcast); per-v buckets are alphabet-bounded, so the per-
    // partition build side stays a bounded fraction of its partition.
    vars.as("a").hint("shuffle_hash").join(vars.as("b"),
        col("a.v") === col("b.v") && col("a.tok") < col("b.tok") &&
          ((length(col("a.tok")) === length(col("b.tok")) &&
            col("a.pos") === col("b.pos") && col("a.pos") > 0) ||
           (length(col("a.tok")) === length(col("b.tok")) + 1 &&
            col("a.pos") > 0 && col("b.pos") === 0) ||
           (length(col("b.tok")) === length(col("a.tok")) + 1 &&
            col("b.pos") > 0 && col("a.pos") === 0)))
      .select(col("a.tok").as("a_name"), col("b.tok").as("b_name"),
        when(length(col("a.tok")) === length(col("b.tok")), "sub")
          .otherwise("indel").as("kind"))
      .distinct()
  }
}
