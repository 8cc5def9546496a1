package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{toCol, toExpr}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd array kernels for the similarity/dedup operators (SURVEY
  * §2 LLM-pipeline block). These replace interpreted higher-order
  * `aggregate`/`zip_with` lambdas in the hot path of e1/e2/d9/e3 (dot
  * products over embedding arrays) and d2 (bitmap intersection) — the
  * single biggest interpreter cost the round-1 bench surfaced. Each is
  * a plain loop inside whole-stage codegen, no per-row allocation
  * except the bitmap builder.
  *
  * Arithmetic contract: [[DotI12]] reproduces the SQL form
  * `aggregate(zip_with(a, b, (x,y) -> CAST(round(x*y*1e12) AS BIGINT)),
  * 0L, (acc,v) -> acc+v)` bit-for-bit — exact half-away-from-zero
  * rounding of each pairwise product at 1e12, summed as longs (order-
  * independent), so oracle SQL in DuckDB (whose `round` is also
  * half-away-from-zero) matches exactly.
  */
object VecExprs {

  /** Exact half-away-from-zero rounding of p to a long. Matches both
    * Spark SQL `CAST(round(p) AS BIGINT)` and DuckDB `round(p)`:
    * p - floor(p) is exact for |p| < 2^52 (Sterbenz), so the 0.5
    * comparison is exact — unlike `Math.round`'s floor(p+0.5), which
    * mis-rounds values just below a representable 0.5 boundary. */
  @inline def roundHalfAway(p: Double): Long =
    if (p >= 0d) { val f = math.floor(p); f.toLong + (if (p - f >= 0.5d) 1L else 0L) }
    else { val c = math.ceil(p); c.toLong - (if (c - p >= 0.5d) 1L else 0L) }

  /** Java source for roundHalfAway, accumulating into `acc`. */
  private def roundAccJava(acc: String, p: String): String =
    s"""if ($p >= 0d) { double _f = java.lang.Math.floor($p);
       |  $acc += (long) _f + (($p - _f >= 0.5d) ? 1L : 0L);
       |} else { double _c = java.lang.Math.ceil($p);
       |  $acc += (long) _c - ((_c - $p >= 0.5d) ? 1L : 0L); }""".stripMargin

  def dot_i12(a: Column, b: Column): Column = toCol(DotI12(toExpr(a), toExpr(b)))
  def sign_bucket(a: Column, nBits: Column): Column =
    toCol(SignBucket(toExpr(a), toExpr(nBits)))
  def bitmap_from_indices(idxs: Column, nWords: Column): Column =
    toCol(BitmapFromIndices(toExpr(idxs), toExpr(nWords)))
  def bitmap_and_count(a: Column, b: Column): Column =
    toCol(BitmapAndCount(toExpr(a), toExpr(b)))
  def l2sq_fd(a: Column, b: Column): Column = toCol(L2SqFD(toExpr(a), toExpr(b)))

  /** Integerized dot product of two float arrays:
    * Σ_i roundHalfAway((double)a_i · (double)b_i · 1e12) as LONG.
    * Pass the same column twice for the squared norm. */
  case class DotI12(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType

    override protected def nullSafeEval(av: Any, bv: Any): Any = {
      val a = av.asInstanceOf[ArrayData]; val b = bv.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0L; var i = 0
      while (i < n) {
        acc += roundHalfAway(a.getFloat(i).toDouble * b.getFloat(i).toDouble * 1e12)
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
        val n = ctx.freshName("n"); val p = ctx.freshName("p")
        s"""long $acc = 0L;
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |for (int $i = 0; $i < $n; $i++) {
           |  double $p = (double) $a.getFloat($i) * (double) $b.getFloat($i) * 1.0E12d;
           |  ${roundAccJava(acc, p)}
           |}
           |${ev.value} = $acc;""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Sign-LSH bucket: Σ_{j=0}^{nBits-1} (a_j > 0f ? 1L<<j : 0) over a
    * float array — the first nBits dims' sign bits as a LONG key. The
    * bit width is a column so it can scale with corpus size (log2(N))
    * without re-planning. */
  case class SignBucket(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType

    override protected def nullSafeEval(av: Any, nv: Any): Any = {
      val a = av.asInstanceOf[ArrayData]
      val n = math.min(nv.asInstanceOf[Int], a.numElements())
      var acc = 0L; var j = 0
      while (j < n) { if (a.getFloat(j) > 0f) acc |= (1L << j); j += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, nb) => {
        val acc = ctx.freshName("acc"); val j = ctx.freshName("j")
        val n = ctx.freshName("n")
        s"""long $acc = 0L;
           |int $n = java.lang.Math.min((int) $nb, $a.numElements());
           |for (int $j = 0; $j < $n; $j++) {
           |  if ($a.getFloat($j) > 0f) $acc |= (1L << $j);
           |}
           |${ev.value} = $acc;""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Pack a sorted int-index array into an nWords-long bitmap
    * (array<long>), bit i of word i/64 set per index. Indices ≥
    * nWords·64 are ignored (caller sizes nWords from the universe). */
  case class BitmapFromIndices(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override protected def nullSafeEval(av: Any, nv: Any): Any = {
      val a = av.asInstanceOf[ArrayData]; val nw = nv.asInstanceOf[Int]
      val words = new Array[Long](nw)
      var i = 0
      while (i < a.numElements()) {
        val idx = a.getInt(i)
        if (idx >= 0 && idx < nw * 64) words(idx >> 6) |= (1L << (idx & 63))
        i += 1
      }
      new GenericArrayData(words)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, nw) => {
        val w = ctx.freshName("w"); val i = ctx.freshName("i")
        val idx = ctx.freshName("idx")
        s"""long[] $w = new long[(int) $nw];
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  int $idx = $a.getInt($i);
           |  if ($idx >= 0 && $idx < $w.length * 64) $w[$idx >> 6] |= (1L << ($idx & 63));
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($w);""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Popcount of the AND of two long-array bitmaps:
    * Σ_i bitCount(a_i & b_i) — the d2 pairwise set-intersection size. */
  case class BitmapAndCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType

    override protected def nullSafeEval(av: Any, bv: Any): Any = {
      val a = av.asInstanceOf[ArrayData]; val b = bv.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0L; var i = 0
      while (i < n) { acc += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i)); i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""long $acc = 0L;
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
           |}
           |${ev.value} = $acc;""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Squared L2 distance between a float array and a double array
    * (vector vs centroid), summed in a fixed left-to-right loop —
    * deterministic for the IVF assignment tie-break. */
  case class L2SqFD(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType

    override protected def nullSafeEval(av: Any, bv: Any): Any = {
      val a = av.asInstanceOf[ArrayData]; val b = bv.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0d; var i = 0
      while (i < n) {
        val d = a.getFloat(i).toDouble - b.getDouble(i); acc += d * d; i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
        val n = ctx.freshName("n"); val d = ctx.freshName("d")
        s"""double $acc = 0d;
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |for (int $i = 0; $i < $n; $i++) {
           |  double $d = (double) $a.getFloat($i) - $b.getDouble($i);
           |  $acc += $d * $d;
           |}
           |${ev.value} = $acc;""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }
}
