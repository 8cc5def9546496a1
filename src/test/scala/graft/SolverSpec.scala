package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.Detrend

/** The fixed-order Gauss–Jordan solver that replaced partial-pivot
  * elimination in round 5 (so the t3b oracle can replay the exact IEEE
  * sequence in SQL) must still SOLVE: property-check A·x = b on random
  * SPD systems of the normal-equation + ridge class it is used for.
  * (Raw Gen + seeded sampling, as in PropertySpec — the bridge
  * artifact is not in the offline cache.) */
class SolverSpec extends AnyFunSuite {

  private def forAllN[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(0x50EED + i)).foreach(f)
    }

  private def matmul(a: Array[Array[Double]], x: Array[Double]): Array[Double] =
    a.map(row => row.zip(x).map { case (r, v) => r * v }.sum)

  test("solveGaussJordan solves random SPD (B'B + ridge) systems") {
    val gen = for {
      n <- Gen.choose(2, 9)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (n, seed)
    forAllN(gen) { case (n, seed) =>
      val rng = new scala.util.Random(seed)
      // SPD by construction: A = B'B + 1e-6·I, b arbitrary
      val b0 = Array.fill(n, n)(rng.nextDouble() * 2 - 1)
      val a = Array.tabulate(n, n)((i, j) =>
        (0 until n).map(k => b0(k)(i) * b0(k)(j)).sum + (if (i == j) 1e-6 else 0.0))
      val rhs = Array.fill(n)(rng.nextDouble() * 2 - 1)
      val x = Detrend.solveGaussJordan(a.map(_.clone()), rhs.clone())
      val res = matmul(a, x).zip(rhs).map { case (p, q) => math.abs(p - q) }.max
      assert(res < 1e-6, s"residual $res for n=$n seed=$seed")
    }
  }

  test("solveGaussJordan is deterministic and matches a known system") {
    // [[4,1],[1,3]] x = [1,2] -> x = (1/11, 7/11)
    val a = Array(Array(4.0, 1.0), Array(1.0, 3.0))
    val x = Detrend.solveGaussJordan(a.map(_.clone()), Array(1.0, 2.0))
    assert(math.abs(x(0) - 1.0 / 11) < 1e-12 && math.abs(x(1) - 7.0 / 11) < 1e-12)
    val x2 = Detrend.solveGaussJordan(a.map(_.clone()), Array(1.0, 2.0))
    assert(x.sameElements(x2))
  }
}
