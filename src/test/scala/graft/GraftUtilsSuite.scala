package org.apache.spark.ml.graft

import org.apache.spark.ml.graft.util.GraftUtils
import org.apache.spark.ml.linalg.Vectors
import org.scalatest.funsuite.AnyFunSuite

/** Property tests mirroring the reference's UtilsSuite / HasSubBagSuite
  * categories (SURVEY.md §5 category 4) — hand-rolled generators (the
  * offline cache carries scalacheck but not scalatestplus bridges).
  */
class GraftUtilsSuite extends AnyFunSuite {

  private val rng = new scala.util.Random(42)

  test("weightedMedian with uniform weights is a median element") {
    for (_ <- 0 until 200) {
      val n = 1 + rng.nextInt(50)
      val v = Array.fill(n)(rng.nextDouble() * 2000 - 1000)
      val m = GraftUtils.weightedMedian(v, Array.fill(n)(1.0))
      val expected = v.sorted.apply((n - 1) / 2)
      assert(m === expected)
    }
  }

  test("weightedMedian ignores zero-weight elements") {
    val v = Array(1.0, 50.0, 2.0, 3.0)
    val w = Array(1.0, 0.0, 1.0, 1.0)
    assert(GraftUtils.weightedMedian(v, w) === 2.0)
  }

  test("weightedMedian is scale-invariant in weights") {
    for (_ <- 0 until 100) {
      val n = 1 + rng.nextInt(20)
      val v = Array.fill(n)(rng.nextDouble() * 100)
      val w = Array.fill(n)(rng.nextDouble())
      assert(
        GraftUtils.weightedMedian(v, w) ===
          GraftUtils.weightedMedian(v, w.map(_ * 42.0)))
    }
  }

  test("subspace: ratio 1 is identity; always sorted, non-empty, in range") {
    for (_ <- 0 until 300) {
      val ratio = 0.05 + rng.nextDouble() * 0.95
      val nf = 1 + rng.nextInt(100)
      val seed = rng.nextLong()
      val s = GraftUtils.subspace(ratio, nf, seed)
      assert(s.nonEmpty)
      assert(s.sameElements(s.sorted))
      assert(s.forall(i => i >= 0 && i < nf))
      assert(s.distinct.length === s.length)
    }
    assert(GraftUtils.subspace(1.0, 7, 3L).sameElements(Array.range(0, 7)))
  }

  test("subspace expected size ~ ratio * numFeatures") {
    val sizes = (0 until 500).map(s => GraftUtils.subspace(0.5, 100, s.toLong).length)
    val mean = sizes.sum.toDouble / sizes.length
    assert(mean > 45 && mean < 55)
  }

  test("sliceVector dense and sparse agree") {
    val dense = Vectors.dense(0.0, 1.0, 0.0, 3.0, 0.0, 5.0)
    val sparse = dense.toSparse
    val idx = Array(1, 3, 4)
    val a = GraftUtils.sliceVector(dense, idx)
    val b = GraftUtils.sliceVector(sparse, idx)
    assert(a.toArray.toSeq === Seq(1.0, 3.0, 0.0))
    assert(a.toArray.toSeq === b.toArray.toSeq)
  }
}
